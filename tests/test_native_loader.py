"""Native C++ batch loader vs numpy reference loader."""

import os

import numpy as np
import pytest

from epcnet_tpu.data.native_loader import (
    ensure_built,
    load_pc_files_native,
    native_available,
)
from epcnet_tpu.data.pointclouds import load_pc_files


@pytest.fixture(scope="module")
def bin_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("bins")
    rng = np.random.default_rng(0)
    files = []
    for i in range(10):
        p = d / f"{i}.bin"
        rng.uniform(-1, 1, (256, 3)).astype(np.float64).tofile(p)
        files.append(str(p))
    return files


def test_native_builds():
    assert ensure_built(), "g++ toolchain should build the loader in-image"
    assert native_available()


def test_native_matches_numpy(bin_files):
    a = load_pc_files_native(bin_files, num_points=256)
    b = load_pc_files(bin_files, num_points=256)
    assert a.dtype == np.float32
    np.testing.assert_array_equal(a, b)


def test_native_preallocated_out(bin_files):
    out = np.zeros((10, 256, 3), np.float32)
    got = load_pc_files_native(bin_files, num_points=256, out=out)
    assert got is out
    np.testing.assert_array_equal(out, load_pc_files(bin_files, num_points=256))


def test_native_missing_file_raises(bin_files):
    if not native_available():
        pytest.skip("native lib unavailable")
    with pytest.raises(IOError):
        load_pc_files_native(bin_files[:1] + ["/nonexistent/x.bin"], num_points=256)


def test_native_short_file_raises(tmp_path):
    if not native_available():
        pytest.skip("native lib unavailable")
    p = tmp_path / "short.bin"
    np.zeros(5).tofile(p)
    with pytest.raises(IOError):
        load_pc_files_native([str(p)], num_points=256)

def test_concurrent_batches_share_pool(synthetic_root):
    """Concurrent load_pc_files_native calls from multiple Python threads
    interleave on the shared worker pool (the task-queue redesign): every
    batch's contents must be correct and complete."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from epcnet_tpu.data.native_loader import load_pc_files_native
    from epcnet_tpu.data.tuples import scan_runs

    df = scan_runs(synthetic_root)
    files = list(df["file"]) if "file" in df else [
        r["query"] for r in df.to_dict("records")
    ]
    files = files[:24]

    def load(seed):
        rng = np.random.default_rng(seed)
        picks = [files[int(i)] for i in rng.integers(0, len(files), 16)]
        out = load_pc_files_native(picks, synthetic_root, 128, n_threads=4)
        # verify against the single-file reference loads
        want = load_pc_files_native(picks, synthetic_root, 128, n_threads=1)
        np.testing.assert_array_equal(out, want)
        return out.shape

    with ThreadPoolExecutor(6) as ex:
        shapes = list(ex.map(load, range(12)))
    assert all(s == (16, 128, 3) for s in shapes)
