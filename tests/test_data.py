"""Data-plane tests: IO round-trip, augmentation, tuple generation
semantics (radii, test-region exclusion), loader batching."""

import os

import numpy as np
import pytest

from epcnet_tpu.configs import DataConfig
from epcnet_tpu.data import (
    TupleLoader,
    construct_query_and_database_sets,
    construct_query_dict,
    jitter_point_cloud,
    load_pc_file,
    rotate_point_cloud,
)
from epcnet_tpu.data.tuples import in_test_region, scan_runs


def test_load_pc_file_roundtrip(tmp_path):
    pts = np.random.default_rng(0).uniform(-1, 1, (128, 3))
    path = tmp_path / "a.bin"
    pts.astype(np.float64).tofile(path)
    got = load_pc_file(str(path), num_points=128)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, pts, atol=1e-6)


def test_load_pc_file_size_check(tmp_path):
    np.zeros(10).tofile(tmp_path / "bad.bin")
    with pytest.raises(ValueError):
        load_pc_file(str(tmp_path / "bad.bin"), num_points=128)


def test_rotation_preserves_norms_and_z(rng):
    x = rng.randn(2, 64, 3).astype(np.float32)
    r = rotate_point_cloud(x, np.random.default_rng(0))
    np.testing.assert_allclose(
        np.linalg.norm(r[..., :2], axis=-1), np.linalg.norm(x[..., :2], axis=-1), atol=1e-5
    )
    np.testing.assert_allclose(r[..., 2], x[..., 2], atol=1e-6)  # up-axis fixed


def test_jitter_bounded(rng):
    x = np.zeros((1, 100, 3), np.float32)
    j = jitter_point_cloud(x, sigma=0.5, clip=0.03, rng=np.random.default_rng(0))
    assert np.abs(j).max() <= 0.03 + 1e-6


def test_tuple_radii_semantics(synthetic_root):
    df = scan_runs(synthetic_root)
    tt = construct_query_dict(df, positive_radius=10.0, negative_radius=50.0,
                              exclude_test_regions=False)
    coords = df[["northing", "easting"]].to_numpy()
    for i in list(tt.queries)[:10]:
        e = tt.queries[i]
        for p in e["positives"]:
            assert np.linalg.norm(coords[i] - coords[p]) < 10.0
        for n in e["negatives"][:20]:
            assert np.linalg.norm(coords[i] - coords[n]) > 50.0


def test_test_region_exclusion():
    regions = [(100.0, 100.0)]
    assert in_test_region(110.0, 60.0, regions, width=150.0)
    assert not in_test_region(300.0, 100.0, regions, width=150.0)
    # width is a HALF-width (reference check_in_test_set semantics):
    assert in_test_region(200.0, 100.0, regions, width=150.0)  # |d|=100 < 150
    assert not in_test_region(251.0, 100.0, regions, width=150.0)  # |d|=151 > 150


def test_query_and_database_sets(synthetic_root):
    df = scan_runs(synthetic_root)
    db_sets, q_sets = construct_query_and_database_sets(df, test_positive_radius=25.0)
    assert len(db_sets) == 3
    # cross-run ground truth exists and is within 25 m
    found = 0
    for qi, qset in enumerate(q_sets):
        for i, entry in qset.items():
            for di in range(len(db_sets)):
                if di == qi or di not in entry:
                    continue
                for g in entry[di]:
                    dbe = db_sets[di][g]
                    dist = np.hypot(
                        entry["northing"] - dbe["northing"],
                        entry["easting"] - dbe["easting"],
                    )
                    assert dist < 25.0
                    found += 1
    assert found > 0


def test_query_sets_filtered_database_full(synthetic_root):
    """only_test_regions restricts QUERIES only; the database keeps every
    submap of the run (reference generate_test_sets.py semantics)."""
    df = scan_runs(synthetic_root)
    # pick a region box around the first submap so the filter keeps >=1 query
    centre = (float(df["northing"][0]), float(df["easting"][0]))
    db_sets, q_sets = construct_query_and_database_sets(
        df, test_positive_radius=25.0, only_test_regions=True,
        test_regions=[centre],
    )
    run_sizes = df.groupby("run").size()
    for run, dbs in zip(sorted(df["run"].unique()), db_sets):
        assert len(dbs) == run_sizes[run]  # database unfiltered
    assert any(len(q) > 0 for q in q_sets)
    assert sum(len(q) for q in q_sets) < sum(len(d) for d in db_sets)
    # ground-truth indices address the FULL database, and all db entries
    # within radius are present (gt computed against the full-run tree)
    for qi, qset in enumerate(q_sets):
        for entry in qset.values():
            for di in range(len(db_sets)):
                if di == qi or di not in entry:
                    continue
                expect = [
                    g for g, dbe in db_sets[di].items()
                    if np.hypot(entry["northing"] - dbe["northing"],
                                entry["easting"] - dbe["easting"]) < 25.0
                ]
                assert entry[di] == sorted(expect)


def test_loader_shapes_and_coverage(synthetic_root):
    df = scan_runs(synthetic_root)
    tt = construct_query_dict(df, exclude_test_regions=False)
    cfg = DataConfig(dataset_root=synthetic_root, num_points=128,
                     num_negatives=4, num_positives=2)
    loader = TupleLoader(tt, cfg, batch_size=3, seed=0)
    total = 0
    for b in loader.epoch(0):
        assert b["query"].shape == (3, 128, 3)
        assert b["positives"].shape == (3, 2, 128, 3)
        assert b["negatives"].shape == (3, 4, 128, 3)
        assert b["other_neg"].shape == (3, 128, 3)
        total += 1
    assert total >= 25  # ~90 tuples / 3 per batch, minus unusable


def test_loader_hard_negative_hook(synthetic_root):
    df = scan_runs(synthetic_root)
    tt = construct_query_dict(df, exclude_test_regions=False)
    cfg = DataConfig(dataset_root=synthetic_root, num_points=128,
                     num_negatives=4, num_positives=2)
    loader = TupleLoader(tt, cfg, batch_size=2, seed=0, augment=False)

    def hard(idx):
        return tt.queries[idx]["negatives"][:2]

    loader.set_hard_negatives(hard)
    b = next(iter(loader.epoch(0)))
    for ids in b["ids"]:
        expect = tt.queries[ids["query"]]["negatives"][:2]
        assert ids["negatives"][:2] == list(expect)


def test_loader_pool_size_invariance(synthetic_root):
    """The emitted batch stream is identical for ANY loader_threads value —
    determinism (and therefore resume) cannot depend on thread scheduling."""
    df = scan_runs(synthetic_root)
    tt = construct_query_dict(df, exclude_test_regions=False)

    def run(threads):
        cfg = DataConfig(dataset_root=synthetic_root, num_points=128,
                         num_negatives=3, num_positives=1,
                         loader_threads=threads)
        loader = TupleLoader(tt, cfg, batch_size=2, seed=3)
        return [(b["query"].copy(), b["negatives"].copy(),
                 [i["query"] for i in b["ids"]]) for b in loader.epoch(2)]

    a, b = run(1), run(4)
    assert len(a) == len(b) > 0
    for (qa, na, ia), (qb, nb, ib) in zip(a, b):
        np.testing.assert_array_equal(qa, qb)
        np.testing.assert_array_equal(na, nb)
        assert ia == ib


def test_loader_pool_parallel_speedup(synthetic_root, monkeypatch):
    """loader_threads > 1 must actually overlap tuple assembly (VERDICT r1:
    the config was dead and assembly was serial)."""
    import time as _time

    import epcnet_tpu.data.loader as loader_mod

    df = scan_runs(synthetic_root)
    tt = construct_query_dict(df, exclude_test_regions=False)
    real = loader_mod.load_pc_files_native

    def slow_load(files, root="", num_points=4096, n_threads=8, out=None):
        _time.sleep(0.01)  # simulate slow storage per tuple
        return real(files, root, num_points, n_threads=1, out=out)

    monkeypatch.setattr(loader_mod, "load_pc_files_native", slow_load)

    def timed(threads):
        cfg = DataConfig(dataset_root=synthetic_root, num_points=128,
                         num_negatives=3, num_positives=1,
                         loader_threads=threads, prefetch_depth=8)
        loader = TupleLoader(tt, cfg, batch_size=2, seed=0, augment=False)
        t0 = _time.perf_counter()
        n = sum(1 for _ in loader.epoch(0))
        return _time.perf_counter() - t0, n

    t1, n1 = timed(1)
    t8, n8 = timed(8)
    assert n1 == n8
    assert t8 < t1 / 1.7, (t1, t8)  # ~90 tuples x 10ms serial vs pooled


def test_loader_deterministic_given_seed(synthetic_root):
    """Same seed + epoch -> identical batches (restart idempotence depends
    on this: resume re-derives data order from (seed, epoch))."""
    df = scan_runs(synthetic_root)
    tt = construct_query_dict(df, exclude_test_regions=False)
    cfg = DataConfig(dataset_root=synthetic_root, num_points=128,
                     num_negatives=3, num_positives=1)

    def first_two(seed):
        loader = TupleLoader(tt, cfg, batch_size=2, seed=seed)
        out = []
        for b in loader.epoch(1):
            out.append((b["query"].copy(), [i["query"] for i in b["ids"]]))
            if len(out) == 2:
                loader.stop()
                break
        return out

    a = first_two(7)
    b = first_two(7)
    for (qa, ia), (qb, ib) in zip(a, b):
        np.testing.assert_array_equal(qa, qb)
        assert ia == ib
    c = first_two(8)
    assert any(ia != ic for (_, ia), (_, ic) in zip(a, c)) or not np.array_equal(
        a[0][0], c[0][0]
    )


def test_synthetic_hard_mode_structure(tmp_path):
    """Hard mode: revisits of a waypoint share blob STRUCTURE but not
    points; easy mode keeps identical base points (pre-augmentation)."""
    import numpy as np

    from epcnet_tpu.data.synthetic import generate_synthetic_dataset
    from epcnet_tpu.data.tuples import scan_runs
    from epcnet_tpu.data.pointclouds import load_pc_file

    easy = str(tmp_path / "easy")
    hard = str(tmp_path / "hard")
    for root, rs in ((easy, False), (hard, True)):
        generate_synthetic_dataset(root, num_runs=2, submaps_per_run=8,
                                   num_points=512, resample_per_visit=rs)

    def cloud(root, run, s):
        df = scan_runs(root)
        rows = df[df["run"] == f"run_{run:02d}"]
        return load_pc_file(rows.iloc[s]["file"], root, 512)

    # hard: same waypoint, different runs -> different POINTS, similar SHAPE
    a, b = cloud(hard, 0, 3), cloud(hard, 1, 3)
    c = cloud(hard, 0, 6)  # a different place
    assert not np.allclose(a, b, atol=1e-3)
    d_same = np.linalg.norm(np.cov(a.T) - np.cov(b.T))
    d_diff = np.linalg.norm(np.cov(a.T) - np.cov(c.T))
    assert d_same < d_diff  # structural similarity orders correctly


def test_load_pc_file_inferred_size(tmp_path, rng):
    """num_points=None infers N from the file (cli/embed.py arbitrary-size
    clouds); wrong-size files still fail fast in fixed mode."""
    import numpy as np

    from epcnet_tpu.data.pointclouds import load_pc_file

    p = str(tmp_path / "c.bin")
    cloud = rng.uniform(-1, 1, (91, 3))
    cloud.astype(np.float64).tofile(p)
    out = load_pc_file(p, num_points=None)
    assert out.shape == (91, 3) and out.dtype == np.float32
    np.testing.assert_allclose(out, cloud.astype(np.float32))
    with pytest.raises(ValueError, match="expected"):
        load_pc_file(p, num_points=4096)


def test_loader_fast_skip_matches_full_replay(synthetic_root):
    """epoch(skip_batches=N) must resume the stream bit-identically to
    consuming-and-discarding N batches: composition from metadata, the
    augmentation rng advanced through the real _augment on zeros."""
    from epcnet_tpu.configs import DataConfig
    from epcnet_tpu.data.loader import TupleLoader
    from epcnet_tpu.data.tuples import construct_query_dict, scan_runs

    runs = scan_runs(synthetic_root)
    tuples = construct_query_dict(runs, exclude_test_regions=False)
    cfg = DataConfig(dataset_root=synthetic_root, num_points=128,
                     num_negatives=3, num_positives=2)
    full = list(TupleLoader(tuples, cfg, batch_size=2, seed=7).epoch(3))
    assert len(full) >= 4, "fixture too small for a skip test"
    loader = TupleLoader(tuples, cfg, batch_size=2, seed=7)
    resumed = list(loader.epoch(3, skip_batches=2))
    assert loader.skipped_batches == 2
    assert len(resumed) == len(full) - 2
    for a, b in zip(full[2:], resumed):
        assert a["ids"] == b["ids"]
        for k in ("query", "positives", "negatives", "other_neg"):
            np.testing.assert_array_equal(a[k], b[k])


def test_loader_consumer_crash_stops_producer(synthetic_root):
    """Abandoning the epoch generator mid-stream (a dispatch raising) must
    stop and join the producer thread instead of leaking it."""
    import threading

    from epcnet_tpu.configs import DataConfig
    from epcnet_tpu.data.loader import TupleLoader
    from epcnet_tpu.data.tuples import construct_query_dict, scan_runs

    runs = scan_runs(synthetic_root)
    tuples = construct_query_dict(runs, exclude_test_regions=False)
    cfg = DataConfig(dataset_root=synthetic_root, num_points=128,
                     num_negatives=3, num_positives=2, prefetch_depth=2)
    before = threading.active_count()
    loader = TupleLoader(tuples, cfg, batch_size=2, seed=0)
    gen = loader.epoch(0)
    next(gen)  # producer running, queue filling
    gen.close()  # consumer unwinds (GeneratorExit) without draining
    # the generator's finally joins the producer; no thread may linger
    deadline = __import__("time").time() + 15
    while threading.active_count() > before and __import__("time").time() < deadline:
        __import__("time").sleep(0.1)
    assert threading.active_count() <= before, "producer thread leaked"
