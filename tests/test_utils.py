"""Utility tests: profiling annotations, metrics logger, timing helpers."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from epcnet_tpu.utils.logging import MetricsLogger
from epcnet_tpu.utils.profiling import maybe_start_trace, profile_region
from epcnet_tpu.utils.timing import device_sync, timeit


def test_profile_region_smoke():
    with profile_region("unit_test_region"):
        x = jnp.ones((8, 8)) * 2
    assert float(x[0, 0]) == 2.0


def test_maybe_start_trace_writes(tmp_path):
    d = str(tmp_path / "trace")
    with maybe_start_trace(d):
        jnp.ones((4, 4)).sum().block_until_ready()
    assert os.path.isdir(d) and len(os.listdir(d)) > 0
    with maybe_start_trace(None):  # no-op path
        pass


def test_metrics_logger(tmp_path):
    m = MetricsLogger(str(tmp_path), "unit")
    m.write(3, {"loss": jnp.float32(1.5), "note": "x"}, epoch=0)
    m.close()
    rec = json.loads(open(tmp_path / "unit.jsonl").read().strip())
    assert rec["step"] == 3 and rec["loss"] == 1.5 and rec["epoch"] == 0


def test_device_sync_and_timeit():
    x = jnp.ones((16, 16))
    device_sync({"a": x, "b": (x, x)})
    t = timeit(lambda: x + 1, iters=3, warmup=1)
    assert t > 0

def test_metrics_logger_tensorboard(tmp_path):
    """tensorboard=True mirrors numeric metrics as TB scalars (SURVEY §5.5 —
    the reference's tf.summary analogue); values read back from the event
    file must match what was written."""
    import glob

    from epcnet_tpu.utils.logging import MetricsLogger

    m = MetricsLogger(str(tmp_path), "train", tensorboard=True)
    m.write(3, {"loss": 1.25}, epoch=0)
    m.write(7, {"loss": 0.5}, epoch=1)
    m.close()

    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert files, "no TB event file written"

    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )

    seen = {}
    for ev in EventFileLoader(files[0]).Load():
        for v in getattr(ev.summary, "value", []):
            if v.tag == "train/loss":
                t = v.tensor
                import numpy as _np
                from tensorboard.util.tensor_util import make_ndarray

                seen[ev.step] = float(make_ndarray(t)) if t.dtype else v.simple_value
    assert seen.get(3) == 1.25 and seen.get(7) == 0.5


def test_compilation_cache_explicit_dir(tmp_path):
    """enable_compilation_cache writes persisted executables under the dir."""
    from epcnet_tpu.utils.compile_cache import enable_compilation_cache

    d = str(tmp_path / "cc")
    try:
        assert enable_compilation_cache(d, min_compile_time_secs=0.0) == d
        f = jax.jit(lambda x: (x @ x.T) * 3 + 1)
        f(jnp.ones((16, 16), jnp.float32)).block_until_ready()
        assert os.listdir(d), "no cache entries persisted"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def test_compilation_cache_env_and_off(tmp_path, monkeypatch):
    from epcnet_tpu.utils import compile_cache

    monkeypatch.delenv(compile_cache.ENV_VAR, raising=False)
    assert compile_cache.enable_compilation_cache(None) is None  # off: no-op

    envdir = str(tmp_path / "envcc")
    monkeypatch.setenv(compile_cache.ENV_VAR, envdir)
    try:
        assert compile_cache.enable_compilation_cache(None) == envdir
        assert os.path.isdir(envdir)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
