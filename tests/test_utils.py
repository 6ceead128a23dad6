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
