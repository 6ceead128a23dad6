"""Timing helpers that are honest on every backend.

On the experimental axon-tunnel TPU platform in this image,
``Array.block_until_ready()`` returns before device execution finishes, so
naive timing measures dispatch, not compute. ``device_sync`` forces a host
transfer of one output leaf, which cannot complete until the computation
has; all framework benchmarks go through it.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def device_sync(tree) -> None:
    """Block until ``tree``'s computation has really finished.

    Transfers a SINGLE element of the last leaf: the tiny slice can only be
    produced after the computation completes, so it is a hard sync without
    paying tunnel bandwidth for the full array (a [B,N,128] output costs
    ~300 ms of pure transfer — that is NOT compute time)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        leaf = leaves[-1]
        for _ in range(getattr(leaf, "ndim", 0)):
            leaf = leaf[0]
        np.asarray(leaf)  # 1-element host transfer == hard sync


def timeit(fn, iters: int = 20, warmup: int = 2) -> float:
    """Median seconds per call of ``fn()`` with hard sync per call."""
    for _ in range(warmup):
        device_sync(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        device_sync(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timeit_pipelined(fn, iters: int = 20, warmup: int = 2) -> float:
    """Seconds per call in steady state: all calls enqueued, one final sync.
    This is the throughput number for pipelines that keep the device fed."""
    for _ in range(warmup):
        device_sync(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    device_sync(outs[-1])
    for o in outs:
        device_sync(o)
    return (time.perf_counter() - t0) / iters
