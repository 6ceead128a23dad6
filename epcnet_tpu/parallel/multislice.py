"""Multi-slice (DCN) meshes, jax.distributed bootstrap, preemption safety.

Reference equivalent: none — the reference is single-process/single-GPU and
a preemption simply kills the run (SURVEY.md §2.3 comm-backend row, §5.3).
This module is the TPU-native upgrade for pod/multi-slice deployments:

- ``maybe_initialize_distributed``: one-call ``jax.distributed`` bootstrap
  for multi-process (multi-host or multi-slice) runs; a no-op in the common
  single-process case, so every CLI can call it unconditionally.
- ``make_multislice_mesh``: the same ("data", "db") mesh the rest of the
  codebase uses, but with the data axis ordered slice-major. XLA recognises
  the DCN domain boundary from device order and emits hierarchical
  collectives: gradient psum = reduce within each slice over ICI + one small
  cross-slice phase over DCN (SURVEY.md §5.8). No other code changes — every
  NamedSharding in the package works unchanged.
- ``PreemptionGuard``: SIGTERM/SIGINT -> cooperative stop flag. The Trainer
  polls it after each dispatch and turns a preemption notice into a clean
  Orbax checkpoint + early return; ``--restore`` then resumes mid-epoch
  exactly (SURVEY.md §5.3 "optional multi-slice preemption handling").
"""

from __future__ import annotations

import os
import signal

import numpy as np

import jax
from jax.sharding import Mesh

from epcnet_tpu.configs import MeshConfig
from epcnet_tpu.parallel.mesh import make_mesh


def maybe_initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialise ``jax.distributed`` when a multi-process run is requested.

    Arguments fall back to ``EPCNET_COORDINATOR_ADDRESS`` /
    ``EPCNET_NUM_PROCESSES`` / ``EPCNET_PROCESS_ID`` env vars. Alternatively
    set ``EPCNET_DISTRIBUTED=1`` with none of the above to invoke jax's
    no-argument cluster auto-detection (TPU pods). Returns True iff
    distributed init ran. Single-process runs (nothing configured) are a
    no-op, so CLIs call this unconditionally — and they must call it BEFORE
    any JAX computation initialises the XLA backend.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "EPCNET_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        raw = os.environ.get("EPCNET_NUM_PROCESSES")
        num_processes = int(raw) if raw else None
    if process_id is None:
        raw = os.environ.get("EPCNET_PROCESS_ID")
        process_id = int(raw) if raw else None
    if coordinator_address is None and num_processes in (None, 1):
        if os.environ.get("EPCNET_DISTRIBUTED", "") in ("1", "true", "auto"):
            jax.distributed.initialize()  # pod cluster auto-detection
            return True
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def slice_groups(devices, slice_index_fn=None) -> list[list]:
    """Group devices by TPU slice (= DCN domain), slice-index-sorted.

    Multi-slice TPU platforms expose ``device.slice_index``; everything else
    (CPU meshes, single slice) lands in one group. ``slice_index_fn`` lets
    tests inject a synthetic slice assignment on CPU devices.
    """
    fn = slice_index_fn or (lambda d: getattr(d, "slice_index", None) or 0)
    groups: dict[int, list] = {}
    for d in devices:
        groups.setdefault(fn(d), []).append(d)
    return [groups[k] for k in sorted(groups)]


def retrieval_db_axis(devices=None, slice_index_fn=None) -> int:
    """Largest valid "db" axis for a retrieval-only mesh.

    The db axis must stay intra-slice (``make_multislice_mesh`` raises
    otherwise): the top-k all-gather merge rides ICI, never DCN. A
    serving/eval CLI that defaults "all devices onto db" would therefore
    crash at mesh construction on any multi-slice pod — cap the default at
    the per-slice device count instead, leaving the slice dimension on the
    data axis (which evaluation uses for batch-embedding anyway).
    """
    devices = list(devices) if devices is not None else jax.devices()
    return len(slice_groups(devices, slice_index_fn)[0])


def make_multislice_mesh(
    cfg: MeshConfig | None = None, devices=None, slice_index_fn=None
) -> Mesh:
    """("data", "db") mesh whose data axis is slice-major.

    Single-slice inputs delegate to :func:`make_mesh` (identical result).
    Multi-slice: each slice contributes a contiguous [per_slice_data, db]
    block, stacked along the data axis, so any collective over "data"
    decomposes into an intra-slice ICI phase + a cross-slice DCN phase.
    The db axis never crosses slices — retrieval's all-gather top-k merge
    stays on ICI by construction.
    """
    cfg = cfg or MeshConfig()
    devices = list(devices) if devices is not None else jax.devices()
    groups = slice_groups(devices, slice_index_fn)
    if len(groups) == 1:
        return make_mesh(cfg, devices)
    per = len(groups[0])
    if any(len(g) != per for g in groups):
        raise ValueError(
            f"unequal devices per slice: {[len(g) for g in groups]}"
        )
    db = max(1, cfg.db_axis)
    if per % db != 0:
        raise ValueError(f"db axis {db} does not divide per-slice count {per}")
    if cfg.data_axis > 0 and cfg.data_axis != len(groups) * (per // db):
        raise ValueError(
            f"data_axis={cfg.data_axis} != {len(groups)} slices x {per // db}"
        )
    arr = np.stack([np.asarray(g).reshape(per // db, db) for g in groups])
    return Mesh(arr.reshape(len(groups) * (per // db), db), cfg.axis_names)


class PreemptionGuard:
    """Turn SIGTERM/SIGINT into a cooperative stop flag.

    Cloud TPU preemptions deliver SIGTERM with a grace window; the guard
    records the request and the Trainer (polling ``guard()`` after each
    dispatch) saves a checkpoint and returns instead of dying mid-step.
    Context manager restores the previous handlers on exit. Also usable as
    the ``should_stop`` callable directly.

    The SECOND signal aborts hard (KeyboardInterrupt): the flag is only
    polled between dispatches, so a run stuck pre-dispatch (a long compile)
    must stay interruptible — one Ctrl+C means "checkpoint then stop",
    two mean "stop NOW".
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._signals = tuple(signals)
        self._old: dict = {}
        self.requested = False

    def _handle(self, signum, frame):
        if self.requested:
            raise KeyboardInterrupt  # second signal: abort hard
        self.requested = True
        print(
            "[preemption] will checkpoint after the in-flight dispatch and "
            "stop; signal again to abort immediately",
            flush=True,
        )

    def __enter__(self) -> "PreemptionGuard":
        for s in self._signals:
            self._old[s] = signal.signal(s, self._handle)
        return self

    def __exit__(self, *exc) -> bool:
        for s, old in self._old.items():
            signal.signal(s, old)
        self._old.clear()
        return False

    def __call__(self) -> bool:
        return self.requested
