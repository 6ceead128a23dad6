"""Device-mesh construction and common shardings."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from epcnet_tpu.configs import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Build the (data, db) mesh. data_axis=-1 takes every device not used
    by the db axis."""
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    db = max(1, cfg.db_axis)
    data = cfg.data_axis if cfg.data_axis > 0 else n // db
    if data * db != n:
        raise ValueError(f"mesh {data}x{db} != {n} devices")
    arr = np.asarray(devices).reshape(data, db)
    return Mesh(arr, cfg.axis_names)


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
