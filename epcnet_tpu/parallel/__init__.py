"""L2 distributed substrate (SURVEY.md §2.3 / §5.8).

The reference is single-process single-GPU with NO communication backend
[LINEAGE]. Here the entire comm layer is XLA collectives addressed through
``jax.sharding.Mesh`` + jit shardings / shard_map: gradients psum over the
"data" axis, retrieval merges per-shard top-k over the "db" axis — all over
ICI. No custom transport is (or should be) written.
"""

from epcnet_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from epcnet_tpu.parallel.multislice import (
    PreemptionGuard,
    make_multislice_mesh,
    maybe_initialize_distributed,
    retrieval_db_axis,
    slice_groups,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "PreemptionGuard",
    "make_multislice_mesh",
    "maybe_initialize_distributed",
    "retrieval_db_axis",
    "slice_groups",
]
