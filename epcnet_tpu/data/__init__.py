"""L1 data plane (SURVEY.md §2.1 P1–P4): .bin submap IO, augmentation,
training-tuple / test-set generation, synthetic fixtures, and an async
prefetching loader (the reference feeds the GPU through a synchronous TF1
feed_dict — a known bottleneck this package removes, SURVEY.md §3.1)."""

from epcnet_tpu.data.pointclouds import (
    load_pc_file,
    load_pc_files,
    rotate_point_cloud,
    jitter_point_cloud,
)
from epcnet_tpu.data.tuples import (
    TrainingTuples,
    construct_query_dict,
    construct_query_and_database_sets,
    save_pickle,
    load_pickle,
)
from epcnet_tpu.data.synthetic import generate_synthetic_dataset
from epcnet_tpu.data.loader import TupleLoader, get_query_tuple

__all__ = [
    "load_pc_file",
    "load_pc_files",
    "rotate_point_cloud",
    "jitter_point_cloud",
    "TrainingTuples",
    "construct_query_dict",
    "construct_query_and_database_sets",
    "save_pickle",
    "load_pickle",
    "generate_synthetic_dataset",
    "TupleLoader",
    "get_query_tuple",
]
