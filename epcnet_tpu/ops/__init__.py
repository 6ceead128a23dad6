"""L0 compute ops: pure-jnp reference ("oracle") implementations plus Pallas
TPU kernels for the hot paths (SURVEY.md §7.1 kernels/).

Every Pallas kernel has a pure-jnp twin used as its correctness oracle in
tests; `impl="auto"` picks Pallas on TPU and jnp elsewhere.
"""

from epcnet_tpu.ops.pairwise import pairwise_sqdist
from epcnet_tpu.ops.knn import knn, knn_jnp, knn_pallas, knn_adjacency, knn_with_adjacency_pallas
from epcnet_tpu.ops.adjacency import mean_adjacency, neighbor_mean
from epcnet_tpu.ops.vlad import vlad_aggregate, vlad_aggregate_jnp
from epcnet_tpu.ops.sampling import (
    farthest_point_sample,
    gather_point,
    prob_sample,
    ball_query,
    group_point,
    three_nn,
    three_interpolate,
)
from epcnet_tpu.ops.retrieval import l2_distance_matrix, topk_neighbors, sharded_topk_neighbors, ring_topk_neighbors, ring_knn_points, quantize_descriptors, dequantize_descriptors, quantized_distance_matrix, topk_neighbors_quantized

__all__ = [
    "pairwise_sqdist",
    "knn",
    "knn_jnp",
    "knn_pallas",
    "knn_adjacency",
    "knn_with_adjacency_pallas",
    "mean_adjacency",
    "neighbor_mean",
    "vlad_aggregate",
    "vlad_aggregate_jnp",
    "farthest_point_sample",
    "gather_point",
    "prob_sample",
    "ball_query",
    "group_point",
    "three_nn",
    "three_interpolate",
    "l2_distance_matrix",
    "topk_neighbors",
    "sharded_topk_neighbors",
    "ring_topk_neighbors",
    "ring_knn_points",
    "quantize_descriptors",
    "dequantize_descriptors",
    "quantized_distance_matrix",
    "topk_neighbors_quantized",
]
