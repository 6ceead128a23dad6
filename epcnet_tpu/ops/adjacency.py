"""Neighborhood mean via dense normalized adjacency — the TPU-native ProxyConv
substrate.

Reference equivalent: the ProxyConv module gathers each point's K neighbour
features and averages them ("proxy point") [LINEAGE: models/ proxy_conv();
PAPER §III-B]. On GPU that is a [N, K, C] gather. On TPU, irregular gathers
are HBM-bandwidth-bound and MXU-hostile, so we instead build the
row-normalized adjacency matrix A (A[i, j] = |{k : idx[i,k]=j}| / K) ONCE per
forward pass (the kNN graph is static across layers — the paper's whole
point) and compute every layer's neighbour-mean as the dense matmul
``A @ F`` on the MXU in bf16. At N=4096, A is 32 MB bf16 and each layer's
mean costs ~2·N²·C FLOPs — microseconds on the MXU versus an irregular
20-way gather per point. The mean-commutes-with-linear-map trick [PAPER
§III-B] is preserved: we still never materialize [N, K, C] edge features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mean_adjacency(idx: jnp.ndarray, n: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dense row-normalized adjacency from kNN indices.

    Args:
      idx: [..., N, K] int32 neighbour indices (duplicates allowed — they are
        counted with multiplicity, matching gather-then-mean semantics).
      n: number of points (columns of A).

    Returns:
      A: [..., N, n] with rows summing to 1 (computed fp32, cast to dtype).
    """
    k = idx.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, idx.shape[:-1] + (n,), idx.ndim - 1)
    acc = jnp.zeros(idx.shape[:-1] + (n,), jnp.float32)
    # Unrolled over K: K compares of an [N, n] slab each — VPU-friendly and
    # XLA-fusable; avoids both a [N, K, n] one-hot blowup and a serial scatter.
    for j in range(k):
        acc = acc + (idx[..., j : j + 1] == col).astype(jnp.float32)
    return (acc / float(k)).astype(dtype)


def neighbor_mean(
    features: jnp.ndarray,
    idx: jnp.ndarray | None = None,
    adjacency: jnp.ndarray | None = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Per-point mean of neighbour features (the "proxy point").

    Either via a precomputed dense ``adjacency`` (MXU path — preferred; build
    it once with :func:`mean_adjacency` and reuse across layers) or by
    explicit gather over ``idx`` (oracle path; matches reference
    gather-then-mean semantics exactly).
    """
    if adjacency is not None:
        f = features.astype(compute_dtype)
        out = jnp.einsum(
            "...nm,...mc->...nc",
            adjacency.astype(compute_dtype),
            f,
            preferred_element_type=jnp.float32,
        )
        return out.astype(features.dtype)
    if idx is None:
        raise ValueError("need idx or adjacency")
    # [..., 1, N, C] gathered along the point axis by [..., N, K, 1] -> [..., N, K, C]
    nbr = jnp.take_along_axis(features[..., None, :, :], idx[..., None], axis=-2)
    return jnp.mean(nbr, axis=-2)
