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


_LANE = 128


def mean_adjacency(idx: jnp.ndarray, n: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dense row-normalized adjacency from kNN indices.

    Args:
      idx: [..., N, K] int32 neighbour indices (duplicates allowed — they are
        counted with multiplicity, matching gather-then-mean semantics).
      n: number of points (columns of A).

    Returns:
      A: [..., N, n] with rows summing to 1 (computed fp32, cast to dtype).

    Construction trick: a 4096-wide one-hot costs N·K·n VPU compares, but
    splitting each index as ``idx = hi·128 + lo`` factors the one-hot into an
    OUTER PRODUCT of a ceil(n/128)-wide and a 128-wide one-hot —
    ``A = sum_k oh_hi(k) (x) oh_lo(k)`` — which is a tiny batched matmul the
    MXU eats: compares drop from N·K·n to N·K·(n/128 + 128), ~20x fewer.
    """
    k = idx.shape[-1]
    if n <= 2 * _LANE:
        return _mean_adjacency_direct(idx, n, dtype)
    h = -(-n // _LANE)
    npad = h * _LANE
    hi = idx // _LANE  # [..., N, K]
    lo = idx % _LANE
    oh_hi = (hi[..., None] == jnp.arange(h)).astype(jnp.bfloat16)  # [..., N, K, H]
    oh_lo = (lo[..., None] == jnp.arange(_LANE)).astype(jnp.bfloat16)  # [..., N, K, L]
    a = jnp.einsum(
        "...kh,...kl->...hl", oh_hi, oh_lo, preferred_element_type=jnp.float32
    )  # [..., N, H, L]
    a = a.reshape(*idx.shape[:-1], npad)[..., :n]
    return (a / float(k)).astype(dtype)


def _mean_adjacency_direct(idx: jnp.ndarray, n: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Direct K-compare construction (oracle twin + small-n path)."""
    k = idx.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, idx.shape[:-1] + (n,), idx.ndim - 1)
    acc = jnp.zeros(idx.shape[:-1] + (n,), jnp.float32)
    for j in range(k):
        acc = acc + (idx[..., j : j + 1] == col).astype(jnp.float32)
    return (acc / float(k)).astype(dtype)


def neighbor_mean(
    features: jnp.ndarray,
    idx: jnp.ndarray | None = None,
    adjacency: jnp.ndarray | None = None,
    compute_dtype=jnp.bfloat16,
    adjacency_scale: float | None = None,
) -> jnp.ndarray:
    """Per-point mean of neighbour features (the "proxy point").

    Either via a precomputed dense ``adjacency`` (MXU path — preferred; build
    it once and reuse across layers) or by explicit gather over ``idx``
    (oracle path; matches reference gather-then-mean semantics exactly).

    ``adjacency`` may be the 1/K-normalized matrix (adjacency_scale=None) or
    a 0/1 INDICATOR with ``adjacency_scale=1/K`` applied after the matmul —
    the indicator form is exact in any dtype (including int8, which halves
    the HBM read traffic of this [N, N] operand; the int8->bf16 convert
    fuses into the dot on TPU).
    """
    if adjacency is not None:
        f = features.astype(compute_dtype)
        out = jnp.einsum(
            "...nm,...mc->...nc",
            adjacency.astype(compute_dtype),
            f,
            preferred_element_type=jnp.float32,
        )
        if adjacency_scale is not None:
            out = out * jnp.float32(adjacency_scale)
        return out.astype(features.dtype)
    if idx is None:
        raise ValueError("need idx or adjacency")
    # [..., 1, N, C] gathered along the point axis by [..., N, K, 1] -> [..., N, K, C]
    nbr = jnp.take_along_axis(features[..., None, :, :], idx[..., None], axis=-2)
    return jnp.mean(nbr, axis=-2)
