"""Pairwise squared Euclidean distances.

Reference equivalent: the "spatial adjacent matrix" computed once on input
xyz [LINEAGE: models/ pairwise_distance() in the DGCNN/EPC-Net family;
PAPER §III-A]. The reference materializes the full N×N matrix on GPU; here
the jnp version does the same (XLA fuses it), while the Pallas kNN kernel
(ops/knn.py) computes it blockwise so the full matrix never exists in HBM
(SURVEY.md §5.7).

Numerics: distances stay fp32 — bf16 distance ties reorder neighbors and
perturb descriptor topology (SURVEY.md §7.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Squared L2 distances between row sets.

    Args:
      a: [..., N, D]
      b: [..., M, D] (defaults to ``a``)

    Returns:
      [..., N, M] fp32, d[i, j] = ||a_i - b_j||^2 (clamped at 0).
    """
    if b is None:
        b = a
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if a.shape[-1] <= 8:
        # Small coordinate dims (xyz): accumulate (a_c - b_c)^2 per
        # coordinate. EXACT fp32 (no catastrophic cancellation: the norm
        # expansion leaves ~1e-6 residue on self-distances), never builds an
        # [N, M, D] tensor, and bit-matches the Pallas kNN kernel which uses
        # the same formula in the same coordinate order.
        d = jnp.zeros(a.shape[:-1] + (b.shape[-2],), jnp.float32)
        for c in range(a.shape[-1]):
            diff = a[..., :, c, None] - b[..., None, :, c]
            d = d + diff * diff
        return d
    a_sq = jnp.sum(a * a, axis=-1, keepdims=True)  # [..., N, 1]
    b_sq = jnp.sum(b * b, axis=-1, keepdims=True)  # [..., M, 1]
    # HIGHEST precision: TPU's default bf16 matmul perturbs distances by ~1e-3,
    # enough to reorder near-tied neighbours and break topology parity.
    cross = jnp.einsum(
        "...nd,...md->...nm",
        a,
        b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = a_sq - 2.0 * cross + jnp.swapaxes(b_sq, -1, -2)
    return jnp.maximum(d, 0.0)
