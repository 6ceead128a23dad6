"""TPU-native equivalents of the PointNet++-family CUDA ops (SURVEY.md §2.2).

Reference equivalents (all [LINEAGE], per-op):
  - N2 ``farthest_point_sample`` / ``gather_point``:
      tf_ops/sampling/tf_sampling.cpp + tf_sampling_g.cu
  - N1 ``query_ball_point`` / ``group_point``:
      tf_ops/grouping/tf_grouping.cpp + tf_grouping_g.cu
  - N3 ``three_nn`` / ``three_interpolate``:
      tf_ops/3d_interpolation/tf_interpolate.cpp

EPC-Net's own forward needs none of these (it keeps all 4096 points and uses
kNN only — SURVEY.md §2.2 note), but they are part of the model family's
native-op surface, so the framework provides them. They are pure-XLA: FPS is
a ``lax.fori_loop`` over a running min-distance field (sequential by nature
but tiny at <=4096 points); everything else is distance matmuls + masked
selects, and gradients come from JAX autodiff instead of the reference's
hand-registered CUDA gradient kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from epcnet_tpu.ops.pairwise import pairwise_sqdist


@functools.partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Iterative max-min FPS. xyz: [..., N, 3] -> idx [..., npoint] int32.

    Matches the reference semantics of tf_sampling_g.cu's farthestpointsampling
    kernel: the first selected point is index 0 (deterministic).
    """

    def single(pts):
        n = pts.shape[0]

        def body(i, carry):
            idx, mind = carry
            last = pts[idx[i - 1]]
            d = jnp.sum((pts - last) ** 2, axis=-1)
            mind = jnp.minimum(mind, d)
            nxt = jnp.argmax(mind).astype(jnp.int32)
            idx = idx.at[i].set(nxt)
            return idx, mind

        idx0 = jnp.zeros((npoint,), jnp.int32)
        mind0 = jnp.full((n,), jnp.inf, jnp.float32)
        idx, _ = jax.lax.fori_loop(1, npoint, body, (idx0, mind0))
        return idx

    lead = xyz.shape[:-2]
    flat = xyz.reshape((-1,) + xyz.shape[-2:]).astype(jnp.float32)
    out = jax.vmap(single)(flat)
    return out.reshape(lead + (npoint,))


def gather_point(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points [..., N, C], idx [..., M] -> [..., M, C].

    Reference: ``gather_point`` in tf_sampling.py [LINEAGE]; gradient is
    automatic here (scatter-add via autodiff of gather).
    """
    return jnp.take_along_axis(points, idx[..., None], axis=-2)


def prob_sample(inp: jnp.ndarray, inpr: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF categorical sampling: draw indices from a probability row.

    Reference: ``prob_sample`` in tf_sampling.py / the ``cumsumKernel`` +
    ``binarysearchKernel`` pair in tf_sampling_g.cu [LINEAGE]: build the
    cumulative sum of each probability row, then for every uniform draw
    ``r`` return the smallest index ``i`` with ``cumsum[i] >= r``. The
    reference does not normalize — callers pass rows summing to 1 — and we
    keep that contract (draws past the final cumsum clamp to the last
    index, matching the CUDA kernel's bounded binary search).

    Args: inp [..., N] probabilities; inpr [..., M] uniform draws in [0, 1).
    Returns: idx [..., M] int32.

    TPU-native shape: one ``cumsum`` + a broadcast compare/argmax instead of
    a per-draw binary search — N is small (<=4096) so the [M, N] compare is
    a single vectorized pass, and the whole op fuses under jit.
    """
    cdf = jnp.cumsum(inp.astype(jnp.float32), axis=-1)  # [..., N]
    # smallest i with cdf[i] >= r  ==  argmax of the boolean row (first True);
    # an all-False row (r beyond the total mass) argmaxes to 0, so clamp it
    # to the last index explicitly.
    hit = cdf[..., None, :] >= inpr[..., :, None].astype(jnp.float32)
    idx = jnp.argmax(hit, axis=-1).astype(jnp.int32)
    n = inp.shape[-1]
    return jnp.where(jnp.any(hit, axis=-1), idx, n - 1)


def ball_query(
    radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> jnp.ndarray:
    """Radius neighbourhood with pad-by-first-hit.

    Reference: ``query_ball_point`` in tf_grouping_g.cu [LINEAGE]: for each
    query, up to ``nsample`` in-radius point indices in ascending index order;
    if fewer than ``nsample`` hits, the first hit is repeated.

    Args: xyz [..., N, 3] all points; new_xyz [..., M, 3] query centres.
    Returns: idx [..., M, nsample] int32.
    """
    n = xyz.shape[-2]
    d = pairwise_sqdist(new_xyz, xyz)  # [..., M, N]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    in_ball = d <= radius * radius
    ranked = jnp.where(in_ball, col, n)  # out-of-ball -> sentinel n
    ranked = jnp.sort(ranked, axis=-1)[..., :nsample]  # ascending index order
    first = ranked[..., :1]  # first hit (or sentinel if none)
    idx = jnp.where(ranked == n, first, ranked)
    # Queries with zero hits: reference leaves garbage; we clamp to 0.
    return jnp.where(idx == n, 0, idx).astype(jnp.int32)


def group_point(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points [..., N, C], idx [..., M, K] -> [..., M, K, C].

    Reference: ``group_point`` in tf_grouping.py [LINEAGE] with its
    scatter-add gradient — autodiff supplies that here.
    """
    return jnp.take_along_axis(points[..., None, :, :], idx[..., None], axis=-2)


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray):
    """3 nearest neighbours of each ``unknown`` point among ``known``.

    Reference: ``three_nn`` in tf_interpolate.cpp [LINEAGE].
    Returns (dists [..., N, 3] sq-distances, idx [..., N, 3]).
    """
    d = pairwise_sqdist(unknown, known)
    neg, idx = jax.lax.top_k(-d, 3)
    return -neg, idx.astype(jnp.int32)


def three_interpolate(
    points: jnp.ndarray, idx: jnp.ndarray, dists: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Inverse-distance-weighted interpolation over the 3-NN.

    Reference: ``three_interpolate`` in tf_interpolate.cpp [LINEAGE]: weights
    are 1/d normalized over the three neighbours.
    """
    w = 1.0 / (dists + eps)  # [..., N, 3]
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    nbr = group_point(points, idx)  # [..., N, 3, C]
    return jnp.sum(nbr * w[..., None], axis=-2)
