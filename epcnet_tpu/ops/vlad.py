"""(G-)VLAD aggregation core: soft-assignment softmax + residual accumulation
+ intra-normalization.

Reference equivalent: the NetVLAD forward in the PointNetVLAD-heritage
aggregation class [LINEAGE: models/ NetVLAD/lpd-style layer; PAPER §III-C]:
``V[k] = sum_i a_ik (x_i - c_k)``, intra-normalize each cluster row, flatten,
L2-normalize.

TPU-native shape: ``V = A^T X - (sum_i a_ik) c_k`` — two MXU matmuls plus an
O(C·D) correction, so the [N, K_clusters, D] residual tensor of the naive
formulation never exists. The Pallas kernel fuses the softmax with the
``A^T X`` accumulation tile-by-tile over the point axis (one pass over the
features in VMEM); the cheap rank-1 correction and normalizations run in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _finish(s: jnp.ndarray, asum: jnp.ndarray, centroids: jnp.ndarray, eps: float):
    """Shared tail: residual correction, intra-norm, flatten, L2-norm."""
    v = s - asum[..., None] * centroids  # [..., C, D]
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)  # intra-norm
    flat = v.reshape(*v.shape[:-2], -1)  # [..., C*D]
    return flat / (jnp.linalg.norm(flat, axis=-1, keepdims=True) + eps)


def vlad_aggregate_jnp(
    features: jnp.ndarray,
    logits: jnp.ndarray,
    centroids: jnp.ndarray,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Oracle VLAD.

    Args:
      features: [..., N, D] per-point features.
      logits: [..., N, C] pre-softmax cluster assignment logits.
      centroids: [C, D] cluster centres.

    Returns:
      [..., C*D] L2-normalized VLAD vector (fp32).
    """
    f = features.astype(jnp.float32)
    a = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)  # [..., N, C]
    s = jnp.einsum(
        "...nc,...nd->...cd",
        a,
        f,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    asum = jnp.sum(a, axis=-2)  # [..., C]
    return _finish(s, asum, centroids.astype(jnp.float32), eps)


# ----------------------------------------------------------------------------
# Pallas fused softmax + accumulate kernel
# ----------------------------------------------------------------------------


def _vlad_kernel(logits_ref, f_ref, s_ref):
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _():
        s_ref[0] = jnp.zeros_like(s_ref[0])

    z = logits_ref[0].astype(jnp.float32)  # [TN, Cpad] (pad cols = -inf)
    z = z - jnp.max(z, axis=-1, keepdims=True)
    e = jnp.exp(z)
    a = e / jnp.sum(e, axis=-1, keepdims=True)
    f = f_ref[0].astype(jnp.float32)  # [TN, D]
    s_ref[0] += jax.lax.dot_general(
        a,
        f,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Cpad, D]


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def _vlad_accum_pallas(logits_pad, f, tile_n: int, interpret: bool):
    b, npad, cpad = logits_pad.shape
    d = f.shape[-1]
    grid = (b, npad // tile_n)
    return pl.pallas_call(
        _vlad_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, cpad), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cpad, d), lambda bi, qi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cpad, d), jnp.float32),
        interpret=interpret,
    )(logits_pad, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def vlad_aggregate_pallas(
    features: jnp.ndarray,
    logits: jnp.ndarray,
    centroids: jnp.ndarray,
    eps: float = 1e-12,
    tile_n: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = not _on_tpu()
    *lead, n, d = features.shape
    c = logits.shape[-1]
    b = 1
    for sdim in lead:
        b *= sdim
    f = features.reshape(b, n, d).astype(jnp.float32)
    lg = logits.reshape(b, n, c).astype(jnp.float32)

    tile_n = min(tile_n, max(8, n))
    npad = -(-n // tile_n) * tile_n
    cpad = max(_LANE, -(-c // _LANE) * _LANE)
    # Pad assignment columns with -inf so they get zero softmax mass.
    lg = jnp.pad(lg, ((0, 0), (0, npad - n), (0, cpad - c)), constant_values=-1e30)
    if npad > n:
        # Padded rows: one finite logit (col 0) so softmax is well-defined;
        # they one-hot onto cluster 0 but their features are zero, so S is
        # untouched, and asum below is computed from the unpadded logits.
        row_is_pad = (jnp.arange(npad) >= n)[None, :, None]
        col0 = (jnp.arange(cpad) == 0)[None, None, :]
        lg = jnp.where(row_is_pad & col0, 0.0, lg)
    f = jnp.pad(f, ((0, 0), (0, npad - n), (0, 0)))  # pad rows: zero features

    s = _vlad_accum_pallas(lg, f, tile_n, interpret)[:, :c, :]  # [b, C, D]
    # asum from the real (unpadded) logits — cheap O(N·C) on the VPU.
    a = jax.nn.softmax(logits.reshape(b, n, c).astype(jnp.float32), axis=-1)
    asum = jnp.sum(a, axis=-2)  # [b, C]
    # Padded rows contributed asum but ZERO features; correct S by removing
    # nothing (their feature contribution is exactly 0) — only centroids term
    # uses asum, which we computed pad-free above.
    out = _finish(s, asum, centroids.astype(jnp.float32), eps)
    return out.reshape(*lead, c * d)


def _vlad_pallas_fwd(features, logits, centroids, eps, tile_n, interpret):
    out = vlad_aggregate_pallas(features, logits, centroids, eps, tile_n, interpret)
    return out, (features, logits, centroids)


def _vlad_pallas_bwd(eps, tile_n, interpret, res, g):
    # Backward through the ORACLE math (identical function within fp
    # tolerance): pallas_call has no autodiff rule, and the backward is
    # matmul-shaped anyway, which XLA handles optimally.
    features, logits, centroids = res
    _, vjp = jax.vjp(
        lambda f, lg, c: vlad_aggregate_jnp(f, lg, c, eps), features, logits, centroids
    )
    return vjp(g)


vlad_aggregate_pallas.defvjp(_vlad_pallas_fwd, _vlad_pallas_bwd)


def vlad_aggregate(
    features: jnp.ndarray,
    logits: jnp.ndarray,
    centroids: jnp.ndarray,
    eps: float = 1e-12,
    impl: str = "auto",
) -> jnp.ndarray:
    if impl == "auto":
        # Measured on v5e: XLA's fused softmax+matmul beats the Pallas kernel
        # here (docs/KERNELS.md), so "auto" = XLA; pass "pallas" explicitly
        # to benchmark the kernel.
        impl = "jnp"
    if impl == "pallas":
        return vlad_aggregate_pallas(features, logits, centroids, eps=eps)
    return vlad_aggregate_jnp(features, logits, centroids, eps=eps)
