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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    return (count_adjacency(idx, n, jnp.float32) / float(k)).astype(dtype)


def count_adjacency(idx: jnp.ndarray, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """UNNORMALIZED adjacency counts (multiplicity of each column in each
    row's neighbour list) — exact small integers in any float dtype. The
    indicator consumers (kNN indices are distinct, so counts ARE 0/1) use
    this directly: the old divide-by-k-then-multiply round trip produced
    1.0000001-style entries for non-power-of-2 k in fp32, breaking bit
    parity with the TPU kernel's exact 0/1 output."""
    if n <= 2 * _LANE:
        return _count_adjacency_direct(idx, n, dtype)
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
    return a.astype(dtype)


def _count_adjacency_direct(idx: jnp.ndarray, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Direct K-compare construction (oracle twin + small-n path)."""
    k = idx.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, idx.shape[:-1] + (n,), idx.ndim - 1)
    acc = jnp.zeros(idx.shape[:-1] + (n,), jnp.float32)
    for j in range(k):
        acc = acc + (idx[..., j : j + 1] == col).astype(jnp.float32)
    return acc.astype(dtype)


# ----------------------------------------------------------------------------
# Bit-packed adjacency (1 bit/entry — 8x less HBM than int8)
# ----------------------------------------------------------------------------
#
# Bit-plane layout: for words w in [0, W) with W = n/32, bit j of word w
# encodes column j*W + w. Unpacking a bit-plane j is then a pure LANE SLICE
# ((packed >> j) & 1 covers columns [j*W, (j+1)*W)) — no transpose, which
# Mosaic would not lower for narrow int tiles. At n=4096, W=128: one native
# lane register per plane, and the unpack-dot consumer kernel runs 32
# [tile, 128] @ [128, C] MXU passes per tile (same FLOPs as the dense matmul,
# 1/8 the adjacency bytes).

_PLANES = 32


def pack_indicator(indicator: jnp.ndarray) -> jnp.ndarray:
    """Oracle packer: 0/1 indicator [..., N, n] -> [..., N, n/32] int32.

    ``n`` must be divisible by 32. Bit-plane layout (see above).
    """
    *lead, n = indicator.shape
    if n % _PLANES:
        raise ValueError(f"columns {n} not divisible by {_PLANES}")
    w = n // _PLANES
    # threshold, don't truncate: a float indicator of (1/k)*k can land at
    # 0.99999994 in fp32 (k=41,47,...), and astype(int32) would silently
    # zero the whole adjacency; counts >= 1 (duplicate neighbours) all
    # pack to bit 1
    bits = (indicator.reshape(*lead, _PLANES, w) > 0.5).astype(jnp.int32)
    packed = jnp.zeros((*lead, w), jnp.int32)
    for j in range(_PLANES):
        packed = packed | (bits[..., j, :] << j)
    return packed


def unpack_indicator(packed: jnp.ndarray, dtype=jnp.int8) -> jnp.ndarray:
    """Oracle unpacker: [..., N, W] int32 -> 0/1 indicator [..., N, 32*W]."""
    w = packed.shape[-1]
    planes = [((packed >> j) & 1) for j in range(_PLANES)]
    return (
        jnp.stack(planes, axis=-2)
        .reshape(*packed.shape[:-1], _PLANES * w)
        .astype(dtype)
    )


def _packed_mean_kernel(p_ref, f_ref, out_ref, *, w: int, k: int, dtype):
    """Per tile: unpack the 32 bit-planes (each a [tile, W] lane slice) into
    one wide [tile, 32*W] mask in VMEM (compute dtype — bf16 default, fp32
    for compute_dtype='float32' parity), then ONE MXU dot against F — fp32
    accumulation, 1/K scale. One big dot pipelines far better than 32
    [tile, W] @ [W, C] partial dots (measured 2x on v5e)."""
    p = p_ref[0]  # [tile_n, W] int32
    f = f_ref[0].astype(dtype)  # [n_cols, C]
    mask = jnp.concatenate(
        [((p >> j) & 1).astype(dtype) for j in range(_PLANES)], axis=1
    )  # [tile_n, 32*W] — plane j occupies columns [j*W, (j+1)*W)
    acc = jax.lax.dot_general(
        mask, f, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[0] = (acc * jnp.float32(1.0 / k)).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "interpret", "dtype")
)
def _packed_mean_pallas(packed, features, k: int, tile_n: int, interpret: bool,
                        dtype=jnp.bfloat16):
    b, nrows, w = packed.shape
    _, ncols, c = features.shape
    grid = (b, nrows // tile_n)
    return pl.pallas_call(
        functools.partial(_packed_mean_kernel, w=w, k=k, dtype=dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, w), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncols, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nrows, c), features.dtype),
        interpret=interpret,
    )(packed, features)


def packed_neighbor_mean(
    features: jnp.ndarray,
    packed: jnp.ndarray,
    k: int,
    tile_n: int = 256,
    interpret: bool | None = None,
    impl: str = "auto",
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Neighbour mean through the bit-packed adjacency.

    The A rows live in HBM at 1 bit/entry; the kernel unpacks each bit-plane
    as a lane slice in VMEM and feeds the MXU — same FLOPs and fp32
    accumulation as the dense ``neighbor_mean`` matmul with 1/8 the adjacency
    bytes. EVAL/EMBED path only: no autodiff rule (training keeps the dense
    int8 operand, whose gradient XLA derives).

    Args:
      features: [..., N, C]; N must equal 32 * packed.shape[-1] (zero-pad
        feature rows if A was built over padded columns).
      packed: [..., N_rows, W] int32 bit-planes (ops/knn.py packed output or
        :func:`pack_indicator`).
      k: neighbour count (the mean's 1/K scale).

    Returns [..., N_rows, C] in features.dtype.
    """
    from epcnet_tpu.ops.knn import _on_tpu  # one backend predicate everywhere

    if impl == "auto":
        impl = "pallas" if _on_tpu() else "jnp"
    if impl == "jnp":
        ind = unpack_indicator(packed, dtype=dtype)
        return neighbor_mean(
            features, adjacency=ind, compute_dtype=dtype,
            adjacency_scale=1.0 / k,
        )
    if interpret is None:
        interpret = not _on_tpu()
    *lead, nrows, w = packed.shape
    ncols, c = features.shape[-2], features.shape[-1]
    if ncols != _PLANES * w:
        raise ValueError(f"features rows {ncols} != {_PLANES}*{w} packed columns")
    b = 1
    for s in lead:
        b *= s
    tile_n = min(tile_n, nrows)
    if nrows % tile_n:
        tile_n = nrows  # single tile for odd-sized test shapes
    out = _packed_mean_pallas(
        packed.reshape(b, nrows, w),
        features.reshape(b, ncols, c),
        k, tile_n, interpret, dtype=jnp.dtype(dtype),
    )
    return out.reshape(*lead, nrows, c)


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


def gather_neighbor_mean(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Neighbour mean straight from the [..., N, K] kNN id lists — no
    adjacency in ANY layout ever exists.

    The single-chip >32k-point capacity rung (adjacency_format="gather",
    models/epcnet.py): at N where even the bit-packed [N, N/32] planes are
    too big to build or consume, the per-layer cost drops to one
    [..., N, K, C] gather + fp32-accumulated mean (same arithmetic as the
    points-sharded shard body, models/points_sharded.py). Differentiable
    (gather transposes to scatter-add), so this path trains too.
    """
    nbr = jnp.take_along_axis(features[..., None, :, :], idx[..., None], axis=-2)
    k = idx.shape[-1]
    return (
        jnp.sum(nbr.astype(jnp.float32), axis=-2) * (1.0 / k)
    ).astype(features.dtype)
