"""k-nearest-neighbour graph construction (the "spatial adjacency matrix").

Reference equivalent: pure-TF ``pairwise_distance`` + ``tf.nn.top_k`` in
models/ [LINEAGE; PAPER §III-A], computed ONCE on input xyz and reused by
every ProxyConv layer, plus the CUDA ``selection_sort`` kNN inside
tf_ops/grouping/tf_grouping_g.cu [LINEAGE] in the PointNet++ family.

TPU-native design (SURVEY.md §5.7 / §7.4): the Pallas kernel tiles the
query axis, computes each [TQ, N] fp32 distance slab via exact
per-coordinate diff^2 accumulation on the VPU (cheaper and more accurate
than the fp32-emulated MXU norm expansion at D=3), and extracts the K
nearest with an in-VMEM iterative min-extraction (K rounds of masked min),
so the full N x N matrix never round-trips through HBM. Tie-breaking matches
``jax.lax.top_k(-d)``: equal distances resolve to the lowest index first.

Distances are kept fp32 throughout — bf16 ties reorder neighbours and
perturb descriptor topology (SURVEY.md §7.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from epcnet_tpu.ops.pairwise import pairwise_sqdist

_COORD_PAD = 8  # pad the (tiny) coordinate axis up to one sublane
_LANE = 128


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


# ----------------------------------------------------------------------------
# jnp oracle
# ----------------------------------------------------------------------------


def knn_jnp(x: jnp.ndarray, k: int, return_dists: bool = False):
    """Oracle kNN: full pairwise matrix + top_k.

    Args:
      x: [..., N, D] point coordinates (or features).
      k: neighbours per point (self included at distance 0).

    Returns:
      idx [..., N, k] int32 (and dists [..., N, k] fp32 if requested),
      nearest-first.
    """
    d = pairwise_sqdist(x)
    neg_d, idx = jax.lax.top_k(-d, k)
    idx = idx.astype(jnp.int32)
    if return_dists:
        return idx, -neg_d
    return idx


# ----------------------------------------------------------------------------
# Pallas kernel
# ----------------------------------------------------------------------------


def _knn_adj_only_kernel(
    x_ref, xt_ref, adj_ref, proxy_ref=None, *, n: int, k: int, cp_real: int,
    pack: bool = False, proxy_dtype: str = "bfloat16",
):
    """Adjacency-only variant: VALUE-only rounds + threshold + adaptive trim.

    The model path consumes only the indicator adjacency — a SET, not an
    ordered list — so the k-th distance THRESHOLD suffices:
      1. k value-only min rounds (no per-round index select chain) peel
         distinct values; the final min T is >= the true k-th distance
         (equal when values are distinct, larger only across ties).
      2. ONE threshold compare d <= T -> candidate mask, count >= k.
      3. A data-adaptive while_loop removes lexicographically-largest
         (distance, index) candidates until each row holds exactly k — the k
         smallest under (d, idx) of a top-k superset IS the oracle top-k with
         its lowest-index tie-break, so the result is exact for any input;
         the loop runs 0 iterations on tie-free rows.
    Measured 9.0 ms vs 15.6 ms for the per-round-select variant at
    B=32 x 4096, k=20 (docs/KERNELS.md round-2 table).
    """
    q = x_ref[0].astype(jnp.float32)
    xt = xt_ref[0].astype(jnp.float32)
    tq = q.shape[0]
    d = jnp.zeros((tq, n), jnp.float32)
    for c in range(cp_real):
        diff = q[:, c : c + 1] - xt[c : c + 1, :]
        d = d + diff * diff
    dw = d
    m = jnp.zeros((tq, 1), jnp.float32)
    for _ in range(k):
        m = jnp.min(dw, axis=1, keepdims=True)
        dw = jnp.where(dw <= m, jnp.inf, dw)
    d_kept = jnp.where(d <= m, d, jnp.inf)
    cnt = jnp.sum(jnp.where(d_kept < jnp.inf, 1, 0), axis=1, keepdims=True)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)

    def cond(carry):
        _, c = carry
        return jnp.any(c > k)

    def body(carry):
        dd, c = carry
        mm = jnp.max(jnp.where(dd < jnp.inf, dd, -jnp.inf), axis=1, keepdims=True)
        cand = jnp.where(dd == mm, col_ids, -1)
        sel = jnp.max(cand, axis=1, keepdims=True)  # highest index leaves first
        over = c > k
        dd = jnp.where(over & (col_ids == sel), jnp.inf, dd)
        return dd, jnp.where(over, c - 1, c)

    d_kept, _ = jax.lax.while_loop(cond, body, (d_kept, cnt))
    mask = jnp.where(d_kept < jnp.inf, 1.0, 0.0)
    if pack:
        # bit-plane packing (ops/adjacency.py layout): bit j of word w is
        # column j*W + w, so each plane is a plain lane slice of the mask —
        # the adjacency leaves the kernel at 1 bit/entry (8x less HBM write
        # than int8; consumers unpack plane-wise in VMEM).
        w = n // 32
        maski = mask.astype(jnp.int32)
        acc = jnp.zeros((tq, w), jnp.int32)
        for j in range(32):
            acc = acc | (maski[:, j * w : (j + 1) * w] << j)
        adj_ref[0] = acc
    else:
        adj_ref[0] = mask.astype(adj_ref.dtype)
    if proxy_ref is not None:
        # Layer-0 ProxyConv proxy point = mean of the k nearest COORDS —
        # both operands are already in VMEM, so emitting it here saves the
        # model one full [N, N] int8 adjacency read from HBM (~0.6 ms at
        # B=32 x 4096). Same math/precision as the layer path: operands in
        # the model's compute dtype (bf16 default; fp32 for
        # compute_dtype="float32" configs so the TPU path matches the dense
        # fallback — ADVICE r2), fp32 accumulation, post-matmul 1/K scale.
        op_dt = jnp.dtype(proxy_dtype)
        p = jax.lax.dot_general(
            mask.astype(op_dt),
            xt.astype(op_dt),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(1.0 / k)
        pad = jnp.zeros((tq, proxy_ref.shape[-1] - p.shape[-1]), jnp.float32)
        proxy_ref[0] = jnp.concatenate([p, pad], axis=1).astype(proxy_ref.dtype)


def _knn_kernel(
    x_ref, xt_ref, idx_ref, dist_ref, adj_ref=None,
    *, n: int, k: int, kpad: int, cp_real: int
):
    """Blockwise distances + iterative top-k extraction, all in VMEM.

    K UNROLLED rounds of (min -> lowest-index-among-minima -> mask) over
    the flat [TQ, N] slab. Design notes from measured Mosaic behaviour:
    unrolling beats lax.fori_loop by ~1.4x; a two-level per-segment-cache
    variant was 8x SLOWER (3D masked reductions lower poorly); a pair-
    compacted half-width variant gained nothing (the loop is latency-bound);
    lax.top_k has no Mosaic lowering at all. Tie-breaking matches
    jax.lax.top_k (ascending distance, then ascending index).

    When ``adj_ref`` is given, the kernel also emits the row of the
    1/K-normalized adjacency matrix from one final ``d == inf`` compare
    (extracted entries were masked to +inf; real distances are finite) — the
    dense neighbour-mean operator (ops/adjacency.py) then costs one pass.
    """
    q = x_ref[0].astype(jnp.float32)  # [TQ, CP]
    xt = xt_ref[0].astype(jnp.float32)  # [CP, N]

    # Per-coordinate (q_c - x_c)^2 accumulation on the VPU: EXACT fp32,
    # bit-identical to the oracle's small-D pairwise_sqdist (same order),
    # and ~2x cheaper than the 6-pass HIGHEST-precision MXU expansion.
    tq = q.shape[0]
    d = jnp.zeros((tq, n), jnp.float32)
    for c in range(cp_real):
        diff = q[:, c : c + 1] - xt[c : c + 1, :]  # static slices (Mosaic gather is limited)
        d = d + diff * diff
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)

    # Mutating unrolled rounds (measured fastest: a read-only floor-based
    # variant was ~20% slower — its 3-compare freshness chain outweighs the
    # saved slab writes; pair-compaction and two-level caches lost too, see
    # docs/KERNELS.md). Extracted entries are masked to +inf, which doubles
    # as the adjacency encoding: real distances are finite, so the adjacency
    # row is ONE final `d == inf` compare instead of K accumulating selects.
    idx_cols = []
    dist_cols = []
    for _ in range(k):
        m = jnp.min(d, axis=1, keepdims=True)  # [TQ, 1]
        cand = jnp.where(d <= m, col_ids, n)
        sel = jnp.min(cand, axis=1, keepdims=True)  # lowest-index tie-break
        idx_cols.append(sel)
        dist_cols.append(m)
        d = jnp.where(col_ids == sel, jnp.inf, d)

    pad_i = jnp.zeros((tq, kpad - k), jnp.int32)
    pad_d = jnp.full((tq, kpad - k), jnp.inf, jnp.float32)
    idx_ref[0] = jnp.concatenate(idx_cols + [pad_i], axis=1)
    dist_ref[0] = jnp.concatenate(dist_cols + [pad_d], axis=1)
    if adj_ref is not None:
        # 0/1 INDICATOR (not 1/K-scaled): exact in int8, which halves the
        # HBM traffic of every downstream A@F read; consumers scale by 1/K
        # after the matmul (ops/adjacency.py neighbor_mean).
        adj_ref[0] = jnp.where(d == jnp.inf, 1.0, 0.0).astype(adj_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "tile_q", "interpret", "with_adjacency", "cp_real",
        "adjacency_only", "with_proxy", "pack", "proxy_dtype",
    ),
)
def _knn_pallas_batched(
    xp, k: int, tile_q: int, interpret: bool, with_adjacency: bool = False,
    cp_real: int = 3, adjacency_only: bool = False, with_proxy: bool = False,
    pack: bool = False, proxy_dtype: str = "bfloat16",
):
    b, npad, cp = xp.shape
    kpad = max(_LANE, -(-k // _LANE) * _LANE)
    xt = jnp.swapaxes(xp, -1, -2)  # [B, CP, Npad]
    grid = (b, npad // tile_q)
    in_specs = [
        pl.BlockSpec((1, tile_q, cp), lambda bi, qi: (bi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cp, npad), lambda bi, qi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if adjacency_only:
        if pack:
            w = npad // 32
            adj_spec = pl.BlockSpec((1, tile_q, w), lambda bi, qi: (bi, qi, 0),
                                    memory_space=pltpu.VMEM)
            adj_shape = jax.ShapeDtypeStruct((b, npad, w), jnp.int32)
        else:
            adj_spec = pl.BlockSpec((1, tile_q, npad), lambda bi, qi: (bi, qi, 0),
                                    memory_space=pltpu.VMEM)
            adj_shape = jax.ShapeDtypeStruct((b, npad, npad), jnp.int8)
        kern = functools.partial(
            _knn_adj_only_kernel, n=npad, k=k, cp_real=cp_real, pack=pack,
            proxy_dtype=proxy_dtype,
        )
        if not with_proxy:
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=in_specs,
                out_specs=adj_spec,
                out_shape=adj_shape,
                interpret=interpret,
            )(xp, xt)
        adj, proxy = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                adj_spec,
                pl.BlockSpec((1, tile_q, _LANE), lambda bi, qi: (bi, qi, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                adj_shape,
                jax.ShapeDtypeStruct((b, npad, _LANE), jnp.float32),
            ],
            interpret=interpret,
        )(xp, xt)
        return adj, proxy
    out_specs = [
        pl.BlockSpec((1, tile_q, kpad), lambda bi, qi: (bi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_q, kpad), lambda bi, qi: (bi, qi, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, npad, kpad), jnp.int32),
        jax.ShapeDtypeStruct((b, npad, kpad), jnp.float32),
    ]
    if with_adjacency:
        out_specs.append(
            pl.BlockSpec((1, tile_q, npad), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((b, npad, npad), jnp.int8))
    outs = pl.pallas_call(
        functools.partial(_knn_kernel, n=npad, k=k, kpad=kpad, cp_real=cp_real),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xp, xt)
    if with_adjacency:
        return outs
    return outs[0], outs[1]


def knn_pallas(
    x: jnp.ndarray,
    k: int,
    return_dists: bool = False,
    tile_q: int = 256,
    interpret: bool | None = None,
):
    """Blockwise Pallas kNN. Accepts [..., N, D]; D <= 8."""
    if interpret is None:
        interpret = not _on_tpu()
    *lead, n, d_in = x.shape
    if d_in > _COORD_PAD:
        raise ValueError(f"knn_pallas supports coordinate dim <= {_COORD_PAD}, got {d_in}")
    if k > n:
        raise ValueError(
            f"k={k} > n={n}: the padded far columns would silently fill the "
            "tail of every neighbour list (the jnp oracle raises here too)"
        )
    b = 1
    for s in lead:
        b *= s
    xb = x.reshape(b, n, d_in).astype(jnp.float32)

    tile_q, unit = _pad_unit(n, tile_q, bytes_per_elem=5)
    npad = -(-n // unit) * unit
    pad_n = npad - n
    # Padded DB points sit far away so they are never selected (requires n >= k).
    xb = jnp.pad(xb, ((0, 0), (0, pad_n), (0, 0)), constant_values=1e6)
    xb = jnp.pad(xb, ((0, 0), (0, 0), (0, _COORD_PAD - d_in)))

    # stop_gradient: the kNN graph is non-differentiable structure (as in the
    # reference), and pallas_call has no autodiff rule to trip over.
    xb = jax.lax.stop_gradient(xb)
    idx, dist = _knn_pallas_batched(xb, k, tile_q, interpret, cp_real=d_in)
    idx = idx[:, :n, :k].reshape(*lead, n, k)
    if return_dists:
        return idx, jax.lax.stop_gradient(dist[:, :n, :k].reshape(*lead, n, k))
    return idx


def _pad_unit(n: int, tile_q: int, bytes_per_elem: int) -> tuple[int, int]:
    """Resolve (tile_q, padding unit) for the blockwise kernels.

    The tile is clamped to a POWER OF TWO <= n before the VMEM fit: npad
    must be divisible by lcm(tile_q, 128), and a non-pow2 tile (e.g.
    tile_q=n=100) makes that lcm explode — a 100-point cloud used to pad to
    lcm(100, 128) = 3200 columns, 32x the arithmetic. With pow-2 tiles the
    unit is simply max(tile_q, 128).
    """
    import math

    pow2 = 1 << max(3, n.bit_length() - 1)  # largest pow2 <= n (min 8)
    if pow2 > n:
        pow2 //= 2
    tile_q = _fit_tile_to_vmem(
        min(tile_q, max(8, pow2)), n, bytes_per_elem=bytes_per_elem
    )
    return tile_q, tile_q * _LANE // math.gcd(tile_q, _LANE)


def packed_layout_supported(
    n: int, tile_q: int = 256, with_proxy: bool = True,
    proxy_dtype: str = "bfloat16",
) -> bool:
    """True iff ``fmt="packed"`` accepts N (the bit-plane layout tolerates
    no pad columns). Computed with the SAME tile/unit resolution the kernel
    uses, so callers (adjacency_format="auto") can pre-check instead of
    crashing into the kernel's ValueError."""
    bpe = 9 + ((4 if proxy_dtype == "float32" else 2) if with_proxy else 0)
    _, unit = _pad_unit(n, tile_q, bpe)
    return n % unit == 0


def _fit_tile_to_vmem(tile_q: int, n: int, bytes_per_elem: int) -> int:
    """Shrink the query tile so the kernel's [tile, Npad] working set fits
    the 16 MB scoped VMEM at large N (SURVEY.md §5.7 capacity path): the
    fp32 distance slab plus the adjacency/select row block cost
    ~``bytes_per_elem`` per slab element. Measured flat across tile_q
    64-256 at N=4096 (docs/KERNELS.md), so shrinking costs nothing there
    and buys N=16k/32k support."""
    npad128 = -(-n // _LANE) * _LANE
    budget = 10 * 2**20  # headroom under the 16 MB scoped limit
    while tile_q > 8 and tile_q * npad128 * bytes_per_elem > budget:
        tile_q //= 2
    return max(8, tile_q)


def knn_with_adjacency_pallas(
    x: jnp.ndarray,
    k: int,
    tile_q: int = 128,  # narrower than plain kNN: the adj slab shares VMEM
    interpret: bool | None = None,
    with_idx: bool = True,
    with_proxy: bool = False,
    fmt: str = "dense",
    proxy_dtype: str = "bfloat16",
):
    """Fused kNN + dense 0/1 indicator adjacency in one kernel pass.

    Returns (idx [..., N, k] int32, A01 [..., N, N] int8). The adjacency
    comes from one final compare on state the extraction loop produced
    anyway, so this replaces the separate ops/adjacency.py build with ~zero
    extra kernel work; consumers apply the 1/K mean scaling after their A@F
    matmul. Both outputs are non-differentiable structure (stop_gradient),
    exactly as in the reference where the kNN graph is integer indices.

    ``with_proxy=True`` (adjacency-only path) also returns the layer-0
    proxy point [..., N, D] fp32 — ``(mask @ coords) / k`` computed in-kernel
    while both operands are VMEM-resident.

    ``fmt="packed"`` (adjacency-only path) returns the adjacency BIT-PACKED:
    [..., N, N/32] int32 bit-planes (ops/adjacency.py layout) — 8x less HBM
    write/read than int8; consume with ``packed_neighbor_mean``. Requires N
    to be a multiple of the tile unit (no column padding).
    """
    if with_proxy and with_idx:
        raise ValueError("with_proxy requires with_idx=False (model path)")
    if fmt not in ("dense", "packed"):
        raise ValueError(f"fmt must be dense|packed, got {fmt}")
    if fmt == "packed" and with_idx:
        raise ValueError("fmt='packed' requires with_idx=False (model path)")
    if interpret is None:
        interpret = not _on_tpu()
    *lead, n, d_in = x.shape
    if d_in > _COORD_PAD:
        raise ValueError(f"coordinate dim must be <= {_COORD_PAD}, got {d_in}")
    if k > n:
        raise ValueError(
            f"k={k} > n={n}: the padded far columns would silently fill the "
            "tail of every neighbour list (the jnp oracle raises here too)"
        )
    b = 1
    for s in lead:
        b *= s
    xb = x.reshape(b, n, d_in).astype(jnp.float32)
    # f32 slab + f32 trim copy + int8 adjacency row block ~ 9 B/elem; the
    # in-kernel proxy adds a [tile, Npad] mask-cast matmul operand on top
    # (+2 B bf16 / +4 B f32 per element)
    bpe = 9 + ((4 if proxy_dtype == "float32" else 2) if with_proxy else 0)
    tile_q, unit = _pad_unit(n, tile_q, bytes_per_elem=bpe)
    npad = -(-n // unit) * unit
    xb = jnp.pad(xb, ((0, 0), (0, npad - n), (0, 0)), constant_values=1e6)
    if npad != n:
        # Tie-free pad points: all-identical (1e6, ...) pads make every pad
        # QUERY row tie at distance 0 to every pad column, and the adaptive
        # trim while_loop (whose cond spans the whole tile) then trims them
        # one per iteration — ~pad_n serial [tile, Npad] passes spent on
        # rows that are sliced away afterwards. A distinct ramp keeps pads
        # far from real points but tie-free among themselves.
        ramp = jnp.arange(npad, dtype=jnp.float32)
        bump = jnp.where(ramp >= n, ramp - (n - 1), 0.0)[None, :, None]
        xb = xb + bump
    xb = jnp.pad(xb, ((0, 0), (0, 0), (0, _COORD_PAD - d_in)))
    xb = jax.lax.stop_gradient(xb)
    if not with_idx:
        pack = fmt == "packed"
        if pack and npad != n:
            raise ValueError(
                f"fmt='packed' needs N divisible by the tile unit "
                f"({unit}); got N={n} (padded {npad})"
            )
        if with_proxy:
            adj, proxy = _knn_pallas_batched(
                xb, k, tile_q, interpret, cp_real=d_in, adjacency_only=True,
                with_proxy=True, pack=pack, proxy_dtype=proxy_dtype,
            )
            proxy = proxy[:, :n, :d_in].reshape(*lead, n, d_in)
        else:
            adj = _knn_pallas_batched(
                xb, k, tile_q, interpret, cp_real=d_in, adjacency_only=True,
                pack=pack,
            )
        if pack:
            adj = adj.reshape(*lead, n, npad // 32)
        else:
            adj = adj[:, :n, :n].reshape(*lead, n, n)
        adj = jax.lax.stop_gradient(adj)
        return (None, adj, proxy) if with_proxy else (None, adj)
    idx, _, adj = _knn_pallas_batched(
        xb, k, tile_q, interpret, with_adjacency=True, cp_real=d_in
    )
    idx = idx[:, :n, :k].reshape(*lead, n, k)
    adj = adj[:, :n, :n].reshape(*lead, n, n)
    return idx, jax.lax.stop_gradient(adj)


def knn(x: jnp.ndarray, k: int, return_dists: bool = False, impl: str = "auto"):
    """Dispatching kNN front-end. impl: auto | jnp | pallas."""
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "jnp"
    if impl == "pallas":
        return knn_pallas(x, k, return_dists=return_dists)
    return knn_jnp(x, k, return_dists=return_dists)


def knn_adjacency(
    x: jnp.ndarray, k: int, dtype=jnp.bfloat16, impl: str = "auto",
    with_idx: bool = True, with_proxy: bool = False, fmt: str = "dense",
):
    """(idx, dense 0/1 INDICATOR adjacency) with the best backend: the fused
    Pallas kernel (int8 output) on TPU, oracle kNN + compare-build elsewhere.
    Consumers scale by 1/K after their A@F matmul (neighbor_mean).
    ``with_idx=False`` skips the idx/dist bookkeeping entirely (model path).
    ``with_proxy=True`` appends the layer-0 proxy point (k-nearest coord
    mean; matmul operands in ``dtype`` with fp32 accumulation on BOTH
    backends, cast to ``dtype``) — on TPU it is emitted from inside the
    kernel, saving one dense [N, N] HBM read.
    ``fmt="packed"`` returns the adjacency as [..., N, N/32] int32 bit-planes
    (8x less HBM; consume with ops/adjacency.py packed_neighbor_mean)."""
    from epcnet_tpu.ops.adjacency import count_adjacency, neighbor_mean, pack_indicator

    # Same contract on BOTH backends (a with_idx combination that only the
    # jnp twin accepted would break at first TPU run):
    if with_idx and (with_proxy or fmt == "packed"):
        raise ValueError(
            "with_proxy / fmt='packed' require with_idx=False (model path)"
        )
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "jnp"
    if impl == "pallas":
        out = knn_with_adjacency_pallas(
            x, k, with_idx=with_idx, with_proxy=with_proxy, fmt=fmt,
            proxy_dtype=jnp.dtype(dtype).name,
        )
        if with_proxy:
            idx, adj, proxy = out
            return idx, adj, proxy.astype(dtype)
        return out
    idx = knn_jnp(x, k)
    # counts, NOT mean*k: kNN indices are distinct so counts are exactly the
    # kernel's 0/1 indicator — the old divide/multiply round trip drifted an
    # ulp for non-pow-2 k in fp32
    indicator = count_adjacency(idx, x.shape[-2], dtype=dtype)
    if with_proxy:
        # same math as the ProxyConv layer-0 path it replaces
        proxy = neighbor_mean(
            x.astype(dtype), adjacency=indicator, compute_dtype=dtype,
            adjacency_scale=1.0 / k,
        )
    adj = pack_indicator(indicator) if fmt == "packed" else indicator
    # same return contract as the Pallas twin: idx only when asked for
    if with_proxy:
        return (idx if with_idx else None), adj, proxy
    return (idx if with_idx else None), adj
