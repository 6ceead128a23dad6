"""Descriptor retrieval: batched query-vs-database distance + top-k.

Reference equivalent: evaluate.py builds a sklearn ``KDTree`` over database
descriptors and queries it per query vector [LINEAGE: evaluate.py
get_recall()]. At this database scale (10^3–10^5 vectors, 256-D) an exact
brute-force distance MATMUL on the MXU is both faster and exact, and it
shards naturally over ICI (SURVEY.md §3.2, §5.8): each device holds DB/ndev
rows, computes local top-k, and the tiny per-shard candidate lists are
all-gathered and merged.

Descriptors are L2-normalized, so squared L2 distance = 2 - 2 q.d — we rank
by inner product (descending), which is monotonic in distance and cheaper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def l2_distance_matrix(queries: jnp.ndarray, database: jnp.ndarray) -> jnp.ndarray:
    """[Q, D] x [N, D] -> [Q, N] squared L2 distances (fp32, MXU matmul)."""
    q = queries.astype(jnp.float32)
    d = database.astype(jnp.float32)
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    dd = jnp.sum(d * d, axis=-1)[None, :]
    cross = jnp.einsum(
        "qd,nd->qn", q, d, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.maximum(qq + dd - 2.0 * cross, 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_neighbors(queries: jnp.ndarray, database: jnp.ndarray, k: int):
    """Exact k-NN of each query in the database.

    Returns (idx [Q, k] int32, sqdist [Q, k] fp32), nearest first.
    """
    d = l2_distance_matrix(queries, database)
    neg, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32), -neg


# ---------------------------------------------------------------------------
# int8 database quantization (serving capacity: 4x less HBM per DB row)
# ---------------------------------------------------------------------------


def quantize_descriptors(desc: jnp.ndarray):
    """Symmetric per-row int8 quantization: [N, D] fp32 -> (int8 [N, D],
    scale fp32 [N, 1]) with ``dequant = int8 * scale``. Max per-element
    error is scale/2 ~ ||row||_inf / 254; for L2-normalized 256-D
    descriptors that is ~4e-4 — far below typical inter-place descriptor
    margins, so retrieval ids are unchanged except at near-exact ties
    (tested). The persistent device DB shrinks 4x (the reason to use it:
    pod-scale serving DBs are HBM-capacity-bound, SURVEY.md §5.7)."""
    scale = jnp.max(jnp.abs(desc), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, jnp.float32(1e-12))
    q = jnp.clip(jnp.round(desc / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_descriptors(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`quantize_descriptors` (fp32). NOT on the retrieval
    hot path — distances are computed directly from (int8, scale) there
    (:func:`quantized_distance_matrix`) so no [N, D] fp32 array ever
    materializes. This exists for tests/tools that want the fp32 view."""
    return q.astype(jnp.float32) * scale


def quantized_distance_matrix(
    queries: jnp.ndarray, db_q: jnp.ndarray, db_scale: jnp.ndarray
) -> jnp.ndarray:
    """[Q, D] fp32 x ([N, D] int8, [N, 1] scale) -> [Q, N] squared L2 in
    dequantized space — WITHOUT materializing a dequantized [N, D] fp32
    database (which would be a 4x-of-resident transient, defeating the int8
    capacity win at exactly the DB sizes it exists for). The per-row scale
    factors out of both terms that touch the database:

      |x_n|^2      = s_n^2 * sum_d qi[n,d]^2   (int8^2 sums are exact in
                                                fp32: <= 127^2 * D << 2^24)
      q_i . x_n    = s_n * (q @ qi^T)[i, n]

    so the int8 buffer is read by one fused square-reduce and one matmul
    whose operand convert fuses into the dot — peak memory stays O(int8 DB
    + Q·N distances)."""
    q = queries.astype(jnp.float32)
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    s = db_scale.astype(jnp.float32)[:, 0]  # [N]
    dd = (jnp.sum(jnp.square(db_q.astype(jnp.float32)), axis=-1)
          * jnp.square(s))[None, :]
    cross = jnp.einsum(
        "qd,nd->qn", q, db_q.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) * s[None, :]
    return jnp.maximum(qq + dd - 2.0 * cross, 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_neighbors_quantized(
    queries: jnp.ndarray, db_q: jnp.ndarray, db_scale: jnp.ndarray, k: int
):
    """k-NN against an int8-quantized database: distances straight from
    (int8, scale) — see :func:`quantized_distance_matrix` — then the same
    exact MXU top-k. Distances are in dequantized space (approximate by the
    quantization error bound above)."""
    d = quantized_distance_matrix(queries, db_q, db_scale)
    neg, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32), -neg


@functools.lru_cache(maxsize=64)
def _sharded_topk_fn(mesh: Mesh, axis: str, k: int, quantized: bool, ndev: int):
    """Build (once per (mesh, axis, k, quantized)) the jitted shard_map
    program for sharded retrieval. Hoisted out of sharded_topk_neighbors
    and cached on FUNCTION IDENTITY: a fresh closure per call would defeat
    JAX's callable-keyed dispatch caches, re-tracing the collective program
    on every serving query — exactly the per-request overhead warmup() and
    the capacity-keyed static k exist to eliminate."""

    def local(q, db_shard, *scale_shard):
        my = jax.lax.axis_index(axis)
        rows = db_shard.shape[0]
        if quantized:
            # distances straight from (int8, scale) — no dequantized fp32
            # shard transient (quantized_distance_matrix)
            d = quantized_distance_matrix(q, db_shard, scale_shard[0])
            neg, idx = jax.lax.top_k(-d, k)
            idx, dist = idx.astype(jnp.int32), -neg
        else:
            idx, dist = topk_neighbors(q, db_shard, k)
        gidx = idx + my * rows
        # all-gather the candidate lists: [ndev, Q, k]
        all_idx = jax.lax.all_gather(gidx, axis)
        all_dist = jax.lax.all_gather(dist, axis)
        qn = q.shape[0]
        cat_idx = jnp.moveaxis(all_idx, 0, 1).reshape(qn, ndev * k)
        cat_dist = jnp.moveaxis(all_dist, 0, 1).reshape(qn, ndev * k)
        neg, pos = jax.lax.top_k(-cat_dist, k)
        merged_idx = jnp.take_along_axis(cat_idx, pos, axis=-1)
        return merged_idx, -neg

    in_specs = (P(), P(axis)) + ((P(axis),) if quantized else ())
    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def sharded_topk_neighbors(
    queries: jnp.ndarray,
    database: jnp.ndarray,
    k: int,
    mesh: Mesh,
    axis: str = "db",
    db_scale: jnp.ndarray | None = None,
):
    """ICI-sharded exact retrieval (SURVEY.md §2.3 "TP for retrieval").

    The database rows are sharded over ``axis``; queries are replicated. Each
    device computes its local [Q, k] candidates; candidates (k·ndev per query
    — tiny) are all-gathered over ICI and re-reduced to the global top-k.
    Local shard indices are rebased to global rows before the merge.

    ``db_scale`` given means ``database`` is int8-quantized
    (:func:`quantize_descriptors`): each shard dequantizes its OWN rows
    in-jit, so only 1/4 of the descriptor bytes are resident per device —
    the capacity story for pod-scale serving DBs.
    """
    ndev = mesh.shape[axis]
    n = database.shape[0]
    quantized = db_scale is not None
    # Pad so every shard holds >= k rows (a tiny DB over many devices would
    # otherwise ask each shard for more candidates than it has rows). Pad
    # rows live far away -> never in the final top-k (requires n >= k).
    # int8 path: pad value 127 with a 1e6 scale dequantizes to a far row.
    shard = max(-(-n // ndev), k) * ndev
    if quantized:
        db = jnp.pad(database, ((0, shard - n), (0, 0)), constant_values=127)
        scale = jnp.pad(db_scale, ((0, shard - n), (0, 0)), constant_values=1e6)
    else:
        db = jnp.pad(database, ((0, shard - n), (0, 0)), constant_values=1e6)

    fn = _sharded_topk_fn(mesh, axis, k, quantized, ndev)
    q = jax.device_put(queries, NamedSharding(mesh, P()))
    db = jax.device_put(db, NamedSharding(mesh, P(axis)))
    if quantized:
        scale = jax.device_put(scale, NamedSharding(mesh, P(axis)))
        return fn(q, db, scale)
    return fn(q, db)


def ring_knn_points(
    x: jnp.ndarray,
    k: int,
    mesh: Mesh,
    axis: str = "db",
):
    """Ring-sharded kNN over the POINT axis (SURVEY.md §5.7): the spatial
    kNN graph of ONE huge submap whose points do not fit a single device.

    The points are sharded over ``axis``; each device keeps its point shard's
    queries and running top-k resident while the CANDIDATE blocks rotate
    around the ICI ring via ``lax.ppermute`` (ring attention's schedule
    applied to the kNN graph build). Per hop each device computes its
    [N/ndev, N/ndev] exact fp32 distance block and merges the block top-k
    into the running lists; after ndev hops every shard holds the global kNN
    of its own points. Peak memory is O((N/ndev)^2) per device and per-hop
    traffic is the [N/ndev, D] block — the full N^2 matrix never exists.

    Args:
      x: [N, D] point coordinates (one submap), D small.
      k: neighbours per point (self included at distance 0, as in knn_jnp).

    Returns:
      (idx [N, k] int32 GLOBAL point ids, sqdist [N, k] fp32), sharded over
      ``axis`` on the row axis. Tie-breaking: equal distances prefer the
      earlier-merged block; within a block, lax.top_k order. (The oracle
      breaks ties by lowest index — identical for tie-free inputs.)
    """
    ndev = mesh.shape[axis]
    n, d_in = x.shape
    npad = -(-n // ndev) * ndev
    nl = npad // ndev
    if k > nl:
        raise ValueError(f"k={k} exceeds points-per-shard {nl}")
    xp = jnp.pad(x.astype(jnp.float32), ((0, npad - n), (0, 0)),
                 constant_values=1e6)

    fn = _ring_knn_fn(mesh, axis, k, ndev)
    xp = jax.device_put(xp, NamedSharding(mesh, P(axis)))
    idx, dist = fn(xp)
    return idx[:n], dist[:n]


@functools.lru_cache(maxsize=32)
def _ring_knn_fn(mesh: Mesh, axis: str, k: int, ndev: int):
    """Cached jitted shard_map for ring_knn_points (same rationale as
    _sharded_topk_fn: stable callable identity -> dispatch-cache hits on the
    repeated giant-submap embed path)."""
    return jax.jit(
        jax.shard_map(
            lambda xs: ring_knn_local(xs, k, axis, ndev),
            mesh=mesh,
            in_specs=P(axis),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )
    )


def ring_knn_local(xs: jnp.ndarray, k: int, axis: str, ndev: int):
    """Per-shard body of :func:`ring_knn_points`, reusable inside a CALLER's
    ``shard_map`` (the points-sharded model embed builds its kNN graph with
    this — models/points_sharded.py). ``xs``: this shard's [nl, D] points;
    must be called under a mesh axis named ``axis`` of size ``ndev``.
    Returns (idx [nl, k] GLOBAL ids, sqdist [nl, k]) for the local rows."""
    nl, d_in = xs.shape
    xs = xs.astype(jnp.float32)  # distances are exact fp32 regardless of input
    my = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]

    def cross_sqdist(q, c):
        # per-coordinate diff^2 accumulation: exact fp32, same order as the
        # oracle's pairwise_sqdist at small D (ops/knn.py kernel does the same)
        d = jnp.zeros((q.shape[0], c.shape[0]), jnp.float32)
        for i in range(d_in):
            diff = q[:, i : i + 1] - c[None, :, i]
            d = d + diff * diff
        return d

    def hop(h, carry):
        blk, best_idx, best_dist = carry
        src = jax.lax.rem(my - h + ndev, ndev)  # block's origin device
        d = cross_sqdist(xs, blk)  # [nl, nl]
        neg, pos = jax.lax.top_k(-d, k)
        gidx = (pos + src * nl).astype(jnp.int32)
        cat_dist = jnp.concatenate([best_dist, -neg], axis=-1)  # [nl, 2k]
        cat_idx = jnp.concatenate([best_idx, gidx], axis=-1)
        mneg, mpos = jax.lax.top_k(-cat_dist, k)
        best_idx = jnp.take_along_axis(cat_idx, mpos, axis=-1)
        blk = jax.lax.ppermute(blk, axis, perm)
        return blk, best_idx, -mneg

    init = (
        xs,
        jnp.zeros((nl, k), jnp.int32),
        jnp.full((nl, k), jnp.inf, jnp.float32),
    )
    _, idx, dist = jax.lax.fori_loop(0, ndev, hop, init)
    return idx, dist


def ring_topk_neighbors(
    queries: jnp.ndarray,
    database: jnp.ndarray,
    k: int,
    mesh: Mesh,
    axis: str = "db",
):
    """Ring-merge variant of sharded retrieval (SURVEY.md §5.7 "ring-topk").

    Instead of one all-gather of every shard's candidates, each device's
    candidate list rotates around the ICI ring via ``lax.ppermute``, merging
    with the local top-k at every hop; after ndev-1 hops every device holds
    the global top-k. Same result as :func:`sharded_topk_neighbors`; peak
    per-hop traffic is k (not k*ndev), which matters when Q*k is large —
    this is ring attention's schedule applied to retrieval.
    """
    ndev = mesh.shape[axis]
    n = database.shape[0]
    # every shard holds >= k rows (see sharded_topk_neighbors)
    shard = max(-(-n // ndev), k) * ndev
    db = jnp.pad(database, ((0, shard - n), (0, 0)), constant_values=1e6)
    fn = _ring_topk_fn(mesh, axis, k, ndev)
    q = jax.device_put(queries, NamedSharding(mesh, P()))
    db = jax.device_put(db, NamedSharding(mesh, P(axis)))
    return fn(q, db)


@functools.lru_cache(maxsize=32)
def _ring_topk_fn(mesh: Mesh, axis: str, k: int, ndev: int):
    """Cached jitted shard_map for ring_topk_neighbors (stable callable
    identity -> dispatch-cache hits; see _sharded_topk_fn)."""

    def local(q, db_shard):
        my = jax.lax.axis_index(axis)
        idx, dist = topk_neighbors(q, db_shard, k)
        gidx = idx + my * db_shard.shape[0]
        perm = [(i, (i + 1) % ndev) for i in range(ndev)]

        def hop(_, carry):
            c_idx, c_dist = carry
            r_idx = jax.lax.ppermute(c_idx, axis, perm)
            r_dist = jax.lax.ppermute(c_dist, axis, perm)
            cat_idx = jnp.concatenate([r_idx, gidx], axis=-1)  # [Q, 2k]
            cat_dist = jnp.concatenate([r_dist, dist], axis=-1)
            neg, pos = jax.lax.top_k(-cat_dist, k)
            return jnp.take_along_axis(cat_idx, pos, axis=-1), -neg

        c_idx, c_dist = jax.lax.fori_loop(0, ndev - 1, hop, (gidx, dist))
        return c_idx, c_dist

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
