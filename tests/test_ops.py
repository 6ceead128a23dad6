"""Adjacency / VLAD / sampling / retrieval op tests vs oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epcnet_tpu.ops import (
    ball_query,
    farthest_point_sample,
    gather_point,
    group_point,
    l2_distance_matrix,
    mean_adjacency,
    neighbor_mean,
    prob_sample,
    three_interpolate,
    three_nn,
    topk_neighbors,
    vlad_aggregate_jnp,
)
from epcnet_tpu.ops.knn import knn_jnp


def test_mean_adjacency_rows_sum_to_one(rng):
    x = jnp.asarray(rng.randn(2, 60, 3).astype(np.float32))
    idx = knn_jnp(x, 7)
    a = mean_adjacency(idx, 60, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a.sum(-1)), 1.0, atol=1e-5)


def test_neighbor_mean_matmul_matches_gather(rng):
    x = jnp.asarray(rng.randn(2, 60, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(2, 60, 16).astype(np.float32))
    idx = knn_jnp(x, 7)
    a = mean_adjacency(idx, 60, dtype=jnp.float32)
    m_mat = neighbor_mean(f, adjacency=a, compute_dtype=jnp.float32)
    m_gat = neighbor_mean(f, idx=idx)
    np.testing.assert_allclose(np.asarray(m_mat), np.asarray(m_gat), atol=1e-4)


def test_vlad_precision_modes(rng):
    """The opt-in bf16-accumulation mode must stay close to the fp32-exact
    default (the Pallas VLAD kernel was removed after losing to XLA)."""
    f = jnp.asarray(rng.randn(2, 100, 32).astype(np.float32))
    lg = jnp.asarray(rng.randn(2, 100, 8).astype(np.float32))
    c = jnp.asarray(rng.randn(8, 32).astype(np.float32))
    v1 = vlad_aggregate_jnp(f, lg, c)
    v2 = vlad_aggregate_jnp(f, lg, c, precision="default")
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=5e-3)
    # output is L2-normalized
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v1), axis=-1), 1.0, atol=1e-5)


def test_vlad_matches_naive_einsum(rng):
    """Oracle vs the textbook residual formulation V[k]=sum_i a_ik (x_i-c_k)."""
    f = rng.randn(1, 50, 16).astype(np.float32)
    lg = rng.randn(1, 50, 4).astype(np.float32)
    c = rng.randn(4, 16).astype(np.float32)
    a = np.exp(lg) / np.exp(lg).sum(-1, keepdims=True)
    v = np.einsum("bnc,bnd->bcd", a, f) - a.sum(1)[..., None] * c
    v = v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
    v = v.reshape(1, -1)
    v = v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
    got = np.asarray(vlad_aggregate_jnp(jnp.asarray(f), jnp.asarray(lg), jnp.asarray(c)))
    np.testing.assert_allclose(got, v, atol=1e-5)


def test_fps_spreads_points(rng):
    # FPS on a line must pick the extremes early
    pts = np.zeros((1, 100, 3), np.float32)
    pts[0, :, 0] = np.linspace(0, 1, 100)
    idx = np.asarray(farthest_point_sample(jnp.asarray(pts), 3))[0]
    assert idx[0] == 0 and idx[1] == 99  # farthest from point 0
    assert abs(int(idx[2]) - 50) <= 1  # then the middle


def test_fps_gather_shapes(rng):
    x = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    idx = farthest_point_sample(x, 16)
    g = gather_point(x, idx)
    assert g.shape == (2, 16, 3)


def test_ball_query_semantics():
    pts = np.zeros((1, 10, 3), np.float32)
    pts[0, :, 0] = np.arange(10)  # points at x=0..9
    q = pts[:, :1]  # query at origin
    idx = np.asarray(ball_query(2.5, 4, jnp.asarray(pts), jnp.asarray(q)))[0, 0]
    # within radius 2.5: points 0,1,2 -> first 3 slots ascending, pad with first
    np.testing.assert_array_equal(idx, [0, 1, 2, 0])


def test_group_point_gathers(rng):
    f = jnp.asarray(rng.randn(1, 20, 5).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 20, (1, 4, 3)).astype(np.int32))
    g = np.asarray(group_point(f, idx))
    fn = np.asarray(f)
    for m in range(4):
        for k in range(3):
            np.testing.assert_allclose(g[0, m, k], fn[0, int(idx[0, m, k])])


def test_prob_sample_matches_numpy_searchsorted_oracle(rng):
    # reference semantics (tf_sampling_g.cu binarysearchKernel): smallest
    # index i with cumsum(probs)[i] >= r, per batch row
    p = rng.rand(3, 50).astype(np.float32)
    p = p / p.sum(-1, keepdims=True)
    r = rng.rand(3, 200).astype(np.float32)
    got = np.asarray(prob_sample(jnp.asarray(p), jnp.asarray(r)))
    for b in range(3):
        cdf = np.cumsum(p[b], dtype=np.float32)
        ref = np.minimum(np.searchsorted(cdf, r[b], side="left"), 49)
        np.testing.assert_array_equal(got[b], ref)


def test_prob_sample_edge_cases():
    # zero-probability rows are never drawn; r past the total mass clamps to
    # the last index (the CUDA kernel's bounded search does the same)
    p = jnp.asarray([[0.0, 0.5, 0.0, 0.5]], jnp.float32)
    r = jnp.asarray([[0.01, 0.49, 0.51, 0.999, 1.5]], jnp.float32)
    got = np.asarray(prob_sample(p, r))[0]
    np.testing.assert_array_equal(got, [1, 1, 3, 3, 3])


def test_prob_sample_distribution(rng):
    # statistical check: empirical frequencies approach the probability row
    p = np.asarray([[0.1, 0.2, 0.3, 0.4]], np.float32)
    r = rng.rand(1, 20000).astype(np.float32)
    idx = np.asarray(prob_sample(jnp.asarray(p), jnp.asarray(r)))[0]
    freq = np.bincount(idx, minlength=4) / idx.size
    np.testing.assert_allclose(freq, p[0], atol=0.02)


def test_three_interpolate_exact_at_known_points(rng):
    known = jnp.asarray(rng.randn(1, 30, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 30, 8).astype(np.float32))
    d, idx = three_nn(known, known)  # interpolate at the known points
    out = np.asarray(three_interpolate(feats, idx, d))
    np.testing.assert_allclose(out, np.asarray(feats), atol=1e-4)


def test_topk_neighbors_exact(rng):
    q = rng.randn(9, 32).astype(np.float32)
    db = rng.randn(70, 32).astype(np.float32)
    idx, dist = topk_neighbors(jnp.asarray(q), jnp.asarray(db), 5)
    ref = np.argsort(((q[:, None] - db[None]) ** 2).sum(-1), axis=-1)[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), ref)


def test_sharded_topk_matches_single(rng, mesh8):
    from epcnet_tpu.ops.retrieval import sharded_topk_neighbors

    q = jnp.asarray(rng.randn(17, 64).astype(np.float32))
    db = jnp.asarray(rng.randn(203, 64).astype(np.float32))
    i1, d1 = topk_neighbors(q, db, 7)
    i2, d2 = sharded_topk_neighbors(q, db, 7, mesh8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)

# ---------------------------------------------------------------- packed A
def test_pack_unpack_indicator_roundtrip(rng):
    from epcnet_tpu.ops.adjacency import pack_indicator, unpack_indicator

    ind = (rng.rand(2, 96, 256) < 0.05).astype(np.int8)
    packed = pack_indicator(jnp.asarray(ind))
    assert packed.shape == (2, 96, 8) and packed.dtype == jnp.int32
    back = np.asarray(unpack_indicator(packed))
    np.testing.assert_array_equal(back, ind)


def test_packed_neighbor_mean_matches_dense(rng):
    """Pallas unpack-dot kernel (interpret) == dense indicator matmul."""
    from epcnet_tpu.ops.adjacency import (
        mean_adjacency, neighbor_mean, pack_indicator, packed_neighbor_mean,
    )

    k, n, c = 6, 256, 48
    idx = knn_jnp(jnp.asarray(rng.randn(2, n, 3).astype(np.float32)), k)
    ind = mean_adjacency(idx, n, dtype=jnp.float32) * k
    packed = pack_indicator(ind)
    f = jnp.asarray(rng.randn(2, n, c).astype(np.float32)).astype(jnp.bfloat16)

    want = neighbor_mean(f, adjacency=ind.astype(jnp.bfloat16),
                         compute_dtype=jnp.bfloat16, adjacency_scale=1.0 / k)
    got_pallas = packed_neighbor_mean(f, packed, k, impl="pallas", interpret=True)
    got_jnp = packed_neighbor_mean(f, packed, k, impl="jnp")
    np.testing.assert_allclose(
        np.asarray(got_pallas, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_array_equal(
        np.asarray(got_jnp, np.float32), np.asarray(want, np.float32)
    )


def test_knn_kernel_packed_adjacency_output(rng):
    """fmt='packed' kernel output == pack_indicator(dense kernel output)."""
    from epcnet_tpu.ops.adjacency import pack_indicator
    from epcnet_tpu.ops.knn import knn_with_adjacency_pallas

    x = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
    _, dense = knn_with_adjacency_pallas(x, 7, with_idx=False)
    _, packed, proxy = knn_with_adjacency_pallas(
        x, 7, with_idx=False, with_proxy=True, fmt="packed"
    )
    assert packed.shape == (2, 256, 8) and packed.dtype == jnp.int32
    assert proxy.shape == (2, 256, 3)
    np.testing.assert_array_equal(
        np.asarray(packed), np.asarray(pack_indicator(dense))
    )
