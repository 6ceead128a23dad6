"""Pallas kNN kernel vs jnp oracle (SURVEY.md §4 implication (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epcnet_tpu.ops.knn import knn, knn_adjacency, knn_jnp, knn_pallas
from epcnet_tpu.ops.pairwise import pairwise_sqdist


def test_pairwise_sqdist_matches_numpy(rng):
    x = rng.randn(2, 50, 3).astype(np.float32)
    d = np.asarray(pairwise_sqdist(jnp.asarray(x)))
    ref = ((x[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, atol=1e-5)


def test_knn_jnp_self_first(rng):
    x = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
    idx, dists = knn_jnp(x, 5, return_dists=True)
    np.testing.assert_array_equal(np.asarray(idx[0, :, 0]), np.arange(64))
    # expansion formula leaves ~1e-6 cancellation residue on self-distance
    assert float(dists[..., 0].max()) <= 1e-5
    # distances sorted ascending
    d = np.asarray(dists)
    assert (np.diff(d, axis=-1) >= -1e-6).all()


@pytest.mark.parametrize("n,k", [(64, 4), (100, 7), (256, 20), (300, 10)])
def test_knn_pallas_matches_oracle(rng, n, k):
    x = jnp.asarray(rng.randn(2, n, 3).astype(np.float32))
    i_ref, d_ref = knn_jnp(x, k, return_dists=True)
    i_pal, d_pal = knn_pallas(x, k, return_dists=True)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_pal))
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_pal), atol=1e-4)


def test_knn_pallas_nonsquare_tiles(rng):
    # n not a multiple of the tile: exercises the padding path
    x = jnp.asarray(rng.randn(1, 130, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(knn_jnp(x, 6)), np.asarray(knn_pallas(x, 6, tile_q=64))
    )


def test_knn_ties_deterministic():
    # duplicate points -> distance ties; both impls must break ties identically
    pts = np.zeros((1, 16, 3), np.float32)
    pts[0, :, 0] = np.repeat(np.arange(8), 2)  # pairs of identical points
    x = jnp.asarray(pts)
    np.testing.assert_array_equal(np.asarray(knn_jnp(x, 4)), np.asarray(knn_pallas(x, 4)))


def test_knn_dispatch(rng):
    x = jnp.asarray(rng.randn(1, 40, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(knn(x, 3, impl="jnp")), np.asarray(knn(x, 3, impl="pallas"))
    )


def test_fused_adjacency_matches_build(rng):
    """The kernel-fused 0/1 indicator adjacency must equal ops/adjacency.py's
    1/K build from the same indices (up to the K scaling)."""
    from epcnet_tpu.ops.adjacency import mean_adjacency
    from epcnet_tpu.ops.knn import knn_adjacency, knn_with_adjacency_pallas

    x = jnp.asarray(rng.randn(2, 200, 3).astype(np.float32))
    idx_p, adj_p = knn_with_adjacency_pallas(x, 9)
    assert adj_p.dtype == jnp.int8
    idx_j = knn_jnp(x, 9)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_j))
    adj_ref = mean_adjacency(idx_j, 200, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(adj_p, dtype=np.float32) / 9.0, np.asarray(adj_ref), atol=1e-6
    )
    # dispatcher parity: jnp path returns the same 0/1 indicator
    i2, a2 = knn_adjacency(x, 9, dtype=jnp.float32, impl="jnp")
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(idx_j))
    np.testing.assert_allclose(
        np.asarray(a2), np.asarray(adj_p, dtype=np.float32), atol=1e-6
    )


def test_knn_k_equals_n(rng):
    """k == n: the result is the full distance-sorted permutation."""
    x = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
    i_ref = np.asarray(knn_jnp(x, 32))
    i_pal = np.asarray(knn_pallas(x, 32))
    np.testing.assert_array_equal(i_ref, i_pal)
    assert sorted(i_pal[0, 0].tolist()) == list(range(32))


def test_knn_all_identical_points():
    """Total degeneracy: every distance ties at 0 -> lowest k indices."""
    x = jnp.ones((1, 40, 3), jnp.float32)
    i_ref = np.asarray(knn_jnp(x, 5))
    i_pal = np.asarray(knn_pallas(x, 5))
    np.testing.assert_array_equal(i_ref, i_pal)
    np.testing.assert_array_equal(i_pal[0, 0], np.arange(5))


def test_knn_adjacency_row_sums(rng):
    from epcnet_tpu.ops.knn import knn_with_adjacency_pallas

    x = jnp.asarray(rng.randn(1, 150, 3).astype(np.float32))
    _, adj = knn_with_adjacency_pallas(x, 10)
    sums = np.asarray(adj, np.float32).sum(-1)
    np.testing.assert_array_equal(sums, 10.0)  # 0/1 indicator: K per row


def test_adjacency_only_threshold_kernel_exact(rng):
    """The adjacency-ONLY kernel (the model path: value-rounds + threshold +
    adaptive trim) must match the oracle top-k SET exactly, including the
    oracle's lowest-index tie-break — on random data, duplicated points
    (distance-0 ties), and full degeneracy (all points identical)."""
    from epcnet_tpu.ops.adjacency import mean_adjacency
    from epcnet_tpu.ops.knn import knn_with_adjacency_pallas

    k = 7

    def oracle(x):
        return np.asarray(
            (mean_adjacency(knn_jnp(x, k), x.shape[-2], dtype=jnp.float32) * k)
        ).astype(np.int8)

    cases = {}
    cases["random"] = rng.randn(2, 200, 3).astype(np.float32)
    dup = rng.randn(1, 160, 3).astype(np.float32)
    dup[0, 40:60] = dup[0, 5]  # 21 identical points: k-boundary ties abound
    cases["duplicates"] = dup
    cases["degenerate"] = np.ones((1, 64, 3), np.float32)

    for name, xn in cases.items():
        x = jnp.asarray(xn)
        _, adj = knn_with_adjacency_pallas(x, k, with_idx=False)
        got = np.asarray(adj)
        assert np.array_equal(got, oracle(x)), name
        np.testing.assert_array_equal(got.sum(-1), k)

def test_adjacency_kernel_proxy_output(rng):
    """with_proxy: the kernel-emitted layer-0 proxy (k-nearest coord mean,
    bf16 matmul / fp32 accumulation) must match the adjacency-matmul path it
    replaces to bf16 tolerance, and the adjacency must be unchanged."""
    from epcnet_tpu.ops.adjacency import neighbor_mean
    from epcnet_tpu.ops.knn import knn_with_adjacency_pallas

    k = 7
    x = jnp.asarray(rng.randn(2, 200, 3).astype(np.float32))
    _, adj_plain = knn_with_adjacency_pallas(x, k, with_idx=False)
    _, adj, proxy = knn_with_adjacency_pallas(x, k, with_idx=False, with_proxy=True)
    assert proxy.shape == (2, 200, 3) and proxy.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(adj), np.asarray(adj_plain))
    want = neighbor_mean(
        x.astype(jnp.bfloat16),
        adjacency=adj.astype(jnp.bfloat16),
        compute_dtype=jnp.bfloat16,
        adjacency_scale=1.0 / k,
    ).astype(np.float32)
    np.testing.assert_allclose(np.asarray(proxy), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_knn_adjacency_front_end_proxy(rng):
    """knn_adjacency(with_proxy=True) jnp branch: proxy equals the ProxyConv
    layer-0 computation bit-for-bit (golden-descriptor invariance)."""
    from epcnet_tpu.ops.adjacency import neighbor_mean
    from epcnet_tpu.ops.knn import knn_adjacency

    x = jnp.asarray(rng.randn(1, 96, 3).astype(np.float32))
    idx, adj, proxy = knn_adjacency(x, 5, impl="jnp", with_proxy=True,
                                    with_idx=False)
    want = neighbor_mean(
        x.astype(jnp.bfloat16), adjacency=adj, compute_dtype=jnp.bfloat16,
        adjacency_scale=1.0 / 5,
    )
    np.testing.assert_array_equal(
        np.asarray(proxy, np.float32), np.asarray(want, np.float32)
    )



def test_knn_pallas_k_exceeds_n_raises(rng):
    """k > n must raise on BOTH backends (the padded far columns would
    otherwise silently fill neighbour tails with out-of-range indices)."""
    x = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
    with pytest.raises(ValueError, match="k=50"):
        knn_pallas(x, 50)
    from epcnet_tpu.ops.knn import knn_with_adjacency_pallas

    with pytest.raises(ValueError, match="k=50"):
        knn_with_adjacency_pallas(x, 50, with_idx=False)


def test_knn_adjacency_jnp_matches_pallas_contract():
    """with_idx=False returns idx=None on BOTH backends (interpret mode
    stands in for the TPU here)."""
    x = jnp.asarray(np.random.RandomState(3).randn(1, 128, 3).astype(np.float32))
    out_j = knn_adjacency(x, 5, impl="jnp", with_idx=False)
    out_p = knn_adjacency(x, 5, impl="pallas", with_idx=False)
    assert out_j[0] is None and out_p[0] is None
    np.testing.assert_array_equal(
        np.asarray(out_j[1], np.float32), np.asarray(out_p[1], np.float32)
    )


def test_jnp_indicator_exact_zero_one_nonpow2_k(rng):
    """fp32 indicator entries are EXACTLY 0/1 for non-power-of-2 k (the old
    mean*k round trip produced 1.0000001-style entries)."""
    x = jnp.asarray(rng.randn(1, 256, 3).astype(np.float32))
    _, adj = knn_adjacency(x, 20, dtype=jnp.float32, impl="jnp", with_idx=False)
    vals = np.unique(np.asarray(adj))
    assert set(vals.tolist()) <= {0.0, 1.0}, vals


def test_knn_pallas_small_odd_n_pad_unit(rng):
    """Non-pow-2 n must not explode the padding unit (n=100 used to pad to
    lcm(100, 128)=3200 columns); results still match the oracle."""
    x = jnp.asarray(rng.randn(2, 100, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(knn_jnp(x, 7)), np.asarray(knn_pallas(x, 7))
    )
    from epcnet_tpu.ops.knn import _pad_unit

    _, unit = _pad_unit(100, 256, 5)
    assert unit <= 128


def test_packed_layout_supported_matches_kernel(rng):
    from epcnet_tpu.ops.knn import knn_with_adjacency_pallas, packed_layout_supported

    assert packed_layout_supported(4096)
    assert not packed_layout_supported(20000)
    x = jnp.asarray(rng.randn(1, 200, 3).astype(np.float32))
    if not packed_layout_supported(200):
        with pytest.raises(ValueError, match="packed"):
            knn_with_adjacency_pallas(x, 5, with_idx=False, fmt="packed")
