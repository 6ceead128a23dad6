"""Model-level tests: shapes, normalization, determinism, parameter budget,
BN state updates, pallas/jnp consistency at the model level."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epcnet_tpu.configs import ModelConfig, epcnet_l_config, pointnetvlad_config
from epcnet_tpu.models import get_model, param_count


def _fwd(cfg, x, seed=0):
    m = get_model(cfg)
    v = m.init(jax.random.PRNGKey(seed), x, train=False)
    return m, v, m.apply(v, x, train=False)


def test_epcnet_output_contract(rng, tiny_model_cfg):
    x = jnp.asarray(rng.uniform(-1, 1, (3, 128, 3)).astype(np.float32))
    _, _, out = _fwd(tiny_model_cfg, x)
    assert out.shape == (3, tiny_model_cfg.output_dim)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)


def test_epcnet_deterministic(rng, tiny_model_cfg):
    x = jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32))
    m, v, out1 = _fwd(tiny_model_cfg, x)
    out2 = m.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_epcnet_batch_independence(rng, tiny_model_cfg):
    """Descriptor of a submap must not depend on its batch neighbours (eval
    mode uses running BN stats, so this must hold exactly)."""
    x = jnp.asarray(rng.uniform(-1, 1, (4, 128, 3)).astype(np.float32))
    m, v, full = _fwd(tiny_model_cfg, x)
    solo = m.apply(v, x[1:2], train=False)
    np.testing.assert_allclose(np.asarray(full[1]), np.asarray(solo[0]), atol=2e-5)


def test_bn_stats_update_only_in_train(rng, tiny_model_cfg):
    x = jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32))
    m = get_model(tiny_model_cfg)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    _, mut = m.apply(v, x, train=True, momentum=0.5, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(v["batch_stats"])
    after = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )


def test_parameter_budgets():
    """Paper efficiency table parity [PAPER]: PointNetVLAD ~19.8M params;
    EPC-Net single-digit M (G-VLAD removes the 16.8M dense FC)."""
    x = jnp.zeros((1, 128, 3))
    pnv = pointnetvlad_config(use_pallas=False)
    n_pnv = param_count(get_model(pnv).init(jax.random.PRNGKey(0), x, train=False)["params"])
    assert 18e6 < n_pnv < 22e6, n_pnv
    epc = ModelConfig(use_pallas=False)
    n_epc = param_count(get_model(epc).init(jax.random.PRNGKey(0), x, train=False)["params"])
    assert 1e6 < n_epc < 9.9e6, n_epc
    epcl = epcnet_l_config(use_pallas=False)
    n_epcl = param_count(get_model(epcl).init(jax.random.PRNGKey(0), x, train=False)["params"])
    assert n_epcl < n_epc / 2, (n_epcl, n_epc)


def test_pallas_and_jnp_model_paths_agree(rng, tiny_model_cfg):
    """The use_pallas bit swaps kernels, not semantics (golden-descriptor
    style check, SURVEY.md §7.2 step 5)."""
    x = jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32))
    cfg_j = tiny_model_cfg.variant(use_pallas=False)
    cfg_p = tiny_model_cfg.variant(use_pallas=True)
    m = get_model(cfg_j)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out_j = m.apply(v, x, train=False)
    out_p = get_model(cfg_p).apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out_j), np.asarray(out_p), atol=1e-4)


def test_pointnetvlad_forward(rng):
    cfg = pointnetvlad_config(
        num_points=64, use_pallas=False, vlad_clusters=8, feature_dim=64,
        pointnet_channels=(16, 16, 16, 32, 64), vlad_group_dim=256,
    )
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 3)).astype(np.float32))
    _, _, out = _fwd(cfg, x)
    assert out.shape == (2, 256)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)


def test_knn_invariant_to_feature_scale(rng, tiny_model_cfg):
    """Adjacency is built on xyz only [PAPER §III-A]: translating all points
    by a constant must leave the kNN graph (and thus descriptors of the
    translated geometry) consistent."""
    from epcnet_tpu.ops.knn import knn_jnp

    x = rng.uniform(-1, 1, (1, 128, 3)).astype(np.float32)
    i1 = np.asarray(knn_jnp(jnp.asarray(x), 8))
    i2 = np.asarray(knn_jnp(jnp.asarray(x + 5.0), 8))
    np.testing.assert_array_equal(i1, i2)


def test_gvlad_g1_equals_dense_fc(rng):
    """BASELINE config #3's aggregation parity: with vlad_groups=1 and
    group_dim=output_dim the head is PointNetVLAD's SINGLE dense
    C*D -> out FC (no stacked out_fc — one-to-one weight-import parity)."""
    from epcnet_tpu.configs import pointnetvlad_config
    from epcnet_tpu.models.vlad_head import GVLADHead
    from epcnet_tpu.ops.vlad import vlad_aggregate_jnp

    # compute_dtype="float32": the assignment-logits Dense follows the
    # backbone compute dtype (KERNELS.md lever 1), and this test checks
    # EXACT fp32 math against a manual NetVLAD — the import-parity flow
    # uses the fp32 path for bit-for-bit checks.
    cfg = pointnetvlad_config(
        feature_dim=32, vlad_clusters=4, use_pallas=False, gating=False,
        output_dim=16, vlad_group_dim=16, compute_dtype="float32",
    )
    head = GVLADHead(cfg)
    f = jnp.asarray(rng.randn(2, 50, 32).astype(np.float32))
    v = head.init(jax.random.PRNGKey(0), f, train=False, momentum=0.9)
    out = head.apply(v, f, train=False, momentum=0.9)

    # manual dense-FC NetVLAD with the same parameters
    p = v["params"]
    assert "out_fc" not in p  # the reference layer stack: exactly one FC
    logits = f @ p["assign"]["kernel"] + p["assign"]["bias"]
    vlad = vlad_aggregate_jnp(f, logits, p["centroids"])  # [2, C*D]
    w = np.asarray(p["group_w"])[0]  # [C*D, 16] — G=1: one dense matrix
    dense = np.asarray(vlad) @ w + np.asarray(p["group_b"])[0]
    dense = dense / (np.linalg.norm(dense, axis=-1, keepdims=True) + 1e-12)
    np.testing.assert_allclose(np.asarray(out), dense, atol=1e-5)

def test_epcnet_packed_adjacency_matches_dense(rng, tiny_model_cfg):
    """adjacency_format='packed' (bit-packed eval path) produces the same
    descriptors as 'dense' — bit-identical through the jnp oracle twins."""
    cfg_d = tiny_model_cfg.variant(adjacency_format="dense")
    cfg_p = tiny_model_cfg.variant(adjacency_format="packed")
    x = jnp.asarray(rng.randn(2, cfg_d.num_points, 3).astype(np.float32))
    m_d, m_p = get_model(cfg_d), get_model(cfg_p)
    v = m_d.init(jax.random.PRNGKey(0), x, train=False)
    out_d = m_d.apply(v, x, train=False)
    out_p = m_p.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_p))

def test_adjacency_auto_selects_packed_above_threshold(rng, tiny_model_cfg,
                                                       monkeypatch):
    """adjacency_format='auto' must switch the EVAL path to bit-packed
    adjacency above the measured capacity crossover (dense fails to compile
    at N=32k on v5e; docs/KERNELS.md) — and produce identical descriptors.
    Training stays dense regardless (packed has no autodiff rule)."""
    import epcnet_tpu.models.epcnet as epcnet_mod

    seen = []
    real = epcnet_mod.knn_adjacency

    def spy(*a, **kw):
        seen.append(kw.get("fmt"))
        return real(*a, **kw)

    monkeypatch.setattr(epcnet_mod, "knn_adjacency", spy)
    cfg = tiny_model_cfg.variant(adjacency_format="auto")
    x = jnp.asarray(rng.randn(2, cfg.num_points, 3).astype(np.float32))
    model = get_model(cfg)
    v = model.init(jax.random.PRNGKey(0), x, train=False)

    out_dense = model.apply(v, x, train=False)
    assert seen[-1] == "dense"  # below threshold: dense (measured faster)

    monkeypatch.setattr(epcnet_mod, "_PACKED_AUTO_N", cfg.num_points - 1)
    out_auto = model.apply(v, x, train=False)
    assert seen[-1] == "packed"
    np.testing.assert_array_equal(np.asarray(out_dense), np.asarray(out_auto))

    # training path must NOT take packed even above the threshold
    model.apply(v, x, train=True, momentum=0.9,
                mutable=["batch_stats"])
    assert seen[-1] == "dense"


def test_vlad_precision_default_fidelity(rng, tiny_model_cfg):
    """The opt-in vlad_precision='default' (single-pass MXU accumulation)
    must stay within ~1e-2 relative of the fp32-exact descriptors and
    preserve nearest-neighbour ordering on a small retrieval set — the
    deployment contract that makes the knob usable."""
    cfg_hi = tiny_model_cfg.variant(vlad_precision="highest")
    cfg_lo = tiny_model_cfg.variant(vlad_precision="default")
    x = jnp.asarray(rng.randn(8, cfg_hi.num_points, 3).astype(np.float32))
    m_hi, m_lo = get_model(cfg_hi), get_model(cfg_lo)
    v = m_hi.init(jax.random.PRNGKey(0), x[:1], train=False)
    d_hi = np.asarray(m_hi.apply(v, x, train=False), np.float64)
    d_lo = np.asarray(m_lo.apply(v, x, train=False), np.float64)
    # L2-normalized outputs: cosine agreement is the meaningful metric
    cos = (d_hi * d_lo).sum(-1)
    assert (cos > 1 - 1e-3).all(), cos
    # retrieval ordering: each descriptor's nearest other-descriptor agrees
    def nn(d):
        s = d @ d.T
        np.fill_diagonal(s, -np.inf)
        return s.argmax(-1)
    np.testing.assert_array_equal(nn(d_hi), nn(d_lo))


def test_epcnet_gather_adjacency_matches_dense(rng, tiny_model_cfg):
    """adjacency_format='gather' (no adjacency at all — [N, K] id gathers,
    the single-chip >32k capacity rung) reproduces the dense descriptors,
    and its TRAIN path gradients match dense too (gather is differentiable,
    unlike packed)."""
    cfg_d = tiny_model_cfg.variant(adjacency_format="dense",
                                   compute_dtype="float32")
    cfg_g = tiny_model_cfg.variant(adjacency_format="gather",
                                   compute_dtype="float32")
    x = jnp.asarray(rng.randn(2, cfg_d.num_points, 3).astype(np.float32))
    m_d, m_g = get_model(cfg_d), get_model(cfg_g)
    v = m_d.init(jax.random.PRNGKey(0), x, train=False)
    out_d = m_d.apply(v, x, train=False)
    out_g = m_g.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_g), atol=2e-5)

    def loss(model, params):
        d, _ = model.apply({"params": params, "batch_stats": v["batch_stats"]},
                           x, train=True, momentum=0.9, mutable=["batch_stats"])
        return jnp.sum(d[0] * d[1])  # scalar touching every path

    g_d = jax.grad(lambda p: loss(m_d, p))(v["params"])
    g_g = jax.grad(lambda p: loss(m_g, p))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_d),
                    jax.tree_util.tree_leaves(g_g)):
        da, db = np.asarray(a), np.asarray(b)
        assert np.abs(da - db).max() <= max(2e-3 * np.abs(da).max(), 1e-6)


def test_adjacency_auto_selects_gather_above_threshold(rng, tiny_model_cfg,
                                                       monkeypatch):
    """Above the gather crossover, 'auto' must drop the adjacency entirely
    (idx-only kNN + gather means) and still produce the same descriptors."""
    import epcnet_tpu.models.epcnet as epcnet_mod

    cfg = tiny_model_cfg.variant(adjacency_format="auto",
                                 compute_dtype="float32")
    x = jnp.asarray(rng.randn(2, cfg.num_points, 3).astype(np.float32))
    model = get_model(cfg)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out_dense = model.apply(v, x, train=False)

    calls = []
    real = epcnet_mod.knn

    def spy(*a, **kw):
        calls.append("knn")
        return real(*a, **kw)

    monkeypatch.setattr(epcnet_mod, "knn", spy)
    monkeypatch.setattr(epcnet_mod, "_GATHER_AUTO_N", cfg.num_points - 1)
    out_auto = model.apply(v, x, train=False)
    assert calls  # the idx-only path actually ran
    np.testing.assert_allclose(
        np.asarray(out_dense), np.asarray(out_auto), atol=2e-5)
