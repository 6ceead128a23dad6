"""Points-sharded embed (models/points_sharded.py): the sharded giant-submap
path must reproduce the single-device EPCNet descriptor — sharding is a
layout change, not a semantics change (same contract as the DP tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from epcnet_tpu.configs import ModelConfig
from epcnet_tpu.models import EPCNet, embed_points_sharded


def _f32_cfg(**kw):
    base = dict(
        num_points=128,
        knn_k=8,
        use_pallas=False,
        compute_dtype="float32",
        proxyconv_channels=(16, 16),
        lift_channels=(32, 64),
        feature_dim=64,
        vlad_clusters=8,
        vlad_groups=4,
        vlad_group_dim=16,
    )
    base.update(kw)
    return ModelConfig(**base)


def _init_and_reference(cfg, pts):
    model = EPCNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), pts[None], train=False)
    ref = model.apply(variables, pts[None], train=False)[0]
    return variables, np.asarray(ref)


@pytest.mark.parametrize("n", [128, 91])
def test_matches_single_device_f32(rng, mesh8, n):
    # n=91 is NOT divisible by 8: exercises pad rows + the VLAD mask.
    cfg = _f32_cfg()
    pts = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    variables, ref = _init_and_reference(cfg, pts)
    out = np.asarray(embed_points_sharded(variables, pts, cfg, mesh8))
    assert out.shape == (cfg.output_dim,)
    np.testing.assert_allclose(out, ref, atol=2e-4)
    # descriptors are L2-normalized
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-5)


def test_matches_single_device_bf16(rng, mesh8, tiny_model_cfg):
    # Default bf16 compute: gather-mean vs A@F matmul round differently in
    # bf16, so compare by cosine (the retrieval-relevant metric).
    pts = jnp.asarray(rng.uniform(-1, 1, (120, 3)).astype(np.float32))
    variables, ref = _init_and_reference(tiny_model_cfg, pts)
    out = np.asarray(embed_points_sharded(variables, pts, tiny_model_cfg, mesh8))
    cos = float(np.dot(out, ref) / (np.linalg.norm(out) * np.linalg.norm(ref)))
    assert cos > 0.999, cos


def test_pad_points_do_not_leak(rng, mesh8):
    """Descriptor of n points must not depend on HOW MUCH padding the device
    count forces: compare n=91 (5 pad rows) against the same points on a
    1-device mesh (no pad rows at all)."""
    from jax.sharding import Mesh

    cfg = _f32_cfg()
    pts = jnp.asarray(rng.uniform(-1, 1, (91, 3)).astype(np.float32))
    variables, _ = _init_and_reference(cfg, pts)
    out8 = np.asarray(embed_points_sharded(variables, pts, cfg, mesh8))
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("db",))
    out1 = np.asarray(embed_points_sharded(variables, pts, cfg, mesh1))
    np.testing.assert_allclose(out8, out1, atol=2e-4)


def test_k_exceeds_shard_raises(rng, mesh8):
    cfg = _f32_cfg(knn_k=20)
    pts = jnp.asarray(rng.uniform(-1, 1, (32, 3)).astype(np.float32))  # nl=4
    variables, _ = _init_and_reference(cfg, jnp.asarray(
        rng.uniform(-1, 1, (128, 3)).astype(np.float32)))
    with pytest.raises(ValueError, match="exceeds points-per-shard"):
        embed_points_sharded(variables, pts, cfg, mesh8)


# ---- giant-submap TRAINING (build_points_sharded_distill_fn) ----


def test_distill_grads_match_dense(mesh8):
    """Points-sharded training is the dense train step in a different
    layout: loss, parameter gradients, and the BN running-stat updates all
    match the single-device train-mode forward (fp32, divisible N).

    Inputs come from a LOCAL seeded generator, not the session rng: the
    gradient comparison is tolerance-borderline (8-shard pmean reduction
    order vs dense), so the outcome must not depend on how many earlier
    tests consumed session-rng draws."""
    import optax  # noqa: F401  (environment sanity)

    from epcnet_tpu.losses import distillation_loss
    from epcnet_tpu.models import build_points_sharded_distill_fn

    rng = np.random.RandomState(42)
    cfg = _f32_cfg()
    pts = jnp.asarray(rng.uniform(-1, 1, (128, 3)).astype(np.float32))
    target = rng.uniform(-1, 1, (cfg.output_dim,)).astype(np.float32)
    target = jnp.asarray(target / np.linalg.norm(target))

    model = EPCNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), pts[None], train=False)

    def dense_loss(params):
        desc, updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts[None], train=True, momentum=0.9, mutable=["batch_stats"],
        )
        return distillation_loss(desc[0], target), updates["batch_stats"]

    (ref_loss, ref_stats), ref_g = jax.value_and_grad(
        dense_loss, has_aux=True)(variables["params"])

    step = build_points_sharded_distill_fn(cfg, mesh8)
    loss, g, stats = step(
        variables["params"], variables["batch_stats"], pts, target, momentum=0.9
    )

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    flat_ref = jax.tree_util.tree_leaves(ref_g)
    flat = jax.tree_util.tree_leaves(g)
    assert len(flat) == len(flat_ref)
    for a, b in zip(flat, flat_ref):
        # Scale-aware atol: BN backward divides by small batch variances, so
        # the 8-shard psum's different reduction order shifts near-zero
        # elements by up to ~1e-4 absolute in fp32 while staying <<1e-3 of
        # the leaf's gradient scale. Elementwise rtol on those near-zero
        # entries is meaningless; pin each leaf to 1e-3 of its own max.
        b = np.asarray(b)
        atol = max(1e-6, 1e-3 * float(np.max(np.abs(b))))
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-3, atol=atol)
    for a, b in zip(
        jax.tree_util.tree_leaves(stats), jax.tree_util.tree_leaves(ref_stats)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_distill_step_learns(rng, mesh8):
    """A few optimizer steps on the points-sharded gradient reduce the
    distillation loss (end-to-end trainability, bf16 default dtype)."""
    import optax

    from epcnet_tpu.models import build_points_sharded_distill_fn

    cfg = _f32_cfg(compute_dtype="bfloat16")
    pts = jnp.asarray(rng.uniform(-1, 1, (128, 3)).astype(np.float32))
    target = rng.uniform(-1, 1, (cfg.output_dim,)).astype(np.float32)
    target = jnp.asarray(target / np.linalg.norm(target))

    model = EPCNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), pts[None], train=False)
    params, stats = variables["params"], variables["batch_stats"]

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = build_points_sharded_distill_fn(cfg, mesh8)

    losses = []
    for _ in range(5):
        loss, g, stats = step(params, stats, pts, target, momentum=0.9)
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_distill_nondivisible_raises(rng, mesh8):
    from epcnet_tpu.models import build_points_sharded_distill_fn

    cfg = _f32_cfg()
    step = build_points_sharded_distill_fn(cfg, mesh8)
    pts = jnp.asarray(rng.uniform(-1, 1, (91, 3)).astype(np.float32))
    target = jnp.zeros((cfg.output_dim,), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        step(None, None, pts, target)


def test_embed_fn_is_cached(rng, mesh8):
    """Repeated embeds reuse ONE jitted shard_map (a fresh closure per call
    would re-trace + re-compile every cloud, defeating npad_multiple
    bucketing — the serving recompile trap)."""
    from epcnet_tpu.models.points_sharded import _cached_embed_fn

    cfg = _f32_cfg()
    pts = jnp.asarray(rng.uniform(-1, 1, (128, 3)).astype(np.float32))
    variables, _ = _init_and_reference(cfg, pts)
    before = _cached_embed_fn.cache_info().hits
    embed_points_sharded(variables, pts, cfg, mesh8)
    embed_points_sharded(variables, pts, cfg, mesh8)
    assert _cached_embed_fn.cache_info().hits >= before + 1


def test_tuple_train_step_matches_dense(rng, mesh8):
    """The giant-submap metric-learning step (quadruplet tuple, BN over the
    whole stacked tuple) reproduces the dense build_train_step update:
    same loss, same new params, same BN running stats."""
    from epcnet_tpu.configs import TrainConfig
    from epcnet_tpu.models import build_points_sharded_train_step
    from epcnet_tpu.train.state import create_train_state
    from epcnet_tpu.train.step import build_train_step

    cfg = _f32_cfg()
    # SGD, not Adam: Adam's first step is ~lr*sign(g), so leaves whose true
    # gradient is ~0 (e.g. Dense biases ahead of BN mean-subtraction) flip
    # sign on 1e-8 forward noise. SGD deltas scale WITH the gradient, so
    # per-leaf relative comparison is meaningful.
    tcfg = TrainConfig(loss="lazy_quadruplet", optimizer="momentum")
    n, p_cnt, ng_cnt = 128, 2, 3
    q = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    pos = rng.uniform(-1, 1, (p_cnt, n, 3)).astype(np.float32)
    neg = rng.uniform(-1, 1, (ng_cnt, n, 3)).astype(np.float32)
    other = rng.uniform(-1, 1, (n, 3)).astype(np.float32)

    state0 = create_train_state(cfg, tcfg, num_points=n)
    dense_step = build_train_step(cfg, tcfg)
    dstate, dmetrics = dense_step(state0, {
        "query": jnp.asarray(q)[None],
        "positives": jnp.asarray(pos)[None],
        "negatives": jnp.asarray(neg)[None],
        "other_neg": jnp.asarray(other)[None],
    })

    sh_step = build_points_sharded_train_step(cfg, tcfg, mesh8)
    sstate, smetrics = sh_step(state0, {
        "query": jnp.asarray(q),
        "positives": jnp.asarray(pos),
        "negatives": jnp.asarray(neg),
        "other_neg": jnp.asarray(other),
    })

    np.testing.assert_allclose(
        float(smetrics["loss"]), float(dmetrics["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(smetrics["best_pos_dist"]), float(dmetrics["best_pos_dist"]),
        rtol=1e-4)
    assert int(sstate.step) == int(dstate.step) == 1
    for a, b, z in zip(
        jax.tree_util.tree_leaves(dstate.params),
        jax.tree_util.tree_leaves(sstate.params),
        jax.tree_util.tree_leaves(state0.params),
    ):
        da = np.asarray(a) - np.asarray(z)  # -lr * dense grad
        db = np.asarray(b) - np.asarray(z)  # -lr * sharded grad
        err = np.abs(da - db).max()
        assert err <= max(2e-3 * np.abs(da).max(), 3e-8), (
            err, np.abs(da).max())
    for a, b in zip(
        jax.tree_util.tree_leaves(sstate.batch_stats),
        jax.tree_util.tree_leaves(dstate.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_tuple_train_step_learns(rng, mesh8):
    """Several sharded quadruplet steps reduce the loss on a separable
    fixture (bf16 default dtype, triplet-loss path included via config)."""
    from epcnet_tpu.configs import TrainConfig
    from epcnet_tpu.models import build_points_sharded_train_step
    from epcnet_tpu.train.state import create_train_state

    cfg = _f32_cfg(compute_dtype="bfloat16")
    tcfg = TrainConfig(loss="quadruplet", learning_rate=1e-3)
    n = 128
    base = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    batch = {
        "query": jnp.asarray(base),
        "positives": jnp.asarray(
            base[None] + 0.02 * rng.standard_normal((2, n, 3)).astype(np.float32)),
        "negatives": jnp.asarray(
            rng.uniform(-1, 1, (3, n, 3)).astype(np.float32)),
        "other_neg": jnp.asarray(
            rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
    }
    state = create_train_state(cfg, tcfg, num_points=n)
    step = build_points_sharded_train_step(cfg, tcfg, mesh8)
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_remat_points_sharded_matches_exactly(rng, mesh8):
    """remat on the points-sharded paths is a pure memory knob: the distill
    gradient and a full tuple-step update must reproduce the non-remat
    values to float tolerance (jax.checkpoint recomputes the shard forward
    — including the per-layer all_gathers — without changing the MATH;
    XLA may still schedule/fuse the recomputed graph differently, so
    last-ulp drift is expected and the tolerances below allow it)."""
    from epcnet_tpu.configs import TrainConfig
    from epcnet_tpu.models import (
        build_points_sharded_distill_fn,
        build_points_sharded_train_step,
    )
    from epcnet_tpu.train.state import create_train_state

    cfg = _f32_cfg()
    pts = jnp.asarray(rng.uniform(-1, 1, (128, 3)).astype(np.float32))
    target = rng.uniform(-1, 1, (cfg.output_dim,)).astype(np.float32)
    target = jnp.asarray(target / np.linalg.norm(target))
    model = EPCNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), pts[None], train=False)

    outs = {}
    for remat in (False, True):
        outs[remat] = build_points_sharded_distill_fn(cfg, mesh8, remat=remat)(
            variables["params"], variables["batch_stats"], pts, target,
            momentum=0.9,
        )
    np.testing.assert_allclose(
        float(outs[True][0]), float(outs[False][0]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(outs[True][1]),
        jax.tree_util.tree_leaves(outs[False][1]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    batch = {
        "query": pts,
        "positives": jnp.asarray(
            rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32)),
        "negatives": jnp.asarray(
            rng.uniform(-1, 1, (3, 128, 3)).astype(np.float32)),
        "other_neg": jnp.asarray(
            rng.uniform(-1, 1, (128, 3)).astype(np.float32)),
    }
    states = {}
    for remat in (False, True):
        tcfg = TrainConfig(loss="lazy_quadruplet", optimizer="momentum",
                           remat=remat)
        state = create_train_state(cfg, tcfg, num_points=128)
        state, m = build_points_sharded_train_step(cfg, tcfg, mesh8)(
            state, batch)
        states[remat] = (state, float(m["loss"]))
    np.testing.assert_allclose(states[True][1], states[False][1], rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(states[True][0].params),
        jax.tree_util.tree_leaves(states[False][0].params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
