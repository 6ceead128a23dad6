"""Training-stack tests: schedules, one-step gradient sanity, loss decrease
over a short synthetic run, mining cache, checkpoint round-trip."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epcnet_tpu.configs import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from epcnet_tpu.data import TupleLoader, construct_query_dict
from epcnet_tpu.data.tuples import scan_runs
from epcnet_tpu.train import (
    MiningCache,
    Trainer,
    bn_momentum_schedule,
    build_embed_fn,
    build_train_step,
    create_train_state,
    lr_schedule,
)


def _exp_cfg(synthetic_root, tiny_model_cfg, **train_kw):
    tkw = dict(
        batch_num_queries=2, max_epoch=1, learning_rate=1e-3,
        mining_start_epoch=99, log_every_steps=5, checkpoint_every_steps=10**6,
    )
    tkw.update(train_kw)
    return ExperimentConfig(
        model=tiny_model_cfg,
        data=DataConfig(dataset_root=synthetic_root, num_points=128,
                        num_negatives=4, num_positives=2),
        train=TrainConfig(**tkw),
        log_dir=tempfile.mkdtemp(),
    )


def test_lr_schedule_staircase():
    cfg = TrainConfig(learning_rate=1e-3, lr_decay_steps=100, lr_decay_rate=0.5)
    fn = lr_schedule(cfg)
    assert float(fn(0)) == pytest.approx(1e-3)
    assert float(fn(99)) == pytest.approx(1e-3)
    assert float(fn(100)) == pytest.approx(5e-4)
    assert float(fn(10**7)) == pytest.approx(1e-5)  # floor


def test_bn_momentum_schedule():
    cfg = TrainConfig(bn_init_decay=0.5, bn_decay_rate=0.5, bn_decay_steps=100,
                      bn_decay_clip=0.99)
    fn = bn_momentum_schedule(cfg)
    assert float(fn(0)) == pytest.approx(0.5)
    assert float(fn(100)) == pytest.approx(0.75)
    assert float(fn(10**6)) == pytest.approx(0.99)


def test_single_step_decreases_loss_on_fixed_batch(rng, tiny_model_cfg):
    """A few steps on one fixed batch must reduce the loss (gradient sanity)."""
    mcfg = tiny_model_cfg
    tcfg = TrainConfig(learning_rate=1e-3)
    state = create_train_state(mcfg, tcfg, num_points=128)
    step = build_train_step(mcfg, tcfg)
    batch = {
        "query": jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32)),
        "positives": jnp.asarray(rng.uniform(-1, 1, (2, 2, 128, 3)).astype(np.float32)),
        "negatives": jnp.asarray(rng.uniform(-1, 1, (2, 4, 128, 3)).astype(np.float32)),
        "other_neg": jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32)),
    }
    state, m0 = step(state, batch)
    for _ in range(10):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])
    assert int(state.step) == 11


def test_trainer_loss_decreases(synthetic_root, tiny_model_cfg):
    cfg = _exp_cfg(synthetic_root, tiny_model_cfg, max_epoch=2)
    tr = Trainer(cfg, construct_query_dict(
        scan_runs(synthetic_root), exclude_test_regions=False), checkpoints=False)
    tr.train()
    import json
    recs = [json.loads(l) for l in open(cfg.log_dir + "/train.jsonl")]
    # batch-level loss is noisy: compare first half vs second half of the run
    losses = [r["loss"] for r in recs]
    first = np.mean(losses[: len(losses) // 2])
    last = np.mean(losses[len(losses) // 2 :])
    assert last < first


def test_mining_cache(synthetic_root, tiny_model_cfg):
    df = scan_runs(synthetic_root)
    tt = construct_query_dict(df, exclude_test_regions=False)
    dcfg = DataConfig(dataset_root=synthetic_root, num_points=128,
                      num_negatives=4, num_positives=2)
    tcfg = TrainConfig(hard_neg_per_tuple=3)
    state = create_train_state(tiny_model_cfg, tcfg, num_points=128)
    embed = build_embed_fn(tiny_model_cfg)
    cache = MiningCache(tt, dcfg, tcfg, embed, batch_size=16)
    assert cache.hard_negatives(0) is None  # before refresh
    cache.refresh(state.params, state.batch_stats)
    assert cache.latents.shape == (len(tt.queries), tiny_model_cfg.output_dim)
    hard = cache.hard_negatives(0)
    assert len(hard) == 3
    pool = set(tt.queries[0]["negatives"])
    assert all(h in pool for h in hard)
    # hardest = smallest latent distance among negatives
    d = ((cache.latents[list(pool)] - cache.latents[0]) ** 2).sum(-1)
    best = min(d)
    got = ((cache.latents[hard[0]] - cache.latents[0]) ** 2).sum(-1)
    assert got == pytest.approx(best, rel=1e-5)


def test_trainer_epoch_resume(synthetic_root, tiny_model_cfg):
    """Trainer-level restart idempotence (SURVEY.md §5.3): 3 epochs straight
    vs 2 epochs -> kill -> restore -> continue: identical final params, and
    the resumed run re-enters at epoch 2 instead of replaying from 0."""
    import dataclasses

    tt = construct_query_dict(scan_runs(synthetic_root), exclude_test_regions=False)

    cfg_a = _exp_cfg(synthetic_root, tiny_model_cfg, max_epoch=3,
                     mining_start_epoch=1)
    sa = Trainer(cfg_a, tt, checkpoints=False).train()

    cfg_b = _exp_cfg(synthetic_root, tiny_model_cfg, max_epoch=2,
                     mining_start_epoch=1)
    tr_b = Trainer(cfg_b, tt)
    tr_b.train()  # final-epoch save carries the epoch marker

    cfg_c = dataclasses.replace(
        cfg_b, train=dataclasses.replace(cfg_b.train, max_epoch=3)
    )
    tr_c = Trainer(cfg_c, tt)  # "fresh process", same log_dir
    step_restored = tr_c.maybe_restore()
    assert step_restored == int(sa.step) * 2 // 3  # two of three epochs done
    assert int(tr_c.state.epoch) == 2  # resumes INTO epoch 2, no replay
    sc = tr_c.train()

    assert int(sc.step) == int(sa.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(sa.params), jax.tree_util.tree_leaves(sc.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_trainer_midepoch_resume(synthetic_root, tiny_model_cfg):
    """A mid-epoch kill resumes from the periodic checkpoint and skips the
    already-consumed batches, finishing identical to the uninterrupted run."""
    tt = construct_query_dict(scan_runs(synthetic_root), exclude_test_regions=False)

    cfg_a = _exp_cfg(synthetic_root, tiny_model_cfg, max_epoch=1)
    sa = Trainer(cfg_a, tt, checkpoints=False).train()

    cfg_b = _exp_cfg(synthetic_root, tiny_model_cfg, max_epoch=1,
                     checkpoint_every_steps=7)
    tr_b = Trainer(cfg_b, tt)

    class Killed(RuntimeError):
        pass

    real_step, calls = tr_b.step_fn, [0]

    def dying_step(state, batch):
        calls[0] += 1
        if calls[0] > 10:  # dies AFTER the step-7 periodic checkpoint landed
            raise Killed()
        return real_step(state, batch)

    tr_b.step_fn = dying_step
    with pytest.raises(Killed):
        tr_b.train()
    tr_b.ckpt.wait()

    tr_c = Trainer(cfg_b, tt)
    assert tr_c.maybe_restore() == 7
    assert int(tr_c.state.epoch) == 0 and int(tr_c.state.epoch_start_step) == 0
    sc = tr_c.train()

    assert int(sc.step) == int(sa.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(sa.params), jax.tree_util.tree_leaves(sc.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_multi_step_dispatch_equivalence(synthetic_root, tiny_model_cfg):
    """steps_per_dispatch=S (one lax.scan dispatch per S batches) must give
    bit-identical parameters to S single-step dispatches, including an
    epoch-tail remainder that doesn't fill a dispatch."""
    tt = construct_query_dict(scan_runs(synthetic_root), exclude_test_regions=False)

    def run(s):
        cfg = _exp_cfg(synthetic_root, tiny_model_cfg, max_epoch=1,
                       steps_per_dispatch=s)
        return Trainer(cfg, tt, checkpoints=False).train()

    s1 = run(1)
    s4 = run(4)  # 45 usable steps -> 11 full dispatches + 1 remainder
    assert int(s1.step) == int(s4.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s4.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_checkpoint_roundtrip(synthetic_root, tiny_model_cfg):
    from epcnet_tpu.train.checkpoint import CheckpointManager

    tcfg = TrainConfig()
    state = create_train_state(tiny_model_cfg, tcfg, num_points=128)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    d = tempfile.mkdtemp()
    mgr = CheckpointManager(d, keep=2)
    mgr.save(state)
    mgr.wait()
    fresh = create_train_state(tiny_model_cfg, tcfg, rng=jax.random.PRNGKey(99),
                               num_points=128)
    restored = mgr.restore(fresh)
    assert int(restored.step) == 7
    l1 = jax.tree_util.tree_leaves(state.params)
    l2 = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mining_batched_selection_matches_per_query_oracle(
    synthetic_root, tiny_model_cfg
):
    """The device-batched hardest-negative precompute (VERDICT r2 weak #4)
    must reproduce the per-query numpy selection it replaced, for every
    tuple, including subsampled pools (same (seed, generation, query) RNG
    keying)."""
    import numpy as np

    df = scan_runs(synthetic_root)
    tt = construct_query_dict(df, exclude_test_regions=False)
    dcfg = DataConfig(dataset_root=synthetic_root, num_points=128,
                      num_negatives=4, num_positives=2)
    # sampled_neg_pool below the largest pool: the subsample RNG path runs
    tcfg = TrainConfig(hard_neg_per_tuple=4, sampled_neg_pool=20)
    state = create_train_state(tiny_model_cfg, tcfg, num_points=128)
    embed = build_embed_fn(tiny_model_cfg)
    cache = MiningCache(tt, dcfg, tcfg, embed, batch_size=16)
    cache.refresh(state.params, state.batch_stats)
    cache.refresh(state.params, state.batch_stats)  # generation 1
    lat, gen = cache._cache
    assert gen == 1

    for qi in range(len(tt.queries)):
        pool = tt.queries[qi]["negatives"]
        got = cache.hard_negatives(qi)
        if not pool:
            assert got is None
            continue
        if len(pool) > tcfg.sampled_neg_pool:
            rng = np.random.default_rng((tcfg.seed, 17, gen, qi))
            pool = list(rng.choice(pool, tcfg.sampled_neg_pool, replace=False))
        d = ((lat[np.asarray(pool)] - lat[qi]) ** 2).sum(-1)
        k = min(tcfg.hard_neg_per_tuple, len(pool))
        order = np.argsort(d, kind="stable")[:k]
        want = sorted(d[order].tolist())
        got_d = sorted(((lat[g] - lat[qi]) ** 2).sum(-1) for g in got)
        assert len(got) == k
        np.testing.assert_allclose(got_d, want, rtol=1e-5, atol=1e-6)
        assert all(g in set(pool) for g in got)


def test_trainer_with_gather_adjacency(synthetic_root, tiny_model_cfg):
    """End-to-end Trainer run with adjacency_format='gather' (the no-adjacency
    capacity rung is differentiable, so the FULL train loop must work on it,
    not just eval) — finite losses and a saved config round-trip."""
    import json

    gcfg = tiny_model_cfg.variant(adjacency_format="gather")
    cfg = _exp_cfg(synthetic_root, gcfg, max_epoch=1)
    tr = Trainer(cfg, construct_query_dict(
        scan_runs(synthetic_root), exclude_test_regions=False), checkpoints=False)
    tr.train()
    recs = [json.loads(l) for l in open(cfg.log_dir + "/train.jsonl")]
    assert recs and all(np.isfinite(r["loss"]) for r in recs)


def _fixed_batch(rng, b=2):
    return {
        "query": jnp.asarray(rng.uniform(-1, 1, (b, 128, 3)).astype(np.float32)),
        "positives": jnp.asarray(rng.uniform(-1, 1, (b, 2, 128, 3)).astype(np.float32)),
        "negatives": jnp.asarray(rng.uniform(-1, 1, (b, 4, 128, 3)).astype(np.float32)),
        "other_neg": jnp.asarray(rng.uniform(-1, 1, (b, 128, 3)).astype(np.float32)),
    }


def test_remat_step_matches_baseline_exactly(rng, tiny_model_cfg):
    """TrainConfig.remat is a pure memory knob: jax.checkpoint recomputes
    activations in the backward pass but the math is IDENTICAL, so one step
    with and without it must agree to float tolerance."""
    mcfg = tiny_model_cfg
    batch = _fixed_batch(rng)
    outs = {}
    for remat in (False, True):
        tcfg = TrainConfig(learning_rate=1e-3, remat=remat)
        state = create_train_state(mcfg, tcfg, num_points=128)
        state, m = build_train_step(mcfg, tcfg)(state, batch)
        outs[remat] = (state, m)
    np.testing.assert_allclose(
        float(outs[True][1]["loss"]), float(outs[False][1]["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(outs[True][0].params),
        jax.tree_util.tree_leaves(outs[False][0].params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_grad_accum_duplicated_halves_match_full_batch_loss(tiny_model_cfg):
    """With the two halves of the batch IDENTICAL, per-micro BatchNorm
    statistics equal the full-batch statistics, so the accumulated forward
    (loss + aux) must reproduce accum=1 up to bf16 reduction-order noise
    (tiny_model_cfg computes in bfloat16, and a [2B,...] matmul tiles
    differently from two [B,...] ones). The tolerance is sized to bf16
    single-op relative precision (2^-8 ≈ 3.9e-3): drift up to ~6e-4 was
    observed across batch draws, so a tighter bound just encodes one lucky
    draw. Data comes from a LOCAL seeded rng — the session rng fixture's
    state depends on which tests ran before, which made this flaky under
    full-suite ordering. Parameter updates are NOT compared here: gradients
    of bias leaves feeding BatchNorm/softmax are analytically zero, so
    their numeric value is pure cancellation noise that differs with
    reduction order — the accumulation ARITHMETIC is pinned exactly (fp32,
    no model) by test_accum_value_and_grad_matches_explicit_loop instead."""
    mcfg = tiny_model_cfg
    half = _fixed_batch(np.random.RandomState(1234), b=1)
    batch = {k: jnp.concatenate([v, v], axis=0) for k, v in half.items()}
    outs = {}
    for accum in (1, 2):
        tcfg = TrainConfig(learning_rate=1e-3, grad_accum_steps=accum)
        state = create_train_state(mcfg, tcfg, num_points=128)
        state, m = build_train_step(mcfg, tcfg)(state, batch)
        outs[accum] = m
    for key in ("loss", "best_pos_dist", "min_neg_dist"):
        np.testing.assert_allclose(
            float(outs[2][key]), float(outs[1][key]), rtol=2e-3
        )


def test_accum_value_and_grad_matches_explicit_loop():
    """The accumulation contract — mean loss/aux, mean gradients, CHAINED
    batch_stats — against a hand-written python micro-loop on a toy
    grad_fn (no model, so no degenerate zero-gradient directions)."""
    from epcnet_tpu.train.step import _accum_value_and_grad

    params = {"w": jnp.arange(1.0, 4.0)}
    batch = {"x": jnp.arange(12.0).reshape(4, 3), "y": jnp.arange(4.0)}

    def grad_fn(p, bs, mb):
        def loss(p):
            l = jnp.mean((mb["x"] @ p["w"] - mb["y"] - bs) ** 2)
            return l, (bs + 0.5, {"m": l * 2.0})

        return jax.value_and_grad(loss, has_aux=True)(p)

    loss, new_bs, aux, grads = _accum_value_and_grad(
        grad_fn, params, jnp.float32(0.0), batch, 2
    )
    # explicit loop over the same micro split — INTERLEAVED (micro j takes
    # rows j::accum; shard-local under a "data"-sharded batch axis)
    bs = jnp.float32(0.0)
    losses, ms, gs = [], [], []
    for i in range(2):
        mb = {k: v[i::2] for k, v in batch.items()}
        (l, (bs, a)), g = grad_fn(params, bs, mb)
        losses.append(float(l))
        ms.append(float(a["m"]))
        gs.append(np.asarray(g["w"]))
    np.testing.assert_allclose(float(loss), np.mean(losses), rtol=1e-6)
    np.testing.assert_allclose(float(new_bs), float(bs), rtol=1e-6)
    np.testing.assert_allclose(float(aux["m"]), np.mean(ms), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grads["w"]), np.mean(gs, axis=0), rtol=1e-6
    )


def test_grad_accum_learns_and_validates(rng, tiny_model_cfg):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divisible"):
        TrainConfig(batch_num_queries=3, grad_accum_steps=2)
    tcfg = TrainConfig(learning_rate=1e-3, grad_accum_steps=2, remat=True)
    state = create_train_state(tiny_model_cfg, tcfg, num_points=128)
    step = build_train_step(tiny_model_cfg, tcfg)
    batch = _fixed_batch(rng)
    state, m0 = step(state, batch)
    for _ in range(10):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])
    assert int(state.step) == 11  # one optimizer step per dispatch
