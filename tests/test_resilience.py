"""Failure-recovery tests (SURVEY.md §5.3): a killed-and-restarted run must
continue identically to an uninterrupted one (restart idempotence), and the
numeric sanitizers must catch faults."""

import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from epcnet_tpu.configs import ModelConfig, TrainConfig
from epcnet_tpu.train.checkpoint import CheckpointManager
from epcnet_tpu.train.state import create_train_state
from epcnet_tpu.train.step import build_train_step
from epcnet_tpu.utils.debugging import assert_all_finite, checkify_step


def _batch(rng, b=2):
    return {
        "query": jnp.asarray(rng.uniform(-1, 1, (b, 128, 3)).astype(np.float32)),
        "positives": jnp.asarray(rng.uniform(-1, 1, (b, 2, 128, 3)).astype(np.float32)),
        "negatives": jnp.asarray(rng.uniform(-1, 1, (b, 4, 128, 3)).astype(np.float32)),
        "other_neg": jnp.asarray(rng.uniform(-1, 1, (b, 128, 3)).astype(np.float32)),
    }


def test_restart_continuity(rng, tiny_model_cfg):
    """Run 6 steps straight vs 3 steps -> checkpoint -> restore -> 3 steps:
    identical final params (loss-curve continuity, SURVEY.md §5.3)."""
    tcfg = TrainConfig(learning_rate=1e-3)
    step = build_train_step(tiny_model_cfg, tcfg)
    batches = [_batch(np.random.RandomState(100 + i)) for i in range(6)]

    s_straight = create_train_state(tiny_model_cfg, tcfg, num_points=128)
    for b in batches:
        s_straight, _ = step(s_straight, b)

    s_a = create_train_state(tiny_model_cfg, tcfg, num_points=128)
    for b in batches[:3]:
        s_a, _ = step(s_a, b)
    d = tempfile.mkdtemp()
    mgr = CheckpointManager(d)
    mgr.save(s_a)
    mgr.wait()

    s_b = create_train_state(
        tiny_model_cfg, tcfg, rng=jax.random.PRNGKey(777), num_points=128
    )  # "fresh process"
    s_b = mgr.restore(s_b)
    assert int(s_b.step) == 3
    for b in batches[3:]:
        s_b, _ = step(s_b, b)

    for a, b in zip(
        jax.tree_util.tree_leaves(s_straight.params),
        jax.tree_util.tree_leaves(s_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_assert_all_finite():
    ok = {"a": np.ones(3), "b": {"c": np.zeros(2)}}
    assert_all_finite(ok)
    bad = {"a": np.array([1.0, np.nan])}
    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_all_finite(bad, "params")


def test_checkify_catches_nan(rng, tiny_model_cfg):
    """A poisoned batch must raise through the checkified step instead of
    silently writing NaN into the state."""
    from jax.experimental import checkify as ck

    tcfg = TrainConfig(learning_rate=1e-3)
    step = build_train_step(tiny_model_cfg, tcfg)
    state = create_train_state(tiny_model_cfg, tcfg, num_points=128)
    checked = checkify_step(step)

    good = _batch(np.random.RandomState(0))
    state2, m = checked(state, good)  # clean batch passes
    assert np.isfinite(float(m["loss"]))

    bad = dict(good)
    bad["query"] = good["query"].at[0, 0, 0].set(jnp.nan)
    with pytest.raises(ck.JaxRuntimeError):
        checked(state, bad)
