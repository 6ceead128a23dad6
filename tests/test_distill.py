"""Distillation step test: mimic loss pulls student descriptors toward the
frozen teacher's."""

import numpy as np

import jax
import jax.numpy as jnp

from epcnet_tpu.configs import ModelConfig, TrainConfig, epcnet_l_config
from epcnet_tpu.models import get_model
from epcnet_tpu.train.state import create_train_state
from epcnet_tpu.train.step import build_distill_step


def test_distill_mimic_loss_decreases(rng, tiny_model_cfg):
    teacher_cfg = tiny_model_cfg
    student_cfg = epcnet_l_config(
        num_points=128, knn_k=8, use_pallas=False,
        proxyconv_channels=(8, 8), lift_channels=(16, 32), feature_dim=32,
        vlad_clusters=4, vlad_groups=2, vlad_group_dim=8,
    )
    tcfg = TrainConfig(learning_rate=1e-3)
    teacher = get_model(teacher_cfg)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 3)).astype(np.float32))
    teacher_vars = teacher.init(jax.random.PRNGKey(1), x, train=False)

    state = create_train_state(student_cfg, tcfg, num_points=128)
    step = build_distill_step(student_cfg, teacher_cfg, tcfg, alpha=5.0)
    batch = {
        "query": jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32)),
        "positives": jnp.asarray(rng.uniform(-1, 1, (2, 2, 128, 3)).astype(np.float32)),
        "negatives": jnp.asarray(rng.uniform(-1, 1, (2, 4, 128, 3)).astype(np.float32)),
        "other_neg": jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32)),
    }
    state, m0 = step(state, teacher_vars, batch)
    for _ in range(15):
        state, m = step(state, teacher_vars, batch)
    assert float(m["mimic_loss"]) < float(m0["mimic_loss"])
    assert float(m["loss"]) < float(m0["loss"])


def test_distill_step_remat_and_accum(rng, tiny_model_cfg):
    """The memory knobs apply to distillation too: remat reproduces the
    baseline first-step loss exactly, and remat+accum learns."""
    teacher_cfg = tiny_model_cfg
    student_cfg = epcnet_l_config(
        num_points=128, knn_k=8, use_pallas=False,
        proxyconv_channels=(8, 8), lift_channels=(16, 32), feature_dim=32,
        vlad_clusters=4, vlad_groups=2, vlad_group_dim=8,
    )
    teacher = get_model(teacher_cfg)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 3)).astype(np.float32))
    teacher_vars = teacher.init(jax.random.PRNGKey(1), x, train=False)
    batch = {
        "query": jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32)),
        "positives": jnp.asarray(rng.uniform(-1, 1, (2, 2, 128, 3)).astype(np.float32)),
        "negatives": jnp.asarray(rng.uniform(-1, 1, (2, 4, 128, 3)).astype(np.float32)),
        "other_neg": jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32)),
    }
    losses = {}
    for remat in (False, True):
        tcfg = TrainConfig(learning_rate=1e-3, remat=remat)
        state = create_train_state(student_cfg, tcfg, num_points=128)
        _, m = build_distill_step(student_cfg, teacher_cfg, tcfg)(
            state, teacher_vars, batch
        )
        losses[remat] = float(m["loss"])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)

    tcfg = TrainConfig(learning_rate=1e-3, grad_accum_steps=2, remat=True)
    state = create_train_state(student_cfg, tcfg, num_points=128)
    step = build_distill_step(student_cfg, teacher_cfg, tcfg)
    state, m0 = step(state, teacher_vars, batch)
    for _ in range(10):
        state, m = step(state, teacher_vars, batch)
    assert float(m["loss"]) < float(m0["loss"])
    assert np.isfinite(float(m["mimic_loss"]))
