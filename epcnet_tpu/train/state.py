"""Train state + schedules.

Reference equivalent: train.py's get_learning_rate() / get_bn_decay()
(TF exponential_decay, staircase) + AdamOptimizer + tf.train.Saver state
[LINEAGE]. The whole state (params, BN stats, optimizer state, step) is one
pytree — restart-idempotent by construction (SURVEY.md §5.3/5.4).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from epcnet_tpu.configs import ModelConfig, TrainConfig
from epcnet_tpu.models import get_model


def lr_schedule(cfg: TrainConfig):
    """Staircase exponential decay [LINEAGE: train.py get_learning_rate],
    clamped below at 1e-5 as in the reference."""

    def fn(step):
        p = jnp.floor(step / cfg.lr_decay_steps)
        lr = cfg.learning_rate * jnp.power(cfg.lr_decay_rate, p)
        return jnp.maximum(lr, 1e-5)

    return fn


def bn_momentum_schedule(cfg: TrainConfig):
    """bn_decay = min(clip, 1 - init*rate^(step/decay_steps)) [LINEAGE:
    train.py get_bn_decay]. This is the EMA momentum fed to BatchNorm."""

    def fn(step):
        p = jnp.floor(step / cfg.bn_decay_steps)
        mom = cfg.bn_init_decay * jnp.power(cfg.bn_decay_rate, p)
        return jnp.minimum(cfg.bn_decay_clip, 1.0 - mom)

    return fn


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # Epoch bookkeeping for resume (SURVEY.md §5.3): ``epoch`` is the epoch
    # in progress and ``epoch_start_step`` the global step at its start, so a
    # restore can re-enter the epoch loop at the right place and skip the
    # already-consumed batches of a mid-epoch checkpoint.
    epoch: jnp.ndarray = None
    epoch_start_step: jnp.ndarray = None
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    lr = lr_schedule(cfg)
    if cfg.optimizer == "adam":
        return optax.adam(lr)
    if cfg.optimizer == "momentum":
        return optax.sgd(lr, momentum=cfg.momentum)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


def create_train_state(
    model_cfg: ModelConfig, train_cfg: TrainConfig, rng=None, num_points: int | None = None
) -> TrainState:
    model = get_model(model_cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(train_cfg.seed)
    n = num_points or model_cfg.num_points
    dummy = jnp.zeros((1, n, 3), jnp.float32)
    # jit the init: eager init dispatches every elementary op as its own
    # (remote) compile on the axon platform — one jitted program instead.
    variables = jax.jit(lambda r, d: model.init(r, d, train=False))(rng, dummy)
    tx = make_optimizer(train_cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        epoch=jnp.zeros((), jnp.int32),
        epoch_start_step=jnp.zeros((), jnp.int32),
        tx=tx,
    )
