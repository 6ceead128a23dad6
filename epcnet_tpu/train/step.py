"""Jitted train / embed steps.

Reference equivalent: the graph built in train.py train() — tuple forward,
quadruplet loss, Adam minimize [LINEAGE; SURVEY.md §3.1]. One apply() runs
ALL clouds of the batch's tuples (query + positives + negatives + other_neg)
through the network at once — exactly the reference's stacked placeholder —
so BatchNorm sees the same statistics and the MXU sees one big batch.

Sharding model: the step itself is mesh-agnostic; the trainer device_puts
the batch with its leading axis sharded over the mesh's "data" axis and the
state replicated, and GSPMD inserts the gradient/BN psums over ICI
(SURVEY.md §5.8). Works identically on 1 chip.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from epcnet_tpu.configs import ModelConfig, TrainConfig
from epcnet_tpu import losses as losses_lib
from epcnet_tpu.models import get_model
from epcnet_tpu.train.state import TrainState, bn_momentum_schedule, lr_schedule


def _maybe_remat(apply_fn, train_cfg: TrainConfig):
    """jax.checkpoint the model forward when TrainConfig.remat is set: the
    backward pass then recomputes activations instead of holding them in HBM
    (EXACT same values — rematerialization does not change math). The
    TPU-idiomatic memory-for-FLOPs trade; buys larger tuple batches per chip."""
    return jax.checkpoint(apply_fn) if train_cfg.remat else apply_fn


def _accum_value_and_grad(grad_fn, params, batch_stats, batch, accum: int):
    """Gradient accumulation over ``accum`` sequential micro-batches inside
    one jitted step (TrainConfig.grad_accum_steps): the tuple axis B is split
    into [accum, B/accum] and scanned, so peak activation memory is that of
    ONE micro-batch. The split is INTERLEAVED (micro j takes tuples
    j::accum): with the batch axis block-sharded over a "data" mesh axis, a
    contiguous split would put each micro-batch entirely on 1/accum of the
    devices and force GSPMD to reshard every scan iteration, while the
    strided split's [B]->[B/accum, accum] reshape is shard-local and keeps
    every micro evenly distributed. Gradients of the mean loss are averaged
    across micros (exactly the full-batch gradient except through BatchNorm,
    which normalizes per micro-batch — standard accumulation semantics); BN
    EMA stats chain ``accum`` updates per optimizer step.

    ``grad_fn(params, batch_stats, micro_batch) -> ((loss, (new_bs, aux)),
    grads)``. Returns (loss, new_batch_stats, aux, grads) with loss/aux
    averaged over micros.
    """
    b = jax.tree_util.tree_leaves(batch)[0].shape[0]
    if b % accum:
        raise ValueError(
            f"batch size {b} is not divisible by grad_accum_steps={accum}"
        )
    micro = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(
            x.reshape((b // accum, accum) + x.shape[1:]), 1, 0
        ),
        batch,
    )

    def body(carry, mb):
        bs, gacc = carry
        (loss, (new_bs, aux)), grads = grad_fn(params, bs, mb)
        gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
        return (new_bs, gacc), (loss, aux)

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    (new_bs, gsum), (losses, auxs) = jax.lax.scan(
        body, (batch_stats, zeros), micro
    )
    grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
    aux = jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), auxs)
    return jnp.mean(losses), new_bs, aux, grads


def build_train_step(model_cfg: ModelConfig, train_cfg: TrainConfig) -> Callable:
    """Returns jitted ``step(state, batch) -> (state, metrics)``.

    batch: query [B,N,3], positives [B,P,N,3], negatives [B,Ng,N,3],
    other_neg [B,N,3] (other_neg required for quadruplet losses).
    Honors TrainConfig.remat (exact activation rematerialization) and
    TrainConfig.grad_accum_steps (micro-batch gradient accumulation).
    """
    model = get_model(model_cfg)
    loss_fn = losses_lib.get_loss(train_cfg.loss)
    quad = "quadruplet" in train_cfg.loss
    bn_mom = bn_momentum_schedule(train_cfg)
    lr = lr_schedule(train_cfg)
    accum = train_cfg.grad_accum_steps

    apply_fn = _maybe_remat(
        lambda params, batch_stats, flat, mom: model.apply(
            {"params": params, "batch_stats": batch_stats},
            flat,
            train=True,
            momentum=mom,
            mutable=["batch_stats"],
        ),
        train_cfg,
    )

    def compute_loss(params, batch_stats, batch, step):
        q, pos, neg = batch["query"], batch["positives"], batch["negatives"]
        b, p, n, _ = pos.shape
        ng = neg.shape[1]
        parts = [q[:, None], pos, neg]
        if quad:
            parts.append(batch["other_neg"][:, None])
        clouds = jnp.concatenate(parts, axis=1)  # [B, T, N, 3]
        t = clouds.shape[1]
        flat = clouds.reshape(b * t, n, 3)
        desc, mut = apply_fn(params, batch_stats, flat, bn_mom(step))
        desc = desc.reshape(b, t, -1)
        qd = desc[:, 0]
        pd = desc[:, 1 : 1 + p]
        nd = desc[:, 1 + p : 1 + p + ng]
        if quad:
            od = desc[:, -1]
            loss = loss_fn(qd, pd, nd, od, train_cfg.margin_1, train_cfg.margin_2)
        else:
            loss = loss_fn(qd, pd, nd, train_cfg.margin_1)
        aux = {
            "best_pos_dist": jnp.mean(losses_lib.best_pos_distance(qd, pd)),
            "min_neg_dist": jnp.mean(
                jnp.min(jnp.sum((nd - qd[:, None]) ** 2, -1), axis=-1)
            ),
        }
        return loss, (mut["batch_stats"], aux)

    @jax.jit
    def step(state: TrainState, batch):
        if accum == 1:
            (loss, (new_bs, aux)), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.params, state.batch_stats, batch, state.step)
        else:
            loss, new_bs, aux, grads = _accum_value_and_grad(
                lambda p, bs, mb: jax.value_and_grad(compute_loss, has_aux=True)(
                    p, bs, mb, state.step
                ),
                state.params,
                state.batch_stats,
                batch,
                accum,
            )
        step0 = state.step  # pre-increment: the step the update actually used
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        metrics = {
            "loss": loss,
            # schedules evaluated at step0 — optax's schedule count and the
            # forward's bn momentum both used the PRE-increment step, so
            # logging lr(state.step) would report each staircase decay one
            # step before it takes effect
            "learning_rate": lr(step0),
            "bn_momentum": bn_mom(step0),
            **aux,
        }
        return state, metrics

    return step


def build_multi_train_step(model_cfg: ModelConfig, train_cfg: TrainConfig) -> Callable:
    """S steps per dispatch: one jitted ``lax.scan`` over a [S, ...]-stacked
    batch dict. Identical math to S sequential single steps (bit-equal on
    CPU; on TPU the scan may fuse differently for ~1e-3-loss-scale drift) in
    ONE device dispatch. Measured on the axon tunnel: NO wall win (async
    dispatch already pipelines the ~35 ms tax away) — the value is on setups
    where dispatch blocks, and as the pod-scale multi-step pattern. Returns
    the LAST step's metrics.
    """
    single = build_train_step(model_cfg, train_cfg)  # inlined under the scan

    @jax.jit
    def multi(state: TrainState, batches):
        state, ms = jax.lax.scan(single, state, batches)
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    return multi


def build_embed_fn(model_cfg: ModelConfig) -> Callable:
    """Returns jitted ``embed(params, batch_stats, points[B,N,3]) -> [B,D]``
    (inference mode — running BN stats). Used by eval and the mining sweep."""
    model = get_model(model_cfg)

    @jax.jit
    def embed(params, batch_stats, points):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, points, train=False
        )

    return embed


def build_distill_step(
    student_cfg: ModelConfig,
    teacher_cfg: ModelConfig,
    train_cfg: TrainConfig,
    alpha: float = 1.0,
) -> Callable:
    """EPC-Net-L distillation [PAPER §III-D]: metric loss + feature-mimic MSE
    against frozen-teacher descriptors.

    Returns jitted ``step(state, teacher_vars, batch) -> (state, metrics)``.
    """
    student = get_model(student_cfg)
    teacher = get_model(teacher_cfg)
    loss_fn = losses_lib.get_loss(train_cfg.loss)
    quad = "quadruplet" in train_cfg.loss
    bn_mom = bn_momentum_schedule(train_cfg)
    accum = train_cfg.grad_accum_steps

    # remat wraps the STUDENT forward only: the teacher runs under
    # stop_gradient, so XLA keeps no activations for it either way.
    apply_fn = _maybe_remat(
        lambda params, batch_stats, flat, mom: student.apply(
            {"params": params, "batch_stats": batch_stats},
            flat,
            train=True,
            momentum=mom,
            mutable=["batch_stats"],
        ),
        train_cfg,
    )

    def compute_loss(params, batch_stats, teacher_vars, batch, step):
        q, pos, neg = batch["query"], batch["positives"], batch["negatives"]
        b, p, n, _ = pos.shape
        ng = neg.shape[1]
        parts = [q[:, None], pos, neg]
        if quad:
            parts.append(batch["other_neg"][:, None])
        clouds = jnp.concatenate(parts, axis=1)
        t = clouds.shape[1]
        flat = clouds.reshape(b * t, n, 3)
        desc, mut = apply_fn(params, batch_stats, flat, bn_mom(step))
        t_desc = jax.lax.stop_gradient(teacher.apply(teacher_vars, flat, train=False))
        mimic = losses_lib.distillation_loss(desc, t_desc)
        desc = desc.reshape(b, t, -1)
        qd, pd, nd = desc[:, 0], desc[:, 1 : 1 + p], desc[:, 1 + p : 1 + p + ng]
        if quad:
            metric = loss_fn(qd, pd, nd, desc[:, -1], train_cfg.margin_1, train_cfg.margin_2)
        else:
            metric = loss_fn(qd, pd, nd, train_cfg.margin_1)
        loss = metric + alpha * mimic
        return loss, (mut["batch_stats"], {"metric_loss": metric, "mimic_loss": mimic})

    @jax.jit
    def step(state: TrainState, teacher_vars, batch):
        if accum == 1:
            (loss, (new_bs, aux)), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.params, state.batch_stats, teacher_vars, batch, state.step)
        else:
            loss, new_bs, aux, grads = _accum_value_and_grad(
                lambda p, bs, mb: jax.value_and_grad(compute_loss, has_aux=True)(
                    p, bs, teacher_vars, mb, state.step
                ),
                state.params,
                state.batch_stats,
                batch,
                accum,
            )
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return state, {"loss": loss, **aux}

    return step
