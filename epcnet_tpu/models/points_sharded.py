"""Points-sharded EPC-Net embed: ONE submap too large for a single device,
its POINT axis sharded over a mesh axis (SURVEY.md §5.7 — the ">100k-point
submap" capacity promise, sequence-parallel style).

This is the top rung of the capacity ladder (docs/KERNELS.md):
  1. dense int8 adjacency         — fastest, O(N^2) HBM, up to N=16k on v5e;
  2. adjacency_format="packed"    — 1 bit/entry, measured to N=32k;
  3. adjacency_format="gather"    — no adjacency at all, single-chip >32k
     (models/epcnet.py, ops/adjacency.py gather_neighbor_mean);
  4. points-sharded embed (here)  — the POINT AXIS itself shards over the
     mesh: O(N^2/ndev) distance blocks per device, neighbour means as
     gathers over global kNN id lists — for submaps past one chip's HBM
     or when embed latency must scale down with device count.
Training on any rung composes with TrainConfig.remat (and on rungs 1-3
with grad_accum_steps): jax.checkpoint'd forwards recompute activations
in the backward — see build_points_sharded_distill_fn's remat note.

How each stage crosses the shard boundary:
  - kNN graph: ``ring_knn_local`` (ops/retrieval.py) — candidate blocks
    rotate around the ICI ring via ppermute; each device ends with the exact
    global kNN ids of its own rows.
  - ProxyConv neighbour mean: one ``all_gather`` of the [N, C] feature table
    per layer, then a [nl, k] gather + mean. At large N this is the whole
    point: the gather moves N·C values where the dense row-block A would be
    N^2/ndev (at N=131k, C=64: 33 MB vs 2.1 GB/device).
  - VLAD: per-shard partial sums + one psum each for the residual matrix and
    assignment mass (ops/vlad.py psum_axis) — VLAD is a sum over points, so
    this is the head's entire cross-device cost.
  - Pad rows (N padded up to a multiple of ndev, coords at 1e6) are masked
    out of the VLAD assignment (ops/vlad.py mask) and can never be a real
    point's neighbour (distance ~1e12 loses every ring merge for n >= k).

Inference (``embed_points_sharded``) runs BatchNorm on running stats, so
the sharded embed is numerically the single-device embed up to summation
order. TRAINING is supported too (``build_points_sharded_distill_fn``):
BN batch statistics are completed with per-layer [C] psums
(layers.DynamicBatchNorm axis_name), the loss is differentiated per shard
(all_gather transposes to psum_scatter, the neighbour gather to a
scatter-add), and one final psum sums the per-shard parameter-gradient
contributions — the standard explicit-SPMD pattern. Train mode requires N
divisible by the device count (pad rows would pollute BN batch stats);
drop up to ndev-1 points, negligible at giant-submap scale.

Reference equivalent: none — the reference family (LINEAGE: TF1
PointNetVLAD/EPC-Net) is single-GPU per submap and caps at 4096 points;
this is the TPU-native extension SURVEY.md §5.7 planned for it.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from epcnet_tpu.configs import ModelConfig
from epcnet_tpu.models.layers import ProxyConv, SharedMLP
from epcnet_tpu.models.vlad_head import GVLADHead
from epcnet_tpu.ops.retrieval import ring_knn_local


class _ShardEPCNet(nn.Module):
    """Per-shard body: EPCNet's exact submodule tree (proxyconv_i / lift /
    gvlad — a trained EPCNet checkpoint applies verbatim), neighbour means
    via global-id gathers instead of the dense adjacency matmul. Runs under
    a caller shard_map over ``axis``; input is this shard's rows."""

    cfg: ModelConfig
    axis: str
    ndev: int

    @nn.compact
    def __call__(self, xs, mask=None, train: bool = False, momentum=0.99):
        # xs: [nl, 3] ONE cloud's shard, or [T, nl, 3] a tuple of T clouds
        # sharded on the point axis (the metric-learning train step stacks
        # query/positives/negatives so BN statistics span the whole tuple,
        # exactly like the dense step's [B*T, N, 3] flatten —
        # train/step.py build_train_step). mask: optional [nl] 1=real 0=pad
        # (None = no pad rows — required in train mode, where pad
        # activations would pollute the BN batch statistics).
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        k = cfg.knn_k
        single = xs.ndim == 2
        if single:
            xs = xs[None]
        t, nl, _ = xs.shape

        # Exact global kNN per cloud (ppermute ring; ids are global).
        # Unrolled over T — tuples are small (1 query + P pos + Ng neg + 1).
        idx = jnp.stack([
            ring_knn_local(xs[i].astype(jnp.float32), k, self.axis, self.ndev)[0]
            for i in range(t)
        ])  # [T, nl, k]
        idx = jax.lax.stop_gradient(idx)

        f = xs.astype(dtype)  # [T, nl, C]
        scales = []
        for i, ch in enumerate(cfg.proxyconv_channels):
            # Neighbour mean across shards: gather each cloud's k global
            # rows from its all-gathered [N, C] feature table (shard-major
            # row order matches the ring kNN's src*nl+pos global ids). fp32
            # accumulation of the k-sum mirrors the dense path's
            # fp32-accumulated A@F matmul. Differentiable: all_gather
            # transposes to psum_scatter, the gather to a scatter-add.
            fullg = jax.lax.all_gather(f, self.axis)  # [ndev, T, nl, C]
            full = jnp.moveaxis(fullg, 0, 1).reshape(t, self.ndev * nl, -1)
            nbr = jax.vmap(lambda tbl, ids: jnp.take(tbl, ids, axis=0))(
                full, idx
            ).astype(jnp.float32)  # [T, nl, k, C]
            proxy = (jnp.sum(nbr, axis=2) * (1.0 / k)).astype(dtype)
            f = ProxyConv(
                ch, knn_k=k, dtype=dtype, bn_axis=self.axis,
                name=f"proxyconv_{i}",
            )(f, None, train, momentum, proxy=proxy)
            scales.append(f)

        f_cat = jnp.concatenate(scales, axis=-1)
        f_lift = SharedMLP(
            cfg.lift_channels, dtype=dtype, bn_axis=self.axis, name="lift"
        )(f_cat, train, momentum)  # [T, nl, feature_dim]

        # VLAD head with psum-completed sums ([B, N, D] contract, B=T).
        # Output is replicated (identical on all shards).
        desc = GVLADHead(cfg, name="gvlad", psum_axis=self.axis)(
            f_lift, train, momentum,
            mask=None if mask is None else jnp.broadcast_to(mask[None], (t, nl)),
        )  # [T, output_dim]
        return desc[0] if single else desc


def embed_points_sharded(
    variables,
    points: jnp.ndarray,
    cfg: ModelConfig,
    mesh: Mesh,
    axis: str = "db",
    npad_multiple: int = 1,
) -> jnp.ndarray:
    """Embed ONE [N, 3] submap with its point axis sharded over ``axis``.

    ``variables`` are a trained EPCNet's (params + batch_stats) — the shard
    body reuses the identical module tree, so no re-export is needed.
    Returns the [output_dim] fp32 L2-normalized descriptor (replicated).

    ``npad_multiple``: round the padded N up to a multiple of this (beyond
    the always-required multiple of the device count). Pad rows are masked,
    so the descriptor is invariant to it — callers embedding many
    DIFFERENT-sized clouds (cli/embed.py) bucket sizes with it so XLA
    compiles once per bucket instead of once per distinct N (the same
    recompile trap serving hit — cli/serve.py).
    """
    ndev = mesh.shape[axis]
    n = points.shape[0]
    q = ndev * max(1, npad_multiple)
    npad = -(-n // q) * q
    nl = npad // ndev
    if cfg.knn_k > nl:
        raise ValueError(
            f"knn_k={cfg.knn_k} exceeds points-per-shard {nl} "
            f"(N={n} over {ndev} devices)"
        )
    if n < cfg.knn_k:
        raise ValueError(f"need at least knn_k={cfg.knn_k} points, got {n}")
    xp = jnp.pad(
        points.astype(jnp.float32), ((0, npad - n), (0, 0)), constant_values=1e6
    )
    mask = (jnp.arange(npad) < n).astype(jnp.float32)

    fn = _cached_embed_fn(cfg, mesh, axis, ndev)
    v = jax.device_put(variables, NamedSharding(mesh, P()))
    xp = jax.device_put(xp, NamedSharding(mesh, P(axis)))
    mask = jax.device_put(mask, NamedSharding(mesh, P(axis)))
    return fn(v, xp, mask)


@functools.lru_cache(maxsize=32)
def _cached_embed_fn(cfg: ModelConfig, mesh: Mesh, axis: str, ndev: int):
    """One jitted shard_map per (cfg, mesh, axis): a fresh closure per call
    would miss jax's jit cache and re-trace + re-compile EVERY embed (~16 s
    each on the CPU mesh, measured) — exactly the recompile tax the
    npad_multiple bucketing exists to avoid. Cached, only a new padded
    shape compiles (once per bucket)."""
    model = _ShardEPCNet(cfg, axis, ndev)
    return jax.jit(
        jax.shard_map(
            lambda v, x, m: model.apply(v, x, m),
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=P(),
            check_vma=False,
        )
    )


def build_points_sharded_distill_fn(
    cfg: ModelConfig,
    mesh: Mesh,
    axis: str = "db",
    remat: bool = False,
):
    """Gradient step for GIANT-submap distillation: the student embeds one
    points-sharded cloud and mimics a precomputed teacher descriptor
    (losses.distillation_loss — the same objective cli/distill.py trains
    at reference scale).

    Returns jitted ``fn(params, batch_stats, points [N, 3], teacher_desc
    [output_dim], momentum) -> (loss, grads, new_batch_stats)`` with
    ``grads`` matching the params tree (pmean-completed, replicated) and
    ``new_batch_stats`` the BN running stats after this step. N must be
    divisible by the mesh axis size (see module docstring). Plug ``grads``
    into any optax optimizer.

    ``remat``: jax.checkpoint the shard forward — the backward pass
    recomputes activations (and the per-layer all_gathers) instead of
    holding them in HBM. EXACT same values (tested); at giant-submap scale
    this is the difference between the backward's O(layers·N·C) live
    activations and one forward's worth, for ~1 extra forward of FLOPs +
    ICI traffic. Composes with the sharding itself: rung 4b of the
    capacity ladder.
    """
    from epcnet_tpu.losses import distillation_loss

    ndev = mesh.shape[axis]
    model = _ShardEPCNet(cfg, axis, ndev)

    def local(params, batch_stats, xs, target, momentum):
        def fwd(p):
            return model.apply(
                {"params": p, "batch_stats": batch_stats},
                xs, None, True, momentum, mutable=["batch_stats"],
            )

        if remat:
            fwd = jax.checkpoint(fwd)

        def loss_fn(p):
            desc, updates = fwd(p)
            return distillation_loss(desc, target), updates["batch_stats"]

        (loss, new_stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # pmean, NOT psum: psum is its own transpose, so each shard's local
        # grad already carries every shard's cotangent through the in-graph
        # collectives (the SPMD program differentiates the sum of the ndev
        # replicated loss copies — a uniform ndev× overcount, measured
        # exactly 8x on the 8-device mesh). pmean both completes the
        # cross-shard sum and removes that factor, for pre- and
        # post-collective parameters alike.
        g = jax.lax.pmean(g, axis)
        return loss, g, new_stats

    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )

    def step(params, batch_stats, points, teacher_desc, momentum=0.99):
        n = points.shape[0]
        if n % ndev != 0:
            raise ValueError(
                f"points-sharded training needs N divisible by the {ndev}-way "
                f"'{axis}' axis, got N={n} (drop {n % ndev} points)"
            )
        if cfg.knn_k > n // ndev:
            raise ValueError(
                f"knn_k={cfg.knn_k} exceeds points-per-shard {n // ndev}"
            )
        xp = jax.device_put(
            points.astype(jnp.float32), NamedSharding(mesh, P(axis))
        )
        rep = NamedSharding(mesh, P())
        params = jax.device_put(params, rep)
        batch_stats = jax.device_put(batch_stats, rep)
        momentum = jax.device_put(jnp.asarray(momentum, jnp.float32), rep)
        teacher_desc = jax.device_put(
            jnp.asarray(teacher_desc, jnp.float32), rep
        )
        return fn(params, batch_stats, xp, teacher_desc, momentum)

    return step


def build_points_sharded_train_step(
    cfg: ModelConfig,
    train_cfg,
    mesh: Mesh,
    axis: str = "db",
):
    """Full metric-learning train step on ONE giant-submap tuple — the
    reference's primary objective (quadruplet family, train/step.py
    build_train_step) at sizes no single device can hold.

    Returns ``step(state, batch) -> (state, metrics)`` with the dense
    step's exact contract, except the batch is a single tuple of [.., N, 3]
    clouds (no leading B axis): ``query`` [N, 3], ``positives`` [P, N, 3],
    ``negatives`` [Ng, N, 3], and ``other_neg`` [N, 3] for quadruplet
    losses. All clouds are stacked and run through the shard body together,
    so BN statistics span the whole tuple exactly like the dense step's
    [B*T, N, 3] flatten; gradients are pmean-completed per-shard autodiff
    (see build_points_sharded_distill_fn) and applied through
    ``state.apply_gradients`` inside one jitted program. N must be
    divisible by the mesh axis size.
    """
    from epcnet_tpu import losses as losses_lib
    from epcnet_tpu.train.state import bn_momentum_schedule, lr_schedule

    if getattr(train_cfg, "grad_accum_steps", 1) != 1:
        raise ValueError(
            "grad_accum_steps does not apply to the points-sharded step "
            "(ONE tuple per optimizer step — there is no batch axis to "
            "split; use train.remat or more devices on the point axis)"
        )
    ndev = mesh.shape[axis]
    model = _ShardEPCNet(cfg, axis, ndev)
    loss_fn = losses_lib.get_loss(train_cfg.loss)
    quad = "quadruplet" in train_cfg.loss
    bn_mom = bn_momentum_schedule(train_cfg)
    lr = lr_schedule(train_cfg)

    @functools.lru_cache(maxsize=8)
    def compiled(p_cnt: int, ng_cnt: int):
        def local(params, batch_stats, clouds, step):
            # clouds: [T, nl, 3] this shard's slice of every tuple cloud
            def fwd(p, mom):
                return model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    clouds, None, True, mom, mutable=["batch_stats"],
                )

            if getattr(train_cfg, "remat", False):
                # recompute shard activations (incl. the per-layer
                # all_gathers) in the backward — see
                # build_points_sharded_distill_fn's remat note
                fwd = jax.checkpoint(fwd)

            def compute(p):
                desc, mut = fwd(p, bn_mom(step))
                qd = desc[0][None]
                pd = desc[1 : 1 + p_cnt][None]
                nd = desc[1 + p_cnt : 1 + p_cnt + ng_cnt][None]
                if quad:
                    loss = loss_fn(
                        qd, pd, nd, desc[-1][None],
                        train_cfg.margin_1, train_cfg.margin_2,
                    )
                else:
                    loss = loss_fn(qd, pd, nd, train_cfg.margin_1)
                aux = {
                    "best_pos_dist": jnp.mean(
                        losses_lib.best_pos_distance(qd, pd)
                    ),
                    "min_neg_dist": jnp.mean(
                        jnp.min(jnp.sum((nd - qd[:, None]) ** 2, -1), axis=-1)
                    ),
                }
                return loss, (mut["batch_stats"], aux)

            (loss, (new_bs, aux)), g = jax.value_and_grad(
                compute, has_aux=True)(params)
            g = jax.lax.pmean(g, axis)  # see build_points_sharded_distill_fn
            return loss, g, new_bs, aux

        smapped = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(None, axis), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )

        @jax.jit
        def step_fn(state, clouds):
            loss, g, new_bs, aux = smapped(
                state.params, state.batch_stats, clouds, state.step
            )
            state = state.apply_gradients(g).replace(batch_stats=new_bs)
            metrics = {
                "loss": loss,
                "learning_rate": lr(state.step),
                "bn_momentum": bn_mom(state.step),
                **aux,
            }
            return state, metrics

        return step_fn

    def step(state, batch):
        q = batch["query"]
        n = q.shape[0]
        if n % ndev != 0:
            raise ValueError(
                f"points-sharded training needs N divisible by the {ndev}-way "
                f"'{axis}' axis, got N={n} (drop {n % ndev} points)"
            )
        if cfg.knn_k > n // ndev:
            raise ValueError(
                f"knn_k={cfg.knn_k} exceeds points-per-shard {n // ndev}"
            )
        parts = [q[None], batch["positives"], batch["negatives"]]
        if quad:
            parts.append(batch["other_neg"][None])
        clouds = jnp.concatenate(parts, axis=0).astype(jnp.float32)
        clouds = jax.device_put(clouds, NamedSharding(mesh, P(None, axis)))
        state = jax.device_put(state, NamedSharding(mesh, P()))
        return compiled(
            batch["positives"].shape[0], batch["negatives"].shape[0]
        )(state, clouds)

    return step
