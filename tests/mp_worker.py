"""Multi-process integration worker (spawned by tests/test_multiprocess.py).

Runs the REAL training / retrieval / checkpoint stack across genuine
process boundaries: ``jax.distributed`` on the CPU backend with 2 local
devices per process and Gloo cross-process collectives — the closest
single-machine analogue of a multi-host TPU pod (SURVEY.md §2.3 / §5.8).
Not a pytest file (no ``test_`` prefix): pytest never collects it.

Each invocation joins an N-process cluster, drives one scenario, and
writes ``result_<tag>_<pid>.json`` into the shared workdir for the parent
test to assert on. Scenarios:

- ``train``: full Trainer (DP over all global devices, grads psum across
  processes, optional hard-negative mining sweep + multi-host allgather,
  Orbax checkpointing from every process) for ``--max_epoch`` epochs;
  with ``--guard`` a PreemptionGuard is installed so a parent-sent
  SIGTERM lands as a clean cross-process-consensus checkpoint-and-stop;
  with ``--restore`` the run resumes from the shared log_dir first.
- ``retrieval``: sharded + ring-topk retrieval over all global devices,
  verified against a local numpy oracle in every process.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def checksum(params) -> float:
    import jax
    import numpy as np

    return float(
        sum(
            np.float64(np.abs(np.asarray(leaf)).sum())
            for leaf in jax.tree_util.tree_leaves(params)
        )
    )


def build_cfg(workdir: str, log_subdir: str, max_epoch: int, mining_start: int):
    from epcnet_tpu.configs import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )

    model = ModelConfig(
        num_points=128, knn_k=8, use_pallas=False,
        proxyconv_channels=(16, 16), lift_channels=(32, 64), feature_dim=64,
        vlad_clusters=8, vlad_groups=4, vlad_group_dim=16,
    )
    return ExperimentConfig(
        model=model,
        data=DataConfig(
            dataset_root=os.path.join(workdir, "data"), num_points=128,
            num_negatives=4, num_positives=2,
        ),
        train=TrainConfig(
            batch_num_queries=8, max_epoch=max_epoch, learning_rate=1e-3,
            mining_start_epoch=mining_start, mining_refresh_steps=10**6,
            log_every_steps=5, checkpoint_every_steps=10**6, seed=1234,
        ),
        log_dir=os.path.join(workdir, log_subdir),
    )


def scenario_train(args, result: dict) -> None:
    import jax

    from epcnet_tpu.configs import MeshConfig
    from epcnet_tpu.data.tuples import construct_query_dict, scan_runs
    from epcnet_tpu.parallel import PreemptionGuard, make_mesh
    from epcnet_tpu.train import Trainer

    cfg = build_cfg(args.workdir, args.log_subdir, args.max_epoch,
                    args.mining_start)
    tuples = construct_query_dict(
        scan_runs(cfg.data.dataset_root), exclude_test_regions=False
    )
    mesh = make_mesh(MeshConfig(), devices=jax.devices())
    trainer = Trainer(cfg, tuples, mesh=mesh)
    if args.restore:
        result["restored_step"] = trainer.maybe_restore()
    if args.guard:
        with PreemptionGuard() as guard:
            state = trainer.train(should_stop=guard)
        result["preempted"] = bool(guard.requested)
    else:
        state = trainer.train()
    result["step"] = int(state.step)
    result["checksum"] = checksum(state.params)

    # checkpoint round-trip across processes: a FRESH trainer (template
    # state) must restore to the exact step/params just saved
    fresh = Trainer(cfg, tuples, mesh=mesh)
    result["roundtrip_step"] = fresh.maybe_restore()
    result["roundtrip_checksum"] = checksum(fresh.state.params)


def scenario_retrieval(args, result: dict) -> None:
    import numpy as np

    import jax

    from epcnet_tpu.configs import MeshConfig
    from epcnet_tpu.ops.retrieval import (
        ring_topk_neighbors,
        sharded_topk_neighbors,
    )
    from epcnet_tpu.parallel import make_mesh

    n_global = len(jax.devices())
    rng = np.random.default_rng(7)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    db = rng.standard_normal((70, 32)).astype(np.float32)
    d = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    oracle = np.argsort(d, axis=-1, kind="stable")[:, :6]

    mesh = make_mesh(MeshConfig(data_axis=1, db_axis=n_global))
    idx, _ = sharded_topk_neighbors(q, db, 6, mesh)
    result["sharded_ok"] = bool(np.array_equal(np.asarray(idx), oracle))
    idx, _ = ring_topk_neighbors(q, db, 6, mesh)
    result["ring_ok"] = bool(np.array_equal(np.asarray(idx), oracle))

    # int8-quantized sharded retrieval over the same process boundaries:
    # each shard dequantizes only its own rows; exact vs an oracle computed
    # on the SAME dequantized values (so the check is deterministic).
    from epcnet_tpu.ops.retrieval import dequantize_descriptors, quantize_descriptors

    db_q, db_scale = quantize_descriptors(db)
    deq = np.asarray(dequantize_descriptors(db_q, db_scale))
    d_q = ((q[:, None, :] - deq[None, :, :]) ** 2).sum(-1)
    oracle_q = np.argsort(d_q, axis=-1, kind="stable")[:, :6]
    idx, _ = sharded_topk_neighbors(
        q, np.asarray(db_q), 6, mesh, db_scale=np.asarray(db_scale)
    )
    result["sharded_int8_ok"] = bool(np.array_equal(np.asarray(idx), oracle_q))

    # The full serving index over the SAME cross-process mesh: incremental
    # adds (sharded device buffer), int8 residency, exact query — the
    # pod-serving data path end-to-end (serve.PlaceIndex).
    from epcnet_tpu.serve import PlaceIndex

    pidx = PlaceIndex(None, None, None, descriptor_dim=32, embed_batch=4,
                      block_rows=16, mesh=mesh, quantize="int8")
    pidx.add_descriptors(db[:50])
    ids1, _ = pidx.query_descriptors(q, k=6)
    pidx.add_descriptors(db[50:])  # incremental append after first sync
    ids2, _ = pidx.query_descriptors(q, k=6)
    result["place_index_mp_ok"] = bool(
        np.array_equal(np.asarray(ids2), oracle_q)
        # dtype via the attribute: the sharded buffer spans non-addressable
        # devices, so np.asarray would (correctly) refuse to fetch it
        and str(pidx._dev_db.dtype) == "int8"
        and pidx.metrics()["sharded"]
    )

    # Points-sharded embed across the SAME process boundaries: ppermute ring
    # kNN + per-layer all_gather + psum-completed VLAD over Gloo, checked
    # against the local single-device dense path (non-divisible N exercises
    # the masked pad rows).
    import jax.numpy as jnp

    from epcnet_tpu.configs import ModelConfig
    from epcnet_tpu.models import EPCNet, embed_points_sharded

    cfg = ModelConfig(
        num_points=96, knn_k=8, use_pallas=False, compute_dtype="float32",
        proxyconv_channels=(8, 8), lift_channels=(16, 32), feature_dim=32,
        vlad_clusters=8, vlad_groups=4, vlad_group_dim=8,
    )
    pts = jnp.asarray(rng.uniform(-1, 1, (91, 3)).astype(np.float32))
    model = EPCNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), pts[None], train=False)
    ref = np.asarray(model.apply(variables, pts[None], train=False)[0])
    out = np.asarray(embed_points_sharded(variables, pts, cfg, mesh))
    result["points_sharded_ok"] = bool(np.allclose(out, ref, atol=2e-4))

    # ... and its TRAINING step: the cross-process points-sharded gradient
    # must equal the dense single-process one (divisible N for BN parity).
    from epcnet_tpu.losses import distillation_loss
    from epcnet_tpu.models import build_points_sharded_distill_fn

    pts96 = jnp.asarray(rng.uniform(-1, 1, (96, 3)).astype(np.float32))
    target = np.asarray(ref / np.linalg.norm(ref), np.float32)

    def dense_loss(p):
        desc, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            pts96[None], train=True, momentum=0.9, mutable=["batch_stats"],
        )
        return distillation_loss(desc[0], jnp.asarray(target))

    ref_g = jax.grad(dense_loss)(variables["params"])
    step = build_points_sharded_distill_fn(cfg, mesh)
    _, g, _ = step(
        variables["params"], variables["batch_stats"], pts96, target, momentum=0.9
    )
    result["points_sharded_grad_ok"] = all(
        np.allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(ref_g)
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("scenario", choices=["train", "retrieval"])
    ap.add_argument("--procid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--port", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--log_subdir", default="log")
    ap.add_argument("--max_epoch", type=int, default=2)
    ap.add_argument("--mining_start", type=int, default=99)
    ap.add_argument("--guard", action="store_true")
    ap.add_argument("--restore", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    # same env-driven wiring as the CLIs: a shared persistent compile cache
    # across the cluster's processes (no-op unless the parent test sets it)
    from epcnet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    jax.distributed.initialize(
        f"127.0.0.1:{args.port}",
        num_processes=args.nprocs,
        process_id=args.procid,
    )

    result = {
        "pid": args.procid,
        "process_count": jax.process_count(),
        "n_global_devices": len(jax.devices()),
        "n_local_devices": len(jax.local_devices()),
    }
    if args.scenario == "train":
        scenario_train(args, result)
    else:
        scenario_retrieval(args, result)

    out = os.path.join(args.workdir, f"result_{args.tag}_{args.procid}.json")
    with open(out + ".tmp", "w") as f:
        json.dump(result, f)
    os.replace(out + ".tmp", out)
    sys.exit(0)


if __name__ == "__main__":
    main()
