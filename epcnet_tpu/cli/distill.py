"""EPC-Net-L distillation CLI [PAPER §III-D].

Trains the slim student against a frozen EPC-Net teacher checkpoint with
metric loss + feature-mimic MSE (train/step.py build_distill_step), driven
by the same Trainer as cli/train.py — so distillation gets the full
production feature set: exact --restore resume, SIGTERM preemption safety,
mesh DP, hard-negative mining, and JSONL/TensorBoard metrics.

  python -m epcnet_tpu.cli.distill --dataset_root D --teacher_log_dir log \
      [--alpha 1.0] [--log_dir log_student] [--restore] [--mesh] [--synthetic]
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax

from epcnet_tpu.configs import (
    ExperimentConfig,
    apply_overrides,
    epcnet_l_config,
)
from epcnet_tpu.data.tuples import construct_query_dict, scan_runs
from epcnet_tpu.parallel import (
    PreemptionGuard,
    make_multislice_mesh,
    maybe_initialize_distributed,
)
from epcnet_tpu.train import Trainer
from epcnet_tpu.train.checkpoint import CheckpointManager
from epcnet_tpu.train.state import create_train_state
from epcnet_tpu.train.step import build_distill_step
from epcnet_tpu.utils.logging import log_string
from epcnet_tpu.utils.compile_cache import add_cli_arg, enable_compilation_cache


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--teacher_log_dir", required=True)
    ap.add_argument("--log_dir", default="log_student")
    ap.add_argument("--alpha", type=float, default=1.0, help="mimic-loss weight")
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    ap.add_argument("--restore", action="store_true",
                    help="resume the student from latest checkpoint in log_dir")
    ap.add_argument(
        "--eval_every_epochs", type=int, default=0,
        help="evaluate student recall@1 every N epochs, retaining the best "
        "checkpoint in <log_dir>/ckpt_best; 0 = off",
    )
    ap.add_argument("--mesh", action="store_true",
                    help="shard over all available devices (DP)")
    ap.add_argument("--synthetic", action="store_true")
    add_cli_arg(ap)
    args = ap.parse_args(argv)
    enable_compilation_cache(args.compilation_cache_dir)

    maybe_initialize_distributed()  # multi-process pods; no-op single-process

    # Teacher config + weights from its run directory.
    tcfg_path = os.path.join(args.teacher_log_dir, "config.json")
    teacher_exp = (
        ExperimentConfig.from_json(open(tcfg_path).read())
        if os.path.isfile(tcfg_path)
        else ExperimentConfig()
    )
    teacher_cfg = teacher_exp.model
    student_cfg = epcnet_l_config(
        num_points=teacher_cfg.num_points,
        knn_k=teacher_cfg.knn_k,
        use_pallas=teacher_cfg.use_pallas,
        output_dim=teacher_cfg.output_dim,
    )
    # inherit the TEACHER's data plane (runs_subdir, radii, tuple shape,
    # augmentation) — only the root changes; a default DataConfig here would
    # silently mismatch the teacher's training distribution
    cfg = ExperimentConfig(
        model=student_cfg,
        data=dataclasses.replace(
            teacher_exp.data, dataset_root=args.dataset_root
        ),
        train=teacher_exp.train,
        log_dir=args.log_dir,
    )
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)
        student_cfg = cfg.model

    teacher_state = create_train_state(teacher_cfg, teacher_exp.train)
    tmgr = CheckpointManager(f"{args.teacher_log_dir}/ckpt")
    teacher_state = tmgr.restore(teacher_state, require=True)
    log_string(f"teacher restored at step {int(teacher_state.step)}")
    teacher_vars = {
        "params": teacher_state.params,
        "batch_stats": teacher_state.batch_stats,
    }

    if args.synthetic and not os.path.isdir(
        os.path.join(cfg.data.dataset_root, cfg.data.runs_subdir)
    ):
        from epcnet_tpu.data.synthetic import generate_synthetic_dataset

        generate_synthetic_dataset(
            cfg.data.dataset_root, num_points=cfg.data.num_points,
            runs_subdir=cfg.data.runs_subdir,
        )
    df = scan_runs(cfg.data.dataset_root, cfg.data.runs_subdir)
    tuples = construct_query_dict(
        df,
        cfg.data.positive_radius_m,
        cfg.data.negative_radius_m,
        exclude_test_regions=not args.synthetic,
    )

    mesh = make_multislice_mesh(cfg.mesh) if args.mesh else None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        teacher_vars = jax.device_put(teacher_vars, NamedSharding(mesh, P()))

    distill_step = build_distill_step(student_cfg, teacher_cfg, cfg.train, args.alpha)

    os.makedirs(cfg.log_dir, exist_ok=True)
    with open(os.path.join(cfg.log_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    trainer = Trainer(
        cfg, tuples, mesh=mesh, metrics_name="distill",
        step_fn=lambda state, batch: distill_step(state, teacher_vars, batch),
    )
    if args.restore:
        step = trainer.maybe_restore()
        log_string(f"student restored at step {step}")

    from epcnet_tpu.evals.hooks import make_recall_eval_hook

    on_epoch_end, finalize_eval = make_recall_eval_hook(
        cfg, mesh, args.eval_every_epochs, df=df, resumed=args.restore
    )
    with PreemptionGuard() as guard:
        trainer.train(on_epoch_end=on_epoch_end, should_stop=guard)
    finalize_eval()


if __name__ == "__main__":
    main()
