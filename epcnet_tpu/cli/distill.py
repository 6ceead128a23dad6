"""EPC-Net-L distillation CLI [PAPER §III-D].

Trains the slim student against a frozen EPC-Net teacher checkpoint with
metric loss + feature-mimic MSE (train/step.py build_distill_step).

  python -m epcnet_tpu.cli.distill --dataset_root D --teacher_log_dir log \
      [--alpha 1.0] [--log_dir log_student] [--synthetic]
"""

from __future__ import annotations

import argparse
import os
import time

import jax.numpy as jnp

from epcnet_tpu.configs import (
    DataConfig,
    ExperimentConfig,
    apply_overrides,
    epcnet_l_config,
)
from epcnet_tpu.data.loader import TupleLoader
from epcnet_tpu.data.tuples import construct_query_dict, scan_runs
from epcnet_tpu.train.checkpoint import CheckpointManager
from epcnet_tpu.train.state import create_train_state
from epcnet_tpu.train.step import build_distill_step
from epcnet_tpu.utils.logging import MetricsLogger, log_string


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--teacher_log_dir", required=True)
    ap.add_argument("--log_dir", default="log_student")
    ap.add_argument("--alpha", type=float, default=1.0, help="mimic-loss weight")
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args(argv)

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
    cfg = ExperimentConfig(
        model=student_cfg,
        data=DataConfig(
            dataset_root=args.dataset_root, num_points=teacher_cfg.num_points
        ),
        train=teacher_exp.train,
        log_dir=args.log_dir,
    )
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)
        student_cfg = cfg.model

    teacher_state = create_train_state(teacher_cfg, teacher_exp.train)
    tmgr = CheckpointManager(f"{args.teacher_log_dir}/ckpt")
    teacher_state = tmgr.restore(teacher_state)
    log_string(f"teacher restored at step {int(teacher_state.step)}")
    teacher_vars = {
        "params": teacher_state.params,
        "batch_stats": teacher_state.batch_stats,
    }

    df = scan_runs(cfg.data.dataset_root, cfg.data.runs_subdir)
    tuples = construct_query_dict(
        df,
        cfg.data.positive_radius_m,
        cfg.data.negative_radius_m,
        exclude_test_regions=not args.synthetic,
    )
    loader = TupleLoader(tuples, cfg.data, cfg.train.batch_num_queries, cfg.train.seed)

    state = create_train_state(student_cfg, cfg.train)
    step_fn = build_distill_step(student_cfg, teacher_cfg, cfg.train, args.alpha)
    metrics = MetricsLogger(cfg.log_dir, "distill",
                            tensorboard=cfg.train.tensorboard)
    mgr = CheckpointManager(f"{cfg.log_dir}/ckpt", cfg.train.keep_checkpoints)
    os.makedirs(cfg.log_dir, exist_ok=True)
    with open(os.path.join(cfg.log_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    for epoch in range(cfg.train.max_epoch):
        t0 = time.time()
        n_steps = 0
        m = {k: float("nan") for k in ("loss", "metric_loss", "mimic_loss")}
        for batch in loader.epoch(epoch):
            n_steps += 1
            dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "ids"}
            state, m = step_fn(state, teacher_vars, dev)
            if int(state.step) % cfg.train.log_every_steps == 0:
                metrics.write(int(state.step), m, epoch=epoch)
        if n_steps == 0:
            log_string(
                f"epoch {epoch}: 0 usable tuples (check data.num_positives "
                f"vs the dataset's positive counts)"
            )
        mgr.save(state)
        log_string(
            f"epoch {epoch}: loss={float(m['loss']):.4f} "
            f"(metric {float(m['metric_loss']):.4f} mimic {float(m['mimic_loss']):.4f}) "
            f"{time.time() - t0:.1f}s"
        )
    mgr.wait()


if __name__ == "__main__":
    main()
