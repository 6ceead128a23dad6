"""Training CLI.

Reference equivalent: train.py's argparse driver [LINEAGE; SURVEY.md §3.1].

  python -m epcnet_tpu.cli.train --dataset_root D [--config cfg.json]
      [--set train.learning_rate=1e-4 --set model.knn_k=20 ...]
      [--synthetic]  # generate fixtures first (demo/CI)
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax

from epcnet_tpu.configs import ExperimentConfig, apply_overrides
from epcnet_tpu.data.synthetic import generate_synthetic_dataset
from epcnet_tpu.data.tuples import TrainingTuples, construct_query_dict, load_pickle, scan_runs
from epcnet_tpu.parallel import (
    PreemptionGuard,
    make_multislice_mesh,
    maybe_initialize_distributed,
)
from epcnet_tpu.train import Trainer
from epcnet_tpu.utils.logging import log_string
from epcnet_tpu.utils.profiling import maybe_start_trace
from epcnet_tpu.utils.compile_cache import add_cli_arg, enable_compilation_cache


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="ExperimentConfig JSON file")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    help="config override section.field=value (repeatable)")
    ap.add_argument("--dataset_root", default=None)
    ap.add_argument("--tuples_pickle", default=None,
                    help="pre-generated training pickle; else tuples are built")
    ap.add_argument("--log_dir", default=None)
    ap.add_argument("--restore", action="store_true",
                    help="resume from latest checkpoint in log_dir")
    ap.add_argument("--mesh", action="store_true",
                    help="shard over all available devices (DP)")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--profile_dir", default=None)
    ap.add_argument(
        "--eval_every_epochs", type=int, default=0,
        help="evaluate recall@1 on the dataset's test sets every N epochs and "
        "retain the BEST checkpoint in <log_dir>/ckpt_best (SURVEY.md §5.3 "
        "best-recall retention); 0 = off",
    )
    add_cli_arg(ap)
    args = ap.parse_args(argv)
    enable_compilation_cache(args.compilation_cache_dir)

    # Multi-process (multi-host/slice) bootstrap; no-op single-process.
    # Configured via EPCNET_COORDINATOR_ADDRESS / _NUM_PROCESSES / _PROCESS_ID.
    if maybe_initialize_distributed():
        log_string(
            f"jax.distributed up: process {jax.process_index()}"
            f"/{jax.process_count()}"
        )

    cfg = (
        ExperimentConfig.from_json(open(args.config).read())
        if args.config
        else ExperimentConfig()
    )
    if args.dataset_root:
        cfg = apply_overrides(cfg, [f"data.dataset_root={args.dataset_root}"])
    if args.log_dir:
        cfg = dataclasses.replace(cfg, log_dir=args.log_dir)
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)

    if args.synthetic:
        generate_synthetic_dataset(
            cfg.data.dataset_root, num_points=cfg.data.num_points,
            runs_subdir=cfg.data.runs_subdir,
        )

    df = None
    if args.tuples_pickle:
        tuples = TrainingTuples(load_pickle(args.tuples_pickle))
    else:
        df = scan_runs(cfg.data.dataset_root, cfg.data.runs_subdir)
        tuples = construct_query_dict(
            df, cfg.data.positive_radius_m, cfg.data.negative_radius_m,
            exclude_test_regions=not args.synthetic,
        )
    log_string(f"{len(tuples.queries)} training tuples; devices: {jax.devices()}")

    # slice-aware mesh: identical to make_mesh on one slice, slice-major
    # data axis (hierarchical ICI+DCN collectives) on multi-slice pods
    mesh = make_multislice_mesh(cfg.mesh) if args.mesh else None
    os.makedirs(cfg.log_dir, exist_ok=True)
    with open(os.path.join(cfg.log_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    trainer = Trainer(cfg, tuples, mesh=mesh)
    if args.restore:
        step = trainer.maybe_restore()
        log_string(f"restored at step {step}")

    from epcnet_tpu.evals.hooks import make_recall_eval_hook

    on_epoch_end, finalize_eval = make_recall_eval_hook(
        cfg, mesh, args.eval_every_epochs, df=df, resumed=args.restore
    )

    with maybe_start_trace(args.profile_dir), PreemptionGuard() as guard:
        trainer.train(on_epoch_end=on_epoch_end, should_stop=guard)
    finalize_eval()


if __name__ == "__main__":
    main()
