"""Evaluation CLI.

Reference equivalent: evaluate.py [LINEAGE; SURVEY.md §3.2] — restores a
checkpoint, embeds every region's database/query runs, and writes the
recall table to results.txt in the reference's format.

  python -m epcnet_tpu.cli.evaluate --dataset_root D --log_dir log
      [--regions oxford university ...] [--mesh] [--latency_probe]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from epcnet_tpu.configs import ExperimentConfig, apply_overrides
from epcnet_tpu.data.tuples import (
    any_in_test_regions,
    construct_query_and_database_sets,
    load_pickle,
    scan_runs,
)
from epcnet_tpu.evals import evaluate_dataset, retrieval_latency_probe, embed_entries
from epcnet_tpu.parallel import make_multislice_mesh, maybe_initialize_distributed
from epcnet_tpu.train import create_train_state, build_embed_fn
from epcnet_tpu.train.checkpoint import CheckpointManager
from epcnet_tpu.utils.logging import log_string
from epcnet_tpu.utils.compile_cache import add_cli_arg, enable_compilation_cache


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    ap.add_argument("--dataset_root", default=None)
    ap.add_argument("--log_dir", default="log")
    ap.add_argument("--regions", nargs="*", default=None,
                    help="region subdirs to evaluate; default: data.runs_subdir")
    ap.add_argument("--database_pickle", default=None)
    ap.add_argument("--query_pickle", default=None)
    ap.add_argument("--mesh", action="store_true", help="shard the DB over devices")
    ap.add_argument("--quantize", default="none", choices=("none", "int8"),
                    help="retrieve against the int8-quantized DB (the "
                    "serving capacity format) to quantify its recall cost")
    ap.add_argument("--latency_probe", action="store_true")
    ap.add_argument("--output", default=None, help="default <log_dir>/results.txt")
    add_cli_arg(ap)
    args = ap.parse_args(argv)
    enable_compilation_cache(args.compilation_cache_dir)
    if bool(args.database_pickle) != bool(args.query_pickle):
        ap.error("--database_pickle and --query_pickle must be given together")

    # MUST precede any JAX call (create_train_state below initializes the
    # XLA backend; jax.distributed.initialize refuses to run after that).
    maybe_initialize_distributed()

    cfg_path = args.config or os.path.join(args.log_dir, "config.json")
    cfg = (
        ExperimentConfig.from_json(open(cfg_path).read())
        if os.path.isfile(cfg_path)
        else ExperimentConfig()
    )
    if args.dataset_root:
        cfg = apply_overrides(cfg, [f"data.dataset_root={args.dataset_root}"])
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)

    state = create_train_state(cfg.model, cfg.train)
    mgr = CheckpointManager(f"{args.log_dir}/ckpt", cfg.train.keep_checkpoints)
    state = mgr.restore(state, require=True)
    log_string(f"restored checkpoint at step {int(state.step)}")
    embed = build_embed_fn(cfg.model)
    mesh = None
    if args.mesh:
        # evaluation uses the mesh for RETRIEVAL only: default one full
        # slice onto the "db" axis (the training config's db_axis=1 would
        # never take the sharded path — same trap cli/serve.py guards
        # against; ALL devices would crash multi-slice mesh construction)
        mcfg = cfg.mesh
        if mcfg.db_axis <= 1:
            import dataclasses as _dc

            from epcnet_tpu.parallel import retrieval_db_axis

            mcfg = _dc.replace(mcfg, data_axis=-1, db_axis=retrieval_db_axis())
        mesh = make_multislice_mesh(mcfg)

    regions = {}
    if args.database_pickle:
        regions["pickled"] = (load_pickle(args.database_pickle), load_pickle(args.query_pickle))
    else:
        for name in args.regions or [cfg.data.runs_subdir]:
            df = scan_runs(cfg.data.dataset_root, name)
            # Real-Oxford queries are restricted to the held-out rectangles
            # (detected by UTM intersection, not directory name); the
            # database always keeps full runs [LINEAGE: generate_test_sets.py].
            regions[name] = construct_query_and_database_sets(
                df, cfg.data.test_positive_radius_m,
                only_test_regions=any_in_test_regions(df),
            )

    results = evaluate_dataset(
        embed, state.params, state.batch_stats, regions, cfg.data, cfg.eval,
        mesh, quantize=args.quantize,
    )

    out_path = args.output or os.path.join(args.log_dir, "results.txt")
    with open(out_path, "w") as f:
        for name, m in results.items():
            f.write(f"== {name} ==\n")
            f.write("Average Recall @N:\n")
            f.write(str(np.round(100 * m["recall_at"], 2)) + "\n")
            f.write(f"Average Top 1% Recall: {100 * m['recall_at_1pct']:.2f}\n\n")
    # machine-readable twin next to the reference-style text table
    import json

    with open(os.path.splitext(out_path)[0] + ".json", "w") as f:
        json.dump(
            {
                name: {
                    "recall_at": [float(x) for x in m["recall_at"]],
                    "recall_at_1pct": float(m["recall_at_1pct"]),
                }
                for name, m in results.items()
            },
            f,
            indent=1,
        )
    avg = results["average"]
    log_string(
        f"avg recall@1={100 * avg['recall_at'][0]:.2f}% "
        f"@1%={100 * avg['recall_at_1pct']:.2f}% -> {out_path}"
    )

    if args.latency_probe:
        name = next(iter(regions))
        db_desc = embed_entries(
            embed, state.params, state.batch_stats, regions[name][0][0], cfg.data,
            cfg.eval.batch_size,
        )
        lat = retrieval_latency_probe(db_desc, cfg.eval.latency_probe_queries, cfg.eval.top_k, mesh)
        log_string(
            f"retrieval latency p50={lat['p50_ms']:.3f}ms "
            f"p99={lat['p99_ms']:.3f}ms "
            f"device={lat['device_ms']:.3f}ms (dispatch-free)"
        )


if __name__ == "__main__":
    main()
