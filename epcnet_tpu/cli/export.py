"""Weight-export CLI: an epcnet-tpu checkpoint -> one portable .npz.

Reference equivalent: none — the reference family ships raw TF1 Saver
checkpoints only [LINEAGE; SURVEY.md §5.4]. This is the interop half the
switching story needs in BOTH directions: users leaving for (or comparing
against) another stack get a framework-neutral flat array file, and
``cli/convert.py`` re-imports the same file bit-for-bit, so
export -> convert round-trips to the exact descriptors (tested).

  python -m epcnet_tpu.cli.export --log_dir log [--output log/export]

Writes ``<output>.npz`` — flat ``params/<path>`` + ``batch_stats/<path>``
fp32 arrays in the model's forward-topological order (the same contract
``utils/importer.py``'s auto-matcher consumes) — and ``<output>.json``, a
manifest with the step, the full experiment config, and every leaf's
name/shape/dtype so a consumer can verify completeness without loading
arrays.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from epcnet_tpu.configs import ExperimentConfig, apply_overrides
from epcnet_tpu.train import create_train_state
from epcnet_tpu.train.checkpoint import CheckpointManager
from epcnet_tpu.utils.logging import log_string


def flatten_variables(params, batch_stats) -> dict:
    """{'params/<path>': np.ndarray, 'batch_stats/<path>': ...} in tree
    insertion order (= flax module construction order = forward topology)."""
    flat: dict = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict) or hasattr(v, "items"):
                walk(v, f"{prefix}/{k}")
            else:
                flat[f"{prefix}/{k}"] = np.asarray(v, np.float32)

    walk(params, "params")
    if batch_stats:
        walk(batch_stats, "batch_stats")
    return flat


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--log_dir", required=True, help="trained run directory")
    ap.add_argument("--config", default=None)
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    ap.add_argument("--output", default=None,
                    help="output basename (default <log_dir>/export)")
    args = ap.parse_args(argv)

    cfg_path = args.config or os.path.join(args.log_dir, "config.json")
    cfg = (
        ExperimentConfig.from_json(open(cfg_path).read())
        if os.path.isfile(cfg_path)
        else ExperimentConfig()
    )
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)

    state = create_train_state(cfg.model, cfg.train)
    mgr = CheckpointManager(f"{args.log_dir}/ckpt", cfg.train.keep_checkpoints)
    state = mgr.restore(state, require=True)

    flat = flatten_variables(state.params, state.batch_stats)
    out = args.output or os.path.join(args.log_dir, "export")
    np.savez(out + ".npz", **flat)
    manifest = {
        "framework": "epcnet_tpu",
        "step": int(state.step),
        "config": json.loads(cfg.to_json()),
        "leaves": [
            {"name": k, "shape": list(v.shape), "dtype": str(v.dtype)}
            for k, v in flat.items()
        ],
    }
    with open(out + ".json", "w") as f:
        json.dump(manifest, f, indent=1)
    nbytes = sum(v.nbytes for v in flat.values())
    log_string(
        f"exported {len(flat)} arrays ({nbytes / 1e6:.1f} MB fp32) at step "
        f"{int(state.step)} -> {out}.npz (+ .json manifest)"
    )


if __name__ == "__main__":
    main()
