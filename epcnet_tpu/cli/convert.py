"""Checkpoint-import CLI: external weights -> a ready-to-use run directory.

Reference equivalent: none — porting the reference's TF1 checkpoints was a
by-hand affair [LINEAGE; SURVEY.md §5.4]. This is the porting-day front
door over ``utils/importer.py``: point it at a reference state dict and get
a ``--log_dir`` that ``evaluate`` / ``serve`` / ``embed`` / ``train
--restore`` consume directly (config.json + an orbax checkpoint at step 0).

  python -m epcnet_tpu.cli.convert --source weights.npz --log_dir out \
      [--name_map tf1_epcnet|tf1_pointnetvlad|auto|self] \
      [--source_format tf|torch] [--config cfg.json | --set model.x=y ...]

Source formats (by extension):
  - ``.npz``           numpy archive of name -> array
  - ``.pt/.pth/.bin``  torch.load (cpu); a dict or an object with
                       ``state_dict()``; a wrapping {"state_dict": ...} is
                       unwrapped
  - ``.pkl/.pickle``   pickled name -> array dict

Matching strategies (``--name_map``):
  - ``self`` (default when keys look like ``params/...``): the exact
    layout ``cli/export.py`` writes — a lossless re-import.
  - ``tf1_pointnetvlad`` / ``tf1_epcnet``: regex NAME_MAPS for the
    reference families (utils/importer.py).
  - ``auto``: shape-graph auto-matcher — for UNLABELED/renamed dicts in
    graph order (VERDICT r2 #4). Fails loudly on any unmatched leaf.

Always verify a fresh import with golden descriptors (cli/embed.py on a
few known submaps) before trusting recall numbers.
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from epcnet_tpu.configs import ExperimentConfig, apply_overrides
from epcnet_tpu.train import create_train_state
from epcnet_tpu.train.checkpoint import CheckpointManager
from epcnet_tpu.utils.importer import (
    NAME_MAPS,
    automatch_state_dict,
    import_state_dict,
    merge_into_variables,
)
from epcnet_tpu.utils.logging import log_string


def load_source(path: str) -> dict:
    """One file -> flat {name: np.ndarray} state dict."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npz":
        with np.load(path, allow_pickle=False) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    if ext in (".pt", ".pth", ".bin"):
        import torch

        try:
            # plain tensor dicts load under the safe pickle mode — prefer it
            # (external checkpoints are untrusted input; weights_only=False
            # means arbitrary pickle code execution)
            obj = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            import warnings

            warnings.warn(
                f"{path}: not loadable with weights_only=True; falling back "
                "to full unpickling — only do this for checkpoints you trust"
            )
            obj = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        if isinstance(obj, dict) and "state_dict" in obj and isinstance(
            obj["state_dict"], dict
        ):
            obj = obj["state_dict"]
        return {
            k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
            for k, v in obj.items()
        }
    if ext in (".pkl", ".pickle"):
        with open(path, "rb") as f:
            obj = pickle.load(f)
        return {k: np.asarray(v) for k, v in obj.items()}
    raise ValueError(f"unrecognized source extension {ext!r} ({path})")


def _unflatten_self(sd: dict) -> tuple[dict, dict]:
    """Inverse of cli/export.py flatten_variables."""
    params: dict = {}
    stats: dict = {}
    for key, arr in sd.items():
        parts = key.split("/")
        tree = {"params": params, "batch_stats": stats}.get(parts[0])
        if tree is None:
            raise KeyError(
                f"source key {key!r} is not params/... or batch_stats/... — "
                "not a cli/export.py archive (pick an explicit --name_map)"
            )
        node = tree
        for p in parts[1:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(arr)
    return params, stats


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="weights file (see module doc)")
    ap.add_argument("--log_dir", required=True, help="output run directory")
    ap.add_argument("--config", default=None,
                    help="experiment config JSON for the target model")
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    ap.add_argument("--name_map", default=None,
                    choices=sorted(NAME_MAPS) + ["auto", "self"],
                    help="matching strategy (default: self-layout if keys "
                    "look like params/..., else auto)")
    ap.add_argument("--source_format", default="tf", choices=("tf", "torch"),
                    help="source layout for kernel/centroid conversions "
                    "(auto-set to torch for .pt/.pth)")
    args = ap.parse_args(argv)

    cfg = (
        ExperimentConfig.from_json(open(args.config).read())
        if args.config
        else ExperimentConfig()
    )
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)

    sd = load_source(args.source)
    log_string(f"loaded {len(sd)} source arrays from {args.source}")

    source = args.source_format
    if os.path.splitext(args.source)[1].lower() in (".pt", ".pth", ".bin") and (
        args.source_format == "tf"
    ):
        # torch archives default to torch layout conversions (Linear
        # transpose etc.) — silently keeping "tf" would shape-match square
        # kernels untransposed and import wrong weights
        source = "torch"

    strategy = args.name_map
    if strategy is None:
        selfish = all(
            k.startswith(("params/", "batch_stats/")) for k in sd
        )
        strategy = "self" if selfish else "auto"
        log_string(f"auto-selected --name_map {strategy}")

    state = create_train_state(cfg.model, cfg.train)
    if strategy == "self":
        params, stats = _unflatten_self(sd)
        # completeness: every model leaf must be present — a truncated or
        # empty archive must fail loudly, not convert to part-random weights
        from epcnet_tpu.cli.export import flatten_variables

        want = set(flatten_variables(state.params, state.batch_stats))
        missing = sorted(want - set(sd))
        if missing:
            raise ValueError(
                f"self-layout import is missing {len(missing)} of "
                f"{len(want)} model leaves (truncated archive?): "
                f"{missing[:5]}..."
            )
    elif strategy == "auto":
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        params, stats = automatch_state_dict(sd, variables, source=source)
    else:
        params, stats = import_state_dict(sd, NAME_MAPS[strategy], source=source)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    merged = merge_into_variables(variables, params, stats)
    state = state.replace(
        params=merged["params"], batch_stats=merged["batch_stats"]
    )

    os.makedirs(args.log_dir, exist_ok=True)
    with open(os.path.join(args.log_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    mgr = CheckpointManager(f"{args.log_dir}/ckpt", cfg.train.keep_checkpoints)
    mgr.save(state)
    mgr.wait()
    log_string(
        f"imported via {strategy!r} -> {args.log_dir} (step-0 checkpoint; "
        "evaluate/serve/embed/train --restore can use it now)"
    )


if __name__ == "__main__":
    main()
