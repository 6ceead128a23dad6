"""Descriptor-extraction CLI: point-cloud files in, global descriptors out.

Reference equivalent: none as a standalone tool — the reference only embeds
inside evaluate.py's recall loop [LINEAGE; SURVEY.md §3.2]. Production use
of a place-recognition model is exactly this step (embed a submap, query an
index), so it gets a first-class driver here; cli/serve.py is the online
twin of this offline tool.

  python -m epcnet_tpu.cli.embed --log_dir log --output descs.npy \
      cloud0.bin cloud1.npy ...
      [--points_sharded] [--batch_size 32] [--dataset_root R]

Input formats (auto-detected per file):
  - ``.bin``: raw float64 xyz, the reference's submap format
    [LINEAGE: loading_pointclouds.py]; N inferred from the file size.
  - ``.npy``: float array of shape [N, 3].

Two embedding paths:
  - default: the standard batched forward (all clouds must have exactly
    ``model.num_points`` points — the reference's fixed-size contract);
  - ``--points_sharded``: each cloud's POINT axis is sharded over every
    device (models/points_sharded.py) — no size cap, sizes may vary
    (bucketed padding keeps recompiles to one per size bucket).

Output: ``<output>.npy`` [num_clouds, output_dim] fp32 L2-normalized rows
(input order) + ``<output>.json`` manifest mapping row -> source file.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from epcnet_tpu.configs import ExperimentConfig, apply_overrides
from epcnet_tpu.train import create_train_state, build_embed_fn
from epcnet_tpu.train.checkpoint import CheckpointManager
from epcnet_tpu.utils.logging import log_string
from epcnet_tpu.utils.compile_cache import add_cli_arg, enable_compilation_cache


def load_cloud(path: str, dataset_root: str = "") -> np.ndarray:
    """One cloud file -> [N, 3] float32. N is inferred, not assumed."""
    if path.endswith(".npy"):
        full = os.path.join(dataset_root, path) if dataset_root else path
        pc = np.load(full)
        if pc.ndim != 2 or pc.shape[1] != 3:
            raise ValueError(f"{full}: expected [N, 3] array, got {pc.shape}")
        return np.asarray(pc, np.float32)
    from epcnet_tpu.data.pointclouds import load_pc_file

    return load_pc_file(path, dataset_root, num_points=None)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+", help=".bin (fp64 xyz) or .npy [N,3] files")
    ap.add_argument("--config", default=None)
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    ap.add_argument("--dataset_root", default="")
    ap.add_argument("--log_dir", default="log")
    ap.add_argument("--output", default="descriptors.npy")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument(
        "--points_sharded", action="store_true",
        help="shard each cloud's point axis over all devices "
             "(no num_points cap; sizes may vary)",
    )
    ap.add_argument(
        "--pad_multiple", type=int, default=512,
        help="points-sharded: bucket padded sizes to multiples of this "
             "(per device) so XLA compiles once per bucket",
    )
    add_cli_arg(ap)
    args = ap.parse_args(argv)
    enable_compilation_cache(args.compilation_cache_dir)

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
    log_string(f"restored checkpoint at step {int(state.step)}")

    clouds = [load_cloud(p, args.dataset_root) for p in args.inputs]

    if args.points_sharded:
        descs = _embed_points_sharded(state, clouds, cfg, args.pad_multiple)
    else:
        descs = _embed_batched(state, clouds, cfg, args.batch_size)

    out = np.stack(descs, axis=0)
    np.save(args.output, out)
    base = args.output[:-4] if args.output.endswith(".npy") else args.output
    with open(base + ".json", "w") as f:
        json.dump({"files": list(args.inputs), "shape": list(out.shape)}, f, indent=1)
    log_string(f"embedded {out.shape[0]} clouds -> {args.output} {out.shape}")


def _embed_batched(state, clouds, cfg, batch_size):
    """Reference-contract path: every cloud is exactly model.num_points."""
    npts = cfg.model.num_points
    for i, c in enumerate(clouds):
        if c.shape[0] != npts:
            raise ValueError(
                f"input {i} has {c.shape[0]} points but model.num_points={npts}; "
                f"use --points_sharded for arbitrary sizes"
            )
    import jax.numpy as jnp

    embed = build_embed_fn(cfg.model)
    descs = []
    buf = np.zeros((batch_size, npts, 3), np.float32)
    for s in range(0, len(clouds), batch_size):
        cnt = min(s + batch_size, len(clouds)) - s
        buf[:cnt] = np.stack(clouds[s:s + cnt])
        if cnt < batch_size:
            buf[cnt:] = 0.0  # fixed batch shape: one compile total
        d = np.asarray(embed(state.params, state.batch_stats, jnp.asarray(buf)))
        descs.extend(d[:cnt])
    return descs


def _embed_points_sharded(state, clouds, cfg, pad_multiple):
    """Capacity path: per-cloud point-axis sharding over every device."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from epcnet_tpu.models import embed_points_sharded

    mesh = Mesh(np.asarray(jax.devices()), ("db",))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return [
        np.asarray(
            embed_points_sharded(
                variables, jnp.asarray(c), cfg.model, mesh,
                npad_multiple=pad_multiple,
            )
        )
        for c in clouds
    ]


if __name__ == "__main__":
    main()
