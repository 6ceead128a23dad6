"""One-way weight importer: reference checkpoints -> epcnet_tpu pytrees
(SURVEY.md §5.4) for golden-descriptor parity testing.

The reference family stores weights either as TF1 ``tf.train.Saver``
checkpoints [LINEAGE] or as PyTorch state_dicts (re-implementations). This
module maps both onto our flax param/batch_stats trees:

  - per-point "conv2d with 1x1 kernel" variables  -> Dense kernel/bias
    (TF kernels [1, 1, Cin, Cout] / torch [Cout, Cin, 1, 1] -> [Cin, Cout])
  - batch-norm gamma/beta/moving_mean/moving_variance -> DynamicBatchNorm
    scale/bias + batch_stats mean/var
  - NetVLAD cluster weights/centroids -> GVLADHead assign kernel + centroids

Name mapping is data-driven (a dict of regex -> target path) so a populated
reference later only needs a new NAME_MAPS entry, not new code.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        return v.detach().cpu().numpy()
    return np.asarray(v)


def convert_dense(weight: np.ndarray, source: str) -> np.ndarray:
    """Any conv1x1/dense weight layout -> flax Dense [Cin, Cout]."""
    w = np.asarray(weight)
    if source == "torch":
        # torch Linear [Cout, Cin]; Conv2d 1x1 [Cout, Cin, 1, 1]
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        return w.T
    # TF conv2d [1, 1, Cin, Cout]; dense [Cin, Cout]
    if w.ndim == 4:
        w = w[0, 0]
    return w


def import_state_dict(
    state_dict: Mapping[str, Any],
    name_map: Mapping[str, str],
    source: str = "torch",
) -> tuple[dict, dict]:
    """Map a flat reference state dict onto (params, batch_stats) trees.

    name_map: {regex -> "/"-joined target path with capture-group refs},
    e.g. {r"proxy_convs\\.(\\d+)\\.weight": r"proxyconv_\\1/dense/kernel"}.
    Target leaf names: kernel|bias|scale|mean|var|centroids|group_w|group_b.
    Unmatched source keys are returned untouched in the skipped list
    (inspect it — silence hides porting gaps).
    """
    params: dict = {}
    stats: dict = {}
    skipped = []
    for key, val in state_dict.items():
        target = None
        for pat, tmpl in name_map.items():
            m = re.fullmatch(pat, key)
            if m:
                target = m.expand(tmpl)
                break
        if target is None:
            skipped.append(key)
            continue
        arr = _to_numpy(val)
        parts = target.split("/")
        leaf = parts[-1]
        if leaf == "kernel":
            arr = convert_dense(arr, source)
        tree = stats if leaf in ("mean", "var") else params
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[leaf] = arr
    if skipped:
        import warnings

        warnings.warn(f"importer skipped {len(skipped)} keys: {skipped[:5]}...")
    return params, stats


def merge_into_variables(variables: dict, params: dict, stats: dict) -> dict:
    """Overlay imported leaves onto an initialized variables tree, verifying
    shapes. Raises on any shape mismatch (the parity contract's first line
    of defense)."""

    def overlay(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"imported key {path}/{k} absent from model tree")
            if isinstance(v, dict):
                out[k] = overlay(dst[k], v, f"{path}/{k}")
            else:
                have = np.asarray(dst[k])
                if have.shape != np.asarray(v).shape:
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: model {have.shape} "
                        f"vs import {np.asarray(v).shape}"
                    )
                out[k] = np.asarray(v).astype(have.dtype)
        return out

    new = dict(variables)
    new["params"] = overlay(variables["params"], params)
    if stats:
        new["batch_stats"] = overlay(variables.get("batch_stats", {}), stats)
    return new
