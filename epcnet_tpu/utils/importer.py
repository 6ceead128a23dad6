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


# ----------------------------------------------------------------------------
# Concrete name maps, pre-wired from the PUBLIC code lineage.
#
# UNVERIFIED: the reference mount is empty (SURVEY.md §0), so these variable
# names come from training-data knowledge of the public TF1 PointNetVLAD
# repo (mikacuy/pointnetvlad) that fpthink/EPC-Net forks [LINEAGE]. When the
# real checkpoint is available, diff its variable list against this map and
# adjust — the machinery (regex -> path templates, layout conversion,
# shape-verified overlay) is already exercised end-to-end by
# tests/test_importer.py::test_tf1_pointnetvlad_name_map.
# ----------------------------------------------------------------------------

def _tnet_map(scope: str, target: str, transform_var: str) -> dict:
    m = {}
    for i in (1, 2, 3):  # tconv1..3 -> mlp dense_0..2
        m[rf"{scope}/tconv{i}/weights"] = f"{target}/mlp/dense_{i-1}/kernel"
        m[rf"{scope}/tconv{i}/biases"] = f"{target}/mlp/dense_{i-1}/bias"
        m[rf"{scope}/tconv{i}/bn/gamma"] = f"{target}/mlp/bn_{i-1}/scale"
        m[rf"{scope}/tconv{i}/bn/beta"] = f"{target}/mlp/bn_{i-1}/bias"
        m[rf"{scope}/tconv{i}/bn/moving_mean"] = f"{target}/mlp/bn_{i-1}/mean"
        m[rf"{scope}/tconv{i}/bn/moving_variance"] = f"{target}/mlp/bn_{i-1}/var"
    for i in (1, 2):  # tfc1..2 -> fc dense_0..1
        m[rf"{scope}/tfc{i}/weights"] = f"{target}/fc/dense_{i-1}/kernel"
        m[rf"{scope}/tfc{i}/biases"] = f"{target}/fc/dense_{i-1}/bias"
        m[rf"{scope}/tfc{i}/bn/gamma"] = f"{target}/fc/bn_{i-1}/scale"
        m[rf"{scope}/tfc{i}/bn/beta"] = f"{target}/fc/bn_{i-1}/bias"
        m[rf"{scope}/tfc{i}/bn/moving_mean"] = f"{target}/fc/bn_{i-1}/mean"
        m[rf"{scope}/tfc{i}/bn/moving_variance"] = f"{target}/fc/bn_{i-1}/var"
    m[rf"{scope}/{transform_var}/weights"] = f"{target}/transform_w"
    m[rf"{scope}/{transform_var}/biases"] = f"{target}/transform_b"
    return m


def _conv_bn_map(src: str, dst: str) -> dict:
    return {
        rf"{src}/weights": f"{dst}/kernel",
        rf"{src}/biases": f"{dst}/bias",
    }


def _tf1_pointnetvlad_map() -> dict:
    m = {}
    m.update(_tnet_map("transform_net1", "input_tnet", "transform_XYZ"))
    m.update(_tnet_map("transform_net2", "feature_tnet", "transform_feat"))
    # conv1..2 (pre feature-transform) -> mlp1; conv3..5 -> mlp2
    for i, (blk, j) in enumerate(
        [("mlp1", 0), ("mlp1", 1), ("mlp2", 0), ("mlp2", 1), ("mlp2", 2)], start=1
    ):
        m.update(_conv_bn_map(f"conv{i}", f"{blk}/dense_{j}"))
        m[rf"conv{i}/bn/gamma"] = f"{blk}/bn_{j}/scale"
        m[rf"conv{i}/bn/beta"] = f"{blk}/bn_{j}/bias"
        m[rf"conv{i}/bn/moving_mean"] = f"{blk}/bn_{j}/mean"
        m[rf"conv{i}/bn/moving_variance"] = f"{blk}/bn_{j}/var"
    # NetVLAD head (PointNetVLAD's VLAD + context gating variables)
    m[r"(?:vlad/)?cluster_weights"] = "netvlad/assign/kernel"
    m[r"(?:vlad/)?cluster_biases"] = "netvlad/assign/bias"
    m[r"(?:vlad/)?cluster_weights2"] = "netvlad/centroids"
    m[r"(?:vlad/)?hidden1_weights"] = "netvlad/group_w"
    m[r"(?:vlad/)?hidden1_biases"] = "netvlad/group_b"
    m[r"(?:vlad/)?gating_weights"] = "netvlad/gate/kernel"
    m[r"(?:vlad/)?gating_biases"] = "netvlad/gate/bias"
    return m


def _tf1_epcnet_map() -> dict:
    """Best-guess TF1 EPC-Net variable names -> our EPCNet tree.

    UNVERIFIED (empty reference mount, SURVEY.md §0): scope names are the
    lineage-plausible candidates for a PointNetVLAD-fork ProxyConv stack —
    regex alternation accepts the likely spellings (pconv{i} / proxyconv{i}
    / epc_conv{i}; lift convs conv5/conv6 or agg1/agg2). If none match a
    populated reference, fall back to :func:`automatch_state_dict`, which
    needs no names at all.
    """
    m = {}
    for i in (1, 2, 3, 4):  # ProxyConv stack (paper: 4 layers)
        src = rf"(?:pconv|proxyconv|proxy_conv|epc_conv){i}"
        dst = f"proxyconv_{i - 1}"
        m[rf"{src}/weights"] = f"{dst}/dense/kernel"
        m[rf"{src}/biases"] = f"{dst}/dense/bias"
        m[rf"{src}/bn/gamma"] = f"{dst}/bn/scale"
        m[rf"{src}/bn/beta"] = f"{dst}/bn/bias"
        m[rf"{src}/bn/moving_mean"] = f"{dst}/bn/mean"
        m[rf"{src}/bn/moving_variance"] = f"{dst}/bn/var"
    for j, i in enumerate((5, 6)):  # per-point lift of the multi-scale concat
        src = rf"(?:conv{i}|agg{j + 1}|lift{j + 1})"
        m[rf"{src}/weights"] = f"lift/dense_{j}/kernel"
        m[rf"{src}/biases"] = f"lift/dense_{j}/bias"
        m[rf"{src}/bn/gamma"] = f"lift/bn_{j}/scale"
        m[rf"{src}/bn/beta"] = f"lift/bn_{j}/bias"
        m[rf"{src}/bn/moving_mean"] = f"lift/bn_{j}/mean"
        m[rf"{src}/bn/moving_variance"] = f"lift/bn_{j}/var"
    # G-VLAD head: NetVLAD heritage names + grouped/out FC + gating
    m[r"(?:g?vlad/)?cluster_weights"] = "gvlad/assign/kernel"
    m[r"(?:g?vlad/)?cluster_biases"] = "gvlad/assign/bias"
    m[r"(?:g?vlad/)?cluster_weights2"] = "gvlad/centroids"
    m[r"(?:g?vlad/)?(?:hidden1|group)_weights"] = "gvlad/group_w"
    m[r"(?:g?vlad/)?(?:hidden1|group)_biases"] = "gvlad/group_b"
    m[r"(?:g?vlad/)?(?:hidden2|out)_weights"] = "gvlad/out_fc/kernel"
    m[r"(?:g?vlad/)?(?:hidden2|out)_biases"] = "gvlad/out_fc/bias"
    m[r"(?:g?vlad/)?gating_weights"] = "gvlad/gate/kernel"
    m[r"(?:g?vlad/)?gating_biases"] = "gvlad/gate/bias"
    return m


NAME_MAPS: dict[str, dict] = {
    # TF1 tf.train.Saver variable names of the PointNetVLAD family
    # [LINEAGE, UNVERIFIED — see module docstring]. Use with source="tf".
    "tf1_pointnetvlad": _tf1_pointnetvlad_map(),
    # Best-guess EPC-Net flagship map [LINEAGE, UNVERIFIED] — porting day
    # starts here instead of hand-writing regexes (VERDICT r2 #4).
    "tf1_epcnet": _tf1_epcnet_map(),
}


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
        elif leaf == "centroids":
            # TF stores cluster centres [1, D, K] (or [D, K]); ours is [K, D]
            if source == "tf":
                if arr.ndim == 3:
                    arr = arr[0]
                arr = arr.T
        elif leaf == "group_w":
            if source == "torch" and arr.ndim == 2:
                arr = arr.T  # torch Linear [out, in] -> [in, out]
            if arr.ndim == 2:  # single dense FC -> grouped-FC with G=1
                arr = arr[None]
        elif leaf == "group_b" and arr.ndim == 1:
            arr = arr[None]
        tree = stats if leaf in ("mean", "var") else params
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[leaf] = arr
    if skipped:
        import warnings

        warnings.warn(f"importer skipped {len(skipped)} keys: {skipped[:5]}...")
    return params, stats


# ----------------------------------------------------------------------------
# Shape-graph auto-matcher: import an UNLABELED state dict (VERDICT r2 #4).
# ----------------------------------------------------------------------------


def model_leaf_order(variables: Mapping[str, Any]) -> list[tuple[str, str, tuple]]:
    """Canonical topological leaf order of a flax variables tree.

    Walks ``params`` in its insertion order — flax preserves module
    construction order, which IS the forward topology — and interleaves each
    module's ``batch_stats`` (mean, var) directly after that module's
    params, reproducing the per-layer (kernel, bias, scale, bias, mean, var)
    grouping that both TF1 Saver variable lists and torch state_dicts emit.

    Returns [(tree, "/"-path, shape)] with tree in {"params", "stats"}.
    """
    stats_tree = variables.get("batch_stats", {})
    order: list[tuple[str, str, tuple]] = []

    def stats_at(path_parts):
        node = stats_tree
        for p in path_parts:
            if not isinstance(node, Mapping) or p not in node:
                return None
            node = node[p]
        return node

    def walk(node, parts):
        emitted_leaf = False
        for k, v in node.items():
            if isinstance(v, Mapping):
                walk(v, parts + [k])
            else:
                order.append(("params", "/".join(parts + [k]), np.shape(v)))
                emitted_leaf = True
        if emitted_leaf:
            s = stats_at(parts)
            if isinstance(s, Mapping):
                for k, v in s.items():
                    if not isinstance(v, Mapping):
                        order.append(
                            ("stats", "/".join(parts + [k]), np.shape(v))
                        )

    walk(variables["params"], [])
    return order


def _conversion_candidates(arr: np.ndarray, source: str):
    """(converted_array, compatible_leaf_kinds) candidates for one source
    var, most-specific first. ``None`` leaf kinds = any leaf."""
    out = []
    if arr.ndim == 2 and source == "torch":
        # torch Linear stores [out, in]; the transpose must be tried BEFORE
        # the identity candidate or a SQUARE kernel (e.g. the output_dim x
        # output_dim gating layer) shape-matches untransposed and imports
        # silently wrong
        out.append((arr.T, ("kernel",)))
    out.append((arr, None))
    if arr.ndim == 4:  # conv 1x1 kernels
        out.append((convert_dense(arr, source), ("kernel",)))
    if arr.ndim == 3 and source == "tf":
        # TF NetVLAD centroids [1, D, K] -> [K, D]
        out.append((arr[0].T, ("centroids",)))
    if arr.ndim == 2:
        if source != "torch":
            out.append((arr.T, ("centroids",)))  # TF centroids [D, K]
        out.append((arr[None], ("group_w",)))  # dense FC -> G=1 grouped
    if arr.ndim == 1:
        out.append((arr[None], ("group_b",)))
    return out


def automatch_state_dict(
    state_dict: Mapping[str, Any],
    variables: Mapping[str, Any],
    source: str = "tf",
) -> tuple[dict, dict]:
    """Match an UNLABELED reference state dict onto the model tree by shape
    + topological order — the porting-day fallback when variable names are
    unknown or NAME_MAPS misses (SURVEY.md §5.4; VERDICT r2 #4).

    Contract: ``state_dict`` must enumerate variables in graph-construction
    order with the usual per-layer grouping (kernel, bias, gamma, beta,
    moving_mean, moving_variance) — TF1 ``Saver`` var lists and torch
    ``state_dict()`` both do. Each source var is assigned to the FIRST
    still-unmatched model leaf (in forward topology) whose shape equals the
    var's shape under a layout-compatible conversion. Raises if any model
    leaf ends up unmatched or any source var matches nothing, so a silent
    half-import is impossible; verify the result with golden descriptors
    (tests round-trip a scrambled-name export to 1e-6).

    Returns (params, stats) trees for :func:`merge_into_variables`.
    """
    targets = model_leaf_order(variables)
    taken = [False] * len(targets)
    params: dict = {}
    stats: dict = {}
    unmatched_src = []
    for key, val in state_dict.items():
        arr = _to_numpy(val)
        assigned = False
        for cand, kinds in _conversion_candidates(arr, source):
            cshape = np.shape(cand)
            for i, (tree, path, tshape) in enumerate(targets):
                if taken[i] or tshape != cshape:
                    continue
                leaf = path.split("/")[-1]
                if kinds is not None and leaf not in kinds:
                    continue
                taken[i] = True
                node = params if tree == "params" else stats
                parts = path.split("/")
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = np.asarray(cand)
                assigned = True
                break
            if assigned:
                break
        if not assigned:
            unmatched_src.append((key, arr.shape))
    if unmatched_src:
        raise ValueError(
            f"automatch: {len(unmatched_src)} source vars matched no model "
            f"leaf: {unmatched_src[:5]}"
        )
    missing = [path for i, (_, path, _) in enumerate(targets) if not taken[i]]
    if missing:
        raise ValueError(
            f"automatch: {len(missing)} model leaves unmatched: {missing[:5]}"
        )
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
