"""Weight-importer round trip: a fake torch-style state dict mapped onto the
model tree must reproduce descriptors computed with those weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from epcnet_tpu.utils.importer import (
    convert_dense,
    import_state_dict,
    merge_into_variables,
)


def test_convert_dense_layouts():
    w = np.arange(12, dtype=np.float32).reshape(4, 3)  # torch Linear [out=4, in=3]
    got = convert_dense(w, "torch")
    assert got.shape == (3, 4)
    np.testing.assert_array_equal(got, w.T)

    w4 = w.reshape(4, 3, 1, 1)  # torch Conv2d 1x1
    np.testing.assert_array_equal(convert_dense(w4, "torch"), w.T)

    tf = np.arange(12, dtype=np.float32).reshape(1, 1, 3, 4)  # TF conv2d
    np.testing.assert_array_equal(convert_dense(tf, "tf"), tf[0, 0])


def test_import_and_merge_roundtrip(rng, tiny_model_cfg):
    from epcnet_tpu.models import get_model

    model = get_model(tiny_model_cfg)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # Fabricate a "reference" state dict holding new weights for the first
    # ProxyConv dense + its BN, in torch layout.
    cin = variables["params"]["proxyconv_0"]["dense"]["kernel"].shape[0]
    cout = variables["params"]["proxyconv_0"]["dense"]["kernel"].shape[1]
    sd = {
        "backbone.convs.0.weight": rng.randn(cout, cin).astype(np.float32),
        "backbone.convs.0.bias": rng.randn(cout).astype(np.float32),
        "backbone.bns.0.weight": rng.rand(cout).astype(np.float32),
        "backbone.bns.0.bias": rng.randn(cout).astype(np.float32),
        "backbone.bns.0.running_mean": rng.randn(cout).astype(np.float32),
        "backbone.bns.0.running_var": rng.rand(cout).astype(np.float32) + 0.5,
        "unrelated.key": np.zeros(3),
    }
    name_map = {
        r"backbone\.convs\.(\d+)\.weight": r"proxyconv_\1/dense/kernel",
        r"backbone\.convs\.(\d+)\.bias": r"proxyconv_\1/dense/bias",
        r"backbone\.bns\.(\d+)\.weight": r"proxyconv_\1/bn/scale",
        r"backbone\.bns\.(\d+)\.bias": r"proxyconv_\1/bn/bias",
        r"backbone\.bns\.(\d+)\.running_mean": r"proxyconv_\1/bn/mean",
        r"backbone\.bns\.(\d+)\.running_var": r"proxyconv_\1/bn/var",
    }
    with pytest.warns(UserWarning, match="skipped 1 keys"):
        params, stats = import_state_dict(sd, name_map, source="torch")
    merged = merge_into_variables(variables, params, stats)

    np.testing.assert_array_equal(
        np.asarray(merged["params"]["proxyconv_0"]["dense"]["kernel"]),
        sd["backbone.convs.0.weight"].T,
    )
    np.testing.assert_array_equal(
        np.asarray(merged["batch_stats"]["proxyconv_0"]["bn"]["var"]),
        sd["backbone.bns.0.running_var"],
    )
    # model still runs with imported weights, and they change the output
    out0 = model.apply(variables, x, train=False)
    out1 = model.apply(merged, x, train=False)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_merge_shape_mismatch_raises(rng, tiny_model_cfg):
    from epcnet_tpu.models import get_model

    model = get_model(tiny_model_cfg)
    x = jnp.zeros((1, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    bad = {"proxyconv_0": {"dense": {"kernel": np.zeros((7, 7), np.float32)}}}
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_into_variables(variables, bad, {})

def test_tf1_pointnetvlad_name_map(rng):
    """Full-model import through the pre-wired TF1 PointNetVLAD NAME_MAP
    [LINEAGE, UNVERIFIED names]: a complete reference-style tf.train.Saver
    variable dict maps onto our PointNetVLAD tree with ZERO skipped keys,
    passes the shape-verified overlay, and the imported model runs."""
    from epcnet_tpu.configs import pointnetvlad_config
    from epcnet_tpu.models import get_model
    from epcnet_tpu.utils.importer import (
        NAME_MAPS, import_state_dict, merge_into_variables,
    )

    cfg = pointnetvlad_config(num_points=64).variant(
        pointnet_channels=(8, 8, 16), feature_dim=16, vlad_clusters=4,
        vlad_groups=1, vlad_group_dim=32, output_dim=32, use_pallas=False,
    )
    model = get_model(cfg)
    x = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def r(*shape):
        return rng.randn(*shape).astype(np.float32)

    sd = {}
    # the two T-Nets: tconv1..3 (64,128,1024), tfc1..2 (512,256), transform
    for scope, cin, tvar, tdim in (
        ("transform_net1", 3, "transform_XYZ", 9),
        ("transform_net2", 8, "transform_feat", 64),
    ):
        widths = [64, 128, 1024]
        prev = cin
        for i, w in enumerate(widths, start=1):
            sd[f"{scope}/tconv{i}/weights"] = r(1, 1, prev, w)  # TF conv2d 1x1
            sd[f"{scope}/tconv{i}/biases"] = r(w)
            for nm, arr in (("gamma", r(w)), ("beta", r(w)),
                            ("moving_mean", r(w)), ("moving_variance", np.abs(r(w)))):
                sd[f"{scope}/tconv{i}/bn/{nm}"] = arr
            prev = w
        for i, w in enumerate([512, 256], start=1):
            sd[f"{scope}/tfc{i}/weights"] = r(prev, w)
            sd[f"{scope}/tfc{i}/biases"] = r(w)
            for nm, arr in (("gamma", r(w)), ("beta", r(w)),
                            ("moving_mean", r(w)), ("moving_variance", np.abs(r(w)))):
                sd[f"{scope}/tfc{i}/bn/{nm}"] = arr
            prev = w
        sd[f"{scope}/{tvar}/weights"] = r(256, tdim)
        sd[f"{scope}/{tvar}/biases"] = r(tdim)
    # conv1..2 -> mlp1 (8, 8); conv3 -> mlp2 (16)
    prev = 3
    for i, w in enumerate([8, 8, 16], start=1):
        sd[f"conv{i}/weights"] = r(1, 1, prev, w)
        sd[f"conv{i}/biases"] = r(w)
        for nm, arr in (("gamma", r(w)), ("beta", r(w)),
                        ("moving_mean", r(w)), ("moving_variance", np.abs(r(w)))):
            sd[f"conv{i}/bn/{nm}"] = arr
        prev = w
    # NetVLAD head: D=16, K=4 clusters, hidden 64->32, gating 32
    sd["cluster_weights"] = r(16, 4)
    sd["cluster_biases"] = r(4)
    sd["cluster_weights2"] = r(1, 16, 4)  # TF [1, D, K] centres
    sd["hidden1_weights"] = r(64, 32)
    sd["hidden1_biases"] = r(32)
    sd["gating_weights"] = r(32, 32)
    sd["gating_biases"] = r(32)

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a skipped key == a map gap == fail
        params, stats = import_state_dict(
            sd, NAME_MAPS["tf1_pointnetvlad"], source="tf"
        )
    merged = merge_into_variables(variables, params, stats)

    # spot-check layout conversions landed as specified
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["netvlad"]["centroids"]),
        sd["cluster_weights2"][0].T,
    )
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["mlp1"]["dense_0"]["kernel"]),
        sd["conv1/weights"][0, 0],
    )
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["netvlad"]["group_w"]),
        sd["hidden1_weights"][None],
    )
    out = model.apply(merged, x, train=False)
    assert out.shape == (1, 32) and np.isfinite(np.asarray(out)).all()
    # descriptors actually changed vs the random init (the overlay took)
    base = model.apply(variables, x, train=False)
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_automatch_unlabeled_epcnet_roundtrip(rng):
    """VERDICT r2 #4 'done' criterion: an UNLABELED state dict (scrambled
    names, TF layouts, graph-construction order) auto-matches onto our
    EPC-Net by shape + topological order and reconstructs descriptors to
    1e-6."""
    from epcnet_tpu.configs import ModelConfig
    from epcnet_tpu.models import get_model
    from epcnet_tpu.utils.importer import (
        automatch_state_dict,
        merge_into_variables,
        model_leaf_order,
    )

    cfg = ModelConfig(
        num_points=64, knn_k=4, use_pallas=False,
        proxyconv_channels=(8, 8), lift_channels=(16, 32), feature_dim=32,
        vlad_clusters=4, vlad_groups=2, vlad_group_dim=8, output_dim=16,
    )
    model = get_model(cfg)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 3)).astype(np.float32))
    donor = model.init(jax.random.PRNGKey(1), x, train=False)
    target = model.init(jax.random.PRNGKey(2), x, train=False)
    ref = model.apply(donor, x, train=False)
    assert not np.allclose(np.asarray(ref),
                           np.asarray(model.apply(target, x, train=False)))

    # Export the donor as a reference-style state dict: TF layouts,
    # MEANINGLESS names, per-layer graph-construction order — exactly what
    # model_leaf_order documents as the matcher's input contract.
    def leaf_at(tree, path):
        node = donor["params"] if tree == "params" else donor["batch_stats"]
        for p in path.split("/"):
            node = node[p]
        return np.asarray(node)

    sd = {}
    for i, (tree, path, _) in enumerate(model_leaf_order(donor)):
        arr = leaf_at(tree, path)
        leaf = path.split("/")[-1]
        if leaf == "kernel":
            arr = arr[None, None]  # flax [Cin, Cout] -> TF conv [1,1,Cin,Cout]
        elif leaf == "centroids":
            arr = arr.T[None]  # [K, D] -> TF [1, D, K]
        sd[f"var_{i:03d}"] = arr

    params, stats = automatch_state_dict(sd, target, source="tf")
    merged = merge_into_variables(target, params, stats)
    out = model.apply(merged, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_automatch_rejects_partial_state_dict(rng):
    """A state dict missing variables must raise (no silent half-import)."""
    from epcnet_tpu.configs import ModelConfig
    from epcnet_tpu.models import get_model
    from epcnet_tpu.utils.importer import automatch_state_dict

    cfg = ModelConfig(
        num_points=64, knn_k=4, use_pallas=False,
        proxyconv_channels=(8,), lift_channels=(16,), feature_dim=16,
        vlad_clusters=4, vlad_groups=2, vlad_group_dim=8, output_dim=16,
    )
    model = get_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)), train=False
    )
    with pytest.raises(ValueError, match="matched no model leaf|unmatched"):
        automatch_state_dict({"w": np.zeros((3, 8), np.float32)}, variables)
    # and one that DOES match a leaf still fails on the missing remainder
    kernel0 = np.zeros((6, 8), np.float32)  # first ProxyConv [2*3, 8]
    with pytest.raises(ValueError, match="model leaves unmatched"):
        automatch_state_dict({"w": kernel0}, variables)


def test_automatch_torch_square_linear_transposed(rng):
    """A SQUARE torch Linear kernel must import TRANSPOSED: torch stores
    [out, in], and shape alone cannot distinguish it from flax's [in, out]
    for square layers (e.g. the output_dim x output_dim gating FC) — the
    transpose candidate must outrank the identity candidate for torch."""
    from epcnet_tpu.utils.importer import automatch_state_dict

    w = rng.uniform(-1, 1, (8, 8)).astype(np.float32)  # asymmetric square
    b = rng.uniform(-1, 1, (8,)).astype(np.float32)
    variables = {
        "params": {"gate": {"kernel": np.zeros((8, 8), np.float32),
                            "bias": np.zeros((8,), np.float32)}}
    }
    params, stats = automatch_state_dict(
        {"fc.weight": w, "fc.bias": b}, variables, source="torch"
    )
    np.testing.assert_array_equal(params["gate"]["kernel"], w.T)
    np.testing.assert_array_equal(params["gate"]["bias"], b)
    assert stats == {}


def test_tf1_epcnet_name_map(rng):
    """The best-guess EPC-Net NAME_MAP accepts a plausible TF1 variable
    dict with zero skipped keys and overlays the full flagship tree."""
    from epcnet_tpu.configs import ModelConfig
    from epcnet_tpu.models import get_model
    from epcnet_tpu.utils.importer import (
        NAME_MAPS, import_state_dict, merge_into_variables,
    )

    cfg = ModelConfig(
        num_points=64, knn_k=4, use_pallas=False,
        proxyconv_channels=(8, 8, 8, 16), lift_channels=(16, 32),
        feature_dim=32, vlad_clusters=4, vlad_groups=2, vlad_group_dim=8,
        output_dim=16,
    )
    model = get_model(cfg)
    x = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def r(*shape):
        return rng.randn(*shape).astype(np.float32)

    sd = {}
    prev = 3
    for i, w in enumerate(cfg.proxyconv_channels, start=1):
        sd[f"pconv{i}/weights"] = r(1, 1, 2 * prev, w)
        sd[f"pconv{i}/biases"] = r(w)
        for nm, arr in (("gamma", r(w)), ("beta", r(w)),
                        ("moving_mean", r(w)),
                        ("moving_variance", np.abs(r(w)))):
            sd[f"pconv{i}/bn/{nm}"] = arr
        prev = w
    prev = sum(cfg.proxyconv_channels)
    for i, w in enumerate(cfg.lift_channels, start=5):
        sd[f"conv{i}/weights"] = r(1, 1, prev, w)
        sd[f"conv{i}/biases"] = r(w)
        for nm, arr in (("gamma", r(w)), ("beta", r(w)),
                        ("moving_mean", r(w)),
                        ("moving_variance", np.abs(r(w)))):
            sd[f"conv{i}/bn/{nm}"] = arr
        prev = w
    d, k, g, gd = cfg.feature_dim, cfg.vlad_clusters, cfg.vlad_groups, cfg.vlad_group_dim
    sd["vlad/cluster_weights"] = r(d, k)
    sd["vlad/cluster_biases"] = r(k)
    sd["vlad/cluster_weights2"] = r(1, d, k)
    sd["vlad/hidden1_weights"] = r(g, k * d // g, gd)
    sd["vlad/hidden1_biases"] = r(g, gd)
    sd["vlad/hidden2_weights"] = r(g * gd, cfg.output_dim)
    sd["vlad/hidden2_biases"] = r(cfg.output_dim)
    sd["vlad/gating_weights"] = r(cfg.output_dim, cfg.output_dim)
    sd["vlad/gating_biases"] = r(cfg.output_dim)

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a skipped key == a map gap == fail
        params, stats = import_state_dict(sd, NAME_MAPS["tf1_epcnet"], source="tf")
    merged = merge_into_variables(variables, params, stats)
    out = model.apply(merged, x, train=False)
    assert out.shape == (1, 16) and np.isfinite(np.asarray(out)).all()
    assert not np.allclose(
        np.asarray(out), np.asarray(model.apply(variables, x, train=False))
    )
