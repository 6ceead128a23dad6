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
