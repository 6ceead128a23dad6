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
