"""Config system tests: JSON round-trip, CLI overrides, variants."""

import pytest

from epcnet_tpu.configs import (
    ExperimentConfig,
    ModelConfig,
    apply_overrides,
    epcnet_l_config,
    pointnetvlad_config,
)


def test_json_roundtrip():
    cfg = ExperimentConfig()
    text = cfg.to_json()
    back = ExperimentConfig.from_json(text)
    assert back == cfg


def test_json_roundtrip_preserves_tuples():
    cfg = ExperimentConfig(model=ModelConfig(proxyconv_channels=(8, 16, 32)))
    back = ExperimentConfig.from_json(cfg.to_json())
    assert back.model.proxyconv_channels == (8, 16, 32)
    assert isinstance(back.model.proxyconv_channels, tuple)


def test_apply_overrides_types():
    cfg = ExperimentConfig()
    out = apply_overrides(cfg, [
        "model.knn_k=12",
        "train.learning_rate=1e-3",
        "model.use_pallas=false",
        "model.proxyconv_channels=8,8,16",
        "data.dataset_root=/tmp/x",
    ])
    assert out.model.knn_k == 12 and isinstance(out.model.knn_k, int)
    assert out.train.learning_rate == pytest.approx(1e-3)
    assert out.model.use_pallas is False
    assert out.model.proxyconv_channels == (8, 8, 16)
    assert out.data.dataset_root == "/tmp/x"
    # original untouched (frozen)
    assert cfg.model.knn_k == 20


def test_apply_overrides_unknown_key():
    with pytest.raises(KeyError):
        apply_overrides(ExperimentConfig(), ["model.nonexistent=1"])


def test_variants():
    l = epcnet_l_config()
    assert l.name == "epcnet_l"
    p = pointnetvlad_config()
    assert p.vlad_groups == 1 and p.vlad_group_dim == 256
    v = ModelConfig().variant(knn_k=5)
    assert v.knn_k == 5 and ModelConfig().knn_k == 20


def test_mode_knobs_fail_fast_on_typos():
    """adjacency_format / vlad_precision typos must raise at construction,
    not silently fall back to the dense/highest path (ADVICE r2)."""
    with pytest.raises(ValueError, match="adjacency_format"):
        ModelConfig(adjacency_format="pakced")
    with pytest.raises(ValueError, match="vlad_precision"):
        ModelConfig(vlad_precision="hihgest")
    with pytest.raises(ValueError, match="adjacency_format"):
        apply_overrides(ExperimentConfig(), ["model.adjacency_format=bitpacked"])
    for ok in ("auto", "dense", "packed"):
        assert ModelConfig(adjacency_format=ok).adjacency_format == ok
