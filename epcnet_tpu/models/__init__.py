"""Model zoo: EPC-Net (flagship), EPC-Net-L (distilled student),
PointNetVLAD (baseline). Factory mirrors the reference's
``MODEL.get_model()`` convention [LINEAGE: train.py importlib model import].
"""

from __future__ import annotations

import flax.linen as nn

from epcnet_tpu.configs import ModelConfig, epcnet_l_config, pointnetvlad_config
from epcnet_tpu.models.epcnet import EPCNet, param_count
from epcnet_tpu.models.pointnetvlad import PointNetVLAD
from epcnet_tpu.models.layers import ProxyConv, SharedMLP, DynamicBatchNorm, TNet
from epcnet_tpu.models.points_sharded import (
    build_points_sharded_distill_fn,
    build_points_sharded_train_step,
    embed_points_sharded,
)
from epcnet_tpu.models.vlad_head import GVLADHead


def get_model(cfg: ModelConfig) -> nn.Module:
    if cfg.name in ("epcnet", "epcnet_l"):
        return EPCNet(cfg)
    if cfg.name == "pointnetvlad":
        return PointNetVLAD(cfg)
    raise ValueError(f"unknown model {cfg.name!r}")


__all__ = [
    "get_model",
    "EPCNet",
    "PointNetVLAD",
    "GVLADHead",
    "ProxyConv",
    "SharedMLP",
    "DynamicBatchNorm",
    "TNet",
    "param_count",
    "embed_points_sharded",
    "build_points_sharded_distill_fn",
    "build_points_sharded_train_step",
    "ModelConfig",
    "epcnet_l_config",
    "pointnetvlad_config",
]
