"""PointNetVLAD baseline model (BASELINE config #3).

Reference equivalent: mikacuy/pointnetvlad models/pointnetvlad_cls.py
[LINEAGE]: PointNet backbone (input T-Net, shared MLPs 64-64, feature T-Net,
shared MLPs 64-128-1024) followed by full NetVLAD + dense 65536->256 FC +
context gating. Serves as the aggregation-kernel parity check: the same
GVLADHead with vlad_groups=1 / group_dim=output_dim IS plain NetVLAD+FC.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from epcnet_tpu.configs import ModelConfig
from epcnet_tpu.models.layers import SharedMLP, TNet
from epcnet_tpu.models.vlad_head import GVLADHead


class PointNetVLAD(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, points, train: bool = False, momentum=0.9):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        x = points.astype(jnp.float32)  # [B, N, 3]

        if cfg.use_tnet:
            t_in = TNet(3, dtype=dtype, name="input_tnet")(x.astype(dtype), train, momentum)
            x = jnp.einsum("bnd,bde->bne", x, t_in.astype(jnp.float32))

        h = x.astype(dtype)
        c0, c1 = cfg.pointnet_channels[:2]
        h = SharedMLP((c0, c1), dtype=dtype, name="mlp1")(h, train, momentum)

        if cfg.use_tnet:
            t_feat = TNet(c1, dtype=dtype, name="feature_tnet")(h, train, momentum)
            h = jnp.einsum(
                "bnd,bde->bne", h.astype(jnp.float32), t_feat.astype(jnp.float32)
            ).astype(dtype)

        h = SharedMLP(cfg.pointnet_channels[2:], dtype=dtype, name="mlp2")(
            h, train, momentum
        )  # [B, N, 1024]

        return GVLADHead(cfg, name="netvlad")(h, train, momentum)
