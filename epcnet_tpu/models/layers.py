"""Shared NN building blocks.

Reference equivalent: utils/tf_util.py (conv2d / fully_connected /
batch_norm_* helpers with the TF-style "bn_decay" schedule) [LINEAGE]. The
reference's "conv2d with 1x1 kernel over [B, N, 1, C]" is just a per-point
Dense here — XLA maps it straight onto the MXU without the fake spatial dims.

``DynamicBatchNorm`` reproduces the reference's *scheduled* BN momentum
(bn_decay grows 0.5 -> 0.99 over training [LINEAGE: train.py
get_bn_decay()]): momentum is a traced call argument, not a static module
attribute, so one compiled train step serves the whole schedule.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from epcnet_tpu.ops.adjacency import neighbor_mean


class DynamicBatchNorm(nn.Module):
    """BatchNorm over all leading axes with a dynamic (traced) momentum.

    ``axis_name``: optional mesh axis the LEADING (point) axis is sharded
    over — batch statistics are completed with psums so the sharded train
    step sees the same mean/var as the single-device one
    (models/points_sharded.py). Static module config: the parameter /
    batch_stats tree is unchanged, so trained checkpoints apply verbatim.
    """

    epsilon: float = 1e-3  # reference tf_util uses 1e-3 [LINEAGE]
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool, momentum):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif self.axis_name is not None:
            # Two-pass cross-shard stats (mean first, then centred second
            # moment) — numerically the dense path's jnp.mean/var, completed
            # with one tiny [C] psum per pass over the point-sharding axis.
            red = tuple(range(x.ndim - 1))
            total = x.size // c * jax.lax.psum(1, self.axis_name)
            mean = jax.lax.psum(jnp.sum(xf, axis=red), self.axis_name) / total
            var = (
                jax.lax.psum(jnp.sum((xf - mean) ** 2, axis=red), self.axis_name)
                / total
            )
        else:
            red = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=red)
            var = jnp.var(xf, axis=red)
        if not use_running_average and not self.is_initializing():
            # psum'd stats are identical on every shard, so the running-stat
            # update stays consistent across devices in the sharded case
            m = jnp.asarray(momentum, jnp.float32)
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype)


class SharedMLP(nn.Module):
    """Per-point MLP stack: Dense -> BN -> ReLU per width (tf_util.conv2d
    with 1x1 kernels, the reference's universal layer [LINEAGE])."""

    widths: Sequence[int]
    dtype: jnp.dtype = jnp.bfloat16
    activate_final: bool = True
    bn_axis: str | None = None  # point-sharded training (DynamicBatchNorm)

    @nn.compact
    def __call__(self, x, train: bool, momentum):
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, dtype=self.dtype, name=f"dense_{i}")(x)
            last = i == len(self.widths) - 1
            if not last or self.activate_final:
                x = DynamicBatchNorm(name=f"bn_{i}", axis_name=self.bn_axis)(
                    x, not train, momentum
                )
                x = nn.relu(x)
        return x


class ProxyConv(nn.Module):
    """EPC-Net's ProxyConv [PAPER §III-B; LINEAGE: models/ proxy_conv()].

    proxy_i = mean of the K neighbours' features (via the dense 0/1
    indicator adjacency, an MXU matmul scaled by 1/K afterwards — see
    ops/adjacency.py); output = ReLU(BN(W . [proxy - f, f])). The
    mean-commutes-with-linear-map identity means the [N, K, C] edge tensor
    is never materialized — same math as the reference, but gather-free.
    """

    out_channels: int
    knn_k: int = 20
    dtype: jnp.dtype = jnp.bfloat16
    bn_axis: str | None = None  # point-sharded training (DynamicBatchNorm)

    @nn.compact
    def __call__(self, features, adjacency, train: bool, momentum, proxy=None):
        # ``proxy`` lets the caller supply a precomputed proxy point — layer 0
        # receives it straight from the fused kNN kernel (ops/knn.py
        # with_proxy), which skips this layer's [N, N] adjacency HBM read.
        if proxy is None:
            proxy = neighbor_mean(
                features,
                adjacency=adjacency,
                compute_dtype=self.dtype,
                adjacency_scale=1.0 / self.knn_k,
            )
        h = jnp.concatenate([proxy - features, features], axis=-1)
        h = nn.Dense(self.out_channels, dtype=self.dtype, name="dense")(h)
        h = DynamicBatchNorm(name="bn", axis_name=self.bn_axis)(
            h, not train, momentum
        )
        return nn.relu(h)


class TNet(nn.Module):
    """Spatial/feature transform net (PointNet heritage), used by the
    PointNetVLAD baseline [LINEAGE: pointnetvlad_cls.py input_transform_net].
    Produces a [dim, dim] transform initialized at identity."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool, momentum):
        # x: [B, N, dim]
        h = SharedMLP((64, 128, 1024), dtype=self.dtype, name="mlp")(x, train, momentum)
        h = jnp.max(h, axis=-2)  # [B, 1024]
        h = SharedMLP((512, 256), dtype=self.dtype, name="fc")(h, train, momentum)
        b = x.shape[0]
        w = self.param(
            "transform_w", nn.initializers.zeros, (256, self.dim * self.dim), jnp.float32
        )
        bias = self.param(
            "transform_b",
            lambda _key: jnp.eye(self.dim, dtype=jnp.float32).reshape(-1),
        )
        t = h.astype(jnp.float32) @ w + bias
        return t.reshape(b, self.dim, self.dim)
