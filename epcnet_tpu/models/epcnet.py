"""EPC-Net and EPC-Net-L models.

Reference equivalent: models/EPC_Net.py get_model() [LINEAGE; PAPER Fig. 2]:
4096x3 submap -> spatial-adjacency kNN (computed ONCE on xyz) -> ProxyConv
stack -> concat multi-scale features -> per-point lift to 1024-D -> G-VLAD
-> 256-D L2-normalized descriptor.

TPU-native deltas from the reference (design, not translation):
  - kNN runs as the blockwise Pallas MXU kernel (ops/knn.py) on TPU.
  - Neighbour means are one dense normalized-adjacency bf16 matmul per layer
    (ops/adjacency.py) instead of [N, K, C] gathers.
  - Backbone matmuls are bf16 with fp32 accumulation; distances, VLAD and
    the descriptor/L2-norm tail stay fp32 (SURVEY.md §7.8).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from epcnet_tpu.configs import ModelConfig
from epcnet_tpu.models.layers import ProxyConv, SharedMLP
from epcnet_tpu.models.vlad_head import GVLADHead
from epcnet_tpu.ops.adjacency import gather_neighbor_mean, packed_neighbor_mean
from epcnet_tpu.ops.knn import knn, knn_adjacency, packed_layout_supported

# adjacency_format="auto" switches the EVAL path to bit-packed adjacency
# above this N. Measured on v5e-1 (docs/KERNELS.md capacity table): at
# N=16384 dense int8 still compiles and is FASTER (164.5 vs 155.5
# submaps/s), at N=32768 the dense [N, N] program fails to compile while
# packed runs (37.5 submaps/s) — so the crossover sits exactly past 16k.
_PACKED_AUTO_N = 16384
# ... and above THIS N "auto" drops the adjacency entirely: idx-only
# blockwise kNN + [N, K] gather means (gather_neighbor_mean) — the
# single-chip >32k capacity rung. Cutover CONFIRMED on v5e-1 (round 4,
# hwevidence/r04/capacity_gather.json): at N=32768 packed still wins
# (37.5 vs gather's 15.9 submaps/s), past it gather is the only path and
# runs to N=131072 single-chip (65k: 5.5/s, 131k: 1.4/s) —
# docs/KERNELS.md capacity table.
_GATHER_AUTO_N = 32768


class EPCNet(nn.Module):
    """Submap [B, N, 3] -> descriptor [B, output_dim] (L2-normalized fp32)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, points, train: bool = False, momentum=0.9):
        cfg = self.cfg
        b, n, _ = points.shape
        x = points.astype(jnp.float32)

        # Spatial adjacency: built once on xyz, shared by all ProxyConv
        # layers [PAPER §III-A]. Indices are integers — no gradient flows.
        # On TPU the fused kernel emits idx AND the dense adjacency in one
        # pass (ops/knn.py knn_with_adjacency_pallas).
        impl = "auto" if cfg.use_pallas else "jnp"
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        # with_proxy: layer 0's proxy point (k-nearest coord mean) comes out
        # of the kNN kernel itself — one fewer [N, N] adjacency read.
        # Bit-packed adjacency (1 bit/entry, ops/adjacency.py): 8x less HBM
        # for the adjacency write and each layer's A read — an opt-in for
        # memory-capacity-bound shapes (large N / big batches). It is NOT
        # the default: measured same-process at B=32 x 4096 on v5e the dense
        # int8 path is ~0.5 ms FASTER (12.9 vs 13.4 ms model forward) — the
        # A@F matmuls are partly compute-bound, so the in-kernel plane
        # unpack costs more than the saved bytes (docs/KERNELS.md). Eval
        # path only: the packed consumer has no autodiff rule; training
        # keeps dense int8, whose matmul gradient XLA derives.
        # auto cutovers: TRAIN switches to gather AT the 32k boundary (the
        # dense [32k, 32k] adjacency is the measured compile-OOM, and packed
        # is eval-only — strict `>` would route train at exactly N=32768 to
        # the known-failing dense path); eval takes packed past 16k only
        # when the bit-plane layout actually accepts N (no pad columns —
        # otherwise "auto" would select a path that raises), else it rides
        # dense until gather takes over past 32k.
        gather = cfg.adjacency_format == "gather" or (
            cfg.adjacency_format == "auto"
            and (n > _GATHER_AUTO_N or (train and n >= _GATHER_AUTO_N))
        )
        packed = not gather and not train and (
            cfg.adjacency_format == "packed"
            or (
                cfg.adjacency_format == "auto"
                and n > _PACKED_AUTO_N
                and packed_layout_supported(n, proxy_dtype=cfg.compute_dtype)
            )
        )
        if gather:
            # No adjacency in any layout: idx-only blockwise kNN, then each
            # layer's proxy is a [N, K, C] gather + fp32-accumulated mean
            # (ops/adjacency.py gather_neighbor_mean). Differentiable —
            # valid for training — and the only single-chip path past
            # N=32k, where even bit-packed [N, N/32] planes fail.
            # knn() resolves impl="auto" against the backend — calling
            # knn_pallas directly would run interpret mode off-TPU.
            idx = jax.lax.stop_gradient(knn(x, cfg.knn_k, impl=impl))
            adj = None
        else:
            fmt = "packed" if packed else "dense"
            _, adj, proxy0 = knn_adjacency(
                x, cfg.knn_k, dtype=dtype, impl=impl, with_idx=False,
                with_proxy=True, fmt=fmt,
            )
        f = x.astype(dtype)
        scales = []
        for i, ch in enumerate(cfg.proxyconv_channels):
            if gather:
                proxy = gather_neighbor_mean(f, idx)
            elif i == 0:
                proxy = proxy0
            elif packed:
                proxy = packed_neighbor_mean(f, adj, cfg.knn_k, dtype=dtype)
            else:
                proxy = None  # ProxyConv runs the dense A@F matmul itself
            f = ProxyConv(ch, knn_k=cfg.knn_k, dtype=dtype, name=f"proxyconv_{i}")(
                f, adj, train, momentum, proxy=proxy
            )
            scales.append(f)

        f_cat = jnp.concatenate(scales, axis=-1)  # multi-scale concat [PAPER Fig. 2]
        f_lift = SharedMLP(cfg.lift_channels, dtype=dtype, name="lift")(
            f_cat, train, momentum
        )  # [B, N, feature_dim]

        return GVLADHead(cfg, name="gvlad")(f_lift, train, momentum)


def param_count(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))
