"""G-VLAD / NetVLAD aggregation heads.

Reference equivalent: the NetVLAD-style aggregation class of the
PointNetVLAD heritage plus EPC-Net's grouped fully-connected ("G-VLAD")
[PAPER §III-C; LINEAGE: models/ gvlad / NetVLAD forward()].

G-VLAD: the C·D VLAD vector is split into G groups; a per-group small FC
maps each group down, the results are concatenated and a final FC produces
the 256-D descriptor. With G=1 and group_dim=output_dim the final FC is
SKIPPED so the head is exactly PointNetVLAD's single dense 65536->256 FC
(BASELINE config #3's parity check — one matrix, importable one-to-one
from reference hidden1_weights). Context gating follows PointNetVLAD
[LINEAGE].
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from epcnet_tpu.configs import ModelConfig
from epcnet_tpu.ops.vlad import vlad_aggregate


class GVLADHead(nn.Module):
    cfg: ModelConfig
    # Mesh axis name the POINT axis is sharded over (points-sharded embed,
    # models/points_sharded.py): the VLAD sum-over-points is completed with
    # one psum over this axis; None (default) = single-device aggregation.
    psum_axis: str | None = None

    @nn.compact
    def __call__(self, features, train: bool, momentum, mask=None):
        # features: [B, N, D] per-point features; mask: optional [B, N]
        # point-validity mask (points-sharded embed pads N — ops/vlad.py)
        cfg = self.cfg
        c, d = cfg.vlad_clusters, cfg.feature_dim
        assert features.shape[-1] == d, (features.shape, d)

        # Soft-assignment logits: a 1x1 conv over points [LINEAGE]. The
        # matmul follows the backbone compute dtype (KERNELS.md lever 1):
        # features arrive as bf16 from the lift anyway, so a bf16 Dense
        # rounds only the weights (~1e-3 logit drift) and saves the 3-pass
        # fp32-emulated MXU matmul; the softmax and everything after stay
        # fp32 (SURVEY.md §7.8 — VLAD accumulation is still HIGHEST).
        # compute_dtype="float32" configs keep the exact fp32 path.
        compute_dt = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        )
        logits = nn.Dense(c, name="assign", dtype=compute_dt)(
            features.astype(compute_dt)
        )
        centroids = self.param(
            "centroids", nn.initializers.normal(1.0 / jnp.sqrt(d)), (c, d), jnp.float32
        )
        # XLA's fused softmax+matmul beat a hand-written Pallas VLAD kernel
        # on v5e (docs/KERNELS.md), so this is always the XLA path.
        v = vlad_aggregate(
            features, logits, centroids, precision=cfg.vlad_precision,
            psum_axis=self.psum_axis, mask=mask,
        )  # [B, C*D]

        # Grouped FC (the "G" of G-VLAD).
        g = cfg.vlad_groups
        assert (c * d) % g == 0, f"C*D={c*d} not divisible by groups={g}"
        group_in = (c * d) // g
        b = v.shape[0]
        vg = v.reshape(b, g, group_in)
        wg = self.param(
            "group_w",
            nn.initializers.lecun_normal(),
            (g, group_in, cfg.vlad_group_dim),
            jnp.float32,
        )
        bg = self.param(
            "group_b", nn.initializers.zeros, (g, cfg.vlad_group_dim), jnp.float32
        )
        h = (
            jnp.einsum(
                "bgi,gio->bgo", vg, wg, precision=jax.lax.Precision.HIGHEST
            )
            + bg
        )  # [B, G, group_dim]
        h = h.reshape(b, g * cfg.vlad_group_dim)
        if g == 1 and cfg.vlad_group_dim == cfg.output_dim:
            # PointNetVLAD parity: ONE dense C*D -> output_dim FC, exactly the
            # reference's hidden1_weights layer stack (a second stacked linear
            # would break one-to-one weight import; see utils/importer.py).
            out = h
        else:
            out = nn.Dense(cfg.output_dim, name="out_fc", dtype=jnp.float32)(h)

        if cfg.gating:
            gate = nn.sigmoid(nn.Dense(cfg.output_dim, name="gate", dtype=jnp.float32)(out))
            out = out * gate

        # Final L2 normalization — the retrieval contract (SURVEY.md §3.4).
        return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)
