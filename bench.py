"""Headline benchmark: EPC-Net embedding throughput (submaps/sec/chip) at
4096 points — the BASELINE.json north-star metric.

Prints ONE JSON line:
  {"metric": "submaps_per_sec_per_chip", "value": N, "unit": "submaps/s",
   "vs_baseline": N, ...}

vs_baseline: the reference never published embedding throughput
(BASELINE.md), so the denominator is the assumed reference-GPU figure below
(paper-era single-GPU forward at 4096 pts). The north-star target is
vs_baseline > 10.
"""

from __future__ import annotations

import json

import numpy as np

# Assumed reference single-GPU embedding throughput (submaps/s) at 4096 pts.
# Not published by the reference (BASELINE.md: "not published as a headline
# number"); estimate for the paper-era GPU class. Revisit when the reference
# mount is populated.
ASSUMED_REF_GPU_SUBMAPS_PER_SEC = 200.0


def main():
    import jax
    import jax.numpy as jnp

    from epcnet_tpu.configs import ModelConfig
    from epcnet_tpu.models import get_model

    on_tpu = jax.default_backend() in ("tpu", "axon")
    cfg = ModelConfig(use_pallas=on_tpu)
    model = get_model(cfg)

    batch = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (batch, cfg.num_points, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)

    @jax.jit
    def embed(v, pts):
        return model.apply(v, pts, train=False)

    # NOTE: on the axon tunnel platform block_until_ready() does not actually
    # block, so timing must hard-sync via host transfer (utils/timing.py).
    from epcnet_tpu.utils.timing import timeit_pipelined

    iters = 30 if on_tpu else 3
    dt = timeit_pipelined(lambda: embed(variables, x), iters=iters)
    sps = batch / dt

    print(
        json.dumps(
            {
                "metric": "submaps_per_sec_per_chip",
                "value": round(sps, 2),
                "unit": "submaps/s",
                "vs_baseline": round(sps / ASSUMED_REF_GPU_SUBMAPS_PER_SEC, 3),
                "batch": batch,
                "num_points": cfg.num_points,
                "backend": jax.default_backend(),
                "baseline_assumed_ref_gpu_sps": ASSUMED_REF_GPU_SUBMAPS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
