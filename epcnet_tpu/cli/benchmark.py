"""Benchmark CLI: per-kernel and end-to-end timings.

  python -m epcnet_tpu.cli.benchmark [--batch 32] [--num_points 4096] [--json]

Covers the BASELINE metric set: embedding submaps/sec/chip, kNN kernel
latency (pallas vs XLA), VLAD kernel latency, retrieval p50/p99.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _timeit(f, iters=20):
    from epcnet_tpu.utils.timing import timeit

    return timeit(f, iters=iters)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from epcnet_tpu.configs import ModelConfig
    from epcnet_tpu.models import get_model
    from epcnet_tpu.ops.knn import knn_jnp, knn_pallas
    from epcnet_tpu.ops.retrieval import topk_neighbors
    from epcnet_tpu.ops.vlad import vlad_aggregate_jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--num_points", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--db_size", type=int, default=4096)
    ap.add_argument("--json", action="store_true")
    from epcnet_tpu.utils.compile_cache import add_cli_arg, enable_compilation_cache

    add_cli_arg(ap)
    args = ap.parse_args(argv)
    enable_compilation_cache(args.compilation_cache_dir)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    rng = np.random.default_rng(0)
    b, n = args.batch, args.num_points
    x = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)), jnp.float32)
    out = {"backend": jax.default_backend(), "batch": b, "num_points": n}

    # kNN kernel
    jit_knn = jax.jit(lambda x: knn_jnp(x, 20))
    out["knn_xla_ms"] = round(_timeit(lambda: jit_knn(x), args.iters) * 1e3, 3)
    if on_tpu:
        out["knn_pallas_ms"] = round(
            _timeit(lambda: knn_pallas(x, 20), args.iters) * 1e3, 3
        )

    # VLAD kernel
    f = jnp.asarray(rng.standard_normal((b, n, 1024)), jnp.float32)
    lg = jnp.asarray(rng.standard_normal((b, n, 64)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((64, 1024)), jnp.float32)
    jit_vlad = jax.jit(lambda f, lg, c: vlad_aggregate_jnp(f, lg, c))
    out["vlad_xla_ms"] = round(_timeit(lambda: jit_vlad(f, lg, c), args.iters) * 1e3, 3)
    jit_vlad_fast = jax.jit(
        lambda f, lg, c: vlad_aggregate_jnp(f, lg, c, precision="default")
    )
    out["vlad_xla_bf16acc_ms"] = round(
        _timeit(lambda: jit_vlad_fast(f, lg, c), args.iters) * 1e3, 3
    )

    # end-to-end embed: wall (includes ~35ms tunnel dispatch on axon) AND
    # device-true via in-jit scan delta (see bench.py for the method).
    cfg = ModelConfig(num_points=n, use_pallas=on_tpu)
    model = get_model(cfg)
    variables = jax.jit(lambda r, d: model.init(r, d, train=False))(
        jax.random.PRNGKey(0), x[:1]
    )
    embed = jax.jit(lambda v, p: model.apply(v, p, train=False))
    dt = _timeit(lambda: embed(variables, x), args.iters)
    out["embed_wall_ms"] = round(dt * 1e3, 3)

    def embed_chunks(v, pts, n_chunks):
        def body(carry, _):
            d = model.apply(v, pts + carry, train=False)
            return 1e-12 * d[0, 0], d[:, :2]

        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=n_chunks)
        return outs

    c_lo, c_hi = (2, 8) if on_tpu else (1, 2)
    f_lo = jax.jit(lambda v, p: embed_chunks(v, p, c_lo))
    f_hi = jax.jit(lambda v, p: embed_chunks(v, p, c_hi))
    t_lo = _timeit(lambda: f_lo(variables, x), 5)
    t_hi = _timeit(lambda: f_hi(variables, x), 5)
    delta = t_hi - t_lo
    if delta > 3e-4:  # below ~0.3ms the delta is tunnel/measurement noise
        per_batch = delta / (c_hi - c_lo)
        out["embed_device_ms"] = round(per_batch * 1e3, 3)
        out["submaps_per_sec_device"] = round(b / per_batch, 2)
    else:
        out["embed_device_ms"] = None  # too fast to resolve at this shape
        out["submaps_per_sec_device"] = None

    # retrieval
    db = jnp.asarray(rng.standard_normal((args.db_size, 256)), jnp.float32)
    q1 = jnp.asarray(rng.standard_normal((1, 256)), jnp.float32)
    out["retrieval_1q_ms"] = round(
        _timeit(lambda: topk_neighbors(q1, db, 25), args.iters) * 1e3, 3
    )

    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k:24s} {v}")


if __name__ == "__main__":
    main()
