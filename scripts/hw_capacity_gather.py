"""Measure the gather capacity rung (adjacency_format="gather") on hardware.

Extends docs/KERNELS.md's round-3 capacity table past the packed path's
32k-point ceiling: idx-only blockwise kNN + [N, K] gather means — no [N, N]
adjacency in any layout. Scan-delta timing (bench.py method; the ~35 ms
tunnel dispatch tax cancels in the hi-lo delta).

Run on the v5e (serially, long leash):
    python -u scripts/hw_capacity_gather.py > /tmp/hw_gather.log 2>&1
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from epcnet_tpu.utils.compile_cache import enable_compilation_cache
from epcnet_tpu.configs import ModelConfig

from epcnet_tpu.models import get_model
from epcnet_tpu.utils.timing import device_sync

enable_compilation_cache()  # $EPCNET_COMPILATION_CACHE_DIR, scripts/README.md

HW = os.environ.get("EPCNET_HWBENCH", "/root/hwbench")


def measure(n: int, b: int, fmt: str, c_lo: int = 1, c_hi: int = 3,
            iters: int = 5):
    cfg = ModelConfig(adjacency_format=fmt, use_pallas=True)
    model = get_model(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (b, n, 3)), jnp.float32)
    # init on a small slice: parameters are per-point (shape-independent),
    # so don't pay a giant forward just to build them
    variables = jax.jit(lambda r, d: model.init(r, d, train=False))(
        jax.random.PRNGKey(0), x[:1, :256]
    )

    def embed_chunks(v, pts, n_chunks: int):
        def body(carry, _):
            d = model.apply(v, pts + carry, train=False)
            return 1e-12 * d[0, 0], d[:, :2]

        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=n_chunks)
        return outs

    f_lo = jax.jit(lambda v, p: embed_chunks(v, p, c_lo))
    f_hi = jax.jit(lambda v, p: embed_chunks(v, p, c_hi))
    t0 = time.perf_counter()
    device_sync(f_lo(variables, x))
    print(f"  [N={n} B={b} {fmt}] lo compiled+ran in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    device_sync(f_hi(variables, x))

    def run(f):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            device_sync(f(variables, x))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    per_batch = (run(f_hi) - run(f_lo)) / (c_hi - c_lo)
    sps = b / per_batch
    print(f"  [N={n} B={b} {fmt}] {per_batch * 1e3:.1f} ms/batch -> "
          f"{sps:.1f} submaps/s", flush=True)
    return per_batch, sps


def main():
    print("devices:", jax.devices(), flush=True)
    # VERDICT r4 missing #5: the dense/packed 16k/32k rows cited in
    # docs/KERNELS.md predate the hwbench wipe and had no surviving
    # artifact — regenerate them here alongside the gather ladder so
    # capacity_gather.json carries EVERY capacity-table number. The
    # dense 32k compile failure is itself a cited claim: record it.
    rungs = [
        (16384, 4, "dense"),    # round-3: 164.5 submaps/s
        (16384, 4, "packed"),   # round-3: 155.5 submaps/s
        (16384, 4, "gather"),
        (32768, 2, "dense"),    # round-3: FAILS to compile (expected)
        (32768, 2, "packed"),   # round-3: 37.5 submaps/s
        (32768, 2, "gather"),
        # beyond every adjacency layout — single-chip giant submaps
        (65536, 1, "gather"),
        (131072, 1, "gather"),
    ]
    if os.environ.get("EPCNET_GATHER_ONLY"):
        rungs = [r for r in rungs if r[2] == "gather"]
    rows = []
    for n, b, fmt in rungs:
        try:
            per_batch, sps = measure(n, b, fmt)
            rows.append({"n": n, "batch": b, "format": fmt,
                         "per_batch_ms_device": round(per_batch * 1e3, 1),
                         "submaps_per_sec": round(sps, 2), "ok": True})
        except Exception as e:  # a rung that OOMs must not hide the rest
            print(f"  [N={n} B={b} {fmt}] FAILED: {e!r}", flush=True)
            rows.append({"n": n, "batch": b, "format": fmt,
                         "ok": False, "error": repr(e)[:500]})
        time.sleep(15)  # idle gap: compile helper degrades under churn

    out = {"metric": "capacity_gather", "backend": jax.default_backend(),
           "rows": rows}
    os.makedirs(os.path.join(HW, "logs"), exist_ok=True)
    path = os.path.join(HW, "logs", "capacity_gather.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
