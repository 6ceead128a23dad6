"""Resolve the round-5 device-true anomaly: at the >=2M-row serve_scale
rungs the in-scan probe (`hw_serve_scale.device_true_query_ms`) reported
MORE device time per dispatch than the measured end-to-end wall p50
(147 ms probe vs 112 ms wall at 2,097,152 fp32 rows; 1592 ms vs 162 ms at
16.7M-capacity int8), which is impossible if both run the same program.

Hypothesis: wrapping the fused embed+topk in `lax.scan` compiles a
DIFFERENT (slower) loop-body program — the [Q, N] distance buffer and the
top-k sort get loop-carried layouts — so the probe overstates the true
per-dispatch device time at large N. The standalone program is what
serving actually dispatches.

Method (same discipline as bench.py, one process, no checkpoint needed —
topk only, embed excluded so the numbers isolate the retrieval side):
for N in {2^21, 2^23} and dtype in {fp32, int8}:
  A. standalone: jit(topk)(q, db) x iters, timed with device_sync each —
     includes the per-dispatch tunnel tax, so ALSO time B=back-to-back
     pairs to difference the tax out.
  B. scan-wrapped: the probe's own method (chunks 2 vs 8, delta/6).
Writes $HW/logs/devtrue_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HW = os.environ.get("EPCNET_HWBENCH", "/root/hwbench")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epcnet_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable_compilation_cache(os.path.join(HW, "xla_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from epcnet_tpu.ops.retrieval import (  # noqa: E402
    topk_neighbors, topk_neighbors_quantized,
)
from epcnet_tpu.utils.timing import device_sync  # noqa: E402

K = 25
Q = 32
DIM = 256


def standalone_ms(fn, args, iters=12):
    device_sync(fn(*args))  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        device_sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return round(ts[len(ts) // 2] * 1e3, 2)


def scan_ms(fn, args, c_lo=2, c_hi=8):
    """The serve_scale probe's method, verbatim in structure."""
    def make(n_chunks):
        @jax.jit
        def run(q, *dbargs):
            def body(carry, _):
                idx, dist = fn(q + carry, *dbargs)
                return 1e-12 * dist[0, 0], idx[:, 0]
            _, outs = jax.lax.scan(
                body, jnp.float32(0), None, length=n_chunks)
            return outs
        return run

    f_lo, f_hi = make(c_lo), make(c_hi)
    device_sync(f_lo(*args))
    device_sync(f_hi(*args))

    def med(f, iters=4):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            device_sync(f(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return round((med(f_hi) - med(f_lo)) / (c_hi - c_lo) * 1e3, 2)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    out = {"metric": "devtrue_ab", "k": K, "q_batch": Q, "rows": []}
    path = os.path.join(HW, "logs", "devtrue_ab.json")
    for n in (1 << 21, 1 << 22, 1 << 23):
        db = rng.normal(size=(n, DIM)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        q = jnp.asarray(db[:Q] + 1e-3)
        row = {"rows": n}
        # fp32 at 2^23 OOMs on a 16 GB chip (8.6 GB DB + the scan body's
        # loop-carried distance transients — first run, RESOURCE_EXHAUSTED):
        # the fp32 serving ladder tops out at 2^21 rows anyway (SERVING.md),
        # so past that only the int8 arm is in-distribution.
        try:
            if n <= (1 << 21):
                dbj = jnp.asarray(db)
                f32 = jax.jit(lambda q, d: topk_neighbors(q, d, K))
                row["fp32_standalone_ms"] = standalone_ms(f32, (q, dbj))
                row["fp32_scan_ms"] = scan_ms(
                    lambda qq, d: topk_neighbors(qq, d, K), (q, dbj))
                del dbj
            # quantize on the HOST: doing it eagerly on-device leaves fp32
            # transients that OOM'd the 2^23 arm (second run) — serving
            # quantizes inside jitted append programs where it fuses.
            scale = np.maximum(
                np.abs(db).max(axis=1, keepdims=True) / 127.0, 1e-12
            ).astype(np.float32)
            dqh = np.clip(np.round(db / scale), -127, 127).astype(np.int8)
            dq, sc = jax.device_put(dqh), jax.device_put(scale)
            del dqh
            q8 = jax.jit(lambda q, d, s: topk_neighbors_quantized(q, d, s, K))
            row["int8_standalone_ms"] = standalone_ms(q8, (q, dq, sc))
            row["int8_scan_ms"] = scan_ms(
                lambda qq, d, s: topk_neighbors_quantized(qq, d, s, K),
                (q, dq, sc))
            del dq, sc
        except Exception as e:  # RESOURCE_EXHAUSTED is itself a finding
            row["error"] = repr(e)[:300]
        print(row, flush=True)
        out["rows"].append(row)
        with open(path, "w") as f:  # persist per-row: a later OOM cannot
            json.dump(out, f, indent=1)  # erase an earlier measurement
        del q
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
