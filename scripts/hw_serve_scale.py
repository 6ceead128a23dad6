"""Serving DB scale test: p50/p99 + qps vs DB size at 10^5..10^7 rows.

VERDICT r3 missing #4: the int8 device DB is sold as "4x rows per chip for
pod-scale DBs" but the load tests index only hundreds of rows. This script
builds a synthetic descriptor DB at real scale ON THE CHIP through the
normal PlaceIndex append path (capacity-doubling device buffer, device-side
int8 quantization), then measures the fused embed+retrieve query path at
each size rung:

  - append storm: irregular host-side chunks crossing every capacity
    doubling, with the post-append sync+query latency recorded (the growth
    copy runs at HBM bandwidth — the rung that doubles capacity shows it);
  - steady-state query latency: wall p50/p99 + qps over repeated fused
    dispatches of a full embed_batch (each = 4096-pt embed of 32 submaps +
    exact top-k against the whole DB). Wall times carry the constant
    ~35 ms/dispatch tunnel tax (docs/KERNELS.md) — on directly-attached
    TPUs subtract it; qps is submaps/s through the serving path;
  - HBM footprint from PlaceIndex.metrics()["device_bytes"].

DB rows are random unit-norm descriptors (the embed cost and the distance
matmul cost do not depend on row VALUES; recall correctness at scale is
separately pinned by the self-retrieval checks below — the real-descriptor
recall evidence is results_int8.txt). A handful of REAL embedded rows are
planted in the synthetic sea and must come back as top-1 self-retrievals
at every size rung: exactness cannot silently degrade with DB size.

fp32 tops out at 2^21 rows (cap 2 GB + transient doubling copy; the 16 GB
v5e HBM also holds the model + distance slab), int8 runs to 10^7 rows —
2.56 GB of occupied row data (10^7 x 256 x 1B + scales), inside a 4.36 GB
allocated device buffer (the capacity-doubled 16.8M-row block, matching
serve_scale.json device_bytes) — measuring exactly the "4x rows per chip"
capacity claim.

Run serially (one TPU process at a time, generous leash):
    python -u scripts/hw_serve_scale.py > /tmp/hw_serve_scale.log 2>&1

Writes $HW/logs/serve_scale.json for hw_collect_evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epcnet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()  # $EPCNET_COMPILATION_CACHE_DIR

HW = os.environ.get("EPCNET_HWBENCH", "/root/hwbench")


def rand_unit_rows(rng, n: int, dim: int) -> np.ndarray:
    d = rng.standard_normal((n, dim), dtype=np.float32)
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def device_true_query_ms(index, query_pts, k: int = 25) -> float | None:
    """Device time per fused embed+retrieve dispatch at this rung's DB, via
    an in-jit lax.scan delta (VERDICT r4 weak #3: the wall p50s carry a
    35-170 ms tunnel dispatch tax that DRIFTS across runs, so they cannot
    support cross-rung comparison — this number can). Method identical to
    bench.py: two chunk counts, the difference isolates device time.

    MEASURED CAVEAT (round 5, scripts/hw_devtrue_ab.py -> hwevidence/r05/
    devtrue_ab.json): at >=2M rows this OVERSTATES the serving dispatch —
    XLA compiles a far slower loop body under lax.scan at giant top-k
    shapes (the [Q, N] distance buffer and top-k sort get loop-carried
    layouts): standalone retrieval scales at 4.05 ms per million rows
    while the scan iteration scales at ~85 ms per million (21x slope).
    Treat this column as an upper bound past 10^6 rows; docs/SERVING.md
    "Device-true latency, reconciled" has the standalone numbers."""
    import jax
    import jax.numpy as jnp

    from epcnet_tpu.ops.retrieval import (
        topk_neighbors, topk_neighbors_quantized,
    )
    from epcnet_tpu.utils.timing import device_sync

    embed = index._embed
    with index._lock:
        db, sc = index._dev_db, index._dev_scale
    quant = index.quantize == "int8"
    pts = jnp.asarray(query_pts, jnp.float32)

    def make(n_chunks: int):
        @jax.jit
        def run(params, stats, p, dbj, scj):
            def body(carry, _):
                d = embed(params, stats, p + carry)
                if quant:
                    idx2, dist = topk_neighbors_quantized(d, dbj, scj, k)
                else:
                    idx2, dist = topk_neighbors(d, dbj, k)
                # data-dependent carry: XLA cannot hoist the loop body
                return 1e-12 * dist[0, 0], idx2[:, 0]
            _, outs = jax.lax.scan(body, jnp.float32(0), None, length=n_chunks)
            return outs
        return run

    c_lo, c_hi = 2, 8
    f_lo, f_hi = make(c_lo), make(c_hi)
    args = (index._params, index._stats, pts, db, sc)
    device_sync(f_lo(*args))  # compile
    device_sync(f_hi(*args))

    def med(f, iters=4):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            device_sync(f(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), float(np.max(ts) - np.min(ts))

    for _ in range(3):
        t_lo, s_lo = med(f_lo)
        t_hi, s_hi = med(f_hi)
        per = (t_hi - t_lo) / (c_hi - c_lo)
        noise = (s_lo + s_hi) / (c_hi - c_lo)
        if per > max(2.0 * noise, 1e-6):
            return round(per * 1e3, 2)
    print(f"  [device-true] unresolved (delta {per * 1e3:.2f} ms vs noise "
          f"{noise * 1e3:.2f} ms) — recording null", flush=True)
    return None


def oracle_crosscheck(index, rng, n_queries: int = 64, k: int = 5) -> dict:
    """VERDICT r4 next #7: certify the capacity-block padding/trim
    bookkeeping AT SCALE against a brute-force numpy top-k over the host
    master (requantized host-side for int8 — quantize_descriptors'
    round/clip math reproduced in float64). Planted self-hits only prove a
    distance-0 duplicate is found; this proves arbitrary-rank ordering."""
    with index._lock:
        host = index._db  # fp32 master, append-only: safe to read
    q = rand_unit_rows(rng, n_queries, index.dim)
    ids_dev, dist_dev = index.query_descriptors(q, k=k)

    q64 = q.astype(np.float64)
    qq = (q64 ** 2).sum(1, keepdims=True)
    best_d = np.full((n_queries, k), np.inf)
    best_i = np.zeros((n_queries, k), np.int64)
    chunk = 250_000
    for s in range(0, len(host), chunk):
        blk = host[s : s + chunk].astype(np.float64)
        if index.quantize == "int8":
            scale = np.maximum(np.abs(blk).max(1, keepdims=True) / 127.0, 1e-12)
            blk = np.clip(np.round(blk / scale), -127, 127) * scale
        d2 = qq + (blk ** 2).sum(1)[None, :] - 2.0 * (q64 @ blk.T)
        cat_d = np.concatenate([best_d, d2], 1)
        cat_i = np.concatenate(
            [best_i, np.broadcast_to(np.arange(s, s + len(blk)),
                                     (n_queries, len(blk)))], 1)
        sel = np.argsort(cat_d, axis=1, kind="stable")[:, :k]
        best_d = np.take_along_axis(cat_d, sel, 1)
        best_i = np.take_along_axis(cat_i, sel, 1)

    exact_rows = int((ids_dev == best_i).all(1).sum())
    # ties: a device id differing from the oracle's at the same rank but at
    # an oracle-equal distance (fp tolerance) is an ordering tie, not a
    # bookkeeping bug
    host64 = None  # per-element distances for the device's picks
    dev_d_oracle = np.empty_like(best_d)
    for r in range(n_queries):
        rows = host[ids_dev[r]].astype(np.float64)
        if index.quantize == "int8":
            scale = np.maximum(np.abs(rows).max(1, keepdims=True) / 127.0, 1e-12)
            rows = np.clip(np.round(rows / scale), -127, 127) * scale
        dev_d_oracle[r] = ((q64[r][None] - rows) ** 2).sum(1)
    tie_ok = np.abs(dev_d_oracle - best_d) <= 1e-5
    mism = (ids_dev != best_i) & ~tie_ok
    out = {
        "rows": len(host),
        "n_queries": n_queries,
        "k": k,
        "exact_rows": exact_rows,
        "tie_explained": int(((ids_dev != best_i) & tie_ok).sum()),
        "non_tie_mismatches": int(mism.sum()),
        "max_dist_err_vs_oracle": float(np.abs(dist_dev - best_d).max()),
    }
    assert out["non_tie_mismatches"] == 0, f"oracle mismatch at scale: {out}"
    print(f"  [oracle] {out}", flush=True)
    return out


def measure_rung(index, query_pts, planted, rows_target: int, rng,
                 iters: int = 30) -> dict:
    """Grow the index to rows_target via an append storm, then measure."""
    from epcnet_tpu.serve import PlaceIndex  # noqa: F401 (typing only)

    append_events = []
    # chunks scale with the rung: add_descriptors copies the host master on
    # every append (np.concatenate), so tiny chunks at 10^7 rows would spend
    # minutes in host memcpy without telling us anything new about the chip
    chunk = max(100_000, rows_target // 16)
    while len(index) < rows_target:
        need = rows_target - len(index)
        # irregular sizes so appends cross block boundaries unaligned
        n = int(min(need, chunk * (0.5 + rng.random())))
        index.add_descriptors(rand_unit_rows(rng, n, index.dim))
        cap_before = index.metrics()["device_rows_capacity"]
        t0 = time.perf_counter()
        ids, _ = index.query(query_pts[:1], k=1)  # forces the lazy sync
        dt = time.perf_counter() - t0
        cap_after = index.metrics()["device_rows_capacity"]
        append_events.append({
            "rows": len(index), "sync_query_ms": round(dt * 1e3, 1),
            "grew_capacity": bool(cap_after != cap_before),
            "capacity": cap_after,
        })
    print(f"  [rows={rows_target}] append storm done "
          f"({len(append_events)} chunks, "
          f"{sum(e['grew_capacity'] for e in append_events)} capacity "
          "doublings)", flush=True)

    # exactness at scale: every planted real row must self-retrieve top-1
    ids, _ = index.query(planted["points"], k=1)
    self_ok = int((ids[:, 0] == planted["ids"]).sum())
    assert self_ok == len(planted["ids"]), (
        f"self-retrieval broke at {rows_target} rows: "
        f"{self_ok}/{len(planted['ids'])} (ids {ids[:, 0]} vs {planted['ids']})"
    )

    # steady state: repeated full-batch fused dispatches
    b = query_pts.shape[0]
    index.query(query_pts, k=25)  # warm this capacity's program
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        index.query(query_pts, k=25)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50 = lat[len(lat) // 2]
    p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]
    qps = b / (sum(lat) / len(lat))
    m = index.metrics()
    row = {
        "rows": len(index),
        "quantize": index.quantize,
        "device_bytes": m["device_bytes"],
        "device_rows_capacity": m["device_rows_capacity"],
        "batch": b,
        "iters": iters,
        "p50_ms": round(p50 * 1e3, 1),
        "p99_ms": round(p99 * 1e3, 1),
        # wall p50/p99 carry the drifting tunnel tax (compare within a run
        # only); this is the cross-rung comparison basis (VERDICT r4 #4)
        "device_true_ms_per_dispatch": device_true_query_ms(index, query_pts),
        "qps": round(qps, 1),
        "self_retrieval": f"{self_ok}/{len(planted['ids'])}",
        "append_events": append_events,
    }
    print(f"  [rows={len(index)} {index.quantize}] p50={row['p50_ms']}ms "
          f"p99={row['p99_ms']}ms qps={row['qps']} "
          f"dev={m['device_bytes'] / 1e9:.2f}GB self={row['self_retrieval']}",
          flush=True)
    return row


def run_ladder(quantize: str, rungs, embed_batch: int = 32) -> list[dict]:
    from epcnet_tpu.serve import PlaceIndex

    print(f"=== quantize={quantize} rungs={rungs}", flush=True)
    index = PlaceIndex.from_checkpoint(
        f"{HW}/log", embed_batch=embed_batch, quantize=quantize
    )
    index.warmup()
    rng = np.random.default_rng(0)
    query_pts = rng.uniform(-1, 1, (embed_batch, index.num_points, 3)).astype(
        np.float32
    )
    # plant REAL embedded rows at the very start (ids 0..b-1): the top-1
    # self-retrieval check must survive every synthetic rung
    planted_desc = index.embed(query_pts)
    index.add_descriptors(planted_desc)
    planted = {"points": query_pts, "ids": np.arange(embed_batch)}
    # oracle certification at the largest rung <= 10^6 (the index grows
    # cumulatively, so run it right after that rung; host brute force at
    # 10^7 would add minutes of numpy without testing new device paths)
    oracle_at = max((r for r in rungs if r <= 1_000_000), default=None)
    rows = []
    for r in rungs:
        row = measure_rung(index, query_pts, planted, r, rng)
        if r == oracle_at:
            row["oracle"] = oracle_crosscheck(index, rng)
        rows.append(row)
    return rows


def concurrent_append_phase(sync_mode: str, base_rows: int = 1_200_000,
                            add_rows: int = 700_000, threads: int = 8,
                            window_min_s: float = 20.0) -> dict:
    """VERDICT r4 next #2: p50/p99 of queries issued DURING a bulk append.

    Protocol: grow an int8 index to base_rows and flush; start `threads`
    query threads (each looping the fused single-submap query); land
    add_rows more in host chunks; record the latency of every query that
    STARTED inside the [first add, fully synced] window. base/add sizes are
    chosen so NO capacity doubling occurs mid-storm (base 1.2e6 already sits
    in the 2,097,152-row block and 1.9e6 still fits) — the doubling compile
    is measured separately by the ladder; this isolates the SYNC stall.

      sync_mode="blocking":   every query waits for full residency of all
                              rows added before it (read-your-writes) — the
                              round-4 behaviour that measured 11-30 s
                              stalls.
      sync_mode="background": queries run against the resident prefix while
                              a daemon thread syncs chunk-by-chunk — the
                              bounded-stall design under test.
    """
    import threading as th

    from epcnet_tpu.serve import PlaceIndex

    print(f"=== concurrent append storm: sync_mode={sync_mode}", flush=True)
    rng = np.random.default_rng(7)
    index = PlaceIndex.from_checkpoint(
        f"{HW}/log", embed_batch=8, quantize="int8", sync_mode=sync_mode
    )
    index.warmup()
    while len(index) < base_rows:
        index.add_descriptors(
            rand_unit_rows(rng, min(300_000, base_rows - len(index)), index.dim)
        )
    index.flush()
    qpts = rng.uniform(-1, 1, (1, index.num_points, 3)).astype(np.float32)
    index.query(qpts, k=5)  # warm the fused program at this capacity

    lats, errors = [], []
    stop = th.Event()
    t_start = [None]

    def worker():
        while not stop.is_set():
            t0 = time.perf_counter()
            try:
                index.query(qpts, k=5)
            except Exception as e:  # pragma: no cover - diagnostics
                errors.append(repr(e))
                return
            lats.append((t0, time.perf_counter() - t0))

    pool = [th.Thread(target=worker, daemon=True) for _ in range(threads)]
    for t in pool:
        t.start()
    time.sleep(2.0)  # steady-state floor before the storm
    t_storm = time.perf_counter()
    added = 0
    while added < add_rows:
        n = min(175_000, add_rows - added)
        index.add_descriptors(rand_unit_rows(rng, n, index.dim))
        added += n
    index.flush()  # wait for full residency
    t_synced = time.perf_counter()
    # keep the window observable even if the sync is fast
    if t_synced - t_storm < window_min_s:
        time.sleep(window_min_s - (t_synced - t_storm))
    stop.set()
    for t in pool:
        t.join(timeout=120)

    during = sorted(dt for (t0, dt) in lats if t_storm <= t0 <= t_synced)
    before = sorted(dt for (t0, dt) in lats if t0 < t_storm)
    out = {
        "sync_mode": sync_mode,
        "threads": threads,
        "base_rows": base_rows,
        "add_rows": add_rows,
        "append_to_synced_s": round(t_synced - t_storm, 1),
        "queries_during_append": len(during),
        "errors": errors,
    }
    for name, arr in (("during", during), ("before", before)):
        if arr:
            out[f"p50_{name}_ms"] = round(arr[len(arr) // 2] * 1e3, 1)
            out[f"p99_{name}_ms"] = round(
                arr[min(len(arr) - 1, int(len(arr) * 0.99))] * 1e3, 1)
            out[f"max_{name}_ms"] = round(arr[-1] * 1e3, 1)
    print(f"  {json.dumps(out)}", flush=True)
    assert not errors, f"queries failed during append: {errors[:3]}"
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fp32_rungs", default="100000,1000000,2097152",
                    help="fp32 device-DB sizes (HBM-bounded: cap*4B*dim)")
    ap.add_argument("--int8_rungs", default="100000,1000000,10000000")
    ap.add_argument("--skip_ladders", action="store_true",
                    help="run only the concurrent append-storm phase")
    ap.add_argument("--skip_concurrent", action="store_true")
    args = ap.parse_args()

    import jax
    print("devices:", jax.devices(), flush=True)

    results = {"metric": "serve_db_scale", "ladders": {}}
    if not args.skip_ladders:
        for quant, rungs_s in (("none", args.fp32_rungs),
                               ("int8", args.int8_rungs)):
            rungs = [int(x) for x in rungs_s.split(",") if x]
            results["ladders"][quant] = run_ladder(quant, rungs)
            time.sleep(10)  # idle gap between heavy phases (tunnel discipline)
    if not args.skip_concurrent:
        results["concurrent_append"] = [
            concurrent_append_phase("blocking"),
            concurrent_append_phase("background"),
        ]
        # merge into any prior serve_scale.json so ladder evidence persists
        prior = os.path.join(HW, "logs", "serve_scale.json")
        if args.skip_ladders and os.path.isfile(prior):
            with open(prior) as f:
                old = json.load(f)
            results["ladders"] = old.get("ladders", {})

    os.makedirs(os.path.join(HW, "logs"), exist_ok=True)
    path = os.path.join(HW, "logs", "serve_scale.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
