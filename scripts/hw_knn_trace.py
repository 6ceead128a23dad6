"""kNN kernel cycle attribution + ONE software-pipelining attempt.

VERDICT r4 weak #6 / next #8: the "latency-bound, not width-bound" story
rests on a cost model (docs/KERNELS.md) — this script makes it empirical:

1. **Profiler trace** of the B=8 model forward (`jax.profiler.start_trace`
   -> $HW/logs/knn_trace/). On the axon tunnel the device-side XPlane may
   or may not materialize; whatever lands is recorded (file list + bytes)
   and kept under $HW for inspection.

2. **Ablation attribution** (the trustworthy part on this image): four
   kernel variants that stop after successive phases of the shipped
   adjacency-only kernel (ops/knn.py `_knn_adj_only_kernel`), scan-delta
   timed in ONE process so the deltas attribute device time:

     slab      distance slab + 1 min round + tiny [tq,128] output
     rounds    slab + k value-only min rounds          (rounds = B - A)
     thresh    + threshold compare + candidate count   (thresh = C - B)
     full      the SHIPPED kernel incl. trim loop + [N,N] int8 adjacency
               write + in-kernel proxy emission        (trim+IO = D - C)

3. **Software-pipelined variant**: a ping-pong-scratch kernel that, in grid
   step t, computes tile t's distance slab while running tile t-1's
   reduce/trim chain — the two instruction streams are independent, so if
   the reduce chain stalls on cross-lane latency Mosaic can fill the
   bubbles with the other tile's FMAs. (Round 3 measured 2/4 INDEPENDENT
   row-chains within one tile as neutral; this differs by overlapping
   dissimilar op mixes — slab FMAs vs reduce/broadcast.) Exactness is
   asserted against the shipped kernel before timing. A measured rejection
   goes to docs/KERNELS.md with these numbers either way.

Run serially (one TPU process, generous leash):
    python -u scripts/hw_knn_trace.py > /tmp/hw_knn_trace.log 2>&1
Writes $HW/logs/knn_trace.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from epcnet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from epcnet_tpu.configs import ModelConfig  # noqa: E402
from epcnet_tpu.models import get_model  # noqa: E402
from epcnet_tpu.ops.knn import knn_with_adjacency_pallas  # noqa: E402
from epcnet_tpu.utils.timing import device_sync  # noqa: E402

HW = os.environ.get("EPCNET_HWBENCH", "/root/hwbench")

B, N, K, CP, TILE = 8, 4096, 20, 3, 128
LANE = 128


# ---------------------------------------------------------------------------
# ablation kernels (phase prefixes of ops/knn.py _knn_adj_only_kernel)
# ---------------------------------------------------------------------------


def _slab(q, xt, n):
    tq = q.shape[0]
    d = jnp.zeros((tq, n), jnp.float32)
    for c in range(CP):
        diff = q[:, c : c + 1] - xt[c : c + 1, :]
        d = d + diff * diff
    return d


def _kern_phase(x_ref, xt_ref, o_ref, *, n, rounds, thresh):
    q = x_ref[0].astype(jnp.float32)
    xt = xt_ref[0].astype(jnp.float32)
    d = _slab(q, xt, n)
    dw = d
    m = jnp.zeros((q.shape[0], 1), jnp.float32)
    for _ in range(rounds):
        m = jnp.min(dw, axis=1, keepdims=True)
        dw = jnp.where(dw <= m, jnp.inf, dw)
    out = m
    if thresh:
        d_kept = jnp.where(d <= m, d, jnp.inf)
        cnt = jnp.sum(jnp.where(d_kept < jnp.inf, 1.0, 0.0), axis=1,
                      keepdims=True)
        out = m + 1e-20 * cnt  # keep both live
    o_ref[0] = jnp.broadcast_to(out, (q.shape[0], LANE)).astype(jnp.float32)


def _phase_call(xp, rounds: int, thresh: bool):
    b, npad, cp = xp.shape
    xt = jnp.swapaxes(xp, -1, -2)
    return pl.pallas_call(
        functools.partial(_kern_phase, n=npad, rounds=rounds, thresh=thresh),
        grid=(b, npad // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, cp), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp, npad), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, LANE), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npad, LANE), jnp.float32),
    )(xp, xt)


# ---------------------------------------------------------------------------
# software-pipelined full kernel (ping-pong slab scratch across grid steps)
# ---------------------------------------------------------------------------


def _process_tile(d, adj_ref, proxy_ref, xt, *, n, k):
    """Rounds + threshold + trim + adjacency/proxy emission — the shipped
    _knn_adj_only_kernel phases, operating on a precomputed slab."""
    tq = d.shape[0]
    dw = d
    m = jnp.zeros((tq, 1), jnp.float32)
    for _ in range(k):
        m = jnp.min(dw, axis=1, keepdims=True)
        dw = jnp.where(dw <= m, jnp.inf, dw)
    d_kept = jnp.where(d <= m, d, jnp.inf)
    cnt = jnp.sum(jnp.where(d_kept < jnp.inf, 1, 0), axis=1, keepdims=True)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, n), 1)

    def cond(carry):
        _, c = carry
        return jnp.any(c > k)

    def body(carry):
        dd, c = carry
        mm = jnp.max(jnp.where(dd < jnp.inf, dd, -jnp.inf), axis=1,
                     keepdims=True)
        cand = jnp.where(dd == mm, col_ids, -1)
        sel = jnp.max(cand, axis=1, keepdims=True)
        over = c > k
        dd = jnp.where(over & (col_ids == sel), jnp.inf, dd)
        return dd, jnp.where(over, c - 1, c)

    d_kept, _ = jax.lax.while_loop(cond, body, (d_kept, cnt))
    mask = jnp.where(d_kept < jnp.inf, 1.0, 0.0)
    adj_ref[0] = mask.astype(adj_ref.dtype)
    p = jax.lax.dot_general(
        mask.astype(jnp.bfloat16), xt.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * jnp.float32(1.0 / k)
    pad = jnp.zeros((tq, proxy_ref.shape[-1] - p.shape[-1]), jnp.float32)
    proxy_ref[0] = jnp.concatenate([p, pad], axis=1).astype(proxy_ref.dtype)


def _kern_pipelined(x_ref, xt_ref, adj_ref, proxy_ref, s0, s1,
                    *, n, k, n_tiles):
    qi = pl.program_id(1)
    xt = xt_ref[0].astype(jnp.float32)

    def compute_into(dst):
        dst[...] = _slab(x_ref[0].astype(jnp.float32), xt, n)

    # grid step t: slab(tile t) -> scratch[t%2]; process(tile t-1) from
    # scratch[(t-1)%2]. The last step (qi == n_tiles) only processes.
    @pl.when((qi < n_tiles) & (qi % 2 == 0))
    def _():
        compute_into(s0)

    @pl.when((qi < n_tiles) & (qi % 2 == 1))
    def _():
        compute_into(s1)

    @pl.when((qi > 0) & (qi % 2 == 1))
    def _():
        _process_tile(s0[...], adj_ref, proxy_ref, xt, n=n, k=k)

    @pl.when((qi > 0) & (qi % 2 == 0))
    def _():
        _process_tile(s1[...], adj_ref, proxy_ref, xt, n=n, k=k)


def _pipelined_call(xp, k: int):
    b, npad, cp = xp.shape
    n_tiles = npad // TILE
    xt = jnp.swapaxes(xp, -1, -2)
    # input: tile t's rows at step t (clamped on the process-only last step);
    # outputs: tile t-1's rows (clamped at step 0, overwritten at step 1)
    return pl.pallas_call(
        functools.partial(_kern_pipelined, n=npad, k=k, n_tiles=n_tiles),
        grid=(b, n_tiles + 1),
        in_specs=[
            pl.BlockSpec(
                (1, TILE, cp),
                lambda bi, qi: (bi, jnp.minimum(qi, n_tiles - 1), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp, npad), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, TILE, npad),
                lambda bi, qi: (bi, jnp.maximum(qi - 1, 0), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, TILE, LANE),
                lambda bi, qi: (bi, jnp.maximum(qi - 1, 0), 0),
                memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, npad), jnp.int8),
            jax.ShapeDtypeStruct((b, npad, LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE, npad), jnp.float32),
            pltpu.VMEM((TILE, npad), jnp.float32),
        ],
    )(xp, xt)


# ---------------------------------------------------------------------------
# scan-delta timing (bench.py method)
# ---------------------------------------------------------------------------


def scan_delta_ms(fn, xp, c_lo=4, c_hi=132, iters=5, attempts=3):
    """Device ms per fn(xp) call: in-jit scan at two chunk counts.

    These kernels run 0.5-3 ms per call, so the chunk delta must be LONG
    (128 chunks ~ 100-400 ms of device time) to resolve above the tunnel's
    per-dispatch wall variance — the first run at c_hi=10 measured noise
    (negative phase times)."""
    def chunks(n):
        @jax.jit
        def run(x):
            def body(carry, _):
                out = fn(x + carry)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return 1e-12 * leaf[0, 0, 0].astype(jnp.float32), leaf[0, 0, :1]
            _, outs = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return outs
        return run

    f_lo, f_hi = chunks(c_lo), chunks(c_hi)
    device_sync(f_lo(xp))
    device_sync(f_hi(xp))

    def med(f):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            device_sync(f(xp))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), float(np.max(ts) - np.min(ts))

    for _ in range(attempts):
        t_lo, s_lo = med(f_lo)
        t_hi, s_hi = med(f_hi)
        per = (t_hi - t_lo) / (c_hi - c_lo)
        noise = (s_lo + s_hi) / (c_hi - c_lo)
        if per > max(2.0 * noise, 1e-6):
            return round(per * 1e3, 3)
    print(f"  UNRESOLVED delta {per * 1e3:.3f} ms vs noise {noise * 1e3:.3f}",
          flush=True)
    return round(per * 1e3, 3)


def _trace_top_ops(trace_dir: str, top: int = 15) -> dict:
    """Device-plane op attribution from the XPlane protobuf jax.profiler
    wrote (vm.xplane.pb): a minimal protobuf wire-format walk over
    XSpace -> XPlane('/device:TPU:0') -> XLine('XLA Ops'/'XLA Modules') ->
    XEvent(metadata_id, duration_ps), names via the plane's event_metadata
    map. No tensorflow/profiler tooling exists on this image — this is
    sufficient for name + total-duration aggregation."""
    import glob
    import struct  # noqa: F401 (fixed-width wire types are skipped below)

    def varint(b, i):
        x = s = 0
        while True:
            v = b[i]; i += 1
            x |= (v & 0x7F) << s
            if not v & 0x80:
                return x, i
            s += 7

    def fields(b):
        i, end = 0, len(b)
        while i < end:
            tag, i = varint(b, i)
            f, wt = tag >> 3, tag & 7
            if wt == 0:
                v, i = varint(b, i); yield f, wt, v
            elif wt == 1:
                yield f, wt, b[i:i + 8]; i += 8
            elif wt == 2:
                ln, i = varint(b, i); yield f, wt, b[i:i + ln]; i += ln
            elif wt == 5:
                yield f, wt, b[i:i + 4]; i += 4
            else:
                raise ValueError(f"wire type {wt}")

    def submsg_str(pb, field):
        for f, wt, v in fields(pb):
            if f == field and wt == 2:
                return v.decode("utf-8", "replace")
        return None

    out = {}
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    for path in paths:
        b = open(path, "rb").read()
        for f, wt, plane in fields(b):
            if not (f == 1 and wt == 2):
                continue
            pname, lines, emeta = None, [], {}
            for f2, wt2, v2 in fields(plane):
                if f2 == 2 and wt2 == 2:
                    pname = v2.decode("utf-8", "replace")
                elif f2 == 3 and wt2 == 2:
                    lines.append(v2)
                elif f2 == 4 and wt2 == 2:  # map<int64, XEventMetadata>
                    k = md = None
                    for f3, wt3, v3 in fields(v2):
                        if f3 == 1 and wt3 == 0:
                            k = v3
                        elif f3 == 2 and wt3 == 2:
                            md = v3
                    if md is not None:
                        emeta[k] = submsg_str(md, 2)
            if pname != "/device:TPU:0":
                continue
            for ln in lines:
                lname, agg = None, {}
                n_events = 0
                for f2, wt2, v2 in fields(ln):
                    if f2 == 2 and wt2 == 2:
                        lname = v2.decode("utf-8", "replace")
                    elif f2 == 4 and wt2 == 2:  # XEvent
                        mid = dur = 0
                        for f3, wt3, v3 in fields(v2):
                            if f3 == 1 and wt3 == 0:
                                mid = v3
                            elif f3 == 3 and wt3 == 0:
                                dur = v3
                        a = agg.setdefault(mid, [0.0, 0])
                        a[0] += dur / 1e9  # ps -> ms
                        a[1] += 1
                        n_events += 1
                if not agg:
                    continue
                rows = sorted(
                    ({"name": (emeta.get(mid) or "?")[:160], "count": c,
                      "total_ms": round(ms, 3)}
                     for mid, (ms, c) in agg.items()),
                    key=lambda r: -r["total_ms"])
                out[lname] = {"events": n_events, "top": rows[:top]}
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    xp = jnp.asarray(np.pad(x, ((0, 0), (0, 0), (0, 8 - 3))))

    out: dict = {"metric": "knn_trace_attribution", "batch": B, "n": N,
                 "k": K, "tile_q": TILE}

    # 1) profiler trace of the model forward (best-effort on the tunnel)
    trace_dir = os.path.join(HW, "logs", "knn_trace")
    import shutil
    shutil.rmtree(trace_dir, ignore_errors=True)  # one run's trace only
    try:
        cfg = ModelConfig(use_pallas=True)
        model = get_model(cfg)
        xb = jnp.asarray(x)
        variables = jax.jit(lambda r, d: model.init(r, d, train=False))(
            jax.random.PRNGKey(0), xb[:1])
        fwd = jax.jit(lambda v, p: model.apply(v, p, train=False))
        device_sync(fwd(variables, xb))  # compile OUTSIDE the trace
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            device_sync(fwd(variables, xb))
        jax.profiler.stop_trace()
        files = []
        for root, _, names in os.walk(trace_dir):
            for nme in names:
                p = os.path.join(root, nme)
                files.append({"file": os.path.relpath(p, trace_dir),
                              "bytes": os.path.getsize(p)})
        out["profiler_trace"] = {"dir": trace_dir, "files": files}
        print(f"trace captured: {len(files)} files", flush=True)
        out["trace_device_ops"] = _trace_top_ops(trace_dir)
        for lname, line in out["trace_device_ops"].items():
            print(f"  [{lname}] {line['events']} events", flush=True)
            for row in line["top"][:8]:
                print(f"    {row['total_ms']:8.3f} ms x{row['count']:3d}  "
                      f"{row['name'][:90]}", flush=True)
    except Exception as e:  # the attribution below is the load-bearing part
        out["profiler_trace"] = {"error": repr(e)[:300]}
        print(f"trace FAILED: {e!r}", flush=True)
    time.sleep(10)

    # 2) phase ablations (one process; deltas attribute device time)
    phases = {
        "A_slab_1round": lambda v: _phase_call(v, rounds=1, thresh=False),
        "B_slab_krounds": lambda v: _phase_call(v, rounds=K, thresh=False),
        "C_plus_threshold": lambda v: _phase_call(v, rounds=K, thresh=True),
        "D_full_shipped": lambda v: knn_with_adjacency_pallas(
            v[..., :3], K, with_idx=False, with_proxy=True)[1],
    }
    ms = {}
    for name, fn in phases.items():
        ms[name] = scan_delta_ms(fn, xp)
        print(f"  {name}: {ms[name]} ms/batch", flush=True)
        time.sleep(5)
    out["phase_ms_per_batch"] = ms
    out["attribution_ms"] = {
        "slab_plus_fixed": ms["A_slab_1round"],
        "value_rounds": round(ms["B_slab_krounds"] - ms["A_slab_1round"], 3),
        "threshold_count": round(
            ms["C_plus_threshold"] - ms["B_slab_krounds"], 3),
        "trim_adjwrite_proxy": round(
            ms["D_full_shipped"] - ms["C_plus_threshold"], 3),
    }
    print("attribution:", json.dumps(out["attribution_ms"]), flush=True)
    os.makedirs(os.path.join(HW, "logs"), exist_ok=True)
    path = os.path.join(HW, "logs", "knn_trace.json")

    def persist():
        # incremental write: phase 3 runs a NOVEL kernel on hardware — if
        # it fails (Mosaic lowering, exactness), the trace + ablation
        # evidence above must survive the crash
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    persist()
    time.sleep(10)

    # 3) pipelined variant: exactness first, then same-process A/B
    try:
        _, adj_ref_out, proxy_ref_out = knn_with_adjacency_pallas(
            jnp.asarray(x), K, with_idx=False, with_proxy=True)
        adj_pipe, proxy_pipe = _pipelined_call(xp, K)
        adj_ok = bool(jnp.array_equal(adj_ref_out, adj_pipe[:, :N, :N]))
        # proxy: same math, bf16 operands — allow fp noise only
        perr = float(jnp.max(jnp.abs(
            proxy_pipe[:, :N, :3] - proxy_ref_out.astype(jnp.float32))))
        print(f"pipelined exactness: adj_equal={adj_ok} "
              f"proxy_maxerr={perr:.2e}", flush=True)
        pipe_ms = scan_delta_ms(lambda v: _pipelined_call(v, K)[0], xp)
        ship_ms = scan_delta_ms(
            lambda v: knn_with_adjacency_pallas(
                v[..., :3], K, with_idx=False, with_proxy=True)[1], xp)
        out["pipelined"] = {
            "adj_exact": adj_ok,
            "proxy_max_abs_err": perr,
            "pipelined_ms_per_batch": pipe_ms,
            "shipped_ms_per_batch_same_process": ship_ms,
            "verdict": "faster" if (adj_ok and pipe_ms < 0.97 * ship_ms)
            else "rejected",
        }
    except Exception as e:  # a failed variant is itself a measured result
        out["pipelined"] = {"error": repr(e)[:300], "verdict": "rejected"}
    print("pipelined:", json.dumps(out["pipelined"]), flush=True)
    persist()
    print(json.dumps(out), flush=True)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
