"""Hardware training-capacity ladder: what remat + grad accumulation buy.

Measures, on the real chip, the largest tuple batch (``batch_num_queries``)
that fits for the paper-scale EPC-Net train step at N=4096 points under
each memory configuration, plus per-step time for the sizes that fit:

  baseline            remat=False accum=1
  remat               remat=True  accum=1
  remat+accum2        remat=True  accum=2
  remat+accum4        remat=True  accum=4

Each tuple is 1 query + 2 positives + 18 negatives + 1 other_neg = 22
clouds of 4096 points (the hwbench training shape), so B=4 is already 88
full submaps per optimizer step. OOM at compile or run time ends that
config's ladder (caught and recorded; survivable on axon — the N=32k
dense adjacency compile OOM was). ONE process, sequential attempts,
smallest-first; timing via in-jit scan deltas is not needed here because a
train step is ~100 ms-scale, far above the ~35 ms tunnel tax — we still
report the 3-step mean minus dispatch floor as "approx".

Results go to docs/KERNELS.md's capacity section / README memory-lever
paragraph. Usage: python -u scripts/hw_train_capacity.py > log 2>&1
"""
import gc
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("EPCNET_CAP_CPU"):  # CI smoke of the ladder machinery
    jax.config.update("jax_platforms", "cpu")

from epcnet_tpu.utils.compile_cache import enable_compilation_cache
from epcnet_tpu.configs import ModelConfig, TrainConfig

from epcnet_tpu.train.state import create_train_state
from epcnet_tpu.train.step import build_train_step

enable_compilation_cache()  # $EPCNET_COMPILATION_CACHE_DIR, scripts/README.md

N = int(os.environ.get("EPCNET_CAP_N", 4096))
POS, NEG = 2, 18
LADDER = tuple(
    int(x) for x in os.environ.get(
        "EPCNET_CAP_LADDER", "2,4,6,8,12,16,24,32"
    ).split(",")
)
CONFIGS = [
    ("baseline", False, 1),
    ("remat", True, 1),
    ("remat+accum2", True, 2),
    ("remat+accum4", True, 4),
]
# Giant-N runs (VERDICT r4 next #3: the auto train-cutover routes N>=32768
# to the gather path — hardware-untested until round 5): select a subset,
# e.g. EPCNET_CAP_CONFIGS=remat EPCNET_CAP_N=32768 EPCNET_CAP_LADDER=1
if os.environ.get("EPCNET_CAP_CONFIGS"):
    want = os.environ["EPCNET_CAP_CONFIGS"].split(",")
    CONFIGS = [c for c in CONFIGS if c[0] in want]


def peak_hbm_gb() -> float | None:
    """Best-effort device peak-memory readout (TPU backends expose
    memory_stats; the axon tunnel may not — record null then)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
        return round(peak / 1e9, 2) if peak else None
    except Exception:
        return None

model_cfg = ModelConfig(num_points=N)
rng = np.random.default_rng(0)


def batch_for(b):
    def r(*shape):
        return jax.numpy.asarray(
            rng.uniform(-1, 1, shape).astype(np.float32)
        )

    return {
        "query": r(b, N, 3),
        "positives": r(b, POS, N, 3),
        "negatives": r(b, NEG, N, 3),
        "other_neg": r(b, N, 3),
    }


def sync(x):
    # axon: block_until_ready doesn't block; a 1-element host read does
    np.asarray(jax.numpy.ravel(jax.tree_util.tree_leaves(x)[0])[0])


results = {}
for name, remat, accum in CONFIGS:
    fits, times = [], {}
    for b in LADDER:
        if b % accum:
            continue
        tcfg = TrainConfig(
            batch_num_queries=b, remat=remat, grad_accum_steps=accum,
        )
        try:
            step = build_train_step(model_cfg, tcfg)
            state = create_train_state(model_cfg, tcfg, num_points=N)
            batch = batch_for(b)
            t0 = time.perf_counter()
            state, m = step(state, batch)
            sync(m["loss"])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(3):
                state, m = step(state, batch)
            sync(m["loss"])
            dt = (time.perf_counter() - t0) / 3
            fits.append(b)
            times[b] = dt
            hbm = peak_hbm_gb()
            print(
                f"{name:14s} B={b:3d} OK   compile={compile_s:6.1f}s "
                f"step~{dt * 1e3:7.1f}ms "
                f"({b * (POS + NEG + 2) / dt:6.1f} submaps/s)"
                + (f" peakHBM={hbm}GB" if hbm else ""),
                flush=True,
            )
        except Exception as e:
            msg = repr(e)[:140]
            print(f"{name:14s} B={b:3d} FAIL {msg}", flush=True)
            break
        finally:
            # module scope: drop whichever of the three got assigned before
            # a failure, so a leaked buffer can't skew the next attempt
            for _name in ("state", "batch", "step"):
                globals().pop(_name, None)
            gc.collect()
    results[name] = (fits, times)

print(f"\n=== summary (max fitting batch_num_queries, N={N}, 22-cloud tuples)")
for name, (fits, times) in results.items():
    mx = max(fits) if fits else 0
    t = times.get(mx)
    extra = f" step~{t * 1e3:.0f}ms" if t else ""
    print(f"{name:14s} maxB={mx}{extra}", flush=True)
