"""Hardware serving load test: concurrent threads of single-submap queries
through the QueryScheduler against the trained hwbench index (v5e-1).

Step 5b of scripts/README.md; produces BASELINE.md's concurrent-load
latency row. 8 threads x 12 queries each submit one 4096-pt submap and
check self-retrieval; the scheduler micro-batches them into padded
embed+retrieve dispatches (avg_batch printed — 8.0/8 on the recorded run
means perfect batching efficiency). Latency here is wall time through the
axon tunnel (~35 ms/dispatch floor); on directly-attached TPUs the same
protocol measures true serving latency.

``--quantize int8`` runs the same protocol against the int8 device DB
(4x rows per chip of HBM; serve.py) — self-retrieval must stay 96/96,
pinning that the quantization error never flips a top-1 on real
descriptors.
"""
import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epcnet_tpu.utils.compile_cache import enable_compilation_cache
from epcnet_tpu.data.pointclouds import load_pc_file

from epcnet_tpu.data.tuples import load_pickle
from epcnet_tpu.serve import PlaceIndex, QueryScheduler

enable_compilation_cache()  # $EPCNET_COMPILATION_CACHE_DIR, scripts/README.md

HW = os.environ.get("EPCNET_HWBENCH", "/root/hwbench")
_ap = argparse.ArgumentParser()
_ap.add_argument("--quantize", default="none", choices=("none", "int8"))
QUANT = _ap.parse_args().quantize

idx = PlaceIndex.from_checkpoint(f"{HW}/log", embed_batch=8, quantize=QUANT)
db_sets = load_pickle(f"{HW}/data/oxford_evaluation_database.pickle")
entries = db_sets[0]
pts = np.stack([
    load_pc_file(entries[i]["query"], f"{HW}/data", 4096)
    for i in sorted(entries)[:64]
])
idx.add(pts)
print(f"index size {len(idx)}", flush=True)

dispatches = {"n": 0, "rows": 0}
orig = idx.query
def counting(p, k):
    dispatches["n"] += 1; dispatches["rows"] += p.shape[0]
    return orig(p, k)
idx.query = counting

sched = QueryScheduler(idx, k=5, max_wait_ms=5.0)
sched.submit(pts[0]).result(timeout=600)  # warm the compile caches
dispatches["n"] = dispatches["rows"] = 0

threads, per = 8, 12
lat, fails = [], []

def caller(tid):
    r = np.random.default_rng(tid)
    for i in range(per):
        j = int(r.integers(len(pts)))
        t0 = time.perf_counter()
        try:
            ids, d = sched.submit(pts[j]).result(timeout=600)
            lat.append(time.perf_counter() - t0)
            if ids[0] != j:
                fails.append((tid, i, int(ids[0]), j))
        except Exception as e:
            fails.append((tid, i, repr(e)))

ts = [threading.Thread(target=caller, args=(t,)) for t in range(threads)]
t0 = time.perf_counter()
for t in ts: t.start()
for t in ts: t.join()
wall = time.perf_counter() - t0
sched.stop()

assert not fails, fails[:3]
a = np.sort(lat)
print(f"quantize={QUANT} n={len(lat)} p50={a[len(a)//2]*1e3:.1f}ms "
      f"p99={a[min(len(a)-1, int(len(a)*0.99))]*1e3:.1f}ms "
      f"qps={len(lat)/wall:.1f} avg_batch={dispatches['rows']/max(dispatches['n'],1):.2f} "
      f"dispatches={dispatches['n']}", flush=True)
