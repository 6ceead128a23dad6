"""Recall@N evaluation harness.

Reference equivalent: evaluate.py [LINEAGE; SURVEY.md §3.2]: for every
(database run, query run) pair of each region, embed all submaps, find each
query's top-25 database neighbours, and score
  - recall@k, k=1..25: fraction of queries whose ground-truth set intersects
    the top-k;
  - recall@top-1%: k = max(ceil(|DB|/100), 1);
averaged over pairs then regions.

The reference's CPU sklearn KDTree is replaced by the exact MXU brute-force
top-k (ops/retrieval.py), optionally ICI-sharded over the mesh's "db" axis
for pod-scale databases (BASELINE config #5).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from epcnet_tpu.configs import DataConfig, EvalConfig
from epcnet_tpu.data.native_loader import load_pc_files_native
from epcnet_tpu.ops.retrieval import (
    quantize_descriptors,
    sharded_topk_neighbors,
    topk_neighbors,
    topk_neighbors_quantized,
)


def embed_entries(
    embed_fn, params, batch_stats, entries: dict, data_cfg: DataConfig, batch_size: int = 64
) -> np.ndarray:
    """Embed every submap of a database/query set dict -> [n, D] fp32."""
    n = len(entries)
    descs = []
    buf = np.zeros((batch_size, data_cfg.num_points, 3), np.float32)
    for s in range(0, n, batch_size):
        cnt = min(s + batch_size, n) - s
        files = [entries[s + j]["query"] for j in range(cnt)]
        load_pc_files_native(
            files, data_cfg.dataset_root, data_cfg.num_points, out=buf[:cnt],
            n_threads=data_cfg.loader_threads,
        )
        if cnt < batch_size:
            buf[cnt:] = 0.0
        d = np.asarray(embed_fn(params, batch_stats, jnp.asarray(buf)))
        descs.append(d[:cnt])
    return np.concatenate(descs, axis=0)


def get_recall(
    db_desc: np.ndarray,
    q_desc: np.ndarray,
    gt: list[list[int]],
    top_k: int = 25,
    mesh=None,
    quantize: str = "none",
):
    """recall@1..top_k and recall@top-1% for one (database, query-run) pair.

    gt[i] = ground-truth database indices for query i (may be empty —
    such queries are skipped, as in the reference).

    ``quantize="int8"`` retrieves against the int8-quantized DB exactly as
    serving does (ops/retrieval.py) — quantifying what the serving
    capacity format costs in recall (measured: nothing, the ~4e-4
    dequantization error is far below inter-place margins).
    """
    if quantize not in ("none", "int8"):
        raise ValueError(f"quantize={quantize!r} not in {{'none', 'int8'}}")
    one_percent_k = max(int(np.ceil(len(db_desc) / 100.0)), 1)
    k = max(top_k, one_percent_k)
    k = min(k, len(db_desc))
    sharded = mesh is not None and "db" in mesh.shape and mesh.shape["db"] > 1
    if quantize == "int8":
        db_q, db_scale = quantize_descriptors(jnp.asarray(db_desc))
        if sharded:
            idx, _ = sharded_topk_neighbors(
                jnp.asarray(q_desc), db_q, k, mesh, db_scale=db_scale
            )
        else:
            idx, _ = topk_neighbors_quantized(
                jnp.asarray(q_desc), db_q, db_scale, k
            )
    elif sharded:
        idx, _ = sharded_topk_neighbors(
            jnp.asarray(q_desc), jnp.asarray(db_desc), k, mesh
        )
    else:
        idx, _ = topk_neighbors(jnp.asarray(q_desc), jnp.asarray(db_desc), k)
    idx = np.asarray(idx)

    recall = np.zeros(top_k)
    one_percent_hits = 0
    evaluated = 0
    for i, gti in enumerate(gt):
        if not gti:
            continue
        evaluated += 1
        gts = set(gti)
        hits = [j for j, n in enumerate(idx[i]) if int(n) in gts]
        if hits:
            first = hits[0]
            if first < top_k:
                recall[first:] += 1
            if first < one_percent_k:
                one_percent_hits += 1
    if evaluated == 0:
        return np.zeros(top_k), 0.0, 0
    return recall / evaluated, one_percent_hits / evaluated, evaluated


def evaluate_region(
    embed_fn,
    params,
    batch_stats,
    database_sets: list[dict],
    query_sets: list[dict],
    data_cfg: DataConfig,
    eval_cfg: EvalConfig | None = None,
    mesh=None,
    quantize: str = "none",
):
    """All (database run i, query run j != i) pairs of one region
    [LINEAGE: evaluate.py evaluate()]. Returns dict of averaged metrics."""
    eval_cfg = eval_cfg or EvalConfig()
    # an empty run (no submaps / no queries in the test regions) is skipped,
    # symmetrically for database and query sides — embedding an empty set
    # would crash, and a zero-content pair must not score as zero recall
    db_descs = [
        embed_entries(embed_fn, params, batch_stats, s, data_cfg, eval_cfg.batch_size)
        if len(s) else None
        for s in database_sets
    ]
    q_descs = [
        embed_entries(embed_fn, params, batch_stats, s, data_cfg, eval_cfg.batch_size)
        if len(s) else None
        for s in query_sets
    ]
    recalls, one_percents = [], []
    for di in range(len(database_sets)):
        if db_descs[di] is None:
            continue
        for qi in range(len(query_sets)):
            if di == qi:
                continue
            qset = query_sets[qi]
            if not qset:
                continue
            gt = [qset[i].get(di, []) for i in range(len(qset))]
            r, p1, n_eval = get_recall(
                db_descs[di], q_descs[qi], gt, eval_cfg.top_k, mesh,
                quantize=quantize,
            )
            if n_eval:
                recalls.append(r)
                one_percents.append(p1)
    if not recalls:
        # evaluated_pairs=0 marks "nothing to score here" — evaluate_dataset
        # EXCLUDES such regions from the cross-region average (a zero row
        # would silently deflate the reported recall)
        return {"recall_at": np.zeros(eval_cfg.top_k), "recall_at_1pct": 0.0,
                "evaluated_pairs": 0}
    return {
        "recall_at": np.mean(recalls, axis=0),
        "recall_at_1pct": float(np.mean(one_percents)),
        "evaluated_pairs": len(recalls),
    }


def evaluate_dataset(
    embed_fn, params, batch_stats, regions: dict, data_cfg: DataConfig,
    eval_cfg: EvalConfig | None = None, mesh=None, quantize: str = "none",
):
    """regions: {name: (database_sets, query_sets)}. Averages across regions
    (the reference's final results.txt table)."""
    out = {}
    per_region = []
    for name, (db_sets, q_sets) in regions.items():
        m = evaluate_region(
            embed_fn, params, batch_stats, db_sets, q_sets, data_cfg,
            eval_cfg, mesh, quantize=quantize,
        )
        out[name] = m
        # regions that scored NO pairs (single-run, or queries emptied by
        # test-region filtering) must not average in as zeros
        if m.get("evaluated_pairs", 1) > 0:
            per_region.append(m)
    if not per_region:
        per_region = list(out.values()) or [
            {"recall_at": np.zeros((eval_cfg or EvalConfig()).top_k),
             "recall_at_1pct": 0.0}
        ]
    out["average"] = {
        "recall_at": np.mean([m["recall_at"] for m in per_region], axis=0),
        "recall_at_1pct": float(np.mean([m["recall_at_1pct"] for m in per_region])),
    }
    return out


def retrieval_latency_probe(
    db_desc: np.ndarray, num_queries: int = 256, top_k: int = 25, mesh=None, seed: int = 0
):
    """Retrieval latency (BASELINE metric set).

    Reports two views:
    - ``p50_ms``/``p99_ms``: per-call WALL latency incl. dispatch — what a
      single serving client observes. On the axon tunnel platform this is
      dominated by the constant ~35 ms dispatch tax (CLAUDE.md), so
    - ``device_ms``: dispatch-free per-query device time from an in-jit
      ``lax.scan`` delta — the number that scales to real deployments.

    Uses the ICI-sharded retrieval path when ``mesh`` has a "db" axis > 1,
    matching what evaluation/serving actually run (BASELINE config #5).
    """
    rng = np.random.default_rng(seed)
    top_k = min(top_k, len(db_desc))  # tiny DBs: k cannot exceed the rows
    qs = db_desc[rng.integers(0, len(db_desc), num_queries)] + 1e-3 * rng.standard_normal(
        (num_queries, db_desc.shape[1])
    ).astype(np.float32)
    db = jnp.asarray(db_desc)
    sharded = mesh is not None and "db" in mesh.shape and mesh.shape["db"] > 1

    def retrieve(q):
        if sharded:
            return sharded_topk_neighbors(q, db, top_k, mesh)
        return topk_neighbors(q, db, top_k)

    lat = []
    # warmup/compile (host transfer = hard sync; see utils/timing.py)
    np.asarray(retrieve(jnp.asarray(qs[:1]))[0])
    for i in range(num_queries):
        q = jnp.asarray(qs[i : i + 1])
        t0 = time.perf_counter()
        idx, _ = retrieve(q)
        np.asarray(idx)
        lat.append(time.perf_counter() - t0)
    lat = np.sort(np.array(lat))

    # device-true per-query time: chain iterations via the query (data
    # dependence stops XLA hoisting), delta two scan lengths
    def chunks(q0, n):
        def body(carry, _):
            idx, dist = retrieve(carry)
            nxt = carry + 1e-9 * dist[:, :1]
            return nxt, idx[0, 0]
        _, outs = jax.lax.scan(body, q0, None, length=n)
        return outs

    lo, hi = 4, 36
    f_lo = jax.jit(lambda q: chunks(q, lo))
    f_hi = jax.jit(lambda q: chunks(q, hi))
    q0 = jnp.asarray(qs[:1])
    np.asarray(f_lo(q0)), np.asarray(f_hi(q0))  # compile
    t_lo = min(
        _walltime(lambda: np.asarray(f_lo(q0))) for _ in range(3)
    )
    t_hi = min(
        _walltime(lambda: np.asarray(f_hi(q0))) for _ in range(3)
    )
    device_ms = max(0.0, (t_hi - t_lo) / (hi - lo) * 1e3)
    return {
        "p50_ms": float(lat[int(0.50 * len(lat))] * 1e3),
        "p99_ms": float(lat[min(int(0.99 * len(lat)), len(lat) - 1)] * 1e3),
        "device_ms": float(device_ms),
    }


def _walltime(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0
