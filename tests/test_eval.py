"""Recall harness tests: hand-checkable recall math + end-to-end eval on
synthetic embeddings."""

import numpy as np
import pytest

from epcnet_tpu.configs import DataConfig, EvalConfig
from epcnet_tpu.evals import get_recall, retrieval_latency_probe


def test_get_recall_hand_case():
    # DB of 4 descriptors on a line; queries identical to db entries.
    db = np.eye(4, dtype=np.float32)
    q = db[[0, 1]].copy()
    gt = [[0], [2]]  # query0's gt is db0 (rank 1); query1's gt is db2 (not rank 1)
    recall, one_pct, n = get_recall(db, q, gt, top_k=3)
    assert n == 2
    assert recall[0] == pytest.approx(0.5)  # only query0 hits at rank 1
    assert recall[2] == pytest.approx(1.0)  # query1's gt appears by rank 3 (ties)
    # top-1% of a 4-entry db is k=1
    assert one_pct == pytest.approx(0.5)


def test_get_recall_skips_empty_gt():
    db = np.eye(3, dtype=np.float32)
    q = db.copy()
    recall, one_pct, n = get_recall(db, q, [[0], [], []], top_k=2)
    assert n == 1
    assert recall[0] == 1.0


def test_recall_monotone_nondecreasing(rng):
    db = rng.randn(50, 16).astype(np.float32)
    q = rng.randn(9, 16).astype(np.float32)
    gt = [[int(i)] for i in rng.randint(0, 50, 9)]
    recall, _, _ = get_recall(db, q, gt, top_k=10)
    assert (np.diff(recall) >= 0).all()


def test_latency_probe_returns_percentiles(rng):
    db = rng.randn(128, 32).astype(np.float32)
    out = retrieval_latency_probe(db, num_queries=10, top_k=5)
    assert out["p50_ms"] > 0 and out["p99_ms"] >= out["p50_ms"]
    assert out["device_ms"] >= 0  # dispatch-free scan-delta view


def test_latency_probe_sharded(rng, mesh8):
    db = rng.randn(512, 64).astype(np.float32)
    out = retrieval_latency_probe(db, num_queries=6, top_k=5, mesh=mesh8)
    assert out["p50_ms"] > 0 and out["device_ms"] >= 0


def test_get_recall_int8_matches_fp32(rng, mesh8):
    """quantize="int8" retrieval (the serving capacity format) reproduces
    the fp32 recall numbers on unit-norm descriptors — both unsharded and
    over the mesh — quantifying that the ~4e-4 dequantization error costs
    nothing at realistic descriptor margins."""
    db = rng.randn(60, 32).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[:12] + 0.01 * rng.randn(12, 32).astype(np.float32)
    gt = [[int(i)] for i in range(12)]
    ref, ref1, _ = get_recall(db, q, gt, top_k=5)
    for mesh in (None, mesh8):
        r, p1, n = get_recall(db, q, gt, top_k=5, mesh=mesh, quantize="int8")
        assert n == 12
        np.testing.assert_array_equal(r, ref)
        assert p1 == ref1
    with pytest.raises(ValueError, match="quantize"):
        get_recall(db, q, gt, top_k=5, quantize="int4")
