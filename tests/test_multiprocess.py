"""REAL multi-process integration tests (SURVEY.md §2.3 / §5.3 / §5.8).

Every other multi-device test in this suite runs in ONE process on a forced
8-device CPU platform; these spawn 2 (and 4) actual OS processes joined via
``jax.distributed`` + Gloo collectives — the single-machine analogue of a
multi-host TPU pod — and drive the REAL stack through tests/mp_worker.py:

- mesh construction over non-addressable devices,
- a DP Trainer run (grad psum across process boundaries, hard-negative
  mining sweep with the multi-host allgather path),
- Orbax checkpoint save from every process + fresh-template restore,
- sharded + ring retrieval vs a numpy oracle in every process,
- SIGTERM preemption: all processes receive the signal at skewed times,
  reach cross-process stop consensus, checkpoint cleanly, exit 0, and a
  respawned cluster resumes to the exact same final params as an
  uninterrupted multi-process run.

The workers force their own 2-local-CPU-device platform; this (pytest)
process never joins the cluster, so the suite's own jax config is unused
here.
"""

from __future__ import annotations

import json
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

# real OS-process clusters: minutes each — full-suite tier only
pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LAUNCH_TIMEOUT = 420  # cold jax import + CPU compile per worker


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mp_dataset(tmp_path_factory):
    from epcnet_tpu.data import generate_synthetic_dataset

    workdir = str(tmp_path_factory.mktemp("mp"))
    generate_synthetic_dataset(
        os.path.join(workdir, "data"), num_runs=3, submaps_per_run=30,
        num_points=128,
    )
    return workdir


def _spawn(nprocs: int, scenario: str, workdir: str, tag: str, *extra,
           env_extra: dict | None = None):
    port = _free_port()
    procs = []
    for pid in range(nprocs):
        cmd = [
            sys.executable, "-u", _WORKER, scenario,
            "--procid", str(pid), "--nprocs", str(nprocs),
            "--port", str(port), "--workdir", workdir, "--tag", tag, *extra,
        ]
        log_path = os.path.join(workdir, f"worker_{tag}_{pid}.log")
        log = open(log_path, "w")
        env = {**os.environ, "PYTHONPATH": _REPO_ROOT, **(env_extra or {})}
        procs.append(
            (
                subprocess.Popen(
                    cmd, stdout=log, stderr=subprocess.STDOUT, env=env
                ),
                log,
                log_path,
            )
        )
    return procs


def _join(procs, workdir: str, tag: str, timeout: float = _LAUNCH_TIMEOUT):
    deadline = time.time() + timeout
    for p, log, log_path in procs:
        try:
            rc = p.wait(timeout=max(1.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            for q, _, _ in procs:
                q.kill()
            raise AssertionError(
                f"worker cluster '{tag}' hung >{timeout}s — see "
                f"{workdir}/worker_{tag}_*.log"
            )
        finally:
            log.close()
        assert rc == 0, (
            f"worker exited rc={rc}: " + open(log_path).read()[-2000:]
        )
    results = []
    for pid in range(len(procs)):
        path = os.path.join(workdir, f"result_{tag}_{pid}.json")
        assert os.path.isfile(path), f"worker {pid} wrote no result"
        results.append(json.load(open(path)))
    return results


def _run_cluster(nprocs, scenario, workdir, tag, *extra, env_extra=None):
    return _join(
        _spawn(nprocs, scenario, workdir, tag, *extra, env_extra=env_extra),
        workdir, tag,
    )


# ---------------------------------------------------------------------------
@pytest.mark.parametrize("nprocs", [2, 4])
def test_multiprocess_train_checkpoint_roundtrip(mp_dataset, nprocs):
    """Full Trainer across process boundaries: DP grads psum over Gloo,
    mining sweep allgather, every process saving Orbax checkpoints, and a
    fresh-template restore returning identical params in every process."""
    tag = f"train{nprocs}"
    # all processes of the cluster share ONE persistent compile-cache dir —
    # the pod deployment pattern (entries are content-addressed; README
    # "Compile-once deployments"); min-secs 0 so tiny CPU compiles persist
    cache_dir = os.path.join(mp_dataset, f"xla_cache_{tag}")
    results = _run_cluster(
        nprocs, "train", mp_dataset, tag,
        "--log_subdir", f"log_{tag}", "--max_epoch", "2", "--mining_start", "1",
        env_extra={
            "EPCNET_COMPILATION_CACHE_DIR": cache_dir,
            "EPCNET_COMPILATION_CACHE_MIN_SECS": "0",
        },
    )
    assert os.listdir(cache_dir), "no shared compile-cache entries persisted"
    assert len(results) == nprocs
    for r in results:
        assert r["process_count"] == nprocs
        assert r["n_global_devices"] == 2 * nprocs
        assert r["n_local_devices"] == 2
        assert r["step"] > 0
    # replicated state: every process must hold bit-identical params
    sums = {r["checksum"] for r in results}
    assert len(sums) == 1, f"params diverged across processes: {sums}"
    steps = {r["step"] for r in results}
    assert len(steps) == 1
    # checkpoint round-trip (saved by all procs, restored into a fresh
    # template) reproduces the exact final state
    for r in results:
        assert r["roundtrip_step"] == r["step"]
        assert r["roundtrip_checksum"] == r["checksum"]
    # process-0-only metrics: one well-formed JSONL stream
    lines = open(
        os.path.join(mp_dataset, f"log_{tag}", "train.jsonl")
    ).read().splitlines()
    assert lines and all(json.loads(ln) for ln in lines)


def test_multiprocess_sharded_and_ring_retrieval(mp_dataset):
    """Sharded + ring-topk retrieval across 2 processes matches the local
    numpy oracle in every process (the ICI/DCN merge path over real Gloo)."""
    results = _run_cluster(2, "retrieval", mp_dataset, "retr")
    for r in results:
        assert r["sharded_ok"] is True
        assert r["ring_ok"] is True
        # int8-quantized DB shards (serving capacity format) merge exactly
        assert r["sharded_int8_ok"] is True
        # the full PlaceIndex (incremental sharded adds + int8 residency)
        # serves exactly across the same process boundaries
        assert r["place_index_mp_ok"] is True
        # points-sharded embed (ring kNN + all_gather ProxyConv + psum VLAD)
        # reproduces the single-device descriptor across process boundaries
        assert r["points_sharded_ok"] is True
        # ... and its training step's pmean-completed gradients match the
        # dense single-process gradients
        assert r["points_sharded_grad_ok"] is True


def test_multiprocess_preemption_resumes_exactly(mp_dataset):
    """SIGTERM all workers mid-run: cross-process stop consensus, clean
    checkpoint, exit 0; a respawned cluster resumes and finishes with the
    SAME final params as an uninterrupted multi-process run."""
    nprocs = 2
    # uninterrupted reference (mining off: the cache is rebuilt from
    # restored params on resume, which legitimately perturbs negative
    # choices — same contract as test_preempted_training_resumes_exactly)
    ref = _run_cluster(
        nprocs, "train", mp_dataset, "ref",
        "--log_subdir", "log_ref", "--max_epoch", "3",
    )

    procs = _spawn(
        nprocs, "train", mp_dataset, "pre",
        "--log_subdir", "log_pre", "--max_epoch", "3", "--guard",
    )
    # wait until training demonstrably runs (metrics line => guard installed)
    jsonl = os.path.join(mp_dataset, "log_pre", "train.jsonl")
    deadline = time.time() + _LAUNCH_TIMEOUT
    while time.time() < deadline:
        if os.path.isfile(jsonl) and os.path.getsize(jsonl) > 0:
            break
        if any(p.poll() is not None for p, _, _ in procs):
            break  # finished before we could preempt — fail below
        time.sleep(0.2)
    assert os.path.isfile(jsonl) and os.path.getsize(jsonl) > 0, (
        "training never logged a step"
    )
    for p, _, _ in procs:
        p.send_signal(signal.SIGTERM)
    pre = _join(procs, mp_dataset, "pre")
    assert all(r["preempted"] for r in pre)
    stopped = {r["step"] for r in pre}
    assert len(stopped) == 1, f"stop consensus failed: {stopped}"
    final_ref = {r["step"] for r in ref}.pop()
    assert 0 < stopped.pop() < final_ref

    res = _run_cluster(
        nprocs, "train", mp_dataset, "res",
        "--log_subdir", "log_pre", "--max_epoch", "3", "--restore",
    )
    assert all(r["restored_step"] > 0 for r in res)
    assert {r["step"] for r in res} == {final_ref}
    ref_sum = {r["checksum"] for r in ref}.pop()
    res_sum = {r["checksum"] for r in res}.pop()
    assert res_sum == pytest.approx(ref_sum, rel=1e-6), (
        f"resumed params diverged: {res_sum} vs {ref_sum}"
    )
