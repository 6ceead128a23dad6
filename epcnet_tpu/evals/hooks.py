"""Trainer epoch hooks built on the eval stack.

``make_recall_eval_hook`` gives any Trainer-driven CLI (train, distill) the
in-training recall@1 evaluation + best-checkpoint retention behaviour
(SURVEY.md §5.3 "best-recall retention"): every N epochs, embed the
dataset's test sets with the current params, log recall@1, and keep the
best-scoring checkpoint in ``<log_dir>/ckpt_best``.
"""

from __future__ import annotations

import json
import os
import shutil

import jax

from epcnet_tpu.data.tuples import (
    any_in_test_regions,
    construct_query_and_database_sets,
    scan_runs,
)
from epcnet_tpu.evals.recall import evaluate_region
from epcnet_tpu.train.checkpoint import CheckpointManager
from epcnet_tpu.utils.logging import log_string


def make_recall_eval_hook(cfg, mesh, every_epochs: int, df=None, resumed=False):
    """Build (on_epoch_end, finalize) for ``Trainer.train``.

    ``on_epoch_end(trainer, epoch)`` runs the recall eval every
    ``every_epochs`` epochs and retains the best checkpoint;
    ``finalize()`` drains the async best-checkpoint save. Returns
    ``(None, no-op)`` when ``every_epochs`` <= 0.

    The best score persists in ``<log_dir>/best_recall.json`` so a
    preempted-and-RESUMED run (``resumed=True``, i.e. --restore) cannot
    overwrite ``ckpt_best`` with a worse checkpoint (SURVEY.md §5.3). A
    fresh run in a reused log_dir starts from scratch — a stale best from
    an earlier run must not silently suppress the new run's retention.
    ``df``: pass the already-scanned runs DataFrame to skip a second
    dataset walk.
    """
    if every_epochs <= 0:
        return None, (lambda: None)

    if df is None:
        df = scan_runs(cfg.data.dataset_root, cfg.data.runs_subdir)
    db_sets, q_sets = construct_query_and_database_sets(
        df, cfg.data.test_positive_radius_m,
        only_test_regions=any_in_test_regions(df),
    )
    best_dir = os.path.join(cfg.log_dir, "ckpt_best")
    best_path = os.path.join(cfg.log_dir, "best_recall.json")
    # Multi-process: the log_dir is shared, so plain-file mutations
    # (best_recall.json, rmtree) must run on ONE process — every process
    # racing os.remove turns into FileNotFoundError on the losers and a
    # distributed hang when they die before the next collective. The
    # checkpoint saves themselves stay collective (all processes call
    # best_mgr.save; Orbax coordinates).
    primary = jax.process_index() == 0
    best = {"recall": -1.0}
    if resumed:
        if os.path.isfile(best_path):
            best["recall"] = float(json.load(open(best_path))["recall_at_1"])
            log_string(
                f"best-recall retention resumes at {100 * best['recall']:.2f}%"
            )
    elif primary:
        # Fresh run: retire the previous run's best — BOTH the score file
        # and the checkpoint itself, UNCONDITIONALLY (an orphaned ckpt_best
        # whose score file was lost mid-write would otherwise survive). A
        # deterministic rerun hits the same step numbers, and
        # CheckpointManager.save skips step collisions, so a surviving old
        # ckpt_best would masquerade as the new best.
        if os.path.isfile(best_path):
            os.remove(best_path)
        shutil.rmtree(best_dir, ignore_errors=True)
    best_mgr = CheckpointManager(best_dir, keep=1)

    def on_epoch_end(tr, epoch):
        if (epoch + 1) % every_epochs:
            return
        m = evaluate_region(
            tr.embed_fn, tr.state.params, tr.state.batch_stats,
            db_sets, q_sets, cfg.data, cfg.eval, mesh,
        )
        r1 = float(m["recall_at"][0])
        tr.metrics.write(int(tr.state.step), {"eval_recall_at_1": r1},
                         epoch=epoch)
        log_string(f"epoch {epoch}: eval recall@1={100 * r1:.2f}%")
        if r1 > best["recall"]:
            best["recall"] = r1
            # r1 comes from the same deterministic eval on every process, so
            # this branch is taken consistently and the save stays collective
            best_mgr.save(tr.state)
            if primary:
                with open(best_path, "w") as f:
                    json.dump({"recall_at_1": r1, "step": int(tr.state.step)}, f)
                log_string(f"new best recall@1 -> {cfg.log_dir}/ckpt_best")

    return on_epoch_end, best_mgr.wait
