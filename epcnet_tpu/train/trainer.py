"""The training driver loop.

Reference equivalent: train.py train() / train_one_epoch() [LINEAGE;
SURVEY.md §3.1]: epoch loop over shuffled tuples, periodic hard-negative
mining sweeps, Adam + exp-decayed LR + BN-decay schedule, per-epoch
checkpoints, scalar logging.

TPU-native deltas: async prefetched loader (host IO overlaps device
compute), batch device_put with the leading axis sharded over the mesh's
"data" axis (GSPMD DP — one code path from 1 chip to a pod), jitted mining
sweep, Orbax async checkpoints, JSONL metrics.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from epcnet_tpu.configs import ExperimentConfig
from epcnet_tpu.data.loader import TupleLoader
from epcnet_tpu.data.tuples import TrainingTuples
from epcnet_tpu.train.checkpoint import CheckpointManager
from epcnet_tpu.train.mining import MiningCache
import numpy as np

from epcnet_tpu.train.state import TrainState, create_train_state
from epcnet_tpu.train.step import (
    build_embed_fn,
    build_multi_train_step,
    build_train_step,
)
from epcnet_tpu.utils.logging import MetricsLogger, log_string
from epcnet_tpu.utils.profiling import profile_region


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        tuples: TrainingTuples,
        mesh: Mesh | None = None,
        checkpoints: bool = True,
        step_fn=None,
        metrics_name: str = "train",
    ):
        """``step_fn``: optional custom jitted ``(state, batch) -> (state,
        metrics)`` — e.g. a distillation step with the teacher bound — in
        place of the standard quadruplet step. The full Trainer feature set
        (resume, preemption, mesh DP, mining, TB metrics) applies to it;
        ``steps_per_dispatch`` fusion only supports the standard step."""
        if "quadruplet" in cfg.train.loss and not cfg.data.use_other_neg:
            raise ValueError(
                f"train.loss={cfg.train.loss!r} needs the tuple's fourth "
                "element: set data.use_other_neg=true (or pick a triplet "
                "loss) — failing fast instead of a KeyError('other_neg') "
                "inside the first jitted step"
            )
        self.cfg = cfg
        self.tuples = tuples
        self.mesh = mesh
        self.step_fn = (
            step_fn if step_fn is not None else build_train_step(cfg.model, cfg.train)
        )
        self.multi_step_fn = (
            build_multi_train_step(cfg.model, cfg.train)
            if cfg.train.steps_per_dispatch > 1 and step_fn is None
            else None
        )
        self.embed_fn = build_embed_fn(cfg.model)
        self.state: TrainState = create_train_state(cfg.model, cfg.train)
        self.loader = TupleLoader(
            tuples, cfg.data, cfg.train.batch_num_queries, seed=cfg.train.seed
        )
        self.mining = MiningCache(tuples, cfg.data, cfg.train, self.embed_fn)
        self.metrics = MetricsLogger(
            cfg.log_dir, metrics_name, echo_every=0,
            tensorboard=cfg.train.tensorboard,
            # multi-process runs share one log_dir: only process 0 writes
            primary=jax.process_index() == 0,
        )
        self.ckpt = (
            CheckpointManager(f"{cfg.log_dir}/ckpt", cfg.train.keep_checkpoints)
            if checkpoints
            else None
        )
        if self.mesh is not None:
            self._batch_shard = NamedSharding(self.mesh, P("data"))
            self._repl = NamedSharding(self.mesh, P())
            self.state = jax.device_put(self.state, self._repl)
        else:
            self._batch_shard = None
            self._repl = None

    # ------------------------------------------------------------------
    def _device_batch(self, batch: dict, stacked: bool = False) -> dict:
        if self._batch_shard is None:
            return {k: jnp.asarray(v) for k, v in batch.items() if k != "ids"}
        # device_put straight from host numpy with the target sharding —
        # no intermediate single-device copy. For a [S, B, ...] multi-step
        # stack the DP axis is axis 1 (axis 0 is the scan axis).
        lead = (None, "data") if stacked else ("data",)
        return {
            k: jax.device_put(
                v,
                NamedSharding(self.mesh, P(*lead, *[None] * (v.ndim - len(lead)))),
            )
            for k, v in batch.items()
            if k != "ids"
        }

    def _dispatch(self, batches: list) -> dict:
        """Run len(batches) train steps in ONE device dispatch."""
        if len(batches) == 1:
            self.state, m = self.step_fn(self.state, self._device_batch(batches[0]))
            return m
        stacked = {
            k: np.stack([b[k] for b in batches])
            for k in batches[0]
            if k != "ids"
        }
        self.state, m = self.multi_step_fn(
            self.state, self._device_batch(stacked, stacked=True)
        )
        return m

    def maybe_restore(self) -> int:
        if self.ckpt is not None:
            self.state = self.ckpt.restore(self.state)
        return int(self.state.step)

    def _mark_epoch(self, epoch: int) -> None:
        """Record (epoch, step-at-epoch-start) in the state so checkpoints
        carry resume position (SURVEY.md §5.3)."""
        e = jnp.asarray(epoch, jnp.int32)
        if self._repl is not None:
            e = jax.device_put(e, self._repl)
        self.state = self.state.replace(epoch=e, epoch_start_step=self.state.step)

    # ------------------------------------------------------------------
    def train(self, on_epoch_end=None, should_stop=None) -> TrainState:
        """Epoch loop. Resume-aware: after ``maybe_restore()`` it re-enters at
        the restored epoch and the loader fast-forwards past the batches the
        interrupted epoch had already consumed — from metadata alone, no
        file IO (the loader order is (seed, epoch)-deterministic;
        TupleLoader.epoch skip_batches) — so a killed-and-restarted run
        continues the uninterrupted run exactly: at epoch boundaries
        bit-for-bit; mid-epoch the data order realigns while the mining
        cache is rebuilt from current params.

        ``should_stop`` (e.g. a ``parallel.PreemptionGuard``) is polled after
        every dispatch; when it fires, the loop checkpoints and returns early
        — a SIGTERM preemption becomes a clean resumable save (SURVEY.md
        §5.3) instead of a killed step."""
        cfg = self.cfg
        t_start = time.time()
        if should_stop is not None and jax.process_count() > 1:
            # Multi-process preemption consensus: SIGTERM delivery timing
            # skews across processes, and a process that stops one dispatch
            # later than its peers enters a collective the others never join
            # (a silent distributed hang). Every process contributes its
            # local flag and ALL stop at the same dispatch boundary.
            #
            # The allgather is a blocking host-sync collective, so running it
            # after EVERY dispatch would serialize the async-dispatch
            # pipeline steady-state. Poll every K dispatches instead: the
            # counter advances identically on every process (same loop
            # structure — the alignment the consensus already relies on), so
            # the collectives stay matched, and a preemption is acted on
            # within a bounded K-dispatch skew (SIGTERM grace periods are
            # seconds-to-minutes; K dispatches are milliseconds).
            from jax.experimental import multihost_utils

            local_stop = should_stop
            poll_every = 8
            consensus = {"calls": 0, "stop": False}

            def should_stop():
                if consensus["stop"]:
                    return True
                consensus["calls"] += 1
                if consensus["calls"] % poll_every:
                    return False
                flags = multihost_utils.process_allgather(
                    np.asarray(local_stop(), np.int32)
                )
                consensus["stop"] = bool(np.max(flags) > 0)
                return consensus["stop"]

        clouds_per_tuple = (
            1
            + cfg.data.num_positives
            + cfg.data.num_negatives
            + (1 if cfg.data.use_other_neg else 0)
        )
        start_epoch = int(self.state.epoch)
        # the one deliberate host sync: everything after tracks the step
        # counter host-side (each dispatch advances it by len(batches))
        host_step = int(self.state.step)
        resume_skip = host_step - int(self.state.epoch_start_step)
        for epoch in range(start_epoch, cfg.train.max_epoch):
            skip = resume_skip if epoch == start_epoch else 0
            if skip == 0:
                self._mark_epoch(epoch)
            if epoch >= cfg.train.mining_start_epoch:
                with profile_region("mining_refresh"):
                    self.mining.refresh(
                        self.state.params, self.state.batch_stats, self._batch_shard
                    )
                    self.mining.attach(self.loader)
            n_steps = 0
            m = {"loss": float("nan")}  # stays if the epoch yields no batches
            t_epoch = time.time()
            s_per = (
                max(1, cfg.train.steps_per_dispatch)
                if self.multi_step_fn is not None
                else 1
            )

            def crossed(prev: int, cur: int, every: int) -> bool:
                # a multiple of `every` lies in (prev, cur] — the dispatch-
                # granularity generalization of `cur % every == 0`
                return cur // every > prev // every

            def post_dispatch(prev_step: int, step: int, metrics_m: dict) -> None:
                # `step` is the HOST-mirrored counter (prev + batches
                # dispatched): reading int(self.state.step) here would be a
                # per-dispatch host sync on the step's output, serializing
                # the async-dispatch pipeline the consensus comment above is
                # careful to keep unserialized — the device would idle
                # through every dispatch enqueue
                nonlocal m
                m = metrics_m
                if (
                    epoch >= cfg.train.mining_start_epoch
                    and crossed(prev_step, step, cfg.train.mining_refresh_steps)
                ):
                    with profile_region("mining_refresh"):
                        self.mining.refresh(
                            self.state.params, self.state.batch_stats, self._batch_shard
                        )
                if crossed(prev_step, step, cfg.train.log_every_steps):
                    dt = time.time() - t_epoch
                    tput = (
                        n_steps
                        * cfg.train.batch_num_queries
                        * clouds_per_tuple
                        / max(dt, 1e-9)
                    )
                    self.metrics.write(
                        step, m, epoch=epoch, submaps_per_sec=round(tput, 2)
                    )
                if self.ckpt is not None and crossed(
                    prev_step, step, cfg.train.checkpoint_every_steps
                ):
                    self.ckpt.save(self.state)

            preempted = False
            batches_seen = 0
            pending: list = []
            # mid-epoch resume: the loader fast-forwards past the batches the
            # interrupted run consumed from METADATA alone (no file IO) —
            # stream-exact, see TupleLoader.epoch
            for batch in self.loader.epoch(epoch, skip_batches=skip):
                batches_seen += 1
                pending.append(batch)
                if len(pending) == s_per:
                    prev = host_step
                    with profile_region("train_step"):
                        mm = self._dispatch(pending)
                    n_steps += len(pending)
                    host_step += len(pending)
                    pending = []
                    post_dispatch(prev, host_step, mm)
                    if should_stop is not None and should_stop():
                        preempted = True
                        break
            if not preempted:
                for batch in pending:  # epoch-tail remainder: single-step shape
                    prev = host_step
                    with profile_region("train_step"):
                        mm = self._dispatch([batch])
                    n_steps += 1
                    host_step += 1
                    post_dispatch(prev, host_step, mm)
                    if should_stop is not None and should_stop():
                        preempted = True
                        break
            if preempted:
                self.loader.stop()  # unblock the producer thread + pool
                step = int(self.state.step)
                if self.ckpt is not None:
                    self.ckpt.save(self.state)
                    self.ckpt.wait()
                self.metrics.flush()
                log_string(
                    f"preemption requested: checkpointed at step {step} "
                    f"(epoch {epoch}) and stopping — resume with --restore"
                )
                return self.state
            batches_seen += getattr(self.loader, "skipped_batches", 0)
            if n_steps:
                loss_txt = f"loss={float(m['loss']):.4f}"
            elif batches_seen:
                loss_txt = "no new batches (already consumed before restart)"
            else:
                loss_txt = ("0 usable tuples (check data.num_positives/"
                            "num_negatives vs the dataset's pools)")
            log_string(
                f"epoch {epoch}: {n_steps} steps, {loss_txt}, "
                f"{time.time() - t_epoch:.1f}s"
            )
            # advance the marker BEFORE saving: an epoch-boundary checkpoint
            # resumes straight into the next epoch (no replay-and-skip pass)
            self._mark_epoch(epoch + 1)
            if self.ckpt is not None:
                self.ckpt.save(self.state)
            if on_epoch_end is not None:
                on_epoch_end(self, epoch)
        log_string(f"training done in {time.time() - t_start:.1f}s")
        if self.ckpt is not None:
            self.ckpt.wait()
        self.metrics.flush()
        return self.state
