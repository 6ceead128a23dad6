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
from epcnet_tpu.train.state import TrainState, create_train_state
from epcnet_tpu.train.step import build_embed_fn, build_train_step
from epcnet_tpu.utils.logging import MetricsLogger, log_string
from epcnet_tpu.utils.profiling import profile_region


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        tuples: TrainingTuples,
        mesh: Mesh | None = None,
        checkpoints: bool = True,
    ):
        self.cfg = cfg
        self.tuples = tuples
        self.mesh = mesh
        self.step_fn = build_train_step(cfg.model, cfg.train)
        self.embed_fn = build_embed_fn(cfg.model)
        self.state: TrainState = create_train_state(cfg.model, cfg.train)
        self.loader = TupleLoader(
            tuples, cfg.data, cfg.train.batch_num_queries, seed=cfg.train.seed
        )
        self.mining = MiningCache(tuples, cfg.data, cfg.train, self.embed_fn)
        self.metrics = MetricsLogger(cfg.log_dir, "train", echo_every=0)
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
    def _device_batch(self, batch: dict) -> dict:
        if self._batch_shard is None:
            return {k: jnp.asarray(v) for k, v in batch.items() if k != "ids"}
        # device_put straight from host numpy with the target sharding —
        # no intermediate single-device copy.
        return {
            k: jax.device_put(
                v, NamedSharding(self.mesh, P("data", *[None] * (v.ndim - 1)))
            )
            for k, v in batch.items()
            if k != "ids"
        }

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
    def train(self, on_epoch_end=None) -> TrainState:
        """Epoch loop. Resume-aware: after ``maybe_restore()`` it re-enters at
        the restored epoch and discards the batches the interrupted epoch had
        already consumed (the loader order is (seed, epoch)-deterministic), so
        a killed-and-restarted run continues the uninterrupted run exactly —
        at epoch boundaries bit-for-bit; mid-epoch the data order realigns
        while the mining cache is rebuilt from current params."""
        cfg = self.cfg
        t_start = time.time()
        clouds_per_tuple = (
            1
            + cfg.data.num_positives
            + cfg.data.num_negatives
            + (1 if cfg.data.use_other_neg else 0)
        )
        start_epoch = int(self.state.epoch)
        resume_skip = int(self.state.step) - int(self.state.epoch_start_step)
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
            for batch in self.loader.epoch(epoch):
                if skip > 0:
                    skip -= 1  # consumed before the restart — replay past it
                    continue
                with profile_region("train_step"):
                    dev_batch = self._device_batch(batch)
                    self.state, m = self.step_fn(self.state, dev_batch)
                n_steps += 1
                step = int(self.state.step)
                if (
                    epoch >= cfg.train.mining_start_epoch
                    and step % cfg.train.mining_refresh_steps == 0
                ):
                    with profile_region("mining_refresh"):
                        self.mining.refresh(
                            self.state.params, self.state.batch_stats, self._batch_shard
                        )
                if step % cfg.train.log_every_steps == 0:
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
                if self.ckpt is not None and step % cfg.train.checkpoint_every_steps == 0:
                    self.ckpt.save(self.state)
            log_string(
                f"epoch {epoch}: {n_steps} steps, loss={float(m['loss']):.4f}, "
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
        return self.state
