"""Orbax checkpointing (SURVEY.md §5.3/§5.4).

Reference equivalent: ``tf.train.Saver().save(sess, LOG_DIR/model.ckpt)``
once per epoch, restore via a --restore flag [LINEAGE]. Upgrades: async
save every N steps, retention of the K most recent checkpoints, and the
FULL restart state (params, opt state, BN stats, step, data RNG seed) in one
pytree so resume is idempotent. The mining cache is recomputed on restart
(it is derived state — cheaper to rebuild than to serialize ~GBs of
latents at pod scale).
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp

from epcnet_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, state: TrainState) -> None:
        step = int(state.step)
        if step in (self._mgr.all_steps() or []):
            return  # already saved (e.g. epoch boundary == step multiple)
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "epoch": state.epoch,
            "epoch_start_step": state.epoch_start_step,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def restore(self, state: TrainState, require: bool = False) -> TrainState:
        """Restore the latest checkpoint into the (template) state.

        The payload carries (step, epoch, epoch_start_step); everything else
        is derived deterministically (data RNG keys are (seed, epoch)-hashed;
        the mining cache is rebuilt), so this pytree alone makes resume
        idempotent — the Trainer re-enters its epoch loop at ``epoch`` and
        skips ``step - epoch_start_step`` already-consumed batches.
        """
        step = self._mgr.latest_step()
        if step is None:
            if require:
                # evaluating / distilling / serving from RANDOM INIT is a
                # silent-garbage failure mode — demand a real checkpoint
                raise FileNotFoundError(
                    f"no checkpoint found under {self._mgr.directory} — "
                    "check the --log_dir / --teacher_log_dir path"
                )
            return state
        template = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "epoch": state.epoch,
            "epoch_start_step": state.epoch_start_step,
        }
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            epoch=restored["epoch"],
            epoch_start_step=restored["epoch_start_step"],
        )

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
