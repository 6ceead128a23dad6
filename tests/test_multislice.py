"""Multi-slice mesh construction, distributed bootstrap no-op, and
preemption-safe training (SURVEY.md §5.3 / §5.8; parallel/multislice.py)."""

import dataclasses
import os
import signal
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epcnet_tpu.configs import DataConfig, ExperimentConfig, MeshConfig, TrainConfig
from epcnet_tpu.data.tuples import construct_query_dict, scan_runs
from epcnet_tpu.parallel import (
    PreemptionGuard,
    make_mesh,
    make_multislice_mesh,
    maybe_initialize_distributed,
    slice_groups,
)
from epcnet_tpu.train import Trainer


def _exp_cfg(synthetic_root, tiny_model_cfg, **train_kw):
    tkw = dict(
        batch_num_queries=2, max_epoch=1, learning_rate=1e-3,
        mining_start_epoch=99, log_every_steps=5, checkpoint_every_steps=10**6,
    )
    tkw.update(train_kw)
    return ExperimentConfig(
        model=tiny_model_cfg,
        data=DataConfig(dataset_root=synthetic_root, num_points=128,
                        num_negatives=4, num_positives=2),
        train=TrainConfig(**tkw),
        log_dir=tempfile.mkdtemp(),
    )


# ---------------------------------------------------------------- meshes
def test_single_slice_falls_back_to_make_mesh():
    """CPU devices expose no slice_index -> one group -> identical mesh."""
    ms = make_multislice_mesh(MeshConfig())
    plain = make_mesh(MeshConfig())
    assert ms.axis_names == plain.axis_names
    assert [d.id for d in ms.devices.flat] == [d.id for d in plain.devices.flat]


def test_multislice_mesh_is_slice_major():
    """With a synthetic 2-slice assignment the data axis must be slice-major:
    all of slice 0's devices before slice 1's (the DCN-domain ordering XLA
    needs to emit hierarchical collectives)."""
    # interleave slices by device id parity — the mesh must UNDO this
    fn = lambda d: d.id % 2
    mesh = make_multislice_mesh(MeshConfig(), slice_index_fn=fn)
    assert mesh.devices.shape == (8, 1)
    ids = [d.id for d in mesh.devices.flat]
    assert ids == [0, 2, 4, 6, 1, 3, 5, 7]  # slice 0 block, then slice 1
    groups = slice_groups(jax.devices(), fn)
    assert [len(g) for g in groups] == [4, 4]


def test_multislice_mesh_db_axis_stays_intra_slice():
    fn = lambda d: d.id // 4  # slices {0..3}, {4..7}
    mesh = make_multislice_mesh(
        MeshConfig(data_axis=-1, db_axis=2), slice_index_fn=fn
    )
    assert mesh.devices.shape == (4, 2)
    # each db row (pair) must come from one slice
    for row in mesh.devices:
        assert len({d.id // 4 for d in row}) == 1


def test_retrieval_db_axis_caps_at_slice_size():
    """serve/evaluate --mesh default the db axis via retrieval_db_axis: on a
    multi-slice platform it must return the PER-SLICE device count (db stays
    intra-slice), and building the mesh with it must succeed — defaulting to
    ALL devices used to crash make_multislice_mesh on any multi-slice pod."""
    from epcnet_tpu.parallel import retrieval_db_axis

    fn = lambda d: d.id // 4  # synthetic 2 slices x 4 devices
    assert retrieval_db_axis(slice_index_fn=fn) == 4
    mesh = make_multislice_mesh(
        MeshConfig(data_axis=-1, db_axis=retrieval_db_axis(slice_index_fn=fn)),
        slice_index_fn=fn,
    )
    assert mesh.devices.shape == (2, 4)
    for row in mesh.devices:  # each db row comes from exactly one slice
        assert len({d.id // 4 for d in row}) == 1
    # single slice (CPU default): every device lands on db
    assert retrieval_db_axis() == len(jax.devices())


def test_multislice_mesh_rejects_ragged_slices():
    fn = lambda d: 0 if d.id < 3 else 1  # 3 + 5 devices
    with pytest.raises(ValueError, match="unequal"):
        make_multislice_mesh(MeshConfig(), slice_index_fn=fn)


def test_multislice_dp_train_step_runs(synthetic_root, tiny_model_cfg):
    """A DP train step over the slice-major mesh compiles and runs — the
    slice-major device order must be invisible to the sharding layer."""
    tt = construct_query_dict(scan_runs(synthetic_root), exclude_test_regions=False)
    mesh = make_multislice_mesh(MeshConfig(), slice_index_fn=lambda d: d.id // 4)
    cfg = _exp_cfg(
        synthetic_root, tiny_model_cfg, max_epoch=1, batch_num_queries=8
    )
    tr = Trainer(cfg, tt, mesh=mesh, checkpoints=False)
    state = tr.train()
    assert int(state.step) > 0
    assert np.isfinite(
        float(jax.tree_util.tree_leaves(state.params)[0].sum())
    )


# ---------------------------------------------- distributed bootstrap
def test_maybe_initialize_distributed_is_noop_single_process(monkeypatch):
    for var in ("EPCNET_COORDINATOR_ADDRESS", "EPCNET_NUM_PROCESSES",
                "EPCNET_PROCESS_ID", "EPCNET_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize_distributed() is False
    monkeypatch.setenv("EPCNET_NUM_PROCESSES", "1")
    assert maybe_initialize_distributed() is False


def test_maybe_initialize_distributed_dispatch(monkeypatch):
    """EPCNET_* env vars route into jax.distributed.initialize with the
    right arguments; EPCNET_DISTRIBUTED=1 alone uses no-arg auto-detection."""
    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda *a, **kw: calls.append((a, kw)),
    )
    for var in ("EPCNET_COORDINATOR_ADDRESS", "EPCNET_NUM_PROCESSES",
                "EPCNET_PROCESS_ID", "EPCNET_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)

    monkeypatch.setenv("EPCNET_DISTRIBUTED", "1")
    assert maybe_initialize_distributed() is True
    assert calls[-1] == ((), {})  # pod auto-detection form

    monkeypatch.setenv("EPCNET_COORDINATOR_ADDRESS", "10.0.0.1:8476")
    monkeypatch.setenv("EPCNET_NUM_PROCESSES", "4")
    monkeypatch.setenv("EPCNET_PROCESS_ID", "2")
    assert maybe_initialize_distributed() is True
    assert calls[-1][1] == {
        "coordinator_address": "10.0.0.1:8476",
        "num_processes": 4,
        "process_id": 2,
    }


# ---------------------------------------------------------- preemption
def test_preemption_guard_catches_sigterm_and_restores_handler():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard(signals=(signal.SIGTERM,)) as guard:
        assert guard() is False
        os.kill(os.getpid(), signal.SIGTERM)  # delivered synchronously (same thread)
        assert guard() is True
    assert signal.getsignal(signal.SIGTERM) is before


def test_preempted_training_resumes_exactly(synthetic_root, tiny_model_cfg):
    """Preempt after a few dispatches -> trainer checkpoints and returns;
    --restore continues to the same final params as an uninterrupted run
    (the §5.3 preemption contract at Trainer level)."""
    tt = construct_query_dict(scan_runs(synthetic_root), exclude_test_regions=False)

    cfg_a = _exp_cfg(synthetic_root, tiny_model_cfg, max_epoch=1)
    sa = Trainer(cfg_a, tt, checkpoints=False).train()

    cfg_b = _exp_cfg(synthetic_root, tiny_model_cfg, max_epoch=1)
    tr_b = Trainer(cfg_b, tt)
    fired = {"n": 0}

    def preempt_after_6():
        fired["n"] += 1
        return fired["n"] > 6

    sb = tr_b.train(should_stop=preempt_after_6)
    stopped_at = int(sb.step)
    assert 0 < stopped_at < int(sa.step)

    tr_c = Trainer(cfg_b, tt)  # "fresh process", same log_dir
    assert tr_c.maybe_restore() == stopped_at
    sc = tr_c.train()
    assert int(sc.step) == int(sa.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(sa.params), jax.tree_util.tree_leaves(sc.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
