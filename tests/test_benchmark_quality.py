"""Quality benchmark that can FAIL (VERDICT r2 #2; SURVEY.md §4).

The clean-label synthetic fixture saturates at recall@1 = 100% for any
trained model, so it cannot catch a training-quality regression. The
``difficulty`` dial (data/synthetic.py) adds per-visit heading rotation,
blob occlusion, and resampling — calibrated (this file pins the CPU-scale
band; BASELINE.md pins the hardware-scale table) so that:

- an untrained model sits near chance,
- a trained model lands clearly above it but BELOW saturation,

which restores the reference's de-facto regression signal (recall tables,
SURVEY.md §4) in CI form. Measured calibration on this exact config
(8-device CPU, seed 1234): untrained 19.6%, trained-6-epochs 50.0%,
trained-14-epochs 59.2% — the assertion band leaves ~10 recall points of
slack for cross-platform numeric drift while still failing on any
structural regression (a model that stops learning, an eval that goes to
chance, a loader that breaks label alignment).
"""

from __future__ import annotations

import tempfile

import numpy as np
import pytest

from epcnet_tpu.configs import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from epcnet_tpu.data.synthetic import generate_synthetic_dataset
from epcnet_tpu.data.tuples import (
    construct_query_and_database_sets,
    construct_query_dict,
    scan_runs,
)
from epcnet_tpu.evals.recall import evaluate_region
from epcnet_tpu.train import Trainer

_NPTS = 256
_DIFFICULTY = 0.5


@pytest.fixture(scope="module")
def benchmark_root():
    root = tempfile.mkdtemp(prefix="epcnet_bench_")
    generate_synthetic_dataset(
        root, num_runs=3, submaps_per_run=40, num_points=_NPTS,
        difficulty=_DIFFICULTY,
    )
    return root


def test_difficulty_perturbs_visits_not_labels(benchmark_root):
    """difficulty>0: revisits of one place differ per visit (rotation /
    occlusion / resampling) while easy-mode revisits are near-identical —
    and the CSV trajectory (the labels) is identical in both modes."""
    import os

    import pandas as pd

    easy = tempfile.mkdtemp(prefix="epcnet_easy_")
    generate_synthetic_dataset(easy, num_runs=2, submaps_per_run=6,
                               num_points=_NPTS, difficulty=0.0)
    hard = tempfile.mkdtemp(prefix="epcnet_hard_")
    generate_synthetic_dataset(hard, num_runs=2, submaps_per_run=6,
                               num_points=_NPTS, difficulty=1.0)

    def load(root, run, s):
        path = os.path.join(root, "oxford", f"run_{run:02d}",
                            "pointcloud_20m_10overlap", f"{run:02d}{s:06d}.bin")
        return np.fromfile(path, np.float64).reshape(-1, 3)

    # same place, two runs: easy-mode visits nearly coincide pointwise
    d_easy = np.abs(load(easy, 0, 0) - load(easy, 1, 0)).mean()
    d_hard = np.abs(load(hard, 0, 0) - load(hard, 1, 0)).mean()
    assert d_easy < 0.05
    assert d_hard > 5 * d_easy  # visits genuinely differ
    for root in (easy, hard):
        df = pd.read_csv(os.path.join(
            root, "oxford", "run_00",
            "pointcloud_locations_20m_10overlap.csv",
        ))
        assert len(df) == 6
    # trajectories (labels) identical across modes
    a = pd.read_csv(os.path.join(easy, "oxford", "run_00",
                                 "pointcloud_locations_20m_10overlap.csv"))
    b = pd.read_csv(os.path.join(hard, "oxford", "run_00",
                                 "pointcloud_locations_20m_10overlap.csv"))
    assert np.allclose(a[["northing", "easting"]], b[["northing", "easting"]])


@pytest.mark.slow
def test_trained_model_beats_untrained_with_headroom(benchmark_root):
    """The regression band: untrained near chance, trained well above it
    and below saturation. A training-quality regression (dead loss, broken
    mining, label misalignment) lands outside this band and FAILS."""
    df = scan_runs(benchmark_root)
    tt = construct_query_dict(df, exclude_test_regions=False)
    db_sets, q_sets = construct_query_and_database_sets(
        df, 25.0, only_test_regions=False
    )
    model = ModelConfig(
        num_points=_NPTS, knn_k=8, use_pallas=False,
        proxyconv_channels=(16, 16), lift_channels=(32, 64), feature_dim=64,
        vlad_clusters=8, vlad_groups=4, vlad_group_dim=16,
    )
    cfg = ExperimentConfig(
        model=model,
        data=DataConfig(dataset_root=benchmark_root, num_points=_NPTS,
                        num_negatives=6, num_positives=2),
        train=TrainConfig(batch_num_queries=8, max_epoch=6,
                          learning_rate=1e-3, mining_start_epoch=3,
                          mining_refresh_steps=200, log_every_steps=1000,
                          checkpoint_every_steps=10**6),
        log_dir=tempfile.mkdtemp(),
    )
    trainer = Trainer(cfg, tt, checkpoints=False)
    untrained = evaluate_region(
        trainer.embed_fn, trainer.state.params, trainer.state.batch_stats,
        db_sets, q_sets, cfg.data, cfg.eval, None,
    )
    state = trainer.train()
    trained = evaluate_region(
        trainer.embed_fn, state.params, state.batch_stats,
        db_sets, q_sets, cfg.data, cfg.eval, None,
    )
    r_un = float(untrained["recall_at"][0])
    r_tr = float(trained["recall_at"][0])
    # calibrated band (module docstring): measured 0.196 / 0.500
    assert r_un <= 0.32, f"untrained recall@1 {r_un:.3f} suspiciously high"
    assert r_tr >= 0.40, f"trained recall@1 {r_tr:.3f} regressed below band"
    assert r_tr < 1.0, "benchmark saturated — difficulty dial broken"
    assert r_tr - r_un >= 0.10, (
        f"training no longer separates from chance: {r_tr:.3f} vs {r_un:.3f}"
    )


@pytest.mark.slow
def test_seed_variance_stays_inside_regression_band(benchmark_root):
    """CI twin of scripts/hw_multiseed.py (VERDICT r3 missing #2): the
    regression band is only meaningful if seed-to-seed variance is small
    relative to it. Train the SAME protocol at three train seeds (init +
    shuffle + augmentation all key off train.seed) and require every seed
    inside the band and the spread well under the band's width.

    Calibrated on this exact config (8-device CPU, 2026-08-19): seeds
    (1234, 7, 2024) -> recall@1 (0.479, 0.513, 0.400); spread 0.113.
    Untrained sits at ~0.196 at this scale, so a 0.35 floor still fails
    any seed that stops learning while clearing the measured worst seed
    by 5 points; the 0.18 spread ceiling is the measured spread + ~6
    points of cross-platform slack."""
    df = scan_runs(benchmark_root)
    tt = construct_query_dict(df, exclude_test_regions=False)
    db_sets, q_sets = construct_query_and_database_sets(
        df, 25.0, only_test_regions=False
    )
    model = ModelConfig(
        num_points=_NPTS, knn_k=8, use_pallas=False,
        proxyconv_channels=(16, 16), lift_channels=(32, 64), feature_dim=64,
        vlad_clusters=8, vlad_groups=4, vlad_group_dim=16,
    )
    recalls = {}
    for seed in (1234, 7, 2024):
        cfg = ExperimentConfig(
            model=model,
            data=DataConfig(dataset_root=benchmark_root, num_points=_NPTS,
                            num_negatives=6, num_positives=2),
            train=TrainConfig(batch_num_queries=8, max_epoch=6,
                              learning_rate=1e-3, mining_start_epoch=3,
                              mining_refresh_steps=200, log_every_steps=1000,
                              checkpoint_every_steps=10**6, seed=seed),
            log_dir=tempfile.mkdtemp(),
        )
        trainer = Trainer(cfg, tt, checkpoints=False)
        state = trainer.train()
        res = evaluate_region(
            trainer.embed_fn, state.params, state.batch_stats,
            db_sets, q_sets, cfg.data, cfg.eval, None,
        )
        recalls[seed] = float(res["recall_at"][0])
    vals = sorted(recalls.values())
    spread = vals[-1] - vals[0]
    assert all(v >= 0.35 for v in vals), (
        f"a seed fell out of the regression band: {recalls}"
    )
    assert spread <= 0.18, (
        f"seed-to-seed spread {spread:.3f} exceeds the band's slack: "
        f"{recalls} — the regression band needs re-deriving"
    )
