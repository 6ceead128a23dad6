"""Synthetic mini-dataset generator (SURVEY.md §4's "fixtures" gap).

The reference has no synthetic data path — its fixtures are the 30 GB Oxford
download [LINEAGE]. This generator writes a tiny dataset in the SAME on-disk
layout (runs with a locations csv + float64 .bin submaps) so every
integration test and CI job runs the real pipeline end-to-end.

Geometry: submaps are sampled from a deterministic "world" — every
trajectory WAYPOINT hashes to a base cloud, so revisits of the same place
(any run, any jitter) share structure exactly (plus per-visit
rotation/noise) while different waypoints (spacing_m apart, beyond the
positive radius) don't. Keying by waypoint rather than a spatial grid
avoids cell-boundary label noise: two revisits 0.3 m apart can never hash
to different base clouds. That makes place recognition *learnable* on
synthetic data with CLEAN labels: positives look alike, negatives don't.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def _cell_cloud(
    place: tuple[int, int], num_points: int, world_seed: int,
    sample_rng: np.random.Generator | None = None,
    n_blobs: int = 8,
    keep_mask: np.ndarray | None = None,
) -> np.ndarray:
    """Sample a point cloud of ``place``.

    A few gaussian blobs — crude "buildings" giving each place a signature.
    ``sample_rng=None`` (easy mode): points are drawn from the place's own
    deterministic stream, so every visit sees IDENTICAL points — a clean
    correctness fixture the model saturates. Passing a per-visit
    ``sample_rng`` (hard mode) draws fresh points from the same blob
    layout: revisits share STRUCTURE but not points, like real lidar
    revisits — a structural-generalization check (measured: EPC-Net still
    reaches 100% recall@1 at 5x80 submaps, with a visibly harder loss).

    ``keep_mask`` (benchmark mode) hides a per-visit subset of the place's
    blobs — the occlusion analogue: two visits of one place then share only
    part of their structure.
    """
    seed = (world_seed * 1_000_003 + place[0] * 7919 + place[1] * 104729) % (2**31 - 1)
    rng = np.random.default_rng(seed)
    k = n_blobs
    centers = rng.uniform(-0.8, 0.8, (k, 3))
    scales = rng.uniform(0.02, 0.2, (k, 1))
    srng = sample_rng if sample_rng is not None else rng
    if keep_mask is not None:
        kept = np.flatnonzero(keep_mask)
        assign = kept[srng.integers(0, len(kept), num_points)]
    else:
        assign = srng.integers(0, k, num_points)
    pts = centers[assign] + scales[assign] * srng.standard_normal((num_points, 3))
    return np.clip(pts, -1.0, 1.0)


def generate_synthetic_dataset(
    root: str,
    num_runs: int = 3,
    submaps_per_run: int = 40,
    num_points: int = 4096,
    runs_subdir: str = "oxford",
    pointcloud_dir: str = "pointcloud_20m_10overlap",
    csv_name: str = "pointcloud_locations_20m_10overlap.csv",
    spacing_m: float = 20.0,
    world_seed: int = 7,
    noise: float = 0.01,
    origin: tuple[float, float] = (5_800_000.0, 600_000.0),
    resample_per_visit: bool = False,
    difficulty: float = 0.0,
) -> str:
    """Writes the dataset under ``root`` and returns ``root``.

    Runs follow the same loop trajectory with jitter, so run i's submap near
    (n, e) is a true positive for run j's submap there — exactly the Oxford
    revisit structure the benchmark relies on.

    ``origin`` defaults to a spot far from the Oxford held-out rectangles so
    synthetic data never trips the test-region filters; pass distinct origins
    to build non-overlapping multi-region fixtures.

    ``resample_per_visit=True`` is HARD mode: each visit draws fresh points
    from the place's blob layout (shared structure, disjoint points — real
    lidar revisit statistics), so retrieval cannot shortcut on point
    identity. Measured at 5x80 submaps: the loss is visibly harder (0.3-0.4
    vs 0 after epoch 1) but EPC-Net still saturates recall@1=100% — use it
    as a structural-generalization check; both modes are easy for retrieval
    at this scale.

    ``difficulty`` in [0, 1] is the BENCHMARK dial (VERDICT r2 #2: a quality
    signal that can fail). It compounds three per-visit effects real lidar
    revisits have and the easy fixture lacks, calibrated so an untrained
    model sits near chance while a trained EPC-Net lands high-but-below-100%:

    - full heading change: per-visit z-rotation up to ±difficulty·π (raw
      coordinates decorrelate between visits; only rotation-INVARIANT
      structure learned through the training augmentation survives),
    - occlusion: each visit hides ~35%·difficulty of the place's blobs,
    - resampling + extra sensor noise (implies ``resample_per_visit``).

    The labels stay exactly clean — difficulty only perturbs geometry per
    VISIT, never the waypoint-keyed place identity.
    """
    base = os.path.join(root, runs_subdir)
    os.makedirs(base, exist_ok=True)
    if not 0.0 <= difficulty <= 1.0:
        raise ValueError(f"difficulty must be in [0, 1], got {difficulty}")
    resample = resample_per_visit or difficulty > 0
    n_blobs = 8 if difficulty == 0 else 12
    rot_max = 0.2 + difficulty * (np.pi - 0.2)
    blob_dropout = 0.35 * difficulty
    noise = noise + 0.02 * difficulty
    # A closed loop in UTM space.
    t = np.linspace(0, 2 * np.pi, submaps_per_run, endpoint=False)
    radius = spacing_m * submaps_per_run / (2 * np.pi)
    origin_n, origin_e = origin

    for r in range(num_runs):
        rng = np.random.default_rng(1000 + r)
        run = f"run_{r:02d}"
        pc_dir = os.path.join(base, run, pointcloud_dir)
        os.makedirs(pc_dir, exist_ok=True)
        rows = []
        for s in range(submaps_per_run):
            n = origin_n + radius * np.cos(t[s]) + rng.normal(0, 2.0)
            e = origin_e + radius * np.sin(t[s]) + rng.normal(0, 2.0)
            # place identity = the waypoint (jitter-proof), disambiguated by
            # origin so separate regions never alias base clouds
            place = (s, int(origin_n + origin_e) % 1_000_003)
            keep = None
            if blob_dropout > 0:
                keep = rng.random(n_blobs) >= blob_dropout
                if not keep.any():
                    keep[rng.integers(n_blobs)] = True
            pts = _cell_cloud(
                place, num_points, world_seed,
                sample_rng=rng if resample else None,
                n_blobs=n_blobs, keep_mask=keep,
            )
            # per-visit variation: rotation about z + noise (small by
            # default so place identity stays easily learnable in tiny test
            # models; up to full heading change on the difficulty dial)
            ang = rng.uniform(-rot_max, rot_max)
            c, sn = np.cos(ang), np.sin(ang)
            rot = np.array([[c, -sn, 0], [sn, c, 0], [0, 0, 1]])
            pts = pts @ rot.T + noise * rng.standard_normal(pts.shape)
            pts = np.clip(pts, -1.0, 1.0)
            ts = f"{r:02d}{s:06d}"
            pts.astype(np.float64).tofile(os.path.join(pc_dir, f"{ts}.bin"))
            rows.append({"timestamp": ts, "northing": n, "easting": e})
        pd.DataFrame(rows).to_csv(
            os.path.join(base, run, csv_name), index=False
        )
    return root
