"""Training-tuple and evaluation-set generation.

Reference equivalent: generating_queries/generate_training_tuples_baseline.py
/ _refine.py / generate_test_sets.py [LINEAGE; SURVEY.md §2.1 P1–P3]:
walk each run's pointcloud_locations csv, build a UTM KDTree, and emit

  training pickle:  {idx: {"query": file, "northing", "easting",
                           "positives": [...], "negatives": [...]}}
  test sets:        per-run database & query dicts; each query entry gains
                    {db_run_idx: [ground-truth neighbour indices]} for every
                    database run, positives = UTM radius < 25 m.

Positives: radius < 10 m. Negatives: complement of radius <= 50 m. Fixed UTM
rectangles exclude geographic test regions from training [LINEAGE].
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Sequence

import numpy as np
import pandas as pd
from sklearn.neighbors import KDTree

# Oxford RobotCar held-out test rectangles (UTM northing/easting centres)
# [LINEAGE: generate_training_tuples_baseline.py P1-P4 constants].
OXFORD_TEST_REGIONS = [
    (5735712.768124, 620084.402381),
    (5735611.299219, 620540.270327),
    (5735237.358209, 620543.094379),
    (5734749.303802, 619932.693364),
]
OXFORD_REGION_WIDTH = 150.0  # metres, a HALF-width: each box spans ±150 m [LINEAGE]


@dataclasses.dataclass
class TrainingTuples:
    """In-memory form of the training pickle."""

    queries: dict  # {idx: {"query": file, "positives": [...], "negatives": [...]}}

    def __len__(self):
        return len(self.queries)


def in_test_region(
    northing: float,
    easting: float,
    regions: Sequence[tuple[float, float]] = tuple(OXFORD_TEST_REGIONS),
    width: float = OXFORD_REGION_WIDTH,
) -> bool:
    """True inside a ±``width`` box around any region centre.

    ``width`` is a HALF-width — the reference's check_in_test_set treats its
    x_width=150 as ``|x - p| < 150`` on each axis, i.e. a 300 m square
    [LINEAGE: generate_training_tuples_baseline.py check_in_test_set].
    """
    for cn, ce in regions:
        if abs(northing - cn) < width and abs(easting - ce) < width:
            return True
    return False


def any_in_test_regions(
    df: pd.DataFrame,
    regions: Sequence[tuple[float, float]] | None = None,
    width: float = OXFORD_REGION_WIDTH,
) -> bool:
    """Does any scanned submap fall inside the held-out rectangles? Drives
    the CLIs' ``only_test_regions=auto``: real Oxford data intersects them,
    synthetic/in-house layouts don't, so auto picks the right protocol
    without trusting directory names."""
    regions = regions if regions is not None else OXFORD_TEST_REGIONS
    return bool(
        df.apply(
            lambda r: in_test_region(r["northing"], r["easting"], regions, width),
            axis=1,
        ).any()
    )


def _read_run_csv(csv_path: str) -> pd.DataFrame:
    # timestamp stays a string — filenames may have leading zeros
    df = pd.read_csv(csv_path, sep=",", dtype={"timestamp": str})
    need = {"timestamp", "northing", "easting"}
    if not need.issubset(df.columns):
        raise ValueError(f"{csv_path}: need columns {need}, got {list(df.columns)}")
    return df


def scan_runs(
    dataset_root: str,
    runs_subdir: str = "oxford",
    pointcloud_dir: str | None = None,
    csv_name: str | None = None,
) -> pd.DataFrame:
    """All submaps of all runs: columns file, northing, easting, run.

    When ``pointcloud_dir``/``csv_name`` are None they are auto-detected per
    run: the Oxford region uses pointcloud_20m_10overlap /
    pointcloud_locations_20m_10overlap.csv while the in-house
    university/residential/business regions use pointcloud_25m_* names
    [LINEAGE: benchmark_datasets layout], so detection keeps one code path
    for all four regions.
    """
    base = os.path.join(dataset_root, runs_subdir)
    frames = []
    for run in sorted(os.listdir(base)):
        run_dir = os.path.join(base, run)
        if not os.path.isdir(run_dir):
            continue
        csv = csv_name
        if csv is None:
            cands = sorted(
                f for f in os.listdir(run_dir)
                if f.startswith("pointcloud_") and f.endswith(".csv")
            )
            csv = cands[0] if cands else None
        pc_dir = pointcloud_dir
        if pc_dir is None:
            cands = sorted(
                d for d in os.listdir(run_dir)
                if d.startswith("pointcloud_")
                and os.path.isdir(os.path.join(run_dir, d))
            )
            pc_dir = cands[0] if cands else None
        if csv is None or pc_dir is None:
            continue
        csv_path = os.path.join(run_dir, csv)
        if not os.path.isfile(csv_path):
            continue
        df = _read_run_csv(csv_path)
        df["file"] = df["timestamp"].map(
            lambda t: os.path.join(runs_subdir, run, pc_dir, f"{t}.bin")
        )
        df["run"] = run
        frames.append(df[["file", "northing", "easting", "run"]])
    if not frames:
        raise FileNotFoundError(f"no runs with a pointcloud_*.csv under {base}")
    return pd.concat(frames, ignore_index=True)


def construct_query_dict(
    df: pd.DataFrame,
    positive_radius: float = 10.0,
    negative_radius: float = 50.0,
    exclude_test_regions: bool = True,
    test_regions: Sequence[tuple[float, float]] | None = None,
) -> TrainingTuples:
    """P1/P2 equivalent: per-submap positives/negatives via UTM KDTree."""
    if exclude_test_regions:
        regions = test_regions if test_regions is not None else OXFORD_TEST_REGIONS
        keep = ~df.apply(
            lambda r: in_test_region(r["northing"], r["easting"], regions), axis=1
        )
        df = df[keep].reset_index(drop=True)

    coords = df[["northing", "easting"]].to_numpy()
    tree = KDTree(coords)
    pos_lists = tree.query_radius(coords, r=positive_radius)
    nonneg_lists = tree.query_radius(coords, r=negative_radius)

    queries = {}
    all_ids = set(range(len(df)))
    for i in range(len(df)):
        positives = sorted(int(j) for j in pos_lists[i] if j != i)
        negatives = sorted(all_ids - set(int(j) for j in nonneg_lists[i]))
        queries[i] = {
            "query": df["file"][i],
            "northing": float(df["northing"][i]),
            "easting": float(df["easting"][i]),
            "positives": positives,
            "negatives": negatives,
        }
    return TrainingTuples(queries)


def construct_query_and_database_sets(
    df: pd.DataFrame,
    test_positive_radius: float = 25.0,
    only_test_regions: bool = False,
    test_regions: Sequence[tuple[float, float]] | None = None,
):
    """P3 equivalent. Returns (database_sets, query_sets): lists (one per
    run) of {idx: entry} dicts; each query entry maps db-run index ->
    ground-truth database indices within ``test_positive_radius``.

    Reference semantics [LINEAGE: generate_test_sets.py]: the DATABASE keeps
    EVERY submap of a run; ``only_test_regions`` restricts only the QUERIES
    to the held-out rectangles. Ground truth is computed against each full
    run's KDTree, so recall@top-1% sees the true database size.
    """
    regions = test_regions if test_regions is not None else OXFORD_TEST_REGIONS

    def entries_of(sub):
        return {
            i: {
                "query": sub["file"][i],
                "northing": float(sub["northing"][i]),
                "easting": float(sub["easting"][i]),
            }
            for i in range(len(sub))
        }

    runs = sorted(df["run"].unique())
    database_sets, query_sets, trees = [], [], []
    for run in runs:
        sub = df[df["run"] == run].reset_index(drop=True)
        database_sets.append(entries_of(sub))
        trees.append(KDTree(sub[["northing", "easting"]].to_numpy()))
        if only_test_regions:
            keep = sub.apply(
                lambda r: in_test_region(r["northing"], r["easting"], regions),
                axis=1,
            )
            sub = sub[keep].reset_index(drop=True)
        query_sets.append(entries_of(sub))

    for qi, qset in enumerate(query_sets):
        if not qset:
            continue
        coords = np.array([[v["northing"], v["easting"]] for v in qset.values()])
        for di, tree in enumerate(trees):
            if di == qi:
                continue
            gt = tree.query_radius(coords, r=test_positive_radius)
            for i, hits in enumerate(gt):
                qset[i][di] = sorted(int(h) for h in hits)
    return database_sets, query_sets


def save_pickle(obj, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
