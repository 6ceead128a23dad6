"""End-to-end CLI integration: generate_tuples -> train -> evaluate on a tiny
synthetic dataset (the reference's only 'integration test' was running
train.py/evaluate.py by hand — here it is automated, SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

# end-to-end CLI runs (train/distill/evaluate loops + compiles): the
# suite's slowest non-subprocess module — full-suite tier only
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cli_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_ds"))
    from epcnet_tpu.data.synthetic import generate_synthetic_dataset

    generate_synthetic_dataset(root, num_runs=2, submaps_per_run=20, num_points=128)
    return root


def test_generate_tuples_cli(cli_root, tmp_path):
    from epcnet_tpu.cli.generate_tuples import main

    out = str(tmp_path)
    main(["--dataset_root", cli_root, "--mode", "baseline", "--output_dir", out,
          "--num_points", "128"])
    main(["--dataset_root", cli_root, "--mode", "test", "--output_dir", out,
          "--num_points", "128"])
    from epcnet_tpu.data.tuples import load_pickle

    tq = load_pickle(os.path.join(out, "training_queries_baseline.pickle"))
    assert len(tq) > 0 and "positives" in next(iter(tq.values()))
    db = load_pickle(os.path.join(out, "oxford_evaluation_database.pickle"))
    assert len(db) == 2


@pytest.fixture(scope="module")
def multiregion_root(tmp_path_factory):
    """Oxford-style region + an in-house-style region with the
    pointcloud_25m_* layout (SURVEY.md §2.1 P2/P3 auto-detect path)."""
    root = str(tmp_path_factory.mktemp("multiregion_ds"))
    from epcnet_tpu.data.synthetic import generate_synthetic_dataset

    generate_synthetic_dataset(root, num_runs=2, submaps_per_run=15,
                               num_points=128, runs_subdir="oxford")
    generate_synthetic_dataset(
        root, num_runs=2, submaps_per_run=12, num_points=128,
        runs_subdir="university", pointcloud_dir="pointcloud_25m_25overlap",
        csv_name="pointcloud_locations_25m_25overlap.csv", world_seed=11,
        origin=(5_900_000.0, 700_000.0),  # a separate world, no cross-region positives
    )
    return root


def test_refine_mode_merges_regions(multiregion_root, tmp_path):
    """--mode refine merges several region subdirs into ONE training set."""
    from epcnet_tpu.cli.generate_tuples import main
    from epcnet_tpu.data.tuples import load_pickle

    out = str(tmp_path)
    main(["--dataset_root", multiregion_root, "--mode", "refine",
          "--runs_subdirs", "oxford", "university",
          "--output_dir", out, "--num_points", "128"])
    tq = load_pickle(os.path.join(out, "training_queries_refine.pickle"))
    assert len(tq) == 2 * 15 + 2 * 12  # every submap of both regions
    subdirs = {v["query"].split(os.sep)[0] for v in tq.values()}
    assert subdirs == {"oxford", "university"}
    # merged KDTree: positives/negatives may cross regions only if close —
    # the two worlds are far apart, so no cross-region positives
    for v in tq.values():
        region = v["query"].split(os.sep)[0]
        for p in v["positives"]:
            assert tq[p]["query"].split(os.sep)[0] == region


def test_inhouse_eval_layout(multiregion_root, tmp_path):
    """pointcloud_25m_* layouts are auto-detected for test-set generation."""
    from epcnet_tpu.cli.generate_tuples import main
    from epcnet_tpu.data.tuples import load_pickle

    out = str(tmp_path)
    main(["--dataset_root", multiregion_root, "--mode", "test",
          "--runs_subdir", "university", "--output_dir", out,
          "--num_points", "128"])
    db = load_pickle(os.path.join(out, "university_evaluation_database.pickle"))
    q = load_pickle(os.path.join(out, "university_evaluation_query.pickle"))
    assert [len(d) for d in db] == [12, 12]
    assert [len(x) for x in q] == [12, 12]
    assert all("pointcloud_25m_25overlap" in e["query"] for e in db[0].values())


def test_train_then_evaluate_cli(cli_root, tmp_path):
    from epcnet_tpu.cli.evaluate import main as eval_main
    from epcnet_tpu.cli.train import main as train_main

    log_dir = str(tmp_path / "log")
    sets = [
        "model.num_points=128", "model.knn_k=6", "model.use_pallas=false",
        "model.proxyconv_channels=8,8", "model.lift_channels=16,32",
        "model.feature_dim=32", "model.vlad_clusters=4", "model.vlad_groups=2",
        "model.vlad_group_dim=8",
        "data.num_points=128", "data.num_negatives=3", "data.num_positives=1",
        "train.max_epoch=1", "train.mining_start_epoch=99",
        "train.log_every_steps=5", "train.checkpoint_every_steps=1000000",
    ]
    args = ["--dataset_root", cli_root, "--log_dir", log_dir]
    for s in sets:
        args += ["--set", s]
    train_main(args)
    assert os.path.isfile(os.path.join(log_dir, "config.json"))
    assert os.path.isfile(os.path.join(log_dir, "train.jsonl"))
    recs = [json.loads(l) for l in open(os.path.join(log_dir, "train.jsonl"))]
    assert all(np.isfinite(r["loss"]) for r in recs)

    eval_main(["--dataset_root", cli_root, "--log_dir", log_dir])
    results = open(os.path.join(log_dir, "results.txt")).read()
    assert "Average Top 1% Recall" in results
    assert os.path.isfile(os.path.join(log_dir, "results.json"))

    # reference-workflow path: evaluate from pre-generated pickles
    from epcnet_tpu.cli.generate_tuples import main as gen_main

    gen_main(["--dataset_root", cli_root, "--mode", "test",
              "--output_dir", log_dir, "--num_points", "128"])
    eval_main([
        "--dataset_root", cli_root, "--log_dir", log_dir,
        "--database_pickle", os.path.join(log_dir, "oxford_evaluation_database.pickle"),
        "--query_pickle", os.path.join(log_dir, "oxford_evaluation_query.pickle"),
        "--output", os.path.join(log_dir, "results_pickled.txt"),
    ])
    assert "Average Top 1% Recall" in open(
        os.path.join(log_dir, "results_pickled.txt")).read()


def test_train_restore_cli(cli_root, tmp_path):
    """--restore resumes AT the saved epoch: same max_epoch trains nothing
    more; a raised max_epoch trains exactly the additional epochs."""
    from epcnet_tpu.cli.train import main as train_main

    log_dir = str(tmp_path / "log2")
    sets = [
        "model.num_points=128", "model.knn_k=6", "model.use_pallas=false",
        "model.proxyconv_channels=8,8", "model.lift_channels=16,32",
        "model.feature_dim=32", "model.vlad_clusters=4", "model.vlad_groups=2",
        "model.vlad_group_dim=8",
        "data.num_points=128", "data.num_negatives=3", "data.num_positives=1",
        "train.max_epoch=1", "train.mining_start_epoch=99",
        "train.checkpoint_every_steps=1000000",
    ]
    args = ["--dataset_root", cli_root, "--log_dir", log_dir]
    for s in sets:
        args += ["--set", s]
    train_main(args)

    def latest_step():
        return max(
            int(d) for d in os.listdir(os.path.join(log_dir, "ckpt")) if d.isdigit()
        )

    steps1 = latest_step()
    # same max_epoch: the epoch is done — a resumed run must NOT replay it
    train_main(args + ["--restore"])
    assert latest_step() == steps1
    # raised max_epoch: exactly one more epoch's worth of steps
    train_main(args + ["--restore", "--set", "train.max_epoch=2"])
    assert latest_step() == 2 * steps1


def test_train_best_recall_retention(cli_root, tmp_path):
    """--eval_every_epochs evaluates recall@1 during training and retains the
    best checkpoint in ckpt_best (SURVEY.md §5.3 best-recall retention)."""
    from epcnet_tpu.cli.train import main as train_main

    log_dir = str(tmp_path / "log_best")
    sets = [
        "model.num_points=128", "model.knn_k=6", "model.use_pallas=false",
        "model.proxyconv_channels=8,8", "model.lift_channels=16,32",
        "model.feature_dim=32", "model.vlad_clusters=4", "model.vlad_groups=2",
        "model.vlad_group_dim=8",
        "data.num_points=128", "data.num_negatives=3", "data.num_positives=1",
        "train.max_epoch=2", "train.mining_start_epoch=99",
        "train.checkpoint_every_steps=1000000",
    ]
    args = ["--dataset_root", cli_root, "--log_dir", log_dir,
            "--eval_every_epochs", "1"]
    for s in sets:
        args += ["--set", s]
    train_main(args)
    best_steps = [d for d in os.listdir(os.path.join(log_dir, "ckpt_best"))
                  if d.isdigit()]
    assert len(best_steps) == 1  # keep=1: only the best survives
    recs = [json.loads(l) for l in open(os.path.join(log_dir, "train.jsonl"))]
    evals = [r for r in recs if "eval_recall_at_1" in r]
    assert len(evals) == 2  # one per epoch
    assert all(0.0 <= r["eval_recall_at_1"] <= 1.0 for r in evals)


def test_distill_cli(cli_root, tmp_path):
    """Teacher train -> distill student end-to-end."""
    from epcnet_tpu.cli.distill import main as distill_main
    from epcnet_tpu.cli.train import main as train_main

    teacher_dir = str(tmp_path / "teacher")
    sets = [
        "model.num_points=128", "model.knn_k=6", "model.use_pallas=false",
        "model.proxyconv_channels=8,8", "model.lift_channels=16,32",
        "model.feature_dim=32", "model.vlad_clusters=4", "model.vlad_groups=2",
        "model.vlad_group_dim=8",
        "data.num_points=128", "data.num_negatives=3", "data.num_positives=1",
        "train.max_epoch=1", "train.mining_start_epoch=99",
        "train.checkpoint_every_steps=1000000",
    ]
    args = ["--dataset_root", cli_root, "--log_dir", teacher_dir]
    for s in sets:
        args += ["--set", s]
    train_main(args)

    student_dir = str(tmp_path / "student")
    dargs = ["--dataset_root", cli_root, "--teacher_log_dir", teacher_dir,
             "--log_dir", student_dir,
             "--set", "data.num_points=128",
             "--set", "data.num_negatives=3",
             "--set", "data.num_positives=1",
             "--set", "model.proxyconv_channels=4,4",
             "--set", "model.lift_channels=8,16",
             "--set", "model.feature_dim=16",
             "--set", "model.vlad_clusters=4",
             "--set", "model.vlad_groups=2",
             "--set", "model.vlad_group_dim=8"]
    distill_main(dargs)
    import json, os

    recs = [json.loads(l) for l in open(os.path.join(student_dir, "distill.jsonl"))]
    assert len(recs) > 0
    assert all("mimic_loss" in r for r in recs)

def test_distill_restore_cli(cli_root, tmp_path):
    """Distill --restore resumes at the saved epoch instead of replaying
    (the Trainer resume contract now applies to distillation too)."""
    from epcnet_tpu.cli.distill import main as distill_main
    from epcnet_tpu.cli.train import main as train_main
    from epcnet_tpu.train.checkpoint import CheckpointManager
    from epcnet_tpu.train.state import create_train_state
    from epcnet_tpu.configs import ExperimentConfig
    import json, os

    teacher_dir = str(tmp_path / "teacher")
    sets = [
        "model.num_points=128", "model.knn_k=6", "model.use_pallas=false",
        "model.proxyconv_channels=8,8", "model.lift_channels=16,32",
        "model.feature_dim=32", "model.vlad_clusters=4", "model.vlad_groups=2",
        "model.vlad_group_dim=8",
        "data.num_points=128", "data.num_negatives=3", "data.num_positives=1",
        "train.max_epoch=1", "train.mining_start_epoch=99",
        "train.checkpoint_every_steps=1000000",
    ]
    args = ["--dataset_root", cli_root, "--log_dir", teacher_dir]
    for s_ in sets:
        args += ["--set", s_]
    train_main(args)

    student_dir = str(tmp_path / "student")
    dargs = ["--dataset_root", cli_root, "--teacher_log_dir", teacher_dir,
             "--log_dir", student_dir,
             "--set", "data.num_points=128",
             "--set", "data.num_negatives=3",
             "--set", "data.num_positives=1",
             "--set", "model.proxyconv_channels=4,4",
             "--set", "model.lift_channels=8,16",
             "--set", "model.feature_dim=16",
             "--set", "model.vlad_clusters=4",
             "--set", "model.vlad_groups=2",
             "--set", "model.vlad_group_dim=8"]
    distill_main(dargs)

    cfg = ExperimentConfig.from_json(open(os.path.join(student_dir, "config.json")).read())
    st = create_train_state(cfg.model, cfg.train)
    st = CheckpointManager(f"{student_dir}/ckpt").restore(st)
    step_after_1 = int(st.step)
    assert step_after_1 > 0 and int(st.epoch) == 1  # saved AT the epoch-1 boundary

    distill_main(dargs + ["--restore", "--set", "train.max_epoch=2"])
    st2 = create_train_state(cfg.model, cfg.train)
    st2 = CheckpointManager(f"{student_dir}/ckpt").restore(st2)
    assert int(st2.step) == 2 * step_after_1  # exactly one more epoch ran
    assert int(st2.epoch) == 2


def test_distill_mesh_cli(cli_root, tmp_path):
    """Distill --mesh: DP over the 8-device CPU mesh with the teacher
    replicated (the new Trainer-backed path)."""
    from epcnet_tpu.cli.distill import main as distill_main
    from epcnet_tpu.cli.train import main as train_main
    import json, os

    teacher_dir = str(tmp_path / "teacher")
    sets = [
        "model.num_points=128", "model.knn_k=6", "model.use_pallas=false",
        "model.proxyconv_channels=8,8", "model.lift_channels=16,32",
        "model.feature_dim=32", "model.vlad_clusters=4", "model.vlad_groups=2",
        "model.vlad_group_dim=8",
        "data.num_points=128", "data.num_negatives=3", "data.num_positives=1",
        "train.max_epoch=1", "train.mining_start_epoch=99",
        "train.checkpoint_every_steps=1000000",
    ]
    args = ["--dataset_root", cli_root, "--log_dir", teacher_dir]
    for s in sets:
        args += ["--set", s]
    train_main(args)

    student_dir = str(tmp_path / "student")
    dargs = ["--dataset_root", cli_root, "--teacher_log_dir", teacher_dir,
             "--log_dir", student_dir, "--mesh",
             "--set", "train.batch_num_queries=8",
             "--set", "train.log_every_steps=2",
             "--set", "data.num_negatives=3",
             "--set", "data.num_positives=1",
             "--set", "model.proxyconv_channels=4,4",
             "--set", "model.lift_channels=8,16",
             "--set", "model.feature_dim=16",
             "--set", "model.vlad_clusters=4",
             "--set", "model.vlad_groups=2",
             "--set", "model.vlad_group_dim=8"]
    distill_main(dargs)
    recs = [json.loads(l) for l in open(os.path.join(student_dir, "distill.jsonl"))]
    assert recs and all(np.isfinite(r["loss"]) for r in recs)

def test_distill_eval_retention_cli(cli_root, tmp_path):
    """Distill --eval_every_epochs: student recall eval + ckpt_best retention
    (the shared evals/hooks.py hook wired into the distill driver)."""
    from epcnet_tpu.cli.distill import main as distill_main
    from epcnet_tpu.cli.train import main as train_main
    import json, os

    teacher_dir = str(tmp_path / "teacher")
    sets = [
        "model.num_points=128", "model.knn_k=6", "model.use_pallas=false",
        "model.proxyconv_channels=8,8", "model.lift_channels=16,32",
        "model.feature_dim=32", "model.vlad_clusters=4", "model.vlad_groups=2",
        "model.vlad_group_dim=8",
        "data.num_points=128", "data.num_negatives=3", "data.num_positives=1",
        "train.max_epoch=1", "train.mining_start_epoch=99",
        "train.checkpoint_every_steps=1000000",
    ]
    args = ["--dataset_root", cli_root, "--log_dir", teacher_dir]
    for s in sets:
        args += ["--set", s]
    train_main(args)

    student_dir = str(tmp_path / "student")
    distill_main([
        "--dataset_root", cli_root, "--teacher_log_dir", teacher_dir,
        "--log_dir", student_dir, "--eval_every_epochs", "1",
        "--set", "data.num_negatives=3", "--set", "data.num_positives=1",
        "--set", "model.proxyconv_channels=4,4",
        "--set", "model.lift_channels=8,16", "--set", "model.feature_dim=16",
        "--set", "model.vlad_clusters=4", "--set", "model.vlad_groups=2",
        "--set", "model.vlad_group_dim=8",
    ])
    assert os.path.isdir(os.path.join(student_dir, "ckpt_best"))
    recs = [json.loads(l) for l in open(os.path.join(student_dir, "distill.jsonl"))]
    assert any("eval_recall_at_1" in r for r in recs)

def test_evaluate_mesh_cli(cli_root, tmp_path):
    """evaluate --mesh: the db-axis default (all devices) must produce the
    same recall as the unsharded path."""
    from epcnet_tpu.cli.evaluate import main as eval_main
    from epcnet_tpu.cli.train import main as train_main
    import json, os

    log_dir = str(tmp_path / "log_mesh")
    sets = [
        "model.num_points=128", "model.knn_k=6", "model.use_pallas=false",
        "model.proxyconv_channels=8,8", "model.lift_channels=16,32",
        "model.feature_dim=32", "model.vlad_clusters=4", "model.vlad_groups=2",
        "model.vlad_group_dim=8",
        "data.num_points=128", "data.num_negatives=3", "data.num_positives=1",
        "train.max_epoch=1", "train.mining_start_epoch=99",
        "train.checkpoint_every_steps=1000000",
    ]
    args = ["--dataset_root", cli_root, "--log_dir", log_dir]
    for s in sets:
        args += ["--set", s]
    train_main(args)

    eval_main(["--dataset_root", cli_root, "--log_dir", log_dir])
    plain = json.load(open(os.path.join(log_dir, "results.json")))
    eval_main(["--dataset_root", cli_root, "--log_dir", log_dir, "--mesh",
               "--output", os.path.join(log_dir, "results_mesh.txt")])
    sharded = json.load(open(os.path.join(log_dir, "results_mesh.json")))
    assert plain["average"]["recall_at"] == sharded["average"]["recall_at"]


def test_distill_synthetic_generates_dataset(cli_root, tmp_path):
    """distill --synthetic with a missing dataset_root generates fixtures
    (parity with train's flag) instead of FileNotFoundError."""
    from epcnet_tpu.cli.distill import main as distill_main
    from epcnet_tpu.cli.train import main as train_main
    import os

    teacher_dir = str(tmp_path / "teacher")
    sets = [
        "model.num_points=128", "model.knn_k=6", "model.use_pallas=false",
        "model.proxyconv_channels=8,8", "model.lift_channels=16,32",
        "model.feature_dim=32", "model.vlad_clusters=4", "model.vlad_groups=2",
        "model.vlad_group_dim=8",
        "data.num_points=128", "data.num_negatives=3", "data.num_positives=1",
        "train.max_epoch=1", "train.mining_start_epoch=99",
        "train.checkpoint_every_steps=1000000",
    ]
    args = ["--dataset_root", cli_root, "--log_dir", teacher_dir]
    for s in sets:
        args += ["--set", s]
    train_main(args)

    fresh_root = str(tmp_path / "fresh_ds")  # does not exist yet
    distill_main([
        "--dataset_root", fresh_root, "--teacher_log_dir", teacher_dir,
        "--log_dir", str(tmp_path / "student"), "--synthetic",
        "--set", "data.num_negatives=3", "--set", "data.num_positives=1",
        "--set", "train.max_epoch=1",
        "--set", "model.proxyconv_channels=4,4",
        "--set", "model.lift_channels=8,16", "--set", "model.feature_dim=16",
        "--set", "model.vlad_clusters=4", "--set", "model.vlad_groups=2",
        "--set", "model.vlad_group_dim=8",
    ])
    assert os.path.isdir(os.path.join(fresh_root, "oxford"))
    assert os.path.isdir(os.path.join(str(tmp_path / "student"), "ckpt"))

def test_best_recall_retired_on_fresh_run(cli_root, tmp_path):
    """A stale best_recall.json from an earlier run must not suppress a
    fresh (non---restore) run's ckpt_best retention; --restore honors it."""
    import json, os

    from epcnet_tpu.cli.train import main as train_main

    log_dir = str(tmp_path / "log_fresh")
    sets = [
        "model.num_points=128", "model.knn_k=6", "model.use_pallas=false",
        "model.proxyconv_channels=8,8", "model.lift_channels=16,32",
        "model.feature_dim=32", "model.vlad_clusters=4", "model.vlad_groups=2",
        "model.vlad_group_dim=8",
        "data.num_points=128", "data.num_negatives=3", "data.num_positives=1",
        "train.max_epoch=1", "train.mining_start_epoch=99",
        "train.checkpoint_every_steps=1000000",
    ]
    args = ["--dataset_root", cli_root, "--log_dir", log_dir,
            "--eval_every_epochs", "1"]
    for s in sets:
        args += ["--set", s]

    # plant an unbeatable stale best from a "previous run", INCLUDING a
    # stale ckpt_best with a sentinel: a deterministic rerun hits the same
    # step numbers and CheckpointManager.save skips step collisions, so the
    # old checkpoint must be cleared, not just the score file
    os.makedirs(os.path.join(log_dir, "ckpt_best", "999"), exist_ok=True)
    sentinel = os.path.join(log_dir, "ckpt_best", "999", "stale_marker")
    open(sentinel, "w").close()
    with open(os.path.join(log_dir, "best_recall.json"), "w") as f:
        json.dump({"recall_at_1": 2.0, "step": 999}, f)

    train_main(args)  # fresh run: stale best retired, new best recorded
    best = json.load(open(os.path.join(log_dir, "best_recall.json")))
    assert best["recall_at_1"] <= 1.0  # the NEW run's actual recall
    assert os.path.isdir(os.path.join(log_dir, "ckpt_best"))
    assert not os.path.exists(sentinel)  # stale checkpoint was cleared too


@pytest.fixture(scope="module")
def embed_log_dir(cli_root, tmp_path_factory):
    """A trained tiny-model log dir shared by the embed-CLI tests (f32 so
    the points-sharded path can be compared to the dense one exactly)."""
    from epcnet_tpu.cli.train import main as train_main

    log_dir = str(tmp_path_factory.mktemp("embed") / "log")
    sets = [
        "model.num_points=128", "model.knn_k=6", "model.use_pallas=false",
        "model.compute_dtype=float32",
        "model.proxyconv_channels=8,8", "model.lift_channels=16,32",
        "model.feature_dim=32", "model.vlad_clusters=4", "model.vlad_groups=2",
        "model.vlad_group_dim=8",
        "data.num_points=128", "data.num_negatives=3", "data.num_positives=1",
        "train.max_epoch=1", "train.mining_start_epoch=99",
        "train.checkpoint_every_steps=1000000",
    ]
    args = ["--dataset_root", cli_root, "--log_dir", log_dir]
    for s in sets:
        args += ["--set", s]
    train_main(args)
    return log_dir


def test_embed_cli_batched(embed_log_dir, tmp_path, rng):
    """cli/embed standard path: .bin + .npy inputs -> [M, D] descriptors
    matching the library embed of the same clouds."""
    from epcnet_tpu.cli.embed import main as embed_main

    clouds = [rng.uniform(-1, 1, (128, 3)).astype(np.float32) for _ in range(3)]
    paths = []
    for i, c in enumerate(clouds):
        if i == 0:
            p = str(tmp_path / "c0.npy")
            np.save(p, c)
        else:
            p = str(tmp_path / f"c{i}.bin")
            c.astype(np.float64).tofile(p)  # reference fp64 .bin format
        paths.append(p)
    out = str(tmp_path / "descs.npy")
    embed_main(["--log_dir", embed_log_dir, "--output", out,
                "--batch_size", "2", *paths])

    descs = np.load(out)
    assert descs.shape[0] == 3
    np.testing.assert_allclose(np.linalg.norm(descs, axis=1), 1.0, atol=1e-5)
    manifest = json.loads(open(str(tmp_path / "descs.json")).read())
    assert manifest["files"] == paths

    # matches the library embed path on the same checkpoint
    import jax.numpy as jnp

    from epcnet_tpu.configs import ExperimentConfig
    from epcnet_tpu.train import create_train_state, build_embed_fn
    from epcnet_tpu.train.checkpoint import CheckpointManager

    cfg = ExperimentConfig.from_json(
        open(os.path.join(embed_log_dir, "config.json")).read())
    state = CheckpointManager(f"{embed_log_dir}/ckpt", 2).restore(
        create_train_state(cfg.model, cfg.train), require=True)
    ref = np.asarray(build_embed_fn(cfg.model)(
        state.params, state.batch_stats, jnp.asarray(np.stack(clouds))))
    np.testing.assert_allclose(descs, ref, atol=1e-5)


def test_embed_cli_points_sharded(embed_log_dir, tmp_path, rng):
    """--points_sharded embeds arbitrary-sized clouds; a num_points-sized
    cloud reproduces the standard path's descriptor (fp32 model)."""
    from epcnet_tpu.cli.embed import main as embed_main

    c128 = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
    c91 = rng.uniform(-1, 1, (91, 3)).astype(np.float32)   # not a valid batched size
    c300 = rng.uniform(-1, 1, (300, 3)).astype(np.float32)  # > num_points
    for name, c in [("a.npy", c128), ("b.npy", c91), ("d.npy", c300)]:
        np.save(str(tmp_path / name), c)

    out_std = str(tmp_path / "std.npy")
    embed_main(["--log_dir", embed_log_dir, "--output", out_std,
                str(tmp_path / "a.npy")])
    out_sh = str(tmp_path / "sharded.npy")
    embed_main(["--log_dir", embed_log_dir, "--output", out_sh,
                "--points_sharded", "--pad_multiple", "16",
                str(tmp_path / "a.npy"), str(tmp_path / "b.npy"),
                str(tmp_path / "d.npy")])

    std, sh = np.load(out_std), np.load(out_sh)
    assert sh.shape[0] == 3
    np.testing.assert_allclose(np.linalg.norm(sh, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(sh[0], std[0], atol=2e-4)


def test_embed_cli_size_mismatch_raises(embed_log_dir, tmp_path, rng):
    """The batched path enforces the fixed-size contract with a pointer to
    --points_sharded."""
    from epcnet_tpu.cli.embed import main as embed_main

    np.save(str(tmp_path / "bad.npy"), rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    with pytest.raises(ValueError, match="points_sharded"):
        embed_main(["--log_dir", embed_log_dir, "--output",
                    str(tmp_path / "x.npy"), str(tmp_path / "bad.npy")])


def test_export_convert_roundtrip(embed_log_dir, tmp_path, rng):
    """cli/export -> cli/convert (self layout) reproduces the exact
    descriptors from a fresh run directory; the unlabeled-rename path goes
    through the shape-graph auto-matcher (--name_map auto) and must land on
    the same weights too (the porting-day front door, VERDICT r2 #4)."""
    from epcnet_tpu.cli.convert import main as convert_main
    from epcnet_tpu.cli.embed import main as embed_main
    from epcnet_tpu.cli.export import main as export_main

    cloud = str(tmp_path / "c.npy")
    np.save(cloud, rng.uniform(-1, 1, (128, 3)).astype(np.float32))

    def embed_with(log_dir, tag):
        out = str(tmp_path / f"d_{tag}.npy")
        embed_main(["--log_dir", log_dir, "--output", out, cloud])
        return np.load(out)

    ref = embed_with(embed_log_dir, "ref")

    exp = str(tmp_path / "export")
    export_main(["--log_dir", embed_log_dir, "--output", exp])
    manifest = json.load(open(exp + ".json"))
    z = np.load(exp + ".npz")
    assert len(z.files) == len(manifest["leaves"]) > 10
    assert all(k.startswith(("params/", "batch_stats/")) for k in z.files)

    # 1) lossless self-layout re-import (auto-detected)
    log2 = str(tmp_path / "log2")
    convert_main(["--source", exp + ".npz", "--log_dir", log2,
                  "--config", os.path.join(embed_log_dir, "config.json")])
    np.testing.assert_allclose(embed_with(log2, "self"), ref, atol=1e-6)

    # 2) unlabeled rename in forward-topological order -> auto-matcher
    from epcnet_tpu.configs import ExperimentConfig
    from epcnet_tpu.train import create_train_state
    from epcnet_tpu.train.checkpoint import CheckpointManager
    from epcnet_tpu.utils.importer import model_leaf_order

    cfg = ExperimentConfig.from_json(
        open(os.path.join(embed_log_dir, "config.json")).read())
    state = CheckpointManager(f"{embed_log_dir}/ckpt", 2).restore(
        create_train_state(cfg.model, cfg.train), require=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def leaf(tree_name, path):
        node = variables["params" if tree_name == "params" else "batch_stats"]
        for p in path.split("/"):
            node = node[p]
        return np.asarray(node, np.float32)

    anon = {
        f"var_{i:03d}": leaf(t, p)
        for i, (t, p, _) in enumerate(model_leaf_order(variables))
    }
    src = str(tmp_path / "anon.npz")
    np.savez(src, **anon)
    log3 = str(tmp_path / "log3")
    convert_main(["--source", src, "--log_dir", log3, "--name_map", "auto",
                  "--config", os.path.join(embed_log_dir, "config.json")])
    np.testing.assert_allclose(embed_with(log3, "auto"), ref, atol=1e-6)

    with pytest.raises(ValueError, match="extension"):
        convert_main(["--source", str(tmp_path / "x.weird"),
                      "--log_dir", str(tmp_path / "log4")])


def test_convert_torch_source(embed_log_dir, tmp_path, rng):
    """A torch-saved archive (.pt) of the self-layout dict loads through
    torch.load and re-imports losslessly (the torch leg of load_source)."""
    torch = pytest.importorskip("torch")

    from epcnet_tpu.cli.convert import main as convert_main
    from epcnet_tpu.cli.embed import main as embed_main
    from epcnet_tpu.cli.export import main as export_main

    exp = str(tmp_path / "export")
    export_main(["--log_dir", embed_log_dir, "--output", exp])
    z = np.load(exp + ".npz")
    pt = str(tmp_path / "weights.pt")
    # wrapped {"state_dict": ...} form, tensors not arrays — both unwrapped
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(z[k]))
                               for k in z.files}}, pt)

    log2 = str(tmp_path / "log_pt")
    convert_main(["--source", pt, "--log_dir", log2,
                  "--config", os.path.join(embed_log_dir, "config.json")])

    cloud = str(tmp_path / "c2.npy")
    np.save(cloud, rng.uniform(-1, 1, (128, 3)).astype(np.float32))
    outs = []
    for ld in (embed_log_dir, log2):
        out = str(tmp_path / f"d_{os.path.basename(ld)}.npy")
        embed_main(["--log_dir", ld, "--output", out, cloud])
        outs.append(np.load(out))
    np.testing.assert_allclose(outs[1], outs[0], atol=1e-6)


def test_convert_self_rejects_truncated_archive(embed_log_dir, tmp_path):
    """A partial (or empty) self-layout archive must fail loudly instead of
    converting to part-random weights."""
    from epcnet_tpu.cli.convert import main as convert_main
    from epcnet_tpu.cli.export import main as export_main

    exp = str(tmp_path / "export")
    export_main(["--log_dir", embed_log_dir, "--output", exp])
    z = dict(np.load(exp + ".npz"))
    keys = sorted(z)
    half = {k: z[k] for k in keys[: len(keys) // 2]}
    src = str(tmp_path / "half.npz")
    np.savez(src, **half)
    with pytest.raises(ValueError, match="missing"):
        convert_main(["--source", src, "--log_dir", str(tmp_path / "lh"),
                      "--config", os.path.join(embed_log_dir, "config.json")])
    np.savez(str(tmp_path / "empty.npz"))
    with pytest.raises(ValueError, match="missing"):
        convert_main(["--source", str(tmp_path / "empty.npz"),
                      "--log_dir", str(tmp_path / "le"),
                      "--config", os.path.join(embed_log_dir, "config.json")])
