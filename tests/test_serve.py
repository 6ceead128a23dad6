"""PlaceIndex serving tests: add/query round trip, growth without shape
explosion, persistence."""

import numpy as np
import pytest

import jax

from epcnet_tpu.configs import TrainConfig
from epcnet_tpu.serve import PlaceIndex
from epcnet_tpu.train.state import create_train_state
from epcnet_tpu.train.step import build_embed_fn


@pytest.fixture(scope="module")
def index(tiny_model_cfg):
    tcfg = TrainConfig()
    state = create_train_state(tiny_model_cfg, tcfg, num_points=128)
    embed = build_embed_fn(tiny_model_cfg)
    return PlaceIndex(
        embed, state.params, state.batch_stats,
        descriptor_dim=tiny_model_cfg.output_dim, embed_batch=4, block_rows=64,
    )


def test_add_and_query_self(index, rng):
    pts = rng.uniform(-1, 1, (10, 128, 3)).astype(np.float32)
    index.add(pts, metadata=[f"submap_{i}" for i in range(10)])
    assert len(index) == 10
    ids, dists = index.query(pts[:3], k=1)
    # each submap's nearest neighbour is itself
    np.testing.assert_array_equal(ids[:, 0], [0, 1, 2])
    assert dists.max() < 1e-4
    assert index.metadata(ids[:, 0]) == ["submap_0", "submap_1", "submap_2"]


def test_incremental_growth(index, rng):
    before = len(index)
    more = rng.uniform(-1, 1, (7, 128, 3)).astype(np.float32)
    index.add(more)
    assert len(index) == before + 7
    ids, _ = index.query(more[:2], k=1)
    np.testing.assert_array_equal(ids[:, 0], [before, before + 1])


def test_query_empty_raises(tiny_model_cfg):
    tcfg = TrainConfig()
    state = create_train_state(tiny_model_cfg, tcfg, num_points=128)
    embed = build_embed_fn(tiny_model_cfg)
    empty = PlaceIndex(embed, state.params, state.batch_stats,
                       descriptor_dim=tiny_model_cfg.output_dim)
    with pytest.raises(ValueError, match="empty"):
        empty.query_descriptors(np.zeros((1, tiny_model_cfg.output_dim), np.float32))


def test_save_load(index, tmp_path):
    p = str(tmp_path / "index.npz")
    index.save(p)
    fresh = PlaceIndex(index._embed, index._params, index._stats,
                       descriptor_dim=index.dim)
    fresh.load_db(p)
    assert len(fresh) == len(index)
    q = index._db[:2]
    i1, _ = index.query_descriptors(q, k=3)
    i2, _ = fresh.query_descriptors(q, k=3)
    np.testing.assert_array_equal(i1, i2)


def test_place_index_with_mesh(rng, tiny_model_cfg, mesh8):
    """Sharded retrieval path inside PlaceIndex on the 8-device CPU mesh."""
    tcfg = TrainConfig()
    state = create_train_state(tiny_model_cfg, tcfg, num_points=128)
    embed = build_embed_fn(tiny_model_cfg)
    idx = PlaceIndex(embed, state.params, state.batch_stats,
                     descriptor_dim=tiny_model_cfg.output_dim,
                     embed_batch=4, block_rows=64, mesh=mesh8)
    pts = rng.uniform(-1, 1, (12, 128, 3)).astype(np.float32)
    idx.add(pts)
    ids_sharded, d_sharded = idx.query(pts[:3], k=2)
    # must agree with the unsharded index
    plain = PlaceIndex(embed, state.params, state.batch_stats,
                       descriptor_dim=tiny_model_cfg.output_dim,
                       embed_batch=4, block_rows=64)
    plain.add_descriptors(idx._db)
    ids_plain, d_plain = plain.query_descriptors(idx.embed(pts[:3]), k=2)
    np.testing.assert_array_equal(ids_sharded, ids_plain)


def test_concurrent_add_and_query(tiny_model_cfg, rng):
    """Interleaved add/query from many threads: no corruption, ids stay
    valid (append-only DB), every thread completes."""
    import threading

    tcfg = TrainConfig()
    state = create_train_state(tiny_model_cfg, tcfg, num_points=128)
    embed = build_embed_fn(tiny_model_cfg)
    idx = PlaceIndex(embed, state.params, state.batch_stats,
                     descriptor_dim=tiny_model_cfg.output_dim,
                     embed_batch=4, block_rows=32)
    seed_pts = rng.uniform(-1, 1, (8, 128, 3)).astype(np.float32)
    idx.add(seed_pts)

    errors = []

    def adder(tid):
        try:
            for i in range(5):
                pts = np.random.default_rng((tid, i)).uniform(
                    -1, 1, (3, 128, 3)).astype(np.float32)
                idx.add(pts, metadata=[f"t{tid}_{i}_{j}" for j in range(3)])
        except Exception as e:
            errors.append(e)

    def querier(tid):
        try:
            for i in range(8):
                ids, dists = idx.query(seed_pts[:2], k=2)
                assert ids.shape == (2, 2)
                assert (np.asarray(ids) >= 0).all()
                idx.metadata(ids)  # ids valid against current meta
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=adder, args=(t,)) for t in range(3)]
    threads += [threading.Thread(target=querier, args=(t,)) for t in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    assert len(idx) == 8 + 3 * 5 * 3


def test_query_scheduler_batches_and_matches(tiny_model_cfg, rng):
    """Concurrent single-submap submits return the same answers as direct
    queries AND actually share device batches (fewer query calls than
    requests)."""
    import threading

    from epcnet_tpu.serve import QueryScheduler

    tcfg = TrainConfig()
    state = create_train_state(tiny_model_cfg, tcfg, num_points=128)
    embed = build_embed_fn(tiny_model_cfg)
    idx = PlaceIndex(embed, state.params, state.batch_stats,
                     descriptor_dim=tiny_model_cfg.output_dim,
                     embed_batch=8, block_rows=32)
    db_pts = rng.uniform(-1, 1, (12, 128, 3)).astype(np.float32)
    idx.add(db_pts)

    calls = []
    real_query = idx.query

    def counting_query(pts, k=25):
        calls.append(pts.shape[0])
        return real_query(pts, k)

    idx.query = counting_query
    sched = QueryScheduler(idx, k=2, max_batch=8, max_wait_ms=50.0)
    try:
        queries = db_pts[:10]
        futs = [None] * len(queries)

        def submit(i):
            futs[i] = sched.submit(queries[i])

        threads = [threading.Thread(target=submit, args=(i,))
                   for i in range(len(queries))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        results = [f.result(timeout=120) for f in futs]
    finally:
        sched.stop()
    idx.query = real_query

    ids_direct, dists_direct = idx.query(queries, k=2)
    for i, (ids, dists) in enumerate(results):
        np.testing.assert_array_equal(ids, ids_direct[i])
        np.testing.assert_allclose(dists, dists_direct[i], atol=1e-6)
    assert sum(calls) == len(queries)
    assert len(calls) < len(queries)  # micro-batching actually aggregated


def test_from_checkpoint(tmp_path):
    """PlaceIndex.from_checkpoint: the full serving bootstrap path."""
    from epcnet_tpu.cli.train import main as train_main

    # own dataset root: --synthetic REGENERATES the dataset, which must not
    # mutate the shared session synthetic_root fixture
    synthetic_root = str(tmp_path / "ds")
    log_dir = str(tmp_path / "log")
    sets = [
        "model.num_points=128", "model.knn_k=6", "model.use_pallas=false",
        "model.proxyconv_channels=8,8", "model.lift_channels=16,32",
        "model.feature_dim=32", "model.vlad_clusters=4", "model.vlad_groups=2",
        "model.vlad_group_dim=8",
        "data.num_points=128", "data.num_negatives=3", "data.num_positives=1",
        "train.max_epoch=1", "train.mining_start_epoch=99",
        "train.checkpoint_every_steps=1000000",
    ]
    args = ["--dataset_root", synthetic_root, "--log_dir", log_dir, "--synthetic"]
    for s in sets:
        args += ["--set", s]
    train_main(args)

    idx = PlaceIndex.from_checkpoint(log_dir, embed_batch=4)
    pts = np.random.default_rng(0).uniform(-1, 1, (6, 128, 3)).astype(np.float32)
    idx.add(pts)
    ids, dists = idx.query(pts[:2], k=1)
    np.testing.assert_array_equal(ids[:, 0], [0, 1])
    assert dists.max() < 1e-4


def test_http_server_endpoints(tiny_model_cfg, rng):
    """cli/serve.py: healthz/embed/add/query/query_batch over real HTTP,
    with concurrent /query calls sharing the scheduler's micro-batches."""
    import json
    import threading
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    from epcnet_tpu.cli.serve import make_server

    tcfg = TrainConfig()
    state = create_train_state(tiny_model_cfg, tcfg, num_points=128)
    embed = build_embed_fn(tiny_model_cfg)
    index = PlaceIndex(
        embed, state.params, state.batch_stats,
        descriptor_dim=tiny_model_cfg.output_dim, embed_batch=4, block_rows=64,
    )
    srv, sched = make_server(index, port=0, k=3, max_wait_ms=20.0)
    host, port = srv.server_address
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()

    def call(path, payload=None):
        url = f"http://{host}:{port}{path}"
        if payload is None:
            req = urllib.request.Request(url)
        else:
            req = urllib.request.Request(
                url, json.dumps(payload).encode(),
                {"Content-Type": "application/json"},
            )
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read())

    try:
        dim = tiny_model_cfg.output_dim
        assert call("/healthz") == {"ok": True, "size": 0, "dim": dim}

        pts = rng.uniform(-1, 1, (6, 128, 3)).astype(np.float32)
        out = call("/add", {"points": pts.tolist(),
                            "metadata": [f"s{i}" for i in range(6)]})
        assert out == {"size": 6}

        d = call("/embed", {"points": pts[:2].tolist()})
        assert np.asarray(d["descriptors"]).shape == (2, dim)

        # concurrent single-submap queries -> micro-batched self-retrieval
        with ThreadPoolExecutor(4) as ex:
            results = list(ex.map(
                lambda i: call("/query", {"points": pts[i].tolist(), "k": 1}),
                range(6),
            ))
        for i, r in enumerate(results):
            assert r["ids"][0] == i and r["metadata"][0] == f"s{i}"

        rb = call("/query_batch", {"points": pts[:3].tolist(), "k": 2})
        assert np.asarray(rb["ids"]).shape == (3, 2)
        assert [row[0] for row in rb["ids"]] == [0, 1, 2]

        # error paths stay JSON
        import urllib.error
        try:
            call("/query", {"k": 1})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "error" in json.loads(e.read())
    finally:
        srv.shutdown()
        sched.stop()


def test_scheduler_mixed_shapes_isolated(tiny_model_cfg, rng):
    """Mixed-shape concurrent submissions are grouped per shape, so a
    different-sized submap neither poisons the others' batch nor fails —
    each group is served at its own compiled shape."""
    from epcnet_tpu.serve import QueryScheduler

    tcfg = TrainConfig()
    state = create_train_state(tiny_model_cfg, tcfg, num_points=128)
    embed = build_embed_fn(tiny_model_cfg)
    index = PlaceIndex(
        embed, state.params, state.batch_stats,
        descriptor_dim=tiny_model_cfg.output_dim, embed_batch=4, block_rows=64,
    )
    pts = rng.uniform(-1, 1, (6, 128, 3)).astype(np.float32)
    index.add(pts)
    sched = QueryScheduler(index, k=2, max_wait_ms=30.0)
    try:
        good = [sched.submit(pts[i]) for i in range(3)]
        odd = sched.submit(pts[0][:64])  # different point count: own group
        for i, f in enumerate(good):
            ids, _ = f.result(timeout=60)
            assert ids[0] == i  # self-retrieval unaffected by the odd request
        ids, dists = odd.result(timeout=60)
        assert ids.shape == (2,) and np.isfinite(dists).all()
    finally:
        sched.stop()
