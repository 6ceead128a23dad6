"""Descriptor serving: an online place-recognition index.

The reference has no serving layer — its CLI drivers are the whole API
[LINEAGE; SURVEY.md §3.5]. Production place recognition needs one: embed
incoming submaps, add them to a descriptor database, answer nearest-place
queries at low latency. This module provides that as a small library:

  service = PlaceIndex.from_checkpoint(log_dir)        # or from state
  service.add(points_batch, metadata...)               # extend the DB
  ids, dists = service.query(points_batch, k=25)       # embed + retrieve
  service.save(path) / PlaceIndex.load(path, ...)      # persistence

  sched = QueryScheduler(service, k=25)                # concurrent serving
  fut = sched.submit(points_one_submap)                # micro-batched
  ids, dists = fut.result()

TPU mapping: embedding runs the jitted model at a fixed batch shape (one
compiled program, padded tail); retrieval is the exact MXU top-k
(ops/retrieval.py), switching to the ICI-sharded path automatically when a
mesh with a "db" axis is supplied (BASELINE config #5). The DB grows in
fixed-size device-resident blocks so adds never recompile. ``quantize=
"int8"`` stores the device DB int8 + per-row scale (4x the rows per chip of
HBM; dequantization happens in-jit per shard, host DB and save/load stay
fp32-lossless) — the capacity knob for pod-scale databases.

Concurrency: PlaceIndex is thread-safe for interleaved add/query — a lock
guards the host bookkeeping while the heavy device work runs on immutable
snapshots outside it. The DB is append-only, so result ids stay valid
across concurrent adds. Host->device sync is CHUNKED and runs outside the
bookkeeping lock; ``sync_mode="background"`` additionally moves it to a
daemon thread so bulk ingest never stalls queries (bounded staleness over
a consistent prefix; ``flush()`` restores read-your-writes on demand).
QueryScheduler aggregates concurrent single-submap queries into one padded
device batch (the classic dynamic-batching serving front-end):
latency-bound callers share MXU dispatches instead of queueing behind each
other.
"""

from __future__ import annotations

import collections
import functools
import os
import queue
import threading
import time
from concurrent.futures import Future, InvalidStateError
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from epcnet_tpu.configs import ExperimentConfig
from epcnet_tpu.ops.retrieval import (
    quantize_descriptors,
    sharded_topk_neighbors,
    topk_neighbors,
    topk_neighbors_quantized,
)
from epcnet_tpu.train.checkpoint import CheckpointManager
from epcnet_tpu.train.state import create_train_state
from epcnet_tpu.train.step import build_embed_fn


def _pad_rows(arr: np.ndarray, multiple: int) -> np.ndarray:
    """Zero-pad the leading axis up to the next ``multiple`` — the
    compile-shape bucketing every query/embed path shares (variable sizes
    would compile one XLA program per distinct size; docs/SERVING.md)."""
    pad = (-arr.shape[0]) % multiple
    if not pad:
        return arr
    return np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])


class PlaceIndex:
    def __init__(
        self,
        embed_fn,
        params,
        batch_stats,
        descriptor_dim: int = 256,
        embed_batch: int = 32,
        block_rows: int = 4096,
        mesh=None,
        quantize: str = "none",
        max_k: int = 25,
        num_points: int | None = None,
        sync_mode: str = "blocking",
        sync_chunk_rows: int | None = None,
        warm_on_grow: bool = True,
    ):
        if quantize not in ("none", "int8"):
            raise ValueError(f"quantize={quantize!r} not in {{'none', 'int8'}}")
        if sync_mode not in ("blocking", "background"):
            raise ValueError(
                f"sync_mode={sync_mode!r} not in {{'blocking', 'background'}}"
            )
        # sync_mode governs when freshly-added rows become query-visible:
        #   "blocking"   — read-your-writes: a query waits until every row
        #                  added before it is device-resident (the transfer
        #                  itself is chunked and runs OUTSIDE the bookkeeping
        #                  lock, so adds/metrics/metadata never stall behind
        #                  it — only the querying caller pays).
        #   "background" — bounded staleness: adds kick a daemon thread that
        #                  syncs in sync_chunk_rows chunks; queries run
        #                  immediately against the resident consistent PREFIX
        #                  of the append-only DB (ids stay valid), so a bulk
        #                  ingest never stalls the query path. flush() gives
        #                  read-your-writes on demand. Measured motivation:
        #                  a ~600k-row sync is 11-30 s through the host link
        #                  (hwevidence/r04/serve_scale.json append_events) —
        #                  under "blocking" every query issued during a giant
        #                  append serialized behind the full transfer.
        self.sync_mode = sync_mode
        # warm_on_grow: when a sync grows the device capacity, compile the
        # query program for the NEW capacity inside the sync (before the
        # grown buffer is installed) instead of inside the first client
        # query at that capacity. Measured motivation: the round-5 scale
        # ladder caught exactly one such compile landing inside the timed
        # window as a 58 s p99 outlier at the int8 10^6-row rung
        # (hwevidence/r05/serve_scale.json) — capacity growths are log-many,
        # so the amortized cost is a handful of compiles per DB lifetime,
        # and the persistent compile cache makes redeploys free.
        self.warm_on_grow = warm_on_grow
        # submap size the embed program expects (warmup's default shape);
        # from_checkpoint fills it from the run's data config
        self.num_points = num_points
        # max_k bounds the FUSED path's static top-k (see query): the fused
        # program always retrieves max_k rows and the per-request k trims on
        # host, so the model+retrieve program compiles once per DB-capacity
        # doubling — NOT once per distinct k=min(k, len(db)) (which would
        # recompile the full model on every add while the DB is small, and
        # turn a client k-sweep into a compile storm). Requests with
        # k > max_k fall back to the two-step path.
        self.max_k = max_k
        self._embed = embed_fn
        self._params = params
        self._stats = batch_stats
        self.dim = descriptor_dim
        self.embed_batch = embed_batch
        self.block_rows = block_rows
        # One sync step transfers at most this many rows (rounded up to a
        # block multiple, so the compiled update-shape set stays bounded:
        # block multiples <= sync_chunk_rows). Bounds how long one chunk
        # occupies the device/host link — queries interleave between chunks.
        chunk = sync_chunk_rows or 8 * block_rows
        self.sync_chunk_rows = max(block_rows,
                                   -(-chunk // block_rows) * block_rows)
        self.mesh = mesh
        # quantize="int8": the device DB is stored int8 + per-row fp32 scale
        # (ops/retrieval.py quantize_descriptors) — 4x less HBM per row, ~4e-4
        # max dequantization error on unit-norm descriptors. The host _db
        # stays the fp32 master (save/load are lossless); quantization is a
        # device-residency format only.
        self.quantize = quantize
        self._db = np.zeros((0, descriptor_dim), np.float32)
        self._meta: list = []
        # Device DB: an append-only capacity-doubling buffer. Adds transfer
        # ONLY the new rows host->device (dynamic_update_slice into the
        # preallocated region); growth copies device->device at HBM speed.
        # Re-uploading the whole DB per add/query cycle — the old behaviour —
        # is O(DB) over PCIe/tunnel per add, which dominates at the pod-scale
        # DBs this layer targets (VERDICT r2 weak #3). No donation: query
        # threads compute on immutable snapshots OUTSIDE the lock, so the
        # append must be functional (the copy it pays runs at HBM bandwidth).
        self._dev_db = None  # [capacity, dim] device buffer, far-padded tail
        self._dev_scale = None  # [capacity, 1] fp32 row scales (int8 mode)
        self._dev_rows = 0  # rows of _db already resident on device
        self._use_sharded = (
            mesh is not None and "db" in mesh.shape and mesh.shape["db"] > 1
        )
        self._db_sharding = None
        if self._use_sharded:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._db_sharding = NamedSharding(mesh, P("db"))
        self._append_fn = jax.jit(
            lambda db, upd, start: jax.lax.dynamic_update_slice(
                db, upd, (start, jnp.int32(0))
            ),
            out_shardings=self._db_sharding,
        )
        # int8 mode: new fp32 rows quantize ON DEVICE inside the append jit
        # (one source of truth — ops/retrieval.py), updating both buffers.
        pair_sh = (
            None
            if self._db_sharding is None
            else (self._db_sharding, self._db_sharding)
        )

        def _append_quantized(db, sc, upd, start):
            qi, qs = quantize_descriptors(upd)
            return (
                jax.lax.dynamic_update_slice(db, qi, (start, jnp.int32(0))),
                jax.lax.dynamic_update_slice(sc, qs, (start, jnp.int32(0))),
            )

        self._append_fn_q = jax.jit(_append_quantized, out_shardings=pair_sh)
        # Fused embed+retrieve (the unsharded serving hot path): ONE jitted
        # program embeds the padded query batch AND retrieves against the
        # device DB, so a scheduler dispatch costs ONE device round trip
        # instead of two (embed, then top-k). Each dispatch carries a ~35 ms
        # floor through the axon tunnel (docs/KERNELS.md "tunnel tax"), and
        # on any deployment this halves launch overhead per micro-batch.
        # Compiled per (db capacity, k): capacities double (log many
        # shapes), the scheduler uses one fixed k.
        if embed_fn is not None:

            @functools.partial(jax.jit, static_argnames=("k",))
            def _fused_query_f(params, stats, pts, db, k: int):
                return topk_neighbors(embed_fn(params, stats, pts), db, k)

            @functools.partial(jax.jit, static_argnames=("k",))
            def _fused_query_q(params, stats, pts, db, scale, k: int):
                return topk_neighbors_quantized(
                    embed_fn(params, stats, pts), db, scale, k
                )

            self._fused_f = _fused_query_f
            self._fused_q = _fused_query_q
        else:
            self._fused_f = self._fused_q = None
        self._lock = threading.RLock()  # guards _db/_meta/_dev_db bookkeeping
        # Serializes device-sync WORK (transfer + growth), which runs outside
        # _lock. Lock order is always _sync_lock -> _lock, never the reverse.
        self._sync_lock = threading.Lock()
        self._sync_cv = threading.Condition(self._lock)  # _dev_rows progress
        self._sync_thread = None  # background worker (sync_mode="background")
        self._sync_error: BaseException | None = None
        # Monotonic operation counters (production monitoring — GET /metrics
        # on the HTTP server). Mutated only under the lock / by the single
        # sync path, read without (snapshot semantics are fine for gauges).
        self._counters = {"adds": 0, "rows_added": 0, "queries": 0,
                          "query_rows": 0, "dev_syncs": 0}

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(
        cls, log_dir: str, mesh=None, embed_batch: int = 32,
        quantize: str = "none", max_k: int = 25,
        sync_mode: str = "blocking", sync_chunk_rows: int | None = None,
        warm_on_grow: bool = True,
    ):
        cfg_path = os.path.join(log_dir, "config.json")
        cfg = (
            ExperimentConfig.from_json(open(cfg_path).read())
            if os.path.isfile(cfg_path)
            else ExperimentConfig()
        )
        state = create_train_state(cfg.model, cfg.train)
        state = CheckpointManager(f"{log_dir}/ckpt").restore(state, require=True)
        embed = build_embed_fn(cfg.model)
        return cls(
            embed,
            state.params,
            state.batch_stats,
            cfg.model.output_dim,
            embed_batch,
            mesh=mesh,
            quantize=quantize,
            max_k=max_k,
            num_points=cfg.data.num_points,
            sync_mode=sync_mode,
            sync_chunk_rows=sync_chunk_rows,
            warm_on_grow=warm_on_grow,
        )

    # ------------------------------------------------------------------
    def embed(self, points: np.ndarray) -> np.ndarray:
        """[B, N, 3] -> [B, dim] descriptors, fixed-shape batched (padded
        tail) so serving never recompiles."""
        n = points.shape[0]
        out = np.zeros((n, self.dim), np.float32)
        bs = self.embed_batch
        for s in range(0, n, bs):
            chunk = points[s : s + bs]
            got = chunk.shape[0]
            chunk = _pad_rows(np.asarray(chunk), bs)
            d = np.asarray(self._embed(self._params, self._stats, jnp.asarray(chunk)))
            out[s : s + got] = d[:got]
        return out

    def add(self, points: np.ndarray, metadata: Sequence | None = None) -> None:
        self.add_descriptors(self.embed(points), metadata)

    def add_descriptors(self, desc: np.ndarray, metadata: Sequence | None = None) -> None:
        if metadata is not None and len(metadata) != len(desc):
            # a silent length mismatch would permanently skew id->metadata
            # alignment for every later query
            raise ValueError(
                f"metadata length {len(metadata)} != batch size {len(desc)}"
            )
        with self._lock:
            self._db = np.concatenate([self._db, desc.astype(np.float32)], axis=0)
            self._meta.extend(metadata if metadata is not None else [None] * len(desc))
            self._counters["adds"] += 1
            self._counters["rows_added"] += len(desc)
            # "blocking": device sync is lazy (next query) — adds stay cheap
            # and bursts coalesce. "background": start syncing now so the
            # rows are (likely) already resident by the first query.
        if self.sync_mode == "background":
            self._kick_background_sync()

    def __len__(self) -> int:
        with self._lock:
            return len(self._db)

    # ------------------------------------------------------------------
    def query(self, points: np.ndarray, k: int = 25):
        """Embed + retrieve. Returns (ids [B, k], sqdists [B, k]).

        Batches up to ``embed_batch`` on an unsharded index take the fused
        single-dispatch path (see __init__); larger batches and mesh-sharded
        indexes go embed-then-retrieve."""
        n = points.shape[0]
        if (
            self._fused_f is not None
            and not self._use_sharded
            and 0 < n <= self.embed_batch
            and k <= self.max_k
        ):
            dbj, scj, kk = self._snapshot_db(n, k)
            # STATIC top-k = min(max_k, capacity): the capacity tail is
            # far-padded, so with len(db) real rows the first len(db)
            # results are always real — host-trimming to kk <= len(db) is
            # exact while the compiled program depends only on capacity.
            k_fused = min(self.max_k, int(dbj.shape[0]))
            pts = jnp.asarray(_pad_rows(np.asarray(points, np.float32),
                                        self.embed_batch))
            if self.quantize == "int8":
                idx, dist = self._fused_q(
                    self._params, self._stats, pts, dbj, scj, k=k_fused
                )
            else:
                idx, dist = self._fused_f(
                    self._params, self._stats, pts, dbj, k=k_fused
                )
            return np.asarray(idx)[:n, :kk], np.asarray(dist)[:n, :kk]
        return self.query_descriptors(self.embed(points), k)

    def _snapshot_db(self, n_query_rows: int, k: int):
        """Consistent (dev_db, scale, clamped-k) snapshot — the device
        compute runs OUTSIDE the lock on the immutable buffers, so queries
        never serialize behind each other or behind adds. The one source of
        truth for the empty check, the k clamp, the sync policy, and the
        query counters (shared by the fused and two-step paths).

        "blocking": waits for full device residency (read-your-writes).
        "background": returns immediately against the resident PREFIX of
        the append-only DB (the first query ever waits for chunk one)."""
        with self._lock:
            if len(self._db) == 0:
                raise ValueError("empty index")
            if k < 1:
                # a negative k would silently mis-slice the host trim
                raise ValueError(f"k={k} must be >= 1")
        if self.sync_mode == "blocking":
            self._ensure_synced()
        else:
            self._kick_background_sync()
        with self._lock:
            while self._dev_rows == 0 or self._dev_db is None:
                # background mode, nothing resident yet: the first chunk is
                # the minimum a query can run against — wait for it (bounded
                # by one sync_chunk_rows transfer, not the whole backlog)
                self._raise_sync_error()
                self._sync_cv.wait(timeout=1.0)
            self._raise_sync_error()
            # clamp to the VISIBLE prefix: rows beyond _dev_rows are not on
            # device yet (background mode) — the far-padded tail keeps the
            # top-kk of the prefix exact
            kk = min(k, self._dev_rows)
            self._counters["queries"] += 1
            self._counters["query_rows"] += n_query_rows
            return self._dev_db, self._dev_scale, kk

    def _raise_sync_error(self) -> None:
        """Surface a background-sync failure on the caller's thread (call
        under the lock) instead of losing it in a daemon thread."""
        if self._sync_error is not None:
            err, self._sync_error = self._sync_error, None
            raise RuntimeError("background device sync failed") from err

    def query_descriptors(self, desc: np.ndarray, k: int = 25):
        dbj, scj, kk = self._snapshot_db(desc.shape[0], k)
        # Pad the query batch up to an embed_batch multiple: QueryScheduler
        # micro-batches are variable-sized (1..max_batch), and an unpadded
        # retrieval would compile one program per distinct size — measured as
        # a 1.18 s p99 outlier (vs 121 ms p50) on the v5e load test when the
        # first full-width batch arrived. Padding bounds the compiled-shape
        # set to multiples of embed_batch, same policy as embed().
        n = desc.shape[0]
        q = jnp.asarray(_pad_rows(desc.astype(np.float32), self.embed_batch))
        # STATIC program top-k, capacity-keyed — same policy as the fused
        # path: for requests within max_k the compiled program retrieves
        # min(max_k, capacity) rows regardless of len(db) (the far-padded
        # capacity tail guarantees the first len(db) >= kk results are
        # real), and the per-request kk trims on host. Without this, every
        # query while len(db) < k compiled a fresh program (kk = 1, 2, ...)
        # — a cold-start compile inside a client's latency budget that
        # warmup() could never cover. k > max_k falls back to a per-k
        # compile (documented escape hatch, same as the fused path).
        k_prog = min(self.max_k, int(dbj.shape[0])) if k <= self.max_k else kk
        idx, dist = self._retrieve(q, dbj, scj, k_prog)
        return np.asarray(idx)[:n, :kk], np.asarray(dist)[:n, :kk]

    def _retrieve(self, q, dbj, scj, k_prog: int):
        """One dispatch point for descriptor-space retrieval (sharded vs
        int8 vs plain) — shared by query_descriptors and warmup so the
        warmed program is BY CONSTRUCTION the one queries run."""
        if self._use_sharded:
            return sharded_topk_neighbors(
                q, dbj, k_prog, self.mesh,
                db_scale=scj if self.quantize == "int8" else None,
            )
        if self.quantize == "int8":
            return topk_neighbors_quantized(q, dbj, scj, k_prog)
        return topk_neighbors(q, dbj, k_prog)

    def _ensure_synced(self) -> None:
        """Bring the device DB fully up to date (read-your-writes), one
        sync_chunk_rows chunk at a time. The heavy transfer runs outside
        the bookkeeping lock — only the caller waits, not the index."""
        while True:
            with self._sync_lock:
                with self._lock:
                    self._raise_sync_error()
                backlog = self._sync_chunk()
            if backlog <= 0:
                return

    def flush(self) -> None:
        """Block until every row added so far is device-resident — the
        read-your-writes barrier for sync_mode="background" (a no-op after
        any query in "blocking" mode)."""
        self._ensure_synced()

    def _kick_background_sync(self) -> None:
        """Start (or reuse) the daemon sync worker. The worker clears
        _sync_thread under the lock only after confirming zero backlog, so
        an add racing its exit either sees it alive (the worker re-checks
        before exiting) or starts a fresh one."""
        with self._lock:
            if self._sync_thread is not None:
                return
            if self._dev_rows == len(self._db) and self._dev_db is not None:
                return
            t = threading.Thread(target=self._background_sync_loop,
                                 daemon=True, name="placeindex-sync")
            self._sync_thread = t
        t.start()

    def _background_sync_loop(self) -> None:
        while True:
            try:
                with self._sync_lock:
                    backlog = self._sync_chunk()
            except BaseException as e:  # surface on the next query/flush
                with self._lock:
                    self._sync_error = e
                    self._sync_thread = None
                    self._sync_cv.notify_all()
                return
            if backlog <= 0:
                with self._lock:
                    if self._dev_rows == len(self._db):
                        self._sync_thread = None
                        return
                    # rows landed between the chunk and this check: loop

    def _sync_chunk(self) -> int:
        """Advance the device DB by at most sync_chunk_rows rows. Returns
        the remaining backlog. Caller must hold _sync_lock (serializes sync
        work); _lock is taken only briefly for the snapshot and the install,
        so adds/queries/metrics proceed while the transfer is in flight.
        Correctness: the host DB is append-only (rows never mutate) and the
        device append is functional (no donation), so in-flight queries keep
        computing on their older — still consistent — snapshot buffers.
        Compiled program count stays bounded: capacities double (log many
        shapes) and update sizes are block multiples <= sync_chunk_rows."""
        with self._lock:
            db_ref = self._db  # append-only: the array object never mutates
            n = len(db_ref)
            dev_db, dev_scale, dev_rows = (
                self._dev_db, self._dev_scale, self._dev_rows
            )
        if n == 0 or (dev_rows == n and dev_db is not None):
            return 0
        cap = 0 if dev_db is None else dev_db.shape[0]
        # this chunk's pending rows, quantized up to a block multiple (1e6
        # filler rows in the quantization tail are overwritten by the next
        # sync once more rows land)
        start = (dev_rows // self.block_rows) * self.block_rows
        end = min(n, start + self.sync_chunk_rows)
        rows = -(-end // self.block_rows) * self.block_rows
        need = rows - start
        upd = np.full((need, self.dim), 1e6, np.float32)
        upd[: end - start] = db_ref[start:end]
        quant = self.quantize == "int8"
        if rows > cap:
            # capacity growth: geometric, device-side; the old buffer's rows
            # copy at HBM bandwidth, never back over the host link
            new_cap = max(self.block_rows, cap)
            while new_cap < rows:
                new_cap *= 2
            # filler is created ON DEVICE (jnp.full lowers to an XLA fill);
            # int8 filler 127 with a 1e6 scale dequantizes to a far row
            grow = max(new_cap - cap, 0)
            if quant:
                fresh = jnp.full((grow, self.dim), 127, jnp.int8)
                fresh_sc = jnp.full((grow, 1), 1e6, jnp.float32)
                dev_db = fresh if dev_db is None else jnp.concatenate(
                    [dev_db, fresh]
                )
                dev_scale = fresh_sc if dev_scale is None else jnp.concatenate(
                    [dev_scale, fresh_sc]
                )
                if self._db_sharding is not None:
                    dev_db = jax.device_put(dev_db, self._db_sharding)
                    dev_scale = jax.device_put(dev_scale, self._db_sharding)
            else:
                fresh = jnp.full((grow, self.dim), 1e6, jnp.float32)
                dev_db = fresh if dev_db is None else jnp.concatenate(
                    [dev_db, fresh]
                )
                if self._db_sharding is not None:
                    dev_db = jax.device_put(dev_db, self._db_sharding)
        if quant:
            dev_db, dev_scale = self._append_fn_q(
                dev_db, dev_scale, jnp.asarray(upd), jnp.int32(start)
            )
        else:
            dev_db = self._append_fn(dev_db, jnp.asarray(upd), jnp.int32(start))
        if rows > cap and self.warm_on_grow:
            # compile the query program for the NEW capacity before the
            # grown buffer becomes visible: concurrent queries keep running
            # compiled programs on the old snapshot meanwhile, so no client
            # ever pays the per-capacity compile (measured as a 58 s p99
            # outlier when it landed inside a query — see __init__).
            self._warm_at_capacity(dev_db, dev_scale)
        # install the chunk: in-flight queries keep their old (functional)
        # snapshot buffers; new snapshots see rows [0, end)
        with self._lock:
            self._dev_db, self._dev_scale = dev_db, dev_scale
            self._dev_rows = end
            self._counters["dev_syncs"] += 1
            self._sync_cv.notify_all()
            return len(self._db) - end

    def warmup(self, num_points: int | None = None) -> None:
        """Pre-compile the serving programs before traffic arrives.

        Without this the FIRST request after a (re)deploy pays the full XLA
        compile of the fused embed+retrieve program (tens of seconds for the
        paper-scale model) inside its latency budget. Warmup runs each
        program once on zeros at the exact shapes serving uses: the embed
        program (``/embed``, ``add``) and the query program at the capacity
        the first query will see — the real synced DB if rows exist, else a
        dummy far-padded first capacity block (``block_rows``), which is the
        same compiled shape the first post-add query hits, WITHOUT touching
        index state or metrics. Pairs with ``enable_compilation_cache``:
        warmup populates the persistent cache, so later redeploys warm from
        disk in seconds.

        ``num_points`` defaults to the value the index was constructed with
        (from_checkpoint fills it from the run's data config).
        """
        num_points = num_points or self.num_points
        if num_points is None and self._embed is not None:
            raise ValueError(
                "warmup needs num_points (pass it, or construct the index "
                "with num_points=...)"
            )
        if self._embed is not None:
            pts = jnp.zeros((self.embed_batch, num_points, 3), jnp.float32)
            np.asarray(self._embed(self._params, self._stats, pts))
        quant = self.quantize == "int8"
        if len(self) > 0:
            self._ensure_synced()  # full residency before traffic, any mode
            with self._lock:
                dbj, scj = self._dev_db, self._dev_scale
        else:
            dbj = scj = None
        if dbj is None:
            # empty index: compile against a dummy first capacity block —
            # identical shapes (and far-pad values) to _sync_chunk's
            cap = self.block_rows
            if quant:
                dbj = jnp.full((cap, self.dim), 127, jnp.int8)
                scj = jnp.full((cap, 1), 1e6, jnp.float32)
            else:
                dbj = jnp.full((cap, self.dim), 1e6, jnp.float32)
            if self._db_sharding is not None:
                dbj = jax.device_put(dbj, self._db_sharding)
                if quant:
                    scj = jax.device_put(scj, self._db_sharding)
        self._warm_at_capacity(dbj, scj, num_points)

    def _warm_at_capacity(self, dbj, scj, num_points: int | None = None):
        """Run the query program once on zeros at this DB buffer's shapes,
        blocking until the XLA compile + run completes. The program-warming
        core shared by :meth:`warmup` (cold start) and — ``warm_on_grow`` —
        by ``_sync_chunk`` right after a capacity growth, so the compiled
        program a query needs always exists BEFORE the buffer it targets
        becomes visible."""
        num_points = num_points or self.num_points
        k_fused = min(self.max_k, int(dbj.shape[0]))
        if self._use_sharded or self._embed is None or num_points is None:
            # two-step path, through the SAME dispatcher queries use
            # (query_descriptors compiles at the same capacity-keyed k).
            # Also the fallback when no points shape is known: a fused warm
            # cannot synthesize a submap, but the retrieval side — the part
            # whose shape just changed — still warms.
            q = jnp.zeros((self.embed_batch, self.dim), jnp.float32)
            idx, _ = self._retrieve(q, dbj, scj, k_fused)
        elif self.quantize == "int8":
            pts = jnp.zeros((self.embed_batch, num_points, 3), jnp.float32)
            idx, _ = self._fused_q(
                self._params, self._stats, pts, dbj, scj, k=k_fused
            )
        else:
            pts = jnp.zeros((self.embed_batch, num_points, 3), jnp.float32)
            idx, _ = self._fused_f(
                self._params, self._stats, pts, dbj, k=k_fused
            )
        np.asarray(idx)  # block until the compile + run completes

    def metrics(self) -> dict:
        """Operational gauges + counters for monitoring (GET /metrics)."""
        with self._lock:
            cap = 0 if self._dev_db is None else int(self._dev_db.shape[0])
            dev_bytes = 0
            if self._dev_db is not None:
                dev_bytes = int(self._dev_db.size) * (
                    1 if self.quantize == "int8" else 4
                )
                if self._dev_scale is not None:
                    dev_bytes += int(self._dev_scale.size) * 4
            return {
                "size": len(self._db),
                "dim": self.dim,
                "quantize": self.quantize,
                "sharded": self._use_sharded,
                "sync_mode": self.sync_mode,
                "device_rows_capacity": cap,
                "device_bytes": dev_bytes,
                "device_synced_rows": self._dev_rows,
                "sync_backlog_rows": len(self._db) - self._dev_rows,
                **self._counters,
            }

    def metadata(self, ids) -> list:
        # append-only DB: ids from any earlier query remain valid
        with self._lock:
            return [self._meta[int(i)] for i in np.asarray(ids).ravel()]

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with self._lock:
            db, meta = self._db, list(self._meta)
        # 1-D object array ALWAYS: np.array(list_of_equal_length_sequences,
        # dtype=object) silently builds a 2-D array, so reloaded metadata
        # rows came back as np.ndarrays that json.dumps (the HTTP /query
        # response) cannot serialize
        meta_arr = np.empty(len(meta), dtype=object)
        meta_arr[:] = meta
        # write through a file object: savez_compressed appends ".npz" to a
        # STRING path, breaking the save(p) -> load_db(p) round trip for
        # extensionless paths
        with open(path, "wb") as f:
            np.savez_compressed(f, db=db, meta=meta_arr)

    def load_db(self, path: str) -> None:
        if not os.path.isfile(path) and os.path.isfile(path + ".npz"):
            path += ".npz"  # legacy saves went through a string path
        data = np.load(path, allow_pickle=True)
        db = data["db"]
        if db.ndim != 2 or db.shape[1] != self.dim:
            # fail at load time with the real story, not on the first query
            # deep inside a jitted distance program
            raise ValueError(
                f"{path}: db shape {db.shape} does not match this index's "
                f"descriptor_dim={self.dim} (saved from a different model?)"
            )
        meta = data["meta"]
        if meta.ndim > 1:  # legacy 2-D object saves: restore row entries
            meta = [list(row) for row in meta]
        # _sync_lock first (same order as every sync path): a background
        # chunk computed from the OLD _db must not install after the swap
        with self._sync_lock:
            with self._lock:
                self._db = db.astype(np.float32)
                self._meta = list(meta)
                self._dev_db = None  # full reload: next query re-syncs from row 0
                self._dev_scale = None
                self._dev_rows = 0


def _resolve_future(setter, value) -> None:
    """Resolve a caller's Future without ever killing the worker thread: a
    caller that cancelled (or a future somehow already resolved) raises
    InvalidStateError from set_result/set_exception — the caller gave up on
    the answer; the OTHER callers in the micro-batch must still get theirs
    and the worker must keep serving."""
    try:
        setter(value)
    except InvalidStateError:
        pass


class QueryScheduler:
    """Dynamic micro-batching front-end for concurrent queries.

    Callers submit ONE submap each and get a Future; a single worker thread
    aggregates up to ``max_batch`` pending requests within ``max_wait_ms``
    and serves them as one padded device batch — concurrent callers share
    MXU dispatches instead of queueing behind each other (the reference has
    no serving layer at all; SURVEY.md §3.5).
    """

    def __init__(
        self,
        index: "PlaceIndex",
        k: int = 25,
        max_batch: int | None = None,
        max_wait_ms: float = 2.0,
    ):
        self.index = index
        self.k = k
        self.max_batch = max_batch or index.embed_batch
        self._max_wait = max_wait_ms / 1e3
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        # Monitoring: cumulative counters + a bounded window of recent
        # per-request latencies (submit -> result, seconds). Written only by
        # the single worker thread; deque appends are atomic, so metrics()
        # reads need no lock.
        self._counters = {"requests": 0, "dispatches": 0, "errors": 0}
        self._recent_lat = collections.deque(maxlen=1024)
        # guards _recent_lat: deque APPENDS are atomic, but metrics() must
        # ITERATE (sorted), and any concurrent append invalidates a live
        # deque iterator (RuntimeError) — a /metrics scrape under query load
        # would intermittently 500
        self._lat_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, points: np.ndarray) -> Future:
        """points: [N, 3] one submap -> Future of (ids [k], sqdists [k])."""
        if self._stop.is_set():
            raise RuntimeError("scheduler stopped")
        fut: Future = Future()
        self._q.put((np.asarray(points), fut, time.perf_counter()))
        return fut

    def _run(self):
        while not self._stop.is_set():
            try:
                batch = [self._q.get(timeout=0.1)]
            except queue.Empty:
                continue
            deadline = time.perf_counter() + self._max_wait
            while len(batch) < self.max_batch:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            # group by shape: one odd-sized (or malformed) request must not
            # poison the other callers' micro-batch — each shape group is
            # served (and fails) independently
            groups: dict = {}
            for pts, fut, t0 in batch:
                groups.setdefault(getattr(pts, "shape", None), []).append(
                    (pts, fut, t0)
                )
            for group in groups.values():
                self._counters["dispatches"] += 1
                self._counters["requests"] += len(group)
                try:
                    pts = np.stack([g[0] for g in group])
                    ids, dists = self.index.query(pts, self.k)
                    done = time.perf_counter()
                    for i, (_, fut, t0) in enumerate(group):
                        with self._lat_lock:
                            self._recent_lat.append(done - t0)
                        _resolve_future(fut.set_result, (ids[i], dists[i]))
                except Exception as e:  # propagate to this group's callers only
                    self._counters["errors"] += len(group)
                    for _, fut, _t0 in group:
                        _resolve_future(fut.set_exception, e)

    def metrics(self) -> dict:
        """Counters + recent-window latency percentiles for monitoring."""
        c = dict(self._counters)
        with self._lat_lock:
            lat = sorted(self._recent_lat)
        if lat:
            c["latency_recent_n"] = len(lat)
            c["latency_p50_ms"] = lat[len(lat) // 2] * 1e3
            c["latency_p99_ms"] = lat[min(len(lat) - 1, int(len(lat) * 0.99))] * 1e3
        c["avg_batch"] = c["requests"] / c["dispatches"] if c["dispatches"] else 0.0
        c["queue_depth"] = self._q.qsize()
        return c

    def stop(self) -> None:
        self._stop.set()
        self._worker.join(timeout=5)
        # drain: requests still queued (submitted before stop, or racing
        # past the _stop check in submit) would otherwise hold futures that
        # never resolve — their callers would block forever
        while True:
            try:
                _, fut, _t0 = self._q.get_nowait()
            except queue.Empty:
                break
            _resolve_future(fut.set_exception, RuntimeError("scheduler stopped"))
