"""HTTP place-recognition server over the PlaceIndex.

Reference equivalent: none — the reference's CLI drivers are its entire API
[LINEAGE; SURVEY.md §3.5]. This is the production serving front-end on top
of ``epcnet_tpu.serve``: a stdlib threaded HTTP server whose per-connection
threads feed the ``QueryScheduler``, so concurrent single-submap queries are
micro-batched into shared MXU dispatches.

  python -m epcnet_tpu.cli.serve --log_dir log [--host 127.0.0.1]
      [--port 8476] [--k 25] [--max_wait_ms 2] [--db saved_index.npz]
      [--mesh] [--save_on_exit saved_index.npz] [--warmup_points 0|N]
      [--compilation_cache_dir D]

Startup pre-compiles the embed+query programs on zeros (``--warmup_points``,
default the run's ``data.num_points``) BEFORE binding the port, so the first
client request never pays the XLA compile; with ``--compilation_cache_dir``
the compiled programs persist, making redeploy warmup a disk read.

JSON API (``Content-Type: application/json``):

  GET  /healthz -> {"ok": true, "size": N, "dim": D}
  GET  /metrics -> {"index": {...}, "scheduler": {...}}   (counters, device
                bytes, avg micro-batch, recent p50/p99 latency)
  POST /embed   {"points": [[[x,y,z], ...], ...]}          (batch of submaps)
                -> {"descriptors": [[...], ...]}
  POST /add     {"points": [...], "metadata": [...]}        -> {"size": N}
  POST /query   {"points": [[x,y,z], ...], "k": 5}          (ONE submap;
                micro-batched with concurrent callers)
                -> {"ids": [...], "sqdists": [...], "metadata": [...]}
  POST /query_batch {"points": [[[...]], ...], "k": 5}      (direct batch)
                -> {"ids": [[...]], "sqdists": [[...]]}

SIGTERM/SIGINT shuts the server down cleanly (optionally persisting the DB
with ``--save_on_exit``) — the serving analogue of the Trainer's
preemption-safe checkpointing.
"""

from __future__ import annotations

import argparse
import json
import signal
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from epcnet_tpu.serve import PlaceIndex, QueryScheduler
from epcnet_tpu.utils.logging import log_string
from epcnet_tpu.utils.compile_cache import add_cli_arg, enable_compilation_cache


def _json_handler(index: PlaceIndex, sched: QueryScheduler, default_k: int):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # route to our logger, not stderr
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True, "size": len(index), "dim": index.dim})
            elif self.path == "/metrics":
                # counters + gauges for scrapers/dashboards: index state
                # (size, device bytes, quantize mode, sync counts) and
                # scheduler behavior (avg micro-batch, recent p50/p99)
                self._reply(200, {
                    "index": index.metrics(),
                    "scheduler": sched.metrics(),
                })
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def _points(self, req, ndim: int) -> "np.ndarray":
            pts = np.asarray(req["points"], np.float32)
            if pts.ndim != ndim or pts.shape[-1] != 3:
                raise ValueError(
                    f"points must be rank-{ndim} with a trailing xyz axis; "
                    f"got shape {pts.shape}"
                )
            return pts

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                return self._reply(400, {"error": f"bad request body: {e}"})
            try:
                if self.path == "/embed":
                    pts = self._points(req, 3)
                    self._reply(200, {"descriptors": index.embed(pts).tolist()})
                elif self.path == "/add":
                    pts = self._points(req, 3)
                    index.add(pts, metadata=req.get("metadata"))
                    self._reply(200, {"size": len(index)})
                elif self.path == "/query":
                    pts = self._points(req, 2)  # [N, 3] one submap
                    k = int(req.get("k", default_k))
                    if not 1 <= k <= sched.k:
                        # k<1 would silently mis-slice (ids[:-1]); k>--k
                        # would compile a new top-k program per value
                        return self._reply(400, {
                            "error": f"k={k} outside [1, --k={sched.k}]; "
                            "raise --k or request fewer neighbours"
                        })
                    ids, dists = sched.submit(pts).result(timeout=60)
                    ids, dists = ids[:k], dists[:k]
                    self._reply(200, {
                        "ids": ids.tolist(),
                        "sqdists": dists.tolist(),
                        "metadata": index.metadata(ids),
                    })
                elif self.path == "/query_batch":
                    pts = self._points(req, 3)  # [B, N, 3]
                    k = int(req.get("k", default_k))
                    if not 1 <= k <= sched.k:
                        # same bounds as /query: an uncapped per-request k
                        # compiles a new top-k program per distinct value —
                        # a client k-sweep must not become a compile storm
                        return self._reply(400, {
                            "error": f"k={k} outside [1, --k={sched.k}]; "
                            "raise --k or request fewer neighbours"
                        })
                    ids, dists = index.query(pts, k)
                    self._reply(200, {"ids": ids.tolist(), "sqdists": dists.tolist()})
                else:
                    self._reply(404, {"error": f"unknown path {self.path}"})
            except (KeyError, ValueError, IndexError, TypeError) as e:
                self._reply(400, {"error": repr(e)})
            except Exception as e:  # timeouts, device errors: JSON 500, not a dropped socket
                self._reply(500, {"error": repr(e)})

    return Handler


def make_server(
    index: PlaceIndex,
    host: str = "127.0.0.1",
    port: int = 8476,
    k: int = 25,
    max_wait_ms: float = 2.0,
) -> tuple[ThreadingHTTPServer, QueryScheduler]:
    """Build (server, scheduler); caller runs server.serve_forever()."""
    # the scheduler serves the index's full top-k; per-request k trims it
    sched = QueryScheduler(index, k=k, max_wait_ms=max_wait_ms)
    srv = ThreadingHTTPServer((host, port), _json_handler(index, sched, k))
    # non-daemon handler threads + block_on_close: server_close() JOINS
    # in-flight requests, so SIGTERM shutdown genuinely drains (an /add
    # acknowledged to a client is in the DB before --save_on_exit persists)
    srv.daemon_threads = False
    srv.block_on_close = True
    return srv, sched


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--log_dir", required=True, help="trained run directory")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8476)
    ap.add_argument("--k", type=int, default=25)
    ap.add_argument("--max_wait_ms", type=float, default=2.0)
    ap.add_argument("--embed_batch", type=int, default=32)
    ap.add_argument("--db", default=None, help="preload a saved index .npz")
    ap.add_argument("--save_on_exit", default=None, help="persist DB on shutdown")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the retrieval DB over devices")
    ap.add_argument("--db_axis", type=int, default=0,
                    help="devices on the retrieval 'db' axis (0 = all "
                    "devices of one slice — serving has no data-parallel "
                    "training axis, and the db axis must stay intra-slice)")
    ap.add_argument("--warmup_points", type=int, default=-1,
                    help="pre-compile the embed+query programs on zeros at "
                    "this many points per submap BEFORE binding the port, so "
                    "the first request never pays the XLA compile; -1 = the "
                    "run's data.num_points (config.json), 0 = skip warmup")
    ap.add_argument("--quantize", default="none", choices=("none", "int8"),
                    help="device DB format: int8 stores descriptors "
                    "quantized per-row (4x less HBM per row, ~4e-4 max "
                    "dequantization error; host DB/save stay fp32)")
    ap.add_argument("--sync_mode", default="blocking",
                    choices=("blocking", "background"),
                    help="when adds become query-visible: 'blocking' = "
                    "read-your-writes (a query waits for full device "
                    "residency); 'background' = a daemon thread syncs in "
                    "chunks and queries run immediately against the "
                    "resident prefix — bulk ingest never stalls the query "
                    "path (docs/SERVING.md)")
    ap.add_argument("--sync_chunk_rows", type=int, default=None,
                    help="rows per device-sync chunk (default 8*block_rows); "
                    "bounds how long one transfer occupies the device")
    add_cli_arg(ap)
    args = ap.parse_args(argv)
    enable_compilation_cache(args.compilation_cache_dir)

    from epcnet_tpu.parallel import maybe_initialize_distributed

    # must precede any JAX call (same contract as train/evaluate)
    maybe_initialize_distributed()

    mesh = None
    if args.mesh:
        from epcnet_tpu.configs import MeshConfig
        from epcnet_tpu.parallel import make_multislice_mesh, retrieval_db_axis

        # serving shards the DESCRIPTOR DB: default one full slice onto the
        # "db" axis (a db_axis=1 mesh would silently never take the sharded
        # retrieval path in PlaceIndex.query_descriptors; ALL devices would
        # crash mesh construction on a multi-slice pod — db stays intra-slice)
        db_axis = args.db_axis or retrieval_db_axis()
        mesh = make_multislice_mesh(MeshConfig(data_axis=-1, db_axis=db_axis))
    index = PlaceIndex.from_checkpoint(
        args.log_dir, mesh=mesh, embed_batch=args.embed_batch,
        quantize=args.quantize, max_k=args.k, sync_mode=args.sync_mode,
        sync_chunk_rows=args.sync_chunk_rows,
    )
    if args.db:
        index.load_db(args.db)
        log_string(f"loaded {len(index)} descriptors from {args.db}")

    # -1 = the run's data.num_points (from_checkpoint stashed it on the index)
    warmup_points = args.warmup_points if args.warmup_points >= 0 else index.num_points
    if warmup_points:
        t0 = time.perf_counter()
        index.warmup(warmup_points)
        log_string(
            f"warmup: embed+query programs compiled in "
            f"{time.perf_counter() - t0:.1f} s (num_points={warmup_points})"
        )

    srv, sched = make_server(index, args.host, args.port, args.k, args.max_wait_ms)

    def _shutdown(signum, frame):
        threading.Thread(target=srv.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _shutdown)
    signal.signal(signal.SIGINT, _shutdown)

    log_string(f"serving on http://{args.host}:{args.port} (index size {len(index)})")
    try:
        srv.serve_forever()
    finally:
        srv.server_close()  # joins in-flight handler threads (drain)
        sched.stop()
        if args.save_on_exit:
            index.save(args.save_on_exit)
            log_string(f"saved {len(index)} descriptors -> {args.save_on_exit}")
        log_string("server stopped")


if __name__ == "__main__":
    main()
