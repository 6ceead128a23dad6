"""Descriptor serving: an online place-recognition index.

The reference has no serving layer — its CLI drivers are the whole API
[LINEAGE; SURVEY.md §3.5]. Production place recognition needs one: embed
incoming submaps, add them to a descriptor database, answer nearest-place
queries at low latency. This module provides that as a small library:

  service = PlaceIndex.from_checkpoint(log_dir)        # or from state
  service.add(points_batch, metadata...)               # extend the DB
  ids, dists = service.query(points_batch, k=25)       # embed + retrieve
  service.save(path) / PlaceIndex.load(path, ...)      # persistence

TPU mapping: embedding runs the jitted model at a fixed batch shape (one
compiled program, padded tail); retrieval is the exact MXU top-k
(ops/retrieval.py), switching to the ICI-sharded path automatically when a
mesh with a "db" axis is supplied (BASELINE config #5). The DB grows in
fixed-size device-resident blocks so adds never recompile.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from epcnet_tpu.configs import ExperimentConfig
from epcnet_tpu.ops.retrieval import sharded_topk_neighbors, topk_neighbors
from epcnet_tpu.train.checkpoint import CheckpointManager
from epcnet_tpu.train.state import create_train_state
from epcnet_tpu.train.step import build_embed_fn


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
    ):
        self._embed = embed_fn
        self._params = params
        self._stats = batch_stats
        self.dim = descriptor_dim
        self.embed_batch = embed_batch
        self.block_rows = block_rows
        self.mesh = mesh
        self._db = np.zeros((0, descriptor_dim), np.float32)
        self._meta: list = []
        self._dev_db = None  # cached padded device copy, invalidated on add

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, log_dir: str, mesh=None, embed_batch: int = 32):
        cfg_path = os.path.join(log_dir, "config.json")
        cfg = (
            ExperimentConfig.from_json(open(cfg_path).read())
            if os.path.isfile(cfg_path)
            else ExperimentConfig()
        )
        state = create_train_state(cfg.model, cfg.train)
        state = CheckpointManager(f"{log_dir}/ckpt").restore(state)
        embed = build_embed_fn(cfg.model)
        return cls(
            embed,
            state.params,
            state.batch_stats,
            cfg.model.output_dim,
            embed_batch,
            mesh=mesh,
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
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            d = np.asarray(self._embed(self._params, self._stats, jnp.asarray(chunk)))
            out[s : s + bs - pad] = d[: bs - pad]
        return out

    def add(self, points: np.ndarray, metadata: Sequence | None = None) -> None:
        self.add_descriptors(self.embed(points), metadata)

    def add_descriptors(self, desc: np.ndarray, metadata: Sequence | None = None) -> None:
        self._db = np.concatenate([self._db, desc.astype(np.float32)], axis=0)
        self._meta.extend(metadata if metadata is not None else [None] * len(desc))
        self._dev_db = None  # invalidate the device cache

    def __len__(self) -> int:
        return len(self._db)

    # ------------------------------------------------------------------
    def query(self, points: np.ndarray, k: int = 25):
        """Embed + retrieve. Returns (ids [B, k], sqdists [B, k])."""
        return self.query_descriptors(self.embed(points), k)

    def query_descriptors(self, desc: np.ndarray, k: int = 25):
        if len(self._db) == 0:
            raise ValueError("empty index")
        k = min(k, len(self._db))
        if self._dev_db is None:
            # Pad the DB to a stable block multiple so repeated queries
            # against a growing index reuse compiled programs, and cache the
            # device copy until the next add.
            rows = -(-len(self._db) // self.block_rows) * self.block_rows
            db = np.full((rows, self.dim), 1e6, np.float32)
            db[: len(self._db)] = self._db
            self._dev_db = jnp.asarray(db)
        q = jnp.asarray(desc.astype(np.float32))
        dbj = self._dev_db
        if self.mesh is not None and "db" in self.mesh.shape and self.mesh.shape["db"] > 1:
            idx, dist = sharded_topk_neighbors(q, dbj, k, self.mesh)
        else:
            idx, dist = topk_neighbors(q, dbj, k)
        return np.asarray(idx), np.asarray(dist)

    def metadata(self, ids) -> list:
        return [self._meta[int(i)] for i in np.asarray(ids).ravel()]

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(path, db=self._db, meta=np.array(self._meta, dtype=object))

    def load_db(self, path: str) -> None:
        data = np.load(path, allow_pickle=True)
        self._db = data["db"]
        self._meta = list(data["meta"])
        self._dev_db = None
