"""Hard-negative mining cache.

Reference equivalent: train.py's TRAINING_LATENT_VECTORS — a periodic
full-training-set embedding sweep whose cache supplies the hardest negatives
per query [LINEAGE; SURVEY.md §3.1 — the reference's biggest wall-clock sink
outside SGD]. Here the sweep is one jitted batched embed over device-resident
batches (sharded over the mesh's data axis when present); only the final
[num_tuples, 256] fp32 matrix (a few MB) lands on host for the loader's
negative sampling.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from functools import partial

from epcnet_tpu.configs import DataConfig, TrainConfig
from epcnet_tpu.data.loader import TupleLoader
from epcnet_tpu.data.native_loader import load_pc_files_native
from epcnet_tpu.data.tuples import TrainingTuples


@partial(jax.jit, static_argnames=("k",))
def _hardest_chunk(lat_dev, idx_chunk, q_chunk, k: int):
    """Hardest-negative rows for one chunk of tuples.

    Module-level so jax.jit's cache persists across mining refreshes: the
    latent matrix is a traced ARGUMENT, not a closure capture — a
    closure-captured version would bake the latents into the executable as a
    constant and recompile on every refresh (compile churn is the known
    bottleneck on tunnel TPUs, CLAUDE.md)."""
    cand = lat_dev[jnp.maximum(idx_chunk, 0)]  # [c, cap, D]
    qv = lat_dev[q_chunk][:, None, :]  # [c, 1, D]
    d = jnp.sum((cand - qv) ** 2, axis=-1)  # [c, cap]
    d = jnp.where(idx_chunk < 0, jnp.inf, d)
    _, pos = jax.lax.top_k(-d, k)
    sel = jnp.take_along_axis(idx_chunk, pos, axis=-1)
    # re-mask selections that came from padding (pool shorter than k)
    return jnp.where(
        jnp.take_along_axis(idx_chunk >= 0, pos, axis=-1), sel, -1
    )


class MiningCache:
    """Latent-vector cache + hardest-negative sampler."""

    def __init__(
        self,
        tuples: TrainingTuples,
        data_cfg: DataConfig,
        train_cfg: TrainConfig,
        embed_fn,
        batch_size: int = 64,
    ):
        self.tuples = tuples
        self.data_cfg = data_cfg
        self.train_cfg = train_cfg
        self.embed_fn = embed_fn
        self.batch_size = batch_size
        # (latents, generation) swapped as ONE tuple so concurrent readers
        # can never pair one refresh's latents with another's RNG keying
        self._cache: tuple[np.ndarray, int] | None = None
        # (hardest-negatives [n, k] int32 -1-padded, generation): precomputed
        # ON DEVICE right after each sweep (one batched gather + distance +
        # top-k instead of per-tuple numpy loops on loader threads — the
        # pod-scale Amdahl fix, VERDICT r2 weak #4)
        self._hard: tuple[np.ndarray, int] | None = None

    def refresh(self, params, batch_stats, sharding=None) -> None:
        """Re-embed every training submap (the reference's get_latent_vectors
        sweep). Pads the tail batch so one compiled shape serves the sweep.

        The sweep stays DEVICE-RESIDENT (SURVEY.md §7.4's Amdahl warning):
        chunk embeddings are enqueued back-to-back without per-chunk host
        syncs — file IO for chunk i+1 overlaps device compute of chunk i —
        and the [num_tuples, D] result lands on host in ONE transfer at the
        end (a few MB; the loader's negative sampler consumes it there).
        """
        n = len(self.tuples.queries)
        ids = list(range(n))
        device_chunks = []
        bs = self.batch_size
        for s in range(0, n, bs):
            batch_ids = ids[s : s + bs]
            files = [self.tuples.queries[i]["query"] for i in batch_ids]
            # native GIL-free parallel load; fresh buffer per chunk — the
            # previous chunk's device_put may still be in flight
            buf = np.zeros((bs, self.data_cfg.num_points, 3), np.float32)
            load_pc_files_native(
                files,
                self.data_cfg.dataset_root,
                self.data_cfg.num_points,
                out=buf[: len(batch_ids)],
                n_threads=self.data_cfg.loader_threads,
            )
            # one transfer: straight from host numpy to the target sharding
            # (jnp.asarray-then-reshard would copy twice on mesh runs)
            x = (
                jnp.asarray(buf)
                if sharding is None
                else jax.device_put(buf, sharding)
            )
            device_chunks.append(self.embed_fn(params, batch_stats, x))
        all_latents = jnp.concatenate(device_chunks, axis=0)
        gen = 0 if self._cache is None else self._cache[1] + 1
        # single host transfer; one atomic reference swap for readers. In a
        # multi-process run the sweep output is sharded across processes
        # (each host addresses only its data-axis slice), so the host copy
        # is an explicit allgather; single-process keeps the plain transfer.
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            host = multihost_utils.process_allgather(all_latents, tiled=True)
        else:
            host = np.asarray(all_latents)
        lat = host[:n]
        self._hard = (self._precompute_hard_negatives(lat, gen), gen)
        self._cache = (lat, gen)

    @property
    def latents(self) -> np.ndarray | None:
        return self._cache[0] if self._cache is not None else None

    def _precompute_hard_negatives(self, lat: np.ndarray, generation: int):
        """One batched device pass: hardest negatives for EVERY tuple.

        Pool subsampling keeps the exact host RNG keying of the per-query
        path ((seed, 17, generation, query) — deterministic and
        generation-paired); the [n, cap] candidate gather + distance +
        top-k, previously a per-tuple numpy loop on loader threads, runs as
        chunked jitted device work while the sweep's latents are fresh.
        Returns [n, hard_neg_per_tuple] int32, -1-padded for short pools.
        """
        n = len(self.tuples.queries)
        cap = self.train_cfg.sampled_neg_pool
        k = self.train_cfg.hard_neg_per_tuple
        widest = max(
            (len(self.tuples.queries[i]["negatives"]) for i in range(n)),
            default=1,
        )
        pools = np.full((n, max(1, min(cap, widest))), -1, np.int64)
        for qi in range(n):
            pool = self.tuples.queries[qi]["negatives"]
            if not pool:
                continue
            if len(pool) > cap:
                rng = np.random.default_rng(
                    (self.train_cfg.seed, 17, generation, qi)
                )
                pool = rng.choice(pool, cap, replace=False)
            pools[qi, : len(pool)] = pool

        lat_dev = jnp.asarray(lat)
        kk = min(k, pools.shape[1])

        out = np.full((n, kk), -1, np.int64)
        chunk = 4096
        for s in range(0, n, chunk):
            ids = np.arange(s, min(s + chunk, n))
            pad = 0
            idx_c = pools[ids]
            if len(ids) < chunk and n > chunk:
                pad = chunk - len(ids)  # one compiled shape for the sweep
                idx_c = np.pad(idx_c, ((0, pad), (0, 0)), constant_values=-1)
                ids = np.pad(ids, (0, pad))
            res = np.asarray(
                _hardest_chunk(lat_dev, jnp.asarray(idx_c), jnp.asarray(ids), kk)
            )
            out[s : s + len(ids) - pad] = res[: len(ids) - pad]
        return out.astype(np.int64)

    def hard_negatives(self, query_idx: int) -> list[int] | None:
        """Hardest negatives for a query: its cached-latent nearest negatives
        [LINEAGE: train.py get_random_hard_negatives].

        Now a plain row read of the matrix ``refresh`` precomputed on device
        (one batched gather + top-k for ALL tuples instead of a per-tuple
        numpy loop on loader threads). Called concurrently from the loader's
        workers: the (matrix, generation) tuple is snapshotted in one read,
        the subsampling RNG stays derived per (seed, generation, query) —
        thread-safe AND scheduling-independent, so the loader's determinism
        contract is unchanged.
        """
        hard = self._hard  # ONE read: (matrix, generation) stay paired
        if hard is None:
            return None
        row = hard[0][query_idx]
        out = [int(i) for i in row if i >= 0]
        return out or None

    def attach(self, loader: TupleLoader) -> None:
        loader.set_hard_negatives(self.hard_negatives)
