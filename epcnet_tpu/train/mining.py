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

from epcnet_tpu.configs import DataConfig, TrainConfig
from epcnet_tpu.data.loader import TupleLoader
from epcnet_tpu.data.native_loader import load_pc_files_native
from epcnet_tpu.data.tuples import TrainingTuples


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
        self._cache = (host[:n], gen)

    @property
    def latents(self) -> np.ndarray | None:
        return self._cache[0] if self._cache is not None else None

    def hard_negatives(self, query_idx: int) -> list[int] | None:
        """Hardest negatives for a query: its cached-latent nearest negatives
        [LINEAGE: train.py get_random_hard_negatives].

        Called concurrently from the loader's worker threads: the latents
        reference is snapshotted once (a mid-call ``refresh`` swap cannot mix
        two embedding generations within one tuple), and the subsampling RNG
        is freshly derived per (seed, generation, query) — stateless, so it
        is thread-safe AND scheduling-independent (the loader's determinism
        contract holds regardless of which worker runs which tuple).
        """
        cache = self._cache  # ONE read: (latents, generation) stay paired
        if cache is None:
            return None
        lat, generation = cache
        entry = self.tuples.queries[query_idx]
        pool = entry["negatives"]
        if not pool:
            return None
        cap = self.train_cfg.sampled_neg_pool
        if len(pool) > cap:
            rng = np.random.default_rng(
                (self.train_cfg.seed, 17, generation, query_idx)
            )
            pool = list(rng.choice(pool, cap, replace=False))
        cand = lat[np.asarray(pool, np.int64)]
        qv = lat[query_idx]
        d = np.sum((cand - qv) ** 2, axis=-1)
        k = min(self.train_cfg.hard_neg_per_tuple, len(pool))
        hardest = np.argpartition(d, k - 1)[:k]
        hardest = hardest[np.argsort(d[hardest])]
        return [int(pool[i]) for i in hardest]

    def attach(self, loader: TupleLoader) -> None:
        loader.set_hard_negatives(self.hard_negatives)
