"""Metric-learning losses for place recognition.

Reference equivalent: loss/pointnetvlad_loss.py [LINEAGE]: triplet /
lazy-triplet / quadruplet / lazy-quadruplet over squared L2 distances
between L2-normalized descriptors; ``best_pos_distance`` is the MIN over the
tuple's positives; "lazy" takes the MAX over negatives instead of the sum.
Margins default to (0.5, 0.2) [LINEAGE: train.py flags].

All functions take a whole batch of tuples:
  q          [B, D]      query descriptors
  pos        [B, P, D]   positive descriptors
  neg        [B, Ng, D]  negative descriptors
  other_neg  [B, D]      the quadruplet's "other negative" (far from all)
and return a scalar fp32 loss (mean over the batch), jit/pjit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sq(x):
    return jnp.sum(x * x, axis=-1)


def best_pos_distance(q: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Min squared distance from each query to its positives. [B]"""
    return jnp.min(_sq(pos - q[:, None, :]), axis=-1)


def _hinges(q, pos, neg, margin):
    best_pos = best_pos_distance(q, pos)  # [B]
    neg_d = _sq(neg - q[:, None, :])  # [B, Ng]
    return jnp.maximum(margin + best_pos[:, None] - neg_d, 0.0), best_pos


def triplet_loss(q, pos, neg, margin: float = 0.5) -> jnp.ndarray:
    h, _ = _hinges(q, pos, neg, margin)
    return jnp.mean(jnp.sum(h, axis=-1))


def lazy_triplet_loss(q, pos, neg, margin: float = 0.5) -> jnp.ndarray:
    h, _ = _hinges(q, pos, neg, margin)
    return jnp.mean(jnp.max(h, axis=-1))


def _second_hinges(best_pos, neg, other_neg, margin2):
    other_d = _sq(neg - other_neg[:, None, :])  # [B, Ng]
    return jnp.maximum(margin2 + best_pos[:, None] - other_d, 0.0)


def quadruplet_loss(
    q, pos, neg, other_neg, margin_1: float = 0.5, margin_2: float = 0.2
) -> jnp.ndarray:
    h1, best_pos = _hinges(q, pos, neg, margin_1)
    h2 = _second_hinges(best_pos, neg, other_neg, margin_2)
    return jnp.mean(jnp.sum(h1, axis=-1)) + jnp.mean(jnp.sum(h2, axis=-1))


def lazy_quadruplet_loss(
    q, pos, neg, other_neg, margin_1: float = 0.5, margin_2: float = 0.2
) -> jnp.ndarray:
    h1, best_pos = _hinges(q, pos, neg, margin_1)
    h2 = _second_hinges(best_pos, neg, other_neg, margin_2)
    return jnp.mean(jnp.max(h1, axis=-1)) + jnp.mean(jnp.max(h2, axis=-1))


def distillation_loss(student_desc, teacher_desc) -> jnp.ndarray:
    """Feature-mimic MSE on descriptors for EPC-Net-L [PAPER §III-D]."""
    return jnp.mean(_sq(student_desc - teacher_desc))


LOSSES = {
    "triplet": triplet_loss,
    "lazy_triplet": lazy_triplet_loss,
    "quadruplet": quadruplet_loss,
    "lazy_quadruplet": lazy_quadruplet_loss,
}


def get_loss(name: str):
    if name not in LOSSES:
        raise ValueError(f"unknown loss {name!r}; options: {sorted(LOSSES)}")
    return LOSSES[name]
