"""Quadruplet-family loss tests vs hand-computed values
[LINEAGE: loss/pointnetvlad_loss.py semantics]."""

import jax.numpy as jnp
import numpy as np

from epcnet_tpu import losses


def _mk(rng, b=2, p=3, ng=4, d=8):
    q = rng.randn(b, d).astype(np.float32)
    pos = rng.randn(b, p, d).astype(np.float32)
    neg = rng.randn(b, ng, d).astype(np.float32)
    on = rng.randn(b, d).astype(np.float32)
    return q, pos, neg, on


def _sq(a, b):
    return ((a - b) ** 2).sum(-1)


def test_best_pos_distance(rng):
    q, pos, _, _ = _mk(rng)
    got = np.asarray(losses.best_pos_distance(jnp.asarray(q), jnp.asarray(pos)))
    ref = _sq(q[:, None], pos).min(1)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_triplet_vs_numpy(rng):
    q, pos, neg, _ = _mk(rng)
    m = 0.5
    bp = _sq(q[:, None], pos).min(1)
    h = np.maximum(m + bp[:, None] - _sq(q[:, None], neg), 0)
    np.testing.assert_allclose(
        float(losses.triplet_loss(jnp.asarray(q), jnp.asarray(pos), jnp.asarray(neg), m)),
        h.sum(1).mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(losses.lazy_triplet_loss(jnp.asarray(q), jnp.asarray(pos), jnp.asarray(neg), m)),
        h.max(1).mean(), rtol=1e-5)


def test_quadruplet_vs_numpy(rng):
    q, pos, neg, on = _mk(rng)
    m1, m2 = 0.5, 0.2
    bp = _sq(q[:, None], pos).min(1)
    h1 = np.maximum(m1 + bp[:, None] - _sq(q[:, None], neg), 0)
    h2 = np.maximum(m2 + bp[:, None] - _sq(on[:, None], neg), 0)
    np.testing.assert_allclose(
        float(losses.quadruplet_loss(*map(jnp.asarray, (q, pos, neg, on)), m1, m2)),
        h1.sum(1).mean() + h2.sum(1).mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(losses.lazy_quadruplet_loss(*map(jnp.asarray, (q, pos, neg, on)), m1, m2)),
        h1.max(1).mean() + h2.max(1).mean(), rtol=1e-5)


def test_loss_zero_when_margins_satisfied():
    """Far negatives + close positives -> zero loss."""
    q = jnp.zeros((1, 4))
    pos = jnp.full((1, 2, 4), 0.01)
    neg = jnp.full((1, 3, 4), 10.0)
    on = jnp.full((1, 4), -10.0)
    assert float(losses.lazy_quadruplet_loss(q, pos, neg, on)) == 0.0
    assert float(losses.triplet_loss(q, pos, neg)) == 0.0


def test_distillation_loss(rng):
    a = rng.randn(3, 8).astype(np.float32)
    b = rng.randn(3, 8).astype(np.float32)
    got = float(losses.distillation_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ((a - b) ** 2).sum(-1).mean(), rtol=1e-5)
