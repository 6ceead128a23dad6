"""Numeric-safety utilities (SURVEY.md §5.2).

The reference has no sanitizer story (plain nvcc CUDA, no compute-sanitizer
CI) [LINEAGE]. JAX's functional purity confines data races to the input
pipeline; what remains is NUMERIC failure (NaN/Inf from bf16 underflow, bad
data, exploding loss). This module provides:

  - ``checkify_step``: wrap a train/eval step with jax.experimental.checkify
    NaN + OOB-index checks (debug builds / CI);
  - ``assert_all_finite``: host-side pytree finiteness assertion;
  - ``interpret_kernels``: context manager forcing Pallas interpret mode —
    the kernel "sanitizer" path used in CI.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import numpy as np
from jax.experimental import checkify


def checkify_step(step_fn: Callable) -> Callable:
    """Wrap a jitted step with NaN/OOB/div checks. Returned fn raises
    ``checkify.JaxRuntimeError`` on the first numeric fault instead of
    silently propagating NaNs into the checkpoint."""
    checked = checkify.checkify(
        step_fn, errors=checkify.float_checks | checkify.index_checks
    )

    def run(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        checkify.check_error(err)
        return out

    return run


def assert_all_finite(tree, name: str = "tree") -> None:
    bad = []

    def visit(path, leaf):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")


@contextlib.contextmanager
def interpret_kernels():
    """Run all Pallas kernels in interpret mode (CI sanitizer path)."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield
