"""Persistent XLA compilation cache wiring.

The reference had nothing like this — CUDA kernels are precompiled at pip
install time. On TPU the cost structure inverts: every jitted program is
(re)compiled by XLA at first call, and on this class of deployment compile
time is the dominant wall-clock tax (a paper-scale EPC-Net train step is
~10 s to compile, PointNetVLAD's T-Nets ~67 s; a full training run's first
epoch is compile-dominated — CLAUDE.md, docs/KERNELS.md). JAX ships a
content-addressed persistent cache keyed on (HLO, compiler flags, platform)
that makes every *re*-run of the same program shape a disk read instead of a
compile. This module is the one place that turns it on, so every CLI shares
one resolution policy:

  explicit --compilation_cache_dir flag
    > EPCNET_COMPILATION_CACHE_DIR environment variable
      > off (JAX default: no persistent cache)

Multi-process runs may share one cache directory: entries are
content-addressed files written atomically by JAX, and all processes of an
SPMD run compile identical programs, so the first process to finish a
compile seeds every other process's (and every future run's) cache.

Note: on the CPU backend, loading a persisted entry logs an XLA:CPU
"machine feature ... not supported on the host" E-line (XLA's AOT loader
comparing LLVM feature strings); harmless — execution is correct — and
absent on TPU, where cache entries are TPU executables.
"""

from __future__ import annotations

import os

import jax

ENV_VAR = "EPCNET_COMPILATION_CACHE_DIR"
# optional override of min_compile_time_secs (e.g. 0 in tests, where CPU
# compiles of tiny models finish under the production 1 s threshold)
MIN_SECS_ENV_VAR = "EPCNET_COMPILATION_CACHE_MIN_SECS"


def enable_compilation_cache(
    cache_dir: str | None = None,
    *,
    min_compile_time_secs: float = 1.0,
) -> str | None:
    """Enable JAX's persistent compilation cache; returns the dir or None.

    ``cache_dir=None`` falls back to ``$EPCNET_COMPILATION_CACHE_DIR``; if
    that is unset too this is a no-op (returns None) so importing code can
    call it unconditionally. Call before the first jitted dispatch —
    programs compiled earlier in the process are not retroactively cached.

    ``min_compile_time_secs`` skips persisting trivially cheap programs
    (JAX's own default, 1 s): the cache is for the ~10-60 s model/train-step
    executables, not for thousands of one-op dispatch helpers. Tests pass 0
    to make every compile observable.
    """
    resolved = cache_dir or os.environ.get(ENV_VAR) or None
    if not resolved:
        return None
    resolved = os.path.abspath(os.path.expanduser(resolved))
    os.makedirs(resolved, exist_ok=True)
    env_min = os.environ.get(MIN_SECS_ENV_VAR)
    if env_min is not None:
        min_compile_time_secs = float(env_min)
    jax.config.update("jax_compilation_cache_dir", resolved)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs)
    )
    # -1: gate persistence on compile time alone, not executable size — a
    # slow-to-compile small executable (Pallas kernels) is exactly what we
    # want cached.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return resolved


def add_cli_arg(ap) -> None:
    """Attach the shared --compilation_cache_dir flag to an argparse parser.

    Every CLI wires the cache identically:
        add_cli_arg(ap); ...; enable_compilation_cache(args.compilation_cache_dir)
    """
    ap.add_argument(
        "--compilation_cache_dir",
        default=None,
        help="persistent XLA compilation-cache directory (default: "
        f"${ENV_VAR}); reruns of the same program shapes load compiled "
        "executables from disk instead of recompiling",
    )
