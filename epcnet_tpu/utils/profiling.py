"""Profiling hooks (SURVEY.md §5.1).

Reference has nothing beyond ad-hoc time.time() prints [LINEAGE]. Here:
``jax.profiler`` trace annotations around the named phases (data-load /
embed / loss / mining) and optional XProf/Perfetto dumps via --profile_dir.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_region(name: str):
    """Named trace annotation visible in XProf/Perfetto."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def maybe_start_trace(profile_dir: str | None):
    """Wrap a region in jax.profiler.start_trace/stop_trace if a dir is set."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
