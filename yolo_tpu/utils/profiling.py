"""Tracing/profiling hooks (SURVEY.md §5.1): jax.profiler traces behind a
flag + named scopes so HLO/Perfetto traces are readable, and a phase
timer for the benchmark harness.

Note (this dev backend): jax.block_until_ready may not actually wait on
some PJRT relays; ``sync()`` forces a device->host fetch, which does.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np


def sync(tree) -> None:
    """Reliably wait for device work: block + tiny host fetch."""
    jax.block_until_ready(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(jax.device_get(jax.tree_util.tree_map(
            lambda a: a.ravel()[0] if hasattr(a, "ravel") else a, leaves[0])))


def timeit(f, *args, n: int = 15) -> float:
    """Mean wall-clock ms per call: one warmup call (triggers compile),
    then n timed calls synchronized with the relay-safe sync() — the
    single timing recipe every benchmark shares (bench.py,
    benchmarks/*)."""
    sync(f(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = f(*args)
    sync(r)
    return (time.perf_counter() - t0) / n * 1e3


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str]):
    """`with maybe_trace(flag_dir):` — writes a Perfetto/XPlane trace when
    a directory is given, no-op otherwise."""
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        if profile_dir:
            jax.profiler.stop_trace()


scope = jax.named_scope  # alias: annotate model phases in HLO


class PhaseTimer:
    """Wall-clock phase timing with reliable device sync."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, result_tree=None):
        t0 = time.perf_counter()
        yield
        if result_tree is not None:
            sync(result_tree)
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0
