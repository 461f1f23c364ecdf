"""Profiling and step timing.

The reference's only runtime introspection is tqdm postfix text and ad-hoc
``time.time()`` prints (SURVEY.md §5). TPU equivalents:

- :func:`profile_trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace (XLA op breakdown, HBM usage) for any code
  region;
- :class:`StepTimer` — wall-clock step statistics with correct device-sync
  semantics: a step is only timed as finished once its result is
  materialized on host (important under async dispatch — and doubly so
  under remote-TPU tunnels, where ``block_until_ready`` can return before
  device execution completes).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["profile_trace", "StepTimer", "enable_compilation_cache"]


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Enable JAX's persistent compilation cache (cold-start compiles of the
    full models take minutes; warm starts become seconds). Safe to call
    multiple times; returns False if the backend/config rejects it."""
    import os

    import jax

    cache_dir = cache_dir or os.environ.get(
        "POINTVIT_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pointvit_tpu", "xla_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Trace the enclosed region with jax.profiler (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Record per-step wall-clock durations; report mean/p50/p95."""

    def __init__(self) -> None:
        self._durations: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        """Stop the clock; if ``result`` is given, force materialization
        first so the measurement covers real device execution."""
        if result is not None:
            import jax
            import jax.numpy as jnp

            leaves = jax.tree.leaves(result)
            if leaves:
                # A host read (not just block_until_ready) is the only
                # reliable completion barrier under remote-TPU tunnels.
                np.asarray(jnp.ravel(leaves[0])[0])
        assert self._t0 is not None, "stop() without start()"
        dt = time.perf_counter() - self._t0
        self._durations.append(dt)
        self._t0 = None
        return dt

    def reset(self) -> None:
        self._durations.clear()
        self._t0 = None

    @property
    def count(self) -> int:
        return len(self._durations)

    def summary(self, skip_first: int = 1) -> dict:
        """Stats in milliseconds, excluding ``skip_first`` warmup/compile steps."""
        d = np.asarray(self._durations[skip_first:] or self._durations)
        if d.size == 0:
            return {"steps": 0}
        return {
            "steps": int(d.size),
            "mean_ms": float(d.mean() * 1e3),
            "p50_ms": float(np.percentile(d, 50) * 1e3),
            "p95_ms": float(np.percentile(d, 95) * 1e3),
            "total_s": float(d.sum()),
        }
