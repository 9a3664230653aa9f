"""Profiling / tracing harness.

TPU-native replacement for the reference's cProfile decorator
(``src/utils/misc.py:142-199``, SURVEY §5): ``jax.profiler`` traces written
as perfetto-compatible artifacts plus a wall-clock timing harness with a
*real* synchronization barrier (on remote PJRT backends like axon,
``block_until_ready`` returns before execution finishes; a scalar
device→host fetch is the only reliable fence — measured in this repo).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Callable

import jax
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["device_fence", "timeit", "trace", "Timer"]


def device_fence(tree) -> float:
    """Force completion of a pytree of device arrays; returns a checksum.

    Uses a scalar reduction fetch, which synchronizes even on remote
    backends where ``block_until_ready`` is asynchronous.
    """
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype")]
    if not leaves:
        return 0.0
    return float(jax.numpy.asarray(leaves[0]).sum())


def timeit(fn: Callable, *args, repeats: int = 5, warmup: int = 1,
           **kwargs) -> dict:
    """Measure fenced wall-clock of ``fn(*args)``; returns stats in seconds."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
        device_fence(out)
    # measure the fence round-trip itself and subtract
    t0 = time.perf_counter()
    for _ in range(3):
        device_fence(out)
    fence_s = (time.perf_counter() - t0) / 3
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        device_fence(out)
        times.append(time.perf_counter() - t0 - fence_s)
    arr = np.asarray(times)
    return {"median_s": float(np.median(arr)), "mean_s": float(arr.mean()),
            "min_s": float(arr.min()), "max_s": float(arr.max()),
            "fence_s": fence_s, "n": repeats}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ebt_trace"):
    """Capture a jax.profiler trace (view with perfetto / tensorboard).

    Falls back to a no-op with a warning on backends that don't support
    profiling (the remote axon tunnel may not).
    """
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # noqa: BLE001
        logger.warning("jax profiler unavailable: %s", e)
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s", log_dir)
            except Exception as e:  # noqa: BLE001
                logger.warning("stopping profiler failed: %s", e)


class Timer:
    """Accumulating section timer for host-side orchestration."""

    def __init__(self):
        self.sections = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections[name] = self.sections.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self, n_frames: int | None = None,
               wall_s: float | None = None) -> str:
        """Render the accumulated sections, largest first.

        With ``n_frames`` the values are printed per frame; with ``wall_s``
        the percentages are shares of that wall-clock window (exposing
        untimed gaps) instead of shares of the recorded-section sum.
        """
        # Nested sections ("finalize/solve_wait") run inside their parent
        # ("finalize"), so summing every section would count that time
        # twice; the total only sums sections with no recorded ancestor.
        def _has_parent(name):
            parts = name.split("/")
            return any("/".join(parts[:i]) in self.sections
                       for i in range(1, len(parts)))

        total = wall_s or sum(v for k, v in self.sections.items()
                              if not _has_parent(k)) or 1.0
        div = n_frames or 1
        unit = "s/frame" if n_frames else "s"
        lines = [f"{k}: {v/div:.3f}{unit} ({100*v/total:.1f}%)"
                 for k, v in sorted(self.sections.items(),
                                    key=lambda kv: -kv[1])]
        return "\n".join(lines)
