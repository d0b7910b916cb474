"""Training observability: step timing and device profiling.

The reference's only mid-training instrumentation is a print/plot callback
(SURVEY.md §5 — no timers, no profiler hooks). This module adds:

  * :class:`StepTimer` — a sample()-compatible callback measuring wall time
    and steps/sec per callback chunk (post-compilation, `block_until_ready`);
  * :func:`trace` — context manager around `jax.profiler` emitting a
    TensorBoard-loadable device trace.
"""
from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax

__all__ = ["StepTimer", "trace"]


class StepTimer:
    """Callback recording wall-clock throughput between callback chunks.

    Usage::

        timer = StepTimer()
        dibs.sample(..., callback=timer, callback_every=100)
        print(timer.summary())

    The first chunk includes compilation and is reported separately.
    """

    def __init__(self, verbose: bool = False):
        self.verbose = verbose
        self._last_wall: Optional[float] = None
        self._last_t: int = 0
        self.chunks: List[dict] = []

    def __call__(self, **kwargs):
        t = int(kwargs["t"])
        zs = kwargs.get("zs")
        if zs is not None:
            jax.block_until_ready(zs)
        now = time.perf_counter()
        if self._last_wall is not None:
            steps = t - self._last_t
            dt = now - self._last_wall
            rec = {
                "t": t,
                "steps": steps,
                "seconds": dt,
                "steps_per_sec": steps / dt if dt > 0 else float("inf"),
            }
            self.chunks.append(rec)
            if self.verbose:
                print(f"[t={t}] {rec['steps_per_sec']:.1f} steps/s")
        self._last_wall = now
        self._last_t = t

    def summary(self) -> dict:
        """Post-compilation throughput (drops the first timed chunk)."""
        steady = self.chunks[1:] if len(self.chunks) > 1 else self.chunks
        if not steady:
            return {"steps_per_sec": None, "chunks": len(self.chunks)}
        total_steps = sum(c["steps"] for c in steady)
        total_secs = sum(c["seconds"] for c in steady)
        return {
            "steps_per_sec": total_steps / total_secs,
            "chunks": len(self.chunks),
            "total_steps": total_steps,
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """Device-trace context: ``with trace("/tmp/trace"): dibs.sample(...)``.

    Load the result with TensorBoard's profile plugin or xprof.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
