"""Profiling and throughput telemetry.

The reference's only instrumentation is an FPS HUD overlay in the interactive
viewer (``/root/reference/gymnasium_planar_robotics/utils/rendering.py:64-66``).
Here: ``jax.profiler`` trace capture around rollout sections (view in
TensorBoard/XProf) and a steps/sec meter for the batched engine.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/gprt_trace'):
    """Capture a device trace of the enclosed block (XProf/TensorBoard format)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """env-steps/sec over a sliding window; host-side, negligible overhead.

    The meter trusts the CALLER to synchronize with the device between
    ticks (fetch a value from each batch of work — e.g. ``float(metric)``).
    On tunneled backends ``jax.block_until_ready`` may return before device
    completion (see docs/performance.md "Timing methodology"), so tick
    cadences closed only by it can overstate throughput."""

    def __init__(self):
        self._t0 = None
        self._steps = 0
        self.rate = 0.0

    def tick(self, env_steps: int) -> float:
        """Record ``env_steps`` completed steps; returns the running rate.
        The first call only arms the timer (returns 0.0)."""
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            return 0.0
        self._steps += env_steps
        dt = now - self._t0
        if dt > 0:
            self.rate = self._steps / dt
        return self.rate

    def reset(self):
        """Clear the window; the next ``tick`` re-arms the timer."""
        self._t0 = None
        self._steps = 0
