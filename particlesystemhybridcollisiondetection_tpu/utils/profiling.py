"""Timing & tracing instrumentation.

The reference's instrumentation is wall-clock frame deltas appended to
per-method lists under ``#if PERFORMANCE_BENCHMARK`` (ParticleSys.cs:108-112,
:456-476) plus a Stopwatch around the BVH build (:386-397).  Equivalents
here:

  * ``Stopwatch``: explicit host-side timer with named laps (build phases).
  * ``DeviceTimer``: wall-clock timing of jitted callables with a
    ``block_until_ready`` fence, compile/steady-state split.
  * ``phase_times``: run a step pipeline split into named sub-functions to
    attribute per-phase cost (the analog of timing individual kernel
    dispatches).
  * ``trace``: context manager around ``jax.profiler`` for real traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Sequence

import jax
import numpy as np


def fence(tree) -> None:
    """Hard device fence: transfer one element of the first array leaf to
    the host.

    ``jax.block_until_ready`` is NOT a reliable fence on the axon
    (tunneled-TPU) backend: it was measured returning ~800 ms early on a
    queue of independent dispatches (2026-08, see BASELINE.md "timing
    methodology").  A host readback cannot complete before every enqueued
    producer has, so all timing in this repo fences with a readback and,
    where it matters, subtracts the measured round-trip (see ``rtt_ms``).
    """
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "shape")]
    if not leaves:
        return
    leaf = leaves[0]
    idx = tuple(0 for _ in leaf.shape)
    np.asarray(leaf[idx] if leaf.shape else leaf)


def rtt_ms(reps: int = 10) -> float:
    """Measured host<->device round-trip of a tiny jitted op + scalar
    readback (~28 ms over the axon tunnel; ~us locally)."""
    import jax.numpy as jnp

    tiny = jax.jit(lambda v: v + 1.0)
    x = jnp.float32(0.0)
    for _ in range(3):
        x = tiny(x)
    float(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        float(tiny(x))
    return (time.perf_counter() - t0) / reps * 1000.0


class Stopwatch:
    """Named-lap host timer (the BVH-build Stopwatch analog)."""

    def __init__(self) -> None:
        self.laps: dict[str, float] = {}
        self._t0 = time.perf_counter()

    def lap(self, name: str) -> float:
        now = time.perf_counter()
        dt = now - self._t0
        self.laps[name] = self.laps.get(name, 0.0) + dt
        self._t0 = now
        return dt

    def report(self) -> str:
        total = sum(self.laps.values())
        lines = [f"{k}: {v * 1000:.1f} ms" for k, v in self.laps.items()]
        lines.append(f"total: {total * 1000:.1f} ms")
        return "\n".join(lines)


class DeviceTimer:
    """Measure a jitted callable: compile time + steady-state ms/call."""

    def __init__(self, fn: Callable, *args, reps: int = 20, warmup: int = 2):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        self.compile_s = time.perf_counter() - t0
        for _ in range(warmup - 1):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        self.mean_ms = (time.perf_counter() - t0) / reps * 1000.0
        self.last_output = out


def phase_times(
    phases: Sequence[tuple[str, Callable]],
    state,
    reps: int = 10,
) -> dict[str, float]:
    """Time named pipeline phases independently (ms each).

    Each phase is ``state -> state``; phases are applied in order so each
    is measured on a representative input.  Splitting the step prevents
    XLA from fusing across phase boundaries -- the sum exceeds the fused
    step time; use for *attribution*, not absolutes.
    """
    out: dict[str, float] = {}
    for name, fn in phases:
        jfn = jax.jit(fn)
        s = jfn(state)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(reps):
            s = jfn(state)
        jax.block_until_ready(s)
        out[name] = (time.perf_counter() - t0) / reps * 1000.0
        state = s
    return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/psys_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimeseries:
    """Per-step ms series with the reference's skip-first semantics
    (ParticleSys.cs:457: step 0 is never recorded)."""

    def __init__(self) -> None:
        self.ms: list[float] = []
        self._skip_done = False

    def record(self, dt_s: float) -> None:
        if not self._skip_done:
            self._skip_done = True
            return
        self.ms.append(dt_s * 1000.0)

    def summary(self) -> dict:
        a = np.asarray(self.ms) if self.ms else np.zeros(1)
        return {
            "mean_ms": float(a.mean()),
            "p50_ms": float(np.percentile(a, 50)),
            "p99_ms": float(np.percentile(a, 99)),
            "steps": len(self.ms),
        }
