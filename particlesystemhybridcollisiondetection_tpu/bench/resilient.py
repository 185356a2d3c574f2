"""Fault-tolerant episode execution.

The reference has no failure handling at all (SURVEY 5: "failure
detection / elastic recovery: none") -- a lost GPU kills the run.  Long
TPU benchmark sweeps deserve better: this runner snapshots the state
pytree to host memory every chunk and, on a device failure
(jax.errors.JaxRuntimeError, e.g. a dropped TPU tunnel), waits for the
device to come back, re-jits, restores the last snapshot, and continues.
Progress loss is bounded by the chunk size.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import numpy as np

from particlesystemhybridcollisiondetection_tpu.core.state import ParticleState


class DeviceLost(RuntimeError):
    pass


def _snapshot(state) -> dict:
    return {k: np.asarray(v) for k, v in state._asdict().items()}


def _restore(snap: dict) -> ParticleState:
    import jax.numpy as jnp

    return ParticleState(**{k: jnp.asarray(v) for k, v in snap.items()})


def _device_alive(timeout_s: float = 20.0) -> bool:
    """Liveness probe in a fresh interpreter with a hard timeout (a wedged
    device transport tends to hang rather than raise)."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax.numpy as jnp; print(float(jnp.ones((8, 8)).sum()))",
            ],
            capture_output=True,
            timeout=timeout_s,
        )
        return r.returncode == 0
    except (subprocess.SubprocessError, OSError):
        return False


class ResilientRunner:
    """Run ``total_steps`` of ``step_factory()`` with snapshot/retry.

    ``step_factory`` must rebuild the jitted step from scratch (so a fresh
    backend gets fresh executables after recovery).
    """

    def __init__(
        self,
        step_factory: Callable[[], Callable],
        chunk: int = 100,
        max_retries: int = 3,
        retry_wait_s: float = 30.0,
        checkpoint_path: Optional[str] = None,
    ) -> None:
        self.step_factory = step_factory
        self.chunk = chunk
        self.max_retries = max_retries
        self.retry_wait_s = retry_wait_s
        self.checkpoint_path = checkpoint_path
        self.recoveries = 0

    def run(self, state: ParticleState, total_steps: int) -> ParticleState:
        step = self.step_factory()
        snap = _snapshot(state)
        done_at_snap = 0
        done = 0
        retries = 0
        while done < total_steps:
            n = min(self.chunk, total_steps - done)
            try:
                for _ in range(n):
                    state = step(state)
                jax.block_until_ready(state.pos)
                done += n
                snap = _snapshot(state)
                done_at_snap = done
                retries = 0
                if self.checkpoint_path:
                    np.savez(self.checkpoint_path, _step=done, **snap)
            except (jax.errors.JaxRuntimeError, OSError, TimeoutError) as e:
                # device loss surfaces as XlaRuntimeError (a
                # JaxRuntimeError subclass) or transport-level OS errors;
                # anything else (shape bugs, NaN asserts, typos) is a real
                # bug and must propagate, not be retried as "device loss"
                retries += 1
                self.recoveries += 1
                if retries > self.max_retries:
                    raise DeviceLost(
                        f"device failed {retries} times at step {done}"
                    ) from e
                deadline = time.time() + self.retry_wait_s * retries
                while time.time() < deadline and not _device_alive():
                    time.sleep(5.0)
                step = self.step_factory()  # re-jit on the recovered backend
                state = _restore(snap)
                done = done_at_snap
        return state
