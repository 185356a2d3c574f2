"""Benchmark harness.

Replicates the reference's BenchmarkManager sweep (BenchmarkManager.cs:76-186):
for each run x collision method x camera, roll one episode of
``lifetime_steps`` steps, recording per-step timings and per-particle
collision counts, and append CSVs in the reference's format
(``results_perf_<scene>_<N>.csv`` with ``step;ms`` rows, and
``results_acc_...`` with per-particle counts -- :193-271).

Differences by design:
  * Timing is wall-clock around blocks of steps with an explicit
    ``block_until_ready`` fence (the reference measures Unity frame
    deltas); a per-step mode exists for exact CSV parity but adds a
    device sync per step.
  * The particle sweep is the reference's: 128^2 * 2^k, capped at 65535*32
    (BenchmarkManager.cs:280-283) -- but the cap is overridable, since the
    TPU build has no dispatch limit.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional, Sequence

import jax
import numpy as np

from particlesystemhybridcollisiondetection_tpu.config import Method
from particlesystemhybridcollisiondetection_tpu.core.state import (
    active_mask,
    spawn_grid,
)
from particlesystemhybridcollisiondetection_tpu.core.step import (
    make_method_step,
)

METHOD_NAMES = dict(zip([m.value for m in Method], Method.display_names()))


@dataclasses.dataclass
class EpisodeResult:
    method: str
    camera: str
    num_particles: int
    num_steps: int
    step_ms: list  # per-step (or per-chunk-averaged) milliseconds
    collisions: np.ndarray  # per-particle totals
    steps_per_sec: float

    @property
    def particle_steps_per_sec(self) -> float:
        return self.steps_per_sec * self.num_particles

    @property
    def mean_ms(self) -> float:
        return float(np.mean(self.step_ms)) if self.step_ms else 0.0


class PlanChooser:
    """Chunk-level autotuner over interchangeable execution plans.

    First times every candidate once, then keeps the current winner and
    re-probes the loser on a gap-scaled schedule: every 8 chunks while
    the plans are within 1.3x (phase boundaries move the winner), every
    32 chunks when one is far ahead (so a 2x-slower plan costs a few %
    at most).  ``pick()`` then ``record(name, ms)`` per chunk.
    """

    CLOSE_RATIO = 1.3
    PROBE_CLOSE = 8
    PROBE_FAR = 32

    def __init__(self, names: list):
        self.names = list(names)
        self.best = self.names[0]
        self.last_ms: dict = {}
        self.chunk_i = 0
        self.next_probe = 0

    def pick(self) -> str:
        unsampled = [x for x in self.names if x not in self.last_ms]
        if unsampled:
            return unsampled[0]
        if len(self.names) > 1 and self.chunk_i >= self.next_probe:
            ratio = max(self.last_ms.values()) / max(
                min(self.last_ms.values()), 1e-9
            )
            self.next_probe = self.chunk_i + (
                self.PROBE_CLOSE if ratio < self.CLOSE_RATIO else self.PROBE_FAR
            )
            return [x for x in self.names if x != self.best][0]
        return self.best

    def record(self, name: str, ms: float) -> None:
        self.last_ms[name] = ms
        if len(self.last_ms) == len(self.names):
            self.best = min(self.last_ms, key=self.last_ms.get)
        self.chunk_i += 1


def run_episode(
    scene,
    method: str,
    camera_index: int = 0,
    layers_y: int = 1,
    num_steps: Optional[int] = None,
    chunk: int = 50,
    per_step_timing: bool = False,
    warmup_steps: int = 1,
    persistent: Optional[bool] = None,
    resort_every: int = 8,
    cells_lookup: str = "adaptive",
) -> EpisodeResult:
    """Roll + time one episode.

    ``persistent``: for the spatial and hybrid methods on TPU, use the
    persistent-sorted-order episode runner (lazy re-sort every
    ``resort_every`` steps) -- the fastest path at 1M+ (hybrid mode runs
    the screen-space stage on the sorted rows; see
    make_sorted_episode_runner).  Default: auto (on for spatial/hybrid
    on TPU, off elsewhere).  Implies chunked timing.
    """
    cfg = scene.config
    steps = num_steps if num_steps is not None else cfg.lifetime_steps
    if persistent is None:
        persistent = (
            Method(method) in (Method.SPATIAL, Method.HYBRID)
            and jax.default_backend() == "tpu"
        )
    if (
        persistent
        and Method(method) in (Method.SPATIAL, Method.HYBRID)
        and not per_step_timing
    ):
        return _run_episode_persistent(
            scene, layers_y, steps, chunk, warmup_steps, resort_every,
            method=method, camera_index=camera_index,
            cells_lookup=cells_lookup,
        )
    step = make_method_step(scene, method, camera_index)
    state = spawn_grid(cfg, layers_y=layers_y)
    mask = np.asarray(active_mask(state))
    n_particles = int(mask.sum())

    from particlesystemhybridcollisiondetection_tpu.utils.profiling import fence

    # Warm-up: trigger compilation outside the timed region (the reference
    # skips step 0's timing for the same reason, ParticleSys.cs:457).
    for _ in range(warmup_steps):
        state = step(state)
    fence(state.pos)

    # Timing methodology: steps form a dependency chain (state feeds
    # state), so device execution is serialized regardless of dispatch;
    # the region is closed with a host READBACK fence because
    # block_until_ready returns early on the axon tunneled backend (see
    # utils.profiling.fence).  Per-chunk numbers fence per chunk; the
    # headline steps_per_sec uses the whole-region fence.
    step_ms: list[float] = []
    timed_steps = steps - warmup_steps
    if per_step_timing:
        for _ in range(timed_steps):
            t0 = time.perf_counter()
            state = step(state)
            fence(state.pos)
            step_ms.append((time.perf_counter() - t0) * 1000.0)
        total_s = sum(step_ms) / 1000.0
    else:
        # python-loop dispatch (wrapping the step in lax.fori_loop was
        # measured 4.7x slower on TPU: XLA compiles the loop body without
        # the step's standalone optimizations).
        done = 0
        t_start = time.perf_counter()
        while done < timed_steps:
            n = min(chunk, timed_steps - done)
            t0 = time.perf_counter()
            for _ in range(n):
                state = step(state)
            fence(state.pos)
            ms = (time.perf_counter() - t0) * 1000.0 / n
            step_ms.extend([ms] * n)
            done += n
        total_s = time.perf_counter() - t_start

    return EpisodeResult(
        method=method,
        camera=scene.cameras[camera_index].name if scene.cameras else "none",
        num_particles=n_particles,
        num_steps=timed_steps,
        step_ms=step_ms,
        collisions=np.asarray(state.collisions)[mask],
        steps_per_sec=timed_steps / max(total_s, 1e-12),
    )


def _run_episode_persistent(
    scene, layers_y, steps, chunk, warmup_steps, resort_every,
    method: str = "spatial", camera_index: int = 0,
    cells_lookup: str = "adaptive",
) -> EpisodeResult:
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_sorted_episode_runner,
    )
    from particlesystemhybridcollisiondetection_tpu.utils.profiling import fence

    cfg = scene.config
    hybrid = Method(method) == Method.HYBRID
    mk = dict(
        resort_every=resort_every,
        camera=scene.cameras[camera_index] if hybrid else None,
        normals=getattr(scene, "corner_normals", None) if hybrid else None,
    )
    # ADAPTIVE cells-lookup plan: the in-kernel coded lookup and the XLA
    # gather plan are exact interchangeable implementations of the same
    # plan, but their relative cost is PHASE-dependent (coded wins the
    # coherent spawn/settled phases -- 4.4 vs 8.9 ms at 1M spawn -- and
    # loses the chaotic mid-episode "rain" regime, where drifted rows go
    # multi-modal in code space and lookup misses feed the exact
    # fallback: 20.8 vs 17.5 ms full-episode at 524k).  No static choice
    # wins the whole episode, so the executor autotunes: chunked
    # dispatch already times every chunk, so it A/B-probes both runners
    # and keeps the current winner, re-probing every 8 chunks to track
    # phase changes.  Both runners carry the same state format (each
    # run() call restores original order), so switching is free.
    # ``cells_lookup``: "adaptive" builds BOTH plans and autotunes;
    # any other value pins that plan (pinned runs are bit-deterministic
    # run-to-run; short benchmarks also avoid paying a probe chunk)
    if cells_lookup != "adaptive":
        runners = {cells_lookup: make_sorted_episode_runner(
            scene.triangles, cfg, cells_lookup=cells_lookup, **mk)}
    else:
        runners = {"gather": make_sorted_episode_runner(
            scene.triangles, cfg, cells_lookup="gather", **mk)}
        if jax.default_backend() == "tpu":
            try:
                runners["kernel"] = make_sorted_episode_runner(
                    scene.triangles, cfg, cells_lookup="kernel", **mk)
            except AssertionError:  # >2^24 pair rows: no code table
                pass

    state = spawn_grid(cfg, layers_y=layers_y)
    mask = np.asarray(active_mask(state))
    n_particles = int(mask.sum())

    # compile BOTH step variants (sorted + lazy) of every candidate
    # outside the timed region: a 1-step warmup would leave the lazy
    # step to compile inside the first timed chunk
    for r in runners.values():
        throwaway = r(state, resort_every + 1)
        fence(throwaway.pos)
        del throwaway
    state = runners[next(iter(runners))](state, max(warmup_steps, 1))
    fence(state.pos)

    step_ms: list[float] = []
    timed_steps = steps - warmup_steps
    done = 0
    chooser = PlanChooser(list(runners))
    t_start = time.perf_counter()
    while done < timed_steps:
        n = min(chunk, timed_steps - done)
        pick = chooser.pick()
        t0 = time.perf_counter()
        state = runners[pick](state, n)
        fence(state.pos)
        ms = (time.perf_counter() - t0) * 1000.0 / n
        chooser.record(pick, ms)
        step_ms.extend([ms] * n)
        done += n
    total_s = time.perf_counter() - t_start

    return EpisodeResult(
        method=method,
        camera=scene.cameras[camera_index].name if scene.cameras else "none",
        num_particles=n_particles,
        num_steps=timed_steps,
        step_ms=step_ms,
        collisions=np.asarray(state.collisions)[mask],
        steps_per_sec=timed_steps / max(total_s, 1e-12),
    )


def run_benchmark(
    scene,
    methods: Sequence[str] = ("screen_space", "spatial", "hybrid"),
    camera_indices: Optional[Sequence[int]] = None,
    layers_y: int = 1,
    num_steps: Optional[int] = None,
    num_runs: int = 1,
    out_dir: Optional[str] = None,
    per_step_timing: bool = False,
    accuracy: bool = False,
) -> list[EpisodeResult]:
    """The full sweep: runs x methods x cameras (BenchmarkManager.cs:76-127).

    With ``out_dir``, writes the reference's CSV formats plus a JSON
    summary.
    """
    cameras = (
        list(camera_indices)
        if camera_indices is not None
        else list(range(len(scene.cameras)))
    )
    results = []
    for run in range(num_runs):
        per_method: dict[str, list[EpisodeResult]] = {}
        for method in methods:
            for cam in cameras if Method(method) != Method.SPATIAL else cameras[:1]:
                r = run_episode(
                    scene,
                    method,
                    camera_index=cam,
                    layers_y=layers_y,
                    num_steps=num_steps,
                    per_step_timing=per_step_timing,
                )
                results.append(r)
                per_method.setdefault(method, []).append(r)
        if out_dir:
            _write_csvs(scene, per_method, layers_y, out_dir, append=run != 0,
                        accuracy=accuracy)
    if out_dir:
        _write_summary(scene, results, layers_y, out_dir)
    return results


def _write_csvs(scene, per_method, layers_y, out_dir, append, accuracy):
    os.makedirs(out_dir, exist_ok=True)
    n = next(iter(per_method.values()))[0].num_particles
    mode = "a" if append else "w"
    perf_path = os.path.join(out_dir, f"results_perf_{scene.name}_{n}.csv")
    with open(perf_path, mode) as f:
        for method, runs in per_method.items():
            f.write(f"{METHOD_NAMES[method]};ms\n")
            for r in runs:
                for i, ms in enumerate(r.step_ms):
                    f.write(f"{i};{ms}\n")
    if accuracy:
        acc_path = os.path.join(out_dir, f"results_acc_{scene.name}_{n}.csv")
        with open(acc_path, mode) as f:
            for method, runs in per_method.items():
                f.write(f"{METHOD_NAMES[method]};collisions\n")
                for r in runs:
                    for i, c in enumerate(r.collisions):
                        f.write(f"{i};{c}\n")


def _write_summary(scene, results, layers_y, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    summary = [
        {
            "scene": scene.name,
            "method": r.method,
            "camera": r.camera,
            "num_particles": r.num_particles,
            "num_steps": r.num_steps,
            "mean_ms_per_step": r.mean_ms,
            "steps_per_sec": r.steps_per_sec,
            "particle_steps_per_sec": r.particle_steps_per_sec,
            "total_collisions": int(r.collisions.sum()),
        }
        for r in results
    ]
    # merge with any existing summary so multi-size protocol sweeps (one
    # run_benchmark call per particle count) accumulate instead of clobber;
    # fresh results replace stale entries with the same identity
    path = os.path.join(out_dir, f"summary_{scene.name}.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                old = json.load(f)
        except (json.JSONDecodeError, OSError):
            old = []
        fresh = {(s["method"], s["camera"], s["num_particles"]) for s in summary}
        summary += [
            s for s in old
            if (s["method"], s["camera"], s["num_particles"]) not in fresh
        ]
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
