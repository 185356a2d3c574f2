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
    run: int = 0  # repeat-run index within a run_benchmark sweep

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
        self.last_sample_i: dict = {}  # chunk index of each plan's last probe
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
            # probe the LEAST-RECENTLY-sampled loser: with 3+ plans a
            # fixed first-loser probe would leave the others' last_ms
            # stale forever (ADVICE r2)
            losers = [x for x in self.names if x != self.best]
            return min(losers, key=lambda x: self.last_sample_i.get(x, -1))
        return self.best

    def record(self, name: str, ms: float) -> None:
        self.last_ms[name] = ms
        self.last_sample_i[name] = self.chunk_i
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
    resort_every: "int | str" = 8,
    plan: str = "adaptive",
) -> EpisodeResult:
    """Roll + time one episode.

    ``persistent``: for the spatial and hybrid methods on TPU, use the
    persistent-sorted-order episode runner (lazy re-sort every
    ``resort_every`` steps) -- the fastest path at 1M+ (hybrid mode runs
    the screen-space stage on the sorted rows; see
    make_sorted_episode_runner).  Default: auto (on for spatial/hybrid
    on TPU, off elsewhere).  Implies chunked timing.

    ``plan``: the execution plan for the (start, count) cells lookup.
    "adaptive" (default) builds both the in-kernel coded plan and the
    XLA gather plan and A/B-autotunes per chunk (persistent path only;
    elsewhere it degrades to the step-level "auto" heuristic).  Any
    other value ("gather" / "kernel" / "auto") pins that step-level
    ``cells_lookup`` plan on every path -- pinned runs are
    bit-deterministic run-to-run.
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
            plan=plan,
        )
    # non-persistent path: no chunk-level autotuner exists here, so
    # "adaptive" degrades to the step-level "auto" heuristic; a pinned
    # plan is honored (ADVICE r2: it used to be silently dropped)
    step = make_method_step(
        scene, method, camera_index,
        cells_lookup="auto" if plan == "adaptive" else plan,
    )
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
        # python-loop dispatch; fori_loop wrapping is at parity on the
        # current pipeline (benchmarks/study_fori_loop.py) -- Python
        # dispatch is kept for the chunked timing fences
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
    plan: str = "adaptive",
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
    # ``plan``: "adaptive" builds BOTH plans and autotunes; any other
    # value pins that step-level cells_lookup plan (pinned runs are
    # bit-deterministic run-to-run; short benchmarks also avoid paying a
    # probe chunk)
    if plan != "adaptive":
        runners = {plan: make_sorted_episode_runner(
            scene.triangles, cfg, cells_lookup=plan, **mk)}
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
    # step to compile inside the first timed chunk ("auto" compiles both
    # bodies in its single cond program, so 2 steps suffice)
    warm = 2 if resort_every == "auto" else resort_every + 1
    for r in runners.values():
        throwaway = r(state, warm)
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
    spatial_all_cameras: bool = False,
    plan: str = "adaptive",
    run_offset: int = 0,
) -> list[EpisodeResult]:
    """The full sweep: runs x methods x cameras (BenchmarkManager.cs:76-127).

    With ``out_dir``, writes the reference's CSV formats plus a JSON
    summary.

    ``run_offset``: first run index.  Extending a committed ladder from
    2 to the reference's 6 runs (DragonScene.unity:1894) means measuring
    runs 2..5 WITHOUT re-measuring 0..1; the offset keeps run identities
    honest through merge_protocol.py / the summary merge.

    Camera dedup: the SPATIAL method is camera-independent (the grid
    pipeline never reads the camera), so by default it runs on
    ``cameras[:1]`` only -- the reference times it across all 4 cameras
    (BenchmarkManager.cs:84-93), but those 4 measurements are the same
    experiment repeated.  The dedup is recorded in the summary schema
    (``cameras_deduped``) so episode counts are auditable; pass
    ``spatial_all_cameras=True`` for literal protocol parity.
    """
    cameras = (
        list(camera_indices)
        if camera_indices is not None
        else list(range(len(scene.cameras)))
    )
    results = []
    for run in range(run_offset, run_offset + num_runs):
        per_method: dict[str, list[EpisodeResult]] = {}
        for method in methods:
            dedup = Method(method) == Method.SPATIAL and not spatial_all_cameras
            for cam in cameras[:1] if dedup else cameras:
                r = run_episode(
                    scene,
                    method,
                    camera_index=cam,
                    layers_y=layers_y,
                    num_steps=num_steps,
                    per_step_timing=per_step_timing,
                    plan=plan,
                )
                r.run = run
                results.append(r)
                per_method.setdefault(method, []).append(r)
        if out_dir:
            _write_csvs(scene, per_method, layers_y, out_dir,
                        append=run != run_offset, accuracy=accuracy)
    if out_dir:
        _write_summary(scene, results, layers_y, out_dir,
                       spatial_all_cameras=spatial_all_cameras)
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


def _write_summary(scene, results, layers_y, out_dir,
                   spatial_all_cameras: bool = False):
    os.makedirs(out_dir, exist_ok=True)
    summary = [
        {
            "scene": scene.name,
            "method": r.method,
            "camera": r.camera,
            "run": r.run,
            "num_particles": r.num_particles,
            "num_steps": r.num_steps,
            "mean_ms_per_step": r.mean_ms,
            "steps_per_sec": r.steps_per_sec,
            "particle_steps_per_sec": r.particle_steps_per_sec,
            "total_collisions": int(r.collisions.sum()),
            # SPATIAL rows are camera-independent and measured on one
            # camera only (see run_benchmark docstring) unless
            # spatial_all_cameras was set
            "cameras_deduped": (
                Method(r.method) == Method.SPATIAL and not spatial_all_cameras
            ),
        }
        for r in results
    ]
    # merge with any existing summary so multi-size protocol sweeps (one
    # run_benchmark call per particle count) accumulate instead of clobber;
    # fresh results replace stale entries with the same identity.  The
    # identity includes the run index (run_offset support): extending a
    # ladder from 2 to 6 runs must not drop the committed runs 0..1 --
    # replacing an old measurement still works because regeneration
    # sweeps reuse the same run indices.
    path = os.path.join(out_dir, f"summary_{scene.name}.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                old = json.load(f)
        except (json.JSONDecodeError, OSError):
            old = []
        def _key(s):
            return (s["method"], s["camera"], s["num_particles"],
                    s.get("run", 0))
        fresh = {_key(s) for s in summary}
        summary += [s for s in old if _key(s) not in fresh]
    _flag_transport_noise(summary)
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    _write_aggregates(scene, summary, out_dir)


def _flag_transport_noise(summary) -> None:
    """Mark episodes whose mean step time is a gross outlier among their
    duplicates (same method/camera/N across runs) as suspected transport
    noise: the axon TPU tunnel occasionally stalls mid-episode, inflating
    one episode ~10x (observed: a 306 ms/step k=6 hybrid episode vs 28.5
    on its duplicate).  The raw number is kept -- it was measured -- but
    downstream means must be able to exclude it mechanically."""
    groups: dict = {}
    for s in summary:
        groups.setdefault(
            (s["method"], s["camera"], s["num_particles"]), []
        ).append(s)
    for rows in groups.values():
        ms = [r["mean_ms_per_step"] for r in rows]
        # with exactly 2 duplicates the median CONTAINS the outlier
        # (median(306, 28.5)=167 -> 306 passes 3x); the min is the
        # robust reference there.  3+ duplicates: median as usual.
        ref = float(np.min(ms)) if len(ms) == 2 else float(np.median(ms))
        for r in rows:
            r["suspect_transport_noise"] = bool(
                len(rows) >= 2 and ref > 0 and r["mean_ms_per_step"] > 3.0 * ref
            )


def _write_aggregates(scene, summary, out_dir) -> None:
    """Per-(method, camera, N) aggregate across repeat runs: run count,
    mean/std/min/max of the per-episode mean step time (the reference
    repeats every sweep 6 times for exactly this variance information --
    BenchmarkManager.cs:112-114).  Suspected-transport-noise rows are
    excluded from the moments but counted.

    Row schema is shared with benchmarks/rebuild_aggregates.py (ADVICE
    r3: the two writers had diverged): both emit ``k``/``particles``
    (the protocol-row identity the artifact tests key on) AND
    ``scene``/``num_particles`` (the summary-row identity); a
    harness-regenerated aggregate can be committed as-is."""
    import math

    base = scene.config.num_particles_xz ** 2
    groups: dict = {}
    for s in summary:
        groups.setdefault(
            (s["method"], s["camera"], s["num_particles"]), []
        ).append(s)
    agg = []
    for (method, camera, n), rows in sorted(groups.items()):
        clean = [r["mean_ms_per_step"] for r in rows
                 if not r.get("suspect_transport_noise")]
        ms = clean or [r["mean_ms_per_step"] for r in rows]
        agg.append({
            "scene": scene.name,
            # n = base * 2^k except at the 2,097,120 reference cap
            # (ParticleSys.cs:236), where rounding recovers k
            "k": int(round(math.log2(max(n, 1) / base))),
            "method": method,
            "camera": camera,
            "particles": n,
            "num_particles": n,
            "runs": len(rows),
            "runs_quarantined": len(rows) - len(clean),
            "mean_ms_mean": round(float(np.mean(ms)), 3),
            "mean_ms_std": (round(float(np.std(ms, ddof=1)), 3)
                            if len(ms) > 1 else 0.0),
            "mean_ms_min": round(float(np.min(ms)), 3),
            "mean_ms_max": round(float(np.max(ms)), 3),
            "cameras_deduped": bool(rows[0].get("cameras_deduped")),
        })
    with open(os.path.join(out_dir, f"aggregate_{scene.name}.json"), "w") as f:
        json.dump(agg, f, indent=2)
