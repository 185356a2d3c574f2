"""Profiling utils + resilient runner (fault injection)."""

import jax
import numpy as np
import jax.numpy as jnp

from particlesystemhybridcollisiondetection_tpu.bench.resilient import (
    DeviceLost,
    ResilientRunner,
)
from particlesystemhybridcollisiondetection_tpu.config import PRESETS
from particlesystemhybridcollisiondetection_tpu.core.state import spawn_grid
from particlesystemhybridcollisiondetection_tpu.core.step import (
    make_spatial_step_bruteforce,
)
from particlesystemhybridcollisiondetection_tpu.geometry.scenes import sample_scene
from particlesystemhybridcollisiondetection_tpu.utils.profiling import (
    DeviceTimer,
    StepTimeseries,
    Stopwatch,
    phase_times,
)


def test_stopwatch_and_timeseries():
    sw = Stopwatch()
    x = sum(range(10000))
    sw.lap("sum")
    assert "sum" in sw.laps and sw.laps["sum"] >= 0
    assert "total" in sw.report()

    ts = StepTimeseries()
    for k in range(5):
        ts.record(0.01)
    s = ts.summary()
    assert s["steps"] == 4  # first step skipped (ParticleSys.cs:457)
    assert abs(s["mean_ms"] - 10.0) < 1e-6


def test_device_timer_and_phases():
    scene = sample_scene()
    step = make_spatial_step_bruteforce(scene.triangles, scene.config)
    state = spawn_grid(scene.config, layers_y=1, pad_multiple=128)
    t = DeviceTimer(step, state, reps=3, warmup=1)
    assert t.compile_s > 0 and t.mean_ms > 0

    phases = phase_times(
        [
            ("collide+integrate", step),
            ("integrate-only", lambda s: s._replace(pos=s.pos + s.vel * 0.001)),
        ],
        state,
        reps=2,
    )
    assert set(phases) == {"collide+integrate", "integrate-only"}
    assert phases["collide+integrate"] > phases["integrate-only"]


def test_resilient_runner_recovers_from_injected_failures():
    """Step factory whose first product dies after 120 calls: the runner
    must recover from its snapshot and finish with correct physics."""
    scene = sample_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1, pad_multiple=128)

    real_step = make_spatial_step_bruteforce(scene.triangles, cfg)
    calls = {"n": 0, "made": 0}

    def factory():
        calls["made"] += 1
        first = calls["made"] == 1

        def step(s):
            calls["n"] += 1
            if first and calls["n"] == 120:
                raise jax.errors.JaxRuntimeError("injected device loss")
            return real_step(s)

        return step

    runner = ResilientRunner(factory, chunk=50, max_retries=2, retry_wait_s=0.1)
    out = runner.run(state, total_steps=300)
    assert runner.recoveries == 1
    # reference trajectory without failure
    ref = state
    for _ in range(300):
        ref = real_step(ref)
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=1e-6, atol=1e-6
    )


def test_resilient_runner_gives_up():
    def factory():
        def step(s):
            raise jax.errors.JaxRuntimeError("always broken")

        return step

    state = spawn_grid(PRESETS["sample"], layers_y=1)
    runner = ResilientRunner(factory, chunk=10, max_retries=1, retry_wait_s=0.05)
    try:
        runner.run(state, total_steps=20)
        raise AssertionError("expected DeviceLost")
    except DeviceLost:
        pass


def test_resilient_runner_propagates_real_bugs():
    """Non-device exceptions (shape bugs, typos) must NOT be retried as
    device loss (ADVICE r1: bare-Exception catch masked real bugs)."""

    def factory():
        def step(s):
            raise ValueError("a real bug, not device loss")

        return step

    state = spawn_grid(PRESETS["sample"], layers_y=1)
    runner = ResilientRunner(factory, chunk=10, max_retries=3, retry_wait_s=0.05)
    try:
        runner.run(state, total_steps=20)
        raise AssertionError("expected ValueError to propagate")
    except ValueError:
        assert runner.recoveries == 0


def test_plan_chooser_tracks_phase_changes():
    """The chunk-level autotuner must sample every plan once, exploit the
    winner, re-probe close plans often / lopsided plans rarely, and
    switch when a phase change flips the ordering."""
    from particlesystemhybridcollisiondetection_tpu.bench.harness import (
        PlanChooser,
    )

    # phase 1 (chunks 0..39): A=10ms, B=12ms (close); phase 2: A=20, B=12
    def cost(name, i):
        if i < 40:
            return 10.0 if name == "A" else 12.0
        return 20.0 if name == "A" else 12.0

    ch = PlanChooser(["A", "B"])
    picks = []
    for i in range(80):
        p = ch.pick()
        picks.append(p)
        ch.record(p, cost(p, i))
    assert set(picks[:2]) == {"A", "B"}  # both sampled up front
    assert picks[2:40].count("A") > picks[2:40].count("B")  # exploit A
    assert picks[2:40].count("B") >= 3  # close plans re-probed often
    # after the flip, a probe of B discovers the change and B takes over
    assert picks[50:].count("B") > picks[50:].count("A")

    # lopsided plans are probed rarely
    ch2 = PlanChooser(["A", "B"])
    picks2 = []
    for i in range(66):
        p = ch2.pick()
        picks2.append(p)
        ch2.record(p, 10.0 if p == "A" else 25.0)
    assert picks2[2:].count("B") <= 2  # ~every 32 chunks only

    # single candidate: no probing machinery engaged
    ch3 = PlanChooser(["only"])
    assert [ch3.pick() for _ in range(3)] == ["only"] * 3
    ch3.record("only", 1.0)
    assert ch3.pick() == "only"


def test_plan_chooser_rotates_probes_over_all_losers():
    """With 3+ plans, probes must rotate across ALL non-best plans
    (least-recently-sampled first), not re-probe a fixed one (ADVICE r2:
    a fixed first-loser probe leaves the others' samples stale)."""
    from particlesystemhybridcollisiondetection_tpu.bench.harness import (
        PlanChooser,
    )

    ch = PlanChooser(["A", "B", "C"])
    picks = []
    for i in range(120):
        p = ch.pick()
        picks.append(p)
        # A always best; B and C close to each other
        ch.record(p, {"A": 10.0, "B": 12.0, "C": 12.5}[p])
    probes = [p for p in picks[3:] if p != "A"]
    assert probes.count("B") >= 2 and probes.count("C") >= 2
    # alternation: consecutive probes hit different losers
    assert all(a != b for a, b in zip(probes, probes[1:]))


def test_transport_noise_flag_two_run_groups():
    """With exactly 2 duplicate episodes the median CONTAINS the outlier
    (median(306, 28.5) = 167 -> 306 slips a 3x-median rule); the min is
    the robust reference there.  The real round-2 artifact row that
    motivated this: a 306 ms/step k=6 hybrid episode from a TPU-tunnel
    stall vs 28.5 on its duplicate."""
    from particlesystemhybridcollisiondetection_tpu.bench.harness import (
        _flag_transport_noise,
    )

    def row(ms):
        return {"method": "hybrid", "camera": "c3", "num_particles": 1,
                "mean_ms_per_step": ms}

    pair = [row(306.0), row(28.5)]
    _flag_transport_noise(pair)
    assert [r["suspect_transport_noise"] for r in pair] == [True, False]

    # honest 2-run variance (adaptive executor jitter) must NOT flag
    ok = [row(30.0), row(36.0)]
    _flag_transport_noise(ok)
    assert not any(r["suspect_transport_noise"] for r in ok)

    # 3+ duplicates keep the median rule
    trio = [row(28.0), row(30.0), row(306.0)]
    _flag_transport_noise(trio)
    assert [r["suspect_transport_noise"] for r in trio] == [
        False, False, True]
