"""The driver's five benchmark configurations (BASELINE.md), runnable by
name.  Each returns a metrics dict; the CLI exposes them as
``python -m particlesystemhybridcollisiondetection_tpu config --id N``.

  1. CPU brute-force O(n^2) sphere-sphere, ~2k particles, gravity box
  2. uniform grid broad phase, 50k particles, walls + restitution
  3. hybrid (screen-space + exact fallback), 250k, benchmark scene
  4. 1M particles, fused grid-build + narrow-phase + integrate pipeline
  5. 4M particles, heterogeneous radii/restitution, spatial grid sharded
     across chips with halo exchange (scaled to the available mesh)
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from particlesystemhybridcollisiondetection_tpu.config import SimConfig
from particlesystemhybridcollisiondetection_tpu.core.state import ParticleState
from particlesystemhybridcollisiondetection_tpu.core.step import (
    make_episode_runner,
    make_p2p_step,
)


def _box_state(n, box_lo, box_hi, radius, restitution, seed=0, hetero=False):
    rng = np.random.default_rng(seed)
    lo = np.asarray(box_lo)
    hi = np.asarray(box_hi)
    pos = np.stack(
        [
            rng.uniform(lo[0] + radius, hi[0] - radius, n),
            rng.uniform((lo[1] + hi[1]) / 2, hi[1] - radius, n),
            rng.uniform(lo[2] + radius, hi[2] - radius, n),
        ]
    ).astype(np.float32)
    r = (
        rng.uniform(0.7 * radius, 1.3 * radius, n).astype(np.float32)
        if hetero
        else np.full(n, radius, dtype=np.float32)
    )
    e = (
        rng.uniform(0.2, 0.6, n).astype(np.float32)
        if hetero
        else np.full(n, restitution, dtype=np.float32)
    )
    return ParticleState(
        pos=jnp.asarray(pos),
        vel=jnp.asarray((rng.normal(size=(3, n)) * 0.5).astype(np.float32)),
        collisions=jnp.zeros((n,), dtype=jnp.int32),
        radius=jnp.asarray(r),
        restitution=jnp.asarray(e),
    )


def _time_steps(step, state, steps, chunk=50):
    """Python-loop dispatch, fenced per chunk.

    Deliberately NOT lax.fori_loop (make_episode_runner): for the p2p
    kernel variant fori-wrapping would re-fuse the two deliberately
    separate programs into the monolithic form that crashes the TPU
    worker at 1M (see p2p_window_phase1).  Runtime is otherwise at
    parity (benchmarks/study_fori_loop.py -- the round-1 "4.7x slower"
    came from captured-constant tables, long gone).
    """
    from particlesystemhybridcollisiondetection_tpu.utils.profiling import fence

    state = step(state)
    fence(state.pos)
    t0 = time.perf_counter()
    done = 0
    while done < steps:
        k = min(chunk, steps - done)
        for _ in range(k):
            state = step(state)
        done += k
        fence(state.pos)  # readback fence: block_until_ready lies on axon
    dt = time.perf_counter() - t0
    return state, done / dt, dt


def config_1(steps: int = 500, n: int = 2048) -> dict:
    """Brute-force O(n^2) sphere-sphere vs the grid path, CPU-oracle scale.

    The "reference path" here is the literal O(n^2) evaluation (every pair
    tested densely); the grid path must agree statistically and beat it.
    """
    box_lo, box_hi = (0.0, 0.0, 0.0), (24.0, 32.0, 24.0)
    cfg = SimConfig(particle_radius=0.4, dt=0.005, bounciness=0.3)
    state = _box_state(n, box_lo, box_hi, 0.4, 0.3)

    from particlesystemhybridcollisiondetection_tpu.ops import p2p as p2p_ops
    from particlesystemhybridcollisiondetection_tpu.ops.integrate import integrate

    gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)

    @jax.jit
    def brute_step(s):
        s = p2p_ops.p2p_collide_allpairs(s)
        s = p2p_ops.box_walls_collide(s, box_lo, box_hi, gravity, cfg.dt)
        p, v = integrate(s.pos, s.vel, gravity, cfg.dt)
        return s._replace(pos=p, vel=v)

    grid_step = make_p2p_step(box_lo, box_hi, cfg, capacity=12)

    _, brute_sps, _ = _time_steps(brute_step, state, min(steps, 100))
    out, grid_sps, _ = _time_steps(grid_step, state, steps)
    return {
        "config": 1,
        "particles": n,
        "brute_steps_per_sec": brute_sps,
        "grid_steps_per_sec": grid_sps,
        "speedup": grid_sps / brute_sps,
        "particle_steps_per_sec": grid_sps * n,
        "contacts": int(np.asarray(out.collisions).sum()),
    }


def config_2(steps: int = 500, n: int = 50_000) -> dict:
    """50k particles, uniform grid, walls + restitution."""
    side = round(n ** (1 / 3) * 4 * 0.4)  # ~4r spacing at fill
    box_lo, box_hi = (0.0, 0.0, 0.0), (side, side, side)
    cfg = SimConfig(particle_radius=0.4, dt=0.005, bounciness=0.3)
    state = _box_state(n, box_lo, box_hi, 0.4, 0.3)
    step = make_p2p_step(
        box_lo, box_hi, cfg, capacity=8, variant="auto", with_stats=True
    )
    out, sps, _ = _time_steps(lambda s: step(s)[0], state, steps)
    _, stats = step(out)
    return {
        "config": 2,
        "particles": n,
        "steps_per_sec": sps,
        "particle_steps_per_sec": sps * n,
        "contacts": int(np.asarray(out.collisions).sum()),
        "cell_overflow_last_step": int(stats["cell_overflow"]),
    }


def config_3(steps: int = 300, layers: int = 16) -> dict:
    """Hybrid method at 128^2*16 = 262k on the bunny benchmark scene."""
    from particlesystemhybridcollisiondetection_tpu.bench.harness import run_episode
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import bunny_scene

    scene = bunny_scene(width=960, height=540)
    # pinned coded plan: a 300-step spawn-phase run is the coded plan's
    # best regime and too short to amortize the adaptive A/B probe
    r = run_episode(
        scene, "hybrid", layers_y=layers, num_steps=steps,
        plan="kernel",
    )
    return {
        "config": 3,
        "particles": r.num_particles,
        "steps_per_sec": r.steps_per_sec,
        "particle_steps_per_sec": r.particle_steps_per_sec,
        "mean_ms": r.mean_ms,
    }


def config_4(steps: int = 200, n: int = 1_000_000) -> dict:
    """1M particles, fused on-device grid-build + narrow phase + integrate."""
    side = round(n ** (1 / 3) * 4 * 0.4)
    box_lo, box_hi = (0.0, 0.0, 0.0), (side, side / 2, side)
    cfg = SimConfig(particle_radius=0.4, dt=0.005, bounciness=0.3)
    state = _box_state(n, box_lo, box_hi, 0.4, 0.3)
    step = make_p2p_step(
        box_lo, box_hi, cfg, capacity=8, variant="auto", with_stats=True
    )
    out, sps, _ = _time_steps(lambda s: step(s)[0], state, steps, chunk=20)
    _, stats = step(out)
    return {
        "config": 4,
        "particles": n,
        "steps_per_sec": sps,
        "particle_steps_per_sec": sps * n,
        "contacts": int(np.asarray(out.collisions).sum()),
        "cell_overflow_last_step": int(stats["cell_overflow"]),
    }


def config_5(steps: int = 100, n: Optional[int] = None, n_shards: Optional[int] = None) -> dict:
    """Heterogeneous radii/restitution, spatial grid sharded across chips
    with halo exchange.  Scales to the available devices (4M at 8+ real
    chips; proportionally fewer on the virtual mesh)."""
    from particlesystemhybridcollisiondetection_tpu.parallel import domain as dom

    n_dev = len(jax.devices())
    shards = n_shards or n_dev
    n = n or 500_000 * shards
    side = 40.0 * shards
    box_lo, box_hi = (0.0, 0.0, 0.0), (side, 80.0, 40.0)
    cfg = SimConfig(particle_radius=0.4, dt=0.005, bounciness=0.3)
    state = _box_state(n, box_lo, box_hi, 0.4, 0.3, hetero=True)

    cap = int(np.ceil(n / shards * 2 / 128)) * 128
    dcfg = dom.DomainConfig(
        box_lo=box_lo, box_hi=box_hi, n_shards=shards,
        shard_capacity=cap,
        halo_capacity=max(2048, cap // 8),
        migrate_capacity=max(2048, cap // 8),
        cell_size=2 * 0.4 * 1.3,
    )
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:shards]), (dom.AXIS,))
    st = dom.shard_domain_state(dom.distribute(state, dcfg), mesh)
    step = dom.make_domain_step(dcfg, cfg, mesh)
    from particlesystemhybridcollisiondetection_tpu.utils.profiling import fence

    st, stats = step(st)
    fence(st.pos)
    t0 = time.perf_counter()
    for _ in range(steps):
        st, stats = step(st)
    fence(st.pos)  # readback fence: block_until_ready lies on axon
    dt = time.perf_counter() - t0
    return {
        "config": 5,
        "particles": n,
        "shards": shards,
        "steps_per_sec": steps / dt,
        "particle_steps_per_sec": steps / dt * n,
        "halo_overflow_last_step": int(stats[0]),
        "migrate_overflow_last_step": int(stats[1]),
        "cell_overflow_last_step": int(stats[2]),
    }


CONFIGS = {1: config_1, 2: config_2, 3: config_3, 4: config_4, 5: config_5}
