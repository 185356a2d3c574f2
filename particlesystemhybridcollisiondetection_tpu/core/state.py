"""Particle state pytree and initializers.

Mirrors the reference's SoA ComputeBuffers (particlesPosCb / particlesVelCb,
ParticleSys.cs:54-55) as a flax-free pytree of planar ``f32[3, N]`` arrays,
plus the accuracy counter buffer (ParticleSys.cs:115-117) carried in-state so
it lives on device for the whole episode.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from particlesystemhybridcollisiondetection_tpu.config import (
    FLOAT_SENTINEL,
    PARTICLE_PAD,
    REFERENCE_PARTICLE_CAP,
    SimConfig,
)


class ParticleState(NamedTuple):
    """State pytree.  All arrays share the padded particle axis N.

    pos, vel:    f32[3, N] planar SoA (reference: RWStructuredBuffer<float3>)
    collisions:  i32[N] per-particle resolved-collision counter
                 (reference ACCURACY_BENCHMARK numCollisions buffers,
                 ParticleSys.cs:326-358)
    radius:      f32[N] per-particle radius. The reference has a single
                 scalar (ParticleSys.cs:41); heterogeneous radii are a
                 capability extension used by the multi-chip benchmark
                 config.
    restitution: f32[N] per-particle bounciness (same extension).
    """

    pos: jnp.ndarray
    vel: jnp.ndarray
    collisions: jnp.ndarray
    radius: jnp.ndarray
    restitution: jnp.ndarray

    @property
    def n_padded(self) -> int:
        return self.pos.shape[-1]


def _pad_count(n: int, multiple: int = PARTICLE_PAD) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def spawn_grid(
    cfg: SimConfig,
    layers_y: int = 1,
    *,
    pad_multiple: int = PARTICLE_PAD,
    radius: Optional[np.ndarray] = None,
    restitution: Optional[np.ndarray] = None,
    cap: Optional[int] = REFERENCE_PARTICLE_CAP,
    dtype=jnp.float32,
    jitter: float = 0.0,
    seed: int = 0,
) -> ParticleState:
    """Spawn the reference's particle block.

    Reproduces SetupParticleDependentData (ParticleSys.cs:227-255): an
    ``numParticlesXZ^2 x layers_y`` grid centred on ``spawn_origin``; the
    XZ spacing is ``offset_xz`` and the Y spacing is ``4 * offset_xz``;
    all velocities start at zero.  Particles beyond the reference cap
    (65535*32, ParticleSys.cs:236) are dropped, and the array is padded to
    ``pad_multiple`` with sentinel particles at ``1e38`` with zero velocity
    (ParticleSys.cs:247-255) -- padding therefore behaves identically to
    the reference's padding threads.

    Spawn-loop order matches the reference (i over x, j over y, k over z)
    so particle indices line up with the Unity build for trajectory
    comparison.
    """
    d = cfg.num_particles_xz
    offset = cfg.offset_xz
    origin = np.asarray(cfg.spawn_origin, dtype=np.float64)

    # The reference caps at 65535 thread groups * 32 (ParticleSys.cs:236);
    # kept as the parity default, pass cap=None to scale past it (the TPU
    # build has no dispatch limit).
    n_logical = d * d * layers_y
    if cap is not None:
        n_logical = min(n_logical, cap)

    # starPos = ((d-1)/2, 0, (d-1)/2) * offset + origin  (ParticleSys.cs:227-229)
    xz_start = (d - 1) / 2.0
    star = np.array([xz_start * offset, 0.0, xz_start * offset]) + origin

    # Vectorized replication of the i/j/k loop (ParticleSys.cs:230-243):
    # pos = star - (offset*i, -(offset*j*4), offset*k)
    idx = np.arange(n_logical)
    # loop order: i (x) outer, then j (y), then k (z) inner
    k = idx % d
    j = (idx // d) % layers_y
    i = idx // (d * layers_y)
    pos = np.empty((3, n_logical), dtype=np.float64)
    pos[0] = star[0] - offset * i
    pos[1] = star[1] + offset * j * 4.0
    pos[2] = star[2] - offset * k

    if jitter:
        # ensemble-study perturbation (not part of the reference spawn):
        # uniform [-jitter, jitter] * offset_xz on every axis, from a
        # deterministic per-seed generator, so N jittered episodes sample
        # the distribution of trajectories instead of one member
        rng = np.random.default_rng(seed)
        pos += rng.uniform(-jitter * offset, jitter * offset,
                           size=(3, n_logical))

    n_pad = _pad_count(n_logical, pad_multiple)
    pos_p = np.full((3, n_pad), FLOAT_SENTINEL, dtype=np.float32)
    pos_p[:, :n_logical] = pos.astype(np.float32)
    vel_p = np.zeros((3, n_pad), dtype=np.float32)

    r = np.full((n_pad,), cfg.particle_radius, dtype=np.float32)
    if radius is not None:
        r[:n_logical] = np.asarray(radius, dtype=np.float32)
    e = np.full((n_pad,), cfg.bounciness, dtype=np.float32)
    if restitution is not None:
        e[:n_logical] = np.asarray(restitution, dtype=np.float32)

    return ParticleState(
        pos=jnp.asarray(pos_p, dtype=dtype),
        vel=jnp.asarray(vel_p, dtype=dtype),
        collisions=jnp.zeros((n_pad,), dtype=jnp.int32),
        radius=jnp.asarray(r),
        restitution=jnp.asarray(e),
    )


def active_mask(state: ParticleState) -> jnp.ndarray:
    """bool[N]: True for real (non-sentinel) particles.

    Sentinels are spawned at 1e38 and, exactly like the reference's padding
    threads, still get integrated each step -- so "active" is defined by
    position magnitude, not a stored count.
    """
    return jnp.abs(state.pos[0]) < FLOAT_SENTINEL * 0.5


def reset_episode(state: ParticleState, initial: ParticleState) -> ParticleState:
    """Episode reset: re-upload initial pos/vel (ParticleSys.cs:520-526).

    Collision counters are preserved, matching the reference (they are only
    reset by ResetBenchmarkCollisons, BenchmarkManager.cs:160).
    """
    return state._replace(pos=initial.pos, vel=initial.vel)


def snapshot(state: ParticleState) -> dict:
    """Checkpoint: a host-side dict of numpy arrays (np.savez-able)."""
    return {k: np.asarray(v) for k, v in state._asdict().items()}


def restore(data: dict) -> ParticleState:
    return ParticleState(**{k: jnp.asarray(v) for k, v in data.items()})
