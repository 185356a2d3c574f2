"""BASELINE.md fidelity requirements: 1k-step trajectory match to the CPU
oracle at 1e-4, and bitwise determinism across runs."""

import numpy as np
import jax.numpy as jnp

from particlesystemhybridcollisiondetection_tpu.config import GridConfig, SimConfig
from particlesystemhybridcollisiondetection_tpu.core.state import ParticleState, spawn_grid
from particlesystemhybridcollisiondetection_tpu.core.step import (
    make_episode_runner,
    make_method_step,
    make_spatial_step_grid,
)
from particlesystemhybridcollisiondetection_tpu.geometry import mesh as gmesh

import reference_impl as ref
import pytest

F = np.float32


def _state_from_np(pos, vel, radius, bounce):
    n = pos.shape[0]
    return ParticleState(
        pos=jnp.asarray(pos.T, dtype=jnp.float32),
        vel=jnp.asarray(vel.T, dtype=jnp.float32),
        collisions=jnp.zeros((n,), dtype=jnp.int32),
        radius=jnp.full((n,), radius, dtype=jnp.float32),
        restitution=jnp.full((n,), bounce, dtype=jnp.float32),
    )


@pytest.mark.slow
def test_1000_step_trajectory_matches_oracle():
    """Production (packed grid) path vs the scalar HLSL transcription over
    1000 steps with multiple bounces: 1e-4 (BASELINE.md fidelity row)."""
    tris = gmesh.flatten_scene(
        [
            (gmesh.unity_plane(), gmesh.Transform(scale=(2.0, 2.0, 2.0))),
            (gmesh.unity_cube(), gmesh.Transform(position=(0.3, 0.5, 0.2))),
        ]
    )
    gravity = np.array([0.0, -9.81, 0.0], dtype=F)
    radius, bounce, dt = F(0.2), F(0.5), F(0.004)
    pos = np.array([[0.0, 2.0, 0.0], [-1.2, 1.2, 0.8]], dtype=F)
    vel = np.array([[0.0, 0.0, 0.0], [-0.3, 0.0, 0.1]], dtype=F)
    steps = 1000

    ref_pos, ref_vel, ref_nc, _ = ref.run_episode(
        pos, vel, radius, bounce, gravity, dt, tris, steps
    )

    cfg = SimConfig(
        particle_radius=float(radius),
        dt=float(dt),
        bounciness=float(bounce),
        grid=GridConfig(cell_size=0.5, expand=0.3),
    )
    step = make_spatial_step_grid(tris, cfg, variant="packed")
    state = _state_from_np(pos, vel, radius, bounce)
    for _ in range(steps):
        state = step(state)

    np.testing.assert_array_equal(np.asarray(state.collisions), ref_nc)
    np.testing.assert_allclose(np.asarray(state.pos).T, ref_pos, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.vel).T, ref_vel, rtol=1e-4, atol=1e-3)
    assert ref_nc.sum() >= 10  # the horizon really contains bounces


def test_episode_bitwise_deterministic():
    """Two runs of the same compiled episode produce bit-identical state
    (the reference cannot even rebuild its BVH reproducibly -- it samples
    SAH with UnityEngine.Random, ParticleSys.cs:1195)."""
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import sample_scene

    scene = sample_scene(width=128, height=128)
    step = make_method_step(scene, "hybrid")
    runner = make_episode_runner(step, 500)
    a = runner(spawn_grid(scene.config, layers_y=1, pad_multiple=128))
    b = runner(spawn_grid(scene.config, layers_y=1, pad_multiple=128))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_scene_rebuild_deterministic():
    """Scene/grid builds are reproducible run-to-run (native + numpy)."""
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import sample_scene
    from particlesystemhybridcollisiondetection_tpu.ops.grid import build_triangle_grid

    s1 = sample_scene()
    s2 = sample_scene()
    np.testing.assert_array_equal(s1.triangles, s2.triangles)
    g1, m1 = build_triangle_grid(s1.triangles, s1.config.grid)
    g2, m2 = build_triangle_grid(s2.triangles, s2.config.grid)
    assert m1 == m2
    np.testing.assert_array_equal(np.asarray(g1.tri_ids), np.asarray(g2.tri_ids))
