"""Multi-step trajectory fidelity vs the scalar oracle + physics sanity.

BASELINE.md fidelity target: trajectories match the CPU reference to 1e-4
over 1k steps.  The scalar oracle is too slow for 1k steps at scale, so
exactness is checked on a small config over hundreds of steps; larger-scale
sanity is covered by property tests (no tunneling through the ground,
energy dissipation).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from particlesystemhybridcollisiondetection_tpu.config import SimConfig, GridConfig
from particlesystemhybridcollisiondetection_tpu.core.state import (
    ParticleState,
    spawn_grid,
    active_mask,
)
from particlesystemhybridcollisiondetection_tpu.core.step import (
    make_spatial_step_bruteforce,
    make_episode_runner,
)
from particlesystemhybridcollisiondetection_tpu.geometry import mesh as gmesh

import reference_impl as ref

F = np.float32


def _small_scene():
    """Cube + 2x-scaled ground plane (212 triangles)."""
    tris = gmesh.flatten_scene(
        [
            (gmesh.unity_plane(), gmesh.Transform(scale=(2.0, 2.0, 2.0))),
            (gmesh.unity_cube(), gmesh.Transform(position=(0.3, 0.5, 0.2))),
        ]
    )
    return tris


def _state_from_np(pos, vel, radius, bounce):
    n = pos.shape[0]
    return ParticleState(
        pos=jnp.asarray(pos.T, dtype=jnp.float32),
        vel=jnp.asarray(vel.T, dtype=jnp.float32),
        collisions=jnp.zeros((n,), dtype=jnp.int32),
        radius=jnp.full((n,), radius, dtype=jnp.float32),
        restitution=jnp.full((n,), bounce, dtype=jnp.float32),
    )


def test_trajectory_matches_oracle_300_steps():
    tris = _small_scene()
    gravity = np.array([0.0, -9.81, 0.0], dtype=F)
    radius, bounce, dt = F(0.2), F(0.5), F(0.004)
    pos = np.array(
        [[0.0, 2.0, 0.0], [0.35, 1.5, 0.21], [-1.2, 1.0, 0.8], [0.9, 2.5, -0.7]],
        dtype=F,
    )
    vel = np.array(
        [[0.0, 0.0, 0.0], [0.5, -1.0, 0.2], [-0.3, 0.0, 0.1], [0.0, -2.0, 0.0]],
        dtype=F,
    )
    steps = 300

    ref_pos, ref_vel, ref_nc, _ = ref.run_episode(
        pos, vel, radius, bounce, gravity, dt, tris, steps
    )

    cfg = SimConfig(
        particle_radius=float(radius),
        dt=float(dt),
        bounciness=float(bounce),
        grid=GridConfig(cell_size=0.5, expand=0.3),
    )
    step = make_spatial_step_bruteforce(tris, cfg)
    state = _state_from_np(pos, vel, radius, bounce)
    for _ in range(steps):
        state = step(state)

    got_pos = np.asarray(state.pos).T
    got_vel = np.asarray(state.vel).T
    got_nc = np.asarray(state.collisions)

    np.testing.assert_array_equal(got_nc, ref_nc)
    np.testing.assert_allclose(got_pos, ref_pos, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_vel, ref_vel, rtol=1e-4, atol=1e-3)


def test_sample_scene_no_tunneling_and_settles():
    """Property test at the sample preset's scale: particles never fall
    through the ground and kinetic energy dissipates."""
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import sample_scene

    scene = sample_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1, pad_multiple=128)
    mask = np.asarray(active_mask(state))

    step = make_spatial_step_bruteforce(scene.triangles, cfg)
    runner = make_episode_runner(step, 400)
    mid = runner(state)
    final = make_episode_runner(step, 1200)(mid)

    pos_f = np.asarray(final.pos)
    vel_mid = np.asarray(mid.vel)
    vel_f = np.asarray(final.vel)

    # ground is at y=0; nothing may tunnel below -radius
    assert pos_f[1][mask].min() > -cfg.particle_radius

    # in the bowl: |x|,|z| stay bounded (walls + ground work)
    assert np.abs(pos_f[0][mask]).max() < 25.0
    assert np.abs(pos_f[2][mask]).max() < 25.0

    # collisions actually happened
    assert np.asarray(final.collisions)[mask].sum() > 0

    # energy dissipates between step 400 and 1600
    ke_mid = (vel_mid[:, mask] ** 2).sum()
    ke_f = (vel_f[:, mask] ** 2).sum()
    assert ke_f < ke_mid


@pytest.mark.smoke
def test_speed_cover_guard():
    """ADVICE r4: the midpoint-lookup binning invariant fails LOUDLY.

    check_speed_cover raises at runner-build time when the declared
    episode can outrun 2*(expand - radius)/dt; every shipped preset must
    pass its own declared episode."""
    import pytest as _pytest

    from particlesystemhybridcollisiondetection_tpu.config import PRESETS
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        check_speed_cover,
    )

    for name, cfg in PRESETS.items():
        check_speed_cover(cfg)  # must not raise

    import dataclasses

    bad = dataclasses.replace(
        PRESETS["bunny"], lifetime_steps=4001
    )  # 9.81 * 0.01 * 4001 = 392 u/s > 220 covered
    # build-time default: warn (the bound keys on the DECLARED episode;
    # short diagnostic runs never reach it)
    with _pytest.warns(UserWarning, match="swept-lookup cover"):
        check_speed_cover(bad)
    # strict mode raises
    with _pytest.raises(ValueError, match="swept-lookup cover"):
        check_speed_cover(bad, strict=True)

    # dynamic variant (PSYS_SPEED_GUARD path is strict): a hot entry
    # state trips the guard
    cfg = PRESETS["bunny"]
    st = spawn_grid(cfg, layers_y=1)
    st = st._replace(vel=st.vel.at[1].set(-100.0))
    with _pytest.raises(ValueError, match="entry speed 100"):
        check_speed_cover(cfg, num_steps=cfg.lifetime_steps, state=st,
                          strict=True)
