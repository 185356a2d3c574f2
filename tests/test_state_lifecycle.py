"""State lifecycle: spawn layout parity with the reference, episode reset,
sentinel semantics."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke
import jax.numpy as jnp

from particlesystemhybridcollisiondetection_tpu.config import (
    FLOAT_SENTINEL,
    PRESETS,
    REFERENCE_PARTICLE_CAP,
    SimConfig,
)
from particlesystemhybridcollisiondetection_tpu.core.state import (
    active_mask,
    reset_episode,
    spawn_grid,
)


def test_spawn_layout_matches_reference_loop():
    """Spawn positions must equal the reference's i/j/k loop
    (ParticleSys.cs:227-243): pos = star - (offset*i, -(offset*j*4),
    offset*k), i over x, j over y-layers, k over z."""
    cfg = SimConfig(num_particles_xz=3, offset_xz=2.0, spawn_origin=(1.0, 10.0, -1.0))
    layers = 2
    state = spawn_grid(cfg, layers_y=layers, pad_multiple=128)
    got = np.asarray(state.pos).T

    d, off = 3, 2.0
    star = np.array([(d - 1) / 2 * off + 1.0, 10.0, (d - 1) / 2 * off - 1.0])
    expect = []
    for i in range(d):
        for j in range(layers):
            for k in range(d):
                expect.append(star - np.array([off * i, -(off * j * 4), off * k]))
    expect = np.asarray(expect, dtype=np.float32)
    np.testing.assert_allclose(got[: len(expect)], expect, rtol=1e-6)
    # padding rows are sentinels with zero velocity
    assert (got[len(expect):, 0] == FLOAT_SENTINEL).all()
    assert (np.asarray(state.vel) == 0).all()


def test_spawn_respects_reference_cap():
    cfg = SimConfig(num_particles_xz=128)
    assert cfg.spawn_count(1 << 10) == REFERENCE_PARTICLE_CAP  # 65535*32


def test_reset_episode_restores_pos_vel_keeps_counters():
    """Episode reset re-uploads initial pos/vel but keeps collision
    counters (ParticleSys.cs:520-526 + BenchmarkManager.cs:160)."""
    cfg = PRESETS["sample"]
    initial = spawn_grid(cfg, layers_y=1, pad_multiple=128)
    evolved = initial._replace(
        pos=initial.pos + 1.0,
        vel=initial.vel - 2.0,
        collisions=initial.collisions + 7,
    )
    back = reset_episode(evolved, initial)
    np.testing.assert_array_equal(np.asarray(back.pos), np.asarray(initial.pos))
    np.testing.assert_array_equal(np.asarray(back.vel), np.asarray(initial.vel))
    np.testing.assert_array_equal(
        np.asarray(back.collisions), np.asarray(evolved.collisions)
    )


def test_active_mask_tracks_sentinels():
    cfg = PRESETS["sample"]
    state = spawn_grid(cfg, layers_y=1, pad_multiple=128)
    m = np.asarray(active_mask(state))
    assert m.sum() == 49
    assert m[:49].all() and not m[49:].any()


def test_spawn_jitter_deterministic_and_bounded():
    """Ensemble-study jitter: per-seed deterministic, bounded by
    jitter * offset_xz on every axis, and leaves sentinels untouched."""
    cfg = PRESETS["sample"]
    base = spawn_grid(cfg, layers_y=2, pad_multiple=128)
    a = spawn_grid(cfg, layers_y=2, pad_multiple=128, jitter=0.05, seed=3)
    b = spawn_grid(cfg, layers_y=2, pad_multiple=128, jitter=0.05, seed=3)
    c = spawn_grid(cfg, layers_y=2, pad_multiple=128, jitter=0.05, seed=4)

    pa, pb, pc, p0 = (np.asarray(s.pos) for s in (a, b, c, base))
    m = np.asarray(active_mask(base))
    n = int(m.sum())

    # same seed -> bitwise identical; different seed -> different
    np.testing.assert_array_equal(pa, pb)
    assert not np.array_equal(pa[:, :n], pc[:, :n])

    # perturbation bounded by jitter * offset_xz on every axis, nonzero
    d = pa[:, :n] - p0[:, :n]
    bound = 0.05 * cfg.offset_xz
    assert np.abs(d).max() <= bound + 1e-7
    assert np.abs(d).max() > 0.0

    # sentinel padding rows untouched
    np.testing.assert_array_equal(pa[:, n:], p0[:, n:])
    assert (pa[0, n:] == FLOAT_SENTINEL).all()
