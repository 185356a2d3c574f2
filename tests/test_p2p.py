"""Particle-particle collisions: grid-vs-brute-force equivalence, momentum
conservation, and gravity-box behavior (driver benchmark configs 1/2)."""

import numpy as np
import jax.numpy as jnp

from particlesystemhybridcollisiondetection_tpu.config import SimConfig
from particlesystemhybridcollisiondetection_tpu.core.state import ParticleState
from particlesystemhybridcollisiondetection_tpu.core.step import make_p2p_step
from particlesystemhybridcollisiondetection_tpu.ops import p2p as p2p_ops
from particlesystemhybridcollisiondetection_tpu.ops import pgrid as pg

F = np.float32


def brute_force_p2p(pos, vel, radius, restitution, beta=0.5):
    """O(N^2) NumPy oracle of the documented impulse model."""
    n = len(pos)
    mass = radius**3
    dv = np.zeros_like(vel)
    dp = np.zeros_like(pos)
    contacts = np.zeros(n, dtype=np.int64)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = pos[i] - pos[j]
            dist2 = float(d @ d)
            rsum = radius[i] + radius[j]
            if dist2 >= rsum * rsum or dist2 == 0.0:
                continue
            dist = np.sqrt(dist2)
            nrm = d / dist
            vn = float((vel[i] - vel[j]) @ nrm)
            e = 0.5 * (restitution[i] + restitution[j])
            w = mass[j] / (mass[i] + mass[j])
            if vn < 0.0:
                dv[i] += nrm * (-(1.0 + e) * vn * w)
            dp[i] += nrm * (beta * (rsum - dist) * w)
            contacts[i] += 1
    return pos + dp, vel + dv, contacts


def _state(pos, vel, radius, rest):
    n = pos.shape[0]
    return ParticleState(
        pos=jnp.asarray(pos.T, dtype=jnp.float32),
        vel=jnp.asarray(vel.T, dtype=jnp.float32),
        collisions=jnp.zeros((n,), dtype=jnp.int32),
        radius=jnp.asarray(radius, dtype=jnp.float32),
        restitution=jnp.asarray(rest, dtype=jnp.float32),
    )


def test_p2p_grid_matches_bruteforce():
    rng = np.random.default_rng(0)
    n = 96
    pos = rng.uniform(0.5, 7.5, size=(n, 3)).astype(F)
    vel = rng.normal(size=(n, 3)).astype(F) * 2
    radius = rng.uniform(0.15, 0.3, size=n).astype(F)  # heterogeneous
    rest = rng.uniform(0.2, 0.8, size=n).astype(F)

    ref_pos, ref_vel, ref_ct = brute_force_p2p(pos, vel, radius, rest)

    meta = pg.make_meta((0, 0, 0), (8, 8, 8), cell_size=0.6, capacity=16)
    out, overflow = p2p_ops.p2p_collide(_state(pos, vel, radius, rest), meta)
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(out.collisions), ref_ct)
    np.testing.assert_allclose(np.asarray(out.pos).T, ref_pos, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vel).T, ref_vel, rtol=1e-5, atol=1e-5)


def test_p2p_momentum_conserved():
    rng = np.random.default_rng(1)
    n = 64
    pos = rng.uniform(0, 3, size=(n, 3)).astype(F)
    vel = rng.normal(size=(n, 3)).astype(F) * 3
    radius = np.full(n, 0.35, dtype=F)
    rest = np.full(n, 0.9, dtype=F)
    meta = pg.make_meta((-1, -1, -1), (4, 4, 4), cell_size=0.7, capacity=32)
    s0 = _state(pos, vel, radius, rest)
    out, overflow = p2p_ops.p2p_collide(s0, meta)
    assert int(overflow) == 0
    m = radius**3
    p_before = (m[None] * np.asarray(s0.vel)).sum(axis=1)
    p_after = (m[None] * np.asarray(out.vel)).sum(axis=1)
    np.testing.assert_allclose(p_after, p_before, rtol=1e-3, atol=1e-3)


def test_gravity_box_settles():
    """Config-1-shaped scenario: particles under gravity in a box settle
    without escaping, without NaN, with dissipating energy."""
    rng = np.random.default_rng(2)
    n = 512
    box_lo, box_hi = (0.0, 0.0, 0.0), (16.0, 24.0, 16.0)
    pos = np.stack(
        [rng.uniform(1, 15, n), rng.uniform(8, 23, n), rng.uniform(1, 15, n)],
        axis=1,
    ).astype(F)
    vel = rng.normal(size=(n, 3)).astype(F)
    radius = np.full(n, 0.4, dtype=F)
    rest = np.full(n, 0.3, dtype=F)
    cfg = SimConfig(particle_radius=0.4, dt=0.005, bounciness=0.3)
    step = make_p2p_step(box_lo, box_hi, cfg, capacity=12)
    s = _state(pos, vel, radius, rest)
    for k in range(1500):
        s = step(s)
    p = np.asarray(s.pos)
    v = np.asarray(s.vel)
    assert not np.isnan(p).any()
    assert (p[0] >= -0.01).all() and (p[0] <= 16.01).all()
    assert (p[1] >= -0.01).all() and (p[1] <= 24.01).all()
    assert (p[2] >= -0.01).all() and (p[2] <= 16.01).all()
    # settled: low kinetic energy, most particles near the floor
    ke = (v**2).sum()
    assert ke < n * 1.0, ke
    assert np.median(p[1]) < 6.0
    # no deep interpenetration among a sample of pairs
    sub = p[:, :128].T
    d = np.linalg.norm(sub[:, None] - sub[None, :], axis=-1)
    d[np.arange(128), np.arange(128)] = 1e9
    assert d.min() > 0.4  # >= half the contact distance (0.8) => no deep overlap


def test_p2p_dense_stencil_matches_bruteforce():
    """The gather-free dense-cell stencil variant implements the identical
    contact model."""
    from particlesystemhybridcollisiondetection_tpu.ops.p2p_dense import (
        p2p_collide_dense,
    )

    rng = np.random.default_rng(4)
    n = 96
    pos = rng.uniform(0.5, 7.5, size=(n, 3)).astype(F)
    vel = (rng.normal(size=(n, 3)) * 2).astype(F)
    radius = rng.uniform(0.15, 0.3, size=n).astype(F)
    rest = rng.uniform(0.2, 0.8, size=n).astype(F)
    ref_pos, ref_vel, ref_ct = brute_force_p2p(pos, vel, radius, rest)
    meta = pg.make_meta((0, 0, 0), (8, 8, 8), cell_size=0.6, capacity=16)
    out, overflow = p2p_collide_dense(_state(pos, vel, radius, rest), meta)
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(out.collisions), ref_ct)
    np.testing.assert_allclose(np.asarray(out.pos).T, ref_pos, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vel).T, ref_vel, rtol=1e-4, atol=1e-5)


def test_pgrid_overflow_counted():
    """Overstuffed cell -> overflow is reported, not silently dropped."""
    n = 32
    pos = np.zeros((n, 3), dtype=F)  # all in one cell
    meta = pg.make_meta((-1, -1, -1), (1, 1, 1), cell_size=2.0, capacity=8)
    grid = pg.build(jnp.asarray(pos.T), meta)
    assert int(grid.overflow) == n - 8


def test_p2p_sorted_matches_bruteforce():
    """The sorted-segment path (the performance path) implements the
    identical contact model, including heterogeneous radii/restitution."""
    from particlesystemhybridcollisiondetection_tpu.ops.p2p_sorted import (
        p2p_collide_sorted,
    )

    rng = np.random.default_rng(5)
    n = 96
    pos = rng.uniform(0.5, 7.5, size=(n, 3)).astype(F)
    vel = (rng.normal(size=(n, 3)) * 2).astype(F)
    radius = rng.uniform(0.15, 0.3, size=n).astype(F)
    rest = rng.uniform(0.2, 0.8, size=n).astype(F)
    ref_pos, ref_vel, ref_ct = brute_force_p2p(pos, vel, radius, rest)
    meta = pg.make_meta((0, 0, 0), (8, 8, 8), cell_size=0.6, capacity=16)
    out, overflow = p2p_collide_sorted(_state(pos, vel, radius, rest), meta)
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(out.collisions), ref_ct)
    np.testing.assert_allclose(np.asarray(out.pos).T, ref_pos, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vel).T, ref_vel, rtol=1e-4, atol=1e-5)


def test_p2p_sorted_boundary_and_outside_particles():
    """Particles at and OUTSIDE the grid box (clamped cells): boundary
    z-runs wrap into neighboring y-rows and out-of-box particles pile into
    border cells -- the distance test must keep results exact anyway."""
    from particlesystemhybridcollisiondetection_tpu.ops.p2p_sorted import (
        p2p_collide_sorted,
    )

    rng = np.random.default_rng(6)
    n = 128
    # straddle all box faces, with clusters outside
    pos = rng.uniform(-1.5, 5.5, size=(n, 3)).astype(F)
    pos[:16] = rng.uniform(-2.0, -1.2, size=(16, 3))  # cluster below origin
    vel = (rng.normal(size=(n, 3)) * 2).astype(F)
    radius = rng.uniform(0.1, 0.25, size=n).astype(F)
    rest = np.full(n, 0.5, dtype=F)
    ref_pos, ref_vel, ref_ct = brute_force_p2p(pos, vel, radius, rest)
    meta = pg.make_meta((0, 0, 0), (4, 4, 4), cell_size=0.5, capacity=64)
    out, _ = p2p_collide_sorted(_state(pos, vel, radius, rest), meta)
    np.testing.assert_array_equal(np.asarray(out.collisions), ref_ct)
    np.testing.assert_allclose(np.asarray(out.pos).T, ref_pos, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vel).T, ref_vel, rtol=1e-4, atol=1e-5)


def test_p2p_sorted_dense_cell_exact():
    """Many particles in ONE cell: the slot table would saturate; the
    sorted CSR runs must handle it exactly (no dropped contacts)."""
    from particlesystemhybridcollisiondetection_tpu.ops.p2p_sorted import (
        p2p_collide_sorted,
    )

    rng = np.random.default_rng(7)
    n = 64
    pos = (rng.uniform(2.0, 2.4, size=(n, 3))).astype(F)  # all in one cell
    vel = (rng.normal(size=(n, 3)) * 1).astype(F)
    radius = np.full(n, 0.12, dtype=F)
    rest = np.full(n, 0.5, dtype=F)
    ref_pos, ref_vel, ref_ct = brute_force_p2p(pos, vel, radius, rest)
    meta = pg.make_meta((0, 0, 0), (8, 8, 8), cell_size=0.5, capacity=4)
    out, overflow = p2p_collide_sorted(_state(pos, vel, radius, rest), meta)
    assert int(overflow) == 0
    assert int(np.asarray(out.collisions).sum()) == int(ref_ct.sum()) > 0
    np.testing.assert_allclose(np.asarray(out.pos).T, ref_pos, rtol=1e-5, atol=1e-5)


def test_p2p_sorted_sentinel_particles_inert():
    """Sentinel (inactive) particles neither move nor collide."""
    from particlesystemhybridcollisiondetection_tpu.core.state import active_mask
    from particlesystemhybridcollisiondetection_tpu.ops.p2p_sorted import (
        p2p_collide_sorted,
    )

    rng = np.random.default_rng(8)
    n = 64
    pos = rng.uniform(0.5, 3.5, size=(n, 3)).astype(F)
    pos[48:] = 1e38  # sentinels
    vel = (rng.normal(size=(n, 3)) * 2).astype(F)
    radius = np.full(n, 0.2, dtype=F)
    rest = np.full(n, 0.5, dtype=F)
    s = _state(pos, vel, radius, rest)
    meta = pg.make_meta((0, 0, 0), (4, 4, 4), cell_size=0.5, capacity=16)
    out, _ = p2p_collide_sorted(s, meta, active=active_mask(s))
    live_pos, live_vel, live_ct = brute_force_p2p(
        pos[:48], vel[:48], radius[:48], rest[:48]
    )
    np.testing.assert_array_equal(np.asarray(out.collisions[48:]), 0)
    np.testing.assert_allclose(np.asarray(out.pos[:, 48:]).T, pos[48:])
    np.testing.assert_array_equal(np.asarray(out.collisions[:48]), live_ct)
    np.testing.assert_allclose(np.asarray(out.pos[:, :48]).T, live_pos, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vel[:, :48]).T, live_vel, rtol=1e-4, atol=1e-5)


def test_p2p_sorted_momentum_conserved():
    from particlesystemhybridcollisiondetection_tpu.ops.p2p_sorted import (
        p2p_collide_sorted,
    )

    rng = np.random.default_rng(9)
    n = 256
    pos = rng.uniform(0, 3, size=(n, 3)).astype(F)
    vel = (rng.normal(size=(n, 3)) * 3).astype(F)
    radius = rng.uniform(0.2, 0.35, size=n).astype(F)
    rest = np.full(n, 0.9, dtype=F)
    meta = pg.make_meta((-1, -1, -1), (4, 4, 4), cell_size=0.7, capacity=32)
    s0 = _state(pos, vel, radius, rest)
    out, _ = p2p_collide_sorted(s0, meta)
    m = radius**3
    p_before = (m[None] * np.asarray(s0.vel)).sum(axis=1)
    p_after = (m[None] * np.asarray(out.vel)).sum(axis=1)
    np.testing.assert_allclose(p_after, p_before, rtol=1e-3, atol=1e-3)


def test_p2p_window_kernel_matches_bruteforce_interpret():
    """The Pallas 9-run block-window kernel (the TPU p2p path), in
    interpret mode, against the O(N^2) oracle -- incl. its chunked exact
    fallback forced by a tiny window."""
    from particlesystemhybridcollisiondetection_tpu.ops.p2p_sorted import (
        p2p_collide_window,
    )

    rng = np.random.default_rng(10)
    n = 192
    pos = rng.uniform(0.5, 7.5, size=(n, 3)).astype(F)
    vel = (rng.normal(size=(n, 3)) * 2).astype(F)
    radius = rng.uniform(0.15, 0.3, size=n).astype(F)
    rest = rng.uniform(0.2, 0.8, size=n).astype(F)
    ref_pos, ref_vel, ref_ct = brute_force_p2p(pos, vel, radius, rest)
    meta = pg.make_meta((0, 0, 0), (8, 8, 8), cell_size=0.6, capacity=16)
    s = _state(pos, vel, radius, rest)

    out, n_over = p2p_collide_window(s, meta, interpret=True)
    assert int(n_over) == 0
    np.testing.assert_array_equal(np.asarray(out.collisions), ref_ct)
    np.testing.assert_allclose(np.asarray(out.pos).T, ref_pos, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vel).T, ref_vel, rtol=1e-4, atol=1e-5)

    # window too small for the spread of runs in one 1024-block: particles
    # overflow and must be redone EXACTLY by the chunked fallback
    out2, n_over2 = p2p_collide_window(s, meta, window=128, interpret=True)
    assert int(n_over2) > 0
    np.testing.assert_array_equal(np.asarray(out2.collisions), ref_ct)
    np.testing.assert_allclose(np.asarray(out2.pos).T, ref_pos, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2.vel).T, ref_vel, rtol=1e-4, atol=1e-5)


def test_p2p_window_kernel_sentinels_and_multiblock_interpret():
    """>1 block (n > 1024) with sentinel particles: block windows are
    per-block, sentinels park in the pseudo-cell and stay inert."""
    from particlesystemhybridcollisiondetection_tpu.core.state import active_mask
    from particlesystemhybridcollisiondetection_tpu.ops.p2p_sorted import (
        p2p_collide_sorted,
        p2p_collide_window,
    )

    rng = np.random.default_rng(11)
    n = 1400
    pos = rng.uniform(0.0, 6.0, size=(n, 3)).astype(F)
    pos[1340:] = 1e38  # sentinels
    vel = (rng.normal(size=(n, 3)) * 2).astype(F)
    radius = np.full(n, 0.15, dtype=F)
    rest = np.full(n, 0.5, dtype=F)
    s = _state(pos, vel, radius, rest)
    meta = pg.make_meta((0, 0, 0), (6, 6, 6), cell_size=0.4, capacity=16)
    act = active_mask(s)

    ref, _ = p2p_collide_sorted(s, meta, active=act)
    out, _ = p2p_collide_window(s, meta, active=act, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out.collisions), np.asarray(ref.collisions)
    )
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.vel), np.asarray(ref.vel), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out.pos[:, 1340:]).T, pos[1340:])


def test_p2p_per_sublane_windows_cover_density_gradient():
    """One 1024-particle block with a strong density gradient: a dense
    cluster under the first sublanes and a sparse far tail.  A shared
    per-BLOCK window of this size could not span both regions' runs, but
    per-sublane windows (each row of 128 sorted particles gets its own
    window) cover every run with w=512 -- zero overflow, and the kernel
    alone (no fallback work) matches the XLA sorted-segment path."""
    from particlesystemhybridcollisiondetection_tpu.ops.p2p_sorted import (
        p2p_collide_sorted,
        p2p_collide_window,
    )

    rng = np.random.default_rng(12)
    n = 1024
    n_dense = 768
    pos = np.empty((n, 3), dtype=F)
    # dense cluster: 768 particles in one corner cell-cluster (low cids)
    pos[:n_dense] = rng.uniform(0.1, 2.3, size=(n_dense, 3))
    # sparse tail: 256 particles spread over the far corner (high cids)
    pos[n_dense:] = rng.uniform(6.0, 11.9, size=(n - n_dense, 3))
    vel = (rng.normal(size=(n, 3)) * 2).astype(F)
    radius = rng.uniform(0.1, 0.2, size=n).astype(F)
    rest = rng.uniform(0.3, 0.9, size=n).astype(F)
    s = _state(pos.astype(F), vel, radius, rest)
    meta = pg.make_meta((0, 0, 0), (12, 12, 12), cell_size=0.4, capacity=64)

    ref, _ = p2p_collide_sorted(s, meta)
    out, n_over = p2p_collide_window(s, meta, window=512, interpret=True)
    assert int(n_over) == 0  # per-sublane windows cover both regimes
    np.testing.assert_array_equal(
        np.asarray(out.collisions), np.asarray(ref.collisions)
    )
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.vel), np.asarray(ref.vel), rtol=1e-4, atol=1e-5
    )


def test_p2p_episode_runner_matches_step_path():
    """make_p2p_episode_runner (persistent sorted order, kernel interpret)
    vs make_p2p_step (variant='sorted', original order each step) over a
    multi-step episode.  Identical math composed in a different particle
    order -- impulse accumulation order differs, so tolerances are float
    tolerances, but contact counts and trajectories must agree."""
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_p2p_episode_runner,
    )

    rng = np.random.default_rng(13)
    n = 500  # padded to one 1024 block inside the runner
    pos = rng.uniform(0.6, 5.4, size=(n, 3)).astype(F)
    vel = (rng.normal(size=(n, 3)) * 2).astype(F)
    radius = np.full(n, 0.12, dtype=F)
    rest = np.full(n, 0.7, dtype=F)
    s0 = _state(pos, vel, radius, rest)
    cfg = SimConfig(particle_radius=0.12, dt=0.004)

    step = make_p2p_step((0, 0, 0), (6, 6, 6), cfg, variant="sorted")
    ref = s0
    for _ in range(4):
        ref = step(ref)

    run = make_p2p_episode_runner((0, 0, 0), (6, 6, 6), cfg, interpret=True)
    out = run(s0, 4)

    np.testing.assert_array_equal(
        np.asarray(out.collisions), np.asarray(ref.collisions)
    )
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.vel), np.asarray(ref.vel), rtol=1e-3, atol=1e-4
    )
