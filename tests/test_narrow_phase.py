"""Narrow-phase kernels vs the scalar HLSL-transcription oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.smoke

from particlesystemhybridcollisiondetection_tpu.core.state import ParticleState
from particlesystemhybridcollisiondetection_tpu.core.step import spatial_collide
from particlesystemhybridcollisiondetection_tpu.ops import narrow_phase as nph

import reference_impl as ref

F = np.float32


def _call_single(fn, *args):
    """Run a [3, N, K]-shaped kernel helper on one scalar case."""
    planar = [jnp.asarray(a, dtype=jnp.float32).reshape(3, 1, 1) for a in args[:2]]
    rest = [
        jnp.asarray(a, dtype=jnp.float32).reshape(3, 1, 1)
        if np.ndim(a) == 1
        else jnp.float32(a)
        for a in args[2:]
    ]
    out = fn(*planar, *rest)
    return [np.asarray(o).reshape(-1) for o in out]


def test_ray_triangle_basic():
    ro = np.array([0.0, 1.0, 0.0])
    rd = np.array([0.0, -1.0, 0.0])
    v0, v1, v2 = (
        np.array([-1.0, 0.0, -1.0]),
        np.array([1.0, 0.0, -1.0]),
        np.array([0.0, 0.0, 1.0]),
    )
    hit, t = _call_single(nph.ray_triangle, ro, rd, v0, v1, v2)
    assert hit[0]
    assert np.isclose(t[0], 1.0)

    # miss: shift ray off the triangle
    hit, t = _call_single(
        nph.ray_triangle, ro + np.array([5.0, 0, 0]), rd, v0, v1, v2
    )
    assert not hit[0]


def _batch3(x):
    """[M, 3] -> [3, M, 1] planar."""
    return jnp.asarray(np.asarray(x, dtype=F).T[:, :, None])


def test_ray_sphere_matches_oracle():
    rng = np.random.default_rng(0)
    m = 200
    ro = rng.normal(size=(m, 3)).astype(F)
    rd = rng.normal(size=(m, 3)).astype(F)
    rd = (rd / np.linalg.norm(rd, axis=-1, keepdims=True)).astype(F)
    c = rng.normal(size=(m, 3)).astype(F) * 2
    r = (np.abs(rng.normal(size=m)) + 0.1).astype(F)
    hit, t = nph.ray_sphere(_batch3(ro), _batch3(rd), _batch3(c), jnp.asarray(r)[:, None])
    hit, t = np.asarray(hit)[:, 0], np.asarray(t)[:, 0]
    n_hits = 0
    for i in range(m):
        ref_hit, ref_pt = ref.ray_sphere(ro[i], rd[i], c[i], r[i])
        assert bool(hit[i]) == ref_hit, i
        if ref_hit:
            n_hits += 1
            np.testing.assert_allclose(ro[i] + t[i] * rd[i], ref_pt, rtol=1e-5, atol=1e-5)
    assert n_hits > 10


def test_ray_cylinder_matches_oracle():
    rng = np.random.default_rng(1)
    m = 300
    ro = rng.normal(size=(m, 3)).astype(F) * 2
    rd = rng.normal(size=(m, 3)).astype(F)
    rd = (rd / np.linalg.norm(rd, axis=-1, keepdims=True)).astype(F)
    a = rng.normal(size=(m, 3)).astype(F)
    b = (a + rng.normal(size=(m, 3))).astype(F)
    r = (np.abs(rng.normal(size=m)) * 0.5 + 0.1).astype(F)
    hit, t = nph.ray_cylinder(
        _batch3(ro), _batch3(rd), _batch3(a), _batch3(b), jnp.asarray(r)[:, None]
    )
    hit, t = np.asarray(hit)[:, 0], np.asarray(t)[:, 0]
    n_hits = 0
    for i in range(m):
        ref_hit, ref_pt = ref.ray_cylinder(ro[i], rd[i], a[i], b[i], r[i])
        assert bool(hit[i]) == ref_hit, i
        if ref_hit:
            n_hits += 1
            np.testing.assert_allclose(ro[i] + t[i] * rd[i], ref_pt, rtol=1e-4, atol=1e-4)
    assert n_hits > 10  # sanity: the sample actually exercises hits


def test_particle_vs_triangles_matches_oracle():
    """Randomized swept-sphere vs triangle: hit flags and winning distance."""
    rng = np.random.default_rng(2)
    n, k = 16, 12
    for trial in range(8):
        pos = rng.normal(size=(n, 3)).astype(F) * 3
        vel = rng.normal(size=(n, 3)).astype(F) * 5
        tris = rng.normal(size=(k, 3, 3)).astype(F) * 2
        radius, dt = F(0.4), F(0.05)

        # oracle per particle/triangle
        ref_hits = np.zeros((n, k), dtype=bool)
        ref_pts = np.zeros((n, k, 3), dtype=F)
        for i in range(n):
            rd = ref.normalize(vel[i])
            p_end = (pos[i] + vel[i] * dt).astype(F)
            for j in range(k):
                h, pt = ref.particle_triangle(pos[i], p_end, rd, tris[j], radius)
                ref_hits[i, j] = h
                ref_pts[i, j] = pt

        p = jnp.asarray(pos.T)
        v = jnp.asarray(vel.T)
        speed2 = jnp.sum(v * v, axis=0)
        dirn = v / jnp.sqrt(speed2)[None]
        seg2 = speed2 * dt * dt
        tv = jnp.asarray(np.broadcast_to(tris.transpose(2, 0, 1)[:, None], (3, n, k, 3)))
        hits = nph.particle_vs_triangles(
            p, dirn, seg2, tv[..., 0], tv[..., 1], tv[..., 2],
            jnp.full((n,), radius),
        )
        got_hit = np.asarray(hits.hit)
        assert (got_hit == ref_hits).all(), f"trial {trial}: hit flags disagree"

        # winning collision point distance agrees where hit
        got_t = np.asarray(hits.t)
        for i in range(n):
            for j in range(k):
                if ref_hits[i, j]:
                    d_ref = np.linalg.norm(ref_pts[i, j] - pos[i])
                    assert np.isclose(abs(got_t[i, j]), d_ref, rtol=1e-4, atol=1e-4)


def _mini_state(pos, vel, radius, bounce):
    n = pos.shape[0]
    return ParticleState(
        pos=jnp.asarray(pos.T, dtype=jnp.float32),
        vel=jnp.asarray(vel.T, dtype=jnp.float32),
        collisions=jnp.zeros((n,), dtype=jnp.int32),
        radius=jnp.full((n,), radius, dtype=jnp.float32),
        restitution=jnp.full((n,), bounce, dtype=jnp.float32),
    )


def test_spatial_collide_matches_oracle_one_step():
    rng = np.random.default_rng(3)
    n, k = 24, 10
    gravity = np.array([0.0, -9.81, 0.0], dtype=F)
    for trial in range(6):
        pos = rng.normal(size=(n, 3)).astype(F) * 2
        vel = rng.normal(size=(n, 3)).astype(F) * 8
        vel[0] = 0  # exercise the vel==0 guard
        tris = rng.normal(size=(k, 3, 3)).astype(F) * 3
        radius, dt, bounce = F(0.5), F(0.05), F(0.25)

        ref_pos, ref_vel, ref_nc = ref.spatial_collide(
            pos, vel, radius, bounce, gravity, dt, tris
        )

        state = _mini_state(pos, vel, radius, bounce)
        v0 = jnp.asarray(tris[:, 0].T)
        v1 = jnp.asarray(tris[:, 1].T)
        v2 = jnp.asarray(tris[:, 2].T)
        out = spatial_collide(
            state, v0, v1, v2, jnp.asarray(gravity), float(dt), 0.0015
        )
        got_nc = np.asarray(out.collisions)
        np.testing.assert_array_equal(got_nc, ref_nc, err_msg=f"trial {trial}")
        np.testing.assert_allclose(
            np.asarray(out.pos).T, ref_pos, rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.vel).T, ref_vel, rtol=2e-4, atol=2e-4
        )
