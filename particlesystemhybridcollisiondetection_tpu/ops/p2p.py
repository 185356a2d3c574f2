"""Sphere-sphere particle collisions: impulse + positional correction.

Capability extension over the reference (whose particles never interact
with each other); required by the driver benchmark configs ("sphere-sphere
narrow-phase impulse resolution ... heterogeneous radii/restitution",
BASELINE.md configs 1/2/4/5).

Model (documented here because there is no reference analog to cite):
  * mass m = r^3 (uniform density).
  * contact iff dist < r_i + r_j.
  * normal impulse with restitution only when approaching
    (dot(v_rel, n) < 0): dv = -(1 + e) * (v_rel . n) * m_j / (m_i + m_j),
    applied along n to particle i (j gets the mirror image when it
    processes i -- every pair is visited from both sides, so momentum is
    conserved up to float roundoff).
  * Baumgarte-style positional de-penetration: each particle moves
    beta * overlap * m_other / (m_i + m_j) along the normal.
  * pair restitution e = 0.5 * (e_i + e_j).

Everything is a streaming reduction over the 27-cell x capacity
neighborhood (see ops/pgrid.py) with [N]-shaped fused bodies.
"""

from __future__ import annotations

import jax.numpy as jnp

from particlesystemhybridcollisiondetection_tpu.core import vec
from particlesystemhybridcollisiondetection_tpu.core.state import ParticleState
from particlesystemhybridcollisiondetection_tpu.ops import pgrid as pg


def p2p_collide(
    state: ParticleState,
    meta: pg.PGridMeta,
    *,
    beta: float = 0.5,
    active=None,
) -> tuple[ParticleState, jnp.ndarray]:
    """One particle-particle collision pass.

    Returns (new_state, overflow_count).  ``collisions`` counts contacts
    per particle (each pair counted once on each side, like the
    reference's per-particle counters).
    """
    import jax

    pos, velo = state.pos, state.vel
    n = pos.shape[-1]
    ids = jnp.arange(n, dtype=jnp.int32)
    grid = pg.build(pos, meta, active=active)
    bases, in_grid = pg.neighbor_cells(grid, meta, pos)  # [27, N]

    mass = state.radius**3
    m_cap = meta.capacity

    def body(k, acc):
        dv, dp, ncontacts = acc
        cell_k = k // m_cap
        slot = k % m_cap
        base = jnp.take(bases, cell_k, axis=0)
        cell_ok = jnp.take(in_grid, cell_k, axis=0)
        j_ids = grid.table[base + slot]
        valid = cell_ok & (j_ids >= 0)

        j = jnp.clip(j_ids, 0, n - 1)
        pj = pos[:, j]
        vj = velo[:, j]
        rj = state.radius[j]
        ej = state.restitution[j]
        mj = mass[j]

        d = pos - pj
        dist2 = vec.norm2(d)
        rsum = state.radius + rj
        touching = valid & (j_ids != ids) & (dist2 < rsum * rsum) & (dist2 > 0.0)

        dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
        nrm = d / dist[None]  # from j to i
        v_rel = velo - vj
        vn = vec.dot(v_rel, nrm)
        approaching = touching & (vn < 0.0)

        e = 0.5 * (state.restitution + ej)
        w = mj / (mass + mj)
        imp = jnp.where(approaching, -(1.0 + e) * vn * w, 0.0)
        dv = dv + nrm * imp[None]

        overlap = jnp.where(touching, rsum - dist, 0.0)
        dp = dp + nrm * (beta * overlap * w)[None]
        return dv, dp, ncontacts + touching.astype(jnp.int32)

    dv, dp, ncontacts = jax.lax.fori_loop(
        0,
        27 * m_cap,
        body,
        (
            jnp.zeros_like(velo),
            jnp.zeros_like(pos),
            jnp.zeros((n,), dtype=jnp.int32),
        ),
    )

    if active is not None:
        keep = active
        dv = vec.where(keep, dv, jnp.zeros_like(dv))
        dp = vec.where(keep, dp, jnp.zeros_like(dp))
        ncontacts = jnp.where(keep, ncontacts, 0)

    return (
        state._replace(
            pos=pos + dp,
            vel=velo + dv,
            collisions=state.collisions + ncontacts,
        ),
        grid.overflow,
    )


def p2p_collide_allpairs(
    state: ParticleState,
    *,
    beta: float = 0.5,
    active=None,
) -> ParticleState:
    """Direct O(n^2) all-pairs evaluation of the same contact model
    (driver benchmark config 1's reference path; also the oracle for the
    grid variants).  Dense [N, N] broadcasting -- use at <= ~10k
    particles."""
    pos, velo = state.pos, state.vel
    n = pos.shape[-1]
    mass = state.radius**3
    live = active if active is not None else jnp.ones((n,), dtype=bool)

    d = pos[:, :, None] - pos[:, None, :]  # [3, N, N] (i - j)
    dist2 = vec.norm2(d)
    rsum = state.radius[:, None] + state.radius[None, :]
    eye = jnp.eye(n, dtype=bool)
    touching = (
        live[:, None] & live[None, :] & ~eye & (dist2 < rsum * rsum) & (dist2 > 0.0)
    )
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
    nrm = d / dist[None]
    v_rel = velo[:, :, None] - velo[:, None, :]
    vn = vec.dot(v_rel, nrm)
    approaching = touching & (vn < 0.0)
    e = 0.5 * (state.restitution[:, None] + state.restitution[None, :])
    w = mass[None, :] / (mass[:, None] + mass[None, :])
    imp = jnp.where(approaching, -(1.0 + e) * vn * w, 0.0)
    dv = jnp.sum(nrm * imp[None], axis=-1)
    overlap = jnp.where(touching, rsum - dist, 0.0)
    dp = jnp.sum(nrm * (beta * overlap * w)[None], axis=-1)
    ncontacts = touching.sum(axis=-1).astype(jnp.int32)
    return state._replace(
        pos=pos + dp,
        vel=velo + dv,
        collisions=state.collisions + ncontacts,
    )


def box_walls_collide(
    state: ParticleState,
    lo,
    hi,
    gravity: jnp.ndarray,
    dt: float,
) -> ParticleState:
    """Analytic AABB container walls (gravity-box configs 1/2).

    Reflect-with-restitution against the six planes, with the reference's
    response style: post-bounce velocity pre-compensates the integrator
    (``- g*dt``), position clamped to the wall surface.
    """
    lo = jnp.asarray(lo, dtype=state.pos.dtype)
    hi = jnp.asarray(hi, dtype=state.pos.dtype)
    r = state.radius
    e = state.restitution

    pos, velo = state.pos, state.vel
    hit_any = jnp.zeros(pos.shape[-1], dtype=bool)
    new_pos = pos
    new_vel = velo
    for axis in range(3):
        low = lo[axis] + r
        high = hi[axis] - r
        p = new_pos[axis]
        v = new_vel[axis]
        hit_lo = (p < low) & (v < 0.0)
        hit_hi = (p > high) & (v > 0.0)
        p = jnp.where(hit_lo, low, jnp.where(hit_hi, high, p))
        v = jnp.where(hit_lo | hit_hi, -v * e, v)
        new_pos = new_pos.at[axis].set(p)
        new_vel = new_vel.at[axis].set(v)
        hit_any = hit_any | hit_lo | hit_hi
    # integrator pre-compensation on bounced particles (matches the
    # spatial response convention, SpatialStructure...compute:344)
    new_vel = jnp.where(
        hit_any[None], new_vel - gravity[:, None] * dt, new_vel
    )
    return state._replace(
        pos=new_pos,
        vel=new_vel,
        collisions=state.collisions + hit_any.astype(jnp.int32),
    )
