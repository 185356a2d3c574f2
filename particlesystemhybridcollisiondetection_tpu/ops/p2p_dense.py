"""Gather-free particle-particle collisions: dense cell-table stencil.

The slot-loop path (ops/p2p.py) issues ~27 * capacity gathers per step;
XLA TPU gathers are the single most expensive primitive we measured, so
for dense scenarios (gravity boxes at benchmark scale) this variant
restructures the whole interaction as a *stencil*:

  1. scatter packed particle rows into a dense cell table
     [Cx, Cy, Cz, M, F] (one row-scatter),
  2. for each of the 27 neighbor offsets, *shift* the table (slice + pad,
     no indices) and evaluate all M x M slot pairs per cell as fused
     broadcasting arithmetic,
  3. gather results back to particle order (one row-gather).

Two indexed ops total per step, everything else elementwise/reduction --
the shape XLA and the VPU want.  The cost is proportional to the number
of *cells*, so this wins when the box is reasonably occupied (>= a few
percent); the slot-loop path remains for sparse/huge domains, and both
implement the identical contact model (see ops/p2p.py docstring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from particlesystemhybridcollisiondetection_tpu.core.state import ParticleState
from particlesystemhybridcollisiondetection_tpu.ops import pgrid as pg

# packed row layout: px py pz vx vy vz radius restitution mass
_F = 9


def _shift(table: jnp.ndarray, d: tuple[int, int, int]) -> jnp.ndarray:
    """Shift cell axes by (dx, dy, dz), zero-padding at the borders.

    table: [Cx, Cy, Cz, ...]; returns same shape where result[c] =
    table[c + d] (zeros outside).  Zero rows have mass 0 and radius 0 ->
    they can never produce a contact.
    """
    out = table
    for ax, dd in enumerate(d):
        if dd == 0:
            continue
        pad = [(0, 0)] * out.ndim
        if dd > 0:
            pad[ax] = (0, dd)
            out = jnp.pad(out, pad)[
                tuple(slice(dd, None) if a == ax else slice(None) for a in range(out.ndim))
            ]
        else:
            pad[ax] = (-dd, 0)
            out = jnp.pad(out, pad)[
                tuple(slice(0, dd) if a == ax else slice(None) for a in range(out.ndim))
            ]
    return out


def p2p_collide_dense(
    state: ParticleState,
    meta: pg.PGridMeta,
    *,
    beta: float = 0.5,
    active=None,
) -> tuple[ParticleState, jnp.ndarray]:
    """Dense-stencil p2p pass; same contract as ops.p2p.p2p_collide."""
    pos, velo = state.pos, state.vel
    n = pos.shape[-1]
    m = meta.capacity
    cx, cy, cz = pg.cell_coords(pos, meta)
    cid = pg.linear_cell(cx, cy, cz, meta)
    ids = jnp.arange(n, dtype=jnp.int32)
    live = active if active is not None else jnp.ones((n,), dtype=bool)
    cid_key = jnp.where(live, cid, meta.num_cells)

    # sort -> rank-in-cell (same construction as pgrid.build)
    cid_s, ids_s = jax.lax.sort((cid_key, ids), num_keys=1)
    i = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), cid_s[1:] != cid_s[:-1]])
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, i, 0))
    rank = i - seg_start
    keep = (rank < m) & (cid_s < meta.num_cells)
    slot_of_sorted = jnp.where(keep, cid_s * m + rank, meta.num_cells * m)
    overflow = jnp.sum(((rank >= m) & (cid_s < meta.num_cells)).astype(jnp.int32))

    mass = state.radius**3
    rows = jnp.stack(
        [
            pos[0], pos[1], pos[2],
            velo[0], velo[1], velo[2],
            state.radius,
            state.restitution,
            mass,
        ],
        axis=-1,
    )  # [N, F]
    rows_sorted = rows[ids_s]

    table = jnp.zeros((meta.num_cells * m + 1, _F), dtype=rows.dtype)
    table = table.at[slot_of_sorted].set(rows_sorted, mode="drop")
    table = table[:-1].reshape(meta.dims[0], meta.dims[1], meta.dims[2], m, _F)

    p_t = table[..., 0:3]  # [Cx, Cy, Cz, M, 3]
    v_t = table[..., 3:6]
    r_t = table[..., 6]
    e_t = table[..., 7]
    m_t = table[..., 8]
    occ = m_t > 0.0

    dv = jnp.zeros_like(v_t)
    dp = jnp.zeros_like(p_t)
    ncon = jnp.zeros(r_t.shape, dtype=jnp.int32)

    for off in pg.NEIGHBOR_OFFSETS:
        nb = _shift(table, off)  # [Cx, Cy, Cz, M, F]
        same = off == (0, 0, 0)

        # loop the neighbor slot axis: [*, M, 3]-shaped bodies only (a
        # full M x M broadcast materializes multi-GB intermediates at 1M+
        # particles -- observed as an XLA OOM)
        def slot_body(j, acc, nb=nb, same=same):
            dv, dp, ncon = acc
            row = jax.lax.dynamic_index_in_dim(nb, j, axis=-2, keepdims=False)
            pj = row[..., None, 0:3]  # [*, 1, 3]
            vj = row[..., None, 3:6]
            rj = row[..., None, 6]
            ej = row[..., None, 7]
            mj = row[..., None, 8]
            occ_j = mj > 0.0

            d = p_t - pj  # [*, M, 3]
            dist2 = jnp.sum(d * d, axis=-1)
            rsum = r_t + rj
            pair_ok = occ & occ_j
            if same:
                slot_ids = jax.lax.broadcasted_iota(jnp.int32, r_t.shape, r_t.ndim - 1)
                pair_ok = pair_ok & (slot_ids != j)
            touching = pair_ok & (dist2 < rsum * rsum) & (dist2 > 0.0)

            dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
            nrm = d / dist[..., None]
            v_rel = v_t - vj
            vn = jnp.sum(v_rel * nrm, axis=-1)
            approaching = touching & (vn < 0.0)

            e = 0.5 * (e_t + ej)
            w = mj / (m_t + mj + 1e-30)
            imp = jnp.where(approaching, -(1.0 + e) * vn * w, 0.0)
            dv = dv + nrm * imp[..., None]
            overlap = jnp.where(touching, rsum - dist, 0.0)
            dp = dp + nrm * (beta * overlap * w)[..., None]
            return dv, dp, ncon + touching.astype(jnp.int32)

        dv, dp, ncon = jax.lax.fori_loop(0, m, slot_body, (dv, dp, ncon))

    # map per-slot results back to particle order
    res = jnp.concatenate(
        [
            dv.reshape(-1, 3),
            dp.reshape(-1, 3),
            ncon.reshape(-1, 1).astype(rows.dtype),
        ],
        axis=-1,
    )
    res = jnp.concatenate([res, jnp.zeros((1, 7), dtype=res.dtype)], axis=0)
    back = res[slot_of_sorted]  # [N, 7] in sorted order
    # unsort: scatter rows to original ids
    unsorted = jnp.zeros((n, 7), dtype=res.dtype).at[ids_s].set(back)

    dv_p = unsorted[:, 0:3].T
    dp_p = unsorted[:, 3:6].T
    nc_p = unsorted[:, 6].astype(jnp.int32)

    return (
        state._replace(
            pos=pos + dp_p,
            vel=velo + dv_p,
            collisions=state.collisions + nc_p,
        ),
        overflow,
    )
