"""Sorted-segment particle-particle collisions: the TPU performance path.

The slot-table path (ops/p2p.py) walks 27 cells x capacity slots with one
[N] HBM gather per slot -- measured gather-bound at ~1.1e5 particle-steps/s
at 50k (BASELINE.md config 2).  This module replaces it with the same
sort-based design that took the static-geometry narrow phase to the north
star (ops/pallas/window_kernel.py + core/step.py::make_spatial_step_sorted):

  1. sort particles by linear cell id (z fastest; ``lax.sort`` ~1 ms at 1M),
  2. CSR offsets over cells via a histogram scatter-add + cumsum,
  3. the 27-cell neighborhood = NINE contiguous runs of the sorted order:
     for each (dx, dy) in {-1,0,1}^2, the three z-neighbors (dz in -1..1)
     are consecutive linear cells, so the candidate set is one
     [start, end) interval of sorted particle indices,
  4. per run: a dynamic-bound ``while_loop`` over k < max(end - start),
     each iteration one planar [8, N] axis-1 gather (the fast vectorized
     XLA gather path; see WindowTables.cells2 layout notes) + masked dense
     pair math,
  5. accumulate impulses/pushes in sorted order, un-sort once via the
     inverse-permutation gather.

Unlike the slot table this is EXACT for any occupancy: candidate runs are
CSR segments, not capacity-clipped slots, so no contact can be dropped and
momentum stays two-sided (the round-1 advisor's saturated-cell concern
disappears structurally).

Correctness of the run construction (documented because it is the one
subtle part):

  * Clamped/boundary z-runs may include *wrapped* cells from an adjacent
    y-row; those extras are rejected by the exact distance test (a pair
    can only touch if dist < r_i + r_j <= 2*max_r <= cell_size, which
    forces per-axis cell adjacency), so runs are a superset filter --
    never wrong, only wasted lanes.
  * Pair double-counting is impossible iff simultaneously-valid runs never
    overlap.  Runs of distinct valid (dx, dy) offsets target distinct cell
    rows, whose linear offsets differ by >= dims[2]; with ``dims[2] >= 3``
    (asserted) the 3-cell intervals are disjoint.  Out-of-range rows
    (cx+dx or cy+dy outside the grid) are masked per particle.
  * Symmetry (momentum conservation): if i and j touch, their cells are
    per-axis adjacent, so j is in one of i's valid runs and i is in one of
    j's -- both sides apply mirrored impulses, exactly like the slot path.

The contact model is identical to ops/p2p.py (impulse + Baumgarte
positional correction; capability extension over the reference, whose
particles never interact -- see that module's docstring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from particlesystemhybridcollisiondetection_tpu.core.state import ParticleState
from particlesystemhybridcollisiondetection_tpu.ops import pgrid as pg


def check_meta(meta: pg.PGridMeta) -> None:
    """Static requirements of the run construction."""
    if meta.dims[2] < 3:
        raise ValueError(
            f"sorted p2p needs >= 3 cells on the fastest (z) axis, got "
            f"dims={meta.dims}; use the slot path or a finer cell_size"
        )


def _pad_columns(k: int) -> jnp.ndarray:
    """[8, k] padding rows: sentinel positions but SANE radius/velocity.
    An all-1e38 column poisons masked lanes that gather it: radius 1e38
    -> mass inf -> weight inf/inf = NaN -> 0 * NaN = NaN leaks through the
    ``jnp.where`` masks.  The 1e38 positions alone guarantee the distance
    test rejects every pad."""
    return jnp.concatenate(
        [
            jnp.full((3, k), 1.0e38, dtype=jnp.float32),
            jnp.zeros((3, k), dtype=jnp.float32),
            jnp.ones((1, k), dtype=jnp.float32),
            jnp.zeros((1, k), dtype=jnp.float32),
        ],
        axis=0,
    )


def _group_offsets(meta: pg.PGridMeta):
    """The nine (dx, dy) linear-cell offsets of the 3-cell z-runs."""
    dy, dz = meta.dims[1], meta.dims[2]
    return [(ox, oy, (ox * dy + oy) * dz) for ox in (-1, 0, 1) for oy in (-1, 0, 1)]


def _run_table(offsets: jnp.ndarray, meta: pg.PGridMeta) -> jnp.ndarray:
    """Stacked [18, C] run-bounds table: row g = start of group g's 3-cell
    run for every cell, row 9+g = its end.  Built from SLICES of the CSR
    offsets (no gathers), so the per-particle bounds of all nine runs cost
    ONE million-index gather downstream (~5 ns/index on v5e, amortized
    18-ways -- gather cost is per index, not per row; measured 2026-08).
    """
    num_cells = meta.num_cells
    pad = meta.dims[1] * meta.dims[2] + meta.dims[2] + 2
    o_act = offsets[: num_cells + 1]  # offsets[C] = active count
    opad = jnp.concatenate(
        [
            jnp.zeros((pad,), jnp.int32),
            o_act,
            jnp.broadcast_to(o_act[-1:], (pad,)),
        ]
    )
    rows = []
    for _, _, off in _group_offsets(meta):
        rows.append(jax.lax.dynamic_slice(opad, (pad + off - 1,), (num_cells,)))
    for _, _, off in _group_offsets(meta):
        rows.append(jax.lax.dynamic_slice(opad, (pad + off + 2,), (num_cells,)))
    return jnp.stack(rows)  # [18, C]


def _run_bounds(cid_s, run_tab, meta: pg.PGridMeta):
    """Per-particle (start, count) of each of the nine runs, with
    out-of-grid rows and parked particles masked to count 0.
    Returns (starts i32[9, N], cnt i32[9, N])."""
    num_cells = meta.num_cells
    dy, dz = meta.dims[1], meta.dims[2]
    live = cid_s < num_cells
    cs = jnp.minimum(cid_s, num_cells - 1)
    bounds = run_tab[:, cs]  # [18, N]: the one stacked planar gather
    starts = bounds[:9]
    ends = bounds[9:]
    cx_s = cs // (dy * dz)
    cy_s = (cs // dz) % dy
    ok = []
    for ox, oy, _ in _group_offsets(meta):
        ok.append(
            live
            & (cx_s + ox >= 0)
            & (cx_s + ox < meta.dims[0])
            & (cy_s + oy >= 0)
            & (cy_s + oy < dy)
        )
    cnt = jnp.where(jnp.stack(ok), ends - starts, 0)
    return starts, cnt


def p2p_collide_sorted(
    state: ParticleState,
    meta: pg.PGridMeta,
    *,
    beta: float = 0.5,
    active=None,
) -> tuple[ParticleState, jnp.ndarray]:
    """One exact particle-particle collision pass (sorted-segment).

    Drop-in for ops.p2p.p2p_collide: returns (new_state, overflow) with
    overflow == 0 by construction (CSR runs cannot saturate).
    """
    check_meta(meta)
    pos, velo = state.pos, state.vel
    n = pos.shape[-1]
    num_cells = meta.num_cells
    dy, dz = meta.dims[1], meta.dims[2]

    cx, cy, cz = pg.cell_coords(pos, meta)
    cid = pg.linear_cell(cx, cy, cz, meta)
    if active is not None:
        # park inactive (sentinel) particles past the last cell: sorted to
        # the end, excluded from every run by the offsets[C] clamp below
        cid_key = jnp.where(active, cid, num_cells)
    else:
        cid_key = cid

    ids = jnp.arange(n, dtype=jnp.int32)
    cid_s, perm = jax.lax.sort((cid_key, ids), num_keys=1)

    rows = jnp.concatenate(
        [pos, velo, state.radius[None], state.restitution[None]], axis=0
    )  # [8, N] planar: the k-loop gathers whole columns on the fast path
    rows_s = rows[:, perm]
    pos_s = rows_s[0:3]
    vel_s = rows_s[3:6]
    radius_s = rows_s[6]
    restit_s = rows_s[7]

    # CSR offsets over cells (+ the parked pseudo-cell), then a planar
    # [2, C+1] (start, end-of-run) table: row 1 is offsets shifted by the
    # 3-cell run length so one axis-1 gather yields both run bounds
    counts = jnp.zeros((num_cells + 1,), jnp.int32).at[cid_key].add(1)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )  # i32[C+2]; offsets[C] = number of active particles
    o_act = offsets[: num_cells + 1]  # [C+1]
    o_end = jnp.concatenate(
        [offsets[3 : num_cells + 1], jnp.broadcast_to(offsets[num_cells], (3,))]
    )
    run_tab = jnp.stack([o_act, o_end])  # [2, C+1]

    # per-particle sorted-order cell coords, decoded (cheaper than three
    # extra permute gathers); parked rows decode out-of-range and are
    # masked by live_s
    live_s = cid_s < num_cells
    cs = jnp.minimum(cid_s, num_cells - 1)
    cx_s = cs // (dy * dz)
    cy_s = (cs // dz) % dy
    i_sorted = jnp.arange(n, dtype=jnp.int32)

    mass_s = radius_s**3

    def run_reduce(start, count, carry):
        dv, dp, ncon = carry
        k_max = jnp.max(count)

        def body(c):
            k, dv, dp, ncon = c
            idx = jnp.clip(start + k, 0, n - 1)
            cand = rows_s[:, idx]  # [8, N] fast planar gather
            pj = cand[0:3]
            vj = cand[3:6]
            rj = cand[6]
            ej = cand[7]
            valid = (k < count) & (idx != i_sorted)

            d = pos_s - pj
            dist2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            rsum = radius_s + rj
            touching = valid & (dist2 < rsum * rsum) & (dist2 > 0.0)

            dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
            nrm = d / dist[None]  # from j to i
            v_rel = vel_s - vj
            vn = v_rel[0] * nrm[0] + v_rel[1] * nrm[1] + v_rel[2] * nrm[2]
            approaching = touching & (vn < 0.0)

            mj = rj**3
            e = 0.5 * (restit_s + ej)
            w = mj / (mass_s + mj)
            imp = jnp.where(approaching, -(1.0 + e) * vn * w, 0.0)
            overlap = jnp.where(touching, rsum - dist, 0.0)
            return (
                k + 1,
                dv + nrm * imp[None],
                dp + nrm * (beta * overlap * w)[None],
                ncon + touching.astype(jnp.int32),
            )

        _, dv, dp, ncon = jax.lax.while_loop(
            lambda c: c[0] < k_max, body, (jnp.int32(0), dv, dp, ncon)
        )
        return dv, dp, ncon

    carry = (
        jnp.zeros_like(vel_s),
        jnp.zeros_like(pos_s),
        jnp.zeros((n,), dtype=jnp.int32),
    )
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            off = (ox * dy + oy) * dz
            row_ok = (
                live_s
                & (cx_s + ox >= 0)
                & (cx_s + ox < meta.dims[0])
                & (cy_s + oy >= 0)
                & (cy_s + oy < dy)
            )
            q = jnp.clip(cs + off - 1, 0, num_cells)
            bounds = run_tab[:, q]  # [2, N]
            start = bounds[0]
            count = jnp.where(row_ok, bounds[1] - bounds[0], 0)
            carry = run_reduce(start, count, carry)

    dv, dp, ncon = carry
    out_rows = jnp.concatenate(
        [pos_s + dp, vel_s + dv, ncon[None].astype(jnp.float32)], axis=0
    )  # [7, N]
    # unsort via inverse-permutation gather (scatter measured 43 ms at 1M
    # in round 1; a second sort + gather is ~7 ms)
    _, inv_perm = jax.lax.sort((perm, i_sorted), num_keys=1)
    unsorted = out_rows[:, inv_perm]
    return (
        state._replace(
            pos=unsorted[0:3],
            vel=unsorted[3:6],
            collisions=state.collisions + unsorted[6].astype(jnp.int32),
        ),
        jnp.zeros((), dtype=jnp.int32),
    )


def p2p_window_phase1(
    state: ParticleState,
    meta: pg.PGridMeta,
    *,
    beta: float = 0.5,
    active=None,
    window: int = 512,
    interpret: bool = False,
):
    """Glue + Pallas kernel: sort/CSR/window plan, run the 9-run
    per-sublane-window kernel.  Returns the parts phase 2 consumes:
    (pos_k, vel_k, ncon_k, rows_s, starts, cnt, overflow, perm), all in
    sorted order / padded to the kernel block multiple.

    Window granularity is one row of 128 sorted particles (the kernel
    sublane): the in-register gather cascade is linear in the window
    size, and a per-sublane window covers ~8x less run span than the
    per-block window round 2 started with, so ``window`` drops from 2048
    to 512 at identical DMA traffic (see the kernel docstring).

    Phases 1 and 2 are separate so callers can jit them as TWO programs:
    the monolithic [kernel + chunked fallback + response] program
    nondeterministically crashed the TPU worker at 1M particles (~80% of
    executions, 2026-08, v5e via axon), while the same computation split
    at this seam ran indefinitely.  ``p2p_collide_window`` composes both
    for single-program contexts (tests, interpret mode).
    """
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.p2p_window_kernel import (
        BLOCK,
        p2p_window_collide_sorted,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        LANE,
        SUB,
    )

    check_meta(meta)
    n = state.pos.shape[-1]
    n_k = ((n + BLOCK - 1) // BLOCK) * BLOCK

    pos, velo = state.pos, state.vel
    cx, cy, cz = pg.cell_coords(pos, meta)
    cid = pg.linear_cell(cx, cy, cz, meta)
    if active is not None:
        cid_key = jnp.where(active, cid, meta.num_cells)
    else:
        cid_key = cid
    rows = jnp.concatenate(
        [pos, velo, state.radius[None], state.restitution[None]], axis=0
    )  # [8, N]
    if n_k > n:
        cid_key = jnp.concatenate(
            [cid_key, jnp.full((n_k - n,), meta.num_cells, dtype=jnp.int32)]
        )
        rows = jnp.concatenate([rows, _pad_columns(n_k - n)], axis=1)

    return _phase1_core(
        rows, cid_key, meta, beta=beta, window=window, interpret=interpret
    )


def _phase1_core(
    rows,  # f32[8, n_k] (n_k a BLOCK multiple; sentinel columns allowed)
    cid_key,  # i32[n_k]: linear cell id, parked particles = num_cells
    meta: pg.PGridMeta,
    *,
    beta: float,
    window: int,
    interpret: bool,
):
    """Sort + CSR + per-sublane window plan + kernel, rows-level (shared
    by the state-based phase 1 and the persistent-order episode runner)."""
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.p2p_window_kernel import (
        BLOCK,
        p2p_window_collide_sorted,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        LANE,
        SUB,
    )

    n_k = rows.shape[-1]
    assert n_k % BLOCK == 0, n_k
    nb = n_k // BLOCK
    w = window
    num_cells = meta.num_cells

    ids = jnp.arange(n_k, dtype=jnp.int32)
    cid_s, perm = jax.lax.sort((cid_key, ids), num_keys=1)
    rows_s = rows[:, perm]

    counts = jnp.zeros((num_cells + 1,), jnp.int32).at[cid_key].add(1)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )  # i32[C+2]; offsets[C] = number of active particles
    run_tab = _run_table(offsets, meta)
    starts, cnt = _run_bounds(cid_s, run_tab, meta)  # [9, n_k] each

    # per-SUBLANE window geometry: one window per row of 128 sorted
    # particles per group (runs with cnt == 0 do not constrain it)
    big = jnp.int32(1 << 30)
    sb = jnp.where(cnt > 0, starts, big).reshape(9, nb * SUB, LANE)
    ws = jnp.min(sb, axis=2)  # [9, NB*8]
    ws = jnp.where(ws == big, 0, ws)
    ws = (ws // LANE) * LANE  # lane-aligned DMA starts
    ws = jnp.clip(ws, 0, n_k)  # rows_pad has n_k + w columns
    k_cap = jnp.max(cnt.reshape(9, nb, BLOCK), axis=2)  # [9, NB]
    rel = starts - jnp.repeat(ws, LANE, axis=1)  # [9, n_k]
    overflow = jnp.any((cnt > 0) & ((rel < 0) | (rel + cnt > w)), axis=0)
    rel = jnp.clip(rel, 0, w - 1)

    rows_pad = jnp.concatenate([rows_s, _pad_columns(w)], axis=1)
    pos_s, vel_s = rows_s[0:3], rows_s[3:6]
    radius_s, restit_s = rows_s[6], rows_s[7]

    pos_k, vel_k, ncon_k = p2p_window_collide_sorted(
        pos_s, vel_s, radius_s, restit_s, rows_pad, rel, cnt,
        ws.reshape(9, nb, SUB).transpose(1, 0, 2), k_cap.T,
        w=w, beta=beta, interpret=interpret,
    )
    return pos_k, vel_k, ncon_k, rows_s, starts, cnt, overflow, perm


def p2p_window_phase2(
    state: ParticleState,
    parts,
    *,
    beta: float = 0.5,
    fallback_capacity: int = 8192,
) -> tuple[ParticleState, jnp.ndarray]:
    """Chunked exact overflow redo + unsort back to caller order (see
    p2p_window_phase1 for the split rationale)."""
    pos_k, vel_k, ncon_k, rows_s, starts, cnt, overflow, perm = parts
    n = state.pos.shape[-1]
    n_k = rows_s.shape[-1]

    pos_k, vel_k, ncon_k, n_over = _p2p_chunked_fallback(
        (pos_k, vel_k, ncon_k),
        rows_s, starts, cnt, overflow, beta, min(fallback_capacity, n_k),
    )

    out_rows = jnp.concatenate(
        [pos_k, vel_k, ncon_k[None].astype(jnp.float32)], axis=0
    )  # [7, n_k]
    _, inv_perm = jax.lax.sort(
        (perm, jnp.arange(n_k, dtype=jnp.int32)), num_keys=1
    )
    unsorted = out_rows[:, inv_perm][:, :n]
    return (
        state._replace(
            pos=unsorted[0:3],
            vel=unsorted[3:6],
            collisions=state.collisions + unsorted[6].astype(jnp.int32),
        ),
        n_over,
    )


def p2p_collide_window(
    state: ParticleState,
    meta: pg.PGridMeta,
    *,
    beta: float = 0.5,
    active=None,
    window: int = 512,
    fallback_capacity: int = 8192,
    interpret: bool = False,
) -> tuple[ParticleState, jnp.ndarray]:
    """Exact particle-particle collision pass via the 9-run block-window
    Pallas kernel (ops/pallas/p2p_window_kernel.py) -- the TPU fast path.

    Drop-in for p2p_collide_sorted; returns (new_state, window_overflow)
    where window_overflow counts particles redone exactly by the chunked
    fallback (results are exact for ANY overflow count, mirroring
    core/step._chunked_fallback).

    NOTE: inside ONE jitted program at large N, prefer jitting
    p2p_window_phase1 / p2p_window_phase2 as separate programs (see the
    phase-1 docstring; make_p2p_step does this).
    """
    parts = p2p_window_phase1(
        state, meta, beta=beta, active=active, window=window,
        interpret=interpret,
    )
    return p2p_window_phase2(
        state, parts, beta=beta, fallback_capacity=fallback_capacity
    )


def _p2p_chunked_fallback(
    kernel_out, rows_s, starts, cnt, overflow, beta: float, m_cap: int
):
    """Exact redo for window-overflow particles, in m_cap-sized chunks.

    Same structure as core/step._chunked_fallback: a while_loop walks the
    compacted overflow list; each chunk recomputes its particles' impulses
    from the FULL run bounds (no window clipping) with small-index gathers.
    Zero iterations -- and no argsort -- when nothing overflows.
    """
    pos_k, vel_k, ncon_k = kernel_out
    n = rows_s.shape[-1]
    m = int(m_cap)
    n_over = jnp.sum(overflow.astype(jnp.int32))
    i_all = jnp.arange(n, dtype=jnp.int32)
    ord2 = jax.lax.cond(
        n_over > 0,
        lambda: jnp.argsort(jnp.logical_not(overflow), stable=True).astype(jnp.int32),
        lambda: i_all,
    )

    pos_s, vel_s = rows_s[0:3], rows_s[3:6]
    radius_s, restit_s = rows_s[6], rows_s[7]

    def chunk_cond(carry):
        c, _, _, _ = carry
        return c * m < n_over

    def chunk_body(carry):
        c, pos_k, vel_k, ncon_k = carry
        pick = jax.lax.dynamic_slice(ord2, (c * m,), (m,))
        p_i = pos_s[:, pick]
        v_i = vel_s[:, pick]
        r_i = radius_s[pick]
        e_i = restit_s[pick]
        m_i = r_i**3
        st_i = starts[:, pick]  # [9, m]
        ct_i = cnt[:, pick]
        redo = overflow[pick]

        def group_body(g, acc):
            dv, dp, ncon = acc
            start_g = st_i[g]
            cnt_g = jnp.where(redo, ct_i[g], 0)
            k_max = jnp.max(cnt_g)

            def body(s):
                k, dv, dp, ncon = s
                idx = jnp.clip(start_g + k, 0, n - 1)
                cand = rows_s[:, idx]  # [8, m] small gather
                pj, vj, rj, ej = cand[0:3], cand[3:6], cand[6], cand[7]
                valid = (k < cnt_g) & (idx != pick)
                d = p_i - pj
                dist2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
                rsum = r_i + rj
                touching = valid & (dist2 < rsum * rsum) & (dist2 > 0.0)
                dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
                nrm = d / dist[None]
                v_rel = v_i - vj
                vn = v_rel[0] * nrm[0] + v_rel[1] * nrm[1] + v_rel[2] * nrm[2]
                approaching = touching & (vn < 0.0)
                mj = rj**3
                e = 0.5 * (e_i + ej)
                wgt = mj / (m_i + mj)
                imp = jnp.where(approaching, -(1.0 + e) * vn * wgt, 0.0)
                overlap = jnp.where(touching, rsum - dist, 0.0)
                return (
                    k + 1,
                    dv + nrm * imp[None],
                    dp + nrm * (beta * overlap * wgt)[None],
                    ncon + touching.astype(jnp.int32),
                )

            _, dv, dp, ncon = jax.lax.while_loop(
                lambda s: s[0] < k_max, body, (jnp.int32(0), dv, dp, ncon)
            )
            return dv, dp, ncon

        dv, dp, ncon = jax.lax.fori_loop(
            0,
            9,
            group_body,
            (
                jnp.zeros_like(v_i),
                jnp.zeros_like(p_i),
                jnp.zeros((m,), dtype=jnp.int32),
            ),
        )

        pos_k = pos_k.at[:, pick].set(
            jnp.where(redo[None], p_i + dp, pos_k[:, pick])
        )
        vel_k = vel_k.at[:, pick].set(
            jnp.where(redo[None], v_i + dv, vel_k[:, pick])
        )
        ncon_k = ncon_k.at[pick].set(jnp.where(redo, ncon, ncon_k[pick]))
        return c + 1, pos_k, vel_k, ncon_k

    _, pos_k, vel_k, ncon_k = jax.lax.while_loop(
        chunk_cond, chunk_body, (jnp.int32(0), pos_k, vel_k, ncon_k)
    )
    return pos_k, vel_k, ncon_k, n_over
