"""Sorted block-window narrow-phase Pallas kernel.

The fully TPU-native spatial collision pipeline.  Motivation, from
measured v5e behavior (BASELINE.md):

  * XLA HBM gathers run at ~12 GB/s effective -- they dominate every
    XLA-only formulation of the candidate fetch (62 ms/step best case at
    262k particles).
  * Mosaic's in-register ``tpu.dynamic_gather`` (lowered from
    ``jnp.take_along_axis(x, i, axis=1)`` with i.shape == x.shape) runs at
    ~1800 G elem/s at grid scale -- effectively free.

Pipeline per step (XLA glue + this kernel):

  1. sort particles by grid cell id (lax.sort, ~1 ms),
  2. one row-gather of each particle's CSR (start, count),
  3. per SUBLANE ROW of 128 sorted particles: window = [min start, +W)
     -- a *contiguous* CSR row range, because sorted particles' cells are
     sorted and the pair table is cell-ordered.  (Round 1 used one window
     per 1024-particle block; dense scenes -- settled particles on the
     398k-tri dragon -- span thousands of CSR rows per block, overflowing
     any affordable W.  128-particle granularity cuts spans ~8x.),
  4. kernel: 8 concurrent DMAs bring each sublane's natural-layout
     [16, W] vertex rows into VMEM, ONE MXU permutation matmul arranges
     them as [72, W] gather tables (row 8c+j = component c of window j),
     then loop candidates k < max(count in block): per-lane
     dynamic_gather of the 9 components + the exact swept-sphere
     subtests + running nearest -- all [8, 128] register math,
  5. per-particle overflow mask (count > 0 and own rows not fully inside
     the own sublane's window; impossible for falling particles, rare
     otherwise) -> handled by a compacted XLA fallback pass outside,
  6. response + integration fused in-kernel; results unsorted by scatter.

The kernel reimplements the reference narrow-phase math
(SpatialStructureCollisionDetection.compute:41-233 and response :332-352)
with identical semantics to ops/narrow_phase.py, asserted by equivalence
tests against the XLA paths.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from particlesystemhybridcollisiondetection_tpu.ops.grid import GridMeta, TriangleGrid

# block geometry: 8 sublanes x 128 lanes = 1024 particles per block
SUB, LANE = 8, 128
BLOCK = SUB * LANE
_INF = float("inf")


class WindowTables(NamedTuple):
    """Host-built device tables for the kernel."""

    # vertex components in NATURAL layout, padded to 16 sublane rows
    # (rows 9..15 are dead 1e38 sentinels) so each per-sublane window DMA
    # is a fully tile-aligned [16, w] slice.  Round 1 pre-replicated the
    # 9 rows across 8 sublanes ([9, 8, P] = 8x the HBM and 8x the DMA
    # traffic); the in-kernel permutation matmul (see _kernel) makes the
    # natural layout free, the same trick the p2p kernel uses for its
    # particle rows (p2p_window_kernel.py).
    pairs: jnp.ndarray  # f32[16, P_pad]
    # (start, count) per cell as a PLANAR [2, C] i32 table.  Layout
    # matters (multi-row axis-1 gather from a jit argument beats 1-D and
    # captured-constant forms), but even the best XLA form costs ~6.3
    # ns/index at grid-table sizes (6.3 ms at 1M, re-measured 2026-08-17;
    # an earlier 0.04 ms reading did not hold up) -- which is why the TPU
    # default is the in-kernel CodeTable lookup below; this table remains
    # the portable/CPU plan and the fallback for >2^24-pair grids.
    cells2: jnp.ndarray  # i32[2, C]: row 0 = start, row 1 = count


def build_window_tables(grid: TriangleGrid, meta: GridMeta, w: int) -> WindowTables:
    """Build the kernel tables with the pair rows in MORTON cell order.

    The per-cell blocks of the CSR table are permuted so that 3D-adjacent
    cells sit adjacent in the row space (cells2 still maps LINEAR cell
    ids to (start, count) -- only the row layout changes).  Particles are
    sorted by ops.grid.morton_key, so each sublane of 128 sorted
    particles covers a compact row range.  Within each cell the original
    triangle order is preserved, so per-particle candidate ORDER -- and
    therefore tie-breaking between equal-t2 hits on shared edges -- is
    bit-identical to the linear layout.
    """
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        morton_cell_codes,
    )

    offsets = np.asarray(grid.offsets).astype(np.int64)
    tri = np.asarray(grid.tri_ids)
    p = len(tri)
    verts = np.concatenate(
        [np.asarray(grid.v0), np.asarray(grid.v1), np.asarray(grid.v2)], axis=0
    )  # [9, T]
    pairs = verts[:, tri]  # [9, P]

    counts = np.diff(offsets)
    order = np.argsort(morton_cell_codes(meta), kind="stable")  # cells
    counts_m = counts[order]
    off_m = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts_m, out=off_m[1:])
    # pair permutation: morton-rank r takes rows [offsets[order[r]], +cnt)
    src = np.repeat(offsets[:-1][order], counts_m)
    dst_base = np.repeat(off_m[:-1], counts_m)
    pair_perm = np.arange(p, dtype=np.int64) - dst_base + src
    start_by_cell = np.empty(len(counts), dtype=np.int64)
    start_by_cell[order] = off_m[:-1]

    p_pad = ((p + w) // LANE + 1) * LANE
    pt = np.full((16, p_pad), 1.0e38, dtype=np.float32)
    pt[:9, :p] = pairs[:, pair_perm]
    cells2 = np.stack([start_by_cell, counts], axis=0).astype(np.int32)
    return WindowTables(pairs=jnp.asarray(pt), cells2=jnp.asarray(cells2))


class CodeTable(NamedTuple):
    """Morton-CODE-indexed (start, count) table for the in-kernel cells
    lookup.

    The XLA planar gather ``cells2[:, cid]`` costs ~6.3 ms per 1M
    indices on v5e (measured 2026-08-17; ~6.3 ns/index regardless of
    index order -- the "0.04 ms" fast path recorded earlier does not
    hold at grid-table sizes).  Because particles are SORTED by Morton
    code, 128 consecutive particles span a compact CODE range (bunny
    1M settled: p50 76, p99 291 codes; <=0.4% of particles past a
    512-code window), so the lookup becomes a per-sublane window DMA +
    one in-register gather -- the same trick as the pair windows.

    ``packed[0, code] = (start_in_morton_pair_table << 8) | min(count,
    255)``; empty codes hold 0.  Requires pair count < 2^24 (asserted);
    count==255 marks "clamped" and routes those particles to the exact
    fallback (cells that dense overflow most windows anyway).
    """

    packed: jnp.ndarray  # i32[1, CS_pad]


# code-table size cap: cs_pad i32 entries.  2^26 entries = 256 MB --
# far above any benchmark scene (bunny ~2M codes) but low enough that a
# degenerate anisotropic grid cannot silently allocate GBs (the table is
# sized by max Morton CODE ~ padded-dims cubed, not by occupied cells).
_CODE_TABLE_MAX = 1 << 26


def build_code_table(grid: TriangleGrid, meta: GridMeta, wc: int) -> CodeTable:
    """Host-build the Morton-code-indexed cells table (see CodeTable)."""
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        morton_cell_codes,
    )

    offsets = np.asarray(grid.offsets).astype(np.int64)
    counts = np.diff(offsets)
    p = int(offsets[-1])
    assert p < (1 << 24), (
        f"{p} pair rows exceed the 24-bit packed start; use the XLA "
        "gather plan for this grid"
    )
    # _morton_spread encodes 10 bits/axis: any grid dim > 1024 would
    # ALIAS distinct cells onto one code, and the packed[0, codes]
    # scatter below keeps the last write -- wrong (start, count) with no
    # miss flag.  Refuse instead (callers fall back to the gather plan).
    assert max(meta.dims) <= 1024, (
        f"grid dims {meta.dims} exceed the 10-bit Morton range; use the "
        "XLA gather plan for this grid"
    )
    codes = morton_cell_codes(meta)
    order = np.argsort(codes, kind="stable")
    counts_m = counts[order]
    off_m = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts_m, out=off_m[1:])
    start_by_cell = np.empty(len(counts), dtype=np.int64)
    start_by_cell[order] = off_m[:-1]

    cs = int(codes.max()) + 1
    cs_pad = ((cs + wc) // LANE + 1) * LANE
    assert cs_pad <= _CODE_TABLE_MAX, (
        f"code table would hold {cs_pad} entries (> {_CODE_TABLE_MAX}); "
        "use the XLA gather plan for this grid"
    )
    packed = np.zeros((1, cs_pad), dtype=np.int64)
    packed[0, codes] = (start_by_cell << 8) | np.minimum(counts, 255)
    return CodeTable(packed=jnp.asarray(packed.astype(np.int32)))


def _cells_kernel(
    lo_start_ref,  # i32[NB*8]: lane-aligned code-window starts (row-MIN)
    hi_start_ref,  # i32[NB*8]: lane-aligned starts of the row-MAX windows
    key_ref,  # i32[8, 128] morton code per particle (sorted order)
    table_hbm,  # i32[1, CS_pad] in ANY/HBM
    start_out,  # i32[8, 128]
    count_out,  # i32[8, 128]; -1 = lookup miss -> exact fallback
    *rest,  # 16x VMEM (1, wc) scratch (one per sublane window -- Mosaic
    #         cannot DMA into a single sublane row of an (8, wc) buffer:
    #         dim-0 slices must be 8-aligned) + DMA semaphores [16]
    wc: int,
):
    """TWO code windows per sublane: one anchored at the row's min code,
    one ENDING at its max.  Settled piles micro-oscillate across cell
    boundaries in lock-step, so a drifted row's codes go BIMODAL with
    the two clusters thousands of codes apart (the gap is empty cells --
    compact in pair-row space, huge in raw code space); a single
    min-anchored window then misses ~90% of the pile every other lazy
    step (measured: 925k/1M misses).  Min+max windows cover bimodal
    rows and single strays on either side; anything in between falls
    back exactly."""
    lo_wins, hi_wins, sem = rest[:SUB], rest[SUB : 2 * SUB], rest[2 * SUB]
    b = pl.program_id(0)
    copies = [
        (
            pltpu.make_async_copy(
                table_hbm.at[
                    :, pl.ds(pl.multiple_of(ref[b * SUB + j], 128), wc)
                ],
                win,
                sem.at[8 * half + j],
            ),
            # the max-ending window is redundant when the row is UNIMODAL
            # (hi <= lo <=> row max inside the lo window, see ok_hi
            # masking below): skip its DMA entirely.  At 1M settled most
            # rows are unimodal, and this kernel is DMA-LATENCY bound
            # (16 x 2 KB copies/block), so halving the copies nearly
            # halves the stage (measured 2026-08-19, profile_settled).
            None
            if half == 0
            else hi_start_ref[b * SUB + j] > lo_start_ref[b * SUB + j],
        )
        for half, (ref, wins) in enumerate(
            ((lo_start_ref, lo_wins), (hi_start_ref, hi_wins))
        )
        for j, win in enumerate(wins)
    ]
    for cp, pred in copies:
        if pred is None:
            cp.start()
        else:
            @pl.when(pred)
            def _():
                cp.start()
    key = key_ref[:]

    def _starts(ref):
        return jnp.concatenate(
            [
                jnp.full((1, LANE), ref[b * SUB + j], dtype=jnp.int32)
                for j in range(SUB)
            ]
        )

    lo = _starts(lo_start_ref)
    hi = _starts(hi_start_ref)
    for cp, pred in copies:
        if pred is None:
            cp.wait()
        else:
            @pl.when(pred)
            def _():
                cp.wait()
    rel_lo = key - lo
    rel_hi = key - hi
    ok_lo = (rel_lo >= 0) & (rel_lo < wc)
    # hi <= lo rows skipped their hi DMA (stale scratch): mask ok_hi so
    # the stale window is never selected.  ok_lo covers every lane there
    # (hi <= lo  <=>  row max <= lo + wc - 1), so results are bit-equal.
    ok_hi = (rel_hi >= 0) & (rel_hi < wc) & (hi > lo)
    tab_lo = jnp.concatenate([w[:] for w in lo_wins], axis=0)  # [8, wc]
    tab_hi = jnp.concatenate([w[:] for w in hi_wins], axis=0)
    g_lo = _lane_gather(tab_lo, jnp.clip(rel_lo, 0, wc - 1))
    g_hi = _lane_gather(tab_hi, jnp.clip(rel_hi, 0, wc - 1))
    packed = jnp.where(ok_lo, g_lo, g_hi)
    ok = ok_lo | ok_hi
    cnt = packed & 255
    # arithmetic >> then 24-bit mask recovers the start even when bit 31
    # (start bit 23) made the packed word negative
    start = (packed >> 8) & 0xFFFFFF
    count_out[:] = jnp.where(ok & (cnt < 255), cnt, -1)
    start_out[:] = start


def cells_window_lookup(
    key_s,  # i32[N] morton codes, sorted order
    lo_start,  # i32[NB*8] lane-aligned per-sublane min-window starts
    hi_start,  # i32[NB*8] lane-aligned per-sublane max-window starts
    ctab: CodeTable,
    *,
    wc: int,
    interpret: bool = False,
):
    """(start, count) per particle via per-sublane code-window DMAs +
    in-register gather (two windows per sublane; see _cells_kernel).
    count == -1 marks a lookup miss (own code outside both windows, or a
    count>=255 cell) -- the caller must mark those particles for the
    exact fallback."""
    n = key_s.shape[0]
    assert n % BLOCK == 0, n
    nb = n // BLOCK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((SUB, LANE), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((SUB, LANE), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANE), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            *([pltpu.VMEM((1, wc), jnp.int32)] * (2 * SUB)),
            pltpu.SemaphoreType.DMA((2 * SUB,)),
        ],
    )
    start, count = pl.pallas_call(
        functools.partial(_cells_kernel, wc=wc),
        out_shape=[
            jax.ShapeDtypeStruct((nb * SUB, LANE), jnp.int32),
            jax.ShapeDtypeStruct((nb * SUB, LANE), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(lo_start, hi_start, key_s.reshape(nb * SUB, LANE), ctab.packed)
    return start.reshape(n), count.reshape(n)


def _lane_gather(tab, idx):
    """tab: [8, S*128] sublane-replicated window values; idx: [8, 128] in
    [0, S*128).  Composes S in-register gathers + selects (the Mosaic
    dynamic_gather primitive shuffles within 128 lanes)."""
    s = tab.shape[-1] // LANE
    lane_i = idx % LANE
    seg = idx // LANE
    out = None
    for k in range(s):
        g = jnp.take_along_axis(tab[:, k * LANE : (k + 1) * LANE], lane_i, axis=1)
        out = g if out is None else jnp.where(seg == k, g, out)
    return out


def _kernel(
    # scalar prefetch -- FLAT 1-D layouts: SMEM pads each trailing 2-D
    # tile to (8, 128) i32, so an [NB, 8] window-start array costs
    # NB/8 x 8 x 128 x 4 B = exactly 1.00 MB at 2M particles (NB=2048),
    # blowing the 1 MB SMEM budget (observed: k=7 protocol compile
    # failure).  1-D arrays pad only to the next 128 elements.
    win_start_ref,  # i32[NB*8]: [b, j] at b*8 + j, per-SUBLANE
    #                 lane-aligned window starts
    k_cap_ref,  # i32[NB]
    sub_cap_ref,  # i32[NB*8]: per-sublane max candidate count
    # inputs
    pos_ref,  # f32[3, 8, 128] block (sorted)
    vel_ref,
    radius_ref,  # f32[8, 128]
    restit_ref,
    rel_start_ref,  # i32[8, 128] own CSR start - own sublane's window start
    count_ref,  # i32[8, 128]
    pairs_hbm,  # f32[16, P_pad] in ANY/HBM (natural layout, 9 live rows)
    # outputs
    pos_out,
    vel_out,
    hit_out,  # i32[8, 128]
    # scratch
    stage_ref,  # f32[128, W] VMEM: slot j = rows [16j, 16j+16) = window j
    win_ref,  # f32[72, W] VMEM: row 8c+j = component c of window j
    sem,  # DMA semaphores [8]
    *,
    w: int,
    k_static: int,
    gravity: tuple,
    dt: float,
    backoff: float,
):
    b = pl.program_id(0)
    k_cap = k_cap_ref[b]

    # Per-sublane windows: each row of 128 sorted particles gets its OWN
    # [16, w] window DMA (round 1 had one window per 1024-particle block,
    # which overflows on dense scenes -- settled particles on the 398k-tri
    # dragon span thousands of CSR rows per block).  All 8 DMAs are issued
    # up front (latency hiding, as in the p2p kernel).  Sublanes with ZERO
    # candidates (sub_cap == 0: air / mid-pile rows whose cells hold no
    # triangles) skip their DMA -- at 1M settled the median BLOCK has
    # k_cap 0 and this stage is DMA-latency bound, so skipping empties is
    # most of the stage (measured 2026-08-19, profile_settled).  Skipped
    # sublanes' stage rows are ZERO-FILLED below before the permutation
    # matmul: stale VMEM can hold NaN/Inf, and the matmul's 0-weight rows
    # would still poison every window via 0 * NaN = NaN (observed in
    # interpret mode; real VMEM gives no stronger guarantee).  The zeroed
    # windows' gathers are then discarded by ``valid`` (count == 0).
    copies = [
        (
            pltpu.make_async_copy(
                pairs_hbm.at[
                    :, pl.ds(pl.multiple_of(win_start_ref[b * SUB + j], 128), w)
                ],
                stage_ref.at[pl.ds(16 * j, 16), :],
                sem.at[j],
            ),
            sub_cap_ref[b * SUB + j] > 0,
        )
        for j in range(SUB)
    ]
    for cp, pred in copies:
        @pl.when(pred)
        def _():
            cp.start()

    pos = pos_ref[:]
    vel = vel_ref[:]
    radius = radius_ref[:]
    restit = restit_ref[:]
    rel_start = rel_start_ref[:]
    count = count_ref[:]

    speed2 = vel[0] * vel[0] + vel[1] * vel[1] + vel[2] * vel[2]
    inv_speed = jax.lax.rsqrt(jnp.maximum(speed2, 1e-37))
    dirn = vel * inv_speed[None]
    seg2 = speed2 * (dt * dt)

    for j, (cp, pred) in enumerate(copies):
        @pl.when(pred)
        def _():
            cp.wait()

        # zero the skipped sublane's stage rows so the assembly matmul
        # cannot hit stale NaN/Inf (0 * NaN = NaN); skipped entirely for
        # all-empty blocks, whose matmul never runs
        @pl.when(jnp.logical_not(pred) & (k_cap > 0))
        def _():
            stage_ref[pl.ds(16 * j, 16), :] = jnp.zeros(
                (16, w), dtype=jnp.float32
            )

    # Assemble gather tables win[8c+j, :] = stage[16j+c, :] with ONE MXU
    # permutation matmul (Mosaic cannot shuffle sublanes in the VPU; the
    # MXU does it for free -- same trick as the p2p kernel's `rep`).
    # All-empty blocks (k_cap == 0) skip it: the candidate loop below
    # never runs there, so win_ref is never read.
    @pl.when(k_cap > 0)
    def _assemble():
        perm = (
            jax.lax.broadcasted_iota(jnp.int32, (72, 128), 1)
            == 16 * (jax.lax.broadcasted_iota(jnp.int32, (72, 128), 0) % 8)
            + jax.lax.broadcasted_iota(jnp.int32, (72, 128), 0) // 8
        ).astype(jnp.float32)
        win_ref[:] = jax.lax.dot_general(
            perm, stage_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def cross3(a, b):
        return jnp.stack(
            [
                a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0],
            ]
        )

    def body(k, acc):
        best_t2, best_t, best_nx, best_ny, best_nz, any_hit = acc
        idx = jnp.clip(rel_start + k, 0, w - 1)
        comp = [_lane_gather(win_ref[8 * c : 8 * c + 8], idx) for c in range(9)]
        v0 = jnp.stack(comp[0:3])
        v1 = jnp.stack(comp[3:6])
        v2 = jnp.stack(comp[6:9])
        valid = (k < count) & (rel_start + k < w)

        # triangle normal flipped against motion (compute:169-171)
        nr = cross3(v1 - v0, v2 - v0)
        nlen = jnp.sqrt(jnp.maximum(dot3(nr, nr), 1e-37))
        nr = nr / nlen[None]
        flip = dot3(nr, dirn) > 0.0
        nr = jnp.where(flip[None], -nr, nr)
        off = nr * radius[None]

        c_t2 = jnp.full_like(best_t2, _INF)
        c_t = jnp.full_like(best_t, _INF)
        c_hit = jnp.zeros((SUB, LANE), dtype=bool)

        def consider(hit, t, c_t2, c_t, c_hit):
            t2 = t * t
            take = hit & (t2 < c_t2)
            return (
                jnp.where(take, t2, c_t2),
                jnp.where(take, t, c_t),
                c_hit | hit,
            )

        # offset planes (compute:174-198)
        for sgn in (1.0, -1.0):
            a0 = v0 + sgn * off
            a1 = v1 + sgn * off
            a2 = v2 + sgn * off
            e1 = a1 - a0
            e2 = a2 - a0
            rov = pos - a0
            nn = cross3(e1, e2)
            q = cross3(rov, dirn)
            d = 1.0 / dot3(dirn, nn)
            u = d * -dot3(q, e2)
            vv = d * dot3(q, e1)
            t = d * -dot3(nn, rov)
            hit = ~((u < 0.0) | (vv < 0.0) | ((u + vv) > 1.0))
            c_t2, c_t, c_hit = consider(hit, t, c_t2, c_t, c_hit)

        # edge cylinders (compute:103-142; geometric cap test, see
        # ops/narrow_phase.py::ray_cylinder)
        for (pa, pb) in ((v0, v1), (v1, v2), (v2, v0)):
            ba = pb - pa
            oc = pos - pa
            baba = dot3(ba, ba)
            bard = dot3(ba, dirn)
            baoc = dot3(ba, oc)
            k2 = baba - bard * bard
            k1 = baba * dot3(oc, dirn) - baoc * bard
            k0 = baba * dot3(oc, oc) - baoc * baoc - radius * radius * baba
            h = k1 * k1 - k2 * k0
            hs = jnp.sqrt(jnp.maximum(h, 0.0))
            t_body = (-k1 - hs) / k2
            y = baoc + t_body * bard
            body_hit = (h >= 0.0) & (y > 0.0) & (y < baba)
            yc = jnp.where(y < 0.0, 0.0, baba)
            t_cap = (yc - baoc) / bard
            qq = oc + dirn * t_cap[None] - ba * (yc / baba)[None]
            cap_hit = (h >= 0.0) & (dot3(qq, qq) < radius * radius)
            hit = body_hit | cap_hit
            t = jnp.where(body_hit, t_body, t_cap)
            c_t2, c_t, c_hit = consider(hit, t, c_t2, c_t, c_hit)

        # vertex spheres (compute:144-161)
        for pv in (v0, v1, v2):
            oc = pv - pos
            proj = dot3(oc, dirn)
            disc = radius * radius - (dot3(oc, oc) - proj * proj)
            hit = disc >= 0.0
            t = proj - jnp.sqrt(jnp.maximum(disc, 0.0))
            c_t2, c_t, c_hit = consider(hit, t, c_t2, c_t, c_hit)

        # span check (compute:226-231) + candidate validity
        tri_hit = c_hit & (c_t2 <= seg2) & valid
        c_t2 = jnp.where(tri_hit, c_t2, _INF)
        take = c_t2 < best_t2
        return (
            jnp.where(take, c_t2, best_t2),
            jnp.where(take, c_t, best_t),
            jnp.where(take, nr[0], best_nx),
            jnp.where(take, nr[1], best_ny),
            jnp.where(take, nr[2], best_nz),
            # f32 mask: Mosaic cannot legalize i1-vector loop carries
            jnp.maximum(any_hit, tri_hit.astype(jnp.float32)),
        )

    zeros = jnp.zeros((SUB, LANE), dtype=jnp.float32)
    init = (
        jnp.full((SUB, LANE), _INF, dtype=jnp.float32),
        jnp.full((SUB, LANE), _INF, dtype=jnp.float32),
        zeros,
        zeros,
        zeros,
        zeros,  # any_hit as f32 mask (no i1 loop carries)
    )
    # adaptive trip count: blocks only iterate to their own max cell
    # count (dynamic while_loop; Mosaic cannot legalize dynamic scf.for)
    bound = jnp.minimum(k_cap, k_static)

    def w_cond(c):
        return c[0] < bound

    def w_body(c):
        k, acc = c
        return k + 1, body(k, acc)

    _, (best_t2, best_t, nx, ny, nz, any_hit) = jax.lax.while_loop(
        w_cond, w_body, (jnp.int32(0), init)
    )

    hit = (any_hit > 0.0) & (best_t2 < _INF) & (speed2 != 0.0)
    nrm = jnp.stack([nx, ny, nz])

    # response (compute:332-352) + integrator (PSReactionUpdate:18-19)
    # gravity enters as python floats (static) to avoid captured consts
    g = jnp.stack(
        [jnp.full((SUB, LANE), float(gc), dtype=jnp.float32) for gc in gravity]
    )
    col_point = pos + dirn * best_t[None]
    dn = dot3(dirn, nrm)
    refl = dirn - 2.0 * dn[None] * nrm
    rlen = jnp.sqrt(jnp.maximum(dot3(refl, refl), 1e-37))
    refl = refl / rlen[None]
    end_pos = pos + vel * dt
    ce = end_pos - col_point
    col_to_end = jnp.sqrt(jnp.maximum(dot3(ce, ce), 0.0))
    speed = jnp.sqrt(speed2)
    new_vel = refl * (restit * speed)[None] - g * dt
    new_pos = (
        col_point
        - dirn * (backoff * radius)[None]
        + refl * (col_to_end * restit)[None]
    )
    out_vel = jnp.where(hit[None], new_vel, vel)
    out_pos = jnp.where(hit[None], new_pos, pos)
    # fused integration
    out_vel = out_vel + g * dt
    out_pos = out_pos + out_vel * dt

    pos_out[:] = out_pos
    vel_out[:] = out_vel
    hit_out[:] = hit.astype(jnp.int32)


def window_collide_sorted(
    pos_s,  # f32[3, N] sorted by cell
    vel_s,
    radius_s,
    restit_s,
    rel_start,  # i32[N]
    count,  # i32[N]
    win_start,  # i32[NB, 8] per-sublane window starts
    k_cap,  # i32[NB]
    tables: WindowTables,
    *,
    w: int,
    k_static: int,
    gravity: tuple,
    dt: float,
    backoff: float,
    interpret: bool = False,
):
    """Invoke the kernel over all blocks.  Returns (pos', vel', hit) in the
    sorted order, with integration applied to every particle."""
    n = pos_s.shape[-1]
    assert n % BLOCK == 0, n
    nb = n // BLOCK

    def shape2(x):
        return x.reshape(nb * SUB, LANE)

    def shape3(x):
        return x.reshape(3, nb * SUB, LANE)

    # per-sublane max count: lets the kernel skip the pairs DMA of
    # all-empty sublane rows (most rows at settled 1M; see _kernel)
    sub_cap = jnp.max(shape2(count), axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, SUB, LANE), lambda b, *_: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, SUB, LANE), lambda b, *_: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANE), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANE), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANE), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANE), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # pairs table stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((3, SUB, LANE), lambda b, *_: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, SUB, LANE), lambda b, *_: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANE), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((128, w), jnp.float32),
            pltpu.VMEM((72, w), jnp.float32),
            pltpu.SemaphoreType.DMA((SUB,)),
        ],
    )
    kern = functools.partial(
        _kernel, w=w, k_static=k_static, gravity=gravity, dt=dt,
        backoff=backoff,
    )
    pos_o, vel_o, hit_o = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((3, nb * SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((3, nb * SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb * SUB, LANE), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        # flat 1-D scalar prefetch (see _kernel's SMEM padding note)
        win_start.reshape(-1),
        k_cap,
        sub_cap,
        shape3(pos_s),
        shape3(vel_s),
        shape2(radius_s),
        shape2(restit_s),
        shape2(rel_start),
        shape2(count),
        tables.pairs,
    )
    return (
        pos_o.reshape(3, n),
        vel_o.reshape(3, n),
        hit_o.reshape(n),
    )
