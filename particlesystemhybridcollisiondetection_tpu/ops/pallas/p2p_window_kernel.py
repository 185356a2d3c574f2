"""Sorted 9-run per-sublane-window Pallas kernel for particle-particle
collisions.

The XLA sorted-segment path (ops/p2p_sorted.py) is algorithmically right but
gather-bound: on v5e every [rows, N] axis-1 gather costs ~5 ns/index
REGARDLESS of row count, table size, or index locality (measured 2026-08,
see /tmp-reproducible benchmarks in BASELINE.md), so its ~63 per-candidate
gathers cost ~300 ms at 1M particles.  This kernel moves the candidate
iteration into VMEM, exactly like the static-geometry window kernel
(ops/pallas/window_kernel.py):

  XLA glue (per step):
    1. sort particles by cell id; permute planar [8, N] rows,
    2. CSR offsets over cells: histogram scatter-add + cumsum,
    3. ONE stacked [18, C] "run table" -- rows (start_g, end_g) for the
       nine (dx, dy) neighbor z-runs, built by static SLICES of the
       offsets array -- so the per-particle bounds of all nine runs cost a
       single million-index gather instead of nine,
    4. per SUBLANE ROW of 128 sorted particles x group: window start =
       min run start (lane-aligned), per-block k_cap = max run length;
       particles whose run spills out of their sublane's window are
       flagged for the exact fallback.

  Kernel (per 1024-particle block):
    a fori_loop over the nine (dx, dy) groups: 8 per-sublane DMAs bring
    each sublane's [8, w] particle-row window (pos3/vel3/radius/
    restitution rows, natural layout) into the group's staging slot, ONE
    MXU permutation matmul arranges them as [64, w] gather tables (row
    8c+j = component c of sublane j's window), then a dynamic-bound
    candidate loop of in-register dynamic_gathers + the exact
    sphere-sphere contact model, accumulating impulse dv, positional
    correction dp, and contact counts.  All 72 DMAs are issued up front
    into separate VMEM slots (latency hiding) but the group loop is
    ROLLED, not unrolled: the 9x-unrolled form compiled 15-25 min
    remotely and repeatedly crashed the TPU worker mid-compile.

Why PER-SUBLANE windows (round-2 redesign; previously one window per
1024-particle block): the in-register gather is a cascade of w/128
per-vreg shuffles + selects, so its cost is linear in the window size.
One window covering a whole block's nine runs needed w=2048 (16-stage
cascade, ~1.3 us per candidate iteration); a window per 128 sorted
particles covers ~8x less span, so w=256..512 suffices -- a 4-8x shorter
cascade on the op that dominates the kernel -- at IDENTICAL total DMA
traffic (8 x [8, w] vs 1 x [8, 8w]).  The same change took the spatial
kernel through dense-scene block spans (window_kernel.py step 3).

The contact model matches ops/p2p.py (documented there; capability
extension over the reference, whose particles never interact).  Run
construction correctness (supersets, no double counting, symmetry) is
argued in ops/p2p_sorted.py -- this kernel consumes the same runs.
Self-collision needs no index test: a particle's own run contains
itself, but the ``dist2 > 0`` guard rejects the zero-distance pair (the
XLA paths apply the same guard on top of their index test, so semantics
agree on every non-self pair).
"""

from __future__ import annotations

import functools

import jax

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
    BLOCK,
    LANE,
    SUB,
    _lane_gather,
)

N_GROUPS = 9


def _p2p_kernel(
    # scalar prefetch -- FLAT 1-D layouts: SMEM pads each trailing 2-D
    # tile to (8/16, 128), so an [NB, 9, 8] i32 array would occupy
    # NB x 16 x 128 x 4 B (~8 MB at 1M particles, over the 1 MB SMEM
    # budget); 1-D arrays pad only to the next 128 elements.
    ws_ref,  # i32[NB*72]: [b, g, j] at b*72 + g*8 + j (lane-aligned
    #          per-sublane window starts)
    kcap_ref,  # i32[NB*9]: [b, g] at b*9 + g
    # inputs
    pos_ref,  # f32[3, 8, 128] sorted block
    vel_ref,  # f32[3, 8, 128]
    radius_ref,  # f32[8, 128]
    restit_ref,  # f32[8, 128]
    rel_ref,  # i32[9, 8, 128] own run start - own sublane's window start
    cnt_ref,  # i32[9, 8, 128] run length, per group
    rows_hbm,  # f32[8, N_pad] sorted rows (pos3/vel3/radius/restitution
    #            on the sublanes; natural layout, NOT pre-replicated)
    # outputs
    pos_out,  # f32[3, 8, 128] pos + beta-correction
    vel_out,  # f32[3, 8, 128] vel + impulses
    ncon_out,  # i32[8, 128]
    # scratch
    stage_ref,  # f32[9, 64, w]: group g rows 8j..8j+7 = sublane j's window
    win_ref,  # f32[64, w]: row 8c+j = component c of sublane j's window
    sem,  # DMA semaphores [9, 8]
    *,
    w: int,
    beta: float,
):
    b = pl.program_id(0)

    def dma(g, j):
        ws_a = pl.multiple_of(ws_ref[b * 72 + g * 8 + j], LANE)
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(ws_a, w)],
            stage_ref.at[g, pl.ds(8 * j, 8), :],
            sem.at[g, j],
        )

    # ALL 72 window DMAs start up front: issued back-to-back they overlap
    # each other and the early groups' candidate loops, hiding the
    # per-DMA latency that dominated the serialized form
    for g0 in range(N_GROUPS):
        for j0 in range(SUB):
            dma(g0, j0).start()

    pos = pos_ref[:]
    vel = vel_ref[:]
    radius = radius_ref[:]
    restit = restit_ref[:]
    mass = radius * radius * radius

    zero3 = jnp.zeros((3, SUB, LANE), dtype=jnp.float32)

    # The nine (dx, dy) groups run under a fori_loop, NOT a Python unroll:
    # the unrolled variant emitted a ~9x larger Mosaic program whose
    # remote compile took 15-25 min and repeatedly crashed the TPU worker
    # mid-compile (2026-08, v5e via axon).  Everything the group body
    # needs is indexable by the loop counter (rel/cnt rows, stage slot,
    # scalar k_cap), so the rolled form is semantically identical.
    #
    # Sublane-permutation matmul: perm[8c+j, 8j+c] = 1, so perm @ stage_g
    # ([64, w]) yields win with row 8c+j = component c of sublane j's
    # window.  Mosaic cannot shuffle sublanes in the VPU, but the MXU does
    # it for free; this keeps the HBM windows at their natural [8, w]
    # (the pre-replicated form cost 8x the DMA traffic).
    perm = (
        jax.lax.broadcasted_iota(jnp.int32, (64, 64), 1)
        == 8 * (jax.lax.broadcasted_iota(jnp.int32, (64, 64), 0) % 8)
        + jax.lax.broadcasted_iota(jnp.int32, (64, 64), 0) // 8
    ).astype(jnp.float32)  # [64, 64]; built in-kernel (pallas forbids
    #                        captured array constants)

    def group_body(g, acc):
        dv, dp, ncon = acc
        for j in range(SUB):
            dma(g, j).wait()
        rel = rel_ref[g]
        cnt = cnt_ref[g]
        k_cap = kcap_ref[b * N_GROUPS + g]
        win_ref[:] = jax.lax.dot_general(
            perm, stage_ref[g],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [64, w]
        tabs = [win_ref[8 * c : 8 * c + 8] for c in range(8)]  # [8, w] each

        def body(k, acc):
            dv, dp, ncon = acc
            idx = jnp.clip(rel + k, 0, w - 1)
            comp = [_lane_gather(tabs[c], idx) for c in range(8)]
            pj = jnp.stack(comp[0:3])
            vj = jnp.stack(comp[3:6])
            rj = comp[6]
            ej = comp[7]
            valid = (k < cnt) & (rel + k < w)

            d = pos - pj
            dist2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            rsum = radius + rj
            # dist2 > 0 rejects the self-pair (see module docstring)
            touching = valid & (dist2 < rsum * rsum) & (dist2 > 0.0)

            dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
            nrm = d / dist[None]  # from j to i
            v_rel = vel - vj
            vn = v_rel[0] * nrm[0] + v_rel[1] * nrm[1] + v_rel[2] * nrm[2]
            approaching = touching & (vn < 0.0)

            mj = rj * rj * rj
            e = 0.5 * (restit + ej)
            wgt = mj / (mass + mj)
            imp = jnp.where(approaching, -(1.0 + e) * vn * wgt, 0.0)
            overlap = jnp.where(touching, rsum - dist, 0.0)
            return (
                dv + nrm * imp[None],
                dp + nrm * (beta * overlap * wgt)[None],
                ncon + touching.astype(jnp.float32),
            )

        def w_cond(c):
            return c[0] < k_cap

        def w_body(c):
            k, acc = c
            return k + 1, body(k, acc)

        _, acc = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), (dv, dp, ncon))
        )
        return acc

    dv, dp, ncon = jax.lax.fori_loop(
        0,
        N_GROUPS,
        group_body,
        (zero3, zero3, jnp.zeros((SUB, LANE), dtype=jnp.float32)),
    )

    pos_out[:] = pos + dp
    vel_out[:] = vel + dv
    ncon_out[:] = ncon.astype(jnp.int32)


def p2p_window_collide_sorted(
    pos_s,  # f32[3, N] sorted by cell
    vel_s,
    radius_s,
    restit_s,
    rows_pad,  # f32[8, N + W] sorted rows, W pad cols
    rel,  # i32[9, N]
    cnt,  # i32[9, N]
    ws,  # i32[NB, 9, 8] per-sublane window starts
    k_cap,  # i32[NB, 9]
    *,
    w: int,
    beta: float,
    interpret: bool = False,
):
    """Invoke the kernel over all blocks.  Returns (pos', vel', ncon) in
    the sorted order (positional correction and impulses applied)."""
    n = pos_s.shape[-1]
    assert n % BLOCK == 0, n
    nb = n // BLOCK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, SUB, LANE), lambda b, *_: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, SUB, LANE), lambda b, *_: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANE), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANE), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_GROUPS, SUB, LANE), lambda b, *_: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_GROUPS, SUB, LANE), lambda b, *_: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # rows stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((3, SUB, LANE), lambda b, *_: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, SUB, LANE), lambda b, *_: (0, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANE), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_GROUPS, 8 * SUB, w), jnp.float32),
            pltpu.VMEM((8 * SUB, w), jnp.float32),
            pltpu.SemaphoreType.DMA((N_GROUPS, SUB)),
        ],
    )
    kern = functools.partial(_p2p_kernel, w=w, beta=beta)

    def shape2(x):
        return x.reshape(nb * SUB, LANE)

    def shape3(x):
        return x.reshape(-1, nb * SUB, LANE)

    pos_o, vel_o, ncon_o = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((3, nb * SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((3, nb * SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb * SUB, LANE), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        # flat 1-D scalar prefetch (see _p2p_kernel's SMEM padding note)
        ws.reshape(-1),
        k_cap.reshape(-1),
        shape3(pos_s),
        shape3(vel_s),
        shape2(radius_s),
        shape2(restit_s),
        shape3(rel),
        shape3(cnt),
        rows_pad,
    )
    return pos_o.reshape(3, n), vel_o.reshape(3, n), ncon_o.reshape(n)
