"""Settled-phase stage decomposition of the sorted pipeline at 1M.

profile_sorted.py ranks the XLA glue stages from a fresh spawn;
this script instead loads the SETTLED state snapshot cached by
profile_rescue.py (the regime that dominates long episodes and the
one VERDICT r2 weak #2 targets) and times, in isolation:

  plan(gather) / plan(coded) -> main window kernel -> rescue fallback

so the settled ms/step can be attributed before optimizing.

Usage:
    python benchmarks/profile_settled.py --scene bunny --layers 64
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


_RTT = None


def timeit(fn, *args, steps=30, warmup=2):
    from particlesystemhybridcollisiondetection_tpu.utils.profiling import (
        fence,
        rtt_ms,
    )

    global _RTT
    if _RTT is None:
        _RTT = rtt_ms()
        print(f"(tunnel RTT: {_RTT:.1f} ms)")
    for _ in range(warmup):
        out = fn(*args)
    fence(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    fence(jax.tree.leaves(out)[0])
    return ((time.perf_counter() - t0) * 1000.0 - _RTT) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="bunny")
    ap.add_argument("--layers", type=int, default=64)
    ap.add_argument("--settle-steps", type=int, default=700)
    ap.add_argument(
        "--cache", default=os.path.expanduser("~/.cache/psys_states")
    )
    # grid-parameter overrides (benchmarks/study_grid_params.py picks
    # candidates host-side; these measure them on device)
    ap.add_argument("--cell-size", type=float, default=None)
    ap.add_argument("--expand", type=float, default=None)
    ap.add_argument("--window", type=int, default=None,
                    help="main-kernel window rows (default: auto)")
    args = ap.parse_args()

    from particlesystemhybridcollisiondetection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from profile_rescue import settle  # same snapshot cache

    from particlesystemhybridcollisiondetection_tpu.core.step import (
        _auto_demote,
        _auto_window,
        _chunked_rescue,
        _maybe_code_table,
        _window_plan,
        _window_plan_coded,
    )
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import SCENES
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        build_triangle_grid,
        cell_index,
        lookup_pos,
        morton_key,
        pack_grid,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        BLOCK,
        build_window_tables,
        window_collide_sorted,
    )

    scene = SCENES[args.scene](width=480, height=270)
    cfg = scene.config
    if args.cell_size is not None or args.expand is not None:
        import dataclasses

        g = cfg.grid
        g = dataclasses.replace(
            g,
            cell_size=args.cell_size or g.cell_size,
            expand=args.expand or g.expand,
        )
        cfg = dataclasses.replace(cfg, grid=g)
    st = settle(scene, args.layers, args.settle_steps, args.cache)
    n = st.pos.shape[-1]
    nb = n // BLOCK
    print(f"n = {n}")

    grid, meta = build_triangle_grid(scene.triangles, cfg.grid)
    window = _auto_window(args.window, meta)
    # same floor as production (make_spatial_step_sorted): the rescue
    # re-windows COMPACTED particles, so 2048 fits 82-91% even of
    # scattered drift overflow
    rescue_window = max(window, _auto_window(None, meta), 2048)
    demote = _auto_demote("auto", meta)
    print(f"window = {window}, k_max = {meta.max_tris_per_cell}, "
          f"demote = {demote}")
    tables = build_window_tables(grid, meta, window)
    ctab = _maybe_code_table(grid, meta, "auto")
    group = 8
    packed, num_groups = pack_grid(grid, meta, group=group)
    gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)

    # ---- sorted inputs (computed once; settled states stay near-sorted) ----
    @jax.jit
    def sort_stage(pos, vel, radius, restit):
        key = morton_key(lookup_pos(pos, vel, cfg.dt), meta)
        ids = jnp.arange(n, dtype=jnp.int32)
        key_s, perm = jax.lax.sort((key, ids), num_keys=1)
        rows = jnp.concatenate(
            [pos, vel, radius[None], restit[None]], axis=0
        )
        return key_s, perm, rows[:, perm]

    key_s, perm, rows_s = sort_stage(st.pos, st.vel, st.radius, st.restitution)
    print(f"sort+permute:      "
          f"{timeit(sort_stage, st.pos, st.vel, st.radius, st.restitution):6.2f} ms")
    pos_s, vel_s = rows_s[0:3], rows_s[3:6]
    radius_s, restit_s = rows_s[6], rows_s[7]

    @jax.jit
    def plan_gather(pos_s, vel_s):
        cid_s = cell_index(lookup_pos(pos_s, vel_s, cfg.dt), meta)
        return _window_plan(cid_s, tables.cells2, window, nb, demote=demote)

    rel, count, ws, k_cap, overflow, ovf_count = plan_gather(pos_s, vel_s)
    print(f"plan (gather):     {timeit(plan_gather, pos_s, vel_s):6.2f} ms   "
          f"overflow={int(overflow.sum())}")

    if ctab is not None:
        @jax.jit
        def plan_coded(key_s):
            return _window_plan_coded(key_s, ctab, window, nb, demote=demote)

        _, _, _, _, ovf_c, _ = plan_coded(key_s)
        print(f"plan (coded):      {timeit(plan_coded, key_s):6.2f} ms   "
              f"overflow={int(ovf_c.sum())}")

    @jax.jit
    def kernel_stage(pos_s, vel_s, radius_s, restit_s, rel, count, ws, k_cap):
        return window_collide_sorted(
            pos_s, vel_s, radius_s, restit_s, rel, count, ws, k_cap, tables,
            w=window, k_static=meta.max_tris_per_cell,
            gravity=cfg.gravity, dt=cfg.dt, backoff=cfg.backoff,
        )

    kout = kernel_stage(pos_s, vel_s, radius_s, restit_s, rel, count, ws, k_cap)
    print(f"main kernel:       "
          f"{timeit(kernel_stage, pos_s, vel_s, radius_s, restit_s, rel, count, ws, k_cap):6.2f} ms   "
          f"k_cap p50/max = {int(np.median(np.asarray(k_cap)))}/"
          f"{int(np.asarray(k_cap).max())}")

    # production parity: key_s engages the phase-1 Morton-compacted
    # kernel rescue (omitting it used to measure a phase-2-only rescue,
    # which over-charged the stage ~3x at settled overflow -- the r4
    # roofline miss)
    @functools.partial(jax.jit, static_argnames=("m_cap",))
    def rescue_stage(kout, pos_s, vel_s, radius_s, restit_s, overflow,
                     ovf_count, key_s, tables, packed, m_cap=1024):
        return _chunked_rescue(
            kout, (pos_s, vel_s, radius_s, restit_s), overflow, tables,
            packed, meta, num_groups, group, gravity, cfg, m_cap,
            window=window, rescue_window=rescue_window, ovf_count=ovf_count,
            key_s=key_s,
        )

    out = rescue_stage(kout, pos_s, vel_s, radius_s, restit_s, overflow,
                       ovf_count, key_s, tables, packed)
    print(f"rescue (2-phase):  "
          f"{timeit(rescue_stage, kout, pos_s, vel_s, radius_s, restit_s, overflow, ovf_count, key_s, tables, packed):6.2f} ms   "
          f"n_over={int(out[3])}")

    # how far the rescue windows actually fit, chunk by chunk (under the
    # lane-order cumsum compaction _chunked_rescue actually uses)
    ovf = np.asarray(overflow)
    order = np.argsort(np.where(ovf, 0, 1 << 30), kind="stable")
    n_over = int(ovf.sum())
    from particlesystemhybridcollisiondetection_tpu.core.step import _plan_tail

    cells2 = np.asarray(tables.cells2)
    pos_np = np.asarray(pos_s)
    vel_np = np.asarray(vel_s)
    fits = 0
    for c0 in range(0, n_over, 8192):
        pick = order[c0:c0 + 8192]
        pick = np.pad(pick, (0, 8192 - len(pick)))
        cid_c = np.asarray(cell_index(jnp.asarray(
            pos_np[:, pick] + vel_np[:, pick] * (cfg.dt * 0.5)), meta))
        start_c = cells2[0, cid_c]
        count_c = np.where(ovf[pick], cells2[1, cid_c], 0)
        _, _, _, _, over2, _ = jax.jit(
            lambda s, c: _plan_tail(jnp.asarray(s), jnp.asarray(c),
                                    rescue_window, 8192 // BLOCK)
        )(start_c, count_c)
        over2 = np.asarray(over2)
        fits += int((ovf[pick] & ~over2).sum())
    print(f"rescue-window fit: {fits}/{n_over} "
          f"({100.0 * fits / max(1, n_over):.1f}%)")


if __name__ == "__main__":
    main()
