"""Phase-by-phase timing of the sorted block-window pipeline at scale.

Times each XLA glue stage in isolation (jitted separately) plus the full
fused step, on the real TPU.  Isolated stages lack the fusion/overlap the
full step enjoys, so the numbers are upper bounds per stage -- useful for
ranking costs, not for exact accounting.

Usage: python benchmarks/profile_sorted.py [--layers 64] [--steps 100]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


_RTT = None


def timeit(fn, *args, steps=50, warmup=3):
    """Enqueue ``steps`` calls, close with a host-readback fence, subtract
    the tunnel round-trip.  In-order device execution makes the total =
    steps x per-call cost + RTT (block_until_ready alone returns early on
    the axon backend; see utils.profiling.fence)."""
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
    fence(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    fence(out)
    return ((time.perf_counter() - t0) * 1000.0 - _RTT) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=64)  # 128^2*64 = 1M
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--window", type=int, default=None)
    args = ap.parse_args()

    from particlesystemhybridcollisiondetection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()  # ~10 stage compiles x minutes each remotely

    from particlesystemhybridcollisiondetection_tpu.core.state import spawn_grid
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        _auto_window,
        make_spatial_step_sorted,
    )
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import bunny_scene
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        build_triangle_grid,
        cell_index,
        morton_key,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        BLOCK,
        build_window_tables,
        window_collide_sorted,
    )

    scene = bunny_scene(width=480, height=270)
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=args.layers, pad_multiple=1024)
    n = state.pos.shape[-1]
    print(f"n = {n}")

    grid, meta = build_triangle_grid(scene.triangles, cfg.grid)
    window = _auto_window(args.window, meta)
    print(f"window = {window}, k_max = {meta.max_tris_per_cell}, "
          f"cells = {meta.num_cells}, pairs = {meta.num_pairs}")
    tables = build_window_tables(grid, meta, window)

    # drop particles onto the mesh first so cells are realistically mixed
    step = make_spatial_step_sorted(
        scene.triangles, cfg, window=window, with_stats=True
    )
    s = state
    for k in range(520):
        s, st = step(s)
    jax.block_until_ready(s.pos)
    print("settled-ish: overflow =", int(st["window_overflow"]),
          "collisions =", int(jnp.sum(s.collisions)))

    full_ms = timeit(lambda x: step(x)[0], s, steps=args.steps)
    print(f"FULL sorted step: {full_ms:.2f} ms")

    # ---- isolated stages ----
    pos, vel = s.pos, s.vel
    nb = n // BLOCK

    @jax.jit
    def stage_cid(pos):
        return cell_index(pos, meta)

    cid = stage_cid(pos)
    print(f"cell_index:        {timeit(stage_cid, pos):6.2f} ms")

    @jax.jit
    def stage_key(pos):
        return morton_key(pos, meta)

    key = stage_key(pos)
    print(f"morton_key:        {timeit(stage_key, pos):6.2f} ms")

    @jax.jit
    def stage_sort(key, cid):
        ids = jnp.arange(n, dtype=jnp.int32)
        _, cid_s, perm = jax.lax.sort((key, cid, ids), num_keys=1)
        return cid_s, perm

    cid_s, perm = stage_sort(key, cid)
    print(f"sort (key,cid,ids): {timeit(stage_sort, key, cid):6.2f} ms")

    @jax.jit
    def stage_permute(pos, vel, r, e, perm):
        rows = jnp.concatenate([pos, vel, r[None], e[None]], axis=0)
        return rows[:, perm]

    rows_s = stage_permute(pos, vel, s.radius, s.restitution, perm)
    print(f"permute rows [8,N]: {timeit(stage_permute, pos, vel, s.radius, s.restitution, perm):6.2f} ms")

    @jax.jit
    def stage_cells(cells2, cid_s):
        return cells2[:, cid_s]

    info2 = stage_cells(tables.cells2, cid_s)
    print(f"cells gather [2,N] planar: {timeit(stage_cells, tables.cells2, cid_s):6.2f} ms")

    from particlesystemhybridcollisiondetection_tpu.core.step import _window_plan

    @jax.jit
    def stage_plan(cid_s, info2):
        return _window_plan(cid_s, tables.cells2, window, nb)

    rel, count, ws, k_cap, overflow, _ = stage_plan(cid_s, info2)
    print(f"window plan:       {timeit(stage_plan, cid_s, info2):6.2f} ms")
    print(f"  overflow now: {int(overflow.sum())} / {n}")

    pos_s = rows_s[0:3]
    vel_s = rows_s[3:6]
    radius_s = rows_s[6]
    restit_s = rows_s[7]

    @jax.jit
    def stage_kernel(pos_s, vel_s, radius_s, restit_s, rel, count, ws, k_cap):
        return window_collide_sorted(
            pos_s, vel_s, radius_s, restit_s, rel, count, ws, k_cap, tables,
            w=window, k_static=meta.max_tris_per_cell,
            gravity=cfg.gravity, dt=cfg.dt, backoff=cfg.backoff,
        )

    print(f"window kernel:     {timeit(stage_kernel, pos_s, vel_s, radius_s, restit_s, rel, count, ws, k_cap):6.2f} ms")

    @jax.jit
    def stage_unsort(perm, rows):
        _, inv_perm = jax.lax.sort(
            (perm, jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )
        return rows[:, inv_perm]

    print(f"unsort (sort+gather): {timeit(stage_unsort, perm, rows_s[0:7]):6.2f} ms")


if __name__ == "__main__":
    main()
