"""Settled-phase cost attribution + rescue-compaction alternatives (round 3).

VERDICT r2 weak #2 / next #2: settled 1M cost 11.9 ms (round 2) must go
toward <=8 ms.  The round-3 kernel-rescue fallback (309604d) regressed
settled at the default fallback_capacity=8192 (17.4 ms/step); chunk
m=1024 brings it to 12.12 ms/step (prior session, 2026-08-18).  This
script attributes the remaining cost and measures cheaper alternatives
for the rescue's dominant term, the full-N argsort compaction:

  A. end-to-end lazy/sorted step at several fallback capacities
  B. stage-by-stage: morton_key / plan / kernel / rescue / out-concat
  C. compaction alternatives: full argsort (baseline), pair lax.sort,
     per-tile batched sort (the searchsorted-gather design), lax.top_k
  D. window sweep: w=512 overflow + kernel + rescue cost

Run (TPU): python benchmarks/study_rescue_cost.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from particlesystemhybridcollisiondetection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from profile_rescue import settle

    from particlesystemhybridcollisiondetection_tpu.core.step import (
        _auto_window,
        _chunked_rescue,
        _maybe_code_table,
        _window_plan,
        _window_plan_coded,
        make_sorted_episode_runner,
    )
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import SCENES
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        build_triangle_grid,
        cell_index,
        morton_key,
        pack_grid,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        BLOCK,
        build_window_tables,
        window_collide_sorted,
    )
    from particlesystemhybridcollisiondetection_tpu.utils.profiling import (
        fence,
        rtt_ms,
    )

    scene = SCENES["bunny"](width=480, height=270)
    cfg = scene.config
    st = settle(scene, 64, 700, os.path.expanduser("~/.cache/psys_states"))
    n = st.pos.shape[-1]
    nb = n // BLOCK
    grid, meta = build_triangle_grid(scene.triangles, cfg.grid)
    window = _auto_window(None, meta)
    rescue_window = max(window, _auto_window(None, meta))
    tables = build_window_tables(grid, meta, window)
    ctab = _maybe_code_table(grid, meta, "kernel")
    group = 8
    packed, num_groups = pack_grid(grid, meta, group=group)
    gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)
    RTT = rtt_ms()
    print(f"n={n} window={window} (RTT {RTT:.1f} ms)", flush=True)

    def timeit(fn, *a, steps=20, warmup=2):
        for _ in range(warmup):
            out = fn(*a)
        fence(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*a)
        fence(jax.tree.leaves(out)[0])
        return ((time.perf_counter() - t0) * 1000.0 - RTT) / steps

    # ---- sorted inputs (carried-order proxy) -------------------------
    @jax.jit
    def sort_stage(pos, vel, radius, restit):
        key = morton_key(pos, meta)
        ids = jnp.arange(n, dtype=jnp.int32)
        key_s, perm = jax.lax.sort((key, ids), num_keys=1)
        rows = jnp.concatenate([pos, vel, radius[None], restit[None]], axis=0)
        return key_s, perm, rows[:, perm]

    key_s, perm, rows_s = sort_stage(st.pos, st.vel, st.radius, st.restitution)
    pos_s, vel_s = rows_s[0:3], rows_s[3:6]
    radius_s, restit_s = rows_s[6], rows_s[7]

    # ---- B. stages ---------------------------------------------------
    mk = jax.jit(lambda p: morton_key(p, meta))
    print(f"[B] morton_key:        {timeit(mk, pos_s):6.2f} ms", flush=True)

    plan_c = jax.jit(
        lambda k: _window_plan_coded(k, ctab, window, nb)
    )
    rel, count, ws, k_cap, overflow, ovf_count = plan_c(key_s)
    n_over = int(jnp.sum(overflow.astype(jnp.int32)))
    print(f"[B] plan (coded):      {timeit(plan_c, key_s):6.2f} ms  n_over={n_over}", flush=True)

    kern = jax.jit(
        lambda *a: window_collide_sorted(
            *a,
            tables,
            w=window,
            k_static=meta.max_tris_per_cell,
            gravity=cfg.gravity,
            dt=cfg.dt,
            backoff=cfg.backoff,
        )
    )
    kargs = (pos_s, vel_s, radius_s, restit_s, rel, count, ws, k_cap)
    kout = kern(*kargs)
    print(f"[B] main kernel:       {timeit(kern, *kargs):6.2f} ms", flush=True)

    def resc(cap):
        @jax.jit
        def f(kout, overflow, ovf_count):
            return _chunked_rescue(
                kout,
                (pos_s, vel_s, radius_s, restit_s),
                overflow,
                tables,
                packed,
                meta,
                num_groups,
                group,
                gravity,
                cfg,
                cap,
                window=window,
                rescue_window=rescue_window,
                ovf_count=ovf_count,
            )
        return f

    for cap in (1024, 2048):
        print(
            f"[B] rescue (m={cap}):  {timeit(resc(cap), kout, overflow, ovf_count):6.2f} ms",
            flush=True,
        )

    pos_k, vel_k, hit_k = kout

    @jax.jit
    def outstage(pos_k, vel_k, hit_k):
        out8 = jnp.concatenate([pos_k, vel_k, rows_s[6:8]], axis=0)
        aux = jnp.stack([hit_k, jnp.arange(n, dtype=jnp.int32)])
        return out8, aux

    print(f"[B] out concat+stack:  {timeit(outstage, pos_k, vel_k, hit_k):6.2f} ms", flush=True)

    # ---- C. compaction alternatives ----------------------------------
    big = jnp.int32(1 << 30)

    @jax.jit
    def comp_argsort(overflow, density):
        key = jnp.where(overflow, -density, big)
        return jnp.argsort(key, stable=True)

    print(f"[C] argsort (full N):  {timeit(comp_argsort, overflow, ovf_count):6.2f} ms", flush=True)

    @jax.jit
    def comp_pairsort(overflow, density):
        key = jnp.where(overflow, -density, big)
        _, ord2 = jax.lax.sort(
            (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )
        return ord2

    print(f"[C] lax.sort pair:     {timeit(comp_pairsort, overflow, ovf_count):6.2f} ms", flush=True)

    S = 1024
    T = n // S

    @jax.jit
    def comp_tiled(overflow, density):
        key = jnp.where(overflow, -density, big).reshape(T, S)
        idx = jnp.arange(n, dtype=jnp.int32).reshape(T, S)
        key_t, idx_t = jax.lax.sort((key, idx), dimension=1, num_keys=1)
        c_t = jnp.sum(overflow.reshape(T, S).astype(jnp.int32), axis=1)
        off = jnp.cumsum(c_t) - c_t  # exclusive prefix
        return key_t, idx_t, c_t, off

    out_t = comp_tiled(overflow, ovf_count)
    print(f"[C] tiled sort(1024):  {timeit(comp_tiled, overflow, ovf_count):6.2f} ms", flush=True)

    # chunk-side gather for the tiled design: ranks c*m..c*m+m-1 -> picks
    m = 1024

    @jax.jit
    def tiled_pick(idx_t, c_t, off, c):
        ranks = c * m + jnp.arange(m, dtype=jnp.int32)
        t = jnp.searchsorted(off + c_t, ranks, side="right").astype(jnp.int32)
        t = jnp.minimum(t, T - 1)
        slot = ranks - off[t]
        return idx_t[t, jnp.minimum(slot, S - 1)]

    _, idx_t, c_t, off = out_t
    print(f"[C] tiled chunk pick:  {timeit(tiled_pick, idx_t, c_t, off, jnp.int32(0)):6.2f} ms", flush=True)
    # validate: the first n_over picks == the overflow set
    picks = []
    for c in range((n_over + m - 1) // m):
        picks.append(np.asarray(tiled_pick(idx_t, c_t, off, jnp.int32(c))))
    picks = np.concatenate(picks)[:n_over]
    ovf_idx = np.nonzero(np.asarray(overflow))[0]
    print(f"[C] tiled covers overflow set: {np.array_equal(np.sort(picks), ovf_idx)}", flush=True)

    for K in (4096, 16384):
        @jax.jit
        def comp_topk(overflow, density, K=K):
            key = jnp.where(overflow, density - big, -big)
            _, idx = jax.lax.top_k(key, K)
            return idx

        print(f"[C] top_k K={K}:    {timeit(comp_topk, overflow, ovf_count):6.2f} ms", flush=True)

    # ---- D. window sweep ---------------------------------------------
    for w2 in (512,):
        tables2 = build_window_tables(grid, meta, w2)
        plan2 = jax.jit(lambda k: _window_plan_coded(k, _maybe_code_table(grid, meta, "kernel"), w2, nb))
        rel2, count2, ws2, k_cap2, over2, ovfc2 = plan2(key_s)
        n_over2 = int(jnp.sum(over2.astype(jnp.int32)))
        kern2 = jax.jit(
            lambda *a: window_collide_sorted(
                *a,
                tables2,
                w=w2,
                k_static=meta.max_tris_per_cell,
                gravity=cfg.gravity,
                dt=cfg.dt,
                backoff=cfg.backoff,
            )
        )
        k2args = (pos_s, vel_s, radius_s, restit_s, rel2, count2, ws2, k_cap2)
        print(
            f"[D] w={w2}: n_over={n_over2}  plan {timeit(plan2, key_s):5.2f} ms"
            f"  kernel {timeit(kern2, *k2args):5.2f} ms",
            flush=True,
        )

    # ---- A. end-to-end persistent runner -----------------------------
    for cap in (1024, 2048):
        run = make_sorted_episode_runner(
            scene.triangles,
            cfg,
            resort_every=8,
            cells_lookup="kernel",
            fallback_capacity=cap,
        )
        s = run(st, 16)
        fence(s.pos)
        t0 = time.perf_counter()
        s = run(st, 100)
        fence(s.pos)
        ms = ((time.perf_counter() - t0) * 1000.0 - RTT) / 100
        print(f"[A] settled e2e cap={cap}:  {ms:6.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
