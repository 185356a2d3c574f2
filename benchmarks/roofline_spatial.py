"""Roofline / work-count model of the flagship sorted spatial pipeline.

VERDICT r3 #7: the p2p path has a first-principles cost model
(BASELINE.md: 75k block-group iterations x 1.3 us = 97 ms vs 79 ms
measured); the flagship spatial kernel's "5.49 ms, vs_baseline 3.19"
had no equivalent -- this script gives it one, so the headline can be
stated as a fraction of the machine floor instead of a ratio to the
driver's 60-steps/s north star.

Everything is computed HOST-SIDE from the cached settled snapshot
(benchmarks/profile_rescue.py::settle): the plan replica below mirrors
core/step.py::_window_plan_coded / _plan_tail / window_kernel._kernel
bit-for-bit in NumPy, so per-stage work counts (DMA copies, kernel
trip counts, gather volumes, overflow load) are exact for that state,
including order DRIFT between lazy re-sorts (the sort order is
computed from rewound positions ``p - a*v*dt``, the plan from current
ones -- free fall preserves order, settled micro-oscillation does not).
No TPU is touched; measured stage times for validation come from
benchmarks/profile_settled.py (run separately, on hardware).

Machine constants (TPU v5e, one core):

  HBM_BW      819 GB/s   public v5e spec (jax-ml.github.io/scaling-book)
  VPU         940 MHz x 4 ALUs x (8,128)-lane vregs
              = 3.76e9 vreg-ops/s at IPC 4 (the floor rate);
              Mosaic-sustained IPC is ~2 on this kernel's mix of
              fma/select/rsqrt (fit once against the measured kernel
              stage; every OTHER stage then must follow)
  DMA_NS      ~65 ns effective per outstanding async copy (fit from
              the measured cells-kernel stage: 0.53 ms / (1024 blocks
              x ~8 live copies); both Pallas stages issue 8-16 copies
              per block and are latency- not byte-bound)
  GATHER_NS   6.3 ns per XLA gather index (measured 2026-08-17,
              window_kernel.py::WindowTables.cells2 notes)
  SORT_MS     1.1 ms per 1M-key (key, payload) lax.sort (measured,
              BASELINE.md round-2 glue table)

Usage:
    python benchmarks/roofline_spatial.py                  # model table
    python benchmarks/roofline_spatial.py --measured 8.79  # vs measured
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

SUB, LANE = 8, 128
BLOCK = SUB * LANE
CODE_WC = 512  # core/step.py::_CODE_WC

HBM_BW = 819e9
VPU_HZ = 940e6
VPU_ALUS = 4
DMA_NS = 65e-9
GATHER_NS = 6.3e-9
SORT_MS_1M = 1.1
ARGSORT_MS_1M = 2.0  # measured: rescue phase-1 compaction argsort at 1M


def _spread(x):
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def cell_coords(pos, meta):
    c = np.floor((pos - np.asarray(meta.origin)[:, None]) / meta.cell_size)
    return tuple(
        np.clip(c[i], 0, meta.dims[i] - 1).astype(np.int64) for i in range(3)
    )


def morton_key(pos, meta):
    cx, cy, cz = cell_coords(pos, meta)
    return (
        _spread(cx.astype(np.int32)).astype(np.int64)
        | (_spread(cy.astype(np.int32)).astype(np.int64) << 1)
        | (_spread(cz.astype(np.int32)).astype(np.int64) << 2)
    )


def cell_index(pos, meta):
    cx, cy, cz = cell_coords(pos, meta)
    return (cx * meta.dims[1] + cy) * meta.dims[2] + cz


def plan_replica(pos, vel, dt, meta, counts_by_cell, start_by_cell,
                 codes_by_cell, window, drift_steps):
    """NumPy replica of _window_plan_coded + _plan_tail for one step.

    Sort order from REWOUND positions (drift_steps steps ago); plan from
    current ones.  Returns the per-step work-count dict.
    """
    n = pos.shape[-1]
    nb = n // BLOCK
    mid = pos + vel * (dt * 0.5)
    mid_old = (pos - vel * (dt * drift_steps)) + vel * (dt * 0.5)
    order = np.argsort(morton_key(mid_old, meta), kind="stable")
    key_s = morton_key(mid, meta)[order]
    cid_s = cell_index(mid, meta)[order]

    rows = key_s.reshape(nb * SUB, LANE)
    lo = (rows.min(axis=1) // 128) * 128
    hi = np.maximum(((rows.max(axis=1) - CODE_WC + 128) // 128) * 128, 0)
    rel_lo = rows - lo[:, None]
    rel_hi = rows - hi[:, None]
    ok = ((rel_lo >= 0) & (rel_lo < CODE_WC)) | (
        ((rel_hi >= 0) & (rel_hi < CODE_WC)) & (hi > lo)[:, None]
    )
    count = counts_by_cell[cid_s]
    start = start_by_cell[cid_s]
    miss = (~ok.reshape(n)) | (count >= 255)

    # _plan_tail
    big = 1 << 30
    sb = np.where(count > 0, start, big).reshape(nb * SUB, LANE)
    ws = sb.min(axis=1)
    ws = np.where(ws == big, 0, ws)
    ws = (ws // 128) * 128
    rel = start - np.repeat(ws, LANE)
    overflow = (count > 0) & ((rel < 0) | (rel + count > window))
    # _plan_tail(miss=miss) folds ALL miss lanes into overflow, including
    # count==0 cells (ADVICE r4: `miss & (count > 0)` undercounted the
    # rescue-chunk load)
    overflow |= miss
    cnt = np.where(overflow, 0, count)
    k_cap = cnt.reshape(nb, SUB * LANE).max(axis=1)
    sub_cap = cnt.reshape(nb * SUB, LANE).max(axis=1)

    return {
        "trip_total": int(k_cap.sum()),
        "live_blocks": int((k_cap > 0).sum()),
        "live_sublanes": int((sub_cap > 0).sum()),
        "hi_dmas": int((hi > lo).sum()),
        "overflow": int(overflow.sum()),
        "miss": int(miss.sum()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="bunny")
    ap.add_argument("--layers", type=int, default=64)
    ap.add_argument("--settle-steps", type=int, default=700)
    ap.add_argument("--cache",
                    default=os.path.expanduser("~/.cache/psys_states"))
    ap.add_argument("--resort-every", type=int, default=8)
    ap.add_argument("--window", type=int, default=1024,
                    help="main-kernel window rows; must MATCH the "
                    "production config being modeled (the host-side "
                    "_auto_window would return the CPU default, not the "
                    "TPU floor)")
    ap.add_argument("--ipc", type=float, default=2.0,
                    help="sustained VPU vreg-ops/cycle (floor: 4)")
    ap.add_argument("--measured", type=float, default=None,
                    help="measured settled ms/step to compare against")
    ap.add_argument("--out", default=None, help="write JSON artifact here")
    args = ap.parse_args()

    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import SCENES
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        build_triangle_grid,
        morton_cell_codes,
    )
    from particlesystemhybridcollisiondetection_tpu.core.step import _auto_window

    scene = SCENES[args.scene](width=480, height=270)
    path = os.path.join(
        args.cache, f"{scene.name}_L{args.layers}_s{args.settle_steps}.npz"
    )
    z = np.load(path)
    pos, vel = z["pos"].astype(np.float64), z["vel"].astype(np.float64)
    n = pos.shape[-1]
    nb = n // BLOCK
    dt = scene.config.dt

    grid, meta = build_triangle_grid(scene.triangles, scene.config.grid)
    window = args.window or _auto_window(None, meta)
    offsets = np.asarray(grid.offsets).astype(np.int64)
    counts = np.diff(offsets)
    codes = morton_cell_codes(meta)
    order = np.argsort(codes, kind="stable")
    counts_m = counts[order]
    off_m = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts_m, out=off_m[1:])
    start_by_cell = np.empty(len(counts), dtype=np.int64)
    start_by_cell[order] = off_m[:-1]

    # average the work counts over one full re-sort cycle (drift 0..R-1)
    R = args.resort_every
    per = [
        plan_replica(pos, vel, dt, meta, counts, start_by_cell, codes,
                     window, a)
        for a in range(R)
    ]
    avg = {k: float(np.mean([p[k] for p in per])) for k in per[0]}
    s = window // LANE  # _lane_gather segments per component

    # ---- per-iteration vreg-op count (window_kernel._kernel::body) ----
    # 9 comps x s segments x (gather + select)          = 18*s
    # normal + flip + offset (cross, rsqrt, selects)    ~ 30
    # 2 offset-plane tests (cross x2, dots x5, div ...) ~ 45 each
    # 3 edge cylinders (dots x6, sqrt, caps)            ~ 40 each
    # 3 vertex spheres                                  ~ 15 each
    # consider/nearest bookkeeping                      ~ 25
    ops_iter = 18 * s + 30 + 2 * 45 + 3 * 40 + 3 * 15 + 25
    vpu_rate = VPU_HZ * args.ipc  # vreg-ops/s sustained
    vpu_floor = VPU_HZ * VPU_ALUS

    st = {}
    # A. morton key of the midpoint: ~3 fused passes over [3,N] f32 + key
    st["key (elemwise)"] = (n * (24 + 4 + 4)) / HBM_BW * 1e3
    # B. re-sort every R steps: 1M-key sort + [8,N] permute row-gather
    st["sort+permute /%d" % R] = (
        SORT_MS_1M * (n / 1e6) + n * GATHER_NS * 1e3 * 1.3
    ) / R
    # C. cells kernel: (8 + live hi) 2KB copies per block, latency-bound
    st["plan: cells kernel"] = (
        (nb * SUB + avg["hi_dmas"]) * DMA_NS * 1e3
        + nb * 40 / vpu_rate * 1e3
    )
    # D. plan tail: ~15 fused passes over i32[N]
    st["plan: tail reductions"] = (n * 15 * 4 * 2 / 8) / HBM_BW * 1e3
    # E. main kernel: live-sublane [16,w] copies + trip_total iterations
    dma_bytes = avg["live_sublanes"] * 16 * window * 4
    st["kernel: pairs DMA"] = max(
        avg["live_sublanes"] * DMA_NS, dma_bytes / HBM_BW
    ) * 1e3
    st["kernel: narrow phase"] = (
        avg["trip_total"] * ops_iter / vpu_rate * 1e3
    )
    # in/out blocks stream [3,8,128] x4 + scalars regardless of emptiness
    st["kernel: state io"] = (n * (28 + 28 + 8 + 8 + 4) / HBM_BW) * 1e3
    # F. rescue: compaction argsort (fires when overflow > 0) + one
    #    8192-chunk kernel pass per 8192 overflow lanes (gather/scatter
    #    ~10 rows io + kernel on 8 blocks at the rescue window)
    chunks = np.mean([np.ceil(p["overflow"] / 8192) for p in per])
    st["rescue: argsort"] = ARGSORT_MS_1M * (n / 1e6)
    st["rescue: chunks"] = float(chunks) * (
        8192 * 10 * GATHER_NS * 1e3
        + 8 * SUB * DMA_NS * 1e3
        + 8192 * 4 * ops_iter / vpu_rate * 1e3  # ~4 trips/lane observed
    )

    total = sum(st.values())
    floor = (
        st["key (elemwise)"]
        + st["plan: tail reductions"]
        + st["kernel: state io"]
        + dma_bytes / HBM_BW * 1e3
        + avg["trip_total"] * ops_iter / vpu_floor * 1e3
    )

    print(f"scene={scene.name} n={n} nb={nb} window={window} "
          f"segments/gather={s} ops/iter~{ops_iter}")
    print(f"avg work counts over a {R}-step re-sort cycle: "
          + json.dumps({k: round(v, 1) for k, v in avg.items()}))
    print(f"{'stage':<26}{'model ms':>10}")
    for k, v in st.items():
        print(f"{k:<26}{v:>10.3f}")
    print(f"{'TOTAL (model)':<26}{total:>10.3f}")
    print(f"{'machine floor (IPC 4)':<26}{floor:>10.3f}")
    if args.measured:
        print(
            f"measured {args.measured:.3f} ms/step = {args.measured/total:.2f}x "
            f"model, {args.measured/floor:.2f}x machine floor "
            f"({100*floor/args.measured:.0f}% of speed-of-light)"
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "scene": scene.name, "n": n, "window": window,
                "ops_per_iter": ops_iter, "avg_counts": avg,
                "stages_ms": {k: round(v, 4) for k, v in st.items()},
                "total_model_ms": round(total, 3),
                "floor_ms": round(floor, 3),
                "measured_ms": args.measured,
                "constants": {
                    "HBM_BW": HBM_BW, "VPU_HZ": VPU_HZ, "IPC": args.ipc,
                    "DMA_NS": DMA_NS, "GATHER_NS": GATHER_NS,
                    "SORT_MS_1M": SORT_MS_1M,
                },
            }, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
