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

Model structure (round 5 refit; the round-4 version over-charged the
rescue stage ~4x by modeling phase-1 chunks from first principles with
a mis-fit per-iteration count AND ran on a stale pre-midpoint-anchor
snapshot -- VERDICT r4 weak #2):

  * WORK COUNTS (overflow, live sublanes, trips, DMA counts) come from
    the NumPy plan replica below -- first-principles, drift-averaged
    over a full re-sort cycle.
  * STAGE TIMES anchor on isolated measurements from
    benchmarks/profile_settled.py (committed in BASELINE.md round-5):
    sort+permute, coded plan, main kernel, and the 2-phase rescue at
    the drift-0 baseline overflow.  Cheap fused stages (key, state io)
    stay first-principles from HBM bandwidth.
  * The rescue stage is ANCHOR + SLOPE: its measured drift-0 cost plus
    a fitted marginal cost per overflow lane (RESCUE_SLOPE, fit ONCE at
    the (window=1024, resort=8) production row), because its cost is
    dominated by fixed work (the 1M compaction argsort + first chunk +
    phase-2 spine) with a shallow linear tail in the overflow count.
  * One glue constant (GLUE_MS: concat/aux carry + integrate + trigger)
    absorbs what the isolated stages do not cover; fit at the same row.

  Everything else (6 production rows across window in {1024, 2048} x
  resort_every in {8, 16, 32}) is VALIDATION, not fit -- residuals are
  printed per config and committed to BASELINE.md.

Machine constants (TPU v5e, one core):

  HBM_BW      819 GB/s   public v5e spec (jax-ml.github.io/scaling-book)
  VPU         940 MHz x 4 ALUs x (8,128)-lane vregs
  GATHER_NS   6.3 ns per XLA gather index (measured 2026-08-17,
              window_kernel.py::WindowTables.cells2 notes)

Usage:
    python benchmarks/roofline_spatial.py --window 1024 --resort-every 8
    python benchmarks/roofline_spatial.py --window 2048 --resort-every 16 \
        --measured 8.90
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
GATHER_NS = 6.3e-9

# Measured isolated stage anchors (profile_settled.py, 1M bunny settled
# snapshot 2026-08-20, post-midpoint-anchor; BASELINE.md round-5).
# Keyed by window; re-measure and extend when modeling a new config.
STAGE_ANCHORS = {
    1024: dict(sort_ms=6.39, plan_ms=1.03, kernel_ms=1.29,
               rescue0_ms=4.35, rescue0_n=1435),
    2048: dict(sort_ms=6.36, plan_ms=0.57, kernel_ms=1.44,
               rescue0_ms=3.86, rescue0_n=481),
}
# Fitted at the (1024, resort=8) production row (9.32 ms, overflow p50
# 11.5k); every other config is validation.
RESCUE_SLOPE_MS_PER_K = 0.11  # marginal rescue ms per 1k overflow lanes
GLUE_MS = 0.70  # carry concat/aux + integrate + trigger update


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
    # "No TPU is touched" must hold even when the axon sitecustomize
    # ignores JAX_PLATFORMS=cpu from the environment: grid tables built
    # under the default backend would land on the (possibly busy) TPU
    # and the np.asarray readbacks below would block behind it.  Same
    # in-process override as tests/conftest.py.
    import jax

    jax.config.update("jax_platforms", "cpu")
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
    ap.add_argument("--measured", type=float, default=None,
                    help="measured settled ms/step to compare against")
    ap.add_argument("--measured-overflow", type=float, default=None,
                    help="measured overflow p50 (study_settled_levers); "
                    "overrides the replica's drift-averaged prediction")
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

    anchor = STAGE_ANCHORS.get(window)
    if anchor is None:
        raise SystemExit(
            f"no measured stage anchors for window={window}; run "
            "benchmarks/profile_settled.py --window {window} and add them "
            "to STAGE_ANCHORS"
        )

    # Drift-averaged overflow: the replica's ballistic-rewind drift
    # model UNDER-predicts the measured p50 (real settled jiggle is not
    # ballistic -- cell-boundary oscillation decorrelates lane order
    # faster), so report both and let --measured-overflow override.
    ovf = (args.measured_overflow
           if args.measured_overflow is not None else avg["overflow"])

    st = {}
    # morton key of the midpoint: ~3 fused passes over [3,N] f32 + key
    st["key (elemwise)"] = (n * (24 + 4 + 4)) / HBM_BW * 1e3
    st["sort+permute /%d" % R] = anchor["sort_ms"] / R
    st["plan (coded)"] = anchor["plan_ms"]
    st["main kernel"] = anchor["kernel_ms"]
    # in/out blocks stream [3,8,128] x4 + scalars regardless of emptiness
    st["kernel: state io"] = (n * (28 + 28 + 8 + 8 + 4) / HBM_BW) * 1e3
    st["glue (carry+integrate)"] = GLUE_MS
    # rescue: measured drift-0 anchor (argsort + first chunk + phase-2
    # spine) + fitted marginal slope in the overflow count
    st["rescue (anchor+slope)"] = (
        anchor["rescue0_ms"]
        + RESCUE_SLOPE_MS_PER_K * max(0.0, ovf - anchor["rescue0_n"]) / 1e3
    )

    total = sum(st.values())

    print(f"scene={scene.name} n={n} nb={nb} window={window} R={R}")
    print(f"avg work counts over a {R}-step re-sort cycle: "
          + json.dumps({k: round(v, 1) for k, v in avg.items()}))
    if args.measured_overflow is not None:
        print(f"(overflow overridden to measured {ovf:.0f}; "
              f"replica predicted {avg['overflow']:.0f})")
    print(f"{'stage':<26}{'model ms':>10}")
    for k, v in st.items():
        print(f"{k:<26}{v:>10.3f}")
    print(f"{'TOTAL (model)':<26}{total:>10.3f}")
    if args.measured:
        print(
            f"measured {args.measured:.3f} ms/step: model residual "
            f"{100 * (total - args.measured) / args.measured:+.1f}%"
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "scene": scene.name, "n": n, "window": window,
                "resort_every": R, "avg_counts": avg,
                "overflow_used": ovf,
                "stages_ms": {k: round(v, 4) for k, v in st.items()},
                "total_model_ms": round(total, 3),
                "measured_ms": args.measured,
                "constants": {
                    "HBM_BW": HBM_BW, "GATHER_NS": GATHER_NS,
                    "RESCUE_SLOPE_MS_PER_K": RESCUE_SLOPE_MS_PER_K,
                    "GLUE_MS": GLUE_MS, "anchors": anchor,
                },
            }, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
