"""Grid-parameter sweep: can a (cell_size, expand) choice bring every
dragon cell under the 8-bit code-table count bound?

VERDICT r3 #2: the dragon's settled tax comes from dense cells (max 492
tris at the default h=8, e=4), which (a) disable the in-kernel coded
cells lookup (max_tris_per_cell >= 255 gate, core/step._maybe_code_table),
(b) force demote=192 rescue routing, and (c) inflate the per-sublane pair
windows.  Per-cell count scales ~ (h + 2e)^3 while total pairs scale
~ ((t + 2e)/h + 1)^3 per triangle, so SHRINKING BOTH knobs trades pair
count against cell density.  Constraints:

  * expand >= particle_radius + max_travel/2 under the midpoint lookup
    (ops.grid.lookup_pos; round 3 used a p-anchored lookup needing the
    full r + max_travel).  The sound travel bound is NOT the y=525 free
    fall: upper spawn layers start as high as y=2557 at k=7.  Particles
    spawn at rest and restitution 0.25 only slows them, so within a
    2001-step episode speed <= g*T = 9.81*20.01 = 196.3 -> travel <=
    1.963 -> expand >= 2 + 0.982 = 2.982; presets use 3.1 for margin.
  * pairs < 2^24 (24-bit packed start, window_kernel.build_code_table)
  * max cell count < 255 is a soft PERF preference, not a gate: counts
    saturate to the 255 miss sentinel and those lanes route to the
    rescue pass every step (round 4 removed the hard gate from
    _maybe_code_table) -- dense cells cost rescue time, not correctness
  * max(dims) <= 1024 (10-bit Morton range)

Host-side only (native C++ binner); run anywhere:
    python benchmarks/study_grid_params.py --scene dragon
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--cells", nargs="*", type=float,
                    default=[8.0, 6.0, 5.0, 4.0])
    ap.add_argument("--expands", nargs="*", type=float,
                    default=[3.1])
    args = ap.parse_args()

    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import (
        SCENES,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        build_triangle_grid,
    )

    scene = SCENES[args.scene](width=480, height=270)
    base = scene.config.grid
    print(f"scene={scene.name} tris={len(scene.triangles)}")
    print(f"{'h':>5} {'e':>5} {'pairs':>10} {'<2^24':>6} {'maxcnt':>7} "
          f"{'<255':>5} {'p99cnt':>7} {'dims':>18} {'win':>5} {'build_s':>8}")
    for h in args.cells:
        for e in args.expands:
            cfg = dataclasses.replace(base, cell_size=h, expand=e)
            t0 = time.time()
            grid, meta = build_triangle_grid(scene.triangles, cfg)
            dt_build = time.time() - t0
            offsets = np.asarray(grid.offsets)
            counts = np.diff(offsets)
            occ = counts[counts > 0]
            k_max = int(counts.max())
            want = ((k_max + 127) // 128) * 128 + 128
            win = max(256, min(2048, want))
            print(f"{h:5.1f} {e:5.1f} {meta.num_pairs:10d} "
                  f"{str(meta.num_pairs < (1 << 24)):>6} {k_max:7d} "
                  f"{str(k_max < 255):>5} "
                  f"{int(np.percentile(occ, 99)) if len(occ) else 0:7d} "
                  f"{str(meta.dims):>18} {win:5d} {dt_build:8.2f}")


if __name__ == "__main__":
    main()
