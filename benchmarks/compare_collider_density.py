"""Quantify the dragon STAND-IN's broad-phase candidate density vs the
bunny (VERDICT r1 "what's missing" #6).

The reference's dragon.fbx blob is stripped from the mirror
(/root/reference/.MISSING_LARGE_BLOBS), so the DragonScene collider here
is a procedural 398k-tri ridged cube-sphere (geometry/mesh.py).  This
script shows the stand-in exercises the collision path AT OR ABOVE the
candidate densities the bunny-validated paths were tested at, so the
bunny-scene correctness evidence transfers.

Reported per scene (CPU-only, uses the scene's own GridConfig):

  * triangle-grid shape + occupancy (tris/cell over nonempty cells),
  * the per-particle CANDIDATE LOAD proxy: for every nonempty cell, the
    triangle count of its own cell (each particle reads exactly one cell
    of the pre-expanded grid -- ops/grid.py binning covers reach), i.e.
    the work distribution a settled particle draws from,
  * the packed pair-table row stats the sorted kernel actually consumes.

Usage: python benchmarks/compare_collider_density.py [--out docs/...]
"""

from __future__ import annotations

import argparse

import numpy as np


def scene_stats(name: str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import SCENES
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        build_triangle_grid,
    )

    scene = SCENES[name]()
    grid, meta = build_triangle_grid(scene.triangles, scene.config.grid)
    counts = np.diff(np.asarray(grid.offsets))
    nz = counts[counts > 0]
    q = lambda a, p: float(np.percentile(a, p)) if a.size else 0.0
    return {
        "scene": scene.name,
        "triangles": int(meta.num_triangles),
        "cell_size": float(meta.cell_size),
        "dims": tuple(int(d) for d in meta.dims),
        "pairs": int(meta.num_pairs),
        "nonempty_cells": int(nz.size),
        "occupancy_pct": 100.0 * nz.size / max(meta.num_cells, 1),
        "cand_mean": float(nz.mean()) if nz.size else 0.0,
        "cand_p50": q(nz, 50),
        "cand_p95": q(nz, 95),
        "cand_p99": q(nz, 99),
        "cand_max": int(nz.max()) if nz.size else 0,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="append a markdown table here")
    args = ap.parse_args()

    rows = [scene_stats(n) for n in ("bunny", "dragon", "dragons")]
    hdr = ["scene", "triangles", "cell_size", "nonempty_cells",
           "cand_mean", "cand_p50", "cand_p95", "cand_p99", "cand_max"]
    lines = ["| " + " | ".join(hdr) + " |",
             "|" + "---|" * len(hdr)]
    for r in rows:
        lines.append(
            "| " + " | ".join(
                f"{r[k]:.1f}" if isinstance(r[k], float) else str(r[k])
                for k in hdr
            ) + " |"
        )
    table = "\n".join(lines)
    print(table)
    if args.out:
        with open(args.out, "a") as f:
            f.write("\n" + table + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
