"""Work-count study: does grouping similar sublane rows into kernel
blocks cut the p2p kernel's block-max candidate inflation?

The 9-run p2p kernel's candidate while_loop runs ``k_cap[b, g] = max
over the block's 1024 particles of run length`` iterations per (block,
group), on all 8x128 lanes at once.  Blocks are 1024 CONSECUTIVE
Morton-sorted particles, so a block mixes dense-pile rows with sparse
surface rows and the max is paid by all.  Since every per-lane quantity
(rel, cnt) and per-sublane quantity (window start ws) travels with its
row, whole sublane rows (128 consecutive sorted particles) can be
permuted freely before blocking -- only k_cap changes.  This script
measures, on a REAL settled distribution, the iteration totals of:

  current : blocks = 8 consecutive sublane rows
  rowsort : rows sorted by per-row work key, then 8 consecutive
  ideal   : per-sublane bounds (the floor this trick approaches)

Usage:
  python benchmarks/study_p2p_rowsort.py --gen   # settle 1M on TPU, cache npz
  python benchmarks/study_p2p_rowsort.py         # analyze cached state (CPU ok)
"""

from __future__ import annotations

import argparse
import os

import numpy as np

CACHE = os.path.expanduser("~/.cache/psys_bake/settled_p2p_1m.npz")
N = 1_000_000
RADIUS = 0.4


def gen() -> None:
    from particlesystemhybridcollisiondetection_tpu.bench.configs import _box_state
    from particlesystemhybridcollisiondetection_tpu.config import SimConfig
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_p2p_episode_runner,
    )
    from particlesystemhybridcollisiondetection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    side = round(N ** (1 / 3) * 4 * RADIUS)
    box_lo, box_hi = (0.0, 0.0, 0.0), (side, side / 2, side)
    cfg = SimConfig(particle_radius=RADIUS, dt=0.005, bounciness=0.3)
    state = _box_state(N, box_lo, box_hi, RADIUS, 0.3)
    run = make_p2p_episode_runner(box_lo, box_hi, cfg, capacity=8, window=2048)
    state = run(state, 500)
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    np.savez_compressed(CACHE, pos=np.asarray(state.pos))
    print("cached", CACHE, "y-range", float(np.min(state.pos[1])),
          float(np.max(state.pos[1])))


def analyze() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from particlesystemhybridcollisiondetection_tpu.ops import pgrid as pg
    from particlesystemhybridcollisiondetection_tpu.ops.p2p_sorted import (
        _group_offsets,
    )

    pos = np.load(CACHE)["pos"]
    n = pos.shape[-1]
    cell = 2 * RADIUS
    lo = pos.min(axis=1) - 1e-3
    hi = pos.max(axis=1) + 1e-3
    dims = tuple(int(np.ceil((hi[i] - lo[i]) / cell)) for i in range(3))
    meta = pg.PGridMeta(origin=tuple(lo), cell_size=cell, dims=dims,
                        capacity=8)
    print("dims", dims, "occupancy", n / np.prod(dims))

    cx, cy, cz = (np.clip(((pos[i] - lo[i]) / cell).astype(np.int32), 0,
                          dims[i] - 1) for i in range(3))
    cid = (cx * dims[1] + cy) * dims[2] + cz
    order = np.argsort(cid, kind="stable")
    cid_s = cid[order]
    num_cells = int(np.prod(dims))
    counts = np.bincount(cid, minlength=num_cells + 1)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    LANE, SUB = 128, 8
    nb = (n + 1023) // 1024
    n_pad = nb * 1024
    cid_p = np.concatenate([cid_s, np.full(n_pad - n, num_cells - 1)])
    # per-particle run lengths for the 9 (dx,dy) groups
    dy, dz = dims[1], dims[2]
    cxs = cid_p // (dy * dz)
    cys = (cid_p // dz) % dy
    cnt = np.zeros((9, n_pad), np.int64)
    for g, (ox, oy, off) in enumerate(_group_offsets(meta)):
        q = np.clip(cid_p + off - 1, 0, num_cells - 1)
        q_end = np.clip(cid_p + off + 2, 0, num_cells)
        ok = ((cxs + ox >= 0) & (cxs + ox < dims[0])
              & (cys + oy >= 0) & (cys + oy < dy))
        c = offsets[q_end] - offsets[q]
        c[~ok] = 0
        c[n:] = 0
        cnt[g] = c

    rows = cnt.reshape(9, nb * SUB, LANE)
    row_max = rows.max(axis=2)  # [9, nb*SUB]
    useful = int(cnt.sum())

    def block_iters(rm):  # rm: [9, R] per-row maxima in some row order
        return int(rm.reshape(9, -1, SUB).max(axis=2).sum()) * SUB * LANE

    cur = block_iters(row_max)
    key = row_max.sum(axis=0)
    rs = np.argsort(key, kind="stable")
    srt = block_iters(row_max[:, rs])
    ideal = int(row_max.sum()) * LANE  # per-sublane bounds, 128 lanes each

    print(f"useful lane-candidates      {useful/1e6:8.1f} M")
    for name, tot in [("current (consecutive)", cur),
                      ("rowsort (key=sum of maxima)", srt),
                      ("ideal (per-sublane bounds)", ideal)]:
        print(f"{name:28s} {tot/1e6:8.1f} M lane-iters  "
              f"inflation {tot/useful:5.2f}x")
    print(f"rowsort speedup vs current: {cur/srt:.2f}x "
          f"(ideal would be {cur/ideal:.2f}x)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", action="store_true")
    a = ap.parse_args()
    gen() if a.gen else analyze()
