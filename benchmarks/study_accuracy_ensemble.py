"""Ensemble accuracy study: distribution of hybrid/exact and
screen/exact collision-count ratios over jittered-spawn episodes.

VERDICT r2 weak #3: the round-2 accuracy ladder rests on single
trajectories per config, so the claim "the hybrid/exact band 0.78-1.35x
is intrinsic chaos sensitivity" had no error bar.  This study runs
N jittered-spawn episodes per particle count (uniform per-axis spawn
perturbation of ``jitter * offset_xz``, deterministic per seed;
core/state.py::spawn_grid), computes each method's total collision
count over the full 2001-step episode (BenchmarkManager.cs:233-271 --
the reference's central experiment), and reports the ratio
distributions: mean, std, min/max, and whether the hybrid band
brackets 1.0.

Usage:
    python benchmarks/study_accuracy_ensemble.py --ks 2,3,4 --seeds 10
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def episode_collisions(scene, method, state, steps, camera_index=0):
    """Total collisions after a full episode from ``state``."""
    import jax.numpy as jnp

    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_method_step,
        make_sorted_episode_runner,
    )

    cfg = scene.config
    if method == "screen_space":
        step = make_method_step(scene, method, camera_index)
        for _ in range(steps):
            state = step(state)
        return int(jnp.sum(state.collisions))
    kw = {}
    if method == "hybrid":
        kw = dict(camera=scene.cameras[camera_index],
                  normals=getattr(scene, "corner_normals", None))
    run = make_sorted_episode_runner(
        scene.triangles, cfg, resort_every=8, cells_lookup="auto", **kw
    )
    state = run(state, steps)
    return int(jnp.sum(state.collisions))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="bunny")
    ap.add_argument("--ks", default="2,3,4")
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--jitter", type=float, default=0.05)
    ap.add_argument("--steps", type=int, default=2001)
    ap.add_argument("--camera", type=int, default=0)
    ap.add_argument(
        "--out", default=os.path.join(
            os.path.dirname(__file__), "artifacts", "ensemble_accuracy.json"
        )
    )
    args = ap.parse_args()

    from particlesystemhybridcollisiondetection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from particlesystemhybridcollisiondetection_tpu.core.state import spawn_grid
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import SCENES

    scene = SCENES[args.scene](width=480, height=270)
    rows = []
    for k in (int(x) for x in args.ks.split(",")):
        layers = 1 << k
        for seed in range(args.seeds):
            st0 = spawn_grid(
                scene.config, layers_y=layers,
                jitter=args.jitter, seed=seed,
            )
            t0 = time.time()
            totals = {}
            for method in ("spatial", "screen_space", "hybrid"):
                totals[method] = episode_collisions(
                    scene, method, st0, args.steps, args.camera
                )
            row = {
                "k": k,
                "n": int(st0.pos.shape[-1]),
                "seed": seed,
                "jitter": args.jitter,
                **totals,
                "hybrid_ratio": totals["hybrid"] / max(1, totals["spatial"]),
                "screen_ratio": (
                    totals["screen_space"] / max(1, totals["spatial"])
                ),
                "wall_s": round(time.time() - t0, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    # per-k aggregate
    agg = []
    for k in sorted({r["k"] for r in rows}):
        sub = [r for r in rows if r["k"] == k]
        for which in ("hybrid_ratio", "screen_ratio"):
            v = np.array([r[which] for r in sub])
            agg.append({
                "k": k, "ratio": which, "n_episodes": len(v),
                "mean": float(v.mean()),
                "std": float(v.std(ddof=1)) if len(v) > 1 else 0.0,
                "min": float(v.min()), "max": float(v.max()),
                "brackets_1": bool(v.min() <= 1.0 <= v.max()),
            })
    for a in agg:
        print(json.dumps(a), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"episodes": rows, "aggregate": agg,
                   "scene": scene.name, "camera": args.camera,
                   "steps": args.steps}, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
