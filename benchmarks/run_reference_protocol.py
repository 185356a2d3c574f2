"""Run the reference's FULL benchmark protocol.

Reproduces the Unity harness exactly (BenchmarkManager.cs + scene
constants): for each particle count 128^2 * 2^k, run
``runs x methods x cameras`` episodes of ``lifetime_steps`` steps,
writing the reference's CSV formats plus JSON summaries.

The full protocol (2001 steps x 4 cameras x 3 methods x 6 runs x 8
particle counts) is hours of wall-clock; this script exists so the
complete sweep is one command.  Use --quick for a sanity-scale pass.

Usage:
    python benchmarks/run_reference_protocol.py --scene bunny --out results
    python benchmarks/run_reference_protocol.py --quick
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    from particlesystemhybridcollisiondetection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="bunny",
                    choices=["sample", "bunny", "dragon", "dragons", "sphere"])
    ap.add_argument("--out", default="BenchmarkResults")
    ap.add_argument("--runs", type=int, default=6, help="reference: 6 (DragonScene.unity:1894)")
    ap.add_argument("--run-offset", type=int, default=0,
                    help="first run index; extend a committed 2-run ladder "
                    "to 6 with --run-offset 2 --runs 4 + merge_protocol.py")
    ap.add_argument("--steps", type=int, default=None, help="reference: lifetime_steps (2001)")
    ap.add_argument("--k-min", type=int, default=0, help="particle sweep 128^2 * 2^k (BenchmarkManager.cs:280-283)")
    ap.add_argument("--k-max", type=int, default=7)
    ap.add_argument(
        "--accuracy", action=argparse.BooleanOptionalAction, default=True,
        help="write per-particle results_acc CSVs (totals go into the "
        "JSON summary regardless; --no-accuracy keeps large-k artifacts "
        "committable -- the 262k CSV is already 13 MB gzipped)",
    )
    ap.add_argument("--quick", action="store_true", help="1 run, 300 steps, k in {0, 2}")
    ap.add_argument(
        "--methods", default="screen_space,spatial,hybrid",
        help="comma-separated subset (e.g. re-measure one method after a "
        "perf change; merge rows into the main artifact afterwards)",
    )
    ap.add_argument(
        "--plan", default="adaptive",
        help="cells-lookup execution plan: adaptive (default) | gather | "
        "kernel | auto (pinned plans are bit-deterministic run-to-run)",
    )
    ap.add_argument(
        "--spatial-all-cameras", action="store_true",
        help="run the camera-independent spatial method on all cameras "
        "(literal reference parity) instead of the documented dedup",
    )
    args = ap.parse_args()

    from particlesystemhybridcollisiondetection_tpu.bench.harness import run_benchmark
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import SCENES

    if args.quick:
        args.runs, args.steps = 1, 300
        ks = [0, 2]
    else:
        ks = list(range(args.k_min, args.k_max + 1))

    scene = SCENES[args.scene]()
    t0 = time.time()
    all_summaries = []
    for k in ks:
        layers = 1 << k
        n = scene.config.num_particles_xz**2 * layers
        print(f"=== {scene.name}: 2^{k} layers = {n} particles ===", flush=True)
        results = run_benchmark(
            scene,
            methods=tuple(args.methods.split(",")),
            layers_y=layers,
            num_steps=args.steps,
            num_runs=args.runs,
            out_dir=args.out,
            accuracy=args.accuracy,
            spatial_all_cameras=args.spatial_all_cameras,
            plan=args.plan,
            run_offset=args.run_offset,
        )
        for r in results:
            line = {
                "k": k,
                "method": r.method,
                "camera": r.camera,
                "run": r.run,
                "particles": r.num_particles,
                "mean_ms": round(r.mean_ms, 3),
                "particle_steps_per_sec": round(r.particle_steps_per_sec, 1),
                "collisions": int(r.collisions.sum()),
            }
            all_summaries.append(line)
            print(json.dumps(line), flush=True)
    # raw per-episode rows; run-variance moments + transport-noise
    # quarantine live in the harness-written aggregate_<scene>.json /
    # summary_<scene>.json next to this file (harness._write_aggregates)
    with open(f"{args.out}/protocol_{scene.name}.json", "w") as f:
        json.dump(all_summaries, f, indent=2)
    print(f"total wall: {time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
