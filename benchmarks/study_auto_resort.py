"""Overflow-triggered re-sort (resort_every="auto") vs static schedules.

Round 5: the static (window, resort_every) sweep bottomed out at
(2048, 16) = 8.90 ms settled; the auto trigger re-sorts exactly when
drifted overflow exceeds the post-sort baseline by resort_threshold,
so free-fall phases pay zero sorts and settled phases self-schedule.
This measures both regimes per (window, threshold) on the cached
settled snapshot + a fresh spawn.

Usage:
    python benchmarks/study_auto_resort.py --windows 1024,2048 \
        --thresholds 4096,8192,16384
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def time_spawn(scene, steps, **kw):
    import jax

    from particlesystemhybridcollisiondetection_tpu.core.state import spawn_grid
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_sorted_episode_runner,
    )
    from particlesystemhybridcollisiondetection_tpu.utils.profiling import (
        fence,
        rtt_ms,
    )

    run = make_sorted_episode_runner(scene.triangles, scene.config, **kw)
    st = spawn_grid(scene.config, layers_y=64)
    out = run(st, 17)  # compile + warm
    fence(out.pos)
    rtt = rtt_ms()
    t0 = time.time()
    out = run(st, steps)
    fence(out.pos)
    return ((time.time() - t0) * 1000 - rtt) / steps


def main() -> int:
    from particlesystemhybridcollisiondetection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="bunny")
    ap.add_argument("--layers", type=int, default=64)
    ap.add_argument("--settle-steps", type=int, default=700)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--spawn-steps", type=int, default=150)
    ap.add_argument("--plan", default="kernel")
    ap.add_argument("--windows", default="1024,2048")
    ap.add_argument("--thresholds", default="4096,8192,16384")
    ap.add_argument(
        "--cache", default=os.path.expanduser("~/.cache/psys_states")
    )
    args = ap.parse_args()

    from benchmarks.profile_rescue import settle, time_runner
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import SCENES

    scene = SCENES[args.scene](width=480, height=270)
    st = settle(scene, args.layers, args.settle_steps, args.cache)

    for window in [int(w) for w in args.windows.split(",")]:
        for thr in [int(t) for t in args.thresholds.split(",")]:
            kw = dict(cells_lookup=args.plan, window=window,
                      resort_every="auto", resort_threshold=thr)
            ms, ovf = time_runner(scene, st, args.steps, **kw)
            spawn_ms = time_spawn(scene, args.spawn_steps, **kw)
            print(json.dumps({
                "scene": scene.name, "plan": args.plan, "window": window,
                "resort_threshold": thr,
                "settled_ms": round(ms, 3),
                "spawn_ms": round(spawn_ms, 3),
                "overflow_p50": int(np.median(ovf)),
                "overflow_max": int(max(ovf)),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
