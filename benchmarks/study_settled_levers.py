"""Settled-regime lever sweep: window x resort_every on the persistent
sorted runner (round 5, VERDICT r4 #3: settled 1M <= 8 ms).

The round-5 clean sweep found window=1024 free at spawn and winning
settled (BASELINE.md round-5 tables), but only tested resort_every=8.
The 512-window rows hinted LESS sorting wins once the window absorbs
drift (re=16 beat re=8 at w=512): the overflow rescue cost grows slower
with drift than the amortized 6.4 ms sort+permute shrinks.  This script
sweeps the full (window, resort_every) grid on the cached settled
snapshot so the production default is a measured corner, not a guess.

Usage:
    python benchmarks/study_settled_levers.py --scene bunny --layers 64 \
        --windows 1024,2048 --resorts 8,16,32
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


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
    ap.add_argument("--plan", default="kernel")
    ap.add_argument("--windows", default="1024,2048")
    ap.add_argument("--resorts", default="8,16,32")
    ap.add_argument(
        "--cache", default=os.path.expanduser("~/.cache/psys_states")
    )
    args = ap.parse_args()

    from benchmarks.profile_rescue import settle, time_runner
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import SCENES

    scene = SCENES[args.scene](width=480, height=270)
    st = settle(scene, args.layers, args.settle_steps, args.cache)

    for window in [int(w) for w in args.windows.split(",")]:
        for re in [int(r) for r in args.resorts.split(",")]:
            ms, ovf = time_runner(
                scene, st, args.steps, resort_every=re,
                cells_lookup=args.plan, window=window,
            )
            print(json.dumps({
                "scene": scene.name, "plan": args.plan, "window": window,
                "resort_every": re, "ms_per_step": round(ms, 3),
                "overflow_p50": int(np.median(ovf)),
                "overflow_max": int(max(ovf)),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
