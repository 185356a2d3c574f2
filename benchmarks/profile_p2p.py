"""p2p window-kernel profiling: window-size sweep + step-vs-runner glue.

Measures, on real hardware, the full gravity-box step (collide + walls +
integrate) via ``make_p2p_step`` (kernel variant, per-step sort/unsort)
and ``make_p2p_episode_runner`` (persistent sorted order) across window
sizes.  Timing fences with a host readback and subtracts the tunnel RTT
(utils/profiling notes: block_until_ready returns early on the tunneled
backend).

Usage:
    python benchmarks/profile_p2p.py --n 50000 --steps 50 --windows 256 512
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
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--windows", type=int, nargs="+", default=[256, 512])
    ap.add_argument("--skip-step", action="store_true")
    ap.add_argument("--skip-runner", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from particlesystemhybridcollisiondetection_tpu.bench.configs import _box_state
    from particlesystemhybridcollisiondetection_tpu.config import SimConfig
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_p2p_episode_runner,
        make_p2p_step,
    )
    from particlesystemhybridcollisiondetection_tpu.ops import p2p_sorted as p2ps
    from particlesystemhybridcollisiondetection_tpu.utils.profiling import (
        fence,
        rtt_ms,
    )

    n = args.n
    side = round(n ** (1 / 3) * 4 * 0.4)
    box_lo, box_hi = (0.0, 0.0, 0.0), (side, side / 2, side)
    cfg = SimConfig(particle_radius=0.4, dt=0.005, bounciness=0.3)
    state = _box_state(n, box_lo, box_hi, 0.4, 0.3)
    rtt = rtt_ms()
    print(f"n={n} box={box_hi} rtt={rtt:.1f}ms", flush=True)

    for w in args.windows:
        if not args.skip_step:
            # per-step path: patch the default window through phase1
            step = make_p2p_step(
                box_lo, box_hi, cfg, capacity=8, variant="kernel",
                with_stats=True, window=w,
            )
            s = state
            s, st0 = step(s)
            fence(s.pos)
            t0 = time.time()
            for _ in range(args.steps):
                s, _ = step(s)
            fence(s.pos)
            ms = ((time.time() - t0) * 1000 - rtt) / args.steps
            print(json.dumps({
                "path": "step", "window": w, "ms_per_step": round(ms, 3),
                "psteps_per_sec": round(n / ms * 1000, 0),
                "overflow_first": int(st0["cell_overflow"]),
            }), flush=True)

        if not args.skip_runner:
            run = make_p2p_episode_runner(
                box_lo, box_hi, cfg, capacity=8, window=w
            )
            s = run(state, 1)  # compile
            fence(s.pos)
            t0 = time.time()
            s = run(s, args.steps)
            fence(s.pos)
            ms = ((time.time() - t0) * 1000 - rtt) / args.steps
            print(json.dumps({
                "path": "runner", "window": w, "ms_per_step": round(ms, 3),
                "psteps_per_sec": round(n / ms * 1000, 0),
                "contacts": int(np.asarray(s.collisions).sum()),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
