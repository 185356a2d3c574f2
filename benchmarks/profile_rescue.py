"""Measure the round-3 kernel-rescue fallback on real settled states.

Round-2 findings this targets (VERDICT r2):
  * settled bunny 1M cost 11.9 ms/step vs the 5.4 ms spawn headline --
    the packed-XLA fallback's cost concentrated in a few dense chunks;
  * dragon settled episodes cost ~0.1 s/step at 524k (dense 492-tri
    cells defeat the coded plan and saturate the fallback), which
    bounded the k=6..7 protocol out of the budget.

This script settles each scene once (snapshot cached on disk), then
times the persistent runner through the settled regime per plan and
demote setting, printing JSON lines.

Usage:
    python benchmarks/profile_rescue.py --scene bunny --layers 64
    python benchmarks/profile_rescue.py --scene dragon --layers 32
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def settle(scene, layers, steps, cache_dir):
    """Settled state snapshot, cached on disk (settling the dragon at
    524k costs minutes; every measurement below reuses one snapshot)."""
    import jax.numpy as jnp

    from particlesystemhybridcollisiondetection_tpu.core.state import (
        ParticleState,
        spawn_grid,
    )
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_sorted_episode_runner,
    )

    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(
        cache_dir, f"{scene.name}_L{layers}_s{steps}.npz"
    )
    if os.path.exists(path):
        z = np.load(path)
        return ParticleState(
            pos=jnp.asarray(z["pos"]),
            vel=jnp.asarray(z["vel"]),
            collisions=jnp.asarray(z["collisions"]),
            radius=jnp.asarray(z["radius"]),
            restitution=jnp.asarray(z["restitution"]),
        )
    run = make_sorted_episode_runner(
        scene.triangles, scene.config, resort_every=8, cells_lookup="gather"
    )
    st = spawn_grid(scene.config, layers_y=layers)
    t0 = time.time()
    st = run(st, steps)
    st.pos.block_until_ready()
    print(f"[settle] {steps} steps in {time.time() - t0:.0f}s", flush=True)
    np.savez(
        path,
        pos=np.asarray(st.pos),
        vel=np.asarray(st.vel),
        collisions=np.asarray(st.collisions),
        radius=np.asarray(st.radius),
        restitution=np.asarray(st.restitution),
    )
    return st


def time_runner(scene, st, steps, **kw):
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_sorted_episode_runner,
    )
    from particlesystemhybridcollisiondetection_tpu.utils.profiling import (
        fence,
        rtt_ms,
    )

    run = make_sorted_episode_runner(scene.triangles, scene.config, **kw)
    out = run(st, 16)  # compile + warm both step variants
    fence(out.pos)
    rtt = rtt_ms()
    t0 = time.time()
    out, overflows = run(st, steps, with_stats=True)
    fence(out.pos)
    ms = ((time.time() - t0) * 1000 - rtt) / steps
    ovf = [int(o) for o in overflows]
    return ms, ovf


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
    ap.add_argument("--plans", default="gather,kernel")
    ap.add_argument("--demotes", default="none,auto")
    ap.add_argument(
        "--cache", default=os.path.expanduser("~/.cache/psys_states")
    )
    args = ap.parse_args()

    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import SCENES

    scene = SCENES[args.scene](width=480, height=270)
    st = settle(scene, args.layers, args.settle_steps, args.cache)
    n = st.pos.shape[-1]

    for plan in args.plans.split(","):
        for demote in args.demotes.split(","):
            dm = None if demote == "none" else (
                "auto" if demote == "auto" else int(demote)
            )
            try:
                ms, ovf = time_runner(
                    scene, st, args.steps, resort_every=8,
                    cells_lookup=plan, dense_demote=dm,
                )
            except AssertionError as e:  # e.g. no code table for this grid
                print(json.dumps({
                    "scene": scene.name, "plan": plan, "demote": demote,
                    "skipped": str(e)[:120],
                }), flush=True)
                continue
            print(json.dumps({
                "scene": scene.name, "n": n, "plan": plan,
                "demote": demote, "ms_per_step": round(ms, 3),
                "overflow_p50": int(np.median(ovf)),
                "overflow_max": int(max(ovf)),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
