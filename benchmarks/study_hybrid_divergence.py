"""Find the first step where the persistent hybrid runner diverges from
the per-step make_hybrid_step_sorted path on real hardware.

Motivation: the two paths are bitwise-equal in interpret mode (75 steps,
collision-rich) and on TPU over 60 free-fall steps, yet full-protocol
collision totals differ systematically (~10-30% lower for persistent).
If the step functions were bitwise-equal at EVERY state, totals would be
identical by induction -- so either some state class makes them differ
(bug), or compiled-program arithmetic differs (ulp chaos) once contacts
begin.  This script walks both paths in lockstep from spawn and reports
the first step with any difference, plus its magnitude and locus.

Usage: python benchmarks/study_hybrid_divergence.py [--layers 1]
       [--steps 2001] [--resort-every 8]
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    sys.path.insert(0, ".")
    from particlesystemhybridcollisiondetection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    import numpy as np

    from particlesystemhybridcollisiondetection_tpu.core.state import (
        active_mask,
        spawn_grid,
    )
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_hybrid_step_sorted,
        make_sorted_episode_runner,
    )
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import bunny_scene

    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--steps", type=int, default=2001)
    ap.add_argument("--resort-every", type=int, default=8)
    ap.add_argument("--camera", type=int, default=0)
    args = ap.parse_args()

    scene = bunny_scene()
    cam = scene.cameras[args.camera]
    nrm = getattr(scene, "corner_normals", None)
    state = spawn_grid(scene.config, layers_y=args.layers)
    mask = np.asarray(active_mask(state))

    step = make_hybrid_step_sorted(scene.triangles, scene.config, cam, nrm)
    run = make_sorted_episode_runner(
        scene.triangles, scene.config, resort_every=args.resort_every,
        camera=cam, normals=nrm,
    )

    chunk = args.resort_every  # one run() call = 1 sorted + (chunk-1) lazy

    def diff(a, b, where):
        ca = np.asarray(a.collisions)[mask]
        cb = np.asarray(b.collisions)[mask]
        pa = np.asarray(a.pos)[:, mask]
        pb = np.asarray(b.pos)[:, mask]
        if (ca == cb).all() and (pa == pb).all():
            return False
        pdiff = np.abs(pa - pb)
        print(
            f"{where}: DIVERGENCE  count-mismatch={int((ca != cb).sum())}  "
            f"pos-mismatch={int((pdiff.max(axis=0) > 0).sum())}  "
            f"max|dpos|={pdiff.max():.3e}  sum(a)={ca.sum()} sum(b)={cb.sum()}"
        )
        idx = np.where((pdiff.max(axis=0) > 0) | (ca != cb))[0][:5]
        for i in idx:
            print(
                f"  id {i}: ca={ca[i]} cb={cb[i]} pa={pa[:, i]} "
                f"pb={pb[:, i]} |d|={pdiff[:, i].max():.3e}"
            )
        return True

    a = b = state
    last_good = state
    for k0 in range(0, args.steps, chunk):
        for _ in range(chunk):
            a = step(a)
        b = run(b, chunk)
        if diff(a, b, f"steps {k0}..{k0 + chunk - 1}"):
            # phase 2: from the last good state, per-step lockstep with
            # the ALWAYS-SORTED persistent variant (run(s, 1) has i=0
            # every call).  If this stays equal while the chunked call
            # diverged, the lazy-step branch is the locus.
            print("-- phase 2: always-sorted persistent vs per-step "
                  "from the last good state --")
            a2 = b2 = last_good
            for j in range(chunk):
                a2 = step(a2)
                b2 = run(b2, 1)
                if diff(a2, b2, f"  sorted-only step {k0 + j}"):
                    print("=> the SORTED step itself diverges on TPU")
                    break
            else:
                print("=> sorted-only lockstep stayed bitwise-equal: the "
                      "divergence is specific to the LAZY (no-resort) "
                      "step branch as compiled for TPU")
            return 0
        last_good = b
        if k0 % (chunk * 12) == 0:
            print(
                f"steps {k0}..{k0 + chunk - 1}: identical "
                f"(collisions={int(np.asarray(a.collisions)[mask].sum())})",
                flush=True,
            )
    print(f"NO divergence over {args.steps} steps (chunk={chunk})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
