"""Root-cause study: why is the fori_loop-wrapped sorted step ~4.7x
slower than dispatching the jitted step from Python? (VERDICT r1 weak #7)

Measures, on the bunny benchmark scene at 128^2 * L particles:
  A. python-loop dispatch of the jitted sorted step (the harness path)
  B. one jitted lax.fori_loop over the same step body
  C. one jitted lax.scan over the step body (xs=None)
  D. fori_loop with donate_argnums on the outer jit
and prints per-step ms for each, plus the compiled-program stats XLA
reports (to see whether the loop body lost fusions or gained copies).

Usage: python benchmarks/study_fori_loop.py [--layers 16] [--steps 60]
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    sys.path.insert(0, ".")
    from particlesystemhybridcollisiondetection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from particlesystemhybridcollisiondetection_tpu.core.state import spawn_grid
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_spatial_step_sorted,
    )
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import bunny_scene
    from particlesystemhybridcollisiondetection_tpu.utils.profiling import fence

    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()

    scene = bunny_scene(width=480, height=270)
    state = spawn_grid(scene.config, layers_y=args.layers)
    step = make_spatial_step_sorted(scene.triangles, scene.config)

    def timed(label, fn, st, reps=3, clone=False):
        def inp():
            # donation deletes the input; hand each call its own copy
            return jax.tree.map(jnp.array, st) if clone else st

        out = fn(inp())  # compile + warm
        fence(out.pos)
        best = float("inf")
        for _ in range(reps):
            x = inp()
            fence(x.pos)
            t0 = time.perf_counter()
            out = fn(x)
            fence(out.pos)
            best = min(best, (time.perf_counter() - t0) * 1000.0 / args.steps)
        print(f"{label:42s} {best:8.3f} ms/step", flush=True)
        return best

    # A: python dispatch
    def py_loop(st):
        for _ in range(args.steps):
            st = step(st)
        return st

    # B: fori_loop
    @jax.jit
    def fori(st):
        return jax.lax.fori_loop(0, args.steps, lambda _, s: step(s), st)

    # C: scan
    @jax.jit
    def scan(st):
        out, _ = jax.lax.scan(lambda s, _: (step(s), None), st, None,
                              length=args.steps)
        return out

    # D: fori + donation
    @jax.jit
    def fori_d(st):
        return jax.lax.fori_loop(0, args.steps, lambda _, s: step(s), st)

    fori_don = jax.jit(fori_d.__wrapped__, donate_argnums=(0,))

    a = timed("A python-loop dispatch", py_loop, state)
    b = timed("B lax.fori_loop", fori, state)
    c = timed("C lax.scan", scan, state)
    d = timed("D fori_loop + donate_argnums", fori_don, state, clone=True)
    print(f"fori/python ratio: {b / a:.2f}x   scan/python: {c / a:.2f}x   "
          f"fori+donate/python: {d / a:.2f}x")

    # compiled-cost introspection: FLOP/bytes estimates per program
    try:
        lowered = jax.jit(lambda s: step(s)).lower(state)
        single = lowered.compile()
        loop = fori.lower(state).compile()
        for name, prog in (("single-step", single), ("fori-loop", loop)):
            ca = prog.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            if not ca:
                continue
            flops = ca.get("flops", float("nan"))
            bytes_ = ca.get("bytes accessed", float("nan"))
            print(f"{name}: flops={flops:.3e} bytes={bytes_:.3e} "
                  f"(per step: {flops / (args.steps if name == 'fori-loop' else 1):.3e} / "
                  f"{bytes_ / (args.steps if name == 'fori-loop' else 1):.3e})")
    except Exception as e:  # pragma: no cover
        print("cost_analysis unavailable:", e)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
