"""Stage-level timing of the hybrid method at the config-3 scale.

Ranks where the hybrid step's time goes (screen-space stage vs sorted
spatial pipeline vs glue) the same way profile_sorted.py does for the
spatial method: each stage jitted in isolation (upper bounds -- isolated
stages lose fusion), plus the full fused step.

Usage: python benchmarks/profile_hybrid.py [--layers 16] [--steps 100]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)  # 128^2*16 = 262k
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--settle", type=int, default=520)
    args = ap.parse_args()

    from particlesystemhybridcollisiondetection_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from benchmarks.profile_sorted import timeit
    from particlesystemhybridcollisiondetection_tpu.core.state import spawn_grid
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_hybrid_step_sorted,
        make_screenspace_step,
        make_spatial_step_sorted,
    )
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import (
        bunny_scene,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.screenspace import (
        bake_camera,
        screen_space_collide,
    )

    scene = bunny_scene()
    cfg = scene.config
    cam = scene.cameras[0]
    state = spawn_grid(cfg, layers_y=args.layers, pad_multiple=1024)
    n = state.pos.shape[-1]
    print(f"n = {n}, camera = {cam.name} ({cam.width}x{cam.height})")

    hyb = make_hybrid_step_sorted(
        scene.triangles, cfg, cam, normals=scene.normals, with_stats=True
    )
    s = state
    for _ in range(args.settle):
        s, st = hyb(s)
    jax.block_until_ready(s.pos)
    print("settled-ish: overflow =", int(st["window_overflow"]),
          "collisions =", int(jnp.sum(s.collisions)))

    print(f"FULL hybrid step:  {timeit(lambda x: hyb(x)[0], s, steps=args.steps):6.2f} ms")

    spat = make_spatial_step_sorted(scene.triangles, cfg)
    print(f"FULL spatial step: {timeit(spat, s, steps=args.steps):6.2f} ms")

    scr = make_screenspace_step(scene.triangles, cfg, cam, normals=scene.normals)
    print(f"FULL screen step:  {timeit(scr, s, steps=args.steps):6.2f} ms")

    tex = bake_camera(scene.triangles, cam, scene.normals)
    gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)

    @jax.jit
    def stage_screen(s, tex):
        return screen_space_collide(s, tex, gravity, cfg.dt, hybrid=True)

    out = stage_screen(s, tex)
    und = int(jnp.sum(out[1]))
    print(f"screen stage only: {timeit(stage_screen, s, tex):6.2f} ms "
          f"(undecided {und}/{n})")


if __name__ == "__main__":
    main()
