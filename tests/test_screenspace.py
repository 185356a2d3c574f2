"""Screen-space method: rasterizer sanity, kernel-vs-oracle parity, and
behavioral comparison against the exact spatial method."""

import numpy as np
import jax.numpy as jnp

from particlesystemhybridcollisiondetection_tpu.core.state import (
    ParticleState,
    spawn_grid,
    active_mask,
)
from particlesystemhybridcollisiondetection_tpu.core.step import (
    make_method_step,
)
from particlesystemhybridcollisiondetection_tpu.geometry import mesh as gmesh
from particlesystemhybridcollisiondetection_tpu.geometry.camera import Camera
from particlesystemhybridcollisiondetection_tpu.geometry.scenes import sample_scene
from particlesystemhybridcollisiondetection_tpu.ops.raster import (
    rasterize_depth_normal,
)
from particlesystemhybridcollisiondetection_tpu.ops.screenspace import (
    CameraTextures,
    bake_camera,
    screen_space_collide,
)

import reference_impl as ref
import pytest

F = np.float32


def _overhead_camera(h=128, w=128, y=10.0):
    """Looks straight down from (0, y, 0), like Main Camera (2)."""
    return Camera(
        gmesh.Transform(position=(0.0, y, 0.0), rotation=(0.7071068, 0.0, 0.0, 0.7071068)),
        width=w,
        height=h,
        name="overhead",
    )


def test_rasterizer_ground_plane_depth():
    """Looking straight down at a ground plane from height y: depth at the
    image center must be ~y; normals +Y; off-plane pixels background."""
    tris = gmesh.flatten_scene([(gmesh.unity_plane(), gmesh.Transform())])  # 10x10
    cam = _overhead_camera(y=10.0)
    depth, normal = rasterize_depth_normal(tris, cam)
    cy, cx = 64, 64
    # plane spans +-5; at fov 45 from height 10 the half-view is
    # 10*tan(22.5deg) ~= 4.14 < 5, so the whole image is covered
    assert depth[cy, cx] > 0
    np.testing.assert_allclose(depth[cy, cx], 10.0, rtol=1e-3)
    np.testing.assert_allclose(normal[cy, cx], [0, 1, 0], atol=1e-6)
    # corner pixels see the plane slightly farther away
    assert depth[2, 2] > depth[cy, cx]
    assert (depth > 0).all()


def test_rasterizer_occlusion():
    """A small high quad must occlude the ground beneath it."""
    quad = gmesh.TriangleMesh(
        np.array([[-1, 5.0, -1], [1, 5.0, -1], [1, 5.0, 1], [-1, 5.0, 1]], dtype=np.float64),
        np.array([[0, 2, 1], [0, 3, 2]], dtype=np.int64),
    )
    tris = gmesh.flatten_scene(
        [(gmesh.unity_plane(), gmesh.Transform()), (quad, gmesh.Transform())]
    )
    cam = _overhead_camera(y=10.0)
    depth, _ = rasterize_depth_normal(tris, cam)
    np.testing.assert_allclose(depth[64, 64], 5.0, rtol=1e-3)  # quad, not ground


def test_kernel_matches_scalar_oracle():
    """Randomized particles against a baked camera: the jitted kernel must
    reproduce the scalar HLSL transcription (hits, positions, undecided)."""
    rng = np.random.default_rng(7)
    tris = gmesh.flatten_scene(
        [(gmesh.unity_plane(), gmesh.Transform()), (gmesh.unity_cube(), gmesh.Transform())]
    )
    cam = _overhead_camera(y=10.0, h=96, w=160)
    tex = bake_camera(tris, cam)
    gravity = np.array([0, -9.81, 0], dtype=F)
    radius, bounce, dt = F(0.3), F(0.25), F(0.01)

    n = 128
    pos = rng.uniform(-6, 6, size=(n, 3)).astype(F)
    pos[:, 1] = rng.uniform(-1, 9, size=n)
    vel = rng.normal(size=(n, 3)).astype(F) * 12
    vel[0] = 0

    for hybrid in (False, True):
        ref_pos, ref_vel, ref_nc, ref_und = ref.screen_space_collide(
            pos, vel, radius, bounce, gravity, dt,
            np.asarray(tex.view), np.asarray(tex.proj),
            np.asarray(tex.cam_pos), np.asarray(tex.cam_fwd),
            np.asarray(tex.depth), np.asarray(tex.normal),
            hybrid=hybrid,
        )
        state = ParticleState(
            pos=jnp.asarray(pos.T),
            vel=jnp.asarray(vel.T),
            collisions=jnp.zeros((n,), dtype=jnp.int32),
            radius=jnp.full((n,), radius),
            restitution=jnp.full((n,), bounce),
        )
        out, und = screen_space_collide(
            state, tex, jnp.asarray(gravity), float(dt), hybrid=hybrid
        )
        np.testing.assert_array_equal(
            np.asarray(out.collisions), ref_nc, err_msg=f"hybrid={hybrid}"
        )
        np.testing.assert_array_equal(
            np.asarray(und), ref_und, err_msg=f"hybrid={hybrid}"
        )
        np.testing.assert_allclose(np.asarray(out.pos).T, ref_pos, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.vel).T, ref_vel, rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_methods_behavioral_comparison():
    """Run all three methods on the sample scene.  Screen-space sees only
    camera-visible geometry; spatial is exact; hybrid must track spatial
    closely (its fallback covers the blind spots)."""
    scene = sample_scene(width=256, height=256)
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1, pad_multiple=128)
    mask = np.asarray(active_mask(state))

    results = {}
    for method in ("screen_space", "spatial", "hybrid"):
        step = make_method_step(scene, method)
        s = state
        for _ in range(1600):
            s = step(s)
        results[method] = s

    nc = {m: int(np.asarray(s.collisions)[mask].sum()) for m, s in results.items()}
    # all methods detect collisions
    assert all(v > 0 for v in nc.values()), nc
    # hybrid should find at least as many collisions as screen-space alone
    # (it adds the exact fallback for undecided particles)
    assert nc["hybrid"] >= nc["screen_space"] * 0.9, nc
    # spatial ground-truth: hybrid within a sane band of it
    assert 0.3 * nc["spatial"] < nc["hybrid"] < 3.0 * nc["spatial"], nc
    # no tunneling for the exact methods
    for m in ("spatial", "hybrid"):
        ys = np.asarray(results[m].pos)[1][mask]
        assert ys.min() > -cfg.particle_radius, (m, ys.min())
