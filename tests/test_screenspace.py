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


def test_rasterizer_interpolated_vertex_normals():
    """With per-corner normals the pre-pass reproduces the reference's
    smooth shading (NormalPrePass.shader:35-38): on a coarse UV-sphere the
    interpolated normal at each covered pixel must be much closer to the
    analytic sphere normal than the face normal is."""
    sphere = gmesh.uv_sphere(radius=2.0, rings=10, sectors=14)
    # analytic smooth normals: unit radial directions per corner
    inst = [(sphere.with_smooth_normals(), gmesh.Transform(position=(0, 5.0, 0)))]
    tris = gmesh.flatten_scene(inst)
    cnorms = gmesh.flatten_scene_normals(inst)
    assert cnorms.shape == tris.shape
    cam = _overhead_camera(y=12.0)
    depth_f, n_flat = rasterize_depth_normal(tris, cam)
    depth_s, n_smooth = rasterize_depth_normal(tris, cam, cnorms)
    np.testing.assert_array_equal(depth_f, depth_s)  # depth path untouched

    # analytic comparison on covered pixels: reconstruct the surface point
    # from (pixel ray, depth) and compare against (p - center)/|p - center|
    cov = np.argwhere(depth_f > 0)
    assert len(cov) > 200
    h_px, w_px = depth_f.shape
    inv_view = np.linalg.inv(cam.view_matrix())
    inv_proj = np.linalg.inv(cam.projection_matrix())
    ys, xs = cov[:, 0] + 0.5, cov[:, 1] + 0.5
    ndc = np.stack(
        [xs / w_px * 2 - 1, ys / h_px * 2 - 1, np.zeros_like(xs), np.ones_like(xs)], 1
    )
    vpos = ndc @ inv_proj.T
    vpos = vpos[:, :3] / vpos[:, 3:]
    wdir = (vpos / np.linalg.norm(vpos, axis=1, keepdims=True)) @ inv_view[:3, :3].T
    p = np.asarray(cam.position) + wdir * depth_f[cov[:, 0], cov[:, 1], None]
    n_true = p - np.array([0, 5.0, 0])
    n_true /= np.linalg.norm(n_true, axis=1, keepdims=True)

    err_flat = np.linalg.norm(n_flat[cov[:, 0], cov[:, 1]] - n_true, axis=1)
    err_smooth = np.linalg.norm(n_smooth[cov[:, 0], cov[:, 1]] - n_true, axis=1)
    # smooth must be a big accuracy win on a curved surface (the residual
    # error is chord-vs-sphere: depth reconstructs a point on the coarse
    # mesh, not the analytic sphere)
    assert err_smooth.mean() < 0.5 * err_flat.mean()
    assert np.abs(np.linalg.norm(n_smooth[cov[:, 0], cov[:, 1]], axis=1) - 1).max() < 1e-5


def test_flat_meshes_normals_unchanged():
    """Planes/cubes have no authored normals: flatten_scene_normals falls
    back to face normals and the baked textures are bit-identical."""
    inst = [(gmesh.unity_plane(), gmesh.Transform())]
    tris = gmesh.flatten_scene(inst)
    cnorms = gmesh.flatten_scene_normals(inst)
    cam = _overhead_camera(y=10.0)
    d0, n0 = rasterize_depth_normal(tris, cam)
    d1, n1 = rasterize_depth_normal(tris, cam, cnorms)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_allclose(n0, n1, atol=1e-6)


def test_bake_disk_cache_roundtrip(tmp_path, monkeypatch):
    """A second bake of the same (mesh, camera) must come from disk and be
    bit-identical, including the planar [4, H*W] table layout."""
    from particlesystemhybridcollisiondetection_tpu.ops import screenspace as ss

    monkeypatch.setattr(ss, "_BAKE_DISK_DIR", str(tmp_path))
    scene = sample_scene(width=96, height=54)
    cam = scene.cameras[0]

    ss._BAKE_CACHE.clear()
    tex1 = ss.bake_camera(scene.triangles, cam)
    files = list(tmp_path.iterdir())
    assert len(files) == 1 and files[0].suffix == ".npz"

    ss._BAKE_CACHE.clear()  # force the disk path
    tex2 = ss.bake_camera(scene.triangles, cam)
    np.testing.assert_array_equal(np.asarray(tex1.depth), np.asarray(tex2.depth))
    np.testing.assert_array_equal(np.asarray(tex1.normal), np.asarray(tex2.normal))
    np.testing.assert_array_equal(np.asarray(tex1.planar), np.asarray(tex2.planar))

    pl = np.asarray(tex1.planar)
    assert pl.shape == (4, 96 * 54)
    np.testing.assert_array_equal(pl[0], np.asarray(tex1.depth).reshape(-1))
    np.testing.assert_array_equal(
        pl[1:4], np.asarray(tex1.normal).reshape(-1, 3).T
    )
    ss._BAKE_CACHE.clear()


def test_sphere_scene_preset():
    """SphereScene parity constants (SphereScene.unity): default
    ParticleSys params, origin spawn, 16x sphere + 2x plane."""
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import (
        sphere_scene,
    )

    sc = sphere_scene(width=64, height=36)
    assert sc.config.particle_radius == 2.0
    assert sc.config.dt == 0.01
    assert sc.config.bounciness == 0.25
    assert sc.config.spawn_origin == (0.0, 0.0, 0.0)
    tris = sc.triangles
    assert np.isfinite(tris).all()
    # sphere verts reach +-8 (0.5 radius x 16 scale); plane spans +-10
    assert 7.5 < np.abs(tris).max() <= 10.01
    assert len(sc.cameras) == 1
