"""Viz + IO subsystem: PNG round-trip, renderer sanity, checkpointing,
grid report, CLI smoke."""

import os
import zlib

import numpy as np
import jax.numpy as jnp

from particlesystemhybridcollisiondetection_tpu.core.state import (
    ParticleState,
    spawn_grid,
)
from particlesystemhybridcollisiondetection_tpu.geometry import mesh as gmesh
from particlesystemhybridcollisiondetection_tpu.utils.io import (
    load_state,
    save_state,
    write_png,
)
from particlesystemhybridcollisiondetection_tpu.viz.camera_motion import (
    look_at,
    orbit_path,
)
from particlesystemhybridcollisiondetection_tpu.viz.render import (
    collision_colormap,
    render_state,
)


def _read_png_size(path):
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    import struct

    w, h = struct.unpack(">II", data[16:24])
    return w, h


def test_png_writer(tmp_path):
    img = np.zeros((32, 48, 3), dtype=np.uint8)
    img[4:10, 8:20] = [255, 0, 0]
    p = str(tmp_path / "t.png")
    write_png(p, img)
    assert _read_png_size(p) == (48, 32)


def test_checkpoint_roundtrip(tmp_path):
    from particlesystemhybridcollisiondetection_tpu.config import PRESETS

    state = spawn_grid(PRESETS["sample"], layers_y=2)
    p = str(tmp_path / "ckpt.npz")
    save_state(p, state)
    back = load_state(p, ParticleState)
    for a, b in zip(state, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_render_state_shows_particles(tmp_path):
    """A particle in front of the camera must change pixels vs the empty
    scene; one behind must not."""
    tris = gmesh.flatten_scene([(gmesh.unity_plane(), gmesh.Transform())])
    cam = look_at((0, 6, -12), (0, 0, 0), width=160, height=120)
    base = render_state(tris, np.zeros((0, 3)), 0.5, cam)
    front = render_state(tris, np.array([[0.0, 2.0, 0.0]]), 0.8, cam)
    behind = render_state(tris, np.array([[0.0, 2.0, -40.0]]), 0.8, cam)
    assert (front != base).any()
    assert (behind == base).all()
    write_png(str(tmp_path / "scene.png"), front)


def test_colormap_and_orbit():
    c = collision_colormap(np.array([0, 1, 5, 20]))
    assert c.shape == (4, 3) and c.dtype == np.uint8
    cams = orbit_path((0, 0, 0), radius=10, height=5, frames=8, width=64, height_px=64)
    assert len(cams) == 8
    # every orbit camera looks at the origin: forward ~ normalize(-pos)
    for cam in cams:
        fwd = cam.forward
        expect = -cam.position / np.linalg.norm(cam.position)
        np.testing.assert_allclose(fwd, expect, atol=1e-6)


def test_grid_report(tmp_path):
    from particlesystemhybridcollisiondetection_tpu.geometry.scenes import sample_scene
    from particlesystemhybridcollisiondetection_tpu.ops.grid import build_triangle_grid
    from particlesystemhybridcollisiondetection_tpu.viz.grid_viz import write_grid_report

    scene = sample_scene()
    grid, meta = build_triangle_grid(scene.triangles, scene.config.grid)
    paths = write_grid_report(grid, meta, str(tmp_path), name="sample")
    assert all(os.path.exists(p) for p in paths)
    stats = open([p for p in paths if p.endswith(".txt")][0]).read()
    assert "triangles: 1812" in stats


def test_cli_smoke(tmp_path):
    from particlesystemhybridcollisiondetection_tpu.cli import main

    rc = main(
        [
            "bench", "--scene", "sample", "--methods", "spatial",
            "--steps", "30", "--width", "96", "--height", "64",
            "--out", str(tmp_path),
        ]
    )
    assert rc == 0
    assert any(f.startswith("results_perf") for f in os.listdir(tmp_path))

    rc = main(
        [
            "p2pbox", "--particles", "128", "--steps", "50",
        ]
    )
    assert rc == 0
