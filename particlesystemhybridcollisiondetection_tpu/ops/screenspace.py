"""Screen-space depth collision detection (device kernel).

TPU-native form of ScreenSpaceDepthCollisionDetection.compute:31-76 and its
hybrid variant (:87-143): project each particle through the camera, gather
depth (= camera distance) and world normal from the pre-pass textures, and
collide iff ``|eyeDist - depth| <= radius`` and the velocity points into the
surface.  The hybrid variant additionally produces the "undecided" set --
particles that are off-screen, behind the camera, or occluded
(``eyeDist > depth``) -- which the reference stream-compacts through an
atomic counter and indirect dispatch (:78-84, ComputeDispatchArgs.compute).
On TPU that whole mechanism is a boolean mask consumed by a masked second
stage: no atomics, no host sync, same capability.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from particlesystemhybridcollisiondetection_tpu.core import vec
from particlesystemhybridcollisiondetection_tpu.core.state import ParticleState
from particlesystemhybridcollisiondetection_tpu.geometry.camera import Camera
from particlesystemhybridcollisiondetection_tpu.ops.raster import (
    rasterize_depth_normal,
)


class CameraTextures(NamedTuple):
    """Device-side camera constants + pre-pass textures.

    Mirrors the uniforms bound at ParticleSys.cs:596-606 plus the
    depth/normal RenderTextures.
    """

    view: jnp.ndarray  # f32[4, 4] worldToCameraMatrix
    proj: jnp.ndarray  # f32[4, 4] projectionMatrix
    cam_pos: jnp.ndarray  # f32[3]
    cam_fwd: jnp.ndarray  # f32[3]
    depth: jnp.ndarray  # f32[H, W] camera-distance depth
    normal: jnp.ndarray  # f32[H, W, 3] world normals
    # depth + normal restacked as ONE planar [4, H*W] table (row 0 depth,
    # rows 1-3 normal xyz).  Layout is load-bearing on TPU: a multi-row
    # axis-1 gather from a jit argument takes XLA's fast vectorized path
    # (~0.04 ms per 1M indices on v5e), while the 1-D ``depth.reshape(-1)
    # [flat]`` form this replaces takes a ~9.5 ns/index scalar path
    # (measured; see BASELINE.md gather-layout notes).
    planar: jnp.ndarray  # f32[4, H*W]

    @property
    def screen_size(self) -> tuple[int, int]:
        return self.depth.shape  # (H, W)


_BAKE_CACHE: dict = {}

# Host rasterization is a per-triangle numpy loop: ~1 min for the 30k-tri
# bunny at 1080p on this 1-core host, ~10+ min for the 398k-tri dragon --
# per camera.  The in-process memo above only helps within one run, so
# bakes also persist to disk keyed by CONTENT (mesh/normal sha1 + camera
# params); a protocol sweep across many processes pays each (scene,
# camera) rasterization exactly once per machine.
_BAKE_DISK_DIR = os.environ.get(
    "PSYS_BAKE_CACHE", os.path.expanduser("~/.cache/psys_bake")
)


def _disk_key(tris: np.ndarray, corner_normals, cam: Camera) -> str:
    import hashlib

    h = hashlib.sha1()
    h.update(np.ascontiguousarray(tris, dtype=np.float32).tobytes())
    if corner_normals is not None:
        h.update(
            np.ascontiguousarray(corner_normals, dtype=np.float32).tobytes()
        )
    h.update(
        repr(
            (
                cam.name,
                cam.width,
                cam.height,
                np.asarray(cam.position).tolist(),
                np.asarray(cam.view_matrix()).tolist(),
                np.asarray(cam.projection_matrix()).tolist(),
            )
        ).encode()
    )
    return h.hexdigest()


def bake_camera(
    triangles: np.ndarray, cam: Camera, corner_normals: np.ndarray = None
) -> CameraTextures:
    """One-time pre-pass for a static scene + camera (the analog of
    DepthPrePass/NormalPrePass, run per frame in the reference but
    invariant here).  ``corner_normals`` enables the reference's smooth
    vertex-normal interpolation (NormalPrePass.shader:35-38).

    Memoized on (scene arrays' identity, camera): the host rasterization
    of a benchmark scene at 1080p costs ~a minute, and the protocol
    harness builds a step per (method, camera, run, particle-count) --
    80 bakes of the same 4 textures without the cache.
    """
    tris = np.asarray(triangles)
    key = (
        # id() alone can be reused after GC; shape + content checksum
        # guards against stale hits
        id(triangles),
        tris.shape,
        float(tris.sum()) if tris.size else 0.0,
        None if corner_normals is None else id(corner_normals),
        cam.name,
        cam.width,
        cam.height,
        tuple(np.asarray(cam.position).tolist()),
        tuple(tuple(r) for r in np.asarray(cam.view_matrix()).tolist()),
    )
    hit = _BAKE_CACHE.get(key)
    if hit is not None:
        return hit

    dkey = _disk_key(tris, corner_normals, cam)
    dpath = os.path.join(_BAKE_DISK_DIR, f"{dkey}.npz")
    depth = normal = None
    try:
        with np.load(dpath) as z:
            depth, normal = z["depth"], z["normal"]
    except (OSError, KeyError, ValueError):
        pass
    if depth is None:
        depth, normal = rasterize_depth_normal(triangles, cam, corner_normals)
        try:
            os.makedirs(_BAKE_DISK_DIR, exist_ok=True)
            tmp = f"{dpath}.{os.getpid()}.tmp.npz"  # savez wants .npz
            np.savez(tmp, depth=depth, normal=normal)
            os.replace(tmp, dpath)  # atomic vs concurrent bakers
        except OSError:
            pass
    planar = np.concatenate(
        [
            np.asarray(depth).reshape(1, -1),
            np.asarray(normal).reshape(-1, 3).T,
        ],
        axis=0,
    ).astype(np.float32)  # [4, H*W]
    tex = CameraTextures(
        view=jnp.asarray(cam.view_matrix(), dtype=jnp.float32),
        proj=jnp.asarray(cam.projection_matrix(), dtype=jnp.float32),
        cam_pos=jnp.asarray(cam.position, dtype=jnp.float32),
        cam_fwd=jnp.asarray(cam.forward, dtype=jnp.float32),
        depth=jnp.asarray(depth),
        normal=jnp.asarray(normal),
        planar=jnp.asarray(planar),
    )
    _BAKE_CACHE[key] = tex
    return tex


def screen_space_collide(
    state: ParticleState,
    tex: CameraTextures,
    gravity: jnp.ndarray,
    dt: float,
    *,
    hybrid: bool = False,
) -> tuple[ParticleState, jnp.ndarray]:
    """One collision pass.  Returns (new_state, undecided bool[N]).

    ``undecided`` is all-False unless ``hybrid``.
    """
    pos, velo = state.pos, state.vel
    h_px, w_px = tex.screen_size

    speed2 = vec.norm2(velo)
    moving = speed2 != 0.0  # compute:33 early-out

    # Projection (compute:39-47).
    view_pos = tex.view[:3, :3] @ pos + tex.view[:3, 3:4]  # [3, N] (w=1)
    view_w = tex.view[3, :3] @ pos + tex.view[3, 3]
    clip = tex.proj[:, :3] @ view_pos + tex.proj[:, 3:4] * view_w[None]
    ndc = clip[:3] / clip[3]
    sx = ndc[0] * 0.5 + 0.5
    sy = ndc[1] * 0.5 + 0.5

    inside = (sx >= 0.0) & (sx <= 1.0) & (sy >= 0.0) & (sy <= 1.0)
    to_particle = pos - tex.cam_pos[:, None]
    in_front = vec.dot(tex.cam_fwd[:, None], to_particle) > 0.0
    visible = inside & in_front

    # Texture gather at truncated pixel coords (compute:53-59).  HLSL
    # Load() out-of-bounds returns 0; clamping to the last texel only
    # differs on the measure-zero sx == 1.0 boundary.
    px = jnp.clip((sx * w_px).astype(jnp.int32), 0, w_px - 1)
    py = jnp.clip((sy * h_px).astype(jnp.int32), 0, h_px - 1)
    flat = py * w_px + px
    # ONE planar [4, H*W] axis-1 gather (fast vectorized path) instead of
    # a 1-D depth gather + a [H*W, 3] row gather (scalar path); see the
    # CameraTextures.planar field note.
    g = tex.planar[:, flat]  # [4, N]
    depth = g[0]
    normal = g[1:4]  # [3, N]

    eye_dist = vec.norm(to_particle)
    diff = jnp.abs(eye_dist - depth)
    into = vec.dot(normal, velo) < 0.0

    near_surface = diff <= state.radius
    collide = moving & visible & near_surface & into

    # Response (compute:65-69): vel' first, then pos += (vel' - vel)*dt.
    dirn = vec.normalize(velo)
    refl = vec.normalize(vec.reflect(dirn, normal))
    speed = jnp.sqrt(speed2)
    new_vel = refl * (state.restitution * speed)[None] - gravity[:, None] * dt
    new_pos = pos + new_vel * dt - velo * dt

    out = state._replace(
        pos=vec.where(collide, new_pos, pos),
        vel=vec.where(collide, new_vel, velo),
        collisions=state.collisions + collide.astype(jnp.int32),
    )

    if hybrid:
        # compute:105-142: undecided = off-screen/behind-camera, or
        # occluded beyond the depth surface.
        occluded = visible & ~near_surface & (eye_dist > depth)
        undecided = moving & (~visible | occluded)
    else:
        undecided = jnp.zeros_like(moving)
    return out, undecided
