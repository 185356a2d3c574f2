"""Scalar NumPy oracle: a literal float32 transcription of the reference's
HLSL kernels, control flow and all.

This plays the role the BVH method plays in the reference's own validation
("ground truth" -- BenchmarkManager.cs:233-271): an independent, readable,
obviously-faithful implementation that the vectorized TPU kernels are tested
against.  It is deliberately slow (per-particle Python loops); use tiny
configurations.

Sources transcribed:
  * PSReactionUpdate.compute:13-29                      -> integrate()
  * SpatialStructureCollisionDetection.compute:41-233   -> intersection tests
  * SpatialStructureCollisionDetection.compute:308-352  -> leaf loop+response
    (flattened: all triangles are one leaf; nearest hit over all of them)
  * ScreenSpaceDepthCollisionDetection.compute:31-76    -> screen_space_collide()
"""

from __future__ import annotations

import numpy as np

F = np.float32
FLOAT_MAX = F(1.0e38)


def _f3(*xs):
    return np.array(xs, dtype=F)


def dot(a, b):
    return F(a[0] * b[0] + a[1] * b[1] + a[2] * b[2])


def cross(a, b):
    return _f3(
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def length(a):
    return F(np.sqrt(dot(a, a)))


def normalize(a):
    return (a / length(a)).astype(F)


def reflect(i, n):
    return (i - F(2.0) * dot(i, n) * n).astype(F)


def ray_triangle(ro, rd, v0, v1, v2):
    v1v0 = v1 - v0
    v2v0 = v2 - v0
    rov0 = ro - v0
    n = cross(v1v0, v2v0)
    q = cross(rov0, rd)
    d = F(1.0) / dot(rd, n)
    u = F(d * dot(-q, v2v0))
    v = F(d * dot(q, v1v0))
    t = F(d * dot(-n, rov0))
    if u < 0.0 or v < 0.0 or (u + v) > 1.0:
        return False, np.full(3, FLOAT_MAX, dtype=F)
    return True, (ro + t * rd).astype(F)


def ray_cylinder(ro, rd, a, b, r):
    ba = b - a
    oc = ro - a
    baba = dot(ba, ba)
    bard = dot(ba, rd)
    baoc = dot(ba, oc)
    k2 = F(baba - bard * bard)
    k1 = F(baba * dot(oc, rd) - baoc * bard)
    k0 = F(baba * dot(oc, oc) - baoc * baoc - r * r * baba)
    h = F(k1 * k1 - k2 * k0)
    if h < 0.0:
        return False, np.full(3, FLOAT_MAX, dtype=F)
    h = F(np.sqrt(h))
    t = F((-k1 - h) / k2)
    y = F(baoc + t * bard)
    if y > 0.0 and y < baba:
        return True, (ro + t * rd).astype(F)
    t = F(((F(0.0) if y < 0.0 else baba) - baoc) / bard)
    if abs(F(k1 + k2 * t)) < h:
        return True, (ro + t * rd).astype(F)
    return False, np.full(3, FLOAT_MAX, dtype=F)


def ray_sphere(ro, rd, c, r):
    rts = c - ro
    into = dot(rts, rd)
    disc = F(r * r - (dot(rts, rts) - into * into))
    if disc < 0.0:
        return False, np.full(3, FLOAT_MAX, dtype=F)
    d = F(np.sqrt(disc))
    return True, (ro + (into - d) * rd).astype(F)


def particle_triangle(p0, p_end, rd, tri, radius):
    """ParticleTriangleIntersection (compute:163-233)."""
    intersected = False
    col = np.full(3, FLOAT_MAX, dtype=F)

    tn = normalize(cross(tri[1] - tri[0], tri[2] - tri[0]))
    if dot(tn, rd) > 0.0:
        tn = -tn
    off = (tn * F(radius)).astype(F)

    def consider(hit, point, col):
        if hit:
            d_cur = point - p0  # note: reference computes p0 - point; same norm
            d_prev = col - p0
            if dot(d_cur, d_cur) < dot(d_prev, d_prev):
                return point
        return col

    hit, pt = ray_triangle(p0, rd, tri[0] + off, tri[1] + off, tri[2] + off)
    intersected |= hit
    col = consider(hit, pt, col)
    hit, pt = ray_triangle(p0, rd, tri[0] - off, tri[1] - off, tri[2] - off)
    intersected |= hit
    col = consider(hit, pt, col)
    for i in range(3):
        hit, pt = ray_cylinder(p0, rd, tri[i], tri[(i + 1) % 3], F(radius))
        intersected |= hit
        col = consider(hit, pt, col)
    for i in range(3):
        hit, pt = ray_sphere(p0, rd, tri[i], F(radius))
        intersected |= hit
        col = consider(hit, pt, col)

    dcol = p0 - col
    dend = p0 - p_end
    if dot(dcol, dcol) > dot(dend, dend):
        intersected = False
    return intersected, col


def spatial_collide(pos, vel, radius, bounciness, gravity, dt, triangles,
                    backoff=F(0.0015)):
    """Nearest-hit spatial collision over all triangles + response
    (compute:308-352), for every particle.  Arrays are [N, 3] here (the
    oracle keeps the reference's AoS view)."""
    pos = pos.astype(F).copy()
    vel = vel.astype(F).copy()
    g = np.asarray(gravity, dtype=F)
    n_collisions = np.zeros(len(pos), dtype=np.int64)
    for i in range(len(pos)):
        v = vel[i]
        if dot(v, v) == 0.0:
            continue
        p0 = pos[i]
        p_end = (p0 + v * F(dt)).astype(F)
        rd = normalize(v)
        best = np.full(3, FLOAT_MAX, dtype=F)
        best_tri = None
        for tri in triangles:
            tri = tri.astype(F)
            hit, pt = particle_triangle(p0, p_end, rd, tri, radius)
            if hit:
                d_cur = p0 - pt
                d_prev = p0 - best
                if dot(d_cur, d_cur) < dot(d_prev, d_prev):
                    best = pt
                    best_tri = tri
        if best_tri is not None:
            tn = normalize(cross(best_tri[1] - best_tri[0], best_tri[2] - best_tri[0]))
            if dot(tn, rd) > 0.0:
                tn = -tn
            refl = normalize(reflect(rd, tn))
            col_to_end = length(p_end - best)
            vel[i] = (refl * (F(bounciness) * length(v)) - g * F(dt)).astype(F)
            pos[i] = (
                best - rd * (F(backoff) * F(radius)) + refl * (col_to_end * F(bounciness))
            ).astype(F)
            n_collisions[i] += 1
    return pos, vel, n_collisions


def integrate(pos, vel, gravity, dt):
    """PSReactionUpdate.compute:18-19."""
    g = np.asarray(gravity, dtype=F)
    vel = (vel.astype(F) + g * F(dt)).astype(F)
    pos = (pos.astype(F) + vel * F(dt)).astype(F)
    return pos, vel


def run_episode(pos, vel, radius, bounciness, gravity, dt, triangles, steps,
                record_every=0):
    """collision -> integrate, per step (ParticleSys.Update order)."""
    history = []
    total_collisions = np.zeros(len(pos), dtype=np.int64)
    for s in range(steps):
        pos, vel, nc = spatial_collide(
            pos, vel, radius, bounciness, gravity, dt, triangles
        )
        total_collisions += nc
        pos, vel = integrate(pos, vel, gravity, dt)
        if record_every and (s + 1) % record_every == 0:
            history.append(pos.copy())
    return pos, vel, total_collisions, history


def screen_space_collide(pos, vel, radius, bounciness, gravity, dt,
                         view, proj, cam_pos, cam_fwd, depth, normal_tex,
                         hybrid=False):
    """ScreenSpaceDepthCollisionDetection (compute:31-76) and its Hybrid
    variant (compute:87-143).  depth: f32[H, W]; normal_tex: f32[H, W, 3].
    Returns (pos, vel, collisions, undecided)."""
    H, W = depth.shape
    pos = pos.astype(F).copy()
    vel = vel.astype(F).copy()
    g = np.asarray(gravity, dtype=F)
    view = view.astype(F)
    proj = proj.astype(F)
    cam_pos = np.asarray(cam_pos, dtype=F)
    cam_fwd = np.asarray(cam_fwd, dtype=F)
    n_collisions = np.zeros(len(pos), dtype=np.int64)
    undecided = np.zeros(len(pos), dtype=bool)
    for i in range(len(pos)):
        v = vel[i]
        if dot(v, v) == 0.0:
            continue
        p = pos[i]
        vp = view @ np.append(p, F(1.0))
        cp = proj @ vp
        ndc = (cp[:3] / cp[3]).astype(F)
        sx = F(ndc[0] * F(0.5) + F(0.5))
        sy = F(ndc[1] * F(0.5) + F(0.5))
        inside = 0.0 <= sx <= 1.0 and 0.0 <= sy <= 1.0
        if inside and dot(cam_fwd, p - cam_pos) > 0.0:
            px = int(sx * W)
            py = int(sy * H)
            px = min(px, W - 1)  # texture Load clamps like RWTexture2D OOB
            py = min(py, H - 1)
            d = F(depth[py, px])
            eye_dist = length(p - cam_pos)
            diff = abs(F(eye_dist - d))
            sn = normal_tex[py, px].astype(F)
            into = dot(sn, v) < 0.0
            if diff <= radius:
                if into:
                    rd = normalize(v)
                    refl = normalize(reflect(rd, sn))
                    vel[i] = (refl * (F(bounciness) * length(v)) - g * F(dt)).astype(F)
                    pos[i] = (pos[i] + vel[i] * F(dt) - v * F(dt)).astype(F)
                    n_collisions[i] += 1
            elif hybrid and eye_dist > d:
                undecided[i] = True
        elif hybrid:
            undecided[i] = True
    return pos, vel, n_collisions, undecided
