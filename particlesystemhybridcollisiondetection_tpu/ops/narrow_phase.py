"""Exact swept-sphere vs triangle narrow phase, dense and masked.

This is the TPU-native form of the reference's per-thread narrow phase
(SpatialStructureCollisionDetection.compute:41-233): a moving sphere of
radius r along the normalized velocity direction is tested against a
triangle as

  * 2 ray-vs-triangle tests against the triangle plane offset by +-r*n
    (compute:174-198),
  * 3 ray-vs-edge-cylinder tests of radius r (compute:200-211),
  * 3 ray-vs-vertex-sphere tests of radius r (compute:213-224),

keeping the nearest sub-hit by squared distance from the start position and
finally rejecting hits farther than the step's travel (compute:226-231).

Instead of one particle per thread with branches, everything here is a
dense masked computation over a ``[..., K]`` candidate axis: each particle
gets K candidate triangles (from the broad phase, or all triangles for the
brute-force path) and all 8 sub-tests are evaluated unconditionally on the
VPU.  Comparison chains use the reference's "keep previous unless strictly
nearer" semantics so NaN lanes (parallel rays, etc.) lose exactly as their
IEEE comparisons fail in HLSL.

Shapes
------
``p0, dirn``: [3, N]   particle segment start and unit direction
``v0, v1, v2``: [3, N, K] candidate triangle vertices (gathered)
``radius``: [N] per-particle radius (scalar broadcast upstream)

The selected nearest hit across candidates is reduced with an argmin on
squared distance, matching "global nearest" semantics.  (The reference's
BVH traversal breaks on the first *resolved leaf* in near-first order --
compute:351 -- which only approximates nearest; the dense reduction is
strictly no less accurate, and our CPU oracle defines the same nearest-hit
semantics so compiled vs oracle trajectories agree bit-for-bit.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from particlesystemhybridcollisiondetection_tpu.core import vec

_INF = float("inf")


def ray_triangle(p0, dirn, v0, v1, v2):
    """Ray vs single-sided-unbounded triangle (compute:67-101).

    Returns (hit, t): t is the *signed* ray parameter; the reference does
    not clamp t >= 0 here -- the final span check does the bounding.
    """
    v1v0 = v1 - v0
    v2v0 = v2 - v0
    rov0 = p0 - v0
    n = vec.cross(v1v0, v2v0)
    q = vec.cross(rov0, dirn)
    d = 1.0 / vec.dot(dirn, n)
    u = d * vec.dot(-q, v2v0)
    v = d * vec.dot(q, v1v0)
    t = d * vec.dot(-n, rov0)
    # HLSL: if (u < 0 || v < 0 || u+v > 1) -> miss.  NaN compares false, so
    # NaN u/v produce hit=True with t possibly NaN; the where-chains below
    # then reject the NaN distance, matching the reference exactly.
    miss = (u < 0.0) | (v < 0.0) | ((u + v) > 1.0)
    return ~miss, t


def ray_cylinder(p0, dirn, a, b, r):
    """Ray vs finite capped cylinder from a to b (compute:103-142).

    The body test follows the reference algebra.  The cap test deviates in
    *formulation* (not semantics): the reference's shortcut
    ``|k1 + k2*t| < h`` sits exactly on a 0/0 knife-edge when the ray is
    parallel to the cylinder axis (k1 = k2 = h = 0), and XLA's FMA
    contraction can tip it either way per compilation -- observed as
    spurious hits on triangles several units away when particles bounce
    exactly vertically against vertical edges.  We evaluate the cap
    geometrically (point-in-disk at the cap-plane crossing), which is
    equivalent in exact arithmetic and robust in float32: parallel rays
    never hit the cylinder, exactly as the reference's exact-arithmetic
    semantics dictate (vertex spheres and offset planes cover those
    contacts).
    """
    ba = b - a
    oc = p0 - a
    baba = vec.dot(ba, ba)
    bard = vec.dot(ba, dirn)
    baoc = vec.dot(ba, oc)
    k2 = baba - bard * bard
    k1 = baba * vec.dot(oc, dirn) - baoc * bard
    k0 = baba * vec.dot(oc, oc) - baoc * baoc - r * r * baba
    h = k1 * k1 - k2 * k0
    hs = jnp.sqrt(h)  # NaN when h < 0; all compares below then fail.
    t_body = (-k1 - hs) / k2
    y = baoc + t_body * bard
    body_hit = (y > 0.0) & (y < baba)
    t_cap = (jnp.where(y < 0.0, 0.0, baba) - baoc) / bard
    # Geometric cap containment: radial offset from the axis at the
    # crossing point must be inside the cap disk.
    yc = jnp.where(y < 0.0, 0.0, baba)
    q = oc + dirn * t_cap[None] - ba * (yc / baba)[None]
    cap_hit = (h >= 0.0) & (vec.dot(q, q) < r * r)
    hit = body_hit | cap_hit
    t = jnp.where(body_hit, t_body, t_cap)
    return hit, t


def ray_sphere(p0, dirn, c, r):
    """Ray vs sphere (compute:144-161).

    The reference returns true whenever the discriminant is >= 0, even for
    hits behind the origin; the span check handles bounding.
    """
    oc = c - p0
    proj = vec.dot(oc, dirn)
    disc = r * r - (vec.dot(oc, oc) - proj * proj)
    hit = disc >= 0.0
    t = proj - jnp.sqrt(disc)  # NaN when disc < 0 (masked by hit)
    return hit, t


def _keep_nearest(best_t2, best_t, hit, t):
    """Reference comparison: update iff hit and t^2 strictly < best^2.

    NaN t fails the comparison and keeps the previous best, mirroring the
    HLSL ``if (dot(cur,cur) < dot(prev,prev))`` chains (compute:181-224).
    """
    t2 = t * t
    take = hit & (t2 < best_t2)
    return (
        jnp.where(take, t2, best_t2),
        jnp.where(take, t, best_t),
    )


class TriangleHits(NamedTuple):
    """Per-candidate narrow phase result (before cross-candidate argmin)."""

    hit: jnp.ndarray  # bool[..., K]
    t: jnp.ndarray  # f32[..., K] signed nearest sub-hit parameter
    t2: jnp.ndarray  # f32[..., K] squared distance (inf where no usable hit)
    normal: jnp.ndarray  # f32[3, ..., K] triangle normal flipped against dirn


def particle_vs_triangles(p0, dirn, seg_len2, v0, v1, v2, radius) -> TriangleHits:
    """Swept sphere vs a batch of candidate triangles (candidates on the
    LAST axis: v0 is [3, N, K]).

    ``seg_len2``: [N] squared travel distance |vel*dt|^2 (compute:226-230).
    ``radius``: [N]; broadcast over the candidate axis.
    Mirrors ParticleTriangleIntersection (compute:163-233).

    NOTE on layouts: the trailing candidate axis is convenient but
    lane-hostile on TPU when K << 128 (the minor axis rides the 128-wide
    lanes).  The production path uses ``particle_vs_triangles_pre`` with a
    [3, G, N] layout instead; this wrapper stays for the oracle-shaped
    tests and the dense variant.
    """
    p0 = p0[..., None]  # [3, N, 1] -> broadcasts over K
    dirn = dirn[..., None]
    r = radius[..., None]  # [N, 1] -> broadcasts over K
    return particle_vs_triangles_pre(p0, dirn, seg_len2[..., None], v0, v1, v2, r)


def particle_vs_triangles_pre(p0, dirn, seg_len2, v0, v1, v2, r) -> TriangleHits:
    """Shape-agnostic core: all arguments pre-broadcast against the
    candidate vertex arrays (axis 0 = xyz for the vector args)."""
    # Triangle normal, oriented against the motion (compute:169-171).
    n = vec.normalize(vec.cross(v1 - v0, v2 - v0))
    n = vec.where(vec.dot(n, dirn) <= 0.0, n, -n)
    off = n * r[None]

    best_t2 = jnp.full(v0.shape[1:], _INF, dtype=p0.dtype)
    best_t = jnp.full(v0.shape[1:], _INF, dtype=p0.dtype)
    any_hit = jnp.zeros(v0.shape[1:], dtype=bool)

    # Offset triangle planes, both sides (compute:174-198).
    for sgn in (1.0, -1.0):
        hit, t = ray_triangle(p0, dirn, v0 + sgn * off, v1 + sgn * off, v2 + sgn * off)
        any_hit |= hit
        best_t2, best_t = _keep_nearest(best_t2, best_t, hit, t)

    # Edge cylinders (compute:200-211).
    verts = (v0, v1, v2)
    for i in range(3):
        hit, t = ray_cylinder(p0, dirn, verts[i], verts[(i + 1) % 3], r)
        any_hit |= hit
        best_t2, best_t = _keep_nearest(best_t2, best_t, hit, t)

    # Vertex spheres (compute:213-224).
    for i in range(3):
        hit, t = ray_sphere(p0, dirn, verts[i], r)
        any_hit |= hit
        best_t2, best_t = _keep_nearest(best_t2, best_t, hit, t)

    # Span check (compute:226-231): reject hits beyond this step's travel.
    # best_t2 stays +inf when only-NaN sub-hits occurred, so those reject
    # here exactly like the reference's FLOAT_MAX collision point does.
    hit = any_hit & (best_t2 <= seg_len2)
    t2 = jnp.where(hit, best_t2, _INF)
    return TriangleHits(hit=hit, t=best_t, t2=t2, normal=n)


class NearestHit(NamedTuple):
    hit: jnp.ndarray  # bool[N] any candidate hit
    t: jnp.ndarray  # f32[N] signed parameter of winning hit
    normal: jnp.ndarray  # f32[3, N] winning triangle normal (flipped)


def nearest_hit(hits: TriangleHits) -> NearestHit:
    """Cross-candidate reduction: nearest hit by squared distance."""
    k_best = jnp.argmin(hits.t2, axis=-1)
    take = jnp.take_along_axis
    t = take(hits.t, k_best[..., None], axis=-1)[..., 0]
    hit = take(hits.hit, k_best[..., None], axis=-1)[..., 0]
    normal = take(hits.normal, k_best[None, ..., None], axis=-1)[..., 0]
    return NearestHit(hit=hit, t=t, normal=normal)


def swept_collide_stream(
    p0,
    dirn,
    seg_len2,
    radius,
    gather_fn,
    num_candidates: int,
) -> NearestHit:
    """Streaming nearest-hit reduction over candidate slots.

    Identical semantics to ``particle_vs_triangles`` + ``nearest_hit`` but
    restructured for TPU memory behavior: instead of materializing
    ``[3, N, K]`` candidate tensors in HBM (which dominates step time at
    at scale), a ``fori_loop`` over the K candidate slots keeps everything
    at ``[N]`` shape -- each iteration is one fused elementwise kernel and
    the running (hit, t, t2, normal) accumulators are the only state.

    ``gather_fn(j) -> (v0, v1, v2, valid)`` supplies candidate slot j for
    every particle: verts ``[3, N]``, validity ``[N]``.

    The cross-candidate winner is the smallest squared distance with
    first-seen-wins tie-breaking, matching argmin over the dense t2 array.
    """
    import jax

    n = p0.shape[-1]
    dt_ = p0.dtype

    def body(j, acc):
        best_t2, best_t, best_n, any_hit = acc
        v0, v1, v2, valid = gather_fn(j)

        hits = particle_vs_triangles(
            p0, dirn, seg_len2, v0[..., None], v1[..., None], v2[..., None], radius
        )
        hit_j = hits.hit[..., 0] & valid
        t2_j = jnp.where(hit_j, hits.t2[..., 0], jnp.inf)
        t_j = hits.t[..., 0]
        n_j = hits.normal[..., 0]

        take = t2_j < best_t2  # strict: first-seen wins ties, like argmin
        return (
            jnp.where(take, t2_j, best_t2),
            jnp.where(take, t_j, best_t),
            vec.where(take, n_j, best_n),
            any_hit | hit_j,
        )

    init = (
        jnp.full((n,), _INF, dtype=dt_),
        jnp.full((n,), _INF, dtype=dt_),
        jnp.zeros((3, n), dtype=dt_),
        jnp.zeros((n,), dtype=bool),
    )
    best_t2, best_t, best_n, any_hit = jax.lax.fori_loop(
        0, num_candidates, body, init
    )
    return NearestHit(hit=any_hit & (best_t2 < _INF), t=best_t, normal=best_n)


def spatial_response(pos, vel, dirn, hit, t, normal, gravity, dt, radius,
                     restitution, backoff):
    """Collision response of the spatial method (compute:332-352).

    vel' = reflect(dir, n)*(bounce*|v|) - g*dt
    pos' = colPoint - dir*(backoff*r) + refl*(|end-colPoint|*bounce)

    The ``- g*dt`` term pre-compensates the integrator that runs right
    after collision detection each step (ParticleSys.cs:480-489).
    """
    col_point = pos + dirn * t[None]
    refl = vec.normalize(vec.reflect(dirn, normal))
    end_pos = pos + vel * dt
    col_to_end = vec.norm(end_pos - col_point)
    speed = vec.norm(vel)

    new_vel = refl * (restitution * speed)[None] - gravity[:, None] * dt
    new_pos = (
        col_point
        - dirn * (backoff * radius)[None]
        + refl * (col_to_end * restitution)[None]
    )
    return (
        vec.where(hit, new_pos, pos),
        vec.where(hit, new_vel, vel),
    )
