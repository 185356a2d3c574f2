"""Native tier: C++ grid binning parity with NumPy, and the C++ sphere-BVH
oracle agreeing with the JAX grid narrow phase."""

import numpy as np
import jax.numpy as jnp
import pytest

from particlesystemhybridcollisiondetection_tpu import native
from particlesystemhybridcollisiondetection_tpu.core import vec
from particlesystemhybridcollisiondetection_tpu.geometry.scenes import sample_scene
from particlesystemhybridcollisiondetection_tpu.ops import narrow_phase as nph
from particlesystemhybridcollisiondetection_tpu.ops.grid import (
    build_triangle_grid,
    gather_candidates,
)

needs_native = pytest.mark.skipif(not native.available(), reason="no g++/native lib")


@needs_native
def test_native_grid_matches_numpy():
    scene = sample_scene()
    g_np, m_np = build_triangle_grid(scene.triangles, scene.config.grid, use_native=False)
    g_cc, m_cc = build_triangle_grid(scene.triangles, scene.config.grid, use_native=True)
    assert m_np.dims == m_cc.dims
    np.testing.assert_allclose(m_np.origin, m_cc.origin, rtol=1e-12)
    assert m_np.num_pairs == m_cc.num_pairs
    assert m_np.max_tris_per_cell == m_cc.max_tris_per_cell
    np.testing.assert_array_equal(np.asarray(g_np.offsets), np.asarray(g_cc.offsets))
    np.testing.assert_array_equal(np.asarray(g_np.tri_ids), np.asarray(g_cc.tri_ids))


@needs_native
def test_bvh_oracle_agrees_with_grid_narrow_phase():
    """Random particle states: the C++ BVH nearest-hit oracle and the JAX
    grid pipeline must agree on hit/no-hit and (where hit) distance."""
    from particlesystemhybridcollisiondetection_tpu.native.bvh import build_bvh

    rng = np.random.default_rng(0)
    scene = sample_scene()
    tris = scene.triangles
    bvh = build_bvh(tris, max_level=20, max_leaf_tris=8, sah_samples=16)
    grid, meta = build_triangle_grid(tris, scene.config.grid)

    n = 512
    radius, dt = np.float32(0.2), np.float32(0.004)
    pos = np.stack(
        [rng.uniform(-6, 6, n), rng.uniform(0.0, 2.0, n), rng.uniform(-6, 6, n)],
        axis=1,
    ).astype(np.float32)
    velo = (rng.normal(size=(n, 3)) * 5).astype(np.float32)

    hit_cc, t_cc = bvh.query(pos, velo, radius, dt)

    p = jnp.asarray(pos.T)
    v = jnp.asarray(velo.T)
    speed2 = vec.norm2(v)
    dirn = v / jnp.sqrt(speed2)[None]
    seg2 = speed2 * dt * dt
    v0, v1, v2, mask = gather_candidates(grid, meta, p)
    hits = nph.particle_vs_triangles(p, dirn, seg2, v0, v1, v2, jnp.full((n,), radius))
    hm = np.asarray(hits.hit) & np.asarray(mask)
    t2 = np.where(hm, np.asarray(hits.t2), np.inf)
    jx_hit = hm.any(axis=1)
    jx_t = np.take_along_axis(
        np.asarray(hits.t), np.argmin(t2, axis=1)[:, None], axis=1
    )[:, 0]

    cc_hit = hit_cc >= 0
    assert (cc_hit == jx_hit).mean() > 0.995, (
        f"hit disagreement {np.where(cc_hit != jx_hit)[0][:10]}"
    )
    both = cc_hit & jx_hit
    assert both.sum() > 20
    np.testing.assert_allclose(np.abs(t_cc[both]), np.abs(jx_t[both]), rtol=1e-3, atol=1e-4)


@needs_native
def test_bvh_node_invariants():
    from particlesystemhybridcollisiondetection_tpu.native.bvh import build_bvh

    scene = sample_scene()
    bvh = build_bvh(scene.triangles, max_level=18, max_leaf_tris=16, sah_samples=16)
    nodes = bvh.nodes
    # every triangle appears exactly once across leaves
    seen = np.zeros(len(scene.triangles), dtype=np.int64)
    for i in range(len(nodes)):
        a, b = int(nodes[i, 4]), int(nodes[i, 5])
        if a <= 0:  # leaf
            first = -a
            seen[np.asarray(bvh.order[first : first + b])] += 1
    np.testing.assert_array_equal(seen, 1)
    # every node's sphere contains all vertices of its triangles (the
    # invariant traversal pruning relies on; note child spheres need NOT
    # nest inside parents for centroid+max-dist sphere BVHs -- the
    # reference's construction has the same property)
    def node_tris(i):
        a, b = int(nodes[i, 4]), int(nodes[i, 5])
        if a <= 0:
            return np.asarray(bvh.order[-a : -a + b])
        return np.concatenate([node_tris(a), node_tris(b)])

    rng = np.random.default_rng(0)
    for i in rng.choice(len(nodes), size=min(64, len(nodes)), replace=False):
        tris_idx = node_tris(int(i))
        verts = scene.triangles[tris_idx].reshape(-1, 3)
        d = np.linalg.norm(verts - nodes[i, :3], axis=1)
        assert (d <= nodes[i, 3] + 1e-3).all(), (i, d.max(), nodes[i, 3])
