"""Static triangle grid broad phase: build invariants + equivalence with
the brute-force path (the grid must never change trajectories, only cost)."""

import numpy as np
import pytest

# smoke = all but the slow long-run statistics test (marked per-test below)
import jax.numpy as jnp

from particlesystemhybridcollisiondetection_tpu.config import GridConfig
from particlesystemhybridcollisiondetection_tpu.core.state import spawn_grid, active_mask
from particlesystemhybridcollisiondetection_tpu.core.step import (
    make_spatial_step_bruteforce,
    make_spatial_step_grid,
)
from particlesystemhybridcollisiondetection_tpu.geometry.scenes import sample_scene
from particlesystemhybridcollisiondetection_tpu.ops.grid import (
    build_triangle_grid,
    cell_index,
    gather_candidates,
)


@pytest.mark.smoke
def test_build_invariants():
    scene = sample_scene()
    grid, meta = build_triangle_grid(scene.triangles, scene.config.grid)
    assert meta.num_triangles == scene.num_triangles
    offs = np.asarray(grid.offsets)
    assert offs[0] == 0 and offs[-1] == meta.num_pairs
    assert (np.diff(offs) >= 0).all()
    assert (np.diff(offs) <= meta.max_tris_per_cell).all()
    # every triangle is binned at least once
    assert len(np.unique(np.asarray(grid.tri_ids))) == meta.num_triangles


@pytest.mark.smoke
def test_candidates_are_complete():
    """Every triangle within (expand) of a query point must be among the
    point's cell candidates."""
    rng = np.random.default_rng(0)
    scene = sample_scene()
    gcfg = scene.config.grid
    tris = scene.triangles
    grid, meta = build_triangle_grid(tris, gcfg)

    pts = rng.uniform(-3, 3, size=(256, 3)).astype(np.float32)
    pts[:, 1] = rng.uniform(0, 2, size=256)
    v0, v1, v2, mask = gather_candidates(grid, meta, jnp.asarray(pts.T))
    mask = np.asarray(mask)
    cid = np.asarray(cell_index(jnp.asarray(pts.T), meta))
    tids = np.asarray(grid.tri_ids)
    offs = np.asarray(grid.offsets)

    # ground truth: triangles whose AABB is within EUCLIDEAN distance
    # ``expand`` of the point.  That is the guarantee the narrow phase
    # needs (a particle can only touch geometry within r + travel of it,
    # measured in L2); the binner's L2 prefilter (ops/grid.py) provides
    # exactly this, no longer the looser L-infinity cube.
    lo = tris.min(axis=1)  # [T, 3]
    hi = tris.max(axis=1)
    for i in range(len(pts)):
        d = np.maximum(lo - pts[i], 0) + np.maximum(pts[i] - hi, 0)
        near = np.where(np.linalg.norm(d, axis=1) <= gcfg.expand - 1e-3)[0]
        cand = set(tids[offs[cid[i]] : offs[cid[i] + 1]])
        missing = set(near) - cand
        assert not missing, f"point {pts[i]} missing triangles {missing}"


@pytest.mark.smoke
def test_grid_step_equals_bruteforce_step():
    """For any reachable state, one grid step must equal one brute-force
    step (same hits, positions to float tolerance).

    Note: full-trajectory bitwise equality between the two paths is NOT a
    sound expectation -- the two programs fuse differently under XLA (FMA
    contraction), giving ~1-ulp response differences that resting-contact
    dynamics amplify chaotically.  Single-step equivalence from identical
    states is the sharp statement that the broad phase changes cost, not
    semantics."""
    scene = sample_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1, pad_multiple=128)
    mask = np.asarray(active_mask(state))

    bf = make_spatial_step_bruteforce(scene.triangles, cfg)
    variants = {
        v: make_spatial_step_grid(scene.triangles, cfg, variant=v)
        for v in ("dense", "stream", "packed")
    }

    s = state
    checked = 0
    for k in range(1500):
        s_next_bf = bf(s)
        if k % 25 == 0 or int(s_next_bf.collisions.sum()) != int(s.collisions.sum()):
            for name, gr in variants.items():
                s_next_gr = gr(s)
                np.testing.assert_array_equal(
                    np.asarray(s_next_gr.collisions)[mask],
                    np.asarray(s_next_bf.collisions)[mask],
                    err_msg=f"step {k} [{name}]: hit sets differ",
                )
                np.testing.assert_allclose(
                    np.asarray(s_next_gr.pos)[:, mask],
                    np.asarray(s_next_bf.pos)[:, mask],
                    rtol=1e-5,
                    atol=1e-6,
                    err_msg=f"step {k} [{name}]",
                )
            checked += 1
        s = s_next_bf

    assert checked > 50
    assert int(np.asarray(s.collisions)[mask].sum()) > 0


@pytest.mark.slow
def test_grid_long_run_statistics_match_bruteforce():
    """Long-run behavior of the two paths agrees statistically (chaos makes
    per-particle trajectories diverge; the ensemble must not)."""
    scene = sample_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1, pad_multiple=128)
    mask = np.asarray(active_mask(state))

    bf = make_spatial_step_bruteforce(scene.triangles, cfg)
    gr = make_spatial_step_grid(scene.triangles, cfg)
    s_bf = s_gr = state
    for _ in range(2000):
        s_bf = bf(s_bf)
        s_gr = gr(s_gr)

    y_bf = np.asarray(s_bf.pos)[1][mask]
    y_gr = np.asarray(s_gr.pos)[1][mask]
    nc_bf = np.asarray(s_bf.collisions)[mask].sum()
    nc_gr = np.asarray(s_gr.collisions)[mask].sum()
    assert abs(np.mean(y_bf) - np.mean(y_gr)) < 0.2
    assert 0.5 < nc_gr / max(nc_bf, 1) < 2.0


@pytest.mark.smoke
def test_morton_key_locality_and_consistency():
    """morton_key must (a) agree with morton_cell_codes through cell_index,
    (b) be a bijection of the cell id, and (c) keep any 2x2x2 cell octant
    id-adjacent (the locality property the sorted window pipeline relies
    on, ops/pallas/window_kernel.py step 3)."""
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        morton_cell_codes,
        morton_key,
    )

    scene = sample_scene()
    grid, meta = build_triangle_grid(scene.triangles, scene.config.grid)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-3, 3, size=(3, 512)).astype(np.float32)

    codes = morton_cell_codes(meta)  # [C] per linear cell id
    cid = np.asarray(cell_index(jnp.asarray(pts), meta))
    key = np.asarray(morton_key(jnp.asarray(pts), meta))
    np.testing.assert_array_equal(key, codes[cid])

    # bijective over the grid's cells
    assert len(np.unique(codes)) == meta.num_cells

    # octant locality: the 8 cells of any aligned 2x2x2 block occupy 8
    # CONSECUTIVE morton ranks
    rank = np.empty(meta.num_cells, dtype=np.int64)
    rank[np.argsort(codes, kind="stable")] = np.arange(meta.num_cells)
    dims = meta.dims
    for _ in range(32):
        x, y, z = (
            rng.integers(0, max(dims[0] // 2, 1)) * 2,
            rng.integers(0, max(dims[1] // 2, 1)) * 2,
            rng.integers(0, max(dims[2] // 2, 1)) * 2,
        )
        if x + 1 >= dims[0] or y + 1 >= dims[1] or z + 1 >= dims[2]:
            continue
        octant = [
            ((x + dx) * dims[1] + (y + dy)) * dims[2] + (z + dz)
            for dx in (0, 1)
            for dy in (0, 1)
            for dz in (0, 1)
        ]
        r = np.sort(rank[octant])
        assert (np.diff(r) == 1).all(), (x, y, z, r)


@pytest.mark.smoke
def test_window_tables_morton_permutation_preserves_cell_contents():
    """build_window_tables permutes pair rows into Morton cell order; each
    cell's candidate rows must keep the linear layout's triangles in the
    SAME order (tie-breaking parity), addressed by the new cells2."""
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        build_window_tables,
    )

    scene = sample_scene()
    grid, meta = build_triangle_grid(scene.triangles, scene.config.grid)
    tables = build_window_tables(grid, meta, w=256)
    pairs_m = np.asarray(tables.pairs)  # [16, P_pad], rows 0..8 live
    cells2 = np.asarray(tables.cells2)  # [2, C] (morton-order starts, counts)

    offs = np.asarray(grid.offsets)
    tri = np.asarray(grid.tri_ids)
    verts = np.concatenate(
        [np.asarray(grid.v0), np.asarray(grid.v1), np.asarray(grid.v2)],
        axis=0,
    )  # [9, T]

    occupied = np.where(np.diff(offs) > 0)[0]
    for c in occupied[:: max(len(occupied) // 64, 1)]:
        lin_rows = verts[:, tri[offs[c] : offs[c + 1]]]  # [9, k]
        start, count = cells2[0, c], cells2[1, c]
        assert count == offs[c + 1] - offs[c]
        np.testing.assert_array_equal(
            pairs_m[:9, start : start + count], lin_rows
        )
    # dead sublane rows stay sentinel
    assert (pairs_m[9:] >= 1.0e37).all()
