"""Sorted block-window Pallas pipeline: interpret-mode equivalence with the
packed XLA path (exact), plus glue invariants.

On real TPU the two paths agree on >99.9% of hit sets per step (boundary
ulp flips between Mosaic- and XLA-compiled arithmetic affect O(1) resting
particles per 32k; see BASELINE.md) -- the exactness statement here uses
the interpreter, which shares XLA's arithmetic.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from particlesystemhybridcollisiondetection_tpu.core.state import (
    active_mask,
    spawn_grid,
)
from particlesystemhybridcollisiondetection_tpu.core.step import (
    make_spatial_step_grid,
    make_spatial_step_sorted,
    sorted_step_overflow_count,
)
from particlesystemhybridcollisiondetection_tpu.geometry.scenes import sample_scene


def _fast_scene():
    """sample_scene with 20x dt so first impacts land within ~55 steps --
    the smoke-tier analog of the 1300-step slow equivalence runs.  (The
    swept-sphere narrow phase is exact for any per-step travel, so the
    large dt stresses rather than weakens the equivalence.)"""
    scene = sample_scene(width=128, height=128)
    cfg = dataclasses.replace(scene.config, dt=scene.config.dt * 20)
    return dataclasses.replace(scene, config=cfg)


@pytest.mark.smoke
def test_sorted_kernel_matches_packed_smoke():
    scene = _fast_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1, pad_multiple=1024)
    mask = np.asarray(active_mask(state))
    packed = make_spatial_step_grid(scene.triangles, cfg, variant="packed")
    sorted_step = make_spatial_step_sorted(scene.triangles, cfg, interpret=True)

    s = state
    checked = 0
    for k in range(85):
        nxt = packed(s)
        if k % 25 == 0 or int(nxt.collisions.sum()) != int(s.collisions.sum()):
            ns = sorted_step(s)
            np.testing.assert_array_equal(
                np.asarray(ns.collisions)[mask],
                np.asarray(nxt.collisions)[mask],
                err_msg=f"step {k}",
            )
            np.testing.assert_allclose(
                np.asarray(ns.pos)[:, mask], np.asarray(nxt.pos)[:, mask],
                rtol=1e-5, atol=1e-6, err_msg=f"step {k}",
            )
            checked += 1
        s = nxt
    assert checked >= 5
    assert int(np.asarray(s.collisions)[mask].sum()) > 0


def test_persistent_runner_matches_per_step_smoke():
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_sorted_episode_runner,
    )

    scene = _fast_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1)
    mask = np.asarray(active_mask(state))
    step = make_spatial_step_sorted(scene.triangles, cfg, interpret=True)
    runner = make_sorted_episode_runner(scene.triangles, cfg, interpret=True)
    s = state
    for _ in range(75):
        s = step(s)
    r = runner(state, 75)
    np.testing.assert_array_equal(
        np.asarray(r.collisions)[mask], np.asarray(s.collisions)[mask]
    )
    np.testing.assert_allclose(
        np.asarray(r.pos)[:, mask], np.asarray(s.pos)[:, mask],
        rtol=1e-6, atol=1e-7,
    )
    assert int(np.asarray(s.collisions)[mask].sum()) > 0


def test_lazy_resort_runner_matches_per_step_smoke():
    """resort_every > 1 skips the sort most steps; the chunked fallback
    must make results identical to the always-sorted runner (sortedness
    is a performance hint, never a correctness requirement)."""
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_sorted_episode_runner,
    )

    scene = _fast_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1)
    mask = np.asarray(active_mask(state))
    step = make_spatial_step_sorted(scene.triangles, cfg, interpret=True)
    runner = make_sorted_episode_runner(
        scene.triangles, cfg, interpret=True, resort_every=7
    )
    s = state
    for _ in range(75):
        s = step(s)
    r = runner(state, 75)
    np.testing.assert_array_equal(
        np.asarray(r.collisions)[mask], np.asarray(s.collisions)[mask]
    )
    np.testing.assert_allclose(
        np.asarray(r.pos)[:, mask], np.asarray(s.pos)[:, mask],
        rtol=1e-6, atol=1e-7,
    )


def test_auto_resort_runner_matches_per_step_smoke():
    """resort_every="auto" (overflow-triggered on-device re-sort) must be
    exactly the per-step sorted runner's physics: the lax.cond only picks
    WHEN to restore sortedness, which is a performance hint.  threshold=0
    re-sorts on any overflow above the post-sort baseline, so both cond
    branches execute across the run."""
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_sorted_episode_runner,
    )

    scene = _fast_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1)
    mask = np.asarray(active_mask(state))
    step = make_spatial_step_sorted(scene.triangles, cfg, interpret=True)
    runner = make_sorted_episode_runner(
        scene.triangles, cfg, interpret=True, resort_every="auto",
        resort_threshold=0,
    )
    s = state
    for _ in range(75):
        s = step(s)
    r = runner(state, 75)
    np.testing.assert_array_equal(
        np.asarray(r.collisions)[mask], np.asarray(s.collisions)[mask]
    )
    np.testing.assert_allclose(
        np.asarray(r.pos)[:, mask], np.asarray(s.pos)[:, mask],
        rtol=1e-6, atol=1e-7,
    )
    assert int(np.asarray(s.collisions)[mask].sum()) > 0


def test_rescue_compact_order_matches_argsort():
    """rescue_compact=True builds the phase-1 rescue order by bounded
    cumsum+scatter compaction + small sort; restricted to overflow lanes
    it is IDENTICAL to the full argsort (stable tie-break by lane in
    both), and padding lanes are non-overflow no-ops -- so trajectories
    must match bitwise.  _COMPACT_CAP is monkeypatched small so the
    compact path engages at test scale."""
    from particlesystemhybridcollisiondetection_tpu.core import step as step_mod
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_sorted_episode_runner,
    )

    scene = _fast_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1)
    mask = np.asarray(active_mask(state))
    base = make_sorted_episode_runner(
        scene.triangles, cfg, interpret=True, resort_every=7
    )
    r0 = base(state, 75)
    old_cap = step_mod._COMPACT_CAP
    step_mod._COMPACT_CAP = 256  # engage at n=1024; overflow stays < 256
    try:
        compact = make_sorted_episode_runner(
            scene.triangles, cfg, interpret=True, resort_every=7,
            rescue_compact=True,
        )
        r1 = compact(state, 75)
    finally:
        step_mod._COMPACT_CAP = old_cap
    np.testing.assert_array_equal(
        np.asarray(r1.collisions)[mask], np.asarray(r0.collisions)[mask]
    )
    np.testing.assert_array_equal(
        np.asarray(r1.pos)[:, mask], np.asarray(r0.pos)[:, mask]
    )


def test_hybrid_persistent_runner_matches_per_step_smoke():
    """Hybrid-mode persistent runner (camera=...) == repeated
    make_hybrid_step_sorted steps, including across lazy-resort
    boundaries: same per-id trajectories and collision counts."""
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_hybrid_step_sorted,
        make_sorted_episode_runner,
    )

    scene = _fast_scene()
    cfg = scene.config
    cam = scene.cameras[0]
    state = spawn_grid(cfg, layers_y=1)
    mask = np.asarray(active_mask(state))
    step = make_hybrid_step_sorted(scene.triangles, cfg, cam, interpret=True)
    runner = make_sorted_episode_runner(
        scene.triangles, cfg, interpret=True, resort_every=7, camera=cam
    )
    s = state
    for _ in range(75):
        s = step(s)
    r = runner(state, 75)
    np.testing.assert_array_equal(
        np.asarray(r.collisions)[mask], np.asarray(s.collisions)[mask]
    )
    np.testing.assert_allclose(
        np.asarray(r.pos)[:, mask], np.asarray(s.pos)[:, mask],
        rtol=1e-6, atol=1e-7,
    )
    assert int(np.asarray(s.collisions)[mask].sum()) > 0


def test_cells_lookup_kernel_matches_gather_plan():
    """The in-kernel Morton-code cells lookup (cells_lookup="kernel")
    must reproduce the XLA gather plan exactly: same trajectories, same
    counts, with lookup misses folded into the exact fallback."""
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_sorted_episode_runner,
    )

    scene = _fast_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1)
    mask = np.asarray(active_mask(state))
    a_step = make_spatial_step_sorted(
        scene.triangles, cfg, interpret=True, cells_lookup="gather"
    )
    b_step = make_spatial_step_sorted(
        scene.triangles, cfg, interpret=True, cells_lookup="kernel"
    )
    s = state
    checked = 0
    for k in range(85):
        na = a_step(s)
        if k % 25 == 0 or int(na.collisions.sum()) != int(s.collisions.sum()):
            nb = b_step(s)
            np.testing.assert_array_equal(
                np.asarray(nb.collisions)[mask],
                np.asarray(na.collisions)[mask],
                err_msg=f"step {k}",
            )
            np.testing.assert_array_equal(
                np.asarray(nb.pos)[:, mask], np.asarray(na.pos)[:, mask],
                err_msg=f"step {k}",
            )
            checked += 1
        s = na
    assert checked >= 5
    assert int(np.asarray(s.collisions)[mask].sum()) > 0

    # persistent runner with the coded plan, across lazy-resort steps
    runner = make_sorted_episode_runner(
        scene.triangles, cfg, interpret=True, resort_every=7,
        cells_lookup="kernel",
    )
    r = runner(state, 75)
    s2 = state
    for _ in range(75):
        s2 = a_step(s2)
    np.testing.assert_array_equal(
        np.asarray(r.collisions)[mask], np.asarray(s2.collisions)[mask]
    )
    np.testing.assert_array_equal(
        np.asarray(r.pos)[:, mask], np.asarray(s2.pos)[:, mask]
    )


@pytest.mark.smoke
def test_code_table_dense_cell_marks_miss():
    """Cells with >=255 triangles exceed the CodeTable's 8-bit packed
    count and must come back as lookup misses (count == -1, routed to
    the exact fallback), while sparse cells decode exactly."""
    import jax
    from jax.sharding import Mesh  # noqa: F401  (jax import side effect)
    from particlesystemhybridcollisiondetection_tpu.config import GridConfig
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        build_triangle_grid,
        morton_cell_codes,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        BLOCK,
        build_code_table,
        cells_window_lookup,
    )

    rng = np.random.default_rng(0)
    # 300 tiny triangles piled into one spot (one dense cell) + a few
    # scattered ones
    base = np.array([5.0, 5.0, 5.0])
    dense = base + rng.normal(scale=0.05, size=(300, 3, 3)) * 0.1
    sparse = rng.uniform(12.0, 19.0, size=(8, 3, 3))
    tris = np.concatenate([dense, sparse]).astype(np.float32)
    grid, meta = build_triangle_grid(tris, GridConfig(cell_size=4.0))
    counts = np.diff(np.asarray(grid.offsets))
    assert counts.max() >= 255, "synthetic dense cell should exceed 255"
    ctab = build_code_table(grid, meta, 512)
    codes = morton_cell_codes(meta)
    dense_code = int(codes[int(np.argmax(counts))])
    sparse_cid = int(np.argwhere((counts > 0) & (counts < 255))[0][0])
    sparse_code = int(codes[sparse_cid])

    key = np.full((BLOCK,), dense_code, dtype=np.int32)
    key[1] = sparse_code
    key.sort()
    lo = np.full((8,), (key.min() // 128) * 128, dtype=np.int32)
    hi = np.maximum(((key.max() - 512 + 128) // 128) * 128, 0) * np.ones(
        (8,), dtype=np.int32
    )
    start, count = cells_window_lookup(
        jnp.asarray(key), jnp.asarray(lo), jnp.asarray(hi), ctab,
        wc=512, interpret=True,
    )
    start, count = np.asarray(start), np.asarray(count)
    dense_lanes = key == dense_code
    assert (count[dense_lanes] == -1).all(), "dense cell must be a miss"
    sl = key == sparse_code
    assert (count[sl] == counts[sparse_cid]).all()
    # start is the morton-ordered pair-table start for that cell
    order = np.argsort(codes, kind="stable")
    counts_m = counts[order]
    off_m = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts_m, out=off_m[1:])
    start_by_cell = np.empty(len(counts), dtype=np.int64)
    start_by_cell[order] = off_m[:-1]
    assert (start[sl] == start_by_cell[sparse_cid]).all()


def test_kernel_rescue_bitwise_plan_equality_under_overflow():
    """Round-3 rescue pass: window-overflow particles are redone by the
    SAME Pallas kernel on a compacted subset (_chunked_rescue), so the
    gather and coded plans must agree BITWISE even when overflow is
    rife -- previously the overflow lanes took the packed XLA fallback,
    whose last-ulp differences could flip near-tie argmins
    (benchmarks/study_hybrid_divergence.py)."""
    scene = _fast_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1, pad_multiple=1024)
    mask = np.asarray(active_mask(state))
    # a 128-row window guarantees overflow once particles pile up
    a_step = make_spatial_step_sorted(
        scene.triangles, cfg, window=128, interpret=True,
        cells_lookup="gather", with_stats=True,
    )
    b_step = make_spatial_step_sorted(
        scene.triangles, cfg, window=128, interpret=True,
        cells_lookup="kernel", with_stats=True,
    )
    wide = make_spatial_step_sorted(scene.triangles, cfg, interpret=True)
    s = state
    for _ in range(60):  # into the first-impact regime
        s = wide(s)
    a, st_a = a_step(s)
    b, st_b = b_step(s)
    assert int(st_a["window_overflow"]) > 0, "test needs real overflow"
    np.testing.assert_array_equal(np.asarray(b.pos), np.asarray(a.pos))
    np.testing.assert_array_equal(np.asarray(b.vel), np.asarray(a.vel))
    np.testing.assert_array_equal(
        np.asarray(b.collisions), np.asarray(a.collisions)
    )
    # and both agree with the packed-XLA reference to float tolerance
    ref = make_spatial_step_grid(scene.triangles, cfg, variant="packed")(s)
    np.testing.assert_array_equal(
        np.asarray(a.collisions)[mask], np.asarray(ref.collisions)[mask]
    )
    np.testing.assert_allclose(
        np.asarray(a.pos)[:, mask], np.asarray(ref.pos)[:, mask],
        rtol=1e-5, atol=1e-6,
    )


def test_dense_demote_is_exact():
    """dense_demote routes dense-cell lanes to the rescue pass; results
    must be identical to the undemoted step (the rescue kernel is the
    same math on the same candidates in the same order)."""
    scene = _fast_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1, pad_multiple=1024)
    plain = make_spatial_step_sorted(
        scene.triangles, cfg, interpret=True, dense_demote=None
    )
    demoted = make_spatial_step_sorted(
        scene.triangles, cfg, interpret=True, dense_demote=2,
        with_stats=True,
    )
    s = state
    for k in range(70):
        s = plain(s)
        if k == 60:
            probe = s
    a = plain(probe)
    b, st = demoted(probe)
    assert int(st["window_overflow"]) > 0, "demote should mark dense lanes"
    np.testing.assert_array_equal(np.asarray(b.pos), np.asarray(a.pos))
    np.testing.assert_array_equal(np.asarray(b.vel), np.asarray(a.vel))
    np.testing.assert_array_equal(
        np.asarray(b.collisions), np.asarray(a.collisions)
    )


def test_hybrid_sorted_matches_hybrid_packed_smoke():
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_hybrid_step,
        make_hybrid_step_sorted,
    )

    scene = _fast_scene()
    cfg = scene.config
    cam = scene.cameras[0]
    state = spawn_grid(cfg, layers_y=1)
    mask = np.asarray(active_mask(state))
    a_step = make_hybrid_step(scene.triangles, cfg, cam)
    b_step = make_hybrid_step_sorted(scene.triangles, cfg, cam, interpret=True)
    s = state
    checked = 0
    for k in range(85):
        na = a_step(s)
        if k % 30 == 0 or int(na.collisions.sum()) != int(s.collisions.sum()):
            nb = b_step(s)
            np.testing.assert_array_equal(
                np.asarray(nb.collisions)[mask],
                np.asarray(na.collisions)[mask],
                err_msg=f"step {k}",
            )
            np.testing.assert_allclose(
                np.asarray(nb.pos)[:, mask], np.asarray(na.pos)[:, mask],
                rtol=1e-5, atol=1e-6, err_msg=f"step {k}",
            )
            checked += 1
        s = na
    assert checked >= 5
    assert int(np.asarray(s.collisions)[mask].sum()) > 0


@pytest.mark.slow
def test_sorted_kernel_matches_packed_interpret():
    scene = sample_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1, pad_multiple=1024)
    mask = np.asarray(active_mask(state))
    packed = make_spatial_step_grid(scene.triangles, cfg, variant="packed")
    sorted_step = make_spatial_step_sorted(scene.triangles, cfg, interpret=True)

    s = state
    checked = 0
    for k in range(1300):
        nxt = packed(s)
        if k % 120 == 0 or int(nxt.collisions.sum()) != int(s.collisions.sum()):
            ns = sorted_step(s)
            np.testing.assert_array_equal(
                np.asarray(ns.collisions)[mask],
                np.asarray(nxt.collisions)[mask],
                err_msg=f"step {k}",
            )
            np.testing.assert_allclose(
                np.asarray(ns.pos)[:, mask], np.asarray(nxt.pos)[:, mask],
                rtol=1e-5, atol=1e-6, err_msg=f"step {k}",
            )
            np.testing.assert_allclose(
                np.asarray(ns.vel)[:, mask], np.asarray(nxt.vel)[:, mask],
                rtol=1e-4, atol=1e-5, err_msg=f"step {k}",
            )
            checked += 1
        s = nxt
    assert checked >= 15
    assert int(np.asarray(s.collisions)[mask].sum()) > 0


@pytest.mark.slow
def test_overflow_fallback_kicks_in():
    """A window too small for the scene forces the compacted fallback;
    results must still match the packed path exactly."""
    scene = sample_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1, pad_multiple=1024)
    mask = np.asarray(active_mask(state))
    packed = make_spatial_step_grid(scene.triangles, cfg, variant="packed")
    # window of 128 rows: blocks containing the full settled bowl overflow
    tiny = make_spatial_step_sorted(
        scene.triangles, cfg, window=128, interpret=True
    )
    s = state
    for _ in range(1100):  # into the post-impact regime
        s = packed(s)
    n_over = sorted_step_overflow_count(scene.triangles, cfg, s, window=128)
    a = tiny(s)
    b = packed(s)
    np.testing.assert_array_equal(
        np.asarray(a.collisions)[mask], np.asarray(b.collisions)[mask]
    )
    np.testing.assert_allclose(
        np.asarray(a.pos)[:, mask], np.asarray(b.pos)[:, mask], rtol=1e-5, atol=1e-6
    )
    # the probe confirms the fallback was actually exercised
    assert n_over > 0, "expected window overflow with window=128"


@pytest.mark.slow
def test_hybrid_sorted_matches_hybrid_packed_interpret():
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_hybrid_step,
        make_hybrid_step_sorted,
    )

    scene = sample_scene(width=128, height=128)
    cfg = scene.config
    cam = scene.cameras[0]
    state = spawn_grid(cfg, layers_y=1)
    mask = np.asarray(active_mask(state))
    a_step = make_hybrid_step(scene.triangles, cfg, cam)
    b_step = make_hybrid_step_sorted(scene.triangles, cfg, cam, interpret=True)
    s = state
    checked = 0
    for k in range(1300):
        na = a_step(s)
        if k % 150 == 0 or int(na.collisions.sum()) != int(s.collisions.sum()):
            nb = b_step(s)
            np.testing.assert_array_equal(
                np.asarray(nb.collisions)[mask],
                np.asarray(na.collisions)[mask],
                err_msg=f"step {k}",
            )
            np.testing.assert_allclose(
                np.asarray(nb.pos)[:, mask], np.asarray(na.pos)[:, mask],
                rtol=1e-5, atol=1e-6, err_msg=f"step {k}",
            )
            checked += 1
        s = na
    assert checked >= 8
    assert int(np.asarray(s.collisions)[mask].sum()) > 0


def test_lane_gather_helper():
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        LANE, SUB, _lane_gather,
    )

    rng = np.random.default_rng(0)
    w = 4 * LANE
    tab = jnp.asarray(
        np.broadcast_to(rng.normal(size=(1, w)), (SUB, w)).astype(np.float32)
    )
    idx = jnp.asarray(rng.integers(0, w, size=(SUB, LANE)).astype(np.int32))
    got = np.asarray(_lane_gather(tab, idx))
    want = np.asarray(tab)[0][np.asarray(idx)]
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_persistent_episode_runner_matches_per_step():
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_sorted_episode_runner,
    )

    scene = sample_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1)
    mask = np.asarray(active_mask(state))
    step = make_spatial_step_sorted(scene.triangles, cfg, interpret=True)
    runner = make_sorted_episode_runner(scene.triangles, cfg, interpret=True)
    s = state
    for _ in range(1150):  # through first impacts
        s = step(s)
    r = runner(state, 1150)
    np.testing.assert_array_equal(
        np.asarray(r.collisions)[mask], np.asarray(s.collisions)[mask]
    )
    np.testing.assert_allclose(
        np.asarray(r.pos)[:, mask], np.asarray(s.pos)[:, mask], rtol=1e-6, atol=1e-7
    )
    assert int(np.asarray(s.collisions)[mask].sum()) > 0


def test_sorted_sharded_matches_single_device():
    """VERDICT r1 #6: the sorted Pallas pipeline under an 8-device mesh
    (per-shard sort inside shard_map, replicated tables) must reproduce
    the single-device sorted step exactly -- the sort order is a locality
    optimization, so resorting per shard cannot change any particle's
    candidate set or response."""
    import jax
    from jax.sharding import Mesh

    scene = _fast_scene()
    cfg = scene.config
    state = spawn_grid(cfg, layers_y=1, pad_multiple=8 * 1024)
    assert state.pos.shape[-1] % (8 * 1024) == 0
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))

    single = make_spatial_step_sorted(
        scene.triangles, cfg, interpret=True, with_stats=True
    )
    sharded = make_spatial_step_sorted(
        scene.triangles, cfg, interpret=True, with_stats=True, mesh=mesh
    )

    s_ref = s_sh = state
    for k in range(3):
        s_ref, st_ref = single(s_ref)
        s_sh, st_sh = sharded(s_sh)
        np.testing.assert_array_equal(
            np.asarray(s_sh.collisions), np.asarray(s_ref.collisions)
        )
        np.testing.assert_array_equal(np.asarray(s_sh.pos), np.asarray(s_ref.pos))
        np.testing.assert_array_equal(np.asarray(s_sh.vel), np.asarray(s_ref.vel))
        assert int(st_sh["window_overflow"]) == int(st_ref["window_overflow"])


def test_persistent_runner_sharded_matches_single_device():
    """mesh= on the persistent runner: per-SHARD persistent order (local
    sorts never migrate particles, the id restore is shard-local) must
    reproduce the single-device runner exactly, spatial and hybrid."""
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_sorted_episode_runner,
    )
    import jax
    from jax.sharding import Mesh

    scene = _fast_scene()
    cfg = scene.config
    cam = scene.cameras[0]
    state = spawn_grid(cfg, layers_y=1, pad_multiple=8 * 1024)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))

    for camera in (None, cam):
        single = make_sorted_episode_runner(
            scene.triangles, cfg, interpret=True, resort_every=3,
            camera=camera,
        )
        sharded = make_sorted_episode_runner(
            scene.triangles, cfg, interpret=True, resort_every=3,
            camera=camera, mesh=mesh,
        )
        a = single(state, 5)
        b = sharded(state, 5)
        np.testing.assert_array_equal(
            np.asarray(b.collisions), np.asarray(a.collisions)
        )
        np.testing.assert_array_equal(np.asarray(b.pos), np.asarray(a.pos))
        np.testing.assert_array_equal(np.asarray(b.vel), np.asarray(a.vel))


def test_hybrid_sorted_sharded_matches_single_device():
    from particlesystemhybridcollisiondetection_tpu.core.step import (
        make_hybrid_step_sorted,
    )
    import jax
    from jax.sharding import Mesh

    scene = _fast_scene()
    cfg = scene.config
    cam = scene.cameras[0]
    state = spawn_grid(cfg, layers_y=1, pad_multiple=8 * 1024)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))

    single = make_hybrid_step_sorted(scene.triangles, cfg, cam, interpret=True)
    sharded = make_hybrid_step_sorted(
        scene.triangles, cfg, cam, interpret=True, mesh=mesh
    )
    # advance a bit so the screen-space stage has real work, then compare
    s = state
    for _ in range(40):
        s = single(s)
    a = single(s)
    b = sharded(s)
    np.testing.assert_array_equal(np.asarray(b.collisions), np.asarray(a.collisions))
    np.testing.assert_array_equal(np.asarray(b.pos), np.asarray(a.pos))
    np.testing.assert_array_equal(np.asarray(b.vel), np.asarray(a.vel))
