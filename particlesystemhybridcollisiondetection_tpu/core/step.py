"""Simulation step assembly.

The reference's per-frame driver (ParticleSys.Update, ParticleSys.cs:445-527)
dispatches, in order: the active collision-detection kernel, then the
integrator, then rendering, then the episode-end check.  Here that becomes a
single jitted function ``state -> state`` per method; episodes are
``lax.scan``/``fori_loop`` over it with the same ordering semantics
(collision response runs *before* integration, and responses pre-compensate
the integrator with ``-g*dt``).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from particlesystemhybridcollisiondetection_tpu.config import SimConfig
from particlesystemhybridcollisiondetection_tpu.core import vec
from particlesystemhybridcollisiondetection_tpu.core.state import ParticleState
from particlesystemhybridcollisiondetection_tpu.ops import narrow_phase as nphase
from particlesystemhybridcollisiondetection_tpu.ops.integrate import integrate

StepFn = Callable[[ParticleState], ParticleState]


def _as_planar_triangles(triangles) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[T, 3, 3] host soup -> three [3, T] planar device arrays."""
    tris = jnp.asarray(triangles, dtype=jnp.float32)
    v0 = tris[:, 0, :].T
    v1 = tris[:, 1, :].T
    v2 = tris[:, 2, :].T
    return v0, v1, v2


def spatial_collide(
    state: ParticleState,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    v2: jnp.ndarray,
    gravity: jnp.ndarray,
    dt: float,
    backoff: float,
    cand_mask: Optional[jnp.ndarray] = None,
    active: Optional[jnp.ndarray] = None,
) -> ParticleState:
    """Spatial-structure collision detection + response on a candidate set.

    v0, v1, v2: [3, N, K] per-particle candidates, or [3, K] shared
    candidates (broadcast to all particles; the brute-force path).
    ``cand_mask``: bool[N, K] validity of each candidate (padding lanes).
    ``active``: bool[N] run collision for these particles only (hybrid uses
    this for its undecided set).
    """
    pos, velo = state.pos, state.vel
    if v0.ndim == 2:  # shared candidate list -> broadcast over particles
        v0 = v0[:, None, :]
        v1 = v1[:, None, :]
        v2 = v2[:, None, :]

    speed2 = vec.norm2(velo)
    dirn = vec.normalize(velo)  # NaN on vel==0 lanes; masked below
    seg_len2 = speed2 * (dt * dt)

    hits = nphase.particle_vs_triangles(pos, dirn, seg_len2, v0, v1, v2, state.radius)
    hit_mask = hits.hit
    if cand_mask is not None:
        hit_mask = hit_mask & cand_mask
    hits = hits._replace(
        hit=hit_mask, t2=jnp.where(hit_mask, hits.t2, jnp.inf)
    )
    nearest = nphase.nearest_hit(hits)

    # vel == 0 guard (SpatialStructureCollisionDetection.compute:237).
    hit = nearest.hit & (speed2 != 0.0)
    if active is not None:
        hit = hit & active

    new_pos, new_vel = nphase.spatial_response(
        pos,
        velo,
        dirn,
        hit,
        nearest.t,
        nearest.normal,
        gravity,
        dt,
        state.radius,
        state.restitution,
        backoff,
    )
    return state._replace(
        pos=new_pos,
        vel=new_vel,
        collisions=state.collisions + hit.astype(jnp.int32),
    )


def make_spatial_step_bruteforce(triangles, cfg: SimConfig) -> StepFn:
    """Spatial method with every scene triangle as a candidate.

    O(N*T) -- the validation path (and the analog of the reference's
    "BVH as ground-truth oracle" role, SURVEY 4).  Use the grid-based step
    for real workloads.
    """
    v0, v1, v2 = _as_planar_triangles(triangles)
    gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)

    @jax.jit
    def step(state: ParticleState) -> ParticleState:
        state = spatial_collide(state, v0, v1, v2, gravity, cfg.dt, cfg.backoff)
        new_pos, new_vel = integrate(state.pos, state.vel, gravity, cfg.dt)
        return state._replace(pos=new_pos, vel=new_vel)

    return step


def spatial_collide_stream(
    state: ParticleState,
    grid,
    meta,
    gravity: jnp.ndarray,
    dt: float,
    backoff: float,
    active: Optional[jnp.ndarray] = None,
) -> ParticleState:
    """Grid spatial collision via the streaming narrow phase (no [N, K]
    candidate tensors; see narrow_phase.swept_collide_stream)."""
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        cell_index,
        lookup_pos,
    )

    pos, velo = state.pos, state.vel
    speed2 = vec.norm2(velo)
    dirn = vec.normalize(velo)
    seg_len2 = speed2 * (dt * dt)

    cid = cell_index(lookup_pos(pos, velo, dt), meta)
    start = grid.offsets[cid]
    count = grid.offsets[cid + 1] - start
    p_max = grid.tri_ids.shape[0] - 1

    def gather_fn(j):
        idx = jnp.clip(start + j, 0, p_max)
        tid = grid.tri_ids[idx]
        return grid.v0[:, tid], grid.v1[:, tid], grid.v2[:, tid], j < count

    nearest = nphase.swept_collide_stream(
        pos, dirn, seg_len2, state.radius, gather_fn, meta.max_tris_per_cell
    )
    hit = nearest.hit & (speed2 != 0.0)
    if active is not None:
        hit = hit & active

    new_pos, new_vel = nphase.spatial_response(
        pos, velo, dirn, hit, nearest.t, nearest.normal,
        gravity, dt, state.radius, state.restitution, backoff,
    )
    return state._replace(
        pos=new_pos,
        vel=new_vel,
        collisions=state.collisions + hit.astype(jnp.int32),
    )


def spatial_collide_packed(
    state: ParticleState,
    packed,
    meta,
    num_groups: int,
    group: int,
    gravity: jnp.ndarray,
    dt: float,
    backoff: float,
    active: Optional[jnp.ndarray] = None,
) -> ParticleState:
    """Grid spatial collision via the packed planar layout: one [2, N]
    cell gather + num_groups [group*9, N] axis-1 gathers per step (see
    ops.grid.PackedGrid for the layout rationale)."""
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        cell_index,
        lookup_pos,
    )

    pos, velo = state.pos, state.vel
    n = pos.shape[-1]
    speed2 = vec.norm2(velo)
    dirn = vec.normalize(velo)
    seg_len2 = speed2 * (dt * dt)

    cid = cell_index(lookup_pos(pos, velo, dt), meta)
    info = packed.cells[:, cid]  # [2, N] planar gather
    row0 = info[0]
    count = info[1]
    max_row = packed.rows.shape[1] - 1

    # Candidate axis goes on the SUBLANES, particles stay on the 128-wide
    # lanes: all narrow-phase arithmetic runs at [G, N] shape (G = 8 =
    # exactly the f32 sublane count).  The trailing-[.., G] layout wastes
    # 94% of the vector lanes -- measured as the dominant cost of the
    # first packed implementation.
    slot_idx = jnp.arange(group, dtype=jnp.int32)[:, None]  # [G, 1]
    p0b = pos[:, None, :]  # [3, 1, N]
    dirb = dirn[:, None, :]
    seg2b = seg_len2[None, :]  # [1, N]
    rb = state.radius[None, :]

    def body(g, acc):
        best_t2, best_t, best_n, any_hit = acc
        rows = packed.rows[:, jnp.clip(row0 + g, 0, max_row)]  # [G*9, N]
        r3 = rows.reshape(group, 9, n)  # [G, 9, N]
        v0 = jnp.stack([r3[:, 0], r3[:, 1], r3[:, 2]])  # [3, G, N]
        v1 = jnp.stack([r3[:, 3], r3[:, 4], r3[:, 5]])
        v2 = jnp.stack([r3[:, 6], r3[:, 7], r3[:, 8]])
        valid = (g * group + slot_idx) < count[None, :]  # [G, N]

        hits = nphase.particle_vs_triangles_pre(
            p0b, dirb, seg2b, v0, v1, v2, rb
        )
        hit_g = hits.hit & valid  # [G, N]
        t2_g = jnp.where(hit_g, hits.t2, jnp.inf)

        # fold the G candidates into the running nearest (sublane argmin)
        k_best = jnp.argmin(t2_g, axis=0)  # [N]
        tk = jnp.take_along_axis
        t2_j = tk(t2_g, k_best[None, :], axis=0)[0]
        t_j = tk(hits.t, k_best[None, :], axis=0)[0]
        n_j = tk(hits.normal, k_best[None, None, :], axis=1)[:, 0]
        take = t2_j < best_t2
        return (
            jnp.where(take, t2_j, best_t2),
            jnp.where(take, t_j, best_t),
            vec.where(take, n_j, best_n),
            any_hit | hit_g.any(axis=0),
        )

    init = (
        jnp.full((n,), jnp.inf, dtype=pos.dtype),
        jnp.full((n,), jnp.inf, dtype=pos.dtype),
        jnp.zeros((3, n), dtype=pos.dtype),
        jnp.zeros((n,), dtype=bool),
    )
    # adaptive trip count: only iterate to the densest cell actually
    # OCCUPIED by these particles (num_groups = ceil(K_max/group) is the
    # static worst case; when this runs as the window kernel's overflow
    # fallback the chunk's particles rarely touch the global-max cell)
    g_bound = jnp.minimum(
        (jnp.max(count) + group - 1) // group, num_groups
    ).astype(jnp.int32)

    def g_cond(c):
        return c[0] < g_bound

    def g_body(c):
        g, acc = c
        return g + 1, body(g, acc)

    _, (best_t2, best_t, best_n, any_hit) = jax.lax.while_loop(
        g_cond, g_body, (jnp.int32(0), init)
    )

    hit = any_hit & (best_t2 < jnp.inf) & (speed2 != 0.0)
    if active is not None:
        hit = hit & active

    new_pos, new_vel = nphase.spatial_response(
        pos, velo, dirn, hit, best_t, best_n,
        gravity, dt, state.radius, state.restitution, backoff,
    )
    return state._replace(
        pos=new_pos,
        vel=new_vel,
        collisions=state.collisions + hit.astype(jnp.int32),
    )


def make_spatial_step_grid(
    triangles, cfg: SimConfig, variant: str = "packed", group: int = 8
) -> StepFn:
    """Spatial method with the static CSR triangle grid broad phase.

    One cell lookup per particle, narrow phase over the cell's candidates,
    fused with the integrator in a single jitted step (the whole per-frame
    pipeline of ParticleSys.Update:445-492 with zero host sync).

    Variants (identical semantics, different memory behavior):
      * "packed" (production): packed-row gathers, ~(1 + K/G) gathers/step
      * "stream": one candidate slot per loop iteration, [N]-only shapes
      * "dense": materializing [N, K] gather (testing baseline)
    """
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        build_triangle_grid,
        gather_candidates,
        lookup_pos,
        pack_grid,
    )

    grid, meta = build_triangle_grid(triangles, cfg.grid)
    gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)

    if variant == "dense":

        @jax.jit
        def step(state: ParticleState) -> ParticleState:
            v0, v1, v2, mask = gather_candidates(
                grid, meta, lookup_pos(state.pos, state.vel, cfg.dt)
            )
            state = spatial_collide(
                state, v0, v1, v2, gravity, cfg.dt, cfg.backoff, cand_mask=mask
            )
            new_pos, new_vel = integrate(state.pos, state.vel, gravity, cfg.dt)
            return state._replace(pos=new_pos, vel=new_vel)

        return step

    if variant == "stream":

        @jax.jit
        def step(state: ParticleState) -> ParticleState:
            state = spatial_collide_stream(
                state, grid, meta, gravity, cfg.dt, cfg.backoff
            )
            new_pos, new_vel = integrate(state.pos, state.vel, gravity, cfg.dt)
            return state._replace(pos=new_pos, vel=new_vel)

        return step

    assert variant == "packed", variant
    packed, num_groups = pack_grid(grid, meta, group=group)

    @jax.jit
    def step(state: ParticleState) -> ParticleState:
        state = spatial_collide_packed(
            state, packed, meta, num_groups, group, gravity, cfg.dt, cfg.backoff
        )
        new_pos, new_vel = integrate(state.pos, state.vel, gravity, cfg.dt)
        return state._replace(pos=new_pos, vel=new_vel)

    return step


def make_screenspace_step(
    triangles, cfg: SimConfig, camera, normals=None
) -> StepFn:
    """Screen-space depth collision method (ParticleSys.cs:455-459 path).

    ``normals``: optional per-corner shading normals f32[T, 3, 3] for the
    pre-pass (NormalPrePass.shader interpolation); face normals otherwise.
    """
    from particlesystemhybridcollisiondetection_tpu.ops.screenspace import (
        bake_camera,
        screen_space_collide,
    )

    tex = bake_camera(triangles, camera, normals)
    gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)

    # tex enters as a traced ARGUMENT: closure capture embeds the ~33 MB
    # 1080p depth/normal textures as compile-time constants -- 25-59 MB
    # executables, minutes of remote compile, and a fresh compile per
    # camera (observed in the protocol run 2026-08-17)
    @jax.jit
    def _step(state: ParticleState, tex) -> ParticleState:
        state, _ = screen_space_collide(state, tex, gravity, cfg.dt)
        new_pos, new_vel = integrate(state.pos, state.vel, gravity, cfg.dt)
        return state._replace(pos=new_pos, vel=new_vel)

    def step(state: ParticleState) -> ParticleState:
        return _step(state, tex)

    return step


def make_hybrid_step(triangles, cfg: SimConfig, camera, normals=None) -> StepFn:
    """Hybrid method (ParticleSys.cs:622-639): screen-space stage, then the
    exact spatial stage restricted to the undecided set.

    The reference's atomic-append + indirect-dispatch plumbing
    (ComputeDispatchArgs.compute:9-21) exists to avoid a GPU->CPU readback;
    here the entire step is one compiled program, so the undecided set is
    just a mask on the dense second stage -- the same "exact fallback only
    where screen-space can't decide" capability with zero host sync by
    construction.
    """
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        build_triangle_grid,
        pack_grid,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.screenspace import (
        bake_camera,
        screen_space_collide,
    )

    tex = bake_camera(triangles, camera, normals)
    grid, meta = build_triangle_grid(triangles, cfg.grid)
    group = 8
    packed, num_groups = pack_grid(grid, meta, group=group)
    gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)

    # tex/packed as traced args, not closure constants (see
    # make_screenspace_step): one compile serves every camera
    @jax.jit
    def _step(state: ParticleState, tex, packed) -> ParticleState:
        state, undecided = screen_space_collide(
            state, tex, gravity, cfg.dt, hybrid=True
        )
        state = spatial_collide_packed(
            state, packed, meta, num_groups, group, gravity, cfg.dt,
            cfg.backoff, active=undecided,
        )
        new_pos, new_vel = integrate(state.pos, state.vel, gravity, cfg.dt)
        return state._replace(pos=new_pos, vel=new_vel)

    def step(state: ParticleState) -> ParticleState:
        return _step(state, tex, packed)

    return step


def make_p2p_step(
    box_lo,
    box_hi,
    cfg: SimConfig,
    cell_size: Optional[float] = None,
    capacity: int = 8,
    variant: str = "auto",
    with_stats: bool = False,
    max_radius: Optional[float] = None,
    window: int = 512,
    fallback_capacity: int = 8192,
) -> StepFn:
    """Gravity-box step with particle-particle collisions + container walls
    (driver benchmark configs 1/2/4/5; capability extension over the
    reference, which has no particle-particle interaction).

    Order per step: p2p impulses -> wall response -> integrate, keeping
    the collide-before-integrate convention.

    ``variant``: "kernel" (sorted 9-run block-window Pallas kernel, exact
    for any occupancy -- the TPU performance path), "sorted" (same runs
    evaluated by XLA gathers; the CPU/testing path), "slots" (27 x
    capacity gather loop), "dense" (the gather-free cell-table stencil;
    OOMs at 1M from trailing-dim tile padding), or "auto" (kernel on TPU,
    sorted elsewhere, when the grid shape permits; else slots).

    ``with_stats``: return ``(state, {"cell_overflow": i32})`` so
    saturated-cell drops (one-sided impulses) are observable (ADVICE r1).
    The sorted variant cannot saturate and always reports 0.
    ``max_radius``: largest particle radius in the state; the 27-cell
    stencil misses contacts when cell_size < 2 * max_radius, so this is
    asserted at build time (heterogeneous-radii runs must pass it).
    ``window``/``fallback_capacity``: kernel-variant tuning (per-sublane
    window size and exact-redo chunk size; see ops/p2p_sorted).  For the
    kernel variant the reported "cell_overflow" stat counts particles
    redone exactly by the window-overflow fallback (results stay exact).
    """
    from particlesystemhybridcollisiondetection_tpu.core.state import active_mask
    from particlesystemhybridcollisiondetection_tpu.ops import p2p as p2p_ops
    from particlesystemhybridcollisiondetection_tpu.ops import p2p_sorted as p2ps
    from particlesystemhybridcollisiondetection_tpu.ops import pgrid as pg
    from particlesystemhybridcollisiondetection_tpu.ops.p2p_dense import (
        p2p_collide_dense,
    )

    h = cell_size
    gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)
    r_max = cfg.particle_radius if max_radius is None else float(max_radius)
    if h is None:
        h = 2.0 * r_max
    assert h >= 2.0 * r_max - 1e-6, (
        f"cell_size {h} < 2 * max radius {r_max}: the 27-cell stencil "
        "would miss contacts between large particles in non-adjacent cells"
    )
    meta = pg.make_meta(box_lo, box_hi, h, capacity=capacity)
    if variant == "auto":
        if meta.dims[2] >= 3:
            variant = "kernel" if jax.default_backend() == "tpu" else "sorted"
        else:
            variant = "slots"
    if variant == "kernel":
        # TWO jitted programs per step, split between the Pallas kernel
        # and the fallback/response: the monolithic program crashed the
        # TPU worker nondeterministically at 1M (see p2p_window_phase1's
        # docstring).  One extra dispatch (~100 us) per step.
        p2ps.check_meta(meta)

        @jax.jit
        def _phase1(state: ParticleState):
            return p2ps.p2p_window_phase1(
                state, meta, active=active_mask(state), window=window
            )

        @jax.jit
        def _phase2(state: ParticleState, parts):
            state, overflow = p2ps.p2p_window_phase2(
                state, parts, fallback_capacity=fallback_capacity
            )
            state = p2p_ops.box_walls_collide(
                state, box_lo, box_hi, gravity, cfg.dt
            )
            new_pos, new_vel = integrate(state.pos, state.vel, gravity, cfg.dt)
            out = state._replace(pos=new_pos, vel=new_vel)
            return out, {"cell_overflow": overflow}

        def _step(state: ParticleState):
            return _phase2(state, _phase1(state))

    else:
        if variant == "sorted":
            p2ps.check_meta(meta)
            collide = p2ps.p2p_collide_sorted
        elif variant == "dense":
            collide = p2p_collide_dense
        else:
            assert variant == "slots", variant
            collide = p2p_ops.p2p_collide

        @jax.jit
        def _step(state: ParticleState):
            act = active_mask(state)
            state, overflow = collide(state, meta, active=act)
            state = p2p_ops.box_walls_collide(
                state, box_lo, box_hi, gravity, cfg.dt
            )
            new_pos, new_vel = integrate(state.pos, state.vel, gravity, cfg.dt)
            out = state._replace(pos=new_pos, vel=new_vel)
            return out, {"cell_overflow": overflow}

    if with_stats:
        def step(state: ParticleState):
            return _step(state)
    else:
        def step(state: ParticleState) -> ParticleState:
            return _step(state)[0]

    return step


def make_p2p_episode_runner(
    box_lo,
    box_hi,
    cfg: SimConfig,
    cell_size: Optional[float] = None,
    capacity: int = 8,
    max_radius: Optional[float] = None,
    *,
    window: int = 512,
    fallback_capacity: int = 8192,
    interpret: bool = False,
):
    """Gravity-box episode runner with PERSISTENT sorted order: the p2p
    analog of make_sorted_episode_runner (same contact model and step
    composition as make_p2p_step's kernel variant).

    Unlike the spatial runner there is no lazy re-sort: the p2p candidate
    runs are CSR segments over the PARTICLES themselves, so exact cell
    grouping is a correctness requirement, not a locality hint -- every
    step sorts.  What persisting the order removes is the per-step order
    RESTORATION (inverse-permutation sort + [7, N] unsort gather) and the
    per-step sentinel pad concat: the carried [8, n_k] rows stay in the
    previous step's sorted order and the original order is restored once,
    at episode end.  Still TWO jitted programs per step (see
    p2p_window_phase1's crash rationale).

    Returns ``run(state, num_steps) -> state`` (original order; collision
    counts accumulated).
    """
    from particlesystemhybridcollisiondetection_tpu.config import FLOAT_SENTINEL
    from particlesystemhybridcollisiondetection_tpu.ops import p2p as p2p_ops
    from particlesystemhybridcollisiondetection_tpu.ops import p2p_sorted as p2ps
    from particlesystemhybridcollisiondetection_tpu.ops import pgrid as pg
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.p2p_window_kernel import (
        BLOCK,
    )

    gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)
    r_max = cfg.particle_radius if max_radius is None else float(max_radius)
    h = 2.0 * r_max if cell_size is None else cell_size
    assert h >= 2.0 * r_max - 1e-6, (
        f"cell_size {h} < 2 * max radius {r_max}"
    )
    meta = pg.make_meta(box_lo, box_hi, h, capacity=capacity)
    p2ps.check_meta(meta)

    @jax.jit
    def _phase1(rows8):
        active = jnp.abs(rows8[0]) < FLOAT_SENTINEL * 0.5
        cx, cy, cz = pg.cell_coords(rows8[0:3], meta)
        cid = pg.linear_cell(cx, cy, cz, meta)
        cid_key = jnp.where(active, cid, meta.num_cells)
        return p2ps._phase1_core(
            rows8, cid_key, meta, beta=0.5, window=window,
            interpret=interpret,
        )

    @jax.jit
    def _phase2(parts, aux):
        pos_k, vel_k, ncon_k, rows_s, starts, cnt, overflow, perm = parts
        n_k = rows_s.shape[-1]
        pos_k, vel_k, ncon_k, n_over = p2ps._p2p_chunked_fallback(
            (pos_k, vel_k, ncon_k), rows_s, starts, cnt, overflow, 0.5,
            min(fallback_capacity, n_k),
        )
        aux_s = aux[:, perm]
        # walls + integrate are elementwise: run them in sorted order
        st = ParticleState(
            pos=pos_k,
            vel=vel_k,
            collisions=aux_s[0],
            radius=rows_s[6],
            restitution=rows_s[7],
        )
        st = p2p_ops.box_walls_collide(st, box_lo, box_hi, gravity, cfg.dt)
        new_pos, new_vel = integrate(st.pos, st.vel, gravity, cfg.dt)
        rows_out = jnp.concatenate([new_pos, new_vel, rows_s[6:8]], axis=0)
        aux_out = jnp.stack([aux_s[0] + ncon_k, aux_s[1]])
        return rows_out, aux_out, n_over

    @jax.jit
    def _restore(rows8, aux):
        n_k = rows8.shape[-1]
        _, inv = jax.lax.sort(
            (aux[1], jnp.arange(n_k, dtype=jnp.int32)), num_keys=1
        )
        return rows8[:, inv], aux[:, inv]

    def run(state: ParticleState, num_steps: int) -> ParticleState:
        n = state.pos.shape[-1]
        n_k = ((n + BLOCK - 1) // BLOCK) * BLOCK
        rows8 = jnp.concatenate(
            [
                state.pos,
                state.vel,
                state.radius[None],
                state.restitution[None],
            ],
            axis=0,
        )
        if n_k > n:
            rows8 = jnp.concatenate(
                [rows8, p2ps._pad_columns(n_k - n)], axis=1
            )
        aux = jnp.stack(
            [
                jnp.concatenate(
                    [
                        state.collisions,
                        jnp.zeros((n_k - n,), dtype=jnp.int32),
                    ]
                ),
                jnp.arange(n_k, dtype=jnp.int32),
            ]
        )
        for _ in range(num_steps):
            rows8, aux, _ = _phase2(_phase1(rows8), aux)
        rows8, aux = _restore(rows8, aux)
        return state._replace(
            pos=rows8[0:3, :n],
            vel=rows8[3:6, :n],
            collisions=aux[0, :n],
        )

    return run


def _window_plan(cid_s, cells2, window: int, nb: int, active_s=None,
                 demote=None):
    """Per-SUBLANE window geometry for the sorted kernel.

    Each row of 128 sorted particles gets its own window (round 1 used
    one per 1024-particle block; dense scenes overflowed it -- see
    window_kernel.py step 3).  Returns (rel, count, ws, k_cap, overflow):
    each particle's CSR range relative to its own sublane's window start
    (ws: i32[nb, 8]), the per-block candidate loop bound, and the bool[N]
    mask of particles whose candidate rows do not fit their window
    (handled exactly by the chunked fallback).
    """
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        LANE,
        SUB,
    )

    n = cid_s.shape[0]
    # planar [2, C] axis-1 gather: ~6.3 ns/index on v5e (6.3 ms at 1M --
    # see BASELINE.md gather notes); the coded-plan variant below moves
    # this lookup into a Pallas kernel and is the TPU default
    info = cells2[:, cid_s]  # [2, N]
    start = info[0]
    count = info[1]
    if active_s is not None:
        count = jnp.where(active_s, count, 0)  # decided -> no candidates
    return _plan_tail(start, count, window, nb, demote=demote)


def _plan_tail(start, count, window: int, nb: int, miss=None, demote=None):
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        LANE,
        SUB,
    )

    n = start.shape[0]
    big = jnp.int32(1 << 30)
    sb = jnp.where(count > 0, start, big).reshape(nb * SUB, LANE)
    ws = jnp.min(sb, axis=1)
    ws = jnp.where(ws == big, 0, ws)
    ws = (ws // 128) * 128  # HBM DMA slices must be lane-aligned
    rel = start - jnp.broadcast_to(ws[:, None], (nb * SUB, LANE)).reshape(n)
    rel = jnp.where(count > 0, rel, 0)
    overflow = (count > 0) & ((rel < 0) | (rel + count > window))
    if miss is not None:
        overflow = overflow | miss
    if demote is not None:
        # dense-cell demotion: lanes in cells denser than ``demote`` go
        # straight to the rescue pass, where same-cell particles share a
        # sublane; in the MAIN kernel one dense cell would inflate the
        # whole 1024-particle block's trip count (see _chunked_rescue)
        overflow = overflow | (count > demote)
    # Overflow lanes are fully redone by the rescue/fallback pass, so the
    # main kernel skips them: ZEROED counts tighten each block's adaptive
    # k_cap (one dense/overflowing cell no longer sets all 1024 lanes'
    # candidate-loop bound).  ws stays anchored to the pre-zeroing counts
    # so the non-overflow lanes' rel values are unchanged.
    ovf_count = count  # pre-zeroing: orders the rescue compaction by density
    count = jnp.where(overflow, 0, count)
    k_cap = jnp.max(count.reshape(nb, SUB * LANE), axis=1)
    rel = jnp.where(count > 0, rel, 0)
    rel = jnp.clip(rel, 0, window - 1)
    return rel, count, ws.reshape(nb, SUB), k_cap, overflow, ovf_count


_CODE_WC = 512  # per-sublane code-window size (bunny 1M settled: p99
#                 span 291 codes, <=0.4% of particles miss at 512)


def _window_plan_coded(
    key_s, ctab, window: int, nb: int, *, interpret: bool = False,
    active_s=None, demote=None,
):
    """_window_plan with the (start, count) lookup done by the Pallas
    cells-window kernel instead of the ~6.3 ns/index XLA gather: sorted
    particles' Morton codes are sublane-compact, so each sublane DMAs a
    [1, _CODE_WC] slice of the code-indexed table and gathers in-register
    (ops/pallas/window_kernel.py::cells_window_lookup).  Lookup misses
    (code past the sublane window, or count>=255 cells) are folded into
    the overflow mask -> exact fallback."""
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        LANE,
        SUB,
        cells_window_lookup,
    )

    rows = key_s.reshape(nb * SUB, LANE)
    # two windows per sublane: anchored at the row min and ENDING at the
    # row max -- drifted settled rows go bimodal in code space (lock-step
    # cell-boundary oscillation; see _cells_kernel), and min-only windows
    # then miss ~90% of the pile
    lo = (jnp.min(rows, axis=1) // 128) * 128
    hi = jnp.maximum(
        ((jnp.max(rows, axis=1) - _CODE_WC + 128) // 128) * 128, 0
    )
    start, count = cells_window_lookup(
        key_s, lo.reshape(-1).astype(jnp.int32),
        hi.reshape(-1).astype(jnp.int32), ctab,
        wc=_CODE_WC, interpret=interpret,
    )
    miss = count < 0
    count = jnp.where(miss, 0, count)
    if active_s is not None:
        count = jnp.where(active_s, count, 0)
        miss = miss & active_s  # decided particles skip the exact stage
    return _plan_tail(start, count, window, nb, miss=miss, demote=demote)


def _maybe_code_table(grid, meta, cells_lookup: str):
    """Build the code-indexed cells table when the in-kernel lookup is
    requested ("kernel") or auto-enabled: TPU backend + pair count under
    the 24-bit packed-start limit + dims within the 10-bit Morton range.

    Dense cells (count >= 255) no longer gate the table: build_code_table
    saturates their count to the 255 miss sentinel, and since the
    two-phase Morton-compacted rescue landed (round 3) those lanes are
    exactly the ones ``demote`` routes to the rescue pass anyway.

    Plan choice on the DRAGON, measured 2026-08-20 (1M settled, 64
    steps, resort_every=8 -- BASELINE.md round-5 notes): the coded plan
    LOSES to the gather plan there, 29.9 vs 25.3 ms/step (its lookup
    misses on the dragon's multi-modal settled rows feed overflow:
    p50 17.4k vs 12.0k, max 51k vs 17k).  The two-phase rescue + dual
    code windows narrowed round 3's 78-vs-32 gap but did not flip it.
    The table is still BUILT under "auto" so the adaptive episode
    executor (bench/harness.py::PlanChooser) can probe both plans and
    keep the winner per phase; a pinned cells_lookup="kernel" on
    dragon-class colliders is a known-slower static choice at settled
    occupancy."""
    import numpy as _np

    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        _CODE_TABLE_MAX,
        build_code_table,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        _morton_spread,
    )

    pairs = int(_np.asarray(grid.offsets)[-1])
    # max possible Morton code for this grid (each axis bit position is
    # maximal at coord dims-1), so the table-size check needs no code scan
    dx, dy, dz = (int(d) - 1 for d in meta.dims)
    code_max = int(
        _np.int64(_morton_spread(_np.int32(dx)))
        | (_np.int64(_morton_spread(_np.int32(dy))) << 1)
        | (_np.int64(_morton_spread(_np.int32(dz))) << 2)
    )
    fits = (
        pairs < (1 << 24)
        # 10-bit Morton range: dims > 1024 would ALIAS distinct cells
        # onto one code (silent wrong lookups -- build_code_table asserts)
        and max(meta.dims) <= 1024
        and code_max + 1 + _CODE_WC + 128 <= _CODE_TABLE_MAX
    )
    if cells_lookup == "kernel":
        use = True  # explicit request: let build_code_table's asserts bind
    elif cells_lookup == "auto":
        use = jax.default_backend() == "tpu" and fits
    else:
        use = False
    return build_code_table(grid, meta, _CODE_WC) if use else None


# Bounded-compaction buffer for the phase-1 rescue order
# (_chunked_rescue(rescue_compact=True)): settled drift overflow is
# 1-20k lanes at 1M, so a 64k buffer covers it with a runtime argsort
# fallback for rain-regime spikes.
_COMPACT_CAP = 65536


def _chunked_rescue(
    kernel_out,
    sorted_state,
    overflow,
    tables,
    packed,
    meta,
    num_groups: int,
    group: int,
    gravity,
    cfg: SimConfig,
    m_cap: int,
    *,
    window: int,
    rescue_window: int,
    key_s=None,
    ovf_count=None,
    kernel_chunk: int = 8192,
    rescue_compact: bool = False,
    interpret: bool = False,
):
    """Exact redo for window-overflow particles, in two phases.

    Round 2 ran the packed XLA narrow phase on every overflow particle
    (~0.33 us/particle measured at 1M settled); its cost dominated
    settled-phase steps (VERDICT r2 weak #2) once drift between lazy
    re-sorts pushed overflow to 13-17k/step.  A second PAIRS window
    inside the main kernel rescues only 38-41% (multi-modal drift,
    benchmarks/study_pair_windows.py), and density-first compaction
    (round 3, first cut) fits the rescue kernel's windows only 3-15%
    because ordering by density DESTROYS row locality.  The measured
    fix (benchmarks/study_rescue_cost.py, 2026-08-18): compact overflow
    by the CURRENT Morton code -- pair rows are in Morton cell order, so
    consecutive overflow particles cover a compact row range and fit a
    fresh per-sublane window 82-91% of the time (rw=1024/2048) even for
    scattered drift overflow.  Hence:

    Phase 1 (kernel rescue, ``kernel_chunk``-sized chunks): compact
    overflow lanes in current-Morton order (``key_s``), gather fresh
    (start, count) from the cells table (this also repairs coded-plan
    lookup misses, which carry no (start, count) at all), and re-run the
    SAME Pallas window kernel with ``rescue_window``-row windows --
    bit-identical math to the main pass, so a particle's result does not
    depend on which pass computed it (see
    benchmarks/study_hybrid_divergence.py for what estimator-switching
    used to cost).  A per-chunk gate skips the kernel when its windows
    cannot decide a majority (pathologically scattered chunks).

    Phase 2 (packed XLA, ``m_cap``-sized chunks, only if anything is
    left): lanes whose rescue window STILL overflows are compacted
    densest-cells-first (concentrating expensive cells into few chunks;
    each chunk's adaptive group bound then only pays for what it holds)
    and take the packed narrow phase.  The whole phase -- including its
    argsort -- is skipped by ``lax.cond`` when phase 1 decided everything.

    Exact for ANY overflow count (the while_loops walk every chunk; when
    nothing overflows no body runs and the step pays one argsort).

    kernel_out: (pos_k [3,N], vel_k [3,N], hit_k i32[N]) from the window
    kernel.  sorted_state: (pos_s, vel_s, radius_s, restit_s) in sorted
    order.  key_s: current-position Morton codes (the phase-1 compaction
    key); None skips phase 1 entirely.  Returns (pos_k, vel_k, hit_k,
    n_over).
    """
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        cell_index,
        lookup_pos,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        BLOCK,
        window_collide_sorted,
    )

    pos_k, vel_k, hit_k = kernel_out
    pos_s, vel_s, radius_s, restit_s = sorted_state
    n = pos_s.shape[-1]
    n_over = jnp.sum(overflow.astype(jnp.int32))
    big = jnp.int32(1 << 30)
    still = overflow

    if key_s is not None:
        # ---- phase 1: Morton-compacted kernel rescue ----
        m1 = max(BLOCK, (min(kernel_chunk, n) // BLOCK) * BLOCK)
        nb1 = m1 // BLOCK

        def p1_cond(carry):
            return carry[0] * m1 < n_over

        def p1_body(carry):
            c, ord1, pos_k, vel_k, hit_k, still = carry
            pick = jax.lax.dynamic_slice(ord1, (c * m1,), (m1,))
            redo = overflow[pick]
            pos_c = pos_s[:, pick]
            vel_c = vel_s[:, pick]
            rad_c = radius_s[pick]
            res_c = restit_s[pick]
            # fresh (start, count): m1-index planar gather (midpoint
            # lookup, same anchor as the main plan)
            info = tables.cells2[:, cell_index(
                lookup_pos(pos_c, vel_c, cfg.dt), meta)]
            count_c = jnp.where(redo, info[1], 0)  # padding lanes inert
            rel, cnt, ws, k_cap, unfit, _ = _plan_tail(
                info[0], count_c, rescue_window, nb1
            )
            n_redo = jnp.sum(redo.astype(jnp.int32))
            n_unfit = jnp.sum(unfit.astype(jnp.int32))
            use_kernel = n_unfit * 2 < n_redo

            def with_kernel(_):
                return window_collide_sorted(
                    pos_c, vel_c, rad_c, res_c, rel, cnt, ws, k_cap,
                    tables, w=rescue_window,
                    k_static=meta.max_tris_per_cell,
                    gravity=cfg.gravity, dt=cfg.dt, backoff=cfg.backoff,
                    interpret=interpret,
                )

            def without_kernel(_):
                # placeholders: every redo lane stays in ``still`` and is
                # overwritten by phase 2
                return pos_c, vel_c, jnp.zeros((m1,), dtype=jnp.int32)

            pos_o, vel_o, hit_o = jax.lax.cond(
                use_kernel, with_kernel, without_kernel, None
            )
            decided = redo & ~unfit & use_kernel
            pos_k = pos_k.at[:, pick].set(
                jnp.where(decided[None], pos_o, pos_k[:, pick])
            )
            vel_k = vel_k.at[:, pick].set(
                jnp.where(decided[None], vel_o, vel_k[:, pick])
            )
            hit_k = hit_k.at[pick].set(
                jnp.where(decided, hit_o, hit_k[pick])
            )
            still = still.at[pick].set(redo & ~decided)
            return c + 1, ord1, pos_k, vel_k, hit_k, still

        def _ord_argsort():
            # The argsort must key on CURRENT Morton codes: a round-5
            # attempt at a lane-order cumsum+scatter compaction (lane
            # order = last re-sort's Morton order) ran 3x SLOWER overall
            # (10.3 -> 29.9 ms/step settled 1M) -- the overflow
            # population is exactly the DRIFTED lanes, so their stale
            # lane order has no current row locality, the phase-1 fit
            # collapses, and everything cascades into m_cap-sized
            # phase-2 chunks.  Recorded negative; key-order is required.
            return jnp.argsort(jnp.where(overflow, key_s, big), stable=True)

        def _ord_compact():
            # Bounded compaction (round 5, rescue_compact=True): the
            # full-N argsort costs ~2 ms at 1M and is the rescue's
            # dominant FIXED cost (roofline refit, BASELINE.md round-5),
            # but settled overflow is only 1-20k lanes.  Scatter the
            # overflow lanes by cumsum rank into a _COMPACT_CAP buffer
            # (lane order), then sort just that buffer by current Morton
            # key -- identical order to the argsort restricted to
            # overflow lanes (stable tie-break by lane in both).  Tail
            # entries beyond n_over are filled with NON-overflow lanes
            # (like the argsort's tail), so the partial last chunk's
            # padding lanes have redo=False and every write is a no-op;
            # the chunk loop never reads past n_over otherwise.
            lanes = jnp.arange(n, dtype=jnp.int32)
            ovf_i = overflow.astype(jnp.int32)
            rank = jnp.cumsum(ovf_i) - 1
            cap = _COMPACT_CAP
            slot = jnp.where(overflow & (rank < cap), rank, cap)
            keys_c = jnp.full((cap,), big, dtype=key_s.dtype).at[slot].set(
                key_s, mode="drop"
            )
            idx_c = jnp.zeros((cap,), jnp.int32).at[slot].set(
                lanes, mode="drop"
            )
            _, ord_c = jax.lax.sort((keys_c, idx_c), num_keys=1)
            rank_n = jnp.cumsum(1 - ovf_i) - 1
            slot_n = jnp.where((~overflow) & (rank_n < cap), rank_n, cap)
            pad_c = jnp.zeros((cap,), jnp.int32).at[slot_n].set(
                lanes, mode="drop"
            )
            pos_in = jnp.arange(n, dtype=jnp.int32)
            tail = pad_c[jnp.maximum(pos_in - n_over, 0) % cap]
            return jnp.where(
                pos_in < n_over, ord_c[jnp.minimum(pos_in, cap - 1)], tail
            )

        def phase1(args):
            pos_k, vel_k, hit_k, still = args
            # Compaction order computed INSIDE the cond: the 1M argsort
            # (~2 ms) used to run unconditionally, taxing zero-overflow
            # steps (the whole free-fall phase) for a rescue that never
            # fires.
            if rescue_compact and n >= 2 * _COMPACT_CAP:
                # runtime fallback: overflow beyond the buffer (rain
                # regimes) takes the exact full argsort
                ord1 = jax.lax.cond(
                    n_over > _COMPACT_CAP, _ord_argsort, _ord_compact
                )
            else:
                ord1 = _ord_argsort()
            _, _, pos_k, vel_k, hit_k, still = jax.lax.while_loop(
                p1_cond, p1_body,
                (jnp.int32(0), ord1, pos_k, vel_k, hit_k, still),
            )
            return pos_k, vel_k, hit_k, still

        pos_k, vel_k, hit_k, still = jax.lax.cond(
            n_over > 0, phase1, lambda args: args,
            (pos_k, vel_k, hit_k, still),
        )

    # ---- phase 2: packed XLA on whatever is left ----
    n_still = jnp.sum(still.astype(jnp.int32))
    m2 = max(BLOCK, (min(m_cap, n) // BLOCK) * BLOCK)
    density = jnp.zeros((n,), jnp.int32) if ovf_count is None else ovf_count

    def phase2(args):
        pos_k, vel_k, hit_k = args
        ord2 = jnp.argsort(jnp.where(still, -density, big), stable=True)

        def p2_cond(carry):
            return carry[0] * m2 < n_still

        def p2_body(carry):
            c, pos_k, vel_k, hit_k = carry
            pick = jax.lax.dynamic_slice(ord2, (c * m2,), (m2,))
            redo = still[pick]
            pos_c = pos_s[:, pick]
            vel_c = vel_s[:, pick]
            rad_c = radius_s[pick]
            res_c = restit_s[pick]
            # sentinel positions for non-redo lanes keep their (dense)
            # cells out of the packed pass's adaptive group bound
            mini = ParticleState(
                pos=jnp.where(redo[None], pos_c, 1.0e38),
                vel=vel_c,
                collisions=jnp.zeros((m2,), dtype=jnp.int32),
                radius=rad_c,
                restitution=res_c,
            )
            mini = spatial_collide_packed(
                mini, packed, meta, num_groups, group, gravity, cfg.dt,
                cfg.backoff, active=redo,
            )
            fb_pos, fb_vel = integrate(mini.pos, mini.vel, gravity, cfg.dt)
            pos_k = pos_k.at[:, pick].set(
                jnp.where(redo[None], fb_pos, pos_k[:, pick])
            )
            vel_k = vel_k.at[:, pick].set(
                jnp.where(redo[None], fb_vel, vel_k[:, pick])
            )
            hit_k = hit_k.at[pick].set(
                jnp.where(redo, mini.collisions, hit_k[pick])
            )
            return c + 1, pos_k, vel_k, hit_k

        _, pos_k, vel_k, hit_k = jax.lax.while_loop(
            p2_cond, p2_body, (jnp.int32(0), pos_k, vel_k, hit_k)
        )
        return pos_k, vel_k, hit_k

    pos_k, vel_k, hit_k = jax.lax.cond(
        n_still > 0, phase2, lambda args: args, (pos_k, vel_k, hit_k)
    )
    return pos_k, vel_k, hit_k, n_over


def make_hybrid_step_sorted(
    triangles,
    cfg: SimConfig,
    camera,
    normals=None,
    *,
    window: int | None = None,
    fallback_capacity: int = 1024,
    interpret: bool = False,
    with_stats: bool = False,
    mesh=None,
    axis_name: str = "data",
    cells_lookup: str = "auto",
    dense_demote: "int | None | str" = "auto",
) -> StepFn:
    """Hybrid method with the sorted block-window Pallas kernel as the
    exact fallback stage.

    The screen-space stage runs in XLA (pure gathers, cheap); undecided
    particles then go through the sorted spatial pipeline with their
    candidate counts zeroed for decided particles -- the mask costs
    nothing because the kernel's per-block candidate loop adapts to the
    live counts.  Integration is fused into the kernel for everyone.

    ``mesh``: optional 1-D mesh for multi-chip data parallelism (see
    make_spatial_step_sorted: per-shard sort inside shard_map, replicated
    scene/texture tables, psum'd stats).
    """
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        build_triangle_grid,
        cell_index,
        lookup_pos,
        morton_key,
        pack_grid,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        BLOCK,
        build_window_tables,
        window_collide_sorted,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.screenspace import (
        bake_camera,
        screen_space_collide,
    )

    tex = bake_camera(triangles, camera, normals)
    grid, meta = build_triangle_grid(triangles, cfg.grid)
    window = _auto_window(window, meta)
    # rescue window: large enough to cover the densest cell (the
    # rescue pass re-windows COMPACTED overflow particles, so only
    # single-cell spans matter -- see _chunked_rescue); never below
    # the main window
    rescue_window = max(window, _auto_window(None, meta), 2048)
    dense_demote = _auto_demote(dense_demote, meta)
    tables = build_window_tables(grid, meta, max(window, rescue_window))
    ctab = _maybe_code_table(grid, meta, cells_lookup)
    group = 8
    packed, num_groups = pack_grid(grid, meta, group=group)
    gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)
    m_cap = fallback_capacity

    def _body(state: ParticleState, tex, tables, packed, ctab):
        state, undecided = screen_space_collide(
            state, tex, gravity, cfg.dt, hybrid=True
        )
        pos, vel = state.pos, state.vel
        n = pos.shape[-1]
        assert n % BLOCK == 0, n
        nb = n // BLOCK

        # sort by MORTON key of the travel-segment MIDPOINT (3D-local
        # cells stay row-adjacent in the morton-ordered pair table; see
        # ops.grid.morton_key / lookup_pos); cells2 is still indexed by
        # the linear cell id
        key = morton_key(lookup_pos(pos, vel, cfg.dt), meta)
        ids = jnp.arange(n, dtype=jnp.int32)
        key_s, perm = jax.lax.sort((key, ids), num_keys=1)
        rows = jnp.concatenate(
            [pos, vel, state.radius[None], state.restitution[None],
             undecided[None].astype(jnp.float32)],
            axis=0,
        )  # [9, N]
        rows_s = rows[:, perm]
        pos_s = rows_s[0:3]
        vel_s = rows_s[3:6]
        radius_s = rows_s[6]
        restit_s = rows_s[7]
        active_s = rows_s[8] > 0.5

        if ctab is not None:
            rel, count, ws, k_cap, overflow, ovf_count = _window_plan_coded(
                key_s, ctab, window, nb, interpret=interpret,
                active_s=active_s, demote=dense_demote,
            )
        else:
            # linear cell id recomputed from the PERMUTED positions:
            # cheaper than carrying it as a third sort payload
            cid_s = cell_index(lookup_pos(pos_s, vel_s, cfg.dt), meta)
            rel, count, ws, k_cap, overflow, ovf_count = _window_plan(
                cid_s, tables.cells2, window, nb, active_s=active_s,
                demote=dense_demote,
            )

        pos_k, vel_k, hit_k = window_collide_sorted(
            pos_s, vel_s, radius_s, restit_s, rel, count, ws, k_cap, tables,
            w=window, k_static=meta.max_tris_per_cell,
            gravity=cfg.gravity, dt=cfg.dt, backoff=cfg.backoff,
            interpret=interpret,
        )

        pos_k, vel_k, hit_k, n_over = _chunked_rescue(
            (pos_k, vel_k, hit_k),
            (pos_s, vel_s, radius_s, restit_s),
            overflow, tables, packed, meta, num_groups, group, gravity, cfg,
            m_cap, window=window, rescue_window=rescue_window,
            key_s=key_s, ovf_count=ovf_count,
            interpret=interpret,
        )

        out_rows = jnp.concatenate(
            [pos_k, vel_k, hit_k[None].astype(jnp.float32)], axis=0
        )  # [7, N]
        # unsort via inverse-permutation GATHER: scatter was measured 43 ms
        # at 1M (2/3 of the step); a second sort + gather is ~7 ms
        _, inv_perm = jax.lax.sort(
            (perm, jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )
        unsorted = out_rows[:, inv_perm]
        out = state._replace(
            pos=unsorted[0:3],
            vel=unsorted[3:6],
            collisions=state.collisions + unsorted[6].astype(jnp.int32),
        )
        return out, {"window_overflow": n_over}

    _step = _jit_maybe_sharded(_body, mesh, axis_name)

    if with_stats:
        def step(state: ParticleState):
            return _step(state, tex, tables, packed, ctab)
    else:
        def step(state: ParticleState) -> ParticleState:
            return _step(state, tex, tables, packed, ctab)[0]

    return step


def make_method_step(
    scene, method, camera_index: int = 0, spatial_variant: str = "auto",
    cells_lookup: str = "auto",
) -> StepFn:
    """Factory over the three collision methods (ParticleSys.cs:667-698).

    ``spatial_variant``: "auto" picks the sorted block-window Pallas
    pipeline on TPU (the performance path) and the packed XLA path
    elsewhere; or name one of sorted/packed/stream/dense explicitly.

    ``cells_lookup``: (start, count) lookup plan for the sorted variants
    ("auto" / "gather" / "kernel"); the non-sorted variants have no such
    plan and ignore it.
    """
    from particlesystemhybridcollisiondetection_tpu.config import Method

    method = Method(method)
    cfg = scene.config
    check_speed_cover(cfg)  # fail loudly if the episode outruns the grid
    if method == Method.SPATIAL:
        v = spatial_variant
        if v == "auto":
            v = "sorted" if jax.default_backend() == "tpu" else "packed"
        if v == "sorted":
            return make_spatial_step_sorted(
                scene.triangles, cfg, cells_lookup=cells_lookup
            )
        return make_spatial_step_grid(scene.triangles, cfg, variant=v)
    camera = scene.cameras[camera_index]
    normals = getattr(scene, "corner_normals", None)
    if method == Method.SCREEN_SPACE:
        return make_screenspace_step(scene.triangles, cfg, camera, normals)
    v = spatial_variant
    if v == "auto":
        v = "sorted" if jax.default_backend() == "tpu" else "packed"
    if v == "sorted":
        return make_hybrid_step_sorted(
            scene.triangles, cfg, camera, normals, cells_lookup=cells_lookup
        )
    return make_hybrid_step(triangles=scene.triangles, cfg=cfg, camera=camera, normals=normals)


def check_speed_cover(cfg: SimConfig, num_steps: int | None = None,
                      state: ParticleState | None = None,
                      strict: bool = False) -> float:
    """Binning-invariant guard (ADVICE r4): complain LOUDLY when an
    episode could outrun the midpoint swept lookup instead of silently
    dropping contacts.

    The grid bins triangles ``expand`` around each cell; queries key on
    the travel-segment midpoint (ops.grid.lookup_pos), so a particle is
    covered only while ``radius + |v|*dt/2 <= expand``.  Benchmark
    presets assume spawn at rest and restitution <= 1 (collisions never
    add speed beyond the -g*dt precompensation), so the episode speed
    bound is ``|v_entry| + g*dt*num_steps``.  This checks that bound
    against the config's covered speed ``2*(expand - radius)/dt``.

    On violation: ``strict=False`` (build-time default) warns -- the
    bound keys on ``cfg.lifetime_steps``, a declared worst case that
    short diagnostic runs (e.g. deliberately-inflated dt in the overflow
    tests) never reach; ``strict=True`` raises.  The PSYS_SPEED_GUARD=1
    dynamic check on the episode runners is strict: there the entry
    state's measured max speed and the actual requested steps make the
    bound real, not declared.

    ``state=None`` (the default) assumes spawn at rest; passing the
    entry state costs one device readback, so it is not on the timed
    path by default.  Returns the episode speed bound (u/s).
    """
    g = float(jnp.linalg.norm(jnp.asarray(cfg.gravity)))
    steps = cfg.lifetime_steps if num_steps is None else num_steps
    v_entry = 0.0
    if state is not None:
        v_entry = float(jnp.sqrt(jnp.max(jnp.sum(state.vel * state.vel,
                                                 axis=0))))
    v_bound = v_entry + g * cfg.dt * steps
    covered = 2.0 * (cfg.grid.expand - cfg.particle_radius) / cfg.dt
    if v_bound > covered:
        msg = (
            f"episode speed bound {v_bound:.1f} u/s exceeds the midpoint "
            f"swept-lookup cover 2*(expand - radius)/dt = {covered:.1f} "
            f"u/s (expand={cfg.grid.expand}, radius={cfg.particle_radius}, "
            f"dt={cfg.dt}, steps={steps}, entry speed {v_entry:.1f}); "
            "raise grid.expand or shorten the episode -- particles above "
            "the cover speed silently miss binned triangles (tunneling)"
        )
        if strict:
            raise ValueError(msg)
        import warnings

        warnings.warn(msg)
    return v_bound


def _auto_demote(demote, meta) -> int | None:
    """Resolve the dense-cell demotion threshold.

    "auto": off for low-density scenes (bunny-class, every cell fits the
    window comfortably -- demotion would only add rescue chunks), on for
    dense-cell scenes (dragon-class, max cell count > 255): there, one
    dense cell inside a mixed block sets the whole block's candidate-loop
    bound, so routing dense-cell lanes to the rescue pass (where they
    pack into their own blocks) cuts the main kernel's block-iteration
    total (measured on the 398k-tri dragon stand-in; see BASELINE.md
    round-3 notes).
    """
    if demote != "auto":
        return demote
    if meta.max_tris_per_cell > 255:
        return 192
    return None


def _auto_window(window, meta) -> int:
    """Pick the per-sublane window size: cover the densest cell plus one
    lane segment of neighbor headroom (a 128-particle sublane usually
    spans a handful of cells), capped at 2048 rows.  Cells denser than
    the cap rely on the exact compacted fallback every step.

    On TPU the floor is 1024 rows (round 5, measured): drift between
    lazy re-sorts makes settled sublanes span more pair rows than the
    densest-cell bound, and the window size is what absorbs that drift
    -- 1M bunny settled 10.42 -> 9.28 ms/step, full 2001-step episode
    16.7 -> 14.5, dragon hybrid episode 51.0 -> 49.0, spawn phase
    neutral (2.39 -> 2.38; the dead-DMA segment skips make unused
    window rows free in sparse regimes).  CPU/interpret paths keep the
    small window: no drift economics, and small windows keep the
    interpret-mode tests fast.
    """
    if window is not None:
        return window
    want = ((meta.max_tris_per_cell + 127) // 128) * 128 + 128
    w = max(256, min(2048, want))
    if jax.default_backend() == "tpu":
        w = max(w, 1024)
    if meta.max_tris_per_cell > w:
        import warnings

        warnings.warn(
            f"grid cells hold up to {meta.max_tris_per_cell} candidates, "
            f"above the {w}-row block window; particles in those cells are "
            "handled by the exact fallback (capacity-bounded)"
        )
    return w


def make_spatial_step_sorted(
    triangles,
    cfg: SimConfig,
    *,
    window: int | None = None,
    fallback_capacity: int = 1024,
    interpret: bool = False,
    with_stats: bool = False,
    mesh=None,
    axis_name: str = "data",
    cells_lookup: str = "auto",
    dense_demote: "int | None | str" = "auto",
) -> StepFn:
    """Spatial method via the sorted block-window Pallas kernel (see
    ops/pallas/window_kernel.py) -- the TPU performance path.

    Per step: lax.sort by cell id; one permute row-gather; one (start,
    count) row-gather; the Pallas kernel fuses candidate fetch (in-VMEM
    dynamic_gather from a per-block contiguous CSR window), the exact
    narrow phase, the response, and the integrator; particles whose
    candidate rows exceed their block's window (possible only in mixed
    surface/air blocks) are recomputed exactly by the chunked compacted
    XLA fallback (exact for any overflow count, see _chunked_fallback);
    results are gathered back to the original particle order.

    ``with_stats``: return ``(state, {"window_overflow": i32})`` instead
    of just the state, so callers can observe window pressure.

    ``mesh``: a 1-D ``jax.sharding.Mesh`` -> multi-chip data parallelism.
    The sort is a pure locality optimization, so each shard sorts only
    its OWN particles inside ``shard_map`` (static scene tables are
    replicated; zero collectives on the hot path; the overflow stat is
    ``psum``-reduced).  Per-shard particle count must divide BLOCK.
    """
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        build_triangle_grid,
        cell_index,
        lookup_pos,
        morton_key,
        pack_grid,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        BLOCK,
        build_window_tables,
        window_collide_sorted,
    )

    grid, meta = build_triangle_grid(triangles, cfg.grid)
    window = _auto_window(window, meta)
    # rescue window: large enough to cover the densest cell (the
    # rescue pass re-windows COMPACTED overflow particles, so only
    # single-cell spans matter -- see _chunked_rescue); never below
    # the main window
    rescue_window = max(window, _auto_window(None, meta), 2048)
    dense_demote = _auto_demote(dense_demote, meta)
    tables = build_window_tables(grid, meta, max(window, rescue_window))
    ctab = _maybe_code_table(grid, meta, cells_lookup)
    group = 8
    packed, num_groups = pack_grid(grid, meta, group=group)
    gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)
    m_cap = fallback_capacity

    # big tables enter as traced arguments, NOT closure captures: captured
    # device arrays are serialized into the compile payload (observed as
    # HTTP 413 on the remote-compile path at ~190 MB)
    def _body(state: ParticleState, tables, packed, ctab):
        pos, vel = state.pos, state.vel
        n = pos.shape[-1]
        assert n % BLOCK == 0, (
            f"sorted variant needs N % {BLOCK} == 0 (got {n}); spawn with "
            f"pad_multiple={BLOCK}"
        )
        nb = n // BLOCK

        # sort by MORTON key of the travel-segment MIDPOINT (3D-local
        # cells stay row-adjacent in the morton-ordered pair table; see
        # ops.grid.morton_key / lookup_pos); cells2 is still indexed by
        # the linear cell id
        key = morton_key(lookup_pos(pos, vel, cfg.dt), meta)
        ids = jnp.arange(n, dtype=jnp.int32)
        key_s, perm = jax.lax.sort((key, ids), num_keys=1)

        # [8, N] layout: axis-1 gather avoids the 16x (8,128)-tile padding
        # a trailing-8 row matrix would incur
        rows = jnp.concatenate(
            [pos, vel, state.radius[None], state.restitution[None]], axis=0
        )  # [8, N]
        rows_s = rows[:, perm]
        pos_s = rows_s[0:3]
        vel_s = rows_s[3:6]
        radius_s = rows_s[6]
        restit_s = rows_s[7]

        if ctab is not None:
            rel, count, ws, k_cap, overflow, ovf_count = _window_plan_coded(
                key_s, ctab, window, nb, interpret=interpret,
                demote=dense_demote,
            )
        else:
            # linear cell id recomputed from the PERMUTED positions:
            # cheaper than carrying it as a third sort payload
            cid_s = cell_index(lookup_pos(pos_s, vel_s, cfg.dt), meta)
            rel, count, ws, k_cap, overflow, ovf_count = _window_plan(
                cid_s, tables.cells2, window, nb, demote=dense_demote
            )

        pos_k, vel_k, hit_k = window_collide_sorted(
            pos_s, vel_s, radius_s, restit_s, rel, count, ws, k_cap, tables,
            w=window, k_static=meta.max_tris_per_cell,
            gravity=cfg.gravity, dt=cfg.dt, backoff=cfg.backoff,
            interpret=interpret,
        )

        pos_k, vel_k, hit_k, n_over = _chunked_rescue(
            (pos_k, vel_k, hit_k),
            (pos_s, vel_s, radius_s, restit_s),
            overflow, tables, packed, meta, num_groups, group, gravity, cfg,
            m_cap, window=window, rescue_window=rescue_window,
            key_s=key_s, ovf_count=ovf_count,
            interpret=interpret,
        )

        # --- unsort back to the caller's particle order ---
        out_rows = jnp.concatenate(
            [pos_k, vel_k, hit_k[None].astype(jnp.float32)], axis=0
        )  # [7, N]
        # unsort via inverse-permutation GATHER: scatter was measured 43 ms
        # at 1M (2/3 of the step); a second sort + gather is ~7 ms
        _, inv_perm = jax.lax.sort(
            (perm, jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )
        unsorted = out_rows[:, inv_perm]
        out = state._replace(
            pos=unsorted[0:3],
            vel=unsorted[3:6],
            collisions=state.collisions + unsorted[6].astype(jnp.int32),
        )
        return out, {"window_overflow": n_over}

    _step = _jit_maybe_sharded(_body, mesh, axis_name)

    if with_stats:
        def step(state: ParticleState):
            return _step(state, tables, packed, ctab)
    else:
        def step(state: ParticleState) -> ParticleState:
            return _step(state, tables, packed, ctab)[0]

    return step


def _jit_maybe_sharded(body, mesh, axis_name: str):
    """jit ``body(state, *tables) -> (state, stats)``; with a mesh, wrap it
    in ``shard_map`` first: the state's particle axis is sharded, every
    table arg is replicated, and scalar stats are psum-reduced so every
    shard returns the same (global) value.  This is how the sorted Pallas
    pipeline goes multi-chip: each device sorts and windows only its own
    particles -- the sort is a locality optimization, not a semantic
    ordering -- so no collective touches the hot path."""
    if mesh is None:
        return jax.jit(body)
    from jax.sharding import PartitionSpec as P

    state_spec = ParticleState(
        pos=P(None, axis_name),
        vel=P(None, axis_name),
        collisions=P(axis_name),
        radius=P(axis_name),
        restitution=P(axis_name),
    )

    def sharded(state, *tabs):
        out, stats = body(state, *tabs)
        stats = jax.tree.map(lambda s: jax.lax.psum(s, axis_name), stats)
        return out, stats

    def wrapper(state, *tabs):
        rep = jax.tree.map(lambda _: P(), tabs)
        f = jax.shard_map(
            sharded,
            mesh=mesh,
            in_specs=(state_spec, *rep),
            out_specs=(state_spec, jax.tree.map(lambda _: P(), {"window_overflow": 0})),
            # pallas_call inside shard_map has no vma annotations yet
            check_vma=False,
        )
        return f(state, *tabs)

    return jax.jit(wrapper)


def _jit_maybe_sharded_rows(fn, mesh, axis_name: str, n_stats: int):
    """jit a rows-level function ``fn(rows8, aux, *tabs) -> (rows8', aux',
    stat...)``; with a mesh, shard_map it: the particle axis (last) of
    rows8/aux is sharded, table args are replicated, trailing scalar
    stats are psum'd.  Per-shard sorts never migrate particles across
    shards (the sort is a locality hint, not a semantic ordering), so
    the persistent order -- and the final per-shard id restore -- stays
    purely local; no collective touches the hot path."""
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import PartitionSpec as P

    def sharded(rows8, aux, *tabs):
        out = fn(rows8, aux, *tabs)
        rows_o, aux_o = out[0], out[1]
        stats = tuple(jax.lax.psum(s, axis_name) for s in out[2:])
        return (rows_o, aux_o, *stats)

    def wrapper(rows8, aux, *tabs):
        rep = jax.tree.map(lambda _: P(), tabs)
        f = jax.shard_map(
            sharded,
            mesh=mesh,
            in_specs=(P(None, axis_name), P(None, axis_name), *rep),
            out_specs=(
                P(None, axis_name),
                P(None, axis_name),
                *([P()] * n_stats),
            ),
            # pallas_call inside shard_map has no vma annotations yet
            check_vma=False,
        )
        return f(rows8, aux, *tabs)

    return jax.jit(wrapper)


def make_sorted_episode_runner(
    triangles,
    cfg: SimConfig,
    *,
    window: int | None = None,
    fallback_capacity: int = 1024,
    interpret: bool = False,
    resort_every: "int | str" = 1,
    camera=None,
    normals=None,
    mesh=None,
    axis_name: str = "data",
    cells_lookup: str = "auto",
    dense_demote: "int | None | str" = "auto",
    rescue_chunk: int = 8192,
    resort_threshold: int = 8192,
    rescue_compact: bool = False,
):
    """Episode runner with PERSISTENT sorted order.

    ``rescue_compact``: build the phase-1 rescue order by bounded
    cumsum+scatter compaction + a 64k-key sort instead of the full-N
    argsort (identical order; see _chunked_rescue), with a runtime
    argsort fallback when overflow exceeds the buffer.

    ``rescue_chunk``: phase-1 rescue kernel chunk size (lanes per
    while_loop iteration; see _chunked_rescue).  Settled 1M drift
    overflow is 11-20k/step, so 8192 means 2-3 sequential chunk
    iterations per step.

    ``resort_every="auto"``: OVERFLOW-TRIGGERED re-sort.  Every step runs
    one jitted program that ``lax.cond``s between the sorted and lazy
    bodies on the PREVIOUS step's (device-scalar) overflow count -- no
    host readback, no wall-clock dependence, bit-deterministic.  The
    trigger is self-calibrating: ``base`` is the overflow measured right
    after the most recent sort (scenes like the dragon keep a steady
    demote-driven overflow floor that a fixed threshold would mistake
    for drift), and a step re-sorts when ``n_over > base +
    resort_threshold``.  Free-fall phases (overflow 0) never pay the
    6.4 ms/1M sort+permute; settled phases sort exactly when drift has
    grown enough that rescue work would exceed the sort.

    The per-step order restoration (inverse-permutation sort + gather)
    costs ~7 ms at 1M particles; within an episode nothing needs the
    original order, so this runner keeps the state in each step's sorted
    order, carries the original particle ids as a payload row, and
    restores order ONCE at the end.  Semantics identical to repeated
    ``make_spatial_step_sorted`` steps (same collisions, same per-id
    trajectories).

    ``resort_every=k``: re-sort the particle order only every k-th step.
    Sortedness is a PERFORMANCE hint, not a correctness requirement --
    any particle whose candidate rows miss its block's window is redone
    exactly by the chunked fallback -- so steps between re-sorts skip the
    sort + permute entirely (the dominant glue cost at 1M).  Order drifts
    slowly: free fall preserves cell order, and settled particles rarely
    change cells, so drift-induced fallback work stays small.

    ``camera``: when given, each step runs the HYBRID method instead of
    pure spatial -- the screen-space stage (order-independent gathers
    against the baked camera textures) runs on the sorted rows first and
    its undecided mask gates the exact stage, exactly as in
    ``make_hybrid_step_sorted`` but without that step's per-step
    sort + unsort pair.

    ``mesh``: optional 1-D device mesh -- the whole runner goes
    multi-chip via shard_map with PER-SHARD persistent order (local
    sorts never migrate particles between shards, so the carried order
    and the final id restore stay shard-local; tables/textures are
    replicated and no collective touches the hot path).  Requires the
    padded particle count divisible by ``1024 * n_shards``.

    Returns ``run(state, num_steps) -> state`` (original order).
    """
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        build_triangle_grid,
        cell_index,
        lookup_pos,
        morton_key,
        pack_grid,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        BLOCK,
        build_window_tables,
        window_collide_sorted,
    )

    check_speed_cover(cfg)  # fail loudly if the episode outruns the grid
    grid, meta = build_triangle_grid(triangles, cfg.grid)
    window = _auto_window(window, meta)
    # rescue window: large enough to cover the densest cell (the
    # rescue pass re-windows COMPACTED overflow particles, so only
    # single-cell spans matter -- see _chunked_rescue); never below
    # the main window
    rescue_window = max(window, _auto_window(None, meta), 2048)
    dense_demote = _auto_demote(dense_demote, meta)
    tables = build_window_tables(grid, meta, max(window, rescue_window))
    ctab = _maybe_code_table(grid, meta, cells_lookup)
    group = 8
    packed, num_groups = pack_grid(grid, meta, group=group)
    gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)
    m_cap = fallback_capacity
    if camera is not None:
        from particlesystemhybridcollisiondetection_tpu.ops.screenspace import (
            bake_camera,
        )

        tex = bake_camera(triangles, camera, normals)
    else:
        tex = None

    def _ss_stage(rows8, aux, tex):
        """Screen-space stage on the carried rows (hybrid mode): returns
        (rows8', aux', undecided bool[N]).  Passed ``tex`` as a jit
        ARGUMENT -- a closure-captured texture would put the planar
        gather on XLA's scalar path (see CameraTextures.planar)."""
        from particlesystemhybridcollisiondetection_tpu.ops.screenspace import (
            screen_space_collide,
        )

        st = ParticleState(
            pos=rows8[0:3],
            vel=rows8[3:6],
            collisions=aux[0],
            radius=rows8[6],
            restitution=rows8[7],
        )
        st, undec = screen_space_collide(st, tex, gravity, cfg.dt, hybrid=True)
        rows8 = jnp.concatenate([st.pos, st.vel, rows8[6:8]], axis=0)
        aux = jnp.stack([st.collisions, aux[1]])
        return rows8, aux, undec

    # Carried state: rows8 f32[8, N] = pos3 vel3 radius restitution, plus
    # aux i32[2, N] = (collisions, original ids) SEPARATELY.  A single
    # [10, N] carry was the round-1 performance mystery (50+ ms/step):
    # XLA's layout assignment flips the 10-row permute gather's output to
    # a transposed {0,1} layout (trailing-dim-10 (8,128) tiles), blowing
    # one fusion up to ~35 ms/step at 1M.  The split keeps both gathers
    # on the planar fast layout.
    def _step_rows(rows8, aux, tables, packed, tex, ctab):
        n = rows8.shape[-1]
        nb = n // BLOCK
        if tex is not None:
            rows8, aux, undec = _ss_stage(rows8, aux, tex)
        pos = rows8[0:3]
        # sort by MORTON key of the travel-segment MIDPOINT (3D-local
        # cells stay row-adjacent in the morton-ordered pair table; see
        # ops.grid.morton_key / lookup_pos); cells2 is still indexed by
        # the linear cell id
        key = morton_key(lookup_pos(pos, rows8[3:6], cfg.dt), meta)
        ids = jnp.arange(n, dtype=jnp.int32)
        key_s, perm = jax.lax.sort((key, ids), num_keys=1)
        rows_s = rows8[:, perm]
        if tex is not None:
            # fold the undecided mask into the aux permute (a separate
            # 1-D bool gather would take the scalar path)
            aux3 = jnp.concatenate([aux, undec[None].astype(jnp.int32)])
            aux3_s = aux3[:, perm]
            aux_s = aux3_s[0:2]
            active_s = aux3_s[2] > 0
        else:
            aux_s = aux[:, perm]
            active_s = None
        pos_s = rows_s[0:3]
        vel_s = rows_s[3:6]
        radius_s = rows_s[6]
        restit_s = rows_s[7]

        if ctab is not None:
            rel, count, ws, k_cap, overflow, ovf_count = _window_plan_coded(
                key_s, ctab, window, nb, interpret=interpret,
                active_s=active_s, demote=dense_demote,
            )
        else:
            # linear cell id recomputed from the PERMUTED positions:
            # cheaper than carrying it as a third sort payload
            cid_s = cell_index(lookup_pos(pos_s, vel_s, cfg.dt), meta)
            rel, count, ws, k_cap, overflow, ovf_count = _window_plan(
                cid_s, tables.cells2, window, nb, active_s=active_s,
                demote=dense_demote,
            )

        pos_k, vel_k, hit_k = window_collide_sorted(
            pos_s, vel_s, radius_s, restit_s, rel, count, ws, k_cap, tables,
            w=window, k_static=meta.max_tris_per_cell,
            gravity=cfg.gravity, dt=cfg.dt, backoff=cfg.backoff,
            interpret=interpret,
        )

        pos_k, vel_k, hit_k, n_over = _chunked_rescue(
            (pos_k, vel_k, hit_k),
            (pos_s, vel_s, radius_s, restit_s),
            overflow, tables, packed, meta, num_groups, group, gravity, cfg,
            m_cap, window=window, rescue_window=rescue_window,
            key_s=key_s, ovf_count=ovf_count, kernel_chunk=rescue_chunk,
            rescue_compact=rescue_compact, interpret=interpret,
        )

        # output stays in THIS step's sorted order
        out8 = jnp.concatenate([pos_k, vel_k, rows_s[6:8]], axis=0)
        out_aux = jnp.stack([aux_s[0] + hit_k, aux_s[1]])
        return out8, out_aux, n_over

    # no-sort variant: current order kept as-is; the window plan runs on
    # the (approximately sorted) raw cid sequence and the chunked
    # fallback exactly redoes whatever no longer fits its block's window
    def _step_lazy(rows8, aux, tables, packed, tex, ctab):
        n = rows8.shape[-1]
        nb = n // BLOCK
        if tex is not None:
            rows8, aux, undec = _ss_stage(rows8, aux, tex)
            active_s = undec
        else:
            active_s = None
        pos_s = rows8[0:3]
        vel_s = rows8[3:6]
        radius_s = rows8[6]
        restit_s = rows8[7]

        # drifted order: codes recomputed elementwise (also the rescue's
        # phase-1 compaction key); drifted particles that left their
        # sublane's code window fold into the overflow -> exact fallback,
        # like the pair windows
        key_s = morton_key(lookup_pos(pos_s, vel_s, cfg.dt), meta)
        if ctab is not None:
            rel, count, ws, k_cap, overflow, ovf_count = _window_plan_coded(
                key_s, ctab, window, nb, interpret=interpret,
                active_s=active_s, demote=dense_demote,
            )
        else:
            cid = cell_index(lookup_pos(pos_s, vel_s, cfg.dt), meta)
            rel, count, ws, k_cap, overflow, ovf_count = _window_plan(
                cid, tables.cells2, window, nb, active_s=active_s,
                demote=dense_demote,
            )

        pos_k, vel_k, hit_k = window_collide_sorted(
            pos_s, vel_s, radius_s, restit_s, rel, count, ws, k_cap, tables,
            w=window, k_static=meta.max_tris_per_cell,
            gravity=cfg.gravity, dt=cfg.dt, backoff=cfg.backoff,
            interpret=interpret,
        )

        pos_k, vel_k, hit_k, n_over = _chunked_rescue(
            (pos_k, vel_k, hit_k),
            (pos_s, vel_s, radius_s, restit_s),
            overflow, tables, packed, meta, num_groups, group, gravity, cfg,
            m_cap, window=window, rescue_window=rescue_window,
            key_s=key_s, ovf_count=ovf_count, kernel_chunk=rescue_chunk,
            rescue_compact=rescue_compact, interpret=interpret,
        )

        out8 = jnp.concatenate([pos_k, vel_k, rows8[6:8]], axis=0)
        out_aux = jnp.stack([aux[0] + hit_k, aux[1]])
        return out8, out_aux, n_over

    def _restore(rows8, aux):
        # per-shard id sort == global order restore: local sorts never
        # move a particle across shards, and each shard's id set is its
        # original contiguous slice
        n = rows8.shape[-1]
        _, inv = jax.lax.sort(
            (aux[1], jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )
        return rows8[:, inv], aux[:, inv]

    _raw_rows, _raw_lazy = _step_rows, _step_lazy  # pre-jit bodies

    def _step_auto(rows8, aux, do_sort, tables, packed, tex, ctab):
        # overflow-triggered re-sort: both bodies live in ONE program and
        # lax.cond picks per step on a device scalar (see docstring);
        # do_sort is a replicated scalar input so every shard takes the
        # same branch and shard_map collectives stay congruent
        return jax.lax.cond(
            do_sort,
            lambda: _raw_rows(rows8, aux, tables, packed, tex, ctab),
            lambda: _raw_lazy(rows8, aux, tables, packed, tex, ctab),
        )

    _step_auto = _jit_maybe_sharded_rows(_step_auto, mesh, axis_name, 1)
    _step_rows = _jit_maybe_sharded_rows(_step_rows, mesh, axis_name, 1)
    _step_lazy = _jit_maybe_sharded_rows(_step_lazy, mesh, axis_name, 1)
    _restore = _jit_maybe_sharded_rows(_restore, mesh, axis_name, 0)

    @jax.jit
    def _trigger_update(do_sort, n_over, base):
        # base = overflow right after the most recent sort; re-sort when
        # the drifted overflow exceeds it by resort_threshold.  One tiny
        # program per step, dispatched async -- no host readback.
        base = jnp.where(do_sort, n_over, base)
        return base, n_over > base + resort_threshold

    def run(state: ParticleState, num_steps: int, with_stats: bool = False):
        """``with_stats=True``: also return per-step window-overflow
        counts (list of device scalars) so window pressure is observable
        from the persistent runner too."""
        n = state.pos.shape[-1]
        shards = 1 if mesh is None else mesh.devices.size
        assert n % (BLOCK * shards) == 0, (n, shards)
        import os as _os

        if _os.environ.get("PSYS_SPEED_GUARD", "0") not in ("", "0"):
            # debug-mode dynamic guard (ADVICE r4): include the entry
            # state's measured max speed; one device readback, so it is
            # opt-in rather than on the timed path
            check_speed_cover(cfg, num_steps=num_steps, state=state,
                              strict=True)
        rows8 = jnp.concatenate(
            [
                state.pos,
                state.vel,
                state.radius[None],
                state.restitution[None],
            ],
            axis=0,
        )
        aux = jnp.stack([state.collisions, jnp.arange(n, dtype=jnp.int32)])
        overflows = []
        if resort_every == "auto":
            do_sort = jnp.asarray(True)  # step 0 establishes the order
            base = jnp.asarray(0, dtype=jnp.int32)
            for i in range(num_steps):
                rows8, aux, n_over = _step_auto(
                    rows8, aux, do_sort, tables, packed, tex, ctab
                )
                base, do_sort = _trigger_update(do_sort, n_over, base)
                if with_stats:
                    overflows.append(n_over)
        else:
            for i in range(num_steps):
                fn = _step_rows if i % resort_every == 0 else _step_lazy
                rows8, aux, n_over = fn(rows8, aux, tables, packed, tex, ctab)
                if with_stats:
                    overflows.append(n_over)
        rows8, aux = _restore(rows8, aux)
        out = state._replace(
            pos=rows8[0:3],
            vel=rows8[3:6],
            collisions=aux[0],
        )
        return (out, overflows) if with_stats else out

    return run


def sorted_step_overflow_count(triangles, cfg: SimConfig, state, window: int = 512):
    """Diagnostic: how many particles would exceed the block window for
    this state (should be ~0 on the benchmark scenes; the step handles up
    to fallback_capacity exactly either way)."""
    from particlesystemhybridcollisiondetection_tpu.ops.grid import (
        build_triangle_grid,
        cell_index,
        lookup_pos,
        morton_key,
        pack_grid,
    )
    from particlesystemhybridcollisiondetection_tpu.ops.pallas.window_kernel import (
        BLOCK,
        build_window_tables,
    )

    grid, meta = build_triangle_grid(triangles, cfg.grid)
    tables = build_window_tables(grid, meta, window)
    n = state.pos.shape[-1]
    nb = n // BLOCK
    lpos = lookup_pos(state.pos, state.vel, cfg.dt)
    _, cid_s = jax.lax.sort(
        (morton_key(lpos, meta), cell_index(lpos, meta)),
        num_keys=1,
    )
    _, _, _, _, overflow, _ = _window_plan(cid_s, tables.cells2, window, nb)
    return int(jnp.sum(overflow))


def make_episode_runner(step: StepFn, num_steps: int) -> Callable[[ParticleState], ParticleState]:
    """Roll an episode fully on device: ``lax.fori_loop`` over the step.

    NOTE (history): round 1 measured the fori-wrapped sorted step 4.7x
    slower than Python dispatch.  Re-measured on the current pipeline
    (benchmarks/study_fori_loop.py, v5e, 2026-08-17): fori_loop, scan,
    and fori+donation are all at PARITY with Python dispatch (0.96-0.99x
    at 262k and 1M) -- the anomaly was a property of the round-1 step
    (captured-constant tables inside the loop body), not of fori_loop.
    The harness still dispatches from Python because the persistent
    sorted runner needs its Python-side resort_every step alternation.
    Do NOT wrap make_p2p_step's kernel variant: tracing re-fuses its two
    deliberately separate programs into the monolithic form that crashes
    the TPU worker at 1M (see ops.p2p_sorted.p2p_window_phase1).
    """

    @jax.jit
    def run(state: ParticleState) -> ParticleState:
        return jax.lax.fori_loop(0, num_steps, lambda _, s: step(s), state)

    return run


def make_trajectory_runner(step: StepFn, num_steps: int, stride: int = 1):
    """Roll an episode and return strided position history [S, 3, N]."""

    @functools.partial(jax.jit, static_argnums=())
    def run(state: ParticleState):
        def body(s, _):
            for _ in range(stride):
                s = step(s)
            return s, s.pos

        final, hist = jax.lax.scan(body, state, None, length=num_steps // stride)
        return final, hist

    return run
