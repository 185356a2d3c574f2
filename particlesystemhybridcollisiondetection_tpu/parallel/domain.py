"""Spatial domain decomposition across chips (ppermute halo exchange).

The scaling axis of the reference is particle count; its ceiling is the
single-GPU 65535-group dispatch limit (ParticleSys.cs:236).  For
particle-particle interaction at multi-chip scale, particles are owned by
the device whose spatial slab contains them:

  * the world X range is split into ``n_devices`` equal slabs over a 1-D
    ``Mesh`` axis;
  * each step, every device runs the local p2p + integrate pipeline on its
    own particles plus *ghost* copies of neighbor-boundary particles
    received over ICI (``jax.lax.ppermute``), so cross-boundary contacts
    resolve symmetrically on both owners;
  * particles whose new position crossed into a neighbor slab migrate via
    fixed-capacity send buffers (static shapes; overflow is counted and
    surfaced, never silent).

Empty slots use the sentinel convention of the rest of the framework
(pos = 1e38, vel = 0) so ghosts/unused capacity behave exactly like the
reference's padding threads.

This module is the "CP analog" called for in SURVEY 2 (long-context row):
halo exchange of boundary-cell particle data via ppermute each step.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from particlesystemhybridcollisiondetection_tpu.config import FLOAT_SENTINEL, SimConfig
from particlesystemhybridcollisiondetection_tpu.core.state import ParticleState
from particlesystemhybridcollisiondetection_tpu.ops import p2p as p2p_ops
from particlesystemhybridcollisiondetection_tpu.ops import pgrid as pg
from particlesystemhybridcollisiondetection_tpu.ops.integrate import integrate

AXIS = "shard"


@dataclasses.dataclass(frozen=True)
class DomainConfig:
    box_lo: tuple
    box_hi: tuple
    n_shards: int
    shard_capacity: int  # per-device particle slots (multiple of 128)
    halo_capacity: int  # ghosts sent per boundary per step
    migrate_capacity: int  # migrants sent per direction per step
    cell_size: float
    grid_capacity: int = 8

    @property
    def slab_width(self) -> float:
        return (self.box_hi[0] - self.box_lo[0]) / self.n_shards


def _empty_rows(n: int) -> dict:
    return dict(
        pos=jnp.full((3, n), FLOAT_SENTINEL, dtype=jnp.float32),
        vel=jnp.zeros((3, n), dtype=jnp.float32),
        collisions=jnp.zeros((n,), dtype=jnp.int32),
        radius=jnp.full((n,), 1.0, dtype=jnp.float32),
        restitution=jnp.zeros((n,), dtype=jnp.float32),
    )


def _take(state: ParticleState, idx: jnp.ndarray) -> ParticleState:
    return ParticleState(
        pos=state.pos[:, idx],
        vel=state.vel[:, idx],
        collisions=state.collisions[idx],
        radius=state.radius[idx],
        restitution=state.restitution[idx],
    )


def _concat(a: ParticleState, b: ParticleState) -> ParticleState:
    return ParticleState(
        pos=jnp.concatenate([a.pos, b.pos], axis=1),
        vel=jnp.concatenate([a.vel, b.vel], axis=1),
        collisions=jnp.concatenate([a.collisions, b.collisions]),
        radius=jnp.concatenate([a.radius, b.radius]),
        restitution=jnp.concatenate([a.restitution, b.restitution]),
    )


def _pack_subset(state: ParticleState, mask: jnp.ndarray, capacity: int,
                 fill_sentinel: bool = True):
    """Compact masked particles to the front, truncate/pad to capacity.

    Returns (subset ParticleState[capacity], overflow i32).
    On-device compaction: stable argsort of (!mask) moves selected
    particles (in order) to the front -- the TPU-native replacement for
    the reference's atomic-append stream compaction
    (ScreenSpaceDepthCollisionDetection.compute:78-84).
    """
    n = mask.shape[0]
    order = jnp.argsort(jnp.logical_not(mask), stable=True)
    take_n = jnp.minimum(capacity, n)
    idx = order[:capacity] if capacity <= n else jnp.pad(order, (0, capacity - n))
    sub = _take(state, idx)
    count = jnp.sum(mask.astype(jnp.int32))
    slot = jnp.arange(capacity, dtype=jnp.int32)
    live = slot < count
    if fill_sentinel:
        sub = ParticleState(
            pos=jnp.where(live[None], sub.pos, FLOAT_SENTINEL),
            vel=jnp.where(live[None], sub.vel, 0.0),
            collisions=jnp.where(live, sub.collisions, 0),
            radius=jnp.where(live, sub.radius, 1.0),
            restitution=jnp.where(live, sub.restitution, 0.0),
        )
    overflow = jnp.maximum(count - capacity, 0)
    return sub, overflow


def _active(state: ParticleState) -> jnp.ndarray:
    return jnp.abs(state.pos[0]) < FLOAT_SENTINEL * 0.5


def make_domain_step(dcfg: DomainConfig, cfg: SimConfig, mesh: Mesh):
    """Jitted sharded step: (state_sharded, stats) -> (state, stats).

    ``state`` leaves have a leading shard axis folded into the particle
    axis: [3, n_shards * shard_capacity], sharded over AXIS.
    Returned stats: i32[3] = (halo_overflow, migrate_overflow,
    grid_cell_overflow), summed over devices.
    """
    from particlesystemhybridcollisiondetection_tpu.ops import p2p_sorted as p2ps

    gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)
    n_sh = dcfg.n_shards
    margin = dcfg.cell_size
    meta = pg.make_meta(
        (dcfg.box_lo[0], dcfg.box_lo[1], dcfg.box_lo[2]),
        (dcfg.box_hi[0], dcfg.box_hi[1], dcfg.box_hi[2]),
        dcfg.cell_size,
        capacity=dcfg.grid_capacity,
    )
    # sorted-segment p2p when the grid shape permits: CSR runs cannot
    # saturate, so no per-shard contact can be dropped one-sidedly (the
    # slot table clips at grid_capacity; its drops are only COUNTED).
    # The local sort/CSR are per-device ops -- shard_map-compatible.
    use_sorted = meta.dims[2] >= 3

    def local_step(state: ParticleState):
        """Runs per device on its local [*, shard_capacity] slice."""
        me = jax.lax.axis_index(AXIS)
        slab_lo = dcfg.box_lo[0] + dcfg.slab_width * me
        slab_hi = slab_lo + dcfg.slab_width

        act = _active(state)

        # --- halo exchange: ship boundary particles to each neighbor ---
        near_lo = act & (state.pos[0] < slab_lo + margin)
        near_hi = act & (state.pos[0] >= slab_hi - margin)
        ghosts_for_left, of_l = _pack_subset(state, near_lo, dcfg.halo_capacity)
        ghosts_for_right, of_r = _pack_subset(state, near_hi, dcfg.halo_capacity)

        right = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        left = [(i, (i - 1) % n_sh) for i in range(n_sh)]
        pp = lambda s, perm: jax.tree.map(  # noqa: E731
            lambda x: jax.lax.ppermute(x, AXIS, perm), s
        )
        ghosts_from_right = pp(ghosts_for_left, left)  # our right edge's left-ghosts
        ghosts_from_left = pp(ghosts_for_right, right)
        # ring wrap: shard 0's "left neighbor" is shard n-1 -- drop those
        # ghosts at the ends (the box wall is the boundary there).
        drop_left = me == 0
        drop_right = me == n_sh - 1
        ghosts_from_left = ParticleState(
            pos=jnp.where(drop_left, FLOAT_SENTINEL, ghosts_from_left.pos),
            vel=jnp.where(drop_left, 0.0, ghosts_from_left.vel),
            collisions=ghosts_from_left.collisions,
            radius=ghosts_from_left.radius,
            restitution=ghosts_from_left.restitution,
        )
        ghosts_from_right = ParticleState(
            pos=jnp.where(drop_right, FLOAT_SENTINEL, ghosts_from_right.pos),
            vel=jnp.where(drop_right, 0.0, ghosts_from_right.vel),
            collisions=ghosts_from_right.collisions,
            radius=ghosts_from_right.radius,
            restitution=ghosts_from_right.restitution,
        )

        # --- local p2p over own + ghost particles ---
        n_loc = state.pos.shape[-1]
        merged = _concat(_concat(state, ghosts_from_left), ghosts_from_right)
        act_m = _active(merged)
        if use_sorted:
            merged, grid_of = p2ps.p2p_collide_sorted(
                merged, meta, active=act_m
            )
        else:
            merged, grid_of = p2p_ops.p2p_collide(merged, meta, active=act_m)
        # ghosts' own updates are discarded; their owners compute the
        # mirrored response from their side of the exchange.
        state = _take(merged, jnp.arange(n_loc))

        # --- walls + integrate (global box walls) ---
        state = p2p_ops.box_walls_collide(
            state, dcfg.box_lo, dcfg.box_hi, gravity, cfg.dt
        )
        new_pos, new_vel = integrate(state.pos, state.vel, gravity, cfg.dt)
        state = state._replace(pos=new_pos, vel=new_vel)

        # --- migration: reassign particles that crossed slab bounds ---
        act = _active(state)
        go_left = act & (state.pos[0] < slab_lo) & (me > 0)
        go_right = act & (state.pos[0] >= slab_hi) & (me < n_sh - 1)
        stay = act & ~go_left & ~go_right

        mig_left, ofm_l = _pack_subset(state, go_left, dcfg.migrate_capacity)
        mig_right, ofm_r = _pack_subset(state, go_right, dcfg.migrate_capacity)
        kept, of_cap = _pack_subset(state, stay, n_loc)

        arrivals_from_right = pp(mig_left, left)
        arrivals_from_left = pp(mig_right, right)

        # merge kept + arrivals back into the fixed-size local buffer
        merged2 = _concat(_concat(kept, arrivals_from_left), arrivals_from_right)
        act2 = _active(merged2)
        final, of_merge = _pack_subset(merged2, act2, n_loc)

        halo_of = jax.lax.psum(of_l + of_r, AXIS)
        mig_of = jax.lax.psum(ofm_l + ofm_r + of_cap + of_merge, AXIS)
        # saturated-cell drops in the local p2p grid (ADVICE r1: dropped
        # table entries skip contacts one-sidedly -- must be observable)
        cell_of = jax.lax.psum(grid_of, AXIS)
        return final, jnp.stack([halo_of, mig_of, cell_of])

    from jax import shard_map

    state_specs = ParticleState(
        pos=P(None, AXIS), vel=P(None, AXIS),
        collisions=P(AXIS), radius=P(AXIS), restitution=P(AXIS),
    )
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_specs,),
        out_specs=(state_specs, P(None)),
        check_vma=False,
    )
    return jax.jit(sharded)


def distribute(state: ParticleState, dcfg: DomainConfig) -> ParticleState:
    """Host-side initial placement: bucket particles into their owning
    shard's slots (sentinel-padded), returning the concatenated global
    layout expected by make_domain_step."""
    pos = np.asarray(state.pos)
    act = np.abs(pos[0]) < FLOAT_SENTINEL * 0.5
    x = pos[0]
    shard = np.clip(
        ((x - dcfg.box_lo[0]) / dcfg.slab_width).astype(np.int64),
        0,
        dcfg.n_shards - 1,
    )
    n_total = dcfg.n_shards * dcfg.shard_capacity
    out = {
        "pos": np.full((3, n_total), FLOAT_SENTINEL, dtype=np.float32),
        "vel": np.zeros((3, n_total), dtype=np.float32),
        "collisions": np.zeros((n_total,), dtype=np.int32),
        "radius": np.ones((n_total,), dtype=np.float32),
        "restitution": np.zeros((n_total,), dtype=np.float32),
    }
    for s in range(dcfg.n_shards):
        sel = np.where(act & (shard == s))[0]
        if len(sel) > dcfg.shard_capacity:
            raise ValueError(
                f"shard {s}: {len(sel)} particles > capacity {dcfg.shard_capacity}"
            )
        dst = slice(s * dcfg.shard_capacity, s * dcfg.shard_capacity + len(sel))
        out["pos"][:, dst] = pos[:, sel]
        out["vel"][:, dst] = np.asarray(state.vel)[:, sel]
        out["collisions"][dst] = np.asarray(state.collisions)[sel]
        out["radius"][dst] = np.asarray(state.radius)[sel]
        out["restitution"][dst] = np.asarray(state.restitution)[sel]
    return ParticleState(**{k: jnp.asarray(v) for k, v in out.items()})


def shard_domain_state(state: ParticleState, mesh: Mesh) -> ParticleState:
    specs = ParticleState(
        pos=P(None, AXIS), vel=P(None, AXIS),
        collisions=P(AXIS), radius=P(AXIS), restitution=P(AXIS),
    )
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )
