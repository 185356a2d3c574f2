"""Multi-chip data parallelism over the particle axis.

The reference is a single-GPU program whose only parallelism is
1-thread-per-particle (SURVEY 2: parallelism checklist).  Against a *static*
scene, particles are embarrassingly parallel, so the TPU-native scaling
strategy is:

  * shard every per-particle array over the mesh's ``data`` axis,
  * replicate the (small, read-only) scene tables -- CSR grid, triangle
    soup, camera textures,
  * jit the unchanged step function with sharding constraints; XLA keeps
    every gather local because the gathered tables are replicated and the
    indices are sharded.

Collective traffic is therefore zero on the hot path; the only collectives
are diagnostics (global collision counts via ``psum``-shaped reductions at
readout).  Spatial domain decomposition with ``ppermute`` halo exchange
(for particle-particle interaction at scale) lives in parallel/domain.py.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from particlesystemhybridcollisiondetection_tpu.core.state import ParticleState

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def state_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> ParticleState:
    """A ParticleState-shaped pytree of NamedShardings: particle axis (the
    last axis of every leaf) sharded over the mesh."""
    vec_s = NamedSharding(mesh, P(None, axis_name))  # [3, N]
    flat_s = NamedSharding(mesh, P(axis_name))  # [N]
    return ParticleState(
        pos=vec_s, vel=vec_s, collisions=flat_s, radius=flat_s, restitution=flat_s
    )


def shard_state(state: ParticleState, mesh: Mesh, axis_name: str = DATA_AXIS) -> ParticleState:
    """Place a host/replicated state onto the mesh, particle-sharded.

    The padded particle count must divide by the mesh size (spawn_grid pads
    to 128, so any mesh up to 128 devices divides evenly).
    """
    sh = state_sharding(mesh, axis_name)
    return jax.tree.map(jax.device_put, state, sh)


def make_dp_step(
    step: Callable[[ParticleState], ParticleState],
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
) -> Callable[[ParticleState], ParticleState]:
    """Wrap a single-chip step with data-parallel in/out shardings.

    The step's closed-over scene tables are replicated automatically (they
    are unsharded constants); per-particle compute partitions 1:1.
    """
    sh = state_sharding(mesh, axis_name)
    return jax.jit(step, in_shardings=(sh,), out_shardings=sh)
