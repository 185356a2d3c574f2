"""Semi-implicit Euler integrator.

Reference kernel: PSReactionUpdate.compute:13-29 --
``v += g*dt; p += v*dt`` for every particle, padding included.  One fused
VPU op pair on TPU; there is deliberately no masking here because the
reference integrates its padding threads too (they live at 1e38 and never
collide).
"""

from __future__ import annotations

import jax.numpy as jnp


def integrate(
    pos: jnp.ndarray,
    vel: jnp.ndarray,
    gravity: jnp.ndarray,
    dt: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """pos, vel: [3, N]; gravity: [3]; returns updated (pos, vel)."""
    new_vel = vel + gravity[:, None] * dt
    new_pos = pos + new_vel * dt
    return new_pos, new_vel
