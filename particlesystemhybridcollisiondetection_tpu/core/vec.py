"""Planar 3-vector helpers.

Particle state is stored planar-SoA: a vector field over N particles is a
single ``f32[3, N]`` array (or ``[3, N, K]`` for per-candidate data) so the
big axis rides the TPU's 128-wide lanes.  These helpers implement the small
amount of 3D vector algebra the kernels need on such stacked arrays,
component-wise, with no fancy einsums -- exactly the shapes XLA fuses best.

All functions treat axis 0 as the xyz axis and broadcast over the rest.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Component dot product: [3, ...] x [3, ...] -> [...]."""
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )


def norm2(a: jnp.ndarray) -> jnp.ndarray:
    return dot(a, a)


def norm(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(norm2(a))


def normalize(a: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """HLSL-style normalize: a / length(a).

    With ``eps=0`` this matches HLSL ``normalize`` including producing
    inf/nan for zero vectors -- callers mask those lanes exactly where the
    reference kernels early-out (e.g. the ``vel == 0`` guards at
    ScreenSpaceDepthCollisionDetection.compute:33 and
    SpatialStructureCollisionDetection.compute:237).
    """
    n = norm(a)
    if eps:
        n = jnp.maximum(n, eps)
    return a / n


def reflect(i: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """HLSL reflect: i - 2*dot(i, n)*n."""
    return i - 2.0 * dot(i, n) * n


def scale(v: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Multiply a [3, ...] vector field by a scalar field [...]."""
    return v * s[None]


def where(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Select on a [...] mask between [3, ...] vector fields."""
    return jnp.where(mask[None], a, b)


def vec3(x, y, z, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([x, y, z], dtype=dtype)
