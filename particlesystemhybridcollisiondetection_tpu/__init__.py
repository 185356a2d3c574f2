"""TPU-native particle simulation framework with hybrid collision detection.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Unity
reference project `ArthurPrediger/ParticleSystemHybridCollisionDetection`
(see /root/reference): up to millions of particles falling under gravity
onto static triangle-mesh scenes, with three interchangeable collision
detection methods (screen-space depth, spatial-structure, hybrid), an
accuracy/performance benchmark harness, and multi-chip scaling.

Design notes (TPU-first, not a port):
  * All per-step compute lives inside a single jitted step function; there
    are no host round-trips during an episode (the reference's defining
    "indirect dispatch" trick -- ComputeDispatchArgs.compute:9-21 -- becomes
    a masked dense second stage, which is the shape XLA wants anyway).
  * Particle state is planar SoA `f32[3, N]` so the large axis rides the
    128-wide lanes of the VPU.
  * The reference's per-thread-stack sphere-BVH traversal
    (SpatialStructureCollisionDetection.compute:235-356) is replaced by a
    static CSR triangle grid built once per scene; the exact swept-sphere
    narrow phase math is kept bit-compatible.
"""

__version__ = "0.1.0"

from particlesystemhybridcollisiondetection_tpu.config import (  # noqa: F401
    SimConfig,
    GridConfig,
    Method,
)
from particlesystemhybridcollisiondetection_tpu.core.state import (  # noqa: F401
    ParticleState,
    spawn_grid,
)
