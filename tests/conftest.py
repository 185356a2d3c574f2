"""Test config: run everything on CPU with an 8-device virtual mesh.

Real-TPU runs are exercised by bench.py / the driver; tests validate
numerics and sharding on the host (SURVEY 4: the reference has no automated
tests at all -- the strategy here is CPU oracles + property tests + virtual
multi-chip meshes).
"""

import os

# The axon TPU plugin's sitecustomize imports jax at interpreter startup,
# so setting JAX_PLATFORMS via os.environ here is too late -- override via
# jax.config before any backend initializes.  XLA_FLAGS is still read at
# CPU-client creation, so the virtual device count can be set here.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
