"""Test configuration: force CPU with a virtual 8-device mesh and enable f64.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count) because only one real TPU chip is
available; parity tests need float64 to match the C reference.
"""

import os

# jax is pre-imported with the axon TPU platform by the environment's
# sitecustomize; a runtime config update (not the env var) is what actually
# switches the test run to the virtual CPU mesh.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
