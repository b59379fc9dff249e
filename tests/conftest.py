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

# CPECAN_TEST_TPU=1 leaves the real backend attached so tests/test_tpu_device.py
# can compile on the chip (that module self-skips on CPU); everything else
# runs on the virtual CPU mesh.  x64 stays off in the TPU run — the Pallas
# path is f32 and x64 + the axon platform trips a RecursionError in
# jnp.astype on this toolchain.
if not os.environ.get("CPECAN_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
