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

# Interpret-mode Pallas tests are dominated by XLA COMPILE time of the
# traced kernel bodies (the grids re-trace per shape), not by runtime; the
# persistent compilation cache makes repeat suite runs compile-free.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def truncated_zymo_npread(n_2d: int = 350):
    """The real Zymo fixture truncated to its first ``n_2d`` 2D-read bases
    (event maps sliced consistently; event arrays keep full length — the
    prep paths slice them through the maps).  Interpret-mode Pallas wall
    clock scales with the diagonal count, so plumbing tests run on this
    sub-read; full strands run on the real chip via bench.py."""
    from cpecan_signal_tpu.io.npread import NanoporeRead, load_npread

    npr = load_npread("/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead")
    return NanoporeRead(n_2d, npr.twoD_read[:n_2d], npr.template_params,
                        npr.complement_params,
                        npr.template_event_map[:n_2d], npr.template_events,
                        npr.complement_event_map[:n_2d],
                        npr.complement_events)
