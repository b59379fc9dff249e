"""Platform selection for CLI entry points.

The correctness path runs f64 on CPU by default; the TPU (batched
window/pallas engines) is opt-in via SIGALIGN_PLATFORM=tpu because the
per-read XLA path is latency-bound over the device tunnel.  Must be called
before the first jax operation.
"""

from __future__ import annotations

import os


def ensure_host_platform(default: str = "cpu") -> str:
    import jax

    platform = os.environ.get("SIGALIGN_PLATFORM", default)
    if platform == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_enable_x64", True)
        except RuntimeError:
            pass  # backend already initialized
    return platform
