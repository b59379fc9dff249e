"""Structured logging, counters, and profiling hooks.

The reference's observability is sonLib log levels (st_logInfo/st_logDebug)
plus per-read summary lines and running-likelihood tables (SURVEY §5).  Here:
a leveled logger, process-wide counters for the alignment statistics the
reference logs (anchor counts, band widths, split counts, pairs emitted), and
a jax.profiler trace context for TPU performance work.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

logger = logging.getLogger("cpecan_signal_tpu")


def set_log_level(level: str) -> None:
    """sonLib-style --logLevel values (st_setLogLevelFromString)."""
    mapping = {"OFF": logging.CRITICAL, "CRITICAL": logging.CRITICAL,
               "INFO": logging.INFO, "DEBUG": logging.DEBUG}
    logging.basicConfig(format="%(asctime)s %(name)s %(levelname)s %(message)s")
    logger.setLevel(mapping.get(level.upper(), logging.INFO))


class Counters:
    """Process-wide counters (anchor/band statistics, SURVEY §5)."""

    def __init__(self):
        self.values: dict[str, float] = defaultdict(float)

    def add(self, name: str, value: float = 1.0) -> None:
        self.values[name] += value

    def observe(self, name: str, value: float) -> None:
        self.values[f"{name}.sum"] += value
        self.values[f"{name}.count"] += 1
        self.values[f"{name}.max"] = max(self.values.get(f"{name}.max", value),
                                         value)

    def snapshot(self) -> dict[str, float]:
        return dict(self.values)

    def report(self, log=logger.info) -> None:
        for k in sorted(self.values):
            log(f"counter {k} = {self.values[k]}")


counters = Counters()


@contextlib.contextmanager
def timed(name: str):
    t0 = time.perf_counter()
    yield
    counters.observe(f"time.{name}", time.perf_counter() - t0)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context for TPU kernels (view with tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
