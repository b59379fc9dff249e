"""Multi-host distributed runtime: jax.distributed init + global batch build.

The reference's cluster story is jobTree fan-out with filesystem reduction
(cPecanEm.py:404-426) and per-host multiprocessing pools
(scripts/signalAlign.py:103-146).  The TPU-native replacement (SURVEY §2.3
P3/P5) is a single Python process per host under ``jax.distributed``: each
host loads its own slice of the read set (``partition_paths``), packs it into
the process-local part of a globally-sharded batch
(``make_global_batch``), and the EM all-reduce is the same psum as on one
host — XLA routes it over ICI within a slice and DCN across hosts.

Elasticity / failure story: EM state is checkpointed every iteration
(utils/checkpoint.py); on any host failure the job is restarted from the
latest checkpoint (the reference's jobTree retry, reduced to
checkpoint-restart because EM iterations are the natural retry unit).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Bring up the multi-controller runtime.  Arguments default to the
    SIGALIGN_COORDINATOR / SIGALIGN_NUM_PROCS / SIGALIGN_PROC_ID environment
    variables so launchers can stay flag-free; on managed TPU pods all three
    may be None (jax autodetects via the metadata server)."""
    if coordinator_address is None:
        coordinator_address = os.environ.get("SIGALIGN_COORDINATOR")
    if num_processes is None and "SIGALIGN_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["SIGALIGN_NUM_PROCS"])
    if process_id is None and "SIGALIGN_PROC_ID" in os.environ:
        process_id = int(os.environ["SIGALIGN_PROC_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def is_initialized() -> bool:
    """True once ``initialize`` brought up the multi-controller runtime."""
    return jax.distributed.is_initialized()


def global_data_mesh() -> Mesh:
    """1D data mesh over every device in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), axis_names=("data",))


def partition_paths(paths: list[str], process_id: int | None = None,
                    num_processes: int | None = None) -> list[str]:
    """Deterministic per-host slice of the input file list (each host's
    input pipeline only touches its own reads — the multi-host analogue of
    the reference's per-worker queue, signalAlign.py:103-146)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return paths[pid::n]


def make_global_batch(local_batch, mesh: Mesh):
    """Assemble a globally-sharded batch from each process's local problems.

    ``local_batch`` is a pytree of host numpy/jax arrays whose leading axis is
    this process's problem count; the result is a pytree of global
    jax.Arrays whose leading axis is the sum over processes, sharded over
    the ``data`` mesh axis.  Per-process counts must be equal (pad with
    dummy problems of width 0 if not).
    """
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch)


def replicate(tree, mesh: Mesh):
    """Place small model state replicated on every device."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
