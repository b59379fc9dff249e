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


def allreduce_sum(*arrays):
    """Sum each array across processes (DCN all-reduce via the multihost
    allgather utility; tiny EM tallies, so bandwidth is irrelevant).
    Returns numpy arrays; identity on single-process runs."""
    if jax.process_count() == 1:
        return tuple(np.asarray(a) for a in arrays)
    from jax.experimental import multihost_utils

    out = []
    for a in arrays:
        g = multihost_utils.process_allgather(np.asarray(a))
        out.append(np.asarray(g).sum(axis=0))
    return tuple(out)


def allgather_concat(a: np.ndarray) -> np.ndarray:
    """Concatenate a variable-length per-process array across processes
    (rows in process order).  Pads to the max length, gathers, unpads."""
    a = np.asarray(a)
    if jax.process_count() == 1:
        return a
    from jax.experimental import multihost_utils

    ns = np.asarray(multihost_utils.process_allgather(
        np.asarray([a.shape[0]], dtype=np.int64))).reshape(-1)
    m = int(ns.max())
    pad = np.zeros((m - a.shape[0],) + a.shape[1:], a.dtype)
    g = np.asarray(multihost_utils.process_allgather(
        np.concatenate([a, pad]) if m else a.reshape((0,) + a.shape[1:])))
    return np.concatenate([g[i, :int(ns[i])] for i in range(g.shape[0])]) \
        if m else a


def merge_accumulator(acc):
    """All-reduce an EM accumulator's tallies across processes in place
    (the multi-host form of the reference's expectation-file sum,
    trainModels.py:126-135).  Supports ContinuousPairHmm (transitions +
    kmer_gap + likelihood), VanillaHmm (bins + likelihood) and HdpHmm
    (transitions + likelihood + assignment concatenation)."""
    if jax.process_count() == 1:
        return acc
    from ..em.accumulators import ContinuousPairHmm, HdpHmm, VanillaHmm

    if isinstance(acc, ContinuousPairHmm):
        t, k, l = allreduce_sum(acc.transitions, acc.kmer_gap,
                                np.asarray(acc.likelihood))
        acc.transitions, acc.kmer_gap, acc.likelihood = t, k, float(l)
    elif isinstance(acc, VanillaHmm):
        b, l = allreduce_sum(acc.bins, np.asarray(acc.likelihood))
        acc.bins, acc.likelihood = b, float(l)
    elif isinstance(acc, HdpHmm):
        t, l = allreduce_sum(acc.transitions, np.asarray(acc.likelihood))
        acc.transitions, acc.likelihood = t, float(l)
        kw = max((len(k) for k in acc.kmer_assignments), default=0)
        assert kw <= 16, f"kmer assignment wider than the S16 pack: {kw}"
        kb = np.array(acc.kmer_assignments, dtype="S16").reshape(-1, 1)
        kb = kb.view(np.uint8).reshape(-1, 16) if len(kb) else \
            np.zeros((0, 16), np.uint8)
        kmers = allgather_concat(kb)
        events = allgather_concat(np.asarray(acc.event_assignments,
                                             dtype=np.float64))
        acc.kmer_assignments = [bytes(r).rstrip(b"\x00").decode()
                                for r in kmers]
        acc.event_assignments = list(events)
    else:
        raise TypeError(f"cannot merge accumulator {type(acc)!r}")
    return acc


def barrier(tag: str = "barrier") -> None:
    """Global cross-process synchronization point."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)
