"""Worker process for the multi-host distributed EM test.

Launched by tests/test_distributed.py as one of N processes, each with its
own 4-device virtual CPU "host"; validates that the multi-controller path
(jax.distributed + make_array_from_process_local_data + psum over DCN)
produces exactly the tallies of the single-process run.

Usage: python distributed_worker.py <pid> <nprocs> <port> <out.npz>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PID = int(sys.argv[1])
NPROCS = int(sys.argv[2])
PORT = sys.argv[3]
OUT = sys.argv[4]

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()

# jax may be pre-imported by the environment's sitecustomize; the runtime
# config update (not the env var) is what actually selects CPU (see conftest).
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from cpecan_signal_tpu.parallel import distributed as dist
from cpecan_signal_tpu.parallel import mesh as pmesh


def main():
    dist.initialize(f"localhost:{PORT}", NPROCS, PID)
    assert jax.process_count() == NPROCS
    assert len(jax.devices()) == 4 * NPROCS

    from __graft_entry__ import _tiny_batch
    n_total = 4 * NPROCS * 2  # 2 problems per device
    plan, W, batch = _tiny_batch(n_total, dtype=np.float64, seed=7)

    # this process's slice of the (deterministically built) global problem set
    per = n_total // NPROCS
    local = jax.tree.map(lambda x: np.asarray(x)[PID * per:(PID + 1) * per], batch)

    mesh = dist.global_data_mesh()
    gbatch = dist.make_global_batch(local, mesh)
    trans, kmer_gap, lik = pmesh.distributed_em_step(plan, W, mesh, gbatch,
                                                     presharded=True)
    if PID == 0:
        np.savez(OUT, trans=np.asarray(trans), kmer_gap=np.asarray(kmer_gap),
                 lik=np.asarray(lik))
    # all processes exit cleanly so the coordinator shuts down
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
