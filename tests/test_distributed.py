"""Multi-host distribution: 2-process CPU-simulated pod test.

Spawns 2 worker processes (4 virtual CPU devices each = a simulated
2-host x 4-chip pod), runs the distributed EM step over the global mesh
(psum over DCN), and asserts the tallies match the single-process 8-device
run bit-for-bit modulo float tolerance.  This is the test the reference
lacks entirely (SURVEY §4: "no multi-node test infrastructure").
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """The same batch through the in-process 8-device virtual mesh."""
    from __graft_entry__ import _tiny_batch
    from cpecan_signal_tpu.parallel import mesh as pmesh

    plan, W, batch = _tiny_batch(16, dtype=np.float64, seed=7)
    mesh = pmesh.make_mesh(8)
    trans, kmer_gap, lik = pmesh.distributed_em_step(plan, W, mesh, batch)
    return np.asarray(trans), np.asarray(kmer_gap), float(lik)


@pytest.mark.slow
def test_two_process_em_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "proc0.npz"
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    for pid in range(2):
        env = dict(env_base)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o)
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{o}"
    assert out.exists(), f"worker 0 wrote no output:\n{outs[0]}"

    got = np.load(out)
    want_trans, want_kmer, want_lik = _single_process_reference()
    np.testing.assert_allclose(got["trans"], want_trans, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(got["kmer_gap"], want_kmer, rtol=1e-12, atol=1e-12)
    assert float(got["lik"]) == pytest.approx(want_lik, rel=1e-12)
