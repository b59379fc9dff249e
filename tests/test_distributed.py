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


@pytest.mark.slow
def test_two_process_signal_align_cli_matches_single(tmp_path):
    """The real signal_align CLI in 2 jax.distributed processes (reads
    partitioned per host, per-host part files merged by process 0) produces
    exactly the single-process TSV (VERDICT r2 item 5: multi-host must be
    launchable from the CLIs, ref scripts/signalAlign.py:103-146)."""
    import shutil

    CLI_WORKER = os.path.join(HERE, "distributed_cli_worker.py")
    NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
    REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
    reads = tmp_path / "reads"
    reads.mkdir()
    for i in range(2):
        shutil.copy(NPREAD, reads / f"read{i}.npRead")

    args = ["-d", str(reads), "-r", REF, "-s", "-n", "2"]

    # single process (no coordinator)
    out1 = tmp_path / "out1"
    env = {k: v for k, v in os.environ.items()
           if k not in ("SIGALIGN_COORDINATOR", "SIGALIGN_NUM_PROCS",
                        "SIGALIGN_PROC_ID", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "jax.config.update('jax_enable_x64', True); "
         "from cpecan_signal_tpu.cli.signal_align import main; "
         "sys.exit(main(%r))" % (os.path.dirname(HERE),
                                 args + ["-o", str(out1)])],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr

    # two processes under jax.distributed
    out2 = tmp_path / "out2"
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, CLI_WORKER, "signal_align", str(pid), "2",
         str(port)] + args + ["-o", str(out2)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o)
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    t1 = sorted((out1 / "posteriors.tsv").read_text().splitlines())
    t2 = sorted((out2 / "posteriors.tsv").read_text().splitlines())
    assert len(t1) > 1000
    assert t1 == t2


@pytest.mark.slow
def test_two_process_train_models_cli_matches_single(tmp_path):
    """train_models across 2 jax.distributed processes: per-host E-step
    slices + accumulator all-reduce must reproduce the single-process
    trained HMM byte-for-byte (ref: trainModels.py:107-135 worker pool +
    expectation-file sum)."""
    import shutil

    CLI_WORKER = os.path.join(HERE, "distributed_cli_worker.py")
    NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
    REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
    reads = tmp_path / "reads"
    reads.mkdir()
    for i in range(2):
        shutil.copy(NPREAD, reads / f"read{i}.npRead")

    env = {k: v for k, v in os.environ.items()
           if k not in ("SIGALIGN_COORDINATOR", "SIGALIGN_NUM_PROCS",
                        "SIGALIGN_PROC_ID", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"

    def run_single(out_dir):
        args = ["-r", REF, "-d", str(reads / "*.npRead"), "-s", "-i", "1",
                "-o", str(out_dir), "--engine", "host"]
        r = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); "
             "import jax; jax.config.update('jax_platforms', 'cpu'); "
             "jax.config.update('jax_enable_x64', True); "
             "from cpecan_signal_tpu.cli.train_models import main; "
             "sys.exit(main(%r))" % (os.path.dirname(HERE), args)],
            env=env, capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stdout + r.stderr

    out1 = tmp_path / "t1"
    out1.mkdir()
    run_single(out1)

    out2 = tmp_path / "t2"
    out2.mkdir()
    port = _free_port()
    args2 = ["-r", REF, "-d", str(reads / "*.npRead"), "-s", "-i", "1",
             "-o", str(out2), "--engine", "host"]
    procs = [subprocess.Popen(
        [sys.executable, CLI_WORKER, "train_models", str(pid), "2",
         str(port)] + args2,
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    for p in procs:
        try:
            o, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, o

    for name in ("template_trained.hmm", "complement_trained.hmm"):
        assert (out1 / name).read_text() == (out2 / name).read_text(), name


@pytest.mark.slow
def test_two_process_em_cli_matches_single(tmp_path):
    """The real nucleotide-EM CLI (cPecanEm equivalent) across 2
    jax.distributed processes: chunks partitioned per host, per-chunk
    tallies all-reduced and summed in chunk order — the output model file is
    byte-identical to the single-process run (VERDICT r3 item 5; ref
    cPecanEm.py:404-426 jobTree fan-out + follow-on merge)."""
    import numpy as np

    from cpecan_signal_tpu.anchor.seed_chain import get_anchor_pairs
    from cpecan_signal_tpu.core.amap import pairs_to_cigar_ops
    from cpecan_signal_tpu.io.cigar import CigarRecord
    from cpecan_signal_tpu.io.fasta import write_fasta

    rng = np.random.default_rng(17)
    recs, seqs = [], []
    for i in range(4):
        sx = "".join(rng.choice(list("ACGT"), 150))
        sy = "".join((c if rng.random() > 0.08 else rng.choice(list("ACGT")))
                     for c in sx if rng.random() > 0.02)
        seqs += [(f"x{i}", sx), (f"y{i}", sy)]
        anchors = get_anchor_pairs(sx, sy, k=8)
        pairs = np.concatenate([np.ones((len(anchors), 1), dtype=np.int64),
                                anchors], axis=1)
        recs.append(CigarRecord(f"x{i}", 0, len(sx), True, f"y{i}", 0,
                                len(sy), True, 0.0,
                                pairs_to_cigar_ops(pairs, len(sx), len(sy))))
    fasta = str(tmp_path / "em.fa")
    cig = str(tmp_path / "em.cig")
    write_fasta(fasta, seqs)
    with open(cig, "w") as fh:
        fh.writelines(r.to_line() + "\n" for r in recs)

    CLI_WORKER = os.path.join(HERE, "distributed_cli_worker.py")
    # tiny chunks so 4 records -> 4 chunks -> real partitioning across hosts
    base_args = ["--alignments", cig, "--fastas", fasta,
                 "--iterations", "2", "--trials", "1",
                 "--maxAlignmentLengthPerJob", "10"]
    env = {k: v for k, v in os.environ.items()
           if k not in ("SIGALIGN_COORDINATOR", "SIGALIGN_NUM_PROCS",
                        "SIGALIGN_PROC_ID", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"

    m1 = tmp_path / "m1.hmm"
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "jax.config.update('jax_enable_x64', True); "
         "from cpecan_signal_tpu.cli.em import main; "
         "sys.exit(main(%r))" % (os.path.dirname(HERE),
                                 base_args + ["--outputModel", str(m1)])],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr

    m2 = tmp_path / "m2.hmm"
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, CLI_WORKER, "em", str(pid), "2", str(port)]
        + base_args + ["--outputModel", str(m2)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o)
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    assert m1.read_text() == m2.read_text()
