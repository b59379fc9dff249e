"""fast5 ingestion tests on a synthetic dragonet-1.15.0-style file, plus the
multi-read signal_align driver on the generated npRead."""

import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from cpecan_signal_tpu.constants import MODEL_PARAMS, NUM_OF_KMERS
from cpecan_signal_tpu.core.kmers import sequence_kmer_ranks
from cpecan_signal_tpu.io.fast5 import Fast5Read, fast5_to_npread
from cpecan_signal_tpu.io.fasta import reverse_complement, write_fasta
from cpecan_signal_tpu.io.npread import write_npread


def _make_fast5(path, seq, levels, rng):
    """Synthetic 2D fast5: one aligned event per kmer on both strands."""
    k = 6
    kmers = [seq[i:i + k] for i in range(len(seq) - k + 1)]
    n = len(kmers)
    with h5py.File(path, "w") as f:
        base = f.create_group("Analyses/Basecall_2D_000")
        base.attrs["dragonet version"] = "1.15.0"
        align_dt = np.dtype([("template", "<i8"), ("complement", "<i8"),
                             ("kmer", "S6")])
        table = np.zeros(n, dtype=align_dt)
        table["template"] = np.arange(n)
        table["complement"] = np.arange(n)[::-1]
        table["kmer"] = [km.encode() for km in kmers]
        base.create_group("BaseCalled_2D").create_dataset("Alignment", data=table)

        ev_dt = np.dtype([("mean", "<f8"), ("start", "<f8"), ("stdv", "<f8"),
                          ("length", "<f8")])
        for strand, means in (("template", levels),
                              ("complement", levels[::-1])):
            ev = np.zeros(n, dtype=ev_dt)
            ev["mean"] = means + rng.normal(0, 0.3, n)
            ev["start"] = np.arange(n) * 0.01
            ev["stdv"] = 1.5
            ev["length"] = 0.01
            g = base.create_group(f"BaseCalled_{strand}")
            g.create_dataset("Events", data=ev)
            model_dt = np.dtype([("kmer", "S6"), ("level_mean", "<f8"),
                                 ("level_stdv", "<f8"), ("sd_mean", "<f8"),
                                 ("sd_stdv", "<f8"), ("weight", "<f8")])
            model = np.zeros(8, dtype=model_dt)
            model["kmer"] = [b"AAAAAA"] * 8
            model["level_mean"] = 60.0
            model["level_stdv"] = 1.0
            model["sd_mean"] = 1.5
            model["sd_stdv"] = 0.3
            md = g.create_dataset("Model", data=model)
            md.attrs.update({"scale": 1.0, "shift": 0.0, "drift": 0.01,
                             "var": 1.0, "scale_sd": 1.0, "var_sd": 1.0})


@pytest.fixture(scope="module")
def fast5_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    tmp = tmp_path_factory.mktemp("fast5")
    seq = "".join(rng.choice(list("ACGT"), 80))
    levels = 50.0 + (sequence_kmer_ranks(seq) % 40)
    path = str(tmp / "read1.fast5")
    _make_fast5(path, seq, levels.astype(float), rng)
    return path, seq, levels


def test_fast5_to_npread(fast5_file):
    path, seq, levels = fast5_file
    npread = fast5_to_npread(path)
    assert npread.twoD_read == seq
    assert npread.read_length == len(seq)
    n_kmers = len(seq) - 5
    assert npread.template_events.shape == (n_kmers, 3)
    # event maps cover every 2D position, maps are monotone in the right sense
    assert len(npread.template_event_map) == len(seq)
    assert (np.diff(npread.template_event_map) >= 0).all()
    assert (np.diff(npread.complement_event_map) <= 0).all()
    # drift correction: means shifted by start*drift
    assert abs(npread.template_events[-1, 0]
               - (levels[-1] - (n_kmers - 1) * 0.01 * 0.01)) < 2.0


def test_model_export(fast5_file, tmp_path):
    path, *_ = fast5_file
    read = Fast5Read(path)
    out = tmp_path / "model.txt"
    with open(out, "w") as fh:
        assert read.export_model("template", fh)
    read.close()
    lines = open(out).read().splitlines()
    assert len(lines) == 3
    assert len(lines[1].split()) == 30
    vals = lines[0].split()
    assert vals[0] == "0" and (len(vals) - 1) % MODEL_PARAMS == 0
    # lambda = noise_mean^3 / noise_sd^2
    assert float(vals[5]) == pytest.approx(1.5**3 / 0.3**2)


def test_signal_align_driver(fast5_file, tmp_path):
    """Multi-read driver over an npRead converted from the fast5."""
    path, seq, levels = fast5_file
    npread = fast5_to_npread(path)
    read_dir = tmp_path / "reads"
    os.makedirs(read_dir)
    write_npread(str(read_dir / "r1.npRead"), npread)

    # reference = the read sequence embedded in flanks
    rng = np.random.default_rng(1)
    flank = lambda n: "".join(rng.choice(list("ACGT"), n))
    ref = flank(50) + seq + flank(50)
    ref_path = str(tmp_path / "ref.fa")
    write_fasta(ref_path, [("chr", ref)])

    # synthetic pore model matching the simulated levels
    model_path = str(tmp_path / "model.txt")
    ranks_all = np.arange(NUM_OF_KMERS)
    vals = ["0"]
    for r in ranks_all:
        vals += [str(50.0 + (r % 40)), "1.0", "1.5", "0.3",
                 str(1.5**3 / 0.3**2)]
    with open(model_path, "w") as fh:
        fh.write(" ".join(vals) + "\n")
        fh.write(" ".join(["0.1"] * 30) + "\n")
        fh.write(" ".join(vals) + "\n")

    from cpecan_signal_tpu.cli.signal_align import main
    out_dir = str(tmp_path / "out")
    rc = main(["-d", str(read_dir), "-r", ref_path, "-o", out_dir,
               "-T", model_path, "-C", model_path, "-s",
               "--constraintTrim", "2"])
    assert rc == 0
    tsv = os.path.join(out_dir, "posteriors.tsv")
    rows = [l.split("\t") for l in open(tsv)]
    assert len(rows) > 50
    t_rows = [r for r in rows if r[4] == "t"]
    # template positions land inside the embedded window
    pos = np.asarray([int(r[1]) for r in t_rows])
    assert pos.min() >= 40 and pos.max() <= 50 + len(seq)
