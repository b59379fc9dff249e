"""Auxiliary subsystem tests: checkpointing, counters, analysis utilities."""

import numpy as np
import pytest

from cpecan_signal_tpu.analysis.alignments import (AlignmentTable,
                                                   duration_analysis,
                                                   kmer_event_histograms,
                                                   make_build_alignment,
                                                   process_posteriors,
                                                   summarize_alignments)
from cpecan_signal_tpu.utils.checkpoint import (latest_checkpoint,
                                                load_checkpoint,
                                                save_checkpoint)
from cpecan_signal_tpu.utils.observability import Counters, timed


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "transitions": {"t": np.random.default_rng(0).random((3, 3)),
                        "c": np.random.default_rng(1).random((3, 3))},
        "kmer_gaps": np.random.default_rng(2).random(4096),
        "iteration": 7,
        "rng_key": np.asarray([1, 2], dtype=np.uint32),
    }
    path = str(tmp_path / "ckpt_000007.npz")
    save_checkpoint(path, state, step=7)
    loaded, step = load_checkpoint(path)
    assert step == 7
    np.testing.assert_allclose(loaded["transitions"]["t"], state["transitions"]["t"])
    np.testing.assert_allclose(loaded["kmer_gaps"], state["kmer_gaps"])
    assert loaded["iteration"] == 7
    assert latest_checkpoint(str(tmp_path)) == path


def test_counters():
    c = Counters()
    c.add("reads")
    c.add("reads")
    c.observe("band_width", 40)
    c.observe("band_width", 60)
    snap = c.snapshot()
    assert snap["reads"] == 2
    assert snap["band_width.sum"] == 100
    assert snap["band_width.max"] == 60
    with timed("noop"):
        pass


@pytest.fixture()
def tsv(tmp_path):
    rows = []
    rng = np.random.default_rng(0)
    for i in range(50):
        rows.append("\t".join(map(str, [
            "chr", 100 + i, "ACGTAC", "read1", "t" if i % 2 else "c", i,
            60.0 + i, 1.5, 0.01 * (i + 1), "ACGTAC", 60.0, 1.5,
            round(rng.uniform(0.3, 1.0), 3), 59.0, 59.5])))
    path = str(tmp_path / "a.tsv")
    with open(path, "w") as fh:
        fh.write("\n".join(rows) + "\n")
    return path


def test_alignment_table_analysis(tsv):
    table = AlignmentTable.read(tsv)
    assert len(table.rows) == 50
    hist = kmer_event_histograms(table)
    assert len(hist["ACGTAC"]) == 50
    calls = process_posteriors(table, threshold=0.0)
    assert len(calls) == 50  # unique (strand, event)
    stats = duration_analysis(table)
    assert stats["n"] == 50 and stats["max"] == pytest.approx(0.5)
    cmp = summarize_alignments(table, table)
    assert cmp["jaccard"] == 1.0 and cmp["only_a"] == 0
    build = make_build_alignment([(table, None)], threshold=0.0, max_per_kmer=10)
    assert 0 < len(build) <= 20  # capped per (strand, kmer)


def test_accumulator_file_roundtrips(tmp_path):
    from cpecan_signal_tpu.em.accumulators import HdpHmm, VanillaHmm
    rng = np.random.default_rng(0)
    v = VanillaHmm.empty()
    v.bins = rng.random(60)
    v.likelihood = -123.5
    v.match_model = rng.random(1 + 4096 * 5)
    v.scaled_model = rng.random(1 + 4096 * 5)
    p = str(tmp_path / "v.hmm")
    v.write(p)
    v2 = VanillaHmm.load(p)
    np.testing.assert_allclose(v2.bins, v.bins, atol=1e-6)
    assert v2.likelihood == pytest.approx(v.likelihood)
    np.testing.assert_allclose(v2.match_model, v.match_model, atol=1e-6)

    h = HdpHmm.empty(threshold=0.3)
    h.transitions = rng.random((3, 3))
    h.kmer_assignments = ["ACGTAC", "TTTTTT"]
    h.event_assignments = [63.5, 70.25]
    p = str(tmp_path / "h.hmm")
    h.write(p)
    h2 = HdpHmm.load(p)
    assert h2.kmer_assignments == h.kmer_assignments
    np.testing.assert_allclose(h2.event_assignments, h.event_assignments)
    assert h2.threshold == pytest.approx(0.3)
    np.testing.assert_allclose(h2.transitions, h.transitions, atol=1e-6)


def test_train_vanilla_and_checkpoint_resume(tmp_path):
    from cpecan_signal_tpu.cli.train_models import train
    ck = str(tmp_path / "ck")
    import os
    os.makedirs(ck)
    kwargs = dict(
        template_model_path="/root/reference/models/template_median68pA.model",
        complement_model_path="/root/reference/models/complement_median68pA_pop2.model",
        sm_type="vanilla", out_dir=str(tmp_path), checkpoint_dir=ck,
        log=lambda *a: None)
    r1 = train("/root/reference/tests/test_npReads/ZymoRef.txt",
               ["/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"],
               iterations=2, **kwargs)
    assert len(r1["likelihoods"]) == 2
    bins = r1["accumulators"]["t"].bins
    assert bins.sum() == pytest.approx(1.0, abs=1e-6)  # joint normalization
    # resume: next call continues from iteration 2
    r2 = train("/root/reference/tests/test_npReads/ZymoRef.txt",
               ["/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"],
               iterations=3, **kwargs)
    assert len(r2["likelihoods"]) == 3
