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
