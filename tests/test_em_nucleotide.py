"""cPecanEm-equivalent tests: jobTree-style chunked EM with monotone
likelihood over iterations (cPecanEmTest.py:22-57 analogue)."""

import numpy as np
import pytest

from cpecan_signal_tpu.anchor.seed_chain import get_anchor_pairs
from cpecan_signal_tpu.cli.em import (chunk_alignments, expectation_maximisation,
                                      make_blast_scoring_matrix,
                                      set_jukes_cantor, tie_emissions)
from cpecan_signal_tpu.core.amap import pairs_to_cigar_ops
from cpecan_signal_tpu.em.accumulators import DiscreteHmm
from cpecan_signal_tpu.io.cigar import CigarRecord
from cpecan_signal_tpu.io.fasta import write_fasta
from cpecan_signal_tpu.models.params import AlignmentParams


def _make_dataset(tmp_path, n=3, seed=6):
    rng = np.random.default_rng(seed)
    recs, seqs = [], []
    for i in range(n):
        sx = "".join(rng.choice(list("ACGT"), 200))
        sy = "".join((c if rng.random() > 0.08 else rng.choice(list("ACGT")))
                     for c in sx if rng.random() > 0.02)
        seqs += [(f"x{i}", sx), (f"y{i}", sy)]
        anchors = get_anchor_pairs(sx, sy, k=8)
        pairs = np.concatenate([np.ones((len(anchors), 1), dtype=np.int64),
                                anchors], axis=1)
        recs.append(CigarRecord(f"x{i}", 0, len(sx), True, f"y{i}", 0, len(sy),
                                True, 0.0, pairs_to_cigar_ops(pairs, len(sx), len(sy))))
    fasta = str(tmp_path / "em.fa")
    cig = str(tmp_path / "em.cig")
    write_fasta(fasta, seqs)
    with open(cig, "w") as fh:
        fh.writelines(r.to_line() + "\n" for r in recs)
    return fasta, cig


def test_chunking():
    recs = [CigarRecord("a", 0, 600_000, True, "b", 0, 600_000, True, 0, [("M", 10)])
            for _ in range(4)]
    chunks = chunk_alignments(recs, 1_000_000)
    assert len(chunks) == 4  # each 600kb record overflows a 1Mb chunk


def test_em_monotone_and_export(tmp_path):
    fasta, cig = _make_dataset(tmp_path)
    liks = []
    hmm = expectation_maximisation(
        cig, [fasta], str(tmp_path / "out.hmm"), iterations=4, trials=1,
        params=AlignmentParams(constraint_diagonal_trim=2),
        log=lambda m: liks.append(float(m.rsplit(" ", 1)[-1]))
        if "likelihood" in m else None)
    assert len(liks) == 4
    for a, b in zip(liks, liks[1:]):
        assert b >= a * 1.001 or b >= a  # non-decreasing (negative values)
    assert liks[-1] > liks[0]
    # emissions trained towards identity
    assert np.trace(hmm.emissions[0]) > 0.5
    match_scores, gap_open, gap_extend = make_blast_scoring_matrix(
        hmm, ["ACGT" * 100])
    m = np.asarray(match_scores).reshape(4, 4)
    assert (np.diag(m) > 0).all()
    assert gap_open < 0 and gap_extend < 0
    # model file round-trip
    loaded = DiscreteHmm.load(str(tmp_path / "out.hmm"))
    np.testing.assert_allclose(loaded.transitions, hmm.transitions, atol=1e-5)


def test_hmm_utils():
    hmm = DiscreteHmm.empty(5, 4)
    set_jukes_cantor(hmm, 0.1)
    np.testing.assert_allclose(hmm.emissions[0].sum(), 1.0, atol=1e-9)
    assert hmm.emissions[0][0, 0] > hmm.emissions[0][0, 1]
    hmm.randomize(np.random.default_rng(0))
    tie_emissions(hmm)
    e = hmm.emissions[2]
    assert len({round(float(e[i, i]), 12) for i in range(4)}) == 1
    assert len({round(float(e[0, 1]), 12), round(float(e[1, 0]), 12)}) == 1
