"""Realigner (cPecanRealign equivalent) + amap post-processing tests."""

import io

import numpy as np
import pytest

from cpecan_signal_tpu.core import amap
from cpecan_signal_tpu.io.cigar import CigarRecord, parse_cigar_line


class TestAmap:
    def test_reweight(self):
        # one perfect pair at (0,0); another low-probability pair at (2,2)
        P = 10_000_000
        pairs = np.array([[P, 0, 0], [P // 10, 2, 2]], dtype=np.int64)
        out = amap.reweight_aligned_pairs(pairs, 3, 3, 0.5)
        # pair 0: indelProbX[0]=0, indelProbY[0]=0 -> unchanged
        assert out[0, 0] == P
        # pair 1 loses gamma * (0.9 + 0.9) * P
        assert out[1, 0] == P // 10 - int(0.5 * (2 * (P - P // 10)))

    def test_ordered_filter_picks_max_weight_chain(self):
        pairs = np.array([
            [5, 0, 0], [3, 1, 1], [10, 1, 2], [4, 2, 1], [2, 2, 3],
        ], dtype=np.int64)
        out = amap.filter_pairs_to_ordered(pairs)
        # best chain: (0,0) -> (1,2) -> (2,3) with weight 17
        assert out[:, 0].sum() == 17
        xs, ys = out[:, 1], out[:, 2]
        assert (np.diff(xs) > 0).all() and (np.diff(ys) > 0).all()

    def test_pairs_to_cigar_roundtrip(self):
        pairs = np.array([[1, 0, 0], [1, 1, 1], [1, 3, 2], [1, 4, 5]],
                         dtype=np.int64)
        ops = amap.pairs_to_cigar_ops(pairs, 6, 7)
        # M2 (0,0),(1,1); D1 (skip x=2); M1 (3,2); I2 (skip y=3,4); M1 (4,5);
        # trailing gap to (6,7): D1 I1 then final M excluded
        assert ops[0] == ("M", 2)
        assert ("D", 1) in ops
        # consume check
        dx = sum(l for op, l in ops if op in ("M", "D"))
        dy = sum(l for op, l in ops if op in ("M", "I"))
        assert dx <= 6 and dy <= 7

    def test_split_long_indels(self):
        rec = CigarRecord("a", 0, 30, True, "b", 0, 12, True, 1.0,
                          [("M", 5), ("D", 20), ("M", 5), ("I", 2), ("M", 2)])
        out = amap.split_long_indels(rec, 10)
        assert len(out) == 2
        for r in out:
            assert r.ops[0][0] == "M" and r.ops[-1][0] == "M"
        assert out[0].end1 - out[0].start1 == 5
        assert out[1].start1 == 25

    def test_scores(self):
        pairs = np.array([[10_000_000, 0, 0], [10_000_000, 1, 1]], dtype=np.int64)
        assert amap.score_by_posterior(pairs, 2, 2, True) == pytest.approx(100.0)
        assert amap.score_by_identity("AC", "AC", pairs, True) == pytest.approx(100.0)
        assert amap.score_by_identity("AC", "AG", pairs, True) == pytest.approx(50.0)


class TestRealign:
    def _setup(self, tmp_path, rng_seed=0):
        rng = np.random.default_rng(rng_seed)
        sx = "".join(rng.choice(list("ACGT"), 120))
        # mutate
        sy = []
        for c in sx:
            r = rng.random()
            if r < 0.03:
                continue
            if r < 0.06:
                sy.append(rng.choice(list("ACGT")))
            sy.append(c if rng.random() > 0.05 else rng.choice(list("ACGT")))
        sy = "".join(sy)
        from cpecan_signal_tpu.io.fasta import write_fasta
        fasta = str(tmp_path / "seqs.fa")
        write_fasta(fasta, [("sx", sx), ("sy", sy)])
        from cpecan_signal_tpu.anchor.seed_chain import get_anchor_pairs
        from cpecan_signal_tpu.core.amap import pairs_to_cigar_ops
        anchors = get_anchor_pairs(sx, sy, k=10)
        pairs = np.concatenate([np.ones((len(anchors), 1), dtype=np.int64),
                                anchors], axis=1)
        ops = pairs_to_cigar_ops(pairs, len(sx), len(sy))
        guide = CigarRecord("sx", 0, len(sx), True, "sy", 0, len(sy), True,
                            0.0, ops)
        return sx, sy, fasta, guide

    def test_realign_record(self, tmp_path):
        from cpecan_signal_tpu.cli.realign import realign_record
        from cpecan_signal_tpu.models.params import AlignmentParams
        sx, sy, fasta, guide = self._setup(tmp_path)
        seqs = {"sx": sx, "sy": sy}
        out = realign_record(guide, seqs, AlignmentParams(constraint_diagonal_trim=2),
                             rescore="identity_ignoring_gaps")
        assert len(out) == 1
        r = out[0]
        assert r.score > 80  # realigned identity should be high
        # ops consume the full subsequences
        dx = sum(l for op, l in r.ops if op in ("M", "D"))
        dy = sum(l for op, l in r.ops if op in ("M", "I"))
        assert dx <= len(sx) and dy <= len(sy)
        assert r.start1 == 0 and r.end1 == len(sx)

    def test_realign_main_stdin(self, tmp_path, monkeypatch, capsys):
        from cpecan_signal_tpu.cli import realign
        sx, sy, fasta, guide = self._setup(tmp_path, 1)
        monkeypatch.setattr("sys.stdin", io.StringIO(guide.to_line() + "\n"))
        rc = realign.main([fasta, "--constraintDiagonalTrim", "2",
                           "--rescoreByPosteriorProbIgnoringGaps"])
        assert rc == 0
        out = capsys.readouterr().out.strip()
        rec = parse_cigar_line(out)
        assert rec is not None
        assert rec.contig1 == "sx" and rec.contig2 == "sy"
        assert rec.score > 50

    def test_realign_expectations(self, tmp_path, monkeypatch):
        from cpecan_signal_tpu.cli import realign
        from cpecan_signal_tpu.em.accumulators import DiscreteHmm
        sx, sy, fasta, guide = self._setup(tmp_path, 2)
        exp_file = str(tmp_path / "exp.hmm")
        monkeypatch.setattr("sys.stdin", io.StringIO(guide.to_line() + "\n"))
        rc = realign.main([fasta, "--constraintDiagonalTrim", "2",
                           "--outputExpectations", exp_file])
        assert rc == 0
        hmm = DiscreteHmm.load(exp_file)
        assert hmm.transitions.shape == (5, 5)
        assert hmm.transitions.sum() > 0
        assert hmm.likelihood < 0
