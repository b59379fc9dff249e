"""Multiple-alignment tests (multipleAligner equivalent)."""

import numpy as np
import pytest

from cpecan_signal_tpu.models.params import AlignmentParams
from cpecan_signal_tpu.msa import _ColumnPoset, make_alignment


def test_poset_rejects_order_violations():
    poset = _ColumnPoset([5, 5])
    assert poset.merge((0, 1), (1, 1))
    assert poset.merge((0, 3), (1, 3))
    # (0,2)-(1,4) would be fine; (0,4)-(1,2) crosses the (0,3)-(1,3) column
    assert poset.merge((0, 2), (1, 2))
    assert not poset.can_merge((0, 4), (1, 0))


def test_poset_rejects_same_sequence():
    poset = _ColumnPoset([5, 5])
    poset.merge((0, 1), (1, 1))
    assert not poset.can_merge((0, 2), (0, 3))


def test_make_alignment_related_seqs():
    rng = np.random.default_rng(0)
    base = "".join(rng.choice(list("ACGT"), 60))

    def mutate(s):
        return "".join(c if rng.random() > 0.08 else rng.choice(list("ACGT"))
                       for c in s)

    seqs = [base, mutate(base), mutate(base)]
    msa = make_alignment(seqs, params=AlignmentParams(threshold=0.3))
    assert len(msa.pairwise_pairs) > 100
    # consistent pairs are the bulk, and columns mostly align homologous sites
    assert len(msa.consistent_pairs) > 0.8 * len(msa.pairwise_pairs)
    full_cols = [c for c in msa.columns if len(c) == 3]
    assert len(full_cols) > 30
    same_pos = sum(1 for c in full_cols if len({p for _, p in c}) == 1)
    assert same_pos / len(full_cols) > 0.8
