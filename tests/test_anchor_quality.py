"""Anchor-quality differential: the package's seed-chain anchorer vs the
reference's vendored lastz (VERDICT r4 missing #1).

Ground truth comes from the mutation generator itself (every base kept by
evolve-style mutation yields a known (src, out) aligned pair), so both
anchorers are scored on the same objective the reference cares about: does
the expansion-banded DP built from the anchors COVER the true alignment
path (pairwiseAligner.c:132-184 band geometry)?  A second check compares
end-to-end posterior pairs (our SM5 engine under either anchor set).

Skipped when parity/build/lastz is absent (make -C parity build/lastz).
"""

import numpy as np
import pytest

from cpecan_signal_tpu.anchor.lastz import lastz_anchor_pairs, lastz_available
from cpecan_signal_tpu.anchor.seed_chain import (get_anchor_pairs,
                                                 get_anchor_pairs_for_params)
from cpecan_signal_tpu.core.band import band_construct
from cpecan_signal_tpu.models.params import AlignmentParams

pytestmark = pytest.mark.skipif(not lastz_available(),
                                reason="parity/build/lastz not built")


def evolve_with_truth(seq, rng, sub, indel):
    """Mutate like bench.evolve_sequence but record the true aligned pairs
    (src_index, out_index) for every retained base."""
    bases = "ACGT"
    out = []
    truth = []
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
        truth.append((i, len(out)))
        out.append(c)
        i += 1
    return "".join(out), np.asarray(truth, dtype=np.int64)


def band_cover_fraction(anchors, truth, lx, ly, expansion):
    """Fraction of true pairs inside the anchor-derived band."""
    band = band_construct(np.asarray(anchors, dtype=np.int64), lx, ly,
                          expansion)
    d = truth[:, 0] + truth[:, 1]
    xmy = truth[:, 0] - truth[:, 1]
    ok = (d >= 0) & (d < band.n_diagonals)
    inside = ok & (xmy >= band.xmyL[np.clip(d, 0, band.n_diagonals - 1)]) \
        & (xmy <= band.xmyR[np.clip(d, 0, band.n_diagonals - 1)])
    return inside.sum() / max(len(truth), 1)


def _ref_seq():
    with open("/root/reference/tests/test_npReads/ZymoRef.txt") as fh:
        return fh.readline().strip()


@pytest.mark.parametrize("sub,indel", [(0.05, 0.02), (0.12, 0.05),
                                       (0.20, 0.08)])
def test_seed_chain_band_covers_truth_like_lastz(sub, indel):
    """At ~80-95% identity the seed-chain anchors' expansion-20 band must
    cover the true alignment path at least as well as lastz's (within 2%),
    and nearly completely in absolute terms."""
    rng = np.random.default_rng(int(sub * 100) + int(indel * 100))
    ref = _ref_seq()
    params = AlignmentParams()
    covA, covL = [], []
    for t in range(3):
        n = int(rng.integers(400, 750))
        lo = int(rng.integers(0, max(len(ref) - n - 1, 1)))
        sx = ref[lo:lo + n]
        sy, truth = evolve_with_truth(sx, rng, sub, indel)
        A = get_anchor_pairs_for_params(sx, sy, params)
        if len(A) == 0:
            A = get_anchor_pairs(sx, sy)
        L = lastz_anchor_pairs(sx, sy,
                               trim=params.constraint_diagonal_trim)
        covA.append(band_cover_fraction(A, truth, len(sx), len(sy),
                                        params.diagonal_expansion))
        covL.append(band_cover_fraction(L, truth, len(sx), len(sy),
                                        params.diagonal_expansion))
    mA, mL = float(np.mean(covA)), float(np.mean(covL))
    # the floor is the real spec: the band must cover nearly all true pairs
    assert mA >= 0.97, (mA, mL, covA, covL)
    assert mA >= mL - 0.02, (mA, mL, covA, covL)


def test_seed_chain_vs_lastz_posterior_jaccard():
    """End-to-end: our SM5 engine run under seed-chain anchors vs under
    lastz anchors must produce near-identical posterior pair sets."""
    import jax

    jax.config.update("jax_enable_x64", True)

    from cpecan_signal_tpu.engine.align import align_sequence_pair
    from cpecan_signal_tpu.models.state_machines import (bind_symbol_sequences,
                                                         make_symbol_sm5)

    rng = np.random.default_rng(7)
    ref = _ref_seq()
    params = AlignmentParams()

    def mk(sx, sy):
        sm = make_symbol_sm5()
        bind_symbol_sequences(sm, sx, sy)
        return sm

    jacc = []
    for t in range(2):
        n = int(rng.integers(400, 700))
        lo = int(rng.integers(0, max(len(ref) - n - 1, 1)))
        sx = ref[lo:lo + n]
        sy, _truth = evolve_with_truth(sx, rng, 0.10, 0.04)
        A = get_anchor_pairs(sx, sy)
        L = lastz_anchor_pairs(sx, sy,
                               trim=params.constraint_diagonal_trim)
        pa = align_sequence_pair(mk, sx, sy, A, params)
        pl = align_sequence_pair(mk, sx, sy, L, params)
        sa = set(zip(pa.x.tolist(), pa.y.tolist()))
        sl = set(zip(pl.x.tolist(), pl.y.tolist()))
        jacc.append(len(sa & sl) / max(len(sa | sl), 1))
    assert min(jacc) >= 0.95, jacc
