"""Canonical engine oracle tests.

Replicates the reference's test_diagonalDPCalculations
(tests/pairwiseAlignerTest.c:278-374): 5-state symbol machine on
"AGCG"/"AGTTCG", full-width band, asserting (i) forward total == backward
total, (ii) every diagonal's total probability equals the global total,
(iii) the exact posterior aligned-pair set at threshold 0.2.
"""

import numpy as np
import pytest

from cpecan_signal_tpu.core.band import band_construct
from cpecan_signal_tpu.engine import fb
from cpecan_signal_tpu.models.state_machines import (
    bind_symbol_sequences, make_symbol_sm5)

SX = "AGCG"
SY = "AGTTCG"


@pytest.fixture(scope="module")
def fb_results():
    sm = make_symbol_sm5()
    bind_symbol_sequences(sm, SX, SY)
    band = band_construct([], len(SX), len(SY), 2)
    plan, inp = fb.prepare_inputs(sm, band, ragged_left=False, ragged_right=False)
    F = fb.forward(plan, inp)
    B = fb.backward(plan, inp)
    return sm, band, plan, inp, np.asarray(F), np.asarray(B)


def test_band_full_width(fb_results):
    # An anchorless band with expansion 2 degenerates to the full matrix
    # (getAlignedPairsWithoutBanding, pairwiseAligner.c:1532).
    _, band, *_ = fb_results
    lX, lY = len(SX), len(SY)
    widths = band.widths
    for d in range(lX + lY + 1):
        x_min = max(0, d - lY)
        x_max = min(lX, d)
        assert widths[d] == x_max - x_min + 1


def test_forward_equals_backward_total(fb_results):
    sm, band, plan, inp, F, B = fb_results
    D = band.n_diagonals
    # forward total: dot of final forward diagonal with end-state probs
    valid_last = np.asarray(inp.valid)[D - 1]
    f_last = F[D - 1][valid_last]
    total_fwd = _lse(f_last + np.asarray(sm.end)[None, :])
    # backward total: dot of first backward diagonal with start-state probs
    b0 = B[0][np.asarray(inp.valid)[0]]
    total_bwd = _lse(b0 + np.asarray(sm.start)[None, :])
    assert total_fwd == pytest.approx(total_bwd, abs=1e-3)


def _lse(a):
    a = np.asarray(a).ravel()
    a = a[np.isfinite(a)]
    m = a.max()
    return m + np.log(np.exp(a - m).sum())


def test_per_diagonal_totals(fb_results):
    sm, band, plan, inp, F, B = fb_results
    totals = np.asarray(fb.diagonal_totals(plan, inp, F, B))
    for d in range(band.n_diagonals):
        assert totals[d] == pytest.approx(totals[-1], abs=1e-2), f"diagonal {d}"


def test_oracle_aligned_pairs(fb_results):
    sm, band, plan, inp, F, B = fb_results
    p_grid, totals = fb.posterior_match_probs(plan, inp, F, B, "final")
    p_grid = np.asarray(p_grid)
    x = np.asarray(inp.x)
    y = np.asarray(inp.y)
    mask = p_grid >= 0.2
    pairs = {(int(xv) - 1, int(yv) - 1) for xv, yv in zip(x[mask], y[mask])}
    assert pairs == {(0, 0), (1, 1), (2, 4), (3, 5)}
