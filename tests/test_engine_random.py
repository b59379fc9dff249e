"""Randomized property tests for the banded engine.

Mirrors the reference's randomized banding tests
(tests/pairwiseAlignerTest.c:375-491): random sequence pairs (one an evolved
mutant of the other), random band expansions and random anchors; asserts
structural invariants of the output pairs and cross-checks the banded engine
against the brute-force full-matrix oracle when the band covers the matrix.
"""

import numpy as np
import pytest

from cpecan_signal_tpu.core.band import band_construct
from cpecan_signal_tpu.engine import fb
from cpecan_signal_tpu.models.state_machines import (
    bind_symbol_sequences, make_signal_sm3, make_symbol_sm5)
from cpecan_signal_tpu.models.pore_model import PoreModel
from cpecan_signal_tpu.constants import NUM_OF_KMERS, MODEL_PARAMS, KMER_LENGTH

from oracle import full_forward, full_backward, total_prob, total_prob_bwd


def random_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def evolve(rng, seq, subst=0.1, indel=0.05):
    out = []
    for c in seq:
        r = rng.random()
        if r < indel / 2:
            continue  # deletion
        if r < indel:
            out.append(rng.choice(list("ACGT")))  # insertion
        if rng.random() < subst:
            c = rng.choice(list("ACGT"))
        out.append(c)
    return "".join(out) if out else "A"


def random_anchors(rng, lx, ly):
    anchors = []
    x, y = -1, -1
    while True:
        x += rng.integers(1, 10)
        y += rng.integers(1, 10)
        if x >= lx or y >= ly:
            break
        anchors.append((x, y))
    return np.asarray(anchors, dtype=np.int64).reshape(-1, 2)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_full_band_matches_oracle_sm5(seed):
    rng = np.random.default_rng(seed)
    sx = random_seq(rng, rng.integers(3, 25))
    sy = evolve(rng, sx)
    sm = make_symbol_sm5()
    bind_symbol_sequences(sm, sx, sy)
    lX, lY = len(sx), len(sy)

    Fo = full_forward(sm, lX, lY)
    Bo = full_backward(sm, lX, lY)
    tf, tb = total_prob(sm, Fo), total_prob_bwd(sm, Bo)
    assert tf == pytest.approx(tb, abs=1e-6)

    band = band_construct([], lX, lY, 2)
    plan, inp = fb.prepare_inputs(sm, band, ragged_left=False, ragged_right=False)
    F = np.asarray(fb.forward(plan, inp))
    B = np.asarray(fb.backward(plan, inp))
    x = np.asarray(inp.x)
    y = np.asarray(inp.y)
    valid = np.asarray(inp.valid)
    for d in range(band.n_diagonals):
        for k in np.where(valid[d])[0]:
            np.testing.assert_allclose(F[d, k], Fo[x[d, k], y[d, k]], atol=1e-9)
            np.testing.assert_allclose(B[d, k], Bo[x[d, k], y[d, k]], atol=1e-9)

    totals = np.asarray(fb.diagonal_totals(plan, inp, F, B))
    np.testing.assert_allclose(totals, tf, atol=1e-6)


@pytest.mark.parametrize("seed", [3, 4, 5, 6])
def test_banded_pairs_invariants(seed):
    """Banded posterior pairs: unique coordinates, in range, probs in (0, 1]
    (checkAlignedPairs, tests/pairwiseAlignerTest.c:392-417)."""
    rng = np.random.default_rng(seed)
    sx = random_seq(rng, rng.integers(10, 60))
    sy = evolve(rng, sx)
    sm = make_symbol_sm5()
    bind_symbol_sequences(sm, sx, sy)
    lX, lY = len(sx), len(sy)
    anchors = random_anchors(rng, lX, lY)
    expansion = 2 * int(rng.integers(1, 6))
    band = band_construct(anchors, lX, lY, expansion)
    plan, inp = fb.prepare_inputs(sm, band, ragged_left=bool(rng.integers(2)),
                                  ragged_right=bool(rng.integers(2)))
    F = fb.forward(plan, inp)
    B = fb.backward(plan, inp)
    p_grid, totals = fb.posterior_match_probs(plan, inp, F, B)
    p_grid = np.asarray(p_grid)
    x = np.asarray(inp.x)
    y = np.asarray(inp.y)
    mask = p_grid >= 0.01
    xs, ys, ps = x[mask] - 1, y[mask] - 1, p_grid[mask]
    assert len(set(zip(xs.tolist(), ys.tolist()))) == len(xs)
    assert (xs >= 0).all() and (xs < lX).all()
    assert (ys >= 0).all() and (ys < lY).all()
    assert (ps > 0).all() and (ps <= 1.0).all()


def synthetic_pore_model(rng) -> PoreModel:
    match = np.zeros((NUM_OF_KMERS + 2, MODEL_PARAMS))
    match[:NUM_OF_KMERS, 0] = rng.uniform(40, 90, NUM_OF_KMERS)   # level mean
    match[:NUM_OF_KMERS, 1] = rng.uniform(0.5, 2.0, NUM_OF_KMERS)  # level sd
    match[:NUM_OF_KMERS, 2] = rng.uniform(1.0, 3.0, NUM_OF_KMERS)  # noise mean
    match[:NUM_OF_KMERS, 3] = rng.uniform(0.1, 0.5, NUM_OF_KMERS)  # noise sd
    match[:NUM_OF_KMERS, 4] = rng.uniform(1.0, 10.0, NUM_OF_KMERS)  # noise lambda
    y_model = match.copy()
    y_model[:NUM_OF_KMERS, 0] += rng.normal(0, 1, NUM_OF_KMERS)
    bins = np.full(60, 1.0 / 30)
    return PoreModel(0.9, match, 0.9, y_model, bins)


@pytest.mark.parametrize("seed", [7, 8])
def test_full_band_matches_oracle_sm3_signal(seed):
    """threeState signal machine vs oracle on synthetic events."""
    rng = np.random.default_rng(seed)
    pore = synthetic_pore_model(rng)
    n_bases = int(rng.integers(KMER_LENGTH + 2, 25))
    target = random_seq(rng, n_bases)
    lX = n_bases - KMER_LENGTH + 1
    lY = int(rng.integers(3, 20))
    events = np.stack([rng.uniform(40, 90, lY), rng.uniform(1, 3, lY),
                       rng.uniform(0.001, 0.1, lY)], axis=1)
    sm = make_signal_sm3(pore, target, events)

    Fo = full_forward(sm, lX, lY, ragged_left=True)
    Bo = full_backward(sm, lX, lY, ragged_right=True)
    tf = total_prob(sm, Fo, ragged_right=True)
    tb = total_prob_bwd(sm, Bo, ragged_left=True)
    assert tf == pytest.approx(tb, abs=1e-6)

    band = band_construct([], lX, lY, 2)
    plan, inp = fb.prepare_inputs(sm, band, ragged_left=True, ragged_right=True)
    F = np.asarray(fb.forward(plan, inp))
    B = np.asarray(fb.backward(plan, inp))
    x = np.asarray(inp.x)
    y = np.asarray(inp.y)
    valid = np.asarray(inp.valid)
    for d in range(band.n_diagonals):
        for k in np.where(valid[d])[0]:
            np.testing.assert_allclose(F[d, k], Fo[x[d, k], y[d, k]], atol=1e-8)
            np.testing.assert_allclose(B[d, k], Bo[x[d, k], y[d, k]], atol=1e-8)
    totals = np.asarray(fb.diagonal_totals(plan, inp, F, B))
    np.testing.assert_allclose(totals, tf, atol=1e-6)
