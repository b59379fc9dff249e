"""Echelon state machine tests (stateMachineEchelon, multi-kmer emissions)."""

import numpy as np
import pytest

from cpecan_signal_tpu.constants import MODEL_PARAMS, NUM_OF_KMERS
from cpecan_signal_tpu.core.band import band_construct
from cpecan_signal_tpu.core.kmers import sequence_kmer_ranks
from cpecan_signal_tpu.engine import fb
from cpecan_signal_tpu.models.pore_model import PoreModel
from cpecan_signal_tpu.models.state_machines import make_signal_echelon


@pytest.fixture(scope="module")
def echelon_setup():
    rng = np.random.default_rng(0)
    m = np.zeros((NUM_OF_KMERS + 2, MODEL_PARAMS))
    m[:NUM_OF_KMERS] = np.column_stack([
        rng.uniform(40, 90, NUM_OF_KMERS), np.ones(NUM_OF_KMERS),
        rng.uniform(1, 3, NUM_OF_KMERS), np.full(NUM_OF_KMERS, 0.3),
        np.full(NUM_OF_KMERS, 5.0)])
    pore = PoreModel(0.9, m, 0.9, m.copy(), np.full(60, 1 / 30))
    target = "".join(rng.choice(list("ACGT"), 30))
    ranks = sequence_kmer_ranks(target)
    events = np.column_stack([m[ranks, 0] + rng.normal(0, 0.4, len(ranks)),
                              np.full(len(ranks), 2.0),
                              np.full(len(ranks), 0.003)])
    sm = make_signal_echelon(pore, target, events)
    band = band_construct([], len(ranks), len(events), 2)
    plan, inp = fb.prepare_inputs(sm, band, ragged_left=True, ragged_right=True)
    F = fb.forward(plan, inp)
    B = fb.backward(plan, inp)
    return plan, inp, F, B


def test_echelon_totals_consistent(echelon_setup):
    plan, inp, F, B = echelon_setup
    totals = np.asarray(fb.diagonal_totals(plan, inp, F, B))
    assert np.abs(totals - totals[-1]).max() < 1e-6


def test_echelon_multi_posteriors(echelon_setup):
    plan, inp, F, B = echelon_setup
    p_states, totals = fb.posterior_multi_match_probs(plan, inp, F, B)
    p_states = np.asarray(p_states)
    assert p_states.shape[0] == 5  # match1..match5
    probs, xs, ys = fb.extract_multi_pairs(p_states, np.asarray(inp.x),
                                           np.asarray(inp.y), 0.1)
    assert len(probs) > 10
    # events simulated one per (trailing-convention) kmer: pairs concentrate
    # on the x = y + delta band with small delta
    deltas = xs - ys
    vals, counts = np.unique(deltas, return_counts=True)
    assert counts.max() / counts.sum() > 0.5
