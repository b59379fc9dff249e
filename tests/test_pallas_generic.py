"""Generic Pallas path (per-cell transitions) vs the window engine.

Vanilla and echelon transitions are per-cell (skip-bin rows / Poisson duration
posteriors, stateMachine.c:1368-1460); the Pallas kernels consume them as
extra E channels (ops/pallas_fb._echans).  Interpret mode on CPU checks the
kernel logic; on-device behavior rides the same code paths as the SM3
pipeline exercised by bench.py.
"""

import numpy as np

from cpecan_signal_tpu.constants import MODEL_PARAMS, NUM_OF_KMERS
from cpecan_signal_tpu.core.band import band_construct
from cpecan_signal_tpu.core.kmers import sequence_kmer_ranks
from cpecan_signal_tpu.core.window import smooth_band
from cpecan_signal_tpu.engine import pallas_pipeline as pp
from cpecan_signal_tpu.engine import window
from cpecan_signal_tpu.models.pore_model import PoreModel
from cpecan_signal_tpu.models.state_machines import (make_signal_echelon,
                                                     make_signal_vanilla)


def _synthetic(n_bases=64, seed=1):
    rng = np.random.default_rng(seed)
    match = np.zeros((NUM_OF_KMERS + 2, MODEL_PARAMS))
    match[:NUM_OF_KMERS, 0] = rng.uniform(40, 90, NUM_OF_KMERS)
    match[:NUM_OF_KMERS, 1] = 1.0
    match[:NUM_OF_KMERS, 2] = rng.uniform(1, 3, NUM_OF_KMERS)
    match[:NUM_OF_KMERS, 3] = 0.3
    match[:NUM_OF_KMERS, 4] = 5.0
    skip_bins = np.concatenate([rng.uniform(0.05, 0.3, 30),
                                rng.uniform(0.1, 0.5, 30)])
    pore = PoreModel(0.9, match, 0.9, match.copy(), skip_bins)
    target = "".join(rng.choice(list("ACGT"), n_bases))
    ranks = sequence_kmer_ranks(target)
    n_ev = len(ranks) - 3
    events = np.stack([match[ranks[:n_ev], 0] + rng.normal(0, 0.5, n_ev),
                       np.full(n_ev, 2.0),
                       rng.uniform(0.005, 0.03, n_ev)], axis=1)
    band = band_construct([], len(ranks), n_ev, 4)
    wband = smooth_band(band, width_multiple=128)
    return pore, target, events, wband


def _check_machine(sm, wband, p_tol=2e-3, t_tol=0.1):
    import jax.numpy as jnp

    D, W = wband.n_diagonals, wband.W
    plan, prob = pp.make_window_pallas_problem(sm, wband)
    batch = pp.stack_problems([prob, prob])
    p_k, tot_k = [np.asarray(o) for o in
                  pp.run_window_pallas(plan, W, batch, Bt=2, interpret=True)]

    plan_w, winp = window.prepare_window_inputs(sm, wband, ragged_left=True,
                                                ragged_right=True,
                                                dtype=jnp.float64)
    F = window.forward(plan_w, winp)
    B = window.backward(plan_w, winp)
    p_h, tot_h = window.posterior_match_probs(plan_w, winp, F, B)
    p_h, tot_h = np.asarray(p_h), np.asarray(tot_h)

    assert (p_k[0][:D] >= 0.01).sum() == (p_h >= 0.01).sum()
    mask = (p_h >= 0.01) | (p_k[0][:D] >= 0.01)
    assert np.abs(p_k[0][:D] - p_h)[mask].max() < p_tol
    fin = np.isfinite(tot_h)
    assert np.abs(tot_k[0][:D] - tot_h)[fin].max() < t_tol
    np.testing.assert_allclose(p_k[0], p_k[1])


def test_pallas_vanilla_matches_window_engine():
    pore, target, events, wband = _synthetic(seed=1)
    sm = make_signal_vanilla(pore, target, events, strand="template")
    _check_machine(sm, wband)


def test_pallas_vanilla_complement_strand():
    pore, target, events, wband = _synthetic(seed=2)
    sm = make_signal_vanilla(pore, target, events, strand="complement")
    _check_machine(sm, wband)


def test_pallas_echelon_matches_window_engine():
    # 48 bases: echelon's 7 states x multi-kmer channels make this the
    # suite's most expensive interpret-mode kernel; smaller fixture, same
    # code paths (multi-kmer emissions, Poisson duration channels)
    pore, target, events, wband = _synthetic(n_bases=36, seed=3)
    sm = make_signal_echelon(pore, target, events)
    _check_machine(sm, wband)
