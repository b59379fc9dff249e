"""E-step drivers: run banded FB over splits and collect expectation tallies
into accumulators (the equivalent of getExpectationsUsingAnchors +
getSignalExpectations, pairwiseAligner.c:1571-1614 / vanillaAlign.c:318-359).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..constants import KMER_LENGTH
from ..core.anchors import anchors_in_window, get_split_points
from ..core.band import band_construct
from ..core.kmers import rank_to_kmer
from ..engine import expectations as exp_kernels
from ..engine import fb
from ..models.params import AlignmentParams
from .accumulators import ContinuousPairHmm, DiscreteHmm, HdpHmm, VanillaHmm


def _split_loop(target_len_dp, events_len, anchors, params, ragged_left, ragged_right):
    anchors = np.asarray(anchors, dtype=np.int64).reshape(-1, 2)
    splits = get_split_points(anchors, target_len_dp, events_len,
                              params.split_matrix_bigger_than_this,
                              ragged_left, ragged_right,
                              max_gap_min_dim=params.max_gap_min_dim)
    for i, (x1, y1, x2, y2) in enumerate(splits):
        sub_anchors = anchors_in_window(anchors, x1, y1, x2, y2)
        band = band_construct(sub_anchors, x2 - x1, y2 - y1, params.diagonal_expansion)
        rl = ragged_left or i > 0
        rr = ragged_right or i < len(splits) - 1
        yield (x1, y1, x2, y2), band, rl, rr


def sm3_expectations(make_sm: Callable, target_seq: str, events: np.ndarray,
                     anchors: np.ndarray, params: AlignmentParams,
                     *, ragged_left=True, ragged_right=True, dtype=None
                     ) -> ContinuousPairHmm:
    """threeState E-step over one read -> ContinuousPairHmm tallies."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float64
    lX = len(target_seq) - KMER_LENGTH + 1
    acc = ContinuousPairHmm.empty()
    for (x1, y1, x2, y2), band, rl, rr in _split_loop(lX, len(events), anchors, params,
                                                      ragged_left, ragged_right):
        sm = make_sm(target_seq[x1:x2 + KMER_LENGTH - 1], events[y1:y2])
        plan, inp = fb.prepare_inputs(sm, band, ragged_left=rl, ragged_right=rr, dtype=dtype)
        F = fb.forward(plan, inp)
        B = fb.backward(plan, inp)
        trans, kmer_gap, lik = exp_kernels.threestate_expectations(plan, inp, F, B)
        acc.transitions += np.asarray(trans)
        acc.kmer_gap += np.asarray(kmer_gap)
        acc.likelihood += float(lik)
    return acc


def vanilla_expectations(make_sm: Callable, target_seq: str, events: np.ndarray,
                         anchors: np.ndarray, params: AlignmentParams,
                         *, ragged_left=True, ragged_right=True, dtype=None
                         ) -> VanillaHmm:
    """vanilla E-step -> skip-bin tallies."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float64
    lX = len(target_seq) - KMER_LENGTH + 1
    acc = VanillaHmm.empty()
    for (x1, y1, x2, y2), band, rl, rr in _split_loop(lX, len(events), anchors, params,
                                                      ragged_left, ragged_right):
        sm = make_sm(target_seq[x1:x2 + KMER_LENGTH - 1], events[y1:y2])
        plan, inp = fb.prepare_inputs(sm, band, ragged_left=rl, ragged_right=rr, dtype=dtype)
        F = fb.forward(plan, inp)
        B = fb.backward(plan, inp)
        bins, lik = exp_kernels.vanilla_expectations(plan, inp, F, B)
        acc.bins += np.asarray(bins)
        acc.likelihood += float(lik)
    return acc


def hdp_expectations(make_sm: Callable, target_seq: str, events: np.ndarray,
                     anchors: np.ndarray, params: AlignmentParams, threshold: float,
                     *, ragged_left=True, ragged_right=True, dtype=None) -> HdpHmm:
    """threeStateHdp E-step -> transitions + (kmer, event) assignments."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float64
    lX = len(target_seq) - KMER_LENGTH + 1
    acc = HdpHmm.empty(threshold=threshold)
    for (x1, y1, x2, y2), band, rl, rr in _split_loop(lX, len(events), anchors, params,
                                                      ragged_left, ragged_right):
        sub_target = target_seq[x1:x2 + KMER_LENGTH - 1]
        sm = make_sm(sub_target, events[y1:y2])
        plan, inp = fb.prepare_inputs(sm, band, ragged_left=rl, ragged_right=rr, dtype=dtype)
        F = fb.forward(plan, inp)
        B = fb.backward(plan, inp)
        trans, lik, masks, ranks, means = exp_kernels.hdp_expectations(
            plan, inp, F, B, threshold)
        acc.transitions += np.asarray(trans)
        acc.likelihood += float(lik)
        masks = np.asarray(masks)
        ranks = np.asarray(ranks)
        means = np.asarray(means)
        # Assignments store the literal kmer string at the clamped x position
        # (cell_signal_updateTransAndKmerSkipExpectations2 keeps a char
        # pointer; here the rank is decoded back to the kmer string).
        for m in masks:
            sel = np.argwhere(m)
            for d, k in sel:
                acc.kmer_assignments.append(rank_to_kmer(int(ranks[d, k])))
                acc.event_assignments.append(float(means[d, k]))
    return acc


def discrete_expectations(make_sm: Callable, seq_x: str, seq_y: str,
                          anchors: np.ndarray, params: AlignmentParams,
                          *, ragged_left=False, ragged_right=False, dtype=None,
                          state_number=5) -> DiscreteHmm:
    """fiveState symbol E-step (the cPecanRealign --outputExpectations path)."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float64
    acc = DiscreteHmm.empty(state_number=state_number)
    for (x1, y1, x2, y2), band, rl, rr in _split_loop(len(seq_x), len(seq_y), anchors,
                                                      params, ragged_left, ragged_right):
        sm = make_sm(seq_x[x1:x2], seq_y[y1:y2])
        plan, inp = fb.prepare_inputs(sm, band, ragged_left=rl, ragged_right=rr, dtype=dtype)
        F = fb.forward(plan, inp)
        B = fb.backward(plan, inp)
        trans, emiss, lik = exp_kernels.discrete_expectations(plan, inp, F, B)
        acc.transitions += np.asarray(trans)
        acc.emissions += np.asarray(emiss)
        acc.likelihood += float(lik)
    return acc
