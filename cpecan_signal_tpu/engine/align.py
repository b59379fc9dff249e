"""High-level alignment API: anchors -> splits -> banded FB -> aligned pairs.

Mirrors getAlignedPairsUsingAnchors / getPosteriorProbsWithBandingSplitting-
AlignmentsByLargeGaps (pairwiseAligner.c:1356-1484): the alignment problem is
split into independent sub-matrices at large anchor gaps; each split runs a
full banded FB on device; aligned pairs are shifted back to global coordinates.
Splits are the natural unit of batching / sequence sharding on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from ..constants import KMER_LENGTH, PAIR_ALIGNMENT_PROB_1
from ..core.anchors import anchors_in_window, get_split_points
from ..core.band import band_construct
from ..models.params import AlignmentParams
from ..models.state_machines import StateMachine
from . import fb


@dataclass
class AlignedPairs:
    """Posterior-aligned pairs: prob quantized to int(p * 1e7)."""

    probs: np.ndarray  # int64 (n,)
    x: np.ndarray      # int64 (n,) sequence coordinates
    y: np.ndarray      # int64 (n,)

    def as_tuples(self) -> list[tuple[int, int, int]]:
        return list(zip(self.probs.tolist(), self.x.tolist(), self.y.tolist()))

    @property
    def score(self) -> float:
        """Mean match posterior x100 (scoreByPosteriorProbabilityIgnoringGaps,
        vanillaAlign.c:172-177)."""
        if len(self.probs) == 0:
            return 0.0
        return 100.0 * self.probs.sum() / (len(self.probs) * PAIR_ALIGNMENT_PROB_1)


def _extract_pairs(p_grid: np.ndarray, x: np.ndarray, y: np.ndarray,
                   threshold: float, off_x: int, off_y: int):
    mask = p_grid >= threshold
    probs = np.floor(p_grid[mask] * PAIR_ALIGNMENT_PROB_1).astype(np.int64)
    xs = x[mask].astype(np.int64) - 1 + off_x
    ys = y[mask].astype(np.int64) - 1 + off_y
    return probs, xs, ys


@dataclass
class SplitJob:
    """One split sub-problem, ready for (batched) banded FB."""

    sm: StateMachine
    band: object          # core.band.Band
    off_x: int
    off_y: int
    ragged_left: bool
    ragged_right: bool


def collect_split_jobs(
    make_sm: Callable[[str, np.ndarray], StateMachine],
    target_seq: str,
    events: np.ndarray,
    anchors: np.ndarray,
    params: AlignmentParams,
    *,
    ragged_left: bool = True,
    ragged_right: bool = True,
) -> list[SplitJob]:
    """The split/band/state-machine prep of align_events_to_target, without
    running the engine — the unit the device-batched path stacks across
    strands and reads (VERDICT: device-side batching in the CLIs)."""
    lX = len(target_seq) - KMER_LENGTH + 1
    lY = len(events)
    anchors = np.asarray(anchors, dtype=np.int64).reshape(-1, 2)
    splits = get_split_points(anchors, lX, lY, params.split_matrix_bigger_than_this,
                              ragged_left, ragged_right,
                              max_gap_min_dim=params.max_gap_min_dim)
    jobs = []
    for i, (x1, y1, x2, y2) in enumerate(splits):
        sub_target = target_seq[x1: x2 + KMER_LENGTH - 1]
        sub_events = events[y1:y2]
        sub_anchors = anchors_in_window(anchors, x1, y1, x2, y2)
        band = band_construct(sub_anchors, x2 - x1, y2 - y1, params.diagonal_expansion)
        jobs.append(SplitJob(make_sm(sub_target, sub_events), band, x1, y1,
                             ragged_left or i > 0,
                             ragged_right or i < len(splits) - 1))
    return jobs


def align_events_to_target(
    make_sm: Callable[[str, np.ndarray], StateMachine],
    target_seq: str,
    events: np.ndarray,
    anchors: np.ndarray,
    params: AlignmentParams,
    *,
    ragged_left: bool = True,
    ragged_right: bool = True,
    dtype=None,
    total_mode: str = "per_diagonal",
    multi_match: bool = False,
) -> AlignedPairs:
    """Align an event sequence to a nucleotide target with anchor banding.

    make_sm(target_subseq, events_subarray) builds the state machine for one
    split (splits re-slice the raw sequences exactly like sequence_sliceFcn,
    pairwiseAligner.c:1383-1384).  multi_match selects the echelon multi-state
    posterior extraction (diagonalCalculationMultiPosteriorMatchProbs).
    """
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float64
    lX = len(target_seq) - KMER_LENGTH + 1
    lY = len(events)
    anchors = np.asarray(anchors, dtype=np.int64).reshape(-1, 2)
    splits = get_split_points(anchors, lX, lY, params.split_matrix_bigger_than_this,
                              ragged_left, ragged_right,
                              max_gap_min_dim=params.max_gap_min_dim)
    all_probs, all_x, all_y = [], [], []
    for i, (x1, y1, x2, y2) in enumerate(splits):
        sub_target = target_seq[x1: x2 + KMER_LENGTH - 1]
        sub_events = events[y1:y2]
        sub_anchors = anchors_in_window(anchors, x1, y1, x2, y2)
        band = band_construct(sub_anchors, x2 - x1, y2 - y1, params.diagonal_expansion)
        sm = make_sm(sub_target, sub_events)
        plan, inp = fb.prepare_inputs(
            sm, band,
            ragged_left=(ragged_left or i > 0),
            ragged_right=(ragged_right or i < len(splits) - 1),
            dtype=dtype)
        F = fb.forward(plan, inp)
        B = fb.backward(plan, inp)
        if multi_match:
            p_states, _ = fb.posterior_multi_match_probs(plan, inp, F, B)
            probs, xs, ys = fb.extract_multi_pairs(
                np.asarray(p_states), np.asarray(inp.x), np.asarray(inp.y),
                params.threshold)
            xs = xs + x1
            ys = ys + y1
        else:
            p_grid, _totals = fb.posterior_match_probs(plan, inp, F, B, total_mode)
            probs, xs, ys = _extract_pairs(np.asarray(p_grid), np.asarray(inp.x),
                                           np.asarray(inp.y), params.threshold, x1, y1)
        all_probs.append(probs)
        all_x.append(xs)
        all_y.append(ys)
    if not all_probs:
        z = np.zeros(0, dtype=np.int64)
        return AlignedPairs(z, z, z)
    return AlignedPairs(np.concatenate(all_probs), np.concatenate(all_x),
                        np.concatenate(all_y))


def align_sequence_pair(
    make_sm: Callable[[str, str], StateMachine],
    seq_x: str,
    seq_y: str,
    anchors: np.ndarray,
    params: AlignmentParams,
    *,
    ragged_left: bool = False,
    ragged_right: bool = False,
    dtype=None,
    total_mode: str = "per_diagonal",
) -> AlignedPairs:
    """Nucleotide-nucleotide variant (cPecanRealign path): lX/lY are the raw
    sequence lengths; make_sm(sub_x, sub_y) builds a symbol machine."""
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float64
    lX, lY = len(seq_x), len(seq_y)
    anchors = np.asarray(anchors, dtype=np.int64).reshape(-1, 2)
    splits = get_split_points(anchors, lX, lY, params.split_matrix_bigger_than_this,
                              ragged_left, ragged_right,
                              max_gap_min_dim=params.max_gap_min_dim)
    all_probs, all_x, all_y = [], [], []
    for i, (x1, y1, x2, y2) in enumerate(splits):
        sub_x = seq_x[x1:x2]
        sub_y = seq_y[y1:y2]
        sub_anchors = anchors_in_window(anchors, x1, y1, x2, y2)
        band = band_construct(sub_anchors, x2 - x1, y2 - y1, params.diagonal_expansion)
        sm = make_sm(sub_x, sub_y)
        plan, inp = fb.prepare_inputs(
            sm, band,
            ragged_left=(ragged_left or i > 0),
            ragged_right=(ragged_right or i < len(splits) - 1),
            dtype=dtype)
        F = fb.forward(plan, inp)
        B = fb.backward(plan, inp)
        p_grid, _ = fb.posterior_match_probs(plan, inp, F, B, total_mode)
        probs, xs, ys = _extract_pairs(np.asarray(p_grid), np.asarray(inp.x),
                                       np.asarray(inp.y), params.threshold, x1, y1)
        all_probs.append(probs)
        all_x.append(xs)
        all_y.append(ys)
    if not all_probs:
        z = np.zeros(0, dtype=np.int64)
        return AlignedPairs(z, z, z)
    return AlignedPairs(np.concatenate(all_probs), np.concatenate(all_x),
                        np.concatenate(all_y))
