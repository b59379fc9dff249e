"""Randomized differential test of the device-packed fast lanes.

batch_align_jobs routes threeState jobs through engine/readpath's device
packing + on-device pair extraction and symbol jobs through the symbol fast
lane; every job here is checked against the f64 host engine on randomized
shapes (lengths, anchors, ragged ends, scaled/unscaled models) — the
fixture tests pin one real read; this pins the packing/ladder/decode logic
across shapes."""

import numpy as np

from cpecan_signal_tpu.constants import MODEL_PARAMS, NUM_OF_KMERS
from cpecan_signal_tpu.core.anchors import filter_to_remove_overlap
from cpecan_signal_tpu.core.band import band_construct
from cpecan_signal_tpu.core.kmers import sequence_kmer_ranks
from cpecan_signal_tpu.engine.align import (SplitJob, align_events_to_target,
                                            align_sequence_pair)
from cpecan_signal_tpu.engine.batch_align import batch_align_jobs
from cpecan_signal_tpu.models.params import AlignmentParams
from cpecan_signal_tpu.models.pore_model import PoreModel, scale_model
from cpecan_signal_tpu.models.state_machines import (bind_symbol_sequences,
                                                     make_signal_sm3,
                                                     make_symbol_sm5)


def _rand_pore(rng):
    match = np.zeros((NUM_OF_KMERS + 2, MODEL_PARAMS))
    match[:NUM_OF_KMERS, 0] = rng.uniform(40, 90, NUM_OF_KMERS)
    match[:NUM_OF_KMERS, 1] = 1.0
    match[:NUM_OF_KMERS, 2] = rng.uniform(1, 3, NUM_OF_KMERS)
    match[:NUM_OF_KMERS, 3] = 0.3
    match[:NUM_OF_KMERS, 4] = 5.0
    return PoreModel(0.9, match, 0.9, match.copy(), np.full(60, 1 / 30))


def _rand_signal_case(rng, pore, n_bases):
    target = "".join(rng.choice(list("ACGT"), n_bases))
    ranks = sequence_kmer_ranks(target)
    n_ev = len(ranks) + int(rng.integers(-4, 5))
    idx = np.clip(np.arange(n_ev), 0, len(ranks) - 1)
    events = np.stack([pore.match_model[ranks[idx], 0]
                       + rng.normal(0, 0.6, n_ev),
                       np.full(n_ev, 2.0), np.full(n_ev, 0.01)], axis=1)
    k = int(rng.integers(0, 6))
    if k:
        xs = np.sort(rng.choice(len(ranks), k, replace=False))
        ys = np.clip(xs + rng.integers(-2, 3, k), 0, n_ev - 1)
        anchors = filter_to_remove_overlap(
            np.stack([xs, np.sort(ys)], axis=1).astype(np.int64))
    else:
        anchors = np.zeros((0, 2), dtype=np.int64)
    return target, events, anchors


def _pairs_match(got, want, tol_pairs=2):
    db = {(x, y): p for p, x, y in got.as_tuples()}
    ds = {(x, y): p for p, x, y in want.as_tuples()}
    common = set(db) & set(ds)
    assert len(common) >= max(len(db), len(ds), 1) - tol_pairs, \
        (len(db), len(ds), len(common))
    assert all(abs(db[k] - ds[k]) < 3e-3 * 1e7 for k in common)


def test_fast_lane_random_threestate():
    rng = np.random.default_rng(31)
    params = AlignmentParams(diagonal_expansion=6)
    base = _rand_pore(rng)
    jobs, wants = [], []
    for ci in range(6):
        pore = (scale_model(base, 1.1, 2.0, 1.05, 0.9, 1.0)
                if ci % 2 else base)
        n = int(rng.integers(24, 160))
        target, events, anchors = _rand_signal_case(rng, pore, n)
        rl, rr = bool(rng.integers(2)), bool(rng.integers(2))
        sm = make_signal_sm3(pore, target, events)
        band = band_construct(anchors, len(target) - 5, len(events),
                              params.diagonal_expansion)
        jobs.append(SplitJob(sm, band, 0, 0, rl, rr))
        wants.append(align_events_to_target(
            lambda t, e, _p=pore: make_signal_sm3(_p, t, e), target, events,
            anchors, params, ragged_left=rl, ragged_right=rr))
    got = batch_align_jobs(jobs, params.threshold, interpret=True)
    for g, w in zip(got, wants):
        _pairs_match(g, w)


def test_fast_lane_random_symbol():
    rng = np.random.default_rng(37)
    params = AlignmentParams(diagonal_expansion=6)
    jobs, wants = [], []
    for _ci in range(5):
        n = int(rng.integers(24, 140))
        sx = "".join(rng.choice(list("ACGT"), n))
        sy = "".join(c if rng.random() > 0.1 else "G" for c in sx)
        k = int(rng.integers(0, 5))
        anchors = (filter_to_remove_overlap(np.stack(
            [np.sort(rng.choice(min(n, len(sy)) - 1, k, replace=False))] * 2,
            axis=1).astype(np.int64)) if k else np.zeros((0, 2), np.int64))
        rl, rr = bool(rng.integers(2)), bool(rng.integers(2))

        def mk(a, b):
            sm = make_symbol_sm5()
            bind_symbol_sequences(sm, a, b)
            return sm

        sm = mk(sx, sy)
        band = band_construct(anchors, len(sx), len(sy),
                              params.diagonal_expansion)
        jobs.append(SplitJob(sm, band, 0, 0, rl, rr))
        wants.append(align_sequence_pair(mk, sx, sy, anchors, params,
                                         ragged_left=rl, ragged_right=rr))
    got = batch_align_jobs(jobs, params.threshold, interpret=True)
    for g, w in zip(got, wants):
        _pairs_match(g, w)
