"""Device-batched fiveState EM + batched realign vs the host f64 oracle."""

import numpy as np
import pytest

from cpecan_signal_tpu.core.anchors import filter_to_remove_overlap
from cpecan_signal_tpu.em.discrete_pallas import (
    collect_symbol_split_jobs, discrete_expectations_batched)
from cpecan_signal_tpu.em.expectation_driver import discrete_expectations
from cpecan_signal_tpu.models.params import AlignmentParams
from cpecan_signal_tpu.models.state_machines import (bind_symbol_sequences,
                                                     make_symbol_sm5)


def _random_pair(rng, n):
    bases = "ACGT"
    sx = "".join(rng.choice(list(bases), n))
    sy = []
    for c in sx:
        r = rng.random()
        if r < 0.05:
            continue
        if r < 0.10:
            sy.append(bases[int(rng.integers(4))])
        sy.append(c if rng.random() > 0.1 else bases[int(rng.integers(4))])
    sy = "".join(sy)
    k = min(len(sx), len(sy))
    step = max(k // 10, 1)
    anchors = filter_to_remove_overlap(np.asarray(
        [[i, i] for i in range(0, k - 1, step)], dtype=np.int64))
    return sx, sy, anchors


def make_sm(sx, sy):
    sm = make_symbol_sm5()
    bind_symbol_sequences(sm, sx, sy)
    return sm


def test_discrete_batched_matches_host():
    rng = np.random.default_rng(3)
    params = AlignmentParams()
    cases = [_random_pair(rng, n) for n in (36, 57)]

    jobs = []
    owners = []
    for ci, (sx, sy, anchors) in enumerate(cases):
        js = collect_symbol_split_jobs(make_sm, sx, sy, anchors, params,
                                       ragged_left=False, ragged_right=False)
        jobs.extend(js)
        owners.extend([ci] * len(js))

    results = discrete_expectations_batched(jobs, interpret=True)

    for ci, (sx, sy, anchors) in enumerate(cases):
        acc = discrete_expectations(make_sm, sx, sy, anchors, params,
                                    ragged_left=False, ragged_right=False)
        trans = sum(results[i][0] for i in range(len(jobs)) if owners[i] == ci)
        emiss = sum(results[i][1] for i in range(len(jobs)) if owners[i] == ci)
        lik = sum(results[i][2] for i in range(len(jobs)) if owners[i] == ci)
        np.testing.assert_allclose(trans, acc.transitions, rtol=2e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(emiss, acc.emissions, rtol=2e-3, atol=1e-4)
        assert abs(lik - acc.likelihood) < 1e-2 * max(abs(acc.likelihood), 1)


def test_batched_realign_pairs_match_host():
    from cpecan_signal_tpu.engine.align import align_sequence_pair
    from cpecan_signal_tpu.engine.batch_align import (assemble_pairs,
                                                      batch_align_jobs)

    rng = np.random.default_rng(5)
    params = AlignmentParams()
    sx, sy, anchors = _random_pair(rng, 48)
    jobs = collect_symbol_split_jobs(make_sm, sx, sy, anchors, params,
                                     ragged_left=False, ragged_right=False)
    got = assemble_pairs(batch_align_jobs(jobs, params.threshold,
                                          interpret=True))
    want = align_sequence_pair(make_sm, sx, sy, anchors, params)
    db = {(x, y): p for p, x, y in got.as_tuples()}
    ds = {(x, y): p for p, x, y in want.as_tuples()}
    common = set(db) & set(ds)
    # allow a couple of threshold-boundary pairs (f32 kernels vs f64 scan)
    assert len(common) >= max(len(db), len(ds), 1) - 2
    assert all(abs(db[k] - ds[k]) < 3e-3 * 1e7 for k in common)


def test_em_chunk_tallies_pallas_matches_host(tmp_path):
    """cli.em's pallas chunk E-step vs its host chunk E-step on the same
    records (the engine switch must not change the training signal)."""
    from cpecan_signal_tpu.anchor.seed_chain import get_anchor_pairs
    from cpecan_signal_tpu.cli.em import (_chunk_tallies_host,
                                          _chunk_tallies_pallas)
    from cpecan_signal_tpu.core.amap import pairs_to_cigar_ops
    from cpecan_signal_tpu.em.accumulators import DiscreteHmm
    from cpecan_signal_tpu.io.cigar import CigarRecord

    rng = np.random.default_rng(23)
    recs, seqs = [], {}
    for i in range(2):
        sx = "".join(rng.choice(list("ACGT"), 60))
        sy = "".join((c if rng.random() > 0.08 else rng.choice(list("ACGT")))
                     for c in sx if rng.random() > 0.02)
        seqs[f"x{i}"], seqs[f"y{i}"] = sx, sy
        anchors = get_anchor_pairs(sx, sy, k=8)
        pairs = np.concatenate([np.ones((len(anchors), 1), dtype=np.int64),
                                anchors], axis=1)
        recs.append(CigarRecord(f"x{i}", 0, len(sx), True, f"y{i}", 0,
                                len(sy), True, 0.0,
                                pairs_to_cigar_ops(pairs, len(sx), len(sy))))
    params = AlignmentParams(constraint_diagonal_trim=2)
    hmm = DiscreteHmm.empty(5, 4)
    hmm.randomize(np.random.default_rng(0))
    a = _chunk_tallies_host(recs, seqs, params, hmm)
    b = _chunk_tallies_pallas(recs, seqs, params, hmm)
    np.testing.assert_allclose(b.transitions, a.transitions, rtol=2e-3,
                               atol=1e-4)
    np.testing.assert_allclose(b.emissions, a.emissions, rtol=2e-3, atol=1e-4)
    assert abs(b.likelihood - a.likelihood) < 1e-2 * max(abs(a.likelihood), 1)
