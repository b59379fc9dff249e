"""Pallas wavefront kernels vs the window engine, via interpret mode on CPU.

(On-device parity and throughput are exercised by bench.py on the real chip;
interpret mode checks the kernel logic itself.)
"""

import numpy as np
import pytest

from cpecan_signal_tpu.anchor.seed_chain import get_anchor_pairs_for_params
from cpecan_signal_tpu.core.anchors import (filter_to_remove_overlap,
                                            remap_anchor_pairs)
from cpecan_signal_tpu.core.band import band_construct
from cpecan_signal_tpu.core.window import smooth_band
from cpecan_signal_tpu.engine import pallas_pipeline as pp
from cpecan_signal_tpu.engine import window
from cpecan_signal_tpu.io.npread import load_npread
from cpecan_signal_tpu.models.params import AlignmentParams
from cpecan_signal_tpu.models.pore_model import load_pore_model, scale_model
from cpecan_signal_tpu.models.state_machines import make_signal_sm3

REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
MODEL = "/root/reference/models/template_median68pA.model"


def test_pallas_pipeline_matches_window_engine():
    """Real-fixture sub-window (interpret-mode wall clock scales with the
    diagonal count, and the kernel logic is identical on a 300-event window
    of the strand — full strands run on the real chip via bench.py)."""
    import jax.numpy as jnp

    with open(REF) as fh:
        ref_seq = fh.readline().strip()
    npread = load_npread(NPREAD)
    tp = npread.template_params
    pore = scale_model(load_pore_model(MODEL), tp.scale, tp.shift, tp.var,
                       tp.scale_sd, tp.var_sd)
    params = AlignmentParams()
    anchors = filter_to_remove_overlap(remap_anchor_pairs(
        get_anchor_pairs_for_params(ref_seq, npread.twoD_read, params),
        npread.template_event_map))
    events = npread.template_events[:300]
    anchors = anchors[anchors[:, 1] < 280]
    ref_seq = ref_seq[:int(anchors[-1, 0]) + 30]
    band = band_construct(anchors, len(ref_seq) - 5, len(events),
                          params.diagonal_expansion)
    wband = smooth_band(band, width_multiple=128)
    plan, prob = pp.make_sm3_pallas_problem(pore, ref_seq, events, wband)
    D, W = wband.n_diagonals, wband.W

    batch = pp.stack_problems([prob, prob])
    p_k, tot_k, exits_k, gacc_k, stats_k = [
        np.asarray(o) for o in
        pp.run_sm3_pallas(plan, W, batch, Bt=2, interpret=True)]
    trans_k, lik_k = pp.unpack_stats(plan, stats_k)

    sm = make_signal_sm3(pore, ref_seq, events)
    plan_w, winp = window.prepare_window_inputs(sm, wband, ragged_left=True,
                                               ragged_right=True,
                                               dtype=jnp.float32)
    F = window.forward(plan_w, winp)
    B = window.backward(plan_w, winp)
    p_h, tot_h = window.posterior_match_probs(plan_w, winp, F, B)
    trans_h, kmer_h, lik_h = window.threestate_expectations(plan_w, winp, F, B)
    p_h, tot_h = np.asarray(p_h), np.asarray(tot_h)

    assert (p_k[0][:D] >= 0.01).sum() == (p_h >= 0.01).sum()
    mask = (p_h >= 0.01) | (p_k[0][:D] >= 0.01)
    assert np.abs(p_k[0][:D] - p_h)[mask].max() < 2e-3
    fin = np.isfinite(tot_h)
    assert np.abs(tot_k[0][:D] - tot_h)[fin].max() < 0.1
    np.testing.assert_allclose(trans_k[0], np.asarray(trans_h), rtol=5e-4)
    assert lik_k[0] == pytest.approx(float(lik_h), rel=5e-4)
    # both batch rows identical
    np.testing.assert_allclose(p_k[0], p_k[1])

    # per-kmer gapX tallies via the compact exit/window outputs
    kmer_gap = np.asarray(pp.gapx_kmer_tallies(
        batch, W, jnp.asarray(exits_k), jnp.asarray(gacc_k)))[0]
    np.testing.assert_allclose(kmer_gap[:4096], np.asarray(kmer_h), rtol=1e-3,
                               atol=1e-5)


def _synthetic_problem_set(n_problems=4, n_bases=56, seed=0):
    """Small distinct problems with shared (W, Dp, lXp, lYp) pads."""
    import numpy as np

    from cpecan_signal_tpu.constants import MODEL_PARAMS, NUM_OF_KMERS
    from cpecan_signal_tpu.core.kmers import sequence_kmer_ranks
    from cpecan_signal_tpu.models.pore_model import PoreModel
    from cpecan_signal_tpu.models.state_machines import make_signal_sm3

    rng = np.random.default_rng(seed)
    match = np.zeros((NUM_OF_KMERS + 2, MODEL_PARAMS))
    match[:NUM_OF_KMERS, 0] = rng.uniform(40, 90, NUM_OF_KMERS)
    match[:NUM_OF_KMERS, 1] = 1.0
    match[:NUM_OF_KMERS, 2] = rng.uniform(1, 3, NUM_OF_KMERS)
    match[:NUM_OF_KMERS, 3] = 0.3
    match[:NUM_OF_KMERS, 4] = 5.0
    pore = PoreModel(0.9, match, 0.9, match.copy(), np.full(60, 1 / 30))

    raw = []
    for _ in range(n_problems):
        target = "".join(rng.choice(list("ACGT"), n_bases))
        ranks = sequence_kmer_ranks(target)
        n_ev = len(ranks) - int(rng.integers(0, 6))
        events = np.stack([match[ranks[:n_ev], 0] + rng.normal(0, 0.5, n_ev),
                           np.full(n_ev, 2.0), np.full(n_ev, 0.01)], axis=1)
        band = band_construct([], len(ranks), n_ev, 4)
        wb = smooth_band(band, width_multiple=128)
        raw.append((target, events, band, wb))

    Dp = max(wb.n_diagonals for *_x, wb in raw) + 2
    lxp = max(len(t) for t, *_ in raw)
    lyp = max(len(e) for _, e, *_ in raw)
    probs, sms, wbs = [], [], []
    plan = None
    for target, events, band, wb in raw:
        plan, prob = pp.make_sm3_pallas_problem(
            pore, target, events, wb, pad_lx=lxp, pad_ly=lyp, pad_d=Dp)
        probs.append(prob)
        sms.append(make_signal_sm3(pore, target, events))
        wbs.append(wb)
    assert len({wb.W for wb in wbs}) == 1  # stacking needs one window width
    return plan, wbs[0].W, pp.stack_problems(probs), sms, wbs


def test_pallas_em_expectations_batch():
    """sm3_pallas_expectations (production E-step) vs the window engine,
    over a batch of distinct problems (interpret mode)."""
    import jax.numpy as jnp
    import numpy as np

    plan, W, batch, sms, wbs = _synthetic_problem_set()
    trans_k, kmer_k, lik_k = pp.sm3_pallas_expectations(plan, W, batch,
                                                        Bt=2, interpret=True)

    trans_h = np.zeros((3, 3))
    kmer_h = np.zeros(4096)
    lik_h = 0.0
    for sm, wb in zip(sms, wbs):
        plan_w, winp = window.prepare_window_inputs(sm, wb, ragged_left=True,
                                                    ragged_right=True,
                                                    dtype=jnp.float32)
        F = window.forward(plan_w, winp)
        B = window.backward(plan_w, winp)
        t, k, l = window.threestate_expectations(plan_w, winp, F, B)
        trans_h += np.asarray(t)
        kmer_h += np.asarray(k)
        lik_h += float(l)

    np.testing.assert_allclose(np.asarray(trans_k), trans_h, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(kmer_k), kmer_h, rtol=2e-3, atol=1e-4)
    assert float(lik_k) == np.float32(lik_h) or abs(float(lik_k) - lik_h) < 2e-3 * abs(lik_h)


@pytest.mark.parametrize("n_problems,n_bases,Bt", [
    (5, 44, 5),     # Bn == Bt not a multiple of 8 (Mosaic sublane edge)
    (3, 44, 1),     # one-problem blocks
    (2, 150, 2),    # wide band -> W = 256 (lane-dim slice/roll alignment)
])
def test_pallas_shape_edges(n_problems, n_bases, Bt):
    """Bt/W/kd boundary coverage for the kernels' block sizing heuristics
    (the two real-TPU breakages in round 1 — SMEM overflow, Mosaic layout —
    were shape-dependent; this pins the shape handling in interpret mode)."""
    import jax.numpy as jnp
    import numpy as np

    plan, W, batch, sms, wbs = _synthetic_problem_set(
        n_problems=n_problems, n_bases=n_bases, seed=n_bases)
    assert W == (256 if n_bases == 150 else 128)  # noqa: PLR2004
    trans_k, kmer_k, lik_k = pp.sm3_pallas_expectations(plan, W, batch,
                                                        Bt=Bt, interpret=True)
    trans_h = np.zeros((3, 3))
    lik_h = 0.0
    for sm, wb in zip(sms, wbs):
        plan_w, winp = window.prepare_window_inputs(sm, wb, ragged_left=True,
                                                    ragged_right=True,
                                                    dtype=jnp.float32)
        F = window.forward(plan_w, winp)
        B = window.backward(plan_w, winp)
        t, _k, l = window.threestate_expectations(plan_w, winp, F, B)
        trans_h += np.asarray(t)
        lik_h += float(l)
    np.testing.assert_allclose(np.asarray(trans_k), trans_h, rtol=2e-3,
                               atol=1e-4)
    assert abs(float(lik_k) - lik_h) < 2e-3 * abs(lik_h)


def test_pallas_distributed_train_step():
    """distributed_train_step_pallas on the virtual CPU mesh == local
    expectations + M-step (the production train path, VERDICT item 1)."""
    import numpy as np

    from cpecan_signal_tpu.parallel import mesh as pmesh

    plan, W, batch, _sms, _wbs = _synthetic_problem_set(n_problems=4, seed=3)
    mesh = pmesh.make_mesh(4)
    trans_d, kmer_d, lik_d = pmesh.distributed_train_step_pallas(
        plan, W, mesh, batch, interpret=True)

    trans, kmer, lik = pp.sm3_pallas_expectations(plan, W, batch, interpret=True)
    trans_n, kmer_n = pmesh.em_m_step(trans, kmer)
    np.testing.assert_allclose(np.asarray(trans_d), np.asarray(trans_n), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(kmer_d), np.asarray(kmer_n), rtol=1e-5, atol=1e-7)
    assert abs(float(lik_d) - float(lik)) < 1e-3 * max(abs(float(lik)), 1.0)


def test_pallas_paired_half_packing():
    """nh=2 half-packed pipeline (two 64-lane problems per vreg row) must
    reproduce the unpaired pipeline on each half: posteriors, totals, with
    per-half d_last / ragged boundaries exercised."""
    from cpecan_signal_tpu.core.anchors import (anchors_in_window,
                                                get_split_points)

    with open(REF) as fh:
        ref_seq = fh.readline().strip()
    npread = load_npread(NPREAD)
    tp = npread.template_params
    pore = scale_model(load_pore_model(MODEL), tp.scale, tp.shift, tp.var,
                       tp.scale_sd, tp.var_sd)
    params = AlignmentParams()

    # synthetic reads with guide-density anchors (the production shape:
    # most split jobs' true bands fit 64 lanes under expansion 20)
    rng = np.random.default_rng(11)
    cases = []
    flags = [(True, True), (True, False), (False, True), (True, True)]
    sub = ref_seq[:400]
    from cpecan_signal_tpu.core.kmers import sequence_kmer_ranks
    while len(cases) < 4:
        n = int(rng.integers(150, 320))
        lo = int(rng.integers(0, 400))
        target = ref_seq[lo:lo + n]
        ranks = sequence_kmer_ranks(target)
        ev, path, k = [], [], 0
        while k < len(ranks):
            r = pore.match_model[ranks[k]]
            ev.append((r[0] + rng.normal(0, .6), max(r[2], .3), .01))
            path.append((k, len(ev) - 1))
            u = rng.random()
            if u < 0.10:
                continue
            k += 1 + (u > 0.96)
        ev = np.asarray(ev)
        a = filter_to_remove_overlap(np.asarray(path[::20], dtype=np.int64))
        band = band_construct(a, len(ranks), len(ev),
                              params.diagonal_expansion)
        wb = smooth_band(band, width_multiple=64)
        if wb.W != 64 or wb.n_diagonals < 40:
            continue
        rl, rr = flags[len(cases)]
        cases.append((target, ev, wb, rl, rr))

    Dp = max(wb.n_diagonals for *_x, wb, _rl, _rr in cases) + 2
    lxp = max(len(t) for t, *_x in cases)
    lyp = max(len(e) for _t, e, *_x in cases)
    plan = None
    probs = []
    for (t_sub, ev, wb, rl, rr) in cases:
        plan, prob = pp.make_sm3_pallas_problem(
            pore, t_sub, ev, wb, ragged_left=rl, ragged_right=rr,
            pad_lx=lxp, pad_ly=lyp, pad_d=Dp)
        probs.append(prob)
    batch = pp.stack_problems(probs)

    # unpaired reference at HW lanes
    p1, tot1, *_r = [np.asarray(o) for o in
                     pp.run_sm3_pallas(plan, 64, batch, stages=3,
                                       interpret=True)]
    # paired: 2 packed rows
    p2, tot2 = [np.asarray(o) for o in
                pp.run_sm3_pallas_paired(plan, 64, batch, interpret=True)]
    assert p2.shape[0] == 2 and p2.shape[2] == 128
    for pair in range(2):
        for half in range(2):
            i = 2 * pair + half
            D = cases[i][2].n_diagonals
            sl = slice(64 * half, 64 * half + 64)
            np.testing.assert_allclose(p2[pair, :D, sl], p1[i, :D], atol=1e-6)
            fin = np.isfinite(tot1[i, :D]) & (np.abs(tot1[i, :D]) < 1e29)
            np.testing.assert_allclose(tot2[pair, :D, half][fin],
                                       tot1[i, :D][fin], rtol=1e-5)
