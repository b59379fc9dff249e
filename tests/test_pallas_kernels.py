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
    events = npread.template_events
    band = band_construct(anchors, len(ref_seq) - 5, len(events),
                          params.diagonal_expansion)
    wband = smooth_band(band, width_multiple=128)
    plan, prob = pp.make_sm3_pallas_problem(pore, ref_seq, events, wband)
    D, W = wband.n_diagonals, wband.W

    batch = pp.stack_problems([prob, prob])
    p_k, tot_k, pgx_k, stats_k = [np.asarray(o) for o in
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
    np.testing.assert_allclose(trans_k[0], np.asarray(trans_h), rtol=1e-4)
    assert lik_k[0] == pytest.approx(float(lik_h), rel=1e-4)
    # both batch rows identical
    np.testing.assert_allclose(p_k[0], p_k[1])

    # per-kmer gapX tallies via the pgapx rows + host scatter
    ranks = np.asarray(winp.aux["rank"])
    kmer_gap = np.zeros(4098)
    np.add.at(kmer_gap, ranks.ravel(), pgx_k[0][:D].ravel())
    np.testing.assert_allclose(kmer_gap[:4096], np.asarray(kmer_h), rtol=1e-3,
                               atol=1e-5)
