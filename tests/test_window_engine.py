"""Window engine (constant-shift layout) vs the reference fb engine."""

import numpy as np
import pytest

from cpecan_signal_tpu.anchor.seed_chain import get_anchor_pairs_for_params
from cpecan_signal_tpu.core.anchors import (filter_to_remove_overlap,
                                            remap_anchor_pairs)
from cpecan_signal_tpu.core.band import band_construct
from cpecan_signal_tpu.core.window import smooth_band
from cpecan_signal_tpu.engine import fb, window
from cpecan_signal_tpu.engine import expectations as ek
from cpecan_signal_tpu.io.npread import load_npread
from cpecan_signal_tpu.models.params import AlignmentParams
from cpecan_signal_tpu.models.pore_model import load_pore_model, scale_model
from cpecan_signal_tpu.models.state_machines import (bind_symbol_sequences,
                                                     make_signal_sm3,
                                                     make_symbol_sm5)

REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
MODEL = "/root/reference/models/template_median68pA.model"


def dense_pairs(p_grid, x, y, thresh=0.01):
    mask = np.asarray(p_grid) >= thresh
    return {(int(a), int(b)): float(pv) for a, b, pv in
            zip(np.asarray(x)[mask], np.asarray(y)[mask], np.asarray(p_grid)[mask])}


@pytest.mark.parametrize("seed", [0, 1])
def test_window_matches_fb_sm5(seed):
    rng = np.random.default_rng(seed)
    sx = "".join(rng.choice(list("ACGT"), 40))
    sy = sx[:20] + "".join(rng.choice(list("ACGT"), 22))
    sm = make_symbol_sm5()
    bind_symbol_sequences(sm, sx, sy)
    anchors = np.stack([np.arange(5, 18), np.arange(5, 18)], axis=1)
    band = band_construct(anchors, len(sx), len(sy), 4)
    plan, inp = fb.prepare_inputs(sm, band, ragged_left=False, ragged_right=True)
    F = fb.forward(plan, inp)
    B = fb.backward(plan, inp)
    p_fb, tot_fb = fb.posterior_match_probs(plan, inp, F, B)

    wband = smooth_band(band)
    plan_w, winp = window.prepare_window_inputs(sm, wband, ragged_left=False,
                                               ragged_right=True)
    assert plan_w == plan
    Fw = window.forward(plan_w, winp)
    Bw = window.backward(plan_w, winp)
    p_w, tot_w = window.posterior_match_probs(plan_w, winp, Fw, Bw)

    np.testing.assert_allclose(np.asarray(tot_w), np.asarray(tot_fb), atol=1e-9)
    assert dense_pairs(p_fb, inp.x, inp.y) == pytest.approx(
        dense_pairs(p_w, winp.x, winp.y), abs=1e-9)


@pytest.fixture(scope="module")
def zymo():
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
    band = band_construct(anchors, len(ref_seq) - 5, len(npread.template_events),
                          params.diagonal_expansion)
    return ref_seq, npread, pore, band


def test_window_matches_fb_sm3_zymo(zymo):
    ref_seq, npread, pore, band = zymo
    events = npread.template_events
    sm = make_signal_sm3(pore, ref_seq, events)
    plan, inp = fb.prepare_inputs(sm, band, ragged_left=True, ragged_right=True)
    F = fb.forward(plan, inp)
    B = fb.backward(plan, inp)
    p_fb, tot_fb = fb.posterior_match_probs(plan, inp, F, B)
    trans_fb, kmer_fb, lik_fb = ek.threestate_expectations(plan, inp, F, B)

    wband = smooth_band(band)
    plan_w, winp = window.prepare_window_inputs(sm, wband, ragged_left=True,
                                               ragged_right=True)
    Fw = window.forward(plan_w, winp)
    Bw = window.backward(plan_w, winp)
    p_w, tot_w = window.posterior_match_probs(plan_w, winp, Fw, Bw)
    trans_w, kmer_w, lik_w = window.threestate_expectations(plan_w, winp, Fw, Bw)

    np.testing.assert_allclose(np.asarray(tot_w), np.asarray(tot_fb), atol=1e-6)
    assert dense_pairs(p_fb, inp.x, inp.y) == pytest.approx(
        dense_pairs(p_w, winp.x, winp.y), abs=1e-8)
    np.testing.assert_allclose(np.asarray(trans_w), np.asarray(trans_fb), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(kmer_w), np.asarray(kmer_fb), rtol=1e-9)
    assert float(lik_w) == pytest.approx(float(lik_fb), rel=1e-12)


