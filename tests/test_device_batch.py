"""Device-resident batched pipeline vs the host-prepared reference path."""

import numpy as np
import pytest

from cpecan_signal_tpu.anchor.seed_chain import get_anchor_pairs_for_params
from cpecan_signal_tpu.core.anchors import (filter_to_remove_overlap,
                                            remap_anchor_pairs)
from cpecan_signal_tpu.core.band import band_construct
from cpecan_signal_tpu.engine import device, fb
from cpecan_signal_tpu.io.npread import load_npread
from cpecan_signal_tpu.models.params import AlignmentParams
from cpecan_signal_tpu.models.pore_model import load_pore_model, scale_model
from cpecan_signal_tpu.models.state_machines import make_signal_sm3

REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
MODEL = "/root/reference/models/template_median68pA.model"


@pytest.fixture(scope="module")
def zymo():
    with open(REF) as fh:
        ref_seq = fh.readline().strip()
    npread = load_npread(NPREAD)
    pore = load_pore_model(MODEL)
    tp = npread.template_params
    pore = scale_model(pore, tp.scale, tp.shift, tp.var, tp.scale_sd, tp.var_sd)
    params = AlignmentParams()
    anchors = filter_to_remove_overlap(remap_anchor_pairs(
        get_anchor_pairs_for_params(ref_seq, npread.twoD_read, params),
        npread.template_event_map))
    band = band_construct(anchors, len(ref_seq) - 5, len(npread.template_events),
                          params.diagonal_expansion)
    return ref_seq, npread, pore, band


def test_device_matches_host_f64(zymo):
    import jax.numpy as jnp
    ref_seq, npread, pore, band = zymo
    events = npread.template_events

    # host path
    sm = make_signal_sm3(pore, ref_seq, events)
    plan_h, inp_h = fb.prepare_inputs(sm, band, ragged_left=True, ragged_right=True)
    F = fb.forward(plan_h, inp_h)
    B = fb.backward(plan_h, inp_h)
    p_host, totals_host = fb.posterior_match_probs(plan_h, inp_h, F, B)

    # device path (same dtype), with D/W/len padding exercised
    W = band.max_width + 5
    plan_d, prob = device.make_sm3_problem(
        pore, ref_seq, events, band, pad_d=band.n_diagonals + 17,
        pad_lx=len(ref_seq), pad_ly=len(events) + 9, dtype=np.float64)
    assert plan_d == plan_h
    p_dev, x_dev, y_dev, totals_dev = device.sm3_batch_posteriors(
        plan_d, W, device.stack_problems([prob, prob]))
    p_dev = np.asarray(p_dev)[0]
    D, Wh = np.asarray(inp_h.valid).shape

    # identical posterior grids on the real region
    np.testing.assert_allclose(p_dev[:D, :Wh], np.asarray(p_host), atol=1e-9)
    # padding region contributes nothing
    assert p_dev[D:].sum() == 0
    np.testing.assert_allclose(np.asarray(totals_dev)[0][:D],
                               np.asarray(totals_host), atol=1e-6)


def test_device_f32_close(zymo):
    ref_seq, npread, pore, band = zymo
    events = npread.template_events
    sm = make_signal_sm3(pore, ref_seq, events)
    plan_h, inp_h = fb.prepare_inputs(sm, band, ragged_left=True, ragged_right=True)
    F = fb.forward(plan_h, inp_h)
    B = fb.backward(plan_h, inp_h)
    p_host, _ = fb.posterior_match_probs(plan_h, inp_h, F, B)

    plan_d, prob = device.make_sm3_problem(pore, ref_seq, events, band,
                                           dtype=np.float32)
    p_dev, *_ = device.sm3_batch_posteriors(plan_d, band.max_width,
                                            device.stack_problems([prob]))
    p_dev = np.asarray(p_dev)[0]
    # f32 posteriors should agree to ~1e-3 on pairs above threshold
    mask = (np.asarray(p_host) >= 0.01) | (p_dev >= 0.01)
    diff = np.abs(p_dev - np.asarray(p_host))[mask]
    assert diff.max() < 5e-3


def test_device_batch_expectations(zymo):
    ref_seq, npread, pore, band = zymo
    events = npread.template_events
    sm = make_signal_sm3(pore, ref_seq, events)
    plan_h, inp_h = fb.prepare_inputs(sm, band, ragged_left=True, ragged_right=True)
    F = fb.forward(plan_h, inp_h)
    B = fb.backward(plan_h, inp_h)
    from cpecan_signal_tpu.engine import expectations as ek
    trans_h, kmer_h, lik_h = ek.threestate_expectations(plan_h, inp_h, F, B)

    plan_d, prob = device.make_sm3_problem(pore, ref_seq, events, band,
                                           dtype=np.float64)
    trans_d, kmer_d, lik_d = device.sm3_batch_expectations(
        plan_d, band.max_width, device.stack_problems([prob, prob]))
    np.testing.assert_allclose(np.asarray(trans_d), 2 * np.asarray(trans_h), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(kmer_d), 2 * np.asarray(kmer_h), rtol=1e-9)
    assert float(lik_d) == pytest.approx(2 * float(lik_h), rel=1e-12)
