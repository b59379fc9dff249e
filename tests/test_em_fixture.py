"""EM integration test on the real Zymo fixture.

Replicates test_continuousPairHmm_em (tests/signalPairwiseTest.c:1604-1714):
starting from a random threeState HMM, 10 EM iterations on the 950-base 2D
read vs the Zymo reference must have non-decreasing likelihood (5% slack).
Anchors come from the built-in seed-chain anchorer (the lastz equivalent),
remapped through the template event map.
"""

import numpy as np
import pytest

from cpecan_signal_tpu.anchor.seed_chain import get_anchor_pairs_for_params
from cpecan_signal_tpu.constants import KMER_LENGTH
from cpecan_signal_tpu.core.anchors import (filter_to_remove_overlap,
                                            remap_anchor_pairs)
from cpecan_signal_tpu.em.accumulators import ContinuousPairHmm
from cpecan_signal_tpu.em.expectation_driver import sm3_expectations
from cpecan_signal_tpu.io.npread import load_npread
from cpecan_signal_tpu.models.params import AlignmentParams
from cpecan_signal_tpu.models.pore_model import load_pore_model, scale_model
from cpecan_signal_tpu.models.state_machines import make_signal_sm3

REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
MODEL = "/root/reference/models/template_median68pA.model"


@pytest.fixture(scope="module")
def fixture_data():
    with open(REF) as fh:
        ref_seq = fh.readline().strip()
    npread = load_npread(NPREAD)
    pore = load_pore_model(MODEL)
    tp = npread.template_params
    scaled = scale_model(pore, tp.scale, tp.shift, tp.var, tp.scale_sd, tp.var_sd)
    return ref_seq, npread, scaled


def test_npread_loads(fixture_data):
    ref_seq, npread, _ = fixture_data
    assert npread.read_length == 950
    assert npread.template_events.shape == (799, 3)
    assert npread.complement_events.shape == (670, 3)
    assert len(npread.twoD_read) == 950
    assert len(ref_seq) == 897


def test_anchors_from_seed_chain(fixture_data):
    ref_seq, npread, _ = fixture_data
    params = AlignmentParams()
    anchors = get_anchor_pairs_for_params(ref_seq, npread.twoD_read, params)
    assert len(anchors) > 100  # a real overlapping read should anchor densely
    remapped = filter_to_remove_overlap(remap_anchor_pairs(
        anchors, npread.template_event_map))
    assert len(remapped) > 50
    # monotone in both coordinates
    assert (np.diff(remapped[:, 0]) > 0).all()
    assert (np.diff(remapped[:, 1]) > 0).all()


def test_em_monotone_likelihood(fixture_data):
    ref_seq, npread, pore = fixture_data
    params = AlignmentParams()
    anchors = get_anchor_pairs_for_params(ref_seq, npread.twoD_read, params)
    remapped = filter_to_remove_overlap(remap_anchor_pairs(
        anchors, npread.template_event_map))
    events = npread.template_events

    rng = np.random.default_rng(0)
    hmm = ContinuousPairHmm.empty()
    hmm.randomize(rng)
    trans_params, kmer_gap_logp = hmm.to_sm3_params()

    p_likelihood = -np.inf
    likelihoods = []
    for it in range(10):
        def make_sm(sub_target, sub_events, _t=trans_params, _k=kmer_gap_logp):
            return make_signal_sm3(pore, sub_target, sub_events,
                                   transitions=_t, kmer_gap_probs=_k)

        acc = sm3_expectations(make_sm, ref_seq, events, remapped, params,
                               ragged_left=False, ragged_right=False)
        acc.normalize()
        likelihoods.append(acc.likelihood)
        assert p_likelihood <= acc.likelihood * 0.95, \
            f"iteration {it}: likelihood decreased {p_likelihood} -> {acc.likelihood}"
        p_likelihood = acc.likelihood
        trans_params, kmer_gap_logp = acc.to_sm3_params()

    # EM should improve substantially from the random start
    assert likelihoods[-1] > likelihoods[0]
