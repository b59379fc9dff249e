"""Differential parity against the reference C engine, compiled IN PLACE.

parity/Makefile builds the reference sources (/root/reference/impl) against
the clean-room sonLib shim plus a small driver that consumes pre-sliced
inputs — a trimmed target, an event-triple array and a remapped/filtered
anchor list produced by THIS framework — so both engines see byte-identical
inputs.  This is the BASELINE.md correctness target: posterior pairs and EM
expectations diffed directly against the reference binary (oracle roles:
getAlignedPairsUsingAnchors as in tests/signalPairwiseTest.c:1117-1185,
getSignalExpectations as in vanillaAlign.c:318-360).

Tolerances: the reference computes logAdd with a 4-piece-cubic approximation
(pairwiseAligner.c:238-255) while the default engine path uses exact
logaddexp in f64, so posteriors agree to ~1e-4; membership of pairs whose
posterior sits within 2e-3 of the 0.01 threshold may legitimately differ.
"""

import os
import subprocess

import numpy as np
import pytest

from cpecan_signal_tpu.cli.train_models import _prepare_read
from cpecan_signal_tpu.cli.vanilla_align import make_sm_factory
from cpecan_signal_tpu.em.accumulators import ContinuousPairHmm
from cpecan_signal_tpu.em.expectation_driver import sm3_expectations
from cpecan_signal_tpu.engine.align import align_events_to_target
from cpecan_signal_tpu.io.fasta import read_first_sequence
from cpecan_signal_tpu.io.npread import load_npread
from cpecan_signal_tpu.models.params import cli_defaults
from cpecan_signal_tpu.models.pore_model import load_pore_model, scale_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PARITY = os.path.join(REPO, "parity")
DRIVER = os.path.join(PARITY, "build", "driver")
REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
TMODEL = "/root/reference/models/template_median68pA.model"
CMODEL = "/root/reference/models/complement_median68pA_pop2.model"


@pytest.fixture(scope="module")
def driver():
    r = subprocess.run(["make", "-C", PARITY], capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(DRIVER):
        pytest.skip(f"reference parity build failed:\n{r.stdout}\n{r.stderr}")
    return DRIVER


@pytest.fixture(scope="module")
def zymo_prep():
    """Template+complement inputs, pre-sliced exactly as align_read does."""
    _, ref_seq = read_first_sequence(REF)
    npread = load_npread(NPREAD)
    prep = _prepare_read(ref_seq, npread, cli_defaults())
    assert prep is not None
    return prep


def _dump_inputs(tmp_path, tag, target, events, anchors):
    tpath = tmp_path / f"{tag}.target"
    epath = tmp_path / f"{tag}.events"
    apath = tmp_path / f"{tag}.anchors"
    tpath.write_text(target + "\n")
    with open(epath, "w") as fh:
        for m, s, d in np.asarray(events, dtype=np.float64):
            fh.write(f"{m:.17g} {s:.17g} {d:.17g}\n")
    with open(apath, "w") as fh:
        for x, y in np.asarray(anchors, dtype=np.int64):
            fh.write(f"{x} {y}\n")
    return tpath, epath, apath


def _run_driver(driver, mode, tpath, epath, apath, model, sp, out,
                ragged=(1, 1), threshold=0.01, expansion=None,
                min_diags_between_traceback=None):
    cmd = [driver, mode, str(tpath), str(epath), str(apath), model,
           str(sp.scale), str(sp.shift), str(sp.var), str(sp.scale_sd),
           str(sp.var_sd), str(ragged[0]), str(ragged[1]), str(out),
           str(threshold)]
    if expansion is not None:
        cmd.append(str(expansion))
    if min_diags_between_traceback is not None:
        cmd.append(str(min_diags_between_traceback))
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    return r.stderr


@pytest.mark.parametrize("strand,model_path", [("t", TMODEL), ("c", CMODEL)])
def test_aligned_pairs_parity(driver, zymo_prep, tmp_path, strand, model_path):
    target, events, anchors, sp = zymo_prep[strand]
    params = cli_defaults()
    tpath, epath, apath = _dump_inputs(tmp_path, strand, target, events, anchors)
    out = tmp_path / f"{strand}.pairs"
    _run_driver(driver, "align", tpath, epath, apath, model_path, sp, out,
                ragged=(1, 1), threshold=params.threshold,
                expansion=params.diagonal_expansion)
    ref_rows = np.loadtxt(out, dtype=np.int64).reshape(-1, 3)
    ref_pairs = {(int(x), int(y)): p / 1e7 for x, y, p in ref_rows}

    pore = scale_model(load_pore_model(model_path), sp.scale, sp.shift,
                       sp.var, sp.scale_sd, sp.var_sd)
    make_sm = make_sm_factory("threeState", pore, strand, None, None)
    ours = align_events_to_target(make_sm, target, events, anchors, params,
                                  ragged_left=True, ragged_right=True)
    our_pairs = {(int(x), int(y)): p / 1e7
                 for p, x, y in zip(ours.probs, ours.x, ours.y)}

    assert len(ref_pairs) > 400, "reference produced suspiciously few pairs"
    common = set(ref_pairs) & set(our_pairs)
    only_ref = set(ref_pairs) - set(our_pairs)
    only_ours = set(our_pairs) - set(ref_pairs)
    # membership differences only allowed for near-threshold pairs
    for k in only_ref:
        assert ref_pairs[k] < params.threshold + 2e-3, \
            f"missing pair {k} with reference posterior {ref_pairs[k]}"
    for k in only_ours:
        assert our_pairs[k] < params.threshold + 2e-3, \
            f"extra pair {k} with posterior {our_pairs[k]}"
    assert len(common) > 0.99 * len(ref_pairs)
    deltas = np.array([abs(ref_pairs[k] - our_pairs[k]) for k in common])
    assert deltas.max() < 1e-3, f"max posterior delta {deltas.max()}"


@pytest.mark.parametrize("strand,model_path", [("t", TMODEL), ("c", CMODEL)])
def test_expectations_parity(driver, zymo_prep, tmp_path, strand, model_path):
    target, events, anchors, sp = zymo_prep[strand]
    params = cli_defaults()
    tpath, epath, apath = _dump_inputs(tmp_path, strand, target, events, anchors)
    out = tmp_path / f"{strand}.expectations"
    # Single traceback pass (minDiags > matrix) = true full-FB semantics.
    # At the production cadence (1000) the reference's intermediate traceback
    # checkpoints seed the backward matrix with endStateProb at the frontier
    # (pairwiseAligner.c:924-930), so the likelihood it accumulates mixes
    # prefix-totals from each pass — a memory-bound artifact the per-split
    # full-FB engine intentionally does not reproduce (engine/fb.py:1-9).
    _run_driver(driver, "expect", tpath, epath, apath, model_path, sp, out,
                ragged=(1, 1), threshold=params.threshold,
                expansion=params.diagonal_expansion,
                min_diags_between_traceback=10_000_000)
    ref_acc = ContinuousPairHmm.load(str(out))

    pore = scale_model(load_pore_model(model_path), sp.scale, sp.shift,
                       sp.var, sp.scale_sd, sp.var_sd)
    make_sm = make_sm_factory("threeState", pore, strand, None, None)
    acc = ContinuousPairHmm.empty(pseudocount=1e-4)
    acc.add(sm3_expectations(make_sm, target, events, anchors, params))

    # transitions: posterior-weighted tallies, relative tolerance
    np.testing.assert_allclose(acc.transitions, ref_acc.transitions,
                               rtol=5e-3, atol=1e-3)
    # likelihood: sum of per-diagonal totals (diagonalCalculation_Expectations
    # quirk, pairwiseAligner.c:852-857)
    assert abs(acc.likelihood - ref_acc.likelihood) < 1e-4 * abs(ref_acc.likelihood)
    # kmer skip-gap expectations
    np.testing.assert_allclose(acc.kmer_gap, ref_acc.kmer_gap,
                               rtol=5e-3, atol=1e-3)
