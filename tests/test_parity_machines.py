"""Differential parity against the reference C engine for the machines
beyond threeState (VERDICT r2 item 4): vanilla, echelon, SM3-HDP (driving
the reference's own prebuilt testTemplate.nhdp fixture), fiveState
nucleotide, vanilla 60-bin expectations, and a characterization of the
reference's default traceback cadence.

Same harness as test_parity_c.py: parity/build/driver compiles the
reference sources in place against the clean-room shim and consumes
pre-sliced inputs (target/events/anchors) produced by this framework, so
both engines see byte-identical inputs.
"""

import os
import subprocess

import numpy as np
import pytest

from cpecan_signal_tpu.cli.train_models import _prepare_read
from cpecan_signal_tpu.cli.vanilla_align import make_sm_factory
from cpecan_signal_tpu.engine.align import (align_events_to_target,
                                            align_sequence_pair)
from cpecan_signal_tpu.io.fasta import read_first_sequence
from cpecan_signal_tpu.io.npread import load_npread
from cpecan_signal_tpu.models.params import cli_defaults
from cpecan_signal_tpu.models.pore_model import load_pore_model, scale_model

from test_parity_c import (DRIVER, PARITY, REF, NPREAD, TMODEL, CMODEL,
                           driver, zymo_prep, _dump_inputs)

NHDP_T = "/root/reference/tests/test_hdp/testTemplate.nhdp"


def _run(driver, mode, tpath, epath, apath, model, sp, out, *,
         ragged=(1, 1), threshold=0.01, expansion=20, min_diags=None,
         machine="threeState", strand="template", aux=None):
    cmd = [driver, mode, str(tpath), str(epath), str(apath), str(model),
           str(sp.scale), str(sp.shift), str(sp.var), str(sp.scale_sd),
           str(sp.var_sd), str(ragged[0]), str(ragged[1]), str(out),
           str(threshold), str(expansion),
           str(min_diags if min_diags is not None else 10_000_000),
           machine, strand]
    if aux is not None:
        cmd.append(str(aux))
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr
    return r.stderr


def _pair_dict(path):
    rows = np.loadtxt(path, dtype=np.int64).reshape(-1, 3)
    return {(int(x), int(y)): p / 1e7 for x, y, p in rows}


def _compare_pairs(ref_pairs, our_pairs, threshold, tol=1.5e-3):
    common = set(ref_pairs) & set(our_pairs)
    for k in set(ref_pairs) - set(our_pairs):
        assert ref_pairs[k] < threshold + 2e-3, \
            f"missing pair {k} ref posterior {ref_pairs[k]}"
    for k in set(our_pairs) - set(ref_pairs):
        assert our_pairs[k] < threshold + 2e-3, \
            f"extra pair {k} posterior {our_pairs[k]}"
    assert len(common) > 0.99 * max(len(ref_pairs), 1)
    deltas = np.array([abs(ref_pairs[k] - our_pairs[k]) for k in common])
    assert deltas.max() < tol, f"max posterior delta {deltas.max()}"


@pytest.mark.parametrize("strand,model_path", [("t", TMODEL), ("c", CMODEL)])
def test_vanilla_align_parity(driver, zymo_prep, tmp_path, strand, model_path):
    """stateMachine3Vanilla posteriors (per-cell skip-bin transitions,
    stateMachine.c:1560-1600) vs the reference binary."""
    target, events, anchors, sp = zymo_prep[strand]
    params = cli_defaults()
    tpath, epath, apath = _dump_inputs(tmp_path, strand, target, events,
                                       anchors)
    out = tmp_path / f"{strand}.vpairs"
    _run(driver, "align", tpath, epath, apath, model_path, sp, out,
         threshold=params.threshold, expansion=params.diagonal_expansion,
         machine="vanilla",
         strand="template" if strand == "t" else "complement")
    ref_pairs = _pair_dict(out)
    assert len(ref_pairs) > 300

    pore = scale_model(load_pore_model(model_path), sp.scale, sp.shift,
                       sp.var, sp.scale_sd, sp.var_sd)
    make_sm = make_sm_factory("vanilla", pore, strand)
    ours = align_events_to_target(make_sm, target, events, anchors, params)
    our_pairs = {(int(x), int(y)): p / 1e7
                 for p, x, y in zip(ours.probs, ours.x, ours.y)}
    _compare_pairs(ref_pairs, our_pairs, params.threshold)


def test_echelon_align_parity(driver, zymo_prep, tmp_path):
    """StateMachineEchelon multi-state posteriors (multi-kmer emissions,
    diagonalCalculationMultiPosteriorMatchProbs,
    pairwiseAligner.c:797-839): one (x+n, y) pair per state above
    threshold, so compare per-(x, y) sorted posterior multisets."""
    from cpecan_signal_tpu.constants import KMER_LENGTH

    target, events, anchors, sp = zymo_prep["t"]
    # a sub-window (events AND target) keeps the 7-state echelon run quick
    # and avoids a giant ragged tail fan-out
    params = cli_defaults()
    # window choice matters: several event windows trip the REFERENCE's own
    # totalProbability monotonicity assert (pairwiseAligner.c:962) under the
    # echelon machine — a fragility of its multi-kmer numerics; [0, 200)
    # with anchors in [5, 190) runs clean
    sub_a = anchors[(anchors[:, 1] >= 5) & (anchors[:, 1] < 190)]
    x_lo = max(int(sub_a[0, 0]) - 10, 0)
    x_hi = int(sub_a[-1, 0]) + 10
    target = target[x_lo:x_hi + KMER_LENGTH]
    events = events[:200]
    anchors = sub_a - np.asarray([[x_lo, 0]])
    tpath, epath, apath = _dump_inputs(tmp_path, "te", target, events,
                                       anchors)
    out = tmp_path / "te.epairs"
    _run(driver, "align", tpath, epath, apath, TMODEL, sp, out,
         threshold=params.threshold, expansion=params.diagonal_expansion,
         machine="echelon")
    rows = np.loadtxt(out, dtype=np.int64).reshape(-1, 3)
    ref = {}
    for x, y, p in rows:
        ref.setdefault((int(x), int(y)), []).append(p / 1e7)
    assert len(ref) > 100

    pore = scale_model(load_pore_model(TMODEL), sp.scale, sp.shift,
                       sp.var, sp.scale_sd, sp.var_sd)
    make_sm = make_sm_factory("echelon", pore, "t")
    ours_raw = align_events_to_target(make_sm, target, events, anchors,
                                      params, multi_match=True)
    ours = {}
    for p, x, y in zip(ours_raw.probs, ours_raw.x, ours_raw.y):
        ours.setdefault((int(x), int(y)), []).append(p / 1e7)

    common = set(ref) & set(ours)
    for k in set(ref) - set(ours):
        assert max(ref[k]) < params.threshold + 2e-3, (k, ref[k])
    for k in set(ours) - set(ref):
        assert max(ours[k]) < params.threshold + 2e-3, (k, ours[k])
    assert len(common) > 0.98 * max(len(ref), 1)
    for k in common:
        a, b = sorted(ref[k]), sorted(ours[k])
        # states on either side of the threshold may differ in count
        for va, vb in zip(a[::-1], b[::-1]):
            assert abs(va - vb) < 2e-3, (k, a, b)


def test_sm3hdp_align_parity(driver, zymo_prep, tmp_path):
    """threeStateHdp posteriors against the reference binary running its own
    prebuilt testTemplate.nhdp fixture.  The driver dumps the fixture's
    spline densities at exactly the (kmer, descaled-mean) pairs this
    problem needs (dumpdens mode), and our machine consumes those values
    verbatim — engine parity isolated from density-table reconstruction.
    Also pins the reference's raw-density eP behavior
    (stateMachine.c:1353-1362: the density itself, not its log, enters the
    log-space recursion)."""
    from cpecan_signal_tpu.core.kmers import (rank_to_kmer,
                                              ranks_with_convention)
    from cpecan_signal_tpu.models.state_machines import make_signal_sm3_hdp

    _, ref_seq = read_first_sequence(REF)
    npread = load_npread(NPREAD)
    params = cli_defaults()
    prep = _prepare_read(ref_seq, npread, params, descale=True)
    target, events, anchors, sp = prep["t"]
    events = events[:300]
    anchors = anchors[anchors[:, 1] < 290]

    tpath, epath, apath = _dump_inputs(tmp_path, "hdp", target, events,
                                       anchors)
    out = tmp_path / "hdp.pairs"
    _run(driver, "align", tpath, epath, apath, TMODEL, sp, out,
         threshold=params.threshold, expansion=params.diagonal_expansion,
         machine="sm3Hdp", aux=NHDP_T)
    ref_pairs = _pair_dict(out)
    assert len(ref_pairs) > 100

    # dump the fixture's densities for this problem's (kmer, mean) pairs
    ranks = ranks_with_convention(target, "clamp")
    uranks = sorted(set(int(r) for r in ranks))
    kmers = [rank_to_kmer(r) for r in uranks]
    means = np.concatenate([[0.0], np.asarray(events)[:, 0]])
    kf, mf, df = (tmp_path / n for n in ("kmers.txt", "means.txt", "dens.tsv"))
    kf.write_text("\n".join(kmers) + "\n")
    mf.write_text("\n".join(f"{m:.17g}" for m in means) + "\n")
    r = subprocess.run([driver, "dumpdens", NHDP_T, str(kf), str(mf),
                        str(df)], capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr
    table = {}
    with open(df) as fh:
        for line, rank in zip(fh, uranks):
            f = line.rstrip("\n").split("\t")
            table[rank] = np.asarray(f[1:], dtype=np.float64)
    dens = np.zeros((max(uranks) + 1, len(means)))
    for rank, row in table.items():
        dens[rank] = row
    order = np.argsort(means, kind="stable")
    sorted_means = means[order]

    def density(rk, ms):
        cols = order[np.searchsorted(sorted_means, ms)]
        return dens[np.minimum(rk, dens.shape[0] - 1), cols]

    make_sm = lambda t, e: make_signal_sm3_hdp(density, t, e)
    ours = align_events_to_target(make_sm, target, events, anchors, params)
    our_pairs = {(int(x), int(y)): p / 1e7
                 for p, x, y in zip(ours.probs, ours.x, ours.y)}
    _compare_pairs(ref_pairs, our_pairs, params.threshold)


def test_fivestate_nucleotide_align_parity(driver, tmp_path):
    """StateMachine5 (default nucleotide model, cPecanRealign.c:523-529)
    posterior pairs vs the reference binary on evolved sequences."""
    from cpecan_signal_tpu.models.state_machines import (bind_symbol_sequences,
                                                         make_symbol_sm5)

    rng = np.random.default_rng(3)
    bases = "ACGT"
    sx = "".join(rng.choice(list(bases), 220))
    sy = []
    for c in sx:
        u = rng.random()
        if u < 0.03:
            continue
        if u < 0.06:
            sy.append(bases[int(rng.integers(4))])
        sy.append(c if rng.random() > 0.08 else bases[int(rng.integers(4))])
    sy = "".join(sy)
    anchors = np.asarray([[50, 50], [150, 150]], dtype=np.int64)

    tpath = tmp_path / "five.target"
    epath = tmp_path / "five.seq2"
    apath = tmp_path / "five.anchors"
    tpath.write_text(sx + "\n")
    epath.write_text(sy + "\n")
    apath.write_text("\n".join(f"{x} {y}" for x, y in anchors) + "\n")

    class _SP:
        scale = shift = var = scale_sd = var_sd = 1.0

    out = tmp_path / "five.pairs"
    _run(driver, "align", tpath, epath, apath, TMODEL, _SP, out,
         threshold=0.01, expansion=20, machine="fiveState")
    ref_pairs = _pair_dict(out)
    assert len(ref_pairs) > 100

    params = cli_defaults()

    def mk(s1, s2):
        sm = make_symbol_sm5()
        bind_symbol_sequences(sm, s1, s2)
        return sm

    ours = align_sequence_pair(mk, sx, sy, anchors, params)
    our_pairs = {(int(x), int(y)): p / 1e7
                 for p, x, y in zip(ours.probs, ours.x, ours.y)}
    _compare_pairs(ref_pairs, our_pairs, params.threshold)


def test_vanilla_expectations_parity(driver, zymo_prep, tmp_path):
    """Vanilla 60-bin alpha/beta expectations (cell_signal_updateBetaAnd-
    AlphaProb, pairwiseAligner.c:478-498) + likelihood vs the reference
    binary's vanillaHmm file."""
    from cpecan_signal_tpu.em.expectation_driver import vanilla_expectations

    target, events, anchors, sp = zymo_prep["t"]
    params = cli_defaults()
    tpath, epath, apath = _dump_inputs(tmp_path, "vexp", target, events,
                                       anchors)
    out = tmp_path / "vexp.hmm"
    stderr = _run(driver, "expect", tpath, epath, apath, TMODEL, sp, out,
                  threshold=params.threshold,
                  expansion=params.diagonal_expansion,
                  machine="vanilla", strand="template")
    ref_lik = float(stderr.split("likelihood")[1].split()[0])
    with open(out) as fh:
        header = fh.readline().split()
        bins_line = np.asarray(fh.readline().split(), dtype=np.float64)
    # vanillaHmm format (continuousHmm.c:477-517): line 2 = 60 bins then
    # the likelihood
    ref_bins = bins_line[:60]
    assert len(bins_line) >= 60

    pore = scale_model(load_pore_model(TMODEL), sp.scale, sp.shift,
                       sp.var, sp.scale_sd, sp.var_sd)
    make_sm = make_sm_factory("vanilla", pore, "t")
    acc = vanilla_expectations(make_sm, target, events, anchors, params)
    np.testing.assert_allclose(acc.bins, ref_bins, rtol=5e-3, atol=1e-4)
    assert abs(acc.likelihood - ref_lik) < 1e-3 * abs(ref_lik)


def test_traceback_cadence_characterization(driver, zymo_prep, tmp_path):
    """Characterize the reference's default cadence-1000 traceback
    (pairwiseAligner.c:906-996) against the single-pass full-FB semantics
    our per-split engine implements: posterior pairs must agree pairwise;
    the likelihood mixes prefix-totals at checkpoint boundaries (the
    documented intentional divergence) — record its magnitude."""
    target, events, anchors, sp = zymo_prep["t"]
    params = cli_defaults()
    tpath, epath, apath = _dump_inputs(tmp_path, "cad", target, events,
                                       anchors)
    out1 = tmp_path / "cad1.pairs"
    out2 = tmp_path / "cad2.pairs"
    _run(driver, "align", tpath, epath, apath, TMODEL, sp, out1,
         threshold=params.threshold, expansion=params.diagonal_expansion,
         min_diags=10_000_000)
    _run(driver, "align", tpath, epath, apath, TMODEL, sp, out2,
         threshold=params.threshold, expansion=params.diagonal_expansion,
         min_diags=1000)   # the reference's default cadence
    p1, p2 = _pair_dict(out1), _pair_dict(out2)
    common = set(p1) & set(p2)
    assert len(common) > 0.995 * max(len(p1), len(p2))
    deltas = np.array([abs(p1[k] - p2[k]) for k in common])
    # checkpointed traceback reproduces full-FB posteriors to ~1e-3
    assert deltas.max() < 2e-3, deltas.max()

    e1 = tmp_path / "cad1.hmm"
    e2 = tmp_path / "cad2.hmm"
    s1 = _run(driver, "expect", tpath, epath, apath, TMODEL, sp, e1,
              threshold=params.threshold,
              expansion=params.diagonal_expansion, min_diags=10_000_000)
    s2 = _run(driver, "expect", tpath, epath, apath, TMODEL, sp, e2,
              threshold=params.threshold,
              expansion=params.diagonal_expansion, min_diags=1000)
    l1 = float(s1.split("likelihood")[1].split()[0])
    l2 = float(s2.split("likelihood")[1].split()[0])
    # the cadence-1000 likelihood sums per-diagonal totals that are
    # PREFIX totals inside intermediate traceback passes; on this fixture
    # the measured divergence is ~10% (-4.83e6 single-pass vs -4.34e6 at
    # cadence 1000) — the documented intentional divergence of our
    # per-split full-FB likelihood from the reference's default cadence
    assert 0.05 * abs(l1) < abs(l1 - l2) < 0.15 * abs(l1), (l1, l2)


def test_full_tsv_parity(driver, tmp_path):
    """The user-facing 15-column TSV (writePosteriorProbs,
    vanillaAlign.c:26-96) against the reference's own vanillaAlign binary
    compiled in place (with -DNDEBUG, as its production build must have
    been: nanopore.c:49 asserts 12 npRead header tokens but every real
    npRead has 13), fed the SAME guide CIGAR on stdin.

    Template strand only: with a forward guide the reference slices the
    complement events as eventMap[end2] - eventMap[start2], which is
    NEGATIVE for the descending complement map
    (makeEventSequenceFromPairwiseAlignment, vanillaAlign.c:301-316) — its
    complement alignment yields 0 pairs (observed: `0(-nan)` in its own
    summary line), a reference defect our rebasing does not share."""
    from cpecan_signal_tpu.cli.vanilla_align import align_read, guide_alignment
    from cpecan_signal_tpu.models.pore_model import load_pore_model

    vanilla_bin = os.path.join(PARITY, "build", "vanillaAlign")
    r = subprocess.run(["make", "-C", PARITY, "build/vanillaAlign"],
                       capture_output=True, text=True)
    assert r.returncode == 0 and os.path.exists(vanilla_bin), r.stderr

    _, ref_seq = read_first_sequence(REF)
    npread = load_npread(NPREAD)
    params = cli_defaults()
    guide = guide_alignment(ref_seq, npread.twoD_read,
                            params.constraint_diagonal_trim)
    assert guide is not None

    ref_out = tmp_path / "ref.tsv"
    r = subprocess.run(
        [vanilla_bin, "-s", "-r", REF, "-q", NPREAD,
         "-T", TMODEL, "-C", CMODEL, "-u", str(ref_out), "-L", "read"],
        input=guide.to_line() + "\n", capture_output=True, text=True,
        timeout=900)
    assert r.returncode == 0, r.stderr

    our_out = tmp_path / "ours.tsv"
    tmodel = load_pore_model(TMODEL)
    cmodel = load_pore_model(CMODEL)
    with open(our_out, "w") as fh:
        res = align_read(ref_seq, guide.contig1, npread, tmodel, cmodel,
                         params, sm_type="threeState", guide=guide,
                         read_label="read", out_fh=fh)
    assert res["status"] == "ok"

    def rows(path):
        out = {}
        with open(path) as fh:
            for line in fh:
                f = line.rstrip("\n").split("\t")
                assert len(f) == 15, f
                if f[4] == "t":
                    out[(f[4], int(f[1]), int(f[5]))] = f
        return out

    ref_rows = rows(ref_out)
    our_rows = rows(our_out)
    assert len(ref_rows) > 800
    common = set(ref_rows) & set(our_rows)
    # membership may differ only at the posterior threshold boundary
    for k in set(ref_rows) - set(our_rows):
        assert float(ref_rows[k][12]) < 0.01 + 2e-3, (k, ref_rows[k][12])
    for k in set(our_rows) - set(ref_rows):
        assert float(our_rows[k][12]) < 0.01 + 2e-3, (k, our_rows[k][12])
    assert len(common) > 0.99 * len(ref_rows)
    # text columns must match exactly; float columns to tight tolerance
    for k in common:
        a, b = ref_rows[k], our_rows[k]
        assert a[0] == b[0] and a[2] == b[2] and a[3] == b[3] \
            and a[9] == b[9], (a, b)
        for col in (6, 7, 8, 10, 11, 13, 14):   # model/event floats
            assert abs(float(a[col]) - float(b[col])) < 5e-4, (col, a, b)
        assert abs(float(a[12]) - float(b[12])) < 1.5e-3, (a, b)  # posterior
