"""CLI integration tests on the Zymo fixture (vanillaAlign / trainModels
equivalents)."""

import os

import numpy as np
import pytest

REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"


def test_vanilla_align_cli(tmp_path):
    from cpecan_signal_tpu.cli.vanilla_align import main
    tsv = str(tmp_path / "posteriors.tsv")
    rc = main(["-r", REF, "-q", NPREAD, "-s", "-u", tsv, "-L", "zymo1"])
    assert rc == 0
    rows = [line.rstrip("\n").split("\t") for line in open(tsv)]
    assert len(rows) > 1000  # both strands aligned
    strands = {r[4] for r in rows}
    assert strands == {"t", "c"}
    for r in rows[:50]:
        assert len(r) == 15
        p = float(r[12])
        assert 0.0 < p <= 1.0
        assert len(r[2]) == 6 and len(r[9]) == 6  # kmers
        assert r[3] == "zymo1"
    # template rows: reference positions within the reference
    tpos = [int(r[1]) for r in rows if r[4] == "t"]
    assert min(tpos) >= 0 and max(tpos) < 897
    # complement rows mirror into the same window
    cpos = [int(r[1]) for r in rows if r[4] == "c"]
    assert min(cpos) >= 0 and max(cpos) < 897
    # re-running into the same file must overwrite, not append
    rc = main(["-r", REF, "-q", NPREAD, "-s", "-u", tsv, "-L", "zymo1"])
    assert rc == 0
    assert sum(1 for _ in open(tsv)) == len(rows)


def test_train_models_monotone(tmp_path):
    from cpecan_signal_tpu.cli.train_models import train
    res = train(REF, [NPREAD],
                "/root/reference/models/template_median68pA.model",
                "/root/reference/models/complement_median68pA_pop2.model",
                iterations=4, sm_type="threeState", out_dir=str(tmp_path),
                log=lambda *a: None)
    liks = res["likelihoods"]
    assert len(liks) == 4
    # iteration 0 runs with the *unnormalized* default kmer gap emissions
    # (log 0.1 per kmer); the first M-step normalizes them, changing the
    # likelihood regime (same as the reference trainModels flow) — monotone
    # growth is guaranteed only from iteration 1 on (cf. signalPairwiseTest.c
    # :1693-1694 which starts from a random *normalized* HMM).
    for a, b in zip(liks[1:], liks[2:]):
        assert a <= b * 0.95  # non-decreasing with 5% slack (likelihoods < 0)
    assert os.path.exists(tmp_path / "template_trained.hmm")
    assert os.path.exists(tmp_path / "complement_trained.hmm")
    # trained transitions are a valid stochastic matrix
    from cpecan_signal_tpu.em.accumulators import ContinuousPairHmm
    hmm = ContinuousPairHmm.load(str(tmp_path / "template_trained.hmm"))
    np.testing.assert_allclose(hmm.transitions.sum(axis=1), 1.0, atol=1e-4)


def test_vanilla_model_cli(tmp_path):
    """vanilla (nanopolish-style) state machine end to end."""
    from cpecan_signal_tpu.cli.vanilla_align import main
    tsv = str(tmp_path / "v.tsv")
    rc = main(["-r", REF, "-q", NPREAD, "-u", tsv, "-L", "zymo1"])
    assert rc == 0
    rows = [line.split("\t") for line in open(tsv)]
    assert len(rows) > 500


def test_train_models_jobs_pool_matches_serial(tmp_path):
    """--jobs worker-pool E-step (the reference's 4-way pool,
    trainModels.py:107-113) produces the same trained HMM as the serial
    host path."""
    from cpecan_signal_tpu.cli.train_models import train
    os.makedirs(tmp_path / "serial")
    os.makedirs(tmp_path / "pool")
    r1 = train(REF, [NPREAD],
               "/root/reference/models/template_median68pA.model",
               "/root/reference/models/complement_median68pA_pop2.model",
               iterations=1, sm_type="threeState",
               out_dir=str(tmp_path / "serial"), log=lambda *a: None)
    r2 = train(REF, [NPREAD],
               "/root/reference/models/template_median68pA.model",
               "/root/reference/models/complement_median68pA_pop2.model",
               iterations=1, sm_type="threeState", jobs=2,
               out_dir=str(tmp_path / "pool"), log=lambda *a: None)
    assert r1["likelihoods"][0] == pytest.approx(r2["likelihoods"][0], rel=1e-12)
    a1 = r1["accumulators"]["t"]
    a2 = r2["accumulators"]["t"]
    np.testing.assert_allclose(a1.transitions, a2.transitions, rtol=1e-12)
    np.testing.assert_allclose(a1.kmer_gap, a2.kmer_gap, rtol=1e-12)
