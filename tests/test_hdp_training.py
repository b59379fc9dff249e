"""threeStateHdp end-to-end EM on the real Zymo fixture.

Mirrors the reference's HDP training loop (trainModels.py:269-330 + the
test_hdpHmm_em ladder, nanoporeHdpTests.c:1092): bootstrap HDPs from a
threeState alignment's assignments, then run EM iterations where each
iteration re-collects assignments, rebuilds both strand HDPs and reloads
densities; the running likelihood must be non-decreasing within the
reference's 5% slack (signalPairwiseTest.c:1693-1694).
"""

import os

import numpy as np
import pytest

from cpecan_signal_tpu.cli.train_models import train
from cpecan_signal_tpu.cli.vanilla_align import align_read
from cpecan_signal_tpu.hdp.nanopore import build_nanopore_hdp
from cpecan_signal_tpu.io.fasta import read_first_sequence
from cpecan_signal_tpu.io.npread import load_npread
from cpecan_signal_tpu.models.params import cli_defaults
from cpecan_signal_tpu.models.pore_model import load_pore_model

REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
TMODEL = "/root/reference/models/template_median68pA.model"
CMODEL = "/root/reference/models/complement_median68pA_pop2.model"

GRID = (30.0, 120.0, 360)
GIBBS = dict(num_samples=150, burn_in=1500, thinning=20)


@pytest.mark.slow
def test_hdp_em_monotone_likelihood(tmp_path):
    # --- bootstrap: threeState alignment TSV -> initial strand HDPs ---
    contig, ref_seq = read_first_sequence(REF)
    npread = load_npread(NPREAD)
    tsv = tmp_path / "align.tsv"
    with open(tsv, "w") as fh:
        res = align_read(ref_seq, contig, npread, load_pore_model(TMODEL),
                         load_pore_model(CMODEL), cli_defaults(),
                         sm_type="threeState", read_label="zymo", out_fh=fh)
    assert res["status"] == "ok"

    hdp_paths = {}
    for strand in ("t", "c"):
        nhdp = build_nanopore_hdp("flat", TMODEL if strand == "t" else CMODEL,
                                  alphabet="ACGT", grid=GRID, seed=3)
        n = nhdp.update_from_alignment(str(tsv), strand_filter=strand)
        assert n > 200, f"too few bootstrap assignments for {strand}: {n}"
        nhdp.gibbs(**GIBBS)
        nhdp.finalize()
        path = str(tmp_path / f"{strand}.nhdp")
        nhdp.serialize(path)
        hdp_paths[strand] = path

    # --- EM iterations with per-iteration HDP rebuild ---
    # assignment_threshold mirrors the reference's p->threshold default (0.01,
    # pairwiseAligner.c:1430) used by hdpHmm_constructEmpty in the reference
    # EM test (nanoporeHdpTests.c:1112).
    out = train(REF, [NPREAD], TMODEL, CMODEL, iterations=3,
                sm_type="threeStateHdp", out_dir=str(tmp_path),
                assignment_threshold=0.01,
                template_hdp=hdp_paths["t"], complement_hdp=hdp_paths["c"],
                gibbs=GIBBS, log=lambda *a: None)
    liks = out["likelihoods"]
    assert len(liks) == 3
    assert np.isfinite(liks).all()
    # non-decreasing within 5% slack, exempting the first transition exactly
    # as the reference does (`if (iter > 1)`, nanoporeHdpTests.c:1183-1185):
    # the first E-step runs against the bootstrap densities, whose data come
    # from a different (threeState) model, so a one-off dip is expected.
    for prev, cur in list(zip(liks, liks[1:]))[1:]:
        assert cur >= prev - 0.05 * abs(prev), liks
    # trained artifacts exist (serialized per iteration)
    assert os.path.exists(tmp_path / "template_trained.nhdp")
    assert os.path.exists(tmp_path / "complement_trained.nhdp")
    assert os.path.exists(tmp_path / "template_trained.hmm")
