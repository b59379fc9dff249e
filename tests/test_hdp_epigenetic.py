"""Production-scale epigenetic HDP path (VERDICT r2 item 6): the expanded
ACEGOT alphabet (6^6 = 46,656 leaf DPs), the 30-90 pA x 1200-point sampling
grid, the --substitute methylation rewrite feeding the build, and the
substituted-target SM3-HDP alignment path.

Gibbs budgets are test-scale (the reference's production budget 10k/100k/100
is exercised/timed by bench.py's Gibbs throughput phase); everything else is
production shape.
"""

import numpy as np
import pytest

from cpecan_signal_tpu.cli.train_models import _prepare_read
from cpecan_signal_tpu.engine.align import align_events_to_target
from cpecan_signal_tpu.hdp.nanopore import (build_nanopore_hdp,
                                            deserialize_nhdp, multiset_number)
from cpecan_signal_tpu.io.fasta import read_first_sequence
from cpecan_signal_tpu.io.npread import load_npread
from cpecan_signal_tpu.models.params import cli_defaults
from cpecan_signal_tpu.models.pore_model import load_pore_model, scale_model
from cpecan_signal_tpu.models.state_machines import (make_signal_sm3,
                                                     make_signal_sm3_hdp)

REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
TMODEL = "/root/reference/models/template_median68pA.model"


@pytest.fixture(scope="module")
def build_tsv(tmp_path_factory):
    """A 15-column-style alignment TSV from a real template-strand
    alignment (the --substitute build input, vanillaAlign.c:638-642 +
    update_nhdp_from_alignment_with_filter)."""
    _, ref_seq = read_first_sequence(REF)
    npread = load_npread(NPREAD)
    params = cli_defaults()
    prep = _prepare_read(ref_seq, npread, params, descale=True)
    target, events, anchors, _sp = prep["t"]
    pore = scale_model(load_pore_model(TMODEL), 1, 0, 1, 1, 1)
    pairs = align_events_to_target(
        lambda t, e: make_signal_sm3(pore, t, e), target, events, anchors,
        params)
    path = tmp_path_factory.mktemp("hdp") / "build_alignment.tsv"
    with open(path, "w") as fh:
        for p, x, y in zip(pairs.probs, pairs.x, pairs.y):
            kmer = target[x:x + 6]
            if len(kmer) < 6:
                continue
            row = ["seq", str(x), kmer, "read", "t", str(y), "0", "0", "0",
                   kmer, "0", "0", str(p / 1e7), f"{events[y, 0]:.6f}", "0"]
            fh.write("\t".join(row) + "\n")
    return str(path), target, events, anchors


def test_acegot_multiset_build_from_substituted_alignment(build_tsv, tmp_path):
    tsv, target, events, anchors = build_tsv
    nhdp = build_nanopore_hdp("multiset", TMODEL)  # ACEGOT, 30-90 x 1200
    assert nhdp.alphabet == "ACEGOT"
    assert nhdp.num_leaves == 6 ** 6 == 46656
    # leaves + multiset middle layer + base DP
    n_mid = multiset_number(6, 6)
    assert nhdp.hdp.num_dps == 46656 + n_mid + 1
    assert len(nhdp.hdp.grid) == 1200
    assert nhdp.hdp.grid[0] == 30.0 and nhdp.hdp.grid[-1] == 90.0

    # --substitute E: C -> E rewrite at build ingestion (the methylation
    # labeling path; scripts/makeBuildAlignments.py groups)
    n = nhdp.update_from_alignment(tsv, strand_filter="t",
                                   substitute={"C": "E"})
    assert n > 400
    nhdp.gibbs(num_samples=40, burn_in=400, thinning=20)
    nhdp.finalize()

    # E-kmers must be queryable with sane densities
    grid = nhdp.hdp.grid
    with open(tsv) as fh:
        kmer = next(fh).split("\t")[9].replace("C", "E")
    d = nhdp.kmer_density(kmer, grid)
    assert np.isfinite(d).all() and (d >= 0).all()
    assert 0.2 < np.trapezoid(np.maximum(d, 0), grid) < 1.8

    # serialize / reload round-trip preserves the distributions
    out = tmp_path / "acegot.nhdp"
    nhdp.serialize(str(out))
    back = deserialize_nhdp(str(out))
    assert back.alphabet == "ACEGOT" and back.num_leaves == 46656
    d2 = back.hdp.densities(back.kmer_id(kmer), grid)
    np.testing.assert_allclose(d2, d, rtol=1e-6, atol=1e-9)


def test_substituted_target_alignment_with_acegot_hdp(build_tsv):
    """The next-round alignment path: vanilla_align --substitute E with an
    ACEGOT HDP — the machine ranks the substituted target over the HDP's
    alphabet (alphabet_density_fn.rank_seq) and aligns."""
    tsv, target, events, anchors = build_tsv
    nhdp = build_nanopore_hdp("multiset", TMODEL,
                              grid=(30.0, 90.0, 300))
    n = nhdp.update_from_alignment(tsv, strand_filter="t",
                                   substitute={"C": "E"})
    assert n > 400
    nhdp.gibbs(num_samples=20, burn_in=200, thinning=10)
    nhdp.finalize()

    density = nhdp.alphabet_density_fn()
    sub_target = target[:220].replace("C", "E")
    assert "E" in sub_target
    sub_events = events[:180]
    sub_anchors = anchors[(anchors[:, 0] < 200) & (anchors[:, 1] < 170)]
    params = cli_defaults()
    pairs = align_events_to_target(
        lambda t, e: make_signal_sm3_hdp(density, t, e),
        sub_target, sub_events, sub_anchors, params)
    assert len(pairs.probs) > 50
    # toy Gibbs budget -> diffuse densities; the functional point is that
    # the expanded-alphabet machine aligns at all with nonzero confidence
    assert pairs.score > 5
