"""HDP subsystem tests: Gibbs recovery of mixtures, topology builders,
serialization round-trip with density equality, alignment ingestion, and the
SM3-HDP alignment path (mirrors tests/nanoporeHdpTests.c and hdpTests.c)."""

import numpy as np
import pytest

from cpecan_signal_tpu.hdp.core import HierarchicalDirichletProcess
from cpecan_signal_tpu.hdp.nanopore import (HDP_TYPES, NanoporeHDP,
                                            build_nanopore_hdp,
                                            deserialize_nhdp, kmer_id,
                                            mle_normal_inverse_gamma,
                                            multiset_number,
                                            word_id_to_multiset_id)

MODEL = "/root/reference/models/template_median68pA.model"


def test_kmer_id_ranks():
    # matches the standard base-4 ranking on ACGT (nanoporeHdpTests.c:21-61)
    assert kmer_id("AAAAAA", "ACGT") == 0
    assert kmer_id("TTTTTT", "ACGT") == 4**6 - 1
    assert kmer_id("ACEGOT", "ACEGOT") == (((((0 * 6 + 1) * 6 + 2) * 6 + 3) * 6 + 4) * 6 + 5)
    from cpecan_signal_tpu.core.kmers import kmer_rank
    for kmer in ("ACGTAC", "GGGGGG", "TACGTA"):
        assert kmer_id(kmer, "ACGT") == kmer_rank(kmer)


def test_multiset_ids():
    n, k = 4, 3
    n_ms = multiset_number(n, k)
    assert n_ms == 20
    ids = {word_id_to_multiset_id(w, n, k) for w in range(n**k)}
    assert ids == set(range(n_ms))
    # permutations share a multiset id
    def wid(word):
        x = 0
        for c in word:
            x = x * n + c
        return x
    assert (word_id_to_multiset_id(wid([0, 1, 2]), n, k)
            == word_id_to_multiset_id(wid([2, 1, 0]), n, k))


def test_mle_nig():
    rng = np.random.default_rng(0)
    mus = rng.normal(60, 5, 4096)
    taus = rng.gamma(4.0, 0.25, 4096)
    mu0, nu, alpha, beta = mle_normal_inverse_gamma(mus, taus)
    assert 55 < mu0 < 65
    assert alpha > 0 and beta > 0 and nu > 0
    # alpha/beta should roughly recover the tau distribution's mean
    assert abs(alpha / beta - taus.mean()) / taus.mean() < 0.2


@pytest.fixture(scope="module")
def small_hdp():
    """2-level HDP with 3 leaves; data from two well-separated Gaussians."""
    rng = np.random.default_rng(1)
    parents = np.array([3, 3, 3, -1])
    h = HierarchicalDirichletProcess(parents, 2, mu=0.0, nu=1.0, alpha=2.0,
                                     beta=2.0, grid_start=-12, grid_stop=12,
                                     grid_length=200, gamma=[1.0, 1.0], seed=7)
    data, ids = [], []
    for leaf, centers in ((0, (-5.0,)), (1, (5.0,)), (2, (-5.0, 5.0))):
        for c in centers:
            data.extend(rng.normal(c, 0.7, 60))
            ids.extend([leaf] * 60)
    h.set_data(np.asarray(data), np.asarray(ids))
    h.gibbs(num_samples=300, burn_in=2000, thinning=20)
    h.finalize()
    return h


def test_gibbs_recovers_mixture(small_hdp):
    h = small_hdp
    grid = h.grid
    d0 = h.densities(0, grid)
    d1 = h.densities(1, grid)
    d2 = h.densities(2, grid)
    # densities integrate to ~1
    for d in (d0, d1, d2):
        assert np.trapezoid(d, grid) == pytest.approx(1.0, abs=0.15)
    # leaf 0 peaks near -5, leaf 1 near +5, leaf 2 bimodal-ish
    assert abs(grid[np.argmax(d0)] + 5) < 1.0
    assert abs(grid[np.argmax(d1)] - 5) < 1.0
    mass_lo = np.trapezoid(d2[grid < 0], grid[grid < 0])
    assert 0.25 < mass_lo < 0.75


def test_unobserved_leaf_climbs_to_parent(small_hdp):
    # querying an... all 3 leaves observed here; density of base == mixture
    h = small_hdp
    d_base = h.densities(3, h.grid)
    assert np.trapezoid(d_base, h.grid) == pytest.approx(1.0, abs=0.15)


def test_nhdp_build_and_roundtrip(tmp_path):
    """Build a small flat NHDP over ACGT, train on synthetic assignments,
    serialize, deserialize, compare densities (test_serialization,
    nanoporeHdpTests.c:273-480)."""
    rng = np.random.default_rng(3)
    nhdp = build_nanopore_hdp("flat", MODEL, alphabet="ACGT", kmer_length=6,
                              grid=(40.0, 90.0, 300), seed=11)
    kmers = ["AAAAAA", "ACGTAC", "TTTTTT"]
    centers = {k: c for k, c in zip(kmers, (50.0, 65.0, 80.0))}
    ks, sigs = [], []
    for k in kmers:
        for _ in range(50):
            ks.append(k)
            sigs.append(float(rng.normal(centers[k], 1.0)))
    assert nhdp.set_assignments(ks, sigs) == 150
    nhdp.gibbs(num_samples=200, burn_in=1500, thinning=20)
    nhdp.finalize()

    for k in kmers:
        dens = nhdp.kmer_density(k, np.linspace(40, 90, 200))
        peak = np.linspace(40, 90, 200)[np.argmax(dens)]
        assert abs(peak - centers[k]) < 2.5, k

    path = str(tmp_path / "test.nhdp")
    nhdp.serialize(path)
    nhdp2 = deserialize_nhdp(path)
    xs = np.linspace(35, 95, 400)
    for k in kmers + ["CCCCCC"]:  # incl. an unobserved kmer (climbs to base)
        np.testing.assert_allclose(nhdp2.kmer_density(k, xs),
                                   nhdp.kmer_density(k, xs), atol=1e-8)


def test_sm3_hdp_alignment(tmp_path):
    """SM3-HDP end-to-end: train a tiny HDP, then align synthetic events with
    the threeStateHdp machine (nanoporeHdpTests.c:495-905 ladder)."""
    rng = np.random.default_rng(4)
    nhdp = build_nanopore_hdp("flat", MODEL, alphabet="ACGT", kmer_length=6,
                              grid=(40.0, 90.0, 300), seed=5)
    from cpecan_signal_tpu.core.kmers import sequence_kmer_ranks, rank_to_kmer
    target = "".join(rng.choice(list("ACGT"), 30))
    ranks = sequence_kmer_ranks(target)
    # train each observed kmer at a distinct level
    levels = 50 + (ranks % 40)
    ks, sigs = [], []
    for r, lv in zip(ranks, levels):
        for _ in range(30):
            ks.append(rank_to_kmer(int(r)))
            sigs.append(float(rng.normal(lv, 0.8)))
    nhdp.set_assignments(ks, sigs)
    nhdp.gibbs(num_samples=150, burn_in=1200, thinning=20)
    nhdp.finalize()

    events = np.stack([levels + rng.normal(0, 0.3, len(ranks)),
                       np.full(len(ranks), 1.0),
                       np.full(len(ranks), 0.01)], axis=1)
    from cpecan_signal_tpu.engine.align import align_events_to_target
    from cpecan_signal_tpu.models.params import AlignmentParams
    from cpecan_signal_tpu.models.state_machines import make_signal_sm3_hdp
    density = nhdp.density_logp_fn()
    pairs = align_events_to_target(
        lambda t, e: make_signal_sm3_hdp(density, t, e),
        target, events, np.zeros((0, 2)), AlignmentParams())
    diag_frac = (pairs.x == pairs.y).mean()
    assert len(pairs.probs) >= len(ranks) * 0.8
    assert diag_frac > 0.8
