"""HDP chain serialization, snapshots, reset, and distribution metrics.

Mirrors the reference's full-serialization test (test_serialization,
nanoporeHdpTests.c:273-480: serialize mid-chain, deserialize, compare, then
CONTINUE sampling both copies), its snapshot diagnostics (hdp.c:2285-2478)
and the distribution-metric memos (hdpTests.c:110-208, hdp.c:2603-2823).
"""

import numpy as np
import pytest

from cpecan_signal_tpu.hdp.core import HierarchicalDirichletProcess
from cpecan_signal_tpu.hdp.metrics import (DistributionMetricMemo,
                                           compare_hdp_distrs,
                                           hellinger_distance, kl_divergence,
                                           l2_distance,
                                           shannon_jensen_distance)
from cpecan_signal_tpu.hdp.nanopore import (build_nanopore_hdp,
                                            deserialize_nhdp)

MODEL = "/root/reference/models/template_median68pA.model"


def _fresh_hdp(seed=7, sample_gamma=False):
    parents = np.array([3, 3, 3, -1])
    kwargs = (dict(gamma_alpha=[1.0, 1.0], gamma_beta=[0.5, 0.5])
              if sample_gamma else dict(gamma=[1.0, 1.0]))
    h = HierarchicalDirichletProcess(parents, 2, mu=0.0, nu=1.0, alpha=2.0,
                                     beta=2.0, grid_start=-12, grid_stop=12,
                                     grid_length=200, seed=seed, **kwargs)
    rng = np.random.default_rng(1)
    data, ids = [], []
    for leaf, centers in ((0, (-5.0,)), (1, (5.0,)), (2, (-5.0, 5.0))):
        for c in centers:
            data.extend(rng.normal(c, 0.7, 60))
            ids.extend([leaf] * 60)
    h.set_data(np.asarray(data), np.asarray(ids))
    return h


@pytest.mark.parametrize("sample_gamma", [False, True])
def test_chain_roundtrip_and_continue(tmp_path, sample_gamma):
    h = _fresh_hdp(sample_gamma=sample_gamma)
    h.gibbs(num_samples=100, burn_in=500, thinning=10)
    path = str(tmp_path / "chain.hdp")
    h.serialize_chain(path)

    h2 = HierarchicalDirichletProcess.deserialize_chain(path)
    # identical tree shape + NIG caches: factor counts per DP, joint density
    np.testing.assert_array_equal(h.factor_counts(), h2.factor_counts())
    assert h2.joint_log_density() == pytest.approx(h.joint_log_density(),
                                                   rel=1e-9)
    assert h2.samples_taken == h.samples_taken
    for d in range(2):
        assert h2.gamma_at(d) == pytest.approx(h.gamma_at(d))
    # accumulators restored exactly
    for dp in range(4):
        np.testing.assert_allclose(h2.posterior_predictive(dp),
                                   h.posterior_predictive(dp), rtol=0, atol=0)

    # both copies continue sampling from the restored state
    for hh in (h, h2):
        hh.gibbs(num_samples=100, burn_in=0, thinning=10)
        hh.finalize()
    for dp in range(3):
        for hh in (h, h2):
            d = hh.densities(dp, hh.grid)
            assert np.isfinite(d).all()
            assert np.trapezoid(d, hh.grid) == pytest.approx(1.0, abs=0.2)
    # statistically equivalent posteriors (same data, same restored chain;
    # only the post-restore sweep order differs)
    d0a = h.densities(0, h.grid)
    d0b = h2.densities(0, h.grid)
    assert hellinger_distance(h.grid, np.maximum(d0a, 0),
                              np.maximum(d0b, 0)) < 0.15


def test_snapshots_record_per_sweep():
    h = _fresh_hdp()
    h.enable_snapshots()
    h.gibbs(num_samples=60, burn_in=300, thinning=10)
    density, factors = h.snapshots
    assert len(density) >= 2 and len(density) == len(factors)
    assert np.isfinite(density).all()
    assert (factors >= 4).all()  # at least one factor per observed dp + base
    assert np.isfinite(h.joint_log_density())
    counts = h.factor_counts()
    assert counts.shape == (4,)
    assert counts.sum() == factors[-1]


def test_reset_data_allows_new_data():
    h = _fresh_hdp()
    h.gibbs(num_samples=50, burn_in=200, thinning=10)
    h.reset_data()
    assert (h.factor_counts() == 0).all()
    rng = np.random.default_rng(9)
    h.set_data(rng.normal(2.0, 0.5, 100), np.zeros(100, dtype=np.int64))
    h.gibbs(num_samples=80, burn_in=400, thinning=10)
    h.finalize()
    d = h.densities(0, h.grid)
    assert abs(h.grid[np.argmax(d)] - 2.0) < 1.0


def test_metric_functions_basic():
    grid = np.linspace(-10, 10, 400)
    p = np.exp(-0.5 * (grid + 2) ** 2) / np.sqrt(2 * np.pi)
    q = np.exp(-0.5 * (grid - 2) ** 2) / np.sqrt(2 * np.pi)
    assert kl_divergence(grid, p, p) == pytest.approx(0.0, abs=1e-12)
    assert l2_distance(grid, p, p) == pytest.approx(0.0, abs=1e-12)
    assert hellinger_distance(grid, p, p) == pytest.approx(0.0, abs=1e-6)
    assert shannon_jensen_distance(grid, p, p) == pytest.approx(0.0, abs=1e-6)
    assert kl_divergence(grid, p, q) > 1.0
    assert 0.0 < hellinger_distance(grid, p, q) <= 1.0
    assert shannon_jensen_distance(grid, p, q) > 0.3
    assert l2_distance(grid, p, q) > 0.1


def test_metric_memo_on_hdp():
    h = _fresh_hdp()
    h.gibbs(num_samples=150, burn_in=800, thinning=10)
    h.finalize()
    memo = DistributionMetricMemo(h, "shannon_jensen")
    d01 = memo.distance(0, 1)   # -5 vs +5: far
    d02 = memo.distance(0, 2)   # -5 vs bimodal: closer
    assert d01 > d02 > 0
    assert memo.distance(1, 0) == d01  # symmetric + memoized
    assert memo.distance(2, 2) == 0.0
    # cross-HDP comparison of the same dp ~ 0
    assert compare_hdp_distrs(h, 0, h, 0, "l2") == pytest.approx(0.0, abs=1e-12)


def test_nhdp_chain_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    nhdp = build_nanopore_hdp("flat", MODEL, alphabet="ACGT", kmer_length=6,
                              grid=(40.0, 90.0, 300), seed=11)
    kmers = ["".join(rng.choice(list("ACGT"), 6)) for _ in range(40)]
    ks, evs = [], []
    for km in kmers:
        for _ in range(8):
            ks.append(km)
            evs.append(rng.normal(60.0 + (hash(km) % 17), 1.0))
    nhdp.set_assignments(ks, evs)
    nhdp.gibbs(num_samples=40, burn_in=200, thinning=10)
    path = str(tmp_path / "t.nhdpchain")
    nhdp.serialize_chain(path)

    back = deserialize_nhdp(path)  # auto-detects the chain format
    assert back.alphabet == "ACGT" and back.topology == "flat"
    np.testing.assert_array_equal(back.hdp.factor_counts(),
                                  nhdp.hdp.factor_counts())
    # continue sampling the restored chain, then query densities
    back.gibbs(num_samples=40, burn_in=0, thinning=10)
    back.finalize()
    d = back.kmer_density(kmers[0], np.linspace(45, 85, 50))
    assert np.isfinite(d).all() and d.max() > 0
