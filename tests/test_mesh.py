"""parallel/mesh distributed paths on the 8-device virtual CPU mesh.

Covers the pieces the dryrun does not: distributed_posteriors and
distributed_em_step must equal the unsharded batch computation on a batch of
DISTINCT problems with uneven real sizes (different d_last / band shapes
under common padding) — the bucketed-batch case the CLIs produce.
"""

import numpy as np

from cpecan_signal_tpu.constants import MODEL_PARAMS, NUM_OF_KMERS
from cpecan_signal_tpu.core.band import band_construct
from cpecan_signal_tpu.core.kmers import sequence_kmer_ranks
from cpecan_signal_tpu.engine import device as dev
from cpecan_signal_tpu.models.pore_model import PoreModel
from cpecan_signal_tpu.parallel import mesh as pmesh


def _batch(n, seed=7):
    """n distinct problems with UNEVEN real sizes under shared padding."""
    rng = np.random.default_rng(seed)
    match = np.zeros((NUM_OF_KMERS + 2, MODEL_PARAMS))
    match[:NUM_OF_KMERS, 0] = rng.uniform(40, 90, NUM_OF_KMERS)
    match[:NUM_OF_KMERS, 1] = 1.0
    match[:NUM_OF_KMERS, 2] = rng.uniform(1, 3, NUM_OF_KMERS)
    match[:NUM_OF_KMERS, 3] = 0.3
    match[:NUM_OF_KMERS, 4] = 5.0
    pore = PoreModel(0.9, match, 0.9, match.copy(), np.full(60, 1 / 30))

    sizes = [34 + 4 * (i % 4) for i in range(n)]
    lx_cap = max(sizes) - 5
    problems = []
    plan = None
    for nb in sizes:
        target = "".join(rng.choice(list("ACGT"), nb))
        ranks = sequence_kmer_ranks(target)
        means = match[ranks, 0] + rng.normal(0, 0.5, len(ranks))
        events = np.stack([means, np.full(len(ranks), 2.0),
                           np.full(len(ranks), 0.01)], axis=1)
        band = band_construct([], len(ranks), len(events), 2)
        plan, prob = dev.make_sm3_problem(
            pore, target, events, band, pad_lx=lx_cap, pad_ly=lx_cap,
            pad_d=2 * lx_cap + 4, dtype=np.float32)
        problems.append(prob)
    W = max(int(p.width.max()) for p in problems)
    batch = dev.stack_problems(problems)
    assert len(set(np.asarray(batch.d_last).tolist())) > 1
    return plan, W, batch


def test_distributed_posteriors_matches_local():
    plan, W, batch = _batch(8)
    mesh = pmesh.make_mesh(4)
    p_d, x_d, y_d, tot_d = pmesh.distributed_posteriors(plan, W, mesh, batch)
    p_l, x_l, y_l, tot_l = dev.sm3_batch_posteriors(plan, W, batch)
    np.testing.assert_allclose(np.asarray(p_d), np.asarray(p_l),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(x_d), np.asarray(x_l))
    fin = np.isfinite(np.asarray(tot_l))
    np.testing.assert_allclose(np.asarray(tot_d)[fin], np.asarray(tot_l)[fin],
                               rtol=1e-6)


def test_distributed_em_step_matches_local():
    plan, W, batch = _batch(8)
    mesh = pmesh.make_mesh(8)
    trans_d, kmer_d, lik_d = pmesh.distributed_em_step(plan, W, mesh, batch)
    trans_l, kmer_l, lik_l = dev.sm3_batch_expectations(plan, W, batch)
    np.testing.assert_allclose(np.asarray(trans_d), np.asarray(trans_l),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(kmer_d), np.asarray(kmer_l),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(float(lik_d), float(lik_l), rtol=1e-5)


def test_distributed_em_step_uneven_device_mix():
    """12 problems over 4 devices (3 per shard) with mixed real sizes."""
    plan, W, batch = _batch(12, seed=11)
    mesh = pmesh.make_mesh(4)
    trans_d, kmer_d, lik_d = pmesh.distributed_em_step(plan, W, mesh, batch)
    trans_l, kmer_l, lik_l = dev.sm3_batch_expectations(plan, W, batch)
    np.testing.assert_allclose(np.asarray(trans_d), np.asarray(trans_l),
                               rtol=1e-6)
    np.testing.assert_allclose(float(lik_d), float(lik_l), rtol=1e-5)
