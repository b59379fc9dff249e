"""EM expectation kernels: posterior-weighted transition/emission tallies.

Vectorized equivalent of diagonalCalculation_Expectations + the per-SM
``cellCalculateUpdateExpectations`` callbacks (pairwiseAligner.c:407-511,
841-863): for every diagonal d (1..D-1) and edge (frm -> to),

    p = exp(F[d-src][from-cell, frm] + B[d][cell, to] + eP + tP - total_d)

is accumulated into (a) the (S, S) transition tally, (b) per-kmer gapX tallies
(threeState), (c) skip-bin alpha/beta tallies (vanilla), (d) symbol emission
tallies (discrete fiveState), or (e) HDP (kmer, event) assignment masks.
The likelihood is the sum of per-diagonal totals, replicating the reference's
"once per diagonal" likelihood accumulation quirk (pairwiseAligner.c:852-857).

Everything is computed from the full F/B tensors with bulk gathers — no scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import NUM_OF_KMERS, N_SKIP_BINS
from ..models.state_machines import SRC_LOWER, SRC_MIDDLE, SRC_UPPER
from .fb import EngineInputs, EnginePlan, NEG_INF, _edge_tp, diagonal_totals_impl


def _likelihood(inp: EngineInputs, totals):
    """Sum of per-diagonal totals over real diagonals d >= 1 (the reference's
    per-diagonal likelihood accumulation, pairwiseAligner.c:852-857)."""
    D = inp.valid.shape[0]
    real = inp.valid.any(axis=1) & (jnp.arange(D) >= 1)
    return jnp.where(real, totals, 0.0).sum()


def _shifted_sources(inp: EngineInputs, F):
    """F gathered at each cell's lower/middle/upper *from*-cells ->
    three (D, W, S) tensors (rows 0[/1] are NEG_INF)."""
    D, W = inp.valid.shape
    k = jnp.arange(W)[None, :]
    neg_row = jnp.full((1, W, F.shape[2]), NEG_INF, F.dtype)
    Fm1 = jnp.concatenate([neg_row, F[:-1]], axis=0)
    Fm2 = jnp.concatenate([neg_row, neg_row, F[:-2]], axis=0)

    def gather(Fprev, idx):
        ok = (idx >= 0) & (idx < W)
        safe = jnp.clip(idx, 0, W - 1)
        out = jnp.take_along_axis(Fprev, safe[:, :, None], axis=1)
        return jnp.where(ok[:, :, None], out, NEG_INF)

    kL = k + inp.dL[:, None]
    kU = kL + 1
    kM = k + inp.dM[:, None]
    return gather(Fm1, kL), gather(Fm2, kM), gather(Fm1, kU)


def _edge_posteriors(plan: EnginePlan, inp: EngineInputs, F, B, totals):
    """Yield (edge, p_grid) with p_grid (D, W) masked to valid cells, d >= 1."""
    D, W = inp.valid.shape
    srcL, srcM, srcU = _shifted_sources(inp, F)
    srcs = (srcL, srcM, srcU)
    d_ok = (jnp.arange(D) >= 1)[:, None]
    mask = inp.valid & d_ok
    for e in plan.edges:
        tp = sum((inp.TP[:D, :, i] for i in e.cell_ids),
                 sum((inp.tp_scalar[i] for i in e.scalar_ids), 0.0))
        logp = (srcs[e.src][:, :, e.frm] + B[:, :, e.to]
                + inp.E[:D, :, e.eclass] + tp - totals[:, None])
        p = jnp.where(mask, jnp.exp(logp), 0.0)
        yield e, p


@partial(jax.jit, static_argnums=(0,))
def transition_expectations(plan: EnginePlan, inp: EngineInputs, F, B):
    """(S, S) transition tallies + likelihood (sum of per-diagonal totals)."""
    D = inp.valid.shape[0]
    totals = diagonal_totals_impl(plan, inp, F, B)
    S = plan.n_states
    trans = jnp.zeros((S, S), F.dtype)
    for e, p in _edge_posteriors(plan, inp, F, B, totals):
        trans = trans.at[e.frm, e.to].add(p.sum())
    likelihood = _likelihood(inp, totals)
    return trans, likelihood


@partial(jax.jit, static_argnums=(0,))
def threestate_expectations(plan: EnginePlan, inp: EngineInputs, F, B):
    """threeState signal EM tallies (cell_signal_updateTransAndKmerSkip-
    Expectations, pairwiseAligner.c:426-443): transitions + per-kmer tallies
    for edges entering shortGapX."""
    from ..models.state_machines import SHORT_GAP_X
    totals = diagonal_totals_impl(plan, inp, F, B)
    D = inp.valid.shape[0]
    S = plan.n_states
    trans = jnp.zeros((S, S), F.dtype)
    kmer_gap = jnp.zeros(NUM_OF_KMERS + 2, F.dtype)
    ranks = inp.aux["rank"]
    for e, p in _edge_posteriors(plan, inp, F, B, totals):
        trans = trans.at[e.frm, e.to].add(p.sum())
        if e.to == SHORT_GAP_X:
            kmer_gap = kmer_gap.at[ranks.ravel()].add(p.ravel())
    return trans, kmer_gap[:NUM_OF_KMERS], _likelihood(inp, totals)


@partial(jax.jit, static_argnums=(0,))
def discrete_expectations(plan: EnginePlan, inp: EngineInputs, F, B):
    """fiveState/symbol EM tallies (cell_updateExpectations,
    pairwiseAligner.c:407-424): transitions + per-(to, x, y) emission tallies
    for all edges; gaps involving N excluded."""
    totals = diagonal_totals_impl(plan, inp, F, B)
    D = inp.valid.shape[0]
    S = plan.n_states
    n_sym = 4
    trans = jnp.zeros((S, S), F.dtype)
    emiss = jnp.zeros((S, n_sym, n_sym), F.dtype)
    sx = inp.aux["sx"]
    sy = inp.aux["sy"]
    sym_ok = (sx < n_sym) & (sy < n_sym)
    for e, p in _edge_posteriors(plan, inp, F, B, totals):
        trans = trans.at[e.frm, e.to].add(p.sum())
        pe = jnp.where(sym_ok, p, 0.0)
        flat = (jnp.clip(sx, 0, n_sym - 1) * n_sym + jnp.clip(sy, 0, n_sym - 1)).ravel()
        emiss = emiss.at[e.to].add(
            jnp.zeros(n_sym * n_sym, F.dtype).at[flat].add(pe.ravel()).reshape(n_sym, n_sym))
    return trans, emiss, _likelihood(inp, totals)


@partial(jax.jit, static_argnums=(0,))
def vanilla_expectations(plan: EnginePlan, inp: EngineInputs, F, B):
    """Vanilla skip-bin EM tallies (cell_signal_updateBetaAndAlphaProb,
    pairwiseAligner.c:478-498): beta bins [0,30) from match->shortGapX,
    alpha bins [30,60) from shortGapX->shortGapX."""
    from ..models.state_machines import MATCH, SHORT_GAP_X
    totals = diagonal_totals_impl(plan, inp, F, B)
    D = inp.valid.shape[0]
    bins = jnp.zeros(2 * N_SKIP_BINS, F.dtype)
    bin_idx = inp.aux["bin"]
    for e, p in _edge_posteriors(plan, inp, F, B, totals):
        if e.frm == MATCH and e.to == SHORT_GAP_X:
            bins = bins.at[bin_idx.ravel()].add(p.ravel())
        if e.frm == SHORT_GAP_X and e.to == SHORT_GAP_X:
            bins = bins.at[bin_idx.ravel() + N_SKIP_BINS].add(p.ravel())
    return bins, _likelihood(inp, totals)


@partial(jax.jit, static_argnums=(0, 4))
def hdp_expectations(plan: EnginePlan, inp: EngineInputs, F, B, threshold: float):
    """threeStateHdp EM tallies (cell_signal_updateTransAndKmerSkip-
    Expectations2, pairwiseAligner.c:445-476): transitions + an assignment
    mask per MIDDLE edge into match where p >= threshold.  Returns
    (trans, likelihood, assign_mask (n_mid, D, W), ranks, means)."""
    from ..models.state_machines import MATCH
    totals = diagonal_totals_impl(plan, inp, F, B)
    D = inp.valid.shape[0]
    S = plan.n_states
    trans = jnp.zeros((S, S), F.dtype)
    masks = []
    for e, p in _edge_posteriors(plan, inp, F, B, totals):
        trans = trans.at[e.frm, e.to].add(p.sum())
        if e.src == SRC_MIDDLE and e.to == MATCH:
            masks.append(p >= threshold)
    assign_mask = jnp.stack(masks, axis=0)
    return trans, _likelihood(inp, totals), assign_mask, inp.aux["rank"], inp.aux["mean"]
