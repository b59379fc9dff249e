"""Constant-shift window engine: the TPU-fast banded forward-backward.

Same semantics as engine/fb.py (validated against it), different layout:

  * the band is covered by a constant-width window whose left edge moves by
    exactly +-1 in xmy per diagonal (core/window.py); cells outside the true
    band are masked to LOG_ZERO, so results equal the reference band's;
  * the DP state is laid out (S, W) with W on the minor (lane) axis; every
    neighbor access is a *static* one-lane shift selected by one scalar per
    diagonal — no gathers anywhere in the scan body;
  * emissions/transition grids are (D+1, C/T, W) tensors computed in bulk.

Forward-neighbor algebra: with s_d = (w0[d] - w0[d-1]) in {-1, +1},
  lower  (d-1, xmy-1): j + (w0[d]-1-w0[d-1])/2 = j + (s_d-1)/2  in {-1, 0}
  upper  (d-1, xmy+1): lower + 1                               in {0, +1}
  middle (d-2, xmy):   j + (w0[d]-w0[d-2])/2                   in {-1, 0, +1}
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LOG_ZERO
from ..core.window import WindowBand
from ..models.state_machines import SRC_LOWER, SRC_MIDDLE, SRC_UPPER, StateMachine
from ..ops.logmath import get_logadd
from .fb import EdgePlan, EnginePlan, _build_plan

NEG_INF = LOG_ZERO


class WindowInputs(NamedTuple):
    """Device arrays for one window-banded problem (jax pytree)."""

    E: jnp.ndarray        # (D+1, C, W) emissions
    TP: jnp.ndarray       # (D+1, T, W) per-cell transition terms
    tp_scalar: jnp.ndarray
    valid: jnp.ndarray    # (D, W) true-band membership
    fL: jnp.ndarray       # (D,) int32 forward lower shift in {-1, 0}
    fM: jnp.ndarray       # (D,) int32 forward middle shift in {-1, 0, +1}
    bL: jnp.ndarray       # (D,) int32 backward diag+1 shift in {0, +1}
    bM: jnp.ndarray       # (D,) int32 backward diag+2 shift in {-1, 0, +1}
    x: jnp.ndarray        # (D, W) int32
    y: jnp.ndarray
    start: jnp.ndarray    # (S,)
    end: jnp.ndarray
    last_real: jnp.ndarray  # (D,) bool
    aux: dict


def _shift1(v, s):
    """out[..., j] = v[..., j+s] for scalar s in {-1, 0, +1}, NEG_INF fill.

    Three static slices + a two-level select — no gather.
    """
    left = jnp.concatenate([v[..., 1:], jnp.full(v.shape[:-1] + (1,), NEG_INF, v.dtype)],
                           axis=-1)
    right = jnp.concatenate([jnp.full(v.shape[:-1] + (1,), NEG_INF, v.dtype), v[..., :-1]],
                            axis=-1)
    return jnp.where(s == 0, v, jnp.where(s > 0, left, right))


def _shift1_fill(v, s, fill):
    left = jnp.concatenate([v[..., 1:], jnp.full(v.shape[:-1] + (1,), fill, v.dtype)],
                           axis=-1)
    right = jnp.concatenate([jnp.full(v.shape[:-1] + (1,), fill, v.dtype), v[..., :-1]],
                            axis=-1)
    return jnp.where(s == 0, v, jnp.where(s > 0, left, right))


def window_grids(wband: WindowBand):
    """(D, W) x/y/valid grids for the window (host-side numpy)."""
    D, W = wband.n_diagonals, wband.W
    d_grid = np.arange(D)[:, None]
    j_grid = np.arange(W)[None, :]
    xmy = wband.w0[:, None] + 2 * j_grid
    x = (d_grid + xmy) // 2
    y = (d_grid - xmy) // 2
    valid = (xmy >= wband.xmyL[:, None]) & (xmy <= wband.xmyR[:, None])
    return x, y, valid


def shift_scalars(w0: np.ndarray):
    """Per-diagonal shift scalars (host-side)."""
    D = len(w0)
    fL = np.zeros(D, dtype=np.int32)
    fM = np.zeros(D, dtype=np.int32)
    bL = np.zeros(D, dtype=np.int32)
    bM = np.zeros(D, dtype=np.int32)
    fL[1:] = (w0[1:] - 1 - w0[:-1]) // 2
    fM[2:] = (w0[2:] - w0[:-2]) // 2
    bL[:-1] = (w0[:-1] + 1 - w0[1:]) // 2
    bM[:-2] = (w0[:-2] - w0[2:]) // 2
    return fL, fM, bL, bM


def prepare_window_inputs(sm: StateMachine, wband: WindowBand, *,
                          ragged_left: bool, ragged_right: bool,
                          dtype=jnp.float64) -> tuple[EnginePlan, WindowInputs]:
    """Host-side preparation against the window layout."""
    D, W = wband.n_diagonals, wband.W
    x, y, valid = window_grids(wband)
    lX, lY = wband.lX, wband.lY
    x_idx = np.clip(x - 1, -1, max(lX - 1, -1))
    y_idx = np.clip(y - 1, -1, max(lY - 1, -1))

    E = np.zeros((D + 1, sm.spec.n_eclasses, W), dtype=np.float64)
    E[:D] = np.moveaxis(sm.emissions(x_idx, y_idx), -1, 1)
    E[:D][~valid[:, None, :].repeat(sm.spec.n_eclasses, 1)] = 0.0

    plan, tp_scalar, cell_sources = _build_plan(sm, "exact")
    T = len(cell_sources)
    TP = np.zeros((D + 1, T, W), dtype=np.float64)
    for t, (kind, arr) in enumerate(cell_sources):
        TP[:D, t, :] = arr[x_idx + 1] if kind == "x" else arr[y_idx + 1]

    fL, fM, bL, bM = shift_scalars(wband.w0)

    aux = {}
    if hasattr(sm, "kmer_ranks"):
        aux["rank"] = jnp.asarray(sm.kmer_ranks[x_idx + 1])
    if hasattr(sm, "skip_bin_idx"):
        aux["bin"] = jnp.asarray(sm.skip_bin_idx[x_idx + 1])
    if hasattr(sm, "symbol_codes"):
        cx, cy = sm.symbol_codes
        aux["sx"] = jnp.asarray(cx[x_idx + 1])
        aux["sy"] = jnp.asarray(cy[y_idx + 1])
    if hasattr(sm, "event_means"):
        ev_means = np.concatenate([[0.0], np.asarray(sm.event_means)])
        aux["mean"] = jnp.asarray(ev_means[y_idx + 1], dtype=dtype)

    inputs = WindowInputs(
        E=jnp.asarray(E, dtype=dtype),
        TP=jnp.asarray(TP, dtype=dtype),
        tp_scalar=jnp.asarray(tp_scalar, dtype=dtype),
        valid=jnp.asarray(valid),
        fL=jnp.asarray(fL), fM=jnp.asarray(fM), bL=jnp.asarray(bL), bM=jnp.asarray(bM),
        x=jnp.asarray(x, dtype=jnp.int32), y=jnp.asarray(y, dtype=jnp.int32),
        start=jnp.asarray(sm.ragged_start if ragged_left else sm.start, dtype=dtype),
        end=jnp.asarray(sm.ragged_end if ragged_right else sm.end, dtype=dtype),
        last_real=jnp.asarray(np.arange(D) == D - 1),
        aux=aux,
    )
    return plan, inputs


def _edge_tp_w(e: EdgePlan, tp_scalar, TP_row):
    """Transition term for one edge on a (.., W)-shaped row; scalar or (W,)."""
    tp = None
    for i in e.scalar_ids:
        tp = tp_scalar[i] if tp is None else tp + tp_scalar[i]
    for i in e.cell_ids:
        col = TP_row[i, :]
        tp = col if tp is None else tp + col
    return 0.0 if tp is None else tp


def forward_impl(plan: EnginePlan, inp: WindowInputs) -> jnp.ndarray:
    """Forward pass -> F (D, S, W)."""
    D, W = inp.valid.shape
    S = plan.n_states
    ladd = get_logadd(plan.logadd)

    f0 = jnp.where(inp.valid[0][None, :], inp.start[:, None], NEG_INF)
    f_init = (f0, jnp.where(jnp.zeros_like(f0, dtype=bool), f0, NEG_INF))

    def body(carry, xs):
        f1, f2 = carry
        E_d, TP_d, valid_d, fL_d, fM_d = xs
        prevL = _shift1(f1, fL_d)
        prevU = _shift1(f1, fL_d + 1)
        prevM = _shift1(f2, fM_d)
        srcs = (prevL, prevM, prevU)
        cur = jnp.full((S, W), NEG_INF, f1.dtype)
        for e in plan.edges:
            val = srcs[e.src][e.frm, :] + E_d[e.eclass, :] + _edge_tp_w(e, inp.tp_scalar, TP_d)
            cur = cur.at[e.to, :].set(ladd(cur[e.to, :], val))
        cur = jnp.where(valid_d[None, :], cur, NEG_INF)
        return (cur, f1), cur

    xs = (inp.E[1:D], inp.TP[1:D], inp.valid[1:], inp.fL[1:], inp.fM[1:])
    _, F_rest = jax.lax.scan(body, f_init, xs)
    return jnp.concatenate([f0[None], F_rest], axis=0)


def backward_impl(plan: EnginePlan, inp: WindowInputs) -> jnp.ndarray:
    """Backward pass -> B (D, S, W); end probs injected at last_real."""
    D, W = inp.valid.shape
    S = plan.n_states
    ladd = get_logadd(plan.logadd)

    b_last = jnp.where(inp.valid[D - 1][None, :] & inp.last_real[D - 1],
                       inp.end[:, None], NEG_INF)
    init = (b_last, jnp.where(jnp.zeros_like(b_last, dtype=bool), b_last, NEG_INF))

    def body(carry, xs):
        b1, b2 = carry
        E1, TP1, E2, TP2, valid_d, bL_d, bM_d, last_d = xs
        cur = jnp.full((S, W), NEG_INF, b1.dtype)
        for e in plan.edges:
            if e.src == SRC_LOWER:
                sh, bN, EN, TPN = bL_d, b1, E1, TP1
            elif e.src == SRC_UPPER:
                sh, bN, EN, TPN = bL_d - 1, b1, E1, TP1
            else:
                sh, bN, EN, TPN = bM_d, b2, E2, TP2
            b_to = _shift1(bN[e.to, :], sh)
            e_to = _shift1_fill(EN[e.eclass, :], sh, 0.0)
            tp = _edge_tp_w(e, inp.tp_scalar, TPN)
            if isinstance(tp, jnp.ndarray) and tp.ndim == 1:
                tp = _shift1_fill(tp, sh, 0.0)
            val = b_to + e_to + tp
            cur = cur.at[e.frm, :].set(ladd(cur[e.frm, :], val))
        cur = jnp.where(last_d, inp.end[:, None], cur)
        cur = jnp.where(valid_d[None, :], cur, NEG_INF)
        return (cur, b1), cur

    xs = (inp.E[1:D][::-1], inp.TP[1:D][::-1], inp.E[2:D + 1][::-1], inp.TP[2:D + 1][::-1],
          inp.valid[:-1][::-1], inp.bL[:D - 1][::-1], inp.bM[:D - 1][::-1],
          inp.last_real[:-1][::-1])
    _, B_rest = jax.lax.scan(body, init, xs)
    return jnp.concatenate([B_rest[::-1], b_last[None]], axis=0)


def diagonal_totals_impl(plan: EnginePlan, inp: WindowInputs, F, B) -> jnp.ndarray:
    """Per-diagonal totals with the match-through-diagonal correction
    (diagonalCalculationTotalProbability, pairwiseAligner.c:736-754) —
    fully vectorized over D with shift-selects, no gathers."""
    D, W = inp.valid.shape
    mask = jnp.where(inp.valid[:, None, :], 0.0, NEG_INF)
    t1 = jax.nn.logsumexp((F + B + mask).reshape(D, -1), axis=1)

    # c[d] lives on diag d+1's grid, fed by F[d-1] with middle shift of d+1.
    # Build shifted F_{d-1} tensor aligned to rows d (for d in 1..D-2).
    fM_next = inp.fM[2:D]             # middle shift at diag d+1, d = 1..D-2
    Fm1 = F[0:D - 2]                  # F[d-1]
    sh = fM_next[:, None, None]
    FmShift = jnp.where(sh == 0, Fm1, jnp.where(
        sh > 0,
        jnp.concatenate([Fm1[..., 1:], jnp.full(Fm1.shape[:-1] + (1,), NEG_INF, F.dtype)], -1),
        jnp.concatenate([jnp.full(Fm1.shape[:-1] + (1,), NEG_INF, F.dtype), Fm1[..., :-1]], -1)))
    E1 = inp.E[2:D]                   # emissions at diag d+1
    TP1 = inp.TP[2:D]
    c = jnp.full((D - 2, plan.n_states, W), NEG_INF, F.dtype)
    for e in plan.edges:
        if e.src != SRC_MIDDLE:
            continue
        if e.cell_ids:
            tp_val = sum((TP1[:, i, :] for i in e.cell_ids),
                         sum((inp.tp_scalar[i] for i in e.scalar_ids), 0.0))
        else:
            tp_val = sum((inp.tp_scalar[i] for i in e.scalar_ids), 0.0)
        val = FmShift[:, e.frm, :] + E1[:, e.eclass, :] + tp_val
        c = c.at[:, e.to, :].set(jnp.logaddexp(c[:, e.to, :], val))
    vmask1 = jnp.where(inp.valid[2:D][:, None, :], 0.0, NEG_INF)
    t2 = jax.nn.logsumexp((c + B[2:D] + vmask1).reshape(D - 2, -1), axis=1)
    totals = t1
    if D > 2:
        totals = totals.at[1:D - 1].set(jnp.logaddexp(t1[1:D - 1], t2))
    return totals


def posterior_match_probs_impl(plan: EnginePlan, inp: WindowInputs, F, B,
                               total_mode: str = "per_diagonal"):
    totals = diagonal_totals_impl(plan, inp, F, B)
    if total_mode == "final":
        last_total = jnp.where(inp.last_real, totals, 0.0).sum()
        totals = jnp.full_like(totals, last_total)
    m = plan.match_state
    p = jnp.exp(F[:, m, :] + B[:, m, :] - totals[:, None])
    ok = inp.valid & (inp.x > 0) & (inp.y > 0)
    p = jnp.where(ok, jnp.minimum(p, 1.0), 0.0)
    return p, totals


forward = jax.jit(forward_impl, static_argnums=(0,))
backward = jax.jit(backward_impl, static_argnums=(0,))
diagonal_totals = jax.jit(diagonal_totals_impl, static_argnums=(0,))
posterior_match_probs = jax.jit(posterior_match_probs_impl, static_argnums=(0, 4))


# ---------------------------------------------------------------------------
# Expectations (window layout)
# ---------------------------------------------------------------------------

def _likelihood(inp: WindowInputs, totals):
    D = inp.valid.shape[0]
    real = inp.valid.any(axis=1) & (jnp.arange(D) >= 1)
    return jnp.where(real, totals, 0.0).sum()


def _shift_tensor(V, sh, fill=NEG_INF):
    """V (D, ..., W) shifted along lanes by per-row scalars sh (D,)."""
    shb = sh.reshape((sh.shape[0],) + (1,) * (V.ndim - 1))
    left = jnp.concatenate([V[..., 1:], jnp.full(V.shape[:-1] + (1,), fill, V.dtype)], -1)
    right = jnp.concatenate([jnp.full(V.shape[:-1] + (1,), fill, V.dtype), V[..., :-1]], -1)
    return jnp.where(shb == 0, V, jnp.where(shb > 0, left, right))


def _edge_posteriors_w(plan: EnginePlan, inp: WindowInputs, F, B, totals):
    """Yield (edge, p_grid (D, W)) masked to valid cells with d >= 1."""
    D, W = inp.valid.shape
    neg = jnp.full((1,) + F.shape[1:], NEG_INF, F.dtype)
    Fm1 = jnp.concatenate([neg, F[:-1]], axis=0)
    Fm2 = jnp.concatenate([neg, neg, F[:-2]], axis=0)
    srcL = _shift_tensor(Fm1, inp.fL)
    srcU = _shift_tensor(Fm1, inp.fL + 1)
    srcM = _shift_tensor(Fm2, inp.fM)
    srcs = (srcL, srcM, srcU)
    mask = inp.valid & (jnp.arange(D) >= 1)[:, None]
    for e in plan.edges:
        if e.cell_ids:
            tp = sum((inp.TP[:D, i, :] for i in e.cell_ids),
                     sum((inp.tp_scalar[i] for i in e.scalar_ids), 0.0))
        else:
            tp = sum((inp.tp_scalar[i] for i in e.scalar_ids), 0.0)
        logp = (srcs[e.src][:, e.frm, :] + B[:, e.to, :]
                + inp.E[:D, e.eclass, :] + tp - totals[:, None])
        yield e, jnp.where(mask, jnp.exp(logp), 0.0)


def threestate_expectations_impl(plan: EnginePlan, inp: WindowInputs, F, B):
    from ..constants import NUM_OF_KMERS
    from ..models.state_machines import SHORT_GAP_X
    totals = diagonal_totals_impl(plan, inp, F, B)
    S = plan.n_states
    trans = jnp.zeros((S, S), F.dtype)
    kmer_gap = jnp.zeros(NUM_OF_KMERS + 2, F.dtype)
    ranks = inp.aux["rank"]
    for e, p in _edge_posteriors_w(plan, inp, F, B, totals):
        trans = trans.at[e.frm, e.to].add(p.sum())
        if e.to == SHORT_GAP_X:
            kmer_gap = kmer_gap.at[ranks.ravel()].add(p.ravel())
    return trans, kmer_gap[:NUM_OF_KMERS], _likelihood(inp, totals)


threestate_expectations = jax.jit(threestate_expectations_impl, static_argnums=(0,))
