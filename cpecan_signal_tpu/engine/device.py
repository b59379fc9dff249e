"""Device-resident batched alignment pipeline (the TPU throughput path).

The correctness path (fb.prepare_inputs) computes emissions on host in f64.
This module moves the whole per-problem pipeline into one jitted graph:
band-cell emissions are computed on device from compact per-problem arrays
(k-mer ranks, event params, model tables) via gathers + Gaussian log-pdfs —
the inner-inner loop of the reference (emissions_signal_strawManGetKmerEvent-
MatchProb, stateMachine.c:595-629) becomes bulk VPU work — and a batch of
problems (reads x strands x splits, bucketed to a common (D, W)) runs under
vmap, turning the wavefront recursion into (B*W, S)-wide vector steps.

Batch problems are padded: W to the bucket band width, D via trailing invalid
diagonals (EngineInputs.last_real marks the real end per problem).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import KMER_LENGTH, LOG_ZERO
from ..core.band import Band, band_construct
from ..models.pore_model import PoreModel
from ..models.state_machines import SM3_SPEC, make_signal_sm3
from . import fb

_LOG_INV_SQRT_2PI = -0.91893853320467267


class SM3Problem(NamedTuple):
    """One banded threeState alignment problem, device-layout.

    Shapes (per problem; batch adds a leading axis via vmap):
      ranks:      (lXp + 1,) int32   k-mer rank per DP position (slot 0 = x=-1)
      ev:         (lYp + 1, 2)       event (mean, noise); row 0 = y=-1
      match_table:(4098, 5)          scaled match model
      y_table:    (4098, 5)          extra-event (Y) model
      gapx:       (4098,)            log per-kmer gapX emission
      tp_scalar:  (n_keys,)          transition log-probs (engine plan order)
      start,end:  (3,)
      xmyL:       (Dp,) int32
      width:      (Dp,) int32        0 on padded diagonals
      d_last:     () int32           index of last real diagonal
    """

    ranks: jnp.ndarray
    ev: jnp.ndarray
    match_table: jnp.ndarray
    y_table: jnp.ndarray
    gapx: jnp.ndarray
    tp_scalar: jnp.ndarray
    start: jnp.ndarray
    end: jnp.ndarray
    xmyL: jnp.ndarray
    width: jnp.ndarray
    d_last: jnp.ndarray


def _log_gauss(x, mu, sigma):
    ok = sigma != 0.0
    safe = jnp.where(ok, sigma, 1.0)
    a = (x - mu) / safe
    return jnp.where(ok, _LOG_INV_SQRT_2PI - jnp.log(safe) - 0.5 * a * a, LOG_ZERO)


def build_engine_inputs_sm3(prob: SM3Problem, W: int) -> fb.EngineInputs:
    """In-jit construction of EngineInputs from compact problem arrays."""
    Dp = prob.xmyL.shape[0]
    dtype = prob.ev.dtype
    d_grid = jnp.arange(Dp)[:, None]
    k_grid = jnp.arange(W)[None, :]
    xmy = prob.xmyL[:, None] + 2 * k_grid
    x = (d_grid + xmy) // 2
    y = (d_grid - xmy) // 2
    valid = k_grid < prob.width[:, None]

    lx = prob.ranks.shape[0] - 1
    ly = prob.ev.shape[0] - 1
    xi = jnp.clip(x, 0, lx)          # == x_idx + 1 clamped into ranks
    yi = jnp.clip(y, 0, ly)
    r = prob.ranks[xi]
    mean = prob.ev[yi, 0]
    noise = prob.ev[yi, 1]

    mp = prob.match_table[r]          # (Dp, W, 5)
    yp = prob.y_table[r]
    e_match = (_log_gauss(mean, mp[..., 0], mp[..., 1])
               + _log_gauss(noise, mp[..., 2], mp[..., 3]))
    e_y = (_log_gauss(mean, yp[..., 0], yp[..., 1])
           + _log_gauss(noise, yp[..., 2], yp[..., 3]))
    e_gapx = prob.gapx[r]
    E = jnp.stack([e_gapx, e_match, e_y], axis=-1)
    E = jnp.where(valid[:, :, None], E, 0.0)
    E = jnp.concatenate([E, jnp.zeros((1, W, 3), dtype)], axis=0)

    xmyL = prob.xmyL
    dL = jnp.zeros(Dp, jnp.int32).at[1:].set((xmyL[1:] - 1 - xmyL[:-1]) // 2)
    dM = jnp.zeros(Dp, jnp.int32).at[2:].set((xmyL[2:] - xmyL[:-2]) // 2)
    uS = jnp.zeros(Dp, jnp.int32).at[:-1].set((xmyL[:-1] + 1 - xmyL[1:]) // 2)
    mS = jnp.zeros(Dp, jnp.int32).at[:-2].set((xmyL[:-2] - xmyL[2:]) // 2)

    return fb.EngineInputs(
        E=E,
        TP=jnp.zeros((Dp + 1, W, 0), dtype),
        tp_scalar=prob.tp_scalar,
        valid=valid,
        dL=dL, dM=dM, uS=uS, mS=mS,
        x=x.astype(jnp.int32), y=y.astype(jnp.int32),
        start=prob.start, end=prob.end,
        last_real=jnp.arange(Dp) == prob.d_last,
        aux={"rank": r},
    )


@partial(jax.jit, static_argnums=(0, 1))
def sm3_batch_posteriors(plan: fb.EnginePlan, W: int, probs: SM3Problem):
    """Batched banded FB + posterior match probs -> (B, Dp, W) probabilities
    plus (x, y) coordinate grids and per-diagonal totals."""

    def one(prob: SM3Problem):
        inp = build_engine_inputs_sm3(prob, W)
        F = fb.forward_impl(plan, inp)
        B = fb.backward_impl(plan, inp)
        p, totals = fb.posterior_match_probs_impl(plan, inp, F, B)
        return p, inp.x, inp.y, totals

    return jax.vmap(one)(probs)


@partial(jax.jit, static_argnums=(0, 1))
def sm3_batch_expectations(plan: fb.EnginePlan, W: int, probs: SM3Problem):
    """Batched threeState E-step -> summed (3,3) transitions, (4096,) kmer-gap
    tallies and total likelihood across the batch (the on-device reduce that
    replaces per-read expectation files, SURVEY §2.3 P4)."""
    from . import expectations as exp_kernels

    def one(prob: SM3Problem):
        inp = build_engine_inputs_sm3(prob, W)
        F = fb.forward_impl(plan, inp)
        B = fb.backward_impl(plan, inp)
        totals = fb.diagonal_totals_impl(plan, inp, F, B)
        S = plan.n_states
        trans = jnp.zeros((S, S), F.dtype)
        from ..constants import NUM_OF_KMERS
        from ..models.state_machines import SHORT_GAP_X
        kmer_gap = jnp.zeros(NUM_OF_KMERS + 2, F.dtype)
        ranks = inp.aux["rank"]
        for e, p in exp_kernels._edge_posteriors(plan, inp, F, B, totals):
            trans = trans.at[e.frm, e.to].add(p.sum())
            if e.to == SHORT_GAP_X:
                kmer_gap = kmer_gap.at[ranks.ravel()].add(p.ravel())
        lik = exp_kernels._likelihood(inp, totals)
        return trans, kmer_gap[:4096], lik

    trans, kmer_gap, lik = jax.vmap(one)(probs)
    return trans.sum(0), kmer_gap.sum(0), lik.sum(0)


def make_sm3_problem(pore: PoreModel, target_seq: str, events: np.ndarray,
                     band: Band, *, transitions=None, kmer_gap_probs=None,
                     ragged_left=True, ragged_right=True,
                     pad_lx: int | None = None, pad_ly: int | None = None,
                     pad_d: int | None = None, dtype=np.float32
                     ) -> tuple[fb.EnginePlan, SM3Problem]:
    """Host-side packing of one problem into device layout (padded)."""
    sm = make_signal_sm3(pore, target_seq, events, transitions, kmer_gap_probs)
    plan, tp_scalar, cell_sources = fb._build_plan(sm, "exact")
    assert not cell_sources

    lX = len(target_seq) - KMER_LENGTH + 1
    lY = len(events)
    lxp = lX if pad_lx is None else pad_lx
    lyp = lY if pad_ly is None else pad_ly
    Dp = band.n_diagonals if pad_d is None else pad_d

    ranks = np.full(lxp + 1, 4097, dtype=np.int32)
    ranks[:lX + 1] = sm.kmer_ranks
    ev = np.zeros((lyp + 1, 2), dtype=dtype)
    ev[1:lY + 1] = events[:, :2]
    # gapX table: default log(0.1) or trained probs; sentinel rows LOG_ZERO
    from ..models.state_machines import LOG_TENTH
    gapx = np.full(4098, LOG_TENTH, dtype=np.float64)
    if kmer_gap_probs is not None:
        gapx[:4096] = kmer_gap_probs
    gapx[4096:] = LOG_ZERO

    xmyL = np.concatenate([band.xmyL, np.full(Dp - band.n_diagonals, band.xmyL[-1])])
    width = np.concatenate([band.widths, np.zeros(Dp - band.n_diagonals)])

    prob = SM3Problem(
        ranks=jnp.asarray(ranks),
        ev=jnp.asarray(ev, dtype=dtype),
        match_table=jnp.asarray(pore.match_model, dtype=dtype),
        y_table=jnp.asarray(pore.y_model, dtype=dtype),
        gapx=jnp.asarray(gapx, dtype=dtype),
        tp_scalar=jnp.asarray(tp_scalar, dtype=dtype),
        start=jnp.asarray(sm.ragged_start if ragged_left else sm.start, dtype=dtype),
        end=jnp.asarray(sm.ragged_end if ragged_right else sm.end, dtype=dtype),
        xmyL=jnp.asarray(xmyL, dtype=jnp.int32),
        width=jnp.asarray(width, dtype=jnp.int32),
        d_last=jnp.asarray(band.n_diagonals - 1, dtype=jnp.int32),
    )
    return plan, prob


def stack_problems(probs: list[SM3Problem]) -> SM3Problem:
    """Stack same-shape problems into a batch (leading axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *probs)
