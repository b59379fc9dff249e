"""Device-resident batched window-engine pipeline for the threeState model.

Same role as engine/device.py but targeting the constant-shift window layout
(engine/window.py): no gathers in the scan; emissions built in-jit from compact
per-problem arrays on the (D, W) window grid with table gathers done once in
bulk (outside the recursion).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import KMER_LENGTH, LOG_ZERO
from ..core.window import WindowBand, smooth_band
from ..models.pore_model import PoreModel
from ..models.state_machines import make_signal_sm3
from . import fb, window

_LOG_INV_SQRT_2PI = -0.91893853320467267


class SM3WindowProblem(NamedTuple):
    ranks: jnp.ndarray       # (lXp + 1,) int32
    ev: jnp.ndarray          # (lYp + 1, 2)
    match_table: jnp.ndarray  # (4098, 5)
    y_table: jnp.ndarray
    gapx: jnp.ndarray        # (4098,)
    tp_scalar: jnp.ndarray
    start: jnp.ndarray
    end: jnp.ndarray
    w0: jnp.ndarray          # (Dp,) int32 window left edge (steps +-1; padded
                             # rows continue stepping arbitrarily)
    xmyL: jnp.ndarray        # (Dp,) int32 true band limits
    xmyR: jnp.ndarray
    d_last: jnp.ndarray      # () int32


def _log_gauss(x, mu, sigma):
    ok = sigma != 0.0
    safe = jnp.where(ok, sigma, 1.0)
    a = (x - mu) / safe
    return jnp.where(ok, _LOG_INV_SQRT_2PI - jnp.log(safe) - 0.5 * a * a, LOG_ZERO)


def build_window_inputs_sm3(prob: SM3WindowProblem, W: int) -> window.WindowInputs:
    Dp = prob.w0.shape[0]
    dtype = prob.ev.dtype
    d_grid = jnp.arange(Dp)[:, None]
    j_grid = jnp.arange(W)[None, :]
    xmy = prob.w0[:, None] + 2 * j_grid
    x = (d_grid + xmy) // 2
    y = (d_grid - xmy) // 2
    in_band = (xmy >= prob.xmyL[:, None]) & (xmy <= prob.xmyR[:, None])
    valid = in_band & (d_grid <= prob.d_last)

    lx = prob.ranks.shape[0] - 1
    ly = prob.ev.shape[0] - 1
    xi = jnp.clip(x, 0, lx)
    yi = jnp.clip(y, 0, ly)
    r = prob.ranks[xi]
    mean = prob.ev[yi, 0]
    noise = prob.ev[yi, 1]

    mp = prob.match_table[r]
    yp = prob.y_table[r]
    e_match = (_log_gauss(mean, mp[..., 0], mp[..., 1])
               + _log_gauss(noise, mp[..., 2], mp[..., 3]))
    e_y = (_log_gauss(mean, yp[..., 0], yp[..., 1])
           + _log_gauss(noise, yp[..., 2], yp[..., 3]))
    e_gapx = prob.gapx[r]
    E = jnp.stack([e_gapx, e_match, e_y], axis=1)      # (Dp, C, W)
    E = jnp.where(valid[:, None, :], E, 0.0)
    E = jnp.concatenate([E, jnp.zeros((1, 3, W), dtype)], axis=0)

    w0 = prob.w0
    fL = jnp.zeros(Dp, jnp.int32).at[1:].set(((w0[1:] - 1 - w0[:-1]) // 2).astype(jnp.int32))
    fM = jnp.zeros(Dp, jnp.int32).at[2:].set(((w0[2:] - w0[:-2]) // 2).astype(jnp.int32))
    bL = jnp.zeros(Dp, jnp.int32).at[:-1].set(((w0[:-1] + 1 - w0[1:]) // 2).astype(jnp.int32))
    bM = jnp.zeros(Dp, jnp.int32).at[:-2].set(((w0[:-2] - w0[2:]) // 2).astype(jnp.int32))

    return window.WindowInputs(
        E=E,
        TP=jnp.zeros((Dp + 1, 0, W), dtype),
        tp_scalar=prob.tp_scalar,
        valid=valid,
        fL=fL, fM=fM, bL=bL, bM=bM,
        x=x.astype(jnp.int32), y=y.astype(jnp.int32),
        start=prob.start, end=prob.end,
        last_real=jnp.arange(Dp) == prob.d_last,
        aux={"rank": r},
    )


@partial(jax.jit, static_argnums=(0, 1))
def sm3_batch_posteriors(plan: fb.EnginePlan, W: int, probs: SM3WindowProblem):
    def one(prob):
        inp = build_window_inputs_sm3(prob, W)
        F = window.forward_impl(plan, inp)
        B = window.backward_impl(plan, inp)
        p, totals = window.posterior_match_probs_impl(plan, inp, F, B)
        return p, inp.x, inp.y, totals

    return jax.vmap(one)(probs)


@partial(jax.jit, static_argnums=(0, 1))
def sm3_batch_expectations(plan: fb.EnginePlan, W: int, probs: SM3WindowProblem):
    def one(prob):
        inp = build_window_inputs_sm3(prob, W)
        F = window.forward_impl(plan, inp)
        B = window.backward_impl(plan, inp)
        return window.threestate_expectations_impl(plan, inp, F, B)

    trans, kmer_gap, lik = jax.vmap(one)(probs)
    return trans.sum(0), kmer_gap.sum(0), lik.sum(0)


def make_sm3_window_problem(pore: PoreModel, target_seq: str, events: np.ndarray,
                            wband: WindowBand, *, transitions=None,
                            kmer_gap_probs=None, ragged_left=True,
                            ragged_right=True, pad_lx: int | None = None,
                            pad_ly: int | None = None, pad_d: int | None = None,
                            dtype=np.float32) -> tuple[fb.EnginePlan, SM3WindowProblem]:
    sm = make_signal_sm3(pore, target_seq, events, transitions, kmer_gap_probs)
    plan, tp_scalar, cell_sources = fb._build_plan(sm, "exact")
    assert not cell_sources

    lX = len(target_seq) - KMER_LENGTH + 1
    lY = len(events)
    lxp = lX if pad_lx is None else pad_lx
    lyp = lY if pad_ly is None else pad_ly
    D = wband.n_diagonals
    Dp = D if pad_d is None else pad_d

    ranks = np.full(lxp + 1, 4097, dtype=np.int32)
    ranks[:lX + 1] = sm.kmer_ranks
    ev = np.zeros((lyp + 1, 2), dtype=dtype)
    ev[1:lY + 1] = events[:, :2]
    from ..models.state_machines import LOG_TENTH
    gapx = np.full(4098, LOG_TENTH, dtype=np.float64)
    if kmer_gap_probs is not None:
        gapx[:4096] = kmer_gap_probs
    gapx[4096:] = LOG_ZERO

    # padded diagonals continue stepping the window (alternating +-1 keeps
    # parity and bounded coordinates) with an empty true band
    w0 = np.empty(Dp, dtype=np.int64)
    w0[:D] = wband.w0
    for d in range(D, Dp):
        w0[d] = w0[d - 1] + (1 if (d - D) % 2 == 0 else -1)
    xmyL = np.empty(Dp, dtype=np.int64)
    xmyR = np.empty(Dp, dtype=np.int64)
    xmyL[:D] = wband.xmyL
    xmyR[:D] = wband.xmyR
    xmyL[D:] = w0[D:] + 2 * wband.W + 2   # empty: left limit beyond window
    xmyR[D:] = w0[D:]

    prob = SM3WindowProblem(
        ranks=jnp.asarray(ranks),
        ev=jnp.asarray(ev, dtype=dtype),
        match_table=jnp.asarray(pore.match_model, dtype=dtype),
        y_table=jnp.asarray(pore.y_model, dtype=dtype),
        gapx=jnp.asarray(gapx, dtype=dtype),
        tp_scalar=jnp.asarray(tp_scalar, dtype=dtype),
        start=jnp.asarray(sm.ragged_start if ragged_left else sm.start, dtype=dtype),
        end=jnp.asarray(sm.ragged_end if ragged_right else sm.end, dtype=dtype),
        w0=jnp.asarray(w0, dtype=jnp.int32),
        xmyL=jnp.asarray(xmyL, dtype=jnp.int32),
        xmyR=jnp.asarray(xmyR, dtype=jnp.int32),
        d_last=jnp.asarray(D - 1, dtype=jnp.int32),
    )
    return plan, prob


def stack_problems(probs: list[SM3WindowProblem]) -> SM3WindowProblem:
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *probs)
