"""Host packing + pipeline for the Pallas wavefront kernels (threeState).

Packs one alignment problem into the compact per-x/per-y parameter arrays the
emissions kernel slices (ops/pallas_fb.py), runs emissions -> forward ->
fused backward, and exposes posterior/EM outputs.

Index conventions: per-x arrays are indexed by x (= x_idx + 1, so slot 0 is
the x = -1 sentinel) shifted by +PADX so window cells left of the matrix stay
in-bounds; reversed event arrays are indexed by ri = lY - y (increasing along
a diagonal).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import KMER_LENGTH, NUM_OF_KMERS
from ..core.window import WindowBand
from ..models.pore_model import PoreModel
from ..models.state_machines import LOG_TENTH, make_signal_sm3
from ..ops import pallas_fb as pk
from . import fb

NEG_INF = pk.NEG_INF


class SM3PallasProblem(NamedTuple):
    xarr: jnp.ndarray    # (N_XPARAMS, lXp) f32
    evr: jnp.ndarray     # (2, lYp) f32
    x0: jnp.ndarray      # (Dp+1,) int32 emission x-slice offsets
    yr0: jnp.ndarray     # (Dp+1,) int32
    diag_scalars: jnp.ndarray  # (Dp+1, 1, 8) int32 (ops/pallas_fb.DS_*)
    d_last: jnp.ndarray  # () int32
    start: jnp.ndarray   # (S,) f32
    end: jnp.ndarray
    tp_scalar: jnp.ndarray  # (n,) f32
    xrank: jnp.ndarray   # (lXp,) int32 k-mer rank per xarr column (sentinel
                         # slots 4097) — drives the on-device kmer-gap scatter


def _gauss_pack(table: np.ndarray, ranks: np.ndarray):
    """(mu, inv_sd, logc) triplets for level & noise from a model table
    gathered by rank; sigma == 0 rows (sentinels) become -inf emissions."""
    mu_l = table[ranks, 0]
    sd_l = table[ranks, 1]
    mu_n = table[ranks, 2]
    sd_n = table[ranks, 3]

    def pack(mu, sd):
        ok = sd != 0.0
        inv = np.where(ok, 1.0 / np.where(ok, sd, 1.0), 0.0)
        logc = np.where(ok, -0.91893853320467267 - np.log(np.where(ok, sd, 1.0)),
                        NEG_INF)
        return np.where(ok, mu, 0.0), inv, logc

    return pack(mu_l, sd_l) + pack(mu_n, sd_n)


def _san(v):
    """Finite f32: saturate -inf transition/boundary values to NEG_INF so
    in-kernel f32 arithmetic stays NaN-free."""
    return np.maximum(np.asarray(v, dtype=np.float64), NEG_INF).astype(np.float32)


def _window_diag_scalars(wband: WindowBand, Dp: int):
    """(Dp+1, 1, 8) int32 DS_* rows for a window band padded to Dp diagonals;
    padded rows keep stepping the window with empty xmy ranges so they stay
    invalid.  DS_XS and the row-Dp sentinel copy are left to the caller.
    Returns (ds, padded w0)."""
    D, W = wband.n_diagonals, wband.W
    w0 = np.empty(Dp, dtype=np.int64)
    w0[:D] = wband.w0
    for d in range(D, Dp):
        w0[d] = w0[d - 1] + (1 if (d - D) % 2 == 0 else -1)
    xmyL = np.empty(Dp, dtype=np.int64)
    xmyR = np.empty(Dp, dtype=np.int64)
    xmyL[:D] = wband.xmyL
    xmyR[:D] = wband.xmyR
    xmyL[D:] = w0[D:] + 2 * W + 2
    xmyR[D:] = w0[D:]

    fL = np.zeros(Dp, dtype=np.int32)
    fM = np.zeros(Dp, dtype=np.int32)
    bL = np.zeros(Dp, dtype=np.int32)
    bM = np.zeros(Dp, dtype=np.int32)
    fL[1:] = (w0[1:] - 1 - w0[:-1]) // 2
    fM[2:] = (w0[2:] - w0[:-2]) // 2
    bL[:-1] = (w0[:-1] + 1 - w0[1:]) // 2
    bM[:-2] = (w0[:-2] - w0[2:]) // 2

    ds = np.zeros((Dp + 1, 1, 8), dtype=np.int32)
    ds[:Dp, 0, pk.DS_FL] = fL
    ds[:Dp, 0, pk.DS_FM] = fM
    ds[:Dp, 0, pk.DS_BL] = bL
    ds[:Dp, 0, pk.DS_BM] = bM
    ds[:Dp, 0, pk.DS_W0] = w0
    ds[:Dp, 0, pk.DS_XMYL] = xmyL
    ds[:Dp, 0, pk.DS_XMYR] = xmyR
    return ds, w0


def make_sm3_pallas_problem(pore: PoreModel, target_seq: str, events: np.ndarray,
                            wband: WindowBand, *, transitions=None,
                            kmer_gap_probs=None, ragged_left=True,
                            ragged_right=True, pad_lx: int | None = None,
                            pad_ly: int | None = None, pad_d: int | None = None
                            ) -> tuple[fb.EnginePlan, SM3PallasProblem]:
    sm = make_signal_sm3(pore, target_seq, events, transitions, kmer_gap_probs)
    plan, tp_scalar, cell_sources = fb._build_plan(sm, "exact")
    assert not cell_sources

    W = wband.W
    D = wband.n_diagonals
    # the kd-blocked kernels need Dp % KD == 0 (ops/pallas_fb)
    Dp = -(-max(D, pad_d or D) // pk.KD) * pk.KD
    lX = len(target_seq) - KMER_LENGTH + 1
    lY = len(events)
    lx_cap = lX if pad_lx is None else pad_lx
    ly_cap = lY if pad_ly is None else pad_ly

    # --- per-x parameter pack: slots x = 0..lX (+1 sentinel at 0), padded by
    # W on both sides so any window slice is in-bounds ---
    PADX = W
    lXp = -(-(lx_cap + 1 + 2 * W + 2 * 128) // 128) * 128
    xarr = np.zeros((pk.N_XPARAMS, lXp), dtype=np.float32)
    xarr[2] = NEG_INF   # logc rows default to -inf (invalid)
    xarr[5] = NEG_INF
    xarr[8] = NEG_INF
    xarr[11] = NEG_INF
    xarr[12] = NEG_INF  # gapx
    ranks = sm.kmer_ranks  # (lX+1,)
    sl = slice(PADX, PADX + lX + 1)
    m = _gauss_pack(pore.match_model, ranks)
    y = _gauss_pack(pore.y_model, ranks)
    for row, vals in enumerate(m + y):
        xarr[row, sl] = vals
    gapx_tab = np.full(NUM_OF_KMERS + 2, LOG_TENTH)
    if kmer_gap_probs is not None:
        gapx_tab[:NUM_OF_KMERS] = kmer_gap_probs
    gapx_tab[NUM_OF_KMERS:] = NEG_INF
    xarr[12, sl] = np.maximum(gapx_tab[ranks], NEG_INF)
    xrank = np.full(lXp, NUM_OF_KMERS + 1, dtype=np.int32)
    xrank[sl] = ranks

    # --- reversed event arrays: ri = lY - y in [0, lY], padded by W ---
    PADY = W
    lYp = -(-(ly_cap + 1 + 2 * W + 2 * 128) // 128) * 128
    evr = np.zeros((2, lYp), dtype=np.float32)
    evr[0, PADY:PADY + lY] = events[::-1, 0]
    evr[1, PADY:PADY + lY] = events[::-1, 1]
    # slot ri = lY (y = 0 -> null event) stays 0

    # --- per-diagonal scalars (padded rows keep stepping the window) ---
    ds, w0 = _window_diag_scalars(wband, Dp)

    d_arange = np.arange(Dp)
    x_of_j0 = (d_arange + w0) // 2           # x at window cell j=0
    y_of_j0 = (d_arange - w0) // 2
    x0 = np.zeros(Dp + 1, dtype=np.int32)
    yr0 = np.zeros(Dp + 1, dtype=np.int32)
    x0[:Dp] = np.clip(x_of_j0 + PADX, 0, lXp - W)
    yr0[:Dp] = np.clip(lY - y_of_j0 + PADY, 0, lYp - W)
    ds[1:Dp, 0, pk.DS_XS] = x0[1:Dp] - x0[:Dp - 1]  # x-window step, in {0,1}
    ds[Dp] = ds[Dp - 1]  # row Dp: read when the kernel peeks at d+1 off the end

    prob = SM3PallasProblem(
        xarr=jnp.asarray(xarr),
        evr=jnp.asarray(evr),
        x0=jnp.asarray(x0), yr0=jnp.asarray(yr0),
        diag_scalars=jnp.asarray(ds),
        d_last=jnp.asarray(D - 1, dtype=jnp.int32),
        start=jnp.asarray(_san(sm.ragged_start if ragged_left else sm.start)),
        end=jnp.asarray(_san(sm.ragged_end if ragged_right else sm.end)),
        tp_scalar=jnp.asarray(_san(tp_scalar)),
        xrank=jnp.asarray(xrank),
    )
    return plan, prob


def stack_problems(probs: list[SM3PallasProblem]) -> SM3PallasProblem:
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *probs)


def run_sm3_pallas(plan: fb.EnginePlan, W: int, batch: SM3PallasProblem,
                   Bt: int | None = None, stages: int = 4,
                   interpret: bool = False, kd: int | None = None):
    """Pipeline body: emissions -> forward -> fused backward (all
    kd-diagonal-blocked; F carries a leading NEG_INF halo block).  stages=3
    is the posterior-decoding (alignment) path; stages=4 adds the EM
    tallies (see ops/pallas_fb.backward_sm3).  kd defaults to pk.KD; huge
    single-problem buckets (unsplit long reads) pass a larger kd — the
    sequential grid-step count, not VMEM, binds there."""
    if kd is None:
        # interpret mode (CPU tests) is dominated by Python TRACING of the
        # kd-unrolled kernel body; kd=2 quarters it (runtime is a compiled
        # loop either way)
        kd = 2 if interpret else pk.KD
    Dp = batch.diag_scalars.shape[1] - 1
    E = pk.emissions_sm3(batch.x0, batch.yr0, batch.xarr, batch.evr, W, Dp,
                         kd=kd, interpret=interpret)
    F = pk.forward_sm3(plan, E, batch.diag_scalars, batch.d_last,
                       batch.start, batch.tp_scalar, Bt=Bt, kd=kd,
                       interpret=interpret)
    p, totals, exits, gacc, stats = pk.backward_sm3(
        plan, E, F, batch.diag_scalars, batch.d_last, batch.end,
        batch.tp_scalar, Bt=Bt, kd=kd, stages=stages,
        interpret=interpret)
    return (p[:, :, 0, :], totals[:, :, 0, 0], exits[:, :, 0, 0],
            gacc[:, 0, :], stats[:, 0, :])


def run_sm3_pallas_paired(plan: fb.EnginePlan, HW: int,
                          batch: SM3PallasProblem, Bt: int | None = None,
                          interpret: bool = False, kd: int | None = None):
    """Half-packed alignment pipeline: ``batch`` stacks an EVEN number (2B)
    of HW-lane problems; pairs (2i, 2i+1) share one 2*HW-lane kernel row
    (ops/pallas_fb nh=2).  Emissions run per problem at HW lanes, then E is
    transpose-packed; the sequential forward/backward run on B packed rows —
    the same vector ops carry twice the problems, the lane-occupancy lever
    the band-width distribution allows (under default expansion the true
    band is 24-45 wide, so HW=64 fits virtually every split job).  Returns
    (p (B, Dp, 2*HW), totals (B, Dp, 2)); posterior lanes [j] belong to
    problem 2i for j < HW, else 2i+1 (lane j - HW)."""
    if kd is None:
        kd = 2 if interpret else pk.KD
    W = 2 * HW
    S = plan.n_states
    Dp = batch.diag_scalars.shape[1] - 1
    E64 = pk.emissions_sm3(batch.x0, batch.yr0, batch.xarr, batch.evr, HW,
                           Dp, kd=kd, interpret=interpret)
    B2, Dpe, C, _ = E64.shape
    assert B2 % 2 == 0
    B = B2 // 2
    E = (E64.reshape(B, 2, Dpe, C, HW).transpose(0, 2, 3, 1, 4)
         .reshape(B, Dpe, C, W))
    ds = batch.diag_scalars
    ds2 = (ds.reshape(B, 2, ds.shape[1], 8)
           .transpose(0, 2, 1, 3))                     # (B, Dp+1, 2, 8)
    d_last2 = batch.d_last.reshape(B, 2)
    start2 = batch.start.reshape(B, 2 * S)
    end2 = batch.end.reshape(B, 2 * S)
    tp2 = batch.tp_scalar.reshape(B, 2, -1)[:, 0, :]   # shared per pair
    F = pk.forward_sm3(plan, E, ds2, d_last2, start2, tp2, Bt=Bt, kd=kd,
                       interpret=interpret)
    p, totals, _exits, _gacc, _stats = pk.backward_sm3(
        plan, E, F, ds2, d_last2, end2, tp2, Bt=Bt, kd=kd, stages=3,
        interpret=interpret)
    return p[:, :, 0, :], totals[:, :, 0, :]


def gapx_kmer_tallies(batch: SM3PallasProblem, W: int, exits, gacc):
    """Scatter the kernel's compact gapX outputs into per-kmer tallies:
    exits[d] belongs to x-column x0[d] + W - 1, gacc lane j to x0[0] + j
    (see backward_sm3).  O(B * (Dp + W)) scatter instead of per-cell."""
    Dp = exits.shape[1]
    exit_idx = batch.x0[:, :Dp] + (W - 1)          # (B, Dp)
    final_idx = batch.x0[:, 0:1] + jnp.arange(W)[None, :]

    def one(xr, ei, ev, fi, fv):
        t = jnp.zeros(NUM_OF_KMERS + 2, ev.dtype)
        t = t.at[xr[ei]].add(ev)
        t = t.at[xr[fi]].add(fv)
        return t

    return jax.vmap(one)(batch.xrank, exit_idx, exits, final_idx, gacc)


def unpack_stats(plan: fb.EnginePlan, stats: np.ndarray):
    """stats (B, 128) -> (trans (B, S, S), likelihood (B,))."""
    S = plan.n_states
    trans = np.zeros((stats.shape[0], S, S))
    for ei, e in enumerate(plan.edges):
        trans[:, e.frm, e.to] += stats[:, ei]
    return trans, stats[:, pk.LIK_LANE]


def make_jit_pipeline(plan: fb.EnginePlan, W: int, Bt: int | None = None):
    """One fused jit for the whole pipeline."""

    @jax.jit
    def pipeline(batch: SM3PallasProblem):
        return run_sm3_pallas(plan, W, batch, Bt=Bt)

    return pipeline


# ---------------------------------------------------------------------------
# Generic (per-cell-transition) problems: vanilla / echelon
# ---------------------------------------------------------------------------

class WindowPallasProblem(NamedTuple):
    """A window-banded problem with host-built E: channels 0..C-1 are the
    emission classes, channels C.. are the per-cell transition sources
    (vanilla skip-bin rows, echelon Poisson duration rows) — see
    ops/pallas_fb._echans."""

    E: jnp.ndarray             # (Dp + KD, C + T, W) f32; rows >= D zero
    diag_scalars: jnp.ndarray  # (Dp+1, 1, 8) int32
    d_last: jnp.ndarray        # () int32
    start: jnp.ndarray         # (S,) f32
    end: jnp.ndarray
    tp_scalar: jnp.ndarray     # (max(n, 1),) f32
    x0: jnp.ndarray            # (Dp+1,) int32 grid-x of window cell j=0 per
                               # diagonal (the per-x key for the stage-4
                               # windowed tallies: exits[d] belongs to column
                               # x0[d] + W - 1, gacc lane j to x0[0] + j)


def make_window_pallas_problem(sm, wband: WindowBand, *, ragged_left=True,
                               ragged_right=True, pad_d: int | None = None
                               ) -> tuple[fb.EnginePlan, WindowPallasProblem]:
    """Pack any state machine (incl. per-cell-transition vanilla/echelon) for
    the generic Pallas forward/backward kernels.  Emissions and per-cell
    transition grids are built host-side in the window layout (as in
    engine/window.prepare_window_inputs) and concatenated on the channel
    axis; -inf values saturate to NEG_INF so the f32 kernels stay NaN-free."""
    from .window import prepare_window_inputs

    plan, winp = prepare_window_inputs(sm, wband, ragged_left=ragged_left,
                                       ragged_right=ragged_right,
                                       dtype=jnp.float32)
    D, W = wband.n_diagonals, wband.W
    Dp = -(-max(D, pad_d or D) // pk.KD) * pk.KD
    E = np.asarray(winp.E)     # (D+1, C, W)
    TP = np.asarray(winp.TP)   # (D+1, T, W)
    C, T = E.shape[1], TP.shape[1]
    assert C == plan.n_eclasses
    comb = np.zeros((Dp + pk.KD, C + T, W), dtype=np.float32)
    comb[:D, :C] = np.maximum(E[:D], NEG_INF)
    comb[:D, C:] = np.maximum(TP[:D], NEG_INF)

    ds, w0 = _window_diag_scalars(wband, Dp)
    # DS_XS (x-window step) so stage-4 gapX window tracking is correct for
    # generic problems too; the PADX offset cancels in the difference
    x_of_j0 = (np.arange(Dp) + w0) // 2
    ds[1:Dp, 0, pk.DS_XS] = np.clip(x_of_j0[1:] - x_of_j0[:-1], 0, 1)
    ds[Dp] = ds[Dp - 1]
    x0 = np.zeros(Dp + 1, dtype=np.int32)
    x0[:Dp] = x_of_j0
    x0[Dp] = x_of_j0[Dp - 1]

    tp_scalar = np.asarray(winp.tp_scalar)
    if tp_scalar.size == 0:  # zero-width blocks are not a thing; pad one 0
        tp_scalar = np.zeros(1, dtype=np.float64)

    prob = WindowPallasProblem(
        E=jnp.asarray(comb),
        diag_scalars=jnp.asarray(ds),
        d_last=jnp.asarray(D - 1, dtype=jnp.int32),
        start=jnp.asarray(_san(winp.start)),
        end=jnp.asarray(_san(winp.end)),
        tp_scalar=jnp.asarray(_san(tp_scalar)),
        x0=jnp.asarray(x0),
    )
    return plan, prob


def run_window_pallas(plan: fb.EnginePlan, W: int, batch: WindowPallasProblem,
                      Bt: int | None = None, stages: int = 3,
                      interpret: bool = False,
                      wgroups: tuple[tuple[int, ...], ...] | None = None,
                      pgroups: tuple[tuple[int, ...], ...] | None = None,
                      pstates: tuple[int, ...] | None = None,
                      kd: int | None = None):
    """Forward -> fused backward on a stacked WindowPallasProblem batch.
    Returns (p (B, Dp, W) posterior match probs, totals (B, Dp)) for
    stages <= 3; with stages=4 additionally (exits (B, Dp, G), gacc
    (B, G, W), stats (B, 128)) — the generic EM tallies, with ``wgroups``
    selecting the per-x windowed posterior groups (see
    ops/pallas_fb.backward_sm3).  With ``pgroups`` the p output instead
    carries per-edge-group posterior channels (B, Dp, P, W)."""
    if kd is None:
        kd = 2 if interpret else pk.KD
    F = pk.forward_sm3(plan, batch.E, batch.diag_scalars, batch.d_last,
                       batch.start, batch.tp_scalar, Bt=Bt, kd=kd,
                       interpret=interpret)
    p, totals, exits, gacc, stats = pk.backward_sm3(
        plan, batch.E, F, batch.diag_scalars, batch.d_last, batch.end,
        batch.tp_scalar, Bt=Bt, kd=kd, stages=stages, interpret=interpret,
        wgroups=wgroups, pgroups=pgroups, pstates=pstates)
    p_out = (p if pgroups is not None or pstates is not None
             else p[:, :, 0, :])
    if stages >= 4:
        return (p_out, totals[:, :, 0, 0], exits[:, :, 0, :],
                gacc, stats[:, 0, :])
    return p_out, totals[:, :, 0, 0]


def run_window_pallas_paired(plan: fb.EnginePlan, HW: int, E64,
                             diag_scalars, d_last, start, end, tp_scalar,
                             Bt: int | None = None, interpret: bool = False,
                             kd: int | None = None):
    """Half-packed generic window pipeline: ``E64`` is (2B, Dpe, C, HW)
    per-problem emission grids; pairs (2i, 2i+1) share one 2*HW-lane kernel
    row (ops/pallas_fb nh=2).  diag_scalars (2B, Dp+1, 1, 8), d_last (2B,),
    start/end (2B, S), tp_scalar (2B, n) with each pair sharing one
    transition vector.  Returns (p (B, Dp, 2*HW), totals (B, Dp, 2))."""
    if kd is None:
        kd = 2 if interpret else pk.KD
    W = 2 * HW
    S = plan.n_states
    B2, Dpe, C, _ = E64.shape
    assert B2 % 2 == 0
    B = B2 // 2
    E = (E64.reshape(B, 2, Dpe, C, HW).transpose(0, 2, 3, 1, 4)
         .reshape(B, Dpe, C, W))
    ds2 = (diag_scalars.reshape(B, 2, diag_scalars.shape[1], 8)
           .transpose(0, 2, 1, 3))
    d_last2 = d_last.reshape(B, 2)
    start2 = start.reshape(B, 2 * S)
    end2 = end.reshape(B, 2 * S)
    tp2 = tp_scalar.reshape(B, 2, -1)[:, 0, :]
    F = pk.forward_sm3(plan, E, ds2, d_last2, start2, tp2, Bt=Bt, kd=kd,
                       interpret=interpret)
    p, totals, _exits, _gacc, _stats = pk.backward_sm3(
        plan, E, F, ds2, d_last2, end2, tp2, Bt=Bt, kd=kd, stages=3,
        interpret=interpret)
    return p[:, :, 0, :], totals[:, :, 0, :]


def sm3_pallas_expectations(plan: fb.EnginePlan, W: int,
                            batch: SM3PallasProblem, Bt: int | None = None,
                            interpret: bool = False):
    """Batched threeState E-step on the Pallas path (the production fast
    path): fused backward produces per-edge transition tallies + likelihood
    (stats lanes) and windowed gapX-entry tallies (exits/gacc); the per-kmer
    scatter happens on device via the xrank pack.  Returns
    (trans (S, S), kmer_gap (4096,), likelihood) summed over the batch —
    the same contract as engine.device.sm3_batch_expectations."""
    _p, _totals, exits, gacc, stats = run_sm3_pallas(plan, W, batch, Bt=Bt,
                                                     interpret=interpret)
    S = plan.n_states
    n_e = len(plan.edges)

    kmer_gap = gapx_kmer_tallies(batch, W, exits, gacc).sum(0)[:NUM_OF_KMERS]

    onehot = np.zeros((n_e, S * S), dtype=np.float32)
    for ei, e in enumerate(plan.edges):
        onehot[ei, e.frm * S + e.to] += 1.0
    trans = (stats[:, :n_e] @ jnp.asarray(onehot)).sum(0).reshape(S, S)
    lik = stats[:, pk.LIK_LANE].sum()
    return trans, kmer_gap, lik
