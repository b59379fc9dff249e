"""Pallas TPU wavefront kernels for the banded forward-backward engine.

Three kernels per (batched) alignment problem set, all operating on the
constant-shift window layout (engine/window.py):

  1. emissions kernel — per (problem, diagonal): emission rows are *contiguous
     slices* of per-x / per-(reversed) y parameter arrays (x is contiguous and
     y is anti-contiguous along an anti-diagonal), so the reference's per-cell
     table-walk + pdf (stateMachine.c:595-629) becomes two dynamic slices and a
     handful of fused VPU ops; writes E (B, Dp+1, C, W) to HBM.

  2. forward kernel — grid (B/Bt, Dp), Bt problems per block stacked on
     sublanes, W on lanes; the diagonal recursion lives in VMEM scratch with
     all neighbor access as one-lane rolls selected by per-(problem, diagonal)
     scalars.  log-add uses the reference's branch-free 4-piece cubic
     (pairwiseAligner.c:238-255) — no transcendentals in the hot loop.

  3. backward kernel — same structure run in reverse; fuses per-diagonal
     total probability (incl. the match-through-diagonal correction,
     pairwiseAligner.c:736-754), posterior match probabilities, and the EM
     edge-posterior tallies (transition counts, gapX-entry rows for the
     per-kmer scatter, likelihood) so B never round-trips HBM.

The forward/backward kernels are generic over any EnginePlan: per-cell
transition terms (vanilla's skip-bin log-probs, echelon's Poisson duration
posteriors; stateMachine.c:1368-1460) ride as extra E channels — channel
plan.n_eclasses + t holds cell source t — because in the window layout a
per-cell term shifts/fills exactly like an emission row.  Only the emissions
kernel (kernel 1) is threeState-specific; vanilla/echelon E+TP packs are
built host-side (engine/pallas_pipeline.make_window_pallas_problem).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LOG_ZERO
from ..engine.fb import EnginePlan
from ..models.state_machines import (SHORT_GAP_X, SRC_LOWER, SRC_MIDDLE,
                                     SRC_UPPER)

NEG_INF = -1e30  # finite stand-in: keeps f32 arithmetic NaN-free in-kernel
_LOG_UNDERFLOW = 7.5
# Diagonals per grid step (all three kernels share the block size).  kd=8
# halves the per-step VMEM footprint vs 16, which is what lets Bt (problems
# per block) grow to 24-48: wide blocks are the single biggest perf lever —
# the serial diagonal recursion is VPU-op-latency-bound, and ops spanning
# >= 6 vregs (Bt*W >= ~6k elements) hide that latency (real-chip sweep, r3).
KD = 8


def _ladd(x, y):
    """Reference logAdd (pairwiseAligner.c:238-255): lo + lookup(hi - lo) with
    lookup(d) ~= log(exp(d) + 1), truncated to hi for d >= 7.5."""
    hi = jnp.maximum(x, y)
    lo = jnp.minimum(x, y)
    d = jnp.minimum(hi - lo, _LOG_UNDERFLOW)
    p1 = ((-0.009350833524763 * d + 0.130659527668286) * d + 0.498799810682272) * d + 0.693203116424741
    p2 = ((-0.014532321752540 * d + 0.139942324101744) * d + 0.495635523139337) * d + 0.692140569840976
    p3 = ((-0.004605031767994 * d + 0.063427417320019) * d + 0.695956496475118) * d + 0.514272634594009
    p4 = ((-0.000458661602210 * d + 0.009695946122598) * d + 0.930734667215156) * d + 0.168037164329057
    lut = jnp.where(d <= 1.0, p1, jnp.where(d <= 2.5, p2, jnp.where(d <= 4.5, p3, p4)))
    out = jnp.where(d >= _LOG_UNDERFLOW, hi, lo + lut)
    return jnp.maximum(out, NEG_INF)  # keep -1e30 saturated


def _echans(plan, e):
    """E channels an edge reads: its emission class + any per-cell transition
    channels (appended after the plan.n_eclasses emission channels)."""
    return (e.eclass,) + tuple(plan.n_eclasses + i for i in e.cell_ids)


def _esum(plan, E, e):
    """Sum of an edge's E channels on a (Bt, Ct, W) block -> (Bt, W)."""
    chans = _echans(plan, e)
    v = E[:, chans[0], :]
    for ch in chans[1:]:
        v = v + E[:, ch, :]
    return v


def _shift(v, s, fill=NEG_INF, hw: int | None = None):
    """out[..., j] = v[..., j + s] for per-row scalars s (.., 1, 1) — or
    per-lane (.., 1, W) vectors when two half-problems share the lanes — in
    {-1, 0, +1}; edge lanes filled.  Static rolls + vector select.  ``hw``
    (defaults to the full lane width) is the sub-problem width: with two
    W//2-lane problems packed per vreg (nh=2), lanes hw-1 and hw are both
    edges so nothing leaks across the half boundary."""
    W = v.shape[-1]
    if hw is None:
        hw = W
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    if hw != W:
        lane = jax.lax.rem(lane, jnp.asarray(hw, lane.dtype))
    # pltpu.roll requires non-negative shifts; rolling right by W-1 == left by 1
    up = jnp.where(lane == hw - 1, fill, pltpu.roll(v, W - 1, axis=v.ndim - 1))
    down = jnp.where(lane == 0, fill, pltpu.roll(v, 1, axis=v.ndim - 1))
    return jnp.where(s == 0, v, jnp.where(s > 0, up, down))


# ---------------------------------------------------------------------------
# Kernel 1: emissions
# ---------------------------------------------------------------------------
# Per-x parameter pack layout (rows of xarr):
#   0..2  match level (mu, inv_sd, logc)      3..5  match noise (mu, inv_sd, logc)
#   6..8  y level     (mu, inv_sd, logc)      9..11 y noise    (mu, inv_sd, logc)
#   12    gapX log-prob
N_XPARAMS = 13


def _emissions_kernel(x0_ref, yr0_ref, xarr_ref, evr_ref, out_ref, *,
                      W, Dp, Bte, kd):
    dk = pl.program_id(1)
    # x0/yr0 stream in as 128-entry SMEM chunks (full-length rows would need
    # Dp x 4 bytes of SMEM per problem — a 100k-diagonal unsplit long read
    # blows the 1 MB budget); the kd diagonals of one step always fall inside
    # one 128-aligned chunk because kd divides 128
    base = (dk * kd) // 128 * 128

    for i in range(Bte):
        for k in range(kd):
            d = dk * kd + k
            xs = x0_ref[i, 0, d - base]
            ys = yr0_ref[i, 0, d - base]

            def pack(ref, nrows, start):
                # lane-dim dynamic slices must be 128-aligned: load an aligned
                # span and rotate by the remainder.  All nrows parameter
                # rows share the same offset, so one 2D slice + one roll
                # replaces nrows separate row loads (validated on-device).
                # span covers start - al (< 128) + W lanes, 128-aligned.
                span = W + 128 if W >= 128 else 256
                al = pl.multiple_of((start // 128) * 128, 128)
                v = ref[i, 0:nrows, pl.ds(al, span)]
                return pltpu.roll(v, span - (start - al), axis=1)[:, :W]

            ev = pack(evr_ref, 2, ys)          # rows: mean, noise
            xv = pack(xarr_ref, N_XPARAMS, xs)

            def gauss(base, obs):
                a = (obs - xv[base:base + 1]) * xv[base + 1:base + 2]
                return jnp.maximum(xv[base + 2:base + 3] - 0.5 * a * a, NEG_INF)

            mean = ev[0:1]
            noise = ev[1:2]
            e_match = jnp.maximum(gauss(0, mean) + gauss(3, noise), NEG_INF)
            e_y = jnp.maximum(gauss(6, mean) + gauss(9, noise), NEG_INF)
            e_gapx = xv[12:13]
            e = jnp.concatenate([e_gapx, e_match, e_y], axis=0)
            # row Dp is the zero sentinel the backward kernel's clamped
            # E_{d+1}/E_{d+2} peeks read; padded rows beyond it stay zero too
            out_ref[i, k] = jnp.where(d < Dp, e, jnp.zeros_like(e))


def emissions_sm3(x0, yr0, xarr, evr, W: int, Dp: int, interpret: bool = False,
                  Bte: int | None = None, kd: int = 8):
    """x0/yr0: (B, Dp+1) int32 slice offsets; xarr: (B, N_XPARAMS, lXp);
    evr: (B, 2, lYp).  Returns E (B, Dpe, C, W) with Dpe = ceil((Dp+1)/kd)*kd
    rows; rows >= Dp are zeros (row Dp is the sentinel the backward kernel
    reads when peeking past the last diagonal)."""
    Bn = xarr.shape[0]
    lXp = xarr.shape[2]
    lYp = evr.shape[2]
    nd = -(-(Dp + 1) // kd)
    Dpe = nd * kd
    if Bte is None:
        # keep the double-buffered xarr blocks within a few MB of VMEM
        # (SMEM is no issue: the offset rows stream as 128-entry chunks);
        # large-lXp (long-target) buckets are sequential-step bound, so the
        # budget leans high to keep Bte (problems per step) up
        Bte = max(1, min(8, (4 * 1024 * 1024) // (N_XPARAMS * lXp * 4)))
    while Bn % Bte:
        Bte -= 1
    # offset rows stream in as 128-entry SMEM chunks selected by the grid
    # step (SMEM blocks must be 128-divisible in the last dim; kd divides
    # 128, so a step's kd diagonals never straddle a chunk boundary)
    Dpc = -(-Dpe // 128) * 128

    def padded(v):
        v = v.reshape(Bn, 1, Dp + 1)
        return jnp.pad(v, ((0, 0), (0, 0), (0, Dpc - (Dp + 1))), mode="edge")

    in_specs = [
        pl.BlockSpec((Bte, 1, 128), lambda b, d: (b, 0, (d * kd) // 128),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((Bte, 1, 128), lambda b, d: (b, 0, (d * kd) // 128),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((Bte, N_XPARAMS, lXp), lambda b, d: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bte, 2, lYp), lambda b, d: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        partial(_emissions_kernel, W=W, Dp=Dp, Bte=Bte, kd=kd),
        grid=(Bn // Bte, nd),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Bte, kd, 3, W), lambda b, d: (b, d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bn, Dpe, 3, W), jnp.float32),
        interpret=interpret,
    )(padded(x0), padded(yr0), xarr, evr)


# ---------------------------------------------------------------------------
# Kernel 2: forward
# ---------------------------------------------------------------------------

# Packed per-(problem, diagonal) scalar rows (DS_* index the last axis of the
# (B, Dp+1, 1, 8) diag_scalars tensor).  DS_XS is the x-window step
# s_d = x0[d] - x0[d-1] in {0, 1} driving the in-kernel gapX accumulator.
DS_FL, DS_FM, DS_BL, DS_BM, DS_W0, DS_XMYL, DS_XMYR, DS_XS = range(8)
# stats output lanes: lane e (< n_edges) = edge e transition tally; lane 64 = likelihood
LIK_LANE = 64


def _half_col(ds, i, Bt, halfA):
    """Per-(problem, diagonal) scalar i from a (Bt, nh, 8) ds row, broadcast
    per half: (Bt, 1, 1) for nh=1 (scalar fast path), else (Bt, 1, W) with
    each packed half-problem reading its own value."""
    if halfA is None:
        return ds[:, 0, i:i + 1].reshape(Bt, 1, 1)
    a = ds[:, 0, i:i + 1].reshape(Bt, 1, 1)
    b = ds[:, 1, i:i + 1].reshape(Bt, 1, 1)
    return jnp.where(halfA, a, b)


def _half_vec(vec, S, halfA):
    """(Bt, nh*S) boundary vector -> (Bt, S, 1) (nh=1) or per-half
    (Bt, S, W).  Slice-then-reshape only: a None inside the subscript of a
    loaded array lowers to a gather Mosaic rejects."""
    B = vec.shape[0]
    if halfA is None:
        return vec.reshape(B, S, 1)
    a = vec[:, :S].reshape(B, S, 1)
    b = vec[:, S:].reshape(B, S, 1)
    return jnp.where(halfA, a, b)


def _forward_kernel(plan, Bt, W, kd, nh, E_ref, ds_ref, dlast_ref, start_ref,
                    tps_ref, F_ref, f1, f2):
    """Grid (B/Bt, nb_d + 1): step 0 emits the leading NEG_INF pad block of
    Fpad (consumed by the blocked backward kernel as the d < 0 halo); steps
    dk >= 1 run kd diagonals of the recursion from VMEM-resident carries —
    kd-blocking amortizes the per-grid-step dispatch/DMA overhead that
    dominates at one-diagonal blocks.

    ``nh=2`` packs two W//2-lane problems side by side in the 128 lanes
    (the band-width distribution under default expansion leaves true bands
    ~24-45 wide, so full-width vregs run at ~18-32% lane occupancy; pairing
    doubles useful lanes per vector op).  Per-(problem, diagonal) scalars
    become per-half lane selects; shifts stop at the half boundary."""
    S = plan.n_states
    HW = W // nh
    dk = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, 1, W), 2)
    lane_h = lane if nh == 1 else jax.lax.rem(lane, jnp.int32(HW))
    halfA = None if nh == 1 else lane < HW
    dlast = (dlast_ref[...].reshape(Bt, 1, 1) if nh == 1 else
             _half_col(dlast_ref[...].reshape(Bt, nh, 1), 0, Bt, halfA))

    def tp_of(e):
        t = None
        for i in e.scalar_ids:
            c = tps_ref[:, i:i + 1]
            t = c if t is None else t + c
        return 0.0 if t is None else t

    @pl.when(dk == 0)
    def _():
        F_ref[...] = jnp.full((Bt, kd, S, W), NEG_INF, jnp.float32)

    @pl.when(dk > 0)
    def _():
        for k in range(kd):
            d = (dk - 1) * kd + k
            ds = ds_ref[:, k, :, :]  # (Bt, nh, 8) int32
            col = lambda i, _ds=ds: _half_col(_ds, i, Bt, halfA)
            xmy = col(DS_W0) + 2 * lane_h
            valid = ((xmy >= col(DS_XMYL)) & (xmy <= col(DS_XMYR))
                     & (d <= dlast))

            if k == 0:
                @pl.when(dk == 1)
                def _():
                    sv = _half_vec(start_ref[...], S, halfA)
                    cur = jnp.where(valid, sv, NEG_INF)
                    cur = jnp.broadcast_to(cur, (Bt, S, W))
                    f1[:] = cur
                    f2[:] = jnp.full((Bt, S, W), NEG_INF, jnp.float32)
                    F_ref[:, 0] = cur

            def recur(k=k, valid=valid, col=col):
                sL = col(DS_FL)
                sM = col(DS_FM)
                prevL = _shift(f1[:], sL, hw=HW)
                prevU = _shift(f1[:], sL + 1, hw=HW)
                prevM = _shift(f2[:], sM, hw=HW)
                srcs = (prevL, prevM, prevU)
                E = E_ref[:, k]
                acc = [jnp.full((Bt, W), NEG_INF, jnp.float32) for _ in range(S)]
                for e in plan.edges:
                    val = srcs[e.src][:, e.frm, :] + _esum(plan, E, e) + tp_of(e)
                    acc[e.to] = _ladd(acc[e.to], val)
                cur = jnp.stack(acc, axis=1)
                cur = jnp.where(valid, cur, NEG_INF)
                F_ref[:, k] = cur
                f2[:] = f1[:]
                f1[:] = cur

            if k == 0:
                pl.when(dk > 1)(recur)
            else:
                recur()


def _pick_bt(Bn: int, W: int, Bt: int | None, kd: int = 1,
             vmem_budget: int = 6 * 1024 * 1024, rows: int = 14) -> int:
    """Problems per block: as many as VMEM comfortably allows (grid-step
    overhead dominates at small Bt), rounded down to a divisor of Bn.  The
    budget covers ``rows`` (kd, W)-row f32 blocks per problem — for SM3's
    backward that is ~14 (2xE, 2xF, outputs) plus carries — times double
    buffering; wide-channel machines (echelon) pass a larger row count."""
    if Bt is None:
        per_problem = max(kd, 1) * max(W, 1) * 4 * max(rows, 1) * 2
        Bt = max(8, vmem_budget // per_problem)
    Bt = min(Bt, Bn)
    # Mosaic requires the sublane block dim divisible by 8 or equal to the
    # array dim (the (Bt, 1) scalar inputs hit this): accept Bt == Bn or a
    # multiple of 8 that divides Bn, else fall back to 1-problem blocks
    # only if Bn itself is tiny.
    while Bt > 1 and (Bn % Bt or (Bt % 8 and Bt != Bn)):
        Bt -= 1
    return max(Bt, 1)


def forward_sm3(plan: EnginePlan, E, diag_scalars, d_last, start, tp_scalar,
                Bt: int | None = None, kd: int = 8, interpret: bool = False):
    """E (B, >=Dp+kd, C, W) with rows >= Dp zero; diag_scalars
    (B, >=Dp+1, nh, 8) int32 (see DS_*; nh=2 packs two W//2-lane problems
    per row — d_last is then (B, 2) and start (B, 2*S)); start (B, nh*S);
    tp_scalar (B, n), shared between packed halves.  Dp must be a multiple
    of kd.  Returns Fpad (B, Dp + kd, S, W) whose first kd rows are NEG_INF
    (the backward halo); real row d lives at kd + d."""
    Bn, _De, C, W = E.shape
    Dp = diag_scalars.shape[1] - 1
    nh = diag_scalars.shape[2]
    S = plan.n_states
    assert Dp % kd == 0, (Dp, kd)
    assert _De >= Dp + kd
    nb_d = Dp // kd
    Bt = _pick_bt(Bn, W, Bt, kd, rows=C + 3 * S + 2)
    nb = Bn // Bt
    grid = (nb, nb_d + 1)

    def dm1(b, dk):
        return (b, jnp.maximum(dk - 1, 0), 0, 0)

    specs = [
        pl.BlockSpec((Bt, kd, C, W), dm1, memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, kd, nh, 8), dm1, memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, nh), lambda b, dk: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, nh * S), lambda b, dk: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, tp_scalar.shape[1]), lambda b, dk: (b, 0),
                     memory_space=pltpu.VMEM),
    ]
    ds = diag_scalars
    if ds.shape[1] < nb_d * kd:  # blocked reads need Dp rows exactly
        ds = jnp.pad(ds, ((0, 0), (0, nb_d * kd - ds.shape[1]), (0, 0), (0, 0)),
                     mode="edge")
    return pl.pallas_call(
        partial(_forward_kernel, plan, Bt, W, kd, nh),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((Bt, kd, S, W), lambda b, dk: (b, dk, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bn, Dp + kd, S, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bt, S, W), jnp.float32),
                        pltpu.VMEM((Bt, S, W), jnp.float32)],
        interpret=interpret,
    )(E, ds, d_last.reshape(Bn, nh), start, tp_scalar)


# ---------------------------------------------------------------------------
# Kernel 3: backward + totals + posteriors + EM tallies
# ---------------------------------------------------------------------------

def _lse_rows(v):
    """logsumexp over (S, W) per problem row: v (Bt, S, W) -> (Bt, 1).

    Implemented with rank-2 intermediates only (unrolled over the small S
    axis + one lane reduction) — (Bt, 1, 1)-shaped float reductions crash the
    Mosaic layout pass on this toolchain."""
    S = v.shape[1]
    m_l = v[:, 0, :]
    for si in range(1, S):
        m_l = jnp.maximum(m_l, v[:, si, :])
    m = jnp.max(m_l, axis=1, keepdims=True)          # (Bt, 1)
    sum_l = jnp.zeros_like(m_l)
    for si in range(S):
        sum_l = sum_l + jnp.exp(v[:, si, :] - m)
    ssum = jnp.sum(sum_l, axis=1, keepdims=True)     # (Bt, 1)
    out = m + jnp.log(jnp.maximum(ssum, 1e-38))
    return jnp.where(m <= NEG_INF, NEG_INF, out)


def _backward_kernel(plan, Bt, W, Dp, kd, nh, stages, wgroups, pgroups,
                     pstates,
                     Eb0_ref, Eb1_ref, Fp0_ref, Fp1_ref,
                     dsb0_ref, dsb1_ref, dlast_ref, end_ref, tps_ref,
                     p_ref, tot_ref, exit_ref, gacc_ref, stats_ref,
                     b1, b2, stats_acc, gacc):
    """Grid (B/Bt, Dp/kd), walking diagonal blocks high-to-low; each step
    runs kd diagonals of the fused backward (recursion + totals + posteriors
    + EM tallies) against block-resident E/Fpad halos — row j0 of block bidx
    is diagonal d = bidx*kd + j0; Fpad carries a kd-row NEG_INF halo so
    d-1/d-2 reads at the low edge see NEG_INF exactly like the scan/window
    engines.  ``nh=2`` packs two W//2-lane problems per vreg row (see
    _forward_kernel); totals/posteriors are then computed per half."""
    S = plan.n_states
    HW = W // nh
    tb = pl.program_id(1)
    nb_d = Dp // kd
    lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, 1, W), 2)
    lane_h = lane if nh == 1 else jax.lax.rem(lane, jnp.int32(HW))
    halfA = None if nh == 1 else lane < HW
    dlast = (dlast_ref[...].reshape(Bt, 1, 1) if nh == 1 else
             _half_col(dlast_ref[...].reshape(Bt, nh, 1), 0, Bt, halfA))
    stats_lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, 128), 1)

    def tp_of(e):
        tval = None
        for i in e.scalar_ids:
            c = tps_ref[:, i:i + 1]
            tval = c if tval is None else tval + c
        return 0.0 if tval is None else tval

    def lse_h(v):
        """Per-half row logsumexp: returns (lane-broadcast (Bt, 1, W|1),
        compact (Bt, nh))."""
        if nh == 1:
            t = _lse_rows(v)
            return t[:, :, None], t
        mask = jnp.where(halfA, 0.0, NEG_INF)
        tA = _lse_rows(v + mask)
        tB = _lse_rows(v + (NEG_INF - mask))
        return (jnp.where(halfA, tA[:, :, None], tB[:, :, None]),
                jnp.concatenate([tA, tB], axis=1))

    @pl.when(tb == 0)
    def _():
        b1[:] = jnp.full((Bt, S, W), NEG_INF, jnp.float32)
        b2[:] = jnp.full((Bt, S, W), NEG_INF, jnp.float32)
        stats_acc[...] = jnp.zeros_like(stats_acc)
        gacc[...] = jnp.zeros_like(gacc)

    for k in range(kd):
        j0 = kd - 1 - k
        d = (nb_d - 1 - tb) * kd + j0  # traced diagonal index

        ds = dsb0_ref[:, j0, :, :]
        ds1 = (dsb0_ref[:, j0 + 1, :, :] if j0 + 1 < kd
               else dsb1_ref[:, 0, :, :])
        col = lambda i, _ds=ds: _half_col(_ds, i, Bt, halfA)
        xmy = col(DS_W0) + 2 * lane_h
        valid = (xmy >= col(DS_XMYL)) & (xmy <= col(DS_XMYR)) & (d <= dlast)

        E_d = Eb0_ref[:, j0]
        E_d1 = Eb0_ref[:, j0 + 1] if j0 + 1 < kd else Eb1_ref[:, 0]
        E_d2 = Eb0_ref[:, j0 + 2] if j0 + 2 < kd else Eb1_ref[:, j0 + 2 - kd]
        # Fpad row for F[d+off] is (bidx+1)*kd + j0 + off: block bidx+1 when
        # j0+off >= 0, else it wraps into block bidx's tail
        F_d = Fp1_ref[:, j0]
        F_dm1 = Fp1_ref[:, j0 - 1] if j0 >= 1 else Fp0_ref[:, kd - 1]
        F_dm2 = Fp1_ref[:, j0 - 2] if j0 >= 2 else Fp0_ref[:, kd - 2 + j0]

        sbL = col(DS_BL)
        sbM = col(DS_BM)

        # --- backward recursion for diagonal d ---
        acc = [jnp.full((Bt, W), NEG_INF, jnp.float32) for _ in range(S)]
        for e in plan.edges:
            if e.src == SRC_LOWER:
                sh, bN, EN = sbL, b1[:], E_d1
            elif e.src == SRC_UPPER:
                sh, bN, EN = sbL - 1, b1[:], E_d1
            else:
                sh, bN, EN = sbM, b2[:], E_d2
            # summing the edge's E channels before the shift is exact: the
            # shift is linear with a 0.0 fill
            val = (_shift(bN[:, e.to:e.to + 1, :], sh, hw=HW)[:, 0, :]
                   + _shift(_esum(plan, EN, e)[:, None, :], sh, fill=0.0,
                            hw=HW)[:, 0, :]
                   + tp_of(e))
            acc[e.frm] = _ladd(acc[e.frm], val)
        cur = jnp.stack(acc, axis=1)
        # inject end-state probs at each problem's last real diagonal
        cur = jnp.where(d == dlast, _half_vec(end_ref[...], S, halfA), cur)
        cur = jnp.where(valid, cur, NEG_INF)

        # --- per-diagonal total probability ---
        if stages >= 2:
            vmask = jnp.where(valid, 0.0, NEG_INF)
            t1, t1c = lse_h(F_d + cur + vmask)
            # match-through-diagonal correction: forward-extend F[d-1] by
            # MIDDLE edges onto diag d+1's grid, dot with b_{d+1}
            sM1 = _half_col(ds1, DS_FM, Bt, halfA)
            c_acc = [jnp.full((Bt, W), NEG_INF, jnp.float32) for _ in range(S)]
            for e in plan.edges:
                if e.src != SRC_MIDDLE:
                    continue
                val = (_shift(F_dm1[:, e.frm:e.frm + 1, :], sM1,
                              hw=HW)[:, 0, :]
                       + _esum(plan, E_d1, e) + tp_of(e))
                c_acc[e.to] = _ladd(c_acc[e.to], val)
            c = jnp.stack(c_acc, axis=1)
            t2, t2c = lse_h(c + b1[:])
            have_t2 = (d >= 1) & (d < Dp - 1)
            tot_lane = jnp.where(have_t2, _ladd(t1, t2), t1)
            total = jnp.where(have_t2, _ladd(t1c, t2c), t1c)   # (Bt, nh)
            tot_ref[:, j0, 0, :] = total
        else:
            tot_lane = jnp.zeros((Bt, 1, 1), jnp.float32)
            total = jnp.zeros((Bt, nh), jnp.float32)
            tot_ref[:, j0, 0, :] = total

        # --- posterior match probabilities ---
        if pgroups is not None:
            pass       # p_ref written from the per-edge posteriors below
        elif pstates is not None and stages >= 3:
            # multi-state posterior channels (echelon: one channel per
            # matchN state, diagonalCalculationMultiPosteriorMatchProbs,
            # pairwiseAligner.c:797-839)
            x_pos = xmy > -d
            y_pos = xmy < d
            okm = (valid & x_pos & y_pos)[:, 0, :]
            for c, sst in enumerate(pstates):
                ps = jnp.exp(jnp.minimum(F_d[:, sst, :] + cur[:, sst, :]
                                         - tot_lane[:, 0, :], 0.0))
                p_ref[:, j0, c] = jnp.where(okm, ps, 0.0)
        elif stages >= 3:
            m = plan.match_state
            x_pos = xmy > -d   # x > 0
            y_pos = xmy < d    # y > 0
            p = jnp.exp(jnp.minimum(F_d[:, m, :] + cur[:, m, :]
                                    - tot_lane[:, 0, :], 0.0))
            p = jnp.where((valid & x_pos & y_pos)[:, 0, :], p, 0.0)
            p_ref[:, j0, 0] = p
        else:
            p_ref[:, j0, 0] = cur[:, plan.match_state, :]

        # --- EM tallies: per-edge posterior sums + likelihood, accumulated
        # as lane-masked adds into the (Bt, 128) stats scratch (lane e =
        # edge e's transition tally; lane 64 = likelihood).  gapX-entry
        # posteriors accumulate in a window-tracking (Bt, W) scratch whose
        # lane j means x = x0[d] + j; when the window steps right between
        # diagonals (s_d = 1, DS_XS) the lane that leaves on the right is
        # emitted to exit_ref[d] (its x is x0[d] + W - 1) — this keeps the
        # per-kmer scatter outside the kernel at O(B * (Dp + W)) instead of
        # O(B * Dp * W) ---
        G = len(wgroups)
        if stages >= 4:
            sfL = col(DS_FL)
            sfM = col(DS_FM)
            srcL = _shift(F_dm1, sfL)
            srcU = _shift(F_dm1, sfL + 1)
            srcM = _shift(F_dm2, sfM)
            srcs = (srcL, srcM, srcU)
            em_ok = (valid[:, 0, :]) & (d >= 1)
            add = jnp.zeros((Bt, 128), jnp.float32)
            pg = [jnp.zeros((Bt, W), jnp.float32) for _g in range(G)]
            pch = ([jnp.zeros((Bt, W), jnp.float32) for _c in pgroups]
                   if pgroups is not None else None)
            for ei, e in enumerate(plan.edges):
                logp = (srcs[e.src][:, e.frm, :] + cur[:, e.to, :]
                        + _esum(plan, E_d, e) + tp_of(e) - total)
                pe = jnp.where(em_ok, jnp.exp(jnp.minimum(logp, 0.0)), 0.0)
                pe_sum = jnp.sum(pe, axis=1, keepdims=True)   # (Bt, 1)
                add = add + jnp.where(stats_lane == ei, pe_sum, 0.0)
                for g, members in enumerate(wgroups):
                    if ei in members:
                        pg[g] = pg[g] + pe
                if pgroups is not None:
                    for c, members in enumerate(pgroups):
                        if ei in members:
                            pch[c] = pch[c] + pe
            if pgroups is not None:
                # per-edge-group posterior channels (discrete emission
                # tallies / HDP assignment masks ride these instead of the
                # match-state posterior)
                for c in range(len(pgroups)):
                    p_ref[:, j0, c] = pch[c]
            lik_d = jnp.where((d >= 1) & (d <= dlast[:, :, 0]), total, 0.0)
            add = add + jnp.where(stats_lane == LIK_LANE, lik_d, 0.0)
            stats_acc[...] += add
            s = ds[:, 0, DS_XS:DS_XS + 1]                   # (Bt, 1) in {0,1}
            exits = []
            for g in range(G):
                gnew = gacc[g] + pg[g]
                exits.append(jnp.where(s == 1, gnew[:, W - 1:W], 0.0))
                shifted = _shift(gnew[:, None, :], -s.reshape(Bt, 1, 1),
                                 fill=0.0)[:, 0, :]
                gacc[g] = jnp.where(s == 1, shifted, gnew)
            exit_ref[:, j0, 0, :] = jnp.concatenate(exits, axis=1)
        else:
            exit_ref[:, j0, 0, :] = jnp.zeros((Bt, G), jnp.float32)

        # rotate carries
        b2[:] = b1[:]
        b1[:] = cur

    # flush the scratch accumulators into the (write-once) outputs at the end
    @pl.when(tb == nb_d - 1)
    def _():
        stats_ref[:, 0, :] = stats_acc[...]
        for g in range(len(wgroups)):
            gacc_ref[:, g, :] = gacc[g]


def backward_sm3(plan: EnginePlan, E, Fpad, diag_scalars, d_last, end,
                 tp_scalar, Bt: int | None = None, kd: int = 8,
                 stages: int = 4, interpret: bool = False,
                 wgroups: tuple[tuple[int, ...], ...] | None = None,
                 pgroups: tuple[tuple[int, ...], ...] | None = None,
                 pstates: tuple[int, ...] | None = None):
    """Fused backward pass over kd-diagonal blocks.  ``Fpad`` is the forward
    kernel's output (B, Dp + kd, S, W) with a kd-row NEG_INF halo in front;
    E must have >= Dp + kd rows with rows >= Dp zero.  Returns
    (p (B,Dp,1,W), totals (B,Dp,1,1), exits (B,Dp,1,G), gacc (B,G,W),
    stats (B,1,128): lane e = edge-e transition tally, lane LIK_LANE =
    likelihood).  ``wgroups`` selects G groups of edge indices whose
    posteriors accumulate in per-x window-tracking tallies (default: one
    group, edges entering shortGapX — the SM3 per-kmer gapX scatter; the
    vanilla E-step passes (M->X,), (X->X,) for its beta/alpha bins):
    exits[d, g] carries group g's posterior mass for x = x0[d] + W - 1 where
    DS_XS[d] == 1 (else 0); gacc[g] lane j the remaining mass for
    x = x0[0] + j.  ``stages`` gates debug subsets (1 = bare recursion,
    2 = +totals, 3 = +posteriors, 4 = +EM tallies).

    ``pgroups`` (stages >= 4 only) redefines the p output: instead of the
    match-state posterior, channel c of p carries the SUM of the per-edge
    posteriors of edge-index group pgroups[c] (the cell_updateExpectations
    edge posteriors, pairwiseAligner.c:407-424) — per-to-state groups give
    the discrete emission tallies, per-middle-edge-into-match groups the HDP
    assignment masks (pairwiseAligner.c:445-476)."""
    Bn, _De, C, W = E.shape
    Dp = diag_scalars.shape[1] - 1
    nh = diag_scalars.shape[2]
    S = plan.n_states
    assert Dp % kd == 0, (Dp, kd)
    assert _De >= Dp + kd and Fpad.shape[1] == Dp + kd
    assert pgroups is None or stages >= 4
    assert pstates is None or (pgroups is None and stages == 3 and nh == 1), \
        "pstates is the echelon multi-state posterior mode (stages=3)"
    assert nh == 1 or (stages <= 3 and pgroups is None), \
        "half-packed (nh=2) buckets drive the alignment path only"
    if wgroups is None:
        wgroups = (tuple(ei for ei, e in enumerate(plan.edges)
                         if e.to == SHORT_GAP_X),)
    G = len(wgroups)
    P = (len(pstates) if pstates is not None
         else 1 if pgroups is None else len(pgroups))
    nb_d = Dp // kd
    Bt = _pick_bt(Bn, W, Bt, kd, rows=C + 3 * S + 2 + (G - 1) + (P - 1))
    nb = Bn // Bt

    def eblk(off):
        return lambda b, t: (b, nb_d - 1 - t + off, 0, 0)

    ds = diag_scalars
    need = (nb_d + 1) * kd
    if ds.shape[1] < need:  # row Dp.. replicate the last real row
        ds = jnp.pad(ds, ((0, 0), (0, need - ds.shape[1]), (0, 0), (0, 0)),
                     mode="edge")

    in_specs = [
        pl.BlockSpec((Bt, kd, C, W), eblk(0), memory_space=pltpu.VMEM),  # E b0
        pl.BlockSpec((Bt, kd, C, W), eblk(1), memory_space=pltpu.VMEM),  # E b1
        pl.BlockSpec((Bt, kd, S, W), eblk(0), memory_space=pltpu.VMEM),  # Fp b0
        pl.BlockSpec((Bt, kd, S, W), eblk(1), memory_space=pltpu.VMEM),  # Fp b1
        pl.BlockSpec((Bt, kd, nh, 8), eblk(0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, kd, nh, 8), eblk(1), memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, nh), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, nh * S), lambda b, t: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, tp_scalar.shape[1]), lambda b, t: (b, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((Bt, kd, P, W), eblk(0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, kd, 1, nh), eblk(0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, kd, 1, G), eblk(0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, G, W), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1, 128), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((Bn, Dp, P, W), jnp.float32),
        jax.ShapeDtypeStruct((Bn, Dp, 1, nh), jnp.float32),
        jax.ShapeDtypeStruct((Bn, Dp, 1, G), jnp.float32),
        jax.ShapeDtypeStruct((Bn, G, W), jnp.float32),
        jax.ShapeDtypeStruct((Bn, 1, 128), jnp.float32),
    )
    return pl.pallas_call(
        partial(_backward_kernel, plan, Bt, W, Dp, kd, nh, stages, wgroups,
                pgroups, pstates),
        grid=(nb, nb_d),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((Bt, S, W), jnp.float32),
                        pltpu.VMEM((Bt, S, W), jnp.float32),
                        pltpu.VMEM((Bt, 128), jnp.float32),
                        pltpu.VMEM((G, Bt, W), jnp.float32)],
        interpret=interpret,
    )(E, E, Fpad, Fpad, ds, ds,
      d_last.reshape(Bn, nh), end, tp_scalar)


# ---------------------------------------------------------------------------
# A fused-emissions variant (computing emission rows inside forward/backward
# from the parameter packs, state-major (Bt, W) tiles, parity ping-pong
# carries) was built and measured on the real chip in round 3: it LOST to
# this three-kernel pipeline.  The kernels are op-latency-bound, not
# HBM-bound (~30 GB/s of 819), and the per-problem emission gather inside
# the serial diagonal recursion added Bt x ~15 dependent small-tile ops per
# diagonal, swamping the saved E round-trips.  The separate emissions kernel
# pipelines those gathers across independent (problem, diagonal) pairs.  The
# winning levers were: wide problem blocks (Bt up to 48; vector ops then
# span >= 6 vregs, hiding VPU op latency) and kd=8 blocks so the wide
# blocks still fit VMEM.  See git history for the fused implementation.
