"""Device-packed threeState alignment path: the production CLI fast route.

The round-3 bottleneck was the HOST, not the chip: per-problem numpy packing
(13 x lXp parameter rows rebuilt per job), a full (B, Dp, W) posterior-grid
download (~10 MB over a ~100 MB/s link with ~27 ms round trips), and serial
per-bucket syncs left the chip idle ~99.8% of the end-to-end CLI path
(VERDICT r3 weak #1).  This module moves both ends of the pipeline onto the
device, so per problem the host ships only the irreducible inputs and reads
back only the threshold-passing pairs:

  up:   flat VARIABLE-LENGTH buffers per bucket (the tunnel's real cost is
        per byte, ~30 MB/s for fresh host arrays): int16 rank codes, an
        int16 window stream at 1-2 words/diagonal, f32 reversed event rows,
        and tiny per-problem meta blocks — real bytes only, no padding;
  down: ONE globally-compacted (quantized prob, flat cell index) buffer per
        bucket sized by the bucket's real event count (pairs ~= 1/event),
        not per-problem worst-case slots.

On device (plain jnp feeding the unchanged Pallas kernels):
  * per-read model scaling (emissions_signal_scaleModel semantics,
    stateMachine.c:631-673) applied to rank-gathered rows of ONE shared
    stacked base-table upload (pore_model.scale_model provenance; problems
    of different base models share buckets via a per-problem table index);
  * the per-x parameter pack (pallas_pipeline._gauss_pack semantics);
  * the per-diagonal DS_* scalars from the window arrays;
  * posterior-pair extraction: threshold mask -> cumsum compaction into a
    fixed-capacity buffer, probabilities pre-quantized to int(p * 1e7)
    (PAIR_ALIGNMENT_PROB_1, pairwiseAligner.h:26) with the same f32
    arithmetic as the host extractor, so output is identical up to f32
    rounding at the threshold boundary (the device gathers f32 copies of
    the model tables and applies scale/Gauss packing in f32; the host
    scales in f64 and casts after, so a pair sitting exactly on the
    threshold or a quantized prob can differ by 1 ulp).

All dispatches are asynchronous: every bucket is queued before any result is
awaited, and device->host copies are started for all buckets before the
first is read, so the whole read set costs one tunnel round trip.

Reference analogue of the path as a whole: the per-read worker fan-out of
scripts/signalAlign.py:103-146 feeding getAlignedPairsUsingAnchors
(pairwiseAligner.c:1456), re-cut at split granularity for the TPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..constants import (KMER_SENTINEL, NUM_OF_KMERS, PAIR_ALIGNMENT_PROB_1)
from ..core.window import WindowBand
from ..models.state_machines import LOG_TENTH
from . import fb
from .align import AlignedPairs

NEG_INF = -1e30  # == ops.pallas_fb.NEG_INF
_ALLOWED_B = (1, 2, 4, 8, 16, 32, 64, 128)
_DQ = 256        # Dp quantization ladder step (bounds compiled shapes)
_NBASE = 4       # base-model slots per bucket (stacked table upload)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dp_ladder(d: int) -> int:
    """Quantized Dp: 256-multiples up to 1024, powers of two to 16384, then
    8192-multiples (an unsplit long read is one job — fine rungs there cost
    nothing in bucket count but save its padded sequential steps).  Coarse
    middle rungs merge jobs into FEW buckets: every extra bucket costs a
    dispatch and a share of the tunnel round trip, while padded diagonals
    only cost chip time."""
    if d <= 1024:
        return _round_up(max(d, _DQ), _DQ)
    if d <= 16384:
        p = 2048
        while p < d:
            p *= 2
        return p
    return _round_up(d, 8192)


def _bucket_kd(Dp: int) -> int:
    """Diagonals per grid step: kd=8 keeps VMEM free for wide Bt (24-48) on
    small-Dp batched buckets — the round-3 sweep's winner for the pipeline
    mix.  End-to-end read buckets are bound by the SEQUENTIAL grid-step
    count instead (B <= 32 caps Bt anyway), so mid rungs halve the steps
    with kd=16 (Bt still ~26 within the VMEM budget) and huge unsplit
    long-read rungs quarter them again with kd=32."""
    if Dp >= 8192:
        return 32
    if Dp >= 2048:
        return 16
    return 8


# ---------------------------------------------------------------------------
# Shared device-resident tables (uploaded once per model set / gapx vector)
# ---------------------------------------------------------------------------

_TABLE_CACHE: dict[tuple, tuple] = {}
_GAPX_CACHE: dict[int, tuple] = {}


def _dev_table_stack(bases: tuple):
    """(match (``_NBASE``, R, 5), y (``_NBASE``, R, 5)) device f32 stacks for
    up to _NBASE base PoreModels (padded by repeating the first)."""
    import jax.numpy as jnp

    key = tuple(id(b) for b in bases)
    hit = _TABLE_CACHE.get(key)
    if hit is not None and len(hit[0]) == len(bases) \
            and all(a is b for a, b in zip(hit[0], bases)):
        return hit[1], hit[2]
    pads = list(bases) + [bases[0]] * (_NBASE - len(bases))
    mt = jnp.asarray(np.stack([np.asarray(b.match_model, np.float32)
                               for b in pads]))
    yt = jnp.asarray(np.stack([np.asarray(b.y_model, np.float32)
                               for b in pads]))
    if len(_TABLE_CACHE) > 32:
        _TABLE_CACHE.clear()
    _TABLE_CACHE[key] = (tuple(bases), mt, yt)
    return mt, yt


def _dev_gapx(kmer_gap_probs):
    """Per-kmer gapX log-prob table (NUM_OF_KMERS + 2,) on device; sentinel
    rows NEG_INF (emissions_kmer_getGapProb sentinel -> LOG_ZERO)."""
    import jax.numpy as jnp

    key = id(kmer_gap_probs) if kmer_gap_probs is not None else 0
    hit = _GAPX_CACHE.get(key)
    if hit is not None and hit[0] is kmer_gap_probs:
        return hit[1]
    tab = np.full(NUM_OF_KMERS + 2, LOG_TENTH, dtype=np.float32)
    if kmer_gap_probs is not None:
        tab[:NUM_OF_KMERS] = np.maximum(kmer_gap_probs, NEG_INF)
    tab[NUM_OF_KMERS:] = NEG_INF
    dev = jnp.asarray(tab)
    if len(_GAPX_CACHE) > 64:
        _GAPX_CACHE.clear()
    _GAPX_CACHE[key] = (kmer_gap_probs, dev)
    return dev


# ---------------------------------------------------------------------------
# On-device packing (plain jnp in front of the unchanged Pallas kernels)
# ---------------------------------------------------------------------------

def _pack_xarr(mt, yt, gapx, bidx, xrank, scale8):
    """Device analogue of pallas_pipeline._gauss_pack on rank-gathered rows.

    mt/yt: (_NBASE, NUM_OF_KMERS + 2, 5) f32 base-table stacks; bidx (B,)
    selects each problem's base; xrank (B, lXp) int32 (slots outside the
    target carry KMER_SENTINEL -> all-zero rows -> sd == 0 -> NEG_INF
    emissions, identical to the host pack's defaults); scale8 (B, 8) f32 =
    (scale, shift, var, scale_sd, var_sd, apply_flag, 0, 0).  Gathering
    BEFORE scaling is exact: sentinel rows come out identical because the
    not-ok lanes are zeroed/NEG_INF'd either way."""
    import jax.numpy as jnp

    m = mt[bidx[:, None], xrank]            # (B, lXp, 5)
    y = yt[bidx[:, None], xrank]
    s = scale8[:, None, :]
    lm = m[..., 0] * s[..., 0] + s[..., 1]
    lsd = m[..., 1] * s[..., 2]
    nm = m[..., 2] * s[..., 3]
    nl = m[..., 4] * s[..., 4]
    nsd = jnp.where(nl > 0,
                    jnp.sqrt(jnp.maximum(nm, 0.0) ** 3
                             / jnp.where(nl > 0, nl, 1.0)), 0.0)
    ap = s[..., 5] > 0
    lm = jnp.where(ap, lm, m[..., 0])
    lsd = jnp.where(ap, lsd, m[..., 1])
    nm = jnp.where(ap, nm, m[..., 2])
    nsd = jnp.where(ap, nsd, m[..., 3])

    def pk3(mu, sd):
        ok = sd != 0.0
        safe = jnp.where(ok, sd, 1.0)
        inv = jnp.where(ok, 1.0 / safe, 0.0)
        logc = jnp.where(ok, -0.91893853320467267 - jnp.log(safe),
                         NEG_INF)
        return jnp.where(ok, mu, 0.0), inv, logc

    rows = (pk3(lm, lsd) + pk3(nm, nsd)
            + pk3(y[..., 0], y[..., 1]) + pk3(y[..., 2], y[..., 3]))
    gx = jnp.maximum(gapx[xrank], NEG_INF)
    return jnp.stack(list(rows) + [gx], axis=1)     # (B, 13, lXp) f32


def _pack_ds(win, lY, W, lXp, lYp):
    """Device analogue of pallas_pipeline._window_diag_scalars + x0/yr0.

    win (B, 3, Dp) int32 rows (w0, xmyL, xmyR), already padded past each
    problem's real D with stepping-w0 / empty-range rows (host side,
    vectorized).  All divisions are exact ((d +- w0) is even)."""
    import jax.numpy as jnp

    from ..ops import pallas_fb as pk

    w0 = win[:, 0, :]
    xl = win[:, 1, :]
    xr = win[:, 2, :]
    B, Dp = w0.shape
    z = jnp.zeros((B, 1), jnp.int32)
    fL = jnp.concatenate([z, (w0[:, 1:] - 1 - w0[:, :-1]) // 2], 1)
    fM = jnp.concatenate([z, z, (w0[:, 2:] - w0[:, :-2]) // 2], 1)
    bL = jnp.concatenate([(w0[:, :-1] + 1 - w0[:, 1:]) // 2, z], 1)
    bM = jnp.concatenate([(w0[:, :-2] - w0[:, 2:]) // 2, z, z], 1)
    d = jnp.arange(Dp, dtype=jnp.int32)[None, :]
    x_of = (d + w0) // 2
    y_of = (d - w0) // 2
    x0 = jnp.clip(x_of + W, 0, lXp - W)               # PADX == W
    yr0 = jnp.clip(lY[:, None] - y_of + W, 0, lYp - W)
    xs = jnp.concatenate([z, x0[:, 1:] - x0[:, :-1]], 1)
    lanes = [None] * 8
    lanes[pk.DS_FL], lanes[pk.DS_FM] = fL, fM
    lanes[pk.DS_BL], lanes[pk.DS_BM] = bL, bM
    lanes[pk.DS_W0], lanes[pk.DS_XMYL], lanes[pk.DS_XMYR] = w0, xl, xr
    lanes[pk.DS_XS] = xs
    ds = jnp.stack(lanes, axis=-1)                    # (B, Dp, 8)
    ds = jnp.concatenate([ds, ds[:, -1:, :]], axis=1)[:, :, None, :]
    x0 = jnp.concatenate([x0, z], 1)
    yr0 = jnp.concatenate([yr0, z], 1)
    return ds, x0, yr0


# ---------------------------------------------------------------------------
# Flat transport (round 5): the tunnel's real costs are per-BYTE, not per
# array (~30 MB/s fresh-numpy upload, ~12 MB/s fetch, measured in
# tools/decompose_wait.py), and the round-4 padded (B, n_int)/(B, n_flt)
# blocks shipped ~56 KB/problem of mostly padding while the fetch carried a
# worst-case K-slot pair buffer per problem.  Round 5 ships VARIABLE-LENGTH
# flat buffers (real bytes only) and unpacks them on device:
#
#   up:   flat int16 rank codes | flat int8 window encoding (w0 steps are
#         exactly +-1 per diagonal and the true band edges live within the
#         W-lane window, so (w0 delta, (xmyL-w0)/2, (xmyR-w0)/2) are 3 bytes
#         per diagonal) | flat f32 reversed event rows | tiny per-problem
#         meta blocks — ~4x fewer bytes than the padded blocks;
#   down: ONE globally-compacted pair buffer per bucket sized by the
#         bucket's real event count (pairs ~= 1 per event) instead of
#         B x (2 Dp) worst-case slots — ~3-4x fewer bytes.
# ---------------------------------------------------------------------------

_META_I = 12      # int32 meta lanes per problem (offsets/lengths/flags)
(MI_RANK_OFF, MI_RANK_LEN, MI_EV_OFF, MI_EV_LEN, MI_WIN_OFF, MI_WIN_D,
 MI_BASE, MI_W00, MI_REAL) = range(9)


def _flat_win_encode(wb: WindowBand) -> np.ndarray:
    """Per-diagonal window stream.  The constant-shift window contract makes
    every field small: w0 steps are exactly +-1 (core/window.py) and the
    true band lies inside the W-lane window so the halved edge offsets are
    in [0, W-1].  For W <= 128 that is 15 bits per diagonal — ONE int16
    word (step<<14 | uL<<7 | uR, the step bit of word 0 is unused); wider
    windows fall back to three int16 rows [w0 delta | uL | uR]."""
    w0 = np.asarray(wb.w0, dtype=np.int64)
    delta = np.diff(w0)
    uL = (np.asarray(wb.xmyL, dtype=np.int64) - w0) >> 1
    uR = (np.asarray(wb.xmyR, dtype=np.int64) - w0) >> 1
    assert len(delta) == 0 or (np.abs(delta) == 1).all()
    assert uL.min(initial=0) >= 0 and uR.max(initial=0) < wb.W
    D = len(w0)
    if wb.W <= 128:
        s = np.empty(D, dtype=np.int64)
        s[0] = 0
        s[1:] = (delta + 1) >> 1             # +-1 -> 1/0
        return ((s << 14) | (uL << 7) | uR).astype(np.int16)
    out = np.empty(3 * D, dtype=np.int16)
    out[0] = 0
    out[1:D] = delta
    out[D:2 * D] = uL
    out[2 * D:] = uR
    return out


def _unpack_win(meta_i, fw, W, Dp):
    """Device decode of the per-diagonal window stream into (B, 3, Dp)
    int32 (w0, xmyL, xmyR); rows past D get the stepping-w0 / empty-range
    padding (pad_window's rule)."""
    import jax.numpy as jnp

    dd = jnp.arange(Dp, dtype=jnp.int32)[None, :]
    D = meta_i[:, MI_WIN_D:MI_WIN_D + 1]
    wreal = dd < D
    woff = meta_i[:, MI_WIN_OFF:MI_WIN_OFF + 1]
    didx = jnp.clip(dd, 0, D - 1)
    if W <= 128:   # 1-word encoding: step<<14 | uL<<7 | uR
        word = fw[woff + didx]
        delta = jnp.where(wreal & (dd > 0), 2 * (word >> 14) - 1, 0)
        uL = (word >> 7) & 127
        uR = word & 127
    else:          # 3-row encoding
        delta = jnp.where(wreal, fw[woff + didx], 0)
        uL = fw[woff + D + didx]
        uR = fw[woff + 2 * D + didx]
    w0 = meta_i[:, MI_W00:MI_W00 + 1] + jnp.cumsum(delta, axis=1)
    w0 = w0 + jnp.where(wreal, 0, jnp.where((dd - D) % 2 == 0, 1, 0))
    xmyL = w0 + jnp.where(wreal, 2 * uL, 2 * 10**6)
    xmyR = w0 + jnp.where(wreal, 2 * uR, 0)
    return jnp.stack([w0, xmyL, xmyR], axis=1).astype(jnp.int32)


def _unpack_dev(meta_i, meta_f, flat_r, flat_w, flat_e, *, W, Dp, lXp, lYp,
                n_tp, S):
    """Device-side unpack of the flat transport into the padded per-problem
    arrays the pipeline consumes (identical values to the round-4 host-packed
    blocks, byte for byte)."""
    import jax.numpy as jnp

    B = meta_i.shape[0]
    fr = flat_r.astype(jnp.int32)
    fw = flat_w.astype(jnp.int32)

    # ranks: sentinel-filled (B, lXp) with the job's codes at [W, W+len)
    xa = jnp.arange(lXp, dtype=jnp.int32)[None, :] - W
    rlen = meta_i[:, MI_RANK_LEN:MI_RANK_LEN + 1]
    rok = (xa >= 0) & (xa < rlen)
    ridx = meta_i[:, MI_RANK_OFF:MI_RANK_OFF + 1] + jnp.clip(xa, 0, rlen - 1)
    xrank = jnp.where(rok, fr[ridx], KMER_SENTINEL)

    # events: zero-filled (B, 2, lYp) with reversed rows at [W, W+n)
    ya = jnp.arange(lYp, dtype=jnp.int32)[None, :] - W
    elen = meta_i[:, MI_EV_LEN:MI_EV_LEN + 1]
    eok = (ya >= 0) & (ya < elen)
    ebase = meta_i[:, MI_EV_OFF:MI_EV_OFF + 1] + jnp.clip(ya, 0, elen - 1)
    evm = jnp.where(eok, flat_e[ebase], 0.0)
    evn = jnp.where(eok, flat_e[ebase + elen], 0.0)
    evr = jnp.stack([evm, evn], axis=1)

    win = _unpack_win(meta_i, fw, W, Dp)

    lY = meta_i[:, MI_EV_LEN]
    d_last = meta_i[:, MI_WIN_D] - 1
    bidx = meta_i[:, MI_BASE]
    real = meta_i[:, MI_REAL] > 0
    scale8 = meta_f[:, :8]
    tps = meta_f[:, 8:8 + n_tp]
    start = meta_f[:, 8 + n_tp:8 + n_tp + S]
    end = meta_f[:, 8 + n_tp + S:8 + n_tp + 2 * S]
    return xrank, win, lY, d_last, bidx, evr, scale8, tps, start, end, real


_EXTRACT_L = 16   # per-diagonal slot cap of the two-stage compaction


def _extract_compact(p, threshold, K, L: int = _EXTRACT_L):
    """Threshold-passing cells, compacted on device in flat row-major (d, j)
    order (the host extractor's order): returns (count (B,), quantized probs
    (B, K) int32, flat cell indices (B, K) int32).  Quantization floor(p*1e7)
    runs in f32 exactly like the host's numpy expression.

    Two-stage: a TPU scatter costs ~proportional to its update count, and a
    one-shot scatter over the full (Dp * W) grid dominated the end-to-end
    path (~78 ms per large bucket).  Stage 1 compacts each diagonal's <= W
    lanes to at most L ordered slots with L cheap masked-min passes (match
    posteriors per diagonal sum to <= 1, so more than L = 16 cells above a
    1% threshold is rare); stage 2 scatters the (Dp * L) slot grid — W/L x
    less work.  A diagonal overflowing L slots makes the count K + 1, which
    the caller treats as capacity overflow (full-grid fallback)."""
    import jax
    import jax.numpy as jnp

    B, Dp, W = p.shape
    m = p >= np.float32(threshold)
    csl = jnp.cumsum(m.astype(jnp.int32), axis=2)
    cnt_d = csl[:, :, -1]                            # (B, Dp)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Dp, W), 2)
    slots = [jnp.min(jnp.where(m & (csl == s + 1), lane, W), axis=2)
             for s in range(L)]
    lane_idx = jnp.stack(slots, axis=2)              # (B, Dp, L)
    valid2 = (jnp.arange(L, dtype=jnp.int32)[None, None, :]
              < jnp.minimum(cnt_d, L)[:, :, None])
    flatL = (jnp.minimum(lane_idx, W - 1)
             + jnp.arange(Dp, dtype=jnp.int32)[None, :, None] * W)
    v2 = valid2.reshape(B, Dp * L)
    f2 = flatL.reshape(B, Dp * L)
    idx = jnp.cumsum(v2.astype(jnp.int32), axis=1) - 1
    total = idx[:, -1] + 1
    tgt = jnp.where(v2, idx, K)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    outi = jnp.zeros((B, K + 1), jnp.int32).at[rows, tgt].set(f2)[:, :K]
    pf = p.reshape(B, Dp * W)
    outq = jnp.floor(jnp.take_along_axis(pf, outi, axis=1)
                     * np.float32(PAIR_ALIGNMENT_PROB_1)).astype(jnp.int32)
    cnt = jnp.where((cnt_d > L).any(axis=1), K + 1, total)
    return cnt, outq, outi


def _extract_global(p, threshold, Kg, real, L: int = _EXTRACT_L):
    """Globally-compacted pair extraction: one (Kg,) slot buffer shared by
    the whole bucket instead of K worst-case slots per problem, so the fetch
    is sized by the bucket's REAL pair count (~1 per event).  Same two-stage
    compaction and (problem, diagonal, lane) output order as
    _extract_compact.  Returns (cnt (B,) per-problem pair counts,
    over (B,) per-diagonal slot-overflow flags, outq (Kg,) quantized probs,
    outi (Kg,) global flat indices problem*Dp*W + d*W + j).  A problem whose
    slots spill past Kg is detected on host (its cumsum extent crosses Kg)."""
    import jax
    import jax.numpy as jnp

    B, Dp, W = p.shape
    rmask = real[:, None, :] if real.ndim == 2 else real[:, None, None]
    m = (p >= np.float32(threshold)) & rmask
    csl = jnp.cumsum(m.astype(jnp.int32), axis=2)
    cnt_d = csl[:, :, -1]                            # (B, Dp)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Dp, W), 2)
    slots = [jnp.min(jnp.where(m & (csl == s + 1), lane, W), axis=2)
             for s in range(L)]
    lane_idx = jnp.stack(slots, axis=2)              # (B, Dp, L)
    valid2 = (jnp.arange(L, dtype=jnp.int32)[None, None, :]
              < jnp.minimum(cnt_d, L)[:, :, None])
    gflat = (jnp.minimum(lane_idx, W - 1)
             + jnp.arange(Dp, dtype=jnp.int32)[None, :, None] * W
             + (jnp.arange(B, dtype=jnp.int32) * (Dp * W))[:, None, None])
    v = valid2.reshape(B * Dp * L)
    f = gflat.reshape(B * Dp * L)
    idx = jnp.cumsum(v.astype(jnp.int32)) - 1
    tgt = jnp.where(v, jnp.minimum(idx, Kg), Kg)
    outi = jnp.zeros(Kg + 1, jnp.int32).at[tgt].set(f)[:Kg]
    outq = jnp.floor(jnp.take(p.reshape(-1), outi)
                     * np.float32(PAIR_ALIGNMENT_PROB_1)).astype(jnp.int32)
    cnt = jnp.sum(jnp.minimum(cnt_d, L), axis=1)
    over = (cnt_d > L).any(axis=1).astype(jnp.int32)
    return cnt, over, outq, outi


@lru_cache(maxsize=256)
def _bucket_fn_flat(plan, W, Dp, lXp, lYp, B, Kg, n_tp, S, threshold,
                    interpret, paired=False):
    """Round-5 compiled pipeline over the flat transport: device unpack ->
    device packing -> emissions -> forward -> fused backward (stages=3) ->
    globally-compacted pair extraction -> one small int32 output block.

    ``paired``: the metas describe 2*B HW=W//2-lane problems; pairs
    (2i, 2i+1) run half-packed in one W-lane kernel row
    (pallas_pipeline.run_sm3_pallas_paired) — the lane-occupancy lever for
    the dominant narrow-band jobs (true bands 24-45 wide under default
    expansion)."""
    import jax

    from . import pallas_pipeline as pp

    kd = 2 if interpret else _bucket_kd(Dp)
    HW = W // 2 if paired else W

    def run(mt, yt, gapx, meta_i, meta_f, flat_r, flat_w, flat_e):
        import jax.numpy as jnp

        (xrank, win, lY, d_last, bidx, evr, scale8, tps, start, end,
         real) = _unpack_dev(meta_i, meta_f, flat_r, flat_w, flat_e,
                             W=HW, Dp=Dp, lXp=lXp, lYp=lYp, n_tp=n_tp, S=S)
        xarr = _pack_xarr(mt, yt, gapx, bidx, xrank, scale8)
        ds, x0, yr0 = _pack_ds(win, lY, HW, lXp, lYp)
        prob = pp.SM3PallasProblem(
            xarr=xarr, evr=evr, x0=x0, yr0=yr0, diag_scalars=ds,
            d_last=d_last, start=start, end=end, tp_scalar=tps, xrank=xrank)
        if paired:
            p, _totals = pp.run_sm3_pallas_paired(plan, HW, prob,
                                                  interpret=interpret, kd=kd)
            lane = jnp.arange(W, dtype=jnp.int32)[None, :]
            rl = jnp.where(lane < HW, real[0::2, None], real[1::2, None])
            cnt, over, outq, outi = _extract_global(p, threshold, Kg, rl)
        else:
            p, _totals, *_rest = pp.run_sm3_pallas(plan, W, prob, stages=3,
                                                   interpret=interpret, kd=kd)
            cnt, over, outq, outi = _extract_global(p, threshold, Kg, real)
        return jnp.concatenate([cnt, over, outq, outi])

    return run if interpret else jax.jit(run)


@lru_cache(maxsize=256)
def _bucket_fn(plan, W, Dp, lXp, lYp, B, K, n_tp, S, threshold, interpret):
    """One compiled pipeline: unpack the two input blocks -> device packing
    -> emissions -> forward -> fused backward (stages=3) -> compact pair
    extraction -> one packed int32 output block."""
    import jax

    from . import pallas_pipeline as pp

    kd = _bucket_kd(Dp)

    def run(mt, yt, gapx, ints, flts):
        import jax.numpy as jnp

        # ints (B, lXp + 3*Dp + 3): [xrank | win | lY, d_last, base_idx]
        # flts (B, 2*lYp + 8 + n_tp + 2*S): [evr | scale8 | tps | start | end]
        xrank = ints[:, :lXp]
        win = ints[:, lXp:lXp + 3 * Dp].reshape(-1, 3, Dp)
        lY = ints[:, lXp + 3 * Dp]
        d_last = ints[:, lXp + 3 * Dp + 1]
        bidx = ints[:, lXp + 3 * Dp + 2]
        evr = flts[:, :2 * lYp].reshape(-1, 2, lYp)
        o = 2 * lYp
        scale8 = flts[:, o:o + 8]
        tps = flts[:, o + 8:o + 8 + n_tp]
        start = flts[:, o + 8 + n_tp:o + 8 + n_tp + S]
        end = flts[:, o + 8 + n_tp + S:o + 8 + n_tp + 2 * S]

        xarr = _pack_xarr(mt, yt, gapx, bidx, xrank, scale8)
        ds, x0, yr0 = _pack_ds(win, lY, W, lXp, lYp)
        prob = pp.SM3PallasProblem(
            xarr=xarr, evr=evr, x0=x0, yr0=yr0, diag_scalars=ds,
            d_last=d_last, start=start, end=end, tp_scalar=tps, xrank=xrank)
        p, _totals, *_rest = pp.run_sm3_pallas(plan, W, prob, stages=3,
                                               interpret=interpret, kd=kd)
        cnt, outq, outi = _extract_compact(p, threshold, K)
        # ONE output array per bucket: each host fetch costs a tunnel trip
        return jnp.concatenate([cnt[:, None], outq, outi], axis=1)

    return run if interpret else jax.jit(run)


# ---------------------------------------------------------------------------
# Host staging
# ---------------------------------------------------------------------------

def pad_window(wb: WindowBand, Dp: int):
    """(3, Dp) int32 (w0, xmyL, xmyR) padded past D with stepping-w0 rows
    whose xmy range is empty (the host _window_diag_scalars padding rule,
    vectorized)."""
    D = wb.n_diagonals
    out = np.empty((3, Dp), dtype=np.int32)
    out[0, :D] = wb.w0
    out[1, :D] = wb.xmyL
    out[2, :D] = wb.xmyR
    if Dp > D:
        i = np.arange(Dp - D)
        w0p = wb.w0[D - 1] + np.where(i % 2 == 0, 1, 0)
        out[0, D:] = w0p
        out[1, D:] = w0p + 2 * 10**6     # empty range: xmyL > xmyR
        out[2, D:] = w0p
    return out


@dataclass
class _FastJob:
    """Staged inputs of one packable (threeState) split job."""

    base: object             # PoreModel whose device tables to use
    scale8: np.ndarray       # (8,) f32
    gapx_key: object         # kmer_gap_probs identity (for grouping)
    gapx: object             # the array itself (or None)
    ranks: np.ndarray        # (lX + 1,) int32 incl. x = -1 sentinel slot
    events: np.ndarray       # (lY, >= 2) f64
    wband: WindowBand
    tp_scalar: np.ndarray    # (n,) f32
    start: np.ndarray        # (S,) f32
    end: np.ndarray          # (S,) f32
    off_x: int
    off_y: int


def stage_fast_job(job, wband: WindowBand):
    """SplitJob -> (_FastJob, plan), or None when the machine has no sm3
    pack (those take the generic host-packed window path)."""
    pack = getattr(job.sm, "sm3_pack", None)
    if pack is None:
        return None
    from .pallas_pipeline import _san

    pore, _target, events, _transitions, kmer_gap_probs = pack
    plan, tp_scalar, cell_sources = fb._build_plan(job.sm, "exact")
    assert not cell_sources
    prov = getattr(pore, "scale_provenance", None)
    if prov is not None:
        base, (sc, sh, va, ssd, vsd) = prov
        scale8 = np.array([sc, sh, va, ssd, vsd, 1.0, 0.0, 0.0],
                          dtype=np.float32)
    else:
        base = pore
        scale8 = np.array([1, 0, 1, 1, 1, 0, 0, 0], dtype=np.float32)
    sm = job.sm
    return _FastJob(
        base=base, scale8=scale8,
        gapx_key=id(kmer_gap_probs) if kmer_gap_probs is not None else 0,
        gapx=kmer_gap_probs,
        ranks=np.asarray(sm.kmer_ranks, dtype=np.int32),
        events=np.asarray(events),
        wband=wband,
        tp_scalar=_san(tp_scalar),
        start=_san(sm.ragged_start if job.ragged_left else sm.start),
        end=_san(sm.ragged_end if job.ragged_right else sm.end),
        off_x=job.off_x, off_y=job.off_y), plan


def _chunk_sizes(n: int, Dp: int = 256) -> list[int]:
    """Greedy decomposition of n into allowed batch sizes; the final chunk is
    padded up to the smallest allowed size that fits.  The chunk cap shrinks
    as Dp grows so a bucket's device footprint (E/F grids + extraction
    temporaries, ~7 KB per diagonal per problem) stays well inside HBM."""
    big = _ALLOWED_B[-1]
    while big > 1 and big * Dp > 512 * 1024:
        big //= 2
    out = []
    for s in sorted((b for b in _ALLOWED_B if b <= big), reverse=True):
        while n >= s:
            out.append(s)
            n -= s
    if n > 0:
        out.append(next(b for b in _ALLOWED_B if b >= n))
    return out



def _call_retry(fn, *args):
    """Invoke a jitted bucket fn, retrying once on transient tunnel
    failures (the axon remote-compile HTTP stream occasionally drops
    mid-transfer; the retry recompiles/reuses the cache and succeeds)."""
    try:
        return fn(*args)
    except Exception as exc:          # jax.errors.JaxRuntimeError etc.
        msg = str(exc)
        if "remote_compile" not in msg and "INTERNAL" not in msg:
            raise
        import time as _t

        _t.sleep(1.0)
        return fn(*args)


def _collect_packed(handles, interpret):
    """ONE device->host fetch for all pending buckets: every per-bucket
    fetch pays a full tunnel round trip (~27 ms) even with
    copy_to_host_async, so the packed outputs are concatenated on device
    and split on host."""
    if len(handles) > 1 and not interpret:
        import jax.numpy as jnp

        combined = np.asarray(jnp.concatenate([h.ravel() for h in handles]))
        out = []
        off = 0
        for handle in handles:
            n = handle.size
            out.append(combined[off:off + n].reshape(handle.shape))
            off += n
        return out
    return [np.asarray(h) for h in handles]


def _decode_global(packed, chunk, staged, W, Dp, Kg, out):
    """Pair decode from a bucket's globally-compacted block
    [cnt (B,) | over (B,) | outq (Kg,) | outi (Kg,)]: per-problem extents
    from the count cumsum; a diagonal-slot overflow or an extent crossing Kg
    marks that problem for the full-grid fallback."""
    # the device block was built for the padded problem count; metas carry
    # real flags so padded rows contribute cnt == 0
    nB = (len(packed) - 2 * Kg) // 2
    cnt = packed[:nB]
    over = packed[nB:2 * nB]
    outq = packed[2 * nB:2 * nB + Kg]
    outi = packed[2 * nB + Kg:]
    ends = np.cumsum(cnt)
    starts = ends - cnt
    for bi, si in enumerate(chunk):
        ji, job, _plan = staged[si]
        if over[bi] or ends[bi] > Kg:
            out[ji] = None
            continue
        gi = outi[starts[bi]:ends[bi]].astype(np.int64) - bi * (Dp * W)
        d = gi // W
        j = gi - d * W
        w0 = np.asarray(job.wband.w0, dtype=np.int64)
        w0d = w0[np.minimum(d, len(w0) - 1)]
        xmy = w0d + 2 * j
        x = (d + xmy) >> 1
        y = (d - xmy) >> 1
        out[ji] = AlignedPairs(outq[starts[bi]:ends[bi]].astype(np.int64),
                               x - 1 + job.off_x, y - 1 + job.off_y)


def _decode_global_paired(packed, chunk, staged, W, Dp, Kg, out):
    """Paired-bucket decode: packed row bi carries chunk[2*bi] in lanes
    [0, W/2) and chunk[2*bi + 1] in lanes [W/2, W); an odd chunk's last row
    has a dummy second half (masked out on device)."""
    HW = W // 2
    nB = (len(packed) - 2 * Kg) // 2
    cnt = packed[:nB]
    over = packed[nB:2 * nB]
    outq = packed[2 * nB:2 * nB + Kg]
    outi = packed[2 * nB + Kg:]
    ends = np.cumsum(cnt)
    starts = ends - cnt
    for bi in range(nB):
        members = chunk[2 * bi:2 * bi + 2]
        if not members:
            continue
        bad = over[bi] or ends[bi] > Kg
        gi = outi[starts[bi]:ends[bi]].astype(np.int64) - bi * (Dp * W)
        q = outq[starts[bi]:ends[bi]].astype(np.int64)
        d_all = gi // W
        j_all = gi - d_all * W
        for half, si in enumerate(members):
            ji, job, _plan = staged[si]
            if bad:
                out[ji] = None
                continue
            sel = (j_all // HW) == half
            d = d_all[sel]
            j = j_all[sel] - half * HW
            w0 = np.asarray(job.wband.w0, dtype=np.int64)
            w0d = w0[np.minimum(d, len(w0) - 1)]
            xmy = w0d + 2 * j
            x = (d + xmy) >> 1
            y = (d - xmy) >> 1
            out[ji] = AlignedPairs(q[sel], x - 1 + job.off_x,
                                   y - 1 + job.off_y)


def _decode_packed(packed, chunk, staged, W, Dp, K, out):
    """Per-job pair decode from a bucket's packed block: flat cell index ->
    (x, y) via the job's window left edges; count > K marks capacity
    overflow (full-grid fallback)."""
    cnt = packed[:, 0]
    outq = packed[:, 1:1 + K]
    outi = packed[:, 1 + K:]
    for bi, si in enumerate(chunk):
        ji, job, _plan = staged[si]
        n = int(cnt[bi])
        if n > K:
            out[ji] = None
            continue
        fi = outi[bi, :n].astype(np.int64)
        d = fi // W
        j = fi - d * W
        w0 = pad_window(job.wband, Dp)[0].astype(np.int64)
        xmy = w0[d] + 2 * j
        x = (d + xmy) >> 1
        y = (d - xmy) >> 1
        out[ji] = AlignedPairs(outq[bi, :n].astype(np.int64),
                               x - 1 + job.off_x, y - 1 + job.off_y)


def dispatch_fast_jobs(staged: list[tuple[int, "_FastJob", object]],
                       threshold: float, *, interpret: bool) -> list:
    """Group + stage + asynchronously dispatch all staged jobs; returns the
    pending list for collect_fast_jobs.  Dispatching without collecting is
    the streaming overlap hook: the tunnel uploads and the chip computes
    while the host preps the next wave of reads
    (engine.batch_align.batch_align_stream)."""
    from ..ops import pallas_fb as pk

    groups: dict[tuple, list[int]] = {}
    for si, (ji, fj, plan) in enumerate(staged):
        W = fj.wband.W
        # Dp ladder; lXp/lYp tied to Dp (lx, ly <= D <= Dp) so jobs of any
        # length share buckets.  Problems of different base models / strands
        # share buckets via the stacked-table index; only the gapx table
        # splits a group.  W=64 jobs (virtually all split jobs under default
        # expansion) run half-packed, two per kernel row — those pairs share
        # one tp_scalar, so the transition vector joins their key.
        paired = W == 64
        key = (plan, W, _dp_ladder(fj.wband.n_diagonals + 2), fj.gapx_key,
               fj.tp_scalar.tobytes() if paired else None)
        groups.setdefault(key, []).append(si)

    pending = []   # (staged, chunk, handle, kernel W, Dp, Kg, paired)
    for key, sidx in groups.items():
        plan, W, Dpq, _gk, _tpb = key
        paired = W == 64
        spu = 2 if paired else 1     # staged jobs per kernel row
        Wk = 128 if paired else W    # kernel lane width
        Dp = _round_up(Dpq, pk.KD)
        lXp = _round_up(Dp + 1 + 2 * W + 2 * 128, 128)
        lYp = lXp
        # base-model slots for this group (split if > _NBASE distinct)
        subgroups: list[tuple[list, list]] = []   # (bases, staged-indices)
        for si in sidx:
            fj = staged[si][1]
            if not subgroups or len(subgroups[-1][0]) >= _NBASE and \
                    id(fj.base) not in {id(b) for b in subgroups[-1][0]}:
                subgroups.append(([], []))
            bases, members = subgroups[-1]
            if id(fj.base) not in {id(b) for b in bases}:
                bases.append(fj.base)
            members.append(si)
        for bases, members in subgroups:
            mt, yt = _dev_table_stack(tuple(bases))
            base_slot = {id(b): i for i, b in enumerate(bases)}
            gapx = _dev_gapx(staged[members[0]][1].gapx)
            fj0 = staged[members[0]][1]
            n_tp = len(fj0.tp_scalar)
            S = len(fj0.start)
            pos = 0
            for Bu in _chunk_sizes(-(-len(members) // spu), Dp):
                B = Bu * spu                 # meta rows (jobs incl. dummies)
                chunk = members[pos:pos + B]
                pos += len(chunk)
                idxs = chunk + [chunk[-1]] * (B - len(chunk))
                meta_i = np.zeros((B, _META_I), dtype=np.int32)
                meta_f = np.zeros((B, 8 + n_tp + 2 * S), dtype=np.float32)
                ranks_l, win_l, ev_l = [], [], []
                ro = wo = eo = 0
                sum_ev = 0
                for bi, si in enumerate(idxs):
                    fj = staged[si][1]
                    r = fj.ranks
                    ev = fj.events
                    D = fj.wband.n_diagonals
                    real = bi < len(chunk)
                    meta_i[bi] = 0
                    meta_i[bi, MI_RANK_OFF] = ro
                    meta_i[bi, MI_RANK_LEN] = len(r)
                    meta_i[bi, MI_EV_OFF] = eo
                    meta_i[bi, MI_EV_LEN] = len(ev)
                    meta_i[bi, MI_WIN_OFF] = wo
                    meta_i[bi, MI_WIN_D] = D
                    meta_i[bi, MI_BASE] = base_slot[id(fj.base)]
                    meta_i[bi, MI_W00] = int(fj.wband.w0[0])
                    meta_i[bi, MI_REAL] = 1 if real else 0
                    if real:
                        wenc = _flat_win_encode(fj.wband)
                        ranks_l.append(r.astype(np.int16))
                        win_l.append(wenc)
                        ev_l.append(np.concatenate(
                            [ev[::-1, 0], ev[::-1, 1]]).astype(np.float32))
                        ro += len(r)
                        wo += len(wenc)
                        eo += 2 * len(ev)
                        sum_ev += len(ev)
                    else:
                        # dummy rows reuse the previous job's segments
                        wlen = D if W <= 128 else 3 * D
                        meta_i[bi, MI_RANK_OFF] = ro - len(r)
                        meta_i[bi, MI_EV_OFF] = eo - 2 * len(ev)
                        meta_i[bi, MI_WIN_OFF] = wo - wlen
                    meta_f[bi, :8] = fj.scale8
                    meta_f[bi, 8:8 + n_tp] = fj.tp_scalar
                    meta_f[bi, 8 + n_tp:8 + n_tp + S] = fj.start
                    meta_f[bi, 8 + n_tp + S:] = fj.end

                def flat(parts, dtype, quantum=2048):
                    n = sum(len(p) for p in parts)
                    buf = np.zeros(_round_up(max(n, 1), quantum), dtype=dtype)
                    if n:
                        np.concatenate(parts, out=buf[:n])
                    return buf

                flat_r = flat(ranks_l, np.int16)
                flat_w = flat(win_l, np.int16)
                flat_e = flat(ev_l, np.float32)
                # pair capacity ~1 per event observed; 1.2x + slack, with
                # the full-grid fallback catching the (rare) spill
                Kg = _round_up(sum_ev + sum_ev // 5 + 512, 2048)
                fn = _bucket_fn_flat(plan, Wk, Dp, lXp, lYp, Bu, Kg, n_tp, S,
                                     float(threshold), interpret, paired)
                handle = _call_retry(fn, mt, yt, gapx, meta_i, meta_f,
                                     flat_r, flat_w, flat_e)
                pending.append((staged, chunk, handle, Wk, Dp, Kg, paired))
    return pending


def collect_fast_jobs(pending: list, *, interpret: bool,
                      timing: dict | None = None) -> dict[int, tuple]:
    """Single-fetch collection + host decode of any number of dispatched
    waves (their pending lists concatenated)."""
    import time as _time

    tw = _time.perf_counter()
    packed_of = _collect_packed([p[2] for p in pending], interpret)
    t_wait = _time.perf_counter() - tw

    out: dict[int, tuple] = {}
    for (staged, chunk, _handle, W, Dp, Kg, paired), packed in zip(
            pending, packed_of):
        if paired:
            _decode_global_paired(packed, chunk, staged, W, Dp, Kg, out)
        else:
            _decode_global(packed, chunk, staged, W, Dp, Kg, out)
    if timing is not None:
        t2 = _time.perf_counter()
        timing["device_wait"] = timing.get("device_wait", 0.0) + t_wait
        timing["host_extract"] = timing.get("host_extract", 0.0) \
            + (t2 - tw - t_wait)
    return out


def run_fast_jobs(staged: list[tuple[int, "_FastJob", object]],
                  threshold: float, *, interpret: bool,
                  timing: dict | None = None) -> dict[int, tuple]:
    """Dispatch all staged jobs (list of (job_index, _FastJob, plan)),
    grouped+chunked, entirely asynchronously; then collect and extract.

    Returns {job_index: AlignedPairs} with overflowed jobs (count > capacity)
    mapped to None — the caller re-routes those through the full-grid path.
    ``timing``, if given, receives {'host_pack': s, 'device_wait': s,
    'host_extract': s} (the bench's host/device breakdown)."""
    import time as _time

    t0 = _time.perf_counter()
    pending = dispatch_fast_jobs(staged, threshold, interpret=interpret)
    if timing is not None:
        timing["host_pack"] = timing.get("host_pack", 0.0) \
            + (_time.perf_counter() - t0)
    return collect_fast_jobs(pending, interpret=interpret, timing=timing)


# ---------------------------------------------------------------------------
# Symbol-machine (fiveState nucleotide) fast lane
# ---------------------------------------------------------------------------
# The cPecanRealign path's machines emit from tiny symbol tables (5x5 match,
# 5 gap rows, stateMachine.c:60-194), so E is a pure gather of the per-cell
# (sym_x, sym_y) codes — built on device from two small int arrays instead
# of a host-packed (Dp, 3, W) grid, with the same compact pair extraction
# and single-fetch collection as the threeState lane.

@dataclass
class _SymJob:
    tab_key: bytes           # tables content hash (grouping)
    match_t: np.ndarray      # (5, 5) f32
    gapx_t: np.ndarray       # (5,) f32
    gapy_t: np.ndarray       # (5,) f32
    cx: np.ndarray           # (lX + 1,) int32 codes incl. x = -1 sentinel
    cy: np.ndarray           # (lY + 1,) int32
    wband: WindowBand
    tp_scalar: np.ndarray
    start: np.ndarray
    end: np.ndarray
    off_x: int
    off_y: int


def stage_symbol_job(job, wband: WindowBand):
    """SplitJob with a bound symbol machine -> (_SymJob, plan), else None."""
    sm = job.sm
    codes = getattr(sm, "symbol_codes", None)
    tables = getattr(sm, "symbol_tables", None)
    if codes is None or tables is None:
        return None
    from .pallas_pipeline import _san

    plan, tp_scalar, cell_sources = fb._build_plan(sm, "exact")
    if cell_sources:
        return None
    match, gapx, gapy = tables
    mt = _san(match)
    gx = _san(gapx)
    gy = _san(gapy)
    key = mt.tobytes() + gx.tobytes() + gy.tobytes()
    cx, cy = codes
    return _SymJob(
        tab_key=key, match_t=mt, gapx_t=gx, gapy_t=gy,
        cx=np.asarray(cx, dtype=np.int32), cy=np.asarray(cy, dtype=np.int32),
        wband=wband, tp_scalar=_san(tp_scalar),
        start=_san(sm.ragged_start if job.ragged_left else sm.start),
        end=_san(sm.ragged_end if job.ragged_right else sm.end),
        off_x=job.off_x, off_y=job.off_y), plan


@lru_cache(maxsize=256)
def _sym_bucket_fn_flat(plan, W, Dp, Lc, Bu, Kg, n_tp, S, threshold,
                        interpret, paired):
    """Symbol-lane flat-transport pipeline: device unpack of int8 symbol
    codes + the window stream -> on-device E gather from the tiny tables ->
    forward/backward (half-packed when ``paired``) -> globally-compacted
    pair extraction.  ``W`` is the kernel lane width; per-problem windows
    are W//2 lanes when paired."""
    import jax

    from . import pallas_pipeline as pp
    from ..ops import pallas_fb as pk

    kd = _bucket_kd(Dp)
    HW = W // 2 if paired else W

    def run(mt, gx, gy, meta_i, meta_f, flat_c, flat_w):
        import jax.numpy as jnp

        fc = flat_c.astype(jnp.int32)
        fw = flat_w.astype(jnp.int32)
        # codes: sentinel-4-filled (B2, Lc) for each side
        la = jnp.arange(Lc, dtype=jnp.int32)[None, :]
        cxl = meta_i[:, MI_RANK_LEN:MI_RANK_LEN + 1]
        cxp = jnp.where((la < cxl),
                        fc[meta_i[:, MI_RANK_OFF:MI_RANK_OFF + 1]
                           + jnp.clip(la, 0, cxl - 1)], 4)
        cyl = meta_i[:, MI_EV_LEN:MI_EV_LEN + 1]
        cyp = jnp.where((la < cyl),
                        fc[meta_i[:, MI_EV_OFF:MI_EV_OFF + 1]
                           + jnp.clip(la, 0, cyl - 1)], 4)
        win = _unpack_win(meta_i, fw, HW, Dp)
        lY = meta_i[:, MI_EV_LEN] - 1
        d_last = meta_i[:, MI_WIN_D] - 1
        real = meta_i[:, MI_REAL] > 0
        tps = meta_f[:, :n_tp]
        start = meta_f[:, n_tp:n_tp + S]
        end = meta_f[:, n_tp + S:n_tp + 2 * S]

        Lq = Dp + 2 * HW + 128
        ds, _x0, _yr0 = _pack_ds(win, lY, HW, Lq, Lq)
        w0 = win[:, 0, :]
        d = jnp.arange(Dp, dtype=jnp.int32)[None, :, None]
        j = jnp.arange(HW, dtype=jnp.int32)[None, None, :]
        xmy = w0[:, :, None] + 2 * j
        x = (d + xmy) // 2
        y = (d - xmy) // 2
        rows = jnp.arange(cxp.shape[0], dtype=jnp.int32)[:, None, None]
        ix = cxp[rows, jnp.clip(x, 0, Lc - 1)]
        iy = cyp[rows, jnp.clip(y, 0, Lc - 1)]
        live = d <= d_last[:, None, None]
        z = jnp.float32(0.0)
        chans = [jnp.where(live, gx[ix], z),
                 jnp.where(live, mt[ix, iy], z),
                 jnp.where(live, gy[iy], z)]    # class order gapx/match/gapy
        E = jnp.stack(chans, axis=2)
        E = jnp.concatenate(
            [E, jnp.zeros((E.shape[0], kd, 3, HW), jnp.float32)], axis=1)
        if paired:
            p, _tot = pp.run_window_pallas_paired(
                plan, HW, E, ds, d_last, start, end, tps,
                interpret=interpret, kd=kd)
            lane = jnp.arange(W, dtype=jnp.int32)[None, :]
            rl = jnp.where(lane < HW, real[0::2, None], real[1::2, None])
            cnt, over, outq, outi = _extract_global(p, threshold, Kg, rl)
        else:
            prob = pp.WindowPallasProblem(
                E=E, diag_scalars=ds, d_last=d_last, start=start, end=end,
                tp_scalar=tps, x0=_x0)
            p, _tot = pp.run_window_pallas(plan, W, prob, stages=3,
                                           interpret=interpret, kd=kd)
            cnt, over, outq, outi = _extract_global(p, threshold, Kg, real)
        return jnp.concatenate([cnt, over, outq, outi])

    return run if interpret else jax.jit(run)


def run_symbol_jobs(staged: list[tuple[int, "_SymJob", object]],
                    threshold: float, *, interpret: bool) -> dict[int, tuple]:
    """Symbol-lane analogue of run_fast_jobs (round-5 flat transport):
    int8 code streams + the 1-word window stream up, one globally-compacted
    pair buffer down; W=64 jobs run half-packed (two per kernel vreg row,
    grouped by identical tables + transition vector)."""
    import jax.numpy as jnp

    groups: dict[tuple, list[int]] = {}
    for si, (ji, sj, plan) in enumerate(staged):
        W = sj.wband.W
        paired = W == 64
        key = (plan, W, _dp_ladder(sj.wband.n_diagonals + 2), sj.tab_key,
               sj.tp_scalar.tobytes() if paired else None)
        groups.setdefault(key, []).append(si)

    pending = []
    for key, sidx in groups.items():
        plan, W, Dpq, _tk, _tpb = key
        paired = W == 64
        spu = 2 if paired else 1
        Wk = 128 if paired else W
        Dp = _round_up(Dpq, 32)       # all _bucket_kd rungs divide 32
        Lc = Dp + 2
        sj0 = staged[sidx[0]][1]
        mt = jnp.asarray(sj0.match_t)
        gx = jnp.asarray(sj0.gapx_t)
        gy = jnp.asarray(sj0.gapy_t)
        n_tp = len(sj0.tp_scalar)
        S = len(sj0.start)
        pos = 0
        for Bu in _chunk_sizes(-(-len(sidx) // spu), Dp):
            B = Bu * spu
            chunk = sidx[pos:pos + B]
            pos += len(chunk)
            idxs = chunk + [chunk[-1]] * (B - len(chunk))
            meta_i = np.zeros((B, _META_I), dtype=np.int32)
            meta_f = np.zeros((B, n_tp + 2 * S), dtype=np.float32)
            codes_l, win_l = [], []
            co = wo = 0
            sum_ev = 0
            for bi, si in enumerate(idxs):
                sj = staged[si][1]
                D = sj.wband.n_diagonals
                real = bi < len(chunk)
                meta_i[bi, MI_RANK_OFF] = co
                meta_i[bi, MI_RANK_LEN] = len(sj.cx)
                meta_i[bi, MI_EV_OFF] = co + len(sj.cx)
                meta_i[bi, MI_EV_LEN] = len(sj.cy)
                meta_i[bi, MI_WIN_OFF] = wo
                meta_i[bi, MI_WIN_D] = D
                meta_i[bi, MI_W00] = int(sj.wband.w0[0])
                meta_i[bi, MI_REAL] = 1 if real else 0
                if real:
                    wenc = _flat_win_encode(sj.wband)
                    codes_l.append(sj.cx.astype(np.int8))
                    codes_l.append(sj.cy.astype(np.int8))
                    win_l.append(wenc)
                    co += len(sj.cx) + len(sj.cy)
                    wo += len(wenc)
                    sum_ev += len(sj.cy)
                else:
                    meta_i[bi, MI_RANK_OFF] = co - len(sj.cx) - len(sj.cy)
                    meta_i[bi, MI_EV_OFF] = co - len(sj.cy)
                    meta_i[bi, MI_WIN_OFF] = \
                        wo - (D if sj.wband.W <= 128 else 3 * D)
                meta_f[bi, :n_tp] = sj.tp_scalar
                meta_f[bi, n_tp:n_tp + S] = sj.start
                meta_f[bi, n_tp + S:] = sj.end

            def flat(parts, dtype, quantum=2048):
                n = sum(len(pp_) for pp_ in parts)
                buf = np.zeros(_round_up(max(n, 1), quantum), dtype=dtype)
                if n:
                    np.concatenate(parts, out=buf[:n])
                return buf

            flat_c = flat(codes_l, np.int8)
            flat_w = flat(win_l, np.int16)
            # nucleotide posteriors spread more mass off-diagonal than the
            # signal lane -> roomier pair capacity (overflow falls back)
            Kg = _round_up(2 * sum_ev + 512, 2048)
            fn = _sym_bucket_fn_flat(plan, Wk, Dp, Lc, Bu, Kg, n_tp, S,
                                     float(threshold), interpret, paired)
            handle = _call_retry(fn, mt, gx, gy, meta_i, meta_f, flat_c,
                                 flat_w)
            pending.append((chunk, handle, Wk, Dp, Kg, paired))

    packed_of = _collect_packed([p[1] for p in pending], interpret)
    out: dict[int, tuple] = {}
    for (chunk, _handle, W, Dp, Kg, paired), packed in zip(pending,
                                                           packed_of):
        if paired:
            _decode_global_paired(packed, chunk, staged, W, Dp, Kg, out)
        else:
            _decode_global(packed, chunk, staged, W, Dp, Kg, out)
    return out
