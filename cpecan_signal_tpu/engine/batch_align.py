"""Device-batched alignment: stacked split jobs through the Pallas window path.

The CLIs collect SplitJobs (reads x strands x splits, engine/align.py), this
module buckets them by (machine, window width), stacks each bucket into one
device batch, runs forward + fused backward on device, and returns
threshold-passing aligned pairs per job — so `signal_align` / `vanilla_align`
drive the chip with real batches instead of per-strand serial scans
(reference analogue: the per-read worker fan-out of
scripts/signalAlign.py:103-146, re-cut at split granularity for the TPU).

threeState jobs ride the device-packed fast route (engine/readpath.py):
per-problem packing AND pair extraction run on device, the host ships only
ranks/events/window geometry and reads back compacted pairs, and every
bucket is dispatched before any result is awaited (one tunnel round trip for
the whole read set).  Machines with per-cell transitions or table emissions
(vanilla/echelon/HDP) use the generic host-packed window path.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

from ..core.window import smooth_band
from . import readpath
from .align import AlignedPairs, SplitJob, _extract_pairs
from .window import window_grids

MAX_BUCKET = 64  # generic-path problems per device dispatch (bounds host E)


@lru_cache(maxsize=64)
def _jit_runner(plan, W):
    import jax

    from . import pallas_pipeline as pp

    return jax.jit(partial(pp.run_window_pallas, plan, W))


@lru_cache(maxsize=64)
def _jit_multi_runner(plan, W, pstates):
    import jax

    from . import pallas_pipeline as pp

    return jax.jit(partial(pp.run_window_pallas, plan, W, pstates=pstates))


def _extract_multi_window(p_states, wb, threshold, off_x, off_y):
    """Echelon multi-state pair emission in the window layout
    (diagonalCalculationMultiPosteriorMatchProbs + the host extractor's
    (x + n - 1, y - 1) emission per matchN state,
    engine/fb.extract_multi_pairs): p_states (P, D, W)."""
    from ..constants import PAIR_ALIGNMENT_PROB_1
    from .window import window_grids

    x, y, valid = window_grids(wb)
    probs, xs, ys = [], [], []
    for si in range(p_states.shape[0]):
        s = 1 + si                      # state index == kmer count
        pg = np.where(valid & (x > 0) & (y > 0), p_states[si], 0.0)
        mask = pg >= threshold
        if not mask.any():
            continue
        pq = np.floor(pg[mask] * PAIR_ALIGNMENT_PROB_1).astype(np.int64)
        cx = x[mask].astype(np.int64)
        cy = y[mask].astype(np.int64)
        for n in range(s):
            probs.append(pq)
            xs.append(cx + n - 1 + off_x)
            ys.append(cy - 1 + off_y)
    if not probs:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    return (np.concatenate(probs), np.concatenate(xs), np.concatenate(ys))


@lru_cache(maxsize=64)
def _jit_sm3_runner(plan, W):
    import jax

    from . import pallas_pipeline as pp

    return jax.jit(partial(pp.run_sm3_pallas, plan, W, stages=3))


def _run_generic_buckets(jobs, wbands, idx_groups, threshold, interpret, out):
    """Host-packed window path (vanilla/echelon/HDP machines and the rare
    fast-path capacity overflow): pack + dispatch every bucket first (async),
    then collect and extract."""
    import jax  # noqa: F401  (jit runners)

    from . import pallas_pipeline as pp

    pending = []
    for (name, W, packable), idxs in idx_groups.items():
        for lo in range(0, len(idxs), MAX_BUCKET):
            chunk = idxs[lo:lo + MAX_BUCKET]
            Dmax = max(wbands[i].n_diagonals for i in chunk)
            plan = None
            probs = []
            if packable:
                lxp = max(len(jobs[i].sm.sm3_pack[1]) for i in chunk)
                lyp = max(len(jobs[i].sm.sm3_pack[2]) for i in chunk)
            for i in chunk:
                if packable:
                    pore, target, events, trans, gapx = jobs[i].sm.sm3_pack
                    iplan, prob = pp.make_sm3_pallas_problem(
                        pore, target, events, wbands[i], transitions=trans,
                        kmer_gap_probs=gapx,
                        ragged_left=jobs[i].ragged_left,
                        ragged_right=jobs[i].ragged_right,
                        pad_lx=lxp, pad_ly=lyp, pad_d=Dmax)
                else:
                    iplan, prob = pp.make_window_pallas_problem(
                        jobs[i].sm, wbands[i],
                        ragged_left=jobs[i].ragged_left,
                        ragged_right=jobs[i].ragged_right, pad_d=Dmax)
                # bucketing keys on spec name; a machine whose plan varied
                # per problem under one name would silently run with the
                # wrong edge set (EnginePlan is frozen, == is cheap)
                assert plan is None or iplan == plan, (jobs[i].sm.spec.name,)
                plan = iplan
                probs.append(prob)
            batch = pp.stack_problems(probs)
            # echelon: one posterior channel per matchN state (the device
            # analogue of diagonalCalculationMultiPosteriorMatchProbs,
            # pairwiseAligner.c:797-839)
            pstates = (tuple(range(plan.match_state, 6))
                       if name == "echelon" else None)
            if packable:
                if interpret:
                    p, *_rest = pp.run_sm3_pallas(plan, W, batch, stages=3,
                                                  interpret=True)
                else:
                    p, *_rest = _jit_sm3_runner(plan, W)(batch)
            elif interpret:
                p, _tot = pp.run_window_pallas(plan, W, batch,
                                               interpret=True,
                                               pstates=pstates)
            elif pstates is not None:
                p, _tot = _jit_multi_runner(plan, W, pstates)(batch)
            else:
                p, _tot = _jit_runner(plan, W)(batch)
            pending.append((chunk, p, pstates))

    for chunk, p, pstates in pending:
        p = np.asarray(p)
        for bi, i in enumerate(chunk):
            wb = wbands[i]
            D = wb.n_diagonals
            if pstates is not None:
                pr, xs, ys = _extract_multi_window(
                    p[bi][:D].transpose(1, 0, 2), wb, threshold,
                    jobs[i].off_x, jobs[i].off_y)
            else:
                x, y, _valid = window_grids(wb)
                pr, xs, ys = _extract_pairs(p[bi][:D], x, y, threshold,
                                            jobs[i].off_x, jobs[i].off_y)
            out[i] = AlignedPairs(pr, xs, ys)


@lru_cache(maxsize=64)
def _hdp_align_fn(plan, W, Dp, Lc, interpret):
    """threeStateHdp alignment bucket: E built ON DEVICE from the density
    table (the EM path's interpolation, em/pallas_em._make_hdp_step; ref
    dir_proc_density, hdp.c:2577-2601) -> generic window kernels stages=3.
    Replaces the host per-cell density evaluation that made --threeStateHdp
    the slowest alignment mode (VERDICT r4 missing #4)."""
    import jax
    import jax.numpy as jnp

    from ..models.state_machines import (LOG_TENTH, _GAPX_CLASS, _GAPY_CLASS,
                                         _MATCH_CLASS)
    from ..ops import pallas_fb as pk
    from . import pallas_pipeline as pp

    def run(batch, rankr, meanp, tab, g0, dg):
        B = meanp.shape[0]
        w0 = batch.diag_scalars[:, :Dp, 0, pk.DS_W0]
        d = jnp.arange(Dp, dtype=jnp.int32)[None, :, None]
        j = jnp.arange(W, dtype=jnp.int32)[None, None, :]
        xmy = w0[:, :, None] + 2 * j
        x = (d + xmy) // 2
        y = (d - xmy) // 2
        rows = jnp.arange(B, dtype=jnp.int32)[:, None, None]
        r = rankr[rows, jnp.clip(x, 0, Lc - 1)]
        mu = meanp[rows, jnp.clip(y, 0, Lc - 1)]
        ng = tab.shape[1]
        pos = jnp.clip((mu - g0) / dg, 0.0, ng - 1 - 1e-6)
        i0 = pos.astype(jnp.int32)
        t = pos - i0
        v = ((1.0 - t) * tab[r, i0]
             + t * tab[r, jnp.minimum(i0 + 1, ng - 1)])
        dens = jnp.maximum(v, 0.0)
        live = d <= batch.d_last[:, None, None]
        De = batch.E.shape[1]
        chans = [None] * 3
        chans[_GAPX_CLASS] = jnp.broadcast_to(
            jnp.where(live, LOG_TENTH, 0.0), dens.shape)
        chans[_MATCH_CLASS] = jnp.where(live, dens, 0.0)
        chans[_GAPY_CLASS] = chans[_MATCH_CLASS]
        E = jnp.stack(chans, axis=2).astype(jnp.float32)
        E = jnp.concatenate(
            [E, jnp.zeros((B, De - Dp, 3, W), jnp.float32)], axis=1)
        b = batch._replace(E=E)
        p, _tot = pp.run_window_pallas(plan, W, b, stages=3,
                                       interpret=interpret)
        return p

    return run if interpret else jax.jit(run)


def _run_hdp_buckets(jobs, wbands, idxs_all, threshold, interpret, out):
    """Device-batched threeStateHdp alignment jobs (sm.hdp_pack present)."""
    import jax.numpy as jnp

    from ..models.state_machines import make_signal_sm3_hdp
    from . import pallas_pipeline as pp

    zero = lambda r, m: np.zeros(np.broadcast(r, m).shape)
    groups: dict[tuple, list[int]] = {}
    for i in idxs_all:
        groups.setdefault((id(jobs[i].sm.hdp_pack[0]), wbands[i].W),
                          []).append(i)
    pending = []
    for (_tid, W), idxs in groups.items():
        tab0, g0, dg, *_rest = jobs[idxs[0]].sm.hdp_pack
        tab = jnp.asarray(np.maximum(tab0, 0.0), dtype=jnp.float32)
        for lo in range(0, len(idxs), MAX_BUCKET):
            chunk = idxs[lo:lo + MAX_BUCKET]
            Dp = max(wbands[i].n_diagonals for i in chunk)
            plan = None
            probs, ranks_l, means_l = [], [], []
            Dpq = None
            for i in chunk:
                _t, _g, _d, target, events, trans = jobs[i].sm.hdp_pack
                sm0 = make_signal_sm3_hdp(zero, target, events, trans)
                iplan, prob = pp.make_window_pallas_problem(
                    sm0, wbands[i], ragged_left=jobs[i].ragged_left,
                    ragged_right=jobs[i].ragged_right, pad_d=Dp)
                assert plan is None or iplan == plan
                plan = iplan
                probs.append(prob)
                Dpq = prob.diag_scalars.shape[0] - 1
            Lc = Dpq + 2
            rk, mn = [], []
            for i in chunk:
                r = np.asarray(jobs[i].sm.kmer_ranks, dtype=np.int32)
                rp = np.full(Lc, r[-1], dtype=np.int32)
                rp[:len(r)] = r
                rk.append(rp)
                ev = jobs[i].sm.event_means
                mu = np.zeros(Lc, dtype=np.float32)
                mu[1:1 + len(ev)] = ev
                if len(ev):
                    mu[1 + len(ev):] = ev[-1]
                mn.append(mu)
            batch = pp.stack_problems(probs)
            fn = _hdp_align_fn(plan, W, Dpq, Lc, interpret)
            p = fn(batch, jnp.asarray(np.stack(rk)),
                   jnp.asarray(np.stack(mn)), tab, np.float32(g0),
                   np.float32(dg if dg else 1.0))
            pending.append((chunk, p))

    from .align import _extract_pairs
    from .window import window_grids

    for chunk, p in pending:
        p = np.asarray(p)
        for bi, i in enumerate(chunk):
            wb = wbands[i]
            D = wb.n_diagonals
            x, y, _valid = window_grids(wb)
            pr, xs, ys = _extract_pairs(p[bi][:D], x, y, threshold,
                                        jobs[i].off_x, jobs[i].off_y)
            out[i] = AlignedPairs(pr, xs, ys)


def batch_align_stream(per_read_jobs, threshold: float, *,
                       width_multiple: int = 128,
                       interpret: bool | None = None,
                       timing: dict | None = None,
                       wave_events: int = 8000):
    """Streaming device-batched alignment: ``per_read_jobs`` is an iterable
    yielding per-read SplitJob lists (so split/band prep runs lazily);
    fast-lane jobs are staged as they arrive and DISPATCHED in waves of
    ~``wave_events`` events — the tunnel uploads and the chip computes while
    the host preps the remaining reads — then ONE fetch collects every
    wave's output.  Returns (jobs, pairs) with pairs aligned to jobs."""
    import time as _time

    import jax

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    t0 = _time.perf_counter()
    jobs: list[SplitJob] = []
    wbands = []
    staged_wave: list = []
    waves: list = []        # keep staged lists alive for decode
    staged_sym = []
    hdp_idxs: list[int] = []
    generic: dict[tuple, list[int]] = {}
    pending: list = []
    ev_acc = 0

    def flush():
        nonlocal staged_wave, ev_acc
        if staged_wave:
            pending.extend(readpath.dispatch_fast_jobs(
                staged_wave, threshold, interpret=interpret))
            waves.append(staged_wave)
            staged_wave = []
            ev_acc = 0

    for jl in per_read_jobs:
        for j in jl:
            i = len(jobs)
            jobs.append(j)
            # sm3-packable and symbol jobs whose true band fits 64 lanes
            # (virtually all split jobs under default expansion) get a
            # 64-lane window and run half-packed, two per kernel vreg row
            if (getattr(j.sm, "sm3_pack", None) is not None
                    or getattr(j.sm, "symbol_codes", None) is not None):
                wb = smooth_band(j.band, width_multiple=64)
                if wb.W != 64:
                    wb = smooth_band(j.band, width_multiple=width_multiple)
            else:
                wb = smooth_band(j.band, width_multiple=width_multiple)
            wbands.append(wb)
            st = readpath.stage_fast_job(j, wb)
            if st is not None:
                fj, plan = st
                staged_wave.append((i, fj, plan))
                ev_acc += len(fj.events)
                continue
            ss = readpath.stage_symbol_job(j, wb)
            if ss is not None:
                sj, plan = ss
                staged_sym.append((i, sj, plan))
                continue
            if getattr(j.sm, "hdp_pack", None) is not None:
                hdp_idxs.append(i)
                continue
            generic.setdefault((j.sm.spec.name, wb.W, False), []).append(i)
        if ev_acc >= wave_events:
            flush()
    flush()
    if timing is not None:
        timing["host_pack"] = timing.get("host_pack", 0.0) \
            + (_time.perf_counter() - t0)

    out: list[AlignedPairs | None] = [None] * len(jobs)
    fast: dict[int, object] = {}
    if pending:
        fast.update(readpath.collect_fast_jobs(pending, interpret=interpret,
                                               timing=timing))
    if staged_sym:
        fast.update(readpath.run_symbol_jobs(staged_sym, threshold,
                                             interpret=interpret))
    for ji, pairs in fast.items():
        if pairs is None:
            # capacity overflow: re-route through the full-grid path
            generic.setdefault((jobs[ji].sm.spec.name, wbands[ji].W,
                                hasattr(jobs[ji].sm, "sm3_pack")),
                               []).append(ji)
        else:
            out[ji] = pairs

    if hdp_idxs:
        _run_hdp_buckets(jobs, wbands, hdp_idxs, threshold, interpret, out)
    if generic:
        _run_generic_buckets(jobs, wbands, generic, threshold, interpret, out)
    return jobs, out


def batch_align_jobs(jobs: list[SplitJob], threshold: float, *,
                     width_multiple: int = 128,
                     interpret: bool | None = None,
                     timing: dict | None = None) -> list[AlignedPairs]:
    """Run every job's banded FB on device (bucketed + stacked) and return
    per-job AlignedPairs (split-local coordinates already shifted by the
    job's off_x/off_y).  interpret=None auto-selects interpret mode off the
    default backend (CPU runs the Pallas kernels in interpret mode)."""
    _jobs, out = batch_align_stream(iter([list(jobs)]), threshold,
                                    width_multiple=width_multiple,
                                    interpret=interpret, timing=timing)
    return out  # type: ignore[return-value]


def assemble_pairs(frags: list[AlignedPairs]) -> AlignedPairs:
    """Concatenate split fragments (in split order) into one AlignedPairs."""
    if not frags:
        z = np.zeros(0, dtype=np.int64)
        return AlignedPairs(z, z, z)
    return AlignedPairs(np.concatenate([f.probs for f in frags]),
                        np.concatenate([f.x for f in frags]),
                        np.concatenate([f.y for f in frags]))
