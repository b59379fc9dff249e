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
    for (_name, W, packable), idxs in idx_groups.items():
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
            if packable:
                if interpret:
                    p, *_rest = pp.run_sm3_pallas(plan, W, batch, stages=3,
                                                  interpret=True)
                else:
                    p, *_rest = _jit_sm3_runner(plan, W)(batch)
            elif interpret:
                p, _tot = pp.run_window_pallas(plan, W, batch, interpret=True)
            else:
                p, _tot = _jit_runner(plan, W)(batch)
            pending.append((chunk, p))

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
            # sm3-packable jobs whose true band fits 64 lanes (virtually
            # all split jobs under default expansion) get a 64-lane window
            # and run half-packed, two per kernel vreg row
            if getattr(j.sm, "sm3_pack", None) is not None:
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
