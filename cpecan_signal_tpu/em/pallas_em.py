"""Production E-step on the Pallas fast path: all reads' splits on the chip.

The reference trains through a 4-way process pool with per-read expectation
files reduced on the filesystem (trainModels.py:107-135).  The TPU-native
production route instead pools EVERY read's split jobs (reads x strands x
splits) into width-bucketed device batches built ONCE before the EM loop;
each iteration updates only the iteration-dependent inputs (transition
scalars, per-kmer gapX rows, boundary vectors) on device and runs the fused
Pallas backward's EM tallies (ops/pallas_fb.py stages=4), so the chip — not a
host f64 loop — carries the E-step.

Iteration-dependent pieces of an SM3PallasProblem:
  * xarr row 12 (per-x gapX log-prob): regathered on device from the trained
    4096-vector via the problem's xrank pack;
  * tp_scalar: the 9 transition log-probs (global, broadcast per problem);
  * start/end: boundary vectors recomputed from the transitions and selected
    per problem by its ragged flags.
Everything else (emission parameter packs, window scalars) is static.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from ..constants import KMER_LENGTH, NUM_OF_KMERS
from ..core.window import smooth_band
from ..models.params import AlignmentParams
from ..models.pore_model import PoreModel, scale_model
from ..models.state_machines import (LOG_TENTH, SM3_NANOPORE_TRANSITIONS,
                                     make_signal_sm3)
from ..engine import fb
from .expectation_driver import _split_loop

MAX_BUCKET = 64  # problems per device dispatch (bounds host E memory)


@dataclass
class EmJob:
    """One split sub-problem of one read-strand, ready for packing."""

    pore: PoreModel
    target: str
    events: np.ndarray
    band: object
    ragged_left: bool
    ragged_right: bool


def collect_sm3_em_jobs(reads: list[dict], models: dict, params: AlignmentParams,
                        strand: str) -> list[EmJob]:
    """reads are _prepare_read dicts {'t': (target, events, anchors, sp), ...};
    models maps strand -> unscaled PoreModel.  Tallies are per-strand HMMs,
    so buckets are built per strand."""
    jobs = []
    for prep in reads:
        target, events, anchors, sp = prep[strand]
        if len(events) == 0:
            continue
        pore = scale_model(models[strand], sp.scale, sp.shift, sp.var,
                           sp.scale_sd, sp.var_sd)
        lX = len(target) - KMER_LENGTH + 1
        for (x1, y1, x2, y2), band, rl, rr in _split_loop(
                lX, len(events), anchors, params, True, True):
            jobs.append(EmJob(pore, target[x1:x2 + KMER_LENGTH - 1],
                              events[y1:y2], band, rl, rr))
    return jobs


@dataclass
class SM3EmBucket:
    """One width bucket of stacked problems + its jitted E-step."""

    plan: fb.EnginePlan
    W: int
    batch: object            # stacked SM3PallasProblem
    ragged_left: np.ndarray  # (B,) bool
    ragged_right: np.ndarray
    step: Callable           # (batch, gapx_tab, tp_vec, start, end) -> tallies


def _make_bucket_step(plan, W, interpret: bool):
    import jax
    import jax.numpy as jnp

    from ..engine import pallas_pipeline as pp

    def step(batch, gapx_tab, tp_vec, start, end):
        B = batch.xrank.shape[0]
        xarr = batch.xarr.at[:, 12, :].set(gapx_tab[batch.xrank])
        b = batch._replace(xarr=xarr, start=start, end=end,
                           tp_scalar=jnp.broadcast_to(tp_vec, (B, tp_vec.shape[0])))
        return pp.sm3_pallas_expectations(plan, W, b, interpret=interpret)

    return jax.jit(step) if not interpret else step


def build_sm3_em_buckets(jobs: list[EmJob], *, width_multiple: int = 128,
                         interpret: bool | None = None) -> list[SM3EmBucket]:
    """Pack jobs into width-bucketed stacked SM3PallasProblems (done once,
    before the EM loop)."""
    import jax

    from ..engine import pallas_pipeline as pp

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    wbands = [smooth_band(j.band, width_multiple=width_multiple) for j in jobs]
    groups: dict[int, list[int]] = {}
    for i, wb in enumerate(wbands):
        groups.setdefault(wb.W, []).append(i)

    buckets = []
    for W, idxs in sorted(groups.items()):
        for lo in range(0, len(idxs), MAX_BUCKET):
            chunk = idxs[lo:lo + MAX_BUCKET]
            Dp = max(wbands[i].n_diagonals for i in chunk)
            lxp = max(len(jobs[i].target) for i in chunk)
            lyp = max(len(jobs[i].events) for i in chunk)
            plan = None
            probs = []
            for i in chunk:
                j = jobs[i]
                plan, prob = pp.make_sm3_pallas_problem(
                    j.pore, j.target, j.events, wbands[i],
                    ragged_left=j.ragged_left, ragged_right=j.ragged_right,
                    pad_lx=lxp, pad_ly=lyp, pad_d=Dp)
                probs.append(prob)
            batch = pp.stack_problems(probs)
            buckets.append(SM3EmBucket(
                plan=plan, W=W, batch=batch,
                ragged_left=np.array([jobs[i].ragged_left for i in chunk]),
                ragged_right=np.array([jobs[i].ragged_right for i in chunk]),
                step=_make_bucket_step(plan, W, interpret)))
    return buckets


def _sm3_iteration_arrays(transitions: dict | None):
    """(tp_vec, start, ragged_start, end, ragged_end) f32 for a transitions
    dict — computed through the same plan builder the problems used, so the
    scalar order always matches."""
    from ..engine.pallas_pipeline import _san

    t = dict(SM3_NANOPORE_TRANSITIONS)
    if transitions:
        t.update(transitions)
    dummy = np.zeros((NUM_OF_KMERS + 2, 5))
    dummy[:, 1] = dummy[:, 3] = 1.0
    pore = PoreModel(1.0, dummy, 1.0, dummy.copy(), np.full(60, 1 / 30.0))
    sm = make_signal_sm3(pore, "ACGTACGTA", np.zeros((2, 3)), t)
    plan, tp_scalar, cell_sources = fb._build_plan(sm, "exact")
    assert not cell_sources
    return (_san(tp_scalar), _san(sm.start), _san(sm.ragged_start),
            _san(sm.end), _san(sm.ragged_end))


def sm3_em_step(buckets: list[SM3EmBucket], transitions: dict | None = None,
                kmer_gaps: np.ndarray | None = None):
    """One full E-step over all buckets with the given M-step parameters.
    Returns (trans (3,3), kmer_gap (4096,), likelihood) summed over all
    problems — the same contract as summing sm3_expectations over reads."""
    import jax.numpy as jnp

    from ..engine.pallas_pipeline import NEG_INF

    tp_vec, sv, rsv, ev, rev = _sm3_iteration_arrays(transitions)
    gapx_tab = np.full(NUM_OF_KMERS + 2, LOG_TENTH, dtype=np.float32)
    if kmer_gaps is not None:
        gapx_tab[:NUM_OF_KMERS] = np.maximum(kmer_gaps, NEG_INF)
    gapx_tab[NUM_OF_KMERS:] = NEG_INF
    gapx_tab = jnp.asarray(gapx_tab)
    tp_vec = jnp.asarray(tp_vec)

    trans_sum = np.zeros((3, 3))
    kmer_sum = np.zeros(NUM_OF_KMERS)
    lik_sum = 0.0
    for b in buckets:
        start = jnp.asarray(np.where(b.ragged_left[:, None], rsv, sv))
        end = jnp.asarray(np.where(b.ragged_right[:, None], rev, ev))
        trans, kmer, lik = b.step(b.batch, gapx_tab, tp_vec, start, end)
        trans_sum += np.asarray(trans, dtype=np.float64)
        kmer_sum += np.asarray(kmer, dtype=np.float64)
        lik_sum += float(lik)
    return trans_sum, kmer_sum, lik_sum


# ---------------------------------------------------------------------------
# Vanilla (skip-bin) EM on the Pallas path
# ---------------------------------------------------------------------------
# Same built-once / update-per-iteration structure as the SM3 path.  The
# vanilla machine's per-cell transitions are functions of the k-mer skip bin
# (stateMachine.c:1368-1409); the M-step only changes the 60-bin vector
# (vanillaHmm_loadSkipProbsIntoStateMachine, continuousHmm.c:457-466), so:
#   * static per problem: emission channels of E, window scalars, boundary
#     vectors, plus an int32 bin grid (the skip-bin index per window cell,
#     sentinel N_SKIP_BINS for padded rows) and the per-x bin keys for the
#     windowed tally scatter;
#   * per iteration: per-bin log tables (T, N_SKIP_BINS + 1) regenerated from
#     the trained bins (models.state_machines.vanilla_transition_tables) and
#     gathered into E's TP channels on device.
# The E-step's beta/alpha tallies ride the generic stage-4 windowed groups
# (M->X and X->X edge posteriors per x column, ops/pallas_fb.backward_sm3)
# and are scattered to bins on device via the per-x keys.


@dataclass
class VanillaEmBucket:
    plan: fb.EnginePlan
    W: int
    batch: object             # stacked WindowPallasProblem (TP channels stale)
    bin_grid: object          # (B, Dp + KD, W) int32 skip-bin per cell
    exit_bin: object          # (B, Dp) int32 bin key of exits[d]
    gacc_bin: object          # (B, W) int32 bin key of gacc lanes
    cell_keys: list           # TP channel order (fb.plan_key_names)
    strand_name: str
    step: Callable            # (batch, bin_grid, exit_bin, gacc_bin, tabs)


def _vanilla_wgroups(plan):
    from ..models.state_machines import MATCH, SHORT_GAP_X

    beta = tuple(ei for ei, e in enumerate(plan.edges)
                 if e.frm == MATCH and e.to == SHORT_GAP_X)
    alpha = tuple(ei for ei, e in enumerate(plan.edges)
                  if e.frm == SHORT_GAP_X and e.to == SHORT_GAP_X)
    assert beta and alpha
    return (beta, alpha)


def _make_vanilla_step(plan, W, C, interpret: bool):
    import jax
    import jax.numpy as jnp

    from ..constants import N_SKIP_BINS
    from ..engine import pallas_pipeline as pp
    from ..ops.pallas_fb import LIK_LANE

    wgroups = _vanilla_wgroups(plan)

    def step(batch, bin_grid, exit_bin, gacc_bin, tabs):
        # tabs (T, N_SKIP_BINS + 1); gather per-cell TP channels
        TP = jnp.transpose(tabs[:, bin_grid], (1, 2, 0, 3))  # (B, Dpe, T, W)
        E = batch.E.at[:, :, C:, :].set(TP)
        b = batch._replace(E=E)
        _p, _tot, exits, gacc, stats = pp.run_window_pallas(
            plan, W, b, stages=4, wgroups=wgroups, interpret=interpret)

        def one(eb, gb, ex, ga):
            def tally(col, lane):
                t = jnp.zeros(N_SKIP_BINS + 1, jnp.float32)
                return t.at[eb].add(col).at[gb].add(lane)[:N_SKIP_BINS]
            return tally(ex[:, 0], ga[0]), tally(ex[:, 1], ga[1])

        tb, ta = jax.vmap(one)(exit_bin, gacc_bin, exits, gacc)
        bins = jnp.concatenate([tb.sum(0), ta.sum(0)])
        return bins, stats[:, LIK_LANE].sum()

    return jax.jit(step) if not interpret else step


def build_vanilla_em_buckets(jobs: list[EmJob], strand: str, *,
                             width_multiple: int = 128,
                             interpret: bool | None = None
                             ) -> list[VanillaEmBucket]:
    """strand is 't'/'c' (mapped to the vanilla strand-transition defaults)."""
    import jax
    import jax.numpy as jnp

    from ..constants import N_SKIP_BINS
    from ..core.window import WindowBand
    from ..engine import pallas_pipeline as pp
    from ..engine.window import window_grids
    from ..models.state_machines import make_signal_vanilla

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    strand_name = "template" if strand == "t" else "complement"

    wbands = [smooth_band(j.band, width_multiple=width_multiple) for j in jobs]
    groups: dict[int, list[int]] = {}
    for i, wb in enumerate(wbands):
        groups.setdefault(wb.W, []).append(i)

    buckets = []
    for W, idxs in sorted(groups.items()):
        for lo in range(0, len(idxs), MAX_BUCKET):
            chunk = idxs[lo:lo + MAX_BUCKET]
            Dp = max(wbands[i].n_diagonals for i in chunk)
            plan = None
            probs, bgs, ebs, gbs, keys = [], [], [], [], None
            for i in chunk:
                j = jobs[i]
                sm = make_signal_vanilla(j.pore, j.target, j.events,
                                         strand_name)
                plan, prob = pp.make_window_pallas_problem(
                    sm, wbands[i], ragged_left=j.ragged_left,
                    ragged_right=j.ragged_right, pad_d=Dp)
                probs.append(prob)
                keys = fb.plan_key_names(sm)[1]
                Dpe = prob.E.shape[0]
                Dpp = prob.diag_scalars.shape[0] - 1
                D = wbands[i].n_diagonals
                lX = wbands[i].lX
                # per-cell skip-bin grid, clipped exactly like
                # prepare_window_inputs' x_idx; sentinel rows >= D
                x, _y, _valid = window_grids(wbands[i])
                x_idx = np.clip(x - 1, -1, max(lX - 1, -1))
                bg = np.full((Dpe, W), N_SKIP_BINS, dtype=np.int32)
                bg[:D] = sm.skip_bin_idx[x_idx + 1]
                bgs.append(bg)
                # per-x keys for the windowed tallies (grid x -> bin; x
                # outside [1, lX] never carries mass -> sentinel)
                x0 = np.asarray(prob.x0)
                xbin = np.full(lX + 2, N_SKIP_BINS, dtype=np.int32)
                xbin[1:lX + 1] = sm.skip_bin_idx[1:lX + 1]
                ex = np.clip(x0[:Dpp] + (W - 1), 0, lX + 1)
                ebs.append(xbin[ex])
                ga = np.clip(x0[0] + np.arange(W), 0, lX + 1)
                gbs.append(xbin[ga])
            batch = pp.stack_problems(probs)
            buckets.append(VanillaEmBucket(
                plan=plan, W=W, batch=batch,
                bin_grid=jnp.asarray(np.stack(bgs)),
                exit_bin=jnp.asarray(np.stack(ebs)),
                gacc_bin=jnp.asarray(np.stack(gbs)),
                cell_keys=keys, strand_name=strand_name,
                step=_make_vanilla_step(plan, W, plan.n_eclasses, interpret)))
    return buckets


def vanilla_em_step(buckets: list[VanillaEmBucket], bins: np.ndarray):
    """One full vanilla E-step over all buckets with the given skip bins.
    Returns (bin tallies (60,), likelihood) — the same contract as summing
    vanilla_expectations over reads."""
    import jax.numpy as jnp

    from ..constants import N_SKIP_BINS
    from ..engine.pallas_pipeline import NEG_INF
    from ..models.state_machines import vanilla_transition_tables

    bins_sum = np.zeros(2 * N_SKIP_BINS)
    lik_sum = 0.0
    for b in buckets:
        tabs, _scal = vanilla_transition_tables(np.asarray(bins), b.strand_name)
        T = np.stack([np.maximum(tabs[k], NEG_INF) for k in b.cell_keys])
        tallies, lik = b.step(b.batch, b.bin_grid, b.exit_bin, b.gacc_bin,
                              jnp.asarray(T, dtype=jnp.float32))
        bins_sum += np.asarray(tallies, dtype=np.float64)
        lik_sum += float(lik)
    return bins_sum, lik_sum
