"""Device-batched fiveState (nucleotide) E-step and batched realignment.

The reference distributes nucleotide EM as jobTree targets each running
`cPecanRealign --outputExpectations` over a <= 1 Mb alignment chunk
(cPecanEm.py:107-242, cPecanRealign.c:556-645).  The TPU-native route stacks
every CIGAR record's split jobs into generic window Pallas batches: the
fused backward's stats lanes carry the transition tallies + likelihood, and
the new per-edge-group posterior channels (ops/pallas_fb.backward_sm3
``pgroups``) carry per-to-state posterior grids from which the per-(state,
symbol-pair) emission tallies are reduced ON DEVICE (cell_updateExpectations
semantics, pairwiseAligner.c:407-424) — nothing grid-sized crosses the
host link.

Per-job results are returned separately and summed by the caller in job
order, so a chunk's accumulator is bitwise independent of bucketing and of
how many hosts share the work (the byte-identical distributed-EM contract).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..core.anchors import anchors_in_window, get_split_points
from ..core.band import band_construct
from ..core.window import smooth_band
from ..engine import fb
from ..engine.align import AlignedPairs, SplitJob
from ..models.params import AlignmentParams

MAX_BUCKET = 64
N_SYM = 4
_DQ = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def collect_symbol_split_jobs(make_sm, seq_x: str, seq_y: str,
                              anchors: np.ndarray, params: AlignmentParams,
                              *, ragged_left: bool, ragged_right: bool
                              ) -> list[SplitJob]:
    """Split a nucleotide-pair problem (raw sequence lengths, no k-mer
    shortening) into SplitJobs — the symbol analogue of
    engine.align.collect_split_jobs / align_sequence_pair's split loop."""
    lX, lY = len(seq_x), len(seq_y)
    anchors = np.asarray(anchors, dtype=np.int64).reshape(-1, 2)
    splits = get_split_points(anchors, lX, lY,
                              params.split_matrix_bigger_than_this,
                              ragged_left, ragged_right,
                              max_gap_min_dim=params.max_gap_min_dim)
    jobs = []
    for i, (x1, y1, x2, y2) in enumerate(splits):
        sub_anchors = anchors_in_window(anchors, x1, y1, x2, y2)
        band = band_construct(sub_anchors, x2 - x1, y2 - y1,
                              params.diagonal_expansion)
        jobs.append(SplitJob(make_sm(seq_x[x1:x2], seq_y[y1:y2]), band,
                             x1, y1, ragged_left or i > 0,
                             ragged_right or i < len(splits) - 1))
    return jobs


def _to_state_pgroups(plan):
    return tuple(tuple(ei for ei, e in enumerate(plan.edges) if e.to == s)
                 for s in range(plan.n_states))


@lru_cache(maxsize=64)
def _jit_em_step(plan, W, Dp, B, Lc, interpret):
    """Compiled chunk step: stages=4 window run with per-to-state posterior
    channels + on-device symbol-pair emission reduction.  Output: one packed
    f32 block per problem [stats(128) | emiss(S * 16)]."""
    import jax

    from ..engine import pallas_pipeline as pp
    from ..ops import pallas_fb as pk

    pgroups = _to_state_pgroups(plan)
    S = plan.n_states

    def step(batch, cxp, cyp):
        import jax.numpy as jnp

        p, _tot, _exits, _gacc, stats = pp.run_window_pallas(
            plan, W, batch, stages=4, pgroups=pgroups, interpret=interpret)
        # cell coordinates from the window scalars already on device
        w0 = batch.diag_scalars[:, :Dp, 0, pk.DS_W0]          # (B, Dp)
        d = jnp.arange(Dp, dtype=jnp.int32)[None, :, None]
        j = jnp.arange(W, dtype=jnp.int32)[None, None, :]
        xmy = w0[:, :, None] + 2 * j
        x = (d + xmy) // 2
        y = (d - xmy) // 2
        rows = jnp.arange(p.shape[0], dtype=jnp.int32)[:, None, None]
        sx = cxp[rows, jnp.clip(x, 0, Lc - 1)]                # (B, Dp, W)
        sy = cyp[rows, jnp.clip(y, 0, Lc - 1)]
        ok = (sx < N_SYM) & (sy < N_SYM)
        key = jnp.where(ok, jnp.clip(sx, 0, N_SYM - 1) * N_SYM
                        + jnp.clip(sy, 0, N_SYM - 1), N_SYM * N_SYM)
        tallies = []
        for s in range(S):
            ps = p[:, :, s, :]
            for c in range(N_SYM * N_SYM):
                tallies.append(jnp.sum(jnp.where(key == c, ps, 0.0),
                                       axis=(1, 2)))
        emiss = jnp.stack(tallies, axis=1)                    # (B, S*16)
        return jnp.concatenate([stats, emiss], axis=1)

    return step if interpret else jax.jit(step)


def discrete_expectations_batched(jobs: list[SplitJob], *,
                                  width_multiple: int = 128,
                                  interpret: bool | None = None):
    """All jobs' fiveState EM tallies through the device path.  Returns a
    list (per job, input order) of (trans (S, S) f64, emiss (S, 4, 4) f64,
    likelihood float)."""
    import jax

    from ..engine import pallas_pipeline as pp
    from ..ops import pallas_fb as pk

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    wbands = [smooth_band(j.band, width_multiple=width_multiple)
              for j in jobs]
    groups: dict[tuple, list[int]] = {}
    for i, (j, wb) in enumerate(zip(jobs, wbands)):
        key = (j.sm.spec.name, wb.W,
               _round_up(max(wb.n_diagonals + 2, _DQ), _DQ))
        groups.setdefault(key, []).append(i)

    pending = []
    for (_name, W, Dpq), idxs in groups.items():
        Dp = _round_up(Dpq, pk.KD)
        Lc = Dp + 2
        for lo in range(0, len(idxs), MAX_BUCKET):
            chunk = idxs[lo:lo + MAX_BUCKET]
            plan = None
            probs = []
            cxp = np.full((len(chunk), Lc), N_SYM, dtype=np.int32)
            cyp = np.full((len(chunk), Lc), N_SYM, dtype=np.int32)
            for bi, i in enumerate(chunk):
                iplan, prob = pp.make_window_pallas_problem(
                    jobs[i].sm, wbands[i],
                    ragged_left=jobs[i].ragged_left,
                    ragged_right=jobs[i].ragged_right, pad_d=Dp)
                assert plan is None or iplan == plan
                plan = iplan
                probs.append(prob)
                cx, cy = jobs[i].sm.symbol_codes
                cxp[bi, :len(cx)] = cx
                cyp[bi, :len(cy)] = cy
            batch = pp.stack_problems(probs)
            step = _jit_em_step(plan, W, Dp, len(chunk), Lc, interpret)
            handle = step(batch, cxp, cyp)
            pending.append((chunk, plan, handle))

    for _chunk, _plan, handle in pending:
        if hasattr(handle, "copy_to_host_async"):
            handle.copy_to_host_async()

    out = [None] * len(jobs)
    for chunk, plan, handle in pending:
        packed = np.asarray(handle, dtype=np.float64)
        S = plan.n_states
        stats = packed[:, :128]
        emiss = packed[:, 128:].reshape(-1, S, N_SYM, N_SYM)
        for bi, i in enumerate(chunk):
            trans = np.zeros((S, S))
            for ei, e in enumerate(plan.edges):
                trans[e.frm, e.to] += stats[bi, ei]
            out[i] = (trans, emiss[bi],
                      float(stats[bi, pk.LIK_LANE]))
    return out


# ---------------------------------------------------------------------------
# Batched realignment (posterior pairs for many CIGAR records at once)
# ---------------------------------------------------------------------------

@dataclass
class StagedRecord:
    """realign_record's head (anchors/subsequences/rebase), held for the
    batched posterior pass + per-record tail."""

    rec: object
    sub_x: str
    sub_y: str
    anchors_all: np.ndarray
    anchors: np.ndarray
    shift1: int
    shift2: int
    flip1: bool
    flip2: bool
    jobs: slice              # range into the flat job list


def batched_pairs_for_records(staged_jobs: list[SplitJob], threshold: float,
                              interpret: bool | None = None
                              ) -> list[AlignedPairs]:
    """Posterior pairs for a flat list of symbol split jobs through the
    generic device batch path (engine.batch_align)."""
    from ..engine.batch_align import batch_align_jobs

    return batch_align_jobs(staged_jobs, threshold, interpret=interpret)
