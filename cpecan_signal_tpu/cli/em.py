"""Distributed nucleotide-HMM EM: the cPecanEm equivalent.

The reference fans ≤1 Mb alignment chunks out as jobTree targets running
cPecanRealign --outputExpectations, with a follow-on merge + normalize
(cPecanEm.py:107-242).  Here the chunks ARE the distribution unit:

  * E-step engine "pallas" stacks every chunk record's split jobs into
    generic window Pallas batches (em/discrete_pallas.py) so the chip
    carries the fiveState recursion + EM tallies; engine "host" runs the
    f64 scan per record; "auto" picks pallas off-CPU.
  * Multi-host: SIGALIGN_COORDINATOR brings up jax.distributed (exactly as
    in signal_align / train_models); chunks are partitioned round-robin by
    index, each host computes its chunks' tallies, and a per-chunk
    all-reduce (each chunk's row owned by exactly one host) followed by an
    in-order sum reproduces the single-process accumulator BITWISE — the
    reference's jobTree follow-on merge (cPecanEm.py:182-209) with a DCN
    all-reduce instead of expectation files.

Random-restart trials select the maximum-likelihood model.  Also provides
the Hmm utility surface (randomise / equalise / Jukes-Cantor init / tied
emissions, cPecanEm.py:19-105) on DiscreteHmm, and the lastz scoring-matrix
export (makeBlastScoringMatrix, cPecanEm.py:301-359).
"""

from __future__ import annotations

import argparse
import math
import os
import sys
from itertools import product

import numpy as np

from ..em.accumulators import DiscreteHmm
from ..io.cigar import CigarRecord, read_cigars
from ..models.params import AlignmentParams

SYMBOL_NUMBER = 4


def set_jukes_cantor(hmm: DiscreteHmm, divergence: float) -> None:
    i = (0.25 + 0.75 * math.exp(-4.0 * divergence / 3.0)) / 4.0
    j = (0.25 - 0.25 * math.exp(-4.0 * divergence / 3.0)) / 4.0
    for s in range(hmm.state_number):
        hmm.emissions[s] = np.where(np.eye(SYMBOL_NUMBER, dtype=bool), i, j)


def tie_emissions(hmm: DiscreteHmm) -> None:
    """Collapse emissions to overall identity vs non-identity
    (Hmm.tieEmissions, cPecanEm.py:98-105)."""
    for s in range(hmm.state_number):
        e = hmm.emissions[s]
        ident = np.trace(e)
        off = (1.0 - ident) / (SYMBOL_NUMBER**2 - SYMBOL_NUMBER)
        hmm.emissions[s] = np.where(np.eye(SYMBOL_NUMBER, dtype=bool),
                                    ident / SYMBOL_NUMBER, off)


def chunk_alignments(records: list[CigarRecord], max_bases: int = 1_000_000
                     ) -> list[list[CigarRecord]]:
    """≤1 Mb alignment chunks (the jobTree target granularity,
    cPecanEm.py:128-158)."""
    chunks: list[list[CigarRecord]] = [[]]
    size = 0
    for rec in records:
        n = abs(rec.end1 - rec.start1)
        if size + n > max_bases and chunks[-1]:
            chunks.append([])
            size = 0
        chunks[-1].append(rec)
        size += n
    return [c for c in chunks if c]


def _chunk_tallies_host(chunk, seqs, params, hmm):
    """Host f64 E-step over one chunk's records (the cPecanRealign
    --outputExpectations worker, cPecanRealign.c:584-588)."""
    from .realign import realign_record

    acc = DiscreteHmm.empty(5, SYMBOL_NUMBER, pseudocount=0.0)
    for rec in chunk:
        realign_record(rec, seqs, params, hmm=hmm, expectations=acc)
    return acc


def _chunk_tallies_pallas(chunk, seqs, params, hmm):
    """Device-batched E-step over one chunk: every record's split jobs in one
    set of window Pallas batches; per-job tallies summed in job order so the
    result is independent of bucketing (em/discrete_pallas.py)."""
    from ..em.discrete_pallas import (collect_symbol_split_jobs,
                                      discrete_expectations_batched)
    from .realign import stage_record_head

    acc = DiscreteHmm.empty(5, SYMBOL_NUMBER, pseudocount=0.0)
    jobs = []
    for rec in chunk:
        sub_x, sub_y, _aall, anchors, make_sm = stage_record_head(
            rec, seqs, params, hmm)
        jobs.extend(collect_symbol_split_jobs(make_sm, sub_x, sub_y, anchors,
                                              params, ragged_left=True,
                                              ragged_right=True))
    for trans, emiss, lik in discrete_expectations_batched(jobs):
        acc.transitions += trans
        acc.emissions += emiss
        acc.likelihood += lik
    return acc


def _estep_all_chunks(trial_chunks, seqs, params, hmm, engine, dist_run):
    """Full E-step: per-chunk tallies (locally for this host's chunks), then
    a per-chunk all-reduce + in-order sum — bitwise identical to the
    single-process accumulator for any process count."""
    S, n = 5, SYMBOL_NUMBER
    sz = S * S + S * n * n + 1
    table = np.zeros((len(trial_chunks), sz))
    if dist_run:
        import jax
        my = range(jax.process_index(), len(trial_chunks), jax.process_count())
    else:
        my = range(len(trial_chunks))
    fn = _chunk_tallies_pallas if engine == "pallas" else _chunk_tallies_host
    for ci in my:
        a = fn(trial_chunks[ci], seqs, params, hmm)
        table[ci] = np.concatenate([a.transitions.ravel(),
                                    a.emissions.ravel(), [a.likelihood]])
    if dist_run:
        from ..parallel.distributed import allreduce_sum
        (table,) = allreduce_sum(table)
    acc = DiscreteHmm.empty(S, n, pseudocount=1e-12)
    for row in table:       # fixed chunk order -> deterministic fp sum
        acc.transitions += row[:S * S].reshape(S, S)
        acc.emissions += row[S * S:S * S + S * n * n].reshape(S, n, n)
        acc.likelihood += float(row[-1])
    return acc


def expectation_maximisation(alignment_file: str, fasta_files: list[str],
                             output_model: str, iterations: int = 10,
                             trials: int = 1, max_bases_per_chunk: int = 1_000_000,
                             set_jukes_cantor_divergence: float | None = None,
                             tie_emission_params: bool = False,
                             params: AlignmentParams | None = None,
                             update_band: bool = False, seed: int = 0,
                             engine: str = "auto", log=print) -> DiscreteHmm:
    """Random-restart EM over a cigar alignment set; returns (and writes) the
    maximum-likelihood model (expectationMaximisation + ...Trials,
    cPecanEm.py:107-242).  engine: "host" (f64 scan), "pallas" (device
    batches), or "auto" (pallas off-CPU)."""
    from .realign import load_sequences, realign_record

    dist_run = os.environ.get("SIGALIGN_COORDINATOR") is not None
    if dist_run:
        from ..parallel import distributed
        if not distributed.is_initialized():
            distributed.initialize()   # must precede any backend-touching call
    if engine == "auto":
        import jax
        engine = "host" if jax.default_backend() == "cpu" else "pallas"

    params = params or AlignmentParams()
    seqs = load_sequences(fasta_files)
    with open(alignment_file) as fh:
        records = list(read_cigars(fh))
    chunks = chunk_alignments(records, max_bases_per_chunk)
    log(f"em - {len(records)} alignments in {len(chunks)} chunks "
        f"(engine {engine})")

    rng = np.random.default_rng(seed)
    best: DiscreteHmm | None = None
    for trial in range(trials):
        hmm = DiscreteHmm.empty(5, SYMBOL_NUMBER)
        hmm.randomize(rng)
        if set_jukes_cantor_divergence is not None:
            set_jukes_cantor(hmm, set_jukes_cantor_divergence)
        running = []
        trial_records, trial_chunks = records, chunks
        for it in range(iterations):
            acc = _estep_all_chunks(trial_chunks, seqs, params, hmm, engine,
                                    dist_run)
            acc.normalize()
            if tie_emission_params:
                tie_emissions(acc)
            running.append(acc.likelihood)
            log(f"em - trial {trial} iteration {it}: likelihood {acc.likelihood:.2f}")
            hmm = acc
            if update_band and it < iterations - 1:
                # re-banding step (calculateAlignments, cPecanEm.py:212-242):
                # realign with the new model so the next E-step's guide
                # alignments (anchors/bands) track the improving model.
                # Under multi-host this runs identically on every host
                # (deterministic, comm-free) so chunk lists stay in sync.
                new_records = []
                for rec in trial_records:
                    out = realign_record(rec, seqs, params, hmm=hmm)
                    if out:
                        new_records.extend(out)
                if new_records:
                    trial_records = new_records
                    trial_chunks = chunk_alignments(trial_records,
                                                    max_bases_per_chunk)
        hmm.running_likelihoods = running
        if best is None or hmm.likelihood > best.likelihood:
            best = hmm
    if not dist_run or __import__("jax").process_index() == 0:
        best.write(output_model)
    return best


def make_blast_scoring_matrix(hmm: DiscreteHmm, sequences: list[str]):
    """lastz-style scoring matrix from a trained HMM (makeBlastScoringMatrix,
    cPecanEm.py:301-339)."""
    t = hmm.transitions
    e = hmm.emissions
    # collapse to three states
    t3 = np.zeros((3, 3))
    t3[:] = t[:3, :3]
    row = t3.sum(axis=1, keepdims=True)
    t3 = t3 / row
    match_e = e[0] / e[0].sum()

    gc = sum(sum(1.0 for c in s if c in "GC") for s in sequences) / \
        max(sum(len(s) for s in sequences), 1)

    def base_prob(x):
        return gc / 2.0 if x in (1, 2) else (1.0 - gc) / 2.0

    match_probs = [match_e[x, y] / (base_prob(x) * base_prob(y))
                   for x, y in product(range(4), range(4))]
    match_continue = t3[0, 0]
    n_prob = math.sqrt(math.exp(
        (6.94 + sum(math.log(x * match_continue) for x in match_probs))
        / len(match_probs)))
    weight = 100
    match_scores = [weight * math.log(x * match_continue / n_prob**2)
                    for x in match_probs]
    gap_open = weight * math.log(
        (0.5 * (t3[0, 1] / n_prob + t3[0, 2] / n_prob))
        * ((t3[1, 0] + t3[2, 0]) / (2 * n_prob**2))
        * (n_prob**2 / match_continue))
    gap_extend = weight * math.log(0.5 * (t3[1, 1] / n_prob + t3[2, 2] / n_prob))
    return match_scores, gap_open, gap_extend


def write_lastz_scoring_matrix(fh, match_scores, gap_open, gap_extend) -> None:
    fh.write(f"gap_open_penalty = {int(round(-gap_open))}\n")
    fh.write(f"gap_extend_penalty = {int(round(-gap_extend))}\n")
    bases = "ACGT"
    fh.write("\t\t" + "\t".join(bases) + "\n")
    for x in range(4):
        row = "\t".join(str(int(round(v)))
                        for v in match_scores[x * 4:(x + 1) * 4])
        fh.write(f"\t{bases[x]}\t{row}\n")


def main(argv=None):
    from ..utils.platform import ensure_host_platform
    ensure_host_platform()
    ap = argparse.ArgumentParser(description="nucleotide HMM EM (cPecanEm equivalent)")
    ap.add_argument("--alignments", required=True)
    ap.add_argument("--fastas", nargs="+", required=True)
    ap.add_argument("--outputModel", required=True)
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--maxAlignmentLengthPerJob", type=int, default=1_000_000)
    ap.add_argument("--setJukesCantorStartingEmissions", type=float, default=None)
    ap.add_argument("--tieEmissions", action="store_true")
    ap.add_argument("--blastScoringMatrixFile", default=None)
    ap.add_argument("--engine", choices=("auto", "host", "pallas"),
                    default="auto",
                    help="E-step engine: host f64 scan per record, or each "
                         "chunk's records batched on device (pallas); auto "
                         "picks pallas off-CPU")
    args = ap.parse_args(argv)

    hmm = expectation_maximisation(
        args.alignments, args.fastas, args.outputModel,
        iterations=args.iterations, trials=args.trials,
        max_bases_per_chunk=args.maxAlignmentLengthPerJob,
        set_jukes_cantor_divergence=args.setJukesCantorStartingEmissions,
        tie_emission_params=args.tieEmissions, engine=args.engine)
    if args.blastScoringMatrixFile:
        from .realign import load_sequences
        seqs = list(load_sequences(args.fastas).values())
        with open(args.blastScoringMatrixFile, "w") as fh:
            write_lastz_scoring_matrix(fh, *make_blast_scoring_matrix(hmm, seqs))
    return 0


if __name__ == "__main__":
    sys.exit(main())
