"""Multi-read alignment driver: the signalAlign.py equivalent.

Enumerates fast5 / npRead files (shuffled, capped at --nb_files), aligns each
read's template and complement strands against the reference and appends the
15-column posterior TSV (signalAlign.py:54-146).  The reference distributes
reads over a multiprocessing worker pool; here reads run in-process by default
(--jobs N restores process-level data parallelism), and chip-level batching
goes through parallel/mesh + the window/pallas engines.
"""

from __future__ import annotations

import argparse
import glob
import os
import random
import sys

from ..models.params import cli_defaults
from ..models.pore_model import load_pore_model
from ..io.fasta import read_first_sequence


class TargetRegions:
    """BED-ish region filter (TargetRegions, nanoporeLib.py:246-270)."""

    def __init__(self, path: str):
        self.regions = []
        with open(path) as fh:
            for line in fh:
                f = line.split()
                if len(f) >= 2:
                    self.regions.append((int(f[0]), int(f[1])))

    def hits(self, start: int, end: int) -> bool:
        return any(s <= end and start <= e for s, e in self.regions)


def _align_one(args):
    """Aligns one read, writing rows to a per-read temp TSV (the reference's
    per-read temp dirs, nanoporeLib.py:764-972 — concurrent appends from N
    workers to one file can interleave >4KB writes).  Returns the temp path
    for the driver to merge."""
    (path, ref_seq, contig, tmodel_path, cmodel_path, params, sm_type,
     out_tsv, substitute, regions_path) = args
    import jax
    from ..utils.platform import ensure_host_platform
    platform = ensure_host_platform()
    from ..io.npread import load_npread
    from ..models.pore_model import load_pore_model
    from .vanilla_align import align_read, guide_alignment

    label = os.path.basename(path)
    # part-file names must be unique per (process, work item): duplicate
    # basenames are possible when --file_directory is a glob spanning
    # directories, so key on a digest of the full path, not the basename
    import hashlib
    uniq = hashlib.sha1(path.encode()).hexdigest()[:12]
    try:
        if path.endswith(".fast5"):
            from ..io.fast5 import fast5_to_npread
            npread = fast5_to_npread(path)
        else:
            npread = load_npread(path)
    except Exception as exc:  # unreadable/malformed reads are skipped
        return (label, f"error: {exc}", None)

    guide = guide_alignment(ref_seq, npread.twoD_read,
                            params.constraint_diagonal_trim)
    if guide is None:
        return (label, "unmapped", None)
    if regions_path is not None:
        regions = TargetRegions(regions_path)
        lo, hi = sorted((guide.start1, guide.end1))
        if not regions.hits(lo, hi):
            return (label, "outside target regions", None)

    tmodel = load_pore_model(tmodel_path)
    cmodel = load_pore_model(cmodel_path)
    tmp_tsv = f"{out_tsv}.{os.getpid()}.{uniq}.part" if out_tsv else None
    out_fh = open(tmp_tsv, "w") if tmp_tsv else None
    try:
        res = align_read(ref_seq, contig, npread, tmodel, cmodel, params,
                         sm_type=sm_type, guide=guide, substitute=substitute,
                         read_label=label, out_fh=out_fh,
                         device_batch=(platform != "cpu"))
    except Exception as exc:  # engine failure -> retryable worker error
        if tmp_tsv and os.path.exists(tmp_tsv):
            os.unlink(tmp_tsv)
        return (label, f"error: {exc}", None)
    finally:
        if out_fh:
            out_fh.close()
    if res["status"] != "ok":
        if tmp_tsv:
            os.unlink(tmp_tsv)
        return (label, res["status"], None)
    t, c = res["t"], res["c"]
    return (label, f"{res['n_anchors']} anchors, "
                   f"t {len(t.probs)}({t.score:.2f}) c {len(c.probs)}({c.score:.2f})",
            tmp_tsv)


def _batch_align_all(work):
    """Cross-read device batching (single-process TPU path): pool EVERY
    read's split jobs (reads x strands x splits) into bucketed device batches
    (engine/batch_align), run the chip once per bucket, then write per-read
    part TSVs.  Same (label, msg, part) contract as _align_one."""
    import os

    from ..engine.align import collect_split_jobs
    from ..engine.batch_align import assemble_pairs, batch_align_stream
    from ..io.npread import load_npread
    from ..models.pore_model import load_pore_model
    from .vanilla_align import finish_read, guide_alignment, prepare_read

    out_early = []
    preps = []               # (label, widx, prep, contig, params, out_tsv)
    owners = []
    models = {}
    threshold = work[0][5].threshold if work else 0.01

    def per_read_jobs():
        """Per-read prep as a lazy stream: batch_align_stream dispatches
        device waves while later reads' fast5/npRead loading, guide
        alignment, and split/band prep still run on the host."""
        for widx, w in enumerate(work):
            (path, ref_seq, contig, tmodel_path, cmodel_path, params,
             sm_type, out_tsv, substitute, regions_path) = w
            label = os.path.basename(path)
            # per-read containment: a corrupt read degrades to a retryable
            # 'error:' result instead of killing the whole batch
            try:
                if path.endswith(".fast5"):
                    from ..io.fast5 import fast5_to_npread
                    npread = fast5_to_npread(path)
                else:
                    npread = load_npread(path)
                guide = guide_alignment(ref_seq, npread.twoD_read,
                                        params.constraint_diagonal_trim)
                if guide is None:
                    out_early.append((widx, label, "unmapped", None))
                    continue
                if regions_path is not None:
                    regions = TargetRegions(regions_path)
                    lo, hi = sorted((guide.start1, guide.end1))
                    if not regions.hits(lo, hi):
                        out_early.append((widx, label,
                                          "outside target regions", None))
                        continue
                for mp in (tmodel_path, cmodel_path):
                    if mp not in models:
                        models[mp] = load_pore_model(mp)
                prep = prepare_read(ref_seq, npread, params, sm_type=sm_type,
                                    guide=guide, substitute=substitute,
                                    template_model=models[tmodel_path],
                                    complement_model=models[cmodel_path])
                if prep["status"] != "ok":
                    out_early.append((widx, label, prep["status"], None))
                    continue
                key = len(preps)
                read_jobs = []
                for ctx in prep["strand_ctx"]:
                    if ctx["make_sm"] is None:
                        continue
                    jobs = collect_split_jobs(ctx["make_sm"], ctx["target"],
                                              ctx["events"], ctx["anchors"],
                                              params, ragged_left=True,
                                              ragged_right=True)
                    read_jobs.extend(jobs)
                    owners.extend((key, ctx["strand"]) for _ in jobs)
            except Exception as exc:
                out_early.append((widx, label, f"error: {exc}", None))
                continue
            preps.append((label, widx, prep, contig, params, out_tsv))
            yield read_jobs

    try:
        _jobs, frags = batch_align_stream(per_read_jobs(), threshold)
    except Exception as exc:
        # a device/bucket failure degrades every pooled read to a retryable
        # error (the retry loop re-runs them through _align_one)
        return out_early + [(widx, label, f"error: {exc}", None)
                            for label, widx, *_rest in preps]

    out = []
    for key, (label, widx, prep, contig, params, out_tsv) in enumerate(preps):
        try:
            pairs = {s: assemble_pairs([f for f, o in zip(frags, owners)
                                        if o == (key, s)]) for s in ("t", "c")}
            tmp = (f"{out_tsv}.{os.getpid()}.{widx}.part" if out_tsv else None)
            fh = open(tmp, "w") if tmp else None
            try:
                res = finish_read(prep, pairs, fh, label, contig)
            finally:
                if fh:
                    fh.close()
            t, c = res["t"], res["c"]
            out.append((widx, label, f"{res['n_anchors']} anchors, "
                        f"t {len(t.probs)}({t.score:.2f}) "
                        f"c {len(c.probs)}({c.score:.2f})", tmp))
        except Exception as exc:
            out.append((widx, label, f"error: {exc}", None))
    return out_early + out


def main(argv=None):
    from ..utils.platform import ensure_host_platform
    platform = ensure_host_platform()
    ap = argparse.ArgumentParser(description="align many reads (signalAlign equivalent)")
    ap.add_argument("--file_directory", "-d", required=True,
                    help="directory of .fast5 or .npRead files (or a glob)")
    ap.add_argument("--ref", "-r", required=True)
    ap.add_argument("--output_location", "-o", required=True)
    ap.add_argument("--templateModel", "-T",
                    default="/root/reference/models/template_median68pA.model")
    ap.add_argument("--complementModel", "-C",
                    default="/root/reference/models/complement_median68pA_pop2.model")
    ap.add_argument("--strawMan", "-s", action="store_true")
    ap.add_argument("--fourState", action="store_true")
    ap.add_argument("--echelon", action="store_true")
    ap.add_argument("--nb_files", "-n", type=int, default=500)
    ap.add_argument("--jobs", "-j", type=int, default=1)
    ap.add_argument("--threshold", "-t", type=float, default=0.01)
    ap.add_argument("--diagonalExpansion", "-e", type=int, default=50)
    ap.add_argument("--constraintTrim", "-m", type=int, default=14)
    ap.add_argument("--targetRegions", "-q", default=None)
    ap.add_argument("--retries", type=int, default=2,
                    help="re-attempts for reads that fail with an error "
                         "(the jobTree retry story, SURVEY P5)")
    ap.add_argument("--un_banded", "-ub", action="store_true")
    ap.add_argument("--substitute", "-M", default=None)
    args = ap.parse_args(argv)

    sm_type = ("threeState" if args.strawMan else
               "fourState" if args.fourState else
               "echelon" if args.echelon else "vanilla")
    contig, ref_seq = read_first_sequence(args.ref)
    params = cli_defaults().with_(
        threshold=args.threshold, diagonal_expansion=args.diagonalExpansion,
        constraint_diagonal_trim=args.constraintTrim)
    if args.un_banded:
        params = params.with_(diagonal_expansion=2, anchor_matrix_bigger_than_this=1 << 62)

    if os.path.isdir(args.file_directory):
        paths = sorted(glob.glob(os.path.join(args.file_directory, "*.fast5"))
                       + glob.glob(os.path.join(args.file_directory, "*.npRead")))
    else:
        paths = sorted(glob.glob(args.file_directory))

    # multi-host launch: SIGALIGN_COORDINATOR brings up jax.distributed and
    # each host aligns its own slice of the (deterministically shuffled)
    # read list, writing a per-host part file merged by process 0 (the
    # multi-host form of the reference's worker queue,
    # scripts/signalAlign.py:103-146)
    dist_run = os.environ.get("SIGALIGN_COORDINATOR") is not None
    if dist_run:
        from ..parallel import distributed
        if not distributed.is_initialized():
            distributed.initialize()
        # all hosts must agree on the shuffled order before partitioning
        random.Random(0x51).shuffle(paths)
    else:
        random.shuffle(paths)  # signalAlign.py:92 shuffles before capping
    paths = paths[:args.nb_files]
    if dist_run:
        import jax
        paths = distributed.partition_paths(paths)
        print(f"signal_align - process {jax.process_index()}/"
              f"{jax.process_count()}: {len(paths)} reads", file=sys.stderr)
    if not paths and not dist_run:
        print("signal_align - no input files", file=sys.stderr)
        return 1

    os.makedirs(args.output_location, exist_ok=True)
    out_tsv = os.path.join(args.output_location, "posteriors.tsv")
    if dist_run:
        import jax

        from ..parallel.distributed import barrier
        # process 0 clears the final TSV and any stale part files BEFORE the
        # append-mode merge: re-running into an existing output directory
        # must not silently duplicate rows
        if jax.process_index() == 0:
            for stale in glob.glob(os.path.join(args.output_location,
                                                "posteriors.part*.tsv")):
                os.unlink(stale)
            if os.path.exists(out_tsv):
                os.unlink(out_tsv)
        barrier("signal_align_clean")
        out_tsv = os.path.join(args.output_location,
                               f"posteriors.part{jax.process_index()}.tsv")
    elif os.path.exists(out_tsv):
        os.unlink(out_tsv)
    work = [(p, ref_seq, contig, args.templateModel, args.complementModel,
             params, sm_type, out_tsv, args.substitute, args.targetRegions)
            for p in paths]
    if args.jobs > 1:
        # spawn + CPU-only children: fork after XLA init deadlocks, and a
        # spawned child re-running the accelerator plugin's sitecustomize
        # would fight the parent for the device
        import multiprocessing as mp
        saved = {k: os.environ.get(k)
                 for k in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")}
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            with mp.get_context("spawn").Pool(args.jobs) as pool:
                results = [(i, *r)
                           for i, r in enumerate(pool.map(_align_one, work))]
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    elif platform != "cpu" and sm_type != "echelon":
        # single-process TPU path: pool all reads' split jobs on the chip
        results = _batch_align_all(work)
    else:
        results = [(i, *_align_one(w)) for i, w in enumerate(work)]

    # failure recovery: retry errored reads on the serial path, keyed by
    # work index — never by basename, which can collide across directories
    # (the reference's jobTree re-runs failed jobs; SURVEY §2.3 P5)
    for _attempt in range(max(args.retries, 0)):
        redo = [i for i, (_w, _l, m, _p) in enumerate(results)
                if m.startswith("error:")]
        if not redo:
            break
        for i in redo:
            widx, label = results[i][0], results[i][1]
            print(f"signal_align - retrying {label}", file=sys.stderr)
            results[i] = (widx, *_align_one(work[widx]))
    ok = 0
    with open(out_tsv, "a") as merged:
        for _widx, label, msg, part in results:
            print(f"signal_align - {label}: {msg}", file=sys.stderr)
            ok += "anchors" in msg
            if part and os.path.exists(part):
                with open(part) as fh:
                    merged.write(fh.read())
                os.unlink(part)
    if dist_run:
        # all hosts finished their slice; process 0 merges the part files
        # (shared filesystem, like the reference's expectation-file reduce)
        import jax

        from ..parallel.distributed import barrier
        barrier("signal_align_merge")
        if jax.process_index() == 0:
            final = os.path.join(args.output_location, "posteriors.tsv")
            with open(final, "a") as merged:
                for pid in range(jax.process_count()):
                    part = os.path.join(args.output_location,
                                        f"posteriors.part{pid}.tsv")
                    if os.path.exists(part):
                        with open(part) as fh:
                            merged.write(fh.read())
                        os.unlink(part)
            out_tsv = final
    print(f"signal_align - aligned {ok}/{len(results)} reads -> {out_tsv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
