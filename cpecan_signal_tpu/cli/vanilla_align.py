"""Signal alignment pipeline + CLI: the vanillaAlign equivalent.

Given a reference sequence, an npRead and pore models, aligns template and
complement event sequences to the reference with anchor banding and writes the
15-column posterior TSV (writePosteriorProbs, vanillaAlign.c:26-96).

The guide alignment comes from the built-in seed-chain anchorer (both strands
tried; the reference shells out to bwa for this, nanoporeLib.py:202-235) or
from an exonerate CIGAR file.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..anchor.seed_chain import get_anchor_pairs
from ..constants import KMER_LENGTH, MODEL_PARAMS, PAIR_ALIGNMENT_PROB_1
from ..core.anchors import (cigar_to_anchor_pairs, filter_to_remove_overlap,
                            remap_anchor_pairs_with_offset)
from ..core.kmers import kmer_rank
from ..engine.align import AlignedPairs, align_events_to_target
from ..io.cigar import CigarRecord, parse_cigar_line
from ..io.fasta import read_first_sequence, reverse_complement
from ..io.npread import NanoporeRead, load_npread
from ..models.params import AlignmentParams, cli_defaults
from ..models.pore_model import PoreModel, load_pore_model, scale_model
from ..models.state_machines import (make_signal_sm3, make_signal_sm4,
                                     make_signal_vanilla)


def guide_alignment(ref_seq: str, read_seq: str, trim: int) -> CigarRecord | None:
    """Built-in guide: seed-chain on both strands, pick the larger chain.

    Returns a CigarRecord-shaped guide whose ops are one M block per chained
    anchor run (enough structure for guideAlignmentToRebasedAnchorPairs).
    """
    best = None
    for strand1, ref in ((True, ref_seq), (False, reverse_complement(ref_seq))):
        pairs = get_anchor_pairs(ref, read_seq)
        if len(pairs) == 0:
            continue
        score = len(pairs)
        if best is None or score > best[0]:
            best = (score, strand1, pairs)
    if best is None:
        return None
    _, strand1, pairs = best
    n = len(ref_seq)
    # convert runs of consecutive pairs into M blocks with I/D gaps
    ops: list[tuple[str, int]] = []
    px, py = pairs[0]
    ops.append(("M", 1))
    for x, y in pairs[1:]:
        dx, dy = x - px, y - py
        if dx == 1 and dy == 1:
            op, ln = ops[-1]
            ops[-1] = ("M", ln + 1)
        else:
            if dx > 1:
                ops.append(("D", int(dx - 1)))
            if dy > 1:
                ops.append(("I", int(dy - 1)))
            ops.append(("M", 1))
        px, py = x, y
    start1_f = int(pairs[0, 0])
    end1_f = int(pairs[-1, 0]) + 1
    if strand1:
        start1, end1 = start1_f, end1_f
    else:
        # coordinates of the reverse-strand window on the forward reference,
        # flipped so start1 > end1 (bwa-style '-' strand record)
        start1, end1 = n - start1_f, n - end1_f
    return CigarRecord(
        contig1="ref", start1=start1, end1=end1, strand1=strand1,
        contig2="read", start2=int(pairs[0, 1]), end2=int(pairs[-1, 1]) + 1,
        strand2=True, score=float(len(pairs)), ops=ops)


def rebased_anchor_pairs(guide: CigarRecord, trim: int) -> np.ndarray:
    """guideAlignmentToRebasedAnchorPairs (vanillaAlign.c:278-299): rebase the
    reference coordinates to 0 on the aligned (possibly reverse) strand."""
    if guide.strand1:
        start1, start2 = guide.start1 - guide.start1, guide.start2
    else:
        start1, start2 = 0, guide.start2
    pairs = cigar_to_anchor_pairs(start1, start2, guide.ops, trim)
    if len(pairs) == 0:
        return pairs
    order = np.lexsort((pairs[:, 1], pairs[:, 0]))
    return filter_to_remove_overlap(pairs[order])


def write_posterior_probs(fh, read_label: str, contig: str, match_model: np.ndarray,
                          scale: float, shift: float, events: np.ndarray,
                          target: str, forward: bool, event_offset: int,
                          ref_offset: int, pairs: AlignedPairs, strand: str) -> None:
    """15-column TSV rows (writePosteriorProbs, vanillaAlign.c:26-96)."""
    ref_len = len(target)
    ref_len_in_events = ref_len - KMER_LENGTH
    for prob, x_i, y0 in pairs.as_tuples():
        if (strand == "t" and forward) or (strand == "c" and not forward):
            x_adj = x_i + ref_offset
        else:
            x_adj = ref_len_in_events - (x_i + (ref_len - ref_offset))
        y = y0 + event_offset
        p = prob / PAIR_ALIGNMENT_PROB_1
        mean, noise, duration = events[y]
        descaled_mean = (mean - shift) / scale
        k_i = target[x_i:x_i + KMER_LENGTH]
        rank = kmer_rank(k_i)
        if rank < len(match_model) - 2:
            e_level = match_model[rank, 0]
            e_noise = match_model[rank, 2]
        else:
            e_level = e_noise = 0.0
        descaled_e_level = (e_level - shift) / scale
        ref_kmer = k_i if ((strand == "t" and forward) or
                           (strand == "c" and not forward)) else \
            reverse_complement(k_i)
        fh.write(f"{contig}\t{x_adj}\t{ref_kmer}\t{read_label}\t{strand}\t{y}\t"
                 f"{mean:f}\t{noise:f}\t{duration:f}\t{k_i}\t{e_level:f}\t"
                 f"{e_noise:f}\t{p:f}\t{descaled_mean:f}\t{descaled_e_level:f}\n")


def make_sm_factory(sm_type: str, pore: PoreModel, strand: str,
                    transitions=None, kmer_gap_probs=None, skip_bins=None,
                    hdp_density=None):
    if sm_type == "threeState":
        return lambda t, e: make_signal_sm3(pore, t, e, transitions, kmer_gap_probs)
    if sm_type == "fourState":
        return lambda t, e: make_signal_sm4(pore, t, e, transitions, kmer_gap_probs)
    if sm_type == "vanilla":
        sname = "template" if strand == "t" else "complement"
        return lambda t, e: make_signal_vanilla(pore, t, e, sname, skip_bins)
    if sm_type == "threeStateHdp":
        from ..models.state_machines import make_signal_sm3_hdp
        return lambda t, e: make_signal_sm3_hdp(hdp_density, t, e, transitions)
    if sm_type == "echelon":
        from ..models.state_machines import make_signal_echelon
        sname = "template" if strand == "t" else "complement"
        return lambda t, e: make_signal_echelon(pore, t, e, sname, skip_bins)
    raise ValueError(f"unsupported state machine type {sm_type}")


def align_read(ref_seq: str, contig: str, npread: NanoporeRead,
               template_model: PoreModel, complement_model: PoreModel,
               params: AlignmentParams, sm_type: str = "threeState",
               guide: CigarRecord | None = None, substitute: str | None = None,
               read_label: str = "read", out_fh=None,
               template_hdp_density=None, complement_hdp_density=None,
               template_transitions=None, complement_transitions=None,
               template_kmer_gaps=None, complement_kmer_gaps=None,
               template_skip_bins=None, complement_skip_bins=None,
               dtype=None, device_batch: bool = False) -> dict:
    """Full two-strand signal alignment of one read (vanillaAlign.c:361-805).

    device_batch=True stacks both strands' split jobs into one device batch
    through the Pallas window path (engine/batch_align) instead of running
    per-strand serial scans; echelon rides the same path with one posterior
    channel per matchN state (ops/pallas_fb pstates)."""
    prep = prepare_read(ref_seq, npread, params, sm_type=sm_type, guide=guide,
                        substitute=substitute,
                        template_model=template_model,
                        complement_model=complement_model,
                        template_hdp_density=template_hdp_density,
                        complement_hdp_density=complement_hdp_density,
                        template_transitions=template_transitions,
                        complement_transitions=complement_transitions,
                        template_kmer_gaps=template_kmer_gaps,
                        complement_kmer_gaps=complement_kmer_gaps,
                        template_skip_bins=template_skip_bins,
                        complement_skip_bins=complement_skip_bins)
    if prep["status"] != "ok":
        return prep
    pairs_by_strand = compute_pairs(prep, params, sm_type,
                                    device_batch=device_batch, dtype=dtype)
    return finish_read(prep, pairs_by_strand, out_fh, read_label, contig)


def prepare_read(ref_seq: str, npread: NanoporeRead, params: AlignmentParams,
                 *, sm_type: str, guide: CigarRecord | None,
                 substitute: str | None, template_model, complement_model,
                 template_hdp_density=None, complement_hdp_density=None,
                 template_transitions=None, complement_transitions=None,
                 template_kmer_gaps=None, complement_kmer_gaps=None,
                 template_skip_bins=None, complement_skip_bins=None) -> dict:
    """Phase 1 of align_read: guide, reference trimming, per-strand event
    windows/anchors and state-machine factories — everything up to (but not
    including) running the DP engine, so a multi-read driver can pool split
    jobs across reads before touching the device."""

    if guide is None:
        guide = guide_alignment(ref_seq, npread.twoD_read,
                                params.constraint_diagonal_trim)
    if guide is None:
        return {"status": "unmapped"}

    if sm_type == "threeStateHdp":
        npread = npread.descale()

    # slice the reference window on the mapped strand
    if guide.strand1:
        trimmed = ref_seq[guide.start1:guide.end1]
    else:
        trimmed = reverse_complement(ref_seq[guide.end1:guide.start1])
    rc_trimmed = reverse_complement(trimmed)
    t_target = trimmed if substitute is None else trimmed.replace("C", substitute)
    c_target = rc_trimmed if substitute is None else rc_trimmed.replace("C", substitute)

    anchors = rebased_anchor_pairs(guide, params.constraint_diagonal_trim)
    forward = guide.strand1

    results = {"status": "ok", "n_anchors": len(anchors)}
    end2 = min(guide.end2, len(npread.template_event_map) - 1)
    lX_kmers = len(trimmed) - KMER_LENGTH + 1

    # --- template strand: event map increases with read position ---
    tm = npread.template_event_map
    ev_start_t = int(tm[guide.start2])
    ev_end_t = int(tm[end2])
    t_events = npread.template_events[ev_start_t:ev_end_t]
    t_anchors = remap_anchor_pairs_with_offset(anchors, tm, guide.start2)
    if len(t_anchors):
        ok_t = ((t_anchors[:, 0] >= 0) & (t_anchors[:, 0] < max(lX_kmers, 1))
                & (t_anchors[:, 1] >= 0) & (t_anchors[:, 1] < max(len(t_events), 1)))
        t_anchors = t_anchors[ok_t]
    t_anchors = filter_to_remove_overlap(t_anchors)

    # --- complement strand: the complement event map *decreases* with read
    # position (the complement strand is sequenced in reverse,
    # get_twoD_event_map, nanoporeLib.py:423-514).  The reference's literal
    # window arithmetic (vanillaAlign.c:301-316) degenerates on forward-mapped
    # reads (negative-length window); here the intended alignment is built:
    # complement events [cm[end2], cm[start2]) in increasing order against the
    # reverse-complement target, anchors mirrored on both axes.
    cm = npread.complement_event_map
    ev_lo_c = int(cm[end2])
    ev_hi_c = int(cm[guide.start2])
    c_events = npread.complement_events[ev_lo_c:ev_hi_c]
    if len(anchors):
        cx = (lX_kmers - 1) - anchors[:, 0]
        cy = cm[np.minimum(anchors[:, 1] + guide.start2, len(cm) - 1)] - ev_lo_c
        c_anchors = np.stack([cx, cy], axis=1)[::-1]
        ok = (c_anchors[:, 0] >= 0) & (c_anchors[:, 1] >= 0) & \
             (c_anchors[:, 0] < max(lX_kmers, 1)) & (c_anchors[:, 1] < max(len(c_events), 1))
        c_anchors = filter_to_remove_overlap(c_anchors[ok])
    else:
        c_anchors = anchors

    strand_ctx = []
    for strand, target, raw_target, model, sparams, events_all, strand_events, \
            strand_anchors, hdp_d, trans, kgaps, sbins, ref_off, ev_off in (
            ("t", t_target, trimmed, template_model, npread.template_params,
             npread.template_events, t_events, t_anchors, template_hdp_density,
             template_transitions, template_kmer_gaps, template_skip_bins,
             guide.start1, ev_start_t),
            ("c", c_target, rc_trimmed, complement_model, npread.complement_params,
             npread.complement_events, c_events, c_anchors, complement_hdp_density,
             complement_transitions, complement_kmer_gaps, complement_skip_bins,
             guide.end1, ev_lo_c)):
        scaled = model
        if sm_type != "threeStateHdp" and model is not None:
            scaled = scale_model(model, sparams.scale, sparams.shift, sparams.var,
                                 sparams.scale_sd, sparams.var_sd)
        make_sm = (make_sm_factory(sm_type, scaled, strand, trans, kgaps,
                                   skip_bins=sbins, hdp_density=hdp_d)
                   if len(strand_events) else None)
        strand_ctx.append({
            "strand": strand, "target": target, "raw_target": raw_target,
            "scaled": scaled, "sparams": sparams, "events_all": events_all,
            "events": strand_events, "anchors": strand_anchors,
            "ref_off": ref_off, "ev_off": ev_off, "make_sm": make_sm,
        })
    results["forward"] = forward
    results["strand_ctx"] = strand_ctx
    return results


def compute_pairs(prep: dict, params: AlignmentParams, sm_type: str, *,
                  device_batch: bool = False, dtype=None) -> dict:
    """Phase 2 of align_read: run the DP engine per strand — device-batched
    (both strands' split jobs stacked) or serial."""
    empty = AlignedPairs(*(np.zeros(0, dtype=np.int64),) * 3)
    pairs_by_strand: dict[str, AlignedPairs] = {}
    if device_batch:
        from ..engine.align import collect_split_jobs
        from ..engine.batch_align import assemble_pairs, batch_align_jobs
        all_jobs, owners = [], []
        for ctx in prep["strand_ctx"]:
            if ctx["make_sm"] is None:
                pairs_by_strand[ctx["strand"]] = empty
                continue
            jobs = collect_split_jobs(ctx["make_sm"], ctx["target"],
                                      ctx["events"], ctx["anchors"], params,
                                      ragged_left=True, ragged_right=True)
            all_jobs.extend(jobs)
            owners.extend(ctx["strand"] for _ in jobs)
        frags = batch_align_jobs(all_jobs, params.threshold)
        for strand in ("t", "c"):
            if strand not in pairs_by_strand:
                pairs_by_strand[strand] = assemble_pairs(
                    [f for f, o in zip(frags, owners) if o == strand])
    else:
        for ctx in prep["strand_ctx"]:
            if ctx["make_sm"] is None:
                pairs_by_strand[ctx["strand"]] = empty
                continue
            pairs_by_strand[ctx["strand"]] = align_events_to_target(
                ctx["make_sm"], ctx["target"], ctx["events"], ctx["anchors"],
                params, ragged_left=True, ragged_right=True, dtype=dtype,
                multi_match=(sm_type == "echelon"))
    return pairs_by_strand


def finish_read(prep: dict, pairs_by_strand: dict, out_fh, read_label: str,
                contig: str) -> dict:
    """Phase 3 of align_read: TSV rows + result assembly."""
    results = {"status": "ok", "n_anchors": prep["n_anchors"]}
    for ctx in prep["strand_ctx"]:
        pairs = pairs_by_strand[ctx["strand"]]
        results[ctx["strand"]] = pairs
        if out_fh is not None:
            scaled = ctx["scaled"]
            write_posterior_probs(out_fh, read_label, contig,
                                  scaled.match_model if scaled else
                                  np.zeros((2, MODEL_PARAMS)),
                                  ctx["sparams"].scale, ctx["sparams"].shift,
                                  ctx["events_all"], ctx["raw_target"],
                                  prep["forward"], ctx["ev_off"],
                                  ctx["ref_off"], pairs, ctx["strand"])
    return results


def main(argv=None):
    from ..utils.platform import ensure_host_platform
    platform = ensure_host_platform()
    ap = argparse.ArgumentParser(description="signal alignment (vanillaAlign equivalent)")
    ap.add_argument("--reference", "-r", required=True)
    ap.add_argument("--npRead", "-q", required=True)
    ap.add_argument("--templateModel", "-T", default="/root/reference/models/template_median68pA.model")
    ap.add_argument("--complementModel", "-C", default="/root/reference/models/complement_median68pA_pop2.model")
    ap.add_argument("--posteriors", "-u", default=None)
    ap.add_argument("--readLabel", "-L", default="read")
    ap.add_argument("--strawMan", "-s", action="store_true")
    ap.add_argument("--fourState", "-f", action="store_true")
    ap.add_argument("--echelon", "-e", action="store_true")
    ap.add_argument("--threeStateHdp", action="store_true")
    ap.add_argument("--templateHmm", "-y", default=None,
                    help="trained template HMM to load (vanillaAlign -y)")
    ap.add_argument("--complementHmm", "-z", default=None)
    ap.add_argument("--templateHdp", "-v", default=None,
                    help="serialized template NanoporeHDP (threeStateHdp)")
    ap.add_argument("--complementHdp", "-w", default=None)
    ap.add_argument("--substitute", "-M", default=None)
    ap.add_argument("--threshold", "-D", type=float, default=0.01)
    ap.add_argument("--diagonalExpansion", "-x", type=int, default=50)
    ap.add_argument("--constraintTrim", "-m", type=int, default=14)
    ap.add_argument("--cigar", default=None, help="guide alignment cigar file (else built-in anchorer)")
    args = ap.parse_args(argv)

    sm_type = ("threeState" if args.strawMan else
               "fourState" if args.fourState else
               "echelon" if args.echelon else
               "threeStateHdp" if args.threeStateHdp else "vanilla")
    contig, ref_seq = read_first_sequence(args.reference)
    npread = load_npread(args.npRead)
    tmodel = load_pore_model(args.templateModel)
    cmodel = load_pore_model(args.complementModel)
    params = cli_defaults().with_(threshold=args.threshold,
                                  diagonal_expansion=args.diagonalExpansion,
                                  constraint_diagonal_trim=args.constraintTrim)
    guide = None
    if args.cigar:
        with open(args.cigar) as fh:
            guide = parse_cigar_line(fh.readline())

    # trained-model loading (vanillaAlign -y/-z, vanillaAlign.c:223-226)
    trained = {"t": {"transitions": None, "kmer_gap_probs": None,
                     "skip_bins": None},
               "c": {"transitions": None, "kmer_gap_probs": None,
                     "skip_bins": None}}
    for strand, path in (("t", args.templateHmm), ("c", args.complementHmm)):
        if path:
            from ..em.accumulators import load_signal_hmm, signal_sm_params
            trained[strand] = signal_sm_params(load_signal_hmm(path))

    # HDP densities (threeStateHdp alignment path).  With --substitute the
    # target contains expanded-alphabet symbols (E/O), so the density must
    # rank k-mers over the HDP's own alphabet (alphabet_density_fn).
    hdp_density = {"t": None, "c": None}
    for strand, path in (("t", args.templateHdp), ("c", args.complementHdp)):
        if path:
            from ..hdp.nanopore import deserialize_nhdp
            nhdp = deserialize_nhdp(path)
            hdp_density[strand] = (nhdp.alphabet_density_fn()
                                   if args.substitute
                                   else nhdp.density_logp_fn())
    if sm_type == "threeStateHdp" and (hdp_density["t"] is None or
                                       hdp_density["c"] is None):
        print("threeStateHdp needs --templateHdp and --complementHdp",
              file=sys.stderr)
        return 1

    # "w", not "a": re-running into an existing file must not duplicate rows
    # (the reference writes a fresh per-read temp file per invocation,
    # nanoporeLib.py:883-966, so append semantics were never load-bearing)
    out_fh = open(args.posteriors, "w") if args.posteriors else None
    try:
        res = align_read(ref_seq, contig, npread, tmodel, cmodel, params,
                         sm_type=sm_type, guide=guide, substitute=args.substitute,
                         read_label=args.readLabel, out_fh=out_fh,
                         template_hdp_density=hdp_density["t"],
                         complement_hdp_density=hdp_density["c"],
                         template_transitions=trained["t"]["transitions"],
                         complement_transitions=trained["c"]["transitions"],
                         template_kmer_gaps=trained["t"]["kmer_gap_probs"],
                         complement_kmer_gaps=trained["c"]["kmer_gap_probs"],
                         template_skip_bins=trained["t"]["skip_bins"],
                         complement_skip_bins=trained["c"]["skip_bins"],
                         device_batch=(platform != "cpu"))
    finally:
        if out_fh:
            out_fh.close()
    if res["status"] != "ok":
        print(f"{args.readLabel} unmapped", file=sys.stderr)
        return 1
    t, c = res["t"], res["c"]
    print(f"{args.readLabel} {res['n_anchors']}\t{len(t.probs)}({t.score:f})\t"
          f"{len(c.probs)}({c.score:f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
