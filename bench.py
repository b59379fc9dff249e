"""Benchmark: banded forward-backward + posterior decoding + EM throughput.

Runs the Pallas wavefront pipeline (emissions -> forward -> fused backward
with totals/posteriors/EM tallies) on a MIXED batch of real alignment
problems — the Zymo fixture read's template AND complement strands, full
reads plus windowed sub-reads of varied lengths — each with its own real
anchors and band.  Problems are bucketed by window width (W = 128/256/512)
so narrow-band reads don't pay the widest problem's padding; one pipeline
per bucket, all buckets timed together.

vs_baseline compares against THE REFERENCE ENGINE ITSELF: the reference
sources compiled in place at -O2 (parity/build/driver, see parity/), running
`getAlignedPairsUsingAnchors` single-core on byte-identical inputs (same
targets, events, anchors, scale params, banding parameters).  The BASELINE.md
target is >=10x single-core C.  Extra detail (per-bucket split, EM-step/s,
bandwidth estimate) goes to stderr; stdout carries the ONE JSON line
{"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "4"))

REPO = os.path.dirname(os.path.abspath(__file__))
DRIVER = os.path.join(REPO, "parity", "build", "driver")
REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
TMODEL = "/root/reference/models/template_median68pA.model"
CMODEL = "/root/reference/models/complement_median68pA_pop2.model"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_mixed_problems():
    """Distinct real problems: both strands, full + windowed sub-reads.
    Returns (pore, target, events, anchors, band, n_events, model_path, sp)."""
    from cpecan_signal_tpu.cli.train_models import _prepare_read
    from cpecan_signal_tpu.core.anchors import filter_to_remove_overlap
    from cpecan_signal_tpu.core.band import band_construct
    from cpecan_signal_tpu.constants import KMER_LENGTH
    from cpecan_signal_tpu.io.fasta import read_first_sequence
    from cpecan_signal_tpu.io.npread import load_npread
    from cpecan_signal_tpu.models.params import AlignmentParams
    from cpecan_signal_tpu.models.pore_model import load_pore_model, scale_model

    _, ref_seq = read_first_sequence(REF)
    npread = load_npread(NPREAD)
    params = AlignmentParams()
    prep = _prepare_read(ref_seq, npread, params)
    assert prep is not None

    problems = []
    for strand, model_path in (("t", TMODEL), ("c", CMODEL)):
        target, events, anchors, sp = prep[strand]
        pore = scale_model(load_pore_model(model_path), sp.scale, sp.shift,
                           sp.var, sp.scale_sd, sp.var_sd)
        lx = len(target) - KMER_LENGTH + 1

        def add(ev_lo, ev_hi):
            sub_a = anchors[(anchors[:, 1] >= ev_lo) & (anchors[:, 1] < ev_hi)]
            if len(sub_a) < 2:
                return
            x_lo = max(int(sub_a[0, 0]) - 10, 0)
            x_hi = min(int(sub_a[-1, 0]) + 10, lx - 1)
            sub = filter_to_remove_overlap(
                sub_a - np.asarray([[x_lo, ev_lo]], dtype=sub_a.dtype))
            t_sub = target[x_lo:x_hi + KMER_LENGTH]
            e_sub = events[ev_lo:ev_hi]
            band = band_construct(sub, len(t_sub) - KMER_LENGTH + 1,
                                  len(e_sub), params.diagonal_expansion)
            problems.append((pore, t_sub, e_sub, sub, band, len(e_sub),
                             model_path, sp))

        n = len(events)
        add(0, n)                      # full strand
        add(0, int(n * 0.55))          # leading window
        add(int(n * 0.3), n)           # trailing window
        add(int(n * 0.2), int(n * 0.85))
    return problems


def reference_engine_seconds(raw, params):
    """Single-core reference engine (compiled in place) on the same inputs.
    Returns list of seconds-per-align, one per distinct problem."""
    if not os.path.exists(DRIVER):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "parity")],
                           capture_output=True, text=True)
        if r.returncode != 0:
            log("bench - reference build failed; no baseline")
            return None
    secs = []
    with tempfile.TemporaryDirectory() as td:
        for i, (pore, target, events, anchors, band, n, model_path, sp) in \
                enumerate(raw):
            tp, ep, ap = (os.path.join(td, f"{i}.{x}")
                          for x in ("target", "events", "anchors"))
            with open(tp, "w") as fh:
                fh.write(target + "\n")
            with open(ep, "w") as fh:
                for m, s, d in np.asarray(events, dtype=np.float64):
                    fh.write(f"{m:.17g} {s:.17g} {d:.17g}\n")
            with open(ap, "w") as fh:
                for x, y in np.asarray(anchors, dtype=np.int64):
                    fh.write(f"{x} {y}\n")
            r = subprocess.run(
                [DRIVER, "bench", tp, ep, ap, model_path,
                 str(sp.scale), str(sp.shift), str(sp.var), str(sp.scale_sd),
                 str(sp.var_sd), "1", "1", "/dev/null",
                 str(params.threshold), str(params.diagonal_expansion)],
                capture_output=True, text=True, timeout=600)
            if r.returncode != 0:
                log(f"bench - reference engine failed on problem {i}: {r.stderr}")
                return None
            secs.append(float(json.loads(r.stdout)["seconds_per_align"]))
    return secs


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cpecan_signal_tpu.core.window import smooth_band
    from cpecan_signal_tpu.engine import pallas_pipeline as pp
    from cpecan_signal_tpu.models.params import AlignmentParams

    params = AlignmentParams()
    raw = build_mixed_problems()
    log(f"bench - {len(raw)} distinct problems, events: "
        f"{[n for *_x, n, _m, _s in raw]}")

    # --- bucket by per-problem window width ---
    wbands = [smooth_band(band, width_multiple=128)
              for *_a, band, _n, _m, _s in raw]
    instances = [i % len(raw) for i in range(BATCH)]
    buckets = {}  # W -> list of problem indices (with multiplicity)
    for i in instances:
        buckets.setdefault(wbands[i].W, []).append(i)
    # pad each bucket to a sublane-friendly multiple of 8 with more real
    # instances (counted in the throughput denominator — they are real work)
    for W, idxs in buckets.items():
        uniq = sorted(set(idxs))
        while len(idxs) % 8:
            idxs.append(uniq[len(idxs) % len(uniq)])
    instances = [i for idxs in buckets.values() for i in idxs]

    pipelines = []  # (W, batch, plan, ev_total)
    for W, idxs in sorted(buckets.items()):
        uniq = sorted(set(idxs))
        Dp = max(wbands[i].n_diagonals for i in uniq) + 2
        lxp = max(len(raw[i][1]) for i in uniq)
        lyp = max(len(raw[i][2]) for i in uniq)
        probs = {}
        plan = None
        for i in uniq:
            pore, target, events, _anchors, _band, n, _m, _s = raw[i]
            plan, probs[i] = pp.make_sm3_pallas_problem(
                pore, target, events, wbands[i], pad_lx=lxp, pad_ly=lyp,
                pad_d=Dp)
        batch = pp.stack_problems([probs[i] for i in idxs])
        ev = sum(raw[i][5] for i in idxs)
        log(f"bench - bucket W={W}: {len(idxs)} instances "
            f"({len(uniq)} distinct), Dp={Dp}, {ev} events")
        pipelines.append((W, batch, plan, ev))

    ev_total = sum(ev for *_x, ev in pipelines)
    jitted = [(pp.make_jit_pipeline(plan, W), batch)
              for W, batch, plan, _ev in pipelines]

    def run_all():
        outs = [fn(batch) for fn, batch in jitted]
        for out in outs:
            _ = np.asarray(out[4]).ravel()[:1]  # force full execution

    run_all()  # compile + warm
    times = []
    for _i in range(ITERS):
        t0 = time.perf_counter()
        run_all()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    events_per_sec = ev_total / dt

    # EM step throughput: full production E-step (tallies on device)
    ems = [(jax.jit(lambda b, plan=plan, W=W: pp.sm3_pallas_expectations(plan, W, b)),
            batch) for W, batch, plan, _ev in pipelines]

    def run_em():
        outs = [fn(batch) for fn, batch in ems]
        for out in outs:
            _ = np.asarray(out[0]).ravel()[:1]

    run_em()
    em_times = []
    for _i in range(ITERS):
        t0 = time.perf_counter()
        run_em()
        em_times.append(time.perf_counter() - t0)
    em_dt = min(em_times)

    # Generic (per-cell-transition) Pallas path: vanilla machine on the same
    # mix, posteriors+totals (stages=3).  Secondary metric, stderr only.
    from cpecan_signal_tpu.models.state_machines import make_signal_vanilla
    vjit = []
    for W, idxs in sorted(buckets.items()):
        uniq = sorted(set(idxs))
        Dv = max(wbands[i].n_diagonals for i in uniq) + 2
        probs = {}
        vplan = None
        for i in uniq:
            pore, target, events, _anchors, _band, _n, model_path, _sp = raw[i]
            strand = "complement" if "complement" in model_path else "template"
            sm = make_signal_vanilla(pore, target, events, strand=strand)
            vplan, probs[i] = pp.make_window_pallas_problem(sm, wbands[i],
                                                            pad_d=Dv)
        vbatch = pp.stack_problems([probs[i] for i in idxs])
        vjit.append((jax.jit(lambda b, plan=vplan, W=W:
                             pp.run_window_pallas(plan, W, b)), vbatch))

    def run_vanilla():
        outs = [fn(b) for fn, b in vjit]
        for out in outs:
            _ = np.asarray(out[1]).ravel()[:1]

    run_vanilla()
    vtimes = []
    for _i in range(ITERS):
        t0 = time.perf_counter()
        run_vanilla()
        vtimes.append(time.perf_counter() - t0)
    vdt = min(vtimes)
    log(f"bench - vanilla (generic per-cell pallas path) {vdt*1000:.1f} ms "
        f"({ev_total/vdt:,.0f} ev/s)")

    # HBM-traffic estimate for the roofline sanity check
    gb = 0.0
    for W, batch, _plan, _ev in pipelines:
        B = batch.x0.shape[0]
        Dp = batch.diag_scalars.shape[1] - 1
        cells = B * Dp * W * 4
        gb += (cells * 3 * 3 + cells * 3 * 3 + cells * 2 + B * Dp * 4) / 1e9
    log(f"bench - pipeline {dt*1000:.1f} ms ({events_per_sec:,.0f} ev/s); "
        f"EM step {em_dt*1000:.1f} ms ({ev_total/em_dt:,.0f} ev/s, "
        f"{1/em_dt:.2f} steps/s); ~{gb/dt:.0f} GB/s of ~819 GB/s HBM "
        f"(v5e) incl. masked band waste")

    # --- single-core reference engine on identical inputs ---
    secs = reference_engine_seconds(raw, params)
    vs = None
    if secs is not None:
        ref_total = sum(secs[i] for i in instances)
        ref_eps = ev_total / ref_total
        vs = events_per_sec / ref_eps
        log(f"bench - reference engine: {ref_total:.2f} s for the same "
            f"{BATCH}-instance mix ({ref_eps:,.0f} ev/s single-core) "
            f"-> {vs:.2f}x")

    print(json.dumps({
        "metric": "banded_fb_events_per_sec_per_chip",
        "value": round(events_per_sec, 1),
        "unit": "events/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
