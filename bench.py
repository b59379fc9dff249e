"""Benchmark: banded forward-backward + posterior decoding + EM throughput.

Runs the Pallas wavefront pipeline (emissions -> forward -> fused backward
with totals/posteriors/EM tallies) on a MIXED batch of real alignment
problems — the Zymo fixture read's template AND complement strands, full
reads plus windowed sub-reads of varied lengths (417-799 events), each with
its own real seed-chain anchors and band — and reports events/sec/chip.

vs_baseline compares against the single-core C baseline microbenchmark
(native/fb_baseline.c — the reference publishes no numbers, BASELINE.md);
the BASELINE.md target is >=10x.  Extra detail (per-stage split, EM-step/s,
bandwidth estimate) goes to stderr; stdout carries the ONE JSON line
{"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "4"))

REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
TMODEL = "/root/reference/models/template_median68pA.model"
CMODEL = "/root/reference/models/complement_median68pA_pop2.model"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def c_baseline_events_per_sec() -> float | None:
    exe = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native",
                       "fb_baseline")
    src = exe + ".c"
    try:
        if not os.path.exists(exe) and os.path.exists(src):
            subprocess.run(["gcc", "-O3", "-march=native", "-o", exe, src, "-lm"],
                           check=True, capture_output=True)
        out = subprocess.run([exe, "10"], check=True, capture_output=True,
                             text=True)
        return float(json.loads(out.stdout)["events_per_sec"])
    except Exception:
        return None


def build_mixed_problems():
    """Distinct real problems: both strands, full + windowed sub-reads."""
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

    problems = []  # (pore, target, events, band, n_events)
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
            problems.append((pore, t_sub, e_sub, band, len(e_sub)))

        n = len(events)
        add(0, n)                      # full strand
        add(0, int(n * 0.55))          # leading window
        add(int(n * 0.3), n)           # trailing window
        add(int(n * 0.2), int(n * 0.85))
    return problems


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cpecan_signal_tpu.core.window import smooth_band
    from cpecan_signal_tpu.engine import pallas_pipeline as pp

    raw = build_mixed_problems()
    log(f"bench - {len(raw)} distinct problems, events: "
        f"{[n for *_x, n in raw]}")

    # shared window width + pads across the whole mixed set
    wbands = [smooth_band(band, width_multiple=128) for *_a, band, _n in raw]
    W = max(wb.W for wb in wbands)
    wbands = [wb if wb.W == W else
              smooth_band(band, width_multiple=128, min_width=W)
              for wb, (*_a, band, _n) in zip(wbands, raw)]
    Dp = max(wb.n_diagonals for wb in wbands) + 2
    lxp = max(len(t) for _p, t, *_r in raw)
    lyp = max(len(e) for _p, _t, e, *_r in raw)

    plan = None
    probs, n_events = [], []
    for (pore, target, events, _band, n), wb in zip(raw, wbands):
        plan, prob = pp.make_sm3_pallas_problem(pore, target, events, wb,
                                                pad_lx=lxp, pad_ly=lyp,
                                                pad_d=Dp)
        probs.append(prob)
        n_events.append(n)

    tiled = [probs[i % len(probs)] for i in range(BATCH)]
    ev_total = sum(n_events[i % len(probs)] for i in range(BATCH))
    batch = pp.stack_problems(tiled)
    log(f"bench - batch {BATCH} problems, W={W}, Dp={Dp}, "
        f"{ev_total} real events/batch")

    pipeline = pp.make_jit_pipeline(plan, W)
    out = pipeline(batch)
    _ = np.asarray(out[3]).ravel()[:4]  # force full execution (honest timing)

    times = []
    for _i in range(ITERS):
        t0 = time.perf_counter()
        out = pipeline(batch)
        _ = np.asarray(out[3]).ravel()[:4]
        times.append(time.perf_counter() - t0)
    dt = min(times)
    events_per_sec = ev_total / dt

    # EM step throughput: full production E-step (tallies on device)
    em = jax.jit(lambda b: pp.sm3_pallas_expectations(plan, W, b))
    r = em(batch)
    _ = np.asarray(r[0]).ravel()[:1]
    em_times = []
    for _i in range(ITERS):
        t0 = time.perf_counter()
        r = em(batch)
        _ = np.asarray(r[0]).ravel()[:1]
        em_times.append(time.perf_counter() - t0)
    em_dt = min(em_times)

    # HBM-traffic estimate for the roofline sanity check: E write+2x read,
    # F write+2x read, posterior/pgapx/total writes (f32)
    cells = BATCH * Dp * W * 4  # bytes per (row, state/class) element
    gb = (cells * 3 * 3        # E: 1 write + 2 reads (fwd, bwd)
          + cells * 3 * 3      # F: 1 write + 2 reads (bwd x2 row views)
          + cells * 2 + BATCH * Dp * 4) / 1e9
    log(f"bench - pipeline {dt*1000:.1f} ms ({events_per_sec:,.0f} ev/s); "
        f"EM step {em_dt*1000:.1f} ms ({ev_total/em_dt:,.0f} ev/s, "
        f"{1/em_dt:.2f} steps/s); ~{gb/dt:.0f} GB/s of ~819 GB/s HBM "
        f"(v5e) incl. masked band waste")

    base = c_baseline_events_per_sec()
    vs = events_per_sec / base if base else None
    print(json.dumps({
        "metric": "banded_fb_events_per_sec_per_chip",
        "value": round(events_per_sec, 1),
        "unit": "events/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
