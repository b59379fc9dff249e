"""Benchmark: banded forward-backward + posterior decoding throughput.

Runs the Pallas wavefront pipeline (emissions -> forward -> fused backward
with totals/posteriors/EM tallies) on the Zymo fixture read (template strand,
real seed-chain anchors) and reports events/sec/chip.  vs_baseline compares
against the single-core C baseline microbenchmark (native/fb_baseline.c — the
reference publishes no numbers, BASELINE.md); the BASELINE.md target is >=10x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "4"))

REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
MODEL = "/root/reference/models/template_median68pA.model"


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


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cpecan_signal_tpu.anchor.seed_chain import get_anchor_pairs_for_params
    from cpecan_signal_tpu.core.anchors import (filter_to_remove_overlap,
                                                remap_anchor_pairs)
    from cpecan_signal_tpu.core.band import band_construct
    from cpecan_signal_tpu.core.window import smooth_band
    from cpecan_signal_tpu.engine import pallas_pipeline as pp
    from cpecan_signal_tpu.io.npread import load_npread
    from cpecan_signal_tpu.models.params import AlignmentParams
    from cpecan_signal_tpu.models.pore_model import load_pore_model, scale_model

    with open(REF) as fh:
        ref_seq = fh.readline().strip()
    npread = load_npread(NPREAD)
    tp = npread.template_params
    pore = scale_model(load_pore_model(MODEL), tp.scale, tp.shift, tp.var,
                       tp.scale_sd, tp.var_sd)
    params = AlignmentParams()
    anchors = filter_to_remove_overlap(remap_anchor_pairs(
        get_anchor_pairs_for_params(ref_seq, npread.twoD_read, params),
        npread.template_event_map))
    events = npread.template_events
    band = band_construct(anchors, len(ref_seq) - 5, len(events),
                          params.diagonal_expansion)
    wband = smooth_band(band, width_multiple=128)
    plan, prob = pp.make_sm3_pallas_problem(pore, ref_seq, events, wband)
    W = wband.W

    batch = pp.stack_problems([prob] * BATCH)
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
    events_per_sec = BATCH * len(events) / dt

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
