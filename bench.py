"""Benchmark: banded forward-backward + posterior decoding throughput.

Runs the batched device pipeline on the Zymo fixture read (template strand,
real seed-chain anchors, CLI-default expansion 50) and reports events/sec/chip.
vs_baseline compares against the single-core C baseline microbenchmark
(native/fb_baseline.c — the reference publishes no numbers, BASELINE.md), with
the BASELINE.md target of >= 10x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))

REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
MODEL = "/root/reference/models/template_median68pA.model"


def c_baseline_events_per_sec() -> float | None:
    exe = os.path.join(os.path.dirname(__file__), "native", "fb_baseline")
    src = exe + ".c"
    try:
        if not os.path.exists(exe) and os.path.exists(src):
            subprocess.run(["gcc", "-O3", "-march=native", "-o", exe, src, "-lm"],
                           check=True, capture_output=True)
        out = subprocess.run([exe, "10"], check=True, capture_output=True, text=True)
        return float(json.loads(out.stdout)["events_per_sec"])
    except Exception:
        return None


def main():
    import jax

    from cpecan_signal_tpu.anchor.seed_chain import get_anchor_pairs_for_params
    from cpecan_signal_tpu.core.anchors import (filter_to_remove_overlap,
                                                remap_anchor_pairs)
    from cpecan_signal_tpu.core.band import band_construct
    from cpecan_signal_tpu.engine import device as dev
    from cpecan_signal_tpu.io.npread import load_npread
    from cpecan_signal_tpu.models.params import cli_defaults
    from cpecan_signal_tpu.models.pore_model import load_pore_model, scale_model

    with open(REF) as fh:
        ref_seq = fh.readline().strip()
    npread = load_npread(NPREAD)
    tp = npread.template_params
    pore = scale_model(load_pore_model(MODEL), tp.scale, tp.shift, tp.var,
                       tp.scale_sd, tp.var_sd)
    params = cli_defaults()  # expansion 50 like the vanillaAlign CLI
    anchors = filter_to_remove_overlap(remap_anchor_pairs(
        get_anchor_pairs_for_params(ref_seq, npread.twoD_read, params),
        npread.template_event_map))
    events = npread.template_events
    band = band_construct(anchors, len(ref_seq) - 5, len(events),
                          params.diagonal_expansion)

    plan, prob = dev.make_sm3_problem(pore, ref_seq, events, band,
                                      dtype=np.float32)
    batch = dev.stack_problems([prob] * BATCH)
    W = band.max_width

    fn = jax.jit(lambda b: dev.sm3_batch_posteriors(plan, W, b))
    # warmup / compile
    out = fn(batch)
    jax.block_until_ready(out)

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = fn(batch)
        jax.block_until_ready(out)
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
