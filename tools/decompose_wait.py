"""Decompose the end-to-end device wait (VERDICT r4 weak #2).

Reproduces the bench's 50-read fast-lane path on the real chip and breaks
the device wait into: per-bucket jnp pack stages, the three Pallas kernels,
the compact pair extraction, dispatch overhead, and the single fetch.

Method: device-side fori_loop repeats per stage (tunnel-safe timing, see
docs/PERF.md), then wall-clock of the production path for the
dispatch+fetch residual.  Run: python tools/decompose_wait.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from cpecan_signal_tpu.core.window import smooth_band
from cpecan_signal_tpu.engine import readpath as rp
from cpecan_signal_tpu.engine import pallas_pipeline as pp
from cpecan_signal_tpu.engine.align import collect_split_jobs
from cpecan_signal_tpu.models.params import AlignmentParams
from cpecan_signal_tpu.models.state_machines import make_signal_sm3
from cpecan_signal_tpu.ops import pallas_fb as pk

REPEAT = int(os.environ.get("REPEAT", "10"))


def staged_jobs(n_reads=50):
    params = AlignmentParams()
    raw = bench.build_mixed_problems()
    reads = bench.build_read_set(raw, n_reads=n_reads)
    align_params = params.with_(max_gap_min_dim=80)
    all_jobs = []
    for pore, target, events, anchors in reads:
        mk = lambda t, e, _p=pore: make_signal_sm3(_p, t, e)
        all_jobs.extend(collect_split_jobs(mk, target, events, anchors,
                                           align_params))
    wbands = [smooth_band(j.band, width_multiple=128) for j in all_jobs]
    staged = []
    for i, (j, wb) in enumerate(zip(all_jobs, wbands)):
        st = rp.stage_fast_job(j, wb)
        staged.append((i, st[0], st[1]))
    n_ev = sum(len(ev) for _p, _t, ev, _a in reads)
    return staged, n_ev


def time_fn(fn, *args):
    """Median-of-3 wall clock of jitted fn with device-side REPEAT loop."""
    wrapped = jax.jit(lambda *a: jax.lax.fori_loop(
        0, REPEAT, lambda _i, acc: acc + jnp.sum(fn(*a)[-1].astype(jnp.float32)
                                                 if isinstance(fn(*a), tuple)
                                                 else jnp.sum(fn(*a))), 0.0))
    _ = np.asarray(wrapped(*args))  # compile+warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(wrapped(*args))
        ts.append((time.perf_counter() - t0) / REPEAT)
    return min(ts)


def main():
    staged, n_ev = staged_jobs()
    print(f"{len(staged)} staged jobs, {n_ev} events")

    # --- production path wall clock (same as bench device_wait) ---
    timing = {}
    out = rp.run_fast_jobs(staged, 0.01, interpret=False)  # warm/compile
    for _ in range(3):
        tm = {}
        t0 = time.perf_counter()
        out = rp.run_fast_jobs(staged, 0.01, interpret=False, timing=tm)
        el = time.perf_counter() - t0
        if not timing or el < timing["total"]:
            timing = dict(tm, total=el)
    n_pairs = sum(len(p.probs) for p in out.values() if p is not None)
    print(f"production: total {timing['total']*1e3:.1f} ms  "
          f"pack {timing['host_pack']*1e3:.1f}  wait {timing['device_wait']*1e3:.1f}  "
          f"extract {timing['host_extract']*1e3:.1f}  ({n_pairs} pairs)")

    # --- rebuild the bucket inputs exactly as run_fast_jobs does, but keep
    # the staged (ints, flts, fn pieces) so stages can be timed separately ---
    groups = {}
    for si, (ji, fj, plan) in enumerate(staged):
        key = (plan, fj.wband.W, rp._dp_ladder(fj.wband.n_diagonals + 2),
               fj.gapx_key)
        groups.setdefault(key, []).append(si)

    bucket_inputs = []  # (plan, W, Dp, lXp, lYp, B, K, n_tp, S, mt, yt, gapx, ints_d, flts_d)
    for key, sidx in groups.items():
        plan, W, Dpq, _gk = key
        Dp = rp._round_up(Dpq, pk.KD)
        lXp = rp._round_up(Dp + 1 + 2 * W + 2 * 128, 128)
        lYp = lXp
        K = min(Dp * W, rp._round_up(max(2 * Dp, 512), 128))
        fj0 = staged[sidx[0]][1]
        n_tp = len(fj0.tp_scalar)
        S = len(fj0.start)
        bases = []
        for si in sidx:
            b = staged[si][1].base
            if id(b) not in {id(x) for x in bases}:
                bases.append(b)
        mt, yt = rp._dev_table_stack(tuple(bases[:rp._NBASE]))
        base_slot = {id(b): i for i, b in enumerate(bases[:rp._NBASE])}
        gapx = rp._dev_gapx(fj0.gapx)
        n_int = lXp + 3 * Dp + 3
        n_flt = 2 * lYp + 8 + n_tp + 2 * S
        pos = 0
        for B in rp._chunk_sizes(len(sidx), Dp):
            chunk = sidx[pos:pos + B]
            pos += len(chunk)
            idxs = chunk + [chunk[-1]] * (B - len(chunk))
            ints = np.full((B, n_int), -1, dtype=np.int32)
            from cpecan_signal_tpu.constants import KMER_SENTINEL
            ints[:] = KMER_SENTINEL
            flts = np.zeros((B, n_flt), dtype=np.float32)
            for bi, si in enumerate(idxs):
                fj = staged[si][1]
                r = fj.ranks
                ints[bi, W:W + len(r)] = r
                ints[bi, len(r) + W:lXp] = KMER_SENTINEL
                ints[bi, :W] = KMER_SENTINEL
                ints[bi, lXp:lXp + 3 * Dp] = rp.pad_window(fj.wband, Dp).ravel()
                ev = fj.events
                ints[bi, lXp + 3 * Dp] = len(ev)
                ints[bi, lXp + 3 * Dp + 1] = fj.wband.n_diagonals - 1
                ints[bi, lXp + 3 * Dp + 2] = base_slot[id(fj.base)]
                flts[bi, W:W + len(ev)] = ev[::-1, 0]
                flts[bi, lYp + W:lYp + W + len(ev)] = ev[::-1, 1]
                o = 2 * lYp
                flts[bi, o:o + 8] = fj.scale8
                flts[bi, o + 8:o + 8 + n_tp] = fj.tp_scalar
                flts[bi, o + 8 + n_tp:o + 8 + n_tp + S] = fj.start
                flts[bi, o + 8 + n_tp + S:] = fj.end
            bucket_inputs.append((plan, W, Dp, lXp, lYp, B, K, n_tp, S,
                                  mt, yt, gapx, jnp.asarray(ints),
                                  jnp.asarray(flts)))

    # --- per-stage device timings, summed over buckets ---
    def unpack(ints, flts, lXp, Dp, lYp, n_tp, S):
        xrank = ints[:, :lXp]
        win = ints[:, lXp:lXp + 3 * Dp].reshape(-1, 3, Dp)
        lY = ints[:, lXp + 3 * Dp]
        d_last = ints[:, lXp + 3 * Dp + 1]
        bidx = ints[:, lXp + 3 * Dp + 2]
        evr = flts[:, :2 * lYp].reshape(-1, 2, lYp)
        o = 2 * lYp
        scale8 = flts[:, o:o + 8]
        tps = flts[:, o + 8:o + 8 + n_tp]
        start = flts[:, o + 8 + n_tp:o + 8 + n_tp + S]
        end = flts[:, o + 8 + n_tp + S:o + 8 + n_tp + 2 * S]
        return xrank, win, lY, d_last, bidx, evr, scale8, tps, start, end

    stage_t = {"pack": 0.0, "emis": 0.0, "fwd": 0.0, "bwd": 0.0,
               "extract": 0.0, "full": 0.0}
    for (plan, W, Dp, lXp, lYp, B, K, n_tp, S, mt, yt, gapx, ints,
         flts) in bucket_inputs:
        kd = rp._bucket_kd(Dp)

        def mk_prob(ints, flts):
            (xrank, win, lY, d_last, bidx, evr, scale8, tps, start,
             end) = unpack(ints, flts, lXp, Dp, lYp, n_tp, S)
            xarr = rp._pack_xarr(mt, yt, gapx, bidx, xrank, scale8)
            ds, x0, yr0 = rp._pack_ds(win, lY, W, lXp, lYp)
            return pp.SM3PallasProblem(
                xarr=xarr, evr=evr, x0=x0, yr0=yr0, diag_scalars=ds,
                d_last=d_last, start=start, end=end, tp_scalar=tps,
                xrank=xrank)

        def f_pack(ints, flts):
            pr = mk_prob(ints, flts)
            return pr.xarr.sum() + pr.diag_scalars.sum()

        def f_emis(ints, flts):
            pr = mk_prob(ints, flts)
            E = pk.emissions_sm3(pr.x0, pr.yr0, pr.xarr, pr.evr, W, Dp,
                                 kd=kd)
            return E.sum()

        def stages_fn(ints, flts, stages, extract=False):
            pr = mk_prob(ints, flts)
            res = pp.run_sm3_pallas(plan, W, pr, stages=stages, kd=kd)
            p = res[0]
            if extract:
                cnt, outq, outi = rp._extract_compact(p, 0.01, K)
                return jnp.concatenate([cnt[:, None], outq, outi], axis=1)
            return p[:, -1].astype(jnp.float32)

        stage_t["pack"] += time_fn(f_pack, ints, flts)
        stage_t["emis"] += time_fn(f_emis, ints, flts)
        stage_t["fwd"] += time_fn(lambda i, f: stages_fn(i, f, 1), ints, flts)
        stage_t["bwd"] += time_fn(lambda i, f: stages_fn(i, f, 3), ints, flts)
        stage_t["full"] += time_fn(lambda i, f: stages_fn(i, f, 3, True),
                                   ints, flts)
        print(f"  bucket B={B} W={W} Dp={Dp} kd={kd}: cumulative {stage_t}")

    stage_t["extract"] = stage_t["full"] - stage_t["bwd"]
    print("\n=== stage decomposition (device-side repeats, all buckets) ===")
    print(f"jnp pack (xarr+ds)   : {stage_t['pack']*1e3:7.2f} ms")
    print(f"+ emissions kernel   : {stage_t['emis']*1e3:7.2f} ms "
          f"(emis = {(stage_t['emis']-stage_t['pack'])*1e3:.2f})")
    print(f"+ forward kernel     : {stage_t['fwd']*1e3:7.2f} ms "
          f"(fwd = {(stage_t['fwd']-stage_t['emis'])*1e3:.2f})")
    print(f"+ backward (stages=3): {stage_t['bwd']*1e3:7.2f} ms "
          f"(bwd = {(stage_t['bwd']-stage_t['fwd'])*1e3:.2f})")
    print(f"+ extract_compact    : {stage_t['full']*1e3:7.2f} ms "
          f"(extract = {stage_t['extract']*1e3:.2f})")
    print(f"production device_wait {timing['device_wait']*1e3:.1f} ms vs "
          f"summed device compute {stage_t['full']*1e3:.1f} ms -> "
          f"dispatch+fetch residual "
          f"{(timing['device_wait']-stage_t['full'])*1e3:.1f} ms over "
          f"{len(bucket_inputs)} dispatches")


if __name__ == "__main__":
    main()
