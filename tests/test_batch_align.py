"""Device-batched CLI alignment path vs the serial per-strand path.

align_read(device_batch=True) stacks both strands' split jobs into one
Pallas window batch (engine/batch_align); on the CPU test platform the
kernels run in interpret mode, so this checks the batching/extraction
plumbing end-to-end against the f64 serial engine.
"""

import numpy as np

from cpecan_signal_tpu.cli.vanilla_align import align_read
from cpecan_signal_tpu.io.fasta import read_first_sequence
from cpecan_signal_tpu.io.npread import load_npread
from cpecan_signal_tpu.models.params import AlignmentParams
from cpecan_signal_tpu.models.pore_model import load_pore_model

REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
TMODEL = "/root/reference/models/template_median68pA.model"
CMODEL = "/root/reference/models/complement_median68pA_pop2.model"


def _compare(sm_type):
    from conftest import truncated_zymo_npread

    contig, ref_seq = read_first_sequence(REF)
    npread = truncated_zymo_npread(380)
    tmodel = load_pore_model(TMODEL)
    cmodel = load_pore_model(CMODEL)
    params = AlignmentParams()

    res_b = align_read(ref_seq, contig, npread, tmodel, cmodel, params,
                       sm_type=sm_type, device_batch=True)
    res_s = align_read(ref_seq, contig, npread, tmodel, cmodel, params,
                       sm_type=sm_type, device_batch=False)
    assert res_b["status"] == res_s["status"] == "ok"
    for strand in ("t", "c"):
        pb, ps = res_b[strand], res_s[strand]
        db = {(x, y): p for p, x, y in pb.as_tuples()}
        ds = {(x, y): p for p, x, y in ps.as_tuples()}
        # same pairs up to threshold-boundary jitter (f32 kernels vs f64 scan)
        common = set(db) & set(ds)
        assert len(common) >= 0.999 * max(len(db), len(ds))
        diffs = [abs(db[k] - ds[k]) for k in common]
        assert max(diffs) < 3e-3 * 1e7  # prob quantized to int(p * 1e7)
        assert abs(pb.score - ps.score) < 0.2


def test_batch_align_threestate_matches_serial():
    _compare("threeState")


def test_batch_align_vanilla_matches_serial():
    _compare("vanilla")
