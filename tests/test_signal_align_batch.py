"""Cross-read device batching in the signal_align driver vs the per-read path.

_batch_align_all pools every read's split jobs into bucketed device batches
(on the CPU test platform the kernels run in interpret mode); its per-read
TSV parts and summary lines must match the serial _align_one path up to the
f32-kernel tolerance already pinned by tests/test_batch_align.py.
"""

import os

import numpy as np

from cpecan_signal_tpu.cli.signal_align import _align_one, _batch_align_all
from cpecan_signal_tpu.io.fasta import read_first_sequence
from cpecan_signal_tpu.models.params import AlignmentParams

REF = "/root/reference/tests/test_npReads/ZymoRef.txt"
NPREAD = "/root/reference/tests/test_npReads/ZymoC_ch_1_file1.npRead"
TMODEL = "/root/reference/models/template_median68pA.model"
CMODEL = "/root/reference/models/complement_median68pA_pop2.model"


def _rows(path):
    rows = {}
    with open(path) as fh:
        for line in fh:
            f = line.rstrip("\n").split("\t")
            rows[(f[1], f[4], f[5])] = float(f[12])  # (ref pos, strand, event)
    return rows


def test_cross_read_batch_matches_serial(tmp_path):
    from conftest import truncated_zymo_npread

    from cpecan_signal_tpu.io.npread import write_npread

    contig, ref_seq = read_first_sequence(REF)
    params = AlignmentParams()
    # two "reads" (the truncated fixture twice under different labels)
    p1 = tmp_path / "read.npRead"
    write_npread(str(p1), truncated_zymo_npread(380))
    NPREAD_T = str(p1)
    p2 = tmp_path / "copy.npRead"
    os.symlink(NPREAD_T, p2)
    out_b = str(tmp_path / "b" / "posteriors.tsv")
    out_s = str(tmp_path / "s" / "posteriors.tsv")
    os.makedirs(os.path.dirname(out_b))
    os.makedirs(os.path.dirname(out_s))
    work_b = [(p, ref_seq, contig, TMODEL, CMODEL, params, "threeState",
               out_b, None, None) for p in (NPREAD_T, str(p2))]
    work_s = [(p, ref_seq, contig, TMODEL, CMODEL, params, "threeState",
               out_s, None, None) for p in (NPREAD_T, str(p2))]

    res_b = _batch_align_all(work_b)
    res_s = [_align_one(w) for w in work_s]
    assert len(res_b) == len(res_s) == 2
    assert [w for w, *_r in res_b] == [0, 1]  # work-index keyed results
    for (_wb, lb, mb, pb), (ls, ms, ps) in zip(res_b, res_s):
        assert lb == ls
        assert "anchors" in mb and "anchors" in ms
        rb, rs = _rows(pb), _rows(ps)
        common = set(rb) & set(rs)
        assert len(common) >= 0.999 * max(len(rb), len(rs))
        assert max(abs(rb[k] - rs[k]) for k in common) < 3e-3
