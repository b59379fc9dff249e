"""Unit tests for k-mer ranking, band geometry, logAdd and anchor utilities.

Mirrors the reference suites: test_diagonal/test_bands/test_logAdd
(tests/pairwiseAlignerTest.c:22-160), kmer index tests
(tests/nanoporeHdpTests.c:21-61), filter/split tests (:515-650).
"""

import numpy as np
import pytest

from cpecan_signal_tpu.constants import KMER_SENTINEL, NUM_OF_KMERS
from cpecan_signal_tpu.core import kmers
from cpecan_signal_tpu.core.anchors import (filter_to_remove_overlap,
                                            get_split_points)
from cpecan_signal_tpu.core.band import Band, band_construct


class TestKmers:
    def test_rank_basics(self):
        assert kmers.kmer_rank("AAAAAA") == 0
        assert kmers.kmer_rank("AAAAAC") == 1
        assert kmers.kmer_rank("TTTTTT") == NUM_OF_KMERS - 1
        assert kmers.kmer_rank("CAAAAA") == 1024
        assert kmers.kmer_rank("AANAAA") == KMER_SENTINEL

    def test_rank_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            r = int(rng.integers(0, NUM_OF_KMERS))
            assert kmers.kmer_rank(kmers.rank_to_kmer(r)) == r

    def test_sequence_ranks(self):
        seq = "ACGTACGTAC"
        ranks = kmers.sequence_kmer_ranks(seq)
        assert len(ranks) == 5
        for i in range(5):
            assert ranks[i] == kmers.kmer_rank(seq[i:i + 6])

    def test_conventions(self):
        seq = "ACGTACGTAC"
        base = kmers.sequence_kmer_ranks(seq)
        lead = kmers.ranks_with_convention(seq, "lead")
        trail = kmers.ranks_with_convention(seq, "trail")
        clamp = kmers.ranks_with_convention(seq, "clamp")
        assert lead[0] == KMER_SENTINEL
        assert (lead[1:] == base).all()
        # trail: i=0 and i=-1 -> kmer 0; i>0 -> kmer i-1
        assert trail[0] == base[0] and trail[1] == base[0]
        assert (trail[2:] == base[:-1]).all()
        assert clamp[0] == base[0]
        assert (clamp[1:] == base).all()

    def test_trailing_pairs(self):
        seq = "ACGTACGTACGT"
        base = kmers.sequence_kmer_ranks(seq)
        km1, ki = kmers.trailing_pair_ranks(seq)
        # DP position i: kmer_{i-1} = base[max(i-1,0)], kmer_i = base[max(i-1,0)+1]
        for j in range(len(km1)):
            i = j - 1
            p = max(i - 1, 0)
            assert km1[j] == base[p]
            assert ki[j] == base[min(p + 1, len(base) - 1)]


class TestBand:
    def test_band_no_anchors_bounds(self):
        # reference test_bands (pairwiseAlignerTest.c:74-137): anchor (1,0),
        # lX=13, lY=12, expansion 2.
        band = band_construct(np.array([[1, 0]]), 13, 12, 2)
        assert band.n_diagonals == 26
        # first diagonal is the single cell (0,0)
        assert band.xmyL[0] == 0 and band.xmyR[0] == 0
        widths = band.widths
        assert (widths >= 1).all()
        # every cell within matrix bounds
        for d in range(band.n_diagonals):
            for xmy in range(band.xmyL[d], band.xmyR[d] + 1, 2):
                x = (d + xmy) // 2
                y = (d - xmy) // 2
                assert 0 <= x <= 13
                assert 0 <= y <= 12

    def test_band_anchored_width(self):
        # dense anchors on the main diagonal -> width stays <= 2*expansion+1
        anchors = np.stack([np.arange(5, 95, 5), np.arange(5, 95, 5)], axis=1)
        band = band_construct(anchors, 100, 100, 10)
        assert band.max_width <= 2 * 10 // 2 + 11  # 2*expansion+1 cells

    def test_band_continuity(self):
        rng = np.random.default_rng(1)
        anchors = []
        x = y = -1
        while True:
            x += int(rng.integers(1, 8))
            y += int(rng.integers(1, 8))
            if x >= 40 or y >= 37:
                break
            anchors.append((x, y))
        band = band_construct(np.array(anchors).reshape(-1, 2), 40, 37, 4)
        # adjacent diagonals overlap: a cell's lower/upper neighbor window
        # must intersect the previous diagonal (engine relies on containment
        # only loosely; just check limits move by at most expansion-ish steps)
        d_xmyL = np.diff(band.xmyL)
        d_xmyR = np.diff(band.xmyR)
        assert (np.abs(d_xmyL) <= 2 * 4 + 2).all()
        assert (np.abs(d_xmyR) <= 2 * 4 + 2).all()


class TestAnchors:
    def test_filter_to_remove_overlap(self):
        # reference test_filterToRemoveOverlap semantics: result strictly
        # monotone in both coordinates, subset of input
        rng = np.random.default_rng(2)
        pairs = sorted({(int(rng.integers(0, 30)), int(rng.integers(0, 30)))
                        for _ in range(40)})
        out = filter_to_remove_overlap(np.array(pairs).reshape(-1, 2))
        assert all(tuple(p) in set(map(tuple, pairs)) for p in out.tolist())
        for i in range(1, len(out)):
            assert out[i, 0] > out[i - 1, 0]
            assert out[i, 1] > out[i - 1, 1]

    def test_split_points_no_split(self):
        sp = get_split_points(np.zeros((0, 2), dtype=np.int64), 100, 100,
                              3000 * 3000, False, False)
        assert sp == [(0, 0, 100, 100)]

    def test_split_points_large_gap(self):
        # reference test_getSplitPoints (pairwiseAlignerTest.c:596-650):
        # anchors (99,99) and (299,299) with cap 100 -> 2 splits around the gap
        anchors = np.array([[99, 99], [299, 299]])
        sp = get_split_points(anchors, 500, 500, 100, False, False)
        assert len(sp) >= 2
        # splits tile the matrix monotonically and cover both anchors
        assert sp[0][0] == 0 and sp[0][1] == 0
        assert sp[-1][2] == 500 and sp[-1][3] == 500
        for (x1, y1, x2, y2) in sp:
            assert x1 <= x2 and y1 <= y2


class TestLogAdd:
    def test_lookup_matches_exact(self):
        import jax.numpy as jnp
        from cpecan_signal_tpu.ops.logmath import logadd_lookup
        rng = np.random.default_rng(3)
        a = rng.uniform(-30, 5, 300)
        b = rng.uniform(-30, 5, 300)
        got = np.asarray(logadd_lookup(jnp.asarray(a), jnp.asarray(b)))
        want = np.logaddexp(a, b)
        # poly error ~7e-5 + deliberate truncation at |x-y|>=7.5 -> <= exp(-7.5)
        np.testing.assert_allclose(got, want, atol=6e-4)

    def test_lookup_neg_inf(self):
        import jax.numpy as jnp
        from cpecan_signal_tpu.ops.logmath import logadd_lookup
        inf = float("-inf")
        assert np.asarray(logadd_lookup(jnp.asarray(inf), jnp.asarray(-3.0))) == -3.0
        assert np.asarray(logadd_lookup(jnp.asarray(-3.0), jnp.asarray(inf))) == -3.0
        assert np.isneginf(np.asarray(logadd_lookup(jnp.asarray(inf), jnp.asarray(inf))))


class TestBandVectorized:
    """Differential: vectorized band_construct == the per-diagonal loop, and
    the vectorized smooth_band produces a feasible exact +-1-step cover."""

    def _random_anchors(self, rng, lX, lY):
        n = int(rng.integers(0, 12))
        if n == 0:
            return np.zeros((0, 2), dtype=np.int64)
        k = min(n, lX, lY)
        xs = np.sort(rng.choice(lX, size=k, replace=False))
        ys = np.sort(rng.choice(lY, size=k, replace=False))
        return np.stack([xs, ys], axis=1)

    def test_band_construct_matches_loop(self):
        from cpecan_signal_tpu.core.band import _band_construct_loop
        rng = np.random.default_rng(7)
        for _ in range(60):
            lX = int(rng.integers(1, 60))
            lY = int(rng.integers(1, 60))
            e = 2 * int(rng.integers(0, 12))
            anchors = self._random_anchors(rng, lX, lY)
            b_vec = band_construct(anchors, lX, lY, e)
            b_ref = _band_construct_loop(anchors, lX, lY, e)
            assert (b_vec.xmyL == b_ref.xmyL).all()
            assert (b_vec.xmyR == b_ref.xmyR).all()

    def test_smooth_band_valid_cover(self):
        from cpecan_signal_tpu.core.window import smooth_band
        rng = np.random.default_rng(11)
        for _ in range(40):
            lX = int(rng.integers(1, 80))
            lY = int(rng.integers(1, 80))
            e = 2 * int(rng.integers(0, 10))
            anchors = self._random_anchors(rng, lX, lY)
            band = band_construct(anchors, lX, lY, e)
            for mult in (1, 8, 128):
                wb = smooth_band(band, width_multiple=mult)
                d = np.arange(band.n_diagonals)
                # exact +-1 steps, parity, and full band coverage
                assert (np.abs(np.diff(wb.w0)) == 1).all()
                assert ((d + wb.w0) % 2 == 0).all()
                assert (wb.w0 <= band.xmyL).all()
                assert (wb.w0 + 2 * (wb.W - 1) >= band.xmyR).all()
                assert wb.W % mult == 0 and wb.W >= band.max_width


class TestReadpathBucketing:
    """Host-side bucketing rules of the device-packed read path
    (engine/readpath): Dp ladder rungs and HBM-bounded chunk sizes — the
    long-read scaling seams (a 50 kb unsplit read is ~100k diagonals)."""

    def test_dp_ladder(self):
        from cpecan_signal_tpu.engine.readpath import _dp_ladder
        assert _dp_ladder(100) == 256
        assert _dp_ladder(1000) == 1024
        assert _dp_ladder(1025) == 2048
        assert _dp_ladder(5800) == 8192
        assert _dp_ladder(16384) == 16384
        assert _dp_ladder(103000) == 106496   # 8192-multiples above 16384
        for d in (1, 300, 2049, 9000, 40000, 103000):
            rung = _dp_ladder(d)
            assert rung >= d and rung % 32 == 0  # kd=16/32 blocking needs it

    def test_chunk_sizes_hbm_bound(self):
        from cpecan_signal_tpu.engine.readpath import (_chunk_sizes,
                                                       _bucket_kd)
        assert sum(_chunk_sizes(13, 512)) >= 13
        assert _chunk_sizes(200, 256) == [128, 64, 8]
        # huge-Dp buckets shrink the chunk cap so E/F fit HBM
        for Dp in (8192, 32768, 106496):
            for B in _chunk_sizes(13, Dp):
                assert B * Dp <= 512 * 1024 or B == 1
        assert _chunk_sizes(1, 106496) == [1]
        assert _bucket_kd(106496) == 32 and _bucket_kd(4096) == 16 \
            and _bucket_kd(512) == 8
