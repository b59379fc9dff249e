"""Smoothed constant-step band windows.

The reference band's per-diagonal [xmyL, xmyR] limits move arbitrarily (within
parity), which forces dynamic gathers in a vectorized wavefront.  A *window* is
a covering band of constant width W whose left edge moves by exactly +-1 in xmy
per diagonal — the TPU layout contract: every neighbor access becomes a static
lane shift selected by one scalar per diagonal, and true-band semantics are
preserved by masking cells outside [xmyL, xmyR] (they stay LOG_ZERO exactly as
in the reference engine).

Feasibility: the window left edge w0 must satisfy, per diagonal,
    xmyR[d] - 2(W-1) <= w0[d] <= xmyL[d]
with |w0[d+1] - w0[d]| = 1.  A backward reachability sweep intersects the
constraint intervals with the +-1-step cone; if empty, W is increased.  A
forward greedy pass then picks w0 tracking the band center.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .band import Band


class WindowBand(NamedTuple):
    lX: int
    lY: int
    W: int
    w0: np.ndarray     # (D,) leftmost covered xmy per diagonal; steps +-1
    xmyL: np.ndarray   # (D,) true band limits (masking)
    xmyR: np.ndarray

    @property
    def n_diagonals(self) -> int:
        return len(self.w0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def smooth_band(band: Band, width_multiple: int = 8,
                min_width: int | None = None) -> WindowBand:
    """Compute a feasible constant-step window covering ``band``."""
    D = band.n_diagonals
    xmyL = band.xmyL.astype(np.int64)
    xmyR = band.xmyR.astype(np.int64)
    W = _round_up(max(int(band.max_width), min_width or 1), width_multiple)

    while True:
        lo_c = xmyR - 2 * (W - 1)   # w0 >= lo_c
        hi_c = xmyL                  # w0 <= hi_c
        # backward reachability: R_d = [lo, hi] of feasible w0 values
        lo = np.empty(D, dtype=np.int64)
        hi = np.empty(D, dtype=np.int64)
        lo[D - 1], hi[D - 1] = lo_c[D - 1], hi_c[D - 1]
        feasible = lo[D - 1] <= hi[D - 1]
        for d in range(D - 2, -1, -1):
            lo[d] = max(lo_c[d], lo[d + 1] - 1)
            hi[d] = min(hi_c[d], hi[d + 1] + 1)
            if lo[d] > hi[d]:
                feasible = False
                break
        if feasible:
            break
        W += width_multiple

    # forward greedy: start at the band start, then track the band center
    w0 = np.empty(D, dtype=np.int64)
    w0[0] = int(np.clip(xmyL[0], lo[0], hi[0]))
    for d in range(1, D):
        center_target = (xmyL[d] + xmyR[d]) // 2 - (W - 1)
        step = 1 if center_target >= w0[d - 1] else -1
        cand = w0[d - 1] + step
        if cand < lo[d] or cand > hi[d]:
            cand = w0[d - 1] - step
        assert lo[d] <= cand <= hi[d], f"window tracking infeasible at d={d}"
        w0[d] = cand

    # parity check: (d + w0) must be even like the band's xmy coordinates
    assert ((np.arange(D) + w0) % 2 == (np.arange(D) + xmyL) % 2).all()
    return WindowBand(lX=band.lX, lY=band.lY, W=W, w0=w0, xmyL=xmyL, xmyR=xmyR)
