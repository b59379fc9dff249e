"""Brute-force O(N^2) forward/backward oracle in pure NumPy.

Implements the reference cell recursion literally (cell-by-cell, per-edge
logaddexp) for tiny problems, used to validate the vectorized banded engine.
"""

import numpy as np

from cpecan_signal_tpu.models.state_machines import (SRC_LOWER, SRC_MIDDLE,
                                                     SRC_UPPER, StateMachine)

NEG_INF = float("-inf")


def _logadd(a, b):
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = max(a, b)
    return m + np.log(np.exp(a - m) + np.exp(b - m))


def _tp(sm: StateMachine, edge, x_idx, y_idx):
    tot = 0.0
    for k in edge.tkeys:
        tv = sm.tvals[k]
        if tv.kind == "s":
            tot += tv.val
        elif tv.kind == "x":
            tot += tv.val[x_idx + 1]
        else:
            tot += tv.val[y_idx + 1]
    return tot


def full_forward(sm: StateMachine, lX: int, lY: int, ragged_left=False):
    S = sm.spec.n_states
    F = np.full((lX + 1, lY + 1, S), NEG_INF)
    F[0, 0] = sm.ragged_start if ragged_left else sm.start
    # emissions at cell (x, y) use sequence indices (x-1, y-1)
    for d in range(1, lX + lY + 1):
        for x in range(max(0, d - lY), min(lX, d) + 1):
            y = d - x
            xi = np.array(x - 1)
            yi = np.array(y - 1)
            e = sm.emissions(xi, yi)
            for edge in sm.spec.edges:
                if edge.src == SRC_LOWER:
                    px, py = x - 1, y
                elif edge.src == SRC_MIDDLE:
                    px, py = x - 1, y - 1
                else:
                    px, py = x, y - 1
                if px < 0 or py < 0:
                    continue
                val = F[px, py, edge.frm] + e[edge.eclass] + _tp(sm, edge, x - 1, y - 1)
                F[x, y, edge.to] = _logadd(F[x, y, edge.to], val)
    return F


def full_backward(sm: StateMachine, lX: int, lY: int, ragged_right=False):
    S = sm.spec.n_states
    B = np.full((lX + 1, lY + 1, S), NEG_INF)
    B[lX, lY] = sm.ragged_end if ragged_right else sm.end
    for d in range(lX + lY - 1, -1, -1):
        for x in range(max(0, d - lY), min(lX, d) + 1):
            y = d - x
            for edge in sm.spec.edges:
                # to-cell coordinates relative to this from-cell
                if edge.src == SRC_LOWER:
                    tx, ty = x + 1, y
                elif edge.src == SRC_MIDDLE:
                    tx, ty = x + 1, y + 1
                else:
                    tx, ty = x, y + 1
                if tx > lX or ty > lY:
                    continue
                e = sm.emissions(np.array(tx - 1), np.array(ty - 1))
                val = B[tx, ty, edge.to] + e[edge.eclass] + _tp(sm, edge, tx - 1, ty - 1)
                B[x, y, edge.frm] = _logadd(B[x, y, edge.frm], val)
    return B


def total_prob(sm: StateMachine, F, ragged_right=False):
    end = sm.ragged_end if ragged_right else sm.end
    vals = F[-1, -1] + end
    vals = vals[np.isfinite(vals)]
    if len(vals) == 0:
        return NEG_INF
    m = vals.max()
    return m + np.log(np.exp(vals - m).sum())


def total_prob_bwd(sm: StateMachine, B, ragged_left=False):
    start = sm.ragged_start if ragged_left else sm.start
    vals = B[0, 0] + start
    vals = vals[np.isfinite(vals)]
    if len(vals) == 0:
        return NEG_INF
    m = vals.max()
    return m + np.log(np.exp(vals - m).sum())
