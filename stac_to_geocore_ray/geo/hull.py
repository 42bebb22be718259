"""Exact integer convex hulls (Andrew monotone chain) with the
Akl–Toussaint batch prune.

All coordinates are int64 fixed point (micro-degrees, the
stages/footprint.quantize_rects grain), so orientation tests are exact
integer cross products — no epsilon anywhere — and the hull vertex set
is a single well-defined answer both the engine and the golden
compute.  The STRICT-turn convention is pinned: collinear points on a
hull edge are NOT vertices (the chain returns the minimal vertex set).

Distributed contraction law: hull(A ∪ B) == hull(hull(A) ∪ hull(B)),
and a point strictly inside the octagon of a batch's 8 directional
extremes (max/min of x, y, x+y, x−y) can never be a hull vertex of any
superset — so per-batch Akl–Toussaint pruning + a local chain is an
EXACT combiner, and the global fold runs on O(#batches × hull size)
candidate points.
"""

from __future__ import annotations

import numpy as np


def akl_toussaint_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """True for points NOT strictly inside the Akl–Toussaint octagon —
    the convex polygon through one attaining point per extreme
    direction (±x, ±y, ±(x+y), ±(x−y)).  The octagon is a subset of
    the hull, so its strict interior can never hold a hull vertex of
    any superset: an exact, conservative prune.  (The cheaper
    slab-intersection test is NOT valid — a point can sit strictly
    inside all eight slabs yet outside the octagon polygon and still
    be a hull vertex; caught by the union-area fixtures.)  Vectorized:
    at most 8 exact integer cross products over the batch."""
    s, d = x + y, x - y
    # one attaining point per direction, in CCW angular order
    order = [int(np.argmax(x)), int(np.argmax(s)), int(np.argmax(y)),
             int(np.argmin(d)), int(np.argmin(x)), int(np.argmin(s)),
             int(np.argmin(y)), int(np.argmax(d))]
    vx, vy = x[order], y[order]
    inner = np.ones(len(x), dtype=bool)
    for i in range(8):
        j = (i + 1) % 8
        ex, ey = vx[j] - vx[i], vy[j] - vy[i]
        if ex == 0 and ey == 0:
            continue                 # repeated octagon vertex
        inner &= ex * (y - vy[i]) - ey * (x - vx[i]) > 0
    inner[order] = False      # extremes always survive (guards the
    return ~inner             # all-edges-degenerate single-point case)


def convex_hull_int(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Minimal convex hull of int64 points, CCW from the lexicographic
    minimum, as an (k, 2) int64 array.  Degenerate inputs: 1 point ->
    k=1; all collinear -> k=2 (the two extremes).  Cross products stay
    below 2^63 for micro-degree Earth coordinates ((7.2e8)^2 ~ 5e17).
    """
    pts = np.unique(np.stack([x, y], axis=1), axis=0)  # lex-sorted
    n = len(pts)
    if n <= 2:
        return pts
    px = pts[:, 0].tolist()
    py = pts[:, 1].tolist()

    def chain(idx):
        out: list[int] = []
        for i in idx:
            while len(out) >= 2:
                ax, ay = px[out[-2]], py[out[-2]]
                bx, by = px[out[-1]], py[out[-1]]
                if (bx - ax) * (py[i] - ay) - (by - ay) * (px[i] - ax) <= 0:
                    out.pop()       # non-strict turn: drop collinear too
                else:
                    break
            out.append(i)
        return out

    lower = chain(range(n))
    upper = chain(range(n - 1, -1, -1))
    idx = lower[:-1] + upper[:-1]
    if len(idx) < 2:                # all collinear: chain collapsed
        return pts[[0, n - 1]]
    return pts[idx]


def shoelace2(hull: np.ndarray) -> int:
    """Twice the polygon area of a CCW hull, as an exact Python int
    (arbitrary precision — micro-degree global hulls overflow a naive
    int64 term sum)."""
    if len(hull) < 3:
        return 0
    xs = [int(v) for v in hull[:, 0]]
    ys = [int(v) for v in hull[:, 1]]
    a = 0
    for i in range(len(xs)):
        j = (i + 1) % len(xs)
        a += xs[i] * ys[j] - xs[j] * ys[i]
    return a
