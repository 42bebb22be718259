"""Exact integer Douglas–Peucker polyline simplification.

All coordinates are int64 micro-degrees, and every keep decision is an
exact integer comparison — ``cross² > eps² · |chord|²`` (both sides as
arbitrary-precision Python ints, evaluated once per segment on the
argmax candidate only) — so the kept-point set is a single
well-defined answer the engine and the golden both compute.  Pinned
conventions: split at the point with the largest |cross| (ties to the
smallest index); a degenerate chord (closed loop: endpoints equal)
falls back to squared point distance vs eps²; segment endpoints are
always kept; a 1-point polyline keeps its point.
"""

from __future__ import annotations

import numpy as np


def dp_keep_mask(x: np.ndarray, y: np.ndarray, eps_u: int) -> np.ndarray:
    """Boolean keep-mask for an ORDERED polyline (int64 coords).

    Iterative stack DP: per segment, the candidate distances are one
    vectorized numpy pass (int64 cross products — |cross| stays under
    2^63 for micro-degree Earth coordinates), and only the argmax
    candidate pays the exact big-int comparison.
    """
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    eps2 = int(eps_u) * int(eps_u)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        dx = int(x[j]) - int(x[i])
        dy = int(y[j]) - int(y[i])
        xs = x[i + 1:j]
        ys = y[i + 1:j]
        if dx == 0 and dy == 0:
            d2 = (xs - x[i]) ** 2 + (ys - y[i]) ** 2
            k = int(np.argmax(d2))            # ties -> smallest index
            split = int(d2[k]) > eps2
        else:
            cross = dx * (ys - y[i]) - dy * (xs - x[i])
            a = np.abs(cross)
            k = int(np.argmax(a))             # ties -> smallest index
            split = int(a[k]) ** 2 > eps2 * (dx * dx + dy * dy)
        if split:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep
