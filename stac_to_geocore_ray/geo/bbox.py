"""Vectorized bbox -> footprint kernels (reference-quirk-faithful).

Reproduces the reference's footprint encoding exactly
(/root/reference/stac-to-geocore/stac_to_geocore.py:170-186 ring,
:416-418/:490-491/:655-656 WKT): coordinates are rounded to 2 decimals
BEFORE the ring/WKT is built (quirk #1, SURVEY.md §2.10), and the ring
is the closed 5-point [[w,s],[e,s],[e,n],[w,n],[w,s]] loop.  The
engine-native helpers (centroid, degeneracy flags) carry full
precision; only the GeoCore-facing ring/WKT applies the round-2
compat behavior.
"""

from __future__ import annotations

import numpy as np


def split_bbox(bbox: np.ndarray):
    """(N,4) [w,s,e,n] array -> four float64 column vectors."""
    b = np.asarray(bbox, dtype=np.float64).reshape(-1, 4)
    return b[:, 0], b[:, 1], b[:, 2], b[:, 3]


def round2(x: np.ndarray) -> np.ndarray:
    """Banker's rounding to 2 decimals — matches Python round(x, 2)
    (both numpy and Python 3 round half to even)."""
    return np.round(np.asarray(x, dtype=np.float64), 2)


def rings(w, s, e, n) -> np.ndarray:
    """(N, 5, 2) closed rings from ROUNDED bbox edges (quirk #1)."""
    w, s, e, n = round2(w), round2(s), round2(e), round2(n)
    out = np.empty((len(w), 5, 2), dtype=np.float64)
    out[:, 0, 0] = w; out[:, 0, 1] = s
    out[:, 1, 0] = e; out[:, 1, 1] = s
    out[:, 2, 0] = e; out[:, 2, 1] = n
    out[:, 3, 0] = w; out[:, 3, 1] = n
    out[:, 4, 0] = w; out[:, 4, 1] = s
    return out


def _fmt(x: float) -> str:
    # str() of a Python float == DuckDB's shortest-roundtrip double
    # formatting for 2-decimal values, so WKT strings compare equal.
    return str(x)


def wkt_polygons(w, s, e, n) -> list[str]:
    """Reference-form WKT strings from ROUNDED bbox edges.

    ``POLYGON((w s, e s, e n, w n, w s))`` with Python float repr of
    the 2-decimal-rounded coordinates (stac_to_geocore.py:416-418).
    String assembly is a list comprehension (no Arrow float->string
    kernel reproduces Python repr); the rounding itself is vectorized.
    """
    w, s, e, n = round2(w), round2(s), round2(e), round2(n)
    return [
        f"POLYGON(({_fmt(wi)} {_fmt(si)}, {_fmt(ei)} {_fmt(si)}, "
        f"{_fmt(ei)} {_fmt(ni)}, {_fmt(wi)} {_fmt(ni)}, {_fmt(wi)} {_fmt(si)}))"
        for wi, si, ei, ni in zip(w.tolist(), s.tolist(), e.tolist(), n.tolist())
    ]


def centroids(w, s, e, n):
    """Full-precision bbox centroids (engine-native, no round-2)."""
    return (np.asarray(w) + np.asarray(e)) / 2.0, (np.asarray(s) + np.asarray(n)) / 2.0


def degenerate(w, s, e, n) -> np.ndarray:
    """True where the bbox has zero width or height (w==e or s==n).

    The reference assumes w<e and never defines behavior here
    (SURVEY.md §7.4); the engine flags these rows instead of crashing.
    """
    return (np.asarray(w) == np.asarray(e)) | (np.asarray(s) == np.asarray(n))


def wkt_polygons_native(w, s, e, n) -> list[str]:
    """Engine-native full-precision WKT (no round-2 compat quirk).

    The reference-form round-2 path (wkt_polygons) exists for
    conformance; pipelines that feed real geometry consumers should
    use this one (SURVEY.md §7.4 compat-vs-native split).
    """
    w = np.asarray(w, dtype=np.float64); s = np.asarray(s, dtype=np.float64)
    e = np.asarray(e, dtype=np.float64); n = np.asarray(n, dtype=np.float64)
    return [
        f"POLYGON(({wi} {si}, {ei} {si}, {ei} {ni}, {wi} {ni}, {wi} {si}))"
        for wi, si, ei, ni in zip(w.tolist(), s.tolist(), e.tolist(), n.tolist())
    ]


def split_antimeridian(w, s, e, n):
    """Engine-defined behavior for antimeridian-crossing bboxes (w > e).

    The reference assumes w < e and silently emits an inverted ring
    (SURVEY.md §7.4).  Here a crossing bbox splits into its two
    hemisphere parts: [w, 180] and [-180, e].  Returns a list of
    (w, s, e, n) tuples per input row — 1 tuple for normal boxes,
    2 for crossing ones.
    """
    w = np.atleast_1d(np.asarray(w, dtype=np.float64))
    s = np.atleast_1d(np.asarray(s, dtype=np.float64))
    e = np.atleast_1d(np.asarray(e, dtype=np.float64))
    n = np.atleast_1d(np.asarray(n, dtype=np.float64))
    out = []
    for wi, si, ei, ni in zip(w, s, e, n):
        if wi > ei:                          # crosses the antimeridian
            out.append([(wi, si, 180.0, ni), (-180.0, si, ei, ni)])
        else:
            out.append([(wi, si, ei, ni)])
    return out
