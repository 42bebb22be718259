"""Stateless footprint normalization + cell encoding (SURVEY.md §7.2 steps 2-3).

One zero-copy Arrow ``map_batches`` stage: bbox column in, appended
columns out —

- ``cx``/``cy``: full-precision centroid (the PIP/kNN probe point)
- ``degenerate``: zero-area bbox flag (engine-defined; the reference
  crashes on these, SURVEY.md §7.4)
- ``geometry_wkt``: reference-form round-2 WKT (quirk #1)
- ``s2_cell``: S2 cell id (int64 view of the uint64 id) at ``s2_level``
- ``hex_cell``: hex cell id at ``hex_res``
- ``hex_prefix``: coarse parent hex (the shuffle/partition key; H3
  res-5-prefix pattern from SURVEY.md §4.2)

All math is numpy over zero-copy views of the fixed-size-list bbox
column; no Python per-row work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import bbox as bboxmod
from ..geo import hexgrid, s2

S2_LEVEL = 9
HEX_RES = 7
HEX_PREFIX_RES = 4


def bbox_view(batch: pa.Table, col: str = "bbox") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)


def append_bbox_scalar_cols(dst: pa.Table, src: pa.Table,
                            col: str = "bbox") -> pa.Table:
    """Append src's fixed-size-list bbox as four scalar double columns
    (bw, bs, be, bn) on dst — the single definition of the splice the
    aligned co-read and the shuffle join both need (Arrow hash joins
    reject fixed_size_list payload columns)."""
    m = bbox_view(src, col)
    for i, name in enumerate(("bw", "bs", "be", "bn")):
        dst = dst.append_column(name, pa.array(m[:, i]))
    return dst


def encode_footprint(batch: pa.Table, *, s2_level: int = S2_LEVEL,
                     hex_res: int = HEX_RES,
                     hex_prefix_res: int = HEX_PREFIX_RES,
                     with_wkt: bool = True,
                     native_precision: bool = False,
                     antimeridian: str = "ignore") -> pa.Table:
    """Append footprint/cell columns; see module docstring.

    ``antimeridian="ignore"`` (default): bbox taken as-is — the
    reference-compatible behavior (the reference assumes w < e and
    silently emits an inverted ring, SURVEY.md §7.4).

    ``antimeridian="split"``: a crossing bbox (w > e) explodes into
    its two hemisphere parts [w, 180] and [-180, e] (geo/bbox.py
    split_antimeridian semantics, vectorized) — one output ROW per
    part, with ``am_part`` (0/1) and part-bbox columns pw/ps/pe/pn
    appended; centroids, cells and WKT are computed on the part, so a
    crossing footprint lands in cells on BOTH sides of the
    antimeridian instead of getting a bogus mid-pacific centroid.
    """
    if antimeridian == "split":
        return _encode_split(batch, s2_level=s2_level, hex_res=hex_res,
                             hex_prefix_res=hex_prefix_res,
                             with_wkt=with_wkt,
                             native_precision=native_precision)
    bb = bbox_view(batch)
    w, s, e, n = bboxmod.split_bbox(bb)
    cx, cy = bboxmod.centroids(w, s, e, n)
    s2c = s2.latlng_to_cell(cy, cx, s2_level).astype(np.int64)
    hexc = hexgrid.latlng_to_cell(cy, cx, hex_res)
    hexp = hexgrid.latlng_to_cell(cy, cx, hex_prefix_res)
    out = batch.append_column("cx", pa.array(cx))
    out = out.append_column("cy", pa.array(cy))
    out = out.append_column("degenerate",
                            pa.array(bboxmod.degenerate(w, s, e, n)))
    out = out.append_column("s2_cell", pa.array(s2c))
    out = out.append_column("hex_cell", pa.array(hexc))
    out = out.append_column("hex_prefix", pa.array(hexp))
    if with_wkt:
        make = (bboxmod.wkt_polygons_native if native_precision
                else bboxmod.wkt_polygons)
        out = out.append_column(
            "geometry_wkt", pa.array(make(w, s, e, n), pa.string()))
    return out


def _encode_split(batch: pa.Table, *, s2_level: int, hex_res: int,
                  hex_prefix_res: int, with_wkt: bool,
                  native_precision: bool) -> pa.Table:
    """Antimeridian-splitting variant: vectorized row explosion."""
    import pyarrow.compute as pc
    bb = bbox_view(batch)
    w, s, e, n = bboxmod.split_bbox(bb)
    cross = w > e
    # row i expands to 1 + cross[i] rows, in input order
    reps = 1 + cross.astype(np.int64)
    idx = np.repeat(np.arange(len(w)), reps)
    # part number: 0 for first occurrence, 1 for a crossing row's second
    part = np.zeros(len(idx), dtype=np.int32)
    part[1:] = (idx[1:] == idx[:-1]).astype(np.int32)
    first = part == 0
    pw = np.where(first, w[idx], -180.0)
    pe = np.where(first, np.where(cross[idx], 180.0, e[idx]), e[idx])
    ps, pn = s[idx], n[idx]

    cx, cy = bboxmod.centroids(pw, ps, pe, pn)
    taken = batch.take(pa.array(idx))
    out = taken.append_column("am_part", pa.array(part))
    for name, col in (("pw", pw), ("ps", ps), ("pe", pe), ("pn", pn)):
        out = out.append_column(name, pa.array(col))
    out = out.append_column("cx", pa.array(cx))
    out = out.append_column("cy", pa.array(cy))
    out = out.append_column("degenerate",
                            pa.array(bboxmod.degenerate(pw, ps, pe, pn)))
    out = out.append_column(
        "s2_cell", pa.array(s2.latlng_to_cell(cy, cx, s2_level).astype(np.int64)))
    out = out.append_column(
        "hex_cell", pa.array(hexgrid.latlng_to_cell(cy, cx, hex_res)))
    out = out.append_column(
        "hex_prefix", pa.array(hexgrid.latlng_to_cell(cy, cx, hex_prefix_res)))
    if with_wkt:
        make = (bboxmod.wkt_polygons_native if native_precision
                else bboxmod.wkt_polygons)
        out = out.append_column(
            "geometry_wkt", pa.array(make(pw, ps, pe, pn), pa.string()))
    return out


# ---------------------------------------------------------- union area

UNION_SCALE = 1_000_000          # micro-degree fixed point


def quantize_rects(bb: np.ndarray) -> np.ndarray:
    """(n,4) float (w,s,e,n) degrees -> int64 micro-degrees, half-up.

    Fixed-point quantization makes 'union area' a single well-defined
    integer both the engine and the golden compute exactly — no float
    area arithmetic anywhere.  Boxes with e <= w or n <= s (degenerate
    or antimeridian-crossing) have zero measure by contract.
    """
    return np.floor(np.asarray(bb, dtype=np.float64)
                    * UNION_SCALE + 0.5).astype(np.int64)


def _nonempty(r: np.ndarray) -> np.ndarray:
    return r[(r[:, 2] > r[:, 0]) & (r[:, 3] > r[:, 1])]


def rect_union_area_grid(r: np.ndarray) -> int:
    """EXACT union area of int rects via coordinate compression + a 2-D
    difference array (imos method): O(k^2) cells, fully vectorized —
    the fast path for tile-local groups (k <= ~1.5k keeps the grid
    under ~40 MB int32)."""
    r = _nonempty(np.asarray(r, dtype=np.int64))
    if len(r) == 0:
        return 0
    xs = np.unique(np.r_[r[:, 0], r[:, 2]])
    ys = np.unique(np.r_[r[:, 1], r[:, 3]])
    ix0 = np.searchsorted(xs, r[:, 0])
    ix1 = np.searchsorted(xs, r[:, 2])
    iy0 = np.searchsorted(ys, r[:, 1])
    iy1 = np.searchsorted(ys, r[:, 3])
    d = np.zeros((len(xs), len(ys)), dtype=np.int32)
    np.add.at(d, (ix0, iy0), 1)
    np.add.at(d, (ix1, iy0), -1)
    np.add.at(d, (ix0, iy1), -1)
    np.add.at(d, (ix1, iy1), 1)
    np.cumsum(d, axis=0, out=d)     # in place: fresh large temporaries
    np.cumsum(d, axis=1, out=d)     # page-fault ~4 s/GB on this host
    cnt = d[:-1, :-1]
    dx = np.diff(xs)
    dy = np.diff(ys)
    covered = cnt > 0
    # area = sum over covered cells of dx_i * dy_j, int64 throughout
    per_row = covered.astype(np.int64) @ dy.astype(np.int64)
    return int(per_row @ dx.astype(np.int64))


def rect_union_area_sweep(r: np.ndarray) -> int:
    """EXACT union area via an x-slab sweep over a y-compressed
    difference array: O(k) memory regardless of k (the grid method's
    k^2 cells), O(k * slabs) time — the dense-group fallback.  Also
    the algorithmically-independent cross-check for the grid path."""
    r = _nonempty(np.asarray(r, dtype=np.int64))
    if len(r) == 0:
        return 0
    ys = np.unique(np.r_[r[:, 1], r[:, 3]])
    dy = np.diff(ys).astype(np.int64)
    iy0 = np.searchsorted(ys, r[:, 1])
    iy1 = np.searchsorted(ys, r[:, 3])
    # events: (x, +1/-1, iy0, iy1)
    ex = np.r_[r[:, 0], r[:, 2]]
    ed = np.r_[np.ones(len(r), np.int32), -np.ones(len(r), np.int32)]
    e0 = np.r_[iy0, iy0]
    e1 = np.r_[iy1, iy1]
    order = np.argsort(ex, kind="stable")
    ex, ed, e0, e1 = ex[order], ed[order], e0[order], e1[order]
    xs = np.unique(ex)
    ycnt = np.zeros(len(ys) - 1, dtype=np.int32)
    area = 0
    starts = np.searchsorted(ex, xs)
    stops = np.r_[starts[1:], len(ex)]
    for i in range(len(xs)):
        for j in range(starts[i], stops[i]):
            ycnt[e0[j]:e1[j]] += ed[j]
        if i + 1 < len(xs):
            covered = int(dy[ycnt > 0].sum())
            area += covered * int(xs[i + 1] - xs[i])
    return area


UNION_GRID_MAX = 512             # grid fast path bound (memory-driven)


def _union_adaptive(r: np.ndarray, w: int, s: int, e: int, n: int) -> int:
    """Exact union area of rects clipped to [w,e) x [s,n) via quadtree
    splitting: dense regions subdivide until a leaf holds <=
    UNION_GRID_MAX rects (grid kernel), with TWO pruning rules that
    make overlap-heavy hotspots cheap — (a) a rect covering the whole
    region answers immediately (region fully covered), (b) the region
    first shrinks to the rects' joint bounding box (area outside it is
    uncovered by definition).  Found by the 2M-bbox probe: a 4-degree
    tile over a dense AOI holds ~27k rects, where the slab sweep's
    O(k * slabs) recompute cost 80+ s per group."""
    if len(r) == 0:
        return 0
    if len(r) <= UNION_GRID_MAX:
        return rect_union_area_grid(r)
    if bool(((r[:, 0] <= w) & (r[:, 1] <= s)
             & (r[:, 2] >= e) & (r[:, 3] >= n)).any()):
        return int(e - w) * int(n - s)
    w = max(w, int(r[:, 0].min()))
    s = max(s, int(r[:, 1].min()))
    e = min(e, int(r[:, 2].max()))
    n = min(n, int(r[:, 3].max()))
    if e - w <= 1 or n - s <= 1:         # resolution floor
        return rect_union_area_sweep(r)
    xm, ym = (w + e) // 2, (s + n) // 2
    area = 0
    for qw, qs, qe, qn in ((w, s, xm, ym), (xm, s, e, ym),
                           (w, ym, xm, n), (xm, ym, e, n)):
        m = (r[:, 0] < qe) & (r[:, 2] > qw) \
            & (r[:, 1] < qn) & (r[:, 3] > qs)
        rq = r[m]
        if len(rq) == 0:
            continue
        rq = rq.copy()
        np.clip(rq[:, 0], qw, None, out=rq[:, 0])
        np.clip(rq[:, 1], qs, None, out=rq[:, 1])
        np.clip(rq[:, 2], None, qe, out=rq[:, 2])
        np.clip(rq[:, 3], None, qn, out=rq[:, 3])
        area += _union_adaptive(rq, qw, qs, qe, qn)
    return area


def rect_union_area(r: np.ndarray) -> int:
    """Size-dispatched exact union area: coordinate-compressed grid
    under UNION_GRID_MAX rects, adaptive quadtree splitting (with
    full-cover and bounding-box pruning) above; all paths
    property-tested equal."""
    r = _nonempty(np.asarray(r, dtype=np.int64))
    if len(r) == 0:
        return 0
    if len(r) <= UNION_GRID_MAX:
        return rect_union_area_grid(r)
    w, s = int(r[:, 0].min()), int(r[:, 1].min())
    e, n = int(r[:, 2].max()), int(r[:, 3].max())
    return _union_adaptive(r, w, s, e, n)


def polygonize_cells(ix: np.ndarray, iy: np.ndarray, val: np.ndarray,
                     k: int) -> "np.ndarray":
    """RASTER -> VECTOR: 4-connected components over a sparse cell set.

    Input: occupied cells (ix, iy) with positive values on a k x k
    grid; output: one row per connected region as an (r, 7) int64
    array — [region_id (min ix*k+iy in the region — a canonical,
    batching-independent label), n_cells, ix_min, ix_max, iy_min,
    iy_max, val_sum] sorted by region_id.

    Union-find with path halving + union by size over the OCCUPIED
    cells only (never the full grid): each cell unions with its west
    and south neighbors found via one searchsorted over the
    lex-sorted cell codes — O(m α(m)) for m occupied cells,
    vectorized neighbor lookup, a single tight find loop.
    """
    m = len(ix)
    if m == 0:
        return np.empty((0, 7), dtype=np.int64)
    code = ix.astype(np.int64) * k + iy.astype(np.int64)
    order = np.argsort(code)
    code, ix, iy, val = code[order], ix[order], iy[order], val[order]
    parent = np.arange(m, dtype=np.int64)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]      # path halving
            a = parent[a]
        return a

    # neighbor pairs: west (code - k, valid when ix > 0) and
    # south (code - 1, valid when iy > 0)
    for delta, valid in ((k, ix > 0), (1, iy > 0)):
        target = code - delta
        pos = np.searchsorted(code, target)
        hit = valid & (pos < m)
        hit[hit] &= code[pos[hit]] == target[hit]
        for a, b in zip(np.flatnonzero(hit), pos[np.flatnonzero(hit)]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    roots = np.fromiter((find(int(i)) for i in range(m)), np.int64, m)
    uniq, inv = np.unique(roots, return_inverse=True)
    out = np.zeros((len(uniq), 7), dtype=np.int64)
    out[:, 0] = code[uniq]                    # min code: roots carry the
    out[:, 1] = np.bincount(inv)              # smallest index by union rule
    mins = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(mins, inv, ix)
    out[:, 2] = mins
    maxs = np.zeros(len(uniq), np.int64)
    np.maximum.at(maxs, inv, ix)
    out[:, 3] = maxs
    mins = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(mins, inv, iy)
    out[:, 4] = mins
    maxs = np.zeros(len(uniq), np.int64)
    np.maximum.at(maxs, inv, iy)
    out[:, 5] = maxs
    sums = np.zeros(len(uniq), np.int64)
    np.add.at(sums, inv, val)
    out[:, 6] = sums
    return out
