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
