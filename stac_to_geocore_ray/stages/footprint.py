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


def encode_footprint(batch: pa.Table, *, s2_level: int = S2_LEVEL,
                     hex_res: int = HEX_RES,
                     hex_prefix_res: int = HEX_PREFIX_RES,
                     with_wkt: bool = True,
                     native_precision: bool = False) -> pa.Table:
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
