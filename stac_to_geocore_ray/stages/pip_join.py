"""Broadcast STRtree point-in-polygon join (actor-pool stage).

Generalizes the reference's only join — the broadcast collection
lookup (J1, stac_to_geocore.py:553-566 build / :589-595 probe) — to a
geometric left-outer join: each record's footprint centroid is probed
against a GeoCore-style polygon catalog held in an STRtree built ONCE
per actor in ``__init__``.  The catalog rides in via ``ray.put`` on
the driver (one object-store copy per node, zero-copy reads), never
per batch.

Left-outer semantics: no containing polygon -> null join columns,
exactly like the reference's ``.get(coll_id, {})`` miss.  Ties break
to the lowest catalog index (deterministic across runs and cluster
sizes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.strtree import STRtree


def catalog_polygons(coll_table: pa.Table):
    """Catalog rows -> (ids, list of (xs, ys) rings) from bbox columns.

    Uses the bbox ring; a production catalog with true polygon WKT
    would parse ``polygon_wkt`` here instead (same STRtree downstream).
    """
    ids = coll_table.column("collection_id").to_pylist()
    bbs = coll_table.column("bbox").to_pylist()
    polys = []
    for w, s, e, n in bbs:
        polys.append((np.array([w, e, e, w]), np.array([s, s, n, n])))
    return ids, polys


class PIPJoiner:
    """``map_batches`` callable class: appends pip_index / pip_collection.

    Parameters
    ----------
    catalog : (ids, polygons) tuple, or a ray.ObjectRef of one.
    x_col, y_col : probe point columns (default footprint centroids).
    """

    def __init__(self, catalog, x_col: str = "cx", y_col: str = "cy"):
        try:
            import ray
            if isinstance(catalog, ray.ObjectRef):
                catalog = ray.get(catalog)
        except ImportError:
            pass
        ids, polys = catalog
        self.ids = pa.array(ids, pa.string())
        # (N, 4) bbox array -> STRtree rect mode (no ray-cast, packed
        # broadcast); list of rings -> general polygon mode
        if isinstance(polys, np.ndarray) and polys.ndim == 2:
            self.tree = STRtree(bboxes=polys)   # built once per actor
        else:
            self.tree = STRtree(polys)
        self.x_col, self.y_col = x_col, y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy()
        py = batch[self.y_col].to_numpy()
        idx = self.tree.query_points(px, py)
        idx_arr = pa.array(np.where(idx >= 0, idx, 0).astype(np.int32))
        valid = pa.array(idx >= 0)
        import pyarrow.compute as pc
        coll = pc.if_else(valid, self.ids.take(idx_arr), pa.scalar(None, pa.string()))
        out = batch.append_column(
            "pip_index", pa.array(np.where(idx >= 0, idx, -1).astype(np.int32)))
        return out.append_column("pip_collection", coll)


class MultiPIPJoiner(PIPJoiner):
    """Inner one-to-many PIP join: emits (id, catalog id) for EVERY
    containing polygon via ``STRtree.query_all`` — the multi-match
    variant of the left-outer first-match ``PIPJoiner``."""

    def __init__(self, catalog, x_col: str = "cx", y_col: str = "cy",
                 id_col: str = "image_id", out_col: str = "pip_collection"):
        super().__init__(catalog, x_col, y_col)
        self.id_col, self.out_col = id_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy()
        py = batch[self.y_col].to_numpy()
        pts, polys = self.tree.query_all(px, py)
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            self.id_col: ids.take(pa.array(pts)),
            self.out_col: self.ids.take(pa.array(polys)),
        })


class RectIntersectJoiner:
    """Inner rectangle-INTERSECTION join (actor-pool stage): emits
    (id, catalog id) for every closed bbox OVERLAP between the probe
    row's footprint bbox and a broadcast rect catalog — the 2-D
    interval-overlap predicate (``STRtree.query_rects_all``), i.e. the
    spatial analogue of the events range join, vs the containment
    predicate of the PIP joiners.

    catalog: (ids, (N, 4) bbox array) tuple or a ray.ObjectRef of one;
    the STRtree is built in rect mode ONCE per actor.
    """

    def __init__(self, catalog, bbox_col: str = "bbox",
                 id_col: str = "image_id", out_col: str = "cat_id"):
        try:
            import ray
            if isinstance(catalog, ray.ObjectRef):
                catalog = ray.get(catalog)
        except ImportError:
            pass
        ids, rects = catalog
        self.ids = pa.array(ids, pa.string())
        self.tree = STRtree(bboxes=np.asarray(rects, dtype=np.float64))
        self.bbox_col, self.id_col, self.out_col = bbox_col, id_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        bb = batch[self.bbox_col]
        if isinstance(bb, pa.ChunkedArray):
            bb = bb.combine_chunks()
        rects = bb.flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)
        probes, stored = self.tree.query_rects_all(rects)
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            self.id_col: ids.take(pa.array(probes)),
            self.out_col: self.ids.take(pa.array(stored)),
        })


class RadiusJoiner:
    """Inner WITHIN-RADIUS join (actor-pool stage): emits (id, catalog
    id) for every probe centroid within planar distance ``r`` of a
    broadcast point catalog — the distance-predicate join class, vs
    the PIP joiners' containment and ``RectIntersectJoiner``'s
    interval overlap.

    The STRtree (rect mode, degenerate point rects) prunes with an
    epsilon-PADDED r-box around each probe so float rounding of
    ``c - r`` can never drop a boundary pair; the exact predicate
    ``dx*dx + dy*dy <= r*r`` (evaluated in the same operand order as
    the SQL text) decides.  catalog: (ids, px, py) tuple or a
    ray.ObjectRef of one; the tree builds ONCE per actor.
    """

    def __init__(self, catalog, radius: float, bbox_col: str = "bbox",
                 id_col: str = "image_id", out_col: str = "cat_id"):
        try:
            import ray
            if isinstance(catalog, ray.ObjectRef):
                catalog = ray.get(catalog)
        except ImportError:
            pass
        ids, px, py = catalog
        self.ids = pa.array(ids, pa.string())
        self.px = np.asarray(px, dtype=np.float64)
        self.py = np.asarray(py, dtype=np.float64)
        pts = np.column_stack([self.px, self.py, self.px, self.py])
        self.tree = STRtree(bboxes=pts)
        self.r = float(radius)
        self.pad = self.r * 1.0000001       # prune-box slack; exact
        # predicate below decides, so padding only adds candidates
        self.bbox_col, self.id_col, self.out_col = bbox_col, id_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        bb = batch[self.bbox_col]
        if isinstance(bb, pa.ChunkedArray):
            bb = bb.combine_chunks()
        rects = bb.flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)
        cx = (rects[:, 0] + rects[:, 2]) * 0.5
        cy = (rects[:, 1] + rects[:, 3]) * 0.5
        boxes = np.column_stack([cx - self.pad, cy - self.pad,
                                 cx + self.pad, cy + self.pad])
        probes, stored = self.tree.query_rects_all(boxes)
        dx = cx[probes] - self.px[stored]
        dy = cy[probes] - self.py[stored]
        keep = dx * dx + dy * dy <= self.r * self.r
        probes, stored = probes[keep], stored[keep]
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            self.id_col: ids.take(pa.array(probes)),
            self.out_col: self.ids.take(pa.array(stored)),
        })


class ZonalStatsJoiner(PIPJoiner):
    """Zonal-statistics PARTIAL stage: multi-match PIP assignment with
    in-batch contraction — emits one row per (batch, zone) carrying
    the zone's item count and exact integer value sum, never a row per
    item.  The classic raster/vector zonal-stats op (per-polygon
    aggregate of a point/footprint attribute surface): the broadcast
    STRtree supplies the zone assignment (multi-match, closed
    boundaries — an item under two overlapping zones counts in both),
    ``np.add.at`` folds int64 values exactly, and the downstream
    8-ish-key groupby is a strong-contraction combiner aggregate.

    ``val_col`` must be integer-typed (the house integer-units rule —
    sums stay order-independent and bit-exact across any partialing).
    """

    def __init__(self, catalog, x_col: str = "cx", y_col: str = "cy",
                 val_col: str = "amk", out_col: str = "zone"):
        super().__init__(catalog, x_col, y_col)
        self.val_col, self.out_col = val_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy()
        py = batch[self.y_col].to_numpy()
        vals = batch[self.val_col].to_numpy()
        if not np.issubdtype(vals.dtype, np.integer):
            raise TypeError(
                f"ZonalStatsJoiner: {self.val_col!r} must be integer "
                f"units (got {vals.dtype}) so partial sums are exact")
        pts, polys = self.tree.query_all(px, py)
        npoly = len(self.ids)
        n = np.bincount(polys, minlength=npoly).astype(np.int64)
        s = np.zeros(npoly, dtype=np.int64)
        np.add.at(s, polys, vals[pts].astype(np.int64))
        keep = n > 0
        return pa.table({
            self.out_col: self.ids.take(pa.array(np.flatnonzero(keep),
                                                 pa.int32())),
            "n": pa.array(n[keep]),
            "val": pa.array(s[keep]),
        })


class ZonalOverlapJoiner:
    """AREA-WEIGHTED zonal partial stage: for every closed bbox
    OVERLAP between a probe footprint and a broadcast rect-zone
    catalog, accumulate the spherical area of the INTERSECTION rect
    per zone — the coverage-fraction variant of ``ZonalStatsJoiner``
    (an item contributes by how much of it lies in the zone, not by
    centroid membership).  Per batch, emits one row per (batch, zone):
    overlap-pair count + exact int64 milli-km^2 intersection-area sum
    (half-away rounding per PAIR, so partial sums are bit-exact under
    any batching — the integer-units rule).

    catalog: (ids, (N, 4) bbox array) tuple or a ray.ObjectRef of one.
    """

    _R = 6371.0088

    def __init__(self, catalog, bbox_col: str = "bbox",
                 out_col: str = "zone"):
        try:
            import ray
            if isinstance(catalog, ray.ObjectRef):
                catalog = ray.get(catalog)
        except ImportError:
            pass
        ids, rects = catalog
        self.ids = pa.array(ids, pa.string())
        self.rects = np.asarray(rects, dtype=np.float64)
        self.tree = STRtree(bboxes=self.rects)     # built once per actor
        self.bbox_col, self.out_col = bbox_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        bb = batch[self.bbox_col]
        if isinstance(bb, pa.ChunkedArray):
            bb = bb.combine_chunks()
        m = bb.flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)
        probes, stored = self.tree.query_rects_all(m)
        pm, zm = m[probes], self.rects[stored]
        iw = np.maximum(pm[:, 0], zm[:, 0])
        is_ = np.maximum(pm[:, 1], zm[:, 1])
        ie = np.minimum(pm[:, 2], zm[:, 2])
        in_ = np.minimum(pm[:, 3], zm[:, 3])
        # closed overlap guarantees ie >= iw, in_ >= is_; zero-width
        # touches contribute a zero-area pair (still counted)
        R = self._R
        a = (R * R * np.radians(ie - iw)
             * (np.sin(np.radians(in_)) - np.sin(np.radians(is_))))
        amk = np.floor(a * 1e3 + 0.5).astype(np.int64)   # half-away, 3 dp
        npoly = len(self.ids)
        n = np.bincount(stored, minlength=npoly).astype(np.int64)
        s = np.zeros(npoly, dtype=np.int64)
        np.add.at(s, stored, amk)
        keep = n > 0
        return pa.table({
            self.out_col: self.ids.take(pa.array(np.flatnonzero(keep),
                                                 pa.int32())),
            "n": pa.array(n[keep]),
            "val": pa.array(s[keep]),
        })
