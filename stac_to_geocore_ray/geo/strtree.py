"""STR-packed R-tree + vectorized ray-cast point-in-polygon, pure numpy.

No shapely in this environment, so the broadcast PIP join
(SURVEY.md §2.4 J1 generalized) is backed by this module: a
Sort-Tile-Recursive bulk-loaded static R-tree over catalog polygon
bounding boxes for candidate pruning, then an exact vectorized
ray-casting containment test per candidate polygon.

The catalog side is small (it is the broadcast side of the join), so
``query_points`` also has a dense fast path: when the catalog holds at
most ``dense_limit`` polygons, candidates come from one broadcasted
bbox-containment matrix — pure numpy, no tree walk.  The tree path
exists for catalogs too big for an N x M matrix.
"""

from __future__ import annotations

import numpy as np


def point_in_polygon(px: np.ndarray, py: np.ndarray,
                     xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Ray-cast containment of many points in ONE polygon ring.

    ``xs, ys``: polygon vertices (first vertex need not be repeated).
    Boundary behavior follows the even-odd crossing rule.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x1, y1 = xs, ys
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    inside = np.zeros(px.shape, dtype=bool)
    for k in range(len(xs)):
        ax, ay, bx, by = x1[k], y1[k], x2[k], y2[k]
        cond = (ay > py) != (by > py)
        if not cond.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (py - ay) / (by - ay)
        cross = cond & (px < ax + t * (bx - ax))
        inside ^= cross
    return inside


class STRtree:
    """Static packed R-tree over polygon bboxes (STR bulk load).

    Parameters
    ----------
    polygons : list of (xs, ys) vertex arrays (closed or open rings).
    node_capacity : fan-out of the packed tree.
    """

    def __init__(self, polygons, node_capacity: int = 16, dense_limit: int = 4096):
        self.polygons = [(np.asarray(xs, dtype=np.float64),
                          np.asarray(ys, dtype=np.float64)) for xs, ys in polygons]
        n = len(self.polygons)
        self.bounds = np.empty((n, 4), dtype=np.float64)   # w, s, e, n
        for i, (xs, ys) in enumerate(self.polygons):
            self.bounds[i] = (xs.min(), ys.min(), xs.max(), ys.max())
        self.dense = n <= dense_limit
        self.cap = node_capacity
        if not self.dense:
            self._build()

    def _build(self) -> None:
        idx = np.arange(len(self.polygons))
        cx = (self.bounds[:, 0] + self.bounds[:, 2]) / 2
        cy = (self.bounds[:, 1] + self.bounds[:, 3]) / 2
        # STR: slice by x, pack by y within slices
        n = len(idx)
        n_leaves = max(1, int(np.ceil(n / self.cap)))
        n_slices = max(1, int(np.ceil(np.sqrt(n_leaves))))
        per_slice = int(np.ceil(n / n_slices))
        order_x = np.argsort(cx, kind="stable")
        leaves = []
        for s in range(0, n, per_slice):
            sl = order_x[s:s + per_slice]
            sl = sl[np.argsort(cy[sl], kind="stable")]
            for t in range(0, len(sl), self.cap):
                leaves.append(sl[t:t + self.cap])
        self.leaf_items = leaves
        self.leaf_bounds = np.array([
            [self.bounds[l, 0].min(), self.bounds[l, 1].min(),
             self.bounds[l, 2].max(), self.bounds[l, 3].max()] for l in leaves])

    def _candidates_dense(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        b = self.bounds
        return ((px[:, None] >= b[None, :, 0]) & (px[:, None] <= b[None, :, 2]) &
                (py[:, None] >= b[None, :, 1]) & (py[:, None] <= b[None, :, 3]))

    def query_points(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """First (lowest-index) polygon containing each point, or -1.

        Lowest-index priority gives deterministic left-outer broadcast
        join semantics matching the reference's dict probe (missing key
        -> null; stac_to_geocore.py:589-595 generalized).
        """
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        out = np.full(px.shape, -1, dtype=np.int64)
        if len(self.polygons) == 0:
            return out
        if self.dense:
            cand = self._candidates_dense(px, py)
            # iterate polygons in priority order; test only still-unmatched pts
            for poly_idx in range(len(self.polygons)):
                mask = cand[:, poly_idx] & (out == -1)
                if not mask.any():
                    continue
                xs, ys = self.polygons[poly_idx]
                hit = point_in_polygon(px[mask], py[mask], xs, ys)
                sel = np.flatnonzero(mask)[hit]
                out[sel] = poly_idx
            return out
        # tree path: per-leaf bbox prune, then same priority scan
        for leaf_i, items in enumerate(self.leaf_items):
            lb = self.leaf_bounds[leaf_i]
            m = (px >= lb[0]) & (px <= lb[2]) & (py >= lb[1]) & (py <= lb[3])
            if not m.any():
                continue
            pts = np.flatnonzero(m)
            for poly_idx in sorted(items):
                b = self.bounds[poly_idx]
                mm = pts[(px[pts] >= b[0]) & (px[pts] <= b[2]) &
                         (py[pts] >= b[1]) & (py[pts] <= b[3])]
                mm = mm[(out[mm] == -1) | (out[mm] > poly_idx)]
                if len(mm) == 0:
                    continue
                xs, ys = self.polygons[poly_idx]
                hit = point_in_polygon(px[mm], py[mm], xs, ys)
                sel = mm[hit]
                prev = out[sel]
                out[sel] = np.where((prev == -1) | (prev > poly_idx), poly_idx, prev)
        return out

    def query_all(self, px: np.ndarray, py: np.ndarray):
        """(point_idx, polygon_idx) pairs for EVERY containment (inner join)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        pts_out, polys_out = [], []
        if self.dense:
            cand = self._candidates_dense(px, py)
            for poly_idx in range(len(self.polygons)):
                pts = np.flatnonzero(cand[:, poly_idx])
                if len(pts) == 0:
                    continue
                xs, ys = self.polygons[poly_idx]
                hit = point_in_polygon(px[pts], py[pts], xs, ys)
                sel = pts[hit]
                pts_out.append(sel)
                polys_out.append(np.full(len(sel), poly_idx, dtype=np.int64))
        else:
            # tree path: per-leaf bbox prune, emit EVERY hit.  Leaves
            # partition the polygon set, so no pair is emitted twice.
            for leaf_i, items in enumerate(self.leaf_items):
                lb = self.leaf_bounds[leaf_i]
                m = (px >= lb[0]) & (px <= lb[2]) & (py >= lb[1]) & (py <= lb[3])
                if not m.any():
                    continue
                pts0 = np.flatnonzero(m)
                for poly_idx in items:
                    b = self.bounds[poly_idx]
                    mm = pts0[(px[pts0] >= b[0]) & (px[pts0] <= b[2]) &
                              (py[pts0] >= b[1]) & (py[pts0] <= b[3])]
                    if len(mm) == 0:
                        continue
                    xs, ys = self.polygons[poly_idx]
                    hit = point_in_polygon(px[mm], py[mm], xs, ys)
                    sel = mm[hit]
                    if len(sel):
                        pts_out.append(sel)
                        polys_out.append(
                            np.full(len(sel), poly_idx, dtype=np.int64))
        if not pts_out:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        return np.concatenate(pts_out), np.concatenate(polys_out)
