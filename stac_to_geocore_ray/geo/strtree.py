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
    Interior via the even-odd crossing rule, with points EXACTLY on an
    edge counted inside — CLOSED containment, matching rect mode's
    ``>= w AND <= e`` bbox test and the closed-interval SQL oracles
    (plain even-odd excludes a rectangle's east/north edges, so the
    two modes disagreed on boundary probes before round 3).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x1, y1 = xs, ys
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    inside = np.zeros(px.shape, dtype=bool)
    on_edge = np.zeros(px.shape, dtype=bool)
    for k in range(len(xs)):
        ax, ay, bx, by = x1[k], y1[k], x2[k], y2[k]
        # exact on-segment test (collinear + within segment bbox) —
        # float-exact for the coordinate-equality cases that matter
        col = (bx - ax) * (py - ay) == (by - ay) * (px - ax)
        if col.any():
            on_edge |= (col
                        & (px >= min(ax, bx)) & (px <= max(ax, bx))
                        & (py >= min(ay, by)) & (py <= max(ay, by)))
        cond = (ay > py) != (by > py)
        if not cond.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (py - ay) / (by - ay)
        cross = cond & (px < ax + t * (bx - ax))
        inside ^= cross
    return inside | on_edge


class STRtree:
    """Static packed R-tree over polygon bboxes (STR bulk load).

    Parameters
    ----------
    polygons : list of (xs, ys) vertex arrays (closed or open rings).
    node_capacity : fan-out of the packed tree.
    """

    def __init__(self, polygons=None, node_capacity: int = 16,
                 dense_limit: int = 4096, bboxes=None):
        """``polygons``: list of (xs, ys) rings — general catalogs.

        ``bboxes``: an (N, 4) [w, s, e, n] array instead — RECT mode:
        for axis-aligned rectangle catalogs (bbox footprints — the
        dominant real case) containment IS the bbox test, so the
        ray-cast confirmation is skipped entirely and the broadcast
        payload is one packed array instead of 2N small ones
        (per-1024-probe batch vs a 50k-rect catalog: 177 ms -> see
        BENCH notes)."""
        if bboxes is not None:
            self.polygons = None              # rect mode
            self.bounds = np.ascontiguousarray(
                bboxes, dtype=np.float64).reshape(-1, 4)
            n = len(self.bounds)
        else:
            self.polygons = [(np.asarray(xs, dtype=np.float64),
                              np.asarray(ys, dtype=np.float64))
                             for xs, ys in polygons]
            n = len(self.polygons)
            self.bounds = np.empty((n, 4), dtype=np.float64)   # w, s, e, n
            for i, (xs, ys) in enumerate(self.polygons):
                self.bounds[i] = (xs.min(), ys.min(), xs.max(), ys.max())
        self.n = n
        self.dense = n <= dense_limit
        self.cap = node_capacity
        if not self.dense:
            self._build()

    def _build(self) -> None:
        idx = np.arange(self.n)
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
        self.items_flat = np.concatenate(leaves) if leaves else \
            np.empty(0, dtype=np.int64)
        self.leaf_sizes = np.array([len(l) for l in leaves], dtype=np.int64)
        self.leaf_offsets = np.cumsum(self.leaf_sizes) - self.leaf_sizes
        self.leaf_bounds = np.array([
            [self.bounds[l, 0].min(), self.bounds[l, 1].min(),
             self.bounds[l, 2].max(), self.bounds[l, 3].max()] for l in leaves])
        # packed upper levels: STR ordering is spatial, so grouping
        # consecutive runs of `cap` nodes yields tight parents; the
        # batched query walks top-down with shrinking point subsets
        # instead of testing every leaf against every probe
        # (O(top_nodes x probes) instead of O(leaves x probes))
        self.levels = [self.leaf_bounds]
        while len(self.levels[-1]) > self.cap:
            child = self.levels[-1]
            n_par = (len(child) + self.cap - 1) // self.cap
            par = np.empty((n_par, 4), dtype=np.float64)
            for p in range(n_par):
                blk = child[p * self.cap:(p + 1) * self.cap]
                par[p] = (blk[:, 0].min(), blk[:, 1].min(),
                          blk[:, 2].max(), blk[:, 3].max())
            self.levels.append(par)

    def _leaf_pairs(self, pw: np.ndarray, ps: np.ndarray,
                    pe: np.ndarray, pn: np.ndarray):
        """(leaf_index, probe_index) candidate pair arrays whose bboxes
        intersect: a LEVEL SWEEP down the packed hierarchy — active
        (node, probe) pair arrays expand to children with repeat/cumsum
        index math and filter by closed rect OVERLAP at each level, so
        pruning costs vector ops proportional to the live candidate
        set, never per-node Python (and never a full leaves x probes
        matrix: the sweep measured 13x faster than the broadcast matrix
        even in the small regime where the matrix fits).

        Probes are rectangles [w, s, e, n]; a point probe is the
        degenerate rect w == e, s == n, for which the overlap test
        reduces EXACTLY to the original containment test."""
        top = len(self.levels) - 1
        n_top = len(self.levels[top])
        N = np.repeat(np.arange(n_top, dtype=np.int64), len(pw))
        P = np.tile(np.arange(len(pw), dtype=np.int64), n_top)
        b = self.levels[top][N]
        keep = ((pe[P] >= b[:, 0]) & (pw[P] <= b[:, 2])
                & (pn[P] >= b[:, 1]) & (ps[P] <= b[:, 3]))
        N, P = N[keep], P[keep]
        for level in range(top - 1, -1, -1):
            if len(N) == 0:
                break
            n_lv = len(self.levels[level])
            child0 = N * self.cap
            ccount = np.minimum(self.cap, n_lv - child0)
            tot = int(ccount.sum())
            Pc = np.repeat(P, ccount)
            starts = np.repeat(child0, ccount)
            base = np.cumsum(ccount) - ccount
            intra = np.arange(tot, dtype=np.int64) - np.repeat(base, ccount)
            C = starts + intra
            b = self.levels[level][C]
            keep = ((pe[Pc] >= b[:, 0]) & (pw[Pc] <= b[:, 2])
                    & (pn[Pc] >= b[:, 1]) & (ps[Pc] <= b[:, 3]))
            N, P = C[keep], Pc[keep]
        return N, P

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
        if self.n == 0:
            return out
        if self.dense:
            cand = self._candidates_dense(px, py)
            if self.polygons is None:         # rect mode: bbox test IS hit
                any_ = cand.any(axis=1)
                return np.where(any_, cand.argmax(axis=1), -1).astype(np.int64)
            # iterate polygons in priority order; test only still-unmatched pts
            for poly_idx in range(self.n):
                mask = cand[:, poly_idx] & (out == -1)
                if not mask.any():
                    continue
                xs, ys = self.polygons[poly_idx]
                hit = point_in_polygon(px[mask], py[mask], xs, ys)
                sel = np.flatnonzero(mask)[hit]
                out[sel] = poly_idx
            return out
        # tree path: leaf candidates -> flat (poly, point) pair arrays
        # -> one vectorized bbox gather -> ray-cast grouped by the few
        # surviving polygons -> groupby-min for lowest-index priority.
        # (The round-1 per-leaf/per-poly Python loops cost ~33us per
        # near-empty numpy call x 100k polygons.)
        P, Q = self._bbox_pairs(px, py)
        if len(P) == 0:
            return out
        big = np.int64(1 << 62)
        res = np.full(px.shape, big, dtype=np.int64)
        if self.polygons is None:             # rect mode: pairs are hits
            np.minimum.at(res, Q, P)
            return np.where(res == big, np.int64(-1), res)
        for poly_idx in np.unique(P):
            sel = Q[P == poly_idx]
            xs, ys = self.polygons[poly_idx]
            hit = point_in_polygon(px[sel], py[sel], xs, ys)
            np.minimum.at(res, sel[hit], np.int64(poly_idx))
        return np.where(res == big, np.int64(-1), res)

    def _bbox_pairs(self, px: np.ndarray, py: np.ndarray):
        """Tree path helper: bbox-confirmed (polygon_idx, point_idx)
        candidate pair arrays, fully vectorized — leaf pairs expand to
        member polygons with the same repeat/cumsum index math."""
        return self._rect_pairs(px, py, px, py)

    def _rect_pairs(self, pw: np.ndarray, ps: np.ndarray,
                    pe: np.ndarray, pn: np.ndarray):
        """Tree path helper: overlap-confirmed (stored_idx, probe_idx)
        pair arrays for rectangle probes [w, s, e, n]."""
        L, Q0 = self._leaf_pairs(pw, ps, pe, pn)
        if len(L) == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e
        reps = self.leaf_sizes[L]
        tot = int(reps.sum())
        Q = np.repeat(Q0, reps)
        starts = np.repeat(self.leaf_offsets[L], reps)
        base = np.cumsum(reps) - reps
        intra = np.arange(tot, dtype=np.int64) - np.repeat(base, reps)
        P = self.items_flat[starts + intra]
        b = self.bounds[P]
        m = ((pe[Q] >= b[:, 0]) & (pw[Q] <= b[:, 2]) &
             (pn[Q] >= b[:, 1]) & (ps[Q] <= b[:, 3]))
        return P[m], Q[m]

    def query_rects_all(self, rects: np.ndarray):
        """(probe_idx, stored_idx) pairs for EVERY closed rectangle
        OVERLAP (inner intersection join) — the 2-D interval-overlap
        predicate (a.w <= b.e AND a.e >= b.w AND a.s <= b.n AND
        a.n >= b.s), the spatial analogue of the events range join.

        RECT-mode catalogs only: for polygon catalogs the bbox overlap
        is a superset of true polygon intersection and an exact
        confirm (clipping) is out of scope — fail loud rather than
        return approximate pairs.

        ``rects``: (N, 4) float array of probe bboxes [w, s, e, n].
        Degenerate (w > e) antimeridian-crossing boxes are treated as
        literal intervals (matching a plain SQL overlap predicate);
        split them with footprint_split first for geographic
        semantics.
        """
        if self.polygons is not None:
            raise NotImplementedError(
                "query_rects_all is exact only for rect-mode catalogs; "
                "polygon catalogs would need an intersection confirm")
        r = np.ascontiguousarray(rects, dtype=np.float64).reshape(-1, 4)
        pw, ps, pe, pn = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
        if self.n == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e
        if self.dense:
            b = self.bounds
            cand = ((pe[:, None] >= b[None, :, 0])
                    & (pw[:, None] <= b[None, :, 2])
                    & (pn[:, None] >= b[None, :, 1])
                    & (ps[:, None] <= b[None, :, 3]))
            qq, pp = np.nonzero(cand)
            return qq.astype(np.int64), pp.astype(np.int64)
        P, Q = self._rect_pairs(pw, ps, pe, pn)
        return Q.astype(np.int64), P.astype(np.int64)

    def query_all(self, px: np.ndarray, py: np.ndarray):
        """(point_idx, polygon_idx) pairs for EVERY containment (inner join)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        pts_out, polys_out = [], []
        if self.n == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        if self.dense:
            cand = self._candidates_dense(px, py)
            if self.polygons is None:         # rect mode
                qq, pp = np.nonzero(cand)
                return qq.astype(np.int64), pp.astype(np.int64)
            for poly_idx in range(self.n):
                pts = np.flatnonzero(cand[:, poly_idx])
                if len(pts) == 0:
                    continue
                xs, ys = self.polygons[poly_idx]
                hit = point_in_polygon(px[pts], py[pts], xs, ys)
                sel = pts[hit]
                pts_out.append(sel)
                polys_out.append(np.full(len(sel), poly_idx, dtype=np.int64))
        else:
            # tree path: same vectorized pair expansion as query_points;
            # leaves partition the polygon set, so no pair repeats
            P, Q = self._bbox_pairs(px, py)
            if self.polygons is None:         # rect mode: pairs are hits
                return Q.astype(np.int64), P.astype(np.int64)
            for poly_idx in np.unique(P):
                sel = Q[P == poly_idx]
                xs, ys = self.polygons[poly_idx]
                hit = point_in_polygon(px[sel], py[sel], xs, ys)
                kept = sel[hit]
                if len(kept):
                    pts_out.append(kept)
                    polys_out.append(
                        np.full(len(kept), poly_idx, dtype=np.int64))
        if not pts_out:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        return np.concatenate(pts_out), np.concatenate(polys_out)
