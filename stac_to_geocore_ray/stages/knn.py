"""Hex-grid kNN ring search (actor-pool stage).

Nearest-catalog-entry lookup via hex-grid rings (the H3 kNN pattern
from BASELINE.json north_star): catalog centroids are bucketed into
hex cells at a coarse resolution once per actor; each probe point
conceptually expands rings k = 0, 1, 2, ... around its own cell until
candidates appear, takes ``slack`` extra rings, and picks the true
planar-nearest candidate.

Implementation note: enumerating ring cells is O(k^2) per step and
degenerate when the nearest occupied bucket is far away, so the walk
is computed CLOSED-FORM: the hex ``grid_distance`` from the probe's
home cell to every *occupied* bucket (there are at most
min(#catalog, #cells) of those) gives k0 = min distance directly, and
the candidate set is exactly the buckets with distance <= k0 + slack —
identical semantics to the literal ring expansion, O(#occupied
buckets) instead of O(k0^3).  With slack >= 2 the winner equals the
exact planar nearest neighbour (worst-case ring/euclidean mismatch at
hex boundaries is one ring each way), which is what the oracle SQL
cross-join argmin checks.

Distances are planar euclidean in (lon, lat) degrees — consistent with
the hex grid's planar projection and SQL-reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import hexgrid

_R_EARTH_KM = 6371.0


def haversine_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in km (broadcasting, float64)."""
    p1 = np.radians(np.asarray(lat1, dtype=np.float64))
    p2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dphi = p2 - p1
    dlmb = np.radians(np.asarray(lon2, dtype=np.float64)) \
        - np.radians(np.asarray(lon1, dtype=np.float64))
    a = np.sin(dphi / 2.0) ** 2 \
        + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2
    return 2.0 * _R_EARTH_KM * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


class HexKNN:
    """``map_batches`` callable: appends knn_id + knn_dist columns.

    catalog: (ids: list[str], xs: np.ndarray, ys: np.ndarray) or a
    ray.ObjectRef of one (resolved once in ``__init__``).
    """

    def __init__(self, catalog, res: int = 3, slack: int = 2,
                 x_col: str = "cx", y_col: str = "cy",
                 metric: str = "euclid"):
        """``metric``: "euclid" (planar degrees, hex-ring pruned — the
        SQL-reproducible default) or "haversine" (great-circle km —
        the geodesic option; the dense path computes the exact full
        distance matrix, the big-catalog bucket path widens the ring
        bound by sec(lat) to cover longitude-degree compression)."""
        try:
            import ray
            if isinstance(catalog, ray.ObjectRef):
                catalog = ray.get(catalog)
        except ImportError:
            pass
        ids, xs, ys = catalog
        self.ids = list(ids)
        self.xs = np.asarray(xs, dtype=np.float64)
        self.ys = np.asarray(ys, dtype=np.float64)
        self.res = res
        self.slack = slack
        self.x_col, self.y_col = x_col, y_col
        if metric not in ("euclid", "haversine"):
            raise ValueError(f"unknown metric {metric!r}")
        self.metric = metric
        cells = hexgrid.latlng_to_cell(self.ys, self.xs, res)
        members: dict[int, list[int]] = {}
        for i, c in enumerate(cells.tolist()):
            members.setdefault(c, []).append(i)
        self.bucket_cells = np.asarray(list(members.keys()), dtype=np.int64)
        self.bucket_members = [np.asarray(v, dtype=np.int64)
                               for v in members.values()]

    def _candidates(self, home: int, widen: float = 1.0) -> np.ndarray:
        """Catalog indices within (k0 + slack) rings of ``home``."""
        if len(self.bucket_cells) == 0:
            return np.empty(0, dtype=np.int64)
        d = hexgrid.grid_distance(self.bucket_cells,
                                  np.full(len(self.bucket_cells), home,
                                          dtype=np.int64))
        k0 = int(d.min())
        # hex distance is anisotropic: center separation at grid distance
        # k ranges [1.5kR, sqrt(3)kR], plus +-R point-in-cell wobble -> a
        # euclid-nearer candidate can sit up to ~1.1547*k0 + O(1) rings
        # out.  Bound accordingly (slack covers the O(1) term);
        # ``widen`` scales the bound for non-planar metrics.
        k_lim = int(np.ceil(k0 * widen * (2.0 / np.sqrt(3.0)))) + 1 + self.slack
        sel = np.flatnonzero(d <= k_lim)
        return np.concatenate([self.bucket_members[i] for i in sel])

    _DENSE_LIMIT = 4096

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy()
        py = batch[self.y_col].to_numpy()
        n = len(px)
        cell_of = hexgrid.latlng_to_cell(py, px, self.res)
        if len(self.ids) <= self._DENSE_LIMIT:
            out_idx, out_d = self._dense(px, py, cell_of)
        else:
            out_idx, out_d = self._per_cell(px, py, cell_of, n)
        ids = pa.array([self.ids[i] if i >= 0 else None for i in out_idx.tolist()],
                       pa.string())
        out = batch.append_column("knn_id", ids)
        return out.append_column("knn_dist", pa.array(out_d))

    def _dense(self, px, py, cell_of):
        """Small-catalog fast path: one (probes x buckets) grid-distance
        matrix + one (probes x catalog) euclid matrix, ring-candidate
        mask applied before the argmin — identical semantics to the
        per-cell ring walk, no Python loop."""
        if len(self.bucket_cells) == 0:
            return (np.full(len(px), -1, dtype=np.int64),
                    np.full(len(px), np.inf))
        if self.metric == "haversine":
            # small catalog: exact full great-circle matrix (ring
            # pruning is planar and could drop the geodesic nearest)
            d = haversine_km(py[:, None], px[:, None],
                             self.ys[None, :], self.xs[None, :])
            best = np.argmin(d, axis=1)
            bd = d[np.arange(len(px)), best]
            return best.astype(np.int64), bd
        _, qc, rc = hexgrid.unpack(cell_of)
        _, qb, rb = hexgrid.unpack(self.bucket_cells)
        dq = qc[:, None] - qb[None, :]
        dr = rc[:, None] - rb[None, :]
        gd = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2   # (n, B)
        k0 = gd.min(axis=1)
        k_lim = np.ceil(k0 * (2.0 / np.sqrt(3.0))).astype(np.int64) + 1 + self.slack
        bucket_ok = gd <= k_lim[:, None]                         # (n, B)
        # expand bucket mask to catalog-entry mask
        entry_ok = np.zeros((len(px), len(self.ids)), dtype=bool)
        for b, members in enumerate(self.bucket_members):
            entry_ok[:, members] |= bucket_ok[:, b][:, None]
        dx = px[:, None] - self.xs[None, :]
        dy = py[:, None] - self.ys[None, :]
        d2 = dx * dx + dy * dy
        d2[~entry_ok] = np.inf
        best = np.argmin(d2, axis=1)
        bd = d2[np.arange(len(px)), best]
        return (np.where(np.isfinite(bd), best, -1).astype(np.int64),
                np.sqrt(bd))

    def _per_cell(self, px, py, cell_of, n):
        out_idx = np.full(n, -1, dtype=np.int64)
        out_d = np.full(n, np.inf)
        for cell in np.unique(cell_of):
            mask = cell_of == cell
            widen = 1.0
            if self.metric == "haversine":
                # longitude degrees compress by cos(lat): widen the
                # planar ring bound so the geodesic nearest survives
                lat = float(np.abs(py[mask]).max())
                widen = 1.0 / max(np.cos(np.radians(min(lat, 85.0))), 0.05)
            cand = self._candidates(int(cell), widen=widen)
            if len(cand) == 0:
                continue
            # sort so exact-distance ties break to the LOWEST catalog
            # index, matching the dense path and the SQL oracle's
            # ORDER BY coll_index ASC (bucket insertion order is not
            # index order)
            cand = np.sort(cand)
            if self.metric == "haversine":
                d = haversine_km(py[mask][:, None], px[mask][:, None],
                                 self.ys[cand][None, :], self.xs[cand][None, :])
                best = np.argmin(d, axis=1)
                out_idx[mask] = cand[best]
                out_d[mask] = d[np.arange(int(mask.sum())), best]
                continue
            dx = self.xs[cand][None, :] - px[mask][:, None]
            dy = self.ys[cand][None, :] - py[mask][:, None]
            d2 = dx * dx + dy * dy
            best = np.argmin(d2, axis=1)
            out_idx[mask] = cand[best]
            out_d[mask] = np.sqrt(d2[np.arange(int(mask.sum())), best])
        return out_idx, out_d
