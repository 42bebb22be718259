"""stages/dbscan.py: grid DBSCAN semantics on synthetic point sets.

The oracle gate checks geo_dbscan against the plane-sweep golden at
sf0.01/sf0.1; here a brute-force O(n^2) scalar reference pins the
pinned conventions (closed neighborhood, self-counted min_pts,
min-core-pid labels, deterministic border assignment) on constructed
geometries that force every code path: cross-cell pairs, exact
boundary distances, isolated cores, border ties, all-noise sets.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ref_dbscan(pid, px, py, eps, min_pts):
    """Brute-force reference (no grid, no cells)."""
    n = len(pid)
    px = np.asarray(px, dtype=np.int64)
    py = np.asarray(py, dtype=np.int64)
    d2 = (px[:, None] - px[None, :]) ** 2 + (py[:, None] - py[None, :]) ** 2
    nbr = d2 <= eps * eps                       # includes self
    is_core = nbr.sum(axis=1) >= min_pts
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if nbr[i, j] and is_core[i] and is_core[j]:
                a, b = find(pid[i]), find(pid[j])
                if a != b:
                    lo, hi = (a, b) if a < b else (b, a)
                    parent[hi] = lo
    out = []
    for i in range(n):
        if is_core[i]:
            out.append((pid[i], "core", find(pid[i])))
        else:
            cl = [find(pid[j]) for j in range(n) if nbr[i, j] and is_core[j]]
            out.append((pid[i], "border", min(cl)) if cl
                       else (pid[i], "noise", -1))
    return sorted(out)


def _run(pid, px, py, eps, min_pts, blocks=4):
    import ray.data as rd

    from stac_to_geocore_ray.stages.dbscan import dbscan
    ds = rd.from_arrow(pa.table({
        "pid": pa.array(np.asarray(pid, dtype=np.int64)),
        "px": pa.array(np.asarray(px, dtype=np.int64)),
        "py": pa.array(np.asarray(py, dtype=np.int64))})) \
        .repartition(blocks)
    got = dbscan(ds, eps, min_pts).to_pandas()
    return sorted(zip(got.pid.astype(int), got.role, got.cluster.astype(int)))


class TestDBSCAN:
    def test_two_blobs_and_noise(self, ray_session):
        # blob A: 5 points in a tight cross; blob B: 4 chained points
        # spanning several grid cells; 2 isolated noise points
        pid = list(range(11))
        px = [0, 10, -10, 0, 0,   1000, 1090, 1180, 1270,   5000, -5000]
        py = [0, 0, 0, 10, -10,   1000, 1000, 1000, 1000,   5000, -5000]
        eps, min_pts = 100, 3
        assert _run(pid, px, py, eps, min_pts) == \
            _ref_dbscan(pid, px, py, eps, min_pts)

    def test_closed_boundary_and_cross_cell(self, ray_session):
        # pairs at EXACTLY d == eps, placed to straddle cell borders
        # (cell size == eps, so (99,0)-(199,0) spans two cells)
        pid = [3, 1, 4, 1_000_001, 7]
        pid = [3, 1, 4, 9, 7]
        px = [99, 199, 299, 399, 499]
        py = [0, 0, 0, 0, 0]
        eps, min_pts = 100, 3
        assert _run(pid, px, py, eps, min_pts) == \
            _ref_dbscan(pid, px, py, eps, min_pts)
        # one micro-unit farther -> chain breaks into noise
        px2 = [0, 101, 202, 303, 404]
        assert _run(pid, px2, py, eps, min_pts) == \
            _ref_dbscan(pid, px2, py, eps, min_pts)

    def test_border_takes_min_core_label(self, ray_session):
        # a border point within eps of cores from TWO different
        # clusters: cores at +-40 (each made core by two satellites),
        # the probe at 0 touches both but has only 3 neighbors incl
        # self (< min_pts=4), and the two cores are 80 apart (> eps)
        # so the clusters never merge
        pid = [10, 11, 12, 20, 21, 22, 5]
        px = [-40, -41, -42, 40, 41, 42, 0]
        py = [0, 0, 0, 0, 0, 0, 0]
        eps, min_pts = 40, 4
        ref = _ref_dbscan(pid, px, py, eps, min_pts)
        got = _run(pid, px, py, eps, min_pts)
        assert got == ref
        lab5 = dict((p, (r, c)) for p, r, c in got)[5]
        assert lab5[0] == "border" and lab5[1] == 10  # min of {10, 20}

    def test_all_noise_and_negatives(self, ray_session):
        pid = [2, 0, 1]
        px = [-1_000_000, 0, 1_000_000]
        py = [-2_000_000, 0, 2_000_000]
        assert _run(pid, px, py, 500, 2) == \
            _ref_dbscan(pid, px, py, 500, 2)

    def test_randomized_parity(self, ray_session):
        rng = np.random.default_rng(13)
        for trial in range(8):
            n = int(rng.integers(20, 120))
            pid = rng.permutation(10 * n)[:n].astype(int).tolist()
            px = rng.integers(-500, 500, n).tolist()
            py = rng.integers(-500, 500, n).tolist()
            eps = int(rng.integers(30, 200))
            min_pts = int(rng.integers(2, 6))
            assert _run(pid, px, py, eps, min_pts, blocks=3) == \
                _ref_dbscan(pid, px, py, eps, min_pts), \
                (trial, n, eps, min_pts)
