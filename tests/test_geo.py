"""Unit tests: S2, hex grid, STRtree, bbox kernels (no Ray needed)."""

import numpy as np
import pytest

from stac_to_geocore_ray.geo import bbox, hexgrid, s2, strtree


class TestS2:
    def test_roundtrip_center(self):
        lats = np.array([45.5, -33.86, 0.0, 82.0, -89.9, 42.0, 0.1])
        lngs = np.array([-73.6, 151.2, 0.0, -141.0, 10.0, 179.9, -0.1])
        cells = s2.latlng_to_cell(lats, lngs)
        la, lo = s2.cell_to_latlng(cells)
        assert np.max(np.abs(la - lats)) < 1e-4
        assert np.max(np.abs(lo - lngs)) < 1e-4

    def test_levels_and_hierarchy(self):
        lats = np.linspace(-80, 80, 50)
        lngs = np.linspace(-170, 170, 50)
        leaf = s2.latlng_to_cell(lats, lngs)
        assert (s2.level(leaf) == 30).all()
        for lvl in (5, 9, 15):
            direct = s2.latlng_to_cell(lats, lngs, lvl)
            via_parent = s2.parent(leaf, lvl)
            assert (direct == via_parent).all()
            assert (s2.level(direct) == lvl).all()

    def test_nearby_points_share_coarse_cell(self):
        base = s2.latlng_to_cell(np.array([45.0]), np.array([-75.0]), 5)
        near = s2.latlng_to_cell(np.array([45.001]), np.array([-75.001]), 5)
        assert base[0] == near[0]

    def test_distinct_regions_distinct_cells(self):
        a = s2.latlng_to_cell(np.array([45.0]), np.array([-75.0]), 9)
        b = s2.latlng_to_cell(np.array([46.0]), np.array([-75.0]), 9)
        assert a[0] != b[0]

    def test_bbox_covering(self):
        cells = s2.bbox_covering(-76, 45, -74, 46, 7)
        assert len(cells) >= 1
        assert (s2.level(cells) == 7).all()
        centre = s2.latlng_to_cell(np.array([45.5]), np.array([-75.0]), 7)
        assert centre[0] in set(cells.tolist())


class TestHexGrid:
    def test_center_roundtrip(self):
        lats = np.linspace(-80, 80, 30)
        lngs = np.linspace(-170, 170, 30)
        for res in (2, 5, 9):
            cells = hexgrid.latlng_to_cell(lats, lngs, res)
            x, y = hexgrid.cell_to_xy(cells)
            again = hexgrid.latlng_to_cell(y, x, res)
            assert (cells == again).all()

    def test_parent_contains_child_center(self):
        cells = hexgrid.latlng_to_cell(np.array([45.42]), np.array([-75.69]), 9)
        parent = hexgrid.cell_to_parent(cells, 5)
        res, _, _ = hexgrid.unpack(parent)
        assert res[0] == 5
        # child's center must land in the parent cell
        x, y = hexgrid.cell_to_xy(cells)
        assert hexgrid.latlng_to_cell(y, x, 5)[0] == parent[0]

    def test_grid_disk_ring_sizes(self):
        c = int(hexgrid.latlng_to_cell(np.array([45.0]), np.array([-75.0]), 6)[0])
        for k in (1, 2, 3):
            assert len(hexgrid.grid_disk(c, k)) == 3 * k * k + 3 * k + 1
            assert len(hexgrid.grid_ring(c, k)) == 6 * k
        d = hexgrid.grid_disk(c, 2)
        assert (hexgrid.grid_distance(d, np.full(len(d), c)) <= 2).all()

    def test_aperture7_area_scaling(self):
        # each res step shrinks the edge by sqrt(7)
        assert hexgrid.edge(3) / hexgrid.edge(4) == pytest.approx(np.sqrt(7.0))


class TestSTRtree:
    def _polys(self):
        return [
            (np.array([0.0, 10, 10, 0]), np.array([0.0, 0, 10, 10])),
            (np.array([5.0, 15, 15, 5]), np.array([5.0, 5, 15, 15])),
            (np.array([20.0, 25, 22]), np.array([20.0, 20, 25])),  # triangle
        ]

    def test_first_match_priority(self):
        t = strtree.STRtree(self._polys())
        res = t.query_points(np.array([7.0]), np.array([7.0]))
        assert res[0] == 0                  # overlap resolves to lowest index

    def test_miss_is_negative(self):
        t = strtree.STRtree(self._polys())
        assert t.query_points(np.array([50.0]), np.array([50.0]))[0] == -1

    def test_non_rectangular(self):
        t = strtree.STRtree(self._polys())
        inside = t.query_points(np.array([21.5]), np.array([20.5]))
        outside_bbox_corner = t.query_points(np.array([24.9]), np.array([24.9]))
        assert inside[0] == 2
        assert outside_bbox_corner[0] == -1  # in bbox, outside triangle

    def test_tree_path_matches_dense(self):
        rng = np.random.RandomState(3)
        polys = []
        for i in range(300):
            x0, y0 = rng.uniform(0, 100, 2)
            w, h = rng.uniform(1, 5, 2)
            polys.append((np.array([x0, x0 + w, x0 + w, x0]),
                          np.array([y0, y0, y0 + h, y0 + h])))
        px, py = rng.uniform(0, 100, (2, 2000))
        dense = strtree.STRtree(polys, dense_limit=4096)
        tree = strtree.STRtree(polys, dense_limit=10)
        assert (dense.query_points(px, py) == tree.query_points(px, py)).all()

    def test_query_all_tree_path_matches_dense(self):
        """query_all tree path must emit EVERY containment, not fall
        back to first-match (round-1 latent wrong-answer)."""
        rng = np.random.RandomState(7)
        polys = []
        for i in range(500):                 # overlapping boxes -> multi-hits
            x0, y0 = rng.uniform(0, 50, 2)
            w, h = rng.uniform(2, 10, 2)
            polys.append((np.array([x0, x0 + w, x0 + w, x0]),
                          np.array([y0, y0, y0 + h, y0 + h])))
        px, py = rng.uniform(0, 50, (2, 3000))
        dense = strtree.STRtree(polys, dense_limit=4096)
        tree = strtree.STRtree(polys, dense_limit=10)
        dp, dq = dense.query_all(px, py)
        tp, tq = tree.query_all(px, py)
        assert len(dp) > 3000                # genuinely multi-match input
        d = sorted(zip(dp.tolist(), dq.tolist()))
        t = sorted(zip(tp.tolist(), tq.tolist()))
        assert d == t
        # and each point's match count beats first-match-only
        first = tree.query_points(px, py)
        assert len(tp) > (first >= 0).sum()


class TestSTRtreeRectMode:
    def test_rect_mode_matches_polygon_mode(self):
        """STRtree(bboxes=...) == STRtree(ring polygons) for rectangle
        catalogs on every query path (dense + tree, first + multi)."""
        rng = np.random.RandomState(13)
        n = 400
        x0 = rng.uniform(0, 80, n); y0 = rng.uniform(0, 80, n)
        w = rng.uniform(1, 8, n); h = rng.uniform(1, 8, n)
        bbs = np.column_stack([x0, y0, x0 + w, y0 + h])
        polys = [(np.array([a, a + c, a + c, a]),
                  np.array([b, b, b + d, b + d]))
                 for a, b, c, d in zip(x0, y0, w, h)]
        px, py = rng.uniform(0, 88, (2, 2000))
        for dl in (4096, 10):                 # dense and tree paths
            tp = strtree.STRtree(polys, dense_limit=dl)
            tr = strtree.STRtree(bboxes=bbs, dense_limit=dl)
            assert (tp.query_points(px, py) == tr.query_points(px, py)).all()
            ap, aq = tp.query_all(px, py)
            bp, bq = tr.query_all(px, py)
            assert sorted(zip(ap.tolist(), aq.tolist())) == \
                sorted(zip(bp.tolist(), bq.tolist()))


class TestSTRtreeRectQuery:
    """query_rects_all: closed 2-D interval-overlap join vs brute force."""

    @staticmethod
    def _catalog(rng, n, span=80.0):
        x0 = rng.uniform(0, span, n); y0 = rng.uniform(0, span, n)
        w = rng.uniform(0.5, 6, n); h = rng.uniform(0.5, 6, n)
        return np.column_stack([x0, y0, x0 + w, y0 + h])

    @staticmethod
    def _brute(probes, cat):
        hits = []
        for i, (pw, ps, pe, pn) in enumerate(probes):
            for j, (w, s, e, n) in enumerate(cat):
                if pe >= w and pw <= e and pn >= s and ps <= n:
                    hits.append((i, j))
        return sorted(hits)

    def test_matches_brute_force_dense_and_tree(self):
        rng = np.random.RandomState(7)
        cat = self._catalog(rng, 300)
        probes = self._catalog(rng, 500, span=85.0)
        ref = self._brute(probes, cat)
        assert len(ref) > 100                       # non-trivial fixture
        for dl in (4096, 10):                       # dense and tree paths
            t = strtree.STRtree(bboxes=cat, dense_limit=dl)
            q, p = t.query_rects_all(probes)
            assert sorted(zip(q.tolist(), p.tolist())) == ref

    def test_point_probe_degenerates_to_containment(self):
        rng = np.random.RandomState(11)
        cat = self._catalog(rng, 200)
        px, py = rng.uniform(0, 88, (2, 800))
        probes = np.column_stack([px, py, px, py])
        for dl in (4096, 10):
            t = strtree.STRtree(bboxes=cat, dense_limit=dl)
            q1, p1 = t.query_rects_all(probes)
            q2, p2 = t.query_all(px, py)
            assert sorted(zip(q1.tolist(), p1.tolist())) == \
                sorted(zip(q2.tolist(), p2.tolist()))

    def test_closed_boundary_and_antimeridian_literal(self):
        cat = np.array([[0.0, 0.0, 1.0, 1.0], [10.0, 10.0, 12.0, 12.0]])
        probes = np.array([
            [1.0, 1.0, 2.0, 2.0],      # touches cat[0] at a corner -> hit
            [1.0 + 1e-12, 1.0, 2.0, 2.0],   # just past the corner -> miss
            [179.9, 0.0, -179.98, 1.0],     # w > e literal interval: e >= 0
        ])                                   # fails pe >= w for both -> miss
        t = strtree.STRtree(bboxes=cat)
        q, p = t.query_rects_all(probes)
        assert sorted(zip(q.tolist(), p.tolist())) == [(0, 0)]

    def test_empty_catalog_and_polygon_mode_guard(self):
        t = strtree.STRtree(bboxes=np.empty((0, 4)))
        q, p = t.query_rects_all(np.array([[0.0, 0.0, 1.0, 1.0]]))
        assert len(q) == 0 and len(p) == 0
        poly = strtree.STRtree([(np.array([0.0, 1, 1, 0]),
                                 np.array([0.0, 0, 1, 1]))])
        with pytest.raises(NotImplementedError):
            poly.query_rects_all(np.array([[0.0, 0.0, 1.0, 1.0]]))


class TestS2Covering:
    def test_union_contains_bbox_points(self):
        """Covering exactness property (VERDICT #9): the cell union is a
        superset of the bbox, incl. antimeridian-adjacent and face-edge
        boxes."""
        rng = np.random.RandomState(17)
        boxes = [(-75.3, 45.2, -75.1, 45.4), (179.8, 10.0, 179.99, 10.2),
                 (-0.1, -0.1, 0.1, 0.1),      # face corner
                 (44.9, -45.1, 45.1, -44.9)]  # face edge
        for _ in range(40):
            w = rng.uniform(-179.9, 178.0); s_ = rng.uniform(-84, 79)
            boxes.append((w, s_, w + rng.uniform(0.01, 2.0),
                          s_ + rng.uniform(0.01, 2.0)))
        for w, s_, e, n in boxes:
            for lvl in (5, 9, 12):
                cov = set(s2.bbox_covering(w, s_, e, n, lvl).tolist())
                px = rng.uniform(w, e, 60)
                py = rng.uniform(s_, n, 60)
                assert set(s2.latlng_to_cell(py, px, lvl).tolist()) <= cov

    def test_covering_is_tight_for_small_boxes(self):
        # a 0.2-degree box at level 7 (~0.6-degree cells) should not
        # blow past a couple of cells per axis
        assert len(s2.bbox_covering(-75.3, 45.2, -75.1, 45.4, 7)) <= 6


class TestBbox:
    def test_round2_before_ring(self):
        r = bbox.rings(np.array([-75.126]), np.array([45.674]),
                       np.array([-74.994]), np.array([46.0049]))
        assert r[0, 0, 0] == -75.13          # round HALF-EVEN like Python
        assert r[0, 2, 1] == 46.0
        assert (r[0, 0] == r[0, 4]).all()    # ring closure

    def test_wkt_exact_reference_form(self):
        [w] = bbox.wkt_polygons(np.array([-75.1234]), np.array([45.6789]),
                                np.array([-74.9876]), np.array([46.0001]))
        assert w == ("POLYGON((-75.12 45.68, -74.99 45.68, -74.99 46.0, "
                     "-75.12 46.0, -75.12 45.68))")

    def test_degenerate_flag(self):
        assert bbox.degenerate(np.array([1.0]), np.array([2.0]),
                               np.array([1.0]), np.array([3.0]))[0]
        assert not bbox.degenerate(np.array([1.0]), np.array([2.0]),
                                   np.array([1.5]), np.array([3.0]))[0]


class TestAntimeridian:
    def test_normal_box_unsplit(self):
        [parts] = bbox.split_antimeridian(-75.0, 45.0, -74.0, 46.0)
        assert parts == [(-75.0, 45.0, -74.0, 46.0)]

    def test_crossing_box_splits(self):
        [parts] = bbox.split_antimeridian(179.5, 10.0, -179.5, 11.0)
        assert parts == [(179.5, 10.0, 180.0, 11.0),
                         (-180.0, 10.0, -179.5, 11.0)]
        # both parts are well-formed (w <= e) and cover the same lat band
        for w, s, e, n in parts:
            assert w <= e and (s, n) == (10.0, 11.0)


class TestClosedContainment:
    """Round-3 boundary fix: polygon-ring mode must agree with rect
    mode and the closed-interval SQL oracles on points exactly on a
    rectangle's edges (plain even-odd excluded east/north edges)."""

    def test_rect_and_ring_agree_on_edges(self):
        import numpy as np
        from stac_to_geocore_ray.geo.strtree import STRtree
        w, s, e, n = 0.0, 0.0, 10.0, 10.0
        ring = (np.array([w, e, e, w]), np.array([s, s, n, n]))
        px = np.array([10.0, 5.0, 10.0, 0.0, 5.0, 11.0, 5.0])
        py = np.array([5.0, 10.0, 10.0, 0.0, 5.0, 5.0, -1.0])
        rect = STRtree(bboxes=np.array([[w, s, e, n]]))
        poly = STRtree(polygons=[ring])
        got_r = rect.query_points(px, py)
        got_p = poly.query_points(px, py)
        exp = np.array([0, 0, 0, 0, 0, -1, -1])
        assert (got_r == exp).all()
        assert (got_p == exp).all()

    def test_empty_catalog_query_all(self):
        import numpy as np
        from stac_to_geocore_ray.geo.strtree import STRtree
        t = STRtree(bboxes=[])
        q, p = t.query_all(np.array([1.0]), np.array([2.0]))
        assert len(q) == 0 and len(p) == 0
        assert t.query_points(np.array([1.0]), np.array([2.0])).tolist() == [-1]


class TestRadiusJoiner:
    """Within-radius join: brute-force parity + boundary closedness."""

    def _batch(self, rects, ids=None):
        import pyarrow as pa
        n = len(rects)
        ids = ids or [f"img_{i:09d}" for i in range(n)]
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bbox": pa.FixedSizeListArray.from_arrays(
                pa.array(np.asarray(rects, float).ravel()), 4)})

    def test_matches_brute_force(self):
        from stac_to_geocore_ray.stages.pip_join import RadiusJoiner
        rng = np.random.RandomState(13)
        px, py = rng.uniform(-80, 80, (2, 150))
        cat_ids = [f"cat_{j}" for j in range(150)]
        cx, cy = rng.uniform(-80, 80, (2, 400))
        rects = np.column_stack([cx - 0.5, cy - 0.5, cx + 0.5, cy + 0.5])
        r = 5.0
        j = RadiusJoiner((cat_ids, px, py), r)
        out = j(self._batch(rects))
        got = sorted(zip(out["image_id"].to_pylist(),
                         out["cat_id"].to_pylist()))
        ref = []
        for i in range(400):
            for k in range(150):
                dx, dy = cx[i] - px[k], cy[i] - py[k]
                if dx * dx + dy * dy <= r * r:
                    ref.append((f"img_{i:09d}", f"cat_{k}"))
        assert got == sorted(ref)
        assert len(ref) > 100

    def test_boundary_is_closed_and_pad_never_drops(self):
        from stac_to_geocore_ray.stages.pip_join import RadiusJoiner
        # points at EXACTLY r, just inside, just outside
        j = RadiusJoiner((["c"], np.array([0.0]), np.array([0.0])), 1.0)
        rects = np.array([
            [1.0, 0.0, 1.0, 0.0],          # dist == r -> hit (closed)
            [0.6, 0.8, 0.6, 0.8],          # 3-4-5: dist == r -> hit
            [1.0 + 1e-9, 0.0, 1.0 + 1e-9, 0.0],   # outside -> miss
        ])
        out = j(self._batch(rects, ids=["a", "b", "c"]))
        assert sorted(out["image_id"].to_pylist()) == ["a", "b"]


class TestRectUnionArea:
    def test_grid_equals_sweep_random(self):
        """Property: the O(k^2)-cell grid and the O(k)-memory sweep
        compute the same exact union on random overlapping rects."""
        from stac_to_geocore_ray.stages.footprint import (
            rect_union_area_grid, rect_union_area_sweep)
        rng = np.random.RandomState(7)
        for _ in range(100):
            k = rng.randint(1, 60)
            x0 = rng.randint(-1000, 1000, k)
            y0 = rng.randint(-1000, 1000, k)
            r = np.stack([x0, y0, x0 + rng.randint(0, 500, k),
                          y0 + rng.randint(0, 500, k)], 1)
            assert rect_union_area_grid(r) == rect_union_area_sweep(r)

    def test_known_shapes(self):
        from stac_to_geocore_ray.stages.footprint import rect_union_area
        # disjoint
        assert rect_union_area(np.array([[0, 0, 2, 2],
                                         [10, 10, 12, 12]])) == 8
        # fully nested
        assert rect_union_area(np.array([[0, 0, 10, 10],
                                         [2, 2, 4, 4]])) == 100
        # half overlap
        assert rect_union_area(np.array([[0, 0, 4, 2],
                                         [2, 0, 6, 2]])) == 12
        # degenerate / inverted drop out
        assert rect_union_area(np.array([[5, 5, 5, 9],
                                         [9, 9, 5, 12]])) == 0

    def test_tile_decomposition_exact(self, ray_session, tiny_blocks):
        """Engine (tiled, mixed grid/sweep kernels) == golden (global
        untiled sweep) on the fixture — overlapping boxes straddle the
        4-degree tile edges by construction."""
        from stac_to_geocore_ray.queries import geo_union_area
        from stac_to_geocore_ray.goldens import golden_geo_union_area
        got = geo_union_area("/root/testdata/sf0.001").to_pandas() \
            .sort_values("collection_id").reset_index(drop=True)
        ref = golden_geo_union_area("/root/testdata/sf0.001") \
            .to_pandas().sort_values("collection_id") \
            .reset_index(drop=True)
        assert got.collection_id.tolist() == ref.collection_id.tolist()
        assert got.union_area_u.tolist() == ref.union_area_u.tolist()
        # union never exceeds per-item sum, never below max single box
        assert (got.union_area_u > 0).all()


class TestUnionAdaptive:
    def test_adaptive_equals_sweep_dense(self):
        """Quadtree-split union (full-cover + bbox pruning) == slab
        sweep on dense overlapping clusters above the grid bound."""
        from stac_to_geocore_ray.stages.footprint import (
            rect_union_area, rect_union_area_sweep, UNION_GRID_MAX)
        rng = np.random.RandomState(11)
        for _ in range(10):
            k = rng.randint(UNION_GRID_MAX + 1, 2500)
            cx = rng.randint(0, 500_000, k)
            cy = rng.randint(0, 500_000, k)
            hw = rng.randint(1, 150_000, k)
            r = np.stack([cx, cy, cx + hw, cy + hw], 1)
            assert rect_union_area(r) == rect_union_area_sweep(r)

    def test_full_cover_shortcut(self):
        """One giant rect over thousands of small ones: area == the
        giant rect, answered without subdividing into it."""
        from stac_to_geocore_ray.stages.footprint import rect_union_area
        rng = np.random.RandomState(3)
        k = 2000
        x0 = rng.randint(10, 900, k)
        y0 = rng.randint(10, 900, k)
        r = np.vstack([np.stack([x0, y0, x0 + 5, y0 + 5], 1),
                       np.array([[0, 0, 1000, 1000]])])
        assert rect_union_area(r) == 1000 * 1000


class TestConvexHull:
    """geo/hull.py: exact integer hull + Akl-Toussaint prune."""

    def test_prune_is_exact_and_hull_contains_all(self):
        import numpy as np

        from stac_to_geocore_ray.geo.hull import (
            akl_toussaint_mask, convex_hull_int, shoelace2)
        rng = np.random.default_rng(3)
        for trial in range(200):
            n = int(rng.integers(1, 80))
            lo, hi = (-1000, 1000) if trial % 3 else (-5, 5)
            x = rng.integers(lo, hi, n)
            y = rng.integers(lo, hi, n)
            if trial % 7 == 0:
                y = 2 * x + 3                      # collinear family
            at = akl_toussaint_mask(x, y)
            h1 = convex_hull_int(x, y)
            h2 = convex_hull_int(x[at], y[at])
            assert np.array_equal(h1, h2)          # prune never loses
            if len(h1) >= 3:
                assert shoelace2(h1) > 0
                hx = h1[:, 0].tolist() + [int(h1[0, 0])]
                hy = h1[:, 1].tolist() + [int(h1[0, 1])]
                for px, py in zip(x.tolist(), y.tolist()):
                    assert all(
                        (hx[i + 1] - hx[i]) * (py - hy[i])
                        - (hy[i + 1] - hy[i]) * (px - hx[i]) >= 0
                        for i in range(len(h1)))

    def test_hull_of_hulls_contraction(self):
        """hull(A ∪ B) == hull(hull(A) ∪ hull(B)) — the law the
        per-batch combiner relies on."""
        import numpy as np

        from stac_to_geocore_ray.geo.hull import convex_hull_int
        rng = np.random.default_rng(9)
        for _ in range(100):
            xa = rng.integers(-500, 500, 40)
            ya = rng.integers(-500, 500, 40)
            xb = rng.integers(-300, 800, 40)
            yb = rng.integers(-300, 800, 40)
            full = convex_hull_int(np.r_[xa, xb], np.r_[ya, yb])
            ha = convex_hull_int(xa, ya)
            hb = convex_hull_int(xb, yb)
            two = convex_hull_int(np.r_[ha[:, 0], hb[:, 0]],
                                  np.r_[ha[:, 1], hb[:, 1]])
            assert np.array_equal(full, two)

    def test_degenerate_shapes(self):
        import numpy as np

        from stac_to_geocore_ray.geo.hull import (
            akl_toussaint_mask, convex_hull_int, shoelace2)
        # single point
        h = convex_hull_int(np.array([5]), np.array([7]))
        assert h.tolist() == [[5, 7]] and shoelace2(h) == 0
        assert akl_toussaint_mask(np.array([5]), np.array([7])).all()
        # duplicate points
        h = convex_hull_int(np.array([1, 1, 1]), np.array([2, 2, 2]))
        assert h.tolist() == [[1, 2]] * 1
        # collinear
        h = convex_hull_int(np.array([0, 5, 10]), np.array([0, 5, 10]))
        assert h.tolist() == [[0, 0], [10, 10]] and shoelace2(h) == 0


class TestDouglasPeucker:
    """geo/simplify.py: exact integer DP keep-mask."""

    @staticmethod
    def _dp_ref(xs, ys, eps):
        """Independent recursive scalar DP (same pinned conventions:
        split at max |cross| with smallest-index ties, degenerate-chord
        point-distance fallback, endpoints kept)."""
        n = len(xs)
        keep = [False] * n
        if n == 0:
            return keep
        keep[0] = keep[-1] = True
        if n <= 2:
            return keep
        eps2 = eps * eps

        def rec(i, j):
            if j <= i + 1:
                return
            dx, dy = xs[j] - xs[i], ys[j] - ys[i]
            bk, bv = -1, -1
            for k in range(i + 1, j):
                if dx == 0 and dy == 0:
                    v = (xs[k] - xs[i]) ** 2 + (ys[k] - ys[i]) ** 2
                else:
                    v = abs(dx * (ys[k] - ys[i]) - dy * (xs[k] - xs[i]))
                if v > bv:
                    bk, bv = k, v
            split = (bv > eps2) if (dx == 0 and dy == 0) else \
                (bv * bv > eps2 * (dx * dx + dy * dy))
            if split:
                keep[bk] = True
                rec(i, bk)
                rec(bk, j)

        rec(0, n - 1)
        return keep

    def test_matches_recursive_reference(self):
        import numpy as np

        from stac_to_geocore_ray.geo.simplify import dp_keep_mask
        rng = np.random.default_rng(11)
        for trial in range(300):
            n = int(rng.integers(0, 60))
            lo, hi = (-1000, 1000) if trial % 3 else (-4, 4)
            x = rng.integers(lo, hi, n).astype(np.int64)
            y = rng.integers(lo, hi, n).astype(np.int64)
            if trial % 5 == 0 and n >= 2:
                x[-1], y[-1] = x[0], y[0]        # closed loop
            eps = int(rng.integers(0, 50))
            got = dp_keep_mask(x, y, eps)
            ref = self._dp_ref([int(v) for v in x],
                               [int(v) for v in y], eps)
            assert got.tolist() == ref, (trial, n, eps)

    def test_edge_cases(self):
        import numpy as np

        from stac_to_geocore_ray.geo.simplify import dp_keep_mask
        a = np.array([], dtype=np.int64)
        assert dp_keep_mask(a, a, 5).tolist() == []
        one = np.array([3], dtype=np.int64)
        assert dp_keep_mask(one, one, 5).tolist() == [True]
        # exactly collinear interior points all drop at eps 0... no:
        # eps=0 keeps any point with |cross| > 0; collinear cross == 0
        x = np.arange(10, dtype=np.int64)
        y = 2 * x + 7
        m = dp_keep_mask(x, y, 0)
        assert m.tolist() == [True] + [False] * 8 + [True]
        # zigzag at eps 0: everything kept
        x = np.arange(8, dtype=np.int64)
        y = np.array([0, 9, 1, 8, 0, 9, 1, 8], dtype=np.int64)
        assert dp_keep_mask(x, y, 0).all()
        # huge micro-degree coordinates: no int64 overflow in the
        # vectorized cross (exact compare is big-int)
        x = np.array([-180_000_000, 0, 180_000_000], dtype=np.int64)
        y = np.array([-90_000_000, 90_000_000, -90_000_000],
                     dtype=np.int64)
        assert dp_keep_mask(x, y, 1_000).all()
