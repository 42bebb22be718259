"""Pyramid rollup / focal stencil semantics vs independent pandas
references (the oracle gate checks the same ops against DuckDB SQL;
here the hierarchy and neighborhood invariants are pinned in CI)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _cells(z):
    from stac_to_geocore_ray.queries.geo import _grid_ixiy
    from stac_to_geocore_ray.sources import fixtures
    bb = np.stack(pd.read_parquet(
        fixtures.paths(SF)["stac_items"])["bbox"].to_numpy()) \
        .astype(np.float64)
    ix, iy, keep = _grid_ixiy(bb, z)
    return ix[keep], iy[keep], bb[keep]


class TestGridIndex:
    def test_bounds_and_clamp(self):
        from stac_to_geocore_ray.queries.geo import _grid_ixiy
        bb = np.array([[-180.0, -90.0, -180.0, -90.0],   # min corner
                       [180.0, 90.0, 180.0, 90.0],       # max corner clamps
                       [10.0, 5.0, -10.0, 6.0]])         # w > e drops
        ix, iy, keep = _grid_ixiy(bb, 6)
        assert keep.tolist() == [True, True, False]
        assert ix[0] == 0 and iy[0] == 0
        assert ix[1] == 63 and iy[1] == 63

    def test_parent_is_shift(self):
        ix6, iy6, _ = _cells(6)
        ix5, iy5, _ = _cells(5)
        assert (ix6 >> 1 == ix5).all() and (iy6 >> 1 == iy5).all()


class TestPyramidRollup:
    @pytest.fixture(scope="class")
    def pyr(self, ray_session):
        from stac_to_geocore_ray.queries import geo_pyramid_rollup
        return geo_pyramid_rollup(SF).to_pandas()

    def test_level_totals_conserved(self, pyr):
        """Every zoom level partitions the same item set: per-level
        n_items and sum_ua totals are identical across z."""
        tot = pyr.groupby("z").agg(n=("n_items", "sum"),
                                   ua=("sum_ua", "sum"))
        assert tot.n.nunique() == 1 and tot.ua.nunique() == 1

    def test_parent_equals_child_sum(self, pyr):
        for z in range(6):
            child = pyr[pyr.z == z + 1].copy()
            child["pix"] = child.ix // 2
            child["piy"] = child.iy // 2
            rolled = child.groupby(["pix", "piy"]).agg(
                n=("n_items", "sum"), ua=("sum_ua", "sum")).reset_index()
            parent = pyr[pyr.z == z].sort_values(["ix", "iy"]) \
                .reset_index(drop=True)
            rolled = rolled.sort_values(["pix", "piy"]).reset_index(drop=True)
            assert len(parent) == len(rolled)
            assert (parent.ix.to_numpy() == rolled.pix.to_numpy()).all()
            assert (parent.iy.to_numpy() == rolled.piy.to_numpy()).all()
            assert (parent.n_items.to_numpy() == rolled.n.to_numpy()).all()
            assert (parent.sum_ua.to_numpy() == rolled.ua.to_numpy()).all()

    def test_finest_level_matches_pandas(self, pyr):
        ix, iy, bb = _cells(6)
        ref = pd.DataFrame({"ix": ix, "iy": iy}).groupby(
            ["ix", "iy"]).size().reset_index(name="n")
        got = pyr[pyr.z == 6].sort_values(["ix", "iy"]).reset_index(drop=True)
        ref = ref.sort_values(["ix", "iy"]).reset_index(drop=True)
        assert (got.n_items.to_numpy() == ref.n.to_numpy()).all()


class TestFocalMean:
    def test_matches_brute_force(self, ray_session):
        from stac_to_geocore_ray.queries import geo_focal_mean
        got = geo_focal_mean(SF).to_pandas() \
            .sort_values(["ix", "iy"]).reset_index(drop=True)

        ix, iy, _ = _cells(7)
        cnt = pd.DataFrame({"ix": ix, "iy": iy}).groupby(
            ["ix", "iy"]).size()
        lut = cnt.to_dict()
        rows = []
        for (cx, cy), n in lut.items():
            s = m = 0
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    v = lut.get((cx + dx, cy + dy))
                    if v is not None:
                        s += v
                        m += 1
            rows.append((cx, cy, n, s, m))
        ref = pd.DataFrame(rows, columns=["ix", "iy", "n", "nbr_sum",
                                          "nbr_cells"]) \
            .sort_values(["ix", "iy"]).reset_index(drop=True)
        assert len(got) == len(ref)
        for c in ("ix", "iy", "n", "nbr_sum", "nbr_cells"):
            assert (got[c].to_numpy() == ref[c].to_numpy()).all(), c

    def test_isolated_cells_self_only(self, ray_session):
        from stac_to_geocore_ray.queries import geo_focal_mean
        df = geo_focal_mean(SF).to_pandas()
        solo = df[df.nbr_cells == 1]
        assert (solo.nbr_sum == solo.n).all()
        assert (df.nbr_cells >= 1).all() and (df.nbr_cells <= 9).all()


class TestDocRedact:
    def test_redaction_invariants(self, ray_session):
        import re
        from stac_to_geocore_ray.queries import doc_redact
        from stac_to_geocore_ray.queries.docs import (REDACT_PATTERN,
                                                      REDACT_TOKEN)
        df = doc_redact(SF).to_pandas()
        src = pd.read_parquet(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"]) \
            .set_index("doc_id").text
        rx = re.compile(REDACT_PATTERN)
        assert df.n_redactions.sum() > 0          # pattern actually fires
        for r in df.sample(50, random_state=1).itertuples():
            t = src.loc[r.doc_id]
            assert r.n_redactions == len(rx.findall(t))
            assert rx.search(r.redacted) is None  # nothing left behind
            assert r.redacted == rx.sub(REDACT_TOKEN, t)


class TestDocPrepPipeline:
    def test_stage_invariants(self, ray_session):
        import re
        from stac_to_geocore_ray.queries import doc_prep_pipeline
        from stac_to_geocore_ray.queries.docs import (
            PREP_LANG, PREP_MAX_TOK, PREP_MIN_TOK, REDACT_PATTERN)
        got = doc_prep_pipeline(SF).to_pandas()
        src = pd.read_parquet(f"{SF}/documents.parquet",
                              columns=["doc_id", "text", "lang"])
        assert len(got) > 0
        assert got.redacted.is_unique                    # dedup fired
        assert got.doc_id.isin(src.doc_id).all()
        langs = src.set_index("doc_id").lang
        assert (langs.loc[got.doc_id] == PREP_LANG).all()
        ntok = got.redacted.str.findall(r"\S+").str.len()
        assert ntok.between(PREP_MIN_TOK, PREP_MAX_TOK).all()
        rx = re.compile(REDACT_PATTERN)
        assert not got.redacted.map(lambda t: bool(rx.search(t))).any()
        # keep-first: every survivor is the MIN doc_id of its text group
        en = src[src.lang == PREP_LANG].copy()
        en["red"] = en.text.map(lambda t: rx.sub("<REDACTED>", t))
        first = en.groupby("red").doc_id.min()
        assert got.set_index("redacted").doc_id.eq(
            first.loc[got.redacted].to_numpy()).all()


class TestCellCompact:
    """geo_cell_compact invariants: Morton round-trip, minimality, and
    exact reconstruction of the covered z=9 cell set (the oracle gate
    additionally pins the full output against a chained-CTE DuckDB
    compaction)."""

    def test_morton_roundtrip(self):
        from stac_to_geocore_ray.queries.geo import _morton2, _unmorton2
        rng = np.random.default_rng(7)
        ix = rng.integers(0, 512, 4096).astype(np.int64)
        iy = rng.integers(0, 512, 4096).astype(np.int64)
        m = _morton2(ix, iy)
        rx, ry = _unmorton2(m)
        assert (rx == ix).all() and (ry == iy).all()

    def test_morton_subtree_contiguous(self):
        """All descendants of any parent form one contiguous Morton
        range — the property the one-sort decomposition relies on."""
        from stac_to_geocore_ray.queries.geo import _morton2
        ix, iy = np.meshgrid(np.arange(512), np.arange(512))
        m = np.sort(_morton2(ix.ravel().astype(np.int64),
                             iy.ravel().astype(np.int64)))
        assert (m == np.arange(512 * 512)).all()

    @pytest.fixture(scope="class")
    def compacted(self, ray_session):
        from stac_to_geocore_ray.queries import geo_cell_compact
        return geo_cell_compact(SF).to_pandas()

    def _expand(self, df):
        """Expand a mixed-resolution cell set back to z=9 leaves."""
        from stac_to_geocore_ray.queries.geo import COMPACT_Z
        leaves = set()
        for z, ix, iy in df[["z", "ix", "iy"]].itertuples(index=False):
            k = COMPACT_Z - int(z)
            for dx in range(1 << k):
                for dy in range(1 << k):
                    leaves.add(((int(ix) << k) + dx, (int(iy) << k) + dy))
        return leaves

    def test_reconstructs_cover_exactly(self, compacted):
        from stac_to_geocore_ray.queries.geo import COMPACT_Z
        ix, iy, _ = _cells(COMPACT_Z)
        truth = set(zip(ix.tolist(), iy.tolist()))
        assert self._expand(compacted) == truth

    def test_no_duplicate_cells(self, compacted):
        assert not compacted.duplicated(["z", "ix", "iy"]).any()

    def test_minimal_no_promotable_quad(self, compacted):
        """Minimality: no 4 sibling cells at the same z > zmin survive
        (they would have been promoted)."""
        from stac_to_geocore_ray.queries.geo import COMPACT_ZMIN
        live = compacted[compacted.z > COMPACT_ZMIN].copy()
        live["pix"], live["piy"] = live.ix // 2, live.iy // 2
        sib = live.groupby(["z", "pix", "piy"]).size()
        assert (sib < 4).all()


class TestCoveringSemijoin:
    def test_compacted_intervals_preserve_membership(self):
        """Compaction + interval merge is a pure re-encoding: random
        points test identically against the Morton intervals and the
        raw rectangle ranges."""
        from stac_to_geocore_ray.queries.geo import (
            COMPACT_Z, _compact_codes, _morton2)
        rng = np.random.default_rng(11)
        rects = []
        for _ in range(6):
            x0, y0 = rng.integers(0, 480, 2)
            rects.append((x0, x0 + rng.integers(1, 30),
                          y0, y0 + rng.integers(1, 30)))
        cells = [
            _morton2(*[g.ravel().astype(np.int64) for g in
                       np.meshgrid(np.arange(a, b + 1),
                                   np.arange(c, d + 1))])
            for a, b, c, d in rects]
        zz, mm = _compact_codes(np.unique(np.concatenate(cells)))
        lo = mm << (np.int64(2) * (COMPACT_Z - zz))
        hi = lo + (np.int64(1) << (np.int64(2) * (COMPACT_Z - zz)))
        order = np.argsort(lo)
        lo, hi = lo[order], hi[order]
        newrun = np.r_[True, lo[1:] > np.maximum.accumulate(hi[:-1])]
        lo = lo[newrun]
        hi = np.maximum.reduceat(hi, np.flatnonzero(newrun))

        px = rng.integers(0, 512, 20000).astype(np.int64)
        py = rng.integers(0, 512, 20000).astype(np.int64)
        m = _morton2(px, py)
        pos = np.searchsorted(lo, m, side="right") - 1
        got = (pos >= 0) & (m < hi[np.clip(pos, 0, None)])
        want = np.zeros(len(px), dtype=bool)
        for a, b, c, d in rects:
            want |= (px >= a) & (px <= b) & (py >= c) & (py <= d)
        assert (got == want).all()


class TestIDWInterpolate:
    """Spatial interpolation vs a scalar per-pair reference."""

    def test_matches_brute_force(self, ray_session):
        from stac_to_geocore_ray.queries import geo_idw_interpolate
        from stac_to_geocore_ray.queries.geo import IDW_EPS, IDW_K, IDW_R2
        from stac_to_geocore_ray.sources import fixtures
        got = geo_idw_interpolate(SF).to_pandas() \
            .sort_values("gid").reset_index(drop=True)

        bb = np.stack(pd.read_parquet(
            fixtures.paths(SF)["stac_items"])["bbox"].to_numpy()) \
            .astype(np.float64)
        R = 6371.0088
        rows = []
        for gid in range(IDW_K * IDW_K):
            gx = -180.0 + (gid % IDW_K + 0.5) * 22.5
            gy = -90.0 + (gid // IDW_K + 0.5) * 11.25
            sv = ss = n = 0
            for w_, s_, e_, n_ in bb:        # scalar per-pair replay
                cx, cy = (w_ + e_) / 2.0, (s_ + n_) / 2.0
                d2 = (cx - gx) * (cx - gx) + (cy - gy) * (cy - gy)
                if d2 >= IDW_R2:
                    continue
                width = e_ - w_ if e_ >= w_ else 360.0 - (w_ - e_)
                a = (R * R * np.radians(width)
                     * (np.sin(np.radians(n_)) - np.sin(np.radians(s_))))
                amk = np.floor(a * 1e3 + 0.5)
                wgt = 1.0 / (IDW_EPS + d2)
                sv += int(np.floor(wgt * amk + 0.5))
                ss += int(np.floor(wgt * 1e6 + 0.5))
                n += 1
            if n:
                est = np.floor(sv * 1000.0 / ss * 1e6 + 0.5) / 1e6
                rows.append((gid, n, est))
        ref = pd.DataFrame(rows, columns=["gid", "n_src", "idw_km2_r"])
        assert len(got) == len(ref)
        assert (got.gid.to_numpy() == ref.gid.to_numpy()).all()
        assert (got.n_src.to_numpy() == ref.n_src.to_numpy()).all()
        assert np.array_equal(got.idw_km2_r.to_numpy(),
                              ref.idw_km2_r.to_numpy())

    def test_batching_invariant(self, ray_session, tiny_blocks):
        """Integer-unit partial sums make the result exact under any
        block/batch decomposition."""
        from stac_to_geocore_ray.queries import geo_idw_interpolate
        a = geo_idw_interpolate(SF).to_pandas() \
            .sort_values("gid").reset_index(drop=True)
        b = geo_idw_interpolate(SF).to_pandas() \
            .sort_values("gid").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestRasterizeCoverage:
    """Difference-array burn-in vs a per-bbox scatter reference."""

    def test_matches_brute_force(self, ray_session):
        from stac_to_geocore_ray.queries import geo_rasterize_coverage
        from stac_to_geocore_ray.queries.geo import RAST_K
        from stac_to_geocore_ray.sources import fixtures
        got = geo_rasterize_coverage(SF).to_pandas() \
            .sort_values(["ix", "iy"]).reset_index(drop=True)

        bb = np.stack(pd.read_parquet(
            fixtures.paths(SF)["stac_items"])["bbox"].to_numpy()) \
            .astype(np.float64)
        k = RAST_K
        grid = np.zeros((k, k), dtype=np.int64)
        for w, s, e, n in bb:
            if w > e or s > n:
                continue
            ix0 = min(int(np.floor((w + 180.0) / 360.0 * k)), k - 1)
            ix1 = min(int(np.floor((e + 180.0) / 360.0 * k)), k - 1)
            iy0 = min(int(np.floor((s + 90.0) / 180.0 * k)), k - 1)
            iy1 = min(int(np.floor((n + 90.0) / 180.0 * k)), k - 1)
            grid[ix0:ix1 + 1, iy0:iy1 + 1] += 1    # direct scatter
        ii, jj = np.nonzero(grid > 0)
        ref = pd.DataFrame({"ix": ii, "iy": jj, "n_cover": grid[ii, jj]}) \
            .sort_values(["ix", "iy"]).reset_index(drop=True)
        assert len(got) == len(ref)
        for c in ("ix", "iy", "n_cover"):
            assert (got[c].to_numpy() == ref[c].to_numpy()).all(), c

    def test_batching_invariant(self, ray_session, tiny_blocks):
        from stac_to_geocore_ray.queries import geo_rasterize_coverage
        a = geo_rasterize_coverage(SF).to_pandas() \
            .sort_values(["ix", "iy"]).reset_index(drop=True)
        b = geo_rasterize_coverage(SF).to_pandas() \
            .sort_values(["ix", "iy"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_coverage_at_least_centroid_density(self, ray_session):
        """Every bbox covers the cell holding its centroid, so summed
        coverage >= number of kept bboxes."""
        from stac_to_geocore_ray.queries import geo_rasterize_coverage
        from stac_to_geocore_ray.sources import fixtures
        df = geo_rasterize_coverage(SF).to_pandas()
        bb = np.stack(pd.read_parquet(
            fixtures.paths(SF)["stac_items"])["bbox"].to_numpy())
        kept = int(((bb[:, 0] <= bb[:, 2]) & (bb[:, 1] <= bb[:, 3])).sum())
        assert int(df.n_cover.sum()) >= kept


class TestHotspotZscore:
    def test_moments_and_extremes(self, ray_session):
        from stac_to_geocore_ray.queries import geo_focal_mean, \
            geo_hotspot_zscore
        hot = geo_hotspot_zscore(SF).to_pandas()
        foc = geo_focal_mean(SF).to_pandas()
        assert len(hot) == len(foc)
        # z is a strictly increasing function of nbr_sum: the argmax
        # cell of one is the argmax of the other
        h = hot.sort_values(["ix", "iy"]).reset_index(drop=True)
        f = foc.sort_values(["ix", "iy"]).reset_index(drop=True)
        assert int(h.gi_z_r.idxmax()) == int(f.nbr_sum.idxmax())
        # global standardization: occupied-cell z-scores need not sum
        # to zero (empty cells hold the rest of the mass), but every
        # fully-isolated single-item cell must sit below the global max
        assert h.gi_z_r.max() > 0


class TestPolygonize:
    """stages/footprint.polygonize_cells vs a scalar flood fill."""

    def test_matches_bfs_on_random_masks(self):
        from collections import deque

        import numpy as np

        from stac_to_geocore_ray.stages.footprint import polygonize_cells
        rng = np.random.default_rng(17)
        for density in (0.05, 0.3, 0.7, 1.0):
            k = 32
            mask = rng.random((k, k)) < density
            val = rng.integers(1, 9, (k, k))
            ix, iy = np.nonzero(mask)
            out = polygonize_cells(ix.astype(np.int64),
                                   iy.astype(np.int64),
                                   val[ix, iy].astype(np.int64), k)
            # scalar reference
            seen = np.zeros((k, k), bool)
            rows = []
            for i, j in zip(ix, iy):
                if seen[i, j]:
                    continue
                q, cells = deque([(i, j)]), []
                seen[i, j] = True
                while q:
                    a, b = q.popleft()
                    cells.append((a, b))
                    for da, db in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        na, nb = a + da, b + db
                        if 0 <= na < k and 0 <= nb < k \
                                and mask[na, nb] and not seen[na, nb]:
                            seen[na, nb] = True
                            q.append((na, nb))
                rows.append([
                    min(a * k + b for a, b in cells), len(cells),
                    min(a for a, _ in cells), max(a for a, _ in cells),
                    min(b for _, b in cells), max(b for _, b in cells),
                    sum(int(val[a, b]) for a, b in cells)])
            rows.sort()
            assert out.tolist() == rows, density

    def test_empty_and_singletons(self):
        import numpy as np

        from stac_to_geocore_ray.stages.footprint import polygonize_cells
        assert polygonize_cells(np.array([], np.int64),
                                np.array([], np.int64),
                                np.array([], np.int64), 8).shape == (0, 7)
        out = polygonize_cells(np.array([0, 7]), np.array([0, 7]),
                               np.array([5, 6]), 8)
        assert out.tolist() == [[0, 1, 0, 0, 0, 0, 5],
                                [63, 1, 7, 7, 7, 7, 6]]


class TestMoransI:
    def test_matches_dense_brute_force(self, ray_session):
        from stac_to_geocore_ray.queries import geo_morans_i
        from stac_to_geocore_ray.queries.geo import FOCAL_Z, \
            focal_from_dataset
        from stac_to_geocore_ray.queries._common import _fx, _meta_read
        got = geo_morans_i(SF).to_pandas()
        assert len(got) == 1

        occ = focal_from_dataset(_meta_read(
            _fx(SF)["stac_items"], columns=["bbox"])).to_pandas()
        side = 1 << FOCAL_Z
        G = side * side
        W = 4 * side * (side - 1) + 4 * (side - 1) ** 2
        s1 = int(occ.n.sum())
        # full dense brute force (vectorized shifts: exact ints via
        # object dtype) — review finding: this comparison was stubbed
        grid = np.zeros((side, side), dtype=np.int64)
        grid[occ.ix.to_numpy(), occ.iy.to_numpy()] = \
            occ.n.to_numpy(dtype=np.int64)
        d = (G * grid.astype(object) - s1)
        den = int((d * d).sum())
        num = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                a = d[max(dx, 0):side + min(dx, 0),
                      max(dy, 0):side + min(dy, 0)]
                b = d[max(-dx, 0):side + min(-dx, 0),
                      max(-dy, 0):side + min(-dy, 0)]
                num += int((a * b).sum())
        i_brute = (G * num) / (W * den)
        assert got.n_cells.iloc[0] == G
        assert got.w_pairs.iloc[0] == W
        assert got.s1.iloc[0] == s1
        assert abs(got.i_r.iloc[0] - i_brute) < 1e-6

    def test_planted_grids(self):
        # analytic formulas vs brute force on tiny planted grids
        side = 6
        G = side * side
        W = 4 * side * (side - 1) + 4 * (side - 1) ** 2
        rng = np.random.default_rng(7)
        for trial in range(5):
            grid = rng.integers(0, 5, (side, side)).astype(np.int64)
            s1 = int(grid.sum())
            d = (G * grid.astype(object) - s1)
            num_b = den_b = 0
            for i in range(side):
                for j in range(side):
                    den_b += int(d[i, j]) ** 2
                    for dx in (-1, 0, 1):
                        for dy in (-1, 0, 1):
                            if dx == 0 and dy == 0:
                                continue
                            a, b = i + dx, j + dy
                            if 0 <= a < side and 0 <= b < side:
                                num_b += int(d[i, j]) * int(d[a, b])
            # analytic (the engine's occupied-cell-only formulas)
            ix, iy = np.nonzero(grid)
            n = grid[ix, iy]
            nbr = np.zeros(len(ix), dtype=np.int64)
            for t, (i, j) in enumerate(zip(ix, iy)):
                nbr[t] = grid[max(i - 1, 0):i + 2,
                              max(j - 1, 0):j + 2].sum()
            nx = (np.minimum(ix + 1, side - 1)
                  - np.maximum(ix - 1, 0) + 1)
            ny = (np.minimum(iy + 1, side - 1)
                  - np.maximum(iy - 1, 0) + 1)
            deg = nx * ny - 1
            A = int((n * (nbr - n)).sum())
            B = 2 * int((deg * n).sum())
            num_a = G * G * A - G * s1 * B + s1 * s1 * W
            den_a = int(sum(int(G * v - s1) ** 2 for v in n)) \
                + (G - len(n)) * s1 * s1
            assert num_a == num_b, trial
            assert den_a == den_b, trial
        # perfect checkerboard is maximally dispersed: I < 0
        cb = np.indices((side, side)).sum(axis=0) % 2
        s1 = int(cb.sum())
        d = (G * cb.astype(object) - s1)
        num = den = 0
        for i in range(side):
            for j in range(side):
                den += int(d[i, j]) ** 2
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        if dx == 0 and dy == 0:
                            continue
                        a, b = i + dx, j + dy
                        if 0 <= a < side and 0 <= b < side:
                            num += int(d[i, j]) * int(d[a, b])
        assert (G * num) / (W * den) < 0


class TestMosaicPick:
    def test_matches_pandas_reference(self, ray_session):
        from stac_to_geocore_ray.queries import geo_mosaic_pick
        from stac_to_geocore_ray.queries.geo import FOCAL_Z
        from stac_to_geocore_ray.queries._common import _fx
        got = geo_mosaic_pick(SF).to_pandas() \
            .sort_values(["ix", "iy"]).reset_index(drop=True)

        import glob
        items = pd.concat([pd.read_parquet(f, columns=[
            "item_id", "bbox", "datetime"])
            for f in glob.glob(f"{_fx(SF)['stac_items']}/*.parquet")])
        bb = np.stack(items.bbox.to_numpy())
        keep = bb[:, 0] <= bb[:, 2]
        items = items[keep]
        bb = bb[keep]
        side = 1 << FOCAL_Z
        ix = np.minimum(np.floor(((bb[:, 0] + bb[:, 2]) / 2 + 180.0)
                                 / 360.0 * side), side - 1).astype(int)
        iy = np.minimum(np.floor(((bb[:, 1] + bb[:, 3]) / 2 + 90.0)
                                 / 180.0 * side), side - 1).astype(int)
        df = pd.DataFrame({"ix": ix, "iy": iy,
                           "enc": items.datetime.to_numpy()
                           + "|" + items.item_id.to_numpy()})
        g = df.groupby(["ix", "iy"]).agg(
            best=("enc", "max"), n_items=("enc", "size")).reset_index()
        ref = pd.DataFrame({
            "ix": g.ix, "iy": g.iy,
            "item_datetime": g.best.str.split("|", n=1).str[0],
            "item_id": g.best.str.split("|", n=1).str[1],
            "n_items": g.n_items.astype("int64")}) \
            .sort_values(["ix", "iy"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"ix": int, "iy": int}),
            ref.astype({"ix": int, "iy": int}))
        # the winner is genuinely the latest: no cell's winner predates
        # another item in the same cell
        m = df.merge(got, on=["ix", "iy"])
        assert (m.enc.str.split("|", n=1).str[0]
                <= m.item_datetime).all()
