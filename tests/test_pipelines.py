"""End-to-end pipeline tests over the sf0.001 fixtures (Ray session)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def meta_df(ray_session, sf_small):
    from stac_to_geocore_ray.pipelines.flagship import metadata_pipeline
    return metadata_pipeline("/root/testdata/sf0.001", concurrency=2).to_pandas()


class TestMetadataPipeline:
    def test_row_preservation(self, meta_df):
        assert len(meta_df) == 1000
        assert meta_df.image_id.is_unique

    def test_pip_left_outer(self, meta_df):
        # antimeridian rows sit outside the catalog: i % 911 == 905
        # (near-line) and 907 (crossing; its unsplit centroid is
        # mid-pacific — fixtures v2)
        misses = meta_df[meta_df.pip_collection.isna()]
        assert sorted(misses.image_id) == ["img-000000905", "img-000000907"]

    def test_pip_respects_priority_overlap(self, meta_df):
        # 'cdem' region spans everything, but earlier catalog entries win:
        # no row whose centroid is in landsat's region maps to cdem
        hit = meta_df[meta_df.pip_collection.notna()]
        assert (hit.pip_collection != "cdem").any()

    def test_knn_exactness_sample(self, meta_df):
        import pyarrow.parquet as pq
        from stac_to_geocore_ray.sources import fixtures
        coll = pq.read_table(fixtures.paths("/root/testdata/sf0.001")["collections"])
        bbs = np.asarray(coll["bbox"].to_pylist())
        kx = (bbs[:, 0] + bbs[:, 2]) / 2
        ky = (bbs[:, 1] + bbs[:, 3]) / 2
        ids = coll["collection_id"].to_pylist()
        sample = meta_df.sample(100, random_state=0)
        d2 = ((sample.cx.to_numpy()[:, None] - kx[None, :]) ** 2
              + (sample.cy.to_numpy()[:, None] - ky[None, :]) ** 2)
        expect = [ids[i] for i in np.argmin(d2, axis=1)]
        assert expect == sample.knn_id.tolist()

    def test_cells_consistent_with_centroid(self, meta_df):
        from stac_to_geocore_ray.geo import hexgrid
        sample = meta_df.head(50)
        cells = hexgrid.latlng_to_cell(sample.cy.to_numpy(),
                                       sample.cx.to_numpy(), 7)
        assert (cells == sample.hex_cell.to_numpy()).all()


class TestTilePipeline:
    def test_aligned_equals_shuffle_join(self, ray_session, sf_small):
        from ray.data.aggregate import Count
        from stac_to_geocore_ray.pipelines.flagship import tile_pipeline
        counts = {}
        for mode in ("aligned", "shuffle"):
            t = tile_pipeline("/root/testdata/sf0.001", with_phash=False,
                              join=mode, concurrency=2)
            df = t.groupby("image_id").aggregate(
                Count(alias_name="n")).to_pandas()
            counts[mode] = df.sort_values("image_id").reset_index(drop=True)
        assert counts["aligned"].equals(counts["shuffle"])

    def test_rollup_conserves_tiles(self, ray_session, sf_small):
        from stac_to_geocore_ray.pipelines.flagship import (tile_pipeline,
                                                            tile_rollup)
        tiles = tile_pipeline("/root/testdata/sf0.001", with_phash=False,
                              concurrency=2)
        n_tiles = tiles.count()
        roll = tile_rollup(tiles).to_pandas()
        assert roll.n_tiles.sum() == n_tiles
        assert (roll.avg_intensity.between(0, 255)).all()


class TestRectIntersectJoin:
    def test_matches_duckdb_overlap_join(self, ray_session, sf_small):
        import duckdb
        from stac_to_geocore_ray.queries import geo_rect_join
        from stac_to_geocore_ray.sources import fixtures
        got = geo_rect_join("/root/testdata/sf0.001").to_pandas() \
            .sort_values(["image_id", "cat_id"]).reset_index(drop=True)
        glob = fixtures.duckdb_glob(sf_small["stac_items"])
        ref = duckdb.sql(f"""
            WITH it AS (
              SELECT image_id, bbox FROM read_parquet('{glob}')),
            cat AS (
              SELECT image_id AS cat_id, bbox FROM it
              WHERE CAST(substr(image_id, 5) AS BIGINT) % 2 = 0
                AND bbox[1] < bbox[3] AND bbox[2] < bbox[4])
            SELECT i.image_id, c.cat_id
            FROM it i JOIN cat c
              ON i.bbox[1] <= c.bbox[3] AND i.bbox[3] >= c.bbox[1]
             AND i.bbox[2] <= c.bbox[4] AND i.bbox[4] >= c.bbox[2]
        """).df() \
            .sort_values(["image_id", "cat_id"]).reset_index(drop=True)
        assert len(got) == len(ref) > 0
        assert got.image_id.tolist() == ref.image_id.tolist()
        assert got.cat_id.tolist() == ref.cat_id.tolist()
        # every item overlaps itself when it is in the catalog, so the
        # join is genuinely multi-match (> catalog size pairs)
        assert (got.image_id == got.cat_id).sum() > 0


class TestEntryContract:
    def test_entry_and_registry(self, ray_session, sf_small):
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as e
        ds = e.entry()
        assert ds.count() == 1000
        qs = e.queries()
        sql = e.oracle_sql()
        assert set(sql) <= set(qs)
        assert len(qs) >= 25

    def test_no_ray_init_in_entry_module(self):
        # the driver owns the session: entry module must never CALL
        # ray.init / ray.shutdown (docstrings may mention them)
        import ast
        import inspect
        import __ray_entry__ as e
        tree = ast.parse(inspect.getsource(e))
        calls = [n for n in ast.walk(tree) if isinstance(n, ast.Call)
                 and isinstance(n.func, ast.Attribute)
                 and n.func.attr in ("init", "shutdown")
                 and isinstance(n.func.value, ast.Name)
                 and n.func.value.id == "ray"]
        assert not calls


class TestDeterminism:
    def test_two_runs_identical(self, ray_session, sf_small):
        """SURVEY §5.2 #6: same input -> identical results across runs."""
        from stac_to_geocore_ray.pipelines.flagship import (tile_pipeline,
                                                            tile_rollup)
        outs = []
        for _ in range(2):
            t = tile_pipeline("/root/testdata/sf0.001", with_phash=False,
                              concurrency=2)
            df = tile_rollup(t).to_pandas()
            outs.append(df.sort_values("hex_prefix").reset_index(drop=True))
        assert outs[0].equals(outs[1])

    def test_metadata_deterministic(self, ray_session, sf_small):
        from stac_to_geocore_ray.pipelines.flagship import metadata_pipeline
        a = metadata_pipeline("/root/testdata/sf0.001").to_pandas() \
            .sort_values("image_id").reset_index(drop=True)
        b = metadata_pipeline("/root/testdata/sf0.001").to_pandas() \
            .sort_values("image_id").reset_index(drop=True)
        assert a.equals(b)


class TestSkewSalting:
    def test_dominant_prefix_splits_across_salts(self):
        """Images sharing one dense cell spread across the 8 salts, and
        the per-image salt is stable (deterministic unsalting)."""
        import pandas as pd
        import numpy as np
        ids = np.array([f"img-{i:09d}" for i in range(200)], dtype=object)
        salts = pd.util.hash_array(ids) % 8
        assert len(np.unique(salts)) == 8      # dense cell -> all reducers
        again = pd.util.hash_array(ids) % 8
        assert (salts == again).all()          # stable across runs

    def test_rollup_salting_preserves_totals(self, ray_session, sf_small):
        from ray.data.aggregate import Count
        from stac_to_geocore_ray.pipelines import flagship
        tiles = flagship.tile_pipeline("/root/testdata/sf0.001",
                                       with_phash=False, concurrency=2)
        direct = tiles.groupby("hex_prefix").aggregate(
            Count(alias_name="n_tiles")).to_pandas() \
            .sort_values("hex_prefix").reset_index(drop=True)
        salted = flagship.tile_rollup(
            flagship.tile_pipeline("/root/testdata/sf0.001", with_phash=False,
                                   concurrency=2), mode="salted").to_pandas() \
            .sort_values("hex_prefix").reset_index(drop=True)
        assert direct.n_tiles.tolist() == salted.n_tiles.tolist()

    def test_tree_fold_matches_salted(self, ray_session, sf_small):
        """Default tree-fold rollup == salted sort-shuffle rollup, incl.
        with an intermediate fold level."""
        from stac_to_geocore_ray.pipelines import flagship

        def run(**kw):
            t = flagship.tile_pipeline("/root/testdata/sf0.001",
                                       with_phash=False, concurrency=2)
            return flagship.tile_rollup(t, **kw).to_pandas() \
                .sort_values("hex_prefix").reset_index(drop=True)
        salted = run(mode="salted")
        tree = run(mode="tree")
        tree2 = run(mode="tree", intermediate_partitions=3)
        assert salted.n_tiles.tolist() == tree.n_tiles.tolist()
        assert salted.n_tiles.tolist() == tree2.n_tiles.tolist()
        import numpy as np
        assert np.allclose(salted.avg_intensity, tree.avg_intensity)
        assert np.allclose(salted.avg_intensity, tree2.avg_intensity)


class TestSaltedHolisticTopK:
    def _oracle(self, df, k=3):
        import pandas as pd
        counts = df.groupby(["hex_prefix", "tile_phash"]) \
            .size().reset_index(name="n")
        rows = []
        for prefix, g in counts.groupby("hex_prefix"):
            g = g.sort_values(["n", "tile_phash"],
                              ascending=[False, True]).head(k)
            for rank, (_, r) in enumerate(g.iterrows(), 1):
                rows.append((prefix, r.tile_phash, r.n, rank))
        return pd.DataFrame(rows, columns=["hex_prefix", "tile_phash",
                                           "n", "rank"])

    def _synthetic(self, n_dense=5000, n_sparse=500, seed=7):
        """One dense cell = 90% of the stream, one hot pHash = 60% of
        the dense cell (density-from-repetition, the urban-cell shape),
        forced tiny blocks so groups straddle block boundaries."""
        import numpy as np
        import pandas as pd
        rng = np.random.default_rng(seed)
        dense_cell = 4_000_000
        cells = np.concatenate([
            np.full(n_dense, dense_cell, dtype=np.int64),
            rng.integers(0, 40, n_sparse).astype(np.int64)])
        hot = np.int64(-42)          # negative: pins the & salt path
        ph = np.where(rng.random(n_dense) < 0.6, hot,
                      rng.integers(-1000, 1000, n_dense)).astype(np.int64)
        phs = np.concatenate([ph, rng.integers(-50, 50,
                                               n_sparse).astype(np.int64)])
        return pd.DataFrame({"hex_prefix": cells, "tile_phash": phs})

    def test_matches_pandas_oracle_under_skew(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd
        from stac_to_geocore_ray.pipelines.flagship import \
            tile_topk_phash_rollup
        df = self._synthetic()
        ds = rd.from_pandas(df).repartition(16)
        got = tile_topk_phash_rollup(ds, k=3, salt_factor=8).to_pandas() \
            .sort_values(["hex_prefix", "rank"]).reset_index(drop=True)
        want = self._oracle(df).sort_values(["hex_prefix", "rank"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype(np.int64), want.astype(np.int64))
        # the hot pHash wins rank 1 in the dense cell
        top = got[(got.hex_prefix == 4_000_000) & (got["rank"] == 1)]
        assert top.tile_phash.tolist() == [-42]

    def test_salt_splits_dense_cell(self):
        """The value-derived salt spreads a dense cell's DISTINCT
        hashes across shards while keeping every copy of one hash in
        exactly one shard (phase-1 counts are final)."""
        import numpy as np
        df = self._synthetic()
        dense = df[df.hex_prefix == 4_000_000]
        salts = dense.tile_phash.to_numpy() & 7
        assert (salts >= 0).all()               # negative hashes too
        assert len(np.unique(salts)) == 8       # all reducers engaged
        for ph, g in dense.groupby("tile_phash"):
            assert len(np.unique(g.tile_phash.to_numpy() & 7)) == 1

    def test_salt_factor_must_be_power_of_two(self, ray_session):
        import pytest
        import ray.data as rd
        from stac_to_geocore_ray.pipelines.flagship import \
            tile_topk_phash_rollup
        ds = rd.from_items([{"hex_prefix": 1, "tile_phash": 2}])
        with pytest.raises(ValueError, match="power of two"):
            tile_topk_phash_rollup(ds, salt_factor=6)


class TestSkewReport:
    def test_detects_planted_hot_key(self, ray_session):
        import ray.data as rd
        from stac_to_geocore_ray.tuning import key_skew_report
        rows = [{"k": "hot"} for _ in range(600)] + \
               [{"k": f"c{i}"} for i in range(400)]
        rep = key_skew_report(rd.from_items(rows, override_num_blocks=4), "k")
        assert rep["n_rows"] == 1000 and rep["n_keys"] == 401
        assert rep["top"][0][0] == "hot"
        assert abs(rep["top"][0][1] - 0.6) < 1e-9
        assert rep["recommended_salt"] == 3     # ceil(0.6 / 0.2)

    def test_uniform_keys_need_no_salt(self, ray_session):
        import ray.data as rd
        from stac_to_geocore_ray.tuning import key_skew_report
        rows = [{"k": f"c{i % 50}"} for i in range(1000)]
        rep = key_skew_report(rd.from_items(rows, override_num_blocks=4), "k")
        assert rep["recommended_salt"] == 1


class TestZonalStats:
    def test_matches_duckdb_zonal_join(self, ray_session, sf_small):
        import duckdb
        from stac_to_geocore_ray.queries import geo_zonal_stats
        from stac_to_geocore_ray.sources import fixtures
        got = geo_zonal_stats("/root/testdata/sf0.001").to_pandas() \
            .sort_values("zone").reset_index(drop=True)
        items = fixtures.duckdb_glob(sf_small["stac_items"])
        coll = sf_small["collections"]
        ref = duckdb.sql(f"""
            WITH pts AS (
              SELECT (bbox[1]+bbox[3])/2 AS cx, (bbox[2]+bbox[4])/2 AS cy,
                     CAST(round(6371.0088 * 6371.0088
                          * radians(CASE WHEN bbox[3] >= bbox[1]
                                         THEN bbox[3] - bbox[1]
                                         ELSE 360.0 - (bbox[1] - bbox[3]) END)
                          * (sin(radians(bbox[4])) - sin(radians(bbox[2]))),
                          3) * 1000 AS BIGINT) AS amk
              FROM read_parquet('{items}'))
            SELECT c.collection_id AS zone,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(p.amk) AS BIGINT) AS area_mkm2
            FROM pts p JOIN read_parquet('{coll}') c
              ON p.cx >= c.bbox[1] AND p.cx <= c.bbox[3]
             AND p.cy >= c.bbox[2] AND p.cy <= c.bbox[4]
            GROUP BY 1 ORDER BY 1
        """).df().reset_index(drop=True)
        assert len(got) == len(ref) > 0
        assert got.zone.tolist() == ref.zone.tolist()
        assert got.n_items.tolist() == ref.n_items.tolist()
        assert got.area_mkm2.tolist() == ref.area_mkm2.tolist()
        # mean is derived from the two exact integer columns
        import numpy as np
        q = got.area_mkm2.to_numpy() / (1e3 * got.n_items.to_numpy())
        assert np.array_equal(got.mean_km2.to_numpy(),
                              np.floor(q * 1e6 + 0.5) / 1e6)


class TestCaptionSpatialSearch:
    def test_matches_duckdb_cross_modal_join(self, ray_session, sf_small):
        import duckdb
        from stac_to_geocore_ray.queries import caption_spatial_search
        from stac_to_geocore_ray.queries.media import _CAP_KEY, _CAP_WIN
        from stac_to_geocore_ray.sources import fixtures
        out = caption_spatial_search("/root/testdata/sf0.001")
        got = (out.to_pandas() if hasattr(out, "to_pandas") else out) \
            .sort_values("image_id").reset_index(drop=True)
        items = fixtures.duckdb_glob(sf_small["stac_items"])
        images = fixtures.duckdb_glob(sf_small["images"])
        w, s, e, n = _CAP_WIN
        ref = duckdb.sql(f"""
            WITH pts AS (
              SELECT image_id, (bbox[1]+bbox[3])/2 cx, (bbox[2]+bbox[4])/2 cy
              FROM read_parquet('{items}')),
            hit AS (
              SELECT image_id, caption FROM read_parquet('{images}')
              WHERE caption LIKE '%{_CAP_KEY}%')
            SELECT h.image_id, h.caption, p.cx, p.cy
            FROM hit h JOIN pts p USING (image_id)
            WHERE p.cx >= {w} AND p.cx <= {e}
              AND p.cy >= {s} AND p.cy <= {n}
            ORDER BY 1
        """).df().reset_index(drop=True)
        assert len(got) == len(ref) > 0
        assert got.image_id.tolist() == ref.image_id.tolist()
        assert got.caption.tolist() == ref.caption.tolist()
        assert got.cx.tolist() == ref.cx.tolist()   # identical arithmetic
        assert got.cy.tolist() == ref.cy.tolist()

    def test_empty_window_returns_typed_table(self, ray_session, sf_small,
                                              monkeypatch):
        import pyarrow as pa
        from stac_to_geocore_ray.queries import media
        # a window in the Pacific: caption hits exist, spatial hits don't
        monkeypatch.setattr(media, "_CAP_WIN", (-170.0, 10.0, -160.0, 20.0))
        out = media.caption_spatial_search("/root/testdata/sf0.001")
        assert isinstance(out, pa.Table)
        assert out.num_rows == 0
        assert out.column_names == ["image_id", "caption", "cx", "cy"]
        assert out.schema.field("cx").type == pa.float64()
