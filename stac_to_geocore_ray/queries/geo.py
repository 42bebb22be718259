"""Geospatial + GeoCore leg: footprints, cells, PIP/kNN joins, STAC->GeoCore translation, harvest.

Split out of the round-4 single-module queries.py (judge r4 item #7);
pure relocation, no logic change.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources import fixtures
from ..stages.util import clean_read_parquet, table_from_pandas
from ._common import ORACLE_SF_DIR, _auto, _fx, _fx_glob, _meta_read

# ------------------------------------------------------------ geospatial
#
# Fixture tables (deterministic per sf; sources/fixtures.py) are
# referenced by absolute parquet path in the oracle SQL.  The engine
# side always calls fixtures.paths() first, which generates-or-reuses
# the cached fixtures, so the SQL target exists by the time the driver
# compares.

def geo_footprint_wkt(sf_dir: str):
    """Per-item reference-form WKT (round-2 quirk #1) — string parity."""
    import ray.data as rd
    from ..stages.footprint import encode_footprint
    p = _fx(sf_dir)
    ds = clean_read_parquet(p["stac_items"], columns=["item_id", "bbox"])
    ds = ds.map_batches(lambda b: encode_footprint(b, with_wkt=True),
                        batch_format="pyarrow")
    return ds.select_columns(["item_id", "geometry_wkt"])


def geo_bbox_area(sf_dir: str):
    """Spherical bbox area in km^2 per item (equal-area weighting — the
    correction a naive deg^2 rollup gets wrong by 1/cos(lat) at high
    latitudes, which matters when sampling polar-heavy catalogs).

    area = R^2 * width_rad * (sin(n) - sin(s)); antimeridian-crossing
    boxes (w > e) take the wrapped width.  Fully vectorized numpy in a
    pruned 2-column read; SQL oracle computes the identical closed
    form with DuckDB trig.
    """
    import ray.data as rd
    p = _fx(sf_dir)
    ds = clean_read_parquet(p["stac_items"], columns=["item_id", "bbox"])
    R = 6371.0088

    def area(batch: pa.Table) -> pa.Table:
        bb = batch["bbox"]
        if isinstance(bb, pa.ChunkedArray):
            bb = bb.combine_chunks()
        m = bb.flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)
        w, s, e, n = m[:, 0], m[:, 1], m[:, 2], m[:, 3]
        width = np.where(e >= w, e - w, 360.0 - (w - e))
        a = (R * R * np.radians(width)
             * (np.sin(np.radians(n)) - np.sin(np.radians(s))))
        # half-AWAY to match DuckDB round() (the jaccard lesson —
        # exact halves are astronomically unlikely for trig products,
        # but matching modes costs nothing); areas are non-negative
        a_r = np.floor(a * 1e3 + 0.5) / 1e3
        return pa.table({"item_id": batch["item_id"],
                         "area_km2_r": pa.array(a_r)})
    return ds.map_batches(area, batch_format="pyarrow")


def _geo_bbox_area_sql() -> str:
    return f"""
SELECT item_id,
       round(6371.0088 * 6371.0088
             * radians(CASE WHEN bbox[3] >= bbox[1] THEN bbox[3] - bbox[1]
                            ELSE 360.0 - (bbox[1] - bbox[3]) END)
             * (sin(radians(bbox[4])) - sin(radians(bbox[2]))), 3)
           AS area_km2_r
FROM read_parquet('{_fx_glob("stac_items")}')
"""


def _wkt_sql_expr(prefix: str = "") -> str:
    c = lambda i: (f"CAST(round(CAST({prefix}bbox[{i}] AS DOUBLE), 2) AS VARCHAR)")
    w, s, e, n = c(1), c(2), c(3), c(4)
    return (f"'POLYGON((' || {w} || ' ' || {s} || ', ' || {e} || ' ' || {s} || "
            f"', ' || {e} || ' ' || {n} || ', ' || {w} || ' ' || {n} || ', ' || "
            f"{w} || ' ' || {s} || '))'")


def _geo_footprint_wkt_sql() -> str:
    return f"""
SELECT item_id, {_wkt_sql_expr()} AS geometry_wkt
FROM read_parquet('{_fx_glob("stac_items")}')
"""


def geo_pip_join(sf_dir: str):
    """Left-outer PIP broadcast join: (image_id, pip_collection)."""
    import ray
    import ray.data as rd
    from ..pipelines.flagship import _load_catalog
    from ..stages.footprint import encode_footprint
    from ..stages.pip_join import PIPJoiner
    p = _fx(sf_dir)
    _, cat, _ = _load_catalog(p["collections"])
    cat_ref = ray.put(cat)
    ds = clean_read_parquet(p["stac_items"], columns=["image_id", "bbox"])
    ds = ds.map_batches(lambda b: encode_footprint(b, with_wkt=False),
                        batch_format="pyarrow")
    ds = ds.map_batches(PIPJoiner, fn_constructor_args=(cat_ref,),
                        batch_format="pyarrow", concurrency=_auto())
    return ds.select_columns(["image_id", "pip_collection"])


def _geo_pip_join_sql() -> str:
    return f"""
WITH pts AS (
  SELECT image_id,
         (bbox[1] + bbox[3]) / 2 AS cx, (bbox[2] + bbox[4]) / 2 AS cy
  FROM read_parquet('{_fx_glob("stac_items")}'))
SELECT p.image_id,
       (SELECT c.collection_id
        FROM read_parquet('{_fx_glob("collections")}') c
        WHERE p.cx >= c.bbox[1] AND p.cx <= c.bbox[3]
          AND p.cy >= c.bbox[2] AND p.cy <= c.bbox[4]
        ORDER BY c.coll_index LIMIT 1) AS pip_collection
FROM pts p
"""


def geo_knn(sf_dir: str):
    """Hex-ring kNN nearest catalog centroid: (image_id, knn_id)."""
    import ray
    import ray.data as rd
    from ..pipelines.flagship import _load_catalog
    from ..stages.footprint import encode_footprint
    from ..stages.knn import HexKNN
    p = _fx(sf_dir)
    _, _, knn_cat = _load_catalog(p["collections"])
    knn_ref = ray.put(knn_cat)
    ds = clean_read_parquet(p["stac_items"], columns=["image_id", "bbox"])
    ds = ds.map_batches(lambda b: encode_footprint(b, with_wkt=False),
                        batch_format="pyarrow")
    ds = ds.map_batches(HexKNN, fn_constructor_args=(knn_ref,),
                        batch_format="pyarrow", concurrency=_auto())
    return ds.select_columns(["image_id", "knn_id"])


def _geo_knn_sql() -> str:
    return f"""
WITH pts AS (
  SELECT image_id,
         (bbox[1] + bbox[3]) / 2 AS cx, (bbox[2] + bbox[4]) / 2 AS cy
  FROM read_parquet('{_fx_glob("stac_items")}')),
cat AS (
  SELECT collection_id, coll_index,
         (bbox[1] + bbox[3]) / 2 AS kx, (bbox[2] + bbox[4]) / 2 AS ky
  FROM read_parquet('{_fx_glob("collections")}')),
ranked AS (
  SELECT p.image_id, c.collection_id,
         row_number() OVER (
           PARTITION BY p.image_id
           ORDER BY (p.cx - c.kx) * (p.cx - c.kx)
                  + (p.cy - c.ky) * (p.cy - c.ky) ASC,
                  c.coll_index ASC) AS rn
  FROM pts p CROSS JOIN cat c)
SELECT image_id, collection_id AS knn_id FROM ranked WHERE rn = 1
"""


def geo_knn_haversine(sf_dir: str):
    """Geodesic kNN (VERDICT #9): nearest catalog centroid by
    great-circle distance, with the distance emitted in km."""
    import ray
    import ray.data as rd
    from ..pipelines.flagship import _load_catalog
    from ..stages.footprint import encode_footprint
    from ..stages.knn import HexKNN
    p = _fx(sf_dir)
    _, _, knn_cat = _load_catalog(p["collections"])
    knn_ref = ray.put(knn_cat)
    ds = clean_read_parquet(p["stac_items"], columns=["image_id", "bbox"])
    ds = ds.map_batches(lambda b: encode_footprint(b, with_wkt=False),
                        batch_format="pyarrow")
    ds = ds.map_batches(HexKNN, fn_constructor_args=(knn_ref,),
                        fn_constructor_kwargs={"metric": "haversine"},
                        batch_format="pyarrow", concurrency=_auto())

    def flat(batch: pa.Table) -> pa.Table:
        return pa.table({
            "image_id": batch["image_id"],
            "knn_id": batch["knn_id"],
            "knn_km_r": pc.round(batch["knn_dist"], 4)})
    return ds.map_batches(flat, batch_format="pyarrow")


def _geo_knn_haversine_sql() -> str:
    hav = ("2 * 6371.0 * asin(sqrt("
           "pow(sin((radians(c.ky) - radians(p.cy)) / 2), 2)"
           " + cos(radians(p.cy)) * cos(radians(c.ky))"
           " * pow(sin((radians(c.kx) - radians(p.cx)) / 2), 2)))")
    return f"""
WITH pts AS (
  SELECT image_id,
         (bbox[1] + bbox[3]) / 2 AS cx, (bbox[2] + bbox[4]) / 2 AS cy
  FROM read_parquet('{_fx_glob("stac_items")}')),
cat AS (
  SELECT collection_id, coll_index,
         (bbox[1] + bbox[3]) / 2 AS kx, (bbox[2] + bbox[4]) / 2 AS ky
  FROM read_parquet('{_fx_glob("collections")}')),
ranked AS (
  SELECT p.image_id, c.collection_id, {hav} AS km,
         row_number() OVER (
           PARTITION BY p.image_id
           ORDER BY {hav} ASC, c.coll_index ASC) AS rn
  FROM pts p CROSS JOIN cat c)
SELECT image_id, collection_id AS knn_id, round(km, 4) AS knn_km_r
FROM ranked WHERE rn = 1
"""


def geo_cell_rollup(sf_dir: str):
    """items per hex prefix cell (no SQL equivalent: rows-only check).

    Per-batch partial counts before the shuffle: the all-to-all moves
    one row per (batch, cell), not per item."""
    from ray.data.aggregate import Sum
    from ..pipelines.flagship import metadata_pipeline
    ds = metadata_pipeline(sf_dir, concurrency=_auto())

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        g = batch.select(["hex_prefix"]).to_pandas() \
            .groupby("hex_prefix", sort=False).size().reset_index(name="n")
        return table_from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("hex_prefix").aggregate(Sum("n", alias_name="n_items"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"hex_prefix": batch["hex_prefix"],
                         "n_items": pc.cast(batch["n_items"], pa.int64())})
    return agg.map_batches(finish, batch_format="pyarrow")


def geo_cells(sf_dir: str):
    """Per-item cell assignments (rows-only; covered by geo pytest)."""
    import ray.data as rd
    from ..stages.footprint import encode_footprint
    p = _fx(sf_dir)
    ds = clean_read_parquet(p["stac_items"], columns=["image_id", "bbox"])
    ds = ds.map_batches(lambda b: encode_footprint(b, with_wkt=False),
                        batch_format="pyarrow")
    return ds.select_columns(["image_id", "s2_cell", "hex_cell", "hex_prefix"])


def geo_footprint_split(sf_dir: str):
    """Antimeridian-splitting footprint encode (engine-defined behavior
    for w > e boxes, SURVEY.md §7.4): crossing footprints explode into
    their two hemisphere parts.  Exercises the planted crossing rows
    (fixtures i % 911 == 907) end-to-end; the SQL oracle reproduces the
    split with a UNION ALL."""
    import ray.data as rd
    from ..stages.footprint import encode_footprint
    p = _fx(sf_dir)
    ds = clean_read_parquet(p["stac_items"], columns=["image_id", "bbox"])
    ds = ds.map_batches(
        lambda b: encode_footprint(b, with_wkt=False, antimeridian="split"),
        batch_format="pyarrow")

    def flat(batch: pa.Table) -> pa.Table:
        return pa.table({
            "image_id": batch["image_id"],
            "am_part": pc.cast(batch["am_part"], pa.int64()),
            "pw": batch["pw"], "ps": batch["ps"],
            "pe": batch["pe"], "pn": batch["pn"],
            "cx": batch["cx"], "cy": batch["cy"]})
    return ds.map_batches(flat, batch_format="pyarrow")


def _geo_footprint_split_sql() -> str:
    return f"""
WITH i AS (SELECT image_id, bbox[1] AS w, bbox[2] AS s,
                  bbox[3] AS e, bbox[4] AS n
           FROM read_parquet('{_fx_glob("stac_items")}'))
SELECT image_id, CAST(0 AS BIGINT) AS am_part,
       w AS pw, s AS ps,
       CASE WHEN w > e THEN 180.0 ELSE e END AS pe, n AS pn,
       (w + CASE WHEN w > e THEN 180.0 ELSE e END) / 2 AS cx,
       (s + n) / 2 AS cy
FROM i
UNION ALL
SELECT image_id, CAST(1 AS BIGINT), -180.0, s, e, n,
       (-180.0 + e) / 2, (s + n) / 2
FROM i WHERE w > e
"""


def geocore_items(sf_dir: str):
    """Flat GeoCore item records (the reference's M7 path, columnar)."""
    from ..pipelines.geocore_harvest import items_dataset
    ds = items_dataset(sf_dir, concurrency=_auto())
    return ds.select_columns([
        "item_id", "id", "parent_identifier", "title_en", "title_fr",
        "temporal_begin", "temporal_end", "keywords_en", "keywords_fr",
        "description_en", "date_published", "geometry_wkt"])


def _sqlq(s: str) -> str:
    return s.replace("'", "''")


def _geocore_items_sql() -> str:
    from ..config import DEFAULT_CONFIG as cfg
    en, fr = cfg.root_name.split("/")[:2]
    return f"""
WITH coll AS (
  SELECT collection_id,
    CASE WHEN title IS NULL THEN collection_id
         ELSE split_part(title, '/', 1) END AS t_en,
    CASE WHEN title IS NULL THEN collection_id
         WHEN strpos(title, '/') > 0 THEN split_part(title, '/', 2)
         ELSE collection_id END AS t_fr,
    CASE WHEN description IS NULL THEN NULL
         ELSE split_part(description, '/', 1) END AS d_en,
    CASE WHEN keywords IS NULL THEN NULL
         ELSE array_to_string(keywords[1:CAST(len(keywords) // 2 AS INT)], ', ')
         END AS k_en,
    CASE WHEN keywords IS NULL THEN NULL
         ELSE array_to_string(
              keywords[CAST(len(keywords) // 2 AS INT) + 1:CAST(len(keywords) AS INT)],
              ', ') END AS k_fr
  FROM read_parquet('{_fx_glob("collections")}'))
SELECT i.item_id,
  '{cfg.source}-' || i.collection_id || '-' || i.item_id AS id,
  '{cfg.source}-' || i.collection_id AS parent_identifier,
  CASE
    WHEN i.collection_id = 'monthly-vegetation-parameters-20m-v1'
      THEN regexp_extract(i.item_id, '-([^-]*)$', 1) || ' - ' || c.t_en
    WHEN i.collection_id IN ('hrdem-arcticdem', 'hrdem-lidar')
      THEN substr(i.datetime, 1, 4) || ' - ' || i.item_id || '-' || c.t_en
    ELSE substr(i.datetime, 1, 4) || ' - ' || c.t_en END AS title_en,
  CASE
    WHEN i.collection_id = 'monthly-vegetation-parameters-20m-v1'
      THEN regexp_extract(i.item_id, '-([^-]*)$', 1) || ' - ' || c.t_fr
    WHEN i.collection_id IN ('hrdem-arcticdem', 'hrdem-lidar')
      THEN substr(i.datetime, 1, 4) || ' - ' || i.item_id || '-' || c.t_fr
    ELSE substr(i.datetime, 1, 4) || ' - ' || c.t_fr END AS title_fr,
  substr(i.datetime, 1, 10) AS temporal_begin,
  'Present' AS temporal_end,
  'SpatioTemporal Asset Catalog, stac, ' || coalesce(c.k_en, '') AS keywords_en,
  'SpatioTemporal Asset Catalog, stac, ' || coalesce(c.k_fr, '') AS keywords_fr,
  coalesce(c.d_en, '') || ' ' || '{_sqlq(cfg.disclaimer_en)}' AS description_en,
  i.created AS date_published,
  {_wkt_sql_expr("i.")} AS geometry_wkt
FROM read_parquet('{_fx_glob("stac_items")}') i
LEFT JOIN coll c ON i.collection_id = c.collection_id
"""


def geocore_collections(sf_dir: str):
    """Flat GeoCore collection records (M6+M8)."""
    import pyarrow.parquet as pq
    from ..stages.geocore import translate_collections
    p = _fx(sf_dir)
    tbl = translate_collections(pq.read_table(p["collections"]))
    return tbl.select(["collection_id", "id", "parent_identifier", "title_en",
                       "title_fr", "temporal_begin", "temporal_end",
                       "keywords_en", "keywords_fr", "geometry_wkt",
                       "n_options"])


def _geocore_collections_sql() -> str:
    from ..config import DEFAULT_CONFIG as cfg
    # n_options for collections: links (6 rels incl. planted) + assets,
    # distinct over the full option struct
    return f"""
WITH c AS (SELECT * FROM read_parquet('{_fx_glob("collections")}')),
fields AS (
  SELECT collection_id,
    CASE WHEN title IS NULL THEN collection_id
         ELSE split_part(title, '/', 1) END AS t_en,
    CASE WHEN title IS NULL THEN collection_id
         WHEN strpos(title, '/') > 0 THEN split_part(title, '/', 2)
         ELSE collection_id END AS t_fr,
    title,
    CASE WHEN keywords IS NULL THEN NULL
         ELSE array_to_string(keywords[1:CAST(len(keywords) // 2 AS INT)], ', ')
         END AS k_en,
    CASE WHEN keywords IS NULL THEN NULL
         ELSE array_to_string(
              keywords[CAST(len(keywords) // 2 AS INT) + 1:CAST(len(keywords) AS INT)],
              ', ') END AS k_fr,
    time_begin, time_end, bbox
  FROM c),
lopt AS (
  SELECT c.collection_id,
         l.href AS url,
         CASE l.rel
           WHEN 'self' THEN 'Self - ' || c.collection_id
           WHEN 'root' THEN 'Root - {_sqlq(cfg.root_name.split("/")[0])}'
           WHEN 'parent' THEN 'Root - {_sqlq(cfg.root_name.split("/")[0])}'
           WHEN 'child' THEN 'Item - ' || coalesce(l.title, 'Unknown')
           WHEN 'item' THEN 'Item - ' || coalesce(l.title, 'Unknown')
           WHEN 'items' THEN 'Items Listing'
           ELSE coalesce(l.title, 'Unknown') END AS name_en,
         CASE l.rel
           WHEN 'self' THEN 'Soi - ' || c.collection_id
           WHEN 'root' THEN 'Racine - {_sqlq(cfg.root_name.split("/")[1])}'
           WHEN 'parent' THEN 'Racine - {_sqlq(cfg.root_name.split("/")[1])}'
           WHEN 'child' THEN 'Item - ' || coalesce(l.title, 'Unknown')
           WHEN 'item' THEN 'Item - ' || coalesce(l.title, 'Unknown')
           WHEN 'items' THEN 'Items Listing'
           ELSE coalesce(l.title, 'Inconnue') END AS name_fr,
         CASE l.rel
           WHEN 'self' THEN 'STAC Collection;JSON;eng'
           WHEN 'root' THEN 'STAC API;JSON;eng'
           WHEN 'parent' THEN 'STAC API;JSON;eng'
           WHEN 'child' THEN 'STAC Item / OGC API - Features;GeoJSON;eng'
           WHEN 'item' THEN 'STAC Item / OGC API - Features;GeoJSON;eng'
           WHEN 'items' THEN 'STAC Item / OGC API - Features;GeoJSON;eng'
           ELSE 'Other;Autre;eng' END AS desc_en
  FROM c, UNNEST(c.links) AS t(l)),
aopt AS (
  SELECT c.collection_id,
         a.href AS url,
         'Asset - ' || CASE WHEN strpos(coalesce(a.title, 'Unknown/Inconnu'), '/') > 0
             THEN split_part(coalesce(a.title, 'Unknown/Inconnu'), '/', 1)
             ELSE coalesce(a.title, 'Unknown/Inconnu') END AS name_en,
         'Asset - ' || CASE WHEN strpos(coalesce(a.title, 'Unknown/Inconnu'), '/') > 0
             THEN split_part(coalesce(a.title, 'Unknown/Inconnu'), '/', 2)
             ELSE coalesce(a.title, 'Unknown/Inconnu') END AS name_fr,
         (CASE array_to_string(a.roles, ', ')
            WHEN 'thumbnail' THEN 'Thumbnail' WHEN 'overview' THEN 'Overview'
            WHEN 'data' THEN 'Data' WHEN 'metadata' THEN 'Metadata'
            ELSE 'Other' END) || ';' ||
         (CASE a.type
            WHEN 'image/tiff; application=geotiff; profile=cloud-optimized' THEN 'TIFF'
            WHEN 'image/tiff; application=geotiff' THEN 'TIFF'
            WHEN 'image/png' THEN 'PNG' WHEN 'image/jpeg' THEN 'JPEG'
            WHEN 'application/json' THEN 'JSON' WHEN 'text/plain' THEN 'TXT'
            ELSE 'Other' END) || ';eng' AS desc_en
  FROM c, UNNEST(c.assets) AS t(a)
  WHERE c.assets IS NOT NULL),
allopt AS (
  SELECT collection_id, url, name_en, name_fr, desc_en FROM lopt
  UNION ALL
  SELECT collection_id, url, name_en, name_fr, desc_en FROM aopt),
counts AS (
  SELECT collection_id,
         count(DISTINCT (url, name_en, name_fr, desc_en)) AS n_options
  FROM allopt GROUP BY collection_id)
SELECT f.collection_id,
  '{cfg.source}-' || f.collection_id AS id,
  '{cfg.source}-root-{cfg.root_id}' AS parent_identifier,
  CASE WHEN f.t_en IS NULL OR f.t_fr IS NULL THEN NULL
       ELSE 'Collection - ' || f.t_en END AS title_en,
  CASE WHEN f.t_en IS NULL OR f.t_fr IS NULL THEN NULL
       ELSE 'Collection - ' || f.t_fr END AS title_fr,
  CASE WHEN f.time_begin IS NULL THEN '0001-01-01'
       ELSE substr(f.time_begin, 1, 10) END AS temporal_begin,
  CASE WHEN f.time_end IS NULL THEN 'Present'
       ELSE substr(f.time_end, 1, 10) END AS temporal_end,
  'SpatioTemporal Asset Catalog, stac, ' || coalesce(f.k_en, '') AS keywords_en,
  'SpatioTemporal Asset Catalog, stac, ' || coalesce(f.k_fr, '') AS keywords_fr,
  {_wkt_sql_expr("f.")} AS geometry_wkt,
  ct.n_options AS n_options
FROM fields f JOIN counts ct USING (collection_id)
"""


def geocore_options_count(sf_dir: str):
    """Per-item option count after keep-last dedup (F3+F4+A1 parity)."""
    from ..pipelines.geocore_harvest import items_dataset
    ds = items_dataset(sf_dir, concurrency=_auto())
    return ds.select_columns(["item_id", "n_options"])


def _geocore_options_count_sql() -> str:
    from ..config import DEFAULT_CONFIG as cfg
    en, fr = cfg.root_name.split("/")[:2]
    return f"""
WITH i AS (SELECT * FROM read_parquet('{_fx_glob("stac_items")}')),
lopt AS (
  SELECT i.item_id,
         l.href AS url,
         CASE l.rel
           WHEN 'self' THEN 'Self - ' || i.item_id
           WHEN 'root' THEN 'Root - {_sqlq(en)}'
           WHEN 'parent' THEN 'Collection - ' || i.collection_id
           ELSE coalesce(l.title, 'Unknown') END AS name_en,
         CASE l.rel
           WHEN 'self' THEN 'Soi - ' || i.item_id
           WHEN 'root' THEN 'Racine - {_sqlq(fr)}'
           WHEN 'parent' THEN 'Collection - ' || i.collection_id
           ELSE coalesce(l.title, 'Inconnue') END AS name_fr,
         CASE l.rel
           WHEN 'self' THEN 'STAC Item / OGC API - Features;GeoJSON;eng'
           WHEN 'root' THEN 'STAC API;JSON;eng'
           WHEN 'parent' THEN 'STAC Collection;JSON;eng'
           ELSE 'Other;Autre;eng' END AS desc_en
  FROM i, UNNEST(i.links) AS t(l)
  WHERE l.rel <> 'collection'),
aopt AS (
  SELECT i.item_id,
         a.href AS url,
         'Asset - ' || CASE WHEN strpos(coalesce(a.title, 'Unknown/Inconnu'), '/') > 0
             THEN split_part(coalesce(a.title, 'Unknown/Inconnu'), '/', 1)
             ELSE coalesce(a.title, 'Unknown/Inconnu') END AS name_en,
         'Asset - ' || CASE WHEN strpos(coalesce(a.title, 'Unknown/Inconnu'), '/') > 0
             THEN split_part(coalesce(a.title, 'Unknown/Inconnu'), '/', 2)
             ELSE coalesce(a.title, 'Unknown/Inconnu') END AS name_fr,
         (CASE array_to_string(a.roles, ', ')
            WHEN 'thumbnail' THEN 'Thumbnail' WHEN 'overview' THEN 'Overview'
            WHEN 'data' THEN 'Data' WHEN 'metadata' THEN 'Metadata'
            ELSE 'Other' END) || ';' ||
         (CASE a.type
            WHEN 'image/tiff; application=geotiff; profile=cloud-optimized' THEN 'TIFF'
            WHEN 'image/tiff; application=geotiff' THEN 'TIFF'
            WHEN 'image/png' THEN 'PNG' WHEN 'image/jpeg' THEN 'JPEG'
            WHEN 'application/json' THEN 'JSON' WHEN 'text/plain' THEN 'TXT'
            ELSE 'Other' END) || ';eng' AS desc_en
  FROM i, UNNEST(i.assets) AS t(a)
  WHERE i.assets IS NOT NULL),
allopt AS (
  SELECT item_id, url, name_en, name_fr, desc_en FROM lopt
  UNION ALL
  SELECT item_id, url, name_en, name_fr, desc_en FROM aopt)
SELECT item_id,
       CAST(count(DISTINCT (url, name_en, name_fr, desc_en)) AS BIGINT)
           AS n_options
FROM allopt GROUP BY item_id
"""



def geocore_assemble(sf_dir: str):
    """Full nested GeoCore FeatureCollection assembly (M2; rows-only —
    value parity of the flat fields is SQL-checked in geocore_items)."""
    import pyarrow.compute as _pc
    from ..pipelines.geocore_harvest import items_dataset
    from ..stages.assemble import RecordAssembler
    ds = items_dataset(sf_dir)
    out = ds.map_batches(RecordAssembler, batch_format="pyarrow",
                         concurrency=_auto())

    def measure(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id": batch["id"],
            "json_len": _pc.cast(_pc.utf8_length(batch["geocore_json"]),
                                 pa.int64())})
    return out.map_batches(measure, batch_format="pyarrow")


def harvest_manifests(sf_dir: str):
    """Resumable manifest-sinked harvest; returns per-partition lineage
    rows (stable partition ids + row counts).

    Golden-checked (goldens.golden_harvest_manifests derives the
    expected partition set + counts straight from the input fragments);
    checksum parity is covered by the byte-identical kill/resume tests
    (tests/test_manifest.py), not this row — content hashes replayed
    through a second harvest would only re-run the same code path."""
    import shutil
    import tempfile
    from ..pipelines.geocore_harvest import run_harvest
    from ..state.manifest import ManifestSink
    out_dir = tempfile.mkdtemp(prefix="stgr_harvest_")
    try:
        run_harvest(sf_dir, out_dir)
        rows = [{"partition_id": pid, "rows": m["rows"]}
                for pid, m in sorted(ManifestSink(out_dir).completed().items())]
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return pa.Table.from_pylist(rows)


def geo_s2_covering(sf_dir: str):
    """Per-item S2 covering of the footprint bbox at level 7 — a
    raster->vector flat-map (one row per covering cell; rows-only:
    covering is not SQL-expressible)."""
    import ray.data as rd
    from ..geo import s2 as s2mod
    p = _fx(sf_dir)
    ds = clean_read_parquet(p["stac_items"], columns=["item_id", "bbox"])

    def cover(batch: pa.Table) -> pa.Table:
        bb = batch["bbox"]
        if isinstance(bb, pa.ChunkedArray):
            bb = bb.combine_chunks()
        m = bb.flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)
        ids = batch["item_id"].to_pylist()
        out_id, out_cell = [], []
        for i, (w, s, e, n) in enumerate(m):
            cells = s2mod.bbox_covering(w, s, e, n, 7, grid=4)
            out_id.extend([ids[i]] * len(cells))
            out_cell.extend(cells.astype("int64").tolist())
        return pa.table({"item_id": pa.array(out_id, pa.string()),
                         "s2_cell": pa.array(out_cell, pa.int64())})
    return ds.map_batches(cover, batch_format="pyarrow")



def geo_pip_multi(sf_dir: str):
    """Multi-match PIP join (inner): EVERY catalog polygon containing
    each centroid — the one-to-many variant of geo_pip_join (which is
    first-match left-outer)."""
    import ray
    import ray.data as rd
    from ..pipelines.flagship import _load_catalog
    from ..stages.footprint import encode_footprint
    from ..stages.pip_join import MultiPIPJoiner
    p = _fx(sf_dir)
    _, cat, _ = _load_catalog(p["collections"])
    cat_ref = ray.put(cat)
    ds = clean_read_parquet(p["stac_items"], columns=["image_id", "bbox"])
    ds = ds.map_batches(lambda b: encode_footprint(b, with_wkt=False),
                        batch_format="pyarrow")
    return ds.map_batches(MultiPIPJoiner, fn_constructor_args=(cat_ref,),
                          batch_format="pyarrow", concurrency=_auto())


def _geo_pip_multi_sql() -> str:
    return f"""
WITH pts AS (
  SELECT image_id,
         (bbox[1] + bbox[3]) / 2 AS cx, (bbox[2] + bbox[4]) / 2 AS cy
  FROM read_parquet('{_fx_glob("stac_items")}'))
SELECT p.image_id, c.collection_id AS pip_collection
FROM pts p JOIN read_parquet('{_fx_glob("collections")}') c
  ON p.cx >= c.bbox[1] AND p.cx <= c.bbox[3]
 AND p.cy >= c.bbox[2] AND p.cy <= c.bbox[4]
"""



def geo_pip_multi_tree(sf_dir: str):
    """Multi-match PIP through the STRtree TREE path: the broadcast
    catalog is the even-numbered items' own non-degenerate bboxes
    (~N/2 polygons >> dense_limit 4096), so the per-leaf multi-match
    scan (geo/strtree.py query_all tree path) is the code under SQL
    check — round 1's silent first-match fallback would fail this row.
    Catalog build is a pruned 2-column read of the broadcast side only.
    """
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq
    from ..stages.footprint import encode_footprint
    from ..stages.pip_join import MultiPIPJoiner
    p = _fx(sf_dir)
    cat_tbl = pq.read_table(p["stac_items"], columns=["image_id", "bbox"])
    id_col = cat_tbl["image_id"].combine_chunks()
    bb_col = cat_tbl["bbox"].combine_chunks()
    # zero-copy flatten + Arrow string kernels (no Python per-row parse)
    bbs = bb_col.flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)
    num = pc.cast(pc.utf8_slice_codeunits(id_col, 4, 13),
                  pa.int64()).to_numpy()
    keep = (num % 2 == 0) & (bbs[:, 0] < bbs[:, 2]) & (bbs[:, 1] < bbs[:, 3])
    ids = np.asarray(id_col.to_numpy(zero_copy_only=False))[keep]
    bbs = bbs[keep]
    # rect catalog: broadcast the packed (N, 4) bbox array; the joiner
    # builds the STRtree in rect mode (containment == bbox test)
    cat_ref = ray.put((ids.tolist(), bbs))
    ds = clean_read_parquet(p["stac_items"], columns=["image_id", "bbox"])
    ds = ds.map_batches(lambda b: encode_footprint(b, with_wkt=False),
                        batch_format="pyarrow")
    return ds.map_batches(MultiPIPJoiner, fn_constructor_args=(cat_ref,),
                          fn_constructor_kwargs={"out_col": "cat_id"},
                          batch_format="pyarrow", concurrency=_auto())


def _geo_pip_multi_tree_sql() -> str:
    return f"""
WITH pts AS (
  SELECT image_id,
         (bbox[1] + bbox[3]) / 2 AS cx, (bbox[2] + bbox[4]) / 2 AS cy
  FROM read_parquet('{_fx_glob("stac_items")}')),
cat AS (
  SELECT image_id AS cat_id, bbox
  FROM read_parquet('{_fx_glob("stac_items")}')
  WHERE CAST(substr(image_id, 5) AS BIGINT) % 2 = 0
    AND bbox[1] < bbox[3] AND bbox[2] < bbox[4])
SELECT p.image_id, c.cat_id
FROM pts p JOIN cat c
  ON p.cx >= c.bbox[1] AND p.cx <= c.bbox[3]
 AND p.cy >= c.bbox[2] AND p.cy <= c.bbox[4]
"""


def geo_rect_join(sf_dir: str):
    """Rectangle-INTERSECTION join: every (item, catalog) pair whose
    footprint bboxes OVERLAP (closed 2-D interval-overlap predicate)
    — a different join class from the PIP family (containment of a
    point) and the spatial analogue of events_range_join.  The
    catalog is the even-numbered items' own non-degenerate bboxes
    (>> dense_limit at sf >= 0.01, so the STRtree rect-probe TREE
    sweep is the code under SQL check; sf0.001 exercises the dense
    matrix path).

    Antimeridian-crossing probe boxes (w > e, fixture rows
    i % 911 == 907) are matched as literal intervals on both sides —
    identical to the SQL predicate; geographic splitting is
    geo_footprint_split's job upstream.

    Scale shape: broadcast rect catalog via ray.put (one packed
    (N, 4) float array + ids), actor-pool probe (tree built once per
    actor in __init__), pruned 2-column read of each side, no
    shuffle.  At a catalog too big to broadcast the same predicate
    composes as a cell-bucketed shuffle join (bucket both sides by
    covering cells, per-bucket rect sweep, dedup pairs) — the
    documented scale-out path.
    """
    import ray
    import pyarrow.parquet as pq
    from ..stages.pip_join import RectIntersectJoiner
    p = _fx(sf_dir)
    cat_tbl = pq.read_table(p["stac_items"], columns=["image_id", "bbox"])
    id_col = cat_tbl["image_id"].combine_chunks()
    bb_col = cat_tbl["bbox"].combine_chunks()
    bbs = bb_col.flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)
    num = pc.cast(pc.utf8_slice_codeunits(id_col, 4, 13),
                  pa.int64()).to_numpy()
    keep = (num % 2 == 0) & (bbs[:, 0] < bbs[:, 2]) & (bbs[:, 1] < bbs[:, 3])
    ids = np.asarray(id_col.to_numpy(zero_copy_only=False))[keep]
    cat_ref = ray.put((ids.tolist(), bbs[keep]))
    ds = clean_read_parquet(p["stac_items"], columns=["image_id", "bbox"])
    return ds.map_batches(RectIntersectJoiner, fn_constructor_args=(cat_ref,),
                          batch_format="pyarrow", concurrency=_auto())


def _geo_rect_join_sql() -> str:
    return f"""
WITH it AS (
  SELECT image_id, bbox FROM read_parquet('{_fx_glob("stac_items")}')),
cat AS (
  SELECT image_id AS cat_id, bbox
  FROM it
  WHERE CAST(substr(image_id, 5) AS BIGINT) % 2 = 0
    AND bbox[1] < bbox[3] AND bbox[2] < bbox[4])
SELECT i.image_id, c.cat_id
FROM it i JOIN cat c
  ON i.bbox[1] <= c.bbox[3] AND i.bbox[3] >= c.bbox[1]
 AND i.bbox[2] <= c.bbox[4] AND i.bbox[4] >= c.bbox[2]
"""


def _g_cells_path() -> str:
    from .. import goldens as _g
    return _g.golden_path("geo_cells", ORACLE_SF_DIR)


RADIUS_JOIN_R = 1.0


def geo_radius_join(sf_dir: str):
    """WITHIN-RADIUS pair join: every (item, catalog point) pair whose
    footprint CENTROIDS lie within 1 degree planar distance — the
    distance-predicate join class (vs PIP containment, kNN's fixed-k
    ranking, and the rect join's interval overlap).  The catalog is
    every 37th item's centroid.

    Scale shape: broadcast point catalog via ray.put, actor-pool probe
    (STRtree in degenerate-rect point mode built once per actor) with
    an epsilon-padded r-box prune and the exact distance predicate
    deciding — evaluated in the SQL text's operand order so doubles
    agree bit-for-bit.  Pruned 2-column read, no shuffle.  At a
    catalog too big to broadcast the same predicate composes as a
    cell-bucketed shuffle join with r/cell-size neighbor probes — the
    geo_rect_join scale-out note applies verbatim.
    """
    import ray
    import pyarrow.parquet as pq
    from ..stages.pip_join import RadiusJoiner
    p = _fx(sf_dir)
    cat_tbl = pq.read_table(p["stac_items"], columns=["image_id", "bbox"])
    id_col = cat_tbl["image_id"].combine_chunks()
    bb_col = cat_tbl["bbox"].combine_chunks()
    bbs = bb_col.flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)
    num = pc.cast(pc.utf8_slice_codeunits(id_col, 4, 13),
                  pa.int64()).to_numpy()
    keep = num % 37 == 0
    ids = np.asarray(id_col.to_numpy(zero_copy_only=False))[keep]
    px = ((bbs[:, 0] + bbs[:, 2]) * 0.5)[keep]
    py = ((bbs[:, 1] + bbs[:, 3]) * 0.5)[keep]
    cat_ref = ray.put((ids.tolist(), px, py))
    ds = clean_read_parquet(p["stac_items"], columns=["image_id", "bbox"])
    return ds.map_batches(RadiusJoiner,
                          fn_constructor_args=(cat_ref, RADIUS_JOIN_R),
                          batch_format="pyarrow", concurrency=_auto())


def _geo_radius_join_sql() -> str:
    r = RADIUS_JOIN_R
    return f"""
WITH it AS (
  SELECT image_id, (bbox[1] + bbox[3]) * 0.5 AS cx,
         (bbox[2] + bbox[4]) * 0.5 AS cy
  FROM read_parquet('{_fx_glob("stac_items")}')),
cat AS (
  SELECT image_id AS cat_id, cx AS px, cy AS py
  FROM it
  WHERE CAST(substr(image_id, 5) AS BIGINT) % 37 = 0)
SELECT i.image_id, c.cat_id
FROM it i JOIN cat c
  ON (i.cx - c.px) * (i.cx - c.px)
   + (i.cy - c.py) * (i.cy - c.py) <= {r} * {r}
"""


# -------------------------------------------- pyramid / stencil (r5)

def _grid_ixiy(bb: "np.ndarray", z: int):
    """(ix, iy) integer grid cell of each bbox CENTER at zoom ``z``
    (2^z x 2^z cells over [-180,180] x [-90,90]), plus the w<=e mask.

    Operand order is pinned to the SQL oracle's expression exactly
    (((c + off) / span) * 2^z, floored, clamped to 2^z - 1) so both
    sides make the identical IEEE-754 decisions at cell boundaries.
    """
    w, s, e, n = bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3]
    keep = w <= e
    k = float(1 << z)
    cx = (w + e) / 2.0
    cy = (s + n) / 2.0
    ix = np.minimum(np.floor((cx + 180.0) / 360.0 * k), k - 1).astype(np.int64)
    iy = np.minimum(np.floor((cy + 90.0) / 180.0 * k), k - 1).astype(np.int64)
    return ix, iy, keep


def _bbox_matrix(batch: pa.Table) -> "np.ndarray":
    bb = batch["bbox"]
    if isinstance(bb, pa.ChunkedArray):
        bb = bb.combine_chunks()
    return bb.flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)


PYRAMID_MAX_Z = 6

def geo_pyramid_rollup(sf_dir: str):
    """HIERARCHICAL tile-pyramid rollup: item count and integer
    micro-deg^2 bbox-area sum per quadtree cell at EVERY zoom level
    z = 6..0 in one pass — the multi-resolution aggregation a tile
    server / heatmap renderer runs over an image catalog.

    Scale shape: each batch contracts to its finest-level (z=6)
    partial FIRST (<= 4^6 rows per batch regardless of item count),
    then expands each partial cell into its ancestor chain
    (ix >> k, iy >> k for each coarser level — 7 rows per distinct
    cell, sum bounded by sum_z 4^z ~ 5.5k rows/batch), so ONE shuffle
    groupby over an output-sized key domain aggregates all levels
    together.  The facts are never re-read per level and nothing
    level-serial runs on the driver — compare the naive z-serial plan
    (7 scans or 7 chained shuffles).  Antimeridian-crossing boxes
    (w > e) are excluded by contract, same WHERE in the oracle.
    """
    p = _fx(sf_dir)
    # _meta_read, not a bare clean_read_parquet: Ray's ~200-block
    # default read fragments the partials (each tiny batch touches
    # much of the cell domain, so partial volume scales with BATCH
    # COUNT); the CPU-matched block count measured 15 -> 4.7 s at 20M
    return pyramid_from_dataset(_meta_read(p["stac_items"],
                                           columns=["bbox"]))


def pyramid_from_dataset(ds):
    """Pyramid core over any Dataset with a ``bbox`` fixed-list column
    (shared by the fixture query and the 20M-bbox scale probe)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        bb = _bbox_matrix(batch)
        ix6, iy6, keep = _grid_ixiy(bb, PYRAMID_MAX_Z)
        w, s, e, n = bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3]
        area = (e - w) * (n - s)
        ua = (np.sign(area)
              * np.floor(np.abs(area) * 1e6 + 0.5)).astype(np.int64)
        df = pd.DataFrame({"ix6": ix6[keep], "iy6": iy6[keep],
                           "ua": ua[keep]})
        fine = df.groupby(["ix6", "iy6"], sort=False).agg(
            n=("ua", "size"), ua=("ua", "sum")).reset_index()
        m = len(fine)
        zs = np.repeat(np.arange(PYRAMID_MAX_Z + 1, dtype=np.int64), m)
        shift = (PYRAMID_MAX_Z - zs).astype(np.int64)
        out = pd.DataFrame({
            "z": zs,
            "ix": np.tile(fine.ix6.to_numpy(), PYRAMID_MAX_Z + 1) >> shift,
            "iy": np.tile(fine.iy6.to_numpy(), PYRAMID_MAX_Z + 1) >> shift,
            "n": np.tile(fine.n.to_numpy(), PYRAMID_MAX_Z + 1),
            "ua": np.tile(fine.ua.to_numpy(), PYRAMID_MAX_Z + 1)})
        out = out.groupby(["z", "ix", "iy"], sort=False).agg(
            n=("n", "sum"), ua=("ua", "sum")).reset_index()
        return table_from_pandas(out, preserve_index=False)

    # sorted_combine, not groupby().aggregate: the partials are
    # weakly contracted (every batch can touch most of the 5.5k-cell
    # domain, so partial rows ~ #batches x domain), and Ray's native
    # reduce costs per PARTIAL ROW (lesson 21/25; A/B at 20M bboxes in
    # BENCH/BASELINE.md round-5 grid section)
    # batch_size=None: whole-block batches — the default 1024-row
    # batches contract barely at all against a multi-thousand-cell
    # domain (measured 2.35M partial rows vs 0.6M from 500k-row
    # blocks at 20M bboxes), and partial contraction is the whole
    # point of the pre-aggregate
    from ..stages.util import sorted_combine
    agg = sorted_combine(ds.map_batches(partial, batch_format="pyarrow",
                                        batch_size=None),
                         keys=["z", "ix", "iy"], sum_cols=["n", "ua"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "z": pc.cast(batch["z"], pa.int64()),
            "ix": pc.cast(batch["ix"], pa.int64()),
            "iy": pc.cast(batch["iy"], pa.int64()),
            "n_items": pc.cast(batch["n"], pa.int64()),
            "sum_ua": pc.cast(batch["ua"], pa.int64())})
    return agg.map_batches(finish, batch_format="pyarrow")


def _geo_pyramid_rollup_sql() -> str:
    return f"""
WITH b AS (
  SELECT LEAST(CAST(floor(((bbox[1] + bbox[3]) / 2 + 180.0) / 360.0 * 64.0)
               AS BIGINT), 63) AS ix6,
         LEAST(CAST(floor(((bbox[2] + bbox[4]) / 2 + 90.0) / 180.0 * 64.0)
               AS BIGINT), 63) AS iy6,
         CAST(round((bbox[3] - bbox[1]) * (bbox[4] - bbox[2]) * 1000000)
              AS BIGINT) AS ua
  FROM read_parquet('{_fx_glob("stac_items")}')
  WHERE bbox[1] <= bbox[3])
SELECT CAST(t.z AS BIGINT) AS z,
       ix6 // (1::BIGINT << (6 - t.z)) AS ix,
       iy6 // (1::BIGINT << (6 - t.z)) AS iy,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(ua) AS BIGINT) AS sum_ua
FROM b, range(7) t(z)
GROUP BY 1, 2, 3
"""


FOCAL_Z = 7

def geo_focal_mean(sf_dir: str):
    """3x3 FOCAL (neighborhood) aggregation over the z=7 density grid:
    for every occupied cell, the item count summed over its Moore
    neighborhood and the number of occupied neighbor cells — the
    stencil/convolution op class (density smoothing, hot-spot
    detection) that a naive engine writes as a band self-join.

    Scale shape: the stencil runs as SCATTER-GATHER on the CONTRACTED
    cell table, never on the facts — per-batch partials contract items
    to <= 4^7 cells, one groupby yields the cell table (bounded by the
    GRID, 16,384 rows max, regardless of item count), each cell
    scatters 9 (neighbor, n, 1) rows, and one output-sized groupby
    gathers sums.  Cells with no occupied neighbors beyond themselves
    still appear (their own scatter lands on themselves).  The
    occupied-cell filter is a broadcast of packed cell keys — bounded
    by the grid, so the broadcast is safe at ANY data scale; a finer
    grid than ~2^13 would swap the driver fold for a hash semi-join.
    """
    p = _fx(sf_dir)
    # CPU-matched block count — same rationale as geo_pyramid_rollup
    # (measured 15 -> 3.0 s at 20M bboxes)
    return focal_from_dataset(_meta_read(p["stac_items"],
                                         columns=["bbox"]))


def focal_from_dataset(ds):
    """Focal-stencil core over any Dataset with a ``bbox`` fixed-list
    column (shared by the fixture query and the 20M-bbox scale probe)."""
    import pandas as pd

    import ray

    from ..stages.util import sorted_combine

    def partial(batch: pa.Table) -> pa.Table:
        bb = _bbox_matrix(batch)
        ix, iy, keep = _grid_ixiy(bb, FOCAL_Z)
        df = pd.DataFrame({"ix": ix[keep], "iy": iy[keep]})
        g = df.groupby(["ix", "iy"], sort=False).size().reset_index(name="n")
        return table_from_pandas(g, preserve_index=False)

    # both reduces route through sorted_combine: the per-batch partials
    # are weakly contracted (every batch touches much of the 16k-cell
    # grid, partial rows ~ #batches x grid) and Ray's native reduce
    # costs per PARTIAL ROW (lesson 21/25; A/B at 20M bboxes in
    # BENCH/BASELINE.md round-5 grid section)
    cells = sorted_combine(ds.map_batches(partial, batch_format="pyarrow",
                                          batch_size=None),
                           keys=["ix", "iy"], sum_cols=["n"]) \
        .materialize()          # grid-bounded; consumed twice (lesson 26)

    side = 1 << FOCAL_Z
    occ = cells.to_pandas()     # <= 4^z rows — grid-bounded driver pull
    packed_occ = occ.ix.to_numpy() * side + occ.iy.to_numpy()
    order = np.argsort(packed_occ)
    occ_keys = packed_occ[order]
    occ_n = occ.n.to_numpy().astype(np.int64)[order]
    occ_ref = ray.put((occ_keys, occ_n))

    def scatter(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy()
        iy = batch["iy"].to_numpy()
        n = pc.cast(batch["n"], pa.int64()).to_numpy()
        m = len(ix)
        dx = np.repeat(np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1]), m)
        dy = np.repeat(np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1]), m)
        return pa.table({
            "jx": pa.array(np.tile(ix, 9) + dx, pa.int64()),
            "jy": pa.array(np.tile(iy, 9) + dy, pa.int64()),
            "nbr_n": pa.array(np.tile(n, 9), pa.int64()),
            "one": pa.array(np.ones(9 * m, dtype=np.int64), pa.int64())})

    gathered = sorted_combine(
        cells.map_batches(scatter, batch_format="pyarrow"),
        keys=["jx", "jy"], sum_cols=["nbr_n", "one"])

    def keep_occupied(batch: pa.Table, _ref=occ_ref) -> pa.Table:
        keys, own = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        jx = pc.cast(batch["jx"], pa.int64()).to_numpy()
        jy = pc.cast(batch["jy"], pa.int64()).to_numpy()
        # the in-grid mask must precede the packed-key probe: (jx, -1)
        # packs to the same integer as (jx-1, side-1), so an off-grid
        # scatter row would otherwise alias an occupied cell
        in_grid = (jx >= 0) & (jx < side) & (jy >= 0) & (jy < side)
        packed = jx * side + jy
        hit = np.flatnonzero(
            in_grid & np.isin(packed, keys, assume_unique=False))
        if len(hit) == 0:
            return pa.table({"ix": pa.array([], pa.int64()),
                             "iy": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "nbr_sum": pa.array([], pa.int64()),
                             "nbr_cells": pa.array([], pa.int64())})
        pk = packed[hit]
        rows = np.searchsorted(keys, pk)
        if not np.array_equal(keys[rows], pk):   # isin guarantees this
            raise RuntimeError("focal gather: occupied-key lookup "
                               "misaligned with broadcast cell table")
        return pa.table({
            "ix": pa.array(jx[hit], pa.int64()),
            "iy": pa.array(jy[hit], pa.int64()),
            "n": pa.array(own[rows], pa.int64()),
            "nbr_sum": pc.cast(batch["nbr_n"], pa.int64()).take(
                pa.array(hit)),
            "nbr_cells": pc.cast(batch["one"], pa.int64()).take(
                pa.array(hit))})

    return gathered.map_batches(keep_occupied, batch_format="pyarrow")


def _geo_focal_mean_sql() -> str:
    return f"""
WITH c AS (
  SELECT LEAST(CAST(floor(((bbox[1] + bbox[3]) / 2 + 180.0) / 360.0 * 128.0)
               AS BIGINT), 127) AS ix,
         LEAST(CAST(floor(((bbox[2] + bbox[4]) / 2 + 90.0) / 180.0 * 128.0)
               AS BIGINT), 127) AS iy,
         CAST(count(*) AS BIGINT) AS n
  FROM read_parquet('{_fx_glob("stac_items")}')
  WHERE bbox[1] <= bbox[3]
  GROUP BY 1, 2)
SELECT a.ix, a.iy, a.n,
       CAST(sum(b.n) AS BIGINT) AS nbr_sum,
       CAST(count(*) AS BIGINT) AS nbr_cells
FROM c a JOIN c b
  ON abs(a.ix - b.ix) <= 1 AND abs(a.iy - b.iy) <= 1
GROUP BY 1, 2, 3
"""


def zonal_from_dataset(ds, cat_ref, concurrency=None):
    """Core of geo_zonal_stats over any bbox Dataset + broadcast
    catalog ref — shared with tools/scale_grid.py's 20M-bbox probe."""
    from ..stages.pip_join import ZonalStatsJoiner
    R = 6371.0088

    def probe_rows(batch: pa.Table) -> pa.Table:
        bb = batch["bbox"]
        if isinstance(bb, pa.ChunkedArray):
            bb = bb.combine_chunks()
        m = bb.flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)
        w, s, e, n = m[:, 0], m[:, 1], m[:, 2], m[:, 3]
        width = np.where(e >= w, e - w, 360.0 - (w - e))
        a = (R * R * np.radians(width)
             * (np.sin(np.radians(n)) - np.sin(np.radians(s))))
        # identical rounding to geo_bbox_area (half-away, 3 dp), then
        # integer milli-km^2 so every downstream sum is exact
        amk = (np.floor(a * 1e3 + 0.5)).astype(np.int64)
        return pa.table({"cx": pa.array((w + e) / 2),
                         "cy": pa.array((s + n) / 2),
                         "amk": pa.array(amk)})

    partials = ds.map_batches(probe_rows, batch_format="pyarrow") \
        .map_batches(ZonalStatsJoiner, fn_constructor_args=(cat_ref,),
                     batch_format="pyarrow",
                     concurrency=concurrency or _auto())

    # the partial stream is O(#input blocks x zones) rows (each batch
    # contracted to <= 8 zone rows already), so the fold is ONE
    # repartition into a single worker task — a distributed sort or
    # groupby over an 8-key domain would shuffle mostly-empty
    # partitions (and trip the executor's mixed-schema warning on the
    # zero-column empties).  At a block count where even the partial
    # stream is big, insert one tree level (repartition(ncpu) +
    # local combine) before this fold.
    def fold(df) -> pa.Table:
        g = df.groupby("zone", sort=True, as_index=False) \
              .agg(n_items=("n", "sum"), area_mkm2=("val", "sum"))
        q = g["area_mkm2"].to_numpy().astype(np.float64) \
            / (1e3 * g["n_items"].to_numpy().astype(np.float64))
        # half-AWAY to match DuckDB round() (areas are non-negative)
        mean = np.floor(q * 1e6 + 0.5) / 1e6
        return pa.table({
            "zone": pa.array(g["zone"], pa.string()),
            "n_items": pa.array(g["n_items"].to_numpy(), pa.int64()),
            "area_mkm2": pa.array(g["area_mkm2"].to_numpy(), pa.int64()),
            "mean_km2": pa.array(mean)})
    return partials.repartition(1).map_batches(
        fold, batch_format="pandas", batch_size=None)


def geo_zonal_stats(sf_dir: str):
    """Zonal statistics: per catalog polygon (zone), the aggregate of
    the item-footprint attribute surface it contains — item count,
    total and mean spherical bbox area of every item whose centroid
    falls inside the zone (closed boundaries, multi-match: an item
    under two overlapping zones counts in both).

    The classic raster/vector zonal-stats op the PIP family's pair
    listings stop short of: the broadcast STRtree supplies the zone
    assignment and the partials contract IN BATCH to one row per
    (batch, zone) — O(zones) rows ever shuffle, never O(items).  Areas
    follow geo_bbox_area's SQL-matched closed form, rounded half-away
    to milli-km^2 and folded as int64 (the integer-units rule), so
    partial sums are bit-exact under any batching.
    """
    import ray
    from ..pipelines.flagship import _load_catalog
    p = _fx(sf_dir)
    _, cat, _ = _load_catalog(p["collections"])
    return zonal_from_dataset(clean_read_parquet(p["stac_items"],
                                                 columns=["bbox"]),
                              ray.put(cat))


def _geo_zonal_stats_sql() -> str:
    return f"""
WITH pts AS (
  SELECT (bbox[1] + bbox[3]) / 2 AS cx, (bbox[2] + bbox[4]) / 2 AS cy,
         CAST(round(6371.0088 * 6371.0088
              * radians(CASE WHEN bbox[3] >= bbox[1] THEN bbox[3] - bbox[1]
                             ELSE 360.0 - (bbox[1] - bbox[3]) END)
              * (sin(radians(bbox[4])) - sin(radians(bbox[2]))), 3) * 1000
              AS BIGINT) AS amk
  FROM read_parquet('{_fx_glob("stac_items")}'))
SELECT c.collection_id AS zone,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(p.amk) AS BIGINT) AS area_mkm2,
       round(CAST(sum(p.amk) AS DOUBLE) / (1000.0 * count(*)), 6) AS mean_km2
FROM pts p JOIN read_parquet('{_fx_glob("collections")}') c
  ON p.cx >= c.bbox[1] AND p.cx <= c.bbox[3]
 AND p.cy >= c.bbox[2] AND p.cy <= c.bbox[4]
GROUP BY 1
"""


def geo_zonal_overlap(sf_dir: str):
    """AREA-WEIGHTED zonal coverage: per catalog zone, how many item
    footprints OVERLAP it (closed bbox predicate) and what fraction of
    the zone their intersection rects sum to — the coverage variant of
    geo_zonal_stats (an item contributes by intersection area, not
    centroid membership; an item straddling two zones contributes its
    overlapping part to each).

    Scale shape: identical to geo_zonal_stats — broadcast STRtree
    rect-probe, per-pair spherical intersection areas rounded
    half-away to int64 milli-km^2 (bit-exact partial sums), in-batch
    contraction to O(zones) rows, single-task fold.  Coverage divides
    by the zone's own area through the SAME closed form + rounding so
    the ratio's operands are bit-identical to the oracle's.
    """
    import ray
    import pyarrow.parquet as pq
    p = _fx(sf_dir)
    ct = pq.read_table(p["collections"], columns=["collection_id", "bbox"])
    ids = ct["collection_id"].to_pylist()
    rects = np.asarray(ct["bbox"].to_pylist(), dtype=np.float64)
    return zonal_overlap_from_dataset(
        clean_read_parquet(p["stac_items"], columns=["bbox"]),
        ray.put((ids, rects)), ids, rects)


def zonal_overlap_from_dataset(ds, cat_ref, ids, rects, concurrency=None):
    """Core of geo_zonal_overlap over any bbox Dataset + broadcast
    rect catalog — shared with tools/scale_grid.py's 20M-bbox probe."""
    from ..stages.pip_join import ZonalOverlapJoiner
    from ..stages.util import small_domain_fold
    partials = ds.map_batches(ZonalOverlapJoiner,
                              fn_constructor_args=(cat_ref,),
                              batch_format="pyarrow",
                              concurrency=concurrency or _auto())
    agg = small_domain_fold(partials, keys=["zone"], sum_cols=["n", "val"])

    R = 6371.0088
    zw, zs, ze, zn = rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
    za = (R * R * np.radians(ze - zw)
          * (np.sin(np.radians(zn)) - np.sin(np.radians(zs))))
    zone_mkm2 = {i: int(np.floor(a * 1e3 + 0.5)) for i, a in zip(ids, za)}

    def finish(batch: pa.Table) -> pa.Table:
        z = batch["zone"].to_pylist()
        n = pc.cast(batch["n"], pa.int64())
        amk = batch["val"].to_numpy().astype(np.int64)
        zmk = np.array([zone_mkm2[x] for x in z], dtype=np.int64)
        q = amk.astype(np.float64) / zmk.astype(np.float64)
        cov = np.floor(q * 1e6 + 0.5) / 1e6        # half-away, 6 dp
        return pa.table({"zone": batch["zone"], "n_overlaps": n,
                         "overlap_mkm2": pa.array(amk),
                         "coverage_r": pa.array(cov)})
    return agg.map_batches(finish, batch_format="pyarrow")


def _geo_zonal_overlap_sql() -> str:
    area = (lambda w, s, e, n:
            f"""CAST(round(6371.0088 * 6371.0088
              * radians({e} - {w})
              * (sin(radians({n})) - sin(radians({s}))), 3) * 1000
              AS BIGINT)""")
    return f"""
WITH pair AS (
  SELECT c.collection_id AS zone,
         {area("greatest(i.bbox[1], c.bbox[1])",
               "greatest(i.bbox[2], c.bbox[2])",
               "least(i.bbox[3], c.bbox[3])",
               "least(i.bbox[4], c.bbox[4])")} AS amk,
         {area("c.bbox[1]", "c.bbox[2]", "c.bbox[3]", "c.bbox[4]")} AS zmk
  FROM read_parquet('{_fx_glob("stac_items")}') i
  JOIN read_parquet('{_fx_glob("collections")}') c
    ON i.bbox[1] <= c.bbox[3] AND i.bbox[3] >= c.bbox[1]
   AND i.bbox[2] <= c.bbox[4] AND i.bbox[4] >= c.bbox[2])
SELECT zone, CAST(count(*) AS BIGINT) AS n_overlaps,
       CAST(sum(amk) AS BIGINT) AS overlap_mkm2,
       round(CAST(sum(amk) AS DOUBLE) / any_value(zmk), 6) AS coverage_r
FROM pair GROUP BY 1
"""


# ------------------------------------------------------------ union area

UNION_TILE_U = 4_000_000          # 4-degree tiles, micro-degree units


def geo_union_area(sf_dir: str):
    """EXACT per-collection UNION-of-footprints area (coverage
    dissolve): overlapping item bboxes counted ONCE — the polygon-
    dissolve aggregate every catalog coverage report needs, where
    geo_bbox_area's per-item sums double-count overlaps.

    Distributed shape: the plane is partitioned into fixed 4-degree
    tiles; every bbox is CLIPPED to the tiles it touches (vectorized
    two-level repeat — a bbox costs rows only for tiles it actually
    overlaps), so per-(collection, tile) groups are spatially local
    and the union decomposes EXACTLY (tiles are disjoint: union area ==
    sum of per-tile union areas of the clipped pieces).  Groups ride
    the shared keyed_boundary_decompose sort; each group computes its
    exact integer union via coordinate compression (2-D difference
    grid under UNION_GRID_MAX rects, O(k)-memory slab sweep above —
    stages/footprint.rect_union_area, the two paths property-tested
    equal), and per-collection tile sums fold through
    small_domain_fold.  A denser corpus shrinks the tile constant,
    not the algorithm (per-tile k bounds both grid memory and sweep
    time).

    Exactness: coordinates quantize ONCE to int64 micro-degrees
    (stages/footprint.quantize_rects, shared with the golden); all
    union arithmetic is integer.  The golden replays a GLOBAL
    (untiled) y-compressed slab sweep per collection — independent of
    the tiling and of the grid kernel.  Oracle: golden parquet (DuckDB
    cannot express union-of-rectangles measure in SQL).
    """
    p = _fx(sf_dir)
    ds = clean_read_parquet(p["stac_items"],
                            columns=["collection_id", "bbox"])
    return union_area_from_dataset(ds)


def union_area_from_dataset(ds):
    """Core of geo_union_area over any Dataset with (collection_id,
    bbox) columns — shared with the 20M-bbox scale probe
    (tools/scale_grid.py)."""
    import pandas as pd

    from ..stages.footprint import (bbox_view, quantize_rects,
                                    rect_union_area)
    from ..stages.util import keyed_boundary_decompose, small_domain_fold
    T = UNION_TILE_U

    def clip(batch: pa.Table) -> pa.Table:
        r = quantize_rects(bbox_view(batch))
        coll = np.asarray(batch["collection_id"])
        ok = (r[:, 2] > r[:, 0]) & (r[:, 3] > r[:, 1])
        r, coll = r[ok], coll[ok]
        if len(r) == 0:
            return pa.table({
                "gkey": pa.array([], pa.string()),
                "collection_id": pa.array([], pa.string()),
                "w": pa.array([], pa.int64()), "s": pa.array([], pa.int64()),
                "e": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        tx0 = np.floor_divide(r[:, 0], T)
        ty0 = np.floor_divide(r[:, 1], T)
        # half-open boxes: a box ending exactly on a tile edge does not
        # enter the next tile
        tx1 = np.floor_divide(r[:, 2] - 1, T)
        ty1 = np.floor_divide(r[:, 3] - 1, T)
        nx = (tx1 - tx0 + 1)
        ny = (ty1 - ty0 + 1)
        total = nx * ny
        row = np.repeat(np.arange(len(r)), total)
        k = np.arange(int(total.sum())) - np.repeat(
            np.r_[0, np.cumsum(total)[:-1]], total)
        ny_r = ny[row]
        tx = tx0[row] + k // ny_r
        ty = ty0[row] + k % ny_r
        cw = np.maximum(r[row, 0], tx * T)
        ce = np.minimum(r[row, 2], (tx + 1) * T)
        cs = np.maximum(r[row, 1], ty * T)
        cn = np.minimum(r[row, 3], (ty + 1) * T)
        cid = coll[row]
        gkey = pd.Series(cid).astype(str) + ":" \
            + pd.Series(tx).astype(str) + ":" + pd.Series(ty).astype(str)
        return pa.table({
            "gkey": pa.array(gkey.to_numpy(), pa.string()),
            "collection_id": pa.array(cid, pa.string()),
            "w": pa.array(cw, pa.int64()), "s": pa.array(cs, pa.int64()),
            "e": pa.array(ce, pa.int64()), "n": pa.array(cn, pa.int64())})

    clipped = ds.map_batches(clip, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "collection_id": pd.Series([], dtype="object"),
                "union_area_u": pd.Series([], dtype="int64")})
        # rows arrive SORTED by gkey (the decompose sort / per-group
        # fold); group boundaries via one vectorized change mask — a
        # pandas groupby with per-group frame slicing here cost
        # ~2.5 ms/group x 32k groups = 80 s at the 2M-bbox probe (the
        # measured first cut); flat numpy slices + the single-rect
        # fast path run the same groups in ~1 s
        gk = df["gkey"].to_numpy()
        coll = df["collection_id"].to_numpy()
        r_all = df[["w", "s", "e", "n"]].to_numpy()
        change = np.r_[True, gk[1:] != gk[:-1]]
        starts = np.flatnonzero(change)
        stops = np.r_[starts[1:], len(gk)]
        # singleton groups (the common case on a sparse grid) in one
        # vectorized pass: area = (e - w) * (n - s)
        sizes = stops - starts
        out_coll, out_area = [], []
        single = sizes == 1
        if single.any():
            i = starts[single]
            a = (r_all[i, 2] - r_all[i, 0]) * (r_all[i, 3] - r_all[i, 1])
            out_coll.extend(coll[i].tolist())
            out_area.extend(np.maximum(a, 0).tolist())
        for a_, b_ in zip(starts[~single], stops[~single]):
            out_coll.append(coll[a_])
            out_area.append(rect_union_area(r_all[a_:b_]))
        return pd.DataFrame({"collection_id": out_coll,
                             "union_area_u": np.asarray(out_area,
                                                        dtype=np.int64)})

    per_tile = keyed_boundary_decompose(
        clipped, sort_keys=["gkey"], key_col="gkey",
        raw_cols=["gkey", "collection_id", "w", "s", "e", "n"],
        kernel=kernel)
    return small_domain_fold(per_tile, keys=["collection_id"],
                             sum_cols=["union_area_u"])


# ------------------------------------------------------- covering compaction

COMPACT_Z = 9        # finest cell level (512 x 512 grid)
COMPACT_ZMIN = 5     # promotion ceiling (z5 = 32 x 32 top cells)


def _morton_spread(v: "np.ndarray") -> "np.ndarray":
    """Spread the low 16 bits of each int64 so bit i lands at 2i."""
    v = v.astype(np.int64)
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def _morton_compactbits(v: "np.ndarray") -> "np.ndarray":
    v = v & 0x5555555555555555
    v = (v | (v >> 1)) & 0x3333333333333333
    v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
    v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
    return v


def _morton2(ix: "np.ndarray", iy: "np.ndarray") -> "np.ndarray":
    """Z-order (Morton) interleave: ANY quadtree subtree is a single
    contiguous code range, which is what makes the one-sort compaction
    below possible."""
    return _morton_spread(ix) | (_morton_spread(iy) << np.int64(1))


def _unmorton2(m: "np.ndarray"):
    return _morton_compactbits(m), _morton_compactbits(m >> np.int64(1))


def _compact_codes(cur: "np.ndarray"):
    """Promote a SORTED UNIQUE array of z=COMPACT_Z Morton codes up
    through COMPACT_ZMIN (4 full siblings -> parent, recursively).
    Returns (z, m) arrays — each output cell's level and its Morton
    code AT ITS OWN LEVEL.  Pure run-length arithmetic, no per-cell
    loop; the while runs <= COMPACT_Z - COMPACT_ZMIN times."""
    out_z, out_m = [], []
    z = COMPACT_Z
    while z > COMPACT_ZMIN and len(cur):
        par = cur >> np.int64(2)
        starts = np.flatnonzero(np.r_[True, par[1:] != par[:-1]])
        counts = np.diff(np.r_[starts, len(par)])
        full = counts == 4
        survivors = cur[np.repeat(~full, counts)]
        if len(survivors):
            out_z.append(np.full(len(survivors), z, dtype=np.int64))
            out_m.append(survivors)
        cur = par[starts[full]]              # promoted, still sorted+unique
        z -= 1
    if len(cur):
        out_z.append(np.full(len(cur), z, dtype=np.int64))
        out_m.append(cur)
    if not out_m:
        e = np.empty(0, dtype=np.int64)
        return e, e
    return np.concatenate(out_z), np.concatenate(out_m)


def geo_cell_compact(sf_dir: str):
    """Hierarchical COVERING COMPACTION (the H3 ``compact`` / S2
    normalization op): the distinct z=9 quadtree cells covered by the
    catalog's footprint centers, re-expressed as the MINIMAL
    mixed-resolution cell set — wherever all 4 siblings are covered
    the parent replaces them, recursively up to z=5.  This is how a
    cell-indexed catalog stores coverings compactly and how cell
    joins cut candidate counts.

    Distributed shape: per-batch partials contract facts to distinct
    MORTON codes at z=9 (bounded by the grid, not the item count);
    ONE sort on the code then makes every z=5 subtree a contiguous
    run (Morton ranges ARE subtrees), so the whole 4-level promotion
    runs in-block per z=5 top cell through keyed_boundary_decompose —
    interior subtrees compact with run-length sibling counts (no
    per-cell loop), block-straddling subtrees defer to the keyed
    fold.  One shuffle of distinct codes total; no level-serial
    driver loop, no per-level shuffle chain (compare the naive plan:
    4 chained groupbys).

    The kernel dedups codes itself (complete-key-run guarantee makes
    per-batch dedup + in-kernel dedup exact), so no global distinct
    pass is needed before the sort.  Antimeridian-crossing bboxes
    (w > e) are excluded by contract, same WHERE in the oracle.
    """
    p = _fx(sf_dir)
    return cell_compact_from_dataset(_meta_read(p["stac_items"],
                                                columns=["bbox"]))


def cell_compact_from_dataset(ds):
    """Compaction core over any Dataset with a ``bbox`` fixed-list
    column (shared by the fixture query and the 20M-bbox scale probe)."""
    import pandas as pd

    from ..stages.util import keyed_boundary_decompose
    shift = np.int64(2 * (COMPACT_Z - COMPACT_ZMIN))

    def partial(batch: pa.Table) -> pa.Table:
        bb = _bbox_matrix(batch)
        ix, iy, keep = _grid_ixiy(bb, COMPACT_Z)
        m = np.unique(_morton2(ix[keep], iy[keep]))
        return pa.table({"top": m >> shift, "m": m})

    cells = ds.map_batches(partial, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"z": pd.Series([], dtype="int64"),
                              "ix": pd.Series([], dtype="int64"),
                              "iy": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        zz, mm = _compact_codes(np.unique(df["m"].to_numpy()))
        if len(mm) == 0:
            return empty
        ix, iy = _unmorton2(mm)
        return pd.DataFrame({"z": zz, "ix": ix.astype("int64"),
                             "iy": iy.astype("int64")})

    return keyed_boundary_decompose(
        cells, sort_keys=["top", "m"], key_col="top",
        raw_cols=["top", "m"], kernel=kernel)


def _geo_cell_compact_sql() -> str:
    k = float(1 << COMPACT_Z)
    cmax = (1 << COMPACT_Z) - 1
    return f"""
WITH c9 AS (
  SELECT DISTINCT
    LEAST(CAST(floor(((bbox[1] + bbox[3]) / 2 + 180.0) / 360.0 * {k})
          AS BIGINT), {cmax}) AS ix,
    LEAST(CAST(floor(((bbox[2] + bbox[4]) / 2 + 90.0) / 180.0 * {k})
          AS BIGINT), {cmax}) AS iy
  FROM read_parquet('{_fx_glob("stac_items")}')
  WHERE bbox[1] <= bbox[3]),
p8 AS (SELECT ix // 2 AS ix, iy // 2 AS iy FROM c9 GROUP BY 1, 2
       HAVING count(*) = 4),
p7 AS (SELECT ix // 2 AS ix, iy // 2 AS iy FROM p8 GROUP BY 1, 2
       HAVING count(*) = 4),
p6 AS (SELECT ix // 2 AS ix, iy // 2 AS iy FROM p7 GROUP BY 1, 2
       HAVING count(*) = 4),
p5 AS (SELECT ix // 2 AS ix, iy // 2 AS iy FROM p6 GROUP BY 1, 2
       HAVING count(*) = 4)
SELECT CAST(9 AS BIGINT) AS z, c.ix, c.iy
FROM c9 c ANTI JOIN p8 p ON c.ix // 2 = p.ix AND c.iy // 2 = p.iy
UNION ALL
SELECT CAST(8 AS BIGINT), c.ix, c.iy
FROM p8 c ANTI JOIN p7 p ON c.ix // 2 = p.ix AND c.iy // 2 = p.iy
UNION ALL
SELECT CAST(7 AS BIGINT), c.ix, c.iy
FROM p7 c ANTI JOIN p6 p ON c.ix // 2 = p.ix AND c.iy // 2 = p.iy
UNION ALL
SELECT CAST(6 AS BIGINT), c.ix, c.iy
FROM p6 c ANTI JOIN p5 p ON c.ix // 2 = p.ix AND c.iy // 2 = p.iy
UNION ALL
SELECT CAST(5 AS BIGINT), ix, iy FROM p5
"""


def geo_covering_semijoin(sf_dir: str):
    """Region-covering SEMI-JOIN: every item whose z=9 center cell
    lies inside the UNION of the catalog collections' bbox coverings
    — the planet-scale cell-index join pattern (S2/H3 region
    coverings): the region side contracts to a compacted set of
    Morton INTERVALS, broadcast once, and membership per item is one
    binary search — no per-polygon predicate, no shuffle, no join.

    Distributed shape: the catalog side (small by nature — region
    complexity, not item count) enumerates its covering cells, runs
    the same _compact_codes promotion as geo_cell_compact, converts
    each mixed-resolution cell to its Morton range [m0, m0 + 4^(9-z))
    and MERGES adjacent ranges; the broadcast is O(region boundary),
    bounded no matter how many items stream past it.  Each item batch
    computes its code and one vectorized searchsorted against the
    interval starts.  At 10^12 items the plan is unchanged: the
    covering broadcast is catalog-sized and the scan stays
    shuffle-free.

    The oracle replays membership in CELL space (integer ranges from
    the identical floor/clamp formula), so compaction — a pure
    re-encoding of the same cell set — cancels out exactly.
    """
    import pandas as pd

    import ray

    p = _fx(sf_dir)
    colls = pd.read_parquet(p["collections"], columns=["bbox"])
    cb = np.stack(colls["bbox"].to_numpy()).astype(np.float64)
    k = float(1 << COMPACT_Z)

    def cell_of(v, off, span):
        return np.minimum(np.floor((v + off) / span * k),
                          k - 1).astype(np.int64)

    ix0, ix1 = cell_of(cb[:, 0], 180.0, 360.0), cell_of(cb[:, 2], 180.0, 360.0)
    iy0, iy1 = cell_of(cb[:, 1], 90.0, 180.0), cell_of(cb[:, 3], 90.0, 180.0)
    cells = []
    for a, b, c, d in zip(ix0, ix1, iy0, iy1):       # per-collection; the
        gx, gy = np.meshgrid(np.arange(a, b + 1),    # catalog is small by
                             np.arange(c, d + 1))    # contract
        cells.append(_morton2(gx.ravel(), gy.ravel()))
    m9 = np.unique(np.concatenate(cells)) if cells \
        else np.empty(0, dtype=np.int64)
    zz, mm = _compact_codes(m9)
    side = np.int64(1) << (np.int64(2) * (COMPACT_Z - zz))
    lo = mm << (np.int64(2) * (COMPACT_Z - zz))
    hi = lo + side                                   # half-open
    order = np.argsort(lo, kind="stable")
    lo, hi = lo[order], hi[order]
    # merge adjacent/overlapping intervals (compaction leaves abutting
    # ranges wherever siblings promote at different levels)
    if len(lo):
        newrun = np.r_[True, lo[1:] > np.maximum.accumulate(hi[:-1])]
        lo = lo[newrun]
        hi = np.maximum.reduceat(hi, np.flatnonzero(newrun))
    ivl_ref = ray.put((lo, hi))

    ds = _meta_read(p["stac_items"], columns=["item_id", "bbox"])

    def member(batch: pa.Table) -> pa.Table:
        import ray as _ray
        liv = _ray.get(ivl_ref) if isinstance(ivl_ref, _ray.ObjectRef) \
            else ivl_ref
        blo, bhi = liv
        bb = _bbox_matrix(batch)
        ix, iy, keep = _grid_ixiy(bb, COMPACT_Z)
        m = _morton2(ix, iy)
        pos = np.searchsorted(blo, m, side="right") - 1
        hit = keep & (pos >= 0) & (m < bhi[np.clip(pos, 0, None)])
        ids = batch["item_id"].filter(pa.array(hit))
        return pa.table({"item_id": ids})

    return ds.map_batches(member, batch_format="pyarrow")


def _geo_covering_semijoin_sql() -> str:
    k = float(1 << COMPACT_Z)
    cmax = (1 << COMPACT_Z) - 1
    return f"""
WITH pts AS (
  SELECT item_id,
    LEAST(CAST(floor(((bbox[1] + bbox[3]) / 2 + 180.0) / 360.0 * {k})
          AS BIGINT), {cmax}) AS ix,
    LEAST(CAST(floor(((bbox[2] + bbox[4]) / 2 + 90.0) / 180.0 * {k})
          AS BIGINT), {cmax}) AS iy
  FROM read_parquet('{_fx_glob("stac_items")}')
  WHERE bbox[1] <= bbox[3]),
rng AS (
  SELECT
    LEAST(CAST(floor((bbox[1] + 180.0) / 360.0 * {k}) AS BIGINT), {cmax})
      AS ix0,
    LEAST(CAST(floor((bbox[3] + 180.0) / 360.0 * {k}) AS BIGINT), {cmax})
      AS ix1,
    LEAST(CAST(floor((bbox[2] + 90.0) / 180.0 * {k}) AS BIGINT), {cmax})
      AS iy0,
    LEAST(CAST(floor((bbox[4] + 90.0) / 180.0 * {k}) AS BIGINT), {cmax})
      AS iy1
  FROM read_parquet('{_fx_glob("collections")}'))
SELECT p.item_id
FROM pts p
WHERE EXISTS (SELECT 1 FROM rng r
              WHERE p.ix BETWEEN r.ix0 AND r.ix1
                AND p.iy BETWEEN r.iy0 AND r.iy1)
"""


# ----------------------------------------------------- spatial interpolation

IDW_K = 16          # 16 x 16 target grid (256 sample points, whole globe)
IDW_R2 = 225.0      # neighborhood radius^2 in planar deg^2 (15 deg)
IDW_EPS = 0.25      # weight smoothing: w = 1 / (eps + d^2)


def geo_idw_interpolate(sf_dir: str):
    """INVERSE-DISTANCE-WEIGHTED interpolation of the item bbox-area
    surface onto a fixed 16x16 global grid — the spatial-interpolation
    op class (IDW / kriging-lite: estimate a continuous field at query
    points from scattered observations).  For each grid sample point,
    every item centroid within a 15-deg radius contributes its
    spherical bbox area with weight 1/(0.25 + d^2); the estimate is
    the weighted mean in km^2.

    Exactness contract: the per-pair weight and weighted value are
    each rounded HALF-AWAY to integer units (w*1e6 and w*amk, amk the
    zonal-stats int64 milli-km^2 area), so both folds are exact int64
    sums under any batching; the single final division and 6-dp round
    happen once, identically on both sides.  Per-pair products stay
    < 2^62 up to ~1e8 in-radius observations per grid point — past
    that, re-scale the weight unit or insert an int128 tree level.

    Scale shape: the grid is a CONSTANT (256 points, broadcast free as
    a closure constant); each batch computes a (grid x batch) distance
    matrix and contracts IN BATCH to <= 256 partial rows via
    ``np.add.at`` — O(grid) rows ever shuffle, never O(items) — then
    one ``small_domain_fold``.  batch_size bounds the matrix at
    256 x 8192 doubles (~17 MB).  No shuffle touches the fact table.
    """
    p = _fx(sf_dir)
    return idw_from_dataset(clean_read_parquet(p["stac_items"],
                                               columns=["bbox"]))


def idw_from_dataset(ds):
    """IDW core over any Dataset with a ``bbox`` fixed-list column
    (shared with tools/scale_grid.py's 20M-bbox probe)."""
    from ..stages.util import small_domain_fold

    k = IDW_K
    gids_all = np.arange(k * k, dtype=np.int64)
    # identical expression shape to the oracle's grid CTE
    gx = -180.0 + ((gids_all % k).astype(np.float64) + 0.5) * 22.5
    gy = -90.0 + ((gids_all // k).astype(np.float64) + 0.5) * 11.25
    R = 6371.0088

    def partial(batch: pa.Table) -> pa.Table:
        bb = _bbox_matrix(batch)
        w_, s_, e_, n_ = bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3]
        cx = (w_ + e_) / 2.0
        cy = (s_ + n_) / 2.0
        width = np.where(e_ >= w_, e_ - w_, 360.0 - (w_ - e_))
        a = (R * R * np.radians(width)
             * (np.sin(np.radians(n_)) - np.sin(np.radians(s_))))
        amk = np.floor(a * 1e3 + 0.5)            # int-valued double
        dx = cx[None, :] - gx[:, None]
        dy = cy[None, :] - gy[:, None]
        d2 = dx * dx + dy * dy
        gi, ci = np.nonzero(d2 < IDW_R2)
        w = 1.0 / (IDW_EPS + d2[gi, ci])
        wv = np.floor(w * amk[ci] + 0.5).astype(np.int64)
        ws = np.floor(w * 1e6 + 0.5).astype(np.int64)
        sv = np.zeros(k * k, dtype=np.int64)
        ss = np.zeros(k * k, dtype=np.int64)
        n = np.zeros(k * k, dtype=np.int64)
        np.add.at(sv, gi, wv)
        np.add.at(ss, gi, ws)
        np.add.at(n, gi, 1)
        occ = n > 0
        return pa.table({"gid": pa.array(gids_all[occ]),
                         "wv": pa.array(sv[occ]), "ws": pa.array(ss[occ]),
                         "n": pa.array(n[occ])})

    agg = small_domain_fold(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=8192),
        keys=["gid"], sum_cols=["wv", "ws", "n"])

    def finish(batch: pa.Table) -> pa.Table:
        sv = batch["wv"].to_numpy().astype(np.float64)
        ss = batch["ws"].to_numpy().astype(np.float64)
        q = sv * 1000.0 / ss
        return pa.table({"gid": batch["gid"],
                         "n_src": pc.cast(batch["n"], pa.int64()),
                         "idw_km2_r": pa.array(np.floor(q * 1e6 + 0.5) / 1e6)})
    return agg.map_batches(finish, batch_format="pyarrow")


def _geo_idw_interpolate_sql() -> str:
    return f"""
WITH grid AS (
  SELECT i AS gid,
         -180.0 + (CAST(i % {IDW_K} AS DOUBLE) + 0.5) * 22.5 AS gx,
         -90.0 + (CAST(i // {IDW_K} AS DOUBLE) + 0.5) * 11.25 AS gy
  FROM range({IDW_K * IDW_K}) t(i)),
pts AS (
  SELECT (bbox[1] + bbox[3]) / 2 AS cx, (bbox[2] + bbox[4]) / 2 AS cy,
         CAST(round(6371.0088 * 6371.0088
              * radians(CASE WHEN bbox[3] >= bbox[1] THEN bbox[3] - bbox[1]
                             ELSE 360.0 - (bbox[1] - bbox[3]) END)
              * (sin(radians(bbox[4])) - sin(radians(bbox[2]))), 3) * 1000
              AS BIGINT) AS amk
  FROM read_parquet('{_fx_glob("stac_items")}')),
pair AS (
  SELECT g.gid,
         1.0 / ({IDW_EPS} + (p.cx - g.gx) * (p.cx - g.gx)
                + (p.cy - g.gy) * (p.cy - g.gy)) AS w,
         p.amk
  FROM pts p JOIN grid g
    ON (p.cx - g.gx) * (p.cx - g.gx)
       + (p.cy - g.gy) * (p.cy - g.gy) < {IDW_R2})
SELECT gid, CAST(count(*) AS BIGINT) AS n_src,
       round(CAST(sum(CAST(round(w * amk) AS BIGINT)) AS DOUBLE) * 1000.0
             / CAST(sum(CAST(round(w * 1000000.0) AS BIGINT)) AS DOUBLE),
             6) AS idw_km2_r
FROM pair GROUP BY gid
"""


# ------------------------------------------------------------- rasterization

RAST_K = 64          # z=6 raster: 64 x 64 global grid (4,096 cells)


def geo_rasterize_coverage(sf_dir: str):
    """Footprint RASTERIZATION: per z=6 grid cell, how many item bboxes
    COVER it (closed rect-intersect, whole footprint — not the centroid
    reduction the density/focal ops use).  The vector->raster burn-in
    op (coverage counts, mosaics, burn-in masks) that a naive engine
    writes as a cells-x-items range join.

    Scale shape: each batch scatters its bboxes onto a 2-D DIFFERENCE
    ARRAY (four np.add.at corner updates per bbox — O(rows), not
    O(rows x covered cells)) and integrates with two cumsums to a
    (64, 64) count grid, contracting IN BATCH to <= 4,096 partial rows;
    one ``small_domain_fold`` finishes.  Counts are exact int64 under
    any batching.  Antimeridian-wrapping boxes (w > e) are excluded on
    both sides (the covering_semijoin convention); degenerate s > n
    boxes cover nothing on either side.
    """
    p = _fx(sf_dir)
    return rasterize_from_dataset(clean_read_parquet(p["stac_items"],
                                                     columns=["bbox"]))


def rasterize_from_dataset(ds):
    """Rasterize core over any bbox Dataset (shared with the 20M-bbox
    scale probe in tools/scale_grid.py)."""
    from ..stages.util import small_domain_fold
    k = RAST_K

    def partial(batch: pa.Table) -> pa.Table:
        bb = _bbox_matrix(batch)
        w_, s_, e_, n_ = bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3]
        keep = (w_ <= e_) & (s_ <= n_)
        w_, s_, e_, n_ = w_[keep], s_[keep], e_[keep], n_[keep]
        kf = float(k)
        ix0 = np.minimum(np.floor((w_ + 180.0) / 360.0 * kf),
                         k - 1).astype(np.int64)
        ix1 = np.minimum(np.floor((e_ + 180.0) / 360.0 * kf),
                         k - 1).astype(np.int64)
        iy0 = np.minimum(np.floor((s_ + 90.0) / 180.0 * kf),
                         k - 1).astype(np.int64)
        iy1 = np.minimum(np.floor((n_ + 90.0) / 180.0 * kf),
                         k - 1).astype(np.int64)
        diff = np.zeros((k + 1, k + 1), dtype=np.int64)
        np.add.at(diff, (ix0, iy0), 1)
        np.add.at(diff, (ix1 + 1, iy0), -1)
        np.add.at(diff, (ix0, iy1 + 1), -1)
        np.add.at(diff, (ix1 + 1, iy1 + 1), 1)
        g = diff.cumsum(axis=0).cumsum(axis=1)[:k, :k]
        ii, jj = np.nonzero(g > 0)
        return pa.table({"ix": pa.array(ii.astype(np.int64)),
                         "iy": pa.array(jj.astype(np.int64)),
                         "n_cover": pa.array(g[ii, jj])})

    return small_domain_fold(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        keys=["ix", "iy"], sum_cols=["n_cover"])


def _geo_rasterize_coverage_sql() -> str:
    k, cmax = RAST_K, RAST_K - 1
    kf = float(RAST_K)
    return f"""
WITH rng AS (
  SELECT
    LEAST(CAST(floor((bbox[1] + 180.0) / 360.0 * {kf}) AS BIGINT), {cmax})
      AS ix0,
    LEAST(CAST(floor((bbox[3] + 180.0) / 360.0 * {kf}) AS BIGINT), {cmax})
      AS ix1,
    LEAST(CAST(floor((bbox[2] + 90.0) / 180.0 * {kf}) AS BIGINT), {cmax})
      AS iy0,
    LEAST(CAST(floor((bbox[4] + 90.0) / 180.0 * {kf}) AS BIGINT), {cmax})
      AS iy1
  FROM read_parquet('{_fx_glob("stac_items")}')
  WHERE bbox[1] <= bbox[3] AND bbox[2] <= bbox[4]),
cells AS (
  SELECT i % {k} AS ix, i // {k} AS iy FROM range({k * k}) t(i))
SELECT c.ix, c.iy, CAST(count(*) AS BIGINT) AS n_cover
FROM cells c JOIN rng r
  ON c.ix BETWEEN r.ix0 AND r.ix1 AND c.iy BETWEEN r.iy0 AND r.iy1
GROUP BY 1, 2
"""


# --------------------------------------------------------- spatial statistics

def geo_hotspot_zscore(sf_dir: str):
    """Getis-Ord-style HOTSPOT detection over the z=7 density grid: per
    occupied cell, the z-score of its Moore-neighborhood mean count
    against the global per-cell mean/std (empty cells count as zero in
    the global moments; a missing neighbor contributes 0 through the
    focal sum) — the spatial-statistics op class (Gi*-style local
    clustering: z >> 0 marks a hotspot embedded in a dense
    neighborhood, z < 0 a cold spot).

    Exactness contract: counts and the global moment sums S1 = sum n,
    S2 = sum n^2 are exact int64; the z expression is evaluated with
    the identical chain of IEEE double ops on both sides (two int->
    double divisions by the constant grid size, one sqrt, one final
    division) and rounded half-away to 6 dp once.

    Scale shape: rides ``focal_from_dataset`` — facts contract in-batch
    to the <= 4^7-cell grid, the stencil scatters on the CONTRACTED
    table, and the global moments come from the same grid-bounded
    table, so the driver never holds more than 16,384 rows.
    """
    import pandas as pd
    p = _fx(sf_dir)
    occ = focal_from_dataset(_meta_read(p["stac_items"],
                                        columns=["bbox"])).to_pandas()
    n = occ["n"].to_numpy().astype(np.int64)
    s1 = int(n.sum())
    s2 = int((n * n).sum())
    G = float((1 << FOCAL_Z) * (1 << FOCAL_Z))
    mean = s1 / G
    sd = math.sqrt(s2 / G - mean * mean)
    z = (occ["nbr_sum"].to_numpy().astype(np.float64) / 9.0 - mean) / sd
    z_r = np.sign(z) * np.floor(np.abs(z) * 1e6 + 0.5) / 1e6  # half-away
    return pa.table({"ix": pa.array(occ["ix"].to_numpy(), pa.int64()),
                     "iy": pa.array(occ["iy"].to_numpy(), pa.int64()),
                     "n": pa.array(occ["n"].to_numpy(), pa.int64()),
                     "gi_z_r": pa.array(z_r)})


def _geo_hotspot_zscore_sql() -> str:
    g = float((1 << FOCAL_Z) * (1 << FOCAL_Z))
    mean = f"CAST(g.s1 AS DOUBLE) / {g}"
    return f"""
WITH c AS (
  SELECT LEAST(CAST(floor(((bbox[1] + bbox[3]) / 2 + 180.0) / 360.0 * 128.0)
               AS BIGINT), 127) AS ix,
         LEAST(CAST(floor(((bbox[2] + bbox[4]) / 2 + 90.0) / 180.0 * 128.0)
               AS BIGINT), 127) AS iy,
         CAST(count(*) AS BIGINT) AS n
  FROM read_parquet('{_fx_glob("stac_items")}')
  WHERE bbox[1] <= bbox[3]
  GROUP BY 1, 2),
f AS (
  SELECT a.ix, a.iy, a.n, CAST(sum(b.n) AS BIGINT) AS nbr_sum
  FROM c a JOIN c b ON abs(a.ix - b.ix) <= 1 AND abs(a.iy - b.iy) <= 1
  GROUP BY 1, 2, 3),
g AS (
  SELECT CAST(sum(n) AS BIGINT) AS s1, CAST(sum(n * n) AS BIGINT) AS s2
  FROM c)
SELECT f.ix, f.iy, f.n,
       round((CAST(f.nbr_sum AS DOUBLE) / 9.0 - {mean})
             / sqrt(CAST(g.s2 AS DOUBLE) / {g} - ({mean}) * ({mean})),
             6) AS gi_z_r
FROM f, g
"""


def geo_convex_hull(sf_dir: str):
    """Per-collection CONVEX HULL of footprint corners — the coverage-
    extent summary (minimal bounding polygon) of each catalog
    collection: vertex count and exact doubled shoelace area in
    micro-degree² fixed point.

    Distributed shape: hull(A ∪ B) == hull(hull(A) ∪ hull(B)), so each
    batch contracts EXACTLY to its per-collection local hull vertices —
    a vectorized Akl–Toussaint octagon prune (comparisons only) drops
    the interior before the O(survivors) monotone chain — and the
    global fold runs a final chain per collection over O(#batches ×
    hull size) candidates.  Nothing quadratic, nothing float: corners
    quantize ONCE to int64 micro-degrees (the quantize_rects grain
    shared with the union-area golden) and every orientation test is
    an exact integer cross product, so the vertex set and area admit
    exactly one correct answer under ANY batching (geo/hull.py pins
    the strict-turn convention: collinear edge points are not
    vertices).

    Oracle: golden parquet — an independent straight-line scalar chain
    over every corner, no pruning, no shared hull code (DuckDB cannot
    express convex hulls without a spatial extension).
    """
    p = _fx(sf_dir)
    return convex_hull_from_dataset(clean_read_parquet(
        p["stac_items"], columns=["collection_id", "bbox"]))


def convex_hull_from_dataset(ds):
    """Convex-hull core over any (collection_id, bbox) Dataset
    (shared with the 20M-bbox scale probe in tools/scale_grid.py)."""
    import pandas as pd

    from ..geo.hull import akl_toussaint_mask, convex_hull_int, shoelace2
    from ..stages.footprint import quantize_rects
    from ..stages.util import table_from_pandas

    def corners(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"collection_id": pa.array([], pa.string()),
                             "x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        cid = batch["collection_id"].to_pandas().to_numpy()
        r = quantize_rects(np.stack(
            batch["bbox"].to_numpy(zero_copy_only=False)))
        w, s, e, n = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
        x = np.concatenate([w, e, w, e])
        y = np.concatenate([s, s, n, n])
        c = np.tile(cid, 4)
        keep_c, keep_x, keep_y = [], [], []
        for u in pd.unique(c):
            m = c == u
            xu, yu = x[m], y[m]
            at = akl_toussaint_mask(xu, yu)
            hull = convex_hull_int(xu[at], yu[at])
            keep_c.append(np.repeat(u, len(hull)))
            keep_x.append(hull[:, 0])
            keep_y.append(hull[:, 1])
        return pa.table({
            "collection_id": pa.array(np.concatenate(keep_c), pa.string()),
            "x": pa.array(np.concatenate(keep_x), pa.int64()),
            "y": pa.array(np.concatenate(keep_y), pa.int64())})

    cands = ds.map_batches(corners, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        hull = convex_hull_int(g["x"].to_numpy(), g["y"].to_numpy())
        return pd.DataFrame({
            "collection_id": [g["collection_id"].iloc[0]],
            "hull_nv": pd.Series([len(hull)], dtype="int64"),
            "hull_area2": pd.Series([shoelace2(hull)], dtype="int64")})

    return cands.groupby("collection_id").map_groups(
        lambda g: table_from_pandas(fold(g)), batch_format="pandas")


def geo_polygonize(sf_dir: str):
    """RASTER -> VECTOR (polygonize): connected coverage REGIONS of the
    z=6 rasterized footprint mosaic — per 4-connected component of
    covered cells, a canonical region id (min cell code), cell count,
    bounding cell rectangle and total coverage weight.  The inverse of
    geo_rasterize_coverage; together they close the north rule's
    raster<->vector pair (mask vectorization, coverage dissolve to
    region outlines).

    Scale shape: the heavy side is the rasterization, which contracts
    each batch to <= k^2 difference-array rows and folds exactly
    (small_domain_fold); the component pass then runs ONCE on the
    folded O(k^2)-cell mask — bounded by the RASTER RESOLUTION, not
    the input size, so it is deliberately a single task (union-find
    with path halving over occupied cells, vectorized searchsorted
    neighbor lookup — stages/footprint.polygonize_cells).  A finer
    grid tiles the mask and merges labels across tile edges (the
    label-propagation machinery the dedup clusters already use); at
    z=6 that would be pure overhead.

    Oracle: golden parquet — an independent scalar BFS flood fill over
    a dense replayed grid.
    """
    p = _fx(sf_dir)
    return polygonize_from_dataset(clean_read_parquet(
        p["stac_items"], columns=["bbox"]))


def polygonize_from_dataset(ds):
    """Polygonize core over any bbox Dataset (shared with the 20M-bbox
    scale probe in tools/scale_grid.py)."""
    from ..stages.footprint import polygonize_cells
    grid = rasterize_from_dataset(ds)

    def vectorize(batch: pa.Table) -> pa.Table:
        out = polygonize_cells(
            batch["ix"].to_numpy(zero_copy_only=False),
            batch["iy"].to_numpy(zero_copy_only=False),
            batch["n_cover"].to_numpy(zero_copy_only=False), RAST_K)
        return pa.table({
            "region_id": pa.array(out[:, 0], pa.int64()),
            "n_cells": pa.array(out[:, 1], pa.int64()),
            "ix_min": pa.array(out[:, 2], pa.int64()),
            "ix_max": pa.array(out[:, 3], pa.int64()),
            "iy_min": pa.array(out[:, 4], pa.int64()),
            "iy_max": pa.array(out[:, 5], pa.int64()),
            "cover_sum": pa.array(out[:, 6], pa.int64())})

    # the fold output is ONE block (small_domain_fold contract) — but
    # dynamic block splitting may cut an over-target-size fold block
    # (forced-tiny-blocks caught events_dense_hourly's grid being
    # consumed per split), so pin it back to one block before handing
    # the whole mask to a single vectorize task
    return grid.repartition(1).map_batches(vectorize,
                                           batch_format="pyarrow",
                                           batch_size=None)


# --------------------------------------------------------- grid DBSCAN

DBSCAN_EPS_U = 600_000      # 0.3 deg in DOUBLED micro-degrees
DBSCAN_MIN_PTS = 4


def geo_dbscan(sf_dir: str):
    """DENSITY-BASED SPATIAL CLUSTERING (DBSCAN, Ester et al. 1996)
    over item footprint centroids: per item its role (core / border /
    noise) and cluster id (min core item of its component, -1 noise) —
    the acquisition-density segmentation op (imaging campaigns, urban
    vs remote coverage, hotspot extraction).

    Coordinates are exact integers: each bbox quantizes once to
    micro-degrees (quantize_rects, shared grain) and the centroid is
    kept DOUBLED (qw+qe, qs+qn) so no halving ever loses a bit; eps
    lives in the same doubled space and every neighborhood test is an
    integer d^2 <= eps^2.  The full pinned semantics (closed
    neighborhood, min-core-pid labels, deterministic border
    assignment) live in stages/dbscan.py.

    Scale shape: cell-grid replicate (9x, 24 B/row) -> one shuffle by
    cell-hash bucket -> vectorized in-group sweep; degrees and border
    labels ride sorted_combine; components through the standard
    driver-UF / distributed size switch.  Nothing all-pairs; the dense
    -cell caveat and its contraction fix are documented in the stage.

    Oracle: golden parquet — an independent plane-sweep neighbor
    search (sort by x, windowed scan; no grid, no buckets) + scalar
    union-find, replaying the same pinned conventions.
    """
    from ..stages.dbscan import dbscan
    from ..stages.footprint import quantize_rects
    p = _fx(sf_dir)
    ds = clean_read_parquet(p["stac_items"], columns=["image_id", "bbox"])

    def to_points(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"pid": pa.array([], pa.int64()),
                             "px": pa.array([], pa.int64()),
                             "py": pa.array([], pa.int64())})
        pid = np.array([int(s[4:]) for s in
                        batch["image_id"].to_pylist()], dtype=np.int64)
        r = quantize_rects(np.stack(
            batch["bbox"].to_numpy(zero_copy_only=False)))
        return pa.table({"pid": pa.array(pid),
                         "px": pa.array(r[:, 0] + r[:, 2]),
                         "py": pa.array(r[:, 1] + r[:, 3])})

    pts = ds.map_batches(to_points, batch_format="pyarrow")
    return dbscan(pts, DBSCAN_EPS_U, DBSCAN_MIN_PTS)


# --------------------------------------------- global spatial autocorrelation

def geo_morans_i(sf_dir: str):
    """GLOBAL MORAN'S I spatial autocorrelation of the z=7 density grid
    (Moore contiguity, binary weights, ALL 4^z cells — empty cells
    carry count 0 and a genuine negative deviation): the single-number
    "is density spatially clustered?" statistic that complements
    geo_hotspot_zscore's per-cell local Gi*.  I >> 0 = clustered,
    I ~ -1/(N-1) = random, I < 0 = dispersed.

    Exactness contract: with integer deviations d_i = G·n_i - S1 (G =
    cell count, S1 = total points; x_i - x̄ = d_i / G), both the pair
    numerator Σ_ij w_ij·d_i·d_j and the variance denominator Σ_i d_i²
    are EXACT integers, and the G² factors cancel in I = (N/W)·num/den,
    so one identical double division on both sides decides the rounded
    output.  The empty-cell contributions are folded in ANALYTICALLY —
    num = G²·A - G·S1·B + S1²·W and den = Σ_occ d² + (G - occ)·S1²
    with A = Σ n_i·(nbrsum_i - n_i) (exclusive neighbor products) and
    B = 2·Σ deg_i·n_i (deg from the grid geometry) — so the engine
    touches ONLY the contracted occupied-cell table.

    Scale shape: rides focal_from_dataset (per-batch contraction to
    the ≤ 4^z grid, sorted_combine fold, 9-point scatter on the
    CONTRACTED table); every sum above is over occupied cells, and the
    Python-int combine is exact at any corpus size (int64 would
    overflow past ~2e19 in num).

    Oracle: full SQL — dense grid via range(), deviations as HUGEINT,
    the 8-offset equi-join for the pair sum, identical final division.
    """
    p = _fx(sf_dir)
    occ = focal_from_dataset(_meta_read(p["stac_items"],
                                        columns=["bbox"])).to_pandas()
    side = 1 << FOCAL_Z
    G = side * side
    W = 4 * side * (side - 1) + 4 * (side - 1) * (side - 1)
    ix = occ.ix.to_numpy(dtype=np.int64)
    iy = occ.iy.to_numpy(dtype=np.int64)
    n = occ.n.to_numpy(dtype=np.int64)
    nbr = occ.nbr_sum.to_numpy(dtype=np.int64)
    s1 = int(n.sum())
    # per-occupied-cell Moore degree from the grid geometry
    nx = (np.minimum(ix + 1, side - 1) - np.maximum(ix - 1, 0) + 1)
    ny = (np.minimum(iy + 1, side - 1) - np.maximum(iy - 1, 0) + 1)
    deg = nx * ny - 1
    A = int((n * (nbr - n)).sum())          # Σ_ord x_i·x_j over pairs
    B = 2 * int((deg * n).sum())            # Σ_ord (x_i + x_j)
    num = G * G * A - G * s1 * B + s1 * s1 * W      # exact Python int
    d_occ = G * n.astype(object) - s1
    den = int(sum(int(d) * int(d) for d in d_occ)) \
        + (G - len(n)) * s1 * s1
    i_val = (float(G) * float(num)) / (float(W) * float(den)) \
        if den != 0 else float("nan")
    i_r = float(np.sign(i_val) * np.floor(abs(i_val) * 1e6 + 0.5) / 1e6) \
        if den != 0 else None
    return pa.table({"n_cells": pa.array([G], pa.int64()),
                     "w_pairs": pa.array([W], pa.int64()),
                     "s1": pa.array([s1], pa.int64()),
                     "i_r": pa.array([i_r], pa.float64())})


def _geo_morans_i_sql() -> str:
    side = 1 << FOCAL_Z
    G = side * side
    W = 4 * side * (side - 1) + 4 * (side - 1) * (side - 1)
    return f"""
WITH c AS (
  SELECT LEAST(CAST(floor(((bbox[1] + bbox[3]) / 2 + 180.0) / 360.0
               * {float(side)}) AS BIGINT), {side - 1}) AS ix,
         LEAST(CAST(floor(((bbox[2] + bbox[4]) / 2 + 90.0) / 180.0
               * {float(side)}) AS BIGINT), {side - 1}) AS iy,
         CAST(count(*) AS BIGINT) AS n
  FROM read_parquet('{_fx_glob("stac_items")}')
  WHERE bbox[1] <= bbox[3]
  GROUP BY 1, 2),
tot AS (SELECT CAST(coalesce(sum(n), 0) AS HUGEINT) AS s1 FROM c),
cells AS (SELECT i % {side} AS ix, i // {side} AS iy
          FROM range({G}) t(i)),
g AS (
  SELECT cells.ix, cells.iy,
         CAST({G} AS HUGEINT) * CAST(coalesce(c.n, 0) AS HUGEINT)
             - tot.s1 AS d
  FROM cells LEFT JOIN c ON c.ix = cells.ix AND c.iy = cells.iy
  CROSS JOIN tot),
off AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
                              (0,1),(1,-1),(1,0),(1,1)) o(dx, dy)),
num AS (
  SELECT sum(a.d * b.d) AS v
  FROM g a CROSS JOIN off
  JOIN g b ON b.ix = a.ix + off.dx AND b.iy = a.iy + off.dy),
den AS (SELECT sum(d * d) AS v FROM g)
SELECT CAST({G} AS BIGINT) AS n_cells, CAST({W} AS BIGINT) AS w_pairs,
       CAST(tot.s1 AS BIGINT) AS s1,
       round((CAST({G} AS DOUBLE) * CAST(num.v AS DOUBLE))
             / (CAST({W} AS DOUBLE) * CAST(den.v AS DOUBLE)), 6) AS i_r
FROM tot, num, den
"""


# ------------------------------------------------------- mosaic pick

def geo_mosaic_pick(sf_dir: str):
    """MOSAIC COMPOSITING RULE — per occupied z=7 grid cell (centroid
    binning, the focal/hotspot convention), the MOST RECENT item
    (latest datetime, lexicographically-greatest item_id on ties) plus
    the candidate count: the "latest-on-top" selection a tile-serving
    / mosaicking pipeline runs per output cell, the argmax JOIN the
    plain cell rollups stop short of.

    Determinism contract: the winner rides argmax-by-ENCODING (the
    events_mode_type trick) — ISO-8601 datetimes are fixed-width, so
    ``datetime || '|' || item_id`` orders exactly by (datetime,
    item_id) and a plain string MAX is reassociative: exact under any
    batching, no per-group sort anywhere.

    Scale shape: per-batch partials contract to the ≤ 4^z occupied
    cells (one encoded max + one count per cell); the fold is
    sorted_combine's max|sum path (weak contraction — every batch
    touches much of the grid, the focal/rasterize lesson); the split
    back into (datetime, item_id) runs on the output-sized cell table.

    Oracle: full SQL — identical encoded max, split_part read-off.
    """
    import pandas as pd
    p = _fx(sf_dir)
    from ..stages.util import sorted_combine
    ds = _meta_read(p["stac_items"],
                    columns=["item_id", "bbox", "datetime"])
    side = 1 << FOCAL_Z

    def partial(batch: pa.Table) -> pa.Table:
        bb = _bbox_matrix(batch)
        ix, iy, keep = _grid_ixiy(bb, FOCAL_Z)
        iid = batch["item_id"].to_pandas().to_numpy()[keep]
        dt = batch["datetime"].to_pandas().to_numpy()[keep]
        # the encoded-max contract needs a separator-free id: the SQL
        # side reads it back with split_part (review finding — an id
        # containing '|' would silently diverge between the sides)
        if len(iid) and (np.char.find(iid.astype(str), "|") >= 0).any():
            raise ValueError("geo_mosaic_pick: item_id contains the "
                             "'|' encoding separator")
        df = pd.DataFrame({"ix": ix[keep], "iy": iy[keep],
                           "enc": dt + "|" + iid})
        g = df.groupby(["ix", "iy"], sort=False).agg(
            best=("enc", "max"), n_items=("enc", "size")).reset_index()
        g["n_items"] = g.n_items.astype("int64")
        return table_from_pandas(g, preserve_index=False)

    cells = sorted_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["ix", "iy"], aggs={"best": "max", "n_items": "sum"})

    def split(batch: pa.Table) -> pa.Table:
        enc = batch["best"].to_pandas()
        parts = enc.str.split("|", n=1, expand=True)
        return pa.table({
            "ix": pc.cast(batch["ix"], pa.int64()),
            "iy": pc.cast(batch["iy"], pa.int64()),
            "item_datetime": pa.array(parts[0], pa.string()),
            "item_id": pa.array(parts[1], pa.string()),
            "n_items": pc.cast(batch["n_items"], pa.int64())})

    return cells.map_batches(split, batch_format="pyarrow")


def _geo_mosaic_pick_sql() -> str:
    side = 1 << FOCAL_Z
    return f"""
WITH c AS (
  SELECT LEAST(CAST(floor(((bbox[1] + bbox[3]) / 2 + 180.0) / 360.0
               * {float(side)}) AS BIGINT), {side - 1}) AS ix,
         LEAST(CAST(floor(((bbox[2] + bbox[4]) / 2 + 90.0) / 180.0
               * {float(side)}) AS BIGINT), {side - 1}) AS iy,
         datetime || '|' || item_id AS enc
  FROM read_parquet('{_fx_glob("stac_items")}')
  WHERE bbox[1] <= bbox[3])
SELECT ix, iy,
       split_part(max(enc), '|', 1) AS item_datetime,
       split_part(max(enc), '|', 2) AS item_id,
       CAST(count(*) AS BIGINT) AS n_items
FROM c GROUP BY 1, 2
"""
