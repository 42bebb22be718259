"""stac_to_geocore_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch re-expression of the semantics of
Canadian-Geospatial-Platform/stac-to-geocore (reference snapshot at
/root/reference, 2024-08-07) as an idiomatic Ray Data pipeline over
Arrow tables of image + caption pairs, generalized per BASELINE.json:

- vectorized STAC-style footprint normalization (bbox -> ring/WKT,
  reference quirks preserved in a compat path),
- H3-style hex + S2 cell encoding over zero-copy Arrow batches,
- STRtree point-in-polygon broadcast join and hex kNN ring search as
  actor-pool stages,
- raster->vector tiling with groupby-on-cell-prefix shuffles and
  salted-key skew splitting,
- pHash / MinHash / SimHash / embedding dedup, ANN similarity search,
  text analysis stages for training-data pipelines,
- per-partition lineage manifests for resumable writes.

No module in this package calls ray.init(); sessions are owned by the
caller (bench.py, CLI, test fixtures).
"""

__version__ = "0.1.0"
