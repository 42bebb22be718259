"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here
(or in stac_to_geocore_ray) calls ray.init()/ray.shutdown().

- ``entry()``: flagship metadata pipeline (footprint -> S2/hex cells ->
  STRtree PIP broadcast join -> hex kNN) over the sf0.001 fixtures.
- ``queries()``: one entry per implemented operator/pipeline from
  SURVEY.md §2 plus the training-data addenda (dedup, ANN, text).
- ``oracle_sql()``: DuckDB equivalents for the SQL-expressible subset;
  fixture tables are referenced by absolute parquet path (generated
  deterministically on first use, cached under /tmp/stgr_fixtures).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from stac_to_geocore_ray import queries as _q


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (rows >= 0, stable schema)."""
    from stac_to_geocore_ray.pipelines.flagship import metadata_pipeline
    return metadata_pipeline("/root/testdata/sf0.001", concurrency=2)


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return _q.oracle()
