"""Data-quality validation leg: multi-table constraint report.

The production guard a 100-TB ingest runs BEFORE anything downstream
trusts the data: null/range/temporal-consistency checks as fused
per-table streaming passes, referential integrity as broadcast-set
membership (dim side) or a distributed anti join (fact-fact side).
The reference validates per record at translate time
(/root/reference/stac-to-geocore/stac_to_geocore.py null/format guards);
this is the corpus-level generalization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.util import table_from_pandas
from ._common import _meta_read, _t

DQ_CHECKS = (
    "customer_negative_acctbal",
    "orders_orphan_custkey",
    "orders_future_date",
    "lineitem_orphan_orderkey",
    "lineitem_ship_before_order",
    "events_null_props",
    "docs_nchars_mismatch",
)

DQ_DATE_MAX = "1998-12-31"


def dq_validate(sf_dir: str):
    """CONSTRAINT-VALIDATION REPORT over five tables: one row per
    check, exact violation counts.

    Scale shape per check class:

    * **single-table scalar checks** (negative balances, out-of-range
      dates, nulls, derived-column consistency) fuse into ONE
      map_batches pass per table emitting a one-row counter partial per
      batch; the fold is ``Dataset.sum`` — output-sized driver traffic.
    * **fact -> dim referential** (orders.o_custkey ⊆ customer): the
      dim key set broadcasts once as a SORTED int64 array (``ray.put``;
      searchsorted membership per batch).  Past worker heap, swap the
      exact set for the blocked Bloom + exact-confirm template (q3's
      pre-filter, stages/sketch.BloomFilter) — a bloom MISS is a
      definite orphan, only passes need the confirm join.
    * **fact -> fact referential** (lineitem.l_orderkey ⊆ orders): the
      probe side contracts to per-batch DISTINCT keys first (~4x here),
      then ONE distributed left_anti hash join against the key column
      of orders — never a broadcast, never a driver set.
    * **cross-table row predicate** (l_shipdate < o_orderdate): a
      distributed hash join on the shared key, violation counting
      fused into the join's consumer batch map.

    All counts are exact (violations surface as driver-visible ints;
    the report is output-sized).  Zero-violation checks stay in the
    report — absence-of-row is not evidence of absence-of-check.
    """
    import ray
    import pyarrow.parquet as pq

    counts: dict[str, int] = {}

    # ---- customer: negative account balance (fused scalar pass)
    cust = _meta_read(_t(sf_dir, "customer"),
                      columns=["c_custkey", "c_acctbal"])

    def cust_partial(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy()
        return pa.table({"neg": pa.array([int((bal < 0).sum())],
                                         pa.int64())})

    counts["customer_negative_acctbal"] = int(
        cust.map_batches(cust_partial, batch_format="pyarrow")
        .sum("neg") or 0)

    # ---- orders: orphan custkey (broadcast sorted dim keys) +
    #      future order date, ONE fused pass
    ckeys = np.sort(pq.read_table(_t(sf_dir, "customer"),
                                  columns=["c_custkey"])
                    ["c_custkey"].to_numpy())
    ckeys_ref = ray.put(ckeys)
    date_max = np.datetime64(DQ_DATE_MAX)

    def orders_partial(batch: pa.Table, _ref=ckeys_ref) -> pa.Table:
        keys = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        ck = batch["o_custkey"].to_numpy()
        pos = np.searchsorted(keys, ck)
        pos_c = np.clip(pos, 0, len(keys) - 1)
        orphan = int((keys[pos_c] != ck).sum()) if len(keys) else len(ck)
        dates = batch["o_orderdate"].to_numpy().astype("datetime64[us]")
        future = int((dates > date_max).sum())
        return pa.table({"orphan": pa.array([orphan], pa.int64()),
                         "future": pa.array([future], pa.int64())})

    osum = _meta_read(_t(sf_dir, "orders"),
                      columns=["o_custkey", "o_orderdate"]) \
        .map_batches(orders_partial, batch_format="pyarrow") \
        .sum(["orphan", "future"])
    counts["orders_orphan_custkey"] = int(osum["sum(orphan)"] or 0)
    counts["orders_future_date"] = int(osum["sum(future)"] or 0)

    # ---- lineitem -> orders referential: distinct probe keys, then a
    #      distributed anti join (both sides fact-sized at 100 TB)
    li_keys = _meta_read(_t(sf_dir, "lineitem"), columns=["l_orderkey"])

    def distinct_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": pa.array(
            np.unique(batch["l_orderkey"].to_numpy()), pa.int64())})

    from ..stages.util import sorted_combine
    li_distinct = sorted_combine(
        li_keys.map_batches(distinct_partial, batch_format="pyarrow")
        .map_batches(lambda b: b.append_column(
            "one", pa.array(np.ones(len(b), np.int64))),
            batch_format="pyarrow"),
        keys=["l_orderkey"], aggs={"one": "min"})
    okeys = _meta_read(_t(sf_dir, "orders"), columns=["o_orderkey"])
    orphans = li_distinct.join(okeys, join_type="left_anti",
                               num_partitions=8, on=("l_orderkey",),
                               right_on=("o_orderkey",))
    counts["lineitem_orphan_orderkey"] = int(orphans.count())

    # ---- cross-table temporal consistency: ship date precedes order
    #      date (distributed hash join + fused violation count)
    li_dates = _meta_read(_t(sf_dir, "lineitem"),
                          columns=["l_orderkey", "l_shipdate"])
    o_dates = _meta_read(_t(sf_dir, "orders"),
                         columns=["o_orderkey", "o_orderdate"])
    joined = li_dates.join(o_dates, join_type="inner", num_partitions=8,
                           on=("l_orderkey",), right_on=("o_orderkey",))

    def ship_partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy().astype("datetime64[us]")
        od = batch["o_orderdate"].to_numpy().astype("datetime64[us]")
        return pa.table({"v": pa.array([int((ship < od).sum())],
                                       pa.int64())})

    counts["lineitem_ship_before_order"] = int(
        joined.map_batches(ship_partial, batch_format="pyarrow")
        .sum("v") or 0)

    # ---- events: null props (fused scalar pass)
    ev = _meta_read(_t(sf_dir, "events"), columns=["props"])

    def ev_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array(
            [int(batch["props"].null_count)], pa.int64())})

    counts["events_null_props"] = int(
        ev.map_batches(ev_partial, batch_format="pyarrow").sum("n") or 0)

    # ---- documents: derived-column consistency (n_chars == len(text))
    docs = _meta_read(_t(sf_dir, "documents"),
                      columns=["text", "n_chars"])

    def doc_partial(batch: pa.Table) -> pa.Table:
        ln = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
        bad = pc.not_equal(ln, batch["n_chars"])
        return pa.table({"n": pa.array(
            [int(pc.sum(bad).as_py() or 0)], pa.int64())})

    counts["docs_nchars_mismatch"] = int(
        docs.map_batches(doc_partial, batch_format="pyarrow")
        .sum("n") or 0)

    return pa.table({
        "check_name": pa.array(list(DQ_CHECKS), pa.string()),
        "n_violations": pa.array([counts[c] for c in DQ_CHECKS],
                                 pa.int64())})


DQ_VALIDATE_SQL = f"""
SELECT 'customer_negative_acctbal' AS check_name,
       count(*) AS n_violations FROM customer WHERE c_acctbal < 0
UNION ALL
SELECT 'orders_orphan_custkey', count(*) FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'orders_future_date', count(*) FROM orders
WHERE o_orderdate > TIMESTAMP '{DQ_DATE_MAX}'
UNION ALL
SELECT 'lineitem_orphan_orderkey', count(*) FROM (
  SELECT DISTINCT l_orderkey FROM lineitem) l
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem_ship_before_order', count(*)
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate < o.o_orderdate
UNION ALL
SELECT 'events_null_props', count(*) FROM events WHERE props IS NULL
UNION ALL
SELECT 'docs_nchars_mismatch', count(*) FROM documents
WHERE n_chars <> length(text)
"""


# ------------------------------------------------- k-anonymity audit

K_ANON = 5


def customer_k_anonymity(sf_dir: str):
    """K-ANONYMITY AUDIT over the customer table's quasi-identifier
    pair (nation, market segment): the privacy / re-identification
    check a governance pipeline runs before an export — every
    equivalence class smaller than k = 5 is a re-identification risk.
    One summary row: class count, violating-class count, rows at
    risk, and the smallest class size (the k the table actually
    satisfies).

    Scale shape: per-batch partials contract to the tiny QI domain
    (|nations| × |segments|), one small_domain_fold, and the audit
    scan runs on the output-sized class table.  dq_validate's
    multi-table report is the completeness sibling; this is the
    privacy one.

    Oracle: full SQL — the same grouped counts and summary.
    """
    import pandas as pd

    from ..stages.util import small_domain_fold
    from ._common import _meta_read, _t
    ds = _meta_read(_t(sf_dir, "customer"),
                    columns=["c_nationkey", "c_mktsegment"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["c_nationkey", "c_mktsegment"], sort=False) \
            .size().reset_index(name="n")
        g["n"] = g.n.astype("int64")
        return table_from_pandas(g, preserve_index=False)

    cls = small_domain_fold(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["c_nationkey", "c_mktsegment"], sum_cols=["n"]) \
        .to_pandas()
    viol = cls[cls.n < K_ANON]
    out = pd.DataFrame({
        "n_classes": [len(cls)],
        "n_violating": [len(viol)],
        "rows_at_risk": [int(viol.n.sum())],
        "min_class_size": [int(cls.n.min())],
        "k_required": [K_ANON]})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return table_from_pandas(out, preserve_index=False)


CUSTOMER_K_ANON_SQL = f"""
WITH cls AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(count(*) FILTER (n < {K_ANON}) AS BIGINT) AS n_violating,
       CAST(coalesce(sum(n) FILTER (n < {K_ANON}), 0) AS BIGINT)
           AS rows_at_risk,
       CAST(min(n) AS BIGINT) AS min_class_size,
       CAST({K_ANON} AS BIGINT) AS k_required
FROM cls
"""


# ---------------------------------------------------- column profiler

PROFILE_NUM_COLS = ("event_id", "user_id")


def events_profile(sf_dir: str):
    """COLUMN PROFILING (the Deequ / dbt-docs class): per profiled
    events column — row count, null count, EXACT distinct count, and
    numeric min/max — the table-of-contents stats a pipeline
    materializes before anyone writes a filter.  Numeric columns
    profile (event_id, user_id, value-as-cents); event_type profiles
    counts/distincts with NULL min/max (non-numeric).

    Scale shape: counts and min/max contract per batch to ONE row per
    column (sorted_combine's sum|min|max paths); the exact distinct
    count moves every distinct (column, value) pair through one sort
    — the honest cost of exactness (events_distinct_users' rule;
    events_hll_users/hll_overlap are the sketch alternative when the
    key domain itself is data-sized).

    Oracle: full SQL — per-column UNION ALL of the same aggregates.
    """
    import pandas as pd

    from ..stages.util import small_domain_fold, sorted_combine  # noqa: F401
    from ._common import _cents
    ds = _meta_read(_t(sf_dir, "events"),
                    columns=["event_id", "user_id", "event_type",
                             "value"])

    def stat_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["value_cents"] = _cents(df.value.to_numpy())
        rows = []
        for col in (*PROFILE_NUM_COLS, "value_cents"):
            v = df[col]
            nn = v.notna()
            rows.append((col, len(v), int((~nn).sum()),
                         int(v[nn].min()) if nn.any() else None,
                         int(v[nn].max()) if nn.any() else None))
        v = df["event_type"]
        rows.append(("event_type", len(v), int(v.isna().sum()),
                     None, None))
        out = pd.DataFrame(rows, columns=["column", "n", "n_null",
                                          "mn", "mx"])
        out["n"] = out.n.astype("int64")
        out["n_null"] = out.n_null.astype("int64")
        return table_from_pandas(out, preserve_index=False)

    # 4-key domain: a sorted_combine here shuffles ~200 mostly-empty
    # partitions (the lesson-30 tiny-domain rule) — one fold task
    # handles the O(#blocks x 4) partial rows instead
    def stats_fold(df: pd.DataFrame):
        g = df.groupby("column", as_index=False).agg(
            n=("n", "sum"), n_null=("n_null", "sum"),
            mn=("mn", "min"), mx=("mx", "max"))
        return table_from_pandas(g)

    stats = ds.map_batches(stat_partial, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(stats_fold, batch_format="pandas",
                     batch_size=None).to_pandas()

    def distinct_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["value_cents"] = _cents(df.value.to_numpy())
        cols, vals = [], []
        for col in (*PROFILE_NUM_COLS, "value_cents", "event_type"):
            u = df[col].dropna().astype(str).unique()
            cols.extend([col] * len(u))
            vals.extend(u)
        # typed arrow build: an all-null/empty batch would otherwise
        # infer a null-typed val column (executor schema warning)
        return pa.table({"column": pa.array(cols, pa.string()),
                         "val": pa.array(vals, pa.string()),
                         "one": pa.array(
                             np.ones(len(cols), np.int64))})

    dv = sorted_combine(
        ds.map_batches(distinct_partial, batch_format="pyarrow"),
        keys=["column", "val"], aggs={"one": "max"})

    def count_per_col(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("column", sort=False)["one"].sum() \
            .reset_index(name="n_distinct")
        g["n_distinct"] = g.n_distinct.astype("int64")
        return table_from_pandas(g, preserve_index=False)

    nd = small_domain_fold(dv.map_batches(count_per_col,
                                          batch_format="pyarrow"),
                           keys=["column"],
                           sum_cols=["n_distinct"]).to_pandas()
    out = stats.merge(nd, on="column")
    out = out.rename(columns={"mn": "min_v", "mx": "max_v"})
    out = out[["column", "n", "n_null", "n_distinct",
               "min_v", "max_v"]].sort_values("column") \
        .reset_index(drop=True)
    out["min_v"] = out.min_v.astype("float64")
    out["max_v"] = out.max_v.astype("float64")
    return table_from_pandas(out, preserve_index=False)


EVENTS_PROFILE_SQL = """
SELECT 'event_id' AS "column", CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
       CAST(min(event_id) AS DOUBLE) AS min_v,
       CAST(max(event_id) AS DOUBLE) AS max_v
FROM events
UNION ALL
SELECT 'user_id', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(user_id) AS BIGINT),
       CAST(count(DISTINCT user_id) AS BIGINT),
       CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE)
FROM events
UNION ALL
SELECT 'value_cents', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(value) AS BIGINT),
       CAST(count(DISTINCT CAST(round(value * 100) AS BIGINT))
            AS BIGINT),
       CAST(min(CAST(round(value * 100) AS BIGINT)) AS DOUBLE),
       CAST(max(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
FROM events
UNION ALL
SELECT 'event_type', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(event_type) AS BIGINT),
       CAST(count(DISTINCT event_type) AS BIGINT),
       NULL, NULL
FROM events
"""
