"""Relational-leg measured scale run — the fifth and last leg of the
measured-scale program (images proved at sf1.0 = 1M, text at 1M docs,
events at 20M/100M, embeddings at 1M x 64; this proves the NINE
TPC-H-shape relational queries at ~30x the bench fixture: 18M lineitem
/ 4.5M orders / 450k customers / 600k parts).

The star schema is synthesized deterministically (per-shard seeds over
a FIXED shard layout) with every value domain SAMPLED FROM THE sf0.1
FIXTURE (categorical uniques, date spans, numeric ranges), so every
query predicate keeps its fixture selectivity at scale:

- lineitems-per-order ~ Poisson(4) (fixture shape: 0..17, mean 4) —
  q18's HAVING sum(qty) > 300 stays a genuine ~1e-4 survivor filter;
- orders-per-customer stays ~10, so q13's zero-URGENT-order customer
  bucket stays populated (~10%) and the left-outer branch does work;
- l_shipdate = o_orderdate + U{1..120} days, so q12's 1997 ship window
  and q4's 1996-Q1 order window keep interior selectivity.

--check runs DuckDB over the SAME generated files and value-compares
every query (the verify_queries comparator), so this is a
scale-CORRECTNESS sweep, not just a timing run.

Usage:
    python tools/scale_tpch.py [out_dir] [--mult 30]        # generate
    python tools/scale_tpch.py [out_dir] --run [--check]    # measure

Owns its Ray session (like bench.py); not imported by __ray_entry__.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SEED = 0x79C4
FIX = "/root/testdata/sf0.1"
ORD_SHARD = 500_000              # orders per shard (~2M lineitems)
DAY_US = 86_400_000_000

RELATIONAL = ["q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
              "q4_order_priority", "q12_priority_by_returnflag",
              "q13_customer_distribution", "q17_small_qty_revenue",
              "q18_large_volume_customers", "parts_never_bulk_ordered",
              "q2_min_cost_part", "q21_late_sole_supplier",
              "q22_sales_opportunity",
              "q6_forecast_revenue", "q14_promo_revenue",
              "q19_disjunctive_revenue", "q7_volume_shipping",
              "q8_market_share", "q9_product_profit",
              "q10_returned_items", "q15_top_supplier",
              "q11_important_parts", "q16_supplier_count",
              "q20_excess_shippers",
              "graph_triangles", "graph_pagerank",
              "bloom_semijoin", "skyline_parts",
              "market_basket_pairs", "customer_fuzzy_pairs"]


def _domains() -> dict:
    """Empirical value domains from the sf0.1 fixture (tiny reads)."""
    li = pq.read_table(os.path.join(FIX, "lineitem.parquet"),
                       columns=["l_returnflag", "l_linestatus"])
    orders = pq.read_table(os.path.join(FIX, "orders.parquet"),
                           columns=["o_orderstatus", "o_orderpriority",
                                    "o_orderdate", "o_totalprice"])
    cust = pq.read_table(os.path.join(FIX, "customer.parquet"),
                         columns=["c_mktsegment"])
    part = pq.read_table(os.path.join(FIX, "part.parquet"),
                         columns=["p_name", "p_brand", "p_type"])
    od = orders["o_orderdate"].to_numpy().astype("datetime64[us]").astype("int64")
    return {
        "rflag": np.unique(li["l_returnflag"]).astype(object),
        "lstat": np.unique(li["l_linestatus"]).astype(object),
        "ostat": np.unique(orders["o_orderstatus"]).astype(object),
        "oprio": np.unique(orders["o_orderpriority"]).astype(object),
        "seg": np.unique(cust["c_mktsegment"]).astype(object),
        "pname": np.unique(part["p_name"]).astype(object),
        "brand": np.unique(part["p_brand"]).astype(object),
        "ptype": np.unique(part["p_type"]).astype(object),
        "od_lo": int(od.min()), "od_hi": int(od.max()),
        "tp_lo": float(np.min(orders["o_totalprice"].to_numpy())),
        "tp_hi": float(np.max(orders["o_totalprice"].to_numpy())),
    }


def _pick(rng, dom, n):
    return pa.array(dom[rng.integers(0, len(dom), n)], pa.string())


def _gen_dims(out: str, mult: int, dom: dict) -> dict:
    rng = np.random.default_rng(SEED)
    n_cust, n_part, n_supp = 15_000 * mult, 20_000 * mult, 1_000 * mult
    cust = pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)],
                           pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-999.99, 9999.99, n_cust), 2)),
        "c_mktsegment": _pick(rng, dom["seg"], n_cust)})
    pq.write_table(cust, os.path.join(out, "customer.parquet"))
    part = pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": _pick(rng, dom["pname"], n_part),
        "p_brand": _pick(rng, dom["brand"], n_part),
        "p_type": _pick(rng, dom["ptype"], n_part),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900.0, 999.9, n_part), 2))})
    pq.write_table(part, os.path.join(out, "part.parquet"))
    supp = pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)],
                           pa.string()),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-999.99, 9999.99, n_supp), 2))})
    pq.write_table(supp, os.path.join(out, "supplier.parquet"))
    for t in ("nation", "region"):
        pq.write_table(pq.read_table(os.path.join(FIX, f"{t}.parquet")),
                       os.path.join(out, f"{t}.parquet"))
    return {"n_cust": n_cust, "n_part": n_part, "n_supp": n_supp}


def _gen_fact_shard(out: str, shard: int, lo: int, hi: int,
                    dims: dict, dom: dict) -> int:
    """One orders shard + its lineitems (same seed stream, so
    l_shipdate can reference the order's date without a join)."""
    rng = np.random.default_rng(SEED + 7_919 * (shard + 1))
    m = hi - lo
    okeys = np.arange(lo, hi, dtype=np.int64)
    odate = rng.integers(dom["od_lo"], dom["od_hi"] + 1, m)
    orders = pa.table({
        "o_orderkey": pa.array(okeys),
        "o_custkey": pa.array(rng.integers(0, dims["n_cust"], m)),
        "o_orderstatus": _pick(rng, dom["ostat"], m),
        "o_totalprice": pa.array(np.round(
            rng.uniform(dom["tp_lo"], dom["tp_hi"], m), 2)),
        "o_orderdate": pa.array(odate.astype("datetime64[us]")),
        "o_orderpriority": _pick(rng, dom["oprio"], m)})
    pq.write_table(orders, os.path.join(out, "orders.parquet",
                                        f"part-{shard:05d}.parquet"))
    cnt = rng.poisson(4.0, m).clip(0, 20)
    k = int(cnt.sum())
    l_okey = np.repeat(okeys, cnt)
    # within-order line numbers: position minus each order's start offset
    starts = np.repeat(np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
    lnum = (np.arange(k) - starts + 1).astype(np.int32)
    ship = np.repeat(odate, cnt) + rng.integers(1, 121, k) * DAY_US
    li = pa.table({
        "l_orderkey": pa.array(l_okey),
        "l_partkey": pa.array(rng.integers(0, dims["n_part"], k)),
        "l_suppkey": pa.array(rng.integers(0, dims["n_supp"], k)),
        "l_linenumber": pa.array(lnum),
        "l_quantity": pa.array(rng.integers(1, 51, k).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900.0, 105_000.0, k), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0.0, 0.10, k), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0.0, 0.08, k), 2)),
        "l_returnflag": _pick(rng, dom["rflag"], k),
        "l_linestatus": _pick(rng, dom["lstat"], k),
        "l_shipdate": pa.array(ship.astype("datetime64[us]"))})
    pq.write_table(li, os.path.join(out, "lineitem.parquet",
                                    f"part-{shard:05d}.parquet"))
    return k


def generate(out: str, mult: int) -> None:
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f).get("mult") == mult:
                print(f"fixture already complete at {out}")
                return
        raise SystemExit(f"{out} holds a DIFFERENT mult; remove it first")
    os.makedirs(os.path.join(out, "orders.parquet"), exist_ok=True)
    os.makedirs(os.path.join(out, "lineitem.parquet"), exist_ok=True)
    t0 = time.time()
    dom = _domains()
    dims = _gen_dims(out, mult, dom)
    n_orders = 150_000 * mult
    n_li = 0
    for shard, lo in enumerate(range(0, n_orders, ORD_SHARD)):
        n_li += _gen_fact_shard(out, shard, lo,
                                min(lo + ORD_SHARD, n_orders), dims, dom)
        print(f"  shard {shard}: orders {lo}..{min(lo+ORD_SHARD, n_orders)}, "
              f"lineitem total {n_li}", flush=True)
    with open(marker, "w") as f:
        json.dump({"mult": mult, "n_orders": n_orders, "n_lineitem": n_li,
                   **dims, "gen_sec": round(time.time() - t0, 1)}, f)
    print(f"generated {out}: {n_li} lineitems / {n_orders} orders "
          f"in {time.time()-t0:.0f}s")


def run(out: str, check: bool, only: list[str] | None) -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from stac_to_geocore_ray import queries as q
    from verify_queries import to_pandas, compare  # noqa: E501  (tools/ sibling)

    names = only or RELATIONAL
    oracle = q.oracle()
    # warm the worker pool once so per-query times are engine, not spawn
    import ray.data as rd
    rd.read_parquet(os.path.join(out, "orders.parquet"),
                    columns=["o_orderkey"]).count()
    report, results = {}, {}
    for name in names:
        t0 = time.time()
        results[name] = to_pandas(q.QUERIES[name](out))
        report[name] = round(time.time() - t0, 2)
        print(f"  {name:30s} {report[name]:7.2f}s  {len(results[name])} rows",
              flush=True)
    status = {}
    if check:
        import duckdb
        con = duckdb.connect()
        for t in ("region nation customer supplier part orders "
                  "lineitem").split():
            p = os.path.join(out, f"{t}.parquet")
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.sql(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{pat}')")
        for name in names:
            t0 = time.time()
            ref = con.sql(oracle[name]).df()
            verdict = compare(name, results[name], ref)
            status[name] = verdict
            print(f"  {name:30s} {verdict}  (duckdb {time.time()-t0:.1f}s)",
                  flush=True)
    with open(os.path.join(out, "_COMPLETE")) as f:
        meta = json.load(f)
    print(json.dumps({"fixture": out, "n_lineitem": meta["n_lineitem"],
                      "n_orders": meta["n_orders"],
                      "engine_sec": report, "check": status or None}))
    ray.shutdown()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out = args[0] if args and not args[0].startswith("--") \
        else "/tmp/stgr_scale/tpch30x"
    mult = 30
    if "--mult" in args:
        mult = int(args[args.index("--mult") + 1])
    only = None
    if "--queries" in args:
        only = args[args.index("--queries") + 1].split(",")
    if "--run" in args:
        run(out, check="--check" in args, only=only)
    else:
        generate(out, mult)


if __name__ == "__main__":
    main()
