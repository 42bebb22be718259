"""Local stand-in for the driver's correctness gate.

Runs every queries() entry at the given sf against its oracle_sql()
via DuckDB (views registered like the driver does), compares row count,
sorted-column schema, and order-insensitive values.  Usage:

    python tools/verify_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data as rd
        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        if str(df[c].dtype) in ("int32", "uint32", "int16", "uint64"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, mine: pd.DataFrame, theirs: pd.DataFrame) -> str:
    if len(mine) != len(theirs):
        return f"ROWS {len(mine)} vs {len(theirs)}"
    a, b = canon(mine), canon(theirs)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            ok = np.allclose(a[c].astype(float), b[c].astype(float),
                             rtol=0, atol=1e-9, equal_nan=True)
        else:
            ok = a[c].equals(b[c])
        if not ok:
            diff = (a[c] != b[c])
            idx = diff[diff].index[:3].tolist()
            detail = [(a[c].iloc[i], b[c].iloc[i]) for i in idx]
            return f"VALUES col={c} n_diff={int(diff.sum())} e.g. {detail}"
    return "OK"


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    skip = set()
    if "--skip" in argv:
        i = argv.index("--skip")
        skip = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:]) - skip
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    # GRAFT_TINY_BLOCKS=<bytes>: force pathologically small blocks so
    # every operator's block-boundary handling (keys straddling
    # blocks, empty blocks, single-row blocks) is exercised
    # registry-wide — the forced-tiny-block robustness sweep.
    tiny = os.environ.get("GRAFT_TINY_BLOCKS")
    if tiny:
        DataContext.get_current().target_max_block_size = int(tiny)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracle = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    results = {}
    for name, fn in qs.items():
        if (only and name not in only) or name in skip:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception:
            results[name] = "ENGINE-ERROR"
            print(f"{name:28s} ENGINE-ERROR {traceback.format_exc(limit=4)}")
            continue
        wall = time.time() - t0
        if name not in oracle:
            results[name] = f"rows-only ({len(mine)} rows)"
            print(f"{name:28s} rows-only  {len(mine):>8} rows  {wall:5.1f}s")
            continue
        try:
            theirs = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = "SQL-ERROR"
            print(f"{name:28s} SQL-ERROR  {e}")
            continue
        verdict = compare(name, mine, theirs)
        results[name] = verdict
        print(f"{name:28s} {verdict:40s} {len(mine):>7} rows  {wall:5.1f}s")
    bad = {k: v for k, v in results.items()
           if v not in ("OK",) and not v.startswith("rows-only")}
    print(f"\n{len(results) - len(bad)}/{len(results)} clean; failing: {list(bad)}")
    if json_out:
        import json
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": len(results),
                       "n_clean": len(results) - len(bad),
                       "failing": sorted(bad),
                       "results": results}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    ray.shutdown()


if __name__ == "__main__":
    main()
