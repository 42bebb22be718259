"""Skew-stress for the salted holistic top-k (judge r4 item #5).

Synthesizes a tile stream with the dense-urban-cell shape — ONE cell
holding ``dense_frac`` of all rows, one hot pHash inside it — and runs
``tile_topk_phash_rollup`` at salt_factor 8 vs 1 (same input, same
session), verifying the outputs are identical and reporting both walls.
salt_factor=1 is the unsalted control: phase 1 degenerates to plain
``groupby(cell).map_groups`` and the dense cell pins one reducer.

Usage:
    python tools/scale_salted_topk.py [--n 20000000] [--dense 0.5]

Owns its Ray session (like bench.py); not imported by __ray_entry__.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 0x5A17ED
SHARD = 1_000_000
DENSE_CELL = np.int64(4_000_000)
HOT_PHASH = np.int64(-42)


def _shard_table(lo: int, hi: int, dense_frac: float,
                 n_cells: int) -> pa.Table:
    rng = np.random.default_rng(SEED + lo)
    m = hi - lo
    dense = rng.random(m) < dense_frac
    cells = rng.integers(0, n_cells, m).astype(np.int64)
    cells[dense] = DENSE_CELL
    # inside the dense cell: 5% one hot hash, the rest a ~50k-distinct
    # repeated set (a DIVERSE dense cell — the realistic urban shape;
    # all copies of one value share a salt shard by construction, so a
    # single-value-dominated cell is the one shape a VALUE-derived
    # salt cannot split further); sparse cells draw from a broad space
    ph = rng.integers(-(1 << 40), 1 << 40, m).astype(np.int64)
    in_dense_tail = dense & (rng.random(m) >= 0.05)
    ph[dense] = HOT_PHASH
    ph[in_dense_tail] = rng.integers(-25_000, 25_000,
                                     int(in_dense_tail.sum())).astype(np.int64)
    return pa.table({"hex_prefix": pa.array(cells),
                     "tile_phash": pa.array(ph)})


def generate(out_dir: str, n: int, dense_frac: float, n_cells: int) -> str:
    path = os.path.join(out_dir, f"tiles_{n}_{dense_frac}_{n_cells}")
    marker = os.path.join(path, "_DONE")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    for lo in range(0, n, SHARD):
        hi = min(lo + SHARD, n)
        pq.write_table(_shard_table(lo, hi, dense_frac, n_cells),
                       os.path.join(path, f"part-{lo // SHARD:05d}.parquet"))
    open(marker, "w").write(f"{n} {dense_frac} {n_cells}\n")
    return path


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000_000)
    ap.add_argument("--dense", type=float, default=0.5)
    ap.add_argument("--cells", type=int, default=200,
                    help="sparse-cell cardinality; low values make the "
                         "dense cell dominate a reducer's load instead "
                         "of per-group dispatch overhead")
    ap.add_argument("--out", default="/tmp/stgr_salted_topk")
    args = ap.parse_args()

    import ray
    import ray.data as rd
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from stac_to_geocore_ray.pipelines.flagship import tile_topk_phash_rollup
    from stac_to_geocore_ray.stages.util import clean_read_parquet

    path = generate(args.out, args.n, args.dense, args.cells)
    results = {}
    frames = {}
    for salt in (8, 1):
        ds = clean_read_parquet(path,
                                columns=["hex_prefix", "tile_phash"])
        t0 = time.time()
        df = tile_topk_phash_rollup(ds, k=3, salt_factor=salt).to_pandas()
        results[f"salt_{salt}_sec"] = round(time.time() - t0, 2)
        frames[salt] = df.sort_values(["hex_prefix", "rank"]) \
            .reset_index(drop=True)
    pd.testing.assert_frame_equal(frames[8], frames[1])
    top = frames[8][(frames[8].hex_prefix == int(DENSE_CELL))
                    & (frames[8]["rank"] == 1)]
    assert top.tile_phash.tolist() == [int(HOT_PHASH)], top

    # the STRUCTURAL split the salt buys: the biggest phase-1 group
    # (rows one reducer must hold) with and without the salt — one
    # streaming pass over the input, no pipeline
    def split_stats(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["salt"] = (df.tile_phash.to_numpy() & 7)
        a = df.groupby(["hex_prefix", "salt"]).size() \
            .reset_index(name="rows")
        b = df.groupby("hex_prefix").size().reset_index(name="rows")
        b["salt"] = -1
        return pa.Table.from_pandas(pd.concat([a, b]),
                                    preserve_index=False)

    from stac_to_geocore_ray.stages.util import sorted_combine
    g = sorted_combine(
        clean_read_parquet(path, columns=["hex_prefix", "tile_phash"])
        .map_batches(split_stats, batch_format="pyarrow"),
        keys=["hex_prefix", "salt"], sum_cols=["rows"]).to_pandas()
    hot = g[g.hex_prefix == int(DENSE_CELL)]
    results["hot_cell_rows_unsalted"] = int(hot[hot.salt == -1].rows.iloc[0])
    results["hot_cell_max_shard_salted"] = \
        int(hot[hot.salt >= 0].rows.max())
    print(json.dumps({"n_rows": args.n, "dense_frac": args.dense,
                      "n_cells": int(frames[8].hex_prefix.nunique()),
                      "identical": True, **results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
