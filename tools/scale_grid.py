"""Grid-operator scale probe: pyramid rollup + focal stencil at 20M
bboxes (200x the sf0.1 fixture's item count).

Synthesizes a deterministic 20M-row bbox table with the spatial skew a
real catalog has — a zipf-ish mixture of dense acquisition regions
(most imagery concentrates over a few AOIs) plus a uniform tail — so
the finest-level cells are heavily unbalanced, then measures the
SHARED cores (queries/geo.py pyramid_from_dataset / focal_from_dataset,
the exact code the fixture queries run).  The point being evidenced:
both ops' shuffle volume is bounded by the GRID (sum_z 4^z ~ 5.5k rows
per batch for the pyramid, 4^7 cells for the stencil), so 200x the
items costs only the scan+partial, never the shuffle.

Usage:  python tools/scale_grid.py [out_dir] [--n 20000000]
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

SEED = 0x6E0D
SHARD = 500_000
# dense acquisition centers (lon, lat, spread_deg, weight)
AOIS = [(-75.7, 45.4, 3.0, 4), (151.2, -33.9, 2.0, 3),
        (10.4, 51.1, 4.0, 3), (-120.5, 37.2, 2.5, 2),
        (77.2, 28.6, 1.5, 2), (-47.9, -15.8, 3.5, 1)]


def _shard_table(lo: int, hi: int) -> pa.Table:
    rng = np.random.default_rng(SEED + lo)
    m = hi - lo
    w = np.array([a[3] for a in AOIS], dtype=np.float64)
    pick = rng.choice(len(AOIS) + 1, size=m,
                      p=np.r_[w / w.sum() * 0.8, 0.2])
    cx = rng.uniform(-180.0, 180.0, m)
    cy = rng.uniform(-90.0, 90.0, m)
    for i, (ax, ay, spread, _wt) in enumerate(AOIS):
        sel = pick == i
        k = int(sel.sum())
        cx[sel] = np.clip(ax + rng.normal(0.0, spread, k), -179.9, 179.9)
        cy[sel] = np.clip(ay + rng.normal(0.0, spread, k), -89.9, 89.9)
    half = rng.uniform(0.005, 0.15, m)
    bb = np.stack([np.maximum(cx - half, -180.0),
                   np.maximum(cy - half, -90.0),
                   np.minimum(cx + half, 180.0),
                   np.minimum(cy + half, 90.0)], axis=1)
    return pa.table({"bbox": pa.FixedSizeListArray.from_arrays(
        pa.array(bb.reshape(-1), pa.float64()), 4)})


def _write_shard(out: str, lo: int, hi: int, shard: int) -> int:
    tbl = _shard_table(lo, hi)
    pq.write_table(tbl, os.path.join(out, "bboxes",
                                     f"part-{shard:05d}.parquet"))
    return tbl.num_rows


def main() -> None:
    argv = list(sys.argv[1:])
    n = 20_000_000
    if "--n" in argv:                 # strip the flag AND its value so
        i = argv.index("--n")         # the value is never mistaken for
        n = int(argv[i + 1])          # the positional out_dir
        del argv[i:i + 2]
    args = [a for a in argv if not a.startswith("--")]
    out_dir = args[0] if args else "/tmp/stgr_scale/grid20m"
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    bdir = os.path.join(out_dir, "bboxes")
    marker = os.path.join(out_dir, "_COMPLETE")
    t0 = time.time()
    if not (os.path.exists(marker)
            and open(marker).read().strip() == f"n={n}"):
        # a marker mismatch means a DIFFERENT n was generated here
        # before: wipe the shard dir, or stale parts from a larger run
        # would ride along in the glob and fail the conservation
        # assert after all the timed work
        import shutil
        shutil.rmtree(bdir, ignore_errors=True)
        os.makedirs(bdir, exist_ok=True)
        task = ray.remote(num_cpus=1)(_write_shard)
        ranges = [(lo, min(lo + SHARD, n), s)
                  for s, lo in enumerate(range(0, n, SHARD))]
        sum(ray.get([task.remote(out_dir, lo, hi, s)
                     for lo, hi, s in ranges]))
        with open(marker, "w") as f:
            f.write(f"n={n}\n")
    gen_s = round(time.time() - t0, 1)

    from scale_run import PeakTracker

    from stac_to_geocore_ray.queries._common import _meta_read
    from stac_to_geocore_ray.queries.geo import (focal_from_dataset,
                                                 pyramid_from_dataset)

    # warm the worker pool (process-startup cost otherwise lands in
    # the first timed line); _meta_read = the queries' own
    # CPU-matched-block read (the ~200-block default read fragments
    # the partials — measured 15 vs 3-5 s at 20M)
    _meta_read(bdir, columns=["bbox"]).count()

    # zonal stats runs against the sf0.01 fixture's 8-zone catalog
    # (broadcast once); the synthetic bboxes are global, so zones
    # capture a Canada-sized fraction of the 20M items
    from stac_to_geocore_ray.pipelines.flagship import _load_catalog
    from stac_to_geocore_ray.queries._common import _fx
    from stac_to_geocore_ray.queries.geo import (zonal_from_dataset,
                                                  zonal_overlap_from_dataset)
    _, zcat, _ = _load_catalog(_fx("/root/testdata/sf0.01")["collections"])
    zref = ray.put(zcat)
    import pyarrow.parquet as _zpq
    _zt = _zpq.read_table(_fx("/root/testdata/sf0.01")["collections"],
                          columns=["collection_id", "bbox"])
    _zids = _zt["collection_id"].to_pylist()
    _zrects = np.asarray(_zt["bbox"].to_pylist(), dtype=np.float64)
    _zoref = ray.put((_zids, _zrects))

    # union-area probe input: a deterministic zipf-ish collection
    # column derived from the bbox bits (c0 holds ~50% of rows — the
    # fixture's hot-collection shape) layered onto the same bboxes
    from stac_to_geocore_ray.queries.geo import union_area_from_dataset

    def _with_collections(batch):
        import pyarrow as _pa
        m = batch["bbox"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(-1, 4)
        h = np.floor(m[:, 0] * 1e6 + 0.5).astype(np.int64) \
            .astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        u = (h >> np.uint64(40)).astype(np.float64) / float(1 << 24)
        cid = np.where(u < 0.5, 0, 1 + (h % np.uint64(7)).astype(
            np.int64))
        labels = np.array([f"c{i}" for i in range(8)], dtype=object)
        return batch.append_column(
            "collection_id", _pa.array(labels[cid], _pa.string()))

    def _union_core(ds):
        return union_area_from_dataset(
            ds.map_batches(_with_collections, batch_format="pyarrow"))

    tracker = PeakTracker()
    tracker.start()
    timings, counts = {}, {}
    from stac_to_geocore_ray.queries.geo import (
        cell_compact_from_dataset, convex_hull_from_dataset,
        polygonize_from_dataset, rasterize_from_dataset)

    def _hull_core(ds):
        return convex_hull_from_dataset(
            ds.map_batches(_with_collections, batch_format="pyarrow"))

    for name, core in (("geo_pyramid_rollup", pyramid_from_dataset),
                       ("geo_focal_mean", focal_from_dataset),
                       ("geo_zonal_stats",
                        lambda ds: zonal_from_dataset(ds, zref)),
                       ("geo_zonal_overlap",
                        lambda ds: zonal_overlap_from_dataset(
                            ds, _zoref, _zids, _zrects)),
                       ("geo_union_area", _union_core),
                       ("geo_cell_compact", cell_compact_from_dataset),
                       ("geo_rasterize_coverage", rasterize_from_dataset),
                       ("geo_polygonize", polygonize_from_dataset),
                       ("geo_convex_hull", _hull_core)):
        t0 = time.time()
        out = core(_meta_read(bdir, columns=["bbox"]))
        counts[name] = out.count()
        timings[name] = round(time.time() - t0, 2)
    tracker.stop()

    # invariant spot-checks on the pyramid at scale: every level
    # conserves the item total
    pyr = pyramid_from_dataset(_meta_read(bdir, columns=["bbox"])).to_pandas()
    tot = pyr.groupby("z").n_items.sum()
    assert tot.nunique() == 1 and int(tot.iloc[0]) == n, tot

    # zonal invariants at scale: per-zone counts equal a direct
    # vectorized recount over the zone bboxes (multi-match, closed)
    zst = zonal_from_dataset(_meta_read(bdir, columns=["bbox"]),
                             zref).to_pandas().set_index("zone")
    import pyarrow.parquet as _pq
    ct = _pq.read_table(_fx("/root/testdata/sf0.01")["collections"],
                        columns=["collection_id", "bbox"])
    zb = {i: b for i, b in zip(ct["collection_id"].to_pylist(),
                               ct["bbox"].to_pylist())}
    import pyarrow.dataset as _pads
    got_n = {}
    for frag in sorted(os.listdir(bdir))[:6]:     # spot-check 3M rows
        t = _pq.read_table(os.path.join(bdir, frag))
        m = t["bbox"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(-1, 4)
        cx, cy = (m[:, 0] + m[:, 2]) / 2, (m[:, 1] + m[:, 3]) / 2
        for z, (w_, s_, e_, n_) in zb.items():
            got_n[z] = got_n.get(z, 0) + int(
                ((cx >= w_) & (cx <= e_) & (cy >= s_) & (cy <= n_)).sum())
    # spot fragments are a subset: counts must be <= the full answer
    # and nonzero zones must appear
    for z, c in got_n.items():
        if c:
            assert z in zst.index and int(zst.loc[z].n_items) >= c, (z, c)

    # compaction invariant at scale: expanding the mixed-resolution
    # output back to z=9 leaves must reproduce the distinct-cell count
    # exactly (a DuckDB replay of the identical floor/clamp formula)
    cc = cell_compact_from_dataset(
        _meta_read(bdir, columns=["bbox"])).to_pandas()
    import duckdb as _dk
    from stac_to_geocore_ray.queries.geo import COMPACT_Z
    _k = float(1 << COMPACT_Z)
    _cm = (1 << COMPACT_Z) - 1
    n_leaves = int((4 ** (COMPACT_Z - cc.z)).sum())
    n_cells = _dk.sql(f"""
        SELECT count(*) FROM (SELECT DISTINCT
          LEAST(CAST(floor(((bbox[1]+bbox[3])/2 + 180.0)/360.0*{_k})
                AS BIGINT), {_cm}),
          LEAST(CAST(floor(((bbox[2]+bbox[4])/2 + 90.0)/180.0*{_k})
                AS BIGINT), {_cm})
        FROM read_parquet('{bdir}/*.parquet')
        WHERE bbox[1] <= bbox[3])""").fetchone()[0]
    assert n_leaves == n_cells, (n_leaves, n_cells)

    print(json.dumps({
        "metric": "grid ops 200x-scale run",
        "compact_rows": int(len(cc)),
        "compact_leaves_conserved": n_leaves,
        "n_bboxes": n,
        "num_cpus": num_cpus,
        "gen_sec": gen_s,
        "queries": timings,
        "rows": counts,
        "level_total_conserved": int(tot.iloc[0]),
        "zonal_rows": int(len(zst)),
        "peak_driver_rss_gb": round(tracker.peak_rss_gb, 2),
        "peak_object_store_gb": round(tracker.peak_store_gb, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
