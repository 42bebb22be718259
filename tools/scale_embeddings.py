"""Embeddings-at-scale measured run — the fourth modality leg (images
sf1.0, text 1M docs, events 20M; now vectors): ANN search and
embedding near-dup at 1,000,000 x 64-dim vectors, 500x the bench-scale
table.

The corpus is synthesized deterministically (per-shard seeds over a
fixed layout): unit-scale normal vectors (64-dim background cosines
concentrate near 0, matching the driver fixture's geometry).  The
near-dup queries AUGMENT the corpus in-pipeline with their own
deterministically planted pairs/neighbours (stages/dedup
planted_near_dups, stages/ann.planted_neighbors) exactly as at bench
scale, so recall semantics carry over unchanged — at 1M vectors the
LSH leg's planted set alone is ~200k true pairs.

Excluded BY DESIGN: embedding_neardup_exact / embedding_dedup_clusters
are the documented O(n^2) exact paths for sub-LSH thresholds
(cos >= 0.40); their block x broadcast matmul is a linear scan per
block but quadratic total flops — embedding_neardup_lsh IS their scale
path and is what this run measures.

Usage:
    python tools/scale_embeddings.py [out_dir] [--n 1000000]        # generate
    python tools/scale_embeddings.py [out_dir] --run [--queries a]  # measure

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

SEED = 0xE3B3D
SHARD = 100_000
DIM = 64


def _write_shard(out: str, lo: int, hi: int, shard: int) -> int:
    rng = np.random.default_rng(SEED + lo)
    m = hi - lo
    mat = rng.normal(size=(m, DIM)).astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.ravel(), pa.float32()), DIM)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
        "embedding": emb.cast(pa.list_(pa.float32())),
        "label": pa.array((np.arange(lo, hi) % 10).astype(np.int32)),
    })
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet",
                                     f"part-{shard:05d}.parquet"))
    return tbl.num_rows


def generate(out_dir: str, n: int) -> None:
    emb_dir = os.path.join(out_dir, "embeddings.parquet")
    marker = os.path.join(out_dir, "_COMPLETE")
    params = f"n={n};dim={DIM}"
    if os.path.exists(marker):
        have = open(marker).read().strip()
        if have != params and have != f"n={n}":   # legacy marker grace
            raise ValueError(
                f"{out_dir} was generated with '{have}', requested "
                f"'{params}' — use a fresh out_dir")
        return
    os.makedirs(emb_dir, exist_ok=True)
    ranges = [(lo, min(lo + SHARD, n), s)
              for s, lo in enumerate(range(0, n, SHARD))]
    import ray
    if ray.is_initialized() and n >= 4 * SHARD:
        task = ray.remote(num_cpus=1)(_write_shard)
        total = sum(ray.get([task.remote(out_dir, lo, hi, s)
                             for lo, hi, s in ranges]))
    else:
        total = sum(_write_shard(out_dir, lo, hi, s) for lo, hi, s in ranges)
    with open(marker, "w") as f:
        f.write(params + "\n")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else "/tmp/stgr_scale/emb1m"
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv \
        else 1_000_000
    only = sys.argv[sys.argv.index("--queries") + 1].split(",") \
        if "--queries" in sys.argv else None
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    generate(out_dir, n)
    gen_s = round(time.time() - t0, 1)
    with open(os.path.join(out_dir, "_COMPLETE")) as f:
        n = int(f.read().strip().split(";")[0].split("=")[1])

    if "--run" not in sys.argv:
        print(json.dumps({"generated": out_dir, "n_vectors": n,
                          "gen_sec": gen_s}))
        ray.shutdown()
        return

    from scale_run import PeakTracker, make_timed

    from stac_to_geocore_ray import queries as q

    import ray.data as rd
    rd.read_parquet(os.path.join(out_dir, "embeddings.parquet"),
                    columns=["vec_id"]).count()    # warm worker pool

    tracker = PeakTracker()
    tracker.start()
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    timed = make_timed(timings, counts, only)

    timed("ann_topk", lambda: q.ann_topk(out_dir))
    timed("kmeans_embeddings", lambda: q.kmeans_embeddings(out_dir))
    timed("embedding_pq", lambda: q.embedding_pq(out_dir))
    timed("ann_ivf", lambda: q.ann_ivf(out_dir))
    timed("embedding_neardup_lsh",
          lambda: q.embedding_neardup_lsh(out_dir))
    tracker.stop()

    print(json.dumps({
        "metric": "embeddings 500x-scale run",
        "n_vectors": n,
        "dim": DIM,
        "num_cpus": num_cpus,
        "gen_sec": gen_s,
        "queries": timings,
        "rows": counts,
        "peak_driver_rss_gb": round(tracker.peak_rss_gb, 2),
        "peak_object_store_gb": round(tracker.peak_store_gb, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
