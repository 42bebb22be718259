"""Benchmark harness — one JSON line per run (driver contract).

Headline metric: spatial-join + tile-assignment throughput in
images/sec (BASELINE.json `metric`) — the flagship DAG (footprint ->
S2/hex encode -> STRtree PIP broadcast join -> hex kNN, plus the
aligned-fragment image join -> decode -> tile -> salted cell rollup)
over the deterministic fixture images at $GRAFT_SF_DIR's scale.

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).

--scaling: run the same job in two fresh processes at N and 4N CPUs
(default pair from GRAFT_SCALE_PAIR, "2,8") and report throughput at
both plus efficiency — the sandbox stand-in for the north rule's
two-cluster-size criterion (no real multi-node cluster here).

The default pair is 2,8 because this host's 32 advertised vCPUs
deliver ~9-10 physical cores (fixed-work probe in BENCH/BASELINE.md):
any leg above ~10 vCPUs measures the host's oversubscription, not the
engine.  With both legs under that ceiling the engine measures 0.92
efficiency; the 4,16 pair measures 0.77 only because the 16-CPU leg
is clipped by physical cores (both runs recorded in
BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    from stac_to_geocore_ray.tuning import configure_for_images
    configure_for_images(max_payload_mb=0.1)

    from stac_to_geocore_ray.sources import fixtures
    from stac_to_geocore_ray.pipelines import flagship
    from stac_to_geocore_ray import queries as q

    # fixture generation is one-time (cached); warm pass (untimed)
    # covers BOTH headline phases so timings measure steady-state
    # compute + shuffle, not first-touch page cache and worker spawn
    fixtures.generate(sf_dir)
    n_images = fixtures.n_images_for(sf_dir)
    flagship.metadata_pipeline(sf_dir).count()   # untimed warm pass
    flagship.tile_rollup(
        flagship.tile_pipeline(sf_dir, with_phash=False)).count()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # headline phase 1: metadata spatial join (footprint+cells+PIP+kNN)
    timed("spatial_join",
          lambda: flagship.metadata_pipeline(sf_dir).count())

    # headline phase 2: image join -> decode -> tile -> salted rollup
    def tiles():
        t = flagship.tile_pipeline(sf_dir, with_phash=False)
        return flagship.tile_rollup(t).count()
    timed("tile_assign", tiles)

    headline = timings["spatial_join"] + timings["tile_assign"]
    images_per_sec = round(n_images / headline, 1)

    # representative operator benchmarks (same code paths the driver's
    # correctness gate runs, at bench scale where inputs allow);
    # GRAFT_HEADLINE_ONLY=1 (scaling legs) skips them to bound runtime
    if not os.environ.get("GRAFT_HEADLINE_ONLY"):
        timed("geocore_translate", lambda: q.geocore_items(sf_dir).count())
        timed("phash_exact_dedup", lambda: q.phash_exact_dedup(sf_dir).count())
        # multi-index (band-pair) pHash near-dup pair listing — the
        # round-4 hot-group fix (worst group: distinct hashes, not
        # members)
        timed("phash_near_dedup", lambda: q.phash_near_dedup(sf_dir).count())
        timed("q1_pricing", lambda: q.q1_pricing_summary(sf_dir).count()
              if os.path.exists(os.path.join(sf_dir, "lineitem.parquet")) else 0)
        timed("ann_topk", lambda: len(q.ann_topk(sf_dir))
              if os.path.exists(os.path.join(sf_dir, "embeddings.parquet")) else 0)
        # multi-match PIP against a ~n/2-item-derived polygon catalog:
        # the STRtree TREE path at catalog scale (50k polygons at sf0.1)
        timed("pip_multi_tree", lambda: q.geo_pip_multi_tree(sf_dir).count())
        # streaming event-time windows (bucket actors + watermarks)
        timed("events_stream",
              lambda: q.events_stream_tumbling(sf_dir).num_rows
              if os.path.exists(os.path.join(sf_dir, "events.parquet")) else 0)
        # as-of LOCF join (sort + boundary-user fold)
        timed("events_asof",
              lambda: q.events_asof_join(sf_dir).count()
              if os.path.exists(os.path.join(sf_dir, "events.parquet")) else 0)
        # token-budget chunking (flat-map over documents)
        timed("doc_chunk",
              lambda: q.doc_chunk(sf_dir).count()
              if os.path.exists(os.path.join(sf_dir, "documents.parquet")) else 0)
        # MinHash-LSH near-dup: bucketed rep-pair candidates, flat-array
        # jaccard verify, distributed member expansion (round-4 1M-doc
        # path; result may be an empty Arrow table at tiny scales)
        timed("minhash_neardup",
              lambda: (lambda out: out.num_rows
                       if hasattr(out, "num_rows") else out.count())(
                  q.minhash_neardup(sf_dir))
              if os.path.exists(os.path.join(sf_dir, "documents.parquet")) else 0)
        # window functions (rank/lag/cumsum per user): sort +
        # boundary-user keyed fold, full-size output
        timed("events_window_rank",
              lambda: q.events_window_rank(sf_dir).count()
              if os.path.exists(os.path.join(sf_dir, "events.parquet")) else 0)
        # long->wide pivot via sorted_combine (lesson 21: sort-path
        # combine, not the per-row aggregate reduce)
        timed("events_type_pivot",
              lambda: q.events_type_pivot(sf_dir).count()
              if os.path.exists(os.path.join(sf_dir, "events.parquet")) else 0)
        # salted holistic per-cell top-k pHash (round-5 map_groups
        # template exerciser; decode-bound like tile_assign)
        timed("tile_topk_phash", lambda: q.tile_topk_phash(sf_dir).count())
        # left_semi EXISTS join, both sides pruned at the read
        timed("q4_order_priority",
              lambda: q.q4_order_priority(sf_dir).count()
              if os.path.exists(os.path.join(sf_dir, "orders.parquet")) else 0)
        # correlated scalar-aggregate broadcast filter (two passes)
        timed("q17_small_qty",
              lambda: q.q17_small_qty_revenue(sf_dir).num_rows
              if os.path.exists(os.path.join(sf_dir, "lineitem.parquet")) else 0)
        # distributed prefix scan (global running sum, no partition key)
        timed("events_global_scan",
              lambda: q.events_global_scan(sf_dir).count()
              if os.path.exists(os.path.join(sf_dir, "events.parquet")) else 0)
        # quadtree pyramid rollup: all zoom levels in one shuffle
        timed("geo_pyramid_rollup",
              lambda: q.geo_pyramid_rollup(sf_dir).count())
        # 3x3 focal stencil as scatter-gather on the contracted grid
        timed("geo_focal_mean", lambda: q.geo_focal_mean(sf_dir).count())
        # end-to-end prep: redact -> filters -> exact dedup, one stream
        timed("doc_prep_pipeline",
              lambda: q.doc_prep_pipeline(sf_dir).count()
              if os.path.exists(os.path.join(sf_dir, "documents.parquet")) else 0)
        # substring-level dedup (Lee-et-al 8-gram windows): rolling
        # 128-bit window hashes, shared-gram set size-dispatched
        timed("doc_dup_ngram_spans",
              lambda: q.doc_dup_ngram_spans(sf_dir).count()
              if os.path.exists(os.path.join(sf_dir, "documents.parquet")) else 0)
        # per-user time-decayed aggregate (order-dependent closed-form
        # EWMA through the boundary-key decompose)
        timed("events_ewma",
              lambda: q.events_ewma(sf_dir).count()
              if os.path.exists(os.path.join(sf_dir, "events.parquet")) else 0)
        # zonal statistics: broadcast-STRtree zone assignment with
        # in-batch contraction to O(zones) partial rows
        timed("geo_zonal_stats", lambda: q.geo_zonal_stats(sf_dir).count())
        # cross-modal caption-keyword x spatial-window retrieval
        # (pruned reads both sides, filter-before-shuffle hash join)
        timed("caption_search",
              lambda: (lambda out: out.num_rows
                       if hasattr(out, "num_rows") else out.count())(
                  q.caption_spatial_search(sf_dir)))
        # incremental view maintenance: base view + 4 late-delta
        # applies, each scanning only its slice (oracle = recompute)
        timed("events_hourly_ivm",
              lambda: q.events_hourly_ivm(sf_dir).num_rows
              if os.path.exists(os.path.join(sf_dir, "events.parquet")) else 0)
        # bidirectional nearest-in-time join (two carries on the
        # shared sorted stream)
        timed("events_nearest_join",
              lambda: q.events_nearest_join(sf_dir).count()
              if os.path.exists(os.path.join(sf_dir, "events.parquet")) else 0)
        # exact MAD via the bounded-domain histogram (two-level
        # holistic from ONE shuffle)
        timed("events_mad",
              lambda: q.events_mad(sf_dir).count()
              if os.path.exists(os.path.join(sf_dir, "events.parquet")) else 0)
        # PMI collocations: bigram pair-code fold + distributed
        # fixed-point ranking
        timed("doc_pmi",
              lambda: q.doc_pmi_collocations(sf_dir).num_rows
              if os.path.exists(os.path.join(sf_dir, "documents.parquet")) else 0)

    result = {
        "metric": "spatial-join + tile-assignment throughput",
        "value": round(headline, 3),
        "unit": "sec",
        "images_per_sec": images_per_sec,
        "n_images": n_images,
        "queries": timings,
        "sf": os.path.basename(sf_dir),
        "num_cpus": num_cpus,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    pair = os.environ.get("GRAFT_SCALE_PAIR", "2,8")
    lo, hi = (int(x) for x in pair.split(","))

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_HEADLINE_ONLY="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    r_lo = one(lo)
    r_hi = one(hi)
    tput_lo = r_lo["images_per_sec"]
    tput_hi = r_hi["images_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency",
        "cpus": [lo, hi],
        "images_per_sec": [tput_lo, tput_hi],
        "sec": [r_lo["value"], r_hi["value"]],
        "scaling_efficiency": round(eff, 3),
        "sf": r_lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
