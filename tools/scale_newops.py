"""Scale probe for the round-5 final-session op classes.

Runs the five new ops at 10-200x the bench fixture over the cached
scale datasets (tools/scale_events.py / scale_docs.py /
scale_embeddings.py layouts):

- events_type_transitions + geo_simplify_dp at 20M events (hot-user
  skew stream: the sequential per-key kernels must ride the shared
  sort, a 200k-event user defers to the keyed fold);
- doc_lm_score + doc_weighted_sample at 1M documents;
- embedding_pca at 1M x 64 (exact int64 moment fold headroom holds to
  2.3M vectors at PCA_SCALE=1e6 — asserted in the op);
- the DBSCAN stage at 2M synthetic clustered points (planted blob
  centers + uniform noise; exercises the cell-grid pair sweep and the
  root-hooked broadcast CC end to end).

Usage:  python tools/scale_newops.py [--queries a,b,...]
Owns its Ray session (like bench.py); not imported by __ray_entry__.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EVENTS = "/tmp/stgr_scale/events20m"
DOCS = "/tmp/stgr_scale/docs1m"
EMB = "/tmp/stgr_scale/emb1m"

DBSCAN_N = 2_000_000
DBSCAN_EPS = 50_000          # doubled micro-deg (~0.025 deg)
DBSCAN_MIN_PTS = 4


def _dbscan_points():
    """2M points: 500 planted Gaussian blobs (80% of points) + 20%
    uniform noise over a continental extent, ids shuffled."""
    import ray.data as rd
    rng = np.random.default_rng(0xD85CA)
    n_blob = int(DBSCAN_N * 0.8)
    n_noise = DBSCAN_N - n_blob
    centers = rng.uniform([-120e6, -40e6], [120e6, 40e6], (1000, 2))
    which = rng.integers(0, 1000, n_blob)
    # sigma = 10*eps: ~8 eps-neighbors per blob point (a 0.8*eps sigma
    # packs 3200 points inside a couple of eps-discs -> billions of
    # pairs; DBSCAN's own density regime, not a harness mistake)
    pts_blob = centers[which] + rng.normal(0, DBSCAN_EPS * 10.0,
                                           (n_blob, 2))
    pts_noise = rng.uniform([-120e6, -40e6], [120e6, 40e6], (n_noise, 2))
    pts = np.vstack([pts_blob, pts_noise]).astype(np.int64)
    pid = rng.permutation(DBSCAN_N).astype(np.int64)
    return rd.from_arrow(pa.table({
        "pid": pa.array(pid),
        "px": pa.array(pts[:, 0]),
        "py": pa.array(pts[:, 1])})).repartition(64).materialize()


def main() -> None:
    only = None
    if "--queries" in sys.argv:
        only = sys.argv[sys.argv.index("--queries") + 1].split(",")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from scale_run import PeakTracker, make_timed

    from stac_to_geocore_ray import queries as q
    from stac_to_geocore_ray.stages.dbscan import dbscan

    tracker = PeakTracker()
    tracker.start()
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    timed = make_timed(timings, counts, only)

    if os.path.exists(os.path.join(EVENTS, "events.parquet")):
        timed("events_type_transitions",
              lambda: q.events_type_transitions(EVENTS))
        timed("geo_simplify_dp", lambda: q.geo_simplify_dp(EVENTS))
        timed("events_ks_drift", lambda: q.events_ks_drift(EVENTS))
        timed("events_changepoint", lambda: q.events_changepoint(EVENTS))
        timed("events_hourly_quantiles",
              lambda: q.events_hourly_quantiles(EVENTS))
        timed("events_od_matrix", lambda: q.events_od_matrix(EVENTS))
    if os.path.exists(os.path.join(DOCS, "documents.parquet")):
        timed("doc_lm_score", lambda: q.doc_lm_score(DOCS))
        timed("doc_weighted_sample",
              lambda: q.doc_weighted_sample(DOCS))
        timed("doc_containment", lambda: q.doc_containment(DOCS))
    if os.path.exists(os.path.join(EMB, "embeddings.parquet")):
        timed("embedding_pca", lambda: q.embedding_pca(EMB))
    if only is None or "dbscan_2m" in only:
        pts = _dbscan_points()
        t = time.time()
        out = dbscan(pts, DBSCAN_EPS, DBSCAN_MIN_PTS).to_pandas()
        timings["dbscan_2m"] = round(time.time() - t, 3)
        counts["dbscan_2m"] = len(out)
        roles = out.role.value_counts().to_dict()
        nclusters = out.loc[out.cluster >= 0, "cluster"].nunique()
        print(f"  dbscan_2m: {timings['dbscan_2m']}s rows={len(out)} "
              f"roles={roles} clusters={nclusters}", flush=True)

    tracker.stop()
    tracker.join(timeout=3)
    print(json.dumps({
        "metric": "round-5 final-session new-op scale run",
        "num_cpus": num_cpus,
        "queries": timings, "rows": counts,
        "peak_driver_rss_gb": round(tracker.peak_rss_gb, 2),
        "peak_object_store_gb": round(tracker.peak_store_gb, 2)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
