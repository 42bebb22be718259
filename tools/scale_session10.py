"""Scale probe for the round-5 tenth-session op classes.

- 20M events (tools/scale_events.py layout): exact MAD, type-pair
  series correlation, ACF, chi-square independence, nearest-in-time
  join (the last rides the shared sort + boundary decompose — the
  probe checks the two-carry kernel at hot-user scale);
- 1M documents: PMI collocations (the bigram pair fold + distributed
  fixed-point ranking), inverted-index build (distinct-pair sort with
  capped postings);
- 18M lineitems / 30x (tools/scale_tpch.py layout): k-core h-index
  fixpoint (round count + per-round histogram fold), seeded link
  prediction (edge build + broadcast gather).

Usage:  python tools/scale_session10.py [--queries a,b,...]
Owns its Ray session (like bench.py); not imported by __ray_entry__.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EVENTS = "/tmp/stgr_scale/events20m"
DOCS = "/tmp/stgr_scale/docs1m"
TPCH = "/tmp/stgr_scale/tpch30x"


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

    tracker = PeakTracker()
    tracker.start()
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    timed = make_timed(timings, counts, only)

    if os.path.exists(os.path.join(EVENTS, "events.parquet")):
        timed("events_mad", lambda: q.events_mad(EVENTS))
        timed("events_type_corr", lambda: q.events_type_corr(EVENTS))
        timed("events_acf", lambda: q.events_acf(EVENTS))
        timed("events_chisq_independence",
              lambda: q.events_chisq_independence(EVENTS))
        timed("events_nearest_join",
              lambda: q.events_nearest_join(EVENTS))
        timed("events_profile", lambda: q.events_profile(EVENTS))
    if os.path.exists(os.path.join(DOCS, "documents.parquet")):
        timed("doc_pmi_collocations",
              lambda: q.doc_pmi_collocations(DOCS))
        timed("doc_inverted_index", lambda: q.doc_inverted_index(DOCS))
    if os.path.exists(os.path.join(TPCH, "lineitem.parquet")):
        timed("graph_kcore", lambda: q.graph_kcore(TPCH))
        timed("graph_link_predict", lambda: q.graph_link_predict(TPCH))
        timed("customer_rfm", lambda: q.customer_rfm(TPCH))
        timed("basket_rules", lambda: q.basket_rules(TPCH))

    tracker.stop()
    tracker.join(timeout=3)
    print(json.dumps({
        "metric": "round-5 tenth-session new-op scale run",
        "num_cpus": num_cpus,
        "queries": timings, "rows": counts,
        "peak_driver_rss_gb": round(tracker.peak_rss_gb, 2),
        "peak_object_store_gb": round(tracker.peak_store_gb, 2)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
