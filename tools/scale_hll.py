"""20M-event A/B: exact COUNT(DISTINCT) vs HyperLogLog sketch.

    python tools/scale_hll.py [events_dir]

Times events_distinct_users (exact: every distinct (type, user) pair
crosses the sort) against events_hll_users (register table: <=
|types| x 4096 rows cross, INDEPENDENT of input size) on the same
fixture, and reports per-type relative error.  One Ray session; warm
pass first mirrors the other scale tools.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stgr_scale/events20mv2"
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from stac_to_geocore_ray import queries as q
    import ray.data as rd

    # warm the worker pool (process spawn + import cost)
    rd.read_parquet(os.path.join(out_dir, "events.parquet"),
                    columns=["event_id"]).count()

    t0 = time.time()
    exact = q.events_distinct_users(out_dir).to_pandas()
    t_exact = time.time() - t0

    t0 = time.time()
    est = q.events_hll_users(out_dir).to_pandas()
    t_hll = time.time() - t0

    m = exact.merge(est, on="event_type")
    m["rel_err"] = (m.hll_users - m.n_users).abs() / m.n_users
    print(json.dumps({
        "fixture": out_dir,
        "n_events": int(exact["n_events"].sum()) if "n_events" in exact else None,
        "exact_sec": round(t_exact, 1),
        "hll_sec": round(t_hll, 1),
        "per_type": {r.event_type: {"exact": int(r.n_users),
                                    "hll": int(r.hll_users),
                                    "rel_err": round(float(r.rel_err), 4)}
                     for r in m.itertuples()},
        "max_rel_err": round(float(m.rel_err.max()), 4)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
