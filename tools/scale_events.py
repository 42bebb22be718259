"""Events-at-scale measured run — the third and last leg of the
measured-scale program (images proved at sf1.0 = 1M, text at 1M docs;
this proves the EVENT pipelines at 20M events, 200x the bench scale).

The stream is synthesized deterministically (per-shard seeds over a
FIXED shard layout) with the skew a web-scale event pipeline actually
sees:

- ONE HOT USER: user 0 produces 1% of all events (200k at 20M) — the
  case that stresses every boundary-user keyed fold (sessionize, as-of
  join, window functions): the hot user straddles most sort blocks and
  must parallelize across the fold's groups, not funnel into one task;
- a zipf-flavored long tail over ~n/67 ordinary users;
- timestamps UNSORTED over a 30-day span (the distributed sort and the
  streaming stage's out-of-order ingest both do real work);
- value matches the fixture distribution (cents domain <= 49,002, so
  events_value_quantiles' bounded-domain histogram stays bounded).

Usage:
    python tools/scale_events.py [out_dir] [--n 20000000]          # generate
    python tools/scale_events.py [out_dir] --run [--queries a,b]   # measure

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

SEED = 0xE7E17
SHARD = 500_000
TYPES = np.asarray(["click", "error", "purchase", "signup", "view"],
                   dtype=object)
T0_US = np.datetime64("2026-01-01T00:00:00", "us").astype("int64")
SPAN_US = 30 * 24 * 3_600_000_000           # 30 days


def _shard_table(lo: int, hi: int, n_total: int,
                 hot_frac: float = 0.01) -> pa.Table:
    rng = np.random.default_rng(SEED + lo)
    m = hi - lo
    ids = np.arange(lo, hi, dtype=np.int64)
    n_users = max(n_total // 67, 2)
    # hot_frac of the stream goes to user 0; the rest long-tail-ish:
    # square a uniform so low user ids are denser (mild skew beyond
    # the planted hot key).  --hot-frac 0.3+ is the skew-stress mode:
    # the hot user's rows all reach ONE keyed-fold group.
    u = rng.random(m)
    users = (u * u * (n_users - 1)).astype(np.int64) + 1
    users[rng.random(m) < hot_frac] = 0
    ts = T0_US + rng.integers(0, SPAN_US, size=m)
    value = np.round(rng.uniform(0.01, 490.02, size=m), 2)
    return pa.table({
        "event_id": pa.array(ids),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(users),
        "event_type": pa.array(TYPES[rng.integers(0, len(TYPES), size=m)],
                               pa.string()),
        "value": pa.array(value, pa.float64()),
        # real JSON payloads (fixture-shaped {"k": int}) so the
        # props-extraction A/B measures actual parsing, not empty-object
        # scans (round 5; marker param props=k keys the change)
        "props": pa.array(np.char.add(
            np.char.add('{"k": ',
                        rng.integers(0, 100, m).astype("U3")), "}")),
    })


def _write_shard(out: str, lo: int, hi: int, shard: int, n_total: int,
                 hot_frac: float = 0.01) -> int:
    tbl = _shard_table(lo, hi, n_total, hot_frac)
    pq.write_table(tbl, os.path.join(out, "events.parquet",
                                     f"part-{shard:05d}.parquet"))
    return tbl.num_rows


def generate(out_dir: str, n: int, hot_frac: float = 0.01) -> None:
    ev_dir = os.path.join(out_dir, "events.parquet")
    marker = os.path.join(out_dir, "_COMPLETE")
    params = f"n={n};hot_frac={hot_frac};props=k"
    if os.path.exists(marker):
        have = open(marker).read().strip()
        legacy_ok = False        # pre-round-5 fixtures carry "{}" props
        if have != params and not legacy_ok:
            # a stale marker would silently measure the WRONG corpus
            # (e.g. a skew-stress run against a 1%-hot fixture)
            raise ValueError(
                f"{out_dir} was generated with '{have}', requested "
                f"'{params}' — use a fresh out_dir")
        return
    os.makedirs(ev_dir, exist_ok=True)
    ranges = [(lo, min(lo + SHARD, n), s)
              for s, lo in enumerate(range(0, n, SHARD))]
    import ray
    if ray.is_initialized() and n >= 4 * SHARD:
        task = ray.remote(num_cpus=1)(_write_shard)
        total = sum(ray.get([task.remote(out_dir, lo, hi, s, n, hot_frac)
                             for lo, hi, s in ranges]))
    else:
        total = sum(_write_shard(out_dir, lo, hi, s, n, hot_frac)
                    for lo, hi, s in ranges)
    with open(marker, "w") as f:
        f.write(params + "\n")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else "/tmp/stgr_scale/events20m"
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv \
        else 20_000_000
    only = sys.argv[sys.argv.index("--queries") + 1].split(",") \
        if "--queries" in sys.argv else None
    hot_frac = float(sys.argv[sys.argv.index("--hot-frac") + 1]) \
        if "--hot-frac" in sys.argv else 0.01
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    generate(out_dir, n, hot_frac)
    gen_s = round(time.time() - t0, 1)
    with open(os.path.join(out_dir, "_COMPLETE")) as f:
        n = int(f.read().strip().split(";")[0].split("=")[1])

    if "--run" not in sys.argv:
        print(json.dumps({"generated": out_dir, "n_events": n,
                          "gen_sec": gen_s}))
        ray.shutdown()
        return

    from scale_run import PeakTracker, make_timed

    from stac_to_geocore_ray import queries as q

    # warm the worker pool so the first timed query doesn't absorb
    # process-startup cost (observed ~7s of the first line at 200k)
    import ray.data as rd
    rd.read_parquet(os.path.join(out_dir, "events.parquet"),
                    columns=["event_id"]).count()

    tracker = PeakTracker()
    tracker.start()
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    timed = make_timed(timings, counts, only)

    timed("events_hourly", lambda: q.events_hourly(out_dir))
    timed("events_value_quantiles",
          lambda: q.events_value_quantiles(out_dir))
    timed("events_type_pivot", lambda: q.events_type_pivot(out_dir))
    timed("events_sessionize", lambda: q.events_sessionize(out_dir))
    timed("events_asof_join", lambda: q.events_asof_join(out_dir))
    timed("events_window_rank", lambda: q.events_window_rank(out_dir))
    timed("events_stream_tumbling",
          lambda: q.events_stream_tumbling(out_dir))
    timed("events_stream_sliding",
          lambda: q.events_stream_sliding(out_dir))
    timed("events_distinct_users",
          lambda: q.events_distinct_users(out_dir))
    timed("events_retention", lambda: q.events_retention(out_dir))
    timed("events_rollup", lambda: q.events_rollup(out_dir))
    timed("events_range_join", lambda: q.events_range_join(out_dir))
    timed("events_props_json", lambda: q.events_props_json(out_dir))
    timed("events_global_scan", lambda: q.events_global_scan(out_dir))
    timed("events_heavy_hitters", lambda: q.events_heavy_hitters(out_dir))
    timed("events_quantile_sketch",
          lambda: q.events_quantile_sketch(out_dir))
    timed("events_cube", lambda: q.events_cube(out_dir))
    timed("events_ewma", lambda: q.events_ewma(out_dir))
    timed("events_median_gap", lambda: q.events_median_gap(out_dir))
    timed("events_twap", lambda: q.events_twap(out_dir))
    timed("events_rolling_sum", lambda: q.events_rolling_sum(out_dir))
    timed("events_stream_sessions",
          lambda: q.events_stream_sessions(out_dir))
    timed("events_interval_union",
          lambda: q.events_interval_union(out_dir))
    timed("events_max_concurrent",
          lambda: q.events_max_concurrent(out_dir))
    timed("events_mode_type", lambda: q.events_mode_type(out_dir))
    timed("events_attribution", lambda: q.events_attribution(out_dir))
    timed("events_outer_join_days",
          lambda: q.events_outer_join_days(out_dir))
    tracker.stop()

    print(json.dumps({
        "metric": "events 200x-scale run",
        "n_events": n,
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
