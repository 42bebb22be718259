"""IVM scale probe: incremental apply vs full recompute at 20M events.

The fixture interleaves "late" rows (event_id % 10 == 7) inside one
corpus, but in a real ingest late data arrives as its OWN files.  This
probe makes the IVM cost model honest at scale:

1. STAGE (once, part of ingest): split the late rows into per-delta
   parquet directories — the shape a deployment receives them in.
2. MEASURE: the full recompute over all N rows, the base view over the
   on-time ~90%, and each delta application reading ONLY its staged
   slice (~N/10/n_deltas rows) + the O(view)-sized driver merge.
3. VERIFY: the maintained view equals the full recompute cell-by-cell.

The claim under test: delta-apply cost is proportional to the DELTA,
not the corpus — the property the reference's re-harvest-everything
loop lacks (stac-to-geocore/stac_to_geocore.py lambda_handler re-uploads
every record per run).

Usage:
    python tools/probe_ivm.py [corpus_dir] [--deltas 4]

Owns its Ray session (like bench.py); not imported by __ray_entry__.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE_ROOT = "/tmp/stgr_scale/ivm_staged"


def stage_late_slices(corpus_dir: str, n_deltas: int) -> list[str]:
    """One filtered pass over the corpus writes each late slice as its
    own events.parquet directory (resumable via per-slice markers)."""
    import ray.data as rd

    from stac_to_geocore_ray.pipelines.ivm import _keep_delta_on
    from stac_to_geocore_ray.queries._common import _meta_read, _t

    dirs = [os.path.join(STAGE_ROOT, f"{n_deltas}way-{j}")
            for j in range(n_deltas)]
    todo = [j for j, d in enumerate(dirs)
            if not os.path.exists(os.path.join(d, "_COMPLETE"))]
    for j in todo:
        keep = _keep_delta_on("event_id", j, n_deltas)
        ds = _meta_read(_t(corpus_dir, "events"),
                        columns=["event_id", "ts", "event_type", "value"])
        out = os.path.join(dirs[j], "events.parquet")
        os.makedirs(out, exist_ok=True)
        ds.map_batches(keep, batch_format="pyarrow").write_parquet(out)
        with open(os.path.join(dirs[j], "_COMPLETE"), "w") as f:
            f.write(f"corpus={corpus_dir};n_deltas={n_deltas};j={j}\n")
    return dirs


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    corpus = args[0] if args else "/tmp/stgr_scale/events20m"
    n_deltas = int(sys.argv[sys.argv.index("--deltas") + 1]) \
        if "--deltas" in sys.argv else 4
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from stac_to_geocore_ray.pipelines.ivm import (_keep_base_on,
                                                   _view_partials,
                                                   merge_views)

    # warm the worker pool (same convention as scale_events.py);
    # clean_read_parquet keeps the schema-metadata strip at the read
    from stac_to_geocore_ray.stages.util import clean_read_parquet
    clean_read_parquet(os.path.join(corpus, "events.parquet"),
                       columns=["event_id"]).count()

    t0 = time.time()
    staged = stage_late_slices(corpus, n_deltas)
    stage_s = round(time.time() - t0, 2)

    ident = lambda b: b                                      # noqa: E731

    t0 = time.time()
    full = _view_partials(corpus, ident)
    full_cold_s = round(time.time() - t0, 2)
    # warm re-run for an order-fair speedup (staging's write I/O cools
    # the page cache for the first pass; deltas run later and warm)
    t0 = time.time()
    full = _view_partials(corpus, ident)
    full_s = round(time.time() - t0, 2)

    t0 = time.time()
    view = _view_partials(corpus, _keep_base_on("event_id"))
    base_s = round(time.time() - t0, 2)

    delta_s = []
    for d in staged:
        t0 = time.time()
        delta = _view_partials(d, ident)
        view = merge_views(view, delta)
        delta_s.append(round(time.time() - t0, 2))

    ok = view.equals(full)
    n_rows = clean_read_parquet(os.path.join(corpus, "events.parquet"),
                                columns=["event_id"]).count()
    print(json.dumps({
        "probe": "ivm_incremental_vs_recompute", "corpus": corpus,
        "n_events": n_rows, "n_deltas": n_deltas, "num_cpus": num_cpus,
        "stage_sec": stage_s, "full_recompute_sec": full_s,
        "full_recompute_cold_sec": full_cold_s,
        "base_view_sec": base_s, "delta_apply_sec": delta_s,
        "mean_delta_sec": round(sum(delta_s) / len(delta_s), 2),
        "speedup_vs_recompute":
            round(full_s / (sum(delta_s) / len(delta_s)), 1),
        "incremental_equals_recompute": bool(ok),
        "view_rows": view.num_rows}))
    ray.shutdown()


if __name__ == "__main__":
    main()
