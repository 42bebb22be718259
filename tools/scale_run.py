"""10x-scale measured run (r3 verdict #2): sf1.0 = 1M images.

Runs the headline pipeline (spatial join + tile assignment),
phash_near_dedup, and phash_dedup_clusters (distributed label
propagation) against the sf1.0 fixture (~36 GB of encoded image
bytes), tracking peak driver RSS and peak object-store usage, and
compares throughput against the sf0.1 bench line for the
linearity claim.

Usage:  python tools/scale_run.py [sf_dir] [--queries a,b,c]
Default sf_dir /tmp/stgr_scale/sf1.0 (name carries the scale; the
fixture generator derives n_images from the basename).

Owns its Ray session (like bench.py); not imported by __ray_entry__.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class PeakTracker(threading.Thread):
    """Samples driver RSS + cluster object-store usage every 0.5 s."""

    def __init__(self):
        super().__init__(daemon=True)
        self.peak_rss_gb = 0.0
        self.peak_store_gb = 0.0
        # NOT named _stop: threading.Thread uses self._stop() internally
        # (join() calls it once the thread exits — shadowing it with an
        # Event raises "'Event' object is not callable" at join time)
        self._halt = threading.Event()

    def run(self):
        import ray
        total = ray.cluster_resources().get("object_store_memory", 0.0)
        while not self._halt.is_set():
            try:
                with open("/proc/self/status") as f:
                    for line in f:
                        if line.startswith("VmRSS:"):
                            rss = int(line.split()[1]) / (1 << 20)
                            self.peak_rss_gb = max(self.peak_rss_gb, rss)
                avail = ray.available_resources().get(
                    "object_store_memory", total)
                used = (total - avail) / (1 << 30)
                self.peak_store_gb = max(self.peak_store_gb, used)
            except Exception:
                pass
            self._halt.wait(0.5)

    def stop(self):
        self._halt.set()


def result_rows(out) -> int:
    """Row count of a query result (Dataset / Arrow table / frame).
    pandas frames are length-checked BEFORE the count() probe — a
    DataFrame.count() is a per-column Series, not a row count."""
    if hasattr(out, "num_rows"):
        return out.num_rows
    try:
        return len(out)          # frames; Dataset DEFINES __len__ but
    except Exception:            # raises — fall through to count()
        return out.count()


def make_timed(timings: dict, counts: dict, only=None):
    """Shared measurement closure for the tools/scale_* harnesses
    (was copy-pasted three times — review finding): runs fn, counts
    rows, records seconds, prints one progress line."""
    def timed(name, fn):
        if only and name not in only:
            return
        t = time.time()
        counts[name] = result_rows(fn())
        timings[name] = round(time.time() - t, 3)
        print(f"  {name}: {timings[name]}s  rows={counts[name]}",
              flush=True)
    return timed


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/tmp/stgr_scale/sf1.0"
    only = None
    if "--queries" in sys.argv:
        only = sys.argv[sys.argv.index("--queries") + 1].split(",")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from stac_to_geocore_ray.tuning import configure_for_images
    configure_for_images(max_payload_mb=0.1)

    from stac_to_geocore_ray import queries as q
    from stac_to_geocore_ray.pipelines import flagship
    from stac_to_geocore_ray.sources import fixtures

    assert os.path.exists(os.path.join(fixtures.fixture_dir(sf_dir),
                                       "_COMPLETE")), \
        f"fixture for {sf_dir} not generated yet"
    n_images = fixtures.n_images_for(sf_dir)

    tracker = PeakTracker()
    tracker.start()
    timings: dict[str, float] = {}

    def timed(name, fn):
        if only and name not in only:
            return None
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        print(f"  {name}: {timings[name]}s", flush=True)
        return out

    # headline (same two phases as bench.py, cold — at this scale the
    # 36 GB input does not fit page cache, matching a real cold read)
    timed("spatial_join", lambda: flagship.metadata_pipeline(sf_dir).count())
    timed("tile_assign", lambda: flagship.tile_rollup(
        flagship.tile_pipeline(sf_dir, with_phash=False),
        intermediate_partitions=32).count())
    timed("phash_near_dedup", lambda: q.phash_near_dedup(sf_dir).count())
    timed("phash_dedup_clusters",
          lambda: q.phash_dedup_clusters(sf_dir).count())

    tracker.stop()
    headline = timings.get("spatial_join", 0) + timings.get("tile_assign", 0)
    out = {
        "metric": "sf1.0 10x-scale run",
        "sf": os.path.basename(sf_dir),
        "n_images": n_images,
        "num_cpus": num_cpus,
        "queries": timings,
        "headline_sec": round(headline, 3),
        "images_per_sec": round(n_images / headline, 1) if headline else None,
        "peak_driver_rss_gb": round(tracker.peak_rss_gb, 2),
        "peak_object_store_gb": round(tracker.peak_store_gb, 2),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
