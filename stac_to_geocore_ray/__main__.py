"""CLI entry points — the ``ray job submit`` surface (SURVEY.md §7.2 #10).

    python -m stac_to_geocore_ray harvest  --sf-dir D --out O [--no-resume]
    python -m stac_to_geocore_ray flagship --sf-dir D --out O [--fail-after K]
    python -m stac_to_geocore_ray minhash-pairs --sf-dir D --out O [--ranges N]
    python -m stac_to_geocore_ray phash-clusters --sf-dir D --out O
    python -m stac_to_geocore_ray ivm-view --sf-dir D --out O [--deltas N]
    python -m stac_to_geocore_ray export-geocore --sf-dir D --out O [--limit N]
    python -m stac_to_geocore_ray export-csv --src TABLE.parquet --out O

On a real cluster each of these is the entrypoint of
``ray job submit -- python -m stac_to_geocore_ray ...`` — the script
owns the Ray session (guarded init), the pipelines never do.
"""

from __future__ import annotations

import argparse
import json
import sys


def _session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="stac_to_geocore_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    h = sub.add_parser("harvest", help="STAC->GeoCore harvest with manifest sink")
    h.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    h.add_argument("--out", required=True)
    h.add_argument("--no-resume", action="store_true")
    h.add_argument("--fail-after", type=int, default=None)

    f = sub.add_parser("flagship", help="resumable tile run (co-read -> tile -> write)")
    f.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    f.add_argument("--out", required=True)
    f.add_argument("--no-resume", action="store_true")
    f.add_argument("--fail-after", type=int, default=None)
    f.add_argument("--phash", action="store_true")

    mh = sub.add_parser("minhash-pairs",
                        help="checkpointed MinHash near-dup pair emission")
    mh.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    mh.add_argument("--out", required=True)
    mh.add_argument("--no-resume", action="store_true")
    mh.add_argument("--fail-after", type=int, default=None)
    mh.add_argument("--ranges", type=int, default=8)

    pc_ = sub.add_parser("phash-clusters",
                         help="checkpointed pHash connected components")
    pc_.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pc_.add_argument("--out", required=True)
    pc_.add_argument("--no-resume", action="store_true")
    pc_.add_argument("--collect-threshold", type=int, default=500_000)

    kc = sub.add_parser("kcore",
                        help="checkpointed k-core coreness run "
                             "(per-round est checkpoints)")
    kc.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    kc.add_argument("--out", required=True)
    kc.add_argument("--no-resume", action="store_true")
    kc.add_argument("--checkpoint-every", type=int, default=8)
    kc.add_argument("--fail-after", type=int, default=None)

    iv = sub.add_parser("ivm-view",
                        help="incrementally maintained hourly view "
                             "(base + late deltas, checkpointed)")
    iv.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    iv.add_argument("--out", required=True)
    iv.add_argument("--no-resume", action="store_true")
    iv.add_argument("--fail-after", type=int, default=None)
    iv.add_argument("--deltas", type=int, default=4)

    km = sub.add_parser("kmeans",
                        help="checkpointed k-means over the embeddings table")
    km.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    km.add_argument("--out", required=True)
    km.add_argument("--no-resume", action="store_true")
    km.add_argument("--fail-after", type=int, default=None)
    km.add_argument("--parts", type=int, default=4)

    pp = sub.add_parser("prep-shards",
                        help="resumable training-shard prep writer "
                             "(redact -> filters -> exact dedup)")
    pp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pp.add_argument("--out", required=True)
    pp.add_argument("--no-resume", action="store_true")
    pp.add_argument("--fail-after", type=int, default=None)
    pp.add_argument("--ranges", type=int, default=8)

    dg = sub.add_parser("dupgram-spans",
                        help="resumable substring-level dedup writer "
                             "(shared 8-gram table + per-doc span shards)")
    dg.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    dg.add_argument("--out", required=True)
    dg.add_argument("--no-resume", action="store_true")
    dg.add_argument("--fail-after", type=int, default=None)
    dg.add_argument("--ranges", type=int, default=8)

    g = sub.add_parser("export-geocore", help="translated items -> GeoCore JSON files")
    g.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    g.add_argument("--out", required=True)
    g.add_argument("--limit", type=int, default=None)

    c = sub.add_parser("export-csv", help="parquet -> CSV directory")
    c.add_argument("--src", required=True)
    c.add_argument("--out", required=True)

    args = ap.parse_args(argv)
    ray = _session()
    try:
        if args.cmd == "harvest":
            from .pipelines.geocore_harvest import run_harvest
            res = run_harvest(args.sf_dir, args.out, resume=not args.no_resume,
                              fail_after=args.fail_after)
        elif args.cmd == "flagship":
            from .pipelines.flagship import run_flagship_to_parquet
            res = run_flagship_to_parquet(args.sf_dir, args.out,
                                          resume=not args.no_resume,
                                          fail_after=args.fail_after,
                                          with_phash=args.phash)
        elif args.cmd == "minhash-pairs":
            from .pipelines.dedup_runs import run_minhash_to_parquet
            res = run_minhash_to_parquet(args.sf_dir, args.out,
                                         resume=not args.no_resume,
                                         fail_after=args.fail_after,
                                         n_ranges=args.ranges)
        elif args.cmd == "phash-clusters":
            from .pipelines.dedup_runs import run_phash_clusters_to_parquet
            res = run_phash_clusters_to_parquet(
                args.sf_dir, args.out, resume=not args.no_resume,
                collect_threshold=args.collect_threshold)
        elif args.cmd == "kcore":
            from .pipelines.graph_runs import run_kcore_to_parquet
            res = run_kcore_to_parquet(
                args.sf_dir, args.out, resume=not args.no_resume,
                checkpoint_every=args.checkpoint_every,
                fail_after_rounds=args.fail_after)
        elif args.cmd == "ivm-view":
            from .pipelines.ivm import run_hourly_view_ivm
            res = run_hourly_view_ivm(args.sf_dir, args.out,
                                      resume=not args.no_resume,
                                      fail_after=args.fail_after,
                                      n_deltas=args.deltas)
        elif args.cmd == "kmeans":
            from .pipelines.kmeans_run import run_kmeans_to_parquet
            res = run_kmeans_to_parquet(args.sf_dir, args.out,
                                        resume=not args.no_resume,
                                        fail_after_rounds=args.fail_after,
                                        n_parts=args.parts)
        elif args.cmd == "dupgram-spans":
            from .pipelines.dedup_runs import run_dupgram_to_parquet
            res = run_dupgram_to_parquet(args.sf_dir, args.out,
                                         resume=not args.no_resume,
                                         fail_after=args.fail_after,
                                         n_ranges=args.ranges)
        elif args.cmd == "prep-shards":
            from .pipelines.dedup_runs import run_prep_to_parquet
            res = run_prep_to_parquet(args.sf_dir, args.out,
                                      resume=not args.no_resume,
                                      fail_after=args.fail_after,
                                      n_ranges=args.ranges)
        elif args.cmd == "export-geocore":
            from .pipelines.geocore_harvest import items_dataset
            from .sources.exporters import write_geocore_json
            ds = items_dataset(args.sf_dir)
            if args.limit:
                ds = ds.limit(args.limit)
            res = {"out": write_geocore_json(ds, args.out)}
        else:
            from .sources.exporters import parquet_to_csv
            res = {"out": parquet_to_csv(args.src, args.out)}
        print(json.dumps(res))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
