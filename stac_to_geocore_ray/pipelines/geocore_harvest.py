"""The GeoCore harvest pipeline — the reference's lambda_handler as Ray Data.

Reproduces the reference's three phases (app.py:36-170; SURVEY.md §3.1)
as one streaming job with a resumable manifest sink:

- PHASE root:       single-row translate (driver-side, trivially small)
- PHASE collections: small-table translate (one batch)
- PHASE items:      ``map_batches(ItemTranslator)`` actor pool with the
                    broadcast collection lookup (J1), streamed from the
                    stac_items parquet fragments
- sink:             per-input-fragment partitions + lineage manifests
                    (state/manifest.py) instead of delete-all-rewrite

``resume=True`` skips fragments whose manifest already exists — the
kill-after-k-partitions test (SURVEY.md §5.2 #5) re-runs only the rest
and the final output set is byte-identical.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..config import DEFAULT_CONFIG, TranslateConfig
from ..sources import fixtures
from ..stages.geocore import (ItemTranslator, collection_lookup,
                              translate_collections, translate_root)
from ..stages.util import autoscale_pool, clean_read_parquet
from ..state.manifest import ManifestSink, partition_id


def harvest_small_sides(sf_dir: str, cfg: TranslateConfig = DEFAULT_CONFIG):
    """Root + collections records (the reference's phases 1-2)."""
    p = fixtures.paths(sf_dir)
    coll = pq.read_table(p["collections"])
    root_row = pq.read_table(p["catalog_root"]).to_pylist()[0]
    # quirk #7: root bbox is the SECOND collection's bbox (app.py:82)
    root_bbox = coll.column("bbox").to_pylist()[1]
    root_rec = translate_root(root_row, root_bbox, cfg)
    coll_recs = translate_collections(coll, cfg)
    return root_rec, coll_recs


def items_dataset(sf_dir: str, cfg: TranslateConfig = DEFAULT_CONFIG,
                  concurrency: int | None = None,
                  actor_threshold: int = 10_000):
    """The streaming per-item translate Dataset (phase 3).

    Same stage-placement heuristic as flagship.metadata_pipeline: with
    a small broadcast lookup (< ``actor_threshold`` collections) the
    per-task state build costs microseconds, so the translate runs as
    elastic TASKS — no actor-pool ramp-up, scales to every free CPU
    immediately.  A big lookup flips to the actor-pool form where the
    state builds once per actor (ST5)."""
    import ray
    import ray.data as rd
    p = fixtures.paths(sf_dir)
    coll = pq.read_table(p["collections"])
    lookup = collection_lookup(coll)
    lookup_ref = ray.put(lookup)
    ds = clean_read_parquet(p["stac_items"])
    if len(lookup) < actor_threshold:
        def translate_task(batch):
            return ItemTranslator(lookup_ref, cfg)(batch)
        return ds.map_batches(translate_task, batch_format="pyarrow")
    return ds.map_batches(ItemTranslator, fn_constructor_args=(lookup_ref, cfg),
                          batch_format="pyarrow",
                          concurrency=autoscale_pool(concurrency))


def run_harvest(sf_dir: str, out_dir: str, cfg: TranslateConfig = DEFAULT_CONFIG,
                resume: bool = True, fail_after: int | None = None,
                on_error: str = "quarantine") -> dict:
    """Manifest-sinked harvest over the stac_items fragments.

    Per-fragment Ray tasks (fragment = partition: ids stable across
    cluster sizes) translate and write atomically; ``fail_after`` stops
    after k partitions to exercise resume in tests.  A record whose
    link/asset structs fail the flatten is quarantined (dead-letter
    parquet + manifest count) instead of failing the partition
    (``on_error="raise"`` restores all-or-nothing).
    """
    import ray
    p = fixtures.paths(sf_dir)
    coll = pq.read_table(p["collections"])
    lookup_ref = ray.put(collection_lookup(coll))
    sink = ManifestSink(out_dir)
    if resume:
        sink.clean_orphans()
    else:
        # non-resume into a used out_dir: without this, write_partition's
        # is_done() check silently retains stale data (ADVICE r3)
        sink.reset()
    from ..sources import lance_io
    names = lance_io.shard_names(p["stac_items"])
    if not names:
        raise FileNotFoundError(
            f"no input shards under {p['stac_items']} "
            f"(format-dispatched listing, ext={lance_io.shard_ext()})")
    frags = [os.path.join(p["stac_items"], n) for n in names]
    todo = sink.plan(frags) if resume else [(f, partition_id(f)) for f in frags]

    @ray.remote(num_cpus=1)
    def do_partition(frag: str, pid: str) -> dict:
        translator = ItemTranslator(lookup_ref, cfg, on_error=on_error)
        tbl = pq.read_table(frag)
        out = translator(tbl)
        out = out.drop_columns(["options"])   # nested col: keep sink flat
        return ManifestSink(out_dir).write_partition(
            pid, out, inputs=[frag],
            quarantined=translator.take_quarantine())

    if fail_after is not None:
        todo = todo[:fail_after]
    from ..stages.util import windowed_get
    results = windowed_get(do_partition, list(todo))

    # small sides (root + collections) land in their own partition
    root_rec, coll_recs = harvest_small_sides(sf_dir, cfg)
    small_pid = "smallsides-" + partition_id("root+collections")
    if not resume or not sink.is_done(small_pid):
        small = coll_recs.drop_columns(["options"])
        sink.write_partition(small_pid, small, inputs=["collections.parquet"])
    done = sink.completed()
    return {"partitions_written": len(results), "partitions_total": len(frags) + 1,
            "completed": len(done), "root_id": root_rec["id"]}
