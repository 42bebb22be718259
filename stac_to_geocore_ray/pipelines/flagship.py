"""The flagship pipeline: footprint -> cells -> PIP join -> kNN -> tiles.

The full north-star DAG (SURVEY.md §3.4) over the fixture tables:

    read(stac_items)                        [streaming parquet source]
    -> encode_footprint                     [stateless zero-copy tasks]
    -> PIPJoiner (broadcast catalog)        [actor pool]
    -> HexKNN (broadcast centroids)         [actor pool]
    ->(join images on image_id)             [hash-partition shuffle: the
                                             only time bytes move]
    -> Tiler (decode + tile assign)         [actor pool, flat-map]
    -> groupby(hex_prefix w/ salting)       [the one all-to-all rollup]

Salting: tile rows whose hex_prefix holds more than ``salt_threshold``
of a block get a salt suffix so one dense urban cell cannot pin a
whole aggregate on one reducer; counts are unsalted by a second tiny
groupby (SURVEY.md §7.2 step 7).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..sources import fixtures
from ..stages.footprint import encode_footprint
from ..stages.util import (autoscale_pool, clean_read_parquet,
                           table_from_pandas)
from ..stages.knn import HexKNN
from ..stages.pip_join import PIPJoiner, catalog_polygons
from ..stages.tiler import Tiler


def _load_catalog(coll_path: str):
    coll = pq.read_table(coll_path)
    ids, polys = catalog_polygons(coll)
    bbs = np.asarray(coll.column("bbox").to_pylist(), dtype=np.float64)
    cx = (bbs[:, 0] + bbs[:, 2]) / 2
    cy = (bbs[:, 1] + bbs[:, 3]) / 2
    return coll, (ids, polys), (ids, cx, cy)


def metadata_pipeline(sf_dir: str, *, concurrency: int | None = None,
                      actor_threshold: int = 10_000):
    """stac_items -> footprint+cells+PIP+kNN Dataset (no image bytes).

    Stage placement heuristic: when the broadcast catalog is small
    (< ``actor_threshold`` entries) the STRtree / kNN index build costs
    microseconds, so the join runs as elastic TASKS (index rebuilt per
    task from the broadcast object — no actor ramp-up, perfect
    scaling).  A big catalog flips to the actor-pool form where the
    index builds once per actor (the ST5 pattern).
    """
    import ray
    import ray.data as rd
    p = fixtures.paths(sf_dir)
    coll, cat, knn_cat = _load_catalog(p["collections"])
    cat_ref = ray.put(cat)
    knn_ref = ray.put(knn_cat)
    ds = clean_read_parquet(p["stac_items"],
                         columns=["image_id", "item_id", "collection_id", "bbox"])
    ds = ds.map_batches(encode_footprint, batch_format="pyarrow")
    if len(coll) < actor_threshold:
        def pip_task(batch: pa.Table) -> pa.Table:
            return PIPJoiner(cat_ref)(batch)

        def knn_task(batch: pa.Table) -> pa.Table:
            return HexKNN(knn_ref)(batch)
        ds = ds.map_batches(pip_task, batch_format="pyarrow")
        ds = ds.map_batches(knn_task, batch_format="pyarrow")
        return ds
    ds = ds.map_batches(PIPJoiner, fn_constructor_args=(cat_ref,),
                        batch_format="pyarrow",
                        concurrency=autoscale_pool(concurrency))
    ds = ds.map_batches(HexKNN, fn_constructor_args=(knn_ref,),
                        batch_format="pyarrow",
                        concurrency=autoscale_pool(concurrency))
    return ds


class AlignedCoRead:
    """Zero-shuffle fragment-aligned join of images x stac_items.

    The fixture tables are co-partitioned by construction (shard k of
    images holds exactly the rows of shard k of stac_items, same
    order) — the realistic production layout where footprint metadata
    lives beside the image bytes in one Lance table.  Each task reads
    BOTH shard files and splices columns; no hash shuffle of binary
    payloads.  Falls back to ``Dataset.join`` (tile_pipeline
    join="shuffle") when inputs are not co-partitioned.
    """

    def __init__(self, images_dir: str, items_dir: str,
                 item_cols: tuple[str, ...]):
        import json
        self.images_dir = images_dir
        self.items_dir = items_dir
        self.item_cols = list(item_cols)
        # co-partition metadata: when the table root carries an
        # _ALIGNED.json manifest (shard -> rows + image_id crc32, written
        # at generation), each task checks its OWN shards' id-column
        # crc32 against the manifest entry — O(ids) not O(bytes), and it
        # catches equal-count-but-reordered shards (e.g. a stale items
        # dir zipped against regenerated images), which a row-count
        # check alone would let silently mis-splice.  Without a manifest
        # the per-task full id-list compare remains as the safety net.
        self.manifest = None
        mpath = os.path.join(os.path.dirname(os.path.normpath(images_dir)),
                             "_ALIGNED.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                self.manifest = json.load(f)

    def __call__(self, batch) -> pa.Table:
        import os

        from ..sources import lance_io
        out = []
        for shard in batch["shard"]:
            stem = f"part-{int(shard):05d}"
            name = stem + lance_io.shard_ext()
            img = lance_io.read_shard(os.path.join(self.images_dir, name),
                                      columns=["image_id", "bytes"])
            items = lance_io.read_shard(
                os.path.join(self.items_dir, name),
                columns=["image_id", "bbox", *self.item_cols])
            if self.manifest is not None:
                import zlib
                m = self.manifest.get(stem)
                if not (m and img.num_rows == items.num_rows == m["rows"]):
                    raise RuntimeError(
                        f"{stem}: shard row counts disagree with _ALIGNED "
                        "manifest")
                for side, tbl in (("images", img), ("stac_items", items)):
                    crc = zlib.crc32("\0".join(
                        tbl["image_id"].to_pylist()).encode())
                    if crc != m["ids_crc"]:
                        raise RuntimeError(
                            f"{stem}: {side} image_id crc {crc} != manifest "
                            f"{m['ids_crc']} — shards not co-partitioned "
                            "(stale/regenerated dir?); use join='shuffle'")
            else:
                if img["image_id"].to_pylist() != \
                        items["image_id"].to_pylist():
                    # NOT an assert: this is the only co-partition
                    # safety net without a manifest and must survive -O
                    raise RuntimeError(
                        f"{stem}: shards not co-partitioned; "
                        "use join='shuffle'")
            from ..stages.footprint import append_bbox_scalar_cols
            merged = append_bbox_scalar_cols(img, items)
            for c in self.item_cols:
                merged = merged.append_column(c, items[c])
            out.append(merged)
        return pa.concat_tables(out)


def tile_pipeline(sf_dir: str, *, concurrency: int | None = None,
                  num_partitions: int = 16, with_phash: bool = True,
                  passthrough: tuple[str, ...] = (), join: str = "aligned"):
    """images x stac_items -> per-tile rows (bytes decoded in actor pool).

    join="aligned" (default): fragment-aligned co-read, zero shuffle.
    join="shuffle": general hash-partitioned Dataset.join on image_id.
    """
    import ray.data as rd

    from ..sources import lance_io
    if join not in ("aligned", "shuffle"):
        raise ValueError(f"join={join!r}")
    p = fixtures.paths(sf_dir)
    if join == "aligned":
        shards = lance_io.shard_names(p["stac_items"])
        # one block per shard so the co-read fans out to one task each
        ds = rd.from_items([{"shard": i} for i in range(len(shards))],
                           override_num_blocks=len(shards))
        # both stages are stateless here (co-read holds no state; the
        # Tiler's only state is the pHash DCT table): run them as TASK
        # pools, which scale elastically with free CPUs instead of
        # waiting on actor-pool ramp-up.  The pHash variant keeps the
        # actor pool so the DCT table builds once per worker.
        coread = AlignedCoRead(p["images"], p["stac_items"], passthrough)
        joined = ds.map_batches(coread.__call__, batch_format="numpy",
                                batch_size=1)
        if with_phash:
            return joined.map_batches(
                Tiler,
                fn_constructor_kwargs={"with_phash": True,
                                       "passthrough": passthrough},
                batch_format="pyarrow",
                concurrency=autoscale_pool(concurrency, fraction=0.65))
        # NOTE: no batch_size here — input blocks are shard-sized
        # already, and an explicit batch_size makes Ray Data re-bundle
        # across blocks, copying the binary column (measured 8x slower)
        tiler = Tiler(with_phash=False, passthrough=passthrough)
        return joined.map_batches(tiler.__call__, batch_format="pyarrow")
    items = clean_read_parquet(p["stac_items"],
                            columns=["image_id", "bbox", *passthrough])

    def split_bbox_cols(batch: pa.Table) -> pa.Table:
        # the Arrow hash join rejects fixed_size_list payload columns;
        # carry the bbox as four scalar doubles instead
        from ..stages.footprint import append_bbox_scalar_cols
        return append_bbox_scalar_cols(batch.drop_columns(["bbox"]), batch)

    items = items.map_batches(split_bbox_cols, batch_format="pyarrow")
    images = clean_read_parquet(p["images"], columns=["image_id", "bytes"])
    joined = images.join(items, join_type="inner",
                         num_partitions=num_partitions, on=("image_id",))
    return joined.map_batches(
        Tiler,
        fn_constructor_kwargs={"with_phash": with_phash,
                               "passthrough": passthrough},
        batch_format="pyarrow",
        concurrency=autoscale_pool(concurrency))


def tile_rollup(tiles_ds, salt_factor: int = 8, mode: str = "tree",
                intermediate_partitions: int | None = None):
    """Per-cell tile stats: per-batch partial aggregation, then a fold.

    Phase 0 (in map_batches, NO shuffle): each batch pre-aggregates its
    tile rows to one partial row per hex_prefix — the combine step that
    keeps the exchange proportional to #cells x #batches, not #tiles
    (at 1e12 tiles the raw-row shuffle would be the pipeline).

    mode="tree" (default): fold the partials with repartition + local
    groupby instead of a sort-based shuffle.  Because the aggregate is
    ALGEBRAIC (sum/count), partial rows for the same prefix merge
    correctly at any level; key-partitioning (and therefore key salting)
    buys nothing, and skipping the sort shuffle is ~4x faster (measured
    2.9s -> 0.6s at sf0.1).  The root fold sees at most
    #prefixes x #last-level-blocks rows — bounded by grid cardinality
    (H3 res-4 has ~289k cells globally), not by data size.  For runs
    with >O(100) input blocks pass ``intermediate_partitions`` to add a
    middle fold level so the root input stays small.

    mode="salted": the two-phase salted groupby — the shape needed when
    the per-key reduction is HOLISTIC (map_groups over all of a key's
    rows), where a hot cell really would pin one reducer.  Kept tested
    as the skew-safe template for such aggregates.
    """
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if mode == "tree":
        def partial(batch: pa.Table) -> pa.Table:
            df = batch.select(["hex_prefix", "mean_intensity"]).to_pandas()
            g = df.groupby("hex_prefix", sort=False).agg(
                n_tiles=("mean_intensity", "size"),
                sum_intensity=("mean_intensity", "sum")).reset_index()
            return table_from_pandas(g, preserve_index=False)

        def fold(batch: pa.Table) -> pa.Table:
            g = batch.to_pandas().groupby("hex_prefix", sort=False).agg(
                n_tiles=("n_tiles", "sum"),
                sum_intensity=("sum_intensity", "sum")).reset_index()
            return table_from_pandas(g, preserve_index=False)

        def finish_tree(batch: pa.Table) -> pa.Table:
            return pa.table({
                "hex_prefix": batch["hex_prefix"],
                "n_tiles": pc.cast(batch["n_tiles"], pa.int64()),
                "avg_intensity": pc.divide(
                    batch["sum_intensity"],
                    pc.cast(batch["n_tiles"], pa.float64()))})

        # materialize the (tiny) partials BEFORE the fold exchange: an
        # AllToAll operator launched concurrently with the map phase
        # pins shuffle-aggregator actors on CPUs and starves the
        # decode/tile tasks — at 4 CPUs the map ran near-serially
        # (72 s vs 19 s with the barrier; at 32 CPUs the effect is a
        # few percent).  The barrier holds only per-batch partial rows
        # in the object store, never tiles or pixels.
        out = tiles_ds.map_batches(partial, batch_format="pyarrow") \
            .materialize()
        if intermediate_partitions:
            out = out.repartition(intermediate_partitions) \
                .map_batches(fold, batch_format="pyarrow")
        return out.repartition(1).map_batches(fold, batch_format="pyarrow") \
            .map_batches(finish_tree, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["image_id", "hex_prefix", "mean_intensity"]).to_pandas()
        df["salt"] = (pd.util.hash_array(df.image_id.to_numpy(dtype=object))
                      % salt_factor).astype(np.int32)
        g = df.groupby(["hex_prefix", "salt"], sort=False).agg(
            n_tiles=("mean_intensity", "size"),
            sum_intensity=("mean_intensity", "sum")).reset_index()
        return table_from_pandas(g, preserve_index=False)

    partials = tiles_ds.map_batches(partial, batch_format="pyarrow")
    # phase 1: salted fold — a hot prefix's partial rows (one per input
    # batch) split across salt_factor reducers instead of one
    salted = partials.groupby(["hex_prefix", "salt"]).aggregate(
        Sum("n_tiles", alias_name="n_tiles"),
        Sum("sum_intensity", alias_name="sum_intensity"))
    # phase 2: unsalt — at most salt_factor rows per prefix remain
    final = salted.groupby("hex_prefix").aggregate(
        Sum("n_tiles", alias_name="n_tiles"),
        Sum("sum_intensity", alias_name="sum_intensity"))

    def finish(batch: pa.Table) -> pa.Table:
        mean = pc.divide(batch["sum_intensity"],
                         pc.cast(batch["n_tiles"], pa.float64()))
        out = pa.table({
            "hex_prefix": batch["hex_prefix"],
            "n_tiles": pc.cast(batch["n_tiles"], pa.int64()),
            "avg_intensity": mean})
        return out
    return final.map_batches(finish, batch_format="pyarrow")


def tile_topk_phash_rollup(tiles_ds, k: int = 3, salt_factor: int = 8):
    """Per-cell top-k pHash by tile count — the registered end-to-end
    exerciser of the SALTED HOLISTIC template (``tile_rollup``
    mode="salted" documents the shape; this op actually needs it).

    The per-key reduction (top-k over the key's full value multiset)
    is HOLISTIC: a plain ``groupby(cell).map_groups`` would ship every
    tile row of a dense urban cell to one reducer.  The salt here
    derives from the pHash VALUE (``phash & (salt_factor-1)``), which
    buys two things a row-hash salt would not:

    - every copy of a given (cell, phash) lands in exactly ONE salt
      shard, so phase-1 per-(cell, salt) counts are FINAL — phase 2
      merges disjoint count sets per cell and is a pure top-k, no
      re-count;
    - a dense cell splits across ``salt_factor`` reducers in exact
      proportion to its distinct-hash mix (density from repetition —
      the common case — contracts inside each shard's value_counts).

    Phase-2 input is one row per distinct (cell, phash): bounded by
    content diversity, not tile count.  ``salt_factor`` must be a
    power of two (bitwise AND keeps the salt non-negative for
    negative int64 hashes, where ``%`` in C truncates toward zero).

    Skew line (BENCH/BASELINE.md round 5): one cell holding 50% of a
    synthetic tile stream, hot pHash inside it — salt_factor 8 vs 1.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    if salt_factor & (salt_factor - 1) or salt_factor <= 0:
        raise ValueError(f"salt_factor={salt_factor} must be a power of two")

    def add_salt(batch: pa.Table) -> pa.Table:
        ph = batch["tile_phash"]
        salt = pc.cast(pc.bit_wise_and(ph, salt_factor - 1), pa.int32())
        return pa.table({"hex_prefix": batch["hex_prefix"],
                         "tile_phash": ph, "salt": salt})

    def group_counts(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:                      # typed empty: sparse shuffle
            return pd.DataFrame({
                "hex_prefix": pd.Series([], dtype="int64"),
                "tile_phash": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64")})
        vc = g["tile_phash"].value_counts()
        return pd.DataFrame({
            "hex_prefix": np.full(len(vc), g["hex_prefix"].iloc[0],
                                  dtype=np.int64),
            "tile_phash": vc.index.to_numpy(),
            "n": vc.to_numpy().astype(np.int64)})

    counts = tiles_ds.map_batches(add_salt, batch_format="pyarrow") \
        .groupby(["hex_prefix", "salt"]) \
        .map_groups(group_counts, batch_format="pandas")

    def group_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "tile_phash"], ascending=[False, True],
                          kind="mergesort").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["hex_prefix", "tile_phash", "n", "rank"]]

    return counts.groupby("hex_prefix").map_groups(group_topk,
                                                   batch_format="pandas")


def flagship(sf_dir: str, *, concurrency: int | None = None,
             with_tiles: bool = True):
    """Full pipeline; returns the PIP/kNN-joined metadata Dataset and,
    when ``with_tiles``, the per-cell tile rollup Dataset."""
    meta = metadata_pipeline(sf_dir, concurrency=concurrency)
    if not with_tiles:
        return meta, None
    # rollup consumes only (hex_prefix, mean_intensity): computing
    # per-tile pHashes here would be pure waste
    tiles = tile_pipeline(sf_dir, concurrency=concurrency,
                          with_phash=False)
    return meta, tile_rollup(tiles)


def run_flagship_to_parquet(sf_dir: str, out_dir: str, *, resume: bool = True,
                            fail_after: int | None = None,
                            with_phash: bool = False,
                            on_error: str = "quarantine") -> dict:
    """Resumable flagship tile run: one output partition per input shard.

    The full write path of the north rule: partition ids derive from
    the input fragment index (stable across cluster sizes), each task
    co-reads its shard, decodes + tiles, and writes atomically via the
    manifest sink; ``resume`` skips completed partitions (anti-join).

    ``on_error="quarantine"`` (default): an undecodable image does NOT
    fail its partition — it lands in ``_quarantine/<pid>.parquet`` and
    the manifest's ``quarantined`` count; ``"raise"`` restores the
    all-or-nothing round-2 behavior.
    """
    import re as _re

    import ray

    from ..sources import lance_io
    from ..state.manifest import ManifestSink, partition_id
    p = fixtures.paths(sf_dir)
    sink = ManifestSink(out_dir)
    if resume:
        sink.clean_orphans()
    else:
        sink.reset()                          # stale manifests would make
                                              # write_partition a no-op
    # format-dispatched listing (glob('*.parquet') returns [] on a
    # Lance deployment and would report an empty run as success)
    frags = [os.path.join(p["stac_items"], nm)
             for nm in lance_io.shard_names(p["stac_items"])]
    todo = sink.plan(frags) if resume else [(f, partition_id(f)) for f in frags]
    if fail_after is not None:
        todo = todo[:fail_after]

    images_dir, items_dir = p["images"], p["stac_items"]

    @ray.remote(num_cpus=1)
    def do_shard(frag: str, pid: str, shard_idx: int) -> dict:
        coread = AlignedCoRead(images_dir, items_dir, ())
        tiler = Tiler(with_phash=with_phash, on_error=on_error)
        merged = coread({"shard": [shard_idx]})
        tiles = tiler(merged)
        return ManifestSink(out_dir).write_partition(
            pid, tiles, inputs=[frag], quarantined=tiler.take_quarantine())

    from ..stages.util import windowed_get

    def _shard_no(frag: str) -> int:
        # AlignedCoRead builds 'part-{idx:05d}' from this number, so it
        # MUST come from the basename, not the fragment's position in
        # the listing — a gap in shard numbering would silently pair
        # every later fragment with the wrong shard
        m = _re.search(r"part-(\d+)", os.path.basename(frag))
        if not m:
            raise ValueError(f"cannot derive shard index from {frag!r}")
        return int(m.group(1))

    results = windowed_get(do_shard,
                           [(f, pid, _shard_no(f)) for f, pid in todo])
    done = sink.completed()
    return {"partitions_written": len(results),
            "partitions_total": len(frags),
            "completed": len(done),
            "rows": sum(m["rows"] for m in done.values()),
            "quarantined": sum(m.get("quarantined", 0)
                               for m in done.values())}
