"""Shared stage utilities."""

from __future__ import annotations


def table_from_pandas(df, **kw):
    """``pa.Table.from_pandas`` minus the pandas schema-metadata blob.

    ``from_pandas`` embeds a ``{b'pandas': ...}`` dict in the schema
    metadata; dict-bearing schemas are unhashable, so every downstream
    sort / union / repartition logs ``Failed to hash the schemas (for
    deduplication)`` per reduce task and pays the slow schema-unify
    path (seen throughout the sf1.0 tile-rollup fold).  Stripping is
    zero-copy.
    """
    import pyarrow as pa
    kw.setdefault("preserve_index", False)
    return strip_schema_metadata(pa.Table.from_pandas(df, **kw))


def strip_schema_metadata(batch):
    """Drop schema-level metadata from an Arrow table (zero-copy).

    Parquet reads and ``Table.from_pandas`` both embed a
    ``{b'pandas': ...}`` dict in the schema metadata; dict-bearing
    schemas are UNHASHABLE, so every downstream sort / union /
    repartition logs ``Failed to hash the schemas (for deduplication)``
    and pays the slow schema-unify path instead of the set() dedup
    early-exit.  This is THE one place that strip lives —
    ``table_from_pandas`` and the read-side ``_meta_read`` both route
    through it.
    """
    return batch.replace_schema_metadata(None)


def clean_read_parquet(path, *, columns=None, filesystem=None,
                       filter_columns=None, **kwargs):
    """``ray.data.read_parquet`` with an explicit METADATA-FREE schema.

    Parquet footers written by pandas embed a ``{b'pandas': ...}``
    dict in the schema metadata; dict-bearing schemas are UNHASHABLE,
    so every block handoff — including the read operator's own
    SplitBlocks — logs ``Failed to hash the schemas (for
    deduplication)`` and pays the slow schema-unify path.  Probing one
    fragment's footer and passing ``schema=`` makes the read tasks
    emit clean blocks from the start (round 4 stripped in a fused map
    AFTER the read, which left the read itself on the slow path).

    Falls back to a plain read when the footer probe fails (exotic
    layouts); that only forfeits the fast path, never correctness.
    """
    import glob as _g
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd
    probe = path[0] if isinstance(path, (list, tuple)) else path
    if filesystem is None and isinstance(probe, str) and os.path.isdir(probe):
        frags = sorted(_g.glob(os.path.join(probe, "*.parquet")))
        if frags:
            probe = frags[0]
    if "filter" in kwargs and filter_columns is None:
        # schema= fully determines the OUTPUT schema on this Ray
        # version (it overrides columns= pruning), and a row-group
        # filter binds against the given schema — a filter on an
        # out-of-projection column cannot take the schema path unless
        # the caller names those columns via ``filter_columns``.
        # Strip in a fused map instead: the read operator itself stays
        # on the slow unify path for this one call shape.
        ds = rd.read_parquet(path, columns=columns,
                             filesystem=filesystem, **kwargs)
        return ds.map_batches(strip_schema_metadata,
                              batch_format="pyarrow")
    try:
        full = pq.read_schema(probe, filesystem=filesystem).remove_metadata()
        read_cols = list(columns or full.names)
        extra = [c for c in (filter_columns or []) if c not in read_cols]
        schema = pa.schema([full.field(c) for c in read_cols + extra])
    except Exception:
        return rd.read_parquet(path, columns=columns,
                               filesystem=filesystem, **kwargs)
    ds = rd.read_parquet(path, columns=read_cols + extra, schema=schema,
                         filesystem=filesystem, **kwargs)
    if extra:
        # filter-only columns ride along through the scan (the filter
        # must bind against the schema) and drop here, a zero-copy
        # fused projection — schemas stay hashable end to end
        ds = ds.select_columns(read_cols)
    return ds


def drop_empty_blocks(ds):
    """Remove zero-row blocks from a dataset at the ref level
    (metadata-only decision; no block payload is fetched or copied).

    Ray's ``map_batches`` BYPASSES the UDF on empty input blocks and
    re-emits them as ZERO-COLUMN empties (probed on this Ray version:
    a typed-empty Arrow block in -> ``pa.table({})`` out, both batch
    formats), so typed-empty guards inside the UDF never run.  A
    zero-column block on either side of a hash join fails FieldRef
    key resolution (``No match or multiple matches for key field
    reference``).  Dropping empties is exact — they carry no rows —
    and restores one consistent schema.  Call on MATERIALIZED inputs
    only (it consumes the plan via ``iter_internal_ref_bundles``).
    """
    import ray.data as rd
    refs, dropped = [], 0
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows == 0:
                dropped += 1
            else:
                refs.append(ref)
    if not refs or dropped == 0:
        return ds                      # all-empty keeps its (one) schema
    return rd.from_arrow_refs(refs)


def default_pool_size(fraction: float = 0.25, floor: int = 1) -> int:
    """Actor-pool size that cannot starve the rest of the pipeline.

    A fixed-size actor pool RESERVES its CPUs for the whole run; two
    pools that together cover every core leave nothing for the read /
    write / shuffle tasks and the streaming executor deadlocks
    (observed on this Ray version with 4+4 pools on 8 CPUs).  Cap each
    pool at ``fraction`` of the session's CPUs.
    """
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return max(floor, int(cpus * fraction))


def autoscale_pool(requested: int | None = None,
                   fraction: float = 0.25) -> tuple[int, int]:
    """(1, k) autoscaling actor-pool bounds.

    A FIXED pool reserves min=max actors up front; chained fixed pools
    that cover the session's CPUs deadlock the streaming executor.  An
    autoscaling (1, k) pool starts at one actor and grows only while
    spare CPUs exist, so the same pipeline runs on a 4-CPU test
    session and a 32-CPU bench session unchanged.
    """
    if isinstance(requested, tuple):         # caller passed explicit bounds
        return requested
    return (1, requested if requested else default_pool_size(fraction))


def small_domain_fold(partials, keys: list[str], sum_cols: list[str]):
    """Group-SUM over per-batch partials whose distinct-key domain is
    SMALL (<= a few thousand keys) — the third aggregate regime next
    to the native ``groupby().aggregate`` (large domains, strong
    contraction) and ``sorted_combine`` (weak contraction).

    Partials over a tiny domain contract to O(domain) rows per batch,
    so the global fold is ONE repartition into a single worker task.
    A native sort-aggregate here shuffles ~200 mostly-empty partitions
    whose zero-column empty blocks trip the streaming executor's
    mixed-schema warning (lesson 28) and hand hundreds of empty blocks
    to every downstream consumer.

    The fold input is O(#input blocks x domain) rows; at a block count
    where that stops being task-sized, insert one tree level
    (``repartition(ncpu)`` + local combine) before this.  Returns a
    ONE-block Dataset with columns ``keys + sum_cols`` (one row per
    distinct key, key order unspecified).
    """
    import pandas as pd

    cols = list(keys) + list(sum_cols)

    def fold(df: pd.DataFrame):
        g = df[cols].groupby(list(keys), sort=False, dropna=False,
                             as_index=False).sum()
        return table_from_pandas(g)

    return partials.repartition(1).map_batches(
        fold, batch_format="pandas", batch_size=None)


def sorted_combine(ds, keys: list[str], sum_cols: list[str] | None = None,
                   aggs: dict[str, str] | None = None):
    """Distributed group-SUM via sort + in-block vectorized combine +
    boundary-key fold — the replacement for ``groupby().aggregate(Sum)``
    when per-block partials barely contract (key cardinality comparable
    to rows-per-block, e.g. per-user pivots or value histograms).

    Ray's sort-based Aggregate reduce is per-row Python: at 20M events
    the (event_type, cents) histogram aggregate burned 816 s remote
    wall over ~7M weakly-contracted partial rows (~100 us/row), while a
    full 20M-row SORT costs ~3 s on the same session.  This routes the
    same sum through the sort path: one distributed sort on ``keys``
    makes each key contiguous, one pandas groupby-sum per block
    combines it, and only each block's FIRST and LAST key (the only
    keys that can straddle blocks) defer to a single-task fold whose
    input is <= 2 rows per block — independent of key cardinality.

    ``aggs`` maps value column -> one of ``sum | min | max`` (all
    reassociative, so block-combine then fold-combine is exact);
    ``sum_cols`` is shorthand for all-sum.  Returns a Dataset with
    columns ``keys + value cols`` (one row per distinct key).  All
    dtype handling is slice-derived (``df[:0]``), so empty blocks keep
    the full schema.
    """
    import numpy as np
    import pandas as pd

    if aggs is None:
        aggs = {c: "sum" for c in (sum_cols or [])}
    bad = {f for f in aggs.values() if f not in ("sum", "min", "max")}
    if bad or not aggs:
        raise ValueError(f"sorted_combine: unsupported aggs {bad or aggs}")
    cols = list(keys) + list(aggs)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols]
        if len(df) == 0:
            return df.assign(_boundary=pd.Series([], dtype=bool))
        # dropna=False: a null key is a group like any other — the
        # pandas default silently DROPS those rows (advice r4)
        g = df.groupby(list(keys), sort=False, as_index=False,
                       dropna=False).agg(aggs)
        boundary = np.zeros(len(g), dtype=bool)
        boundary[0] = True          # sorted input: only the block's
        boundary[-1] = True         # first/last key can straddle blocks
        g["_boundary"] = boundary
        return g

    # combined-size intermediate (<= one row per distinct key per
    # block), materialized once for its two consumers
    mixed = ds.sort(list(keys)) \
        .map_batches(combine, batch_format="pandas").materialize()

    # every emission goes back to Arrow through table_from_pandas so
    # blocks stay metadata-free: the repartition/union path otherwise
    # re-embeds the {b'pandas': ...} dict and a downstream hash-shuffle
    # consumer (e.g. q3's join) logs "Failed to hash the schemas" and
    # pays the slow unify path per reduce task (round-5 finding)
    finals = mixed.map_batches(
        lambda g: table_from_pandas(g.loc[~g["_boundary"], cols]),
        batch_format="pandas")

    def fold(g: pd.DataFrame):
        if len(g) == 0:
            return table_from_pandas(g[cols])
        return table_from_pandas(
            g.groupby(list(keys), sort=False, as_index=False,
                      dropna=False).agg(aggs)[cols])

    folded = mixed.map_batches(
        lambda g: table_from_pandas(g.loc[g["_boundary"], cols]),
        batch_format="pandas") \
        .repartition(1).map_batches(fold, batch_format="pandas")
    return finals.union(folded)


def _filler(dtype, n: int, index):
    """Typed padding column for schema-unioning mixed blocks."""
    import numpy as np
    import pandas as pd
    # pandas extension dtypes (Categorical, Int64, ArrowDtype) raise
    # TypeError in np.dtype(); pad them as object/None (review finding)
    try:
        kind = np.dtype(dtype).kind \
            if not str(dtype).startswith("datetime") else "M"
    except TypeError:
        kind = "O"
    if kind == "M":
        return pd.Series([pd.NaT] * n, dtype="datetime64[us]", index=index)
    if kind == "f":
        return pd.Series(np.full(n, np.nan), index=index)
    if kind in ("i", "u"):
        return pd.Series(np.zeros(n, dtype=dtype), index=index)
    if kind == "b":
        return pd.Series(np.zeros(n, dtype=bool), index=index)
    return pd.Series([None] * n, dtype=object, index=index)


def keyed_boundary_decompose(ds, sort_keys: list[str], key_col: str,
                             raw_cols: list[str], kernel,
                             batch_size: int = 256 * 1024):
    """The sorted-stream per-key decomposition shared by the window /
    as-of / retention operators (was three near-verbatim copies —
    review finding):

    1. one distributed sort on ``sort_keys`` makes each ``key_col``
       value a contiguous run;
    2. every INTERIOR key of a block resolves fully in-block through
       ``kernel`` (a vectorized fn: sorted frame with complete key
       runs -> output frame; must return a TYPED empty on empty
       input — its empty return defines the output schema);
    3. only rows of each block's first/last key defer (raw) to a
       KEYED fold — groupby(key) -> kernel per group — so a hot key
       parallelizes across fold groups instead of funnelling through
       one task.  Deferred volume is bounded by block-straddling
       keys' rows.

    Returns a Dataset with the kernel's output columns.
    """
    import pandas as pd

    def split_block(df: pd.DataFrame) -> pd.DataFrame:
        out_empty = kernel(df.iloc[0:0])
        out_cols = list(out_empty.columns)
        extra_raw = [c for c in raw_cols if c not in out_cols]
        if len(df) == 0:
            mixed = out_empty.copy()
            for c in extra_raw:
                mixed[c] = _filler(df.dtypes[c], 0, mixed.index)
            mixed["deferred"] = pd.Series([], dtype=bool)
            return mixed
        k = df[key_col].to_numpy()
        boundary = (k == k[0]) | (k == k[-1])
        interior = kernel(df.loc[~boundary])
        for c in extra_raw:
            interior[c] = _filler(df.dtypes[c], len(interior),
                                  interior.index)
        interior["deferred"] = False
        raw = df.loc[boundary, raw_cols].copy()
        for c in out_cols:
            if c not in raw.columns:
                raw[c] = _filler(out_empty.dtypes[c], len(raw), raw.index)
        raw["deferred"] = True
        return pd.concat([interior, raw[interior.columns]],
                         ignore_index=True)

    # bounded split batches (the lesson-23 shape: multi-copy pandas
    # kernels thrash on multi-million-row whole blocks); batches are
    # consecutive slices of the sorted stream, so the boundary-key
    # argument holds per BATCH — finer batches just defer a few more
    # (first/last) keys to the fold, still <= 2 per batch
    mixed = ds.sort(sort_keys) \
        .map_batches(split_block, batch_format="pandas",
                     batch_size=batch_size).materialize()

    _cols_cache: list = []                    # out_cols are run-invariant

    # emissions route through table_from_pandas: pandas-block returns
    # embed a dict schema-metadata blob, and every downstream hash
    # join / sort / union on the result then logs `Failed to hash the
    # schemas` per reduce task and pays the slow unify path (the same
    # defect fixed in sorted_combine's repartition/union tail)
    def take_done(g: pd.DataFrame):
        if not _cols_cache:
            _cols_cache.append(list(kernel(g.iloc[0:0]).columns))
        return table_from_pandas(g.loc[~g["deferred"], _cols_cache[0]])

    def take_deferred(g: pd.DataFrame) -> pd.DataFrame:
        return g.loc[g["deferred"], raw_cols]

    def fold(g: pd.DataFrame):
        return table_from_pandas(kernel(g.sort_values(sort_keys)))

    done = mixed.map_batches(take_done, batch_format="pandas")
    deferred = mixed.map_batches(take_deferred, batch_format="pandas") \
        .groupby(key_col).map_groups(fold, batch_format="pandas") \
        .materialize()
    # the fold's sort shuffle emits ~#partitions blocks over (at most)
    # 2 straddler keys per input block, so most partitions are EMPTY
    # and surface as zero-column blocks (lesson 28's bypass) — the one
    # remaining source of the executor's mixed-schema warning at 20M+
    # on every kbd op.  The deferred branch is output-small (straddler
    # keys only), so pinning it and dropping empty refs is a
    # metadata-only cleanup, not a streaming break.
    deferred = drop_empty_blocks(deferred)
    return done.union(deferred)


def windowed_get(task_fn, args_list, window: int | None = None) -> list:
    """Submit Ray tasks in bounded windows (backpressure-polite fan-out).

    ``ray.get([...1e6 refs...])`` floods the driver with futures; this
    keeps at most ``window`` (default 4 x CPUs) in flight — the
    idiomatic ray.wait loop for very wide per-partition task fans.
    """
    import ray
    if window is None:
        window = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))
    results = []
    in_flight = {}
    it = iter(args_list)
    exhausted = False
    while in_flight or not exhausted:
        while not exhausted and len(in_flight) < window:
            try:
                args = next(it)
            except StopIteration:
                exhausted = True
                break
            ref = task_fn.remote(*args)
            in_flight[ref] = True
        if not in_flight:
            break
        done, _ = ray.wait(list(in_flight), num_returns=1)
        for ref in done:
            results.append(ray.get(ref))
            del in_flight[ref]
    return results


def scan_sorted_blocks(ds, block_fn):
    """Order-preserving per-block map over a SORTED, MATERIALIZED
    Dataset — the building block for distributed PREFIX SCANS (global
    running aggregates with cross-block carry), the one sequential-
    looking op class Ray Data has no native form for.

    A materialized sorted Dataset's blocks are DISJOINT key ranges,
    but ``iter_internal_ref_bundles`` yields them in task-COMPLETION
    order (measured), so ``block_fn`` must capture each block's
    min/max sort key in its summary; the caller reorders summaries by
    min key, VERIFIES range-disjointness (fail loud), and runs an
    O(#blocks) driver-side exclusive scan over them — the classic
    two-phase parallel scan with phase two fused into phase one
    because the carry enters additively.  Returns ``[block_fn(b) for b
    in blocks]`` in arbitrary order; empty blocks are passed through
    (block_fn sees them).
    """
    import ray
    refs = [ref for bundle in ds.iter_internal_ref_bundles()
            for ref, _meta in bundle.blocks]

    @ray.remote
    def _run(block):
        return block_fn(block)

    return windowed_get(_run, [(r,) for r in refs])
