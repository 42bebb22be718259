"""DataContext tuning for wide-binary-row image pipelines.

One place that encodes the memory-aware sizing rules (SURVEY.md §4.2,
BASELINE.json scale notes); call from the session owner (bench.py,
CLI, driver) — never at import.

The knobs and their reasoning:

- ``target_max_block_size``: an images block holds ~1024 rows x ~50 KB
  encoded = ~50 MB; decoded pixels transiently triple that inside the
  tiler task.  128 MiB (default) is right for encoded blocks; DROP it
  to 32-64 MiB if rows carry multi-MB payloads so the executor splits
  blocks before they dominate a worker heap.
- batch sizing: DON'T set ``batch_size`` on stages whose input blocks
  are already shard-sized — Ray Data re-bundles across blocks and
  copies binary columns (measured 8x slower on the tile stage).
  Control granularity at the SOURCE (shard size / block size).
- actor pools: always autoscaling (1, k); chained full-size fixed
  pools deadlock the streaming executor (stages/util.py).
"""

from __future__ import annotations

from .stages.util import table_from_pandas


def key_skew_report(ds, key: str, top: int = 5,
                    salt_share_threshold: float = 0.2) -> dict:
    """Measure groupby-key skew before committing to a shuffle.

    Per-batch partial counts (the corpus never collects), one small
    aggregate, then the driver reads only the per-key count table.
    Returns {n_keys, n_rows, top: [(key, share)], recommended_salt}:
    a key above ``salt_share_threshold`` of all rows would pin its
    reducer, and the recommended salt factor spreads the hottest key
    to roughly the threshold share.  This is the measurement step the
    salted tile rollup assumes (SURVEY.md §4.2 'salt factor chosen
    when the groupby count histogram exceeds threshold').
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table):
        import pandas as pd
        df = batch.select([key]).to_pandas()
        g = df.groupby(key, sort=False).size().reset_index(name="n")
        return table_from_pandas(g, preserve_index=False)

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key).aggregate(Sum("n", alias_name="n")).to_pandas()
    total = int(counts.n.sum())
    counts = counts.sort_values("n", ascending=False)
    head = counts.head(top)
    top_rows = list(zip(head[key].tolist(),
                        (head["n"] / total).astype(float).tolist()))
    hot = top_rows[0][1] if top_rows else 0.0
    salt = 1
    if hot > salt_share_threshold:
        salt = int(-(-hot // salt_share_threshold))   # ceil
    return {"n_keys": len(counts), "n_rows": total,
            "top": top_rows, "recommended_salt": salt}


def configure_for_images(max_payload_mb: float = 0.1) -> None:
    """Tune the current DataContext for binary-image pipelines.

    ``max_payload_mb``: expected upper bound of one row's binary
    payload; block size shrinks when single rows get fat so
    (rows_per_block x payload) stays within a worker's comfort zone.
    """
    from ray.data import DataContext
    ctx = DataContext.get_current()
    if max_payload_mb >= 2.0:
        ctx.target_max_block_size = 32 * 1024 * 1024
    elif max_payload_mb >= 0.5:
        ctx.target_max_block_size = 64 * 1024 * 1024
    # else: keep the 128 MiB default — small encoded rows pack fine
    ctx.execution_options.preserve_order = False
