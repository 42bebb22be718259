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
