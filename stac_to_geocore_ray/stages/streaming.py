"""Event-time tumbling windows over an out-of-order stream (bucket actors).

Ray Data has no event-time windows or watermarks; this stage supplies
the streaming-shaped semantics with the guide's bucket-actor recipe:
the key space hashes onto N ``WindowBucket`` actors, feeder tasks
route each batch's rows to their buckets, and every bucket maintains
open tumbling-window partials, advancing a per-bucket WATERMARK
(max event time seen - allowed lateness).  A window finalizes — and is
EMITTED as ordinary Dataset rows from the feeder — once the watermark
passes its end; events arriving after their window finalized are
counted and dropped (the late-data policy).

Scale shape: feeders are a plain ``map_batches`` fan-out (arrival
order = block arrival, the simulated log); state lives only in the N
bucket actors and is bounded by (open windows x keys-per-bucket), not
by stream length; emitted windows flow through the normal streaming
executor.  With ``allowed_lateness`` large enough to cover the
stream's disorder, the result equals the batch GROUP BY — which is
what the SQL oracle checks; with tight lateness the drop policy is
arrival-order-dependent (documented, unit-tested with a controlled
ordered feed).

Aggregates are (count, integer-cents sum) so finalized values are
exact under any arrival order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


@ray.remote(num_cpus=0.25)
class WindowBucket:
    """One key-hash bucket: open-window partials + watermark + late count."""

    def __init__(self, window_us: int, lateness_us: int):
        self.window_us = window_us
        self.lateness_us = lateness_us
        self.open: dict[tuple, list] = {}     # (key, wstart) -> [n, cents]
        self.finalized: set[tuple] = set()
        self.watermark = -(1 << 62)
        self.late = 0

    def ingest(self, keys: list, ts_us: np.ndarray,
               cents: np.ndarray) -> pa.Table:
        wstart = (ts_us // self.window_us) * self.window_us
        for k, w, t, c in zip(keys, wstart.tolist(), ts_us.tolist(),
                              cents.tolist()):
            kk = (k, w)
            if kk in self.finalized:
                self.late += 1               # beyond lateness: drop + count
                continue
            row = self.open.setdefault(kk, [0, 0])
            row[0] += 1
            row[1] += c
        new_max = int(ts_us.max()) if len(ts_us) else self.watermark
        self.watermark = max(self.watermark, new_max - self.lateness_us)
        return self._emit_ripe()

    def _emit_ripe(self) -> pa.Table:
        ripe = [kk for kk in self.open
                if kk[1] + self.window_us <= self.watermark]
        rows = []
        for kk in ripe:
            n, cents = self.open.pop(kk)
            self.finalized.add(kk)
            rows.append((kk[0], kk[1], n, cents))
        return _windows_table(rows)

    def flush(self) -> pa.Table:
        rows = [(k, w, n, c) for (k, w), (n, c) in self.open.items()]
        self.open.clear()
        return _windows_table(rows)

    def late_count(self) -> int:
        return self.late


def _windows_table(rows) -> pa.Table:
    return pa.table({
        "key": pa.array([r[0] for r in rows], pa.string()),
        "window_start": pa.array([r[1] for r in rows], pa.int64()),
        "n": pa.array([r[2] for r in rows], pa.int64()),
        "sum_cents": pa.array([r[3] for r in rows], pa.int64())})


class WindowFeeder:
    """map_batches callable: routes rows to bucket actors, emits the
    windows those ingests finalized."""

    def __init__(self, buckets: list, key_col: str, ts_col: str,
                 value_col: str):
        self.buckets = buckets
        self.key_col, self.ts_col, self.value_col = key_col, ts_col, value_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if len(df) == 0:
            return _windows_table([])
        ts_us = df[self.ts_col].to_numpy("datetime64[us]").astype("int64")
        cents = np.round(df[self.value_col].to_numpy() * 100).astype("int64")
        keys = df[self.key_col].astype(str)
        bucket_of = (pd.util.hash_array(keys.to_numpy(dtype=object))
                     % len(self.buckets)).astype(np.int64)
        futs = []
        for b in np.unique(bucket_of):
            m = bucket_of == b
            futs.append(self.buckets[int(b)].ingest.remote(
                keys[m].tolist(), ts_us[m], cents[m]))
        outs = [t for t in ray.get(futs) if t.num_rows]
        return pa.concat_tables(outs) if outs else _windows_table([])


def stream_tumbling_windows(events_ds, *, key_col: str, ts_col: str,
                            value_col: str, window_us: int,
                            lateness_us: int, n_buckets: int = 4):
    """Run the stream through bucket actors; returns (windows Dataset
    builder result as a pyarrow Table, late_count).

    The emitted-on-the-fly windows stream out of the feeder stage; the
    final ``flush`` drains windows still open at end-of-stream (their
    watermark never passed — at a real deployment the stream has no
    end and these stay open)."""
    import ray.data as rd

    buckets = [WindowBucket.remote(window_us, lateness_us)
               for _ in range(n_buckets)]
    emitted = events_ds.map_batches(
        WindowFeeder(buckets, key_col, ts_col, value_col).__call__,
        batch_format="pyarrow")
    emitted_tbl = pa.concat_tables(
        list(emitted.iter_batches(batch_format="pyarrow"))
        or [_windows_table([])])
    tails = ray.get([b.flush.remote() for b in buckets])
    late = sum(ray.get([b.late_count.remote() for b in buckets]))
    for b in buckets:                         # release the CPU reservations
        ray.kill(b)
    full = pa.concat_tables([emitted_tbl, *tails])
    return full, late
