"""Bucket-actor event-time windows: watermark finalization + late-data
policy under a controlled ORDERED feed (stages/streaming.py)."""

import numpy as np
import pyarrow as pa
import ray


def _ingest(bucket, rows):
    """rows: list of (key, ts_us, cents)."""
    keys = [r[0] for r in rows]
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    cents = np.array([r[2] for r in rows], dtype=np.int64)
    return ray.get(bucket.ingest.remote(keys, ts, cents))


class TestWindowBucket:
    def test_watermark_finalizes_and_drops_late(self, ray_session):
        from stac_to_geocore_ray.stages.streaming import WindowBucket
        W = 100          # window 100us, lateness 50us
        b = WindowBucket.remote(W, 50)

        # window [0,100): two events
        out = _ingest(b, [("a", 10, 1), ("a", 90, 2)])
        assert out.num_rows == 0                   # watermark 90-50=40 < 100
        # event at 250 -> watermark 200: window 0 finalizes
        out = _ingest(b, [("a", 250, 5)])
        got = out.to_pylist()
        assert got == [{"key": "a", "window_start": 0, "n": 2, "sum_cents": 3}]
        # late event for the finalized window 0 -> dropped + counted
        out = _ingest(b, [("a", 20, 99)])
        assert out.num_rows == 0
        assert ray.get(b.late_count.remote()) == 1
        # an out-of-order event whose window was NEVER OPENED before the
        # watermark passed is still accepted (only finalized windows
        # refuse rows); its window is immediately ripe and emits in the
        # same ingest
        out = _ingest(b, [("a", 150, 7)])
        assert out.to_pylist() == [{"key": "a", "window_start": 100,
                                    "n": 1, "sum_cents": 7}]
        # the 250 event's window [200,300) is still open at flush
        tail = ray.get(b.flush.remote()).to_pylist()
        all_rows = {(r["key"], r["window_start"]): (r["n"], r["sum_cents"])
                    for r in tail}
        assert all_rows == {("a", 200): (1, 5)}

    def test_stream_equals_batch_groupby_when_lateness_covers(self, ray_session):
        import pandas as pd
        import ray.data as rd
        from stac_to_geocore_ray.stages.streaming import (
            stream_tumbling_windows)
        rng = np.random.RandomState(4)
        n = 5000
        base = np.datetime64("2024-01-01T00:00:00", "us")
        ts = base + rng.randint(0, 86_400_000_000, n).astype("timedelta64[us]")
        rng.shuffle(ts)                        # heavily out of order
        df = pd.DataFrame({
            "k": rng.choice(["x", "y", "z"], n),
            "ts": ts.astype("datetime64[us]"),
            "v": rng.uniform(0, 10, n).round(2)})
        ds = rd.from_pandas(df).repartition(7)
        tbl, late = stream_tumbling_windows(
            ds, key_col="k", ts_col="ts", value_col="v",
            window_us=3_600_000_000, lateness_us=1 << 60, n_buckets=3)
        assert late == 0
        got = tbl.to_pandas().sort_values(["key", "window_start"]) \
            .reset_index(drop=True)
        exp = df.assign(
            window_start=(df.ts.to_numpy("datetime64[us]").astype("int64")
                          // 3_600_000_000) * 3_600_000_000,
            cents=(df.v * 100).round().astype("int64"))
        expg = exp.groupby(["k", "window_start"]).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")).reset_index() \
            .rename(columns={"k": "key"}) \
            .sort_values(["key", "window_start"]).reset_index(drop=True)
        assert got.n.tolist() == expg.n.tolist()
        assert got.sum_cents.tolist() == expg.sum_cents.tolist()
        assert got.key.tolist() == expg.key.tolist()
