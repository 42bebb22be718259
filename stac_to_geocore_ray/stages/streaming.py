"""Event-time tumbling windows over an out-of-order stream (bucket actors).

Ray Data has no event-time windows or watermarks; this stage supplies
the streaming-shaped semantics with the guide's bucket-actor recipe:
the key space hashes onto N ``WindowBucket`` actors, feeder tasks
route each batch to its buckets, and every bucket maintains open
tumbling-window partials, advancing a per-bucket WATERMARK (max event
time seen - allowed lateness).  A window finalizes once the watermark
passes its end; events arriving after their window finalized are
counted and dropped (the late-data policy).

Scale shape (round-3 rewrite):

- **Feeder-side pre-aggregation**: each feeder batch collapses to one
  (key, window) -> (n, sum_cents) partial row via a single pandas
  groupby BEFORE anything is shipped — the actor sees orders of
  magnitude fewer rows than events, and per-event Python never runs
  anywhere.  Actor-RPC volume per batch is #buckets tiny tables.
- **Idempotent ingest (exactly-once under task retry)**: every ingest
  carries a deterministic id (Ray task id + batch content fingerprint,
  replay-stable regardless of worker/instance caching).
  A retried feeder task (worker crash) replays the same ids and the
  bucket skips them, so counts never double.  This only holds because
  finalized windows are RETAINED in the bucket until the final drain —
  the round-2 design returned ripe windows to the feeder, whose output
  block could be lost with the worker, losing the windows with it.
  A bucket-actor death still loses that bucket's state and fails the
  job loudly (max_restarts=0) — re-run; state is bounded and cheap.
- **State bound**: (open windows x keys) + finalized rows per bucket —
  aggregates, never events.  In a true endless deployment the driver
  would drain ripe windows periodically; here the stream has an end
  and one final drain returns everything.

Aggregates are (count, integer-cents sum) so finalized values are
exact under any arrival order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

# feeder batch rows: bounds each task's transient pandas footprint
# (lesson 23 — whole-block batches thrashed at 3M rows/block)
FEEDER_BATCH_ROWS = 256 * 1024


@ray.remote(num_cpus=0.25)
class WindowBucket:
    """One key-hash bucket: open-window partials + watermark + late count.

    ``ingest`` takes PARTIAL rows (unique (key, window) pairs with
    pre-summed counts/cents), is idempotent on ``ingest_id``, and
    returns only an ack; ripe windows accumulate internally until
    ``ripe_windows()`` / ``flush()``.
    """

    def __init__(self, window_us: int, lateness_us: int):
        self.window_us = window_us
        self.lateness_us = lateness_us
        self.open: dict[tuple, list] = {}     # (key, wstart) -> [n, cents]
        self.finalized: set[tuple] = set()
        self.ripe: list[tuple] = []           # finalized (k, w, n, cents)
        self.ripe_base = 0                    # cursor of self.ripe[0]
        self.watermark = -(1 << 62)
        self.late = 0
        self.seen: set[tuple] = set()         # replayed-ingest guard

    def ingest(self, ingest_id: tuple, keys: list, wstarts: np.ndarray,
               ns: np.ndarray, cents: np.ndarray, max_ts: int) -> int:
        if ingest_id in self.seen:            # retried feeder task: skip
            return 0
        self.seen.add(ingest_id)
        # merge loop runs over PARTIALS (unique key-window pairs of one
        # feeder batch), not events — bounded by keys x open windows
        for k, w, n, c in zip(keys, wstarts.tolist(), ns.tolist(),
                              cents.tolist()):
            kk = (k, w)
            if kk in self.finalized:
                self.late += n               # beyond lateness: drop + count
                continue
            row = self.open.setdefault(kk, [0, 0])
            row[0] += n
            row[1] += c
        self.watermark = max(self.watermark, int(max_ts) - self.lateness_us)
        for kk in [kk for kk in self.open
                   if kk[1] + self.window_us <= self.watermark]:
            n, c = self.open.pop(kk)
            self.finalized.add(kk)
            self.ripe.append((kk[0], kk[1], n, c))
        return self.ripe_base + len(self.ripe)

    def ripe_windows(self, after: int = 0) -> tuple[pa.Table, int]:
        """Finalized windows accumulated so far, with an incremental
        cursor: returns (windows with seq >= ``after``, next cursor).
        Windows are RETAINED until ``prune``, so any drain is
        replayable from any un-pruned cursor — a periodic driver drain
        that is lost in flight just re-reads from its last durable
        cursor (the endless-stream consumption pattern); ``after=0``
        returns everything still held."""
        lo = max(0, after - self.ripe_base)
        return (_windows_table(self.ripe[lo:]),
                self.ripe_base + len(self.ripe))

    def prune(self, durable_cursor: int) -> int:
        """Drop finalized windows below a cursor the consumer has made
        DURABLE — the eviction that keeps a truly endless deployment's
        actor memory bounded (without it, ripe grows with stream
        length; ``seen`` stays: one tiny tuple per feeder BATCH, not
        per event).  Cursors below the pruned point are no longer
        replayable; returns the number of rows dropped."""
        drop = max(0, min(durable_cursor - self.ripe_base, len(self.ripe)))
        if drop:
            del self.ripe[:drop]
            self.ripe_base += drop
        return drop

    def flush(self) -> pa.Table:
        """Windows still open at end-of-stream (watermark never passed)."""
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
    """map_batches callable: pre-aggregates each batch to (key, window)
    partials and routes them to the bucket actors.

    Returns a 1-row stats table (rows routed) — window rows leave the
    buckets only at the final drain, never through feeder output blocks
    (see module docstring: retry safety)."""

    def __init__(self, buckets: list, key_col: str, ts_col: str,
                 value_col: str, window_us: int, slide_us: int | None = None):
        """``slide_us``: window hop for SLIDING windows (must divide
        ``window_us``); default = window_us (tumbling).  An event
        belongs to the k = window/slide windows covering it — the
        feeder expands each event to its k (key, wstart) partials
        VECTORIZED before the groupby, so buckets still only ever see
        per-window aggregates and need no sliding-specific logic
        (a window finalizes when the watermark passes wstart+window,
        regardless of spacing)."""
        self.buckets = buckets
        self.key_col, self.ts_col, self.value_col = key_col, ts_col, value_col
        self.window_us = window_us
        self.slide_us = window_us if slide_us is None else slide_us
        if self.window_us % self.slide_us:
            raise ValueError("slide_us must divide window_us")

    def _ingest_id(self, ts_us: "np.ndarray", cents: "np.ndarray",
                   nrows: int) -> tuple:
        """(task id, batch content fingerprint) — identical whenever
        the SAME batch of the SAME task replays, independent of any
        instance state.  The earlier (task id, per-instance call-seq)
        id assumed retries only follow worker death; a task re-executed
        via lineage reconstruction on a live worker whose cached feeder
        instance had already advanced the seq would mint FRESH ids and
        double-count (round-4 review finding).  The fingerprint
        (row count, first/last ts, ts sum, first/last cents, cent sum)
        is deterministic per batch and collision-free within a task
        unless two batches are IDENTICAL in content — a duplicate-run
        pathology where the second batch would be skipped and the
        drain's accounting identity then fails LOUDLY (RuntimeError),
        which is the right side of the trade: the per-instance seq id
        this replaces failed SILENTLY (double-count) on the far more
        plausible replay case.  If Ray exposes a task attempt number,
        (task id, attempt-stable seq) removes both failure modes."""
        try:
            tid = ray.get_runtime_context().get_task_id()
        except Exception:
            tid = None
        if tid is None:                        # driver-side call (tests)
            tid = f"driver-{id(self)}"
        return (tid, nrows, int(ts_us[0]), int(ts_us[-1]),
                int(ts_us.sum()), int(cents[0]), int(cents[-1]),
                int(cents.sum()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        if nrows == 0:
            return pa.table({"n_routed": pa.array([0], pa.int64()),
                             "n_malformed": pa.array([0], pa.int64())})
        df = batch.to_pandas()
        # poison-row dead-letter (r3 verdict #8, the Tiler quarantine
        # pattern): a null/unparseable ts, value, or key must not
        # crash the feeder NOR silently vanish — it is dropped here
        # with a count that rides the stats row, so the drain-side
        # accounting identity distinguishes "late" from "malformed"
        vals = pd.to_numeric(df[self.value_col], errors="coerce")
        bad = (df[self.ts_col].isna().to_numpy()
               | vals.isna().to_numpy()
               | df[self.key_col].isna().to_numpy())
        n_bad = int(bad.sum())
        if n_bad:
            df = df.loc[~bad]
            vals = vals.loc[~bad]
            if len(df) == 0:
                return pa.table({
                    "n_routed": pa.array([0], pa.int64()),
                    "n_malformed": pa.array([n_bad], pa.int64())})
        nrows = len(df)
        ts_us = df[self.ts_col].to_numpy("datetime64[us]").astype("int64")
        k = self.window_us // self.slide_us
        base = (ts_us // self.slide_us) * self.slide_us
        # factorize ONCE: the groupby runs on int codes (object-key
        # groupbys paid a per-event string conversion + object hash —
        # the dominant feeder cost at the 100M-event scale run); key
        # strings materialize only for the CONTRACTED partial rows
        kcodes, kuniq = pd.factorize(df[self.key_col])
        # half-AWAY like DuckDB round() (exact-half products exist in
        # real data; np.round's half-to-even silently diverges there)
        v = vals.to_numpy(dtype=np.float64)
        cents0 = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype("int64")
        # sliding expansion: event -> its k covering windows (k=1 for
        # tumbling), all numpy tile/repeat — still no per-event Python
        offs = (np.arange(k, dtype=np.int64) * self.slide_us)
        part = pd.DataFrame({
            "kc": np.tile(kcodes.astype(np.int64), k),
            "wstart": (base[None, :] - offs[:, None]).ravel(),
            "cents": np.tile(cents0, k)})
        # THE reduction: events -> (key, window) partials, one groupby
        g = part.groupby(["kc", "wstart"], sort=False).agg(
            n=("cents", "size"), cents=("cents", "sum")).reset_index()
        keys = np.asarray(kuniq.astype(str), dtype=object)[
            g.kc.to_numpy()]
        bucket_of = (pd.util.hash_array(keys)
                     % len(self.buckets)).astype(np.int64)
        max_ts = int(ts_us.max())
        iid = self._ingest_id(ts_us, cents0, nrows)
        futs = []
        for b in np.unique(bucket_of):
            m = bucket_of == b
            futs.append(self.buckets[int(b)].ingest.remote(
                (*iid, int(b)), keys[m].tolist(),
                g.wstart.to_numpy()[m], g.n.to_numpy()[m],
                g.cents.to_numpy()[m], max_ts))
        # ack barrier: tiny ints; guarantees all ingests of this batch
        # are applied before the stage can be considered complete, so
        # the driver's drain never races a queued ingest
        ray.get(futs)
        # n_routed counts (event x window) memberships: nrows * k —
        # keeps the drain-side accounting identity for sliding windows
        return pa.table({"n_routed": pa.array([nrows * k], pa.int64()),
                         "n_malformed": pa.array([n_bad], pa.int64())})


def stream_tumbling_windows(events_ds, *, key_col: str, ts_col: str,
                            value_col: str, window_us: int,
                            lateness_us: int, n_buckets: int = 4,
                            slide_us: int | None = None):
    """Run the stream through bucket actors; returns (windows pyarrow
    Table, late_count).  ``slide_us`` < window_us turns the stage into
    SLIDING windows (each event counted in window/slide windows; the
    buckets are unchanged — see WindowFeeder).

    The returned table is ripe (finalized) windows plus the
    end-of-stream flush of still-open windows — at a real deployment
    the stream has no end and the open set stays in the buckets."""
    buckets = [WindowBucket.remote(window_us, lateness_us)
               for _ in range(n_buckets)]
    feeder = WindowFeeder(buckets, key_col, ts_col, value_col, window_us,
                          slide_us)
    # bounded feeder batches: whole-block batches at 100M events put a
    # ~3M-row pandas conversion in every concurrent task and the
    # transient heap thrashed (41 s; 256k-row batches: 5.2 s, measured
    # A/B on the same session) — ingest idempotency is content-keyed
    # per batch, so finer batches stay retry-safe
    stats = events_ds.map_batches(feeder, batch_format="pyarrow",
                                  batch_size=FEEDER_BATCH_ROWS)
    n_routed, n_malformed = 0, 0
    for t in stats.iter_batches(batch_format="pyarrow"):
        n_routed += int(pa.compute.sum(t["n_routed"]).as_py() or 0)
        n_malformed += int(pa.compute.sum(t["n_malformed"]).as_py() or 0)
    ripe = [t for t, _ in ray.get([b.ripe_windows.remote()
                                   for b in buckets])]
    tails = ray.get([b.flush.remote() for b in buckets])
    late = sum(ray.get([b.late_count.remote() for b in buckets]))
    for b in buckets:                         # release the CPU reservations
        ray.kill(b)
    full = pa.concat_tables([*ripe, *tails])
    emitted = int(pa.compute.sum(full["n"]).as_py() or 0)
    # malformed rows never entered n_routed — the identity stays exact
    # AND distinguishes "dropped for lateness" from "dropped as poison"
    if emitted + late != n_routed:
        raise RuntimeError(
            f"window accounting mismatch: routed {n_routed} events but "
            f"emitted {emitted} + late {late} "
            f"(+{n_malformed} malformed, excluded from routing)")
    return full, late, n_malformed


# ------------------------------------------------------- session windows


def _merge_fragments(df: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """Vectorized interval-union of session FRAGMENTS (key, start,
    last, n, cents): fragments of one key chain into one session when
    the next start is within ``gap_us`` of the running max last.  The
    same kernel serves the feeder (events -> per-batch fragments have
    already contracted) and the bucket (open sessions ⊕ new fragments
    re-merge), because session state is mergeable interval algebra."""
    df = df.sort_values(["key", "start"], kind="mergesort") \
        .reset_index(drop=True)
    cmax = df.groupby("key", sort=False)["last"].cummax()
    prev_last = cmax.shift(1)
    new_key = df["key"].ne(df["key"].shift(1))
    new_sess = (new_key | (df["start"] > prev_last + gap_us)).to_numpy()
    gid = np.cumsum(new_sess)
    out = df.groupby(gid, sort=False).agg(
        key=("key", "first"), start=("start", "first"),
        last=("last", "max"), n=("n", "sum"), cents=("cents", "sum"))
    return out.reset_index(drop=True)


def _sessions_table(df: pd.DataFrame) -> pa.Table:
    return pa.table({
        "key": pa.array(df["key"].to_numpy()),
        "session_start": pa.array(df["start"].to_numpy(), pa.int64()),
        "session_end": pa.array(df["last"].to_numpy(), pa.int64()),
        "n": pa.array(df["n"].to_numpy(), pa.int64()),
        "sum_cents": pa.array(df["cents"].to_numpy(), pa.int64())})


_EMPTY_FRAGS = {"key": pd.Series([], dtype="int64"),
                "start": pd.Series([], dtype="int64"),
                "last": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "cents": pd.Series([], dtype="int64")}


@ray.remote(num_cpus=0.25)
class SessionBucket:
    """One key-hash bucket of GAP-based session windows — the
    data-dependent-boundary window class tumbling/sliding can't
    express: sessions MERGE when a bridging fragment arrives, so the
    state is per-key disjoint intervals, not fixed (key, wstart) cells.

    ``ingest`` takes fragment rows (per-batch contracted runs of one
    key: start/last/n/cents), is idempotent on ``ingest_id``; a
    session finalizes once the watermark passes ``last + gap`` (no
    in-lateness event can extend it).  A fragment wholly behind the
    watermark is late (dropped + counted); a fragment straddling it is
    accepted but can no longer bridge into already-finalized sessions
    — the standard allowed-lateness session cut (Flink semantics).
    Under no-drop lateness nothing finalizes before the drain and the
    result equals batch sessionization exactly (the oracle mode)."""

    def __init__(self, gap_us: int, lateness_us: int):
        self.gap_us = gap_us
        self.lateness_us = lateness_us
        self.open = pd.DataFrame(_EMPTY_FRAGS)
        self.ripe: list[pa.Table] = []
        self.ripe_rows = 0
        self.watermark = -(1 << 62)
        self.late = 0
        self.seen: set[tuple] = set()

    def ingest(self, ingest_id: tuple, keys, starts, lasts,
               ns, cents, max_ts: int) -> int:
        if ingest_id in self.seen:            # retried feeder task: skip
            return self.ripe_rows
        self.seen.add(ingest_id)
        frags = pd.DataFrame({"key": keys, "start": starts, "last": lasts,
                              "n": ns, "cents": cents})
        is_late = frags["last"].to_numpy() <= self.watermark
        if is_late.any():
            self.late += int(frags["n"].to_numpy()[is_late].sum())
            frags = frags.loc[~is_late]
        self.open = _merge_fragments(
            pd.concat([self.open, frags], ignore_index=True), self.gap_us)
        self.watermark = max(self.watermark,
                             int(max_ts) - self.lateness_us)
        ripe = self.open["last"].to_numpy() + self.gap_us <= self.watermark
        if ripe.any():
            done = self.open.loc[ripe]
            self.ripe.append(_sessions_table(done))
            self.ripe_rows += len(done)
            self.open = self.open.loc[~ripe].reset_index(drop=True)
        return self.ripe_rows

    def ripe_sessions(self) -> pa.Table:
        """Finalized sessions accumulated so far (retained until the
        final drain — same replay-safe consumption as WindowBucket)."""
        if not self.ripe:
            return _sessions_table(pd.DataFrame(_EMPTY_FRAGS))
        return pa.concat_tables(self.ripe)

    def flush(self) -> pa.Table:
        """Sessions still open at end-of-stream."""
        out = _sessions_table(self.open)
        self.open = pd.DataFrame(_EMPTY_FRAGS)
        return out

    def late_count(self) -> int:
        return self.late


class SessionFeeder:
    """map_batches callable: contracts each batch to per-key session
    FRAGMENTS (runs under the gap within the batch) and routes them to
    the bucket actors; same dead-letter + content-keyed-idempotency
    contract as WindowFeeder."""

    def __init__(self, buckets: list, key_col: str, ts_col: str,
                 value_col: str, gap_us: int):
        self.buckets = buckets
        self.key_col, self.ts_col, self.value_col = key_col, ts_col, value_col
        self.gap_us = gap_us

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n_routed": pa.array([0], pa.int64()),
                             "n_malformed": pa.array([0], pa.int64())})
        df = batch.to_pandas()
        vals = pd.to_numeric(df[self.value_col], errors="coerce")
        bad = (df[self.ts_col].isna().to_numpy()
               | vals.isna().to_numpy()
               | df[self.key_col].isna().to_numpy())
        n_bad = int(bad.sum())
        if n_bad:
            df, vals = df.loc[~bad], vals.loc[~bad]
            if len(df) == 0:
                return pa.table({
                    "n_routed": pa.array([0], pa.int64()),
                    "n_malformed": pa.array([n_bad], pa.int64())})
        order = np.lexsort((df[self.ts_col].to_numpy("datetime64[us]")
                            .astype("int64"),
                            df[self.key_col].to_numpy()))
        keys = df[self.key_col].to_numpy()[order]
        ts_us = df[self.ts_col].to_numpy("datetime64[us]") \
            .astype("int64")[order]
        v = vals.to_numpy(dtype=np.float64)[order]
        cents0 = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype("int64")
        new_frag = np.empty(len(keys), dtype=bool)
        new_frag[0] = True
        new_frag[1:] = (keys[1:] != keys[:-1]) \
            | (ts_us[1:] - ts_us[:-1] > self.gap_us)
        starts = np.flatnonzero(new_frag)
        ends = np.append(starts[1:], len(keys)) - 1
        csum = np.concatenate(([0], np.cumsum(cents0)))
        frag = pd.DataFrame({
            "key": keys[starts],
            "start": ts_us[starts], "last": ts_us[ends],
            "n": (ends - starts + 1).astype("int64"),
            "cents": csum[ends + 1] - csum[starts]})
        bucket_of = (pd.util.hash_array(frag["key"].to_numpy())
                     % len(self.buckets)).astype(np.int64)
        max_ts = int(ts_us.max())
        # content fingerprint (same recipe as WindowFeeder._ingest_id)
        try:
            tid = ray.get_runtime_context().get_task_id()
        except Exception:
            tid = None
        if tid is None:
            tid = f"driver-{id(self)}"
        iid = (tid, len(keys), int(ts_us[0]), int(ts_us[-1]),
               int(ts_us.sum()), int(cents0[0]), int(cents0[-1]),
               int(cents0.sum()))
        futs = []
        for b in np.unique(bucket_of):
            m = (bucket_of == b).to_numpy() \
                if hasattr(bucket_of, "to_numpy") else bucket_of == b
            sub = frag.loc[m]
            futs.append(self.buckets[int(b)].ingest.remote(
                (*iid, int(b)), sub["key"].to_numpy(),
                sub["start"].to_numpy(), sub["last"].to_numpy(),
                sub["n"].to_numpy(), sub["cents"].to_numpy(), max_ts))
        ray.get(futs)
        return pa.table({"n_routed": pa.array([len(keys)], pa.int64()),
                         "n_malformed": pa.array([n_bad], pa.int64())})


def stream_session_windows(events_ds, *, key_col: str, ts_col: str,
                           value_col: str, gap_us: int,
                           lateness_us: int, n_buckets: int = 4):
    """Run the stream through session-bucket actors; returns
    (sessions pyarrow Table, late_count, malformed_count) with the
    same drain + accounting-identity contract as tumbling windows."""
    buckets = [SessionBucket.remote(gap_us, lateness_us)
               for _ in range(n_buckets)]
    feeder = SessionFeeder(buckets, key_col, ts_col, value_col, gap_us)
    stats = events_ds.map_batches(feeder, batch_format="pyarrow",
                                  batch_size=FEEDER_BATCH_ROWS)
    n_routed, n_malformed = 0, 0
    for t in stats.iter_batches(batch_format="pyarrow"):
        n_routed += int(pa.compute.sum(t["n_routed"]).as_py() or 0)
        n_malformed += int(pa.compute.sum(t["n_malformed"]).as_py() or 0)
    ripe = ray.get([b.ripe_sessions.remote() for b in buckets])
    tails = ray.get([b.flush.remote() for b in buckets])
    late = sum(ray.get([b.late_count.remote() for b in buckets]))
    for b in buckets:
        ray.kill(b)
    # drop zero-row drain tables before the concat: an idle bucket's
    # empty template is int64-keyed and would type-clash with string
    # keys (keep one empty if the whole stream was empty/malformed)
    parts = [t for t in [*ripe, *tails] if t.num_rows] or [tails[0]]
    full = pa.concat_tables(parts)
    emitted = int(pa.compute.sum(full["n"]).as_py() or 0)
    if emitted + late != n_routed:
        raise RuntimeError(
            f"session accounting mismatch: routed {n_routed} events but "
            f"emitted {emitted} + late {late} "
            f"(+{n_malformed} malformed, excluded from routing)")
    return full, late, n_malformed
