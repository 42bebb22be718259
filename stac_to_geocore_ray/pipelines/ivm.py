"""Incremental view maintenance (IVM) for late-arriving events.

A 100-TB ingest never arrives once: a base load lands, then late
deltas trickle in (the reference re-harvests a whole STAC API per run
and re-uploads every record, stac_to_geocore.py lambda_handler — the
exact anti-pattern).  This leg maintains the HOURLY VIEW
(event_type, hour, n_events, sum_cents) incrementally: the base
aggregate is computed once and checkpointed; each delta application
scans ONLY its late slice and merges the (domain-bounded) aggregate
deltas into the previous view — never re-reading the base corpus.

Fixture semantics (deterministic, no external data): rows with
``event_id % 10 == LATE_RESIDUE`` are "late"; delta j holds the late
rows with ``(event_id // 10) % n_deltas == j``.  Base + all deltas
partition the corpus exactly, so the maintained view must equal a
full recompute — which is the driver-facing oracle
(``events_hourly_ivm`` value-checks against the plain GROUP BY).

Checkpoint layout (ManifestSink write-then-marker protocol, the
state/manifest.py contract):

- ``base``        — the view over on-time rows.
- ``delta-<j>``   — the view AFTER applying delta j (views are
  hours x types rows — output-sized, so storing each post-delta view
  costs O(view), and resume = read last completed view, apply only
  the remaining deltas).

Every partition's manifest records the predicate that produced it; a
resume under a different ``n_deltas`` or corpus path is refused (the
foreign-checkpoint guard shared with kmeans_run / dedup_runs).

The merge itself is a driver-side pandas fold, justified the same way
as the PageRank rank vector: the view domain (distinct event types x
hours of the stream's span) is output-sized by definition — years of
hourly cells for dozens of types is <1M rows.  At view domains past
driver memory the merge becomes one ``sorted_combine`` over
[view, delta-partials] — same semantics, one small shuffle.
"""

from __future__ import annotations

import posixpath

import pyarrow as pa

from ..state.manifest import ManifestSink

LATE_RESIDUE = 7          # event_id % 10 == 7  -> "late-arriving" rows
LATE_MOD = 10

VIEW_SCHEMA = ("event_type", "hour", "n_events", "sum_cents")


def _view_partials(sf_dir: str, keep):
    """Per-batch (event_type, hour, n, cents) contraction over the rows
    ``keep`` selects, folded through small_domain_fold (hours x types
    is the tiny-domain regime — lesson 30)."""
    from ..queries._common import _cents, _meta_read, _t
    from ..stages.util import small_domain_fold, table_from_pandas

    ds = _meta_read(_t(sf_dir, "events"),
                    columns=["event_id", "ts", "event_type", "value"])

    def win(batch: pa.Table) -> pa.Table:
        batch = keep(batch)
        df = batch.to_pandas()
        if len(df) == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "hour": pa.array([], pa.timestamp("us")),
                "n_events": pa.array([], pa.int64()),
                "sum_cents": pa.array([], pa.int64())})
        df["hour"] = df.ts.dt.floor("h")
        df["cents"] = _cents(df.value.to_numpy())
        g = df.groupby(["event_type", "hour"], sort=False).agg(
            n_events=("value", "size"),
            sum_cents=("cents", "sum")).reset_index()
        return table_from_pandas(g, preserve_index=False)

    folded = small_domain_fold(
        ds.map_batches(win, batch_format="pyarrow"),
        keys=["event_type", "hour"], sum_cols=["n_events", "sum_cents"])
    return _canon_view(folded.to_pandas())


def _canon_view(df, schema=VIEW_SCHEMA, n_keys: int = 2) -> pa.Table:
    """Sorted, typed view table — byte-identical across reruns.  The
    first ``n_keys`` columns of ``schema`` are the grouping keys; the
    rest are int64 aggregate cells."""
    from ..stages.util import table_from_pandas
    df = df[list(schema)].astype({c: "int64" for c in schema[n_keys:]})
    df = df.sort_values(list(schema[:n_keys])).reset_index(drop=True)
    return table_from_pandas(df, preserve_index=False)


def merge_views(view: pa.Table, delta: pa.Table,
                schema=VIEW_SCHEMA, n_keys: int = 2) -> pa.Table:
    """view ⊕ delta: cell-wise sum of the two aggregates (driver-side;
    both are view-domain-sized — see module docstring)."""
    import pandas as pd
    both = pd.concat([view.to_pandas(), delta.to_pandas()])
    g = both.groupby(list(schema[:n_keys]), sort=False,
                     dropna=False, as_index=False).sum()
    return _canon_view(g, schema, n_keys)


def _keep_base_on(id_col: str):
    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % LATE_MOD != LATE_RESIDUE))
    return keep


def _keep_delta_on(id_col: str, j: int, n_deltas: int):
    def keep(batch: pa.Table, _j=j, _n=n_deltas) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        late = ids % LATE_MOD == LATE_RESIDUE
        mine = (ids // LATE_MOD) % _n == _j
        return batch.filter(pa.array(late & mine))
    return keep


_keep_base = _keep_base_on("event_id")


def _keep_delta(j: int, n_deltas: int):
    return _keep_delta_on("event_id", j, n_deltas)


JOIN_VIEW_SCHEMA = ("nation", "n_orders", "sum_cents")


def _nation_rev_partials(sf_dir: str, keep):
    """Per-batch (nation, n_orders, sum_cents) contraction over the
    orders rows ``keep`` selects — the Δ(fact ⋈ dims) leg of the
    join-view delta rule Δ(A⋈B) = ΔA⋈B for static dims: the delta
    scans ONLY its orders slice; customer→nation resolves through a
    broadcast lookup (ray.put once, read per actor).  At dim sizes
    past worker heap the same partial composes with the engine's
    native hash join on the slice instead — the slice side is small
    by construction, so the join never moves the base fact table."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from ..queries._common import _auto, _cents, _meta_read, _t
    from ..stages.util import small_domain_fold, table_from_pandas

    cust = pq.read_table(_t(sf_dir, "customer"),
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(_t(sf_dir, "nation"))
    n_name = dict(zip(nat["n_nationkey"].to_pylist(),
                      nat["n_name"].to_pylist()))
    ck = cust["c_custkey"].to_numpy()
    order = np.argsort(ck)
    lut_keys = ck[order]
    lut_nation = np.array(
        [n_name[k] for k in
         cust["c_nationkey"].to_numpy()[order].tolist()], dtype=object)
    ref = ray.put((lut_keys, lut_nation))

    ds = _meta_read(_t(sf_dir, "orders"),
                    columns=["o_orderkey", "o_custkey", "o_totalprice"])

    class Partial:
        def __init__(self, r):
            self.keys, self.nation = ray.get(r) \
                if isinstance(r, ray.ObjectRef) else r

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pandas as pd
            batch = keep(batch)
            if batch.num_rows == 0:
                return pa.table({
                    "nation": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64())})
            custkey = batch["o_custkey"].to_numpy(zero_copy_only=False)
            rows = np.searchsorted(self.keys, custkey)
            if not np.array_equal(self.keys[np.clip(
                    rows, 0, len(self.keys) - 1)], custkey):
                raise ValueError("orders reference custkeys missing from "
                                 "the customer dim — dim snapshot stale")
            df = pd.DataFrame({
                "nation": self.nation[rows],
                "cents": _cents(
                    batch["o_totalprice"].to_numpy(zero_copy_only=False))})
            g = df.groupby("nation", sort=False).agg(
                n_orders=("cents", "size"),
                sum_cents=("cents", "sum")).reset_index()
            return table_from_pandas(g, preserve_index=False)

    partial = ds.map_batches(Partial, fn_constructor_args=(ref,),
                             batch_format="pyarrow", concurrency=_auto())
    folded = small_domain_fold(partial, keys=["nation"],
                               sum_cols=["n_orders", "sum_cents"])
    return _canon_view(folded.to_pandas(), JOIN_VIEW_SCHEMA, n_keys=1)


def nation_revenue_view_ivm(sf_dir: str, n_deltas: int = 4) -> pa.Table:
    """JOIN-VIEW IVM: the per-nation order-revenue view (orders ⋈
    customer ⋈ nation) maintained under late-arriving ORDERS.  Dims
    are static, so each delta is Δorders ⋈ dims — the star-schema
    incremental-maintenance case.  Must equal the full recompute; the
    registered query's oracle is the plain 3-way-join GROUP BY."""
    view = _nation_rev_partials(sf_dir, _keep_base_on("o_orderkey"))
    for j in range(n_deltas):
        delta = _nation_rev_partials(
            sf_dir, _keep_delta_on("o_orderkey", j, n_deltas))
        view = merge_views(view, delta, JOIN_VIEW_SCHEMA, n_keys=1)
    return view


def events_hourly_view_ivm(sf_dir: str, n_deltas: int = 4) -> pa.Table:
    """In-memory IVM chain (no checkpoints): base view, then each late
    delta applied incrementally.  Must equal the full recompute — the
    registered query's oracle is the plain GROUP BY over all events."""
    view = _view_partials(sf_dir, _keep_base)
    for j in range(n_deltas):
        delta = _view_partials(sf_dir, _keep_delta(j, n_deltas))
        view = merge_views(view, delta)
    return view


def run_hourly_view_ivm(sf_dir: str, out_dir: str, *,
                        resume: bool = True,
                        fail_after: int | None = None,
                        n_deltas: int = 4) -> dict:
    """Checkpointed IVM runner (CLI ``ivm-view``): ``base`` then
    ``delta-<j>`` partitions under the write-then-marker protocol.
    ``fail_after=k`` stops after k partition writes (fault injection
    for the kill/resume tests); a resume reads the LAST completed view
    and scans only the unapplied late slices."""
    from ..sources import lance_io

    sink = ManifestSink(out_dir)
    if resume:
        sink.clean_orphans()
    else:
        sink.reset()

    def _input_tag(pid: str) -> list[str]:
        if pid == "base":
            return [sf_dir, f"event_id%{LATE_MOD}!={LATE_RESIDUE}"]
        j = int(pid.split("-")[1])
        return [sf_dir,
                f"event_id%{LATE_MOD}=={LATE_RESIDUE} and "
                f"(event_id//{LATE_MOD})%{n_deltas}=={j}"]

    chain = ["base"] + [f"delta-{j:04d}" for j in range(n_deltas)]
    done = sink.completed()
    for pid in chain:
        if pid in done and done[pid].get("inputs") != _input_tag(pid):
            raise ValueError(
                f"completed {pid!r} in {out_dir!r} was written under a "
                f"different slicing ({done[pid].get('inputs')}); resume "
                f"with the original sf_dir/n_deltas or a fresh out_dir")

    def _read_view(pid: str) -> pa.Table:
        path = posixpath.join(sink.root, f"part-{pid}{lance_io.shard_ext()}")
        return lance_io.read_shard(path)

    written = 0
    view = None
    for idx, pid in enumerate(chain):
        if sink.is_done(pid):
            view = None                     # lazily re-read when needed
            continue
        if fail_after is not None and written >= fail_after:
            return {"applied": idx, "stopped_after": written,
                    "view_rows": None}
        if view is None and idx > 0:
            view = _read_view(chain[idx - 1])
        if pid == "base":
            view = _view_partials(sf_dir, _keep_base)
        else:
            j = int(pid.split("-")[1])
            delta = _view_partials(sf_dir, _keep_delta(j, n_deltas))
            view = merge_views(view, delta)
        sink.write_partition(pid, view, inputs=_input_tag(pid))
        written += 1
    if view is None:
        view = _read_view(chain[-1])
    return {"applied": len(chain), "stopped_after": None,
            "view_rows": view.num_rows}
