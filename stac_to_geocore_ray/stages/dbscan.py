"""Grid-bucketed DBSCAN over exact-integer planar points.

Density-based spatial clustering (Ester et al. 1996) re-expressed for
Ray Data's streaming shuffle: the classic grid optimization (cell size
= eps) bounds every distance computation to a point's 3x3 cell
neighborhood, so neighbor discovery is one replicate -> shuffle-by-cell
-> vectorized in-group sweep — never all-pairs.  All coordinates are
int64 (doubled micro-degrees upstream), every eps decision is an exact
integer d^2 <= eps^2 comparison, and the pair set is emitted exactly
once (home-side-id < other-id rule), so the cluster structure has a
single well-defined answer the engine and the golden both compute.

Pinned semantics (the conventions a golden must replay):
- neighborhood is CLOSED (d^2 <= eps^2) and includes the point itself;
- core point: |N_eps(p)| >= min_pts (self included);
- clusters: connected components of core points under the eps
  relation; cluster label = MIN core pid of the component;
- border point: non-core with >= 1 core neighbor; label = min of its
  core neighbors' cluster labels (deterministic, unlike classic
  first-come assignment);
- noise: everything else, label -1.

Scale shape: the only shuffle is the cell groupby (points replicated
9x, 24 B/row); degrees and border labels ride sorted_combine; the
core-core edge set goes through the same output-sized driver
union-find / distributed_components size switch as the dedup cluster
ops.  The final labeling pass broadcasts the OUTPUT-sized label
arrays (8-16 B per clustered point) — above a worker's comfortable
broadcast size that last join should switch to a hash join on pid
(documented plug point, mirrors EMB_BROADCAST_MAX_BYTES).

Known density limitation (shared with every grid DBSCAN): a single
cell holding k points costs O(k * cell-neighborhood) distance rows in
one group; pathological same-coordinate spikes should be contracted
to (point, multiplicity) first — the distinct-hash contraction the
pHash leg uses (stages/dedup.py:126).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

N_BUCKETS = 64


def _cell_key(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    """Pack two cell coords (int32 range) into one int64 group key."""
    return (cx.astype(np.int64) << np.int64(32)) ^ (
        cy.astype(np.int64) & np.int64(0xFFFFFFFF))


def _bucket_of(key: np.ndarray) -> np.ndarray:
    x = key.view(np.uint64).copy()
    x ^= x >> np.uint64(31)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(29)
    return (x & np.uint64(N_BUCKETS - 1)).astype(np.int32)


def replicate_to_cells(batch: pa.Table, eps_u: int) -> pa.Table:
    """Each point -> 9 rows (its 3x3 eps-cell neighborhood), home=True
    on the center row.  A pair within eps always meets in the home
    cell of each endpoint (cell size = eps bounds |cell delta| to 1)."""
    pid = batch["pid"].to_numpy()
    px = batch["px"].to_numpy()
    py = batch["py"].to_numpy()
    n = len(pid)
    if n == 0:
        return pa.table({"bucket": pa.array([], pa.int32()),
                         "key": pa.array([], pa.int64()),
                         "pid": pa.array([], pa.int64()),
                         "px": pa.array([], pa.int64()),
                         "py": pa.array([], pa.int64()),
                         "home": pa.array([], pa.bool_())})
    cx = px // eps_u
    cy = py // eps_u
    pids, pxs, pys, keys, homes = [], [], [], [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            pids.append(pid)
            pxs.append(px)
            pys.append(py)
            keys.append(_cell_key(cx + dx, cy + dy))
            homes.append(np.full(n, dx == 0 and dy == 0))
    key = np.concatenate(keys)
    return pa.table({"bucket": pa.array(_bucket_of(key)),
                     "key": pa.array(key),
                     "pid": pa.array(np.concatenate(pids)),
                     "px": pa.array(np.concatenate(pxs)),
                     "py": pa.array(np.concatenate(pys)),
                     "home": pa.array(np.concatenate(homes))})


def eps_pairs_in_bucket(g: pd.DataFrame, eps_u: int) -> pd.DataFrame:
    """All (a < b, d^2 <= eps^2) pairs whose cells hash to this bucket,
    each pair exactly once (emitted from the smaller id's HOME cell).

    Fully vectorized across the bucket's many cells: one sort groups
    rows by cell, then the home-vs-all index cross product is built
    with repeat/cumsum segment arithmetic — no per-cell Python loop
    (the lesson-17 singleton-group pathology applies verbatim here:
    most cells hold a handful of points)."""
    empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="int64")})
    if len(g) < 2:
        return empty
    key = g["key"].to_numpy()
    order = np.argsort(key, kind="stable")
    key = key[order]
    pid = g["pid"].to_numpy()[order]
    px = g["px"].to_numpy()[order]
    py = g["py"].to_numpy()[order]
    home = g["home"].to_numpy()[order]
    seg_starts = np.r_[0, np.flatnonzero(key[1:] != key[:-1]) + 1]
    seg_ends = np.r_[seg_starts[1:], len(key)]
    counts = seg_ends - seg_starts
    seg_id = np.repeat(np.arange(len(counts)), counts)
    hi = np.flatnonzero(home)
    if len(hi) == 0:
        return empty
    c_of_hi = counts[seg_id[hi]]
    # I: each home row index repeated (its cell's row count) times;
    # J: the cell's full row range per repetition
    I = np.repeat(hi, c_of_hi)
    offs = np.arange(c_of_hi.sum()) - np.repeat(
        np.r_[0, np.cumsum(c_of_hi)[:-1]], c_of_hi)
    J = np.repeat(seg_starts[seg_id[hi]], c_of_hi) + offs
    lt = pid[I] < pid[J]            # emit-once rule + self-exclusion
    I, J = I[lt], J[lt]
    dx = px[I] - px[J]
    dy = py[I] - py[J]
    ok = dx * dx + dy * dy <= np.int64(eps_u) * np.int64(eps_u)
    return pd.DataFrame({"a": pid[I][ok], "b": pid[J][ok]})


DRIVER_UF_MAX_EDGES = 500_000


def dbscan(points_ds, eps_u: int, min_pts: int,
           driver_uf_max: int = DRIVER_UF_MAX_EDGES):
    """DBSCAN over a Dataset of (pid:int64, px:int64, py:int64) ->
    one-block table (pid, role, cluster); role in {core, border,
    noise}; cluster = min core pid of the component, -1 for noise."""
    import ray
    import ray.data as rd  # noqa: F401

    from .dedup import distributed_components, union_find_components
    from .util import sorted_combine

    pairs = points_ds.map_batches(
        lambda b: replicate_to_cells(b, eps_u), batch_format="pyarrow") \
        .groupby("bucket") \
        .map_groups(lambda g: eps_pairs_in_bucket(g, eps_u),
                    batch_format="pandas") \
        .repartition(N_BUCKETS) \
        .materialize()                   # consumed 3x (deg, edges, border)
    # the repartition does double duty: it coalesces the sort's empty
    # partitions (their schema-less blocks would otherwise propagate
    # "different schema ." warnings through every downstream consumer
    # of the materialized pairs — Ray skips the UDF on zero-row blocks,
    # so a typed-empty return in the consumer cannot fix them), and it
    # right-sizes the 16 B/row pair blocks for the three consumers

    # degrees (self excluded): one row per endpoint, sorted-combine sum
    def endpoints(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        return pa.table({"pid": pa.array(np.r_[a, b]),
                         "cnt": pa.array(np.ones(len(a) + len(b),
                                                 dtype=np.int64))})

    deg = sorted_combine(pairs.map_batches(endpoints,
                                           batch_format="pyarrow"),
                         keys=["pid"], sum_cols=["cnt"]).to_pandas()
    if "cnt" not in deg.columns:       # zero pairs anywhere: all noise
        deg = pd.DataFrame({"pid": pd.Series([], dtype="int64"),
                            "cnt": pd.Series([], dtype="int64")})
    core_ids = np.sort(deg.loc[deg.cnt >= min_pts - 1, "pid"]
                       .to_numpy(dtype=np.int64))
    core_ref = ray.put(core_ids)

    def core_core(batch: pa.Table) -> pa.Table:
        cids = ray.get(core_ref)
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        ka = np.searchsorted(cids, a)
        kb = np.searchsorted(cids, b)
        ina = (ka < len(cids)) & (cids[np.minimum(ka, len(cids) - 1)] == a) \
            if len(cids) else np.zeros(len(a), dtype=bool)
        inb = (kb < len(cids)) & (cids[np.minimum(kb, len(cids) - 1)] == b) \
            if len(cids) else np.zeros(len(b), dtype=bool)
        keep = ina & inb
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    edges = pairs.map_batches(core_core, batch_format="pyarrow") \
        .materialize()
    n_edges = edges.count()
    if n_edges == 0:
        comp = {}
    elif n_edges <= driver_uf_max:
        ed = edges.to_pandas()
        comp = union_find_components(ed.a.tolist(), ed.b.tolist())
    else:
        lab = distributed_components(edges).to_pandas()
        comp = dict(zip(lab["node"].astype(int), lab["label"].astype(int)))
    # isolated cores (no core-core edge) are their own singleton cluster
    core_label = np.array([comp.get(int(c), int(c)) for c in core_ids],
                          dtype=np.int64)
    clab_ref = ray.put((core_ids, core_label))

    # border candidates: pairs with EXACTLY one core endpoint ->
    # (non-core pid, core side's cluster label), min per pid
    def border_cand(batch: pa.Table) -> pa.Table:
        cids, clab = ray.get(clab_ref)
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()

        def lookup(x):
            if len(cids) == 0:
                return (np.zeros(len(x), dtype=bool),
                        np.zeros(len(x), dtype=np.int64))
            k = np.minimum(np.searchsorted(cids, x), len(cids) - 1)
            isc = cids[k] == x
            return isc, clab[k]

        isa, la = lookup(a)
        isb, lb = lookup(b)
        one = isa ^ isb
        bp = np.where(isa[one], b[one], a[one])
        bl = np.where(isa[one], la[one], lb[one])
        return pa.table({"pid": pa.array(bp), "cand": pa.array(bl)})

    border = sorted_combine(
        pairs.map_batches(border_cand, batch_format="pyarrow"),
        keys=["pid"], aggs={"cand": "min"}).to_pandas()
    if "cand" not in border.columns:   # no border candidates anywhere
        border = pd.DataFrame({"pid": pd.Series([], dtype="int64"),
                               "cand": pd.Series([], dtype="int64")})
    border_ids = border["pid"].to_numpy(dtype=np.int64)
    bord_order = np.argsort(border_ids)
    bref = ray.put((border_ids[bord_order],
                    border["cand"].to_numpy(dtype=np.int64)[bord_order]))

    def label_points(batch: pa.Table) -> pa.Table:
        cids, clab = ray.get(clab_ref)
        bids, blab = ray.get(bref)
        p = batch["pid"].to_numpy()
        role = np.zeros(len(p), dtype=np.int64)      # 0 noise
        lab = np.full(len(p), -1, dtype=np.int64)
        if len(cids):
            k = np.minimum(np.searchsorted(cids, p), len(cids) - 1)
            isc = cids[k] == p
            role[isc] = 2
            lab[isc] = clab[k][isc]
        if len(bids):
            k = np.minimum(np.searchsorted(bids, p), len(bids) - 1)
            isb = (bids[k] == p) & (role == 0)
            role[isb] = 1
            lab[isb] = blab[k][isb]
        names = np.array(["noise", "border", "core"])
        return pa.table({"pid": pa.array(p),
                         "role": pa.array(names[role]),
                         "cluster": pa.array(lab)})

    return points_ds.map_batches(label_points, batch_format="pyarrow")
