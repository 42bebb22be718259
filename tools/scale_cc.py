"""A/B probe: endpoint-only vs root-hooking messages in broadcast CC.

Round-5 kernel fix (stages/dedup.label_propagation_broadcast): messaging
only the edge ENDPOINTS merges fragments one boundary hop per round —
diameter-bound on path-shaped components (the near-percolation geometry
DBSCAN produces) — while ALSO messaging the endpoints' current roots
(labels are fully compressed between rounds) gives Boruvka-style
fragment halving.  This probe runs both variants on a shuffled-id path
graph (the worst topology) and reports rounds + wall.

    python tools/scale_cc.py [n_nodes]
"""
import sys
import time

import numpy as np
import pyarrow as pa


def run(n: int, hook_roots: bool, max_rounds: int = 200):
    import ray
    import ray.data as rd
    rng = np.random.default_rng(42)
    ids = rng.permutation(n).astype(np.int64)
    a, b = ids[:-1], ids[1:]
    ds = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)})) \
        .repartition(32).materialize()
    nodes = np.sort(ids)
    nodes_ref = ray.put(nodes)

    def to_idx(batch):
        nd = ray.get(nodes_ref)
        return pa.table({
            "ia": pa.array(np.searchsorted(
                nd, batch["a"].to_numpy()).astype(np.int64)),
            "ib": pa.array(np.searchsorted(
                nd, batch["b"].to_numpy()).astype(np.int64))})

    iedges = ds.map_batches(to_idx, batch_format="pyarrow").materialize()
    labels = np.arange(n, dtype=np.int64)
    t0 = time.time()
    for rnd in range(max_rounds):
        lab_ref = ray.put(labels)

        def msgs(batch):
            lab = ray.get(lab_ref)
            ia = batch["ia"].to_numpy()
            ib = batch["ib"].to_numpy()
            la, lb = lab[ia], lab[ib]
            m = np.minimum(la, lb)
            if hook_roots:
                idx = np.concatenate([ia, ib, la, lb])
                val = np.concatenate([m, m, m, m])
            else:
                idx = np.concatenate([ia, ib])
                val = np.concatenate([m, m])
            order = np.argsort(idx, kind="stable")
            idx, val = idx[order], val[order]
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(idx)) + 1]).astype(np.int64)
            return pa.table({"idx": pa.array(idx[starts]),
                             "lo": pa.array(np.minimum.reduceat(val,
                                                                starts))})

        new = labels.copy()
        for t in iedges.map_batches(msgs, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            if t.num_rows:
                np.minimum.at(new, t["idx"].to_numpy(),
                              t["lo"].to_numpy())
        while True:
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        conv = np.array_equal(new, labels)
        labels = new
        if conv:
            return rnd + 1, time.time() - t0, len(np.unique(labels))
    return None, time.time() - t0, len(np.unique(labels))


def main():
    import ray
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    for hook in (True, False):
        rounds, wall, ncomp = run(n, hook)
        print({"variant": "root-hooking" if hook else "endpoint-only",
               "n_nodes": n, "rounds": rounds,
               "wall_s": round(wall, 1), "n_components": ncomp})
    ray.shutdown()


if __name__ == "__main__":
    main()
