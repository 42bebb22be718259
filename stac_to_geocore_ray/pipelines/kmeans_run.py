"""Checkpointed runner for the iterative k-means leg.

The dedup/cluster legs got per-stage lineage in round 5
(``dedup_runs.py``); this extends the same write-then-marker protocol
to the ITERATIVE op class, where the natural checkpoint grain is the
ROUND: each Lloyd round's centroids are a k x d table (bytes), so a
crash at round 4 of 5 over a 100-TB corpus loses one pass, not five.

Stage layout (ManifestSink partitions, written in order):

1. ``seeds-0000`` — the deterministic seed centroids (one row per
   cluster, centroid as list<double>).
2. ``round-<k>`` for k in range(KMEANS_ITERS) — the post-round-k
   centroids.  Each round's manifest records the PREVIOUS stage's
   checksum in ``inputs``; a resume re-validates the chain and refuses
   a checkpoint written from different seeds / a different corpus
   evolution (the same foreign-checkpoint guard as the label-
   propagation checkpoints).
3. ``labels-<i>`` for i in range(n_parts) — the final (vec_id,
   cluster) assignment, split into contiguous CONTENT ranges of the
   vec_id-sorted table (never block boundaries), so a resumed run
   regenerates the identical remaining partitions.

Determinism: centroids are quantized per round (the engine contract —
see queries/embeddings.py), so a resumed chain is bit-identical to an
uninterrupted one; the kill-after-k test asserts checksum equality
per partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.manifest import ManifestSink


def _centroid_table(C: np.ndarray) -> pa.Table:
    return pa.table({
        "cluster": pa.array(np.arange(len(C), dtype=np.int64)),
        "centroid": pa.array([row.tolist() for row in C],
                             pa.list_(pa.float64()))}).combine_chunks()


def _centroids_from(tbl: pa.Table) -> np.ndarray:
    order = np.argsort(tbl["cluster"].to_numpy())
    return np.asarray(tbl["centroid"].to_pylist(),
                      dtype=np.float64)[order]


def run_kmeans_to_parquet(sf_dir: str, out_dir: str, *,
                          resume: bool = True,
                          fail_after_rounds: int | None = None,
                          n_parts: int = 4) -> dict:
    """Resumable Lloyd's k-means -> partitioned (vec_id, cluster) parquet.

    ``fail_after_rounds=k`` injects a crash after k round checkpoints
    (fault injection for the kill/resume tests).  Returns a report with
    ``rounds_run`` / ``seeds_resumed`` so tests can assert that
    completed stages were skipped, not recomputed.
    """
    import pyarrow.parquet as pq

    from ..queries._common import _meta_read, _t
    from ..queries.embeddings import (KMEANS_ITERS, _kmeans_label_ds,
                                      _kmeans_round, _kmeans_seed)
    sink = ManifestSink(out_dir)
    if resume:
        sink.clean_orphans()
    else:
        sink.reset()
    done = sink.completed()

    ds = _meta_read(_t(sf_dir, "embeddings"),
                    columns=["vec_id", "embedding"])

    # the lineage chain rides the MANIFEST checksums (computed on the
    # in-memory table at write time): a parquet round-trip can relayout
    # buffers, so recomputing table_checksum on a read-back table would
    # break the chain between a fresh write and a resumed read
    seeds_resumed = "seeds-0000" in done
    if seeds_resumed:
        m = done["seeds-0000"]
        ct = pq.read_table(m["path"])
    else:
        ct = _centroid_table(_kmeans_seed(ds))
        m = sink.write_partition("seeds-0000", ct, inputs=[sf_dir])
    C = _centroids_from(ct)
    prev_sum = m["checksum"]

    rounds_run = 0
    for k in range(KMEANS_ITERS):
        pid = f"round-{k:04d}"
        if sink.is_done(pid):
            m = sink.completed()[pid]
            if m["inputs"] != [prev_sum]:
                raise RuntimeError(
                    f"kmeans checkpoint {pid} was written from a "
                    f"different centroid chain ({m['inputs']} != "
                    f"[{prev_sum}]) — refusing a foreign checkpoint")
            ct = pq.read_table(m["path"])
        else:
            ct = _centroid_table(_kmeans_round(ds, C))
            m = sink.write_partition(pid, ct, inputs=[prev_sum])
            rounds_run += 1
            if fail_after_rounds is not None \
                    and rounds_run >= fail_after_rounds:
                raise RuntimeError("injected failure inside the "
                                   "k-means round loop")
        C = _centroids_from(ct)
        prev_sum = m["checksum"]

    label_pids = [f"labels-{i:04d}" for i in range(n_parts)]
    layout = f"n_parts={n_parts}"
    for p, m in sink.completed().items():
        if not p.startswith("labels-"):
            continue
        if layout not in m["inputs"]:
            raise ValueError(
                f"kmeans labels checkpoint {p} was written under a "
                f"different range layout ({m['inputs']}); resuming with "
                f"{layout} would mix partitionings — reset or match it")
        if prev_sum not in m["inputs"]:
            raise RuntimeError(
                f"kmeans labels checkpoint {p} was written from a "
                f"different centroid chain — refusing a foreign "
                f"checkpoint")
    if all(sink.is_done(p) for p in label_pids):
        done = sink.completed()
        return {"rows": sum(done[p]["rows"] for p in label_pids),
                "rounds_run": rounds_run, "seeds_resumed": seeds_resumed,
                "labels_resumed": True}

    lt = pa.concat_tables(
        _kmeans_label_ds(ds, C).iter_batches(batch_format="pyarrow"))
    lt = lt.sort_by([("vec_id", "ascending")]).combine_chunks()
    # contiguous content ranges of the sorted table: stable across
    # cluster sizes and block layouts, so a resumed run rewrites the
    # identical remaining partitions
    bounds = np.linspace(0, lt.num_rows, n_parts + 1).astype(int)
    for i, pid in enumerate(label_pids):
        part = lt.slice(bounds[i], bounds[i + 1] - bounds[i]) \
            .combine_chunks()
        sink.write_partition(pid, part, inputs=[prev_sum, layout])
    return {"rows": lt.num_rows, "rounds_run": rounds_run,
            "seeds_resumed": seeds_resumed, "labels_resumed": False}
