"""Resumable k-core decomposition run.

The h-index fixpoint (queries/tpch.graph_kcore) ran 124 rounds over a
36M-edge graph in the 30x probe — exactly the hours-long-at-100-TB
iterative leg the north rule says must resume from checkpoint instead
of restarting at round 0.  Protocol (the dedup_runs / ManifestSink
conventions):

- ``est-r<k>`` partitions checkpoint the estimate vector every
  ``checkpoint_every`` CHANGED rounds, carrying an order-independent
  edge-set fingerprint as lineage; a resume refuses a sink built from
  a different graph (fingerprint mismatch raises).
- Estimates are monotone non-increasing and each round is a pure
  function of (edges, est), so resuming from round k replays the
  identical sequence — the kill-after-k test demands a byte-identical
  final table.
- A crash between convergence and the final write resumes cleanly:
  the first resumed round observes a fixpoint (no change) and falls
  straight through to the ``coreness-0000`` write.

Cite: reference ``stac-to-geocore/s3_operations.py:31-43`` (lastRun
marker) — generalized here to per-round interior checkpoints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.manifest import ManifestSink


def _kcore_fingerprint(edges) -> str:
    """Order-independent fingerprint of the (pa, pb) edge Dataset:
    row count plus both endpoint sums (exact int64 folds)."""
    n = edges.count()
    spa = int(edges.sum("pa") or 0)
    spb = int(edges.sum("pb") or 0)
    return f"kcore:{n}:{spa}:{spb}"


def _sorted_single_chunk(tbl: pa.Table, keys: list[str]) -> pa.Table:
    return tbl.sort_by([(k, "ascending") for k in keys]).combine_chunks()


def run_kcore_to_parquet(sf_dir: str, out_dir: str, *,
                         resume: bool = True,
                         checkpoint_every: int = 8,
                         max_rounds: int | None = None,
                         fail_after_rounds: int | None = None) -> dict:
    """Resumable coreness run; returns progress/lineage facts.

    ``fail_after_rounds`` injects a crash after that many rounds have
    executed IN THIS RUN (after any due checkpoint write) — the
    kill-after-k hook."""
    from ..queries.tpch import (_kcore_edges_nodes, _kcore_iterate)

    sink = ManifestSink(out_dir)
    if resume:
        sink.clean_orphans()
    else:
        sink.reset()

    edges, nodes, est = _kcore_edges_nodes(sf_dir)
    fp = _kcore_fingerprint(edges)

    if sink.is_done("coreness-0000"):
        m = sink.completed()["coreness-0000"]
        if m.get("inputs") != [fp]:
            raise ValueError(
                f"coreness-0000 in {out_dir!r} belongs to a different "
                f"edge set ({m.get('inputs')} != [{fp}]); reset() the "
                "sink or point at a fresh directory")
        return {"rows": m["rows"], "resumed_final": True,
                "rounds_this_run": 0, "resumed_from": None}

    # latest matching est checkpoint
    start_round = 1
    resumed_from = None
    ckpts: dict[int, dict] = {}
    for pid, m in sink.completed().items():
        if not pid.startswith("est-r"):
            continue
        if m.get("inputs") != [fp]:
            raise ValueError(
                f"k-core checkpoint {pid!r} in {out_dir!r} belongs to "
                f"a DIFFERENT edge set ({m.get('inputs')} != [{fp}]); "
                "reset() the sink or point at a fresh directory")
        ckpts[int(pid.split("-r")[1])] = m
    if ckpts:
        import pyarrow.parquet as pq
        latest = max(ckpts)
        ck = pq.read_table(ckpts[latest]["path"])
        ck_nodes = ck["node"].to_numpy(zero_copy_only=False)
        if not np.array_equal(ck_nodes, nodes):
            raise ValueError("checkpointed node inventory diverges "
                             "from the edge set — stale checkpoint")
        est = ck["est"].to_numpy(zero_copy_only=False).astype(np.int64)
        start_round = latest + 1
        resumed_from = latest

    executed = 0

    def on_round(k: int, est_arr: np.ndarray) -> None:
        nonlocal executed
        executed += 1
        if k % checkpoint_every == 0:
            tbl = pa.table({"node": pa.array(nodes, pa.int64()),
                            "est": pa.array(est_arr, pa.int64())}) \
                .combine_chunks()
            sink.write_partition(f"est-r{k:04d}", tbl, inputs=[fp])
        if fail_after_rounds is not None and executed >= fail_after_rounds:
            raise RuntimeError(
                "injected failure inside the k-core round loop")

    est, rounds = _kcore_iterate(edges, nodes, est,
                                 start_round=start_round,
                                 max_rounds=max_rounds,
                                 on_round=on_round)
    final = _sorted_single_chunk(
        pa.table({"node": pa.array(nodes, pa.int64()),
                  "coreness": pa.array(est, pa.int64())}), ["node"])
    sink.write_partition("coreness-0000", final, inputs=[fp])
    return {"rows": final.num_rows, "resumed_final": False,
            "total_rounds": rounds, "rounds_this_run": executed,
            "resumed_from": resumed_from}
