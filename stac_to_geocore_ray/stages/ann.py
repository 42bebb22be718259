"""Approximate-nearest-neighbour search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast
once (``ray.put``) and every ``map_batches`` task computes one
``batch x queries`` matmul, emitting only per-batch top-k candidates;
a final tiny driver-side merge keeps the global top-k.  This is the
canonical "broadcast small side + partial aggregate" shape: the
shuffle-free path scales linearly in corpus size.

Scale path: ``IVFIndex`` k-means-lite coarse quantizer — vectors are
assigned to the nearest of C centroids (one groupby key), queries probe
only ``n_probe`` nearest centroid buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .util import table_from_pandas


def _as_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        # reshape(0, -1) raises on an empty values buffer; recover the
        # width from a fixed-size list type so empty FILTERED blocks
        # (e.g. ann_ivf's probe filter) flow through instead of crashing
        d = getattr(col.type, "list_size", 0) or 0
        return np.empty((0, d), dtype=np.float64)
    # list<float> -> (n, d); values buffer is contiguous for non-null cols
    values = col.flatten().to_numpy(zero_copy_only=False)
    return values.reshape(n, -1)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return mat / norm


class BruteForceTopK:
    """``map_batches`` callable: per-batch cosine top-k vs broadcast queries.

    Emits (query_id, vec_id, cos) candidate rows — at most k per query
    per batch, so the final global merge is tiny.
    """

    def __init__(self, queries, k: int = 10, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        try:
            import ray
            if isinstance(queries, ray.ObjectRef):
                queries = ray.get(queries)
        except ImportError:
            pass
        self.query_ids, qmat = queries
        self.qmat = _normalize(np.asarray(qmat, dtype=np.float64))
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:               # empty filtered block
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        mat = _normalize(_as_matrix(batch[self.vec_col]).astype(np.float64))
        ids = batch[self.id_col].to_numpy()
        sims = mat @ self.qmat.T                    # (n, q)
        k = min(self.k, sims.shape[0])
        out_q, out_id, out_cos = [], [], []
        for qi, qid in enumerate(self.query_ids):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k]
            top = top[np.argsort(-col[top], kind="stable")]
            out_q.extend([qid] * len(top))
            out_id.extend(ids[top].tolist())
            out_cos.extend(col[top].tolist())
        return pa.table({"query_id": pa.array(out_q),
                         "vec_id": pa.array(out_id),
                         "cos": pa.array(out_cos, pa.float64())})


def merge_topk(candidates: pa.Table, k: int = 10) -> pa.Table:
    """Driver-side merge of per-batch candidates -> global top-k per query.

    Deterministic tie-break: higher cos first, then lower vec_id.
    """
    import pandas as pd
    df = candidates.to_pandas()
    df = df.sort_values(["query_id", "cos", "vec_id"],
                        ascending=[True, False, True], kind="mergesort")
    out = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return table_from_pandas(out, preserve_index=False)


def planted_neighbors(query_ids, qmat, *, k: int = 10,
                      id_offset: int = 2_000_000,
                      max_corpus_id: int | None = None):
    """Deterministic planted true-neighbour construction for ANN
    value-checking (the ``planted_near_dups`` pattern: the helper IS
    the definition; the SEARCH is what each side computes
    independently).

    For query q and j in 0..k-1: neighbour_j = q rotated by angle
    theta_j = 0.02 + 0.01*j toward a per-(query_id, j)-seeded direction
    orthogonal to q.  cos(q, neighbour_j) = cos(theta_j), strictly
    decreasing in j and >= cos(0.11) ~ 0.9940 — far above the fixture's
    background max (~0.51) — so over the augmented corpus the true
    top-(k+1) of q is [q itself] + its neighbours in j order, BY
    CONSTRUCTION, and an IVF probe that routes q's immediate angular
    neighbourhood correctly must recover exactly that list.  Seeding is
    per (query_id, j): order- and partition-independent.

    Returns (int64 ids, float32 matrix); float32 matches the fixture's
    ``list<float>`` storage so both the engine's unioned rows and the
    golden's replay see bit-identical vectors."""
    import math
    if k > 100:
        raise ValueError("planted id scheme packs j in a base-100 slot")
    # the real collision hazard is a BASE-CORPUS id reaching the
    # planted range [id_offset, ...): engine and golden would then
    # silently disagree (golden's per-query dict collapses the dupe,
    # the engine keeps both rows).  Callers pass the corpus max (from
    # parquet footer stats); query ids are corpus members, so they are
    # checked directly as a fallback when stats are unavailable.
    hi = max([int(max_corpus_id or 0)]
             + [int(q) for q in query_ids])
    if hi >= id_offset:
        raise ValueError(
            f"corpus vec_id {hi} collides with planted id range "
            f"[{id_offset}, ...) — raise id_offset")
    rows_i, rows_v = [], []
    for qid, q in zip(query_ids, qmat):
        q = np.asarray(q, dtype=np.float64)
        nq = np.linalg.norm(q) or 1.0
        u = q / nq
        for j in range(k):
            rs = np.random.RandomState((int(qid) * 1009 + j) & 0x7FFFFFFF)
            while True:
                r = rs.normal(size=q.shape[0])
                r_perp = r - (r @ u) * u
                # redraw (same stream: deterministic) when the draw is
                # numerically parallel to q — the residual would be pure
                # float noise, not a direction
                if np.linalg.norm(r_perp) > 1e-6 * np.linalg.norm(r):
                    break
            r = r_perp / np.linalg.norm(r_perp)
            theta = 0.02 + 0.01 * j
            v = math.cos(theta) * u + math.sin(theta) * r
            rows_i.append(id_offset + int(qid) * 100 + j)
            rows_v.append((v * nq).astype(np.float32))
    return (np.asarray(rows_i, dtype=np.int64),
            np.stack(rows_v) if rows_v else np.empty((0, 0), np.float32))


class IVFIndex:
    """Coarse-quantizer ANN: per-batch centroid assignment stage.

    Centroids come from a deterministic k-means-lite fit (a few Lloyd
    iterations over a sample) done on the driver; ``__call__`` appends
    the nearest-centroid id — the groupby key for bucketed search.
    """

    def __init__(self, centroids, vec_col: str = "embedding"):
        try:
            import ray
            if isinstance(centroids, ray.ObjectRef):
                centroids = ray.get(centroids)
        except ImportError:
            pass
        self.centroids = _normalize(np.asarray(centroids, dtype=np.float64))
        self.vec_col = vec_col

    @staticmethod
    def fit_centroids(sample: np.ndarray, n_centroids: int = 64,
                      iters: int = 5, seed: int = 13) -> np.ndarray:
        rng = np.random.RandomState(seed)
        sample = _normalize(np.asarray(sample, dtype=np.float64))
        idx = rng.choice(len(sample), size=min(n_centroids, len(sample)),
                         replace=False)
        cent = sample[idx].copy()
        for _ in range(iters):
            assign = np.argmax(sample @ cent.T, axis=1)
            for c in range(len(cent)):
                members = sample[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
            cent = _normalize(cent)
        return cent

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_as_matrix(batch[self.vec_col]).astype(np.float64))
        assign = np.argmax(mat @ self.centroids.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_bucket", pa.array(assign))
