"""Deduplication operators for training-data pipelines.

All operators follow the same scale shape: a vectorized
``map_batches`` stage computes per-row keys/sketches, the only
all-to-all is a ``groupby`` on the key, and group-local work touches
one group at a time.  Survivor choice is always ``min(id)`` so results
are deterministic under Ray's nondeterministic block order (SURVEY.md
§7.4 keep-last note: the reference's keep-LAST applies to row-LOCAL
option lists, never to dataset-level dedup).

- exact_dedup_keys: content-hash column for exact dedup
  (groupby(hash).first -> survivors)
- phash_bands / near-dup: 4 x 16-bit bands of the 64-bit pHash; rows
  sharing any band land in one group, in-group Hamming<=d confirms
  (the banding trick bounds candidate pairs, no O(n^2) sweep)
- minhash: shingle -> 64 permuted min-hashes -> LSH bands
- simhash: 64-bit token-weighted simhash + banding
- embedding near-dup: LSH random-hyperplane bucket + in-bucket cosine
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..codecs.fakeimg import hamming64

# ---------------------------------------------------------------- exact


def add_text_hash(batch: pa.Table, col: str = "text",
                  out: str = "content_hash") -> pa.Table:
    """64-bit FNV-1a content hash, vectorized via pandas str hashing."""
    s = batch[col].to_pandas()
    h = pd.util.hash_array(s.to_numpy(dtype=object)).astype(np.int64)
    return batch.append_column(out, pa.array(h))


def first_per_group(g: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Deterministic survivor: the minimum id in the group."""
    return g.loc[[g[id_col].idxmin()]]


# ---------------------------------------------------------------- phash


def phash_band_rows(batch: pa.Table, id_col: str = "image_id",
                    hash_col: str = "phash", n_bands: int = 4) -> pa.Table:
    """Explode each row into (band_id, band_val, id, phash) rows.

    Two hashes within Hamming distance d < n_bands share at least one
    exact band (pigeonhole), so candidate pairs surface in a plain
    groupby on (band_id, band_val).
    """
    h = batch[hash_col].to_numpy().astype(np.int64).view(np.uint64)
    ids = batch[id_col]
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    out_ids, out_band, out_val, out_hash = [], [], [], []
    for b in range(n_bands):
        vals = ((h >> np.uint64(b * width)) & mask).astype(np.int64)
        out_ids.append(ids)
        out_band.append(pa.array(np.full(len(vals), b, dtype=np.int32)))
        out_val.append(pa.array(vals))
        out_hash.append(pa.array(h.view(np.int64)))
    return pa.table({
        id_col: pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                                  else a for a in out_ids]),
        "band_id": pa.concat_arrays(out_band),
        "band_val": pa.concat_arrays(out_val),
        hash_col: pa.concat_arrays(out_hash),
    })


def hamming_pairs_in_group(g: pd.DataFrame, id_col: str = "image_id",
                           hash_col: str = "phash",
                           max_dist: int = 2) -> pd.DataFrame:
    """Candidate bucket -> confirmed near-dup pairs (a < b, dist <= d)."""
    if len(g) < 2:
        return pd.DataFrame({"a": [], "b": [], "dist": []})
    g = g.sort_values(id_col)
    ids = g[id_col].to_numpy()
    hs = g[hash_col].to_numpy().astype(np.int64)
    ia, ib = np.triu_indices(len(g), k=1)
    d = hamming64(hs[ia], hs[ib])
    keep = d <= max_dist
    return pd.DataFrame({"a": ids[ia[keep]], "b": ids[ib[keep]],
                         "dist": d[keep].astype(np.int64)})


# --------------------------------------------------------------- minhash

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)        # fixed seed: deterministic engine-wide
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling-window character k-shingles hashed to uint64."""
    t = text.lower().encode("utf-8", "ignore")
    if len(t) < k:
        t = t + b" " * (k - len(t))
    arr = np.frombuffer(t, dtype=np.uint8)
    n = len(arr) - k + 1
    win = np.lib.stride_tricks.sliding_window_view(arr, k).astype(np.uint64)
    weights = np.uint64(257) ** np.arange(k, dtype=np.uint64)
    return (win * weights[None, :]).sum(axis=1, dtype=np.uint64)


class MinHasher:
    """Stateful stage: per-row MinHash signature + LSH band rows.

    Permutation tables are built once per actor in ``__init__`` (the
    ST5 pattern); ``__call__`` emits (doc_id, band_id, band_hash) rows.
    """

    def __init__(self, num_perm: int = 64, n_bands: int = 16, shingle_k: int = 5,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.a, self.b = _minhash_params(num_perm)
        self.num_perm = num_perm
        self.n_bands = n_bands
        self.rows_per_band = num_perm // n_bands
        self.shingle_k = shingle_k
        self.id_col, self.text_col = id_col, text_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_k)
        # (a*x + b) mod p, then min over shingles, per permutation
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_hash = [], [], []
        for rid, text in zip(ids, texts):
            sig = self.signature(text or "")
            for band in range(self.n_bands):
                chunk = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                bh = int(pd.util.hash_array(chunk.astype(np.int64)).sum()) \
                    & 0x7FFFFFFFFFFFFFFF
                out_id.append(rid)
                out_band.append(band)
                out_hash.append(bh)
        return pa.table({self.id_col: pa.array(out_id),
                         "band_id": pa.array(out_band, pa.int32()),
                         "band_hash": pa.array(out_hash, pa.int64())})

    def jaccard(self, t1: str, t2: str) -> float:
        s1 = set(_shingle_hashes(t1, self.shingle_k).tolist())
        s2 = set(_shingle_hashes(t2, self.shingle_k).tolist())
        if not s1 and not s2:
            return 1.0
        return len(s1 & s2) / len(s1 | s2)


# --------------------------------------------------------------- simhash

class SimHasher:
    """64-bit SimHash over word tokens (regex compiled once per actor)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        import re
        self.word = re.compile(r"\w+", re.UNICODE)
        self.id_col, self.text_col = id_col, text_col

    def simhash(self, text: str) -> int:
        toks = self.word.findall((text or "").lower())
        if not toks:
            return 0
        hs = pd.util.hash_array(np.asarray(toks, dtype=object)).astype(np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        for k in np.flatnonzero(v > 0):
            out |= np.uint64(1) << np.uint64(int(k))
        return int(out.astype(np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        vals = np.fromiter((self.simhash(t) for t in texts), dtype=np.int64,
                           count=len(texts))
        return batch.append_column("simhash", pa.array(vals))


# ------------------------------------------------------- embedding neardup

class EmbeddingLSH:
    """Random-hyperplane LSH bucketing (plane matrices built once per
    actor; deterministic seed).

    Single-table mode (n_tables=1) appends one ``lsh_bucket`` column.
    Multi-table mode emits the standard L-tables-of-k-planes expansion:
    one output row per (vector, table) with (table_id, lsh_bucket) —
    union of in-bucket pairs across tables recovers moderate-similarity
    neighbours a single table would split (recall 1-(1-p^k)^L).
    """

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 11,
                 vec_col: str = "embedding", n_tables: int = 1):
        rng = np.random.RandomState(seed)
        self.planes = [rng.normal(size=(dim, n_planes)).astype(np.float32)
                       for _ in range(n_tables)]
        self.vec_col = vec_col
        self.n_tables = n_tables

    def _buckets(self, mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
        bits = (mat @ planes > 0).astype(np.uint64)
        bucket = np.zeros(len(mat), dtype=np.uint64)
        for k in range(bits.shape[1]):
            bucket = (bucket << np.uint64(1)) | bits[:, k]
        return bucket.astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = np.asarray(col.to_pylist(), dtype=np.float32)
        if self.n_tables == 1:
            return batch.append_column(
                "lsh_bucket", pa.array(self._buckets(mat, self.planes[0])))
        parts = []
        for t, planes in enumerate(self.planes):
            part = batch.append_column(
                "table_id", pa.array(np.full(len(batch), t, dtype=np.int32)))
            part = part.append_column("lsh_bucket",
                                      pa.array(self._buckets(mat, planes)))
            parts.append(part)
        return pa.concat_tables(parts)


def cosine_pairs_in_group(g: pd.DataFrame, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          threshold: float = 0.95) -> pd.DataFrame:
    """In-bucket exact cosine confirmation of near-dup candidates."""
    if len(g) < 2:
        return pd.DataFrame({"a": [], "b": [], "cos": []})
    g = g.sort_values(id_col)
    ids = g[id_col].to_numpy()
    mat = np.asarray(g[vec_col].tolist(), dtype=np.float64)
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    mat = mat / norm
    sim = mat @ mat.T
    ia, ib = np.triu_indices(len(g), k=1)
    keep = sim[ia, ib] >= threshold
    return pd.DataFrame({"a": ids[ia[keep]], "b": ids[ib[keep]],
                         "cos": sim[ia, ib][keep]})


# ------------------------------------------------- connected components

def union_find_components(pairs_a, pairs_b) -> dict:
    """Driver-side union-find: node -> min-node-of-component.

    For OUTPUT-sized pair sets (bounded by the near-dup rate) this is
    the right tool; switch to ``label_propagation_components`` when the
    pair set itself is too big to collect.
    """
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:         # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs_a, pairs_b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent} | \
        {a: find(a) for a in pairs_a} | {b: find(b) for b in pairs_b}


def label_propagation_components(edges_ds, max_rounds: int = 20):
    """Distributed min-label propagation over an edge Dataset (a, b).

    Each round: explode edges both directions, groupby node to take the
    min neighbour label, join back — converges in O(component diameter)
    rounds.  All-to-alls touch (node, label) rows only.  Returns a
    Dataset of (node, cluster).
    """
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Min

    def seed(batch: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([
            batch["a"].combine_chunks() if isinstance(batch["a"], pa.ChunkedArray)
            else batch["a"],
            batch["b"].combine_chunks() if isinstance(batch["b"], pa.ChunkedArray)
            else batch["b"]])
        return pa.table({"node": nodes, "label": nodes})

    labels = edges_ds.map_batches(seed, batch_format="pyarrow") \
        .groupby("node").aggregate(Min("label", alias_name="label"))

    for _ in range(max_rounds):
        # smallest label seen at either endpoint of each edge propagates
        ldf = labels.to_pandas()             # (node,label): component-count
        lmap = dict(zip(ldf.node, ldf.label))

        def relabel(batch: pa.Table) -> pa.Table:
            a = batch["a"].to_pylist()
            b = batch["b"].to_pylist()
            la = [lmap[x] for x in a]
            lb = [lmap[x] for x in b]
            lo = [min(x, y) for x, y in zip(la, lb)]
            return pa.table({"node": pa.array(a + b),
                             "label": pa.array(lo + lo)})

        new_labels = edges_ds.map_batches(relabel, batch_format="pyarrow") \
            .groupby("node").aggregate(Min("label", alias_name="label"))
        ndf = new_labels.to_pandas()
        merged = ldf.merge(ndf, on="node", how="left", suffixes=("", "_new"))
        changed = (merged.label_new < merged.label).sum()
        labels = rd.from_pandas(
            merged.assign(label=merged[["label", "label_new"]].min(axis=1))
            [["node", "label"]])
        if changed == 0:
            break
    return labels
