"""Golden-table oracles for deterministic rows-only queries.

The driver's correctness gate runs DuckDB SQL side-by-side with each
Ray pipeline.  Ops DuckDB cannot compute (simhash, hex/S2 encodings,
image decode) get a GOLDEN TABLE instead: a straight-line,
row-at-a-time reimplementation (plain Python loops — none of the
engine's vectorized kernels or Ray plumbing) writes a parquet file,
and the registered oracle SQL is simply ``SELECT ... FROM
read_parquet('<golden>')``.  A bug in the engine's vectorization,
flat-maps, shuffles or aggregation then shows up as a hash mismatch
exactly like any other oracle row.

Where the underlying definition IS a library call (pd.util.hash_array
for simhash tokens, the S2 cell math), the golden calls it per-row on
scalars — validating everything above the kernel; the kernels
themselves are covered by unit/property tests (tests/test_geo.py).

Goldens regenerate deterministically under /tmp/stgr_goldens/<sf>/ and
are cheap (~10 s total at sf0.01).
"""

from __future__ import annotations

import math
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

GOLDEN_ROOT = "/tmp/stgr_goldens"
# bump when a golden-relevant kernel definition changes
# (v2: interval-based bbox_covering replaced the sampled lattice)
GOLDEN_VERSION = 2

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_TOK_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


def _docs(sf_dir: str) -> pd.DataFrame:
    return pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()


# ------------------------------------------------------------ text goldens

def golden_simhash(sf_dir: str) -> pa.Table:
    """Scalar per-doc simhash: token hashes via pd.util.hash_array (the
    hash definition), bit votes in a plain Python loop."""
    docs = _docs(sf_dir)
    out = []
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = _WORD_RE.findall((text or "").lower())
        if not toks:
            out.append((int(doc_id), 0))
            continue
        hs = pd.util.hash_array(np.asarray(toks, dtype=object))
        votes = [0] * 64
        for h in hs:
            for k in range(64):
                votes[k] += 1 if (int(h) >> k) & 1 else -1
        val = 0
        for k in range(64):
            if votes[k] > 0:
                val |= 1 << k
        if val >= 1 << 63:
            val -= 1 << 64
        out.append((int(doc_id), val))
    return pa.table({"doc_id": pa.array([a for a, _ in out], pa.int64()),
                     "simhash": pa.array([b for _, b in out], pa.int64())})


def golden_doc_quality(sf_dir: str) -> pa.Table:
    """Scalar quality metrics mirroring stages/text.py TextQuality."""
    from .stages.text import _STOP_EN, _STOP_FR
    stop = _STOP_EN | _STOP_FR
    docs = _docs(sf_dir)
    ids, ntok, nch, qual = [], [], [], []
    for doc_id, text in zip(docs.doc_id, docs.text):
        s = text or ""
        toks = _TOK_RE.findall(s)
        words = _WORD_RE.findall(s.lower())
        n_tokens = len(toks)
        n_chars = len(s)
        stop_cnt = sum(w in stop for w in words)
        stop_ratio = stop_cnt / max(1, len(words))
        punct_ratio = max(0, n_tokens - len(words)) / max(1, n_tokens)
        q = (min(1.0, max(0.0, n_chars / 500.0)) * 0.4
             + (1.0 - punct_ratio) * 0.3
             + min(1.0, max(0.0, stop_ratio * 3.0)) * 0.3)
        ids.append(int(doc_id)); ntok.append(n_tokens)
        nch.append(n_chars)
        # np.round is the engine's rounding spec (pandas .round(6));
        # builtin round() differs by 1 ulp on some values
        qual.append(float(np.round(np.float64(q), 6)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "n_tokens": pa.array(ntok, pa.int64()),
                     "n_chars2": pa.array(nch, pa.int64()),
                     "quality_r": pa.array(qual, pa.float64())})


def golden_fingerprints(sf_dir: str) -> pa.Table:
    """Pure-Python byte-at-a-time Horner hash (independent of the
    vectorized power-sum in stages/text.py Fingerprinter)."""
    docs = _docs(sf_dir)
    ids, fps = [], []
    for doc_id, text in zip(docs.doc_id, docs.text):
        data = (text or "").encode("utf-8", "ignore")
        if not data:
            val = 0
        else:
            h = 1469598103934665603
            for b in data:
                h = (h * 1000003 + b) & 0xFFFFFFFFFFFFFFFF
            val = h - (1 << 64) if h >= 1 << 63 else h
        ids.append(int(doc_id)); fps.append(val)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "fingerprint": pa.array(fps, pa.int64())})


def golden_langid(sf_dir: str) -> pa.Table:
    """Per-lang accuracy rollup via a scalar trigram scorer."""
    from .stages.text import _PROFILES
    docs = _docs(sf_dir)
    counts: dict[str, list[int]] = {}
    for lang, text in zip(docs.lang, docs.text):
        t = (text or "").lower()
        tris = {t[i:i + 3] for i in range(max(0, len(t) - 2))}
        best, best_hits = "unknown", 0
        for cand, prof in _PROFILES.items():
            hits = len(tris & set(prof))
            if hits > best_hits:
                best, best_hits = cand, hits
        n, ok = counts.setdefault(lang, [0, 0])
        counts[lang][0] = n + 1
        counts[lang][1] = ok + (1 if best == lang else 0)
    langs = sorted(counts)
    return pa.table({"lang": pa.array(langs, pa.string()),
                     "n": pa.array([counts[l][0] for l in langs], pa.int64()),
                     "n_correct": pa.array([counts[l][1] for l in langs],
                                           pa.int64())})


# ------------------------------------------------------------- geo goldens

def _hex_cell_scalar(lat: float, lng: float, res: int) -> int:
    """Scalar hex encode: same published axial/aperture-7 math as
    geo/hexgrid.py, reimplemented with plain floats."""
    from .geo import hexgrid as hg
    a = res * math.atan2(math.sqrt(3.0), 5.0)
    c, s = math.cos(a), math.sin(a)
    xr = lng * c + lat * s
    yr = -lng * s + lat * c
    size = 15.0 / (math.sqrt(7.0) ** res)
    qf = (math.sqrt(3.0) / 3.0 * xr - yr / 3.0) / size
    rf = (2.0 / 3.0 * yr) / size
    # cube rounding
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = round(xf), round(yf), round(zf)
    dx, dy, dz = abs(rx - xf), abs(ry - yf), abs(rz - zf)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif dz > dy:
        rz = -rx - ry
    # else: y absorbs the residual (y is not part of the axial output)
    q, r = int(rx), int(rz)
    return int(hg.pack(res, np.array([q]), np.array([r]))[0])


def _items_df(sf_dir: str) -> pd.DataFrame:
    from .sources import fixtures
    p = fixtures.paths(sf_dir)
    return pq.read_table(p["stac_items"],
                         columns=["image_id", "item_id", "bbox"]).to_pandas()


def golden_geo_cells(sf_dir: str) -> pa.Table:
    """Per-item cell ids: scalar centroid + scalar hex encode + per-row
    S2 library call (S2 kernel is property-tested separately)."""
    from .geo import s2 as s2mod
    items = _items_df(sf_dir)
    ids, s2c, hexc, hexp = [], [], [], []
    for image_id, bb in zip(items.image_id, items.bbox):
        w, s, e, n = (float(x) for x in bb)
        cx, cy = (w + e) / 2.0, (s + n) / 2.0
        ids.append(image_id)
        s2c.append(int(np.int64(
            s2mod.latlng_to_cell(np.array([cy]), np.array([cx]), 9)[0])))
        hexc.append(_hex_cell_scalar(cy, cx, 7))
        hexp.append(_hex_cell_scalar(cy, cx, 4))
    return pa.table({"image_id": pa.array(ids, pa.string()),
                     "s2_cell": pa.array(s2c, pa.int64()),
                     "hex_cell": pa.array(hexc, pa.int64()),
                     "hex_prefix": pa.array(hexp, pa.int64())})


def golden_s2_covering(sf_dir: str) -> pa.Table:
    """Per-item S2 covering rows via per-row library calls (validates
    the Ray flat-map plumbing and row multiplicity)."""
    from .geo import s2 as s2mod
    items = _items_df(sf_dir)
    out_id, out_cell = [], []
    for item_id, bb in zip(items.item_id, items.bbox):
        w, s, e, n = (float(x) for x in bb)
        cells = s2mod.bbox_covering(w, s, e, n, 7, grid=4)
        for c in cells.astype("int64").tolist():
            out_id.append(item_id)
            out_cell.append(c)
    return pa.table({"item_id": pa.array(out_id, pa.string()),
                     "s2_cell": pa.array(out_cell, pa.int64())})


# ----------------------------------------------------------- image goldens

def golden_decode_stats(sf_dir: str) -> pa.Table:
    """Per-fmt decode-invariant counts via a straight per-image loop."""
    import glob as _glob

    from .codecs import fakeimg as fi
    from .sources import fixtures
    p = fixtures.paths(sf_dir)
    counts: dict[str, list[int]] = {}
    for shard in sorted(_glob.glob(os.path.join(p["images"], "*.parquet"))):
        t = pq.read_table(shard, columns=["bytes", "fmt", "phash"])
        for buf, fmt, ph in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist(),
                                t["phash"].to_pylist()):
            row = counts.setdefault(fmt, [0, 0, 0, 0])
            row[0] += 1
            try:
                arr = fi.decode(buf)
            except Exception:
                continue
            row[1] += 1
            if fi.phash(arr) == ph:
                row[2] += 1
            if fmt == "png":
                psnr = float("inf")
            else:
                psnr = fi.psnr(arr, (arr >> 1) << 1)
            if psnr >= 40.0:
                row[3] += 1
    fmts = sorted(counts)
    return pa.table({
        "fmt": pa.array(fmts, pa.string()),
        "n": pa.array([counts[f][0] for f in fmts], pa.int64()),
        "n_decoded": pa.array([counts[f][1] for f in fmts], pa.int64()),
        "n_phash_match": pa.array([counts[f][2] for f in fmts], pa.int64()),
        "n_psnr_ok": pa.array([counts[f][3] for f in fmts], pa.int64())})


def golden_tile_phash_stats(sf_dir: str) -> pa.Table:
    """SCALAR per-tile replay of decode+tile+pHash: plain loops over
    every image's tile grid calling the scalar fi.phash — the
    independent check of the Tiler's batched per-shape DCT path.
    Emits per-collection tile counts + sum of (phash mod 2147483647)
    (order-independent checksum)."""
    import glob as _glob

    from .codecs import fakeimg as fi
    from .sources import fixtures
    p = fixtures.paths(sf_dir)
    t = 64
    counts: dict[str, list[int]] = {}
    img_shards = sorted(_glob.glob(os.path.join(p["images"], "*.parquet")))
    item_shards = sorted(_glob.glob(os.path.join(p["stac_items"],
                                                 "*.parquet")))
    if [os.path.basename(a) for a in img_shards] != \
            [os.path.basename(b) for b in item_shards]:
        raise RuntimeError(
            "images/ and stac_items/ shard sets differ — fixture dir is "
            "misaligned (stale or partially regenerated); re-generate it")
    for ishard, sshard in zip(img_shards, item_shards):
        imgs = pq.read_table(ishard, columns=["image_id", "bytes"])
        items = pq.read_table(sshard, columns=["image_id", "collection_id"])
        coll_of = dict(zip(items["image_id"].to_pylist(),
                           items["collection_id"].to_pylist()))
        for image_id, buf in zip(imgs["image_id"].to_pylist(),
                                 imgs["bytes"].to_pylist()):
            coll = coll_of[image_id]
            row = counts.setdefault(coll, [0, 0])
            arr = fi.decode(buf)
            h, w = arr.shape[0], arr.shape[1]
            for ty in range((h + t - 1) // t):
                for tx in range((w + t - 1) // t):
                    tile = arr[ty * t:ty * t + t, tx * t:tx * t + t]
                    ph = np.uint64(np.int64(fi.phash(tile)))
                    row[0] += 1
                    row[1] += int(ph % np.uint64(2147483647))
    colls = sorted(counts)
    return pa.table({
        "collection_id": pa.array(colls, pa.string()),
        "n_tiles": pa.array([counts[c][0] for c in colls], pa.int64()),
        "phash_residue_sum": pa.array([counts[c][1] for c in colls],
                                      pa.int64())})


def golden_tile_topk_phash(sf_dir: str) -> pa.Table:
    """Scalar replay of the salted holistic top-k: decode every image,
    loop its tile grid computing pHash (scalar fi.phash, same as
    golden_tile_phash_stats) and the tile-center hex prefix (res 4,
    one latlng_to_cell call per tile), count per (prefix, phash), and
    emit each prefix's top-3 by (count desc, phash asc) with rank."""
    import glob as _glob

    from .codecs import fakeimg as fi
    from .geo import hexgrid
    from .sources import fixtures
    p = fixtures.paths(sf_dir)
    t = 64
    counts: dict[tuple[int, int], int] = {}
    img_shards = sorted(_glob.glob(os.path.join(p["images"], "*.parquet")))
    item_shards = sorted(_glob.glob(os.path.join(p["stac_items"],
                                                 "*.parquet")))
    if [os.path.basename(a) for a in img_shards] != \
            [os.path.basename(b) for b in item_shards]:
        raise RuntimeError(
            "images/ and stac_items/ shard sets differ — fixture dir is "
            "misaligned (stale or partially regenerated); re-generate it")
    for ishard, sshard in zip(img_shards, item_shards):
        imgs = pq.read_table(ishard, columns=["image_id", "bytes"])
        items = pq.read_table(sshard, columns=["image_id", "bbox"])
        bbox_of = dict(zip(items["image_id"].to_pylist(),
                           items["bbox"].to_pylist()))
        for image_id, buf in zip(imgs["image_id"].to_pylist(),
                                 imgs["bytes"].to_pylist()):
            bw, bs, be, bn = bbox_of[image_id]
            arr = fi.decode(buf)
            h, w = arr.shape[0], arr.shape[1]
            ntx = (w + t - 1) // t
            nty = (h + t - 1) // t
            for ty in range(nty):
                for tx in range(ntx):
                    tile = arr[ty * t:ty * t + t, tx * t:tx * t + t]
                    ph = int(fi.phash(tile))
                    tw = t if tx < ntx - 1 else w - (ntx - 1) * t
                    th = t if ty < nty - 1 else h - (nty - 1) * t
                    cx = (tx * t + tw / 2.0) / w
                    cy = (ty * t + th / 2.0) / h
                    lon = bw + cx * (be - bw)
                    lat = bn - cy * (bn - bs)
                    prefix = int(hexgrid.latlng_to_cell(
                        np.array([lat]), np.array([lon]), 4)[0])
                    key = (prefix, ph)
                    counts[key] = counts.get(key, 0) + 1
    per_cell: dict[int, list[tuple[int, int]]] = {}
    for (prefix, ph), n in counts.items():
        per_cell.setdefault(prefix, []).append((n, ph))
    rows = []
    for prefix in sorted(per_cell):
        top = sorted(per_cell[prefix], key=lambda x: (-x[0], x[1]))[:3]
        for rank, (n, ph) in enumerate(top, 1):
            rows.append((prefix, ph, n, rank))
    return pa.table({
        "hex_prefix": pa.array([r[0] for r in rows], pa.int64()),
        "tile_phash": pa.array([r[1] for r in rows], pa.int64()),
        "n": pa.array([r[2] for r in rows], pa.int64()),
        "rank": pa.array([r[3] for r in rows], pa.int64())})


def golden_video_frames(sf_dir: str) -> pa.Table:
    """Scalar replay of video_frame_sample: rebuild the same 16 GVID
    containers from shard0 images (the query's construction), decode
    every sampled frame scalar, call the SCALAR ``fi.phash`` per frame
    — the independent pin of FrameSampler's batched `_PhashAccum` /
    `phash_batch` path."""
    import glob as _glob

    from .codecs import fakeimg as fi
    from .sources import fixtures
    p = fixtures.paths(sf_dir)
    shard0 = sorted(_glob.glob(os.path.join(p["images"], "*.parquet")))[0]
    imgs = pq.read_table(shard0, columns=["bytes"]).column("bytes").to_pylist()
    stride = 2
    vids, fidx, ws, hs, phs = [], [], [], [], []
    for v in range(16):
        for k in range(4):
            if k % stride:
                continue
            arr = fi.decode(imgs[v * 4 + k])
            vids.append(f"vid-{v:04d}")
            fidx.append(k)
            ws.append(arr.shape[1])
            hs.append(arr.shape[0])
            phs.append(fi.phash(arr))
    return pa.table({
        "video_id": pa.array(vids, pa.string()),
        "frame_index": pa.array(fidx, pa.int32()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "frame_phash": pa.array(phs, pa.int64())})


def golden_audio_features(sf_dir: str) -> pa.Table:
    """Pure-scalar replay of audio_features' checked columns: per-clip
    duration / RMS / zero-cross rate from the synthesized GAUD PCM via
    plain Python loops (math.fsum accumulation) — independent of the
    numpy DSP in stages/multimodal.AudioFeatures."""
    from .stages.multimodal import decode_audio, encode_audio, synth_clip
    ids, durs, rmss, zcrs = [], [], [], []
    for k in range(32):
        rate, pcm = decode_audio(encode_audio(synth_clip(k, 16_000, 0.5),
                                              16_000))
        x = [s / 32768.0 for s in pcm.tolist()]
        n = len(x)
        dur = n / rate
        rms = math.sqrt(math.fsum(v * v for v in x) / n) if n else 0.0
        zc = (sum((x[i] < 0) != (x[i + 1] < 0) for i in range(n - 1))
              / (n - 1)) if n > 1 else 0.0
        ids.append(f"clip-{k:04d}")
        durs.append(dur)
        rmss.append(float(np.round(np.float64(rms), 6)))
        zcrs.append(float(np.round(np.float64(zc), 6)))
    return pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "duration_sec": pa.array(durs, pa.float64()),
        "rms_r": pa.array(rmss, pa.float64()),
        "zcr_r": pa.array(zcrs, pa.float64())})


def golden_embedding_neardup(sf_dir: str) -> pa.Table:
    """Exact O(n^2) per-pair cosine scan (scalar np.dot per pair) over
    the augmented corpus (embeddings + planted near-dups), threshold
    0.90 — independent of the engine's LSH bucketing / groupby /
    in-bucket matmul path.  The planted-dup construction is the shared
    spec (stages/dedup.planted_near_dups)."""
    from .stages.dedup import planted_near_dups
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    dup_ids, dup_mat = planted_near_dups(ids, mat)
    all_ids = np.concatenate([ids, dup_ids])
    all_mat = np.concatenate([mat, dup_mat])
    order = np.argsort(all_ids)
    all_ids, all_mat = all_ids[order], all_mat[order]
    unit = []
    for v in all_mat:
        nv = math.sqrt(float(np.dot(v, v)))
        unit.append(v / nv if nv else v)
    n = len(all_ids)
    rows = []
    for i in range(n):
        for j in range(i + 1, n):
            c = float(np.dot(unit[i], unit[j]))
            if c >= 0.90:
                rows.append((int(all_ids[i]), int(all_ids[j]),
                             float(np.round(np.float64(c), 4))))
    rows.sort()
    return pa.table({
        "a": pa.array([r[0] for r in rows], pa.int64()),
        "b": pa.array([r[1] for r in rows], pa.int64()),
        "cos_r": pa.array([r[2] for r in rows], pa.float64())})


def golden_ann_ivf(sf_dir: str) -> pa.Table:
    """Exact scalar top-10-per-query scan over the augmented corpus
    (embeddings + planted true neighbours), self-match excluded —
    independent of the engine's IVF bucketing / probe filter / partial
    top-k merge.  The planted construction is the shared spec
    (stages/ann.planted_neighbors); by that construction the true
    top-10 is the planted set in angle order, so equality here proves
    the probed search recovers every true neighbour exactly."""
    from .queries import _ANN_QUERY_IDS
    from .stages.ann import planted_neighbors
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    qrow = {int(v): i for i, v in enumerate(ids)}
    qmat = np.stack([mat[qrow[q]] for q in _ANN_QUERY_IDS])
    p_ids, p_mat = planted_neighbors(list(_ANN_QUERY_IDS), qmat)
    all_ids = np.concatenate([ids, p_ids])
    all_mat = np.concatenate([mat, p_mat.astype(np.float64)])
    unit = []
    for v in all_mat:                      # scalar per-row normalize
        nv = math.sqrt(float(np.dot(v, v)))
        unit.append(v / nv if nv else v)
    rows = []
    for q in _ANN_QUERY_IDS:
        qv = unit[qrow[int(q)]]
        sims = [(float(np.dot(u, qv)), int(i))
                for i, u in zip(all_ids, unit) if int(i) != int(q)]
        sims.sort(key=lambda s: (-s[0], s[1]))
        for rank, (c, vid) in enumerate(sims[:10], start=1):
            rows.append((int(q), rank, vid,
                         float(np.round(np.float64(c), 4))))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "rank": pa.array([r[1] for r in rows], pa.int64()),
        "vec_id": pa.array([r[2] for r in rows], pa.int64()),
        "cos_r": pa.array([r[3] for r in rows], pa.float64())})


def golden_thumbnails(sf_dir: str) -> pa.Table:
    """Per-PIXEL Python replay of the 32x32 block-mean thumbnail over
    the same 64 shard-0 images image_thumbnails resizes: plain loops
    over every output cell's pixel block, floor quantization —
    independent of the engine's integral-image kernel."""
    import glob as _glob

    from .codecs import fakeimg as fi
    from .sources import fixtures
    p = fixtures.paths(sf_dir)
    shard0 = sorted(_glob.glob(os.path.join(p["images"], "*.parquet")))[0]
    t = pq.read_table(shard0, columns=["image_id", "bytes"]).slice(0, 64)
    ids, ws, hs, sums = [], [], [], []
    T = 32
    for iid, buf in zip(t["image_id"].to_pylist(), t["bytes"].to_pylist()):
        arr = fi.decode(buf)
        h, w, c = arr.shape
        total = 0
        for by in range(T):
            r0, r1 = (by * h) // T, ((by + 1) * h) // T
            for bx in range(T):
                c0, c1 = (bx * w) // T, ((bx + 1) * w) // T
                for ch in range(c):
                    acc = 0
                    for y in range(r0, r1):
                        for x in range(c0, c1):
                            acc += int(arr[y, x, ch])
                    total += math.floor(acc / ((r1 - r0) * (c1 - c0)))
        ids.append(iid)
        ws.append(w)
        hs.append(h)
        sums.append(total % 2147483647)
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "src_w": pa.array(ws, pa.int64()),
        "src_h": pa.array(hs, pa.int64()),
        "thumb_checksum": pa.array(sums, pa.int64())})


def golden_harvest_manifests(sf_dir: str) -> pa.Table:
    """Expected harvest partition set, derived from INPUT fragments
    only: one partition per stac_items shard carrying that shard's row
    count (translate is 1:1 per item) plus the root+collections
    small-sides partition — independent of the engine's translate /
    sink / resume machinery.  ``partition_id`` is the shared pure id
    definition (the pd.util.hash_array pattern: the helper IS the
    spec)."""
    import glob as _glob

    from .sources import fixtures
    from .state.manifest import partition_id
    p = fixtures.paths(sf_dir)
    rows = []
    for frag in sorted(_glob.glob(os.path.join(p["stac_items"],
                                               "*.parquet"))):
        rows.append((partition_id(frag),
                     pq.ParquetFile(frag).metadata.num_rows))
    ncoll = pq.ParquetFile(p["collections"]).metadata.num_rows
    rows.append(("smallsides-" + partition_id("root+collections"), ncoll))
    rows.sort()
    return pa.table({
        "partition_id": pa.array([r[0] for r in rows], pa.string()),
        "rows": pa.array([r[1] for r in rows], pa.int64())})


# --------------------------------------------------------- geocore golden

def golden_geocore_assemble(sf_dir: str) -> pa.Table:
    """Serial replay of the full translate+assemble path: each fixture
    shard runs through the (Ray-free) ItemTranslator callable and
    per-row assemble_record, no Ray involved.  This pins the Ray wiring
    (items_dataset read, actor stage, measurement map) — the assembly
    MATH is the same code, but the flat fields feeding it are
    independently SQL-checked via geocore_items."""
    import glob
    import json as _json

    from .sources import fixtures
    from .stages.assemble import assemble_record
    from .stages.geocore import ItemTranslator, collection_lookup
    p = fixtures.paths(sf_dir)
    lut = collection_lookup(pq.read_table(p["collections"]))
    tr = ItemTranslator(lut)
    ids, lens = [], []
    for shard in sorted(glob.glob(os.path.join(p["stac_items"],
                                               "*.parquet"))):
        flat = tr(pq.read_table(shard))
        for row in flat.to_pylist():
            rec = assemble_record(row)
            ids.append(row["id"])
            lens.append(len(_json.dumps(rec, ensure_ascii=False)))
    return pa.table({"id": pa.array(ids, pa.string()),
                     "json_len": pa.array(lens, pa.int64())})


# ------------------------------------------------------------- registry


def golden_kmeans(sf_dir: str) -> pa.Table:
    """Single-process Lloyd replay of the deterministic k-means spec
    (queries/embeddings.py kmeans_embeddings: smallest-vec_id seeds,
    KMEANS_QUANT-quantized centroid updates, lowest-id tie-break) —
    independent of the engine's per-batch partial sums, driver fold
    and broadcast plumbing.  Per-point distances go through scalar
    dot products in a plain loop; the quantized-centroid contract is
    what makes the two evaluation orders agree exactly (drift between
    summation orders is O(1e-15) relative, quantization is 1e-6)."""
    from .queries.embeddings import KMEANS_K, KMEANS_ITERS, KMEANS_QUANT
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]

    def assign_one(x, cents):
        best, bestd = 0, None
        for j, c in enumerate(cents):
            d = ((x - c) ** 2).sum()      # same reduction as the engine
            if bestd is None or d < bestd:
                best, bestd = j, d
        return best

    cents = [mat[j].copy() for j in range(KMEANS_K)]
    for _ in range(KMEANS_ITERS):
        members = {j: [] for j in range(KMEANS_K)}
        for i in range(len(ids)):         # scalar assignment loop
            members[assign_one(mat[i], cents)].append(i)
        for j in range(KMEANS_K):
            if members[j]:
                s = np.zeros(mat.shape[1])
                for i in members[j]:
                    s = s + mat[i]
                cents[j] = np.round(s / len(members[j]), KMEANS_QUANT)
    out = [assign_one(mat[i], cents) for i in range(len(ids))]
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "cluster": pa.array(out, pa.int64())})

def golden_geo_union_area(sf_dir: str) -> pa.Table:
    """Per-collection exact union area: GLOBAL (untiled) y-compressed
    slab sweep over the whole collection — independent of the engine's
    tile decomposition and of its grid kernel; shares only the
    fixed-point quantizer (parity requires ONE quantization rule)."""
    from .sources import fixtures
    from .stages.footprint import quantize_rects, rect_union_area_sweep
    p = fixtures.paths(sf_dir)
    df = pq.read_table(p["stac_items"],
                       columns=["collection_id", "bbox"]).to_pandas()
    rows = []
    for cid, g in df.groupby("collection_id", sort=True):
        bb = np.stack(g.bbox.to_numpy())
        r = quantize_rects(bb)
        rows.append((cid, int(rect_union_area_sweep(r))))
    return pa.table({
        "collection_id": pa.array([c for c, _ in rows], pa.string()),
        "union_area_u": pa.array([a for _, a in rows], pa.int64())})


def golden_geo_convex_hull(sf_dir: str) -> pa.Table:
    """Scalar per-collection convex hull over EVERY quantized bbox
    corner: textbook Andrew chain on (x, y) tuples with exact integer
    cross products — no pruning, none of geo/hull.py's code — plus a
    plain-int shoelace.  Strict-turn convention (collinear edge points
    are not vertices), matching the engine's pinned contract."""
    from .sources import fixtures
    from .stages.footprint import quantize_rects
    p = fixtures.paths(sf_dir)
    df = pq.read_table(p["stac_items"],
                       columns=["collection_id", "bbox"]).to_pandas()
    rows = []
    for cid, g in df.groupby("collection_id", sort=True):
        r = quantize_rects(np.stack(g.bbox.to_numpy()))
        pts = set()
        for w, s, e, n in r.tolist():
            pts.update([(w, s), (e, s), (w, n), (e, n)])
        pts = sorted(pts)
        if len(pts) <= 2:
            hull = pts
        else:
            def half(seq):
                out = []
                for q in seq:
                    while len(out) >= 2:
                        a, b = out[-2], out[-1]
                        if ((b[0] - a[0]) * (q[1] - a[1])
                                - (b[1] - a[1]) * (q[0] - a[0])) <= 0:
                            out.pop()
                        else:
                            break
                    out.append(q)
                return out
            lo, hi = half(pts), half(pts[::-1])
            hull = lo[:-1] + hi[:-1]
            if len(hull) < 2:
                hull = [pts[0], pts[-1]]
        area2 = 0
        if len(hull) >= 3:
            for i in range(len(hull)):
                x1, y1 = hull[i]
                x2, y2 = hull[(i + 1) % len(hull)]
                area2 += x1 * y2 - x2 * y1
        rows.append((cid, len(hull), area2))
    return pa.table({
        "collection_id": pa.array([c for c, _, _ in rows], pa.string()),
        "hull_nv": pa.array([n for _, n, _ in rows], pa.int64()),
        "hull_area2": pa.array([a for _, _, a in rows], pa.int64())})


def golden_geo_polygonize(sf_dir: str) -> pa.Table:
    """Scalar raster->vector replay: burn every bbox into a DENSE 64x64
    grid cell-by-cell (plain loops — not the difference-array trick),
    then BFS flood-fill 4-connected regions; none of the engine's
    union-find or searchsorted code."""
    from collections import deque

    from .sources import fixtures
    p = fixtures.paths(sf_dir)
    df = pq.read_table(p["stac_items"], columns=["bbox"]).to_pandas()
    k = 64
    grid = [[0] * k for _ in range(k)]
    for bb in df.bbox:
        w, s, e, n = (float(v) for v in bb)
        if w > e or s > n:
            continue
        ix0 = min(int((w + 180.0) / 360.0 * k), k - 1)
        ix1 = min(int((e + 180.0) / 360.0 * k), k - 1)
        iy0 = min(int((s + 90.0) / 180.0 * k), k - 1)
        iy1 = min(int((n + 90.0) / 180.0 * k), k - 1)
        for i in range(ix0, ix1 + 1):
            for j in range(iy0, iy1 + 1):
                grid[i][j] += 1
    seen = [[False] * k for _ in range(k)]
    rows = []
    for i in range(k):
        for j in range(k):
            if grid[i][j] <= 0 or seen[i][j]:
                continue
            q, cells = deque([(i, j)]), []
            seen[i][j] = True
            while q:
                a, b = q.popleft()
                cells.append((a, b))
                for da, db in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    na, nb = a + da, b + db
                    if 0 <= na < k and 0 <= nb < k \
                            and grid[na][nb] > 0 and not seen[na][nb]:
                        seen[na][nb] = True
                        q.append((na, nb))
            rows.append((
                min(a * k + b for a, b in cells), len(cells),
                min(a for a, _ in cells), max(a for a, _ in cells),
                min(b for _, b in cells), max(b for _, b in cells),
                sum(grid[a][b] for a, b in cells)))
    rows.sort()
    cols = list(zip(*rows)) if rows else [[]] * 7
    names = ["region_id", "n_cells", "ix_min", "ix_max",
             "iy_min", "iy_max", "cover_sum"]
    return pa.table({nm: pa.array(list(c), pa.int64())
                     for nm, c in zip(names, cols)})


def golden_embedding_pq(sf_dir: str) -> pa.Table:
    """Single-process product-quantization replay (queries/embeddings
    embedding_pq spec: smallest-vec_id seeds, PQ_QUANT-quantized
    per-subspace centroid updates, shared distance reduction,
    lowest-code tie-break) — plain loops, none of the engine's
    partial-fold plumbing."""
    from .queries.embeddings import PQ_ITERS, PQ_K, PQ_M, PQ_QUANT
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    d = mat.shape[1]
    sub = d // PQ_M

    def assign_one(x, cents):
        best, bestd = 0, None
        for j, c in enumerate(cents):
            dd = ((x - c) ** 2).sum()
            if bestd is None or dd < bestd:
                best, bestd = j, dd
        return best

    codes = {}
    for m in range(PQ_M):
        xs = mat[:, m * sub:(m + 1) * sub]
        cents = [xs[j].copy() for j in range(PQ_K)]
        for _ in range(PQ_ITERS):
            members = {j: [] for j in range(PQ_K)}
            for i in range(len(ids)):
                members[assign_one(xs[i], cents)].append(i)
            for j in range(PQ_K):
                if members[j]:
                    s = np.zeros(sub)
                    for i in members[j]:
                        s = s + xs[i]
                    cents[j] = np.round(s / len(members[j]), PQ_QUANT)
        codes[m] = [assign_one(xs[i], cents) for i in range(len(ids))]
    cols = {"vec_id": pa.array(ids, pa.int64())}
    for m in range(PQ_M):
        cols[f"c{m}"] = pa.array(codes[m], pa.int64())
    return pa.table(cols)


def golden_geo_simplify(sf_dir: str) -> pa.Table:
    """Recursive scalar Douglas-Peucker replay over each user's
    ordered track (queries/events.geo_simplify_dp spec: exact int
    cross^2 vs eps^2*chord^2, split at max |cross| with smallest-index
    ties, degenerate-chord point-distance fallback) — plain recursion,
    none of geo/simplify.py's stack/vectorized code."""
    import sys

    from .queries.events import SIMPLIFY_EPS_U
    df = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"])
    eps2 = SIMPLIFY_EPS_U * SIMPLIFY_EPS_U
    rows = []
    sys.setrecursionlimit(200000)
    for uid, g in df.groupby("user_id", sort=True):
        eid = [int(v) for v in g.event_id]
        xs = [(e * 2654435761) % 3600000 * 100 - 180_000_000
              for e in eid]
        ys = [(e * 40503) % 1800000 * 100 - 90_000_000 for e in eid]
        n = len(eid)
        keep = [False] * n
        keep[0] = True
        keep[-1] = True

        def rec(i, j):
            if j <= i + 1:
                return
            dx, dy = xs[j] - xs[i], ys[j] - ys[i]
            best_k, best_val = -1, -1
            for k in range(i + 1, j):
                if dx == 0 and dy == 0:
                    v = (xs[k] - xs[i]) ** 2 + (ys[k] - ys[i]) ** 2
                else:
                    v = abs(dx * (ys[k] - ys[i]) - dy * (xs[k] - xs[i]))
                if v > best_val:
                    best_k, best_val = k, v
            split = (best_val > eps2) if (dx == 0 and dy == 0) else \
                (best_val ** 2 > eps2 * (dx * dx + dy * dy))
            if split:
                keep[best_k] = True
                rec(i, best_k)
                rec(best_k, j)

        rec(0, n - 1)
        rows.append((int(uid), n, sum(keep),
                     sum(e for e, k in zip(eid, keep) if k)))
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_points": pa.array([r[1] for r in rows], pa.int64()),
        "n_kept": pa.array([r[2] for r in rows], pa.int64()),
        "kept_eid_sum": pa.array([r[3] for r in rows], pa.int64())})


def golden_embedding_pca(sf_dir: str) -> pa.Table:
    """Scalar replay of queries/embeddings.embedding_pca: per-element
    half-away quantization to micro-units, Python-bigint moment
    accumulation row by row (upper triangle), the identical exact-int
    covariance formula, np.linalg.eigh (the documented shared library
    call on a bit-identical input), the same sign-pin + component
    quantization, and per-row Python-int projections.  Every output
    is an exact integer, so the comparison is hash-exact."""
    import math

    from .queries.embeddings import PCA_NCOMP, PCA_SCALE
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    vecs = t["embedding"].to_pylist()

    def q(x: float) -> int:
        if x == 0.0:
            return 0
        s_ = 1.0 if x > 0 else -1.0
        return int(s_ * math.floor(abs(x) * PCA_SCALE + 0.5))

    xi = [[q(float(x)) for x in row] for row in vecs]
    n = len(xi)
    d = len(xi[0])
    S = [0] * d
    G = [[0] * d for _ in range(d)]
    for row in xi:
        for a in range(d):
            S[a] += row[a]
            ra = row[a]
            Ga = G[a]
            for b in range(a, d):
                Ga[b] += ra * row[b]
    for a in range(d):
        for b in range(a):
            G[a][b] = G[b][a]
    C = np.empty((d, d), dtype=np.float64)
    denom = float(n) * float(n) * float(PCA_SCALE) ** 2
    for a in range(d):
        for b in range(d):
            C[a, b] = float(n * G[a][b] - S[a] * S[b]) / denom
    w, v = np.linalg.eigh(C)
    comps = []
    for k in range(1, PCA_NCOMP + 1):
        vec = [float(x) for x in v[:, -k]]
        top = max(range(d), key=lambda i: (abs(vec[i]), -i))
        if vec[top] < 0:
            vec = [-x for x in vec]
        comps.append([q(x) for x in vec])
    p1 = [sum(r[a] * comps[0][a] for a in range(d)) for r in xi]
    p2 = [sum(r[a] * comps[1][a] for a in range(d)) for r in xi]
    return pa.table({
        "vec_id": pa.array([int(i) for i in ids], pa.int64()),
        "p1": pa.array(p1, pa.int64()),
        "p2": pa.array(p2, pa.int64())})


def golden_geo_dbscan(sf_dir: str) -> pa.Table:
    """Independent DBSCAN replay (queries/geo.geo_dbscan semantics:
    closed integer eps-neighborhood on doubled-micro-degree centroids,
    core = count incl self >= min_pts, cluster = min core pid of the
    eps-component, border = min core neighbor's label, noise -1).
    Neighbor search is a PLANE SWEEP (sort by x, windowed scan) — no
    grid, no cells, no buckets — plus a scalar union-find."""
    import math

    from .queries.geo import DBSCAN_EPS_U, DBSCAN_MIN_PTS
    from .sources import fixtures
    fx = fixtures.paths(sf_dir)
    t = pq.read_table(fx["stac_items"], columns=["image_id", "bbox"])
    pid = np.array([int(s[4:]) for s in t["image_id"].to_pylist()],
                   dtype=np.int64)
    bb = np.stack(t["bbox"].to_numpy(zero_copy_only=False))
    q = np.floor(bb * 1_000_000 + 0.5).astype(np.int64)
    px = q[:, 0] + q[:, 2]
    py = q[:, 1] + q[:, 3]
    n = len(pid)
    order = np.argsort(px, kind="stable")
    px_s, py_s, pid_s = px[order], py[order], pid[order]
    eps = np.int64(DBSCAN_EPS_U)
    eps2 = int(eps) * int(eps)
    nbrs = [[] for _ in range(n)]          # indices into the SORTED arrays
    lo = 0
    for i in range(n):
        while px_s[i] - px_s[lo] > eps:
            lo += 1
        w = slice(lo, i)
        dx = px_s[w] - px_s[i]
        dy = py_s[w] - py_s[i]
        hits = np.flatnonzero(dx * dx + dy * dy <= eps2) + lo
        for j in hits:
            nbrs[i].append(int(j))
            nbrs[int(j)].append(i)
    count = np.array([len(v) + 1 for v in nbrs])      # self included
    is_core = count >= DBSCAN_MIN_PTS
    # scalar union-find over core-core eps edges
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for i in range(n):
        if not is_core[i]:
            continue
        for j in nbrs[i]:
            if j > i or not is_core[j]:
                continue
            a, b = find(int(pid_s[i])), find(int(pid_s[j]))
            if a != b:
                lo_, hi_ = (a, b) if a < b else (b, a)
                parent[hi_] = lo_
    role = []
    label = []
    for i in range(n):
        if is_core[i]:
            role.append("core")
            label.append(find(int(pid_s[i])))
        else:
            cl = [find(int(pid_s[j])) for j in nbrs[i] if is_core[j]]
            if cl:
                role.append("border")
                label.append(min(cl))
            else:
                role.append("noise")
                label.append(-1)
    return pa.table({
        "pid": pa.array([int(v) for v in pid_s], pa.int64()),
        "role": pa.array(role, pa.string()),
        "cluster": pa.array(label, pa.int64())})


def golden_video_scene_cuts(sf_dir: str) -> pa.Table:
    """Scalar replay of video_scene_cuts DETECTION: same planted-scene
    GVID construction (queries/media._scene_videos — the fixture spec,
    shared by declaration), then per-frame SCALAR fi.phash + Python-int
    popcount cut decisions — independent of the batched _PhashAccum
    path and the keyed_boundary_decompose kernel."""
    from .codecs import fakeimg as fi
    from .queries.media import SCENE_CUT_HAMMING, _scene_videos
    from .stages.multimodal import decode_video
    M = (1 << 64) - 1
    rows = []
    for item in _scene_videos(sf_dir):
        phs, idxs = [], []
        for idx, arr in decode_video(item["bytes"], 1):
            phs.append(fi.phash(arr))
            idxs.append(idx)
        cuts = []
        for k in range(1, len(phs)):
            x = (phs[k] & M) ^ (phs[k - 1] & M)
            if bin(x).count("1") >= SCENE_CUT_HAMMING:
                cuts.append(idxs[k])
        rows.append((item["video_id"], len(phs), len(cuts), sum(cuts)))
    return pa.table({
        "video_id": pa.array([r[0] for r in rows], pa.string()),
        "n_frames": pa.array([r[1] for r in rows], pa.int64()),
        "n_cuts": pa.array([r[2] for r in rows], pa.int64()),
        "cut_idx_sum": pa.array([r[3] for r in rows], pa.int64())})




def golden_audio_segments(sf_dir: str) -> pa.Table:
    """Scalar state-machine replay of audio_segments: same planted
    clips (queries/media._activity_clips — shared construction spec),
    then per-frame SCALAR Python-int energy + an explicit run/merge/
    drop state machine — independent of the vectorized mask-diff path
    in stages/multimodal.AudioSegmenter."""
    from .queries.media import (AUD_FRAME, AUD_MIN_GAP, AUD_MIN_LEN,
                                AUD_THR, _activity_clips)
    from .stages.multimodal import decode_audio
    rows = []
    for item in _activity_clips(sf_dir):
        _, pcm = decode_audio(item["bytes"])
        nf = len(pcm) // AUD_FRAME
        energy = []
        for f in range(nf):
            e = 0
            for v in pcm[f * AUD_FRAME:(f + 1) * AUD_FRAME]:
                e += int(v) * int(v)
            energy.append(e)
        runs = []                          # [start, end) active runs
        cur = None
        for f in range(nf):
            if energy[f] >= AUD_THR:
                if cur is None:
                    cur = f
            else:
                if cur is not None:
                    runs.append([cur, f])
                    cur = None
        if cur is not None:
            runs.append([cur, nf])
        merged = []
        for r in runs:
            if merged and r[0] - merged[-1][1] < AUD_MIN_GAP:
                merged[-1][1] = r[1]
            else:
                merged.append(r)
        seg = 0
        for a, b in merged:
            if b - a < AUD_MIN_LEN:
                continue
            rows.append((item["clip_id"], seg, a, b, b - a,
                         sum(energy[a:b])))
            seg += 1
    return pa.table({
        "clip_id": pa.array([r[0] for r in rows], pa.string()),
        "seg": pa.array([r[1] for r in rows], pa.int64()),
        "start_frame": pa.array([r[2] for r in rows], pa.int64()),
        "end_frame": pa.array([r[3] for r in rows], pa.int64()),
        "n_frames": pa.array([r[4] for r in rows], pa.int64()),
        "energy_sum": pa.array([r[5] for r in rows], pa.int64())})




def golden_graph_kcore(sf_dir: str) -> pa.Table:
    """Exact Batagelj-Zaveršnik peel for graph_kcore: build the
    co-purchase edge set with pandas, then repeatedly remove the
    minimum-degree node, recording its coreness — independent of the
    engine's distributed h-index fixpoint."""
    import heapq

    import pandas as pd
    li = pd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_partkey"]) \
        .drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    m = m[m.l_partkey_x < m.l_partkey_y]
    e = m[["l_partkey_x", "l_partkey_y"]].drop_duplicates().to_numpy()
    adj = {}
    for a, b in e:
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    deg = {n: len(s) for n, s in adj.items()}
    heap = [(d, n) for n, d in deg.items()]
    heapq.heapify(heap)
    core = {}
    kmax = 0
    removed = set()
    while heap:
        d, n = heapq.heappop(heap)
        if n in removed or d != deg[n]:
            continue                      # stale heap entry
        kmax = max(kmax, deg[n])
        core[n] = kmax
        removed.add(n)
        for nb in adj[n]:
            if nb not in removed:
                deg[nb] -= 1
                heapq.heappush(heap, (deg[nb], nb))
    items = sorted(core.items())
    return pa.table({
        "node": pa.array([k for k, _ in items], pa.int64()),
        "coreness": pa.array([v for _, v in items], pa.int64())})




def golden_knn_graph_ivf(sf_dir: str) -> pa.Table:
    """Scalar replay of embedding_knn_graph_ivf's ALGORITHM (fit ->
    assign -> probe -> in-bucket quantized top-k -> merge), independent
    of the engine's shuffle/groupby path.  The centroid fit is the
    shared deterministic spec (content-keyed sorted sample through
    IVFIndex.fit_centroids — identical reconstruction, the ann_ivf
    convention); everything downstream is replayed with plain numpy
    per-row loops."""
    from .queries.embeddings import (IVFG_N_PROBE, IVFG_NODE_MOD,
                                     KNN_GRAPH_K, KNN_GRAPH_SCALE,
                                     _half_away_int, _ivfg_params)
    from .stages.ann import IVFIndex, _normalize
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    n_total = len(ids)
    # shared-spec centroid fit: strided content-keyed sample, sorted
    step = max(1, n_total // 2000)
    sel = np.flatnonzero(ids % step == 0)
    order = np.argsort(ids[sel])
    sample = _normalize(mat[sel[order]].copy())
    cents = IVFIndex.fit_centroids(sample,
                                   n_centroids=_ivfg_params(n_total))
    unit = _normalize(mat.copy())
    dots_c = unit @ cents.T
    assign = np.argmax(dots_c, axis=1)
    buckets = {}
    for i, b in enumerate(assign):
        buckets.setdefault(int(b), []).append(i)
    q = _half_away_int(mat, KNN_GRAPH_SCALE)
    rows = []
    for i in np.flatnonzero(ids % IVFG_NODE_MOD == 0):
        probes = np.argsort(-dots_c[i], kind="stable")[:IVFG_N_PROBE]
        cand = []
        for b in probes:
            for j in buckets.get(int(b), []):
                if ids[j] == ids[i]:
                    continue
                d = int(np.dot(q[i], q[j]))
                cand.append((-d, int(ids[j])))
        cand.sort()
        for rank, (nd, vid) in enumerate(cand[:KNN_GRAPH_K], start=1):
            rows.append((int(ids[i]), vid, -nd, rank))
    rows.sort()
    return pa.table({
        "src": pa.array([r[0] for r in rows], pa.int64()),
        "dst": pa.array([r[1] for r in rows], pa.int64()),
        "dot_q": pa.array([r[2] for r in rows], pa.int64()),
        "rank": pa.array([r[3] for r in rows], pa.int64())})




def golden_doc_compress_ratio(sf_dir: str) -> pa.Table:
    """Scalar per-document replay of doc_compress_ratio: same zlib
    level-6 kernel (shared by necessity), independent dict-accumulator
    aggregation and the same integer half-away fixed point."""
    import zlib

    from .queries.docs import CR_REP_FP
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["lang", "text"])
    acc = {}
    for lang, text in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
        if not isinstance(text, str) or not text:
            continue
        raw = text.encode("utf-8")
        num = len(zlib.compress(raw, 6)) * 1_000_000
        fp = (2 * num + len(raw)) // (2 * len(raw))
        r = acc.setdefault(lang, [0, 0, 0])
        r[0] += 1
        r[1] += fp
        r[2] += 1 if fp < CR_REP_FP else 0
    items = sorted(acc.items())
    return pa.table({
        "lang": pa.array([k for k, _ in items], pa.string()),
        "n_docs": pa.array([v[0] for _, v in items], pa.int64()),
        "sum_ratio_fp": pa.array([v[1] for _, v in items], pa.int64()),
        "n_repetitive": pa.array([v[2] for _, v in items], pa.int64())})




def golden_image_quality(sf_dir: str) -> pa.Table:
    """Per-pixel scalar replay of image_quality: plain Python loops
    over every interior pixel's 4-neighbour Laplacian and every
    pixel's grayscale value — independent of the engine's shifted-add
    vectorization."""
    import glob as _glob

    from .codecs import fakeimg as fi
    from .queries.media import IQ_N_IMAGES
    from .sources.fixtures import paths as _paths
    p = _paths(sf_dir)
    shard0 = sorted(_glob.glob(os.path.join(p["images"], "*.parquet")))[0]
    t = pq.read_table(shard0, columns=["image_id", "bytes"]) \
        .slice(0, IQ_N_IMAGES)
    rows = []
    for iid, buf in zip(t["image_id"].to_pylist(),
                        t["bytes"].to_pylist()):
        arr = fi.decode(buf)
        h, w, _ = arr.shape
        g = [[(int(arr[i, j, 0]) + int(arr[i, j, 1])
               + int(arr[i, j, 2])) // 3 for j in range(w)]
             for i in range(h)]
        s = 0
        for i in range(1, h - 1):
            for j in range(1, w - 1):
                v = (g[i - 1][j] + g[i + 1][j] + g[i][j - 1]
                     + g[i][j + 1] - 4 * g[i][j])
                s += v * v
        sx = sum(sum(r) for r in g)
        sxx = sum(v * v for r in g for v in r)
        n = h * w
        rows.append((iid, w, h, s, n * sxx - sx * sx, n))
    return pa.table({
        "image_id": pa.array([r[0] for r in rows], pa.string()),
        "w": pa.array([r[1] for r in rows], pa.int64()),
        "h": pa.array([r[2] for r in rows], pa.int64()),
        "sharp_num": pa.array([r[3] for r in rows], pa.int64()),
        "contrast_num": pa.array([r[4] for r in rows], pa.int64()),
        "n_pix": pa.array([r[5] for r in rows], pa.int64())})


GOLDENS = {
    "simhash_docs": golden_simhash,
    "doc_quality": golden_doc_quality,
    "doc_fingerprints": golden_fingerprints,
    "langid_accuracy": golden_langid,
    "geo_cells": golden_geo_cells,
    "geo_s2_covering": golden_s2_covering,
    "decode_stats": golden_decode_stats,
    "geocore_assemble": golden_geocore_assemble,
    "tile_phash_stats": golden_tile_phash_stats,
    "tile_topk_phash": golden_tile_topk_phash,
    "video_frame_sample": golden_video_frames,
    "audio_features": golden_audio_features,
    "harvest_manifests": golden_harvest_manifests,
    "embedding_neardup_lsh": golden_embedding_neardup,
    "ann_ivf": golden_ann_ivf,
    "kmeans_embeddings": golden_kmeans,
    "image_thumbnails": golden_thumbnails,
    "geo_union_area": golden_geo_union_area,
    "geo_convex_hull": golden_geo_convex_hull,
    "geo_polygonize": golden_geo_polygonize,
    "embedding_pq": golden_embedding_pq,
    "geo_simplify_dp": golden_geo_simplify,
    "embedding_pca": golden_embedding_pca,
    "geo_dbscan": golden_geo_dbscan,
    "video_scene_cuts": golden_video_scene_cuts,
    "audio_segments": golden_audio_segments,
    "graph_kcore": golden_graph_kcore,
    "embedding_knn_graph_ivf": golden_knn_graph_ivf,
    "doc_compress_ratio": golden_doc_compress_ratio,
    "image_quality": golden_image_quality,
}


def golden_path(name: str, sf_dir: str) -> str:
    from .sources.fixtures import FIXTURE_VERSION
    sf = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(GOLDEN_ROOT,
                        f"{sf}-v{FIXTURE_VERSION}.{GOLDEN_VERSION}",
                        f"{name}.parquet")


def ensure_goldens(sf_dir: str) -> dict[str, str]:
    """Generate any missing golden parquet files; return name -> path."""
    out = {}
    for name, fn in GOLDENS.items():
        path = golden_path(name, sf_dir)
        if not os.path.exists(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            pq.write_table(fn(sf_dir), tmp)
            os.replace(tmp, path)
        out[name] = path
    return out


def golden_sql(name: str, sf_dir: str) -> str:
    return f"SELECT * FROM read_parquet('{golden_path(name, sf_dir)}')"
