"""Image decode + raster->vector tile assignment (actor-pool stage).

The north-star tiler: decode each record's binary image, split the
pixel grid into T x T tiles, map every tile's pixel-center back
through the record's footprint bbox to lon/lat, and assign it a hex
cell — emitting one row per tile (a flat-map).  Decoded pixels NEVER
cross a stage boundary: each output row carries only tile metadata and
small per-tile statistics (mean intensity, per-tile pHash), so the
downstream groupby-on-cell shuffle moves kilobytes, not pixels
(SURVEY.md §7.4 wide-binary-rows rule).

Per-tile work is fully vectorized (round-2 rewrite; the round-1
per-tile Python loop was 90% of the headline bench):

- per-image tile means come from one zero-padded reshape-sum over the
  grayscale plane (no per-tile slicing);
- tile geometry (tile_x/y/w/h, lon/lat centers) is numpy grid math;
- per-tile pHashes are computed by stacking equal-shape tiles ACROSS
  the whole batch (tile sizes collapse to at most 4 shapes: full TxT,
  right-column, bottom-row, corner) and running one batched DCT
  matmul chain per shape (`fakeimg.phash_batch`), flushed in bounded
  chunks so actor heap stays ~tile_chunk x T^2 x 8 bytes;
- string/passthrough columns are Arrow `take` with a repeat index —
  no Python-object round trip.

Decode is the GIMG stand-in codec (PIL absent here — see
codecs/fakeimg.py for where a real decoder plugs in).  Decoding is
stateful-cheap but the DCT matrix + config live in ``__init__`` so
the class runs as an actor pool with ``batch_size`` tuned to pixel
payload (batch_size x max_decoded_bytes bounds heap use).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codecs import fakeimg as fi
from ..geo import hexgrid

TILE = 64


class _PhashAccum:
    """Accumulates equal-shape grayscale tile stacks across images and
    scatters batched pHashes into a flat output array, flushing per
    shape once `chunk` tiles are pending (bounds actor heap)."""

    def __init__(self, chunk: int = 4096):
        self.chunk = chunk
        self.stacks: dict[tuple[int, int], list[np.ndarray]] = {}
        self.pos: dict[tuple[int, int], list[np.ndarray]] = {}
        self.pending: dict[tuple[int, int], int] = {}
        self.done: list[tuple[np.ndarray, np.ndarray]] = []   # (positions, hashes)

    def add(self, shape: tuple[int, int], tiles: np.ndarray,
            positions: np.ndarray) -> None:
        if len(positions) == 0:
            return
        self.stacks.setdefault(shape, []).append(tiles)
        self.pos.setdefault(shape, []).append(positions)
        self.pending[shape] = self.pending.get(shape, 0) + len(positions)
        if self.pending[shape] >= self.chunk:
            self._flush(shape)

    def _flush(self, shape: tuple[int, int]) -> None:
        tiles = np.concatenate(self.stacks.pop(shape))
        positions = np.concatenate(self.pos.pop(shape))
        self.pending[shape] = 0
        self.done.append((positions, fi.phash_batch(tiles)))

    def finish(self, total: int) -> np.ndarray:
        for shape in list(self.stacks):
            self._flush(shape)
        out = np.empty(total, dtype=np.int64)
        for positions, hashes in self.done:
            out[positions] = hashes
        return out


class Tiler:
    """``map_batches`` callable: images+bbox rows -> per-tile rows."""

    def __init__(self, tile: int = TILE, hex_res: int = 9,
                 prefix_res: int = 4, with_phash: bool = True,
                 passthrough: tuple[str, ...] = (),
                 phash_chunk: int = 1024, on_error: str = "raise"):
        """``on_error``: "raise" fails the partition on the first bad
        record (round-2 behavior); "quarantine" skips undecodable
        records, collecting (image_id, error) dead-letter rows
        retrievable via ``take_quarantine()`` — at 1e12 rows poison
        records are a certainty and "re-run the partition forever" is
        not a policy (improves on the reference's SILENT skip at
        s3_operations.py:110-112: every drop is counted + persisted)."""
        if on_error not in ("raise", "quarantine"):
            raise ValueError(f"on_error={on_error!r}")
        self.tile = tile
        self.hex_res = hex_res
        self.prefix_res = prefix_res
        self.with_phash = with_phash
        self.passthrough = passthrough       # input cols copied onto each tile row
        self.phash_chunk = phash_chunk
        self.on_error = on_error
        self._dead: list[tuple[str, str]] = []
        fi._dct_matrix()                     # warm the DCT table once per actor

    def take_quarantine(self) -> pa.Table:
        """Dead-letter rows accumulated since the last call (clears)."""
        rows, self._dead = self._dead, []
        return pa.table({
            "image_id": pa.array([r[0] for r in rows], pa.string()),
            "error": pa.array([r[1] for r in rows], pa.string())})

    def _grids(self, batch: pa.Table):
        """Decode headers only: per-image (w, h) -> tile-grid layout."""
        bufs = batch["bytes"].to_pylist()
        if "bbox" in batch.column_names:
            bbs = np.asarray(batch["bbox"].to_pylist(), dtype=np.float64)
        else:                                 # post-join scalar bbox columns
            bbs = np.column_stack([
                batch[c].to_numpy(zero_copy_only=False)
                for c in ("bw", "bs", "be", "bn")]).astype(np.float64)
        return bufs, bbs

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.tile
        bufs, bbs = self._grids(batch)
        n_img = len(bufs)

        # single pass: decode + per-image vectorized tile stats + pHash
        # accumulation; each image's pixels are released as soon as its
        # tiles are stacked (no whole-batch pixel retention)
        cols = {k: [] for k in ("tile_x", "tile_y", "tile_w", "tile_h",
                                "lon", "lat", "mean")}
        counts = np.empty(n_img, dtype=np.int64)
        acc = _PhashAccum(self.phash_chunk) if self.with_phash else None
        total = 0
        for i, buf in enumerate(bufs):
            try:
                arr = fi.decode_any(buf)
            except Exception as exc:
                if self.on_error != "quarantine":
                    raise
                counts[i] = 0                 # poison record: no tiles
                self._dead.append((str(batch["image_id"][i]),
                                   f"{type(exc).__name__}: {exc}"))
                continue
            h, w = arr.shape[0], arr.shape[1]
            ntx = (w + t - 1) // t
            nty = (h + t - 1) // t
            n = ntx * nty
            counts[i] = n
            off = total
            total += n
            # channel-sum plane: slice-add integer sum (SIMD-friendly;
            # ~9x faster than an axis reduce).  The float gray plane is
            # only materialized when pHash needs it — the stats-only
            # path keeps tile sums EXACT in integers (sum <= 765*4096
            # per tile) and divides once per tile, not per pixel.
            if arr.ndim == 3 and arr.shape[2] == 3:
                chansum = (arr[:, :, 0].astype(np.uint16) + arr[:, :, 1]
                           + arr[:, :, 2])
                n_chan = 3
            elif arr.ndim == 3:
                chansum = arr.sum(axis=2, dtype=np.uint32)
                n_chan = arr.shape[2]
            else:
                chansum = arr.astype(np.uint16)
                n_chan = 1
            # bit-identical to mean(axis=2): uint8 sums are exact in
            # both the integer plane and float64
            gray = chansum / np.float64(n_chan) if acc is not None else None

            tx = np.tile(np.arange(ntx, dtype=np.int32), nty)
            ty = np.repeat(np.arange(nty, dtype=np.int32), ntx)
            tw1 = np.full(ntx, t, dtype=np.int32); tw1[-1] = w - (ntx - 1) * t
            th1 = np.full(nty, t, dtype=np.int32); th1[-1] = h - (nty - 1) * t
            tw = np.tile(tw1, nty)
            th = np.repeat(th1, ntx)
            bw, bs, be, bn = bbs[i]
            cx = (tx * t + tw / 2.0) / w
            cy = (ty * t + th / 2.0) / h
            cols["tile_x"].append(tx); cols["tile_y"].append(ty)
            cols["tile_w"].append(tw); cols["tile_h"].append(th)
            cols["lon"].append(bw + cx * (be - bw))
            cols["lat"].append(bn - cy * (bn - bs))

            # per-tile means: zero-pad the INTEGER plane to the grid,
            # one exact reshape-sum, one divide per tile
            G = np.zeros((nty * t, ntx * t), dtype=chansum.dtype)
            G[:h, :w] = chansum
            sums = G.reshape(nty, t, ntx, t).sum(axis=(1, 3), dtype=np.int64)
            area = th1[:, None].astype(np.float64) * tw1[None, :] * n_chan
            cols["mean"].append((sums / area).ravel())

            if acc is not None:               # shape-grouped pHash stacks
                twl = w - (ntx - 1) * t       # last-column width (== t if exact)
                thl = h - (nty - 1) * t
                ntx_f = ntx - 1 if twl < t else ntx
                nty_f = nty - 1 if thl < t else nty
                if ntx_f and nty_f:           # full TxT tiles, one copy
                    full = np.ascontiguousarray(
                        gray[:nty_f * t, :ntx_f * t]
                        .reshape(nty_f, t, ntx_f, t).transpose(0, 2, 1, 3)) \
                        .reshape(nty_f * ntx_f, t, t)
                    p = (off + np.arange(nty_f)[:, None] * ntx
                         + np.arange(ntx_f)[None, :]).ravel()
                    acc.add((t, t), full, p)
                if twl < t and nty_f:         # right column
                    col = gray[:nty_f * t, ntx_f * t:] \
                        .reshape(nty_f, t, twl).copy()
                    acc.add((t, twl), col,
                            off + np.arange(nty_f) * ntx + (ntx - 1))
                if thl < t and ntx_f:         # bottom row
                    row = np.ascontiguousarray(
                        gray[nty_f * t:, :ntx_f * t]
                        .reshape(thl, ntx_f, t).transpose(1, 0, 2))
                    acc.add((thl, t), row,
                            off + (nty - 1) * ntx + np.arange(ntx_f))
                if twl < t and thl < t:       # corner
                    acc.add((thl, twl),
                            gray[nty_f * t:, ntx_f * t:].copy()[None, :, :],
                            np.array([off + nty * ntx - 1]))

        if acc is not None:
            phashes = acc.finish(total)

        lon = np.concatenate(cols["lon"]) if cols["lon"] else np.empty(0)
        lat = np.concatenate(cols["lat"]) if cols["lat"] else np.empty(0)
        cells = hexgrid.latlng_to_cell(lat, lon, self.hex_res)
        prefix = hexgrid.latlng_to_cell(lat, lon, self.prefix_res)
        rep = pa.array(np.repeat(np.arange(n_img, dtype=np.int64), counts))
        cat = (lambda xs, dt: pa.array(np.concatenate(xs).astype(dt))
               if xs else pa.array([], pa.from_numpy_dtype(dt)))
        tbl = {
            "image_id": pc.take(batch["image_id"], rep),
            "tile_x": cat(cols["tile_x"], np.int32),
            "tile_y": cat(cols["tile_y"], np.int32),
            "tile_w": cat(cols["tile_w"], np.int32),
            "tile_h": cat(cols["tile_h"], np.int32),
            "lon": pa.array(lon), "lat": pa.array(lat),
            "mean_intensity": cat(cols["mean"], np.float64),
            "hex_cell": pa.array(cells), "hex_prefix": pa.array(prefix),
        }
        if self.with_phash:
            tbl["tile_phash"] = pa.array(phashes)
        for c in self.passthrough:
            tbl[c] = pc.take(batch[c], rep)
        return pa.table(tbl)


class ImageResizer:
    """Actor-pool thumbnailing stage: (image_id, bytes) -> (image_id,
    bytes[thumb], w, h) with the decoded image block-mean-resized to
    ``size`` x ``size`` and re-encoded (fakeimg.resize_block_mean;
    a real deployment swaps codec + interpolation behind decode_any).

    Decoded pixels stay inside the stage (only the small re-encoded
    thumbnail crosses the boundary — the wide-binary-rows rule), and
    ``on_error="quarantine"`` applies the standard poison-record
    policy."""

    def __init__(self, size: int = 32, fmt: str = "png",
                 on_error: str = "raise"):
        if on_error not in ("raise", "quarantine"):
            raise ValueError(f"on_error={on_error!r}")
        self.size = size
        self.fmt = fmt
        self.on_error = on_error
        self._dead: list[tuple[str, str]] = []

    def take_quarantine(self) -> pa.Table:
        rows, self._dead = self._dead, []
        return pa.table({
            "image_id": pa.array([r[0] for r in rows], pa.string()),
            "error": pa.array([r[1] for r in rows], pa.string())})

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        bufs = batch["bytes"].to_pylist()
        o_id, o_buf, o_w, o_h = [], [], [], []
        for iid, buf in zip(ids, bufs):
            try:
                arr = fi.decode_any(buf)
                thumb = fi.resize_block_mean(arr, self.size)
            except Exception as exc:
                if self.on_error != "quarantine":
                    raise
                self._dead.append((iid, f"{type(exc).__name__}: {exc}"))
                continue
            o_id.append(iid)
            o_buf.append(fi.encode(thumb, self.fmt))
            o_w.append(arr.shape[1])
            o_h.append(arr.shape[0])
        return pa.table({
            "image_id": pa.array(o_id, pa.string()),
            "bytes": pa.array(o_buf, pa.binary()),
            "src_w": pa.array(o_w, pa.int32()),
            "src_h": pa.array(o_h, pa.int32())})


class DecodeVerifier:
    """Decode invariants stage (BASELINE.json input_hint checks).

    Appends: decode_ok, psnr (inf for lossless), phash_match (recomputed
    pHash equals the table's phash column), mean_pixel.
    """

    def __init__(self, psnr_floor: float = 40.0):
        self.psnr_floor = psnr_floor
        fi._dct_matrix()

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch["bytes"].to_pylist()
        phashes = batch["phash"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ok, psnrs, match, means = [], [], [], []
        for buf, ph, fmt in zip(bufs, phashes, fmts):
            try:
                arr = fi.decode_any(buf)
            except Exception:
                ok.append(False); psnrs.append(0.0); match.append(False)
                means.append(0.0)
                continue
            ok.append(True)
            means.append(float(arr.mean()))
            # GIMG round-trip is analytic: lossless is byte-exact
            # (psnr inf); lossy re-encode quantizes to (x >> 1) << 1,
            # so PSNR computes directly without a zlib round trip
            if fmt == "png":
                psnrs.append(float("inf"))
            else:
                quant = (arr >> 1) << 1
                psnrs.append(fi.psnr(arr, quant))
            match.append(fi.phash(arr) == ph)
        out = batch.append_column("decode_ok", pa.array(ok))
        out = out.append_column("psnr", pa.array(psnrs, pa.float64()))
        out = out.append_column("phash_match", pa.array(match))
        return out.append_column("mean_pixel", pa.array(means, pa.float64()))
