"""Image decode + raster->vector tile assignment (actor-pool stage).

The north-star tiler: decode each record's binary image, split the
pixel grid into T x T tiles, map every tile's pixel-center back
through the record's footprint bbox to lon/lat, and assign it a hex
cell — emitting one row per tile (a flat-map).  Decoded pixels NEVER
cross a stage boundary: each output row carries only tile metadata and
small per-tile statistics (mean intensity, per-tile pHash), so the
downstream groupby-on-cell shuffle moves kilobytes, not pixels
(SURVEY.md §7.4 wide-binary-rows rule).

Decode is the GIMG stand-in codec (PIL absent here — see
codecs/fakeimg.py for where a real decoder plugs in).  Decoding is
stateful-cheap but the DCT matrix + config live in ``__init__`` so
the class runs as an actor pool with ``batch_size`` tuned to pixel
payload (batch_size x max_decoded_bytes bounds heap use).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import fakeimg as fi
from ..geo import hexgrid

TILE = 64


class Tiler:
    """``map_batches`` callable: images+bbox rows -> per-tile rows."""

    def __init__(self, tile: int = TILE, hex_res: int = 9,
                 prefix_res: int = 4, with_phash: bool = True,
                 passthrough: tuple[str, ...] = ()):
        self.tile = tile
        self.hex_res = hex_res
        self.prefix_res = prefix_res
        self.with_phash = with_phash
        self.passthrough = passthrough       # input cols copied onto each tile row
        fi._dct_matrix()                     # warm the DCT table once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.tile
        ids = batch["image_id"].to_pylist()
        bufs = batch["bytes"].to_pylist()
        if "bbox" in batch.column_names:
            bbs = batch["bbox"].to_pylist()
        else:                                 # post-join scalar bbox columns
            bbs = list(zip(batch["bw"].to_pylist(), batch["bs"].to_pylist(),
                           batch["be"].to_pylist(), batch["bn"].to_pylist()))
        out = {k: [] for k in ("image_id", "tile_x", "tile_y", "tile_w", "tile_h",
                               "lon", "lat", "mean_intensity")}
        if self.with_phash:
            out["tile_phash"] = []
        pass_in = {c: batch[c].to_pylist() for c in self.passthrough}
        pass_out: dict[str, list] = {c: [] for c in self.passthrough}
        row_no = -1
        for rid, buf, bb in zip(ids, bufs, bbs):
            row_no += 1
            arr = fi.decode(buf)
            h, w = arr.shape[0], arr.shape[1]
            ntx = (w + t - 1) // t
            nty = (h + t - 1) // t
            bw, bs, be, bn = bb
            for ty in range(nty):
                for tx in range(ntx):
                    px0, py0 = tx * t, ty * t
                    tile = arr[py0:py0 + t, px0:px0 + t]
                    # tile center in pixel space -> lon/lat via bbox;
                    # row 0 is the image top = bbox north
                    cx_pix = (px0 + tile.shape[1] / 2.0) / w
                    cy_pix = (py0 + tile.shape[0] / 2.0) / h
                    lon = bw + cx_pix * (be - bw)
                    lat = bn - cy_pix * (bn - bs)
                    out["image_id"].append(rid)
                    out["tile_x"].append(tx)
                    out["tile_y"].append(ty)
                    out["tile_w"].append(tile.shape[1])
                    out["tile_h"].append(tile.shape[0])
                    out["lon"].append(lon)
                    out["lat"].append(lat)
                    out["mean_intensity"].append(float(tile.mean()))
                    if self.with_phash:
                        out["tile_phash"].append(fi.phash(tile))
                    for c in self.passthrough:
                        pass_out[c].append(pass_in[c][row_no])
        lon = np.asarray(out["lon"], dtype=np.float64)
        lat = np.asarray(out["lat"], dtype=np.float64)
        cells = hexgrid.latlng_to_cell(lat, lon, self.hex_res)
        prefix = hexgrid.latlng_to_cell(lat, lon, self.prefix_res)
        tbl = {
            "image_id": pa.array(out["image_id"], pa.string()),
            "tile_x": pa.array(out["tile_x"], pa.int32()),
            "tile_y": pa.array(out["tile_y"], pa.int32()),
            "tile_w": pa.array(out["tile_w"], pa.int32()),
            "tile_h": pa.array(out["tile_h"], pa.int32()),
            "lon": pa.array(lon), "lat": pa.array(lat),
            "mean_intensity": pa.array(out["mean_intensity"], pa.float64()),
            "hex_cell": pa.array(cells), "hex_prefix": pa.array(prefix),
        }
        if self.with_phash:
            tbl["tile_phash"] = pa.array(out["tile_phash"], pa.int64())
        for c in self.passthrough:
            tbl[c] = pa.array(pass_out[c])
        return pa.table(tbl)


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
                arr = fi.decode(buf)
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
