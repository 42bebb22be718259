"""Deterministic synthetic geospatial fixtures (FIXTURES.md §1-§4).

Generates the canonical ``images`` table (the exact BASELINE.json
``input_hint`` schema: image_id, bytes, w, h, fmt, caption, phash),
the STAC-style ``stac_items`` footprint sidecar, the small
``collections`` polygon catalog, and the single-row ``catalog_root``
— all keyed ONLY by stable sha256-derived hashes of the row ids
(seed-free, process-stable; FIXTURES.md preamble).

Scale: ``n_images = round(1_000_000 * sf)`` so sf0.001 -> 1k rows,
sf0.01 -> 10k, sf0.1 -> 100k (t1/t2/bench tiers).  Output is cached
as parquet under /tmp/stgr_fixtures/<sfname>/ with a _COMPLETE marker;
generation is chunked so memory stays flat at any scale.  Lance is not
installed in this container, so parquet stands in for the Lance table
(same Arrow schema; a real deployment would ``lance.write_dataset``
the identical batches).

Planted rows (fixed indices, FIXTURES.md §1-§2):
- i % 97 == 0 (i>0): exact duplicate of row i-1 (same pixels + phash)
- i % 101 == 0 (i>0): near-duplicate of row i-1 (phash XOR 1)
- i % 997 == 900: degenerate bbox (w == e)
- i % 911 == 905: near-antimeridian bbox (lon ~179.9, outside catalog)
- i % 5 == 0: ``created`` is null (stac_to_geocore.py:626-636 skip)
- i % 13 == 0: duplicated self-link (keep-LAST option dedup, quirk #2)
"""

from __future__ import annotations

import hashlib
import os
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codecs import fakeimg as fi

FIXTURE_ROOT = "/tmp/stgr_fixtures"

# (collection_id, weight, (W, S, E, N)) — priority = list order; regions
# overlap (and "cdem" spans everything) to exercise first-match PIP
# priority; weights are Zipf-ish with one collection holding ~50% of
# rows to exercise salted-key skew splitting (FIXTURES.md §2).
COLLECTIONS = [
    ("landsat-scenes", 0.50, (-140.0, 43.0, -90.0, 62.0)),
    ("monthly-vegetation-parameters-20m-v1", 0.18, (-95.0, 43.0, -60.0, 58.0)),
    ("hrdem-lidar", 0.12, (-125.0, 55.0, -100.0, 70.0)),
    ("hrdem-arcticdem", 0.08, (-110.0, 66.0, -60.0, 82.0)),
    ("flood-mapping", 0.05, (-80.0, 43.0, -53.0, 52.0)),
    ("cdem", 0.03, (-140.0, 43.0, -53.0, 82.0)),
    ("sentinel2-l2a", 0.025, (-120.0, 45.0, -80.0, 60.0)),
    ("wildfire-burns", 0.015, (-130.0, 48.0, -110.0, 60.0)),
]
_CUM_W = np.cumsum([c[1] for c in COLLECTIONS])

_MEDIA_TYPES = [
    "image/tiff; application=geotiff; profile=cloud-optimized",
    "image/png", "image/jpeg", "application/json", "application/pdf",  # pdf -> Other
    "text/plain",
]
_ROLE_SETS = [["thumbnail"], ["overview"], ["data"], ["metadata"],
              ["data", "metadata"]]  # multi-role -> "Other" (quirk #5)


def hash64(s: str) -> int:
    """First 8 bytes of sha256(s) as uint64 (FIXTURES.md)."""
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def n_images_for(sf_dir: str) -> int:
    name = pathlib.Path(sf_dir).name          # "sf0.01"
    sf = float(name[2:]) if name.startswith("sf") else 0.001
    return max(64, round(1_000_000 * sf))


# bump to invalidate cached fixture dirs when generation rules change
# (v2: planted antimeridian-CROSSING bboxes at i % 911 == 907;
#  v3: _ALIGNED.json co-partition manifest)
FIXTURE_VERSION = 3


def fixture_dir(sf_dir: str) -> str:
    return os.path.join(FIXTURE_ROOT,
                        f"{pathlib.Path(sf_dir).name}-v{FIXTURE_VERSION}")


IMAGES_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])

_LINK_T = pa.list_(pa.struct([("href", pa.string()), ("rel", pa.string()),
                              ("title", pa.string())]))
_ASSET_T = pa.list_(pa.struct([
    ("name", pa.string()), ("href", pa.string()), ("type", pa.string()),
    ("title", pa.string()), ("roles", pa.list_(pa.string()))]))

ITEMS_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("item_id", pa.string()),
    ("collection_id", pa.string()),
    ("bbox", pa.list_(pa.float64(), 4)),
    ("geometry_type", pa.string()),
    ("datetime", pa.string()),
    ("created", pa.string()),
    ("links", _LINK_T),
    ("assets", _ASSET_T),
])


def _row_geo(i: int, h: int):
    """Deterministic collection index + full-precision bbox for row i."""
    u = (h & 0xFFFFFFFF) / 2.0 ** 32
    ci = int(np.searchsorted(_CUM_W, u * _CUM_W[-1], side="right"))
    ci = min(ci, len(COLLECTIONS) - 1)
    W, S, E, N = COLLECTIONS[ci][2]
    fx = ((h >> 8) & 0xFFFFF) / 2.0 ** 20
    fy = ((h >> 28) & 0xFFFFF) / 2.0 ** 20
    hw = 0.02 + ((h >> 48) & 0xFF) / 255.0 * 0.20
    hh = 0.02 + ((h >> 56) & 0xFF) / 255.0 * 0.20
    cx = W + hw + fx * max(E - W - 2 * hw, 1e-6)
    cy = S + hh + fy * max(N - S - 2 * hh, 1e-6)
    w, s, e, n = cx - hw, cy - hh, cx + hw, cy + hh
    if i % 997 == 900:                      # degenerate: zero width
        e = w
    if i % 911 == 905:                      # near-antimeridian, outside catalog
        w, e = 179.80 + fx * 0.15, 179.80 + fx * 0.15 + 0.04
    if i % 911 == 907:                      # CROSSING the antimeridian (w > e)
        w, e = 179.90 + fx * 0.05, -179.98 + fy * 0.05
    return ci, (w, s, e, n)


def _row_links(i: int, coll: str, item_id: str):
    base = f"https://api.example.ca/collections/{coll}"
    links = [
        {"href": f"{base}/items/{item_id}", "rel": "self", "title": None},
        {"href": "https://api.example.ca/", "rel": "root", "title": None},
        {"href": base, "rel": "parent", "title": f"{coll} parent"},
        {"href": "../collection.json", "rel": "collection", "title": None},  # skipped
    ]
    if i % 3 == 0:
        links.append({"href": f"{base}/derived/{i}", "rel": "derived_from",
                      "title": f"Derived {i} en/Dérivé {i} fr"})
    if i % 7 == 0:
        links.append({"href": f"{base}/license", "rel": "license", "title": None})
    if i % 13 == 0:                          # planted duplicate (keep-LAST dedup)
        links.append(dict(links[0]))
    return links


def _row_assets(i: int, h: int, coll: str, item_id: str):
    assets = []
    mt = _MEDIA_TYPES[(h >> 16) % len(_MEDIA_TYPES)]
    roles = _ROLE_SETS[(h >> 24) % len(_ROLE_SETS)]
    assets.append({"name": "main", "href": f"s3://data/{coll}/{item_id}.tif",
                   "type": mt, "title": "Main asset/Actif principal",
                   "roles": roles})
    if i % 2 == 0:
        assets.append({"name": "thumb", "href": f"s3://data/{coll}/{item_id}.png",
                       "type": "image/png", "title": "ThumbnailOnly",
                       "roles": ["thumbnail"]})
    if i % 11 == 0:
        return None                          # items may lack assets entirely
    return assets


def _image_payload(i: int, _cache: dict | None = None) -> dict:
    """Pixels-derived fields of row i, independent of any loop state.

    Duplicate planting references row i-1's payload by RE-DERIVING it
    (memoized), so any chunking of the id range produces identical
    rows — a requirement for parallel generation and resumability.
    """
    if _cache is None:
        _cache = {}
    if i in _cache:
        return _cache[i]
    h = hash64(f"img-{i:09d}")
    if i > 0 and i % 97 == 0:                 # exact duplicate of row i-1
        row = dict(_image_payload(i - 1, _cache))
    elif i > 0 and i % 101 == 0:              # near-duplicate: phash 1 bit off
        row = dict(_image_payload(i - 1, _cache))
        row["phash"] = row["phash"] ^ 1
    else:
        w = 64 + (h % 7) * 32
        hh = 64 + ((h // 7) % 5) * 32
        fmt = "png" if i % 2 == 0 else "jpeg"
        enc = fi.encode(fi.synth_pixels(h, w, hh), fmt)
        # phash of the DECODED pixels so pipeline recompute matches exactly
        row = {"bytes": enc, "w": int(w), "h": int(hh), "fmt": fmt,
               "phash": fi.phash(fi.decode(enc))}
    _cache[i] = row
    return row


def gen_chunk(lo: int, hi: int) -> tuple[pa.Table, pa.Table]:
    """Rows [lo, hi) of the images + stac_items tables (pure function)."""
    img_rows, item_rows = [], []
    payload_cache: dict = {}
    for i in range(lo, hi):
        image_id = f"img-{i:09d}"
        h = hash64(image_id)
        ci, (bw, bs, be, bn) = _row_geo(i, h)
        coll = COLLECTIONS[ci][0]
        year = 2015 + ((h >> 13) % 10)
        month = 1 + ((h >> 17) % 12)
        day = 1 + ((h >> 21) % 28)
        item_id = f"{coll}-{year}-{i}"
        dt = (f"{year:04d}-{month:02d}-{day:02d}T{(h >> 33) % 24:02d}:"
              f"{(h >> 38) % 60:02d}:{(h >> 44) % 60:02d}Z")
        created = None if i % 5 == 0 else f"{year:04d}-{month:02d}-{day:02d}T00:00:00Z"
        row = dict(_image_payload(i, payload_cache))
        row["image_id"] = image_id
        row["caption"] = f"{coll} scene {i} / scène {i}"
        img_rows.append(row)
        item_rows.append({
            "image_id": image_id, "item_id": item_id, "collection_id": coll,
            "bbox": [bw, bs, be, bn], "geometry_type": "Polygon",
            "datetime": dt, "created": created,
            "links": _row_links(i, coll, item_id),
            "assets": _row_assets(i, h, coll, item_id),
        })
    return (pa.Table.from_pylist(img_rows, schema=IMAGES_SCHEMA),
            pa.Table.from_pylist(item_rows, schema=ITEMS_SCHEMA))


_CHUNK = 1024


def _write_chunk(out: str, lo: int, hi: int, shard: int) -> dict:
    import zlib
    img, items = gen_chunk(lo, hi)
    # image bytes are already zlib-compressed: recompressing wastes time
    pq.write_table(img, os.path.join(out, "images", f"part-{shard:05d}.parquet"),
                   compression="none", use_dictionary=False)
    pq.write_table(items, os.path.join(out, "stac_items", f"part-{shard:05d}.parquet"))
    ids = "\0".join(img.column("image_id").to_pylist()).encode()
    return {"shard": f"part-{shard:05d}", "rows": img.num_rows,
            "ids_crc": zlib.crc32(ids)}


def generate(sf_dir: str, force: bool = False) -> str:
    """Generate (or reuse cached) fixture parquet for ``sf_dir``; returns dir.

    Tables land as parquet shard directories (images/, stac_items/)
    plus single files for the small sides.  When a Ray session is live
    and the table is big, shards generate in parallel Ray tasks.
    """
    out = fixture_dir(sf_dir)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker) and not force:
        return out
    n = n_images_for(sf_dir)
    os.makedirs(os.path.join(out, "images"), exist_ok=True)
    os.makedirs(os.path.join(out, "stac_items"), exist_ok=True)

    ranges = [(lo, min(lo + _CHUNK, n), s)
              for s, lo in enumerate(range(0, n, _CHUNK))]
    use_ray = False
    try:
        import ray
        use_ray = ray.is_initialized() and n >= 4 * _CHUNK
    except ImportError:
        pass
    if use_ray:
        import ray
        task = ray.remote(num_cpus=1)(_write_chunk)
        metas = ray.get([task.remote(out, lo, hi, s) for lo, hi, s in ranges])
    else:
        metas = [_write_chunk(out, lo, hi, s) for lo, hi, s in ranges]

    # co-partition manifest: per-shard row count + image_id checksum,
    # written from the single source of truth (both tables share the
    # generated id sequence).  AlignedCoRead verifies alignment against
    # THIS instead of an O(rows) per-task id-list compare.
    import json
    with open(os.path.join(out, "_ALIGNED.json"), "w") as f:
        json.dump({m["shard"]: {"rows": m["rows"], "ids_crc": m["ids_crc"]}
                   for m in metas}, f)

    _write_collections(out)
    _write_root(out)
    with open(marker, "w") as f:
        f.write(f"n={n}\n")
    return out


def _coll_row(idx: int, cid: str, region) -> dict:
    W, S, E, N = region
    titles = {
        5: None,                               # null title -> (coll_id, coll_id)
        7: "OnlyEnglishTitle",                 # no '/' -> fr falls back (quirk #3)
    }
    title = titles.get(idx, f"{cid.title()} En/{cid.title()} Fr")
    desc = None if idx == 2 else f"Description of {cid}/Description de {cid}"
    if idx == 3:
        kw = None                              # null keywords
    else:
        kw = [f"kw{j}-{cid}" for j in range(2 + (idx * 3) % 5)]  # even & odd lengths
    tb, te = (None, None) if idx == 6 else (
        f"{2010 + idx:04d}-01-01T00:00:00Z", f"{2020 + idx:04d}-06-30T00:00:00Z")
    wkt = (f"POLYGON(({W} {S}, {E} {S}, {E} {N}, {W} {N}, {W} {S}))")
    base = f"https://api.example.ca/collections/{cid}"
    links = [
        {"href": base, "rel": "self", "title": None},
        {"href": "https://api.example.ca/", "rel": "root", "title": None},
        {"href": "https://api.example.ca/", "rel": "parent", "title": None},
        {"href": f"{base}/items", "rel": "items", "title": None},
        {"href": f"{base}/items/first", "rel": "item",
         "title": None if idx % 2 == 0 else f"First item of {cid}"},
    ]
    assets = None if idx % 2 == 0 else [
        {"name": "meta", "href": f"s3://data/{cid}/meta.json",
         "type": "application/json", "title": f"Metadata {cid}/Métadonnées {cid}",
         "roles": ["metadata"]}]
    return {"collection_id": cid, "coll_index": idx, "title": title,
            "description": desc, "keywords": kw,
            "bbox": [W, S, E, N], "time_begin": tb, "time_end": te,
            "polygon_wkt": wkt, "links": links, "assets": assets}


COLLECTIONS_SCHEMA = pa.schema([
    ("collection_id", pa.string()),
    ("coll_index", pa.int32()),
    ("title", pa.string()),
    ("description", pa.string()),
    ("keywords", pa.list_(pa.string())),
    ("bbox", pa.list_(pa.float64(), 4)),
    ("time_begin", pa.string()),
    ("time_end", pa.string()),
    ("polygon_wkt", pa.string()),
    ("links", _LINK_T),
    ("assets", _ASSET_T),
])


def _write_collections(out: str) -> None:
    rows = [_coll_row(i, cid, region) for i, (cid, _, region) in enumerate(COLLECTIONS)]
    pq.write_table(pa.Table.from_pylist(rows, schema=COLLECTIONS_SCHEMA),
                   os.path.join(out, "collections.parquet"))


def _write_root(out: str) -> None:
    rows = [{
        "root_id_raw": "ccmeo datacube api",   # spaces -> '-' (app.py:74-75)
        "root_description": "CCMEO Datacube STAC API",
        "links": [
            {"href": "https://api.example.ca/", "rel": "self", "title": None},
            {"href": "https://api.example.ca/", "rel": "root", "title": None},
            {"href": "https://api.example.ca/collections", "rel": "data",
             "title": None},
            {"href": "https://api.example.ca/collections/cdem", "rel": "child",
             "title": "cdem"},
        ],
    }]
    schema = pa.schema([("root_id_raw", pa.string()),
                        ("root_description", pa.string()), ("links", _LINK_T)])
    pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                   os.path.join(out, "catalog_root.parquet"))


def paths(sf_dir: str) -> dict[str, str]:
    """Table name -> path (shard dir for big tables, file for small)."""
    d = generate(sf_dir)
    return {
        "images": os.path.join(d, "images"),
        "stac_items": os.path.join(d, "stac_items"),
        "collections": os.path.join(d, "collections.parquet"),
        "catalog_root": os.path.join(d, "catalog_root.parquet"),
    }


def duckdb_glob(path: str) -> str:
    """A DuckDB read_parquet() target for a paths() entry."""
    return os.path.join(path, "*.parquet") if os.path.isdir(path) else path
