"""STAC -> GeoCore translation as Arrow batch transforms.

Re-expresses the reference's per-record mappers (SURVEY.md §2.2-§2.3:
M5-M11, F1-F4, A1, J1) over columnar batches.  Scalar string/date work
is vectorized with pyarrow.compute; the link/asset option flattening
is row-local by definition (keep-LAST dedup inside each record's
option list, quirk #2) and runs as a tight Python loop over only the
two nested columns of the batch.

Reference-quirk semantics preserved (SURVEY.md §2.10), with citations:
- round-2-then-ring/WKT           stac_to_geocore.py:177,655-656
- keep-LAST option dedup          stac_to_geocore.py:404,480,646
- title without '/' -> fr=coll_id stac_to_geocore.py:541
- keywords halved floor/ceil      stac_to_geocore.py:544-549
- multi-role assets -> Other      stac_to_geocore.py:352,358
- rel=='collection' links skipped stac_to_geocore.py:297-299
- temporal defaults               stac_to_geocore.py:471-474,637-640
- 'derived_from' never matches    stac_to_geocore.py:104 vs :276,317
- hrdem or-precedence title rule  stac_to_geocore.py:606-609
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, TranslateConfig
from ..geo import bbox as bboxmod

OPTION_T = pa.list_(pa.struct([
    ("url", pa.string()), ("protocol", pa.string()),
    ("name_en", pa.string()), ("name_fr", pa.string()),
    ("desc_en", pa.string()), ("desc_fr", pa.string())]))


def split_bilingual(text: str | None, fallback_en, fallback_fr):
    """'En/Fr' split with the reference's fallback semantics
    (stac_to_geocore.py:541-542): no '/' -> (text, fallback_fr);
    null -> (fallback_en, fallback_fr)."""
    if text is None:
        return fallback_en, fallback_fr
    parts = text.split("/")
    if len(parts) >= 2:
        return parts[0], parts[1]
    return parts[0], fallback_fr


def halve_keywords(kw: list | None):
    """floor(n/2) first keywords -> en, rest -> fr (quirk #4)."""
    if not kw:
        return None, None
    half = len(kw) // 2
    return ", ".join(str(k) for k in kw[:half]), ", ".join(str(k) for k in kw[half:])


def collection_lookup(coll_table: pa.Table) -> dict[str, dict]:
    """coll_id -> bilingual title/description/keywords broadcast dict.

    The reference's ``create_coll_dict`` (stac_to_geocore.py:553-566)
    built once per run and probed per item (J1); here it is built from
    the collections catalog table and shipped via ray.put to every
    translator actor.
    """
    out = {}
    for row in coll_table.to_pylist():
        cid = row["collection_id"]
        t_en, t_fr = split_bilingual(row.get("title"), cid, cid)
        d_en, d_fr = split_bilingual(row.get("description"), None, None)
        k_en, k_fr = halve_keywords(row.get("keywords"))
        out[cid] = {"title_en": t_en, "title_fr": t_fr,
                    "desc_en": d_en, "desc_fr": d_fr,
                    "kw_en": k_en, "kw_fr": k_fr}
    return out


def _dedup_keep_last(options: list[dict]) -> list[dict]:
    """Whole-struct dedup keeping the LAST occurrence, preserving
    last-occurrence order (quirk #2).  Hashable-key rewrite of the
    reference's O(n^2) membership scan — same output order."""
    seen: dict = {}
    for idx, opt in enumerate(options):
        key = (opt["url"], opt["name_en"], opt["name_fr"],
               opt["desc_en"], opt["desc_fr"])
        seen[key] = idx          # later duplicates overwrite -> keep last
    keep = sorted(seen.values())
    return [options[i] for i in keep]


def _option(url, name_en, name_fr, typ, fmt):
    return {"url": url, "protocol": "Unknown",
            "name_en": name_en, "name_fr": name_fr,
            "desc_en": f"{typ};{fmt};eng", "desc_fr": f"{typ};{fmt};fra"}


class OptionFlattener:
    """Link/asset -> option flattening for all three record types
    (F1/F2/F3/F4), dispatch tables prebuilt from config once."""

    def __init__(self, cfg: TranslateConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        lr = cfg.links_rel
        other = ("Other", "Autre")
        self._fmt = {
            "root": {"self": lr["root"], "root": lr["root"], "parent": lr["root"],
                     "child": lr["collection"], "data": lr["data"],
                     "service-desc": lr["service-desc"], "service-doc": lr["service-doc"],
                     "conformance": lr["conformance"], "search": lr["search"]},
            "collection": {"self": lr["collection"], "root": lr["root"],
                           "parent": lr["root"], "child": lr["item"],
                           "items": lr["item"], "license": lr["license"]},
            # NB probe key 'derived_ from' in the reference never matches
            # its table ('drived_from'), so derived_from -> Other here too.
            "item": {"self": lr["item"], "root": lr["root"],
                     "parent": lr["collection"], "collection": lr["collection"]},
        }
        self._other = other
        en, fr = cfg.root_name.split("/")[:2] if "/" in cfg.root_name \
            else (cfg.root_name, cfg.root_name)
        self.root_en, self.root_fr = en, fr

    def _names(self, stac_type: str, rel: str, name, rec_id: str,
               coll_id: str | None, title_en, title_fr):
        en, fr = self.root_en, self.root_fr
        if rel == "self":
            if stac_type == "root":
                return f"Root - {en}", f"Racine - {fr}"
            return f"Self - {rec_id}", f"Soi - {rec_id}"
        if rel == "root":
            return f"Root - {en}", f"Racine - {fr}"
        if rel == "parent":
            if stac_type == "root":
                # reference root mapper: item-titles absent -> generic label
                return "Parent links", "Parente liens"
            if stac_type == "collection":
                return f"Root - {en}", f"Racine - {fr}"
            return f"Collection - {coll_id}", f"Collection - {coll_id}"
        if stac_type == "root" and rel == "child":
            return f"Collection - {name}", f"Collection - {name}"
        if stac_type == "root" and rel == "data":
            return "Collections Listing", "Collection Listing"
        if stac_type == "collection" and rel in ("child", "item"):
            label = name if name is not None else "Unknown"
            return f"Item - {label}", f"Item - {label}"
        if stac_type == "collection" and rel == "items":
            return "Items Listing", "Items Listing"
        if stac_type == "item" and rel == "collection":
            return f"Collection - {coll_id}", f"Collection - {coll_id}"
        return (name if name else "Unknown", name if name else "Inconnue")

    def links_to_options(self, stac_type: str, links: list | None, rec_id: str,
                         coll_id: str | None = None,
                         title_en=None, title_fr=None) -> list[dict]:
        """``links``: (href, rel, title) tuples, or dicts (normalized)."""
        if not links:
            return []
        out = []
        fmt_table = self._fmt[stac_type]
        for link in links:
            if isinstance(link, dict):
                link = (link.get("href"), link.get("rel"), link.get("title"))
            href, rel, title = link
            if stac_type == "item" and rel == "collection":
                continue                     # relative URL, skipped (quirk #6)
            name_en, name_fr = self._names(stac_type, rel, title,
                                           rec_id, coll_id, title_en, title_fr)
            typ, fmt = fmt_table.get(rel, self._other)
            if name_en and name_fr:
                out.append(_option(href, name_en, name_fr, typ, fmt))
        return out

    def assets_to_options(self, assets: list | None) -> list[dict]:
        """F4 semantics over our list<struct> asset encoding (the
        reference iterates a dict's .values(); order preserved).

        ``assets``: (href, type, title, roles) tuples, or dicts.
        """
        if not assets:
            return []
        out = []
        for a in assets:
            if isinstance(a, dict):
                a = (a.get("href"), a.get("type", ""), a.get("title"),
                     a.get("roles"))
            href, mtype, title, roles = a
            name = title or "Unknown/Inconnu"
            name_en, name_fr = (name.split("/", 1) if "/" in name else (name, name))
            fmt = self.cfg.assets_type.get(mtype or "", "Other")
            fmt_en, fmt_fr = (fmt, fmt) if fmt != "Other" else ("Other", "Autre")
            role_key = ", ".join(roles or [])            # multi-role -> no match
            typ = self.cfg.assets_role.get(role_key, "Other")
            typ_en, typ_fr = (typ, typ) if typ != "Other" else ("Other", "Autre")
            out.append({"url": href, "protocol": "Unknown",
                        "name_en": f"Asset - {name_en}", "name_fr": f"Asset - {name_fr}",
                        "desc_en": f"{typ_en};{fmt_en};eng",
                        "desc_fr": f"{typ_fr};{fmt_fr};fra"})
        return out



def _extract_links(col) -> list:
    """list<struct<href,rel,title>> column -> per-row (href, rel, title)
    tuples via flat child arrays (3x faster than to_pylist)."""
    lc = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = lc.offsets.to_numpy()
    vals = lc.values
    hrefs = vals.field("href").to_pylist()
    rels = vals.field("rel").to_pylist()
    titles = vals.field("title").to_pylist()
    valid = lc.is_valid().to_numpy(zero_copy_only=False)
    out = []
    for i in range(len(lc)):
        if not valid[i]:
            out.append(None)
            continue
        lo, hi = offs[i], offs[i + 1]
        out.append(list(zip(hrefs[lo:hi], rels[lo:hi], titles[lo:hi])))
    return out


def _extract_assets(col) -> list:
    """list<struct<name,href,type,title,roles>> -> per-row
    (href, type, title, roles) tuples."""
    lc = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = lc.offsets.to_numpy()
    vals = lc.values
    hrefs = vals.field("href").to_pylist()
    types = vals.field("type").to_pylist()
    titles = vals.field("title").to_pylist()
    roles_col = vals.field("roles")
    roff = roles_col.offsets.to_numpy()
    rvals = roles_col.values.to_pylist()
    valid = lc.is_valid().to_numpy(zero_copy_only=False)
    out = []
    for i in range(len(lc)):
        if not valid[i]:
            out.append(None)
            continue
        row = []
        for j in range(offs[i], offs[i + 1]):
            row.append((hrefs[j], types[j], titles[j], rvals[roff[j]:roff[j + 1]]))
        out.append(row)
    return out


class ItemTranslator:
    """Actor-pool batch transform: stac_items -> flat GeoCore item rows.

    The reference's per-item path (M7 + F3 + F4 + A1 + J1 probe,
    stac_to_geocore.py:570-682) as one ``map_batches`` stage.  The
    collection lookup dict is the broadcast small side: pass either the
    dict itself or a ``ray.ObjectRef`` from ``ray.put`` (resolved once
    in ``__init__``, never per batch).
    """

    def __init__(self, coll_lookup, cfg: TranslateConfig = DEFAULT_CONFIG,
                 on_error: str = "raise"):
        """``on_error="quarantine"``: a row whose link/asset structs
        blow up the flatten is dropped from the output and recorded as
        an (item_id, error) dead letter (``take_quarantine()``), the
        same poison-record policy as Tiler — the columnar kernels
        cannot fail per-row, the row-local flatten is the only
        record-level failure surface."""
        if on_error not in ("raise", "quarantine"):
            raise ValueError(f"on_error={on_error!r}")
        try:
            import ray
            if isinstance(coll_lookup, ray.ObjectRef):
                coll_lookup = ray.get(coll_lookup)
        except ImportError:
            pass
        self.coll = coll_lookup
        self.cfg = cfg
        self.on_error = on_error
        self._dead: list[tuple[str, str]] = []
        self.flat = OptionFlattener(cfg)
        self._coll_ids = pa.array(list(coll_lookup.keys()), pa.string())
        self._coll_cols = {
            k: pa.array([v[k] for v in coll_lookup.values()], pa.string())
            for k in ("title_en", "title_fr", "desc_en", "desc_fr", "kw_en", "kw_fr")}

    def take_quarantine(self) -> pa.Table:
        rows, self._dead = self._dead, []
        return pa.table({
            "item_id": pa.array([r[0] for r in rows], pa.string()),
            "error": pa.array([r[1] for r in rows], pa.string())})

    def _probe(self, coll_col: pa.Array) -> dict[str, pa.Array]:
        """Vectorized broadcast-join probe: index_in + take (J1)."""
        idx = pc.index_in(coll_col, value_set=self._coll_ids)
        return {k: arr.take(idx) for k, arr in self._coll_cols.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = len(batch)
        coll = batch["collection_id"]
        item_id = batch["item_id"]
        probe = self._probe(coll)

        src = pa.scalar(cfg.source)
        dash = pa.scalar("-")
        rec_id = pc.binary_join_element_wise(
            pc.binary_join_element_wise(src, coll, dash), item_id, dash)
        parent_id = pc.binary_join_element_wise(src, coll, dash)

        # temporal: fixed-format '%Y-%m-%dT%H:%M:%SZ' -> slices
        dt = batch["datetime"]
        year = pc.utf8_slice_codeunits(dt, 0, 4)
        begin = pc.utf8_slice_codeunits(dt, 0, 10)

        # per-collection title rules (stac_to_geocore.py:602-609)
        sep = pa.scalar(" - ")
        t_en, t_fr = probe["title_en"], probe["title_fr"]
        default_en = pc.binary_join_element_wise(year, t_en, sep)
        default_fr = pc.binary_join_element_wise(year, t_fr, sep)
        month_tok = pc.struct_field(
            pc.extract_regex(item_id, r"-(?P<tok>[^-]*)$"), "tok")
        # reference is item_id.split('-')[-1]: a dashless id yields the
        # WHOLE id, not null (stac_to_geocore.py:607)
        month_tok = pc.if_else(pc.is_valid(month_tok), month_tok, item_id)
        month_en = pc.binary_join_element_wise(month_tok, t_en, sep)
        month_fr = pc.binary_join_element_wise(month_tok, t_fr, sep)
        yid_en = pc.binary_join_element_wise(
            year, pc.binary_join_element_wise(item_id, t_en, dash), sep)
        yid_fr = pc.binary_join_element_wise(
            year, pc.binary_join_element_wise(item_id, t_fr, dash), sep)
        rules = [cfg.title_rules.get(c, "year-title")
                 for c in coll.to_pylist()]
        is_month = pa.array([r == "monthtoken-title" for r in rules])
        is_yid = pa.array([r == "year-itemid-title" for r in rules])
        title_en = pc.if_else(is_month, month_en, pc.if_else(is_yid, yid_en, default_en))
        title_fr = pc.if_else(is_month, month_fr, pc.if_else(is_yid, yid_fr, default_fr))

        # options: row-local flatten + keep-last dedup over the two
        # nested columns only (everything else stays columnar).
        # Child-array extraction + offset slicing is ~3x faster than
        # to_pylist() on nested struct lists.
        links_py = _extract_links(batch["links"])
        assets_py = _extract_assets(batch["assets"])
        ids_py = item_id.to_pylist()
        colls_py = coll.to_pylist()
        options = []
        bad: list[int] = []
        for i in range(n):
            try:
                opts = self.flat.links_to_options("item", links_py[i],
                                                  ids_py[i],
                                                  coll_id=colls_py[i])
                opts += self.flat.assets_to_options(assets_py[i])
                options.append(_dedup_keep_last(opts))
            except Exception as exc:
                if self.on_error != "quarantine":
                    raise
                bad.append(i)
                self._dead.append((ids_py[i],
                                   f"{type(exc).__name__}: {exc}"))
                options.append([])            # placeholder; row filtered below
        options_arr = pa.array(options, OPTION_T)
        n_options = pc.list_value_length(options_arr)

        # description / keywords with disclaimer + prefix (':648-652')
        space = pa.scalar(" ")
        desc_en = pc.binary_join_element_wise(
            pc.coalesce(probe["desc_en"], pa.scalar("")),
            pa.scalar(cfg.disclaimer_en), space)
        desc_fr = pc.binary_join_element_wise(
            pc.coalesce(probe["desc_fr"], pa.scalar("")),
            pa.scalar(cfg.disclaimer_fr), space)
        kw_prefix = pa.scalar("SpatioTemporal Asset Catalog, stac, ")
        kw_en = pc.binary_join_element_wise(
            kw_prefix, pc.coalesce(probe["kw_en"], pa.scalar("")), pa.scalar(""))
        kw_fr = pc.binary_join_element_wise(
            kw_prefix, pc.coalesce(probe["kw_fr"], pa.scalar("")), pa.scalar(""))

        # round-2 WKT footprint (quirk #1)
        bb = batch["bbox"]
        flat = bb.combine_chunks().flatten() if isinstance(bb, pa.ChunkedArray) \
            else bb.flatten()
        import numpy as np
        bbox_np = flat.to_numpy(zero_copy_only=False).reshape(-1, 4)
        w, s, e, nn = bboxmod.split_bbox(bbox_np)
        wkt = pa.array(bboxmod.wkt_polygons(w, s, e, nn), pa.string())

        created = batch["created"]
        has_created = pc.is_valid(created)
        pub_text = pc.if_else(has_created, pa.scalar("publication; publication"),
                              pa.scalar(None, pa.string()))
        cre_text = pc.if_else(has_created, pa.scalar("creation; création"),
                              pa.scalar(None, pa.string()))

        cols = {
            "image_id": batch["image_id"],
            "item_id": item_id,
            "collection_id": coll,
            "id": rec_id,
            "parent_identifier": parent_id,
            "title_en": title_en, "title_fr": title_fr,
            "description_en": desc_en, "description_fr": desc_fr,
            "keywords_en": kw_en, "keywords_fr": kw_fr,
            "temporal_begin": begin,
            "temporal_end": pa.array(["Present"] * n),
            "date_published_text": pub_text,
            "date_published": created,
            "date_created_text": cre_text,
            "date_created": created,
            "geometry_wkt": wkt,
            "options": options_arr,
            "n_options": n_options,
            "topic_category": pa.array([cfg.topic_category] * n),
            "type_data": pa.array([cfg.type_data] * n),
            "spatial_representation": pa.array([cfg.spatial_representation] * n),
            "status": pa.array([cfg.status] * n),
            "maintenance": pa.array([cfg.maintenance] * n),
            "source_system_name": pa.array([cfg.source_system_name] * n),
        }
        out = pa.table(cols)
        if bad:                               # drop quarantined rows
            keep = np.ones(n, dtype=bool)
            keep[bad] = False
            out = out.filter(pa.array(keep))
        return out


def translate_collections(coll_table: pa.Table,
                          cfg: TranslateConfig = DEFAULT_CONFIG) -> pa.Table:
    """Collections catalog -> flat GeoCore collection rows (M6+M8+F2+F4+A1)."""
    flat = OptionFlattener(cfg)
    rows = []
    for r in coll_table.to_pylist():
        cid = r["collection_id"]
        t_en, t_fr = split_bilingual(r.get("title"), cid, cid)
        d_en, d_fr = split_bilingual(r.get("description"), None, None)
        k_en, k_fr = halve_keywords(r.get("keywords"))
        opts = flat.links_to_options("collection", r.get("links"), cid)
        opts += flat.assets_to_options(r.get("assets"))
        opts = _dedup_keep_last(opts)
        tb, te = r.get("time_begin"), r.get("time_end")
        begin = tb[:10] if tb else "0001-01-01"
        end = te[:10] if te else "Present"
        w, s, e, n = r["bbox"]
        wkt = bboxmod.wkt_polygons([w], [s], [e], [n])[0]
        rows.append({
            "collection_id": cid,
            "id": f"{cfg.source}-{cid}",
            "parent_identifier": f"{cfg.source}-root-{cfg.root_id}",
            "title_en": f"Collection - {t_en}" if t_en is not None and t_fr is not None else None,
            "title_fr": f"Collection - {t_fr}" if t_en is not None and t_fr is not None else None,
            "description_en": f"{d_en or ''} {cfg.disclaimer_en}",
            "description_fr": f"{d_fr or ''} {cfg.disclaimer_fr}",
            "keywords_en": f"SpatioTemporal Asset Catalog, stac, {k_en or ''}",
            "keywords_fr": f"SpatioTemporal Asset Catalog, stac, {k_fr or ''}",
            "temporal_begin": begin, "temporal_end": end,
            "geometry_wkt": wkt,
            "options": opts, "n_options": len(opts),
            "source_system_name": cfg.source_system_name,
        })
    return pa.Table.from_pylist(rows)


def translate_root(root_row: dict, root_bbox, cfg: TranslateConfig = DEFAULT_CONFIG) -> dict:
    """Root record translation (M5+F1+M10); ``root_bbox`` is by quirk #7
    the SECOND collection's bbox (app.py:78-82)."""
    flat = OptionFlattener(cfg)
    raw = root_row["root_id_raw"]
    root_id = raw.replace(" ", "-") if raw and not raw.isspace() else raw
    en, fr = cfg.root_name.split("/")[:2]
    opts = _dedup_keep_last(
        flat.links_to_options("root", root_row.get("links"), root_id))
    w, s, e, n = root_bbox
    des = root_row.get("root_description")
    return {
        "id": f"{cfg.source}-root-{root_id}",
        "title_en": f" Root  - {en}",        # leading/double spaces: reference-exact
        "title_fr": f" Racine - {fr}",
        "description_en": (des + "." + cfg.disclaimer_en) if des else cfg.disclaimer_en,
        "description_fr": (des + "." + cfg.disclaimer_fr) if des else cfg.disclaimer_fr,
        "keywords_en": f"SpatioTemporal Asset Catalog, stac, {cfg.source}",
        "keywords_fr": f"SpatioTemporal Asset Catalog, stac, {cfg.source}",
        "temporal_begin": "0001-01-01", "temporal_end": "Present",
        "geometry_wkt": bboxmod.wkt_polygons([w], [s], [e], [n])[0],
        "options": opts, "n_options": len(opts),
        "source_system_name": cfg.source_system_name,
    }
