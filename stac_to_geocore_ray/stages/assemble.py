"""GeoCore FeatureCollection assembly (M2) — flat rows -> nested records.

The reference builds each output record by cloning a null template and
patching it per record (update_geocore_dict, stac_to_geocore.py:148-167;
template re-fetched from S3 per record, app.py:122,150 — the perf bug
SURVEY.md ST2 calls out).  Here the template is a CONSTANT built once
from the config, and assembly is a batch transform producing one
serialized GeoCore FeatureCollection JSON per row — the engine's
equivalent of the reference's one-geojson-object-per-record sink (S7),
minus the per-record network round-trips.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..config import DEFAULT_CONFIG, TranslateConfig

CONTACT = [{
    "organisation": {
        "en": "Government of Canada;Natural Resources Canada;"
              "Strategic Policy and Innovation Sector",
        "fr": "Gouvernement du Canada;Ressources naturelles Canada;"
              "Secteur de la politique stratégique et de l’innovation"},
    "email": {"en": "geoinfo@nrcan-rncan.gc.ca",
              "fr": "geoinfo@nrcan-rncan.gc.ca"},
    "individual": None,
    "position": {"en": None, "fr": None},
    "telephone": {"en": None, "fr": None},
    "address": {"en": None, "fr": None},
    "city": None,
    "pt": {"en": None, "fr": None},
    "postalcode": None,
    "country": {"en": None, "fr": None},
    "onlineResources": {"onlineResources": None, "onlineResources_Name": None,
                        "onlineResources_Protocol": None,
                        "onlineResources_Description": None},
    "hoursofService": None,
    "role": None,
}]


def _ring_from_wkt(wkt: str) -> list:
    inner = wkt[len("POLYGON(("):-2]
    return [[[float(x) for x in pt.split()] for pt in inner.split(", ")]]


def assemble_record(row: dict, cfg: TranslateConfig = DEFAULT_CONFIG,
                    record_type: str = "item") -> dict:
    """One flat translated row -> GeoCore FeatureCollection dict."""
    props = {
        "id": row["id"],
        "title": {"en": row.get("title_en"), "fr": row.get("title_fr")},
        "description": {"en": row.get("description_en"),
                        "fr": row.get("description_fr")},
        "keywords": {"en": row.get("keywords_en"), "fr": row.get("keywords_fr")},
        "parentIdentifier": row.get("parent_identifier"),
        "temporalExtent": {"begin": row.get("temporal_begin"),
                           "end": row.get("temporal_end")},
        "options": [
            {"url": o.get("url"), "protocol": o.get("protocol"),
             "name": {"en": o.get("name_en"), "fr": o.get("name_fr")},
             "description": {"en": o.get("desc_en"), "fr": o.get("desc_fr")}}
            for o in row.get("options") or []],
        "geometry": row.get("geometry_wkt"),
        "topicCategory": cfg.topic_category,
        "type": cfg.type_data,
        "spatialRepresentation": cfg.spatial_representation,
        "status": cfg.status,
        "maintenance": cfg.maintenance,
        "useLimits": {"en": cfg.use_limits_en, "fr": cfg.use_limits_fr},
        "contact": CONTACT,
        "sourceSystemName": cfg.source_system_name,
    }
    if row.get("date_published") is not None:
        props["date"] = {
            "published": {"text": "publication; publication",
                          "date": row["date_published"]},
            "created": {"text": "creation; création",
                        "date": row["date_published"]},
        }
    return {
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "geometry": {"type": "Polygon",
                         "coordinates": _ring_from_wkt(row["geometry_wkt"])},
            "properties": props,
        }],
    }


class RecordAssembler:
    """map_batches stage: flat rows -> (id, geocore_json) rows."""

    def __init__(self, cfg: TranslateConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        ids, docs = [], []
        for row in rows:
            rec = assemble_record(row, self.cfg)
            ids.append(row["id"])
            docs.append(json.dumps(rec, ensure_ascii=False))
        return pa.table({"id": pa.array(ids, pa.string()),
                         "geocore_json": pa.array(docs, pa.string())})
