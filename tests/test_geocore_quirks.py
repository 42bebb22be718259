"""Reference-quirk conformance (SURVEY.md §2.10) with hand-derived goldens."""

import pyarrow as pa
import pytest

from stac_to_geocore_ray.config import DEFAULT_CONFIG
from stac_to_geocore_ray.stages import geocore


def _mk_items(rows):
    from stac_to_geocore_ray.sources.fixtures import ITEMS_SCHEMA
    return pa.Table.from_pylist(rows, schema=ITEMS_SCHEMA)


BASE_ITEM = {
    "image_id": "img-x", "item_id": "cdem-2021-7", "collection_id": "cdem",
    "bbox": [-75.126, 45.674, -74.994, 46.0049], "geometry_type": "Polygon",
    "datetime": "2021-03-04T05:06:07Z", "created": "2021-03-01T00:00:00Z",
    "links": [], "assets": None,
}

LOOKUP = {
    "cdem": {"title_en": "Cdem En", "title_fr": "Cdem Fr",
             "desc_en": "D en", "desc_fr": "D fr",
             "kw_en": "a, b", "kw_fr": "c"},
    "monthly-vegetation-parameters-20m-v1": {
        "title_en": "Veg En", "title_fr": "Veg Fr",
        "desc_en": None, "desc_fr": None, "kw_en": None, "kw_fr": None},
    "hrdem-lidar": {"title_en": "L En", "title_fr": "L Fr",
                    "desc_en": None, "desc_fr": None,
                    "kw_en": None, "kw_fr": None},
}


@pytest.fixture(scope="module")
def translator():
    return geocore.ItemTranslator(LOOKUP)


class TestItemTranslation:
    def test_quirk1_round2_wkt(self, translator):
        out = translator(_mk_items([BASE_ITEM])).to_pylist()[0]
        # -75.126 -> -75.13, 46.0049 -> 46.0: rounded BEFORE WKT
        assert out["geometry_wkt"] == (
            "POLYGON((-75.13 45.67, -74.99 45.67, -74.99 46.0, "
            "-75.13 46.0, -75.13 45.67))")

    def test_ids_and_parent(self, translator):
        out = translator(_mk_items([BASE_ITEM])).to_pylist()[0]
        assert out["id"] == "datacube-cdem-cdem-2021-7"
        assert out["parent_identifier"] == "datacube-cdem"

    def test_default_title_rule(self, translator):
        out = translator(_mk_items([BASE_ITEM])).to_pylist()[0]
        assert out["title_en"] == "2021 - Cdem En"
        assert out["title_fr"] == "2021 - Cdem Fr"

    def test_month_token_title_rule(self, translator):
        item = dict(BASE_ITEM)
        item["collection_id"] = "monthly-vegetation-parameters-20m-v1"
        item["item_id"] = "veg-2021-06"
        out = translator(_mk_items([item])).to_pylist()[0]
        assert out["title_en"] == "06 - Veg En"    # last '-' token, not year

    def test_year_itemid_title_rule(self, translator):
        item = dict(BASE_ITEM)
        item["collection_id"] = "hrdem-lidar"
        item["item_id"] = "MB-River-1m"
        out = translator(_mk_items([item])).to_pylist()[0]
        assert out["title_en"] == "2021 - MB-River-1m-L En"

    def test_quirk8_temporal_defaults(self, translator):
        out = translator(_mk_items([BASE_ITEM])).to_pylist()[0]
        assert out["temporal_begin"] == "2021-03-04"
        assert out["temporal_end"] == "Present"

    def test_created_null_skips_dates(self, translator):
        item = dict(BASE_ITEM)
        item["created"] = None
        out = translator(_mk_items([item])).to_pylist()[0]
        assert out["date_published"] is None
        assert out["date_published_text"] is None
        out2 = translator(_mk_items([BASE_ITEM])).to_pylist()[0]
        assert out2["date_published_text"] == "publication; publication"
        assert out2["date_created_text"] == "creation; création"

    def test_quirk6_collection_rel_skipped(self, translator):
        item = dict(BASE_ITEM)
        item["links"] = [
            {"href": "../collection.json", "rel": "collection", "title": None},
            {"href": "http://x/self", "rel": "self", "title": None},
        ]
        out = translator(_mk_items([item])).to_pylist()[0]
        assert out["n_options"] == 1
        assert out["options"][0]["name_en"] == "Self - cdem-2021-7"

    def test_quirk2_keep_last_dedup(self, translator):
        link = {"href": "http://x/self", "rel": "self", "title": None}
        other = {"href": "http://x/root", "rel": "root", "title": None}
        item = dict(BASE_ITEM)
        item["links"] = [link, other, dict(link)]
        out = translator(_mk_items([item])).to_pylist()[0]
        # duplicate self collapses to its LAST occurrence: root first
        assert [o["name_en"] for o in out["options"]] == \
            ["Root - CCMEO Datacube API ", "Self - cdem-2021-7"]

    def test_quirk10_derived_from_is_other(self, translator):
        item = dict(BASE_ITEM)
        item["links"] = [{"href": "http://x/d", "rel": "derived_from",
                          "title": "D en"}]
        out = translator(_mk_items([item])).to_pylist()[0]
        assert out["options"][0]["desc_en"] == "Other;Autre;eng"

    def test_quirk5_multi_role_assets_other(self, translator):
        item = dict(BASE_ITEM)
        item["assets"] = [{"name": "m", "href": "s3://x", "type": "image/png",
                           "title": "A/B", "roles": ["data", "metadata"]}]
        out = translator(_mk_items([item])).to_pylist()[0]
        assert out["options"][0]["desc_en"] == "Other;PNG;eng"
        assert out["options"][0]["desc_fr"] == "Autre;PNG;fra"
        assert out["options"][0]["name_en"] == "Asset - A"
        assert out["options"][0]["name_fr"] == "Asset - B"

    def test_unknown_collection_gives_null_titles(self, translator):
        item = dict(BASE_ITEM)
        item["collection_id"] = "never-heard-of-it"
        out = translator(_mk_items([item])).to_pylist()[0]
        assert out["title_en"] is None

    def test_keywords_prefix(self, translator):
        out = translator(_mk_items([BASE_ITEM])).to_pylist()[0]
        assert out["keywords_en"] == "SpatioTemporal Asset Catalog, stac, a, b"
        assert out["keywords_fr"] == "SpatioTemporal Asset Catalog, stac, c"


class TestCollectionFields:
    def test_quirk3_title_without_slash(self):
        en, fr = geocore.split_bilingual("OnlyEnglish", "cid", "cid")
        assert (en, fr) == ("OnlyEnglish", "cid")

    def test_title_null(self):
        assert geocore.split_bilingual(None, "cid", "cid") == ("cid", "cid")

    def test_quirk4_keyword_halving(self):
        assert geocore.halve_keywords(["a", "b", "c"]) == ("a", "b, c")
        assert geocore.halve_keywords(["a", "b", "c", "d"]) == ("a, b", "c, d")
        assert geocore.halve_keywords(["only"]) == ("", "only")
        assert geocore.halve_keywords(None) == (None, None)


class TestRoot:
    def test_quirk7_and_id_normalization(self):
        root_row = {"root_id_raw": "my api root", "root_description": "Desc",
                    "links": []}
        rec = geocore.translate_root(root_row, [-140.0, 43.0, -53.0, 82.0])
        assert rec["id"] == "datacube-root-my-api-root"
        assert rec["title_en"].startswith(" Root  - ")   # reference-exact spacing
        assert rec["temporal_begin"] == "0001-01-01"
        assert rec["description_en"].startswith("Desc.")


class TestTranslatorQuarantine:
    """ItemTranslator on_error="quarantine": a record whose link/asset
    flatten raises is dropped + dead-lettered, not a partition
    failure (the row-local flatten is the translator's only
    record-level failure surface)."""

    def test_poison_row_dropped_and_recorded(self, sf_small):
        import pyarrow.parquet as pq
        from stac_to_geocore_ray.sources import fixtures
        from stac_to_geocore_ray.stages.geocore import (ItemTranslator,
                                                        collection_lookup)
        p = fixtures.paths("/root/testdata/sf0.001")
        import glob
        shard = sorted(glob.glob(p["stac_items"] + "/*.parquet"))[0]
        batch = pq.read_table(shard).slice(0, 8)
        lookup = collection_lookup(pq.read_table(p["collections"]))
        poison_id = batch["item_id"].to_pylist()[3]

        t = ItemTranslator(lookup, on_error="quarantine")
        orig = t.flat.links_to_options

        def flaky(stac_type, links, rec_id, **kw):
            if rec_id == poison_id:
                raise TypeError("malformed link struct")
            return orig(stac_type, links, rec_id, **kw)
        t.flat.links_to_options = flaky

        out = t(batch)
        assert out.num_rows == 7
        assert poison_id not in set(out["item_id"].to_pylist())
        q = t.take_quarantine()
        assert q["item_id"].to_pylist() == [poison_id]
        assert "TypeError" in q["error"].to_pylist()[0]

        # raise-mode: same poison fails the batch
        t2 = ItemTranslator(lookup)
        t2.flat.links_to_options = flaky
        import pytest as _pytest
        with _pytest.raises(TypeError):
            t2(batch)
