"""Declarative translation config (the reference's hardcoded tables as data).

The reference hardcodes mapping tables and constants at module level
(/root/reference/stac-to-geocore/stac_to_geocore.py:7-132) and
per-collection title rules inline (stac_to_geocore.py:602-609).  Here
they are one immutable config object passed to pipeline construction,
so users can override any table without editing engine code
(SURVEY.md §2.9).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from types import MappingProxyType
from typing import Mapping

# GeoCore Data Resources format by STAC media type
# (semantics of stac_to_geocore.py:61-76; note the reference's
# literal 'application/zip ' trailing-space key is preserved).
ASSETS_TYPE: Mapping[str, str] = MappingProxyType({
    "image/tiff; application=geotiff": "TIFF",
    "image/tiff; application=geotiff; profile=cloud-optimized": "TIFF",
    "image/jp2": "JPEG 2000 (JP2)",
    "image/png": "PNG",
    "image/jpeg": "JPEG",
    "text/xml": "XML",
    "application/xml": "XML",
    "application/json": "JSON",
    "text/plain": "TXT",
    "application/geo+json": "GeoJSON",
    "application/geopackage+sqlite3": "GeoPackage (GPKG)",
    "application/x-hdf5": "HDF",
    "application/x-hdf": "HDF",
    "application/zip ": "ZIP",
})

# GeoCore Data Resources type by STAC asset role.  The reference joins
# a multi-role list with ', ' and looks the WHOLE string up, so any
# multi-role asset falls through to "Other" (stac_to_geocore.py:352,358).
ASSETS_ROLE: Mapping[str, str] = MappingProxyType({
    "thumbnail": "Thumbnail",
    "overview": "Overview",
    "data": "Data",
    "metadata": "Metadata",
})

# (type, format) by link rel (stac_to_geocore.py:91-132).  The
# reference's probe key 'derived_ from' (stac_to_geocore.py:276,317)
# never matches its table key 'drived_from' (stac_to_geocore.py:104),
# so derived_from links always resolve to ("Other", "Autre"); we keep
# that behavior by simply not special-casing derived_from at all.
LINKS_REL: Mapping[str, tuple[str, str]] = MappingProxyType({
    "item": ("STAC Item / OGC API - Features", "GeoJSON"),
    "collection": ("STAC Collection", "JSON"),
    "root": ("STAC API", "JSON"),
    "drived_from": ("Supporting Document", "JSON"),
    "license": ("Supporting Document", "JSON"),
    "data": ("STAC Collection", "JSON"),
    "service-desc": ("Supporting Document", "JSON"),
    "service-doc": ("Supporting Document", "HTML"),
    "conformance": ("Supporting Document", "JSON"),
    "search": ("Web Service", "GeoJSON"),
})

DISCLAIMER_EN = (
    "\\n\\n**This third party metadata element follows the Spatio Temporal "
    "Asset Catalog (STAC) specification.**"
)
DISCLAIMER_FR = (
    "\\n\\n**Cet élément de métadonnées tiers suit la spécification Spatio "
    "Temporal Asset Catalog (STAC).** **Cet élément de métadonnées provenant "
    "d’une tierce partie a été traduit à l'aide d'un outil de traduction "
    "automatisée (Amazon Translate).**"
)


@dataclass(frozen=True)
class TranslateConfig:
    """All knobs of the STAC->GeoCore translation (stac_to_geocore.py:7-56)."""

    source: str = "datacube"
    source_system_name: str = "ccmeo-datacube"
    root_name: str = "CCMEO Datacube API / API du Cube de données de CCCOT"
    root_id: str = "root"
    status: str = "unknown"
    maintenance: str = "unknown"
    use_limits_en: str = (
        "Open Government Licence - Canada "
        "http://open.canada.ca/en/open-government-licence-canada"
    )
    use_limits_fr: str = (
        "Licence du gouvernement ouvert - Canada "
        "http://ouvert.canada.ca/fr/licence-du-gouvernement-ouvert-canada"
    )
    spatial_representation: str = "grid; grille"
    type_data: str = "dataset; jeuDonnées"
    topic_category: str = "imageryBaseMapsEarthCover"
    disclaimer_en: str = DISCLAIMER_EN
    disclaimer_fr: str = DISCLAIMER_FR
    # Per-collection item-title rules (stac_to_geocore.py:602-609), as
    # data: collection_id -> one of {"year-title", "monthtoken-title",
    # "year-itemid-title"}.  Anything absent uses "year-title".
    title_rules: Mapping[str, str] = field(default_factory=lambda: MappingProxyType({
        "monthly-vegetation-parameters-20m-v1": "monthtoken-title",
        "hrdem-arcticdem": "year-itemid-title",
        "hrdem-lidar": "year-itemid-title",
    }))
    assets_type: Mapping[str, str] = field(default_factory=lambda: ASSETS_TYPE)
    assets_role: Mapping[str, str] = field(default_factory=lambda: ASSETS_ROLE)
    links_rel: Mapping[str, tuple[str, str]] = field(default_factory=lambda: LINKS_REL)


DEFAULT_CONFIG = TranslateConfig()
