"""Explicit StructTypes for every table the engine touches.

The reference's schemas are fixed by shapefile .dbf sidecars
(``/root/reference/rlis2osm/main.py:67-70``); here they are explicit Spark
StructTypes (SURVEY.md §1.2). Geometry travels as WKB ``BinaryType`` —
columnar-format friendly, splittable, no GIS jar needed.

The engine-native table is the interleaved text+media ``documents`` table
mandated by BASELINE.json ``input_hint``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# RLIS-shaped inputs (FIXTURES.md §1-3; attribute inventory from
# /root/reference/rlis2osm/translate.py:75-84, 246-259, 443-452)
# ---------------------------------------------------------------------------

STREETS_SCHEMA = StructType(
    [
        StructField("fid", LongType(), False),
        StructField("LOCALID", IntegerType(), True),
        StructField("TYPE", IntegerType(), True),
        StructField("PREFIX", StringType(), True),
        StructField("STREETNAME", StringType(), True),
        StructField("FTYPE", StringType(), True),
        StructField("DIRECTION", StringType(), True),
        StructField("F_ZLEV", IntegerType(), True),
        StructField("T_ZLEV", IntegerType(), True),
        StructField("geometry", BinaryType(), True),  # WKB LineString
    ]
)

TRAILS_SCHEMA = StructType(
    [
        StructField("fid", LongType(), False),
        StructField("ACCESSIBLE", StringType(), True),
        StructField("AGENCYNAME", StringType(), True),
        StructField("EQUESTRIAN", StringType(), True),
        StructField("HIKE", StringType(), True),
        StructField("MTNBIKE", StringType(), True),
        StructField("ONSTRBIKE", StringType(), True),
        StructField("ROADBIKE", StringType(), True),
        StructField("SHAREDNAME", StringType(), True),
        StructField("STATUS", StringType(), True),
        StructField("SYSTEMNAME", StringType(), True),
        StructField("SYSTEMTYPE", StringType(), True),
        StructField("TRAILNAME", StringType(), True),
        StructField("TRLSURFACE", StringType(), True),
        StructField("WIDTH", StringType(), True),
        StructField("geometry", BinaryType(), True),  # WKB LineString | MultiLineString
    ]
)

BIKE_ROUTES_SCHEMA = StructType(
    [
        StructField("fid", LongType(), False),
        StructField("BIKEID", LongType(), True),
        StructField("BIKETYP", StringType(), True),
        StructField("BIKETHERE", StringType(), True),
        StructField("geometry", BinaryType(), True),  # WKB LineString
    ]
)

# ---------------------------------------------------------------------------
# OSM-tag output schema of the combine stage
# (union of /root/reference/rlis2osm/translate.py:62-72, 198-214, 425-430,
# sorted by name as at main.py:58)
# ---------------------------------------------------------------------------

STREET_OSM_FIELDS = [
    "access", "bridge", "description", "highway", "layer",
    "name", "service", "surface", "tunnel",
]
TRAIL_OSM_FIELDS = [
    "abandoned:highway", "access", "alt_name", "bicycle", "construction",
    "est_width", "fee", "foot", "highway", "horse", "name", "operator",
    "proposed", "surface", "wheelchair",
]
BIKE_OSM_FIELDS = ["bicycle", "cycleway", "RLIS:bicycle"]

COMBINED_FIELDS = sorted(
    set(STREET_OSM_FIELDS) | set(TRAIL_OSM_FIELDS) | set(BIKE_OSM_FIELDS)
)

# .dbf 10-char key mangling repaired at the sink
# (/root/reference/rlis2osm/repair_keys.py:11-16)
KEY_REPAIR = {
    "abandoned_": "abandoned:highway",
    "constructi": "construction",
    "descriptio": "description",
    "RLIS_bicyc": "RLIS:bicycle",
}

# ---------------------------------------------------------------------------
# Engine-native interleaved-document table (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType(), True),       # 'text' | 'media'
        StructField("text", StringType(), True),       # text payload (kind='text')
        StructField("media_ref", StringType(), True),  # opaque ref (kind='media')
        StructField("offset", IntegerType(), True),    # interleaving order
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_STRUCT), True),
    ]
)

# Sidecar media store: media_ref -> payload (here: WKB geometry). At 100 TB
# this is the "blob table" joined by media_ref; locally a small parquet.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_kind", StringType(), True),  # 'geometry' | 'image' | ...
    ]
)
