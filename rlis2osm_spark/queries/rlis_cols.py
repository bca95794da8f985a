"""RLIS translation operators exercised over deterministically-derived
inputs from the oracle views, so every column-level operator from SURVEY §2
gets an exact DuckDB cross-check (the RLIS-shaped tables themselves are not
registered in the driver's oracle).

Both sides derive identical synthetic attribute columns from integer keys
(list indexing by ``key % n`` — 1-based in Spark ``element_at`` and DuckDB
``list[i]`` alike), then apply: the Spark side uses the *real engine
operators* (operators/streets.py, operators/trails.py, operators/bike.py);
the SQL side is an independent CASE-expression transcription of the
reference semantics (translate.py). Agreement = operator parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rlis2osm_spark.operators.bike import derive_bike_tags
from rlis2osm_spark.operators.streets import (
    ACCESS_BY_TYPE,
    HIGHWAY_BY_TYPE,
    SERVICE_BY_TYPE,
    SURFACE_BY_TYPE,
    layer_expr,
)
from rlis2osm_spark.operators.trails import keep_trail, translate_trails
from rlis2osm_spark.functions.expand import (
    DIRECTION_EXPANSIONS,
    TYPE_EXPANSIONS,
    expand_direction,
    expand_type,
)
from rlis2osm_spark.queries.util import (
    case_int_map,
    case_map,
    load,
    pick,
    pick_int,
    spark_int_map,
    sql_int_list,
    sql_str_list,
)

# shared synthetic domains (FIXTURES.md §1-3)
DIRS = ["N", "NE", "E", "SE", "S", "SW", "W", "NW", "NB", "EB", "SB", "WB", None]
FTYPES = ["AVE", "ST", "BLVD", "HWY", "CT", "DR", "LN", "PKWY", "RD", "WY", None]
TYPES = sorted(HIGHWAY_BY_TYPE)
ZLEVS = [None, None, None, 1, 1, 2, 3, -1, -2]
YNN = ["Yes", "No", None]
STATUSES = ["Open", "Open_Fee", "Restricted_Private", "Unknown", "Conceptual",
            "Decommissioned", "Planned", "Under construction", None]
SURFACES = ["Chunk Wood", "Decking", "Hard Surface", "Imported Material",
            "Native Material", "Snow", "Stairs", "Water", "Unknown", None]
WIDTHS = ["1-5", "6-9", "10-14", "15+", "5", "Unknown", None]
SYSTYPES = ["Regional", "State", "National", "Local", "Park", None]
NAMES = ["FOREST", "RIVER", "CEDAR", "MEADOW", None]
AGENCIES = ["Metro", "Portland Parks", "Unknown", None]
BIKETYPS = ["BKE-BLVD", "BKE-SHRD", "BKE-BUFF", "BKE-LANE", "BKE-TRAK",
            "SHL-WIDE", "OTH-CONN", "OTH-SWLK", "OTH-XING", "", None]
BIKETHERES = ["LT", "MT", "HT", "CA", None]


# ---------------------------------------------------------------------------
# P1-P3: whole-value expansions
# ---------------------------------------------------------------------------

def p1_p2_expand(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    prefix = pick(DIRS, 1 + F.col("p_partkey") % 13)
    ftype = pick(FTYPES, 1 + F.col("p_partkey") % 11)
    return part.select(
        "p_partkey",
        prefix.alias("prefix_raw"),
        expand_direction(prefix).alias("prefix"),
        ftype.alias("ftype_raw"),
        expand_type(ftype).alias("ftype"),
        # P3: unknown value falls through unchanged
        expand_type(F.lit("ZZ")).alias("unknown_passthrough"),
    )


_P12_SQL = f"""
WITH d AS (
  SELECT p_partkey,
         {sql_str_list(DIRS)}[1 + p_partkey % 13] AS prefix_raw,
         {sql_str_list(FTYPES)}[1 + p_partkey % 11] AS ftype_raw
  FROM part
)
SELECT p_partkey, prefix_raw,
  COALESCE({case_map(DIRECTION_EXPANSIONS, "UPPER(COALESCE(prefix_raw, ''))")}, prefix_raw) AS prefix,
  ftype_raw,
  COALESCE({case_map(TYPE_EXPANSIONS, "UPPER(COALESCE(ftype_raw, ''))")}, ftype_raw) AS ftype,
  'ZZ' AS unknown_passthrough
FROM d
"""


# ---------------------------------------------------------------------------
# T1-T5: TYPE -> tag maps
# ---------------------------------------------------------------------------

def t_code_maps(spark, sf_dir):
    """T1-T5 code maps + T6-T9 name concat / unnamed-null / residential
    downgrade / link-description rules, all in ONE projection over a single
    part scan (r3: absorbs the former ``t6_t9_names`` — same source table,
    zero extra shuffle)."""
    part = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    t = pick_int(TYPES, 1 + k % len(TYPES))
    df = part.select(
        "p_partkey", t.alias("type"),
        pick(DIRS, 1 + k % 13).alias("prefix"),
        F.when(k % 17 == 0, F.lit("UNNAMED"))
        .when(k % 19 == 0, F.lit(None).cast("string"))
        .otherwise(F.upper(F.col("p_name"))).alias("streetname"),
        pick(FTYPES, 1 + k % 11).alias("ftype"),
    )
    name0 = F.when(
        F.col("streetname").isNull() | (F.lower(F.col("streetname")) == "unnamed"),
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat_ws(" ", *[F.nullif(F.col(c), F.lit("")) for c in
                           ("prefix", "streetname", "ftype")])
    )
    hw0 = F.element_at(spark_int_map(HIGHWAY_BY_TYPE), F.col("type"))
    hw = F.when((hw0 == "residential") & name0.isNull(),
                F.lit("service")).otherwise(hw0)
    is_link = hw0.contains("_link")
    return df.select(
        "p_partkey", "type",
        F.element_at(spark_int_map(ACCESS_BY_TYPE), F.col("type")).alias("access"),
        F.element_at(spark_int_map(SERVICE_BY_TYPE), F.col("type")).alias("service"),
        F.element_at(spark_int_map(SURFACE_BY_TYPE), F.col("type")).alias("surface"),
        F.when(is_link, F.lit(None).cast("string")).otherwise(name0).alias("name"),
        F.when(is_link, name0).alias("description"),
        hw.alias("highway"),
    )


_TCODE_SQL = f"""
WITH d AS (
  SELECT p_partkey,
         {sql_int_list(TYPES)}[1 + p_partkey % {len(TYPES)}] AS type,
         {sql_str_list(DIRS)}[1 + p_partkey % 13] AS prefix,
         CASE WHEN p_partkey % 17 = 0 THEN 'UNNAMED'
              WHEN p_partkey % 19 = 0 THEN NULL
              ELSE UPPER(p_name) END AS streetname,
         {sql_str_list(FTYPES)}[1 + p_partkey % 11] AS ftype
  FROM part
), n AS (
  SELECT *,
    CASE WHEN streetname IS NULL OR LOWER(streetname) = 'unnamed' THEN NULL
         ELSE CONCAT_WS(' ', NULLIF(prefix, ''), NULLIF(streetname, ''), NULLIF(ftype, ''))
    END AS name0,
    {case_int_map(HIGHWAY_BY_TYPE, "type")} AS hw0
  FROM d
)
SELECT p_partkey, type,
  {case_int_map(ACCESS_BY_TYPE, "type")} AS access,
  {case_int_map(SERVICE_BY_TYPE, "type")} AS service,
  {case_int_map(SURFACE_BY_TYPE, "type")} AS surface,
  CASE WHEN hw0 LIKE '%\\_link%' ESCAPE '\\' THEN NULL ELSE name0 END AS name,
  CASE WHEN hw0 LIKE '%\\_link%' ESCAPE '\\' THEN name0 END AS description,
  CASE WHEN hw0 = 'residential' AND name0 IS NULL THEN 'service' ELSE hw0 END AS highway
FROM n
"""


# ---------------------------------------------------------------------------
# T10/T11: z-levels -> layer/bridge/tunnel
# ---------------------------------------------------------------------------

def t10_layer(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    df = orders.select(
        "o_orderkey",
        pick_int(ZLEVS, 1 + F.col("o_orderkey") % 9).alias("f_zlev"),
        pick_int(ZLEVS, 1 + F.expr("o_orderkey div 9") % 9).alias("t_zlev"),
    )
    layer = layer_expr(F.col("f_zlev"), F.col("t_zlev"))
    return df.select(
        "o_orderkey", "f_zlev", "t_zlev",
        layer.cast("int").alias("layer"),
        F.when(layer > 0, F.lit("yes")).alias("bridge"),
        F.when(layer < 0, F.lit("yes")).alias("tunnel"),
    )


_T10_SQL = f"""
WITH d AS (
  SELECT o_orderkey,
         {sql_int_list(ZLEVS)}[1 + o_orderkey % 9] AS f_zlev,
         {sql_int_list(ZLEVS)}[1 + (o_orderkey // 9) % 9] AS t_zlev
  FROM orders
), z AS (
  SELECT *,
    CASE WHEN f_zlev IS NULL OR f_zlev = 0 THEN 1 ELSE f_zlev END AS fz,
    CASE WHEN t_zlev IS NULL OR t_zlev = 0 THEN 1 ELSE t_zlev END AS tz
  FROM d
), l AS (
  SELECT *,
    CASE WHEN fz = tz THEN (CASE WHEN fz > 1 THEN fz - 1 WHEN fz < 0 THEN fz END)
         WHEN GREATEST(fz, tz) > 1 THEN GREATEST(fz, tz) - 1
         WHEN GREATEST(fz, tz) < 0 THEN LEAST(fz, tz)
    END AS layer
  FROM z
)
SELECT o_orderkey, f_zlev, t_zlev, CAST(layer AS INT) AS layer,
       CASE WHEN layer > 0 THEN 'yes' END AS bridge,
       CASE WHEN layer < 0 THEN 'yes' END AS tunnel
FROM l
"""


# ---------------------------------------------------------------------------
# T13-T20: full trail translation through the real operator
# ---------------------------------------------------------------------------

def _derived_trails(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    k = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("tkey")
    df = li.select(
        k,
        pick(YNN, 1 + F.col("l_orderkey") % 3).alias("EQUESTRIAN"),
        pick(YNN, 1 + F.expr("l_orderkey div 3") % 3).alias("HIKE"),
        pick(YNN, 1 + F.expr("l_orderkey div 9") % 3).alias("MTNBIKE"),
        pick(YNN, 1 + F.expr("l_orderkey div 27") % 3).alias("ROADBIKE"),
        pick(YNN, 1 + F.expr("l_orderkey div 81") % 3).alias("ONSTRBIKE"),
        pick(STATUSES, 1 + F.col("l_orderkey") % 9).alias("STATUS"),
        pick(SURFACES, 1 + F.col("l_orderkey") % 10).alias("TRLSURFACE"),
        pick(WIDTHS, 1 + F.col("l_orderkey") % 7).alias("WIDTH"),
        pick(SYSTYPES, 1 + F.col("l_orderkey") % 6).alias("SYSTEMTYPE"),
        pick(NAMES, 1 + F.col("l_orderkey") % 5).alias("TRAILNAME"),
        pick(NAMES, 1 + F.expr("l_orderkey div 5") % 5).alias("SHAREDNAME"),
        pick(NAMES, 1 + F.expr("l_orderkey div 25") % 5).alias("SYSTEMNAME"),
        pick(AGENCIES, 1 + F.col("l_orderkey") % 4).alias("AGENCYNAME"),
        pick(["Accessible", "Not Accessible", None],
             1 + F.col("l_orderkey") % 3).alias("ACCESSIBLE"),
    )
    return df


_DERIVED_TRAILS_SQL = f"""
  SELECT l_orderkey * 10 + l_linenumber AS tkey,
         {sql_str_list(YNN)}[1 + l_orderkey % 3] AS equestrian,
         {sql_str_list(YNN)}[1 + (l_orderkey // 3) % 3] AS hike,
         {sql_str_list(YNN)}[1 + (l_orderkey // 9) % 3] AS mtnbike,
         {sql_str_list(YNN)}[1 + (l_orderkey // 27) % 3] AS roadbike,
         {sql_str_list(YNN)}[1 + (l_orderkey // 81) % 3] AS onstrbike,
         {sql_str_list(STATUSES)}[1 + l_orderkey % 9] AS status,
         {sql_str_list(SURFACES)}[1 + l_orderkey % 10] AS trlsurface,
         {sql_str_list(WIDTHS)}[1 + l_orderkey % 7] AS width,
         {sql_str_list(SYSTYPES)}[1 + l_orderkey % 6] AS systemtype,
         {sql_str_list(NAMES)}[1 + l_orderkey % 5] AS trailname,
         {sql_str_list(NAMES)}[1 + (l_orderkey // 5) % 5] AS sharedname,
         {sql_str_list(NAMES)}[1 + (l_orderkey // 25) % 5] AS systemname,
         {sql_str_list(AGENCIES)}[1 + l_orderkey % 4] AS agencyname,
         {sql_str_list(["Accessible", "Not Accessible", None])}[1 + l_orderkey % 3] AS accessible
  FROM lineitem WHERE l_linenumber <= 2
"""


def t13_t20_trails(spark, sf_dir):
    df = _derived_trails(spark, sf_dir).withColumns(
        {"fid": F.col("tkey"), "geometry": F.lit(None).cast("binary")}
    )
    out = translate_trails(keep_trail(df))
    return out.select(
        "tkey",
        F.col("`abandoned:highway`").alias("abandoned_highway"),
        "access", "alt_name", "bicycle", "construction", "est_width", "fee",
        "foot", "highway", "horse", "name", "operator", "proposed",
        "surface", "wheelchair",
    )


_T1320_SQL = f"""
WITH d AS ({_DERIVED_TRAILS_SQL}),
kept AS (
  SELECT * FROM d
  WHERE NOT COALESCE(onstrbike = 'Yes' OR status = 'Conceptual' OR trlsurface = 'Water', FALSE)
),
w AS (
  SELECT *,
    CASE WHEN width IS NULL OR width = '' THEN NULL
         WHEN position('-' IN width) > 0 THEN
           (CAST(string_split(width, '-')[1] AS DOUBLE) + CAST(string_split(width, '-')[2] AS DOUBLE)) / 2
         WHEN position('+' IN width) > 0 THEN CAST(replace(width, '+', '') AS DOUBLE) * 1.25
         ELSE NULL END AS temp_w
  FROM kept
),
ew AS (
  SELECT *,
    CASE WHEN temp_w IS NOT NULL AND temp_w <> 0.0 THEN
      regexp_replace(CAST(FLOOR(temp_w * 0.3048 / 0.25 + 0.5) * 0.25 AS VARCHAR), '\\.0$', '')
    END AS est_width
  FROM w
),
b AS (
  SELECT *,
    COALESCE(CAST(est_width AS DOUBLE), 0.0) AS fw,
    COALESCE(roadbike = 'Yes' AND (COALESCE(CAST(est_width AS DOUBLE), 0.0) > 3.0
             OR systemtype IN ('Regional', 'State', 'National')), FALSE) AS bike_desig
  FROM ew
),
m AS (
  SELECT *,
    (CASE WHEN equestrian = 'Yes' THEN 1 ELSE 0 END
     + CASE WHEN hike = 'Yes' THEN 1 ELSE 0 END
     + CASE WHEN mtnbike = 'Yes' THEN 1 ELSE 0 END
     + CASE WHEN bike_desig THEN 1 ELSE 0 END) >= 2 AS multi,
    COALESCE(trlsurface = 'Stairs', FALSE) AS stairs
  FROM b
),
hw AS (
  SELECT *,
    CASE WHEN stairs THEN 'steps'
         WHEN multi THEN 'path'
         WHEN bike_desig THEN 'cycleway'
         WHEN mtnbike = 'Yes' THEN 'path'
         WHEN equestrian = 'Yes' THEN 'bridleway'
         ELSE 'footway' END AS hw0,
    multi AND NOT stairs AS in_multi
  FROM m
),
tags AS (
  SELECT *,
    CASE WHEN in_multi THEN
      CASE WHEN equestrian = 'Yes' THEN 'designated' WHEN equestrian = 'No' THEN 'no' END
    END AS horse,
    CASE WHEN hike = 'No' THEN 'no'
         WHEN in_multi AND hike IS NOT NULL AND hike <> '' THEN 'designated'
    END AS foot,
    CASE WHEN COALESCE((mtnbike = 'No' AND COALESCE(roadbike, '') <> 'Yes')
              OR (roadbike = 'No' AND COALESCE(mtnbike, '') <> 'Yes'), FALSE) THEN 'no'
         WHEN in_multi AND ((roadbike IS NOT NULL AND roadbike <> '')
                            OR (mtnbike IS NOT NULL AND mtnbike <> '')) THEN 'designated'
         WHEN NOT stairs AND NOT multi AND NOT bike_desig
              AND COALESCE(mtnbike = 'Yes', FALSE) THEN 'designated'
         WHEN NOT stairs AND NOT multi AND NOT bike_desig
              AND NOT COALESCE(mtnbike = 'Yes', FALSE)
              AND NOT COALESCE(equestrian = 'Yes', FALSE)
              AND COALESCE(roadbike = 'Yes', FALSE) THEN 'yes'
    END AS bicycle
  FROM hw
),
nm AS (
  SELECT *,
    COALESCE(NULLIF(trailname, ''), NULLIF(sharedname, ''), systemname) AS name,
    CASE WHEN sharedname IS NOT NULL AND sharedname <> ''
              AND sharedname <> COALESCE(NULLIF(trailname, ''), NULLIF(sharedname, ''), systemname)
         THEN sharedname
         WHEN systemname IS NOT NULL AND systemname <> ''
              AND systemname <> COALESCE(NULLIF(trailname, ''), NULLIF(sharedname, ''), systemname)
         THEN systemname
    END AS alt_name,
    CASE WHEN agencyname <> 'Unknown' THEN agencyname END AS operator
  FROM tags
)
SELECT tkey,
  CASE WHEN status = 'Decommissioned' THEN hw0 END AS abandoned_highway,
  {case_map({"Restricted_Private": "private", "Unknown": "unknown"}, "status")} AS access,
  alt_name, bicycle,
  CASE WHEN status = 'Under construction' THEN hw0 END AS construction,
  est_width,
  {case_map({"Open_Fee": "yes"}, "status")} AS fee,
  foot,
  CASE WHEN status = 'Decommissioned' THEN NULL
       WHEN status = 'Planned' THEN 'proposed'
       WHEN status = 'Under construction' THEN 'construction'
       ELSE hw0 END AS highway,
  horse, name, operator,
  CASE WHEN status = 'Planned' THEN hw0 END AS proposed,
  {case_map({"Chunk Wood": "woodchips", "Decking": "wood", "Hard Surface": "paved",
             "Imported Material": "compacted", "Native Material": "ground",
             "Snow": "snow"}, "trlsurface")} AS surface,
  {case_map({"Accessible": "yes", "Not Accessible": "no"}, "accessible")} AS wheelchair
FROM nm
"""


# ---------------------------------------------------------------------------
# T21-T23 + J1/J2: bike tags + broadcast overlay fan-out
# ---------------------------------------------------------------------------

def t21_bike_tags(spark, sf_dir):
    supp = load(spark, sf_dir, "supplier")
    df = supp.select(
        F.col("s_suppkey").alias("fid"),
        (F.lit(900_000_000) + 100_000 + F.col("s_suppkey") % 900_000).alias("BIKEID"),
        pick(BIKETYPS, 1 + F.col("s_suppkey") % 11).alias("BIKETYP"),
        pick(BIKETHERES, 1 + F.expr("s_suppkey div 11") % 5).alias("BIKETHERE"),
        F.lit(None).cast("binary").alias("geometry"),
    )
    return derive_bike_tags(df).select(
        "bike_fid", "local_id", "bicycle", "cycleway", "rlis_bicycle")


_T21_SQL = f"""
WITH d AS (
  SELECT s_suppkey AS bike_fid,
         900000000 + 100000 + s_suppkey % 900000 AS bikeid,
         {sql_str_list(BIKETYPS)}[1 + s_suppkey % 11] AS biketyp,
         {sql_str_list(BIKETHERES)}[1 + (s_suppkey // 11) % 5] AS bikethere
  FROM supplier
), kept AS (
  SELECT *, COALESCE(biketyp, '') AS infra FROM d
  WHERE COALESCE(biketyp, '') <> '' OR (bikethere IS NOT NULL AND bikethere <> '')
), tagged AS (
  SELECT *,
    CASE WHEN infra IN ('BKE-BLVD', 'BKE-SHRD') THEN 'shared_lane'
         WHEN infra IN ('BKE-BUFF', 'BKE-LANE') THEN 'lane'
         WHEN infra = 'BKE-TRAK' THEN 'track'
         WHEN infra = 'SHL-WIDE' THEN 'shoulder' END AS cycleway
  FROM kept
)
SELECT bike_fid,
       CAST(substr(CAST(bikeid AS VARCHAR), -6) AS INT) AS local_id,
       CASE WHEN cycleway IS NULL AND (position('OTH-' IN infra) > 0
            OR COALESCE(bikethere IN ('LT', 'MT', 'HT'), FALSE)) THEN 'designated'
       END AS bicycle,
       cycleway,
       CASE WHEN bikethere = 'CA' THEN 'caution_area' END AS rlis_bicycle
FROM tagged
"""


def j2_overlay_fanout(spark, sf_dir):
    """J1/J2 shape on oracle tables: orders = fact, lineitem = overlay.
    1:N fan-out with the >1-match geometry substitution rule."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 == 0)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    overlay = li.select(
        "l_orderkey",
        F.col("l_linenumber").alias("seg"),
        pick(["lane", "track", "shoulder"], 1 + F.col("l_linenumber") % 3)
        .alias("cycleway"),
        F.concat(F.lit("B:"), F.col("l_orderkey"), F.lit(":"),
                 F.col("l_linenumber")).alias("bike_geom"),
    )
    agg = overlay.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct("seg", "cycleway", "bike_geom")))
        .alias("lst"))
    # r7 (guide §3.1): here the overlay aggregate scales WITH the fact
    # (one group per order), so broadcasting it is wrong at scale and
    # locally pays a single-threaded multi-100MB hash-relation build per
    # run; a shuffled-hash join builds per-partition in parallel. The
    # genuinely-small-build broadcast shape stays demonstrated by the
    # real bike overlay operator (operators/bike.py).
    j = orders.join(agg.hint("shuffle_hash"),
                    orders.o_orderkey == agg.l_orderkey, "left")
    n = F.coalesce(F.size("lst"), F.lit(0))
    out = j.select(
        "o_orderkey",
        F.concat(F.lit("S:"), F.col("o_orderkey")).alias("street_geom"),
        n.alias("n_matches"),
        F.posexplode_outer("lst").alias("part_idx", "bf"),
    )
    return out.select(
        "o_orderkey",
        F.coalesce(F.col("part_idx"), F.lit(0)).alias("part_idx"),
        F.col("bf.cycleway").alias("cycleway"),
        F.when(F.col("n_matches") > 1, F.col("bf.bike_geom"))
        .otherwise(F.col("street_geom")).alias("geom"),
    )


_J2_SQL = f"""
WITH o AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0),
ov AS (
  SELECT l_orderkey, l_linenumber AS seg,
         {sql_str_list(["lane", "track", "shoulder"])}[1 + l_linenumber % 3] AS cycleway,
         'B:' || l_orderkey || ':' || l_linenumber AS bike_geom
  FROM lineitem WHERE l_linenumber <= 2
),
j AS (
  SELECT o.o_orderkey, ov.seg, ov.cycleway, ov.bike_geom,
         COUNT(ov.seg) OVER (PARTITION BY o.o_orderkey) AS n_matches,
         ROW_NUMBER() OVER (PARTITION BY o.o_orderkey ORDER BY ov.seg NULLS FIRST) - 1 AS part_idx
  FROM o LEFT JOIN ov ON o.o_orderkey = ov.l_orderkey
)
SELECT o_orderkey, part_idx, cycleway,
       CASE WHEN n_matches > 1 THEN bike_geom ELSE 'S:' || o_orderkey END AS geom
FROM j
"""


# ---------------------------------------------------------------------------
# J3: endpoint self-join / node adjacency
# ---------------------------------------------------------------------------

def j3_node_adjacency(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    seg = li.select(
        F.col("l_orderkey").alias("way_id"),
        (F.col("l_orderkey") % 500).alias("f_node"),
        ((F.col("l_orderkey") * 31 + 7) % 500).alias("t_node"),
    )
    nodes = seg.select(
        "way_id", F.explode(F.array("f_node", "t_node")).alias("node"))
    return (
        nodes.groupBy("node")
        .agg(F.count("*").alias("degree"),
             F.min("way_id").alias("min_way"))
        .filter(F.col("degree") >= 2)
    )


_J3_SQL = """
WITH seg AS (
  SELECT l_orderkey AS way_id, l_orderkey % 500 AS f_node,
         (l_orderkey * 31 + 7) % 500 AS t_node
  FROM lineitem WHERE l_linenumber = 1
),
nodes AS (
  SELECT way_id, f_node AS node FROM seg
  UNION ALL
  SELECT way_id, t_node AS node FROM seg
)
SELECT node, COUNT(*) AS degree, MIN(way_id) AS min_way
FROM nodes GROUP BY node HAVING COUNT(*) >= 2
"""


QUERIES = {
    "p1_p2_expand": p1_p2_expand,
    "t_code_maps": t_code_maps,
    "t10_layer": t10_layer,
    "t13_t20_trails": t13_t20_trails,
    "t21_bike_tags": t21_bike_tags,
    "j2_overlay_fanout": j2_overlay_fanout,
    "j3_node_adjacency": j3_node_adjacency,
}

ORACLES = {
    "p1_p2_expand": _P12_SQL,
    "t_code_maps": _TCODE_SQL,
    "t10_layer": _T10_SQL,
    "t13_t20_trails": _T1320_SQL,
    "t21_bike_tags": _T21_SQL,
    "j2_overlay_fanout": _J2_SQL,
    "j3_node_adjacency": _J3_SQL,
}
