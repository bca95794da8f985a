"""Bike-route overlay: tag derivation + broadcast build/probe join with 1:N
fan-out (SURVEY §2.3 T21-T23, §2.4 J1/J2).

Semantics from /root/reference/rlis2osm/translate.py:433-494 (build) and
main.py:94-113 (probe). Spark design: the overlay is orders of magnitude
smaller than the street fact table, so the build side is a
``groupBy(local_id).agg(sort_array(collect_list(struct(...))))`` that gets
**broadcast** — no shuffle of the fact side, and the explicit ``sort_array``
pins the reference's append-order fan-out (fid order) so output rows match
exactly (SURVEY §4.2 #4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def derive_bike_tags(bike: DataFrame) -> DataFrame:
    """T21-T23: BIKETYP/BIKETHERE -> bicycle/cycleway/RLIS:bicycle +
    LOCALID key derivation (last 6 digits of BIKEID, translate.py:490-492)."""
    infra = F.coalesce(F.col("BIKETYP"), F.lit(""))
    there = F.col("BIKETHERE")

    kept = bike.filter(
        # skip rows with neither overlay signal (translate.py:444-447)
        (infra != "") | (there.isNotNull() & (there != ""))
    )

    cycleway = (
        F.when(infra.isin("BKE-BLVD", "BKE-SHRD"), "shared_lane")
        .when(infra.isin("BKE-BUFF", "BKE-LANE"), "lane")
        .when(infra == "BKE-TRAK", "track")
        .when(infra == "SHL-WIDE", "shoulder")
    )
    bicycle = F.when(
        cycleway.isNull()
        & (infra.contains("OTH-") | F.coalesce(there.isin("LT", "MT", "HT"), F.lit(False))),
        F.lit("designated"),
    )
    rlis_bicycle = F.when(there == "CA", F.lit("caution_area"))

    # LOCALID is the last 6 digits of BIKEID (9**-prefix convention for
    # split segments, translate.py:482-491)
    local_id = F.substring(F.col("BIKEID").cast("string"), -6, 6).cast("int")

    return kept.select(
        F.col("fid").alias("bike_fid"),
        local_id.alias("local_id"),
        bicycle.alias("bicycle"),
        cycleway.alias("cycleway"),
        rlis_bicycle.alias("rlis_bicycle"),
        F.col("geometry").alias("bike_geometry"),
    )


def build_bike_mapping(bike: DataFrame) -> DataFrame:
    """J1: build side — one row per LOCALID with the fid-ordered list of
    overlay structs (defaultdict(list) at translate.py:439,492)."""
    tagged = derive_bike_tags(bike)
    return tagged.groupBy("local_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct("bike_fid", "bicycle", "cycleway", "rlis_bicycle",
                         "bike_geometry")
            )
        ).alias("bike_list")
    )


def apply_bike_overlay(streets_osm: DataFrame, bike: DataFrame) -> DataFrame:
    """J2: probe + 1:N fan-out + geometry substitution (main.py:94-113).

    - 0 overlay matches -> one row, bike tags null, street geometry kept;
    - 1 match           -> one row, bike tags merged, street geometry kept;
    - N>1 matches       -> N rows, bike tags per match, **bike geometry
                           substituted** (main.py:106-109).
    """
    mapping = build_bike_mapping(bike)
    joined = streets_osm.join(
        F.broadcast(mapping),
        streets_osm["LOCALID"] == mapping["local_id"],
        "left",
    ).drop("local_id")

    n_matches = F.coalesce(F.size("bike_list"), F.lit(0))
    exploded = joined.select(
        "*",
        F.posexplode_outer("bike_list").alias("overlay_idx", "bf"),
        n_matches.alias("_n_bike"),
    ).drop("bike_list")

    return (
        exploded.withColumns(
            {
                "overlay_idx": F.coalesce(F.col("overlay_idx"), F.lit(0)),
                "bicycle": F.col("bf.bicycle"),
                "cycleway": F.col("bf.cycleway"),
                "RLIS:bicycle": F.col("bf.rlis_bicycle"),
                "geometry": F.when(
                    F.col("_n_bike") > 1, F.col("bf.bike_geometry")
                ).otherwise(F.col("geometry")),
            }
        )
        .drop("bf", "_n_bike")
    )
