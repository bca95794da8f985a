"""Golden tests for bike overlay join J1/J2 + fan-out (FIXTURES.md §6.4) and
the combine stage U1/E1 (reference main.py:47-142)."""

import pandas as pd
from pyspark.sql import functions as F

from rlis2osm_spark.functions.wkb import (
    decode_linestring,
    encode_linestring,
    encode_multilinestring,
)
from rlis2osm_spark.operators.bike import apply_bike_overlay, derive_bike_tags
from rlis2osm_spark.operators.combine import combine, explode_multipart
from rlis2osm_spark.operators.streets import expand_street_names, translate_streets
from rlis2osm_spark.schemas import COMBINED_FIELDS

STREET_SCHEMA = ("fid long, LOCALID int, TYPE int, PREFIX string, "
                 "STREETNAME string, FTYPE string, DIRECTION string, "
                 "F_ZLEV int, T_ZLEV int, geometry binary")
BIKE_SCHEMA = "fid long, BIKEID long, BIKETYP string, BIKETHERE string, geometry binary"

TRAIL_COLS = ["ACCESSIBLE", "AGENCYNAME", "EQUESTRIAN", "HIKE", "MTNBIKE",
              "ONSTRBIKE", "ROADBIKE", "SHAREDNAME", "STATUS", "SYSTEMNAME",
              "SYSTEMTYPE", "TRAILNAME", "TRLSURFACE", "WIDTH"]
TRAIL_SCHEMA = ("fid long, " + ", ".join(f"{c} string" for c in TRAIL_COLS)
                + ", geometry binary")


def _streets(spark, rows):
    return spark.createDataFrame(rows, schema=STREET_SCHEMA)


def _bikes(spark, rows):
    return spark.createDataFrame(rows, schema=BIKE_SCHEMA)


def _geom(x0):
    return encode_linestring([(x0, 0.0), (x0 + 100.0, 0.0)])


def test_bike_tag_derivation(spark):
    bikes = _bikes(spark, [
        (0, 100001, "BKE-LANE", None, _geom(0)),
        (1, 100002, "OTH-SWLK", None, _geom(1)),
        (2, 100003, None, "HT", _geom(2)),
        (3, 100004, None, "CA", _geom(3)),
        (4, 100005, "", None, _geom(4)),          # ignored: no signal
        (5, 900123456, "BKE-TRAK", None, _geom(5)),
    ])
    out = {r.bike_fid: r for r in derive_bike_tags(bikes).collect()}
    assert out[0].cycleway == "lane" and out[0].bicycle is None
    assert out[1].bicycle == "designated"
    assert out[2].bicycle == "designated"
    assert out[3].rlis_bicycle == "caution_area" and out[3].bicycle is None
    assert 4 not in out  # empty-overlay filter (T23)
    assert out[5].local_id == 123456  # BIKEID -> last-6-digit LOCALID (T22)


def test_fanout_semantics(spark):
    streets = _streets(spark, [
        (0, 111111, 1500, None, "OAK", "ST", None, None, None, _geom(0)),
        (1, 222222, 1500, None, "ELM", "ST", None, None, None, _geom(10)),
        (2, 333333, 1500, None, "ASH", "ST", None, None, None, _geom(20)),
    ])
    bikes = _bikes(spark, [
        # one match for 222222: tags merged, street geometry KEPT
        (0, 222222, "BKE-LANE", None, _geom(100)),
        # two matches for 333333: 2 rows, bike geometry SUBSTITUTED
        (1, 900333333, "BKE-BLVD", None, _geom(200)),
        (2, 901333333, None, "CA", _geom(300)),
    ])
    osm = translate_streets(expand_street_names(streets))
    out = apply_bike_overlay(osm, bikes)
    got = out.collect()
    by_lid = {}
    for r in got:
        by_lid.setdefault(r.LOCALID, []).append(r)

    assert len(by_lid[111111]) == 1
    assert by_lid[111111][0].cycleway is None
    assert decode_linestring(bytes(by_lid[111111][0].geometry))[0][0] == 0.0

    assert len(by_lid[222222]) == 1
    assert by_lid[222222][0].cycleway == "lane"
    # single match keeps the STREET geometry (x0=10), not the bike's (x0=100)
    assert decode_linestring(bytes(by_lid[222222][0].geometry))[0][0] == 10.0

    assert len(by_lid[333333]) == 2
    xs = sorted(decode_linestring(bytes(r.geometry))[0][0] for r in by_lid[333333])
    assert xs == [200.0, 300.0]  # bike geometries substituted
    cy = sorted(str(r.cycleway) for r in by_lid[333333])
    assert cy == ["None", "shared_lane"]


def test_fanout_order_deterministic(spark):
    """Emission order must be fid order (sort_array pins append order)."""
    streets = _streets(spark, [
        (0, 444444, 1500, None, "OAK", None, None, None, None, _geom(0))])
    bikes = _bikes(spark, [
        (7, 900444444, "BKE-LANE", None, _geom(1)),
        (3, 901444444, "BKE-TRAK", None, _geom(2)),
    ])
    osm = translate_streets(expand_street_names(streets))
    lists = apply_bike_overlay(osm, bikes).select("cycleway").collect()
    # fid 3 (track) sorts before fid 7 (lane)
    assert [r.cycleway for r in lists] == ["track", "lane"]


def test_explode_multipart(spark):
    multi = encode_multilinestring(
        [[(0.0, 0.0), (1.0, 0.0)], [(1.0, 0.0), (2.0, 0.0)]])
    single = encode_linestring([(5.0, 5.0), (6.0, 5.0)])
    df = spark.createDataFrame(
        [(0, multi), (1, single)], schema="fid long, geometry binary")
    out = explode_multipart(df).orderBy("fid", "part_idx").collect()
    assert [(r.fid, r.part_idx) for r in out] == [(0, 0), (0, 1), (1, 0)]
    assert decode_linestring(bytes(out[1].geometry))[0][0] == 1.0


def test_combine_schema_and_union(spark, synth_dir):
    streets = spark.read.parquet(f"{synth_dir}/streets.parquet")
    trails = spark.read.parquet(f"{synth_dir}/trails.parquet")
    bikes = spark.read.parquet(f"{synth_dir}/bike_routes.parquet")
    out = combine(streets, trails, bikes)
    assert out.columns == ["src_table", "fid", "part_idx"] + COMBINED_FIELDS + ["geometry"]
    n = out.count()
    assert n > streets.count() * 0.9  # fan-out adds, trail drop removes
    # streets rows always have non-null highway unless decommissioned (trails only)
    assert out.filter((F.col("src_table") == "streets")
                      & F.col("highway").isNull()).count() == 0
    # trails never carry street-only tags
    assert out.filter((F.col("src_table") == "trails")
                      & F.col("bridge").isNotNull()).count() == 0
