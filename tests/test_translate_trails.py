"""Golden tests for trail translation T13-T20 (FIXTURES.md §6.3; reference
translate.py:245-422)."""

import pandas as pd
import pytest

from rlis2osm_spark.operators.trails import (
    expand_trail_names,
    keep_trail,
    translate_trails,
)

COLS = ["ACCESSIBLE", "AGENCYNAME", "EQUESTRIAN", "HIKE", "MTNBIKE",
        "ONSTRBIKE", "ROADBIKE", "SHAREDNAME", "STATUS", "SYSTEMNAME",
        "SYSTEMTYPE", "TRAILNAME", "TRLSURFACE", "WIDTH"]


def _trails_df(spark, rows):
    pdf = pd.DataFrame([{**{c: None for c in COLS}, **r} for r in rows])[COLS]
    pdf.insert(0, "fid", range(len(rows)))
    pdf["geometry"] = None
    schema = ("fid long, " + ", ".join(f"{c} string" for c in COLS)
              + ", geometry binary")
    return spark.createDataFrame(pdf, schema=schema)


def _one(spark, **attrs):
    df = _trails_df(spark, [attrs])
    out = translate_trails(keep_trail(expand_trail_names(df)))
    rows = out.collect()
    return rows[0].asDict() if rows else None


def test_drop_filter(spark):
    df = _trails_df(spark, [
        {"ONSTRBIKE": "Yes"},
        {"STATUS": "Conceptual"},
        {"TRLSURFACE": "Water"},
        {"TRAILNAME": "KEEP ME"},
    ])
    kept = keep_trail(df).collect()
    assert len(kept) == 1 and kept[0].TRAILNAME == "KEEP ME"


def test_stairs(spark):
    assert _one(spark, TRLSURFACE="Stairs")["highway"] == "steps"


def test_multi_mode_path(spark):
    r = _one(spark, HIKE="Yes", EQUESTRIAN="Yes")
    assert r["highway"] == "path"
    assert r["foot"] == "designated"
    assert r["horse"] == "designated"
    assert r["bicycle"] is None


def test_bike_designated_cycleway(spark):
    r = _one(spark, ROADBIKE="Yes", SYSTEMTYPE="Regional", WIDTH="6-9")
    assert r["highway"] == "cycleway"
    assert r["est_width"] == "2.25"


def test_bridleway_and_footway(spark):
    assert _one(spark, EQUESTRIAN="Yes")["highway"] == "bridleway"
    r = _one(spark)
    assert r["highway"] == "footway"
    # narrow road_bike trail -> footway + bicycle=yes
    r = _one(spark, ROADBIKE="Yes", WIDTH="1-5")
    assert (r["highway"], r["bicycle"]) == ("footway", "yes")


def test_mtn_bike_path(spark):
    r = _one(spark, MTNBIKE="Yes")
    assert (r["highway"], r["bicycle"]) == ("path", "designated")


def test_bicycle_no_override(spark):
    r = _one(spark, MTNBIKE="No")
    assert r["bicycle"] == "no"
    r = _one(spark, ROADBIKE="No", MTNBIKE="Yes")
    assert r["bicycle"] == "designated"  # Yes on the other blocks the 'no'


def test_foot_no_override(spark):
    assert _one(spark, HIKE="No", EQUESTRIAN="Yes", MTNBIKE="Yes")["foot"] == "no"


def test_status_relocation(spark):
    r = _one(spark, STATUS="Planned")
    assert (r["highway"], r["proposed"]) == ("proposed", "footway")
    r = _one(spark, STATUS="Decommissioned")
    assert r["highway"] is None and r["abandoned:highway"] == "footway"
    r = _one(spark, STATUS="Under construction")
    assert (r["highway"], r["construction"]) == ("construction", "footway")


@pytest.mark.parametrize(
    "width,expected",
    [("6-9", "2.25"), ("15+", "5.75"), ("5", None), ("Unknown", None),
     (None, None), ("10-14", "3.75")],
)
def test_est_width(spark, width, expected):
    assert _one(spark, WIDTH=width)["est_width"] == expected


def test_names_and_operator(spark):
    r = _one(spark, SHAREDNAME="A", SYSTEMNAME="B")
    assert (r["name"], r["alt_name"]) == ("A", "B")
    r = _one(spark, TRAILNAME="T", SHAREDNAME="T", SYSTEMNAME="B")
    assert (r["name"], r["alt_name"]) == ("T", "B")
    assert _one(spark, AGENCYNAME="Unknown")["operator"] is None
    assert _one(spark, AGENCYNAME="Metro")["operator"] == "Metro"


def test_simple_maps(spark):
    r = _one(spark, STATUS="Restricted_Private", TRLSURFACE="Hard Surface",
             ACCESSIBLE="Accessible")
    assert (r["access"], r["surface"], r["wheelchair"]) == (
        "private", "paved", "yes")
    r = _one(spark, STATUS="Open_Fee", TRLSURFACE="Unknown")
    assert (r["fee"], r["surface"]) == ("yes", None)
