"""Golden tests for street translation T1-T12 (FIXTURES.md §6.2; reference
translate.py:74-162)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rlis2osm_spark.operators.streets import expand_street_names, translate_streets


def _streets_df(spark, rows):
    cols = ["LOCALID", "TYPE", "PREFIX", "STREETNAME", "FTYPE", "DIRECTION",
            "F_ZLEV", "T_ZLEV"]
    pdf = pd.DataFrame(rows, columns=cols)
    pdf.insert(0, "fid", range(len(rows)))
    pdf["geometry"] = None
    schema = ("fid long, LOCALID int, TYPE int, PREFIX string, "
              "STREETNAME string, FTYPE string, DIRECTION string, "
              "F_ZLEV int, T_ZLEV int, geometry binary")
    return spark.createDataFrame(pdf, schema=schema)


def _translate_one(spark, row):
    df = _streets_df(spark, [row])
    out = translate_streets(expand_street_names(df))
    return out.collect()[0].asDict()


def test_residential_named(spark):
    r = _translate_one(spark, (1, 1500, "NW", "EVERETT", "ST", None, None, None))
    assert r["highway"] == "residential"
    assert r["name"] == "Northwest Everett Street"
    assert r["description"] is None


def test_unnamed_residential_downgrade(spark):
    r = _translate_one(spark, (1, 1500, None, "UNNAMED", None, None, None, None))
    assert r["highway"] == "service"
    assert r["name"] == ""  # titlecase(None->'') parity quirk


def test_link_description(spark):
    r = _translate_one(spark, (1, 1121, "N", "MARINE", "DR", None, None, None))
    assert r["highway"] == "motorway_link"
    assert r["description"] == "North MARINE Drive"  # expanded, NOT titlecased
    assert r["name"] == ""


def test_surface_access_service(spark):
    r = _translate_one(spark, (1, 2000, None, "OAK", None, None, None, None))
    assert (r["highway"], r["surface"]) == ("residential", "unpaved")
    r = _translate_one(spark, (1, 5402, None, "OAK", None, None, None, None))
    assert (r["highway"], r["access"]) == ("tertiary", "no")
    r = _translate_one(spark, (1, 1750, None, "OAK", None, None, None, None))
    assert (r["highway"], r["service"], r["access"]) == (
        "service", "driveway", "private")
    r = _translate_one(spark, (1, 1600, None, "OAK", None, None, None, None))
    assert (r["highway"], r["service"]) == ("service", "alley")


@pytest.mark.parametrize(
    "fz,tz,layer,bridge,tunnel",
    [
        (1, 1, None, None, None),
        (None, None, None, None, None),
        (2, 2, 1, "yes", None),
        (3, 1, 2, "yes", None),
        (-1, -1, -1, None, "yes"),
        (-2, -1, -2, None, "yes"),
        (-1, 1, None, None, None),  # falls through all branches
        (0, None, None, None, None),  # 0 coalesces to 1 like Python `or`
    ],
)
def test_zlevel_matrix(spark, fz, tz, layer, bridge, tunnel):
    r = _translate_one(spark, (1, 1500, None, "OAK", None, None, fz, tz))
    assert r["layer"] == layer
    assert r["bridge"] == bridge
    assert r["tunnel"] == tunnel


def test_unknown_type_raises(spark):
    df = _streets_df(spark, [(1, 1234, None, "OAK", None, None, None, None)])
    out = translate_streets(expand_street_names(df))
    with pytest.raises(Exception, match="unknown street TYPE"):
        out.collect()


def test_name_concat_skips_nulls(spark):
    r = _translate_one(spark, (1, 1500, "N", "OAK", None, "NB", None, None))
    assert r["name"] == "North Oak Northbound"


def test_plan_has_no_python_in_translate(spark):
    """T1-T12 must stay JVM-side: the translate stage plan contains no
    row-at-a-time PythonUDF (the two pandas UDFs are Arrow-batched)."""
    df = _streets_df(spark, [(1, 1500, None, "OAK", None, None, None, None)])
    plan = translate_streets(expand_street_names(df))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no per-row Python UDF
