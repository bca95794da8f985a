"""Differential test (SURVEY §5): the columnar trail translation vs an
independent pure-Python port of the reference semantics
(/root/reference/rlis2osm/translate.py:165-422), over randomized attribute
combinations. Three independent implementations now agree: this port, the
Spark columns, and the DuckDB oracle SQL."""

import itertools

import numpy as np
import pandas as pd

from rlis2osm_spark.operators.trails import keep_trail, translate_trails

YNN = ["Yes", "No", None]
STATUSES = ["Open", "Open_Fee", "Restricted_Private", "Unknown", "Conceptual",
            "Decommissioned", "Planned", "Under construction", None]
SURFACES = ["Chunk Wood", "Decking", "Hard Surface", "Imported Material",
            "Native Material", "Snow", "Stairs", "Water", "Unknown", None]
WIDTHS = ["1-5", "6-9", "10-14", "15+", "5", "Unknown", None, ""]
SYSTYPES = ["Regional", "State", "National", "Local", None]
NAMES = ["A", "B", "", None]

ACCESS_MAP = {"Restricted_Private": "private", "Unknown": "unknown"}
FEE_MAP = {"Open_Fee": "yes"}
SURFACE_MAP = {"Chunk Wood": "woodchips", "Decking": "wood",
               "Hard Surface": "paved", "Imported Material": "compacted",
               "Native Material": "ground", "Snow": "snow", "Unknown": None}
WHEELCHAIR_MAP = {"Accessible": "yes", "Not Accessible": "no"}


def _ref_est_width(width, resolution=0.25):
    """Pure-Python port of _set_est_width (translate.py:385-409), including
    the Py2 half-away-from-zero round."""
    import math

    temp = None
    if not width:
        return None
    elif "-" in width:
        lo, hi = width.split("-")
        temp = (float(lo) + float(hi)) / 2
    elif "+" in width:
        temp = float(width.replace("+", "")) * 1.25
    elif width == "Unknown":
        return None
    if temp:
        x = temp * 0.3048 / resolution
        rounded = math.floor(x + 0.5) * resolution  # py2 round, positive x
        return format(rounded, "g")
    return None


def _ref_translate(a):
    """Pure-Python port of TrailsTranslator.translate
    (translate.py:245-422) — written independently of the Spark columns."""
    if a["ONSTRBIKE"] == "Yes" or a["STATUS"] == "Conceptual" \
            or a["TRLSURFACE"] == "Water":
        return None  # dropped

    est_width = _ref_est_width(a["WIDTH"])
    float_width = float(est_width or 0)
    bike_designated = (
        a["ROADBIKE"] == "Yes"
        and (float_width > 3
             or a["SYSTEMTYPE"] in ("Regional", "State", "National")))
    conditions = [a["EQUESTRIAN"] == "Yes", a["HIKE"] == "Yes",
                  a["MTNBIKE"] == "Yes", bike_designated]

    horse = foot = bicycle = abandoned = proposed = construction = None
    if a["TRLSURFACE"] == "Stairs":
        highway = "steps"
    elif sum(bool(c) for c in conditions) >= 2:
        highway = "path"
        if a["EQUESTRIAN"] == "Yes":
            horse = "designated"
        elif a["EQUESTRIAN"] == "No":
            horse = "no"
        if a["HIKE"]:
            foot = "designated"
        if a["ROADBIKE"] or a["MTNBIKE"]:
            bicycle = "designated"
    elif bike_designated:
        highway = "cycleway"
    elif a["MTNBIKE"] == "Yes":
        highway = "path"
        bicycle = "designated"
    elif a["EQUESTRIAN"] == "Yes":
        highway = "bridleway"
    else:
        highway = "footway"
        if a["ROADBIKE"] == "Yes":
            bicycle = "yes"

    if a["HIKE"] == "No":
        foot = "no"
    if ((a["MTNBIKE"] == "No" and a["ROADBIKE"] != "Yes")
            or (a["ROADBIKE"] == "No" and a["MTNBIKE"] != "Yes")):
        bicycle = "no"

    if a["STATUS"] == "Decommissioned":
        abandoned, highway = highway, None
    elif a["STATUS"] == "Planned":
        proposed, highway = highway, "proposed"
    elif a["STATUS"] == "Under construction":
        construction, highway = highway, "construction"

    name = a["TRAILNAME"] or a["SHAREDNAME"] or a["SYSTEMNAME"]
    alt_name = None
    for cand in (a["SHAREDNAME"], a["SYSTEMNAME"]):
        if cand and cand != name:
            alt_name = cand
            break
    operator = a["AGENCYNAME"] if a["AGENCYNAME"] != "Unknown" else None

    return {
        "abandoned:highway": abandoned,
        "access": ACCESS_MAP.get(a["STATUS"]),
        "alt_name": alt_name,
        "bicycle": bicycle,
        "construction": construction,
        "est_width": est_width,
        "fee": FEE_MAP.get(a["STATUS"]),
        "foot": foot,
        "highway": highway,
        "horse": horse,
        "name": name,
        "operator": operator,
        "proposed": proposed,
        "surface": SURFACE_MAP.get(a["TRLSURFACE"]),
        "wheelchair": WHEELCHAIR_MAP.get(a["ACCESSIBLE"]),
    }


COLS = ["ACCESSIBLE", "AGENCYNAME", "EQUESTRIAN", "HIKE", "MTNBIKE",
        "ONSTRBIKE", "ROADBIKE", "SHAREDNAME", "STATUS", "SYSTEMNAME",
        "SYSTEMTYPE", "TRAILNAME", "TRLSURFACE", "WIDTH"]
OUT = ["abandoned:highway", "access", "alt_name", "bicycle", "construction",
       "est_width", "fee", "foot", "highway", "horse", "name", "operator",
       "proposed", "surface", "wheelchair"]


def test_trails_differential_random(spark):
    rng = np.random.RandomState(99)
    rows = []
    for i in range(1200):
        rows.append({
            "fid": i,
            "ACCESSIBLE": ["Accessible", "Not Accessible", None][rng.randint(3)],
            "AGENCYNAME": ["Metro", "Unknown", None][rng.randint(3)],
            "EQUESTRIAN": YNN[rng.randint(3)],
            "HIKE": YNN[rng.randint(3)],
            "MTNBIKE": YNN[rng.randint(3)],
            "ONSTRBIKE": YNN[rng.randint(3)],
            "ROADBIKE": YNN[rng.randint(3)],
            "SHAREDNAME": NAMES[rng.randint(4)],
            "STATUS": STATUSES[rng.randint(9)],
            "SYSTEMNAME": NAMES[rng.randint(4)],
            "SYSTEMTYPE": SYSTYPES[rng.randint(5)],
            "TRAILNAME": NAMES[rng.randint(4)],
            "TRLSURFACE": SURFACES[rng.randint(10)],
            "WIDTH": WIDTHS[rng.randint(8)],
            "geometry": None,
        })
    pdf = pd.DataFrame(rows)
    schema = ("fid long, " + ", ".join(f"{c} string" for c in COLS)
              + ", geometry binary")
    df = spark.createDataFrame(pdf[["fid"] + COLS + ["geometry"]], schema)
    got = {r["fid"]: r for r in
           translate_trails(keep_trail(df)).collect()}

    n_checked = 0
    for row in rows:
        a = {c: row[c] for c in COLS}
        expect = _ref_translate(a)
        if expect is None:
            assert row["fid"] not in got, (row, "should be dropped")
            continue
        g = got[row["fid"]].asDict()
        for k in OUT:
            # empty-string names: Python `or` treats '' as falsy but keeps
            # the final fallthrough; Spark mirrors via nullif — both can
            # yield '' vs None for absent names; normalize for compare
            gv, ev = g[k], expect[k]
            if gv == "":
                gv = None
            if ev == "":
                ev = None
            assert gv == ev, (row["fid"], k, g[k], expect[k], a)
        n_checked += 1
    assert n_checked > 600
