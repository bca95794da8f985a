"""Exhaustive differential for street translation: every TYPE code x every
(F_ZLEV, T_ZLEV) pair x name-presence states, vs an independent pure-Python
port of StreetTranslator (translate.py:74-162)."""

import itertools

import pandas as pd

from rlis2osm_spark.operators.streets import (
    ACCESS_BY_TYPE,
    HIGHWAY_BY_TYPE,
    SERVICE_BY_TYPE,
    SURFACE_BY_TYPE,
    translate_streets,
)

ZLEVS = [None, 0, 1, 2, 3, -1, -2]


def _ref_translate(type_code, streetname, f_zlev, t_zlev):
    if not streetname or streetname.lower() == "unnamed":
        name = None
    else:
        name = streetname  # single component; concat covered elsewhere
    highway = HIGHWAY_BY_TYPE[type_code]
    description = None
    if highway == "residential" and not name:
        highway = "service"
    elif "_link" in highway:
        description, name = name, None

    fz = f_zlev or 1
    tz = t_zlev or 1
    layer = None
    mx = max(fz, tz)
    if fz == tz:
        if fz > 1:
            layer = fz - 1
        elif fz < 0:
            layer = fz
    elif mx > 1:
        layer = mx - 1
    elif mx < 0:
        layer = min(fz, tz)
    bridge = tunnel = None
    if not layer:
        pass
    elif layer > 0:
        bridge = "yes"
    else:
        tunnel = "yes"

    return {
        "access": ACCESS_BY_TYPE.get(type_code),
        "bridge": bridge,
        "description": description,
        "highway": highway,
        "layer": layer,
        "name": name,
        "service": SERVICE_BY_TYPE.get(type_code),
        "surface": SURFACE_BY_TYPE.get(type_code),
        "tunnel": tunnel,
    }


def test_streets_exhaustive_differential(spark):
    rows = []
    fid = 0
    for t, fz, tz, sname in itertools.product(
            sorted(HIGHWAY_BY_TYPE), ZLEVS, ZLEVS, ["MAIN", "UNNAMED", None]):
        rows.append(dict(fid=fid, LOCALID=fid, TYPE=t, PREFIX=None,
                         STREETNAME=sname, FTYPE=None, DIRECTION=None,
                         F_ZLEV=fz, T_ZLEV=tz, geometry=None))
        fid += 1
    pdf = pd.DataFrame(rows)
    schema = ("fid long, LOCALID int, TYPE int, PREFIX string, "
              "STREETNAME string, FTYPE string, DIRECTION string, "
              "F_ZLEV int, T_ZLEV int, geometry binary")
    # no expansion stage: single-word names pass through it unchanged and
    # this test targets the translation semantics
    df = spark.createDataFrame(pdf, schema=schema)
    got = {r.fid: r.asDict() for r in translate_streets(df).collect()}
    assert len(got) == len(rows)

    checked = 0
    for row in rows:
        expect = _ref_translate(row["TYPE"], row["STREETNAME"],
                                row["F_ZLEV"], row["T_ZLEV"])
        g = got[row["fid"]]
        for k, ev in expect.items():
            gv = g[k]
            if k == "name":
                # pipeline applies titlecase(None -> '') after translate
                ev = "" if ev is None else ev.lower().title()
                gv = gv
                assert (gv or "") .lower() == (ev or "").lower(), (row, k, g[k])
                continue
            assert gv == ev, (row, k, gv, ev)
        checked += 1
    assert checked == 37 * 7 * 7 * 3
