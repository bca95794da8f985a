"""Exhaustive differential for bike-overlay tag derivation (T21-T23):
every BIKETYP x BIKETHERE combination vs an independent pure-Python port of
generate_bike_mapping (translate.py:433-494)."""

import itertools

from rlis2osm_spark.operators.bike import derive_bike_tags

BIKETYPS = ["BKE-BLVD", "BKE-SHRD", "BKE-BUFF", "BKE-LANE", "BKE-TRAK",
            "SHL-WIDE", "OTH-CONN", "OTH-SWLK", "OTH-XING", "", None]
BIKETHERES = ["LT", "MT", "HT", "CA", "", None]


def _ref_bike(biketyp, bikethere, bike_id):
    infra = biketyp or ""
    if not infra and not bikethere:
        return None  # skipped row
    bicycle = cycleway = rlis = None
    if infra in ("BKE-BLVD", "BKE-SHRD"):
        cycleway = "shared_lane"
    elif infra in ("BKE-BUFF", "BKE-LANE"):
        cycleway = "lane"
    elif infra == "BKE-TRAK":
        cycleway = "track"
    elif infra == "SHL-WIDE":
        cycleway = "shoulder"
    elif "OTH-" in infra or bikethere in ("LT", "MT", "HT"):
        bicycle = "designated"
    if bikethere == "CA":
        rlis = "caution_area"
    return {
        "local_id": int(str(bike_id)[-6:]),
        "bicycle": bicycle,
        "cycleway": cycleway,
        "rlis_bicycle": rlis,
    }


def test_bike_tags_exhaustive(spark):
    rows = []
    fid = 0
    for bt, bth in itertools.product(BIKETYPS, BIKETHERES):
        bike_id = 900_000_000 + 100_000 + fid  # 9**-prefixed split id
        rows.append((fid, bike_id, bt, bth, None))
        fid += 1
    df = spark.createDataFrame(
        rows, "fid long, BIKEID long, BIKETYP string, BIKETHERE string, "
              "geometry binary")
    got = {r.bike_fid: r.asDict() for r in derive_bike_tags(df).collect()}

    kept = 0
    for i, (f, bike_id, bt, bth, _) in enumerate(rows):
        expect = _ref_bike(bt, bth, bike_id)
        if expect is None:
            assert f not in got, (bt, bth)
            continue
        g = got[f]
        for k, v in expect.items():
            assert g[k] == v, (bt, bth, k, g[k], v)
        kept += 1
    assert kept > 40


def test_bike_empty_string_bikethere_skip_semantics(spark):
    """Python truthiness subtlety: BIKETHERE='' is falsy — a row with
    BIKETYP null and BIKETHERE='' is skipped (translate.py:444-447)."""
    df = spark.createDataFrame(
        [(0, 100001, None, "", None), (1, 100002, None, "LT", None)],
        "fid long, BIKEID long, BIKETYP string, BIKETHERE string, "
        "geometry binary")
    got = [r.bike_fid for r in derive_bike_tags(df).collect()]
    assert got == [1]
