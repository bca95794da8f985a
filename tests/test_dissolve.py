"""Dissolve goldens (FIXTURES.md §6.5; reference dissolve.py). Topologies are
fork-free so greedy-BFS and true-CC semantics coincide (SURVEY §7.3)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rlis2osm_spark.functions.wkb import (
    decode_lines,
    decode_linestring,
    encode_linestring,
    linemerge,
)
from rlis2osm_spark.operators.dissolve import _define_filter_fields, dissolve_ways
from rlis2osm_spark.schemas import COMBINED_FIELDS


def _combined_df(spark, rows):
    """rows: (fid, highway, name, wkb)"""
    recs = []
    for fid, hw, name, geom in rows:
        rec = {c: None for c in COMBINED_FIELDS}
        rec.update({"src_table": "streets", "fid": fid, "part_idx": 0,
                    "highway": hw, "name": name, "geometry": geom})
        recs.append(rec)
    pdf = pd.DataFrame(recs)
    pdf["layer"] = pdf["layer"].astype("object")
    schema = ("src_table string, fid long, part_idx int, "
              + ", ".join(f"`{c}` {'int' if c == 'layer' else 'string'}"
                          for c in COMBINED_FIELDS)
              + ", geometry binary")
    cols = ["src_table", "fid", "part_idx"] + COMBINED_FIELDS + ["geometry"]
    return spark.createDataFrame(pdf[cols], schema=schema)


def _seg(x0, y0, x1, y1):
    return encode_linestring([(x0, y0), (x1, y1)])


def test_linemerge_chain():
    out = linemerge([
        np.array([[0.0, 0.0], [1.0, 0.0]]),
        np.array([[1.0, 0.0], [2.0, 0.0]]),
        np.array([[2.0, 0.0], [3.0, 0.0]]),
    ])
    assert len(out) == 1
    assert out[0][0].tolist() == [0.0, 0.0]
    assert out[0][-1].tolist() == [3.0, 0.0]


def test_linemerge_reversed_and_disjoint():
    out = linemerge([
        np.array([[1.0, 0.0], [0.0, 0.0]]),  # reversed member still merges
        np.array([[1.0, 0.0], [2.0, 0.0]]),
        np.array([[9.0, 9.0], [9.0, 10.0]]),  # disjoint -> second part
    ])
    assert len(out) == 2
    lens = sorted(len(p) for p in out)
    assert lens == [2, 3]


def test_dissolve_basic_topology(spark):
    """A,B,C same tags chain -> merged; D different highway at shared node
    -> alone (dissolve.py:81-82)."""
    df = _combined_df(spark, [
        (0, "residential", "Oak", _seg(0, 0, 1, 0)),
        (1, "residential", "Oak", _seg(1, 0, 2, 0)),
        (2, "residential", "Oak", _seg(2, 0, 3, 0)),
        (3, "service", "Oak", _seg(1, 0, 1, 1)),
    ])
    out = dissolve_ways(df).collect()
    assert len(out) == 2
    by_hw = {r.highway: r for r in out}
    assert by_hw["residential"].n_members == 3
    merged = decode_linestring(bytes(by_hw["residential"].geometry))
    assert {tuple(merged[0]), tuple(merged[-1])} == {(0.0, 0.0), (3.0, 0.0)}
    assert by_hw["service"].n_members == 1


def test_dissolve_exact_float_equality(spark):
    """(1.0000001, 0) must NOT merge with (1.0, 0) — no snapping
    (dissolve.py:144-145)."""
    df = _combined_df(spark, [
        (0, "residential", "Oak", _seg(0, 0, 1, 0)),
        (1, "residential", "Oak", encode_linestring([(1.0000001, 0.0), (2.0, 0.0)])),
    ])
    out = dissolve_ways(df).collect()
    assert len(out) == 2


def test_dissolve_null_vs_empty_tags_distinct(spark):
    """null and '' are different tag values for grouping."""
    df = _combined_df(spark, [
        (0, "residential", None, _seg(0, 0, 1, 0)),
        (1, "residential", "", _seg(1, 0, 2, 0)),
    ])
    assert len(dissolve_ways(df).collect()) == 2


def test_dissolve_fields_subset(spark):
    """fields=['highway'] merges across differing names (A4)."""
    df = _combined_df(spark, [
        (0, "residential", "Oak", _seg(0, 0, 1, 0)),
        (1, "residential", "Elm", _seg(1, 0, 2, 0)),
    ])
    out = dissolve_ways(df, fields=["highway"]).collect()
    assert len(out) == 1 and out[0].n_members == 2


def test_dissolve_exclude(spark):
    df = _combined_df(spark, [
        (0, "residential", "Oak", _seg(0, 0, 1, 0)),
        (1, "residential", "Elm", _seg(1, 0, 2, 0)),
    ])
    # exclude name -> merge; excluding nothing -> no merge
    assert len(dissolve_ways(df, fields=["name"], exclude=True).collect()) == 1
    assert len(dissolve_ways(df).collect()) == 2


def test_dissolve_unknown_field_raises(spark):
    df = _combined_df(spark, [(0, "residential", "Oak", _seg(0, 0, 1, 0))])
    with pytest.raises(ValueError, match="does not exist"):
        dissolve_ways(df, fields=["nope"])


def test_define_filter_fields_parity():
    fields = ["a", "b", "c"]
    assert _define_filter_fields(fields) == fields
    assert _define_filter_fields(fields, ["b"]) == ["b"]
    assert _define_filter_fields(fields, ["b"], exclude=True) == ["a", "c"]


def test_dissolve_synth_end_to_end(spark, synth_dir):
    """Chains in the synthetic streets dissolve into fewer ways; members
    conserved."""
    from rlis2osm_spark.operators.combine import combine

    streets = spark.read.parquet(f"{synth_dir}/streets.parquet")
    trails = spark.read.parquet(f"{synth_dir}/trails.parquet")
    bikes = spark.read.parquet(f"{synth_dir}/bike_routes.parquet")
    combined = combine(streets, trails, bikes)
    dissolved = dissolve_ways(combined)
    n_in = combined.count()
    rows = dissolved.collect()
    assert sum(r.n_members for r in rows) == n_in
    assert len(rows) < n_in  # some merging happened
    # every merged geometry decodes
    for r in rows[:50]:
        assert decode_lines(bytes(r.geometry))


def test_dissolve_iterative_matches_unionfind(spark, synth_dir):
    """Scale-path CC (large-star/small-star) produces the same dissolve
    groups as the per-group union-find."""
    from rlis2osm_spark.operators.combine import combine

    streets = spark.read.parquet(f"{synth_dir}/streets.parquet")
    trails = spark.read.parquet(f"{synth_dir}/trails.parquet")
    bikes = spark.read.parquet(f"{synth_dir}/bike_routes.parquet")
    combined = combine(streets, trails, bikes)
    a = dissolve_ways(combined).select("component_id", "n_members")
    b = dissolve_ways(combined, algorithm="iterative").select(
        "component_id", "n_members")
    ra = sorted((r.component_id, r.n_members) for r in a.collect())
    rb = sorted((r.component_id, r.n_members) for r in b.collect())
    assert ra == rb


def test_dissolve_null_geometry_raises(spark):
    """ADVICE r1: null geometry must fail loudly (reference crashes on
    missing geometry), not silently drop rows from the output."""
    from pyspark.errors import SparkRuntimeException

    df = _combined_df(spark, [
        (0, "residential", "Oak", _seg(0, 0, 1, 0)),
        (1, "residential", "Oak", None),
    ])
    with pytest.raises(SparkRuntimeException, match="non-null geometry"):
        dissolve_ways(df).collect()


def test_dissolve_auto_routes_degenerate_group(spark):
    """VERDICT r1 #3: a tag-group larger than max_group_rows auto-routes to
    the iterative CC and produces identical output to pure union-find."""
    rows = []
    # one degenerate group: a 60-segment chain + a disjoint 10-segment chain,
    # all identically tagged (the 'unnamed service road' skew shape)
    for i in range(60):
        rows.append((i, "service", None, _seg(i, 0, i + 1, 0)))
    for i in range(10):
        rows.append((100 + i, "service", None, _seg(i, 50, i + 1, 50)))
    # plus small healthy groups
    rows.append((200, "residential", "Oak", _seg(0, 9, 1, 9)))
    rows.append((201, "residential", "Oak", _seg(1, 9, 2, 9)))
    rows.append((202, "tertiary", "Elm", _seg(5, 5, 6, 6)))
    df = _combined_df(spark, rows)

    def canon(res):
        return sorted(
            (r.highway, r.name, r.n_members,
             tuple(sorted(map(tuple, map(lambda p: (tuple(p[0]), tuple(p[-1])),
                                          decode_lines(bytes(r.geometry)))))))
            for r in res.collect())

    auto = dissolve_ways(df, algorithm="auto", max_group_rows=20)
    uf = dissolve_ways(df, algorithm="unionfind")
    assert canon(auto) == canon(uf)
    # the degenerate group really did split into its two chains
    svc = [r for r in auto.collect() if r.highway == "service"]
    assert sorted(r.n_members for r in svc) == [10, 60]
    # ordered=True on the HYBRID path (fused small side + iterative big
    # side unioned) is still a deterministic total order (r5)
    o1 = dissolve_ways(df, algorithm="auto", max_group_rows=20,
                       ordered=True).collect()
    o2 = dissolve_ways(df, algorithm="auto", max_group_rows=20,
                       ordered=True).collect()
    assert [r.component_id for r in o1] == [r.component_id for r in o2]
    assert [r.component_id for r in o1] == sorted(
        r.component_id for r in o1)
    assert canon(dissolve_ways(df, algorithm="auto", max_group_rows=20,
                               ordered=True)) == canon(uf)


def test_dissolve_same_tag_fork_divergence_pin(spark):
    """ADVICE r1: pins the intended divergence from the reference on
    same-tag forks. The reference's greedy single-path BFS
    (dissolve.py:74-93) breaks at a T-junction and emits 2+ features; true
    connected components merge the fork into ONE feature whose geometry
    linemerges into 2 parts (a through-line + the stub). This is the
    documented, deliberate semantic (operators/dissolve.py module doc)."""
    df = _combined_df(spark, [
        (0, "residential", "Oak", _seg(0, 0, 1, 0)),
        (1, "residential", "Oak", _seg(1, 0, 2, 0)),
        (2, "residential", "Oak", _seg(1, 0, 1, 1)),  # stub at the junction
    ])
    out = dissolve_ways(df).collect()
    assert len(out) == 1 and out[0].n_members == 3
    parts = decode_lines(bytes(out[0].geometry))
    # GEOS-linemerge semantics: a degree-3 node blocks merging, so all three
    # member segments survive as parts of the single dissolved feature
    assert len(parts) == 3
    endpoints = {tuple(p[0]) for p in parts} | {tuple(p[-1]) for p in parts}
    assert (1.0, 1.0) in endpoints  # the stub is present, not dropped


def test_ordered_dissolve_byte_identical_sinks(spark, tmp_path):
    """``ordered=True`` (r4, VERDICT r3 #4): two identical runs must produce
    byte-identical sink artifacts — parquet AND .osm fragments — so display/
    diff consumers see stable output like the reference's (its output order
    is deterministic by construction). Unordered set-semantics stay the
    default (no sort shuffle)."""
    import glob
    import os

    from rlis2osm_spark.operators.osm_sink import write_osm_xml

    rows = [(i, "residential", f"Street {i % 7}",
             _seg(float(i), 0.0, float(i) + 1.0, 0.0)) for i in range(60)]
    df = _combined_df(spark, rows)

    def run(out_tag):
        d = dissolve_ways(df, fields=["highway", "name"], ordered=True)
        pq_dir = str(tmp_path / f"pq_{out_tag}")
        d.write.mode("overwrite").parquet(pq_dir)
        osm_dir = str(tmp_path / f"osm_{out_tag}")
        sink = d.select(
            "geometry",
            F.map_from_arrays(F.array(F.lit("highway"), F.lit("name")),
                              F.array("highway", "name")).alias("tags"))
        write_osm_xml(sink, osm_dir).collect()
        return pq_dir, osm_dir

    def file_bytes(d, pattern):
        # part filenames embed per-run UUIDs; the part INDEX prefix is the
        # stable identity, so compare contents in part-index order
        files = sorted(glob.glob(os.path.join(d, pattern)),
                       key=os.path.basename)
        return [open(f, "rb").read() for f in files]

    pq1, osm1 = run("a")
    pq2, osm2 = run("b")
    assert file_bytes(pq1, "part-*.parquet") == file_bytes(pq2, "part-*.parquet")
    osm_a = file_bytes(osm1, "part-*.osm")
    osm_b = file_bytes(osm2, "part-*.osm")
    assert osm_a and osm_a == osm_b


def test_cc_labels_matches_reference_union_find():
    """r6: the vectorized Shiloach–Vishkin-style CC (_cc_labels) must
    produce the same partition as a plain dict union-find on random
    graphs — including self-loops, duplicate edges, and isolated
    vertices."""
    from rlis2osm_spark.operators.dissolve import _cc_labels

    rng = np.random.default_rng(20260817)
    for trial in range(25):
        m = int(rng.integers(1, 400))
        n_edges = int(rng.integers(0, 2 * m))
        u = rng.integers(0, m, n_edges)
        v = rng.integers(0, m, n_edges)

        parent = list(range(m))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(u, v):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = np.array([find(i) for i in range(m)])
        # reference roots are NOT guaranteed minimal per component under
        # path order; canonicalize both sides by min vertex per component
        canon = {}
        for i, r in enumerate(expect):
            canon[r] = min(canon.get(r, i), i)
        expect = np.array([canon[r] for r in expect])

        got = _cc_labels(u.astype(np.int64), v.astype(np.int64), m)
        assert np.array_equal(got, expect), f"trial {trial}"


def test_endpoint_slices_batch_matches_substring():
    from rlis2osm_spark.functions.wkb import endpoint_slices_batch

    geoms = [
        _seg(0.5, -1.25, 3.0, 4.75),
        encode_linestring([(1.0, 2.0), (3.0, 4.0), (5.0, 6.0)]),
        _seg(-0.0, 0.0, 1e300, -1e-300),
    ]
    out = endpoint_slices_batch(geoms)
    assert out.shape == (3, 2, 16)
    for i, g in enumerate(geoms):
        assert out[i, 0].tobytes() == g[9:25]
        assert out[i, 1].tobytes() == g[len(g) - 16:]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        endpoint_slices_batch([b"\x01\x02\x00\x00\x00"])
