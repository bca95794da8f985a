"""Doc-native path parity: the interleaved documents table reconstructs to
the same typed frames as the parquet tables, translation output is
identical, and in-place span transforms preserve the order invariant."""

from pyspark.sql import functions as F

from rlis2osm_spark.operators.streets import expand_street_names, translate_streets
from rlis2osm_spark.sources.documents import (
    documents_to_rlis_frame,
    frame_columns,
    span_signature,
    transform_text_spans,
)

STREET_TYPES = {
    "LOCALID": "int", "TYPE": "int", "PREFIX": "string",
    "STREETNAME": "string", "FTYPE": "string", "DIRECTION": "string",
    "F_ZLEV": "int", "T_ZLEV": "int",
}


def _docs(spark, synth_dir):
    return spark.read.parquet(f"{synth_dir}/documents_rlis.parquet")


def _media(spark, synth_dir):
    return spark.read.parquet(f"{synth_dir}/media.parquet")


def test_documents_reconstruct_streets(spark, synth_dir):
    docs, media = _docs(spark, synth_dir), _media(spark, synth_dir)
    rebuilt = frame_columns(
        documents_to_rlis_frame(docs, media, "streets"), STREET_TYPES)
    orig = spark.read.parquet(f"{synth_dir}/streets.parquet")

    cols = ["fid"] + list(STREET_TYPES)
    a = {r.fid: tuple(r) for r in rebuilt.select(*cols).collect()}
    b = {r.fid: tuple(r) for r in orig.select(*cols).collect()}
    assert a == b
    # geometry payloads identical
    ga = {r.fid: bytes(r.geometry) for r in rebuilt.select("fid", "geometry").collect()}
    gb = {r.fid: bytes(r.geometry) for r in orig.select("fid", "geometry").collect()}
    assert ga == gb


def test_doc_native_translation_matches_table_path(spark, synth_dir):
    """Running the street translation over the doc-native frame must equal
    the table path row-for-row."""
    docs, media = _docs(spark, synth_dir), _media(spark, synth_dir)
    rebuilt = frame_columns(
        documents_to_rlis_frame(docs, media, "streets"), STREET_TYPES)
    orig = spark.read.parquet(f"{synth_dir}/streets.parquet")

    out_cols = ["fid", "access", "bridge", "description", "highway",
                "layer", "name", "service", "surface", "tunnel"]
    a = {r.fid: tuple(r) for r in translate_streets(
        expand_street_names(rebuilt)).select(*out_cols).collect()}
    b = {r.fid: tuple(r) for r in translate_streets(
        expand_street_names(orig)).select(*out_cols).collect()}
    assert a == b


def test_transform_text_spans_preserves_order_invariant(spark, synth_dir):
    docs = _docs(spark, synth_dir)
    upper = transform_text_spans(docs, lambda t: F.upper(t))

    def sig_no_text(col):
        # (kind, media_ref, offset-order) — the structural invariant
        ordered = F.array_sort(
            col, lambda a, b: a["offset"].cast("int") - b["offset"].cast("int"))
        return F.transform(
            ordered,
            lambda s: F.concat_ws("\x1f",
                                  F.coalesce(s["kind"], F.lit("\x00")),
                                  F.coalesce(s["media_ref"], F.lit("\x00")),
                                  s["offset"].cast("string")))

    j = docs.select("doc_id", sig_no_text(F.col("spans")).alias("a")).join(
        upper.select("doc_id", sig_no_text(F.col("spans")).alias("b")), "doc_id")
    assert j.filter(F.col("a") != F.col("b")).count() == 0
    # text actually changed somewhere
    changed = docs.select("doc_id", span_signature(F.col("spans")).alias("a")).join(
        upper.select("doc_id", span_signature(F.col("spans")).alias("b")), "doc_id")
    assert changed.filter(F.col("a") != F.col("b")).count() > 0


def test_transform_only_keys(spark, synth_dir):
    """Key-scoped rewrite touches only matching k=v spans."""
    docs = _docs(spark, synth_dir)
    out = transform_text_spans(
        docs, lambda t: F.concat(t, F.lit("!")), only_keys=["PREFIX"])
    ex = out.select(F.explode("spans").alias("s")).select("s.*")
    touched = ex.filter(F.col("text").startswith("PREFIX="))
    untouched = ex.filter(
        F.col("kind") == "text").filter(~F.col("text").startswith("PREFIX="))
    assert touched.count() > 0
    assert touched.filter(~F.col("text").endswith("!")).count() == 0
    assert untouched.filter(F.col("text").endswith("!")).count() == 0
