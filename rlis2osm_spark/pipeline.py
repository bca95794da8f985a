"""Flagship pipelines: the end-to-end jobs the engine exists for.

1. ``tile_assignment`` — the BASELINE.json headline: H3-style cell encoding
   + tile assignment over the interleaved document table (documents joined
   to media geometry, one Arrow pass for coordinates, native Morton cells),
   preserving the span-sequence invariant.
2. ``rlis_osm_pipeline`` — the full reference-parity job (EP1 stages 3-5):
   combine -> dissolve -> tile, each stage a resumable snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rlis2osm_spark.operators.combine import combine, repair_and_filter_tags
from rlis2osm_spark.operators.dissolve import dissolve_ways
from rlis2osm_spark.plans.checkpoint import Checkpointer
from rlis2osm_spark.sources.documents import attach_geometry, span_signature
from rlis2osm_spark.spatial.tiles import TileGrid, parent_cell, with_tile


def tile_assignment(
    docs: DataFrame,
    media: DataFrame,
    res: int = 12,
    grid: TileGrid = TileGrid(),
) -> DataFrame:
    """Assign every interleaved document its Morton tile at ``res``.

    Output keeps the untouched ``spans`` array plus a ``span_sig`` column so
    the invariant is checkable downstream without re-reading the input.
    """
    with_geom = attach_geometry(docs, media)
    tiled = with_tile(with_geom, res, grid=grid)
    return tiled.withColumn("span_sig", span_signature(F.col("spans"))).select(
        "doc_id", "media_ref", "x", "y", "ix", "iy", "cell", "spans", "span_sig"
    )


def tile_rollup(tiled: DataFrame, levels: int = 2) -> DataFrame:
    """Hierarchical tile stats: doc counts per cell and per ancestor cell
    (partial aggregation is map-side; cells are the shuffle key)."""
    per_cell = tiled.groupBy("cell").agg(F.count("*").alias("n_docs"))
    return per_cell.withColumn(
        "parent_cell", parent_cell(F.col("cell"), levels)
    )


def tile_rollup_salted(tiled: DataFrame, n_salts: int = 8) -> DataFrame:
    """Skew-proof variant of tile_rollup: explicit salted keys + two-phase
    aggregation (north-rule contract — downtown cells are orders of
    magnitude hotter than rural ones; AQE helps, but the salt makes the
    mitigation visible and deterministic).

    Phase 1 shuffles on (cell, salt) — a hot cell spreads over n_salts
    reducers; phase 2 merges the n_salts partials per cell (tiny)."""
    salted = tiled.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)))
    phase1 = salted.groupBy("cell", "salt").agg(
        F.count("*").alias("n_partial"))
    return (
        phase1.groupBy("cell")
        .agg(F.sum("n_partial").alias("n_docs"))
        .withColumn("parent_cell", parent_cell(F.col("cell"), 2))
    )


def rlis_osm_pipeline(
    spark: SparkSession,
    data_dir: str,
    ckpt_root: str | None = None,
    run_id: str = "rlis",
) -> DataFrame:
    """combine -> dissolve -> tags, optionally checkpointed per stage."""
    streets = spark.read.parquet(f"{data_dir}/streets.parquet")
    trails = spark.read.parquet(f"{data_dir}/trails.parquet")
    bikes = spark.read.parquet(f"{data_dir}/bike_routes.parquet")

    if ckpt_root is None:
        combined = combine(streets, trails, bikes)
        dissolved = dissolve_ways(combined)
        return repair_and_filter_tags(dissolved)

    ck = Checkpointer(spark, ckpt_root, run_id)
    combined = ck.stage("combined", lambda: combine(streets, trails, bikes),
                        inputs=["streets", "trails", "bike_routes"])
    dissolved = ck.stage("dissolved", lambda: dissolve_ways(combined),
                         inputs=["combined"])
    return repair_and_filter_tags(dissolved)
