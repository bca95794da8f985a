"""Structured Streaming variants of the event operators.

The reference is a quarterly batch job (no streaming anywhere — SURVEY
§2.6), and the north rule is resumable batch; these ops exist so the engine
covers the streaming half of the training-data pipeline: watermarked
tumbling-window aggregation, late-data handling, and streaming dedup. Batch
equivalents (with DuckDB oracles) live in queries/events.py — the streaming
tests assert stream==batch on a bounded file source (availableNow trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def read_event_stream(spark: SparkSession, path: str,
                      max_files: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1h counts per event_type with late-data watermark — the
    streaming twin of queries/events.w1_hourly_windows."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").start.alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(18,2)"))
             .cast("decimal(38,2)").alias("total"))
        .select(F.date_format("w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type", "n", "total")
    )


def dedup_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon
    (state is bounded by the watermark — the scale contract)."""
    return stream.withWatermark("ts", watermark).dropDuplicates(
        ["event_id", "ts"])


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value total maintained across micro-batches
    (state = two scalars per user; bounded by the user-id domain). The
    state layer the brief calls out for operators watermarked windows
    can't express."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    import pandas as pd

    out_schema = "user_id long, n_events long, total double"
    state_schema = "n long, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total": [round(total, 2)]})

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout)
    )


def run_available_now(query_df: DataFrame, checkpoint_dir: str,
                      table_name: str):
    """Drain a bounded source into a memory sink (tests / smoke)."""
    q = (
        query_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


DOCS_XY_DDL = "doc_id long, ts timestamp, x double, y double"


def read_doc_point_stream(spark: SparkSession, path: str,
                          max_files: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_XY_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_tile_rollup(stream: DataFrame, res: int = 8,
                          watermark: str = "1 hour") -> DataFrame:
    """The flagship tile pipeline under Structured Streaming: native Morton
    cell assignment per document, then watermarked tumbling counts per
    (window, cell). Tile math is stateless column arithmetic, so the only
    state is the windowed aggregate — bounded by the watermark exactly like
    the event windows; the shuffle key (window, cell) is the same
    partitioning the batch rollup uses."""
    from rlis2osm_spark.spatial.tiles import tile_cell

    tiled = stream.withColumn("cell", tile_cell(F.col("x"), F.col("y"), res))
    return (
        tiled.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").start.alias("w"), "cell")
        .agg(F.count("*").alias("n_docs"),
             F.min("doc_id").alias("min_doc"))
        .select(F.date_format("w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "cell", "n_docs", "min_doc")
    )


def session_windows(stream: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization via Catalyst's native session_window —
    state merges adjacent windows per user and closes a session after
    ``gap`` inactivity; the streaming twin of w2's gaps-and-islands batch
    query (identical session boundaries: a new session starts when the gap
    STRICTLY exceeds ``gap``)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"),
             F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("start"),
             F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("end"))
        .select("user_id", "n_events", "start", "end")
    )


def enrich_stream(stream: DataFrame, dim: DataFrame,
                  on: str = "user_id", how: str = "left") -> DataFrame:
    """Stream-static enrichment join: the static dimension is re-read per
    micro-batch (picking up slowly-changing updates) and broadcast by
    Catalyst when small — the standard feature-enrichment shape (events x
    user profile). No state: the join is per-batch."""
    return stream.join(F.broadcast(dim), on, how)
