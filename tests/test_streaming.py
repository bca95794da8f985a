"""Structured Streaming ops: bounded file source drained with availableNow
must agree with the batch equivalents."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from rlis2osm_spark.queries.events import w1_hourly_windows
from rlis2osm_spark.streaming import stream_ops

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    """Copy the events parquet into a directory source split in two files
    (so the stream sees multiple triggers)."""
    d = tmp_path_factory.mktemp("events_src")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(str(d / "a"))
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(str(d / "b"))
    # flatten: move part files into one dir
    out = tmp_path_factory.mktemp("events_flat")
    for sub in ("a", "b"):
        for f in os.listdir(d / sub):
            if f.endswith(".parquet"):
                shutil.copy(d / sub / f, out / f"{sub}_{f}")
    return str(out)


def test_streaming_windowed_counts_match_batch(spark, stream_src, tmp_path):
    stream = stream_ops.read_event_stream(spark, stream_src)
    assert stream.isStreaming
    windowed = stream_ops.windowed_counts(stream)
    q = stream_ops.run_available_now(
        windowed, str(tmp_path / "ckpt"), "stream_w1")
    got = {(r.window_start, r.event_type): (r.n, str(r.total))
           for r in spark.sql("select * from stream_w1").collect()}
    expect = {(r.window_start, r.event_type): (r.n, str(r.total))
              for r in w1_hourly_windows(spark, SF_DIR).collect()}
    assert got == expect
    q.stop()


def test_streaming_dedup(spark, stream_src, tmp_path):
    stream = stream_ops.read_event_stream(spark, stream_src)
    deduped = stream_ops.dedup_stream(stream).groupBy().count()
    q = (
        deduped.writeStream.format("memory").queryName("stream_dedup")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    n_stream = spark.sql("select * from stream_dedup").collect()[0][0]
    n_batch = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert n_stream == n_batch  # event_ids unique -> dedup is a no-op count
    q.stop()


def test_stateful_running_totals(spark, stream_src, tmp_path):
    """applyInPandasWithState: final per-user totals across micro-batches
    equal the batch aggregation."""
    stream = stream_ops.read_event_stream(spark, stream_src)
    totals = stream_ops.running_user_totals(stream)
    q = (
        totals.writeStream.format("memory").queryName("stream_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    # 'update' mode emits one row per user per batch; last emit wins
    import pyspark.sql.functions as F

    got_df = spark.sql("select * from stream_totals")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    got = {r.user_id: (r.n_events, r.total)
           for r in got_df.withColumn("rk", F.row_number().over(w))
           .filter("rk = 1").collect()}
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    expect = {r.user_id: (r.n, round(r.total, 2))
              for r in batch.groupBy("user_id")
              .agg(F.count("*").alias("n"),
                   F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total"))
              .collect()}
    # compare counts exactly; totals to 2dp (float sum order)
    assert {k: v[0] for k, v in got.items()} == {k: v[0] for k, v in expect.items()}
    for k in expect:
        assert abs(got[k][1] - expect[k][1]) < 0.05
    q.stop()


def test_streaming_tile_rollup_matches_batch(spark, tmp_path):
    """Flagship-in-streaming: Morton tile assignment + watermarked windowed
    rollup over a bounded doc-point stream equals the batch plan."""
    from rlis2osm_spark.spatial.tiles import tile_cell

    src = tmp_path / "docs_src"
    pts = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(mins=(F.col("id") % 300).cast("int"))).alias("ts"),
        (7_500_000.0 + (F.col("id") * 397.0) % 300_000).alias("x"),
        (550_000.0 + (F.col("id") * 683.0) % 300_000).alias("y"),
    )
    pts.coalesce(2).write.parquet(str(src))

    stream = stream_ops.read_doc_point_stream(spark, str(src))
    assert stream.isStreaming
    rolled = stream_ops.streaming_tile_rollup(stream, res=6)
    stream_ops.run_available_now(rolled, str(tmp_path / "ck"), "stream_tiles")
    got = {(r.window_start, r.cell): (r.n_docs, r.min_doc)
           for r in spark.sql("select * from stream_tiles").collect()}

    batch = (
        pts.withColumn("cell", tile_cell(F.col("x"), F.col("y"), 6))
        .groupBy(F.window("ts", "1 hour").start.alias("w"), "cell")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .select(F.date_format("w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "cell", "n_docs", "min_doc")
    )
    want = {(r.window_start, r.cell): (r.n_docs, r.min_doc)
            for r in batch.collect()}
    assert got == want and len(want) > 10


def test_streaming_session_windows_match_batch_islands(spark, stream_src,
                                                       tmp_path):
    """Native session_window streaming == the batch session_window query
    (identical microsecond-exact gap semantics), session-by-session. (w2's
    islands use second-floored epochs — a deliberately different truncation
    — so w5, not w2, is the correct twin.)"""
    from rlis2osm_spark.queries.events import w5_session_window

    stream = stream_ops.read_event_stream(spark, stream_src)
    sess = stream_ops.session_windows(stream, gap="30 minutes")
    stream_ops.run_available_now(sess, str(tmp_path / "ck_sess"), "stream_sess")
    got = sorted(
        (r.user_id, r.n_events, r.start, r.end)
        for r in spark.sql("select * from stream_sess").collect())

    batch = w5_session_window(spark, SF_DIR)
    want = sorted(
        (r.user_id, r.n_events, r.start, r.end)
        for r in batch.collect())
    assert got == want and len(want) > 100


def test_stream_static_enrichment(spark, stream_src, tmp_path):
    dim = spark.range(0, 2000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 5).alias("cohort"))
    stream = stream_ops.read_event_stream(spark, stream_src)
    enriched = stream_ops.enrich_stream(stream, dim).groupBy("cohort").count()
    stream_ops.run_available_now(enriched, str(tmp_path / "ck_en"), "stream_en")
    got = {r.cohort: r["count"]
           for r in spark.sql("select * from stream_en").collect()}

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {r.cohort: r["count"]
            for r in ev.join(dim, "user_id", "left")
            .groupBy("cohort").count().collect()}
    assert got == want


def test_checkpoint_partial_write_not_served(spark, tmp_path):
    """A data directory without a committed manifest (crash mid-write) must
    be rebuilt, never served."""
    import os

    from rlis2osm_spark.plans.checkpoint import Checkpointer

    calls = []

    def build():
        calls.append(1)
        return spark.range(9)

    ck = Checkpointer(spark, str(tmp_path), "crash")
    ck.stage("s", build)
    assert len(calls) == 1
    # simulate a crash: data present, manifest gone
    os.remove(tmp_path / "crash" / "s" / "_manifest.json")
    out = Checkpointer(spark, str(tmp_path), "crash").stage("s", build)
    assert len(calls) == 2 and out.count() == 9
