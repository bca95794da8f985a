"""Bucketed join must be shuffle-free: no Exchange on either side."""

from pyspark.sql import functions as F

from rlis2osm_spark.plans.bucketing import bucketed_join, save_bucketed
from rlis2osm_spark.sources.documents import first_media_ref


def test_bucketed_doc_media_join_no_shuffle(spark, synth_dir):
    docs = spark.read.parquet(f"{synth_dir}/documents_rlis.parquet")
    media = spark.read.parquet(f"{synth_dir}/media.parquet")
    keyed = docs.select(
        "doc_id", first_media_ref(F.col("spans")).alias("media_ref"))

    save_bucketed(keyed, "docs_b", "media_ref", n_buckets=4)
    save_bucketed(media.select("media_ref", "media_kind"),
                  "media_b", "media_ref", n_buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at sandbox scale the planner would broadcast; disable it so the
        # plan shows what a 100TB fact<->fact bucketed join does
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "docs_b", "media_b", "media_ref")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located buckets
        assert "Bucketed: true" in plan
        assert joined.count() == keyed.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS docs_b")
        spark.sql("DROP TABLE IF EXISTS media_b")
