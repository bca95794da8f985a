"""AQE skew-join handling: a hot join key gets split at runtime
(the backstop behind the engine's explicit salting)."""

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 90% of left rows share ONE key -> one hot shuffle partition
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 97 + 2)
            .alias("k"),
            F.col("id").alias("lv"))
        right = spark.range(0, 120).select(
            (F.col("id") + 1).alias("k"), (F.col("id") * 10).alias("rv"))
        j = left.join(right, "k")
        # collect on THIS dataset so its own AQE plan finalizes
        assert len(j.collect()) == 300_000
        final_plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "SortMergeJoin(skew=true)" in final_plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
