"""Bucketed co-located joins — the local stand-in for Iceberg
``bucket(N, key)`` partition transforms (SURVEY §4.2 #1).

At 100 TB the doc<->media join and every cell-keyed join run over tables
bucketed on their join key: both sides' files are pre-hashed into the same
N buckets, so the join needs **no shuffle at all** (verified by the plan
assertion in tests — no Exchange under the SortMergeJoin)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 8,
                  mode: str = "overwrite") -> None:
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)


def write_range_clustered(df: DataFrame, path: str, col: str = "cell",
                          n_files: int = 8, mode: str = "overwrite") -> None:
    """Range-partitioned shuffle into a spatially clustered layout (north
    rule: "range-partitioned shuffles"; Iceberg analogue: a sort order on
    the cell key).

    ``repartitionByRange`` samples the key distribution and assigns
    contiguous key ranges to output files, so every parquet file carries a
    DISJOINT [min, max] cell range in its footer — a spatial range scan
    (``cell BETWEEN a AND b``) then prunes whole files from the listing,
    which hash bucketing cannot do. Morton cells make this 2-D locality:
    a cell range is a screen-region query."""
    from pyspark.sql import functions as F

    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode(mode)
        .parquet(path)
    )
