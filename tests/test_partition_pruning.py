"""Spatial partition pruning: a tiled dataset written partitioned by its
parent cell turns spatial predicates into partition pruning — the local
stand-in for Iceberg partition transforms on the cell column."""

from pyspark.sql import functions as F

from rlis2osm_spark.pipeline import tile_assignment


def test_cell_partitioned_scan_prunes(spark, synth_dir, tmp_path):
    docs = spark.read.parquet(f"{synth_dir}/documents_rlis.parquet")
    media = spark.read.parquet(f"{synth_dir}/media.parquet")
    tiled = tile_assignment(docs, media, res=8).drop("spans")
    tiled = tiled.withColumn("pcell", F.shiftright("cell", 8))

    out = str(tmp_path / "tiled_by_cell")
    tiled.write.partitionBy("pcell").parquet(out)

    back = spark.read.parquet(out)
    one_cell = back.select("pcell").distinct().limit(1).collect()[0][0]
    q = back.filter(F.col("pcell") == one_cell)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the spatial predicate became a partition filter (no data-file scan
    # of other cells)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "pcell" in pf
    assert q.count() > 0
    # correctness: selected rows all carry the requested parent cell
    assert q.filter(F.shiftright("cell", 8) != one_cell).count() == 0
