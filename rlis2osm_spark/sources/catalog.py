"""Catalog / path resolution (SURVEY §2.1 S4): the Spark-side descendant of
the reference's ``RlisPaths`` (/root/reference/rlis2osm/data.py:21-106) —
table-name -> location resolution with derived-artifact paths, no network
(S3's HTTP download has no cluster analogue: object storage is read
directly; in-sandbox the datagen module synthesizes inputs).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

RLIS_TABLES = ("streets", "trails", "bike_routes")
DERIVED_TABLES = ("combined", "dissolved", "documents_rlis", "media")
ORACLE_TABLES = ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings")


@dataclass
class Catalog:
    """Resolves logical table names to parquet locations (locally) — the
    same surface maps to Iceberg identifiers on a cluster."""

    data_dir: str
    derived_dir: str | None = None
    overrides: dict = field(default_factory=dict)

    def path(self, table: str) -> str:
        if table in self.overrides:
            return self.overrides[table]
        root = self.data_dir
        if table in DERIVED_TABLES and self.derived_dir:
            root = self.derived_dir
        return os.path.join(root, f"{table}.parquet")

    def exists(self, table: str) -> bool:
        return os.path.exists(self.path(table))

    def load(self, spark: SparkSession, table: str) -> DataFrame:
        p = self.path(table)
        if not os.path.exists(p):
            raise FileNotFoundError(
                f'table "{table}" not found at "{p}" '
                "(reference parity: RlisPaths raises on missing inputs)")
        return spark.read.parquet(p)

    def save(self, df: DataFrame, table: str, mode: str = "overwrite") -> str:
        p = self.path(table)
        df.write.mode(mode).parquet(p)
        return p
