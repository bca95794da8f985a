"""Shared helpers for the driver-contract queries."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def sql_str_list(values) -> str:
    """Python list -> SQL array literal of strings (NULLs preserved)."""
    items = ", ".join("NULL" if v is None else f"'{v}'" for v in values)
    return f"[{items}]"


def sql_int_list(values) -> str:
    items = ", ".join("NULL" if v is None else str(v) for v in values)
    return f"[{items}]"


def spark_str_array(values) -> Column:
    return F.array(*[F.lit(v).cast("string") for v in values])


def spark_int_array(values) -> Column:
    return F.array(*[F.lit(v).cast("int") for v in values])


def pick(values, idx_col: Column) -> Column:
    """1-based list indexing, same as DuckDB list_extract/[]."""
    return F.element_at(spark_str_array(values), idx_col.cast("int"))


def pick_int(values, idx_col: Column) -> Column:
    return F.element_at(spark_int_array(values), idx_col.cast("int"))


def case_map(mapping: dict, col_sql: str, else_sql: str = "NULL") -> str:
    """dict -> SQL CASE expression (insertion order preserved)."""
    whens = " ".join(
        f"WHEN {col_sql} = '{k}' THEN "
        + ("NULL" if v is None else f"'{v}'")
        for k, v in mapping.items()
    )
    return f"CASE {whens} ELSE {else_sql} END"


def case_int_map(mapping: dict, col_sql: str, else_sql: str = "NULL") -> str:
    whens = " ".join(
        f"WHEN {col_sql} = {k} THEN "
        + ("NULL" if v is None else f"'{v}'")
        for k, v in mapping.items()
    )
    return f"CASE {whens} ELSE {else_sql} END"


def spark_str_map(mapping: dict) -> Column:
    pairs = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v).cast("string"))
    return F.create_map(*pairs)


def spark_int_map(mapping: dict) -> Column:
    pairs = []
    for k, v in mapping.items():
        pairs.append(F.lit(int(k)))
        pairs.append(F.lit(v).cast("string"))
    return F.create_map(*pairs)
