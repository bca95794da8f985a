"""In-flight pipeline metrics (SURVEY §2.5 A7): the distributed descendant
of the reference's ``LogSet`` progress telemetry (dissolve.py:169-198).

``observe()`` attaches named aggregates to a DataFrame that are collected
as a side effect of the action that materializes it — row counts and data
-quality counters with ZERO extra scans (vs LogSet's per-row mutation).
Per-partition row counts live in plans/checkpoint.py (they need the
post-write layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str,
             null_cols: list[str] | None = None) -> tuple[DataFrame, Observation]:
    """Attach an Observation: total rows + null counts for ``null_cols``.

    Usage::
        df, obs = observed(df, "combine", ["highway"])
        df.write...   # any action
        obs.get       # {'rows': ..., 'null_highway': ...}
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in null_cols or []:
        metrics.append(
            F.sum(F.col(f"`{c}`").isNull().cast("long")).alias(f"null_{c}"))
    return df.observe(obs, *metrics), obs
