"""Similarity search over embedding columns (``array<float>``).

Two paths, both pure native expressions (no Python in the hot loop):

- ``brute_force_topk`` — exact cosine top-k; the correctness baseline and
  the right answer when the probe set is small (broadcast probes, one pass
  over the base, per-probe window top-k).
- ``lsh_ann_topk`` — the scale path: random-hyperplane LSH buckets as the
  candidate generator (signature = sign bits of P pseudo-random
  projections, folded to a bucket id), exact cosine re-rank inside the
  bucket. Recall/latency trades via ``n_planes`` (fewer planes -> bigger
  buckets -> higher recall, more compute). Hyperplane weights are
  plan-time literal arrays derived from a seeded LCG, so signatures are
  deterministic and identical on every executor.

At 100 TB the base table is bucketed by ``bucket`` (Iceberg bucket
transform), so a probe touches one bucket's files only — ANN becomes
partition pruning. An IVF variant (k-means centroids as bucket ids) drops
in by replacing ``bucket_expr``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double_vec(col: Column) -> Column:
    return F.transform(col, lambda v: v.cast("double"))


def brute_force_topk(
    base: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the probe set, scan the base once."""
    b = base.select(F.col(id_col).alias("neighbor_id"),
                    as_double_vec(F.col(vec_col)).alias("bv"))
    p = probes.select(F.col(id_col).alias("probe_id"),
                      as_double_vec(F.col(vec_col)).alias("pv"))
    pairs = b.crossJoin(F.broadcast(p)).filter(
        F.col("probe_id") != F.col("neighbor_id"))
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("cos", cosine(F.col("pv"), F.col("bv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank")
    )


def _lcg_weights(plane: int, dim: int, seed: int = 1234567) -> list[float]:
    """Deterministic pseudo-random hyperplane in [-1, 1)^dim."""
    out = []
    state = (seed + plane * 2654435761) % (1 << 31)
    for _ in range(dim):
        state = (state * 1103515245 + 12345) % (1 << 31)
        out.append(state / float(1 << 30) - 1.0)
    return out


def lsh_bucket_expr(vec: Column, dim: int, n_planes: int = 8,
                    seed: int = 1234567) -> Column:
    """Random-hyperplane signature -> integer bucket id (native)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        w = F.array(*[F.lit(x) for x in _lcg_weights(p, dim, seed)])
        proj = _dot(vec, w)
        bucket = bucket + F.when(proj > 0,
                                 F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    base: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: bucket equi-join candidates, exact cosine re-rank."""
    b = base.select(F.col(id_col).alias("neighbor_id"),
                    as_double_vec(F.col(vec_col)).alias("bv"))
    b = b.withColumn("bucket", lsh_bucket_expr(F.col("bv"), dim, n_planes))
    p = probes.select(F.col(id_col).alias("probe_id"),
                      as_double_vec(F.col(vec_col)).alias("pv"))
    p = p.withColumn("bucket", lsh_bucket_expr(F.col("pv"), dim, n_planes))

    cands = p.join(b, "bucket").filter(
        F.col("probe_id") != F.col("neighbor_id"))
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        cands.withColumn("cos", cosine(F.col("pv"), F.col("bv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos", "rank", "bucket")
    )
