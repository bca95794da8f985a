"""Deduplication operators for large-scale text corpora (first-class engine
components per the build brief; exercised by queries/content.py with DuckDB
oracles for the vocabulary-ranked variants and rows-only checks for the
xxhash64 production variants).

All operators are DataFrame -> DataFrame, native-expression-only (the only
shuffle per operator is the one its semantics require):

- exact:      one groupBy on a content hash (map-side partial agg).
- MinHash+LSH: shingle -> h hashes -> band buckets -> bucket self-join.
  The band bucket is the shuffle key; hot buckets (boilerplate shingles)
  are the skew risk — cap bucket width with ``max_bucket`` (drops
  pathological buckets loudly rather than letting one reducer own the job).
- SimHash:    per-token bit votes -> 64-bit signature; near-dups share
  signatures within small Hamming distance (pair generation via exact
  signature match here; banding over signature chunks scales it out).
- n-gram Jaccard: exact verification join for candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

P31 = 2147483647


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Position-carrying tokenization (E2 posexplode shape)."""
    return df.select(
        "*", F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "token")
    ).filter(F.col("token") != "").drop(text_col)


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact duplicate groups; survivor = min id (deterministic)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("survivor"),
             F.count("*").alias("n_copies"),
             F.sort_array(F.collect_list(id_col)).alias("members"))
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (window lead — no UDF)."""
    toks = tokenize(df.select(id_col, text_col), text_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("token")] + [F.lead("token", i).over(w) for i in range(1, n)]
    sh = toks.withColumn("shingle", F.concat_ws(" ", *parts))
    return (
        sh.filter(F.size(F.split("shingle", " ")) == n)
        .select(id_col, "shingle").distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """LSH candidate pairs via MinHash band buckets.

    Production path: shingle ids via xxhash64 (no global vocabulary state),
    h_i = (2i+1)*sid + i*c mod p, signature = per-band minhash vector,
    candidates = pairs sharing a band bucket. ``max_bucket`` drops
    degenerate buckets (boilerplate) — the explicit skew guard.
    """
    sh = shingles(df, id_col, text_col, shingle_n).withColumn(
        "sid", F.pmod(F.xxhash64("shingle"), F.lit(P31)))
    rows_per_band = n_hashes // n_bands
    h = sh.select(
        id_col, "sid",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("i"),
    ).withColumn(
        "hv", F.pmod((2 * F.col("i") + 1) * F.col("sid")
                     + F.col("i") * 40503 + 17, F.lit(P31)))
    sig = h.groupBy(id_col, "i").agg(F.min("hv").alias("mh"))
    band = sig.withColumn("band", F.expr(f"i div {rows_per_band}"))
    bucket = band.groupBy(id_col, "band").agg(
        F.array_join(F.transform(
            F.array_sort(F.collect_list(F.struct("i", "mh"))),
            lambda s: s["mh"].cast("string")), ",").alias("bucket"))
    sized = bucket.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "bucket")))
    ok = sized.filter(F.col("bucket_n") <= max_bucket)
    a, b = ok.alias("a"), ok.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join (the verification stage after
    LSH candidates at scale; standalone here)."""
    sh = shingles(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"),
                 F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard",
                    F.col("n_inter")
                    / (F.col("na") + F.col("nb") - F.col("n_inter")))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """SimHash signatures from token hashes: bit k votes +1/-1 by the k-th
    bit of xxhash64(token); sign of the vote sum sets the signature bit."""
    toks = tokenize(df.select(id_col, text_col), text_col).withColumn(
        "th", F.xxhash64("token"))
    votes = toks.select(
        id_col, "th",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("k"),
    ).withColumn(
        "vote",
        F.when(F.expr("shiftrightunsigned(th, cast(k as int)) & 1") == 1,
               1).otherwise(-1))
    per_bit = votes.groupBy(id_col, "k").agg(F.sum("vote").alias("s"))
    return (
        per_bit.withColumn(
            "bitval",
            F.when(F.col("s") > 0,
                   F.expr("shiftleft(1L, cast(k as int))")).otherwise(F.lit(0)))
        .groupBy(id_col)
        .agg(F.sum("bitval").alias("simhash"))
    )


def simhash_dup_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", bits: int = 64) -> DataFrame:
    """Exact-signature SimHash duplicate pairs (Hamming-0; banding over
    signature chunks generalizes to Hamming-k at scale)."""
    sig = simhash_signatures(df, id_col, text_col, bits)
    a, b = sig.alias("a"), sig.alias("b")
    return a.join(
        b, (F.col("a.simhash") == F.col("b.simhash"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    ).select(F.col(f"a.{id_col}").alias("doc_a"),
             F.col(f"b.{id_col}").alias("doc_b"))
