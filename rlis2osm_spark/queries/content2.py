"""Second batch of driver queries wiring the training-data operator modules
(operators/dedup.py, similarity.py, textstats.py, multimodal.py) and the
full combine pipeline. The multimodal plumbing query carries an exact
oracle (its stub decoder is a pure function of payload length); ANN / prod
SimHash / quality are rows-only (engine-hash or float-heavy).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from rlis2osm_spark.driver_support import ensure_package_on_workers
from rlis2osm_spark.queries.util import (
    case_int_map, load, pick, sql_int_list, sql_str_list)
from rlis2osm_spark.queries.rlis_cols import (
    BIKETHERES, BIKETYPS, _derived_trails, _T1320_SQL,
)


def ann_lsh_topk(spark, sf_dir):
    """LSH ANN over the embeddings table (random-hyperplane buckets +
    exact cosine re-rank). Rank-only output."""
    from rlis2osm_spark.operators.similarity import lsh_ann_topk

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 15)
    base = emb.filter(F.col("vec_id") >= 15)
    out = lsh_ann_topk(base, probes, dim=64, k=3, n_planes=4)
    return out.select("probe_id", "neighbor_id", "rank")


def ann_ivf_topk(spark, sf_dir):
    """IVF ANN over the embeddings table (k-means coarse quantizer,
    n_probe nearest cells, exact cosine re-rank). Rows-only (iterative
    training); recall vs brute force asserted in pytest."""
    from rlis2osm_spark.operators.similarity import ivf_ann_topk

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 15)
    base = emb.filter(F.col("vec_id") >= 15)
    out = ivf_ann_topk(base, probes, dim=64, k=3, k_centroids=8, n_probe=3)
    return out.select("probe_id", "neighbor_id", "rank")


def x3_quality_features(spark, sf_dir):
    """Full text-quality feature set (lang-ID, ratios, composite score)."""
    from rlis2osm_spark.operators.textstats import quality_features

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_features(docs).drop("text")


def x4_simhash_prod(spark, sf_dir):
    """Production SimHash (xxhash64 token hashes, 64-bit signatures)."""
    from rlis2osm_spark.operators.dedup import simhash_signatures

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return simhash_signatures(docs.select("doc_id", "text"))


def d5_minhash_engine(spark, sf_dir):
    """MinHash-LSH via the engine operator (skew-guarded band buckets)."""
    from rlis2osm_spark.operators.dedup import minhash_lsh_pairs

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return minhash_lsh_pairs(docs, n_hashes=8, n_bands=4)


def m1_media_features(spark, sf_dir):
    """Multimodal plumbing over derived binary payloads (text bytes stand
    in for image blobs): mapInPandas batch decode -> typed features. The
    stub decoder is a pure function of byte length, so DuckDB can predict
    width/height/n_bytes exactly."""
    ensure_package_on_workers(spark)
    from rlis2osm_spark.operators.multimodal import extract_image_features

    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        F.concat(F.lit("doc:"), F.col("doc_id")).alias("media_ref"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("image").alias("media_kind"),
    )
    feats = extract_image_features(media, feat_dim=8)
    return feats.select("media_ref", "n_bytes", "width", "height")


_M1_SQL = """
SELECT 'doc:' || doc_id AS media_ref,
       strlen(text) AS n_bytes,
       16 + (strlen(text) * 31) % 240 AS width,
       16 + (strlen(text) * 17) % 240 AS height
FROM documents
"""


def rlis_combine_full(spark, sf_dir):
    """The full EP2 combine pipeline (streets expand/translate/titlecase +
    bike overlay + trails branch + unionByName) over derived RLIS-shaped
    inputs; per-source highway histogram."""
    ensure_package_on_workers(spark)
    from rlis2osm_spark.operators.combine import combine
    from rlis2osm_spark.queries.rlis_python import _derived_streets

    streets = _derived_streets(spark, sf_dir)

    trails = _derived_trails(spark, sf_dir).withColumnsRenamed(
        {"tkey": "fid"})

    @F.pandas_udf(BinaryType())
    def tgeom(fids: pd.Series) -> pd.Series:
        from rlis2osm_spark.functions.wkb import (
            encode_linestring, encode_multilinestring)

        out = []
        for fid in fids:
            x = float(int(fid) % 1000) * 400.0
            y = float(int(fid) // 1000 % 100) * 400.0
            if int(fid) % 7 == 0:
                out.append(encode_multilinestring(
                    [[(x, y), (x + 100.0, y)],
                     [(x + 100.0, y), (x + 200.0, y + 30.0)]]))
            else:
                out.append(encode_linestring([(x, y), (x + 150.0, y + 10.0)]))
        return pd.Series(out, dtype=object)

    trails = trails.withColumn("geometry", tgeom("fid"))

    supp = load(spark, sf_dir, "supplier")
    bikes = supp.select(
        F.col("s_suppkey").alias("fid"),
        (100000 + (F.col("s_suppkey") * 13) % 2000).cast("long").alias("BIKEID"),
        pick(BIKETYPS, 1 + F.col("s_suppkey") % 11).alias("BIKETYP"),
        pick(BIKETHERES, 1 + F.col("s_suppkey") % 5).alias("BIKETHERE"),
        F.lit(None).cast("binary").alias("geometry"),
    )

    out = combine(streets, trails, bikes)
    return (
        out.groupBy("src_table", "highway")
        .agg(F.count("*").alias("n"),
             F.count("name").alias("n_named"))
        .orderBy("src_table", "highway")
    )


def _combine_full_sql() -> str:
    """Oracle for the full combine histogram (r2): both branches are
    SQL-determined — street highway from TYPE (names never null, no
    downgrade), street fan-out = max(#kept overlay bikes per LOCALID, 1),
    trails through the t13_t20 transcription with the fid%7 multipart
    doubling; street names post-titlecase are never null ('' for null)."""
    from rlis2osm_spark.operators.streets import HIGHWAY_BY_TYPE

    types = sorted(HIGHWAY_BY_TYPE)
    return f"""
WITH s_base AS (
  SELECT p_partkey, 100000 + p_partkey AS localid,
         {sql_int_list(types)}[1 + (p_partkey // 4) % {len(types)}] AS type
  FROM part
), s_hw AS (
  SELECT localid, {case_int_map(HIGHWAY_BY_TYPE, "type")} AS highway FROM s_base
), bk AS (
  SELECT 100000 + (s_suppkey * 13) % 2000 AS bikeid,
         {sql_str_list(BIKETYPS)}[1 + s_suppkey % 11] AS biketyp,
         {sql_str_list(BIKETHERES)}[1 + s_suppkey % 5] AS bikethere
  FROM supplier
), bkept AS (
  SELECT CAST(substr(CAST(bikeid AS VARCHAR), -6) AS INT) AS local_id FROM bk
  WHERE COALESCE(biketyp, '') <> '' OR (bikethere IS NOT NULL AND bikethere <> '')
), bn AS (SELECT local_id, COUNT(*) AS nm FROM bkept GROUP BY local_id),
s_rows AS (
  SELECT s.highway, GREATEST(COALESCE(bn.nm, 0), 1) AS mult
  FROM s_hw s LEFT JOIN bn ON s.localid = bn.local_id
),
s_hist AS (
  SELECT 'streets' AS src_table, highway,
         CAST(SUM(mult) AS BIGINT) AS n, CAST(SUM(mult) AS BIGINT) AS n_named
  FROM s_rows GROUP BY highway
),
t_rows AS (
  SELECT highway, name, CASE WHEN tkey % 7 = 0 THEN 2 ELSE 1 END AS mult
  FROM ({_T1320_SQL})
),
t_hist AS (
  SELECT 'trails' AS src_table, highway, CAST(SUM(mult) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN name IS NOT NULL THEN mult ELSE 0 END) AS BIGINT) AS n_named
  FROM t_rows GROUP BY highway
)
SELECT * FROM s_hist UNION ALL SELECT * FROM t_hist
ORDER BY src_table, highway
"""


QUERIES = {
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "x3_quality_features": x3_quality_features,
    "x4_simhash_prod": x4_simhash_prod,
    "d5_minhash_engine": d5_minhash_engine,
    "m1_media_features": m1_media_features,
    "rlis_combine_full": rlis_combine_full,
}

ORACLES = {
    "m1_media_features": _M1_SQL,
    "rlis_combine_full": _combine_full_sql(),
}


def d7_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup (dedup family): the exact verification
    join, oracle-checked. The raw embeddings are random (max pairwise cos
    ~0.44), so near-dup structure is DERIVED deterministically in-query:
    each base vector gets a +0.02-shifted copy (cos ~0.998) and a negated
    copy (cos -1). Output = (doc_a, doc_b) int pairs only — cosine values
    sit at ~0.998 vs <0.5, far from the 0.9 threshold, so cross-engine
    float fold-order cannot flip a pair."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 120)
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    shifted = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("v", lambda x: x + 0.02).alias("v"))
    negated = base.select(
        (F.col("vec_id") + 2000).alias("vec_id"),
        F.transform("v", lambda x: -x).alias("v"))
    allv = base.unionByName(shifted).unionByName(negated)

    from rlis2osm_spark.operators.similarity import cosine

    a = allv.select(F.col("vec_id").alias("doc_a"), F.col("v").alias("va"))
    b = allv.select(F.col("vec_id").alias("doc_b"), F.col("v").alias("vb"))
    return (
        a.crossJoin(b).filter(F.col("doc_a") < F.col("doc_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= 0.9)
        .select("doc_a", "doc_b")
    )


_D7_SQL = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < 120
),
allv AS (
  SELECT vec_id, v FROM base
  UNION ALL SELECT vec_id + 1000, list_transform(v, x -> x + 0.02) FROM base
  UNION ALL SELECT vec_id + 2000, list_transform(v, x -> -x) FROM base
),
pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         list_cosine_similarity(a.v, b.v) AS cos
  FROM allv a JOIN allv b ON a.vec_id < b.vec_id
)
SELECT doc_a, doc_b FROM pairs WHERE cos >= 0.9
"""


def x6_subword_tokens(spark, sf_dir):
    """BPE-ish token counting (build brief): whitespace tokens vs regex
    subword estimate ([A-Za-z]+|[0-9]+|punct) — native regexp on both
    engines."""
    from rlis2osm_spark.operators.textstats import (
        TOKEN_RX, subword_count, token_count)

    docs = load(spark, sf_dir, "documents")
    _ = TOKEN_RX
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws_tokens"),
        subword_count(F.col("text")).alias("n_subword_tokens"),
    )


_X6_SQL = r"""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subword_tokens
FROM documents
"""


def neardup_lsh_engine(spark, sf_dir):
    """Production near-dup path: multi-table LSH OR-construction + exact
    cosine verify (operators/similarity.py). The derived input's ground
    truth is analytic — every (i, 1000+i) shifted pair has cos ~0.998,
    every cross pair < 0.5 — and the whole path is deterministic (seeded
    LCG hyperplanes), so the expected-output oracle doubles as a standing
    recall==1.0 assertion at the driver's gate."""
    from rlis2osm_spark.operators.similarity import cosine_neardup_pairs

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 120)
    base = emb.select("vec_id", "embedding")
    shifted = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.02)).alias("embedding"))
    allv = base.unionByName(shifted)
    out = cosine_neardup_pairs(allv, dim=64, threshold=0.9,
                               n_tables=6, n_planes=6)
    return out.select("doc_a", "doc_b")


QUERIES.update({
    "d7_embedding_neardup": d7_embedding_neardup,
    "x6_subword_tokens": x6_subword_tokens,
    "neardup_lsh_engine": neardup_lsh_engine,
})
ORACLES.update({
    "d7_embedding_neardup": _D7_SQL,
    "x6_subword_tokens": _X6_SQL,
})


def _x3_sql() -> str:
    """Full SQL transcription of quality_features (moves x3 from rows-only
    to oracle): same token/stopword/punct/repetition arithmetic in the same
    fold order, lang argmax with the ascending-key tie-break."""
    from rlis2osm_spark.operators.textstats import LANG_MARKERS, STOPWORDS_EN

    stop = str(STOPWORDS_EN).replace('"', "'")
    lang_cols = ",\n         ".join(
        f"len(list_filter(lotoks, w -> list_contains("
        f"{str(m).replace(chr(34), chr(39))}, w))) AS s_{lang}"
        for lang, m in LANG_MARKERS.items())
    # argmax, ties broken by ascending language code
    langs = sorted(LANG_MARKERS)
    guess = " ".join(
        f"WHEN s_{code} = gmax THEN '{code}'" for code in langs)
    return rf"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS toks,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS lotoks
  FROM documents
), f AS (
  SELECT doc_id, text, toks,
         len(toks) AS n_tok,
         CASE WHEN len(toks) = 0 THEN 1 ELSE len(toks) END AS safe_n,
         len(list_filter(toks, w -> list_contains({stop}, w))) AS n_stop,
         length(regexp_replace(text, '[^!-/:-@\[-`{{-~]', '', 'g')) AS n_punct,
         length(text) AS n_chars,
         len(list_distinct(toks)) AS n_uniq,
         {lang_cols}
  FROM t
), g AS (
  SELECT *, GREATEST(s_de, s_en, s_es, s_fr) AS gmax,
         1.0 - n_uniq / safe_n AS rep_ratio
  FROM f
)
SELECT doc_id,
       n_tok AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subwords,
       ROUND(n_stop / safe_n, 6) AS stopword_ratio,
       ROUND(n_punct / GREATEST(n_chars, 1), 6) AS punct_ratio,
       ROUND(rep_ratio, 6) AS repetition_ratio,
       CASE WHEN gmax = 0 THEN NULL {guess} END AS lang_guess,
       ROUND(LEAST(1.0, n_tok / 100.0) * 0.4
             + (1.0 - LEAST(1.0, n_punct / GREATEST(n_chars, 1) * 5)) * 0.2
             + (1.0 - rep_ratio) * 0.2
             + LEAST(1.0, n_stop / safe_n * 5) * 0.2, 6) AS quality
FROM g
"""


ORACLES.update({"x3_quality_features": _x3_sql()})


_NEARDUP_SQL = """
SELECT vec_id AS doc_a, vec_id + 1000 AS doc_b
FROM embeddings WHERE vec_id < 120
"""
ORACLES.update({"neardup_lsh_engine": _NEARDUP_SQL})
