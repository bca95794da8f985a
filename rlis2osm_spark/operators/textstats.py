"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting — native expressions end-to-end (the descendant of
the reference's name-normalization layer, generalized to corpus hygiene).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lists (n-gram heuristic): enough for a
# deterministic argmax language guess; swap for real profiles in prod
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "with"],
    "de": ["der", "die", "und", "ist", "mit", "nicht"],
    "fr": ["le", "la", "et", "est", "les", "pour"],
    "es": ["el", "la", "de", "que", "los", "para"],
}

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

# BPE-ish token estimate: words + digit runs + punctuation clusters
TOKEN_RX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def subword_count(text: Column) -> Column:
    """BPE-ish token estimate via regexp extraction (native)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RX), F.lit(0)))


def lang_scores(text: Column) -> Column:
    """map<lang, marker hits> over the marker lists."""
    toks = tokens(F.lower(text))
    entries = []
    for lang, markers in LANG_MARKERS.items():
        entries.append(F.struct(
            F.lit(lang).alias("key"),
            F.size(F.filter(toks, lambda w: w.isin(*markers))).alias("value")))
    return F.map_from_entries(F.array(*entries))


def lang_guess(text: Column) -> Column:
    """argmax language (deterministic tie-break by language code)."""
    scores = lang_scores(text)
    arr = F.map_entries(scores)
    best = F.array_sort(
        arr, lambda a, b: F.when(a["value"] > b["value"], -1)
        .when(a["value"] < b["value"], 1)
        .when(a["key"] < b["key"], -1).otherwise(1))
    return F.when(best[0]["value"] > 0, best[0]["key"])


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition features + a composite
    quality score in [0, 1]."""
    text = F.col(text_col)
    toks = tokens(text)
    n_tok = F.size(toks)
    safe_n = F.when(n_tok == 0, 1).otherwise(n_tok)
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS_EN)))
    n_punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    n_chars = F.length(text)
    n_uniq = F.size(F.array_distinct(toks))
    rep_ratio = 1.0 - n_uniq / safe_n
    quality = F.round(
        F.least(F.lit(1.0), n_tok / F.lit(100.0)) * 0.4
        + (1.0 - F.least(F.lit(1.0), n_punct / F.greatest(n_chars, F.lit(1)) * 5)) * 0.2
        + (1.0 - rep_ratio) * 0.2
        + F.least(F.lit(1.0), n_stop / safe_n * 5) * 0.2, 6)
    return df.withColumns({
        "n_tokens": n_tok,
        "n_subwords": subword_count(text),
        "stopword_ratio": F.round(n_stop / safe_n, 6),
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
        "repetition_ratio": F.round(rep_ratio, 6),
        "lang_guess": lang_guess(text),
        "quality": quality,
    })


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Order-sensitive 64-bit document fingerprint: xxhash64 rolling fold
    over (position, token-hash) — the production variant of the
    vocabulary-ranked oracle query (x2_fingerprint)."""
    toks = df.select(
        id_col, F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "t")
    ).filter(F.col("t") != "")
    h = toks.withColumn("th", F.xxhash64("t", "pos"))
    return h.groupBy(id_col).agg(
        F.bit_xor("th").alias("fp_xor"),
        F.sum(F.pmod("th", F.lit(2147483647))).alias("fp_sum"),
        F.count("*").alias("n_tokens"),
    )
