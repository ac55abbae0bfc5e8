"""Text analysis operators: language ID, quality scoring, token counting,
fingerprinting (SURVEY.md §2.7). All pure Column expressions — scan-speed.

Every operator here is deliberately expressible in ANSI-ish SQL too, so the
driver's DuckDB oracle can recompute it exactly (see suite.py): same regexes
(RE2/Java compatible subset), same tie-breaking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from purescript_ifrit_spark.functions import text as X

# language → stopword alternation, deliberately tiny and deterministic.
# Order matters: ties resolve in this priority order.
LANG_MARKERS = (
    ("en", r"\b(the|of|and|is|to)\b"),
    ("de", r"\b(der|die|das|und|ist)\b"),
    ("fr", r"\b(le|la|les|et|est)\b"),
    ("es", r"\b(el|los|las|es|y)\b"),
)


def lang_scores(c: Column) -> list:
    s = F.lower(c)
    return [
        F.size(F.regexp_extract_all(s, F.lit(rx), 0)).alias(f"score_{lang}")
        for lang, rx in LANG_MARKERS
    ]


def lang_id(c: Column) -> Column:
    """Heuristic language ID: argmax of stopword-marker counts; 'und' when
    no marker hits. Ties resolve by LANG_MARKERS priority order."""
    s = F.lower(c)
    scores = {
        lang: F.size(F.regexp_extract_all(s, F.lit(rx), 0))
        for lang, rx in LANG_MARKERS
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build reversed so earlier langs win ties
    for lang, _ in reversed(LANG_MARKERS):
        expr = F.when(
            (scores[lang] > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(expr)
    return expr


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Attach the classic cheap quality signals used for corpus filtering."""
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", X.token_count(c))
        .withColumn("mean_token_len", F.round(X.mean_token_len(c), 6))
        .withColumn("punct_ratio", F.round(X.punct_ratio(c), 6))
        .withColumn("stopword_ratio", F.round(X.stopword_ratio(c), 6))
    )


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Single scalar quality score in [0,1]: penalizes too-short docs,
    punctuation soup and stopword-free keyword spam. Deterministic, linear,
    documented — NOT a learned model."""
    feats = quality_features(df, text_col)
    len_term = F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0))
    punct_term = 1.0 - F.least(F.col("punct_ratio") * 4.0, F.lit(1.0))
    stop_term = F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
    return feats.withColumn(
        "quality",
        F.round(0.4 * len_term + 0.3 * punct_term + 0.3 * stop_term, 6),
    )


def token_stats(df: DataFrame, text_col: str) -> DataFrame:
    c = F.col(text_col)
    return df.select(
        *df.columns,
        X.token_count(c).alias("n_tokens"),
        X.bpe_ish_token_count(c).alias("n_bpe_ish"),
        F.length(c).alias("n_chars_raw"),
    )


def fingerprint_docs(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("fingerprint", X.fingerprint(F.col(text_col)))
