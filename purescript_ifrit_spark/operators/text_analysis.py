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


def pack_sequences(
    df: DataFrame,
    tokens_col: str = "chunk_tokens",
    order_cols: tuple = ("doc_id", "chunk_idx"),
    pack_size: int = 512,
) -> DataFrame:
    """Assign each chunk to a training-sequence bin of ~`pack_size` tokens.

    Deterministic streaming approximation of greedy packing: chunks are
    ordered by `order_cols`, and bin = floor((cumulative_tokens - tokens) /
    pack_size) over that order. A bin may overflow by at most one chunk
    (the standard first-fit-in-order trade); no bin is underfilled except
    the last. One window pass = one global sort — at corpus scale, run it
    per shard (repartitionByRange on the leading order column) so the
    window never crosses shard boundaries.
    """
    from pyspark.sql import Window

    w = (
        Window.orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    return df.withColumn(
        "pack_id",
        F.floor((cum - F.col(tokens_col)) / F.lit(pack_size)).cast("long"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard pre-training/RAG chunking step.

    chunk i covers tokens [i·stride, i·stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the last chunk may be short; documents
    shorter than one chunk yield exactly one chunk. Pure higher-order
    functions + posexplode — chunking happens in the scan stage, so a
    100 TB corpus chunks at read speed with no shuffle at all."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = X.tokens(F.col(text_col))
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(n - chunk_tokens, 0) / stride)
    extra = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
    n_chunks = F.lit(1) + F.ceil(extra / F.lit(stride)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * stride + 1, chunk_tokens), " "
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).withColumn("chunk_tokens", F.size(F.split(F.col("chunk_text"), " ")))
