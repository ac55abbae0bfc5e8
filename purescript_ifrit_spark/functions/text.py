"""Text primitives as JVM-side Column expressions — no Python UDFs.

Everything here stays inside whole-stage codegen (built-in
pyspark.sql.functions only), so it runs at full scan speed on a 100 TB
corpus. These are the building blocks for operators/text_analysis.py and
operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A deliberately simple, deterministic tokenizer contract shared by every
# consumer (and by the DuckDB oracles, which replicate these expressions):
#   normalize = lower + collapse whitespace + strip
#   tokens    = split on \s+
_WS = r"\s+"


def normalize_text(c: Column) -> Column:
    """Lowercase, collapse internal whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(c), _WS, " "))


def tokens(c: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(c), " ")


def token_count(c: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return F.when(F.length(normalize_text(c)) == 0, F.lit(0)).otherwise(
        F.size(tokens(c))
    )


def bpe_ish_token_count(c: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punctuation boundaries — a cheap, deterministic proxy for a
    BPE tokenizer's token count (useful for budget accounting before real
    tokenization)."""
    pieces = F.regexp_extract_all(
        F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
    )
    return F.size(pieces)


def word_shingles(c: Column, n: int = 3) -> Column:
    """Array of n-word shingles (space-joined), distinct.

    Pure higher-order-function construction: sequence over start offsets,
    slice + array_join per shingle. Texts shorter than n words yield a
    single shingle of the whole text, so every non-empty doc has ≥1 shingle.
    """
    toks = tokens(c)
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def char_ngrams(c: Column, n: int = 5) -> Column:
    """Array of distinct character n-grams of the normalized text."""
    s = normalize_text(c)
    count = F.greatest(F.length(s) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), count), lambda i: F.substring(s, i, n))
    )


def punct_ratio(c: Column) -> Column:
    """Fraction of non-space characters that are punctuation/symbols."""
    s = normalize_text(c)
    nonspace = F.length(F.regexp_replace(s, r"\s", ""))
    punct = F.length(F.regexp_replace(s, r"[a-z0-9\s]", ""))
    return F.when(nonspace == 0, F.lit(0.0)).otherwise(
        punct.cast("double") / nonspace.cast("double")
    )


def mean_token_len(c: Column) -> Column:
    toks = tokens(c)
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(total / F.size(toks))


def stopword_ratio(c: Column, stopwords: tuple = ("the", "a", "of", "and", "is", "to", "in")) -> Column:
    """Fraction of tokens that are (English) stopwords — a classic quality
    signal: natural text has ~0.2-0.4, keyword spam ~0."""
    toks = tokens(c)
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_hits = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.when(F.array_contains(sw, t), 1).otherwise(0),
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_hits.cast("double") / F.size(toks).cast("double")
    )


def fingerprint(c: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Identical post-normalization content → identical fingerprint, the key
    for exact dedup across a distributed corpus."""
    return F.md5(normalize_text(c))
