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
    tokenization). regexp_count avoids materializing the match array."""
    return F.regexp_count(F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"))


def word_shingles(c: Column, n: int = 3) -> Column:
    """Array of n-word shingles (space-joined), distinct.

    Single regex pass with a lookahead capture — `(?=(tok tok tok))` captures
    the overlapping n-gram while `(?:\\S+ ?)` consumes one token. Benchmarked
    13× faster than the transform+slice+array_join construction (higher-order
    functions execute interpreted, outside whole-stage codegen; one regex
    scan stays in a codegen'd projection). Texts shorter than n words yield
    a single shingle of the whole text, so every non-empty doc has ≥1
    shingle (the regex alone would yield none — hence the fallback branch).
    Blank/whitespace-only text yields an EMPTY array (not [""]): blank docs
    must never shingle-match each other, and callers filter on
    size(shingles) > 0.
    """
    s = normalize_text(c)
    toks = tokens(c)
    rx = "(?=(" + " ".join([r"\S+"] * n) + r"))(?:\S+ ?)"
    grams = F.array_distinct(F.regexp_extract_all(s, F.lit(rx), 1))
    empty = F.array().cast("array<string>")
    return (
        F.when(F.length(s) == 0, empty)
        .when(F.size(toks) >= n, grams)
        .otherwise(F.array(s))
    )


def char_ngrams(c: Column, n: int = 5) -> Column:
    """Array of distinct character n-grams of the normalized text (same
    lookahead-capture construction as word_shingles; blank text → empty
    array, matching the word_shingles contract)."""
    s = normalize_text(c)
    grams = F.array_distinct(
        F.regexp_extract_all(s, F.lit(f"(?=(.{{{n}}}))."), 1)
    )
    return (
        F.when(F.length(s) == 0, F.array().cast("array<string>"))
        .when(F.length(s) >= n, grams)
        .otherwise(F.array(s))
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
    """Mean token length — closed form over the normalized text (total token
    chars = length minus the single separating spaces), no per-token fold
    (higher-order folds execute interpreted, outside codegen)."""
    s = normalize_text(c)
    n = token_count(c)
    total_chars = (F.length(s) - (n - F.lit(1))).cast("double")
    return F.when(n == 0, F.lit(0.0)).otherwise(total_chars / n.cast("double"))


def stopword_ratio(c: Column, stopwords: tuple = ("the", "a", "of", "and", "is", "to", "in")) -> Column:
    """Fraction of tokens that are (English) stopwords — a classic quality
    signal: natural text has ~0.2-0.4, keyword spam ~0.

    Counted with one regexp_count over the normalized text (whole tokens
    delimited by space/string edges — identical semantics to a per-token
    equality fold, which would run interpreted)."""
    import re as _re

    s = normalize_text(c)
    n = token_count(c)
    # escape each word: callers may pass tokens containing regex
    # metacharacters ("c++", "a.b") and the contract is literal equality
    rx = "(?:^| )(?:" + "|".join(_re.escape(w) for w in stopwords) + ")(?= |$)"
    n_hits = F.regexp_count(s, F.lit(rx))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        n_hits.cast("double") / n.cast("double")
    )


def fingerprint(c: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Identical post-normalization content → identical fingerprint, the key
    for exact dedup across a distributed corpus."""
    return F.md5(normalize_text(c))
