"""Text-analysis entries: language id, quality, tokens, fingerprints, chunking, term/tfidf stats, PII, contamination."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purescript_ifrit_spark.api import run_query
from purescript_ifrit_spark.sources.tables import load_table
from purescript_ifrit_spark.suite._registry import (
    register,
    register_demo,
)
from purescript_ifrit_spark.suite._fixtures import (
    _DUCK_8GRAMS,
    _NORM_SQL,
    _QUALITY_ORACLE_EXPR,
    _QUALITY_ORACLE_INPUTS,
    _lang_oracle,
    _pii_aug_col,
    _pii_oracle,
    _rolling_fp_oracle,
)



@register(
    "x_text_token_count",
    # blank-doc guard: string_split('') is [''] (len 1) but token_count is 0
    "SELECT doc_id, "
    f"CAST(CASE WHEN length({_NORM_SQL}) = 0 THEN 0 "
    f"ELSE len(string_split({_NORM_SQL}, ' ')) END AS BIGINT) AS n_tokens, "
    "CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)) AS BIGINT)"
    " AS n_bpe_ish FROM documents",
)
def x_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.functions import text as X

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
        X.bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_ish"),
    )


@register(
    "x_text_quality",
    "SELECT doc_id, "
    f"ROUND(len(list_filter(string_split({_NORM_SQL}, ' '), "
    "x -> x IN ('the','a','of','and','is','to','in'))) * 1.0 "
    f"/ len(string_split({_NORM_SQL}, ' ')), 6) AS stopword_ratio, "
    # zero-guard mirrors Spark's punct_ratio (blank doc → 0.0, not NULL)
    f"CASE WHEN length(replace({_NORM_SQL}, ' ', '')) = 0 THEN 0.0 ELSE "
    f"ROUND(length(regexp_replace({_NORM_SQL}, '[a-z0-9\\s]', '', 'g')) * 1.0 "
    f"/ length(replace({_NORM_SQL}, ' ', '')), 6) END AS punct_ratio "
    "FROM documents",
)
def x_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.functions import text as X

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(X.stopword_ratio(F.col("text")), 6).alias("stopword_ratio"),
        F.round(X.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
    )


@register("x_lang_id", _lang_oracle())
def x_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.text_analysis import lang_id

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


@register(
    "x_fingerprint",
    f"SELECT doc_id, md5({_NORM_SQL}) AS fingerprint FROM documents",
)
def x_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.text_analysis import fingerprint_docs

    docs = load_table(spark, sf_dir, "documents")
    return fingerprint_docs(docs, "text").select("doc_id", "fingerprint")


@register(
    "x_chunk_documents",
    # chunk=64, overlap=8 → stride=56; DuckDB list slice is 1-based inclusive
    "WITH t AS (SELECT doc_id, "
    f"string_split({_NORM_SQL}, ' ') AS toks FROM documents), "
    "c AS (SELECT doc_id, toks, UNNEST(range(1 + CAST(ceil(greatest(len(toks) - 64, 0) / 56.0) AS BIGINT))) AS i FROM t) "
    "SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, "
    "array_to_string(toks[CAST(i*56+1 AS INT):CAST(i*56+64 AS INT)], ' ') AS chunk_text, "
    "CAST(len(list_filter(toks[CAST(i*56+1 AS INT):CAST(i*56+64 AS INT)], t -> t <> '')) AS BIGINT) AS chunk_tokens "
    "FROM c",
)
def x_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.text_analysis import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=64, overlap=8)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_text",
        F.col("chunk_tokens").cast("long").alias("chunk_tokens"),
    )


@register(
    "x_pack_sequences",
    # same chunking CTE as x_chunk_documents, then window-cumsum binning
    "WITH t AS (SELECT doc_id, "
    f"string_split({_NORM_SQL}, ' ') AS toks FROM documents), "
    "c AS (SELECT doc_id, toks, UNNEST(range(1 + CAST(ceil(greatest(len(toks) - 64, 0) / 56.0) AS BIGINT))) AS i FROM t), "
    "ch AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, "
    "CAST(len(list_filter(toks[CAST(i*56+1 AS INT):CAST(i*56+64 AS INT)], t -> t <> '')) AS BIGINT) AS chunk_tokens FROM c) "
    "SELECT doc_id, chunk_idx, chunk_tokens, "
    "CAST(floor((SUM(chunk_tokens) OVER (ORDER BY doc_id, chunk_idx "
    "ROWS UNBOUNDED PRECEDING) - chunk_tokens) / 512.0) AS BIGINT) AS pack_id "
    "FROM ch",
)
def x_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.text_analysis import (
        chunk_documents,
        pack_sequences,
    )

    docs = load_table(spark, sf_dir, "documents")
    ch = chunk_documents(docs, "doc_id", "text", chunk_tokens=64, overlap=8)
    out = pack_sequences(ch, "chunk_tokens", ("doc_id", "chunk_idx"), 512)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_tokens").cast("long").alias("chunk_tokens"),
        "pack_id",
    )


@register("x_rolling_fingerprint", _rolling_fp_oracle())
def x_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint (functions/text.
    rolling_fingerprint) — char-fold mod 2³¹−1, verified value-exact."""
    from purescript_ifrit_spark.functions.text import rolling_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", rolling_fingerprint(F.col("text")).alias("rolling_fp")
    )


@register(
    "x_explode_chunks",
    # flatten with position: each document's token windows as rows — the
    # posexplode twin via per-row index structs (unbounded, unlike a
    # fixed-size index cross join, which would silently cap long docs)
    "WITH t AS (SELECT doc_id, string_split(" + _NORM_SQL + ", ' ') AS toks "
    "FROM documents), "
    "c AS (SELECT doc_id, 1 + CAST(ceil(greatest(len(toks) - 64, 0) / 56.0) "
    "AS BIGINT) AS n, toks FROM t) "
    "SELECT doc_id, CAST(u.i AS INT) AS idx, u.c AS chunk FROM ("
    "SELECT doc_id, unnest(list_transform(range(0, n), i -> {'i': i, "
    "'c': array_to_string(toks[CAST(i*56+1 AS INT):CAST(i*56+64 AS INT)], "
    "' ')})) AS u FROM c) q",
)
def x_explode_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten-with-position (posexplode) over the chunker's output —
    scan-stage HOF + generate, zero shuffle."""
    from purescript_ifrit_spark.functions.text import chunk_array

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(chunk_array(F.col("text"), 64, 8)).alias("idx", "chunk"),
    )


@register("x_pii_redact", _pii_oracle())
def x_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate strip + staged PII redaction (URL → email → phone),
    verified byte-for-byte (md5 of the cleaned text) plus per-stage
    redaction counts. PII is planted deterministically from doc_id so the
    oracle can reproduce the exact input."""
    from purescript_ifrit_spark.operators.text_cleaning import clean_text

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.withColumn("x", _pii_aug_col(with_boilerplate=True))
    cleaned = clean_text(aug, "x")
    return cleaned.select(
        "doc_id",
        F.col("n_url").cast("long").alias("n_url"),
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.md5("x").alias("fp"),
    )


@register(
    "x_term_stats",
    # vocabulary table: per-term total occurrences + document frequency,
    # top 50 by tf (term as tiebreak) — exact, fully deterministic
    "WITH e AS (SELECT doc_id, unnest(string_split("
    + _NORM_SQL
    + ", ' ')) AS term FROM documents), "
    "f AS (SELECT term, doc_id, COUNT(*) AS tf_doc FROM e "
    "WHERE term <> '' GROUP BY 1, 2) "
    "SELECT term, CAST(SUM(tf_doc) AS BIGINT) AS tf, "
    "CAST(COUNT(*) AS BIGINT) AS df FROM f GROUP BY term "
    "ORDER BY tf DESC, term LIMIT 50",
)
def x_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term statistics (operators/text_analysis.term_stats):
    two-stage aggregation — per-(term, doc) partials collapse before the
    wide shuffle. Top 50 terms by total frequency."""
    from purescript_ifrit_spark.operators.text_analysis import term_stats

    docs = load_table(spark, sf_dir, "documents")
    stats = term_stats(docs, "doc_id", "text")
    return stats.orderBy(F.col("tf").desc(), F.col("term").asc()).limit(50)


@register(
    "x_tfidf_topk",
    # rational tf-idf (tf · N / df): integer operands, ONE double division
    # — bit-identical across engines, no transcendental
    "WITH e AS (SELECT doc_id, unnest(string_split("
    + _NORM_SQL
    + ", ' ')) AS term FROM documents), "
    "pd AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf_doc FROM e "
    "WHERE term <> '' GROUP BY 1, 2), "
    "v AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM pd GROUP BY 1), "
    "s AS (SELECT pd.doc_id, pd.term, pd.tf_doc, v.df, "
    "CAST(pd.tf_doc * (SELECT COUNT(*) FROM documents) AS DOUBLE) "
    "/ CAST(v.df AS DOUBLE) AS score FROM pd JOIN v USING (term)), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
    "ORDER BY score DESC, term) AS rank FROM s) "
    "SELECT doc_id, term, tf_doc, df, score, CAST(rank AS INT) AS rank "
    "FROM r WHERE rank <= 3",
)
def x_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 characteristic terms by rational tf-idf
    (operators/text_analysis.tfidf_topk)."""
    from purescript_ifrit_spark.operators.text_analysis import tfidf_topk

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_topk(docs, "doc_id", "text", k=3)


# ===========================================================================
# repetition signals + benchmark contamination (round-3 pipeline operators)
# ===========================================================================

@register(
    "x_repetition_stats",
    # Gopher-style repetition filters: duplicate-word and duplicate-2-gram
    # fractions over normalized text; total 2-grams = n_words - 1, distinct
    # counts over list_distinct — same identities as the Spark operator
    "WITH t AS (SELECT doc_id, "
    "  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s FROM documents), "
    "w AS (SELECT doc_id, s, string_split(s, ' ') AS ws, "
    "  CASE WHEN s IS NULL OR len(s) = 0 THEN 0 "
    "  ELSE len(string_split(s, ' ')) END AS n FROM t) "
    "SELECT doc_id, CAST(n AS BIGINT) AS n_words, "
    "CASE WHEN n = 0 THEN 0.0 ELSE "
    "  ROUND(1.0 - len(list_distinct(ws)) * 1.0 / n, 6) END AS dup_word_frac, "
    "CASE WHEN n < 2 THEN 0.0 ELSE "
    "  ROUND(1.0 - len(list_distinct(list_transform(range(1, len(ws)), "
    "    i -> ws[i] || ' ' || ws[i+1]))) * 1.0 / (n - 1), 6) "
    "END AS dup_2gram_frac FROM w",
)
def x_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.text_analysis import repetition_stats

    docs = load_table(spark, sf_dir, "documents")
    out = repetition_stats(docs, "text")
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "dup_word_frac",
        "dup_2gram_frac",
    )


@register(
    "x_token_rarity",
    # corpus-commonness quality signals: every statistic is a ratio of
    # exact BIGINT sums (log-free by design — see token_rarity_stats), so
    # the doubles are single IEEE divisions and hash-exact cross-engine.
    # Same tokenize/empty-term rule as the term_stats oracle family.
    "WITH t AS (SELECT doc_id AS d, "
    "  unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', "
    "  'g')), ' ')) AS term FROM documents), "
    "pd AS (SELECT d, term, COUNT(*) AS tf_doc FROM t WHERE term <> '' "
    "  GROUP BY d, term), "
    "v AS (SELECT term, CAST(SUM(tf_doc) AS BIGINT) AS tfc FROM pd "
    "  GROUP BY term) "
    "SELECT d AS doc_id, CAST(SUM(tf_doc) AS BIGINT) AS n_tokens, "
    "CAST(SUM(tf_doc * tfc) AS BIGINT) AS sum_counts, "
    "CAST(SUM(CASE WHEN tfc <= 1 THEN tf_doc ELSE 0 END) AS BIGINT) "
    "  AS n_hapax, "
    "CAST(SUM(CASE WHEN tfc <= 1 THEN tf_doc ELSE 0 END) AS DOUBLE) "
    "  / SUM(tf_doc) AS hapax_frac, "
    "CAST(SUM(tf_doc * tfc) AS DOUBLE) / SUM(tf_doc) AS mean_token_count "
    "FROM pd JOIN v USING (term) GROUP BY d",
)
def x_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.text_analysis import (
        token_rarity_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    return token_rarity_stats(docs, "doc_id", "text")

@register(
    "x_contamination",
    # benchmark = every 100th document; a doc is contaminated when it holds
    # >= 50% of a benchmark item's distinct word 8-grams. The oracle
    # recomputes exact distinct-gram intersections; the Spark side runs the
    # operator's scale path (hashed grams + broadcast bench), so the value
    # compare also proves the xxhash64 path collision-free at this scale
    "WITH t AS (SELECT doc_id, "
    "  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s FROM documents), "
    "w AS (SELECT doc_id, s, string_split(s, ' ') AS ws FROM t), "
    f"g AS (SELECT doc_id, s, ws, {_DUCK_8GRAMS} AS gs FROM w), "
    "b AS (SELECT doc_id AS bench_id, s AS bs, ws AS bws, gs AS bgs FROM g "
    "  WHERE doc_id % 100 = 0) "
    # long bench items (>= 8 words): distinct-gram intersection fraction
    "SELECT g.doc_id, b.bench_id, "
    "ROUND(len(list_intersect(g.gs, b.bgs)) * 1.0 / len(b.bgs), 6) AS overlap "
    "FROM g CROSS JOIN b WHERE len(b.bgs) > 0 AND len(b.bws) >= 8 "
    "AND len(list_intersect(g.gs, b.bgs)) * 1.0 / len(b.bgs) >= 0.5 "
    "UNION ALL "
    # short bench items (< 8 words): exact phrase containment == overlap 1.0.
    # Space-padded on both sides (ADVICE r3): token-boundary matching, so
    # 'the cat' cannot hit inside 'soothe cattle' — mirrors the operator
    "SELECT g.doc_id, b.bench_id, 1.0 AS overlap FROM g CROSS JOIN b "
    "WHERE len(b.bgs) > 0 AND len(b.bws) < 8 "
    "AND strpos(' ' || g.s || ' ', ' ' || b.bs || ' ') > 0",
)
def x_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.contamination import (
        ngram_contamination,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return ngram_contamination(docs, bench, n=8, min_frac=0.5)


@register(
    "x_term_spectrum",
    # count-of-counts over the exact term_stats tokenization; SUM is
    # CAST to BIGINT before the outer GROUP BY (DuckDB would type the
    # grouping key HUGEINT otherwise)
    "WITH e AS (SELECT doc_id, unnest(string_split("
    + _NORM_SQL
    + ", ' ')) AS term FROM documents), "
    "pd AS (SELECT term, doc_id, COUNT(*) AS tf_doc FROM e "
    "WHERE term <> '' GROUP BY 1, 2), "
    "v AS (SELECT term, CAST(SUM(tf_doc) AS BIGINT) AS tf FROM pd GROUP BY 1) "
    "SELECT tf, COUNT(*) AS n_terms FROM v GROUP BY tf",
)
def x_term_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary frequency spectrum (Zipf count-of-counts) —
    operators/text_analysis.term_frequency_spectrum."""
    from purescript_ifrit_spark.operators.text_analysis import (
        term_frequency_spectrum,
    )

    docs = load_table(spark, sf_dir, "documents")
    return term_frequency_spectrum(docs, "doc_id", "text")


@register(
    "x_quality_topfrac",
    # same integer-exact quality formula as x_text_quality, ranked per
    # language; ceil(n * 0.5) keeps the top half of each group exactly
    "WITH q AS ("
    + _QUALITY_ORACLE_INPUTS.replace("SELECT doc_id, ", "SELECT doc_id, lang, ", 1)
    + "), s AS (SELECT doc_id, lang, "
    + _QUALITY_ORACLE_EXPR
    + " AS quality FROM q), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY lang "
    "ORDER BY quality DESC, doc_id) AS rn, "
    "COUNT(*) OVER (PARTITION BY lang) AS n FROM s) "
    "SELECT doc_id, lang, quality FROM r WHERE rn <= CEIL(n * 0.5)",
)
def x_quality_topfrac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language relative quality filter (keep the top half) —
    operators/text_analysis.quality_top_fraction. Exact per-row kept-set
    parity is the hard signal the rank/tiebreak rule is deterministic."""
    from purescript_ifrit_spark.operators.text_analysis import (
        quality_top_fraction,
    )

    docs = load_table(spark, sf_dir, "documents")
    return quality_top_fraction(docs, "doc_id", "text", "lang", 0.5).select(
        "doc_id", "lang", "quality"
    )


@register(
    "x_unigram_xent",
    # corpus-unigram cross-entropy; p is a ratio of exact integer counts,
    # both sides round the mean to 6 decimals (libm ln + sum-order noise)
    "WITH tok AS (SELECT doc_id, "
    f"UNNEST(string_split({_NORM_SQL}, ' ')) AS term FROM documents), "
    "pd AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok WHERE term <> '' "
    "GROUP BY doc_id, term), "
    "v AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS ctok FROM pd GROUP BY term), "
    "tot AS (SELECT CAST(SUM(ctok) AS BIGINT) AS ntok FROM v) "
    "SELECT doc_id, "
    "ROUND(SUM(-ln(ctok * 1.0 / ntok) * tf) / CAST(SUM(tf) AS DOUBLE), 6) AS xent, "
    "CAST(SUM(tf) AS BIGINT) AS n_tokens "
    "FROM pd JOIN v USING (term) CROSS JOIN tot GROUP BY doc_id",
)
def x_unigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring under the corpus's own unigram LM
    (operators/text_analysis.unigram_logprob)."""
    from purescript_ifrit_spark.operators.text_analysis import unigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    out = unigram_logprob(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        F.round(F.col("xent"), 6).alias("xent"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


from purescript_ifrit_spark.operators.text_cleaning import html_text_sql as _hts
_HTML_SQL = _hts("html")


@register(
    "x_html_extract",
    # synthesize a deterministic HTML wrapping of each document on BOTH
    # sides, extract visible text, compare byte-exactly via md5
    "WITH h AS (SELECT doc_id, "
    "'<html><head><title>D' || doc_id || '</title>"
    "<style>body{margin:0}</style></head><body><h1>Doc ' || doc_id || "
    "'</h1><!-- id --><p>' || text || '</p>"
    "<script>var a=1;</script></body></html>' AS html FROM documents) "
    "SELECT doc_id, md5(" + _HTML_SQL + ") AS text_md5, "
    "CAST(length(" + _HTML_SQL + ") AS BIGINT) AS n_chars FROM h",
)
def x_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visible-text extraction from HTML (operators/text_cleaning.
    extract_html_text) — the web-corpus ingest step, scan-stage."""
    from purescript_ifrit_spark.operators.text_cleaning import (
        extract_html_text,
    )

    docs = load_table(spark, sf_dir, "documents")
    html = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>D"),
            F.col("doc_id").cast("string"),
            F.lit("</title><style>body{margin:0}</style></head><body><h1>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</h1><!-- id --><p>"),
            F.col("text"),
            F.lit("</p><script>var a=1;</script></body></html>"),
        ).alias("html"),
    )
    out = extract_html_text(html, "html")
    return out.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        F.length(F.col("text")).cast("long").alias("n_chars"),
    )


@register(
    "x_bigram_xent",
    # conditional cross-entropy under the corpus's own bigram counts;
    # docs with <2 tokens have no row on either side
    "WITH t AS (SELECT doc_id, "
    f"string_split({_NORM_SQL}, ' ') AS ts FROM documents), "
    "i AS (SELECT doc_id, ts, UNNEST(range(1, len(ts))) AS i FROM t), "
    "p AS (SELECT doc_id, ts[CAST(i AS INT)] AS w1, ts[CAST(i+1 AS INT)] AS w2 FROM i), "
    "v2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM p GROUP BY 1, 2), "
    "c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM v2 GROUP BY 1) "
    "SELECT doc_id, "
    "ROUND(SUM(-ln(c12 * 1.0 / c1)) / COUNT(*), 6) AS xent2, "
    "CAST(COUNT(*) AS BIGINT) AS n_bigrams "
    "FROM p JOIN v2 USING (w1, w2) JOIN c1 USING (w1) GROUP BY doc_id",
)
def x_bigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM conditional cross-entropy scoring
    (operators/text_analysis.bigram_logprob)."""
    from purescript_ifrit_spark.operators.text_analysis import bigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    out = bigram_logprob(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        F.round(F.col("xent2"), 6).alias("xent2"),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
    )


@register(
    "x_vocab_divergence",
    # per-source KL from the corpus unigram pool; ratios of exact integer
    # counts, rounded to 6dp on both sides
    "WITH tok AS (SELECT source, "
    f"UNNEST(string_split({_NORM_SQL}, ' ')) AS term FROM documents), "
    "gt AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cgt FROM tok "
    "WHERE term <> '' GROUP BY 1, 2), "
    "ct AS (SELECT term, CAST(SUM(cgt) AS BIGINT) AS ctc FROM gt GROUP BY 1), "
    "g AS (SELECT source, CAST(SUM(cgt) AS BIGINT) AS tg, "
    "CAST(COUNT(*) AS BIGINT) AS vg FROM gt GROUP BY 1), "
    "tot AS (SELECT CAST(SUM(ctc) AS BIGINT) AS tt FROM ct) "
    "SELECT gt.source, "
    "ROUND(SUM((cgt * 1.0 / tg) * ln((cgt * 1.0 / tg) / (ctc * 1.0 / tt))), 6) AS kl, "
    "MAX(tg) AS n_tokens, MAX(vg) AS vocab_terms "
    "FROM gt JOIN ct USING (term) JOIN g ON g.source = gt.source "
    "CROSS JOIN tot GROUP BY gt.source",
)
def x_vocab_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus-drift report (operators/text_analysis.
    vocab_divergence): KL of each source's unigram mix from the pool."""
    from purescript_ifrit_spark.operators.text_analysis import (
        vocab_divergence,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = vocab_divergence(docs, "source", "text")
    return out.select(
        "source",
        F.round(F.col("kl"), 6).alias("kl"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("vocab_terms").cast("long").alias("vocab_terms"),
    )


@register(
    "x_ngram_novelty",
    # fraction of each doc's distinct 8-grams appearing in NO other doc;
    # md5 gram keys are engine-neutral, counts exact
    "WITH tk AS (SELECT doc_id, "
    f"string_split({_NORM_SQL}, ' ') AS ts FROM documents), "
    "gi AS (SELECT doc_id, ts, "
    "UNNEST(range(1, greatest(len(ts) - 7, 0) + 1)) AS i FROM tk), "
    "dg AS (SELECT DISTINCT doc_id, "
    "md5(array_to_string(ts[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS gk FROM gi), "
    "dfq AS (SELECT gk, CAST(COUNT(*) AS BIGINT) AS dfc FROM dg GROUP BY 1) "
    "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
    "CAST(SUM(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, "
    "ROUND(SUM(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS novelty "
    "FROM dg JOIN dfq USING (gk) GROUP BY doc_id",
)
def x_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 8-gram novelty (operators/text_analysis.ngram_novelty):
    the memorization-risk signal."""
    from purescript_ifrit_spark.operators.text_analysis import ngram_novelty

    docs = load_table(spark, sf_dir, "documents")
    out = ngram_novelty(docs, "doc_id", "text", n=8)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_novel").cast("long").alias("n_novel"),
        F.round(F.col("novelty"), 6).alias("novelty"),
    )


@register(
    "x_bpe_pairs",
    # first BPE training iteration: weighted symbol-pair counts over the
    # char+'</w>' symbolization, top-20 with the trainer's exact tie-break
    "WITH w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM "
    f"(SELECT UNNEST(string_split({_NORM_SQL}, ' ')) AS word FROM documents) "
    "WHERE word <> '' GROUP BY word), "
    "s AS (SELECT word, n, UNNEST(range(1, length(word) + 1)) AS i FROM w), "
    "p AS (SELECT substr(word, CAST(i AS INT), 1) AS a, "
    "CASE WHEN i < length(word) THEN substr(word, CAST(i + 1 AS INT), 1) "
    "ELSE '</w>' END AS b, n FROM s) "
    "SELECT a, b, CAST(SUM(n) AS BIGINT) AS cnt FROM p GROUP BY a, b "
    "ORDER BY cnt DESC, a ASC, b ASC LIMIT 20",
)
def x_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE training iteration's pair statistics
    (operators/bpe): weighted adjacent-symbol counts on the vocabulary
    table — the oracle-checkable kernel of the iterative trainer."""
    from purescript_ifrit_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    wc = bpe.word_counts(docs, "text")
    syms = wc.select(
        "n",
        F.concat(
            F.split(F.col("word"), "").cast("array<string>"),
            F.array(F.lit(bpe.EOW)),
        ).alias("syms"),
    )
    pairs = syms.select(
        "n",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("a"),
                F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("b"),
            )
        ).alias("_p"),
    ).select(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"), "n")
    return (
        pairs.groupBy("a", "b")
        .agg(F.sum("n").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(20)
    )


@register_demo("x_bpe_encode")  # iterative trainer inside — demo (twin: x_bpe_encode_planted);
# merges + counts are pinned merge-for-merge vs a pure-Python reference
def x_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts under a freshly TRAINED 8-merge BPE
    (operators/bpe.bpe_train_local + bpe_encode_counts)."""
    from purescript_ifrit_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.bpe_train_local(bpe.word_counts(docs, "text"), 8)
    return bpe.bpe_encode_counts(docs, merges)


# The planted-BPE corpus (VERDICT r6 #3): per doc d the text is
#   "ab"×(10 + d%3)  "cd"×(5 + d%2)  "abcd"  "abx"
# Pair-frequency order is then strict at every merge step for ANY doc_id
# mix (N_ab ≥ 10D dominates, N_cd + N_abcd ≥ 6D next, the three D-count
# pairs tie-break by (left asc, right asc)), so a 5-merge training run
# MUST learn exactly
#   (a,b) (ab,</w>) (c,d) (cd,</w>) (ab,cd</w>)
# and encoding is closed-form: "ab"/"cd"/"abcd" → 1 token, "abx" → 3
# (only (a,b) applies). Hence per doc: n_words = 17 + d%3 + d%2 and
# n_bpe_tokens = 19 + d%3 + d%2 — pure integer functions of doc_id the
# oracle recomputes, while merges_ok pins the learned merge list itself.
_BPE_EXPECTED_MERGES = [
    ("a", "b"),
    ("ab", "</w>"),
    ("c", "d"),
    ("cd", "</w>"),
    ("ab", "cd</w>"),
]


@register(
    "x_bpe_encode_planted",
    "SELECT doc_id, "
    "CAST(17 + doc_id % 3 + doc_id % 2 AS BIGINT) AS n_words, "
    "CAST(19 + doc_id % 3 + doc_id % 2 AS BIGINT) AS n_bpe_tokens, "
    "TRUE AS merges_ok FROM documents",
)
def x_bpe_encode_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-encode under a planted corpus whose merge sequence and
    token counts are closed-form (operators/bpe.bpe_train_local +
    bpe_encode_counts) — the planted-oracle conversion of x_bpe_encode:
    the REAL trainer runs (the r8 in-process merge loop, pinned
    merge-for-merge against the distributed bpe_train and the
    pure-Python reference), and both the learned merge list (merges_ok)
    and every encoded count are value-pinned."""
    from purescript_ifrit_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "concat(repeat('ab ', CAST(10 + doc_id % 3 AS INT)), "
            "repeat('cd ', CAST(5 + doc_id % 2 AS INT)), 'abcd abx')"
        ).alias("text"),
    )
    merges = bpe.bpe_train_local(bpe.word_counts(docs, "text"), 5)
    out = bpe.bpe_encode_counts(docs, merges)
    return out.select(
        "doc_id",
        "n_words",
        "n_bpe_tokens",
        F.lit(merges == _BPE_EXPECTED_MERGES).alias("merges_ok"),
    )


@register(
    "x_url_domains",
    # URLs synthesized deterministically from doc_id (two per doc + a third
    # repeat-domain URL on doc_id % 3 == 0, so n_urls > n_docs somewhere);
    # BOTH engines re-extract them with the same Java∩RE2 regexes over the
    # same augmented text — robust even if the base text ever contains URLs
    "WITH h AS (SELECT doc_id, "
    "'see http://site' || (doc_id % 17) || '.example/p' || doc_id || "
    "' and https://cdn' || (doc_id % 5) || '.example.org/x?q=1 ' || "
    "CASE WHEN doc_id % 3 = 0 THEN 'http://site' || (doc_id % 17) || "
    "'.example/z ' ELSE '' END || text AS x FROM documents), "
    "u AS (SELECT doc_id, UNNEST(regexp_extract_all(x, 'https?://\\S+', 0)) "
    "AS url FROM h), "
    "d AS (SELECT doc_id, "
    "lower(regexp_extract(url, '^https?://([^/\\s:?#]+)', 1)) AS domain "
    "FROM u WHERE regexp_extract(url, '^https?://([^/\\s:?#]+)', 1) <> '') "
    "SELECT domain, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_urls "
    "FROM d GROUP BY domain",
)
def x_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain URL statistics (operators/text_cleaning.url_domain_stats)
    — the domain-blocklist report of web-corpus curation."""
    from purescript_ifrit_spark.operators.text_cleaning import (
        url_domain_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.lit("see http://site"),
            (F.col("doc_id") % 17).cast("string"),
            F.lit(".example/p"),
            F.col("doc_id").cast("string"),
            F.lit(" and https://cdn"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".example.org/x?q=1 "),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit("http://site"),
                    (F.col("doc_id") % 17).cast("string"),
                    F.lit(".example/z "),
                ),
            ).otherwise(F.lit("")),
            F.col("text"),
        ).alias("x"),
    )
    return url_domain_stats(aug, "doc_id", "x")


@register(
    "x_encoding_quality",
    # planted damage: doc_id % 3 replacement chars (U+FFFD), doc_id % 2
    # BEL control chars, doc_id % 4 'é' codepoints — every count is then a
    # pure integer function of doc_id PLUS whatever the base text already
    # contains, and both engines recount over the same augmented text
    # (length() is codepoints in both; the ratio is one IEEE division)
    "WITH h AS (SELECT doc_id, "
    "text || repeat(chr(65533), doc_id % 3) || repeat(chr(7), doc_id % 2) "
    "|| repeat('é', doc_id % 4) AS x FROM documents) "
    "SELECT doc_id, CAST(length(x) AS BIGINT) AS n_chars, "
    "CAST(length(x) - length(replace(x, chr(65533), '')) AS BIGINT) "
    "AS n_replacement, "
    "CAST(len(regexp_extract_all(x, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', 0)) "
    "AS BIGINT) AS n_control, "
    "CAST(len(regexp_extract_all(x, '[^\\x00-\\x7F]', 0)) AS BIGINT) "
    "AS n_non_ascii, "
    "CASE WHEN length(x) > 0 THEN "
    "CAST(len(regexp_extract_all(x, '[^\\x00-\\x7F]', 0)) AS DOUBLE) "
    "/ length(x) ELSE 0.0 END AS non_ascii_ratio "
    "FROM h",
)
def x_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-damage screen (operators/text_cleaning.encoding_quality):
    U+FFFD tombstones, C0 controls, non-ASCII counts + ratio."""
    from purescript_ifrit_spark.operators.text_cleaning import (
        encoding_quality,
    )

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.expr("repeat('�', doc_id % 3)"),
            F.expr("repeat(chr(7), doc_id % 2)"),
            F.expr("repeat('é', doc_id % 4)"),
        ).alias("x"),
    )
    return encoding_quality(aug, "doc_id", "x")


@register(
    "x_packing_stats",
    # the x_pack_sequences bin assignment, aggregated per pack: counts and
    # token sums are exact integers; utilization is ONE IEEE division
    "WITH t AS (SELECT doc_id, "
    f"string_split({_NORM_SQL}, ' ') AS toks FROM documents), "
    "c AS (SELECT doc_id, toks, UNNEST(range(1 + CAST(ceil(greatest(len(toks) - 64, 0) / 56.0) AS BIGINT))) AS i FROM t), "
    "ch AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, "
    "CAST(len(list_filter(toks[CAST(i*56+1 AS INT):CAST(i*56+64 AS INT)], t -> t <> '')) AS BIGINT) AS chunk_tokens FROM c), "
    "p AS (SELECT chunk_tokens, "
    "CAST(floor((SUM(chunk_tokens) OVER (ORDER BY doc_id, chunk_idx "
    "ROWS UNBOUNDED PRECEDING) - chunk_tokens) / 512.0) AS BIGINT) AS pack_id "
    "FROM ch) "
    "SELECT pack_id, COUNT(*) AS n_items, "
    "CAST(SUM(chunk_tokens) AS BIGINT) AS n_tokens, "
    "SUM(chunk_tokens) > 512 AS overflow, "
    "CAST(SUM(chunk_tokens) AS DOUBLE) / 512.0 AS utilization "
    "FROM p GROUP BY pack_id",
)
def x_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report (operators/text_analysis.packing_stats)
    over the verified pack_sequences bins."""
    from purescript_ifrit_spark.operators.text_analysis import (
        chunk_documents,
        pack_sequences,
        packing_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    ch = chunk_documents(docs, "doc_id", "text", chunk_tokens=64, overlap=8)
    packed = pack_sequences(ch, "chunk_tokens", ("doc_id", "chunk_idx"), 512)
    return packing_stats(packed, "chunk_tokens", "pack_id", 512)


_TOKN_SQL = (
    f"CAST(CASE WHEN length({_NORM_SQL}) = 0 THEN 0 "
    f"ELSE length({_NORM_SQL}) - "
    f"length(replace({_NORM_SQL}, ' ', '')) + 1 END AS BIGINT)"
)


@register(
    "x_bm25_topk",
    # Okapi BM25 for a fixed 3-term query, recomputed end to end: tf/df
    # are exact integers, idf/score use the same IEEE double composition
    # (ln + one division chain, parenthesized identically to the Column
    # tree), and the determinism contract rounds to 6dp BEFORE ranking
    # with id tiebreak — so the top-20 SET and scores match exactly
    "WITH tok AS (SELECT doc_id, "
    f"UNNEST(string_split({_NORM_SQL}, ' ')) AS t FROM documents), "
    "pd AS (SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf "
    "FROM tok WHERE t IN ('spark', 'window', 'merge') GROUP BY doc_id, t), "
    f"l AS (SELECT doc_id, {_TOKN_SQL} AS len FROM documents), "
    "c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(len) AS avg FROM l), "
    "d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dfq FROM pd GROUP BY term), "
    "s AS (SELECT pd.doc_id, "
    "SUM(ln((c.n - d.dfq + 0.5) / (d.dfq + 0.5) + 1.0) * "
    "((pd.tf * 2.2) / (pd.tf + 1.2 * (0.25 + 0.75 * (l.len / c.avg))))) AS sc "
    "FROM pd JOIN d USING (term) JOIN l USING (doc_id), c GROUP BY pd.doc_id) "
    "SELECT doc_id, ROUND(sc, 6) AS score FROM s "
    "ORDER BY ROUND(sc, 6) DESC, doc_id LIMIT 20",
)
def x_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse retrieval over the corpus (operators/text_analysis.
    bm25_topk): top-20 documents for a 3-term query by Okapi BM25."""
    from purescript_ifrit_spark.operators.text_analysis import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(
        docs, "doc_id", "text", ["spark", "window", "merge"], k=20
    )


# batch BM25: the x_bm25_topk arithmetic extended per-query — the
# query table is a VALUES literal on both sides, document frequency is
# per distinct term (not per query), and the per-query top-5 uses the
# same round-6-before-rank + doc-id tiebreak contract. Shared verbatim
# by x_bm25_batch (direct path) and x_bm25_indexed (the prebuilt-index
# path, which must produce the identical result through parquet).
_BM25_BATCH_SQL = (
    "WITH q AS (SELECT * FROM (VALUES (1, 'spark join'), "
    "(2, 'merge sort'), (3, 'customer data')) t(qid, qtext)), "
    "qt AS (SELECT DISTINCT qid, term FROM "
    "  (SELECT qid, UNNEST(string_split(qtext, ' ')) AS term FROM q)), "
    "tok AS (SELECT doc_id, "
    f"UNNEST(string_split({_NORM_SQL}, ' ')) AS t FROM documents), "
    "pd AS (SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf "
    "FROM tok WHERE t IN (SELECT term FROM qt) GROUP BY doc_id, t), "
    f"l AS (SELECT doc_id, {_TOKN_SQL} AS len FROM documents), "
    "c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(len) AS avg FROM l), "
    "d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dfq FROM pd GROUP BY term), "
    "s AS (SELECT qt.qid, pd.doc_id, "
    "SUM(ln((c.n - d.dfq + 0.5) / (d.dfq + 0.5) + 1.0) * "
    "((pd.tf * 2.2) / (pd.tf + 1.2 * (0.25 + 0.75 * (l.len / c.avg))))) AS sc "
    "FROM pd JOIN qt USING (term) JOIN d USING (term) "
    "JOIN l USING (doc_id), c GROUP BY qt.qid, pd.doc_id), "
    "r AS (SELECT qid, doc_id, ROUND(sc, 6) AS score, ROW_NUMBER() OVER "
    "(PARTITION BY qid ORDER BY ROUND(sc, 6) DESC, doc_id) AS rn FROM s) "
    "SELECT CAST(qid AS BIGINT) AS qid, doc_id, score FROM r WHERE rn <= 5"
)


@register("x_bm25_batch", _BM25_BATCH_SQL)
def x_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sparse retrieval (operators/text_analysis.bm25_topk_queries):
    top-5 documents PER QUERY for a 3-query table by Okapi BM25 — the
    query-log-replay / contamination-screen shape where the per-query
    loop would rescan the corpus."""
    from purescript_ifrit_spark.operators.text_analysis import (
        bm25_topk_queries,
    )

    docs = load_table(spark, sf_dir, "documents")
    qs = spark.createDataFrame(
        [(1, "spark join"), (2, "merge sort"), (3, "customer data")],
        "qid long, qtext string",
    )
    return bm25_topk_queries(docs, "doc_id", "text", qs, "qid", "qtext", k=5)


@register("x_bm25_indexed", _BM25_BATCH_SQL)
def x_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-backed batch retrieval (operators/text_analysis.
    build_bm25_index + bm25_topk_queries_indexed, r10): the tokenize-
    once production shape — postings and doc lengths built once, round-
    tripped through REAL parquet, then the same 3-query batch scored
    from the index alone (the corpus text is never read at query time).
    The oracle is x_bm25_batch's SQL verbatim: the index path must be
    value-identical to the direct path."""
    import shutil
    import tempfile

    from purescript_ifrit_spark.operators.text_analysis import (
        bm25_topk_queries_indexed,
        build_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    qs = spark.createDataFrame(
        [(1, "spark join"), (2, "merge sort"), (3, "customer data")],
        "qid long, qtext string",
    )
    postings, doclens = build_bm25_index(docs, "doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="ifrit_bm25_idx_")
    try:
        postings.write.mode("overwrite").parquet(f"{tmp}/postings")
        doclens.write.mode("overwrite").parquet(f"{tmp}/doclens")
        out = bm25_topk_queries_indexed(
            spark.read.parquet(f"{tmp}/postings"),
            spark.read.parquet(f"{tmp}/doclens"),
            qs, "qid", "qtext", "doc_id", k=5,
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register("x_bm25_indexed_pruned", _BM25_BATCH_SQL)
def x_bm25_indexed_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-pruned index retrieval (bm25_topk_queries_indexed with
    prune_scan_terms=True, r11 — VERDICT r10 #2): the same 3-query
    batch scored from a TERM-RANGE-SORTED stored index with the query
    vocab pushed into the parquet source as a literal In filter
    (PushedFilters on the postings scan; 60x physical-read collapse and
    SelectedBucketsCount 9/64 measured at 100x, SCALE.md r11). The
    oracle is x_bm25_batch's SQL verbatim: moving the vocab screen
    below the scan must not change a single value."""
    import shutil
    import tempfile

    from purescript_ifrit_spark.operators.text_analysis import (
        bm25_topk_queries_indexed,
        build_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    qs = spark.createDataFrame(
        [(1, "spark join"), (2, "merge sort"), (3, "customer data")],
        "qid long, qtext string",
    )
    postings, doclens = build_bm25_index(docs, "doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="ifrit_bm25_idxp_")
    try:
        (
            postings.repartitionByRange(4, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(f"{tmp}/postings")
        )
        doclens.write.mode("overwrite").parquet(f"{tmp}/doclens")
        out = bm25_topk_queries_indexed(
            spark.read.parquet(f"{tmp}/postings"),
            spark.read.parquet(f"{tmp}/doclens"),
            qs, "qid", "qtext", "doc_id", k=5,
            prune_scan_terms=True, scoring_partitions=0,
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register("x_bm25_index_fold", _BM25_BATCH_SQL)
def x_bm25_index_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental BM25 index maintenance (operators/text_analysis.
    fold_into_bm25_index, r11): the index is built over HALF the corpus,
    the other half (plus a replayed overlap that the anti-join must
    drop) is folded in, and the folded index round-trips through real
    parquet before scoring. The oracle is x_bm25_batch's SQL verbatim:
    corpus stats are computed at query time from the folded tables, so
    fold(build(A), B) must score exactly like build(A ∪ B)."""
    import shutil
    import tempfile

    from purescript_ifrit_spark.operators.text_analysis import (
        bm25_topk_queries_indexed,
        build_bm25_index,
        fold_into_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    # the fold batch replays part of half A — at-least-once ingestion;
    # the anti-join must drop the replayed ids or scores double
    fold_batch = docs.filter(
        (F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 10 == 0)
    )
    qs = spark.createDataFrame(
        [(1, "spark join"), (2, "merge sort"), (3, "customer data")],
        "qid long, qtext string",
    )
    postings, doclens = build_bm25_index(half_a, "doc_id", "text")
    fp, fl = fold_into_bm25_index(
        postings, doclens, fold_batch, "doc_id", "text"
    )
    tmp = tempfile.mkdtemp(prefix="ifrit_bm25_fold_")
    try:
        fp.write.mode("overwrite").parquet(f"{tmp}/postings")
        fl.write.mode("overwrite").parquet(f"{tmp}/doclens")
        out = bm25_topk_queries_indexed(
            spark.read.parquet(f"{tmp}/postings"),
            spark.read.parquet(f"{tmp}/doclens"),
            qs, "qid", "qtext", "doc_id", k=5,
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "x_bm25_screen_report",
    # the max_df_frac observability sibling (VERDICT r10 #6): one row
    # per query with the term/match/screen census — df is the postings
    # row count per term (distinct (term, doc) pairs), screened means
    # df > 0.5 * N, and screened_all_terms marks the query that HAD
    # corpus matches but the screen dropped every one (the case the
    # scoring paths report as zero rows, indistinguishable from OOV
    # without this report). qid 1 mixes a screened and a kept term,
    # qid 2 is all-screened, qid 3 is OOV, qid 4 is all-kept.
    "WITH q AS (SELECT * FROM (VALUES (1, 'spark dup'), "
    "(2, 'merge sort'), (3, 'zzz_absent_term'), (4, 'dup')) "
    "t(qid, qtext)), "
    "qt AS (SELECT DISTINCT qid, term FROM "
    "  (SELECT qid, UNNEST(string_split(qtext, ' ')) AS term FROM q)), "
    "tok AS (SELECT doc_id, "
    f"UNNEST(string_split({_NORM_SQL}, ' ')) AS t FROM documents), "
    "pd AS (SELECT doc_id, t AS term FROM tok "
    "WHERE t IN (SELECT term FROM qt) GROUP BY doc_id, t), "
    "d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dfq "
    "FROM pd GROUP BY term), "
    "c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents), "
    "per AS (SELECT qt.qid, qt.term, d.dfq IS NOT NULL AS m, "
    "COALESCE(d.dfq > 0.5 * c.n, FALSE) AS s "
    "FROM qt LEFT JOIN d USING (term), c) "
    "SELECT CAST(qid AS BIGINT) AS qid, "
    "CAST(COUNT(*) AS BIGINT) AS n_terms, "
    "CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_matched_terms, "
    "CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_screened_terms, "
    "(SUM(CASE WHEN m THEN 1 ELSE 0 END) > 0 AND "
    "SUM(CASE WHEN m THEN 1 ELSE 0 END) = "
    "SUM(CASE WHEN s THEN 1 ELSE 0 END)) AS screened_all_terms "
    "FROM per GROUP BY qid",
)
def x_bm25_screen_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`max_df_frac` observability (operators/text_analysis.
    bm25_query_screen_report, VERDICT r10 #6): per-query census of how
    the stop-term screen treats each query — distinguishing "zero rows
    because nothing matched" from "zero rows because every matching
    term was screened" without re-deriving the df census. At the sf
    corpus (31-term vocab, df/N 0.75–0.80 except 'dup' at 0.05) a 0.5
    screen drops everything but 'dup', so the four planted queries
    exercise all report shapes."""
    from purescript_ifrit_spark.operators.text_analysis import (
        bm25_query_screen_report,
        build_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    qs = spark.createDataFrame(
        [(1, "spark dup"), (2, "merge sort"), (3, "zzz_absent_term"),
         (4, "dup")],
        "qid long, qtext string",
    )
    postings, doclens = build_bm25_index(docs, "doc_id", "text")
    return bm25_query_screen_report(
        postings, doclens, qs, "qid", "qtext", max_df_frac=0.5
    )


@register(
    "x_rrf_fusion",
    # reciprocal-rank fusion over two deterministic candidate lists
    # (token-count ranking × hash-score ranking): the reciprocal is
    # INTEGER fixed-point (1e9 div (60 + rank)), so fused scores are
    # exact integers — no float-summation caveat anywhere
    f"WITH ra AS (SELECT doc_id, {_TOKN_SQL} AS s FROM documents "
    "ORDER BY s DESC, doc_id LIMIT 50), "
    "rb AS (SELECT doc_id, (doc_id * 31 + 7) % 1000 AS s FROM documents "
    "ORDER BY s DESC, doc_id LIMIT 50), "
    "p AS (SELECT doc_id, 1000000000 // "
    "(60 + ROW_NUMBER() OVER (ORDER BY s DESC, doc_id)) AS rrf FROM ra "
    "UNION ALL SELECT doc_id, 1000000000 // "
    "(60 + ROW_NUMBER() OVER (ORDER BY s DESC, doc_id)) AS rrf FROM rb) "
    "SELECT doc_id, CAST(SUM(rrf) AS BIGINT) AS rrf_score, "
    "CAST(COUNT(*) AS BIGINT) AS n_systems FROM p GROUP BY doc_id "
    "ORDER BY rrf_score DESC, doc_id LIMIT 20",
)
def x_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (operators/text_analysis.rrf_fuse): fuse
    two deterministic top-50 candidate lists into an exact-integer RRF
    top-20 — the standard way to combine BM25 and ANN retrievers."""
    from purescript_ifrit_spark.operators.text_analysis import rrf_fuse

    from purescript_ifrit_spark.functions import text as X

    docs = load_table(spark, sf_dir, "documents")
    ra = (
        docs.select(
            "doc_id", X.token_count(F.col("text")).cast("long").alias("s")
        )
        .orderBy(F.col("s").desc(), F.col("doc_id").asc())
        .limit(50)
    )
    rb = (
        docs.select(
            "doc_id", ((F.col("doc_id") * 31 + 7) % 1000).alias("s")
        )
        .orderBy(F.col("s").desc(), F.col("doc_id").asc())
        .limit(50)
    )
    return rrf_fuse([(ra, "s"), (rb, "s")], "doc_id", k=20)


@register(
    "x_rrf_batch",
    # grouped reciprocal-rank fusion: two deterministic per-query
    # candidate lists (top-25 per query by qid-salted hash scores), one
    # integer fixed-point fusion per query, top-10 per query — ranks and
    # the 1e9 // (60 + r) reciprocal replayed exactly in SQL
    "WITH sa AS (SELECT qid, doc_id, s FROM ("
    "  SELECT q.qid, d.doc_id, (d.doc_id * 17 + q.qid) % 1000 AS s, "
    "  ROW_NUMBER() OVER (PARTITION BY q.qid "
    "    ORDER BY (d.doc_id * 17 + q.qid) % 1000 DESC, d.doc_id) AS rn "
    "  FROM documents d, (SELECT CAST(UNNEST([1, 2]) AS BIGINT) AS qid) q"
    ") WHERE rn <= 25), "
    "sb AS (SELECT qid, doc_id, s FROM ("
    "  SELECT q.qid, d.doc_id, (d.doc_id * 31 + 7 * q.qid) % 1000 AS s, "
    "  ROW_NUMBER() OVER (PARTITION BY q.qid "
    "    ORDER BY (d.doc_id * 31 + 7 * q.qid) % 1000 DESC, d.doc_id) AS rn "
    "  FROM documents d, (SELECT CAST(UNNEST([1, 2]) AS BIGINT) AS qid) q"
    ") WHERE rn <= 25), "
    "p AS (SELECT qid, doc_id, 1000000000 // "
    "(60 + ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, doc_id)) "
    "AS rrf FROM sa "
    "UNION ALL SELECT qid, doc_id, 1000000000 // "
    "(60 + ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, doc_id)) "
    "AS rrf FROM sb), "
    "f AS (SELECT qid, doc_id, CAST(SUM(rrf) AS BIGINT) AS rrf_score, "
    "CAST(COUNT(*) AS BIGINT) AS n_systems FROM p GROUP BY qid, doc_id), "
    "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid "
    "ORDER BY rrf_score DESC, doc_id) AS rk FROM f) "
    "SELECT qid, doc_id, rrf_score, n_systems FROM r WHERE rk <= 10",
)
def x_rrf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped reciprocal-rank fusion (operators/text_analysis.
    rrf_fuse_queries, VERDICT r9 #3): fuse two retrievers' per-query
    candidate lists for a 2-query batch in ONE plan (one qid-keyed
    exchange) — the retrieval-eval shape where per-query rrf_fuse would
    loop the driver."""
    from pyspark.sql import Window

    from purescript_ifrit_spark.operators.text_analysis import (
        rrf_fuse_queries,
    )

    docs = load_table(spark, sf_dir, "documents")

    def system(mult: int, off: int):
        parts = []
        for qid in (1, 2):
            s = (F.col("doc_id") * mult + off * qid) % 1000
            w = Window.orderBy(F.col("s").desc(), F.col("doc_id").asc())
            parts.append(
                docs.select(
                    F.lit(qid).cast("long").alias("qid"),
                    "doc_id",
                    s.alias("s"),
                )
                .withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") <= 25)
                .drop("_r")
            )
        return parts[0].unionAll(parts[1])

    sa = system(17, 1)
    sb = system(31, 7)
    return rrf_fuse_queries([(sa, "s"), (sb, "s")], "qid", "doc_id", k=10)


@register(
    "x_truncate_docs",
    # token-budget truncation: pure list arithmetic both engines
    # recompute — slice bounds are 1-based inclusive in DuckDB, matching
    # F.slice(toks, 1, 64); empty docs keep text_trunc = '' on both
    # sides (split('') = [''] → join '')
    f"WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks, "
    f"{_TOKN_SQL} AS n FROM documents) "
    "SELECT doc_id, array_to_string(toks[1:64], ' ') AS text_trunc, "
    "n AS n_tokens_orig, LEAST(n, 64) AS n_tokens_kept, "
    "n > 64 AS truncated FROM t",
)
def x_truncate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length guard (operators/text_analysis.truncate_documents):
    cap every document at 64 normalized tokens, value-exact."""
    from purescript_ifrit_spark.operators.text_analysis import (
        truncate_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    return truncate_documents(docs, "doc_id", "text", 64)


@register(
    "x_pack_text",
    # materialized packed sequences: the x_pack_sequences chunk/bin CTE
    # plus an ordered string_agg — packing order is (doc_id, chunk_idx)
    # on both sides, so the joined text is byte-identical
    "WITH t AS (SELECT doc_id, "
    f"string_split({_NORM_SQL}, ' ') AS toks FROM documents), "
    "c AS (SELECT doc_id, toks, UNNEST(range(1 + CAST(ceil(greatest(len(toks) - 64, 0) / 56.0) AS BIGINT))) AS i FROM t), "
    "ch AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, "
    "array_to_string(toks[CAST(i*56+1 AS INT):CAST(i*56+64 AS INT)], ' ') AS chunk_text, "
    "CAST(len(list_filter(toks[CAST(i*56+1 AS INT):CAST(i*56+64 AS INT)], t -> t <> '')) AS BIGINT) AS chunk_tokens FROM c), "
    "p AS (SELECT doc_id, chunk_idx, chunk_text, "
    "CAST(floor((SUM(chunk_tokens) OVER (ORDER BY doc_id, chunk_idx "
    "ROWS UNBOUNDED PRECEDING) - chunk_tokens) / 512.0) AS BIGINT) AS pack_id "
    "FROM ch) "
    "SELECT pack_id, CAST(COUNT(*) AS BIGINT) AS n_chunks, "
    "string_agg(chunk_text, chr(10) ORDER BY doc_id, chunk_idx) AS packed_text "
    "FROM p GROUP BY pack_id",
)
def x_pack_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed-sequence materialization (operators/text_analysis.
    pack_text): the actual training-sequence payloads, chunks joined in
    packing order — byte-identical strings on both engines."""
    from purescript_ifrit_spark.operators.text_analysis import (
        chunk_documents,
        pack_sequences,
        pack_text,
    )

    docs = load_table(spark, sf_dir, "documents")
    ch = chunk_documents(docs, "doc_id", "text", chunk_tokens=64, overlap=8)
    packed = pack_sequences(ch, "chunk_tokens", ("doc_id", "chunk_idx"), 512)
    return pack_text(packed)


def _gopher_oracle(pass_only: bool = False) -> str:
    from purescript_ifrit_spark.operators.text_analysis import (
        GOPHER_DEFAULTS,
        GOPHER_STOPWORDS,
    )

    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    d = GOPHER_DEFAULTS
    rules = (
        f"nw >= {d['min_words']} AND nw <= {d['max_words']} "
        f"AND mwl >= {d['min_mean_word_len']} "
        f"AND mwl <= {d['max_mean_word_len']} "
        f"AND syr <= {d['max_symbol_ratio']} "
        f"AND af >= {d['min_alpha_frac']} AND ns >= {d['min_stopwords']}"
    )
    # sum of token lengths == nonspace chars of the normalized text, so
    # mean word length needs no per-token loop; symbol counts run over
    # the RAW text exactly as the operator does (string_split is the
    # same greedy left-to-right non-overlapping scan as Spark's split
    # on the literal '...' pattern). The pass boolean composes the
    # UNROUNDED doubles — identical int-derived divisions both engines —
    # and floats round only in the projection. pass_only trims the
    # projection to (doc_id, gpass) for the dialect GOPHER twin
    # (suite/dialect.xd_gopher) so the rule SQL lives exactly once.
    if pass_only:
        final = f"SELECT doc_id, ({rules}) AS gpass FROM c"
    else:
        final = (
            "SELECT doc_id, CAST(nw AS BIGINT) AS n_words, "
            "ROUND(mwl, 6) AS mean_word_len, ROUND(syr, 6) AS symbol_ratio, "
            "ROUND(af, 6) AS alpha_frac, CAST(ns AS BIGINT) AS n_stopwords, "
            f"({rules}) AS gopher_pass FROM c"
        )
    return (
        "WITH b AS (SELECT doc_id, text, "
        f"CASE WHEN length({_NORM_SQL}) = 0 THEN 0 "
        f"ELSE len(string_split({_NORM_SQL}, ' ')) END AS nw, "
        f"length(replace({_NORM_SQL}, ' ', '')) AS sl, "
        "length(text) - length(replace(text, '#', '')) "
        "+ len(string_split(text, '...')) - 1 AS sy, "
        f"len(list_filter(string_split({_NORM_SQL}, ' '), "
        "w -> regexp_matches(w, '[a-z]'))) AS na, "
        f"len(list_filter(list_distinct(string_split({_NORM_SQL}, ' ')), "
        f"w -> w IN ({stops}))) AS ns FROM documents), "
        "c AS (SELECT doc_id, nw, ns, "
        "CASE WHEN nw > 0 THEN sl * 1.0 / nw ELSE 0.0 END AS mwl, "
        "CASE WHEN nw > 0 THEN sy * 1.0 / nw ELSE 0.0 END AS syr, "
        "CASE WHEN nw > 0 THEN na * 1.0 / nw ELSE 0.0 END AS af FROM b) "
        + final
    )


@register("x_gopher_quality", _gopher_oracle())
def x_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality flags (operators/text_analysis.
    gopher_quality_flags): every rule column plus the combined pass,
    integer counts exact and each ratio one int-derived division."""
    from purescript_ifrit_spark.operators.text_analysis import (
        gopher_quality_flags,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = gopher_quality_flags(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        "n_words",
        F.round(F.col("mean_word_len"), 6).alias("mean_word_len"),
        F.round(F.col("symbol_ratio"), 6).alias("symbol_ratio"),
        F.round(F.col("alpha_frac"), 6).alias("alpha_frac"),
        "n_stopwords",
        "gopher_pass",
    )


@register(
    "x_unicode_nfc",
    # planted decomposed sequences (combining acute/tilde) on doc_id % 4
    # == 0; the base corpus is pure ASCII (NFC-invariant on both engines
    # regardless of Unicode version skew), so the planted suffix is the
    # entire signal and its compositions (é, ñ) are stable since
    # Unicode 3
    "WITH h AS (SELECT doc_id, text || CASE WHEN doc_id % 4 = 0 THEN "
    "' cafe' || chr(769) || ' jalapen' || chr(771) || 'o' ELSE '' END AS x "
    "FROM documents), "
    "n AS (SELECT doc_id, x, nfc_normalize(x) AS y FROM h) "
    "SELECT doc_id, (y <> x) AS changed, "
    "CAST(length(x) AS BIGINT) AS len_raw, "
    "CAST(length(y) AS BIGINT) AS len_nfc, md5(y) AS fp_nfc FROM n",
)
def x_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (operators/text_cleaning.
    normalize_unicode) on planted decomposed accents — composed output
    fingerprint-exact vs DuckDB's utf8proc nfc_normalize."""
    from purescript_ifrit_spark.operators.text_cleaning import (
        normalize_unicode,
    )

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit(" cafe\u0301 jalapen\u0303o"),  # decomposed, kept escaped
            ).otherwise(F.lit("")),
        ).alias("x"),
    )
    out = normalize_unicode(aug, "x", "y", form="NFC")
    return out.select(
        "doc_id",
        (F.col("y") != F.col("x")).alias("changed"),
        F.length("x").cast("long").alias("len_raw"),
        F.length("y").cast("long").alias("len_nfc"),
        F.md5(F.col("y")).alias("fp_nfc"),
    )


# messy-URL fixture, one expression valid in BOTH Spark SQL and DuckDB
# (the x_fuzzy_join shared-CASE convention): five shapes exercising
# case-folding, default/non-default ports, trailing slashes, tracking
# and empty-valued params, duplicate params, fragments, and a non-URL
_MESSY_URL_SQL = (
    "CASE doc_id % 5 "
    "WHEN 0 THEN 'HTTP://WWW.Site' || (doc_id % 9) || '.COM:80/Path/' "
    "|| doc_id || '/?utm_source=feed&b=2&a=1#frag' "
    "WHEN 1 THEN 'https://cdn' || (doc_id % 4) || '.example.org:443/x' "
    "WHEN 2 THEN 'http://host' || (doc_id % 9) || "
    "'.example:8080/a//?gclid=9&z=3&y=' "
    "WHEN 3 THEN 'not a url ' || doc_id "
    "ELSE 'https://Example.net/' || doc_id || '?ref=tw&q=' || "
    "(doc_id % 3) || '&q=' || (doc_id % 3) END"
)


def _url_canon_oracle() -> str:
    from purescript_ifrit_spark.operators.text_cleaning import (
        canonicalize_url_sql,
    )

    return (
        f"WITH u AS (SELECT doc_id, {_MESSY_URL_SQL} AS url "
        "FROM documents) "
        f"SELECT doc_id, {canonicalize_url_sql('url')} AS url_canon FROM u"
    )


@register("x_url_canonicalize", _url_canon_oracle())
def x_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (operators/text_cleaning.
    canonicalize_url_expr) over planted messy URLs — the crawl-dedup
    key: case/port/slash/param-order/tracking/fragment normalization,
    value-exact against the DuckDB twin builder."""
    from purescript_ifrit_spark.operators.text_cleaning import (
        canonicalize_urls,
    )

    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", F.expr(_MESSY_URL_SQL).alias("url"))
    return canonicalize_urls(u).select("doc_id", "url_canon")


@register(
    "x_vocab_growth",
    # Heaps'-law curve at 50-doc checkpoints: cumulative tokens,
    # cumulative first-seen vocabulary, type-token ratio — exact
    # integers + one rounded division
    "WITH d AS (SELECT ((doc_id // 50) + 1) * 50 AS cp, "
    + _NORM_SQL
    + " AS nt FROM documents), "
    "tok AS (SELECT cp, unnest(string_split(nt, ' ')) AS term FROM d), "
    "tok2 AS (SELECT cp, term FROM tok WHERE term <> ''), "
    "tbc AS (SELECT cp, COUNT(*) AS n_tok FROM tok2 GROUP BY cp), "
    "fcp AS (SELECT term, MIN(cp) AS fc FROM tok2 GROUP BY term), "
    "vbc AS (SELECT fc AS cp, COUNT(*) AS n_new FROM fcp GROUP BY fc), "
    "g AS (SELECT t.cp, t.n_tok, COALESCE(v.n_new, 0) AS n_new "
    "FROM tbc t LEFT JOIN vbc v USING (cp)), "
    "c AS (SELECT cp AS checkpoint, "
    "CAST(SUM(n_tok) OVER (ORDER BY cp) AS BIGINT) AS cum_tokens, "
    "CAST(SUM(n_new) OVER (ORDER BY cp) AS BIGINT) AS cum_vocab FROM g) "
    "SELECT checkpoint, cum_tokens, cum_vocab, "
    "ROUND(CAST(cum_vocab AS DOUBLE) / cum_tokens, 6) AS ttr FROM c",
)
def x_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth / Heaps'-law curve (operators/text_analysis.
    vocab_growth) — cumulative tokens vs first-seen vocabulary at
    50-doc checkpoints, integer-exact plus one rounded division."""
    from purescript_ifrit_spark.operators.text_analysis import vocab_growth

    docs = load_table(spark, sf_dir, "documents")
    return vocab_growth(docs, "doc_id", "text", checkpoint_every=50)


# mojibake fixture: 'cafÃ© naÃ¯ve' is the double-encoded image of
# 'café naïve' — Ã=chr(195), ©=chr(169), ¯(diaeresis i pre-image)=chr(175)
_MOJI_BAD = " caf\u00c3\u00a9 na\u00c3\u00afve"  # bytes-as-latin1 image, kept escaped
_MOJI_BAD_SQL = "' caf' || chr(195) || chr(169) || ' na' || chr(195) || chr(175) || 've'"
_MOJI_FIXED_SQL = "' caf' || chr(233) || ' na' || chr(239) || 've'"


@register(
    "x_mojibake_repair",
    # the oracle doesn't re-implement the repair: the plant is closed-form,
    # so the EXPECTED post-repair text is constructible directly — the
    # planted-oracle pattern for operators SQL cannot express
    "SELECT doc_id, (doc_id % 3 = 0) AS repaired, "
    f"CASE WHEN doc_id % 3 = 0 THEN md5(text || {_MOJI_FIXED_SQL}) "
    "ELSE md5(text) END AS fp_fixed FROM documents",
)
def x_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-encoding repair (operators/text_cleaning.repair_mojibake)
    on planted mojibake — the repaired text matches the closed-form
    pre-image fingerprint; untouched docs keep their own."""
    from purescript_ifrit_spark.operators.text_cleaning import (
        repair_mojibake,
    )

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(_MOJI_BAD)).otherwise(
                F.lit("")
            ),
        ).alias("x"),
    )
    out = repair_mojibake(aug, "x", "y")
    return out.select(
        "doc_id",
        (F.col("y") != F.col("x")).alias("repaired"),
        F.md5(F.col("y")).alias("fp_fixed"),
    )


@register(
    "x_domain_blocklist",
    # suffix semantics in the oracle via LIKE (the brute twin of the
    # operator's suffix-chain broadcast probe): blocked iff domain = pat
    # or domain ends with '.' || pat; non-URLs get domain '' / false
    "WITH u AS (SELECT doc_id, " + _MESSY_URL_SQL + " AS url "
    "FROM documents), "
    "d AS (SELECT doc_id, lower(regexp_extract(url, "
    "'^https?://([^/\\s:?#]+)', 1)) AS domain FROM u), "
    "bl(pat) AS (VALUES ('site3.com'), ('example.org')) "
    "SELECT doc_id, domain, "
    "EXISTS (SELECT 1 FROM bl WHERE d.domain = bl.pat "
    "OR d.domain LIKE '%.' || bl.pat) AS blocked FROM d",
)
def x_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-matching domain blocklist (operators/text_cleaning.
    annotate_blocked_domains) over the planted messy URLs — the
    suffix-chain broadcast probe vs DuckDB's brute LIKE twin."""
    from purescript_ifrit_spark.operators.text_cleaning import (
        annotate_blocked_domains,
    )

    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", F.expr(_MESSY_URL_SQL).alias("url"))
    bl = spark.createDataFrame(
        [("site3.com",), ("example.org",)], ["pattern"]
    )
    return annotate_blocked_domains(u, bl, "url", "doc_id")


@register(
    "x_pmi_collocations",
    # rational PMI lift (no log — monotone, so the ranking is identical
    # and every operand is an exact integer); ORDER BY uses the ROUNDED
    # score on BOTH engines so 6dp-equal scores tie-break identically
    "WITH t AS (SELECT string_split(" + _NORM_SQL + ", ' ') AS toks "
    "FROM documents), "
    "b AS (SELECT toks[u.i] AS w1, toks[u.i + 1] AS w2 "
    "FROM t, UNNEST(range(1, len(toks))) AS u(i)), "
    "v AS (SELECT w1, w2, COUNT(*) AS n_12 FROM b GROUP BY 1, 2), "
    "l AS (SELECT w1, SUM(n_12) AS n1 FROM v GROUP BY w1), "
    "r AS (SELECT w2, SUM(n_12) AS n2 FROM v GROUP BY w2), "
    "nn AS (SELECT SUM(n_12) AS n FROM v), "
    "s AS (SELECT w1, w2, CAST(n_12 AS BIGINT) AS n_12, "
    "ROUND((CAST(n_12 AS DOUBLE) * CAST(nn.n AS DOUBLE)) / "
    "(CAST(l.n1 AS DOUBLE) * CAST(r.n2 AS DOUBLE)), 6) AS score "
    "FROM v JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN nn "
    "WHERE n_12 >= 3) "
    "SELECT * FROM s ORDER BY score DESC, w1, w2 LIMIT 100",
)
def x_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by rational PMI lift (operators/text_analysis.
    pmi_collocations) — top multiword units, integer operands + one
    rounded division, value-exact both engines."""
    from purescript_ifrit_spark.operators.text_analysis import (
        pmi_collocations,
    )

    docs = load_table(spark, sf_dir, "documents")
    return pmi_collocations(docs, "doc_id", "text", top_k=100, min_count=3)


# planted script suffixes (escaped, the x_unicode_nfc convention):
# Cyrillic п×4, CJK 中×3, Arabic س×2, Hangul 가×2 on doc_id % 5 slots
_SCRIPT_SUFFIX = {
    1: "\u043f" * 4,
    2: "\u4e2d" * 3,
    3: "\u0633" * 2,
    4: "\uac00" * 2,
}
_SCRIPT_SUFFIX_SQL = (
    "CASE doc_id % 5 "
    "WHEN 1 THEN repeat(chr(1087), 4) "
    "WHEN 2 THEN repeat(chr(20013), 3) "
    "WHEN 3 THEN repeat(chr(1587), 2) "
    "WHEN 4 THEN repeat(chr(44032), 2) ELSE '' END"
)


def _script_profile_oracle() -> str:
    from purescript_ifrit_spark.operators.text_analysis import SCRIPT_RANGES

    def rx(name, lo, hi):
        if name == "latin":
            return "[A-Za-z]"
        return f"[\\x{{{lo:04x}}}-\\x{{{hi:04x}}}]"

    counts = ", ".join(
        # single-char classes: matched count = chars removed by the sub
        f"CAST(length(x) - length(regexp_replace(x, '{rx(n, lo, hi)}', "
        f"'', 'g')) AS BIGINT) AS n_{n}"
        for n, lo, hi in SCRIPT_RANGES
    )
    mx = "greatest(" + ", ".join(f"n_{n}" for n, _, _ in SCRIPT_RANGES) + ")"
    dom = (
        "CASE "
        + " ".join(
            f"WHEN {mx} > 0 AND n_{n} = {mx} THEN '{n}'"
            for n, _, _ in SCRIPT_RANGES
        )
        + " ELSE 'none' END"
    )
    return (
        f"WITH h AS (SELECT doc_id, text || {_SCRIPT_SUFFIX_SQL} AS x "
        "FROM documents), "
        f"c AS (SELECT doc_id, {counts} FROM h) "
        f"SELECT *, {dom} AS dominant FROM c"
    )


@register("x_script_profile", _script_profile_oracle())
def x_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Unicode script histogram (operators/text_analysis.
    script_profile) over planted multi-script suffixes — integer counts
    + deterministic dominance, value-exact from one shared range
    table rendered as Java regex (Spark) and RE2 (DuckDB)."""
    from purescript_ifrit_spark.operators.text_analysis import script_profile

    docs = load_table(spark, sf_dir, "documents")
    suffix = F.lit("")
    for k, v in _SCRIPT_SUFFIX.items():
        suffix = F.when(F.col("doc_id") % 5 == k, F.lit(v)).otherwise(suffix)
    aug = docs.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("x")
    )
    return script_profile(aug, "doc_id", "x")


# C4 line fixture: planted lines exercise every rule — line 1 (prefix +
# '.') and the "planted sentence" pass; 'short line' fails both the
# terminal-punct and min-words rules; the javascript line (doc_id % 7)
# fails the word filter; the tail substring has no terminal punct; the
# page-level flags trip on lorem-ipsum (% 11) and '{' (% 13); docs with
# doc_id % 2 = 0 get a third passing line so c4_pass varies.
_C4_LINE_PASS = "This planted sentence definitely has enough words to pass."
_C4_LINE_PASS2 = "Another planted line with plenty of words kept here."
_C4_LINE_JS = "Contains javascript tracking code everywhere today."
_C4_AUG_SQL = (
    "substr(text, 1, 80) || '.' || chr(10) || 'short line' || chr(10) || "
    f"'{_C4_LINE_PASS}' || chr(10) || "
    f"CASE WHEN doc_id % 7 = 0 THEN '{_C4_LINE_JS}' || chr(10) ELSE '' END || "
    f"CASE WHEN doc_id % 2 = 0 THEN '{_C4_LINE_PASS2}' || chr(10) ELSE '' END || "
    "substr(text, 81, 60) || "
    "CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' "
    "ELSE '' END || "
    "CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'config = {' ELSE '' END"
)
_C4_KEEP_SQL = (
    # regexp split, not string_split(chr(10)): the operator splits on
    # universal newlines (CRLF fix, ADVICE r7) and the oracle must agree
    "list_filter(list_transform(regexp_split_to_array(x, '\r\n|\r|\n'), l -> trim(l)), "
    "l -> regexp_matches(l, '[.!?\"]$') "
    "AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 3 "
    "AND NOT contains(lower(l), 'javascript'))"
)


def _c4_aug_expr() -> F.Column:
    return F.concat(
        F.substring(F.col("text"), 1, 80),
        F.lit(".\n"),
        F.lit("short line\n"),
        F.lit(_C4_LINE_PASS + "\n"),
        F.when(
            F.col("doc_id") % 7 == 0, F.lit(_C4_LINE_JS + "\n")
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0, F.lit(_C4_LINE_PASS2 + "\n")
        ).otherwise(F.lit("")),
        F.substring(F.col("text"), 81, 60),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.lit("\nlorem ipsum dolor sit amet."),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0, F.lit("\nconfig = {")
        ).otherwise(F.lit("")),
    )


@register(
    "x_c4_line_filter",
    # full value parity on the planted lined corpus: counts, page flag,
    # and the md5 of the REBUILT text (kept lines joined with \n) —
    # array_to_string of an empty DuckDB list is NULL, hence COALESCE
    f"WITH a AS (SELECT doc_id, {_C4_AUG_SQL} AS x FROM documents), "
    f"k AS (SELECT doc_id, x, {_C4_KEEP_SQL} AS kept FROM a) "
    "SELECT doc_id, "
    "CAST(len(regexp_split_to_array(x, '\r\n|\r|\n')) AS INT) AS n_lines, "
    "CAST(len(kept) AS INT) AS n_kept, "
    "md5(COALESCE(array_to_string(kept, chr(10)), '')) AS fp_c4, "
    "(len(kept) >= 3 AND NOT contains(lower(x), 'lorem ipsum') "
    "AND NOT contains(x, '{')) AS c4_pass FROM k",
)
def x_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning (operators/text_cleaning.
    c4_line_filter; Raffel et al. 2020 §2.2) on a planted lined corpus —
    terminal-punct / min-words / javascript line rules plus the
    lorem-ipsum and '{' page flags, rebuilt-text fingerprint exact."""
    from purescript_ifrit_spark.operators.text_cleaning import (
        c4_line_filter,
    )

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select("doc_id", _c4_aug_expr().alias("x"))
    out = c4_line_filter(aug, "doc_id", "x")
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.md5(F.col("text_c4")).alias("fp_c4"),
        "c4_pass",
    )


@register(
    "x_cdc_chunks",
    # full value parity on the raw corpus: same fold (prepend-0
    # list_reduce ≡ aggregate with 0 init), same boundary rule, same
    # char-based slicing; chunk text surfaces as length + md5
    "WITH c AS (SELECT doc_id, text AS x, "
    "string_split_regex(text, '') AS ch FROM documents "
    "WHERE length(text) > 0), "
    "b AS (SELECT doc_id, x, ch, "
    "list_filter(range(8, len(ch)), i -> "
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(i - 7, i + 1), p -> CAST(ord(ch[p]) AS BIGINT))), "
    "(h, cc) -> (h * 31 + cc) % 2147483647) % 64 = 0) AS bounds FROM c), "
    "k AS (SELECT doc_id, x, list_concat(list_concat("
    "[CAST(0 AS BIGINT)], bounds), [CAST(len(ch) AS BIGINT)]) AS cuts "
    "FROM b) "
    "SELECT doc_id, CAST(u.i AS INT) AS chunk_idx, "
    "CAST(u.m AS INT) AS n_chunks, CAST(u.l AS INT) AS chunk_len, "
    "u.f AS chunk_fp FROM (SELECT doc_id, "
    "unnest(list_transform(range(1, len(cuts)), k -> {'i': k - 1, "
    "'m': len(cuts) - 1, "
    "'l': cuts[CAST(k + 1 AS INT)] - cuts[CAST(k AS INT)], "
    "'f': md5(substr(x, CAST(cuts[CAST(k AS INT)] + 1 AS INT), "
    "CAST(cuts[CAST(k + 1 AS INT)] - cuts[CAST(k AS INT)] AS INT)))})) "
    "AS u FROM k) q",
)
def x_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (operators/text_analysis.
    cdc_chunk_documents; Rabin rolling-hash boundaries, the rsync/LBFS
    construction) over the raw corpus — boundary positions, chunk counts
    and chunk fingerprints value-exact on both engines."""
    from purescript_ifrit_spark.operators.text_analysis import (
        cdc_chunk_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = cdc_chunk_documents(docs)
    return out.select(
        "doc_id",
        "chunk_idx",
        "n_chunks",
        F.length(F.col("chunk")).cast("int").alias("chunk_len"),
        F.col("chunk_fp"),
    )


@register(
    "x_vocab_coverage",
    # vocab = top-15 corpus tokens (count desc, token asc — deterministic
    # ties both engines); zero-token docs survive with zeros via the
    # outer join, the operator's contract
    "WITH t AS (SELECT doc_id, unnest(string_split(" + _NORM_SQL + ", ' ')) "
    "AS tok FROM documents), "
    "tt AS (SELECT doc_id, tok FROM t WHERE tok <> ''), "
    "v AS (SELECT tok FROM (SELECT tok, COUNT(*) AS c FROM tt "
    "GROUP BY tok ORDER BY c DESC, tok LIMIT 15)), "
    "a AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tok, "
    "CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS INT) AS n_oov, "
    "CAST(COUNT(DISTINCT CASE WHEN v.tok IS NULL THEN tt.tok END) AS INT) "
    "AS n_unique_oov "
    "FROM tt LEFT JOIN v ON tt.tok = v.tok GROUP BY doc_id) "
    "SELECT d.doc_id, COALESCE(n_tok, 0) AS n_tok, "
    "COALESCE(n_oov, 0) AS n_oov, "
    "COALESCE(n_unique_oov, 0) AS n_unique_oov, "
    "CASE WHEN COALESCE(n_tok, 0) > 0 "
    "THEN ROUND(n_oov * 1.0 / n_tok, 6) ELSE 0.0 END AS oov_rate "
    "FROM documents d LEFT JOIN a USING (doc_id)",
)
def x_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary profile vs a fixed vocab table
    (operators/text_analysis.vocab_coverage) — tokenizer-coverage
    analysis; the fixture vocab is the corpus top-15 so OOV rates are
    nondegenerate, the oracle re-derives it identically."""
    from purescript_ifrit_spark.operators.text_analysis import (
        vocab_coverage,
    )

    from purescript_ifrit_spark.functions import text as X

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(X.tokens(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "token")
        .limit(15)
        .select("token")
    )
    return vocab_coverage(docs, vocab)


def _links_oracle() -> str:
    from purescript_ifrit_spark.operators.text_cleaning import (
        LINK_RX,
        canonicalize_url_sql,
    )

    html = (
        "'<html><body><p>' || substr(text, 1, 40) || '</p>"
        "<a href=\"https://EX' || (doc_id % 7) || "
        "'.example.com:443/p/' || doc_id || "
        "'/?utm_source=x&b=2&a=1#f\">Doc <b>' || doc_id || "
        "'</b> link</a> mid <a href=\"/rel/' || doc_id || "
        "'\">relative</a>' || CASE WHEN doc_id % 5 = 0 THEN "
        "'<a href=\"https://hub.example.org/\">Hub</a>' ELSE '' END || "
        "'</body></html>'"
    )
    anchor = (
        "trim(regexp_replace(regexp_replace(u.a, '<[^>]+>', ' ', 'g'), "
        "'\\s+', ' ', 'g'))"
    )
    return (
        f"WITH h AS (SELECT doc_id, {html} AS x FROM documents), "
        f"e AS (SELECT doc_id, regexp_extract_all(x, '{LINK_RX}', 1) AS hs, "
        f"regexp_extract_all(x, '{LINK_RX}', 2) AS ins FROM h), "
        "z AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) + 1), "
        "k -> {'i': k - 1, 'u': hs[CAST(k AS INT)], "
        "'a': ins[CAST(k AS INT)]})) AS u FROM e) "
        "SELECT doc_id, CAST(u.i AS INT) AS link_idx, u.u AS href, "
        f"{anchor} AS anchor, "
        f"{canonicalize_url_sql('u.u')} AS url_canon FROM z"
    )


@register("x_extract_links", _links_oracle())
def x_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperlink extraction (operators/text_cleaning.extract_links) on
    synthesized HTML wrapping — hrefs, cleaned anchor text, and the
    composed canonical URL (NULL for relatives), value-exact per link."""
    from purescript_ifrit_spark.operators.text_cleaning import extract_links

    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><body><p>"),
        F.substring(F.col("text"), 1, 40),
        F.lit('</p><a href="https://EX'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com:443/p/"),
        F.col("doc_id").cast("string"),
        F.lit('/?utm_source=x&b=2&a=1#f">Doc <b>'),
        F.col("doc_id").cast("string"),
        F.lit('</b> link</a> mid <a href="/rel/'),
        F.col("doc_id").cast("string"),
        F.lit('">relative</a>'),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit('<a href="https://hub.example.org/">Hub</a>'),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    aug = docs.select("doc_id", html.alias("x"))
    return extract_links(aug, "doc_id", "x")


# planted robots rules — ONE Python constant rendered to createDataFrame
# (Spark) and VALUES (DuckDB) so the two rule tables can never drift.
# Shapes covered: longest-prefix override (d0), specific-agent group
# fully shadowing '*' (d1), equal-length allow/disallow tie -> allow
# (d2), rules for a different agent only -> wildcard group empty ->
# allowed (d3), deep prefix (d4), no rules at all (d5, d6).
_ROBOTS_RULES = [
    ("d0.com", "*", False, "/"),
    ("d0.com", "*", True, "/p3"),
    ("d1.com", "trainbot", False, "/p1"),
    ("d1.com", "*", False, "/"),
    ("d2.com", "*", False, "/p2"),
    ("d2.com", "*", True, "/p2"),
    ("d3.com", "otherbot", False, "/"),
    ("d4.com", "*", False, "/p4/x2"),
]

_ROBOTS_URLS_SQL = (
    "SELECT doc_id, 'd' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS domain, "
    "'/p' || CAST(doc_id % 13 AS VARCHAR) || '/x' || "
    "CAST(doc_id % 5 AS VARCHAR) AS path FROM documents"
)


def _robots_oracle() -> str:
    vals = ", ".join(
        f"('{d}', '{a}', {'true' if al else 'false'}, '{p}')"
        for d, a, al, p in _ROBOTS_RULES
    )
    return (
        f"WITH u AS ({_ROBOTS_URLS_SQL}), "
        f"ru(domain, agent, allow, prefix) AS (VALUES {vals}), "
        "hs AS (SELECT domain AS rd, "
        "max(CASE WHEN agent = 'trainbot' THEN 1 ELSE 0 END) AS has_spec "
        "FROM ru GROUP BY domain), "
        "g AS (SELECT ru.domain AS rd, allow, prefix FROM ru "
        "JOIN hs ON ru.domain = hs.rd "
        "WHERE CASE WHEN has_spec = 1 THEN agent = 'trainbot' "
        "ELSE agent = '*' END), "
        "j AS (SELECT u.doc_id, u.domain, u.path, g.allow, g.prefix, "
        "(g.prefix IS NOT NULL AND starts_with(u.path, g.prefix)) AS m "
        "FROM u LEFT JOIN g ON u.domain = g.rd) "
        "SELECT doc_id, min(domain) AS domain, min(path) AS path, "
        "coalesce(arg_max(allow, length(prefix) * 2 + CAST(allow AS INT)) "
        "FILTER (WHERE m), true) AS allowed "
        "FROM j GROUP BY doc_id"
    )


@register("x_robots_filter", _robots_oracle())
def x_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots-exclusion decisions (operators/text_cleaning.robots_filter;
    RFC 9309 semantics: specific-agent group shadows '*' entirely,
    longest path-prefix wins, equal-length ties resolve to allow, no
    match = allowed) on planted per-domain rule groups — every decision
    replayed by the oracle's FILTERed arg_max over the same integer
    ranking key."""
    from purescript_ifrit_spark.operators.text_cleaning import robots_filter

    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.concat(F.lit("d"), (F.col("doc_id") % 7).cast("string"),
                 F.lit(".com")).alias("domain"),
        F.concat(F.lit("/p"), (F.col("doc_id") % 13).cast("string"),
                 F.lit("/x"), (F.col("doc_id") % 5).cast("string"))
        .alias("path"),
    )
    rules = spark.createDataFrame(
        _ROBOTS_RULES, "domain string, agent string, allow boolean, prefix string"
    )
    return robots_filter(urls, rules, "trainbot")


@register(
    "x_inverted_index",
    # posting lists: df + the ascending head-10 doc ids per term, top 100
    # terms by document frequency (term as tiebreak) — the retrieval-side
    # index twin of x_term_stats, truncation replayed with the same
    # row_number rule
    "WITH e AS (SELECT doc_id, unnest(string_split("
    + _NORM_SQL
    + ", ' ')) AS term FROM documents), "
    "f AS (SELECT DISTINCT term, doc_id FROM e WHERE term <> ''), "
    "r AS (SELECT term, doc_id, row_number() OVER ("
    "PARTITION BY term ORDER BY doc_id) AS rk FROM f), "
    "g AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df, "
    "array_to_string(list_sort(list(doc_id) FILTER (rk <= 10)), ',') "
    "AS postings FROM r GROUP BY term) "
    "SELECT term, df, postings FROM g ORDER BY df DESC, term LIMIT 100",
)
def x_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index (operators/text_analysis.inverted_index): term →
    (df, truncated ascending posting list) over the shared tokenizer.
    Posting heads are bounded BEFORE collection (rank-then-collect, one
    wide exchange for window+agg) — per-term state never exceeds
    max_postings even for stopwords. Top 100 terms by df."""
    from purescript_ifrit_spark.operators.text_analysis import (
        inverted_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = inverted_index(docs, "doc_id", "text", max_postings=10)
    return idx.orderBy(F.col("df").desc(), F.col("term").asc()).limit(100)


_MD_NL = "chr(10)"
_MD_SYNTH_DUCK = (
    f"'# T' || doc_id || {_MD_NL} || substr(text, 1, 40) || {_MD_NL} || "
    f"'## A' || {_MD_NL} || substr(text, 41, 40) || {_MD_NL} || "
    f"'### B' || {_MD_NL} || substr(text, 81)"
)


@register(
    "x_markdown_sections",
    # planted markdown (headings injected at fixed character offsets —
    # deterministic on both engines) segmented by the same line
    # machinery: explode with position, ATX detection, cumulative
    # heading count as the section ordinal, per-section regroup
    "WITH md AS (SELECT doc_id, "
    + _MD_SYNTH_DUCK
    + " AS text FROM documents WHERE length(text) > 0), "
    "l AS (SELECT doc_id, CAST(generate_subscripts(ls, 1) - 1 AS INT) "
    "AS pos, unnest(ls) AS line FROM "
    "(SELECT doc_id, regexp_split_to_array(text, '\r\n|\r|\n') AS ls FROM md)), "
    "m AS (SELECT doc_id, pos, line, "
    "regexp_matches(line, '^#{1,6} ') AS is_h FROM l), "
    "s AS (SELECT *, CAST(SUM(CASE WHEN is_h THEN 1 ELSE 0 END) OVER ("
    "PARTITION BY doc_id ORDER BY pos) AS INT) AS sec FROM m), "
    "g AS (SELECT doc_id, sec, "
    "max(CASE WHEN is_h THEN line END) AS hline, "
    "coalesce(string_agg(CASE WHEN NOT is_h THEN line END, chr(10) "
    "ORDER BY pos), '') AS body, "
    "CAST(COUNT(*) FILTER (NOT is_h) AS BIGINT) AS n_lines "
    "FROM s GROUP BY doc_id, sec) "
    "SELECT doc_id, sec, "
    "CASE WHEN hline IS NOT NULL THEN "
    "CAST(length(regexp_extract(hline, '^(#{1,6}) ', 1)) AS INT) END "
    "AS level, "
    "CASE WHEN hline IS NOT NULL THEN "
    "regexp_replace(hline, '^#{1,6} ', '') END AS title, "
    "body, n_lines FROM g",
)
def x_markdown_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heading-aware segmentation (operators/text_cleaning.
    markdown_sections) over planted markdown: '# T<id>' / '## A' /
    '### B' headings injected at fixed offsets into each document. One
    doc-keyed window + one (doc, sec) aggregate sharing the exchange;
    the oracle replays line positions, heading detection and the
    cumulative section ordinal exactly."""
    from purescript_ifrit_spark.operators.text_cleaning import (
        markdown_sections,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    md = docs.select(
        "doc_id",
        F.expr(
            "concat('# T', doc_id, '\\n', substring(text, 1, 40), '\\n', "
            "'## A', '\\n', substring(text, 41, 40), '\\n', "
            "'### B', '\\n', substring(text, 81))"
        ).alias("text"),
    )
    return markdown_sections(md, "doc_id", "text")


@register(
    "x_xent_against",
    # cross-corpus unigram cross-entropy: the reference LM is the even
    # half of documents (add-one smoothed over its vocab; unseen target
    # tokens share the one +1 OOV mass), the scored corpus is the odd
    # half — every count is an exact integer, both sides round the mean
    # to 6 decimals (libm ln + sum-order noise, the x_unigram_xent
    # convention)
    "WITH rtok AS (SELECT "
    f"UNNEST(string_split({_NORM_SQL}, ' ')) AS term FROM documents "
    "WHERE doc_id % 2 = 0), "
    "v AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM rtok "
    "WHERE term <> '' GROUP BY term), "
    "st AS (SELECT CAST(SUM(c) AS BIGINT) AS n, "
    "CAST(COUNT(*) AS BIGINT) AS vc FROM v), "
    "ttok AS (SELECT doc_id, "
    f"UNNEST(string_split({_NORM_SQL}, ' ')) AS term FROM documents "
    "WHERE doc_id % 2 = 1), "
    "t2 AS (SELECT doc_id, term FROM ttok WHERE term <> '') "
    "SELECT doc_id, "
    "ROUND(SUM(-ln((COALESCE(v.c, 0) + 1) * 1.0 / (st.n + st.vc + 1))) "
    "/ CAST(COUNT(*) AS DOUBLE), 6) AS xent_ref, "
    "CAST(COUNT(*) AS BIGINT) AS n_tokens, "
    "CAST(SUM(CASE WHEN v.c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov "
    "FROM t2 LEFT JOIN v USING (term) CROSS JOIN st GROUP BY doc_id",
)
def x_xent_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring against a TRUSTED reference corpus
    (operators/text_analysis.unigram_logprob_against): the odd-id half
    of documents scored under the even-id half's smoothed unigram LM —
    the cross-corpus perplexity filter."""
    from purescript_ifrit_spark.operators.text_analysis import (
        unigram_logprob_against,
    )

    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    tgt = docs.filter(F.col("doc_id") % 2 == 1)
    out = unigram_logprob_against(tgt, ref, "doc_id", "text")
    return out.select(
        "doc_id",
        F.round(F.col("xent_ref"), 6).alias("xent_ref"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_oov").cast("long").alias("n_oov"),
    )


@register(
    "x_dsir_weights",
    # DSIR hashed-ngram importance log-weights (Xie et al. 2023): the
    # reference is the even half, the raw target the odd half; unigrams
    # and bigrams hash with the engine-neutral md5 bucket scheme
    # (conv(md5[:8]) % 64 — the x_feature_hash convention), add-one
    # smoothing per side, exact-integer bucket counts, round-6 sums
    "WITH uni AS (SELECT doc_id, "
    f"UNNEST(string_split({_NORM_SQL}, ' ')) AS g FROM documents), "
    "tk AS (SELECT doc_id, "
    f"string_split({_NORM_SQL}, ' ') AS ts FROM documents), "
    "bi AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g "
    "FROM tk, UNNEST(range(1, len(ts))) AS r(i) WHERE len(ts) >= 2), "
    "grams AS (SELECT doc_id, g FROM uni WHERE g <> '' "
    "UNION ALL SELECT doc_id, g FROM bi), "
    "bkt AS (SELECT doc_id, "
    "CAST(CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % 64 AS INT) AS b "
    "FROM grams), "
    "rb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM bkt "
    "WHERE doc_id % 2 = 0 GROUP BY b), "
    "tb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM bkt "
    "WHERE doc_id % 2 = 1 GROUP BY b), "
    "rt AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr FROM rb), "
    "tt AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt FROM tb) "
    "SELECT doc_id, "
    "ROUND(SUM(ln((COALESCE(rb.cr, 0) + 1) * 1.0 / (rt.nr + 64)) "
    "- ln((COALESCE(tb.ct, 0) + 1) * 1.0 / (tt.nt + 64))), 6) AS log_weight, "
    "CAST(COUNT(*) AS BIGINT) AS n_grams "
    "FROM bkt LEFT JOIN rb USING (b) LEFT JOIN tb USING (b) "
    "CROSS JOIN rt CROSS JOIN tt WHERE doc_id % 2 = 1 GROUP BY doc_id",
)
def x_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling weights
    (operators/text_analysis.dsir_weights): hashed unigram+bigram
    importance log-weights of the odd-id half against the even-id
    reference half — the data-selection score a targeted pretraining
    mix is drawn from."""
    from purescript_ifrit_spark.operators.text_analysis import dsir_weights

    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    tgt = docs.filter(F.col("doc_id") % 2 == 1)
    out = dsir_weights(tgt, ref, "doc_id", "text", dim=64)
    return out.select(
        "doc_id",
        F.round(F.col("log_weight"), 6).alias("log_weight"),
        F.col("n_grams").cast("long").alias("n_grams"),
    )
