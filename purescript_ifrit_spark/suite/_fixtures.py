"""Shared oracle-SQL builders and planted-truth fixtures used across
the suite domain modules (split out of the old suite.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purescript_ifrit_spark.api import run_query
from purescript_ifrit_spark.sources.tables import load_table



def _lineitem_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array<struct> column for the nested push-down operators: one row per
    order with its lineitems collected as structs."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct(F.col("l_quantity").alias("qty"))).alias("items")
    )


# ===========================================================================
# §2.7 extensions — training-data-pipeline operators
# ===========================================================================

# normalized-text expression shared by the DuckDB oracles below (must stay
# in lock-step with functions/text.py normalize_text)
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _lang_oracle() -> str:
    from purescript_ifrit_spark.operators.text_analysis import LANG_MARKERS

    scores = ", ".join(
        f"len(regexp_extract_all(lower(text), '{rx}', 0)) AS s_{lang}"
        for lang, rx in LANG_MARKERS
    )
    langs = [lang for lang, _ in LANG_MARKERS]
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    cases = " ".join(
        f"WHEN s_{l} > 0 AND s_{l} = {best} THEN '{l}'" for l in langs
    )
    return (
        f"SELECT doc_id, CASE {cases} ELSE 'und' END AS lang_pred "
        f"FROM (SELECT doc_id, text, {scores} FROM documents) t"
    )

# DuckDB twin of the QUALITY formula (functions/text.py quality): integer
# micro-unit arithmetic — half-up ratio quantization via (2k·10⁶+n)//(2n)
# integer division, terms combined as integers, one exact int→double
# division at the end. No float rounding anywhere: a floating formula lands
# on decimal half-boundaries where engines' ROUND implementations disagree
# (found the hard way at sf0.01 doc 188, exactly 0.6475745).
_QUALITY_ORACLE_EXPR = (
    "CAST(4 * least(n_tok * 10000, 1000000) "
    "+ 3 * (1000000 - least(4 * (CASE WHEN nonspace = 0 THEN 0 "
    "ELSE (punct * 2000000 + nonspace) // (nonspace * 2) END), 1000000)) "
    "+ 3 * least(5 * (CASE WHEN n_tok = 0 THEN 0 "
    "ELSE (hits * 2000000 + n_tok) // (n_tok * 2) END), 1000000) "
    "AS DOUBLE) / CAST(10000000 AS DOUBLE)"
)

# the integer inputs to the quality formula, from the normalized text
_QUALITY_ORACLE_INPUTS = (
    "SELECT doc_id, "
    f"CASE WHEN length({_NORM_SQL}) = 0 THEN 0 "
    f"ELSE len(string_split({_NORM_SQL}, ' ')) END AS n_tok, "
    f"length(replace({_NORM_SQL}, ' ', '')) AS nonspace, "
    f"length(regexp_replace({_NORM_SQL}, '[a-z0-9\\s]', '', 'g')) AS punct, "
    # token-equality count (DuckDB's RE2 has no lookahead for the regex
    # twin; over single-space-normalized text the two counts are identical)
    f"len(list_filter(string_split({_NORM_SQL}, ' '), "
    "x -> x IN ('the','a','of','and','is','to','in'))) AS hits "
    "FROM documents"
)


def _xd_lang_oracle() -> str:
    # same construction as _lang_oracle but over the dialect entry's alias
    from purescript_ifrit_spark.functions.text import LANG_MARKERS

    scores = ", ".join(
        f"len(regexp_extract_all(lower(text), '{rx}', 0)) AS s_{lang}"
        for lang, rx in LANG_MARKERS
    )
    langs = [lang for lang, _ in LANG_MARKERS]
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    cases = " ".join(
        f"WHEN s_{l} > 0 AND s_{l} = {best} THEN '{l}'" for l in langs
    )
    return (
        f"SELECT doc_id, CASE {cases} ELSE 'und' END AS lang FROM "
        f"(SELECT doc_id, text, {scores} FROM documents) t"
    )


def _budget_oracle() -> str:
    # per-split token budget: same md5 draw order, same token-count identity
    from purescript_ifrit_spark.functions.dialect_ext import EXT_FUNCTIONS

    split = EXT_FUNCTIONS["SPLIT"].sql("doc_id")
    ntok = (
        f"CASE WHEN length({_NORM_SQL}) = 0 THEN 0 "
        f"ELSE len(string_split({_NORM_SQL}, ' ')) END"
    )
    draw = "substr(md5(doc_id || ':v1'), 1, 8)"
    return (
        f"WITH base AS (SELECT doc_id, {split} AS split, {ntok} AS n_tok, "
        f"{draw} AS d FROM documents), "
        "c AS (SELECT doc_id, split, SUM(n_tok) OVER (PARTITION BY split "
        "ORDER BY d, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM base) "
        "SELECT doc_id, split FROM c WHERE cum <= 10000"
    )


def _xd_split_oracle() -> str:
    # the dialect SPLIT twin, generated from the same registry expression
    from purescript_ifrit_spark.functions.dialect_ext import EXT_FUNCTIONS

    case = EXT_FUNCTIONS["SPLIT"].sql("doc_id")
    return f"SELECT doc_id, {case} AS split FROM documents"


def _planted_pieces(spark: SparkSession, sf_dir: str):
    """Deterministic planted-duplicate families derived from the documents
    ids — returns (base, exact_var, near_var): every base doc gets 40
    tokens unique to its id (cross-doc jaccard is exactly 0), docs with
    id % 10 == 0 get an exact-normalized variant at id + 10**12 (jaccard
    exactly 1 — always an LSH candidate since identical shingles give
    identical signatures), and docs with id % 10 == 5 get a 38-token
    prefix variant at id + 2·10**12 (shingle jaccard exactly 36/38 ≈
    0.947)."""
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda k: F.concat(
            F.lit("t"), F.col("doc_id").cast("string"), F.lit("x"),
            k.cast("string"),
        ),
    )
    base = ids.select("doc_id", F.array_join(toks, " ").alias("text"))
    # variants derive from base's materialized `text` column — NOT from the
    # token lambda, which would re-resolve `doc_id` against the shifted alias
    exact_var = base.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000_000_000).alias("doc_id"),
        # case + whitespace noise: normalizes back to the base text
        F.regexp_replace(F.upper(F.col("text")), " ", "  ").alias("text"),
    )
    near_var = base.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 2_000_000_000_000).alias("doc_id"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 38), " ").alias(
            "text"
        ),
    )
    return base, exact_var, near_var


def _planted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, exact_var, near_var = _planted_pieces(spark, sf_dir)
    return base.unionAll(exact_var).unionAll(near_var)


# DuckDB twin of the planted-corpus token lists (1-indexed lists)
_PLANTED_TOKS = (
    "SELECT doc_id, list_transform(range(0, 40), "
    "k -> 't' || doc_id || 'x' || k) AS toks FROM documents"
)


def _rolling_fp_oracle() -> str:
    from purescript_ifrit_spark.functions.text import ROLLING_BASE, ROLLING_MOD

    return (
        "SELECT doc_id, CASE WHEN length(" + _NORM_SQL + ") = 0 THEN 0 "
        "ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split_regex(" + _NORM_SQL + ", ''), "
        "ch -> CAST(ord(ch) AS BIGINT))), "
        f"(h, ch) -> (h * {ROLLING_BASE} + ch) % {ROLLING_MOD}) "
        "END AS rolling_fp FROM documents"
    )


def _curate_exact_oracle() -> str:
    # the exact-stage curation composition is fully SQL-expressible:
    # quality gate → exact content dedup (min id per fingerprint)
    inputs_with_fp = _QUALITY_ORACLE_INPUTS.replace(
        "SELECT doc_id, ",
        f"SELECT doc_id, md5({_NORM_SQL}) AS fingerprint, ",
        1,
    )
    return (
        f"WITH base AS ({inputs_with_fp}), "
        "q AS (SELECT doc_id, fingerprint, n_tok, "
        + _QUALITY_ORACLE_EXPR
        + " AS quality FROM base), "
        "k AS (SELECT * FROM q WHERE quality >= 0.2 AND n_tok >= 5), "
        "d AS (SELECT fingerprint, min(doc_id) AS doc_id FROM k GROUP BY 1) "
        "SELECT k.doc_id, k.quality, CAST(k.n_tok AS BIGINT) AS n_tokens, "
        "k.fingerprint FROM k JOIN d ON k.doc_id = d.doc_id "
        "AND k.fingerprint = d.fingerprint"
    )


def _split_oracle() -> str:
    # the oracle CASE is generated by the operator's own SQL twin, so the
    # cutpoints can never drift between engine and oracle
    from purescript_ifrit_spark.operators.sampling import hash_split_sql

    case = hash_split_sql("doc_id", (("train", 0.98), ("val", 0.01), ("test", 0.01)))
    return f"SELECT doc_id, {case} AS split FROM documents"


def _sample_oracle() -> str:
    from purescript_ifrit_spark.operators.sampling import _hex_cut

    return (
        "SELECT doc_id FROM documents "
        f"WHERE substr(md5(doc_id || ':v1'), 1, 8) < '{_hex_cut(0.1)}'"
    )


# ---------------------------------------------------------------------------
# text cleaning (operators/text_cleaning.py): PII injected deterministically
# in-entry (the driver corpus is PII-free), then boilerplate-stripped and
# redacted stage-by-stage on BOTH engines — byte-exact via md5
# ---------------------------------------------------------------------------


# planted-PII lines, ONE definition feeding both engines (a Column builder
# and a SQL-fragment twin per plant) so the four consuming sites — batch +
# dialect entries and their oracles — can never drift. Each (modulus,
# column-expr builder, sql-expr) appends one line when doc_id % modulus == 0.
def _pii_plants(with_boilerplate: bool):
    plants = []
    if with_boilerplate:
        plants.append(
            (
                5,
                lambda did: F.lit("\nAll Rights Reserved. Cookie Policy applies."),
                "chr(10) || 'All Rights Reserved. Cookie Policy applies.'",
            )
        )
    plants += [
        (
            7,
            lambda did: F.concat(
                F.lit("\nContact: user"), did.cast("string"), F.lit("@example.com")
            ),
            "chr(10) || 'Contact: user' || doc_id || '@example.com'",
        ),
        (
            11,
            lambda did: F.concat(
                F.lit("\nSee https://ex"), did.cast("string"), F.lit(".example/a?b=1")
            ),
            "chr(10) || 'See https://ex' || doc_id || '.example/a?b=1'",
        ),
        (
            13,
            lambda did: F.concat(
                F.lit("\nCall +1 555-0"), (did % 100 + 100).cast("string")
            ),
            "chr(10) || 'Call +1 555-0' || (doc_id % 100 + 100)",
        ),
    ]
    return plants


def _pii_aug_col(with_boilerplate: bool) -> "F.Column":
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        *[
            F.when(did % m == 0, build(did)).otherwise(F.lit(""))
            for m, build, _ in _pii_plants(with_boilerplate)
        ],
    )


def _pii_aug_sql(with_boilerplate: bool) -> str:
    cases = "".join(
        f" || CASE WHEN doc_id % {m} = 0 THEN {sql} ELSE '' END"
        for m, _, sql in _pii_plants(with_boilerplate)
    )
    return f"SELECT doc_id, text{cases} AS x FROM documents"


def _pii_oracle() -> str:
    from purescript_ifrit_spark.operators.text_cleaning import (
        BOILERPLATE_RX,
        PII_PATTERNS,
    )

    aug = _pii_aug_sql(with_boilerplate=True)
    strip = (
        "SELECT doc_id, array_to_string(list_filter(string_split(x, chr(10)),"
        f" l -> NOT regexp_matches(l, '{BOILERPLATE_RX}')), chr(10)) AS x"
        f" FROM ({aug}) t0"
    )
    prev, carried = strip, []
    for kind, rx, tok in PII_PATTERNS:
        cols = ", ".join(carried + [""]).strip()
        prev = (
            f"SELECT doc_id, {cols}"
            f" CAST(len(regexp_extract_all(x, '{rx}')) AS BIGINT) AS n_{kind},"
            f" regexp_replace(x, '{rx}', '{tok}', 'g') AS x FROM ({prev}) t_{kind}"
        )
        carried.append(f"n_{kind}")
    return (
        f"SELECT doc_id, {', '.join(carried)}, md5(x) AS fp FROM ({prev}) tz"
    )


def _redact_dialect_oracle() -> str:
    # staged regexp_replace over the SAME planted-PII text as x_pii_redact
    # (minus boilerplate — REDACT is the redaction chain only)
    from purescript_ifrit_spark.operators.text_cleaning import PII_PATTERNS

    aug = _pii_aug_sql(with_boilerplate=False)
    expr = "x"
    for _, rx, tok in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{rx}', '{tok}', 'g')"
    return f"SELECT doc_id, md5({expr}) AS fp FROM ({aug}) t"


def _stratified_oracle() -> str:
    from purescript_ifrit_spark.operators.sampling import stratified_sample_sql

    pred = stratified_sample_sql(
        "doc_id", "lang", {"en": 0.5, "de": 0.25, "fr": 0.1}, 0.02
    )
    return f"SELECT doc_id, lang FROM documents WHERE {pred}"


# DuckDB twin of functions/text.word_shingles(n=8): distinct 8-gram list
# with the short-text fallback (whole normalized text) and the empty-text
# empty list — the operator's exact contract
_DUCK_8GRAMS = (
    # s IS NULL must short-circuit FIRST: len(NULL)=NULL would fall through
    # both WHENs to ELSE [NULL], while Spark's word_shingles returns [] for
    # NULL text (its documented load-bearing NULL leg)
    "CASE WHEN s IS NULL OR len(s) = 0 THEN CAST([] AS VARCHAR[]) "
    "WHEN len(ws) >= 8 THEN list_distinct(list_transform(range(1, len(ws) - 6), "
    "  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' "
    "  || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7])) "
    "ELSE [s] END"
)
