"""The operator-coverage suite: one named query per implemented operator
from SURVEY.md §2, each paired with an ANSI-SQL oracle that DuckDB can run
on the same parquet tables.

This module backs `__spark_entry__.py` (the driver contract). Every entry is

    name -> (spark_fn, oracle_sql | None)

where `spark_fn(spark, sf_dir) -> DataFrame` exercises OUR engine (the
dialect compiler or an operators/ extension) and `oracle_sql` recomputes the
same result in plain SQL. Column names are aliased identically on both
sides; float aggregates are rounded to 6 decimals on both sides so the
driver's order-insensitive value-hash is robust to summation-order noise.

Determinism notes: every LIMIT query orders by a unique key (or a key
chain ending in one); collect_list results are sorted + joined to a string
on both sides.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purescript_ifrit_spark.api import run_query
from purescript_ifrit_spark.sources.tables import load_table

SparkFn = Callable[[SparkSession, str], DataFrame]

# registry filled at import time: name -> (fn, oracle)
REGISTRY: Dict[str, Tuple[SparkFn, Optional[str]]] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn: SparkFn) -> SparkFn:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def _dialect(table: str, sql: str, post=None) -> SparkFn:
    """Run a dialect query over one driver table (schema derived from the
    table's own Spark schema — SURVEY §1.2's allowlist mode is exercised in
    tests)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = run_query(spark, load_table(spark, sf_dir, table), sql)
        return post(df) if post is not None else df

    return fn


def _round(*cols: str, ndigits: int = 6):
    def post(df: DataFrame) -> DataFrame:
        for c in cols:
            df = df.withColumn(c, F.round(F.col(c), ndigits))
        return df

    return post


def _null_id(df: DataFrame) -> DataFrame:
    # GROUP BY NULL produces a NullType `_id`; cast to string so the
    # cross-engine schema comparison is stable
    return df.withColumn("_id", F.col("_id").cast("string"))


def _chain(*fs):
    def post(df: DataFrame) -> DataFrame:
        for f in fs:
            df = f(df)
        return df

    return post


# ===========================================================================
# §2.2 Projection
# ===========================================================================

register("p1_projection", "SELECT c_name, c_mktsegment FROM customer")(
    _dialect("customer", "SELECT c_name, c_mktsegment")
)

register("p3_alias", "SELECT c_name AS name, c_acctbal AS balance FROM customer")(
    _dialect("customer", "SELECT c_name AS name, c_acctbal AS balance")
)

# ===========================================================================
# §2.3 Filters
# ===========================================================================

register("f1_eq", "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'")(
    _dialect("orders", 'SELECT o_orderkey WHERE o_orderstatus = "F"')
)

register("f1_neq", "SELECT o_orderkey FROM orders WHERE o_orderstatus <> 'F'")(
    _dialect("orders", 'SELECT o_orderkey WHERE o_orderstatus != "F"')
)

register(
    "f2_lt_gt",
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity > 45 ",
)(_dialect("lineitem", "SELECT l_orderkey, l_linenumber WHERE l_quantity > 45"))

register(
    "f3_lte_via_not",
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity <= 45",
)(_dialect("lineitem", "SELECT l_orderkey, l_linenumber WHERE NOT (l_quantity > 45)"))

register(
    "f3_gte_direct",
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity >= 49",
)(_dialect("lineitem", "SELECT l_orderkey, l_linenumber WHERE l_quantity >= 49"))

register(
    "f4_and",
    "SELECT l_orderkey, l_linenumber FROM lineitem "
    "WHERE l_quantity > 45 AND l_discount < 0.05",
)(
    _dialect(
        "lineitem",
        "SELECT l_orderkey, l_linenumber WHERE (l_quantity > 45 AND l_discount < 0.05)",
    )
)

register(
    "f5_or",
    "SELECT l_orderkey, l_linenumber FROM lineitem "
    "WHERE l_quantity > 49 OR l_discount > 0.09",
)(
    _dialect(
        "lineitem",
        "SELECT l_orderkey, l_linenumber WHERE (l_quantity > 49 OR l_discount > 0.09)",
    )
)

register(
    "f6_not_demorgan",
    "SELECT l_orderkey, l_linenumber FROM lineitem "
    "WHERE NOT (l_quantity > 45 AND l_discount < 0.05)",
)(
    _dialect(
        "lineitem",
        "SELECT l_orderkey, l_linenumber WHERE NOT (l_quantity > 45 AND l_discount < 0.05)",
    )
)


@register("f7_bare_boolean", "SELECT event_id FROM events WHERE value > 50")
def f7_bare_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the driver tables have no boolean column; derive one, then use the
    # dialect's bare-field predicate (SURVEY §2.3 F7)
    events = load_table(spark, sf_dir, "events").withColumn(
        "big", F.col("value") > F.lit(50.0)
    )
    return run_query(spark, events, "SELECT event_id WHERE big")


@register(
    "f8_null_compare",
    "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'",
)
def f8_null_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    # `= NULL` ≡ isNull (SURVEY §2.3 F1); driver tables have no nulls, so
    # derive a nullable column first
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "maybe",
        F.when(F.col("o_orderstatus") == "F", F.lit(None).cast("double")).otherwise(
            F.col("o_totalprice")
        ),
    )
    return run_query(spark, orders, "SELECT o_orderkey WHERE maybe = NULL")


register(
    "f9_reversed_literal",
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE 45 < l_quantity",
)(_dialect("lineitem", "SELECT l_orderkey, l_linenumber WHERE 45 < l_quantity"))

# ===========================================================================
# §2.5 Sort / limit / offset
# ===========================================================================

register(
    "o1_o2_topk",
    "SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10",
)(
    _dialect(
        "orders",
        "SELECT o_orderkey, o_totalprice ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10",
    )
)

# O3 quirk: LIMIT runs BEFORE OFFSET → take 20, then skip 5 → 15 rows
register(
    "o3_limit_before_offset",
    "SELECT * FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20) t "
    "ORDER BY o_orderkey OFFSET 5",
)(_dialect("orders", "SELECT o_orderkey ORDER BY o_orderkey LIMIT 20 OFFSET 5"))

# O4 quirk: in grouped statements ORDER BY/LIMIT select the aggregated rows
register(
    "o4_pregroup_sort_limit",
    "SELECT CAST(NULL AS VARCHAR) AS _id, ROUND(AVG(o_totalprice), 6) AS avg_top "
    "FROM (SELECT o_totalprice FROM orders "
    "      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100) t",
)(
    _dialect(
        "orders",
        "SELECT AVG(o_totalprice) AS avg_top GROUP BY NULL "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100",
        post=_chain(_null_id, _round("avg_top")),
    )
)

# ===========================================================================
# §2.4 mode A — grouped aggregation
# ===========================================================================

register(
    "a1_a3_group_avg",
    "SELECT l_returnflag AS _id, ROUND(AVG(l_quantity), 6) AS avg_qty "
    "FROM lineitem GROUP BY l_returnflag",
)(
    _dialect(
        "lineitem",
        "SELECT AVG(l_quantity) AS avg_qty GROUP BY l_returnflag",
        post=_round("avg_qty"),
    )
)

register(
    "a2_group_by_null",
    "SELECT CAST(NULL AS VARCHAR) AS _id, COUNT(*) AS n, "
    "ROUND(SUM(o_totalprice), 4) AS total FROM orders",
)(
    _dialect(
        "orders",
        "SELECT COUNT(o_orderkey) AS n, SUM(o_totalprice) AS total GROUP BY NULL",
        post=_chain(_null_id, _round("total", ndigits=4)),
    )
)

register(
    "a4_group_sum",
    "SELECT l_returnflag AS _id, ROUND(SUM(l_extendedprice), 4) AS sum_price "
    "FROM lineitem GROUP BY l_returnflag",
)(
    _dialect(
        "lineitem",
        "SELECT SUM(l_extendedprice) AS sum_price GROUP BY l_returnflag",
        post=_round("sum_price", ndigits=4),
    )
)

register(
    "a5_group_min_max",
    "SELECT o_orderpriority AS _id, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi "
    "FROM orders GROUP BY o_orderpriority",
)(
    _dialect(
        "orders",
        "SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi GROUP BY o_orderpriority",
    )
)

register(
    "a6_group_count",
    "SELECT o_orderpriority AS _id, COUNT(*) AS n FROM orders GROUP BY o_orderpriority",
)(_dialect("orders", "SELECT COUNT(o_orderkey) AS n GROUP BY o_orderpriority"))

register(
    "a7_push_collect",
    "SELECT l_orderkey AS _id, "
    "array_to_string(list_sort(list(l_linenumber)), ',') AS lines "
    "FROM lineitem GROUP BY l_orderkey",
)(
    _dialect(
        "lineitem",
        "SELECT l_linenumber AS lines GROUP BY l_orderkey",
        post=lambda df: df.withColumn(
            "lines", F.array_join(F.sort_array(F.col("lines")), ",")
        ),
    )
)

# ===========================================================================
# §2.1 S2 — derived tables
# ===========================================================================

register(
    "s2_derived_table",
    "SELECT CAST(NULL AS VARCHAR) AS _id, ROUND(AVG(o_totalprice), 6) AS avg_f "
    "FROM orders WHERE o_orderstatus = 'F'",
)(
    _dialect(
        "orders",
        "SELECT AVG(price) AS avg_f FROM "
        '(SELECT o_totalprice AS price, o_orderstatus) '
        'WHERE o_orderstatus = "F" GROUP BY NULL',
        post=_chain(_null_id, _round("avg_f")),
    )
)

# ===========================================================================
# §2.4 mode B — per-row array aggregation (embeddings: array<float>[64])
# ===========================================================================

register(
    "b1_avg_array",
    "SELECT vec_id, ROUND(list_aggregate(embedding, 'avg'), 6) AS avg_emb FROM embeddings",
)(
    _dialect(
        "embeddings",
        "SELECT vec_id, AVG(embedding) AS avg_emb",
        post=_round("avg_emb"),
    )
)

register(
    "b3_sum_array",
    "SELECT vec_id, ROUND(list_aggregate(embedding, 'sum'), 6) AS sum_emb FROM embeddings",
)(
    _dialect(
        "embeddings",
        "SELECT vec_id, SUM(embedding) AS sum_emb",
        post=_round("sum_emb"),
    )
)

register(
    "b4_min_max_array",
    "SELECT vec_id, ROUND(list_aggregate(embedding, 'min'), 6) AS lo, "
    "ROUND(list_aggregate(embedding, 'max'), 6) AS hi FROM embeddings",
)(
    _dialect(
        "embeddings",
        "SELECT vec_id, MIN(embedding) AS lo, MAX(embedding) AS hi",
        post=_round("lo", "hi"),
    )
)

register(
    "b6_count_array",
    "SELECT vec_id, len(embedding) AS dim FROM embeddings",
)(
    _dialect(
        "embeddings",
        "SELECT vec_id, COUNT(embedding) AS dim",
        post=lambda df: df.withColumn("dim", F.col("dim").cast("long")),
    )
)


def _lineitem_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array<struct> column for the nested push-down operators: one row per
    order with its lineitems collected as structs."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct(F.col("l_quantity").alias("qty"))).alias("items")
    )


@register(
    "b2_avg_nested_array",
    "SELECT l_orderkey, ROUND(AVG(l_quantity), 6) AS avg_qty "
    "FROM lineitem GROUP BY l_orderkey",
)
def b2_avg_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = run_query(
        spark, _lineitem_nested(spark, sf_dir),
        "SELECT l_orderkey, AVG(items.qty) AS avg_qty",
    )
    return df.withColumn("avg_qty", F.round("avg_qty", 6))


@register(
    "b5_max_nested_array",
    "SELECT l_orderkey, MAX(l_quantity) AS max_qty, MIN(l_quantity) AS min_qty "
    "FROM lineitem GROUP BY l_orderkey",
)
def b5_minmax_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_query(
        spark, _lineitem_nested(spark, sf_dir),
        "SELECT l_orderkey, MAX(items.qty) AS max_qty, MIN(items.qty) AS min_qty",
    )


# ===========================================================================
# §2.2 P2 — nested-path projection (dot → underscore)
# ===========================================================================


@register(
    "p2_nested_projection",
    # the oracle recomputes the FLAT truth straight from orders: the dialect
    # must project struct paths info.detail.price / info.status into columns
    # named info_detail_price / info_status (reference Semantic.purs dot →
    # underscore rule; golden test/Test.Main.purs:1357-1387)
    "SELECT o_orderkey AS okey, o_totalprice AS info_detail_price, "
    "o_orderstatus AS info_status FROM orders",
)
def p2_nested_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    nested = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.struct(
            F.struct(F.col("o_totalprice").alias("price")).alias("detail"),
            F.col("o_orderstatus").alias("status"),
        ).alias("info"),
    )
    return run_query(
        spark, nested, "SELECT okey, info.detail.price, info.status"
    )


# ===========================================================================
# §2.7 extensions — training-data-pipeline operators
# ===========================================================================

# normalized-text expression shared by the DuckDB oracles below (must stay
# in lock-step with functions/text.py normalize_text)
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "x_dedup_exact",
    f"SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5({_NORM_SQL})",
)
def x_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.dedup import dedup_exact_text

    docs = load_table(spark, sf_dir, "documents")
    return dedup_exact_text(docs, "text", "doc_id").select("doc_id")


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


# ---------------------------------------------------------------------------
# §2.7 extensions exposed IN the dialect (functions/dialect_ext.py): these
# entries run dialect-SQL strings through the full compiler, not Python API
# calls — the hard signal that a query-engine user can reach the operators
# ---------------------------------------------------------------------------

register(
    "xd_dedup_exact",
    f"SELECT min(doc_id) AS doc_id, md5({_NORM_SQL}) AS _id "
    f"FROM documents GROUP BY md5({_NORM_SQL})",
)(
    _dialect(
        "documents",
        "SELECT MIN(doc_id) AS doc_id GROUP BY FINGERPRINT(text)",
    )
)

register(
    "xd_token_count",
    "SELECT doc_id, "
    f"CAST(CASE WHEN length({_NORM_SQL}) = 0 THEN 0 "
    f"ELSE len(string_split({_NORM_SQL}, ' ')) END AS BIGINT) AS n_tokens "
    "FROM documents",
)(
    _dialect(
        "documents",
        "SELECT doc_id, TOKEN_COUNT(text) AS n_tokens",
        post=lambda df: df.withColumn(
            "n_tokens", F.col("n_tokens").cast("long")
        ),
    )
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

register(
    "xd_quality",
    "SELECT doc_id, " + _QUALITY_ORACLE_EXPR + " AS q FROM ("
    + _QUALITY_ORACLE_INPUTS + ") t",
)(_dialect("documents", "SELECT doc_id, QUALITY(text) AS q"))


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


register("xd_lang_id", _xd_lang_oracle())(
    _dialect("documents", "SELECT doc_id, LANG_ID(text) AS lang")
)

register(
    "xd_chunk",
    # chunks joined on the unit separator so the compared cell is a string
    # (list-cell hashing differs across engines; precedent: a7_push_collect)
    "WITH t AS (SELECT doc_id, "
    f"string_split({_NORM_SQL}, ' ') AS toks FROM documents) "
    "SELECT doc_id, array_to_string(list_transform("
    "range(0, 1 + CAST(ceil(greatest(len(toks) - 64, 0) / 56.0) AS BIGINT)), "
    "i -> array_to_string(toks[CAST(i*56+1 AS INT):CAST(i*56+64 AS INT)], ' ')"
    "), chr(31)) AS chunks FROM t",
)(
    _dialect(
        "documents",
        "SELECT doc_id, CHUNK(text) AS chunks",
        post=lambda df: df.withColumn(
            "chunks", F.array_join(F.col("chunks"), "\x1f")
        ),
    )
)

register(
    "xd_quality_filter",
    # composition: extension scalar in a derived table, filtered outside —
    # the curation idiom expressed entirely in the dialect. The > 0.5
    # comparison is exact: q is integer deci-micros / 10⁷ on both engines
    "SELECT doc_id FROM (SELECT doc_id, " + _QUALITY_ORACLE_EXPR + " AS q "
    "FROM (" + _QUALITY_ORACLE_INPUTS + ") a) b WHERE q > 0.5",
)(
    _dialect(
        "documents",
        "SELECT doc_id FROM (SELECT doc_id, QUALITY(text) AS q) WHERE q > 0.5",
    )
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


@register("x_budget_sample", _budget_oracle())
def x_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing: at most 10k tokens per split, selected
    in deterministic hash order — per-row membership verified exactly by
    the DuckDB oracle (integer cumsum, no float anywhere)."""
    from purescript_ifrit_spark.functions import text as X
    from purescript_ifrit_spark.operators.sampling import budget_sample, hash_split

    docs = load_table(spark, sf_dir, "documents")
    with_split = hash_split(docs, "doc_id").withColumn(
        "n_tok", X.token_count(F.col("text"))
    )
    kept = budget_sample(with_split, "doc_id", "n_tok", 10_000, group_col="split")
    return kept.select("doc_id", "split")


def _xd_split_oracle() -> str:
    # the dialect SPLIT twin, generated from the same registry expression
    from purescript_ifrit_spark.functions.dialect_ext import EXT_FUNCTIONS

    case = EXT_FUNCTIONS["SPLIT"].sql("doc_id")
    return f"SELECT doc_id, {case} AS split FROM documents"


register(
    "xd_quality_where",
    # same truth as xd_quality_filter, reached through the WHERE-operand
    # extension instead of the derived-table idiom
    "SELECT doc_id FROM (SELECT doc_id, " + _QUALITY_ORACLE_EXPR + " AS q "
    "FROM (" + _QUALITY_ORACLE_INPUTS + ") a) b WHERE q > 0.5",
)(
    _dialect("documents", "SELECT doc_id WHERE QUALITY(text) > 0.5")
)


register("xd_split", _xd_split_oracle())(
    # dialect-level dataset splitting over a NUMERIC id (exercises the
    # string-or-number arg typing of SPLIT)
    _dialect("documents", "SELECT doc_id, SPLIT(doc_id) AS split")
)


@register("x_dedup_minhash", None)  # approximate — rows-only check
def x_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.dedup import dedup_minhash

    docs = load_table(spark, sf_dir, "documents")
    # default geometry (16 lanes, b=8 r=2 since r4) — tracks the operator
    return dedup_minhash(
        docs, "doc_id", "text", jaccard_threshold=0.8
    ).select("doc_id")


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


@register(
    "x_dedup_minhash_planted",
    # ground truth recomputed by DuckDB: a planted variant is dropped iff its
    # exact shingle jaccard to its base doc is >= 0.8; cross-doc pairs are
    # jaccard 0 by construction (disjoint per-doc token namespaces)
    f"WITH base AS ({_PLANTED_TOKS}), "
    "pairs AS ("
    "  SELECT doc_id, doc_id + 1000000000000 AS vid, toks AS vtoks FROM base "
    "  WHERE doc_id % 10 = 0 "
    "  UNION ALL "
    "  SELECT doc_id, doc_id + 2000000000000 AS vid, toks[1:38] AS vtoks FROM base "
    "  WHERE doc_id % 10 = 5), "
    "j AS ("
    "  SELECT p.vid, "
    "  len(list_intersect("
    "    list_transform(range(1, len(b.toks) - 1), "
    "      i -> b.toks[i] || ' ' || b.toks[i+1] || ' ' || b.toks[i+2]), "
    "    list_transform(range(1, len(p.vtoks) - 1), "
    "      i -> p.vtoks[i] || ' ' || p.vtoks[i+1] || ' ' || p.vtoks[i+2]))) AS inter, "
    "  len(b.toks) - 2 AS na, len(p.vtoks) - 2 AS nb "
    "  FROM pairs p JOIN base b USING (doc_id)) "
    "SELECT doc_id FROM documents "
    "UNION ALL "
    "SELECT vid AS doc_id FROM j WHERE inter * 1.0 / (na + nb - inter) < 0.8",
)
def x_dedup_minhash_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.dedup import dedup_minhash

    planted = _planted_docs(spark, sf_dir)
    # default geometry (16 lanes, b=8 r=2 since r4): the exact-truth oracle
    # pins recall of the new curve — the 0.947-jaccard planted variants must
    # still be caught (per-pair candidate probability 1-(1-0.947²)⁸ ≈
    # 1 - 2.7e-11) and the sub-threshold ones must survive verification
    return dedup_minhash(
        planted, "doc_id", "text", jaccard_threshold=0.8
    ).select("doc_id")


@register(
    "x_dedup_incremental_planted",
    # incremental (index-probe) dedup ground truth: the corpus is the
    # planted base docs; the incoming batch holds their exact variants
    # (estimated jaccard = 1: identical shingles → identical signatures),
    # their 36/38-near variants (lane-match estimate ≈ 0.947 ≥ 0.5,
    # deterministic given the fixed lane seeds), and FRESH docs in a
    # disjoint 'f' token namespace (true jaccard 0; a false drop would
    # need a 64-bit band-hash collision). Survivors = exactly the fresh
    # docs — the oracle recomputes that set arithmetically.
    "SELECT doc_id + 3000000000000 AS doc_id FROM documents "
    "WHERE doc_id % 10 = 3",
)
def x_dedup_incremental_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.dedup import (
        build_minhash_index,
        dedup_against_index,
    )

    base, exact_var, near_var = _planted_pieces(spark, sf_dir)
    fresh_toks = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda k: F.concat(
            F.lit("f"), F.col("doc_id").cast("string"), F.lit("x"),
            k.cast("string"),
        ),
    )
    fresh = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 10 == 3)
        .select(
            (F.col("doc_id") + 3_000_000_000_000).alias("doc_id"),
            F.array_join(fresh_toks, " ").alias("text"),
        )
    )
    index = build_minhash_index(base, "doc_id", "text")
    batch = exact_var.unionAll(near_var).unionAll(fresh)
    return dedup_against_index(
        batch, index, "doc_id", "text", est_threshold=0.5
    ).select("doc_id")


@register(
    "x_dedup_simhash_planted",
    # identical normalized text → identical 64-bit simhash → hamming 0 and a
    # guaranteed shared bit-slice; distinct docs share no tokens, so a false
    # pair needs a full 64-bit signature collision (max_hamming=0). The
    # 38-token near-dup variants are EXCLUDED here: sharing 38/40 tokens
    # often flips zero simhash bits, which is correct simhash behavior but
    # not oracle-predictable — the minhash entry covers the near-dup tier
    "SELECT doc_id AS id_a, doc_id + 1000000000000 AS id_b, "
    "CAST(0 AS BIGINT) AS hamming FROM documents WHERE doc_id % 10 = 0",
)
def x_dedup_simhash_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.dedup import simhash_candidate_pairs

    planted = _planted_docs(spark, sf_dir).filter(F.col("doc_id") < 2_000_000_000_000)
    out = simhash_candidate_pairs(planted, "doc_id", "text", max_hamming=0)
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


@register(
    "x_dedup_ngram_planted",
    # exact word-3-gram Jaccard is fully oracle-predictable on the planted
    # corpus: an exact variant normalizes to its base text (jaccard 1.0);
    # a near variant is the 38-token prefix of its 40-token base, so its 36
    # 3-shingles are a strict subset of the base's 38 → 36/38. Blocks pair
    # each variant with exactly its base (disjoint token namespaces make
    # cross-doc jaccard 0 anyway), demonstrating the blocked scale path —
    # the same shape the operator runs downstream of LSH banding.
    "SELECT doc_id AS id_a, doc_id + 1000000000000 AS id_b, "
    "CAST(1.0 AS DOUBLE) AS jaccard FROM documents WHERE doc_id % 10 = 0 "
    "UNION ALL "
    "SELECT doc_id, doc_id + 2000000000000, "
    "CAST(ROUND(36.0 / 38.0, 6) AS DOUBLE) FROM documents WHERE doc_id % 10 = 5",
)
def x_dedup_ngram_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.dedup import ngram_jaccard_pairs

    planted = _planted_docs(spark, sf_dir).withColumn(
        "blk", F.col("doc_id") % 1_000_000_000_000
    )
    out = ngram_jaccard_pairs(
        planted, "doc_id", "text", n=3, threshold=0.5, block_col="blk"
    )
    return out.withColumn("jaccard", F.round("jaccard", 6))


@register("x_dedup_simhash_pairs", None)  # approximate — rows-only check
def x_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.dedup import simhash_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    return simhash_candidate_pairs(docs, "doc_id", "text", max_hamming=10)


@register(
    "x_ann_cosine_topk",
    # order by the UNROUNDED similarity (as the engine does) and round only
    # the projected value — ordering by the rounded alias would select a
    # different k-th row whenever two sims collide at 5 decimals
    "SELECT vec_id, ROUND(s, 5) AS sim FROM ("
    "SELECT vec_id, list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
    "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS s "
    "FROM embeddings ORDER BY s DESC, vec_id ASC LIMIT 10) t",
)
def x_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    out = cosine_topk(emb, "vec_id", "embedding", query, k=10)
    return out.withColumn("sim", F.round("sim", 5))


@register("x_ann_lsh_topk", None)  # approximate — rows-only check
def x_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.similarity import (
        lsh_topk,
        make_hyperplanes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    planes = make_hyperplanes(dim=len(query), n_planes=8, seed=42)
    out = lsh_topk(emb, "vec_id", "embedding", query, planes, k=10, probe_hamming=1)
    return out.withColumn("sim", F.round("sim", 5))


@register("x_ann_ivf_topk", None)  # approximate (nprobe cells) — rows-only
def x_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index path end-to-end: seeded centroid build (bounded
    driver-side sample), JVM-side cell assignment, nprobe-cell probe +
    exact cosine rerank. Deterministic (fixed seed + hash-ordered sample)
    but approximate vs brute force, so rows-only like the LSH twin;
    pytest pins recall against the brute-force oracle."""
    from purescript_ifrit_spark.operators.similarity import (
        ivf_centroids,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    cents = ivf_centroids(emb, "embedding", nlist=16, seed=42, sample=2048)
    out = ivf_topk(emb, "vec_id", "embedding", query, cents, k=10, nprobe=4)
    return out.withColumn("sim", F.round("sim", 5))


@register(
    "x_events_hourly",
    # timezone-free hour bucketing (pure epoch arithmetic on both sides):
    # date_trunc would truncate in the Spark session's LOCAL timezone,
    # breaking parity on any non-UTC driver host
    "SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT) AS hour_us, "
    "event_type, COUNT(*) AS n, "
    # decimal sum: exact + order-independent (see x_sessionize note)
    "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value "
    "FROM events GROUP BY 1, 2",
)
def x_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hour_us = (
        F.floor(F.unix_micros(F.col("ts")) / 3_600_000_000) * 3_600_000_000
    ).cast("long")
    return ev.groupBy(hour_us.alias("hour_us"), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


@register(
    "x_sessionize",
    # sum_value sums in DECIMAL(18,6): the r1 hash flake was ROUND(SUM(double))
    # landing on a half-boundary under a different partial-sum order — decimal
    # addition is exact and order-independent, so both engines agree bit-for-bit.
    # Headroom bound for every decimal-sum entry in this file: the final
    # DECIMAL→DOUBLE cast is exact-agreement only while a group's scaled
    # integer sum stays under 2^53 (≈9.0e15); the largest group at sf0.1 is
    # join_star's biggest region at 7.56e15 (measured r4; q1ish 5.3e15), so
    # driver SFs (0.01 correctness / 0.1 bench) are safe, but at sf≥0.2
    # engines could disagree in the last ulp — coarsen with ROUND on both
    # sides if these entries are ever run at larger scale factors. Pinned by
    # tests/test_oracle_parity.py::test_decimal_sum_headroom_under_2_53
    # (hard <2^53 at any SF, 10× margin at driver SFs).
    "WITH s AS (SELECT user_id, event_id, ts, value, "
    "  CASE WHEN lag(ts) OVER w IS NULL "
    "       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 "
    "  THEN 1 ELSE 0 END AS new_s FROM events "
    "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    # CAST AS BIGINT: DuckDB types SUM(int) as HUGEINT (int128), which fails
    # the driver's type-sensitive value hash even when every value matches
    # (the r1+r3 x_sessionize hash fails were exactly this, per VERDICT r3)
    "t AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, "
    "  event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM s) "
    "SELECT user_id, session_id, COUNT(*) AS n_events, "
    "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value, "
    "CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us "
    "FROM t GROUP BY user_id, session_id",
)
def x_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.windows import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", 30)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
    )


@register(
    "x_join_star",
    "SELECT r_name, COUNT(*) AS n, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total "
    "FROM orders JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name",
)
def x_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.joins import orders_enriched

    joined = orders_enriched(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )
    return joined.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("total"),
    )


@register(
    "x_multimodal_features",
    "SELECT doc_id AS media_id, "
    "CAST(octet_length(encode(text)) AS BIGINT) AS byte_len, "
    "md5(text) AS digest FROM documents",
)
def x_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.multimodal import (
        documents_as_media,
        extract_features,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select("media_id", "byte_len", F.col("md5").alias("digest"))


@register(
    "x_multimodal_framesample",
    # every-10th frame index from the fake per-item frame count
    # (byte_len % 300 + 1): pure metadata arithmetic, so DuckDB recomputes
    # the exploded plan exactly. range() is stop-exclusive ≡ Spark's
    # inclusive sequence(0, nf-1, 10)
    "SELECT media_id, CAST(unnest(range(0, nf, 10)) AS BIGINT) AS frame_idx "
    "FROM (SELECT doc_id AS media_id, "
    "(octet_length(encode(text)) % 300 + 1) AS nf FROM documents) t",
)
def x_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan through the REAL multimodal plumbing: utf-8
    payloads → Arrow-batched mapInPandas feature extraction (byte_len) →
    metadata-only explode. Verifies the mapInPandas output feeds JVM-side
    explode-planning correctly, with an exact oracle."""
    from purescript_ifrit_spark.operators.multimodal import (
        documents_as_media,
        extract_features,
        frame_sample_plan,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return frame_sample_plan(feats, every_n=10).select(
        "media_id", F.col("frame_idx").cast("long").alias("frame_idx")
    )


@register(
    "x_multimodal_decode",
    # planted-truth for the REAL netpbm decode path: payloads are generated
    # from the closed form (w = 4 + id%8, h = 3 + id%5, byte k =
    # (id*7 + k) % 256, RGB-interleaved), so the oracle recomputes the
    # decoded dims + channel sums/means arithmetically WITHOUT decoding —
    # the Spark side must parse the actual P6 header + raster to agree.
    # Means are raw IEEE divisions of exact integer sums (bit-identical
    # cross-engine; no ROUND needed). SUMs cast to BIGINT (HUGEINT guard).
    "WITH d AS (SELECT doc_id, 4 + doc_id % 8 AS w, 3 + doc_id % 5 AS h "
    "FROM documents), "
    "px AS (SELECT doc_id, w, h, k % 3 AS c, "
    "CAST((doc_id * 7 + k) % 256 AS BIGINT) AS v "
    "FROM d, unnest(range(0, 3 * w * h)) AS t(k)) "
    "SELECT doc_id AS media_id, CAST(MAX(w) AS INT) AS width, "
    "CAST(MAX(h) AS INT) AS height, CAST(3 AS INT) AS channels, "
    "CAST(SUM(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_r, "
    "CAST(SUM(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_g, "
    "CAST(SUM(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_b, "
    "CAST(SUM(CASE WHEN c = 0 THEN v END) AS DOUBLE) / (MAX(w) * MAX(h)) AS mean_r, "
    "CAST(SUM(CASE WHEN c = 1 THEN v END) AS DOUBLE) / (MAX(w) * MAX(h)) AS mean_g, "
    "CAST(SUM(CASE WHEN c = 2 THEN v END) AS DOUBLE) / (MAX(w) * MAX(h)) AS mean_b "
    "FROM px GROUP BY doc_id",
)
def x_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavior-verified image decode (VERDICT r3 item 7): synth_ppm_media
    writes genuine binary P6 payloads; extract_pixel_stats must parse the
    header and raster on worker processes to reproduce the closed form."""
    from purescript_ifrit_spark.operators.multimodal import (
        extract_pixel_stats,
        synth_ppm_media,
    )

    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    return extract_pixel_stats(synth_ppm_media(ids))


@register(
    "x_funnel",
    # ordered funnel view→click→purchase. The oracle uses the chained-min
    # formulation (t_i = min ts of step i at ts >= t_{i-1}); the operator
    # walks a per-user (ts, step_idx)-sorted array — equivalent because
    # equal-ts events sort by step index, which IS the >= tie rule
    "WITH s0 AS (SELECT user_id, MIN(ts) AS t0 FROM events "
    "  WHERE event_type = 'view' GROUP BY user_id), "
    "s1 AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e "
    "  JOIN s0 USING (user_id) "
    "  WHERE e.event_type = 'click' AND e.ts >= s0.t0 GROUP BY e.user_id), "
    "s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e "
    "  JOIN s1 USING (user_id) "
    "  WHERE e.event_type = 'purchase' AND e.ts >= s1.t1 GROUP BY e.user_id) "
    "SELECT CAST(0 AS INT) AS step_idx, 'view' AS step, "
    "CAST((SELECT COUNT(*) FROM s0) AS BIGINT) AS n_users "
    "UNION ALL SELECT CAST(1 AS INT), 'click', "
    "CAST((SELECT COUNT(*) FROM s1) AS BIGINT) "
    "UNION ALL SELECT CAST(2 AS INT), 'purchase', "
    "CAST((SELECT COUNT(*) FROM s2) AS BIGINT)",
)
def x_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.funnels import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(ev, "user_id", "ts", "event_type",
                         ["view", "click", "purchase"])


@register(
    "x_retention",
    # daily retention triangle: cohort = first active day, k = days since;
    # exact integer day buckets (tz-free epoch arithmetic, same rule as
    # x_events_hourly)
    "WITH a AS (SELECT DISTINCT user_id, "
    "  CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS p FROM events), "
    "f AS (SELECT user_id, MIN(p) AS cohort FROM a GROUP BY user_id) "
    "SELECT cohort, p - cohort AS k, CAST(COUNT(*) AS BIGINT) AS n_users "
    "FROM a JOIN f USING (user_id) GROUP BY cohort, k",
)
def x_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.funnels import retention_cohorts

    ev = load_table(spark, sf_dir, "events")
    return retention_cohorts(ev, "user_id", "ts")


@register(
    "x_multimodal_audio",
    # planted-truth for the REAL RIFF/PCM16 decode path: payloads follow
    # the closed form (rate = 8000 + (id%2)*8000, n = 50 + id%100, sample
    # k = (id*11 + k*7) % 65536 - 32768), so the oracle recomputes the
    # decoded waveform stats arithmetically; the Spark side must walk the
    # actual RIFF chunks and parse little-endian int16 samples to agree.
    # rms = sqrt(exact integer sum of squares / n): one IEEE division +
    # IEEE sqrt — bit-identical cross-engine. Integer SUMs cast to BIGINT.
    "WITH d AS (SELECT doc_id, 8000 + (doc_id % 2) * 8000 AS rate, "
    "50 + doc_id % 100 AS n FROM documents), "
    "s AS (SELECT doc_id, rate, n, "
    "CAST((doc_id * 11 + k * 7) % 65536 - 32768 AS BIGINT) AS v "
    "FROM d, unnest(range(0, n)) AS t(k)) "
    "SELECT doc_id AS media_id, CAST(MAX(rate) AS INT) AS sample_rate, "
    "CAST(1 AS INT) AS channels, CAST(COUNT(*) AS BIGINT) AS n_samples, "
    "CAST((MAX(n) * 1000000) // MAX(rate) AS BIGINT) AS duration_us, "
    "CAST(SUM(v) AS BIGINT) AS sum_samples, "
    "CAST(MAX(ABS(v)) AS INT) AS peak, "
    "sqrt(CAST(SUM(v * v) AS DOUBLE) / COUNT(*)) AS rms "
    "FROM s GROUP BY doc_id",
)
def x_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavior-verified audio decode: synth_wav_media writes genuine RIFF
    PCM16 payloads; extract_audio_stats must parse chunk structure and
    samples on worker processes to reproduce the closed form."""
    from purescript_ifrit_spark.operators.multimodal import (
        extract_audio_stats,
        synth_wav_media,
    )

    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    return extract_audio_stats(synth_wav_media(ids))


@register(
    "x_json_extract",
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k "
    "FROM events",
)
def x_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
    )


@register(
    "x_embedding_neardup",
    # CAST to DOUBLE[]: DuckDB's list_cosine_similarity computes FLOAT[] in
    # float32, which diverges from Spark's double math at the 5th decimal
    "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
    "ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])), 5) AS sim "
    "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
    "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])) >= 0.4",
)
def x_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.similarity import embedding_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    # exact all-pairs mode, opted in: this entry IS the evaluation baseline
    # the oracle recomputes; the scale path (planes=...) is exercised in tests
    out = embedding_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, allow_crossjoin=True
    )
    return out.withColumn("sim", F.round("sim", 5))


@register(
    "x_tpch_q1ish",
    # decimal sums (exact, order-independent — see x_sessionize note); the
    # product term is computed in IEEE double identically on both engines
    # BEFORE the decimal cast, so the cast rounds the same value
    "SELECT l_returnflag, l_linestatus, "
    "CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base, "
    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc, "
    "CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty, "
    "COUNT(*) AS n "
    "FROM lineitem GROUP BY l_returnflag, l_linestatus",
)
def x_tpch_q1ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.sum(c.cast("decimal(18,6)")).cast("double")  # noqa: E731
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec(F.col("l_quantity")).alias("sum_qty"),
        dec(F.col("l_extendedprice")).alias("sum_base"),
        dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc"),
        (dec(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "x_tpch_q3ish",
    "SELECT l_orderkey, "
    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE c_mktsegment = 'BUILDING' GROUP BY l_orderkey",
)
def x_tpch_q3ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(
                orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "x_tpch_q5ish",
    "SELECT n_name, "
    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue "
    "FROM region JOIN nation ON r_regionkey = n_regionkey "
    "JOIN customer ON n_nationkey = c_nationkey "
    "JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE r_name = 'ASIA' GROUP BY n_name",
)
def x_tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        cust.join(
            F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
            cust.c_nationkey == nation.n_nationkey,
        )
    )
    return (
        li.join(F.broadcast(orders.join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "x_tpch_q18ish",
    # large-volume customers: the fact-fact shape (lineitem agg joined back
    # to orders) the star entries don't exercise. Decimal qty sum for
    # order-independent exactness; top-k ordered by raw o_totalprice with a
    # unique tie-break
    "SELECT c_custkey, o_orderkey, o_totalprice, "
    "CAST(q AS DOUBLE) AS sum_qty FROM ("
    "  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS q "
    "  FROM lineitem GROUP BY l_orderkey "
    "  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250) t "
    "JOIN orders ON o_orderkey = l_orderkey "
    "JOIN customer ON c_custkey = o_custkey "
    "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100",
)
def x_tpch_q18ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: per-order quantity aggregation (one fact shuffle,
    map-side partials), HAVING filter BEFORE the join back to orders (the
    filtered agg is small → AQE broadcasts it, so the orders fact never
    sort-merges), broadcast customer dim, TakeOrdered top-k."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"))
        .filter(F.col("q") > 250)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_totalprice",
            F.col("q").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "x_topk_per_group",
    "SELECT o_orderpriority, o_orderkey, o_totalprice FROM ("
    "  SELECT o_orderpriority, o_orderkey, o_totalprice, "
    "  row_number() OVER (PARTITION BY o_orderpriority "
    "    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk FROM orders) t "
    "WHERE rk <= 3",
)
def x_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.windows import topk_per_group

    orders = load_table(spark, sf_dir, "orders")
    return topk_per_group(
        orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        "o_orderpriority", "o_totalprice", 3, "o_orderkey",
    )


@register(
    "x_percentiles",
    "SELECT l_returnflag AS _id, "
    "ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50, "
    "ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90 "
    "FROM lineitem GROUP BY l_returnflag",
)
def x_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact percentile (SQL `percentile`, interpolating like quantile_cont)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("_id")).agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90"),
    )


@register(
    "x_distinct_count",
    "SELECT l_returnflag AS _id, COUNT(DISTINCT l_partkey) AS n_parts, "
    "COUNT(DISTINCT l_suppkey) AS n_supps FROM lineitem GROUP BY l_returnflag",
)
def x_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("_id")).agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register(
    "x_dau_exact",
    # tz-free epoch-day bucketing (same rule as x_events_hourly); COUNT
    # DISTINCT is BIGINT in DuckDB, matching Spark's long cast
    "SELECT CAST(floor(epoch_us(ts) / 86400000000) * 86400000000 AS BIGINT) "
    "AS window_us, event_type, COUNT(DISTINCT user_id) AS n_users "
    "FROM events GROUP BY 1, 2",
)
def x_dau_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users per event type (exact twin). See
    operators/windows.distinct_users_windowed for the scale contract."""
    from purescript_ifrit_spark.operators.windows import (
        distinct_users_windowed,
    )

    ev = load_table(spark, sf_dir, "events")
    return distinct_users_windowed(ev)


@register("x_dau_approx", None)  # HLL sketch — engines differ; rows-only
def x_dau_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users per event type via HyperLogLog++ — the 100 TB
    path (constant-size mergeable sketches instead of a distinct-triple
    shuffle). Accuracy vs the exact twin is pinned in pytest (rsd
    envelope), not vs DuckDB (different sketch)."""
    from purescript_ifrit_spark.operators.windows import (
        distinct_users_windowed,
    )

    ev = load_table(spark, sf_dir, "events")
    return distinct_users_windowed(ev, approx=True, rsd=0.02)


@register("x_approx_distinct", None)  # sketch-based — engines differ; rows-only
def x_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the scale path for cardinality on
    100 TB (exact distinct shuffles all values; HLL is one pass, mergeable
    partials). Accuracy vs exact is pinned in tests, not vs DuckDB (different
    sketches)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("_id")).agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )


@register(
    "x_chunk_documents",
    # chunk=64, overlap=8 → stride=56; DuckDB list slice is 1-based inclusive
    "WITH t AS (SELECT doc_id, "
    f"string_split({_NORM_SQL}, ' ') AS toks FROM documents), "
    "c AS (SELECT doc_id, toks, UNNEST(range(1 + CAST(ceil(greatest(len(toks) - 64, 0) / 56.0) AS BIGINT))) AS i FROM t) "
    "SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, "
    "array_to_string(toks[CAST(i*56+1 AS INT):CAST(i*56+64 AS INT)], ' ') AS chunk_text, "
    "CAST(len(toks[CAST(i*56+1 AS INT):CAST(i*56+64 AS INT)]) AS BIGINT) AS chunk_tokens "
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
    "CAST(len(toks[CAST(i*56+1 AS INT):CAST(i*56+64 AS INT)]) AS BIGINT) AS chunk_tokens FROM c) "
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


@register(
    "x_streaming_windowed",
    # batch-equivalent truth for the availableNow streaming run: tz-free
    # epoch hour buckets (F.window aligns to the epoch in micros, so
    # unix_micros(window.start) is pure epoch arithmetic on both sides);
    # decimal sum as everywhere (see x_sessionize note)
    "SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT) AS hour_us, "
    "event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value "
    "FROM events GROUP BY 1, 2",
)
def x_streaming_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming surface, driver-verified: stage the events table
    as micros-ts parquet files, replay them through a file-source stream
    with an availableNow trigger into a windowed aggregation, and return
    the final (complete-mode) memory-sink table. Bounded backlog → the
    query terminates; the result must equal the batch aggregation exactly.
    """
    import shutil
    import tempfile
    import uuid

    from purescript_ifrit_spark.streaming.pipeline import read_event_stream

    staged = tempfile.mkdtemp(prefix="ifrit_stream_events_")
    # repartition(4): several files so availableNow exercises multi-batch
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(staged)

    stream = read_event_stream(spark, staged, max_files_per_trigger=2)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    name = f"x_streaming_windowed_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")  # bounded replay: full table at the end
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the complete-mode memory sink holds the aggregated rows in driver
    # memory — the staged source files are dead weight once the bounded
    # replay terminates (without this, every suite run leaks a full parquet
    # copy of the events table in /tmp)
    shutil.rmtree(staged, ignore_errors=True)
    return spark.table(name).select(
        F.unix_micros(F.col("w.start")).alias("hour_us"),
        "event_type",
        "n",
        "sum_value",
    )


@register(
    "x_streaming_session",
    # gap-sessionization truth: session_window merges an event into the
    # previous session iff its ts lies STRICTLY inside [prev_ts, prev_ts +
    # gap) — so a gap of exactly 30 min starts a NEW session (>= below;
    # the batch x_sessionize dialect uses > by its own contract)
    "WITH s AS (SELECT user_id, ts, value, event_id, "
    "CASE WHEN lag(ts) OVER w IS NULL "
    "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 "
    "THEN 1 ELSE 0 END AS new_s FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "g AS (SELECT user_id, ts, value, SUM(new_s) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) "
    "AS sid FROM s) "
    "SELECT user_id, CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us, "
    "CAST(epoch_us(MAX(ts)) + 1800000000 AS BIGINT) AS session_end_us, "
    "COUNT(*) AS n_events, "
    "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value "
    "FROM g GROUP BY user_id, sid",
)
def x_streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming gap-sessionization (session_window) driver-verified: the
    events table replayed through a multi-batch availableNow stream must
    produce exactly the sessions the oracle computes with lag/cumsum —
    including sessions MERGED across micro-batch boundaries by the
    session-window state store."""
    import shutil
    import tempfile
    import uuid

    from purescript_ifrit_spark.streaming.pipeline import read_event_stream

    staged = tempfile.mkdtemp(prefix="ifrit_stream_sess_")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(staged)

    stream = read_event_stream(spark, staged, max_files_per_trigger=2)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("sw"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    name = f"x_streaming_session_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(staged, ignore_errors=True)
    return spark.table(name).select(
        "user_id",
        F.unix_micros(F.col("sw.start")).alias("session_start_us"),
        F.unix_micros(F.col("sw.end")).alias("session_end_us"),
        "n_events",
        "sum_value",
    )


@register(
    "x_dedup_clusters_planted",
    # ground truth by construction: per anchor (doc_id % 20 == 0) a CHAIN of
    # 6 sliding-window variants (adjacent shingle-jaccard 36/38 ≈ 0.947 —
    # far above the 0.8 threshold; chain ENDS at ≈ 0.73 — below it, so only
    # transitive closure groups them) plus one isolated variant (window 20
    # tokens away, max jaccard ≈ 0.31 to anything — must SURVIVE). Expected
    # survivors: every base doc (the component minimum) + every isolated
    # variant. Over-dropping kills an isolated row; missing transitivity
    # leaves a chain variant alive — either way the set mismatches.
    "SELECT doc_id FROM documents "
    "UNION ALL SELECT doc_id + 7000000000000 AS doc_id FROM documents "
    "WHERE doc_id % 20 = 0",
)
def x_dedup_clusters_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components cluster dedup with exact planted ground truth
    (minhash pairs → large-star/small-star CC → keep component minimum)."""
    from functools import reduce

    from purescript_ifrit_spark.operators.dedup import (
        dedup_clusters,
        minhash_candidate_pairs,
    )

    ids = load_table(spark, sf_dir, "documents").select("doc_id")

    def txt(w0: int):
        toks = F.transform(
            F.sequence(F.lit(w0), F.lit(w0 + 39)),
            lambda k: F.concat(
                F.lit("t"), F.col("doc_id").cast("string"), F.lit("x"),
                k.cast("string"),
            ),
        )
        return F.array_join(toks, " ")

    base = ids.select("doc_id", txt(0).alias("text"))
    anchors = ids.filter(F.col("doc_id") % 20 == 0)
    parts = [base]
    # text is computed BEFORE the id shift: the token lambda resolves
    # doc_id, and aliasing first would shift the namespace too
    for k in range(1, 7):
        parts.append(
            anchors.select("doc_id", txt(k).alias("text")).select(
                (F.col("doc_id") + k * 1_000_000_000_000).alias("doc_id"), "text"
            )
        )
    parts.append(
        anchors.select("doc_id", txt(20).alias("text")).select(
            (F.col("doc_id") + 7_000_000_000_000).alias("doc_id"), "text"
        )
    )
    corpus = reduce(lambda a, b: a.unionAll(b), parts)
    pairs = minhash_candidate_pairs(
        corpus, "doc_id", "text", jaccard_threshold=0.8, eager=True
    )
    return dedup_clusters(corpus, "doc_id", pairs).select("doc_id")


@register(
    "x_streaming_state",
    # the custom stateful operator's FINAL per-user counter must equal the
    # batch count. Counts only: integer state is summation-order-exact,
    # while a float running total would inherit per-batch pandas sum order
    "SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id",
)
def x_streaming_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState surface, driver-verified: replay the events
    backlog through the running-totals stateful operator (update mode,
    multi-batch) and reduce each user's update stream to its final counter
    (max — the counter is monotone), which must equal the batch count."""
    import shutil
    import tempfile
    import uuid

    from purescript_ifrit_spark.streaming.pipeline import (
        read_event_stream,
        running_user_totals,
    )

    staged = tempfile.mkdtemp(prefix="ifrit_stream_state_")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(staged)

    stream = read_event_stream(spark, staged, max_files_per_trigger=2)
    updates = running_user_totals(stream)
    name = f"x_streaming_state_{uuid.uuid4().hex[:12]}"
    q = (
        updates.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(staged, ignore_errors=True)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )


@register("x_dedup_clusters", None)  # approximate candidates — rows-only
def x_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level dedup: minhash pairs → connected components → keep the
    canonical (min-id) member per component."""
    from purescript_ifrit_spark.operators.dedup import (
        dedup_clusters,
        minhash_candidate_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", jaccard_threshold=0.8, eager=True
    )
    return dedup_clusters(docs, "doc_id", pairs).select("doc_id")


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
    "x_partitioned_sink",
    # the sink path gets hard signal too: what goes through a hive-style
    # partitioned parquet write and a partition-pruned read-back must equal
    # the source rows exactly
    "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'",
)
def x_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned write → pruned read-back round-trip (sources.write with
    partition_by; the reader hits only the lang=en directory — the unit of
    partition pruning at rest). The read-back is localCheckpoint-ed so the
    temp directory can be removed before returning (no /tmp leak per run);
    the pruning plan itself is pinned in test_sources.py."""
    import shutil
    import tempfile

    from purescript_ifrit_spark.sources.tables import write

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    out_dir = tempfile.mkdtemp(prefix="ifrit_sink_")
    try:
        write(docs, out_dir, mode="overwrite", partition_by=["lang"])
        return (
            spark.read.parquet(out_dir)
            .filter(F.col("lang") == "en")
            .select("doc_id", "lang", "n_chars")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


register(
    "x_set_ops",
    # users who clicked AND purchased, minus users who errored — the
    # INTERSECT/EXCEPT composition over distinct key sets
    "SELECT user_id FROM events WHERE event_type = 'click' "
    "INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase' "
    "EXCEPT SELECT user_id FROM events WHERE event_type = 'error'",
)(
    lambda spark, sf_dir: (
        lambda ev: ev.filter(F.col("event_type") == "click")
        .select("user_id")
        .intersect(
            ev.filter(F.col("event_type") == "purchase").select("user_id")
        )
        .exceptAll(
            ev.filter(F.col("event_type") == "error").select("user_id").distinct()
        )
    )(load_table(spark, sf_dir, "events"))
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


@register("x_curate_exact", _curate_exact_oracle())
def x_curate_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline's exact prefix as hard signal: quality gate →
    exact dedup → token stats, every stage oracle-recomputable (the full
    composition x_curate_pipeline adds LSH and stays rows-only)."""
    from purescript_ifrit_spark.operators import dedup
    from purescript_ifrit_spark.operators.text_analysis import (
        fingerprint_docs,
        quality_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_score(docs, "text")
    kept = scored.filter(
        (F.col("quality") >= 0.2) & (F.col("n_tokens") >= 5)
    )
    # fingerprint once, dedup on the carried column (dedup_exact_text
    # would compute the same md5 internally and drop it)
    with_fp = fingerprint_docs(kept, "text")
    exact = dedup.dedup_exact(with_fp, ["fingerprint"], "doc_id")
    return exact.select(
        "doc_id",
        "quality",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "fingerprint",
    )


@register("x_curate_pipeline", None)  # composition incl. approximate dedup — rows-only
def x_curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.pipeline import curate

    docs = load_table(spark, sf_dir, "documents")
    return curate(docs, min_quality=0.2).select(
        "doc_id", "quality", "n_tokens", "n_bpe_ish", "fingerprint"
    )


def _split_oracle() -> str:
    # the oracle CASE is generated by the operator's own SQL twin, so the
    # cutpoints can never drift between engine and oracle
    from purescript_ifrit_spark.operators.sampling import hash_split_sql

    case = hash_split_sql("doc_id", (("train", 0.98), ("val", 0.01), ("test", 0.01)))
    return f"SELECT doc_id, {case} AS split FROM documents"


@register("x_split_train_val", _split_oracle())
def x_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-draw train/val/test split, verified per-row: the
    assignment is a pure function of (id, salt), so DuckDB recomputes the
    exact split column — the strongest signal the split is reproducible."""
    from purescript_ifrit_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(docs, "doc_id").select("doc_id", "split")


def _sample_oracle() -> str:
    from purescript_ifrit_spark.operators.sampling import _hex_cut

    return (
        "SELECT doc_id FROM documents "
        f"WHERE substr(md5(doc_id || ':v1'), 1, 8) < '{_hex_cut(0.1)}'"
    )


@register("x_hash_sample", _sample_oracle())
def x_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% subsample (stable across reruns/repartitions,
    unlike DataFrame.sample) — exact-membership verified by the oracle."""
    from purescript_ifrit_spark.operators.sampling import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.1).select("doc_id")


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


def _redact_dialect_oracle() -> str:
    # staged regexp_replace over the SAME planted-PII text as x_pii_redact
    # (minus boilerplate — REDACT is the redaction chain only)
    from purescript_ifrit_spark.operators.text_cleaning import PII_PATTERNS

    aug = _pii_aug_sql(with_boilerplate=False)
    expr = "x"
    for _, rx, tok in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{rx}', '{tok}', 'g')"
    return f"SELECT doc_id, md5({expr}) AS fp FROM ({aug}) t"


@register("xd_redact", _redact_dialect_oracle())
def xd_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction reached through the DIALECT (`REDACT(x)`): the full
    compiler path (lexer → parser → analyzer → planner), verified
    byte-exact on planted PII."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id", _pii_aug_col(with_boilerplate=False).alias("x")
    )
    out = run_query(spark, aug, "SELECT doc_id, REDACT(x) AS clean")
    return out.select("doc_id", F.md5("clean").alias("fp"))


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
    "x_embedding_centroids",
    # per-label mean embedding, component-wise; floor-quantized integer
    # sums (grid 2^20) are order-independent AND tie-free, so the division
    # below is bit-identical across engines
    "SELECT label, i - 1 AS dim, "
    "CAST(SUM(CAST(floor(CAST(list_extract(embedding, i) AS DOUBLE) "
    "* 1048576) AS BIGINT)) AS DOUBLE) / (COUNT(*) * 1048576.0) AS centroid "
    "FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2",
)
def x_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (operators/similarity.label_centroids,
    exact_grid mode): distributed class prototypes — posexplode partials
    collapse map-side; one index-sized shuffle."""
    from purescript_ifrit_spark.operators.similarity import label_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    return label_centroids(emb, "label", "embedding", exact_grid=2**20)


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


register(
    "x_pivot_events",
    # per-user event-type counts, pivoted wide — exact integer cells.
    # CAST AS BIGINT: DuckDB types SUM(int) as HUGEINT (int128), which fails
    # the driver's type-sensitive value hash even when every value matches
    "SELECT user_id, "
    "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click, "
    "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error, "
    "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase, "
    "CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup, "
    "CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view "
    "FROM events GROUP BY user_id",
)(
    lambda spark, sf_dir: load_table(spark, sf_dir, "events")
    .groupBy("user_id")
    .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
    .count()
    .select(
        "user_id",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in ("click", "error", "purchase", "signup", "view")
        ],
    )
)

@register(
    "x_running_total",
    # per-user running value total in event-time order — decimal cumsum
    # (exact, order-independent partials) surfaced as double
    "SELECT event_id, user_id, "
    "CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value "
    "FROM events",
)
def x_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based window analytics: per-user running total, one shuffle
    on user_id then a linear in-partition pass."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )

register(
    "x_anti_join",
    # customers with no F-status order — the anti-join shape
    "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
    "AND o.o_orderstatus = 'F')",
)(
    lambda spark, sf_dir: load_table(spark, sf_dir, "customer")
    .join(
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey")),
        ["c_custkey"],
        "left_anti",
    )
    .select("c_custkey", "c_name")
)


@register(
    "x_stratified_fixed_k",
    # exactly 30 docs per language, picked in md5-draw order — per-row
    # membership recomputed by the same window in DuckDB
    "SELECT doc_id, lang FROM ("
    "SELECT doc_id, lang, row_number() OVER (PARTITION BY lang "
    "ORDER BY substr(md5(doc_id || ':v1'), 1, 8), doc_id) AS rk "
    "FROM documents) t WHERE rk <= 30",
)
def x_stratified_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-count per-stratum sampling (sampling.stratified_fixed_k):
    exactly 30 per language in deterministic draw order."""
    from purescript_ifrit_spark.operators.sampling import stratified_fixed_k

    docs = load_table(spark, sf_dir, "documents")
    return stratified_fixed_k(docs, "doc_id", "lang", 30).select(
        "doc_id", "lang"
    )


register(
    "x_semi_join",
    # customers WITH at least one high-value order — the semi-join shape
    # (no row multiplication, no payload from the right side)
    "SELECT c_custkey, c_name FROM customer c WHERE EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
    "AND o.o_totalprice > 400000)",
)(
    lambda spark, sf_dir: load_table(spark, sf_dir, "customer")
    .join(
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey")),
        ["c_custkey"],
        "left_semi",
    )
    .select("c_custkey", "c_name")
)


@register(
    "x_equidepth_buckets",
    # equi-depth decile assignment WITHIN each order priority —
    # deterministic via the (o_totalprice, o_orderkey) total order. The
    # window is partitioned (one shuffle on the group key), never the
    # global single-partition ntile, which is the same scale-killer as an
    # unpartitioned sort
    "SELECT o_orderkey, o_orderpriority, CAST(ntile(10) OVER "
    "(PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) "
    "AS INT) AS decile FROM orders",
)
def x_equidepth_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group equi-depth bucketing (ntile) — the binning primitive,
    partitioned so it scales like any grouped window."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey", "o_orderpriority", F.ntile(10).over(w).alias("decile")
    )


def _stratified_oracle() -> str:
    from purescript_ifrit_spark.operators.sampling import stratified_sample_sql

    pred = stratified_sample_sql(
        "doc_id", "lang", {"en": 0.5, "de": 0.25, "fr": 0.1}, 0.02
    )
    return f"SELECT doc_id, lang FROM documents WHERE {pred}"


@register("x_stratified_sample", _stratified_oracle())
def x_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling (corpus rebalancing) —
    per-row membership verified exactly by the oracle (the predicate SQL is
    generated by the operator's own twin)."""
    from purescript_ifrit_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "de": 0.25, "fr": 0.1}, 0.02
    )
    return kept.select("doc_id", "lang")


# ---------------------------------------------------------------------------
# temporal extensions (operators/temporal.py): as-of join, range join,
# multi-grain rollup — oracle-paired (DuckDB has ASOF JOIN + inequality
# joins natively, so these approximate-free operators get hard signal)
# ---------------------------------------------------------------------------


@register(
    "x_asof_join",
    # each non-purchase event picks up the latest purchase of the same user
    # at-or-before it; right side deduped per (user, ts) identically on both
    # engines so ties cannot flip the hash
    "WITH r AS (SELECT user_id, ts, max(event_id) AS anchor_id, "
    "arg_max(value, event_id) AS anchor_value "
    "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2) "
    # unmatched lefts keep sentinel values (not NULL) so the cross-engine
    # value comparison never sorts NULL against numbers
    "SELECT e.event_id, epoch_us(e.ts) AS ts_us, "
    "coalesce(r.anchor_id, -1) AS anchor_id, "
    "coalesce(r.anchor_value, 0.0) AS anchor_value, "
    "coalesce(epoch_us(e.ts) - epoch_us(r.ts), -1) AS lag_us "
    "FROM events e ASOF LEFT JOIN r "
    "ON e.user_id = r.user_id AND epoch_us(e.ts) >= epoch_us(r.ts) "
    "WHERE e.event_type <> 'purchase'",
)
def x_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/temporal.asof_join): union + one window pass,
    no join node — verified value-exact against DuckDB's native ASOF JOIN."""
    from purescript_ifrit_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("anchor_id"),
            F.max_by("value", "event_id").alias("anchor_value"),
        )
    )
    left = ev.filter(F.col("event_type") != "purchase")
    out = asof_join(
        left, right, on="user_id", left_ts="ts",
        payload=["anchor_id", "anchor_value"],
    )
    return out.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.coalesce("anchor_id", F.lit(-1)).alias("anchor_id"),
        F.coalesce("anchor_value", F.lit(0.0)).alias("anchor_value"),
        F.coalesce(
            F.unix_micros("ts") - F.unix_micros("ts_r"), F.lit(-1)
        ).alias("lag_us"),
    )


@register(
    "x_asof_forward",
    # forward as-of: the EARLIEST purchase at-or-after each event. DuckDB
    # ASOF compares with >=, so forward = backward over negated epochs
    "WITH r AS (SELECT user_id, ts, max(event_id) AS anchor_id "
    "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2) "
    "SELECT e.event_id, coalesce(r.anchor_id, -1) AS anchor_id, "
    "coalesce(epoch_us(r.ts) - epoch_us(e.ts), -1) AS lead_us "
    "FROM events e ASOF LEFT JOIN r "
    "ON e.user_id = r.user_id AND -epoch_us(e.ts) >= -epoch_us(r.ts) "
    "WHERE e.event_type <> 'purchase'",
)
def x_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (direction="forward"): first right row
    at-or-after each left row — same union+window plan, inverted frame."""
    from purescript_ifrit_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("anchor_id"))
    )
    left = ev.filter(F.col("event_type") != "purchase")
    out = asof_join(
        left, right, on="user_id", left_ts="ts",
        payload=["anchor_id"], direction="forward",
    )
    return out.select(
        "event_id",
        F.coalesce("anchor_id", F.lit(-1)).alias("anchor_id"),
        F.coalesce(
            F.unix_micros("ts_r") - F.unix_micros("ts"), F.lit(-1)
        ).alias("lead_us"),
    )


@register(
    "x_range_join",
    # every non-purchase event inside a purchase's 6h attribution window
    "SELECT e.event_id, p.anchor_id, "
    "epoch_us(e.ts) - epoch_us(p.ts) AS delta_us "
    "FROM events e JOIN (SELECT user_id, ts, event_id AS anchor_id "
    "FROM events WHERE event_type = 'purchase') p "
    "ON e.user_id = p.user_id "
    "AND epoch_us(e.ts) >= epoch_us(p.ts) "
    "AND epoch_us(e.ts) < epoch_us(p.ts) + 21600000000 "
    "WHERE e.event_type <> 'purchase'",
)
def x_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join (operators/temporal.range_join_points):
    bucketed equi-join, never a cartesian — verified against DuckDB's
    inequality join."""
    from purescript_ifrit_spark.operators.temporal import range_join_points

    ev = load_table(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("w_start"),
        F.timestamp_micros(
            F.unix_micros("ts") + F.lit(6 * 3_600_000_000)
        ).alias("w_end"),
        F.col("event_id").alias("anchor_id"),
    )
    pts = ev.filter(F.col("event_type") != "purchase")
    rj = range_join_points(
        pts, iv, on="user_id", ts_col="ts",
        start_col="w_start", end_col="w_end",
        bucket_width_us=6 * 3_600_000_000,
    )
    return rj.select(
        "event_id",
        "anchor_id",
        (F.unix_micros("ts") - F.col("w_start_us")).alias("delta_us"),
    )


@register(
    "x_rollup_multi",
    # the oracle recomputes each grain independently; the engine produces
    # all three from ONE scan via GROUPING SETS — same rows either way
    "WITH b AS (SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v, "
    "(epoch_us(ts) // 3600000000) * 3600000000 AS bh, "
    "(epoch_us(ts) // 86400000000) * 86400000000 AS bd, "
    "(epoch_us(ts) // 604800000000) * 604800000000 AS bw FROM events) "
    "SELECT 'hour' AS grain, CAST(bh AS BIGINT) AS bucket_us, event_type, "
    "COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS sum_value, "
    "CAST(SUM(v) AS DOUBLE) / COUNT(*) AS avg_value FROM b GROUP BY 2, 3 "
    "UNION ALL "
    "SELECT 'day', CAST(bd AS BIGINT), event_type, COUNT(*), "
    "CAST(SUM(v) AS DOUBLE), CAST(SUM(v) AS DOUBLE) / COUNT(*) "
    "FROM b GROUP BY 2, 3 "
    "UNION ALL "
    "SELECT 'week', CAST(bw AS BIGINT), event_type, COUNT(*), "
    "CAST(SUM(v) AS DOUBLE), CAST(SUM(v) AS DOUBLE) / COUNT(*) "
    "FROM b GROUP BY 2, 3",
)
def x_rollup_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-grain rollup (operators/temporal.rollup_time):
    hour/day/week in one scan + one shuffle (Expand + grouping sets)."""
    from purescript_ifrit_spark.operators.temporal import rollup_time

    ev = load_table(spark, sf_dir, "events")
    return rollup_time(ev, "ts", ["event_type"], "value")


# ===========================================================================
# flagship (driver smoke check): pricing-summary-style grouped aggregation
# ===========================================================================


def flagship(spark: SparkSession) -> DataFrame:
    """Pricing summary over lineitem at sf0.001 — exercises filter → group →
    multi-aggregate through the dialect compiler."""
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    return run_query(
        spark,
        li,
        "SELECT AVG(l_quantity) AS avg_qty, SUM(l_extendedprice) AS sum_price, "
        "COUNT(l_orderkey) AS n WHERE l_quantity < 50 GROUP BY l_returnflag",
    )


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
    "x_robust_outliers",
    # per-user MAD outlier flags; both engines interpolate exact medians
    # over the same decimal-rounded doubles (quantile_cont ≡ Spark
    # percentile: lower + (upper-lower)·frac)
    "WITH b AS (SELECT event_id, user_id, "
    "  CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE) AS _v FROM events), "
    "m AS (SELECT *, quantile_cont(_v, 0.5) OVER "
    "  (PARTITION BY user_id) AS med FROM b), "
    "d AS (SELECT *, quantile_cont(abs(_v - med), 0.5) OVER "
    "  (PARTITION BY user_id) AS mad FROM m) "
    "SELECT event_id, user_id, med, mad, "
    "(abs(_v - med) > 3.0 * mad) AS is_outlier FROM d",
)
def x_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.windows import robust_outliers

    ev = load_table(spark, sf_dir, "events")
    out = robust_outliers(ev, "user_id", "value", z=3.0)
    return out.select("event_id", "user_id", "med", "mad", "is_outlier")


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
    "x_embedding_normalize",
    # FLAT output contract (VERDICT r4 #1): the driver's pandas canonicalizer
    # sorts result columns and cannot factorize list cells, so array-valued
    # results crash the comparator. Emit one row per vector element —
    # (vec_id, pos, val) — which is also how value diffs stay debuggable.
    # sequential double sum + IEEE sqrt/division are bit-reproducible, but
    # round to 6dp anyway so the value hash tolerates float-printing paths.
    # CASE sq = 0 (ADVICE r3): l2_normalize maps all-zero vectors to zeros;
    # without the guard the oracle would emit NaN for that row
    "WITH e AS (SELECT vec_id, embedding, "
    "list_aggregate(list_transform(embedding, "
    "y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum') AS sq FROM embeddings), "
    "x AS (SELECT vec_id, embedding, sq, "
    "CAST(unnest(range(len(embedding))) AS INT) AS pos FROM e) "
    "SELECT vec_id, pos, CASE WHEN sq = 0 THEN 0.0 "
    "ELSE ROUND(CAST(embedding[pos + 1] AS DOUBLE) / sqrt(sq), 6) "
    "END AS val FROM x",
)
def x_embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    unit = V.l2_normalize(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.posexplode(F.transform(unit, lambda x: F.round(x, 6))).alias(
            "pos", "val"
        ),
    )


@register(
    "x_embedding_quantize",
    # FLAT output contract — see x_embedding_normalize. scale repeats per
    # element row (star-schema shape; harmless at the compare and what a
    # downstream exploded consumer joins on anyway).
    # symmetric int8: scale = max|v|/127, q = round(v/scale); both engines
    # round halves away from zero on doubles. CASE sc = 0 mirrors the
    # operator's all-zero-vector convention (scale 0 + zero codes)
    "WITH e AS (SELECT vec_id, embedding, "
    "list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) / 127.0 "
    "AS sc FROM embeddings), "
    "x AS (SELECT vec_id, embedding, sc, "
    "CAST(unnest(range(len(embedding))) AS INT) AS pos FROM e) "
    "SELECT vec_id, ROUND(sc, 9) AS scale, pos, "
    "CASE WHEN sc = 0 THEN 0 "
    "ELSE CAST(ROUND(CAST(embedding[pos + 1] AS DOUBLE) / sc) AS INT) "
    "END AS q FROM x",
)
def x_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    qs = V.quantize_int8(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.round(qs["scale"], 9).alias("scale"),
        F.posexplode(qs["q"]).alias("pos", "q"),
    )


# ===========================================================================
# dialect temporal functions (TUMBLE / SESSIONIZE — functions/dialect_ext.py)
# ===========================================================================

register(
    "xd_tumble_hourly",
    # tz-free hour bucketing in epoch SECONDS (fits the dialect's float
    # numbers exactly; micros would exceed double's 2^53 integer range)
    "SELECT COUNT(*) AS n, "
    "CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) * 3600 AS _id "
    "FROM events GROUP BY 2",
)(_dialect("events", "SELECT COUNT(event_id) AS n GROUP BY TUMBLE(ts)"))

register(
    "xd_sessionize",
    # same window construction as x_sessionize's oracle, projected per-row:
    # the dialect SESSIONIZE fixes key=user_id, tiebreak=event_id, gap=30min
    "WITH s AS (SELECT event_id, user_id, ts, "
    "  CASE WHEN lag(ts) OVER w IS NULL "
    "       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 "
    "  THEN 1 ELSE 0 END AS new_s FROM events "
    "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
    "SELECT event_id, CAST(SUM(new_s) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id "
    "FROM s",
)(_dialect("events", "SELECT event_id, SESSIONIZE(ts) AS session_id"))


# ===========================================================================
# Driver-window ordering
# ===========================================================================
#
# The driver's correctness harness checks the FIRST 50 registry entries
# (dict insertion order). Rotation policy (COVERAGE.md ledger records the
# per-entry driver history): changed-this-round and never-verified entries
# enter first, then the entries with the OLDEST last driver check, so no
# entry's last hard check ages past two rounds. Round-5 composition is the
# one VERDICT r4 #4 prescribed:
#
#   1. the two entries reshaped this round (r4's only red cells — flat
#      posexplode output so the driver comparator can canonicalize them)
#      stay at positions 0-1;
#   2. the new round-5 DAU pair (never driver-verified);
#   3. all 24 r1/r2-only core §2 dialect rows — no driver pass since r2,
#      two rounds of lexer/parser/planner refactoring ago;
#   4. backfill with the oldest r3-only entries (one driver check each).
#
# Everything else (checked r3/r4 AND duplicated by
# tests/test_oracle_parity.py every round) follows after the window.

_DRIVER_WINDOW_R5 = [
    # -- (1) reshaped this round (VERDICT r4 #1) ---------------------------
    "x_embedding_normalize",
    "x_embedding_quantize",
    # -- (2) new round-5 operators -----------------------------------------
    "x_dau_exact",
    "x_dau_approx",
    # -- (3) the 24 r1/r2-only §2 dialect rows -----------------------------
    "p3_alias",
    "f1_neq",
    "f2_lt_gt",
    "f3_lte_via_not",
    "f3_gte_direct",
    "f4_and",
    "f5_or",
    "f6_not_demorgan",
    "f7_bare_boolean",
    "f8_null_compare",
    "f9_reversed_literal",
    "o1_o2_topk",
    "o4_pregroup_sort_limit",
    "a2_group_by_null",
    "a4_group_sum",
    "a5_group_min_max",
    "a6_group_count",
    "a7_push_collect",
    "b1_avg_array",
    "b3_sum_array",
    "b4_min_max_array",
    "b6_count_array",
    "b2_avg_nested_array",
    "b5_max_nested_array",
    # -- (4) oldest r3-only entries, ledger order --------------------------
    "x_dedup_ngram_planted",
    "x_ann_ivf_topk",
    "x_multimodal_framesample",
    "x_tpch_q18ish",
    "x_approx_distinct",
    "x_chunk_documents",
    "x_pack_sequences",
    "x_streaming_windowed",
    "x_streaming_session",
    "x_dedup_clusters_planted",
    "x_streaming_state",
    "x_dedup_clusters",
    "x_rolling_fingerprint",
    "x_partitioned_sink",
    "x_set_ops",
    "x_explode_chunks",
    "x_split_train_val",
    "x_hash_sample",
    "x_pii_redact",
    "xd_redact",
    "x_term_stats",
    "x_embedding_centroids",
]


def _apply_driver_window(window: list) -> None:
    ordered: Dict[str, Tuple[SparkFn, Optional[str]]] = {}
    for name in window:
        ordered[name] = REGISTRY[name]  # KeyError on typo = fail at import
    for name, entry in REGISTRY.items():
        if name not in ordered:
            ordered[name] = entry
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window(_DRIVER_WINDOW_R5)
