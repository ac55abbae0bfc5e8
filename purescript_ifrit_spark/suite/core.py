"""SURVEY.md §2 core dialect surface: projection, filters, sort/limit/offset, grouped and array aggregation, derived tables — plus the driver flagship query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purescript_ifrit_spark.api import run_query
from purescript_ifrit_spark.sources.tables import load_table
from purescript_ifrit_spark.suite._registry import (
    _chain,
    _dialect,
    _null_id,
    _round,
    register,
)
from purescript_ifrit_spark.suite._fixtures import (
    _lineitem_nested,
)



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
