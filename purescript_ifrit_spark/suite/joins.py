"""Join-shaped entries: star joins, TPC-H-ish composites, semi/anti, set ops, JSON, partitioned sink."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purescript_ifrit_spark.api import run_query
from purescript_ifrit_spark.sources.tables import load_table
from purescript_ifrit_spark.suite._registry import (
    register,
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


# shared by x_interval_join and x_streaming_interval_join (ONE duration
# formula + ONE overlap oracle so the batch and streaming twins cannot
# drift — only the duration cap differs): duration = floor(value
# minutes); floor() on both engines because DuckDB CAST(double AS
# BIGINT) rounds where Spark truncates
_IVAL_DUR_SQL = "CAST(floor(value * 60000000) AS BIGINT)"


def interval_overlap_oracle(max_value: int) -> str:
    """Clicks whose activity window overlaps an error window of the
    SAME user — the plain inequality-join truth, duration-capped at
    `max_value` minutes (the batch entry mirrors the operator's
    max_span_buckets guard; the streaming entry mirrors its
    max_span state bound)."""
    return (
        "WITH iv AS (SELECT user_id, event_id, event_type, "
        f"epoch_us(ts) AS s, epoch_us(ts) + {_IVAL_DUR_SQL} AS e "
        f"FROM events WHERE value > 0 AND value <= {max_value}), "
        "c AS (SELECT user_id, event_id AS click_id, s, e FROM iv "
        "WHERE event_type = 'click'), "
        "x AS (SELECT user_id, event_id AS error_id, s, e FROM iv "
        "WHERE event_type = 'error') "
        "SELECT c.user_id, click_id, error_id, c.s AS c_s, c.e AS c_e, "
        "x.s AS x_s, x.e AS x_e FROM c JOIN x ON c.user_id = x.user_id "
        "AND c.s < x.e AND x.s < c.e"
    )


@register(
    "x_interval_join",
    # value <= 10000 min mirrors the operator's max_span_buckets guard
    # (1024 hour-buckets = 61440 min): an uncapped oracle would keep a
    # pair whose over-wide interval the Spark side drops by policy
    interval_overlap_oracle(10000),
)
def x_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (operators/temporal.interval_join): click
    activity windows × error windows per user. Both sides band onto
    hour buckets and equi-join on (user, bucket); pairs attribute
    exactly once at the intersection-start bucket — no cartesian, no
    dropDuplicates. The oracle replays the overlap predicate as a plain
    inequality join."""
    from purescript_ifrit_spark.operators.temporal import interval_join

    ev = load_table(spark, sf_dir, "events")
    iv = ev.filter(
        (F.col("value") > 0) & (F.col("value") <= 10000)
    ).select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (F.unix_micros(F.col("ts").cast("timestamp"))
         + F.expr(_IVAL_DUR_SQL)).alias("e"),
    )
    c = iv.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "s", "e"
    )
    x = iv.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), "s", "e"
    )
    out = interval_join(c, x, "user_id", "s", "e", "s", "e")
    return out.select(
        "user_id", "click_id", "error_id",
        F.col("s_us").alias("c_s"), F.col("e_us").alias("c_e"),
        F.col("s_us_r").alias("x_s"), F.col("e_us_r").alias("x_e"),
    )


@register(
    "x_compact_roundtrip",
    # compaction is pure layout maintenance: what goes through the
    # small-file write → compact_parquet rewrite must equal the source
    # rows exactly (file counts are pinned in test_sources.py)
    "SELECT doc_id, lang, n_chars FROM documents",
)
def x_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction round-trip (sources.compact_parquet): the
    documents projection written as 48 deliberately-tiny files, compacted
    by the metadata-sized plan (binaryFile listing, no data read to
    size the rewrite), read back and checkpointed so both temp dirs can
    be removed before returning. Content identity IS the operator's
    contract — compaction changes layout, never rows."""
    import shutil
    import tempfile

    from purescript_ifrit_spark.sources.tables import compact_parquet

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    small_dir = tempfile.mkdtemp(prefix="ifrit_small_")
    out_dir = tempfile.mkdtemp(prefix="ifrit_compact_")
    try:
        docs.repartition(48).write.mode("overwrite").parquet(small_dir)
        compact_parquet(
            spark, small_dir, out_dir,
            target_file_bytes=64 * 1024 * 1024, mode="overwrite",
        )
        return (
            spark.read.parquet(out_dir)
            .select("doc_id", "lang", "n_chars")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(small_dir, ignore_errors=True)
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
    "x_salted_join",
    # oracle = the PLAIN join: salting must be result-invisible. Value
    # parity here is the hard signal that the salt scatter/replicate is a
    # pure partitioning trick (no dropped/duplicated rows)
    "SELECT o.o_orderstatus AS status, COUNT(*) AS n, "
    "CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "GROUP BY 1",
)
def x_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted fact-fact join (operators/joins.salted_join):
    the hot-key technique for when one join key dominates and the right
    side is too big to broadcast but cheap to replicate salt-ways. The
    left's rows scatter across (key, salt) buckets deterministically
    (xxhash64 of the row), the right replicates to every salt."""
    from purescript_ifrit_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    right = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    return (
        salted_join(li, right, "l_orderkey", salt=8)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


_FUZZY_EDIT_SQL = (
    # planted near-duplicate keys, closed-form from p_partkey: one char
    # DELETED at position (p_partkey % 10)+1 for % 3 == 0, SUBSTITUTED
    # with 'x' for % 3 == 1, unchanged otherwise (p_name is 7-12 chars,
    # so the edit position always lands inside the key)
    "CASE WHEN p_partkey % 3 = 0 THEN "
    "substr(p_name, 1, p_partkey % 10) || substr(p_name, (p_partkey % 10) + 2) "
    "WHEN p_partkey % 3 = 1 THEN "
    "substr(p_name, 1, p_partkey % 10) || 'x' || substr(p_name, (p_partkey % 10) + 2) "
    "ELSE p_name END"
)


@register(
    "x_fuzzy_join",
    # brute-force oracle: the length prefilter mirrors the operator's
    # blocking IDENTITY (edit distance >= length difference), then plain
    # levenshtein — DuckDB and Spark both implement classic unit-cost
    # Levenshtein, so the pair set and distances agree exactly
    "WITH e AS (SELECT p_partkey AS e_partkey, "
    f"{_FUZZY_EDIT_SQL} AS e_name FROM part), "
    "o AS (SELECT p_partkey AS o_partkey, p_name AS o_name FROM part) "
    "SELECT o_partkey, e_partkey, "
    "CAST(levenshtein(o_name, e_name) AS INT) AS edit_dist "
    "FROM o JOIN e ON abs(length(o_name) - length(e_name)) <= 1 "
    "AND levenshtein(o_name, e_name) <= 1",
)
def x_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance key join (operators/joins.fuzzy_key_join) — record
    linkage over planted typo'd part names: length-blocked equi-join +
    threshold levenshtein, vs DuckDB's brute-force quadratic twin."""
    from purescript_ifrit_spark.operators.joins import fuzzy_key_join

    part = load_table(spark, sf_dir, "part")
    o = part.select(
        F.col("p_partkey").alias("o_partkey"), F.col("p_name").alias("o_name")
    )
    e = part.select(
        F.col("p_partkey").alias("e_partkey"),
        F.expr(_FUZZY_EDIT_SQL).alias("e_name"),
    )
    return fuzzy_key_join(o, e, "o_name", "e_name", max_dist=1).select(
        "o_partkey", "e_partkey", "edit_dist"
    )


@register(
    "x_tpch_q12ish",
    # TPC-H Q12-flavored conditional aggregation (the synthetic lineitem
    # carries no l_shipmode, so the group key is l_returnflag): per
    # returnflag over a one-year shipdate window, how many lines belong
    # to high-priority orders vs the rest — exact integer counts, the
    # CASE-sum shape both engines compute identically
    "SELECT l_returnflag, "
    "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
    "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
    "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
    "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
    "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
    "AND l_shipdate < TIMESTAMP '1998-01-01' "
    "GROUP BY l_returnflag",
)
def x_tpch_q12ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-style shipping-priority audit: lineitem filters to the
    shipdate window AT THE SCAN (pushed predicate), joins orders on the
    order key, and the per-flag high/low priority counts are one
    conditional aggregation — partial CASE-sums collapse map-side, so
    the exchange carries three rows per partition."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )
