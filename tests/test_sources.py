"""Source/sink connectors: format round-trips with schema enforcement and
partitioned writes (the unit of partition pruning at scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from purescript_ifrit_spark.sources import tables as S


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    orders = S.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_csv")
    S.write(orders, path, fmt="csv", header=True)
    back = S.read(
        spark, path, fmt="csv",
        schema="o_orderkey long, o_orderstatus string, o_totalprice double",
        header=True,
    )
    assert back.count() == orders.count()
    a = orders.agg(F.sum("o_totalprice")).first()[0]
    b = back.agg(F.sum("o_totalprice")).first()[0]
    assert abs(a - b) < 1e-6


def test_json_roundtrip(spark, sf_dir, tmp_path):
    cust = S.load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_json")
    S.write(cust, path, fmt="json")
    back = S.read(spark, path, fmt="json",
                  schema="c_custkey long, c_name string, c_nationkey int, "
                         "c_acctbal double, c_mktsegment string")
    assert back.count() == cust.count()


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = S.load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    S.write(orders, path, partition_by=["o_orderstatus"])
    back = S.read(spark, path)
    pruned = back.filter(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter must be recognized as such, not a data filter
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Tables bucketed on the join key join WITHOUT a shuffle — the
    co-location strategy for repeated fact-fact joins at scale."""
    # warehouse dir is a static conf, set in conftest's session builder
    orders = S.load_table(spark, sf_dir, "orders")
    li = S.load_table(spark, sf_dir, "lineitem")
    S.write_bucketed(orders, "orders_b", ["o_orderkey"], 8)
    S.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b",
        ["o_orderkey"], 8,
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_register_views(spark, sf_dir):
    S.register_views(spark, sf_dir)
    assert spark.sql("SELECT count(*) FROM region").first()[0] == 5
    from purescript_ifrit_spark.api import run_query

    # run_query accepts a registered view name directly
    df = run_query(spark, "nation", "SELECT n_name LIMIT 3")
    assert df.count() == 3
