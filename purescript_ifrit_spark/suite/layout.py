"""Suite entries for the data-layout operators (operators/layout.py):
Z-order keys, file-skipping effectiveness, shuffle-key skew profiling.

These are write-time/scale-planning operators — the oracle replays the
bit interleave, the row banding and the min/max pruning decision exactly
(all integer arithmetic, generated from the same Python loops on both
sides so the two expressions can never drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purescript_ifrit_spark.operators.layout import (
    layout_file_stats,
    layout_file_stats_sql,
    zorder_key,
    zorder_sql,
)
from purescript_ifrit_spark.sources.tables import load_table
from purescript_ifrit_spark.suite._registry import register

_ZBITS = 16
# lineitem dims, masked so the interleave is well-defined at every SF
# (l_partkey exceeds 16 bits above ~sf0.3)
_P_SQL = "(l_partkey & 65535)"
_S_SQL = "(l_suppkey & 65535)"

# the pruning scenario: 64 simulated files, a rectangular predicate on
# (partkey, suppkey) — the classic secondary-dimension query that a
# lexicographic partkey sort serves well and a suppkey probe does not,
# unless the layout is Z-ordered
_NFILES = 64
_BOX = {"p": (100, 300), "s": (2, 5)}


def _zorder_oracle() -> str:
    z = zorder_sql([_P_SQL, _S_SQL], _ZBITS)
    return (
        "SELECT l_orderkey, l_linenumber, "
        f"CAST({z} AS BIGINT) AS zkey "
        "FROM lineitem WHERE l_orderkey % 50 = 0"
    )


@register("x_zorder_key", _zorder_oracle())
def x_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order clustering key (operators/layout.zorder_key) over
    (l_partkey, l_suppkey), 16 bits each — the write-time sort key that
    gives BOTH dimensions file-level min/max locality. Pure bitwise
    codegen expressions; the oracle is generated from the same loop
    (zorder_sql) so the interleave cannot drift."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 50 == 0
    )
    z = zorder_key(
        [F.col("l_partkey").bitwiseAND(65535),
         F.col("l_suppkey").bitwiseAND(65535)],
        _ZBITS,
    )
    return li.select("l_orderkey", "l_linenumber", z.alias("zkey"))


def _pruning_oracle() -> str:
    zo = layout_file_stats_sql(
        "lineitem",
        zorder_sql([_P_SQL, _S_SQL], _ZBITS),
        "(l_orderkey * 8 + l_linenumber)",
        {"p": _P_SQL, "s": _S_SQL},
        _NFILES,
        _BOX,
    )
    lin = layout_file_stats_sql(
        "lineitem",
        _P_SQL,
        "(l_orderkey * 8 + l_linenumber)",
        {"p": _P_SQL, "s": _S_SQL},
        _NFILES,
        _BOX,
    )
    return (
        f"SELECT 'zorder' AS layout, * FROM ({zo}) "
        f"UNION ALL SELECT 'linear' AS layout, * FROM ({lin})"
    )


@register("x_layout_pruning", _pruning_oracle())
def x_layout_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping A/B (operators/layout.layout_file_stats): the same
    64-file split of lineitem under a Z-order sort vs a lexicographic
    partkey sort, per-file (partkey, suppkey) min/max, and whether each
    file survives the rectangular predicate — the measured form of "how
    much of the corpus must a 100 TB reader scan under this layout".
    Deterministic row banding (row_number, integer div), unioned flat
    rows; the hit-count gap between the two layouts IS the pruning win."""
    li = load_table(spark, sf_dir, "lineitem")
    dims = {
        "p": F.col("l_partkey").bitwiseAND(65535),
        "s": F.col("l_suppkey").bitwiseAND(65535),
    }
    tb = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    zo = layout_file_stats(
        li,
        zorder_key([F.col("l_partkey").bitwiseAND(65535),
                    F.col("l_suppkey").bitwiseAND(65535)], _ZBITS),
        tb, dims, _NFILES, _BOX,
    ).select(F.lit("zorder").alias("layout"), "*")
    lin = layout_file_stats(
        li, F.col("l_partkey").bitwiseAND(65535), tb, dims, _NFILES, _BOX
    ).select(F.lit("linear").alias("layout"), "*")
    return zo.unionByName(lin)


def _skew_oracle() -> str:
    return (
        "WITH c AS (SELECT o_custkey AS k, count(*) AS cnt FROM orders "
        "GROUP BY o_custkey), "
        "s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys, "
        "CAST(sum(cnt) AS BIGINT) AS rows_total, "
        "CAST(max(cnt) AS BIGINT) AS max_cnt FROM c) "
        "SELECT n_keys, rows_total, max_cnt, "
        "(SELECT min(k) FROM c WHERE cnt = (SELECT max_cnt FROM s)) "
        "AS top_key, "
        # HUGEINT (exact int128 floor-div) — DuckDB's DECIMAL `//`
        # degrades to DOUBLE and does not floor; Spark's exact twin is
        # DECIMAL(38,0) with `div`
        "CAST((CAST(max_cnt AS HUGEINT) * n_keys * 1000000) "
        "// rows_total AS BIGINT) AS skew_micro, "
        "CAST((CAST(max_cnt AS HUGEINT) * n_keys + rows_total - 1) "
        "// rows_total AS BIGINT) AS salt_factor "
        "FROM s"
    )


@register("x_skew_profile", _skew_oracle())
def x_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report (operators/layout.skew_profile) on
    orders.o_custkey: distinct keys, hottest key (lowest id under ties),
    max/avg frequency in integer micro-units and the salt factor that
    levels it — the pre-flight check for operators/joins.salted_join.
    Two map-side-combinable aggregates, integer division only."""
    from purescript_ifrit_spark.operators.layout import skew_profile

    o = load_table(spark, sf_dir, "orders")
    return skew_profile(o, F.col("o_custkey"))
