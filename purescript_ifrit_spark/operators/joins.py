"""Join strategies tuned for the star schema at scale.

The reference has NO joins (README.md:199: single collection, no joins) —
these are engine extensions, written the way they must be written at 100 TB:

- dimension joins broadcast explicitly (`F.broadcast`) — a 25-row nation
  table must never shuffle a 100 TB fact table
- fact-fact joins rely on shuffle-hash/sort-merge with AQE; helpers here
  expose salting for skewed keys
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact ⋈ broadcast(dim). Use for any dimension that fits in executor
    memory (rule of thumb: < spark.sql.autoBroadcastJoinThreshold, but we
    force it — AQE sometimes under-estimates dimension size on parquet)."""
    return fact.join(F.broadcast(dim), on, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: left side gets a random-ish salt derived
    from a stable hash of its row (deterministic), right side is replicated
    `salt` ways. Use when one join key dominates (power-law keys) and AQE
    skew-join still struggles."""
    left_s = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    right_s = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return left_s.join(right_s, [key, "_salt"]).drop("_salt")


def orders_enriched(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Star-schema enrichment: orders ⋈ customer ⋈ nation ⋈ region with all
    dimensions broadcast. The fact table never moves."""
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
