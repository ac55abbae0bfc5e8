"""Suite registry: entry/oracle table plus the small combinators every
domain module builds its entries from (split out of the old suite.py —
VERDICT r4 #7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purescript_ifrit_spark.api import run_query
from purescript_ifrit_spark.sources.tables import load_table

from typing import Callable, Dict, Optional, Tuple


SparkFn = Callable[[SparkSession, str], DataFrame]

# registry filled at import time: name -> (fn, oracle)
REGISTRY: Dict[str, Tuple[SparkFn, Optional[str]]] = {}

# Demo registry (VERDICT r7 #4): runnable compositions whose CORRECTNESS
# is pinned elsewhere — every entry here is an approximate operator or a
# pipeline composition shadowed by a green planted/bound oracle twin in
# REGISTRY (x_dedup_minhash → x_dedup_minhash_planted, x_cms_probe →
# x_cms_probe_planted, ...). They stay importable and pytest-exercised,
# but are NOT part of the driver contract: a `no_oracle` row can never
# go hash-green, so letting one into `queries()` wastes a hard-signal
# window slot. `oracle_sql()` therefore covers 100% of `queries()`.
DEMO_REGISTRY: Dict[str, SparkFn] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn: SparkFn) -> SparkFn:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def register_demo(name: str):
    """Register an approximate/composition demo entry (kept out of the
    driver contract; see DEMO_REGISTRY docstring)."""

    def deco(fn: SparkFn) -> SparkFn:
        DEMO_REGISTRY[name] = fn
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
