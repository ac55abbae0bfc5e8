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
