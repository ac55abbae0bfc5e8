"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query at sf0.001 (smoke check)
queries()       — one entry per implemented operator (SURVEY.md §2)
oracle_sql()    — DuckDB-runnable ANSI SQL recomputing each query

The implementations live in purescript_ifrit_spark/suite/ (domain-split package) so they are
unit-tested (tests/test_oracle_parity.py mirrors the driver's compare).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from purescript_ifrit_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return suite.flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in suite.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle
        for name, (_, oracle) in suite.REGISTRY.items()
        if oracle is not None
    }
