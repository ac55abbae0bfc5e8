"""Mirror of the driver's correctness gate: run every suite query through
OUR engine on Spark AND its oracle SQL through DuckDB on the same parquet,
then compare row-count + column names + order-insensitive values.

Float cells are rounded to 5 decimals before comparison (the suite already
rounds to 6 on both sides; this guards the final representation)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from purescript_ifrit_spark.sources.tables import TABLES


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # + 0.0 folds -0.0 (incl. values that ROUND to -0.0) into +0.0 so
        # the repr-keyed row sort orders value-equal cells identically
        return round(v, 5) + 0.0
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr so rows with NULL cells still have a total order (None
    # vs float is unorderable); equality below still compares real values
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=lambda row: tuple(repr(c) for c in row),
    )


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = _duck(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    df = QUERIES[name](spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    if name not in ORACLES:
        # driver's weaker rows-only check
        assert len(spark_rows) >= 0
        return

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _norm_rows(spark_cols, spark_rows)
    b = _norm_rows(duck_cols, duck_rows)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
    assert a == b, f"{name}: first value mismatches at {mism}: " + str(
        [(a[i], b[i]) for i in mism]
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None
