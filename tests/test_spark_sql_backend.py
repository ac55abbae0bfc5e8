"""Backend equivalence: every dialect query must produce identical results
through the DataFrame builder (planner.py) and the Spark SQL emitter
(plans/spark_sql.py) — same quirks, same nulls, same rows."""

from __future__ import annotations

import pytest

from purescript_ifrit_spark.api import run_query
from purescript_ifrit_spark.parser import parse_sql
from purescript_ifrit_spark.planner import CompatFlags
from purescript_ifrit_spark.plans.spark_sql import to_spark_sql
from tests.conftest import WIZARDS_SCHEMA

QUERIES = [
    "SELECT name WHERE evil = true",
    "SELECT name WHERE evil",
    "SELECT name WHERE NOT evil",
    "SELECT profile.bio.school WHERE profile.bio.age > 30",
    'SELECT name WHERE (profile.bio.age > 20 AND profile.bio.age < 40) OR profile.bio.school = "tide"',
    "SELECT name WHERE NOT (profile.bio.age > 27)",
    "SELECT name WHERE 40 < profile.bio.age",
    "SELECT name ORDER BY profile.bio.age DESC LIMIT 2",
    "SELECT name ORDER BY name LIMIT 2 OFFSET 1",
    "SELECT name ORDER BY name LIMIT 2 OFFSET 3",
    "SELECT AVG(profile.bio.age) AS avg_age GROUP BY profile.bio.school",
    "SELECT COUNT(name) AS n, SUM(profile.bio.age) AS s GROUP BY NULL",
    "SELECT name GROUP BY evil",
    "SELECT AVG(profile.bio.age) AS a GROUP BY NULL ORDER BY profile.bio.age DESC LIMIT 2",
    "SELECT name, AVG(scores) AS avg_score",
    "SELECT name, SUM(scores) AS s",
    "SELECT name, MAX(scores) AS m",
    "SELECT name, COUNT(wands) AS c",
    "SELECT name, MAX(wands.power) AS p",
    "SELECT name, AVG(wands.power) AS p",
    "SELECT AVG(p) AS avg_pow FROM (SELECT AVG(wands.power) AS p, name) WHERE p > 5 GROUP BY NULL",
    "SELECT name FROM (SELECT name, MAX(scores) AS m) WHERE m = NULL",
]


def _norm(df):
    cols = sorted(df.columns)
    out = []
    for r in df.collect():
        d = r.asDict()
        vals = []
        for c in cols:
            v = d[c]
            if isinstance(v, list):
                vals.append(tuple(sorted(v)))
            elif isinstance(v, float):
                vals.append(round(v, 9))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("sql", QUERIES)
def test_backends_agree(spark, wizards, sql):
    wizards.createOrReplaceTempView("wizards_view")
    df_result = run_query(spark, wizards, sql, schema=WIZARDS_SCHEMA)
    sql_text = to_spark_sql(parse_sql(sql), "wizards_view")
    sql_result = spark.sql(sql_text)
    assert sorted(df_result.columns) == sorted(sql_result.columns)
    assert _norm(df_result) == _norm(sql_result)


def test_field_vs_field_rejected_in_sql_backend():
    # lock-step with planner: both backends reject field-vs-field by default
    from purescript_ifrit_spark.errors import PlanError

    stmt = parse_sql("SELECT name WHERE name = name")
    with pytest.raises(PlanError):
        to_spark_sql(stmt, "any_view")
    # lifted by the same compat flag
    assert "WHERE" in to_spark_sql(
        stmt, "any_view", CompatFlags(allow_field_comparison=True)
    )


def test_backend_equivalence_randomized(spark, wizards):
    """Hypothesis-style sweep without per-example Spark overhead control:
    generate statements over the wizards schema, keep the analyzable ones,
    and demand identical results from both backends."""
    import random

    from purescript_ifrit_spark.api import compile_query
    from purescript_ifrit_spark.errors import IfritError

    rng = random.Random(20260813)
    num_fields = ["profile.bio.age", "profile.body.height"]
    str_fields = ["name", "profile.bio.school"]
    arr_fields = ["scores", "wands.power"]

    def gen_sql():
        parts = []
        mode = rng.choice(["select", "group", "arrays"])
        if mode == "arrays":
            fn = rng.choice(["AVG", "SUM", "MAX", "MIN"])
            parts.append(f"SELECT name, {fn}({rng.choice(arr_fields)}) AS v")
        elif mode == "group":
            fn = rng.choice(["AVG", "SUM", "MAX", "MIN", "COUNT"])
            parts.append(
                f"SELECT {fn}({rng.choice(num_fields)}) AS v "
                f"GROUP BY {rng.choice(str_fields + ['NULL'])}"
            )
        else:
            parts.append(f"SELECT {rng.choice(str_fields)} AS s")
        if mode != "group" and rng.random() < 0.6:
            f = rng.choice(num_fields)
            op = rng.choice(["<", ">", "<=", ">=", "=", "!="])
            parts.insert(1, f"WHERE {f} {op} {rng.randint(0, 60)}")
        if mode == "select" and rng.random() < 0.5:
            parts.append(f"ORDER BY {rng.choice(num_fields)} DESC, name ASC LIMIT {rng.randint(1, 6)}")
        # clause order: SELECT WHERE GROUP BY ORDER LIMIT — rebuild properly
        sql = parts[0]
        for p in parts[1:]:
            sql += " " + p
        return sql

    wizards.createOrReplaceTempView("wizards_view")
    tried = agreed = 0
    for _ in range(40):
        sql = gen_sql()
        try:
            plan = compile_query(WIZARDS_SCHEMA, sql)
        except IfritError:
            continue
        tried += 1
        a = _norm(plan.apply(wizards))
        b = _norm(spark.sql(plan.to_spark_sql("wizards_view")))
        assert a == b, f"backend divergence for: {sql}\n{a}\nvs\n{b}"
        agreed += 1
    assert tried >= 15  # the generator must produce mostly-valid statements


def test_sane_offset_flag_backend_parity(spark, wizards):
    wizards.createOrReplaceTempView("wizards_view")
    sql = "SELECT name ORDER BY name LIMIT 2 OFFSET 1"
    flags = CompatFlags(sane_offset=True)
    df_result = run_query(spark, wizards, sql, schema=WIZARDS_SCHEMA, flags=flags)
    sql_result = spark.sql(to_spark_sql(parse_sql(sql), "wizards_view", flags))
    assert _norm(df_result) == _norm(sql_result)
