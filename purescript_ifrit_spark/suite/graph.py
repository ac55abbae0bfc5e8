"""Link-graph entries: integer-exact power-iteration authority ranks."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purescript_ifrit_spark.sources.tables import load_table
from purescript_ifrit_spark.suite._registry import (
    register,
)

_PR_SCALE = 10**12
_PR_DAMPING = 85
_PR_ITER = 5


def _pagerank_oracle() -> str:
    """Unrolled DuckDB twin of power_iteration_ranks on the planted
    doc_id-derived edge list: every iteration is the same integer floor
    arithmetic as the operator (scores are pure integer functions of
    the edges), so even the ITERATIVE path carries a value-exact oracle
    — the bounded-unroll analogue of the bounds-as-booleans pattern."""
    parts = [
        # planted graph: 20 nodes, edge u→v with u = doc_id % 20 and
        # v = (doc_id·7) % 20 (7 ⊥ 20, so v sweeps every residue);
        # self-loops excluded, multi-edges collapsed on BOTH sides
        "WITH e AS (SELECT DISTINCT doc_id % 20 AS u, "
        "(doc_id * 7) % 20 AS v FROM documents "
        "WHERE doc_id % 20 <> (doc_id * 7) % 20), ",
        "nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e), ",
        "nn AS (SELECT COUNT(*) AS n FROM nodes), ",
        "od AS (SELECT u, COUNT(*) AS outdeg FROM e GROUP BY u), ",
        f"s0 AS (SELECT node, {_PR_SCALE} // n AS score FROM nodes, nn), ",
    ]
    for i in range(1, _PR_ITER + 1):
        parts.append(
            f"c{i} AS (SELECT e.v AS node, "
            f"SUM((s.score * {_PR_DAMPING}) // (100 * od.outdeg)) AS c "
            f"FROM e JOIN s{i - 1} s ON s.node = e.u "
            "JOIN od ON od.u = e.u GROUP BY e.v), "
        )
        parts.append(
            f"s{i} AS (SELECT n.node, "
            f"({_PR_SCALE} * {100 - _PR_DAMPING}) // (100 * nn.n) "
            f"+ COALESCE(c.c, 0) AS score "
            f"FROM nodes n CROSS JOIN nn LEFT JOIN c{i} c USING (node)), "
        )
    # trailing comma of the last CTE is consumed by rewriting: drop it
    parts[-1] = parts[-1].rstrip(", ") + " "
    parts.append(
        "SELECT node, CAST(score AS BIGINT) AS score_scaled, "
        f"ROUND(score / {float(_PR_SCALE)}, 6) AS rank FROM s{_PR_ITER}"
    )
    return "".join(parts)


@register("x_pagerank_planted", _pagerank_oracle())
def x_pagerank_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped power-iteration authority scores (operators/graph.
    power_iteration_ranks) over a planted doc_id-derived link graph —
    the web-corpus quality-prior signal, integer-exact per iteration so
    the driver value-checks all five iterations end-to-end."""
    from purescript_ifrit_spark.operators.graph import power_iteration_ranks

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = (
        docs.select(
            (F.col("doc_id") % 20).alias("src"),
            ((F.col("doc_id") * 7) % 20).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    out = power_iteration_ranks(
        edges, damping_pct=_PR_DAMPING, n_iter=_PR_ITER, scale=_PR_SCALE
    )
    return out.select(
        "node", "score_scaled", F.round(F.col("rank"), 6).alias("rank")
    )
