"""Event-sequence analytics: funnel conversion and retention cohorts.

No reference counterpart (engine extension — the events-table family of
SURVEY §2.7, alongside sessionization/tumbling windows). Both operators
are exact and expressible as one or two hash aggregations; neither sorts
globally or collects to the driver.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered-funnel conversion: how many users performed step 0, then
    step 1 at a timestamp >= their step-0 time, then step 2 after that,
    … Returns (step_idx, step, n_users), one row per step.

    Semantics: greedy chained minima — a user reaches step i if an event
    of type steps[i] exists at ts >= the (earliest qualifying) step-i-1
    time; ties at equal ts resolve in step order (doing A and B at the
    same instant counts as A→B). `steps` must be distinct types.

    Scale: ONE shuffle. Irrelevant event types are filtered in the scan
    stage; per user, qualifying events collapse to a sorted
    (ts, step_idx) array (collect_list + array_sort inside one hash
    aggregation — state per user is bounded by that user's funnel-typed
    events), and a linear higher-order fold walks the funnel. No joins,
    no per-step passes: a k-step funnel costs the same single exchange as
    a 2-step one. The final per-step counts are a tiny second aggregation
    over one row per user."""
    steps = list(steps)
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    step_arr = F.array(*[F.lit(s) for s in steps])
    # (ts, step_idx) structs: array_sort orders by ts, then step index, so
    # equal-timestamp events feed the walk in funnel order (the `>=` rule)
    ev = (
        df.filter(F.col(type_col).isin(steps))
        .select(
            F.col(user_col).alias("_u"),
            F.struct(
                F.col(ts_col).alias("ts"),
                (F.array_position(step_arr, F.col(type_col)) - 1)
                .cast("int")
                .alias("idx"),
            ).alias("_e"),
        )
        .groupBy("_u")
        .agg(F.array_sort(F.collect_list("_e")).alias("_evs"))
    )
    # fold: stage counter advances when the next event IS the awaited step
    reached = F.aggregate(
        F.col("_evs"),
        F.lit(0),
        lambda acc, e: F.when(e["idx"] == acc, acc + 1).otherwise(acc),
    )
    per_user = ev.select(reached.alias("_reached"))
    # coalesce: a global agg over zero users (e.g. a mistyped step name
    # filtering everything out) yields one row of NULL sums — the funnel
    # must report 0, matching COUNT semantics (ADVICE r4)
    counts = per_user.groupBy().agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("_reached") >= i + 1, F.lit(1)
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            ).alias(f"_s{i}")
            for i in range(len(steps))
        ]
    )
    # unpivot the single counts row into (step_idx, step, n_users)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"_s{i}").cast("long").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(pairs).alias("_p")).select(
        "_p.step_idx", "_p.step", "_p.n_users"
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    period_us: int = 86_400_000_000,
) -> DataFrame:
    """Classic retention triangle: cohort = a user's first active period
    (floor of epoch micros / period_us), k = periods since cohort;
    (cohort, k, n_users) counts users from each cohort active again k
    periods later (k = 0 row = cohort size). Exact integer arithmetic
    end-to-end.

    Scale: distinct (user, period) pre-aggregation, first-activity
    aggregation per user, then a user-keyed equi-join (both sides already
    partitioned by user — no extra exchange) and a small (cohort, k)
    aggregation."""
    period = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(period_us)
    ).cast("long")
    active = (
        df.select(F.col(user_col).alias("_u"), period.alias("_p"))
        .distinct()
    )
    first = active.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    return (
        active.join(first, "_u")
        .groupBy(
            F.col("_cohort").alias("cohort"),
            (F.col("_p") - F.col("_cohort")).alias("k"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
