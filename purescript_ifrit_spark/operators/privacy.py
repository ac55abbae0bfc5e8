"""Privacy-prep operators: per-user contribution bounding and
k-anonymity group suppression.

Publishing corpus statistics (data cards, eval dashboards) and
differential-privacy-adjacent aggregation both start with the same two
moves: CAP each contributor's influence BEFORE aggregating (one hot user
must not dominate a published mean — and DP's sensitivity analysis
requires a hard bound), and SUPPRESS groups too small to publish (a
(lang, source) cell with 2 documents identifies its members; k-anonymity
says publish only cells with >= k). Both are one-exchange window
operators — no joins, no collect.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def contribution_cap(
    df: DataFrame,
    user_col: str,
    k: int,
    order_cols: Sequence[Column],
) -> DataFrame:
    """Keep at most `k` rows per contributor — deterministically, the
    first `k` under `order_cols` (which MUST end in a per-user-unique
    tiebreak: rank over duplicate order keys is engine-nondeterministic
    and the cap would flicker between runs).

    100 TB design: ONE user-keyed exchange + in-partition rank; the cap
    is a row-level filter, so everything downstream (means, sums,
    histograms) inherits bounded per-user sensitivity — the precondition
    for DP noise calibration and the cheap defense against hot-key
    contributors skewing published stats."""
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def kanon_suppress(
    df: DataFrame,
    keys: Sequence[str],
    k: int,
) -> DataFrame:
    """Drop every row whose `keys` group has fewer than `k` members, and
    carry the group size as `group_n` on the survivors — the k-anonymity
    gate run before publishing grouped statistics.

    100 TB design: ONE keys-partitioned window count (no join-back, no
    second aggregate — the count rides the same exchange the suppression
    filter reads). Suppression is row-level, so downstream aggregates
    see only publishable cells."""
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    w = Window.partitionBy(*keys)
    return (
        df.withColumn(
            "group_n", F.count(F.lit(1)).over(w).cast("long")
        )
        .filter(F.col("group_n") >= k)
    )
