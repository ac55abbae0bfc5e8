"""Sharded exact prefix sums — the shared scale primitive behind
pack_sequences and budget_sample's global modes.

A single global running sum is a `Window.orderBy(...)` with no partition
key: one SinglePartition exchange, the classic scale-killer. When rows can
be bucketed into shards that are CONTIGUOUS in the global order, the exact
global prefix sum decomposes: offset(shard) + per-shard running sum, where
offset(shard) is the value total of all earlier shards. The per-shard
windows run in parallel after one hash exchange, and the offsets come from
a shard-count-sized triangular self-join (never a window), so no
single-partition stage exists anywhere in the plan.

Callers are responsible for the contiguity invariant (range-sharding on
the leading order column, or prefix-sharding on a uniform hash draw) and
for mapping NULL order keys to shard 0 — ascending windows sort NULLS
FIRST, so shard 0 is where the global order puts them.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sharded_prefix_sum(
    d: DataFrame,
    shard_col: str,
    order: Sequence[Column],
    val_col: str,
) -> Tuple[DataFrame, Column]:
    """Attach cross-shard offsets to `d` and return (df, cum) where `cum`
    evaluates to the exact global running sum of `val_col` over the
    concatenation of shards in `shard_col` order, each shard internally
    ordered by `order`.

    The returned DataFrame carries an internal `_off` column — drop it
    (and `shard_col`) after materializing the cumulative expression."""
    totals = d.groupBy(shard_col).agg(F.sum(val_col).alias("_tot"))
    offs = (
        totals.alias("a")
        .join(
            totals.alias("b"),
            F.col(f"b.{shard_col}") < F.col(f"a.{shard_col}"),
            "left",
        )
        .groupBy(F.col(f"a.{shard_col}").alias(shard_col))
        .agg(F.coalesce(F.sum("b._tot"), F.lit(0)).alias("_off"))
    )
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = d.join(F.broadcast(offs), shard_col)
    return out, F.col("_off") + F.sum(F.col(val_col)).over(w)
