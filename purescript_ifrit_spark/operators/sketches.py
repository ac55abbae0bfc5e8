"""Mergeable-summary operators: heavy hitters and corpus-overlap sketches.

No reference counterpart (SURVEY.md §2.7 family — driver-mandated
training-data-pipeline analytics). Both follow the same scale contract as
the rest of the package: the EXACT form is the oracle-checkable twin, the
sketch form is the 100 TB path whose state is bounded and mergeable, with
the accuracy envelope pinned against the exact twin in pytest.

- Heavy hitters: exact = groupBy count + TakeOrdered (one shuffle of
  (item, partial count) rows — fine when the item domain fits a shuffle);
  Misra-Gries = per-partition bounded counter maps (capacity entries, the
  classic decrement-on-overflow summary) merged by summation + one final
  truncation — state per partition is O(capacity) regardless of domain
  size, which is the form that works when the domain itself is too large
  to shuffle (URLs, shingles, user ids at 100 TB).
- Set-overlap: exact = pairwise |A∩B|/|A∪B| via a distinct-key self-join;
  sketch = per-group k-lane min-hash over md5 lane strings — constant
  state per group, mergeable, and engine-neutral (md5 strings min the
  same in Spark and DuckDB, so the sketch itself is oracle-checkable
  value-exactly, not just within tolerance).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def heavy_hitters_exact(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Top-k most frequent values of `col` (count desc, value asc ties).

    NULLs are excluded — the SAME universe the Misra-Gries twin
    summarizes (r8 review: the exact side used to count the NULL group
    as a top-k item while the sketch filtered it, so on NULL-heavy
    columns every rank between the twins shifted by one and the
    accuracy envelope compared different universes).

    One shuffle with map-side partial counts, then TakeOrdered — the right
    form whenever the distinct-value domain is shuffle-sized."""
    if k <= 0:
        raise ValueError(f"k must be positive (got {k})")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("item").asc())
        .limit(k)
    )


def heavy_hitters_mg(
    df: DataFrame, col: str, k: int = 10, capacity: int = 256
) -> DataFrame:
    """Approximate top-k via per-partition Misra-Gries summaries.

    Each partition keeps at most `capacity` counters (Arrow-batched: exact
    batch counts fold into the summary, then the standard truncation —
    subtract the (capacity+1)-th largest weight, drop non-positives).
    Summaries merge by summation; the merged result underestimates any
    item's true count by at most n_partition_rows/capacity summed over
    partitions, so every item with true frequency > n/capacity survives.
    Output: (item, est_n) for the top k by estimated count — est_n is a
    LOWER bound on the true count.

    Scale: state is O(capacity) per partition and the merge shuffles at
    most capacity × partitions rows, independent of the item domain —
    use when the domain (URLs, n-grams, ids) is itself too large to
    shuffle; use heavy_hitters_exact otherwise."""
    if k <= 0 or capacity <= 0:
        raise ValueError(f"k and capacity must be positive (got {k}, {capacity})")
    if k > capacity:
        raise ValueError(f"capacity ({capacity}) must be >= k ({k})")
    out_schema = f"item {dict(df.dtypes)[col]}, est_n long"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for item, cnt in pdf[col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > capacity:
                # Misra-Gries truncation: subtract the (capacity+1)-th
                # largest weight from everyone, drop non-positives
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    i: c - cut for i, c in counters.items() if c > cut
                }
        yield pd.DataFrame(
            {"item": list(counters), "est_n": list(counters.values())}
        )

    summaries = df.select(col).filter(F.col(col).isNotNull()).mapInPandas(
        summarize, out_schema
    )
    merged = summaries.groupBy("item").agg(F.sum("est_n").alias("est_n"))
    return merged.orderBy(F.col("est_n").desc(), F.col("item").asc()).limit(k)


def group_overlap_exact(
    df: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """Exact pairwise Jaccard overlap of the distinct `key_col` sets of
    every group pair (group_a < group_b) — the corpus-diff report: how much
    does source X's content overlap source Y's?

    NULL conventions (r8 review — the exact/sketch twin pair must
    summarize ONE universe): NULL keys are excluded up front (they can
    never match in the intersection join, so counting them in sizes
    deflated Jaccard vs the minhash twin, which skips them inherently
    via NULL md5 lanes); a group whose keys are all NULL therefore does
    not participate. And EVERY surviving group pair is emitted —
    zero-intersection pairs at jaccard 0.0 — matching both the
    docstring contract and the sketch twin's all-pairs lane join.

    One distinct pass, one self-equi-join ON KEY (the join output is one
    row per shared key per pair, never |A|×|B|), plus a broadcast
    non-equi pair grid over the group-size table. Quadratic only in the
    number of GROUPS (sources — tens), never in rows."""
    keys = df.select(
        F.col(group_col).alias("g"), F.col(key_col).alias("_k")
    ).filter(F.col(key_col).isNotNull()).distinct()
    sizes = keys.groupBy("g").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        keys.select(F.col("g").alias("group_a"), "_k")
        .join(keys.select(F.col("g").alias("group_b"), "_k"), "_k")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("g").alias("group_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("g").alias("group_b"), F.col("sz").alias("sz_b"))
    # group-sized pair grid: a broadcast non-equi join over the SIZE
    # table (tens of rows), never over keys — the one sanctioned
    # nested-loop shape, same bound as the sketch twin's lane join
    pairs = sa.join(F.broadcast(sb), F.col("group_a") < F.col("group_b"))
    return (
        pairs.join(F.broadcast(inter), ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            (
                F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
                / (
                    F.col("sz_a") + F.col("sz_b")
                    - F.coalesce(F.col("n_inter"), F.lit(0))
                ).cast("double")
            ).alias("jaccard"),
        )
    )


def group_minhash_overlap(
    df: DataFrame, group_col: str, key_col: str, num_hashes: int = 16
) -> DataFrame:
    """Estimated pairwise Jaccard overlap via per-group k-lane min-hash:
    lane i of a group is MIN(md5(key || ':' || i)) over the group's keys;
    the estimate is the fraction of agreeing lanes (standard bottom-1-per-
    lane MinHash, ±1/√k standard error).

    The 100 TB form of group_overlap_exact: per-group state is `num_hashes`
    md5 strings (constant, mergeable — mins combine), the shuffle carries
    one (group, lane, min) row per group-lane-partition, and the pairwise
    comparison happens on the tiny aggregated sketch table. md5 keeps the
    lanes engine-neutral, so the ESTIMATE itself is deterministic and
    value-checkable cross-engine (the paired oracle recomputes it exactly —
    a stronger check than a tolerance band; the tolerance-vs-exact test
    lives in pytest instead)."""
    lanes = df.select(
        F.col(group_col).alias("g"),
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat(
                            F.col(key_col).cast("string"), F.lit(f":{i}")
                        )
                    )
                    for i in range(num_hashes)
                ]
            )
        ).alias("lane", "h"),
    )
    sketch = lanes.groupBy("g", "lane").agg(F.min("h").alias("mn"))
    a = sketch.select(
        F.col("g").alias("group_a"), "lane", F.col("mn").alias("mn_a")
    )
    b = sketch.select(
        F.col("g").alias("group_b"), "lane", F.col("mn").alias("mn_b")
    )
    return (
        a.join(b, "lane")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(
            (
                F.sum(
                    F.when(F.col("mn_a") == F.col("mn_b"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("est_jaccard")
        )
    )


def cms_frequencies(
    df: DataFrame,
    col: str,
    probe_items: Sequence,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Point-query frequency estimates from a Count-Min sketch — the
    mergeable frequency summary for when you need counts of SPECIFIC items
    (blocklist hit rates, known-boilerplate tallies) without a groupBy
    over the whole domain.

    Uses Spark's built-in JVM CMS (`df.stat.countMinSketch`): depth/width
    from (eps, confidence), built distributively with executor-side merges
    — the driver holds one width×depth int table (the documented bounded
    index-build contract). Estimates OVERCOUNT only: true ≤ est ≤
    true + eps·N with the given confidence (pinned in tests).

    Returns (item, est_n) for the probe items, as a small local-relation
    DataFrame (probe lists are human-sized; the heavy work was the one
    corpus pass that built the sketch).

    Classic (py4j) deployments only — Spark Connect has no stat handle
    for CMS; the guard below raises a clear RuntimeError there."""
    if not probe_items:
        raise ValueError("probe_items must be non-empty")
    # PySpark 4 no longer wraps DataFrameStatFunctions.countMinSketch;
    # the JVM implementation is still there — call it through the handle
    # (classic driver-side py4j, fine for a bounded index-build step).
    # CLASSIC-ONLY: under Spark Connect there is no _jdf handle and no
    # public probe API for the count_min_sketch() aggregate's binary
    # payload — fail with a actionable message instead of AttributeError.
    jdf = getattr(df, "_jdf", None)
    if jdf is None:
        raise RuntimeError(
            "cms_frequencies requires a classic (py4j) SparkSession: it "
            "probes the JVM CountMinSketch via DataFrameStatFunctions, "
            "which Spark Connect does not expose. On Connect, use "
            "heavy_hitters_exact / heavy_hitters_mg for frequency "
            "queries, or an exact filtered groupBy for a fixed probe set."
        )
    jsketch = jdf.stat().countMinSketch(
        col, float(eps), float(confidence), int(seed)
    )
    rows = [
        (item, int(jsketch.estimateCount(item))) for item in probe_items
    ]
    return df.sparkSession.createDataFrame(rows, [col, "est_n"])


def corpus_stats_state(
    df: DataFrame,
    text_col: str = "text",
    num_lanes: int = 8,
) -> DataFrame:
    """One-row MERGEABLE corpus-statistics state: doc/char/token counts,
    token min/max, and a `num_lanes`-lane md5 min-hash over normalized-
    content fingerprints (the engine-neutral distinct-content sketch of
    group_minhash_overlap, reduced to one global group).

    Every field is algebraic — counts and sums add, min/max compose, and
    lane minimums compose under MIN — so states computed per ingestion
    batch (per day, per source, per partition) merge into the exact
    state of the union WITHOUT rescanning history. That is the 100 TB
    contract: corpus-level reporting becomes O(batches) arithmetic on
    constant-size rows instead of an O(corpus) rescan; the merge
    identity (state(A ∪ B) = merge(state(A), state(B)), disjoint
    inputs) is oracle-checked end-to-end by the x_mergeable_stats entry.

    Columns: n_docs, n_chars, n_tokens, min_tokens, max_tokens,
    lane_0..lane_{k-1} (md5 hex strings — lexicographic MIN is
    consistent across engines on the hex charset).
    """
    from purescript_ifrit_spark.functions.text import (
        fingerprint,
        token_count,
    )

    ntok = token_count(F.col(text_col))
    fp = fingerprint(F.col(text_col))
    base = df.select(
        F.length(F.col(text_col)).alias("_chars"),
        ntok.alias("_ntok"),
        fp.alias("_fp"),
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_chars").cast("long").alias("n_chars"),
        F.sum("_ntok").cast("long").alias("n_tokens"),
        F.min("_ntok").cast("long").alias("min_tokens"),
        F.max("_ntok").cast("long").alias("max_tokens"),
    ]
    for i in range(num_lanes):
        aggs.append(
            F.min(
                F.md5(F.concat(F.col("_fp"), F.lit(f":{i}")))
            ).alias(f"lane_{i}")
        )
    return base.agg(*aggs)


def merge_corpus_states(*states: DataFrame) -> DataFrame:
    """Merge any number of corpus_stats_state rows into the state of the
    union: ONE union + ONE aggregation — counts/sums re-add, min/max and
    lane minimums re-compose (MIN of MINs over disjoint inputs is the
    global MIN). The aggregation IS the merge; no custom combiner, no
    rescan of any input corpus. Merging zero-doc states is well-defined
    (identity elements: 0 for sums, NULL-skipped for min/max/lanes)."""
    if not states:
        raise ValueError("merge_corpus_states needs at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    lane_cols = [c for c in u.columns if c.startswith("lane_")]
    return u.agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.min("min_tokens").cast("long").alias("min_tokens"),
        F.max("max_tokens").cast("long").alias("max_tokens"),
        *[F.min(c).alias(c) for c in lane_cols],
    )
