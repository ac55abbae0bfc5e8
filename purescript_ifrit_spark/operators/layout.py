"""Data-layout operators: Z-order clustering keys, file-skipping
effectiveness reports, and key-skew profiling.

At 100 TB the dominant query cost is the scan, and the dominant scan
optimization is *not reading* files: Parquet footers carry per-column
min/max, and a reader prunes any file whose [min,max] cannot intersect
the predicate. How much pruning a layout buys is decided entirely at
WRITE time by the sort key. These operators make that decision
measurable inside the engine:

- `zorder_key`: bit-interleaved composite key (Morton order) over 2+
  integer dimensions. Sorting by it clusters data so that EVERY
  interleaved dimension gets tight per-file min/max ranges, instead of
  only the leading column of a lexicographic sort. Pure built-in
  bitwise expressions (shiftright/AND/shiftleft/OR), whole-stage
  codegen'd, no UDF; tree size = bits·ndims leaves (default 16·2 = 32 —
  far below the ~400-node fresh-plan tax documented in SCALE.md).
- `layout_file_stats`: simulate writing the frame as `n_files` equal
  row-range files under a given sort key (deterministic row_number
  banding, NOT ntile — engines disagree on ntile remainder placement)
  and report each file's per-dimension min/max plus whether the file
  survives a rectangular predicate. sum(hit) / n_files IS the fraction
  of the corpus a query must read under that layout.
- `skew_profile`: per-key frequency profile of a prospective
  shuffle/partition key — distinct keys, max/avg frequency, the hottest
  key, and the salt factor that would level it. Two aggregations, both
  map-side combinable; the operator that tells you whether a join needs
  `operators/joins.salted_join` BEFORE the job runs.

The simulation is run at test SF on row banding; on a real cluster the
same report comes free from parquet footer stats — the *layout choice*
(which zorder_key makes expressible) is what carries to 100 TB.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of `len(cols)` non-negative integer
    dimensions, `bits` low bits each → one BIGINT clustering key.

    Bit i of dimension d lands at position i·ndims + d, so equal-weight
    prefixes of every dimension share key prefixes — the property that
    gives every dimension locality under one sort. Values are masked to
    `bits` (callers quantize wider domains first); bits·ndims must fit
    in the 63 usable bits of a signed BIGINT.

    Dimensions must be NON-NEGATIVE and the contract is ENFORCED
    in-plan (ADVICE r7): arithmetic shiftright keeps a negative value's
    low bits, which would scatter negatives to the top of the Z-curve
    and silently break the locality the key exists for — a negative
    dimension fails the task (quantize/offset first). NULL dimensions
    pass through to a NULL key, as before.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs >= 2 dimensions")
    if bits * n > 63:
        raise ValueError(f"bits*ndims = {bits * n} exceeds BIGINT range")
    nonneg = F.lit(True)
    for c in cols:
        # NULL stays NULL-transparent: coalesce keeps the guard quiet so
        # a NULL dim yields a NULL key (pre-guard behavior), not an error
        nonneg = nonneg & F.coalesce(c.cast("long") >= 0, F.lit(True))
    guard = F.assert_true(
        nonneg,
        F.concat_ws(
            " ",
            F.lit(
                "zorder_key: negative dimension value (contract: "
                "non-negative — offset/quantize first):"
            ),
            *[c.cast("long").cast("string") for c in cols],
        ),
    )
    z = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        v = c.cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)),
                            i * n + d)
            )
    # the guard rides the CONSUMED expression (assert_true in a dropped
    # column would be pruned by Catalyst and never fire); NULL on pass
    return F.when(guard.isNull(), z)


def zorder_sql(names: Sequence[str], bits: int = 16) -> str:
    """The identical interleave as ANSI SQL (DuckDB oracle twin of
    zorder_key — generated from the same loop so the two can never
    drift). The non-negativity guard is mirrored too (r8 review: the
    Spark side failing loudly while the SQL twin silently scattered
    negatives was a backend parity break on exactly the input class the
    guard exists for): a negative dimension takes the CASE branch whose
    constant string-to-BIGINT cast raises on BOTH engines — the
    portable in-SQL assert (both DuckDB and ANSI Spark evaluate CASE
    branches lazily, verified, so non-negative rows never touch it)."""
    n = len(names)
    terms = [
        f"((({name} >> {i}) & 1) << {i * n + d})"
        for d, name in enumerate(names)
        for i in range(bits)
    ]
    neg = " OR ".join(f"({name}) < 0" for name in names)
    return (
        f"(CASE WHEN {neg} THEN "
        "CAST('zorder_key: negative dimension value (contract: "
        "non-negative)' AS BIGINT) "
        "ELSE (" + " | ".join(terms) + ") END)"
    )


def layout_file_stats(
    df: DataFrame,
    sort_key: Column,
    tiebreak: Column,
    dims: Dict[str, Column],
    n_files: int,
    query_box: Dict[str, Tuple[int, int]],
) -> DataFrame:
    """Per-file min/max + predicate-survival report for a simulated
    `n_files`-file layout of `df` sorted by (sort_key, tiebreak).

    file_id = (row_number()-1)·n_files / total_rows — deterministic
    equal-row banding. `tiebreak` MUST be unique per row: row_number
    over duplicate (sort_key, tiebreak) pairs is engine-nondeterministic
    and would let band boundaries drift between runs/engines. A file is `hit` when for EVERY dim named in
    `query_box`, [min(dim), max(dim)] intersects the box's closed
    [lo, hi] range. Output: file_id, <dim>_min/<dim>_max per dim, hit.

    Plan shape — read before pointing this at a full corpus: the global
    row numbering compiles to Exchange SinglePartition + one-task sort
    (a partition-less ordered window; a distributed global row-number
    needs range boundaries that are consistent across two jobs, which
    Spark's range sampler does not guarantee — per-exchange rdd-id
    seeds). This is a layout DIAGNOSTIC for samples / row-group stats /
    test-SF frames, not a data-path operator; on a real cluster the
    same report comes free from parquet footer min/max. total_rows is
    computed in the same window pass (count over the unbounded frame),
    so building the plan runs no eager job and the input is scanned
    once.
    """
    sel = [sort_key.alias("_k"), tiebreak.alias("_tb")] + [
        c.alias(d) for d, c in dims.items()
    ]
    base = df.select(*sel)
    w = Window.orderBy("_k", "_tb")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    banded = base.select(
        *[F.col(d) for d in dims],
        (F.row_number().over(w) - 1).cast("long").alias("_rn"),
        # same sort, second frame on the one Window exec: no eager
        # count() action, no second scan (empty frame => no rows, so the
        # division is never evaluated)
        F.count(F.lit(1)).over(wall).cast("long").alias("_total"),
    ).select(
        *[F.col(d) for d in dims],
        # integer div: float-divide-then-cast can cross a band boundary in
        # the last ulp and disagree with the oracle's //
        F.expr(f"(_rn * {n_files}) div _total").alias("file_id"),
    )
    aggs = []
    for d in dims:
        aggs.append(F.min(d).cast("long").alias(f"{d}_min"))
        aggs.append(F.max(d).cast("long").alias(f"{d}_max"))
    stats = banded.groupBy("file_id").agg(*aggs)
    hit = F.lit(True)
    for d, (lo, hi) in query_box.items():
        hit = hit & (F.col(f"{d}_max") >= lo) & (F.col(f"{d}_min") <= hi)
    return stats.select("file_id", *[c for d in dims
                                     for c in (f"{d}_min", f"{d}_max")],
                        hit.alias("hit"))


def layout_file_stats_sql(
    table_expr: str,
    sort_key_sql: str,
    tiebreak_sql: str,
    dims: Dict[str, str],
    n_files: int,
    query_box: Dict[str, Tuple[int, int]],
) -> str:
    """ANSI-SQL twin of layout_file_stats (same banding formula)."""
    dim_sel = ", ".join(f"{e} AS {d}" for d, e in dims.items())
    aggs = ", ".join(
        f"CAST(MIN({d}) AS BIGINT) AS {d}_min, "
        f"CAST(MAX({d}) AS BIGINT) AS {d}_max"
        for d in dims
    )
    hit = " AND ".join(
        f"({d}_max >= {lo} AND {d}_min <= {hi})"
        for d, (lo, hi) in query_box.items()
    )
    cols = ", ".join(c for d in dims for c in (f"{d}_min", f"{d}_max"))
    return (
        f"WITH b AS (SELECT {dim_sel}, "
        f"CAST((row_number() OVER (ORDER BY {sort_key_sql}, {tiebreak_sql})"
        f" - 1) * {n_files} // (SELECT count(*) FROM {table_expr}) "
        f"AS BIGINT) AS file_id FROM {table_expr}), "
        f"s AS (SELECT file_id, {aggs} FROM b GROUP BY file_id) "
        f"SELECT file_id, {cols}, ({hit}) AS hit FROM s"
    )


def skew_profile(df: DataFrame, key: Column) -> DataFrame:
    """One-row shuffle-key skew report: n_keys, rows_total, max_cnt,
    hottest key (lowest key value among those at max_cnt — deterministic
    under ties), skew_ratio·1e6 as integer micro-units (exact cross-
    engine: avoids float division), and the levelling salt factor
    ceil(max_cnt·n_keys / rows_total).

    Two hash aggregates (key counts → global stats), both partial-agg
    combinable; the second input is one row per distinct key.
    """
    counts = df.groupBy(key.alias("_key")).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    stats = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("_cnt").cast("long").alias("rows_total"),
        F.max("_cnt").cast("long").alias("max_cnt"),
        F.min_by(F.col("_key"), F.struct(-F.col("_cnt"), F.col("_key")))
        .alias("top_key"),
    )
    # integer division only — float division then cast truncates through a
    # double and can disagree with the oracle's // in the last unit. The
    # products run on DECIMAL(38,0): max_cnt*n_keys*1e6 wraps int64 already
    # at max_cnt=1e4, n_keys=1e10 (a plausible 100 TB key profile), while
    # the decimal form is exact to 38 digits on both engines
    return stats.select(
        "n_keys",
        "rows_total",
        "max_cnt",
        "top_key",
        F.expr(
            "CAST((CAST(max_cnt AS DECIMAL(38,0)) * n_keys * 1000000) "
            "div rows_total AS BIGINT)"
        ).alias("skew_micro"),
        F.expr(
            "CAST((CAST(max_cnt AS DECIMAL(38,0)) * n_keys + rows_total - 1) "
            "div rows_total AS BIGINT)"
        ).alias("salt_factor"),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    dims: Sequence[Column],
    *,
    bits: int = 16,
    n_files: int = 32,
    mode: str = "error",
) -> None:
    """Write `df` as parquet physically clustered by the Z-order key of
    `dims`: range-repartition on the key (one file per range, sizes
    balanced by Spark's range sampler) and sort within each partition,
    so every file covers a compact Morton range and its parquet footer
    min/max on EVERY interleaved dimension is tight. Readers filtering
    on ANY dim subset then skip most files/row-groups — the write-time
    half of the layout story layout_file_stats simulates
    (test_write_zordered_improves_file_skipping attests it on real
    files: matches concentrate into fewer files than a lexicographic
    sort for a secondary-dimension predicate)."""
    z = zorder_key(dims, bits)
    (
        df.withColumn("_zkey", z)
        .repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )
