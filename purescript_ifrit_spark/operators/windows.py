"""Event-stream analytics over the batch `events` table: tumbling windows,
sessionization, top-k per group. The streaming twins live in
purescript_ifrit_spark/streaming/.

Scale notes: tumbling aggregation is one shuffle on (window, type);
sessionization is one shuffle on user_id then a linear in-partition pass —
both hold at 1000 executors as long as no single user/window dominates
(AQE skew handling covers the rest).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    unit: str = "hour",
    keys: tuple = ("event_type",),
) -> DataFrame:
    """Counts + value sums per tumbling window per key. date_trunc keeps it
    oracle-comparable; the streaming twin uses F.window."""
    return (
        df.groupBy(
            F.date_trunc(unit, F.col(ts_col)).alias("window_start"),
            *[F.col(k) for k in keys],
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Classic gap-based sessionization: a new session starts when the gap
    to the previous event of the same user exceeds `gap_minutes`.

    One shuffle (partition by user), then lag + cumulative sum — both
    computed in a single window pass. `tiebreak_col` makes ordering
    deterministic for equal timestamps; it is skipped if absent from df."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col and tiebreak_col in df.columns:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    # microsecond gap arithmetic: unix_timestamp() truncates to whole
    # seconds, which shifts session boundaries for sub-second timestamps.
    # cast("timestamp") makes this NTZ-safe (no-op on TimestampType; the
    # session tz is pinned UTC so the NTZ cast is value-preserving)
    gap_us = F.lit(gap_minutes * 60 * 1_000_000)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_ts = F.lag(F.col(ts_col).cast("timestamp")).over(w)
    new_session = (
        prev_ts.isNull() | ((ts_us - F.unix_micros(prev_ts)) > gap_us)
    ).cast("int")
    return df.withColumn("_new", new_session).withColumn(
        "session_id",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("_new")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Sessions with their length and event count."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    # micros-precision duration (unix_timestamp truncates to whole seconds,
    # which zeroes out sub-second sessions — same rule as sessionize's gaps);
    # cast("timestamp") keeps it NTZ-safe like sessionize
    dur_us = F.unix_micros(
        F.max(F.col(ts_col).cast("timestamp"))
    ) - F.unix_micros(F.min(F.col(ts_col).cast("timestamp")))
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        (dur_us.cast("double") / 1_000_000.0).alias("duration_sec"),
    )


def topk_per_group(
    df: DataFrame, group_col: str, order_col: str, k: int, tiebreak_col: str
) -> DataFrame:
    """Deterministic top-k rows per group (window row_number — one shuffle,
    partial top-k pushed map-side by Spark's WindowGroupLimit)."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def distinct_users_windowed(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    *,
    period_us: int = 86_400_000_000,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Windowed distinct-user counts per event type — the DAU/WAU staple
    (VERDICT r4 #6): composes tumbling epoch bucketing (tz-free, same rule
    as retention_cohorts/xd_tumble) with exact or sketched cardinality.
    Returns (window_us, <type_col>, n_users); window_us is the bucket
    start in epoch micros (BIGINT — date_trunc would truncate in the
    session's LOCAL timezone and break cross-engine parity).

    Scale: exact mode shuffles distinct (bucket, type, user) triples —
    Spark plans count(DISTINCT) as a two-stage aggregate with map-side
    partial dedup, so the exchange carries each triple once, not each
    event; right for bounded windows. approx mode (HyperLogLog++,
    `rsd` relative error) merges constant-size sketches map-side and
    shuffles only (bucket, type, sketch) — the 100 TB path, and the only
    one that composes into rollups (sketches merge; exact counts don't
    add across windows)."""
    bucket = (
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(period_us)
        )
        * F.lit(period_us)
    ).cast("long")
    counter = (
        F.approx_count_distinct(user_col, rsd=rsd)
        if approx
        else F.count_distinct(F.col(user_col))
    )
    return df.groupBy(bucket.alias("window_us"), F.col(type_col)).agg(
        counter.cast("long").alias("n_users")
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    z: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier flags: |v − median| > z · MAD, where MAD is
    the median absolute deviation. Median/MAD resist the very outliers
    being hunted (a 3σ rule's mean and stddev are dragged by them), which
    is why monitoring pipelines flag on MAD, not z-scores.

    Determinism: values are rounded through DECIMAL(18,6) first so both
    engines interpolate over identical doubles; `percentile` is exact
    (not percentile_approx), and the even-count interpolation
    lower + (upper−lower)·0.5 matches DuckDB's quantile_cont. A group
    where every value equals the median has MAD 0 — then ANY deviation
    flags, the standard MAD-rule degeneracy.

    Scale: one shuffle — both window passes (median, then MAD over the
    derived deviations) share the same partitioning, so Catalyst plans a
    single exchange on the group key; exact percentile holds a group's
    values in memory, fine for per-entity groups (bounded fan-in), wrong
    for global percentiles — use approx_percentile/equidepth there."""
    w = Window.partitionBy(group_col)
    v = F.col(value_col).cast("decimal(18,6)").cast("double")
    med = F.percentile(v, F.lit(0.5)).over(w)
    staged = df.withColumn("_v", v).withColumn("_med", med)
    mad = F.percentile(F.abs(F.col("_v") - F.col("_med")), F.lit(0.5)).over(w)
    out = staged.withColumn("_mad", mad)
    return out.select(
        *df.columns,
        F.col("_med").alias("med"),
        F.col("_mad").alias("mad"),
        (F.abs(F.col("_v") - F.col("_med")) > F.lit(z) * F.col("_mad")).alias(
            "is_outlier"
        ),
    )


def ohlc_bars(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    *,
    period_us: int = 3_600_000_000,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Open/high/low/close bars per key per tumbling window — the
    hypertable downsampling staple. open/close are the values at the
    min/max timestamp in the bucket (tiebreak col makes equal-timestamp
    buckets deterministic); high/low are plain min/max.

    Scale: ONE hash aggregation on (bucket, key) — open/close use
    min_by/max_by over a (ts, tiebreak) struct, so no window pass and no
    second shuffle; map-side partials carry one candidate row per
    (bucket, key) per partition."""
    bucket = (
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(period_us)
        )
        * F.lit(period_us)
    ).cast("long")
    order = F.struct(
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(tiebreak_col).alias("tb"),
    )
    v = F.col(value_col).cast("double")
    return df.groupBy(bucket.alias("window_us"), F.col(key_col)).agg(
        F.min_by(v, order).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, order).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


def moving_avg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    *,
    n_preceding: int = 5,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-key trailing moving average over the current + `n_preceding`
    prior events in time order — the smoothing pass of every metrics
    pipeline. DECIMAL(18,6) accumulation keeps the windowed sums exact
    and order-independent (the same rule as every decimal-sum oracle
    entry), then one double division.

    Scale: one shuffle on the key; the frame is ROWS-bounded so window
    state is n_preceding+1 values per key regardless of key size."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(-n_preceding, Window.currentRow)
    )
    dec = F.col(value_col).cast("decimal(18,6)")
    # denominator counts VALUES, not rows (r8 review): sum() skips NULL
    # values, so dividing by the row count biased the average low on any
    # frame containing NULLs; an all-NULL frame yields NULL (NULL sum)
    return df.withColumn(
        "mavg",
        (F.sum(dec).over(w).cast("double") / F.count(dec).over(w)),
    )


def hopping_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    *,
    size_us: int = 3_600_000_000,
    slide_us: int = 900_000_000,
) -> DataFrame:
    """Hopping (sliding/overlapping) window aggregation: counts + exact
    value sums per `size_us` window advancing every `slide_us`, per key —
    the moving-rate companion of `tumbling_agg` (a 1h window every 15min
    answers 'requests in the last hour' at 15-minute resolution). Windows
    are epoch-aligned (tz-free) like every bucketing op here.

    `size_us` must be a multiple of `slide_us` (aligned hops — the
    streaming twin, F.window(size, slide), has the same constraint in
    effect because state is keyed per window start).

    Scale: each event expands to exactly size/slide (window_start) rows
    scan-stage via `sequence` — a bounded constant fan-out (4 here), NOT
    a range join — then one hash aggregation on (window_start, key) with
    map-side partials; decimal sums keep cross-engine exactness."""
    if size_us <= 0 or slide_us <= 0 or size_us % slide_us != 0:
        raise ValueError(
            f"size_us ({size_us}) must be a positive multiple of "
            f"slide_us ({slide_us})"
        )
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    last = (F.floor(ts_us / F.lit(slide_us)) * F.lit(slide_us)).cast("long")
    first = last - F.lit(int(size_us - slide_us))
    starts = F.sequence(first, last, F.lit(int(slide_us)))
    return (
        df.withColumn("_ws", F.explode(starts))
        .groupBy(F.col("_ws").alias("window_us"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def value_histogram(
    df: DataFrame,
    value_col: str = "value",
    *,
    bin_width: float = 10.0,
    group_col: str | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column (optionally per group):
    (bin_lo, n) where bin_lo = floor(v / width) * width — the profiling
    staple next to the equi-depth buckets operator (fixed-width answers
    'what does the distribution look like', equi-depth 'where are the
    cut points'). NULLs are excluded (they have no bin).

    Determinism: floor of one IEEE division is bit-identical across
    engines; bin ids are BIGINT. Scale: one hash aggregation, map-side
    partials; output is O(range / width) rows."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive (got {bin_width})")
    v = F.col(value_col).cast("double")
    b = F.floor(v / F.lit(float(bin_width))).cast("long")
    keys = ([F.col(group_col)] if group_col else []) + [
        b.alias("bin"),
        (b * F.lit(float(bin_width))).alias("bin_lo"),
    ]
    return (
        # NaN passes isNotNull but floor(NaN)::long is 0 — it would be
        # silently filed into bin 0 (r8 review); like NULL, it has no bin
        df.filter(v.isNotNull() & ~F.isnan(v))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .drop("bin")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: Optional[str] = None,
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Clip a numeric column to its (per-group) [lower, upper] exact
    percentiles — winsorization, the feature-prep step that tames heavy
    tails without dropping rows (robust_outliers FLAGS; this one CLAMPS).

    Adds `<value_col>_clipped`. Exact interpolating percentiles (the same
    `percentile` the suite's oracle twins via quantile_cont), computed in
    one aggregation per group and broadcast back — the corpus-side cost is
    one scan-stage least/greatest after a broadcast join; no window, no
    per-row sort. Groups must be coarse (types, sources) — the percentile
    buffer is per group, the same envelope the exact-percentile entry
    documents."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1 (got {lower}, {upper})")
    # Column reference, not raw-name interpolation into F.expr (r8
    # review: a space/reserved-word column name broke the parse, and a
    # crafted name could inject into the aggregate)
    pcts = F.percentile(
        F.col(value_col), F.array(F.lit(float(lower)), F.lit(float(upper)))
    )
    if group_col is None:
        bounds = df.agg(
            pcts[0].alias("_lo"), pcts[1].alias("_hi")
        )
        joined = df.crossJoin(F.broadcast(bounds))
    else:
        # eqNullSafe join (r8 review): a plain equi-join dropped every
        # NULL-group row from the OUTPUT — "without dropping rows" is
        # the operator's contract, and groupBy had computed NULL-group
        # bounds anyway
        bounds = df.groupBy(
            F.col(group_col).alias("_wg")
        ).agg(pcts[0].alias("_lo"), pcts[1].alias("_hi"))
        joined = df.join(
            F.broadcast(bounds),
            F.col(group_col).eqNullSafe(F.col("_wg")),
        ).drop("_wg")
    # NULL values stay NULL (r8 review): greatest/least SKIP null
    # arguments, so a missing value was silently fabricated into the
    # lower bound
    clipped = F.when(
        F.col(value_col).isNotNull(),
        F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi")),
    )
    return joined.withColumn(
        f"{value_col}_clipped", clipped
    ).drop("_lo", "_hi")


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: Optional[str] = None,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Rank-based quantile normalization: replace each value by its
    within-group percent rank in [0, 1] — the scale-free normalization
    that survives arbitrary monotone distortions of the raw metric
    (cross-source score calibration: a 0.9 means "top decile WITHIN its
    source" everywhere).

    One window per group (single exchange); ties share a rank
    (percent_rank semantics), which is what makes the transform
    deterministic without a tiebreaker column.

    `group_col=None` is a GLOBAL rank — a SinglePartition window, the
    one plan shape this package otherwise avoids. It exists for small
    frames (calibration tables, per-batch scoring); at corpus scale
    always pass a group, or rank against a sampled quantile table
    instead (the winsorize bounds pattern)."""
    out_col = out_col or f"{value_col}_qn"
    w = (
        Window.partitionBy(group_col) if group_col is not None
        else Window.partitionBy()
    ).orderBy(F.col(value_col).asc())
    # NULL values propagate as NULL and are EXCLUDED from the ranked
    # frame (r8 review: NULLs sorted first used to take percent_rank
    # 0.0 — indistinguishable from the group minimum — while shifting
    # every real value's rank). Split-rank-union: the window runs on
    # the non-NULL branch only, same single exchange.
    nn = df.filter(F.col(value_col).isNotNull()).withColumn(
        out_col, F.percent_rank().over(w)
    )
    nulls = df.filter(F.col(value_col).isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    return nn.unionByName(nulls)
