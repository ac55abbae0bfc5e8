"""Temporal joins and rollups over event streams: as-of join, point-in-
interval range join, multi-resolution time rollup.

The reference has no joins at all (README.md:199; SURVEY §2.6) — these are
engine extensions in the same family as operators/joins.py, written for the
shapes Spark lacks as built-ins:

- `asof_join`: "latest right row at-or-before each left row" is not
  expressible as an equi-join. The scalable encoding is union + ONE window
  pass (partition by key, order by time, running last_value of the right
  payload) — a single hash exchange; NO join node, no per-row probe, no
  range explosion. This is how every columnar engine implements ASOF
  internally; Spark just lets us spell it with public operators.
- `range_join_points`: point-in-interval matching compiles to a *bucketed
  equi-join*: intervals are exploded onto the fixed-width time buckets they
  cover, points join on their single containing bucket, and the exact
  predicate filters residuals. One shuffle on (key, bucket); the cartesian
  product never appears. Interval replication = ceil(span/bucket_width),
  capped by `max_span_buckets` so one pathological interval cannot fan out
  unbounded (same guarded-default policy as dedup's bucket caps).
- `rollup_time`: hour/day/week aggregates in ONE scan and ONE shuffle via
  GROUPING SETS (physical plan: Expand → partial agg → exchange → final
  agg). The naive union-of-three-groupbys reads the fact table three times
  — at 100 TB that is the whole cost; Expand multiplies rows map-side only,
  and partial aggregation collapses them before anything moves.

All time arithmetic is tz-free epoch microseconds (unix_micros), matching
the suite's oracle precedent (suite.py x_events_hourly): date_trunc would
bucket in the session's local timezone and break cross-engine parity.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _us(c: Column, dtype) -> Column:
    """Epoch-microseconds view of a timestamp or numeric column.

    TIMESTAMP_NTZ (what pandas/pyarrow parquet writers emit by default) is
    accepted too: unix_micros only takes TIMESTAMP, so cast first — the
    cast interprets the wall-clock in the session timezone, which the
    engine pins to UTC (sources/tables.py load_table enforces the same
    contract). For TimestampType the cast is a no-op."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(c.cast("timestamp"))
    return c.cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: Optional[str] = None,
    payload: Optional[Sequence[str]] = None,
    direction: str = "backward",
    how: str = "left",
    tolerance_us: Optional[int] = None,
    right_tiebreak: Optional[str] = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the payload of the right row with the same
    `on` key and the greatest `right_ts` <= `left_ts` (direction="backward";
    "forward" = least right_ts >= left_ts). Equal timestamps match.

    Scale: union the two sides, ONE window partitioned by key ordered by
    (time, side) carrying a running last-non-null right payload — a single
    hash exchange + in-partition sort, linear state, no join node. Survives
    any left:right size ratio because neither side is replicated or probed.

    Determinism: if several right rows share (key, ts), pass
    `right_tiebreak` (a right column; the row with the greatest tiebreak
    wins under "backward", the least under "forward") or pre-dedupe.
    `how` is "left" (unmatched left rows keep null payload) or "inner".
    `tolerance_us` drops matches farther than that many microseconds away.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward (got {direction})")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner (got {how})")
    right_ts = right_ts or left_ts
    if payload is None:
        payload = [c for c in right.columns if c not in (on, right_ts)]

    # the side tag orders same-timestamp rows so that the right row is
    # inside the window frame of a left row at the identical timestamp
    l_side, r_side = (1, 0) if direction == "backward" else (0, 1)

    r_ts_type = right.schema[right_ts].dataType
    l_ts_type = left.schema[left_ts].dataType
    pay_struct = F.struct(
        F.col(right_ts).alias("__rt"), *[F.col(c) for c in payload]
    )
    # the tiebreak keeps its NATIVE type (a string cast would order numeric
    # tiebreaks lexicographically: '10' < '9'); the left side carries a
    # typed NULL so the union schemas line up
    tb_type = (
        right.schema[right_tiebreak].dataType if right_tiebreak else T.StringType()
    )
    r2 = (
        # NULL join keys never match (r8 review): the window encoding
        # PARTITIONS by key, and partitionBy groups NULLs together —
        # without this filter a NULL-key left row would take a NULL-key
        # right row's payload, diverging from equi-join semantics and
        # from the sibling range/interval joins. Filtering the RIGHT
        # side only keeps `how="left"` intact: NULL-key left rows
        # simply find no payload in their partition.
        right.filter(F.col(right_ts).isNotNull() & F.col(on).isNotNull())
        .select(
            F.col(on).alias("_k"),
            _us(F.col(right_ts), r_ts_type).alias("_t"),
            F.lit(r_side).alias("_side"),
            (
                F.col(right_tiebreak)
                if right_tiebreak
                else F.lit(None).cast(tb_type)
            ).alias("_tb"),
            pay_struct.alias("_rpay"),
        )
    )
    l2 = left.select(
        F.col(on).alias("_k"),
        _us(F.col(left_ts), l_ts_type).alias("_t"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    order = [F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc()]
    w = Window.partitionBy("_k").orderBy(*order)
    if direction == "backward":
        frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        matched = F.last("_rpay", ignorenulls=True).over(frame)
    else:
        frame = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        matched = F.first("_rpay", ignorenulls=True).over(frame)

    res = u.withColumn("_m", matched).filter(F.col("_lrow").isNotNull())

    if tolerance_us is not None:
        gap = F.col("_t") - _us(F.col("_m")["__rt"], r_ts_type)
        if direction == "forward":
            gap = -gap
        res = res.withColumn(
            "_m", F.when(gap <= F.lit(tolerance_us), F.col("_m"))
        )
    if how == "inner":
        res = res.filter(F.col("_m").isNotNull())

    def _out(c: str) -> str:
        return c + suffix if c in left.columns else c

    matched_ts_name = _out(right_ts)
    out_cols = [F.col("_lrow")[c].alias(c) for c in left.columns]
    out_cols.append(F.col("_m")["__rt"].alias(matched_ts_name))
    out_cols += [F.col("_m")[c].alias(_out(c)) for c in payload]
    return res.select(*out_cols)


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width_us: int = 3_600_000_000,
    payload: Optional[Sequence[str]] = None,
    max_span_buckets: int = 1024,
    suffix: str = "_r",
    on_over_span: str = "error",
) -> DataFrame:
    """Inner-join each point row to every interval row with the same `on`
    key satisfying start <= ts < end (end-exclusive).

    Scale: intervals are exploded onto the `bucket_width_us`-wide time
    buckets they overlap; a point lives in exactly one bucket, so the match
    is a plain shuffled equi-join on (key, bucket) + a residual filter — no
    BroadcastNestedLoop/cartesian ever. Each match is produced exactly once
    (the point's bucket is unique). Pick `bucket_width_us` near the typical
    interval span: replication per interval is ceil(span/width) (+1 for
    alignment). Intervals of `max_span_buckets` or more buckets FAIL THE
    TASK via an in-plan assert_true (r8 review: the module's loud-guard
    policy — interval_join's docstring names this exact silent filter as
    data loss, and the sibling kept it); pass on_over_span="drop" to opt
    into dropping such intervals whole, or raise max_span_buckets for
    genuinely long-lived intervals.
    """
    if bucket_width_us <= 0:
        raise ValueError(f"bucket_width_us must be positive (got {bucket_width_us})")
    if on_over_span not in ("error", "drop"):
        raise ValueError(
            f"on_over_span must be 'error' or 'drop' (got {on_over_span!r})"
        )
    if payload is None:
        payload = [
            c for c in intervals.columns if c not in (on, start_col, end_col)
        ]

    p_us = _us(F.col(ts_col), points.schema[ts_col].dataType)
    s_us = _us(F.col(start_col), intervals.schema[start_col].dataType)
    e_us = _us(F.col(end_col), intervals.schema[end_col].dataType)
    W = F.lit(bucket_width_us)

    def _out(c: str) -> str:
        return c + suffix if c in points.columns else c

    i2 = (
        intervals.filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
        .filter(e_us > s_us)  # empty/inverted intervals match nothing
        .withColumn("_b0", F.floor(s_us / W))
        .withColumn("_b1", F.floor((e_us - F.lit(1)) / W))
    )
    if on_over_span == "drop":
        i2 = i2.filter(
            (F.col("_b1") - F.col("_b0")) < F.lit(max_span_buckets)
        )
        b1 = F.col("_b1")
    else:
        # loud guard riding the CONSUMED expression (the interval_join /
        # fill_gaps_locf pattern): assert_true returns NULL on pass
        span_ok = F.assert_true(
            (F.col("_b1") - F.col("_b0")) < F.lit(max_span_buckets),
            F.concat(
                F.lit(
                    "range_join_points: interval spans >= "
                    f"max_span_buckets={max_span_buckets} buckets of "
                    f"{bucket_width_us}us (its point matches would drop "
                    "silently) — raise max_span_buckets or pass "
                    "on_over_span='drop'; key "
                ),
                F.col(on).cast("string"),
            ),
        )
        b1 = F.when(span_ok.isNull(), F.col("_b1"))
    i2 = (
        i2.withColumn("_b", F.explode(F.sequence(F.col("_b0"), b1)))
        .select(
            F.col(on).alias("_ik"),
            F.col("_b"),
            F.struct(
                s_us.alias("__s"),
                e_us.alias("__e"),
                *[F.col(c) for c in payload],
            ).alias("_ipay"),
        )
    )
    p2 = points.withColumn("_b", F.floor(p_us / W)).withColumn("_pus", p_us)
    joined = p2.join(
        i2,
        (p2[on] == i2["_ik"]) & (p2["_b"] == i2["_b"]),
        "inner",
    ).filter(
        (F.col("_pus") >= F.col("_ipay")["__s"])
        & (F.col("_pus") < F.col("_ipay")["__e"])
    )
    out_cols = [F.col(c) for c in points.columns]
    out_cols.append(F.col("_ipay")["__s"].alias(_out(start_col + "_us")))
    out_cols.append(F.col("_ipay")["__e"].alias(_out(end_col + "_us")))
    out_cols += [F.col("_ipay")[c].alias(_out(c)) for c in payload]
    return joined.select(*out_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width_us: int = 3_600_000_000,
    payload: Optional[Sequence[str]] = None,
    max_span_buckets: int = 1024,
    suffix: str = "_r",
    on_over_span: str = "error",
) -> DataFrame:
    """Interval-OVERLAP join: inner-join each left interval to every
    right interval with the same `on` key where the half-open ranges
    intersect (l_start < r_end AND r_start < l_end) — the two-sided
    sibling of range_join_points (sessions × incident windows, ad slots
    × impressions, shift × outage overlap).

    Scale: BOTH sides explode onto the fixed-width buckets they cover
    and equi-join on (key, bucket) — never a cartesian. A pair of
    overlapping intervals shares every bucket their intersection
    touches, so matches are attributed EXACTLY ONCE at the bucket of
    the intersection's start, max(l_start, r_start) (both sides emit
    that bucket: it is >= each side's start and < each side's end by
    the overlap predicate) — no dropDuplicates pass. Replication per
    row = ceil(span/width). Spans of `max_span_buckets` or more buckets
    FAIL THE TASK via an in-plan assert_true (the module's loud-guard
    policy, ADVICE r7: a silent filter here loses the wide row's
    matches with no signal — the fill_gaps_locf precedent); pass
    on_over_span="drop" to opt into dropping such rows whole, or raise
    max_span_buckets for genuinely long intervals. Empty/inverted
    intervals match nothing.
    """
    if bucket_width_us <= 0:
        raise ValueError(
            f"bucket_width_us must be positive (got {bucket_width_us})"
        )
    if on_over_span not in ("error", "drop"):
        raise ValueError(
            f"on_over_span must be 'error' or 'drop' (got {on_over_span!r})"
        )
    if payload is None:
        payload = [
            c for c in right.columns if c not in (on, r_start, r_end)
        ]

    W = F.lit(bucket_width_us)

    def _banded(df, s_col, e_col, key_alias, pay_cols):
        s_us = _us(F.col(s_col), df.schema[s_col].dataType)
        e_us = _us(F.col(e_col), df.schema[e_col].dataType)
        banded = (
            df.filter(F.col(s_col).isNotNull() & F.col(e_col).isNotNull())
            .filter(e_us > s_us)
            .withColumn("_b0", F.floor(s_us / W))
            .withColumn("_b1", F.floor((e_us - F.lit(1)) / W))
        )
        if on_over_span == "drop":
            banded = banded.filter(
                (F.col("_b1") - F.col("_b0")) < F.lit(max_span_buckets)
            )
            b1 = F.col("_b1")
        else:
            # loud guard (fill_gaps_locf pattern): assert_true returns
            # NULL on pass and must ride the CONSUMED expression — in a
            # dropped column Catalyst would prune it and it'd never fire
            span_ok = F.assert_true(
                (F.col("_b1") - F.col("_b0")) < F.lit(max_span_buckets),
                F.concat(
                    F.lit(
                        "interval_join: interval spans >= "
                        f"max_span_buckets={max_span_buckets} buckets of "
                        f"{bucket_width_us}us (its matches would drop "
                        "silently) — raise max_span_buckets or pass "
                        "on_over_span='drop'; key "
                    ),
                    F.col(on).cast("string"),
                ),
            )
            b1 = F.when(span_ok.isNull(), F.col("_b1"))
        return (
            banded.withColumn("_b", F.explode(F.sequence(F.col("_b0"), b1)))
            .select(
                F.col(on).alias(key_alias),
                "_b",
                F.struct(
                    s_us.alias("__s"), e_us.alias("__e"),
                    *[F.col(c) for c in pay_cols],
                ).alias(key_alias + "pay"),
            )
        )

    l2 = _banded(left, l_start, l_end, "_lk",
                 [c for c in left.columns if c not in (on, l_start, l_end)])
    r2 = _banded(right, r_start, r_end, "_rk", list(payload))
    ls, le = F.col("_lkpay")["__s"], F.col("_lkpay")["__e"]
    rs, re_ = F.col("_rkpay")["__s"], F.col("_rkpay")["__e"]
    joined = (
        l2.join(r2, (l2["_lk"] == r2["_rk"]) & (l2["_b"] == r2["_b"]))
        .filter((ls < re_) & (rs < le))
        # exactly-once attribution: only the intersection-start bucket
        .filter(l2["_b"] == F.floor(F.greatest(ls, rs) / W))
    )

    left_pay = [c for c in left.columns if c not in (on, l_start, l_end)]
    left_names = {on, l_start + "_us", l_end + "_us", *left_pay}

    def _out(c: str) -> str:
        # suffix right-side names that collide with an EMITTED left name
        # (same start/end col names on both sides collide as <c>_us)
        return c + suffix if c in left_names else c

    out_cols = [F.col("_lk").alias(on)]
    out_cols.append(ls.alias(l_start + "_us"))
    out_cols.append(le.alias(l_end + "_us"))
    out_cols += [F.col("_lkpay")[c].alias(c) for c in left_pay]
    out_cols.append(rs.alias(_out(r_start + "_us")))
    out_cols.append(re_.alias(_out(r_end + "_us")))
    out_cols += [F.col("_rkpay")[c].alias(_out(c)) for c in payload]
    return joined.select(*out_cols)


def fill_gaps_locf(
    df: DataFrame,
    keys: Sequence[str],
    bucket_col: str,
    value_cols: Sequence[str],
    bucket_width_us: int,
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """Calendar densification + last-observation-carried-forward over a
    per-key bucketed time series (one row per (keys, bucket), e.g.
    tumbling_agg output): emit EVERY bucket between each key's first and
    last observation, `<v>` NULL on the gap rows and `<v>_filled` = the
    most recent non-null observation — the gap-filling/interpolate
    surface of a time-series store, as a composition of sequence(),
    posexplode and one ignoreNulls window.

    Scale: one keys-aggregate (min/max bucket — map-side combinable),
    the dense grid generated by explode (rows = buckets in span, never
    a time-dimension join), one left join back on (keys, bucket) — AQE
    broadcasts the sparse side when small — and ONE keys-partitioned
    window for the fill. A key whose span exceeds `max_buckets_per_key`
    fails the TASK via assert_true rather than silently exploding
    (densification output is span-sized by design — a sensor with one
    reading in 1970 and one today would dominate the output; the guard
    makes that a loud error, not an OOM)."""
    if bucket_width_us <= 0:
        raise ValueError(
            f"bucket_width_us must be positive (got {bucket_width_us})"
        )
    kcols = list(keys)
    W = F.lit(bucket_width_us)
    span = df.groupBy(*kcols).agg(
        F.min(bucket_col).alias("_b0"),
        F.max(bucket_col).alias("_b1"),
        # phase check: the grid is the (_b0 + k·W) lattice, so an
        # observation off that lattice (mixed bucket widths, shifted
        # phases) would silently vanish in the join-back — the module's
        # loud-guard policy says that is an ERROR, not data loss.
        # pmod, not %: Spark's % follows the dividend sign, so a valid
        # series straddling epoch 0 ([-5, 5] at width 10) would read
        # phases {-5, 5} and spuriously fail
        F.min(F.pmod(F.col(bucket_col), W)).alias("_ph0"),
        F.max(F.pmod(F.col(bucket_col), W)).alias("_ph1"),
    )
    # the guards ride INSIDE the consumed expression (assert_true in a
    # dropped column would be pruned by Catalyst and never fire):
    # assert_true returns NULL on pass, so isNull gates _b1 through
    span_ok = F.assert_true(
        ((F.col("_b1") - F.col("_b0")) / W) < F.lit(max_buckets_per_key),
        F.concat(
            F.lit(
                "fill_gaps_locf: key span exceeds "
                f"max_buckets_per_key={max_buckets_per_key} buckets: "
            ),
            *[F.col(c).cast("string") for c in kcols],
        ),
    )
    phase_ok = F.assert_true(
        F.col("_ph0") == F.col("_ph1"),
        F.concat(
            F.lit(
                "fill_gaps_locf: buckets are not on one "
                f"width-{bucket_width_us} lattice (mixed phases — an "
                "off-lattice observation would silently drop): "
            ),
            *[F.col(c).cast("string") for c in kcols],
        ),
    )
    b1_guarded = F.when(span_ok.isNull() & phase_ok.isNull(), F.col("_b1"))
    grid = span.select(
        *kcols,
        F.explode(F.sequence(F.col("_b0"), b1_guarded, W)).alias(bucket_col),
    )
    dense = grid.join(df, [*kcols, bucket_col], "left")
    w = (
        Window.partitionBy(*kcols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out_cols = [F.col(c) for c in (*kcols, bucket_col, *value_cols)]
    out_cols += [
        F.last(v, ignorenulls=True).over(w).alias(f"{v}_filled")
        for v in value_cols
    ]
    return dense.select(*out_cols)


def time_weighted_avg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket_width_us: int,
) -> DataFrame:
    """Time-weighted average per (keys, bucket) over an IRREGULARLY
    sampled series: each observation holds its value from its timestamp
    until the next observation of the same key or the bucket end,
    whichever comes first — the aggregate a plain AVG gets wrong the
    moment sampling is uneven (a sensor that reports once per hour and
    once per second must not weight those readings equally).

    Semantics: weight_i = min(next_ts, bucket_end) − ts_i (microseconds;
    no cross-bucket carry — the stretch before a bucket's first
    observation is uncovered, reported via covered_us so callers can
    filter thin buckets). Timestamps MUST be unique per key (pre-
    aggregate duplicates first): lead() over tied order keys is engine-
    nondeterministic and would split weights arbitrarily. The weighted
    sum runs on DECIMAL(18,6)·BIGINT (exact, order-independent — the
    repo's decimal-sum contract) with ONE double division at the end.

    Plan: one keys exchange (lead window), then the (keys, bucket)
    aggregate — map-side combinable. Output: keys…, bucket_us, n_obs,
    covered_us, twap (NULL when covered_us = 0)."""
    if bucket_width_us <= 0:
        raise ValueError(
            f"bucket_width_us must be positive (got {bucket_width_us})"
        )
    kcols = list(keys)
    W = F.lit(bucket_width_us)
    us = _us(F.col(ts_col), df.schema[ts_col].dataType)
    w = Window.partitionBy(*kcols).orderBy(F.col("_t").asc())
    rows = df.select(
        *kcols,
        us.alias("_t"),
        F.col(value_col).alias("_v"),
    ).withColumn("_nxt", F.lead("_t").over(w))
    b = F.floor(F.col("_t") / W)
    bucket_end = (b + 1) * W
    w_us = F.least(F.coalesce(F.col("_nxt"), bucket_end), bucket_end) - F.col(
        "_t"
    )
    weighted = rows.select(
        *kcols,
        (b * W).cast("long").alias("bucket_us"),
        F.col("_v"),
        w_us.cast("long").alias("_w"),
    )
    dec_sum = F.sum(F.col("_v").cast("decimal(18,6)") * F.col("_w"))
    return (
        weighted.groupBy(*kcols, "bucket_us")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.sum("_w").cast("long").alias("covered_us"),
            dec_sum.alias("_ws"),
        )
        .select(
            *kcols,
            "bucket_us",
            "n_obs",
            "covered_us",
            F.when(
                F.col("covered_us") > 0,
                F.round(
                    F.col("_ws").cast("double") / F.col("covered_us"), 6
                ),
            ).alias("twap"),
        )
    )


def fill_gaps_interp(
    df: DataFrame,
    keys: Sequence[str],
    bucket_col: str,
    value_cols: Sequence[str],
    bucket_width_us: int,
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """Calendar densification + LINEAR interpolation: like
    fill_gaps_locf, but each gap row's `<v>_interp` is the straight line
    between the surrounding observations — (pv·(nt−t) + nv·(t−pt)) /
    (nt−pt), operands cast to DOUBLE before the products so the
    arithmetic is bit-identical on any IEEE engine (the tf-idf
    rational-score precedent). Rows before the first / after the last
    observation fall back to the nearest observation (the grid never
    extends past them, but a value column can lead/trail with nulls);
    observed rows pass through exactly.

    Same plan as fill_gaps_locf plus one extra window direction: the
    backward anchors ride the unboundedPreceding frame, the forward
    anchors the unboundedFollowing frame — still ONE keys exchange
    (both windows share the partitioning and sort)."""
    locf = fill_gaps_locf(
        df, keys, bucket_col, value_cols, bucket_width_us,
        max_buckets_per_key,
    ).drop(*[f"{v}_filled" for v in value_cols])
    kcols = list(keys)
    wb = (
        Window.partitionBy(*kcols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*kcols)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.col(bucket_col)
    out = locf
    for v in value_cols:
        obs_t = F.when(F.col(v).isNotNull(), t)
        pv = F.last(v, ignorenulls=True).over(wb)
        pt = F.last(obs_t, ignorenulls=True).over(wb)
        nv = F.first(v, ignorenulls=True).over(wf)
        nt = F.first(obs_t, ignorenulls=True).over(wf)
        interp = (
            F.when(F.col(v).isNotNull(), F.col(v).cast("double"))
            .when(
                pv.isNotNull() & nv.isNotNull() & (nt > pt),
                (
                    pv.cast("double") * (nt - t)
                    + nv.cast("double") * (t - pt)
                )
                / (nt - pt),
            )
            .otherwise(F.coalesce(pv, nv).cast("double"))
        )
        out = out.withColumn(f"{v}_interp", interp)
    return out


# (grain label, bucket width in epoch microseconds); each width must divide
# the next for the grouping-set buckets to nest (not required by the math,
# just the convention users expect from hour/day/week)
DEFAULT_GRAINS: Tuple[Tuple[str, int], ...] = (
    ("hour", 3_600_000_000),
    ("day", 86_400_000_000),
    ("week", 604_800_000_000),
)


def rollup_time(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value_col: str,
    grains: Sequence[Tuple[str, int]] = DEFAULT_GRAINS,
) -> DataFrame:
    """Tumbling-window aggregates at several grains at once (the hypertable
    "continuous aggregate" shape): per (grain, bucket, *keys) row count,
    exact value sum, and mean.

    Scale: ONE scan + ONE shuffle for all grains — the grain buckets are
    precomputed as columns and aggregated under GROUPING SETS, so the
    physical plan is Expand (×len(grains), map-side only) → partial
    HashAggregate → exchange → final HashAggregate. The union-of-groupbys
    alternative scans the fact table len(grains) times.

    Buckets are tz-free epoch-microsecond floors; `sum_value` goes through
    DECIMAL(18,6) so it is exact and summation-order-independent (suite
    precedent, x_events_hourly).
    """
    if not grains:
        raise ValueError("grains must name at least one (label, width_us)")
    ts_us = _us(F.col(ts_col), df.schema[ts_col].dataType)
    base = df.select(
        *[F.col(k) for k in keys],
        F.col(value_col).alias("_v"),
        *[
            (F.floor(ts_us / F.lit(w)) * F.lit(w)).cast("long").alias(f"_b_{g}")
            for g, w in grains
        ],
    )
    bucket_cols = [f"_b_{g}" for g, _ in grains]
    grouped = base.groupingSets(
        # each set = one grain's bucket + ALL keys (keys are in every set;
        # only the inactive grains' bucket columns null out)
        [[F.col(b)] + [F.col(k) for k in keys] for b in bucket_cols],
        *[F.col(b) for b in bucket_cols],
        *[F.col(k) for k in keys],
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_v").cast("decimal(18,6)")).alias("_sum_dec"),
        F.grouping_id().alias("_gid"),
    )
    # label each row by WHICH grouping set produced it (grouping_id), not
    # by bucket non-nullness: a NULL timestamp nulls every bucket column,
    # which would mislabel (and appear to merge) those rows. grouping_id
    # bit i (MSB-first over bucket_cols + keys) is set iff that column is
    # NOT in the row's grouping set.
    n_bits = len(bucket_cols) + len(keys)
    all_buckets_mask = sum(
        1 << (n_bits - 1 - i) for i in range(len(bucket_cols))
    )
    grain_label = None
    for i, (g, _) in enumerate(grains):
        gid = all_buckets_mask - (1 << (n_bits - 1 - i))
        cond = F.col("_gid") == F.lit(gid)
        grain_label = (
            F.when(cond, F.lit(g))
            if grain_label is None
            else grain_label.when(cond, F.lit(g))
        )
    return grouped.select(
        grain_label.alias("grain"),
        F.coalesce(*[F.col(b) for b in bucket_cols]).alias("bucket_us"),
        *[F.col(k) for k in keys],
        F.col("n"),
        F.col("_sum_dec").cast("double").alias("sum_value"),
        (F.col("_sum_dec").cast("double") / F.col("n")).alias("avg_value"),
    )
