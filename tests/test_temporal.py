"""operators/temporal.py: as-of join, point-in-interval range join,
multi-grain rollup — value semantics on hand-built frames plus the plan
shapes that make them scale (no join node / no cartesian / one scan)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from purescript_ifrit_spark.operators.temporal import (
    asof_join,
    range_join_points,
    rollup_time,
)


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def quotes(spark):
    # right side: (key, t, px) — the classic as-of shape
    return spark.createDataFrame(
        [
            Row(k="a", t=10, px=1.0),
            Row(k="a", t=20, px=2.0),
            Row(k="a", t=30, px=3.0),
            Row(k="b", t=15, px=9.0),
        ]
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            Row(k="a", t=5, qty=100),   # before any quote
            Row(k="a", t=20, qty=200),  # exactly on a quote
            Row(k="a", t=25, qty=300),  # between quotes
            Row(k="b", t=99, qty=400),  # long after the only quote
            Row(k="c", t=50, qty=500),  # key with no quotes at all
        ]
    )


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestAsofJoin:
    def test_backward_semantics(self, trades, quotes):
        out = asof_join(trades, quotes, on="k", left_ts="t", payload=["px"])
        assert _rows(out, "k", "t", "px") == [
            ("a", 5, None),   # no quote yet
            ("a", 20, 2.0),   # equal ts matches
            ("a", 25, 2.0),   # latest prior
            ("b", 99, 9.0),
            ("c", 50, None),  # unseen key survives with null (how="left")
        ]

    def test_matched_ts_exposed_with_suffix(self, trades, quotes):
        out = asof_join(trades, quotes, on="k", left_ts="t", payload=["px"])
        # right ts collides with left "t" -> surfaced as t_r
        assert "t_r" in out.columns
        row = {(r["k"], r["t"]): r["t_r"] for r in out.collect()}
        assert row[("a", 25)] == 20 and row[("a", 5)] is None

    def test_inner_drops_unmatched(self, trades, quotes):
        out = asof_join(
            trades, quotes, on="k", left_ts="t", payload=["px"], how="inner"
        )
        assert _rows(out, "k", "t") == [("a", 20), ("a", 25), ("b", 99)]

    def test_forward_direction(self, trades, quotes):
        out = asof_join(
            trades, quotes, on="k", left_ts="t", payload=["px"],
            direction="forward",
        )
        assert _rows(out, "k", "t", "px") == [
            ("a", 5, 1.0),    # next quote at 10
            ("a", 20, 2.0),   # equal ts matches forward too
            ("a", 25, 3.0),
            ("b", 99, None),  # nothing after
            ("c", 50, None),
        ]

    def test_tolerance_nulls_stale_matches(self, trades, quotes):
        out = asof_join(
            trades, quotes, on="k", left_ts="t", payload=["px"],
            tolerance_us=10,
        )
        got = {(r["k"], r["t"]): r["px"] for r in out.collect()}
        assert got[("a", 25)] == 2.0   # gap 5 <= 10
        assert got[("b", 99)] is None  # gap 84 > 10

    def test_tiebreak_picks_greatest(self, spark, trades):
        dup = spark.createDataFrame(
            [Row(k="a", t=20, px=2.0, src=1), Row(k="a", t=20, px=7.0, src=2)]
        )
        out = asof_join(
            trades, dup, on="k", left_ts="t", payload=["px"],
            right_tiebreak="src",
        )
        got = {(r["k"], r["t"]): r["px"] for r in out.collect()}
        assert got[("a", 25)] == 7.0  # src=2 wins under backward

    def test_plan_has_no_join_and_one_exchange(self, trades, quotes):
        out = asof_join(trades, quotes, on="k", left_ts="t", payload=["px"])
        plan = physical(out)
        assert "Join" not in plan and "CartesianProduct" not in plan
        assert plan.count("Exchange") == 1  # the window's hash exchange

    def test_rejects_bad_args(self, trades, quotes):
        with pytest.raises(ValueError):
            asof_join(trades, quotes, on="k", left_ts="t", direction="nearest")
        with pytest.raises(ValueError):
            asof_join(trades, quotes, on="k", left_ts="t", how="outer")


@pytest.fixture(scope="module")
def intervals(spark):
    return spark.createDataFrame(
        [
            Row(k="a", s=10, e=20, tag="w1"),
            Row(k="a", s=15, e=40, tag="w2"),   # overlaps w1; spans buckets
            Row(k="a", s=30, e=30, tag="empty"),  # empty: matches nothing
            Row(k="b", s=0, e=100, tag="wide"),
        ]
    )


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [
            Row(k="a", t=12, pid=1),  # in w1 only
            Row(k="a", t=17, pid=2),  # in w1 and w2
            Row(k="a", t=20, pid=3),  # end-exclusive: w1 out, w2 in
            Row(k="a", t=39, pid=4),  # w2 only (different bucket than s)
            Row(k="b", t=55, pid=5),  # wide
            Row(k="c", t=1, pid=6),   # no intervals for key
        ]
    )


class TestRangeJoin:
    def test_point_in_interval_exactly_once(self, points, intervals):
        out = range_join_points(
            points, intervals, on="k", ts_col="t",
            start_col="s", end_col="e", bucket_width_us=10,
        )
        assert _rows(out, "pid", "tag") == [
            (1, "w1"), (2, "w1"), (2, "w2"), (3, "w2"), (4, "w2"), (5, "wide"),
        ]

    def test_bucket_width_does_not_change_result(self, points, intervals):
        for w in (1, 3, 7, 1000):
            out = range_join_points(
                points, intervals, on="k", ts_col="t",
                start_col="s", end_col="e", bucket_width_us=w,
            )
            assert len(_rows(out, "pid", "tag")) == 6, f"width={w}"

    def test_span_cap_fails_loud_and_drops_on_opt_in(self, points, intervals):
        # r8 review (the interval_join policy, now applied to the
        # sibling): an interval over the cap FAILS the task by default —
        # a silent filter loses every point match inside it with no
        # signal; the old drop behavior is an explicit opt-in
        with pytest.raises(Exception, match="max_span_buckets"):
            range_join_points(
                points, intervals, on="k", ts_col="t",
                start_col="s", end_col="e", bucket_width_us=1,
                max_span_buckets=50,
            ).collect()
        out = range_join_points(
            points, intervals, on="k", ts_col="t",
            start_col="s", end_col="e", bucket_width_us=1,
            max_span_buckets=50, on_over_span="drop",
        )
        tags = {r["tag"] for r in out.collect()}
        assert "wide" not in tags and {"w1", "w2"} <= tags

    def test_plan_is_equi_join_not_cartesian(self, points, intervals):
        out = range_join_points(
            points, intervals, on="k", ts_col="t",
            start_col="s", end_col="e", bucket_width_us=10,
        )
        plan = physical(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_rejects_bad_width(self, points, intervals):
        with pytest.raises(ValueError):
            range_join_points(
                points, intervals, on="k", ts_col="t",
                start_col="s", end_col="e", bucket_width_us=0,
            )


class TestRollupTime:
    def test_matches_union_of_groupbys(self, spark, sf_dir):
        from purescript_ifrit_spark.sources.tables import load_table

        ev = load_table(spark, sf_dir, "events")
        got = rollup_time(ev, "ts", ["event_type"], "value")

        def one(label, width):
            b = (F.floor(F.unix_micros("ts") / F.lit(width)) * F.lit(width)).cast(
                "long"
            )
            return (
                ev.groupBy(b.alias("bucket_us"), "event_type")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("value").cast("decimal(18,6)"))
                    .cast("double")
                    .alias("sum_value"),
                )
                .select(F.lit(label).alias("grain"), "*")
            )

        want = (
            one("hour", 3_600_000_000)
            .unionByName(one("day", 86_400_000_000))
            .unionByName(one("week", 604_800_000_000))
        )
        g = sorted(
            tuple(r)
            for r in got.select(
                "grain", "bucket_us", "event_type", "n", "sum_value"
            ).collect()
        )
        w = sorted(tuple(r) for r in want.collect())
        assert g == w

    def test_single_scan_single_exchange(self, spark, sf_dir):
        from purescript_ifrit_spark.sources.tables import load_table

        ev = load_table(spark, sf_dir, "events")
        plan = physical(rollup_time(ev, "ts", ["event_type"], "value"))
        assert plan.count("Scan parquet") == 1  # NOT once per grain
        assert "Expand" in plan
        assert plan.count("Exchange") == 1

    def test_avg_is_sum_over_n(self, spark):
        df = spark.createDataFrame(
            [Row(ts=1_000_000, g="x", v=1.5), Row(ts=2_000_000, g="x", v=2.5)]
        ).select(F.timestamp_micros("ts").alias("ts"), "g", "v")
        out = rollup_time(df, "ts", ["g"], "v", grains=(("hour", 3_600_000_000),))
        r = out.collect()[0]
        assert r["n"] == 2 and r["sum_value"] == 4.0 and r["avg_value"] == 2.0

    def test_rejects_empty_grains(self, spark):
        df = spark.range(1).select(
            F.timestamp_micros(F.col("id")).alias("ts"),
            F.lit("g").alias("g"),
            F.lit(1.0).alias("v"),
        )
        with pytest.raises(ValueError):
            rollup_time(df, "ts", ["g"], "v", grains=())


def test_tiebreak_numeric_not_lexicographic(spark, trades):
    # src=10 must beat src=9 (a string-cast tiebreak would order '10' < '9')
    dup = spark.createDataFrame(
        [Row(k="a", t=20, px=2.0, src=9), Row(k="a", t=20, px=7.0, src=10)]
    )
    out = asof_join(
        trades, dup, on="k", left_ts="t", payload=["px"], right_tiebreak="src"
    )
    got = {(r["k"], r["t"]): r["px"] for r in out.collect()}
    assert got[("a", 25)] == 7.0


def test_rollup_null_ts_labeled_per_grain(spark):
    df = spark.createDataFrame(
        [
            Row(ts=1_000_000, g="x", v=1.0),
            Row(ts=None, g="x", v=5.0),
        ]
    ).select(
        F.timestamp_micros("ts").alias("ts"), "g", "v"
    )
    out = rollup_time(
        df, "ts", ["g"], "v", grains=(("hour", 3_600_000_000), ("day", 86_400_000_000))
    )
    rows = {(r["grain"], r["bucket_us"], r["n"]) for r in out.collect()}
    # null-ts rows form their own (grain, NULL bucket) group per grain,
    # each labeled with a real grain name — never grain=NULL duplicates
    assert rows == {
        ("day", None, 1), ("day", 0, 1), ("hour", None, 1), ("hour", 0, 1)
    }


def test_asof_randomized_vs_bruteforce(spark):
    """Random frames (dup timestamps, unmatched keys) vs an O(n·m)
    reference computed in plain Python — both directions."""
    import random

    rng = random.Random(20260813)
    keys = ["a", "b", "c", "d"]
    left = [(rng.choice(keys), rng.randint(0, 50), i) for i in range(60)]
    right = [
        (rng.choice(keys), rng.randint(0, 50), i, float(i))
        for i in range(40)
    ]
    ldf = spark.createDataFrame(left, ["k", "t", "lid"])
    rdf = spark.createDataFrame(right, ["k", "t", "rid", "px"])

    for direction in ("backward", "forward"):
        got = {
            r["lid"]: r["rid"]
            for r in asof_join(
                ldf, rdf, on="k", left_ts="t", payload=["rid", "px"],
                direction=direction, right_tiebreak="rid",
            ).collect()
        }
        for k, t, lid in left:
            if direction == "backward":
                cand = [(rt, rid) for rk, rt, rid, _ in right
                        if rk == k and rt <= t]
                want = max(cand)[1] if cand else None  # max ts, then max rid
            else:
                cand = [(rt, rid) for rk, rt, rid, _ in right
                        if rk == k and rt >= t]
                want = min(cand)[1] if cand else None  # min ts, then min rid
            assert got[lid] == want, (direction, k, t, lid)


def test_range_join_randomized_vs_bruteforce(spark):
    import random

    rng = random.Random(42)
    keys = ["a", "b", "c"]
    pts = [(rng.choice(keys), rng.randint(0, 100), i) for i in range(80)]
    ivs = []
    for i in range(30):
        s = rng.randint(0, 90)
        ivs.append((rng.choice(keys), s, s + rng.randint(0, 25), i))
    pdf = spark.createDataFrame(pts, ["k", "t", "pid"])
    idf = spark.createDataFrame(ivs, ["k", "s", "e", "iid"])

    for width in (7, 64):
        got = {
            (r["pid"], r["iid"])
            for r in range_join_points(
                pdf, idf, on="k", ts_col="t", start_col="s", end_col="e",
                bucket_width_us=width,
            ).collect()
        }
        want = {
            (pid, iid)
            for pk, t, pid in pts
            for ik, s, e, iid in ivs
            if pk == ik and s <= t < e
        }
        assert got == want, f"width={width}"


def test_fill_gaps_locf_densifies_and_guards(spark):
    from purescript_ifrit_spark.operators.temporal import fill_gaps_locf

    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 30, 40), ("b", 10, 7)],
        "k string, bucket_us long, n long",
    )
    out = {(r.k, r.bucket_us): (r.n, r.n_filled)
           for r in fill_gaps_locf(df, ["k"], "bucket_us", ["n"], 10).collect()}
    # a: grid 0,10,20,30 — gaps at 10/20 carry 10 forward
    assert out[("a", 0)] == (10, 10)
    assert out[("a", 10)] == (None, 10)
    assert out[("a", 20)] == (None, 10)
    assert out[("a", 30)] == (40, 40)
    assert out[("b", 10)] == (7, 7)       # single-point key: no gaps
    assert len(out) == 5

    import pytest as _p

    wide = spark.createDataFrame(
        [("w", 0, 1), ("w", 10_000, 1)], "k string, bucket_us long, n long"
    )
    with _p.raises(Exception, match="max_buckets_per_key"):
        fill_gaps_locf(
            wide, ["k"], "bucket_us", ["n"], 10, max_buckets_per_key=100
        ).collect()


def test_fill_gaps_interp_lines_and_edges(spark):
    from purescript_ifrit_spark.operators.temporal import fill_gaps_interp

    df = spark.createDataFrame(
        # 'a' has a 2-bucket interior gap plus a NULL value at the edge
        # bucket (t=40) — edge falls back to nearest observation
        [("a", 0, 10), ("a", 30, 40), ("a", 40, None)],
        "k string, bucket_us long, n long",
    )
    out = {(r.k, r.bucket_us): (r.n, r.n_interp)
           for r in fill_gaps_interp(df, ["k"], "bucket_us", ["n"], 10).collect()}
    assert out[("a", 0)] == (10, 10.0)
    assert out[("a", 10)] == (None, 20.0)   # straight line 10 -> 40
    assert out[("a", 20)] == (None, 30.0)
    assert out[("a", 30)] == (40, 40.0)
    assert out[("a", 40)] == (None, 40.0)   # trailing edge: LOCF fallback


def test_interval_join_matches_bruteforce_on_random_intervals(spark):
    """Randomized pin of the banding + exactly-once attribution against
    a Python brute-force overlap join: boundary-touching intervals,
    zero/negative durations, bucket-aligned starts, spans crossing many
    buckets, duplicate keys — per seed and per bucket width."""
    import random

    from purescript_ifrit_spark.operators.temporal import interval_join

    for seed, width in ((1, 7), (2, 64), (3, 13)):
        rnd = random.Random(seed)

        def mk(n, tag):
            rows = []
            for i in range(n):
                k = rnd.randrange(4)
                s = rnd.randrange(0, 400)
                # durations biased toward edge cases: 0 (empty), 1,
                # exact multiples of the width, long spans
                dur = rnd.choice(
                    [0, 1, width, width * 3, rnd.randrange(0, 90)]
                )
                rows.append((k, tag * 10000 + i, s, s + dur))
            return rows

        lrows, rrows = mk(120, 1), mk(120, 2)
        want = sorted(
            (lk, lid, rid)
            for lk, lid, ls, le in lrows
            for rk, rid, rs, re_ in rrows
            if lk == rk and le > ls and re_ > rs and ls < re_ and rs < le
        )
        left = spark.createDataFrame(
            lrows, "k long, lid long, s long, e long"
        )
        right = spark.createDataFrame(
            rrows, "k long, rid long, s long, e long"
        )
        got = sorted(
            (r.k, r.lid, r.rid)
            for r in interval_join(
                left, right, "k", "s", "e", "s", "e",
                bucket_width_us=width,
            ).select("k", "lid", "rid").collect()
        )
        assert got == want, (seed, width, len(got), len(want))


def test_fill_gaps_rejects_off_lattice_buckets(spark):
    # regression: an observation off the (min_bucket + k*W) lattice used
    # to vanish silently in the grid join-back — it must be a loud error
    from purescript_ifrit_spark.operators.temporal import fill_gaps_locf

    df = spark.createDataFrame(
        [("a", 0, 1), ("a", 15, 5), ("a", 30, 9)],
        "k string, bucket_us long, n long",
    )
    import pytest as _p

    with _p.raises(Exception, match="lattice"):
        fill_gaps_locf(df, ["k"], "bucket_us", ["n"], 10).collect()

    # consistent nonzero phase is fine: lattice from the key's own min
    ok = spark.createDataFrame(
        [("a", 5, 1), ("a", 25, 3)], "k string, bucket_us long, n long"
    )
    rows = fill_gaps_locf(ok, ["k"], "bucket_us", ["n"], 10).collect()
    assert sorted(r.bucket_us for r in rows) == [5, 15, 25]


def test_time_weighted_avg_semantics(spark):
    from purescript_ifrit_spark.operators.temporal import time_weighted_avg

    # bucket width 100: key 'a' observes v=10 at t=0 and v=30 at t=80 —
    # TWAP = (10*80 + 30*20) / 100 = 14.0; the t=80 observation holds to
    # the bucket end because the next one is in a later bucket
    df = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 80, 30.0), ("a", 250, 5.0)],
        "k string, t long, v double",
    )
    out = {r.bucket_us: r for r in time_weighted_avg(
        df, ["k"], "t", "v", 100).collect()}
    assert out[0].twap == 14.0 and out[0].covered_us == 100
    assert out[0].n_obs == 2
    # lone observation mid-bucket: holds to bucket end only; the stretch
    # before it is uncovered
    assert out[200].covered_us == 50 and out[200].twap == 5.0


def test_asof_join_null_keys_never_match(spark):
    """r8 review: the window encoding partitions by key and partitionBy
    groups NULLs together — a NULL-key left row took a NULL-key right
    row's payload, diverging from equi-join semantics (and from the
    sibling range/interval joins, where NULL keys never match)."""
    from purescript_ifrit_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(None, 10), (1, 10)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(None, 5, "null-key"), (1, 5, "real")], "k long, t long, tag string"
    )
    out = {r["k"]: r["tag"] for r in
           asof_join(left, right, "k", "t").collect()}
    assert out[1] == "real"
    assert out[None] is None  # left row kept (how='left'), no match
    inner = asof_join(left, right, "k", "t", how="inner").collect()
    assert [r["k"] for r in inner] == [1]
