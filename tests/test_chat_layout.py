"""Unit tests for operators/chat.py and operators/layout.py — edge
semantics the oracle-parity entries can't isolate (malformed
conversations, ties, banding boundaries, interleave bit positions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from purescript_ifrit_spark.operators.chat import (
    conversation_stats,
    preference_pairs,
    sft_loss_spans,
)
from purescript_ifrit_spark.operators.layout import (
    layout_file_stats,
    skew_profile,
    zorder_key,
    zorder_sql,
)


def _msgs(spark, rows):
    return spark.createDataFrame(rows, "conv_id long, turn long, role string, content string")


def test_conversation_stats_alternation_shapes(spark):
    rows = [
        # conv 1: system head + strict alternation -> ok
        (1, 0, "system", "s"),
        (1, 1, "user", "hi there"),
        (1, 2, "assistant", "hello"),
        # conv 2: starts with assistant -> not ok
        (2, 0, "assistant", "a"),
        (2, 1, "user", "b"),
        # conv 3: double user turn -> not ok
        (3, 0, "user", "a"),
        (3, 1, "user", "b"),
        # conv 4: system ONLY -> malformed (empty body)
        (4, 0, "system", "x"),
        # conv 5: system in the middle -> not ok
        (5, 0, "user", "a"),
        (5, 1, "system", "b"),
    ]
    out = {
        r["conv_id"]: r.asDict()
        for r in conversation_stats(_msgs(spark, rows)).collect()
    }
    assert out[1]["alternation_ok"] is True
    assert out[2]["alternation_ok"] is False
    assert out[3]["alternation_ok"] is False
    assert out[4]["alternation_ok"] is False
    assert out[5]["alternation_ok"] is False
    assert out[1]["n_turns"] == 3 and out[1]["n_system"] == 1
    assert out[1]["first_role"] == "system"
    assert out[1]["last_role"] == "assistant"
    assert out[1]["total_chars"] == len("s") + len("hi there") + len("hello")
    assert out[1]["assistant_chars"] == len("hello")
    assert out[4]["assistant_chars"] == 0  # coalesce, not NULL


def test_sft_loss_spans_offsets(spark):
    rows = [
        (1, 0, "system", "a b c"),        # 3 tokens: [0, 3)
        (1, 1, "user", "d d"),            # 2 tokens: [3, 5)
        (1, 2, "assistant", "x y z w"),   # 4 tokens: [5, 9)
        (1, 3, "user", "q"),              # 1 token:  [9, 10)
        (1, 4, "assistant", ""),          # 0 tokens: [10, 10)
    ]
    out = sorted(
        (r["turn"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in sft_loss_spans(_msgs(spark, rows)).collect()
    )
    assert out == [(2, 5, 9, 4), (4, 10, 10, 0)]


def test_preference_pairs_ties_and_singletons(spark):
    rows = [
        (1, 10, 5, "a a a"),
        (1, 11, 7, "b b"),      # higher score wins
        (2, 20, 4, "c"),
        (2, 21, 4, "d d"),      # score tie -> LOWER cand_id chosen
        (3, 30, 9, "e"),        # singleton -> dropped
    ]
    df = spark.createDataFrame(
        rows, "prompt_id long, cand_id long, score long, content string"
    )
    out = {r["prompt_id"]: r.asDict() for r in preference_pairs(df).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["chosen_id"], out[1]["rejected_id"]) == (11, 10)
    assert (out[1]["chosen_tokens"], out[1]["rejected_tokens"]) == (2, 3)
    assert out[1]["len_gap"] == -1 and out[1]["score_gap"] == 2
    assert (out[2]["chosen_id"], out[2]["rejected_id"]) == (20, 21)
    assert out[2]["score_gap"] == 0


def test_preference_pairs_wide_and_negative_ids(spark):
    """ADVICE r7 regression: the old scalar ordering key
    score·2^20 − cand_id mis-picked whenever cand_id ≥ 2^20·score-gap,
    on negative ids, and near int64 overflow for huge scores; the
    struct key must survive all three."""
    rows = [
        # cand_id >> 2^20 with score gap 1: old key 2·2^20 − 5e6 < 1·2^20
        # − 1 picked the LOW-score candidate as chosen
        (1, 5_000_000, 2, "w w"),
        (1, 1, 1, "l"),
        # negative cand_id: tie must still break toward the LOWER id
        (2, -7, 4, "a"),
        (2, 3, 4, "b"),
        # scores near 2^43: the old scalar key overflowed int64
        (3, 100, 1 << 43, "hi"),
        (3, 200, (1 << 43) - 1, "lo"),
    ]
    df = spark.createDataFrame(
        rows, "prompt_id long, cand_id long, score long, content string"
    )
    out = {r["prompt_id"]: r.asDict() for r in preference_pairs(df).collect()}
    assert (out[1]["chosen_id"], out[1]["rejected_id"]) == (5_000_000, 1)
    assert (out[2]["chosen_id"], out[2]["rejected_id"]) == (-7, 3)
    assert (out[3]["chosen_id"], out[3]["rejected_id"]) == (100, 200)


def test_preference_pairs_null_scores_and_long_min(spark):
    """r8 review regressions: (a) NULL-scored candidates are excluded up
    front — a struct ordering key is non-NULL when any field is, which
    would otherwise let unscored candidates leak in as always-losing
    rejected examples (the old scalar key skipped them via NULL-key
    min_by/max_by); (b) the id tie-break leg is bitwise NOT, which
    reverses order for EVERY long including Long.MIN_VALUE, where
    arithmetic negation overflows."""
    LMIN = -(1 << 63)
    rows = [
        (1, 10, None, "unscored"),   # excluded: never chosen OR rejected
        (1, 11, 7, "b b"),
        (1, 12, 3, "c"),
        (2, 20, 9, "only scored"),   # 1 scored + 1 unscored -> no pair
        (2, 21, None, "unscored"),
        (3, LMIN, 4, "a"),           # score tie at Long.MIN id: lower id
        (3, 5, 4, "b"),              # wins chosen, higher id rejected
    ]
    df = spark.createDataFrame(
        rows, "prompt_id long, cand_id long, score long, content string"
    )
    out = {r["prompt_id"]: r.asDict() for r in preference_pairs(df).collect()}
    assert set(out) == {1, 3}
    assert (out[1]["chosen_id"], out[1]["rejected_id"]) == (11, 12)
    assert (out[3]["chosen_id"], out[3]["rejected_id"]) == (LMIN, 5)


def test_zorder_key_known_bits(spark):
    # x = 0b11, y = 0b01 with 2 dims: bit i of dim d -> position 2i+d
    # x contributes bits 0,2 ; y contributes bit 1 -> z = 0b0111 = 7
    df = spark.range(1).select(
        zorder_key([F.lit(3), F.lit(1)], bits=2).alias("z")
    )
    assert df.collect()[0]["z"] == 7
    # SQL twin produces the identical expression semantics
    assert "<< 0" in zorder_sql(["x", "y"], 2)


def test_zorder_key_rejects_negative_dims_in_plan(spark):
    """ADVICE r7: arithmetic shiftright keeps a negative value's low
    bits, scattering negatives to the top of the Z-curve — the
    non-negativity contract is now enforced loudly in-plan; NULL dims
    keep their NULL-key passthrough."""
    df = spark.createDataFrame([(3, -1)], ["x", "y"])
    with pytest.raises(Exception, match="zorder_key: negative"):
        df.select(
            zorder_key([F.col("x"), F.col("y")], bits=4).alias("z")
        ).collect()
    nul = spark.createDataFrame([(3, None)], "x long, y long").select(
        zorder_key([F.col("x"), F.col("y")], bits=4).alias("z")
    )
    assert nul.collect()[0]["z"] is None


def test_zorder_sql_twin_mirrors_negative_guard():
    """r8 review: the Spark side failing loudly on negative dims while
    the SQL twin silently scattered them was a backend parity break —
    the twin's CASE-guarded constant cast must raise in DuckDB on a
    negative dim and stay silent on the non-negative path."""
    import duckdb

    con = duckdb.connect()
    sql = zorder_sql(["x", "y"], 2)
    ok = con.execute(
        f"SELECT {sql} FROM (VALUES (3::BIGINT, 1::BIGINT)) t(x, y)"
    ).fetchone()[0]
    assert ok == 7  # the known-bits golden above
    with pytest.raises(Exception, match="negative dimension"):
        con.execute(
            f"SELECT {sql} FROM (VALUES (3::BIGINT, -1::BIGINT)) t(x, y)"
        ).fetchall()
    con.close()


def test_zorder_key_guards():
    with pytest.raises(ValueError):
        zorder_key([F.lit(1)], bits=8)
    with pytest.raises(ValueError):
        zorder_key([F.lit(1), F.lit(2)], bits=32)


def test_layout_file_stats_banding_and_hit(spark):
    # 8 rows, 4 files -> 2 rows per file under ascending key
    df = spark.createDataFrame(
        [(i, i, 100 - i) for i in range(8)], "id long, a long, b long"
    )
    out = layout_file_stats(
        df,
        F.col("a"),
        F.col("id"),
        {"a": F.col("a"), "b": F.col("b")},
        n_files=4,
        query_box={"a": (2, 3)},
    ).collect()
    rows = {r["file_id"]: r.asDict() for r in out}
    assert len(rows) == 4
    assert (rows[0]["a_min"], rows[0]["a_max"]) == (0, 1)
    assert (rows[1]["a_min"], rows[1]["a_max"]) == (2, 3)
    assert rows[1]["hit"] is True
    assert rows[0]["hit"] is False and rows[3]["hit"] is False
    assert (rows[2]["b_min"], rows[2]["b_max"]) == (95, 96)


def test_skew_profile_tie_breaks_to_min_key(spark):
    df = spark.createDataFrame(
        [(k,) for k in [5, 5, 5, 2, 2, 2, 9]], "k long"
    )
    r = skew_profile(df, F.col("k")).collect()[0]
    assert r["n_keys"] == 3 and r["rows_total"] == 7 and r["max_cnt"] == 3
    assert r["top_key"] == 2  # tie between 2 and 5 at cnt=3 -> min key
    # skew = 3*3/7 = 1.2857... -> 1285714 micro; salt = ceil(9/7) = 2
    assert r["skew_micro"] == 1285714
    assert r["salt_factor"] == 2


def test_skew_micro_decimal_headroom(spark):
    # regression: max_cnt*n_keys*1e6 wraps int64 at a plausible 100 TB
    # key profile (1e4 hot count x 1e10 distinct keys) — the
    # DECIMAL(38,0) forms in skew_profile and its oracle must stay exact
    # and agree cross-engine at that operand scale
    import duckdb

    s = spark.sql(
        "SELECT CAST((CAST(10000 AS DECIMAL(38,0)) * 10000000000L * "
        "1000000) div 2000000000000L AS BIGINT) AS skew_micro, "
        "CAST((CAST(10000 AS DECIMAL(38,0)) * 10000000000L + "
        "2000000000000L - 1) div 2000000000000L AS BIGINT) AS salt_factor"
    ).collect()[0]
    d = duckdb.sql(
        # HUGEINT, not DECIMAL: DuckDB's DECIMAL `//` degrades to DOUBLE
        # (101 // 2 = 50.5) — the oracle twin must floor exactly
        "SELECT CAST((CAST(10000 AS HUGEINT) * 10000000000 * "
        "1000000) // 2000000000000 AS BIGINT), "
        "CAST((CAST(10000 AS HUGEINT) * 10000000000 + "
        "2000000000000 - 1) // 2000000000000 AS BIGINT)"
    ).fetchone()
    assert (s.skew_micro, s.salt_factor) == tuple(d) == (50000000, 50)


def test_layout_file_stats_is_lazy_and_handles_empty(spark):
    # regression: building the report must run NO eager job (the total
    # now rides the same window pass), and an empty frame yields zero
    # report rows rather than a div-by-zero
    df = spark.createDataFrame([], "id long, a long, b long")
    out = layout_file_stats(
        df, F.col("a"), F.col("id"),
        {"a": F.col("a"), "b": F.col("b")},
        n_files=4, query_box={"a": (2, 3)},
    )
    assert out.collect() == []

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    big = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("a"), (F.col("id") % 5).alias("b")
    )
    plan = layout_file_stats(
        big, F.col("a"), F.col("id"), {"a": F.col("a")}, 4, {"a": (0, 1)}
    )
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before  # no job ran during plan construction
    assert plan.count() == 4


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_chat_operator_plan_shapes(spark):
    # conversation_stats and preference_pairs: ONE hash exchange (the
    # groupBy), no window, no join; sft_loss_spans: one exchange feeding
    # the window sort. These are the 100 TB contracts the docstrings
    # promise — pin them so a refactor cannot silently add a shuffle.
    msgs = spark.createDataFrame(
        [(1, 0, "user", "a b"), (1, 1, "assistant", "c")],
        "conv_id long, turn long, role string, content string",
    )
    p = _plan(conversation_stats(msgs))
    assert p.count("Exchange") == 1 and "Window" not in p and "Join" not in p
    p = _plan(sft_loss_spans(msgs))
    assert p.count("Exchange") == 1 and "Join" not in p
    cands = spark.createDataFrame(
        [(1, 10, 5, "x"), (1, 11, 7, "y")],
        "prompt_id long, cand_id long, score long, content string",
    )
    p = _plan(preference_pairs(cands))
    assert p.count("Exchange") == 1 and "Window" not in p and "Join" not in p


def test_zorder_is_scan_stage(spark):
    df = spark.createDataFrame([(1, 2, 3)], "id long, a long, b long")
    p = _plan(df.select(zorder_key([F.col("a"), F.col("b")], 8).alias("z")))
    assert "Exchange" not in p


def test_truncate_conversation_budget_edges(spark):
    from purescript_ifrit_spark.operators.chat import truncate_conversation

    rows = [
        # conv 1: sys(2) + turns of 3,4,5 tokens; budget 8 ->
        # residual 6 -> suffix {5}=5 ok, {4,5}=9 no -> keep sys + last
        (1, 0, "system", "s s"),
        (1, 1, "user", "a a a"),
        (1, 2, "assistant", "b b b b"),
        (1, 3, "user", "c c c c c"),
        # conv 2: system alone exceeds budget -> only system survives
        (2, 0, "system", "x " * 20),
        (2, 1, "user", "y"),
        # conv 3: everything fits
        (3, 0, "user", "q"),
        (3, 1, "assistant", "r"),
    ]
    df = _msgs(spark, rows)
    got = {
        (r["conv_id"], r["turn"]): r["kept"]
        for r in truncate_conversation(df, 8).collect()
    }
    assert got[(1, 0)] is True and got[(1, 3)] is True
    assert got[(1, 1)] is False and got[(1, 2)] is False
    assert got[(2, 0)] is True and got[(2, 1)] is False
    assert got[(3, 0)] is True and got[(3, 1)] is True


def test_chat_operators_null_content_is_zero_tokens(spark):
    # NULL content must count as zero tokens/chars — spans stay defined,
    # truncation kept-flags never go NULL, pairs still form
    from purescript_ifrit_spark.operators.chat import truncate_conversation

    rows = [
        (1, 0, "user", None),
        (1, 1, "assistant", None),
        (1, 2, "user", "a b"),
        (1, 3, "assistant", "c"),
    ]
    df = _msgs(spark, rows)
    spans = {
        r["turn"]: (r["span_start"], r["span_end"])
        for r in sft_loss_spans(df).collect()
    }
    assert spans == {1: (0, 0), 3: (2, 3)}
    kept = {
        r["turn"]: r["kept"] for r in truncate_conversation(df, 10).collect()
    }
    assert all(v is True for v in kept.values())
    stats = conversation_stats(df).collect()[0]
    assert stats["total_chars"] == 4 and stats["assistant_chars"] == 1
    cands = spark.createDataFrame(
        [(1, 10, 5, None), (1, 11, 7, "x y")],
        "prompt_id long, cand_id long, score long, content string",
    )
    pair = preference_pairs(cands).collect()[0]
    assert (pair["chosen_tokens"], pair["rejected_tokens"]) == (2, 0)


def test_write_zordered_improves_file_skipping(spark, sf_dir, tmp_path):
    # physical attestation of the layout story: write lineitem once
    # Z-ordered on (partkey, suppkey) and once lexicographically by
    # partkey; for a SECONDARY-dimension predicate (suppkey only), the
    # files containing matches — the files a stats-pruning reader must
    # read — must be strictly fewer under the Z-order layout
    from purescript_ifrit_spark.operators.layout import write_zordered
    from purescript_ifrit_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    zpath = str(tmp_path / "li_z")
    lpath = str(tmp_path / "li_linear")
    # quantize dims to comparable magnitudes (the docstring contract:
    # "equal-weight prefixes") — raw suppkey (0-9) sits entirely below
    # partkey's significant bits, so unscaled it never reaches the file
    # split; scaled by 20 both dims span ~0-200 and share the top bits
    write_zordered(
        li, zpath,
        [F.col("l_partkey").bitwiseAND(255),
         (F.col("l_suppkey") * 20).bitwiseAND(255)],
        bits=8,
        n_files=16,
    )
    (li.repartitionByRange(16, "l_partkey")
       .sortWithinPartitions("l_partkey")
       .write.parquet(lpath))

    def files_with_matches(path):
        return (
            spark.read.parquet(path)
            .filter(F.col("l_suppkey") == 3)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    z_files, l_files = files_with_matches(zpath), files_with_matches(lpath)
    # partkey-sorted files each span all suppkeys -> matches everywhere;
    # z-order confines suppkey=3 to the files whose morton range covers it
    assert z_files < l_files, (z_files, l_files)
    # and the data survives the round trip
    assert spark.read.parquet(zpath).count() == li.count()
