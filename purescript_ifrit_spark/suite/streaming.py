"""Structured Streaming twins replayed against their batch oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purescript_ifrit_spark.api import run_query
from purescript_ifrit_spark.sources.tables import load_table
from purescript_ifrit_spark.suite._registry import (
    register,
    register_demo,
)



@register(
    "x_streaming_windowed",
    # batch-equivalent truth for the availableNow streaming run: tz-free
    # epoch hour buckets (F.window aligns to the epoch in micros, so
    # unix_micros(window.start) is pure epoch arithmetic on both sides);
    # decimal sum as everywhere (see x_sessionize note)
    "SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT) AS hour_us, "
    "event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value "
    "FROM events GROUP BY 1, 2",
)
def x_streaming_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming surface, driver-verified: stage the events table
    as micros-ts parquet files, replay them through a file-source stream
    with an availableNow trigger into a windowed aggregation, and return
    the final (complete-mode) memory-sink table. Bounded backlog → the
    query terminates; the result must equal the batch aggregation exactly.
    """
    import shutil
    import tempfile
    import uuid

    from purescript_ifrit_spark.streaming.pipeline import read_event_stream

    staged = tempfile.mkdtemp(prefix="ifrit_stream_events_")
    # repartition(4): several files so availableNow exercises multi-batch
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(staged)

    stream = read_event_stream(spark, staged, max_files_per_trigger=2)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    name = f"x_streaming_windowed_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")  # bounded replay: full table at the end
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the complete-mode memory sink holds the aggregated rows in driver
    # memory — the staged source files are dead weight once the bounded
    # replay terminates (without this, every suite run leaks a full parquet
    # copy of the events table in /tmp)
    shutil.rmtree(staged, ignore_errors=True)
    return spark.table(name).select(
        F.unix_micros(F.col("w.start")).alias("hour_us"),
        "event_type",
        "n",
        "sum_value",
    )


@register(
    "x_streaming_session",
    # gap-sessionization truth: session_window merges an event into the
    # previous session iff its ts lies STRICTLY inside [prev_ts, prev_ts +
    # gap) — so a gap of exactly 30 min starts a NEW session (>= below;
    # the batch x_sessionize dialect uses > by its own contract)
    "WITH s AS (SELECT user_id, ts, value, event_id, "
    "CASE WHEN lag(ts) OVER w IS NULL "
    "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 "
    "THEN 1 ELSE 0 END AS new_s FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "g AS (SELECT user_id, ts, value, SUM(new_s) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) "
    "AS sid FROM s) "
    "SELECT user_id, CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us, "
    "CAST(epoch_us(MAX(ts)) + 1800000000 AS BIGINT) AS session_end_us, "
    "COUNT(*) AS n_events, "
    "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value "
    "FROM g GROUP BY user_id, sid",
)
def x_streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming gap-sessionization (session_window) driver-verified: the
    events table replayed through a multi-batch availableNow stream must
    produce exactly the sessions the oracle computes with lag/cumsum —
    including sessions MERGED across micro-batch boundaries by the
    session-window state store."""
    import shutil
    import tempfile
    import uuid

    from purescript_ifrit_spark.streaming.pipeline import read_event_stream

    staged = tempfile.mkdtemp(prefix="ifrit_stream_sess_")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(staged)

    stream = read_event_stream(spark, staged, max_files_per_trigger=2)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("sw"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    name = f"x_streaming_session_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(staged, ignore_errors=True)
    return spark.table(name).select(
        "user_id",
        F.unix_micros(F.col("sw.start")).alias("session_start_us"),
        F.unix_micros(F.col("sw.end")).alias("session_end_us"),
        "n_events",
        "sum_value",
    )


@register(
    "x_streaming_state",
    # the custom stateful operator's FINAL per-user counter must equal the
    # batch count. Counts only: integer state is summation-order-exact,
    # while a float running total would inherit per-batch pandas sum order
    "SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id",
)
def x_streaming_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState surface, driver-verified: replay the events
    backlog through the running-totals stateful operator (update mode,
    multi-batch) and reduce each user's update stream to its final counter
    (max — the counter is monotone), which must equal the batch count."""
    import shutil
    import tempfile
    import uuid

    from purescript_ifrit_spark.streaming.pipeline import (
        read_event_stream,
        running_user_totals,
    )

    staged = tempfile.mkdtemp(prefix="ifrit_stream_state_")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(staged)

    stream = read_event_stream(spark, staged, max_files_per_trigger=2)
    updates = running_user_totals(stream)
    name = f"x_streaming_state_{uuid.uuid4().hex[:12]}"
    q = (
        updates.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(staged, ignore_errors=True)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )


@register_demo("x_streaming_dau")  # HLL sketch — demo (twin: x_streaming_dau_planted)
def x_streaming_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DAU (distinct users per day per event type) via
    availableNow replay — streaming/pipeline.windowed_distinct_users.
    Exact distinct is unsupported over streams, so this is the HLL form;
    pytest pins it equal to the BATCH approx twin (same sketch, same
    rsd) and inside the rsd envelope of the exact batch count."""
    import shutil
    import tempfile
    import uuid

    from purescript_ifrit_spark.streaming.pipeline import (
        read_event_stream,
        windowed_distinct_users,
    )

    staged = tempfile.mkdtemp(prefix="ifrit_stream_dau_")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(staged)

    stream = read_event_stream(spark, staged, max_files_per_trigger=2)
    agg = windowed_distinct_users(stream)
    name = f"x_streaming_dau_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(staged, ignore_errors=True)
    return spark.table(name).select(
        F.unix_micros(F.col("w.start")).alias("window_us"),
        "event_type",
        "n_users",
    )


@register(
    "x_streaming_dau_planted",
    # planted-oracle conversion of the rows-only streaming-DAU entry
    # (VERDICT r6 #3): the stream replays a bounded backlog, so its HLL
    # result must be BIT-EQUAL to the batch sketch over the same rows
    # (same aggregate, same rsd, complete output mode) — emitted as
    # stream_eq_batch — and the sketch's deterministic error on this
    # fixed dataset sits inside a generous envelope vs the exact count
    # (within_envelope; rsd=0.02, bound = max(4, 10% of exact)). The
    # oracle recomputes the exact per-day-per-type distinct count and
    # the two booleans as the constants the guarantees make them.
    "SELECT CAST(floor(epoch_us(ts) / 86400000000) * 86400000000 AS BIGINT) "
    "AS window_us, event_type, COUNT(DISTINCT user_id) AS n_exact, "
    "TRUE AS stream_eq_batch, TRUE AS within_envelope "
    "FROM events GROUP BY 1, 2",
)
def x_streaming_dau_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HLL DAU with its guarantees made oracle-checkable:
    bit-equality to the batch sketch plus the accuracy envelope vs the
    exact count, each a boolean that flips (and fails the value hash) on
    violation."""
    import shutil
    import tempfile
    import uuid

    from purescript_ifrit_spark.operators.windows import (
        distinct_users_windowed,
    )
    from purescript_ifrit_spark.streaming.pipeline import (
        read_event_stream,
        windowed_distinct_users,
    )

    ev = load_table(spark, sf_dir, "events")
    staged = tempfile.mkdtemp(prefix="ifrit_stream_daup_")
    ev.repartition(4).write.mode("overwrite").parquet(staged)

    stream = read_event_stream(spark, staged, max_files_per_trigger=2)
    agg = windowed_distinct_users(stream)
    name = f"x_streaming_dau_planted_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(staged, ignore_errors=True)
    streamed = spark.table(name).select(
        F.unix_micros(F.col("w.start")).alias("window_us"),
        "event_type",
        F.col("n_users").alias("_n_stream"),
    )
    batch_hll = distinct_users_windowed(ev, approx=True, rsd=0.02).select(
        "window_us", "event_type", F.col("n_users").alias("_n_hll")
    )
    exact = distinct_users_windowed(ev).select(
        "window_us", "event_type", F.col("n_users").alias("n_exact")
    )
    # exact defines the key set: a stream row missing there flips its
    # boolean to false via the null-safe coalesce and fails the hash
    return (
        exact.join(streamed, ["window_us", "event_type"], "left")
        .join(batch_hll, ["window_us", "event_type"], "left")
        .select(
            "window_us",
            "event_type",
            "n_exact",
            F.coalesce(
                F.col("_n_stream") == F.col("_n_hll"), F.lit(False)
            ).alias("stream_eq_batch"),
            F.coalesce(
                F.abs(F.col("_n_stream") - F.col("n_exact"))
                <= F.greatest(
                    F.lit(4).cast("long"),
                    F.ceil(F.col("n_exact") * 0.1).cast("long"),
                ),
                F.lit(False),
            ).alias("within_envelope"),
        )
    )


from purescript_ifrit_spark.suite.joins import (  # noqa: E402
    _IVAL_DUR_SQL,
    interval_overlap_oracle,
)


@register(
    "x_streaming_interval_join",
    # batch truth for the watermarked stream-stream range join: the
    # SHARED inequality overlap oracle (suite/joins.py) on the same
    # bounded-duration interval sets (dur <= 300 min < the 5h range
    # bound, so no match can exceed the state-eviction window and the
    # availableNow replay is complete)
    interval_overlap_oracle(300),
)
def x_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval-overlap join, driver-verified
    (streaming/pipeline.interval_join_stream): click and error interval
    streams replay through TWO file sources under an availableNow
    trigger; the watermarked event-time range condition bounds join
    state while the exact half-open overlap predicate filters inside
    it. The append-mode memory sink must equal the batch inequality
    join exactly."""
    import shutil
    import tempfile
    import uuid

    from purescript_ifrit_spark.streaming.pipeline import (
        interval_join_stream,
        stage_time_ordered_replay,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("value") > 0) & (F.col("value") <= 300)
    )
    iv = ev.select(
        "user_id", "event_id", "event_type", "ts",
        F.expr(_IVAL_DUR_SQL).alias("dur_us"),
    )
    c_dir = tempfile.mkdtemp(prefix="ifrit_ivj_c_")
    e_dir = tempfile.mkdtemp(prefix="ifrit_ivj_e_")
    try:
        # time-ordered files with STRICTLY INCREASING mtimes: parquet
        # part writes land in parallel, and FileStreamSource replays by
        # file mtime — two same-mtime files replay out of time order and
        # the watermark silently drops the older file's matches (the
        # 100x attestation's observed failure mode, SCALE.md). The
        # helper re-stamps mtimes in range order (VERDICT r8 #5).
        stage_time_ordered_replay(
            iv.filter(F.col("event_type") == "click").drop("event_type"),
            "ts", c_dir, num_files=2,
        )
        stage_time_ordered_replay(
            iv.filter(F.col("event_type") == "error").drop("event_type"),
            "ts", e_dir, num_files=2,
        )
        schema = "user_id long, event_id long, ts timestamp, dur_us long"
        cs = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(c_dir))
        es = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(e_dir))
        joined = interval_join_stream(
            cs, es, "user_id", max_span="5 hours", watermark="2 hours"
        )
        name = f"x_streaming_ivj_{uuid.uuid4().hex[:12]}"
        q = (joined.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        shutil.rmtree(c_dir, ignore_errors=True)
        shutil.rmtree(e_dir, ignore_errors=True)
    ls = F.unix_micros("l_ts")
    xs = F.unix_micros("r_ts")
    return spark.table(name).select(
        "user_id",
        F.col("l_event_id").alias("click_id"),
        F.col("r_event_id").alias("error_id"),
        ls.alias("c_s"), (ls + F.col("l_dur_us")).alias("c_e"),
        xs.alias("x_s"), (xs + F.col("r_dur_us")).alias("x_e"),
    )


@register(
    "x_streaming_index_dedup",
    # streaming ingestion dedup against a static corpus index, planted
    # truth (the x_dedup_incremental_planted fixture, streamed): the
    # incoming files hold exact variants (est jaccard 1 — identical
    # signatures), 36/38-near variants (lane-match est ≈ 0.947 ≥ 0.5)
    # and FRESH docs in a disjoint namespace; only the fresh docs land
    # in the survivor sink, regardless of micro-batch boundaries
    "SELECT doc_id + 3000000000000 AS doc_id FROM documents "
    "WHERE doc_id % 10 = 3",
)
def x_streaming_index_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental dedup, driver-verified
    (streaming/pipeline.dedup_stream_against_index): the planted batch
    replays through a file-source stream (several files → several
    micro-batches under availableNow) and every micro-batch is screened
    against the STATIC minhash index of the base corpus via foreachBatch
    + the batch kernel; survivors append to a parquet sink. The sink
    must hold exactly the fresh docs — batch boundaries cannot change
    the decision because each batch screens independently against the
    same static index."""
    import shutil
    import tempfile

    from purescript_ifrit_spark.operators.dedup import build_minhash_index
    from purescript_ifrit_spark.streaming.pipeline import (
        dedup_stream_against_index,
    )
    from purescript_ifrit_spark.suite._fixtures import _planted_pieces

    base, exact_var, near_var = _planted_pieces(spark, sf_dir)
    fresh_toks = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda k: F.concat(
            F.lit("f"), F.col("doc_id").cast("string"), F.lit("x"),
            k.cast("string"),
        ),
    )
    fresh = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 10 == 3)
        .select(
            (F.col("doc_id") + 3_000_000_000_000).alias("doc_id"),
            F.array_join(fresh_toks, " ").alias("text"),
        )
    )
    index = build_minhash_index(base, "doc_id", "text").localCheckpoint(
        eager=True
    )
    staged = tempfile.mkdtemp(prefix="ifrit_sid_in_")
    out_dir = tempfile.mkdtemp(prefix="ifrit_sid_out_")
    ckpt = tempfile.mkdtemp(prefix="ifrit_sid_ck_")
    try:
        batch = exact_var.unionAll(near_var).unionAll(fresh)
        # several files → several micro-batches (order irrelevant: every
        # batch screens against the same static index)
        batch.repartition(4).write.mode("overwrite").parquet(staged)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )
        q = dedup_stream_against_index(
            stream, index, "doc_id", "text", out_dir,
            checkpoint_dir=ckpt, est_threshold=0.5,
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir).select("doc_id").localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


@register(
    "x_streaming_index_fold",
    # the fold closes the within-stream-duplicates gap, planted truth:
    # phase 1 streams a FRESH family (ids +3e12, doc_id%10=3) past the
    # base-corpus index — all survive — and the survivor sink is folded
    # back into the index; phase 2 streams EXACT COPIES of that family
    # under new ids (+35e11; identical text → identical signature →
    # estimate 1.0, always ≥ the threshold) plus a genuinely new family
    # (ids +4e12, doc_id%10=7). Only the new family survives phase 2 —
    # without the fold the copies would all leak (pinned by
    # test_fold_stream_into_index_catches_within_stream_duplicates)
    "SELECT doc_id + 4000000000000 AS doc_id FROM documents "
    "WHERE doc_id % 10 = 7",
)
def x_streaming_index_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup index maintenance, driver-verified
    (streaming/pipeline.fold_stream_into_index, VERDICT r9 #4): fold a
    survivor sink back into the static minhash index between two
    availableNow stream runs, so phase 2's exact copies of phase 1's
    survivors are caught while a genuinely new family still passes."""
    import shutil
    import tempfile

    from purescript_ifrit_spark.operators.dedup import build_minhash_index
    from purescript_ifrit_spark.streaming.pipeline import (
        dedup_stream_against_index,
        fold_stream_into_index,
    )
    from purescript_ifrit_spark.suite._fixtures import _planted_pieces

    base, _, _ = _planted_pieces(spark, sf_dir)

    def family(prefix: str, offset: int, residue: int) -> DataFrame:
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda k: F.concat(
                F.lit(prefix), F.col("doc_id").cast("string"), F.lit("x"),
                k.cast("string"),
            ),
        )
        return (
            load_table(spark, sf_dir, "documents")
            .select("doc_id")
            .filter(F.col("doc_id") % 10 == residue)
            .select(
                (F.col("doc_id") + offset).alias("doc_id"),
                F.array_join(toks, " ").alias("text"),
            )
        )

    fresh_a = family("f", 3_000_000_000_000, 3)
    # exact copies of fresh_a's TEXT under new ids (same token stems —
    # built from the same underlying doc_id, re-offset)
    copies = fresh_a.select(
        (F.col("doc_id") + 500_000_000_000).alias("doc_id"), "text"
    )
    fresh_b = family("g", 4_000_000_000_000, 7)

    index = build_minhash_index(base, "doc_id", "text").localCheckpoint(
        eager=True
    )
    dirs = [tempfile.mkdtemp(prefix=f"ifrit_fold_{n}_")
            for n in ("in1", "out1", "ck1", "in2", "out2", "ck2")]
    src1, out1, ck1, src2, out2, ck2 = dirs
    try:
        fresh_a.coalesce(1).write.mode("overwrite").parquet(src1)
        copies.unionAll(fresh_b).repartition(2).write.mode(
            "overwrite"
        ).parquet(src2)

        def run(src: str, idx: DataFrame, out: str, ck: str) -> None:
            q = dedup_stream_against_index(
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                idx, "doc_id", "text", out,
                checkpoint_dir=ck, est_threshold=0.5,
            )
            q.awaitTermination()

        run(src1, index, out1, ck1)
        folded = fold_stream_into_index(
            spark, out1, index, "doc_id", "text"
        ).localCheckpoint(eager=True)
        run(src2, folded, out2, ck2)
        return spark.read.parquet(out2).select("doc_id").localCheckpoint(
            eager=True
        )
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)



# the shared batch-BM25 oracle SQL lives beside the direct-path entry in
# suite/text.py (imported on demand here; text imports before streaming
# in suite/__init__, and text never imports streaming, so no cycle)
from purescript_ifrit_spark.suite.text import _BM25_BATCH_SQL  # noqa: E402


@register(
    "x_streaming_bm25",
    # streaming retrieval against the static BM25 index: the same
    # 3-query fixture as x_bm25_batch, replayed as a file-source stream
    # (3 files → 3 micro-batches) and scored per batch with the indexed
    # kernel — the oracle is x_bm25_batch's SQL verbatim, because batch
    # boundaries cannot change any query's top-k against a static index
    _BM25_BATCH_SQL,
)
def x_streaming_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming batch retrieval, driver-verified
    (streaming/pipeline.score_query_stream, r10): a query stream
    replayed through several micro-batches, each scored against the
    STATIC prebuilt BM25 index with the shared batch kernel; the
    accumulated sink must equal the batch path's per-query top-5
    exactly."""
    import shutil
    import tempfile

    from purescript_ifrit_spark.operators.text_analysis import (
        build_bm25_index,
    )
    from purescript_ifrit_spark.streaming.pipeline import score_query_stream

    docs = load_table(spark, sf_dir, "documents")
    qs = spark.createDataFrame(
        [(1, "spark join"), (2, "merge sort"), (3, "customer data")],
        "qid long, qtext string",
    )
    dirs = [tempfile.mkdtemp(prefix=f"ifrit_sbm25_{n}_")
            for n in ("idx", "src", "out", "ck")]
    idx, src, out, ck = dirs
    try:
        postings, doclens = build_bm25_index(docs, "doc_id", "text")
        postings.write.mode("overwrite").parquet(f"{idx}/p")
        doclens.write.mode("overwrite").parquet(f"{idx}/l")
        qs.repartition(3).write.mode("overwrite").parquet(src)
        q = score_query_stream(
            spark.readStream.schema("qid long, qtext string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            spark.read.parquet(f"{idx}/p"),
            spark.read.parquet(f"{idx}/l"),
            out, checkpoint_dir=ck, k=5,
        )
        q.awaitTermination()
        return spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)


@register(
    "x_streaming_ann_planted",
    # streaming ANN retrieval against the static planted basis corpus
    # (r12): two query vectors (e_0, e_1) replayed as 2 micro-batches
    # through score_ann_query_stream's exact kernel — the oracle is the
    # x_ann_lsh_batch_planted closed form verbatim, because per-query
    # answers are self-contained against a static corpus, so batch
    # boundaries cannot change any query's top-k: each query returns
    # its whole identical-vector cluster at cosine exactly 1.0
    "SELECT CAST(q.qid AS BIGINT) AS query_id, e.vec_id, "
    "CAST(1.0 AS DOUBLE) AS sim "
    "FROM (SELECT 0 AS qid UNION ALL SELECT 1) q "
    "JOIN embeddings e ON e.vec_id >= q.qid * 6 "
    "AND e.vec_id < q.qid * 6 + 6",
)
def x_streaming_ann_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN scoring, driver-verified
    (streaming/pipeline.score_ann_query_stream, r12): a vector-query
    stream replayed through two micro-batches, each scored against the
    STATIC planted corpus with the shared exact batch kernel
    (cosine_topk_batch); the accumulated sink must equal the closed-form
    per-query clusters."""
    import shutil
    import tempfile

    from purescript_ifrit_spark.streaming.pipeline import (
        score_ann_query_stream,
    )
    from purescript_ifrit_spark.suite.vectors import (
        _planted_basis_embeddings,
    )

    corpus = _planted_basis_embeddings(
        load_table(spark, sf_dir, "embeddings")
    ).localCheckpoint(eager=True)
    e0 = [1.0] + [0.0] * 31
    e1 = [0.0, 1.0] + [0.0] * 30
    qs = spark.createDataFrame(
        [(0, e0), (1, e1)], "qid long, qvec array<double>"
    )
    dirs = [tempfile.mkdtemp(prefix=f"ifrit_sann_{n}_")
            for n in ("src", "out", "ck")]
    src, out, ck = dirs
    try:
        qs.repartition(2).write.mode("overwrite").parquet(src)
        q = score_ann_query_stream(
            spark.readStream.schema("qid long, qvec array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            corpus, out, checkpoint_dir=ck,
            vec_col="embedding", k=6,
        )
        q.awaitTermination()
        return spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
