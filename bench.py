#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also reports dialect compile-throughput (ops/sec) for the five query shapes
the reference benchmarks (BASELINE.md) under the "compile_ops_per_sec" key —
the only metric the reference itself publishes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ifrit-spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        # the driver parses bench stdout — keep progress bars off it
        .config("spark.ui.showConsoleProgress", "false")
        # JIT code cache (r14 optimization round, guide §1.2 step 3 /
        # §7.4): every steady run builds a FRESH plan (the bench
        # contract) and fresh expression IDs make each run's generated
        # whole-stage-codegen classes new — a one-query probe measured
        # ~1.2 MB of code cache per fresh plan (60 MB over 22 plans of
        # the heaviest shape). Measured under this 512m reserve, the
        # sweeper bounds steady-state occupancy well below the 240 MB
        # default (155 MB after a full 70-query window, 113 MB plateau
        # across an 8-window headline floors session — recorded per
        # window as cotenancy.codecache_used_mb), so the default was
        # adequate for today's workloads; the reserve is zero-cost
        # headroom that removes flush churn as a variable for longer
        # sessions, and the recorded occupancy keeps the sizing claim
        # auditable. Not data-scale- or core-count-dependent.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
        .getOrCreate()
    )


def measure_effective_cpus(n: int, spin: int = 6_000_000) -> float:
    """Direct co-tenant CPU probe (r14 optimization round): the canaries
    so far infer contention from query-time symptoms (spread, uniform
    inflation vs reference/floors); this MEASURES the cause. Time one
    fixed CPU-bound spin alone, then `n` of them concurrently in
    subprocesses: effective cpus ≈ n·single/concurrent. On an idle host
    it approaches min(n, physical cores); under hypervisor steal or
    co-tenant load it reads the core count the host actually grants at
    this moment (observed during the r14 optimization round: 3.4 of a
    nominal 32 — /proc/stat steal time exceeded user time). Runs OUTSIDE
    every timed region; quiet-host cost is two ~0.5 s spins."""
    import subprocess

    code = f"x=0\nfor i in range({int(spin)}): x+=i*i"
    argv = [sys.executable, "-c", code]
    start = time.perf_counter()
    subprocess.run(argv, check=False)
    single = time.perf_counter() - start
    start = time.perf_counter()
    procs = [subprocess.Popen(argv) for _ in range(int(n))]
    for p in procs:
        p.wait()
    concurrent = time.perf_counter() - start
    if concurrent <= 0 or single <= 0:
        return float(n)
    return round(min(float(n), n * single / concurrent), 1)


def flag_effective_cpus(variance: dict, nominal: int, probes: dict) -> None:
    """Canary v5 (r14 optimization round): attach the direct CPU probe
    readings to the cotenancy block and flag the window when the host
    granted under 60% of the nominal cores at either edge of the run —
    the one co-tenancy signature no quiet-looking spread can hide,
    measured instead of inferred. Mutates variance['cotenancy']."""
    cot = variance["cotenancy"]
    block = dict(probes)
    block["nominal"] = int(nominal)
    cot["effective_cpus"] = block
    vals = [v for k, v in probes.items() if isinstance(v, (int, float))]
    low = [v for v in vals if v < 0.6 * nominal]
    if low:
        cot["noisy"] = True
        cot["flags"].append(
            f"effective_cpus: host granted {min(low)} of {nominal} "
            "nominal cores (direct subprocess spin probe)"
        )


def _codecache_used_mb(spark) -> "float | None":
    """JVM code-cache occupancy (MB) — evidence for the 512m sizing
    above; rides the cotenancy block in both artifacts (~30 chars)."""
    try:
        mf = spark._jvm.java.lang.management.ManagementFactory
        total = 0
        for pool in mf.getMemoryPoolMXBeans():
            name = pool.getName()
            if "CodeHeap" in name or "Code Cache" in name:
                total += pool.getUsage().getUsed()
        return round(total / 1048576.0, 1)
    except Exception:
        return None


def _consume(df) -> None:
    """Execute the FULL plan. count() would let Catalyst prune every
    projection expression (a text-quality query would time a bare row-count
    scan); the noop sink materializes all columns without driver transfer."""
    df.write.format("noop").mode("overwrite").save()


def bench_queries(
    spark,
    headline_only: bool = False,
    plans_dir: "str | None" = None,
    plans_tag: str = "before",
) -> "tuple[dict, dict, dict]":
    from pyspark.sql import functions as F

    from purescript_ifrit_spark.api import run_query
    from purescript_ifrit_spark.operators import dedup, similarity
    from purescript_ifrit_spark.operators.joins import orders_enriched
    from purescript_ifrit_spark.operators.text_analysis import quality_score
    from purescript_ifrit_spark.operators.windows import session_stats, tumbling_agg
    from purescript_ifrit_spark.sources.tables import load_table

    t = {n: load_table(spark, SF_DIR, n) for n in
         ("lineitem", "orders", "customer", "nation", "region",
          "events", "documents", "embeddings", "part")}

    def q1_pricing_summary():
        return run_query(
            spark, t["lineitem"],
            "SELECT AVG(l_quantity) AS avg_qty, SUM(l_extendedprice) AS sum_price, "
            "COUNT(l_orderkey) AS n WHERE l_quantity < 50 GROUP BY l_returnflag",
        )

    def q2_filter_topk():
        return run_query(
            spark, t["orders"],
            "SELECT o_orderkey, o_totalprice WHERE o_orderstatus = \"F\" "
            "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100",
        )

    def q3_star_join():
        return orders_enriched(
            t["orders"], t["customer"], t["nation"], t["region"]
        ).groupBy("r_name").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("total"),
        )

    def q4_sessionize():
        return session_stats(t["events"], "user_id", "ts", 30)

    def q5_events_hourly():
        return tumbling_agg(t["events"], "ts", "hour", ("event_type",))

    def q6_dedup_minhash():
        # default geometry (16 lanes, b=8 r=2 — see minhash_candidate_pairs)
        return dedup.dedup_minhash(
            t["documents"], "doc_id", "text", jaccard_threshold=0.8,
        )

    def q7_ann_brute():
        emb = t["embeddings"]
        query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
        return similarity.cosine_topk(emb, "vec_id", "embedding", query, 100)

    def q8_nested_array_agg():
        items = t["lineitem"].groupBy("l_orderkey").agg(
            F.collect_list(F.struct(F.col("l_quantity").alias("qty"))).alias("items")
        )
        return run_query(
            spark, items,
            "SELECT l_orderkey, AVG(items.qty) AS avg_qty, MAX(items.qty) AS max_qty",
        )

    def q9_text_quality():
        return quality_score(t["documents"], "text")

    def q10_curation():
        from purescript_ifrit_spark.operators.pipeline import curate

        return curate(t["documents"], min_quality=0.2)

    queries = {
        "q1_pricing_summary": q1_pricing_summary,
        "q2_filter_topk": q2_filter_topk,
        "q3_star_join": q3_star_join,
        "q4_sessionize": q4_sessionize,
        "q5_events_hourly": q5_events_hourly,
        "q6_dedup_minhash": q6_dedup_minhash,
        "q7_ann_brute": q7_ann_brute,
        "q8_nested_array_agg": q8_nested_array_agg,
        "q9_text_quality": q9_text_quality,
        "q10_curation": q10_curation,
    }

    # round-2 additions, timed under a SEPARATE key so the headline total
    # stays comparable across rounds
    def qx_asof_join():
        from purescript_ifrit_spark.operators.temporal import asof_join

        ev = t["events"]
        right = (
            ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id", "ts")
            .agg(F.max("event_id").alias("anchor_id"))
        )
        return asof_join(
            ev.filter(F.col("event_type") != "purchase"),
            right,
            on="user_id",
            left_ts="ts",
            payload=["anchor_id"],
        )

    def qx_rollup_multi():
        from purescript_ifrit_spark.operators.temporal import rollup_time

        return rollup_time(t["events"], "ts", ["event_type"], "value")

    def qx_range_join():
        from purescript_ifrit_spark.operators.temporal import range_join_points

        ev = t["events"]
        iv = ev.filter(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("ts").alias("w_start"),
            F.timestamp_micros(
                F.unix_micros("ts") + F.lit(6 * 3_600_000_000)
            ).alias("w_end"),
            F.col("event_id").alias("anchor_id"),
        )
        return range_join_points(
            ev.filter(F.col("event_type") != "purchase"), iv,
            on="user_id", ts_col="ts", start_col="w_start", end_col="w_end",
            bucket_width_us=6 * 3_600_000_000,
        )

    def qx_term_stats():
        from purescript_ifrit_spark.operators.text_analysis import term_stats

        return term_stats(t["documents"], "doc_id", "text")

    def qx_contamination():
        from purescript_ifrit_spark.operators.contamination import (
            ngram_contamination,
        )

        docs = t["documents"]
        bench = docs.filter(F.col("doc_id") % 100 == 0).select(
            F.col("doc_id").alias("bench_id"), "text"
        )
        return ngram_contamination(docs, bench, n=8, min_frac=0.5)

    def qx_token_rarity():
        from purescript_ifrit_spark.operators.text_analysis import (
            token_rarity_stats,
        )

        return token_rarity_stats(t["documents"], "doc_id", "text")

    def qx_robust_outliers():
        from purescript_ifrit_spark.operators.windows import robust_outliers

        return robust_outliers(t["events"], "user_id", "value")

    def qx_funnel():
        from purescript_ifrit_spark.operators.funnels import funnel_counts

        return funnel_counts(
            t["events"], "user_id", "ts", "event_type",
            ["view", "click", "purchase"],
        )

    def qx_retention():
        from purescript_ifrit_spark.operators.funnels import retention_cohorts

        return retention_cohorts(t["events"], "user_id", "ts")

    def qx_dau():
        from purescript_ifrit_spark.operators.windows import (
            distinct_users_windowed,
        )

        return distinct_users_windowed(t["events"])

    def qx_ohlc_bars():
        from purescript_ifrit_spark.operators.windows import ohlc_bars

        return ohlc_bars(t["events"])

    def qx_shuffle_shards():
        from purescript_ifrit_spark.operators.sampling import shuffle_shards

        return shuffle_shards(t["documents"].select("doc_id", "lang"), "doc_id", 64)

    def qx_simhash_pairs():
        from purescript_ifrit_spark.operators.dedup import (
            simhash_candidate_pairs,
        )

        return simhash_candidate_pairs(t["documents"], "doc_id", "text")

    def qx_blocklist_dedup():
        from purescript_ifrit_spark.functions import text as X
        from purescript_ifrit_spark.operators.dedup import (
            dedup_against_blocklist,
        )

        docs = t["documents"]
        block = docs.filter(F.col("doc_id") % 7 == 0).select(
            X.fingerprint(F.col("text")).alias("fingerprint")
        )
        return dedup_against_blocklist(docs, block)

    def qx_bigram_xent():
        from purescript_ifrit_spark.operators.text_analysis import (
            bigram_logprob,
        )

        return bigram_logprob(t["documents"], "doc_id", "text")

    def qx_heavy_hitters():
        from purescript_ifrit_spark.functions import text as X
        from purescript_ifrit_spark.operators.sketches import (
            heavy_hitters_mg,
        )

        toks = t["documents"].select(
            F.explode(X.tokens(F.col("text"))).alias("tok")
        ).filter(F.col("tok") != "")
        return heavy_hitters_mg(toks, "tok", 20, capacity=256)

    def qx_video_stats():
        from purescript_ifrit_spark.operators.multimodal import (
            extract_video_stats,
            synth_ppm_video,
        )

        ids = t["documents"].select("doc_id")
        return extract_video_stats(synth_ppm_video(ids), every_n=2)

    def qx_temperature_mix():
        from purescript_ifrit_spark.functions import text as X
        from purescript_ifrit_spark.operators.sampling import temperature_mix

        docs = t["documents"].withColumn(
            "n_tok", X.token_count(F.col("text")).cast("long")
        )
        return temperature_mix(docs, "doc_id", "n_tok", "source", 100_000)

    def qx_subdoc_dedup():
        from purescript_ifrit_spark.operators.dedup import dedup_subdocument

        return dedup_subdocument(t["documents"], "doc_id", "text", 32)

    def qx_unigram_xent():
        from purescript_ifrit_spark.operators.text_analysis import (
            unigram_logprob,
        )

        return unigram_logprob(t["documents"], "doc_id", "text")

    def qx_winsorize():
        from purescript_ifrit_spark.operators.windows import winsorize

        return winsorize(t["events"], "value", group_col="event_type")

    def qx_quantile_normalize():
        from purescript_ifrit_spark.operators.windows import quantile_normalize

        return quantile_normalize(t["events"], "value", group_col="event_type")

    def qx_training_shards():
        from purescript_ifrit_spark.operators.pipeline import (
            training_shard_pipeline,
        )

        return training_shard_pipeline(
            t["documents"], total_budget=100_000, n_shards=16
        )

    def qx_image_dedup():
        from purescript_ifrit_spark.operators.multimodal import (
            image_neardup_pairs,
            synth_ppm_media,
        )

        ids = t["documents"].select("doc_id").filter(F.col("doc_id") < 500)
        m1 = synth_ppm_media(ids)
        m2 = m1.select(
            (F.col("media_id") + 1_000_000_000_000).alias("media_id"),
            "payload",
            "meta",
        )
        return image_neardup_pairs(
            m1.unionByName(m2), max_hamming=0, exact_confirm=True,
            max_bucket=None,
        )

    def qx_cms_probe():
        from purescript_ifrit_spark.functions import text as X
        from purescript_ifrit_spark.operators.sketches import cms_frequencies

        toks = t["documents"].select(
            F.explode(X.tokens(F.col("text"))).alias("tok")
        ).filter(F.col("tok") != "")
        return cms_frequencies(
            toks, "tok", ["the", "spark", "table", "query", "zzz_absent"]
        )

    def qx_bm25():
        from purescript_ifrit_spark.operators.text_analysis import bm25_topk

        return bm25_topk(
            t["documents"], "doc_id", "text",
            ["spark", "window", "merge"], k=20,
        )

    def qx_dsir():
        from purescript_ifrit_spark.operators.text_analysis import (
            dsir_weights,
        )

        docs = t["documents"]
        return dsir_weights(
            docs.filter(F.col("doc_id") % 2 == 1),
            docs.filter(F.col("doc_id") % 2 == 0),
            dim=1024,
        )

    def qx_bm25_batch():
        from purescript_ifrit_spark.operators.text_analysis import (
            bm25_topk_queries,
        )

        qs = spark.createDataFrame(
            [(1, "spark join"), (2, "merge sort"), (3, "customer data"),
             (4, "window filter"), (5, "table scan")],
            "qid long, qtext string",
        )
        return bm25_topk_queries(
            t["documents"], "doc_id", "text", qs, "qid", "qtext", k=10
        )

    def qx_rrf_fusion():
        from purescript_ifrit_spark.functions import text as X
        from purescript_ifrit_spark.operators.text_analysis import rrf_fuse

        docs = t["documents"]
        ra = (
            docs.select(
                "doc_id",
                X.token_count(F.col("text")).cast("long").alias("s"),
            )
            .orderBy(F.col("s").desc(), F.col("doc_id").asc())
            .limit(200)
        )
        rb = (
            docs.select(
                "doc_id", ((F.col("doc_id") * 31 + 7) % 1000).alias("s")
            )
            .orderBy(F.col("s").desc(), F.col("doc_id").asc())
            .limit(200)
        )
        return rrf_fuse([(ra, "s"), (rb, "s")], "doc_id", k=50)

    def qx_rrf_batch():
        # the r10 batch-fusion stack: per-query candidates from two
        # deterministic scorers, fused on ONE qid-keyed exchange
        from pyspark.sql import Window

        from purescript_ifrit_spark.operators.text_analysis import (
            rrf_fuse_queries,
        )

        docs = t["documents"]

        def system(mult, off):
            parts = []
            for qid in (1, 2, 3, 4):
                s = (F.col("doc_id") * mult + off * qid) % 1000
                w = Window.orderBy(F.col("s").desc(), F.col("doc_id").asc())
                parts.append(
                    docs.select(
                        F.lit(qid).cast("long").alias("qid"), "doc_id",
                        s.alias("s"),
                    )
                    .withColumn("_r", F.row_number().over(w))
                    .filter(F.col("_r") <= 100)
                    .drop("_r")
                )
            out = parts[0]
            for p in parts[1:]:
                out = out.unionAll(p)
            return out

        return rrf_fuse_queries(
            [(system(17, 1), "s"), (system(31, 7), "s")],
            "qid", "doc_id", k=20,
        )

    def qx_ann_batch():
        # batch brute ANN (r10 partial-top-k shape): 64 query vectors
        # against the whole embeddings table in one plan
        import numpy as np

        rng = np.random.default_rng(7)
        return similarity.cosine_topk_batch(
            t["embeddings"], "vec_id", "embedding",
            rng.standard_normal((64, 64)), list(range(64)), k=10,
        )

    def qx_ivf_batch():
        # batch IVF ANN: same 64 queries through the cell-pruned path
        import numpy as np

        rng = np.random.default_rng(7)
        cents = similarity.ivf_centroids(
            t["embeddings"], "embedding", nlist=16, seed=42
        )
        return similarity.ivf_topk_batch(
            t["embeddings"], "vec_id", "embedding",
            rng.standard_normal((64, 64)), list(range(64)), cents,
            k=10, nprobe=4,
        )

    def qx_jpeg_decode():
        from purescript_ifrit_spark.operators.multimodal import (
            extract_pixel_stats,
            synth_jpeg_media,
        )

        ids = t["documents"].select("doc_id")
        return extract_pixel_stats(synth_jpeg_media(ids), codec="jpeg")

    def qx_leakage_split():
        from purescript_ifrit_spark.operators.sampling import (
            leakage_safe_split,
        )

        docs = t["documents"].select("doc_id")
        pairs = docs.filter(F.col("doc_id") % 2 == 1).select(
            (F.col("doc_id") - 1).alias("id_a"),
            F.col("doc_id").alias("id_b"),
        )
        return leakage_safe_split(docs, "doc_id", pairs)

    def qx_span_dedup():
        from purescript_ifrit_spark.operators.dedup import span_dedup_stats

        return span_dedup_stats(t["documents"], "doc_id", "text", n=3)

    def qx_fuzzy_join():
        from purescript_ifrit_spark.operators.joins import fuzzy_key_join

        # UNIQUE keys (name + partkey suffix): the raw synthetic p_name
        # has only 64 distinct values over 20k rows at sf0.1, so raw
        # names make the TRUE answer ~6M pairs (300×300 per name group)
        # — that measures output materialization, not the join. Unique
        # keys measure the machinery: ~1 match per probe.
        part = t["part"]
        o = part.select(
            F.col("p_partkey").alias("oid"),
            F.expr("p_name || '-' || p_partkey").alias("okey"),
        )
        e = part.select(
            F.col("p_partkey").alias("eid"),
            F.expr(
                "substr(p_name, 1, p_partkey % 5) || 'x' || "
                "substr(p_name, (p_partkey % 5) + 2) || '-' || p_partkey"
            ).alias("ekey"),
        )
        return fuzzy_key_join(o, e, "okey", "ekey", max_dist=1)

    def qx_kmeans():
        from purescript_ifrit_spark.operators.clustering import kmeans_lloyd

        emb = t["embeddings"]
        q = emb.select(
            "vec_id",
            F.array(
                *[
                    (
                        F.floor(
                            F.element_at("embedding", i + 1).cast("double")
                            * 1000
                        )
                        + 1024
                    ).cast("long")
                    for i in range(8)
                ]
            ).alias("qv"),
        )
        seeds = [
            list(r["qv"])
            for r in q.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
        ]
        out, _ = kmeans_lloyd(q, "qv", seeds, n_iter=3)
        return out.select("vec_id", "cluster")

    def qx_gopher():
        from purescript_ifrit_spark.operators.text_analysis import (
            gopher_quality_flags,
        )

        return gopher_quality_flags(t["documents"])

    def qx_pagerank():
        from purescript_ifrit_spark.operators.graph import (
            power_iteration_ranks,
        )
        from pyspark.sql import functions as FF

        edges = (
            t["events"]
            .select(
                FF.col("user_id").alias("src"),
                ((FF.col("user_id") * 31 + 7) % 997).alias("dst"),
            )
            .filter(FF.col("src") != FF.col("dst"))
            .distinct()
        )
        return power_iteration_ranks(edges, n_iter=5)

    def qx_c4_lines():
        from purescript_ifrit_spark.operators.text_cleaning import (
            c4_line_filter,
        )

        docs = t["documents"]
        # synthesize lines (the corpus is single-line): break on ' the '
        lined = docs.select(
            "doc_id",
            F.regexp_replace(F.col("text"), " the ", "\n").alias("text"),
        )
        out = c4_line_filter(lined, "doc_id", "text")
        return out.select("doc_id", "n_lines", "n_kept", "c4_pass")

    def qx_line_dedup():
        from purescript_ifrit_spark.operators.dedup import dedup_lines_global

        docs = t["documents"]
        lined = docs.select(
            "doc_id",
            F.regexp_replace(F.col("text"), " the ", "\n").alias("text"),
        )
        out = dedup_lines_global(lined, "doc_id", "text")
        return out.select("doc_id", "n_lines", "n_kept")

    def qx_jaccard_prefix():
        from purescript_ifrit_spark.functions import text as X
        from purescript_ifrit_spark.operators.dedup import jaccard_join_prefix

        # shingle SETS (3-word): mostly unique per doc, so the prefix
        # index stays rare-token-bucketed — the scale-path shape (token
        # UNIGRAM sets on this tiny-vocab corpus would be degenerate
        # near-identical sets, an adversarial input, not the design
        # point)
        sets = t["documents"].select(
            "doc_id", X.word_shingles(F.col("text"), 3).alias("sh")
        )
        return jaccard_join_prefix(sets, "doc_id", "sh", 8, 10)

    def qx_cdc_chunks():
        from purescript_ifrit_spark.operators.text_analysis import (
            cdc_chunk_documents,
        )

        out = cdc_chunk_documents(t["documents"])
        return out.select("doc_id", "chunk_idx", "chunk_fp")

    def qx_semdedup():
        from purescript_ifrit_spark.operators.clustering import semdedup

        emb = t["embeddings"]
        q = emb.select(
            "vec_id",
            F.array(
                *[
                    (
                        F.floor(
                            F.element_at("embedding", i + 1).cast("double")
                            * 1000
                        )
                        + 1024
                    ).cast("long")
                    for i in range(8)
                ]
            ).alias("qv"),
        )
        # k=64 bounds the within-cluster quadratic (the production
        # shape); threshold 9999/10000 because offset-translated vectors
        # compress toward the diagonal
        seeds = [
            list(r["qv"])
            for r in q.filter(F.col("vec_id") < 64).orderBy("vec_id").collect()
        ]
        out = semdedup(
            q, "vec_id", "qv", seeds, n_iter=2,
            threshold_num=9999, threshold_den=10000,
        )
        return out.select("vec_id", "cluster", "keep")

    def qx_chat_stats():
        # session-3 chat family: the planted 5-turn conversation shape
        # from the suite entry, full stats + alternation HOF
        from purescript_ifrit_spark.operators.chat import conversation_stats
        from purescript_ifrit_spark.suite.chat import _planted_msgs

        return conversation_stats(_planted_msgs(spark, SF_DIR))

    def qx_zorder_layout():
        # session-3 layout family: Z-order vs linear 64-file pruning A/B
        from purescript_ifrit_spark.suite.layout import x_layout_pruning

        return x_layout_pruning(spark, SF_DIR)

    def qx_robots():
        from purescript_ifrit_spark.suite.text import x_robots_filter

        return x_robots_filter(spark, SF_DIR)

    def qx_inverted_index():
        # delegate to the attested suite entry so the bench measures
        # EXACTLY the query the driver verifies (qx_interval_join style)
        from purescript_ifrit_spark.suite.text import x_inverted_index

        return x_inverted_index(spark, SF_DIR)

    def qx_interval_join():
        from purescript_ifrit_spark.suite.joins import x_interval_join

        return x_interval_join(spark, SF_DIR)

    def qx_twap():
        from purescript_ifrit_spark.suite.analytics import (
            x_time_weighted_avg,
        )

        return x_time_weighted_avg(spark, SF_DIR)

    def qx_markdown():
        from purescript_ifrit_spark.suite.text import x_markdown_sections

        return x_markdown_sections(spark, SF_DIR)

    def qx_gap_fill():
        from purescript_ifrit_spark.suite.analytics import x_gap_fill_locf

        return x_gap_fill_locf(spark, SF_DIR)

    def qx_jl_project():
        from purescript_ifrit_spark.operators.vectorize import (
            JL_IN_DIM,
            JL_OUT_DIM,
            jl_project,
            jl_quantize_sql,
        )

        q = t["embeddings"].select(
            "vec_id", F.expr(jl_quantize_sql("embedding")).alias("qv")
        )
        return jl_project(q, "vec_id", "qv", JL_IN_DIM, JL_OUT_DIM)

    # r11 stored-layout extras: the one-time index/layout writes happen
    # HERE (extras-dict construction, outside the per-run timing), so
    # the timed plans measure what production pays per query batch —
    # scoring/probing the AT-REST layout, never the build. Skipped
    # entirely in headline_only (rebaseline) mode, which never runs the
    # extras that read these layouts.
    import atexit as _atexit
    import shutil as _shutil
    import tempfile as _tf

    if not headline_only:
        _r11_dir = _tf.mkdtemp(prefix="bench_r11_layouts_")
        # scratch layouts are per-process: without this, repeated bench
        # runs accumulate multi-MB parquet trees in /tmp (r12, ADVICE r11)
        _atexit.register(_shutil.rmtree, _r11_dir, ignore_errors=True)
        from purescript_ifrit_spark.operators.text_analysis import (
            bm25_topk_queries_indexed as _bm25_idx,
            build_bm25_index as _build_idx,
        )

        _p, _l = _build_idx(t["documents"], "doc_id", "text")
        (
            _p.repartitionByRange(8, "term").sortWithinPartitions("term")
            .write.mode("overwrite").parquet(f"{_r11_dir}/postings")
        )
        _l.write.mode("overwrite").parquet(f"{_r11_dir}/doclens")
        _cents16 = similarity.ivf_centroids(
            t["embeddings"], "embedding", nlist=16, seed=42
        )
        similarity.write_ivf_partitioned(
            t["embeddings"], "embedding", _cents16, f"{_r11_dir}/ivf"
        )
        # r12 at-rest PQ codes: codebooks + encode are the one-time index
        # build; the timed extra ranks the STORED codes (ADC), never
        # vectors
        _pq_books = similarity.pq_codebooks(
            t["embeddings"], "embedding", m=8, k=16, seed=42
        )
        similarity.pq_encode(
            t["embeddings"].select("vec_id", "embedding"), "embedding",
            _pq_books,
        ).select("vec_id", "pq_code").write.mode("overwrite").parquet(
            f"{_r11_dir}/pq_codes"
        )
        # r13 at-rest residual IVF-PQ: the COMPOSED stored index (cell
        # partitions x residual codes); the timed extra probes it with
        # PartitionFilters pruning + per-cell ADC, never touching vectors
        _res_books = similarity.pq_codebooks(
            similarity.with_ivf_residual(
                similarity.with_ivf_assignment(
                    t["embeddings"], "embedding", _cents16
                ),
                "embedding", _cents16,
            ),
            "residual", m=8, k=16, seed=42,
        )
        # keep_vector=True so the r14 composed-rerank extra can read its
        # exact-rerank side from the SAME layout; the shortlist extra's
        # scan is unaffected (columnar: it still reads only id/cell/code)
        similarity.write_ivf_pq_partitioned(
            t["embeddings"].select("vec_id", "embedding"), "vec_id",
            "embedding", _cents16, _res_books, f"{_r11_dir}/ivfpq",
            residual=True, keep_vector=True,
        )

    def qx_bm25_indexed_pruned():
        # stored term-sorted index + scan-level vocab screen (r11)
        qs = spark.createDataFrame(
            [(1, "spark join"), (2, "merge sort"), (3, "customer data"),
             (4, "window frame")],
            "qid long, qtext string",
        )
        return _bm25_idx(
            spark.read.parquet(f"{_r11_dir}/postings"),
            spark.read.parquet(f"{_r11_dir}/doclens"),
            qs, "qid", "qtext", "doc_id", k=10,
            prune_scan_terms=True, scoring_partitions=0,
        )

    def qx_ivf_partitioned():
        # batch IVF over the hive-partitioned at-rest layout: probed
        # cells arrive via PartitionFilters, unprobed files unread
        import numpy as np

        rng = np.random.default_rng(7)
        return similarity.ivf_topk_batch(
            spark.read.parquet(f"{_r11_dir}/ivf"),
            "vec_id", "embedding",
            rng.standard_normal((64, 64)), list(range(64)), _cents16,
            k=10, nprobe=4, cell_col="ivf_cell",
        )

    def qx_ann_recall():
        # measured recall of the qx_ivf_batch answer (r11 helper): one
        # extra sampled brute pass + metadata-sized hit join
        import numpy as np

        rng = np.random.default_rng(7)
        queries = rng.standard_normal((64, 64))
        approx = similarity.ivf_topk_batch(
            t["embeddings"], "vec_id", "embedding", queries,
            list(range(64)), _cents16, k=10, nprobe=4,
        )
        return similarity.ann_recall_estimate(
            t["embeddings"], "vec_id", "embedding", queries,
            list(range(64)), approx, k=10, n_sample=16,
        )

    def qx_pq_batch():
        # r12 compressed-domain batch ANN: 64 queries ADC-ranked against
        # the stored (id, code) table — the scan never touches vectors
        import numpy as np

        rng = np.random.default_rng(7)
        return similarity.pq_topk_batch(
            spark.read.parquet(f"{_r11_dir}/pq_codes"),
            "vec_id", "pq_code",
            rng.standard_normal((64, 64)), list(range(64)), _pq_books,
            k=10,
        )

    def qx_ivf_pq_at_rest():
        # r13 composed stored index: 64 queries against the
        # hive-partitioned residual-code layout — probed cells arrive
        # via PartitionFilters, surviving rows are 8 code bytes, ADC
        # per-cell LUTs ride the Arrow closure
        import numpy as np

        rng = np.random.default_rng(7)
        return similarity.ivf_pq_topk_residual_batch(
            spark.read.parquet(f"{_r11_dir}/ivfpq"),
            "vec_id", "pq_code",
            rng.standard_normal((64, 64)), list(range(64)),
            _res_books, _cents16, k=10, nprobe=4,
        )

    def qx_ivf_pq_rerank():
        # r14 composed stored path end-to-end: PartitionFilters cell
        # probe -> residual-ADC shortlist -> exact rerank whose vector
        # scan is ALSO cell-pruned (VERDICT r13 #1 fix) with the
        # shortlist ids pushed into row-group stats (pushdown_ids)
        import numpy as np

        rng = np.random.default_rng(7)
        return similarity.ivf_pq_rerank_batch(
            spark.read.parquet(f"{_r11_dir}/ivfpq"),
            "vec_id", "embedding", "pq_code",
            rng.standard_normal((64, 64)), list(range(64)),
            _res_books, _cents16, k=10, nprobe=4, overfetch=2,
            pushdown_ids=True,
        )

    def qx_neardup_tables():
        # r12 multi-table OR-construction near-dup mining (T=4 x 12
        # planes): narrow band exchange + candidate-sized verification
        tabs = [
            similarity.make_hyperplanes(64, 12, seed=100 + s)
            for s in range(4)
        ]
        return similarity.embedding_neardup_pairs(
            t["embeddings"], "vec_id", "embedding", 0.9, tables=tabs
        )

    extra_queries = {
        "qx_asof_join": qx_asof_join,
        "qx_c4_lines": qx_c4_lines,
        "qx_line_dedup": qx_line_dedup,
        "qx_jaccard_prefix": qx_jaccard_prefix,
        "qx_cdc_chunks": qx_cdc_chunks,
        "qx_semdedup": qx_semdedup,
        "qx_span_dedup": qx_span_dedup,
        "qx_gopher": qx_gopher,
        "qx_pagerank": qx_pagerank,
        "qx_rollup_multi": qx_rollup_multi,
        "qx_range_join": qx_range_join,
        "qx_term_stats": qx_term_stats,
        "qx_contamination": qx_contamination,
        "qx_token_rarity": qx_token_rarity,
        "qx_robust_outliers": qx_robust_outliers,
        "qx_funnel": qx_funnel,
        "qx_retention": qx_retention,
        "qx_dau": qx_dau,
        "qx_ohlc_bars": qx_ohlc_bars,
        "qx_shuffle_shards": qx_shuffle_shards,
        "qx_subdoc_dedup": qx_subdoc_dedup,
        "qx_unigram_xent": qx_unigram_xent,
        "qx_simhash_pairs": qx_simhash_pairs,
        "qx_blocklist_dedup": qx_blocklist_dedup,
        "qx_bigram_xent": qx_bigram_xent,
        "qx_heavy_hitters": qx_heavy_hitters,
        "qx_temperature_mix": qx_temperature_mix,
        "qx_video_stats": qx_video_stats,
        "qx_winsorize": qx_winsorize,
        "qx_quantile_normalize": qx_quantile_normalize,
        "qx_training_shards": qx_training_shards,
        "qx_cms_probe": qx_cms_probe,
        "qx_image_dedup": qx_image_dedup,
        "qx_bm25": qx_bm25,
        "qx_bm25_batch": qx_bm25_batch,
        "qx_dsir": qx_dsir,
        "qx_rrf_fusion": qx_rrf_fusion,
        "qx_rrf_batch": qx_rrf_batch,
        "qx_ann_batch": qx_ann_batch,
        "qx_ivf_batch": qx_ivf_batch,
        "qx_jpeg_decode": qx_jpeg_decode,
        "qx_leakage_split": qx_leakage_split,
        "qx_fuzzy_join": qx_fuzzy_join,
        "qx_kmeans": qx_kmeans,
        "qx_chat_stats": qx_chat_stats,
        "qx_zorder_layout": qx_zorder_layout,
        "qx_robots": qx_robots,
        "qx_inverted_index": qx_inverted_index,
        "qx_jl_project": qx_jl_project,
        "qx_interval_join": qx_interval_join,
        "qx_gap_fill": qx_gap_fill,
        "qx_twap": qx_twap,
        "qx_markdown": qx_markdown,
        "qx_bm25_indexed_pruned": qx_bm25_indexed_pruned,
        "qx_ivf_partitioned": qx_ivf_partitioned,
        "qx_ann_recall": qx_ann_recall,
        "qx_pq_batch": qx_pq_batch,
        "qx_ivf_pq_at_rest": qx_ivf_pq_at_rest,
        "qx_ivf_pq_rerank": qx_ivf_pq_rerank,
        "qx_neardup_tables": qx_neardup_tables,
    }

    if plans_dir is not None:
        # measurement facility (optimization rounds, guide §1): write the
        # formatted explain of EVERY benched query to
        # <plans_dir>/<name>_<tag>.txt — the plan evidence the judge
        # checks optimization claims against. Never runs the queries.
        import pathlib

        pathlib.Path(plans_dir).mkdir(parents=True, exist_ok=True)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        for name, fn in {**queries, **extra_queries}.items():
            df = fn()
            txt = df._jdf.queryExecution().explainString(mode)
            with open(
                f"{plans_dir}/{name}_{plans_tag}.txt", "w"
            ) as fh:
                fh.write(txt)
        return {}, {}, {}, {}

    # JVM warm-up (parquet footers, codegen)
    t["lineitem"].count()

    # Each query runs 1 cold + STEADY_RUNS timed repeats from a
    # freshly-built plan: the first run pays one-time whole-stage-codegen
    # JIT (janino) for its expression tree; steady-state is the MIN of the
    # repeats (single samples swing ±40% with page-cache/GC state on a
    # shared host — min reports the engine's achievable throughput, the
    # number that matters on a long-lived cluster). Raised min-of-2 →
    # min-of-4 and added per-query median + relative spread to the output
    # (VERDICT r4 #3): one noisy co-tenant window now shows up AS spread
    # in the JSON instead of silently printing a regression. clearCache
    # between runs keeps the steady number honest: operators that persist
    # an intermediate WITHIN one execution (q10 curation) must not get a
    # free cross-run cache hit — every run re-executes the full pipeline.
    def _release_all(spark):
        # clearCache drops the SQL cache but NOT raw RDD persists —
        # localCheckpoint blocks (LSH pair lists) would otherwise
        # accumulate across queries and squeeze executor memory for the
        # later ones (measured: q10 +35% when run after q6's checkpoints)
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()

    def _run(qs, steady_runs=4):
        import statistics

        times, cold, medians, spreads = {}, {}, {}, {}
        for name, fn in qs.items():
            start = time.perf_counter()
            _consume(fn())
            cold[name] = round(time.perf_counter() - start, 3)
            steady = []
            for _ in range(steady_runs):
                _release_all(spark)
                start = time.perf_counter()
                _consume(fn())
                steady.append(time.perf_counter() - start)
            times[name] = round(min(steady), 3)
            medians[name] = round(statistics.median(steady), 3)
            # (max-min)/min: 0 on a quiet host; >0.25 flags co-tenant noise
            spreads[name] = round(
                (max(steady) - min(steady)) / max(min(steady), 1e-9), 3
            )
            _release_all(spark)
        return times, cold, medians, spreads

    if headline_only:
        # rebaseline windows measure ONLY the ten headline queries —
        # the extras and compile throughput are not part of
        # BENCH_REFERENCE.json's contract
        times, cold, medians, spreads = _run(queries)
        variance = {
            "steady_runs": 4,
            "median": medians,
            "rel_spread": spreads,
            "extra_median": {},
            "extra_rel_spread": {},
            "max_rel_spread": round(max(spreads.values()), 3),
        }
        flags = []
        if variance["max_rel_spread"] > 1.0:
            flags.append(
                f"max_rel_spread {variance['max_rel_spread']} > 1.0"
            )
        for canary in ("q2_filter_topk", "q5_events_hourly"):
            s = spreads.get(canary)
            if s is not None and s > 0.30:
                flags.append(f"{canary} rel_spread {s} > 0.30")
        variance["cotenancy"] = {"noisy": bool(flags), "flags": flags}
        return times, cold, {}, variance

    times, cold, medians, spreads = _run(queries)
    extra, _, extra_medians, extra_spreads = _run(extra_queries)
    variance = {
        "steady_runs": 4,
        "median": medians,
        "rel_spread": spreads,
        "extra_median": extra_medians,
        "extra_rel_spread": extra_spreads,
        "max_rel_spread": round(
            max(list(spreads.values()) + list(extra_spreads.values())), 3
        ),
    }
    # Co-tenancy self-flag (VERDICT r9 #2): the r9 driver artifact
    # regressed 16.6% with max_rel_spread 4.282 and a 0.63 spread on the
    # 0.126 s q2 — contamination markers that rounds 8-9 adjudicated by
    # narrative. Make them machine-readable instead: max_rel_spread > 1.0
    # (an extra query spiked >2x its min) or the q2/q5 canary — the two
    # shortest headline queries, pure scan+topk / scan+agg shapes whose
    # quiet-host spread is near zero — inflating past 0.30 marks the
    # window noisy IN the artifact.
    flags = []
    if variance["max_rel_spread"] > 1.0:
        flags.append(f"max_rel_spread {variance['max_rel_spread']} > 1.0")
    for canary in ("q2_filter_topk", "q5_events_hourly"):
        s = spreads.get(canary)
        if s is not None and s > 0.30:
            flags.append(f"{canary} rel_spread {s} > 0.30")
    variance["cotenancy"] = {"noisy": bool(flags), "flags": flags}
    return times, cold, extra, variance


def flag_sustained_load(times: dict, variance: dict, sf, cpus: int) -> None:
    """Canary v2 (VERDICT r10 #4): SUSTAINED co-tenant load inflates
    every run about equally, so (max-min)/min stays tight and the spread
    canary is blind — r10's q8 read 1.011 s vs the 0.577 s reference
    with rel_spread 0.073 and sailed past it. Compare each headline
    query's window MIN against the committed per-query reference mins
    and flag `sustained_load` when >=3 headline queries exceed 1.5x
    reference: a real plan regression lands on the specific queries
    whose plan changed, a co-tenant inflates broadly.

    The reference is BENCH_REFERENCE.json — builder-maintained, updated
    only from a window whose own cotenancy block is quiet — NOT
    BENCH_DETAIL.json, which each driver round overwrites with its own
    (possibly noisy) window and would poison the baseline. The check
    only adjudicates runs at the reference's (sf, cpus); elsewhere it
    reports available: false. Mutates variance['cotenancy'] in place so
    the flag rides the existing machine-readable block in BOTH
    artifacts."""
    ref_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_REFERENCE.json"
    )
    sustained: dict = {"available": False, "sustained_load": False}
    try:
        with open(ref_path) as fh:
            ref = json.load(fh)
        ref_q = ref.get("queries", {})
        if ref.get("sf") == sf and ref.get("cpus") == cpus and ref_q:
            inflated = sorted(
                name
                for name, got in times.items()
                if name in ref_q and got > 1.5 * ref_q[name]
            )
            ratios = sorted(
                got / ref_q[name]
                for name, got in times.items()
                if name in ref_q and ref_q[name] > 0
            )
            med = (
                round(ratios[len(ratios) // 2], 3) if ratios else None
            )
            sustained = {
                "available": True,
                "sustained_load": len(inflated) >= 3,
                # canary v3 (r11): UNIFORM sub-1.5x inflation — every
                # query ~1.3-1.5x with tight spreads — trips neither
                # the spread canary nor the >=3-queries-over-1.5x count
                # (observed: a quiet-canary window at median ratio 1.42
                # on byte-identical headline code). The median min/ref
                # ratio across ALL headline queries is the signature a
                # broad co-tenant cannot hide from: a real plan
                # regression moves the specific queries whose plan
                # changed, not the median of ten.
                # SAME-HOST ASSUMPTION (r12, ADVICE r11): the 1.25
                # threshold reads "this machine is slower than the
                # BENCH_REFERENCE machine right now" as co-tenancy. On a
                # legitimately ~30% slower host with the same core count
                # it fires too — by design: the flag means "do not
                # compare these numbers against BENCH_REFERENCE.json",
                # which is equally true there. BENCH_REFERENCE.json may
                # only be refreshed from a window where this block is
                # quiet ON the machine the reference was recorded on
                # (its own contract); a permanently slower host must
                # re-record the reference, not argue with the canary.
                "median_min_ratio": med,
                "uniform_inflation": bool(med and med > 1.25),
            }
            if inflated:
                sustained["inflated"] = inflated
    except (OSError, ValueError):
        pass
    cot = variance["cotenancy"]
    cot["sustained"] = sustained
    if sustained["sustained_load"]:
        cot["noisy"] = True
        cot["flags"].append(
            f"sustained_load: {len(sustained['inflated'])} headline "
            "queries > 1.5x BENCH_REFERENCE.json mins"
        )
    if sustained.get("uniform_inflation"):
        cot["noisy"] = True
        cot["flags"].append(
            f"uniform_inflation: median headline min/ref ratio "
            f"{sustained['median_min_ratio']} > 1.25"
        )


def flag_floor_adjudication(
    times: dict, variance: dict, sf, cpus: int, floors_path: str = None
) -> None:
    """Canary v4 (r14, VERDICT r13 #4): adjudicate the official window
    against SAME-HEAD protocol floors, mechanically. The official driver
    window has been flagged noisy five rounds running and each round's
    verdict had to re-derive 'environmental vs regression' by hand; the
    close-out discipline now ships a BENCH_FLOORS_r{N}.json (the 8-window
    per-query-min protocol, run at close-out HEAD via
    `python bench.py --floors 8 {N}`), and this check records every
    headline query's official-min / same-HEAD-floor ratio next to the
    existing canary blocks. Reading: floors capture what THIS code
    achieves on a quiet-enough moment of THIS machine — an official
    window far above them is host noise; a floor far above the committed
    reference is a code regression (and the rebaseline protocol's
    business, not this check's).

    `floors_path=None` discovers the NEWEST BENCH_FLOORS_r*.json by
    round number; elsewhere (tests) inject a path. Only adjudicates at
    the floors' (sf, cpus). Mutates variance['cotenancy'] in place;
    flags `floor_inflation` (and noisy) when the median ratio exceeds
    1.25 — the uniform_inflation threshold, now against floors the same
    HEAD produced, which a 'legitimately slower code' argument cannot
    reach."""
    import glob
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))
    if floors_path is None:
        cands = []
        for p in glob.glob(os.path.join(here, "BENCH_FLOORS_r*.json")):
            m = _re.search(r"BENCH_FLOORS_r(\d+)\.json$", p)
            if m:
                cands.append((int(m.group(1)), p))
        floors_path = max(cands)[1] if cands else None
    block: dict = {"available": False, "floor_inflation": False}
    try:
        if floors_path is not None:
            with open(floors_path) as fh:
                floors = json.load(fh)
            fq = floors.get("queries", {})
            if floors.get("sf") == sf and floors.get("cpus") == cpus and fq:
                ratios = {
                    name: round(got / fq[name], 3)
                    for name, got in times.items()
                    if name in fq and fq[name] > 0
                }
                ordered = sorted(ratios.values())
                med = (
                    round(ordered[len(ordered) // 2], 3)
                    if ordered
                    else None
                )
                block = {
                    "available": True,
                    "floors_file": os.path.basename(floors_path),
                    "median_floor_ratio": med,
                    "max_floor_ratio": max(ratios.values()) if ratios else None,
                    "floor_inflation": bool(med and med > 1.25),
                }
                # per-query map rides ONLY the detail artifact — the
                # stdout line has a hard tail budget (the r5/r7 lesson)
                variance["floors_ratios"] = ratios
    except (OSError, ValueError, TypeError, AttributeError, KeyError):
        # r14 review fix: a structurally malformed floors file (JSON
        # array at top level -> AttributeError; non-numeric query value
        # -> TypeError) must stand the canary down, not crash main()
        # AFTER every query has already run and before the one stdout
        # line the driver parses
        block = {"available": False, "floor_inflation": False}
    cot = variance["cotenancy"]
    cot["floors"] = block
    if block["floor_inflation"]:
        cot["noisy"] = True
        cot["flags"].append(
            f"floor_inflation: median headline min/floor ratio "
            f"{block['median_floor_ratio']} > 1.25 vs same-HEAD "
            f"{block['floors_file']}"
        )


def rebaseline(n_windows: int = 8, out_name: str = "BENCH_REBASELINE.json") -> dict:
    """Robust BENCH_REFERENCE re-baseline protocol (VERDICT r12 #2 —
    retires the "wait for a perfectly quiet window" rule, which had been
    unsatisfiable for three rounds of permanent co-tenancy).

    Protocol: run the ten headline queries for `n_windows` (>= 8)
    consecutive measurement windows in one session — each window is the
    standard per-query min-of-4-steady — and take the PER-QUERY MIN
    ACROSS WINDOWS as the machine's achievable floor. Ambient co-tenant
    load varies across a multi-window span, so the per-query min over
    N >= 8 windows approaches the quiet-host number without requiring
    any single window to be globally quiet; the per-window mins and
    each window's canary verdict are recorded as provenance so the
    spread of conditions the floor survived is auditable. The canary
    thresholds themselves are unchanged — per-round driver windows are
    still adjudicated against the committed reference.

    Writes `out_name` (full provenance; default BENCH_REBASELINE.json —
    the close-out floors discipline passes BENCH_FLOORS_r{N}.json, r14,
    VERDICT r13 #4) and prints one JSON line with the floors. Updating
    BENCH_REFERENCE.json from the floors is an explicit, reviewed
    builder step — this function never touches the reference file
    itself."""
    if n_windows < 8:
        raise ValueError(
            f"the protocol requires n_windows >= 8 (got {n_windows}): "
            "fewer windows cannot average over ambient-load variation"
        )
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        windows = []
        for i in range(n_windows):
            eff = measure_effective_cpus(int(CPUS))
            times, _, _, variance = bench_queries(spark, headline_only=True)
            flag_sustained_load(
                times, variance,
                float(sf) if sf.replace(".", "").isdigit() else sf,
                int(CPUS),
            )
            flag_effective_cpus(variance, int(CPUS), {"start": eff})
            variance["cotenancy"]["codecache_used_mb"] = _codecache_used_mb(
                spark
            )
            windows.append(
                {
                    "times": times,
                    "total": round(sum(times.values()), 3),
                    "cotenancy": variance["cotenancy"],
                }
            )
            print(
                f"window {i + 1}/{n_windows}: total "
                f"{windows[-1]['total']} s, noisy="
                f"{variance['cotenancy']['noisy']}",
                file=sys.stderr,
            )
        floors = {
            name: min(w["times"][name] for w in windows)
            for name in windows[0]["times"]
        }
        out = {
            "protocol": (
                f"per-query min over {n_windows} consecutive "
                "min-of-4-steady windows (VERDICT r12 #2)"
            ),
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "cpus": int(CPUS),
            "queries": floors,
            "total_of_floors": round(sum(floors.values()), 3),
            "windows": windows,
        }
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), out_name
        )
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        print(json.dumps(
            {k: out[k] for k in
             ("protocol", "sf", "cpus", "queries", "total_of_floors")},
            separators=(",", ":"),
        ))
        return out
    finally:
        spark.stop()


def bench_compile() -> dict:
    """Plan-construction throughput for the reference's five benchmark
    shapes (BASELINE.md; schema mirrors test/benchmark.js:8-16)."""
    from purescript_ifrit_spark.api import compile_query

    schema = {
        "age": "number",
        "class": "string",
        "is_master": "boolean",
        "bonus": ["number"],
        "spells": [{"power": "number"}],
    }
    shapes = {
        "select_age": "SELECT age",
        "alias_count": "SELECT class AS klass, COUNT(bonus)",
        "group_avg": "SELECT AVG(age) GROUP BY class",
        "where_and": "SELECT is_master WHERE (age > 14 AND age < 20)",
        "nested_from": "SELECT AVG(power) AS avg_pow FROM "
        "(SELECT AVG(spells.power) AS power, age) WHERE age > 18 GROUP BY NULL",
    }
    # max over three short windows per shape: one co-tenant CPU spike in a
    # single 0.5 s window halved several shapes' recorded rates in r6's
    # first artifact — the best window is the machine's achievable rate,
    # same reasoning as min-of-4 wall times above
    out = {}
    for name, sql in shapes.items():
        best = 0.0
        for _ in range(3):
            n, start = 0, time.perf_counter()
            while time.perf_counter() - start < 0.2:
                compile_query(schema, sql)
                n += 1
            best = max(best, n / (time.perf_counter() - start))
        out[name] = round(best)
    return out


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    eff_start = measure_effective_cpus(int(CPUS))
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        times, cold, extra, variance = bench_queries(spark)
        eff_end = measure_effective_cpus(int(CPUS))
        sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
        flag_sustained_load(times, variance, sf_val, int(CPUS))
        flag_floor_adjudication(times, variance, sf_val, int(CPUS))
        flag_effective_cpus(
            variance, int(CPUS), {"start": eff_start, "end": eff_end}
        )
        variance["cotenancy"]["codecache_used_mb"] = _codecache_used_mb(spark)
        total = round(sum(times.values()), 3)
        # The driver keeps only a bounded TAIL of stdout and parses the
        # final JSON line; round 5's line outgrew that window and the
        # headline block was chopped off the front (BENCH_r05 parsed:null).
        # Round 7 repeated the defect in a new form: queries_extra grew to
        # 47 entries and pushed the line past the tail budget again, so the
        # guard below now ALWAYS keeps the extras map OUT of the stdout
        # line (VERDICT r7 #2). Contract since r8: stdout carries EXACTLY
        # ONE compact JSON line — headline mins + headline variance + a
        # scalar rollup of the extras — and every per-extra number (mins,
        # cold runs, extras variance) lives in the committed
        # BENCH_DETAIL.json, pointed to by "detail".
        result = {
            "metric": "headline_queries_total_steady_state",
            "value": total,
            "unit": "sec",
            "queries": times,
            "queries_extra_total_steady_state": round(
                sum(extra.values()), 3
            ),
            "queries_extra_count": len(extra),
            "variance": {
                "steady_runs": variance["steady_runs"],
                "median": variance["median"],
                "rel_spread": variance["rel_spread"],
                "max_rel_spread": variance["max_rel_spread"],
                "cotenancy": variance["cotenancy"],
            },
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "compile_ops_per_sec": bench_compile(),
            "cpus": int(CPUS),
            "detail": "BENCH_DETAIL.json",
        }
        detail = dict(result)
        detail["queries_extra_steady_state"] = extra
        detail["queries_cold_first_run"] = cold
        detail["variance"] = variance  # full block incl. extras
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
        line = json.dumps(result, separators=(",", ":"))
        if len(line) > 2200:  # stay under the driver's tail budget (~2.6k)
            print(
                f"WARNING: bench line {len(line)} chars — dropping "
                "variance medians from stdout (full copy in BENCH_DETAIL.json)",
                file=sys.stderr,
            )
            result["variance"] = {
                "steady_runs": variance["steady_runs"],
                "max_rel_spread": variance["max_rel_spread"],
                "cotenancy": variance["cotenancy"],
                "detail": "BENCH_DETAIL.json",
            }
            line = json.dumps(result, separators=(",", ":"))
        print(line)
    finally:
        spark.stop()


def capture_plans(plans_dir: str, tag: str) -> None:
    """`python bench.py --plans <dir> <tag>`: write every benched query's
    formatted explain to <dir>/<name>_<tag>.txt (optimization-round
    evidence; builds the extras' scratch layouts but runs no timed query)."""
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        bench_queries(spark, plans_dir=plans_dir, plans_tag=tag)
    finally:
        spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--plans":
        capture_plans(
            sys.argv[2] if len(sys.argv) > 2 else "plans/r14",
            sys.argv[3] if len(sys.argv) > 3 else "before",
        )
    elif len(sys.argv) > 1 and sys.argv[1] == "--rebaseline":
        rebaseline(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
    elif len(sys.argv) > 1 and sys.argv[1] == "--floors":
        # close-out floors (r14, VERDICT r13 #4): same protocol, written
        # to the round-stamped artifact the canary v4 adjudicates
        # against — `python bench.py --floors [n_windows] [round]`
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        rnd = int(sys.argv[3]) if len(sys.argv) > 3 else 14
        rebaseline(n, out_name=f"BENCH_FLOORS_r{rnd}.json")
    else:
        main()
