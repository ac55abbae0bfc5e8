"""Benchmark-contamination scanning: which corpus documents contain the
word n-grams of an evaluation/benchmark set.

No reference counterpart (engine extension; SURVEY §2.7 family) — this is
the standard pre-training hygiene pass: before training, every document is
checked for n-gram overlap against held-out benchmarks (the practice
popularized by the GPT-3/PaLM/Llama reports, typically with 8-13 word
n-grams), and contaminated documents are dropped or flagged.

100 TB design:
- The benchmark side is SMALL by nature (eval sets are thousands of items,
  not billions) → broadcast it. The corpus side then never shuffles its
  n-grams: the scan stage explodes distinct grams, probes the broadcast
  hash relation, and only (doc_id, bench_id) hit-pairs — a tiny fraction —
  reach the one aggregation exchange.
- `hash_grams=True` broadcasts 8-byte xxhash64 keys instead of the gram
  strings (~10× smaller broadcast for 8-grams). Deterministic; a 64-bit
  collision could overcount one gram in ~2^-64 per pair-gram — the driver
  oracle-parity entry runs with hashing ON, so the compare would surface
  any collision at test scale.
- Overlap is computed against DISTINCT grams on both sides (word_shingles
  is distinct), so the metric is |grams(doc) ∩ grams(bench)| /
  |grams(bench)| — the fraction of the benchmark item present in the doc.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from purescript_ifrit_spark.functions import text as X


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    bench_text_col: Optional[str] = None,
    n: int = 8,
    min_frac: float = 0.5,
    hash_grams: bool = True,
    broadcast_bench: bool = True,
    check_short: bool = True,
) -> DataFrame:
    """(doc_id, bench_id, overlap) for every document that contains at
    least `min_frac` of a benchmark item's distinct word n-grams.

    One broadcast join on the gram key + one aggregation shuffle over the
    hit-pairs; the corpus text never leaves its scan stage. Documents with
    no shared gram do not appear (overlap 0 rows are meaningless at corpus
    scale). `bench_text_col` defaults to `text_col`.
    """
    bench_text = bench_text_col or text_col

    # Bench items SHORTER than n words cannot be caught by the gram join:
    # word_shingles collapses them to one whole-text shingle, which never
    # equals any n-gram of a longer document — a verbatim-contaminated doc
    # would silently pass. Route them through exact phrase containment
    # instead (still a broadcast: the short-bench side is a handful of
    # rows, and BroadcastNestedLoopJoin over it is one scan of the corpus).
    bench_n = bench.select(
        F.col(bench_id_col).alias("bench_id"),
        X.normalize_text(F.col(bench_text)).alias("_bs"),
        F.size(X.word_shingles(F.col(bench_text), n)).alias("_bn"),
        X.token_count(F.col(bench_text)).alias("_bw"),
    ).filter(F.col("_bn") > 0)
    bench_long = bench_n.filter(F.col("_bw") >= n)
    # space-pad the short phrase so containment only matches at token
    # boundaries: 'the cat' must not hit inside 'soothe cattle'. Normalized
    # text has single internal spaces, so ' phrase ' aligns exactly with
    # whole tokens of the (equally padded) document below.
    bench_short = bench_n.filter(F.col("_bw") < n).select(
        "bench_id",
        F.concat(F.lit(" "), F.col("_bs"), F.lit(" ")).alias("_bs"),
    )

    def grams(df: DataFrame, id_col: str, col: str, out_id: str) -> DataFrame:
        # Docs with fewer than n words enter via word_shingles' whole-text
        # fallback shingle. Load-bearing invariant: that fallback has < n
        # words while every bench-side gram has exactly n, so the join key
        # can never collide — short docs probe the broadcast and miss, they
        # are not silently matched.
        g = F.explode(X.word_shingles(F.col(col), n)).alias("_g")
        out = df.select(F.col(id_col).alias(out_id), g)
        if hash_grams:
            out = out.select(out_id, F.xxhash64("_g").alias("_g"))
        return out

    doc_g = grams(docs, doc_id_col, text_col, "doc_id")
    bench_g = grams(bench_long, "bench_id", "_bs", "bench_id")
    bench_sizes = bench_long.select("bench_id", "_bn")
    if broadcast_bench:
        bench_g = F.broadcast(bench_g)
        bench_sizes = F.broadcast(bench_sizes)
        bench_short = F.broadcast(bench_short)

    hits = (
        doc_g.join(bench_g, "_g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    long_out = (
        hits.join(bench_sizes, "bench_id")
        .withColumn(
            "overlap",
            F.round(
                F.col("_hits").cast("double") / F.col("_bn").cast("double"), 6
            ),
        )
        .filter(F.col("overlap") >= min_frac)
        .select("doc_id", "bench_id", "overlap")
    )
    if not check_short:
        # callers that KNOW every benchmark item has >= n words skip the
        # containment branch and its second corpus scan
        return long_out
    # short items: contained-as-phrase == every gram present == overlap 1.0
    short_out = (
        docs.select(
            F.col(doc_id_col).alias("doc_id"),
            F.concat(
                F.lit(" "), X.normalize_text(F.col(text_col)), F.lit(" ")
            ).alias("_ds"),
        )
        .join(bench_short, F.col("_ds").contains(F.col("_bs")))
        .select("doc_id", "bench_id", F.lit(1.0).alias("overlap"))
    )
    return long_out.unionAll(short_out)
