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
) -> DataFrame:
    """(doc_id, bench_id, overlap) for every document that contains at
    least `min_frac` of a benchmark item's distinct word n-grams.

    One broadcast join on the gram key + one aggregation shuffle over the
    hit-pairs; the corpus text never leaves its scan stage. Documents with
    no shared gram do not appear (overlap 0 rows are meaningless at corpus
    scale). `bench_text_col` defaults to `text_col`.
    """
    bench_text = bench_text_col or text_col

    def grams(df: DataFrame, id_col: str, col: str, out_id: str) -> DataFrame:
        g = F.explode(X.word_shingles(F.col(col), n)).alias("_g")
        out = df.select(F.col(id_col).alias(out_id), g)
        if hash_grams:
            out = out.select(out_id, F.xxhash64("_g").alias("_g"))
        return out

    doc_g = grams(docs, doc_id_col, text_col, "doc_id")
    bench_g = grams(bench, bench_id_col, bench_text, "bench_id")
    bench_sizes = bench.select(
        F.col(bench_id_col).alias("bench_id"),
        F.size(X.word_shingles(F.col(bench_text), n)).alias("_bn"),
    ).filter(F.col("_bn") > 0)
    if broadcast_bench:
        bench_g = F.broadcast(bench_g)
        bench_sizes = F.broadcast(bench_sizes)

    hits = (
        doc_g.join(bench_g, "_g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    return (
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
