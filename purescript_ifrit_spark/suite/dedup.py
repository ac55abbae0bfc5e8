"""Deduplication and curation entries (exact, minhash, simhash, ngram, clusters, incremental, curate pipeline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purescript_ifrit_spark.api import run_query
from purescript_ifrit_spark.sources.tables import load_table
from purescript_ifrit_spark.suite._registry import (
    register,
    register_demo,
)
from purescript_ifrit_spark.suite._fixtures import (
    _NORM_SQL,
    _PLANTED_TOKS,
    _curate_exact_oracle,
    _planted_docs,
    _planted_pieces,
)



@register(
    "x_dedup_exact",
    f"SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5({_NORM_SQL})",
)
def x_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.dedup import dedup_exact_text

    docs = load_table(spark, sf_dir, "documents")
    return dedup_exact_text(docs, "text", "doc_id").select("doc_id")


@register_demo("x_dedup_minhash")  # approximate — demo (twin: x_dedup_minhash_planted)
def x_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.dedup import dedup_minhash

    docs = load_table(spark, sf_dir, "documents")
    # default geometry (16 lanes, b=8 r=2 since r4) — tracks the operator.
    # on_capped='error' (VERDICT r8 #8): the demo PROVES no candidate was
    # lost to the max_bucket recall cap at this scale — a cap hit fails
    # the job loudly instead of silently under-reporting duplicates
    return dedup_minhash(
        docs, "doc_id", "text", jaccard_threshold=0.8, on_capped="error"
    ).select("doc_id")


@register(
    "x_dedup_minhash_planted",
    # ground truth recomputed by DuckDB: a planted variant is dropped iff its
    # exact shingle jaccard to its base doc is >= 0.8; cross-doc pairs are
    # jaccard 0 by construction (disjoint per-doc token namespaces)
    f"WITH base AS ({_PLANTED_TOKS}), "
    "pairs AS ("
    "  SELECT doc_id, doc_id + 1000000000000 AS vid, toks AS vtoks FROM base "
    "  WHERE doc_id % 10 = 0 "
    "  UNION ALL "
    "  SELECT doc_id, doc_id + 2000000000000 AS vid, toks[1:38] AS vtoks FROM base "
    "  WHERE doc_id % 10 = 5), "
    "j AS ("
    "  SELECT p.vid, "
    "  len(list_intersect("
    "    list_transform(range(1, len(b.toks) - 1), "
    "      i -> b.toks[i] || ' ' || b.toks[i+1] || ' ' || b.toks[i+2]), "
    "    list_transform(range(1, len(p.vtoks) - 1), "
    "      i -> p.vtoks[i] || ' ' || p.vtoks[i+1] || ' ' || p.vtoks[i+2]))) AS inter, "
    "  len(b.toks) - 2 AS na, len(p.vtoks) - 2 AS nb "
    "  FROM pairs p JOIN base b USING (doc_id)) "
    "SELECT doc_id FROM documents "
    "UNION ALL "
    "SELECT vid AS doc_id FROM j WHERE inter * 1.0 / (na + nb - inter) < 0.8",
)
def x_dedup_minhash_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.dedup import dedup_minhash

    planted = _planted_docs(spark, sf_dir)
    # default geometry (16 lanes, b=8 r=2 since r4): the exact-truth oracle
    # pins recall of the new curve — the 0.947-jaccard planted variants must
    # still be caught (per-pair candidate probability 1-(1-0.947²)⁸ ≈
    # 1 - 2.7e-11) and the sub-threshold ones must survive verification
    return dedup_minhash(
        planted, "doc_id", "text", jaccard_threshold=0.8
    ).select("doc_id")


@register(
    "x_dedup_incremental_planted",
    # incremental (index-probe) dedup ground truth: the corpus is the
    # planted base docs; the incoming batch holds their exact variants
    # (estimated jaccard = 1: identical shingles → identical signatures),
    # their 36/38-near variants (lane-match estimate ≈ 0.947 ≥ 0.5,
    # deterministic given the fixed lane seeds), and FRESH docs in a
    # disjoint 'f' token namespace (true jaccard 0; a false drop would
    # need a 64-bit band-hash collision). Survivors = exactly the fresh
    # docs — the oracle recomputes that set arithmetically.
    "SELECT doc_id + 3000000000000 AS doc_id FROM documents "
    "WHERE doc_id % 10 = 3",
)
def x_dedup_incremental_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.dedup import (
        build_minhash_index,
        dedup_against_index,
    )

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
    index = build_minhash_index(base, "doc_id", "text")
    batch = exact_var.unionAll(near_var).unionAll(fresh)
    return dedup_against_index(
        batch, index, "doc_id", "text", est_threshold=0.5
    ).select("doc_id")


@register(
    "x_dedup_simhash_planted",
    # identical normalized text → identical 64-bit simhash → hamming 0 and a
    # guaranteed shared bit-slice; distinct docs share no tokens, so a false
    # pair needs a full 64-bit signature collision (max_hamming=0). The
    # 38-token near-dup variants are EXCLUDED here: sharing 38/40 tokens
    # often flips zero simhash bits, which is correct simhash behavior but
    # not oracle-predictable — the minhash entry covers the near-dup tier
    "SELECT doc_id AS id_a, doc_id + 1000000000000 AS id_b, "
    "CAST(0 AS BIGINT) AS hamming FROM documents WHERE doc_id % 10 = 0",
)
def x_dedup_simhash_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.dedup import simhash_candidate_pairs

    planted = _planted_docs(spark, sf_dir).filter(F.col("doc_id") < 2_000_000_000_000)
    out = simhash_candidate_pairs(planted, "doc_id", "text", max_hamming=0)
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


@register(
    "x_dedup_ngram_planted",
    # exact word-3-gram Jaccard is fully oracle-predictable on the planted
    # corpus: an exact variant normalizes to its base text (jaccard 1.0);
    # a near variant is the 38-token prefix of its 40-token base, so its 36
    # 3-shingles are a strict subset of the base's 38 → 36/38. Blocks pair
    # each variant with exactly its base (disjoint token namespaces make
    # cross-doc jaccard 0 anyway), demonstrating the blocked scale path —
    # the same shape the operator runs downstream of LSH banding.
    "SELECT doc_id AS id_a, doc_id + 1000000000000 AS id_b, "
    "CAST(1.0 AS DOUBLE) AS jaccard FROM documents WHERE doc_id % 10 = 0 "
    "UNION ALL "
    "SELECT doc_id, doc_id + 2000000000000, "
    "CAST(ROUND(36.0 / 38.0, 6) AS DOUBLE) FROM documents WHERE doc_id % 10 = 5",
)
def x_dedup_ngram_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.dedup import ngram_jaccard_pairs

    planted = _planted_docs(spark, sf_dir).withColumn(
        "blk", F.col("doc_id") % 1_000_000_000_000
    )
    out = ngram_jaccard_pairs(
        planted, "doc_id", "text", n=3, threshold=0.5, block_col="blk"
    )
    return out.withColumn("jaccard", F.round("jaccard", 6))


@register_demo("x_dedup_simhash_pairs")  # approximate — demo (twin: x_dedup_simhash_planted)
def x_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.dedup import simhash_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    # chunks=16 keeps the pigeonhole guarantee for hamming <= 10 (the old
    # default chunks=4 silently lost every pair with hamming >= 4 — the
    # r8 loud-geometry guard in operators/dedup.py now rejects that, and
    # the demo's historical output was recall-capped; see COVERAGE.md)
    return simhash_candidate_pairs(
        docs, "doc_id", "text", max_hamming=10, chunks=16
    )


def _planted_chain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chain fixture shared by x_dedup_clusters_planted and
    x_cluster_stats_planted: per anchor (doc_id % 20 == 0) a chain of 6
    sliding-window variants (adjacent shingle-jaccard 36/38 ≈ 0.947; the
    chain's ends sit at ≈ 0.73 — only transitive closure groups all 7)
    plus one isolated variant (window 20 away, max jaccard ≈ 0.31)."""
    from functools import reduce

    ids = load_table(spark, sf_dir, "documents").select("doc_id")

    def txt(w0: int):
        toks = F.transform(
            F.sequence(F.lit(w0), F.lit(w0 + 39)),
            lambda k: F.concat(
                F.lit("t"), F.col("doc_id").cast("string"), F.lit("x"),
                k.cast("string"),
            ),
        )
        return F.array_join(toks, " ")

    base = ids.select("doc_id", txt(0).alias("text"))
    anchors = ids.filter(F.col("doc_id") % 20 == 0)
    parts = [base]
    # text is computed BEFORE the id shift: the token lambda resolves
    # doc_id, and aliasing first would shift the namespace too
    for k in range(1, 7):
        parts.append(
            anchors.select("doc_id", txt(k).alias("text")).select(
                (F.col("doc_id") + k * 1_000_000_000_000).alias("doc_id"), "text"
            )
        )
    parts.append(
        anchors.select("doc_id", txt(20).alias("text")).select(
            (F.col("doc_id") + 7_000_000_000_000).alias("doc_id"), "text"
        )
    )
    return reduce(lambda a, b: a.unionAll(b), parts)


@register(
    "x_dedup_clusters_planted",
    # ground truth by construction: per anchor (doc_id % 20 == 0) a CHAIN of
    # 6 sliding-window variants (adjacent shingle-jaccard 36/38 ≈ 0.947 —
    # far above the 0.8 threshold; chain ENDS at ≈ 0.73 — below it, so only
    # transitive closure groups them) plus one isolated variant (window 20
    # tokens away, max jaccard ≈ 0.31 to anything — must SURVIVE). Expected
    # survivors: every base doc (the component minimum) + every isolated
    # variant. Over-dropping kills an isolated row; missing transitivity
    # leaves a chain variant alive — either way the set mismatches.
    "SELECT doc_id FROM documents "
    "UNION ALL SELECT doc_id + 7000000000000 AS doc_id FROM documents "
    "WHERE doc_id % 20 = 0",
)
def x_dedup_clusters_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components cluster dedup with exact planted ground truth
    (minhash pairs → large-star/small-star CC → keep component minimum)."""
    from purescript_ifrit_spark.operators.dedup import (
        dedup_clusters,
        minhash_candidate_pairs,
    )

    corpus = _planted_chain_corpus(spark, sf_dir)
    pairs = minhash_candidate_pairs(
        corpus, "doc_id", "text", jaccard_threshold=0.8, eager=True
    )
    return dedup_clusters(corpus, "doc_id", pairs).select("doc_id")


@register(
    "x_cluster_stats_planted",
    # the chain fixture's component structure IS the ground truth: every
    # anchor contributes exactly one 7-member component (base + 6 chained
    # variants — extra shift≤4 edges don't change the component), isolated
    # variants and non-anchor docs appear in no pair and thus in no
    # component, so the histogram is one row: (7, n_anchors)
    "SELECT CAST(7 AS BIGINT) AS cluster_size, "
    "CAST(COUNT(*) AS BIGINT) AS n_clusters "
    "FROM documents WHERE doc_id % 20 = 0",
)
def x_cluster_stats_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram (operators/dedup.cluster_size_histogram) —
    the dedup report — with exact planted component structure."""
    from purescript_ifrit_spark.operators.dedup import (
        cluster_size_histogram,
        connected_components,
        minhash_candidate_pairs,
    )

    corpus = _planted_chain_corpus(spark, sf_dir)
    pairs = minhash_candidate_pairs(
        corpus, "doc_id", "text", jaccard_threshold=0.8, eager=True
    )
    comp = connected_components(pairs)
    return cluster_size_histogram(comp, "component").select(
        F.col("cluster_size").cast("long").alias("cluster_size"),
        "n_clusters",
    )


@register_demo("x_dedup_clusters")  # approximate candidates — demo (twin: x_dedup_clusters_planted)
def x_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level dedup: minhash pairs → connected components → keep the
    canonical (min-id) member per component."""
    from purescript_ifrit_spark.operators.dedup import (
        dedup_clusters,
        minhash_candidate_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", jaccard_threshold=0.8, eager=True
    )
    return dedup_clusters(docs, "doc_id", pairs).select("doc_id")


@register("x_curate_exact", _curate_exact_oracle())
def x_curate_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline's exact prefix as hard signal: quality gate →
    exact dedup → token stats, every stage oracle-recomputable (the full
    composition x_curate_pipeline adds LSH and stays rows-only)."""
    from purescript_ifrit_spark.operators import dedup
    from purescript_ifrit_spark.operators.text_analysis import (
        fingerprint_docs,
        quality_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_score(docs, "text")
    kept = scored.filter(
        (F.col("quality") >= 0.2) & (F.col("n_tokens") >= 5)
    )
    # fingerprint once, dedup on the carried column (dedup_exact_text
    # would compute the same md5 internally and drop it)
    with_fp = fingerprint_docs(kept, "text")
    exact = dedup.dedup_exact(with_fp, ["fingerprint"], "doc_id")
    return exact.select(
        "doc_id",
        "quality",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "fingerprint",
    )


@register_demo("x_curate_pipeline")  # composition incl. approximate dedup — demo (exact prefix: x_curate_exact)
def x_curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from purescript_ifrit_spark.operators.pipeline import curate

    docs = load_table(spark, sf_dir, "documents")
    return curate(docs, min_quality=0.2).select(
        "doc_id", "quality", "n_tokens", "n_bpe_ish", "fingerprint"
    )


_SUBDOC_ORACLE = (
    # non-overlapping chunk=32 (stride=32); DuckDB list slice is 1-based
    # inclusive; winner = smallest (doc_id, chunk_idx) per chunk text
    "WITH t AS (SELECT doc_id, "
    "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks "
    "FROM documents), "
    "c AS (SELECT doc_id, toks, UNNEST(range(1 + CAST(ceil(greatest(len(toks) - 32, 0) / 32.0) AS BIGINT))) AS i FROM t), "
    "ch AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, "
    "array_to_string(toks[CAST(i*32+1 AS INT):CAST(i*32+32 AS INT)], ' ') AS chunk_text FROM c), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY chunk_text ORDER BY doc_id, chunk_idx) AS rn, "
    "COUNT(*) OVER (PARTITION BY doc_id) AS n_total FROM ch) "
    "SELECT doc_id, string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS text_dedup, "
    "COUNT(*) AS n_chunks_kept, CAST(MAX(n_total) AS BIGINT) AS n_chunks_total "
    "FROM r WHERE rn = 1 GROUP BY doc_id"
)


@register("x_dedup_subdoc", _SUBDOC_ORACLE)
def x_dedup_subdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document chunk-level dedup with reassembly
    (operators/dedup.dedup_subdocument): repeated 32-token passages keep
    only their globally-first occurrence; documents are rebuilt from
    surviving chunks."""
    from purescript_ifrit_spark.operators.dedup import dedup_subdocument

    docs = load_table(spark, sf_dir, "documents")
    out = dedup_subdocument(docs, "doc_id", "text", chunk_tokens=32)
    return out.select(
        "doc_id",
        "text_dedup",
        F.col("n_chunks_kept").cast("long").alias("n_chunks_kept"),
        F.col("n_chunks_total").cast("long").alias("n_chunks_total"),
    )


@register(
    "x_blocklist_dedup",
    # the Bloom stage is invisible to semantics: the oracle is the plain
    # fingerprint anti-join the operator is contractually equal to
    "WITH b AS (SELECT DISTINCT "
    "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp "
    "FROM documents WHERE doc_id % 7 = 0) "
    "SELECT d.doc_id, d.n_chars FROM documents d "
    "WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.fp = "
    "md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))))",
)
def x_blocklist_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered blocklist dedup (operators/dedup.
    dedup_against_blocklist): the blocklist is the fingerprints of every
    7th document (a synthetic prior-ingest batch); result ≡ exact
    anti-join, which is what the oracle recomputes."""
    from purescript_ifrit_spark.functions import text as X
    from purescript_ifrit_spark.operators.dedup import dedup_against_blocklist

    docs = load_table(spark, sf_dir, "documents")
    block = docs.filter(F.col("doc_id") % 7 == 0).select(
        X.fingerprint(F.col("text")).alias("fingerprint")
    )
    out = dedup_against_blocklist(docs, block, "doc_id", "text")
    return out.select("doc_id", "n_chars")


@register(
    "x_dedup_keep_best_planted",
    # keep-best cluster dedup over the chain fixture with a PLANTED
    # quality: q(id) = (id div 10^12) % 7, so inside every anchor's
    # 7-member component the k=6 variant is strictly best and must be the
    # sole survivor (base and v1..v5 lose); isolated variants and
    # non-anchor docs are in no pair and survive untouched. The expected
    # set is pure doc_id arithmetic.
    "SELECT doc_id FROM documents WHERE doc_id % 20 <> 0 "
    "UNION ALL SELECT doc_id + 6000000000000 AS doc_id FROM documents "
    "WHERE doc_id % 20 = 0 "
    "UNION ALL SELECT doc_id + 7000000000000 AS doc_id FROM documents "
    "WHERE doc_id % 20 = 0",
)
def x_dedup_keep_best_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster dedup (operators/dedup.
    dedup_clusters_keep_best): the curation-correct keep-the-best-copy
    form, exact planted ground truth."""
    from purescript_ifrit_spark.operators.dedup import (
        dedup_clusters_keep_best,
        minhash_candidate_pairs,
    )

    corpus = _planted_chain_corpus(spark, sf_dir).withColumn(
        "q",
        ((F.col("doc_id") / F.lit(1_000_000_000_000)).cast("long") % 7)
        .cast("double"),
    )
    pairs = minhash_candidate_pairs(
        corpus, "doc_id", "text", jaccard_threshold=0.8, eager=True
    )
    return dedup_clusters_keep_best(corpus, "doc_id", pairs, "q").select(
        "doc_id"
    )


@register(
    "x_dedup_incremental_simhash_planted",
    # simhash-index incremental dedup ground truth: the corpus index holds
    # the planted base docs; the batch holds their exact-normalized
    # variants (identical normalized text → identical signature → hamming
    # 0, always within max_hamming) and FRESH docs in a disjoint 'f'
    # token namespace. A fresh doc can share one 16-bit slice by chance
    # (candidate), but dropping it would need hamming ≤ 3 over the other
    # 48 bits of two independent token-set signatures — like
    # x_dedup_simhash_planted, the near variants are EXCLUDED (token
    # overlap often flips zero bits: correct simhash, not
    # oracle-predictable). Survivors = exactly the fresh docs.
    "SELECT doc_id + 3000000000000 AS doc_id FROM documents "
    "WHERE doc_id % 10 = 3",
)
def x_dedup_incremental_simhash_planted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental dedup against a persistable SIMHASH index
    (operators/dedup.build_simhash_index + dedup_against_simhash_index) —
    the cheapest durable near-dup index (one 8-byte signature per doc)."""
    from purescript_ifrit_spark.operators.dedup import (
        build_simhash_index,
        dedup_against_simhash_index,
    )

    base, exact_var, _near = _planted_pieces(spark, sf_dir)
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
    index = build_simhash_index(base, "doc_id", "text")
    batch = exact_var.unionAll(fresh)
    return dedup_against_simhash_index(
        batch, index, "doc_id", "text", max_hamming=3
    ).select("doc_id")


# shared n-gram position CTE for the span-dedup oracles (n=3; mirrors
# operators/dedup._gram_positions: md5 gram keys over normalized tokens,
# docs shorter than n yield zero rows — string_split('') is [''] len 1,
# so greatest(len-2, 0) zeroes the range the same way the Spark guard does)
_SPAN_G = (
    f"WITH tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS ts "
    "FROM documents), "
    "gi AS (SELECT doc_id, ts, "
    "UNNEST(range(1, greatest(len(ts) - 2, 0) + 1)) AS i FROM tk), "
    "g AS (SELECT doc_id, md5(array_to_string("
    "ts[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')) AS gk FROM gi) "
)


@register(
    "x_duplicate_spans",
    _SPAN_G + "SELECT gk AS gram_key, "
    "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, "
    "CAST(COUNT(*) AS BIGINT) AS n_occ "
    "FROM g GROUP BY gk HAVING COUNT(DISTINCT doc_id) >= 2",
)
def x_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-recurring token 3-gram spans (operators/dedup.
    duplicate_spans): the exact-substring-dedup table, Lee et al. 2022
    style — exact integer counts recomputed gram-for-gram by the
    oracle."""
    from purescript_ifrit_spark.operators.dedup import duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    return duplicate_spans(docs, "doc_id", "text", n=3, min_docs=2)


@register(
    "x_span_dup_stats",
    _SPAN_G + ", dfq AS (SELECT gk, COUNT(DISTINCT doc_id) AS dfc "
    "FROM g GROUP BY gk) "
    "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_positions, "
    "CAST(SUM(CASE WHEN dfc >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_dup_positions, "
    "ROUND(SUM(CASE WHEN dfc >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) "
    "AS dup_frac FROM g JOIN dfq USING (gk) GROUP BY doc_id",
)
def x_span_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span exposure (operators/dedup.
    span_dedup_stats): the filter signal on top of duplicate_spans —
    position counts exact, the fraction one division rounded 6dp both
    sides."""
    from purescript_ifrit_spark.operators.dedup import span_dedup_stats

    docs = load_table(spark, sf_dir, "documents")
    out = span_dedup_stats(docs, "doc_id", "text", n=3, min_docs=2)
    return out.select(
        "doc_id",
        "n_positions",
        "n_dup_positions",
        F.round(F.col("dup_frac"), 6).alias("dup_frac"),
    )


def _corpus_diff_oracle() -> str:
    # planted second snapshot, same construction as the entry: docs with
    # id % 11 == 0 removed, id % 7 == 0 get ' v2' appended (content
    # change), and id % 13 == 0 re-enter as fresh ids (+1e9). Statuses
    # re-derive from md5 of the SAME normalization on both engines.
    def norm(x: str) -> str:
        return f"trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"

    return (
        f"WITH o AS (SELECT doc_id, md5({norm('text')}) AS fp "
        "FROM documents), "
        "nsrc AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 "
        "THEN text || ' v2' ELSE text END AS text FROM documents "
        "WHERE doc_id % 11 <> 0 "
        "UNION ALL SELECT doc_id + 1000000000 AS doc_id, text "
        "FROM documents WHERE doc_id % 13 = 0), "
        f"n AS (SELECT doc_id, md5({norm('text')}) AS fp FROM nsrc) "
        "SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, "
        "CASE WHEN o.fp IS NULL THEN 'added' "
        "WHEN n.fp IS NULL THEN 'removed' "
        "WHEN o.fp = n.fp THEN 'unchanged' ELSE 'changed' END AS status, "
        "o.fp AS old_fp, n.fp AS new_fp "
        "FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id"
    )


@register("x_corpus_diff", _corpus_diff_oracle())
def x_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot corpus delta (operators/pipeline.corpus_diff)
    on a planted second snapshot — per-document added/removed/changed/
    unchanged, fingerprint-exact on both engines."""
    from purescript_ifrit_spark.operators.pipeline import corpus_diff

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    fresh = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
    )
    return corpus_diff(docs, kept.unionAll(fresh))


# line-dedup fixture: a lined corpus with cross-document duplication at
# three scales — a 5-way shared header (~100 docs each at sf0.01), a
# corpus-universal footer (one survivor in the whole corpus), a blank
# exempt line, and per-doc substring lines (any natural prefix collision
# in the synthetic corpus dedups identically on both engines). The
# prefix line carries trailing-space trim bait: matching is on trimmed
# content, reassembly emits the line verbatim.
_LD_AUG_SQL = (
    "'shared header line number ' || CAST(doc_id % 5 AS VARCHAR) || chr(10) "
    "|| substr(text, 1, 60) || ' ' || chr(10) || chr(10) || "
    "'universal footer line shared by every document' || chr(10) || "
    "substr(text, 61, 40)"
)


def _ld_aug_expr() -> F.Column:
    return F.concat(
        F.lit("shared header line number "),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("\n"),
        F.substring(F.col("text"), 1, 60),
        F.lit(" \n\n"),
        F.lit("universal footer line shared by every document\n"),
        F.substring(F.col("text"), 61, 40),
    )


@register(
    "x_line_dedup_global",
    # the oracle recomputes keep-first membership with a window over the
    # same trimmed-line keys and reassembles with an ordered filtered
    # string_agg; string_agg of zero kept rows is NULL -> COALESCE ''
    f"WITH a AS (SELECT doc_id, {_LD_AUG_SQL} AS x FROM documents), "
    "l AS (SELECT doc_id, t.k AS pos, arr[t.k + 1] AS line FROM "
    "(SELECT doc_id, string_split(x, chr(10)) AS arr FROM a) d, "
    "unnest(range(0, len(arr))) AS t(k)), "
    "f AS (SELECT doc_id, pos, line, "
    "CASE WHEN trim(line) = '' THEN 'u:' || doc_id || ':' || pos "
    "ELSE 'l:' || md5(trim(line)) END AS key, "
    "(trim(line) = '') AS exempt FROM l), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY key "
    "ORDER BY doc_id, pos) AS rn FROM f) "
    "SELECT doc_id, CAST(COUNT(*) AS INT) AS n_lines, "
    "CAST(SUM(CASE WHEN exempt OR rn = 1 THEN 1 ELSE 0 END) AS INT) "
    "AS n_kept, "
    "md5(COALESCE(string_agg(line, chr(10) ORDER BY pos) "
    "FILTER (WHERE exempt OR rn = 1), '')) AS fp_ldedup FROM r "
    "GROUP BY doc_id",
)
def x_line_dedup_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide keep-first line dedup with reassembly
    (operators/dedup.dedup_lines_global; the C4 cross-document rule at
    line granularity) — counts and rebuilt-text fingerprints exact on a
    planted lined corpus with 5-way, corpus-universal, and exempt-blank
    duplication."""
    from purescript_ifrit_spark.operators.dedup import dedup_lines_global

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select("doc_id", _ld_aug_expr().alias("x"))
    out = dedup_lines_global(aug, "doc_id", "x")
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.md5(F.col("text_ldedup")).alias("fp_ldedup"),
    )


@register(
    "x_jaccard_join_prefix",
    # brute-force integer-predicate twin over the reconstructed planted
    # corpus (base J=0 pairwise; exact variants J=1; near variants
    # J=38/40): den*inter >= num*union, the operator's own predicate
    "WITH t AS (" + _PLANTED_TOKS + "), "
    "corpus AS (SELECT doc_id, toks FROM t "
    "UNION ALL SELECT doc_id + 1000000000000, toks FROM t "
    "WHERE doc_id % 10 = 0 "
    "UNION ALL SELECT doc_id + 2000000000000, toks[1:38] FROM t "
    "WHERE doc_id % 10 = 5), "
    "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
    "CAST(len(list_intersect(a.toks, b.toks)) AS INT) AS n_inter, "
    "CAST(len(a.toks) + len(b.toks) "
    "- len(list_intersect(a.toks, b.toks)) AS INT) AS n_union "
    "FROM corpus a JOIN corpus b ON a.doc_id < b.doc_id) "
    "SELECT id_a, id_b, n_inter, n_union, "
    "ROUND(n_inter * 1.0 / n_union, 6) AS jaccard "
    "FROM p WHERE 10 * n_inter >= 9 * n_union",
)
def x_jaccard_join_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join by prefix filtering
    (operators/dedup.jaccard_join_prefix; AllPairs/PPJoin) at Jaccard >=
    9/10 over the planted token corpus — lossless candidate generation
    verified pair-for-pair against the oracle's all-pairs brute force."""
    from purescript_ifrit_spark.operators.dedup import jaccard_text_join

    planted = _planted_docs(spark, sf_dir)
    return jaccard_text_join(planted, "doc_id", "text", 9, 10)
