"""Round-11 attestation (VERDICT r10 #2): the BM25 index on a REALISTIC
corpus — Zipfian vocabulary, selective queries — where its structural
wins (no per-batch re-tokenize; term-pruned postings scan) must show up
in wall clock, or the operator's claim gets scoped.

Corpus: 500,000 docs x 120 tokens drawn from a 100,000-term Zipf(s=1.07)
vocabulary (zero-padded term strings so lexicographic order == rank
order), generated deterministically per 1,000-doc block (partition-
independent seeds). Queries: 1,000 two-term queries over ranks
2,000-49,999 — the selective tail (head ranks are the stop-term regime
max_df_frac governs; the tail is what real retrieval batches look like).

Measured:
  A. direct bm25_topk_queries over the raw text           (tokenize every batch)
  B. build_bm25_index + term-range-sorted parquet write   (one-time)
  C. bm25_topk_queries_indexed, stored layout             (scoring_partitions=0)
  D. C + prune_scan_terms=True                            (scan-level term screen)
  E. 10-query demo on C-layout + bucketed catalog table:
     parquet footer skip (REST inputBytes/records) and bucket pruning
     (SelectedBucketsCount in the plan).
A==C==D verified by symmetric diff. Numbers recorded in SCALE.md §Round 11.

Run: python attestations/r11_bm25_index_zipf.py
"""
import json
import os
import time
import urllib.request

import numpy as np

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
V = 100_000
DOC_TOKENS = 120
N_DOCS = 500_000
N_QUERIES = 1_000
ZIPF_S = 1.07
BASE = "/tmp/attest_bm25"


def rest_stage_totals(spark):
    """Sum of (inputBytes, inputRecords) over all completed stages so
    far — diff two readings to attribute IO to one run."""
    try:
        port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
        app = spark.sparkContext.applicationId
        url = f"http://localhost:{port}/api/v1/applications/{app}/stages?status=complete"
        stages = json.loads(urllib.request.urlopen(url, timeout=10).read())
        return (sum(s["inputBytes"] for s in stages),
                sum(s["inputRecords"] for s in stages))
    except Exception as e:  # UI off / transient — attestation still runs
        print("REST unavailable:", e)
        return (0, 0)


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from purescript_ifrit_spark.operators.text_analysis import (
        bm25_topk_queries,
        bm25_topk_queries_indexed,
        build_bm25_index,
    )
    from purescript_ifrit_spark.sources.tables import write_bucketed

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "32g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.warehouse.dir", f"{BASE}/warehouse")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- corpus generation (deterministic per 1k-doc block) -------------
    probs = np.arange(1, V + 1, dtype=np.float64) ** -ZIPF_S
    cum = np.cumsum(probs / probs.sum())

    def gen(batches):
        import numpy as np
        import pandas as pd

        terms = np.array([f"t{r:06d}" for r in range(V)])
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = np.empty(len(ids), dtype=object)
            for block in np.unique(ids // 1000):
                rng = np.random.RandomState(1_000_003 + int(block))
                u = rng.random_sample((1000, DOC_TOKENS))
                toks = terms[np.searchsorted(cum, u)]
                sel = np.nonzero(ids // 1000 == block)[0]
                for i in sel:
                    texts[i] = " ".join(toks[int(ids[i] % 1000)])
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    t0 = time.time()
    docs_path = f"{BASE}/docs"
    if not os.path.exists(docs_path):
        (
            spark.range(N_DOCS).repartition(64)
            .mapInPandas(gen, "doc_id long, text string")
            .write.mode("overwrite").parquet(docs_path)
        )
    docs = spark.read.parquet(docs_path)
    n = docs.count()
    print(json.dumps({"phase": "gen", "docs": n,
                      "wall_s": round(time.time() - t0, 1)}), flush=True)

    # selective two-term queries over the Zipf tail
    qrows = [
        (i, f"t{2000 + (i * 97) % 48000:06d} t{2000 + (i * 193 + 50) % 48000:06d}")
        for i in range(N_QUERIES)
    ]
    qs = spark.createDataFrame(qrows, "qid long, qtext string")

    # ---- A: direct (tokenizes the 500k-doc text per batch) --------------
    t0 = time.time()
    direct = bm25_topk_queries(
        docs, "doc_id", "text", qs, "qid", "qtext", k=10
    ).localCheckpoint(eager=True)
    n_direct = direct.count()
    wall_a = round(time.time() - t0, 1)
    print(json.dumps({"phase": "A_direct", "rows": n_direct,
                      "wall_s": wall_a}), flush=True)

    # ---- B: index build + term-range-sorted write (one-time) ------------
    t0 = time.time()
    postings, doclens = build_bm25_index(docs, "doc_id", "text")
    (
        postings.repartitionByRange(64, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(f"{BASE}/postings")
    )
    doclens.write.mode("overwrite").parquet(f"{BASE}/doclens")
    wall_b = round(time.time() - t0, 1)
    p2 = spark.read.parquet(f"{BASE}/postings")
    l2 = spark.read.parquet(f"{BASE}/doclens")
    n_postings = p2.count()
    sz = sum(
        os.path.getsize(os.path.join(BASE, "postings", f))
        for f in os.listdir(f"{BASE}/postings") if f.endswith(".parquet")
    )
    print(json.dumps({"phase": "B_build", "posting_rows": n_postings,
                      "at_rest_mb": round(sz / 1e6, 1),
                      "wall_s": wall_b}), flush=True)

    # ---- C: indexed, stored layout provides parallelism -----------------
    t0 = time.time()
    idx = bm25_topk_queries_indexed(
        p2, l2, qs, "qid", "qtext", "doc_id", k=10, scoring_partitions=0,
    ).localCheckpoint(eager=True)
    n_idx = idx.count()
    wall_c = round(time.time() - t0, 1)
    print(json.dumps({"phase": "C_indexed", "rows": n_idx,
                      "wall_s": wall_c}), flush=True)

    # ---- D: indexed + scan-level term screen -----------------------------
    t0 = time.time()
    idxp = bm25_topk_queries_indexed(
        p2, l2, qs, "qid", "qtext", "doc_id", k=10, scoring_partitions=0,
        prune_scan_terms=True,
    ).localCheckpoint(eager=True)
    n_idxp = idxp.count()
    wall_d = round(time.time() - t0, 1)
    print(json.dumps({"phase": "D_indexed_pruned", "rows": n_idxp,
                      "wall_s": wall_d}), flush=True)

    # value identity: A == C == D
    for name, other in (("C", idx), ("D", idxp)):
        diff = direct.exceptAll(other).count() + other.exceptAll(direct).count()
        print(json.dumps({"phase": f"identity_A_vs_{name}",
                          "symmetric_diff": diff}), flush=True)

    # ---- E: file-skip demo, 10-query batch (In-pushdown regime) ---------
    q10 = spark.createDataFrame(qrows[:5], "qid long, qtext string")
    b0, r0 = rest_stage_totals(spark)
    bm25_topk_queries_indexed(
        p2, l2, q10, "qid", "qtext", "doc_id", k=10, scoring_partitions=0,
    ).collect()
    b1, r1 = rest_stage_totals(spark)
    bm25_topk_queries_indexed(
        p2, l2, q10, "qid", "qtext", "doc_id", k=10, scoring_partitions=0,
        prune_scan_terms=True,
    ).collect()
    b2, r2 = rest_stage_totals(spark)
    print(json.dumps({
        "phase": "E_footer_skip_5q",
        "unpruned_input_mb": round((b1 - b0) / 1e6, 1),
        "unpruned_input_records": r1 - r0,
        "pruned_input_mb": round((b2 - b1) / 1e6, 1),
        "pruned_input_records": r2 - r1,
    }), flush=True)

    # bucketed catalog layout: bucket pruning visible in the plan
    write_bucketed(
        postings, "attest_postings_bucketed", ["term"], num_buckets=64,
        sort_cols=["term"],
    )
    pb = spark.table("attest_postings_bucketed")
    pruned_plan = bm25_topk_queries_indexed(
        pb, l2, q10, "qid", "qtext", "doc_id", k=10, scoring_partitions=0,
        prune_scan_terms=True,
    )
    plan = pruned_plan._jdf.queryExecution().executedPlan().toString()
    sel = [ln.strip() for ln in plan.splitlines()
           if "SelectedBucketsCount" in ln]
    print(json.dumps({"phase": "E_bucket_prune",
                      "selected_buckets": sel[:2]}), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
