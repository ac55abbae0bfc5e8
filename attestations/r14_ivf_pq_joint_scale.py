"""Round-14 attestation: the JOINT (nprobe x overfetch) advisor and the
MEASURED vector-scan cost of the composed stored path at 200,000 x
64-dim on the adversarial clustered geometry (the r12/r13 corpus: 64
Gaussian clusters, centers ~ 4*N(0,I), points = center + 0.5*N(0,I);
queries drawn the same way).

What it measures, against exact numpy L2 truth:

1. MEASURED SCAN PRUNING (VERDICT r13 #1/#2 at scale): the r14 fix
   pushes the probed-cell union into ivf_pq_rerank_batch's rerank-side
   vector scan; this reports `vector_scan_rows` from the executed
   plan's FileSourceScanExec metrics — not arithmetic — for a SMALL
   batch (Q=4: the union of probed cells is small, pruning is deep) and
   the FULL batch (Q=64: 64 queries' probed-cell union covers most of
   the 64 cells, so the honest number is large — batching trades union
   width for per-query amortization; the per-QUERY bound stays
   nprobe/nlist).
2. JOINT ADVISOR (VERDICT r13 #5 at scale): ivf_pq_advise over the
   stored layout with composite cost alpha*nprobe/nlist +
   beta*k*overfetch*Q — the measured 2-D cost/recall surface and the
   cheapest (nprobe, overfetch) pair for each SLO.

Run: PYTHONPATH=/root/repo python attestations/r14_ivf_pq_joint_scale.py
Prints one JSON line per measurement. Numbers + guidance recorded in
SCALE.md §Round 14.
"""
import json
import os
import shutil
import tempfile
import time

import numpy as np

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_ROWS = 200_000
N_QUERIES = 64
DIM = 64
NLIST = 64
K = 10


def main():
    from pyspark.sql import SparkSession

    from purescript_ifrit_spark.operators import similarity as S
    from purescript_ifrit_spark.plans.metrics import vector_scan_rows

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.RandomState(11)
    centers = rng.standard_normal((NLIST, DIM)) * 4.0
    assign = rng.randint(0, NLIST, size=N_ROWS)
    rows = centers[assign] + rng.standard_normal((N_ROWS, DIM)) * 0.5
    q_assign = rng.randint(0, NLIST, size=N_QUERIES)
    queries = centers[q_assign] + rng.standard_normal((N_QUERIES, DIM)) * 0.5
    qids = list(range(N_QUERIES))

    xn = (rows ** 2).sum(1)
    truth = {}
    for qi in range(N_QUERIES):
        d = xn - 2.0 * (rows @ queries[qi])
        truth[qi] = set(np.argsort(d, kind="stable")[:K].tolist())

    df = spark.createDataFrame(
        [(i, rows[i].tolist()) for i in range(N_ROWS)],
        "vec_id long, embedding array<double>",
    ).repartition(CPUS).cache()
    df.count()

    t0 = time.perf_counter()
    cents0 = S.ivf_centroids(df, "embedding", nlist=NLIST, seed=7)
    cents = S.ivf_centroids_refine(df, "embedding", cents0, iterations=2)
    ra = S.with_ivf_assignment(df, "embedding", cents)
    rr = S.with_ivf_residual(ra, "embedding", cents)
    books = S.pq_codebooks(rr, "residual", m=8, k=256, seed=7, sample=16384)
    vdir = tempfile.mkdtemp(prefix="r14_ivfpq_joint_")
    try:
        S.write_ivf_pq_partitioned(
            df, "vec_id", "embedding", cents, books, vdir,
            residual=True, keep_vector=True,
        )
        print(json.dumps({
            "step": "index_build",
            "rows": N_ROWS, "dim": DIM, "nlist": NLIST,
            "pq": "m=8,k=256,residual,keep_vector",
            "build_sec": round(time.perf_counter() - t0, 2),
        }))
        vstored = spark.read.parquet(vdir)

        # ---- 1. measured scan pruning, small batch vs full batch -------
        for q_take in (4, N_QUERIES):
            sub_q = queries[:q_take]
            sub_ids = qids[:q_take]
            t0 = time.perf_counter()
            frame = S.ivf_pq_rerank_batch(
                vstored, "vec_id", "embedding", "pq_code", sub_q,
                sub_ids, books, cents, k=K, nprobe=2, overfetch=2,
            )
            got = frame.collect()
            wall = time.perf_counter() - t0
            by_q = {}
            for r in got:
                by_q.setdefault(r.query_id, set()).add(r.vec_id)
            hits = sum(
                len(by_q.get(qi, set()) & truth[qi]) for qi in sub_ids
            )
            vec = vector_scan_rows(frame, "embedding")
            print(json.dumps({
                "step": "rerank_scan_measured",
                "path": f"ivf_pq_rerank(nprobe=2,overfetch=2,Q={q_take})",
                "recall_at_10_vs_exact_l2": round(hits / (q_take * K), 4),
                "vector_scan_rows_measured": vec["rows"],
                "vector_scan_corpus_fraction": round(
                    (vec["rows"] or 0) / N_ROWS, 4
                ),
                "shortlist_rows_bound": K * 2 * q_take,
                "wall_sec": round(wall, 2),
            }))

        # ---- 2. joint advisor on the stored layout ----------------------
        # alpha prices the fraction of the layout's files listed+scanned;
        # beta prices one full-width row reranked. beta=1e-5 puts the two
        # terms in the same decade for this (k, Q, nlist) so the 2-D trade
        # is real: nprobe term 1/64..4/64, rerank term 0.0064..0.0256.
        for slo in (0.30, 0.50):
            t0 = time.perf_counter()
            adv = S.ivf_pq_advise(
                vstored, "vec_id", "embedding", "pq_code", queries, qids,
                books, cents, k=K, target_recall=slo,
                nprobes=(1, 2, 4), overfetches=(1, 2, 4),
                alpha=1.0, beta=1e-5, n_sample=32, seed=3,
            )
            print(json.dumps({
                "step": "joint_advisor",
                "slo": f"recall@10 >= {slo} (stored residual IVF-PQ + rerank)",
                "chosen": adv["chosen"],
                "curve": adv["curve"],
                "wall_sec": round(time.perf_counter() - t0, 2),
            }))
    finally:
        shutil.rmtree(vdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
