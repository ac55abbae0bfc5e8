"""Round-12 attestation: PQ/ADC at 200,000 x 64-dim — speed vs the
brute batch kernel AND an honest recall story on adversarial geometry.

Corpus: 64 planted Gaussian clusters (centers ~ 4*N(0,I), points =
center + 0.5*N(0,I)) — the r11 clustered geometry. This is the
needle-in-a-cluster case: a query's true top-10 are ~3,000 same-cluster
points separated by LESS than the quantization error, so plain ADC
ranking WITHIN the cluster is expected to be weak. The attestation
measures exactly that (instead of hiding it): recall@10 vs exact L2
truth (numpy) at m=8 and m=16, relative distortion from
pq_distortion_stats (the shipped pre-commit diagnostic), rerank
recovery as overfetch grows, and wall time vs the brute kernel.

Run: PYTHONPATH=/root/repo python attestations/r12_pq_adc_scale.py
Prints one JSON line per measurement. Numbers + guidance recorded in
SCALE.md §Round 12.
"""
import json
import os
import time

import numpy as np

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_ROWS = 200_000
N_QUERIES = 64
DIM = 64
K = 10


def main():
    from pyspark.sql import SparkSession

    from purescript_ifrit_spark.operators import similarity as S

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.RandomState(11)
    centers = rng.standard_normal((64, DIM)) * 4.0
    assign = rng.randint(0, 64, size=N_ROWS)
    rows = centers[assign] + rng.standard_normal((N_ROWS, DIM)) * 0.5
    q_assign = rng.randint(0, 64, size=N_QUERIES)
    queries = centers[q_assign] + rng.standard_normal((N_QUERIES, DIM)) * 0.5
    qids = list(range(N_QUERIES))

    # exact L2 truth, numpy: ||x||^2 - 2 x.q + ||q||^2
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

    def steady(fn, n=3):
        best = None
        for _ in range(n):
            t = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t
            best = dt if best is None else min(best, dt)
        return best

    brute_s = steady(
        lambda: S.cosine_topk_batch(df, "vec_id", "embedding", queries, qids, k=K)
    )
    print(json.dumps({"path": "brute_batch(cosine)", "sec": round(brute_s, 2)}))

    for m in (8, 16):
        t0 = time.time()
        books = S.pq_codebooks(df, "embedding", m=m, k=256, seed=42, sample=8192)
        coded = S.pq_encode(df, "embedding", books).select(
            "vec_id", "pq_code"
        ).cache()
        coded.count()
        build_s = time.time() - t0
        dist = S.pq_distortion_stats(
            df.join(coded, "vec_id"), "embedding", "pq_code", books
        ).collect()[0]
        rel = dist.mean_sq_error / dist.mean_norm_sq
        adc_s = steady(
            lambda: S.pq_topk_batch(
                coded, "vec_id", "pq_code", queries, qids, books, k=K
            )
        )
        adc = {}
        for r in S.pq_topk_batch(
            coded, "vec_id", "pq_code", queries, qids, books, k=K
        ).collect():
            adc.setdefault(r.query_id, set()).add(r.vec_id)
        recall = np.mean([
            len(adc.get(qi, set()) & truth[qi]) / K for qi in range(N_QUERIES)
        ])
        print(json.dumps({
            "path": f"pq_adc_batch(m={m},k=256)", "sec": round(adc_s, 2),
            "build_s": round(build_s, 1),
            "relative_distortion": round(float(rel), 5),
            "recall_at_10_vs_exact_l2": round(float(recall), 4),
            "speedup_vs_brute": round(brute_s / adc_s, 2),
        }))
        if m == 16:
            both = df.join(coded, "vec_id").cache()
            both.count()
            for of in (4, 32, 128):
                hits = 0
                t = time.time()
                for qi in range(8):  # 8 queries is enough for the curve
                    rr = S.pq_topk_rerank(
                        both, "vec_id", "embedding", "pq_code",
                        queries[qi], books, k=K, overfetch=of,
                    ).collect()
                    hits += len({r.vec_id for r in rr} & truth[qi])
                print(json.dumps({
                    "path": f"pq_rerank(m=16,overfetch={of})",
                    "recall_at_10_vs_exact_l2": round(hits / (8 * K), 4),
                    "sec_per_query": round((time.time() - t) / 8, 2),
                }))
            both.unpersist()
        coded.unpersist()
    spark.stop()


if __name__ == "__main__" and os.environ.get("PQ_RESIDUAL_ONLY") != "1":
    main()


def residual_section():
    """Measured separately (same corpus/truth): residual IVF-PQ —
    encode v - centroid[cell], rank with per-cell LUTs."""
    from pyspark.sql import SparkSession

    from purescript_ifrit_spark.operators import similarity as S

    spark = SparkSession.getActiveSession()
    rng = np.random.RandomState(11)
    centers = rng.standard_normal((64, DIM)) * 4.0
    assign = rng.randint(0, 64, size=N_ROWS)
    rows = centers[assign] + rng.standard_normal((N_ROWS, DIM)) * 0.5
    q_assign = rng.randint(0, 64, size=N_QUERIES)
    queries = centers[q_assign] + rng.standard_normal((N_QUERIES, DIM)) * 0.5

    xn = (rows ** 2).sum(1)
    df = spark.createDataFrame(
        [(i, rows[i].tolist()) for i in range(N_ROWS)],
        "vec_id long, embedding array<double>",
    ).repartition(CPUS).cache()
    df.count()

    t0 = time.time()
    cents = S.ivf_centroids(df, "embedding", nlist=64, seed=7, sample=8192)
    cents = S.ivf_centroids_refine(df, "embedding", cents)
    assigned = S.with_ivf_assignment(df, "embedding", cents)
    resid = S.with_ivf_residual(assigned, "embedding", cents)
    books = S.pq_codebooks(resid, "residual", m=8, k=256, seed=42, sample=8192)
    coded = S.pq_encode(resid, "residual", books).select(
        "vec_id", "ivf_cell", "pq_code"
    ).cache()
    coded.count()
    build_s = time.time() - t0
    rel = None
    d = S.pq_distortion_stats(
        S.pq_encode(resid, "residual", books), "residual", "pq_code", books
    ).collect()[0]
    rel = d.mean_sq_error / max(d.mean_norm_sq, 1e-12)

    hits, t = 0, time.time()
    n_eval = 16
    for qi in range(n_eval):
        truth = set(
            np.argsort(xn - 2.0 * (rows @ queries[qi]), kind="stable")[:K].tolist()
        )
        got = {
            r.vec_id
            for r in S.ivf_pq_topk_residual(
                coded, "vec_id", "pq_code", queries[qi], books, cents,
                k=K, nprobe=4,
            ).collect()
        }
        hits += len(got & truth)
    print(json.dumps({
        "path": "ivf_pq_residual(m=8,k=256,nprobe=4)",
        "recall_at_10_vs_exact_l2": round(hits / (n_eval * K), 4),
        "relative_residual_distortion": round(float(rel), 5),
        "build_s": round(build_s, 1),
        "sec_per_query": round((time.time() - t) / n_eval, 2),
    }))


if os.environ.get("PQ_RESIDUAL_ONLY") == "1":
    # run just the residual section against a fresh session
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    residual_section()
    spark.stop()
