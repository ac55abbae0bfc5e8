"""Round-11 attestation (VERDICT r10 #3): IVF recall on CLUSTERED
geometry, measured as a curve over (nlist, nprobe), vs the same corpus
with the clusters removed — the evidence behind ivf_topk_batch's
shipped recall guidance and the ann_recall_estimate workflow.

Corpus: 200,000 x 64 vectors. Clustered mode: 64 planted Gaussian
clusters (centers ~ 4*N(0,I), points = center + N(0, 0.25*I) — well
separated, k-means-friendly). Isotropic mode: the same generator with
ONE cluster at the origin and unit noise (the r10 weak case). Queries:
1,000 vectors drawn the same way (clustered queries sit near planted
centers). Recall@10 measured by operators/similarity.ann_recall_estimate
(64-query seeded sample, brute-force truth via cosine_topk_batch).

Run: python attestations/r11_ivf_recall_clustered.py
Prints one JSON line per (mode, nlist, nprobe) plus the brute baseline.
Numbers recorded in SCALE.md §Round 11.
"""
import json
import os
import time

import numpy as np

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_ROWS = 200_000
N_QUERIES = 1_000
DIM = 64
K = 10


def make_corpus(clustered: bool, seed: int = 11):
    rng = np.random.RandomState(seed)
    n_clusters = 64 if clustered else 1
    scale = 4.0 if clustered else 0.0
    centers = rng.standard_normal((n_clusters, DIM)) * scale
    assign = rng.randint(0, n_clusters, size=N_ROWS)
    noise_sd = 0.5 if clustered else 1.0
    rows = centers[assign] + rng.standard_normal((N_ROWS, DIM)) * noise_sd
    q_assign = rng.randint(0, n_clusters, size=N_QUERIES)
    queries = (
        centers[q_assign]
        + rng.standard_normal((N_QUERIES, DIM)) * noise_sd
    )
    return rows.astype(np.float64), queries


def main():
    from pyspark.sql import SparkSession

    from purescript_ifrit_spark.operators.similarity import (
        ann_recall_estimate,
        cosine_topk_batch,
        ivf_centroids,
        ivf_topk_batch,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "32g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import pandas as pd

    results = []
    for mode in ("clustered", "isotropic"):
        rows, queries = make_corpus(mode == "clustered")
        pdf = pd.DataFrame(
            {"vec_id": np.arange(N_ROWS),
             "embedding": [r.tolist() for r in rows]}
        )
        df = spark.createDataFrame(
            pdf, "vec_id long, embedding array<double>"
        ).repartition(64)
        df.write.mode("overwrite").parquet(f"/tmp/attest_ivf_{mode}")
        df = spark.read.parquet(f"/tmp/attest_ivf_{mode}")
        qids = list(range(N_QUERIES))

        t0 = time.time()
        brute = cosine_topk_batch(df, "vec_id", "embedding", queries, qids, K)
        n_brute = brute.count()
        brute_wall = round(time.time() - t0, 1)
        results.append(
            {"mode": mode, "op": "brute", "wall_s": brute_wall,
             "rows": n_brute}
        )
        print(json.dumps(results[-1]), flush=True)

        for nlist in (64, 256):
            t0 = time.time()
            cents = ivf_centroids(df, "embedding", nlist=nlist, seed=42,
                                  sample=4096)
            build_wall = round(time.time() - t0, 1)
            for nprobe in (1, 2, 4, 8, 16):
                t0 = time.time()
                approx = ivf_topk_batch(
                    df, "vec_id", "embedding", queries, qids, cents,
                    k=K, nprobe=nprobe,
                )
                approx = approx.localCheckpoint(eager=True)
                wall = round(time.time() - t0, 1)
                rec = ann_recall_estimate(
                    df, "vec_id", "embedding", queries, qids, approx,
                    k=K, n_sample=64, seed=7,
                ).agg({"recall_micro": "avg"}).head()[0]
                results.append(
                    {"mode": mode, "op": "ivf", "nlist": nlist,
                     "nprobe": nprobe, "wall_s": wall,
                     "centroid_build_s": build_wall,
                     "recall_at_10": round(rec / 1e6, 3)}
                )
                print(json.dumps(results[-1]), flush=True)
    print("ALL:", json.dumps(results))


if __name__ == "__main__":
    main()
