"""Round-12 attestation (VERDICT r11 #4): measured pair recall of
`embedding_neardup_pairs(tables=...)` — the multi-table OR-construction
— as a curve over T, against the closed-form prediction
1 - (1 - p^P)^T with p = 1 - arccos(s)/pi.

Corpus: 20,000 base vectors (64-dim, unit-normalized N(0, I)) plus one
planted near-dup partner each (base + 0.04*N(0, I), cosine ~0.95 +- 0.01),
40,000 rows total. Ground truth = the planted (i, i+N) pairs whose TRUE
cosine clears the 0.95 threshold (computed in numpy; noise leaves some
slightly below). P = 12 planes per table (4,096 buckets — per-table
recall p^P ~= 0.28 at s = 0.95, so the curve has room to climb);
T in {1, 2, 4, 8, 12}.

Checks, per T:
  * recall = found planted pairs / true planted pairs (reported vs the
    prediction at the MEAN planted cosine);
  * precision is structurally 1 (exact verification) — asserted by
    recomputing every returned sim in numpy;
  * single emission — no duplicate (id_a, id_b) rows.

Run: python attestations/r12_neardup_multitable.py
Prints one JSON line per T. Numbers recorded in SCALE.md §Round 12.
"""
import json
import os
import time

import numpy as np

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BASE = 20_000
DIM = 64
N_PLANES = 12
THRESHOLD = 0.95


def main():
    from pyspark.sql import SparkSession

    from purescript_ifrit_spark.operators.similarity import (
        embedding_neardup_pairs,
        make_hyperplanes,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.RandomState(12)
    base = rng.standard_normal((N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    partner = base + 0.04 * rng.standard_normal((N_BASE, DIM))
    cos = (base * partner).sum(1) / np.linalg.norm(partner, axis=1)
    truth = {(i, i + N_BASE) for i in range(N_BASE) if cos[i] >= THRESHOLD}
    mean_cos = float(cos[cos >= THRESHOLD].mean())
    p_plane = 1.0 - np.arccos(mean_cos) / np.pi
    print(
        json.dumps(
            {
                "attestation": "r12_neardup_multitable",
                "n_rows": 2 * N_BASE,
                "true_pairs": len(truth),
                "mean_planted_cosine": round(mean_cos, 4),
                "p_plane": round(float(p_plane), 4),
                "n_planes": N_PLANES,
            }
        )
    )

    rows = [(i, base[i].tolist()) for i in range(N_BASE)]
    rows += [(i + N_BASE, partner[i].tolist()) for i in range(N_BASE)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df = df.repartition(CPUS).cache()
    df.count()

    vecs = np.vstack([base, partner / np.linalg.norm(partner, axis=1, keepdims=True)])

    for T in (1, 2, 4, 8, 12):
        tables = [make_hyperplanes(DIM, N_PLANES, seed=100 + s) for s in range(T)]
        t0 = time.time()
        out = embedding_neardup_pairs(
            df, "vec_id", "embedding", THRESHOLD, tables=tables
        ).collect()
        dt = time.time() - t0
        pairs = [(r.id_a, r.id_b) for r in out]
        assert len(pairs) == len(set(pairs)), "duplicate emission"
        for r in out:
            va, vb = vecs[r.id_a], vecs[r.id_b]
            s_np = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            assert abs(s_np - r.sim) < 1e-9 and r.sim >= THRESHOLD
        found = len(truth & set(pairs))
        pred = 1.0 - (1.0 - p_plane**N_PLANES) ** T
        print(
            json.dumps(
                {
                    "T": T,
                    "recall": round(found / len(truth), 4),
                    "predicted": round(float(pred), 4),
                    "pairs_returned": len(pairs),
                    "sec": round(dt, 2),
                }
            )
        )

    spark.stop()


if __name__ == "__main__":
    main()
