"""Distributed k-means (Lloyd's algorithm) over integer vectors —
embedding-space clustering for corpus mixing / topic balancing: cluster
the embedding table, then sample or weight per cluster (the
data-mixing companion to operators/sampling.temperature_mix).

INTEGER-EXACT DESIGN (the operators/graph.py contract for iterative
algorithms): vectors are int64 arrays (quantize floats upstream, e.g.
floor(x*1000) + offset), assignment is exact integer squared-L2 with
ties broken toward the LOWEST centroid id, and the centroid update is
element-wise floor-division mean — so the centroids after k iterations
are a pure integer function of the input and an unrolled SQL twin can
recompute them bit-for-bit (float k-means differs in the last ulp per
summation order, which flips assignments near Voronoi boundaries and
cascades).

NONNEGATIVITY NOTE: keep quantized coordinates nonnegative (add a
constant offset — k-means is translation-invariant, assignments and
relative centroids are unchanged). Floor-division of negative sums is
engine-divergent (Python floors toward -inf, DuckDB/Spark `div`
truncate toward zero); nonnegative sums make them agree, and the
operator raises on negative input rather than silently diverging from
its own oracle contract.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec, centroid: Sequence[int]):
    lit = F.array(*[F.lit(int(c)).cast("long") for c in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


# Above this k, the unrolled per-centroid folds stop paying: k separate
# aggregate subtrees make Catalyst planning + janino codegen grow with k
# (measured: k=64/dim=8 assignment plans in ~6 s BEFORE any data moves;
# k=16 in ~1 s). The single-HOF form below collapses the tree to ONE
# transform over an array-of-arrays centroid literal — planning is flat
# in k; the lambda body is interpreted, a per-row constant factor the
# scan absorbs. Same integer math, same first-occurrence tie-break.
_UNROLL_MAX_K = 16


def _dists_expr(vec, centroids: List[List[int]], vec_sql: str = None):
    """Array of exact squared distances to every centroid — the shared
    kernel behind assignment AND the `with_dist` witness column, so both
    take the same k-scaled strategy: unrolled codegen folds below
    `_UNROLL_MAX_K`, ONE parsed SQL expression above it (the Column form
    of a k×dim centroid literal costs k·dim F.lit py4j round trips,
    ~850 ms at k=64/dim=8, and kmeans+semdedup build it three times per
    run — the minhash_bands_sql lesson applied to the centroid matrix),
    Column-DSL HOF as the no-vec_sql fallback. Same longs, same lambda
    bodies; pinned vs the Column form in
    test_assign_expr_sql_twin_is_bit_identical."""
    if len(centroids) <= _UNROLL_MAX_K:
        return F.array(*[_sq_dist(vec, c) for c in centroids])
    if vec_sql is not None:
        cent_sql = "array(" + ",".join(
            "array(" + ",".join(f"{int(x)}L" for x in c) + ")"
            for c in centroids
        ) + ")"
        return F.expr(
            f"transform({cent_sql}, c -> aggregate("
            f"zip_with({vec_sql}, c, (x, y) -> (x - y) * (x - y)), "
            "0L, (acc, x) -> acc + x))"
        )
    cent = F.array(
        *[
            F.array(*[F.lit(int(x)).cast("long") for x in c])
            for c in centroids
        ]
    )
    return F.transform(
        cent,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )


def _assign_expr(vec, centroids: List[List[int]], vec_sql: str = None):
    dists = _dists_expr(vec, centroids, vec_sql)
    # array_position returns the FIRST (1-based) occurrence of the min —
    # exactly the lowest-centroid-id tie-break the contract pins
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str,
    init_centroids: List[List[int]],
    n_iter: int = 3,
    *,
    with_dist: bool = False,
) -> Tuple[DataFrame, List[List[int]]]:
    """`n_iter` exact Lloyd iterations from explicit integer seed
    centroids; returns (df + `cluster` column assigned under the FINAL
    centroids, the final centroids). `with_dist` adds `sq_dist`, the
    exact squared distance to the assigned centroid — one integer that
    witnesses every final centroid coordinate (the planted-oracle
    hook).

    Empty clusters keep their previous centroid (deterministic; no
    re-seeding randomness).

    100 TB design: assignment is a scan-stage unrolled expression (k
    codegen'd HOF folds — no join, nothing shuffles); the update is ONE
    (cluster, pos)-keyed exchange per iteration (posexplode → partial
    sums map-side), and the only driver materialization is the k×dim
    centroid matrix per iteration (k and dim are model constants, like
    ivf_centroids' bounded build — similarity.py:249). The input plan
    is re-read per iteration: persist the quantized projection upstream
    for multi-iteration runs over slow sources (the power-iteration
    lesson, operators/graph.py — measured, Spark does not dedupe
    identical subtrees)."""
    k = len(init_centroids)
    if k < 1:
        raise ValueError("need at least one centroid")
    dim = len(init_centroids[0])
    if any(len(c) != dim for c in init_centroids):
        raise ValueError("ragged init_centroids")
    if not 1 <= n_iter <= 50:
        raise ValueError(f"n_iter must be in [1, 50] (got {n_iter})")
    if any(x < 0 for c in init_centroids for x in c):
        raise ValueError(
            "negative centroid coordinate: shift the quantization to a "
            "nonnegative domain (see module docstring — floor division "
            "semantics diverge across engines below zero)"
        )

    vec = F.col(vec_col)
    centroids = [[int(x) for x in c] for c in init_centroids]
    # staged distances (r14 optimization round, guide §1.2): _assign_expr
    # references its distance array twice (array_position + array_min), so
    # the flat form ran the k×dim distance fold TWICE per row per
    # iteration; staging the array in its own projection halves the
    # assignment cost. Same distances, same first-occurrence tie-break.
    for _ in range(n_iter):
        staged = df.select(
            _dists_expr(vec, centroids, f"`{vec_col}`").alias("_d"),
            vec.alias("_v"),
        )
        _d = F.col("_d")
        assigned = staged.select(
            (F.array_position(_d, F.array_min(_d)) - 1)
            .cast("int")
            .alias("_c"),
            "_v",
        )
        sums = (
            assigned.select("_c", F.posexplode("_v").alias("_p", "_x"))
            .groupBy("_c", "_p")
            .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        by_cluster: dict = {}
        for r in sums:
            if r["_s"] < 0:
                raise ValueError(
                    "negative coordinate sum: input vectors must be "
                    "nonnegative for the exactness contract"
                )
            by_cluster.setdefault(r["_c"], {})[r["_p"]] = (r["_s"], r["_n"])
        centroids = [
            [
                by_cluster[cid][p][0] // by_cluster[cid][p][1]
                if cid in by_cluster
                else centroids[cid][p]
                for p in range(dim)
            ]
            for cid in range(k)
        ]
    # final assignment over the SAME staged distance array (with_dist
    # previously rebuilt the full distance expression a second time)
    staged = df.withColumn(
        "_ifrit_kd", _dists_expr(vec, centroids, f"`{vec_col}`")
    )
    _kd = F.col("_ifrit_kd")
    out = staged.withColumn(
        "cluster", (F.array_position(_kd, F.array_min(_kd)) - 1).cast("int")
    )
    if with_dist:
        out = out.withColumn("sq_dist", F.array_min(_kd))
    return out.drop("_ifrit_kd"), centroids


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    init_centroids: List[List[int]],
    n_iter: int = 3,
    *,
    threshold_num: int = 19,
    threshold_den: int = 20,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space with
    k-means, then within each cluster drop every item that has a
    LOWER-id neighbor with cosine >= num/den — semantic dedup where the
    quadratic work is bounded by cluster size, never the corpus.

    INTEGER-EXACT decision rule on integer vectors (the module
    contract): cos(x, y) >= t  ⇔  dot >= 0 AND dot²·den² >= num²·|x|²·|y|²
    — every operand an exact integer, evaluated in DECIMAL(38,0) so the
    squares cannot overflow int64 (bound: dot²·den² < 10³⁸, comfortable
    for quantized embeddings up to ~2^14 per coordinate at dim ≲ 64).
    The keep/drop decision is therefore bit-reproducible on any engine.

    Cross-cluster near-duplicates are NOT examined — that is SemDeDup's
    documented approximation (k trades dedup recall against the
    quadratic bound); boundary pairs split by k-means survive.

    100 TB design: one self-join keyed on (cluster) — at production k
    (tens of thousands) clusters are small and uniform; the join input
    carries only (id, cluster, vector). Returns (id, cluster, keep) with
    keep = true for survivors (the minimum id of every within-cluster
    near-dup neighborhood always survives)."""
    assigned, _ = kmeans_lloyd(
        df.select(id_col, vec_col), vec_col, init_centroids, n_iter
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda v: v * v),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    # squared norms staged per SIDE (r14 optimization round, guide §1.2):
    # computed in the pair projection they cost one integer fold per
    # candidate PAIR each; in the join-side projections they cost one per
    # corpus row. Same integers, same decision rule.
    x = assigned.select(
        F.col(id_col).alias("_ix"), "cluster", F.col(vec_col).alias("_vx"),
        sq(F.col(vec_col)).alias("_nx2"),
    )
    y = assigned.select(
        F.col(id_col).alias("_iy"), "cluster", F.col(vec_col).alias("_vy"),
        sq(F.col(vec_col)).alias("_ny2"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("_vx"), F.col("_vy"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pairs = (
        x.join(y, "cluster")
        .filter(F.col("_iy") < F.col("_ix"))
        .withColumn("_dot", dot)
        .filter(
            # zero-norm guard (ADVICE r7): cosine is UNDEFINED for a
            # zero vector, but dot=0 satisfies dot>=0 and 0 >= 0·t², so
            # without this every all-zero vector except the min id would
            # silently drop as a "duplicate" of another zero vector
            (F.col("_nx2") > 0)
            & (F.col("_ny2") > 0)
            & (F.col("_dot") >= 0)
            & (
                dec(F.col("_dot")) * dec(F.col("_dot"))
                * F.lit(threshold_den * threshold_den)
                >= F.lit(threshold_num * threshold_num)
                * dec(F.col("_nx2")) * dec(F.col("_ny2"))
            )
        )
    )
    dropped = pairs.select(F.col("_ix").alias(id_col)).distinct().withColumn(
        "_dropped", F.lit(True)
    )
    return (
        assigned.select(id_col, "cluster")
        .join(dropped, id_col, "left")
        .select(
            id_col, "cluster", F.col("_dropped").isNull().alias("keep")
        )
    )


def hard_negatives(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    init_centroids: List[List[int]],
    n_iter: int = 3,
    *,
    k: int = 3,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every anchor,
    the k most-similar items with a DIFFERENT label — searched within
    the anchor's k-means cluster, which is where hard negatives live by
    definition (a negative outside the cluster is an easy negative).

    INTEGER-EXACT contract (the module invariant): similarity is the
    raw dot product over integer vectors, ranked (dot desc, id asc), so
    the mined set is bit-reproducible and the planted oracle replays
    the same clustering, the same window, the same ties.

    100 TB design: clustering bounds the candidate join exactly as in
    semdedup — one (cluster)-keyed self-join, then one anchor-keyed
    window for the top-k; at production k-means fan-out (tens of
    thousands of clusters) both stay cluster-sized. Returns
    (id, neg_rank 1..k, neg_id, dot)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    assigned, _ = kmeans_lloyd(
        df.select(id_col, vec_col, label_col), vec_col, init_centroids,
        n_iter,
    )
    a = assigned.select(
        F.col(id_col).alias("_ia"), "cluster",
        F.col(vec_col).alias("_va"), F.col(label_col).alias("_la"),
    )
    b = assigned.select(
        F.col(id_col).alias("_ib"), "cluster",
        F.col(vec_col).alias("_vb"), F.col(label_col).alias("_lb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_ia").orderBy(
        F.col("_dot").desc(), F.col("_ib").asc()
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("_la") != F.col("_lb"))
        .withColumn("_dot", dot)
        .withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(
            F.col("_ia").alias(id_col),
            F.col("neg_rank").cast("int"),
            F.col("_ib").alias("neg_id"),
            F.col("_dot").alias("dot"),
        )
    )
