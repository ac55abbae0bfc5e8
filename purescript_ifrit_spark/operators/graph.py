"""Link-graph operators for corpus curation: damped power-iteration
authority scores (PageRank-style) over an edge list.

Web-corpus pipelines use link-graph authority as a document/domain
quality prior (the Common Crawl ranking family — harmonic centrality /
PageRank over the domain graph). SURVEY.md §2.7 scope: no reference
counterpart; this is the driver-mandated training-data-pipeline
extension surface, like operators/dedup.connected_components.

INTEGER-EXACT DESIGN (the codebase's oracle contract for iterative
float algorithms): scores are integers at a fixed scale (default 10¹²),
the damping factor is a percentage, and every redistribution step is a
floor division — so the score vector after k iterations is a pure
integer function of the edge list, reproducible bit-for-bit by any
engine (a DuckDB oracle recomputes the unrolled iterations exactly;
float power iteration would drift in the last ulp per summation order
and amplify over iterations). Floor losses slightly deflate total mass
per step — identically on every engine; ranking order is what the
signal is for.

Dangling nodes (no out-edges) keep receiving the teleport term but
their mass is not redistributed (the "pruned" PageRank variant) —
documented, deterministic, and the common choice for quality-prior use
where absolute probabilities are irrelevant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def power_iteration_ranks(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    damping_pct: int = 85,
    n_iter: int = 10,
    scale: int = 10**12,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Authority scores over a directed edge list via `n_iter` damped
    power iterations, integer-exact (see module docstring).

    Returns (node, score_scaled, rank): score_scaled is the exact
    integer score at `scale`; rank = score_scaled / scale as a double.

    100 TB design: per iteration, ONE edge-sized join (edges ⋈ the
    node-sized score vector on src — AQE broadcasts the scores side
    while it fits, shuffle-joins beyond that), one dst-keyed aggregate
    with map-side partials, and one node-sized left join for the
    teleport term. The loop-invariant relations — the node set and the
    outdegree-annotated edge list — are PERSISTED before the loop:
    Spark does not dedupe identical subtrees across a plan (measured:
    22 source scans / 0 ReusedExchange for 5 unpersisted iterations),
    so without the persist every iteration would re-scan and re-derive
    both; the node cache materializes in the same bounded count the
    teleport share already needs (a single long — the ONLY driver
    action). Lineage still grows linearly with n_iter: set
    `checkpoint_every` (localCheckpoint) for long runs — the loop
    itself is lazy plan construction, not per-iteration jobs. The
    final score vector is localCheckpointed (one node-sized job) so
    both loop-invariant caches can be RELEASED before returning —
    without it the returned lazy plan would keep them pinned for the
    session's lifetime (the curate persist-contract lesson,
    pipeline.py:24), and the checkpoint also truncates the n_iter-deep
    lineage the caller would otherwise re-optimize on every action.

    Overflow headroom: total mass never exceeds `scale` (floors only
    lose mass), so the per-edge product score·damping_pct ≤ scale·100
    ≈ 10¹⁴ ≪ 2⁶³.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100] (got {damping_pct})")
    if not 1 <= n_iter <= 50:
        raise ValueError(
            f"n_iter must be in [1, 50] (got {n_iter}) — power iteration "
            "converges geometrically; >50 is a misuse, not a need"
        )
    if scale < 10**6:
        raise ValueError(f"scale too small for meaningful floors ({scale})")
    if scale > 9 * 10**16:
        # r8 review: the headroom argument below assumes scale ≈ 10^12 —
        # a node holding most of the mass makes score·damping_pct
        # approach scale·100, which overflows int64 past ~9.2e16·100
        # (ANSI mode: mid-iteration ARITHMETIC_OVERFLOW; non-ANSI:
        # silent wraparound garbage "exact" ranks)
        raise ValueError(
            f"scale too large for int64 headroom ({scale}): "
            "score*damping_pct must stay under 2^63 — use scale <= 9e16"
        )
    # r14 optimization round (guide §1.2 — don't recompute what you
    # already paid for): nodes/outdeg/e each used to re-derive the INPUT
    # edges subtree (3 full input computations before the loop — at
    # bench sf0.1 the input is a scan+distinct of the events table, and
    # at 100 TB it is 3 corpus passes). Now the input subtree appears
    # only inside e's build (twice — edge list + outdeg — where
    # ReuseExchange dedupes the distinct's exchange), and the node set
    # derives from the PERSISTED e: the inner join on src keeps every
    # edge (each edge's src has outdeg >= 1), so (_u ∪ _v) is exactly
    # (src ∪ dst). Values identical; measured at sf0.1/32: pre-loop
    # 2 node-sized jobs instead of 3 input passes.
    outdeg = edges.groupBy(F.col(src).alias("_u")).agg(
        F.count(F.lit(1)).alias("_outdeg")
    )
    e = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v")).join(
        outdeg, "_u"
    ).persist()
    nodes = (
        e.select(F.col("_u").alias("node"))
        .unionAll(e.select(F.col("_v").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # the one bounded driver action (a single long)
    # — also materializes BOTH loop-invariant caches (nodes scans e)
    if n_nodes == 0:
        out = nodes.select(
            "node",
            F.lit(0).cast("long").alias("score_scaled"),
            F.lit(0.0).alias("rank"),
        ).localCheckpoint()
        nodes.unpersist()
        e.unpersist()
        return out
    init = scale // n_nodes
    teleport = (scale * (100 - damping_pct)) // (100 * n_nodes)
    scores = nodes.select("node", F.lit(init).cast("long").alias("score"))
    for i in range(n_iter):
        contribs = (
            e.join(scores.withColumnRenamed("node", "_u"), "_u")
            .select(
                "_v",
                F.expr(f"(score * {damping_pct}) div (100 * _outdeg)").alias(
                    "_c"
                ),
            )
            .groupBy("_v")
            .agg(F.sum("_c").alias("_in"))
        )
        scores = (
            nodes.join(contribs, nodes.node == contribs._v, "left")
            .select(
                "node",
                (F.lit(teleport) + F.coalesce(F.col("_in"), F.lit(0)))
                .cast("long")
                .alias("score"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            scores = scores.localCheckpoint()
    out = scores.select(
        "node",
        F.col("score").alias("score_scaled"),
        (F.col("score").cast("double") / F.lit(float(scale))).alias("rank"),
    ).localCheckpoint()
    nodes.unpersist()
    e.unpersist()
    return out
