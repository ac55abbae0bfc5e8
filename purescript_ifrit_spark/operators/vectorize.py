"""Text → vector operators built on the hashing trick, plus linear-model
scoring — the bridge between the text-curation stack and the ANN/embedding
stack without any external model artifact.

No reference counterpart (SURVEY.md §2.7 family). Feature-hash embeddings
are the classic deterministic text vectorizer (Weinberger et al.'s hashing
trick): token → md5 bucket + sign, so the vector is a pure function of the
text — reproducible across engines, which is what makes the paired oracles
value-exact. A linear classifier over those features is exactly the
fastText-style quality-filter shape corpora are actually filtered with at
scale; `linear_hash_score` applies such a model (any (bucket, weight)
table) in one scan-stage join-free pass per token stream.

100 TB design: everything follows the codegen-aggregate discipline the
dedup signatures use — tokens explode once, bucket/sign are scan-stage
integer expressions on the md5 the engine computes anyway, and the only
exchanges are doc-keyed aggregations with map-side partials. No interpreted
per-token higher-order folds, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from purescript_ifrit_spark.functions import text as X


def _bucket_and_sign(tok_col, dim: int):
    """(bucket, sign) of a token under the hashing trick: bucket = the
    first 8 md5 hex digits mod dim; sign = ±1 from the 9th hex digit's
    low bit. Engine-neutral (md5 + integer ops only).

    For the codegen'd explode+agg operators only — whole-stage codegen's
    subexpression elimination dedupes the two md5 references. The
    interpreted HOF paths (vectorize_expr / hash_margin_expr) must NOT
    call this per fold step: HOF lambdas re-evaluate every subtree per
    invocation, so they go through _bs_structs, which binds the 9-char
    md5 prefix once per token (r8 review: 2·dim·n_tokens md5 calls per
    row down to n_tokens)."""
    h8 = F.conv(F.substring(F.md5(tok_col), 1, 8), 16, 10).cast("long")
    bucket = (h8 % dim).cast("int")
    sign9 = F.conv(F.substring(F.md5(tok_col), 9, 1), 16, 10).cast("long")
    sign = F.when(sign9 % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    return bucket, sign


def _bs_structs(toks, dim: int):
    """array<struct<b:int, s:long>> of (bucket, sign) per token, with the
    md5 evaluated ONCE per token: the inner transform materializes the
    9-hex-char prefix, the outer derives bucket and sign from that short
    string — nested transforms evaluate the inner array once, so the
    md5 count is n_tokens regardless of dim or fold width."""
    pre = F.transform(toks, lambda t: F.substring(F.md5(t), 1, 9))
    return F.transform(
        pre,
        lambda h: F.struct(
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
             % dim).cast("int").alias("b"),
            F.when(
                F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 == 0,
                F.lit(1),
            ).otherwise(F.lit(-1)).cast("long").alias("s"),
        ),
    )


def feature_hash_sparse(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Sparse hashing-trick document vectors: one (id, bucket, value) row
    per non-zero coordinate, value = signed token count. Flat rows — the
    oracle-comparable form, and the storage-efficient one (a 1M-dim space
    costs only the non-zeros).

    Zero-sum coordinates (a +1 and a −1 token colliding) are DROPPED, so
    the sparse form contains exactly the non-zeros of the dense vector."""
    if dim <= 0:
        raise ValueError(f"dim must be positive (got {dim})")
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(X.tokens(F.col(text_col))).alias("_t"),
    ).filter(F.col("_t") != "")
    bucket, sign = _bucket_and_sign(F.col("_t"), dim)
    return (
        toks.select("_id", bucket.alias("bucket"), sign.alias("_s"))
        .groupBy("_id", "bucket")
        .agg(F.sum("_s").alias("value"))
        .filter(F.col("value") != 0)
        .select(F.col("_id").alias(id_col), "bucket", "value")
    )


def feature_hash_embed(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    dim: int = 64, normalize: bool = True,
) -> DataFrame:
    """Dense hashing-trick embeddings (id, embedding: array<double>) —
    the composable form for the ANN/similarity stack (cosine_topk,
    knn_join_lsh, embedding_neardup_pairs all accept it directly).

    Built FROM the sparse form: map_from_entries + a sequence transform
    densify per doc (vocabulary work is already done; this is one
    scan-stage projection over the aggregated rows), then one id-keyed
    left join back to the input so token-less docs get the ZERO vector
    instead of no row at all (r8 review: the sparse form rightly holds
    only non-zeros, but an embedding TABLE consumer expects one row per
    document). `normalize` L2-scales so cosine is an inner product
    downstream; the zero vector stays zero. Sparse↔dense equivalence is
    pinned in tests; use the sparse form for driver-comparable output."""
    sparse = feature_hash_sparse(df, id_col, text_col, dim)
    entries = df.select(id_col).join(
        sparse.groupBy(id_col).agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "value"))
            ).alias("_m")
        ),
        id_col,
        "left",
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("int")).cast("double"),
            F.lit(0.0),
        ),
    )
    if not normalize:
        return entries.select(id_col, dense.alias("embedding"))
    # STAGED projections: the dense array and its norm materialize as
    # columns before the element-wise divide — embedding the norm
    # aggregate inside the transform lambda re-evaluates the full O(dim)
    # reduction per ELEMENT (higher-order functions run interpreted with
    # no cross-invocation CSE → O(dim²) per row). CollapseProject keeps
    # the stages apart because merging would duplicate the non-cheap
    # aggregate (SPARK-36718 semantics, same as quality_score's stages).
    staged = entries.select(id_col, dense.alias("_emb")).withColumn(
        "_nrm",
        F.sqrt(
            F.aggregate(
                F.col("_emb"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        ),
    )
    return staged.select(
        id_col,
        F.transform(
            F.col("_emb"),
            lambda x: F.when(F.col("_nrm") == 0, F.lit(0.0)).otherwise(
                x / F.col("_nrm")
            ),
        ).alias("embedding"),
    )


def linear_hash_score(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    bias: float = 0.0,
) -> DataFrame:
    """Apply a linear model over hashed token features — the fastText-style
    corpus quality filter: score = σ(bias + Σ_tokens sign·w[bucket]),
    keep = score ≥ 0.5 (equivalently margin ≥ 0).

    `weights` is any (bucket:int, w:double) table — learned offline or a
    heuristic. It is vocabulary-free and at most `dim` rows, so it
    BROADCASTS; the corpus-side cost is one token explode + one broadcast
    join + one doc-keyed aggregation with map-side partials, plus one
    id-keyed left join back to the input so EVERY document gets a
    decision (r8 review: token-less — empty/blank/NULL-text — docs used
    to vanish from the output entirely, silently escaping the quality
    gate; they now score margin = bias, keep ≡ bias ≥ 0). Output:
    (id, margin, score, keep)."""
    if dim <= 0:
        raise ValueError(f"dim must be positive (got {dim})")
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(X.tokens(F.col(text_col))).alias("_t"),
    ).filter(F.col("_t") != "")
    bucket, sign = _bucket_and_sign(F.col("_t"), dim)
    feats = toks.select("_id", bucket.alias("bucket"), sign.alias("_s"))
    joined = feats.join(
        F.broadcast(weights.select("bucket", "w")), "bucket", "left"
    ).withColumn("_contrib", F.col("_s") * F.coalesce(F.col("w"), F.lit(0.0)))
    agg = joined.groupBy(F.col("_id").alias(id_col)).agg(
        (F.lit(float(bias)) + F.sum("_contrib")).alias("margin")
    )
    full = df.select(id_col).join(agg, id_col, "left").withColumn(
        "margin", F.coalesce(F.col("margin"), F.lit(float(bias)))
    )
    return full.select(
        id_col,
        "margin",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias("score"),
        (F.col("margin") >= 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# scan-stage scalar twins for the dialect surface (functions/dialect_ext.py:
# VECTORIZE / QUALITY_SCORE). Same hashing trick as the operators above,
# re-expressed as per-row Column expressions so the query dialect can reach
# them without a groupBy. Geometry is FIXED (the one-argument fn grammar has
# no room for parameters); the Python operators take dim/weights/bias.
# ---------------------------------------------------------------------------

VECTOR_DIM = 16  # dialect VECTORIZE / QUALITY_SCORE dimensionality

# fixed integer weight of a bucket for the dialect QUALITY_SCORE margin:
# w(b) = (b * 2654435761) % 201 − 100 ∈ [−100, 100] (Knuth multiplicative
# constant — a deterministic stand-in model; a learned model goes through
# linear_hash_score with its own weights table). INTEGER weights on
# purpose: the margin is then a pure integer function of the text —
# value-exact across engines, no float summation order, no sigmoid ulp.
_W_MULT = 2654435761
_W_MOD = 201
_W_OFF = 100


# SQL-renderer fragments shared by vectorize_sql / hash_margin_sql — one
# copy of the tokenization + hash recipe, so the two dialect functions can
# never desynchronize on the SQL-emitter backend (they already share
# _bucket_and_sign on the Column backend)
def _toks_sql(x: str) -> str:
    norm = f"trim(regexp_replace(lower({x}), '\\\\s+', ' '))"
    return f"filter(split({norm}, ' '), t -> t <> '')"


def _bs_sql(x: str, dim: int) -> str:
    """SQL twin of _bs_structs: array<struct<b, s>> with the md5 bound
    once per token via the nested transform."""
    return (
        f"transform(transform({_toks_sql(x)}, "
        "t -> substring(md5(t), 1, 9)), "
        "h -> named_struct("
        f"'b', CAST(CAST(conv(substring(h, 1, 8), 16, 10) AS BIGINT) "
        f"% {dim} AS INT), "
        "'s', CASE WHEN CAST(conv(substring(h, 9, 1), 16, 10) AS BIGINT) "
        "% 2 = 0 THEN 1L ELSE -1L END))"
    )


def vectorize_expr(c, dim: int = VECTOR_DIM):
    """Per-row dense hashing-trick vector (array<double>, signed token
    counts — the UNnormalized feature_hash_embed row). Scan-stage HOFs
    only. O(dim·n_tokens) interpreted work per row: the convenience form
    for dialect queries and small dims; the 100 TB path for large dims is
    the explode+aggregate operator feature_hash_sparse/embed (equality of
    the two pinned in tests)."""
    toks = F.filter(X.tokens(c), lambda t: t != F.lit(""))
    # one md5 per token (_bs_structs), then ONE fold building the whole
    # dim-array via the index-aware transform lambda — the old
    # per-coordinate aggregates re-evaluated the token hashes dim times
    # (r8 review). Same (bucket, sign) recipe as the explode+agg
    # operators; the pinned VECTORIZE == feature_hash_sparse equality
    # holds bit-for-bit.
    bs = _bs_structs(toks, dim)
    vec = F.aggregate(
        bs,
        F.array_repeat(F.lit(0).cast("long"), dim),
        lambda acc, p: F.transform(
            acc,
            lambda x, i: x + F.when(
                p["b"] == i.cast("int"), p["s"]
            ).otherwise(F.lit(0).cast("long")),
        ),
    )
    return F.transform(vec, lambda v: v.cast("double"))


def vectorize_sql(x: str, dim: int = VECTOR_DIM) -> str:
    """Spark-SQL twin of vectorize_expr (for the SQL emitter backend)."""
    return (
        f"transform(aggregate({_bs_sql(x, dim)}, "
        f"array_repeat(0L, {dim}), "
        "(acc, p) -> transform(acc, (v, i) -> v + "
        "(CASE WHEN p.b = CAST(i AS INT) THEN p.s ELSE 0L END))), "
        "v -> CAST(v AS DOUBLE))"
    )


def hash_margin_expr(c, dim: int = VECTOR_DIM):
    """Per-row linear-model margin over hashed token features with the
    FIXED integer weights above: margin = Σ_tokens sign·w(bucket), a pure
    integer function of the text (long). keep ≡ margin ≥ 0 — the dialect
    QUALITY_SCORE form of linear_hash_score (equality with the operator
    under the same weights table pinned in tests)."""
    toks = F.filter(X.tokens(c), lambda t: t != F.lit(""))
    bs = _bs_structs(toks, dim)  # md5 once per token (r8 review)

    def step(acc, p):
        w = (p["b"].cast("long") * _W_MULT) % _W_MOD - _W_OFF
        return acc + p["s"] * w

    return F.aggregate(bs, F.lit(0).cast("long"), step)


def hash_margin_sql(x: str, dim: int = VECTOR_DIM) -> str:
    """Spark-SQL twin of hash_margin_expr."""
    w = f"((CAST(p.b AS BIGINT) * {_W_MULT}L) % {_W_MOD} - {_W_OFF})"
    return (
        f"aggregate({_bs_sql(x, dim)}, 0L, "
        f"(acc, p) -> acc + p.s * {w})"
    )


def margin_weights(spark, dim: int = VECTOR_DIM):
    """The fixed QUALITY_SCORE weight table as a (bucket, w) DataFrame —
    feed it to linear_hash_score to reproduce the dialect margin through
    the verified operator (the parity test's bridge)."""
    rows = [
        (b, float((b * _W_MULT) % _W_MOD - _W_OFF)) for b in range(dim)
    ]
    return spark.createDataFrame(rows, ["bucket", "w"])


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss-style ±1 random projection (dimensionality
# reduction for embedding columns: project dim-d integer vectors onto
# out_dim ±1 pseudo-random directions before LSH banding / ANN probing —
# JL: pairwise distances are preserved within (1±ε) for
# out_dim = O(log n / ε²), at 1/d the storage and probe cost)
# ---------------------------------------------------------------------------

# fixed multiplicative-scramble sign matrix: s(i,j) = +1 iff
# ((i+1)·(j+2)·_JLP_MULT + seed·_JLP_SEED_MULT) mod _JLP_MOD < _JLP_HALF.
# Plain int64 arithmetic on BOTH engines (max operand
# (in_dim+1)·(out_dim+2)·_JLP_MULT ≈ 5.6e15 at 4096×512 — no wrap), so
# the oracle replays the exact matrix with no engine-specific hash.
# Balanced ±1 and row-decorrelated enough for JL in practice; swap
# functions/vectors.random_hyperplane_signature's explicit planes in
# where cryptographic-strength independence matters.
_JLP_MULT = 2654435761
_JLP_SEED_MULT = 40503
_JLP_MOD = 1000003
_JLP_HALF = 500002


def jl_project_sql(
    vec_sql: str, in_dim: int, out_dim: int, seed: int = 1
) -> str:
    """The projection as ONE parsed SQL expression over an ARRAY<BIGINT>
    column expression: out[j] = Σᵢ v[i]·s(i,j), j in [0, out_dim).
    Vectors whose size != in_dim yield NULL (zip_with padding would
    otherwise silently treat a short vector as a different point).

    One expr string, not Column DSL: the sign matrix is a model-sized
    constant (out_dim·in_dim terms) — the centroid-matrix/band-key
    lesson (SCALE.md): Column construction pays a py4j round trip per
    node on every fresh plan. This JVM form exists as the engine-pinned
    twin of the Arrow default (jl_project) and for JVM-only deployments;
    its HOF lambdas run interpreted at out_dim ops per element.

    A NULL element anywhere in the vector yields NULL (the whole
    projection, not a partially-null array: every component sums every
    element, so one null poisons all 16 — collapsing to NULL keeps the
    Arrow twin exactly matchable, where numpy would otherwise cast the
    null's NaN to INT64_MIN and emit garbage)."""
    off = seed * _JLP_SEED_MULT
    proj = (
        f"transform(sequence(0, {out_dim - 1}), j -> aggregate("
        f"zip_with({vec_sql}, sequence(0, {in_dim - 1}), (v, i) -> "
        f"v * (CASE WHEN ((i+1)*(j+2)*{_JLP_MULT}L + {off}L) "
        f"% {_JLP_MOD} < {_JLP_HALF} THEN 1L ELSE -1L END)), "
        "0L, (a, x) -> a + x))"
    )
    return (
        f"CASE WHEN size({vec_sql}) = {in_dim} "
        f"AND NOT exists({vec_sql}, _e -> _e IS NULL) THEN {proj} "
        "ELSE CAST(NULL AS ARRAY<BIGINT>) END"
    )


def jl_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    in_dim: int,
    out_dim: int,
    seed: int = 1,
) -> DataFrame:
    """(id_col, proj ARRAY<BIGINT>) — the Arrow default: one numpy
    matvec per batch against the sign matrix built once per task.
    Bit-identical to the JVM twin jl_project_sql (pinned in
    test_jl_project_arrow_equals_sql); the interpreted-HOF rule from
    SCALE.md says vectorize above ~10 ops/element, and this is
    out_dim (16-64) multiply-adds per element. NULL or wrong-length
    vectors yield NULL, matching the twin.

    100 TB design: scan-stage, no exchange; int64-exact (|out[j]| ≤
    in_dim·max|v|, no overflow for quantized embeddings)."""
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, proj array<long>"
    off = seed * _JLP_SEED_MULT

    def gen(batches):
        import numpy as np
        import pandas as pd

        ii = np.arange(1, in_dim + 1, dtype=np.int64)[:, None]
        jj = np.arange(2, out_dim + 2, dtype=np.int64)[None, :]
        signs = np.where(
            (ii * jj * _JLP_MULT + off) % _JLP_MOD < _JLP_HALF, 1, -1
        ).astype(np.int64)
        for pdf in batches:
            ids, projs = [], []
            for rid, vec in zip(pdf[id_col], pdf[vec_col]):
                ids.append(rid)
                if vec is None or len(vec) != in_dim:
                    projs.append(None)
                    continue
                # Arrow hands a list with nulls over as float64+NaN;
                # an unsafe int64 cast would turn NaN into INT64_MIN
                # garbage — null elements collapse to NULL, matching
                # the SQL twin's exists(_e IS NULL) guard
                v = np.asarray(vec)
                if v.dtype.kind == "f":
                    if np.isnan(v).any():
                        projs.append(None)
                        continue
                    v = v.astype(np.int64)
                elif v.dtype.kind == "O":
                    if any(e is None for e in vec):
                        projs.append(None)
                        continue
                    v = v.astype(np.int64)
                else:
                    v = v.astype(np.int64)
                projs.append((v @ signs).tolist())
            yield pd.DataFrame({id_col: ids, "proj": projs})

    return df.select(id_col, vec_col).mapInPandas(gen, out_schema)


# dialect JL_PROJECT geometry: the corpus embedding width and a
# log-n-ish target (the VECTORIZE fixed-dim precedent — parameterized
# projections go through jl_project/jl_project_sql directly)
JL_IN_DIM = 64
JL_OUT_DIM = 16
JL_SEED = 1
_JL_QUANT_SQL = "CAST(floor(CAST({v} AS DOUBLE) * 1000) AS BIGINT)"


def jlproject_expr(c) -> "F.Column":
    """Column backend of the dialect JL_PROJECT: floor-quantize a float
    embedding array and project 64 → 16 ±1 pseudo-random directions.
    The sign s(i,j) is COMPUTED inside the lambda from (i, j) — the
    expression tree is constant-size regardless of dims (no k×dim
    literal, no py4j-per-cell chatter), unlike the centroid/band cases
    where the constants carry information. Wrong-length vectors yield
    NULL (the jl_project contract).

    The quantized array is BOUND ONCE (X.bind_once): HOF lambdas have
    no subexpression elimination, so an inline quantize expression
    would re-run the 64-element transform inside every one of the 16
    component folds (~18× the quantization work per row)."""
    off = JL_SEED * _JLP_SEED_MULT

    def comp(q, j):
        return F.aggregate(
            F.zip_with(
                q,
                F.sequence(F.lit(0), F.lit(JL_IN_DIM - 1)),
                lambda v, i: v
                * F.when(
                    ((i + 1) * (j + 2) * F.lit(_JLP_MULT) + F.lit(off))
                    % F.lit(_JLP_MOD)
                    < F.lit(_JLP_HALF),
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )

    def proj(q):
        return F.when(
            (F.size(q) == JL_IN_DIM)
            # null element => NULL projection (see jl_project_sql: one
            # null poisons every component; collapsing keeps all
            # backends equal — quantize maps null elements to null, so
            # checking the quantized array is equivalent)
            & ~F.exists(q, lambda x: x.isNull()),
            F.transform(
                F.sequence(F.lit(0), F.lit(JL_OUT_DIM - 1)),
                lambda j: comp(q, j),
            ),
        )

    quant = F.transform(
        c, lambda x: F.floor(x.cast("double") * 1000).cast("long")
    )
    return X.bind_once(quant, proj)


def jl_quantize_sql(x: str) -> str:
    """The floor-quantization of a float embedding as Spark SQL — THE
    single definition every call site (dialect, suite, bench, tests)
    derives from, so a scale change cannot silently diverge them."""
    return f"transform({x}, _q -> {_JL_QUANT_SQL.format(v='_q')})"


def jl_quantize_duckdb(x: str) -> str:
    """DuckDB twin of jl_quantize_sql (list_transform; same floor/cast)."""
    return (
        f"list_transform({x}, _q -> "
        "CAST(floor(CAST(_q AS DOUBLE) * 1000) AS BIGINT))"
    )


def jlproject_dialect_sql(x: str) -> str:
    """Spark-SQL twin of jlproject_expr (same quantization, same sign
    arithmetic, via jl_project_sql — lock-step with the Column backend,
    pinned in test_dialect_ext). The quantized array binds once
    (element_at(transform(array(...)))) for the same no-CSE reason as
    the Column form."""
    proj = jl_project_sql("_qa", JL_IN_DIM, JL_OUT_DIM, JL_SEED)
    return (
        f"element_at(transform(array({jl_quantize_sql(x)}), "
        f"_qa -> {proj}), 1)"
    )


# ---------------------------------------------------------------------------
# Dialect PQ_ENCODE (r13, VERDICT r12 #6): the compressed-retrieval tier
# reached from SQL. The one-argument fn grammar has no room for trained
# codebooks, so — exactly like BM25's frozen query model and
# QUALITY_SCORE's frozen linear model — the dialect quantizes against a
# FROZEN codebook: PQ_DIA_M subspaces of PQ_DIA_SUB dims over the
# JL_IN_DIM embedding, PQ_DIA_K one-hot unit centers e_j per subspace
# (closed-form: the nearest center is the subspace's dominant
# coordinate; ||x - e_j||^2 = ||x||^2 - 2*x_j + 1, unique argmin unless
# tied, ties -> lowest j via array_position-of-min — the pq_encode
# contract). Parameterized, data-trained codebooks stay in
# operators/similarity.pq_codebooks / pq_encode.
# ---------------------------------------------------------------------------

PQ_DIA_M = 4  # subspaces
PQ_DIA_SUB = 16  # dims per subspace (PQ_DIA_M * PQ_DIA_SUB = JL_IN_DIM)
PQ_DIA_K = 16  # one-hot centers per subspace


def pq_code_expr(c) -> "F.Column":
    """Column backend of the dialect PQ_ENCODE: the 4 nearest-center
    indices as ONE ':'-joined string (a groupable scalar — `GROUP BY
    PQ_ENCODE(embedding)` collapses a quantization cell, the
    compressed-domain dedup move). Wrong-length vectors and vectors
    with null elements yield NULL (the JL_PROJECT contract). The input
    array is BOUND ONCE (X.bind_once): each of the m*k distance folds
    references it, and an unbound computed argument would re-evaluate
    per fold."""

    def code(q, s):
        sl = F.slice(q, s * PQ_DIA_SUB + 1, PQ_DIA_SUB)
        dists = F.transform(
            F.sequence(F.lit(0), F.lit(PQ_DIA_K - 1)),
            lambda j: F.aggregate(
                F.zip_with(
                    sl,
                    F.sequence(F.lit(0), F.lit(PQ_DIA_SUB - 1)),
                    lambda x, d: (
                        x.cast("double")
                        - F.when(d == j, F.lit(1.0)).otherwise(F.lit(0.0))
                    )
                    ** 2,
                ),
                F.lit(0.0).cast("double"),
                lambda a, v: a + v,
            ),
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    def enc(q):
        return F.when(
            (F.size(q) == JL_IN_DIM) & ~F.exists(q, lambda x: x.isNull()),
            F.concat_ws(
                ":", *[code(q, s).cast("string") for s in range(PQ_DIA_M)]
            ),
        )

    return X.bind_once(c, enc)


def pq_code_dialect_sql(x: str) -> str:
    """Spark-SQL twin of pq_code_expr — the same frozen one-hot
    codebook, the same distance tree, the same bind-once shape
    (element_at(transform(array(x), ...), 1)), so the two backends are
    lock-step (pinned in test_dialect_ext)."""
    codes = []
    for s in range(PQ_DIA_M):
        sl = f"slice(_pa, {s * PQ_DIA_SUB + 1}, {PQ_DIA_SUB})"
        dists = (
            f"transform(sequence(0, {PQ_DIA_K - 1}), j -> "
            f"aggregate(zip_with({sl}, sequence(0, {PQ_DIA_SUB - 1}), "
            "(x, d) -> power(CAST(x AS DOUBLE) - "
            "(CASE WHEN d = j THEN 1.0D ELSE 0.0D END), 2)), "
            "CAST(0.0D AS DOUBLE), (a, v) -> a + v))"
        )
        codes.append(
            f"CAST((array_position({dists}, array_min({dists})) - 1) "
            "AS INT)"
        )
    joined = "concat_ws(':', " + ", ".join(
        f"CAST({c} AS STRING)" for c in codes
    ) + ")"
    guard = (
        f"CASE WHEN size(_pa) = {JL_IN_DIM} "
        f"AND NOT exists(_pa, x -> x IS NULL) THEN {joined} END"
    )
    return f"element_at(transform(array({x}), _pa -> {guard}), 1)"
