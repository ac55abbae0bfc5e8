"""Vector math over array<float|double> columns — JVM-side expressions.

`zip_with` + `aggregate` compile to codegen'd loops; no data leaves the JVM.
For batch-heavy kernels (pairwise top-k against many query vectors) prefer
the Arrow-vectorized path in operators/similarity.py.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_vector(values: Sequence[float]) -> Column:
    """Literal array<double> for a constant vector.

    Built as ONE parsed SQL expression, not per-element F.lit calls:
    each F.lit is a py4j round trip (~1 ms), so a 64-dim constant cost
    ~60 ms of DRIVER time per use — measured at 8 s of pure plan
    construction for a 4-table x 12-plane near-dup call (r12). The
    parsed form produces the identical CreateArray(Literal...) tree
    25x faster. repr() is Python's shortest round-trip float form and
    Java's parseDouble is correctly rounded, so every finite double
    survives the string hop bit-exactly; non-finite values (and the
    empty vector, whose parsed type would be array<void>) take the
    per-element path."""
    vals = [float(v) for v in values]
    if vals and all(math.isfinite(v) for v in vals):
        return F.expr("array(" + ",".join(repr(v) + "D" for v in vals) + ")")
    return F.array(*[F.lit(v) for v in vals])


def lit_matrix(rows: Sequence[Sequence[float]]) -> Column:
    """Literal array<array<double>> for a constant matrix (a centroid
    list, a PQ codebook, an LSH plane set) — ONE parsed expression, the
    lit_vector treatment one level up (r12): unrolling N vector
    constants through per-element F.lit paid N·dim py4j round trips of
    driver time per plan. Finite values only (same bit-exactness
    argument as lit_vector); non-finite or empty fall back to nested
    per-element construction."""
    mat = [[float(v) for v in r] for r in rows]
    if mat and all(math.isfinite(v) for r in mat for v in r):
        return F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(repr(v) + "D" for v in r) + ")"
                for r in mat
            )
            + ")"
        )
    return F.array(*[lit_vector(r) for r in mat])


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def random_hyperplane_signature(vec: Column, planes: Sequence[Sequence[float]]) -> Column:
    """LSH bucket id for cosine similarity: sign pattern of dot products with
    fixed random hyperplanes, packed into one long. Deterministic given the
    planes (caller seeds their RNG).

    Built with a CONSTANT number of py4j calls (r12): the per-plane
    loop form paid ~66 ms of DRIVER time per plane constructing
    zip_with/aggregate lambdas over the wire — 8+ s of pure plan
    construction for a 4-table x 12-plane near-dup call. The planes now
    ride ONE parsed 2-D literal and one transform computes every dot;
    arithmetic per element is unchanged (same cast-to-double products,
    same sequential sum, same >= 0 sign, same shiftleft packing), so
    signatures are bit-identical to the loop form (pinned in tests
    against a pure-Python replay)."""
    finite = all(
        math.isfinite(float(v)) for p in planes for v in p
    ) if planes else False
    if not finite:
        # empty or non-finite planes: the legacy per-plane loop
        bucket = F.lit(0).cast("long")
        for i, p in enumerate(planes):
            bit = F.when(dot(vec, lit_vector(p)) >= 0, F.lit(1)).otherwise(F.lit(0))
            bucket = bucket + F.shiftleft(bit.cast("long"), i)
        return bucket
    mat = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(v)) + "D" for v in p) + ")"
            for p in planes
        )
        + ")"
    )
    dots = F.transform(
        mat,
        lambda p: F.aggregate(
            F.zip_with(
                vec, p, lambda x, y: x.cast("double") * y.cast("double")
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return F.aggregate(
        F.zip_with(
            dots,
            F.expr(f"sequence(0, {len(planes) - 1})"),
            # call_function: the F.shiftleft wrapper only takes a
            # literal bit count, but the SQL ShiftLeft expression
            # accepts a column — the zip index here
            lambda d, i: F.call_function(
                "shiftleft",
                F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
                i,
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def l2_normalize(a: Column) -> Column:
    """Unit-norm copy of the vector (zero vectors pass through as zeros —
    the convention every ANN library uses; a NULL/0 division would poison
    downstream cosine math). Element order is preserved; arithmetic is
    double throughout, so the result is bit-reproducible cross-engine
    (sequential sum, IEEE sqrt and division)."""
    n = norm(a)
    return F.when(n == 0, F.transform(a, lambda x: x.cast("double") * 0.0)).otherwise(
        F.transform(a, lambda x: x.cast("double") / n)
    )


def quantize_int8(a: Column) -> Column:
    """Symmetric per-vector int8 quantization: scale = max|v| / 127,
    q_i = round(v_i / scale) ∈ [-127, 127]. The storage/serving compression
    step of an embedding pipeline (4× smaller than float32, 8× than
    float64). Returns a struct (scale double, q array<int>); dequantize as
    q_i * scale. All-zero vectors quantize to scale 0 + zeros."""
    absmax = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))
    scale = absmax / F.lit(127.0)
    q = F.when(
        scale == 0, F.transform(a, lambda x: F.lit(0))
    ).otherwise(
        F.transform(a, lambda x: F.round(x.cast("double") / scale).cast("int"))
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qstruct: Column) -> Column:
    """Inverse of quantize_int8 (lossy: worst-case error scale/2 per
    element)."""
    return F.transform(
        qstruct["q"], lambda x: x.cast("double") * qstruct["scale"]
    )
