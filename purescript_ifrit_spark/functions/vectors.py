"""Vector math over array<float|double> columns — JVM-side expressions.

`zip_with` + `aggregate` compile to codegen'd loops; no data leaves the JVM.
For batch-heavy kernels (pairwise top-k against many query vectors) prefer
the Arrow-vectorized path in operators/similarity.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_vector(values: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


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
    planes (caller seeds their RNG)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(dot(vec, lit_vector(p)) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + F.shiftleft(bit.cast("long"), i)
    return bucket


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
