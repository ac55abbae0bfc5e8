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
