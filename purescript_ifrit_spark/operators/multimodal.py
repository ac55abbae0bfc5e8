"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is fully real and tested — schema, partitioning,
UDF signature, batch shape. The *codec* step is stubbed: this container has
no image/audio libraries, so `decode_image`/`decode_audio` raise
NotImplementedError unless a library import succeeds, and
`extract_features` uses a deterministic fake "decoder" (byte stats) so the
whole pipeline is runnable and verifiable end-to-end.

Scale notes: mapInPandas streams Arrow batches — binary payloads never
materialize as Python lists; `spark.sql.execution.arrow.maxRecordsPerBatch`
bounds batch memory. Keep payloads out of shuffles: extract features first,
then drop/offload the binary column before any wide operation.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("md5", T.StringType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """REAL decode path — gated on an optional dependency.

    STUB: no imaging library ships in this container. The call site
    (extract_features with real_decode=True) is the single place to swap in
    the actual decoder."""
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires an imaging library (not available in "
            "this environment); use extract_features(real_decode=False)"
        ) from exc


def extract_features(df: DataFrame, *, real_decode: bool = False) -> DataFrame:
    """media table → per-item features via mapInPandas (Arrow batches).

    With real_decode=False (default here) the 'decoder' is a deterministic
    fake: byte length, sha256, and a width/height derived from the digest —
    exercising the exact batch shape a real decoder would use."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        # NOTE: this closure must stay self-contained (stdlib/pandas only,
        # no references to functions of this package): it executes on
        # Python WORKER processes, which do not share the driver's
        # sys.path — a module-function reference would make cloudpickle
        # serialize an import by name and crash the workers with
        # ModuleNotFoundError wherever the package isn't installed.
        import hashlib as _hashlib

        import pandas as pd

        def _decode(payload: bytes):
            try:
                import io

                from PIL import Image  # type: ignore

                return Image.open(io.BytesIO(payload))
            except ImportError as exc:
                raise NotImplementedError(
                    "image decoding requires an imaging library (not "
                    "available in this environment)"
                ) from exc

        for pdf in batches:
            payloads = pdf["payload"]
            digests = [
                _hashlib.sha256(p if p is not None else b"").hexdigest()
                for p in payloads
            ]
            if real_decode:
                # the real integration point: _decode raises
                # NotImplementedError when no imaging library is installed
                dims = [
                    _decode(p).size if p else (0, 0) for p in payloads
                ]
                widths = [d[0] for d in dims]
                heights = [d[1] for d in dims]
            else:
                widths = [int(d[:4], 16) % 4096 for d in digests]
                heights = [int(d[4:8], 16) % 4096 for d in digests]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": [len(p) if p is not None else 0 for p in payloads],
                    "sha256": digests,
                    "md5": [
                        _hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "fake_width": widths,
                    "fake_height": heights,
                }
            )

    return df.mapInPandas(gen, FEATURE_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter used by tests/suite: treat each document's utf-8 bytes as an
    opaque payload, producing a MEDIA_SCHEMA-shaped table from driver data."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"), F.col("source").alias("source")
        ).alias("meta"),
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-frame sampling *plan* on metadata only (every_n-th frame index
    for a fake fixed frame count derived from byte_len) — demonstrates the
    explode-side plumbing without decoding."""
    n_frames = (F.col("byte_len") % 300 + 1).cast("int")
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
