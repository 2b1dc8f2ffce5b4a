"""Multimodal-column plumbing (north-star extension).

Treat image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, processed by Arrow-batched ``mapInPandas``
kernels. The container has no image/audio codecs, so the decode step is
STUBBED: ``decode_image`` raises ``NotImplementedError`` unless handed
the deterministic fake codec used by the tests. Everything Spark-side —
schema, batch iteration, partitioning, UDF signatures — is real and
tested; swapping in PIL/torchaudio later is a one-function change.

Scale notes:
- Payloads stay in executors end-to-end (no driver collect); Arrow
  batches bound peak memory per task.
- ``spark.sql.files.maxPartitionBytes`` is the lever when payloads live
  in parquet; for very large blobs store pointers + ranges instead and
  fetch inside the kernel.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real codec goes here (PIL.Image.open). Not available in this
    container — plumbing is exercised with ``fake_feature_kernel``."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "inject a codec into extract_features(codec=...)"
    )


def fake_feature_kernel(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real encoder: byte-histogram moments.
    Keeps the full pipeline testable without codecs."""
    if not payload:
        return [0.0] * dim
    return [float(sum(payload[i::dim]) % 997) / 997.0 for i in range(dim)]


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: text bytes as the
    opaque payload (stands in for image bytes; the engine never looks
    inside payloads except in kernels)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame,
    codec: Callable[[bytes], list[float]] = fake_feature_kernel,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so a batch of payloads is decoded per Python call
    (the 10-100x win over row-at-a-time UDFs)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["payload"].map(lambda b: codec(bytes(b or b""))),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)
