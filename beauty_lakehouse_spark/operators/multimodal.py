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


def fake_resize_kernel(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resize (PIL thumbnail): strided
    byte downsample to exactly width*height bytes."""
    if not payload:
        return b""
    target = max(1, width * height)
    step = max(1, len(payload) // target)
    return payload[::step][:target]


def resize_media(
    media: DataFrame,
    width: int = 8,
    height: int = 8,
    kernel: Callable[[bytes, int, int], bytes] = fake_resize_kernel,
) -> DataFrame:
    """Arrow-batched resize: payload -> resized payload, meta updated.
    Swap ``kernel`` for a PIL/opencv implementation on a cluster with
    codecs; the Spark-side batching/schema is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = pdf["payload"].map(
                lambda b: kernel(bytes(b or b""), width, height)
            )
            out["meta"] = pdf["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def fake_frame_kernel(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stand-in for a real frame sampler (pyav/ffmpeg):
    split the byte stream into n_frames contiguous chunks."""
    if not payload or n_frames < 1:
        return []
    size = max(1, len(payload) // n_frames)
    return [payload[i * size : (i + 1) * size] for i in range(n_frames)]


def sample_frames(
    media: DataFrame,
    n_frames: int = 4,
    kernel: Callable[[bytes, int], list[bytes]] = fake_frame_kernel,
) -> DataFrame:
    """Arrow-batched frame sampling: one output row per (media, frame).
    The fan-out happens inside the kernel (pandas explode per batch), so
    frame payloads never concentrate on one task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, fr in enumerate(kernel(bytes(payload or b""), n_frames)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
