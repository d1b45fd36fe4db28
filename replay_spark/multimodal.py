"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata
(mime type, width/height, duration, ...). The Spark-side machinery —
schema, partition-friendly batch iteration, Arrow transfer, UDF
signatures — is real and tested; the actual codec work (decode,
resize, frame-sample) is STUBBED behind ``decoder`` callables
because no image/audio libraries exist in this container. Swap the
stub for a PIL/ffmpeg-backed callable and nothing else changes.

At scale: ``mapInPandas`` streams Arrow batches per partition, so a
1000-executor cluster decodes in parallel with zero driver
involvement; binary payloads never leave the executor that read
them.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "MediaProcessor",
    "stub_image_decoder",
]

# Canonical media-column schema: payload + sidecar metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("num_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def attach_media_metadata(
    df: DataFrame, payload_column: str = "payload"
) -> DataFrame:
    """Cheap JVM-side metadata: byte length + content hash."""
    return df.withColumn(
        "num_bytes", F.length(F.col(payload_column)).cast("long")
    ).withColumn("content_hash", F.md5(F.col(payload_column)))


def stub_image_decoder(payload: bytes) -> dict:
    """Deterministic fake decode.

    Stands in for a real image decoder (PIL/turbojpeg — NOT available
    in this container). Produces stable pseudo-dimensions and a
    16-dim pseudo-feature vector derived from the content hash, so
    the full pipeline (schema, batching, joins) is exercisable and
    testable end-to-end.
    """
    digest = hashlib.sha256(payload if payload is not None else b"").digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    features = [b / 255.0 for b in digest[:16]]
    return {"width": width, "height": height, "features": features}


class MediaProcessor:
    """Decode / feature-extract media payloads via mapInPandas.

    ``decoder`` maps raw bytes → dict(width, height, features). The
    default is the deterministic stub; a real decoder is a drop-in.
    """

    OUTPUT_SCHEMA = (
        "media_id long, num_bytes long, width int, height int, "
        "features array<double>"
    )

    def __init__(
        self,
        id_column: str = "media_id",
        payload_column: str = "payload",
        decoder: Optional[Callable[[bytes], dict]] = None,
        batch_size: int = 256,
    ):
        self.id_column = id_column
        self.payload_column = payload_column
        self.decoder = decoder or stub_image_decoder
        self.batch_size = batch_size

    def transform(self, df: DataFrame) -> DataFrame:
        id_col = self.id_column
        payload_col = self.payload_column
        decoder = self.decoder

        def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                decoded = [decoder(p) for p in pdf[payload_col]]
                yield pd.DataFrame(
                    {
                        "media_id": pdf[id_col].values,
                        "num_bytes": [
                            len(p) if p is not None else 0
                            for p in pdf[payload_col]
                        ],
                        "width": [d["width"] for d in decoded],
                        "height": [d["height"] for d in decoded],
                        "features": [d["features"] for d in decoded],
                    }
                )

        return df.select(id_col, payload_col).mapInPandas(
            process, schema=self.OUTPUT_SCHEMA
        )

    def resize(self, df: DataFrame, target: tuple[int, int]) -> DataFrame:
        """Resize stub — plumbing only; a real implementation would
        re-encode payloads inside the same mapInPandas pattern."""
        raise NotImplementedError(
            "resize requires an image library not present in this container; "
            "wire a real decoder/encoder into MediaProcessor"
        )

    def sample_frames(self, df: DataFrame, every_ms: int) -> DataFrame:
        """Video frame-sampling stub — same contract as resize."""
        raise NotImplementedError(
            "frame sampling requires a video library not present in this "
            "container; wire a real decoder into MediaProcessor"
        )
