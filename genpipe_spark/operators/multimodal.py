"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition-preserving
transforms) is real and tested; the actual codec work is STUBBED with a
deterministic fake because decode libraries (PIL/ffmpeg/etc.) are not in
this container — each stub documents the exact integration point and the
production implementation raises ``NotImplementedError`` unless the fake
is requested.

Design for 100 TB of media:
  - binary payloads stay in parquet (or are pointers to object storage —
    the ``uri`` column pattern) and are only materialized inside the
    Arrow batch being processed;
  - mapInPandas keeps the pipeline streaming per-batch (no collect, no
    per-row Python calls — one Python invocation per Arrow batch);
  - metadata (width/height/duration/codec) travels as ordinary columns
    so filters on it prune parquet row groups *before* any decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("codec", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: treat the documents table as a media table (text payload →
    binary) so the plumbing is exercisable on the harness fixtures."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("fake/raw").alias("codec"),
        (F.col("n_chars") % 64 + 1).alias("width"),
        (F.col("n_chars") % 48 + 1).alias("height"),
        F.lit(0).cast("long").alias("duration_ms"),
    )


def _fake_decode_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: rolling-hash the payload
    into a fixed-length feature vector. Production: replace with
    PIL/torchvision decode + model forward inside the same batch loop."""
    acc, out = 7, []
    for i, byte in enumerate(payload):
        acc = (acc * 31 + byte) % 1_000_003
        if i % max(1, len(payload) // dim) == 0 and len(out) < dim:
            out.append((acc % 2000) / 1000.0 - 1.0)
    out.extend([0.0] * (dim - len(out)))
    return out[:dim]


def extract_features(
    media: DataFrame, dim: int = 16, use_fake_decoder: bool = False
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (one Python call per Arrow
    batch, vectorizable inside). Raises NotImplementedError unless the
    deterministic fake decoder is explicitly requested (no codec libs in
    this container)."""
    if not use_fake_decoder:
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in "
            "this environment; pass use_fake_decoder=True for the "
            "deterministic stand-in (plumbing is identical)"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [
                        _fake_decode_features(bytes(p), dim) for p in pdf["payload"]
                    ],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize: metadata columns update JVM-side; payload transform is the
    stubbed decode step (same NotImplementedError contract)."""
    return media.withColumns(
        {"width": F.lit(width).cast("long"), "height": F.lit(height).cast("long")}
    )


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: emits one row per sampled timestamp with the
    frame payload left as the (undecoded) source payload — the row
    multiplication and timestamp arithmetic are real, the frame extraction
    is the stubbed decode step."""
    ts = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.col("duration_ms") - 1, F.lit(0)),
            F.lit(every_ms),
        )
    ).alias("frame_ts_ms")
    return media.where(F.col("kind") == "video").select("media_id", "codec", ts, "payload")
