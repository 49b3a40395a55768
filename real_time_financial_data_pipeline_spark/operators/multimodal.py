"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with Arrow-batched processing plumbing.

Design for 100 TB of mixed media:

- media rows are ``struct(media_id, kind, bytes binary, meta struct)`` —
  bytes stay opaque to Catalyst (no accidental row-expansion), metadata is
  columnar and prunable;
- decode / feature-extract run as ``mapInPandas`` over Arrow batches, so the
  Python boundary is crossed once per batch, not per row, and peak memory is
  bounded by (batch size × largest blob);
- partitioning guidance: repartition by a size-balanced key before heavy
  decode so one executor doesn't get all the 4K videos.

The decode kernels themselves are STUBS (image/audio libs are not in this
container): ``decode_image`` raises ``NotImplementedError`` unless handed a
``codec`` callable, and ``fake_image_features`` supplies a deterministic
stand-in so the Spark-side plumbing (schema, batching, UDF signature) is
fully real and testable.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("bytes", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_s", DoubleType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("byte_len", LongType(), True),
        StructField("feat_mean", DoubleType(), True),
        StructField("feat_std", DoubleType(), True),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from a text table (test/dev fabric): bytes =
    UTF-8 encoding of the text.  Schema and partition behavior are exactly
    what a real media lake sees; only the payload is synthetic."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("bytes"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.col(text_col)).cast("long").alias("width"),
        F.lit(1).cast("long").alias("height"),
        F.lit(None).cast("double").alias("duration_s"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only profile — never touches the blob column, so Catalyst
    prunes ``bytes`` out of the scan entirely (check ReadSchema)."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.octet_length("bytes")).alias("total_bytes"),
        F.avg(F.octet_length("bytes")).alias("avg_bytes"),
    )


def decode_image(blob: bytes, codec: Callable[[bytes], object] | None = None) -> object:
    """Decode one image blob.  STUB: the container ships no image codec —
    pass ``codec`` (e.g. PIL.Image.open wrapped) in a real deployment."""
    if codec is None:
        raise NotImplementedError(
            "no image codec in this environment; pass codec= (e.g. PIL-based)"
        )
    return codec(blob)


def extract_features(
    df: DataFrame,
    kernel: Callable[[bytes], tuple[float, float]] | None = None,
    batch_hint: int | None = None,
) -> DataFrame:
    """Feature extraction over Arrow batches via ``mapInPandas``.

    ``kernel(bytes) -> (mean, std)`` is the pluggable decode+featurize step;
    default is ``fake_image_features`` (deterministic byte statistics) so
    the full distributed path runs without media libraries.
    """
    kern = kernel or fake_image_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [kern(b) if b is not None else (None, None) for b in pdf["bytes"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": [len(b) if b is not None else None for b in pdf["bytes"]],
                    "feat_mean": [f[0] for f in feats],
                    "feat_std": [f[1] for f in feats],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def fake_image_features(blob: bytes) -> tuple[float, float]:
    """Deterministic stand-in featurizer: byte-value mean/std.  Replace with
    a real decode+embed kernel in deployment; signature stays identical."""
    import numpy as np

    arr = np.frombuffer(blob, dtype=np.uint8)
    if arr.size == 0:
        return (0.0, 0.0)
    return (float(arr.mean()), float(arr.std()))


def frame_sample_plan(df: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: computes per-media frame timestamps to
    extract (metadata math, fully columnar); the actual frame decode joins
    this plan with the blob table inside mapInPandas.  STUB boundary at the
    decode, real at the planning layer."""
    n_frames = F.floor(F.coalesce(F.col("duration_s"), F.lit(0.0)) / F.lit(every_n_seconds)).cast("long")
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(F.sequence(F.lit(0).cast("long"), n_frames)).alias("_i"))
        .select("media_id", (F.col("_i") * F.lit(every_n_seconds)).alias("frame_ts"))
    )
