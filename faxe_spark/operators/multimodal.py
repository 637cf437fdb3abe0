"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, partition-aware batching, Arrow UDF
signatures) is real and tested; the actual codec calls are STUBBED —
the image/audio libraries are not in this container. `decode_image`
raises NotImplementedError unless `fake=True`, in which case a
deterministic md5-derived fake decode is used so pipelines and tests
exercise the full path.

Scale notes: binary payloads ride in parquet binary columns; decode is
mapInPandas (Arrow batches, one Python worker per core, no shuffle);
metadata extraction stays JVM-side (octet_length/md5/substr on binary).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (BinaryType, DoubleType, LongType, StringType,
                               StructField, StructType)

# magic-byte prefixes for cheap JVM-side format sniffing
_MAGIC = {
    "89504e47": "png",
    "ffd8ff": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "66747970": "mp4",
}


def attach_binary(df: DataFrame, source_col: str, payload_col: str = "payload") -> DataFrame:
    """Materialize a binary payload column (here: utf-8 encode of a text
    column — the stand-in for reading real image/audio bytes)."""
    return df.withColumn(payload_col, F.encode(F.col(source_col), "UTF-8"))


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side metadata: byte size, md5, magic-prefix format sniff."""
    p = F.col(payload_col)
    hex_prefix = F.lower(F.hex(F.substring(p, 1, 4)))
    fmt = F.lit("unknown")
    for magic, name in _MAGIC.items():
        fmt = F.when(hex_prefix.startswith(magic.upper()) | hex_prefix.startswith(magic), F.lit(name)).otherwise(fmt)
    return df.withColumns({
        "n_bytes": F.octet_length(p),
        "payload_md5": F.md5(p),
        "format": fmt,
    })


IMAGE_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("mean_intensity", DoubleType()),
])


def decode_image_features(df: DataFrame, *, id_col: str = "doc_id",
                          payload_col: str = "payload", fake: bool = False) -> DataFrame:
    """Decode images and extract (width, height, mean_intensity).

    Real decode is NOT available in this container (no PIL/opencv) —
    STUB: raises NotImplementedError unless fake=True, which derives
    deterministic pseudo-features from the payload md5 (keeps the whole
    mapInPandas path — schema, Arrow batching, partitioning — testable).
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/opencv (not in container); "
                    "pass fake=True for the deterministic stub")
            digests = [hashlib.md5(bytes(b)).hexdigest() for b in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "width": [int(d[0:4], 16) % 1920 + 1 for d in digests],
                "height": [int(d[4:8], 16) % 1080 + 1 for d in digests],
                "mean_intensity": [int(d[8:12], 16) / 65535.0 for d in digests],
            })

    return df.select(id_col, payload_col).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def frame_sample_offsets(df: DataFrame, *, n_frames: int = 4,
                         payload_col: str = "payload",
                         duration_col: str | None = None) -> DataFrame:
    """Video frame-sampling plumbing: computes n deterministic byte/time
    offsets per payload (uniform stride). The actual frame grab is the
    stubbed decode step; offsets are JVM-side arithmetic."""
    size = F.octet_length(F.col(payload_col))
    offsets = F.transform(
        F.sequence(F.lit(1), F.lit(n_frames)),
        lambda i: ((i - 1) * size / n_frames).cast("long"),
    )
    return df.withColumn("frame_offsets", offsets)
