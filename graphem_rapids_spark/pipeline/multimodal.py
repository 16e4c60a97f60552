"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched Pandas UDFs over
``mapInPandas``.

The Spark-side plumbing — schemas, partition sizing, UDF signatures,
batch shapes — is real and tested. The actual media decode is STUBBED
(this container has no image/audio libraries): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by content hash) produces plausible
metadata so the downstream dataflow can be exercised end-to-end.

Scale notes: media blobs dominate row size, so `media_repartition`
targets a byte budget per partition (not a row count); feature
extraction is mapInPandas (narrow, no shuffle); only the small typed
metadata ever enters joins/aggregations.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("phash", StringType(), True),
    ]
)


def media_repartition(df: DataFrame, target_bytes_per_partition: int = 128 << 20,
                      avg_blob_bytes: int = 1 << 20) -> DataFrame:
    """Repartition a media table by byte budget, not row count —
    partitions of huge blobs must fit executor memory."""
    n = df.count()
    parts = max(1, (n * avg_blob_bytes) // target_bytes_per_partition)
    return df.repartition(int(parts))


def _fake_decode(content: bytes) -> tuple[int, int]:
    """Deterministic fake 'decode' — dimensions derived from content
    hash. Stands in for PIL/libav until real codecs are available."""
    h = hashlib.md5(content or b"").digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def extract_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas feature extraction: (media_id, width, height,
    n_bytes, phash). Arrow-batched; one pass, no shuffle."""
    if not fake:
        raise NotImplementedError(
            "real image decode needs PIL/opencv (absent in this container); "
            "pass fake=True for the deterministic stub decoder"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None else b""
                w, h = _fake_decode(content)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "width": w,
                        "height": h,
                        "n_bytes": len(content),
                        "phash": hashlib.md5(content).hexdigest()[:16],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return media.filter(F.col("kind") == "image").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("content", BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, max_side: int = 224, fake: bool = False
) -> DataFrame:
    """mapInPandas resize: (media_id, width, height, content) with the
    longer side clamped to ``max_side`` (aspect preserved). The pixel
    transform is STUBBED — real resize needs PIL/opencv; the fake path
    emits the aspect-correct target dimensions with a deterministic
    content-hash-derived payload so downstream schema/partitioning/
    batch-shape plumbing is exercised for real. Arrow-batched, one
    pass, no shuffle."""
    if not fake:
        raise NotImplementedError(
            "real image resize needs PIL/opencv (absent in this container); "
            "pass fake=True for the deterministic stub"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None else b""
                w, h = _fake_decode(content)
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                payload = hashlib.md5(content + f"{nw}x{nh}".encode()).digest()
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "width": nw,
                        "height": nh,
                        "content": payload,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.filter(F.col("kind") == "image").mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_frames: int = 30,
                      assumed_frames: int = 300) -> DataFrame:
    """(media_id, frame_idx) sampling plan for video — the shuffle-free
    explode that downstream decode UDFs consume."""
    idx = F.sequence(F.lit(0), F.lit(assumed_frames - 1), F.lit(every_n_frames))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(idx).alias("frame_idx"))
    )
