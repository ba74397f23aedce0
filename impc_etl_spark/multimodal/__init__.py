"""Multimodal column plumbing (north-star).

Standard: media is an opaque ``binary`` column plus a typed metadata struct
(media_type, mime, width/height/duration, source URI) — mirroring the
reference's image_record shape (observation_mapper.py:851-997:
download_file_path / file_type / omero_id as plain columns).

Heavy decode (image/audio/video libs) is NOT in this container, so the
decode kernel is stubbed — but the Spark-side contract (schema, batching via
mapInPandas, partition sizing) is real and tested with a deterministic fake
extractor. Swap `_decode_image_batch` for a real decoder (PIL/ffmpeg) in a
runtime that has it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("media_type", StringType(), True),   # image | audio | video
    StructField("mime", StringType(), True),
    StructField("uri", StringType(), True),
    StructField("content", BinaryType(), True),       # opaque payload
])

IMAGE_FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_bytes", IntegerType(), True),
    StructField("content_digest", StringType(), True),
    StructField("brightness", DoubleType(), True),
])

REAL_DECODERS_AVAILABLE = False  # no PIL/ffmpeg in this container


def _decode_image_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: digests + pseudo-dimensions from content
    bytes. A real implementation opens the payload with PIL and fills the
    same columns — the IMPORTANT part (schema, Arrow batch shape, null
    handling) is identical."""
    out = []
    for _, row in pdf.iterrows():
        content = row["content"]
        if content is None:
            out.append((row["media_id"], None, None, None, None, None))
            continue
        digest = hashlib.md5(content).hexdigest()
        h = int(digest[:8], 16)
        out.append((
            row["media_id"],
            64 + h % 1024,                 # fake width
            64 + (h >> 10) % 1024,         # fake height
            len(content),
            digest,
            (h % 10_000) / 10_000.0,       # fake brightness
        ))
    return pd.DataFrame(
        out, columns=["media_id", "width", "height", "n_bytes", "content_digest", "brightness"]
    )


def extract_image_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Decode/feature-extract over mapInPandas — each Arrow batch is one
    decode unit, so executor memory is bounded by batch_rows × payload size
    (tune spark.sql.execution.arrow.maxRecordsPerBatch for big media).
    Repartition upstream so partitions hold ~100-500 MB of payload."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                yield _decode_image_batch(pdf.iloc[start:start + batch_rows])

    return media.select("media_id", "content").mapInPandas(gen, IMAGE_FEATURE_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """Video frame sampling — requires ffmpeg; stubbed with a clear error so
    the API surface exists (call sites compile, runtime raises)."""
    raise NotImplementedError(
        "frame sampling requires a video decoder (ffmpeg) not present in this "
        "container; the contract is media → (media_id, frame_ts, frame binary)"
    )


def make_media_table(df: DataFrame, id_col: str, payload_col: str,
                     media_type: str, mime: str, uri_col: str | None = None) -> DataFrame:
    """Conform arbitrary binary columns to the MEDIA_SCHEMA contract."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.lit(mime).alias("mime"),
        (F.col(uri_col) if uri_col else F.lit(None).cast("string")).alias("uri"),
        F.col(payload_col).cast("binary").alias("content"),
    )
