"""Multimodal columns: opaque binary payloads + typed metadata.

Design (north-star, beyond the reference): image/audio/video payloads
travel as ``binary`` columns next to typed metadata structs — the same
shape as the reference's media observations (download_file_path/file_type
columns + parameter associations, jobs/load/observation_mapper.py:851-997),
but with the payload inline so decode/feature stages are data-local.

All heavy per-item work runs as Arrow-batched ``mapInPandas`` stages: the
plan stays a narrow map (no shuffle), Spark pipelines it behind the scan,
and Python sees whole Arrow batches — never row-at-a-time UDF calls.

The actual codec work (JPEG decode, resampling, frame extraction) needs
image/audio libraries that are NOT in this environment, so the codec step
is STUBBED: ``decode_image``/``decode_audio`` raise ``NotImplementedError``
unless the optional library import succeeds, and the tested path uses
deterministic md5-derived fake features (``fake=True``) so the Spark-side
plumbing — schemas, batch iteration, multi-row frame expansion — is fully
real and oracle-checked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from impc_etl_spark.operators.partitioning import fan_out

FEATURE_SCHEMA = (
    "media_id bigint, n_bytes bigint, content_md5 string, "
    "fake_width int, fake_height int"
)

FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_md5 string"


def attach_binary(df: DataFrame, src_col: str, id_col: str, out: str = "content") -> DataFrame:
    """Materialize a binary payload column (here: UTF-8 bytes of a string
    column — in production the bytes come from object-store reads)."""
    # fan narrow inputs out first: the downstream Pandas stages are
    # CPU-bound per row and must not run on one input split
    return fan_out(df).select(
        F.col(id_col).alias("media_id"), F.encode(F.col(src_col), "UTF-8").alias(out)
    )


def _decode_stub(kind: str):
    raise NotImplementedError(
        f"{kind} decode requires an optional codec library (PIL/librosa/av) "
        "not present in this environment; use fake=True for the "
        "deterministic test path"
    )


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Decode an image payload to (width, height, pixels). STUB: real
    decode needs PIL, which is intentionally not a dependency here."""
    try:
        from PIL import Image  # type: ignore[import-not-found]
        import io

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, img
    except ImportError:
        _decode_stub("image")


def decode_audio(payload: bytes):  # pragma: no cover - stub
    """Decode an audio payload to (sample_rate, samples). STUB."""
    _decode_stub("audio")


def media_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Per-item features over the binary payload via Arrow-batched
    mapInPandas: byte length, content md5, and md5-derived fake
    width/height standing in for decoded dimensions.

    The fake dimensions are pure functions of the payload hash so the
    whole stage is deterministic and oracle-checkable; swapping in a real
    decoder changes only the closure, not the plan shape.
    """
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[content_col]
            digests = [hashlib.md5(bytes(p)).hexdigest() for p in payloads]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": [len(bytes(p)) for p in payloads],
                "content_md5": digests,
                "fake_width": [int(d[:4], 16) % 1920 + 1 for d in digests],
                "fake_height": [int(d[4:8], 16) % 1080 + 1 for d in digests],
            })

    return df.mapInPandas(compute, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id bigint, width int, height int, thumb_md5 string"


def resize_media(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    content_col: str = "content",
) -> DataFrame:
    """Resize plumbing: one resized-thumbnail record per payload via
    mapInPandas. The resample kernel is stubbed (no codec libs): the
    'thumbnail' is the deterministic digest md5(payload ‖ ':WxH') so the
    batch shape, schema, and partitioning are real and oracle-checkable —
    a real implementation swaps the digest line for PIL's resize."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f":{width}x{height}".encode()
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": width,
                "height": height,
                "thumb_md5": [
                    hashlib.md5(bytes(p) + tag).hexdigest() for p in pdf[content_col]
                ],
            })

    return df.mapInPandas(compute, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Frame sampling plumbing: expand each payload into n_bytes%4+1
    'frames' (multi-row output per input row — the mapInPandas shape a
    real video frame sampler uses), each tagged with a deterministic
    per-frame digest md5(payload ‖ ':' ‖ idx)."""
    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[content_col]):
                raw = bytes(payload)
                n_frames = len(raw) % 4 + 1
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    digests.append(hashlib.md5(raw + f":{i}".encode()).hexdigest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_md5": digests})

    return df.mapInPandas(expand, schema=FRAME_SCHEMA)
