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


# --- real (codec-free) header probes ----------------------------------------
#
# Unlike pixel decode, CONTAINER HEADERS are plain byte layouts — no codec
# library needed. These parsers are real implementations, not stubs: the
# standard ingest-time metadata pass (dimensions, format, sample rate)
# that lets a 100 TB media crawl be filtered/partitioned/deduplicated
# WITHOUT ever decoding payloads.

HEADER_SCHEMA = (
    "media_id bigint, format string, width int, height int, n_bytes bigint"
)

WAV_SCHEMA = (
    "media_id bigint, n_channels int, sample_rate int, bits_per_sample int, "
    "n_bytes bigint"
)


def probe_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from raw image bytes — PNG IHDR, GIF
    logical-screen descriptor, JPEG SOF scan. Returns None for anything
    unrecognized/truncated (never raises: crawl data is hostile)."""
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
            w = int.from_bytes(payload[16:20], "big")
            h = int.from_bytes(payload[20:24], "big")
            return ("png", w, h)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            w = int.from_bytes(payload[6:8], "little")
            h = int.from_bytes(payload[8:10], "little")
            return ("gif", w, h)
        if payload[:2] == b"\xff\xd8":
            # walk JPEG segments to the first SOF marker (C0-CF minus the
            # non-frame C4/C8/CC); layout: FF xx LL LL [P HH HH WW WW ...]
            i = 2
            n = len(payload)
            while i + 3 < n:
                if payload[i] != 0xFF:
                    return None
                marker = payload[i + 1]
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                    i += 2  # standalone markers have no length field
                    continue
                seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h = int.from_bytes(payload[i + 5 : i + 7], "big")
                    w = int.from_bytes(payload[i + 7 : i + 9], "big")
                    return ("jpeg", w, h)
                i += 2 + seg_len
            return None
        return None
    except (IndexError, ValueError):
        return None


def probe_wav_header(payload: bytes) -> tuple[int, int, int] | None:
    """(n_channels, sample_rate, bits_per_sample) from a RIFF/WAVE header
    by walking chunks to 'fmt ' — again pure byte layout, no audio lib."""
    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        i = 12
        n = len(payload)
        while i + 8 <= n:
            cid = payload[i : i + 4]
            clen = int.from_bytes(payload[i + 4 : i + 8], "little")
            if cid == b"fmt ":
                ch = int.from_bytes(payload[i + 10 : i + 12], "little")
                sr = int.from_bytes(payload[i + 12 : i + 16], "little")
                bps = int.from_bytes(payload[i + 22 : i + 24], "little")
                return (ch, sr, bps)
            i += 8 + clen + (clen & 1)  # chunks are word-aligned
        return None
    except (IndexError, ValueError):
        return None


def image_header_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Per-payload image metadata via Arrow-batched mapInPandas using the
    REAL header parsers above: (format, width, height, n_bytes), with
    NULLs for unrecognized payloads. Narrow map stage — no shuffle; at
    scale this runs pipelined behind the binaryFile/object-store scan."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, sizes = [], [], [], []
            for p in pdf[content_col]:
                raw = bytes(p)
                probed = probe_image_header(raw)
                fmts.append(probed[0] if probed else None)
                ws.append(probed[1] if probed else None)
                hs.append(probed[2] if probed else None)
                sizes.append(len(raw))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "format": fmts,
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "n_bytes": sizes,
            })

    return df.mapInPandas(compute, schema=HEADER_SCHEMA)


def wav_header_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Per-payload audio metadata (channels, sample rate, bit depth) via
    the real RIFF/WAVE chunk walker — same narrow-map shape."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            chs, srs, bps, sizes = [], [], [], []
            for p in pdf[content_col]:
                raw = bytes(p)
                probed = probe_wav_header(raw)
                chs.append(probed[0] if probed else None)
                srs.append(probed[1] if probed else None)
                bps.append(probed[2] if probed else None)
                sizes.append(len(raw))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_channels": pd.array(chs, dtype="Int32"),
                "sample_rate": pd.array(srs, dtype="Int32"),
                "bits_per_sample": pd.array(bps, dtype="Int32"),
                "n_bytes": sizes,
            })

    return df.mapInPandas(compute, schema=WAV_SCHEMA)


# MPEG-1/2 Layer III bitrate (kbps) and sample-rate tables, indexed by the
# frame-header bit fields — public format layout (ISO/IEC 11172-3).
_MP3_BITRATES_V1L3 = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None
)
_MP3_BITRATES_V2L3 = (
    None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, None
)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def probe_mp3_header(payload: bytes) -> tuple[int, int, int] | None:
    """(bitrate_kbps, sample_rate_hz, n_channels) from the first MPEG
    audio Layer-III frame header — pure bit-field layout (11-bit sync,
    version, layer, bitrate index, sample-rate index, channel mode), no
    codec library. Scans forward for the sync word so an ID3v2 tag prefix
    is skipped like real ingest code must."""
    try:
        n = len(payload)
        i = 0
        if payload[:3] == b"ID3" and n >= 10:
            # syncsafe 28-bit tag length
            i = 10 + (
                (payload[6] << 21) | (payload[7] << 14)
                | (payload[8] << 7) | payload[9]
            )
        while i + 4 <= n:
            if payload[i] == 0xFF and (payload[i + 1] & 0xE0) == 0xE0:
                version = (payload[i + 1] >> 3) & 0x3   # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
                layer = (payload[i + 1] >> 1) & 0x3     # 1 = Layer III
                if version == 1 or layer != 1:
                    i += 1
                    continue
                br_idx = (payload[i + 2] >> 4) & 0xF
                sr_idx = (payload[i + 2] >> 2) & 0x3
                mode = (payload[i + 3] >> 6) & 0x3      # 3 = mono
                table = _MP3_BITRATES_V1L3 if version == 3 else _MP3_BITRATES_V2L3
                if sr_idx == 3 or table[br_idx] is None:
                    i += 1
                    continue
                return (
                    table[br_idx],
                    _MP3_RATES[version][sr_idx],
                    1 if mode == 3 else 2,
                )
            i += 1
        return None
    except (IndexError, KeyError):
        return None


MP3_SCHEMA = (
    "media_id long, bitrate_kbps int, sample_rate int, n_channels int, n_bytes long"
)


def mp3_header_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Per-payload MP3 metadata via the real frame-header bit parser —
    same narrow Arrow-batched map shape as the image/WAV probes (no
    shuffle; pipelined behind the binary scan at any scale)."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            brs, srs, chs, sizes = [], [], [], []
            for p in pdf[content_col]:
                raw = bytes(p)
                probed = probe_mp3_header(raw)
                brs.append(probed[0] if probed else None)
                srs.append(probed[1] if probed else None)
                chs.append(probed[2] if probed else None)
                sizes.append(len(raw))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "bitrate_kbps": pd.array(brs, dtype="Int32"),
                "sample_rate": pd.array(srs, dtype="Int32"),
                "n_channels": pd.array(chs, dtype="Int32"),
                "n_bytes": sizes,
            })

    return df.mapInPandas(compute, schema=MP3_SCHEMA)
