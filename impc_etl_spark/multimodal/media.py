"""Multimodal columns: opaque binary payloads + typed metadata.

Design (north-star, beyond the reference): image/audio/video payloads
travel as ``binary`` columns next to typed metadata structs — the same
shape as the reference's media observations (download_file_path/file_type
columns + parameter associations, jobs/load/observation_mapper.py:851-997),
but with the payload inline so decode/feature stages are data-local.

All heavy per-item work runs as Arrow-batched ``mapInPandas`` stages: the
plan stays a narrow map (no shuffle), Spark pipelines it behind the scan,
and Python sees whole Arrow batches — never row-at-a-time UDF calls.

Codec-free formats are decoded FOR REAL: PNG pixels (chunk walk + zlib
inflate + all five scanline filters, `decode_png`), GIF pixels (full
from-spec LZW decompressor + container walk + palette mapping +
de-interlace, `decode_gif` — a genuinely compressed codec the stdlib
does NOT ship), baseline JPEG pixels (marker parse, general DHT Huffman
build, entropy decode, dequantize + IDCT, `decode_jpeg` — implemented
from ITU T.81), WAV PCM / G.711 samples (RIFF chunk walk + struct unpack
+ ITU expansion, `decode_wav`), IMA ADPCM samples (adaptive-predictor
state machine, `decode_ima_wav` — a real lossy compressed codec),
nearest-neighbor resize over decoded pixels
(`_nearest_resize`), and image/WAV/MP3/MP4 header probes — all
pure-stdlib byte layouts. Only formats that genuinely need a codec
library absent from this environment (lossy-VP8 WebP and AVIF pixels
without PIL; MP3/AAC sample decode) raise the honest
``NotImplementedError`` stub — WebP LOSSLESS (VP8L) decodes natively. Video frame EXTRACTION is real at the container level —
`demux_avi_frames` walks the RIFF/AVI tree to each frame chunk's bytes
without a codec (frame PIXEL decode would need one); the older
`sample_frames` digest-based expansion remains as the codec-agnostic
plumbing twin.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from impc_etl_spark.operators.partitioning import fan_out

FEATURE_SCHEMA = (
    "media_id bigint, n_bytes bigint, content_md5 string, "
    "fake_width int, fake_height int"
)

FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_md5 string"

# Hard ceiling on decoded output size (samples/pixels·channels) for every
# byte decoder: header-declared dimensions are ATTACKER data on a crawl,
# and a 65535×65535 header (or a FLAC stream of zero-bit escape residual
# frames) would otherwise allocate gigabytes before any content check —
# an executor-OOM bomb. 1<<26 ≈ an 8K×8K RGB image; raise deliberately if
# a pipeline genuinely ingests larger media.
MAX_DECODE_SAMPLES = 1 << 26


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
        f"{kind} decode for this format requires an optional codec library "
        "(PIL/librosa/av) not present in this environment; codec-free "
        "formats (PNG pixels, WAV PCM, container headers) decode natively"
    )


def _decode_any_image(payload: bytes):
    """THE pure-stdlib image fallback chain — every feature stage must
    agree on which payloads decode, so this is defined exactly once."""
    return (decode_png(payload) or decode_gif(payload)
            or decode_jpeg(payload) or decode_bmp(payload)
            or decode_tiff(payload) or decode_pnm(payload)
            or decode_webp(payload) or decode_ico(payload)
            or decode_tga(payload))


def _decode_any_audio(payload: bytes):
    """THE audio fallback chain (same single-definition contract)."""
    return (decode_wav(payload) or decode_ima_wav(payload)
            or flac_decode(payload) or decode_aiff(payload))


def _synth_digest_media(df: DataFrame, content_col: str,
                        encode, n_px: int) -> DataFrame:
    """Shared digest-tiling synthesis loop: every DuckDB pixel-replay
    oracle depends on this exact byte contract (md5 digest tiled to
    n_px), so it is defined once and parameterized by the encoder."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                digest = hashlib.md5(bytes(p)).digest()
                pixels = (digest * (n_px // len(digest) + 1))[:n_px]
                out.append(encode(pixels))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


def decode_image(payload: bytes):
    """Decode an image payload to (width, height, samples) with
    ``samples`` the raw channel bytes in scan order ON EITHER PATH — PIL
    when importable (any format; ``img.tobytes()``), else the
    pure-stdlib ``decode_png`` / ``decode_gif`` /
    ``decode_jpeg`` paths — so numeric code over the result behaves
    identically on a heterogeneous cluster where only some workers have
    PIL. The dispatch falls back to the pure path on ANY PIL failure —
    missing package OR a format PIL lacks (e.g. some VP8L builds) — so
    the native-library escape hatch never narrows coverage; only when
    both paths fail does the honest stub error raise (lossy-VP8 WebP
    and AVIF genuinely need a codec library)."""
    try:
        from PIL import Image  # type: ignore[import-not-found]
        import io

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, img.tobytes()
    except Exception:
        decoded = _decode_any_image(payload)
        if decoded is not None:
            w, h, _mode, samples = decoded
            return w, h, bytes(samples)
        _decode_stub("image")


def decode_audio(payload: bytes):
    """Decode an audio payload to (sample_rate, samples). REAL for
    RIFF/WAVE PCM (8/16-bit — pure ``struct`` byte layout), G.711
    µ-law/A-law (ITU expansion formulas), and IMA ADPCM (the 4:1
    adaptive-predictor codec, from the public IMA reference algorithm);
    FLAC (lossless — fixed and LPC predictors, Rice entropy coding,
    stereo decorrelation, CRC-verified); the remaining compressed codecs
    (MP3/AAC) genuinely need a decoder library absent here, so they keep
    the honest stub error."""
    decoded = _decode_any_audio(payload)
    if decoded is not None:
        return decoded[0], decoded[2]
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


RESIZE_SCHEMA = (
    "media_id bigint, width int, height int, pixels array<int>, "
    "mean_luminance double"
)


def _nearest_resize(
    samples, src_w: int, src_h: int, bpp: int, dst_w: int, dst_h: int
) -> list[int]:
    """REAL nearest-neighbor resample kernel over raw channel bytes in
    scan order: destination pixel (x, y) reads source pixel
    (x*src_w // dst_w, y*src_h // dst_h) — the floor mapping — and
    multi-channel pixels collapse to luminance by integer channel mean.
    Pure-Python byte math; deterministic on every worker (no PIL filter
    heuristics)."""
    out = []
    for y in range(dst_h):
        sy = (y * src_h) // dst_h
        for x in range(dst_w):
            sx = (x * src_w) // dst_w
            base = (sy * src_w + sx) * bpp
            px = samples[base : base + bpp]
            out.append(sum(px) // bpp)
    return out


def resize_media(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    content_col: str = "content",
) -> DataFrame:
    """REAL resize: decode each payload's pixels (PIL when importable,
    else the pure-stdlib ``decode_png`` path), nearest-neighbor resample
    to ``width``×``height`` with `_nearest_resize`, and emit the resized
    luminance pixels themselves plus their mean — decoded-pixel evidence
    an oracle can replay byte-for-byte. Undecodable payloads (crawl data
    is hostile) yield NULL pixels/mean, never a thrown batch. One narrow
    Arrow-batched mapInPandas stage: no shuffle, pipelined behind the
    binary scan at any scale."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px_col, means = [], []
            for p in pdf[content_col]:
                raw = bytes(p)
                pixels = mean = None
                try:
                    w, h, samples = decode_image(raw)
                    bpp = len(samples) // (w * h)
                    pixels = _nearest_resize(samples, w, h, bpp, width, height)
                    mean = sum(pixels) / len(pixels)
                except Exception:
                    pixels = mean = None
                px_col.append(pixels)
                means.append(mean)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": width,
                "height": height,
                "pixels": px_col,
                "mean_luminance": pd.array(means, dtype="float64"),
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
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            probed = probe_tiff_header(payload)
            if probed is None:
                return None
            return ("tiff", probed[0], probed[1])
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            tag = payload[12:16]
            if tag == b"VP8X":  # extended: 24-bit canvas size minus one
                w = 1 + int.from_bytes(payload[24:27], "little")
                h = 1 + int.from_bytes(payload[27:30], "little")
                return ("webp", w, h)
            if tag == b"VP8 ":  # lossy: sync code then 14-bit dims
                if payload[23:26] != b"\x9d\x01\x2a":
                    return None
                w = int.from_bytes(payload[26:28], "little") & 0x3FFF
                h = int.from_bytes(payload[28:30], "little") & 0x3FFF
                return ("webp", w, h)
            if tag == b"VP8L":  # lossless: 14-bit dims minus one, packed
                if payload[20] != 0x2F:
                    return None
                bits = int.from_bytes(payload[21:25], "little")
                return ("webp", (bits & 0x3FFF) + 1,
                        ((bits >> 14) & 0x3FFF) + 1)
            return None
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
        if payload[:2] == b"BM":
            if int.from_bytes(payload[14:18], "little") < 40:
                return None          # OS/2 BITMAPCOREHEADER: 16-bit dims
            w = int.from_bytes(payload[18:22], "little", signed=True)
            h = int.from_bytes(payload[22:26], "little", signed=True)
            if w > 0 and h != 0:
                return ("bmp", w, abs(h))
            return None
        if payload[:2] in (b"P2", b"P3", b"P5", b"P6"):
            probed = _pnm_header(payload)   # header-only: O(1), not O(px)
            if probed is None:
                return None
            return ("pnm", probed[1], probed[2])
        if (b"svg" in payload[:4096]
                and payload.lstrip()[:1] == b"<"):  # same window as the
            # dedicated probe, so the two classifiers agree per payload
            probed = probe_svg_header(payload)
            if probed is None:
                return None
            return ("svg", probed[0], probed[1])
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


CORRUPT_PROBE_SCHEMA = (
    "media_id bigint, status string, width int, height int, n_bytes bigint"
)


def classify_media_or_deadletter(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Total (never-raising) per-payload decode triage — the dead-letter
    boundary a 100 TB crawl ingest needs: every blob gets exactly one row
    with a failure class instead of a task failure poisoning its whole
    partition (reference posture: FAILFAST/DROPMALFORMED ingest,
    jobs/extract/xml_extraction_helper.py:22-81, applied to binary media).

    Classes (mutually exclusive, checked in order):
      ``empty``          zero-byte payload
      ``unknown_format`` no recognized image magic
      ``header_bomb``    header parses but declares dimensions over
                         MAX_DECODE_SAMPLES (attacker-controlled alloc)
      ``corrupt_body``   magic + sane header, but full decode fails
                         (truncation, bad CRC, mangled stream)
      ``ok``             full decode succeeded (width/height filled)

    Uses the pure-stdlib decode chain ONLY (no PIL dispatch): the class a
    blob lands in must be identical on every worker of a heterogeneous
    cluster, and PIL accepts some payloads the pure chain rejects. Narrow
    Arrow-batched map; no shuffle."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            statuses, ws, hs, sizes = [], [], [], []
            for p in pdf[content_col]:
                raw = bytes(p) if p is not None else b""
                w = h = None
                try:
                    if len(raw) == 0:
                        status = "empty"
                    else:
                        probed = probe_image_header(raw)
                        if probed is None:
                            status = "unknown_format"
                        elif (
                            probed[1] <= 0
                            or probed[2] <= 0
                            or probed[1] * probed[2] > MAX_DECODE_SAMPLES
                        ):
                            status = "header_bomb"
                        else:
                            decoded = _decode_any_image(raw)
                            if decoded is None:
                                status = "corrupt_body"
                            else:
                                status = "ok"
                                w, h = decoded[0], decoded[1]
                except Exception:  # noqa: BLE001 — triage must be total
                    status = "corrupt_body"
                statuses.append(status)
                ws.append(w)
                hs.append(h)
                sizes.append(len(raw))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "status": statuses,
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "n_bytes": sizes,
            })

    return df.mapInPandas(compute, schema=CORRUPT_PROBE_SCHEMA)


def synth_corrupt_media_mix(
    df: DataFrame,
    content_col: str = "content",
    width: int = 4,
    height: int = 4,
) -> DataFrame:
    """Deterministic hostile-blob synthesis: each input payload becomes
    FIVE media rows — one per triage class of
    ``classify_media_or_deadletter`` — so a corrupt-ingest query has a
    literal, oracle-replayable expected table:

      variant 0  valid grayscale PNG (digest pixels)         → ok
      variant 1  the same PNG truncated right after IHDR     → corrupt_body
      variant 2  zero-byte blob                              → empty
      variant 3  PNG whose IHDR declares 65535×65535         → header_bomb
      variant 4  0x00 + md5 digest (matches no image magic)  → unknown_format

    ``media_id`` = id*5 + variant. Narrow Arrow-batched map; the 5×
    expansion happens inside the map (no join, no shuffle)."""
    import struct
    import zlib

    def _chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 65535, 65535, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00"))
        + _chunk(b"IEND", b"")
    )
    n_px = width * height

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid, p in zip(pdf["media_id"], pdf[content_col]):
                digest = hashlib.md5(bytes(p)).digest()
                pixels = (digest * (n_px // len(digest) + 1))[:n_px]
                png = _png_gray(pixels, width, height)
                variants = [png, png[:33], b"", bomb, b"\x00" + digest]
                for v, blob in enumerate(variants):
                    ids.append(int(mid) * 5 + v)
                    blobs.append(blob)
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


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


# --- real pixel decode --------------------------------------------------------
#
# PNG is a fully-documented public byte format whose only compression is
# DEFLATE — which the Python stdlib ships — so PNG pixel decode needs no
# codec library at all: `decode_png` below parses chunks, inflates IDAT,
# and undoes all five scanline filters (including Paeth) in pure
# struct+zlib Python. `decode_image_features` uses PIL when it imports
# (covers JPEG/GIF/etc.) and falls back to the native PNG path otherwise;
# only non-PNG formats without PIL stay honestly undecodable (NULL
# features). To make the path oracle-checkable without image files in the
# test data, `synth_gray_png` is the matching real ENCODER: deterministic
# grayscale pixels derived from the payload md5, so DuckDB replays the
# decoded statistics from md5(text) alone. Reference analog: the
# image-observation pipeline columns (jobs/load/observation_mapper.py:
# 851-997).

PNG_SCHEMA = "media_id bigint, content binary"

DECODE_SCHEMA = (
    "media_id bigint, width int, height int, img_mode string, "
    "mean_luminance double"
)


def _png_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal valid grayscale PNG (8-bit, no interlace) from raw pixel
    bytes — IHDR/IDAT/IEND with correct CRCs, zlib-compressed scanlines
    with per-row filter byte 0. Pure byte layout; any decoder reads it."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[r * width : (r + 1) * width] for r in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def synth_gray_png(
    df: DataFrame,
    content_col: str = "content",
    width: int = 4,
    height: int = 4,
) -> DataFrame:
    """Deterministic image synthesis: each payload becomes a real
    ``width``×``height`` grayscale PNG whose pixel bytes are the payload's
    md5 digest (tiled if more than 16 pixels are needed) — a genuine
    encoded image a real decoder must parse, yet every downstream pixel
    statistic is a pure function of md5(payload) that an oracle can
    replay. Narrow Arrow-batched map; no shuffle."""
    n_px = width * height

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                digest = hashlib.md5(bytes(p)).digest()
                pixels = (digest * (n_px // len(digest) + 1))[:n_px]
                out.append(_png_gray(pixels, width, height))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


def _png_gray_interlaced(pixels: bytes, width: int, height: int) -> bytes:
    """Grayscale PNG with Adam7 interlacing (ISO/IEC 15948 §8.2): the
    seven passes' scanlines (filter 0 each) are laid out in pass order —
    the progressive-download form crawled PNGs often arrive in. Same
    chunk/CRC layout as `_png_gray`."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    stream = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for y in range(ph):
            stream.append(0)
            for x in range(pw):
                stream.append(pixels[(y0 + y * dy) * width + (x0 + x * dx)])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream)))
        + chunk(b"IEND", b"")
    )


def synth_gray_png_interlaced(
    df: DataFrame,
    content_col: str = "content",
    width: int = 5,
    height: int = 4,
) -> DataFrame:
    """Deterministic Adam7-interlaced PNG synthesis — digest pixels
    through the real progressive writer, same oracle-replayable contract
    as `synth_gray_png`. Narrow map."""
    n_px = width * height
    return _synth_digest_media(
        df, content_col, lambda px: _png_gray_interlaced(px, width, height),
        n_px,
    )


def synth_apng(
    df: DataFrame,
    content_col: str = "content",
    width: int = 4,
    height: int = 4,
) -> DataFrame:
    """Deterministic APNG synthesis: a real animated PNG (acTL after
    IHDR, per-frame fcTL, first frame as IDAT, later frames as fdAT with
    running sequence numbers — the public APNG spec layout, CRC-correct
    chunks) whose frame count (digest[0] % 4 + 2), loop count
    (digest[1] % 3) and per-frame centisecond delays (digest[2+i]) are
    all functions of md5(payload) an oracle can replay. Narrow map."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    n_px = width * height

    def build(digest: bytes) -> bytes:
        n_frames = digest[0] % 4 + 2
        n_plays = digest[1] % 3
        pixels = (digest * (n_px // 16 + 1))[:n_px]
        raw = b"".join(
            b"\x00" + pixels[r * width : (r + 1) * width]
            for r in range(height)
        )
        ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
        out = bytearray(b"\x89PNG\r\n\x1a\n")
        out += chunk(b"IHDR", ihdr)
        out += chunk(b"acTL", struct.pack(">II", n_frames, n_plays))
        seq = 0
        for f in range(n_frames):
            fctl = struct.pack(
                ">IIIIIHHBB", seq, width, height, 0, 0,
                digest[2 + (f % 14)], 100, 0, 0,
            )
            out += chunk(b"fcTL", fctl)
            seq += 1
            if f == 0:
                out += chunk(b"IDAT", zlib.compress(raw))
            else:
                out += chunk(
                    b"fdAT", struct.pack(">I", seq) + zlib.compress(raw)
                )
                seq += 1
        out += chunk(b"IEND", b"")
        return bytes(out)

    return _synth_digest_media(
        df, content_col, lambda px: build(bytes(px[:16])), 16
    )


def probe_apng(payload: bytes) -> tuple[int, int, int, int] | None:
    """APNG animation probe — header-only chunk walk (no pixel decode,
    the GIF frame-walk sibling): returns (is_animated, n_frames,
    n_plays, total_delay_cs) with the total normalized to integer
    centiseconds (num·100 // den, den 0 meaning 1/100s per the spec).
    Plain PNGs report (0, 1, 0, 0); None for non-PNG/corrupt bytes
    (never raises)."""
    try:
        if payload[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        i, n = 8, len(payload)
        n_frames = n_plays = None
        total_cs = 0
        seen_fctl = 0
        while i + 8 <= n:
            clen = int.from_bytes(payload[i : i + 4], "big")
            tag = payload[i + 4 : i + 8]
            data = payload[i + 8 : i + 8 + clen]
            if tag == b"acTL" and clen >= 8:
                n_frames = int.from_bytes(data[0:4], "big")
                n_plays = int.from_bytes(data[4:8], "big")
                if n_frames > 1_000_000:  # header bomb: reject
                    return None
            elif tag == b"fcTL" and clen >= 26:
                num = int.from_bytes(data[20:22], "big")
                den = int.from_bytes(data[22:24], "big")
                total_cs += num * 100 // (den if den else 100)
                seen_fctl += 1
            elif tag == b"IEND":
                break
            i += 12 + clen
        if n_frames is None:
            return (0, 1, 0, 0)
        if seen_fctl != n_frames:
            return None  # inconsistent animation control: corrupt
        return (1, n_frames, n_plays, total_cs)
    except Exception:
        return None


def apng_probe_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Animation triage over APNG payloads: one narrow Arrow map, probe
    only (no pixel decode) — the PNG sibling of the animated-GIF frame
    walk. NULLs for unparseable bytes."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": pdf["media_id"], "is_animated": [],
                    "n_frames": [], "n_plays": [], "total_delay_cs": []}
            for p in pdf[content_col]:
                r = probe_apng(bytes(p))
                if r is None:
                    r = (None, None, None, None)
                rows["is_animated"].append(r[0])
                rows["n_frames"].append(r[1])
                rows["n_plays"].append(r[2])
                rows["total_delay_cs"].append(r[3])
            out = pd.DataFrame(rows)
            for c in ("is_animated", "n_frames", "n_plays", "total_delay_cs"):
                out[c] = pd.array(out[c], dtype="Int64")
            yield out

    return df.mapInPandas(
        compute,
        schema=("media_id bigint, is_animated bigint, n_frames bigint, "
                "n_plays bigint, total_delay_cs bigint"),
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


_PNG_MODES = {0: ("L", 1), 2: ("RGB", 3), 4: ("LA", 2), 6: ("RGBA", 4)}


def _png_unfilter(raw, width: int, height: int, bpp: int, offset: int):
    """Reverse the per-scanline filters (None/Sub/Up/Average/Paeth —
    ISO/IEC 15948 §9) for one image plane or one Adam7 pass starting at
    ``offset`` in the inflated stream. Returns the plane bytes or None
    on an unknown filter type."""
    stride = width * bpp
    out = bytearray(height * stride)
    for r in range(height):
        pos = offset + r * (stride + 1)
        ftype = raw[pos]
        line = raw[pos + 1 : pos + 1 + stride]
        base = r * stride
        prev = out[base - stride : base] if r else bytes(stride)
        if ftype == 0:
            out[base : base + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                out[base + x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                out[base + x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                out[base + x] = (line[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                out[base + x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
        else:
            return None
    return out


# Adam7 pass layout (ISO/IEC 15948 §8.2): (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png(payload: bytes) -> tuple[int, int, str, bytearray] | None:
    """REAL pure-stdlib PNG decode for 8-bit gray / RGB / gray+alpha /
    RGBA / PALETTE images, BOTH progressive-download (Adam7 interlaced,
    each pass filtered independently then scattered — ISO/IEC 15948
    §8.2) and sequential: walk chunks, zlib-inflate the concatenated
    IDAT stream (bounded at the header-implied size so a deflate bomb
    cannot materialize), reverse the per-scanline filters, expand PLTE
    indices to RGB. Returns (width, height, mode, samples) with
    ``samples`` the raw channel bytes in scan order, or None for
    anything unrecognized, unsupported (16-bit/sub-byte depths), or
    corrupt — crawl payloads are hostile, so this never raises."""
    import struct
    import zlib

    try:
        if payload[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        i, n = 8, len(payload)
        width = height = None
        mode = None
        bpp = 0
        ilace = 0
        ctype = -1
        plte = None
        idat = bytearray()
        while i + 8 <= n:
            clen = int.from_bytes(payload[i : i + 4], "big")
            tag = payload[i + 4 : i + 8]
            data = payload[i + 8 : i + 8 + clen]
            if tag == b"IHDR":
                width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                    ">IIBBBBB", data
                )
                if depth != 8 or comp != 0 or filt != 0 or ilace not in (0, 1):
                    return None
                if width == 0 or height == 0:  # degenerate: no pixels
                    return None
                if ctype == 3:
                    mode, bpp = "RGB", 1  # palette indices; expand later
                elif ctype in _PNG_MODES:
                    mode, bpp = _PNG_MODES[ctype]
                else:
                    return None
                if width * height * max(bpp, 3) > MAX_DECODE_SAMPLES:
                    return None  # header-claimed size: decode bomb
            elif tag == b"PLTE":
                if clen % 3 or clen > 768:
                    return None
                plte = bytes(data)
            elif tag == b"IDAT":
                idat.extend(data)
            elif tag == b"IEND":
                break
            i += 12 + clen  # len + tag + data + crc
        if width is None or not idat:
            return None
        if ctype == 3 and plte is None:
            return None
        if ilace == 0:
            passes = [(0, 0, 1, 1, width, height)]
        else:
            passes = []
            for x0, y0, dx, dy in _ADAM7:
                pw = (width - x0 + dx - 1) // dx
                ph = (height - y0 + dy - 1) // dy
                if pw > 0 and ph > 0:
                    passes.append((x0, y0, dx, dy, pw, ph))
        want = sum(ph * (pw * bpp + 1) for *_x, pw, ph in passes)
        # bound the inflate at want+1 bytes: a deflate bomb (tiny IDAT
        # expanding to GBs) must not materialize before the length check
        raw = zlib.decompressobj().decompress(bytes(idat), want + 1)
        if len(raw) != want:
            return None
        out = bytearray(height * width * bpp)
        offset = 0
        for x0, y0, dx, dy, pw, ph in passes:
            plane = _png_unfilter(raw, pw, ph, bpp, offset)
            if plane is None:
                return None
            offset += ph * (pw * bpp + 1)
            if (dx, dy) == (1, 1) and (x0, y0) == (0, 0):
                out[:] = plane
                continue
            for y in range(ph):
                ty = y0 + y * dy
                for x in range(pw):
                    d = (ty * width + x0 + x * dx) * bpp
                    s = (y * pw + x) * bpp
                    out[d : d + bpp] = plane[s : s + bpp]
        if ctype == 3:
            rgb = bytearray(width * height * 3)
            pmax = len(plte) // 3
            for j, idx in enumerate(out):
                if idx >= pmax:
                    return None  # index past palette: corrupt
                rgb[j * 3 : j * 3 + 3] = plte[idx * 3 : idx * 3 + 3]
            return (width, height, "RGB", rgb)
        return (width, height, mode, out)
    except Exception:
        return None


def decode_image_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """REAL pixel decode: (width, height, mode, mean luminance over the
    actual decoded samples) per payload through one Arrow-batched
    mapInPandas stage — narrow map, pipelined behind the binary scan, no
    shuffle at any scale. Decoder choice is per-worker: PIL when
    importable (JPEG/GIF/WebP/…), else the pure-stdlib ``decode_png`` /
    ``decode_gif`` paths (DEFLATE ships in zlib and the GIF LZW
    decompressor is implemented from the public spec in this module).
    Undecodable payloads yield NULL features (crawl data is hostile; the
    stage never dies mid-scan)."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        try:
            from PIL import Image  # type: ignore[import-not-found]
        except ImportError:
            Image = None

        for pdf in batches:
            ws, hs, modes, lums = [], [], [], []
            for p in pdf[content_col]:
                raw = bytes(p)
                w = h = mode = lum = None
                if Image is not None:
                    try:
                        img = Image.open(io.BytesIO(raw))
                        import numpy as np

                        arr = np.asarray(img, dtype="float64")
                        w, h, mode = img.width, img.height, img.mode
                        lum = float(arr.mean())
                    except Exception:
                        pass
                else:
                    decoded = _decode_any_image(raw)
                    if decoded is not None:
                        w, h, mode, samples = decoded
                        # decode_png rejects 0×0 images, so samples is
                        # non-empty; guard anyway — this branch must NEVER
                        # throw (one hostile payload would kill the scan)
                        try:
                            lum = sum(samples) / len(samples)
                        except Exception:
                            w = h = mode = lum = None
                ws.append(w)
                hs.append(h)
                modes.append(mode)
                lums.append(lum)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "img_mode": modes,
                "mean_luminance": pd.array(lums, dtype="float64"),
            })

    return df.mapInPandas(compute, schema=DECODE_SCHEMA)


# --- real audio decode --------------------------------------------------------
#
# Like PNG, uncompressed WAV is a fully-documented public byte format
# (RIFF chunks + raw PCM frames) needing zero codec libraries: `decode_wav`
# walks chunks with `struct`-level byte math and unpacks 8/16-bit PCM
# samples. `synth_wav` is the matching real ENCODER — deterministic PCM16
# samples derived from the payload md5 — so DuckDB replays every decoded
# statistic from md5(text) alone (same pattern as synth_gray_png /
# decode_png). Compressed codecs (MP3/AAC/FLAC) keep the honest stub in
# `decode_audio`. Reference analog: media-observation columns
# (jobs/load/observation_mapper.py:851-997).

AUDIO_SCHEMA = (
    "media_id bigint, sample_rate int, n_channels int, n_frames bigint, "
    "duration_sec double, rms double, peak int, zcr double"
)


def _ulaw_to_linear(u: int) -> int:
    """ITU-T G.711 µ-law expansion (the public Sun g711.c formulation):
    complement, rebuild mantissa+bias, shift by the segment, re-bias."""
    u = ~u & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return 0x84 - t if u & 0x80 else t - 0x84


def _alaw_to_linear(a: int) -> int:
    """ITU-T G.711 A-law expansion: XOR 0x55, then segment-wise linear
    reconstruction; sign bit SET means positive in A-law."""
    a ^= 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = t + 8 if seg == 0 else ((t + 0x108) << (seg - 1))
    return t if a & 0x80 else -t


def decode_wav(payload: bytes) -> tuple[int, int, list[int]] | None:
    """REAL pure-stdlib WAV decode: walk RIFF chunks to 'fmt ' and
    'data', accept linear PCM (format tag 1, 8/16-bit) plus the G.711
    telephony codings — A-law (tag 6) and µ-law (tag 7), expanded to
    linear 16-bit through the public ITU formulas — and unpack the
    sample stream — 16-bit signed little-endian via ``struct``, 8-bit
    unsigned recentred to signed — returning
    (sample_rate, n_channels, samples) with ``samples`` the interleaved
    frames. None for anything unrecognized/compressed/truncated (crawl
    payloads are hostile; never raises)."""
    import struct

    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        i, n = 12, len(payload)
        fmt = None
        data = None
        while i + 8 <= n:
            cid = payload[i : i + 4]
            clen = int.from_bytes(payload[i + 4 : i + 8], "little")
            body = payload[i + 8 : i + 8 + clen]
            if cid == b"fmt " and clen >= 16:
                tag, ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
                fmt = (tag, ch, sr, bits)
            elif cid == b"data":
                data = body
            i += 8 + clen + (clen & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        tag, ch, sr, bits = fmt
        if ch < 1 or sr <= 0:
            return None
        if tag == 6 and bits == 8:
            samples = [_alaw_to_linear(b) for b in data]
        elif tag == 7 and bits == 8:
            samples = [_ulaw_to_linear(b) for b in data]
        elif tag == 1 and bits == 16:
            n_samp = len(data) // 2
            samples = list(struct.unpack(f"<{n_samp}h", data[: n_samp * 2]))
        elif tag == 1 and bits == 8:
            samples = [b - 128 for b in data]
        elif tag == 3 and bits == 32:
            # IEEE float PCM (WAVE_FORMAT_IEEE_FLOAT): normalize [-1, 1)
            # floats to the 16-bit integer scale with the exact
            # floor(x·32768 + 0.5) mapping (clamped) — v/32768 inputs
            # round-trip bit-exactly, so oracles replay it
            import math as _math2

            n_samp = len(data) // 4
            fl = struct.unpack(f"<{n_samp}f", data[: n_samp * 4])
            samples = [
                max(-32768, min(32767, int(_math2.floor(f * 32768.0 + 0.5))))
                if f == f else 0
                for f in fl
            ]
        else:
            return None
        # truncate ragged tails to whole frames
        n_frames = len(samples) // ch
        return (sr, ch, samples[: n_frames * ch])
    except Exception:
        return None


def _wav_pcm16(samples: list[int], sample_rate: int) -> bytes:
    """Minimal valid mono PCM16 WAV from signed samples — RIFF/fmt/data
    with correct sizes. Pure byte layout; any decoder reads it."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav_float32(samples: list[float], sample_rate: int) -> bytes:
    """Minimal valid mono IEEE-float WAV (format tag 3, 32-bit) — the
    float sibling of `_wav_pcm16`. Pure byte layout."""
    import struct

    data = struct.pack(f"<{len(samples)}f", *samples)
    fmt = struct.pack("<HHIIHH", 3, 1, sample_rate, sample_rate * 4, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_float_wav(
    df: DataFrame, content_col: str = "content", sample_rate: int = 8000
) -> DataFrame:
    """Deterministic IEEE-float WAV synthesis: the digest's 8 int16
    values scaled to v/32768 floats — exactly representable in float32,
    so the decoder's floor(f·32768 + 0.5) normalization recovers the
    integers bit-exactly and the PCM16 oracle replays unchanged."""
    import struct

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                digest = hashlib.md5(bytes(p)).digest()
                ints = struct.unpack("<8h", digest)
                out.append(_wav_float32(
                    [v / 32768.0 for v in ints], sample_rate))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


def synth_wav(
    df: DataFrame, content_col: str = "content", sample_rate: int = 8000
) -> DataFrame:
    """Deterministic audio synthesis: each payload becomes a real mono
    PCM16 WAV whose 8 frames are the payload's md5 digest read as
    little-endian int16 pairs — a genuine encoded waveform a real decoder
    must parse, yet every downstream sample statistic is a pure function
    of md5(payload) an oracle can replay. Narrow Arrow-batched map; no
    shuffle."""
    import struct

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                digest = hashlib.md5(bytes(p)).digest()
                samples = list(struct.unpack("<8h", digest))
                out.append(_wav_pcm16(samples, sample_rate))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


def decode_audio_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """REAL PCM decode: (sample rate, channels, frame count, duration,
    RMS, peak |sample|, zero-crossing rate) over the ACTUAL decoded
    samples per payload, through one Arrow-batched mapInPandas stage —
    narrow map, pipelined behind the binary scan, no shuffle at any
    scale. ZCR = fraction of adjacent sample pairs whose product is
    negative (strict sign flips; a standard voiced/unvoiced & noisiness
    signal), NULL for single-sample clips. Undecodable / compressed
    payloads yield NULL features (the stage never dies mid-scan)."""
    import math

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srs, chs, nfs, durs, rmss, peaks, zcrs = [], [], [], [], [], [], []
            for p in pdf[content_col]:
                sr = ch = nf = dur = rms = peak = zcr = None
                raw = bytes(p)
                decoded = _decode_any_audio(raw)
                if decoded is not None and decoded[2]:
                    sr, ch, samples = decoded
                    nf = len(samples) // ch
                    dur = nf / sr
                    rms = math.sqrt(sum(s * s for s in samples) / len(samples))
                    peak = max(abs(s) for s in samples)
                    if len(samples) > 1:
                        zcr = sum(
                            1 for a, b in zip(samples, samples[1:]) if a * b < 0
                        ) / (len(samples) - 1)
                srs.append(sr)
                chs.append(ch)
                nfs.append(nf)
                durs.append(dur)
                rmss.append(rms)
                peaks.append(peak)
                zcrs.append(zcr)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "sample_rate": pd.array(srs, dtype="Int32"),
                "n_channels": pd.array(chs, dtype="Int32"),
                "n_frames": pd.array(nfs, dtype="Int64"),
                "duration_sec": pd.array(durs, dtype="float64"),
                "rms": pd.array(rmss, dtype="float64"),
                "peak": pd.array(peaks, dtype="Int32"),
                "zcr": pd.array(zcrs, dtype="float64"),
            })

    return df.mapInPandas(compute, schema=AUDIO_SCHEMA)


# --- real MP4/ISO-BMFF container probe ---------------------------------------
#
# MP4's container layout (ISO/IEC 14496-12) is plain nested length-tagged
# boxes — no codec library needed to read movie duration/timescale/track
# count at ingest time. `probe_mp4_header` walks top-level boxes to
# `moov`, parses `mvhd` (v0 and v1 layouts), and counts `trak` children;
# `synth_mp4` is the matching minimal real encoder so an oracle replays
# every probed value from md5(payload) alone — the same pattern as
# synth_gray_png/decode_png and synth_wav/decode_wav.

MP4_SCHEMA = (
    "media_id bigint, timescale int, duration_ticks bigint, "
    "duration_sec double, n_tracks int, n_bytes bigint"
)


def probe_mp4_header(payload: bytes) -> tuple[int, int, int] | None:
    """(timescale, duration_ticks, n_tracks) from ISO-BMFF boxes: walk
    top-level [size u32][fourcc] headers (size==1 → 64-bit largesize,
    size==0 → box runs to EOF) to ``moov``, read ``mvhd`` (version 0:
    32-bit times; version 1: 64-bit), count ``trak`` boxes. None for
    anything unrecognized/truncated (never raises)."""
    try:
        n = len(payload)

        def walk(lo: int, hi: int):
            i = lo
            while i + 8 <= hi:
                size = int.from_bytes(payload[i : i + 4], "big")
                tag = payload[i + 4 : i + 8]
                body = i + 8
                if size == 1:
                    if i + 16 > hi:
                        return
                    size = int.from_bytes(payload[i + 8 : i + 16], "big")
                    body = i + 16
                elif size == 0:
                    size = hi - i
                if size < 8 or i + size > hi:
                    return
                yield tag, body, i + size
                i += size

        moov = next(
            ((b, e) for t, b, e in walk(0, n) if t == b"moov"), None
        )
        if moov is None:
            return None
        timescale = duration = None
        n_tracks = 0
        for tag, b, e in walk(*moov):
            if tag == b"mvhd":
                version = payload[b]
                if version == 0:
                    timescale = int.from_bytes(payload[b + 12 : b + 16], "big")
                    duration = int.from_bytes(payload[b + 16 : b + 20], "big")
                elif version == 1:
                    timescale = int.from_bytes(payload[b + 20 : b + 24], "big")
                    duration = int.from_bytes(payload[b + 24 : b + 32], "big")
                else:
                    return None
            elif tag == b"trak":
                n_tracks += 1
        if timescale is None or timescale == 0:
            return None
        return (timescale, duration, n_tracks)
    except Exception:
        return None


def _mp4_box(tag: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(body)) + tag + body


def _mp4_min(timescale: int, duration: int, n_tracks: int) -> bytes:
    """Minimal valid MP4: ftyp + moov(mvhd v0 + n empty trak boxes) —
    correct box sizes and the full 100-byte mvhd v0 payload layout."""
    import struct

    mvhd = (
        b"\x00\x00\x00\x00"                      # version 0 + flags
        + struct.pack(">II", 0, 0)               # creation/modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)          # rate 1.0
        + struct.pack(">H", 0x0100)              # volume 1.0
        + b"\x00" * 10                           # reserved
        + b"\x00" * 36                           # identity matrix slot
        + b"\x00" * 24                           # pre_defined
        + struct.pack(">I", n_tracks + 1)        # next_track_ID
    )
    moov = _mp4_box(b"mvhd", mvhd) + b"".join(
        _mp4_box(b"trak", b"") for _ in range(n_tracks)
    )
    return (
        _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        + _mp4_box(b"moov", moov)
    )


def image_dhash(
    df: DataFrame,
    content_col: str = "content",
    cols: int = 8,
    rows: int = 8,
) -> DataFrame:
    """Difference-hash (dHash) perceptual image fingerprint — the
    standard near-duplicate key for crawled images (aHash/dHash/pHash
    family; dHash = per-row brightness gradient signs, robust to
    uniform exposure shifts where aHash is not). Decode (PIL when
    importable, else the pure-stdlib decoders), nearest-resize to
    (cols+1)xrows luminance, then bit r*cols+c = 1 iff
    pixel[r][c] < pixel[r][c+1]. Emitted as a (cols*rows)-char
    '0'/'1' string in row-major order: integer comparisons only, so
    any engine replays it exactly, and banding/grouping treats it as
    an opaque key. Undecodable payloads yield NULL (hostile crawl
    bytes never throw a batch). One narrow Arrow-batched mapInPandas
    stage; no shuffle — grouping on the hash afterwards is the only
    exchange, and it ships (hash, id) pairs, never pixels."""
    dst_w = cols + 1

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes, ws, hs = [], [], []
            for p in pdf[content_col]:
                dh = w = h = None
                try:
                    w, h, samples = decode_image(bytes(p))
                    bpp = len(samples) // (w * h)
                    px = _nearest_resize(samples, w, h, bpp, dst_w, rows)
                    dh = "".join(
                        "1" if px[r * dst_w + c] < px[r * dst_w + c + 1] else "0"
                        for r in range(rows)
                        for c in range(cols)
                    )
                except Exception:
                    dh = w = h = None
                hashes.append(dh)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "dhash": hashes,
            })

    return df.mapInPandas(
        compute, schema="media_id bigint, width int, height int, dhash string"
    )


def color_histogram(
    df: DataFrame,
    content_col: str = "content",
    bins: int = 4,
) -> DataFrame:
    """Per-channel color histogram over REAL decoded pixels — the
    standard cheap visual-content feature (filter black/blank frames,
    bucket near-monochrome scans, stratify crawl images by palette).
    Decode (PIL when importable, else the pure decoders — including the
    4:2:0 JPEG path), bucket each channel value by v // (256/bins)
    (integer floor, exactly replayable), and emit each channel's counts
    as a comma-joined string (the driver-hashable scalar form; grayscale
    replicates its channel). Undecodable payloads yield NULLs, never a
    thrown batch. One narrow Arrow map; no shuffle."""
    if not 1 <= bins <= 256 or 256 % bins:
        raise ValueError(f"bins must divide 256, got {bins}")
    width = 256 // bins

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rs, gs, bs, ws, hs = [], [], [], [], []
            for p in pdf[content_col]:
                hr = hg = hb = w = h = None
                try:
                    w, h, samples = decode_image(bytes(p))
                    bpp = len(samples) // (w * h)
                    # interleaved layouts: 1=gray, 2=LA, 3=RGB, 4=RGBA —
                    # alpha is never histogrammed, and anything else is
                    # reported as undecodable rather than mis-binned as
                    # gray (r6 ADVICE item 2)
                    if bpp == 1:
                        chans = [samples] * 3
                    elif bpp == 2:
                        chans = [samples[0::2]] * 3
                    elif bpp == 3:
                        chans = [samples[c::3] for c in range(3)]
                    elif bpp == 4:
                        chans = [samples[c::4] for c in range(3)]
                    else:
                        raise ValueError(f"unsupported channel count {bpp}")
                    hists = []
                    for ch in chans:
                        counts = [0] * bins
                        for v in ch:
                            counts[v // width] += 1
                        hists.append(",".join(str(c) for c in counts))
                    hr, hg, hb = hists
                except Exception:
                    hr = hg = hb = w = h = None
                rs.append(hr)
                gs.append(hg)
                bs.append(hb)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "hist_r": rs, "hist_g": gs, "hist_b": bs,
            })

    return df.mapInPandas(
        compute,
        schema=("media_id bigint, width int, height int, "
                "hist_r string, hist_g string, hist_b string"),
    )


def synth_mp4(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Deterministic video-container synthesis: each payload becomes a
    real minimal MP4 whose duration (digest u32 % 3_600_000 ticks at
    timescale 600) and track count (digest byte 4 % 3 + 1) derive from
    the payload's md5 — a genuine box structure a real probe must walk,
    with every probed value replayable from md5(payload). Narrow
    Arrow-batched map; no shuffle."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                digest = hashlib.md5(bytes(p)).digest()
                duration = int.from_bytes(digest[:4], "big") % 3_600_000
                n_tracks = digest[4] % 3 + 1
                out.append(_mp4_min(600, duration, n_tracks))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


def mp4_header_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Per-payload MP4 movie metadata via the real box walker — narrow
    Arrow-batched map, no shuffle, pipelined behind the binary scan at
    any scale. NULLs for unrecognized payloads."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tss, durs, secs, trks, sizes = [], [], [], [], []
            for p in pdf[content_col]:
                raw = bytes(p)
                probed = probe_mp4_header(raw)
                ts = dur = sec = trk = None
                if probed is not None:
                    ts, dur, trk = probed
                    sec = None if dur is None else dur / ts
                tss.append(ts)
                durs.append(dur)
                secs.append(sec)
                trks.append(trk)
                sizes.append(len(raw))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "timescale": pd.array(tss, dtype="Int32"),
                "duration_ticks": pd.array(durs, dtype="Int64"),
                "duration_sec": pd.array(secs, dtype="float64"),
                "n_tracks": pd.array(trks, dtype="Int32"),
                "n_bytes": sizes,
            })

    return df.mapInPandas(compute, schema=MP4_SCHEMA)


# --- real GIF decode (LZW — a genuinely COMPRESSED public codec) -------------
#
# PNG's DEFLATE ships in zlib, so `decode_png` leans on the stdlib for the
# entropy coding. GIF's LZW does not — the codec below is implemented from
# the public specification (GIF87a/89a, CompuServe 1987/1990; variable-width
# codes 3..12 bits LSB-first, clear/end codes, deferred-clear tolerant), so
# this is a REAL compressed-bitstream decoder with zero codec libraries.
# `_gif_lzw_encode` is the matching real compressor (dictionary growth,
# width switching, table-full reset) used by `synth_gray_gif`; the
# encode→decode pair is property-tested for exact inversion. Reference
# analog: the image-observation media columns
# (jobs/load/observation_mapper.py:851-997).


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real GIF LZW compression of a palette-index stream. Emits variable
    width codes LSB-first: CLEAR, then dictionary-coded data (width grows
    when the just-added entry reaches ``1 << width``), CLEAR + reset when
    the table would exceed 4096 entries, END terminator."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_table() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = end + 1
    emit(clear)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            if next_code == 1 << width and width < 12:
                width += 1
            next_code += 1
        else:
            # table full: reset (decoder mirrors on CLEAR)
            emit(clear)
            width = min_code_size + 1
            table = fresh_table()
            next_code = end + 1
        w = bytes([k])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(
    data: bytes, min_code_size: int, max_out: int | None = None
) -> bytearray | None:
    """Real GIF LZW decompression — the exact inverse of
    ``_gif_lzw_encode`` and of any spec-conforming encoder, including
    deferred-clear streams (table frozen at 4096, width pinned at 12).
    Returns None on any malformed stream (never raises). ``max_out``
    stops decoding once that many indices exist: LZW expands up to
    ~2700× (4096-byte dictionary entries from 12-bit codes), so an
    unbounded decode of a hostile crawl payload is an executor-OOM
    bomb — callers that know the pixel count must pass it."""
    try:
        if not 2 <= min_code_size <= 8:
            return None
        clear = 1 << min_code_size
        end = clear + 1
        base = [bytes([i]) for i in range(clear)] + [None, None]
        table = list(base)
        width = min_code_size + 1
        out = bytearray()
        prev: bytes | None = None
        acc = 0
        nbits = 0
        i = 0
        n = len(data)
        while True:
            while nbits < width:
                if i >= n:
                    return out if prev is not None or out else None
                acc |= data[i] << nbits
                nbits += 8
                i += 1
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
                out += entry
                if max_out is not None and len(out) >= max_out:
                    return out
                prev = entry
                continue
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                return None
            out += entry
            if max_out is not None and len(out) >= max_out:
                return out
            if len(table) < 4096:
                table.append(prev + entry[:1])
                # the decoder runs one table entry BEHIND the encoder: the
                # encoder widens after ADDING value 1<<width, so the
                # decoder widens after adding value (1<<width)-1, i.e.
                # when len(table) reaches 1<<width (GIF89a appendix F)
                if len(table) == 1 << width and width < 12:
                    width += 1
            prev = entry
        return out
    except Exception:
        return None


def _gif_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal valid GIF87a from raw grayscale pixel bytes: logical
    screen descriptor, 256-entry identity grayscale global color table
    (index i → RGB(i,i,i)), one image descriptor, REAL LZW-compressed
    index stream in ≤255-byte sub-blocks, trailer. Any decoder reads it."""
    import struct

    lsd = struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    gct = bytes(v for i in range(256) for v in (i, i, i))
    idesc = struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    lzw = _gif_lzw_encode(pixels, 8)
    blocks = bytearray([8])  # LZW minimum code size
    for i in range(0, len(lzw), 255):
        part = lzw[i : i + 255]
        blocks.append(len(part))
        blocks.extend(part)
    blocks.append(0)
    return b"GIF87a" + lsd + gct + idesc + bytes(blocks) + b"\x3b"


def synth_gray_gif(
    df: DataFrame,
    content_col: str = "content",
    width: int = 4,
    height: int = 4,
) -> DataFrame:
    """Deterministic GIF synthesis: each payload becomes a real
    ``width``×``height`` grayscale GIF (true LZW compression through
    ``_gif_lzw_encode``) whose pixel bytes are the payload's md5 digest,
    tiled — same oracle-replayable contract as ``synth_gray_png`` but
    through a codec the stdlib does NOT ship. Narrow Arrow-batched map."""
    n_px = width * height

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                digest = hashlib.md5(bytes(p)).digest()
                pixels = (digest * (n_px // len(digest) + 1))[:n_px]
                out.append(_gif_gray(pixels, width, height))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> tuple[int, int, str, bytearray] | None:
    """REAL GIF decode (first frame): walk the container (header, screen
    descriptor, global/local color tables, 89a extension blocks), run the
    LZW decompressor, de-interlace when flagged, and map palette indices
    to samples — mode 'L' with one byte per pixel when the active palette
    is pure grayscale, else 'RGB' triples. Returns None for anything
    unrecognized or corrupt (crawl payloads are hostile; never raises)."""
    import struct

    try:
        if payload[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
        i = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = payload[i : i + 3 * n]
            if len(gct) < 3 * n:
                return None
            i += 3 * n
        n_bytes = len(payload)
        while i < n_bytes:
            b = payload[i]
            if b == 0x3B:  # trailer before any image
                return None
            if b == 0x21:  # extension: label + sub-blocks
                i += 2
                while i < n_bytes and payload[i] != 0:
                    i += 1 + payload[i]
                i += 1
                continue
            if b != 0x2C:
                return None
            _, left, top, w, h, ipacked = struct.unpack(
                "<BHHHHB", payload[i : i + 10]
            )
            i += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = payload[i : i + 3 * n]
                if len(pal) < 3 * n:
                    return None
                i += 3 * n
            if pal is None or w == 0 or h == 0:
                return None
            if w * h * 3 > MAX_DECODE_SAMPLES:
                return None  # header-claimed size: decode bomb
            mcs = payload[i]
            i += 1
            lzw = bytearray()
            while i < n_bytes and payload[i] != 0:
                blen = payload[i]
                lzw.extend(payload[i + 1 : i + 1 + blen])
                i += 1 + blen
            indices = _gif_lzw_decode(bytes(lzw), mcs, max_out=w * h)
            if indices is None or len(indices) < w * h:
                return None
            indices = indices[: w * h]
            if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                rows = [r for start, step in _GIF_INTERLACE_PASSES
                        for r in range(start, h, step)]
                deinter = bytearray(w * h)
                for src, dst in enumerate(rows):
                    deinter[dst * w : (dst + 1) * w] = indices[
                        src * w : (src + 1) * w
                    ]
                indices = deinter
            n_pal = len(pal) // 3
            if any(v >= n_pal for v in indices):
                return None
            gray = all(
                pal[3 * v] == pal[3 * v + 1] == pal[3 * v + 2]
                for v in set(indices)
            )
            if gray:
                return (w, h, "L", bytearray(pal[3 * v] for v in indices))
            out = bytearray()
            for v in indices:
                out.extend(pal[3 * v : 3 * v + 3])
            return (w, h, "RGB", out)
        return None
    except Exception:
        return None


def _wav_g711(codes: bytes, sample_rate: int, law: str = "ulaw") -> bytes:
    """Minimal valid mono G.711 WAV (format tag 7 = µ-law, 6 = A-law,
    8 bits/sample) from raw companded code bytes. Pure byte layout."""
    import struct

    tag = 7 if law == "ulaw" else 6
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(codes)) + codes
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_g711_wav(
    df: DataFrame,
    content_col: str = "content",
    sample_rate: int = 8000,
    law: str = "ulaw",
) -> DataFrame:
    """Deterministic telephony-audio synthesis: each payload becomes a
    real mono G.711 WAV whose 16 companded code bytes are the payload's
    md5 digest — a genuine µ-law/A-law stream a real expander must
    decode, yet every downstream statistic is a pure function of
    md5(payload) an oracle can replay through the public ITU expansion
    formula. Narrow Arrow-batched map; no shuffle."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                digest = hashlib.md5(bytes(p)).digest()
                out.append(_wav_g711(digest, sample_rate, law))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


# --- real IMA ADPCM decode (a LOSSY COMPRESSED audio codec) ------------------
#
# G.711 is companding, not compression; IMA/DVI ADPCM (WAV format tag
# 0x11) is a genuine 4:1 compressed codec — each 16-bit sample becomes a
# 4-bit nibble driving an adaptive step-size predictor. The tables and
# update rules below are the public IMA reference algorithm (IMA Digital
# Audio Focus and Technical Working Groups, 1992; the same tables every
# open decoder ships). Both directions are implemented, so the encoder
# exercises the decoder's full state machine.

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]

_IMA_INDEX_ADJUST = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibble(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One step of the IMA state machine: (new predictor, new index)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_ADJUST[nibble & 7]))
    return pred, index


def _ima_encode_nibble(sample: int, pred: int, index: int) -> int:
    """Quantize one sample against the current predictor/step."""
    step = _IMA_STEPS[index]
    delta = sample - pred
    nibble = 0
    if delta < 0:
        nibble = 8
        delta = -delta
    if delta >= step:
        nibble |= 4
        delta -= step
    if delta >= step >> 1:
        nibble |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nibble |= 1
    return nibble


def ima_adpcm_encode(samples: list[int], index: int = 0) -> bytes:
    """Mono IMA ADPCM block body: sample 0 seeds the predictor (block
    header), every later sample becomes one nibble (low nibble first,
    per the WAV convention). Returns header+nibbles; odd nibble counts
    pad with 0."""
    import struct

    if not samples:
        return b""
    pred = max(-32768, min(32767, int(samples[0])))
    out = bytearray(struct.pack("<hBB", pred, index, 0))
    nibbles = []
    for s in samples[1:]:
        n = _ima_encode_nibble(int(s), pred, index)
        pred, index = _ima_decode_nibble(n, pred, index)
        nibbles.append(n)
    if len(nibbles) % 2:
        nibbles.append(0)
    for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
        out.append(lo | (hi << 4))
    return bytes(out)


def ima_adpcm_decode_block(block: bytes, n_samples: int) -> list[int] | None:
    """Decode one mono IMA ADPCM block (4-byte header + nibbles) to
    ``n_samples`` linear samples. None on malformed input."""
    import struct

    try:
        if len(block) < 4 or n_samples < 1:
            return None
        pred, index, _rsv = struct.unpack("<hBB", block[:4])
        if index > 88:
            return None
        samples = [pred]
        body = block[4:]
        need = n_samples - 1
        if need > len(body) * 2:
            return None
        for i in range(need):
            b = body[i // 2]
            n = (b & 0x0F) if i % 2 == 0 else (b >> 4)
            pred, index = _ima_decode_nibble(n, pred, index)
            samples.append(pred)
        return samples
    except Exception:
        return None


def _wav_ima_adpcm(samples: list[int], sample_rate: int) -> bytes:
    """Minimal valid mono IMA ADPCM WAV (format tag 0x11): one block
    holding all samples, block_align sized to the data, fmt extension
    carrying samples-per-block. Pure byte layout."""
    import struct

    body_nib = (max(0, len(samples) - 1) + 1) // 2
    block_align = 4 + body_nib
    spb = len(samples)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate,
        sample_rate * block_align // max(1, spb), block_align, 4, 2, spb,
    )
    data = ima_adpcm_encode(samples)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_ima_wav(payload: bytes) -> tuple[int, int, list[int]] | None:
    """REAL compressed-audio decode: RIFF walk to an IMA ADPCM stream
    (format tag 0x11, mono, 4-bit) and run the adaptive-predictor state
    machine over each block. Returns (sample_rate, 1, samples) or None
    (never raises — crawl payloads are hostile)."""
    import struct

    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        i, n = 12, len(payload)
        fmt = None
        data = None
        while i + 8 <= n:
            cid = payload[i : i + 4]
            clen = int.from_bytes(payload[i + 4 : i + 8], "little")
            body = payload[i + 8 : i + 8 + clen]
            if cid == b"fmt " and clen >= 20:
                tag, ch, sr, _br, ba, bits, _cb, spb = struct.unpack(
                    "<HHIIHHHH", body[:20]
                )
                fmt = (tag, ch, sr, ba, bits, spb)
            elif cid == b"data":
                data = body
            i += 8 + clen + (clen & 1)
        if fmt is None or data is None:
            return None
        tag, ch, sr, ba, bits, spb = fmt
        if tag != 0x11 or ch != 1 or bits != 4 or sr <= 0 or ba < 5 or spb < 1:
            return None
        samples: list[int] = []
        for off in range(0, len(data) - 3, ba):
            block = data[off : off + ba]
            want = min(spb, 1 + (len(block) - 4) * 2)
            dec = ima_adpcm_decode_block(block, want)
            if dec is None:
                return None
            samples.extend(dec)
        if not samples:
            return None
        return (sr, 1, samples)
    except Exception:
        return None


def synth_ima_wav(
    df: DataFrame, content_col: str = "content", sample_rate: int = 8000
) -> DataFrame:
    """Deterministic compressed-audio synthesis: each payload's md5
    digest becomes 8 int16 samples, IMA-ADPCM-encoded FOR REAL into a
    mono tag-0x11 WAV — a genuine adaptive-predictor bitstream the
    decoder's full state machine must walk, yet the decoded (lossy)
    samples are a pure integer function of md5(payload) an oracle can
    replay step by step. Narrow Arrow-batched map; no shuffle."""
    import struct

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                digest = hashlib.md5(bytes(p)).digest()
                samples = list(struct.unpack("<8h", digest))
                out.append(_wav_ima_adpcm(samples, sample_rate))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


def probe_flac_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """(sample_rate, n_channels, bits_per_sample, total_samples) from a
    FLAC STREAMINFO block — the mandatory first metadata block after the
    'fLaC' magic (public format spec): bit-packed 20-bit sample rate,
    3-bit channels-1, 5-bit bits-1, 36-bit total samples. Header-only
    (never touches audio frames), None on anything unrecognized (never
    raises) — the ingest-time crawl filter for FLAC payloads."""
    try:
        if payload[:4] != b"fLaC" or len(payload) < 8 + 34:
            return None
        btype = payload[4] & 0x7F
        blen = int.from_bytes(payload[5:8], "big")
        if btype != 0 or blen < 34:  # STREAMINFO must come first
            return None
        si = payload[8 : 8 + 34]
        # bytes 10..17 hold rate(20) | chans(3) | bits(5) | total(36)
        packed = int.from_bytes(si[10:18], "big")
        total = packed & ((1 << 36) - 1)
        bits = ((packed >> 36) & 0x1F) + 1
        chans = ((packed >> 41) & 0x07) + 1
        rate = (packed >> 44) & ((1 << 20) - 1)
        if rate == 0:
            return None
        return (rate, chans, bits, total)
    except Exception:
        return None


def _flac_streaminfo(
    sample_rate: int, n_channels: int, bits: int, total_samples: int
) -> bytes:
    """Minimal valid FLAC header: magic + last-block STREAMINFO with the
    bit-packed audio parameters (min/max block/frame sizes and MD5 left
    zero — legal per spec for unknown). Pure byte layout."""
    packed = (
        (sample_rate & ((1 << 20) - 1)) << 44
        | ((n_channels - 1) & 0x07) << 41
        | ((bits - 1) & 0x1F) << 36
        | (total_samples & ((1 << 36) - 1))
    )
    si = bytes(10) + packed.to_bytes(8, "big") + bytes(16)
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si


def probe_ogg_header(payload: bytes) -> tuple[int, int, int] | None:
    """(version, header_type, n_segments) from an Ogg page header
    ('OggS' capture pattern, public RFC 3533 layout) — the container-
    level probe that classifies Ogg streams (Vorbis/Opus/Theora live in
    the packets) without reading packet data. None on anything
    unrecognized (never raises)."""
    try:
        if payload[:4] != b"OggS" or len(payload) < 27:
            return None
        version = payload[4]
        htype = payload[5]
        n_seg = payload[26]
        if version != 0:
            return None
        return (version, htype, n_seg)
    except Exception:
        return None


def synth_flac(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Deterministic FLAC-header synthesis: md5-derived audio parameters
    through the real bit-packing writer, so the probe's outputs replay
    from md5(payload). Narrow Arrow-batched map."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                d = hashlib.md5(bytes(p)).digest()
                rate = 8000 + int.from_bytes(d[0:2], "big") % 40000
                chans = d[2] % 8 + 1
                bits = d[3] % 25 + 8
                total = int.from_bytes(d[4:8], "big") % 10_000_000
                out.append(_flac_streaminfo(rate, chans, bits, total))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


# --- real AVI container demux (video frame extraction without a codec) -------


def _avi_container(frames: list[bytes], width: int = 16, height: int = 16,
                   fps: int = 5) -> bytes:
    """Minimal valid AVI (RIFF) holding ``frames`` as '00dc' video chunks
    inside the 'movi' LIST, with an avih main header carrying the frame
    count and dimensions. Pure byte layout per the public RIFF/AVI spec."""
    import struct

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(1, fps), 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack(
        "<I", 4 + len(chunk(b"avih", avih))
    ) + b"hdrl" + chunk(b"avih", avih)
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def demux_avi_frames(payload: bytes) -> list[bytes] | None:
    """REAL container-level video demux: walk the RIFF tree to the 'movi'
    LIST and return each frame chunk's bytes ('00dc'/'00db' compressed/
    uncompressed video, any stream number) in stream order — no codec
    needed, the 100 TB path for per-frame sampling/statistics before any
    decode. None for anything unrecognized (never raises)."""
    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
            return None
        frames: list[bytes] = []

        def walk(lo: int, hi: int) -> None:
            i = lo
            while i + 8 <= hi:
                tag = payload[i : i + 4]
                clen = int.from_bytes(payload[i + 4 : i + 8], "little")
                end = min(i + 8 + clen, hi)
                if tag == b"LIST":
                    ltype = payload[i + 8 : i + 12]
                    if ltype in (b"movi", b"rec "):
                        walk(i + 12, end)
                elif (len(tag) == 4 and tag[:2].isdigit()
                      and tag[2:4] in (b"dc", b"db")):
                    frames.append(payload[i + 8 : end])
                i = end + (clen & 1)

        walk(12, len(payload))
        return frames if frames else None
    except Exception:
        return None


def synth_avi(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Deterministic AVI synthesis: 1-4 frames (digest-derived count),
    each frame's bytes the md5 digest tiled to a digest-derived size —
    a genuine RIFF/AVI container the demuxer must walk, with every
    downstream frame statistic a pure function of md5(payload). Narrow
    Arrow-batched map."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                d = hashlib.md5(bytes(p)).digest()
                n = d[0] % 4 + 1
                frames = []
                for i in range(n):
                    size = d[i + 1] % 48 + 8
                    frames.append((d * (size // 16 + 1))[:size])
                out.append(_avi_container(frames))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


AVI_FRAME_SCHEMA = (
    "media_id bigint, frame_idx int, n_bytes int, byte_sum bigint"
)


def avi_frame_stats(df: DataFrame, content_col: str = "content",
                    every_n: int = 1) -> DataFrame:
    """Per-frame statistics via the REAL demuxer: one output row per
    sampled frame (every ``every_n``-th), with the frame's byte count and
    byte sum — the pre-decode video profiling pass. One narrow
    Arrow-batched multi-row mapInPandas stage; undecodable payloads
    contribute no rows (hostile-input contract)."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, sums = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf[content_col]):
                frames = demux_avi_frames(bytes(p))
                if frames is None:
                    continue
                for i in range(0, len(frames), max(1, every_n)):
                    ids.append(mid)
                    idxs.append(i)
                    sizes.append(len(frames[i]))
                    sums.append(sum(frames[i]))
            yield pd.DataFrame({
                "media_id": pd.array(ids, dtype="int64"),
                "frame_idx": pd.array(idxs, dtype="Int32"),
                "n_bytes": pd.array(sizes, dtype="Int32"),
                "byte_sum": pd.array(sums, dtype="Int64"),
            })

    return df.mapInPandas(compute, schema=AVI_FRAME_SCHEMA)


# --- real baseline JPEG decode (ITU T.81, no codec library) ------------------
#
# Implemented from the public JPEG specification (ITU T.81 / ISO 10918-1):
# marker parse, DQT/DHT table build (fully general — any valid Huffman
# spec, not just the Annex K defaults), SOF0 baseline sequential, entropy
# decode with byte unstuffing and restart markers, dequantize + inverse
# zigzag + separable float IDCT, level shift and clamp; 1-component
# grayscale (non-interleaved per A.2.2) and 3-component YCbCr at 4:4:4
# or any integer chroma subsampling (4:2:0/4:2:2/4:1:1/4:4:0, the MCU-
# interleaved A.2.3 walk + replication upsampling; BT.601 full-range
# conversion per T.871). Progressive (SOF2) routes to the dedicated
# Annex G multi-scan path below; arithmetic coding returns None —
# honestly unsupported rather than wrong.

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# the classic example luminance quantization table (T.81 Annex K.1) —
# quality-50 reference; Q[0,0] = 16
_JPEG_LUM_Q = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


def _dct_tables() -> tuple[list[float], list[list[float]]]:
    import math

    c = [math.sqrt(0.5)] + [1.0] * 7
    cos = [[math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
           for x in range(8)]
    return c, cos


_DCT_C, _DCT_COS = _dct_tables()

# numpy twins of the DCT tables for the vectorized kernels below:
# _DCT_A[u] = 0.5·c[u] (the scalar every term is scaled by), _DCT_COS_NP
# indexed [x, u] like the list-of-lists table.
_DCT_A = np.array([0.5 * c for c in _DCT_C], dtype=np.float64)
_DCT_COS_NP = np.array(_DCT_COS, dtype=np.float64)


def _idct_2d(coef: list[float]) -> list[float]:
    """Separable 8×8 inverse DCT-II (the T.81 reconstruction), float.

    Vectorized with numpy but BIT-IDENTICAL to the original pure-Python
    loops (r11, guide §4.2 — this kernel was 76% of decode_jpeg): the
    u/v accumulation runs sequentially exactly like the original
    left-fold ``sum()``, and each term keeps the same multiplication
    pairing ((0.5·c[u])·coef)·cos, so every IEEE-754 intermediate is the
    same number. Only the per-(y,x) scalar loops became 8×8 array ops.
    """
    A, cos = _DCT_A, _DCT_COS_NP
    z = np.asarray(coef, dtype=np.float64).reshape(8, 8)
    # terms[u, y, x] = (coef[y,u]·A[u])·cos[x,u]; accumulate over u
    # sequentially from a zero start so every add matches sum()'s fold
    terms = (z * A).T[:, :, None] * cos.T[:, None, :]
    tmp = np.zeros((8, 8))
    for u in range(8):          # rows: over u, sequential like sum()
        tmp += terms[u]
    # terms2[v, y, x] = cos[y,v]·(tmp[v,x]·A[v])
    terms2 = cos.T[:, :, None] * (tmp * A[:, None])[:, None, :]
    out = np.zeros((8, 8))
    for v in range(8):          # cols: over v
        out += terms2[v]
    return out.reshape(64).tolist()


def _fdct_2d(block: list[float]) -> list[float]:
    """Separable 8×8 forward DCT-II (encoder side), float.

    Vectorized with numpy, bit-identical to the original loops (see
    _idct_2d): the original multiplies the x/y left-fold ``sum()`` by
    0.5·c AFTER summing, so here the accumulation runs first and the
    A-scale is applied to the finished sum, preserving every rounding.
    """
    A, cos = _DCT_A, _DCT_COS_NP
    b = np.asarray(block, dtype=np.float64).reshape(8, 8)
    # terms[x, y, u] = block[y,x]·cos[x,u]; Σ_x then scale by A[u]
    terms = b.T[:, :, None] * cos[:, None, :]
    acc = np.zeros((8, 8))
    for x in range(8):          # tmp[y,u] = A[u] · Σ_x block[y,x]·cos[x,u]
        acc += terms[x]
    tmp = acc * A[np.newaxis, :]
    # terms2[y, v, u] = cos[y,v]·tmp[y,u]; Σ_y then scale by A[v]
    terms2 = cos[:, :, None] * tmp[:, None, :]
    acc2 = np.zeros((8, 8))
    for y in range(8):          # out[v,u] = A[v] · Σ_y tmp[y,u]·cos[y,v]
        acc2 += terms2[y]
    out = acc2 * A[:, np.newaxis]
    return out.reshape(64).tolist()


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; surfaces restart markers; raises ValueError on overrun
    or unexpected markers (caller converts to None)."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.i = start
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.i >= len(d):
            raise ValueError("entropy data overrun")
        b = d[self.i]
        self.i += 1
        if b == 0xFF:
            if self.i < len(d) and d[self.i] == 0x00:
                self.i += 1          # stuffed byte
            else:
                raise ValueError("marker inside entropy data")
        # keep only unread bits: an unmasked accumulator grows with the
        # whole scan and turns every shift into bignum work (quadratic
        # total cost on megabyte entropy segments)
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if self.i + 1 < len(d) and d[self.i] == 0xFF and 0xD0 <= d[self.i + 1] <= 0xD7:
            self.i += 2
        else:
            raise ValueError("expected restart marker")


def _huff_table(counts: list[int], symbols: list[int]) -> dict:
    """Canonical Huffman (T.81 C.2): {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s extra bits to a signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_assemble(planes: list[bytearray], w: int, h: int,
                   stride: int):
    """Crop padded component planes to the image and convert — shared by
    the baseline and progressive paths so the T.871 YCbCr constants and
    rounding live in exactly one place."""
    if len(planes) == 1:
        out = bytearray(w * h)
        for y in range(h):
            out[y * w : (y + 1) * w] = planes[0][
                y * stride : y * stride + w
            ]
        return (w, h, "L", out)
    # Vectorized T.871 conversion (r11, guide §4.2 — this per-pixel loop
    # was 40% of decode_jpeg after the IDCT fix), value-identical to the
    # original scalar loop: same float64 expression pairing, int(v+0.5)
    # truncation replayed as trunc-then-clip (trunc yields integer-valued
    # floats, so clipping before or after the int cast is the same).
    def _crop(p):
        return np.frombuffer(p, dtype=np.uint8).reshape(-1, stride)[:h, :w]

    yy = _crop(planes[0]).astype(np.float64)
    cb = _crop(planes[1]).astype(np.float64) - 128.0
    cr = _crop(planes[2]).astype(np.float64) - 128.0
    rgb = np.empty((h, w, 3), dtype=np.float64)
    rgb[:, :, 0] = yy + 1.402 * cr
    rgb[:, :, 1] = (yy - 0.344136 * cb) - 0.714136 * cr
    rgb[:, :, 2] = yy + 1.772 * cb
    out = bytearray(
        np.clip(np.trunc(rgb + 0.5), 0, 255).astype(np.uint8).tobytes()
    )
    return (w, h, "RGB", out)


def _jpeg_upsample_assemble(
    planes: list[bytearray], comps, w: int, h: int,
    mcx: int, mcy: int, hmax: int, vmax: int, strides: list[int],
):
    """Replication-upsample subsampled component planes to the full
    sampling grid and assemble to 'L'/'RGB' — shared by the baseline and
    progressive decoders. ``comps`` rows are (cid, hf, vf, tq); plane
    ``ci`` is on the padded MCU grid with row stride ``strides[ci]``.
    Chroma upsampling is sample replication (JFIF nearest-neighbor;
    T.871 allows any filter — for constant-block oracle content every
    filter reconstructs identically)."""
    full_stride = mcx * hmax * 8
    full = []
    for ci, (_cid, hf, vf, _tq) in enumerate(comps):
        if hf == hmax and vf == vmax:
            full.append(planes[ci])
            continue
        fx, fy = hmax // hf, vmax // vf
        up = bytearray(full_stride * mcy * vmax * 8)
        src, sstride = planes[ci], strides[ci]
        # replication upsample as one fancy-indexed gather (r11 §4.2);
        # identical index arithmetic to the original per-pixel loop
        ylim = min(h, mcy * vmax * 8)
        xlim = min(w, full_stride)
        sa = np.frombuffer(src, dtype=np.uint8).reshape(-1, sstride)
        ua = np.frombuffer(up, dtype=np.uint8).reshape(-1, full_stride)
        rows = np.arange(ylim) // fy
        cols = np.arange(xlim) // fx
        ua[:ylim, :xlim] = sa[rows][:, cols]
        full.append(up)
    return _jpeg_assemble(full, w, h, full_stride)


def decode_jpeg(payload: bytes):
    """REAL baseline JPEG decode → (width, height, mode, samples) with
    samples the raw channel bytes in scan order ('L' or 'RGB'), or None
    for anything unsupported (arithmetic, >8-bit, non-integer sampling
    ratios) or corrupt — never raises. Chroma-subsampled frames (4:2:0,
    4:2:2, 4:1:1, 4:4:0) decode via the MCU-interleaved T.81 A.2.3 walk
    with replication upsampling; single-component scans decode
    non-interleaved per A.2.2. Progressive (SOF2) frames dispatch to
    the Annex G multi-scan decoder (same subsampling envelope)."""
    try:
        d = payload
        if d[:2] != b"\xff\xd8":
            return None
        i = 2
        qt: dict[int, list[int]] = {}
        huff_dc: dict[int, dict] = {}
        huff_ac: dict[int, dict] = {}
        sof = None
        dri = 0
        while i + 4 <= len(d):
            if d[i] != 0xFF:
                return None
            marker = d[i + 1]
            if marker == 0xD9:
                return None          # EOI before SOS
            seg_len = int.from_bytes(d[i + 2 : i + 4], "big")
            body = d[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:       # DQT
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 0x0F
                    j += 1
                    if pq != 0:
                        return None  # 16-bit tables: not baseline
                    qt[tq] = list(body[j : j + 64])
                    j += 64
            elif marker == 0xC4:     # DHT
                j = 0
                while j < len(body):
                    tc, th = body[j] >> 4, body[j] & 0x0F
                    counts = list(body[j + 1 : j + 17])
                    n = sum(counts)
                    syms = list(body[j + 17 : j + 17 + n])
                    (huff_dc if tc == 0 else huff_ac)[th] = _huff_table(
                        counts, syms
                    )
                    j += 17 + n
            elif marker == 0xC0:     # SOF0 baseline
                prec = body[0]
                h = int.from_bytes(body[1:3], "big")
                w = int.from_bytes(body[3:5], "big")
                nc = body[5]
                if prec != 8 or nc not in (1, 3) or w == 0 or h == 0:
                    return None
                if w * h * nc > MAX_DECODE_SAMPLES:
                    return None  # header-claimed size: decode bomb
                comps = []
                for k in range(nc):
                    cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                    hf, vf = hv >> 4, hv & 0x0F
                    if not (1 <= hf <= 4 and 1 <= vf <= 4):
                        return None
                    comps.append((cid, hf, vf, tq))
                # only integer downsampling ratios (the real-world set:
                # 4:4:4, 4:2:2, 4:2:0, 4:1:1, 4:4:0) — a 3:2-style
                # ratio would need fractional resampling nobody emits
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if any(hmax % c[1] or vmax % c[2] for c in comps):
                    return None
                if nc == 1:
                    # T.81 A.2.2: a single-component scan is NON-
                    # interleaved — MCU = 1 data unit in raster order
                    # over ceil(w/8) x ceil(h/8), its sampling factors
                    # notwithstanding (e.g. `jpegtran -grayscale` keeps
                    # the source's 2x2 Y factors). Walking it with the
                    # interleaved A.2.3 grid would silently permute
                    # blocks; normalizing to 1x1 yields exactly the
                    # non-interleaved order.
                    comps = [(comps[0][0], 1, 1, comps[0][3])]
                    hmax = vmax = 1
                sof = (w, h, comps, hmax, vmax)
            elif marker == 0xC2:     # progressive: dedicated multi-scan path
                return _decode_jpeg_progressive(d)
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None          # other non-baseline frame types
            elif marker == 0xDD:     # DRI
                dri = int.from_bytes(body[0:2], "big")
            elif marker == 0xDA:     # SOS
                if sof is None:
                    return None
                ns = body[0]
                scan = []
                for k in range(ns):
                    cs, tdta = body[1 + 2 * k : 3 + 2 * k]
                    scan.append((cs, tdta >> 4, tdta & 0x0F))
                w, h, comps, hmax, vmax = sof
                if ns != len(comps):
                    return None      # single interleaved scan only
                reader = _JpegBitReader(d, i + 2 + seg_len)
                # MCU grid: each MCU spans 8*hmax x 8*vmax image pixels
                # and carries h_i*v_i blocks of component i (T.81 A.2.3)
                mcx = (w + 8 * hmax - 1) // (8 * hmax)
                mcy = (h + 8 * vmax - 1) // (8 * vmax)
                # padded plane bytes: bounded by the header-size check
                # above times a small constant (<= 4x from MCU rounding)
                if sum(mcx * c[1] * mcy * c[2] for c in comps) * 64 \
                        > 4 * MAX_DECODE_SAMPLES:
                    return None
                strides = [mcx * c[1] * 8 for c in comps]
                planes = [
                    bytearray(strides[ci] * mcy * c[2] * 8)
                    for ci, c in enumerate(comps)
                ]
                pred = [0] * len(comps)
                mcu = 0
                for my in range(mcy):
                    for mx in range(mcx):
                        if dri and mcu and mcu % dri == 0:
                            reader.align_restart()
                            pred = [0] * len(comps)
                        mcu += 1
                        for ci, (cid, hf, vf, tq) in enumerate(comps):
                            _cs, td, ta = scan[ci]
                            q = qt.get(tq)
                            dc_t = huff_dc.get(td)
                            ac_t = huff_ac.get(ta)
                            if q is None or dc_t is None or ac_t is None:
                                return None
                            for vb in range(vf):
                                for hb in range(hf):
                                    coef = [0.0] * 64
                                    s = _huff_decode(reader, dc_t)
                                    diff = (
                                        _extend(reader.bits(s), s) if s else 0
                                    )
                                    pred[ci] += diff
                                    coef[0] = pred[ci] * q[0]
                                    k = 1
                                    while k < 64:
                                        rs = _huff_decode(reader, ac_t)
                                        r, s = rs >> 4, rs & 0x0F
                                        if s == 0:
                                            if r == 15:
                                                k += 16     # ZRL
                                                continue
                                            break           # EOB
                                        k += r
                                        if k > 63:
                                            return None
                                        coef[_JPEG_ZIGZAG[k]] = (
                                            _extend(reader.bits(s), s) * q[k]
                                        )
                                        k += 1
                                    px = _idct_2d(coef)
                                    plane = planes[ci]
                                    stride = strides[ci]
                                    by = my * vf + vb
                                    bx = mx * hf + hb
                                    for y in range(8):
                                        base = (by * 8 + y) * stride + bx * 8
                                        for x in range(8):
                                            v = int(px[y * 8 + x] + 128.5)
                                            plane[base + x] = (
                                                0 if v < 0
                                                else 255 if v > 255 else v
                                            )
                return _jpeg_upsample_assemble(
                    planes, comps, w, h, mcx, mcy, hmax, vmax, strides
                )
            i += 2 + seg_len
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                i = i - seg_len      # standalone markers have no body
        return None
    except Exception:
        return None


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF byte stuffing; 1-fill padding at
    flush (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)
        return bytes(self.out)


def _jpeg_category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def encode_jpeg_gray(pixels: bytes, width: int, height: int) -> bytes:
    """REAL baseline JPEG encoder for grayscale: level shift, 8×8 forward
    DCT, quantization against the Annex K.1 luminance table (floor(x/Q +
    0.5) symmetric-half-up on the DC so oracles can replay it), zigzag
    run-length, canonical Huffman with simple self-declared tables (DC:
    twelve 4-bit codes; AC: every (run,size) symbol at 9 bits — written
    into DHT, so ANY spec-conforming decoder reads the stream). Edge
    blocks replicate the last row/column (the standard padding)."""
    import struct

    q = _JPEG_LUM_Q
    # canonical tables: DC sym s -> code s (4 bits); AC sym -> index (9 bits)
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_counts = [0] * 16
    ac_counts[8] = len(ac_syms)      # all codes 9 bits long
    dc_code = {s: (i, 4) for i, s in enumerate(dc_syms)}
    ac_code = {s: (i, 9) for i, s in enumerate(ac_syms)}

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes(q))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", height, width)
              + bytes([1, 1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(dc_counts[:16]) + bytes(dc_syms)
              + bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    wtr = _JpegBitWriter()
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            block = []
            for y in range(8):
                sy = min(by * 8 + y, height - 1)
                for x in range(8):
                    sx = min(bx * 8 + x, width - 1)
                    block.append(float(pixels[sy * width + sx]) - 128.0)
            pred = _jpeg_encode_block(wtr, block, q, pred, dc_code, ac_code)
    return (b"\xff\xd8" + dqt + sof + dht + sos + wtr.flush() + b"\xff\xd9")


def _jpeg_encode_block(wtr, block, q, pred, dc_code, ac_code) -> int:
    """Forward-DCT + quantize + entropy-code ONE 8x8 block (level-shifted
    float samples) and return the new DC predictor — the shared kernel of
    the grayscale and interleaved-color encoders."""
    import math

    coef = _fdct_2d(block)
    zz = [0] * 64
    for k in range(64):
        # kill the ~1e-13 float-DCT noise before the half-up
        # quantization (see encode_jpeg_gray)
        zz[k] = math.floor(round(coef[_JPEG_ZIGZAG[k]], 6) / q[k] + 0.5)
    diff = zz[0] - pred
    s = _jpeg_category(diff)
    c, ln = dc_code[s]
    wtr.put(c, ln)
    if s:
        wtr.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_code[0xF0]
            wtr.put(c, ln)
            run -= 16
        s = _jpeg_category(v)
        c, ln = ac_code[(run << 4) | s]
        wtr.put(c, ln)
        wtr.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_code[0x00]
        wtr.put(c, ln)
    return zz[0]


def encode_jpeg_color(
    y: bytes, cb: bytes, cr: bytes, width: int, height: int,
    sampling: str = "4:2:0",
) -> bytes:
    """REAL baseline color JPEG encoder with chroma subsampling — the
    synth twin for the subsampled `decode_jpeg` path. ``y`` is the
    full-resolution luma plane; ``cb``/``cr`` are ALREADY at chroma
    resolution (w/2 x h/2 for 4:2:0, w/2 x h for 4:2:2, w x h for
    4:4:4). One shared K.1 quant table and one canonical DC/AC Huffman
    pair serve all three components; blocks are written in T.81 A.2.3
    MCU-interleaved order (4:2:0 = YYYYCbCr per MCU). Edge blocks
    replicate the last row/column per component plane."""
    import struct

    factors = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}
    if sampling not in factors:
        raise ValueError(f"unknown sampling {sampling!r}")
    yh, yv = factors[sampling]
    cw = (width + yh - 1) // yh
    ch = (height + yv - 1) // yv
    if len(y) != width * height or len(cb) != cw * ch or len(cr) != cw * ch:
        raise ValueError("plane size mismatch")
    q = _JPEG_LUM_Q
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_counts = [0] * 16
    ac_counts[8] = len(ac_syms)
    dc_code = {s: (i, 4) for i, s in enumerate(dc_syms)}
    ac_code = {s: (i, 9) for i, s in enumerate(ac_syms)}

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes(q))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", height, width)
              + bytes([3,
                       1, (yh << 4) | yv, 0,
                       2, 0x11, 0,
                       3, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(dc_counts[:16]) + bytes(dc_syms)
              + bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    def block_at(plane, pw, ph, by, bx):
        blk = []
        for yy in range(8):
            sy = min(by * 8 + yy, ph - 1)
            for xx in range(8):
                sx = min(bx * 8 + xx, pw - 1)
                blk.append(float(plane[sy * pw + sx]) - 128.0)
        return blk

    wtr = _JpegBitWriter()
    mcx = (width + 8 * yh - 1) // (8 * yh)
    mcy = (height + 8 * yv - 1) // (8 * yv)
    pred = [0, 0, 0]
    for my in range(mcy):
        for mx in range(mcx):
            for vb in range(yv):
                for hb in range(yh):
                    pred[0] = _jpeg_encode_block(
                        wtr, block_at(y, width, height,
                                      my * yv + vb, mx * yh + hb),
                        q, pred[0], dc_code, ac_code)
            pred[1] = _jpeg_encode_block(
                wtr, block_at(cb, cw, ch, my, mx), q, pred[1],
                dc_code, ac_code)
            pred[2] = _jpeg_encode_block(
                wtr, block_at(cr, cw, ch, my, mx), q, pred[2],
                dc_code, ac_code)
    return b"\xff\xd8" + dqt + sof + dht + sos + wtr.flush() + b"\xff\xd9"


def synth_color_jpeg_subsampled(
    df: DataFrame,
    content_col: str = "content",
    sampling: str = "4:2:0",
    progressive: bool = False,
) -> DataFrame:
    """Deterministic 4:2:0 (or 4:2:2) color JPEG synthesis: a 32x16 image
    whose eight 8x8 luma blocks are constant at digest bytes 0-7 and
    whose chroma blocks (one Cb + one Cr per MCU under 4:2:0 — 2 MCUs
    across) are constant at digest bytes 8-9 (Cb) / 10-11 (Cr), pushed
    through the REAL interleaved encoder. Constant blocks reconstruct
    integer-exactly — c' = clamp(2*floor((8(b-128))/16 + 0.5) + 128) per
    component, replication upsampling preserves constants, and the T.871
    RGB conversion is closed-form — so a DuckDB oracle replays the
    decoded pixels from md5(payload) while the decoder exercises the
    full MCU-interleaved subsampled path. Narrow Arrow-batched map."""
    if sampling != "4:2:0":
        raise ValueError("registered synth pins 4:2:0; use encode_jpeg_color"
                         " directly for other samplings")
    w, h = 32, 16

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                d = hashlib.md5(bytes(p)).digest()
                y = bytearray(w * h)
                for by in range(2):
                    for bx in range(4):
                        b = d[by * 4 + bx]
                        for yy in range(8):
                            base = (by * 8 + yy) * w + bx * 8
                            y[base : base + 8] = bytes([b]) * 8
                cw, chh = w // 2, h // 2
                cbp = bytearray(cw * chh)
                crp = bytearray(cw * chh)
                for m in range(2):          # MCU column m covers x in [16m,16m+16)
                    for yy in range(chh):
                        base = yy * cw + m * 8
                        cbp[base : base + 8] = bytes([d[8 + m]]) * 8
                        crp[base : base + 8] = bytes([d[10 + m]]) * 8
                enc = (encode_jpeg_color_progressive if progressive
                       else encode_jpeg_color)
                out.append(enc(
                    bytes(y), bytes(cbp), bytes(crp), w, h, sampling))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


def synth_gray_jpeg(
    df: DataFrame,
    content_col: str = "content",
    blocks_w: int = 4,
    blocks_h: int = 2,
    progressive: bool = False,
) -> DataFrame:
    """Deterministic JPEG synthesis: a 32×16 grayscale image of eight 8×8
    blocks, block i constant at digest byte i, pushed through the REAL
    encoder (DCT → quantize → Huffman; the baseline single-scan form, or
    the six-scan progressive form when ``progressive``). Constant blocks
    make the reconstruction integer-exact — pixel = clamp(2·floor((8(b−
    128))/16 + 0.5) + 128), identical for both encodings since they carry
    the same quantized coefficients — so an oracle replays the decoded
    image from md5(payload) while the decoder still exercises the full
    marker/Huffman/IDCT machinery. Narrow Arrow-batched map."""
    w = blocks_w * 8
    h = blocks_h * 8
    enc = encode_jpeg_gray_progressive if progressive else encode_jpeg_gray

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                d = hashlib.md5(bytes(p)).digest()
                px = bytearray(w * h)
                for by in range(blocks_h):
                    for bx in range(blocks_w):
                        b = d[(by * blocks_w + bx) % 16]
                        for y in range(8):
                            base = (by * 8 + y) * w + bx * 8
                            px[base : base + 8] = bytes([b]) * 8
                out.append(enc(bytes(px), w, h))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


# --- real PROGRESSIVE JPEG decode (ITU T.81 Annex G, Huffman) ---------------
#
# Progressive frames deliver DCT coefficients across multiple scans:
# spectral selection (each scan carries a zigzag band [Ss..Se]) and
# successive approximation (first pass at reduced precision Al, then
# one-bit refinement passes with Ah = previous Al). Implemented from the
# public spec: per-component coefficient accumulation, DC first/refine
# (interleaved allowed), AC first/refine (single-component scans) with
# EOBn end-of-band run codes and ZRL over zero-HISTORY positions,
# table redefinition between scans, restart intervals, then one
# dequantize + IDCT reconstruction over the accumulated coefficients.


def _jpeg_ac_first(reader, table, zz, ss, se, al, eobrun) -> int:
    """One block of an AC first scan (T.81 G.1.2.2): EOBRUN counts
    blocks (including the current one) whose band is finished."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16              # ZRL
                continue
            eobrun = (1 << r) + (reader.bits(r) if r else 0)
            return eobrun - 1        # covers this block
        k += r
        if k > se:
            raise ValueError("AC index overrun")
        zz[k] = _extend(reader.bits(s), s) * (1 << al)
        k += 1
    return 0


def _jpeg_ac_refine(reader, table, zz, ss, se, al, eobrun) -> int:
    """One block of an AC refinement scan (T.81 G.1.2.3): newly-nonzero
    coefficients arrive as (run,1) codes + sign, already-nonzero ones
    take one correction bit each as the scan passes them, and runs/ZRL
    count only zero-history positions."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, table)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + (reader.bits(r) if r else 0)
                    break            # remaining positions refined below
                val = 0              # ZRL: 16 zero-history skips
            else:
                if s != 1:
                    raise ValueError("bad refinement size")
                val = p1 if reader.bit() else m1
            while k <= se:
                if zz[k] != 0:
                    if reader.bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:               # corrections for the covered block
            if zz[k] != 0:
                if reader.bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


_JPEG_ZERO_BLOCK = [0] * 64          # shared read-only pad block

# EOBn ceiling (T.81: r <= 14 -> max run 32767). Module-level so tests
# can shrink it to exercise the chunk-boundary flush cheaply.
_JPEG_EOB_RUN_CAP = 32767


def _jpeg_blk(blocks: list, m: int) -> list[int]:
    """Lazily grow a component's coefficient plane to block m: memory
    tracks the highest block index a scan actually reaches, not the
    header-claimed frame size. Access may be NON-monotonic (the
    subsampled interleaved DC walk revisits lower indices across MCU
    columns), so growth fills with fresh zero blocks and any earlier
    index stays addressable — do not replace this with a
    streaming/append-only structure."""
    while len(blocks) <= m:
        blocks.append([0] * 64)
    return blocks[m]


def _decode_jpeg_progressive(d: bytes):
    """Full progressive decode: multi-scan marker walk accumulating
    coefficients, then dequantize + IDCT. Same support envelope as the
    baseline path (8-bit, 1 or 3 components, integer sampling ratios
    incl. 4:2:0/4:2:2 chroma subsampling); None for anything else or
    corrupt — never raises.

    Grids per T.81: DC scans with ns>1 walk the MCU-interleaved A.2.3
    grid (h_i*v_i blocks of component i per MCU); every single-component
    scan (all AC scans, and DC scans of 1-component frames) walks that
    component's OWN block grid ceil(cw_i/8) x ceil(ch_i/8) in raster
    order (A.2.2). Coefficients are stored on the padded interleaved
    grid (stride mcx*h_i) so both walks address one plane."""
    try:
        i = 2
        qt: dict[int, list[int]] = {}
        huff_dc: dict[int, dict] = {}
        huff_ac: dict[int, dict] = {}
        sof = None
        dri = 0
        coefs = None
        # per-component grids: padded interleaved storage (pbw/pbh) and
        # actual non-interleaved walk (cbw/cbh)
        pbw = pbh = cbw = cbh = None
        mcx = mcy = 0
        while i + 2 <= len(d):
            if d[i] != 0xFF:
                return None
            marker = d[i + 1]
            if marker == 0xD9:
                break                # EOI
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(d[i + 2 : i + 4], "big")
            body = d[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:       # DQT (may appear between scans)
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 0x0F
                    j += 1
                    if pq != 0:
                        return None
                    qt[tq] = list(body[j : j + 64])
                    j += 64
            elif marker == 0xC4:     # DHT (may be redefined between scans)
                j = 0
                while j < len(body):
                    tc, th = body[j] >> 4, body[j] & 0x0F
                    counts = list(body[j + 1 : j + 17])
                    n = sum(counts)
                    syms = list(body[j + 17 : j + 17 + n])
                    (huff_dc if tc == 0 else huff_ac)[th] = _huff_table(
                        counts, syms
                    )
                    j += 17 + n
            elif marker == 0xC2:     # SOF2
                prec = body[0]
                h = int.from_bytes(body[1:3], "big")
                w = int.from_bytes(body[3:5], "big")
                nc = body[5]
                if prec != 8 or nc not in (1, 3) or w == 0 or h == 0:
                    return None
                if w * h * nc > MAX_DECODE_SAMPLES:
                    return None      # header-claimed size: decode bomb
                comps = []
                for k in range(nc):
                    cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                    hf, vf = hv >> 4, hv & 0x0F
                    if not (1 <= hf <= 4 and 1 <= vf <= 4):
                        return None
                    comps.append((cid, hf, vf, tq))
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if any(hmax % c[1] or vmax % c[2] for c in comps):
                    return None      # non-integer ratio: nobody emits
                if nc == 1:
                    # T.81 A.2.2: single-component frames are always
                    # non-interleaved; factors don't shape the walk
                    comps = [(comps[0][0], 1, 1, comps[0][3])]
                    hmax = vmax = 1
                sof = (w, h, comps, hmax, vmax)
                mcx = (w + 8 * hmax - 1) // (8 * hmax)
                mcy = (h + 8 * vmax - 1) // (8 * vmax)
                pbw = [mcx * c[1] for c in comps]
                pbh = [mcy * c[2] for c in comps]
                cbw = [
                    ((w * c[1] + hmax - 1) // hmax + 7) // 8
                    for c in comps
                ]
                cbh = [
                    ((h * c[2] + vmax - 1) // vmax + 7) // 8
                    for c in comps
                ]
                if sum(a * b for a, b in zip(pbw, pbh)) > 8 * len(d):
                    return None      # every block needs ≥1 bit per scan
                # grown lazily (see _jpeg_blk): a 17-byte payload whose
                # SOF2 claims 8192×8192 must not allocate the ~700 MB
                # coefficient plane before its first scan overruns
                coefs = [[] for _ in comps]
            elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None
            elif marker == 0xDD:     # DRI
                dri = int.from_bytes(body[0:2], "big")
            elif marker == 0xDA:     # SOS: one progressive scan
                if sof is None:
                    return None
                w, h, comps, hmax, vmax = sof
                ns = body[0]
                scomp = []
                for k in range(ns):
                    cs, t = body[1 + 2 * k : 3 + 2 * k]
                    ci = next(
                        (j for j, c in enumerate(comps) if c[0] == cs),
                        None,
                    )
                    if ci is None:
                        return None
                    scomp.append((ci, t >> 4, t & 0x0F))
                ss = body[1 + 2 * ns]
                se = body[2 + 2 * ns]
                a = body[3 + 2 * ns]
                ah, al = a >> 4, a & 0x0F
                reader = _JpegBitReader(d, i + 2 + seg_len)
                eobrun = 0
                if ss == 0 and ns > 1:   # interleaved DC scan
                    if se != 0:
                        return None
                    pred = [0] * len(scomp)
                    for m in range(mcx * mcy):
                        if dri and m and m % dri == 0:
                            reader.align_restart()
                            pred = [0] * len(scomp)
                        my, mx = divmod(m, mcx)
                        for si, (ci, td, _ta) in enumerate(scomp):
                            _cid, hf, vf, _tq = comps[ci]
                            for vb in range(vf):
                                for hb in range(hf):
                                    zz = _jpeg_blk(
                                        coefs[ci],
                                        (my * vf + vb) * pbw[ci]
                                        + mx * hf + hb,
                                    )
                                    if ah == 0:
                                        t = huff_dc.get(td)
                                        if t is None:
                                            return None
                                        s = _huff_decode(reader, t)
                                        diff = (
                                            _extend(reader.bits(s), s)
                                            if s else 0
                                        )
                                        pred[si] += diff
                                        zz[0] = pred[si] << al
                                    else:
                                        zz[0] |= reader.bit() << al
                elif ss == 0:            # non-interleaved DC scan
                    if se != 0:
                        return None
                    ci, td, _ta = scomp[0]
                    pred0 = 0
                    for m in range(cbw[ci] * cbh[ci]):
                        if dri and m and m % dri == 0:
                            reader.align_restart()
                            pred0 = 0
                        row, col = divmod(m, cbw[ci])
                        zz = _jpeg_blk(coefs[ci], row * pbw[ci] + col)
                        if ah == 0:
                            t = huff_dc.get(td)
                            if t is None:
                                return None
                            s = _huff_decode(reader, t)
                            diff = _extend(reader.bits(s), s) if s else 0
                            pred0 += diff
                            zz[0] = pred0 << al
                        else:
                            zz[0] |= reader.bit() << al
                else:                # AC scan: single component only
                    if len(scomp) != 1 or se > 63 or ss > se:
                        return None
                    ci, _td, ta = scomp[0]
                    t = huff_ac.get(ta)
                    if t is None:
                        return None
                    step = _jpeg_ac_refine if ah else _jpeg_ac_first
                    for m in range(cbw[ci] * cbh[ci]):
                        if dri and m and m % dri == 0:
                            reader.align_restart()
                            eobrun = 0
                        row, col = divmod(m, cbw[ci])
                        eobrun = step(
                            reader, t,
                            _jpeg_blk(coefs[ci], row * pbw[ci] + col),
                            ss, se, al, eobrun
                        )
                # skip to the next true marker (RSTs/stuffing pass by)
                j = reader.i
                while j + 1 < len(d):
                    if (d[j] == 0xFF and d[j + 1] != 0x00
                            and not 0xD0 <= d[j + 1] <= 0xD7):
                        break
                    j += 1
                i = j
                continue
            i += 2 + seg_len
        if sof is None or coefs is None:
            return None
        w, h, comps, hmax, vmax = sof
        # final plane allocation: mirror the baseline's bomb ceiling
        if sum(a * b for a, b in zip(pbw, pbh)) * 64 \
                > 4 * MAX_DECODE_SAMPLES:
            return None
        planes = []
        strides = []
        for ci, (_cid, _hf, _vf, tq) in enumerate(comps):
            q = qt.get(tq)
            if q is None:
                return None
            if not coefs[ci]:
                return None          # a component no scan ever touched
            # blocks never reached by any scan decode as all-zero
            while len(coefs[ci]) < pbw[ci] * pbh[ci]:
                coefs[ci].append(_JPEG_ZERO_BLOCK)
            stride = pbw[ci] * 8
            plane = bytearray(b"\x80" * (stride * pbh[ci] * 8))
            for bi, zz in enumerate(coefs[ci]):
                if not any(zz):
                    continue         # all-zero block IDCTs to flat 128:
                                     # skip the O(8^3) work (also the
                                     # no-scan CPU-bomb vector)
                by, bx = divmod(bi, pbw[ci])
                coef = [0.0] * 64
                for k in range(64):
                    coef[_JPEG_ZIGZAG[k]] = zz[k] * q[k]
                px = _idct_2d(coef)
                for y in range(8):
                    base = (by * 8 + y) * stride + bx * 8
                    for x in range(8):
                        v = int(px[y * 8 + x] + 128.5)
                        plane[base + x] = (
                            0 if v < 0 else 255 if v > 255 else v
                        )
            planes.append(plane)
            strides.append(stride)
        return _jpeg_upsample_assemble(
            planes, comps, w, h, mcx, mcy, hmax, vmax, strides
        )
    except Exception:
        return None


def _tz(v: int, sh: int) -> int:
    """Point transform for AC coefficients (T.81 A.4): division by 2^sh
    with truncation toward zero (DC uses plain arithmetic shift)."""
    return (abs(v) >> sh) if v >= 0 else -(abs(v) >> sh)


def _jpeg_prog_quant_blocks(plane, pw: int, ph: int,
                            bw: int, bh: int) -> list[list[int]]:
    """Quantized zigzag coefficient blocks for a component plane on a
    bw x bh block grid (edge samples replicate past the plane, matching
    the baseline encoders), against the shared K.1 table."""
    import math

    q = _JPEG_LUM_Q
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            block = []
            for y in range(8):
                sy = min(by * 8 + y, ph - 1)
                for x in range(8):
                    sx = min(bx * 8 + x, pw - 1)
                    block.append(float(plane[sy * pw + sx]) - 128.0)
            coef = _fdct_2d(block)
            blocks.append([
                math.floor(round(coef[_JPEG_ZIGZAG[k]], 6) / q[k] + 0.5)
                for k in range(64)
            ])
    return blocks


# shared canonical Huffman spec for the progressive encoders: DC sym s ->
# code s (4 bits); AC symbols (incl. every EOBn r<<4) at 9 bits
_JPEG_PROG_DC_SYMS = list(range(12))
_JPEG_PROG_AC_SYMS = ([0x00, 0xF0] + [r << 4 for r in range(1, 15)]
                      + [(r << 4) | s for r in range(16)
                         for s in range(1, 11)])
_JPEG_PROG_DC_CODE = {s: (i2, 4) for i2, s in enumerate(_JPEG_PROG_DC_SYMS)}
_JPEG_PROG_AC_CODE = {s: (i2, 9) for i2, s in enumerate(_JPEG_PROG_AC_SYMS)}


def _jpeg_prog_dht() -> bytes:
    dc_counts = [0, 0, 0, 12] + [0] * 12
    ac_counts = [0] * 16
    ac_counts[8] = len(_JPEG_PROG_AC_SYMS)
    return (bytes([0x00]) + bytes(dc_counts[:16]) + bytes(_JPEG_PROG_DC_SYMS)
            + bytes([0x10]) + bytes(ac_counts) + bytes(_JPEG_PROG_AC_SYMS))


def _jpeg_prog_dc_first(order_blocks, al: int) -> bytes:
    """DC-first scan body over (group, zz) pairs in scan order — one DC
    predictor per group (T.81 G.1.2.1; group = component)."""
    wtr = _JpegBitWriter()
    pred: dict = {}
    for gi, zz in order_blocks:
        v = zz[0] >> al              # DC point transform: arithmetic shift
        diff = v - pred.get(gi, 0)
        pred[gi] = v
        s = _jpeg_category(diff)
        c, ln = _JPEG_PROG_DC_CODE[s]
        wtr.put(c, ln)
        if s:
            wtr.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    return wtr.flush()


def _jpeg_prog_dc_refine(order_blocks, al: int) -> bytes:
    wtr = _JpegBitWriter()
    for _gi, zz in order_blocks:
        wtr.put((zz[0] >> al) & 1, 1)
    return wtr.flush()


def _jpeg_prog_ac_first(blocks, ss: int, se: int, al: int) -> bytes:
    ac_code = _JPEG_PROG_AC_CODE
    wtr = _JpegBitWriter()
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        while eobrun > 0:
            chunk = min(eobrun, _JPEG_EOB_RUN_CAP)
            r = chunk.bit_length() - 1
            c, ln = ac_code[r << 4]
            wtr.put(c, ln)
            if r:
                wtr.put(chunk - (1 << r), r)
            eobrun -= chunk

    for zz in blocks:
        vals = [_tz(zz[k], al) for k in range(ss, se + 1)]
        last = max((i2 for i2, v in enumerate(vals) if v), default=-1)
        if last < 0:
            eobrun += 1
            continue
        flush_eob()
        run = 0
        for i2 in range(last + 1):
            v = vals[i2]
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_code[0xF0]
                wtr.put(c, ln)
                run -= 16
            s = _jpeg_category(v)
            c, ln = ac_code[(run << 4) | s]
            wtr.put(c, ln)
            wtr.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last < se - ss:
            eobrun += 1          # trailing zeros: defer the EOB
    flush_eob()
    return wtr.flush()


def _jpeg_prog_ac_refine(blocks, ss: int, se: int, al: int) -> bytes:
    ac_code = _JPEG_PROG_AC_CODE
    wtr = _JpegBitWriter()
    eobrun = 0
    pending: list[int] = []      # correction bits for EOB-covered blocks

    def flush_eob() -> None:
        nonlocal eobrun, pending
        while eobrun > 0:
            chunk = min(eobrun, _JPEG_EOB_RUN_CAP)
            r = chunk.bit_length() - 1
            c, ln = ac_code[r << 4]
            wtr.put(c, ln)
            if r:
                wtr.put(chunk - (1 << r), r)
            eobrun -= chunk
        for b in pending:
            wtr.put(b, 1)
        pending = []

    for zz in blocks:
        # 'z' = zero-history zero; ('b', bit) = already-nonzero
        # correction; ('n', sign) = newly nonzero (|value| == 1)
        events: list = []
        for k in range(ss, se + 1):
            vc = _tz(zz[k], al)
            vp = _tz(zz[k], al + 1)
            if vp != 0:
                events.append(("b", abs(vc) & 1))
            elif vc == 0:
                events.append("z")
            else:
                events.append(("n", 1 if vc > 0 else 0))
        if not any(e[0] == "n" for e in events if e != "z"):
            eobrun += 1          # whole band rides the EOB run
            pending.extend(e[1] for e in events if e != "z")
            if eobrun >= _JPEG_EOB_RUN_CAP:
                # flush at the EOBn ceiling: a longer run would
                # split into chunks whose correction bits must
                # interleave per chunk, not trail the last one
                flush_eob()
            continue
        flush_eob()
        runq: list = []          # events since the last emitted symbol
        for ev in events:
            if ev == "z" or ev[0] == "b":
                runq.append(ev)
                continue
            nz = sum(1 for e in runq if e == "z")
            while nz > 15:      # ZRL consumes 16 zero-history slots
                c, ln = ac_code[0xF0]
                wtr.put(c, ln)
                consumed, rest = 0, []
                for e in runq:
                    if consumed >= 16:
                        rest.append(e)
                    elif e == "z":
                        consumed += 1
                    else:
                        wtr.put(e[1], 1)
                    # corrections before the 16th zero ride this ZRL
                runq = rest
                nz -= 16
            c, ln = ac_code[(nz << 4) | 1]
            wtr.put(c, ln)
            wtr.put(ev[1], 1)    # sign bit
            for e in runq:
                if e != "z":
                    wtr.put(e[1], 1)
            runq = []
        if runq:                 # positions after the last new value
            eobrun += 1
            pending.extend(e[1] for e in runq if e != "z")
    flush_eob()
    return wtr.flush()


def encode_jpeg_gray_progressive(
    pixels: bytes, width: int, height: int
) -> bytes:
    """REAL progressive JPEG encoder for grayscale: the same quantized
    coefficients as `encode_jpeg_gray`, delivered over six scans —
    DC first (Al=1), two AC spectral bands (1-5, 6-63) at Al=1, then
    one-bit DC and AC refinement passes down to full precision — with
    genuine EOBn run accumulation, ZRL-over-zero-history splitting, and
    deferred correction bits, so a conforming decoder exercises every
    Annex G path. Losslessly equivalent to the baseline encoding: both
    decode to identical pixels."""
    import struct

    bw = (width + 7) // 8
    bh = (height + 7) // 8
    blocks = _jpeg_prog_quant_blocks(pixels, width, height, bw, bh)
    order = [(0, zz) for zz in blocks]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(ss: int, se: int, ah: int, al: int, data: bytes) -> bytes:
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al])) + data

    dqt = seg(0xDB, bytes([0]) + bytes(_JPEG_LUM_Q))
    sof = seg(0xC2, bytes([8]) + struct.pack(">HH", height, width)
              + bytes([1, 1, 0x11, 0]))
    dht = seg(0xC4, _jpeg_prog_dht())
    return (b"\xff\xd8" + dqt + sof + dht
            + sos(0, 0, 0, 1, _jpeg_prog_dc_first(order, 1))
            + sos(1, 5, 0, 1, _jpeg_prog_ac_first(blocks, 1, 5, 1))
            + sos(6, 63, 0, 1, _jpeg_prog_ac_first(blocks, 6, 63, 1))
            + sos(0, 0, 1, 0, _jpeg_prog_dc_refine(order, 0))
            + sos(1, 5, 1, 0, _jpeg_prog_ac_refine(blocks, 1, 5, 0))
            + sos(6, 63, 1, 0, _jpeg_prog_ac_refine(blocks, 6, 63, 0))
            + b"\xff\xd9")


def encode_jpeg_color_progressive(
    y: bytes, cb: bytes, cr: bytes, width: int, height: int,
    sampling: str = "4:2:0",
) -> bytes:
    """REAL progressive color JPEG encoder with chroma subsampling — the
    synth twin for the subsampled `_decode_jpeg_progressive` path and
    the progressive sibling of `encode_jpeg_color` (same plane
    contract: ``cb``/``cr`` already at chroma resolution). Scans: one
    MCU-interleaved DC-first (Al=1, per-component predictors, T.81
    G.1.2.1), per-component AC spectral bands 1-5 / 6-63 at Al=1
    (non-interleaved over each component's OWN ceil(cw/8) x ceil(ch/8)
    grid per A.2.2), then interleaved DC refine and per-component AC
    refines to full precision. Quantization matches the baseline
    encoder exactly, so both encodings decode to identical pixels."""
    import struct

    factors = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}
    if sampling not in factors:
        raise ValueError(f"unknown sampling {sampling!r}")
    yh, yv = factors[sampling]
    cw = (width + yh - 1) // yh
    ch = (height + yv - 1) // yv
    if len(y) != width * height or len(cb) != cw * ch or len(cr) != cw * ch:
        raise ValueError("plane size mismatch")
    mcx = (width + 8 * yh - 1) // (8 * yh)
    mcy = (height + 8 * yv - 1) // (8 * yv)
    planes = [(y, width, height, yh, yv), (cb, cw, ch, 1, 1),
              (cr, cw, ch, 1, 1)]
    # padded interleaved grid per component (what DC scans cover) and
    # the actual non-interleaved grid (what AC scans cover)
    padded = []
    actual = []
    for plane, pw, ph, hf, vf in planes:
        pbw, pbh = mcx * hf, mcy * vf
        blocks = _jpeg_prog_quant_blocks(plane, pw, ph, pbw, pbh)
        padded.append((blocks, pbw, pbh, hf, vf))
        abw, abh = (pw + 7) // 8, (ph + 7) // 8
        actual.append([
            blocks[r * pbw + c]
            for r in range(abh) for c in range(abw)
        ])
    order = []                       # interleaved MCU order for DC scans
    for m in range(mcx * mcy):
        my, mx = divmod(m, mcx)
        for ci, (blocks, pbw, _pbh, hf, vf) in enumerate(padded):
            for vb in range(vf):
                for hb in range(hf):
                    order.append(
                        (ci, blocks[(my * vf + vb) * pbw + mx * hf + hb])
                    )

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos_hdr(comps_sel, ss: int, se: int, ah: int, al: int,
                data: bytes) -> bytes:
        body = bytes([len(comps_sel)])
        for cs in comps_sel:
            body += bytes([cs, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body) + data

    dqt = seg(0xDB, bytes([0]) + bytes(_JPEG_LUM_Q))
    sof = seg(0xC2, bytes([8]) + struct.pack(">HH", height, width)
              + bytes([3,
                       1, (yh << 4) | yv, 0,
                       2, 0x11, 0,
                       3, 0x11, 0]))
    dht = seg(0xC4, _jpeg_prog_dht())
    out = b"\xff\xd8" + dqt + sof + dht
    out += sos_hdr([1, 2, 3], 0, 0, 0, 1, _jpeg_prog_dc_first(order, 1))
    for ci in range(3):
        out += sos_hdr([ci + 1], 1, 5, 0, 1,
                       _jpeg_prog_ac_first(actual[ci], 1, 5, 1))
        out += sos_hdr([ci + 1], 6, 63, 0, 1,
                       _jpeg_prog_ac_first(actual[ci], 6, 63, 1))
    out += sos_hdr([1, 2, 3], 0, 0, 1, 0, _jpeg_prog_dc_refine(order, 0))
    for ci in range(3):
        out += sos_hdr([ci + 1], 1, 5, 1, 0,
                       _jpeg_prog_ac_refine(actual[ci], 1, 5, 0))
        out += sos_hdr([ci + 1], 6, 63, 1, 0,
                       _jpeg_prog_ac_refine(actual[ci], 6, 63, 0))
    return out + b"\xff\xd9"


# --- real WebP-lossless (VP8L) decode ---------------------------------------
#
# Implemented from the public WebP Lossless Bitstream Specification
# (RFC 9649 / Google's webp-lossless-bitstream-spec): RIFF container to
# the VP8L chunk, LSB-first bit reading with DEFLATE-style canonical
# prefix codes (simple 1/2-symbol form and the 19-symbol code-length
# code with 16/17/18 repeat ops and the max-symbol cap), optional
# meta-prefix entropy image selecting per-tile code groups, color
# cache (the 0x1e35a7bd multiplicative hash), LZ77 backward references
# with the 40-symbol distance alphabet and the 120-entry 2D
# near-neighbor distance map, and ALL FOUR inverse transforms —
# predictor (14 modes incl. Select and ClampAddSubtract), cross-color,
# subtract-green, and color-indexing with sub-byte pixel packing.
# Lossy VP8 frames genuinely need a full video-intra decoder and keep
# the honest stub behavior (None).

_VP8L_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
                  13, 14, 15]


class _Vp8lBitReader:
    """LSB-first bit reader (RIFF/VP8L convention)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0                 # absolute bit position

    def bit(self) -> int:
        p = self.pos
        if p >> 3 >= len(self.data):
            raise ValueError("VP8L bitstream overrun")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1

    def bits(self, n: int) -> int:
        v = 0
        for k in range(n):
            v |= self.bit() << k
        return v


class _Vp8lCode:
    """Canonical prefix code: decode bit-by-bit MSB-first (codes are
    written reversed into the LSB-first stream, so sequential bit reads
    traverse the canonical code from its most significant bit)."""

    def __init__(self, lengths: list[int]):
        counts = [0] * 16
        for ln in lengths:
            if ln:
                counts[ln] += 1
        if sum(counts) == 1:         # degenerate: zero-bit code
            self.single = lengths.index(1) if 1 in lengths else next(
                i for i, ln in enumerate(lengths) if ln
            )
            self.table = None
            return
        self.single = None
        code = 0
        table = {}
        next_code = [0] * 16
        for ln in range(1, 16):
            code = (code + counts[ln - 1]) << 1
            next_code[ln] = code
        total = 0
        for sym, ln in enumerate(lengths):
            if ln:
                table[(ln, next_code[ln])] = sym
                next_code[ln] += 1
                total += 1
        if total == 0:
            raise ValueError("empty prefix code")
        self.table = table

    @classmethod
    def single_symbol(cls, sym: int) -> "_Vp8lCode":
        c = cls.__new__(cls)
        c.single = sym
        c.table = None
        return c

    def read(self, br: _Vp8lBitReader) -> int:
        if self.table is None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _vp8l_read_code(br: _Vp8lBitReader, alphabet: int) -> _Vp8lCode:
    """One prefix code: simple (1-2 symbols) or code-length coded."""
    if br.bit():                     # simple code
        n_sym = br.bit() + 1
        first_8bit = br.bit()
        lengths = [0] * alphabet
        s0 = br.bits(8 if first_8bit else 1)
        if s0 >= alphabet:
            raise ValueError("symbol out of range")
        if n_sym == 2:
            s1 = br.bits(8)
            if s1 >= alphabet or s1 == s0:
                raise ValueError("bad simple code")
            lengths[s0] = lengths[s1] = 1
            return _Vp8lCode(lengths)
        return _Vp8lCode.single_symbol(s0)
    n_cl = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for k in range(n_cl):
        cl_lengths[_VP8L_CL_ORDER[k]] = br.bits(3)
    cl_code = _Vp8lCode(cl_lengths)
    if br.bit():                     # explicit max-symbol cap
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_code.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if i >= alphabet:
                    raise ValueError("repeat overrun")
                lengths[i] = prev
                i += 1
        elif s == 17:
            i += 3 + br.bits(3)
        else:
            i += 11 + br.bits(7)
        if i > alphabet:
            raise ValueError("repeat overrun")
    return _Vp8lCode(lengths)


def _vp8l_lz77_value(br: _Vp8lBitReader, prefix: int) -> int:
    """LZ77 length/distance prefix decoding (spec §4.2.2)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.bits(extra) + 1


def _vp8l_distance(code: int, xsize: int) -> int:
    """Map a distance code to a scan-line distance: codes 1-120 are 2D
    near-neighbor offsets, the rest are linear minus 120."""
    if code > 120:
        return code - 120
    dx, dy = _VP8L_DIST_MAP[code - 1]
    return max(1, dy * xsize + dx)


# the spec's fixed 120-entry (dx, dy) near-neighbor table (§4.2.2.3),
# verbatim — the order is normative and not derivable from a metric
_VP8L_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
assert len(_VP8L_DIST_MAP) == 120


def _vp8l_decode_image(br: _Vp8lBitReader, w: int, h: int,
                       level0: bool) -> tuple[list[int], list]:
    """Decode one VP8L image stream (spec §5): optional transforms
    (level 0 only), optional color cache, optional meta-prefix groups,
    prefix-coded ARGB pixels with LZ77 and cache references. Returns
    (argb pixels row-major, transforms innermost-last)."""
    transforms = []
    xsize = w
    if level0:
        while br.bit():
            ttype = br.bits(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("duplicate transform")
            if ttype in (0, 1):      # predictor / cross-color
                size_bits = br.bits(3) + 2
                bw = (xsize + (1 << size_bits) - 1) >> size_bits
                bh = (h + (1 << size_bits) - 1) >> size_bits
                sub, _ = _vp8l_decode_image(br, bw, bh, False)
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:         # subtract green
                transforms.append((2, 0, None))
            else:                    # color indexing
                n_colors = br.bits(8) + 1
                pal, _ = _vp8l_decode_image(br, n_colors, 1, False)
                # palette is delta-coded left-to-right, per channel
                for i in range(1, n_colors):
                    pal[i] = (
                        ((pal[i] & 0xFF00FF00) + (pal[i - 1] & 0xFF00FF00))
                        & 0xFF00FF00
                    ) | (
                        ((pal[i] & 0x00FF00FF) + (pal[i - 1] & 0x00FF00FF))
                        & 0x00FF00FF
                    )
                if n_colors <= 2:
                    wbits = 3
                elif n_colors <= 4:
                    wbits = 2
                elif n_colors <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append((3, wbits, pal))
                if wbits:
                    xsize = (xsize + (1 << wbits) - 1) >> wbits
        if any(t[0] == 3 for t in transforms) and len(transforms) > 1:
            # color-indexing changes pixel geometry; real encoders use it
            # alone, and mixed-geometry inversion is ill-defined here
            raise ValueError("color-index combined with other transforms")
    cache_bits = br.bits(4) if br.bit() else 0
    if cache_bits > 11:
        raise ValueError("bad cache bits")
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.bit():          # meta-prefix image
        meta_bits = br.bits(3) + 2
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta, _ = _vp8l_decode_image(br, mw, mh, False)
        n_groups = max((p >> 8) & 0xFFFF for p in meta) + 1
    groups = []
    for _ in range(n_groups):
        green = _vp8l_read_code(br, 256 + 24 + cache_size)
        red = _vp8l_read_code(br, 256)
        blue = _vp8l_read_code(br, 256)
        alpha = _vp8l_read_code(br, 256)
        dist = _vp8l_read_code(br, 40)
        groups.append((green, red, blue, alpha, dist))
    n_px = xsize * h
    out: list[int] = []
    cache = [0] * cache_size
    mw = ((xsize + (1 << meta_bits) - 1) >> meta_bits) if meta else 0

    def cache_insert(argb: int) -> None:
        if cache_size:
            cache[((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] \
                = argb

    while len(out) < n_px:
        if meta is not None:
            x, y = len(out) % xsize, len(out) // xsize
            mpx = meta[(y >> meta_bits) * mw + (x >> meta_bits)]
            g_green, g_red, g_blue, g_alpha, g_dist = groups[
                (mpx >> 8) & 0xFFFF
            ]
        else:
            g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
        s = g_green.read(br)
        if s < 256:                  # literal
            r = g_red.read(br)
            b = g_blue.read(br)
            a = g_alpha.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out.append(px)
            cache_insert(px)
        elif s < 280:                # LZ77 back-reference
            length = _vp8l_lz77_value(br, s - 256)
            dist_code = _vp8l_lz77_value(br, g_dist.read(br))
            dist = _vp8l_distance(dist_code, xsize)
            if dist > len(out) or len(out) + length > n_px:
                raise ValueError("bad back-reference")
            for _ in range(length):
                px = out[-dist]
                out.append(px)
                cache_insert(px)
        else:                        # color-cache hit
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("cache index out of range")
            out.append(cache[idx])
    return out, transforms


def _vp8l_apply_inverse(argb: list[int], w: int, h: int,
                        transforms: list) -> list[int]:
    """Apply inverse transforms in reverse reading order (spec §6)."""
    for ttype, bits, data in reversed(transforms):
        if ttype == 3:               # color indexing (+ unpacking)
            pal = data
            if bits:
                packed_w = (w + (1 << bits) - 1) >> bits
                per = 1 << bits
                field = 8 >> bits
                mask = (1 << field) - 1
                full = []
                for y in range(h):
                    row = []
                    for px_i in range(packed_w):
                        v = (argb[y * packed_w + px_i] >> 8) & 0xFF
                        for k in range(per):
                            row.append((v >> (k * field)) & mask)
                    full.extend(row[:w])
                idxs = full
            else:
                idxs = [(p >> 8) & 0xFF for p in argb]
            argb = [pal[i] if i < len(pal) else 0 for i in idxs]
        elif ttype == 2:             # add green
            argb = [
                (p & 0xFF00FF00)
                | ((((p >> 16) + (p >> 8)) & 0xFF) << 16)
                | (((p + (p >> 8)) & 0xFF))
                for p in argb
            ]
        elif ttype == 1:             # inverse cross-color
            sub = data
            bw = (w + (1 << bits) - 1) >> bits
            for y in range(h):
                for x in range(w):
                    cpx = sub[(y >> bits) * bw + (x >> bits)]
                    # multipliers ride the B/G/R channels in that order
                    g2r = _vp8l_s8(cpx)
                    g2b = _vp8l_s8(cpx >> 8)
                    r2b = _vp8l_s8(cpx >> 16)
                    p = argb[y * w + x]
                    a = (p >> 24) & 0xFF
                    r = (p >> 16) & 0xFF
                    g = (p >> 8) & 0xFF
                    b = p & 0xFF
                    r = (r + ((g2r * _vp8l_s8v(g)) >> 5)) & 0xFF
                    b = (b + ((g2b * _vp8l_s8v(g)) >> 5)) & 0xFF
                    b = (b + ((r2b * _vp8l_s8v(r)) >> 5)) & 0xFF
                    argb[y * w + x] = (a << 24) | (r << 16) | (g << 8) | b
        elif ttype == 0:             # inverse predictor
            sub = data
            bw = (w + (1 << bits) - 1) >> bits
            for y in range(h):
                for x in range(w):
                    i = y * w + x
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = argb[i - 1]
                    elif x == 0:
                        pred = argb[i - w]
                    else:
                        mode = (sub[(y >> bits) * bw + (x >> bits)] >> 8) \
                            & 0xFF
                        pred = _vp8l_predict(argb, i, w, x, mode)
                    argb[i] = _vp8l_add_px(argb[i], pred)
    return argb


def _vp8l_s8(v: int) -> int:
    v &= 0xFF
    return v - 256 if v >= 128 else v


def _vp8l_s8v(v: int) -> int:
    return v - 256 if v >= 128 else v


def _vp8l_add_px(p: int, q: int) -> int:
    return (
        (((p >> 24) + (q >> 24)) & 0xFF) << 24
        | ((((p >> 16) + (q >> 16)) & 0xFF) << 16)
        | ((((p >> 8) + (q >> 8)) & 0xFF) << 8)
        | (((p + q) & 0xFF))
    )


def _vp8l_avg2(p: int, q: int) -> int:
    return (
        ((((p >> 24) & 0xFF) + ((q >> 24) & 0xFF)) >> 1) << 24
        | ((((p >> 16) & 0xFF) + ((q >> 16) & 0xFF)) >> 1) << 16
        | ((((p >> 8) & 0xFF) + ((q >> 8) & 0xFF)) >> 1) << 8
        | ((((p & 0xFF) + (q & 0xFF)) >> 1))
    )


def _vp8l_predict(argb: list[int], i: int, w: int, x: int,
                  mode: int) -> int:
    L = argb[i - 1]
    T = argb[i - w]
    TL = argb[i - w - 1]
    # rightmost column: i-w+1 wraps to the current row's first pixel,
    # already reconstructed — the spec's linear-array addressing rule
    TR = argb[i - w + 1]
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _vp8l_avg2(_vp8l_avg2(L, TR), T)
    if mode == 6:
        return _vp8l_avg2(L, TL)
    if mode == 7:
        return _vp8l_avg2(L, T)
    if mode == 8:
        return _vp8l_avg2(TL, T)
    if mode == 9:
        return _vp8l_avg2(T, TR)
    if mode == 10:
        return _vp8l_avg2(_vp8l_avg2(L, TL), _vp8l_avg2(T, TR))
    if mode == 11:                   # Select
        pr = 0
        pl = 0
        for sh in (24, 16, 8, 0):
            pt = abs(((L >> sh) & 0xFF) - ((TL >> sh) & 0xFF))
            ql = abs(((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF))
            pr += pt
            pl += ql
        return L if pl < pr else T
    if mode == 12:                   # ClampAddSubtractFull
        out = 0
        for sh in (24, 16, 8, 0):
            v = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF)
            out |= (0 if v < 0 else 255 if v > 255 else v) << sh
        return out
    if mode == 13:                   # ClampAddSubtractHalf
        out = 0
        for sh in (24, 16, 8, 0):
            ave = (((L >> sh) & 0xFF) + ((T >> sh) & 0xFF)) >> 1
            d = ave - ((TL >> sh) & 0xFF)
            v = ave + (d // 2 if d >= 0 else -((-d) // 2))  # trunc toward 0
            out |= (0 if v < 0 else 255 if v > 255 else v) << sh
        return out
    raise ValueError("bad predictor mode")


def decode_webp(payload: bytes) -> tuple[int, int, str, bytearray] | None:
    """REAL WebP-LOSSLESS decode per the public VP8L bitstream spec:
    RIFF walk to the VP8L chunk, then the full format — canonical
    prefix codes (simple + code-length-coded), meta-prefix groups,
    color cache, LZ77 with the 2D distance map, and all four inverse
    transforms. Returns the common (w, h, mode, samples) decoder shape
    ('L' when gray+opaque collapses, 'RGB' when opaque, 'RGBA'
    otherwise); None for lossy VP8/VP8X-animation payloads (these
    genuinely need a video-intra codec) and for anything corrupt —
    never raises."""
    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
            return None
        i, n = 12, len(payload)
        chunk = None
        while i + 8 <= n:
            cid = payload[i : i + 4]
            clen = int.from_bytes(payload[i + 4 : i + 8], "little")
            if cid == b"VP8L":
                chunk = payload[i + 8 : i + 8 + clen]
                break
            i += 8 + clen + (clen & 1)
        if chunk is None or not chunk or chunk[0] != 0x2F:
            return None
        br = _Vp8lBitReader(chunk)
        br.pos = 8                   # past the signature byte
        w = br.bits(14) + 1
        h = br.bits(14) + 1
        br.bit()                     # alpha-used hint
        if br.bits(3) != 0:
            return None              # version must be 0
        if w * h * 4 > MAX_DECODE_SAMPLES:
            return None              # header-claimed size: decode bomb
        argb, transforms = _vp8l_decode_image(br, w, h, True)
        argb = _vp8l_apply_inverse(argb, w, h, transforms)
        if len(argb) != w * h:
            return None
        opaque = all((p >> 24) & 0xFF == 0xFF for p in argb)
        gray = opaque and all(
            ((p >> 16) & 0xFF) == ((p >> 8) & 0xFF) == (p & 0xFF)
            for p in argb
        )
        if gray:
            return (w, h, "L", bytearray((p >> 8) & 0xFF for p in argb))
        out = bytearray()
        if opaque:
            for p in argb:
                out.extend(((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF))
            return (w, h, "RGB", out)
        for p in argb:
            out.extend(((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF,
                        (p >> 24) & 0xFF))
        return (w, h, "RGBA", out)
    except Exception:
        return None


class _Vp8lBitWriter:
    """LSB-first bit writer (the VP8L stream convention). Prefix-code
    values are written MSB-first via ``code`` so sequential LSB-first
    reads traverse the canonical code top-down."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.nbits = 0

    def put(self, v: int, n: int) -> None:
        for k in range(n):
            if self.nbits % 8 == 0:
                self.out.append(0)
            if (v >> k) & 1:
                self.out[-1] |= 1 << (self.nbits % 8)
            self.nbits += 1

    def code(self, c: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.put((c >> k) & 1, 1)


def _vp8l_canonical(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (DEFLATE rule): {sym: (code, len)}."""
    counts = [0] * 16
    for ln in lengths:
        if ln:
            counts[ln] += 1
    next_code = [0] * 16
    code = 0
    for ln in range(1, 16):
        code = (code + counts[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


def _vp8l_huff_lengths(freqs: dict[int, int], alphabet: int,
                       max_len: int = 15) -> list[int]:
    """Code lengths for the present symbols: true Huffman via pairing,
    then clamped to ``max_len`` and rebalanced to a Kraft sum of
    exactly 1 — conforming decoders (libwebp) reject under-complete
    codes, so completeness is part of the interop contract."""
    import heapq
    from fractions import Fraction

    syms = sorted(freqs)
    lengths = [0] * alphabet
    if len(syms) == 1:
        lengths[syms[0]] = 1
        return lengths
    heap = [(f, i, [s]) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth = dict.fromkeys(syms, 0)
    nid = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, nid, s1 + s2))
        nid += 1
    for s in depth:
        if depth[s] > max_len:
            depth[s] = max_len
    kraft = sum(Fraction(1, 1 << d) for d in depth.values())
    by_freq = sorted(syms, key=lambda s: (freqs[s], s))
    while kraft > 1:                 # overfull after clamping: demote
        s = next(s for s in by_freq if depth[s] < max_len)
        kraft -= Fraction(1, 1 << (depth[s] + 1))
        depth[s] += 1
    while kraft < 1:                 # fill the remaining code space
        s = max((s for s in syms
                 if depth[s] > 1
                 and Fraction(1, 1 << depth[s]) <= 1 - kraft),
                key=lambda s: (depth[s], -freqs[s]))
        kraft += Fraction(1, 1 << depth[s])
        depth[s] -= 1
    for s, d in depth.items():
        lengths[s] = d
    return lengths


def _vp8l_write_code(wtr: _Vp8lBitWriter, lengths: list[int]) -> dict:
    """Emit one prefix code; simple form for 1-2 symbols, else the
    code-length-coded form (every length a literal — correctness over
    compactness). Returns the {sym: (code, len)} encode table."""
    present = [s for s, ln in enumerate(lengths) if ln]
    if len(present) == 1:
        wtr.put(1, 1)                # simple
        wtr.put(0, 1)                # one symbol
        s0 = present[0]
        if s0 < 2:
            wtr.put(0, 1)            # 1-bit first symbol
            wtr.put(s0, 1)
        else:
            wtr.put(1, 1)
            wtr.put(s0, 8)
        return {s0: (0, 0)}
    if len(present) == 2 and all(lengths[s] == 1 for s in present):
        wtr.put(1, 1)
        wtr.put(1, 1)                # two symbols
        wtr.put(1, 1)                # 8-bit first symbol
        wtr.put(present[0], 8)
        wtr.put(present[1], 8)
        return {present[0]: (0, 1), present[1]: (1, 1)}
    wtr.put(0, 1)                    # normal: code-length coded
    cl_freqs: dict[int, int] = {}
    for ln in lengths:
        cl_freqs[ln] = cl_freqs.get(ln, 0) + 1
    # a complete (Kraft = 1) code-length code — libwebp rejects
    # under-complete codes; 3-bit length fields cap depths at 7
    cl_lengths = _vp8l_huff_lengths(cl_freqs, 19, max_len=7)
    # all 19 entries of the code-length code, in the magic order
    wtr.put(19 - 4, 4)
    for sym in _VP8L_CL_ORDER:
        wtr.put(cl_lengths[sym], 3)
    cl_table = _vp8l_canonical(cl_lengths)
    wtr.put(0, 1)                    # no max-symbol cap: all entries coded
    for ln in lengths:
        c, cl = cl_table[ln]
        wtr.code(c, cl)
    return _vp8l_canonical(lengths)


def encode_webp_gray(pixels: bytes, width: int, height: int) -> bytes:
    """REAL VP8L (WebP-lossless) encoder for grayscale: subtract-green
    transform (so R and B collapse to single-symbol codes), a genuine
    Huffman green code emitted through the code-length code, and the
    RIFF/WEBP container. Lossless: any conforming decoder recovers the
    input bytes exactly."""
    import struct

    wtr = _Vp8lBitWriter()
    wtr.put(0x2F, 8)                 # signature
    wtr.put(width - 1, 14)
    wtr.put(height - 1, 14)
    wtr.put(0, 1)                    # no alpha
    wtr.put(0, 3)                    # version
    wtr.put(1, 1)                    # a transform follows
    wtr.put(2, 2)                    # subtract-green
    wtr.put(0, 1)                    # no more transforms
    wtr.put(0, 1)                    # no color cache
    wtr.put(0, 1)                    # no meta-prefix image
    freqs: dict[int, int] = {}
    for v in pixels:
        freqs[v] = freqs.get(v, 0) + 1
    green = _vp8l_write_code(wtr, _vp8l_huff_lengths(freqs, 280))
    for chan_sym in (0, 0, 255):     # red, blue (post-subtract), alpha
        lengths = [0] * 256
        lengths[chan_sym] = 1
        _vp8l_write_code(wtr, lengths)
    dist_lengths = [0] * 40
    dist_lengths[0] = 1
    _vp8l_write_code(wtr, dist_lengths)
    for v in pixels:
        c, ln = green[v]
        wtr.code(c, ln)
    chunk = bytes(wtr.out)
    if len(chunk) & 1:
        padded = chunk + b"\x00"
    else:
        padded = chunk
    body = b"WEBP" + b"VP8L" + struct.pack("<I", len(chunk)) + padded
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_gray_webp(
    df: DataFrame,
    content_col: str = "content",
    width: int = 7,
    height: int = 3,
) -> DataFrame:
    """Deterministic WebP synthesis: md5-digest pixels through the real
    VP8L encoder (subtract-green + Huffman-coded literals) — same
    oracle-replayable contract as the other codec synths."""
    n_px = width * height
    return _synth_digest_media(df, content_col, lambda px: encode_webp_gray(px, width, height), n_px)


# --- real FLAC decode (a LOSSLESS COMPRESSED audio codec) --------------------
#
# Implemented from the public FLAC format specification (xiph.org /
# RFC 9639): frame sync + header with CRC-8, subframes (CONSTANT,
# VERBATIM, FIXED predictors order 0-4), Rice-coded residual partitions
# with escape codes, wasted-bits unary prefix, frame CRC-16 — all
# verified, so corrupt streams are rejected, not mis-decoded. The
# encoder writes genuine FIXED-predictor + Rice frames (real
# compression, not stored), and losslessness means decoded samples
# equal the originals EXACTLY — the oracle contract. LPC subframes and
# the three stereo decorrelation modes decode as well.


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _FlacBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc & 0xFF)
                self.acc = self.n = 0

    def unary(self, q: int) -> None:
        for _ in range(q):
            self.put(0, 1)
        self.put(1, 1)

    def align(self) -> None:
        while self.n:
            self.put(0, 1)


class _FlacBitReader:
    def __init__(self, data: bytes, start: int = 0):
        self.data = data
        self.i = start
        self.bit = 0

    def bits(self, n: int) -> int:
        v = 0
        d = self.data
        for _ in range(n):
            if self.i >= len(d):
                raise ValueError("flac overrun")
            v = (v << 1) | ((d[self.i] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.i += 1
        return v

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("unary runaway")
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.i += 1


_FLAC_FIXED_COEFS = {
    0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1],
}


def _rice_write(w: _FlacBitWriter, v: int, param: int) -> None:
    u = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag fold
    w.unary(u >> param)
    if param:
        w.put(u & ((1 << param) - 1), param)


def _rice_read(r: _FlacBitReader, param: int) -> int:
    q = r.unary()
    u = (q << param) | (r.bits(param) if param else 0)
    return (u >> 1) ^ -(u & 1)


def flac_encode_mono16(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Real FLAC encoder for one mono 16-bit frame: best FIXED predictor
    (order 0-2 by residual magnitude), single-partition Rice residual
    with a data-fitted parameter, correct CRC-8/CRC-16, preceded by a
    STREAMINFO header. Spec-conforming output any FLAC decoder reads."""
    n = len(samples)
    if n == 0:
        raise ValueError("flac_encode_mono16: empty")
    best = None
    for order in (0, 1, 2):
        if n <= order:
            continue
        res = []
        for i in range(order, n):
            pred = sum(
                c * samples[i - 1 - j]
                for j, c in enumerate(_FLAC_FIXED_COEFS[order])
            )
            res.append(samples[i] - pred)
        cost = sum(abs(v) for v in res)
        if best is None or cost < best[1]:
            best = (order, cost, res)
    order, _, res = best
    mean = max(1, sum(abs(v) for v in res) // max(1, len(res)) + 1)
    param = min(14, max(0, mean.bit_length()))

    w = _FlacBitWriter()
    w.put(0b11111111111110, 14)
    w.put(0, 1)          # reserved
    w.put(0, 1)          # fixed blocking
    w.put(0b0111, 4)     # block size: 16-bit value - 1 follows
    w.put(0b0000, 4)     # sample rate: from STREAMINFO
    w.put(0b0000, 4)     # channels: mono
    w.put(0b100, 3)      # 16-bit samples
    w.put(0, 1)          # reserved
    w.put(0x00, 8)       # frame number 0 (UTF-8)
    w.put(n - 1, 16)
    hdr = bytes(w.out)
    assert w.n == 0
    w.put(_crc8(hdr), 8)
    # subframe: FIXED, chosen order, no wasted bits
    w.put(0, 1)
    w.put(0b001000 | order, 6)
    w.put(0, 1)
    for s in samples[:order]:
        w.put(s & 0xFFFF, 16)
    w.put(0, 2)          # residual method: 4-bit Rice
    w.put(0, 4)          # partition order 0 -> one partition
    w.put(param, 4)
    for v in res:
        _rice_write(w, v, param)
    w.align()
    body = bytes(w.out)
    frame = body + _crc16(body).to_bytes(2, "big")
    return _flac_streaminfo(sample_rate, 1, 16, n) + frame


def flac_decode(payload: bytes) -> tuple[int, int, list[int]] | None:
    """REAL FLAC decode: STREAMINFO probe, then frames — sync check,
    header parse with CRC-8 verify, per-channel subframes (CONSTANT /
    VERBATIM / FIXED 0-4 with Rice partitions, escapes, wasted bits),
    CRC-16 verify — returning (sample_rate, n_channels, samples) with
    interleaved frames. LPC subframes (order 1-32, quantized coefficients
    + arithmetic shift) and all three stereo decorrelation modes
    (left/side, right/side, mid/side — the side channel's extra bit
    included) decode too, so real-world fixed-blocking FLAC files read.
    None for anything else or corrupt (never raises)."""
    try:
        info = probe_flac_header(payload)
        if info is None:
            return None
        rate, nch, bits, _total = info
        if bits not in (8, 16):
            return None
        # skip metadata blocks to the first frame
        i = 4
        while True:
            last = payload[i] & 0x80
            blen = int.from_bytes(payload[i + 1 : i + 4], "big")
            i += 4 + blen
            if last:
                break
        out: list[int] = []
        # zero-bit escape residuals make FLAC legally infinitely
        # expansible — bound output by the declared total (when set),
        # the global ceiling, AND a 64× payload-proportional budget
        # (beyond 64:1, lossless audio is a crafted bomb, not music)
        max_out = min(
            _total * nch if _total else MAX_DECODE_SAMPLES,
            MAX_DECODE_SAMPLES,
            64 * len(payload),
        )
        while i < len(payload) - 2:
            if len(out) > max_out:
                return None
            r = _FlacBitReader(payload, i)
            if r.bits(14) != 0b11111111111110:
                return None
            r.bits(1)
            r.bits(1)
            bs_code = r.bits(4)
            sr_code = r.bits(4)
            ch_code = r.bits(4)
            ss_code = r.bits(3)
            r.bits(1)
            if ch_code <= 7:
                if ch_code + 1 != nch:
                    return None
                frame_nch = ch_code + 1
            elif ch_code in (8, 9, 10):  # left/side, right/side, mid/side
                if nch != 2:
                    return None
                frame_nch = 2
            else:
                return None
            # UTF-8 frame number: count leading ones of first byte
            first = r.bits(8)
            extra = 0
            if first >= 0xC0:
                b = first
                while b & 0x40:
                    extra += 1
                    b <<= 1
            for _ in range(extra):
                r.bits(8)
            if bs_code == 0b0110:
                bsize = r.bits(8) + 1
            elif bs_code == 0b0111:
                bsize = r.bits(16) + 1
            elif bs_code == 0b0001:
                bsize = 192
            elif 0b0010 <= bs_code <= 0b0101:
                bsize = 576 << (bs_code - 2)
            elif bs_code >= 0b1000:
                bsize = 256 << (bs_code - 8)
            else:
                return None
            if bsize * nch > max_out + 65536:
                return None  # single frame exceeding the output bound
            if sr_code == 0b1100:
                r.bits(8)
            elif sr_code in (0b1101, 0b1110):
                r.bits(16)
            # CRC-8 covers the header up to (not incl.) the crc byte; the
            # header is byte-aligned here by construction
            if r.bit != 0:
                return None
            hdr_end = r.i
            if r.bits(8) != _crc8(payload[i:hdr_end]):
                return None
            sbits = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20,
                     0b110: 24}.get(ss_code, 16 if ss_code == 0 else None)
            if ss_code == 0:
                sbits = bits
            if sbits is None or sbits != bits:
                return None
            def read_residual(order: int) -> list[int]:
                method = r.bits(2)
                if method > 1:
                    raise ValueError("bad residual method")
                pbits = 4 + method
                escape = (1 << pbits) - 1
                po = r.bits(4)
                nparts = 1 << po
                if bsize % nparts or (po and bsize // nparts <= order):
                    raise ValueError("bad partition order")
                res: list[int] = []
                for p in range(nparts):
                    cnt = bsize // nparts - (order if p == 0 else 0)
                    prm = r.bits(pbits)
                    if prm == escape:
                        raw = r.bits(5)
                        res.extend(
                            r.signed(raw) if raw else 0 for _ in range(cnt)
                        )
                    else:
                        res.extend(_rice_read(r, prm) for _ in range(cnt))
                return res

            chans = []
            for c in range(frame_nch):
                # the SIDE channel carries one extra sample-size bit:
                # left/side & mid/side put it in subframe 1, right/side
                # in subframe 0
                side_extra = int(
                    (ch_code in (8, 10) and c == 1)
                    or (ch_code == 9 and c == 0)
                )
                if r.bits(1) != 0:
                    return None
                stype = r.bits(6)
                wasted = 0
                if r.bits(1):
                    wasted = 1 + r.unary()
                eff = sbits + side_extra - wasted
                if stype == 0:                     # CONSTANT
                    v = r.signed(eff)
                    ch = [v] * bsize
                elif stype == 1:                   # VERBATIM
                    ch = [r.signed(eff) for _ in range(bsize)]
                elif 0b001000 <= stype <= 0b001100:  # FIXED 0-4
                    order = stype & 0x07
                    ch = [r.signed(eff) for _ in range(order)]
                    coefs = _FLAC_FIXED_COEFS[order]
                    for k, v in enumerate(read_residual(order)):
                        idx = order + k
                        pred = sum(
                            c2 * ch[idx - 1 - j]
                            for j, c2 in enumerate(coefs)
                        )
                        ch.append(v + pred)
                elif stype & 0b100000:             # LPC, order 1-32
                    order = (stype & 0x1F) + 1
                    ch = [r.signed(eff) for _ in range(order)]
                    prec = r.bits(4) + 1
                    if prec == 16:                 # 0b1111 is invalid
                        return None
                    shift = r.signed(5)
                    if shift < 0:
                        return None
                    coefs = [r.signed(prec) for _ in range(order)]
                    for k, v in enumerate(read_residual(order)):
                        idx = order + k
                        pred = sum(
                            c2 * ch[idx - 1 - j]
                            for j, c2 in enumerate(coefs)
                        ) >> shift                 # arithmetic shift (spec)
                        ch.append(v + pred)
                else:
                    return None
                if wasted:
                    ch = [v << wasted for v in ch]
                chans.append(ch)
            if ch_code == 8:       # left/side: right = left - side
                chans = [chans[0],
                         [l - s for l, s in zip(chans[0], chans[1])]]
            elif ch_code == 9:     # right/side: left = right + side
                chans = [[rt + s for s, rt in zip(chans[0], chans[1])],
                         chans[1]]
            elif ch_code == 10:    # mid/side (T.? xiph): reconstruct pair
                left, right = [], []
                for mid, side in zip(chans[0], chans[1]):
                    m2 = (mid << 1) | (side & 1)
                    left.append((m2 + side) >> 1)
                    right.append((m2 - side) >> 1)
                chans = [left, right]
            r.align()
            frame_end = r.i
            if _crc16(payload[i:frame_end]) != int.from_bytes(
                payload[frame_end : frame_end + 2], "big"
            ):
                return None
            for k in range(bsize):
                for c in range(nch):
                    out.append(chans[c][k])
            i = frame_end + 2
        return (rate, nch, out) if out else None
    except Exception:
        return None


def synth_flac_audio(
    df: DataFrame, content_col: str = "content", sample_rate: int = 8000
) -> DataFrame:
    """Deterministic lossless-compressed-audio synthesis: the payload's
    md5 digest becomes 8 int16 samples pushed through the REAL FLAC
    encoder (fixed-predictor + Rice entropy coding, CRC-sealed). FLAC is
    lossless, so the decoded samples equal the digest samples EXACTLY —
    the strongest oracle contract a compressed codec can offer. Narrow
    Arrow-batched map."""
    import struct

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                digest = hashlib.md5(bytes(p)).digest()
                samples = list(struct.unpack("<8h", digest))
                out.append(flac_encode_mono16(samples, sample_rate))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


# 8-point DFT coefficients as FIXED literals (cos/sin of 2πj/8). Literals
# — not math.cos — so any engine (the DuckDB oracle included) reproduces
# bit-identical doubles; the eighth-roots are exact except ±√½.
_DFT8_R = 0.7071067811865476
_DFT8_COS = [1.0, _DFT8_R, 0.0, -_DFT8_R, -1.0, -_DFT8_R, 0.0, _DFT8_R]
_DFT8_SIN = [0.0, _DFT8_R, 1.0, _DFT8_R, 0.0, -_DFT8_R, -1.0, -_DFT8_R]

SPECTRUM_SCHEMA = (
    "media_id bigint, dominant_bin int, spectral_centroid double, "
    "total_power double"
)


def audio_spectrum_features(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Frequency-domain features over REAL decoded audio: an 8-point DFT
    of the first 8 decoded samples (any supported codec — PCM, G.711,
    ADPCM, FLAC) → dominant positive-frequency bin (argmax |X_k|,
    k=1..4, smallest wins ties), spectral centroid (Σk|X_k|/Σ|X_k|),
    and total spectral power. One narrow Arrow-batched mapInPandas
    stage; NULLs for undecodable or too-short payloads."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            bins, cents, powers = [], [], []
            for p in pdf[content_col]:
                raw = bytes(p)
                decoded = _decode_any_audio(raw)
                bin_ = cent = power = None
                if decoded is not None and len(decoded[2]) >= 8:
                    s = decoded[2][:8]
                    mags = []
                    for k in range(1, 5):
                        # exact-integer partial sums, ONE float op each:
                        # re = a + r·b is bit-identical on every engine
                        # regardless of summation order (a SQL SUM has
                        # no order guarantee; an 8-term float sum does
                        # not) — the oracle mirrors this form
                        a_re = b_re = a_im = b_im = 0
                        for n in range(8):
                            idx = (k * n) % 8
                            v = s[n]
                            if idx == 0:
                                a_re += v
                            elif idx == 4:
                                a_re -= v
                            elif idx in (1, 7):
                                b_re += v
                            else:
                                if idx in (3, 5):
                                    b_re -= v
                            if idx == 2:
                                a_im -= v
                            elif idx == 6:
                                a_im += v
                            elif idx in (1, 3):
                                b_im -= v
                            elif idx in (5, 7):
                                b_im += v
                        re = a_re + _DFT8_R * b_re
                        im = a_im + _DFT8_R * b_im
                        mags.append(math.sqrt(re * re + im * im))
                    total = sum(mags)
                    if total > 0:
                        cent = sum((k + 1) * m
                                   for k, m in enumerate(mags)) / total
                        bin_ = 1 + max(range(4),
                                       key=lambda k: (mags[k], -k))
                    power = sum(m * m for m in mags)
                bins.append(bin_)
                cents.append(cent)
                powers.append(power)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "dominant_bin": pd.array(bins, dtype="Int32"),
                "spectral_centroid": pd.array(cents, dtype="float64"),
                "total_power": pd.array(powers, dtype="float64"),
            })

    return df.mapInPandas(compute, schema=SPECTRUM_SCHEMA)


def probe_tiff_header(payload: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_ifd_entries) from a TIFF header — both byte
    orders ('II'/'MM'), first-IFD walk reading ImageWidth (256) and
    ImageLength (257) from SHORT or LONG entries, per the public TIFF 6.0
    spec. Header-only; None on anything unrecognized (never raises)."""
    try:
        if payload[:4] == b"II*\x00":
            endian = "little"
        elif payload[:4] == b"MM\x00*":
            endian = "big"
        else:
            return None

        def num(lo: int, n: int) -> int:
            return int.from_bytes(payload[lo : lo + n], endian)

        ifd = num(4, 4)
        count = num(ifd, 2)
        if count == 0 or count > 4096:
            return None
        w = h = None
        for e in range(count):
            base = ifd + 2 + 12 * e
            tag = num(base, 2)
            typ = num(base + 2, 2)
            if tag in (256, 257):
                val = num(base + 8, 2 if typ == 3 else 4)
                if tag == 256:
                    w = val
                else:
                    h = val
        if not w or not h:
            return None
        return (w, h, count)
    except Exception:
        return None


def _bmp_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal valid 8-bit paletted BMP (BITMAPINFOHEADER, grayscale
    identity palette, bottom-up rows, 4-byte row padding) from raw
    pixel bytes. Pure byte layout per the public BMP format."""
    import struct

    stride = (width + 3) & ~3
    pal = bytes(v for i in range(256) for v in (i, i, i, 0))
    rows = b"".join(
        pixels[r * width : (r + 1) * width].ljust(stride, b"\x00")
        for r in range(height - 1, -1, -1)
    )
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 0,
                       len(rows), 2835, 2835, 256, 0)
    return hdr + info + pal + rows


def decode_bmp(payload: bytes) -> tuple[int, int, str, bytearray] | None:
    """REAL BMP decode (BITMAPINFOHEADER, uncompressed): 24-bit BGR and
    8-bit paletted images, bottom-up or top-down rows, 4-byte row
    padding — per the public format. Returns the same (w, h, mode,
    samples) shape as the other image decoders; None for compressed
    (RLE) or other depths, and for anything corrupt (never raises)."""
    import struct

    try:
        if payload[:2] != b"BM":
            return None
        off = int.from_bytes(payload[10:14], "little")
        hsize = int.from_bytes(payload[14:18], "little")
        if hsize < 40:
            return None
        w, h = struct.unpack("<ii", payload[18:26])
        planes, bpp = struct.unpack("<HH", payload[26:30])
        comp = int.from_bytes(payload[30:34], "little")
        top_down = h < 0
        h = abs(h)
        if (planes != 1 or comp != 0 or w <= 0 or h == 0
                or bpp not in (8, 24)):
            return None
        if w * h * 3 > MAX_DECODE_SAMPLES:
            return None  # header-claimed size: decode bomb
        stride = (w * (bpp // 8) + 3) & ~3
        need = off + stride * h
        if len(payload) < need:
            return None
        if bpp == 8:
            n_colors = int.from_bytes(payload[46:50], "little") or 256
            pal_lo = 14 + hsize
            pal = payload[pal_lo : pal_lo + 4 * n_colors]
            if len(pal) < 4 * n_colors:
                return None
            gray = all(
                pal[4 * i] == pal[4 * i + 1] == pal[4 * i + 2]
                for i in range(n_colors)
            )
        out = bytearray()
        order = range(h) if top_down else range(h - 1, -1, -1)
        rows = [b""] * h
        for file_r, img_r in enumerate(order):
            rows[img_r] = payload[off + file_r * stride
                                  : off + file_r * stride + w * (bpp // 8)]
        if bpp == 24:
            for row in rows:
                for x in range(w):
                    b_, g, r = row[3 * x : 3 * x + 3]
                    out.extend((r, g, b_))          # BGR file order → RGB
            return (w, h, "RGB", out)
        for row in rows:
            if any(v >= n_colors for v in row):
                return None
            if gray:
                out.extend(pal[4 * v] for v in row)
            else:
                for v in row:
                    out.extend((pal[4 * v + 2], pal[4 * v + 1], pal[4 * v]))
        return (w, h, "L" if gray else "RGB", out)
    except Exception:
        return None


def synth_gray_bmp(
    df: DataFrame,
    content_col: str = "content",
    width: int = 4,
    height: int = 4,
) -> DataFrame:
    """Deterministic BMP synthesis: md5-digest pixels through the real
    paletted writer (bottom-up rows, stride padding) — same oracle-
    replayable contract as the PNG/GIF/JPEG synths. Narrow map."""
    n_px = width * height
    return _synth_digest_media(df, content_col, lambda px: _bmp_gray(px, width, height), n_px)


def _packbits_encode(data: bytes) -> bytes:
    """Real PackBits (TIFF 6.0 §9) RLE encode: runs of >=3 identical
    bytes become (257-n, byte); literals are chunked at 128."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = i
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            j = lit_start
            while j < i:                      # flush pending literals
                k = min(128, i - j)
                out.append(k - 1)
                out += data[j : j + k]
                j += k
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    j = lit_start
    while j < n:
        k = min(128, n - j)
        out.append(k - 1)
        out += data[j : j + k]
        j += k
    return bytes(out)


def _packbits_decode(data: bytes, max_out: int) -> bytes | None:
    """PackBits decode with an output bound (RLE is a trivial
    decompression bomb: 2 input bytes -> 128 output bytes)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:                            # h+1 literal bytes
            if i + h + 1 > n:
                return None
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:                          # 257-h repeats of next byte
            if i >= n:
                return None
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op per spec
        if len(out) > max_out:
            return None
    return bytes(out)


def decode_tiff(payload: bytes) -> tuple[int, int, str, bytearray] | None:
    """REAL TIFF pixel decode per the public TIFF 6.0 spec: both byte
    orders, first-IFD tag walk with out-of-line value arrays, strip
    assembly (StripOffsets/StripByteCounts/RowsPerStrip), uncompressed
    (Compression=1) and PackBits (32773) data, 8-bit grayscale
    (Photometric 0/1, WhiteIsZero inverted) and RGB (Photometric 2,
    SamplesPerPixel 3, chunky planar config). Returns the common
    (w, h, mode, samples) decoder shape; None for tiled/planar/other
    depths/compressions and anything corrupt (never raises)."""
    try:
        if payload[:4] == b"II*\x00":
            endian = "little"
        elif payload[:4] == b"MM\x00*":
            endian = "big"
        else:
            return None

        def num(lo: int, nb: int) -> int:
            if lo + nb > len(payload):
                raise ValueError("truncated")
            return int.from_bytes(payload[lo : lo + nb], endian)

        ifd = num(4, 4)
        count = num(ifd, 2)
        if count == 0 or count > 4096:
            return None
        _SZ = {1: 1, 3: 2, 4: 4}
        # only these tags are ever consulted — materializing value
        # arrays for arbitrary tags would let a hostile IFD (4096
        # entries × 2^20 values each) pin a core for minutes; skipped
        # tags are recorded presence-only. The strip arrays (273/279)
        # are additionally capped: h strips at most, one per row.
        _WANTED = {256, 257, 258, 259, 262, 273, 277, 278, 279, 284,
                   322, 323}
        tags: dict[int, list[int]] = {}
        budget = 1 << 16                       # TOTAL values across the
        for e in range(count):                 # IFD — duplicate wanted
            base = ifd + 2 + 12 * e            # tags must not multiply it
            tag, typ = num(base, 2), num(base + 2, 2)
            cnt = num(base + 4, 4)
            if (tag not in _WANTED or tag in tags or typ not in _SZ
                    or cnt > budget):
                tags.setdefault(tag, [])       # present but not readable
                continue
            budget -= cnt
            sz = _SZ[typ]
            lo = base + 8 if sz * cnt <= 4 else num(base + 8, 4)
            tags[tag] = [num(lo + sz * k, sz) for k in range(cnt)]

        if 322 in tags or 323 in tags:         # tiled layout unsupported
            return None
        w = (tags.get(256) or [0])[0]
        h = (tags.get(257) or [0])[0]
        photo = (tags.get(262) or [None])[0]
        comp = (tags.get(259) or [1])[0]
        spp = (tags.get(277) or [1])[0]
        planar = (tags.get(284) or [1])[0]
        bits = tags.get(258) or [1]
        offs = tags.get(273) or []
        counts = tags.get(279) or []
        rps = (tags.get(278) or [h])[0] or h
        if (not w or not h or planar != 1 or comp not in (1, 32773)
                or any(b != 8 for b in bits) or len(bits) != spp
                or len(offs) != len(counts) or not offs):
            return None
        if photo in (0, 1):
            if spp != 1:
                return None
        elif photo == 2:
            if spp != 3:
                return None
        else:
            return None
        if w * h * spp > MAX_DECODE_SAMPLES:
            return None                        # header-claimed size: bomb
        if len(offs) != -(-h // rps):          # strip count must cover image
            return None
        out = bytearray()
        for off, clen in zip(offs, counts):
            strip = payload[off : off + clen]
            if len(strip) < clen:
                return None
            if comp == 32773:
                dec = _packbits_decode(strip, w * h * spp - len(out))
                if dec is None:
                    return None
                out += dec
            else:
                out += strip
        if len(out) != w * h * spp:
            return None
        if photo == 0:                         # WhiteIsZero -> invert
            out = bytearray(255 - v for v in out)
        return (w, h, "L" if spp == 1 else "RGB", out)
    except Exception:
        return None


def _tiff_gray(
    pixels: bytes, width: int, height: int, *,
    rows_per_strip: int = 1 << 30, packbits: bool = False,
    big_endian: bool = False,
) -> bytes:
    """Minimal valid grayscale TIFF (single IFD, BlackIsZero, chunky,
    optional multi-strip + PackBits compression, either byte order) from
    raw pixel bytes. Pure TIFF 6.0 byte layout."""
    bo = "big" if big_endian else "little"
    rps = min(rows_per_strip, height)
    strips = []
    for r0 in range(0, height, rps):
        raw = pixels[r0 * width : min(r0 + rps, height) * width]
        strips.append(_packbits_encode(raw) if packbits else raw)
    n_ifd = 9
    # layout: header(8) | IFD | strip-offset array | strip-count array | data
    ifd_lo = 8
    arr_lo = ifd_lo + 2 + 12 * n_ifd + 4
    need_arrays = len(strips) > 1
    data_lo = arr_lo + (8 * len(strips) if need_arrays else 0)
    offs, cur = [], data_lo
    for s in strips:
        offs.append(cur)
        cur += len(s)

    def ent(tag: int, typ: int, cnt: int, val: int) -> bytes:
        sz = {3: 2, 4: 4}[typ]
        inline = val.to_bytes(sz, bo).ljust(4, b"\x00")
        return (tag.to_bytes(2, bo) + typ.to_bytes(2, bo)
                + cnt.to_bytes(4, bo) + inline)

    if need_arrays:
        off_ent = ent(273, 4, len(strips), arr_lo)
        cnt_ent = ent(279, 4, len(strips), arr_lo + 4 * len(strips))
    else:
        off_ent = ent(273, 4, 1, offs[0])
        cnt_ent = ent(279, 4, 1, len(strips[0]))
    entries = [
        ent(256, 3, 1, width), ent(257, 3, 1, height),
        ent(258, 3, 1, 8), ent(259, 3, 1, 32773 if packbits else 1),
        ent(262, 3, 1, 1), off_ent, ent(277, 3, 1, 1),
        ent(278, 3, 1, rps), cnt_ent,
    ]
    entries.sort(key=lambda e: int.from_bytes(e[:2], bo))  # spec: ascending
    out = bytearray()
    out += (b"II*\x00" if not big_endian else b"MM\x00*")
    out += ifd_lo.to_bytes(4, bo)
    out += n_ifd.to_bytes(2, bo)
    for e in entries:
        out += e
    out += (0).to_bytes(4, bo)                 # next-IFD pointer
    if need_arrays:
        for o in offs:
            out += o.to_bytes(4, bo)
        for s in strips:
            out += len(s).to_bytes(4, bo)
    for s in strips:
        out += s
    return bytes(out)


def synth_gray_tiff(
    df: DataFrame,
    content_col: str = "content",
    width: int = 6,
    height: int = 3,
) -> DataFrame:
    """Deterministic TIFF synthesis: md5-digest pixels through the real
    writer with PackBits compression and 2-row strips, so the decode
    path exercises RLE decompression and multi-strip assembly on every
    image — same oracle-replayable contract as the PNG/GIF/BMP synths."""
    n_px = width * height
    return _synth_digest_media(df, content_col, lambda px: _tiff_gray(px, width, height, rows_per_strip=2, packbits=True), n_px)


def _pnm_token(payload: bytes, i: int) -> tuple[int, int]:
    """One whitespace/comment-delimited integer token from a Netpbm
    header or ASCII raster: returns (value, next_index); raises on a
    missing token (callers convert to None)."""
    n = len(payload)
    while True:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i] == 0x23:               # '#' comment
            while i < n and payload[i] not in (0x0A, 0x0D):
                i += 1
        else:
            break
    j = i
    while j < n and payload[j : j + 1].isdigit():
        j += 1
    if j == i:
        raise ValueError("bad header token")
    return int(payload[i:j]), j


def _pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int] | None:
    """(magic, width, height, maxval, raster_index) from a Netpbm header
    — O(header) only, never touches pixel data, so the triage probe
    stays cheap on multi-megabyte ASCII rasters."""
    try:
        magic = payload[:2]
        if magic not in (b"P2", b"P3", b"P5", b"P6"):
            return None
        w, i = _pnm_token(payload, 2)
        h, i = _pnm_token(payload, i)
        maxval, i = _pnm_token(payload, i)
        if w <= 0 or h <= 0 or not 0 < maxval <= 255:
            return None
        return (magic, w, h, maxval, i)
    except Exception:
        return None


def decode_pnm(payload: bytes) -> tuple[int, int, str, bytearray] | None:
    """REAL Netpbm decode per the public PGM/PPM specs: P5/P6 binary and
    P2/P3 ASCII variants, '#' comments anywhere in the header, maxval up
    to 255 (16-bit maxvals rejected), exactly one whitespace byte
    between maxval and binary raster. Returns the common (w, h, mode,
    samples) decoder shape; None for P1/P4 bitmaps, 16-bit data, and
    anything corrupt (never raises)."""
    try:
        head = _pnm_header(payload)
        if head is None:
            return None
        magic, w, h, maxval, i = head
        ascii_ = magic in (b"P2", b"P3")
        gray = magic in (b"P2", b"P5")
        n = len(payload)
        spp = 1 if gray else 3
        need = w * h * spp
        if need > MAX_DECODE_SAMPLES:
            return None
        if ascii_:
            vals = []
            for _ in range(need):
                v, i = _pnm_token(payload, i)
                vals.append(v)
            if any(v > maxval for v in vals):
                return None
            out = bytearray(vals)
        else:
            if i >= n or not payload[i : i + 1].isspace():
                return None
            i += 1                                     # single WS then raster
            raster = payload[i : i + need]
            if len(raster) < need or any(v > maxval for v in raster):
                return None
            out = bytearray(raster)
        if maxval != 255:                              # scale to full range
            out = bytearray((v * 255 + maxval // 2) // maxval for v in out)
        return (w, h, "L" if gray else "RGB", out)
    except Exception:
        return None


def _pgm_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal valid binary PGM (P5, maxval 255) from raw pixel bytes."""
    return b"P5\n%d %d\n255\n" % (width, height) + pixels


def synth_gray_pnm(
    df: DataFrame,
    content_col: str = "content",
    width: int = 4,
    height: int = 5,
) -> DataFrame:
    """Deterministic PGM synthesis: md5-digest pixels through the real
    P5 writer — same oracle-replayable contract as the other synths."""
    n_px = width * height
    return _synth_digest_media(df, content_col, lambda px: _pgm_gray(px, width, height), n_px)


def _f80_to_int(b: bytes) -> int | None:
    """Decode an 80-bit IEEE 754 extended float (AIFF sample-rate field)
    to a non-negative integer — sample rates are exact integers, so the
    mantissa shift is exact; None for negatives/NaN/inf/fractional."""
    if len(b) != 10:
        return None
    sign = b[0] >> 7
    exp = ((b[0] & 0x7F) << 8) | b[1]
    mant = int.from_bytes(b[2:10], "big")
    if exp == 0 and mant == 0:
        return 0
    if sign or exp in (0, 0x7FFF):
        return None
    shift = exp - 16383 - 63
    if shift >= 0:
        return mant << shift
    if mant & ((1 << -shift) - 1):
        return None                            # fractional rate
    return mant >> -shift


def _int_to_f80(v: int) -> bytes:
    """Encode a positive integer as an 80-bit IEEE extended float."""
    e = v.bit_length() - 1
    return ((16383 + e).to_bytes(2, "big")
            + (v << (63 - e)).to_bytes(8, "big"))


def decode_aiff(payload: bytes) -> tuple[int, int, list[int]] | None:
    """REAL pure-stdlib AIFF decode per the public AIFF-1.3 spec: FORM
    container walk (even-padded chunks), COMM (channels / frame count /
    sample size / 80-bit extended-float rate), SSND (offset + blockSize
    header, big-endian PCM — 16-bit signed, or 8-bit which AIFF defines
    as SIGNED, unlike WAV's unsigned 8-bit). Returns the same
    (sample_rate, n_channels, samples) shape as `decode_wav`; None for
    AIFC/compressed/other depths and anything corrupt (never raises)."""
    import struct

    try:
        if payload[:4] != b"FORM" or payload[8:12] != b"AIFF":
            return None
        i, n = 12, len(payload)
        comm = data = None
        while i + 8 <= n:
            cid = payload[i : i + 4]
            clen = int.from_bytes(payload[i + 4 : i + 8], "big")
            body = payload[i + 8 : i + 8 + clen]
            if cid == b"COMM" and clen >= 18:
                ch, nf, bits = struct.unpack(">hIh", body[:8])
                sr = _f80_to_int(body[8:18])
                comm = (ch, nf, bits, sr)
            elif cid == b"SSND" and clen >= 8:
                off, _block = struct.unpack(">II", body[:8])
                data = body[8 + off :]
            i += 8 + clen + (clen & 1)         # chunks are word-aligned
        if comm is None or data is None:
            return None
        ch, nf, bits, sr = comm
        if ch < 1 or not sr or nf * ch > MAX_DECODE_SAMPLES:
            return None
        if bits == 16:
            if len(data) < nf * ch * 2:
                return None
            samples = list(struct.unpack(f">{nf * ch}h", data[: nf * ch * 2]))
        elif bits == 8:
            if len(data) < nf * ch:
                return None
            samples = list(struct.unpack(f"{nf * ch}b", data[: nf * ch]))
        else:
            return None
        return (sr, ch, samples)
    except Exception:
        return None


def _aiff_pcm16(samples: list[int], sample_rate: int) -> bytes:
    """Minimal valid mono PCM16 AIFF from signed samples — FORM/COMM/
    SSND with correct sizes and the real 80-bit extended rate field."""
    import struct

    data = struct.pack(f">{len(samples)}h", *samples)
    comm = struct.pack(">hIh", 1, len(samples), 16) + _int_to_f80(sample_rate)
    ssnd = struct.pack(">II", 0, 0) + data
    body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


def synth_aiff(
    df: DataFrame, content_col: str = "content", sample_rate: int = 8000
) -> DataFrame:
    """Deterministic AIFF synthesis: each payload becomes a real mono
    PCM16 AIFF whose 8 frames are the payload's md5 digest read as
    BIG-endian int16 pairs (the format's native byte order) — the
    byte-order mirror of `synth_wav`, equally oracle-replayable."""
    import struct

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                digest = hashlib.md5(bytes(p)).digest()
                samples = list(struct.unpack(">8h", digest))
                out.append(_aiff_pcm16(samples, sample_rate))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


# --- MP3 / ADTS full-file frame walks (codec-free duration) ------------------
#
# Sample decode for MP3/AAC genuinely needs a codec library (huge Huffman
# + filterbank tables) and stays stubbed — but DURATION and VBR bitrate
# come from the frame headers alone: each Layer-III / ADTS frame declares
# its own byte length, so walking the chain is exact, linear, and
# hostile-input safe. This is the statistic a 100 TB crawl actually
# needs before deciding whether a payload is worth real decoding.

_ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000, 7350, None, None, None)


def _mp3_frame_at(payload: bytes, i: int) -> tuple[int, int, int] | None:
    """Parse one Layer-III frame header at offset i: returns
    (flen, samples_per_frame, sample_rate, kbps), or None if the bytes
    are not a valid header for a whole frame within the payload."""
    n = len(payload)
    if i + 4 > n:
        return None
    if not (payload[i] == 0xFF and (payload[i + 1] & 0xE0) == 0xE0):
        return None
    version = (payload[i + 1] >> 3) & 0x3
    layer = (payload[i + 1] >> 1) & 0x3
    if version == 1 or layer != 1:
        return None
    br_idx = (payload[i + 2] >> 4) & 0xF
    sr_idx = (payload[i + 2] >> 2) & 0x3
    pad = (payload[i + 2] >> 1) & 0x1
    table = _MP3_BITRATES_V1L3 if version == 3 else _MP3_BITRATES_V2L3
    if sr_idx == 3 or table[br_idx] is None:
        return None
    kbps = table[br_idx]
    sr = _MP3_RATES[version][sr_idx]
    if version == 3:
        flen, spf = (144000 * kbps) // sr + pad, 1152
    else:
        flen, spf = (72000 * kbps) // sr + pad, 576
    if flen < 4 or i + flen > n:
        return None
    return (flen, spf, sr, kbps)


def walk_mp3_frames(payload: bytes) -> tuple[int, float, int] | None:
    """(n_frames, duration_sec, bitrate_sum_kbps) by walking EVERY
    MPEG-1/2/2.5 Layer-III frame: per-frame byte length is
    144000·kbps/rate (+padding) for MPEG-1 and 72000·kbps/rate for
    MPEG-2/2.5 (576-sample frames), so VBR streams sum exactly. ID3v2
    and junk prefixes are scanned past until a WHOLE valid frame parses
    (a sync-looking byte pair with reserved header fields does not end
    the search); after the first frame the chain walk stops at the
    first non-frame byte. None unless at least one frame parses. Never
    raises."""
    try:
        n = len(payload)
        i = 0
        if payload[:3] == b"ID3" and n >= 10:
            i = 10 + ((payload[6] << 21) | (payload[7] << 14)
                      | (payload[8] << 7) | payload[9])
        while i + 4 <= n and _mp3_frame_at(payload, i) is None:
            i += 1
        frames = 0
        duration = 0.0
        kbps_sum = 0
        while True:
            got = _mp3_frame_at(payload, i)
            if got is None:
                break
            flen, spf, sr, kbps = got
            frames += 1
            duration += spf / sr
            kbps_sum += kbps
            i += flen
        if frames == 0:
            return None
        return (frames, duration, kbps_sum)
    except Exception:
        return None


def _adts_frame_at(payload: bytes, i: int) -> tuple[int, int, int, int] | None:
    """Parse one ADTS frame header at offset i: (flen, n_blocks, sr, ch)
    or None unless a whole valid frame fits."""
    n = len(payload)
    if i + 7 > n:
        return None
    if not (payload[i] == 0xFF and (payload[i + 1] & 0xF6) == 0xF0):
        return None
    sr_idx = (payload[i + 2] >> 2) & 0xF
    sr = _ADTS_RATES[sr_idx]
    ch = ((payload[i + 2] & 0x1) << 2) | (payload[i + 3] >> 6)
    flen = (((payload[i + 3] & 0x3) << 11)
            | (payload[i + 4] << 3) | (payload[i + 5] >> 5))
    nblocks = (payload[i + 6] & 0x3) + 1
    if sr is None or ch == 0 or flen < 7 or i + flen > n:
        return None
    return (flen, nblocks, sr, ch)


def walk_adts_frames(payload: bytes) -> tuple[int, float, int, int] | None:
    """(n_frames, duration_sec, sample_rate, n_channels) by walking
    ADTS AAC frames via each header's own 13-bit length field. Each
    ADTS frame carries number_of_raw_data_blocks+1 AAC frames of 1024
    samples (ISO 13818-7), so duration credits nblocks·1024/rate. Junk
    prefixes are scanned past until a WHOLE valid frame parses; the
    walk then stops at the first non-frame byte or mid-stream
    parameter change. None unless at least one frame parses. Never
    raises."""
    try:
        n = len(payload)
        i = 0
        while i + 7 <= n and _adts_frame_at(payload, i) is None:
            i += 1
        frames = 0
        duration = 0.0
        sr = ch = None
        while True:
            got = _adts_frame_at(payload, i)
            if got is None:
                break
            flen, nblocks, this_sr, this_ch = got
            if sr is None:
                sr, ch = this_sr, this_ch
            elif (this_sr, this_ch) != (sr, ch):
                break                # mid-stream parameter change
            frames += 1
            duration += nblocks * 1024 / sr
            i += flen
        if frames == 0:
            return None
        return (frames, duration, sr, ch)
    except Exception:
        return None


def _mp3_frame(kbps_idx: int, pad: int, fill: int = 0xAA) -> bytes:
    """One MPEG-1 Layer-III 44.1 kHz mono frame with declared length."""
    kbps = _MP3_BITRATES_V1L3[kbps_idx]
    flen = (144000 * kbps) // 44100 + pad
    hdr = bytes([
        0xFF,
        0xFB,                        # MPEG1, Layer III, no CRC
        (kbps_idx << 4) | (0 << 2) | (pad << 1),
        0xC0,                        # mono
    ])
    return hdr + bytes([fill]) * (flen - 4)


def _adts_frame(sr_idx: int, ch: int, body_len: int) -> bytes:
    """One ADTS frame (protection absent) with declared total length."""
    flen = 7 + body_len
    hdr = bytes([
        0xFF, 0xF1,                  # sync, MPEG-4, layer 0, no CRC
        (1 << 6) | (sr_idx << 2) | ((ch >> 2) & 1),
        ((ch & 0x3) << 6) | ((flen >> 11) & 0x3),
        (flen >> 3) & 0xFF,
        ((flen & 0x7) << 5) | 0x1F,
        0xFC,
    ])
    return hdr + bytes([0xAB]) * body_len


AUDIO_SCAN_SCHEMA = (
    "media_id bigint, n_frames int, duration_sec double, "
    "bitrate_sum_kbps bigint"
)


def mp3_scan_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Full-file MP3 frame walk per payload — narrow Arrow-batched map,
    NULL features for undecodable payloads (hostile-input contract)."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nfs, durs, sums = [], [], []
            for p in pdf[content_col]:
                got = walk_mp3_frames(bytes(p))
                nfs.append(got[0] if got else None)
                durs.append(got[1] if got else None)
                sums.append(got[2] if got else None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_frames": pd.array(nfs, dtype="Int32"),
                "duration_sec": pd.array(durs, dtype="float64"),
                "bitrate_sum_kbps": pd.array(sums, dtype="Int64"),
            })

    return df.mapInPandas(compute, schema=AUDIO_SCAN_SCHEMA)


def synth_mp3(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Deterministic VBR MP3 synthesis: digest byte 0 picks the frame
    count (2-6), frame i's bitrate index is digest[i] % 14 + 1 and its
    padding bit is digest[i] >> 7 — a genuine variable-bitrate frame
    chain whose walk statistics replay exactly from md5(payload)."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                d = hashlib.md5(bytes(p)).digest()
                n = d[0] % 5 + 2
                out.append(b"".join(
                    _mp3_frame(d[i] % 14 + 1, d[i] >> 7) for i in range(n)
                ))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


ADTS_SCAN_SCHEMA = (
    "media_id bigint, n_frames int, duration_sec double, "
    "sample_rate int, n_channels int"
)


def adts_scan_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Full-file ADTS/AAC frame walk per payload — same narrow map and
    NULL-on-hostile contract as `mp3_scan_features`."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nfs, durs, srs, chs = [], [], [], []
            for p in pdf[content_col]:
                got = walk_adts_frames(bytes(p))
                nfs.append(got[0] if got else None)
                durs.append(got[1] if got else None)
                srs.append(got[2] if got else None)
                chs.append(got[3] if got else None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_frames": pd.array(nfs, dtype="Int32"),
                "duration_sec": pd.array(durs, dtype="float64"),
                "sample_rate": pd.array(srs, dtype="Int32"),
                "n_channels": pd.array(chs, dtype="Int32"),
            })

    return df.mapInPandas(compute, schema=ADTS_SCAN_SCHEMA)


def synth_adts(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Deterministic ADTS synthesis: digest byte 0 picks the frame count
    (1-4), byte 1 the sample-rate index (of the 3 common rates) and
    channel count (1-2); frame i's body length is digest[i] — variable
    frame lengths chain the walk exactly like real AAC."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                d = hashlib.md5(bytes(p)).digest()
                n = d[0] % 4 + 1
                sr_idx = (3, 4, 11)[d[1] % 3]   # 48000 / 44100 / 8000
                ch = d[1] % 2 + 1
                out.append(b"".join(
                    _adts_frame(sr_idx, ch, d[i]) for i in range(n)
                ))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


def _finish_rgba(w: int, h: int, out: bytearray, opaque: bool):
    """Shared RGBA finisher: fully-opaque images collapse to RGB so
    downstream luminance math sees 3 channels (ICO and TGA both need
    this; one definition keeps their alpha semantics identical)."""
    if opaque:
        return (w, h, "RGB", bytearray(
            v for i, v in enumerate(out) if i % 4 != 3
        ))
    return (w, h, "RGBA", out)


def decode_ico(payload: bytes) -> tuple[int, int, str, bytearray] | None:
    """REAL ICO/CUR (favicon) decode per the public format: directory
    walk picking the largest image, then either an embedded PNG
    (delegated to `decode_png`) or an ICO-style DIB — a BITMAPINFOHEADER
    with DOUBLED height (XOR pixels + AND transparency mask) and no 'BM'
    file header, rebuilt into a BMP for `decode_bmp`. Favicons are
    everywhere in a web crawl, so this is an ingest-relevant container.
    1-bit AND masks are parsed but transparency is not applied (the
    common 32-bit-with-alpha and PNG forms carry their own alpha).
    None for anything corrupt — never raises."""
    import struct

    try:
        if len(payload) < 6:
            return None
        res, typ, count = struct.unpack("<HHH", payload[:6])
        if res != 0 or typ not in (1, 2) or count == 0 or count > 64:
            return None
        best = None
        for e in range(count):
            base = 6 + 16 * e
            if base + 16 > len(payload):
                return None
            bw, bh = payload[base], payload[base + 1]
            bw, bh = bw or 256, bh or 256      # 0 encodes 256
            size, off = struct.unpack("<II", payload[base + 8 : base + 16])
            if best is None or bw * bh > best[0] * best[1]:
                best = (bw, bh, size, off)
        w, h, size, off = best
        body = payload[off : off + size]
        if len(body) < size:
            return None
        if body[:8] == b"\x89PNG\r\n\x1a\n":
            return decode_png(body)
        if len(body) < 40:
            return None
        hsize = int.from_bytes(body[0:4], "little")
        dib_h = int.from_bytes(body[8:12], "little", signed=True)
        if hsize != 40:
            return None
        # ICO DIBs store XOR+AND stacked: height is doubled
        xor_h = abs(dib_h) // 2
        bpp = int.from_bytes(body[14:16], "little")
        if bpp == 32:
            # 32-bit BGRA: decode inline (decode_bmp handles 8/24 only).
            # The DIB's biWidth is authoritative — the 1-byte directory
            # dims are frequently sloppy in real favicons, and slicing
            # rows with the wrong stride would yield silent garbage.
            dib_w = int.from_bytes(body[4:8], "little", signed=True)
            comp = int.from_bytes(body[16:20], "little")
            if comp != 0 or xor_h == 0 or dib_w <= 0:
                return None
            w = dib_w
            if w * xor_h * 4 > MAX_DECODE_SAMPLES:
                return None
            stride = w * 4
            if 40 + stride * xor_h > len(body):
                return None
            out = bytearray()
            opaque = True
            rows = range(xor_h - 1, -1, -1) if dib_h > 0 else range(xor_h)
            px = body[40:]
            for r in rows:
                row = px[r * stride : (r + 1) * stride]
                for x in range(w):
                    b_, g, rr, a = row[4 * x : 4 * x + 4]
                    out.extend((rr, g, b_, a))
                    if a != 0xFF:
                        opaque = False
            return _finish_rgba(w, xor_h, out, opaque)
        # 8-bit paletted / 24-bit: rebuild a standalone BMP with the
        # XOR block only and hand it to the real BMP decoder
        fixed = bytearray(body)
        fixed[8:12] = (xor_h if dib_h > 0 else -xor_h).to_bytes(
            4, "little", signed=True
        )
        # body starts at the info header (no BM prefix): biClrUsed at 32
        n_colors = int.from_bytes(body[32:36], "little") or (
            256 if bpp == 8 else 0
        )
        data_off = 14 + 40 + 4 * n_colors
        hdr = b"BM" + struct.pack("<IHHI", data_off, 0, 0, data_off)
        return decode_bmp(hdr + bytes(fixed))
    except Exception:
        return None


def synth_favicon(
    df: DataFrame,
    content_col: str = "content",
    width: int = 4,
    height: int = 4,
) -> DataFrame:
    """Deterministic favicon synthesis: digest pixels through the real
    PNG encoder wrapped in a genuine ICO directory (the dominant
    favicon form on the web) — same oracle-replayable contract as the
    other codec synths."""
    import struct

    def enc(px: bytes) -> bytes:
        png = _png_gray(px, width, height)
        return (struct.pack("<HHH", 0, 1, 1)
                + bytes([width % 256, height % 256, 0, 0])
                + struct.pack("<HHII", 1, 32, len(png), 22)
                + png)

    return _synth_digest_media(df, content_col, enc, width * height)


def probe_svg_header(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from an SVG document — the other favicon/figure
    format a web crawl meets constantly. Parses the root <svg> element
    with the stdlib XML pull parser (no regex over attacker markup):
    integer-pixel width/height attributes preferred (px suffix
    tolerated), viewBox fallback. Header-only triage like the other
    probes; None for non-SVG/corrupt/unsized documents (never raises)."""
    try:
        # cheap gate before any XML work; 'svg' alone (not '<svg') so
        # namespace-prefixed roots like <s:svg> still qualify
        if b"svg" not in payload[:4096] or payload.lstrip()[:1] != b"<":
            return None
        # bound the parse input (the root tag of any sane SVG sits well
        # inside 1 MiB) and refuse DTDs outright: entity expansion in a
        # root ATTRIBUTE would otherwise amplify a crawl blob ~100×
        # inside this "header-only" probe — the decode-bomb class every
        # other probe closes via explicit ceilings
        head = payload[: 1 << 20]
        if b"<!DOCTYPE" in head or b"<!ENTITY" in head:
            return None
        import io
        import xml.etree.ElementTree as ET

        # pull-parse only to the root element: hostile payloads with
        # megabytes of children never get walked
        for _event, elem in ET.iterparse(
            io.BytesIO(head), events=("start",)
        ):
            if elem.tag.rsplit("}", 1)[-1] != "svg":
                return None          # exact localname, any namespace

            def dim(name: str) -> int | None:
                v = elem.get(name, "").strip().removesuffix("px")
                return int(v) if v.isdigit() and int(v) > 0 else None

            w, h = dim("width"), dim("height")
            if w and h:
                return (w, h)
            vb = elem.get("viewBox", "").replace(",", " ").split()
            if len(vb) == 4:
                try:
                    w = int(float(vb[2]))
                    h = int(float(vb[3]))
                    if w > 0 and h > 0:
                        return (w, h)
                except ValueError:
                    return None
            return None
        return None
    except Exception:
        return None


def decode_tga(payload: bytes) -> tuple[int, int, str, bytearray] | None:
    """REAL TGA (Targa) decode per the public spec: type 2 (uncompressed
    true-color 24/32-bit BGR(A)), type 3 (uncompressed 8-bit gray), and
    their RLE twins 10/11 (packet header: bit 7 = run, low 7 bits =
    count-1), bottom-up or top-down via the descriptor origin bit.
    TGA has NO magic number, so structural fields are validated
    strictly (zero color-map for the supported types, known depths).
    None for color-mapped/corrupt payloads — never raises."""
    try:
        if len(payload) < 18:
            return None
        id_len = payload[0]
        cmap_type = payload[1]
        img_type = payload[2]
        w = int.from_bytes(payload[12:14], "little")
        h = int.from_bytes(payload[14:16], "little")
        bpp = payload[16]
        desc = payload[17]
        if cmap_type != 0 or img_type not in (2, 3, 10, 11):
            return None
        if payload[3:8] != b"\x00\x00\x00\x00\x00":  # no color map fields
            return None
        gray = img_type in (3, 11)
        rle = img_type in (10, 11)
        if w == 0 or h == 0 or (gray and bpp != 8) \
                or (not gray and bpp not in (24, 32)):
            return None
        npx = w * h
        nch = bpp // 8
        if npx * nch > MAX_DECODE_SAMPLES:
            return None
        i = 18 + id_len
        if rle:
            raw = bytearray()
            while len(raw) < npx * nch:
                if i >= len(payload):
                    return None
                hdr = payload[i]
                i += 1
                count = (hdr & 0x7F) + 1
                if hdr & 0x80:       # run packet
                    px = payload[i : i + nch]
                    if len(px) < nch:
                        return None
                    i += nch
                    raw += px * count
                else:                # literal packet
                    lit = payload[i : i + count * nch]
                    if len(lit) < count * nch:
                        return None
                    i += count * nch
                    raw += lit
            raw = raw[: npx * nch]
        else:
            raw = payload[i : i + npx * nch]
            if len(raw) < npx * nch:
                return None
        top_down = bool(desc & 0x20)
        right_to_left = bool(desc & 0x10)
        rows = [raw[r * w * nch : (r + 1) * w * nch] for r in range(h)]
        if not top_down:
            rows = rows[::-1]
        if right_to_left:            # spec origin bit: mirror each row
            rows = [
                b"".join(row[x * nch : (x + 1) * nch]
                         for x in range(w - 1, -1, -1))
                for row in rows
            ]
        if gray:
            return (w, h, "L", bytearray(b"".join(rows)))
        out = bytearray()
        opaque = True
        for row in rows:
            for x in range(w):
                px = row[x * nch : (x + 1) * nch]
                out.extend((px[2], px[1], px[0]))
                if nch == 4:
                    out.append(px[3])
                    if px[3] != 0xFF:
                        opaque = False
        if nch == 3:
            return (w, h, "RGB", out)
        return _finish_rgba(w, h, out, opaque)
    except Exception:
        return None


def _tga_gray(pixels: bytes, width: int, height: int,
              rle: bool = False) -> bytes:
    """Minimal valid 8-bit grayscale TGA (top-down), optionally RLE."""
    hdr = bytes([0, 0, 11 if rle else 3]) + bytes(9) \
        + width.to_bytes(2, "little") + height.to_bytes(2, "little") \
        + bytes([8, 0x20])
    if not rle:
        return hdr + pixels
    out = bytearray(hdr)
    i, n = 0, len(pixels)
    while i < n:
        run = 1
        while i + run < n and run < 128 and pixels[i + run] == pixels[i]:
            run += 1
        if run >= 2:
            out.append(0x80 | (run - 1))
            out.append(pixels[i])
            i += run
        else:
            j = i + 1
            while (j < n and j - i < 128
                   and not (j + 1 < n and pixels[j] == pixels[j + 1])):
                j += 1
            out.append(j - i - 1)
            out += pixels[i:j]
            i = j
    return bytes(out)


def synth_gray_tga(
    df: DataFrame,
    content_col: str = "content",
    width: int = 6,
    height: int = 4,
) -> DataFrame:
    """Deterministic TGA synthesis: digest pixels through the real RLE
    writer — same oracle-replayable contract as the other synths."""
    return _synth_digest_media(
        df, content_col,
        lambda px: _tga_gray(px, width, height, rle=True), width * height,
    )


def synth_svg(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Deterministic SVG synthesis: digest bytes pick the root element's
    pixel dimensions (w = byte0 % 256 + 1, h = byte1 % 256 + 1)."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                d = hashlib.md5(bytes(p)).digest()
                out.append(
                    b'<?xml version="1.0"?><svg xmlns='
                    b'"http://www.w3.org/2000/svg" width="%d" height="%d">'
                    b"<rect/></svg>" % (d[0] + 1, d[1] + 1)
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


def walk_gif_frames(payload: bytes) -> tuple[int, int, int, int] | None:
    """(n_frames, total_delay_cs, width, height) from an animated GIF by
    walking the container only — image descriptors counted, Graphic
    Control Extension delays (centiseconds) summed, LZW data sub-blocks
    skipped by their declared lengths, never decompressed. Truncation
    semantics match the MP3/ADTS walks: whole frames count, a frame cut
    anywhere (descriptor, palette, or data stream) is dropped and ends
    the walk. None unless at least one complete frame is present (never
    raises)."""
    import struct

    def skip_subblocks(i: int) -> int | None:
        """Past the 0-terminated sub-block chain; None if it overruns."""
        while i < n:
            if payload[i] == 0:
                return i + 1
            i += 1 + payload[i]
        return None

    try:
        if payload[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
        i = 13
        if packed & 0x80:
            i += 3 * (2 << (packed & 0x07))
        n = len(payload)
        frames = 0
        delay_cs = 0
        pending_delay = 0
        while i < n:
            b = payload[i]
            if b == 0x3B:            # trailer
                break
            if b == 0x21:            # extension
                if i + 2 > n:
                    break
                label = payload[i + 1]
                i += 2
                if label == 0xF9 and i + 5 <= n and payload[i] == 4:
                    pending_delay = int.from_bytes(
                        payload[i + 2 : i + 4], "little"
                    )
                nxt = skip_subblocks(i)
                if nxt is None:
                    break
                i = nxt
            elif b == 0x2C:          # image descriptor
                if i + 10 > n:
                    break            # truncated frame: drop it
                lpacked = payload[i + 9]
                i += 10
                if lpacked & 0x80:
                    i += 3 * (2 << (lpacked & 0x07))
                i += 1               # LZW minimum code size
                if i > n:
                    break
                nxt = skip_subblocks(i)
                if nxt is None:
                    break            # data stream cut mid-frame
                i = nxt
                frames += 1
                delay_cs += pending_delay
                pending_delay = 0
            else:
                return None
        if frames == 0:
            return None
        return (frames, delay_cs, sw, sh)
    except Exception:
        return None


def synth_animated_gif(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Deterministic animated-GIF synthesis: digest byte 0 picks the
    frame count (1-4); frame i is a REAL 4×4 LZW-encoded image preceded
    by a Graphic Control Extension whose delay is digest[i] cs."""
    import struct

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                d = hashlib.md5(bytes(p)).digest()
                nf = d[0] % 4 + 1
                single = _gif_gray(d, 4, 4)
                # header(6) + LSD(7) + GCT (3·(2<<(packed&7)) bytes);
                # the frame body between there and the trailer repeats
                hdr_end = 13 + 3 * (2 << (single[10] & 0x07))
                body = single[hdr_end:-1]      # image blocks, no trailer
                frames = b""
                for k in range(nf):
                    gce = (b"\x21\xf9\x04\x00"
                           + struct.pack("<H", d[k]) + b"\x00\x00")
                    frames += gce + body
                # GCE blocks are 89a-only; _gif_gray stamps 87a
                out.append(b"GIF89a" + single[6:hdr_end] + frames + b"\x3b")
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)


# --- EXIF orientation (crawl-image normalization) ---------------------------
#
# Real crawl JPEGs carry camera rotation in the Exif APP1 segment (tag 274,
# a TIFF-IFD structure per the public Exif 2.3 / TIFF 6.0 specs); a resize/
# feature pipeline that ignores it trains on sideways images. Reference
# analog: the images mart columns (jobs/load/observation_mapper.py:851-997)
# consume externally-produced media where orientation is the first
# normalization step.

def _tiff_ifd_orientation(d: bytes, base: int) -> int | None:
    """Orientation (tag 274, SHORT, 1..8) from a TIFF structure starting
    at ``base`` — both byte orders, first IFD only, entry-count bomb cap
    as in probe_tiff_header. None when absent/invalid (never raises)."""
    try:
        hdr = d[base : base + 4]
        if hdr[:2] == b"II" and hdr[2:4] == b"*\x00":
            endian = "little"
        elif hdr[:2] == b"MM" and hdr[2:4] == b"\x00*":
            endian = "big"
        else:
            return None

        def num(lo: int, n: int) -> int:
            return int.from_bytes(d[base + lo : base + lo + n], endian)

        ifd = num(4, 4)
        count = num(ifd, 2)
        if count == 0 or count > 4096:
            return None
        for e in range(count):
            eb = ifd + 2 + 12 * e
            if num(eb, 2) == 274 and num(eb + 2, 2) == 3:  # SHORT
                v = num(eb + 8, 2)
                return v if 1 <= v <= 8 else None
        return None
    except Exception:
        return None


def exif_orientation(payload: bytes) -> int | None:
    """EXIF orientation (1..8) from a JPEG's APP1 Exif segment or a bare
    TIFF; None when absent/unparseable — never raises. 1 = upright;
    2..8 = the seven mirror/rotate states of the Exif spec."""
    try:
        d = payload
        if d[:4] in (b"II*\x00", b"MM\x00*"):
            return _tiff_ifd_orientation(d, 0)
        if d[:2] != b"\xff\xd8":
            return None
        i = 2
        while i + 4 <= len(d):
            if d[i] != 0xFF:
                return None
            marker = d[i + 1]
            if marker in (0xDA, 0xD9):      # scan data / EOI: no Exif
                return None
            seg_len = int.from_bytes(d[i + 2 : i + 4], "big")
            if marker == 0xE1 and d[i + 4 : i + 10] == b"Exif\x00\x00":
                return _tiff_ifd_orientation(d, i + 10)
            i += 2 + seg_len
        return None
    except Exception:
        return None


def add_exif_orientation(jpeg: bytes, orientation: int) -> bytes:
    """Splice a minimal valid Exif APP1 segment (TIFF header + 1-entry
    IFD0 carrying tag 274) right after SOI — the synth twin for
    `exif_orientation`, so probe queries exercise the real marker walk
    on really-encoded JPEGs."""
    if not 1 <= orientation <= 8:
        raise ValueError("orientation must be 1..8")
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    tiff = (b"II*\x00" + (8).to_bytes(4, "little")          # IFD at +8
            + (1).to_bytes(2, "little")                      # 1 entry
            + (274).to_bytes(2, "little") + (3).to_bytes(2, "little")
            + (1).to_bytes(4, "little")
            + orientation.to_bytes(2, "little") + b"\x00\x00"
            + (0).to_bytes(4, "little"))                     # next IFD
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
    return jpeg[:2] + app1 + jpeg[2:]


def orient_image(samples, w: int, h: int, channels: int, orientation: int):
    """Normalize decoded pixels to upright (Exif 2.3 Table 4): returns
    (samples, w, h) with the inverse transform applied. Row-local pure
    Python over the already-decoded buffer — the decoders stay
    orientation-agnostic and pipelines opt in after decode."""
    if orientation == 1:
        return samples, w, h
    if not 2 <= orientation <= 8:
        raise ValueError("orientation must be 1..8")
    sw, sh = (h, w) if orientation >= 5 else (w, h)
    out = bytearray(len(samples))
    for oy in range(sh):
        for ox in range(sw):
            # map output (upright) position -> source position
            if orientation == 2:    sx, sy = w - 1 - ox, oy
            elif orientation == 3:  sx, sy = w - 1 - ox, h - 1 - oy
            elif orientation == 4:  sx, sy = ox, h - 1 - oy
            elif orientation == 5:  sx, sy = oy, ox
            elif orientation == 6:  sx, sy = oy, h - 1 - ox
            elif orientation == 7:  sx, sy = w - 1 - oy, h - 1 - ox
            else:                   sx, sy = w - 1 - oy, ox          # 8
            so = (sy * w + sx) * channels
            oo = (oy * sw + ox) * channels
            out[oo : oo + channels] = samples[so : so + channels]
    return out, sw, sh


EXIF_SCHEMA = "media_id bigint, orientation int, upright_width int, upright_height int"


def exif_orientation_features(df: DataFrame, content_col: str = "content",
                              id_col: str = "media_id") -> DataFrame:
    """Per-payload EXIF orientation + upright dimensions (header probe +
    marker walk only — no pixel decode). Narrow Arrow-batched map, no
    shuffle; NULL row values for payloads without Exif."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ors, ws, hs = [], [], []
            for p in pdf[content_col]:
                p = bytes(p)
                o = exif_orientation(p)
                probe = probe_image_header(p)
                if o is None or probe is None:
                    ors.append(None); ws.append(None); hs.append(None)
                    continue
                _fmt, w, h = probe
                if o >= 5:
                    w, h = h, w
                ors.append(o); ws.append(w); hs.append(h)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "orientation": pd.array(ors, dtype="Int32"),
                "upright_width": pd.array(ws, dtype="Int32"),
                "upright_height": pd.array(hs, dtype="Int32"),
            })

    return df.mapInPandas(compute, schema=EXIF_SCHEMA)


def synth_exif_jpeg(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Deterministic Exif-tagged JPEG synthesis: the `synth_gray_jpeg`
    32x16 construction with orientation (digest[12] % 8) + 1 spliced as
    a real APP1 segment. Narrow Arrow-batched map."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[content_col]:
                d = hashlib.md5(bytes(p)).digest()
                w, h = 32, 16
                px = bytearray(w * h)
                for bi in range(8):
                    by, bx = divmod(bi, 4)
                    v = d[bi]
                    for yy in range(8):
                        base = (by * 8 + yy) * w + bx * 8
                        px[base : base + 8] = bytes([v]) * 8
                jpeg = encode_jpeg_gray(bytes(px), w, h)
                out.append(add_exif_orientation(jpeg, d[12] % 8 + 1))
            yield pd.DataFrame({"media_id": pdf["media_id"], "content": out})

    return df.mapInPandas(compute, schema=PNG_SCHEMA)
