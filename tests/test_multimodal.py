"""Multimodal plumbing: codec stubs are clearly gated; the mapInPandas
stages' oracle parity is covered in test_oracle_parity (media_* queries)."""

import pytest


def test_decode_audio_is_stubbed():
    from impc_etl_spark.multimodal.media import decode_audio

    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00\x01")


def test_decode_image_stubbed_without_pil():
    from impc_etl_spark.multimodal.media import decode_image

    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present; stub not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")


def test_frame_expansion_shape(spark):
    from pyspark.sql import functions as F

    from impc_etl_spark.multimodal.media import attach_binary, sample_frames

    df = spark.createDataFrame(
        [(1, "abc"), (2, "abcd"), (3, "")], ["doc_id", "text"]
    )
    out = sample_frames(attach_binary(df, "text", "doc_id")).collect()
    # n_frames = n_bytes % 4 + 1 -> 3->4 frames, 4->1 frame, 0->1 frame
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert sorted(by_id[1]) == [0, 1, 2, 3]
    assert by_id[2] == [0]
    assert by_id[3] == [0]


def _png(w, h):
    import struct
    import zlib

    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )


def _jpeg(w, h):
    import struct

    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + b"\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    )
    # a DHT (C4) segment BEFORE the SOF — the walker must skip non-frame
    # C-range markers, and a restart marker with no length field
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + dht + sof


def _gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h)


def _wav(ch, sr, bits):
    import struct

    # a junk chunk with ODD length before fmt — the walker must word-align
    junk = b"JUNK" + struct.pack("<I", 3) + b"xyz\x00"
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, ch, sr, sr * ch * bits // 8, ch * bits // 8, bits
    )
    body = b"WAVE" + junk + fmt + b"data" + struct.pack("<I", 0)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_image_header_probe_real_formats(spark):
    from impc_etl_spark.multimodal.media import image_header_features

    rows = [
        (1, bytearray(_png(640, 480))),
        (2, bytearray(_jpeg(1920, 1080))),
        (3, bytearray(_gif(320, 200))),
        (4, bytearray(b"plain text, not an image")),
        (5, bytearray(b"\x89PNG\r\n\x1a")),  # truncated magic
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r["media_id"]: (r["format"], r["width"], r["height"])
        for r in image_header_features(df).collect()
    }
    assert got[1] == ("png", 640, 480)
    assert got[2] == ("jpeg", 1920, 1080)
    assert got[3] == ("gif", 320, 200)
    assert got[4] == (None, None, None)
    assert got[5] == (None, None, None)


def test_wav_header_probe_chunk_walk(spark):
    from impc_etl_spark.multimodal.media import wav_header_features

    rows = [
        (1, bytearray(_wav(2, 44100, 16))),
        (2, bytearray(_wav(1, 16000, 24))),
        (3, bytearray(b"RIFF\x00\x00\x00\x00AVI ")),  # not WAVE
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r["media_id"]: (r["n_channels"], r["sample_rate"], r["bits_per_sample"])
        for r in wav_header_features(df).collect()
    }
    assert got[1] == (2, 44100, 16)
    assert got[2] == (1, 16000, 24)
    assert got[3] == (None, None, None)


def _mp3_frame(version_bits, bitrate_idx, sr_idx, mode):
    b1 = 0xFF
    b2 = 0xE0 | (version_bits << 3) | (1 << 1)  # layer III
    b3 = (bitrate_idx << 4) | (sr_idx << 2)
    b4 = mode << 6
    return bytes([b1, b2, b3, b4]) + b"\x00" * 32


def test_probe_mp3_header_parses_and_skips_id3(spark):
    from impc_etl_spark.multimodal.media import mp3_header_features, probe_mp3_header

    frame = _mp3_frame(3, 9, 0, 0)  # MPEG1 L3, 128 kbps, 44100 Hz, stereo
    assert probe_mp3_header(frame) == (128, 44100, 2)
    # ID3v2 tag prefix (syncsafe length 20) then the frame
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x14" + b"\x00" * 20 + frame
    assert probe_mp3_header(id3) == (128, 44100, 2)
    # MPEG2 table + mono
    assert probe_mp3_header(_mp3_frame(2, 9, 1, 3)) == (80, 24000, 1)
    assert probe_mp3_header(b"garbage not audio") is None
    # free-format (idx 0) and bad sample-rate index are skipped, not crashed
    assert probe_mp3_header(_mp3_frame(3, 0, 0, 0)) is None

    df = spark.createDataFrame(
        [(1, bytearray(frame)), (2, bytearray(b"nope"))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: (r["bitrate_kbps"], r["sample_rate"], r["n_channels"])
            for r in mp3_header_features(df).collect()}
    assert rows[1] == (128, 44100, 2)
    assert rows[2] == (None, None, None)
