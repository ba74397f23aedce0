"""Multimodal plumbing: codec stubs are clearly gated; the mapInPandas
stages' oracle parity is covered in test_oracle_parity (media_* queries)."""

import pytest


def test_decode_audio_real_for_wav_stub_for_compressed():
    from impc_etl_spark.multimodal.media import _wav_pcm16, decode_audio

    sr, samples = decode_audio(_wav_pcm16([0, 100, -100, 32767, -32768], 8000))
    assert sr == 8000 and samples == [0, 100, -100, 32767, -32768]
    # non-WAV payloads keep the honest stub error (MP3/AAC need a codec lib)
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00\x01")


def test_decode_wav_formats_and_hostile_inputs():
    """Pure-stdlib PCM decode: 16-bit roundtrip via the repo's own
    encoder, hand-built 8-bit (unsigned, recentred) and stereo payloads,
    ragged-tail truncation to whole frames, and hostile inputs → None."""
    import struct

    from impc_etl_spark.multimodal.media import _wav_pcm16, decode_wav

    assert decode_wav(_wav_pcm16([5, -5, 0], 44100)) == (44100, 1, [5, -5, 0])

    def wav(fmt_tag, ch, sr, bits, data):
        fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
            "<HHIIHH", fmt_tag, ch, sr, sr * ch * bits // 8, ch * bits // 8, bits
        )
        body = b"WAVE" + fmt + b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # 8-bit PCM is unsigned; decode recentres around 0
    assert decode_wav(wav(1, 1, 8000, 8, bytes([128, 255, 0]))) == (
        8000, 1, [0, 127, -128])
    # stereo: interleaved samples, frame count = samples // channels
    st = decode_wav(wav(1, 2, 16000, 16, struct.pack("<4h", 1, 2, 3, 4)))
    assert st == (16000, 2, [1, 2, 3, 4])
    # ragged tail (5 samples, 2 channels) truncates to 2 whole frames
    rg = decode_wav(wav(1, 2, 16000, 16, struct.pack("<5h", 1, 2, 3, 4, 5)))
    assert rg == (16000, 2, [1, 2, 3, 4])
    # non-PCM format tag, unsupported depth, non-WAV container → None
    assert decode_wav(wav(3, 1, 8000, 16, b"\x00\x00")) is None
    assert decode_wav(wav(1, 1, 8000, 24, b"\x00\x00\x00")) is None
    assert decode_wav(b"RIFF\x00\x00\x00\x00AVI ") is None
    assert decode_wav(b"") is None


def test_decode_audio_features_end_to_end(spark):
    """synth WAV → decode_audio_features recovers the md5-derived PCM16
    samples (rate/frames/duration/rms/peak) and yields NULLs for an
    undecodable payload injected into the same frame."""
    import hashlib
    import math
    import struct

    from pyspark.sql import functions as F

    from impc_etl_spark.multimodal.media import (
        attach_binary, decode_audio_features, synth_wav,
    )

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta gamma")], ["doc_id", "text"]
    )
    wavs = synth_wav(attach_binary(df, "text", "doc_id"))
    bad = spark.createDataFrame([(99,)], "media_id bigint").select(
        "media_id", F.encode(F.lit("not a wav"), "UTF-8").alias("content")
    )
    got = {r["media_id"]: r
           for r in decode_audio_features(wavs.unionByName(bad)).collect()}
    for doc_id, text in [(1, "alpha"), (2, "beta gamma")]:
        s = struct.unpack("<8h", hashlib.md5(text.encode()).digest())
        r = got[doc_id]
        assert (r["sample_rate"], r["n_channels"], r["n_frames"]) == (8000, 1, 8)
        assert abs(r["duration_sec"] - 8 / 8000) < 1e-12
        assert abs(r["rms"] - math.sqrt(sum(v * v for v in s) / 8)) < 1e-9
        assert r["peak"] == max(abs(v) for v in s)
    r99 = got[99]
    assert r99["sample_rate"] is None and r99["rms"] is None


def test_resize_media_real_pixels(spark):
    """Real nearest-neighbor resize over decoded PNG pixels: the 3×3
    output of a synth 4×4 gray PNG is exactly the digest bytes the floor
    mapping selects; an undecodable payload yields NULL pixels."""
    import hashlib

    from pyspark.sql import functions as F

    from impc_etl_spark.multimodal.media import (
        attach_binary, resize_media, synth_gray_png,
    )

    df = spark.createDataFrame([(1, "alpha")], ["doc_id", "text"])
    pngs = synth_gray_png(attach_binary(df, "text", "doc_id"))
    bad = spark.createDataFrame([(99,)], "media_id bigint").select(
        "media_id", F.encode(F.lit("not a png"), "UTF-8").alias("content")
    )
    got = {r["media_id"]: r
           for r in resize_media(pngs.unionByName(bad), 3, 3).collect()}
    d = hashlib.md5(b"alpha").digest()
    want = [d[i] for i in (0, 1, 2, 4, 5, 6, 8, 9, 10)]
    r = got[1]
    assert (r["width"], r["height"]) == (3, 3)
    assert r["pixels"] == want
    assert abs(r["mean_luminance"] - sum(want) / 9) < 1e-9
    r99 = got[99]
    assert r99["pixels"] is None and r99["mean_luminance"] is None


def test_nearest_resize_kernel_multichannel():
    """Kernel unit cases: identity mapping, 2× downscale, upscale, and
    RGB channel-mean collapse — checked against a naive reimplementation."""
    from impc_etl_spark.multimodal.media import _nearest_resize

    # 2×2 gray identity
    assert _nearest_resize(bytes([10, 20, 30, 40]), 2, 2, 1, 2, 2) == [
        10, 20, 30, 40]
    # 4×4 gray → 2×2 picks (0,0) (2,0) (0,2) (2,2) = indices 0, 2, 8, 10
    src = bytes(range(16))
    assert _nearest_resize(src, 4, 4, 1, 2, 2) == [0, 2, 8, 10]
    # 1×1 → 2×2 upscale replicates the single pixel
    assert _nearest_resize(bytes([7]), 1, 1, 1, 2, 2) == [7, 7, 7, 7]
    # RGB 2×1 → 1×1: picks pixel 0, luminance = mean of its channels
    assert _nearest_resize(bytes([30, 60, 90, 0, 0, 0]), 2, 1, 3, 1, 1) == [60]


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


def test_decode_png_roundtrip_and_all_filters():
    """The pure-stdlib PNG decoder recovers exact pixels from the repo's
    own encoder AND from hand-built PNGs using each of the five scanline
    filters (None/Sub/Up/Average/Paeth) over RGB data; hostile inputs
    (truncated, corrupt, non-PNG) return None instead of raising."""
    import hashlib
    import random
    import struct
    import zlib

    from impc_etl_spark.multimodal.media import _png_gray, decode_png

    digest = hashlib.md5(b"hello world").digest()
    png = _png_gray(digest, 4, 4)
    w, h, mode, samples = decode_png(png)
    assert (w, h, mode) == (4, 4, "L") and bytes(samples) == digest

    def chunk(tag, data):
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    random.seed(7)
    W, H, BPP = 5, 4, 3
    pix = [bytes(random.randrange(256) for _ in range(W * BPP))
           for _ in range(H)]
    for ft in range(5):
        rows, prev = [], bytes(W * BPP)
        for r in range(H):
            cur, line = pix[r], bytearray()
            for x in range(W * BPP):
                left = cur[x - BPP] if x >= BPP else 0
                up = prev[x]
                ul = prev[x - BPP] if x >= BPP else 0
                delta = {0: cur[x], 1: cur[x] - left, 2: cur[x] - up,
                         3: cur[x] - (left + up) // 2,
                         4: cur[x] - paeth(left, up, ul)}[ft]
                line.append(delta & 0xFF)
            rows.append(bytes([ft]) + bytes(line))
            prev = cur
        ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)
        png2 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"".join(rows)))
                + chunk(b"IEND", b""))
        w2, h2, m2, s2 = decode_png(png2)
        assert (w2, h2, m2) == (W, H, "RGB")
        assert bytes(s2) == b"".join(pix), f"filter {ft}"

    assert decode_png(b"") is None
    assert decode_png(b"\x89PNG\r\n\x1a\nxxxx") is None
    assert decode_png(png[:20]) is None
    assert decode_png(b"\xff\xd8\xff\xe0") is None


def test_decode_image_features_end_to_end(spark):
    """synth PNG → decode_image_features recovers the md5-derived pixels
    (width/height/mode/mean) and yields NULLs for an undecodable payload
    injected into the same frame."""
    import hashlib

    from pyspark.sql import functions as F

    from impc_etl_spark.multimodal.media import (
        attach_binary, decode_image_features, synth_gray_png,
    )

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta gamma")], ["doc_id", "text"]
    )
    pngs = synth_gray_png(attach_binary(df, "text", "doc_id"))
    # inject a hostile non-PNG payload alongside the real ones
    bad = spark.createDataFrame([(99,)], "media_id bigint").select(
        "media_id", F.encode(F.lit("not a png"), "UTF-8").alias("content")
    )
    got = {r["media_id"]: r
           for r in decode_image_features(pngs.unionByName(bad)).collect()}
    for doc_id, text in [(1, "alpha"), (2, "beta gamma")]:
        d = hashlib.md5(text.encode()).digest()
        r = got[doc_id]
        assert (r["width"], r["height"], r["img_mode"]) == (4, 4, "L")
        assert abs(r["mean_luminance"] - sum(d) / 16) < 1e-9
    r99 = got[99]
    assert r99["width"] is None and r99["img_mode"] is None
    assert r99["mean_luminance"] is None


def test_decode_image_native_png_path():
    """decode_image falls back to the stdlib PNG decoder when PIL is
    absent (and still raises the stub error for non-PNG payloads)."""
    import hashlib

    from impc_etl_spark.multimodal.media import _png_gray, decode_image

    try:
        import PIL  # noqa: F401
        import pytest as _pytest
        _pytest.skip("PIL present; native fallback not exercised")
    except ImportError:
        pass
    digest = hashlib.md5(b"xyz").digest()
    w, h, samples = decode_image(_png_gray(digest, 4, 4))
    assert (w, h) == (4, 4) and bytes(samples) == digest


def test_decode_png_rejects_zero_pixel_image(spark):
    """A crafted 0x0 PNG (valid chunks, empty IDAT) must decode to None —
    and the mapInPandas feature stage must emit a NULL row for it, never
    divide by zero (one hostile payload must not kill a scan)."""
    import struct
    import zlib

    from pyspark.sql import functions as F

    from impc_etl_spark.multimodal.media import decode_image_features, decode_png

    def chunk(tag, data):
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    zero = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 0, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b""))
            + chunk(b"IEND", b""))
    assert decode_png(zero) is None

    df = spark.createDataFrame([(1,)], "media_id bigint").select(
        "media_id", F.lit(zero).alias("content")
    )
    rows = decode_image_features(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["width"] is None and r["mean_luminance"] is None


def test_probe_mp4_header_walks_boxes_and_versions():
    """Real ISO-BMFF walking: the repo's own minimal encoder roundtrips;
    a hand-built mvhd v1 (64-bit times) parses; 64-bit largesize and
    size-0 (to-EOF) boxes are honored; hostile inputs → None."""
    import struct

    from impc_etl_spark.multimodal.media import (
        _mp4_box, _mp4_min, probe_mp4_header,
    )

    assert probe_mp4_header(_mp4_min(600, 123456, 2)) == (600, 123456, 2)
    assert probe_mp4_header(_mp4_min(1000, 0, 1)) == (1000, 0, 1)

    # mvhd version 1: 8-byte creation/modification times, 8-byte duration
    mvhd_v1 = (
        b"\x01\x00\x00\x00"
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", 90000)
        + struct.pack(">Q", 5_000_000)
        + b"\x00" * 80
    )
    moov = _mp4_box(b"mvhd", mvhd_v1) + _mp4_box(b"trak", b"")
    payload = _mp4_box(b"ftyp", b"isom") + _mp4_box(b"moov", moov)
    assert probe_mp4_header(payload) == (90000, 5_000_000, 1)

    # 64-bit largesize on the moov box (size field == 1)
    big_moov = (
        struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(moov)) + moov
    )
    assert probe_mp4_header(_mp4_box(b"ftyp", b"isom") + big_moov) == (
        90000, 5_000_000, 1)

    # size-0: box extends to EOF
    eof_moov = struct.pack(">I", 0) + b"moov" + moov
    assert probe_mp4_header(_mp4_box(b"ftyp", b"isom") + eof_moov) == (
        90000, 5_000_000, 1)

    assert probe_mp4_header(b"") is None
    assert probe_mp4_header(b"not an mp4 at all") is None
    assert probe_mp4_header(_mp4_box(b"ftyp", b"isom")) is None   # no moov
    assert probe_mp4_header(payload[:30]) is None                  # truncated


def test_mp4_header_features_end_to_end(spark):
    """synth MP4 → probe recovers the md5-derived duration/track count;
    hostile payloads yield NULLs in the same frame."""
    import hashlib

    from pyspark.sql import functions as F

    from impc_etl_spark.multimodal.media import (
        attach_binary, mp4_header_features, synth_mp4,
    )

    df = spark.createDataFrame([(1, "alpha"), (2, "beta")], ["doc_id", "text"])
    mp4s = synth_mp4(attach_binary(df, "text", "doc_id"))
    bad = spark.createDataFrame([(99,)], "media_id bigint").select(
        "media_id", F.encode(F.lit("nope"), "UTF-8").alias("content")
    )
    got = {r["media_id"]: r
           for r in mp4_header_features(mp4s.unionByName(bad)).collect()}
    for doc_id, text in [(1, "alpha"), (2, "beta")]:
        d = hashlib.md5(text.encode()).digest()
        r = got[doc_id]
        assert r["timescale"] == 600
        assert r["duration_ticks"] == int.from_bytes(d[:4], "big") % 3_600_000
        assert r["n_tracks"] == d[4] % 3 + 1
        assert abs(r["duration_sec"] - r["duration_ticks"] / 600) < 1e-9
    assert got[99]["timescale"] is None and got[99]["duration_sec"] is None


def test_audio_zcr_counts_strict_sign_flips(spark):
    """ZCR = strict sign changes / (n-1): zeros break a flip (product 0),
    constant-sign audio scores 0, alternating audio scores 1."""
    from pyspark.sql import functions as F

    from impc_etl_spark.multimodal.media import (
        _wav_pcm16, decode_audio_features,
    )

    cases = {
        1: [1, -1, 1, -1],        # alternating: 3/3 = 1.0
        2: [5, 6, 7, 8],          # constant sign: 0.0
        3: [1, 0, -1, 1],         # zero breaks flips: only (-1,1) counts
    }
    df = spark.createDataFrame(
        [(k, bytearray(_wav_pcm16(v, 8000))) for k, v in cases.items()],
        "media_id bigint, content binary",
    )
    got = {r["media_id"]: r["zcr"] for r in decode_audio_features(df).collect()}
    assert got[1] == 1.0
    assert got[2] == 0.0
    assert got[3] == 1 / 3


def test_decode_stages_run_on_streams(spark, tmp_path):
    """The decode family is stateless Arrow maps, so the SAME operators
    run unchanged on a Structured Streaming source — drain a file stream
    through synth+decode (image and audio) and require bit-exact parity
    with the batch run over the same files."""
    from pyspark.sql import functions as F

    from impc_etl_spark.multimodal.media import (
        decode_audio_features, decode_image_features, synth_gray_png,
        synth_wav,
    )

    src = tmp_path / "src"
    spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(20)],
        "media_id bigint, text string",
    ).select(
        "media_id", F.encode("text", "UTF-8").alias("content")
    ).write.parquet(str(src))

    batch = spark.read.parquet(str(src))
    stream = spark.readStream.schema("media_id bigint, content binary").parquet(
        str(src)
    )

    for tag, stage in (
        ("img", lambda df: decode_image_features(synth_gray_png(df))),
        ("aud", lambda df: decode_audio_features(synth_wav(df))),
    ):
        q = (
            stage(stream).writeStream.format("memory")
            .queryName(f"decode_stream_{tag}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(map(tuple, spark.table(f"decode_stream_{tag}").collect()))
        want = sorted(map(tuple, stage(batch).collect()))
        assert got == want, tag


def test_gif_lzw_spec_vector():
    """Hand-derived canonical bitstream from the GIF89a spec (appendix F
    rules): pixels [1,1,1,1,1] at min-code-size 2 encode to codes
    CLEAR,1,6,6,END = 4,1,6,6,5 at 3 bits LSB-first = bytes 8C 5D. Pins
    the encoder to the PUBLIC spec, not merely to its own decoder."""
    from impc_etl_spark.multimodal.media import _gif_lzw_decode, _gif_lzw_encode

    enc = _gif_lzw_encode(bytes([1, 1, 1, 1, 1]), 2)
    assert enc == bytes([0x8C, 0x5D]), enc.hex()
    assert bytes(_gif_lzw_decode(enc, 2)) == bytes([1, 1, 1, 1, 1])
    # deferred-clear tolerance: a stream that ends without END still
    # yields the decoded prefix (tolerant decoders are the public norm)
    assert bytes(_gif_lzw_decode(enc[:1], 2)) == bytes([1])


def test_decode_gif_container_paths():
    """decode_gif recovers exact pixels from the repo's own LZW encoder;
    handles 89a extension blocks, RGB palettes, interlaced row order, and
    local color tables; returns None (never raises) on hostile bytes."""
    import hashlib
    import struct

    from impc_etl_spark.multimodal.media import (
        _gif_gray, _gif_lzw_encode, decode_gif,
    )

    digest = hashlib.md5(b"hello world").digest()
    gif = _gif_gray(digest, 4, 4)
    assert decode_gif(gif) == (4, 4, "L", bytearray(digest))

    def build(pixels, w, h, palette, *, ver=b"GIF89a", mcs=None,
              interlace=False, local_table=False, ext=b""):
        n_pal = len(palette) // 3
        size_bits = max(1, (n_pal - 1).bit_length()) - 1
        if mcs is None:
            mcs = max(2, size_bits + 1)
        pal = palette + b"\x00" * (3 * ((2 << size_bits) - n_pal))
        if local_table:
            lsd = struct.pack("<HHBBB", w, h, 0x00, 0, 0)
            gct = b""
            ipacked = 0x80 | (0x40 if interlace else 0) | size_bits
            idesc = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, ipacked) + pal
        else:
            lsd = struct.pack("<HHBBB", w, h, 0x80 | size_bits, 0, 0)
            gct = pal
            ipacked = 0x40 if interlace else 0
            idesc = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, ipacked)
        lzw = _gif_lzw_encode(pixels, mcs)
        blocks = bytearray([mcs])
        for i in range(0, len(lzw), 255):
            blocks.append(len(lzw[i:i + 255]))
            blocks.extend(lzw[i:i + 255])
        blocks.append(0)
        return ver + lsd + gct + ext + idesc + bytes(blocks) + b"\x3b"

    # 89a with a graphic-control extension block before the image
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    pal_gray = bytes(v for i in range(4) for v in (i * 80 % 256,) * 3)
    px = bytes([0, 1, 2, 3, 3, 2, 1, 0])
    got = decode_gif(build(px, 4, 2, pal_gray, ext=gce))
    assert got == (4, 2, "L", bytearray((i * 80) % 256 for i in px))

    # RGB palette → RGB triples out
    pal_rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    got = decode_gif(build(px, 4, 2, pal_rgb, local_table=True))
    w, h, mode, samples = got
    assert (w, h, mode) == (4, 2, "RGB")
    assert bytes(samples) == b"".join(pal_rgb[3 * v: 3 * v + 3] for v in px)

    # interlaced: rows stored in pass order (0::8, 4::8, 2::4, 1::2);
    # build a 1×8 column image whose stored rows are the pass permutation
    rows = list(range(8))
    passes = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
              for r in range(start, 8, step)]
    stored = bytes(rows[r] for r in passes)  # palette INDICES in pass order
    pal8 = bytes(v for i in range(8) for v in (i * 30,) * 3)
    got = decode_gif(build(stored, 1, 8, pal8, interlace=True))
    assert got == (1, 8, "L", bytearray(r * 30 for r in rows))

    # hostile inputs: None, never a raise
    assert decode_gif(b"") is None
    assert decode_gif(b"GIF87a") is None
    assert decode_gif(gif[:30]) is None
    assert decode_gif(gif[:-10] + b"\xff" * 10) is not None or True
    assert decode_gif(b"NOTAGIF" + gif) is None
    # index beyond the stored color table (2-entry table, but the LZW
    # alphabet at mcs=2 can express index 3) → rejected, not garbage
    assert decode_gif(build(bytes([3]), 1, 1, pal_rgb[:6])) is None


def test_media_gif_decode_query_matches_png_twin(spark):
    """The GIF decode query must agree with the PNG decode path on every
    document: same md5-derived pixels through two entirely different real
    codecs (zlib DEFLATE vs from-spec LZW) — a cross-codec consistency
    check no single decoder bug can satisfy."""
    from tests.conftest import SF_SMOKE

    from impc_etl_spark.queries import media_decode_features, media_gif_decode

    gif = {
        r["media_id"]: (r["width"], r["height"], r["img_mode"],
                        r["mean_luminance"])
        for r in media_gif_decode(spark, SF_SMOKE).collect()
    }
    png = {
        r["media_id"]: (r["width"], r["height"], r["img_mode"],
                        r["mean_luminance"])
        for r in media_decode_features(spark, SF_SMOKE).collect()
    }
    assert gif == png and len(gif) > 0


def test_g711_expansion_anchors_and_container():
    """µ-law/A-law expanders hit the published G.711 anchor values, are
    odd-symmetric, monotone within the negative half, and flow through
    the WAV container (format tags 7/6) into decode_wav; non-8-bit G.711
    and unknown tags still return None."""
    import hashlib
    import struct

    from impc_etl_spark.multimodal.media import (
        _alaw_to_linear, _ulaw_to_linear, _wav_g711, decode_wav,
    )

    assert _ulaw_to_linear(0x00) == -32124 and _ulaw_to_linear(0x80) == 32124
    assert _ulaw_to_linear(0xFF) == 0 and _ulaw_to_linear(0x7F) == 0
    assert _alaw_to_linear(0x55) == -8 and _alaw_to_linear(0xD5) == 8
    assert _alaw_to_linear(0x2A) == -32256 and _alaw_to_linear(0xAA) == 32256
    for f in (_ulaw_to_linear, _alaw_to_linear):
        # sign bit flips the magnitude exactly
        assert all(f(c) == -f(c ^ 0x80) for c in range(256))
    neg = [_ulaw_to_linear(c) for c in range(0x80)]
    assert all(a < b <= 0 for a, b in zip(neg, neg[1:]))

    digest = hashlib.md5(b"g711").digest()
    assert decode_wav(_wav_g711(digest, 8000, "ulaw")) == (
        8000, 1, [_ulaw_to_linear(b) for b in digest])
    assert decode_wav(_wav_g711(digest, 16000, "alaw")) == (
        16000, 1, [_alaw_to_linear(b) for b in digest])

    def wav(tag, bits, data):
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, bits)
        body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    assert decode_wav(wav(7, 16, b"\x00\x00")) is None   # G.711 is 8-bit
    assert decode_wav(wav(6, 16, b"\x00\x00")) is None
    assert decode_wav(wav(2, 8, b"\x00")) is None        # ADPCM: not ours


def test_decompression_bombs_bounded():
    """Hostile payloads whose compressed stream expands far beyond the
    declared pixel count must be rejected (PNG) or capped (GIF) WITHOUT
    materializing the expansion — a crawl-scale executor-OOM vector
    otherwise. Valid images are unaffected."""
    import hashlib
    import struct
    import time
    import zlib

    from impc_etl_spark.multimodal.media import (
        _gif_gray, _gif_lzw_decode, _gif_lzw_encode, decode_gif, decode_png,
    )

    # PNG bomb: IHDR claims 1×1 gray (want = 2 bytes) but IDAT inflates
    # to 64 MB of zeros; must be None, and fast (bounded inflate)
    def chunk(tag, data):
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(64 * 1024 * 1024)))
            + chunk(b"IEND", b""))
    t0 = time.monotonic()
    assert decode_png(bomb) is None
    assert time.monotonic() - t0 < 2.0
    # valid 1×1 still decodes
    ok = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
          + chunk(b"IDAT", zlib.compress(b"\x00\x07"))
          + chunk(b"IEND", b""))
    assert decode_png(ok) == (1, 1, "L", bytearray([7]))

    # GIF bomb: LZW of 32 MB of zeros is ~64 KB; a container claiming
    # 2×2 must decode capped near 4 indices, not 32M
    lzw = _gif_lzw_encode(bytes(32 * 1024 * 1024), 8)
    assert len(lzw) < 200_000
    capped = _gif_lzw_decode(lzw, 8, max_out=4)
    assert capped is not None and 4 <= len(capped) < 5000
    # splice the bomb stream into a hand-built 2×2 container
    head = (b"GIF87a" + struct.pack("<HHBBB", 2, 2, 0xF7, 0, 0)
            + bytes(v for i in range(256) for v in (i, i, i)))
    idesc = struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
    blocks = bytearray([8])
    for i in range(0, len(lzw), 255):
        blocks.append(len(lzw[i:i + 255]))
        blocks.extend(lzw[i:i + 255])
    blocks.append(0)
    t0 = time.monotonic()
    got = decode_gif(head + idesc + bytes(blocks) + b"\x3b")
    assert got == (2, 2, "L", bytearray(4))
    assert time.monotonic() - t0 < 2.0

    # the cap never truncates a legitimately-sized image
    digest = hashlib.md5(b"x").digest()
    assert decode_gif(_gif_gray(digest, 4, 4)) == (4, 4, "L", bytearray(digest))


def test_ima_adpcm_codec_paths():
    """IMA ADPCM: sample 0 survives exactly (block-header predictor), a
    slow ramp reconstructs within the quantizer's step bound, multi-block
    streams decode block-by-block with state reset per block header, and
    hostile inputs return None (never raise)."""
    import struct

    from impc_etl_spark.multimodal.media import (
        _wav_ima_adpcm, decode_ima_wav, ima_adpcm_decode_block,
        ima_adpcm_encode,
    )

    ramp = [i * 8 - 800 for i in range(200)]
    sr, ch, dec = decode_ima_wav(_wav_ima_adpcm(ramp, 8000))
    assert (sr, ch, len(dec)) == (8000, 1, 200)
    assert dec[0] == ramp[0]
    assert max(abs(a - b) for a, b in zip(ramp, dec)) < 64

    # saturation: a full-scale square wave must stay clamped in [-32768, 32767]
    square = [32767, -32768] * 50
    _, _, dsq = decode_ima_wav(_wav_ima_adpcm(square, 8000))
    assert all(-32768 <= v <= 32767 for v in dsq)

    # two hand-built blocks: each block's header re-seeds predictor+index
    b1 = ima_adpcm_encode([100, 120, 90])        # 4 hdr + 1 byte (2 nibbles)
    b2 = ima_adpcm_encode([-5000, -5100, -4900])
    assert len(b1) == len(b2) == 5
    spb, ba = 3, 5
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 4000, ba, 4, 2, spb)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 10) + b1 + b2)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    _, _, d2 = decode_ima_wav(wav)
    assert len(d2) == 6 and d2[0] == 100 and d2[3] == -5000
    assert d2[:3] == ima_adpcm_decode_block(b1, 3)
    assert d2[3:] == ima_adpcm_decode_block(b2, 3)

    # hostile: truncated container, bad index, non-ADPCM tags
    assert decode_ima_wav(wav[:30]) is None
    bad = bytearray(b1)
    bad[2] = 200                                  # step index > 88
    assert ima_adpcm_decode_block(bytes(bad), 3) is None
    assert ima_adpcm_decode_block(b"", 1) is None
    assert decode_ima_wav(b"RIFF\x00\x00\x00\x00WAVE") is None


def test_flac_and_ogg_probes():
    """FLAC STREAMINFO bit unpacking inverts the writer across the field
    boundaries (20/3/5/36 bits), rejects non-STREAMINFO-first and
    truncated payloads; the Ogg page probe reads RFC 3533 fields and
    rejects non-Ogg bytes."""
    from impc_etl_spark.multimodal.media import (
        _flac_streaminfo, probe_flac_header, probe_ogg_header,
    )

    cases = [
        (8000, 1, 8, 0),
        (44100, 2, 16, 123456789),
        (48000, 8, 32, (1 << 36) - 1),      # max channels/depth/samples
        ((1 << 20) - 1, 3, 24, 1),          # max 20-bit rate
    ]
    for rate, ch, bits, total in cases:
        assert probe_flac_header(_flac_streaminfo(rate, ch, bits, total)) == (
            rate, ch, bits, total), (rate, ch, bits, total)
    good = _flac_streaminfo(44100, 2, 16, 10)
    assert probe_flac_header(good[:20]) is None
    assert probe_flac_header(b"fLaC") is None
    assert probe_flac_header(b"OggS" + good[4:]) is None
    # a non-STREAMINFO first block is rejected (type must be 0)
    bad = bytearray(good)
    bad[4] = 0x84                          # type 4 (VORBIS_COMMENT), last
    assert probe_flac_header(bytes(bad)) is None
    # rate 0 is reserved/invalid
    assert probe_flac_header(_flac_streaminfo(0, 2, 16, 10)) is None

    page = b"OggS" + bytes([0, 0x02]) + bytes(20) + bytes([7])
    assert probe_ogg_header(page) == (0, 2, 7)
    assert probe_ogg_header(page[:20]) is None
    assert probe_ogg_header(b"RIFF" + bytes(30)) is None
    assert probe_ogg_header(b"OggS" + bytes([1]) + bytes(25)) is None  # bad version


def test_avi_demux_paths(spark):
    """The RIFF walker recovers exact frame bytes (00dc and 00db tags,
    odd-length word-alignment padding, frames nested in 'rec ' lists),
    ignores non-video chunks, samples every-nth frame, and returns
    None/no-rows on hostile payloads."""
    import struct

    from pyspark.sql import functions as F

    from impc_etl_spark.multimodal.media import (
        _avi_container, avi_frame_stats, demux_avi_frames,
    )

    frames = [b"a", b"bc", b"\xff" * 5]
    assert demux_avi_frames(_avi_container(frames)) == frames

    # hand-build: 01db tag (stream 1, uncompressed), a junk chunk to
    # ignore, and a frame inside a 'rec ' grouping list
    def chunk(tag, data):
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    rec = b"LIST" + struct.pack("<I", 4 + len(chunk(b"00dc", b"zz"))) \
        + b"rec " + chunk(b"00dc", b"zz")
    movi_body = chunk(b"01db", b"xyz") + chunk(b"JUNK", b"skip") + rec
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    body = b"AVI " + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    assert demux_avi_frames(avi) == [b"xyz", b"zz"]

    assert demux_avi_frames(b"") is None
    assert demux_avi_frames(b"RIFF\x08\x00\x00\x00WAVEdata") is None

    df = spark.createDataFrame([(1,)], "media_id bigint").select(
        "media_id",
        F.lit(_avi_container([b"a", b"bb", b"ccc", b"dddd"])).alias("content"),
    )
    got = avi_frame_stats(df, every_n=2).collect()
    assert [(r["frame_idx"], r["n_bytes"]) for r in got] == [(0, 1), (2, 3)]
    bad = spark.createDataFrame([(9,)], "media_id bigint").select(
        "media_id", F.encode(F.lit("nope"), "UTF-8").alias("content")
    )
    assert avi_frame_stats(bad).count() == 0


def test_jpeg_codec_paths():
    """Baseline JPEG from-spec pair: constant blocks reconstruct to the
    exact integer formula across all 256 levels, smooth gradients survive
    within a tight bound, the DCT/IDCT agree with an independent numpy
    DCT matrix to 1e-9, odd sizes pad correctly, and hostile inputs
    return None (never raise)."""
    import math
    import random

    import numpy as np

    from impc_etl_spark.multimodal.media import (
        _fdct_2d, _idct_2d, decode_jpeg, encode_jpeg_gray,
        probe_image_header,
    )

    for b in range(256):
        got = decode_jpeg(encode_jpeg_gray(bytes([b] * 64), 8, 8))
        dc = math.floor((8 * (b - 128)) / 16 + 0.5)
        want = max(0, min(255, 2 * dc + 128))
        assert got is not None and got[:3] == (8, 8, "L")
        assert set(got[3]) == {want}, (b, want, set(got[3]))

    w, h = 16, 16
    grad = bytes((x * 3 + y * 2) % 200 + 20 for y in range(h) for x in range(w))
    got = decode_jpeg(encode_jpeg_gray(grad, w, h))
    assert max(abs(a - c) for a, c in zip(grad, got[3])) <= 8

    # independent DCT construction (orthonormal DCT-II matrix)
    M = np.array([[np.sqrt((1 if u == 0 else 2) / 8)
                   * np.cos((2 * x + 1) * u * np.pi / 16)
                   for x in range(8)] for u in range(8)])
    random.seed(3)
    B = np.array([random.uniform(-128, 127) for _ in range(64)]).reshape(8, 8)
    assert np.abs(M @ B @ M.T
                  - np.array(_fdct_2d(list(B.reshape(-1)))).reshape(8, 8)
                  ).max() < 1e-9
    assert np.abs(np.array(_idct_2d(list((M @ B @ M.T).reshape(-1))))
                  .reshape(8, 8) - B).max() < 1e-9

    got = decode_jpeg(encode_jpeg_gray(bytes(range(100, 135)), 7, 5))
    assert got is not None and got[:2] == (7, 5)
    assert probe_image_header(encode_jpeg_gray(bytes(64), 8, 8)) == ("jpeg", 8, 8)

    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\xff\xd8\xff\xe0") is None
    assert decode_jpeg(encode_jpeg_gray(bytes(64), 8, 8)[:40]) is None
    # progressive frame type must be rejected, not misdecoded
    j = bytearray(encode_jpeg_gray(bytes(64), 8, 8))
    i = j.index(b"\xff\xc0")
    j[i + 1] = 0xC2
    assert decode_jpeg(bytes(j)) is None


def test_jpeg_color_decode_path():
    """The 4:4:4 YCbCr path: hand-build a 3-component JPEG (constant
    DC-only blocks per channel, interleaved MCU, shared tables) and check
    the decoder converts to the exact T.871 RGB values."""
    import math
    import struct

    from impc_etl_spark.multimodal.media import _JPEG_LUM_Q, decode_jpeg

    q = _JPEG_LUM_Q
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                              for s in range(1, 11)]
    ac_counts = [0] * 16
    ac_counts[8] = len(ac_syms)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    class W:
        def __init__(self):
            self.out, self.acc, self.n = bytearray(), 0, 0

        def put(self, code, ln):
            for k in range(ln - 1, -1, -1):
                self.acc = (self.acc << 1) | ((code >> k) & 1)
                self.n += 1
                if self.n == 8:
                    b = self.acc & 0xFF
                    self.out.append(b)
                    if b == 0xFF:
                        self.out.append(0)
                    self.acc = self.n = 0

        def flush(self):
            if self.n:
                self.put((1 << (8 - self.n)) - 1, 8 - self.n)
            return bytes(self.out)

    def put_dc_only_block(w, level, pred):
        # quantized DC for a constant block at `level` (centered)
        dc = math.floor(8 * (level - 128) / q[0] + 0.5)
        diff = dc - pred
        s = 0 if diff == 0 else abs(diff).bit_length()
        w.put(s, 4)                       # DC sym s == code s (canonical)
        if s:
            w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        w.put(0, 9)                       # AC EOB (symbol index 0)
        return dc

    y0, cb0, cr0 = 140, 90, 180
    w = W()
    dcs = [put_dc_only_block(w, lv, 0) for lv in (y0, cb0, cr0)]

    jpeg = (b"\xff\xd8"
            + seg(0xDB, bytes([0]) + bytes(q))
            + seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                  + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
            + seg(0xC4, bytes([0x00]) + bytes(dc_counts[:16]) + bytes(dc_syms)
                  + bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
            + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
            + w.flush() + b"\xff\xd9")

    got = decode_jpeg(jpeg)
    assert got is not None and got[:3] == (8, 8, "RGB")
    rec = [min(255, max(0, 2 * dc + 128)) for dc in dcs]
    yy, cb, cr = rec[0], rec[1] - 128, rec[2] - 128
    want = tuple(
        min(255, max(0, int(v + 0.5)))
        for v in (yy + 1.402 * cr,
                  yy - 0.344136 * cb - 0.714136 * cr,
                  yy + 1.772 * cb)
    )
    px = got[3]
    assert all(tuple(px[i * 3 : i * 3 + 3]) == want for i in range(64)), (
        want, tuple(px[:3]))


def test_webp_probe_variants():
    """probe_image_header reads all three WebP container variants per the
    public spec: VP8 (lossy sync code + 14-bit dims), VP8L (lossless
    packed dims minus one), VP8X (24-bit canvas minus one); corrupt sync
    bytes reject."""
    import struct

    from impc_etl_spark.multimodal.media import probe_image_header

    def riff(tag, chunk_body):
        body = b"WEBP" + tag + struct.pack("<I", len(chunk_body)) + chunk_body
        return b"RIFF" + struct.pack("<I", len(body)) + body

    lossy = riff(b"VP8 ", bytes(3) + b"\x9d\x01\x2a"
                 + struct.pack("<HH", 320, 240) + bytes(4))
    assert probe_image_header(lossy) == ("webp", 320, 240)

    bits = (517 - 1) | ((129 - 1) << 14)
    lossless = riff(b"VP8L", bytes([0x2F]) + struct.pack("<I", bits))
    assert probe_image_header(lossless) == ("webp", 517, 129)

    ext = riff(b"VP8X", bytes(4) + (1919).to_bytes(3, "little")
               + (1079).to_bytes(3, "little"))
    assert probe_image_header(ext) == ("webp", 1920, 1080)

    bad = riff(b"VP8 ", bytes(3) + b"\x00\x01\x2a" + struct.pack("<HH", 1, 1))
    assert probe_image_header(bad) is None
    assert probe_image_header(riff(b"ALPH", b"\x00")) is None
    assert probe_image_header(b"RIFF\x04\x00\x00\x00WAVE") is None


def test_flac_codec_paths():
    """FLAC: lossless roundtrips through the real fixed-predictor + Rice
    encoder (random, smooth, constant, tiny); genuine compression on
    smooth signals; hand-built VERBATIM subframe and escaped (raw)
    residual partition decode; CRC-8/CRC-16 tamper detection; hostile
    inputs → None."""
    import math
    import random

    from impc_etl_spark.multimodal.media import (
        _crc8, _crc16, _flac_streaminfo, _FlacBitWriter, flac_decode,
        flac_encode_mono16,
    )

    random.seed(11)
    streams = [
        [random.randrange(-32768, 32768) for _ in range(200)],
        [int(9000 * math.sin(i / 7)) for i in range(333)],
        [-5] * 64,
        [32767],
        [0, -32768],
    ]
    for s in streams:
        assert flac_decode(flac_encode_mono16(s, 8000)) == (8000, 1, s)

    smooth = [int(3000 * math.sin(i / 20)) for i in range(4096)]
    assert len(flac_encode_mono16(smooth, 8000)) < 0.6 * 2 * len(smooth)

    # hand-build: VERBATIM subframe + a 2-partition FIXED frame where the
    # second partition uses the ESCAPE (raw 6-bit) encoding
    def frame(build_subframe, n, sample_rate=8000):
        w = _FlacBitWriter()
        w.put(0b11111111111110, 14); w.put(0, 2)
        w.put(0b0111, 4); w.put(0b0000, 4)
        w.put(0b0000, 4); w.put(0b100, 3); w.put(0, 1)
        w.put(0x00, 8); w.put(n - 1, 16)
        w.put(_crc8(bytes(w.out)), 8)
        build_subframe(w)
        w.align()
        body = bytes(w.out)
        return (_flac_streaminfo(sample_rate, 1, 16, n)
                + body + _crc16(body).to_bytes(2, "big"))

    vals = [100, -200, 300, -400]

    def verbatim(w):
        w.put(0, 1); w.put(0b000001, 6); w.put(0, 1)
        for v in vals:
            w.put(v & 0xFFFF, 16)

    assert flac_decode(frame(verbatim, 4)) == (8000, 1, vals)

    res_vals = [3, -2, 1, -1, 5, -6, 7, -8]   # order-0: residual==samples

    def escaped(w):
        w.put(0, 1); w.put(0b001000, 6); w.put(0, 1)   # FIXED order 0
        w.put(0, 2)                                    # 4-bit Rice method
        w.put(1, 4)                                    # partition order 1
        w.put(2, 4)                                    # partition 1: rice k=2
        for v in res_vals[:4]:
            u = (v << 1) if v >= 0 else ((-v) << 1) - 1
            for _ in range(u >> 2):
                w.put(0, 1)
            w.put(1, 1)
            w.put(u & 3, 2)
        w.put(0xF, 4)                                  # partition 2: ESCAPE
        w.put(6, 5)                                    # raw 6-bit residuals
        for v in res_vals[4:]:
            w.put(v & 0x3F, 6)

    assert flac_decode(frame(escaped, 8)) == (8000, 1, res_vals)

    enc = bytearray(flac_encode_mono16([1, 2, 3, 4, 5, 6], 8000))
    enc[-1] ^= 0x01                                   # frame CRC-16 tamper
    assert flac_decode(bytes(enc)) is None
    enc = bytearray(flac_encode_mono16([1, 2, 3, 4, 5, 6], 8000))
    enc[46] ^= 0x40 if len(enc) > 46 else 0           # header-ish tamper
    assert flac_decode(bytes(enc)) in (None, (8000, 1, [1, 2, 3, 4, 5, 6]))
    assert flac_decode(b"") is None
    assert flac_decode(b"fLaC") is None
    assert flac_decode(_flac_streaminfo(8000, 1, 16, 5)) is None  # no frames


def test_flac_lpc_and_stereo_decode():
    """LPC subframes (quantized coefficients + arithmetic shift) and all
    three stereo decorrelation modes — including the side channel's
    extra sample-size bit and odd mid/side sums — reconstruct exactly
    from hand-built spec-conforming frames."""
    from impc_etl_spark.multimodal.media import (
        _crc8, _crc16, _flac_streaminfo, _FlacBitWriter, flac_decode,
    )

    def frame(nch_code, build, n, rate=8000, stream_nch=1):
        w = _FlacBitWriter()
        w.put(0b11111111111110, 14); w.put(0, 2)
        w.put(0b0111, 4); w.put(0b0000, 4)
        w.put(nch_code, 4); w.put(0b100, 3); w.put(0, 1)
        w.put(0x00, 8); w.put(n - 1, 16)
        w.put(_crc8(bytes(w.out)), 8)
        build(w)
        w.align()
        body = bytes(w.out)
        return (_flac_streaminfo(rate, stream_nch, 16, n)
                + body + _crc16(body).to_bytes(2, "big"))

    # LPC order 1 with coef = 1<<shift acts as a previous-sample predictor
    vals = [100, 130, 90, 60, 120, 55]

    def lpc(w):
        w.put(0, 1); w.put(0b100000, 6); w.put(0, 1)
        w.put(vals[0] & 0xFFFF, 16)
        w.put(4, 4)                   # precision 5
        w.put(2, 5)                   # shift 2
        w.put(4, 5)                   # coef 4 == 1<<2
        w.put(0, 2); w.put(0, 4); w.put(7, 4)
        for i in range(1, len(vals)):
            v = vals[i] - vals[i - 1]
            u = (v << 1) if v >= 0 else ((-v) << 1) - 1
            for _ in range(u >> 7):
                w.put(0, 1)
            w.put(1, 1); w.put(u & 127, 7)

    assert flac_decode(frame(0, lpc, len(vals))) == (8000, 1, vals)

    def const_pair(v0, bits0, v1, bits1):
        def build(w):
            w.put(0, 1); w.put(0, 6); w.put(0, 1)
            w.put(v0 & ((1 << bits0) - 1), bits0)
            w.put(0, 1); w.put(0, 6); w.put(0, 1)
            w.put(v1 & ((1 << bits1) - 1), bits1)
        return build

    # left/side: right = left - side; side carries 17 bits
    got = flac_decode(frame(8, const_pair(1000, 16, 300, 17), 4,
                            stream_nch=2))
    assert got == (8000, 2, [1000, 700] * 4)
    # right/side: side first (17 bits), then right
    lt, rt = 11, 4
    mid, side = (lt + rt) >> 1, lt - rt      # odd sum: side LSB matters
    got = flac_decode(frame(9, const_pair(side, 17, rt, 16), 2,
                            stream_nch=2))
    assert got == (8000, 2, [lt, rt] * 2)
    # mid/side
    got = flac_decode(frame(10, const_pair(mid, 16, side, 17), 3,
                            stream_nch=2))
    assert got == (8000, 2, [lt, rt] * 3)
    # stereo frames against a mono STREAMINFO are rejected
    assert flac_decode(frame(8, const_pair(1, 16, 1, 17), 2,
                             stream_nch=1)) is None


def test_header_claimed_decode_bombs_rejected():
    """Header-declared dimensions are attacker data: 65535×65535 JPEG /
    60000×60000 PNG headers and a FLAC stream of zero-bit escape-residual
    frames (legally ~infinite expansion) must all be rejected fast,
    before allocating anything output-sized."""
    import struct
    import time

    from impc_etl_spark.multimodal.media import (
        _crc8, _crc16, _flac_streaminfo, _FlacBitWriter, _png_gray,
        decode_jpeg, decode_png, encode_jpeg_gray, flac_decode,
    )

    j = bytearray(encode_jpeg_gray(bytes(64), 8, 8))
    i = j.index(b"\xff\xc0")
    j[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)
    t0 = time.monotonic()
    assert decode_jpeg(bytes(j)) is None
    assert time.monotonic() - t0 < 0.5

    p = bytearray(_png_gray(bytes(16), 4, 4))
    p[16:24] = struct.pack(">II", 60000, 60000)
    assert decode_png(bytes(p)) is None

    w = _FlacBitWriter()
    w.put(0b11111111111110, 14); w.put(0, 2)
    w.put(0b0111, 4); w.put(0, 4); w.put(0, 4); w.put(0b100, 3); w.put(0, 1)
    w.put(0, 8); w.put(65534, 16)
    w.put(_crc8(bytes(w.out)), 8)
    w.put(0, 1); w.put(0b001000, 6); w.put(0, 1)   # FIXED order 0
    w.put(0, 2); w.put(0, 4); w.put(0xF, 4); w.put(0, 5)  # escape raw=0
    w.align()
    body = bytes(w.out)
    frame = body + _crc16(body).to_bytes(2, "big")
    bomb = _flac_streaminfo(8000, 1, 16, 0) + frame * 2000
    t0 = time.monotonic()
    assert flac_decode(bomb) is None
    assert time.monotonic() - t0 < 5


def test_audio_spectrum_features_known_signals(spark):
    """DFT features recover known spectra: a period-2 alternation puts
    all power in the Nyquist bin (k=4), a period-8 sinusoid in k=1, a
    constant has zero positive-frequency power (NULL centroid/bin), and
    undecodable payloads yield NULL rows."""
    import struct

    from pyspark.sql import functions as F

    from impc_etl_spark.multimodal.media import (
        _wav_pcm16, audio_spectrum_features,
    )

    alt = _wav_pcm16([1000, -1000] * 4, 8000)
    one = _wav_pcm16(
        [int(1000 * __import__("math").sin(2 * __import__("math").pi * n / 8))
         for n in range(8)], 8000)
    flat = _wav_pcm16([500] * 8, 8000)
    rows = [(1, alt), (2, one), (3, flat), (9, b"junk")]
    df = spark.createDataFrame(rows, "media_id bigint, content binary")
    got = {r["media_id"]: r for r in audio_spectrum_features(df).collect()}
    assert got[1]["dominant_bin"] == 4
    assert abs(got[1]["spectral_centroid"] - 4.0) < 1e-9
    assert got[2]["dominant_bin"] == 1
    # integer-rounded samples leak a little into other bins
    assert abs(got[2]["spectral_centroid"] - 1.0) < 1e-3
    assert got[3]["dominant_bin"] is None and got[3]["total_power"] == 0.0
    assert got[9]["total_power"] is None and got[9]["dominant_bin"] is None


def test_tiff_probe_both_byte_orders():
    """TIFF probe: II and MM byte orders, SHORT and LONG dimension
    entries, integration into probe_image_header, hostile rejects."""
    import struct

    from impc_etl_spark.multimodal.media import (
        probe_image_header, probe_tiff_header,
    )

    def tiff(endian, w, h, typ=3):
        e = "<" if endian == "II" else ">"
        hdr = (b"II*\x00" if endian == "II" else b"MM\x00*") \
            + struct.pack(e + "I", 8)
        entries = struct.pack(e + "H", 2)
        for tag, val in ((256, w), (257, h)):
            if typ == 3:
                entries += struct.pack(e + "HHIHH", tag, 3, 1, val, 0)
            else:
                entries += struct.pack(e + "HHII", tag, 4, 1, val)
        return hdr + entries + struct.pack(e + "I", 0)

    assert probe_tiff_header(tiff("II", 640, 480)) == (640, 480, 2)
    assert probe_tiff_header(tiff("MM", 1920, 1080)) == (1920, 1080, 2)
    assert probe_tiff_header(tiff("MM", 99, 77, typ=4)) == (99, 77, 2)
    assert probe_image_header(tiff("II", 640, 480)) == ("tiff", 640, 480)
    assert probe_tiff_header(b"II*\x00") is None
    assert probe_tiff_header(b"II*\x00" + b"\xff" * 40) is None


def test_bmp_decode_paths():
    """BMP: paletted roundtrip with stride padding, 24-bit BGR→RGB with
    bottom-up AND top-down row orders, color palettes, out-of-palette
    indices rejected, hostile inputs → None."""
    import struct

    from impc_etl_spark.multimodal.media import _bmp_gray, decode_bmp

    px = bytes(range(5 * 3))
    assert decode_bmp(_bmp_gray(px, 5, 3)) == (5, 3, "L", bytearray(px))

    def bmp24(w, h, rgb_rows, top_down=False):
        stride = (w * 3 + 3) & ~3
        rows = rgb_rows if top_down else rgb_rows[::-1]
        data = b"".join(
            b"".join(bytes([b, g, r]) for r, g, b in row).ljust(stride, b"\0")
            for row in rows
        )
        off = 14 + 40
        hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
        info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                           1, 24, 0, len(data), 0, 0, 0, 0)
        return hdr + info + data

    rows = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (10, 20, 30)]]
    want = bytearray(v for row in rows for p in row for v in p)
    for td in (False, True):
        got = decode_bmp(bmp24(2, 2, rows, top_down=td))
        assert got == (2, 2, "RGB", want), td

    # color palette → RGB out
    pal = bytes([10, 20, 30, 0]) + bytes([200, 100, 50, 0]) + bytes(8)
    stride = 4
    data = bytes([0, 1, 0, 0])
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 8, 0, len(data),
                       0, 0, 4, 0)
    got = decode_bmp(hdr + info + pal + data)
    assert got == (2, 1, "RGB", bytearray([30, 20, 10, 50, 100, 200]))

    # index beyond declared palette size (biClrUsed=4 → max index 3)
    bad_data = bytes([0, 4, 0, 0])
    assert decode_bmp(hdr + info + pal + bad_data) is None
    assert decode_bmp(b"") is None
    assert decode_bmp(_bmp_gray(px, 5, 3)[:30]) is None


def test_tiff_decode_paths():
    """TIFF: gray roundtrips over byte order × strip layout × PackBits;
    WhiteIsZero inversion; RGB chunky; tiled/planar/16-bit rejected;
    PackBits bomb bounded; hostile inputs → None."""
    from impc_etl_spark.multimodal.media import (
        _packbits_decode, _packbits_encode, _tiff_gray, decode_tiff,
    )

    px = bytes(range(18))
    for pb in (False, True):
        for be in (False, True):
            for rps in (1, 2, 100):
                t = _tiff_gray(px, 6, 3, rows_per_strip=rps,
                               packbits=pb, big_endian=be)
                assert decode_tiff(t) == (6, 3, "L", bytearray(px))

    # WhiteIsZero (photometric 0) inverts; patch the 262 entry value
    t = bytearray(_tiff_gray(px, 6, 3))
    i = t.find(bytes([262 & 0xFF, 1]))  # tag 0x0106 little-endian
    assert i > 0 and t[i + 8] == 1
    t[i + 8] = 0
    assert decode_tiff(bytes(t)) == (
        6, 3, "L", bytearray(255 - v for v in px))

    # PackBits: long-run RLE + literal mix roundtrips; bomb is bounded
    data = b"\x00" * 300 + b"abc" + b"\xff" * 5
    assert _packbits_decode(_packbits_encode(data), 10_000) == data
    assert _packbits_decode(b"\x81A", 128) == b"A" * 128
    assert _packbits_decode(b"\x81A", 10) is None
    assert _packbits_decode(b"\x05ab", 100) is None  # truncated literal

    # RGB chunky, hand-built: photometric 2, spp 3, BitsPerSample an
    # out-of-line 3-SHORT array (6 bytes > the 4-byte inline slot)
    def ent(tag, typ, cnt, val):
        sz = {3: 2, 4: 4}[typ]
        return (tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
                + cnt.to_bytes(4, "little")
                + val.to_bytes(sz, "little").ljust(4, b"\x00"))

    rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7])  # 2×2 RGB
    bits_lo = 8 + 2 + 12 * 8 + 4
    data_lo = bits_lo + 6
    body = b"".join([
        ent(256, 3, 1, 2), ent(257, 3, 1, 2), ent(258, 3, 3, bits_lo),
        ent(259, 3, 1, 1), ent(262, 3, 1, 2), ent(273, 4, 1, data_lo),
        ent(277, 3, 1, 3), ent(279, 4, 1, len(rgb)),
    ])
    t = (b"II*\x00" + (8).to_bytes(4, "little") + (8).to_bytes(2, "little")
         + body + b"\x00" * 4 + b"\x08\x00" * 3 + rgb)
    assert decode_tiff(t) == (2, 2, "RGB", bytearray(rgb))

    # RGB with samples-per-pixel 2 (no valid photometric) rejected
    bad_spp = t.replace(ent(277, 3, 1, 3), ent(277, 3, 1, 2), 1)
    assert decode_tiff(bad_spp) is None

    # hostile: truncated file, strip overrun, bad magic
    good = _tiff_gray(px, 6, 3)
    assert decode_tiff(good[:20]) is None
    assert decode_tiff(b"II+\x00" + good[4:]) is None
    assert decode_tiff(good[:-5]) is None  # last strip truncated


def test_pnm_decode_paths():
    """Netpbm: P5 roundtrip; P2/P3 ASCII with comments; P6 binary;
    maxval scaling; bitmaps/16-bit/truncated/overflow → None."""
    from impc_etl_spark.multimodal.media import _pgm_gray, decode_pnm

    px = bytes(range(20))
    assert decode_pnm(_pgm_gray(px, 4, 5)) == (4, 5, "L", bytearray(px))

    p2 = b"P2 # c\n2 2\n# mid\n15\n0 5 10 15\n"
    assert decode_pnm(p2) == (2, 2, "L", bytearray([0, 85, 170, 255]))
    p3 = b"P3\n1 2\n255\n1 2 3 4 5 6"
    assert decode_pnm(p3) == (1, 2, "RGB", bytearray([1, 2, 3, 4, 5, 6]))
    p6 = b"P6\n2 1\n255\n" + bytes([9, 8, 7, 6, 5, 4])
    assert decode_pnm(p6) == (2, 1, "RGB", bytearray([9, 8, 7, 6, 5, 4]))

    assert decode_pnm(b"P5\n2 2\n255\nab") is None       # truncated raster
    assert decode_pnm(b"P4\n2 2\n") is None              # bitmap
    assert decode_pnm(b"P5\n2 2\n65535\n" + b"a" * 8) is None  # 16-bit
    assert decode_pnm(b"P2\n1 1\n10\n11") is None        # value > maxval
    assert decode_pnm(b"P5\n-2 2\n255\n") is None
    assert decode_pnm(b"") is None


def test_aiff_decode_paths():
    """AIFF: PCM16 roundtrip; 80-bit extended rate field exact for real
    sample rates; signed 8-bit; odd-chunk padding walk; AIFC and
    truncated SSND rejected."""
    import struct

    from impc_etl_spark.multimodal.media import (
        _aiff_pcm16, _f80_to_int, _int_to_f80, decode_aiff,
    )

    for sr in (8000, 11025, 22050, 44100, 48000, 96000, 192000, 1):
        assert _f80_to_int(_int_to_f80(sr)) == sr
    assert _f80_to_int(b"\x00" * 10) == 0
    assert _f80_to_int(b"\xff" * 10) is None       # negative/NaN
    assert _f80_to_int(b"\x00" * 9) is None

    s = [0, 100, -32768, 32767, -1]
    assert decode_aiff(_aiff_pcm16(s, 44100)) == (44100, 1, s)

    # 8-bit AIFF samples are SIGNED (unlike WAV); odd COMM pad honored
    comm = struct.pack(">hIh", 1, 3, 8) + _int_to_f80(8000)
    pad = b"ANNO" + struct.pack(">I", 3) + b"abc\x00"  # odd chunk + pad
    ssnd = struct.pack(">II", 0, 0) + bytes([0x7F, 0x80, 0xFF])
    body = (b"AIFF" + pad[:12]  # 3-byte body written with its pad byte
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    payload = b"FORM" + struct.pack(">I", len(body)) + body
    assert decode_aiff(payload) == (8000, 1, [127, -128, -1])

    assert decode_aiff(b"FORM\x00\x00\x00\x04AIFC") is None
    assert decode_aiff(_aiff_pcm16(s, 8000)[:-3]) is None
    assert decode_aiff(b"") is None


def test_progressive_jpeg_equals_baseline():
    """Progressive (Annex G) and baseline encodings carry the same
    quantized coefficients, so they must decode to IDENTICAL pixels —
    across noise (dense AC, ZRL + refinement runs), gradients, constant
    blocks (pure EOB-run accumulation), and non-multiple-of-8 sizes."""
    import random

    from impc_etl_spark.multimodal.media import (
        decode_jpeg, encode_jpeg_gray, encode_jpeg_gray_progressive,
    )

    rnd = random.Random(1234)
    for trial in range(12):
        w = rnd.choice([8, 16, 24, 31, 17])
        h = rnd.choice([8, 16, 15, 9])
        kind = trial % 3
        if kind == 0:
            px = bytes(rnd.randrange(256) for _ in range(w * h))
        elif kind == 1:
            px = bytes(((x * 7 + y * 3) % 256)
                       for y in range(h) for x in range(w))
        else:
            px = bytes([rnd.randrange(256)]) * (w * h)
        base = decode_jpeg(encode_jpeg_gray(px, w, h))
        prog = decode_jpeg(encode_jpeg_gray_progressive(px, w, h))
        assert prog is not None and prog == base, (trial, w, h)


def test_progressive_jpeg_hostile():
    """Progressive path: header decode-bomb rejected fast, truncated
    scans and truncated refinement streams → None, scan for an unknown
    component id → None — never an exception."""
    import struct
    import time

    from impc_etl_spark.multimodal.media import (
        decode_jpeg, encode_jpeg_gray_progressive,
    )

    good = encode_jpeg_gray_progressive(bytes(range(64)), 8, 8)
    assert decode_jpeg(good) is not None

    j = bytearray(good)
    i = j.index(b"\xff\xc2")
    j[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)
    t0 = time.monotonic()
    assert decode_jpeg(bytes(j)) is None
    assert time.monotonic() - t0 < 0.5

    for cut in (20, len(good) // 2, len(good) - 5):
        got = decode_jpeg(good[:cut])          # truncation never raises
        assert got is None or isinstance(got, tuple)

    j = bytearray(good)
    i = j.index(b"\xff\xda")
    j[i + 5] = 99                 # SOS names a component id not in SOF2
    assert decode_jpeg(bytes(j)) is None


def _vp8l_header(wtr, w, h):
    wtr.put(0x2F, 8)
    wtr.put(w - 1, 14)
    wtr.put(h - 1, 14)
    wtr.put(0, 1)
    wtr.put(0, 3)


def _vp8l_wrap(wtr):
    import struct

    chunk = bytes(wtr.out)
    padded = chunk + (b"\x00" if len(chunk) & 1 else b"")
    body = b"WEBP" + b"VP8L" + struct.pack("<I", len(chunk)) + padded
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _vp8l_codes(wtr, green_syms, red_syms, blue_syms, alpha_syms,
                dist_syms, cache_size=0):
    """Emit the 5-code group; returns encode tables per channel."""
    from impc_etl_spark.multimodal.media import (
        _vp8l_huff_lengths, _vp8l_write_code,
    )

    tables = []
    for syms, alphabet in ((green_syms, 280 + cache_size), (red_syms, 256),
                           (blue_syms, 256), (alpha_syms, 256),
                           (dist_syms, 40)):
        freqs = {s: 1 for s in syms}
        tables.append(_vp8l_write_code(wtr, _vp8l_huff_lengths(freqs, alphabet)))
    return tables


def test_webp_lossless_roundtrip():
    """VP8L: encoder→decoder roundtrip over noise/constant/gradient and
    awkward sizes (exercises subtract-green + Huffman literals)."""
    import random

    from impc_etl_spark.multimodal.media import decode_webp, encode_webp_gray

    rnd = random.Random(99)
    for w, h in ((1, 1), (7, 3), (16, 9), (33, 2)):
        for px in (
            bytes(rnd.randrange(256) for _ in range(w * h)),
            bytes([77]) * (w * h),
            bytes((x * 11 + 40) % 256 for x in range(w * h)),
        ):
            assert decode_webp(encode_webp_gray(px, w, h)) == \
                (w, h, "L", bytearray(px))


def test_webp_palette_and_packing():
    """Color-indexing transform with 2 colors → 8-pixels-per-byte
    packing, delta-coded palette."""
    from impc_etl_spark.multimodal.media import _Vp8lBitWriter, decode_webp

    wtr = _Vp8lBitWriter()
    _vp8l_header(wtr, 8, 1)
    wtr.put(1, 1)                    # transform present
    wtr.put(3, 2)                    # color-indexing
    wtr.put(1, 8)                    # 2 colors
    # palette image stream (2×1): black then delta-to-white
    wtr.put(0, 1)                    # no color cache
    t = _vp8l_codes(wtr, [0x00, 0xFF], [0x00, 0xFF], [0x00, 0xFF],
                    [0xFF, 0x00], [0])
    for a, r, g, b in ((0xFF, 0, 0, 0), (0x00, 0xFF, 0xFF, 0xFF)):
        for table, sym in ((t[0], g), (t[1], r), (t[2], b), (t[3], a)):
            c, ln = table[sym]
            wtr.code(c, ln)
    wtr.put(0, 1)                    # no more transforms
    # main (packed 1×1) image: indices 1,0,1,0,1,0,1,1 LSB-first
    wtr.put(0, 1)                    # no cache
    wtr.put(0, 1)                    # no meta
    packed = 0b11010101
    t = _vp8l_codes(wtr, [packed], [0], [0], [0xFF], [0])
    # all codes are single-symbol → zero data bits needed
    got = decode_webp(_vp8l_wrap(wtr))
    assert got == (8, 1, "L", bytearray([255, 0, 255, 0, 255, 0, 255, 255]))


def test_webp_lz77_and_cache():
    """LZ77 back-references (linear distance > 120 and the 2D
    near-neighbor map) and color-cache hits."""
    from impc_etl_spark.multimodal.media import _Vp8lBitWriter, decode_webp

    # 2D map: dist code 1 = (0,1) → one row up; copy whole first row
    wtr = _Vp8lBitWriter()
    _vp8l_header(wtr, 4, 2)
    wtr.put(0, 1)                    # no transforms
    wtr.put(0, 1)                    # no cache
    wtr.put(0, 1)                    # no meta
    t = _vp8l_codes(wtr, [10, 20, 30, 40, 259], [10, 20, 30, 40],
                    [10, 20, 30, 40], [0xFF], [0])
    for v in (10, 20, 30, 40):
        for table, sym in ((t[0], v), (t[1], v), (t[2], v), (t[3], 0xFF)):
            c, ln = table[sym]
            wtr.code(c, ln)
    c, ln = t[0][259]                # length prefix 3 → length 4
    wtr.code(c, ln)
    c, ln = t[4][0]                  # distance prefix 0 → code 1 → (0,1)
    wtr.code(c, ln)
    got = decode_webp(_vp8l_wrap(wtr))
    assert got == (4, 2, "L", bytearray([10, 20, 30, 40] * 2))

    # linear distance (code 121 → dist 1) + cache hits for both pixels
    def cache_idx(argb):
        return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> 28

    iA, iB = cache_idx(0xFF0A0A0A), cache_idx(0xFF141414)
    assert iA != iB
    wtr = _Vp8lBitWriter()
    _vp8l_header(wtr, 6, 1)
    wtr.put(0, 1)                    # no transforms
    wtr.put(1, 1)                    # color cache
    wtr.put(4, 4)                    # 16 entries
    wtr.put(0, 1)                    # no meta
    t = _vp8l_codes(wtr, [10, 20, 257, 280 + iA, 280 + iB],
                    [10, 20], [10, 20], [0xFF], [13], cache_size=16)
    for v in (10, 20):
        for table, sym in ((t[0], v), (t[1], v), (t[2], v), (t[3], 0xFF)):
            c, ln = table[sym]
            wtr.code(c, ln)
    c, ln = t[0][257]                # length prefix 1 → length 2
    wtr.code(c, ln)
    c, ln = t[4][13]                 # dist prefix 13 + 5 extra bits
    wtr.code(c, ln)
    wtr.put(24, 5)                   # 96 + 24 + 1 = code 121 → dist 1
    for sym in (280 + iA, 280 + iB):
        c, ln = t[0][sym]
        wtr.code(c, ln)
    got = decode_webp(_vp8l_wrap(wtr))
    assert got == (6, 1, "L", bytearray([10, 20, 20, 20, 10, 20]))


def test_webp_predictor_and_cross_color():
    """Inverse predictor transform (mode 2: top) and inverse cross-color
    (green-to-red multiplier) reconstruct exactly."""
    from impc_etl_spark.multimodal.media import _Vp8lBitWriter, decode_webp

    wtr = _Vp8lBitWriter()
    _vp8l_header(wtr, 4, 2)
    wtr.put(1, 1)
    wtr.put(0, 2)                    # predictor transform
    wtr.put(0, 3)                    # size_bits = 2 → one 4×4 tile
    wtr.put(0, 1)                    # tile image: no cache
    _vp8l_codes(wtr, [2], [0], [0], [0], [0])   # mode 2 (top), 0 bits
    wtr.put(0, 1)                    # no more transforms
    wtr.put(0, 1)                    # no cache
    wtr.put(0, 1)                    # no meta
    t = _vp8l_codes(wtr, [10, 40], [10, 40], [10, 40], [0], [0])
    # residuals: row0 all 10 (left chain), row1 all 40 (top pred)
    for v in (10, 10, 10, 10, 40, 40, 40, 40):
        for table, sym in ((t[0], v), (t[1], v), (t[2], v), (t[3], 0)):
            c, ln = table[sym]
            wtr.code(c, ln)
    got = decode_webp(_vp8l_wrap(wtr))
    assert got == (4, 2, "L",
                   bytearray([10, 20, 30, 40, 50, 60, 70, 80]))

    wtr = _Vp8lBitWriter()
    _vp8l_header(wtr, 2, 1)
    wtr.put(1, 1)
    wtr.put(1, 2)                    # cross-color transform
    wtr.put(0, 3)                    # size_bits = 2 → one tile
    wtr.put(0, 1)
    _vp8l_codes(wtr, [0], [0], [16], [0], [0])  # g2r=16 in blue channel
    wtr.put(0, 1)
    wtr.put(0, 1)
    wtr.put(0, 1)
    t = _vp8l_codes(wtr, [64, 100], [32, 50], [64, 100], [0xFF], [0])
    for g, r, b in ((64, 32, 64), (100, 50, 100)):
        for table, sym in ((t[0], g), (t[1], r), (t[2], b), (t[3], 0xFF)):
            c, ln = table[sym]
            wtr.code(c, ln)
    got = decode_webp(_vp8l_wrap(wtr))
    assert got == (2, 1, "L", bytearray([64, 100]))


def test_webp_meta_prefix_groups():
    """Meta-prefix image selects different code groups per 4-px tile."""
    from impc_etl_spark.multimodal.media import _Vp8lBitWriter, decode_webp

    wtr = _Vp8lBitWriter()
    _vp8l_header(wtr, 8, 1)
    wtr.put(0, 1)                    # no transforms
    wtr.put(0, 1)                    # no cache
    wtr.put(1, 1)                    # meta-prefix image present
    wtr.put(0, 3)                    # meta bits = 2 → 2 tiles of 4 px
    wtr.put(0, 1)                    # meta image: no cache
    mt = _vp8l_codes(wtr, [0, 1], [0], [0], [0], [0])
    for g in (0, 1):                 # tile 0 → group 0, tile 1 → group 1
        c, ln = mt[0][g]
        wtr.code(c, ln)
    g0 = _vp8l_codes(wtr, [5], [5], [5], [0xFF], [0])
    g1 = _vp8l_codes(wtr, [9], [9], [9], [0xFF], [0])
    # every code in both groups is single-symbol → zero data bits
    del g0, g1
    got = decode_webp(_vp8l_wrap(wtr))
    assert got == (8, 1, "L", bytearray([5] * 4 + [9] * 4))


def test_webp_hostile():
    """Corrupt VP8L payloads → None, never an exception; lossy VP8 and
    decode bombs rejected."""
    import struct
    import time

    from impc_etl_spark.multimodal.media import (
        _Vp8lBitWriter, decode_webp, encode_webp_gray,
    )

    good = encode_webp_gray(bytes(range(21)), 7, 3)
    assert decode_webp(good) is not None
    for cut in (4, 12, 20, len(good) - 2):
        assert decode_webp(good[:cut]) is None
    assert decode_webp(b"RIFF\x04\x00\x00\x00WEBP") is None
    lossy = good.replace(b"VP8L", b"VP8 ")
    assert decode_webp(lossy) is None

    wtr = _Vp8lBitWriter()
    _vp8l_header(wtr, 16383, 16383)  # 14-bit max dims: 1 GiB decode bomb
    t0 = time.monotonic()
    assert decode_webp(_vp8l_wrap(wtr)) is None
    assert time.monotonic() - t0 < 0.5
    del struct


def test_progressive_eob_chunk_boundary(monkeypatch):
    """Refinement EOB runs that hit the EOBn ceiling must flush run +
    correction bits together per chunk — with the cap shrunk to 3, a
    band of history-only blocks crosses several chunk boundaries and
    must still round-trip bit-identically."""
    import impc_etl_spark.multimodal.media as media

    monkeypatch.setattr(media, "_JPEG_EOB_RUN_CAP", 3)
    # 16 blocks; every block's AC band holds a history coefficient with
    # an odd low bit (constant 96 alternating rows → strong AC terms)
    w, h = 32, 32
    px = bytes((200 if (y // 2) % 2 else 40) for y in range(h) for _ in range(w))
    base = media.decode_jpeg(media.encode_jpeg_gray(px, w, h))
    prog = media.decode_jpeg(media.encode_jpeg_gray_progressive(px, w, h))
    assert prog is not None and prog == base


def test_decode_cpu_bombs_bounded():
    """Hostile payloads must fail in bounded time: a TIFF whose IFD
    declares huge value arrays for unconsulted tags, a long JPEG entropy
    segment (the bit-reader accumulator must not grow with the scan),
    and a tiny SOF2 claiming a maximal frame."""
    import struct
    import time

    from impc_etl_spark.multimodal.media import (
        _JpegBitReader, decode_jpeg, decode_tiff,
    )

    # IFD with 64 entries, each type BYTE count 2^20 offset 0 — every
    # read is in-bounds against the 1 MB body, but the tags are junk
    body = b"\x00" * (1 << 20)
    n_ent = 64
    entries = b"".join(
        struct.pack("<HHII", 40000 + e, 1, 1 << 20, 8)
        for e in range(n_ent)
    )
    tiff = b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", n_ent) \
        + entries + struct.pack("<I", 0) + body
    t0 = time.monotonic()
    assert decode_tiff(tiff) is None
    assert time.monotonic() - t0 < 0.5

    # 80 KB of entropy bits must stream in linear time
    r = _JpegBitReader(b"\x55" * 80_000, 0)
    t0 = time.monotonic()
    for _ in range(80_000 * 8):
        r.bit()
    assert time.monotonic() - t0 < 2.0

    sof2 = (b"\xff\xd8\xff\xc2" + struct.pack(">H", 11) + bytes([8])
            + struct.pack(">HH", 8192, 8192) + bytes([1, 1, 0x11, 0]))
    t0 = time.monotonic()
    assert decode_jpeg(sof2) is None
    assert time.monotonic() - t0 < 0.5


def test_mp3_adts_frame_walks():
    """Frame walks: VBR MP3 chains sum per-frame lengths (padding bit
    honored), truncated tails drop the final frame, junk prefixes are
    skipped, ADTS parameter changes stop the walk — never raises."""
    from impc_etl_spark.multimodal.media import (
        _adts_frame, _mp3_frame, walk_adts_frames, walk_mp3_frames,
    )

    m = _mp3_frame(9, 0) + _mp3_frame(1, 1) + _mp3_frame(14, 0)
    assert walk_mp3_frames(m) == (3, 3 * 1152 / 44100, 128 + 32 + 320)
    assert walk_mp3_frames(m[:-5]) == (2, 2 * 1152 / 44100, 160)
    assert walk_mp3_frames(b"\x00junk" + m)[0] == 3
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x05" + bytes(5)
    assert walk_mp3_frames(id3 + m)[0] == 3
    assert walk_mp3_frames(b"junk") is None
    assert walk_mp3_frames(b"") is None

    a = _adts_frame(4, 2, 100) + _adts_frame(4, 2, 50)
    assert walk_adts_frames(a) == (2, 2 * 1024 / 44100, 44100, 2)
    assert walk_adts_frames(a[:-3]) == (1, 1024 / 44100, 44100, 2)
    mixed = _adts_frame(4, 2, 10) + _adts_frame(3, 2, 10)
    assert walk_adts_frames(mixed) == (1, 1024 / 44100, 44100, 2)
    assert walk_adts_frames(b"\xff\xf1") is None


def test_frame_walk_false_sync_and_nblocks():
    """A sync-looking byte pair with reserved header fields must not end
    the initial scan (the probe keeps looking; so must the walks), and
    ADTS frames carrying multiple raw data blocks credit all of them."""
    from impc_etl_spark.multimodal.media import (
        _adts_frame, _mp3_frame, decode_tiff, walk_adts_frames,
        walk_mp3_frames,
    )
    import struct
    import time

    m = _mp3_frame(9, 0) + _mp3_frame(1, 1)
    assert walk_mp3_frames(b"\xff\xe0\x00\x00" + m) == \
        (2, 2 * 1152 / 44100, 160)
    a = _adts_frame(4, 2, 30)
    assert walk_adts_frames(b"\xff\xf0\x00" + a) == \
        (1, 1024 / 44100, 44100, 2)
    a3 = bytearray(a)
    a3[6] |= 0x2                     # number_of_raw_data_blocks = 2 → 3
    assert walk_adts_frames(bytes(a3)) == (1, 3 * 1024 / 44100, 44100, 2)

    # duplicate WANTED tags must not multiply the TIFF value budget
    body = b"\x00" * (1 << 18)
    entries = b"".join(
        struct.pack("<HHII", 273, 4, 1 << 16, 8) for _ in range(256)
    )
    bomb = (b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 256)
            + entries + struct.pack("<I", 0) + body)
    t0 = time.monotonic()
    assert decode_tiff(bomb) is None
    assert time.monotonic() - t0 < 0.5

    # SOF2 with no scans: no fabricated gray image, bounded time
    from impc_etl_spark.multimodal.media import decode_jpeg

    sof2 = (b"\xff\xd8\xff\xc2" + struct.pack(">H", 11) + bytes([8])
            + struct.pack(">HH", 2048, 2048) + bytes([1, 1, 0x11, 0]))
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([16] * 64)
    com = b"\xff\xfe" + struct.pack(">H", 9000) + b"\x00" * 8998
    t0 = time.monotonic()
    assert decode_jpeg(sof2[:2] + dqt + sof2[2:] + com + b"\xff\xd9") is None
    assert time.monotonic() - t0 < 0.5


def test_ico_decode_paths():
    """ICO: PNG-in-ICO, doubled-height DIB via the BMP decoder, 32-bit
    BGRA with and without transparency, largest-entry selection,
    hostile inputs → None."""
    import struct

    from impc_etl_spark.multimodal.media import (
        _bmp_gray, _png_gray, decode_ico,
    )

    def ico_wrap(entries):
        hdr = struct.pack("<HHH", 0, 1, len(entries))
        dirs = b""
        off = 6 + 16 * len(entries)
        blobs = b""
        for w, h, body in entries:
            dirs += bytes([w % 256, h % 256, 0, 0]) \
                + struct.pack("<HHII", 1, 32, len(body), off)
            off += len(body)
            blobs += body
        return hdr + dirs + blobs

    png = _png_gray(bytes(range(16)), 4, 4)
    assert decode_ico(ico_wrap([(4, 4, png)])) == \
        (4, 4, "L", bytearray(range(16)))

    dib = bytearray(_bmp_gray(bytes(range(15)), 5, 3)[14:])
    dib[8:12] = (6).to_bytes(4, "little")   # doubled height
    assert decode_ico(ico_wrap([(5, 3, bytes(dib))])) == \
        (5, 3, "L", bytearray(range(15)))

    w, h = 2, 2
    info = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0, 0, 0, 0, 0, 0)
    rows = [[(10, 20, 30, 255), (40, 50, 60, 255)],
            [(70, 80, 90, 255), (1, 2, 3, 255)]]
    data = b"".join(bytes([b, g, r, a])
                    for row in rows[::-1] for (r, g, b, a) in row)
    want = bytearray(v for row in rows for (r, g, b, a) in row
                     for v in (r, g, b))
    assert decode_ico(ico_wrap([(w, h, info + data)])) == (2, 2, "RGB", want)
    data2 = bytearray(data)
    data2[3] = 128                   # one translucent pixel → RGBA out
    got = decode_ico(ico_wrap([(w, h, info + bytes(data2))]))
    assert got[2] == "RGBA" and len(got[3]) == 16

    assert decode_ico(ico_wrap([(1, 1, b"xx"), (4, 4, png)])) == \
        (4, 4, "L", bytearray(range(16)))
    assert decode_ico(b"") is None
    assert decode_ico(b"\x00\x00\x01\x00\x01\x00" + b"\xff" * 20) is None


def test_svg_probe_and_tga_decode():
    """SVG: width/height attrs (px tolerated) and viewBox fallback via
    the pull parser, non-root <svg> rejected; TGA: gray/RLE/true-color
    roundtrips, bottom-up rows, alpha collapse, hostile → None."""
    import struct

    from impc_etl_spark.multimodal.media import (
        _tga_gray, decode_tga, probe_image_header, probe_svg_header,
    )

    assert probe_svg_header(b'<svg width="64px" height="32"></svg>') == \
        (64, 32)
    assert probe_svg_header(
        b'<?xml version="1.0"?><svg viewBox="0 0 24 16"/>') == (24, 16)
    assert probe_svg_header(b'<html><svg width="1" height="1"/></html>') \
        is None
    assert probe_svg_header(b"<svg/>") is None
    assert probe_svg_header(b"junk") is None
    assert probe_image_header(b'<svg width="5" height="7"/>') == \
        ("svg", 5, 7)

    px = bytes([7] * 30 + list(range(10)))
    for rle in (False, True):
        assert decode_tga(_tga_gray(px, 8, 5, rle=rle)) == \
            (8, 5, "L", bytearray(px))

    # 24-bit BGR bottom-up, type 2
    rows = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (9, 8, 7)]]
    data = b"".join(bytes([b, g, r]) for row in rows[::-1]
                    for (r, g, b) in row)
    hdr = bytes([0, 0, 2]) + bytes(9) + struct.pack("<HH", 2, 2) \
        + bytes([24, 0x00])
    want = bytearray(v for row in rows for p in row for v in p)
    assert decode_tga(hdr + data) == (2, 2, "RGB", want)

    # 32-bit with one translucent pixel → RGBA; all-opaque → RGB
    data32 = b"".join(bytes([b, g, r, 255]) for row in rows[::-1]
                      for (r, g, b) in row)
    hdr32 = bytes([0, 0, 2]) + bytes(9) + struct.pack("<HH", 2, 2) \
        + bytes([32, 0x00])
    assert decode_tga(hdr32 + data32) == (2, 2, "RGB", want)
    trans = bytearray(data32)
    trans[3] = 1
    got = decode_tga(hdr32 + bytes(trans))
    assert got[2] == "RGBA" and len(got[3]) == 16

    assert decode_tga(b"") is None
    assert decode_tga(_tga_gray(px, 8, 5)[:-3]) is None
    assert decode_tga(bytes([0, 1, 2]) + bytes(40)) is None  # color-mapped


def test_probe_and_decode_review_regressions():
    """Pinned review findings: SVG DTD/entity rejection + prefixed
    namespaces + exact localname; OS/2 BMP probe rejection; ICO DIB
    width beats sloppy directory bytes; TGA right-to-left mirroring;
    PNM probe is header-only."""
    import struct

    from impc_etl_spark.multimodal.media import (
        decode_ico, decode_tga, probe_image_header, probe_svg_header,
    )

    assert probe_svg_header(
        b'<!DOCTYPE svg [<!ENTITY c "x">]><svg width="5" height="7"/>'
    ) is None
    assert probe_svg_header(b'<foosvg width="5" height="7"/>') is None
    assert probe_svg_header(
        b'<s:svg xmlns:s="http://www.w3.org/2000/svg" width="3" height="4"/>'
    ) == (3, 4)
    assert probe_image_header(b'<svg\n width="5" height="7"/>') == \
        ("svg", 5, 7)

    core = (b"BM" + struct.pack("<IHHI", 100, 0, 0, 26)
            + struct.pack("<IHHHH", 12, 5, 3, 1, 8) + bytes(60))
    assert probe_image_header(core) is None  # OS/2 core header: 16-bit dims

    assert probe_image_header(b"P2 2 2 255 ") == ("pnm", 2, 2)  # header only

    info = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 32, 0, 0, 0, 0, 0, 0)
    pix = [(i, i + 1, i + 2, 255) for i in range(0, 16, 4)]
    data = b"".join(bytes([b, g, r, a]) for (r, g, b, a) in pix)
    ico = (struct.pack("<HHH", 0, 1, 1) + bytes([2, 1, 0, 0])
           + struct.pack("<HHII", 1, 32, len(info + data), 22)
           + info + data)
    assert decode_ico(ico) == (4, 1, "RGB", bytearray(
        v for (r, g, b, a) in pix for v in (r, g, b)))

    hdr = (bytes([0, 0, 3]) + bytes(9) + struct.pack("<HH", 2, 2)
           + bytes([8, 0x30]))
    assert decode_tga(hdr + bytes([1, 2, 3, 4])) == \
        (2, 2, "L", bytearray([2, 1, 4, 3]))


def test_gif_frame_walk():
    """Animated GIF: frame count + GCE delay summation at container
    level; single-frame GIFs report zero delay; 87a/89a; hostile → None."""
    import struct

    from impc_etl_spark.multimodal.media import _gif_gray, walk_gif_frames

    g = _gif_gray(bytes(range(16)), 4, 4)
    assert walk_gif_frames(g) == (1, 0, 4, 4)

    hdr_end = 13 + 3 * (2 << (g[10] & 0x07))
    body = g[hdr_end:-1]
    out = g[:hdr_end]
    for dly in (10, 20, 30):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", dly) + b"\x00\x00" \
            + body
    out += b"\x3b"
    assert walk_gif_frames(out) == (3, 60, 4, 4)

    assert walk_gif_frames(b"GIF89a") is None
    assert walk_gif_frames(b"NOPE" + g[4:]) is None
    assert walk_gif_frames(g[:13] + b"\xff") is None  # bogus block type


def test_gif_walk_truncation_and_89a_stamp(spark):
    """Fourth-pass regressions: truncated frames are dropped (whole
    frames still count, like the MP3 walk); synthesized animated GIFs
    carry the GIF89a signature their GCE blocks require; the image
    probe's SVG gate window matches the dedicated probe."""
    import struct

    from impc_etl_spark.multimodal.media import (
        _gif_gray, probe_image_header, synth_animated_gif,
        walk_gif_frames,
    )

    g = _gif_gray(bytes(range(16)), 4, 4)
    hdr_end = 13 + 3 * (2 << (g[10] & 0x07))
    body = g[hdr_end:-1]
    out = g[:hdr_end]
    for dly in (10, 20, 30):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", dly) + b"\x00\x00" \
            + body
    out += b"\x3b"
    cut = out[: hdr_end + 2 * (8 + len(body)) - 5]
    got = walk_gif_frames(cut)
    assert got is not None and got[0] <= 2
    assert walk_gif_frames(g[:-2]) is None

    df = spark.createDataFrame([(1, b"seed")], "media_id bigint, content binary")
    payload = bytes(synth_animated_gif(df).collect()[0]["content"])
    assert payload[:6] == b"GIF89a"
    assert walk_gif_frames(payload) is not None

    svg = b"<!-- " + b"x" * 1100 + b' --><svg width="3" height="4"/>'
    assert probe_image_header(svg) == ("svg", 3, 4)


def test_jpeg_subsampled_420_exact_and_422():
    """4:2:0 MCU-interleaved decode: constant-per-block planes reconstruct
    integer-exactly through encode -> MCU loop -> replication upsampling
    -> T.871 RGB; 4:2:2 and 4:4:4 agree on constant content."""
    import hashlib
    import math

    from impc_etl_spark.multimodal.media import decode_jpeg, encode_jpeg_color

    d = hashlib.md5(b"subsampled").digest()
    w, h = 32, 16
    y = bytearray(w * h)
    for by in range(2):
        for bx in range(4):
            b = d[by * 4 + bx]
            for yy in range(8):
                base = (by * 8 + yy) * w + bx * 8
                y[base : base + 8] = bytes([b]) * 8
    cw, ch = 16, 8
    cbp, crp = bytearray(cw * ch), bytearray(cw * ch)
    for m in range(2):
        for yy in range(ch):
            base = yy * cw + m * 8
            cbp[base : base + 8] = bytes([d[8 + m]]) * 8
            crp[base : base + 8] = bytes([d[10 + m]]) * 8
    jp = encode_jpeg_color(bytes(y), bytes(cbp), bytes(crp), w, h, "4:2:0")
    W, H, mode, samples = decode_jpeg(jp)
    assert (W, H, mode) == (32, 16, "RGB")

    def recon(b):
        return max(0, min(255, 2 * math.floor((8 * (b - 128)) / 16 + 0.5) + 128))

    for py in range(h):
        for px in range(w):
            Y = recon(d[(py // 8) * 4 + px // 8])
            cb = recon(d[8 + px // 16]) - 128
            cr = recon(d[10 + px // 16]) - 128
            exp = []
            for val in (Y + 1.402 * cr, Y - 0.344136 * cb - 0.714136 * cr,
                        Y + 1.772 * cb):
                v = int(val + 0.5)
                exp.append(0 if v < 0 else 255 if v > 255 else v)
            got = list(samples[(py * w + px) * 3 : (py * w + px) * 3 + 3])
            assert got == exp, (px, py, got, exp)

    # constant content: 4:2:2 and 4:4:4 must decode identically
    yc = bytes([100]) * (w * h)
    r422 = decode_jpeg(encode_jpeg_color(
        yc, bytes([90]) * (16 * 16), bytes([160]) * (16 * 16), w, h, "4:2:2"))
    r444 = decode_jpeg(encode_jpeg_color(
        yc, bytes([90]) * (w * h), bytes([160]) * (w * h), w, h, "4:4:4"))
    assert r422 is not None and r444 is not None
    assert r422 == r444


def test_jpeg_subsampled_neutral_chroma_matches_gray():
    """Cross-path consistency: a 4:2:0 color JPEG with neutral chroma
    (128 -> Cb'=Cr'=128 exactly) must decode to R=G=B equal to the
    grayscale decode of the same luma plane — the chroma machinery adds
    nothing, pinning the Y path through the MCU-interleaved loop against
    the long-standing single-component path."""
    import random

    from impc_etl_spark.multimodal.media import (
        decode_jpeg, encode_jpeg_color, encode_jpeg_gray,
    )

    rng = random.Random(7)
    w, h = 32, 16
    y = bytes(rng.randrange(256) for _ in range(w * h))
    neutral = bytes([128]) * (16 * 8)
    col = decode_jpeg(encode_jpeg_color(y, neutral, neutral, w, h, "4:2:0"))
    gray = decode_jpeg(encode_jpeg_gray(y, w, h))
    assert col is not None and gray is not None
    assert col[2] == "RGB" and gray[2] == "L"
    rgb, lum = col[3], gray[3]
    for i in range(w * h):
        r, g, b = rgb[3 * i : 3 * i + 3]
        assert r == g == b == lum[i], i


def test_jpeg_subsampled_hostile():
    """Subsampled-frame robustness: truncated entropy data, a 3:2
    fractional sampling ratio, factors outside 1..4, and a padded-plane
    bomb all return None (never raise)."""
    import struct

    from impc_etl_spark.multimodal.media import decode_jpeg, encode_jpeg_color

    y = bytes([100]) * (32 * 16)
    c = bytes([128]) * (16 * 8)
    jp = bytearray(encode_jpeg_color(y, c, c, 32, 16, "4:2:0"))
    assert decode_jpeg(bytes(jp[: len(jp) - 12])) is None   # truncated scan

    # corrupt the SOF sampling factors in place: find SOF0 marker
    i = jp.index(b"\xff\xc0")
    # components at offset i+4 (len 2) + 1 prec + 4 dims + 1 nc = i+10
    base = i + 10
    orig = jp[base + 1]
    jp[base + 1] = 0x32                      # Y 3x2 vs chroma 1x1: 3%1==0...
    jp[base + 4] = 0x21                      # Cb 2x1 -> hmax=3, 3 % 2 != 0
    assert decode_jpeg(bytes(jp)) is None    # fractional ratio rejected
    jp[base + 1] = 0x55                      # factor 5: out of range
    jp[base + 4] = 0x11
    assert decode_jpeg(bytes(jp)) is None
    jp[base + 1] = orig
    jp[base + 4] = 0x11
    assert decode_jpeg(bytes(jp)) is not None  # restored: decodes again


def _pil_available():
    try:
        import PIL  # noqa: F401
        return True
    except ImportError:
        return False


import pytest as _pytest


@_pytest.mark.skipif(not _pil_available(), reason="PIL not installed")
def test_native_codec_parity_with_pure_python():
    """Native-library escape hatch (r5 verdict item 8): where PIL exists,
    its decode of our encoder output must agree with the pure-Python
    decoders — same dimensions and (for the exactly-reconstructible
    constant-block JPEG content and lossless PNG/GIF) identical samples.
    Runs only on PIL-equipped workers; the sandbox skips it."""
    import io

    from PIL import Image

    from impc_etl_spark.multimodal.media import (
        decode_jpeg, encode_jpeg_color, encode_jpeg_gray,
    )

    # constant-block grayscale JPEG: integer-exact on both decoders
    jp = encode_jpeg_gray(bytes([90]) * (16 * 8), 16, 8)
    pure = decode_jpeg(jp)
    pil = Image.open(io.BytesIO(jp)).convert("L")
    assert (pil.width, pil.height) == (pure[0], pure[1])
    assert pil.tobytes() == bytes(pure[3])

    # 4:2:0 color: constant planes -> exact on both (any upsampling
    # filter reproduces constants)
    jc = encode_jpeg_color(bytes([100]) * (32 * 16), bytes([90]) * (16 * 8),
                           bytes([160]) * (16 * 8), 32, 16, "4:2:0")
    purec = decode_jpeg(jc)
    pilc = Image.open(io.BytesIO(jc)).convert("RGB")
    assert (pilc.width, pilc.height) == (purec[0], purec[1])
    assert pilc.tobytes() == bytes(purec[3])


def test_jpeg_single_component_noninterleaved_factors():
    """Regression (r6 review): per T.81 A.2.2 a single-component scan is
    NON-interleaved — one data unit per MCU in raster order — whatever
    the SOF sampling factors say (`jpegtran -grayscale` keeps the source
    image's 2x2 Y factors). Walking it with the interleaved A.2.3 grid
    silently permutes blocks. The 2x2-factor stream must decode
    identically to its 1x1 twin, with every block in place."""
    from impc_etl_spark.multimodal.media import decode_jpeg, encode_jpeg_gray

    w, h = 32, 16
    vals = [10, 40, 70, 100, 130, 160, 190, 220]
    px = bytearray(w * h)
    for by in range(2):
        for bx in range(4):
            v = vals[by * 4 + bx]
            for y in range(8):
                for x in range(8):
                    px[(by * 8 + y) * w + bx * 8 + x] = v
    enc = encode_jpeg_gray(bytes(px), w, h)
    i = enc.find(bytes([0xFF, 0xC0]))
    hv_pos = i + 11          # SOF0: marker(2) len(2) prec(1) h(2) w(2) nc(1) cid(1) -> hv
    assert enc[hv_pos] == 0x11
    patched = bytearray(enc)
    patched[hv_pos] = 0x22   # declare 2x2 luma factors, stream unchanged
    base = decode_jpeg(enc)
    got = decode_jpeg(bytes(patched))
    assert got is not None and base is not None
    assert (got[0], got[1], got[2]) == (w, h, "L")
    assert bytes(got[3]) == bytes(base[3])
    centers = [got[3][(by * 8 + 4) * w + bx * 8 + 4]
               for by in range(2) for bx in range(4)]
    assert centers == vals


def test_jpeg_progressive_subsampled_matches_baseline():
    """Progressive chroma-subsampled decode (r5 verdict item 2 follow-on:
    most real crawl JPEGs are progressive 4:2:0): the progressive color
    encoder delivers the SAME quantized coefficients as the baseline
    encoder over interleaved-DC + per-component-AC scans, so both
    encodings must decode to bit-identical pixels — across aligned and
    non-MCU-aligned sizes and all three samplings (exercises the padded
    interleaved grid vs actual non-interleaved grid mapping)."""
    import hashlib

    from impc_etl_spark.multimodal.media import (
        decode_jpeg, encode_jpeg_color, encode_jpeg_color_progressive,
    )

    for (w, h) in [(32, 16), (20, 12), (17, 9), (40, 25)]:
        for sampling in ("4:2:0", "4:2:2", "4:4:4"):
            d = hashlib.md5(f"{w}x{h}{sampling}".encode()).digest() * 64
            y = bytes(d[i % len(d)] for i in range(w * h))
            fx = 2 if sampling != "4:4:4" else 1
            fy = 2 if sampling == "4:2:0" else 1
            cw, ch = (w + fx - 1) // fx, (h + fy - 1) // fy
            cb = bytes(d[(i * 7 + 3) % len(d)] for i in range(cw * ch))
            cr = bytes(d[(i * 11 + 5) % len(d)] for i in range(cw * ch))
            base = decode_jpeg(encode_jpeg_color(y, cb, cr, w, h, sampling))
            prog = decode_jpeg(
                encode_jpeg_color_progressive(y, cb, cr, w, h, sampling))
            assert base is not None and prog is not None, (w, h, sampling)
            assert prog[:3] == (w, h, "RGB")
            assert bytes(prog[3]) == bytes(base[3]), (w, h, sampling)


def test_jpeg_progressive_single_component_factors_normalized():
    """A 1-component progressive frame whose SOF declares 2x2 factors
    decodes non-interleaved per T.81 A.2.2 (same fix class as the
    baseline finding): identical pixels to the 1x1-declared stream."""
    from impc_etl_spark.multimodal.media import (
        decode_jpeg, encode_jpeg_gray_progressive,
    )

    w, h = 24, 16
    px = bytes((7 * i) % 256 for i in range(w * h))
    enc = encode_jpeg_gray_progressive(px, w, h)
    i = enc.find(bytes([0xFF, 0xC2]))
    hv_pos = i + 11
    assert enc[hv_pos] == 0x11
    patched = bytearray(enc)
    patched[hv_pos] = 0x22
    base = decode_jpeg(enc)
    got = decode_jpeg(bytes(patched))
    assert got is not None and bytes(got[3]) == bytes(base[3])


def test_jpeg_progressive_subsampled_hostile():
    """Never-raise + bomb ceilings hold on the generalized progressive
    path: truncation at every prefix, factor tampering, and a huge
    claimed frame all return None or a valid tuple — never raise."""
    import hashlib

    from impc_etl_spark.multimodal.media import (
        decode_jpeg, encode_jpeg_color_progressive,
    )

    d = hashlib.md5(b"hostile-prog").digest() * 32
    w, h = 20, 12
    y = bytes(d[i % len(d)] for i in range(w * h))
    cw, ch = 10, 6
    cb = bytes(d[(i * 3) % len(d)] for i in range(cw * ch))
    cr = bytes(d[(i * 5) % len(d)] for i in range(cw * ch))
    enc = encode_jpeg_color_progressive(y, cb, cr, w, h)
    for cut in range(0, len(enc), 7):
        out = decode_jpeg(enc[:cut])
        assert out is None or len(out) == 4
    # inflate claimed dims to a decode bomb: must reject, not allocate
    i = enc.find(bytes([0xFF, 0xC2]))
    bomb = bytearray(enc)
    bomb[i + 5 : i + 9] = (60000).to_bytes(2, "big") * 2
    assert decode_jpeg(bytes(bomb)) is None
    # non-integer downsampling ratio rejects: Y at 3x3, Cb at 2x2 ->
    # hmax/hf = 3/2 needs fractional resampling (3x1, by contrast, is a
    # legal integer ratio and stays in the support envelope)
    bad = bytearray(enc)
    bad[i + 11] = 0x33
    bad[i + 14] = 0x22
    assert decode_jpeg(bytes(bad)) is None


def test_exif_orientation_probe_and_splice():
    """Exif APP1 walk (tag 274 via the TIFF-IFD machinery): all eight
    orientations survive a splice -> probe roundtrip on a really-encoded
    JPEG; untagged JPEGs and bare TIFFs behave; the tagged stream still
    decodes. Hostile: truncation at every prefix never raises."""
    from impc_etl_spark.multimodal.media import (
        add_exif_orientation, decode_jpeg, encode_jpeg_gray,
        exif_orientation,
    )

    jpeg = encode_jpeg_gray(bytes(range(16)) * 32, 16, 32)
    assert exif_orientation(jpeg) is None
    for o in range(1, 9):
        tagged = add_exif_orientation(jpeg, o)
        assert exif_orientation(tagged) == o
        out = decode_jpeg(tagged)
        assert out is not None and out[:2] == (16, 32)
    tagged = add_exif_orientation(jpeg, 6)
    for cut in range(0, min(len(tagged), 120)):
        r = exif_orientation(tagged[:cut])
        assert r is None or 1 <= r <= 8
    # big-endian bare TIFF path: reuse the repo's own TIFF synth
    from impc_etl_spark.multimodal.media import _tiff_gray

    tif = _tiff_gray(bytes(64), 8, 8)
    assert exif_orientation(tif) is None  # synth carries no tag 274


def test_orient_image_exif_table4():
    """orient_image normalizes per Exif 2.3 Table 4 on an asymmetric 2x3
    single-channel matrix; orientations 5-8 swap dimensions; applying
    the normalization to orientation 1 is the identity; every
    orientation is a bijection (pixel multiset preserved)."""
    from impc_etl_spark.multimodal.media import orient_image

    s = bytes([1, 2, 3, 4, 5, 6])          # w=2, h=3, row-major
    expect = {
        1: ([1, 2, 3, 4, 5, 6], 2, 3),
        2: ([2, 1, 4, 3, 6, 5], 2, 3),     # mirror horizontal
        3: ([6, 5, 4, 3, 2, 1], 2, 3),     # rotate 180
        4: ([5, 6, 3, 4, 1, 2], 2, 3),     # mirror vertical
        5: ([1, 3, 5, 2, 4, 6], 3, 2),     # transpose
        6: ([5, 3, 1, 6, 4, 2], 3, 2),     # rotate 90 CW to upright
        7: ([6, 4, 2, 5, 3, 1], 3, 2),     # transverse
        8: ([2, 4, 6, 1, 3, 5], 3, 2),     # rotate 90 CCW to upright
    }
    for o, (pix, w, h) in expect.items():
        out, ow, oh = orient_image(s, 2, 3, 1, o)
        assert (list(out), ow, oh) == (pix, w, h), o
        assert sorted(out) == sorted(s)
    # multi-channel: channels move together
    rgb = bytes([11, 12, 13, 21, 22, 23])  # w=2, h=1, 3 channels
    out, ow, oh = orient_image(rgb, 2, 1, 3, 2)
    assert (list(out), ow, oh) == ([21, 22, 23, 11, 12, 13], 2, 1)


def test_image_dhash_duplicates_and_hostile_bytes(spark):
    from impc_etl_spark.multimodal.media import image_dhash, synth_gray_bmp

    src = spark.createDataFrame(
        [(1, "same seed"), (2, "same seed"), (3, "different"), (4, "other")],
        ["media_id", "payload"],
    ).selectExpr("media_id", "CAST(payload AS BINARY) AS content")
    bmps = synth_gray_bmp(src, width=9, height=8)
    rows = {r["media_id"]: r for r in image_dhash(bmps).collect()}
    assert rows[1]["dhash"] == rows[2]["dhash"]          # identical images
    assert rows[1]["dhash"] != rows[3]["dhash"]          # differing digest
    assert len(rows[1]["dhash"]) == 64
    assert set(rows[1]["dhash"]) <= {"0", "1"}
    assert rows[1]["width"] == 9 and rows[1]["height"] == 8

    hostile = spark.createDataFrame(
        [(9, bytearray(b"\x00\x01notanimage")), (10, bytearray(b""))],
        ["media_id", "content"],
    )
    bad = {r["media_id"]: r for r in image_dhash(hostile).collect()}
    assert bad[9]["dhash"] is None and bad[10]["dhash"] is None  # never raises


def test_apng_probe_hostile_and_plain(spark):
    from impc_etl_spark.multimodal.media import (
        apng_probe_features, probe_apng, synth_apng, _png_gray,
    )

    # plain (non-animated) PNG: 1 frame, not animated
    assert probe_apng(_png_gray(bytes(range(16)), 4, 4)) == (0, 1, 0, 0)
    # header bomb: million-frame acTL rejected
    import struct, zlib
    def chunk(tag, data):
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF)
    bomb = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
            + chunk(b"acTL", struct.pack(">II", 2_000_000, 0))
            + chunk(b"IEND", b""))
    assert probe_apng(bomb) is None
    # fcTL/acTL count mismatch: corrupt
    bad = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
           + chunk(b"acTL", struct.pack(">II", 3, 0))
           + chunk(b"fcTL", struct.pack(">IIIIIHHBB", 0, 4, 4, 0, 0, 5, 100, 0, 0))
           + chunk(b"IEND", b""))
    assert probe_apng(bad) is None

    hostile = spark.createDataFrame(
        [(1, bytearray(b"\x00notpng"))], ["media_id", "content"])
    row = apng_probe_features(hostile).first()
    assert row["is_animated"] is None  # never raises


def test_color_histogram_alpha_stripped(spark):
    """LA (bpp=2) and RGBA (bpp=4) decodes must histogram CHANNELS, not
    raw interleaved bytes — alpha never reaches the counts (r6 ADVICE
    item 2: these layouts previously fell into the grayscale branch)."""
    import struct
    import zlib

    from impc_etl_spark.multimodal.media import color_histogram

    def chunk(tag, data):
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF)

    def png(ctype, bpp, pixel):
        w = h = 4
        row = b"\x00" + bytes(pixel) * w
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(row * h))
                + chunk(b"IEND", b""))

    # LA: L=64 (bucket 1), A=255 (bucket 3 — must NOT appear)
    la = png(4, 2, (64, 255))
    # RGBA: R=0 (bucket 0), G=128 (bucket 2), B=255 (bucket 3), A=0
    rgba = png(6, 4, (0, 128, 255, 0))
    df = spark.createDataFrame(
        [(1, bytearray(la)), (2, bytearray(rgba))], ["media_id", "content"])
    rows = {r["media_id"]: r for r in color_histogram(df, bins=4).collect()}

    assert rows[1]["width"] == 4 and rows[1]["height"] == 4
    # all 16 luma samples in bucket 1; identical across the 3 channels
    assert rows[1]["hist_r"] == "0,16,0,0"
    assert rows[1]["hist_g"] == "0,16,0,0"
    assert rows[1]["hist_b"] == "0,16,0,0"
    # RGBA: each channel lands in its own bucket, alpha(0) leaks nowhere
    assert rows[2]["hist_r"] == "16,0,0,0"
    assert rows[2]["hist_g"] == "0,0,16,0"
    assert rows[2]["hist_b"] == "0,0,0,16"


def test_classify_media_or_deadletter_is_total(spark):
    """The corrupt-blob triage NEVER raises and lands every blob in
    exactly one class (r7 verdict item 4) — including blobs nastier than
    the synth mix: bad-CRC PNG, mid-IDAT truncation, magic-only stubs."""
    import struct
    import zlib

    from impc_etl_spark.multimodal.media import (
        classify_media_or_deadletter, _png_gray,
    )

    good = _png_gray(bytes(range(16)), 4, 4)
    big = _png_gray(bytes(range(256)) * 4, 32, 32)
    mid_idat = big[:60]                     # signature+IHDR end at byte 33,
    # so byte 60 cuts deep inside the IDAT stream — pixels unrecoverable
    magic_only = b"\x89PNG\r\n\x1a\n"       # signature, no IHDR
    neg_bmp = b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + struct.pack(
        "<ii", -3, 5) + b"\x00" * 20        # negative width BMP header
    bomb_gif = b"GIF89a" + struct.pack("<HH", 65535, 65535)
    blobs = [
        (0, bytearray(good)),          # ok
        (1, bytearray(mid_idat)),      # corrupt_body (truncated stream)
        (2, bytearray(b"")),           # empty
        (3, bytearray(magic_only)),    # unknown_format (probe needs IHDR)
        (4, bytearray(neg_bmp)),       # unknown_format (probe rejects)
        (5, bytearray(bomb_gif)),      # header_bomb (65535^2 > cap)
        (6, bytearray(b"\x00" * 64)),  # unknown_format
    ]
    df = spark.createDataFrame(blobs, ["media_id", "content"])
    rows = {r["media_id"]: r for r in classify_media_or_deadletter(df).collect()}
    assert len(rows) == len(blobs)           # one row per blob, none dropped
    assert rows[0]["status"] == "ok" and rows[0]["width"] == 4
    assert rows[1]["status"] == "corrupt_body"
    assert rows[2]["status"] == "empty"
    assert rows[3]["status"] == "unknown_format"
    assert rows[4]["status"] == "unknown_format"
    assert rows[5]["status"] == "header_bomb"
    assert rows[6]["status"] == "unknown_format"
    # non-ok rows carry NULL dims (dead-letter rows stay inspectable)
    assert rows[1]["width"] is None and rows[5]["width"] is None


def test_synth_corrupt_media_mix_covers_every_class(spark):
    """The hostile-mix synthesizer emits exactly the five triage classes
    per input payload, with media_id = doc_id*5 + variant."""
    from impc_etl_spark.multimodal.media import (
        classify_media_or_deadletter, synth_corrupt_media_mix,
    )

    df = spark.createDataFrame(
        [(7, bytearray(b"payload-a")), (9, bytearray(b"payload-b"))],
        ["media_id", "content"])
    mix = synth_corrupt_media_mix(df)
    triaged = classify_media_or_deadletter(mix).collect()
    assert len(triaged) == 10
    by_doc = {}
    for r in triaged:
        by_doc.setdefault(r["media_id"] // 5, set()).add(r["status"])
    expected = {"ok", "corrupt_body", "empty", "header_bomb", "unknown_format"}
    assert by_doc == {7: expected, 9: expected}
