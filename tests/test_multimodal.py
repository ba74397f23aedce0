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
