"""X4 multimodal plumbing tests: binary payloads, metadata structs,
Arrow-batched decode (fake decoder), frame sampling."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.decode import (
    attach_payload_meta,
    decode_image_batch,
    sample_video_frames,
)


@pytest.fixture()
def media_df(spark):
    rows = [(1, b"\x89PNG-fake-bytes-aaaa"), (2, b"\x89PNG-other-payload")]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_attach_payload_meta(media_df):
    out = attach_payload_meta(media_df, "payload", "image/png").collect()
    m = {r["doc_id"]: r["meta"] for r in out}
    assert m[1]["media_type"] == "image/png"
    assert m[1]["n_bytes"] == 20
    assert m[1]["payload_md5"] == hashlib.md5(b"\x89PNG-fake-bytes-aaaa").hexdigest()


def test_fake_decode_deterministic(media_df):
    out1 = {r["doc_id"]: r for r in decode_image_batch(media_df, use_fake_decoder=True).collect()}
    out2 = {r["doc_id"]: r for r in decode_image_batch(media_df, use_fake_decoder=True).collect()}
    assert out1.keys() == out2.keys() == {1, 2}
    for k in out1:
        assert out1[k]["width"] == out2[k]["width"] >= 1
        assert len(out1[k]["features"]) == 8
        assert out1[k]["features"] == out2[k]["features"]
    assert out1[1]["features"] != out1[2]["features"]  # payload-dependent


def test_real_decode_stubbed_only_for_entropy_formats(spark):
    """JPEG (entropy-coded) still raises; a malformed PNG-magic payload
    fails CRC/signature validation rather than silently decoding."""
    jpeg_df = spark.createDataFrame(
        [(1, b"\xff\xd8\xff\xe0JFIF-fake")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception) as ei:
        decode_image_batch(jpeg_df, use_fake_decoder=False).collect()
    assert "NotImplementedError" in str(ei.value) or "JPEG" in str(ei.value)

    with pytest.raises(Exception):
        decode_image_batch(
            spark.createDataFrame(
                [(1, b"\x89PNG-fake-bytes-aaaa")], "doc_id long, payload binary"
            ),
            use_fake_decoder=False,
        ).collect()


def test_real_decode_png_path(spark):
    """A genuine PNG payload decodes for real through the Arrow batch."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        make_png,
        png_dims,
    )

    df = spark.createDataFrame(
        [(i, make_png(i)) for i in (3, 10)], "doc_id long, payload binary"
    )
    out = {
        r["doc_id"]: r
        for r in decode_image_batch(df, use_fake_decoder=False).collect()
    }
    for i in (3, 10):
        w, h = png_dims(i)
        assert (out[i]["width"], out[i]["height"], out[i]["n_channels"]) == (w, h, 3)


def test_sample_video_frames(media_df):
    out = sample_video_frames(media_df, every_n=5).collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    # payloads are 20 and 18 bytes → n_frames = 21, 19 → idx 0,5,10,15,20 / 0,5,10,15
    assert by_doc[1] == [0, 5, 10, 15, 20]
    assert by_doc[2] == [0, 5, 10, 15]
