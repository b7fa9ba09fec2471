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


def test_real_decode_is_stubbed(media_df):
    with pytest.raises(Exception) as ei:
        decode_image_batch(media_df, use_fake_decoder=False).collect()
    assert "NotImplementedError" in str(ei.value) or "real image decode" in str(ei.value)


def test_sample_video_frames(media_df):
    out = sample_video_frames(media_df, every_n=5).collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    # payloads are 20 and 18 bytes → n_frames = 21, 19 → idx 0,5,10,15,20 / 0,5,10,15
    assert by_doc[1] == [0, 5, 10, 15, 20]
    assert by_doc[2] == [0, 5, 10, 15]
