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


def test_real_decode_raises_on_malformed_or_unknown_payloads(spark):
    """Unknown containers raise NotImplementedError; malformed PNG/JPEG/
    GIF-magic payloads fail validation/entropy decode rather than
    silently decoding. (GIF moved from the unknown list to the malformed
    list in round 5 when the real LZW codec landed.)"""
    unknown_df = spark.createDataFrame(
        [(1, b"RIFF....WEBPVP8-not-supported")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception) as ei:
        decode_image_batch(unknown_df, use_fake_decoder=False).collect()
    assert "NotImplementedError" in str(ei.value) or "unrecognized" in str(ei.value)

    for bad in (
        b"\x89PNG-fake-bytes-aaaa",
        b"\xff\xd8\xff\xe0JFIF-fake",
        b"GIF89a-corrupt-payload",
    ):
        with pytest.raises(Exception):
            decode_image_batch(
                spark.createDataFrame(
                    [(1, bad)], "doc_id long, payload binary"
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


def test_real_decode_jpeg_path(spark):
    """A genuine baseline JPEG payload decodes for real through the
    Arrow batch (textured DC+AC blocks → exactly invertible)."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        jpeg_blocks,
        make_jpeg,
    )

    df = spark.createDataFrame(
        [(i, make_jpeg(i)) for i in (3, 10)], "doc_id long, payload binary"
    )
    out = {
        r["doc_id"]: r
        for r in decode_image_batch(df, use_fake_decoder=False).collect()
    }
    for i in (3, 10):
        bw, bh = jpeg_blocks(i)
        assert (out[i]["width"], out[i]["height"], out[i]["n_channels"]) == (
            bw * 8, bh * 8, 1,
        )


def test_jpeg_textured_blocks_round_trip_exactly():
    """Every generated payload decodes back to the exact closed-form
    pixel values for a spread of doc ids (DC + AC(0,1) path: byte
    stuffing, DC prediction across blocks, AC run/size symbols, EXTEND,
    AC dequant, the cosine IDCT terms, multi-block rasters). The closed
    form is evaluated the way the DuckDB oracle evaluates it — ROUND
    half-away on g + a*c_x — so this also pins oracle == decoder."""
    import math

    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        decode_jpeg,
        jpeg_ac_basis,
        jpeg_block_amp,
        jpeg_block_value,
        jpeg_blocks,
        make_jpeg,
    )

    basis = jpeg_ac_basis()
    for doc_id in (0, 1, 7, 11, 128, 255, 2767):
        w, h, c, img = decode_jpeg(make_jpeg(doc_id))
        bw, bh = jpeg_blocks(doc_id)
        assert (w, h, c) == (bw * 8, bh * 8, 1)
        for b in range(bw * bh):
            by, bx = divmod(b, bw)
            blk = img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8, 0]
            g, a = jpeg_block_value(doc_id, b), jpeg_block_amp(doc_id, b)
            expect = [math.floor(g + a * basis[x] + 0.5) for x in range(8)]
            for x in range(8):
                assert (blk[:, x] == expect[x]).all(), (doc_id, b, x)


def test_jpeg_ac_coefficients_exact_for_all_amplitudes():
    """The invertibility proof, checked exhaustively: for EVERY amplitude
    a in [-7, 7] (and boundary base grays), FDCT+quantize of the rounded
    textured block lands exactly on DC = g-128, AC(0,1) = a, all else 0
    — i.e. the encoder's lossy pipeline is lossless on the generator's
    payload class — and the nearest rounding tie across the whole
    amplitude domain is far beyond IDCT float noise."""
    import math

    import numpy as np

    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        _JPEG_A,
        _JPEG_QTABLE,
        _qtable_raster,
        jpeg_ac_basis,
    )

    basis = np.array(jpeg_ac_basis())
    qr = _qtable_raster(_JPEG_QTABLE)
    # tie margin: |frac(a*c_x) - 0.5| bounded away from 0 for all (a, x)
    margin = min(
        abs((a * basis[x]) % 1.0 - 0.5) for a in range(-7, 8) for x in range(8)
    )
    assert margin > 1e-3, margin  # measured 0.0377; IDCT noise ~1e-12
    for a in range(-7, 8):
        for g in (28, 128, 228):
            row = np.round(g + a * basis)
            blk = np.tile(row, (8, 1)) - 128.0
            Fq = np.round((_JPEG_A @ blk @ _JPEG_A.T) / qr).astype(int)
            want = np.zeros((8, 8), dtype=int)
            want[0, 0], want[0, 1] = g - 128, a
            assert (Fq == want).all(), (g, a)


def test_jpeg_textured_lossy_round_trip_within_quant_error():
    """The general AC path (run lengths, ZRL, EOB, magnitude coding,
    full IDCT): random and sparse images survive encode→decode within
    the quantization error budget; a near-lossless table (all-1 AC
    steps) reconstructs within ±2."""
    import numpy as np

    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        _JPEG_QTABLE,
        decode_jpeg,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(3)
    noisy = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    w, h, c, out = decode_jpeg(encode_jpeg_gray(noisy))
    assert (w, h, c) == (24, 16, 1)
    # default table: AC step 16 → per-coefficient error ≤ 8
    assert np.abs(out[:, :, 0].astype(int) - noisy.astype(int)).max() <= 3 * 16

    # sparse image: long zero runs force ZRL symbols through the codec
    sparse = np.full((8, 8), 128, dtype=np.uint8)
    sparse[7, 7] = 255
    fine = np.array([8] + [1] * 63, dtype=np.int32)
    w, h, c, out = decode_jpeg(encode_jpeg_gray(sparse, fine))
    assert np.abs(out[:, :, 0].astype(int) - sparse.astype(int)).max() <= 2

    fine_noisy = decode_jpeg(encode_jpeg_gray(noisy, fine))[3]
    assert np.abs(fine_noisy[:, :, 0].astype(int) - noisy.astype(int)).max() <= 2


def test_jpeg_arbitrary_dims_pad_and_crop():
    """Non-multiple-of-8 images: the encoder edge-pads to the MCU grid,
    SOF0 records the true dims, and the decoder crops back — round trip
    within the near-lossless budget at several awkward shapes."""
    import numpy as np

    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(5)
    fine = np.array([8] + [1] * 63, dtype=np.int32)
    for shape in ((10, 13), (17, 9), (1, 1), (8, 9)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        w, h, c, out = decode_jpeg(encode_jpeg_gray(img, fine))
        assert (h, w, c) == (shape[0], shape[1], 1)
        assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 2


def test_decoder_swap_seam_end_to_end(spark):
    """The documented external-decoder swap seam (decode_image_batch's
    ``decoder`` argument): inject a stand-in 'third-party' decoder with
    the Pillow adapter's exact signature (payload -> (w, h, c, HxWxC
    uint8)) and prove the WHOLE Spark pipeline — schema, Arrow batches,
    feature post-processing — survives the swap with values decided by
    the injected callable. This is the integration proof that a
    deployment with Pillow swaps one argument, not the plan."""
    import numpy as np

    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import make_bmp
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.decode import (
        DECODED_IMAGE_SCHEMA,
        decode_image_batch,
    )

    df = spark.createDataFrame(
        [(i, bytearray(make_bmp(i))) for i in range(6)],
        "doc_id long, payload binary",
    )

    def external_decoder(payload: bytes):
        # deterministic per-payload output: dims from the length, a flat
        # image whose level encodes the first byte
        w, h = 4 + len(payload) % 3, 5
        img = np.full((h, w, 3), payload[0] % 251, dtype=np.uint8)
        return w, h, 3, img

    out = decode_image_batch(df, decoder=external_decoder)
    assert out.schema == DECODED_IMAGE_SCHEMA
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 6
    for i in range(6):
        payload = bytes(make_bmp(i))
        w, h, c, img = external_decoder(payload)
        assert (rows[i]["width"], rows[i]["height"], rows[i]["n_channels"]) == (
            w, h, 3,
        )
        expect = payload[0] % 251 / 255.0
        assert all(abs(f - expect) < 1e-6 for f in rows[i]["features"])


def test_pillow_adapter_raises_cleanly_without_pillow():
    """pillow_decoder() must fail at ADAPTER-CONSTRUCTION time (a clean
    ImportError naming the missing library), never inside a Spark task —
    and where Pillow IS installed it must round-trip a real BMP."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.decode import (
        pillow_decoder,
    )

    try:
        import PIL  # noqa: F401
    except ImportError:
        import pytest

        with pytest.raises(ImportError):
            pillow_decoder()
        return

    import numpy as np

    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        decode_bmp,
        make_bmp,
    )

    d = pillow_decoder()
    payload = bytes(make_bmp(7))
    w, h, c, img = d(payload)
    ww, hh, cc, ref = decode_bmp(payload)
    assert (w, h, c) == (ww, hh, 3)
    assert np.array_equal(img, ref[:, :, :3])
