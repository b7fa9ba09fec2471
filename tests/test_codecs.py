"""Real-codec tests (multimodal/codecs.py): the oracle queries verify
order-invariant statistics; these pin the order-SENSITIVE parts — bottom-up
row storage, BGR swizzle, row padding, PCM16 endianness."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
    WAV_RATE,
    bmp_dims,
    bmp_pixel_value,
    decode_bmp,
    decode_wav,
    make_bmp,
    make_wav,
    wav_n_samples,
    wav_sample_value,
)


def _manual_bmp(pixels_topdown_rgb: list[list[tuple[int, int, int]]]) -> bytes:
    """Hand-rolled 24-bit BMP (independent of make_bmp) for decoder tests."""
    height = len(pixels_topdown_rgb)
    width = len(pixels_topdown_rgb[0])
    row_len = width * 3
    pad = (4 - row_len % 4) % 4
    data = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        for x in range(width):
            r, g, b = pixels_topdown_rgb[y][x]
            data += bytes([b, g, r])  # BGR
        data += b"\x00" * pad
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    return hdr + info + bytes(data)


def test_bmp_decode_orientation_and_swizzle():
    # asymmetric 1x2: top row pure red, bottom row pure blue
    img_bytes = _manual_bmp([[(255, 0, 0)], [(0, 0, 255)]])
    w, h, c, img = decode_bmp(img_bytes)
    assert (w, h, c) == (1, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]  # top row is red (not flipped)
    assert img[1, 0].tolist() == [0, 0, 255]  # bottom row is blue


def test_bmp_roundtrip_exact_pixels():
    for doc_id in (0, 7, 123):
        w, h = bmp_dims(doc_id)
        width, height, _, img = decode_bmp(make_bmp(doc_id))
        assert (width, height) == (w, h)
        for y in (0, h - 1):
            for x in (0, w - 1):
                want = [bmp_pixel_value(doc_id, x, y, c, w) for c in range(3)]
                assert img[y, x].tolist() == want


def test_bmp_padding_is_skipped():
    # width=3 → row_len 9 → pad 3; a pixel mistaken for padding would shift rows
    payload = make_bmp(0)  # dims(0) = (3, 2)
    w, h, _, img = decode_bmp(payload)
    assert (w, h) == (3, 2)
    assert img[1, 2].tolist() == [
        bmp_pixel_value(0, 2, 1, c, 3) for c in range(3)
    ]


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_wav_roundtrip_exact_samples():
    for doc_id in (0, 5, 99):
        rate, nch, samples = decode_wav(make_wav(doc_id))
        assert rate == WAV_RATE and nch == 1
        n = wav_n_samples(doc_id)
        assert len(samples) == n
        want = np.array([wav_sample_value(doc_id, i) for i in range(n)])
        assert np.array_equal(samples, want)


def test_decode_image_batch_real_bmp_path(spark):
    """decode_image_batch with use_fake_decoder=False must REALLY decode
    BMP payloads (the NotImplementedError is only for compressed formats)."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.decode import (
        decode_image_batch,
    )

    rows = [(int(i), bytearray(make_bmp(i))) for i in (1, 2, 3)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["n_channels"])
        for r in decode_image_batch(df).collect()
    }
    assert got == {i: (*bmp_dims(i), 3) for i in (1, 2, 3)}


# -------------------------------------------------------------- properties

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=40),
    height=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_property(width, height, seed):
    """Any pixel grid survives encode→decode exactly (padding widths,
    1-pixel edges, all-extreme values included via the random generator)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    payload = _manual_bmp(
        [[tuple(int(v) for v in img[y, x]) for x in range(width)] for y in range(height)]
    )
    w, h, c, out = decode_bmp(payload)
    assert (w, h, c) == (width, height, 3)
    assert np.array_equal(out, img)


@settings(max_examples=50, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=500
    )
)
def test_wav_roundtrip_property(samples):
    """Any PCM16 sample sequence survives encode→decode exactly."""
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_RATE)
        w.writeframes(np.array(samples, dtype="<i2").tobytes())
    rate, nch, out = decode_wav(buf.getvalue())
    assert rate == WAV_RATE and nch == 1
    assert out.tolist() == samples


# ------------------------------------------------------------------ PNG

from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (  # noqa: E402
    decode_png,
    make_png,
    png_dims,
    png_pixel_value,
)


def test_png_roundtrip_exact_pixels():
    for doc_id in (0, 1, 2, 5, 11, 23):
        w, h, c, img = decode_png(make_png(doc_id))
        assert (w, h, c) == (*png_dims(doc_id), 3)
        want = np.array(
            [
                [[png_pixel_value(doc_id, y * w + x, ch) for ch in range(3)] for x in range(w)]
                for y in range(h)
            ],
            dtype=np.uint8,
        )
        assert (img == want).all()


def test_png_average_and_paeth_filters():
    """The generator only emits filters 0/1/2; hand-build rows with
    Average (3) and Paeth (4) to prove the full unfilter path."""
    import zlib

    width, height, bpp = 4, 3, 3
    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(height, width * bpp), dtype=np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    raw = bytearray()
    prev = np.zeros(width * bpp, dtype=np.int32)
    for y, ftype in zip(range(height), (0, 3, 4)):
        cur = pixels[y]
        raw.append(ftype)
        for i in range(width * bpp):
            a = int(cur[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if ftype == 0:
                enc = cur[i]
            elif ftype == 3:
                enc = cur[i] - (a + b) // 2
            else:
                enc = cur[i] - paeth(a, b, c)
            raw.append(int(enc) & 0xFF)
        prev = cur

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    w, h, c, img = decode_png(payload)
    assert (w, h, c) == (width, height, 3)
    assert (img.reshape(height, width * bpp) == (pixels & 0xFF)).all()


def test_png_rejects_corrupt_crc():
    p = bytearray(make_png(3))
    p[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(ValueError):
        decode_png(bytes(p))


def test_png_rejects_non_png():
    with pytest.raises(ValueError):
        decode_png(b"GIF89a....")


# ------------------------------------------------------------------ GIF

from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (  # noqa: E402
    _lzw_decode_gif,
    _lzw_encode_gif,
    decode_gif,
    gif_dims,
    gif_index_value,
    gif_palette_bits,
    gif_palette_value,
    make_gif,
)

# The canonical published minimal GIF (1x1 black pixel, 2-color palette,
# LZW min code size 2) — an EXTERNAL reference byte stream, so bit order,
# CLEAR/EOI framing, and screen-descriptor parsing are checked against
# the spec, not just our own encoder.
_CANONICAL_1PX = bytes.fromhex(
    "47494638396101000100800000000000ffffff"
    "21f90401000000002c000000000100010000"
    "02024401003b"
)


def test_gif_canonical_published_bytes():
    w, h, c, img = decode_gif(_CANONICAL_1PX)
    assert (w, h, c) == (1, 1, 3)
    assert img.tolist() == [[[0, 0, 0]]]


def test_gif_roundtrip_all_docids_closed_form():
    for d in range(0, 500, 7):
        w, h, c, img = decode_gif(make_gif(d))
        width, height = gif_dims(d)
        size = 1 << gif_palette_bits(d)
        assert (w, h, c) == (width, height, 3)
        exp = np.array(
            [
                [
                    gif_palette_value(d, gif_index_value(d, p, size), ch)
                    for ch in range(3)
                ]
                for p in range(width * height)
            ],
            dtype=np.uint8,
        ).reshape(height, width, 3)
        assert (img == exp).all()


def test_gif_lzw_kwkwk_case():
    # 'abababab...' forces the decoder's code==next_code branch
    indices = [0, 1] * 20
    assert _lzw_decode_gif(_lzw_encode_gif(indices, 2), 2) == indices
    runs = [1] * 50  # aaa... also exercises it via run-length growth
    assert _lzw_decode_gif(_lzw_encode_gif(runs, 2), 2) == runs


def test_gif_lzw_width_growth_boundaries():
    # long low-entropy stream with mcs=2 crosses 3->4->...->9-bit widths
    indices = [(i * i + i // 3) % 4 for i in range(3000)]
    assert _lzw_decode_gif(_lzw_encode_gif(indices, 2), 2) == indices
    # mcs=8 (256-color root) crossing into 9/10-bit codes
    indices8 = [(i * 7 + (i * i) % 13) % 256 for i in range(2000)]
    assert _lzw_decode_gif(_lzw_encode_gif(indices8, 8), 8) == indices8


def test_gif_rejects_non_gif_and_truncated_stream():
    with pytest.raises(ValueError):
        decode_gif(b"BM......")
    with pytest.raises(ValueError):
        # EOI stripped: sub-block holds a truncated LZW stream
        _lzw_decode_gif(_lzw_encode_gif([0, 1, 2], 2)[:1], 2)


# --------------------------------------------------------- JPEG 4:2:0

from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (  # noqa: E402
    decode_jpeg,
    encode_jpeg_ycbcr420,
    jpeg420_chroma,
    jpeg420_mcus,
    make_jpeg420,
)


def test_jpeg420_exact_flat_mcu_payload():
    """Generated 4:2:0 payloads decode to the exact closed form the
    oracle computes (textured Y, flat chroma, libjpeg fixed-point RGB)."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        jpeg_ac_basis,
        jpeg_block_amp,
        jpeg_block_value,
    )

    basis = np.array(jpeg_ac_basis())
    for d in (0, 7, 123, 499):
        w, h, c, img = decode_jpeg(make_jpeg420(d))
        mw, mh = jpeg420_mcus(d)
        assert (w, h, c) == (16 * mw, 16 * mh, 3)
        bwn = 2 * mw
        for b in range(bwn * 2 * mh):
            by, bx = divmod(b, bwn)
            yv = np.round(
                jpeg_block_value(d, b) + jpeg_block_amp(d, b) * basis
            ).astype(np.int64)
            m = (by // 2) * mw + (bx // 2)
            kb = jpeg420_chroma(d, m, 0) - 128
            kr = jpeg420_chroma(d, m, 1) - 128
            r = np.clip(yv + ((91881 * kr + 32768) >> 16), 0, 255)
            g = np.clip(yv + ((-22554 * kb - 46802 * kr + 32768) >> 16), 0, 255)
            bch = np.clip(yv + ((116130 * kb + 32768) >> 16), 0, 255)
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (blk[:, :, 0] == r[None, :]).all()
            assert (blk[:, :, 1] == g[None, :]).all()
            assert (blk[:, :, 2] == bch[None, :]).all()


def test_jpeg420_partial_mcu_pad_and_crop():
    """Off-grid dims: encoder pads to the 16-grid, decoder crops back;
    with the near-lossless quant table the error stays bounded."""
    fine = np.array([1] * 64, dtype=np.int32)
    rng = np.random.default_rng(11)
    for hh, ww in ((17, 30), (24, 18), (9, 40)):
        y = rng.integers(30, 220, (hh, ww)).astype(np.uint8)
        cbv = np.full((hh, ww), 120, dtype=np.uint8)
        crv = np.full((hh, ww), 140, dtype=np.uint8)
        w, h, c, img = decode_jpeg(encode_jpeg_ycbcr420(y, cbv, crv, fine))
        assert (w, h, c) == (ww, hh, 3)
        # flat chroma survives exactly; Y noise bounded by quant error
        kb, kr = 120 - 128, 140 - 128
        rexp = np.clip(
            y.astype(np.int64) + ((91881 * kr + 32768) >> 16), 0, 255
        )
        assert np.abs(img[:, :, 0].astype(int) - rexp).max() <= 4


def test_jpeg444_mode_round_trips():
    """subsample=False writes a 4:4:4 layout the decoder also handles,
    with full-resolution (non-flat) chroma preserved per pixel."""
    fine = np.array([1] * 64, dtype=np.int32)
    rng = np.random.default_rng(5)
    y = rng.integers(40, 200, (16, 24)).astype(np.uint8)
    cbv = rng.integers(100, 156, (16, 24)).astype(np.uint8)
    crv = rng.integers(100, 156, (16, 24)).astype(np.uint8)
    w, h, c, img = decode_jpeg(
        encode_jpeg_ycbcr420(y, cbv, crv, fine, subsample=False)
    )
    assert (w, h, c) == (24, 16, 3)
    rexp = np.clip(
        y.astype(np.int64)
        + ((91881 * (crv.astype(np.int64) - 128) + 32768) >> 16),
        0,
        255,
    )
    assert np.abs(img[:, :, 0].astype(int) - rexp).max() <= 4


def test_jpeg420_chroma_subsampling_box_average():
    """Non-flat 2x2 chroma cells are box-averaged by the encoder; the
    decoded (replicated) chroma equals the average where it is integral."""
    fine = np.array([1] * 64, dtype=np.int32)
    y = np.full((16, 16), 128, dtype=np.uint8)
    cbv = np.full((16, 16), 128, dtype=np.uint8)
    # 2x2 cells of (100, 104 / 108, 112): mean 106 exactly
    cell = np.array([[100, 104], [108, 112]], dtype=np.uint8)
    crv = np.tile(cell, (8, 8))
    w, h, c, img = decode_jpeg(encode_jpeg_ycbcr420(y, cbv, crv, fine))
    kr = 106 - 128
    rexp = 128 + ((91881 * kr + 32768) >> 16)
    assert np.abs(img[:, :, 0].astype(int) - rexp).max() <= 2


def test_jpeg_rejects_other_sampling_layouts():
    # 4:2:2 (h=2, v=1) is outside the supported profile
    payload = bytearray(make_jpeg420(3))
    i = payload.find(bytes([1, 0x22, 0]))
    payload[i + 1] = 0x21
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


def test_gif_interlaced_decodes_to_same_image():
    for d in (0, 5, 11, 42):
        assert (
            decode_gif(make_gif(d, interlace=True))[3]
            == decode_gif(make_gif(d))[3]
        ).all()


def test_jpeg_restart_intervals_round_trip():
    """DRI + RSTn markers: byte-aligned restarts with DC-predictor reset
    decode identically to the no-restart stream, in gray and 4:2:0 color,
    including RSTn counter wraparound past 8 restarts."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        encode_jpeg_gray,
    )

    fine = np.array([1] * 64, dtype=np.int32)
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (40, 64), dtype=np.uint8)  # 40 MCUs
    base = decode_jpeg(encode_jpeg_gray(img, fine))[3]
    for ri in (1, 3, 7):
        out = decode_jpeg(encode_jpeg_gray(img, fine, restart_interval=ri))[3]
        assert (out == base).all(), ri
    y = rng.integers(30, 220, (48, 64)).astype(np.uint8)
    cbv = rng.integers(100, 156, (48, 64)).astype(np.uint8)
    crv = rng.integers(100, 156, (48, 64)).astype(np.uint8)
    basec = decode_jpeg(encode_jpeg_ycbcr420(y, cbv, crv, fine))[3]
    for ri in (1, 2, 5):
        outc = decode_jpeg(
            encode_jpeg_ycbcr420(y, cbv, crv, fine, restart_interval=ri)
        )[3]
        assert (outc == basec).all(), ri


def test_jpeg_truncated_restart_stream_rejected():
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        encode_jpeg_gray,
    )

    fine = np.array([1] * 64, dtype=np.int32)
    img = np.full((8, 32), 99, dtype=np.uint8)
    payload = bytearray(encode_jpeg_gray(img, fine, restart_interval=1))
    # corrupt the first RSTn marker into an invalid one
    for i in range(len(payload) - 1):
        if payload[i] == 0xFF and 0xD0 <= payload[i + 1] <= 0xD7:
            payload[i + 1] = 0xC8
            break
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


# ---------------------------------------------------- progressive JPEG

from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (  # noqa: E402
    encode_jpeg_progressive,
    make_jpeg_progressive,
)


def test_jpeg_progressive_matches_baseline_pixels():
    """SOF2 spectral-selection streams decode to the identical pixels as
    the baseline encoding of the same image — including images whose AC
    energy spreads across both band scans and triggers ZRL-in-band and
    multi-block EOBRUN batching."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        encode_jpeg_gray,
    )

    fine = np.array([1] * 64, dtype=np.int32)
    rng = np.random.default_rng(31)
    for shape in ((8, 8), (16, 24), (24, 40)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg_gray(img, fine))[3]
        prog = decode_jpeg(encode_jpeg_progressive(img, fine))[3]
        assert (base == prog).all(), shape
    # sparse image: most blocks' bands are empty -> long EOBRUNs with
    # EOBn extra bits (many blocks per symbol)
    sparse = np.full((40, 64), 120, dtype=np.uint8)
    sparse[3, 5] = 250
    base = decode_jpeg(encode_jpeg_gray(sparse, fine))[3]
    prog = decode_jpeg(encode_jpeg_progressive(sparse, fine))[3]
    assert (base == prog).all()


def test_jpeg_progressive_generator_exact():
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        make_jpeg,
    )

    for d in (0, 11, 255):
        assert (
            decode_jpeg(make_jpeg_progressive(d))[3]
            == decode_jpeg(make_jpeg(d))[3]
        ).all()


# ------------------------------------ successive approximation (round 8)

from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (  # noqa: E402
    encode_jpeg_progressive_sa,
    make_jpeg_prog_sa,
)


def test_jpeg_progressive_sa_matches_baseline_pixels():
    """FULL progressive streams (spectral selection + successive
    approximation) decode to the identical pixels as the baseline
    encoding — all bit-planes down to Al=0 are sent, so reconstruction
    is exact. The image classes stress every SA path: random (dense
    correction-bit traffic), flat-with-patch (EOBn runs carrying
    correction bits across blocks), gradients (newly-significant
    coding), and sparse (ZRL inside refinement scans)."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(31)
    imgs = [rng.integers(0, 256, s, dtype=np.uint8) for s in ((8, 8), (16, 24), (24, 40))]
    flat = np.full((32, 16), 252, dtype=np.uint8)
    flat[:4, :4] = 60
    yy, xx = np.mgrid[0:24, 0:32]
    grad = ((yy * 3 + xx * 5) % 256).astype(np.uint8)
    sparse = np.full((40, 64), 120, dtype=np.uint8)
    sparse[3, 5] = 250
    for img in imgs + [flat, grad, sparse]:
        base = decode_jpeg(encode_jpeg_gray(img))[3]
        sa = decode_jpeg(encode_jpeg_progressive_sa(img))[3]
        assert (base == sa).all(), img.shape


def test_jpeg_progressive_sa_al_levels():
    """Exactness holds at every Ah/Al scan-script depth (1-3 DC planes x
    1-4 AC planes) — the refinement loop, not a lucky single level."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(47)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_gray(img))[3]
    for dc_al in (1, 2, 3):
        for ac_al in (1, 2, 3, 4):
            sa = decode_jpeg(
                encode_jpeg_progressive_sa(img, dc_al=dc_al, ac_al=ac_al)
            )[3]
            assert (base == sa).all(), (dc_al, ac_al)


def test_jpeg_progressive_sa_eobrun_overflow():
    """An AC refinement scan over a quiet band longer than 32767 blocks
    must force-flush the EOB run at the EOBn ceiling (r <= 14): without
    the flush, r = bit_length-1 = 15 selects the ZRL symbol (0xF0) and
    corrupts the stream. 2048x1032 = 33024 blocks, flat except one block
    so the run spans virtually the whole image."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        encode_jpeg_gray,
    )

    img = np.full((2048, 1032), 200, dtype=np.uint8)
    img[0, 0] = 10  # one busy block; 33023 quiet blocks follow
    base = decode_jpeg(encode_jpeg_gray(img))[3]
    sa = decode_jpeg(encode_jpeg_progressive_sa(img))[3]
    assert (base == sa).all()


def test_jpeg_progressive_sa_generator_exact():
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        make_jpeg,
    )

    for d in (0, 11, 255):
        assert (
            decode_jpeg(make_jpeg_prog_sa(d))[3]
            == decode_jpeg(make_jpeg(d))[3]
        ).all()


def test_jpeg_progressive_sa_scan_script():
    """The generator's stream really is successive approximation: first
    scans carry Al>0 point transforms and refinement scans (Ah>0)
    follow, ending at Al=0 for every band (the exactness precondition)."""
    import struct

    payload = make_jpeg_prog_sa(7)
    scans = []
    i = 2
    while i + 2 <= len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        m = payload[i + 1]
        if m == 0xDA:
            (ln,) = struct.unpack_from(">H", payload, i + 2)
            data = payload[i + 4 : i + 2 + ln]
            scans.append((data[3], data[4], data[5] >> 4, data[5] & 15))
            i += 2 + ln
        elif m == 0xD9:
            break
        elif m in (0x01,) or 0xD0 <= m <= 0xD7:
            i += 2
        else:
            (ln,) = struct.unpack_from(">H", payload, i + 2)
            i += 2 + ln
    firsts = [s for s in scans if s[2] == 0]
    refines = [s for s in scans if s[2] > 0]
    assert any(s[3] > 0 for s in firsts), scans  # point-transformed firsts
    assert refines, scans  # refinement scans present
    for ss, se, ah, al in refines:
        assert ah == al + 1, scans  # single-plane refinement steps
    # every band's last scan lands at Al=0
    last_al = {}
    for ss, se, ah, al in scans:
        last_al[(ss, se)] = al
    assert all(v == 0 for v in last_al.values()), last_al


# ------------------------------------- progressive color (round 8)

from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (  # noqa: E402
    encode_jpeg_progressive_color,
    make_jpeg_prog_color,
)


def test_jpeg_progressive_color_matches_baseline_444():
    """4:4:4 progressive color streams (interleaved DC scans +
    per-component AC scans with SA refinement) decode to the identical
    RGB as the baseline sequential 4:4:4 encoding of the same planes."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        encode_jpeg_ycbcr420,
    )

    rng = np.random.default_rng(53)
    for shape in ((8, 8), (16, 24), (24, 16)):
        y = rng.integers(0, 256, shape, dtype=np.uint8)
        cb = rng.integers(0, 256, shape, dtype=np.uint8)
        cr = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg_ycbcr420(y, cb, cr, subsample=False))[3]
        prog = decode_jpeg(encode_jpeg_progressive_color(y, cb, cr))[3]
        assert (base == prog).all(), shape


def test_jpeg_progressive_color_generator_closed_form():
    """The generator's decoded RGB equals the closed-form fixed-point
    conversion of the Y/chroma formulas — the exactness claim the
    x4_jpeg_prog_color_decode oracle relies on."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        jpeg420_chroma,
        jpeg_ac_basis,
        jpeg_block_amp,
        jpeg_block_value,
        jpeg_blocks,
    )

    basis = np.array(jpeg_ac_basis())
    for d in (0, 7, 23, 255):
        w, h, c, img = decode_jpeg(make_jpeg_prog_color(d))
        bwn, bhn = jpeg_blocks(d)
        assert (w, h, c) == (bwn * 8, bhn * 8, 3)
        for b in range(bwn * bhn):
            by, bx = divmod(b, bwn)
            yv = np.round(
                jpeg_block_value(d, b) + jpeg_block_amp(d, b) * basis
            ).astype(np.int64)
            kb = jpeg420_chroma(d, b, 0) - 128
            kr = jpeg420_chroma(d, b, 1) - 128
            r = np.clip(yv + ((91881 * kr + 32768) >> 16), 0, 255)
            g = np.clip(yv + ((-22554 * kb - 46802 * kr + 32768) >> 16), 0, 255)
            bl = np.clip(yv + ((116130 * kb + 32768) >> 16), 0, 255)
            exp = np.stack(
                [np.tile(r, (8, 1)), np.tile(g, (8, 1)), np.tile(bl, (8, 1))],
                axis=-1,
            )
            got = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.int64)
            assert np.array_equal(got, exp), (d, b)


def test_jpeg_progressive_color_scan_constraints():
    """T.81 progressive constraints hold in the emitted scan script:
    DC scans are the only multi-component (interleaved) ones, every AC
    scan names exactly one component, and all three components' AC
    bands reach Al=0."""
    import struct

    payload = make_jpeg_prog_color(5)
    i = 2
    ac_comps = set()
    while i + 2 <= len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        m = payload[i + 1]
        if m == 0xDA:
            (ln,) = struct.unpack_from(">H", payload, i + 2)
            data = payload[i + 4 : i + 2 + ln]
            ns = data[0]
            ss = data[1 + 2 * ns]
            if ss == 0:
                assert ns == 3  # interleaved DC over all components
            else:
                assert ns == 1  # AC scans single-component
                ac_comps.add(data[1])
            i += 2 + ln
        elif m == 0xD9:
            break
        elif m in (0x01,) or 0xD0 <= m <= 0xD7:
            i += 2
        else:
            (ln,) = struct.unpack_from(">H", payload, i + 2)
            i += 2 + ln
    assert ac_comps == {1, 2, 3}


# ------------------------------------------------------------- G.711

from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (  # noqa: E402
    alaw_expand,
    decode_wav_g711,
    g711_byte,
    g711_n_samples,
    make_wav_g711,
    mulaw_expand,
)


def test_g711_canonical_itu_values():
    # mu-law: 0xFF -> +0, 0x7F -> -0, 0x80 -> +32124 (max), 0x00 -> -32124
    assert mulaw_expand(0xFF) == 0
    assert mulaw_expand(0x7F) == 0
    assert mulaw_expand(0x80) == 32124
    assert mulaw_expand(0x00) == -32124
    # A-law: 0xD5 (0x80^0x55) -> +8 (min positive), 0x55 -> -8,
    # 0xAA (0xFF^0x55) -> +32256 (max), 0x2A -> -32256
    assert alaw_expand(0xD5) == 8
    assert alaw_expand(0x55) == -8
    assert alaw_expand(0xAA) == 32256
    assert alaw_expand(0x2A) == -32256


def test_g711_roundtrip_and_riff_walk():
    for d in (0, 1, 7, 88, 499):
        rate, codec, smp = decode_wav_g711(make_wav_g711(d))
        n = g711_n_samples(d)
        expand = mulaw_expand if d % 2 == 0 else alaw_expand
        assert rate == 8000
        assert codec == ("mulaw" if d % 2 == 0 else "alaw")
        assert (smp == [expand(g711_byte(d, i)) for i in range(n)]).all()


def test_g711_rejects_pcm_and_non_riff():
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import make_wav

    with pytest.raises(ValueError):
        decode_wav_g711(make_wav(3))  # PCM tag 1
    with pytest.raises(ValueError):
        decode_wav_g711(b"OggS....not-riff")


def test_gif_lzw_property_roundtrip():
    """Property: any index stream over any root size roundtrips. Random
    streams cross width boundaries and hit KwKwK unpredictably — broader
    than the targeted cases above."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        mcs=st.integers(min_value=2, max_value=8),
        seed=st.integers(min_value=0, max_value=2**31),
        n=st.integers(min_value=1, max_value=1200),
    )
    def check(mcs, seed, n):
        rng = np.random.default_rng(seed)
        indices = rng.integers(0, 1 << mcs, n).tolist()
        assert _lzw_decode_gif(_lzw_encode_gif(indices, mcs), mcs) == indices

    check()


# ------------------------------------------------------------ AVI/MJPEG

def test_avi_mjpeg_roundtrip_exact():
    """Container walk + per-frame JPEG decode reproduce the generator's
    texture formulas bit-exactly for every sampled seed."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        avi_n_frames,
        decode_avi_mjpeg,
        decode_jpeg,
        jpeg_ac_basis,
        jpeg_block_amp,
        jpeg_block_value,
        jpeg_blocks,
        make_avi_mjpeg,
    )

    basis = np.array(jpeg_ac_basis())
    for d in (0, 1, 5, 11, 499):
        w, h, us, frames = decode_avi_mjpeg(make_avi_mjpeg(d))
        bwn, bhn = jpeg_blocks(d)
        assert (w, h, us) == (bwn * 8, bhn * 8, 100_000)
        assert len(frames) == avi_n_frames(d)
        for f, fr in enumerate(frames):
            fw, fh, c, img = decode_jpeg(fr)
            assert (fw, fh, c) == (w, h, 1)
            exp = np.zeros((h, w))
            for b in range(bwn * bhn):
                by, bx = divmod(b, bwn)
                exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.round(
                    jpeg_block_value(d, b + 1000 * f)
                    + jpeg_block_amp(d, b + 1000 * f) * basis
                )
            assert (img.reshape(h, w) == exp).all()


def test_avi_word_alignment_is_exercised():
    """At least one generated clip must carry an odd-length JPEG frame,
    otherwise the pad-byte path silently loses coverage."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        decode_avi_mjpeg,
        make_avi_mjpeg,
    )

    odd = 0
    for d in range(12):
        _, _, _, frames = decode_avi_mjpeg(make_avi_mjpeg(d))
        odd += sum(len(fr) % 2 for fr in frames)
    assert odd > 0


def test_avi_rejects_corruption():
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        decode_avi_mjpeg,
        make_avi_mjpeg,
    )

    good = bytearray(make_avi_mjpeg(7))
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")  # wrong form type
    with pytest.raises(ValueError):
        decode_avi_mjpeg(bytes(good[:40]))  # truncated
    # flip the declared total-frame count inside avih (dwTotalFrames is
    # the 5th DWORD of the avih payload): count cross-check must fire
    import struct as _s

    avih_at = bytes(good).index(b"avih") + 8
    bad = bytearray(good)
    bad[avih_at + 16 : avih_at + 20] = _s.pack("<I", 99)
    with pytest.raises(ValueError):
        decode_avi_mjpeg(bytes(bad))
    # corrupt an idx1 entry size: index validation must fire
    idx_at = bytes(good).index(b"idx1") + 8
    bad2 = bytearray(good)
    bad2[idx_at + 12 : idx_at + 16] = _s.pack("<I", 1)
    with pytest.raises(ValueError):
        decode_avi_mjpeg(bytes(bad2))


def test_avi_idx1_offsets_match_spec_convention():
    """idx1 offsets are movi-relative (first chunk header at +4) — pin
    the convention so a reader following the public spec agrees."""
    import struct as _s

    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import make_avi_mjpeg

    payload = make_avi_mjpeg(3)
    idx_at = payload.index(b"idx1") + 8
    ckid, flags, off, sz = _s.unpack("<4sIII", payload[idx_at : idx_at + 16])
    assert ckid == b"00dc" and flags == 0x10 and off == 4
    movi_at = payload.index(b"movi")
    assert payload[movi_at + off : movi_at + off + 4] == b"00dc"
    assert _s.unpack("<I", payload[movi_at + off + 4 : movi_at + off + 8])[0] == sz


# --------------------------------------------------------------- dHash

def test_dhash_jitter_twin_is_near_dup_and_distinct_images_are_not():
    """The +1-jitter twin stays within Hamming 8 of its original, while
    structurally distinct (random) images behave like random 63-bit
    codes: mean distance near 31.5, never <= 8 in this sample. (The
    formula-BMP corpus itself can't supply the negative case: same-dims
    formula images differ only by a constant brightness offset, which
    dHash is INVARIANT to by design — see
    test_dhash_brightness_invariance.)"""
    import numpy as np

    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        decode_bmp,
        dhash63,
        make_bmp,
        make_bmp_jitter,
    )

    for d in range(60):
        _, _, _, orig = decode_bmp(make_bmp(d))
        _, _, _, jit = decode_bmp(make_bmp_jitter(d))
        ho, hj = dhash63(orig), dhash63(jit)
        assert 0 <= ho < 2**63 and 0 <= hj < 2**63
        assert bin(ho ^ hj).count("1") <= 8
    rng = np.random.default_rng(11)
    rand_hashes = [
        dhash63(rng.integers(0, 256, (24, 32, 3)).astype(np.uint8))
        for _ in range(30)
    ]
    cross = [
        bin(a ^ b).count("1")
        for i, a in enumerate(rand_hashes)
        for b in rand_hashes[i + 1 :]
    ]
    assert min(cross) > 8
    assert 25 < sum(cross) / len(cross) < 38


def test_dhash_brightness_invariance():
    """A uniform brightness shift (no wraparound) preserves every
    comparison bit — the property that makes dHash a PERCEPTUAL hash."""
    import numpy as np

    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import dhash63

    rng = np.random.default_rng(7)
    img = rng.integers(10, 200, (17, 23, 3)).astype(np.uint8)
    assert dhash63(img) == dhash63(img + 20)


# ------------------------------- MS-RLE8 inter-coded video (round 8)

from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (  # noqa: E402
    avi_n_frames,
    decode_avi_mrle,
    make_avi_mrle,
    mrle_dims,
    mrle_index,
    mrle_palette,
)


def test_mrle_closed_form_exact():
    """Every decoded frame equals the last-writer closed form the
    x4_video_inter_frames oracle recomputes: bottom-up row r of frame k
    carries mrle_index(d, j, r) for j = max(k - ((k - r) mod h), 0)."""
    for d in (0, 3, 9, 17, 255):
        w, h, us, pal, frames = decode_avi_mrle(make_avi_mrle(d))
        assert (w, h) == mrle_dims(d)
        assert us == 100_000
        assert len(frames) == avi_n_frames(d)
        for k, img in enumerate(frames):
            for r in range(h):
                jw = max(k - ((k - r) % h), 0)
                assert (img[h - 1 - r] == mrle_index(d, jw, r)).all(), (d, k, r)
        assert (pal == mrle_palette(d)).all()


def test_mrle_frames_are_temporally_predicted():
    """The inter property itself: decoding frame k from a ZERO canvas
    (instead of frame k-1's pixels) produces different pixels — the
    skipped rows genuinely inherit previous-frame state, so these
    streams cannot be decoded intra-only."""
    import numpy as np

    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        _rle8_apply,
        _rle8_inter_frame,
    )

    d = 9
    w, h = mrle_dims(d)
    _, _, _, _, frames = decode_avi_mrle(make_avi_mrle(d))
    # frame 1 decoded against a fresh zero canvas loses every inherited row
    fresh = np.zeros((h, w), np.uint8)
    _rle8_apply(_rle8_inter_frame(d, 1, w, h), fresh)
    assert not (fresh[::-1] == frames[1]).all()
    # and consecutive decoded frames differ in at most the repainted row
    for k in range(1, len(frames)):
        assert (frames[k] != frames[k - 1]).any(axis=1).sum() <= 1


def test_mrle_stream_validation():
    """Malformed RLE8 streams fail fast: runs past the row end, deltas
    off the canvas, truncation without end-of-bitmap."""
    import numpy as np

    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        _rle8_apply,
    )

    canvas = np.zeros((4, 6), np.uint8)
    with pytest.raises(ValueError):
        _rle8_apply(bytes([7, 5, 0, 1]), canvas.copy())  # run > width
    with pytest.raises(ValueError):
        _rle8_apply(bytes([0, 2, 9, 9, 0, 1]), canvas.copy())  # delta off canvas
    with pytest.raises(ValueError):
        _rle8_apply(bytes([3, 5]), canvas.copy())  # no end-of-bitmap
    # idx1 tamper: flipping a size breaks the container check
    payload = bytearray(make_avi_mrle(3))
    i = payload.rindex(b"idx1")
    payload[i + 8 + 12] ^= 0xFF  # first entry's size field
    with pytest.raises(ValueError):
        decode_avi_mrle(bytes(payload))


# ------------------------------------ motion-compensated video (round 9)

from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (  # noqa: E402
    MC_MB,
    decode_avi_mc,
    encode_avi_mc,
    make_avi_mc,
    mc_dims,
    mc_keyframe_image,
)


def _mc_reference_decode(keyframe, pframes):
    """Plain-Python reference reconstruction of the MC1 semantics,
    independent of the production decoder's parsing/validation: frames
    from an explicit spec, prediction from the previous reconstruction,
    decoded-JPEG residual add. Used to fuzz decode_avi_mc."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    h, w = keyframe.shape
    _, _, _, dec = decode_jpeg(encode_jpeg_gray(keyframe))
    frames = [dec[:, :, 0].copy()]
    for mbs, residual in pframes:
        ref = frames[-1]
        out = np.empty_like(ref)
        k = 0
        for py in range(0, h, MC_MB):
            for px in range(0, w, MC_MB):
                mb = mbs[k]
                k += 1
                if mb[0] == "skip":
                    out[py : py + MC_MB, px : px + MC_MB] = ref[
                        py : py + MC_MB, px : px + MC_MB
                    ]
                elif mb[0] == "mv":
                    sy, sx = py + mb[2], px + mb[1]
                    out[py : py + MC_MB, px : px + MC_MB] = ref[
                        sy : sy + MC_MB, sx : sx + MC_MB
                    ]
                else:
                    out[py : py + MC_MB, px : px + MC_MB] = mb[1]
        if residual is not None:
            _, _, _, r = decode_jpeg(encode_jpeg_gray(residual))
            out = np.clip(
                out.astype(np.int16) + r[:, :, 0].astype(np.int16) - 128,
                0,
                255,
            ).astype(np.uint8)
        frames.append(out)
    return frames


def test_mc_video_generator_closed_form():
    """make_avi_mc's MV-only clips decode to the keyframe texture
    permuted by ((f+1)//2, f//2) cyclic macroblock shifts — the exact
    closed form the x4_video_mc_decode oracle recomputes."""
    for d in range(12):
        w, h = mc_dims(d)
        dw, dh, us, frames = decode_avi_mc(make_avi_mc(d))
        assert (dw, dh, us) == (w, h, 100000)
        key = mc_keyframe_image(d)
        wmb, hmb = w // MC_MB, h // MC_MB
        for f in range(len(frames)):
            ncol, nrow = (f + 1) // 2, f // 2
            exp = np.empty_like(key)
            for my in range(hmb):
                for mx in range(wmb):
                    smx, smy = (mx + ncol) % wmb, (my + nrow) % hmb
                    exp[
                        my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16
                    ] = key[
                        smy * 16 : smy * 16 + 16, smx * 16 : smx * 16 + 16
                    ]
            assert (frames[f] == exp).all(), (d, f)


def test_mc_video_fuzz_vs_reference():
    """Random clips through every macroblock mode (skip, arbitrary
    non-MB-aligned in-bounds motion vectors, intra refresh) and the
    DCT residual path must decode identically to the plain-Python
    reference reconstruction."""
    rng = np.random.default_rng(93)
    for trial in range(6):
        wmb = int(rng.integers(1, 4))
        hmb = int(rng.integers(1, 4))
        w, h = 16 * wmb, 16 * hmb
        key = rng.integers(0, 256, (h, w), dtype=np.uint8)
        pframes = []
        for j in range(int(rng.integers(1, 5))):
            mbs = []
            for my in range(hmb):
                for mx in range(wmb):
                    mode = int(rng.integers(0, 3))
                    if mode == 0:
                        mbs.append(("skip",))
                    elif mode == 1:
                        dx = int(rng.integers(-16 * mx, w - 16 * (mx + 1) + 1))
                        dy = int(rng.integers(-16 * my, h - 16 * (my + 1) + 1))
                        mbs.append(("mv", dx, dy))
                    else:
                        mbs.append(
                            (
                                "intra",
                                rng.integers(
                                    0, 256, (MC_MB, MC_MB), dtype=np.uint8
                                ),
                            )
                        )
            residual = (
                rng.integers(0, 256, (h, w), dtype=np.uint8)
                if j % 2 == 1
                else None
            )
            pframes.append((mbs, residual))
        payload = encode_avi_mc(
            [("I", key)] + [("P", mbs, res) for mbs, res in pframes]
        )
        dw, dh, _, got = decode_avi_mc(payload)
        expected = _mc_reference_decode(key, pframes)
        assert (dw, dh) == (w, h)
        assert len(got) == len(expected)
        for f, (g, e) in enumerate(zip(got, expected)):
            assert (g == e).all(), (trial, f)


def test_mc_video_stream_validation():
    """Decoder hard-fails on out-of-bounds motion vectors, tampered
    idx1 keyframe flags, truncated macroblock walks, and P-first
    streams — the container/bitstream discipline of the AVI family."""
    key = np.full((16, 32), 80, np.uint8)
    ok = [("P", [("mv", 16, 0), ("skip",)], None)]
    # out-of-bounds MV: source window would cross the right edge
    bad = encode_avi_mc([("I", key), ("P", [("mv", 17, 0), ("skip",)], None)])
    with pytest.raises(ValueError, match="outside the reference"):
        decode_avi_mc(bad)
    # truncated macroblock walk (one record for two macroblocks)
    bad = encode_avi_mc([("I", key), ("P", [("skip",)], None)])
    with pytest.raises(ValueError, match="ran past|trailing"):
        decode_avi_mc(bad)
    # P-frame first: nothing to predict from
    with pytest.raises(ValueError, match="starts with a P-frame"):
        decode_avi_mc(encode_avi_mc([("P", ok[0][1], None)], dims=(32, 16)))
    # idx1 keyframe-flag tamper on the I-frame
    payload = bytearray(encode_avi_mc([("I", key)] + ok))
    i = payload.rindex(b"idx1")
    payload[i + 8 + 4] = 0  # clear the first entry's AVIIF_KEYFRAME flag
    with pytest.raises(ValueError, match="keyframe flag"):
        decode_avi_mc(bytes(payload))


def test_jpeg422_exact_flat_mcu_payload():
    """Generated 4:2:2 payloads (16x8 MCU, horizontal-only chroma
    subsampling) decode to the exact closed form the oracle computes."""
    from etl_lorettoscarpa_1asfb2jf21_spark.multimodal.codecs import (
        jpeg_ac_basis,
        jpeg_block_amp,
        jpeg_block_value,
        make_jpeg422,
    )

    basis = np.array(jpeg_ac_basis())
    for d in (0, 7, 123, 499):
        w, h, c, img = decode_jpeg(make_jpeg422(d))
        mw, mh = jpeg420_mcus(d)
        assert (w, h, c) == (16 * mw, 8 * mh, 3)
        bwn = 2 * mw
        for b in range(bwn * mh):
            by, bx = divmod(b, bwn)
            yv = np.round(
                jpeg_block_value(d, b) + jpeg_block_amp(d, b) * basis
            ).astype(np.int64)
            m = by * mw + (bx // 2)
            kb = jpeg420_chroma(d, m, 0) - 128
            kr = jpeg420_chroma(d, m, 1) - 128
            r = np.clip(yv + ((91881 * kr + 32768) >> 16), 0, 255)
            g = np.clip(yv + ((-22554 * kb - 46802 * kr + 32768) >> 16), 0, 255)
            bch = np.clip(yv + ((116130 * kb + 32768) >> 16), 0, 255)
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (blk[:, :, 0] == r[None, :]).all()
            assert (blk[:, :, 1] == g[None, :]).all()
            assert (blk[:, :, 2] == bch[None, :]).all()


def test_jpeg422_partial_mcu_pad_and_crop():
    """Off-grid dims under 2x1 sampling: encoder pads to the 16x8 grid,
    decoder crops back; near-lossless quant keeps the error bounded."""
    fine = np.array([1] * 64, dtype=np.int32)
    rng = np.random.default_rng(13)
    for hh, ww in ((17, 30), (24, 18), (9, 40)):
        y = rng.integers(30, 220, (hh, ww)).astype(np.uint8)
        cbv = np.full((hh, ww), 120, dtype=np.uint8)
        crv = np.full((hh, ww), 140, dtype=np.uint8)
        w, h, c, img = decode_jpeg(
            encode_jpeg_ycbcr420(y, cbv, crv, fine, sampling=(2, 1))
        )
        assert (w, h, c) == (ww, hh, 3)
        kb, kr = 120 - 128, 140 - 128
        exp_r = np.clip(
            y.astype(np.int64) + ((91881 * kr + 32768) >> 16), 0, 255
        )
        assert np.abs(img[:, :, 0].astype(np.int64) - exp_r).max() <= 2
