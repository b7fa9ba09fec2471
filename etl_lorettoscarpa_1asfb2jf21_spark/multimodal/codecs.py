"""Real (dependency-free) media codecs for the X4 multimodal path.

Two uncompressed formats are genuinely decodable without any media
library, so the engine ships REAL parsers for them:

* BMP (24-bit uncompressed, BITMAPINFOHEADER): hand-parsed with ``struct``
  — little-endian headers, BGR byte order, 4-byte row padding, bottom-up
  row storage all handled (and unit-tested with asymmetric images).
* WAV (PCM16): stdlib ``wave`` + numpy ``frombuffer``.

Compressed formats (PNG/JPEG/MP3/…) still raise NotImplementedError in
decode.py — those need Pillow/libav, which this container does not ship.

The deterministic generators (``make_bmp``/``make_wav``) synthesize valid
files whose pixel/sample values follow pure integer formulas, which makes
the DECODERS oracle-checkable end-to-end: a DuckDB twin recomputes the
expected decoded statistics in closed form from the same formulas
(queries x4_bmp_decode / x4_wav_decode) — if the encoder or parser
mishandled padding, byte order, or channel swizzle, the sums would not
match.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ------------------------------------------------------------------ BMP

_BMP_PIXEL_MOD = 256


def bmp_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic per-doc image size, including widths that are NOT
    multiples of 4 so row padding is always exercised."""
    return 3 + doc_id % 6, 2 + doc_id % 5  # width in [3,8], height in [2,6]


def bmp_pixel_value(doc_id: int, x: int, y: int, c: int, width: int) -> int:
    """Channel value formula (c: 0=R 1=G 2=B) — mirrored in the SQL oracle."""
    return (doc_id * 7 + (y * width + x) * 3 + c) % _BMP_PIXEL_MOD


def make_bmp(doc_id: int) -> bytes:
    """A valid 24-bit uncompressed BMP with formula-driven pixels."""
    width, height = bmp_dims(doc_id)
    row_len = width * 3
    pad = (4 - row_len % 4) % 4
    rows = []
    # BMP stores rows bottom-up and pixels as BGR
    for y in range(height - 1, -1, -1):
        row = bytearray()
        for x in range(width):
            for c in (2, 1, 0):  # B, G, R
                row.append(bmp_pixel_value(doc_id, x, y, c, width))
        row.extend(b"\x00" * pad)
        rows.append(bytes(row))
    pixel_data = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54)
    return file_header + info + pixel_data


def decode_bmp(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a 24-bit uncompressed BMP → (width, height, channels,
    HxWx3 uint8 array in top-down RGB order). Raises ValueError on
    anything that is not this exact (most common) BMP flavor."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    header_size, width, height = struct.unpack_from("<Iii", payload, 14)
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    row_len = width * 3
    stride = row_len + (4 - row_len % 4) % 4
    img = np.zeros((height, width, 3), dtype=np.uint8)
    for i in range(height):
        start = offset + i * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=row_len, offset=start)
        y = (height - 1 - i) if bottom_up else i
        img[y] = row.reshape(width, 3)[:, ::-1]  # BGR → RGB
    return width, height, 3, img


# ------------------------------------------------------------------ WAV

WAV_RATE = 8000


def wav_n_samples(doc_id: int) -> int:
    return doc_id % 50 + 20


def wav_sample_value(doc_id: int, i: int) -> int:
    """PCM16 sample formula — mirrored in the SQL oracle."""
    return (doc_id * 31 + i * 17) % 65536 - 32768


def make_wav(doc_id: int) -> bytes:
    """A valid PCM16 mono WAV with formula-driven samples."""
    n = wav_n_samples(doc_id)
    samples = np.array(
        [wav_sample_value(doc_id, i) for i in range(n)], dtype=np.int16
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_RATE)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a PCM WAV → (sample_rate, n_channels, int16 sample array)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 supported")
        frames = w.readframes(w.getnframes())
        samples = np.frombuffer(frames, dtype="<i2")
        return w.getframerate(), w.getnchannels(), samples


# ------------------------------------------------------------------ PNG
#
# PNG is zlib(DEFLATE)-compressed, and zlib is stdlib — so unlike
# JPEG/MP3 (which need entropy/DCT libraries) a REAL dependency-free
# PNG codec is possible: chunk framing + CRC32, IDAT inflate, and full
# scanline unfiltering (all five filter types) are implemented here.
# The deterministic generator rotates through filters 0/1/2 per row so
# the decoder's unfilter path is exercised end-to-end by the oracle
# query (x4_png_decode), not just the happy filter-0 path.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_dims(doc_id: int) -> tuple[int, int]:
    return 2 + doc_id % 7, 2 + doc_id % 4  # width in [2,8], height in [2,5]


def png_pixel_value(doc_id: int, p: int, c: int) -> int:
    """Channel value at flattened pixel index p (c: 0=R 1=G 2=B) —
    mirrored in the SQL oracle."""
    return (doc_id * 11 + p * 3 + c) % 256


def _chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def make_png(doc_id: int) -> bytes:
    """A valid 8-bit RGB PNG with formula-driven pixels; per-row filter
    type rotates None/Sub/Up so decoding must actually unfilter."""
    import zlib

    width, height = png_dims(doc_id)
    bpp = 3
    raw = bytearray()
    prev = bytes(width * bpp)
    for y in range(height):
        cur = bytes(
            png_pixel_value(doc_id, y * width + x, c)
            for x in range(width)
            for c in range(3)
        )
        ftype = (doc_id + y) % 3
        raw.append(ftype)
        if ftype == 0:  # None
            raw.extend(cur)
        elif ftype == 1:  # Sub
            raw.extend(
                (cur[i] - (cur[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(len(cur))
            )
        else:  # Up
            raw.extend((cur[i] - prev[i]) & 0xFF for i in range(len(cur)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse an 8-bit RGB/RGBA PNG → (width, height, channels, HxWxC
    uint8 array). Real decode: chunk walk with CRC verification, IDAT
    inflate, and full filter reconstruction (None/Sub/Up/Average/Paeth).
    Raises ValueError on non-8-bit/palette/interlaced flavors."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    idat = bytearray()
    width = height = channels = None
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + clen)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in (2, 6) or interlace != 0:
                raise ValueError(
                    f"only 8-bit non-interlaced RGB(A) supported "
                    f"(depth={depth}, color={color})"
                )
            channels = 3 if color == 2 else 4
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = channels
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    img = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        cur = np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up (vectorizable)
            cur = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth carry a left-neighbor dependency
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    rec = line[i] + a
                elif ftype == 3:
                    rec = line[i] + (a + b) // 2
                elif ftype == 4:
                    rec = line[i] + _paeth(int(a), int(b), int(c))
                else:
                    raise ValueError(f"bad filter type {ftype}")
                cur[i] = rec & 0xFF
        img[y] = cur.astype(np.uint8)
        prev = cur
    return width, height, channels, img.reshape(height, width, channels)
