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
