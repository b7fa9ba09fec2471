"""Multimodal column plumbing (X4): binary payloads + typed metadata,
decode/feature-extract as Arrow-batched Pandas functions over mapInPandas.

The container ships no image/audio libraries, so the codecs are
implemented dependency-free in multimodal/codecs.py: BMP, PNG (zlib
inflate + filter reconstruction), GIF (palette + variable-width LZW),
baseline/progressive JPEG (canonical-Huffman entropy decode + dequant +
IDCT), PCM/G.711 WAV, and the AVI video family — MJPEG (all-intra),
MRLE (inter-coded RLE8) and 'MC1 ' (motion-compensated: macroblock
motion vectors + DCT residual, closing the last media descope in round
9) — all decode for REAL; only formats outside those
profiles raise NotImplementedError. The plumbing —
schema, partition sizing, UDF signatures, Arrow batch shapes — is tested
in tests/test_multimodal.py; swapping in Pillow/libav for the exotic
formats later touches one function body, not the plan.

Scale notes: payloads ride the shuffle as binary; mapInPandas streams Arrow
record batches so executor memory is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch × mean payload size — set that
down (e.g. 64) for multi-MB media, and repartition by a size-balanced key
before heavy decode so one task doesn't get all the large files.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_md5", StringType(), False),
    ]
)

DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def attach_payload_meta(
    df: DataFrame, payload_col: str, media_type: str
) -> DataFrame:
    """Native-expression metadata struct next to an opaque binary column."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(p).cast("long").alias("n_bytes"),
            F.md5(p).alias("payload_md5"),
        ),
    )


def _fake_decode(payload: bytes, n_features: int = 8) -> dict:
    """Deterministic stand-in for a real image decoder: derives stable
    pseudo-dimensions and features from the payload digest. Lets tests pin
    exact outputs without any media library."""
    h = hashlib.sha256(payload).digest()
    width = 1 + h[0] % 64
    height = 1 + h[1] % 64
    feats = [b / 255.0 for b in h[2 : 2 + n_features]]
    return {
        "width": width,
        "height": height,
        "n_channels": 3,
        "features": feats,
    }


def pillow_decoder():
    """THE documented swap seam, made concrete: returns a
    ``payload -> (width, height, n_channels, HxWxC uint8)`` callable
    backed by Pillow, suitable for ``decode_image_batch(df,
    decoder=pillow_decoder())``. Raises ImportError where Pillow is not
    installed (this container ships no media libraries — the adapter
    exists so a deployment with Pillow swaps ONE argument, not the
    plan); the seam itself is integration-tested with an injected
    stand-in decoder in tests/test_multimodal.py."""
    import io

    import numpy as np
    from PIL import Image  # ImportError here when Pillow is absent

    def _decode(payload: bytes):
        im = Image.open(io.BytesIO(bytes(payload))).convert("RGB")
        arr = np.asarray(im)
        return im.width, im.height, 3, arr

    return _decode


def decode_image_batch(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    use_fake_decoder: bool = False,
    decoder=None,
) -> DataFrame:
    """mapInPandas image decode → (doc_id, width, height, n_channels,
    features). Arrow-batched; the per-batch loop is the only Python hot
    path, everything else stays JVM-side.

    ``decoder`` is the external-library swap seam: any callable
    ``payload -> (width, height, n_channels, HxWxC uint8 ndarray)``
    (e.g. ``pillow_decoder()``) replaces the built-in dependency-free
    codecs while the schema, Arrow batching, and feature post-processing
    stay identical — the callable is pickled into the Python workers, so
    no module monkeypatching is involved. The fake decoder is
    deterministic for plumbing tests.
    """

    def decode_one(payload: bytes) -> dict:
        if decoder is not None:
            w, h, c, img = decoder(bytes(payload))
            feats = (img.reshape(-1, c).mean(axis=0)[:3] / 255.0).astype(float)
            return {
                "width": int(w),
                "height": int(h),
                "n_channels": int(c),
                "features": list(feats),
            }
        if use_fake_decoder:
            return _fake_decode(payload)
        # REAL path: BMP, PNG, GIF and JPEG are all parsed for real
        # (multimodal/codecs.py — struct headers/BGR/padding for BMP;
        # chunk CRC walk + inflate + five-filter reconstruction for PNG;
        # palette + variable-width LZW incl. interlace for GIF;
        # canonical-Huffman entropy decode + dequant + 2-D IDCT for
        # JPEG, covering grayscale, YCbCr 4:4:4, 4:2:0 and 4:2:2,
        # DRI/RSTn restarts, and FULL progressive — spectral selection
        # and successive approximation, gray and 4:4:4 color). Formats
        # outside those profiles (arithmetic coding, 12-bit precision,
        # WebP, ...) still raise — ranked out in COVERAGE.md as
        # patent-legacy rare.
        if bytes(payload[:2]) == b"BM":
            from .codecs import decode_bmp

            w, h, c, img = decode_bmp(bytes(payload))
        elif bytes(payload[:4]) == b"\x89PNG":
            from .codecs import decode_png

            w, h, c, img = decode_png(bytes(payload))
        elif bytes(payload[:2]) == b"\xff\xd8":
            from .codecs import decode_jpeg

            w, h, c, img = decode_jpeg(bytes(payload))
        elif bytes(payload[:4]) == b"GIF8":
            from .codecs import decode_gif

            w, h, c, img = decode_gif(bytes(payload))
        else:
            raise NotImplementedError(
                "unrecognized media container (supported native codecs: "
                "BMP, PNG, GIF incl. interlace, JPEG — baseline "
                "gray/4:4:4/4:2:0/4:2:2, restarts, full progressive incl. "
                "successive approximation — PCM + G.711 WAV) — "
                "pass use_fake_decoder=True for plumbing tests"
            )
        feats = (img.reshape(-1, c).mean(axis=0)[:3] / 255.0).astype(float)
        return {
            "width": w,
            "height": h,
            "n_channels": c,
            "features": list(feats),
        }

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"doc_id": i, **decode_one(p)}
                for i, p in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(decode, DECODED_IMAGE_SCHEMA)


def extract_image_features(decoded: DataFrame, dim: int = 8) -> DataFrame:
    """Feature post-processing on decoded output — native array ops
    (normalization stays JVM-side even though decode was Python)."""
    from ..functions.vectors import normalize_expr

    return decoded.withColumn("features", normalize_expr("features"))


DECODED_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("us_per_frame", LongType(), False),
        StructField("sum_px", LongType(), False),
        StructField("min_px", LongType(), False),
        StructField("max_px", LongType(), False),
    ]
)


def decode_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 2,
) -> DataFrame:
    """REAL video frame sampling: walk the AVI/MJPG RIFF container
    (codecs.decode_avi_mjpeg — nested LISTs, word alignment, idx1
    cross-check), take every ``every_n``-th frame, decode each sampled
    frame with the real baseline-JPEG decoder, and emit one row per
    sampled frame with its pixel statistics. Arrow mapInPandas; the
    per-frame fan-out happens inside the batch, so a 1000-frame clip
    never materializes as 1000 shuffled binary rows — sample-then-decode
    is the order that matters at 100 TB of video."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_avi_mjpeg, decode_jpeg

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, us, frames = decode_avi_mjpeg(bytes(payload))
                for f in range(0, len(frames), every_n):
                    fw, fh, _, img = decode_jpeg(frames[f])
                    if (fw, fh) != (w, h):
                        raise ValueError(
                            f"frame {f} dims {(fw, fh)} != container {(w, h)}"
                        )
                    px = img.reshape(-1).astype("int64")
                    rows.append(
                        {
                            "doc_id": int(i),
                            "frame_idx": f,
                            "n_frames": len(frames),
                            "width": w,
                            "height": h,
                            "us_per_frame": us,
                            "sum_px": int(px.sum()),
                            "min_px": int(px.min()),
                            "max_px": int(px.max()),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(decode, DECODED_FRAME_SCHEMA)


DECODED_INTER_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("us_per_frame", LongType(), False),
        StructField("sum_r", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_b", LongType(), False),
    ]
)


def decode_inter_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 2,
) -> DataFrame:
    """REAL inter-coded video frame sampling (AVI/MRLE, BI_RLE8): walk
    the RIFF container, decode the RLE8 stream with a persistent canvas
    — every frame starts from the previous frame's pixels, so sampling
    frame k still requires decoding frames 0..k (the defining property
    of temporal prediction; an all-intra codec could seek) — take every
    ``every_n``-th DECODED state, map palette indices to RGB, and emit
    one row per sampled frame with its channel sums. Arrow mapInPandas;
    the per-frame fan-out happens inside the batch (sample-then-emit,
    never per-frame shuffled binary rows)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_avi_mrle

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, us, pal, frames = decode_avi_mrle(bytes(payload))
                pal64 = pal.astype("int64")
                for f in range(0, len(frames), every_n):
                    rgb = pal64[frames[f]]  # (h, w, 3)
                    s = rgb.reshape(-1, 3).sum(axis=0)
                    rows.append(
                        {
                            "doc_id": int(i),
                            "frame_idx": f,
                            "n_frames": len(frames),
                            "width": w,
                            "height": h,
                            "us_per_frame": us,
                            "sum_r": int(s[0]),
                            "sum_g": int(s[1]),
                            "sum_b": int(s[2]),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        decode, DECODED_INTER_FRAME_SCHEMA
    )


DECODED_MC_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("us_per_frame", LongType(), False),
        StructField("sum_px", LongType(), False),
        StructField("col_wsum", LongType(), False),
        StructField("row_wsum", LongType(), False),
    ]
)


def decode_mc_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 2,
) -> DataFrame:
    """REAL motion-compensated video frame sampling (AVI/'MC1 ' — round
    9, the last media descope): walk the RIFF container, reconstruct
    every frame through macroblock motion compensation against the
    previous RECONSTRUCTED frame (codecs.decode_avi_mc — sampling frame
    k requires decoding frames 0..k, and the motion vectors make a
    pixel's ancestry SPATIAL, so there is no per-row shortcut like
    MRLE's in-place inheritance), take every ``every_n``-th state and
    emit its pixel sums plus column/row coordinate-weighted sums — the
    weighted sums are what catch a motion vector applied with the wrong
    sign or offset (plain sums are invariant under the generator's
    content permutations). Arrow mapInPandas; sample-then-emit inside
    the batch, never per-frame shuffled binary rows."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_avi_mc

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, us, frames = decode_avi_mc(bytes(payload))
                colw = 1 + np.arange(w, dtype="int64")
                roww = (1 + np.arange(h, dtype="int64"))[:, None]
                for f in range(0, len(frames), every_n):
                    px = frames[f].astype("int64")
                    rows.append(
                        {
                            "doc_id": int(i),
                            "frame_idx": f,
                            "n_frames": len(frames),
                            "width": w,
                            "height": h,
                            "us_per_frame": us,
                            "sum_px": int(px.sum()),
                            "col_wsum": int((px * colw).sum()),
                            "row_wsum": int((px * roww).sum()),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        decode, DECODED_MC_FRAME_SCHEMA
    )


def sample_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 10,
) -> DataFrame:
    """Frame-INDEX sampling plumbing over opaque payloads (kept for the
    schema/partitioning tests); the real container path is
    decode_video_frames above (AVI/MJPG RIFF walk + per-frame JPEG
    decode). The stub emits frame indexes deterministic from payload
    size so downstream partitioning/explode logic is testable against
    payloads of any format."""
    n_frames = (F.octet_length(F.col(payload_col)) % 100 + 1).cast("int")
    return (
        df.select(id_col, n_frames.alias("_n"))
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1, F.lit(every_n))),
        )
        .drop("_n")
    )
