"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery (schemas, partitioning, Arrow batch shape,
UDF signatures) is real and tested.  Image decoding is REAL for the
codec-free formats — uncompressed BMP (BI_RGB) and binary PPM decode
in pure NumPy (:func:`decode_image`), with nearest-neighbor resize and
pixel-stats feature extraction on top.  Compressed image formats and
all audio/video remain STUBBED behind the ``decode_fn`` hook
(``NotImplementedError`` — the sandbox has no codec libraries);
swapping in PIL/ffmpeg changes only the hook, not the plan.

Scale notes: media blobs dominate row size, so the batch iterator keeps
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounded and metadata
columns are projected separately from blobs whenever the blob is not
needed (column pruning keeps the parquet scan blob-free — verified via
``ReadSchema`` in .explain).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),      # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),     # image/video
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),  # audio/video
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP (BI_RGB) → (H, W, 3) uint8 RGB.

    Pure header arithmetic + one ``np.frombuffer`` — no codec library.
    BMP stores rows bottom-up (positive height) in BGR(A) order with
    4-byte row padding."""
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP variant (bpp={bpp}, compression={comp}) needs a codec"
        )
    bottom_up, h = h > 0, abs(h)
    if w <= 0 or h <= 0:
        raise ValueError("degenerate BMP dimensions")
    bypp = bpp // 8
    stride = (w * bypp + 3) // 4 * 4
    if offset + stride * h > len(b):
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(
        b, np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)
    px = rows[:, : w * bypp].reshape(h, w, bypp)
    rgb = px[..., 2::-1]  # BGR(A) → RGB
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def _decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → (H, W, 3) uint8 RGB."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = 4 whitespace-separated tokens (magic, w, h, maxval),
    # with '#' comments legal between them
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(b):
        c = b[pos : pos + 1]
        if c == b"#":
            pos = b.find(b"\n", pos)
            pos = len(b) if pos < 0 else pos + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(b) and not b[end : end + 1].isspace():
                end += 1
            tokens.append(int(b[pos:end]))
            pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM needs a codec")
    if w <= 0 or h <= 0:
        # same loud failure as the BMP path — a 0-dim raster would
        # flow NaN features downstream instead of erroring here
        raise ValueError("degenerate PPM dimensions")
    raster = np.frombuffer(b, np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


def decode_image(payload: bytes) -> np.ndarray:
    """payload → (H, W, 3) uint8 RGB for the codec-free formats (BMP
    BI_RGB, PPM P6); compressed formats (PNG/JPEG/…) raise
    ``NotImplementedError`` — they need a codec library this container
    doesn't ship."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise NotImplementedError(
        "unsupported image codec (PNG/JPEG/... need an image library); "
        "BMP and PPM decode natively"
    )


def resize_image(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure NumPy index arithmetic."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).astype(np.int64)
    xi = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[yi][:, xi]


def image_feature(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) pixels → deterministic 8-dim float32 feature:
    [w, h, mean_r, mean_g, mean_b, std_r, std_g, std_b]."""
    f = img.reshape(-1, img.shape[-1]).astype(np.float64)
    return np.concatenate(
        (
            [img.shape[1], img.shape[0]],
            f.mean(axis=0),
            f.std(axis=0),
        )
    ).astype(np.float32)


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Real decode hook: images decode natively (BMP/PPM — pure NumPy,
    see :func:`decode_image`) into the pixel-stats feature; audio and
    video codecs are not available in this container and raise
    ``NotImplementedError`` (inject a decode_fn backed by
    ffmpeg/soundfile at deployment)."""
    if kind == "image" or kind.startswith("image/"):
        return image_feature(decode_image(payload))
    raise NotImplementedError(
        f"decoding kind={kind!r} requires an audio/video library not "
        "present in this container; inject a decode_fn (see fake_decode)"
    )


def fake_decode(payload: bytes, kind: str, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in: bytes → fixed-dim float feature via
    byte-histogram folding.  Keeps the full pipeline executable and
    byte-stable for tests."""
    data = np.frombuffer(payload, dtype=np.uint8)
    if data.size == 0:
        return np.zeros(dim, dtype=np.float32)
    hist = np.bincount(data % dim, minlength=dim).astype(np.float32)
    return hist / hist.sum()


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] = real_decode,
    batch_size_hint: int = 64,
) -> DataFrame:
    """binary payload → feature vector, Arrow-batched via mapInPandas.

    One output row per media row; blobs never leave the executor.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_fn(p if p is not None else b"", k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        0 if p is None else len(p) for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame,
    every_ms: int = 1000,
    decode_fn: Callable[[bytes, str], np.ndarray] = real_decode,
) -> DataFrame:
    """video → one row per sampled frame timestamp (plumbing only; the
    frame pixels come from decode_fn).  Demonstrates the 1→N mapInPandas
    fan-out shape used for real frame extraction."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_ms", T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"media_id": [], "frame_ms": [], "feature": []}
            for mid, dur, payload, kind in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"], pdf["kind"]
            ):
                if kind != "video" or dur is None or dur <= 0:
                    continue
                for ts in range(0, int(dur), every_ms):
                    rows["media_id"].append(mid)
                    rows["frame_ms"].append(ts)
                    rows["feature"].append(
                        decode_fn(payload or b"", f"frame@{ts}").tolist()
                    )
            # explicit dtypes: an empty batch must still carry
            # int64/object columns or Arrow rejects the conversion
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(rows["media_id"], dtype="int64"),
                    "frame_ms": pd.Series(rows["frame_ms"], dtype="int64"),
                    "feature": pd.Series(rows["feature"], dtype=object),
                }
            )

    return media.mapInPandas(_sample, schema=schema)
