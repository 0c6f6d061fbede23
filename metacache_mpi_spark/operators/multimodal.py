"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery (schemas, partitioning, Arrow batch shape,
UDF signatures) is real and tested; the actual media decoding is
STUBBED — the sandbox has no image/audio libraries — behind
``decode_fn`` hooks that either raise ``NotImplementedError`` (real
codecs) or produce deterministic fake features (tests).  Swapping in a
real decoder (PIL / ffmpeg) changes only the hook, not the plan.

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


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Real codec hook — not available in this environment."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this container; inject a decode_fn (see fake_decode)"
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
