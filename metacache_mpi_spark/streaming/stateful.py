"""Custom stateful streaming operators (applyInPandasWithState).

The reference's interactive mode keeps a resident index across queries
(/root/reference/src/mode_query.cpp:269-315); its streaming analog is
per-key state that survives micro-batches.  Two operators:

- :func:`streaming_exact_dedup` — exact duplicate detection over an
  UNBOUNDED page stream: per content-fingerprint state remembers the
  first-seen url; later arrivals are flagged duplicates.  The state is
  Spark-managed (RocksDB/HDFS-backed on a cluster), so the operator
  scales to 10^12 keys the way the reference's hash_multimap cannot.
- :func:`windowed_page_stats` — watermarked event-time windowed
  aggregation (late data handled by the watermark): per-window page
  count + approx distinct fingerprints, the streaming twin of the A5
  per-key counts.

Fingerprint = md5(text): byte-identical text ⇒ identical key (the
P11/exact-dedup rule), and the shuffle key is 32 hex chars, never the
document body.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("is_duplicate", T.BooleanType()),
        T.StructField("first_url", T.StringType()),
    ]
)

DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_url", T.StringType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (first_url, n_seen) = state.get if state.exists else (None, 0)
    out: list[tuple[Any, ...]] = []
    for pdf in pdfs:
        for url in pdf["url"]:
            if first_url is None:
                first_url = url
                out.append((key[0], url, False, first_url))
            else:
                out.append((key[0], url, True, first_url))
            n_seen += 1
    state.update((first_url, n_seen))
    yield pd.DataFrame(out, columns=["fp", "url", "is_duplicate", "first_url"])


def streaming_exact_dedup(pages_stream: DataFrame) -> DataFrame:
    """Streaming exact dedup: (fp, url, is_duplicate, first_url) rows,
    one per arriving page, with per-fingerprint state across batches."""
    keyed = pages_stream.where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    ).select(F.md5("text").alias("fp"), "url")
    return keyed.groupBy("fp").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_page_stats(
    pages_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked event-time windowed page statistics: rows arriving
    later than ``watermark`` past the window end are dropped (the
    streaming contract for late data); per window emits page count and
    approximate distinct content fingerprints."""
    return (
        pages_stream.withColumn("fp", F.md5("text"))
        .withColumn("ts", F.col("warc_ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.approx_count_distinct("fp").alias("n_distinct_fp"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_pages",
            "n_distinct_fp",
        )
    )
