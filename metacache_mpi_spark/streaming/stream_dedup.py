"""Structured Streaming wrapper over the incremental dedup engine.

The reference has no event-time streaming (SURVEY.md §2.5); what it has
is a resident-index micro-batch loop.  This wrapper gives that loop a
``readStream`` front end: a file-source stream of page batches is fed
through ``foreachBatch`` into :class:`IncrementalDedup`, whose
snapshot state provides exactly-once-per-url semantics across batches
(duplicate urls are anti-joined away) and crash resumability (the
snapshot manifest commits atomically per batch).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..config import DEFAULT_CONFIG, DedupConfig
from ..plans.checkpoint import CheckpointManager
from .incremental import IncrementalDedup

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampNTZType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    stream_checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 1,
):
    """Start a streaming query deduplicating parquet page files as they
    arrive in ``input_dir``.  Returns the StreamingQuery; callers stop
    it (or use ``processAllAvailable`` in tests)."""
    engine = IncrementalDedup(
        spark, CheckpointManager(spark, checkpoint_dir), cfg
    )

    def _process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        engine.process_batch(batch_df)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(_process).trigger(
        availableNow=True
    )
    if stream_checkpoint_dir:
        writer = writer.option("checkpointLocation", stream_checkpoint_dir)
    return writer.start()


def stream_query(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    stream_checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 1,
):
    """READ-ONLY streaming twin of :func:`stream_dedup`: screen page
    files as they arrive against a FROZEN index (``checkpoint_dir``
    state built by `stream_dedup`/`IncrementalDedup`/`dedup_job`),
    appending one match report per page (url / content / none,
    ``streaming/incremental.py::query_batch``) to ``output_dir``
    partitioned by micro-batch.  The index state is never written —
    this is continuous decontamination screening of an incoming crawl
    against a reference corpus; promote batches into the index with
    `stream_dedup` separately if and when they pass.

    Returns the StreamingQuery.
    """
    import glob as _glob
    import os as _os

    # batch_id numbering restarts without a stream checkpoint, so a
    # re-run over a changed input set would OVERWRITE low batch dirs
    # and leave stale high ones mixed into the output — refuse the
    # ambiguous combination instead of silently double-reporting
    if stream_checkpoint_dir is None and _glob.glob(
        _os.path.join(output_dir, "batch_id=*")
    ):
        raise ValueError(
            f"{output_dir!r} already holds batch reports and no "
            "stream_checkpoint_dir was given — pass the original "
            "stream checkpoint to resume exactly-once, or point at a "
            "fresh output dir"
        )

    engine = IncrementalDedup(
        spark, CheckpointManager(spark, checkpoint_dir), cfg
    )

    def _probe(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        engine.query_batch(batch_df).write.mode("overwrite").parquet(
            f"{output_dir}/batch_id={batch_id}"
        )
        # the write materialized the report — free this batch's probe
        # caches so a long stream holds O(1) pinned frames, not O(batches)
        engine.release_query_pins()

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(_probe).trigger(
        availableNow=True
    )
    if stream_checkpoint_dir:
        writer = writer.option("checkpointLocation", stream_checkpoint_dir)
    return writer.start()
