"""Structured Streaming front end: files arriving in a directory flow
through foreachBatch into the incremental dedup state; final clusters
equal the one-shot jaccard-lane clustering."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from metacache_mpi_spark.plans.checkpoint import CheckpointManager
from metacache_mpi_spark.plans.pipeline import dedup_pipeline
from metacache_mpi_spark.sources.pages import generate_pages, load_pages, write_corpus
from metacache_mpi_spark.streaming import IncrementalDedup
from metacache_mpi_spark.streaming.stream_dedup import stream_dedup

from .oracle import components


def test_stream_matches_batch(spark, tmp_path):
    pages, _ = generate_pages(200, seed=21)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    # two "arriving" files
    for i, chunk in enumerate((pages.iloc[:100], pages.iloc[100:])):
        pq.write_table(
            pa.Table.from_pandas(chunk, schema=schema, preserve_index=False),
            str(stream_dir / f"batch{i}.parquet"),
        )

    q = stream_dedup(
        spark,
        str(stream_dir),
        str(tmp_path / "state"),
        stream_checkpoint_dir=str(tmp_path / "sck"),
    )
    q.awaitTermination(300)

    ck = CheckpointManager(spark, str(tmp_path / "state"))
    final = max(
        (s.name for s in ck.snapshots() if s.name.startswith("clusters_b")),
    )
    got = {
        (r["doc_id"], r["cluster_id"]) for r in ck.load(final).collect()
    }

    # oracle: one-shot pipeline's jaccard-lane clusters on the same pages
    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    pq.write_table(
        pa.Table.from_pandas(pages, schema=schema, preserve_index=False),
        str(corpus_dir / "pages.parquet"),
    )
    one = dedup_pipeline(load_pages(spark, str(corpus_dir)))
    edges = [
        (r["a"], r["b"]) for r in one.pairs.collect() if r["dup_kind"] == "jaccard"
    ]
    comp = components(edges)
    ids = [r["doc_id"] for r in load_pages(spark, str(corpus_dir)).select("doc_id").collect()]
    want = {(i, comp.get(i, i)) for i in ids}
    assert got == want


def test_stream_query_screens_against_frozen_index(spark, tmp_path):
    """stream_query: arriving files are screened read-only against a
    pre-built index — known urls report 'url', everything else in a
    fresh corpus reports via content/none; the index state is not
    mutated by the stream."""
    from metacache_mpi_spark.streaming.stream_dedup import stream_query

    pages, _ = generate_pages(120, seed=33)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )

    # build the frozen index from the first 80 pages
    state = str(tmp_path / "state")
    inc = IncrementalDedup(spark, CheckpointManager(spark, state))
    inc.process_batch(spark.createDataFrame(pages.iloc[:80][["url", "text"]]))
    n_snaps = len(inc.ck.snapshots())

    # stream two probe files: one of INDEXED pages, one of unseen pages
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    for i, chunk in enumerate((pages.iloc[:40], pages.iloc[80:])):
        pq.write_table(
            pa.Table.from_pandas(chunk, schema=schema, preserve_index=False),
            str(stream_dir / f"probe{i}.parquet"),
        )
    out = str(tmp_path / "reports")
    q = stream_query(
        spark,
        str(stream_dir),
        state,
        out,
        stream_checkpoint_dir=str(tmp_path / "qck"),
    )
    q.awaitTermination(300)

    reports = spark.read.parquet(out)
    kinds = {
        r["url"]: r["match_kind"] for r in reports.collect()
    }
    first_urls = set(pages.iloc[:40]["url"])
    assert all(kinds[u] == "url" for u in kinds if u in first_urls)
    assert any(k != "url" for u, k in kinds.items() if u not in first_urls)
    # read-only: the index grew no snapshots
    assert len(CheckpointManager(spark, state).snapshots()) == n_snaps


def test_stateful_exact_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-fingerprint state survives batches —
    a text first seen in batch 1 flags its batch-2 twin as duplicate."""
    from metacache_mpi_spark.streaming.stateful import (
        DEDUP_OUTPUT_SCHEMA,
        streaming_exact_dedup,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ck = str(tmp_path / "ck")

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "url string, text string"
        ).coalesce(1).write.parquet(str(in_dir / name))

    write_batch("b0", [("u1", "alpha text"), ("u2", "beta text")])
    write_batch("b1", [("u3", "alpha text"), ("u4", "gamma text")])

    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir) + "/*")
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["url"]: r for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert len(rows) == 4
    dups = {u for u, r in rows.items() if r["is_duplicate"]}
    assert dups == {"u3"} or dups == {"u1"}  # one of the alpha pair
    alpha_first = rows["u3"]["first_url"] if "u3" in dups else rows["u1"]["first_url"]
    assert rows["u1"]["fp"] == rows["u3"]["fp"]
    assert alpha_first in ("u1", "u3")
    assert not rows["u2"]["is_duplicate"] and not rows["u4"]["is_duplicate"]


def test_windowed_page_stats_watermark(spark, tmp_path):
    """Watermarked windowed agg emits per-window counts."""
    import datetime as dt

    from metacache_mpi_spark.streaming.stateful import windowed_page_stats

    in_dir = tmp_path / "win_in"
    in_dir.mkdir()
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u1", t0, "a"), ("u2", t0 + dt.timedelta(seconds=30), "a"),
        ("u3", t0 + dt.timedelta(minutes=1, seconds=10), "b"),
    ]
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp_ntz, text string"
    ).coalesce(1).write.parquet(str(in_dir / "b0"))
    # a later batch advances the watermark past the first windows' end,
    # closing them (append mode only emits CLOSED windows)
    spark.createDataFrame(
        [("u9", t0 + dt.timedelta(minutes=10), "z")],
        "url string, warc_ts timestamp_ntz, text string",
    ).coalesce(1).write.parquet(str(in_dir / "b1"))
    stream = (
        spark.readStream.schema("url string, warc_ts timestamp_ntz, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir) + "/*")
    )
    q = (
        windowed_page_stats(stream)
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "win_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"].minute, r["n_pages"], r["n_distinct_fp"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    # the 00:10 event moved the watermark to 00:08, closing both early
    # windows; the 00:10 window itself stays open (not emitted)
    assert got == {(0, 2, 1), (1, 1, 1)}


def test_stream_query_refuses_stale_output_without_checkpoint(spark, tmp_path):
    """Re-running stream_query over an output dir that already holds
    batch reports, without the original stream checkpoint, would mix
    stale and fresh reports — it must refuse."""
    import os

    import pytest

    from metacache_mpi_spark.streaming.stream_dedup import stream_query

    out = tmp_path / "reports"
    (out / "batch_id=0").mkdir(parents=True)
    with pytest.raises(ValueError, match="batch reports"):
        stream_query(
            spark,
            str(tmp_path / "incoming"),
            str(tmp_path / "state"),
            str(out),
        )
