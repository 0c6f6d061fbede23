"""Structured Streaming front end: files arriving in a directory flow
through foreachBatch into the incremental dedup state; final clusters
equal the one-shot jaccard-lane clustering."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from metacache_mpi_spark.plans.checkpoint import CheckpointManager
from metacache_mpi_spark.plans.pipeline import dedup_pipeline
from metacache_mpi_spark.sources.pages import generate_pages, load_pages, write_corpus
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
