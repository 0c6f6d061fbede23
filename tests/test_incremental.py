"""Incremental micro-batch dedup: processing the corpus in batches must
match the one-shot pipeline clusters (the reference's resident-index
REPL loop analog, /root/reference/src/mode_query.cpp:269-315)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metacache_mpi_spark.plans.checkpoint import CheckpointManager
from metacache_mpi_spark.plans.pipeline import dedup_pipeline
from metacache_mpi_spark.sources.pages import load_pages
from metacache_mpi_spark.streaming import IncrementalDedup

from .oracle import components


def test_two_batches_equal_one_shot(spark, tiny_corpus, tmp_path):
    pages = load_pages(spark, tiny_corpus)
    # split deterministically by id parity
    b1 = pages.where(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    b2 = pages.where(F.pmod(F.col("doc_id"), F.lit(2)) == 1)

    inc = IncrementalDedup(spark, CheckpointManager(spark, str(tmp_path / "ck")))
    inc.process_batch(b1)
    final = inc.process_batch(b2)
    got = {(r["doc_id"], r["cluster_id"]) for r in final.collect()}

    # oracle: one-shot pipeline WITHOUT the substring lane (incremental
    # covers the jaccard lane; fp lane folds in via the same band table)
    one = dedup_pipeline(pages)
    jacc_edges = [
        (r["a"], r["b"])
        for r in one.pairs.collect()
        if r["dup_kind"] == "jaccard"
    ]
    comp = components(jacc_edges)
    all_ids = [r["doc_id"] for r in pages.select("doc_id").collect()]
    want = {(i, comp.get(i, i)) for i in all_ids}
    assert got == want


def test_duplicate_url_across_batches_ignored(spark, tiny_corpus, tmp_path):
    pages = load_pages(spark, tiny_corpus).limit(50)
    inc = IncrementalDedup(spark, CheckpointManager(spark, str(tmp_path / "ck2")))
    c1 = inc.process_batch(pages)
    c2 = inc.process_batch(pages)  # same urls again -> all skipped
    assert c1.count() == c2.count() == 50
