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


def test_state_selection_numeric_and_complete(spark, tmp_path):
    """Regression: snapshot selection must be numeric (docs_b10 > docs_b9,
    though lexicographically smaller) and skip incomplete batches."""
    from metacache_mpi_spark.plans.checkpoint import CheckpointManager
    from metacache_mpi_spark.streaming.incremental import IncrementalDedup

    ck = CheckpointManager(spark, str(tmp_path / "ck"))
    kinds = IncrementalDedup._KINDS
    for b in (9, 10):
        marker = spark.createDataFrame([(b,)], "marker long")
        for kind in kinds:
            ck.stage_write(marker, f"{kind}_b{b}")
        ck.commit([f"{k}_b{b}" for k in kinds])
    # batch 11 is INCOMPLETE (docs only, simulating old-code partial state)
    ck.save(spark.createDataFrame([(11,)], "marker long"), "docs_b11")

    inc = IncrementalDedup(spark, ck)
    assert inc.batch_no == 11  # resumes after b10, reprocessing b11
    (row,) = inc._state("docs").collect()
    assert row["marker"] == 10  # not b9 (lexicographic), not b11 (partial)
