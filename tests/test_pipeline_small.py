"""FIXTURES.md 'small' scale (5,000 pages): the dup-pair recall ≥ 0.99
gate at the e2e scale the fixture spec names (tiny covers units)."""

from __future__ import annotations

import itertools

import pytest

from metacache_mpi_spark.plans.pipeline import dedup_pipeline
from metacache_mpi_spark.sources.pages import load_pages, write_corpus

from .oracle import components


@pytest.fixture(scope="module")
def small(spark, tmp_path_factory):
    corpus = str(tmp_path_factory.mktemp("small") / "c")
    write_corpus(corpus, n_pages=5000, seed=42)
    pages = load_pages(spark, corpus)
    res = dedup_pipeline(pages)
    truth = (
        spark.read.parquet(f"{corpus}/pages_truth.parquet")
        .join(pages.select("url", "doc_id"), "url")
        .select("doc_id", "cluster_id", "kind")
        .collect()
    )
    return res, truth


def test_recall_gate_small(small):
    res, truth = small
    by_cluster: dict[int, list[int]] = {}
    for r in truth:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    want = set()
    for ids in by_cluster.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            want.add((a, b))

    pairs = [(r["a"], r["b"]) for r in res.pairs.collect()]
    comp = components(pairs)
    by_comp: dict[int, list[int]] = {}
    for node, c in comp.items():
        by_comp.setdefault(c, []).append(node)
    got = set()
    for ids in by_comp.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            got.add((a, b))

    # gate through the first-class evaluation operator
    from metacache_mpi_spark.operators.evaluate import pair_recall

    spark = res.clusters.sparkSession
    stats = pair_recall(
        spark.createDataFrame(list(got), "a long, b long"),
        spark.createDataFrame(list(want), "a long, b long"),
    )
    assert stats["recall"] >= 0.99, f"recall {stats['recall']:.4f}"
    assert stats["precision"] >= 0.98, f"precision {stats['precision']:.4f}"


def test_clusters_invariant_under_partitioning(spark):
    """Physical layout must not leak into results: the same corpus
    partitioned 3-ways and 13-ways yields IDENTICAL cluster
    assignments (deterministic tie-breaks end to end)."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.plans.pipeline import dedup_pipeline
    from metacache_mpi_spark.sources.pages import generate_pages

    pages, _ = generate_pages(n_pages=200, seed=3)
    base = spark.createDataFrame(pages[["url", "text"]])
    outs = []
    for nparts in (3, 13):
        res = dedup_pipeline(base.repartition(nparts))
        outs.append(
            sorted(
                (r["doc_id"], r["cluster_id"])
                for r in res.clusters.collect()
            )
        )
        res.unpersist()
    assert outs[0] == outs[1]
    assert len(outs[0]) == 200


def test_pipeline_degenerate_inputs(spark):
    """The verify-skill flow as a pinned test: empty text, null text,
    sub-shingle-length text, and duplicate urls must flow through the
    FULL pipeline without throwing, with the P11 filters and the
    null-signature path doing their jobs."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.plans.pipeline import dedup_pipeline

    body = "some perfectly ordinary page body text for the pipeline " * 4
    pages = spark.createDataFrame(
        [
            ("http://a.example/empty", ""),
            ("http://a.example/null", None),
            ("http://a.example/short", "tiny"),       # < shingle_k
            ("http://a.example/dup", body),
            ("http://a.example/dup", body),           # duplicate url
            ("http://a.example/ok", body + " unique tail"),
        ],
        "url string, text string",
    )
    res = dedup_pipeline(pages)
    clusters = res.clusters.collect()
    # empty + null dropped, dup url collapsed -> 3 surviving docs
    assert len(clusters) == 3
    assert res.signatures.where(F.col("signature").isNull()).count() == 1
    res.unpersist()


def test_md5_mode_pairs_carry_null_simhash(spark):
    """sketch_mode="md5" carries simhash as NULL end-to-end: verified
    pairs must emit simhash_hamming = null, never a garbage int from a
    NaN->int64 cast (the r4 review finding)."""
    from metacache_mpi_spark.config import DedupConfig
    from metacache_mpi_spark.plans.pipeline import dedup_pipeline

    base = "the quick brown fox jumps over the lazy dog " * 8
    pages = spark.createDataFrame(
        [
            ("http://a", base),
            ("http://b", base + "tail"),
            ("http://c", "something entirely different altogether here"),
        ],
        "url string, text string",
    )
    cfg = DedupConfig(
        shingle_k=8, sketch_size=8, bands=4, rows_per_band=2,
        sketch_mode="md5",
    )
    pairs = dedup_pipeline(pages, cfg).pairs.collect()
    assert len(pairs) >= 1  # a/b are near-dups
    assert all(r["simhash_hamming"] is None for r in pairs)
