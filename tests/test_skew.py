"""Mega-cluster skew: the mirrored-page/spam case where one
near-identical cluster is far larger than ``max_docs_per_bucket``.

The reference's overpopulated-feature rule ("drop",
/root/reference/src/sketch_database.h:375-395) trades that cluster's
recall away entirely; ``oversize_policy="star"`` replaces the dropped
n²/2 expansion with linear hub edges, so connected components still
glues the cluster — at O(n) pair cost, never a quadratic task.
"""

from __future__ import annotations

import itertools

import pytest

from metacache_mpi_spark.config import DedupConfig
from metacache_mpi_spark.plans.pipeline import dedup_pipeline
from metacache_mpi_spark.sources.pages import load_pages, write_corpus

N_PAGES = 800
HOT_FRAC = 0.25  # 200 near-identical mirrors of one template
CAP = 40         # far below the hot bucket size ≈ 180-200


@pytest.fixture(scope="module")
def skew_corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("corpus") / "skew"
    write_corpus(str(out), n_pages=N_PAGES, seed=7, hot_frac=HOT_FRAC)
    return str(out)


def _run(spark, corpus, policy):
    pages = load_pages(spark, corpus)
    cfg = DedupConfig(max_docs_per_bucket=CAP, oversize_policy=policy)
    res = dedup_pipeline(pages, cfg)
    truth = (
        spark.read.parquet(f"{corpus}/pages_truth.parquet")
        .join(pages.select("url", "doc_id"), "url")
        .select("doc_id", "cluster_id", "kind")
        .collect()
    )
    clusters = {r["doc_id"]: r["cluster_id"] for r in res.clusters.collect()}
    pairs = {(r["a"], r["b"]) for r in res.pairs.collect()}
    res.unpersist()  # shared module session — release pinned subtrees
    return truth, clusters, pairs


def test_drop_policy_loses_the_mega_cluster(spark, skew_corpus):
    """Documented trade-off, not a bug: with every hot template bucket
    above the cap dropped, only the occasional variant bucket (a shared
    mutated band slice, under the cap) still links mirrors — the
    mega-cluster FRAGMENTS into dozens of shards (measured: ~98 of
    200).  This is the failure mode "star" exists for."""
    truth, clusters, _ = _run(spark, skew_corpus, "drop")
    hot = [r["doc_id"] for r in truth if r["kind"] == "hot"]
    assert len(hot) == int(N_PAGES * HOT_FRAC)
    n_clusters = len({clusters[d] for d in hot})
    assert n_clusters > 0.2 * len(hot), (
        f"expected the drop policy to fragment the mega-cluster, got "
        f"{n_clusters} clusters for {len(hot)} docs"
    )


def test_star_policy_recovers_mega_cluster_at_linear_cost(spark, skew_corpus):
    truth, clusters, pairs = _run(spark, skew_corpus, "star")
    hot = sorted(r["doc_id"] for r in truth if r["kind"] == "hot")
    # every mirror lands in ONE cluster
    assert len({clusters[d] for d in hot}) == 1
    # pair cost is linear, not quadratic: the verified pair set touching
    # hot docs is bounded by hubs-per-band, nowhere near n²/2
    hot_set = set(hot)
    hot_pairs = [p for p in pairs if p[0] in hot_set or p[1] in hot_set]
    quad = len(hot) * (len(hot) - 1) // 2
    assert len(hot_pairs) >= len(hot) - 1
    assert len(hot_pairs) < 0.25 * quad, (
        f"{len(hot_pairs)} hot pairs vs quadratic {quad}"
    )
    # the rest of the corpus still meets the ≥0.99 pair-recall gate
    from metacache_mpi_spark.operators.evaluate import pair_recall

    from .oracle import components

    by_cluster: dict[int, list[int]] = {}
    for r in truth:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    want = {
        (a, b)
        for ids in by_cluster.values()
        if len(ids) > 1
        for a, b in itertools.combinations(sorted(ids), 2)
    }
    comp = components([(a, b) for a, b in pairs])
    by_comp: dict[int, list[int]] = {}
    for node, c in comp.items():
        by_comp.setdefault(c, []).append(node)
    got = {
        (a, b)
        for ids in by_comp.values()
        for a, b in itertools.combinations(sorted(ids), 2)
    }
    stats = pair_recall(
        spark.createDataFrame(list(got), "a long, b long"),
        spark.createDataFrame(list(want), "a long, b long"),
    )
    assert stats["recall"] >= 0.99, stats


def test_incremental_star_folds_mega_cluster(spark, skew_corpus, tmp_path):
    """The star lane must work INCREMENTALLY too: a mega-cluster split
    across two batches still folds into one cluster, because the
    candidate stream routes through the same policy-aware pair
    generator as the one-shot pipeline."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.plans.checkpoint import CheckpointManager
    from metacache_mpi_spark.streaming.incremental import IncrementalDedup

    pages = load_pages(spark, skew_corpus)
    cfg = DedupConfig(max_docs_per_bucket=CAP, oversize_policy="star")
    inc = IncrementalDedup(
        spark, CheckpointManager(spark, str(tmp_path / "state")), cfg
    )
    inc.process_batch(pages.where("pmod(abs(doc_id), 2) = 0"))
    clusters = inc.process_batch(pages.where("pmod(abs(doc_id), 2) = 1"))

    truth = (
        spark.read.parquet(f"{skew_corpus}/pages_truth.parquet")
        .join(pages.select("url", "doc_id"), "url")
        .where(F.col("kind") == "hot")
        .select("doc_id")
        .collect()
    )
    hot = {r["doc_id"] for r in truth}
    cl = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert len({cl[d] for d in hot}) == 1
