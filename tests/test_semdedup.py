"""SemDeDup cluster-then-prune lane — operators/semdedup.py.

Cross-engine value parity runs in test_contract.py
(semantic_dup_candidates / semantic_dedup vs the DuckDB twins over the
materialized assignment view); here: planted-duplicate recall,
keep-first determinism, and the fixpoint property."""

from __future__ import annotations

import numpy as np
import pytest

from metacache_mpi_spark.operators.semdedup import (
    semantic_assignments,
    semantic_dedup,
    semantic_dup_candidates,
)


@pytest.fixture(scope="module")
def planted(spark):
    """60 well-separated base vectors + a near-copy of every third one
    (ids 1000+i, cosine > 0.999 to its base)."""
    rng = np.random.RandomState(3)
    base = rng.randn(60, 32)
    rows = [(i, base[i].tolist()) for i in range(60)]
    dup_ids = []
    for i in range(0, 60, 3):
        v = base[i] + 0.001 * rng.randn(32)
        rows.append((1000 + i, v.tolist()))
        dup_ids.append(1000 + i)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    return df, set(dup_ids)


def test_planted_near_copies_are_removed(spark, planted):
    emb, dup_ids = planted
    out = semantic_dedup(emb, n_centroids=8, tau_micro=990_000).collect()
    removed = {r["vec_id"] for r in out if r["removed"]}
    # every near-copy is removed, every base survives (keep-first:
    # the base has the smaller vec_id)
    assert removed == dup_ids
    assert len(out) == 80  # row count preserved


def test_candidates_are_within_cluster_and_ordered(spark, planted):
    emb, _ = planted
    assigned = semantic_assignments(emb, n_centroids=8)
    pairs = semantic_dup_candidates(assigned, tau_micro=990_000).collect()
    assert pairs, "planted duplicates must surface as candidates"
    assert all(r["a"] < r["b"] for r in pairs)
    buckets = {r["vec_id"]: r["bucket"] for r in assigned.collect()}
    assert all(buckets[r["a"]] == buckets[r["b"]] == r["bucket"] for r in pairs)


def test_survivors_are_a_fixpoint(spark, planted):
    emb, _ = planted
    verdict = semantic_dedup(emb, n_centroids=8, tau_micro=990_000)
    survivors = emb.join(
        verdict.where(~verdict.removed).select("vec_id"), "vec_id"
    )
    again = semantic_dedup(survivors, n_centroids=8, tau_micro=990_000)
    assert again.where(again.removed).count() == 0


def test_tau_monotonicity(spark, planted):
    emb, _ = planted
    n_low = semantic_dedup(emb, n_centroids=8, tau_micro=500_000)
    n_high = semantic_dedup(emb, n_centroids=8, tau_micro=999_999)
    assert (
        n_low.where("removed").count() >= n_high.where("removed").count()
    )


def test_clean_job_semdedup_stage(spark, tmp_path):
    """clean_job.run --semdedup-tau: two distinct-text survivors with
    near-identical embeddings collapse to the lower id; survivors
    WITHOUT an embedding row pass through untouched."""
    import argparse
    import importlib.util
    import os

    from metacache_mpi_spark.sources.pages import write_corpus

    spec = importlib.util.spec_from_file_location(
        "clean_job",
        os.path.join(
            os.path.dirname(__file__), "..", "scripts", "clean_job.py"
        ),
    )
    clean_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(clean_job)

    cdir = str(tmp_path / "corpus")
    write_corpus(cdir, n_pages=120, seed=31)

    def _ns(**kw):
        base = dict(
            input=cdir, generate=0, cores=None, bucketed_warehouse=None,
            eval_docs=None, embeddings=None, eval_embeddings=None,
            semantic_tau=0.9,
        )
        base.update(kw)
        return argparse.Namespace(**base)

    base_out = str(tmp_path / "out_base")
    clean_job.run(spark, _ns(output=base_out))
    base_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(base_out).select("doc_id").collect()
    )
    assert len(base_ids) >= 4

    # plant: every survivor gets a random embedding (k-means needs
    # k ≪ n — with k ≈ n every point is its own singleton cluster and
    # nothing is ever compared), the second-smallest id gets a
    # near-copy of the smallest's vector, and the two LARGEST ids get
    # no embedding at all (must pass through the anti-join).
    rng = np.random.RandomState(17)
    v = rng.randn(16)
    rows = [(base_ids[0], v.tolist()),
            (base_ids[1], (v + 0.001 * rng.randn(16)).tolist())]
    rows += [(i, rng.randn(16).tolist()) for i in base_ids[2:-2]]
    embp = str(tmp_path / "emb")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.parquet(embp)

    sem_out = str(tmp_path / "out_sem")
    clean_job.run(
        spark,
        _ns(output=sem_out, embeddings=embp, semdedup_tau=990_000),
    )
    sem_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(sem_out).select("doc_id").collect()
    )
    assert sem_ids == [i for i in base_ids if i != base_ids[1]]


def test_no_prior_sentinel(spark):
    rng = np.random.RandomState(9)
    emb = spark.createDataFrame(
        [(i, rng.randn(16).tolist()) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(emb, n_centroids=4, tau_micro=999_999).collect()
    assert all(
        r["max_prior_cos_micro"] == -1_000_001 and not r["removed"]
        for r in out
    )
