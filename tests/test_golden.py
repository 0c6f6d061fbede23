"""Frozen golden outputs for the tiny corpus (FIXTURES.md §4): any
drift in hashing/sketching/banding semantics fails here.  Regenerate
intentionally with scripts/make_goldens.py."""

from __future__ import annotations

import os

import pytest

from metacache_mpi_spark.plans.pipeline import dedup_pipeline
from metacache_mpi_spark.sources.pages import load_pages, write_corpus

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    corpus = str(tmp_path_factory.mktemp("golden") / "c")
    write_corpus(corpus, n_pages=500, seed=42)
    return dedup_pipeline(load_pages(spark, corpus))


def _rows(df, cols):
    """Name-aligned row multiset: goldens pin VALUES, not the physical
    column order of the plan that wrote them (the round-2 parquet has
    the USING-join (b, a, …) order; the fused round-3 plan emits
    (a, b, …))."""
    out = sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: tuple(str(x) for x in t),
    )
    return out


@pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="goldens not generated yet"
)
class TestGolden:
    def test_signatures_match_golden(self, spark, result):
        want = spark.read.parquet(f"{GOLDEN}/signatures.golden.parquet")
        # compare on the golden's sketch columns: the pipeline's
        # signature table additionally carries the text passthrough
        # (round 3 verify-join fusion) — additive, not semantic drift
        cols = sorted(want.columns)
        assert _rows(result.signatures, cols) == _rows(want, cols)

    def test_pairs_match_golden(self, spark, result):
        want = spark.read.parquet(f"{GOLDEN}/pairs.golden.parquet")
        cols = sorted(want.columns)
        assert _rows(result.pairs, cols) == _rows(want, cols)

    def test_clusters_match_golden(self, spark, result):
        want = spark.read.parquet(f"{GOLDEN}/clusters.golden.parquet")
        cols = sorted(want.columns)
        assert _rows(result.clusters, cols) == _rows(want, cols)
