"""End-to-end golden test on the tiny corpus: dup-pair recall ≥ 0.99,
boilerplate precision guard, cluster assignments vs union-find oracle
(SURVEY.md §5 test plan; BASELINE.json recall gate)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from metacache_mpi_spark.config import DedupConfig
from metacache_mpi_spark.plans.pipeline import dedup_pipeline
from metacache_mpi_spark.sources.pages import load_pages

from .oracle import components


@pytest.fixture(scope="module")
def result(spark, tiny_corpus):
    pages = load_pages(spark, tiny_corpus)
    res = dedup_pipeline(pages)
    pairs = res.pairs.collect()
    clusters = {r["doc_id"]: r["cluster_id"] for r in res.clusters.collect()}
    truth = spark.read.parquet(f"{tiny_corpus}/pages_truth.parquet")
    tdf = truth.join(
        pages.select("url", "doc_id"), "url"
    ).select("doc_id", "cluster_id", "kind")
    truth_rows = tdf.collect()
    return pages, pairs, clusters, truth_rows


def _truth_pairs(truth_rows):
    """All (a,b) doc-id pairs planted in the same cluster."""
    by_cluster: dict[int, list[int]] = {}
    for r in truth_rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    out = set()
    for ids in by_cluster.values():
        if len(ids) > 1:
            for a, b in itertools.combinations(sorted(ids), 2):
                out.add((a, b))
    return out


def test_dup_pair_recall_gate(result, spark):
    """Recall computed through the first-class evaluation operator
    (pair_recall), not ad-hoc set arithmetic."""
    from metacache_mpi_spark.operators.evaluate import pair_recall

    _, pairs, _, truth_rows = result
    want = _truth_pairs(truth_rows)
    got = {(min(r["a"], r["b"]), max(r["a"], r["b"])) for r in pairs}
    # transitive closure of found pairs also recovers planted pairs
    comp = components([(a, b) for a, b in got])
    by_comp: dict[int, list[int]] = {}
    for node, c in comp.items():
        by_comp.setdefault(c, []).append(node)
    got_closure = {
        (a, b)
        for ids in by_comp.values()
        for a, b in itertools.combinations(sorted(ids), 2)
    }
    stats = pair_recall(
        spark.createDataFrame(list(got_closure), "a long, b long"),
        spark.createDataFrame(list(want), "a long, b long"),
    )
    assert stats["recall"] >= 0.99, f"dup-pair recall {stats['recall']:.4f} < 0.99"


def test_boilerplate_precision_guard(result):
    """Same-site unique pages share header/footer shingles but must not
    be verified as duplicates (ref overpopulated-feature trade-off)."""
    _, pairs, _, truth_rows = result
    kind = {r["doc_id"]: r["kind"] for r in truth_rows}
    cluster = {r["doc_id"]: r["cluster_id"] for r in truth_rows}
    for r in pairs:
        a, b = r["a"], r["b"]
        if kind[a] == "unique" and kind[b] == "unique":
            assert cluster[a] == cluster[b], (
                f"false duplicate pair between unrelated docs {a},{b} "
                f"(jaccard={r['jaccard']:.3f})"
            )


def test_pair_precision_against_truth(result):
    """Every verified pair must join docs of the same planted cluster."""
    _, pairs, _, truth_rows = result
    cluster = {r["doc_id"]: r["cluster_id"] for r in truth_rows}
    bad = [
        (r["a"], r["b"], r["jaccard"], r["dup_kind"])
        for r in pairs
        if cluster[r["a"]] != cluster[r["b"]]
    ]
    precision = 1 - len(bad) / max(1, len(pairs))
    assert precision >= 0.99, f"pair precision {precision:.4f}: {bad[:5]}"


def test_clusters_match_unionfind_oracle(result):
    """Cluster assignment == union-find closure of the verified pairs —
    the CC stage must be exactly transitive closure, nothing else."""
    pages, pairs, clusters, _ = result
    comp = components([(r["a"], r["b"]) for r in pairs])
    all_ids = [r["doc_id"] for r in pages.select("doc_id").collect()]
    want = {i: comp.get(i, i) for i in all_ids}
    assert clusters == want


def test_substring_lane_finds_low_jaccard_dups(result):
    _, pairs, _, truth_rows = result
    kind = {r["doc_id"]: r["kind"] for r in truth_rows}
    sub_pairs = [
        r for r in pairs if kind[r["a"]] == "substring" and kind[r["b"]] == "substring"
    ]
    assert len(sub_pairs) >= 1
    assert any(r["dup_kind"] == "substring" for r in sub_pairs)


def test_signatures_shape(spark, tiny_corpus):
    pages = load_pages(spark, tiny_corpus)
    res = dedup_pipeline(pages, DedupConfig())
    row = res.signatures.select(
        F.size("signature").alias("w"), "simhash"
    ).first()
    assert row["w"] == 16
    assert row["simhash"] is not None


def test_kperm_and_md5_modes_agree_on_exact_dups(spark):
    """The production kperm sketch and the oracle md5 sketch must
    produce IDENTICAL verified-pair sets on a fixture where banding
    recall is exactly 1.0 in both modes (exact duplicates: identical
    shingle sets → identical signatures → every band collides; distinct
    docs fail the τ=0.6 exact-Jaccard verify regardless of chance
    collisions).  This pins the production minhash-UDF/xxhash bucket
    kernel to the oracle-gated md5 twin (r4 advice)."""
    import numpy as np
    from pyspark.sql import functions as F

    from metacache_mpi_spark.config import DedupConfig
    from metacache_mpi_spark.plans.pipeline import dedup_pipeline

    rng = np.random.RandomState(13)
    words = [
        "".join("abcdefghij"[c] for c in rng.randint(0, 10, size=6))
        for _ in range(400)
    ]
    rows = []
    doc_id = 0
    want_pairs = set()
    for g in range(12):
        text = " ".join(words[rng.randint(0, 400)] for _ in range(20))
        copies = 1 + g % 3
        members = []
        for _ in range(copies):
            rows.append((doc_id, f"doc://{doc_id}", text))
            members.append(doc_id)
            doc_id += 1
        want_pairs |= {
            (a, b) for a in members for b in members if a < b
        }
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, text string"
    )
    kperm = dedup_pipeline(docs, DedupConfig(shingle_k=8))
    md5 = dedup_pipeline(
        docs,
        DedupConfig(
            shingle_k=8, sketch_size=8, bands=4, rows_per_band=2,
            sketch_mode="md5",
        ),
    )
    kp = {(r["a"], r["b"]) for r in kperm.pairs.select("a", "b").collect()}
    mp = {(r["a"], r["b"]) for r in md5.pairs.select("a", "b").collect()}
    assert kp == mp == want_pairs
    # cluster assignments agree too (same edges → same components)
    ka = sorted(map(tuple, kperm.clusters.collect()))
    ma = sorted(map(tuple, md5.clusters.collect()))
    assert ka == ma
    kperm.unpersist()
    md5.unpersist()
