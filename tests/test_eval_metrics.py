"""Dedup evaluation operators — pair_set_metrics +
clustering_pair_metrics (operators/evaluate.py).  Cross-engine value
parity runs in test_contract.py (dedup_pair_metrics /
cluster_agreement_lang); here: exact handcrafted expectations."""

from __future__ import annotations

from metacache_mpi_spark.operators.evaluate import (
    clustering_pair_metrics,
    pair_set_metrics,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a long, b long")


def test_pair_set_metrics_exact(spark):
    # truth = {12,13,23}; pred = {12, 24} → tp=1 fp=1 fn=2
    pred = _pairs(spark, [(1, 2), (2, 4)])
    truth = _pairs(spark, [(1, 2), (1, 3), (2, 3)])
    r = pair_set_metrics(pred, truth).first()
    assert (r["tp"], r["fp"], r["fn"]) == (1, 1, 2)
    assert r["precision_micro"] == 500_000
    assert r["recall_micro"] == 333_333
    assert r["f1_micro"] == 400_000


def test_pair_set_metrics_canonicalizes_and_dedups(spark):
    # reversed + repeated pred pairs collapse before scoring
    pred = _pairs(spark, [(2, 1), (1, 2), (4, 2)])
    truth = _pairs(spark, [(1, 2)])
    r = pair_set_metrics(pred, truth).first()
    assert (r["tp"], r["fp"], r["fn"]) == (1, 1, 0)
    assert r["recall_micro"] == 1_000_000


def test_pair_set_metrics_empty_sides(spark):
    empty = spark.createDataFrame([], "a long, b long")
    some = _pairs(spark, [(1, 2)])
    r = pair_set_metrics(empty, some).first()
    assert (r["tp"], r["fp"], r["fn"]) == (0, 0, 1)
    assert r["precision_micro"] == 1_000_000  # vacuous precision
    assert r["recall_micro"] == 0
    r2 = pair_set_metrics(some, empty).first()
    assert (r2["tp"], r2["fp"], r2["fn"]) == (0, 1, 0)
    assert r2["recall_micro"] == 1_000_000  # vacuous recall


def test_clustering_pair_metrics_exact(spark):
    # pred clusters {1,2,3}{4,5}; truth labels {1,2}{3,4,5}
    pred = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20)],
        "doc_id long, cluster_id long",
    )
    truth = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "y")],
        "doc_id long, label string",
    )
    r = clustering_pair_metrics(pred, truth).first()
    # pred pairs: C(3,2)+C(2,2)=4; truth: C(2,2)+C(3,2)=4
    # joint cells: (10,x)=2 (10,y)=1 (20,y)=2 → tp = 1 + 0 + 1 = 2
    assert r["n_docs"] == 5
    assert (r["tp_pairs"], r["pred_pairs"], r["truth_pairs"]) == (2, 4, 4)
    assert r["precision_micro"] == 500_000
    assert r["recall_micro"] == 500_000
    # total C(5,2)=10; rand = (10 - 4 - 4 + 2*2)/10 = 0.6
    assert r["rand_micro"] == 600_000


def test_clustering_pair_metrics_identical_and_singletons(spark):
    same = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 8)], "doc_id long, cluster_id long"
    )
    truth = same.withColumnRenamed("cluster_id", "label")
    r = clustering_pair_metrics(same, truth).first()
    assert r["precision_micro"] == r["recall_micro"] == 1_000_000
    assert r["rand_micro"] == 1_000_000
    # all singletons on both sides: vacuous 1.0 everywhere
    single = spark.createDataFrame(
        [(1, 1), (2, 2)], "doc_id long, cluster_id long"
    )
    st = single.withColumnRenamed("cluster_id", "label")
    r2 = clustering_pair_metrics(single, st).first()
    assert (r2["tp_pairs"], r2["pred_pairs"], r2["truth_pairs"]) == (0, 0, 0)
    assert r2["precision_micro"] == r2["recall_micro"] == 1_000_000
    assert r2["rand_micro"] == 1_000_000


def test_coverage_stats_exact(spark):
    """-taxon-coverage semantics (classification.cpp:294-320): per
    ranked truth-lineage taxon, covered×classified → tp/fp/tn/fn."""
    from metacache_mpi_spark.operators.evaluate import (
        coverage_stats,
        db_covered_taxa,
    )
    from metacache_mpi_spark.operators.taxonomy import Taxonomy

    tax = Taxonomy(
        parent={1: 1, 100: 1, 101: 1, 10: 100, 11: 100, 12: 100,
                13: 101, 14: 101, 15: 101},
        rank={1: "root", 100: "genus", 101: "genus",
              **{t: "species" for t in range(10, 16)}},
    )
    covered = db_covered_taxa(tax, [10, 11])
    assert covered == frozenset({1, 10, 11, 100})

    rows = [
        (0, 10, 10),     # species assignment, fully covered truth
        (1, 100, 13),    # genus assignment, uncovered species/genus truth
        (2, None, 11),   # unclassified, covered truth
        (3, 10, None),   # no ground truth -> skipped entirely
    ]
    df = spark.createDataFrame(
        rows, "qid long, taxid long, truth_taxid long"
    )
    out = {
        r["rank"]: r
        for r in coverage_stats(df, tax, covered).collect()
    }
    assert set(out) == {"species", "genus", "root"}
    s = out["species"]
    assert (s["tp"], s["fp"], s["tn"], s["fn"]) == (1, 0, 1, 1)
    assert s["accuracy_micro"] == 666_666
    assert s["sensitivity_micro"] == 500_000
    assert s["specificity_micro"] == 1_000_000
    g = out["genus"]
    assert (g["tp"], g["fp"], g["tn"], g["fn"]) == (1, 1, 0, 1)
    assert g["specificity_micro"] == 0
    r = out["root"]
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (2, 0, 0, 1)
    assert r["specificity_micro"] == 0  # guarded 0/0
    assert r["sensitivity_micro"] == 666_666
