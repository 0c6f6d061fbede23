"""P14 ambiguous-feature removal, J4/J5 accession resolution chain,
P15 clade exclusion, info-featuremap dump."""

from __future__ import annotations

import pytest

from metacache_mpi_spark.operators.genomic import (
    dump_feature_map,
    remove_ambiguous_features,
)
from metacache_mpi_spark.operators.taxonomy import (
    Taxonomy,
    exclude_clade,
    resolve_taxids,
)


@pytest.fixture()
def index(spark):
    rows = [
        (100, 0, 0), (100, 1, 0), (100, 2, 0),  # feature 100 spans 3 targets
        (200, 0, 1), (200, 0, 2),               # feature 200 only target 0
        (300, 1, 0),
    ]
    return spark.createDataFrame(rows, "feature long, tgt long, win long")


def test_remove_ambiguous_features(spark, index):
    # targets 0,1 same species; target 2 different -> feature 100 spans 2 taxa
    dim = spark.createDataFrame(
        [(0, 5), (1, 5), (2, 9)], "tgt long, taxid long"
    )
    kept = remove_ambiguous_features(index, dim, max_ambig=1)
    feats = {r["feature"] for r in kept.select("feature").distinct().collect()}
    assert feats == {200, 300}
    kept2 = remove_ambiguous_features(index, dim, max_ambig=2)
    feats2 = {r["feature"] for r in kept2.select("feature").distinct().collect()}
    assert feats2 == {100, 200, 300}


def test_dump_feature_map_sorted(spark, index):
    rows = dump_feature_map(index).collect()
    assert [r["feature"] for r in rows] == [100, 200, 300]
    assert [tuple(loc) for loc in rows[0]["locations"]] == [(0, 0), (1, 0), (2, 0)]
    assert [tuple(loc) for loc in rows[1]["locations"]] == [(0, 1), (0, 2)]


def test_index_bucket_statistics_over_genomic_index(spark, index):
    """`info statistics` (sketch_database.h:1021-1032): bucket-size
    moments of the feature hash table — mean/var/max derive exactly
    from the one-pass integer accumulators."""
    from metacache_mpi_spark.operators.relational import bucket_size_stats

    row = bucket_size_stats(index, bucket_cols=["feature"]).collect()[0]
    # bucket sizes: feature 100 → 3 locations, 200 → 2, 300 → 1
    assert row["n_buckets"] == 3
    assert row["sum_sz"] == 6 and row["sum_sq_sz"] == 14
    assert row["min_sz"] == 1 and row["max_sz"] == 3
    mean = row["sum_sz"] / row["n_buckets"]
    var = row["sum_sq_sz"] / row["n_buckets"] - mean**2
    assert mean == 2.0 and abs(var - 2 / 3) < 1e-12


def test_resolve_taxids_fallback_chain(spark):
    targets = spark.createDataFrame(
        [(0, "NC_1.2"), (1, "NC_2.9"), (2, "NC_3"), (3, "XX_404.1")],
        "tgt long, accession string",
    )
    mapping = spark.createDataFrame(
        [
            ("NC_1", "NC_1.2", 101),   # exact version match
            ("NC_2", "NC_2.1", 102),   # only base matches (version drift)
            ("NC_3", "NC_3.5", 103),   # target has no version -> base match
        ],
        "accession string, accession_version string, taxid long",
    )
    got = {r["tgt"]: r["taxid"] for r in resolve_taxids(targets, mapping).collect()}
    assert got == {0: 101, 1: 102, 2: 103, 3: None}


def test_exclude_clade(spark):
    tax = Taxonomy(
        parent={1: 1, 4: 1, 8: 1, 5: 4, 6: 4, 9: 8},
        rank={1: "root", 4: "genus", 8: "genus",
              5: "species", 6: "species", 9: "species"},
    )
    tmap = {0: 5, 1: 6, 2: 9}
    cands = spark.createDataFrame(
        [(0, 0, 9, 0, 1), (0, 1, 8, 0, 2), (0, 2, 7, 0, 3)],
        "qid long, tgt long, hits long, win_beg long, rank int",
    )
    kept = exclude_clade(cands, tax, tmap, exclude_taxid=4)
    assert {r["tgt"] for r in kept.collect()} == {2}  # genus-4 targets gone
    same = exclude_clade(cands, tax, tmap, exclude_taxid=77)
    assert same.count() == 3
