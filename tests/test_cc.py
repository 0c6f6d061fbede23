"""Connected components (cc_chain / cc_star fixtures, FIXTURES.md §3)."""

from __future__ import annotations

from metacache_mpi_spark.operators.cc import cluster_assignments, connected_components

from .oracle import components


def _run(spark, edges, local_threshold=0):
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, local_threshold=local_threshold).collect()
    }
    want = components(edges)
    assert got == want
    return got


def test_cc_chain(spark):
    _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)])


def test_cc_star(spark):
    _run(spark, [(10, 1), (10, 2), (10, 3), (10, 4)])


def test_cc_two_components_and_duplicate_edges(spark):
    _run(spark, [(1, 2), (2, 1), (2, 3), (7, 8), (8, 9), (9, 7), (1, 3)])


def test_cc_long_path_log_rounds(spark):
    # a 64-node path — exercises multiple large/small-star rounds
    edges = [(i, i + 1) for i in range(64)]
    got = _run(spark, edges)
    assert set(got.values()) == {0}


def test_cc_repartition_invariant(spark):
    edges = [(1, 2), (3, 4), (4, 5), (100, 1)]
    df = spark.createDataFrame(edges, "a long, b long")
    a = {
        (r["node"], r["component"])
        for r in connected_components(df.repartition(7)).collect()
    }
    b = {
        (r["node"], r["component"])
        for r in connected_components(df.coalesce(1)).collect()
    }
    assert a == b


def test_cluster_assignments_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "a long, b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_assignments(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5}


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert connected_components(df).count() == 0


def test_local_and_distributed_paths_agree(spark):
    edges = [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2), (100, 3)]
    df = spark.createDataFrame(edges, "a long, b long")
    loc = {
        (r["node"], r["component"])
        for r in connected_components(df, local_threshold=10**6).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert loc == dist
