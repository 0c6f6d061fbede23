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


def test_cc_checkpointed_resume(spark, tmp_path):
    """Kill-and-resume through CheckpointManager snapshots: a run
    stopped mid-loop (simulated with max_iter) leaves per-iteration
    snapshots; a fresh run on the same root loads the committed
    iterations and continues to the SAME result as an uninterrupted
    run — the durable replacement for the executor-loss-unsafe
    localCheckpoint lineage cut."""
    from metacache_mpi_spark.operators.cc import connected_components
    from metacache_mpi_spark.plans.checkpoint import CheckpointManager

    # two long paths + singleton pair: needs several star rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(120)]
        + [(1000 + i, 1001 + i) for i in range(60)],
        "a long, b long",
    )
    want = sorted(
        (r["node"], r["component"])
        for r in connected_components(
            edges, local_threshold=0
        ).collect()
    )

    root = str(tmp_path / "cc_ckpt")
    ck = CheckpointManager(spark, root)
    connected_components(edges, max_iter=2, local_threshold=0, snapshots=ck)
    n_partial = len(ck.snapshots())
    assert n_partial == 2  # the "crashed" run committed two iterations

    ck2 = CheckpointManager(spark, root)  # fresh process, same root
    got = sorted(
        (r["node"], r["component"])
        for r in connected_components(
            edges, local_threshold=0, snapshots=ck2
        ).collect()
    )
    assert got == want
    names = [s.name for s in ck2.snapshots()]
    assert len(names) > n_partial  # continued past the crash point
    assert names[:2] == ["cc_iter000", "cc_iter001"]


def test_cc_local_threshold_guard(spark):
    """local_threshold above MAX_LOCAL_EDGES must refuse: the driver
    collect scales with it (r4 verdict foot-gun)."""
    import pytest

    from metacache_mpi_spark.operators.cc import (
        MAX_LOCAL_EDGES,
        connected_components,
    )

    edges = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="MAX_LOCAL_EDGES"):
        connected_components(edges, local_threshold=MAX_LOCAL_EDGES + 1)


def test_cluster_representatives_policies(spark):
    import datetime

    from metacache_mpi_spark.operators.cc import cluster_representatives

    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 40), (7, 40), (5, 50), (6, 50)],
        "doc_id long, cluster_id long",
    )
    ts = datetime.datetime
    pages = spark.createDataFrame(
        [
            (1, ts(2024, 1, 3), "aaaa"),
            (2, ts(2024, 1, 1), "bbbbbb"),
            (3, ts(2024, 1, 2), None),       # null text ranks shortest
            (4, ts(2024, 1, 5), "cc"),
            (7, None, "c"),                  # null ts must NOT win earliest
            (6, ts(2024, 1, 4), "dd"),       # equal lengths -> min id
            (5, ts(2024, 1, 4), "ee"),
        ],
        "doc_id long, warc_ts timestamp, text string",
    )

    def got(policy, pg=pages):
        return {
            r["cluster_id"]: r["rep_id"]
            for r in cluster_representatives(clusters, pg, policy).collect()
        }

    assert got("min_id", None) == {10: 1, 40: 4, 50: 5}
    assert got("earliest") == {10: 2, 40: 4, 50: 5}
    assert got("longest") == {10: 2, 40: 4, 50: 5}


def test_cluster_representatives_errors(spark):
    import pytest as _pytest

    from metacache_mpi_spark.operators.cc import cluster_representatives

    clusters = spark.createDataFrame(
        [(1, 10)], "doc_id long, cluster_id long"
    )
    with _pytest.raises(ValueError, match="needs the pages frame"):
        cluster_representatives(clusters, None, "longest")
    pages = spark.createDataFrame(
        [(1, "x")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="unknown representative"):
        cluster_representatives(clusters, pages, "nope")
