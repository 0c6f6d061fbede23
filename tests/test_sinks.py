"""S13 text sinks / split outputs: the reference writes per-target and
per-classification split files (mode_query output options); the Spark
restatement is `partitionBy` columnar output — one directory per key,
readable back with partition pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_partitioned_cluster_sink_roundtrip(spark, tmp_path):
    out = str(tmp_path / "clusters_by_size")
    rows = [(i, i % 3) for i in range(30)]
    clusters = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    (
        clusters.join(sizes, "cluster_id")
        .write.partitionBy("cluster_size")
        .mode("overwrite")
        .parquet(out)
    )
    # split outputs exist, one directory per key
    parts = sorted(
        d for d in os.listdir(out) if d.startswith("cluster_size=")
    )
    assert parts == ["cluster_size=10"]

    back = spark.read.parquet(out)
    assert back.count() == 30
    # partition pruning: a filter on the partition column reads the
    # pruned scan (PartitionFilters in the parquet scan node)
    plan = (
        back.where(F.col("cluster_size") == 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan


def test_partitioned_dup_kind_sink(spark, tmp_path):
    """Pair edges split by dup_kind — the classified/unclassified split
    files analog (one output per classification outcome)."""
    out = str(tmp_path / "pairs_by_kind")
    pairs = spark.createDataFrame(
        [(1, 2, "jaccard"), (3, 4, "substring"), (5, 6, "jaccard")],
        "a long, b long, dup_kind string",
    )
    pairs.write.partitionBy("dup_kind").mode("overwrite").parquet(out)
    kinds = {d for d in os.listdir(out) if d.startswith("dup_kind=")}
    assert kinds == {"dup_kind=jaccard", "dup_kind=substring"}
    sub = spark.read.parquet(out).where(F.col("dup_kind") == "substring")
    assert [(r["a"], r["b"]) for r in sub.collect()] == [(3, 4)]
