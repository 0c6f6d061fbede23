"""Bucketed corpus storage: shuffle-free candidate-pair joins.

Every verify pass joins candidate pairs back to the corpus table for
signatures/texts (J9 point-lookup shape).  On a plain table both join
sides shuffle — corpus bytes move through the exchange on every pass
(the dominant cost of the 500k-doc local profile, BASELINE.md).  The
reference avoids this by partitioning its hash multimap by feature
ONCE at build time and routing queries to ranks
(/root/reference/src/mode_build.cpp:847-1074); the Spark-native
equivalent is a table BUCKETED by the join key: `bucketBy(n, id)` at
write time makes every later equi-join on the id a bucket-local join —
Catalyst drops the Exchange on the bucketed side entirely (visible in
the plan), and only the (pair-sized) probe side moves.

Pure built-in machinery: `DataFrameWriter.bucketBy` + catalog tables.
Works with the in-memory catalog locally and any Hive/Glue/Unity
catalog on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "doc_id",
    num_buckets: int = 32,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet catalog table bucketed (and sorted)
    by ``bucket_col``.  Size ``num_buckets`` to the cluster's target
    parallelism at query time — buckets are the unit of join-side
    task placement.  ``path`` makes it an external table (otherwise it
    lands in the session's warehouse dir)."""
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed corpus table; equi-joins on the bucket column
    skip the Exchange on this side."""
    return spark.table(table)
