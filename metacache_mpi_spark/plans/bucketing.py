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

import json
import os
import warnings

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
    lands in the session's warehouse dir).

    External tables also get a ``_bucket_spec.json`` beside the data:
    catalog metadata (schema + bucket spec) is SESSION state under the
    default in-memory catalog, so a later ``spark-submit`` run cannot
    see the table even though the files survive — the spec makes the
    on-disk layout self-describing so :func:`try_register_bucketed`
    can rebuild the catalog entry instead of re-sketching the corpus.
    """
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    if path is not None:
        spec = {
            "table": table,
            "bucket_col": bucket_col,
            "num_buckets": int(num_buckets),
            "schema": [
                (f.name, f.dataType.simpleString())
                for f in df.schema.fields
            ],
        }
        with open(os.path.join(path, "_bucket_spec.json"), "w") as fh:
            json.dump(spec, fh)


def try_register_bucketed(
    spark: SparkSession, table: str, path: str
) -> bool:
    """Re-register an existing external bucketed table in THIS
    session's catalog from its on-disk ``_bucket_spec.json`` (written
    by :func:`write_bucketed`).  Returns False when the spec is absent
    (nothing durable to register — caller falls back to a fresh
    write).  The stored bucket count is used verbatim: bucketing is a
    property of the files, not of the registering session's
    parallelism."""
    spec_path = os.path.join(path, "_bucket_spec.json")
    if not os.path.exists(spec_path):
        return False
    try:
        with open(spec_path) as fh:
            spec = json.load(fh)
        cols = ", ".join(f"`{n}` {t}" for n, t in spec["schema"])
        bc = spec["bucket_col"]
        nb = int(spec["num_buckets"])
    except (OSError, ValueError, KeyError, TypeError) as exc:
        # unreadable/incomplete spec: unregisterable — the caller
        # rebuilds (its fingerprint guard still protects a mismatched
        # corpus from overwriting the stored state).  Surfaced, not
        # swallowed: a persistent spec problem would otherwise pay the
        # full re-sketch EVERY session with no signal.
        warnings.warn(
            f"bucketed table {table!r}: unreadable _bucket_spec.json "
            f"at {spec_path!r} ({exc!r}); falling back to a fresh write"
        )
        return False
    try:
        spark.sql(
            f"CREATE TABLE `{table}` ({cols}) USING PARQUET "
            f"CLUSTERED BY (`{bc}`) SORTED BY (`{bc}`) "
            f"INTO {nb} BUCKETS "
            f"LOCATION '{path}'"
        )
        return True
    except Exception as exc:
        # DDL failure with a VALID spec: never half-register, but make
        # the reuse loss loud — every later session would re-sketch
        warnings.warn(
            f"bucketed table {table!r}: re-registration DDL failed "
            f"({exc!r}); falling back to a fresh write"
        )
        return False


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed corpus table; equi-joins on the bucket column
    skip the Exchange on this side."""
    return spark.table(table)
