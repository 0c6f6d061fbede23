"""SparkSession construction tuned for this engine.

Local-mode settings mirror what a 1000-executor cluster deployment would
set per-executor: AQE on (runtime skew-join splitting + coalescing),
Arrow enabled for pandas UDFs, UTC session timezone (oracle parity with
DuckDB), shuffle partitions sized to the parallelism level rather than
the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | str | None = None,
    app_name: str = "metacache-mpi-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` is an int (→ ``local[n]``), ``"*"``, or None (env
    ``SPARK_GRAFT_CPUS``, default ``*``).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    n = os.cpu_count() or 8 if cores == "*" else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * n, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime partition coalescing + skew-join splitting — the
        # backstop behind our explicit salting for skewed LSH buckets.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalesces post-shuffle partitions by BYTES; stages whose
        # cost is CPU-per-row (the Arrow sketch/verify UDFs read the
        # dedup shuffle directly) lose parallelism at the default 64 MB
        # advisory on text-heavy rows.  16 MB keeps those exchanges at
        # full width (measured 31.0→28.7 s full-job at 200k docs×16
        # cores; 8 MB over-fragments and regresses).
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Text-heavy rows decompress ~5-10× off parquet: the default
        # 128 MB split puts ~1 GB of in-flight rows per scan task and
        # under-parallelizes medium corpora.  32 MB keeps one task's
        # working set cache-friendly and gives the scan enough splits
        # that load-side repartition exchanges are unnecessary.
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        # Arrow transfer for pandas UDFs (the sketching hot path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # DuckDB oracle comparisons assume UTC-naive timestamps.
        .config("spark.sql.session.timeZone", "UTC")
        # Keep driver result transfer sane for collect-based tests.
        # local mode: the driver heap IS the executor heap — size it for
        # 32 concurrent tasks' shuffle+Arrow buffers or GC dominates.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
