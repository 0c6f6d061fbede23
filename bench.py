"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": "...",
     "dedup_scaling": {"docs": N, "docs_per_sec_low": ..,
                       "docs_per_sec_high": .., "cores_low": 8,
                       "cores_high": 32, "efficiency": ..}}

``dedup_scaling`` is the sandbox proxy for the N→4N-executor scaling
criterion (BASELINE.md): the identical dedup pipeline over the same
generated pages corpus at two local parallelism levels; efficiency =
(T_low / T_high) / (cores_high / cores_low) on a throughput basis.
Disable with SPARK_GRAFT_SCALING=0 for quick runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from metacache_mpi_spark.session import get_spark

HEADLINE = [
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "simhash_fingerprints",
    "winnow_fingerprint_stats",
    "tpch_q1",
    "top_users_per_event_type",
    "contiguous_range_hits",
    "ann_cosine_topk",
    "pipeline_lsh_pairs",
]

SCALING_PAGES = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "50000"))
SKETCH_REPLICATE = 4  # sketch-scaling input = SCALING_PAGES × this
# N → 4N window: 4 → 16. At local[32] the JVM's 32 task threads PLUS 32
# Python UDF workers oversubscribe the VM's 32 shared vCPUs (measured
# 3× per-item slowdown in Python stages), so 8→32 measures contention,
# not the engine. 4→16 keeps both levels under-subscribed; the
# hardware-calibration section of BASELINE.md quantifies the VM ceiling.
CORES_LOW, CORES_HIGH = 4, 16


def run_headline(sf_dir: str, cpus: str) -> tuple[float, dict[str, float]]:
    spark = get_spark(cpus, app_name="bench")
    qs = entry_mod.queries()
    per: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        per[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)
    spark.stop()
    return total, per


def run_dedup_at(corpus_dir: str, cores: int) -> float:
    """One full dedup pipeline over the corpus; returns wall seconds.
    JVM warmup happens outside the timed window (cluster start time is
    not throughput)."""
    from metacache_mpi_spark.plans.pipeline import dedup_pipeline
    from metacache_mpi_spark.sources.pages import load_pages

    spark = get_spark(cores, app_name=f"bench-dedup-{cores}",
                      shuffle_partitions=2 * cores)
    spark.range(1000).count()
    t0 = time.time()
    res = dedup_pipeline(load_pages(spark, corpus_dir))
    res.clusters.count()
    dt = time.time() - t0
    spark.stop()
    return dt


def run_sketch_at(corpus_dir: str, cores: int) -> tuple[float, int]:
    """Compute-isolated scaling: ONE mapInPandas job sketching the
    corpus replicated ×SKETCH_REPLICATE (distinct doc ids).  Separates
    the engine's compute scaling from fixed per-job scheduler latency —
    the complement to the full-job number above."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.config import DEFAULT_CONFIG
    from metacache_mpi_spark.functions.sketch import (
        SKETCH_SCHEMA,
        make_sketch_mapper,
    )
    from metacache_mpi_spark.sources.pages import load_pages

    spark = get_spark(cores, app_name=f"bench-sketch-{cores}",
                      shuffle_partitions=2 * cores)
    docs = (
        load_pages(spark, corpus_dir)
        .select("doc_id", "text")
        .crossJoin(spark.range(SKETCH_REPLICATE).select(F.col("id").alias("rep")))
        .select((F.col("doc_id") + F.col("rep")).alias("doc_id"), "text")
        .repartition(4 * cores)
        .localCheckpoint(eager=True)
    )
    n = docs.count()
    cfg = DEFAULT_CONFIG
    mapper = make_sketch_mapper(
        cfg.shingle_k, cfg.sketch_size, cfg.minhash_seed, cfg.winnow_w
    )
    t0 = time.time()
    docs.mapInPandas(mapper, schema=SKETCH_SCHEMA).select(
        F.count("simhash")
    ).collect()
    dt = time.time() - t0
    spark.stop()
    return dt, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    total, per = run_headline(sf_dir, cpus)
    out = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per,
        "sf": os.path.basename(sf_dir.rstrip("/")),
    }

    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        from metacache_mpi_spark.sources.pages import write_corpus

        corpus_dir = f"/tmp/bench_corpus_{SCALING_PAGES}"
        if not os.path.exists(f"{corpus_dir}/pages.parquet"):
            write_corpus(corpus_dir, n_pages=SCALING_PAGES, seed=42)

        # min-of-2: single-JVM local mode shows ±40% run-to-run noise
        # (GC + AQE interactions); min is the standard noise suppressor
        t_low = min(run_dedup_at(corpus_dir, CORES_LOW) for _ in range(2))
        t_high = min(run_dedup_at(corpus_dir, CORES_HIGH) for _ in range(2))
        thr_low = SCALING_PAGES / t_low
        thr_high = SCALING_PAGES / t_high
        out["dedup_scaling"] = {
            "docs": SCALING_PAGES,
            "cores_low": CORES_LOW,
            "cores_high": CORES_HIGH,
            "sec_low": round(t_low, 2),
            "sec_high": round(t_high, 2),
            "docs_per_sec_low": round(thr_low, 1),
            "docs_per_sec_high": round(thr_high, 1),
            "efficiency": round(
                (thr_high / thr_low) / (CORES_HIGH / CORES_LOW), 3
            ),
        }

        s_low, n_docs = min(
            (run_sketch_at(corpus_dir, CORES_LOW) for _ in range(2)),
            key=lambda t: t[0],
        )
        s_high, _ = min(
            (run_sketch_at(corpus_dir, CORES_HIGH) for _ in range(2)),
            key=lambda t: t[0],
        )
        out["sketch_scaling"] = {
            "docs": n_docs,
            "cores_low": CORES_LOW,
            "cores_high": CORES_HIGH,
            "sec_low": round(s_low, 2),
            "sec_high": round(s_high, 2),
            "docs_per_sec_low": round(n_docs / s_low, 1),
            "docs_per_sec_high": round(n_docs / s_high, 1),
            "efficiency": round(
                (s_low / s_high) / (CORES_HIGH / CORES_LOW), 3
            ),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
