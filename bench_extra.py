"""Supplementary benchmarks (round 7) — bench.py is FROZEN for driver
measurement, so the extra lanes the r6 verdict asked for live here:

- ``headline_noop``  — per-query noop-sink isolation (guide §1.4),
  min-of-N per query in ONE warmed session: times the computation, not
  the sink or the per-session JIT cold start.
- ``skew_paired``    — the dedup skew-stress ratio re-measured with the
  calmest-of-3 PAIRED discipline (uniform and skewed runs back-to-back
  as a pair; lowest combined wall time wins) plus the same-run CPU/mem
  calibration printed beside it (r6 verdict item 4).
- ``funnel_counts``  — the composed clean_job funnel at 200k docs with
  per-stage counts ON vs OFF (--no-stage-counts): the count-barrier
  overhead, measured (r6 verdict item 5).
- ``align``          — the ``-align`` Arrow DP stage at bench scale:
  synthetic genomes → kperm index → probe → top-k → both-strand
  semi-global alignment; reads/sec recorded (r6 verdict item 6).

Usage: ``python bench_extra.py [lane ...]`` (default: all).  Prints one
JSON line per lane.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf type hints resolve here)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # frozen harness — reused for corpus + dedup runners
import __spark_entry__ as entry_mod
from metacache_mpi_spark.session import get_spark

CORES = 16


def lane_headline_noop(reps: int = 3) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(cpus, app_name="bench-extra-noop")
    bench._warm_udf_pool(spark, int(cpus))
    qs = entry_mod.queries()
    qs["pipeline_lsh_pairs"] = entry_mod._q_pipeline_lsh_pairs_kperm
    out: dict[str, float] = {}
    for name in bench.HEADLINE + bench.EXTRA_QUERIES:
        best = None
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    spark.stop()
    return {
        "metric": "headline_noop_isolated",
        "unit": "sec",
        "reps": reps,
        "queries": out,
        "total_min": round(sum(out[q] for q in bench.HEADLINE), 3),
        "sf": os.path.basename(sf_dir.rstrip("/")),
    }


def lane_skew_paired(pairs: int = 3) -> dict:
    from metacache_mpi_spark.config import DedupConfig
    from metacache_mpi_spark.sources.pages import write_corpus

    small = bench.SMALL_PAGES
    uni_dir = f"/tmp/bench_corpus_{small}"
    skew_dir = f"/tmp/bench_corpus_skew_{small}"
    if not os.path.exists(f"{uni_dir}/pages.parquet"):
        write_corpus(uni_dir, n_pages=small, seed=42)
    if not os.path.exists(f"{skew_dir}/pages.parquet"):
        write_corpus(skew_dir, n_pages=small, seed=42, hot_frac=0.1)
    star = DedupConfig(oversize_policy="star")
    best = None
    for _ in range(pairs):
        tu = bench.run_dedup_at(uni_dir, CORES, cfg=star)
        ts = bench.run_dedup_at(skew_dir, CORES, cfg=star)
        if best is None or tu + ts < sum(best):
            best = (tu, ts)
    tu, ts = best
    return {
        "metric": "dedup_skew_stress_paired",
        "docs": small,
        "hot_docs": small // 10,
        "cores": CORES,
        "oversize_policy": "star",
        "pairs": pairs,
        "sec_uniform": round(tu, 2),
        "sec_skewed": round(ts, 2),
        "skew_ratio": round(ts / tu, 3),
        "vm_calibration": bench.vm_calibration(),
    }


def lane_funnel_counts() -> dict:
    import argparse
    import importlib.util

    from metacache_mpi_spark.sources.pages import write_corpus

    n = bench.SCALING_PAGES
    corpus = f"/tmp/bench_corpus_{n}"
    if not os.path.exists(f"{corpus}/pages.parquet"):
        write_corpus(corpus, n_pages=n, seed=42)
    emb = f"/tmp/bench_funnel_emb_{n}.parquet"
    bench._write_funnel_embeddings(corpus, emb)
    spec = importlib.util.spec_from_file_location(
        "clean_job",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "scripts", "clean_job.py",
        ),
    )
    clean_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(clean_job)

    def one(no_counts: bool) -> tuple[float, dict]:
        spark = get_spark(CORES, app_name="bench-extra-funnel",
                          shuffle_partitions=2 * CORES)
        bench._warm_udf_pool(spark, 2 * CORES)
        ns = argparse.Namespace(
            input=corpus, output="/tmp/bench_extra_funnel_out",
            generate=0, cores=None, bucketed_warehouse=None,
            eval_docs=None, embeddings=emb, eval_embeddings=None,
            semantic_tau=0.9, semdedup_tau=950_000,
            semdedup_centroids=max(16, n // 200),
            strip_spans=8, max_oov_milli=0, strip_repeated_lines=True,
            scrub_pii=True, oversize_policy="star", decontam_bloom=False,
            max_per_host=0, keep="min_id", no_stage_counts=no_counts,
        )
        t0 = time.time()
        counts = clean_job.run(spark, ns)
        dt = time.time() - t0
        spark.stop()
        return dt, counts

    t_on, c_on = one(False)
    t_off, c_off = one(True)
    return {
        "metric": "clean_funnel_stage_counts_ab",
        "docs": n,
        "cores": CORES,
        "sec_counts_on": round(t_on, 2),
        "sec_counts_off": round(t_off, 2),
        "count_barrier_overhead_pct": round(100 * (t_on - t_off) / t_on, 1),
        "clean_on": c_on.get("clean"),
        "clean_off": c_off.get("clean"),
        "stage_sec": c_on.get("stage_sec"),
    }


def lane_align(n_targets: int = 100, tgt_len: int = 10_000,
               n_reads: int = 5_000, read_len: int = 140) -> dict:
    import numpy as np
    from pyspark.sql import functions as F  # noqa: F401

    from metacache_mpi_spark.operators.alignment import (
        align_top_candidates,
    )
    from metacache_mpi_spark.operators.genomic import (
        GenomicConfig,
        build_index,
        query_index,
    )

    spark = get_spark(CORES, app_name="bench-extra-align",
                      shuffle_partitions=2 * CORES)
    bench._warm_udf_pool(spark, 2 * CORES)
    rng = np.random.RandomState(7)
    lut = np.array(list("ACGT"))
    genomes = [
        (t, "".join(lut[rng.randint(0, 4, size=tgt_len)]))
        for t in range(n_targets)
    ]
    reads = []
    for qid in range(n_reads):
        t = qid % n_targets
        s = int(rng.randint(0, tgt_len - read_len))
        reads.append((qid, genomes[t][1][s : s + read_len]))
    cfg = GenomicConfig()
    tdf = spark.createDataFrame(genomes, "tgt long, seq string")
    qdf = spark.createDataFrame(
        reads, "qid long, seq string"
    ).repartition(2 * CORES)
    index = build_index(tdf, cfg).persist()
    index.count()  # index build outside the timed probe+align window
    t0 = time.time()
    cands = query_index(qdf, index, cfg)
    aligned = align_top_candidates(
        cands, qdf.select("qid", F.col("seq").alias("seq1")),
        tdf.select("tgt", "seq"), cfg,
    )
    n_aligned = aligned.count()
    dt = time.time() - t0
    score_sum = int(aligned.agg(F.sum("align_score")).first()[0] or 0)
    spark.stop()
    return {
        "metric": "align_top_candidates",
        "targets": n_targets,
        "target_len": tgt_len,
        "reads": n_reads,
        "cores": CORES,
        "aligned": n_aligned,
        "align_score_sum": score_sum,
        "sec_probe_plus_align": round(dt, 2),
        "reads_per_sec": round(n_reads / dt, 1),
    }


LANES = {
    "headline_noop": lane_headline_noop,
    "skew_paired": lane_skew_paired,
    "funnel_counts": lane_funnel_counts,
    "align": lane_align,
}


def main() -> None:
    names = sys.argv[1:] or list(LANES)
    for name in names:
        print(json.dumps({"lane": name, **LANES[name]()}), flush=True)


if __name__ == "__main__":
    main()
