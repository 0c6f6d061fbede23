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

import pandas as pd  # module-level: pandas_udf type hints resolve here

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

# timed the same way but NOT in the headline total (keeps the headline
# comparable across rounds; these landed after the baseline was set)
EXTRA_QUERIES = [
    "exact_substring_dedup",
    "semantic_dedup",
    "contamination_pairs",
    "contamination_pairs_bloom",  # identical result, map-side prefilter
]

SCALING_PAGES = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "200000"))
# smaller corpus for the marginal-throughput delta (cancels fixed
# latency: Δdocs/Δt is the 10^12-doc steady-state proxy) and for the
# sketch-scaling replicate base
SMALL_PAGES = int(os.environ.get("SPARK_GRAFT_SMALL_PAGES", "50000"))
SKETCH_REPLICATE = 4  # sketch-scaling input = SMALL_PAGES × this
# N → 4N window: 4 → 16. At local[32] the JVM's 32 task threads PLUS 32
# Python UDF workers oversubscribe the VM's 32 shared vCPUs (measured
# 3× per-item slowdown in Python stages), so 8→32 measures contention,
# not the engine. 4→16 keeps both levels under-subscribed; the
# hardware-calibration section of BASELINE.md quantifies the VM ceiling.
CORES_LOW, CORES_HIGH = 4, 16


def _warm_udf_pool(spark, n_parts: int) -> None:
    """Warm what is session startup, not query work: the Python-UDF
    worker pool (first pandas_udf job pays ~2-4 s of fork+import per
    core) and whole-stage-codegen compilation.  Without this the FIRST
    timed query absorbs the session's entire warmup and its number
    swings round-to-round (r1 10.7 s → r2 14.3 s, unchanged plan)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(10000).repartition(n_parts).select(
        F.sum(_warm(F.col("id")))
    ).collect()


def run_headline(sf_dir: str, cpus: str) -> tuple[float, dict[str, float]]:
    spark = get_spark(cpus, app_name="bench")
    _warm_udf_pool(spark, int(cpus))

    qs = entry_mod.queries()
    # the bench measures the PRODUCTION sketch lane; the same-named
    # contract entries run the md5 oracle mode for DuckDB gating
    qs["pipeline_lsh_pairs"] = entry_mod._q_pipeline_lsh_pairs_kperm
    # codegen warm pass (untimed): run each headline query once at
    # sf0.001 so whole-stage-codegen compilation doesn't land in the
    # FIRST timed slot — the same "session startup is not throughput"
    # rule as the UDF-pool warm above (minhash_lsh_pairs absorbed
    # 2-9 s of compile noise depending on the window).  Added round 4;
    # earlier rounds' first-slot numbers carry that noise.
    for name in HEADLINE + EXTRA_QUERIES:
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass  # warm-up must never fail the bench
    per: dict[str, float] = {}
    extra: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE + EXTRA_QUERIES:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        if name in EXTRA_QUERIES:
            extra[name] = round(dt, 3)
        else:
            per[name] = round(dt, 3)
            total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)
    spark.stop()
    return total, per, extra


def run_dedup_at(
    corpus_dir: str,
    cores: int,
    bucketed_warehouse: str | None = None,
    cfg=None,
) -> float:
    """One full dedup pipeline over the corpus; returns wall seconds.
    JVM startup AND the Python-UDF worker pool are warmed outside the
    timed window (cluster/worker start time is not throughput)."""
    from metacache_mpi_spark.plans.pipeline import dedup_pipeline
    from metacache_mpi_spark.sources.pages import load_pages

    spark = get_spark(cores, app_name=f"bench-dedup-{cores}",
                      shuffle_partitions=2 * cores)
    _warm_udf_pool(spark, 2 * cores)
    from metacache_mpi_spark.config import DEFAULT_CONFIG

    t0 = time.time()
    res = dedup_pipeline(
        load_pages(spark, corpus_dir),
        cfg if cfg is not None else DEFAULT_CONFIG,
        bucketed_warehouse=bucketed_warehouse,
    )
    res.clusters.count()
    dt = time.time() - t0
    spark.stop()
    return dt


def _write_funnel_embeddings(
    corpus_dir: str, emb_path: str, dims: int = 16
) -> None:
    """Deterministic per-doc embeddings for the funnel's SemDeDup
    stage (each vector seeded from its doc_id, written once) — random
    vectors exercise the full cluster/pair/prune machinery without
    changing the survivor set.  doc_id = xxhash64(url) exists only
    after load_pages, so this runs as one tiny Spark job."""
    import numpy as np

    from metacache_mpi_spark.sources.pages import load_pages

    # _SUCCESS marker, not bare existence: a crashed first write would
    # otherwise permanently poison every later run with a truncated
    # embedding set (missing rows bypass SemDeDup via the anti-join)
    if os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        return
    spark = get_spark(8, app_name="bench-funnel-emb")

    def _gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            # seed from the FULL 64-bit doc_id: a 31-bit truncation
            # collides ~9 id pairs at 200k docs into byte-identical
            # vectors, which SemDeDup then removes (cosine exactly 1)
            # — violating the no-survivor-change contract above
            vecs = [
                np.random.default_rng(
                    np.random.SeedSequence(int(i) & (2**64 - 1))
                ).standard_normal(dims).tolist()
                for i in ids
            ]
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    load_pages(spark, corpus_dir).select("doc_id").mapInPandas(
        _gen, "vec_id long, embedding array<double>"
    ).write.mode("overwrite").parquet(emb_path)
    spark.stop()


def run_funnel_at(
    corpus_dir: str, emb_path: str, cores: int, n_pages: int
) -> float:
    """One composed cleanup funnel — the pipeline shape a user actually
    deploys (clean_job: url-dedup → intra-doc line dedup → boilerplate
    → quality gates → PII scrub → ExactSubstr span strip → near-dup
    dedup under the star oversize policy → SemDeDup) — at one
    parallelism level; returns wall seconds.  JVM + Python-UDF pool
    warmed outside the timed window, SemDeDup centroid count sized to
    keep per-cluster work bounded (the paper's own cost knob)."""
    import argparse
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "clean_job",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "scripts",
            "clean_job.py",
        ),
    )
    clean_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(clean_job)

    spark = get_spark(cores, app_name=f"bench-funnel-{cores}",
                      shuffle_partitions=2 * cores)
    _warm_udf_pool(spark, 2 * cores)
    ns = argparse.Namespace(
        input=corpus_dir, output=f"/tmp/bench_funnel_out_{cores}",
        generate=0, cores=None, bucketed_warehouse=None,
        eval_docs=None, embeddings=emb_path, eval_embeddings=None,
        semantic_tau=0.9, semdedup_tau=950_000,
        semdedup_centroids=max(16, n_pages // 200),
        strip_spans=8, max_oov_milli=0, strip_repeated_lines=True,
        scrub_pii=True, oversize_policy="star", decontam_bloom=False,
        max_per_host=0, keep="min_id",
    )
    t0 = time.time()
    clean_job.run(spark, ns)
    dt = time.time() - t0
    spark.stop()
    return dt


# --------------------------------------------------------------------------
# same-run VM calibration (the hardware ceiling the efficiencies compare to)
# --------------------------------------------------------------------------


def _calib_cpu_kernel(n_iter: int) -> int:
    """Cache-resident hash/sort kernel — scales with available CPUs."""
    import numpy as np

    rng = np.random.RandomState(0)
    a = rng.randint(0, 2**31, size=50_000).astype(np.uint64)
    t = 0
    for _ in range(n_iter):
        h = (a ^ (a >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        t += int(np.sort(h % np.uint64(1 << 32))[0])
    return t


def _calib_mem_kernel(n_iter: int) -> int:
    """Random-access memory-bound kernel — the shuffle/hash-join analog;
    on a shared host this is the binding ceiling for Spark's exchange
    stages (hash tables don't fit in cache)."""
    import numpy as np

    rng = np.random.RandomState(1)
    a = rng.randint(0, 2**31, size=4_000_000).astype(np.uint64)
    idx = rng.randint(0, a.size, size=a.size)
    t = 0
    for _ in range(n_iter):
        t += int(a[idx][::997].sum())
    return t


def _calib_throughput(kernel, procs: int, n_iter: int) -> float:
    import multiprocessing as mp

    with mp.get_context("fork").Pool(procs) as p:
        t0 = time.time()
        p.map(kernel, [n_iter] * procs)
        dt = time.time() - t0
    return procs * n_iter / dt


def vm_calibration() -> dict:
    """Measured N→4N scaling of this VM for the two workload classes the
    engine mixes: cache-resident compute (sketch UDFs) and random-access
    memory traffic (shuffle hash aggs/joins).  The dedup job's scaling
    efficiency is bounded by a mix of these ceilings — they are measured
    IN THE SAME RUN so the bench reports its own hardware context."""
    out = {}
    for name, kernel, n_iter in (
        ("cpu", _calib_cpu_kernel, 200),
        ("mem", _calib_mem_kernel, 8),
    ):
        # paired + best-of-2 for the same reason as the dedup runs:
        # external host load swings faster than a measurement
        best = None
        for _ in range(2):
            lo = _calib_throughput(kernel, CORES_LOW, n_iter)
            hi = _calib_throughput(kernel, CORES_HIGH, n_iter)
            eff = (hi / lo) / (CORES_HIGH / CORES_LOW)
            # cap at 1: super-linear readings are load artifacts
            best = max(best or 0.0, min(1.0, eff))
        out[f"{name}_eff"] = round(best, 3)
    return out


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

    total, per, extra = run_headline(sf_dir, cpus)
    out = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per,
        "extra_queries": extra,
        "sf": os.path.basename(sf_dir.rstrip("/")),
    }

    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        from metacache_mpi_spark.sources.pages import write_corpus

        corpus_dir = f"/tmp/bench_corpus_{SCALING_PAGES}"
        if not os.path.exists(f"{corpus_dir}/pages.parquet"):
            write_corpus(corpus_dir, n_pages=SCALING_PAGES, seed=42)
        small_dir = f"/tmp/bench_corpus_{SMALL_PAGES}"
        if not os.path.exists(f"{small_dir}/pages.parquet"):
            write_corpus(small_dir, n_pages=SMALL_PAGES, seed=42)

        # Shared-host load varies by MINUTES (observed 2-4× swings), so
        # the low/high measurements of one comparison are taken
        # back-to-back as a PAIR and the calmest pair (lowest combined
        # wall time) wins — min-of-independent-runs can pair a calm
        # 4-core window with a stormy 16-core one and report nonsense
        # (a measured "16 slower than 4").  Three pairs by default:
        # with two, one stormy window contaminates half the sample
        # (round-3 measured the same code at 0.45 and 0.70 efficiency
        # an hour apart).
        reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))

        def paired_runs(corpus: str, n: int = reps) -> tuple[float, float]:
            pairs = []
            for _ in range(n):
                tl = run_dedup_at(corpus, CORES_LOW)
                th = run_dedup_at(corpus, CORES_HIGH)
                pairs.append((tl, th))
            return min(pairs, key=sum)

        t_low, t_high = paired_runs(corpus_dir)
        ts_low, ts_high = paired_runs(small_dir, n=max(2, reps - 1))
        thr_low = SCALING_PAGES / t_low
        thr_high = SCALING_PAGES / t_high
        eff = (thr_high / thr_low) / (CORES_HIGH / CORES_LOW)
        calib = vm_calibration()
        # the job mixes cache-resident UDF compute with random-access
        # shuffle stages; its ceiling on THIS host is bounded by the two
        # measured kernel ceilings (mem is binding for exchange stages)
        out["vm_calibration"] = calib
        out["dedup_scaling"] = {
            "docs": SCALING_PAGES,
            "cores_low": CORES_LOW,
            "cores_high": CORES_HIGH,
            "sec_low": round(t_low, 2),
            "sec_high": round(t_high, 2),
            "docs_per_sec_low": round(thr_low, 1),
            "docs_per_sec_high": round(thr_high, 1),
            "efficiency": round(eff, 3),
            "efficiency_vs_mem_ceiling": round(
                min(1.0, eff / calib["mem_eff"]) if calib["mem_eff"] else 0.0,
                3,
            ),
        }
        # steady-state proxy: marginal throughput between the two corpus
        # sizes cancels every fixed per-job cost — what remains is the
        # size-proportional work, the only component that exists at
        # 10^12-doc scale
        d_docs = SCALING_PAGES - SMALL_PAGES
        dt_low, dt_high = t_low - ts_low, t_high - ts_high
        if dt_low > 2.0 and dt_high > 2.0:
            m_low, m_high = d_docs / dt_low, d_docs / dt_high
            out["dedup_marginal_scaling"] = {
                "docs_delta": d_docs,
                "marginal_docs_per_sec_low": round(m_low, 1),
                "marginal_docs_per_sec_high": round(m_high, 1),
                "efficiency": round(
                    (m_high / m_low) / (CORES_HIGH / CORES_LOW), 3
                ),
            }
        else:
            # the two corpus sizes were measured in incompatible load
            # windows (small ran slower than large) — flag, don't emit
            # a nonsense division
            out["dedup_marginal_scaling"] = {
                "docs_delta": d_docs,
                "invalid_window": True,
            }

        # capacity + scaling datapoint at 500k pages (fixed per-job
        # latency is ~15% of the 200k run at 16 cores; at 500k the raw
        # pair sits closer to the marginal efficiency) and the bucketed-
        # warehouse variant of the same run — the deployment shape whose
        # verify joins read the corpus with zero exchanges.  ONE pair
        # (no reps): ~6 min of bench budget.
        if os.environ.get("SPARK_GRAFT_SCALING_500K", "1") != "0":
            import shutil

            big_pages = int(
                os.environ.get("SPARK_GRAFT_BIG_PAGES", "500000")
            )
            big_dir = f"/tmp/bench_corpus_{big_pages}"
            if not os.path.exists(f"{big_dir}/pages.parquet"):
                write_corpus(big_dir, n_pages=big_pages, seed=42)
            tb_low = run_dedup_at(big_dir, CORES_LOW)
            tb_high = run_dedup_at(big_dir, CORES_HIGH)
            eff500 = (tb_low / tb_high) / (CORES_HIGH / CORES_LOW)
            out["dedup_scaling_500k"] = {
                "docs": big_pages,
                "cores_low": CORES_LOW,
                "cores_high": CORES_HIGH,
                "sec_low": round(tb_low, 2),
                "sec_high": round(tb_high, 2),
                "docs_per_sec_low": round(big_pages / tb_low, 1),
                "docs_per_sec_high": round(big_pages / tb_high, 1),
                "efficiency": round(eff500, 3),
            }
            # PRIMARY scaling number (r4 verdict): the bucketed
            # warehouse is the deployment shape, so the 4→16 pair is
            # measured bucketed at BOTH levels — full job including the
            # one-time bucketed write, fresh warehouse per run so the
            # two levels do identical work.  Back-to-back pairs with
            # the calmest pair winning (lowest combined wall time) —
            # the same load-window discipline as the 200k runs: one
            # stormy window on a shared host otherwise swings the
            # headline criterion by ±0.2.
            reps500 = max(
                1, int(os.environ.get("SPARK_GRAFT_500K_REPS", "2"))
            )
            best_pair = None
            for _ in range(reps500):
                tbk = {}
                for cores in (CORES_LOW, CORES_HIGH):
                    wh = f"/tmp/bench_bucketed_wh_{cores}"
                    shutil.rmtree(wh, ignore_errors=True)
                    tbk[cores] = run_dedup_at(
                        big_dir, cores, bucketed_warehouse=wh
                    )
                if best_pair is None or sum(tbk.values()) < sum(
                    best_pair.values()
                ):
                    best_pair = tbk
            tbk = best_pair
            effb = (tbk[CORES_LOW] / tbk[CORES_HIGH]) / (
                CORES_HIGH / CORES_LOW
            )
            out["dedup_scaling_500k_bucketed"] = {
                "docs": big_pages,
                "cores_low": CORES_LOW,
                "cores_high": CORES_HIGH,
                "sec_low": round(tbk[CORES_LOW], 2),
                "sec_high": round(tbk[CORES_HIGH], 2),
                "docs_per_sec_low": round(big_pages / tbk[CORES_LOW], 1),
                "docs_per_sec_high": round(big_pages / tbk[CORES_HIGH], 1),
                "efficiency": round(effb, 3),
            }
            # continuity with the r4 metric (bucketed vs plain at high
            # cores)
            out["dedup_500k_bucketed"] = {
                "docs": big_pages,
                "cores": CORES_HIGH,
                "sec": round(tbk[CORES_HIGH], 2),
                "docs_per_sec": round(big_pages / tbk[CORES_HIGH], 1),
                "plain_sec_same_cores": round(tb_high, 2),
            }

        # composed-funnel scaling (r5 verdict item 5): the FULL
        # clean_job funnel — line-dedup, boilerplate, quality, PII,
        # span-strip, near-dup, SemDeDup — timed at both parallelism
        # levels.  This is the shape a user actually runs; the per-
        # stage lanes above only time the dedup core.  Back-to-back
        # pairs, calmest pair wins (same load-window discipline).
        if os.environ.get("SPARK_GRAFT_FUNNEL", "1") != "0":
            funnel_pages = int(
                os.environ.get(
                    "SPARK_GRAFT_FUNNEL_PAGES", str(SCALING_PAGES)
                )
            )
            funnel_dir = f"/tmp/bench_corpus_{funnel_pages}"
            if not os.path.exists(f"{funnel_dir}/pages.parquet"):
                write_corpus(funnel_dir, n_pages=funnel_pages, seed=42)
            emb_path = f"/tmp/bench_funnel_emb_{funnel_pages}.parquet"
            _write_funnel_embeddings(funnel_dir, emb_path)
            repsf = max(
                1, int(os.environ.get("SPARK_GRAFT_FUNNEL_REPS", "1"))
            )
            bestf = None
            for _ in range(repsf):
                fl = run_funnel_at(
                    funnel_dir, emb_path, CORES_LOW, funnel_pages
                )
                fh = run_funnel_at(
                    funnel_dir, emb_path, CORES_HIGH, funnel_pages
                )
                if bestf is None or fl + fh < sum(bestf):
                    bestf = (fl, fh)
            fl, fh = bestf
            out["clean_funnel_scaling"] = {
                "docs": funnel_pages,
                "stages": [
                    "url_dedup", "line_dedup", "boilerplate", "quality",
                    "pii_scrub", "span_strip", "neardup_dedup_star",
                    "semdedup",
                ],
                "cores_low": CORES_LOW,
                "cores_high": CORES_HIGH,
                "sec_low": round(fl, 2),
                "sec_high": round(fh, 2),
                "docs_per_sec_low": round(funnel_pages / fl, 1),
                "docs_per_sec_high": round(funnel_pages / fh, 1),
                "efficiency": round(
                    (fl / fh) / (CORES_HIGH / CORES_LOW), 3
                ),
            }

        s_low, n_docs = min(
            (run_sketch_at(small_dir, CORES_LOW) for _ in range(2)),
            key=lambda t: t[0],
        )
        s_high, _ = min(
            (run_sketch_at(small_dir, CORES_HIGH) for _ in range(2)),
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

        # skew stress: the same pipeline over a corpus where 10% of the
        # docs are ONE near-identical mega-cluster (mirrored-page spam),
        # run under oversize_policy="star" — hot band buckets hold ~5k
        # docs vs cap 254, so without the linear hub-edge guard this is
        # 12M-pair quadratic work in single tasks.  The reported ratio
        # vs the uniform corpus at the same core count is the evidence
        # that hot keys cost O(n), not O(n²), at any scale.
        if os.environ.get("SPARK_GRAFT_SKEW", "1") != "0":
            from metacache_mpi_spark.config import DedupConfig

            skew_dir = f"/tmp/bench_corpus_skew_{SMALL_PAGES}"
            if not os.path.exists(f"{skew_dir}/pages.parquet"):
                write_corpus(
                    skew_dir, n_pages=SMALL_PAGES, seed=42, hot_frac=0.1
                )
            star_cfg = DedupConfig(oversize_policy="star")
            t_uni = run_dedup_at(small_dir, CORES_HIGH, cfg=star_cfg)
            t_skew = run_dedup_at(skew_dir, CORES_HIGH, cfg=star_cfg)
            out["dedup_skew_stress"] = {
                "docs": SMALL_PAGES,
                "hot_docs": SMALL_PAGES // 10,
                "cores": CORES_HIGH,
                "oversize_policy": "star",
                "sec_uniform": round(t_uni, 2),
                "sec_skewed": round(t_skew, 2),
                "skew_ratio": round(t_skew / t_uni, 3),
            }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
