"""Production entry point: near-duplicate detection over a pages table.

Launch (the BASELINE.md deployment path)::

    zip -qr /tmp/mcs.zip metacache_mpi_spark
    spark-submit --master <master> --py-files /tmp/mcs.zip \
        scripts/dedup_job.py --input <corpus_dir> --checkpoints <ckpt_dir> \
        [--output <out_dir>] [--generate N]

``--input`` is a directory containing ``pages.parquet`` with columns
(url, warc_ts, html, text, lang) — Iceberg-shaped; the Parquet reader is
the sandbox fallback.  ``--generate N`` synthesizes a deterministic
N-page corpus there first (FIXTURES.md §1).  Re-running with the same
``--checkpoints`` dir resumes from the last committed snapshot.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--checkpoints", required=True)
    ap.add_argument("--output", default=None)
    ap.add_argument("--generate", type=int, default=0)
    ap.add_argument("--cores", default=None)
    ap.add_argument(
        "--canonicalize-urls",
        action="store_true",
        help="page identity = canonical URL; repeated crawls collapse "
        "to the newest warc_ts before sketching (operators/webops.py)",
    )
    ap.add_argument(
        "--bucketed-warehouse",
        default=None,
        help="write the sketch+text corpus state as a bucketBy(doc_id) "
        "catalog table under this dir; verify joins then read bucketed "
        "scans with no corpus-side shuffle (plans/bucketing.py)",
    )
    ap.add_argument(
        "--oversize-policy",
        choices=("drop", "sample", "star"),
        default="drop",
        help="LSH buckets larger than the cap: drop them (reference "
        "overpopulated-feature rule — loses mega-clusters), sample a "
        "capped subset, or star: linear hub edges keep mirror/spam "
        "mega-clusters clusterable at O(n) cost (config.py)",
    )
    ap.add_argument(
        "--truth-pairs",
        default=None,
        help="parquet of ground-truth duplicate pairs (a, b); when "
        "given, the RESULT line carries tp/fp/fn + micro "
        "precision/recall/f1 of the verified pairs against it — the "
        "north rule's dup-pair gate (operators/evaluate.py)",
    )
    args = ap.parse_args()

    from dataclasses import replace

    from metacache_mpi_spark.config import DEFAULT_CONFIG
    from metacache_mpi_spark.plans.checkpoint import CheckpointManager
    from metacache_mpi_spark.plans.pipeline import dedup_pipeline
    from metacache_mpi_spark.session import get_spark
    from metacache_mpi_spark.sources.pages import load_pages, write_corpus

    if args.generate:
        write_corpus(args.input, n_pages=args.generate, seed=42)

    spark = get_spark(args.cores, app_name="dedup-job")
    t0 = time.time()
    ck = CheckpointManager(spark, args.checkpoints)
    res = dedup_pipeline(
        load_pages(spark, args.input),
        replace(DEFAULT_CONFIG, oversize_policy=args.oversize_policy),
        checkpoints=ck,
        canonicalize_urls=args.canonicalize_urls,
        bucketed_warehouse=args.bucketed_warehouse,
    )
    # one row per surviving doc, served from the pipeline's own
    # snapshot/cache — res.docs would re-scan + re-dedup the corpus
    n_docs = res.signatures.count()
    n_pairs = res.pairs.count()
    if args.output:
        res.clusters.write.mode("overwrite").parquet(args.output)
    line = {
        "docs": n_docs,
        "verified_pairs": n_pairs,
    }
    if "warehouse" in res.metrics:
        # audit line: which bucketed sketch state served this run —
        # fingerprint + whether it was reused or freshly written
        line["warehouse"] = res.metrics["warehouse"]
    if args.truth_pairs:
        from metacache_mpi_spark.operators.evaluate import pair_set_metrics

        truth = spark.read.parquet(args.truth_pairs).select("a", "b")
        line["pair_metrics"] = (
            pair_set_metrics(res.pairs.select("a", "b"), truth)
            .first()
            .asDict()
        )
    dt = time.time() - t0
    line.update(
        {
            "docs_per_sec": round(n_docs / dt, 1),
            "sec": round(dt, 2),
            "snapshots": [s.name for s in ck.snapshots()],
            # per-snapshot partition-balance telemetry (skew_milli 1000
            # = balanced); reads the manifest only, no extra Spark jobs
            "lineage": ck.lineage_report(),
        }
    )
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
