"""Streaming-shaped entry point: fold ONE batch of pages into the
persistent dedup state (the reference's resident-index REPL loop,
/root/reference/src/mode_query.cpp:269-315, as a re-runnable job).

Each invocation processes ``--input`` as one batch against the state
in ``--state``: new docs are sketched, probed against the resident
band index, verified, and clustered — connected components re-run ONLY
over the components the batch touched (streaming/incremental.py).
Re-running with the same input is a no-op (urls already ingested are
skipped).  State compacts automatically every ``--compact-every``
batches (LSM cadence)::

    zip -qr /tmp/mcs.zip metacache_mpi_spark
    spark-submit --master <master> --py-files /tmp/mcs.zip \
        scripts/incremental_job.py --input <batch_dir> --state <state_dir> \
        [--generate N --seed S] [--out <clusters_dir>]

Prints ONE JSON line: batch number, new docs, CC edge count (new +
touched-component stars — the ∝-affected-subgraph metric), totals.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--generate", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--compact-every", type=int, default=8)
    ap.add_argument("--cores", default=None)
    ap.add_argument(
        "--oversize-policy",
        choices=("drop", "sample", "star"),
        default="drop",
        help="over-cap LSH buckets: drop / sample / star hub edges "
        "(mega-cluster-safe, config.py)",
    )
    ap.add_argument(
        "--gc",
        action="store_true",
        help="after the batch (and any compaction), reclaim superseded "
        "state storage — pre-base deltas and old compacted bases "
        "(streaming/incremental.py::gc; resume-safe)",
    )
    ap.add_argument(
        "--topk",
        type=int,
        default=1,
        help="with --query: ranked candidate list size per query doc "
        "(>1 adds a rank column to --out; the printed kind counts "
        "always count query DOCS via their best match)",
    )
    ap.add_argument(
        "--query",
        action="store_true",
        help="READ-ONLY probe: classify the batch against the current "
        "state (url / content / none per page) without folding it in — "
        "the reference's query mode vs modify "
        "(streaming/incremental.py::query_batch)",
    )
    args = ap.parse_args()

    from dataclasses import replace

    from metacache_mpi_spark.config import DEFAULT_CONFIG
    from metacache_mpi_spark.plans.checkpoint import CheckpointManager
    from metacache_mpi_spark.session import get_spark
    from metacache_mpi_spark.sources.pages import load_pages, write_corpus
    from metacache_mpi_spark.streaming.incremental import IncrementalDedup

    if args.generate:
        write_corpus(args.input, n_pages=args.generate, seed=args.seed)

    spark = get_spark(args.cores, app_name="incremental-dedup")
    t0 = time.time()
    inc = IncrementalDedup(
        spark,
        CheckpointManager(spark, args.state),
        replace(DEFAULT_CONFIG, oversize_policy=args.oversize_policy),
        compact_every=args.compact_every,
    )
    if args.query:
        from pyspark.sql import functions as F

        res = inc.query_batch(load_pages(spark, args.input), topk=args.topk)
        if args.out:
            res.write.mode("overwrite").parquet(args.out)
            res = spark.read.parquet(args.out)
        # counts are per query DOC (best match), not per ranked row
        per_doc = (
            res.where((F.col("rank") == 1) | F.col("rank").isNull())
            if args.topk > 1
            else res
        )
        kinds = {
            r["match_kind"]: r["n"]
            for r in per_doc.groupBy("match_kind")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        print(
            json.dumps(
                {
                    "mode": "query",
                    "queries": sum(kinds.values()),
                    "matched_url": kinds.get("url", 0),
                    "matched_content": kinds.get("content", 0),
                    "novel": kinds.get("none", 0),
                    "sec": round(time.time() - t0, 2),
                }
            )
        )
        spark.stop()
        return

    batch_no = inc.batch_no
    clusters = inc.process_batch(load_pages(spark, args.input))
    if args.out:
        clusters.write.mode("overwrite").parquet(args.out)
    total_docs = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    new_docs = inc.ck.load(f"docs_b{batch_no}").count()
    n_gc = len(inc.gc()) if args.gc else None
    print(
        json.dumps(
            {
                "batch": batch_no,
                "new_docs": new_docs,
                "cc_edges": inc.last_cc_edges,
                "total_docs": total_docs,
                "clusters": n_clusters,
                "gc_removed": n_gc,
                "sec": round(time.time() - t0, 2),
                # per-partition lineage for THIS batch's snapshots only
                # (the state dir accumulates every prior batch's deltas)
                "lineage": [
                    r
                    for r in inc.ck.lineage_report()
                    if r["name"].endswith(f"_b{batch_no}")
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
