"""Batched ANN retrieval as a deployment surface: build / query.

The embedding-lane analog of genomic_job's build/query split (the
reference builds a partition-resident index once and streams batched
queries against it, src/mode_build.cpp + src/querying.h:1309-1387)::

    zip -qr /tmp/mcs.zip metacache_mpi_spark
    spark-submit --master <master> --driver-memory 4g \
        --py-files /tmp/mcs.zip scripts/ann_job.py \
        build --embeddings emb.parquet --index /data/annidx \
        [--n-centroids 64 --pq-m 8 --pq-codes 16]
    ... modify --embeddings more.parquet --index /data/annidx
    ... query --index /data/annidx --queries q.parquet --k 10 \
        [--mode ivfpq|ivf|brute] [--nprobe 4] [--out outdir]

``build`` trains the IVF coarse quantizer and PQ codebooks on a
bounded driver sample, assigns + encodes the corpus in one pass, and
writes the index table **partitionBy(bucket)** with the trained
artifacts as .npy sidecars — the physical layout that turns a probe
into a PRUNED scan: ``query`` computes the union of every query's
nprobe buckets driver-side and filters the scan on the partition
column BEFORE any join, so only probed partitions are read
(plan-asserted in test_ann_job).  ``query`` loads the artifacts,
runs the batched lane (ivf_pq / ivf / brute — recall rises, cost
rises), and writes (query_id, vec_id, cos_micro, rank).  One JSON
count line per mode.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def cmd_build(spark, args) -> dict:
    import numpy as np

    from metacache_mpi_spark.operators.ann import (
        ivf_assign,
        pq_encode,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    emb = spark.read.parquet(args.embeddings).select("vec_id", "embedding")
    cents = train_ivf_centroids(emb, n_centroids=args.n_centroids)
    books = train_pq_codebooks(emb, m=args.pq_m, k=args.pq_codes)
    table = pq_encode(ivf_assign(emb, cents), books)
    os.makedirs(args.index, exist_ok=True)
    # bucket IS the partition column: the probed lists of a query
    # batch become a partition-pruned scan (the reference's
    # rank-partitioned hash table as a storage layout)
    table.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(args.index, "corpus.parquet")
    )
    np.save(os.path.join(args.index, "centroids.npy"), cents)
    np.save(os.path.join(args.index, "codebooks.npy"), books)
    with open(os.path.join(args.index, "meta.json"), "w") as fh:
        json.dump(
            {
                "n_centroids": int(np.asarray(cents).shape[0]),
                "pq_m": args.pq_m,
                "pq_codes": args.pq_codes,
            },
            fh,
        )
    back = spark.read.parquet(os.path.join(args.index, "corpus.parquet"))
    return {
        "mode": "build",
        "vectors": back.count(),
        "buckets": back.select("bucket").distinct().count(),
    }


def cmd_modify(spark, args) -> dict:
    """``modify``: fold NEW vectors into an existing index — the
    embedding-lane analog of genomic_job modify (the reference's
    main_mode_build_modify, src/main.cpp:72-73: extend an existing DB
    under the DB's OWN sketching params, never retrain).  New vectors
    are assigned + encoded with the STORED centroids/codebooks and
    appended as new files under their bucket partitions; vec_ids
    already present are skipped (anti-join), so re-running the same
    modify is a no-op.  Dimension mismatches raise, mirroring the
    reference's refusal to modify with mismatched params."""
    import numpy as np
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.ann import ivf_assign, pq_encode

    table, cents, books, meta = _load_index(spark, args.index)
    emb = spark.read.parquet(args.embeddings).select("vec_id", "embedding")
    first = emb.select(F.size("embedding").alias("d")).first()
    dim = int(np.asarray(cents).shape[1])
    if first is not None and first["d"] != dim:
        raise ValueError(
            f"modify: embedding dim {first['d']} != index dim {dim} "
            "(the index's trained artifacts fix the dimensionality; "
            "rebuild instead)"
        )
    # skip ids the index already holds — modify is add-only, idempotent
    fresh = emb.join(
        table.select("vec_id"), "vec_id", "left_anti"
    )
    # materialize the delta BEFORE the append: its lineage reads the
    # sink path (the anti-join scans `table`), so force the compute
    # first rather than racing the write's own output files
    added_tbl = pq_encode(ivf_assign(fresh, cents), books).persist()
    n_added = added_tbl.count()
    added_tbl.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(args.index, "corpus.parquet")
    )
    added_tbl.unpersist()
    back = spark.read.parquet(os.path.join(args.index, "corpus.parquet"))
    return {
        "mode": "modify",
        "added": n_added,
        "skipped": emb.count() - n_added,
        "vectors": back.count(),
        "buckets": back.select("bucket").distinct().count(),
    }


def _load_index(spark, index):
    import numpy as np

    with open(os.path.join(index, "meta.json")) as fh:
        meta = json.load(fh)
    table = spark.read.parquet(os.path.join(index, "corpus.parquet"))
    cents = np.load(os.path.join(index, "centroids.npy"))
    books = np.load(os.path.join(index, "codebooks.npy"))
    # the sidecar records what the artifacts were trained as; a
    # mismatch means the index dir was assembled from different builds
    got = (int(cents.shape[0]), int(books.shape[0]), int(books.shape[1]))
    want = (meta["n_centroids"], meta["pq_m"], meta["pq_codes"])
    if got != want:
        raise ValueError(
            f"index artifacts disagree with meta.json: "
            f"(n_centroids, pq_m, pq_codes) = {got} vs meta {want}"
        )
    return table, cents, books, meta


def _union_probe_filter(table, queries, cents, nprobe):
    """Static partition pruning: the union of every query's nprobe
    nearest buckets is driver-known (nq × nprobe ints), so it pushes
    as a partition filter on the bucket-partitioned scan — partitions
    outside every query's probes are never read."""
    import numpy as np
    from pyspark.sql import functions as F

    c = np.asarray(cents, dtype=np.float64)
    raw = np.array(
        [r["embedding"] for r in queries.select("embedding").collect()],
        dtype=np.float64,
    )
    if raw.size == 0:
        return table.where(F.lit(False)), 0
    d = -2.0 * (raw @ c.T) + (c * c).sum(axis=1)[None, :]
    npb = min(nprobe, c.shape[0])
    union = sorted(
        {int(b) for row in np.argsort(d, axis=1)[:, :npb] for b in row}
    )
    return table.where(F.col("bucket").isin(union)), len(union)


def cmd_query(spark, args) -> dict:
    from metacache_mpi_spark.operators.ann import (
        cosine_batch_topk,
        ivf_batch_topk,
        ivf_pq_batch_topk,
    )

    table, cents, books, meta = _load_index(spark, args.index)
    queries = spark.read.parquet(args.queries)
    if "query_id" not in queries.columns:
        queries = queries.withColumnRenamed("vec_id", "query_id")
    queries = queries.select("query_id", "embedding")
    out = {"mode": "query", "lane": args.mode, "k": args.k}
    # external query batches have their OWN id namespace: a query_id
    # colliding with a corpus vec_id must not hide that vector.  Only
    # --self-retrieval (queries drawn from the index itself) excludes
    # self-matches.
    excl = getattr(args, "self_retrieval", False)
    if args.mode == "brute":
        res = cosine_batch_topk(
            table.select("vec_id", "embedding"),
            queries,
            k=args.k,
            exclude_self=excl,
        )
    else:
        pruned, n_buckets = _union_probe_filter(
            table, queries, cents, args.nprobe
        )
        out["probed_buckets"] = n_buckets
        if args.mode == "ivf":
            res = ivf_batch_topk(
                queries=queries,
                emb=pruned.select("vec_id", "embedding"),
                k=args.k,
                nprobe=args.nprobe,
                centroids=cents,
                assigned=pruned,
                exclude_self=excl,
            )
        else:  # ivfpq
            res = ivf_pq_batch_topk(
                pruned.select("vec_id", "embedding"),
                queries,
                k=args.k,
                nprobe=args.nprobe,
                centroids=cents,
                codebooks=books,
                encoded=pruned,
                exclude_self=excl,
            )
    if args.out:
        res.write.mode("overwrite").parquet(
            os.path.join(args.out, "topk.parquet")
        )
        res = spark.read.parquet(os.path.join(args.out, "topk.parquet"))
    out["queries"] = queries.count()
    out["result_rows"] = res.count()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--cores", default=None)
    sub = ap.add_subparsers(dest="mode_top", required=True)

    b = sub.add_parser("build", parents=[common])
    b.add_argument("--embeddings", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--n-centroids", type=int, default=64)
    b.add_argument("--pq-m", type=int, default=8)
    b.add_argument("--pq-codes", type=int, default=16)

    m = sub.add_parser("modify", parents=[common])
    m.add_argument("--embeddings", required=True)
    m.add_argument("--index", required=True)

    q = sub.add_parser("query", parents=[common])
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--nprobe", type=int, default=4)
    q.add_argument(
        "--mode", default="ivfpq", choices=["ivfpq", "ivf", "brute"]
    )
    q.add_argument(
        "--self-retrieval",
        action="store_true",
        help="queries are rows of the index itself: exclude the "
        "vec_id == query_id self-match (dedup-style retrieval)",
    )
    q.add_argument("--out", default=None)

    args = ap.parse_args()

    from metacache_mpi_spark.session import get_spark

    spark = get_spark(args.cores, app_name=f"ann-{args.mode_top}")
    t0 = time.time()
    result = {
        "build": cmd_build, "modify": cmd_modify, "query": cmd_query
    }[args.mode_top](spark, args)
    result["sec"] = round(time.time() - t0, 2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
