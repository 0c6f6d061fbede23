"""Training-corpus assembly: clean corpus → mixed, split, packed output.

The stage AFTER cleanup/dedup in a pretraining pipeline: decide WHICH
documents enter the corpus (per-source mixture), HOW OFTEN (repeat
factors), WHERE they go (train/val/test), and how the token stream is
cut into fixed-length training sequences.  Built entirely from
``operators/mixing.py`` — every decision is a pure function of a salt
and the document key, so the assembled corpus is bit-identical across
runs, partitionings and cluster sizes (reproducibility is the whole
point of a training-data manifest)::

    pages ── derive stratum (url host / lang / column) ── JVM expr
      │
      ├─ stratified_sample ──── per-stratum keep fractions  (--fractions)
      ├─ token_budget_pack ──── per-stratum token caps      (--budget)
      ├─ upsample_repeat ────── per-stratum repeat factors  (--repeat-factors)
      ├─ hash_split ─────────── train/val/test assignment   (--splits)
      ├─ sequence_pack + global_chunk_ids ── train-split chunk map
      │                                      (--seq-len)
      └─ write per-split parquet + chunk map + mixture report
         + one JSON metrics line

Launch (same deployment path as dedup_job / clean_job)::

    zip -qr /tmp/mcs.zip metacache_mpi_spark
    spark-submit --master <master> --driver-memory 4g \
        --py-files /tmp/mcs.zip \
        scripts/mix_job.py --input <corpus_dir> --output <out_dir> \
        [--generate N] [--stratum host|lang|<col>] \
        [--fractions '{"site0.example": 0.5}'] \
        [--repeat-factors '{"site1.example": 2.5}'] \
        [--budget 100000] [--splits 'train=0.98,val=0.01,test=0.01'] \
        [--seq-len 2048]

Every stage count lands in the JSON line; the mixture report (exact
integer ppm shares per stratum per split) is written as parquet next
to the splits so run-over-run mixture drift is diffable.
"""

from __future__ import annotations

import argparse
import json
import time


def _parse_splits(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, _, w = part.partition("=")
        if not name or not w:
            raise SystemExit(f"bad --splits entry: {part!r}")
        out[name.strip()] = float(w)
    return out


def run(spark, args) -> dict:
    """The assembly body (separated from main() so tests drive it on a
    shared session; main owns argparse/session/JSON-line)."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.mixing import (
        global_chunk_ids,
        hash_split,
        mixture_report,
        sequence_pack,
        stratified_sample,
        token_budget_pack,
        upsample_repeat,
    )
    from metacache_mpi_spark.sources.pages import load_pages

    counts: dict = {}
    docs = load_pages(spark, args.input)

    # stratum column: a real mixture keys on crawl source (url host)
    # or language; any existing column works too
    if args.stratum == "host":
        docs = docs.withColumn(
            "source",
            F.coalesce(
                F.try_parse_url(F.col("url"), F.lit("HOST")),
                F.lit("(unknown)"),
            ),
        )
    elif args.stratum in docs.columns:
        docs = docs.withColumn("source", F.col(args.stratum))
    else:
        raise SystemExit(
            f"--stratum {args.stratum!r}: not a column and not 'host'"
        )
    docs = docs.select("doc_id", "url", "source", "text").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    counts["raw"] = docs.count()

    if args.fractions:
        fractions = json.loads(args.fractions)
        docs = stratified_sample(docs, fractions)
        counts["after_sample"] = docs.count()

    if args.budget:
        kept = token_budget_pack(docs, args.budget).select("doc_id")
        # kept-set scales with the corpus — shuffle join, not broadcast
        docs = docs.join(kept.hint("shuffle_hash"), "doc_id")
        counts["after_budget"] = docs.count()

    # split BEFORE upsampling, upsample ONLY the train split: repeat
    # factors are a training-mixture knob — eval splits must carry
    # exactly one copy per document (rep_idx>0 copies landing in
    # val/test would inflate their doc/token counts and mixture
    # reports).  The split salt stays keyed on doc_id, so assignment is
    # identical to splitting the upsampled frame (copies share the
    # doc_id) — determinism is unchanged, only the copies' destination.
    split = hash_split(docs, _parse_splits(args.splits))
    if args.repeat_factors:
        factors = json.loads(args.repeat_factors)
        split = upsample_repeat(
            split.where(F.col("split") == "train"), factors
        ).unionByName(
            split.where(F.col("split") != "train").withColumn(
                "rep_idx", F.lit(0)
            )
        )
    else:
        split = split.withColumn("rep_idx", F.lit(0))
    split = split.persist()
    counts["assembled"] = split.count()

    per_split: dict = {}
    for r in (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.size(F.split("text", " "))).alias("tokens"),
        )
        .collect()
    ):
        per_split[r["split"]] = {
            "docs": r["docs"],
            "tokens": int(r["tokens"]),
        }
    counts["splits"] = per_split

    out = args.output.rstrip("/")
    for name in _parse_splits(args.splits):
        part = split.where(F.col("split") == name).drop("split")
        part.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        # exact integer-ppm mixture accounting per split, diffable
        # run-over-run
        mixture_report(part).write.mode("overwrite").parquet(
            f"{out}/mixture_{name}.parquet"
        )

    # chunk map for the train split: which fixed-length training
    # sequences each (doc, copy) lands in.  Repeated copies extend the
    # stream under a composite key so each copy gets distinct chunks.
    # String key, NOT doc_id*k+rep_idx: doc_id is a full-range xxhash64,
    # so the arithmetic form overflows BIGINT (ANSI error); packing only
    # needs a deterministic total order, any one.
    train = split.where(F.col("split") == "train")
    packed = global_chunk_ids(
        sequence_pack(
            train.withColumn(
                "pack_key",
                F.concat_ws("#", F.col("doc_id"), F.col("rep_idx")),
            ),
            args.seq_len,
            key="pack_key",
        )
    )
    packed.write.mode("overwrite").parquet(f"{out}/train_chunks.parquet")
    back = spark.read.parquet(f"{out}/train_chunks.parquet")
    counts["train_chunks"] = int(
        back.agg(F.max("chunk_last")).first()[0] or -1
    ) + 1
    split.unpersist()
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--generate", type=int, default=0)
    ap.add_argument("--cores", default=None)
    ap.add_argument(
        "--stratum",
        default="host",
        help="mixture stratum: 'host' (url host), or any input column",
    )
    ap.add_argument(
        "--fractions",
        default=None,
        help='JSON {stratum: keep_fraction}; absent strata are DROPPED',
    )
    ap.add_argument(
        "--repeat-factors",
        default=None,
        help="JSON {stratum: repeat_factor}; absent strata keep 1 copy",
    )
    ap.add_argument(
        "--budget",
        type=int,
        default=None,
        help="per-stratum token budget (greedy prefix in doc_id order)",
    )
    ap.add_argument("--splits", default="train=0.98,val=0.01,test=0.01")
    ap.add_argument("--seq-len", type=int, default=2048)
    args = ap.parse_args()

    from metacache_mpi_spark.session import get_spark
    from metacache_mpi_spark.sources.pages import write_corpus

    if args.generate:
        write_corpus(args.input, n_pages=args.generate, seed=42)

    spark = get_spark(args.cores, app_name="mix-job")
    t0 = time.time()
    counts = run(spark, args)
    dt = time.time() - t0
    print(
        json.dumps(
            {
                **counts,
                "docs_per_sec": round(counts["raw"] / dt, 1),
                "sec": round(dt, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
