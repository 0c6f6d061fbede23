"""Reference-CLI-shaped genomic entry point: build / query / merge / info.

Mirrors the mode surface of the reference binary
(/root/reference/src/main.cpp modes: mode_build, mode_query,
mode_merge, mode_info) on the Spark engine::

    zip -qr /tmp/mcs.zip metacache_mpi_spark
    spark-submit --py-files /tmp/mcs.zip scripts/genomic_job.py \
        build --targets t.fasta --db /data/db [--k 16 --sketch 16 ...]
    ... query --db /data/db --reads r.fastq [--reads2 mate2.fastq] \
        [--nodes nodes.dmp] [--out outdir]
    ... merge --results shard1_out shard2_out --out merged [--nodes ...]
    ... annotate --input seqs.fasta --mapping acc2taxid.tsv --out dir
    ... info [statistics|targets|lineages|featurecounts] --db /data/db

``build`` persists the inverted index as parquet plus a
``targets.parquet`` dim (tgt, taxid from ``taxid|N`` headers, header)
and a JSON config sidecar; ``query`` probes
it, classifies by ranked LCA when a taxonomy is given, and writes
candidates/assignments; ``merge`` re-aggregates per-shard candidate
lists (S12/J8 — proven ≡ global index); ``info`` prints bucket-size
moments (``info statistics`` analog).  Each mode ends with ONE JSON
line of counts.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _cfg_from_args(args):
    from metacache_mpi_spark.operators.genomic import GenomicConfig

    return GenomicConfig(
        k=args.k,
        sketch_size=args.sketch,
        winlen=args.winlen,
        winstride=args.winstride,
        max_candidates=args.max_cand,
    )


def _list_local_files(path):
    """Sorted member files for a local dir / glob / single file, or
    None when the path isn't locally resolvable (e.g. an hdfs: URI)."""
    import glob as _glob

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, e)
            for e in os.listdir(path)
            if not e.startswith((".", "_"))
            and os.path.isfile(os.path.join(path, e))
        )
    if any(c in path for c in "*?["):
        m = sorted(p for p in _glob.glob(path) if os.path.isfile(p))
        return m or None
    if os.path.isfile(path):
        return [path]
    return None


def _with_file_index(df, path):
    """Add ``fidx``: the file's rank in the sorted file list; returns
    (df, n_files).

    Mate-1/mate-2 file lists correspond positionally after sorting, so
    joining on (fidx, record_idx) pairs mates deterministically even
    for directory/glob inputs.  Local paths enumerate OS-side (zero
    Spark jobs — ``input_file_name`` URIs are url-decoded to match);
    non-local URIs fall back to one distinct-scan whose collect is
    bounded by the file count.  An input file that fails to map raises
    per-row instead of silently dropping its reads from the join.
    """
    from pyspark.sql import functions as F

    local = _list_local_files(path)
    if local is not None:
        files = [os.path.abspath(f) for f in local]
        # normalize file:///a%20b URIs back to plain paths
        key = F.url_decode(
            F.regexp_replace(F.col("file"), r"^file:/*", "/")
        )
    else:
        files = sorted(
            r["file"] for r in df.select("file").distinct().collect()
        )
        key = F.col("file")
    pairs = [x for i, f in enumerate(files) for x in (f, i)]
    fmap = F.create_map(*[F.lit(x) for x in pairs])
    fidx = F.when(fmap[key].isNotNull(), fmap[key]).otherwise(
        F.raise_error(
            F.concat(
                F.lit("input file failed to map to a mate index: "),
                F.col("file"),
            )
        )
    )
    return df.withColumn("fidx", fidx), len(files)


def _load_db(spark, db):
    with open(os.path.join(db, "meta.json")) as fh:
        meta = json.load(fh)
    index = spark.read.parquet(os.path.join(db, "index.parquet"))
    return index, meta


def cmd_build(spark, args) -> dict:
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.genomic import build_index
    from metacache_mpi_spark.sources.bio import (
        read_sequences,
        taxid_from_header,
    )

    cfg = _cfg_from_args(args)
    # GLOBAL target id: record_idx is per-file (bio sources window by
    # file), so a directory/glob input would collide ids across files —
    # hash (file, record_idx) instead (content-addressed, like doc_id)
    seqs = read_sequences(spark, args.targets).select(
        F.xxhash64("file", "record_idx").alias("tgt"), "seq", "header"
    )
    # target metadata is a parquet DIM, not a driver-side dict: the
    # reference replicates taxa metadata on every rank
    # (/root/reference/src/sketch_database.h:545-560), but at 10^7+
    # targets a driver collect is a memory bound — query/merge join
    # this dim instead (AQE broadcasts it while it fits)
    targets_dim = seqs.select(
        "tgt", taxid_from_header().alias("taxid"), "header"
    )
    index = build_index(seqs.select("tgt", "seq"), cfg)
    os.makedirs(args.db, exist_ok=True)
    index.write.mode("overwrite").parquet(
        os.path.join(args.db, "index.parquet")
    )
    targets_dim.write.mode("overwrite").parquet(
        os.path.join(args.db, "targets.parquet")
    )
    with open(os.path.join(args.db, "meta.json"), "w") as fh:
        json.dump(
            {
                "cfg": {
                    "k": cfg.k,
                    "sketch_size": cfg.sketch_size,
                    "winlen": cfg.winlen,
                    "winstride": cfg.winstride,
                    "max_candidates": cfg.max_candidates,
                },
            },
            fh,
        )
    n_features = spark.read.parquet(
        os.path.join(args.db, "index.parquet")
    ).count()
    return {"mode": "build", "targets": seqs.count(), "index_rows": n_features}


def cmd_query(spark, args) -> dict:
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.genomic import (
        GenomicConfig,
        query_index,
        query_index_paired,
    )
    from metacache_mpi_spark.sources.bio import read_sequences

    index, meta = _load_db(spark, args.db)
    cfg = GenomicConfig(**meta["cfg"])
    out = {"mode": "query"}
    if args.reads2:
        # paired mates pair up by (file position, within-file record
        # position): record_idx alone is per-file, so multi-file
        # --reads/--reads2 inputs would cross-pair mates from different
        # files (many-to-many on ridx).  Mate files correspond by
        # sorted order, mirroring the reference's sequence_pair_reader
        # over matched file lists; the global qid hashes mate-1's
        # identity.
        r1, n1 = _with_file_index(
            read_sequences(spark, args.reads), args.reads
        )
        r2, n2 = _with_file_index(
            read_sequences(spark, args.reads2), args.reads2
        )
        if n1 != n2:
            # positional file correspondence is the pairing contract —
            # unequal lists would silently drop or mispair mates
            raise ValueError(
                f"--reads has {n1} file(s) but --reads2 has {n2}; "
                "paired mode needs matching file lists"
            )
        r1 = r1.select(
            F.xxhash64("file", "record_idx").alias("qid"),
            "fidx",
            F.col("record_idx").alias("ridx"),
            F.col("seq").alias("seq1"),
        )
        r2 = r2.select(
            "fidx",
            F.col("record_idx").alias("ridx"),
            F.col("seq").alias("seq2"),
        )
        cands = query_index_paired(
            r1.join(r2, ["fidx", "ridx"]).select("qid", "seq1", "seq2"),
            index,
            cfg,
        )
    else:
        reads = read_sequences(spark, args.reads).select(
            F.xxhash64("file", "record_idx").alias("qid"), "seq"
        )
        cands = query_index(reads, index, cfg)
    if args.out:
        # read the written snapshot back: cands.count() and the
        # classification below would otherwise re-run the whole
        # sketch/probe chain per action (dedup_job discipline)
        cands.write.mode("overwrite").parquet(
            os.path.join(args.out, "candidates.parquet")
        )
        cands = spark.read.parquet(
            os.path.join(args.out, "candidates.parquet")
        )
    else:
        cands = cands.persist()
    out["candidates"] = cands.count()
    if args.nodes:
        out.update(
            _classify_and_write(spark, args, cands, meta, cfg, args.out)
        )
    return out


def _classify_and_write(spark, args, cands, meta, cfg, out_dir) -> dict:
    """Ranked-LCA classification tail shared by query and merge: load
    the taxonomy, join the targets dim (or a legacy meta.json map),
    classify, optionally persist assignments; returns the count dict."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.taxonomy import (
        Taxonomy,
        classify_lca,
        parse_nodes_dmp,
        taxon_counts,
    )

    tax = Taxonomy.from_dataframe(parse_nodes_dmp(spark, args.nodes))
    # targets dim joins in relationally (see cmd_build); legacy DBs
    # carry the map in meta.json — keep reading those
    if "target_taxid" in meta:
        tdim = {int(k): v for k, v in meta["target_taxid"].items()}
    else:
        tdim = (
            spark.read.parquet(os.path.join(args.db, "targets.parquet"))
            .where(F.col("taxid").isNotNull())
            .select("tgt", "taxid")
        )
    assigned = classify_lca(
        cands, tax, tdim, hits_min=cfg.hits_min_effective
    )
    if out_dir:
        assigned.write.mode("overwrite").parquet(
            os.path.join(out_dir, "assignments.parquet")
        )
    return {
        "classified": assigned.where(F.col("taxid").isNotNull()).count(),
        "taxa": taxon_counts(assigned).count(),
    }


def cmd_merge(spark, args) -> dict:
    from metacache_mpi_spark.operators.genomic import (
        GenomicConfig,
        merge_query_results,
    )

    shards = [
        spark.read.parquet(os.path.join(d, "candidates.parquet"))
        for d in args.results
    ]
    # thresholds (hitsMin = sketch//3) must come from the DB the shards
    # were queried against, not defaults — a merge must never be
    # stricter than the per-shard queries were
    _, meta = _load_db(spark, args.db)
    cfg = GenomicConfig(**meta["cfg"])
    merged = merge_query_results(shards, cfg)
    os.makedirs(args.out, exist_ok=True)
    merged.write.mode("overwrite").parquet(
        os.path.join(args.out, "candidates.parquet")
    )
    merged = spark.read.parquet(
        os.path.join(args.out, "candidates.parquet")
    )
    out = {
        "mode": "merge",
        "shards": len(shards),
        "merged_candidates": merged.count(),
    }
    if args.nodes:
        # the reference's merge mode classifies the merged candidate
        # lists (mode_merge.cpp taxonomy options + classification.h)
        out.update(
            _classify_and_write(spark, args, merged, meta, cfg, args.out)
        )
    return out


def cmd_info(spark, args) -> dict:
    """``info`` submodes mirroring the reference's mode_info.cpp:
    ``statistics`` (default — bucket-size moments,
    show_database_statistics), ``targets`` (show_target_info),
    ``lineages`` (show_lineage_table, needs --nodes), and
    ``featurecounts`` (show_feature_counts).  Table-shaped submodes
    write parquet under --out; the JSON line carries the moments."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.relational import bucket_size_stats

    index, meta = _load_db(spark, args.db)
    what = getattr(args, "what", "statistics") or "statistics"
    out = {"mode": "info", "what": what, **meta["cfg"]}
    if what == "statistics":
        row = bucket_size_stats(index, ["feature"]).collect()[0].asDict()
        return {**out, **row}
    if what == "targets":
        dim = spark.read.parquet(os.path.join(args.db, "targets.parquet"))
        if args.out:
            dim.write.mode("overwrite").parquet(args.out)
        return {
            **out,
            "targets": dim.count(),
            "with_taxid": dim.where(F.col("taxid").isNotNull()).count(),
        }
    if what == "featurecounts":
        fc = index.groupBy("feature").agg(
            F.count(F.lit(1)).alias("n_locations")
        )
        if args.out:
            # read the snapshot back (dedup_job discipline): the
            # moments below would otherwise re-run the groupBy
            fc.write.mode("overwrite").parquet(args.out)
            fc = spark.read.parquet(args.out)
        row = fc.agg(
            F.count(F.lit(1)).alias("features"),
            F.max("n_locations").alias("max_locations"),
            F.avg("n_locations").alias("mean_locations"),
        ).collect()[0]
        return {
            **out,
            "features": row["features"],
            "max_locations": row["max_locations"],
            "mean_locations": (
                round(row["mean_locations"], 3)
                if row["mean_locations"] is not None
                else None  # empty index: moments are null, not a crash
            ),
        }
    if what == "lineages":
        if not args.nodes:
            raise ValueError("info lineages needs --nodes <nodes.dmp>")
        from metacache_mpi_spark.operators.taxonomy import (
            Taxonomy,
            parse_nodes_dmp,
        )

        tax = Taxonomy.from_dataframe(parse_nodes_dmp(spark, args.nodes))
        dim = spark.read.parquet(
            os.path.join(args.db, "targets.parquet")
        ).where(F.col("taxid").isNotNull())
        # taxa metadata is driver-resident exactly as in the reference
        # (sketch_database.h:545-560): one ranked lineage per DISTINCT
        # taxid, joined back to the target dim
        taxids = [r["taxid"] for r in dim.select("taxid").distinct().collect()]
        lin = spark.createDataFrame(
            [(t, tax.ranked_lineage(int(t))) for t in taxids],
            "taxid long, ranked_lineage array<long>",
        )
        table = dim.select("tgt", "taxid").join(lin, "taxid")
        if args.out:
            table.write.mode("overwrite").parquet(args.out)
        return {**out, "targets": table.count(), "taxa": len(taxids)}
    raise ValueError(f"unknown info submode {what!r}")


def cmd_annotate(spark, args) -> dict:
    """``annotate`` mode (mode_annotate.cpp): rewrite sequence headers
    to carry ``taxid|<n>|`` from an accession2taxid mapping (0 when
    unmapped — the reference's explicit not-found marker) and write the
    annotated sequences as FASTA text partitions under --out."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.annotate import annotate_with_taxid
    from metacache_mpi_spark.sources.bio import (
        read_accession2taxid,
        read_sequences,
    )

    seqs = read_sequences(spark, args.input).select("header", "seq")
    mapping = read_accession2taxid(spark, args.mapping)
    ann = annotate_with_taxid(seqs, mapping, idtype=args.idtype).persist()
    ann.select(
        F.concat(
            F.lit(">"), F.col("header"), F.lit("\n"), F.col("seq")
        ).alias("value")
    ).write.mode("overwrite").text(args.out)
    # three outcomes, counted from the written tokens: annotated
    # (taxid|N|, N>0), unmapped (explicit taxid|0| — the reference's
    # not-found marker), untagged (no accession/gi extractable from
    # the header at all → annotate_with_taxid leaves it untouched)
    total = ann.count()
    tagged = ann.where(
        F.col("header").rlike(r"taxid\|\d+\|")
    ).count()
    unmapped = ann.where(F.col("header").contains("taxid|0|")).count()
    return {
        "mode": "annotate",
        "sequences": total,
        "annotated": tagged - unmapped,
        "unmapped": unmapped,
        "untagged": total - tagged,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    # shared flags must live on a PARENT parser: on the top-level
    # parser they are only accepted BEFORE the subcommand token
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--cores", default=None)
    sub = ap.add_subparsers(dest="mode", required=True)

    b = sub.add_parser("build", parents=[common])
    b.add_argument("--targets", required=True)
    b.add_argument("--db", required=True)
    b.add_argument("--k", type=int, default=16)
    b.add_argument("--sketch", type=int, default=16)
    b.add_argument("--winlen", type=int, default=128)
    b.add_argument("--winstride", type=int, default=113)
    b.add_argument("--max-cand", type=int, default=2)

    q = sub.add_parser("query", parents=[common])
    q.add_argument("--db", required=True)
    q.add_argument("--reads", required=True)
    q.add_argument("--reads2", default=None)
    q.add_argument("--nodes", default=None)
    q.add_argument("--out", default=None)

    m = sub.add_parser("merge", parents=[common])
    m.add_argument("--results", nargs="+", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--db", required=True)
    m.add_argument("--nodes", default=None)

    a = sub.add_parser("annotate", parents=[common])
    a.add_argument("--input", required=True)
    a.add_argument("--mapping", required=True)
    a.add_argument("--out", required=True)
    a.add_argument(
        "--idtype", default="accver", choices=["acc", "accver", "gi"]
    )

    i = sub.add_parser("info", parents=[common])
    i.add_argument(
        "what",
        nargs="?",
        default="statistics",
        choices=["statistics", "targets", "lineages", "featurecounts"],
    )
    i.add_argument("--db", required=True)
    i.add_argument("--nodes", default=None)
    i.add_argument("--out", default=None)

    args = ap.parse_args()

    from metacache_mpi_spark.session import get_spark

    spark = get_spark(args.cores, app_name=f"genomic-{args.mode}")
    t0 = time.time()
    result = {
        "build": cmd_build,
        "query": cmd_query,
        "merge": cmd_merge,
        "annotate": cmd_annotate,
        "info": cmd_info,
    }[args.mode](spark, args)
    result["sec"] = round(time.time() - t0, 2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
