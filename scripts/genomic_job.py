"""Reference-CLI-shaped genomic entry point:
build / modify / query / merge / annotate / info.

Mirrors the mode surface of the reference binary
(/root/reference/src/main.cpp modes: mode_build incl. the modify
variant, mode_query, mode_merge, mode_annotate, mode_info) on the
Spark engine::

    zip -qr /tmp/mcs.zip metacache_mpi_spark
    spark-submit --py-files /tmp/mcs.zip scripts/genomic_job.py \
        build --targets t.fasta --db /data/db [--k 16 --sketch 16 ...] \
        [--remove-overpopulated] [--remove-ambig-features RANK \
         --max-ambig-per-feature N --nodes nodes.dmp]
    ... modify --targets more.fasta --db /data/db \
        [--remove-overpopulated]
    ... query --db /data/db --reads r.fastq [--reads2 mate2.fastq] \
        [--nodes nodes.dmp] [--out outdir] [--truth [map.tsv]] \
        [--precision] [--taxon-coverage] [--exclude RANK] \
        [--abundance-per RANK] [--lowest RANK] [--insert-size-max N] \
        [--align targets.fasta]
    ... merge --results shard1_out shard2_out --out merged [--nodes ...]
    ... annotate --input seqs.fasta --mapping acc2taxid.tsv --out dir
    ... info [statistics|targets|lineages|featurecounts|featuremap] \
        --db /data/db

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
        remove_overpopulated=getattr(args, "remove_overpopulated", False),
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
        # normalize file:///a%20b URIs back to plain paths.  url_decode
        # has FORM semantics (a raw '+' decodes to a space, which would
        # unmap any file named with '+'); Hadoop URIs keep '+' literal,
        # so pre-escape it to %2B for a percent-only decode.
        key = F.url_decode(
            F.regexp_replace(
                F.regexp_replace(F.col("file"), r"^file:/*", "/"),
                r"\+",
                "%2B",
            )
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


def _legacy_map(db, meta):
    """The legacy meta.json target→taxid map, or None when the parquet
    dim should be used.  ONE precedence rule everywhere: the parquet
    dim wins whenever it exists — a modify upgrade that crashed before
    the meta.json rewrite leaves a STALE legacy map next to current
    parquet, and reading the map there would silently drop the new
    targets' candidates."""
    if "target_taxid" in meta and not os.path.exists(
        os.path.join(db, "targets.parquet")
    ):
        return {int(k): int(v) for k, v in meta["target_taxid"].items()}
    return None


def cmd_build(spark, args) -> dict:
    from metacache_mpi_spark.operators.genomic import build_index

    cfg = _cfg_from_args(args)
    # GLOBAL target id: record_idx is per-file (bio sources window by
    # file), so a directory/glob input would collide ids across files —
    # hash (file, record_idx) instead (content-addressed, like doc_id).
    # Target metadata is a parquet DIM, not a driver-side dict: the
    # reference replicates taxa metadata on every rank
    # (/root/reference/src/sketch_database.h:545-560), but at 10^7+
    # targets a driver collect is a memory bound — query/merge join
    # this dim instead (AQE broadcasts it while it fits)
    seqs, targets_dim = _read_target_seqs(spark, args.targets)
    index = build_index(seqs.select("tgt", "seq"), cfg)
    ambig_rank = getattr(args, "remove_ambig_features", None)
    if ambig_rank:
        # P14 (-remove-ambig-features <rank> -max-ambig-per-feature N,
        # mode_build.cpp:121-131): drop features whose locations span
        # more than N distinct taxa AT THAT RANK — taxids lift to their
        # rank ancestor (driver-side over DISTINCT taxids, like the
        # reference's replicated taxa metadata) before the count
        from pyspark.sql import functions as F

        from metacache_mpi_spark.operators.genomic import (
            remove_ambiguous_features,
        )

        tt = targets_dim.where(F.col("taxid").isNotNull()).select(
            "tgt", "taxid"
        )
        if ambig_rank != "sequence":
            if not getattr(args, "nodes", None):
                raise ValueError(
                    "--remove-ambig-features above 'sequence' needs --nodes"
                )
            from metacache_mpi_spark.operators.taxonomy import (
                Taxonomy,
                parse_nodes_dmp,
            )

            tax = Taxonomy.from_dataframe(
                parse_nodes_dmp(spark, args.nodes)
            )
            from metacache_mpi_spark.operators.genomic import (
                lifted_taxid_map,
            )

            taxids = [
                int(r["taxid"])
                for r in tt.select("taxid").distinct().collect()
            ]
            lift = spark.createDataFrame(
                list(
                    lifted_taxid_map(
                        tax, {t: t for t in taxids}, ambig_rank
                    ).items()
                ),
                "taxid long, anc long",
            )
            tt = tt.join(F.broadcast(lift), "taxid").select(
                "tgt", F.col("anc").alias("taxid")
            )
        index = remove_ambiguous_features(
            index, tt, getattr(args, "max_ambig_per_feature", 1)
        )
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


def _read_target_seqs(spark, path):
    """FASTA targets → (tgt, seq, header) with the GLOBAL content-
    addressed target id (see cmd_build) plus the metadata dim."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.sources.bio import (
        read_sequences,
        taxid_from_header,
    )

    seqs = read_sequences(spark, path).select(
        F.xxhash64("file", "record_idx").alias("tgt"), "seq", "header"
    )
    dim = seqs.select("tgt", taxid_from_header().alias("taxid"), "header")
    return seqs, dim


def _stage_write(df, final_path):
    """Phase 1 of a two-phase dataset swap: materialize ``df`` to
    ``<path>.tmp``.  Writing BEFORE any rename means a lazy plan
    reading the old data is fully drained first, and a crash here
    leaves the DB untouched."""
    df.write.mode("overwrite").parquet(final_path + ".tmp")


def _commit_swap(final_path):
    """Phase 2: swap the staged ``.tmp`` dir into place.  Staging both
    datasets before committing either shrinks the non-atomic window
    from two large parquet writes to two directory renames — and
    cmd_modify's anti-join against BOTH the dim and the index makes a
    retry across that residual window idempotent.  (At deployment this
    is an Iceberg multi-table transaction — plans/checkpoint.py is the
    engine's manifest-atomic version of the same contract.)"""
    import shutil

    old = final_path + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(final_path):
        os.rename(final_path, old)
    os.rename(final_path + ".tmp", final_path)
    shutil.rmtree(old, ignore_errors=True)


def cmd_modify(spark, args) -> dict:
    """``modify`` mode (/root/reference/src/main.cpp:72-73,
    src/modes.h:55, main_mode_build_modify in src/mode_build.cpp):
    fold new target FASTAs into an existing DB — sketch ONLY the new
    targets, continue content-addressed target ids, union with the
    stored index, re-apply the P17 cap (+ P13 prune with
    ``--remove-overpopulated``), and extend the targets dim.  The
    sketch parameters ALWAYS come from the DB's meta.json: an index
    mixing two k-mer configurations is garbage, exactly why the
    reference refuses to modify with mismatched sketching params."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.genomic import (
        GenomicConfig,
        modify_index,
    )

    index, meta = _load_db(spark, args.db)
    cfg = GenomicConfig(
        **{**meta["cfg"], "remove_overpopulated": args.remove_overpopulated}
    )
    seqs, new_dim = _read_target_seqs(spark, args.targets)
    tpath = os.path.join(args.db, "targets.parquet")
    if "target_taxid" in meta and not os.path.exists(tpath):
        # legacy layout: the dim lives in meta.json — lift it into the
        # parquet dim (headers unknown → null); modify upgrades the DB
        existing = spark.createDataFrame(
            [
                (int(k), int(v), None)
                for k, v in meta["target_taxid"].items()
            ],
            "tgt long, taxid long, header string",
        )
    else:
        existing = spark.read.parquet(tpath)
    # a target already in the DB must not insert its windows twice —
    # the reference skips sequences whose id is already present
    # (mode_build.cpp database-add path).  The anti-join runs against
    # the dim AND the index's target set: after a crash between the two
    # commit renames below the index can be one step ahead of the dim,
    # and a retry must not union those targets' rows in again.
    index_tgts = index.select("tgt").distinct()
    known = existing.select("tgt").unionByName(index_tgts).distinct()
    fresh = seqs.join(known, "tgt", "left_anti").persist()
    n_new = fresh.count()
    n_skipped = seqs.count() - n_new
    # dim self-repair for the same crash window: a target already in
    # the index but missing from the dim gets its metadata row now
    orphan_dim = new_dim.join(index_tgts, "tgt", "left_semi").join(
        existing.select("tgt"), "tgt", "left_anti"
    )
    new_index = modify_index(index, fresh.select("tgt", "seq"), cfg)
    dim_union = existing.unionByName(
        new_dim.join(fresh.select("tgt"), "tgt", "left_semi")
    ).unionByName(orphan_dim)
    ipath = os.path.join(args.db, "index.parquet")
    _stage_write(new_index, ipath)
    _stage_write(dim_union, tpath)
    _commit_swap(ipath)
    _commit_swap(tpath)
    if "target_taxid" in meta:
        # the dim is now authoritative parquet — retire the legacy map
        meta.pop("target_taxid")
        tmp = os.path.join(args.db, "meta.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, os.path.join(args.db, "meta.json"))
    fresh.unpersist()
    index_rows = spark.read.parquet(
        os.path.join(args.db, "index.parquet")
    ).count()
    targets_total = spark.read.parquet(
        os.path.join(args.db, "targets.parquet")
    ).count()
    return {
        "mode": "modify",
        "new_targets": n_new,
        "skipped_existing": n_skipped,
        "targets": targets_total,
        "index_rows": index_rows,
    }


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

    # ---- evaluation surface (classification.cpp:294-353) -------------
    # --truth resolves per-read ground truth (J6 4-strategy chain);
    # --exclude <rank> runs leave-one-clade-out on the RAW matches;
    # --precision / --abundance-per evaluate the assignments.
    tax = None
    if args.nodes:
        from metacache_mpi_spark.operators.taxonomy import (
            Taxonomy,
            parse_nodes_dmp,
        )

        tax = Taxonomy.from_dataframe(parse_nodes_dmp(spark, args.nodes))
    want_truth = bool(
        getattr(args, "truth", None)
        or getattr(args, "precision", False)
        or getattr(args, "exclude", None)
    )
    if getattr(args, "precision", False) and not getattr(args, "truth", None):
        raise ValueError("--precision needs --truth")
    if getattr(args, "precision", False) and not tax:
        # the per-rank table is computed inside the classification tail
        # — without a taxonomy it would be silently skipped
        raise ValueError("--precision needs --nodes")
    if getattr(args, "taxon_coverage", False):
        if not getattr(args, "truth", None):
            raise ValueError("--taxon-coverage needs --truth")
        if not tax:
            raise ValueError("--taxon-coverage needs --nodes")
    if getattr(args, "exclude", None) and not (
        getattr(args, "truth", None) and tax
    ):
        raise ValueError("--exclude needs --truth and --nodes")
    if getattr(args, "abundance_per", None) and not tax:
        raise ValueError("--abundance-per needs --nodes")
    lowest = getattr(args, "lowest", None)
    if lowest and not tax:
        raise ValueError("--lowest needs --nodes")
    insert_size_max = getattr(args, "insert_size_max", 0) or 0
    tmap = None
    if lowest:
        # A3 merge-below-rank needs the target→taxid map driver-side
        # (the reference replicates taxa metadata per rank,
        # sketch_database.h:545-560 — bounded by the target count);
        # legacy DBs carry it in meta.json instead of targets.parquet.
        # The parquet dim WINS whenever it exists — after a modify
        # upgrade that crashed before the meta rewrite, the legacy map
        # is stale (same precedence as _legacy_map/_classify_and_write)
        legacy = _legacy_map(args.db, meta)
        if legacy is not None:
            tmap = legacy
        else:
            tmap = {
                r["tgt"]: int(r["taxid"])
                for r in spark.read.parquet(
                    os.path.join(args.db, "targets.parquet")
                ).where(F.col("taxid").isNotNull()).collect()
            }

    def _resolve_truth(with_header):
        """(qid, header) → (qid, truth_taxid): header-token strategy,
        or the full accession/gi mapping chain when --truth is a
        mapping file path (taxonomy.resolve_ground_truth)."""
        from metacache_mpi_spark.operators.taxonomy import (
            resolve_ground_truth,
        )
        from metacache_mpi_spark.sources.bio import read_accession2taxid

        mapping = (
            None
            if args.truth == "header"
            else read_accession2taxid(spark, args.truth)
        )
        return resolve_ground_truth(with_header, mapping).select(
            "qid", "truth_taxid"
        ).persist()

    truth = None
    match_filter = None

    def _exclusion_filter():
        from metacache_mpi_spark.operators.taxonomy import (
            exclude_truth_clade,
        )

        tdim = _legacy_map(args.db, meta)
        if tdim is None:
            tdim = spark.read.parquet(
                os.path.join(args.db, "targets.parquet")
            ).where(F.col("taxid").isNotNull()).select("tgt", "taxid")
        return lambda m: exclude_truth_clade(
            m, tax, tdim, truth, args.exclude
        )

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
            "header",
        )
        r2 = r2.select(
            "fidx",
            F.col("record_idx").alias("ridx"),
            F.col("seq").alias("seq2"),
        )
        paired_in = r1.join(r2, ["fidx", "ridx"]).select(
            "qid", "seq1", "seq2"
        )
        if want_truth:
            # mate-1 headers carry the pair's identity (the reference
            # resolves ground truth from the first mate's header) —
            # restricted to reads that SURVIVED the pairing join, so
            # truth_known describes the population the query actually
            # ran over (an unpaired trailing mate-1 record must not
            # count)
            truth = _resolve_truth(
                r1.select("qid", "header").join(
                    paired_in.select("qid"), "qid", "left_semi"
                )
            )
        if getattr(args, "exclude", None):
            match_filter = _exclusion_filter()
        if lowest:
            from metacache_mpi_spark.operators.genomic import (
                query_index_paired_per_target,
            )

            per_target = query_index_paired_per_target(
                paired_in, index, cfg, insert_size_max, match_filter
            )
        else:
            cands = query_index_paired(
                paired_in,
                index,
                cfg,
                insert_size_max,
                match_filter=match_filter,
            )
    else:
        reads = read_sequences(spark, args.reads).select(
            F.xxhash64("file", "record_idx").alias("qid"), "seq", "header"
        )
        if want_truth:
            truth = _resolve_truth(reads.select("qid", "header"))
        if getattr(args, "exclude", None):
            match_filter = _exclusion_filter()
        if lowest:
            from metacache_mpi_spark.operators.genomic import (
                query_index_per_target,
            )

            per_target = query_index_per_target(
                reads.select("qid", "seq"), index, cfg, match_filter
            )
        else:
            cands = query_index(
                reads.select("qid", "seq"), index, cfg,
                match_filter=match_filter,
            )
    if lowest:
        # `-lowest <rank>` (query_options.cpp:142-146, A3
        # candidates.h:242-283): candidates become TAXA at that rank,
        # merged from the untruncated per-target ranges; downstream
        # classification sees them through an identity target→taxid map
        from metacache_mpi_spark.operators.genomic import (
            merge_candidates_below_rank,
        )

        merged = merge_candidates_below_rank(
            per_target, tax, tmap, lowest, cfg
        )
        cands = merged.select(
            "qid", F.col("taxid").alias("tgt"), "hits", "rank"
        )
        out["lowest"] = lowest
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
    if getattr(args, "align", None):
        # -align (classification.cpp:437-477): semi-global alignment of
        # each read against its TOP candidate's window range, both
        # strands, mate scores added per strand.  The reference re-reads
        # the target sequence from its recorded source file; this DB
        # stores no source paths, so the flag takes the original
        # targets FASTA and re-derives the content-addressed tgt ids.
        if lowest:
            # under -lowest candidates are TAXA, not sequence targets —
            # the reference's show_alignment skips non-sequence tophits
            raise ValueError("--align is incompatible with --lowest")
        from metacache_mpi_spark.operators.alignment import (
            align_top_candidates,
        )

        tgt_seqs, _ = _read_target_seqs(spark, args.align)
        if args.reads2:
            qseqs = paired_in.select("qid", "seq1", "seq2")
        else:
            qseqs = reads.select("qid", F.col("seq").alias("seq1"))
        aligned = align_top_candidates(
            cands, qseqs, tgt_seqs.select("tgt", "seq"), cfg
        )
        if args.out:
            aligned.write.mode("overwrite").parquet(
                os.path.join(args.out, "alignments.parquet")
            )
            aligned = spark.read.parquet(
                os.path.join(args.out, "alignments.parquet")
            )
        else:
            aligned = aligned.persist()
        out["alignments"] = aligned.count()
        out["align_score_sum"] = int(
            aligned.agg(F.sum("align_score")).first()[0] or 0
        )
    if truth is not None:
        out["truth_known"] = truth.where(
            F.col("truth_taxid").isNotNull()
        ).count()
    if args.nodes:
        if lowest:
            # candidates are already taxa — classification maps them
            # through identity, using the SAME lift rule the merge used
            from metacache_mpi_spark.operators.genomic import (
                lifted_taxid_map,
            )

            identity = {
                t: t for t in lifted_taxid_map(tax, tmap, lowest).values()
            }
        else:
            identity = None
        counts, assigned = _classify_and_write(
            spark, args, cands, meta, cfg, args.out, tdim_override=identity
        )
        out.update(counts)
        if getattr(args, "precision", False):
            # per-rank sensitivity/precision (A9/A10,
            # classification_statistics.h:91-224) over assignment vs
            # ground truth; the 10-row table rides in the JSON line and
            # lands as parquet under --out
            from metacache_mpi_spark.operators.evaluate import (
                per_rank_stats,
                rank_positions,
            )

            # the stats population is EVERY query with resolved truth,
            # not only those that produced candidates: a read whose
            # matches all fell below hitsMin is UNCLASSIFIED and must
            # lower sensitivity (classification_statistics.h counts all
            # queries) — joining FROM the assigned side would silently
            # drop it and inflate sensitivity
            joined = truth.join(
                assigned.select("qid", "taxid"), "qid", "left"
            )
            stats = per_rank_stats(rank_positions(joined, tax))
            if args.out:
                stats.write.mode("overwrite").parquet(
                    os.path.join(args.out, "precision.parquet")
                )
            out["precision"] = {
                r["rank"]: {
                    "sensitivity_micro": r["sensitivity_micro"],
                    "precision_micro": r["precision_micro"],
                }
                for r in stats.collect()
            }
        if getattr(args, "taxon_coverage", False):
            # per-rank DB-coverage confusion table (-taxon-coverage,
            # classification.cpp:294-320 + stat_confusion.h:37-130):
            # each ranked truth-lineage taxon scored covered×classified
            from metacache_mpi_spark.operators.evaluate import (
                coverage_stats,
                db_covered_taxa,
            )

            legacy = _legacy_map(args.db, meta)
            if legacy is not None:
                tgt_taxids = list(legacy.values())
            else:
                tgt_taxids = [
                    r["taxid"]
                    for r in spark.read.parquet(
                        os.path.join(args.db, "targets.parquet")
                    ).where(F.col("taxid").isNotNull())
                    .select("taxid").collect()
                ]
            covered = db_covered_taxa(tax, tgt_taxids)
            cov_joined = truth.join(
                assigned.select("qid", "taxid"), "qid", "left"
            )
            cov = coverage_stats(cov_joined, tax, covered)
            if args.out:
                cov.write.mode("overwrite").parquet(
                    os.path.join(args.out, "taxon_coverage.parquet")
                )
                cov = spark.read.parquet(
                    os.path.join(args.out, "taxon_coverage.parquet")
                )
            out["taxon_coverage"] = {
                r["rank"]: {
                    "tp": r["tp"], "fp": r["fp"],
                    "tn": r["tn"], "fn": r["fn"],
                    "accuracy_micro": r["accuracy_micro"],
                }
                for r in cov.collect()
            }
        if getattr(args, "abundance_per", None):
            # A6 hierarchical abundance at the requested rank
            # (classification.cpp:362-428)
            from metacache_mpi_spark.operators.taxonomy import (
                abundance_estimate_df,
            )

            ab = abundance_estimate_df(assigned, tax, args.abundance_per)
            if args.out:
                ab.write.mode("overwrite").parquet(
                    os.path.join(args.out, "abundance.parquet")
                )
                ab = spark.read.parquet(
                    os.path.join(args.out, "abundance.parquet")
                )
            out["abundance_taxa"] = ab.count()
    if truth is not None:
        truth.unpersist()
    return out


def _classify_and_write(spark, args, cands, meta, cfg, out_dir, tdim_override=None):
    """Ranked-LCA classification tail shared by query and merge: load
    the taxonomy, join the targets dim (or a legacy meta.json map),
    classify, optionally persist assignments; returns (count dict,
    assignments DataFrame) — the DataFrame feeds the evaluation flags.
    ``tdim_override``: explicit target→taxid mapping (the --lowest path
    passes an identity map: its candidates are already taxa)."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.taxonomy import (
        Taxonomy,
        classify_lca,
        parse_nodes_dmp,
        taxon_counts,
    )

    tax = Taxonomy.from_dataframe(parse_nodes_dmp(spark, args.nodes))
    # targets dim joins in relationally (see cmd_build); legacy DBs
    # carry the map in meta.json (_legacy_map precedence: the parquet
    # dim wins when both exist)
    if tdim_override is not None:
        tdim = tdim_override
    else:
        tdim = _legacy_map(args.db, meta)
        if tdim is None:
            tdim = (
                spark.read.parquet(
                    os.path.join(args.db, "targets.parquet")
                )
                .where(F.col("taxid").isNotNull())
                .select("tgt", "taxid")
            )
    assigned = classify_lca(
        cands, tax, tdim, hits_min=cfg.hits_min_effective
    )
    if out_dir:
        # read the snapshot back so the counts and any evaluation pass
        # scan the written parquet instead of re-running the chain
        assigned.write.mode("overwrite").parquet(
            os.path.join(out_dir, "assignments.parquet")
        )
        assigned = spark.read.parquet(
            os.path.join(out_dir, "assignments.parquet")
        )
    else:
        assigned = assigned.persist()
    return (
        {
            "classified": assigned.where(F.col("taxid").isNotNull()).count(),
            "taxa": taxon_counts(assigned).count(),
        },
        assigned,
    )


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
        counts, _ = _classify_and_write(
            spark, args, merged, meta, cfg, args.out
        )
        out.update(counts)
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
    if what in ("featuremap", "features"):
        # show_feature_map (mode_info.cpp:105-129, CLI aliases
        # 'features'/'featuremap' at :329-330): one sorted row per
        # feature with the full location list — the golden dump for
        # index diffing (operators.genomic.dump_feature_map)
        from metacache_mpi_spark.operators.genomic import dump_feature_map

        fm = dump_feature_map(index)
        if args.out:
            fm.write.mode("overwrite").parquet(args.out)
            fm = spark.read.parquet(args.out)
        return {**out, "features": fm.count()}
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
    # post-processing (mode_build.cpp:113-131)
    b.add_argument("--remove-overpopulated", action="store_true")
    b.add_argument(
        "--remove-ambig-features", default=None, metavar="RANK",
        help="drop features spanning too many taxa at RANK "
        "('sequence' counts raw taxids; higher ranks need --nodes)",
    )
    b.add_argument("--max-ambig-per-feature", type=int, default=1)
    b.add_argument("--nodes", default=None)

    mo = sub.add_parser("modify", parents=[common])
    mo.add_argument("--targets", required=True)
    mo.add_argument("--db", required=True)
    mo.add_argument("--remove-overpopulated", action="store_true")

    q = sub.add_parser("query", parents=[common])
    q.add_argument("--db", required=True)
    q.add_argument("--reads", required=True)
    q.add_argument("--reads2", default=None)
    q.add_argument("--nodes", default=None)
    q.add_argument("--out", default=None)
    # evaluation surface (classification.cpp:294-353,
    # query_options.cpp:205-210): ground truth, per-rank precision,
    # clade exclusion, per-rank abundance
    q.add_argument(
        "--truth",
        nargs="?",
        const="header",
        default=None,
        help="ground truth: 'header' (taxid|N token) or an "
        "accession2taxid mapping file (full 4-strategy chain)",
    )
    q.add_argument("--precision", action="store_true")
    q.add_argument(
        "--taxon-coverage",
        action="store_true",
        help="per-rank DB-coverage confusion table (tp/fp/tn/fn) over "
        "the ground-truth lineages (needs --truth and --nodes; "
        "reference -taxon-coverage)",
    )
    q.add_argument("--exclude", default=None, metavar="RANK")
    q.add_argument("--abundance-per", default=None, metavar="RANK")
    q.add_argument(
        "--lowest", default=None, metavar="RANK",
        help="merge candidates below RANK before top-k (A3; "
        "candidates become taxa at that rank)",
    )
    q.add_argument("--insert-size-max", type=int, default=0)
    q.add_argument(
        "--align",
        default=None,
        metavar="TARGETS_FASTA",
        help="semi-global-align each read to its top candidate's "
        "window range (both strands, paired mates added per strand); "
        "takes the build-time targets FASTA to fetch target text "
        "(reference -align, classification.cpp:437-477)",
    )

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
        choices=[
            "statistics", "targets", "lineages", "featurecounts",
            "featuremap", "features",
        ],
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
        "modify": cmd_modify,
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
