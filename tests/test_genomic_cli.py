"""scripts/genomic_job.py CLI internals: multi-file paired-end mate
pairing (mates must pair by (file position, record position), never
cross files) and the driver-collect-free build (targets.parquet dim
joined in classification instead of a meta.json dict).

Mirrors the reference's paired reader over matched file lists
(/root/reference/src/sequence_io.cpp pair readers) and its replicated
taxa metadata (/root/reference/src/sketch_database.h:545-560)."""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

_SPEC = importlib.util.spec_from_file_location(
    "genomic_job",
    os.path.join(
        os.path.dirname(__file__), "..", "scripts", "genomic_job.py"
    ),
)
genomic_job = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(genomic_job)


def _dna(rng, n):
    return "".join("ACGT"[i] for i in rng.randint(0, 4, size=n))


@pytest.fixture(scope="module")
def cli_fixture(tmp_path_factory):
    """targets.fasta (taxid| headers), nodes.dmp, and TWO mate-1 files
    + TWO mate-2 files whose mates correspond by sorted filename +
    record position."""
    rng = np.random.RandomState(7)
    d = tmp_path_factory.mktemp("cli")
    genomes = {t: _dna(rng, 800) for t in (5, 6)}
    (d / "targets.fasta").write_text(
        "".join(f">taxid|{t} g{t}\n{g}\n" for t, g in sorted(genomes.items()))
    )
    (d / "nodes.dmp").write_text(
        "1\t|\t1\t|\troot\t|\n"
        "2\t|\t1\t|\tdomain\t|\n"
        "4\t|\t2\t|\tgenus\t|\n"
        "5\t|\t4\t|\tspecies\t|\n"
        "6\t|\t4\t|\tspecies\t|\n"
    )
    reads_dir = d / "reads1"
    mates_dir = d / "reads2"
    reads_dir.mkdir()
    mates_dir.mkdir()
    truth = []  # (file_tag, ridx, seq1, seq2)
    for tag, t in (("a", 5), ("b", 6)):
        g = genomes[t]
        r1, r2 = [], []
        for i in range(4):
            s = int(rng.randint(0, 500))
            r1.append(g[s : s + 100])
            r2.append(g[s + 150 : s + 250])
            truth.append((tag, i, r1[-1], r2[-1]))
        (reads_dir / f"{tag}_1.fastq").write_text(
            "".join(
                f"@{tag}r{i}/1\n{s}\n+\n{'!' * len(s)}\n"
                for i, s in enumerate(r1)
            )
        )
        (mates_dir / f"{tag}_2.fastq").write_text(
            "".join(
                f"@{tag}r{i}/2\n{s}\n+\n{'!' * len(s)}\n"
                for i, s in enumerate(r2)
            )
        )
    db = str(d / "db")
    return {
        "dir": d,
        "db": db,
        "targets": str(d / "targets.fasta"),
        "nodes": str(d / "nodes.dmp"),
        "reads1": str(reads_dir),
        "reads2": str(mates_dir),
        "truth": truth,
    }


@pytest.fixture(scope="module")
def built_db(spark, cli_fixture):
    args = argparse.Namespace(
        targets=cli_fixture["targets"],
        db=cli_fixture["db"],
        k=8,
        sketch=8,
        winlen=64,
        winstride=57,
        max_cand=2,
    )
    out = genomic_job.cmd_build(spark, args)
    assert out["targets"] == 2
    return cli_fixture["db"]


def test_build_writes_targets_dim_not_driver_dict(spark, built_db):
    meta = json.load(open(os.path.join(built_db, "meta.json")))
    assert "target_taxid" not in meta  # no driver-collected map
    dim = spark.read.parquet(os.path.join(built_db, "targets.parquet"))
    assert set(dim.columns) == {"tgt", "taxid", "header"}
    assert sorted(
        r["taxid"] for r in dim.select("taxid").collect()
    ) == [5, 6]


def test_paired_multifile_mates_never_cross_files(
    spark, cli_fixture, built_db
):
    """The regression for the r3 advice: joining mates on record_idx
    alone cross-pairs mates from different files.  With 2 files per
    side the CLI's paired input must contain exactly one (seq1, seq2)
    row per true mate pair — byte-identical to the ground truth."""
    from metacache_mpi_spark.sources.bio import read_sequences

    r1, n1 = genomic_job._with_file_index(
        read_sequences(spark, cli_fixture["reads1"]), cli_fixture["reads1"]
    )
    r2, n2 = genomic_job._with_file_index(
        read_sequences(spark, cli_fixture["reads2"]), cli_fixture["reads2"]
    )
    assert n1 == n2 == 2
    r1 = r1.select(
        "fidx",
        F.col("record_idx").alias("ridx"),
        F.col("seq").alias("seq1"),
    )
    r2 = r2.select(
        "fidx",
        F.col("record_idx").alias("ridx"),
        F.col("seq").alias("seq2"),
    )
    paired = r1.join(r2, ["fidx", "ridx"]).select("seq1", "seq2")
    got = sorted(
        (r["seq1"], r["seq2"]) for r in paired.collect()
    )
    want = sorted((s1, s2) for _, _, s1, s2 in cli_fixture["truth"])
    assert got == want  # no cross-file pairs, no duplicates


def test_paired_query_classifies_with_dim_join(
    spark, cli_fixture, built_db
):
    args = argparse.Namespace(
        db=built_db,
        reads=cli_fixture["reads1"],
        reads2=cli_fixture["reads2"],
        nodes=cli_fixture["nodes"],
        out=None,
    )
    out = genomic_job.cmd_query(spark, args)
    n_reads = len(cli_fixture["truth"])
    # every read is a genuine fragment of its target; the paired input
    # after the fix holds exactly n_reads rows, so candidate qids are
    # bounded by n_reads (cross-pairing fed 4 pairings per ridx)
    assert out["candidates"] >= n_reads
    assert n_reads * 0.7 <= out["classified"] <= n_reads
    assert out["taxa"] >= 1


def test_single_end_query_matches_api(spark, cli_fixture, built_db):
    args = argparse.Namespace(
        db=built_db,
        reads=cli_fixture["reads1"],
        reads2=None,
        nodes=cli_fixture["nodes"],
        out=None,
    )
    out = genomic_job.cmd_query(spark, args)
    assert out["candidates"] > 0
    assert out["classified"] > 0


def test_paired_query_rejects_mismatched_file_lists(
    spark, cli_fixture, built_db, tmp_path
):
    import shutil

    lonely = tmp_path / "lonely"
    lonely.mkdir()
    src = sorted(os.listdir(cli_fixture["reads2"]))[0]
    shutil.copy(os.path.join(cli_fixture["reads2"], src), lonely / src)
    args = argparse.Namespace(
        db=built_db,
        reads=cli_fixture["reads1"],  # two files
        reads2=str(lonely),           # one file
        nodes=None,
        out=None,
    )
    with pytest.raises(ValueError, match="matching file lists"):
        genomic_job.cmd_query(spark, args)


def test_merge_classifies_like_reference(
    spark, cli_fixture, built_db, tmp_path
):
    """The reference's merge mode classifies merged candidate lists
    (mode_merge.cpp); self-merge with --nodes must reproduce the
    single-shard query's classification counts exactly."""
    q = argparse.Namespace(
        db=built_db,
        reads=cli_fixture["reads1"],
        reads2=None,
        nodes=cli_fixture["nodes"],
        out=str(tmp_path / "q"),
    )
    qout = genomic_job.cmd_query(spark, q)
    m = argparse.Namespace(
        db=built_db,
        results=[str(tmp_path / "q"), str(tmp_path / "q")],
        out=str(tmp_path / "m"),
        nodes=cli_fixture["nodes"],
    )
    mout = genomic_job.cmd_merge(spark, m)
    assert mout["merged_candidates"] == qout["candidates"]
    assert mout["classified"] == qout["classified"]
    assert mout["taxa"] == qout["taxa"]


def test_info_submodes(spark, cli_fixture, built_db, tmp_path):
    """info statistics/targets/lineages/featurecounts — the reference's
    mode_info.cpp submode surface."""
    base = dict(db=built_db, nodes=None, out=None)
    stats = genomic_job.cmd_info(
        spark, argparse.Namespace(**base, what="statistics")
    )
    assert stats["n_buckets"] > 0
    targets = genomic_job.cmd_info(
        spark, argparse.Namespace(**base, what="targets")
    )
    assert targets["targets"] == 2 and targets["with_taxid"] == 2
    fc = genomic_job.cmd_info(
        spark,
        argparse.Namespace(
            db=built_db, nodes=None, out=str(tmp_path / "fc"),
            what="featurecounts",
        ),
    )
    assert fc["features"] == stats["n_buckets"]
    assert fc["max_locations"] == stats["max_sz"]
    lin = genomic_job.cmd_info(
        spark,
        argparse.Namespace(
            db=built_db, nodes=cli_fixture["nodes"],
            out=str(tmp_path / "lin"), what="lineages",
        ),
    )
    assert lin["targets"] == 2 and lin["taxa"] == 2
    rows = spark.read.parquet(str(tmp_path / "lin")).collect()
    # species 5 under genus 4 under domain 2 under root 1
    by_tax = {r["taxid"]: r["ranked_lineage"] for r in rows}
    assert 4 in by_tax[5] and 2 in by_tax[5]


def test_annotate_mode(spark, cli_fixture, tmp_path):
    """annotate mode: headers gain taxid|N| tokens from an
    accession2taxid mapping; unmapped sequences get taxid|0|."""
    fa = tmp_path / "seqs.fasta"
    fa.write_text(
        ">AB123456.1 first\nACGTACGT\n"
        ">XY999999.2 second\nGGGGCCCC\n"
    )
    tsv = tmp_path / "map.tsv"
    tsv.write_text(
        "accession\taccession.version\ttaxid\tgi\n"
        "AB123456\tAB123456.1\t77\t1\n"
    )
    args = argparse.Namespace(
        input=str(fa),
        mapping=str(tsv),
        out=str(tmp_path / "annotated"),
        idtype="accver",
    )
    out = genomic_job.cmd_annotate(spark, args)
    assert out == {
        "mode": "annotate", "sequences": 2, "annotated": 1,
        "unmapped": 1, "untagged": 0,
    }
    text = "".join(
        r["value"] + "\n"
        for r in spark.read.text(str(tmp_path / "annotated")).collect()
    )
    assert "taxid|77|" in text and "taxid|0|" in text


def test_annotate_counts_untagged_headers(spark, tmp_path):
    """Headers with no extractable accession get NO token (the
    reference leaves them untouched) and must be counted as untagged,
    never as annotated (r4 review finding)."""
    fa = tmp_path / "mixed.fasta"
    fa.write_text(
        ">AB123456.1 mapped\nACGT\n"
        ">contig one with no accession here\nGGGG\n"
    )
    tsv = tmp_path / "m.tsv"
    tsv.write_text(
        "accession\taccession.version\ttaxid\tgi\n"
        "AB123456\tAB123456.1\t77\t1\n"
    )
    out = genomic_job.cmd_annotate(
        spark,
        argparse.Namespace(
            input=str(fa), mapping=str(tsv),
            out=str(tmp_path / "o"), idtype="accver",
        ),
    )
    assert out == {
        "mode": "annotate", "sequences": 2, "annotated": 1,
        "unmapped": 0, "untagged": 1,
    }


def test_modify_equals_rebuild(spark, tmp_path):
    """build(A) + modify(B) must equal build(A ∪ B) on index rows,
    targets dim and query output — the mode_build_modify contract
    (/root/reference/src/mode_build.cpp main_mode_build_modify)."""
    rng = np.random.RandomState(3)
    d = tmp_path / "targets_all"
    d.mkdir()
    genomes = {t: _dna(rng, 700) for t in (5, 6, 7, 8)}
    (d / "a.fasta").write_text(
        "".join(f">taxid|{t} g{t}\n{genomes[t]}\n" for t in (5, 6))
    )
    (d / "b.fasta").write_text(
        "".join(f">taxid|{t} g{t}\n{genomes[t]}\n" for t in (7, 8))
    )
    build_kw = dict(k=8, sketch=8, winlen=64, winstride=57, max_cand=2)
    db_inc = str(tmp_path / "db_inc")
    db_full = str(tmp_path / "db_full")
    genomic_job.cmd_build(
        spark,
        argparse.Namespace(targets=str(d / "a.fasta"), db=db_inc, **build_kw),
    )
    mod = genomic_job.cmd_modify(
        spark,
        argparse.Namespace(
            targets=str(d / "b.fasta"), db=db_inc, remove_overpopulated=False
        ),
    )
    assert mod["new_targets"] == 2 and mod["skipped_existing"] == 0
    assert mod["targets"] == 4
    genomic_job.cmd_build(
        spark, argparse.Namespace(targets=str(d), db=db_full, **build_kw)
    )

    def idx_rows(db):
        return sorted(
            (r["feature"], r["tgt"], r["win"])
            for r in spark.read.parquet(
                os.path.join(db, "index.parquet")
            ).collect()
        )

    assert idx_rows(db_inc) == idx_rows(db_full)
    dim_inc = sorted(
        (r["tgt"], r["taxid"])
        for r in spark.read.parquet(
            os.path.join(db_inc, "targets.parquet")
        ).collect()
    )
    dim_full = sorted(
        (r["tgt"], r["taxid"])
        for r in spark.read.parquet(
            os.path.join(db_full, "targets.parquet")
        ).collect()
    )
    assert dim_inc == dim_full

    # query output equality on reads planted in the NEW targets
    reads = tmp_path / "reads.fastq"
    reads.write_text(
        "".join(
            f"@r{i}\n{genomes[7 + i % 2][int(50 * i):int(50 * i) + 120]}\n"
            f"+\n{'!' * 120}\n"
            for i in range(4)
        )
    )
    outs = []
    for db in (db_inc, db_full):
        q = argparse.Namespace(
            db=db, reads=str(reads), reads2=None, nodes=None,
            out=str(tmp_path / f"q_{os.path.basename(db)}"),
        )
        outs.append(genomic_job.cmd_query(spark, q))
    assert outs[0]["candidates"] == outs[1]["candidates"] > 0
    cand_rows = [
        sorted(
            (r["qid"], r["tgt"], r["hits"], r["win_beg"], r["rank"])
            for r in spark.read.parquet(
                str(tmp_path / f"q_{os.path.basename(db)}" / "candidates.parquet")
            ).collect()
        )
        for db in (db_inc, db_full)
    ]
    assert cand_rows[0] == cand_rows[1]

    # re-modifying with the same file is a no-op (ids already present)
    again = genomic_job.cmd_modify(
        spark,
        argparse.Namespace(
            targets=str(d / "b.fasta"), db=db_inc, remove_overpopulated=False
        ),
    )
    assert again["new_targets"] == 0 and again["skipped_existing"] == 2
    assert idx_rows(db_inc) == idx_rows(db_full)


def test_modify_recaps_capped_features(spark):
    """The P17 cap must hold ACROSS the union: capping is an idempotent
    smallest-k selection, so extend-then-recap equals rebuild even when
    the stored index was already capped (operator-level gate with a
    tiny cap and deliberately shared features)."""
    from metacache_mpi_spark.operators.genomic import (
        GenomicConfig,
        build_index,
        modify_index,
    )

    cfg = GenomicConfig(
        k=8, sketch_size=8, winlen=64, winstride=57, max_locs_per_feature=3
    )
    seq = "ACGTACGTACGTACGTACGTACGTACGTACGT"  # identical → shared features
    a = spark.createDataFrame(
        [(t, seq) for t in range(5)], "tgt long, seq string"
    )
    b = spark.createDataFrame(
        [(t, seq) for t in range(5, 9)], "tgt long, seq string"
    )
    ab = a.unionByName(b)
    inc = modify_index(build_index(a, cfg), b, cfg)
    full = build_index(ab, cfg)
    key = lambda df: sorted(  # noqa: E731
        (r["feature"], r["tgt"], r["win"]) for r in df.collect()
    )
    rows = key(inc)
    assert rows == key(full)
    # the cap actually bound: no feature carries more than 3 locations
    from collections import Counter

    per_feature = Counter(f for f, _, _ in rows)
    assert max(per_feature.values()) == 3


@pytest.fixture(scope="module")
def eval_reads(cli_fixture):
    """Reads whose FASTQ headers carry taxid|N ground-truth tokens —
    the header strategy of the J6 truth chain."""
    rng = np.random.RandomState(21)
    d = cli_fixture["dir"]
    path = d / "eval_reads.fastq"
    from metacache_mpi_spark.sources.bio import read_sequences  # noqa: F401

    # re-derive the target genomes deterministically (same RNG stream
    # as cli_fixture)
    rng7 = np.random.RandomState(7)
    genomes = {t: _dna(rng7, 800) for t in (5, 6)}
    recs = []
    for t in (5, 6):
        for i in range(4):
            s = int(rng.randint(0, 600))
            recs.append((t, i, genomes[t][s : s + 120]))
    # one read with KNOWN truth but a sequence alien to both targets:
    # it produces zero candidates and must still count in the
    # sensitivity denominator (classification_statistics counts every
    # query; the r5 review caught the assigned-side join dropping it)
    recs.append((5, 99, "A" * 120))
    path.write_text(
        "".join(
            f"@taxid|{t}|r{i}\n{s}\n+\n{'!' * len(s)}\n" for t, i, s in recs
        )
    )
    return str(path)


def test_query_eval_flags(spark, cli_fixture, built_db, eval_reads, tmp_path):
    """--truth / --precision / --abundance-per end to end: truth
    resolves from headers, the per-rank table lands in the JSON line
    and as parquet, abundance aggregates at the requested rank."""
    out_dir = str(tmp_path / "evalq")
    args = argparse.Namespace(
        db=built_db, reads=eval_reads, reads2=None,
        nodes=cli_fixture["nodes"], out=out_dir,
        truth="header", precision=True, exclude=None,
        abundance_per="genus",
    )
    out = genomic_job.cmd_query(spark, args)
    assert out["truth_known"] == 9
    assert out["classified"] > 0
    prec = out["precision"]
    assert prec["species"]["sensitivity_micro"] > 0
    # the zero-candidate truth read caps sensitivity strictly below
    # 1.0 — the denominator must include reads that never produced
    # candidates (review finding: assigned-side join dropped them)
    assert prec["species"]["sensitivity_micro"] <= 888_889
    # every correct species call is also correct at genus — cumulative
    assert (
        prec["genus"]["sensitivity_micro"]
        >= prec["species"]["sensitivity_micro"]
    )
    assert out["abundance_taxa"] >= 1
    assert os.path.exists(os.path.join(out_dir, "precision.parquet"))
    ab = spark.read.parquet(os.path.join(out_dir, "abundance.parquet"))
    # both species hang off genus 4: all abundance lifts there
    assert [r["taxid"] for r in ab.collect()] == [4]


def test_query_exclude_clade(spark, cli_fixture, built_db, eval_reads):
    """--exclude RANK (classification.cpp:174-181): excluding at
    species removes each read's own target's matches (the genus-mate
    can still hit); excluding at genus removes BOTH targets (they share
    genus 4) — zero candidates."""
    base = dict(
        db=built_db, reads=eval_reads, reads2=None,
        nodes=cli_fixture["nodes"], out=None, truth="header",
        precision=False, abundance_per=None,
    )
    plain = genomic_job.cmd_query(
        spark, argparse.Namespace(**base, exclude=None)
    )
    at_species = genomic_job.cmd_query(
        spark, argparse.Namespace(**base, exclude="species")
    )
    at_genus = genomic_job.cmd_query(
        spark, argparse.Namespace(**base, exclude="genus")
    )
    assert plain["candidates"] > 0
    assert at_species["candidates"] < plain["candidates"]
    assert at_genus["candidates"] == 0


def test_query_eval_flag_validation(spark, cli_fixture, built_db):
    with pytest.raises(ValueError, match="--precision needs --truth"):
        genomic_job.cmd_query(
            spark,
            argparse.Namespace(
                db=built_db, reads=cli_fixture["reads1"], reads2=None,
                nodes=None, out=None, truth=None, precision=True,
                exclude=None, abundance_per=None,
            ),
        )
    with pytest.raises(ValueError, match="--exclude needs"):
        genomic_job.cmd_query(
            spark,
            argparse.Namespace(
                db=built_db, reads=cli_fixture["reads1"], reads2=None,
                nodes=None, out=None, truth="header", precision=False,
                exclude="genus", abundance_per=None,
            ),
        )


def test_file_index_handles_plus_and_space_in_names(spark, tmp_path):
    """url_decode has form semantics ('+' → space): a file whose name
    contains a literal '+' must still map to its mate index (r4 advice);
    '%20'-encoded spaces keep decoding correctly."""
    from metacache_mpi_spark.sources.bio import read_sequences

    d = tmp_path / "plusdir"
    d.mkdir()
    (d / "a+b sample.fasta").write_text(">r0\nACGTACGTACGT\n")
    (d / "c.fasta").write_text(">r1\nTTTTGGGGCCCC\n")
    df, n = genomic_job._with_file_index(
        read_sequences(spark, str(d)), str(d)
    )
    rows = df.select("fidx", "header").collect()  # raises if unmapped
    assert n == 2
    got = {r["header"]: r["fidx"] for r in rows}
    assert got == {"r0": 0, "r1": 1}  # sorted order: 'a+b…' before 'c'


def test_build_remove_ambig_features(spark, cli_fixture, tmp_path):
    """--remove-ambig-features sequence (P14, mode_build.cpp:121-131):
    features whose locations span >1 distinct taxid disappear; the
    surviving index maps every feature to exactly one taxon."""
    kw = dict(
        k=8, sketch=8, winlen=64, winstride=57, max_cand=2,
        remove_overpopulated=False, nodes=None,
    )
    db_plain = str(tmp_path / "db_plain")
    db_ambig = str(tmp_path / "db_ambig")
    plain = genomic_job.cmd_build(
        spark,
        argparse.Namespace(
            targets=cli_fixture["targets"], db=db_plain,
            remove_ambig_features=None, max_ambig_per_feature=1, **kw,
        ),
    )
    ambig = genomic_job.cmd_build(
        spark,
        argparse.Namespace(
            targets=cli_fixture["targets"], db=db_ambig,
            remove_ambig_features="sequence", max_ambig_per_feature=1, **kw,
        ),
    )
    assert ambig["index_rows"] < plain["index_rows"]
    idx = spark.read.parquet(os.path.join(db_ambig, "targets.parquet")).join(
        spark.read.parquet(os.path.join(db_ambig, "index.parquet")), "tgt"
    )
    per_feature = idx.groupBy("feature").agg(
        F.countDistinct("taxid").alias("n")
    )
    assert per_feature.where(F.col("n") > 1).count() == 0


def test_build_remove_ambig_at_genus_drops_everything_shared(
    spark, cli_fixture, tmp_path
):
    """At genus level both fixture species lift to genus 4, so NO
    feature is ambiguous — the rank lift must make the filter a no-op
    here (rank semantics, not raw-taxid semantics)."""
    kw = dict(
        k=8, sketch=8, winlen=64, winstride=57, max_cand=2,
        remove_overpopulated=False,
    )
    db_p = str(tmp_path / "db_p")
    db_g = str(tmp_path / "db_g")
    plain = genomic_job.cmd_build(
        spark,
        argparse.Namespace(
            targets=cli_fixture["targets"], db=db_p, nodes=None,
            remove_ambig_features=None, max_ambig_per_feature=1, **kw,
        ),
    )
    genus = genomic_job.cmd_build(
        spark,
        argparse.Namespace(
            targets=cli_fixture["targets"], db=db_g,
            nodes=cli_fixture["nodes"],
            remove_ambig_features="genus", max_ambig_per_feature=1, **kw,
        ),
    )
    assert genus["index_rows"] == plain["index_rows"]


def test_info_featuremap(spark, built_db, tmp_path):
    out = genomic_job.cmd_info(
        spark,
        argparse.Namespace(
            db=built_db, nodes=None, out=str(tmp_path / "fm"),
            what="featuremap",
        ),
    )
    stats = genomic_job.cmd_info(
        spark,
        argparse.Namespace(db=built_db, nodes=None, out=None,
                           what="statistics"),
    )
    assert out["features"] == stats["n_buckets"]
    fm = spark.read.parquet(str(tmp_path / "fm"))
    assert set(fm.columns) == {"feature", "locations"}
    row = fm.first()
    assert row["locations"] == sorted(row["locations"])


def test_query_lowest_merges_to_rank(spark, cli_fixture, built_db, tmp_path):
    """--lowest genus (A3): candidates become taxa at genus level —
    both fixture species share genus 4, so every candidate row carries
    tgt=4 and classification assigns genus 4."""
    out_dir = str(tmp_path / "qlow")
    out = genomic_job.cmd_query(
        spark,
        argparse.Namespace(
            db=built_db, reads=cli_fixture["reads1"], reads2=None,
            nodes=cli_fixture["nodes"], out=out_dir,
            truth=None, precision=False, exclude=None, abundance_per=None,
            lowest="genus", insert_size_max=0,
        ),
    )
    assert out["lowest"] == "genus"
    assert out["candidates"] > 0 and out["classified"] > 0
    cands = spark.read.parquet(os.path.join(out_dir, "candidates.parquet"))
    assert {r["tgt"] for r in cands.select("tgt").distinct().collect()} == {4}
    asg = spark.read.parquet(os.path.join(out_dir, "assignments.parquet"))
    assert {
        r["taxid"]
        for r in asg.where(F.col("taxid").isNotNull()).collect()
    } == {4}


def test_paired_query_insert_size_max(spark, cli_fixture, built_db):
    """--insert-size-max widens the A1 span floor
    (classification.cpp:217-219) — must run end to end and keep every
    true pair classified."""
    out = genomic_job.cmd_query(
        spark,
        argparse.Namespace(
            db=built_db, reads=cli_fixture["reads1"],
            reads2=cli_fixture["reads2"], nodes=cli_fixture["nodes"],
            out=None, truth=None, precision=False, exclude=None,
            abundance_per=None, lowest=None, insert_size_max=400,
        ),
    )
    assert out["candidates"] > 0 and out["classified"] > 0


def test_modify_retry_after_partial_commit_is_idempotent(spark, tmp_path):
    """Simulated crash between the two commit renames (index swapped,
    dim not): retrying the SAME modify must not duplicate index rows
    (anti-join includes the index's target set) and must repair the
    dim's missing metadata rows (orphan repair) — ending identical to
    a clean build(A ∪ B)."""
    import shutil

    rng = np.random.RandomState(9)
    d = tmp_path / "t"
    d.mkdir()
    genomes = {t: _dna(rng, 600) for t in (5, 6, 7)}
    (d / "a.fasta").write_text(
        "".join(f">taxid|{t} g{t}\n{genomes[t]}\n" for t in (5, 6))
    )
    (d / "b.fasta").write_text(f">taxid|7 g7\n{genomes[7]}\n")
    kw = dict(k=8, sketch=8, winlen=64, winstride=57, max_cand=2,
              remove_overpopulated=False, nodes=None,
              remove_ambig_features=None, max_ambig_per_feature=1)
    db = str(tmp_path / "db")
    db_full = str(tmp_path / "db_full")
    genomic_job.cmd_build(
        spark, argparse.Namespace(targets=str(d / "a.fasta"), db=db, **kw)
    )
    # snapshot the pre-modify dim, run the modify, then roll ONLY the
    # dim back — the exact state a crash between the two renames leaves
    pre_dim = str(tmp_path / "pre_dim")
    shutil.copytree(os.path.join(db, "targets.parquet"), pre_dim)
    genomic_job.cmd_modify(
        spark,
        argparse.Namespace(
            targets=str(d / "b.fasta"), db=db, remove_overpopulated=False
        ),
    )
    shutil.rmtree(os.path.join(db, "targets.parquet"))
    shutil.copytree(pre_dim, os.path.join(db, "targets.parquet"))

    retry = genomic_job.cmd_modify(
        spark,
        argparse.Namespace(
            targets=str(d / "b.fasta"), db=db, remove_overpopulated=False
        ),
    )
    assert retry["new_targets"] == 0  # already in the index → skipped
    genomic_job.cmd_build(
        spark, argparse.Namespace(targets=str(d), db=db_full, **kw)
    )

    def rows(p, cols):
        return sorted(
            tuple(r[c] for c in cols)
            for r in spark.read.parquet(p).collect()
        )

    assert rows(
        os.path.join(db, "index.parquet"), ("feature", "tgt", "win")
    ) == rows(
        os.path.join(db_full, "index.parquet"), ("feature", "tgt", "win")
    )
    # the orphaned target's metadata row was repaired into the dim
    assert rows(
        os.path.join(db, "targets.parquet"), ("tgt", "taxid")
    ) == rows(
        os.path.join(db_full, "targets.parquet"), ("tgt", "taxid")
    )


def test_modify_upgrades_legacy_meta_db(spark, tmp_path):
    """A legacy DB (target map in meta.json, no targets.parquet) must
    be modifiable: the map lifts into the parquet dim (null headers),
    new targets append, and the legacy key retires."""
    import json as _json
    import shutil

    rng = np.random.RandomState(15)
    d = tmp_path / "t"
    d.mkdir()
    genomes = {t: _dna(rng, 600) for t in (5, 6, 7)}
    (d / "a.fasta").write_text(
        "".join(f">taxid|{t} g{t}\n{genomes[t]}\n" for t in (5, 6))
    )
    (d / "b.fasta").write_text(f">taxid|7 g7\n{genomes[7]}\n")
    kw = dict(k=8, sketch=8, winlen=64, winstride=57, max_cand=2,
              remove_overpopulated=False, nodes=None,
              remove_ambig_features=None, max_ambig_per_feature=1)
    db = str(tmp_path / "db")
    genomic_job.cmd_build(
        spark, argparse.Namespace(targets=str(d / "a.fasta"), db=db, **kw)
    )
    # convert to the legacy layout
    dim = {
        r["tgt"]: r["taxid"]
        for r in spark.read.parquet(
            os.path.join(db, "targets.parquet")
        ).collect()
    }
    shutil.rmtree(os.path.join(db, "targets.parquet"))
    meta = _json.load(open(os.path.join(db, "meta.json")))
    meta["target_taxid"] = {str(k): v for k, v in dim.items()}
    _json.dump(meta, open(os.path.join(db, "meta.json"), "w"))

    out = genomic_job.cmd_modify(
        spark,
        argparse.Namespace(
            targets=str(d / "b.fasta"), db=db, remove_overpopulated=False
        ),
    )
    assert out["new_targets"] == 1 and out["targets"] == 3
    meta2 = _json.load(open(os.path.join(db, "meta.json")))
    assert "target_taxid" not in meta2  # upgraded
    got = sorted(
        r["taxid"]
        for r in spark.read.parquet(
            os.path.join(db, "targets.parquet")
        ).collect()
    )
    assert got == [5, 6, 7]


def test_precision_without_nodes_raises(spark, cli_fixture, built_db):
    with pytest.raises(ValueError, match="--precision needs --nodes"):
        genomic_job.cmd_query(
            spark,
            argparse.Namespace(
                db=built_db, reads=cli_fixture["reads1"], reads2=None,
                nodes=None, out=None, truth="header", precision=True,
                exclude=None, abundance_per=None, lowest=None,
                insert_size_max=0,
            ),
        )


def test_query_taxon_coverage(
    spark, cli_fixture, built_db, eval_reads, tmp_path
):
    """--taxon-coverage (classification.cpp:294-320): both targets'
    lineages cover every truth taxon here, so fp=tn=0 at every rank,
    tp+fn equals the truth-resolved read count, and the
    zero-candidate alien read lands in fn at every rank."""
    out_dir = str(tmp_path / "covq")
    args = argparse.Namespace(
        db=built_db, reads=eval_reads, reads2=None,
        nodes=cli_fixture["nodes"], out=out_dir,
        truth="header", precision=False, exclude=None,
        abundance_per=None, taxon_coverage=True,
    )
    out = genomic_job.cmd_query(spark, args)
    cov = out["taxon_coverage"]
    assert {"species", "genus", "root"} <= set(cov)
    for rank, c in cov.items():
        assert c["fp"] == 0 and c["tn"] == 0, rank
        assert c["tp"] + c["fn"] == out["truth_known"], rank
    # the alien read (truth resolved, zero candidates, unclassified)
    # is a false negative at every rank
    assert cov["species"]["fn"] >= 1
    assert cov["root"]["fn"] >= 1
    # classified reads count tp at every lineage rank
    assert cov["root"]["tp"] >= cov["species"]["tp"] > 0
    pq_path = os.path.join(out_dir, "taxon_coverage.parquet")
    assert os.path.exists(pq_path)
    stored = spark.read.parquet(pq_path)
    assert stored.count() == len(cov)


def test_query_taxon_coverage_needs_truth(spark, cli_fixture, built_db):
    with pytest.raises(ValueError, match="--taxon-coverage needs --truth"):
        genomic_job.cmd_query(
            spark,
            argparse.Namespace(
                db=built_db, reads=cli_fixture["reads1"], reads2=None,
                nodes=cli_fixture["nodes"], out=None, truth=None,
                precision=False, exclude=None, abundance_per=None,
                taxon_coverage=True,
            ),
        )


def test_query_align_emits_alignments(
    spark, cli_fixture, built_db, tmp_path
):
    """--align: every rank-1 candidate yields one alignment row; reads
    are exact forward substrings of the genomes, so at least one
    aligns perfectly (100M CIGAR, score 2*100) on the + strand."""
    out_dir = str(tmp_path / "alnq")
    args = argparse.Namespace(
        db=built_db, reads=cli_fixture["reads1"], reads2=None,
        nodes=None, out=out_dir, truth=None, precision=False,
        exclude=None, abundance_per=None,
        align=cli_fixture["targets"],
    )
    out = genomic_job.cmd_query(spark, args)
    assert out["alignments"] > 0
    aln = spark.read.parquet(os.path.join(out_dir, "alignments.parquet"))
    rows = aln.collect()
    assert len(rows) == out["alignments"]
    # one alignment per query that produced candidates
    cands = spark.read.parquet(os.path.join(out_dir, "candidates.parquet"))
    n_rank1 = cands.where(F.col("rank") == 1).count()
    assert len(rows) == n_rank1
    perfect = [r for r in rows if r["cigar"] == "100M"]
    assert perfect, "no perfect alignment among exact-substring reads"
    assert all(r["align_score"] == 200 for r in perfect)
    assert all(r["strand"] == "+" for r in perfect)
    for r in rows:
        assert r["win_char_beg"] <= r["target_begin"] < r["win_char_end"]


def test_query_align_rejects_lowest(spark, cli_fixture, built_db):
    with pytest.raises(ValueError, match="--align is incompatible"):
        genomic_job.cmd_query(
            spark,
            argparse.Namespace(
                db=built_db, reads=cli_fixture["reads1"], reads2=None,
                nodes=cli_fixture["nodes"], out=None, truth=None,
                precision=False, exclude=None, abundance_per=None,
                lowest="genus", align=cli_fixture["targets"],
            ),
        )


def test_query_align_paired_adds_mate_scores(
    spark, cli_fixture, built_db, tmp_path
):
    """Paired --align: mate-2 scores join the per-strand totals
    (make_semi_global_alignment:79-104), so total_score > align_score
    whenever the mate also matches the window."""
    out_dir = str(tmp_path / "alnp")
    args = argparse.Namespace(
        db=built_db, reads=cli_fixture["reads1"],
        reads2=cli_fixture["reads2"], nodes=None, out=out_dir,
        truth=None, precision=False, exclude=None, abundance_per=None,
        insert_size_max=0, align=cli_fixture["targets"],
    )
    out = genomic_job.cmd_query(spark, args)
    assert out["alignments"] > 0
    aln = spark.read.parquet(os.path.join(out_dir, "alignments.parquet"))
    assert aln.where(
        F.col("total_score") > F.col("align_score")
    ).count() > 0
