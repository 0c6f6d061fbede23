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
