"""FASTA/FASTQ sources (S1/S2/S4/S5): record parsing, multi-line
bodies, pairing modes, format sniffing."""

from __future__ import annotations

import pytest

from metacache_mpi_spark.sources.bio import (
    read_fasta,
    read_fastq,
    read_paired,
    read_paired_interleaved,
    read_sequences,
    sniff_format,
)

FASTA = """>seq1 first record
ACGTACGT
TTGGCCAA
>seq2 second
GGGG
>seq3
acgt
"""

FASTQ = """@r1
ACGT
+
!!!!
@r2
TTAA
+
####
"""


@pytest.fixture()
def fasta_path(tmp_path):
    p = tmp_path / "in.fasta"
    p.write_text(FASTA)
    return str(p)


@pytest.fixture()
def fastq_path(tmp_path):
    p = tmp_path / "in.fastq"
    p.write_text(FASTQ)
    return str(p)


def test_read_fasta_records(spark, fasta_path):
    rows = {r["record_idx"]: r for r in read_fasta(spark, fasta_path).collect()}
    assert len(rows) == 3
    assert rows[0]["header"] == "seq1 first record"
    assert rows[0]["seq"] == "ACGTACGTTTGGCCAA"  # multi-line body joined
    assert rows[1]["seq"] == "GGGG"
    assert rows[2]["seq"] == "ACGT"  # upper-cased


def test_read_fasta_header_with_gt_in_description(spark, tmp_path):
    """A legal '>' INSIDE a header description must not split the record
    (records split only at line-start '>'), or every later record_idx /
    target id silently shifts."""
    p = tmp_path / "gt.fasta"
    p.write_text(
        ">seq1 5' -> 3' strand\nACGT\n>seq2 plain\nTTTT\n"
    )
    rows = {r["record_idx"]: r for r in read_fasta(spark, str(p)).collect()}
    assert len(rows) == 2
    assert rows[0]["header"] == "seq1 5' -> 3' strand"
    assert rows[0]["seq"] == "ACGT"
    assert rows[1]["header"] == "seq2 plain"


def test_read_fastq_records(spark, fastq_path):
    rows = {r["record_idx"]: r for r in read_fastq(spark, fastq_path).collect()}
    assert len(rows) == 2
    assert rows[0]["header"] == "r1" and rows[0]["seq"] == "ACGT"
    assert rows[0]["qual"] == "!!!!"
    assert rows[1]["header"] == "r2" and rows[1]["seq"] == "TTAA"


def test_paired_lockstep(spark, tmp_path):
    a = tmp_path / "a.fasta"
    b = tmp_path / "b.fasta"
    a.write_text(">x1\nAAAA\n>x2\nCCCC\n")
    b.write_text(">y1\nGGGG\n>y2\nTTTT\n")
    rows = {
        r["record_idx"]: (r["seq1"], r["seq2"])
        for r in read_paired(spark, str(a), str(b)).collect()
    }
    assert rows == {0: ("AAAA", "GGGG"), 1: ("CCCC", "TTTT")}


def test_paired_interleaved(spark, tmp_path):
    p = tmp_path / "i.fasta"
    p.write_text(">a/1\nAAAA\n>a/2\nCCCC\n>b/1\nGGGG\n>b/2\nTTTT\n")
    rows = {
        r["pair_idx"]: (r["seq1"], r["seq2"])
        for r in read_paired_interleaved(spark, str(p)).collect()
    }
    assert rows == {0: ("AAAA", "CCCC"), 1: ("GGGG", "TTTT")}


def test_sniff_format(tmp_path, fasta_path, fastq_path):
    assert sniff_format(fasta_path) == "fasta"
    assert sniff_format(fastq_path) == "fastq"
    unk_fa = tmp_path / "u1.dat"
    unk_fa.write_text(">h\nACGT\n")
    unk_fq = tmp_path / "u2.dat"
    unk_fq.write_text("@h\nACGT\n+\n!!!!\n")
    assert sniff_format(str(unk_fa)) == "fasta"
    assert sniff_format(str(unk_fq)) == "fastq"


def test_read_sequences_unified_schema(spark, fasta_path, fastq_path):
    fa = read_sequences(spark, fasta_path)
    fq = read_sequences(spark, fastq_path)
    assert set(fa.columns) == set(fq.columns)


def test_read_fasta_splittable(spark, fasta_path):
    """Splittable reader: same records as wholetext, content-addressed
    ids instead of positions (the huge-single-file lane)."""
    from metacache_mpi_spark.sources.bio import read_fasta_splittable

    whole = {(r["header"], r["seq"]) for r in read_fasta(spark, fasta_path).collect()}
    rows = read_fasta_splittable(spark, fasta_path).collect()
    assert {(r["header"], r["seq"]) for r in rows} == whole
    assert len({r["rec_id"] for r in rows}) == len(rows)  # distinct ids


def test_read_accession2taxid_skips_header(spark, tmp_path):
    """ANSI regression: the standard NCBI header line must be dropped
    via try_cast, not crash the scan."""
    from metacache_mpi_spark.sources.bio import read_accession2taxid

    p = tmp_path / "acc2tax.tsv"
    p.write_text(
        "accession\taccession.version\ttaxid\tgi\n"
        "NC_001422\tNC_001422.1\t10847\t9626372\n"
        "NC_999999\tNC_999999.9\t555\t123\n"
    )
    rows = {r["accession"]: (r["taxid"], r["gi"])
            for r in read_accession2taxid(spark, str(p)).collect()}
    assert rows == {"NC_001422": (10847, 9626372), "NC_999999": (555, 123)}
