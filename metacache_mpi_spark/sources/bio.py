"""FASTA / FASTQ sources — the reference's native inputs, Spark-first.

Reference semantics re-expressed (no code ported):
- FASTA (S1): records delimited by ``>``; header = first line, sequence
  = concatenation of the remaining lines
  (/root/reference/src/sequence_io.cpp:100-221 semantics).
- FASTQ (S2): strict 4-line records ``@hdr / seq / + / qual``
  (/root/reference/src/sequence_io.cpp:229-327).
- paired zip (S4): nth record of file A with nth record of file B, or
  consecutive pairs within one file
  (/root/reference/src/sequence_io.cpp:403-526).
- format dispatch (S5): by extension, content-sniff fallback
  (/root/reference/src/sequence_io.cpp:534-571).

Implementation notes (scale + determinism): both readers use the
DataFrame text source with ``wholetext`` — one row per FILE — and split
records JVM-side (``split``/``posexplode``), so the per-file record
index is the array position: byte-offset-exact, matching the
reference's strictly serial per-file sequence index
(src/sequence_io.h:55-61).  This is deliberate: Spark orders
non-bucketed file SPLITS by size, not offset, so any splits-based
reader (``lineSep``/``text``) can scramble record_idx on multi-split
files, corrupting target ids and paired lockstep.  The unit of
parallelism is therefore the FILE — identical to the reference, whose
readers are sequential per file with parallelism across files; at
cluster scale genomic inputs arrive as many files (one per
assembly/run), so this parallelizes where the reference does.  No RDD
lambdas, no per-row Python anywhere on this path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _whole_files(spark: SparkSession, path: str) -> DataFrame:
    """(file, value): one row per input file, full text."""
    return spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """FASTA → (file, record_idx, header, seq).

    ``record_idx`` is 0-based in byte-offset order within each file (the
    reference's sequence index used for target ids,
    src/sequence_io.h:55-61) — exact because records are split from the
    whole file text, where array position IS file order.
    """
    # records split ONLY at line-start '>' ((?m) multiline anchor): a
    # legal '>' inside a header description must not open a bogus record
    # (it would silently shift every later record_idx / target id)
    recs = (
        _whole_files(spark, path)
        .select(
            "file",
            F.posexplode(F.split("value", "(?m)^>")).alias("pos", "rec"),
        )
        .where(F.length(F.trim("rec")) > 0)
    )
    header = F.trim(F.substring_index("rec", "\n", 1))
    body = F.expr(
        "substring(rec, length(substring_index(rec, '\\n', 1)) + 2)"
    )
    seq = F.upper(F.regexp_replace(body, "[\\s]", ""))
    # pos counts split slots (slot 0 is the pre-'>' prologue, dropped as
    # empty) — renumber surviving records densely per file; array
    # positions are already file-ordered, so this is a per-file window
    # over a within-file-computed order, not a global sort
    from pyspark.sql.window import Window

    w = Window.partitionBy("file").orderBy("pos")
    return (
        recs.select("file", "pos", header.alias("header"), seq.alias("seq"))
        .where(F.length("seq") > 0)
        .withColumn("record_idx", (F.row_number().over(w) - 1).cast("long"))
        .select("file", "record_idx", "header", "seq")
    )


def read_fasta_splittable(spark: SparkSession, path: str) -> DataFrame:
    """FASTA for HUGE single files → (file, rec_id, header, seq).

    The wholetext reader above is byte-offset-exact but bounded by the
    JVM's ~2 GiB single-string limit and serializes each file through
    one task.  This variant splits records at scan time
    (``lineSep='>'``), so a multi-GiB concatenated FASTA streams through
    many input splits in parallel — but Spark orders non-bucketed splits
    by size, not offset, so NO positional index exists.  Instead of a
    scrambled ``record_idx``, records get a content-addressed
    ``rec_id = xxhash64(file, header, seq)`` — stable under any
    partitioning, collision-safe at 64 bits for any real corpus, and
    exactly how the webtext graft keys documents (xxhash64(url)).
    Use :func:`read_fasta` when positional ids / paired lockstep are
    required (reference target-id semantics); use this reader for bulk
    index builds over large references.
    """
    raw = (
        spark.read.option("lineSep", ">")
        .text(path)
        .select(F.input_file_name().alias("file"), "value")
        .where(F.length(F.trim("value")) > 0)
    )
    header = F.trim(F.substring_index("value", "\n", 1))
    body = F.expr(
        "substring(value, length(substring_index(value, '\\n', 1)) + 2)"
    )
    seq = F.upper(F.regexp_replace(body, "[\\s]", ""))
    return (
        raw.select("file", header.alias("header"), seq.alias("seq"))
        .where(F.length("seq") > 0)
        .withColumn("rec_id", F.xxhash64("file", "header", "seq"))
        .select("file", "rec_id", "header", "seq")
    )


def read_fastq(spark: SparkSession, path: str) -> DataFrame:
    """FASTQ → (file, record_idx, header, seq, qual).

    Strict 4-line records, grouped JVM-side: the whole-file line array
    is chunked into quadruples with a ``transform(sequence(...))``
    expression — no shuffle, no Python, no RDD.
    """
    lines = F.expr("filter(split(value, '\\r?\\n'), x -> length(x) > 0)")
    quads = F.expr(
        "transform(sequence(0, int(size(lines) / 4) - 1), i -> struct("
        "  CAST(i AS BIGINT) AS record_idx,"
        "  regexp_replace(lines[4 * i], '^@', '') AS header,"
        "  upper(lines[4 * i + 1]) AS seq,"
        "  lines[4 * i + 3] AS qual))"
    )
    return (
        _whole_files(spark, path)
        .select("file", lines.alias("lines"))
        .where(F.size("lines") >= 4)
        .select("file", F.explode(quads).alias("r"))
        .select("file", "r.record_idx", "r.header", "r.seq", "r.qual")
    )


def read_paired(
    spark: SparkSession, path_a: str, path_b: str, fmt: str = "auto"
) -> DataFrame:
    """S4 lockstep mode: nth record of A zipped with nth of B (J7)."""
    ra = read_sequences(spark, path_a, fmt).select(
        "record_idx", F.col("header").alias("header1"), F.col("seq").alias("seq1")
    )
    rb = read_sequences(spark, path_b, fmt).select(
        "record_idx", F.col("header").alias("header2"), F.col("seq").alias("seq2")
    )
    return ra.join(rb, "record_idx")


def read_paired_interleaved(spark: SparkSession, path: str, fmt: str = "auto") -> DataFrame:
    """S4 consecutive-pairs mode: records 2i and 2i+1 form pair i."""
    r = read_sequences(spark, path, fmt).withColumn(
        "pair_idx", (F.col("record_idx") / 2).cast("long")
    ).withColumn("mate", F.pmod("record_idx", F.lit(2)))
    a = r.where(F.col("mate") == 0).select(
        "pair_idx", F.col("header").alias("header1"), F.col("seq").alias("seq1")
    )
    b = r.where(F.col("mate") == 1).select(
        "pair_idx", F.col("header").alias("header2"), F.col("seq").alias("seq2")
    )
    return a.join(b, "pair_idx")


def sniff_format(path: str) -> str:
    """S5 dispatch: extension first, first-byte sniff fallback
    (``>`` → fasta, ``@`` → fastq).  Directory and glob inputs sniff
    their first (sorted) member file — a directory of ``.fastq`` files
    must dispatch as fastq, not fall through to the fasta default."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".fa", ".fasta", ".fna", ".ffn", ".faa", ".frn"):
        return "fasta"
    if ext in (".fq", ".fastq"):
        return "fastq"
    if os.path.isdir(path):
        members = sorted(
            e for e in os.listdir(path)
            if not e.startswith((".", "_"))
        )
        if members:
            return sniff_format(os.path.join(path, members[0]))
    elif any(c in path for c in "*?["):
        import glob as _glob

        matches = sorted(_glob.glob(path))
        if matches:
            return sniff_format(matches[0])
    try:
        with open(path, "rb") as f:
            first = f.read(1)
        if first == b">":
            return "fasta"
        if first == b"@":
            return "fastq"
    except OSError:
        pass
    return "fasta"


def read_sequences(spark: SparkSession, path: str, fmt: str = "auto") -> DataFrame:
    if fmt == "auto":
        fmt = sniff_format(path)
    if fmt == "fasta":
        return read_fasta(spark, path).withColumn("qual", F.lit(None).cast("string"))
    if fmt == "fastq":
        return read_fastq(spark, path)
    raise ValueError(f"unknown format {fmt!r}")


def taxid_from_header(header_col: str = "header"):
    """P9: extract a ground-truth taxid from a sequence header.

    The reference scans headers for ``taxid|<n>`` / ``kraken:taxid|<n>``
    markers (/root/reference/src/classification.cpp:77-105 ground-truth
    chain).  Returns a Column (nullable long).  ``regexp_extract``
    yields '' on no match, which ANSI cast rejects — nullif first."""
    return F.nullif(
        F.regexp_extract(F.col(header_col), r"taxid\|(\d+)", 1), F.lit("")
    ).cast("long")


def accession_from_header(header_col: str = "header"):
    """P8-adjacent: first accession-shaped token of the header
    (/root/reference/src/sequence_io.cpp:391-401 extract_accession
    semantics: accession[.version] token)."""
    return F.regexp_extract(
        F.col(header_col), r"([A-Z]{1,4}_?\d{4,}(?:\.\d+)?)", 1
    )


def read_accession2taxid(spark: SparkSession, path: str) -> DataFrame:
    """S11: NCBI accession2taxid TSV → (accession, accession_version,
    taxid, gi).  The header line ``accession\taccession.version\t
    taxid\tgi`` is dropped via ``try_cast`` (a plain ANSI cast would
    RAISE on the non-numeric 'taxid' string, not coerce to null)."""
    raw = spark.read.option("sep", "\t").csv(path)
    return (
        raw.select(
            F.col("_c0").alias("accession"),
            F.col("_c1").alias("accession_version"),
            F.col("_c2").try_cast("long").alias("taxid"),
            F.col("_c3").try_cast("long").alias("gi"),
        )
        .where(F.col("taxid").isNotNull())
    )
