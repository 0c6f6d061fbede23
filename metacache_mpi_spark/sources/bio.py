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

Implementation notes (scale): FASTA uses the DataFrame text reader with
``lineSep='>'`` — records split at scan time, no global ordering needed;
record index is assigned per (file, offset-order) which is deterministic
because each record carries its source file + position.  FASTQ needs
line quadruples, which requires a global per-file line index —
``zipWithIndex`` (one extra pass) is the honest cost; files are
processed per-partition otherwise.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """FASTA → (file, record_idx, header, seq).

    ``record_idx`` is 0-based in file order (the reference's sequence
    index used for target ids, src/sequence_io.h:55-61).
    """
    raw = (
        spark.read.option("lineSep", ">")
        .text(path)
        .select(F.input_file_name().alias("file"), "value")
        .where(F.length(F.trim("value")) > 0)
        # monotonically_increasing_id preserves within-file record order
        # (text splits are offset-ordered); row_number over it gives the
        # reference's 0-based per-file record index (O4 determinism)
        .withColumn("mono", F.monotonically_increasing_id())
    )
    header = F.trim(F.substring_index("value", "\n", 1))
    body = F.expr(
        "substring(value, length(substring_index(value, '\\n', 1)) + 2)"
    )
    seq = F.upper(F.regexp_replace(body, "[\\s]", ""))
    w = Window.partitionBy("file").orderBy("mono")
    return (
        raw.select(
            "file",
            "mono",
            header.alias("header"),
            seq.alias("seq"),
        )
        .where(F.length("seq") > 0)
        .withColumn("record_idx", (F.row_number().over(w) - 1).cast("long"))
        .select("file", "record_idx", "header", "seq")
    )


def read_fastq(spark: SparkSession, path: str) -> DataFrame:
    """FASTQ → (file, record_idx, header, seq, qual) via per-file line
    quadruples."""
    lines = (
        spark.read.text(path)
        .select(F.input_file_name().alias("file"), "value")
        .rdd.map(lambda r: (r["file"], r["value"]))
        .zipWithIndex()
    )

    def to_row(t):
        (file, value), idx = t
        return (file, idx, value)

    df = spark.createDataFrame(
        lines.map(to_row), "file string, line_no long, value string"
    )
    w = Window.partitionBy("file").orderBy("line_no")
    df = df.withColumn("rn", F.row_number().over(w) - 1)
    rec = df.withColumn("record_idx", (F.col("rn") / 4).cast("long")).withColumn(
        "slot", F.pmod("rn", F.lit(4))
    )
    pivoted = (
        rec.groupBy("file", "record_idx")
        .pivot("slot", [0, 1, 2, 3])
        .agg(F.first("value"))
    )
    return pivoted.select(
        "file",
        "record_idx",
        F.regexp_replace(F.col("0"), "^@", "").alias("header"),
        F.upper("1").alias("seq"),
        F.col("3").alias("qual"),
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
    (``>`` → fasta, ``@`` → fastq)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".fa", ".fasta", ".fna", ".ffn", ".faa", ".frn"):
        return "fasta"
    if ext in (".fq", ".fastq"):
        return "fastq"
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
