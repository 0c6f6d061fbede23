"""Annotate mode: insert ground-truth taxids into sequence headers.

Restates /root/reference/src/mode_annotate.cpp (mode ``annotate``):
for every sequence header, extract the id per ``idtype`` (``acc`` /
``accver`` / ``gi``), look it up in the accession2taxid mapping (0 when
absent — :283-287), DELETE any existing ``taxid<sep>N`` token
(:264-275) and insert ``taxid<vsep>N<fsep>`` after the first field
separator, or append it when the header has none (:282-296).

Spark-first: the per-line loop becomes one mapping join plus columnar
string expressions — no per-row Python; the mapping table joins
distributed (it is corpus-sized for RefSeq: never collected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sources.bio import accession_from_header


def _extract_id(idtype: str, header_col: str):
    if idtype == "accver":
        return accession_from_header(header_col)
    if idtype == "acc":
        return F.regexp_replace(
            accession_from_header(header_col), r"\.\d+$", ""
        )
    if idtype == "gi":
        return F.regexp_extract(F.col(header_col), r"gi\|(\d+)", 1)
    raise ValueError(f"unknown idtype {idtype!r}")


def annotate_with_taxid(
    seqs: DataFrame,
    mapping: DataFrame,
    idtype: str = "accver",
    header_col: str = "header",
    field_sep: str = "|",
) -> DataFrame:
    """Returns ``seqs`` with ``header`` rewritten to carry
    ``taxid|<n>|`` (n = mapped taxid, 0 if unmapped — the reference's
    explicit "not found" marker).

    ``mapping``: (accession, accession_version, taxid[, gi]).

    ``field_sep`` must be a single character and not a quote/backslash
    (it is embedded in a regex — validated + regex-escaped here, so any
    metacharacter like '.' or '$' is safe; the reference's CLI takes
    the same single-char separator).
    """
    if len(field_sep) != 1 or field_sep in "'\"\\":
        raise ValueError(
            "field_sep must be a single character, not a quote or backslash"
        )
    map_key = {
        "accver": "accession_version",
        "acc": "accession",
        "gi": "gi",
    }[idtype]
    m = mapping.select(
        F.col(map_key).cast("string").alias("_ann_id"),
        F.col("taxid").alias("_ann_tax"),
    )
    df = seqs.withColumn("_ann_id", _extract_id(idtype, header_col).cast("string"))
    df = df.join(m, "_ann_id", "left")
    sep = field_sep
    import re as _re

    esc = _re.escape(sep)  # full regex escape (a lone '\x' is not enough
    # for every metaclass, e.g. inside alternations)
    # delete any pre-existing taxid token (reference :264-275)
    cleaned = F.regexp_replace(
        F.col(header_col), rf"taxid{esc}[^{esc}]*{esc}?", ""
    )
    tax = F.coalesce(F.col("_ann_tax"), F.lit(0)).cast("string")
    token = F.concat(F.lit(f"taxid{sep}"), tax, F.lit(sep))
    df = df.withColumn(f"{header_col}_cleaned", cleaned)
    ccol = F.col(f"{header_col}_cleaned")
    first = F.substring_index(ccol, sep, 1)
    # rest-of-header via column functions (no string-formatted expr —
    # a separator would otherwise be interpolated into SQL text)
    rest = ccol.substr(F.length(first) + F.lit(2), F.length(ccol))
    annotated = F.when(
        F.col("_ann_id").isNull() | (F.col("_ann_id") == ""),
        ccol,
    ).when(
        ccol.contains(sep),
        F.concat(first, F.lit(sep), token, rest),
    ).otherwise(
        F.concat(ccol, F.lit(sep), token)
    )
    return (
        df.withColumn(header_col, annotated)
        .drop("_ann_id", "_ann_tax", f"{header_col}_cleaned")
    )
