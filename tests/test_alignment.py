"""Semi-global alignment verify (`-align`, alignment.h:185-298 analog):
score, target offset, CIGAR."""

from __future__ import annotations

from metacache_mpi_spark.operators.alignment import (
    align_pairs,
    align_semi_global,
)


def test_exact_substring_alignment():
    """A read embedded verbatim in the target: all-match CIGAR, free
    target flanks unpenalized, correct start offset."""
    target = "AAAACGTACGTACGTTTTT"
    query = target[4:15]  # "CGTACGTACGT"
    score, beg, cigar = align_semi_global(query, target)
    assert score == 2 * len(query)
    assert beg == 4
    assert cigar == f"{len(query)}M"


def test_mismatch_and_gap_scoring():
    # one substitution in the middle
    score, _, cigar = align_semi_global("ACGTA", "ACCTA")
    assert score == 4 * 2 - 1 and cigar == "5M"
    # one deletion from the target (query shorter)
    score, beg, cigar = align_semi_global("ACTA", "ACGTA")
    assert score == 4 * 2 - 2
    assert cigar in ("2M1D2M", "3M1D1M")  # equivalent-score placements
    # empty query aligns nowhere at zero cost
    assert align_semi_global("", "ACGT") == (0, 0, "")


def test_banded_equals_full_when_band_covers():
    q, t = "ACGTTGCA", "TTACGTAGCAGG"
    full = align_semi_global(q, t)
    banded = align_semi_global(q, t, band=8)
    assert banded == full


def test_align_pairs_dataframe(spark):
    rows = [
        (1, 2, "CGTACGT", "AAACGTACGTAAA"),
        (3, 4, "TTTT", "GGGG"),
    ]
    df = spark.createDataFrame(
        rows, "a long, b long, text_a string, text_b string"
    )
    got = {r["a"]: r for r in align_pairs(df).collect()}
    assert got[1]["align_score"] == 14
    assert got[1]["cigar"] == "7M"
    assert got[1]["target_begin"] == 3
    assert got[3]["align_score"] == -4  # 4 mismatches beat any gap path
    assert set(got[1].asDict()) >= {"a", "b", "align_score", "cigar"}
