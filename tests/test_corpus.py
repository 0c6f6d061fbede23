"""Synthetic pages corpus: determinism + byte-identical extraction
(the BASELINE.json per-row invariant)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from metacache_mpi_spark.sources.pages import (
    extract_text,
    generate_pages,
    render_html,
)

from .oracle import jaccard, longest_common_substring


def test_extractor_round_trip_bytes():
    text = "Fish & chips <cheap> >deal\nsecond line & more"
    html = render_html("site0.example", "t", text)
    assert extract_text(html) == text
    assert extract_text(html).encode("utf-8") == text.encode("utf-8")


def test_corpus_deterministic():
    p1, t1 = generate_pages(200, seed=42)
    p2, t2 = generate_pages(200, seed=42)
    pd.testing.assert_frame_equal(p1, p2)
    pd.testing.assert_frame_equal(t1, t2)


def test_corpus_extraction_invariant_every_row():
    pages, _ = generate_pages(200, seed=42)
    for _, row in pages.iterrows():
        assert extract_text(row["html"]) == row["text"]


def test_corpus_planted_structure():
    pages, truth = generate_pages(500, seed=42)
    assert len(pages) == len(truth) == 500
    assert pages["url"].is_unique
    kinds = truth["kind"].value_counts()
    assert kinds["exact"] >= 20 and kinds["near"] >= 45
    assert kinds["substring"] >= 8 and kinds["substring"] % 2 == 0

    merged = pages.merge(truth, on="url")
    by_cluster = merged.groupby("cluster_id")

    # exact dups are byte-identical to their cluster base
    for cid, grp in by_cluster:
        texts = grp["text"].tolist()
        if (grp["kind"] == "exact").any():
            base = grp[grp["kind"] == "unique"]["text"]
            if len(base):
                for t in grp[grp["kind"] == "exact"]["text"]:
                    assert t == base.iloc[0]

    # near dups stay above the 0.6 verify threshold at k=16
    for cid, grp in by_cluster:
        if set(grp["kind"]) >= {"unique", "near"}:
            base = grp[grp["kind"] == "unique"]["text"].iloc[0]
            for t in grp[grp["kind"] == "near"]["text"]:
                assert jaccard(base, t, 16) >= 0.62, "near-dup below threshold"

    # substring pairs: >=2000-char common run but low jaccard
    sub = merged[merged["kind"] == "substring"]
    checked = 0
    for cid, grp in sub.groupby("cluster_id"):
        a, b = grp["text"].iloc[0], grp["text"].iloc[1]
        assert longest_common_substring(a, b) >= 2000
        assert jaccard(a, b, 16) < 0.6
        checked += 1
        if checked >= 2:  # DP oracle is O(n²); two pairs suffice
            break


def test_langs_seeded():
    pages, _ = generate_pages(300, seed=42)
    assert set(pages["lang"]) <= {"en", "de", "es"}
    assert (pages["lang"] == "en").mean() > 0.75


def test_load_pages_iceberg_raises_clearly_without_runtime(spark):
    """The Iceberg lane is a declared deployment source; without the
    runtime jar it must fail with an actionable error, not a stack of
    py4j noise."""
    import pytest

    from metacache_mpi_spark.sources.pages import load_pages_iceberg

    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        load_pages_iceberg(spark, "warehouse.pages")
