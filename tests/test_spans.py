"""Exact-substring (span-level) dedup — operators/spans.py.

Edge semantics pinned here; cross-engine value parity runs in
test_contract.py (repeated_spans / repeated_span_intervals /
exact_substring_dedup vs the DuckDB twins)."""

from __future__ import annotations

from metacache_mpi_spark.operators.spans import (
    exact_substring_dedup,
    repeated_span_occurrences,
    span_occurrences,
    strip_intervals,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _tok(i):
    return f"w{i}"


def _words(rng):
    return " ".join(_tok(i) for i in rng)


def test_span_occurrence_positions(spark):
    # 10 tokens, W=4 → positions 1..7
    docs = _docs(spark, [_words(range(10))])
    occ = span_occurrences(docs, window=4).collect()
    assert sorted(r["pos"] for r in occ) == list(range(1, 8))
    # all windows distinct in a non-repeating doc
    assert len({r["h"] for r in occ}) == 7


def test_short_doc_emits_nothing_and_passes_through(spark):
    docs = _docs(spark, ["a b c", ""])
    assert span_occurrences(docs, window=4).count() == 0
    out = {r["doc_id"]: r for r in exact_substring_dedup(docs, 4).collect()}
    assert out[0]["clean_text"] == "a b c"
    assert out[0]["n_tokens_removed"] == 0
    # empty text splits to one empty token (token_stats convention)
    assert out[1]["clean_text"] == ""
    assert out[1]["n_tokens_kept"] == 1


def test_keeper_is_globally_first_occurrence(spark):
    shared = _words(range(100, 104))  # one W=4 span
    docs = _docs(
        spark,
        [
            f"{_words(range(4))} {shared}",  # first occurrence → keeper
            f"{_words(range(10, 14))} {shared}",
            f"{shared} {_words(range(20, 24))}",
        ],
    )
    iv = strip_intervals(docs, window=4).collect()
    got = {(r["doc_id"], r["s"], r["e"]) for r in iv}
    # doc0 keeps its copy (pos 5); docs 1 and 2 strip theirs
    assert got == {(1, 5, 8), (2, 1, 4)}
    out = {r["doc_id"]: r for r in exact_substring_dedup(docs, 4).collect()}
    assert out[0]["clean_text"] == f"{_words(range(4))} {shared}"
    assert out[1]["clean_text"] == _words(range(10, 14))
    assert out[2]["clean_text"] == _words(range(20, 24))
    assert out[1]["n_tokens_removed"] == 4


def test_within_doc_repeat_strips_second_copy(spark):
    span = _words(range(50, 54))
    docs = _docs(spark, [f"{span} x y {span}"])
    iv = strip_intervals(docs, window=4).collect()
    assert [(r["s"], r["e"]) for r in iv] == [(7, 10)]
    out = exact_substring_dedup(docs, 4).collect()[0]
    assert out["clean_text"] == f"{span} x y"
    assert out["n_tokens_kept"] == 6
    assert out["n_tokens_removed"] == 4


def test_overlapping_and_adjacent_intervals_merge(spark):
    # doc1 repeats a 6-token passage from doc0: with W=4 that is three
    # overlapping repeated windows → ONE merged interval
    passage = _words(range(60, 66))
    docs = _docs(
        spark,
        [f"{passage} {_words(range(5))}", f"{_words(range(10, 15))} {passage}"],
    )
    iv = strip_intervals(docs, window=4).collect()
    assert [(r["doc_id"], r["s"], r["e"]) for r in iv] == [(1, 6, 11)]


def test_verbatim_copy_comes_out_empty_not_dropped(spark):
    text = _words(range(8))
    docs = _docs(spark, [text, text])
    out = {r["doc_id"]: r for r in exact_substring_dedup(docs, 4).collect()}
    assert len(out) == 2  # row count preserved
    assert out[0]["clean_text"] == text
    assert out[1]["clean_text"] == ""
    assert out[1]["n_tokens_kept"] == 0
    assert out[1]["n_tokens_removed"] == 8


def test_null_text_rows_are_excluded(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, None)], "doc_id long, text string"
    )
    out = exact_substring_dedup(docs, 4).collect()
    assert [r["doc_id"] for r in out] == [0]
    assert out[0]["n_tokens_kept"] == 5


def test_occurrence_counts(spark):
    span = _words(range(70, 74))
    docs = _docs(
        spark,
        [f"{span} a b c", f"{span} d e f", f"{span} g h i"],
    )
    rep = repeated_span_occurrences(docs, window=4).collect()
    assert len(rep) == 3
    assert {r["n_occurrences"] for r in rep} == {3}
    assert len({r["span_hash"] for r in rep}) == 1


def test_clean_job_span_strip_stage(spark, tmp_path):
    """clean_job.run with --strip-spans: the passage-level stage sits
    between the quality gates and dedup, count stays monotone, and the
    surviving texts really lost their repeated spans (no W-token span
    in the output occurs twice corpus-wide)."""
    import argparse
    import importlib.util
    import os

    from metacache_mpi_spark.sources.pages import write_corpus

    spec = importlib.util.spec_from_file_location(
        "clean_job",
        os.path.join(
            os.path.dirname(__file__), "..", "scripts", "clean_job.py"
        ),
    )
    clean_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(clean_job)

    cdir = str(tmp_path / "corpus")
    write_corpus(cdir, n_pages=150, seed=7)
    args = argparse.Namespace(
        input=cdir, output=str(tmp_path / "out"), generate=0, cores=None,
        bucketed_warehouse=None, eval_docs=None, embeddings=None,
        eval_embeddings=None, semantic_tau=0.9, strip_spans=8,
    )
    counts = clean_job.run(spark, args)
    assert counts["after_span_strip"] <= counts["after_quality"]
    assert counts["clean"] > 0
    out = spark.read.parquet(str(tmp_path / "out")).select("doc_id", "text")
    # post-strip invariant: every remaining 8-token span is unique
    # corpus-wide among survivors, except spans a keeper retained
    leftovers = repeated_span_occurrences(out, window=8)
    keepers = leftovers.groupBy("span_hash").count()
    # each repeated hash among survivors can only be the keeper's copy
    # plus occurrences that were INSIDE a keeper doc already (the
    # keeper keeps all its own copies only when it is globally first
    # at every position) — in practice the generated corpus leaves
    # none; assert the strong form and surface regressions loudly
    assert leftovers.count() == 0, keepers.collect()


def test_no_repeats_is_identity(spark):
    texts = [_words(range(i * 20, i * 20 + 9)) for i in range(4)]
    docs = _docs(spark, texts)
    assert strip_intervals(docs, window=4).count() == 0
    out = exact_substring_dedup(docs, 4).orderBy("doc_id").collect()
    assert [r["clean_text"] for r in out] == texts
    assert all(r["n_tokens_removed"] == 0 for r in out)
