"""Exact-substring (span-level) deduplication over web text.

The document-level lanes (exact hash, MinHash/LSH, SimHash) decide
whether two PAGES are duplicates; this module removes duplicated
PASSAGES — the ExactSubstr operator of Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" (the other half of that
paper next to NearDup/MinHash, which ``textops``/``plans/pipeline``
already cover).  Re-expressed Spark-first: instead of one monolithic
suffix array over the concatenated corpus, every W-token window is
hashed per position (the same windowed-feature shape as the reference's
k-mer windows, /root/reference/src/dna_encoding.h:261-289, with the
corpus-global feature-frequency count of
/root/reference/src/sketch_database.h:381-395), made global by ONE
``groupBy(span_hash)`` aggregation, and resolved back into per-document
strip intervals with a per-doc interval merge.

Semantics (deterministic, engine-portable):

- tokens = ``split(text, ' ')``; a *span* is W consecutive tokens,
  identified by md5 of the space-joined window (md5-hex strings so a
  DuckDB oracle reproduces every hash — driver contract discipline);
- a span is *repeated* if its hash occurs ≥ 2 times corpus-wide
  (across documents or within one);
- the globally-first occurrence per hash — min ``(doc_id, pos)`` —
  is the *keeper*; every other occurrence is stripped;
- per document, stripped occurrences ``[pos, pos+W-1]`` are merged
  (overlapping OR adjacent) into canonical intervals, and the covered
  tokens are removed from the text.

Scale shape (the 100 TB plan):

- one narrow scan builds the per-position window strings via a
  zip_with chain over shifted slices — every ``slice`` is a HOF
  *input* (evaluated once per row), no expression re-splits the text
  per element (lambda-purity rule, see ``textops.repetition_stats``);
- one map-side-combinable ``groupBy(h)`` carries the corpus-global
  frequency + keeper (min-struct agg — hot boilerplate spans partial-
  aggregate on the map side instead of sorting inside one task, which
  is why this is an agg + join and NOT a ``row_number`` window: AQE
  can skew-split a join, it cannot split a window partition);
- the prune join back to occurrences is shuffle-hash (the repeated-
  span set scales with the corpus — never broadcast);
- the interval merge is a per-document window (partition key =
  doc_id, per-partition size ≤ tokens/doc) and the strip itself is a
  per-row array filter — no further shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

SPAN_W = 8  # tokens per span window (Lee et al. use 50 BPE tokens on
# real web text; 8 fits the short synthetic documents fixture — the
# operator takes it as a parameter)
MIN_SPAN_COUNT = 2


def _span_strings_expr(window: int) -> str:
    """SQL expression: array of space-joined W-token windows, one per
    start position (1-based), length ``size(tokens) - W + 1``.

    Built as a zip_with chain over W shifted slices so every array-
    valued subexpression is a HOF *argument* (evaluated once per row).
    The naive ``transform(sequence(...), i -> concat_ws(' ', slice(w,
    i, W)))`` form re-evaluates ``w`` — and, after Catalyst inlines the
    alias, the whole ``split(text, ' ')`` — per position (the measured
    pushdown-inlining trap documented in ``repetition_stats``).
    """
    w = "split(text, ' ')"
    m = f"(size({w}) - {window - 1})"
    expr = f"slice({w}, 1, {m})"
    for k in range(2, window + 1):
        expr = (
            f"zip_with({expr}, slice({w}, {k}, {m}), "
            f"(x, y) -> concat(x, ' ', y))"
        )
    return expr


def span_occurrences(docs: DataFrame, window: int = SPAN_W) -> DataFrame:
    """(doc_id, pos, h): md5 of the W-token window starting at 1-based
    token position ``pos``, one row per position of every document with
    ≥ W tokens.

    ``h`` is the 16-byte BINARY digest (``unhex(md5)``), not the hex
    string: one span row per token position is the single biggest row
    stream in the repo (~n_tokens per doc, corpus-wide), and the binary
    key shuffles at a third of the 32-char UTF8 key's bytes through the
    frequency aggregation and the prune join.  Contract surfaces that
    expose hashes re-derive the lowercase hex form
    (:func:`repeated_span_occurrences`)."""
    spans = _span_strings_expr(window)
    return (
        docs.where(F.expr(f"size(split(text, ' ')) >= {window}"))
        .select("doc_id", F.posexplode(F.expr(spans)).alias("pos0", "span"))
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            F.unhex(F.md5("span")).alias("h"),
        )
    )


def _span_freq(occ: DataFrame, min_count: int) -> DataFrame:
    """Corpus-global span frequency + keeper in one map-side-combinable
    agg: (h, n_occurrences, keep=(doc_id,pos) of the globally-first
    occurrence)."""
    return (
        occ.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.struct("doc_id", "pos")).alias("keep"),
        )
        .where(F.col("n_occurrences") >= min_count)
    )


def repeated_span_occurrences(
    docs: DataFrame, window: int = SPAN_W, min_count: int = MIN_SPAN_COUNT
) -> DataFrame:
    """All occurrences of corpus-repeated W-token spans:
    (doc_id, pos, span_hash, n_occurrences).  ``span_hash`` is the
    lowercase md5 hex string (derived from the internal binary digest —
    byte-identical to ``md5(span)``)."""
    occ = _pinned_occurrences(docs, window)
    rep = _span_freq(occ, min_count)
    # repeated-span set scales with the corpus — shuffle join, never a
    # broadcast build (same rule as textops.discriminative_shingles)
    return (
        occ.join(rep.hint("shuffle_hash"), "h")
        .select(
            "doc_id",
            "pos",
            F.lower(F.hex("h")).alias("span_hash"),
            "n_occurrences",
        )
    )


def _pinned_occurrences(docs: DataFrame, window: int) -> DataFrame:
    """Span occurrences pinned for the two consumers every span lane
    has (the corpus-global frequency aggregation AND the prune
    join-back).  Unpinned, the span-string construction + md5 over one
    row per token position — the most expensive projection in the repo
    — executes once per consumer; pinned it runs once (A/B at 50k
    docs × 16 cores: 18-19 s → 13.4 s for strip_intervals, and first
    runs 50 s → 13 s).  The cache holds (doc_id, pos, 16-byte digest)
    — no span strings — and spills to disk past the memory fraction;
    at cluster scale this is the materialize-once-decide-small shape of
    guide §8 (the heavy span strings never leave the task that hashed
    them)."""
    from ..plans.pinning import pin

    return pin(span_occurrences(docs, window))


def strip_intervals(
    docs: DataFrame, window: int = SPAN_W, min_count: int = MIN_SPAN_COUNT
) -> DataFrame:
    """Merged per-document token intervals to remove: every occurrence
    of a repeated span EXCEPT the keeper, merged when overlapping or
    adjacent.  (doc_id, s, e) — 1-based inclusive token positions."""
    occ = _pinned_occurrences(docs, window)
    rep = _span_freq(occ, min_count)
    iv = (
        occ.join(rep.hint("shuffle_hash"), "h")
        .where(
            ~(
                (F.col("doc_id") == F.col("keep.doc_id"))
                & (F.col("pos") == F.col("keep.pos"))
            )
        )
        .select(
            "doc_id",
            F.col("pos").alias("s"),
            (F.col("pos") + window - 1).cast("long").alias("e"),
        )
    )
    # classic running-max interval merge; the window partition is ONE
    # document (bounded by its token count), so no task ever holds more
    # than one doc's intervals.
    w0 = Window.partitionBy("doc_id").orderBy("s", "e")
    pm = F.max("e").over(
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    new_group = F.when(pm.isNull() | (F.col("s") > pm + 1), 1).otherwise(0)
    gid = F.sum(new_group).over(
        w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        iv.withColumn("gid", gid)
        .groupBy("doc_id", "gid")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .select("doc_id", "s", "e")
    )


def exact_substring_dedup(
    docs: DataFrame, window: int = SPAN_W, min_count: int = MIN_SPAN_COUNT
) -> DataFrame:
    """The cleaned corpus: (doc_id, clean_text, n_tokens_kept,
    n_tokens_removed) with every non-keeper repeated span stripped.

    Documents with no repeated spans pass through byte-identical
    (n_tokens_removed = 0); a document whose every token is covered
    (a verbatim copy of an earlier page) comes out as the empty string
    rather than disappearing — row count is preserved so downstream
    stages keep their keys.
    """
    # null text is EXCLUDED, not coerced: split(NULL) yields NULL and
    # would silently emit n_tokens_kept = -1; the DuckDB twin filters
    # identically, so the contract pins the row-drop semantics
    docs = docs.where(F.col("text").isNotNull())
    merged = strip_intervals(docs, window, min_count)
    per_doc = merged.groupBy("doc_id").agg(
        F.collect_list(F.struct("s", "e")).alias("ivs"),
        F.sum(F.col("e") - F.col("s") + 1).alias("n_removed"),
    )
    # per_doc scales with the corpus (every page touched by a repeated
    # span) — shuffle-hash attach, never a broadcast build
    joined = docs.join(per_doc.hint("shuffle_hash"), "doc_id", "left").select(
        "doc_id",
        "text",
        F.coalesce(
            F.col("ivs"),
            F.expr("CAST(array() AS array<struct<s:bigint,e:bigint>>)"),
        ).alias("ivs"),
        F.coalesce(F.col("n_removed"), F.lit(0))
        .cast("long")
        .alias("n_tokens_removed"),
    )
    # two-arg filter lambda: the token array is the HOF *input*
    # (split runs once per row), the per-token test scans only the few
    # merged intervals of this doc.  `ivs` and `n_tokens_removed` are
    # join-output attributes (not inlinable aliases), so nothing here
    # re-evaluates per element.  n_tokens_kept is pure arithmetic:
    # merged intervals are disjoint and in-bounds, so the kept count is
    # exactly size(tokens) − n_tokens_removed — no second evaluation of
    # the filter/exists scan per row.
    kept = (
        "filter(split(text, ' '), (x, i) -> NOT exists(ivs, "
        "v -> i + 1 >= v.s AND i + 1 <= v.e))"
    )
    return joined.select(
        "doc_id",
        F.expr(f"concat_ws(' ', {kept})").alias("clean_text"),
        (F.expr("size(split(text, ' '))") - F.col("n_tokens_removed"))
        .cast("long")
        .alias("n_tokens_kept"),
        "n_tokens_removed",
    )
