"""Corpus mixing / sampling operators for training-data assembly.

A 100 TB training corpus is assembled from heterogeneous sources under
per-source mixture weights and token budgets.  The reference bounds
what enters its index per target (window stride + location-list caps,
/root/reference/src/mode_build.cpp, src/sketch_database.h); the
training-data mandate needs the corpus-level analog: WHICH documents
enter the corpus, per stratum, deterministically.  Everything here is
JVM-side (no Python in the row path) and reproducible bit-for-bit
across runs and cluster sizes:

- :func:`stratified_sample` — deterministic hash sampling (salted md5
  of the document key, fixed 8-hex-digit uniform) at per-stratum
  fractions.  A pure Project + Filter: ONE scan, ZERO shuffles, and
  the sample is a function of (salt, key) alone — re-running on a
  different partitioning or cluster size selects the same documents
  (Spark's ``df.sample`` is neither deterministic across partitionings
  nor stratified).
- :func:`token_budget_pack` — per-stratum greedy prefix in document
  order under a token budget (cumulative window sum).  One shuffle on
  the stratum key, which is the minimum any per-stratum budget needs.
- :func:`mixture_report` — per-stratum docs / tokens / exact
  fixed-point corpus share (ppm), DECIMAL(38,0) intermediate so the
  1e6 scale-up cannot overflow at 10^13-token corpora.

Fraction resolution is 1/16^8 (~2.3e-10): a fraction maps to an
8-hex-digit threshold string and a document is kept when the leading
8 hex digits of ``md5(salt ':' key)`` compare lexicographically below
it — fixed-width lowercase hex compares identically as string or
integer, and identically in Spark and any ANSI engine, which is what
makes the DuckDB oracle reproduce the sample exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX_SPAN = 16**8  # resolution of the sampling threshold


def fraction_to_hex_threshold(fraction: float) -> str:
    """8-hex-digit threshold for ``fraction`` of the md5 uniform.

    ``u < threshold`` keeps ``floor(fraction * 16^8) / 16^8`` of keys
    (exact, deterministic).  Fractions ≥ 1 keep everything; ≤ 0 keep
    nothing.
    """
    n = int(min(max(fraction, 0.0), 1.0) * HEX_SPAN)
    if n >= HEX_SPAN:  # compare-below needs a 9th digit to keep 'ffffffff'
        return "g"  # > every hex digit, still 1 char: keeps all
    return format(n, "08x")


def sample_uniform_hex(key: Column, salt: str) -> Column:
    """The 8-hex-digit deterministic uniform for one document key."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 8
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum: str = "source",
    key: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Keep each stratum's rows at its configured fraction,
    deterministically.  Strata absent from ``fractions`` are dropped
    (fraction 0) — the mixture is explicit.

    Scale shape: the fractions map becomes a literal in-plan map
    (strata counts are small — sources, languages, quality tiers); the
    whole operator is Project + Filter with no exchange, so it composes
    with any upstream partitioning unchanged.  For a very large strata
    dimension, join a broadcast fractions table instead.
    """
    thr = {s: fraction_to_hex_threshold(f) for s, f in fractions.items()}
    thr = {s: t for s, t in thr.items() if t != "00000000"}
    if not thr:
        return docs.where(F.lit(False))
    mapping = F.create_map(
        *[lit for s, t in sorted(thr.items()) for lit in (F.lit(s), F.lit(t))]
    )
    u = sample_uniform_hex(F.col(key), salt)
    t = mapping[F.col(stratum)]
    return docs.where(t.isNotNull() & (u < t))


def token_budget_pack(
    docs: DataFrame,
    budget_tokens: int,
    stratum: str = "source",
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Greedy per-stratum prefix under a token budget: documents enter
    in ``key`` order until the stratum's cumulative whitespace-token
    count would NOT exceed ``budget_tokens`` (documents straddling the
    boundary are dropped whole — budgets bound, never split).

    Returns (key, stratum, n_tokens, cum_tokens).  One shuffle
    (window partitioned by the stratum), which any per-stratum budget
    requires; the token count itself never leaves the JVM.
    """
    n_tok = F.size(F.split(F.col(text), " ")).cast("long")
    w = (
        Window.partitionBy(stratum)
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(key, stratum, n_tok.alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= budget_tokens)
    )


def hash_split(
    docs: DataFrame,
    weights: dict[str, float],
    key: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: every document gets exactly
    one ``split`` label, chosen by which consecutive range of the
    salted-md5 uniform its key falls in.  Weights are normalized to sum
    to 1 (insertion order of ``weights`` fixes the range order), the
    cumulative boundaries are computed driver-side ONCE and inlined as
    literals, so the assignment is a pure Project — zero shuffles, and
    a document keeps its split under any re-partitioning, cluster size,
    or corpus growth (new documents never move old ones between splits,
    the property ``df.randomSplit`` cannot give).
    """
    bounds, tail = split_boundaries(weights)
    u = sample_uniform_hex(F.col(key), salt)
    expr = F.lit(tail)  # last split takes the tail range
    for name, thr in reversed(bounds):
        expr = F.when(u < F.lit(thr), F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)


def split_boundaries(
    weights: dict[str, float],
) -> tuple[list[tuple[str, str]], str]:
    """Cumulative hex boundaries for :func:`hash_split`: ([(split,
    upper_threshold), ...], tail_split).  Shared with the SQL oracle so
    both engines cut the uniform at bit-identical points."""
    if not weights:
        raise ValueError("hash_split needs at least one split weight")
    for name, w in weights.items():
        if w < 0:
            # a negative weight would push later cumulative boundaries
            # BELOW earlier ones, silently starving those splits
            raise ValueError(f"negative split weight for {name!r}: {w}")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    names = list(weights)
    cum = 0.0
    bounds: list[tuple[str, str]] = []
    for name in names[:-1]:
        cum += weights[name] / total
        bounds.append((name, fraction_to_hex_threshold(cum)))
    return bounds, names[-1]


def upsample_repeat(
    docs: DataFrame,
    factors: dict[str, float],
    stratum: str = "source",
    key: str = "doc_id",
    salt: str = "rep",
) -> DataFrame:
    """Weighted per-stratum repetition (mixture upsampling): a document
    in a stratum with factor ``f`` appears ``floor(f)`` times, plus one
    more when its salted-md5 uniform falls below ``frac(f)`` — so the
    stratum's expected token mass scales by exactly ``f`` while every
    decision stays a pure function of (salt, key).  Strata absent from
    ``factors`` keep factor 1.  Output adds ``rep_idx`` (0-based copy
    number); key order within a copy is preserved.

    Scale shape: copies materialize via ``explode(sequence(...))`` —
    Project + Generate, zero shuffles, output rows ∝ Σ f·|stratum|.
    """
    full: dict[str, int] = {}
    frac_thr: dict[str, str] = {}
    for s, f in factors.items():
        if f < 0:
            raise ValueError(f"negative repeat factor for {s!r}: {f}")
        full[s] = int(f)
        frac_thr[s] = fraction_to_hex_threshold(f - int(f))
    full_map = F.create_map(
        *[lit for s in sorted(full) for lit in (F.lit(s), F.lit(full[s]))]
    )
    thr_map = F.create_map(
        *[lit for s in sorted(frac_thr) for lit in (F.lit(s), F.lit(frac_thr[s]))]
    )
    u = sample_uniform_hex(F.col(key), salt)
    n_full = F.coalesce(full_map[F.col(stratum)], F.lit(1)).cast("int")
    extra = (
        F.coalesce(thr_map[F.col(stratum)], F.lit("00000000")) > u
    ).cast("int")
    n_copies = n_full + extra
    return (
        docs.withColumn("__n_copies", n_copies)
        .where(F.col("__n_copies") > 0)
        .withColumn(
            "rep_idx",
            F.explode(F.sequence(F.lit(0), F.col("__n_copies") - 1)),
        )
        .drop("__n_copies")
    )


def sequence_pack(
    docs: DataFrame,
    seq_len: int,
    stratum: str = "source",
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Concat-then-chunk sequence packing: per stratum, documents in
    ``key`` order form one token stream that is cut into fixed
    ``seq_len`` chunks; each document is assigned the inclusive chunk
    range it overlaps.  Returns (key, stratum, n_tokens, start_offset,
    chunk_first, chunk_last) — ``chunk_last - chunk_first > 0`` marks
    documents straddling a chunk boundary.

    One shuffle (the per-stratum window), same as any per-stratum
    cumulative.  A single GLOBAL stream would funnel the corpus through
    one window partition — at scale, pack per stratum/shard (this
    shape) and renumber chunks with a per-stratum base offset
    (one tiny agg) if globally unique chunk ids are needed.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    n_tok = F.size(F.split(F.col(text), " ")).cast("long")
    w = (
        Window.partitionBy(stratum)
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        docs.select(key, stratum, n_tok.alias("n_tokens"))
        .withColumn("start_offset", cum - F.col("n_tokens"))
        # integral div, not float `/`: exact at any stream length
        .withColumn("chunk_first", F.expr(f"start_offset div {seq_len}"))
        .withColumn(
            "chunk_last",
            F.expr(f"(start_offset + n_tokens - 1) div {seq_len}"),
        )
    )


def global_chunk_ids(
    packed: DataFrame,
    stratum: str = "source",
) -> DataFrame:
    """Renumber :func:`sequence_pack`'s per-stratum chunk ranges into
    ONE global chunk id space: stratum bases are the exclusive prefix
    sum of per-stratum chunk counts (strata in lexicographic order),
    broadcast-joined back.  Together with ``sequence_pack`` this is the
    scalable global packing: the corpus-sized work stays per-stratum
    (partitioned window), and only the stratum-count-sized table (one
    row per stratum) passes through the unpartitioned prefix window.
    """
    per = packed.groupBy(stratum).agg(
        (F.max("chunk_last") + 1).alias("n_chunks")
    )
    # single-partition window over |strata| rows — sources/langs/tiers,
    # not documents; never the corpus
    w = Window.orderBy(stratum).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = per.select(
        stratum,
        F.coalesce(F.sum("n_chunks").over(w), F.lit(0)).alias(
            "chunk_base"
        ),
    )
    return (
        packed.join(F.broadcast(bases), stratum)
        .withColumn("chunk_first", F.col("chunk_first") + F.col("chunk_base"))
        .withColumn("chunk_last", F.col("chunk_last") + F.col("chunk_base"))
        .drop("chunk_base")
    )


def mixture_report(
    docs: DataFrame,
    stratum: str = "source",
    text: str = "text",
) -> DataFrame:
    """Per-stratum mixture accounting: (stratum, n_docs, n_tokens,
    share_ppm) where share_ppm = floor(n_tokens·10^6 / total_tokens)
    in exact integer arithmetic (DECIMAL(38,0) intermediate — a
    10^13-token corpus × 10^6 overflows BIGINT; ``div`` on decimals
    yields BIGINT, same rule as the abundance operator,
    taxonomy.py).  The final window runs over the post-aggregation
    frame (one row per stratum), not the corpus.
    """
    n_tok = F.size(F.split(F.col(text), " ")).cast("long")
    per = docs.groupBy(stratum).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(n_tok).alias("n_tokens"),
    )
    return per.select(
        stratum,
        "n_docs",
        "n_tokens",
        F.expr(
            "cast((cast(n_tokens as decimal(38,0)) * 1000000) "
            "div sum(n_tokens) over () as bigint)"
        ).alias("share_ppm"),
    )
