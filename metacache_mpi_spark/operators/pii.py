"""PII detection + scrubbing over a text column — JVM-regex scan stages.

Every real webtext training pipeline (C4, RefinedWeb, Dolma) carries a
PII pass between extraction and dedup: detect emails / IP addresses /
phone-shaped numbers and replace them with stable placeholder tokens.
The reference engine has no PII analog — this lane belongs to the
LLM-data-pipeline mandate, same family as the quality/token operators
in :mod:`.textops`.

Design for 10^12 docs: both operators are ONE narrow projection over
the corpus scan — no shuffle, no join, no Python.  The regexes run
JVM-side (`regexp_extract_all` / `regexp_replace` inside whole-stage
codegen), so the pass is bounded by scan + regex throughput and
parallelizes with the input splits.

Regex discipline: the three patterns below are deliberately restricted
to the syntax subset where Java `java.util.regex` (Spark) and RE2
(DuckDB) agree — character classes, bounded repetition, `\\b`, greedy
leftmost-first matching; no lookaround, no backreferences — so the
DuckDB oracle twins reproduce matches byte-for-byte.  Scrub order is
fixed (email → IPv4 → phone) and counts are taken on the intermediate
strings, making ``n_redactions`` well-defined even where the pattern
languages overlap (an IPv4 is also phone-shaped; it is counted once,
as an IP, because the IP placeholder lands first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared pattern literals — the Python source of truth for BOTH the
# Spark queries and the DuckDB oracle SQL (inlined into each, so the
# two engines can never drift).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"
# phone-shaped: digit, then >=6 of [digits () . - space], then digit —
# the loose shape used by C4-style scrubbers (catches +1 555-010-9999,
# (555) 010 9999, 555.0100 ...)
PHONE_RE = r"\+?\d[\d() .-]{6,}\d"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def _n_matches(col: Column, pattern: str) -> Column:
    # regexp_count: same value as size(regexp_extract_all(...)) without
    # materializing an array of matched substrings per row (the scrub
    # stage runs three of these per document)
    return F.regexp_count(col, F.lit(pattern)).cast("long")


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones): independent per-pattern
    match counts on the raw text (an IPv4 inside the text counts under
    BOTH n_ipv4 and n_phones here — the patterns overlap by design;
    :func:`scrub_pii`'s ``n_redactions`` is the disjoint count)."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        _n_matches(t, EMAIL_RE).alias("n_emails"),
        _n_matches(t, IPV4_RE).alias("n_ipv4"),
        _n_matches(t, PHONE_RE).alias("n_phones"),
    )


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace PII spans with placeholder tokens, in the fixed order
    email → IPv4 → phone.  All input columns pass through unchanged,
    with ``clean_text`` and ``n_redactions`` appended — callers
    re-attaching metadata after the rewrite need no join-back, the
    stage stays a zero-shuffle projection end-to-end.  A null text
    yields null outputs (ANSI semantics, matching SQL).

    ``n_redactions`` counts the spans actually replaced: emails on the
    raw text, IPs on the email-scrubbed text, phones on the IP-scrubbed
    text — each span is counted exactly once even though the pattern
    languages overlap.
    """
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, F.lit(EMAIL_RE), F.lit(EMAIL_TOKEN))
    t2 = F.regexp_replace(t1, F.lit(IPV4_RE), F.lit(IPV4_TOKEN))
    t3 = F.regexp_replace(t2, F.lit(PHONE_RE), F.lit(PHONE_TOKEN))
    n = _n_matches(t0, EMAIL_RE) + _n_matches(t1, IPV4_RE) + _n_matches(
        t2, PHONE_RE
    )
    return docs.select(
        *[F.col(c) for c in docs.columns],
        t3.alias("clean_text"),
        n.alias("n_redactions"),
    )
