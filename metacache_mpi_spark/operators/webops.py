"""URL canonicalization and crawl-snapshot dedup over a pages table.

Common-Crawl-style corpora carry many fetches of the same logical page:
scheme/host case variants, default ports, tracking query parameters,
fragments, and repeated crawls over time (``warc_ts``).  The reference
deduplicates targets by their accession identity before sketching
(sketch_database.h target lookup by accession); the webtext analog is a
canonical-url identity applied before the MinHash pipeline, so the
expensive sketch/LSH stages see one row per logical page.

Everything is JVM-side (``parse_url`` + array expressions — no Python
in the loop); the snapshot dedup is one keyed window, so at corpus
scale it shuffles on ``canon_url`` with no hot key beyond a single
page's crawl history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# query parameters that never change page identity (trackers) —
# case-insensitive, with or without a value ("?gclid" counts too)
TRACKING_PARAM_RE = "(?i)^(utm_[a-z0-9_]+|gclid|fbclid|msclkid|ref)(=|$)"


def _part(u: Column, what: str) -> Column:
    # try_parse_url: NULL (not ANSI error) on malformed input
    return F.try_parse_url(u, F.lit(what))


def canonical_url_col(u: Column) -> Column:
    """Canonical form of a URL column:

    - scheme and authority lowercased
    - default port stripped (``:80`` http, ``:443`` https)
    - fragment dropped
    - tracking query params dropped, remaining params sorted
    - trailing slash trimmed from non-root paths, empty path → ``/``

    Invalid URLs canonicalize to NULL (callers keep or drop them
    explicitly) — ``try_parse_url`` is null-safe under ANSI mode.
    """
    proto = F.lower(_part(u, "PROTOCOL"))
    auth = F.lower(_part(u, "AUTHORITY"))
    host = (
        F.when(proto == "http", F.regexp_replace(auth, ":80$", ""))
        .when(proto == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    path = _part(u, "PATH")
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    # trim trailing slashes; an all-slash path ("//") collapses to the
    # root "/" — never to the empty string, which would split the root
    # page's identity and break canon-of-canon idempotence
    trimmed = F.regexp_replace(path, "/+$", "")
    path = F.when(path != "/",
                  F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
                  ).otherwise(path)
    params = F.array_sort(
        F.filter(
            F.split(F.coalesce(_part(u, "QUERY"), F.lit("")), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.when(
        proto.isNull() | host.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            proto,
            F.lit("://"),
            host,
            path,
            F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        )
    )


def canonical_url(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach ``canon_url`` to a pages table."""
    return pages.withColumn("canon_url", canonical_url_col(F.col(url_col)))


def cap_docs_per_key(
    docs: DataFrame,
    key_col: str,
    max_docs: int,
    order_by: list[Column] | None = None,
) -> DataFrame:
    """At most ``max_docs`` rows per ``key_col`` value, keeping the
    first rows under ``order_by`` (default: ``doc_id`` ascending) — the
    C4/Dolma-style per-domain cap that stops a single mirror farm or
    spam host from dominating a training corpus.

    The P17 location-list cap (reference insert-side cap,
    sketch_database.h max locations per feature) applied at document
    granularity, with a count-first plan: per-key counts find the
    over-cap keys (one row per hot host — AQE broadcasts the join when
    that set is small, the common case); under-cap rows pass through
    the anti join with NO sort, and only the hot keys' rows shuffle
    into the row_number window.  A naive global window would sort the
    entire corpus on (key, order) — this plan sorts only the skewed
    tail it actually needs to cut.  NULL keys form one capped group
    (null-safe join), matching SQL window semantics.
    """
    if max_docs < 1:
        raise ValueError(f"max_docs must be >= 1, got {max_docs}")
    order = order_by or [F.col("doc_id").asc()]
    over = (
        docs.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > max_docs)
        .select(F.col(key_col).alias("__capk"))
    )
    # null-safe key match: NULL keys (e.g. unparseable-url hosts) form
    # one capped group, same as the SQL window's NULL partition — a
    # plain equi join would silently exempt every NULL-key row.
    # No forced broadcast: the over-cap key set is small for sane caps
    # but unbounded for max_docs=1 on a dup-heavy corpus — AQE promotes
    # the join to broadcast at runtime when the set is actually small.
    cond = F.col(key_col).eqNullSafe(F.col("__capk"))
    under_rows = docs.join(over, cond, "left_anti")
    hot_rows = docs.join(over, cond, "left_semi")
    w = Window.partitionBy(key_col).orderBy(*order)
    kept_hot = (
        hot_rows.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_docs)
        .drop("__rn")
    )
    return under_rows.unionByName(kept_hot)


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    score_changes: bool = False,
    shingle_k: int = 8,
) -> DataFrame:
    """Crawl-to-crawl delta: classify every url across two crawl
    snapshots as ``added`` (new only), ``removed`` (old only),
    ``changed`` (both, content hash differs) or ``unchanged`` — the
    first question an incremental webtext pipeline asks of a fresh
    crawl (process only added+changed; the reference's merge mode asks
    the same of a new shard batch, mode_merge.cpp).

    Inputs must carry one row per url (run :func:`url_dedup_latest`
    first); content identity is ``md5(text)`` (NULL text hashes as
    empty, so NULL→NULL is `unchanged`).  Returns
    ``(url, status, old_doc_id, new_doc_id)``.

    ``score_changes`` appends ``change_jaccard_milli`` — the
    ``shingle_k``-shingle Jaccard between the old and new text of
    every ``changed`` url (null for the other statuses): the
    re-process priority signal of an incremental crawl pipeline (a
    footer tweak scores ~990, a rewrite ~0).  Computed by the SAME
    kernel as the dedup verify lanes (``verify._pair_jaccard``:
    byte-shingles compared via 64-bit hashes — collision-exact up to
    ~10^9 shingles/side, so the milli score is bit-equal to the
    exact-string DuckDB oracle at any document length).  Row-local:
    both texts already sit on the joined row, so scoring adds an
    Arrow projection but NO extra shuffle.

    Scale: ONE full-outer shuffle join keyed on url — both sides hash
    to the same partitioning, keys are unique per side so there is no
    hot key by construction; with both crawls stored bucketed on url
    (plans/bucketing.py) the Exchange disappears entirely.
    """
    h = lambda c: F.md5(F.coalesce(F.col(c), F.lit("")))  # noqa: E731
    carry_o = [F.col(text_col).alias("__old_t")] if score_changes else []
    carry_n = [F.col(text_col).alias("__new_t")] if score_changes else []
    o = old.select(
        F.col(url_col).alias("url"),
        h(text_col).alias("__old_h"),
        F.col("doc_id").alias("old_doc_id"),
        *carry_o,
    )
    n = new.select(
        F.col(url_col).alias("url"),
        h(text_col).alias("__new_h"),
        F.col("doc_id").alias("new_doc_id"),
        *carry_n,
    )
    base = o.join(n, "url", "full_outer").select(
        "url",
        F.when(F.col("__old_h").isNull(), F.lit("added"))
        .when(F.col("__new_h").isNull(), F.lit("removed"))
        .when(F.col("__old_h") != F.col("__new_h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "old_doc_id",
        "new_doc_id",
        *([F.col("__old_t"), F.col("__new_t")] if score_changes else []),
    )
    if not score_changes:
        return base
    from .verify import jaccard_udf

    # the shared verify kernel via its UDF factory, NOT
    # exact_jaccard_pairs: that wrapper repartitions for CPU-heavy
    # verify fan-out, which would add the very Exchange this row-local
    # scoring avoids (plan-asserted in test_webops)
    jac = jaccard_udf(shingle_k)
    # mask non-changed rows to '' so the Arrow kernel does no work on
    # them (the UDF runs per projected row regardless of the when())
    changed = F.col("status") == "changed"
    scored = base.withColumn(
        "jaccard",
        jac(
            F.when(changed, F.col("__old_t")).otherwise(F.lit("")),
            F.when(changed, F.col("__new_t")).otherwise(F.lit("")),
        ),
    )
    return scored.select(
        "url",
        "status",
        "old_doc_id",
        "new_doc_id",
        F.when(changed, F.floor(F.col("jaccard") * 1000).cast("long"))
        .alias("change_jaccard_milli"),
    )


def url_dedup_latest(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """One row per canonical URL: the LATEST crawl wins (max
    ``warc_ts``; ties broken by raw url ascending for determinism).

    Rows whose URL fails to canonicalize keep their raw url as the
    identity, so no input row is silently dropped.
    """
    df = canonical_url(pages, url_col)
    key = F.coalesce("canon_url", F.col(url_col))
    # tertiary content tie-break: two fetches with identical canon_url,
    # warc_ts AND raw url must still pick the SAME winner on every run
    # (bit-for-bit reproducibility discipline)
    order = [F.col("warc_ts").desc(), F.col(url_col).asc()]
    if "text" in df.columns:
        order.append(F.md5(F.coalesce(F.col("text"), F.lit(""))).asc())
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
