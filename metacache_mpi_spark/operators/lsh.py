"""LSH banding over MinHash signatures → candidate duplicate pairs.

This is the Spark-first replacement for the reference's inverted index
and its MPI exchange:

- the hash_multimap ``feature → [(target, window)]``
  (/root/reference/src/sketch_database.h:201-206) becomes a band-bucket
  DataFrame keyed by ``(band, bucket)`` — the groupBy shuffle IS the
  hash table;
- index probing (``accumulate_matches``,
  /root/reference/src/sketch_database.h:804-833) becomes pair
  generation within buckets;
- overpopulated-feature removal + the 254-location insert cap
  (/root/reference/src/sketch_database.h:375-395,1088-1093) become a
  bucket-size cap that drops boilerplate buckets BEFORE any quadratic
  work — the critical guard at 10^12-doc scale.

Scale notes (100 TB / 1000 executors):
- Bands are emitted JVM-side (``posexplode`` + ``slice`` + ``xxhash64``)
  — no Python in this path.
- Pair generation uses ``groupBy(band, bucket) → collect_set → in-array
  pair expansion`` instead of a bucket self-join: one shuffle, and the
  cap bounds per-group work at cap²/2 ≈ 32K pairs, so no task can blow
  up on a hot bucket.  AQE skew-join remains enabled as backstop.
- Buckets of size 1 are pruned before expansion (most buckets, at any
  scale), and buckets above the cap are dropped entirely
  (non-discriminative boilerplate, exactly the reference's
  remove-overpopulated-features trade-off, docs/build.txt:46-50) — or,
  under ``oversize_policy="star"``, replaced by LINEAR hub edges so a
  near-identical mega-cluster (a page mirrored 10^5×) still reaches
  connected components instead of silently losing every pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_CONFIG, DedupConfig
from ..functions.sketch import make_minhash_udf


# all ordered pairs within a sorted member array, expanded IN the array
# (bounded by the bucket cap — no self-join shuffle); shared by every
# bucketed candidate generator in the repo
PAIR_EXPANSION = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids)), y -> struct(x as a, y as b))))"
)


def md5_signature_expr(k: int, s: int, text_col: str = "text") -> "F.Column":
    """SQL-expressible MinHash twin: lane i = min over k-shingles of
    ``md5(i ':' shingle)`` (hex string, lexicographic min) — the textops
    ``minhash_signatures`` formula packed into one array<string> column
    with no groupBy, so it drops into the pipeline where the pandas-UDF
    signature normally rides.  Null when the text holds no shingle
    (< k chars), matching the production lane's null rule.

    Scale note: the transform materializes ~len(text) 32-char md5
    strings per lane per row, so a multi-MB document costs hundreds of
    MB of transient executor memory.  This lane exists for ORACLE
    parity at fixture scale (DuckDB runs the same SQL); production
    corpora use the streaming kperm lane — see
    ``DedupConfig.sketch_mode``."""
    # distinct-before-hash: the lane min over a multiset equals the min
    # over its distinct values, so hashing each distinct shingle once
    # (instead of once per position per lane) is result-identical and
    # cuts the md5 count by the corpus's shingle repetition factor; the
    # shingle array is let-bound so it is built once per row, not once
    # per lane (the repetition_stats inlining discipline)
    shs = (
        f"array_distinct(transform(sequence(1, length({text_col}) - {k - 1}), "
        f"i -> substring({text_col}, i, {k})))"
    )
    return F.expr(
        f"CASE WHEN length({text_col}) >= {k} THEN "
        f"element_at(transform(array({shs}), shs -> "
        f"transform(sequence(0, {s - 1}), lane -> "
        f"array_min(transform(shs, s -> md5(concat(lane, ':', s)))))), 1) "
        f"ELSE NULL END"
    )


def attach_signature(
    df: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    text_col: str = "text",
    out_col: str = "signature",
) -> DataFrame:
    """Add the MinHash signature column (Arrow-batched pandas UDF; the
    ``md5`` sketch mode swaps in the Catalyst-expression twin)."""
    if cfg.sketch_mode == "md5":
        return df.withColumn(
            out_col, md5_signature_expr(cfg.shingle_k, cfg.sketch_size, text_col)
        )
    udf = make_minhash_udf(cfg.shingle_k, cfg.sketch_size, cfg.minhash_seed)
    return df.withColumn(out_col, udf(F.col(text_col)))


def emit_bands(
    sigs: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    sig_col: str = "signature",
) -> DataFrame:
    """signature → one row per band: (id, band, bucket).

    ``bucket = xxhash64(band, slice(signature))`` — 64-bit, JVM-side.
    Docs with null signatures (shorter than one shingle) emit nothing:
    the band array is declared null-on-null-signature INSIDE the
    projection and a non-outer ``posexplode`` of null generates zero
    rows.  Deliberately NOT a ``where(signature IS NOT NULL)`` — a
    FILTER on a Python-UDF-computed column makes the optimizer evaluate
    the UDF twice (once below the pushed filter, once again in the
    projection; guide §4.4 — measured as the whole sketch stage
    re-running: 0.6 s → 2.5 s at sf0.1), while a second attribute
    reference within one projection is free.
    """
    r = cfg.rows_per_band
    band_arrays = F.expr(
        f"CASE WHEN {sig_col} IS NULL THEN NULL ELSE "
        f"transform(sequence(0, {cfg.bands - 1}), "
        f"b -> slice({sig_col}, b * {r} + 1, {r})) END"
    )
    # md5 mode keys buckets by the concatenated lane strings (the SQL
    # oracle's string_agg) instead of xxhash64, which DuckDB lacks
    bucket = (
        F.concat_ws("|", "band_sig").alias("bucket")
        if cfg.sketch_mode == "md5"
        else F.xxhash64("band", "band_sig").alias("bucket")
    )
    return sigs.select(
        F.col(id_col), F.posexplode(band_arrays).alias("band", "band_sig")
    ).select(id_col, "band", bucket)


def prune_buckets(
    bands: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    oversize_policy: str = "drop",
) -> DataFrame:
    """Group band rows into buckets, dropping useless ones.

    - size-1 buckets produce no pairs → pruned (the bulk of all buckets);
    - buckets larger than ``max_docs_per_bucket`` are boilerplate /
      stop-shingle buckets → handled per ``oversize_policy``:
      ``"drop"`` discards them (overpopulated-feature removal analog,
      /root/reference/src/sketch_database.h:381-395, same recall
      trade-off as docs/build.txt:46-50); ``"sample"`` keeps a
      deterministic xxhash-ordered sample of ``max_docs_per_bucket``
      members (partial retention — the reference's insert-time 254-cap,
      src/sketch_database.h:1088-1093, keeps-first instead).

    Scale safety: bucket sizes are counted FIRST (map-side partial
    aggregation — no state blowup on hot keys), and only surviving
    buckets are collected into arrays.  Collecting before filtering
    would materialize a mega-hot bucket (a boilerplate shingle present
    in 10^7 docs) on a single reducer.  This count→broadcast-prune→
    collect shape is the reference's MPI tree-reduce + Bcast-prune
    (D3/D4, /root/reference/src/mode_build.cpp:847-1074) as two Spark
    shuffles.  Salting note: both aggregations here partial-aggregate
    map-side, and per-group state is bounded by the cap after the
    semi-join, so explicit key salting is not needed on this path; AQE
    skew-join splitting covers the residual join skew.

    Returns (band, bucket, ids: array<id> sorted) — the "location list".
    """
    sizes = bands.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    # the surviving-bucket set grows WITH the corpus (≈ one row per
    # duplicate group) — never a broadcast dim.  Hint shuffle_hash so
    # AQE doesn't "optimize" it into a broadcast build (measured: tens
    # of executor-CPU-seconds building 1M-row broadcast relations, worse
    # at higher core counts); the shuffle join also reuses the exchange
    # the sizes aggregation just produced on the same key.
    if oversize_policy == "drop":
        keep = sizes.where(
            (F.col("n") >= 2) & (F.col("n") <= cfg.max_docs_per_bucket)
        )
        kept_rows = bands.join(
            keep.select("band", "bucket").hint("shuffle_hash"),
            ["band", "bucket"],
        )
        return kept_rows.groupBy("band", "bucket").agg(
            F.sort_array(F.collect_set(id_col)).alias("ids")
        )
    if oversize_policy == "sample":
        keep = sizes.where(F.col("n") >= 2)
        kept_rows = bands.join(
            keep.select("band", "bucket").hint("shuffle_hash"),
            ["band", "bucket"],
        )
        # sample order is keyed by the BUCKET too: a mega-cluster whose
        # members collide in every band then keeps a DIFFERENT cap-sized
        # subset per band (union coverage ∝ bands·cap, glued by CC
        # transitivity) instead of the same subset bands times
        w_rank = F.expr(
            f"row_number() OVER (PARTITION BY band, bucket "
            f"ORDER BY xxhash64(band, bucket, {id_col}), {id_col})"
        )
        sampled = kept_rows.withColumn("rnk", w_rank).where(
            F.col("rnk") <= cfg.max_docs_per_bucket
        )
        return sampled.groupBy("band", "bucket").agg(
            F.sort_array(F.collect_set(id_col)).alias("ids")
        )
    raise ValueError(f"unknown oversize_policy {oversize_policy!r}")


def _star_edges(
    members: DataFrame,
    id_col: str,
    bucket_cols: list[str],
) -> DataFrame:
    """Hub edges (bucket-min id → member) for OVERSIZED buckets.

    The mega-cluster path of ``oversize_policy="star"``: instead of the
    n²/2 in-array expansion (whose collected array itself is the
    scale hazard — 10^7 ids in one aggregation buffer), each member of
    an oversized bucket pairs with the bucket's minimum id.

    ``members`` = (bucket_cols..., id) rows of oversized buckets,
    already dedup'd on the full key (the in-array path gets that for
    free from ``collect_set``).  The hub is a ``groupBy().min()`` —
    partial aggregation map-side, constant state — joined back
    shuffle-hash with the single-row-per-bucket hub side as the build:
    members STREAM through the join task, so even a 10^7-member bucket
    costs no sort and no buffering (a window-min formulation would
    buffer the whole bucket in one task's frame).  Output is O(n) rows.
    Connected components later glues members through the shared hub, so
    cluster recall over a verified mega-cluster is 1.0 (vs 0 under
    "drop"); chance collisions are still killed by the verify gate."""
    hubs = members.groupBy(*bucket_cols).agg(F.min(id_col).alias("hub"))
    return (
        members.join(hubs.hint("shuffle_hash"), bucket_cols)
        .where(F.col(id_col) != F.col("hub"))
        .select(
            *bucket_cols,
            F.col("hub").alias("a"),
            F.col(id_col).alias("b"),
        )
    )


def _pair_stream(
    bands: DataFrame,
    cfg: DedupConfig,
    id_col: str,
    oversize_policy: str | None = None,
) -> DataFrame:
    """(band, a, b) candidate co-occurrence rows — one row per bucket a
    pair shares — under the configured oversize policy.  Shared by
    :func:`candidate_pairs` and :func:`two_lane_candidate_pairs`; the
    downstream groupBy(a, b) turns row counts into band/fp hit counts.
    """
    policy = oversize_policy or cfg.oversize_policy
    if policy in ("drop", "sample"):
        buckets = prune_buckets(bands, cfg, id_col, policy)
        return buckets.select(
            "band", F.explode(F.expr(PAIR_EXPANSION)).alias("p")
        ).select("band", "p.a", "p.b")
    if policy != "star":
        raise ValueError(f"unknown oversize_policy {policy!r}")
    # star: in-cap buckets expand all pairs exactly as "drop" does;
    # oversized buckets emit linear hub edges instead of being dropped.
    # ONE sizes aggregation and ONE semi-join carry BOTH branches (an
    # `oversized` flag rides the join): the naive per-branch-join form
    # duplicated sizes+join per branch.  The union still fans the
    # joined subtree out twice and Spark does NOT stage-reuse through
    # ArrowEvalPython lineages (measured: 0 ReusedExchange), so callers
    # whose bands ride an unpinned UDF lineage should persist upstream
    # — dedup_pipeline's signature stage already does.
    sizes = bands.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    keys = sizes.where(F.col("n") >= 2).select(
        "band",
        "bucket",
        (F.col("n") > cfg.max_docs_per_bucket).alias("oversized"),
    )
    kept = bands.join(keys.hint("shuffle_hash"), ["band", "bucket"])
    buckets = (
        kept.where(~F.col("oversized"))
        .groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
    )
    small_pairs = buckets.select(
        "band", F.explode(F.expr(PAIR_EXPANSION)).alias("p")
    ).select("band", "p.a", "p.b")
    # hub edges for the oversized remainder: dedup on the full
    # membership key (duplicate fp rows must not inflate hit counts —
    # the distinct's reduce-side state is the bucket's unique-id hash
    # set, spillable), then groupBy-min hub + streamed join-back
    big_members = (
        kept.where(F.col("oversized"))
        .select("band", "bucket", id_col)
        .distinct()
    )
    star_pairs = _star_edges(
        big_members, id_col, ["band", "bucket"]
    ).select("band", "a", "b")
    return small_pairs.unionByName(star_pairs)


def bucket_join_pairs(
    rows: DataFrame,
    id_col: str,
    bucket_cols: list[str],
    max_bucket: int,
    oversize_policy: str = "drop",
) -> DataFrame:
    """Distinct candidate pairs (a < b) from bucket-membership rows,
    generic over the bucketing scheme — the skew-safe replacement for a
    raw bucket self-join.

    ``rows`` = (id, *bucket_cols); any two ids sharing a bucket become a
    candidate.  Same count→cap→in-array-expansion discipline as
    :func:`prune_buckets` (the reference's overpopulated-feature guard,
    /root/reference/src/sketch_database.h:375-395): bucket sizes are
    counted FIRST (map-side partial agg — no hot-key state blowup), then

    - size-1 buckets are pruned (no pairs),
    - buckets larger than ``max_bucket`` are ``"drop"``-ped entirely
      (a degenerate key — an all-zero SimHash of boilerplate, a dead
      embedding region — would otherwise put n² pair work in ONE task)
      or ``"sample"``-d to a deterministic xxhash-ordered subset, or
      under ``"star"`` replaced by linear hub edges (:func:`_star_edges`
      — mega-cluster recall without the quadratic blowup),
    - survivors expand to pairs INSIDE the collected array: one shuffle,
      per-task work bounded by max_bucket²/2.

    Used by the SimHash and sign-LSH banded lanes; the text-LSH lane
    keeps its per-pair band-hit counting variant (:func:`candidate_pairs`).
    """
    sizes = rows.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("n"))
    if oversize_policy == "star":
        # fused form (same as _pair_stream): ONE join carries both
        # branches via an `oversized` flag instead of a sizes+join pair
        # per branch
        keys = sizes.where(F.col("n") >= 2).select(
            *bucket_cols, (F.col("n") > max_bucket).alias("oversized")
        )
        kept = rows.join(keys.hint("shuffle_hash"), bucket_cols)
        buckets = (
            kept.where(~F.col("oversized"))
            .groupBy(*bucket_cols)
            .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        )
        pairs = buckets.select(
            F.explode(F.expr(PAIR_EXPANSION)).alias("p")
        ).select("p.a", "p.b")
        big_members = (
            kept.where(F.col("oversized"))
            .select(*bucket_cols, id_col)
            .distinct()
        )
        stars = _star_edges(big_members, id_col, list(bucket_cols))
        return pairs.unionByName(stars.select("a", "b")).distinct()
    if oversize_policy == "drop":
        keep = sizes.where((F.col("n") >= 2) & (F.col("n") <= max_bucket))
    elif oversize_policy == "sample":
        keep = sizes.where(F.col("n") >= 2)
    else:
        raise ValueError(f"unknown oversize_policy {oversize_policy!r}")
    # surviving-bucket set scales with the corpus — shuffle join, never
    # a broadcast build (see prune_buckets scale note)
    kept = rows.join(
        keep.select(*bucket_cols).hint("shuffle_hash"), bucket_cols
    )
    if oversize_policy == "sample":
        keys = ", ".join(bucket_cols)
        # bucket-keyed sample order — see prune_buckets: different
        # buckets of one mega-cluster retain different subsets
        w_rank = F.expr(
            f"row_number() OVER (PARTITION BY {keys} "
            f"ORDER BY xxhash64({keys}, {id_col}), {id_col})"
        )
        kept = kept.withColumn("rnk", w_rank).where(
            F.col("rnk") <= max_bucket
        )
    buckets = kept.groupBy(*bucket_cols).agg(
        F.sort_array(F.collect_set(id_col)).alias("ids")
    )
    return (
        buckets.select(F.explode(F.expr(PAIR_EXPANSION)).alias("p"))
        .select("p.a", "p.b")
        .distinct()
    )


def candidate_pairs(
    bands: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs (a < b) with band-collision counts.

    ``band_hits`` is the number of bands in which the pair collides —
    the analog of the reference's per-candidate hit count
    (/root/reference/src/candidates.h:41-102); downstream thresholds can
    mirror ``hitsMin`` (/root/reference/src/mode_query.cpp:247-260).

    Oversized buckets follow ``cfg.oversize_policy`` (config.py): pairs
    expand in-array under the cap; "star" adds linear hub edges for
    mega-buckets instead of dropping them.
    """
    pairs = _pair_stream(bands, cfg, id_col)
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("band_hits"))
        .where(F.col("band_hits") >= cfg.min_band_hits)
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs → candidate pairs, end to end (signature → bands → pairs).

    The band table is pinned: the count-first pair machinery consumes
    it twice (bucket sizes, then the join-back), Spark does not
    stage-reuse through ArrowEvalPython lineages, and the md5 sketch
    mode's signature expression is interpreted HOF work — unpinned,
    the whole sketch stage executes once per consumer (the
    dedup_pipeline persists its signature stage for the same reason).
    The sizes aggregation materializes the cache before the join-back
    stage can start, so no extra action is scheduled."""
    from ..plans.pinning import pin

    sigs = attach_signature(docs.select(id_col, text_col), cfg, text_col)
    bands = pin(emit_bands(sigs, cfg, id_col))
    return candidate_pairs(bands, cfg, id_col)


def two_lane_candidate_pairs(
    rows: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs from a UNIFIED bucket table carrying both lanes.

    ``rows`` = (id, band, bucket) where band ≥ 0 marks LSH bands and
    band = -1 marks winnowing fingerprints.  One groupBy shuffle serves
    both lanes (the separate-lane path costs two); emits per-lane hit
    counts and keeps pairs passing either lane's threshold.  Oversized
    buckets in EITHER lane follow ``cfg.oversize_policy``.
    """
    pairs = _pair_stream(rows, cfg, id_col)
    agg = pairs.groupBy("a", "b").agg(
        F.sum(F.when(F.col("band") >= 0, 1).otherwise(0)).alias("band_hits"),
        F.sum(F.when(F.col("band") < 0, 1).otherwise(0)).alias("fp_hits"),
    )
    return agg.where(
        (F.col("band_hits") >= cfg.min_band_hits)
        | (F.col("fp_hits") >= cfg.min_fp_hits)
    )


def fingerprint_candidate_pairs(
    docs: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring-overlap candidates via winnowing fingerprints.

    Any two docs sharing a verbatim run ≥ ``winnow_w + shingle_k - 1``
    chars share a fingerprint, so this lane has perfect candidate recall
    for the ≥ ``min_substring_overlap`` duplicate kind.  Reuses the same
    bucket-grouping machinery as LSH banding (a fingerprint IS a bucket),
    inheriting the size-cap skew guard.
    """
    from ..functions.sketch import make_winnow_udf

    udf = make_winnow_udf(cfg.shingle_k, cfg.winnow_w)
    fps = docs.select(id_col, udf(F.col(text_col)).alias("fps"))
    buckets = fps.where(F.col("fps").isNotNull()).select(
        id_col,
        F.lit(0).alias("band"),
        F.explode("fps").alias("bucket"),
    )
    # candidate_pairs applies min_band_hits (1); this lane's boilerplate
    # pruning contract (config.py min_fp_hits) is the stronger threshold
    # — apply it here too, matching the pipeline's two-lane path
    return (
        candidate_pairs(buckets, cfg, id_col)
        .where(F.col("band_hits") >= cfg.min_fp_hits)
        .withColumnRenamed("band_hits", "fp_hits")
    )
