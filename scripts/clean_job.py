"""Production training-data cleanup: raw crawl → clean corpus.

The composition a 100-TB pretraining pipeline actually runs, built
entirely from this repo's operators::

    pages ── url_dedup_latest ───────── crawl-snapshot dedup (webops)
      │
      ├─ remove_boilerplate_lines ───── site-template removal
      │
      ├─ quality gates ──────────────── token/alpha/repetition filters
      │      (quality_gate: the fused row-local predicate of
      │       token_stats ⋈ quality_scores ⋈ repetition_stats)
      │
      ├─ decontamination (optional) ─── eval-set leak removal in BOTH
      │      modalities: shingle containment (--eval-docs) and
      │      embedding cosine (--eval-embeddings + --embeddings,
      │      sign-banded + exact verify)
      │
      ├─ dedup_pipeline ─────────────── MinHash/SimHash/LSH near-dup
      │      └─ keep cluster representative (min doc_id)
      │
      └─ write clean parquet + one-line JSON metrics

Launch (same deployment path as dedup_job)::

    zip -qr /tmp/mcs.zip metacache_mpi_spark
    spark-submit --master <master> --driver-memory 4g \
        --py-files /tmp/mcs.zip \
        scripts/clean_job.py --input <corpus_dir> --output <out_dir> \
        [--generate N]

NB ``--driver-memory`` matters under spark-submit: the JVM exists
before Python runs, so session-time ``spark.driver.memory`` (which
sizes the pyspark-launched JVM in tests) is silently ignored — and in
local mode the driver heap IS the executor heap.  The 1g default is
too small for the multi-stage funnel.

Every stage count lands in the JSON line so a regression in any gate
is visible run-over-run.
"""

from __future__ import annotations

import argparse
import json
import time

# quality gates (milli-ratios are exact integers — see textops)
MIN_WORDS = 20
MIN_ALPHA_MILLI = 500     # ≥ 50% lowercase-alpha chars
MAX_DUP_WORD_MILLI = 900  # < 90% repeated word occurrences
MAX_TOP_2GRAM_MILLI = 300  # most common 2-gram < 30% of all 2-grams


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--generate", type=int, default=0)
    ap.add_argument("--cores", default=None)
    # quality-gate thresholds (textops.quality_gate — the fused
    # row-local predicate of token/alpha/repetition stats); defaults
    # are the module constants so existing invocations are unchanged
    ap.add_argument("--min-words", type=int, default=MIN_WORDS)
    ap.add_argument(
        "--min-alpha-milli", type=int, default=MIN_ALPHA_MILLI,
        help="min lowercase-alpha chars per 1000 chars",
    )
    ap.add_argument(
        "--max-dup-word-milli", type=int, default=MAX_DUP_WORD_MILLI,
        help="max repeated word occurrences per 1000 words",
    )
    ap.add_argument(
        "--max-top-2gram-milli", type=int, default=MAX_TOP_2GRAM_MILLI,
        help="max share of the most common word 2-gram, in milli",
    )
    ap.add_argument(
        "--bucketed-warehouse",
        default=None,
        help="route the dedup stage's verify joins through a "
        "bucketBy(doc_id) corpus table (plans/bucketing.py)",
    )
    # decontamination (both modalities optional; see textops
    # .contamination_pairs and ann.sign_banded_cross_pairs)
    ap.add_argument(
        "--eval-docs",
        default=None,
        help="parquet of eval-set documents (doc_id, text): drop "
        "corpus docs whose shingle containment of any eval doc "
        "reaches 50% (train/test-leak gate)",
    )
    ap.add_argument(
        "--embeddings",
        default=None,
        help="parquet of corpus embeddings keyed by doc_id (or "
        "vec_id) — enables --eval-embeddings",
    )
    ap.add_argument(
        "--eval-embeddings",
        default=None,
        help="parquet of eval-set embeddings: drop corpus docs whose "
        "embedding cosine to any eval vector reaches --semantic-tau "
        "(semantic decontamination, sign-banded + exact verify)",
    )
    ap.add_argument("--semantic-tau", type=float, default=0.9)
    ap.add_argument(
        "--semdedup-tau",
        type=int,
        default=0,
        metavar="MICRO",
        help="SemDeDup pass over the dedup survivors: remove docs whose "
        "embedding cosine to a lower-id same-cluster survivor is >= "
        "MICRO/1e6 (0 = off; needs --embeddings; operators/semdedup.py)",
    )
    ap.add_argument(
        "--semdedup-centroids",
        type=int,
        default=16,
        metavar="K",
        help="k-means cluster count for the SemDeDup pass — the "
        "paper's cost knob (per-task work is cluster_size**2): size it "
        "so survivors/K stays in the hundreds at large corpus sizes",
    )
    ap.add_argument(
        "--strip-spans",
        type=int,
        default=0,
        metavar="W",
        help="passage-level ExactSubstr dedup: strip every non-keeper "
        "corpus-repeated W-token span before decontamination/dedup "
        "(0 = off; operators/spans.py)",
    )
    ap.add_argument(
        "--max-oov-milli",
        type=int,
        default=0,
        help="extra quality gate: drop docs whose rate of corpus-hapax "
        "word occurrences exceeds this (milli; 0 = off; CCNet-style "
        "statistical filter, textops.word_freq_scores)",
    )
    ap.add_argument(
        "--strip-repeated-lines",
        action="store_true",
        help="intra-document line dedup before the quality gates: keep "
        "only the first occurrence of each line within a page "
        "(textops.strip_repeated_lines; row-preserving)",
    )
    ap.add_argument(
        "--scrub-pii",
        action="store_true",
        help="replace emails/IPv4s/phone-shaped numbers with placeholder "
        "tokens after the quality gates, before span-strip/decontam/"
        "dedup (operators/pii.py; row-preserving)",
    )
    ap.add_argument(
        "--oversize-policy",
        choices=("drop", "sample", "star"),
        default="drop",
        help="over-cap LSH buckets in the dedup stage: drop / sample "
        "/ star hub edges (mega-cluster-safe, config.py)",
    )
    ap.add_argument(
        "--decontam-bloom",
        action="store_true",
        help="run --eval-docs decontamination through the broadcast "
        "Bloom prefilter (bit-identical results, map-side pruning of "
        "non-matching corpus shingles; functions/bloom.py)",
    )
    ap.add_argument(
        "--max-per-host",
        type=int,
        default=0,
        metavar="N",
        help="per-domain cap on the final survivors: at most N pages "
        "per url host, longest pages win (0 = off; "
        "operators/webops.py::cap_docs_per_key)",
    )
    ap.add_argument(
        "--keep",
        choices=("min_id", "earliest", "longest"),
        default="min_id",
        help="which copy survives per duplicate cluster: smallest doc "
        "id, first-crawled (warc_ts), or longest text "
        "(operators/cc.py::cluster_representatives)",
    )
    ap.add_argument(
        "--no-stage-counts",
        action="store_true",
        help="skip the per-stage funnel counts: every count is a "
        "materialization barrier (one extra corpus action per stage); "
        "production runs that only need the final survivor count get "
        "the stages fused lazily instead (stage caches are still "
        "pinned and populate on first downstream use)",
    )
    args = ap.parse_args()

    from metacache_mpi_spark.session import get_spark
    from metacache_mpi_spark.sources.pages import write_corpus

    if args.generate:
        write_corpus(args.input, n_pages=args.generate, seed=42)

    spark = get_spark(args.cores, app_name="clean-job")
    t0 = time.time()
    counts = run(spark, args)
    dt = time.time() - t0
    print(
        json.dumps(
            {
                **counts,
                "docs_per_sec": round(
                    counts.get("raw", counts["clean"]) / dt, 1
                ),
                "sec": round(dt, 2),
            }
        )
    )
    spark.stop()


def run(spark, args) -> dict:
    """The cleanup funnel body (separated from main() so tests drive
    it on a shared session; main owns argparse/session/JSON-line).

    Returns a MIXED-shape mapping (ADVICE r6): integer per-stage funnel
    counts, plus two nested audit objects — ``stage_sec`` (stage → wall
    seconds) and, in bucketed-warehouse mode, ``warehouse`` (table /
    reused / fingerprint).  Consumers iterating counts as integers must
    skip the dict-valued keys."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.textops import (
        quality_gate,
        remove_boilerplate_lines,
    )
    from metacache_mpi_spark.operators.webops import url_dedup_latest
    from metacache_mpi_spark.plans.pipeline import dedup_pipeline
    from metacache_mpi_spark.sources.pages import load_pages

    counts: dict[str, int] = {}
    # per-stage wall seconds between funnel barriers (each counts[...]
    # materialization is one): "clean" covers the whole dedup stage
    # (sketch -> verify -> CC -> representative pick -> output write),
    # which has no intermediate action of its own.  Copied into the
    # RESULT JSON line — the per-stage profile a funnel operator needs.
    import time as _time

    stage_sec: dict[str, float] = {}
    _last = [_time.time()]
    # --no-stage-counts: funnel counts are materialization barriers
    # (one corpus-wide action each); with the flag only the final
    # "clean" count runs and the stages fuse lazily into their first
    # downstream consumer (measured at 200k docs × 16 cores: the
    # count-barrier overhead is the delta recorded in
    # OPTIMIZATION_r07.md).  Stage caches still persist() — they
    # populate on first use instead of at the barrier.
    lazy = bool(getattr(args, "no_stage_counts", False))

    def _count(key: str, n: int) -> int:
        counts[key] = n
        now = _time.time()
        stage_sec[key] = round(now - _last[0], 2)
        _last[0] = now
        return n

    pages = load_pages(spark, args.input)
    if not lazy:
        _count("raw", pages.count())

    # 1. crawl-snapshot dedup on canonical URL identity
    pages = url_dedup_latest(pages).withColumn(
        "url", F.coalesce("canon_url", "url")
    )
    docs = pages.select("doc_id", "url", "text").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    if not lazy:
        _count("after_url_dedup", docs.count())

    # 1b. optional intra-document line dedup (keep-first within a page)
    #     BEFORE the cross-document df count, so a page repeating its
    #     own nav block 50× contributes df=1, not a false boilerplate
    #     vote.  Row-preserving, pure projection — folds into the scan.
    if getattr(args, "strip_repeated_lines", False):
        from metacache_mpi_spark.operators.textops import (
            strip_repeated_lines,
        )

        stripped = strip_repeated_lines(docs)
        if not lazy:
            _count("intra_doc_lines_dropped", int(
                stripped.agg(F.sum("n_dropped")).first()[0] or 0
            ))
        # passthrough columns: NO join-back, the stage stays shuffle-free
        docs = stripped.select(
            "doc_id", "url", F.col("clean_text").alias("text")
        )

    # 2. cross-document boilerplate line removal; the cleaned text is
    #    the text every later stage (and the output) sees.  Cached:
    #    three stat operators + the dedup pipeline consume it.
    clean = (
        remove_boilerplate_lines(docs)
        .where(F.col("n_lines_kept") > 0)
        .select("doc_id", F.col("clean_text").alias("text"))
        .join(docs.select("doc_id", "url"), "doc_id")
        .persist()
    )
    if not lazy:
        _count("after_boilerplate", clean.count())

    # 3. quality gates — ONE fused row-local filter (quality_gate is
    #    the predicate composition of token_stats / quality_scores /
    #    repetition_stats; the joined formulation cost 3 corpus scans
    #    + 3 doc_id exchanges for row-local signals — measured 36.5 s
    #    → 8.0 s at 200k/16 cores)
    gated = quality_gate(
        clean,
        min_words=getattr(args, "min_words", MIN_WORDS),
        min_alpha_milli=getattr(args, "min_alpha_milli", MIN_ALPHA_MILLI),
        max_dup_word_milli=getattr(
            args, "max_dup_word_milli", MAX_DUP_WORD_MILLI
        ),
        max_top_2gram_milli=getattr(
            args, "max_top_2gram_milli", MAX_TOP_2GRAM_MILLI
        ),
    )
    if getattr(args, "max_oov_milli", 0):
        from metacache_mpi_spark.operators.textops import word_freq_scores

        # corpus-statistical signal (vocabulary df) — genuinely NOT
        # row-local, stays a join; the keep-set scales with the corpus
        # so shuffle join, never broadcast
        wf = (
            word_freq_scores(clean)
            .where(F.col("oov_milli") <= args.max_oov_milli)
            .select("doc_id")
        )
        gated = gated.join(wf.hint("shuffle_hash"), "doc_id")
    if not lazy:
        _count("after_quality", gated.count())

    # 3b. decontamination — drop anything too close to the eval set,
    #     in EITHER modality (verbatim shingle containment / embedding
    #     cosine).  Contaminated ids are tiny relative to the corpus
    #     but derived FROM it, so they leave via anti-join, arriving as
    #     whatever side AQE sizes them to.
    extra_pins: list = []  # stage caches whose projections ride forward

    def _advance(prev, nxt, stage_key):
        """Pin a decontam stage's output, materialize it via its funnel
        count, release the superseded caches — each expensive anti-join
        lineage (corpus-wide shingle join / banded cosine verify) runs
        exactly once even though the result feeds the next stage, the
        dedup pipeline and the output write.  EAGER release matters:
        every pinned frame here carries the corpus text, and stacking
        them (clean + one per stage + the pipeline's own sketch cache)
        overflows a default 1g spark-submit driver heap (unpersist on a
        never-pinned frame is a no-op)."""
        nxt = nxt.persist()
        if not lazy:
            _count(stage_key, nxt.count())
        prev.unpersist()
        clean.unpersist()  # superseded once any stage's output is pinned
        for p in extra_pins:  # e.g. the PII scrub cache its projection rode on
            p.unpersist()
        extra_pins.clear()
        return nxt

    def _emb(path):
        df = spark.read.parquet(path)
        if "vec_id" not in df.columns:
            df = df.withColumnRenamed("doc_id", "vec_id")
        return df.select("vec_id", "embedding")

    # 3aa. optional PII scrub — placeholders land BEFORE span-strip /
    #      decontamination / dedup, so two pages differing only in the
    #      injected email/IP unify for every downstream matcher.
    #      Row-preserving.  The scrub output (incl. n_redactions) is
    #      pinned and materialized ONCE: the old shape aggregated the
    #      redaction total on the un-pinned lineage and then pinned the
    #      projection, running the regex cascade over the whole corpus
    #      twice — measured 45.8 s + 39.8 s for the two passes at
    #      200k docs × 16 cores; one pass + two cached scans halves the
    #      stage.  The funnel's forward frame is a projection of the
    #      cache; the cache itself is released by the next _advance.
    if getattr(args, "scrub_pii", False):
        from metacache_mpi_spark.operators.pii import scrub_pii

        # cache only what downstream consumes (count, redaction total,
        # forward frame): projecting the raw text column OUT before the
        # persist halves the cache bytes — clean_text duplicates text
        # for every unredacted page, which is most of the corpus
        scrubbed = scrub_pii(gated).select(
            "doc_id", "url", "clean_text", "n_redactions"
        ).persist()
        if not lazy:
            n_after = scrubbed.count()  # ONE regex pass; populates cache
            _count("pii_redactions", int(
                scrubbed.agg(F.sum("n_redactions")).first()[0] or 0
            ))
        prev = gated
        gated = scrubbed.select(
            "doc_id", "url", F.col("clean_text").alias("text")
        )
        if not lazy:
            _count("after_pii_scrub", n_after)
        prev.unpersist()
        clean.unpersist()
        extra_pins.append(scrubbed)

    # 3a. optional passage-level dedup (ExactSubstr, Lee et al. 2022):
    #     strip every non-keeper corpus-repeated W-token span, then
    #     drop pages with nothing left.  Runs BEFORE decontamination
    #     and doc-level dedup so both see boilerplate-free passages.
    if getattr(args, "strip_spans", 0):
        from metacache_mpi_spark.operators.spans import (
            exact_substring_dedup,
        )

        stripped = (
            exact_substring_dedup(gated, window=args.strip_spans)
            .where(F.col("n_tokens_kept") > 0)
            .select("doc_id", F.col("clean_text").alias("text"))
            .join(gated.select("doc_id", "url"), "doc_id")
        )
        gated = _advance(gated, stripped, "after_span_strip")

    if args.eval_docs:
        from metacache_mpi_spark.operators.textops import (
            contamination_pairs,
            contamination_pairs_bloom,
        )

        # bloom lane is bit-identical (FPs die in the exact join) but
        # prunes non-matching corpus shingles map-side — the right
        # shape when the corpus dwarfs the eval set (always, at scale)
        scan = (
            contamination_pairs_bloom
            if getattr(args, "decontam_bloom", False)
            else contamination_pairs
        )
        evald = spark.read.parquet(args.eval_docs).select("doc_id", "text")
        # exclude_self=False: the eval set is an EXTERNAL id namespace —
        # an eval id that happens to equal a corpus id must still flag
        hit = scan(
            gated, evald, exclude_self=False
        ).select("doc_id").distinct()
        gated = _advance(
            gated, gated.join(hit, "doc_id", "left_anti"),
            "after_decontam_text",
        )
    if args.eval_embeddings:
        if not args.embeddings:
            raise ValueError("--eval-embeddings needs --embeddings")
        from metacache_mpi_spark.operators.ann import (
            sign_banded_cross_pairs,
        )

        # only SURVIVING docs' embeddings band+verify: dead docs would
        # waste the whole banded pass and inflate (band, bband) counts
        # toward the bucket cap, costing live-doc recall
        corpus_emb = _emb(args.embeddings).join(
            gated.select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_semi",
        )
        probe = corpus_emb.first()
        if probe is None:
            # empty survivors/embeddings: nothing can be contaminated
            if not lazy:
                _count("after_decontam_semantic", gated.count())
        else:
            pairs = sign_banded_cross_pairs(
                corpus_emb,
                _emb(args.eval_embeddings),
                tau=args.semantic_tau,
                dims=len(probe["embedding"]),
            )
            hit = pairs.select(F.col("a").alias("doc_id")).distinct()
            gated = _advance(
                gated, gated.join(hit, "doc_id", "left_anti"),
                "after_decontam_semantic",
            )

    # 4. near-duplicate dedup; survivors = cluster representative
    # (getattr: run() is also driven by tests with a bare namespace)
    from dataclasses import replace

    from metacache_mpi_spark.config import DEFAULT_CONFIG

    cfg = replace(
        DEFAULT_CONFIG,
        oversize_policy=getattr(args, "oversize_policy", "drop"),
    )
    res = dedup_pipeline(
        gated, cfg, bucketed_warehouse=args.bucketed_warehouse
    )
    if "warehouse" in res.metrics:
        # audit line: which bucketed sketch state served the dedup
        # stage — fingerprint + reused-vs-freshly-written
        counts["warehouse"] = res.metrics["warehouse"]
    from metacache_mpi_spark.operators.cc import cluster_representatives

    keep = getattr(args, "keep", "min_id")
    # "earliest" needs warc_ts, which the text funnel dropped — join it
    # back from the url-deduped pages (one row per surviving doc_id)
    rep_pages = (
        gated.join(pages.select("doc_id", "warc_ts"), "doc_id")
        if keep == "earliest"
        else gated
    )
    reps = cluster_representatives(res.clusters, rep_pages, keep).select(
        F.col("rep_id").alias("doc_id")
    )
    survivors = gated.join(reps.hint("shuffle_hash"), "doc_id")

    # 5. optional SemDeDup (Abbas et al. 2023): after verbatim/near-dup
    #    dedup, drop SEMANTIC duplicates (paraphrases, re-renders) of a
    #    lower-id survivor in the same embedding cluster
    if getattr(args, "semdedup_tau", 0):
        if not args.embeddings:
            raise ValueError("--semdedup-tau needs --embeddings")
        from metacache_mpi_spark.operators.semdedup import semantic_dedup

        emb_surv = _emb(args.embeddings).join(
            survivors.select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_semi",
        )
        verdict = semantic_dedup(
            emb_surv,
            n_centroids=getattr(args, "semdedup_centroids", 16),
            tau_micro=args.semdedup_tau,
        )
        # anti-join on the REMOVED set (not inner-join on keepers):
        # survivors without an embedding row must pass through
        sem_drop = verdict.where(verdict.removed).select(
            F.col("vec_id").alias("doc_id")
        )
        survivors = survivors.join(
            sem_drop.hint("shuffle_hash"), "doc_id", "left_anti"
        )

    # 6. optional per-host cap (C4/Dolma-style): no single domain may
    #    contribute more than N surviving pages — keeps mirror farms
    #    and blog platforms from dominating the clean corpus.  Longest
    #    pages win (ties by doc_id).  Count-first plan in webops: only
    #    over-cap hosts' rows are windowed.
    if getattr(args, "max_per_host", 0):
        from metacache_mpi_spark.operators.webops import cap_docs_per_key

        hosted = survivors.withColumn(
            "__host",
            F.lower(F.try_parse_url(F.col("url"), F.lit("HOST"))),
        )
        survivors = cap_docs_per_key(
            hosted,
            "__host",
            args.max_per_host,
            [F.length("text").desc(), F.col("doc_id").asc()],
        ).drop("__host")
        if not lazy:
            _count("after_host_cap", survivors.count())

    survivors.write.mode("overwrite").parquet(args.output)
    _count("clean", spark.read.parquet(args.output).count())
    # release every pinned subtree: run() is driven on SHARED sessions
    # by tests (unpersist is a no-op on frames that were never pinned)
    clean.unpersist()
    gated.unpersist()
    res.unpersist()
    for p in extra_pins:
        p.unpersist()
    counts["stage_sec"] = stage_sec
    return counts


if __name__ == "__main__":
    main()
