"""URL canonicalization + crawl-snapshot dedup (webops): the webtext
analog of the reference's accession-identity target lookup — page
identity is established BEFORE the sketch/LSH stages see the corpus."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from metacache_mpi_spark.operators.webops import (
    canonical_url,
    url_dedup_latest,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["canon_url"] for r in canonical_url(df).collect()]


def test_canonical_url_rules(spark):
    cases = {
        # scheme+host case, default port, fragment, tracking params,
        # param sort, trailing slash
        "HTTP://Site0.Example:80/a/b/?utm_source=x&b=2&a=1#frag":
            "http://site0.example/a/b?a=1&b=2",
        "https://site0.example:443/": "https://site0.example/",
        "https://site0.example": "https://site0.example/",
        "https://site0.example/path/": "https://site0.example/path",
        "https://site0.example/path//": "https://site0.example/path",
        "https://site0.example:8443/x": "https://site0.example:8443/x",
        "https://site0.example/x?gclid=1&fbclid=2&ref=rss":
            "https://site0.example/x",
        "http://site0.example/x?keep=1": "http://site0.example/x?keep=1",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_canonical_url_invalid_is_null(spark):
    got = _canon(spark, ["not a url", "ftp//broken"])
    assert got == [None, None]


def test_url_dedup_latest_keeps_newest_crawl(spark):
    t = dt.datetime(2024, 1, 1)
    rows = [
        ("http://A.example/p?utm_source=x", t, "old"),
        ("http://a.example:80/p", t + dt.timedelta(days=2), "new"),
        ("http://a.example/p#top", t + dt.timedelta(days=1), "mid"),
        ("http://b.example/q", t, "only"),
        ("not a url", t, "kept-raw"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    )
    out = url_dedup_latest(pages)
    got = {r["canon_url"]: r["text"] for r in out.collect()}
    # three crawls of a.example/p collapse to the newest
    assert got["http://a.example/p"] == "new"
    assert got["http://b.example/q"] == "only"
    # un-canonicalizable rows survive under their raw identity
    assert got[None] == "kept-raw"
    assert out.count() == 3


def test_url_dedup_is_deterministic_on_ts_ties(spark):
    t = dt.datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [("http://a.example/p?z=1", t, "zz"), ("http://a.example/p?z=1#f", t, "aa")],
        "url string, warc_ts timestamp, text string",
    )
    # same canon_url, same ts -> lowest raw url wins
    assert url_dedup_latest(pages).collect()[0]["text"] == "zz"


def test_dedup_plan_is_one_keyed_window(spark):
    pages = spark.createDataFrame(
        [("http://a.example/p", dt.datetime(2024, 1, 1), "x")],
        "url string, warc_ts timestamp, text string",
    )
    plan = (
        url_dedup_latest(pages)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one keyed shuffle (the window partitioning), nothing quadratic
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan


def test_pipeline_canonicalize_urls_collapses_crawls(spark):
    """Crawl snapshots of one logical page reach the sketch stage as a
    single row when the pipeline identity is the canonical URL."""
    import datetime as dt

    from metacache_mpi_spark.plans.pipeline import prepare_docs

    t = dt.datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [
            ("HTTP://A.Example/p?utm_source=x", t, "body one"),
            ("http://a.example:80/p", t + dt.timedelta(days=1), "body two"),
            ("http://b.example/q", t, "other"),
        ],
        "url string, warc_ts timestamp, text string",
    )
    docs = prepare_docs(pages, canonicalize_urls=True)
    rows = {r["url"]: r["text"] for r in docs.collect()}
    assert rows == {
        "http://a.example/p": "body two",
        "http://b.example/q": "other",
    }
    # default path unchanged: raw urls all distinct -> 3 rows
    assert prepare_docs(pages).count() == 3


def test_remove_boilerplate_lines_strips_site_templates(spark):
    """On the pages corpus every site's head/foot boilerplate repeats
    across its pages; bodies are unique.  Cleanup must drop exactly the
    template lines and preserve body order."""
    from metacache_mpi_spark.operators.textops import (
        remove_boilerplate_lines,
    )
    from metacache_mpi_spark.sources.pages import generate_pages

    pages, _ = generate_pages(n_pages=120, seed=7)
    docs = spark.createDataFrame(
        pages[["url", "text"]]
    ).selectExpr("xxhash64(url) AS doc_id", "text")
    out = remove_boilerplate_lines(docs, min_df=2).collect()
    assert len(out) == docs.count()

    # exact mini-oracle in pandas: per-doc-distinct line df >= 2 (and
    # len >= 10) is boilerplate; survivors keep document order
    from collections import Counter

    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    df_count: Counter = Counter()
    for t in orig.values():
        df_count.update({l for l in t.split("\n") if len(l) >= 10})
    dropped_lines = 0
    for r in out:
        lines = orig[r["doc_id"]].split("\n")
        want = [
            l for l in lines if not (len(l) >= 10 and df_count[l] >= 2)
        ]
        got = r["clean_text"].split("\n") if r["clean_text"] else []
        assert got == want, r["doc_id"]
        assert r["n_lines_kept"] == len(want)
        assert r["n_lines_dropped"] == len(lines) - len(want)
        dropped_lines += r["n_lines_dropped"]
    # the corpus genuinely carries site templates -> plenty dropped
    assert dropped_lines >= 200


def test_canonical_url_is_idempotent(spark):
    """canon(canon(u)) == canon(u): the canonical form is a fixed
    point, so re-ingesting already-canonicalized corpora is safe."""
    urls = [
        "HTTP://Site0.Example:80/a/b/?utm_source=x&b=2&a=1#frag",
        "https://site0.example:443/",
        "https://site0.example",
        "https://site0.example/path//",
        "https://site0.example:8443/x?z=1&y=2",
        "http://user@site0.example/x",
        "https://site0.example/x?gclid=1&keep=2&ref=rss",
        "http://site0.example/%7Euser/a%20b?q=%2F",
        "https://xn--bcher-kva.example/b?b=1&a=2&a=1",
        "http://site0.example/?",
        "http://site0.example/a?a=",
        "http://site0.example/a?a",
    ]
    once = [u for u in _canon(spark, urls) if u is not None]
    assert len(once) == len(urls)
    twice = _canon(spark, once)
    assert twice == once


def test_contamination_pairs_planted_leak(spark):
    """A verbatim benchmark leak (eval text copied into a training doc)
    scores containment 1000; an unrelated doc never reaches threshold."""
    from metacache_mpi_spark.operators.textops import contamination_pairs

    evaltext = "the quick brown fox jumps over the lazy dog again"
    corpus = spark.createDataFrame(
        [
            (1, "PREFIX " + evaltext + " SUFFIX"),   # full leak
            (2, "completely different content with no overlap at all"),
            (3, evaltext[: len(evaltext) // 2]),      # partial leak
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(100, evaltext)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["containment_milli"]
        for r in contamination_pairs(
            corpus, evalset, min_containment_milli=0
        ).collect()
    }
    assert got[1] == 1000      # every eval shingle present
    assert 2 not in got        # no shared shingle at all
    assert 0 < got[3] < 1000   # half the text -> partial containment
    # thresholded variant keeps only the real leak
    flagged = contamination_pairs(corpus, evalset).collect()
    assert [r["doc_id"] for r in flagged] == [1]


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Membership for every built key is guaranteed (no false
    negatives); disjoint probes pass at ~the configured FP rate."""
    from metacache_mpi_spark.functions.bloom import (
        bloom_filter_df,
        build_bloom,
    )

    members = spark.range(2000).selectExpr(
        "concat('member_', id) AS sh"
    )
    bits, m, k = build_bloom(members, "sh")
    assert bloom_filter_df(members, "sh", bits, m, k).count() == 2000

    others = spark.range(2000).selectExpr("concat('other_', id) AS sh")
    fp = bloom_filter_df(others, "sh", bits, m, k).count()
    # expected ~0.1% of 2000 = 2; generous ceiling against hash luck
    assert fp <= 40


def test_bloom_probe_is_map_side(spark):
    """The bloom probe subtree must be shuffle-free: scan -> hash cols
    -> ArrowEvalPython -> Filter, with zero Exchange nodes."""
    from metacache_mpi_spark.functions.bloom import (
        bloom_filter_df,
        build_bloom,
    )

    keys = spark.range(100).selectExpr("concat('k', id) AS sh")
    bits, m, k = build_bloom(keys, "sh")
    probed = bloom_filter_df(
        spark.range(1000).selectExpr("concat('k', id % 300) AS sh"),
        "sh",
        bits,
        m,
        k,
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_bloom_build_guard_raises(spark):
    from metacache_mpi_spark.functions.bloom import build_bloom

    keys = spark.range(100).selectExpr("concat('k', id) AS sh")
    try:
        build_bloom(keys, "sh", max_build_rows=10)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "distinct keys" in str(e)


def test_contamination_bloom_equals_exact(spark):
    """Bloom lane ≡ exact lane bit for bit on the planted-leak fixture,
    and on a disjoint-vocabulary corpus the prefilter actually prunes
    (the 100 TB selectivity claim, measured)."""
    from metacache_mpi_spark.functions.bloom import (
        bloom_filter_df,
        build_bloom,
    )
    from metacache_mpi_spark.operators.textops import (
        contamination_pairs,
        contamination_pairs_bloom,
        shingles,
    )

    evaltext = "the quick brown fox jumps over the lazy dog again"
    corpus = spark.createDataFrame(
        [(1, "PREFIX " + evaltext + " SUFFIX")]
        + [
            # disjoint vocab: digits never collide with the eval shingles
            (i, " ".join(f"tok{i}_{j}" for j in range(30)))
            for i in range(2, 40)
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(100, evaltext)], "doc_id long, text string"
    )
    exact = sorted(
        map(tuple, contamination_pairs(corpus, evalset,
                                       min_containment_milli=0).collect())
    )
    bloom = sorted(
        map(tuple, contamination_pairs_bloom(
            corpus, evalset, min_containment_milli=0).collect())
    )
    assert bloom == exact and len(exact) >= 1

    # selectivity: non-leak docs' shingles are pruned map-side
    es = shingles(evalset)
    bits, m, k = build_bloom(es, "sh")
    total = shingles(corpus).count()
    kept = bloom_filter_df(shingles(corpus), "sh", bits, m, k).count()
    assert kept < total * 0.2  # leak doc ~ a few % of this corpus


def test_contamination_bloom_empty_evalset(spark):
    """Empty eval set -> empty result (m floors at 64 bits, no mod-0),
    matching the exact lane."""
    from metacache_mpi_spark.operators.textops import (
        contamination_pairs_bloom,
    )

    corpus = spark.createDataFrame(
        [(1, "some training document text here")],
        "doc_id long, text string",
    )
    empty = corpus.where("doc_id < 0")
    assert contamination_pairs_bloom(corpus, empty).count() == 0


def test_repetition_stats_hand_computed(spark):
    """Exact values on hand-computable inputs (the in-array longest-run
    formulation must equal the 2-gram mode)."""
    from metacache_mpi_spark.operators.textops import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b c"),      # 4 grams: "a b"x2,"b a","b c" -> top 500
            (2, "x y"),            # single gram -> 1000
            (3, "w"),              # no gram -> 0
            (4, "l1\nl2\nl1"),     # one dup line of 3
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["top_2gram_milli"] == 500
    assert got[1]["dup_word_milli"] == (5 - 3) * 1000 // 5
    assert got[2]["top_2gram_milli"] == 1000
    assert got[3]["top_2gram_milli"] == 0
    assert got[4]["dup_line_milli"] == 1000 // 3


def test_canonical_url_review_edge_cases(spark):
    """Edge cases from review: all-slash root collapses to '/', and
    tracking params match case-insensitively / without values."""
    cases = {
        "https://x.example//": "https://x.example/",
        "https://x.example/?": "https://x.example/",
        "http://x.example/x?gclid": "http://x.example/x",
        "http://x.example/x?UTM_SOURCE=y&keep=1":
            "http://x.example/x?keep=1",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())
    # fixed-point on the edge cases too
    assert _canon(spark, got) == got


def test_crawl_diff_statuses(spark):
    """All four statuses on a hand-built pair of crawl snapshots,
    including the NULL-text-on-both-sides `unchanged` edge."""
    from metacache_mpi_spark.operators.webops import crawl_diff

    old = spark.createDataFrame(
        [
            (1, "u/stay", "same text"),
            (2, "u/edit", "version one"),
            (3, "u/gone", "bye"),
            (5, "u/null", None),
        ],
        "doc_id long, url string, text string",
    )
    new = spark.createDataFrame(
        [
            (11, "u/stay", "same text"),
            (12, "u/edit", "version two"),
            (14, "u/new", "hello"),
            (15, "u/null", None),
        ],
        "doc_id long, url string, text string",
    )
    got = {r["url"]: r for r in crawl_diff(old, new).collect()}
    assert got["u/stay"]["status"] == "unchanged"
    assert got["u/edit"]["status"] == "changed"
    assert got["u/gone"]["status"] == "removed"
    assert got["u/new"]["status"] == "added"
    assert got["u/null"]["status"] == "unchanged"
    assert got["u/gone"]["new_doc_id"] is None
    assert got["u/new"]["old_doc_id"] is None
    assert (got["u/edit"]["old_doc_id"], got["u/edit"]["new_doc_id"]) == (
        2,
        12,
    )


def test_crawl_diff_score_changes(spark):
    """score_changes: changed urls carry the exact old-vs-new shingle
    Jaccard (identical text under a changed hash is impossible, so the
    interesting cases are small-edit ≈ high score, rewrite = 0);
    other statuses carry null."""
    from metacache_mpi_spark.operators.webops import crawl_diff

    long_a = "".join(f"w{i:02d} " for i in range(40))
    old = spark.createDataFrame(
        [
            (1, "u/minor", long_a),
            (2, "u/rewrite", long_a),
            (3, "u/same", "identical words here"),
            (4, "u/gone", "bye"),
        ],
        "doc_id long, url string, text string",
    )
    new = spark.createDataFrame(
        [
            (11, "u/minor", long_a + "tail"),   # small append
            (12, "u/rewrite", "".join(f"z{i:02d} " for i in range(40))),
            (13, "u/same", "identical words here"),
            (14, "u/new", "hello"),
        ],
        "doc_id long, url string, text string",
    )
    got = {
        r["url"]: r
        for r in crawl_diff(old, new, score_changes=True).collect()
    }
    assert got["u/minor"]["status"] == "changed"
    assert got["u/minor"]["change_jaccard_milli"] >= 900
    assert got["u/rewrite"]["change_jaccard_milli"] == 0
    for u in ("u/same", "u/gone", "u/new"):
        assert got[u]["change_jaccard_milli"] is None

    # the advertised row-local property, plan-asserted: scoring adds an
    # Arrow projection but NO Exchange beyond the diff join's own
    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange")

    assert n_exchanges(
        crawl_diff(old, new, score_changes=True)
    ) == n_exchanges(crawl_diff(old, new))


def test_cap_docs_per_key(spark):
    """Per-key document cap: over-cap keys keep exactly max_docs rows
    under the given order; under-cap keys pass through untouched."""
    from metacache_mpi_spark.operators.webops import cap_docs_per_key

    docs = spark.createDataFrame(
        [
            # hot host: 4 docs, cap 2, longest-first -> keep 11, 13
            (10, "hot", 5),
            (11, "hot", 90),
            (12, "hot", 40),
            (13, "hot", 90),   # ties with 11 on length; doc_id asc
            # cold host: 2 docs, under cap -> both survive
            (20, "cold", 1),
            (21, "cold", 2),
        ],
        "doc_id long, key string, n long",
    )
    got = sorted(
        r["doc_id"]
        for r in cap_docs_per_key(
            docs, "key", 2, [F.col("n").desc(), F.col("doc_id").asc()]
        ).collect()
    )
    assert got == [11, 13, 20, 21]

    # default order: doc_id ascending
    got = sorted(
        r["doc_id"] for r in cap_docs_per_key(docs, "key", 3).collect()
    )
    assert got == [10, 11, 12, 20, 21]

    # NULL keys form ONE capped group (null-safe join; a plain equi
    # anti-join would exempt every NULL-key row from the cap)
    docs_null = spark.createDataFrame(
        [(1, None, 1), (2, None, 2), (3, None, 3), (4, "k", 1)],
        "doc_id long, key string, n long",
    )
    got = sorted(
        r["doc_id"] for r in cap_docs_per_key(docs_null, "key", 2).collect()
    )
    assert got == [1, 2, 4]

    import pytest

    with pytest.raises(ValueError, match="max_docs"):
        cap_docs_per_key(docs, "key", 0)


def _load_clean_job():
    """Import scripts/clean_job.py as a module (it lives outside the
    package; the job's run() is driven directly by these tests)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "clean_job",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "clean_job.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_clean_job_max_per_host(spark, tmp_path):
    """clean_job --max-per-host: the final survivors carry at most N
    pages per url host."""
    import argparse
    import importlib.util
    import os

    from metacache_mpi_spark.sources.pages import write_corpus

    clean_job = _load_clean_job()

    cdir = str(tmp_path / "corpus")
    write_corpus(cdir, n_pages=150, seed=31)

    args = argparse.Namespace(
        input=cdir, output=str(tmp_path / "out"), generate=0, cores=None,
        bucketed_warehouse=None, eval_docs=None, embeddings=None,
        eval_embeddings=None, semantic_tau=0.9, max_per_host=1,
    )
    counts = clean_job.run(spark, args)
    out = spark.read.parquet(str(tmp_path / "out"))
    per_host = (
        out.withColumn(
            "host", F.lower(F.try_parse_url(F.col("url"), F.lit("HOST")))
        )
        .groupBy("host")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_host == 1
    assert counts["clean"] == out.count()


def test_cleanup_composition_funnel(spark, tmp_path):
    """The clean_job composition (url dedup -> boilerplate -> quality
    gates -> near-dup dedup) over a generated crawl: counts fall
    monotonically and near-dups are actually removed."""
    from metacache_mpi_spark.operators.textops import (
        quality_scores,
        remove_boilerplate_lines,
        repetition_stats,
        token_stats,
    )
    from metacache_mpi_spark.plans.pipeline import dedup_pipeline
    from metacache_mpi_spark.sources.pages import load_pages, write_corpus

    write_corpus(str(tmp_path / "c"), n_pages=200, seed=11)
    pages = load_pages(spark, str(tmp_path / "c"))
    docs = pages.select("doc_id", "url", "text")
    n_raw = docs.count()

    clean = (
        remove_boilerplate_lines(docs)
        .where(F.col("n_lines_kept") > 0)
        .select("doc_id", F.col("clean_text").alias("text"))
        .join(docs.select("doc_id", "url"), "doc_id")
        .persist()
    )
    n_boiler = clean.count()
    keep = (
        token_stats(clean).select("doc_id", "n_tokens")
        .join(quality_scores(clean).select("doc_id", "alpha_milli"), "doc_id")
        .join(
            repetition_stats(clean).select(
                "doc_id", "dup_word_milli", "top_2gram_milli"
            ),
            "doc_id",
        )
        .where(
            (F.col("n_tokens") >= 20)
            & (F.col("alpha_milli") >= 500)
            & (F.col("dup_word_milli") <= 900)
            & (F.col("top_2gram_milli") <= 300)
        )
        .select("doc_id")
    )
    gated = clean.join(keep.hint("shuffle_hash"), "doc_id")
    n_quality = gated.count()
    res = dedup_pipeline(gated)
    reps = res.clusters.groupBy("cluster_id").agg(
        F.min("doc_id").alias("doc_id")
    )
    n_clean = gated.join(reps.select("doc_id"), "doc_id").count()
    # monotone funnel; boilerplate removal eats exact dups (all their
    # lines repeat), near-dup dedup must remove more
    assert n_raw >= n_boiler >= n_quality >= n_clean
    assert n_boiler < n_raw
    assert n_clean < n_quality
    assert n_clean > 0
    clean.unpersist()
    res.unpersist()


def test_clean_job_decontamination_stages(spark, tmp_path):
    """clean_job.run with both decontamination modalities: a corpus doc
    that verbatim-contains an eval doc leaves at the text stage; a doc
    whose embedding matches an eval vector leaves at the semantic
    stage; everything else flows through.  Drives the actual CLI body
    (argparse Namespace → run)."""
    import argparse
    import importlib.util
    import os

    import numpy as np

    from metacache_mpi_spark.sources.pages import load_pages, write_corpus

    clean_job = _load_clean_job()

    cdir = str(tmp_path / "corpus")
    write_corpus(cdir, n_pages=150, seed=23)
    pages = load_pages(spark, cdir)

    # text eval set: one real corpus text (full containment) — pick a
    # clean-looking survivor deterministically.  NB the eval doc is the
    # RAW text while containment runs on boilerplate-cleaned text: the
    # generator's boilerplate fraction must stay well under 50% for the
    # strict after_decontam_text < after_quality assertion to hold.
    sample = pages.where("length(text) > 400").orderBy("doc_id").first()
    assert sample is not None, "generator produced no long pages"
    evald = str(tmp_path / "eval_docs")
    spark.createDataFrame(
        [(999_001, sample["text"])], "doc_id long, text string"
    ).write.parquet(evald)

    # embeddings: every doc gets a random vector; ONE other doc gets an
    # eval vector's near-copy
    rng = np.random.RandomState(5)
    ids = [r["doc_id"] for r in pages.select("doc_id").collect()]
    planted = sorted(ids)[5]
    evec = rng.randn(16)
    rows = [
        (
            i,
            (evec + 0.01 * rng.randn(16)).tolist()
            if i == planted
            else rng.randn(16).tolist(),
        )
        for i in ids
    ]
    embp = str(tmp_path / "emb")
    spark.createDataFrame(rows, "doc_id long, embedding array<double>").write.parquet(embp)
    evalemb = str(tmp_path / "eval_emb")
    spark.createDataFrame(
        [(999_101, evec.tolist())], "vec_id long, embedding array<double>"
    ).write.parquet(evalemb)

    args = argparse.Namespace(
        input=cdir, output=str(tmp_path / "out"), generate=0, cores=None,
        bucketed_warehouse=None, eval_docs=evald, embeddings=embp,
        eval_embeddings=evalemb, semantic_tau=0.9,
        # bloom prefilter is bit-identical to the exact lane (gated by
        # test_contamination_bloom_equals_exact); driving it here also
        # covers the CLI wiring
        decontam_bloom=True,
    )
    counts = clean_job.run(spark, args)
    # both stages removed at least their planted doc, monotonically
    assert counts["after_decontam_text"] < counts["after_quality"]
    assert (
        counts["after_decontam_semantic"] <= counts["after_decontam_text"]
    )
    assert counts["clean"] <= counts["after_decontam_semantic"]
    out = spark.read.parquet(str(tmp_path / "out"))
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert sample["doc_id"] not in kept
    assert planted not in kept


def test_quality_gate_equals_joined_formulation(spark, tmp_path):
    """quality_gate (the fused row-local filter clean_job runs) keeps
    EXACTLY the docs the three-operator join formulation keeps — on an
    adversarial corpus that exercises every predicate boundary (word
    count at/below the minimum, alpha ratio at the floor boundary,
    dup-word and top-2gram ratios at/over their caps, empty and
    single-token text) plus a slice of the generated crawl."""
    from metacache_mpi_spark.operators.textops import (
        quality_gate,
        quality_scores,
        repetition_stats,
        token_stats,
    )
    from metacache_mpi_spark.sources.pages import load_pages, write_corpus

    hand = [
        # passes everything: 25 distinct words, all lowercase+space
        ("h1", " ".join(f"word{i}" for i in range(25))),
        # 19 words = min_words - 1: dropped
        ("h2", " ".join(f"w{i}" for i in range(19))),
        # exactly 20 words: kept (>= is inclusive)
        ("h3", " ".join(f"tok{i}" for i in range(20))),
        # low alpha: 25 digit words -> alpha_milli 0
        ("h4", " ".join(str(i) * 3 for i in range(25))),
        # all-same word: dup_word_milli = 960 > 900
        ("h5", " ".join(["same"] * 25)),
        # 2-gram mode: 'a b' repeated -> top_2gram_milli 1000 > 300
        ("h6", " ".join(["a", "b"] * 15)),
        # empty text: dropped by the length(text) > 0 guard
        ("h7", ""),
        # single token, no space
        ("h8", "solitaryword"),
        # multiline with newlines (dup_line path in repetition_stats)
        ("h9", "\n".join(" ".join(f"l{i}n{j}" for j in range(7))
                         for i in range(4))),
        # boundary floor: 1 uppercase in 2000 chars of lowercase
        ("h10", ("x" * 999 + "Q " + "y " * 500).strip()),
    ]
    write_corpus(str(tmp_path / "c"), n_pages=150, seed=23)
    gen = load_pages(spark, str(tmp_path / "c")).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    docs = spark.createDataFrame(hand, "doc_id string, text string").union(
        gen
    )

    for (mw, ma, mdw, mtg) in [(20, 500, 900, 300), (1, 0, 1000, 1000),
                               (25, 950, 500, 100)]:
        joined = (
            token_stats(docs)
            .join(quality_scores(docs), ["doc_id", "n_chars_text"])
            .join(repetition_stats(docs), "doc_id")
            .where(
                (F.col("n_tokens") >= mw)
                & (F.col("alpha_milli") >= ma)
                & (F.col("dup_word_milli") <= mdw)
                & (F.col("top_2gram_milli") <= mtg)
            )
        )
        want = {r["doc_id"] for r in joined.select("doc_id").collect()}
        got = {
            r["doc_id"]
            for r in quality_gate(docs, mw, ma, mdw, mtg)
            .select("doc_id")
            .collect()
        }
        assert got == want, (mw, ma, mdw, mtg, got ^ want)

    # boundary rows behave as designed at the default thresholds
    kept = {
        r["doc_id"]
        for r in quality_gate(docs, 20, 500, 900, 300)
        .select("doc_id").collect()
    }
    assert {"h1", "h3"} <= kept
    assert kept.isdisjoint({"h2", "h4", "h5", "h6", "h7", "h8"})

    # the whole point: the gate is ONE row-local filter — no Exchange,
    # no join.  Assert over the local frame (load_pages' own
    # round-robin repartition would otherwise appear in the plan);
    # over a parquet source the predicate lands in the scan's
    # DataFilters, i.e. the gate folds into the scan.
    local = spark.createDataFrame(hand, "doc_id string, text string")
    plan = (
        quality_gate(local, 20, 500, 900, 300)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    gplan = (
        quality_gate(gen, 20, 500, 900, 300)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "element_at(transform" in gplan.split("FileScan")[1][:400]


def test_clean_job_quality_threshold_knobs(spark, tmp_path):
    """The quality-gate thresholds are CLI knobs: an impossible
    --min-words empties the funnel at the quality stage (and the job
    still completes on the empty survivor set); all-permissive
    thresholds pass every boilerplate survivor through."""
    import argparse
    import importlib.util
    import os

    from metacache_mpi_spark.sources.pages import write_corpus

    clean_job = _load_clean_job()

    cdir = str(tmp_path / "corpus")
    write_corpus(cdir, n_pages=120, seed=37)

    def run(**gate):
        args = argparse.Namespace(
            input=cdir, output=str(tmp_path / "out"), generate=0,
            cores=None, bucketed_warehouse=None, eval_docs=None,
            embeddings=None, eval_embeddings=None, semantic_tau=0.9,
            max_per_host=0, **gate,
        )
        return clean_job.run(spark, args)

    strict = run(min_words=10**6)
    assert strict["after_quality"] == 0
    assert strict["clean"] == 0

    permissive = run(
        min_words=0, min_alpha_milli=0,
        max_dup_word_milli=1000, max_top_2gram_milli=1000,
    )
    assert permissive["after_quality"] == permissive["after_boilerplate"]
    assert permissive["clean"] > 0
