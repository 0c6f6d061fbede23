"""Bucketed corpus tables: the candidate→corpus text-fetch join must
not shuffle the corpus side (the cluster-scale answer to the verify
pass's dominant exchange — BASELINE.md 500k profile)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metacache_mpi_spark.plans.bucketing import read_bucketed, write_bucketed


def test_bucketed_pair_join_elides_corpus_exchange(spark, tmp_path):
    corpus = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text"), F.col("id")).alias("text"),
    )
    write_bucketed(corpus, "corpus_b", num_buckets=8,
                   path=str(tmp_path / "corpus_b"))
    bucketed = read_bucketed(spark, "corpus_b")

    pairs = spark.range(50).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    # force the shuffle-join regime (a broadcast would hide the
    # bucketing; at corpus scale neither side is broadcastable)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = pairs.join(
            bucketed.select(
                F.col("doc_id").alias("a"), F.col("text").alias("text_a")
            ),
            "a",
        )
        assert joined.count() == 50
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # the bucketed corpus scan announces its layout and feeds the join
    # with NO exchange on its side — only the pair side shuffles
    assert "Bucketed: true" in plan
    corpus_scan = plan[plan.index("FileScan") :]
    assert "Exchange" not in corpus_scan
    # exactly one Exchange total (the pair side)
    assert plan.count("+- Exchange") == 1


def test_bucketed_roundtrip_values(spark, tmp_path):
    corpus = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    write_bucketed(corpus, "corpus_rt", num_buckets=4,
                   path=str(tmp_path / "corpus_rt"))
    back = read_bucketed(spark, "corpus_rt")
    assert back.count() == 100
    assert {r["doc_id"] for r in back.collect()} == set(range(100))


def test_pipeline_bucketed_warehouse_matches_and_elides_exchange(
    spark, tiny_corpus, tmp_path
):
    """Job-level: dedup_pipeline(bucketed_warehouse=...) produces the
    same pairs/clusters as the plain run, and its verify join feeds
    from bucketed corpus scans with no corpus-side Exchange."""
    from metacache_mpi_spark.operators.verify import gate_and_attach
    from metacache_mpi_spark.plans.pipeline import dedup_pipeline
    from metacache_mpi_spark.sources.pages import load_pages

    pages = load_pages(spark, tiny_corpus).where("pmod(doc_id, 3) = 0")
    plain = dedup_pipeline(pages)
    bucketed = dedup_pipeline(
        pages, bucketed_warehouse=str(tmp_path / "wh")
    )

    def rows(df, cols):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    assert rows(bucketed.pairs, ["a", "b", "dup_kind"]) == rows(
        plain.pairs, ["a", "b", "dup_kind"]
    )
    assert rows(bucketed.clusters, ["doc_id", "cluster_id"]) == rows(
        plain.clusters, ["doc_id", "cluster_id"]
    )

    # the full verify plan reads the corpus through bucketed scans
    plan = bucketed.pairs._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan

    # and the attach join itself (both corpus sides) is exchange-free
    # on the corpus side under the shuffle-join regime
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = spark.range(5).selectExpr(
            "id AS a", "id + 1 AS b", "2L AS band_hits", "0L AS fp_hits"
        )
        j = gate_and_attach(probe, bucketed.signatures)
        jplan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert jplan.count("Bucketed: true") == 2
    # exchanges only on the (pair-sized) probe side: two joins → at
    # most two probe-side exchanges, zero on the two corpus scans (an
    # un-bucketed corpus would add one exchange per scan side → 4)
    assert jplan.count("+- Exchange") <= 2


def test_bucketed_warehouse_is_write_once(spark, tiny_corpus, tmp_path):
    """A second pipeline run against the same warehouse REUSES the
    stored sketch table (no rewrite — rewriting would invalidate the
    first result's lazy DataFrames) and reproduces the same clusters."""
    from metacache_mpi_spark.plans.pipeline import dedup_pipeline
    from metacache_mpi_spark.sources.pages import load_pages

    wh = str(tmp_path / "wh_once")
    pages = load_pages(spark, tiny_corpus).where("pmod(doc_id, 3) = 1")
    first = dedup_pipeline(pages, bucketed_warehouse=wh)
    c1 = sorted(
        (r["doc_id"], r["cluster_id"]) for r in first.clusters.collect()
    )
    import os

    table_dir = next(
        os.path.join(wh, d) for d in os.listdir(wh)
        if d.startswith("mcs_sigs_")
        and os.path.isdir(os.path.join(wh, d))  # skip the .fingerprint.json
    )
    mtime = max(
        os.path.getmtime(os.path.join(table_dir, f))
        for f in os.listdir(table_dir)
    )
    second = dedup_pipeline(pages, bucketed_warehouse=wh)
    c2 = sorted(
        (r["doc_id"], r["cluster_id"]) for r in second.clusters.collect()
    )
    assert c1 == c2
    mtime2 = max(
        os.path.getmtime(os.path.join(table_dir, f))
        for f in os.listdir(table_dir)
    )
    assert mtime2 == mtime  # table files untouched by the second run
    # reuse is AUDITABLE: both runs surface the warehouse fingerprint
    # and the fresh-write/reuse decision in their metrics (jobs copy
    # this into their RESULT JSON line)
    w1, w2 = first.metrics["warehouse"], second.metrics["warehouse"]
    assert w1["reused"] is False and w2["reused"] is True
    assert w1["table"] == w2["table"]
    assert w1["fingerprint"] == w2["fingerprint"]
    assert w1["fingerprint"]["rows"] == first.signatures.count()


def test_bucketed_warehouse_rejects_different_corpus(
    spark, tiny_corpus, tmp_path
):
    """The write-once reuse contract is now GUARDED: a second
    dedup_pipeline call against the same warehouse with a DIFFERENT
    corpus must raise (r4 advice — previously it silently returned the
    stored corpus's clusters, ignoring the new pages)."""
    import pytest
    from pyspark.sql import functions as F

    from metacache_mpi_spark.plans.pipeline import dedup_pipeline
    from metacache_mpi_spark.sources.pages import load_pages

    wh = str(tmp_path / "wh_guard")
    pages = load_pages(spark, tiny_corpus)
    first = dedup_pipeline(pages, bucketed_warehouse=wh)
    n = first.clusters.count()
    assert n > 0

    # same corpus → reuse is fine
    again = dedup_pipeline(pages, bucketed_warehouse=wh)
    assert again.clusters.count() == n

    # different corpus (a strict subset) → fingerprint mismatch
    subset = pages.where(F.xxhash64("url") % 2 == 0)
    with pytest.raises(ValueError, match="DIFFERENT corpus"):
        dedup_pipeline(subset, bucketed_warehouse=wh)


def test_bucketed_warehouse_pre_guard_table_adopts_or_rejects(
    spark, tiny_corpus, tmp_path
):
    """A warehouse written before the fingerprint guard existed (no
    .fingerprint.json): reuse verifies the stored table's row count
    against the incoming corpus, then adopts + records the full
    fingerprint; a different-sized corpus is rejected even without a
    stored fingerprint."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from metacache_mpi_spark.plans.pipeline import dedup_pipeline
    from metacache_mpi_spark.sources.pages import load_pages

    wh = str(tmp_path / "wh_preguard")
    pages = load_pages(spark, tiny_corpus)
    first = dedup_pipeline(pages, bucketed_warehouse=wh)
    n = first.clusters.count()
    fp = next(
        os.path.join(wh, f) for f in os.listdir(wh)
        if f.endswith(".fingerprint.json")
    )
    os.remove(fp)  # simulate a pre-guard warehouse

    # same corpus: row-count check passes, fingerprint is re-recorded
    again = dedup_pipeline(pages, bucketed_warehouse=wh)
    assert again.clusters.count() == n
    assert os.path.exists(fp)

    os.remove(fp)
    subset = pages.where(F.xxhash64("url") % 2 == 0)
    with pytest.raises(ValueError, match="docs"):
        dedup_pipeline(subset, bucketed_warehouse=wh)


def test_bucketed_warehouse_survives_catalog_loss(
    spark, tiny_corpus, tmp_path
):
    """Cross-SESSION reuse: the in-memory catalog forgets external
    tables between spark-submit runs, but the files + _bucket_spec.json
    on disk are the durable truth.  Simulate a fresh session by
    DROP TABLE (external table: metadata-only, files survive — exactly
    what a new session sees) and re-run: the pipeline must RE-REGISTER
    from the spec instead of re-sketching, report reused=True, leave
    the table files untouched, and keep the bucket-local (Exchange-free
    corpus side) join property."""
    import os

    from metacache_mpi_spark.plans.pipeline import dedup_pipeline
    from metacache_mpi_spark.sources.pages import load_pages

    wh = str(tmp_path / "wh_session")
    pages = load_pages(spark, tiny_corpus).where("pmod(doc_id, 3) = 2")
    first = dedup_pipeline(pages, bucketed_warehouse=wh)
    c1 = sorted(
        (r["doc_id"], r["cluster_id"]) for r in first.clusters.collect()
    )
    table = first.metrics["warehouse"]["table"]
    table_dir = os.path.join(wh, table)
    assert os.path.exists(os.path.join(table_dir, "_bucket_spec.json"))
    mtime = max(
        os.path.getmtime(os.path.join(table_dir, f))
        for f in os.listdir(table_dir)
    )

    spark.sql(f"DROP TABLE `{table}`")  # what a new session looks like
    assert not spark.catalog.tableExists(table)
    assert os.path.exists(table_dir)  # external: files survived

    second = dedup_pipeline(pages, bucketed_warehouse=wh)
    c2 = sorted(
        (r["doc_id"], r["cluster_id"]) for r in second.clusters.collect()
    )
    assert c1 == c2
    assert second.metrics["warehouse"]["reused"] is True
    mtime2 = max(
        os.path.getmtime(os.path.join(table_dir, f))
        for f in os.listdir(table_dir)
    )
    assert mtime2 == mtime  # re-registered, never re-written
    # the re-registered table still carries its bucket spec in the
    # catalog (a bare scan prints "Bucketed: false (... only if
    # needed)", so assert the metadata, which is what joins consume)
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE FORMATTED `{table}`").collect()
    }
    assert int(desc["Num Buckets"]) > 0
    assert "doc_id" in desc["Bucket Columns"]
    # corrupt-spec safety: a warehouse whose spec went missing must
    # fall back to a fresh write, not half-register
    spark.sql(f"DROP TABLE `{table}`")
    os.remove(os.path.join(table_dir, "_bucket_spec.json"))
    third = dedup_pipeline(pages, bucketed_warehouse=wh)
    assert third.metrics["warehouse"]["reused"] is False
    assert sorted(
        (r["doc_id"], r["cluster_id"]) for r in third.clusters.collect()
    ) == c1


def test_unregistrable_warehouse_still_guards_corpus_mismatch(
    spark, tiny_corpus, tmp_path
):
    """Review finding: the fresh-write fallback (catalog entry gone AND
    no/unreadable _bucket_spec.json) must NOT silently overwrite a
    stored warehouse with a DIFFERENT corpus — the surviving
    fingerprint file still gates the write."""
    import os

    import pytest

    from metacache_mpi_spark.plans.pipeline import dedup_pipeline
    from metacache_mpi_spark.sources.pages import load_pages

    wh = str(tmp_path / "wh_guard")
    pages_a = load_pages(spark, tiny_corpus).where("pmod(doc_id, 3) = 0")
    first = dedup_pipeline(pages_a, bucketed_warehouse=wh)
    first.clusters.count()
    table = first.metrics["warehouse"]["table"]
    table_dir = os.path.join(wh, table)

    # simulate a pre-spec warehouse seen from a new session
    spark.sql(f"DROP TABLE `{table}`")
    os.remove(os.path.join(table_dir, "_bucket_spec.json"))

    pages_b = load_pages(spark, tiny_corpus).where("pmod(doc_id, 3) = 1")
    with pytest.raises(ValueError, match="DIFFERENT corpus"):
        dedup_pipeline(pages_b, bucketed_warehouse=wh).clusters.count()
    # the stored state survived the refused write
    assert os.path.exists(os.path.join(wh, table + ".fingerprint.json"))
    assert any(f.endswith(".parquet") for f in os.listdir(table_dir))
