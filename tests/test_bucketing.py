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
