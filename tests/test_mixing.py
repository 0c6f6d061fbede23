"""Corpus mixing operators: deterministic stratified sampling, token
budget packing, mixture accounting (operators/mixing.py).

Gates: the sample is a pure function of (salt, key) — identical across
partitionings and nested under larger fractions; observed rates track
the configured fractions; packing is a per-stratum prefix that never
exceeds the budget and drops straddlers whole; report shares are exact
integer ppm.  The sampler plan must contain NO exchange.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metacache_mpi_spark.operators.mixing import (
    HEX_SPAN,
    fraction_to_hex_threshold,
    mixture_report,
    stratified_sample,
    token_budget_pack,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_threshold_edges():
    assert fraction_to_hex_threshold(0.0) == "00000000"
    assert fraction_to_hex_threshold(1.0) == "g"  # keeps 'ffffffff'
    assert fraction_to_hex_threshold(0.5) == format(HEX_SPAN // 2, "08x")
    assert fraction_to_hex_threshold(-3.0) == "00000000"
    assert fraction_to_hex_threshold(7.0) == "g"


def test_sample_deterministic_across_partitionings(spark):
    docs = _docs(spark)
    frac = {f"src{i}": 0.05 * ((i % 10) + 1) for i in range(20)}
    a = {
        r["doc_id"]
        for r in stratified_sample(docs, frac).select("doc_id").collect()
    }
    b = {
        r["doc_id"]
        for r in stratified_sample(docs.repartition(17, "lang"), frac)
        .select("doc_id")
        .collect()
    }
    assert a == b and 0 < len(a) < 500


def test_sample_no_exchange_in_plan(spark):
    out = stratified_sample(_docs(spark), {"src0": 0.5, "src1": 1.0})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sample_rate_tracks_fraction(spark):
    # wide uniform key range: rate must land near the fraction
    base = spark.range(20000).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    got = stratified_sample(base, {"s": 0.3}).count()
    assert abs(got / 20000 - 0.3) < 0.02


def test_sample_nested_under_larger_fraction(spark):
    """Threshold sampling is monotone: the 20% sample is a strict
    subset of the 60% sample under the same salt."""
    docs = _docs(spark)
    small = {
        r["doc_id"]
        for r in stratified_sample(docs, {"src3": 0.2}, salt="m")
        .select("doc_id")
        .collect()
    }
    big = {
        r["doc_id"]
        for r in stratified_sample(docs, {"src3": 0.6}, salt="m")
        .select("doc_id")
        .collect()
    }
    assert small <= big and len(small) < len(big)


def test_sample_absent_stratum_dropped(spark):
    out = stratified_sample(_docs(spark), {"src0": 1.0})
    assert out.select("source").distinct().collect() == [
        ("src0",)
    ] and out.count() > 0


def test_budget_pack_prefix_and_bound(spark):
    rows = [(i, "a", "w " * (9 + i) + "w") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # token counts are 10..19; budget 35 keeps docs 0,1,2 (10+11+12=33),
    # doc 3 would reach 46 -> dropped whole, and so is everything after
    out = token_budget_pack(docs, 35, stratum="source").collect()
    assert [(r["doc_id"], r["n_tokens"], r["cum_tokens"]) for r in out] == [
        (0, 10, 10),
        (1, 11, 21),
        (2, 12, 33),
    ]


def test_budget_pack_per_stratum_independent(spark):
    docs = _docs(spark)
    out = token_budget_pack(docs, 800)
    agg = out.groupBy("source").agg(
        F.max("cum_tokens").alias("mx"), F.count("*").alias("n")
    )
    for r in agg.collect():
        assert r["mx"] <= 800 and r["n"] >= 1
    # prefix property: kept keys per stratum are exactly the smallest
    src0 = sorted(
        r["doc_id"] for r in out.where("source='src0'").collect()
    )
    all0 = sorted(
        r["doc_id"] for r in docs.where("source='src0'").collect()
    )
    assert src0 == all0[: len(src0)]


def test_mixture_report_exact_ppm(spark):
    rows = [
        (0, "a", "w w w"),      # 3 tokens
        (1, "a", "w"),          # 1
        (2, "b", "w w w w"),    # 4
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["share_ppm"])
        for r in mixture_report(docs).collect()
    }
    assert got == {"a": (2, 4, 500000), "b": (1, 4, 500000)}


def test_mixture_report_shares_sum_bound(spark):
    rep = mixture_report(_docs(spark)).collect()
    total = sum(r["share_ppm"] for r in rep)
    # floor per stratum: sum in (1e6 - n_strata, 1e6]
    assert 1_000_000 - len(rep) < total <= 1_000_000
