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

import pytest

from metacache_mpi_spark.operators.mixing import (
    HEX_SPAN,
    fraction_to_hex_threshold,
    global_chunk_ids,
    hash_split,
    mixture_report,
    sequence_pack,
    stratified_sample,
    token_budget_pack,
    upsample_repeat,
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


def test_global_chunk_ids_disjoint_consecutive(spark):
    """Global renumbering: each stratum owns a contiguous chunk-id
    range, ranges are disjoint and stacked in lexicographic stratum
    order, covering [0, total_chunks)."""
    packed = sequence_pack(_docs(spark), 64)
    glob = global_chunk_ids(packed)
    spans = {
        r["source"]: (r["lo"], r["hi"])
        for r in glob.groupBy("source")
        .agg(F.min("chunk_first").alias("lo"), F.max("chunk_last").alias("hi"))
        .collect()
    }
    expect_lo = 0
    for s in sorted(spans):
        lo, hi = spans[s]
        assert lo == expect_lo, (s, lo, expect_lo)
        expect_lo = hi + 1
    # per-doc geometry is untouched: offsets within a stratum unchanged
    a = {r["doc_id"]: r["chunk_last"] - r["chunk_first"]
         for r in packed.collect()}
    b = {r["doc_id"]: r["chunk_last"] - r["chunk_first"]
         for r in glob.collect()}
    assert a == b


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


def test_hash_split_partitions_exactly_once(spark):
    docs = _docs(spark)
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.count() == docs.count()  # total partition: no doc lost
    rates = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = docs.count()
    assert set(rates) == {"train", "val", "test"}
    assert abs(rates["train"] / n - 0.8) < 0.06


def test_hash_split_stable_under_corpus_growth(spark):
    """New documents never move old documents between splits."""
    docs = _docs(spark)
    half = docs.where("doc_id < 250")
    w = {"train": 3, "test": 1}  # non-normalized weights accepted
    full = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, w).select("doc_id", "split").collect()
    }
    part = {
        r["doc_id"]: r["split"]
        for r in hash_split(half, w).select("doc_id", "split").collect()
    }
    assert part == {d: s for d, s in full.items() if d < 250}


def test_hash_split_no_exchange_and_validation(spark):
    out = hash_split(_docs(spark), {"a": 0.5, "b": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        hash_split(_docs(spark), {})
    with pytest.raises(ValueError):
        hash_split(_docs(spark), {"a": 0.0})


def test_upsample_repeat_integer_factors(spark):
    rows = [(i, "a" if i < 5 else "b", "t") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = upsample_repeat(docs, {"a": 3.0, "b": 0.0})
    got = out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    assert {r["doc_id"] for r in got} == set(range(5))
    assert all(r["n"] == 3 for r in got)
    reps = {
        r["rep_idx"] for r in out.where("doc_id = 2").select("rep_idx").collect()
    }
    assert reps == {0, 1, 2}


def test_upsample_repeat_fractional_rate_and_determinism(spark):
    base = spark.range(20000).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    out = upsample_repeat(base, {"s": 1.5}, key="doc_id")
    n = out.count()
    assert abs(n / 20000 - 1.5) < 0.03  # expected mass scales by f
    n2 = upsample_repeat(
        base.repartition(7), {"s": 1.5}, key="doc_id"
    ).count()
    assert n == n2  # same docs extra-copied under any partitioning


def test_upsample_repeat_absent_stratum_keeps_one_copy(spark):
    docs = _docs(spark)
    out = upsample_repeat(docs, {"src0": 2.0})
    n_src0 = docs.where("source='src0'").count()
    assert out.where("source='src0'").count() == 2 * n_src0
    others = docs.where("source<>'src0'").count()
    assert out.where("source<>'src0'").count() == others


def test_sequence_pack_chunks(spark):
    rows = [(0, "a", "w " * 9 + "w"), (1, "a", "w " * 5 + "w"),
            (2, "a", "w"), (3, "b", "w " * 2 + "w")]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # stream a: tokens 10,6,1 -> offsets 0,10,16; L=8 chunks: doc0 [0,1],
    # doc1 [1,1], doc2 [2,2]; stream b restarts at 0
    got = {
        r["doc_id"]: (
            r["start_offset"], r["chunk_first"], r["chunk_last"]
        )
        for r in sequence_pack(docs, 8).collect()
    }
    assert got == {0: (0, 0, 1), 1: (10, 1, 1), 2: (16, 2, 2), 3: (0, 0, 0)}
    with pytest.raises(ValueError):
        sequence_pack(docs, 0)


def test_sequence_pack_stream_is_gapless(spark):
    out = sequence_pack(_docs(spark), 128).where("source='src1'").collect()
    by_key = sorted(out, key=lambda r: r["doc_id"])
    off = 0
    for r in by_key:
        assert r["start_offset"] == off
        off += r["n_tokens"]


def test_mixture_report_shares_sum_bound(spark):
    rep = mixture_report(_docs(spark)).collect()
    total = sum(r["share_ppm"] for r in rep)
    # floor per stratum: sum in (1e6 - n_strata, 1e6]
    assert 1_000_000 - len(rep) < total <= 1_000_000
