"""Batched ANN search: N-query retrieval in one job.

The reference's query mode is inherently batched — every read in the
input files flows through one classification loop
(/root/reference/src/querying.h:1309-1387).  The batch lanes give the
ANN operators the same shape: a queries DataFrame joined against the
corpus (or its probed buckets / codes), per-query distributed top-k,
no per-query driver collect and no per-query Spark job.

Gates: batch brute == per-query single-query lane; IVF full-probe ==
brute bit-for-bit; IVF/PQ partial lanes by recall.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
QUERY_IDS = [7, 107, 207, 307, 407]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(spark, emb):
    return emb.where(F.col("vec_id").isin(QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _by_query(rows):
    out: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        out.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["cos_micro"])
        )
    return out


def test_cosine_batch_matches_single(spark, emb, queries):
    """The batch brute lane must reproduce the single-query lane for
    every query in the batch — same vectors, same fixed-point scores,
    same rank order."""
    from metacache_mpi_spark.operators.ann import cosine_batch_topk, cosine_topk

    batch = _by_query(cosine_batch_topk(emb, queries, k=10).collect())
    assert sorted(batch) == QUERY_IDS
    for qid in QUERY_IDS:
        single = [
            (r["vec_id"], r["cos_micro"])
            for r in cosine_topk(emb, query_vec_id=qid, k=10).collect()
        ]
        assert batch[qid] == single, f"query {qid} diverges"


def test_ivf_batch_full_probe_is_exact(spark, emb, queries):
    """nprobe = n_centroids probes every list: the IVF batch result must
    equal brute force bit-for-bit (this is what lets the contract entry
    use DuckDB's brute SQL as its oracle)."""
    from metacache_mpi_spark.operators.ann import (
        cosine_batch_topk,
        ivf_batch_topk,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(emb, n_centroids=8)
    brute = _by_query(cosine_batch_topk(emb, queries, k=10).collect())
    full = _by_query(
        ivf_batch_topk(
            emb, queries, k=10, nprobe=8, centroids=cents
        ).collect()
    )
    assert full == brute


def test_ivf_batch_partial_probe_recall(spark):
    """Partial probing (2 of 8 lists) is the production trade.  IVF's
    recall premise is that neighbors share coarse cells, so the gate
    runs on a CLUSTERED fixture (8 Gaussian clusters — the shape real
    embedding corpora have; the uniform driver fixture is IVF's
    worst case, where recall degenerates to ~nprobe/n_centroids and
    only full probing is exact — that regime is covered by
    test_ivf_batch_full_probe_is_exact)."""
    from metacache_mpi_spark.operators.ann import (
        cosine_batch_topk,
        ivf_batch_topk,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(11)
    centers = rng.randn(8, 64) * 4.0
    vecs = [
        (i, (centers[i % 8] + rng.randn(64)).tolist()) for i in range(400)
    ]
    cemb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qids = [0, 1, 2, 3, 4]
    cq = cemb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = train_ivf_centroids(cemb, n_centroids=8)
    brute = _by_query(cosine_batch_topk(cemb, cq, k=10).collect())
    part = _by_query(
        ivf_batch_topk(cemb, cq, k=10, nprobe=2, centroids=cents).collect()
    )
    recalls = []
    for qid in qids:
        want = {v for v, _ in brute[qid]}
        got = {v for v, _ in part.get(qid, [])}
        recalls.append(len(want & got) / len(want))
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.85, f"ivf batch mean recall@10 {mean} ({recalls})"


def test_pq_batch_recall(spark, emb, queries):
    """PQ batch (broadcast LUT tensor + ONE codes-only mapInPandas scan
    with map-side shortlists + exact re-rank): mean recall@10 vs brute."""
    from metacache_mpi_spark.operators.ann import (
        cosine_batch_topk,
        pq_batch_topk,
        pq_encode,
        train_pq_codebooks,
    )

    books = train_pq_codebooks(emb, m=16, k=16)
    enc = pq_encode(emb, books)
    brute = _by_query(cosine_batch_topk(emb, queries, k=10).collect())
    got = _by_query(
        pq_batch_topk(
            emb, queries, k=10, codebooks=books, encoded=enc
        ).collect()
    )
    recalls = []
    for qid in QUERY_IDS:
        want = {v for v, _ in brute[qid]}
        hits = {v for v, _ in got.get(qid, [])}
        recalls.append(len(want & hits) / len(want))
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.75, f"pq batch mean recall@10 {mean} ({recalls})"
    # the re-ranked scores are exact cosines — spot-check one query's
    # scores against brute on the intersection
    qid = QUERY_IDS[0]
    brute_scores = dict(brute[qid])
    for v, s in got[qid]:
        if v in brute_scores:
            assert s == brute_scores[v]


def test_lsh_bucketed_batch_matches_single(spark, emb, queries):
    from metacache_mpi_spark.operators.ann import (
        lsh_bucketed_batch_topk,
        lsh_bucketed_topk,
    )

    batch = lsh_bucketed_batch_topk(emb, queries, k=10).collect()
    got = {}
    for r in sorted(batch, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["bucket"], r["cos_micro"])
        )
    for qid in QUERY_IDS:
        single = [
            (r["vec_id"], r["bucket"], r["cos_micro"])
            for r in lsh_bucketed_topk(emb, query_vec_id=qid, k=10).collect()
        ]
        assert got.get(qid, []) == single, f"query {qid} diverges"


def test_batch_empty_queries(spark, emb):
    from metacache_mpi_spark.operators.ann import (
        cosine_batch_topk,
        pq_batch_topk,
    )

    empty = emb.where(F.lit(False)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert cosine_batch_topk(emb, empty, k=5).count() == 0
    assert pq_batch_topk(emb, empty, k=5).count() == 0


def test_per_query_topk_bounded_per_task(spark):
    """The per-query top-k must never funnel one query's full candidate
    set through a single window task.  The scale guarantee is the
    engine's WindowGroupLimit(Partial) BEFORE the exchange (each input
    partition forwards ≤ k rows per query) — assert it is in the plan,
    so an engine change that dropped it fails loudly, and check the
    answer on a skewed candidate set (one query across many
    partitions)."""
    from metacache_mpi_spark.operators.ann import _per_query_topk

    n = 10_000
    # two real (non-foldable) query keys: a literal partition key is
    # constant-folded and suppresses the InferWindowGroupLimit rule,
    # which the real lanes (query_id is a data column) always get
    scored = (
        spark.range(n)
        .repartition(8)
        .select(
            (F.col("id") % 2).alias("query_id"),
            F.col("id").alias("vec_id"),
            (F.col("id") % 997).alias("score"),
        )
    )
    out = _per_query_topk(
        scored, 5, "score", ["query_id", "vec_id", "score"]
    )
    rows = sorted(out.collect(), key=lambda r: (r["query_id"], r["rank"]))
    by_q = {0: [], 1: []}
    for r in rows:
        by_q[r["query_id"]].append((r["vec_id"], r["score"]))
    for q in (0, 1):
        want = sorted(
            ((i, i % 997) for i in range(n) if i % 2 == q),
            key=lambda t: (-t[1], t[0]),
        )[:5]
        assert by_q[q] == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan[:2000]


def test_ivf_pq_batch_recall(spark, emb, queries):
    """IVF-PQ composition: coarse buckets prune WHICH rows score, PQ
    codes decide HOW — one (vec_id, bucket, codes) scan with the
    bucket mask applied inside the Arrow batch.  Full probe isolates
    the PQ quantization error (recall ≈ pq_batch_topk); partial probe
    stacks IVF pruning on top and must stay useful."""
    from metacache_mpi_spark.operators.ann import (
        cosine_batch_topk,
        ivf_pq_batch_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    cents = train_ivf_centroids(emb, n_centroids=8)
    books = train_pq_codebooks(emb, m=16, k=16)
    brute = _by_query(cosine_batch_topk(emb, queries, k=10).collect())

    def mean_recall(nprobe):
        got = _by_query(
            ivf_pq_batch_topk(
                emb, queries, k=10, nprobe=nprobe,
                centroids=cents, codebooks=books, m=16, n_codes=16,
            ).collect()
        )
        rs = []
        for qid in QUERY_IDS:
            want = {v for v, _ in brute[qid]}
            hits = {v for v, _ in got.get(qid, [])}
            rs.append(len(want & hits) / len(want))
        return sum(rs) / len(rs)

    full = mean_recall(8)   # PQ error only
    part = mean_recall(3)   # + IVF pruning on the uniform fixture
    assert full >= 0.75, f"ivf-pq full-probe mean recall@10 {full}"
    # partial probing can only lose candidates relative to full probing
    assert part <= full + 1e-9
    assert part >= 0.3, f"ivf-pq partial-probe collapsed: {part}"


def test_ivf_pq_batch_respects_probes(spark, emb, queries):
    """Every result of a partial-probe run must come from a probed
    bucket — the mask is a correctness contract, not a heuristic."""
    import numpy as np

    from metacache_mpi_spark.operators.ann import (
        ivf_assign,
        ivf_pq_batch_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    cents = train_ivf_centroids(emb, n_centroids=8)
    books = train_pq_codebooks(emb, m=16, k=16)
    got = ivf_pq_batch_topk(
        emb, queries, k=10, nprobe=2, centroids=cents, codebooks=books,
        m=16, n_codes=16,
    ).collect()
    assigned = {
        r["vec_id"]: r["bucket"]
        for r in ivf_assign(emb, cents).select("vec_id", "bucket").collect()
    }
    qvec = {
        r["query_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in queries.collect()
    }
    c = np.asarray(cents)
    for r in got:
        d = ((c - qvec[r["query_id"]][None, :]) ** 2).sum(axis=1)
        probed = set(np.argsort(d)[:2].tolist())
        assert assigned[r["vec_id"]] in probed


def test_cross_pairs_banded_subset_and_margin_recall(spark):
    """Semantic decontamination: the banded cross lane verifies with
    exact cosine (precision 1.0 → subset of brute), and at a realistic
    near-dup margin (τ=0.85, auto-sized bands) recall vs brute is
    ≥0.99 on planted eval contaminants."""
    from metacache_mpi_spark.operators.ann import (
        cosine_cross_pairs,
        sign_banded_cross_pairs,
    )

    rng = np.random.RandomState(17)
    base = rng.randn(30, 64)
    corpus_rows, eval_rows = [], []
    vid = 0
    for i in range(30):  # each eval vector has one planted contaminant
        eval_rows.append((vid, base[i].tolist())); vid += 1
        corpus_rows.append(
            (vid, (base[i] + 0.2 * rng.randn(64)).tolist())
        ); vid += 1
    for _ in range(300):  # background corpus
        corpus_rows.append((vid, rng.randn(64).tolist())); vid += 1
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<double>"
    )
    evalset = spark.createDataFrame(
        eval_rows, "vec_id long, embedding array<double>"
    )
    tau = 0.85
    brute = {
        (r["a"], r["b"])
        for r in cosine_cross_pairs(corpus, evalset, tau).collect()
    }
    banded = {
        (r["a"], r["b"])
        for r in sign_banded_cross_pairs(corpus, evalset, tau).collect()
    }
    assert len(brute) >= 25
    assert banded <= brute  # exact verify => precision 1.0
    assert len(banded & brute) / len(brute) >= 0.99


def test_cross_pairs_corpus_bucket_cap_drops_degenerate(spark):
    """The corpus-side bucket cap is the P13 guard: with max_bucket=1
    on a corpus where many vectors share every sign pattern, candidates
    must collapse (dropped buckets), never a corpus×eval blow-up."""
    from metacache_mpi_spark.operators.ann import sign_banded_cross_pairs

    ones = [1.0] * 64
    corpus = spark.createDataFrame(
        [(i, ones) for i in range(50)], "vec_id long, embedding array<double>"
    )
    evalset = spark.createDataFrame(
        [(1000, ones)], "vec_id long, embedding array<double>"
    )
    got = sign_banded_cross_pairs(
        corpus, evalset, tau=0.5, bands=16, rows_per_band=2, max_bucket=1
    )
    assert got.count() == 0
