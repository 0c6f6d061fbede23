"""scripts/ann_job.py: the batched-retrieval deployment surface.

Gates: build writes a bucket-partitioned index + trained artifacts;
query's probe filter actually PRUNES the partitioned scan (plan
PartitionFilters); the ivfpq lane's results stay close to brute; the
brute lane is exact.
"""

from __future__ import annotations

import argparse
import importlib.util
import os

import pytest
from pyspark.sql import functions as F

_SPEC = importlib.util.spec_from_file_location(
    "ann_job",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "ann_job.py"),
)
ann_job = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(ann_job)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("annidx") / "idx")
    out = ann_job.cmd_build(
        spark,
        argparse.Namespace(
            embeddings=f"{SF_DIR}/embeddings.parquet", index=idx,
            n_centroids=8, pq_m=16, pq_codes=16,
        ),
    )
    assert out["vectors"] == 500 and out["buckets"] <= 8
    return idx


@pytest.fixture(scope="module")
def query_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("annq") / "q")
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").where(
        F.col("vec_id").isin([7, 107, 207])
    ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).write.parquet(p)
    return p


def test_build_layout(spark, built_index):
    # partitioned layout on disk + artifacts
    corpus = os.path.join(built_index, "corpus.parquet")
    assert any(d.startswith("bucket=") for d in os.listdir(corpus))
    for f in ("centroids.npy", "codebooks.npy", "meta.json"):
        assert os.path.exists(os.path.join(built_index, f))


def test_query_brute_exact(spark, built_index, query_parquet):
    from metacache_mpi_spark.operators.ann import cosine_batch_topk

    out = ann_job.cmd_query(
        spark,
        argparse.Namespace(
            index=built_index, queries=query_parquet, k=5,
            nprobe=8, mode="brute", out=None,
        ),
    )
    assert out["queries"] == 3 and out["result_rows"] == 15


def test_query_probe_filter_prunes_partitions(spark, built_index, query_parquet):
    """The union-of-probes filter must reach the scan as a PARTITION
    filter (bucket is the partition column) — the probed lists are a
    pruned read, not a full scan + filter."""
    table, cents, books, meta = ann_job._load_index(spark, built_index)
    queries = spark.read.parquet(query_parquet)
    pruned, n_buckets = ann_job._union_probe_filter(
        table, queries, cents, nprobe=2
    )
    assert 1 <= n_buckets <= 6  # 3 queries × 2 probes, deduped
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    # and the filter is not empty brackets
    pf = plan[plan.index("PartitionFilters"):].split("]", 1)[0]
    assert "bucket" in pf, pf
    assert pruned.count() < table.count()


def test_modify_extends_index_idempotently(spark, tmp_path):
    """build(A) + modify(A∪B) adds exactly B under A's artifacts; a
    second identical modify is a no-op (reference: modify extends an
    existing DB under ITS params, main_mode_build_modify)."""
    idx = str(tmp_path / "idx")
    sub = str(tmp_path / "subA")
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").where(
        F.col("vec_id") < 300
    ).write.parquet(sub)
    out = ann_job.cmd_build(
        spark,
        argparse.Namespace(
            embeddings=sub, index=idx,
            n_centroids=8, pq_m=16, pq_codes=16,
        ),
    )
    assert out["vectors"] == 300
    mod = ann_job.cmd_modify(
        spark,
        argparse.Namespace(
            embeddings=f"{SF_DIR}/embeddings.parquet", index=idx
        ),
    )
    assert mod["added"] == 200 and mod["skipped"] == 300
    assert mod["vectors"] == 500
    again = ann_job.cmd_modify(
        spark,
        argparse.Namespace(
            embeddings=f"{SF_DIR}/embeddings.parquet", index=idx
        ),
    )
    assert again["added"] == 0 and again["vectors"] == 500
    # the appended rows carry A's artifacts: re-encoding the B slice
    # with the stored centroids/codebooks reproduces them bit-for-bit
    import numpy as np

    from metacache_mpi_spark.operators.ann import ivf_assign, pq_encode

    cents = np.load(f"{idx}/centroids.npy")
    books = np.load(f"{idx}/codebooks.npy")
    b_slice = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").where(
        F.col("vec_id") >= 300
    ).select("vec_id", "embedding")
    expect = {
        (r["vec_id"], r["bucket"], tuple(r["codes"]))
        for r in pq_encode(ivf_assign(b_slice, cents), books).collect()
    }
    got = {
        (r["vec_id"], r["bucket"], tuple(r["codes"]))
        for r in spark.read.parquet(f"{idx}/corpus.parquet")
        .where(F.col("vec_id") >= 300)
        .collect()
    }
    assert got == expect


def test_modify_dim_mismatch_raises(spark, built_index, tmp_path):
    bad = str(tmp_path / "bad")
    spark.range(3).select(
        F.col("id").cast("int").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    ).write.parquet(bad)
    with pytest.raises(ValueError, match="dim"):
        ann_job.cmd_modify(
            spark, argparse.Namespace(embeddings=bad, index=built_index)
        )


def test_query_ivfpq_recall_vs_brute(spark, built_index, query_parquet, tmp_path):
    out_b = ann_job.cmd_query(
        spark,
        argparse.Namespace(
            index=built_index, queries=query_parquet, k=10,
            nprobe=8, mode="brute", out=str(tmp_path / "b"),
        ),
    )
    out_p = ann_job.cmd_query(
        spark,
        argparse.Namespace(
            index=built_index, queries=query_parquet, k=10,
            nprobe=8, mode="ivfpq", out=str(tmp_path / "p"),
        ),
    )
    assert out_b["result_rows"] == 30
    brute = spark.read.parquet(str(tmp_path / "b" / "topk.parquet"))
    got = spark.read.parquet(str(tmp_path / "p" / "topk.parquet"))
    b = {}
    for r in brute.collect():
        b.setdefault(r["query_id"], set()).add(r["vec_id"])
    g = {}
    for r in got.collect():
        g.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(b[q] & g.get(q, set())) / len(b[q]) for q in b
    ]
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_query_ivf_full_probe_equals_brute(spark, built_index, query_parquet, tmp_path):
    out_b = ann_job.cmd_query(
        spark,
        argparse.Namespace(
            index=built_index, queries=query_parquet, k=5,
            nprobe=8, mode="brute", out=str(tmp_path / "b2"),
        ),
    )
    out_i = ann_job.cmd_query(
        spark,
        argparse.Namespace(
            index=built_index, queries=query_parquet, k=5,
            nprobe=8, mode="ivf", out=str(tmp_path / "i2"),
        ),
    )
    key = lambda p: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["vec_id"], r["cos_micro"])
        for r in spark.read.parquet(str(p / "topk.parquet")).collect()
    )
    assert key(tmp_path / "i2") == key(tmp_path / "b2")
    assert out_i["result_rows"] == out_b["result_rows"]


def test_query_external_namespace_keeps_colliding_id(
    spark, built_index, query_parquet, tmp_path
):
    """An external query batch's ids are unrelated to vec_ids: by
    default no corpus row may be hidden by an id collision, and
    self_retrieval=True restores the dedup-style self-exclusion."""
    # query embedding IS corpus vector 7, but carries external id 7:
    # default mode must return vec_id 7 at rank 1 (cos ~ 1.0)
    out = ann_job.cmd_query(
        spark,
        argparse.Namespace(
            index=built_index, queries=query_parquet, k=3,
            nprobe=8, mode="brute", out=str(tmp_path / "ext"),
        ),
    )
    assert out["result_rows"] == 9
    rows = spark.read.parquet(str(tmp_path / "ext" / "topk.parquet"))
    top1 = {
        r["query_id"]: r["vec_id"] for r in rows.where("rank = 1").collect()
    }
    assert top1 == {7: 7, 107: 107, 207: 207}
    # self-retrieval mode: the colliding row is the query itself -> gone
    out_s = ann_job.cmd_query(
        spark,
        argparse.Namespace(
            index=built_index, queries=query_parquet, k=3,
            nprobe=8, mode="brute", out=str(tmp_path / "selfr"),
            self_retrieval=True,
        ),
    )
    assert out_s["result_rows"] == 9
    rows_s = spark.read.parquet(str(tmp_path / "selfr" / "topk.parquet"))
    assert rows_s.where("vec_id = query_id").count() == 0


def test_ivf_batch_assigned_requires_centroids(spark, built_index):
    from metacache_mpi_spark.operators.ann import ivf_batch_topk

    table = spark.read.parquet(f"{built_index}/corpus.parquet")
    q = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pytest.raises(ValueError, match="centroids"):
        ivf_batch_topk(
            table.select("vec_id", "embedding"), q, assigned=table
        )


def test_load_index_meta_mismatch_raises(spark, built_index, tmp_path):
    import json as _json
    import shutil

    bad = str(tmp_path / "badidx")
    shutil.copytree(built_index, bad)
    with open(f"{bad}/meta.json") as fh:
        meta = _json.load(fh)
    meta["n_centroids"] += 1
    with open(f"{bad}/meta.json", "w") as fh:
        _json.dump(meta, fh)
    with pytest.raises(ValueError, match="meta.json"):
        ann_job._load_index(spark, bad)
