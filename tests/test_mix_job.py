"""Training-corpus assembly job (scripts/mix_job.py): the
sample → budget → upsample → split → pack composition over a generated
crawl.  Gates: every document lands in exactly one split, mixture
accounting is written per split, the chunk map is globally numbered,
and re-running the job reproduces the identical assembly (the
manifest-determinism property the mixing operators promise).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os

import pytest
from pyspark.sql import functions as F

_SPEC = importlib.util.spec_from_file_location(
    "mix_job",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "mix_job.py"),
)
mix_job = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(mix_job)


def _args(**kw):
    base = dict(
        stratum="host",
        fractions=None,
        repeat_factors=None,
        budget=None,
        splits="train=0.8,val=0.1,test=0.1",
        seq_len=256,
    )
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from metacache_mpi_spark.sources.pages import write_corpus

    p = str(tmp_path_factory.mktemp("mixc") / "corpus")
    write_corpus(p, n_pages=300, seed=7)
    return p


def test_mix_job_full_composition(spark, corpus, tmp_path):
    out = str(tmp_path / "mix1")
    counts = mix_job.run(
        spark,
        _args(
            input=corpus,
            output=out,
            fractions=json.dumps(
                {f"site{i}.example": 0.8 for i in range(40)}
            ),
            repeat_factors=json.dumps({"site0.example": 2.5}),
            budget=50_000,
        ),
    )
    assert 0 < counts["after_sample"] < counts["raw"]
    assert counts["after_budget"] <= counts["after_sample"]
    assert counts["assembled"] >= counts["after_budget"]  # upsampling
    assert set(counts["splits"]) <= {"train", "val", "test"}
    assert sum(s["docs"] for s in counts["splits"].values()) == (
        counts["assembled"]
    )
    # outputs on disk: splits + per-split mixture + chunk map
    train = spark.read.parquet(f"{out}/train.parquet")
    rep = spark.read.parquet(f"{out}/mixture_train.parquet")
    chunks = spark.read.parquet(f"{out}/train_chunks.parquet")
    assert train.count() == counts["splits"]["train"]["docs"]
    assert {r["source"] for r in rep.collect()} == {
        r["source"] for r in train.select("source").distinct().collect()
    }
    assert counts["train_chunks"] == (
        chunks.agg(F.max("chunk_last")).first()[0] + 1
    )
    # upsampled copies appear as distinct (doc, rep_idx) chunk rows
    assert chunks.groupBy("pack_key").count().where("count > 1").count() == 0


def test_mix_job_upsample_is_train_only(spark, corpus, tmp_path):
    """Repeat factors are a TRAINING-mixture knob: rep_idx>0 copies may
    appear only in the train split — val/test carry exactly one copy
    per document (an upsampled doc in an eval split would inflate its
    doc/token counts and leak repeated text into evaluation)."""
    out = str(tmp_path / "mix_up")
    # heavy factor on every stratum so copies WOULD land in val/test if
    # upsampling ran before the split
    factors = json.dumps({f"site{i}.example": 3.0 for i in range(40)})
    counts = mix_job.run(
        spark, _args(input=corpus, output=out, repeat_factors=factors)
    )
    train = spark.read.parquet(f"{out}/train.parquet")
    assert train.where(F.col("rep_idx") > 0).count() > 0
    for s in ("val", "test"):
        part = spark.read.parquet(f"{out}/{s}.parquet")
        n = part.count()
        assert n > 0, f"fixture too small: empty {s} split"
        assert part.where(F.col("rep_idx") != 0).count() == 0
        assert part.select("doc_id").distinct().count() == n
    # split assignment itself is unaffected by the factors: the salted
    # uniform is keyed on doc_id, which copies share
    base_out = str(tmp_path / "mix_up_base")
    mix_job.run(spark, _args(input=corpus, output=base_out))
    for s in ("val", "test"):
        a = sorted(
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/{s}.parquet")
            .select("doc_id").collect()
        )
        b = sorted(
            r["doc_id"]
            for r in spark.read.parquet(f"{base_out}/{s}.parquet")
            .select("doc_id").collect()
        )
        assert a == b
    assert counts["splits"]["train"]["docs"] == train.count()


def test_mix_job_split_is_total_partition(spark, corpus, tmp_path):
    out = str(tmp_path / "mix2")
    counts = mix_job.run(spark, _args(input=corpus, output=out))
    parts = [
        spark.read.parquet(f"{out}/{s}.parquet").select("doc_id")
        for s in ("train", "val", "test")
    ]
    n_union = parts[0].union(parts[1]).union(parts[2]).count()
    assert n_union == counts["assembled"] == counts["raw"]


def test_mix_job_rerun_is_bit_identical(spark, corpus, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    fr = json.dumps({f"site{i}.example": 0.5 for i in range(40)})
    ca = mix_job.run(spark, _args(input=corpus, output=a, fractions=fr))
    cb = mix_job.run(spark, _args(input=corpus, output=b, fractions=fr))
    assert ca == cb
    for f in ("train.parquet", "train_chunks.parquet"):
        ra = sorted(map(tuple, spark.read.parquet(f"{a}/{f}").collect()))
        rb = sorted(map(tuple, spark.read.parquet(f"{b}/{f}").collect()))
        assert ra == rb


def test_mix_job_bad_stratum_raises(spark, corpus, tmp_path):
    with pytest.raises(SystemExit, match="stratum"):
        mix_job.run(
            spark,
            _args(input=corpus, output=str(tmp_path / "x"), stratum="nope"),
        )
