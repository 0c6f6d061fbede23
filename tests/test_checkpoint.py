"""Snapshot checkpointing: resume-after-crash equals single run
(FIXTURES.md `resume_midrun`; reference per-rank DB shard write/reload,
/root/reference/src/mode_build.cpp:1079-1096)."""

from __future__ import annotations

import json

from metacache_mpi_spark.plans.checkpoint import CheckpointManager
from metacache_mpi_spark.plans.pipeline import dedup_pipeline
from metacache_mpi_spark.sources.pages import load_pages


def _clusters(res):
    return {(r["doc_id"], r["cluster_id"]) for r in res.clusters.collect()}


def test_checkpoint_roundtrip(spark, tmp_path):
    ck = CheckpointManager(spark, str(tmp_path / "ck"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    out = ck.save(df, "stage1")
    assert ck.has("stage1")
    assert {tuple(r) for r in ck.load("stage1").collect()} == {(1, "a"), (2, "b")}
    assert out.count() == 2
    snap = ck.snapshots()[0]
    assert snap.rows == 2 and snap.name == "stage1"


def test_get_or_compute_skips_recompute(spark, tmp_path):
    ck = CheckpointManager(spark, str(tmp_path / "ck"))
    calls = []

    def compute():
        calls.append(1)
        return spark.range(3)

    ck.get_or_compute("s", compute)
    ck.get_or_compute("s", compute)
    assert len(calls) == 1


def test_resume_after_partial_crash(spark, tiny_corpus, tmp_path):
    """Full run, then strip later snapshots from the manifest (simulated
    crash between stage commits) and re-run: identical clusters."""
    pages = load_pages(spark, tiny_corpus)
    ckdir = str(tmp_path / "ck")
    full = dedup_pipeline(pages, checkpoints=CheckpointManager(spark, ckdir))
    want = _clusters(full)

    mpath = f"{ckdir}/manifest.json"
    m = json.load(open(mpath))
    m["snapshots"] = [s for s in m["snapshots"] if s["name"] == "signatures"]
    json.dump(m, open(mpath, "w"))

    resumed = dedup_pipeline(pages, checkpoints=CheckpointManager(spark, ckdir))
    assert _clusters(resumed) == want


def test_multi_snapshot_commit_is_atomic(spark, tmp_path):
    """stage_write leaves no manifest entry until commit(); commit()
    lands all names in one manifest update."""
    from metacache_mpi_spark.plans.checkpoint import CheckpointManager

    ck = CheckpointManager(spark, str(tmp_path / "ck"))
    a = spark.range(3).toDF("x")
    b = spark.range(5).toDF("y")
    ck.stage_write(a, "s_a")
    ck.stage_write(b, "s_b")
    assert not ck.has("s_a") and not ck.has("s_b")  # crash here -> no batch
    ck.commit(["s_a", "s_b"])
    assert ck.has("s_a") and ck.has("s_b")
    assert ck.load("s_b").count() == 5
