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


def test_lineage_report_metrics(spark, tmp_path):
    """lineage_report() exposes per-snapshot partition metrics from the
    manifest alone (no Spark jobs): seq order, totals, and skew_milli
    (1000 = balanced; 3200 = hottest partition carries 3.2x fair share).
    The skewed entry is hand-written into the manifest so the math is
    asserted exactly, independent of Spark's file-packing heuristics."""
    ck = CheckpointManager(spark, str(tmp_path / "ck"))
    ck.save(spark.range(100).repartition(4, "id"), "real")

    m = json.load(open(ck._manifest_path))
    m["snapshots"].append(
        {
            "name": "synthetic_skew",
            "path": "unused",
            "rows": 100,
            "schema": "struct<id:bigint>",
            "seq": 1,
            "created_unix": 0.0,
            "partition_rows": [80, 10, 10, 0],
        }
    )
    json.dump(m, open(ck._manifest_path, "w"))

    rep = ck.lineage_report()
    assert [r["name"] for r in rep] == ["real", "synthetic_skew"]

    real, skw = rep
    # real snapshot: totals agree between rows and its partition_rows
    assert real["rows"] == 100
    assert real["max_partition_rows"] >= 100 // max(real["n_partitions"], 1)
    assert real["skew_milli"] >= 1000  # max >= mean always

    assert skw["n_partitions"] == 4
    assert skw["max_partition_rows"] == 80
    assert skw["empty_partitions"] == 1
    assert skw["skew_milli"] == 80 * 1000 * 4 // 100  # 3200


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


def test_remove_reclaims_and_seq_stays_monotonic(spark, tmp_path):
    """remove() drops manifest entries + dirs; a later commit's seq is
    HIGHER than every survivor (unique monotonic id, not a list
    index); unknown names raise before anything is touched."""
    import os

    import pytest

    ck = CheckpointManager(spark, str(tmp_path / "ck"))
    for name in ("s0", "s1", "s2"):
        ck.save(spark.range(3), name)
    p0 = next(s.path for s in ck.snapshots() if s.name == "s0")

    with pytest.raises(KeyError, match="nope"):
        ck.remove(["s0", "nope"])
    assert ck.has("s0")  # nothing was touched

    ck.remove(["s0", "s1"])
    assert not ck.has("s0") and not os.path.exists(p0)
    assert ck.has("s2")

    ck.save(spark.range(2), "s3")
    seqs = {s.name: s.seq for s in ck.snapshots()}
    assert seqs["s3"] > seqs["s2"]
    assert len(set(seqs.values())) == len(seqs)


def test_sweep_orphans(spark, tmp_path):
    """Dirs under the root unknown to manifest + staging are reclaimed;
    live and staged snapshot dirs survive."""
    import os

    ck = CheckpointManager(spark, str(tmp_path / "ck"))
    ck.save(spark.range(3), "live")
    ck.stage_write(spark.range(2), "staged")
    orphan = os.path.join(ck.root, "crashed_leftover")
    os.makedirs(orphan)

    removed = ck.sweep_orphans()
    assert removed == ["crashed_leftover"]
    assert not os.path.exists(orphan)
    assert ck.load("live").count() == 3
    ck.commit(["staged"])
    assert ck.load("staged").count() == 2
