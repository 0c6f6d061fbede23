"""Incremental micro-batch dedup: processing the corpus in batches must
match the one-shot pipeline clusters (the reference's resident-index
REPL loop analog, /root/reference/src/mode_query.cpp:269-315)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metacache_mpi_spark.plans.checkpoint import CheckpointManager
from metacache_mpi_spark.plans.pipeline import dedup_pipeline
from metacache_mpi_spark.sources.pages import load_pages
from metacache_mpi_spark.streaming import IncrementalDedup

from .oracle import components


def test_two_batches_equal_one_shot(spark, tiny_corpus, tmp_path):
    pages = load_pages(spark, tiny_corpus)
    # split deterministically by id parity
    b1 = pages.where(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    b2 = pages.where(F.pmod(F.col("doc_id"), F.lit(2)) == 1)

    inc = IncrementalDedup(spark, CheckpointManager(spark, str(tmp_path / "ck")))
    inc.process_batch(b1)
    final = inc.process_batch(b2)
    got = {(r["doc_id"], r["cluster_id"]) for r in final.collect()}

    # oracle: one-shot pipeline WITHOUT the substring lane (incremental
    # covers the jaccard lane; fp lane folds in via the same band table)
    one = dedup_pipeline(pages)
    jacc_edges = [
        (r["a"], r["b"])
        for r in one.pairs.collect()
        if r["dup_kind"] == "jaccard"
    ]
    comp = components(jacc_edges)
    all_ids = [r["doc_id"] for r in pages.select("doc_id").collect()]
    want = {(i, comp.get(i, i)) for i in all_ids}
    assert got == want


def test_duplicate_url_across_batches_ignored(spark, tiny_corpus, tmp_path):
    pages = load_pages(spark, tiny_corpus).limit(50)
    inc = IncrementalDedup(spark, CheckpointManager(spark, str(tmp_path / "ck2")))
    c1 = inc.process_batch(pages)
    c2 = inc.process_batch(pages)  # same urls again -> all skipped
    assert c1.count() == c2.count() == 50


def test_state_selection_numeric_and_complete(spark, tmp_path):
    """Regression: batch selection must be numeric (b10 > b9 though
    lexicographically smaller), skip incomplete batches, and the
    resident state must be the union of all committed DELTAS."""
    from metacache_mpi_spark.plans.checkpoint import CheckpointManager
    from metacache_mpi_spark.streaming.incremental import IncrementalDedup

    ck = CheckpointManager(spark, str(tmp_path / "ck"))
    kinds = IncrementalDedup._KINDS
    ck.stage_write(
        spark.createDataFrame([(2,)], "fmt long"),
        IncrementalDedup._FMT_MARKER,
    )
    ck.commit([IncrementalDedup._FMT_MARKER])
    # eleven committed delta batches 0..10 (so the numeric-vs-lexi
    # distinction between b9 and b10 is exercised)
    for b in range(11):
        marker = spark.createDataFrame([(b,)], "marker long")
        for kind in kinds:
            ck.stage_write(marker, f"{kind}_b{b}")
        ck.commit([f"{k}_b{b}" for k in kinds])
    # batch 11 is INCOMPLETE (docs only) — ignored, reprocessed
    ck.save(spark.createDataFrame([(11,)], "marker long"), "docs_b11")

    inc = IncrementalDedup(spark, ck)
    assert inc.batch_no == 11  # resumes after b10, reprocessing b11
    markers = sorted(
        r["marker"] for r in inc._state("docs").collect()
    )
    assert markers == list(range(11))  # all deltas, not b11 (partial)


def test_snapshots_are_deltas(spark, tmp_path):
    """Write cost per batch must be O(batch): the batch-N docs/edges
    snapshots hold only batch-N rows, never the accumulated corpus."""
    from metacache_mpi_spark.plans.checkpoint import CheckpointManager
    from metacache_mpi_spark.sources.pages import generate_pages
    from metacache_mpi_spark.streaming.incremental import IncrementalDedup

    pages, _ = generate_pages(n_pages=120, seed=5)
    ck = CheckpointManager(spark, str(tmp_path / "ck"))
    inc = IncrementalDedup(spark, ck)
    sizes = []
    for lo, hi in ((0, 40), (40, 80), (80, 120)):
        batch = spark.createDataFrame(pages.iloc[lo:hi][["url", "text"]])
        inc.process_batch(batch)
        sizes.append(ck.load(f"docs_b{len(sizes)}").count())
    assert sizes == [40, 40, 40]          # deltas, not 40/80/120
    # resident state is the union
    assert inc._state("docs").count() == 120


def test_compaction_preserves_state_and_results(spark, tmp_path):
    """compact() folds deltas into one base per kind; later batches
    read base+new deltas and produce identical clusters to the
    uncompacted run."""
    from metacache_mpi_spark.plans.checkpoint import CheckpointManager
    from metacache_mpi_spark.sources.pages import generate_pages
    from metacache_mpi_spark.streaming.incremental import IncrementalDedup

    pages, _ = generate_pages(n_pages=150, seed=8)

    def run(root, compact_after_two):
        ck = CheckpointManager(spark, str(tmp_path / root))
        inc = IncrementalDedup(spark, ck)
        out = None
        for i, (lo, hi) in enumerate(((0, 50), (50, 100), (100, 150))):
            batch = spark.createDataFrame(
                pages.iloc[lo:hi][["url", "text"]]
            )
            out = inc.process_batch(batch)
            if compact_after_two and i == 1:
                inc.compact()
                assert ck.has("docs_c1")
                assert inc._state("docs").count() == 100
        return sorted(
            (r["doc_id"], r["cluster_id"]) for r in out.collect()
        )

    assert run("plain", False) == run("compacted", True)


def test_legacy_cumulative_state_is_refused(spark, tmp_path):
    """A checkpoint dir written by the old cumulative-snapshot code
    (no delta format marker) must be refused loudly — unioning
    cumulative snapshots as deltas would double-count silently."""
    import pytest

    from metacache_mpi_spark.plans.checkpoint import CheckpointManager
    from metacache_mpi_spark.streaming.incremental import IncrementalDedup

    ck = CheckpointManager(spark, str(tmp_path / "legacy"))
    kinds = IncrementalDedup._KINDS
    marker = spark.createDataFrame([(0,)], "marker long")
    for kind in kinds:
        ck.stage_write(marker, f"{kind}_b0")
    ck.commit([f"{k}_b0" for k in kinds])
    with pytest.raises(ValueError, match="legacy cumulative"):
        IncrementalDedup(spark, ck)


def test_recluster_touches_only_affected_subgraph(spark, tmp_path):
    """CC input per batch must be ∝ the affected subgraph (batch edges
    + members of touched components), never the accumulated edge
    list."""
    from metacache_mpi_spark.plans.checkpoint import CheckpointManager
    from metacache_mpi_spark.sources.pages import generate_pages
    from metacache_mpi_spark.streaming.incremental import IncrementalDedup

    pages, _ = generate_pages(n_pages=150, seed=13)
    ck = CheckpointManager(spark, str(tmp_path / "ck"))
    inc = IncrementalDedup(spark, ck)
    inc.process_batch(spark.createDataFrame(pages[["url", "text"]]))
    edges_b0 = ck.load("edges_b0").count()
    assert edges_b0 >= 5  # corpus has real duplicate structure

    # batch 1: 3 unique-ish pages + ONE copy of a batch-0 page
    import pandas as pd

    b1 = pd.DataFrame(
        {
            "url": [f"http://late.example/{i}" for i in range(4)],
            "text": [
                pages.iloc[0]["text"] + " fresh tail alpha",
                pages.iloc[1]["text"] + " fresh tail beta gamma",
                "tiny new page about nothing in particular at all",
                pages.iloc[7]["text"],  # exact text copy, new url
            ],
        }
    )
    inc.process_batch(spark.createDataFrame(b1))
    edges_b1 = ck.load("edges_b1").count()
    assert edges_b1 >= 1  # the copy produced at least one new edge
    # CC saw new edges + star edges of the touched components only —
    # a full re-cluster would have seen all edges_b0 + edges_b1
    assert inc.last_cc_edges < edges_b0 + edges_b1
    assert inc.last_cc_edges <= edges_b1 + 3 * max(edges_b1, 3)


def test_auto_compaction_bounds_delta_depth(spark, tmp_path):
    """With compact_every=2, a 4-batch stream folds its deltas so
    _state never unions more than compact_every chains."""
    from metacache_mpi_spark.plans.checkpoint import CheckpointManager
    from metacache_mpi_spark.sources.pages import generate_pages
    from metacache_mpi_spark.streaming.incremental import IncrementalDedup

    pages, _ = generate_pages(n_pages=120, seed=21)
    ck = CheckpointManager(spark, str(tmp_path / "ck"))
    inc = IncrementalDedup(spark, ck, compact_every=2)
    for lo, hi in ((0, 30), (30, 60), (60, 90), (90, 120)):
        inc.process_batch(
            spark.createDataFrame(pages.iloc[lo:hi][["url", "text"]])
        )
    # after batches 0..3 with cadence 2: compacted at b1 and b3
    assert ck.has("docs_c1") and ck.has("docs_c3")
    assert inc._compact_base() == 3
    assert inc._state("docs").count() == 120


def test_query_batch_read_only_probe(spark, tmp_path):
    """query_batch (the reference's build-once/query-many mode):
    url-identical pages match by url, near-dup texts under new urls
    match by content to the right indexed doc, novel texts match
    nothing — and the state is not mutated."""
    words = [f"word{i:03d}" for i in range(60)]
    base = " ".join(words)
    near = " ".join(words[:55] + ["changedA", "changedB"] + words[57:])
    other = " ".join(f"zz{i:03d}" for i in range(60))
    corpus = spark.createDataFrame(
        [("u/1", base), ("u/2", other)], "url string, text string"
    )
    inc = IncrementalDedup(spark, CheckpointManager(spark, str(tmp_path / "s")))
    inc.process_batch(corpus)
    n_snaps = len(inc.ck.snapshots())
    batch_no = inc.batch_no

    novel = " ".join(f"qq{i:03d}" for i in range(60))
    queries = spark.createDataFrame(
        [("u/1", "anything"), ("q/near", near), ("q/new", novel)],
        "url string, text string",
    )
    got = {r["url"]: r for r in inc.query_batch(queries).collect()}
    id_u1 = spark.range(1).select(F.xxhash64(F.lit("u/1"))).first()[0]

    assert got["u/1"]["match_kind"] == "url"
    assert got["u/1"]["matched_doc_id"] == id_u1
    assert got["q/near"]["match_kind"] == "content"
    assert got["q/near"]["matched_doc_id"] == id_u1
    assert got["q/near"]["jaccard_milli"] >= 600
    assert got["q/new"]["match_kind"] == "none"
    assert got["q/new"]["matched_doc_id"] is None

    # read-only: no snapshot written, no batch consumed
    assert len(inc.ck.snapshots()) == n_snaps
    assert inc.batch_no == batch_no


def test_query_batch_empty_index(spark, tmp_path):
    inc = IncrementalDedup(
        spark, CheckpointManager(spark, str(tmp_path / "s0"))
    )
    q = spark.createDataFrame(
        [("q/a", "some text for the probe to classify")],
        "url string, text string",
    )
    rows = inc.query_batch(q).collect()
    assert [r["match_kind"] for r in rows] == ["none"]


def test_gc_reclaims_superseded_state(spark, tmp_path):
    """gc() removes pre-base deltas and old compacted bases, frees the
    dirs, and leaves resume + results identical to a no-gc twin."""
    import os

    from metacache_mpi_spark.sources.pages import generate_pages

    pages, _ = generate_pages(n_pages=160, seed=17)

    def batches():
        for lo in range(0, 160, 40):
            yield spark.createDataFrame(
                pages.iloc[lo : lo + 40][["url", "text"]]
            )

    # twin WITHOUT gc (ground truth)
    ref = IncrementalDedup(
        spark, CheckpointManager(spark, str(tmp_path / "ref")), compact_every=2
    )
    for b in batches():
        ref_clusters = ref.process_batch(b)
    want = {(r["doc_id"], r["cluster_id"]) for r in ref_clusters.collect()}

    root = str(tmp_path / "gc")
    inc = IncrementalDedup(
        spark, CheckpointManager(spark, root), compact_every=2
    )
    bs = list(batches())
    for b in bs[:3]:
        inc.process_batch(b)
    # compact ran after batch 1 (base c1); batches 0..1 deltas + b0/b1
    # clusters are superseded
    freed = inc.gc()
    assert freed, "expected superseded snapshots"
    base = inc._compact_base()
    assert all(
        int(n.split("_b")[-1]) < base if "_b" in n else True for n in freed
    )
    # dirs actually reclaimed, manifest consistent
    for n in freed:
        assert not inc.ck.has(n)
        assert not os.path.exists(os.path.join(root, n))

    # resume after gc: fresh engine sees the same batch number and the
    # same accumulated docs, and the final batch matches the twin
    inc2 = IncrementalDedup(
        spark, CheckpointManager(spark, root), compact_every=2
    )
    assert inc2.batch_no == inc.batch_no
    assert inc2._state("docs").count() == 120
    got_clusters = inc2.process_batch(bs[3])
    got = {(r["doc_id"], r["cluster_id"]) for r in got_clusters.collect()}
    assert got == want


def test_gc_noop_without_compaction(spark, tmp_path):
    inc = IncrementalDedup(
        spark, CheckpointManager(spark, str(tmp_path / "s")), compact_every=0
    )
    inc.process_batch(
        spark.createDataFrame(
            [("u/1", "text for the only batch in this state dir")],
            "url string, text string",
        )
    )
    assert inc.gc() == []


def test_query_batch_topk_ranked(spark, tmp_path):
    """topk>1: ranked candidate list per query (the reference's A2
    top-k), rank ordered by jaccard desc with smallest-id ties; the
    default topk=1 schema is unchanged (no rank column)."""
    words = [f"tok{i:03d}" for i in range(60)]
    base = " ".join(words)
    variant_a = " ".join(["xx"] + words[1:])        # ~very close to base
    variant_b = " ".join(words[:58] + ["yy", "zz"])  # also close
    corpus = spark.createDataFrame(
        [("u/a", variant_a), ("u/b", variant_b)], "url string, text string"
    )
    inc = IncrementalDedup(
        spark, CheckpointManager(spark, str(tmp_path / "s"))
    )
    inc.process_batch(corpus)

    queries = spark.createDataFrame(
        [("q/probe", base), ("q/new", " ".join(f"qq{i}" for i in range(60)))],
        "url string, text string",
    )
    out = inc.query_batch(queries, topk=2).collect()
    assert "rank" in out[0].asDict()
    probe = sorted(
        (r for r in out if r["url"] == "q/probe"),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in probe] == [1, 2]
    assert probe[0]["jaccard_milli"] >= probe[1]["jaccard_milli"]
    assert {r["matched_doc_id"] for r in probe} == {
        spark.range(1).selectExpr("xxhash64('u/a')").first()[0],
        spark.range(1).selectExpr("xxhash64('u/b')").first()[0],
    }
    none_rows = [r for r in out if r["url"] == "q/new"]
    assert len(none_rows) == 1 and none_rows[0]["rank"] is None

    # default schema untouched
    out1 = inc.query_batch(queries)
    assert "rank" not in out1.columns

    import pytest

    with pytest.raises(ValueError, match="topk"):
        inc.query_batch(queries, topk=0)


def test_query_batch_releases_previous_pins(spark, tmp_path):
    """Back-to-back probes must not accumulate cached frames: the
    second query_batch unpersists the first probe's pins."""
    inc = IncrementalDedup(
        spark, CheckpointManager(spark, str(tmp_path / "s"))
    )
    inc.process_batch(
        spark.createDataFrame(
            [("u/1", "some indexed document text " * 3)],
            "url string, text string",
        )
    )
    q = spark.createDataFrame(
        [("q/x", "a probe document with enough text to sketch")],
        "url string, text string",
    )
    inc.query_batch(q).collect()
    first_pins = list(inc._query_pins)
    assert all(p.storageLevel.useMemory for p in first_pins)
    inc.query_batch(q).collect()
    assert all(not p.storageLevel.useMemory for p in first_pins)
    inc.release_query_pins()
    assert inc._query_pins == []
