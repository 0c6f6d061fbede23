"""Incremental near-duplicate detection over arriving page batches.

State (persisted as per-batch DELTA snapshots — docs/bands/sigs/edges
hold only the batch's new rows; the resident state is their union, and
write cost per batch is O(batch), not O(corpus)):
- ``bands``  — (doc_id, band, bucket) rows for every doc seen so far:
  the resident inverted index (the reference keeps its hash_multimap
  resident across REPL queries, /root/reference/src/mode_query.cpp:269-315);
- ``sigs``   — (doc_id, signature) MinHash signatures seen so far: the
  resident sketch store, so the hitsMin signature-estimate gate
  (/root/reference/src/mode_query.cpp:247-260) applies to candidates
  touching OLD docs without ever re-sketching them;
- ``edges``  — verified duplicate pair edges accumulated so far;
- ``docs``   — (doc_id, url, text) seen so far (needed for verify joins).

Each ``process_batch``:
1. sketches ONLY the new docs (UDF cost ∝ batch);
2. candidates = new×new plus new×old band-bucket collisions —
   the old side is probed via the persisted band table, never re-sketched;
3. gates candidates on signature agreement (lane-1 of the verify
   ladder, from the persisted sketch store), then verifies survivors
   (exact Jaccard) against the doc store;
4. re-clusters ONLY the components touched by the batch's new edges:
   the previous ``clusters`` snapshot contributes star pseudo-edges
   (member → old cluster id) for touched components, CC runs over
   new edges ∪ pseudo-edges, and untouched components carry their
   assignment forward unchanged — CC input is ∝ the affected
   subgraph, never the accumulated edge list (the reference's merge
   mode likewise re-inserts only the new candidates,
   /root/reference/src/mode_merge.cpp:209-264).

Every ``compact_every`` batches the per-kind deltas fold into one
compacted base (LSM-style), bounding the union depth ``_state`` pays.

Invariant (tested): processing a corpus in k batches yields the same
clusters as one batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import DEFAULT_CONFIG, DedupConfig
from ..operators.cc import cluster_assignments
from ..operators.lsh import (
    _pair_stream,
    attach_signature,
    emit_bands,
)
from ..operators.verify import (
    exact_jaccard_pairs,
    join_pair_texts,
    prefilter_candidates,
)
from ..plans.checkpoint import CheckpointManager
from ..plans.pipeline import prepare_docs


class IncrementalDedup:
    def __init__(
        self,
        spark: SparkSession,
        checkpoints: CheckpointManager,
        cfg: DedupConfig = DEFAULT_CONFIG,
        compact_every: int = 8,
    ):
        self.spark = spark
        self.ck = checkpoints
        self.cfg = cfg
        # fold deltas into a compacted base every N batches (0 = never):
        # keeps the per-kind union depth bounded on long-running streams
        self.compact_every = compact_every
        # CC input edge count of the last batch (new + pseudo edges) —
        # observability for the ∝-affected-subgraph contract
        self.last_cc_edges: int | None = None
        self.batch_no = self._last_batch() + 1
        # delta-format guard: state written by the legacy
        # cumulative-snapshot code would be silently DOUBLE-COUNTED by
        # the delta union (batch-0 docs in every snapshot) — refuse it
        # loudly instead of corrupting clusters
        if self.batch_no > 0 and not self.ck.has(self._FMT_MARKER):
            raise ValueError(
                f"checkpoint dir {self.ck.root!r} holds legacy "
                "cumulative snapshots, not per-batch deltas — "
                "reprocess into a fresh checkpoint dir"
            )

    _KINDS = ("docs", "bands", "sigs", "edges", "clusters")
    _FMT_MARKER = "state_fmt_deltas"

    def _last_batch(self) -> int:
        """Highest batch number with ALL five snapshots committed.
        Per-batch commits are atomic (one manifest update for all five,
        plans/checkpoint.py commit()), so an incomplete batch can only
        come from state written by older code — it is ignored and the
        batch is reprocessed, preserving kill-and-resume == single-run."""
        nums = {
            int(s.name.split("_b")[-1])
            for s in self.ck.snapshots()
            if s.name.startswith("docs_b")
        }
        complete = [
            n
            for n in nums
            if all(self.ck.has(f"{k}_b{n}") for k in self._KINDS)
        ]
        return max(complete, default=-1)

    _DELTA_KINDS = ("docs", "bands", "sigs", "edges")

    def _compact_base(self) -> int:
        """Highest batch n with a committed compacted base for every
        delta kind, or -1."""
        last = self.batch_no - 1
        bases = [
            int(s.name.split("_c")[-1])
            for s in self.ck.snapshots()
            if s.name.startswith("docs_c")
            and int(s.name.split("_c")[-1]) <= last
        ]
        return max(
            (
                n
                for n in bases
                if all(
                    self.ck.has(f"{k}_c{n}") for k in self._DELTA_KINDS
                )
            ),
            default=-1,
        )

    def _state(self, kind: str) -> DataFrame | None:
        """Accumulated state as of the last COMPLETE batch: the newest
        compacted base (if any) plus the UNION of the per-batch DELTA
        snapshots after it (selected numerically — lexicographic name
        sort would pick 'docs_b9' over 'docs_b10').  Deltas are
        disjoint by construction (docs are url-anti-joined, bands/sigs
        key on new docs, an edge always touches a doc new in its
        batch), so the union needs no dedup."""
        from functools import reduce

        last = self.batch_no - 1
        if last < 0:
            return None
        base = self._compact_base()
        parts = [self.ck.load(f"{kind}_c{base}")] if base >= 0 else []
        parts += [
            self.ck.load(f"{kind}_b{n}") for n in range(base + 1, last + 1)
        ]
        return reduce(lambda a, c: a.unionByName(c), parts)

    def compact(self) -> None:
        """Fold every delta up to the last complete batch into ONE
        compacted snapshot per state kind (atomic commit).  Call every
        K batches: bounds the union depth / file count `_state` pays,
        the same way a log-structured store merges its levels.  Old
        deltas stay on disk (snapshots are immutable); they simply stop
        being read."""
        last = self.batch_no - 1
        if last < 0 or self._compact_base() == last:
            # nothing to fold (or already compacted at this batch —
            # re-staging would overwrite the very path _state reads)
            return
        for kind in self._DELTA_KINDS:
            self.ck.stage_write(self._state(kind), f"{kind}_c{last}")
        self.ck.commit([f"{k}_c{last}" for k in self._DELTA_KINDS])

    def gc(self) -> list[str]:
        """Reclaim superseded state storage; returns the removed
        snapshot names.  Without gc the state dir grows
        O(corpus × batches) on a long stream (compaction supersedes
        deltas but never deletes — snapshots are immutable).

        Safe-to-remove = never read again AND not a resume anchor:
        delta (and clusters) snapshots of batches BEFORE the newest
        compacted base — ``_state`` reads base + deltas after it, and
        ``_recluster_affected`` reads only the previous batch's
        clusters — plus compacted bases older than the newest.  The
        base batch itself and everything after it stay, so
        ``_last_batch`` still resolves resume to the same batch after a
        restart.  Post-gc storage is O(corpus + recent batches)."""
        base = self._compact_base()
        if base < 0:
            return []
        dead = []
        for s in self.ck.snapshots():
            for kind in self._KINDS:
                tag = f"{kind}_b"
                if (
                    s.name.startswith(tag)
                    and int(s.name[len(tag):]) < base
                ):
                    dead.append(s.name)
            for kind in self._DELTA_KINDS:
                tag = f"{kind}_c"
                if (
                    s.name.startswith(tag)
                    and int(s.name[len(tag):]) < base
                ):
                    dead.append(s.name)
        if dead:
            self.ck.remove(dead)
        # also reclaim orphan dirs a previous crashed remove() left
        # behind (manifest-first ordering makes them invisible to it)
        self.ck.sweep_orphans()
        return dead

    def _recluster_affected(
        self, new_docs: DataFrame, new_edges: DataFrame
    ) -> DataFrame:
        """Updated (doc_id, cluster_id) over all docs, re-running CC
        only on the subgraph the batch touched.

        The previous clusters snapshot encodes all prior connectivity
        as stars (member → component min-id).  A full-graph component
        can only change if it contains a new edge, so:

        - components holding a new-edge endpoint are "affected": their
          members re-enter CC as (member, old_cluster_id) pseudo-edges
          (connectivity-preserving, O(members) not O(old edges));
        - CC runs over new edges ∪ pseudo-edges only;
        - every other component carries its row forward verbatim;
        - new docs without edges become singletons.

        cluster_id = min doc_id in the component holds in every case,
        so k-batch == one-shot stays exact (tested).
        """
        b = self.batch_no
        prev = self.ck.load(f"clusters_b{b - 1}") if b > 0 else None
        if prev is None:
            self.last_cc_edges = None
            return cluster_assignments(new_docs, new_edges)
        endpoints = (
            new_edges.select(F.col("a").alias("doc_id"))
            .unionByName(new_edges.select(F.col("b").alias("doc_id")))
            .distinct()
        )
        affected_cids = (
            prev.join(endpoints, "doc_id", "left_semi")
            .select("cluster_id")
            .distinct()
        )
        affected = prev.join(affected_cids, "cluster_id", "left_semi")
        pseudo = affected.where(
            F.col("doc_id") != F.col("cluster_id")
        ).select(F.col("doc_id").alias("a"), F.col("cluster_id").alias("b"))
        sub_edges = new_edges.select("a", "b").unionByName(pseudo)
        # both inputs are materialized parquet (edges delta + clusters
        # snapshot), so this count is a cheap scan — it feeds the
        # ∝-affected-subgraph metric, not the plan
        self.last_cc_edges = sub_edges.count()
        recompute_universe = (
            affected.select("doc_id")
            .unionByName(new_docs.select("doc_id"))
            .distinct()
        )
        recomputed = cluster_assignments(recompute_universe, sub_edges)
        carried = prev.join(affected_cids, "cluster_id", "left_anti")
        return carried.unionByName(recomputed)

    def process_batch(self, pages: DataFrame) -> DataFrame:
        """Fold a batch of pages into the state; returns the updated
        (doc_id, cluster_id) assignment over ALL docs seen so far."""
        cfg, b = self.cfg, self.batch_no
        old_docs = self._state("docs")
        old_bands = self._state("bands")
        old_sigs = self._state("sigs")

        new_docs = prepare_docs(pages)
        if old_docs is not None:
            # urls already ingested are skipped (P11 duplicate-key rule)
            new_docs = new_docs.join(
                old_docs.select("url"), "url", "left_anti"
            )
        # stage the docs DELTA first: downstream consumers (sketch UDF,
        # verify joins, cluster universe) read the materialized parquet
        # instead of re-running the caller's lineage per consumer
        new_docs = self.ck.stage_write(new_docs, f"docs_b{b}")
        sigs = attach_signature(new_docs.select("doc_id", "text"), cfg)
        new_bands = self.ck.stage_write(
            emit_bands(sigs, cfg), f"bands_b{b}"
        )
        new_sigs = self.ck.stage_write(
            sigs.select("doc_id", "signature"), f"sigs_b{b}"
        )

        all_docs = (
            new_docs
            if old_docs is None
            else old_docs.unionByName(new_docs)
        )
        all_bands = (
            new_bands if old_bands is None else old_bands.unionByName(new_bands)
        )
        all_sigs = (
            new_sigs if old_sigs is None else old_sigs.unionByName(new_sigs)
        )

        # candidates touching at least one NEW doc: group the combined
        # band table, expand pairs (under cfg.oversize_policy — the
        # star hub-edge lane works incrementally too), then semi-join
        # on new ids
        new_ids = new_docs.select(F.col("doc_id").alias("nid"))
        pairs = (
            _pair_stream(all_bands, cfg, "doc_id")
            .select("a", "b")
            .distinct()
        )
        pairs = pairs.join(
            new_ids,
            (F.col("a") == F.col("nid")) | (F.col("b") == F.col("nid")),
            "left_semi",
        )

        # lane-1 gate from the RESIDENT sketch store: old docs' lanes
        # come from state, never re-sketched (hitsMin discipline,
        # mode_query.cpp:247-260); only survivors ship text
        gated = prefilter_candidates(pairs, all_sigs, cfg)
        verified = (
            exact_jaccard_pairs(join_pair_texts(gated, all_docs), cfg)
            .where(F.col("jaccard") >= cfg.jaccard_threshold)
            .select("a", "b")
        )
        # two-phase commit: stage all five snapshots (Parquet writes),
        # then ONE atomic manifest update — a crash mid-batch leaves no
        # docs without their band rows (which would silently exempt
        # them from future duplicate probes).  docs/bands/sigs/edges
        # snapshots are per-batch DELTAS: write cost is O(batch) and
        # total state storage is O(corpus), where full-state rewrites
        # were O(corpus) per batch = O(corpus × batches) total — the
        # difference between a stream that keeps up and one that slows
        # with every batch.  Clusters stay a FULL snapshot: they are
        # the (one-row-per-doc) OUTPUT of the batch, not folded state.
        verified = self.ck.stage_write(verified, f"edges_b{b}")
        clusters = self._recluster_affected(new_docs, verified)
        clusters = self.ck.stage_write(clusters, f"clusters_b{b}")
        names = [f"{k}_b{b}" for k in self._KINDS]
        if b == 0:
            # the format marker rides the first atomic commit
            self.ck.stage_write(
                self.spark.createDataFrame([(2,)], "fmt long"),
                self._FMT_MARKER,
            )
            names.append(self._FMT_MARKER)
        self.ck.commit(names)
        self.batch_no += 1
        # LSM cadence: fold the delta chain into one base every K
        # batches so _state's union depth stays ≤ K on long streams
        if self.compact_every > 0 and self.batch_no % self.compact_every == 0:
            self.compact()
        return clusters

    def release_query_pins(self) -> None:
        """Free the caches the last :meth:`query_batch` pinned — call
        AFTER materializing its result (an unpersisted result frame
        would silently recompute the sketch UDF per consumer)."""
        for df in getattr(self, "_query_pins", []):
            df.unpersist()
        self._query_pins = []

    def query_batch(self, pages: DataFrame, topk: int = 1) -> DataFrame:
        """READ-ONLY probe of the resident index — the reference's
        build-once/query-many mode (mode_query.cpp: a resident DB
        serves query batches without mutation) for the webtext lane;
        ``process_batch`` is `modify`, this is `query`.

        Classifies each page of the batch against the CURRENT state:
        one row per prepared page (the batch passes the same P11
        prepare as the fold path: empty texts and in-batch duplicate
        urls drop) with

        - ``match_kind='url'``     — an indexed page with the same url
          (the identity the fold path would anti-join away);
        - ``match_kind='content'`` — best verified near-dup:
          band-bucket collision against the resident band table →
          signature-lane gate from the resident sketch store →
          exact-Jaccard verify ≥ cfg.jaccard_threshold; ties to the
          smallest indexed id; ``jaccard_milli`` carries the score;
        - ``match_kind='none'``    — novel.

        The state is probed, never re-sketched and never written; only
        the batch's own docs pay the sketch UDF.  State-side bucket
        membership is capped before the probe join (count-first, the
        P13/P17 guard): ``drop`` discards over-cap buckets; ``sample``
        and ``star`` probe a deterministic cap-sized subset (a hub edge
        has no meaning on a read-only probe).

        ``topk > 1`` is the reference's ranked candidate list (A2,
        top-k per query): up to k content matches per query doc with a
        ``rank`` column appended (url matches rank 1; 'none' rows carry
        a null rank).  The default ``topk=1`` keeps the best-match
        schema above (no rank column) — the oracle-gated contract shape.
        """
        from pyspark.sql.window import Window

        if topk < 1:
            raise ValueError(f"topk must be >= 1, got {topk}")
        ranked = topk > 1
        cfg = self.cfg
        none_row = [
            F.lit("none").alias("match_kind"),
            F.lit(None).cast("long").alias("matched_doc_id"),
            F.lit(None).cast("long").alias("jaccard_milli"),
        ]
        if ranked:
            none_row.append(F.lit(None).cast("int").alias("rank"))
        q = prepare_docs(pages)
        docs = self._state("docs")
        if docs is None:
            return q.select("doc_id", "url", *none_row)

        url_cols = [
            F.col("doc_id"),
            F.col("url"),
            F.lit("url").alias("match_kind"),
            F.col("matched_doc_id"),
            F.lit(None).cast("long").alias("jaccard_milli"),
        ]
        if ranked:
            url_cols.append(F.lit(1).cast("int").alias("rank"))
        url_part = q.select("doc_id", "url").join(
            docs.select(
                "url", F.col("doc_id").alias("matched_doc_id")
            ),
            "url",
        ).select(*url_cols)

        # pin the batch-sized probe subtrees: novel feeds qsigs, the
        # verify text union and the result assembly; qsigs feeds the
        # band emit and BOTH signature sides of the gate — unpinned,
        # the sketch UDF would run ~3x and the batch prepare ~6x.
        # (persist, not stage_write: a READ-ONLY probe must leave the
        # checkpoint dir untouched.)  Lifetime = the returned
        # DataFrame's, so the pins stay with it.
        from ..plans.pinning import pin

        novel = pin(q.join(docs.select("url"), "url", "left_anti"))
        qsigs = pin(attach_signature(novel.select("doc_id", "text"), cfg))
        # repeated probes on one engine (stream_query's foreachBatch
        # loop, back-to-back CLI probes) must not accumulate one cache
        # pair per call: free the PREVIOUS probe's pins first (a caller
        # still holding that result recomputes, which is correct-but-
        # slower; leaking JVM cache entries is neither), then record
        # the new pair so release_query_pins() can free it eagerly once
        # the result is materialized
        self.release_query_pins()
        self._query_pins = [novel, qsigs]
        qbands = emit_bands(qsigs, cfg)

        bands = self._state("bands")
        cap = cfg.max_docs_per_bucket
        if cfg.oversize_policy == "drop":
            ok = (
                bands.groupBy("band", "bucket")
                .agg(F.count(F.lit(1)).alias("n"))
                .where(F.col("n") <= cap)
                .select("band", "bucket")
            )
            idx = bands.join(ok.hint("shuffle_hash"), ["band", "bucket"])
        else:
            # deterministic cap-sized subset per bucket (same ordering
            # as the build-side "sample" lane: bucket-keyed xxhash)
            w_rank = F.expr(
                "row_number() OVER (PARTITION BY band, bucket "
                "ORDER BY xxhash64(band, bucket, doc_id), doc_id)"
            )
            idx = (
                bands.withColumn("__rn", w_rank)
                .where(F.col("__rn") <= cap)
                .drop("__rn")
            )

        cand = (
            qbands.select(F.col("doc_id").alias("b"), "band", "bucket")
            .join(
                idx.select(F.col("doc_id").alias("a"), "band", "bucket")
                .hint("shuffle_hash"),
                ["band", "bucket"],
            )
            .where(F.col("a") != F.col("b"))
            .select("a", "b")
            .distinct()
        )
        all_sigs = self._state("sigs").unionByName(
            qsigs.select("doc_id", "signature")
        )
        gated = prefilter_candidates(cand, all_sigs, cfg)
        texts = docs.select("doc_id", "text").unionByName(
            novel.select("doc_id", "text")
        )
        verified = exact_jaccard_pairs(
            join_pair_texts(gated, texts), cfg
        ).where(F.col("jaccard") >= cfg.jaccard_threshold)
        best_cols = [
            F.col("b").alias("doc_id"),
            F.col("a").alias("matched_doc_id"),
            F.floor(F.col("jaccard") * 1000).cast("long").alias(
                "jaccard_milli"
            ),
        ]
        if ranked:
            best_cols.append(F.col("__rn").cast("int").alias("rank"))
        best = (
            verified.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("b").orderBy(
                        F.col("jaccard").desc(), F.col("a").asc()
                    )
                ),
            )
            .where(F.col("__rn") <= topk)
            .select(*best_cols)
        )
        novel_part = (
            novel.select("doc_id", "url")
            .join(best, "doc_id", "left")
            .select(
                "doc_id",
                "url",
                F.when(
                    F.col("matched_doc_id").isNotNull(), F.lit("content")
                )
                .otherwise(F.lit("none"))
                .alias("match_kind"),
                "matched_doc_id",
                "jaccard_milli",
                *(["rank"] if ranked else []),
            )
        )
        return url_part.unionByName(novel_part)
