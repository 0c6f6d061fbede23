"""Genomic mode: the reference's native build+query pipeline, Spark-first.

Build (mode_build analog): target sequences → per-window bottom-s
sketches → exploded inverted index ``(feature, tgt, win)`` with the
location-list cap (P17) and overpopulated-feature removal (P13) —
/root/reference/src/sketch_database.h:1079-1097,375-417.

Query (mode_query analog): query sequences → sketches → equi join on
feature (J1, the hash-multimap probe) → per-(query,target) contiguous
window-range hit counting (A1, /root/reference/src/candidates.h:118-180)
→ top-k candidates per query (A2) with the ``hitsMin`` threshold (P12,
deduced sketch_size/3 as in /root/reference/src/mode_query.cpp:247-260).

All DataFrame ops after the sketch UDF: the index IS a DataFrame, the
probe IS a join, the MPI candidate exchange IS the groupBy shuffle
(SURVEY.md D5/D6).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.dna import window_sketches


@dataclass(frozen=True)
class GenomicConfig:
    k: int = 16               # kmer length (mode_build.cpp:65)
    sketch_size: int = 16     # bottom-s width (mode_build.cpp:66)
    winlen: int = 128         # window length (mode_build.cpp:67)
    winstride: int = 113      # winlen - k + 1 (mode_build.cpp:108-111)
    max_locs_per_feature: int = 254   # loclist cap (sketch_database.h:375-378)
    remove_overpopulated: bool = False  # P13 (docs/build.txt:46-50)
    max_candidates: int = 2   # top-k (query_options.h:134)
    num_windows: int = 3      # A1 range span (candidates.h:95)
    hits_min: int | None = None  # None → sketch_size // 3 (mode_query.cpp:247-260)

    @property
    def hits_min_effective(self) -> int:
        return max(1, self.sketch_size // 3) if self.hits_min is None else self.hits_min


def _sketch_rows(
    seqs: DataFrame, cfg: GenomicConfig, id_col: str
) -> DataFrame:
    """(id, win, feature) — one row per sketch feature per window."""
    k, s, wl, ws = cfg.k, cfg.sketch_size, cfg.winlen, cfg.winstride
    schema = f"{id_col} long, win long, feature long"

    def _map(batches):
        for pdf in batches:
            ids, wins, feats = [], [], []
            for i, seq in zip(pdf[id_col], pdf["seq"]):
                for win_id, sk in window_sketches(seq or "", k, s, wl, ws):
                    ids.extend([i] * sk.size)
                    wins.extend([win_id] * sk.size)
                    feats.extend(sk.astype(np.int64).tolist())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "win": pd.Series(wins, dtype="int64"),
                    "feature": pd.Series(feats, dtype="int64"),
                }
            )

    return seqs.select(id_col, "seq").mapInPandas(_map, schema=schema)


def build_index(targets: DataFrame, cfg: GenomicConfig = GenomicConfig()) -> DataFrame:
    """targets(tgt, seq) → inverted index (feature, tgt, win).

    Location lists are capped at ``max_locs_per_feature`` keeping the
    smallest (tgt, win) deterministically — the reference keeps
    insertion order (single-writer per rank); a distributed build has
    no global insertion order, so the deterministic total order stands
    in (divergence documented).  With ``remove_overpopulated``,
    features whose TOTAL location count exceeds the cap are dropped
    entirely (D3/D4 global count + prune).
    """
    rows = _sketch_rows(targets, cfg, "tgt")
    counts = rows.groupBy("feature").agg(F.count(F.lit(1)).alias("n"))
    if cfg.remove_overpopulated:
        keep = counts.where(F.col("n") <= cfg.max_locs_per_feature)
        return rows.join(keep.select("feature"), "feature").select(
            "feature", "tgt", "win"
        )
    # cap: only oversize features pay the per-feature sort window — the
    # bulk bypasses it entirely, and no mega-hot feature funnels through
    # a single task before being counted (same count-first discipline as
    # prune_buckets)
    small = rows.join(
        counts.where(F.col("n") <= cfg.max_locs_per_feature).select("feature"),
        "feature",
    ).select("feature", "tgt", "win")
    big = rows.join(
        counts.where(F.col("n") > cfg.max_locs_per_feature).select("feature"),
        "feature",
    )
    w = Window.partitionBy("feature").orderBy("tgt", "win")
    big_capped = (
        big.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= cfg.max_locs_per_feature)
        .select("feature", "tgt", "win")
    )
    return small.unionByName(big_capped)


def remove_ambiguous_features(
    index: DataFrame,
    target_taxon: DataFrame,
    max_ambig: int,
) -> DataFrame:
    """P14 (/root/reference/src/sketch_database.h:428-470): drop features
    whose locations span more than ``max_ambig`` DISTINCT taxa — the
    taxonomic-ambiguity variant of overpopulated-feature removal.

    ``target_taxon``: (tgt, taxid) dim — broadcast by Catalyst.
    """
    with_tax = index.join(F.broadcast(target_taxon), "tgt")
    ambig = (
        with_tax.groupBy("feature")
        .agg(F.countDistinct("taxid").alias("n_taxa"))
        .where(F.col("n_taxa") > max_ambig)
        .select("feature")
    )
    return index.join(ambig, "feature", "left_anti")


def dump_feature_map(index: DataFrame) -> DataFrame:
    """`info featuremap` analog (/root/reference/src/mode_info.cpp:105-129):
    one sorted row per feature with its full location list — the golden
    dump used for index diffing."""
    return (
        index.groupBy("feature")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("tgt", "win"))
            ).alias("locations")
        )
        .orderBy("feature")
    )


def query_index(
    queries: DataFrame,
    index: DataFrame,
    cfg: GenomicConfig = GenomicConfig(),
) -> DataFrame:
    """queries(qid, seq) × index → top-k candidates per query:
    (qid, tgt, hits, win_beg) with hits ≥ hitsMin.

    hits = the best contiguous window-range count: for each target
    window w holding ≥1 match, the number of matches in
    [w, w + num_windows - 1] (A1); best range per (qid, tgt), then
    top-k targets per qid ordered by hits desc (tie: tgt asc).
    """
    qrows = _sketch_rows(queries, cfg, "qid").withColumnRenamed("win", "qwin")
    # J1: the index probe — plain equi join on feature
    matches = qrows.join(index, "feature").select(
        "qid", "tgt", F.col("win").cast("long").alias("win")
    )
    per_win = matches.groupBy("qid", "tgt", "win").agg(
        F.count(F.lit(1)).alias("whits")
    )
    # A1: range frame over window ids
    span = Window.partitionBy("qid", "tgt").orderBy("win").rangeBetween(
        0, cfg.num_windows - 1
    )
    ranged = per_win.withColumn("hits", F.sum("whits").over(span))
    best = Window.partitionBy("qid", "tgt").orderBy(
        F.desc("hits"), F.asc("win")
    )
    per_target = (
        ranged.withColumn("rn", F.row_number().over(best))
        .where(F.col("rn") == 1)
        .select("qid", "tgt", "hits", F.col("win").alias("win_beg"))
    )
    # A2: top-k candidates per query, P12: hitsMin threshold
    topk = Window.partitionBy("qid").orderBy(F.desc("hits"), F.asc("tgt"))
    return (
        per_target.withColumn("rank", F.row_number().over(topk))
        .where(
            (F.col("rank") <= cfg.max_candidates)
            & (F.col("hits") >= cfg.hits_min_effective)
        )
        .select("qid", "tgt", "hits", "win_beg", "rank")
    )
