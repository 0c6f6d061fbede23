"""Genomic build+query pipeline vs a pure-Python oracle implementing
the reference's candidate semantics literally (contig_runs / topk_ties /
threshold_edge fixtures, FIXTURES.md §3; /root/reference/src/candidates.h)."""

from __future__ import annotations

import numpy as np
import pytest

from metacache_mpi_spark.functions.dna import window_sketches
from metacache_mpi_spark.operators.genomic import (
    GenomicConfig,
    build_index,
    query_index,
)

CFG = GenomicConfig(k=8, sketch_size=8, winlen=64, winstride=57, num_windows=3)


def _rand_dna(rng, n):
    return "".join("ACGT"[i] for i in rng.randint(0, 4, size=n))


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(11)
    targets = [(t, _rand_dna(rng, 600)) for t in range(8)]
    # queries: fragments copied from targets (planted homology) + noise
    queries = []
    for qid in range(12):
        t = qid % 8
        start = int(rng.randint(0, 400))
        frag = targets[t][1][start : start + 150]
        queries.append((qid, frag))
    queries.append((100, _rand_dna(rng, 150)))  # unrelated
    return targets, queries


def _oracle_index(targets, cfg):
    """feature -> [(tgt, win)] with cap keeping smallest (tgt, win)."""
    from collections import defaultdict

    idx = defaultdict(list)
    for tgt, seq in targets:
        for win, sk in window_sketches(seq, cfg.k, cfg.sketch_size, cfg.winlen, cfg.winstride):
            for f in sk.tolist():
                idx[f].append((tgt, win))
    out = {}
    for f, locs in idx.items():
        out[f] = sorted(locs)[: cfg.max_locs_per_feature]
    return out


def _oracle_query(queries, idx, cfg):
    """Literal A1/A2/P12: per (qid,tgt) best contiguous-range count,
    top-k by (hits desc, tgt asc), hits >= hitsMin."""
    from collections import Counter, defaultdict

    results = {}
    for qid, seq in queries:
        matches = defaultdict(Counter)  # tgt -> {win: hits}
        for _, sk in window_sketches(seq, cfg.k, cfg.sketch_size, cfg.winlen, cfg.winstride):
            for f in sk.tolist():
                for tgt, win in idx.get(f, ()):
                    matches[tgt][win] += 1
        cands = []
        for tgt, wins in matches.items():
            best, best_w = 0, None
            for w in sorted(wins):
                hits = sum(
                    c for ww, c in wins.items() if w <= ww <= w + cfg.num_windows - 1
                )
                if hits > best:
                    best, best_w = hits, w
            cands.append((tgt, best, best_w))
        cands.sort(key=lambda c: (-c[1], c[0]))
        kept = [
            (qid, t, h, w, r + 1)
            for r, (t, h, w) in enumerate(cands[: cfg.max_candidates])
            if h >= cfg.hits_min_effective
        ]
        results[qid] = kept
    return results


def test_build_and_query_match_oracle(spark, corpus):
    targets, queries = corpus
    tdf = spark.createDataFrame(targets, "tgt long, seq string")
    qdf = spark.createDataFrame(queries, "qid long, seq string")
    idx = build_index(tdf, CFG)
    got_rows = query_index(qdf, idx, CFG).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["qid"], []).append(
            (r["qid"], r["tgt"], r["hits"], r["win_beg"], r["rank"])
        )
    for qid in got:
        got[qid].sort(key=lambda t: t[4])

    oracle = _oracle_query(queries, _oracle_index(targets, CFG), CFG)
    oracle = {q: v for q, v in oracle.items() if v}
    assert got == oracle


def test_planted_homology_recovered(spark, corpus):
    targets, queries = corpus
    tdf = spark.createDataFrame(targets, "tgt long, seq string")
    qdf = spark.createDataFrame(queries, "qid long, seq string")
    res = query_index(qdf, build_index(tdf, CFG), CFG).collect()
    top = {r["qid"]: r["tgt"] for r in res if r["rank"] == 1}
    correct = sum(1 for qid, tgt in top.items() if qid != 100 and qid % 8 == tgt)
    assert correct >= 11  # all 12 planted fragments map home (allow 1 slack)
    assert 100 not in top  # unrelated query stays unclassified


def test_index_cap_and_overpopulated_removal(spark):
    cfg = GenomicConfig(k=4, sketch_size=4, winlen=16, winstride=13,
                        max_locs_per_feature=3)
    # identical targets -> every feature present in all 6 -> cap binds
    seq = "ACGTACGTACGTACGT"
    tdf = spark.createDataFrame([(i, seq) for i in range(6)], "tgt long, seq string")
    capped = build_index(tdf, cfg)
    sizes = {r["feature"]: r["n"] for r in
             capped.groupBy("feature").count().withColumnRenamed("count", "n").collect()}
    assert sizes and all(n <= 3 for n in sizes.values())
    removed = build_index(
        tdf, GenomicConfig(k=4, sketch_size=4, winlen=16, winstride=13,
                           max_locs_per_feature=3, remove_overpopulated=True)
    )
    assert removed.count() == 0  # every feature exceeds the cap -> pruned
