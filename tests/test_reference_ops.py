"""Round-2 reference-parity operators: paired-end queries, merge-below-
rank, matches-per-target inversion, per-rank evaluation statistics,
banded SimHash and banded embedding-dedup production lanes — each vs a
literal pure-Python transcription of the reference rule."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from metacache_mpi_spark.functions.dna import window_sketches
from metacache_mpi_spark.operators.genomic import (
    GenomicConfig,
    _per_target_best,
    build_index,
    matches_per_target,
    merge_candidates_below_rank,
    probe_matches,
    query_index,
    query_index_paired,
    window_char_range,
)
from metacache_mpi_spark.operators.taxonomy import Taxonomy

CFG = GenomicConfig(k=8, sketch_size=8, winlen=64, winstride=57)


def _rand_dna(rng, n):
    return "".join("ACGT"[i] for i in rng.randint(0, 4, size=n))


@pytest.fixture(scope="module")
def paired_corpus():
    rng = np.random.RandomState(23)
    targets = [(t, _rand_dna(rng, 600)) for t in range(6)]
    queries = []
    for qid in range(15):
        t = qid % 6
        s = int(rng.randint(0, 300))
        insert = int(rng.randint(150, 220))
        seq = targets[t][1]
        queries.append((qid, seq[s : s + 100], seq[s + insert : s + insert + 100]))
    queries.append((100, _rand_dna(rng, 100), _rand_dna(rng, 100)))
    return targets, queries


def _oracle_index(targets, cfg):
    idx = defaultdict(list)
    for tgt, seq in targets:
        for win, sk in window_sketches(seq, cfg.k, cfg.sketch_size, cfg.winlen, cfg.winstride):
            for f in sk.tolist():
                idx[f].append((tgt, win))
    return {f: sorted(v)[: cfg.max_locs_per_feature] for f, v in idx.items()}


def _oracle_matches(seq, idx, cfg):
    out = []
    for _, sk in window_sketches(seq, cfg.k, cfg.sketch_size, cfg.winlen, cfg.winstride):
        for f in sk.tolist():
            out.extend(idx.get(f, ()))
    return out


def _oracle_candidates(matches_by_tgt, cfg, num_windows):
    """Literal A1/A2/P12 over a merged match multiset."""
    cands = []
    for tgt, wins in matches_by_tgt.items():
        best, best_w = 0, None
        for w in sorted(wins):
            hits = sum(
                c for ww, c in wins.items() if w <= ww <= w + num_windows - 1
            )
            if hits > best:
                best, best_w = hits, w
        cands.append((tgt, best, best_w))
    cands.sort(key=lambda c: (-c[1], c[0]))
    return [
        (t, h, w, r + 1)
        for r, (t, h, w) in enumerate(cands[: cfg.max_candidates])
        if h >= cfg.hits_min_effective
    ]


def test_paired_query_matches_reference_rule(spark, paired_corpus):
    """Both mates accumulate into ONE candidate set per query
    (querying.h:49-75); num_windows = 2 + (|s1|+|s2|)/stride
    (classification.cpp:217-219)."""
    targets, queries = paired_corpus
    tdf = spark.createDataFrame(targets, "tgt long, seq string")
    qdf = spark.createDataFrame(queries, "qid long, seq1 string, seq2 string")
    got_rows = query_index_paired(qdf, build_index(tdf, CFG), CFG).collect()
    got = defaultdict(list)
    for r in got_rows:
        got[r["qid"]].append((r["tgt"], r["hits"], r["win_beg"], r["rank"]))
    for v in got.values():
        v.sort(key=lambda t: t[3])

    idx = _oracle_index(targets, CFG)
    want = {}
    for qid, s1, s2 in queries:
        merged = defaultdict(Counter)
        for tgt, win in _oracle_matches(s1, idx, CFG) + _oracle_matches(s2, idx, CFG):
            merged[tgt][win] += 1
        nw = 2 + (len(s1) + len(s2)) // CFG.winstride
        kept = _oracle_candidates(merged, CFG, nw)
        if kept:
            want[qid] = kept
    assert dict(got) == want
    assert 100 not in got  # unrelated pair stays unclassified


def test_paired_beats_single_mate(spark, paired_corpus):
    """Accumulating both mates must never reduce the best candidate's
    hits vs querying mate 1 alone (the point of pairing)."""
    targets, queries = paired_corpus
    tdf = spark.createDataFrame(targets, "tgt long, seq string")
    qdf = spark.createDataFrame(queries, "qid long, seq1 string, seq2 string")
    idx = build_index(tdf, CFG)
    paired = {
        (r["qid"], r["tgt"]): r["hits"]
        for r in query_index_paired(qdf, idx, CFG).collect()
    }
    single = {
        (r["qid"], r["tgt"]): r["hits"]
        for r in query_index(
            qdf.select("qid", F.col("seq1").alias("seq")), idx, CFG
        ).collect()
    }
    shared = set(paired) & set(single)
    assert shared, "no overlapping candidates to compare"
    assert all(paired[k] >= single[k] for k in shared)


TAX = Taxonomy(
    parent={1: 1, 100: 1, 101: 1, 10: 100, 11: 100, 12: 100,
            13: 101, 14: 101, 15: 101},
    rank={1: "root", 100: "genus", 101: "genus",
          **{t: "species" for t in range(10, 16)}},
)
TGT_TAXID = {t: 10 + t for t in range(6)}


def test_merge_below_rank_reference_rule(spark, paired_corpus):
    """candidates.h:242-283: lift each candidate's taxon to the
    -lowest-rank ancestor, keep max hits per distinct merged taxon,
    then top-k by hits."""
    targets, queries = paired_corpus
    single = [(q, s1) for q, s1, _ in queries]
    tdf = spark.createDataFrame(targets, "tgt long, seq string")
    qdf = spark.createDataFrame(single, "qid long, seq string")
    cfg = GenomicConfig(k=8, sketch_size=8, winlen=64, winstride=57,
                        max_candidates=4)
    matches = probe_matches(qdf, build_index(tdf, cfg), cfg)
    # pre-top-k rows: the reference merges at insert time, before its
    # bounded candidate list (a genus whose best target ranks below the
    # per-target top-k must still merge in)
    per_target = _per_target_best(matches, cfg)
    got = defaultdict(list)
    for r in merge_candidates_below_rank(
        per_target, TAX, TGT_TAXID, "genus", cfg
    ).collect():
        got[r["qid"]].append((r["taxid"], r["hits"], r["rank"]))
    for v in got.values():
        v.sort(key=lambda t: t[2])

    # python oracle from the SAME per-target rows (rule transcription)
    rows = per_target.collect()
    by_q = defaultdict(dict)
    for r in rows:
        anc = TAX.ancestor_at_rank(TGT_TAXID[r["tgt"]], "genus")
        cur = by_q[r["qid"]].get(anc)
        if cur is None or r["hits"] > cur:
            by_q[r["qid"]][anc] = r["hits"]
    want = {}
    for qid, taxa in by_q.items():
        ordered = sorted(taxa.items(), key=lambda t: (-t[1], t[0]))
        kept = [
            (tax, h, rk + 1)
            for rk, (tax, h) in enumerate(ordered[: cfg.max_candidates])
            if h >= cfg.hits_min_effective
        ]
        if kept:
            want[qid] = kept
    assert dict(got) == want


def test_matches_per_target_inversion(spark, paired_corpus):
    """matches_per_target.h:111-184: per target, candidate queries with
    their in-range per-window counts, sorted by (first win, last win,
    qid)."""
    targets, queries = paired_corpus
    single = [(q, s1) for q, s1, _ in queries]
    tdf = spark.createDataFrame(targets, "tgt long, seq string")
    qdf = spark.createDataFrame(single, "qid long, seq string")
    idx = build_index(tdf, CFG)
    matches = probe_matches(qdf, idx, CFG)
    cands = query_index(qdf, idx, CFG)
    got = defaultdict(list)
    for r in matches_per_target(matches, cands, CFG).collect():
        got[r["tgt"]].append(
            (r["pos"], r["qid"], r["win_first"], r["win_last"],
             r["n_windows"], r["total_hits"],
             [(w["win"], w["whits"]) for w in r["windows"]])
        )
    for v in got.values():
        v.sort()

    # python oracle
    mrows = [(r["qid"], r["tgt"], r["win"]) for r in matches.collect()]
    crows = [(r["qid"], r["tgt"], r["win_beg"]) for r in cands.collect()]
    per = defaultdict(Counter)
    for cq, ct, beg in crows:
        for q, t, w in mrows:
            if q == cq and t == ct and beg <= w <= beg + CFG.num_windows - 1:
                per[(ct, cq)][w] += 1
    by_tgt = defaultdict(list)
    for (t, q), wins in per.items():
        ws = sorted(wins)
        by_tgt[t].append(
            (ws[0], ws[-1], q, len(ws), sum(wins.values()),
             [(w, wins[w]) for w in ws])
        )
    want = {}
    for t, entries in by_tgt.items():
        entries.sort(key=lambda e: (e[0], e[1], e[2]))
        want[t] = sorted(
            (pos + 1, q, wf, wl, nw, th, wlist)
            for pos, (wf, wl, q, nw, th, wlist) in enumerate(entries)
        )
    assert dict(got) == want


def test_window_char_range(spark):
    df = spark.createDataFrame([(0,), (3,)], "win long").select(
        "win", window_char_range("win", CFG).alias("r")
    )
    got = {r["win"]: (r["r"]["char_beg"], r["r"]["char_end"]) for r in df.collect()}
    assert got == {0: (0, 63), 3: (171, 234)}


# ---------------------------------------------------------------------------
# evaluation operators
# ---------------------------------------------------------------------------


def test_confusion_stats_literal(spark):
    from metacache_mpi_spark.operators.evaluate import confusion_stats

    rows = [("en", "en"), ("en", "de"), ("de", "de"), ("de", "de"),
            ("es", "en"), ("fr", "en")]
    df = spark.createDataFrame(rows, "truth string, pred string")
    got = {r["cls"]: r.asDict() for r in confusion_stats(df, "truth", "pred").collect()}
    assert got["en"]["support"] == 2 and got["en"]["predicted"] == 3
    assert got["en"]["tp"] == 1 and got["en"]["fp"] == 2 and got["en"]["fn"] == 1
    assert got["en"]["sensitivity_micro"] == 500000
    assert got["en"]["precision_micro"] == 333333
    assert got["de"]["tp"] == 2 and got["de"]["fp"] == 1 and got["de"]["fn"] == 0
    assert got["fr"]["predicted"] == 0 and got["fr"]["sensitivity_micro"] == 0
    assert got["fr"]["precision_micro"] == 0  # guarded 0/0


def test_per_rank_stats_vs_reference_counters(spark):
    """Transcribe classification_statistics.h assign_known_correct over
    the same inputs and compare every counter."""
    from metacache_mpi_spark.operators.evaluate import (
        NONE_POS,
        per_rank_stats,
        rank_positions,
    )
    from metacache_mpi_spark.operators.taxonomy import RANKS

    tax = Taxonomy(
        parent={1: 1, 2: 1, 3: 2, 4: 3, 8: 3, 5: 4, 6: 4, 9: 8},
        rank={1: "root", 2: "domain", 3: "phylum", 4: "genus",
              8: "genus", 5: "species", 6: "species", 9: "species"},
    )
    rows = [(0, 5, 5), (1, 6, 5), (2, 9, 5), (3, None, 5), (4, 5, None),
            (5, 4, 5), (6, None, None)]
    df = spark.createDataFrame(rows, "qid long, taxid long, truth_taxid long")
    got = {r["rank"]: r.asDict() for r in per_rank_stats(rank_positions(df, tax)).collect()}

    # literal reference counters
    R = len(RANKS)
    assigned = [0] * (R + 1)
    known = [0] * (R + 1)
    correct = [0] * (R + 1)
    wrong = [0] * (R + 1)
    for _, pred, truth in rows:
        ap = tax.rank_pos(pred) if pred is not None else NONE_POS
        kp = tax.rank_pos(truth) if truth is not None else NONE_POS
        if pred is None or truth is None:
            cp = NONE_POS
        else:
            lca = tax.ranked_lca(pred, truth)
            cp = NONE_POS if lca is None else tax.rank_pos(lca)
        cp = max(cp, ap, kp)
        for r in range(ap, R):
            assigned[r] += 1
        if kp == NONE_POS:
            known[R] += 1
        else:
            for r in range(kp, R):
                known[r] += 1
            if cp == NONE_POS:
                correct[R] += 1
            else:
                for r in range(cp, R):
                    correct[r] += 1
            if cp > kp and cp > ap:
                for r in range(0, cp if cp < R else R):
                    wrong[r] += 1
    for pos, rank in enumerate(RANKS):
        g = got[rank]
        assert g["assigned"] == assigned[pos], rank
        assert g["known"] == known[pos], rank
        assert g["correct"] == correct[pos], rank
        assert g["wrong"] == wrong[pos], rank
        assert g["total"] == len(rows)


def test_rank_positions_lift_unranked_truth(spark):
    """classification.cpp:115-124 next_ranked_ancestor: a 'no rank'
    ground-truth taxon counts at its first ranked ancestor's rank —
    NOT as unknown — so known/correct denominators match the reference
    on real NCBI dumps (where 'no rank' nodes are ubiquitous)."""
    from metacache_mpi_spark.operators.evaluate import (
        NONE_POS,
        rank_positions,
    )
    from metacache_mpi_spark.operators.taxonomy import RANK_POS

    # 7 is a 'no rank' strain node under species 5
    tax = Taxonomy(
        parent={1: 1, 2: 1, 4: 2, 5: 4, 7: 5},
        rank={1: "root", 2: "domain", 4: "genus", 5: "species",
              7: "no rank"},
    )
    rows = [(0, 5, 7),      # truth lifts 7 -> species; pred species
            (1, 7, 7),      # pred unranked too: assigned stays unranked
            (2, 5, None)]   # truth absent: still unknown
    df = spark.createDataFrame(rows, "qid long, taxid long, truth_taxid long")
    got = {r["qid"]: r.asDict() for r in rank_positions(df, tax).collect()}
    sp = RANK_POS["species"]
    assert got[0]["known_pos"] == sp            # lifted, not NONE_POS
    assert got[0]["correct_pos"] == sp          # ranked_lca(5, 7) = 5
    assert got[1]["known_pos"] == sp
    assert got[1]["assigned_pos"] == NONE_POS   # assignment NOT lifted
    assert got[2]["known_pos"] == NONE_POS


def test_annotate_field_sep_hardening(spark):
    """A regex-metachar separator must be escaped, not interpolated; a
    quote / multi-char separator is rejected up front."""
    import pytest as _pytest

    from metacache_mpi_spark.operators.annotate import annotate_with_taxid

    seqs = spark.createDataFrame(
        [(0, "NC_001422.1.some phage"), (1, "NC_001422.1.taxid.9.old")],
        "record_idx long, header string",
    )
    mapping = spark.createDataFrame(
        [("NC_001422", "NC_001422.1", 10847)],
        "accession string, accession_version string, taxid long",
    )
    got = {r["record_idx"]: r["header"]
           for r in annotate_with_taxid(seqs, mapping, field_sep=".").collect()}
    assert got[0] == "NC_001422.taxid.10847.1.some phage"
    assert got[1] == "NC_001422.taxid.10847.1.old"
    for bad in ("||", "'", "\\", ""):
        with _pytest.raises(ValueError):
            annotate_with_taxid(seqs, mapping, field_sep=bad)


def test_pair_recall_operator(spark):
    from metacache_mpi_spark.operators.evaluate import pair_recall

    pred = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "a long, b long")
    truth = spark.createDataFrame([(2, 1), (3, 4), (7, 8)], "a long, b long")
    got = pair_recall(pred, truth)
    assert got["tp"] == 2 and got["fn"] == 1 and got["fp"] == 1
    assert abs(got["recall"] - 2 / 3) < 1e-9
    assert abs(got["precision"] - 2 / 3) < 1e-9


# ---------------------------------------------------------------------------
# banded production lanes == brute-force oracles
# ---------------------------------------------------------------------------

SF_DIR = "/root/testdata/sf0.001"


def test_simhash_banded_equals_brute(spark):
    """4 bands > 3 bit flips ⇒ pigeonhole exactness: the banded lane
    must return EXACTLY the brute-force pair set (16-bit oracle-parity
    geometry; no bucket exceeds the cap at this corpus size)."""
    from metacache_mpi_spark.operators.textops import (
        simhash_banded_pairs,
        simhash_dup_pairs,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    brute = {(r["a"], r["b"], r["hamming"])
             for r in simhash_dup_pairs(docs).collect()}
    banded = {(r["a"], r["b"], r["hamming"])
              for r in simhash_banded_pairs(docs, bits=16, bands=4).collect()}
    assert banded == brute and brute  # non-trivial


def test_simhash_banded_default_is_64bit_pipeline_fingerprint(spark):
    """The DEFAULT lane geometry is the scale config: the 64-bit
    pipeline SimHash (functions/sketch.simhash64) banded 4×16 — gated
    against a brute-force hamming scan over the same fingerprints."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.functions.sketch import make_simhash_udf
    from metacache_mpi_spark.operators.textops import simhash_banded_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fp = docs.select(
        "doc_id", make_simhash_udf()(F.col("text")).alias("simhash")
    )
    x, y = fp.alias("x"), fp.alias("y")
    brute = {
        (r["a"], r["b"], r["hamming"])
        for r in x.crossJoin(y)
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .collect()
    }
    banded = {(r["a"], r["b"], r["hamming"])
              for r in simhash_banded_pairs(docs).collect()}
    assert banded == brute and brute  # 64-bit default, pigeonhole-exact


def test_banded_lanes_survive_degenerate_fingerprint_skew(spark):
    """The 100-TB skew hazard: a boilerplate fingerprint shared by a
    huge doc population (all-zero SimHash / one sign pattern) must NOT
    produce an O(n²) bucket task.  bucket_join_pairs counts first and
    drops the oversize bucket (overpopulated-feature rule,
    sketch_database.h:375-395); normal-sized buckets keep their exact
    pairs."""
    import pandas as pd
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.ann import sign_banded_dup_pairs
    from metacache_mpi_spark.operators.textops import simhash_banded_pairs

    n_degenerate = 10_000
    # --- SimHash lane: 10k identical (degenerate) fingerprints + two
    # small genuine near-dup groups below the cap
    fp = pd.DataFrame(
        {
            "doc_id": range(n_degenerate + 4),
            # two planted near-dup pairs, each sharing a NON-degenerate
            # band with its mate: (10000, 10001) collide in band 2
            # (bits 32-47), (10002, 10003) in band 0 (bits 0-15)
            "simhash": [0] * n_degenerate
            + [
                (1 << 40) | 3,
                (1 << 40) | 1,
                (1 << 23) | (1 << 5),
                (1 << 23) | (1 << 22) | (1 << 5),
            ],
        }
    )
    fpdf = spark.createDataFrame(fp, "doc_id long, simhash long")
    got = {
        (r["a"], r["b"])
        for r in simhash_banded_pairs(
            None, fingerprints=fpdf, bits=64, max_bucket=256
        ).collect()
    }
    # degenerate ids (quadratic without the cap) are dropped; the small
    # genuine groups survive with exact hamming verification
    assert got == {(n_degenerate, n_degenerate + 1),
                   (n_degenerate + 2, n_degenerate + 3)}

    # --- sign-LSH lane: 10k copies of one vector + two planted pairs
    base = [1.0] * 64
    neg = [-1.0] * 64
    rows = [(i, base) for i in range(n_degenerate)]
    rows += [(n_degenerate, neg), (n_degenerate + 1, neg)]
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]),
        "vec_id long, embedding array<double>",
    )
    pairs = sign_banded_dup_pairs(
        emb, tau=0.9, bands=16, rows_per_band=2, max_bucket=256
    )
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert got == {(n_degenerate, n_degenerate + 1)}


def test_ann_banded_recall_gate(spark):
    """Sign-LSH banding + exact verify: precision 1.0 by construction,
    recall vs the brute lane gated ≥ 0.99."""
    from metacache_mpi_spark.operators.ann import (
        cosine_dup_pairs,
        sign_banded_dup_pairs,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    brute = {(r["a"], r["b"]): r["cos_micro"]
             for r in cosine_dup_pairs(emb).collect()}
    banded = {(r["a"], r["b"]): r["cos_micro"]
              for r in sign_banded_dup_pairs(emb).collect()}
    assert brute, "fixture has no dup pairs"
    assert set(banded) <= set(brute)  # precision 1.0 (verified subset)
    recall = len(banded) / len(brute)
    assert recall >= 0.99, f"banded recall {recall:.4f} < 0.99"
    assert all(banded[k] == brute[k] for k in banded)  # same exact scores


def test_ground_truth_resolution_chain(spark):
    """classification.cpp:109-131 order: accession.version → accession →
    taxid| header token → gi|N, first hit wins (the reference tries the
    accession lookups BEFORE the header taxid token)."""
    from metacache_mpi_spark.operators.taxonomy import resolve_ground_truth

    qs = spark.createDataFrame(
        [
            (0, "read0 taxid|42 whatever"),            # strategy 3 (token)
            (1, "NC_001422.1 some phage"),              # strategy 1 (version)
            (2, "NC_999999 unversioned acc"),           # strategy 2 (base)
            (3, "gi|777 legacy header"),                # strategy 4 (gi)
            (4, "no markers at all"),                   # unresolved
            (5, "taxid|7 NC_001422.1"),                 # accession BEATS token
        ],
        "qid long, header string",
    )
    mapping = spark.createDataFrame(
        [("NC_001422", "NC_001422.1", 10847, 777), ("NC_999999", "NC_999999.9", 555, 888)],
        "accession string, accession_version string, taxid long, gi long",
    )
    got = {r["qid"]: r["truth_taxid"]
           for r in resolve_ground_truth(qs, mapping).collect()}
    assert got == {0: 42, 1: 10847, 2: 555, 3: 10847, 4: None, 5: 10847}


def test_annotate_with_taxid(spark):
    """mode_annotate.cpp: strip old taxid token, insert taxid|N| after
    the first field separator (or append); unmapped ids annotate 0;
    headers without an id stay untouched."""
    from metacache_mpi_spark.operators.annotate import annotate_with_taxid

    seqs = spark.createDataFrame(
        [
            (0, "NC_001422.1|some phage"),          # insert after 1st sep
            (1, "NC_001422.1 bare header"),          # append
            (2, "NC_999999.9|taxid|123|old marker"), # replace old token
            (3, "no id here at all"),                # untouched
            (4, "AB_123456.2|unmapped acc"),         # taxid 0
        ],
        "record_idx long, header string",
    )
    mapping = spark.createDataFrame(
        [("NC_001422", "NC_001422.1", 10847), ("NC_999999", "NC_999999.9", 555)],
        "accession string, accession_version string, taxid long",
    )
    got = {r["record_idx"]: r["header"]
           for r in annotate_with_taxid(seqs, mapping).collect()}
    assert got[0] == "NC_001422.1|taxid|10847|some phage"
    assert got[1] == "NC_001422.1 bare header|taxid|10847|"
    assert got[2] == "NC_999999.9|taxid|555|old marker"
    assert got[3] == "no id here at all"
    assert got[4] == "AB_123456.2|taxid|0|unmapped acc"


def test_sharded_query_merge_equals_global_index(spark, paired_corpus):
    """The reference's distributed model: DB sharded by target across
    ranks, per-shard query + merge == one global index query
    (mode_merge.cpp:209-264). Features are target-partitioned, so the
    equivalence is exact."""
    from metacache_mpi_spark.operators.genomic import merge_query_results

    targets, queries = paired_corpus
    single = [(q, s1) for q, s1, _ in queries]
    qdf = spark.createDataFrame(single, "qid long, seq string")
    cfg = GenomicConfig(k=8, sketch_size=8, winlen=64, winstride=57,
                        max_candidates=3)

    tdf = spark.createDataFrame(targets, "tgt long, seq string")
    global_res = query_index(qdf, build_index(tdf, cfg), cfg)

    shards = [targets[:2], targets[2:4], targets[4:]]
    shard_results = []
    for sh in shards:
        sdf = spark.createDataFrame(sh, "tgt long, seq string")
        shard_results.append(query_index(qdf, build_index(sdf, cfg), cfg))
    merged = merge_query_results(shard_results, cfg)

    key = lambda rows: sorted(  # noqa: E731
        (r["qid"], r["tgt"], r["hits"], r["win_beg"], r["rank"]) for r in rows
    )
    assert key(merged.collect()) == key(global_res.collect())


def test_ivf_topk_recall(spark):
    """IVF (sample-trained k-means + nprobe probe) recall@10 vs the
    brute cosine lane; probing all lists must reproduce it exactly."""
    from metacache_mpi_spark.operators.ann import (
        cosine_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = train_ivf_centroids(emb, n_centroids=8)
    brute = [r["vec_id"] for r in cosine_topk(emb).collect()]
    ivf = [r["vec_id"] for r in
           ivf_topk(emb, n_centroids=8, nprobe=3, centroids=cents).collect()]
    recall = len(set(brute) & set(ivf)) / len(brute)
    assert recall >= 0.8, f"ivf recall@10 {recall}"
    # probing every list == brute (exactness sanity)
    full = [r["vec_id"] for r in
            ivf_topk(emb, n_centroids=8, nprobe=8, centroids=cents).collect()]
    assert full == brute


def test_sign_banding_selective_in_margin_regime(spark):
    """With a realistic near-dup margin (τ=0.85) the auto-sized banding
    must PRUNE most of the candidate space while keeping recall ≥ 0.99 —
    the selectivity the thin-margin driver fixture cannot exhibit."""
    from metacache_mpi_spark.operators.ann import (
        sign_band_params,
        sign_banded_dup_pairs,
    )

    rng = np.random.RandomState(5)
    base = rng.randn(40, 64)
    vecs = []
    vid = 0
    for i in range(40):
        vecs.append((vid, base[i].tolist())); vid += 1
        # a planted near-dup: small perturbation => cos ~0.97
        vecs.append((vid, (base[i] + 0.25 * rng.randn(64)).tolist())); vid += 1
    for _ in range(320):  # background: independent vectors
        vecs.append((vid, rng.randn(64).tolist())); vid += 1
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")

    tau = 0.85
    bands, rows = sign_band_params(tau)
    assert rows >= 4, f"margin regime must size deep bands, got r={rows}"

    got = {(r["a"], r["b"]) for r in
           sign_banded_dup_pairs(emb, tau=tau).collect()}
    from metacache_mpi_spark.operators.ann import cosine_dup_pairs

    brute = {(r["a"], r["b"]) for r in cosine_dup_pairs(emb, tau=tau).collect()}
    assert len(brute) >= 30
    recall = len(got & brute) / len(brute)
    assert recall >= 0.99, f"recall {recall}"
    assert got <= brute  # exact verify => precision 1.0

    # selectivity: candidate pairs BEFORE verify must be far below n²/2
    n = len(vecs)
    banded = emb.select(
        "vec_id",
        F.posexplode(F.expr(
            "transform(sequence(0, %d), b -> aggregate(sequence(0, %d), 0L, "
            "(acc, r) -> acc + CASE WHEN embedding[b * %d + r] > 0 "
            "THEN shiftleft(1L, r) ELSE 0L END))" % (bands - 1, rows - 1, rows)
        )).alias("band", "bband"),
    )
    x, y = banded.alias("x"), banded.alias("y")
    n_cand = (
        x.join(y, ["band", "bband"])
        .where(F.col("x.vec_id") < F.col("y.vec_id"))
        .select("x.vec_id", "y.vec_id").distinct().count()
    )
    # theory for the auto-sized (b=10, r=5): an orthogonal background
    # pair collides with 1-(1-0.5^5)^10 ≈ 0.27 — assert we sit at that
    # prediction, far below the ~1.0 of the thin-margin regime
    assert n_cand < 0.35 * n * (n - 1) / 2, (
        f"banding not selective: {n_cand} of {n*(n-1)//2} pairs"
    )


def test_pq_topk_recall(spark):
    """Product quantization (sample-trained codebooks, ADC shortlist +
    exact re-rank) recall@10 vs the brute cosine lane; the codes-only
    ADC scan never touches float vectors."""
    from metacache_mpi_spark.operators.ann import (
        cosine_topk,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = train_pq_codebooks(emb, m=16, k=16)
    assert books.shape == (16, 16, 4)
    enc = pq_encode(emb, books)
    # codes are bounded uint8-range ints, one per subspace
    row = enc.select("codes").first()
    assert len(row["codes"]) == 16
    assert all(0 <= c < 16 for c in row["codes"])

    brute = [r["vec_id"] for r in cosine_topk(emb).collect()]
    got = [r["vec_id"] for r in
           pq_topk(emb, codebooks=books, encoded=enc).collect()]
    recall = len(set(brute) & set(got)) / len(brute)
    assert recall >= 0.8, f"pq recall@10 {recall}"
    # ADC-only lane (no re-rank): above chance on this tiny fixture
    # (unclustered vectors are PQ's worst case — the rerank gate above
    # is the production contract; ADC-only is the shortlist generator)
    raw = [r["vec_id"] for r in
           pq_topk(emb, codebooks=books, encoded=enc, rerank=False).collect()]
    assert len(set(brute) & set(raw)) / len(brute) >= 0.2
