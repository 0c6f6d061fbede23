"""Taxonomy hierarchy + LCA-voting classification (G1-G4, A4-A6, S10)
vs literal oracles of /root/reference/src/taxonomy.h + classification.cpp
semantics."""

from __future__ import annotations

import pytest

from metacache_mpi_spark.operators.taxonomy import (
    Taxonomy,
    classify_lca,
    estimate_abundance,
    parse_names_dmp,
    parse_nodes_dmp,
    taxon_counts,
)

#        1 root
#        2 domain
#     3 phylum
#    4 genus        8 genus
#  5,6 species      9 species
#  (7 species under 6? no — keep flat)
NODES = {
    1: (1, "root"),
    2: (1, "domain"),
    3: (2, "phylum"),
    4: (3, "genus"),
    8: (3, "genus"),
    5: (4, "species"),
    6: (4, "species"),
    9: (8, "species"),
}


@pytest.fixture(scope="module")
def tax():
    return Taxonomy(
        parent={t: p for t, (p, _) in NODES.items()},
        rank={t: r for t, (_, r) in NODES.items()},
    )


def test_lineage_and_ranked(tax):
    assert tax.lineage(5) == (5, 4, 3, 2, 1)
    rl = tax.ranked_lineage(5)
    from metacache_mpi_spark.operators.taxonomy import RANK_POS

    assert rl[RANK_POS["species"]] == 5
    assert rl[RANK_POS["genus"]] == 4
    assert rl[RANK_POS["phylum"]] == 3
    assert rl[RANK_POS["family"]] is None


def test_lca(tax):
    assert tax.lca(5, 6) == 4      # same genus
    assert tax.lca(5, 9) == 3      # cross-genus -> phylum
    assert tax.lca(5, 5) == 5
    assert tax.ancestor_at_rank(5, "genus") == 4
    assert tax.ancestor_at_rank(5, "phylum") == 3


def test_classify_lca_agreement_and_fold(spark, tax):
    tmap = {10: 5, 11: 6, 12: 9}
    # q0: both candidates same genus -> genus 4
    # q1: single strong candidate -> species 5
    # q2: cross-phylum... cross-genus fold -> phylum 3 (<= domain, kept)
    cands = spark.createDataFrame(
        [
            (0, 10, 10, 0, 1), (0, 11, 9, 0, 2),
            (1, 10, 12, 0, 1), (1, 12, 2, 0, 2),   # 2 < threshold -> ignored
            (2, 10, 8, 0, 1), (2, 12, 8, 0, 2),
        ],
        "qid long, tgt long, hits long, win_beg long, rank int",
    )
    got = {
        r["qid"]: r["taxid"]
        for r in classify_lca(cands, tax, tmap, hits_min=4,
                              hits_diff_fraction=0.8).collect()
    }
    # q1 threshold = (12-4)*0.8 = 6.4 -> candidate with hits=2 excluded
    assert got == {0: 4, 1: 5, 2: 3}


def test_classify_above_highest_rank_unclassified(spark, tax):
    # force fold to root (above highest_rank=phylum) -> null
    tax2 = Taxonomy(parent=dict(tax.parent), rank=dict(tax.rank))
    tax2.parent[42] = 1
    tax2.rank[42] = "domain"
    tmap = {10: 5, 13: 42}
    cands = spark.createDataFrame(
        [(7, 10, 8, 0, 1), (7, 13, 8, 0, 2)],
        "qid long, tgt long, hits long, win_beg long, rank int",
    )
    got = classify_lca(cands, tax2, tmap, hits_min=1,
                       hits_diff_fraction=0.5, highest_rank="phylum").collect()
    assert got[0]["taxid"] is None


def test_taxon_counts_and_abundance(spark, tax):
    assigns = spark.createDataFrame(
        [(0, 5), (1, 5), (2, 6), (3, 4), (4, 9), (5, None)],
        "qid long, taxid long",
    )
    counts = {r["taxid"]: r["n_queries"] for r in taxon_counts(assigns).collect()}
    assert counts == {5: 2, 6: 1, 4: 1, 9: 1}
    ab = estimate_abundance(list(counts.items()), tax, "species")
    # genus-4 count (1) redistributed 2:1 between species 5 and 6
    assert ab[5] == pytest.approx(2 + 2 / 3)
    assert ab[6] == pytest.approx(1 + 1 / 3)
    assert ab[9] == pytest.approx(1.0)


def test_parent_reassignment_rebuild(spark, tax):
    """G5: moving a node to a new parent = rebuild + re-broadcast of the
    (tiny) taxonomy dimension — lineage, ranked LCA and downstream
    classification all follow the new edge."""
    moved = Taxonomy(parent=dict(tax.parent), rank=dict(tax.rank))
    moved.parent[9] = 4   # species 9: genus 8 -> genus 4
    assert tax.lineage(9) == (9, 8, 3, 2, 1)
    assert moved.lineage(9) == (9, 4, 3, 2, 1)
    assert tax.ranked_lca(5, 9) == 3      # cross-genus -> phylum
    assert moved.ranked_lca(5, 9) == 4    # now same genus
    cands = spark.createDataFrame(
        [(0, 10, 8, 0, 1), (0, 12, 8, 0, 2)],
        "qid long, tgt long, hits long, win_beg long, rank int",
    )
    tmap = {10: 5, 12: 9}
    before = classify_lca(cands, tax, tmap, hits_min=1).collect()[0]["taxid"]
    after = classify_lca(cands, moved, tmap, hits_min=1).collect()[0]["taxid"]
    assert (before, after) == (3, 4)


def test_abundance_estimate_df_matches_driver_walk(spark, tax):
    """The distributed fixed-point operator reproduces the driver-side
    reference walk (micros of the float result) on a single-level
    redistribution, and lifts 'no rank' sub-species assignments."""
    from metacache_mpi_spark.operators.taxonomy import abundance_estimate_df

    tax2 = Taxonomy(parent=dict(tax.parent), rank=dict(tax.rank))
    tax2.parent[77] = 5          # 'no rank' strain under species 5
    tax2.rank[77] = "no rank"
    assigns = spark.createDataFrame(
        [(0, 5), (1, 77), (2, 6), (3, 4), (4, 9), (5, None)],
        "qid long, taxid long",
    )
    got = {r["taxid"]: r.asDict()
           for r in abundance_estimate_df(assigns, tax2, "species").collect()}
    # direct: 5→2 (one via strain lift), 6→1, 9→1; genus 4 (n=1)
    # redistributes 2:1 over {5, 6}
    assert got[5]["n_direct"] == 2
    assert got[5]["abund_micro"] == 2_000_000 + (1 * 2 * 1_000_000) // 3
    assert got[6]["abund_micro"] == 1_000_000 + (1 * 1 * 1_000_000) // 3
    assert got[9]["abund_micro"] == 1_000_000
    # micros agree with the driver-side float walk (same inputs)
    ab = estimate_abundance([(5, 2), (6, 1), (4, 1), (9, 1)], tax2, "species")
    for t in (5, 6, 9):
        assert abs(got[t]["abund_micro"] - round(ab[t] * 1_000_000)) <= 1


def test_parse_dmp_files(spark, tmp_path):
    nodes = tmp_path / "nodes.dmp"
    nodes.write_text(
        "1\t|\t1\t|\troot\t|\n2\t|\t1\t|\tdomain\t|\n5\t|\t2\t|\tspecies\t|\n"
    )
    names = tmp_path / "names.dmp"
    names.write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "5\t|\tEscherichia demo\t|\t\t|\tscientific name\t|\n"
        "5\t|\tE. demo\t|\t\t|\tsynonym\t|\n"
    )
    nd = {r["taxid"]: (r["parent"], r["rank"]) for r in parse_nodes_dmp(spark, str(nodes)).collect()}
    assert nd == {1: (1, "root"), 2: (1, "domain"), 5: (2, "species")}
    nm = {r["taxid"]: r["name"] for r in parse_names_dmp(spark, str(names)).collect()}
    assert nm == {1: "root", 5: "Escherichia demo"}


def test_classify_reference_rules(spark, tax):
    """Literal transcription of classification.cpp:239-262: (1) best
    hits < hitsMin -> unclassified; (2) the include threshold is STRICT
    (hits > threshold); (3) the fold is the RANKED lca."""
    tmap = {50: 5, 60: 6, 90: 9}
    # (1) best candidate below hitsMin -> unclassified
    cands = spark.createDataFrame([(1, 50, 2)], "qid long, tgt long, hits long")
    (row,) = classify_lca(cands, tax, tmap, hits_min=3).collect()
    assert row["taxid"] is None
    # (2) threshold = (best - hitsMin) * fraction = (10-2)*0.5 = 4:
    # second candidate with hits == 4 is NOT included (strict >), so the
    # result stays at species 5, not genus lca(5,6)=4
    cands = spark.createDataFrame(
        [(2, 50, 10), (2, 60, 4)], "qid long, tgt long, hits long"
    )
    (row,) = classify_lca(
        cands, tax, tmap, hits_min=2, hits_diff_fraction=0.5
    ).collect()
    assert row["taxid"] == 5
    # ... and with hits == 5 (> threshold) it IS included -> genus 4
    cands = spark.createDataFrame(
        [(3, 50, 10), (3, 60, 5)], "qid long, tgt long, hits long"
    )
    (row,) = classify_lca(
        cands, tax, tmap, hits_min=2, hits_diff_fraction=0.5
    ).collect()
    assert row["taxid"] == 4


def test_classify_ranked_lca_skips_unranked(spark):
    """An unranked first common ancestor must resolve to the next RANKED
    ancestor (taxonomy.h ranked_lca), not spuriously unclassify."""
    # 5,6 -> unranked clade 4 -> genus 3 -> root 1
    t = Taxonomy(
        parent={1: 1, 3: 1, 4: 3, 5: 4, 6: 4},
        rank={1: "root", 3: "genus", 4: "clade", 5: "species", 6: "species"},
    )
    assert t.ranked_lca(5, 6) == 3  # full lca would be the unranked 4
    cands = spark.createDataFrame(
        [(1, 50, 10), (1, 60, 10)], "qid long, tgt long, hits long"
    )
    (row,) = classify_lca(cands, t, {50: 5, 60: 6}, hits_min=1).collect()
    assert row["taxid"] == 3
