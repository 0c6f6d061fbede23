"""Evaluation operators: confusion statistics + per-rank classification
statistics — first-class DataFrame restatements of the reference's
evaluation mode (``-precision`` / ``-taxon-coverage``).

- :func:`confusion_stats` — per-class TP/FP/FN + sensitivity/precision
  (/root/reference/src/stat_confusion.h:37-130): one groupBy-count per
  axis, joined; all counting is conditional aggregation, fully
  SQL-expressible (the driver oracle mirrors it).
- :func:`pair_recall` — set-level recall/precision of a predicted pair
  list vs a ground-truth pair list (the dup-pair ≥0.99 gate's engine).
- :func:`rank_positions` + :func:`per_rank_stats` — the reference's
  rank-cumulative counters (A9,
  /root/reference/src/classification_statistics.h:91-224): per query,
  the lowest rank assigned / known / correct feeds cumulative
  assigned/known/correct/wrong counts per rank, from which
  sensitivity(r) = correct(r)/known(r) and
  precision(r) = correct(r)/(correct(r)+wrong(r)).

All heavy inputs stay distributed; only the taxonomy dimension rides as
a broadcast (the reference replicates it per rank likewise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .taxonomy import RANKS, Taxonomy

# sentinel position for "no rank" — above root
NONE_POS = len(RANKS)


def confusion_stats(
    df: DataFrame, truth_col: str, pred_col: str
) -> DataFrame:
    """Per-class confusion counts over (truth, pred) label pairs.

    Returns (cls, support, predicted, tp, fp, fn, sensitivity_micro,
    precision_micro); sensitivity = tp/support, precision = tp/predicted
    (fixed-point micros, 0 when the denominator is 0 — the reference's
    guarded ratios, classification_statistics.h:205-215).
    """
    t = F.col(truth_col)
    p = F.col(pred_col)
    labeled = df.select(t.alias("truth"), p.alias("pred"))
    support = labeled.groupBy(F.col("truth").alias("cls")).agg(
        F.count(F.lit(1)).alias("support")
    )
    predicted = labeled.groupBy(F.col("pred").alias("cls")).agg(
        F.count(F.lit(1)).alias("predicted")
    )
    tp = (
        labeled.where(F.col("truth") == F.col("pred"))
        .groupBy(F.col("truth").alias("cls"))
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    joined = (
        support.join(predicted, "cls", "full_outer")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce("support", F.lit(0)).alias("support"),
            F.coalesce("predicted", F.lit(0)).alias("predicted"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    ratio = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0, F.floor(F.col(num) * 1000000.0 / F.col(den))
    ).otherwise(F.lit(0)).cast("long")
    return joined.select(
        "cls",
        "support",
        "predicted",
        "tp",
        (F.col("predicted") - F.col("tp")).alias("fp"),
        (F.col("support") - F.col("tp")).alias("fn"),
        ratio("tp", "support").alias("sensitivity_micro"),
        ratio("tp", "predicted").alias("precision_micro"),
    )


def pair_recall(pred_pairs: DataFrame, truth_pairs: DataFrame) -> dict:
    """Set recall/precision of predicted (a, b) pairs vs ground truth.

    Distributed: two anti/semi joins + counts; returns a small dict
    (tp, fn, fp, recall, precision) — the dup-pair ≥0.99 recall gate.
    Both inputs are canonicalized to a < b before comparison.
    """

    def canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        ).distinct()

    p, t = canon(pred_pairs), canon(truth_pairs)
    tp = p.join(t, ["a", "b"], "left_semi").count()
    fn = t.join(p, ["a", "b"], "left_anti").count()
    fp = p.join(t, ["a", "b"], "left_anti").count()
    return {
        "tp": tp,
        "fn": fn,
        "fp": fp,
        "recall": tp / (tp + fn) if tp + fn else 1.0,
        "precision": tp / (tp + fp) if tp + fp else 1.0,
    }


def pair_set_metrics(pred_pairs: DataFrame, truth_pairs: DataFrame) -> DataFrame:
    """One-row DataFrame restatement of :func:`pair_recall` — the
    dup-pair recall/precision gate as an oracle-gatable operator:
    (tp, fp, fn, precision_micro, recall_micro, f1_micro).

    ONE job instead of pair_recall's three counts: both sides are
    canonicalized (a < b, distinct), full-outer-joined on the pair key
    and reduced in a single aggregate.  Fixed-point micro ratios use
    DECIMAL(38,0) intermediates (a 10^12-pair list × 10^6 brushes the
    BIGINT ceiling); empty denominators report 10^6, matching
    pair_recall's 1.0 convention.
    """

    def canon(df: DataFrame, flag: str) -> DataFrame:
        return (
            df.select(
                F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b"),
            )
            .distinct()
            .withColumn(flag, F.lit(1))
        )

    j = canon(pred_pairs, "in_p").join(
        canon(truth_pairs, "in_t"), ["a", "b"], "full_outer"
    )
    counts = j.agg(
        F.sum(
            F.when(F.col("in_p").isNotNull() & F.col("in_t").isNotNull(), 1)
            .otherwise(0)
        ).cast("long").alias("tp"),
        F.sum(F.when(F.col("in_t").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(F.col("in_p").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
    )

    def _micro(num: str, den: str) -> str:
        return (
            f"CAST(CASE WHEN {den} = 0 THEN 1000000 ELSE "
            f"(CAST({num} AS DECIMAL(38,0)) * 1000000) div ({den}) "
            f"END AS BIGINT)"
        )

    return counts.select(
        "tp",
        "fp",
        "fn",
        F.expr(_micro("tp", "tp + fp")).alias("precision_micro"),
        F.expr(_micro("tp", "tp + fn")).alias("recall_micro"),
        F.expr(_micro("2 * tp", "2 * tp + fp + fn")).alias("f1_micro"),
    )


def clustering_pair_metrics(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "cluster_id",
    truth_col: str = "label",
) -> DataFrame:
    """Pairwise agreement between two clusterings WITHOUT materializing
    any pair: (n_docs, tp_pairs, pred_pairs, truth_pairs,
    precision_micro, recall_micro, rand_micro).

    The Rand-index decomposition over the contingency table: every
    same-cluster pair count is Σ n·(n−1)/2 over group sizes, so ONE
    join+groupBy builds the (pred × truth) joint table and everything
    else is re-aggregation of that tiny frame — a 10^7-member
    mega-cluster contributes one integer, never 10^13 rows.  Pair
    counts use DECIMAL(38,0) (C(10^12, 2) ≈ 5·10^23 overflows BIGINT).
    """
    from ..plans.pinning import pin

    j = pred.select(id_col, F.col(pred_col).alias("pc")).join(
        truth.select(id_col, F.col(truth_col).alias("tc")), id_col
    )
    # the only corpus-sized shuffle; consumed by three re-aggs below
    joint = pin(
        j.groupBy("pc", "tc").agg(F.count(F.lit(1)).alias("n"))
    )
    c2 = "(CAST(n AS DECIMAL(38,0)) * (n - 1)) div 2"
    tp = joint.agg(
        F.sum(F.expr(c2)).cast("decimal(38,0)").alias("tp_pairs"),
        F.sum("n").cast("long").alias("n_docs"),
    )
    pp = (
        joint.groupBy("pc")
        .agg(F.sum("n").alias("n"))
        .agg(F.sum(F.expr(c2)).cast("decimal(38,0)").alias("pred_pairs"))
    )
    tt = (
        joint.groupBy("tc")
        .agg(F.sum("n").alias("n"))
        .agg(F.sum(F.expr(c2)).cast("decimal(38,0)").alias("truth_pairs"))
    )

    def _micro(num: str, den: str) -> str:
        return (
            f"CAST(CASE WHEN {den} = 0 THEN 1000000 ELSE "
            f"({num} * 1000000) div ({den}) END AS BIGINT)"
        )

    total = "(CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1)) div 2"
    # intermediates stay DECIMAL; the EMITTED counts are BIGINT (the
    # contract compares dtypes cross-engine, and HUGEINT→pandas is
    # lossy) — at 10^12-doc scale read the micro ratios, which cannot
    # overflow
    return (
        tp.crossJoin(pp)
        .crossJoin(tt)
        .select(
            "n_docs",
            F.col("tp_pairs").cast("long").alias("tp_pairs"),
            F.col("pred_pairs").cast("long").alias("pred_pairs"),
            F.col("truth_pairs").cast("long").alias("truth_pairs"),
            F.expr(_micro("tp_pairs", "pred_pairs")).alias(
                "precision_micro"
            ),
            F.expr(_micro("tp_pairs", "truth_pairs")).alias("recall_micro"),
            F.expr(
                _micro(
                    f"({total} - pred_pairs - truth_pairs + 2 * tp_pairs)",
                    total,
                )
            ).alias("rand_micro"),
        )
    )


def rank_positions(
    assignments_with_truth: DataFrame,
    taxonomy: Taxonomy,
) -> DataFrame:
    """(qid, taxid, truth_taxid) → (qid, assigned_pos, known_pos,
    correct_pos): the three per-query rank positions feeding the
    reference's counters (classification_statistics.h:91-120):

    - assigned_pos — rank of the assignment (NONE_POS if unclassified);
    - known_pos    — rank of the ground truth LIFTED to its next ranked
      ancestor (classification.cpp:115-124 next_ranked_ancestor: a
      'no rank' truth taxon counts at its first ranked lineage slot,
      not as unknown — NONE_POS only when truth is absent or has no
      ranked ancestor);
    - correct_pos  — rank of ranked_lca(assigned, truth), clamped to be
      no more specific than either input rank (the reference's
      plausibility clamp).
    """
    spark = assignments_with_truth.sparkSession
    b_tax = spark.sparkContext.broadcast(taxonomy)

    import pandas as pd

    def _pos(batches):
        tax: Taxonomy = b_tax.value
        for pdf in batches:
            a_pos, k_pos, c_pos = [], [], []
            for pred, truth in zip(pdf["taxid"], pdf["truth_taxid"]):
                ap = NONE_POS if pd.isna(pred) else tax.rank_pos(int(pred))
                # ground truth lifts to the next ranked ancestor (for a
                # ranked taxon this is its own rank)
                kp = (
                    NONE_POS
                    if pd.isna(truth)
                    else tax.next_ranked_pos(int(truth))
                )
                if pd.isna(pred) or pd.isna(truth):
                    cp = NONE_POS
                else:
                    lca = tax.ranked_lca(int(pred), int(truth))
                    cp = NONE_POS if lca is None else tax.rank_pos(lca)
                cp = max(cp, ap, kp)  # plausibility clamp
                a_pos.append(ap)
                k_pos.append(kp)
                c_pos.append(cp)
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"],
                    "assigned_pos": pd.Series(a_pos, dtype="int32"),
                    "known_pos": pd.Series(k_pos, dtype="int32"),
                    "correct_pos": pd.Series(c_pos, dtype="int32"),
                }
            )

    return assignments_with_truth.select(
        "qid", "taxid", "truth_taxid"
    ).mapInPandas(
        _pos,
        schema="qid long, assigned_pos int, known_pos int, correct_pos int",
    )


def per_rank_stats(pos_df: DataFrame) -> DataFrame:
    """Rank-cumulative counters + sensitivity/precision per rank.

    Transcribes classification_statistics.h:91-224: a query counts as
    assigned/known/correct at every rank ≥ its per-query position, and
    as wrong at every rank BELOW its correct position when the correct
    rank is strictly above both the known and assigned ranks.
    """
    spark = pos_df.sparkSession
    ranks = spark.createDataFrame(
        [(i, r) for i, r in enumerate(RANKS)], "pos int, rank string"
    )
    # tiny dim × per-query rows: broadcast cross join, conditional sums
    crossed = pos_df.crossJoin(F.broadcast(ranks))
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    r = F.col("pos")
    agg = crossed.groupBy("pos", "rank").agg(
        F.count(F.lit(1)).alias("total"),
        cnt(F.col("assigned_pos") <= r).alias("assigned"),
        cnt(F.col("known_pos") <= r).alias("known"),
        cnt(
            (F.col("known_pos") < NONE_POS) & (F.col("correct_pos") <= r)
        ).alias("correct"),
        cnt(
            (F.col("known_pos") < NONE_POS)
            & (F.col("correct_pos") > F.col("known_pos"))
            & (F.col("correct_pos") > F.col("assigned_pos"))
            & (r < F.col("correct_pos"))
        ).alias("wrong"),
    )
    ratio = lambda num, den: F.when(  # noqa: E731
        den > 0, F.floor(num * 1000000.0 / den)
    ).otherwise(F.lit(0)).cast("long")
    return agg.select(
        "rank",
        F.col("pos").alias("rank_pos"),
        "total",
        "assigned",
        "known",
        "correct",
        "wrong",
        ratio(F.col("correct"), F.col("known")).alias("sensitivity_micro"),
        ratio(
            F.col("correct"), F.col("correct") + F.col("wrong")
        ).alias("precision_micro"),
    )


def coverage_stats(
    assignments_with_truth: DataFrame,
    taxonomy: Taxonomy,
    covered_taxa: frozenset[int] | set[int],
) -> DataFrame:
    """Per-rank DB-coverage confusion counters — the reference's
    ``-taxon-coverage`` mode (/root/reference/src/classification.cpp:
    294-320 ``update_coverage_statistics`` feeding
    src/stat_confusion.h:37-130).  For every query with resolved ground
    truth, each RANKED taxon in the truth's lineage is scored by
    (is it covered by the DB) × (was the query classified at a rank at
    least as specific):

    ====================  =================  ===================
    ..                    classified@rank    unclassified@rank
    ====================  =================  ===================
    DB covers taxon       tp                 fn
    DB lacks taxon        fp                 tn
    ====================  =================  ===================

    "classified on rank r" transcribes the reference's
    ``!(!best || r < best->rank())``: an assignment exists and its rank
    is not LESS specific than r.  Queries without ground truth are
    skipped (classification.cpp:299 early return).

    Input: (taxid [assignment, nullable], truth_taxid [nullable]).
    ``covered_taxa``: the taxids covered by any DB target — the union
    of the targets' lineages (sketch_database.h:784-800 ``covers``),
    bounded by the taxonomy size, rides as one broadcast.

    Output: one row per rank with ≥1 counted lineage taxon —
    (rank, rank_pos, tp, fp, tn, fn, accuracy_micro, sensitivity_micro,
    specificity_micro), micros floor-fixed-point with the reference's
    guarded-denominator rule (0 when the denominator is 0).

    Scale shape: the pandas stage emits PARTIAL per-rank counters per
    Arrow batch (≤ len(RANKS) rows each — a hand-rolled map-side
    combine), so the single groupBy(rank) shuffle carries
    O(batches × ranks) rows, never O(queries × ranks).
    """
    import pandas as pd

    spark = assignments_with_truth.sparkSession
    b_tax = spark.sparkContext.broadcast(taxonomy)
    b_cov = spark.sparkContext.broadcast(frozenset(covered_taxa))

    def _partials(batches):
        tax: Taxonomy = b_tax.value
        cov = b_cov.value
        for pdf in batches:
            counts: dict[int, list[int]] = {}
            for pred, truth in zip(pdf["taxid"], pdf["truth_taxid"]):
                if pd.isna(truth):
                    continue
                a_pos = (
                    NONE_POS if pd.isna(pred) else tax.rank_pos(int(pred))
                )
                for p, t in enumerate(tax.ranked_lineage(int(truth))):
                    if t is None:
                        continue
                    c = counts.setdefault(p, [0, 0, 0, 0])
                    classified = a_pos <= p
                    if t in cov:
                        c[0 if classified else 3] += 1
                    else:
                        c[1 if classified else 2] += 1
            if counts:
                pos = sorted(counts)
                yield pd.DataFrame(
                    {
                        "pos": pos,
                        "tp": [counts[p][0] for p in pos],
                        "fp": [counts[p][1] for p in pos],
                        "tn": [counts[p][2] for p in pos],
                        "fn": [counts[p][3] for p in pos],
                    }
                )

    part = assignments_with_truth.select("taxid", "truth_taxid").mapInPandas(
        _partials, "pos int, tp long, fp long, tn long, fn long"
    )
    agg = part.groupBy("pos").agg(
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("tn").alias("tn"),
        F.sum("fn").alias("fn"),
    )
    ratio = lambda num, den: F.when(  # noqa: E731
        den > 0, F.floor(num * 1000000.0 / den)
    ).otherwise(F.lit(0)).cast("long")
    rank_names = F.array(*[F.lit(r) for r in RANKS])
    total = F.col("tp") + F.col("fp") + F.col("tn") + F.col("fn")
    return agg.select(
        F.element_at(rank_names, F.col("pos") + 1).alias("rank"),
        F.col("pos").cast("long").alias("rank_pos"),
        "tp",
        "fp",
        "tn",
        "fn",
        ratio(F.col("tp") + F.col("tn"), total).alias("accuracy_micro"),
        ratio(F.col("tp"), F.col("tp") + F.col("fn")).alias(
            "sensitivity_micro"
        ),
        ratio(F.col("tn"), F.col("tn") + F.col("fp")).alias(
            "specificity_micro"
        ),
    )


def db_covered_taxa(taxonomy: Taxonomy, target_taxids) -> frozenset[int]:
    """The DB-coverage set for :func:`coverage_stats`: every taxid on
    the lineage of any target's taxon (sketch_database.h:784-800
    ``covers`` walks each Sequence-rank taxon's lineage).  Driver-side
    and bounded by the taxonomy size — the same replication bound the
    reference accepts for its taxa cache."""
    covered: set[int] = set()
    for t in target_taxids:
        if t is None:
            continue
        covered.update(taxonomy.lineage(int(t)))
    return frozenset(covered)
