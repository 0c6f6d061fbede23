"""Taxonomy: hierarchy dimension + LCA-voting classification.

Reference semantics re-expressed (no code ported):
- NCBI dump parsing (S10): ``nodes.dmp`` / ``names.dmp`` are
  ``\\t|\\t``-delimited (/root/reference/src/taxonomy_io.cpp:56-185).
- lineage walk (G1) and ranked lineage (G2): follow parent ids to the
  root, project onto the fixed rank ladder
  (/root/reference/src/taxonomy.h:601-625,570-597).
- LCA / ranked LCA (G3/G4): first common element of two lineages
  (/root/reference/src/taxonomy.h:504-537).
- LCA-voting classification (A4,
  /root/reference/src/classification.cpp:235-265): unclassified when the
  best candidate has ``hits < hits_min``; otherwise the best candidate
  seeds a running RANKED LCA and every following candidate with
  ``hits > (best_hits - hits_min) * hits_diff_fraction`` (strict) folds
  in; result is null when the fold rises above ``highest_rank``.
- per-taxon counts (A5) and hierarchical abundance (A6,
  /root/reference/src/classification.cpp:362-428).

The taxonomy is a SMALL dimension (the reference replicates it on every
MPI rank, src/sketch_database.h:545-560); here it lives on the driver
and rides into UDFs as a broadcast variable.  Classification itself is
distributed — the reference's rank-0-only finalize bottleneck
(SURVEY.md §3.3) is gone.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

# compact rank ladder, leaf→root (subset of the reference's 21 ranks,
# src/taxonomy.h:47-96; extend freely — positions, not names, matter)
RANKS = [
    "sequence",
    "species",
    "genus",
    "family",
    "order",
    "class",
    "phylum",
    "kingdom",
    "domain",
    "root",
]
RANK_POS = {r: i for i, r in enumerate(RANKS)}


def parse_nodes_dmp(spark: SparkSession, path: str) -> DataFrame:
    """nodes.dmp → (taxid, parent, rank)."""
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), r"\t\|\t?")
    return raw.select(
        parts.getItem(0).cast("long").alias("taxid"),
        parts.getItem(1).cast("long").alias("parent"),
        F.trim(parts.getItem(2)).alias("rank"),
    ).where(F.col("taxid").isNotNull())


def parse_names_dmp(spark: SparkSession, path: str, name_class: str = "scientific name") -> DataFrame:
    """names.dmp → (taxid, name) keeping one name class."""
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), r"\t\|\t?")
    return (
        raw.select(
            parts.getItem(0).cast("long").alias("taxid"),
            F.trim(parts.getItem(1)).alias("name"),
            F.trim(F.regexp_replace(parts.getItem(3), r"\t\|$", "")).alias("name_class"),
        )
        .where(F.col("name_class") == name_class)
        .select("taxid", "name")
    )


@dataclass
class Taxonomy:
    """Driver-side hierarchy with precomputed ranked lineages."""

    parent: dict[int, int]
    rank: dict[int, str]
    name: dict[int, str] = field(default_factory=dict)
    _lineage_cache: dict[int, tuple[int, ...]] = field(default_factory=dict)

    @classmethod
    def from_dataframe(cls, nodes: DataFrame) -> "Taxonomy":
        t = cls(parent={}, rank={}, name={})
        cols = nodes.columns
        for r in nodes.collect():
            t.parent[r["taxid"]] = r["parent"]
            t.rank[r["taxid"]] = r["rank"]
            if "name" in cols and r["name"] is not None:
                t.name[r["taxid"]] = r["name"]
        return t

    # --- G1: full lineage walk (cycle-safe: stops at fixpoint/root)
    def lineage(self, taxid: int) -> tuple[int, ...]:
        if taxid in self._lineage_cache:
            return self._lineage_cache[taxid]
        out = []
        seen = set()
        t = taxid
        while t in self.parent and t not in seen:
            out.append(t)
            seen.add(t)
            p = self.parent[t]
            if p == t:
                break
            t = p
        res = tuple(out)
        self._lineage_cache[taxid] = res
        return res

    # --- G2: ranked lineage (one slot per RANKS position)
    def ranked_lineage(self, taxid: int) -> list[int | None]:
        slots: list[int | None] = [None] * len(RANKS)
        for t in self.lineage(taxid):
            pos = RANK_POS.get(self.rank.get(t, ""), None)
            if pos is not None and slots[pos] is None:
                slots[pos] = t
        return slots

    # --- G3: LCA (first common element of the two lineages)
    def lca(self, a: int, b: int) -> int | None:
        la, lb = self.lineage(a), set(self.lineage(b))
        for t in la:
            if t in lb:
                return t
        return None

    # --- G4: ranked LCA — first common RANKED-lineage slot, leaf→root
    # (/root/reference/src/taxonomy.h:529-537): unlike ``lca``, an
    # unranked common ancestor never surfaces; the fold lands on the
    # next ranked slot both lineages share.
    def ranked_lca(self, a: int, b: int) -> int | None:
        la, lb = self.ranked_lineage(a), self.ranked_lineage(b)
        for ta, tb in zip(la, lb):
            if ta is not None and ta == tb:
                return ta
        return None

    # --- G4: next ranked ancestor at-or-above a rank
    def ancestor_at_rank(self, taxid: int, rank: str) -> int | None:
        want = RANK_POS[rank]
        for t in self.lineage(taxid):
            pos = RANK_POS.get(self.rank.get(t, ""), -1)
            if pos >= want:
                return t
        return None

    def rank_pos(self, taxid: int) -> int:
        return RANK_POS.get(self.rank.get(taxid, ""), len(RANKS))

    # --- G4: position of the NEXT RANKED ancestor (self included) —
    # classification.cpp:115-124 next_ranked_ancestor: an unranked taxon
    # ('no rank' nodes, ubiquitous in real NCBI dumps) counts at the
    # rank of its first ranked ancestor, not as unknown.
    def next_ranked_pos(self, taxid: int) -> int:
        for pos, t in enumerate(self.ranked_lineage(taxid)):
            if t is not None:
                return pos
        return len(RANKS)


def classify_lca(
    candidates: DataFrame,
    taxonomy: Taxonomy,
    target_taxid: dict[int, int] | DataFrame,
    hits_min: int = 1,
    hits_diff_fraction: float = 0.8,
    highest_rank: str = "domain",
) -> DataFrame:
    """A4 LCA-voting over per-query candidates (qid, tgt, hits, rank).

    Distributed: grouped Arrow UDF per query; the taxonomy rides as a
    broadcast variable.  ``target_taxid`` is either a small dict
    (broadcast, the in-memory path) or a ``(tgt, taxid)`` DataFrame
    dim — the scale-safe form at 10^7+ targets: the taxid resolves by
    a relational join (AQE broadcasts it only when it actually fits),
    never through driver memory.
    """
    spark = candidates.sparkSession
    b_tax = spark.sparkContext.broadcast(taxonomy)
    if isinstance(target_taxid, DataFrame):
        b_map = None
        # left join: candidates without a resolvable taxon keep a null
        # _ttax and are skipped below, matching the dict path's
        # "not in tmap" behavior (candidates.h insert(): !cand.tax →
        # no-op)
        candidates = candidates.join(
            target_taxid.select(
                "tgt", F.col("taxid").alias("_ttax")
            ),
            "tgt",
            "left",
        )
    else:
        b_map = spark.sparkContext.broadcast(target_taxid)
    highest = RANK_POS[highest_rank]

    def _classify(pdf: pd.DataFrame) -> pd.DataFrame:
        """Transcribes /root/reference/src/classification.cpp:235-265:
        - best candidate below hitsMin → unclassified;
        - the best candidate seeds the LCA unconditionally; later
          candidates fold in only while hits > threshold (STRICT), where
          threshold = (best - hitsMin) * hitsDiffFraction if best >
          hitsMin else 0 — iteration stops at the first miss (candidates
          are hits-descending);
        - the fold is the RANKED LCA (taxonomy.h ranked_lca), so an
          unranked common ancestor resolves to the next ranked slot
          instead of spuriously unclassifying;
        - a fold above highestRank (or an empty ranked LCA) →
          unclassified."""
        tax: Taxonomy = b_tax.value
        qid = int(pdf["qid"].iloc[0])
        pdf = pdf.sort_values(["hits", "tgt"], ascending=[False, True])
        unclassified = pd.DataFrame(
            {"qid": [qid], "taxid": pd.Series([None], dtype="Int64")}
        )
        # candidates without a resolvable taxon are never inserted into
        # the candidate list (candidates.h insert(): !cand.tax → no-op)
        if b_map is None:
            cands = [
                (int(h), int(t))
                for h, t in zip(pdf["hits"], pdf["_ttax"])
                if pd.notna(t)
            ]
        else:
            tmap = b_map.value
            cands = [
                (int(h), tmap[int(t)])
                for h, t in zip(pdf["hits"], pdf["tgt"])
                if int(t) in tmap
            ]
        if not cands:
            return unclassified
        best = cands[0][0]
        if best < hits_min:
            return unclassified
        threshold = (
            (best - hits_min) * hits_diff_fraction if best > hits_min else 0.0
        )
        result: int | None = cands[0][1]
        for hits, t in cands[1:]:
            if hits <= threshold:
                break
            result = tax.ranked_lca(result, t)
            if result is None or tax.rank_pos(result) > highest:
                return unclassified
        if tax.rank_pos(result) > highest:
            return unclassified
        return pd.DataFrame(
            {"qid": [qid], "taxid": pd.Series([result], dtype="Int64")}
        )

    return candidates.groupBy("qid").applyInPandas(
        _classify, schema="qid long, taxid long"
    )


def resolve_taxids(
    targets: DataFrame,
    mapping: DataFrame,
    accession_col: str = "accession",
) -> DataFrame:
    """J4/J5: resolve target accessions to taxids with the reference's
    fallback chain (/root/reference/src/mode_build.cpp:174-238,
    src/sketch_database.h:631-639): exact accession.version match, then
    version-stripped prefix match — a prefix/theta join normalized into
    two equi joins + coalesce.

    ``mapping``: (accession, accession_version, taxid) — the
    accession2taxid table shape.
    """
    acc = F.col(accession_col)
    base = F.regexp_replace(acc, r"\.\d+$", "")
    t = targets.withColumn("_acc_base", base)
    by_ver = mapping.select(
        F.col("accession_version").alias(accession_col),
        F.col("taxid").alias("_tax_ver"),
    )
    by_acc = mapping.select(
        F.col("accession").alias("_acc_base"),
        F.col("taxid").alias("_tax_base"),
    )
    return (
        t.join(by_ver, accession_col, "left")
        .join(by_acc, "_acc_base", "left")
        .withColumn("taxid", F.coalesce("_tax_ver", "_tax_base"))
        .drop("_acc_base", "_tax_ver", "_tax_base")
    )


def resolve_ground_truth(
    queries: DataFrame,
    mapping: DataFrame | None = None,
    header_col: str = "header",
) -> DataFrame:
    """J6 ground-truth resolution chain
    (/root/reference/src/classification.cpp:109-131 ``ground_truth``):
    per query header, try in the REFERENCE'S order — (1) accession.version
    match, (2) version-stripped accession match, (3) explicit ``taxid|N``
    header token, (4) ``gi|N`` number against the mapping (the stand-in
    for the reference's full-header-name DB lookup; gi is the 4th column
    of the accession2taxid format) — first hit wins, as a left-join +
    coalesce chain (no per-row Python).

    ``mapping``: (accession, accession_version, taxid[, gi]) or None
    (header-token strategy only). Adds ``truth_taxid``.

    Note: the resolved taxid is the RAW mapped id; evaluation lifts it
    to the next ranked ancestor (classification.cpp:115-124) inside
    :func:`~.evaluate.rank_positions` via ``Taxonomy.next_ranked_pos``,
    so 'no rank' truth taxa still count at their first ranked slot.
    """
    from ..sources.bio import accession_from_header, taxid_from_header

    df = queries.withColumn("_tx_hdr", taxid_from_header(header_col))
    if mapping is None:
        return df.withColumn("truth_taxid", F.col("_tx_hdr")).drop("_tx_hdr")
    acc = accession_from_header(header_col)
    df = df.withColumn("_acc", acc).withColumn(
        "_acc_base", F.regexp_replace(acc, r"\.\d+$", "")
    ).withColumn(
        "_gi",
        F.nullif(
            F.regexp_extract(F.col(header_col), r"gi\|(\d+)", 1), F.lit("")
        ).cast("long"),
    )
    by_ver = mapping.select(
        F.col("accession_version").alias("_acc"),
        F.col("taxid").alias("_tx_ver"),
    )
    by_acc = mapping.select(
        F.col("accession").alias("_acc_base"),
        F.col("taxid").alias("_tx_base"),
    )
    out = df.join(by_ver, "_acc", "left").join(by_acc, "_acc_base", "left")
    if "gi" in mapping.columns:
        by_gi = mapping.select(
            F.col("gi").cast("long").alias("_gi"),
            F.col("taxid").alias("_tx_gi"),
        )
        out = out.join(by_gi, "_gi", "left")
    else:
        out = out.withColumn("_tx_gi", F.lit(None).cast("long"))
    return out.withColumn(
        "truth_taxid",
        F.coalesce("_tx_ver", "_tx_base", "_tx_hdr", "_tx_gi"),
    ).drop("_tx_hdr", "_acc", "_acc_base", "_gi", "_tx_ver", "_tx_base", "_tx_gi")


def exclude_clade(
    candidates: DataFrame,
    taxonomy: Taxonomy,
    target_taxid: dict[int, int],
    exclude_taxid: int,
) -> DataFrame:
    """P15 clade-exclusion anti-filter
    (/root/reference/src/classification.cpp:141-157): drop candidate
    hits whose target lies inside the excluded clade (leave-one-clade-
    out evaluation)."""
    inside = {
        tgt
        for tgt, tax in target_taxid.items()
        if exclude_taxid in taxonomy.lineage(tax)
    }
    if not inside:
        return candidates
    return candidates.where(~F.col("tgt").isin(list(inside)))


def exclude_truth_clade(
    matches: DataFrame,
    taxonomy: Taxonomy,
    target_taxid,
    truth: DataFrame,
    rank: str,
) -> DataFrame:
    """P15 per-query clade exclusion (`-exclude <rank>`,
    /root/reference/src/classification.cpp:174-181 +
    ``remove_hits_on_rank`` :141-157): for every query whose ground
    truth is known, drop raw matches whose target's ancestor at
    ``rank`` equals the truth taxon's ancestor at ``rank`` — the
    leave-one-clade-out evaluation filter, applied BEFORE candidate
    aggregation exactly as the reference filters ``allhits``.

    ``target_taxid``: (tgt, taxid) DataFrame or dict.  ``truth``:
    (qid, truth_taxid).  Ancestor lookups run driver-side over the
    DISTINCT taxids only (taxa metadata is driver-resident in the
    reference too, sketch_database.h:545-560 — bounded by the taxonomy
    size) and that small ``(taxid, anc)`` dim broadcasts; the per-QUERY
    table scales with the read corpus and always joins shuffle-hash
    (the query_index_paired span-dim rule), while the per-TARGET side
    broadcasts only when it came in as a driver dict (already resident)
    and is otherwise left to AQE.  Never a per-match Python call.
    Null handling mirrors the reference's pointer equality: a match is
    dropped iff both ancestors resolve equal INCLUDING the both-null
    case; queries with no truth keep all matches.
    """
    spark = matches.sparkSession
    tdim_is_dict = isinstance(target_taxid, dict)
    if tdim_is_dict:
        tdim = spark.createDataFrame(
            list(target_taxid.items()), "tgt long, taxid long"
        )
    else:
        tdim = target_taxid.select("tgt", "taxid")
    taxids = {
        r["taxid"]
        for r in tdim.select("taxid").distinct().collect()
        if r["taxid"] is not None
    } | {
        r["truth_taxid"]
        for r in truth.select("truth_taxid").distinct().collect()
        if r["truth_taxid"] is not None
    }
    anc = spark.createDataFrame(
        [(int(t), taxonomy.ancestor_at_rank(int(t), rank)) for t in taxids],
        "taxid long, anc long",
    )
    # -1 stands in for "no ancestor at this rank" so the equality below
    # reproduces the reference's null == null pointer comparison
    tgt_anc = tdim.join(F.broadcast(anc), "taxid", "left").select(
        "tgt", F.coalesce("anc", F.lit(-1)).alias("_tanc")
    )
    q_anc = truth.join(
        F.broadcast(anc),
        truth["truth_taxid"] == anc["taxid"],
        "left",
    ).select(
        "qid",
        F.when(
            truth["truth_taxid"].isNotNull(),
            F.coalesce("anc", F.lit(-1)),
        ).alias("_qanc"),
    )
    # per-target side: a dict-sourced dim is driver-resident by
    # construction (legacy meta.json maps) — broadcast it so the raw
    # match table (the largest intermediate, filtered BEFORE candidate
    # aggregation) is not shuffled on tgt for a tiny build side; a
    # DataFrame dim scales with the targets, so it is left to AQE
    # (broadcast while it fits, shuffle above).  The per-QUERY side
    # always shuffle-hashes.
    tgt_side = F.broadcast(tgt_anc) if tdim_is_dict else tgt_anc
    return (
        matches.join(tgt_side, "tgt", "left")
        .join(q_anc.hint("shuffle_hash"), "qid", "left")
        .where(
            F.col("_qanc").isNull()
            | F.col("_tanc").isNull()
            | (F.col("_tanc") != F.col("_qanc"))
        )
        .drop("_tanc", "_qanc")
    )


def taxon_counts(assignments: DataFrame) -> DataFrame:
    """A5: reads per assigned taxon."""
    return (
        assignments.where(F.col("taxid").isNotNull())
        .groupBy("taxid")
        .agg(F.count(F.lit(1)).alias("n_queries"))
    )


def abundance_estimate_df(
    assignments: DataFrame,
    taxonomy: Taxonomy,
    rank: str,
) -> DataFrame:
    """A6 hierarchical abundance, DataFrame-first and oracle-gateable
    (/root/reference/src/classification.cpp:362-428): assignment counts
    at/below ``rank`` lift to their ancestor AT that rank; counts
    assigned ABOVE the rank redistribute to the rank-level taxa below
    them, proportionally to those taxa's DIRECT counts.

    Exactness discipline: the proportional shares are fixed-point
    integer micros (``(n · base · 10^6) div total``) so the result is
    order-free and engine-portable — no float accumulation (the
    driver-side :func:`estimate_abundance` keeps the reference's
    sequential float walk; this operator is the distributed one-shot
    restatement, divergence documented there).  Returns
    (taxid, n_direct, abund_micro) for every rank-level taxon with a
    direct count; only the tiny taxonomy dimension is driver-built —
    the assignment table stays distributed.
    """
    spark = assignments.sparkSession
    want = RANK_POS[rank]
    lift_rows = []    # (taxid, pos, anc-at-rank)
    member_rows = []  # (up-ancestor above rank, rank-level taxon)
    for t in taxonomy.parent:
        # next_ranked_pos, not rank_pos: a 'no rank' strain BELOW the
        # rank must take the lift branch (its first ranked ancestor's
        # position), not be mistaken for an above-rank assignment
        pos = taxonomy.next_ranked_pos(t)
        anc = taxonomy.ancestor_at_rank(t, rank)
        lift_rows.append((t, pos, anc))
        if taxonomy.rank_pos(t) == want:
            for u in taxonomy.lineage(t):
                if taxonomy.rank_pos(u) > want and u != t:
                    member_rows.append((u, t))
    lift = spark.createDataFrame(
        pd.DataFrame(lift_rows, columns=["taxid", "pos", "anc"]),
        "taxid long, pos int, anc long",
    )
    members = spark.createDataFrame(
        pd.DataFrame(member_rows, columns=["up", "at"]),
        "up long, at long",
    )
    counts = (
        assignments.where(F.col("taxid").isNotNull())
        .groupBy("taxid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    with_pos = counts.join(F.broadcast(lift), "taxid")
    base = (
        with_pos.where((F.col("pos") <= want) & F.col("anc").isNotNull())
        .groupBy(F.col("anc").alias("at"))
        .agg(F.sum("n").alias("base"))
    )
    above = with_pos.where(F.col("pos") > want).select(
        F.col("taxid").alias("up"), "n"
    )
    shares = (
        above.join(F.broadcast(members), "up")
        .join(base, "at")
    )
    totals = shares.groupBy("up", "n").agg(F.sum("base").alias("tot"))
    contrib = (
        shares.join(totals.select("up", "tot"), "up")
        .select(
            "at",
            # product runs through DECIMAL(38,0): in ANSI mode the
            # BIGINT form throws once n·base exceeds ~9.2e12 (real at
            # corpus scale); `div` on decimals still yields BIGINT, so
            # downstream arithmetic and the DuckDB oracle are unchanged
            F.expr(
                "(cast(n as decimal(38,0)) * base * 1000000) div tot"
            ).alias("c_micro"),
        )
        .groupBy("at")
        .agg(F.sum("c_micro").alias("redist_micro"))
    )
    return (
        base.join(contrib, "at", "left")
        .select(
            F.col("at").alias("taxid"),
            F.col("base").alias("n_direct"),
            (
                F.col("base") * 1000000
                + F.coalesce("redist_micro", F.lit(0))
            ).alias("abund_micro"),
        )
    )


def estimate_abundance(
    counts: list[tuple[int, int]], taxonomy: Taxonomy, rank: str
) -> dict[int, float]:
    """A6: lift counts assigned above ``rank`` down to rank-level taxa,
    distributing proportionally to the rank-level counts below each
    ancestor (driver-side — the dim is tiny, as in the reference's
    single-threaded estimate, /root/reference/src/classification.cpp:362-428).
    """
    want = RANK_POS[rank]
    at_rank: dict[int, float] = {}
    above: list[tuple[int, int]] = []
    for taxid, n in counts:
        pos = taxonomy.rank_pos(taxid)
        if pos <= want:
            anc = taxonomy.ancestor_at_rank(taxid, rank)
            if anc is not None:
                at_rank[anc] = at_rank.get(anc, 0.0) + n
            continue
        above.append((taxid, n))
    for taxid, n in above:
        # children at rank under this ancestor, weighted by their counts
        members = {
            t: c
            for t, c in at_rank.items()
            if taxid in taxonomy.lineage(t)
        }
        total = sum(members.values())
        if total == 0:
            continue
        for t, c in members.items():
            at_rank[t] += n * (c / total)
    return at_rank
