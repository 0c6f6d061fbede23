"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 over the driver's parquet tables; ``oracle_sql()`` gives
the DuckDB-equivalent ANSI SQL.  Engine-parity discipline:

- hashes are md5 hex strings (identical in both engines; MinHash min is
  lexicographic string-min);
- float aggregates are emitted as fixed-point BIGINTs; decimal sums are
  exact-decimal in both engines;
- every computed column is aliased identically on both sides.

Entries without an oracle (``pipeline_*``) run the production pandas-UDF
pipeline (non-SQL-expressible custom hashing) — rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver table; the testdata tables are single parquet files,
    which Spark scans as ONE input split — repartition immediately so
    downstream per-row work (shingling, hashing) uses every core.  (At
    cluster scale inputs arrive pre-split; this mirrors that.)"""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return df.repartition(spark.sparkContext.defaultParallelism)


# ---------------------------------------------------------------------------
# shared DuckDB SQL fragments
# ---------------------------------------------------------------------------

# distinct 8-char shingles per document (DuckDB unnest(range()) lateral)
_SH_CTE = """
pos AS (SELECT doc_id, text, unnest(range(1, length(text) - 6)) AS i
        FROM documents WHERE length(text) >= 8),
sh0 AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 8) AS sh FROM pos)
"""

# df-capped discriminative shingles (stop-shingle removal, cap=100)
_DISC_CTE = (
    _SH_CTE
    + """,
keep AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 100),
disc AS (SELECT sh0.doc_id, sh0.sh FROM sh0 JOIN keep USING (sh))
"""
)

# verified jaccard pairs at tau=0.5 over discriminative shingles
_PAIRS_CTE = (
    _DISC_CTE
    + """,
sizes AS (SELECT doc_id, count(*) AS n FROM disc GROUP BY doc_id),
inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
          FROM disc x JOIN disc y USING (sh)
          WHERE x.doc_id < y.doc_id GROUP BY 1, 2),
jpairs AS (SELECT a, b, c, sa.n AS na, sb.n AS nb
           FROM inter JOIN sizes sa ON sa.doc_id = a
                      JOIN sizes sb ON sb.doc_id = b
           WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5)
"""
)

# W-token span windows for the ExactSubstr lane (operators/spans.py,
# SPAN_W=8): per-position md5, corpus-global occurrence count, keeper =
# globally-first occurrence (row_number twin of the engine's min-struct
# agg), strip intervals merged when overlapping or adjacent
_SPANS_CTE = """
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
occ AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
               md5(array_to_string(
                 list_slice(w, CAST(i AS INT), CAST(i AS INT) + 7), ' ')) AS h
        FROM toks, unnest(range(1, len(w) - 6)) AS t(i)
        WHERE len(w) >= 8),
srn AS (SELECT doc_id, pos, h,
               count(*) OVER (PARTITION BY h) AS n_occurrences,
               row_number() OVER (PARTITION BY h
                                  ORDER BY doc_id, pos) AS rn
        FROM occ),
sp_iv AS (SELECT doc_id, pos AS s, pos + 7 AS e FROM srn WHERE rn >= 2),
sp_m1 AS (SELECT doc_id, s, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS pm
          FROM sp_iv),
sp_m2 AS (SELECT doc_id, s, e,
           sum(CASE WHEN pm IS NULL OR s > pm + 1 THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS gid
          FROM sp_m1),
sp_merged AS (SELECT doc_id, min(s) AS s, max(e) AS e
              FROM sp_m2 GROUP BY doc_id, gid)
"""

# the band/bucket tail of _BUCKETS_CTE without its _SH_CTE prefix, for
# oracles that need the pair lane AND the bucket lane in one WITH
# (string surgery is deliberate: one source of truth for the fragment)
def _buckets_after_sh() -> str:
    # fail LOUDLY at call time if the literal-prefix construction of
    # _BUCKETS_CTE ever drifts (a whitespace edit is enough) — slicing
    # on a wrong prefix would silently yield garbled oracle SQL
    assert _BUCKETS_CTE.startswith(_SH_CTE), (
        "_BUCKETS_CTE no longer starts with _SH_CTE; "
        "_buckets_after_sh() slicing is invalid"
    )
    return _BUCKETS_CTE[len(_SH_CTE):]


# md5-string minhash, 8 lanes
_MINHASH_CTE = (
    _SH_CTE
    + """,
laned AS (SELECT doc_id, unnest(range(0, 8)) AS lane, sh FROM sh0),
mh AS (SELECT doc_id, lane,
              min(md5(concat(CAST(lane AS VARCHAR), ':', sh))) AS minh
       FROM laned GROUP BY doc_id, lane)
"""
)

_BUCKETS_CTE = (
    _MINHASH_CTE
    + """,
buckets AS (SELECT doc_id, CAST(floor(lane / 2) AS BIGINT) AS band,
                   string_agg(minh, '|' ORDER BY lane) AS bucket
            FROM mh GROUP BY doc_id, floor(lane / 2))
"""
)

# md5-mode pipeline funnel (sketch_mode="md5", k=8, s=8, 4 bands × 2
# rows, bucket cap 254): capped band-bucket candidates, the
# ≥min_sig_lanes (4) signature-estimate gate, and the τ=0.6 exact
# shingle-Jaccard verify — the DuckDB twin of dedup_pipeline's funnel
_MD5_PIPE_CTE = (
    _BUCKETS_CTE
    + """,
bsizes AS (SELECT band, bucket, count(*) AS n FROM buckets
           GROUP BY band, bucket),
bkeep AS (SELECT band, bucket FROM bsizes WHERE n BETWEEN 2 AND 254),
cands AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS band_hits
          FROM buckets x JOIN bkeep USING (band, bucket)
          JOIN buckets y USING (band, bucket)
          WHERE x.doc_id < y.doc_id GROUP BY x.doc_id, y.doc_id)
"""
)

_MD5_PIPE_VERIFIED_CTE = (
    _MD5_PIPE_CTE
    + """,
gated AS (SELECT c.a, c.b FROM cands c
          JOIN mh ma ON ma.doc_id = c.a
          JOIN mh mb ON mb.doc_id = c.b AND mb.lane = ma.lane
          WHERE ma.minh = mb.minh
          GROUP BY c.a, c.b HAVING count(*) >= 4),
gsh AS (SELECT * FROM sh0
        WHERE doc_id IN (SELECT a FROM gated UNION SELECT b FROM gated)),
ginter AS (SELECT g.a, g.b, count(*) AS c
           FROM gated g JOIN gsh x ON x.doc_id = g.a
           JOIN gsh y ON y.doc_id = g.b AND y.sh = x.sh
           GROUP BY g.a, g.b),
gsz AS (SELECT doc_id, count(*) AS n FROM sh0 GROUP BY doc_id),
mpairs AS (SELECT i.a, i.b FROM ginter i
           JOIN gsz sa ON sa.doc_id = i.a JOIN gsz sb ON sb.doc_id = i.b
           WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.6)
"""
)

# ---- query-probe oracle fragments (shared by index_query_probe and
# its ranked top-k twin — one source of truth for the fixture and the
# md5 probe lifecycle) --------------------------------------------------
_QPROBE_IDX_CTE = """idx AS (
  SELECT doc_id, 'd/' || CAST(doc_id AS VARCHAR) AS url, text
  FROM documents
  WHERE doc_id % 4 <> 0
    AND text IS NOT NULL AND length(text) > 0)"""

_QPROBE_QN_SQL = """SELECT d.doc_id + 100000000 AS qid,
       'q/' || CAST(d.doc_id AS VARCHAR) AS url,
       CASE WHEN d.doc_id % 8 = 0 THEN d.text
            ELSE coalesce(d2.text, d.text) END AS text
FROM documents d
LEFT JOIN documents d2 ON d2.doc_id = d.doc_id + 1
WHERE d.doc_id % 4 = 0"""

# from (idx, nov) to `best`: md5 minhash → band buckets → state-side
# cap → cross candidates → ≥4-lane gate → exact shingle Jaccard ≥ 0.6
# → ranked matches per query (j DESC, a ASC)
_QPROBE_LIFECYCLE_CTE = """u AS (SELECT doc_id AS id, text FROM idx
      UNION ALL SELECT qid, text FROM nov),
posq AS (SELECT id, text,
                unnest(range(1, length(text) - 6)) AS i
         FROM u WHERE length(text) >= 8),
shq AS (SELECT DISTINCT id,
               substr(text, CAST(i AS INT), 8) AS sh
        FROM posq),
laned AS (SELECT id, unnest(range(0, 8)) AS lane, sh FROM shq),
mh AS (SELECT id, lane,
              min(md5(concat(CAST(lane AS VARCHAR), ':', sh)))
                AS minh
       FROM laned GROUP BY id, lane),
bkt AS (SELECT id, CAST(floor(lane / 2) AS BIGINT) AS band,
               string_agg(minh, '|' ORDER BY lane) AS bucket
        FROM mh GROUP BY id, floor(lane / 2)),
sb AS (SELECT band, bucket
       FROM bkt JOIN idx ON idx.doc_id = bkt.id
       GROUP BY band, bucket HAVING count(*) <= 254),
cand AS (SELECT DISTINCT si.id AS a, qi.id AS b
         FROM bkt si
         JOIN sb USING (band, bucket)
         JOIN bkt qi USING (band, bucket)
         JOIN idx ON idx.doc_id = si.id
         JOIN nov ON nov.qid = qi.id
         WHERE si.id <> qi.id),
gated AS (SELECT c.a, c.b FROM cand c
          JOIN mh ma ON ma.id = c.a
          JOIN mh mb ON mb.id = c.b AND mb.lane = ma.lane
          WHERE ma.minh = mb.minh
          GROUP BY c.a, c.b HAVING count(*) >= 4),
gsz AS (SELECT id, count(*) AS n FROM shq GROUP BY id),
ginter AS (SELECT g.a, g.b, count(*) AS c
           FROM gated g
           JOIN shq x ON x.id = g.a
           JOIN shq y ON y.id = g.b AND y.sh = x.sh
           GROUP BY g.a, g.b),
ver AS (SELECT i.a, i.b,
               CAST(i.c AS DOUBLE) / (sa.n + sb2.n - i.c) AS j
        FROM ginter i
        JOIN gsz sa ON sa.id = i.a
        JOIN gsz sb2 ON sb2.id = i.b
        WHERE CAST(i.c AS DOUBLE) / (sa.n + sb2.n - i.c)
              >= 0.6),
best AS (SELECT b AS qid, a AS m,
                CAST(floor(j * 1000) AS BIGINT) AS jm,
                row_number() OVER (PARTITION BY b
                                   ORDER BY j DESC, a ASC)
                  AS rn
         FROM ver)"""

# crawl-diff oracle fragment shared by `crawl_diff` and
# `crawl_diff_scored` (the SQL mirror of _crawl_fixture + crawl_diff's
# join/status logic): d/old/new/j with both texts carried on j
_CRAWL_DIFF_CTE = """d AS (
  SELECT doc_id,
         'https://' || source || '.example/d' ||
           CAST(doc_id AS VARCHAR) AS url,
         text
  FROM documents),
old AS (SELECT url, md5(coalesce(text, '')) AS oh,
               doc_id AS old_doc_id, text AS otext
        FROM d WHERE doc_id % 3 <> 0),
new AS (SELECT url,
               md5(coalesce(CASE WHEN doc_id % 5 = 0
                                 THEN reverse(text)
                                 ELSE text END, '')) AS nh,
               doc_id AS new_doc_id,
               CASE WHEN doc_id % 5 = 0 THEN reverse(text)
                    ELSE text END AS ntext
        FROM d WHERE doc_id % 3 <> 1),
j AS (SELECT coalesce(old.url, new.url) AS url,
             CASE WHEN oh IS NULL THEN 'added'
                  WHEN nh IS NULL THEN 'removed'
                  WHEN oh <> nh THEN 'changed'
                  ELSE 'unchanged' END AS status,
             old_doc_id, new_doc_id, otext, ntext
      FROM old FULL OUTER JOIN new ON old.url = new.url)"""

# connected-components tail over `mpairs` (md5 pipeline funnel) shared
# by `pipeline_clusters` and `source_dup_stats`
_MD5_CLUSTERS_CTE = """sym AS (SELECT a AS u, b AS v FROM mpairs
       UNION SELECT b, a FROM mpairs),
reach(node, m) AS (
    SELECT doc_id, doc_id FROM documents
    WHERE text IS NOT NULL AND length(text) > 0
    UNION
    SELECT s.u, r.m FROM sym s JOIN reach r ON r.node = s.v
),
cl AS (SELECT node AS doc_id, min(m) AS cluster_id
       FROM reach GROUP BY node)"""

_HEX_HIGH = "('8','9','a','b','c','d','e','f')"

# windowed bottom-4 md5 sketch of the documents table as a genomic
# index (k=8, s=4, winlen=64, stride=57) — shared by both genomic md5
# oracle entries
_GENOMIC_MD5_TIDX = """
tseq AS (SELECT doc_id AS tgt, text AS seq FROM documents
         WHERE length(text) >= 8),
tw AS (SELECT tgt, seq,
              unnest(range(0, CASE WHEN length(seq) <= 64 THEN 1
                       ELSE (length(seq) - 8) // 57 + 1 END)) AS win
       FROM tseq),
tk AS (SELECT tgt, win, seq,
              unnest(range(1, least(64, length(seq) - win * 57) - 8 + 2)) AS i
       FROM tw),
tf AS (SELECT DISTINCT tgt, win,
              md5(substr(seq, CAST(win * 57 + i AS INT), 8)) AS feature
       FROM tk),
tidx AS (SELECT tgt, win, feature FROM
           (SELECT tgt, win, feature,
                   row_number() OVER (PARTITION BY tgt, win
                                      ORDER BY feature) AS rn
            FROM tf)
         WHERE rn <= 4)
"""


def _simhash_votes_sql() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN substr(h, {i + 1}, 1) IN {_HEX_HIGH} THEN 1 ELSE -1 END) AS v{i}"
        for i in range(16)
    )
    fp = " + ".join(f"CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(16))
    return f"""
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
th AS (SELECT doc_id, md5(tok) AS h FROM toks),
votes AS (SELECT doc_id, {votes} FROM th GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes)
"""


def _occ(pat: str) -> str:
    return (
        f"CAST((length(text) - length(replace(text, '{pat}', ''))) / {len(pat)} AS BIGINT)"
    )


# batched brute-force cosine top-k (N queries, per-query ranking) —
# the oracle for BOTH ann_batch_topk and ann_ivf_batch_topk (the IVF
# entry pins nprobe = n_centroids, so probing is exhaustive and the
# result must equal brute force bit-for-bit)
_ANN_BATCH_TOPK_SQL = """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id % 100 = 7),
    scored AS (SELECT q.query_id, e.vec_id,
                      CAST(floor(
                        list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
                        / sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                CAST(e.embedding AS DOUBLE[]))
                               * list_dot_product(q.qe, q.qe))
                        * 1000000.0 + 0.5) AS BIGINT) AS cos_micro
               FROM embeddings e, q WHERE e.vec_id <> q.query_id),
    ranked AS (SELECT query_id, vec_id, cos_micro,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos_micro DESC, vec_id ASC)
                        AS rank
               FROM scored)
    SELECT query_id, vec_id, cos_micro, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
"""

_ANN_SCORE = """
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
scored AS (SELECT e.vec_id, e.label,
                  CAST(floor(
                    list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
                    / sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                           * list_dot_product(q.qe, q.qe))
                    * 1000000.0 + 0.5) AS BIGINT) AS cos_micro
           FROM embeddings e, q WHERE e.vec_id <> 0)
"""


# ---------------------------------------------------------------------------
# Spark query builders
# ---------------------------------------------------------------------------


def _q_exact_dup_groups(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # SELF-PLANTING: the driver corpus has no md5-identical texts, so a
    # bare groupBy-HAVING returns 0 rows in every round — a green row
    # that proves nothing.  Union a deterministic re-keyed copy of the
    # doc_id % 97 == 0 slice (same transform in the DuckDB twin) so the
    # gate exercises real duplicate-group detection: every planted text
    # must come back as a group with n_docs >= 2 whose representative
    # is the ORIGINAL (smaller) doc_id.
    planted = docs.where(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    return (
        docs.unionByName(planted)
        .groupBy(F.md5("text").alias("fp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("rep_doc_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def _q_exact_dedup_keep_first(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = _t(spark, sf_dir, "documents")
    # shuffle key is md5(text), NOT the full text: at corpus scale the
    # exchange must not carry document bodies as grouping keys
    return (
        docs.groupBy(F.md5("text"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


def _q_ngram_jaccard_pairs(spark, sf_dir):
    from metacache_mpi_spark.operators.textops import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))


def _q_dedup_clusters(spark, sf_dir):
    from metacache_mpi_spark.operators.cc import cluster_assignments
    from metacache_mpi_spark.operators.textops import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs).select("a", "b")
    return cluster_assignments(docs, pairs, "doc_id")


def _q_dedup_pair_metrics(spark, sf_dir):
    """The north rule's dup-pair gate as an operator: LSH-banded pairs
    (pred) scored against the exact Jaccard τ=0.5 pair set (truth)."""
    from metacache_mpi_spark.operators.evaluate import pair_set_metrics
    from metacache_mpi_spark.operators.textops import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    return pair_set_metrics(
        minhash_lsh_pairs(docs).select("a", "b"),
        ngram_jaccard_pairs(docs).select("a", "b"),
    )


def _q_cluster_agreement_lang(spark, sf_dir):
    """Contingency-based pairwise agreement between the dedup clusters
    and the lang partition — the scalable Rand decomposition (group
    sizes only, no pair materialization)."""
    from metacache_mpi_spark.operators.cc import cluster_assignments
    from metacache_mpi_spark.operators.evaluate import (
        clustering_pair_metrics,
    )
    from metacache_mpi_spark.operators.textops import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    clusters = cluster_assignments(
        docs, ngram_jaccard_pairs(docs).select("a", "b"), "doc_id"
    )
    return clustering_pair_metrics(
        clusters, docs.select("doc_id", "lang"), truth_col="lang"
    )


def _q_cluster_reps_longest(spark, sf_dir):
    """Representative selection over the jaccard-lane clusters: keep
    the most complete (longest-text) copy per duplicate cluster."""
    from metacache_mpi_spark.operators.cc import (
        cluster_assignments,
        cluster_representatives,
    )
    from metacache_mpi_spark.operators.textops import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs).select("a", "b")
    clusters = cluster_assignments(docs, pairs, "doc_id")
    return cluster_representatives(clusters, docs, policy="longest")


def _q_cluster_size_histogram(spark, sf_dir):
    """A5 per-taxon-count analog: docs per duplicate cluster, then
    clusters per size (histogram of the assignment)."""
    from pyspark.sql import functions as F

    clusters = _q_dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )


def _q_minhash_signatures(spark, sf_dir):
    from metacache_mpi_spark.operators.textops import minhash_signatures

    return minhash_signatures(_t(spark, sf_dir, "documents"))


def _q_lsh_band_buckets(spark, sf_dir):
    from metacache_mpi_spark.operators.textops import lsh_band_buckets

    return lsh_band_buckets(_t(spark, sf_dir, "documents"))


def _q_minhash_lsh_pairs(spark, sf_dir):
    from metacache_mpi_spark.operators.textops import minhash_lsh_pairs

    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


# star-lane bucket cap, inlined into BOTH engines (the repo's
# shared-literal rule: one Python value, two query texts)
_STAR_CAP = 4


def _q_lsh_star_pairs(spark, sf_dir):
    from metacache_mpi_spark.operators.textops import minhash_lsh_star_pairs

    return minhash_lsh_star_pairs(
        _t(spark, sf_dir, "documents"), cap=_STAR_CAP
    )


def _q_simhash_fingerprints(spark, sf_dir):
    from metacache_mpi_spark.operators.textops import simhash16

    return simhash16(_t(spark, sf_dir, "documents"))


def _q_simhash_dup_pairs(spark, sf_dir):
    from metacache_mpi_spark.operators.textops import simhash_dup_pairs

    return simhash_dup_pairs(_t(spark, sf_dir, "documents"))


def _q_simhash_banded_pairs(spark, sf_dir):
    """Production SimHash lane: banded equi-join (no cross join); with
    bands > max_hamming and no bucket above the cap the result is
    EXACTLY the brute-force pair set, so the oracle is the brute SQL.
    Geometry pinned to the 16-bit relational fingerprint for DuckDB
    parity (the operator defaults to the 64-bit pipeline fingerprint,
    pytest-gated); the cap default (1024) exceeds the sf0.01 corpus, so
    no bucket is dropped here."""
    from metacache_mpi_spark.operators.textops import simhash_banded_pairs

    return simhash_banded_pairs(
        _t(spark, sf_dir, "documents"), bits=16, bands=4
    )


def _q_winnow_stats(spark, sf_dir):
    from metacache_mpi_spark.operators.textops import winnow_fingerprint_stats

    return winnow_fingerprint_stats(_t(spark, sf_dir, "documents"))


def _q_stop_shingle_survivors(spark, sf_dir):
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.textops import discriminative_shingles

    disc = discriminative_shingles(_t(spark, sf_dir, "documents"))
    return disc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_disc"))


def _q_token_stats(spark, sf_dir):
    from metacache_mpi_spark.operators.textops import token_stats

    return token_stats(_t(spark, sf_dir, "documents"))


def _q_quality_scores(spark, sf_dir):
    from metacache_mpi_spark.operators.textops import quality_scores

    return quality_scores(_t(spark, sf_dir, "documents"))


def _q_quality_gate_survivors(spark, sf_dir):
    """clean_job's production quality gate: the FUSED row-local
    predicate of token_stats ⋈ quality_scores ⋈ repetition_stats
    (textops.quality_gate — one zero-shuffle filter, measured 4.3×
    the joined formulation on the 200k funnel corpus).  Thresholds
    chosen to SPLIT this corpus (72/500 survive at sf0.01) so a green
    row proves predicate composition at every boundary, not
    pass-through; the DuckDB twin states the same gate relationally."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.textops import quality_gate

    docs = _t(spark, sf_dir, "documents")
    return quality_gate(
        docs,
        min_words=40,
        min_alpha_milli=820,
        max_dup_word_milli=600,
        max_top_2gram_milli=40,
    ).select(
        "doc_id", F.length("text").cast("long").alias("n_chars_text")
    )


def _q_word_freq_scores(spark, sf_dir):
    from metacache_mpi_spark.operators.textops import word_freq_scores

    return word_freq_scores(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# PII lane: the documents corpus carries no PII, so both engines append
# the SAME deterministic PII suffix (email + IPv4 + phone derived from
# doc_id) before detect/scrub — non-vacuous counts, zero external data.
# ---------------------------------------------------------------------------

from metacache_mpi_spark.operators.pii import (  # noqa: E402
    EMAIL_RE as _PII_EMAIL,
    IPV4_RE as _PII_IPV4,
    PHONE_RE as _PII_PHONE,
)

_PII_SUFFIX_SQL = (
    "text || ' contact u' || CAST(doc_id AS VARCHAR) || "
    "'@example.com via 10.0.' || CAST(doc_id % 250 AS VARCHAR) || "
    "'.7 call 555-010' || CAST(doc_id % 10 AS VARCHAR)"
)


def _pii_augmented(spark, sf_dir):
    from pyspark.sql import functions as F

    d = F.col("doc_id")
    return _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            d.cast("string"),
            F.lit("@example.com via 10.0."),
            (d % 250).cast("string"),
            F.lit(".7 call 555-010"),
            (d % 10).cast("string"),
        ),
    )


def _q_pii_stats(spark, sf_dir):
    from metacache_mpi_spark.operators.pii import pii_stats

    return pii_stats(_pii_augmented(spark, sf_dir))


def _q_pii_scrub(spark, sf_dir):
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.pii import scrub_pii

    out = scrub_pii(_pii_augmented(spark, sf_dir))
    return out.select(
        "doc_id", F.md5("clean_text").alias("scrub_md5"), "n_redactions"
    )


def _q_intra_doc_line_dedup(spark, sf_dir):
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.textops import strip_repeated_lines

    # the documents corpus is single-line word streams: dedup at word
    # granularity (sep=' ') so the keep-first rule is non-vacuous
    out = strip_repeated_lines(_t(spark, sf_dir, "documents"), sep=" ")
    return out.select(
        "doc_id",
        F.md5("clean_text").alias("clean_md5"),
        "n_kept",
        "n_dropped",
    )


# corpus-mixing lane: per-source sampling fractions (deterministic config)
_MIX_FRACTIONS = {f"src{i}": 0.05 * ((i % 10) + 1) for i in range(20)}


def _mix_threshold_values() -> str:
    """(source, threshold) VALUES rows for the DuckDB sampling twin,
    thresholds computed by the SAME function the operator uses."""
    from metacache_mpi_spark.operators.mixing import fraction_to_hex_threshold

    return ", ".join(
        f"('{s}', '{fraction_to_hex_threshold(f)}')"
        for s, f in sorted(_MIX_FRACTIONS.items())
    )


def _q_mixture_sample(spark, sf_dir):
    """Deterministic hash-stratified corpus sampling: pure
    Project+Filter (zero Exchange), sample is a function of
    (salt, doc_id) alone so it is identical across partitionings."""
    from metacache_mpi_spark.operators.mixing import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(docs, _MIX_FRACTIONS).select("doc_id", "source")


def _q_token_budget_pack(spark, sf_dir):
    from metacache_mpi_spark.operators.mixing import token_budget_pack

    return token_budget_pack(_t(spark, sf_dir, "documents"), 800)


def _q_mixture_report(spark, sf_dir):
    from metacache_mpi_spark.operators.mixing import mixture_report

    return mixture_report(_t(spark, sf_dir, "documents"))


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_REPEAT_FACTORS = {"src0": 2.5, "src1": 0.5, "src2": 0.0}


def _split_case_sql() -> str:
    """CASE chain cutting the md5 uniform at the operator's own
    cumulative boundaries (bit-identical thresholds on both engines)."""
    from metacache_mpi_spark.operators.mixing import split_boundaries

    bounds, tail = split_boundaries(_SPLIT_WEIGHTS)
    if not bounds:  # single split: CASE with zero WHENs is a parse error
        return f"'{tail}'"
    u = "substr(md5(concat('split', ':', CAST(doc_id AS VARCHAR))), 1, 8)"
    whens = " ".join(f"WHEN {u} < '{t}' THEN '{n}'" for n, t in bounds)
    return f"CASE {whens} ELSE '{tail}' END"


def _repeat_values_sql() -> str:
    from metacache_mpi_spark.operators.mixing import fraction_to_hex_threshold

    return ", ".join(
        f"('{s}', {int(f)}, '{fraction_to_hex_threshold(f - int(f))}')"
        for s, f in sorted(_REPEAT_FACTORS.items())
    )


def _q_hash_split_assign(spark, sf_dir):
    """Deterministic train/val/test partition: pure Project, a doc's
    split never changes under repartitioning or corpus growth."""
    from metacache_mpi_spark.operators.mixing import hash_split

    docs = _t(spark, sf_dir, "documents")
    return hash_split(docs, _SPLIT_WEIGHTS).select("doc_id", "split")


def _q_upsample_repeat(spark, sf_dir):
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.mixing import upsample_repeat

    docs = _t(spark, sf_dir, "documents")
    out = upsample_repeat(docs, _REPEAT_FACTORS)
    return out.select(
        "doc_id", "source", F.col("rep_idx").cast("long").alias("rep_idx")
    )


def _q_sequence_pack(spark, sf_dir):
    from metacache_mpi_spark.operators.mixing import sequence_pack

    return sequence_pack(_t(spark, sf_dir, "documents"), 128)


def _q_sequence_pack_global(spark, sf_dir):
    """Globally unique chunk ids: corpus-sized work stays per-stratum;
    only the |strata|-row base-offset table crosses strata."""
    from metacache_mpi_spark.operators.mixing import (
        global_chunk_ids,
        sequence_pack,
    )

    return global_chunk_ids(
        sequence_pack(_t(spark, sf_dir, "documents"), 128)
    )


def _q_repetition_stats(spark, sf_dir):
    from metacache_mpi_spark.operators.textops import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


def _q_repeated_spans(spark, sf_dir):
    from metacache_mpi_spark.operators.spans import repeated_span_occurrences

    return repeated_span_occurrences(_t(spark, sf_dir, "documents"))


def _q_repeated_span_intervals(spark, sf_dir):
    from metacache_mpi_spark.operators.spans import strip_intervals

    return strip_intervals(_t(spark, sf_dir, "documents"))


def _q_exact_substring_dedup(spark, sf_dir):
    from metacache_mpi_spark.operators.spans import exact_substring_dedup

    return exact_substring_dedup(_t(spark, sf_dir, "documents"))


def _q_contamination_pairs(spark, sf_dir):
    """Benchmark-contamination scan: eval set = every 20th document,
    containment of eval shingles in (df-capped) corpus shingles."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.textops import contamination_pairs

    docs = _t(spark, sf_dir, "documents")
    evalset = docs.where(F.col("doc_id") % 20 == 3)
    return contamination_pairs(docs, evalset)


def _crawl_fixture(spark, sf_dir):
    """Two deterministic crawl snapshots derived from `documents`
    (old = doc_id%3≠0, new = doc_id%3≠1 with every %5==0 text
    reversed) — ONE builder shared by `crawl_diff` and
    `crawl_diff_scored`, mirrored by the shared `_CRAWL_DIFF_CTE` on
    the oracle side so the paired gates cannot drift apart."""
    from pyspark.sql import functions as F

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/d"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    old = docs.where(F.col("doc_id") % 3 != 0)
    new = docs.where(F.col("doc_id") % 3 != 1).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.reverse(F.col("text"))
        ).otherwise(F.col("text")),
    )
    return old, new


def _q_crawl_diff(spark, sf_dir):
    """Per-url added/removed/changed/unchanged across the two fixture
    crawls via ONE full-outer join on the url key."""
    from metacache_mpi_spark.operators.webops import crawl_diff

    return crawl_diff(*_crawl_fixture(spark, sf_dir))


def _qprobe_engine(spark, sf_dir):
    """Resident md5-mode index over documents with doc_id%4≠0, built
    ONCE per (sf_dir, corpus fingerprint) under a FIXED path in
    `_ORACLE_VIEW_ROOT` and reused by both probe entries — bounded
    /tmp usage (a tempdir per call would leak a full index copy per
    contract run) and no rebuild when the corpus is unchanged."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from metacache_mpi_spark.config import DedupConfig
    from metacache_mpi_spark.plans.checkpoint import CheckpointManager
    from metacache_mpi_spark.streaming.incremental import IncrementalDedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    r = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("doc_id")).alias("h"),
    ).first()
    fp = {"n": r["n"], "h": r["h"]}
    root = os.path.join(
        _ORACLE_VIEW_ROOT,
        f"qprobe_state_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    marker = os.path.join(root, "corpus_fp.json")
    try:
        stale = json.load(open(marker)) != fp
    except (OSError, ValueError):
        stale = True
    if stale:
        shutil.rmtree(root, ignore_errors=True)
    cfg = DedupConfig(
        shingle_k=8, sketch_size=8, bands=4, rows_per_band=2,
        sketch_mode="md5",
    )
    inc = IncrementalDedup(spark, CheckpointManager(spark, root), cfg)
    if inc.batch_no == 0:
        idx_pages = docs.where(F.col("doc_id") % 4 != 0).select(
            "doc_id",
            F.concat(
                F.lit("d/"), F.col("doc_id").cast("string")
            ).alias("url"),
            "text",
        )
        inc.process_batch(idx_pages)
        with open(marker, "w") as f:
            json.dump(fp, f)
    return inc


def _qprobe_novel_queries(spark, sf_dir):
    """Novel-url probe batch: doc_id%4==0 pages under q/ urls; %8≠0
    rows carry the text of doc_id+1 (an indexed doc — planted content
    dup), %8==0 rows keep their own (novel) text."""
    from pyspark.sql import functions as F

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 4 == 0).alias("q")
    d2 = docs.select(
        F.col("doc_id").alias("nid"), F.col("text").alias("ntext")
    )
    return base.join(
        d2, F.col("nid") == F.col("q.doc_id") + 1, "left"
    ).select(
        (F.col("q.doc_id") + 100000000).alias("doc_id"),
        F.concat(
            F.lit("q/"), F.col("q.doc_id").cast("string")
        ).alias("url"),
        F.when(F.col("q.doc_id") % 8 == 0, F.col("q.text"))
        .otherwise(F.coalesce(F.col("ntext"), F.col("q.text")))
        .alias("text"),
    )


def _q_index_query_probe(spark, sf_dir):
    """Read-only index probe (reference query mode) oracle-gated via
    the md5 sketch mode: probe the `_qprobe_engine` state with (a)
    url-identical queries (doc_id%8==1, indexed urls), (b) planted
    content dups, (c) genuinely novel texts.  The DuckDB twin
    reproduces the full lifecycle: prepare → md5 minhash → band
    buckets → state-side cap → cross-candidates → ≥4-lane gate →
    exact shingle Jaccard ≥ 0.6 → best match per query (ties to
    smallest indexed id)."""
    from pyspark.sql import functions as F

    inc = _qprobe_engine(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    qu = docs.where(F.col("doc_id") % 8 == 1).select(
        (F.col("doc_id") + 100000000).alias("doc_id"),
        F.concat(F.lit("d/"), F.col("doc_id").cast("string")).alias("url"),
        F.lit("probe").alias("text"),
    )
    return inc.query_batch(
        qu.unionByName(_qprobe_novel_queries(spark, sf_dir))
    )


def _q_index_query_probe_topk(spark, sf_dir):
    """Ranked top-2 form of `index_query_probe` (reference A2: ranked
    candidate list per query) — same state and novel-probe fixture,
    `rank` column added, up to 2 content matches per query doc."""
    return _qprobe_engine(spark, sf_dir).query_batch(
        _qprobe_novel_queries(spark, sf_dir), topk=2
    )


def _q_crawl_diff_scored(spark, sf_dir):
    """`crawl_diff(score_changes=True)` on the shared crawl fixture:
    every `changed` url additionally carries the 8-shingle Jaccard
    between its old and new text (milli) — the re-process priority
    signal; other statuses carry null."""
    from metacache_mpi_spark.operators.webops import crawl_diff

    return crawl_diff(*_crawl_fixture(spark, sf_dir), score_changes=True)


def _q_source_cap_survivors(spark, sf_dir):
    """C4/Dolma-style per-domain cap: keep the 10 longest docs per
    source (ties by doc_id) — count-first plan windows only over-cap
    keys' rows; under-cap rows never shuffle."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.webops import cap_docs_per_key

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return cap_docs_per_key(
        docs,
        "source",
        10,
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
    )


def _q_contamination_pairs_bloom(spark, sf_dir):
    """Scale lane of the contamination scan: broadcast Bloom prefilter
    over eval shingles drops non-matching corpus shingles MAP-SIDE
    before any shuffle; the exact join downstream removes bloom false
    positives, so the result — and the oracle — are identical to
    `contamination_pairs` bit for bit."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.textops import (
        contamination_pairs_bloom,
    )

    docs = _t(spark, sf_dir, "documents")
    evalset = docs.where(F.col("doc_id") % 20 == 3)
    return contamination_pairs_bloom(docs, evalset)


def _q_boilerplate_lines(spark, sf_dir):
    from metacache_mpi_spark.operators.textops import (
        remove_boilerplate_lines,
    )

    return remove_boilerplate_lines(_t(spark, sf_dir, "documents"))


def _q_lang_id(spark, sf_dir):
    from metacache_mpi_spark.operators.textops import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


def _q_ann_cosine_topk(spark, sf_dir):
    from metacache_mpi_spark.operators.ann import cosine_topk

    return cosine_topk(_t(spark, sf_dir, "embeddings"))


def _q_embedding_cosine_dup_pairs(spark, sf_dir):
    from metacache_mpi_spark.operators.ann import cosine_dup_pairs

    return cosine_dup_pairs(_t(spark, sf_dir, "embeddings"))


def _semdedup_assigned(spark, sf_dir):
    """Shared SemDeDup front half: cluster the embeddings and
    materialize the (vec_id, bucket) assignment as a parquet view so
    the DuckDB twin can reproduce the within-cluster lifecycle (the
    NumPy k-means itself is not SQL-expressible — same pattern as the
    kperm genomic lanes)."""
    from metacache_mpi_spark.operators.semdedup import (
        semantic_assignments,
    )

    emb = _t(spark, sf_dir, "embeddings")
    assigned = semantic_assignments(emb)
    view = _materialize_view(
        assigned.select("vec_id", "bucket"), "semdedup_assign"
    )
    return view.join(emb.select("vec_id", "embedding"), "vec_id")


def _q_semantic_dup_candidates(spark, sf_dir):
    from metacache_mpi_spark.operators.semdedup import (
        semantic_dup_candidates,
    )

    return semantic_dup_candidates(
        _semdedup_assigned(spark, sf_dir), tau_micro=350000
    )


def _q_semantic_dedup(spark, sf_dir):
    from metacache_mpi_spark.operators.semdedup import semantic_dedup

    return semantic_dedup(
        None, tau_micro=350000, assigned=_semdedup_assigned(spark, sf_dir)
    )


def _q_ann_lsh_bucketed(spark, sf_dir):
    from metacache_mpi_spark.operators.ann import lsh_bucketed_topk

    return lsh_bucketed_topk(_t(spark, sf_dir, "embeddings"))


def _q_ann_lsh_dup_pairs(spark, sf_dir):
    """Production embedding-dedup lane: sign-LSH banding + exact-cosine
    verify (recall vs the brute lane gated in pytest).  Band geometry is
    pinned to 16×2 to mirror the DuckDB oracle exactly (the operator
    auto-sizes from τ when unpinned)."""
    from metacache_mpi_spark.operators.ann import sign_banded_dup_pairs

    return sign_banded_dup_pairs(
        _t(spark, sf_dir, "embeddings"), bands=16, rows_per_band=2
    )


def _batch_queries(spark, sf_dir):
    """Deterministic ANN query batch: every 100th embedding (5 queries
    at sf0.01) — the N-query retrieval shape of the reference's batched
    query loop (src/querying.h:1309-1387)."""
    from pyspark.sql import functions as F

    return _t(spark, sf_dir, "embeddings").where(
        F.col("vec_id") % 100 == 7
    ).select(F.col("vec_id").alias("query_id"), "embedding")


def _q_ann_batch_topk(spark, sf_dir):
    """Batched brute-force cosine top-k: N queries, one corpus scan,
    per-query distributed top-k — the exactness baseline for batch
    retrieval (semantic decontamination / reference-corpus dedup)."""
    from metacache_mpi_spark.operators.ann import cosine_batch_topk

    return cosine_batch_topk(
        _t(spark, sf_dir, "embeddings"), _batch_queries(spark, sf_dir), k=5
    )


def _q_ann_ivf_batch_topk(spark, sf_dir):
    """Batched IVF ANN through the real probe machinery (trained
    centroids → per-query probe buckets → bucket equi join → two-level
    per-query top-k), pinned to nprobe = n_centroids so every bucket is
    probed and DuckDB's brute SQL is an exact oracle.  Partial-probe
    (nprobe < n_centroids) recall is gated in pytest."""
    from metacache_mpi_spark.operators.ann import ivf_batch_topk

    return ivf_batch_topk(
        _t(spark, sf_dir, "embeddings"),
        _batch_queries(spark, sf_dir),
        k=5,
        n_centroids=8,
        nprobe=8,
    )


def _emb_split(spark, sf_dir):
    """Deterministic corpus/eval split of the embeddings table for the
    semantic-decontamination lanes (eval = every 20th vector, mirroring
    the documents-side contamination_pairs split)."""
    from pyspark.sql import functions as F

    emb = _t(spark, sf_dir, "embeddings")
    return emb.where(F.col("vec_id") % 20 != 3), emb.where(
        F.col("vec_id") % 20 == 3
    )


def _q_embedding_contamination_pairs(spark, sf_dir):
    """Semantic decontamination, brute baseline: training-corpus
    vectors whose cosine to any eval-set vector reaches τ=0.35 —
    corpus × broadcast eval scan."""
    from metacache_mpi_spark.operators.ann import cosine_cross_pairs

    corpus, evalset = _emb_split(spark, sf_dir)
    return cosine_cross_pairs(corpus, evalset, tau=0.35)


def _q_embedding_contamination_banded(spark, sf_dir):
    """Production semantic-decontamination lane: sign-banded cross
    join (16×2 pinned to mirror the DuckDB banding SQL) with the
    corpus-side bucket cap + exact-cosine verify."""
    from metacache_mpi_spark.operators.ann import sign_banded_cross_pairs

    corpus, evalset = _emb_split(spark, sf_dir)
    return sign_banded_cross_pairs(
        corpus, evalset, tau=0.35, bands=16, rows_per_band=2
    )


def _q_lang_confusion_stats(spark, sf_dir):
    """A10 confusion statistics as a first-class operator, applied to
    the lang-ID heuristic's predictions vs the table's truth labels."""
    from metacache_mpi_spark.operators.evaluate import confusion_stats
    from metacache_mpi_spark.operators.textops import lang_id

    return confusion_stats(
        lang_id(_t(spark, sf_dir, "documents")), "lang", "pred_lang"
    )


def _q_value_moments(spark, sf_dir):
    from metacache_mpi_spark.operators.relational import value_moments

    return value_moments(_t(spark, sf_dir, "events"))


def _q_matches_per_target(spark, sf_dir):
    """A7 matches-per-target inversion over the events analog: query =
    user, target = event_type, window = activity minute; candidates =
    per-(user, target) ranges with ≥5 total events."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.genomic import (
        GenomicConfig,
        matches_per_target,
    )
    from metacache_mpi_spark.operators.relational import _ntz_epoch_us

    ev = _t(spark, sf_dir, "events")
    matches = ev.select(
        F.col("user_id").alias("qid"),
        F.col("event_type").alias("tgt"),
        F.floor(_ntz_epoch_us("ts") / 60000000.0).cast("long").alias("win"),
    )
    cands = matches.groupBy("qid", "tgt").agg(
        F.min("win").alias("win_beg"), F.count(F.lit(1)).alias("hits")
    )
    cfg = GenomicConfig(num_windows=10)
    out = matches_per_target(matches, cands, cfg, min_hits_per_candidate=5)
    return out.drop("windows")


def _q_tpch_q1(spark, sf_dir):
    from metacache_mpi_spark.operators.relational import tpch_q1

    return tpch_q1(_t(spark, sf_dir, "lineitem"))


def _q_top_users(spark, sf_dir):
    from metacache_mpi_spark.operators.relational import top_users_per_event_type

    return top_users_per_event_type(_t(spark, sf_dir, "events"))


def _q_contig_hits(spark, sf_dir):
    from metacache_mpi_spark.operators.relational import contiguous_range_hits

    return contiguous_range_hits(_t(spark, sf_dir, "events"))


def _q_event_cumulative(spark, sf_dir):
    from metacache_mpi_spark.operators.relational import event_type_cumulative

    return event_type_cumulative(_t(spark, sf_dir, "events"))


def _q_star_join_revenue(spark, sf_dir):
    from metacache_mpi_spark.operators.relational import star_join_revenue

    return star_join_revenue(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
    )


def _q_nation_region_rollup(spark, sf_dir):
    from metacache_mpi_spark.operators.relational import nation_region_rollup

    return nation_region_rollup(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


def _q_paired_zip(spark, sf_dir):
    from metacache_mpi_spark.operators.relational import paired_zip

    return paired_zip(_t(spark, sf_dir, "events"))


def _q_sessionize(spark, sf_dir):
    from metacache_mpi_spark.operators.relational import sessionize

    return sessionize(_t(spark, sf_dir, "events"))


def _q_props_extract(spark, sf_dir):
    from metacache_mpi_spark.operators.relational import props_extract

    return props_extract(_t(spark, sf_dir, "events"))


def _q_merge_topk(spark, sf_dir):
    from metacache_mpi_spark.operators.relational import merge_topk_sources

    return merge_topk_sources(_t(spark, sf_dir, "events"))


def _q_pipeline_lsh_pairs_kperm(spark, sf_dir):
    """Production pandas-UDF MinHash/LSH over documents (pytest-gated;
    bench measures THIS lane — the contract entry below runs the same
    pipeline code under the md5 sketch mode so DuckDB can gate it)."""
    from metacache_mpi_spark.config import DedupConfig
    from metacache_mpi_spark.operators.lsh import lsh_candidate_pairs

    cfg = DedupConfig(shingle_k=8)
    return lsh_candidate_pairs(_t(spark, sf_dir, "documents"), cfg)


def _q_pipeline_lsh_pairs(spark, sf_dir):
    """The pipeline's candidate generator (attach_signature →
    emit_bands → prune/cap → in-array pair expansion) under
    ``sketch_mode="md5"`` — identical operators and thresholds to the
    production lane, SQL-expressible signature, full DuckDB oracle
    (the sketch_rows_md5 discipline applied to the dedup pipeline)."""
    from metacache_mpi_spark.config import DedupConfig
    from metacache_mpi_spark.operators.lsh import lsh_candidate_pairs

    cfg = DedupConfig(
        shingle_k=8, sketch_size=8, bands=4, rows_per_band=2,
        sketch_mode="md5",
    )
    return lsh_candidate_pairs(_t(spark, sf_dir, "documents"), cfg)


# The kperm (production Mueller-hash) sketch is not SQL-reproducible,
# but everything DOWNSTREAM of it is: each kperm genomic entry writes
# its Spark-computed sketch rows here as parquet and the DuckDB oracle
# runs the probe/range/top-k lifecycle in SQL over the SAME rows
# (read_parquet).  The hashing itself stays bit-exactness-gated in
# pytest (test_hashing); this closes the former `no_oracle` gap for the
# join/agg/top-k machinery.  Contract note: the driver (like
# selfcheck.py) executes the Spark query before its oracle SQL, so the
# view exists when DuckDB reads it.
_ORACLE_VIEW_ROOT = "/tmp/mcs_oracle_views"


def _materialize_view(df: DataFrame, name: str) -> DataFrame:
    import os

    path = os.path.join(_ORACLE_VIEW_ROOT, name)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def _q_genomic_candidates(spark, sf_dir):
    """Reference-native lifecycle, oracle-gated via the materialized
    sketch view: deterministic synthetic genomes → windowed bottom-s
    kperm sketch index → planted-fragment reads → feature probe (J1) →
    contiguous-range hit counting (A1) → top-k + hitsMin (A2/P12).
    The sketch rows (index AND query side) are parquet views; the
    DuckDB twin runs the identical lifecycle SQL over them."""
    from metacache_mpi_spark.operators.genomic import (
        GenomicConfig,
        _sketch_rows,
        _top_candidates,
        build_index,
    )

    rng, genomes = _genomic_fixture(spark)
    reads = []
    for qid in range(18):
        t = qid % 6
        s = int(rng.randint(0, 420))
        reads.append((qid, genomes[t][1][s : s + 140]))
    cfg = GenomicConfig(k=8, sketch_size=8, winlen=64, winstride=57)
    tdf = spark.createDataFrame(genomes, "tgt long, seq string")
    qdf = spark.createDataFrame(reads, "qid long, seq string")
    index = _materialize_view(build_index(tdf, cfg), "kperm_tidx")
    qsk = _materialize_view(_sketch_rows(qdf, cfg, "qid"), "kperm_qsk")
    matches = (
        qsk.withColumnRenamed("win", "qwin")
        .join(index, "feature")
        .select("qid", "tgt", "win")
    )
    return _top_candidates(matches, cfg)


def _genomic_fixture(spark):
    """Deterministic synthetic genomes + taxonomy shared by the genomic
    contract entries."""
    import numpy as np

    rng = np.random.RandomState(42)
    dna = lambda n: "".join("ACGT"[i] for i in rng.randint(0, 4, size=n))  # noqa: E731
    genomes = [(t, dna(600)) for t in range(6)]
    return rng, genomes


def _q_genomic_candidates_paired(spark, sf_dir):
    """Paired-end lifecycle on the kperm sketch, oracle-gated via
    materialized views: both mates' matches accumulate into ONE
    candidate set per query; the A1 span is a per-query column derived
    from the combined read length (classification.cpp:217-219).  The
    mate sketch rows and the per-query span table are parquet views
    the DuckDB twin reads."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.genomic import (
        GenomicConfig,
        _sketch_rows,
        _top_candidates,
        build_index,
    )

    rng, genomes = _genomic_fixture(spark)
    reads = []
    for qid in range(18):
        t = qid % 6
        s = int(rng.randint(0, 300))
        insert = int(rng.randint(160, 220))
        seq = genomes[t][1]
        reads.append((qid, seq[s : s + 100], seq[s + insert : s + insert + 100]))
    cfg = GenomicConfig(k=8, sketch_size=8, winlen=64, winstride=57)
    tdf = spark.createDataFrame(genomes, "tgt long, seq string")
    qdf = spark.createDataFrame(reads, "qid long, seq1 string, seq2 string")
    # identical accumulation to query_index_paired (querying.h:49-75):
    # both mates sketch under the SAME qid, so their rows union into one
    # match set per query
    mates = qdf.select("qid", F.col("seq1").alias("seq")).unionByName(
        qdf.select("qid", F.col("seq2").alias("seq"))
    )
    index = _materialize_view(build_index(tdf, cfg), "kperm_p_tidx")
    qsk = _materialize_view(_sketch_rows(mates, cfg, "qid"), "kperm_p_qsk")
    span = _materialize_view(
        qdf.select(
            "qid",
            (
                F.lit(2)
                + F.floor((F.length("seq1") + F.length("seq2")) / cfg.winstride)
            ).cast("long").alias("nw_q"),
        ),
        "kperm_p_span",
    )
    matches = (
        qsk.withColumnRenamed("win", "qwin")
        .join(index, "feature")
        .select("qid", "tgt", "win")
        .join(span.hint("shuffle_hash"), "qid")
    )
    return _top_candidates(matches, cfg, num_windows=F.col("nw_q"))


def _q_genomic_candidates_merged(spark, sf_dir):
    """A3 merge-below-rank on the kperm sketch, oracle-gated via
    materialized views: candidates merged at genus level before top-k
    (candidates.h:242-283).  The taxonomy lift dim is a 6-row literal
    mirrored as VALUES in the DuckDB twin."""
    from metacache_mpi_spark.operators.genomic import (
        GenomicConfig,
        _per_target_best,
        _sketch_rows,
        build_index,
        merge_candidates_below_rank,
    )
    from metacache_mpi_spark.operators.taxonomy import Taxonomy

    rng, genomes = _genomic_fixture(spark)
    reads = []
    for qid in range(18):
        t = qid % 6
        s = int(rng.randint(0, 420))
        reads.append((qid, genomes[t][1][s : s + 140]))
    cfg = GenomicConfig(k=8, sketch_size=8, winlen=64, winstride=57,
                        max_candidates=4)
    tdf = spark.createDataFrame(genomes, "tgt long, seq string")
    qdf = spark.createDataFrame(reads, "qid long, seq string")
    # taxonomy: targets 0-2 -> species 10-12 under genus 100;
    # targets 3-5 -> species 13-15 under genus 101; root 1
    tax = Taxonomy(
        parent={1: 1, 100: 1, 101: 1, 10: 100, 11: 100, 12: 100,
                13: 101, 14: 101, 15: 101},
        rank={1: "root", 100: "genus", 101: "genus",
              **{t: "species" for t in range(10, 16)}},
    )
    target_taxid = {t: 10 + t for t in range(6)}
    index = _materialize_view(build_index(tdf, cfg), "kperm_m_tidx")
    qsk = _materialize_view(_sketch_rows(qdf, cfg, "qid"), "kperm_m_qsk")
    matches = (
        qsk.withColumnRenamed("win", "qwin")
        .join(index, "feature")
        .select("qid", "tgt", "win")
    )
    # UNTRUNCATED per-target best ranges (the reference lifts taxa at
    # insert time, before its bounded candidate list), then genus merge
    per_target = _per_target_best(matches, cfg)
    return merge_candidates_below_rank(
        per_target, tax, target_taxid, "genus", cfg,
    )


def _q_classification_rank_stats(spark, sf_dir):
    """A9/A10 per-rank sensitivity/precision (rows-only): the
    rank-cumulative counters of classification_statistics.h:91-224 over
    a deterministic synthetic assignment set."""
    from metacache_mpi_spark.operators.evaluate import (
        per_rank_stats,
        rank_positions,
    )
    from metacache_mpi_spark.operators.taxonomy import Taxonomy

    tax = Taxonomy(
        parent={1: 1, 2: 1, 3: 2, 4: 3, 8: 3, 5: 4, 6: 4, 9: 8},
        rank={1: "root", 2: "domain", 3: "phylum", 4: "genus",
              8: "genus", 5: "species", 6: "species", 9: "species"},
    )
    rows = [
        (0, 5, 5),        # correct at species
        (1, 6, 5),        # same genus -> correct at genus, wrong below
        (2, 9, 5),        # cross genus -> correct at phylum
        (3, None, 5),     # unclassified, truth known
        (4, 5, None),     # classified, truth unknown
        (5, 4, 5),        # assigned at genus, truth species
    ]
    df = spark.createDataFrame(
        rows, "qid long, taxid long, truth_taxid long"
    )
    return per_rank_stats(rank_positions(df, tax))


def _q_index_bucket_stats(spark, sf_dir):
    """`info statistics` analog (sketch_database.h:1021-1032): exact
    moments of the LSH bucket-size distribution per band — the
    bucket_size_stats operator over the md5 bucket table."""
    from metacache_mpi_spark.operators.relational import bucket_size_stats
    from metacache_mpi_spark.operators.textops import lsh_band_buckets

    b = lsh_band_buckets(_t(spark, sf_dir, "documents"))
    return bucket_size_stats(b, bucket_cols=["bucket"], group_cols=["band"])


def _q_taxon_coverage_stats(spark, sf_dir):
    """-taxon-coverage per-rank DB-coverage confusion table
    (classification.cpp:294-320 + stat_confusion.h:37-130) over a
    deterministic synthetic truth/assignment set: each ranked
    truth-lineage taxon scored covered×classified-at-rank; guarded
    fixed-point micros."""
    from metacache_mpi_spark.operators.evaluate import (
        coverage_stats,
        db_covered_taxa,
    )
    from metacache_mpi_spark.operators.taxonomy import Taxonomy

    tax = Taxonomy(
        parent={1: 1, 100: 1, 101: 1, 10: 100, 11: 100, 12: 100,
                13: 101, 14: 101, 15: 101},
        rank={1: "root", 100: "genus", 101: "genus",
              **{t: "species" for t in range(10, 16)}},
    )
    covered = db_covered_taxa(tax, [10, 11])  # DB targets' lineages
    rows = [
        (0, 10, 10),    # species-level call, fully covered truth
        (1, 100, 13),   # genus-level call, uncovered species/genus
        (2, None, 11),  # unclassified, covered truth
        (3, 10, None),  # no ground truth -> skipped
        (4, 13, 13),    # species call on uncovered lineage
        (5, None, 15),  # unclassified, uncovered lineage
    ]
    df = spark.createDataFrame(
        rows, "qid long, taxid long, truth_taxid long"
    )
    return coverage_stats(df, tax, covered)


def _q_classify_lca(spark, sf_dir):
    """A4 LCA-voting classification (classification.cpp:235-265) over a
    deterministic synthetic candidate set: best-candidate seed, strict
    hits > (best - hitsMin)·fraction fold-in, ranked LCA, highest-rank
    cutoff.  Unclassified is emitted as -1 for oracle hash parity."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.taxonomy import Taxonomy, classify_lca

    tax = Taxonomy(
        parent={1: 1, 100: 1, 101: 1, 10: 100, 11: 100, 12: 100,
                13: 101, 14: 101, 15: 101},
        rank={1: "root", 100: "genus", 101: "genus",
              **{t: "species" for t in range(10, 16)}},
    )
    target_taxid = {t: 10 + t for t in range(6)}
    rows = [
        (0, 0, 10), (1, 0, 10), (1, 1, 8), (2, 0, 10), (2, 3, 9),
        (3, 2, 2), (4, 0, 10), (4, 1, 3), (5, 5, 4), (5, 4, 4),
        (6, 99, 10), (7, 0, 5), (7, 3, 1),
    ]
    cands = spark.createDataFrame(rows, "qid long, tgt long, hits long")
    out = classify_lca(
        cands, tax, target_taxid,
        hits_min=3, hits_diff_fraction=0.5, highest_rank="genus",
    )
    return out.select(
        "qid", F.coalesce("taxid", F.lit(-1)).alias("taxid")
    )


def _q_abundance_estimate(spark, sf_dir):
    """A6 hierarchical abundance (classification.cpp:362-428) over a
    deterministic synthetic assignment set: counts at/below the rank
    lift to it; counts above it redistribute proportionally to the
    direct rank-level counts (fixed-point integer micros)."""
    from metacache_mpi_spark.operators.taxonomy import (
        Taxonomy,
        abundance_estimate_df,
    )

    tax = Taxonomy(
        parent={1: 1, 100: 1, 101: 1, 10: 100, 11: 100, 12: 100,
                13: 101, 14: 101, 15: 101, 7: 10},
        rank={1: "root", 100: "genus", 101: "genus", 7: "no rank",
              **{t: "species" for t in range(10, 16)}},
    )
    # species direct counts: 10→3 (incl. one 'no rank' child lift),
    # 11→2, 13→4; genus 100 (above rank) → 6 redistributed 3:2 over
    # {10, 11}; genus 101 → 5 all to 13; root → 9 over all three
    rows = (
        [(i, 10) for i in range(2)] + [(2, 7)]
        + [(i, 11) for i in range(3, 5)]
        + [(i, 13) for i in range(5, 9)]
        + [(i, 100) for i in range(9, 15)]
        + [(i, 101) for i in range(15, 20)]
        + [(i, 1) for i in range(20, 29)]
        + [(29, None)]
    )
    asg = spark.createDataFrame(rows, "qid long, taxid long")
    return abundance_estimate_df(asg, tax, "species")


def _q_genomic_candidates_md5(spark, sf_dir):
    """Oracle-gated genomic query lifecycle: windowed bottom-s md5
    sketch (dna_encoding.h:261-289 windowing) → feature probe (J1) →
    contiguous-range hit counting (A1) → top-k + hitsMin (A2/P12), on
    sequences derived from the documents table so the DuckDB oracle
    runs the identical SQL end to end."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.genomic import (
        GenomicConfig,
        query_index_md5,
        sketch_rows_md5,
    )

    docs = _t(spark, sf_dir, "documents")
    cfg = GenomicConfig(k=8, sketch_size=4, winlen=64, winstride=57,
                        num_windows=3, max_candidates=2)
    targets = docs.select(
        F.col("doc_id").alias("tgt"), F.col("text").alias("seq")
    )
    queries = docs.where(
        (F.col("doc_id") % 5 == 0) & (F.length("text") >= 150)
    ).select(
        F.col("doc_id").alias("qid"),
        F.substring("text", 11, 140).alias("seq"),
    )
    index = sketch_rows_md5(targets, cfg, "tgt")
    return query_index_md5(queries, index, cfg)


def _q_genomic_candidates_paired_md5(spark, sf_dir):
    """Oracle-gated PAIRED-END lifecycle on the md5 sketch lane: both
    mates probe independently, matches merge per query, and the A1 span
    is a per-query column derived from the combined (variable) read
    length — pinning the bounded-range self-join formulation of
    _per_target_best against a DuckDB oracle."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.genomic import (
        GenomicConfig,
        query_index_paired_md5,
        sketch_rows_md5,
    )

    docs = _t(spark, sf_dir, "documents")
    cfg = GenomicConfig(k=8, sketch_size=4, winlen=64, winstride=57,
                        num_windows=3, max_candidates=2)
    targets = docs.select(
        F.col("doc_id").alias("tgt"), F.col("text").alias("seq")
    )
    queries = docs.where(
        (F.col("doc_id") % 5 == 0) & (F.length("text") >= 290)
    ).select(
        F.col("doc_id").alias("qid"),
        F.substring("text", 11, 100).alias("seq1"),
        F.expr("substring(text, 151, CAST(60 + doc_id % 80 AS INT))").alias(
            "seq2"
        ),
    )
    index = sketch_rows_md5(targets, cfg, "tgt")
    return query_index_paired_md5(queries, index, cfg)


def _q_genomic_candidates_merged_md5(spark, sf_dir):
    """S12/J8 merge mode, oracle-gated on the md5 lane: the target set
    is sharded in two, each shard builds its own index and answers the
    SAME queries as ``genomic_candidates_md5``, and the per-shard top-k
    lists re-merge (mode_merge.cpp:209-264).  The DuckDB oracle is the
    GLOBAL single-index SQL verbatim — green means shard-merge ≡
    global index holds against an independent engine, not just against
    our own query_index (test_sharded_query_merge_equals_global_index
    proves the Mueller lane the same way in pytest)."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.operators.genomic import (
        GenomicConfig,
        merge_query_results,
        query_index_md5,
        sketch_rows_md5,
    )

    docs = _t(spark, sf_dir, "documents")
    cfg = GenomicConfig(k=8, sketch_size=4, winlen=64, winstride=57,
                        num_windows=3, max_candidates=2)
    targets = docs.select(
        F.col("doc_id").alias("tgt"), F.col("text").alias("seq")
    )
    queries = docs.where(
        (F.col("doc_id") % 5 == 0) & (F.length("text") >= 150)
    ).select(
        F.col("doc_id").alias("qid"),
        F.substring("text", 11, 140).alias("seq"),
    )
    shard_results = [
        query_index_md5(
            queries,
            sketch_rows_md5(
                targets.where(F.col("tgt") % 2 == i), cfg, "tgt"
            ),
            cfg,
        )
        for i in (0, 1)
    ]
    return merge_query_results(shard_results, cfg)


def _q_pipeline_clusters_kperm(spark, sf_dir):
    """Full production pipeline on documents (pytest-gated; flagship
    entry() and bench run THIS lane)."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.config import DedupConfig
    from metacache_mpi_spark.plans.pipeline import dedup_pipeline

    docs = _t(spark, sf_dir, "documents").withColumn(
        "url", F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
    )
    cfg = DedupConfig(shingle_k=8, winnow_w=30, min_substring_overlap=120)
    return dedup_pipeline(docs, cfg).clusters


def _q_pipeline_clusters(spark, sf_dir):
    """Full dedup_pipeline (prepare → sketch → bands → cap → gate →
    Jaccard verify → connected components) under ``sketch_mode="md5"``:
    the same pipeline code path as production with the SQL-expressible
    sketch, so the ENTIRE funnel down to cluster assignments is
    oracle-gated in DuckDB.  The winnow/substring lane is inert in this
    mode (declared in DedupConfig.sketch_mode)."""
    from pyspark.sql import functions as F

    from metacache_mpi_spark.config import DedupConfig
    from metacache_mpi_spark.plans.pipeline import dedup_pipeline

    docs = _t(spark, sf_dir, "documents").withColumn(
        "url", F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
    )
    cfg = DedupConfig(
        shingle_k=8, sketch_size=8, bands=4, rows_per_band=2,
        sketch_mode="md5",
    )
    return dedup_pipeline(docs, cfg).clusters


def _q_source_dup_stats(spark, sf_dir):
    """Per-source duplication report over the oracle-gated md5
    pipeline clusters — THE dedup analysis a webtext curator reads
    first (which domains are mirror farms): per source, doc count,
    non-representative copies (doc_id ≠ cluster_id), and the dup rate
    in milli.  One extra join + map-side-combinable groupBy on top of
    `pipeline_clusters`."""
    from pyspark.sql import functions as F

    clusters = _q_pipeline_clusters(spark, sf_dir)
    src = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        clusters.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("doc_id") != F.col("cluster_id"), 1)
                .otherwise(0)
            ).cast("long").alias("dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "dup_docs",
            F.expr("dup_docs * 1000 div n_docs")
            .cast("long")
            .alias("dup_rate_milli"),
        )
    )


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: production dedup pipeline over sf0.001 documents."""
    return _q_pipeline_clusters_kperm(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDERING CONTRACT: the driver's correctness gate verifies only the
    # FIRST 50 entries per round.  Slots 1-31 hold the queries whose
    # newest driver row is r05 (rotated out by r06's window — after this
    # round no query's newest row is more than 2 rounds old); slots
    # 32-50 hold every query whose IMPLEMENTATION changed in the r07
    # optimization pass (grouped ngram pairs, row-local simhash/winnow,
    # binary span digests, pinned kperm bands, searchsorted verify
    # kernel) plus the crawl/quality lanes riding the shared verify
    # kernel; slots 51+ are r06-green queries whose code did not change
    # — all 81 stay oracle-gated in pytest (test_contract.py)
    # regardless of position.
    return {
        # -- newest driver row is r05 (rotated out by r06) ------------------
        "upsample_repeat": _q_upsample_repeat,
        "hash_split_assign": _q_hash_split_assign,
        "exact_dedup_keep_first": _q_exact_dedup_keep_first,
        "cluster_reps_longest": _q_cluster_reps_longest,
        "cluster_size_histogram": _q_cluster_size_histogram,
        "minhash_signatures": _q_minhash_signatures,
        "lsh_band_buckets": _q_lsh_band_buckets,
        "simhash_fingerprints": _q_simhash_fingerprints,
        "simhash_dup_pairs": _q_simhash_dup_pairs,
        "simhash_banded_pairs": _q_simhash_banded_pairs,
        "winnow_fingerprint_stats": _q_winnow_stats,
        "stop_shingle_survivors": _q_stop_shingle_survivors,
        "token_stats": _q_token_stats,
        "word_freq_scores": _q_word_freq_scores,
        "pii_stats": _q_pii_stats,
        "pii_scrub": _q_pii_scrub,
        "intra_doc_line_dedup": _q_intra_doc_line_dedup,
        "repetition_stats": _q_repetition_stats,
        "boilerplate_lines": _q_boilerplate_lines,
        "source_cap_survivors": _q_source_cap_survivors,
        "index_query_probe_topk": _q_index_query_probe_topk,
        "quality_scores": _q_quality_scores,
        "mixture_sample": _q_mixture_sample,
        "token_budget_pack": _q_token_budget_pack,
        "mixture_report": _q_mixture_report,
        "sequence_pack": _q_sequence_pack,
        "sequence_pack_global": _q_sequence_pack_global,
        "lang_id": _q_lang_id,
        "ann_cosine_topk": _q_ann_cosine_topk,
        "ann_lsh_bucketed": _q_ann_lsh_bucketed,
        "ann_batch_topk": _q_ann_batch_topk,
        # -- implementation changed this round (r07 optimizations) ----------
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_pair_metrics": _q_dedup_pair_metrics,
        "cluster_agreement_lang": _q_cluster_agreement_lang,
        "minhash_lsh_pairs": _q_minhash_lsh_pairs,
        "lsh_star_pairs": _q_lsh_star_pairs,
        "contamination_pairs": _q_contamination_pairs,
        "contamination_pairs_bloom": _q_contamination_pairs_bloom,
        "contiguous_range_hits": _q_contig_hits,
        "pipeline_lsh_pairs": _q_pipeline_lsh_pairs,
        "pipeline_clusters": _q_pipeline_clusters,
        "index_query_probe": _q_index_query_probe,
        "source_dup_stats": _q_source_dup_stats,
        "repeated_spans": _q_repeated_spans,
        "repeated_span_intervals": _q_repeated_span_intervals,
        "exact_substring_dedup": _q_exact_substring_dedup,
        "crawl_diff": _q_crawl_diff,
        "crawl_diff_scored": _q_crawl_diff_scored,
        "quality_gate_survivors": _q_quality_gate_survivors,
        # ---- 50-slot window boundary --------------------------------------
        # r06-green, code unchanged this round (staleness ≤ 1 after r07)
        "ann_ivf_batch_topk": _q_ann_ivf_batch_topk,
        "embedding_contamination_pairs": _q_embedding_contamination_pairs,
        "embedding_contamination_banded": _q_embedding_contamination_banded,
        "genomic_candidates": _q_genomic_candidates,
        "genomic_candidates_paired": _q_genomic_candidates_paired,
        "genomic_candidates_merged": _q_genomic_candidates_merged,
        "genomic_candidates_md5": _q_genomic_candidates_md5,
        "genomic_candidates_paired_md5": _q_genomic_candidates_paired_md5,
        "genomic_candidates_merged_md5": _q_genomic_candidates_merged_md5,
        "classify_lca": _q_classify_lca,
        "abundance_estimate": _q_abundance_estimate,
        "classification_rank_stats": _q_classification_rank_stats,
        "lang_confusion_stats": _q_lang_confusion_stats,
        "matches_per_target": _q_matches_per_target,
        "index_bucket_stats": _q_index_bucket_stats,
        "ann_lsh_dup_pairs": _q_ann_lsh_dup_pairs,
        "value_moments": _q_value_moments,
        "tpch_q1": _q_tpch_q1,
        "top_users_per_event_type": _q_top_users,
        "event_type_cumulative": _q_event_cumulative,
        "merge_topk_sources": _q_merge_topk,
        "star_join_revenue": _q_star_join_revenue,
        "nation_region_rollup": _q_nation_region_rollup,
        "paired_zip_events": _q_paired_zip,
        "sessionize_events": _q_sessionize,
        "props_extract": _q_props_extract,
        "taxon_coverage_stats": _q_taxon_coverage_stats,
        "exact_dup_groups": _q_exact_dup_groups,
        "semantic_dup_candidates": _q_semantic_dup_candidates,
        "semantic_dedup": _q_semantic_dedup,
        "embedding_cosine_dup_pairs": _q_embedding_cosine_dup_pairs,
    }


def oracle_sql() -> dict[str, str]:
    out = {
        "exact_dup_groups": """
            WITH uni AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000 AS doc_id, text
                FROM documents WHERE doc_id % 97 = 0
            )
            SELECT md5(text) AS fp, count(*) AS n_docs, min(doc_id) AS rep_doc_id
            FROM uni GROUP BY md5(text) HAVING count(*) > 1
        """,
        "exact_dedup_keep_first": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        """,
        "ngram_jaccard_pairs": f"""
            WITH {_PAIRS_CTE}
            SELECT a, b,
                   CAST(floor(c * 1000000.0 / (na + nb - c)) AS BIGINT) AS jacc_micro
            FROM jpairs
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE {_PAIRS_CTE},
            sym AS (SELECT a AS u, b AS v FROM jpairs
                    UNION SELECT b, a FROM jpairs),
            reach(node, m) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT s.u, r.m FROM sym s JOIN reach r ON r.node = s.v
            )
            SELECT node AS doc_id, min(m) AS cluster_id FROM reach GROUP BY node
        """,
        # pair-set metrics: LSH-banded pairs (pred) vs exact Jaccard
        # pairs (truth); full-outer + one aggregate, HUGEINT twin of
        # the Spark DECIMAL(38,0) micro arithmetic
        "dedup_pair_metrics": f"""
            WITH {_PAIRS_CTE}{_buckets_after_sh()},
            pred AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                     FROM buckets x JOIN buckets y
                       ON x.band = y.band AND x.bucket = y.bucket
                     WHERE x.doc_id < y.doc_id),
            truth AS (SELECT DISTINCT a, b FROM jpairs),
            oj AS (SELECT p.a IS NOT NULL AS in_p, t.a IS NOT NULL AS in_t
                   FROM pred p FULL JOIN truth t
                     ON p.a = t.a AND p.b = t.b),
            c AS (SELECT
                    sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END) AS tp,
                    sum(CASE WHEN NOT in_t THEN 1 ELSE 0 END) AS fp,
                    sum(CASE WHEN NOT in_p THEN 1 ELSE 0 END) AS fn
                  FROM oj)
            SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
                   CAST(fn AS BIGINT) AS fn,
                   CAST(CASE WHEN tp + fp = 0 THEN 1000000 ELSE
                     (CAST(tp AS HUGEINT) * 1000000) // (tp + fp)
                   END AS BIGINT) AS precision_micro,
                   CAST(CASE WHEN tp + fn = 0 THEN 1000000 ELSE
                     (CAST(tp AS HUGEINT) * 1000000) // (tp + fn)
                   END AS BIGINT) AS recall_micro,
                   CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 1000000 ELSE
                     (CAST(2 * tp AS HUGEINT) * 1000000)
                       // (2 * tp + fp + fn)
                   END AS BIGINT) AS f1_micro
            FROM c
        """,
        # contingency-table Rand decomposition: dedup clusters vs the
        # lang partition, pair counts from group sizes only
        "cluster_agreement_lang": f"""
            WITH RECURSIVE {_PAIRS_CTE},
            sym AS (SELECT a AS u, b AS v FROM jpairs
                    UNION SELECT b, a FROM jpairs),
            reach(node, m) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT s.u, r.m FROM sym s JOIN reach r ON r.node = s.v
            ),
            comp AS (SELECT node, min(m) AS cluster_id
                     FROM reach GROUP BY node),
            joint AS (SELECT c.cluster_id AS pc, d.lang AS tc,
                             count(*) AS n
                      FROM comp c JOIN documents d ON d.doc_id = c.node
                      GROUP BY 1, 2),
            tpx AS (SELECT sum((CAST(n AS HUGEINT) * (n - 1)) // 2)
                             AS tp_pairs,
                           sum(n) AS n_docs FROM joint),
            pp AS (SELECT sum((CAST(n AS HUGEINT) * (n - 1)) // 2)
                            AS pred_pairs
                   FROM (SELECT sum(n) AS n FROM joint GROUP BY pc)),
            tt AS (SELECT sum((CAST(n AS HUGEINT) * (n - 1)) // 2)
                            AS truth_pairs
                   FROM (SELECT sum(n) AS n FROM joint GROUP BY tc))
            SELECT CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(tp_pairs AS BIGINT) AS tp_pairs,
                   CAST(pred_pairs AS BIGINT) AS pred_pairs,
                   CAST(truth_pairs AS BIGINT) AS truth_pairs,
                   CAST(CASE WHEN pred_pairs = 0 THEN 1000000 ELSE
                     (tp_pairs * 1000000) // pred_pairs
                   END AS BIGINT) AS precision_micro,
                   CAST(CASE WHEN truth_pairs = 0 THEN 1000000 ELSE
                     (tp_pairs * 1000000) // truth_pairs
                   END AS BIGINT) AS recall_micro,
                   CAST(CASE WHEN n_docs < 2 THEN 1000000 ELSE
                     (((CAST(n_docs AS HUGEINT) * (n_docs - 1)) // 2
                       - pred_pairs - truth_pairs + 2 * tp_pairs)
                      * 1000000)
                       // ((CAST(n_docs AS HUGEINT) * (n_docs - 1)) // 2)
                   END AS BIGINT) AS rand_micro
            FROM tpx, pp, tt
        """,
        # longest-text representative per cluster; null text ranks
        # shortest (coalesce -1), ties break on smallest doc_id —
        # the exact rule the Spark struct-min aggregate implements
        "cluster_reps_longest": f"""
            WITH RECURSIVE {_PAIRS_CTE},
            sym AS (SELECT a AS u, b AS v FROM jpairs
                    UNION SELECT b, a FROM jpairs),
            reach(node, m) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT s.u, r.m FROM sym s JOIN reach r ON r.node = s.v
            ),
            comp AS (SELECT node, min(m) AS cluster_id
                     FROM reach GROUP BY node),
            ranked AS (
                SELECT comp.cluster_id, d.doc_id AS rep_id,
                       row_number() OVER (
                           PARTITION BY comp.cluster_id
                           ORDER BY coalesce(length(d.text), -1) DESC,
                                    d.doc_id
                       ) AS rn
                FROM comp JOIN documents d ON d.doc_id = comp.node)
            SELECT cluster_id, rep_id FROM ranked WHERE rn = 1
        """,
        "cluster_size_histogram": f"""
            WITH RECURSIVE {_PAIRS_CTE},
            sym AS (SELECT a AS u, b AS v FROM jpairs
                    UNION SELECT b, a FROM jpairs),
            reach(node, m) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT s.u, r.m FROM sym s JOIN reach r ON r.node = s.v
            ),
            comp AS (SELECT node, min(m) AS cluster_id FROM reach GROUP BY node),
            csizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
            SELECT cluster_size, count(*) AS n_clusters FROM csizes GROUP BY cluster_size
        """,
        "minhash_signatures": f"""
            WITH {_MINHASH_CTE}
            SELECT doc_id, CAST(lane AS BIGINT) AS lane, minh FROM mh
        """,
        "lsh_band_buckets": f"""
            WITH {_BUCKETS_CTE}
            SELECT doc_id, band, bucket FROM buckets
        """,
        "minhash_lsh_pairs": f"""
            WITH {_BUCKETS_CTE}
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM buckets x JOIN buckets y
              ON x.band = y.band AND x.bucket = y.bucket
            WHERE x.doc_id < y.doc_id
        """,
        # star oversize policy (cap 4): in-cap buckets all-pairs,
        # oversized buckets hub edges (bucket-min doc -> member)
        "lsh_star_pairs": f"""
            WITH {_BUCKETS_CTE},
            sized AS (
                SELECT band, bucket, doc_id,
                       count(*) OVER (PARTITION BY band, bucket) AS n,
                       min(doc_id) OVER (PARTITION BY band, bucket) AS hub
                FROM buckets),
            small AS (
                SELECT x.doc_id AS a, y.doc_id AS b
                FROM sized x JOIN sized y
                  ON x.band = y.band AND x.bucket = y.bucket
                WHERE x.n BETWEEN 2 AND {_STAR_CAP}
                  AND x.doc_id < y.doc_id),
            star AS (
                SELECT hub AS a, doc_id AS b FROM sized
                WHERE n > {_STAR_CAP} AND doc_id <> hub)
            SELECT DISTINCT a, b FROM (
                SELECT * FROM small UNION ALL SELECT * FROM star)
        """,
        "pipeline_lsh_pairs": f"""
            WITH {_MD5_PIPE_CTE}
            SELECT a, b, CAST(band_hits AS BIGINT) AS band_hits
            FROM cands WHERE band_hits >= 1
        """,
        "pipeline_clusters": f"""
            WITH RECURSIVE {_MD5_PIPE_VERIFIED_CTE},
            {_MD5_CLUSTERS_CTE}
            SELECT doc_id, cluster_id FROM cl
        """,
        "source_dup_stats": f"""
            WITH RECURSIVE {_MD5_PIPE_VERIFIED_CTE},
            {_MD5_CLUSTERS_CTE}
            SELECT d.source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN cl.doc_id <> cl.cluster_id
                                 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
                   CAST(sum(CASE WHEN cl.doc_id <> cl.cluster_id
                                 THEN 1 ELSE 0 END) * 1000 // count(*)
                        AS BIGINT) AS dup_rate_milli
            FROM cl JOIN documents d USING (doc_id)
            GROUP BY d.source
        """,
        "simhash_fingerprints": f"""
            WITH {_simhash_votes_sql()}
            SELECT doc_id, simhash FROM fp
        """,
        "simhash_dup_pairs": f"""
            WITH {_simhash_votes_sql()}
            SELECT x.doc_id AS a, y.doc_id AS b,
                   CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
            FROM fp x JOIN fp y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
        """,
        # the banded lane must reproduce the brute-force pair set exactly
        # (pigeonhole: 4 bands > 3 bit flips), so its oracle IS the brute SQL
        "simhash_banded_pairs": f"""
            WITH {_simhash_votes_sql()}
            SELECT x.doc_id AS a, y.doc_id AS b,
                   CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
            FROM fp x JOIN fp y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
        """,
        "winnow_fingerprint_stats": """
            WITH pos AS (SELECT doc_id, text, unnest(range(1, length(text) - 6)) AS i
                         FROM documents WHERE length(text) >= 8),
            ph AS (SELECT doc_id, i, md5(substr(text, CAST(i AS INT), 8)) AS h FROM pos),
            sel AS (SELECT doc_id,
                           min(h) OVER (PARTITION BY doc_id ORDER BY i
                                        ROWS BETWEEN CURRENT ROW AND 49 FOLLOWING) AS fp
                    FROM ph)
            SELECT doc_id, count(DISTINCT fp) AS n_fps, min(fp) AS min_fp
            FROM sel GROUP BY doc_id
        """,
        "stop_shingle_survivors": f"""
            WITH {_DISC_CTE}
            SELECT doc_id, count(*) AS n_disc FROM disc GROUP BY doc_id
        """,
        "token_stats": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 \\n\\t]')) AS BIGINT) AS n_bpe_pieces,
                   CAST(length(text) AS BIGINT) AS n_chars_text
            FROM documents
        """,
        "quality_scores": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_text,
                   CAST(floor(length(regexp_replace(text, '[^a-z]', '', 'g')) * 1000.0 / length(text)) AS BIGINT) AS alpha_milli,
                   CAST(floor(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1000.0 / length(text)) AS BIGINT) AS digit_milli,
                   CAST(floor(length(regexp_replace(text, '[^ ]', '', 'g')) * 1000.0 / length(text)) AS BIGINT) AS space_milli,
                   {_occ(' the ')} + {_occ(' and ')} + {_occ(' of ')} AS en_stop_hits
            FROM documents WHERE length(text) > 0
        """,
        "quality_gate_survivors": """
            WITH base AS (
              SELECT doc_id, string_split(text, ' ') AS w, text
              FROM documents WHERE length(text) > 0),
            b2 AS (
              SELECT doc_id, text, len(w) AS n_tokens,
                     CAST(floor(length(regexp_replace(text, '[^a-z]', '', 'g'))
                          * 1000.0 / length(text)) AS BIGINT) AS alpha_milli,
                     (len(w) - len(list_distinct(w))) * 1000 // len(w)
                       AS dup_word_milli,
                     w
              FROM base),
            grams AS (
              SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram
              FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                    FROM b2 WHERE len(w) >= 2)),
            top AS (
              SELECT doc_id, max(c) * 1000 // sum(c) AS top_2gram_milli
              FROM (SELECT doc_id, gram, count(*) AS c
                    FROM grams GROUP BY doc_id, gram)
              GROUP BY doc_id)
            SELECT b.doc_id, CAST(length(b.text) AS BIGINT) AS n_chars_text
            FROM b2 b LEFT JOIN top USING (doc_id)
            WHERE n_tokens >= 40 AND alpha_milli >= 820
              AND dup_word_milli <= 600
              AND COALESCE(top_2gram_milli, 0) <= 40
        """,
        "word_freq_scores": """
            WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                          FROM documents),
            vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
                      FROM toks GROUP BY w),
            tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_words
                    FROM vocab),
            sc AS (SELECT t.doc_id,
                          (v.cnt * 1000000) // tot.total_words AS ppm,
                          CASE WHEN v.cnt < 2 THEN 1 ELSE 0 END AS oov
                   FROM toks t JOIN vocab v ON t.w = v.w CROSS JOIN tot)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_words,
                   CAST((sum(ppm)) // count(*) AS BIGINT) AS mean_word_ppm,
                   CAST((sum(oov) * 1000) // count(*) AS BIGINT) AS oov_milli
            FROM sc GROUP BY doc_id
        """,
        "pii_stats": """
            WITH aug AS (SELECT doc_id, """ + _PII_SUFFIX_SQL + """ AS t0
                         FROM documents)
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t0, '""" + _PII_EMAIL + """')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(t0, '""" + _PII_IPV4 + """')) AS BIGINT) AS n_ipv4,
                   CAST(len(regexp_extract_all(t0, '""" + _PII_PHONE + """')) AS BIGINT) AS n_phones
            FROM aug
        """,
        "pii_scrub": """
            WITH aug AS (SELECT doc_id, """ + _PII_SUFFIX_SQL + """ AS t0
                         FROM documents),
            s1 AS (SELECT doc_id, t0,
                          regexp_replace(t0, '""" + _PII_EMAIL + """', '<EMAIL>', 'g') AS t1
                   FROM aug),
            s2 AS (SELECT doc_id, t0, t1,
                          regexp_replace(t1, '""" + _PII_IPV4 + """', '<IP>', 'g') AS t2
                   FROM s1)
            SELECT doc_id,
                   md5(regexp_replace(t2, '""" + _PII_PHONE + """', '<PHONE>', 'g')) AS scrub_md5,
                   CAST(len(regexp_extract_all(t0, '""" + _PII_EMAIL + """'))
                      + len(regexp_extract_all(t1, '""" + _PII_IPV4 + """'))
                      + len(regexp_extract_all(t2, '""" + _PII_PHONE + """')) AS BIGINT) AS n_redactions
            FROM s2
        """,
        "intra_doc_line_dedup": """
            WITH L AS (SELECT doc_id, string_split(text, ' ') AS lns
                       FROM documents),
            K AS (SELECT doc_id, lns,
                         list_filter(lns,
                           (x, i) -> list_position(lns, x) = i) AS kept
                  FROM L)
            SELECT doc_id,
                   md5(array_to_string(kept, ' ')) AS clean_md5,
                   CAST(len(kept) AS BIGINT) AS n_kept,
                   CAST(len(lns) - len(kept) AS BIGINT) AS n_dropped
            FROM K
        """,
        "mixture_sample": f"""
            WITH thr(source, t) AS (VALUES {_mix_threshold_values()})
            SELECT d.doc_id, d.source
            FROM documents d JOIN thr ON thr.source = d.source
            WHERE substr(md5(concat('mix', ':', CAST(d.doc_id AS VARCHAR))),
                         1, 8) < thr.t
        """,
        "token_budget_pack": """
            WITH toks AS (
              SELECT doc_id, source,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents),
            cum AS (
              SELECT doc_id, source, n_tokens,
                     CAST(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_tokens
              FROM toks)
            SELECT doc_id, source, n_tokens, cum_tokens
            FROM cum WHERE cum_tokens <= 800
        """,
        "mixture_report": """
            WITH per AS (
              SELECT source,
                     CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
              FROM documents GROUP BY source)
            SELECT source, n_docs, n_tokens,
                   CAST(CAST(n_tokens AS HUGEINT) * 1000000
                        // CAST(sum(n_tokens) OVER () AS HUGEINT)
                        AS BIGINT) AS share_ppm
            FROM per
        """,
        "hash_split_assign": f"""
            SELECT doc_id, {_split_case_sql()} AS split FROM documents
        """,
        "upsample_repeat": f"""
            WITH f(source, n_full, t) AS (VALUES {_repeat_values_sql()}),
            base AS (
              SELECT d.doc_id, d.source,
                     coalesce(f.n_full, 1)
                     + CASE WHEN coalesce(f.t, '00000000') >
                         substr(md5(concat('rep', ':',
                                    CAST(d.doc_id AS VARCHAR))), 1, 8)
                       THEN 1 ELSE 0 END AS n
              FROM documents d LEFT JOIN f USING (source))
            SELECT doc_id, source,
                   CAST(unnest(range(0, n)) AS BIGINT) AS rep_idx
            FROM base WHERE n > 0
        """,
        "sequence_pack": """
            WITH toks AS (
              SELECT doc_id, source,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents),
            cum AS (
              SELECT doc_id, source, n_tokens,
                     CAST(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens AS BIGINT) AS start_offset
              FROM toks)
            SELECT doc_id, source, n_tokens, start_offset,
                   CAST(start_offset // 128 AS BIGINT) AS chunk_first,
                   CAST((start_offset + n_tokens - 1) // 128 AS BIGINT)
                     AS chunk_last
            FROM cum
        """,
        "sequence_pack_global": """
            WITH toks AS (
              SELECT doc_id, source,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents),
            cum AS (
              SELECT doc_id, source, n_tokens,
                     CAST(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens AS BIGINT) AS start_offset
              FROM toks),
            pk AS (
              SELECT doc_id, source, n_tokens, start_offset,
                     CAST(start_offset // 128 AS BIGINT) AS cf,
                     CAST((start_offset + n_tokens - 1) // 128 AS BIGINT)
                       AS cl
              FROM cum),
            per AS (SELECT source, max(cl) + 1 AS n FROM pk GROUP BY source),
            bases AS (
              SELECT source,
                     CAST(coalesce(sum(n) OVER (
                       ORDER BY source
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS b
              FROM per)
            SELECT pk.doc_id, pk.source, pk.n_tokens, pk.start_offset,
                   pk.cf + bases.b AS chunk_first,
                   pk.cl + bases.b AS chunk_last
            FROM pk JOIN bases USING (source)
        """,
        "repetition_stats": """
            WITH base AS (
              SELECT doc_id,
                     string_split(text, ' ') AS w,
                     string_split(text, chr(10)) AS l
              FROM documents WHERE length(text) > 0),
            b2 AS (
              SELECT doc_id,
                     CAST(len(w) AS BIGINT) AS n_words,
                     CAST((len(w) - len(list_distinct(w))) * 1000 // len(w)
                          AS BIGINT) AS dup_word_milli,
                     CAST((len(l) - len(list_distinct(l))) * 1000 // len(l)
                          AS BIGINT) AS dup_line_milli
              FROM base),
            grams AS (
              SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram
              FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                    FROM base WHERE len(w) >= 2)),
            top AS (
              SELECT doc_id,
                     CAST(max(c) * 1000 // sum(c) AS BIGINT)
                       AS top_2gram_milli
              FROM (SELECT doc_id, gram, count(*) AS c
                    FROM grams GROUP BY doc_id, gram)
              GROUP BY doc_id)
            SELECT b2.doc_id, n_words, dup_word_milli, dup_line_milli,
                   COALESCE(top_2gram_milli, 0) AS top_2gram_milli
            FROM b2 LEFT JOIN top ON top.doc_id = b2.doc_id
        """,
        "repeated_spans": f"""
            WITH {_SPANS_CTE}
            SELECT doc_id, pos, h AS span_hash, n_occurrences
            FROM srn WHERE n_occurrences >= 2
        """,
        "repeated_span_intervals": f"""
            WITH {_SPANS_CTE}
            SELECT doc_id, s, e FROM sp_merged
        """,
        "exact_substring_dedup": f"""
            WITH {_SPANS_CTE},
            pos2 AS (SELECT t.doc_id, CAST(i AS BIGINT) AS i,
                            t.w[CAST(i AS INT)] AS tok
                     FROM toks t, unnest(range(1, len(t.w) + 1)) AS u(i)),
            kept AS (SELECT p.doc_id, p.i, p.tok FROM pos2 p
                     LEFT JOIN sp_merged m
                       ON p.doc_id = m.doc_id AND p.i BETWEEN m.s AND m.e
                     WHERE m.s IS NULL),
            agg AS (SELECT doc_id,
                           string_agg(tok, ' ' ORDER BY i) AS clean_text,
                           count(*) AS n_tokens_kept
                    FROM kept GROUP BY doc_id),
            rm AS (SELECT doc_id, sum(e - s + 1) AS n_removed
                   FROM sp_merged GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(a.clean_text, '') AS clean_text,
                   CAST(coalesce(a.n_tokens_kept, 0) AS BIGINT)
                     AS n_tokens_kept,
                   CAST(coalesce(rm.n_removed, 0) AS BIGINT)
                     AS n_tokens_removed
            FROM documents d
            LEFT JOIN agg a USING (doc_id)
            LEFT JOIN rm USING (doc_id)
            WHERE d.text IS NOT NULL
        """,
        "contamination_pairs": f"""
            WITH {_DISC_CTE},
            esh AS (SELECT doc_id AS eval_id, sh FROM sh0
                    WHERE doc_id % 20 = 3),
            sizes AS (SELECT eval_id, count(*) AS n_eval_sh
                      FROM esh GROUP BY eval_id),
            hits AS (SELECT d.doc_id, e.eval_id,
                            count(*) AS common_shingles
                     FROM disc d JOIN esh e USING (sh)
                     WHERE d.doc_id <> e.eval_id
                     GROUP BY d.doc_id, e.eval_id)
            SELECT h.doc_id, h.eval_id,
                   CAST(common_shingles AS BIGINT) AS common_shingles,
                   CAST(common_shingles * 1000 // n_eval_sh AS BIGINT)
                     AS containment_milli
            FROM hits h JOIN sizes s ON s.eval_id = h.eval_id
            WHERE common_shingles * 1000 // n_eval_sh >= 500
        """,
        "index_query_probe": f"""
            WITH {_QPROBE_IDX_CTE},
            qall AS (
              SELECT * FROM (
                SELECT doc_id + 100000000 AS qid,
                       'd/' || CAST(doc_id AS VARCHAR) AS url,
                       'probe' AS text
                FROM documents WHERE doc_id % 8 = 1
                UNION ALL
                {_QPROBE_QN_SQL})
              WHERE text IS NOT NULL AND length(text) > 0),
            urlm AS (SELECT q.qid, q.url, i.doc_id AS m
                     FROM qall q JOIN idx i USING (url)),
            nov AS (SELECT q.* FROM qall q
                    LEFT JOIN idx i USING (url)
                    WHERE i.doc_id IS NULL),
            {_QPROBE_LIFECYCLE_CTE}
            SELECT qid AS doc_id, url, 'url' AS match_kind,
                   m AS matched_doc_id,
                   CAST(NULL AS BIGINT) AS jaccard_milli
            FROM urlm
            UNION ALL
            SELECT n.qid AS doc_id, n.url,
                   CASE WHEN b.m IS NOT NULL THEN 'content'
                        ELSE 'none' END AS match_kind,
                   b.m AS matched_doc_id, b.jm AS jaccard_milli
            FROM nov n LEFT JOIN best b ON b.qid = n.qid AND b.rn = 1
        """,
        "index_query_probe_topk": f"""
            WITH {_QPROBE_IDX_CTE},
            nov AS (SELECT * FROM ({_QPROBE_QN_SQL})
                    WHERE text IS NOT NULL AND length(text) > 0),
            {_QPROBE_LIFECYCLE_CTE}
            SELECT n.qid AS doc_id, n.url,
                   CASE WHEN b.m IS NOT NULL THEN 'content'
                        ELSE 'none' END AS match_kind,
                   b.m AS matched_doc_id, b.jm AS jaccard_milli,
                   CAST(b.rn AS INT) AS rank
            FROM nov n LEFT JOIN best b ON b.qid = n.qid AND b.rn <= 2
        """,
        "crawl_diff": f"""
            WITH {_CRAWL_DIFF_CTE}
            SELECT url, status, old_doc_id, new_doc_id FROM j
        """,
        "crawl_diff_scored": f"""
            WITH {_CRAWL_DIFF_CTE},
            ch AS (SELECT url, otext AS t, 'a' AS side FROM j
                   WHERE status = 'changed'
                   UNION ALL
                   SELECT url, ntext, 'b' FROM j WHERE status = 'changed'),
            shc AS (SELECT DISTINCT url, side,
                           substr(t, CAST(i AS INT), 8) AS sh
                    FROM (SELECT url, side, t,
                                 unnest(range(1, length(t) - 6)) AS i
                          FROM ch WHERE length(t) >= 8)),
            sz AS (SELECT url, side, count(*) AS n FROM shc
                   GROUP BY url, side),
            sz2 AS (SELECT url,
                           coalesce(max(CASE WHEN side = 'a' THEN n END), 0)
                             AS na,
                           coalesce(max(CASE WHEN side = 'b' THEN n END), 0)
                             AS nb
                    FROM sz GROUP BY url),
            its AS (SELECT a.url, count(*) AS c
                    FROM shc a JOIN shc b
                      ON a.url = b.url AND a.sh = b.sh
                     AND a.side = 'a' AND b.side = 'b'
                    GROUP BY a.url),
            jm AS (SELECT cu.url,
                          CASE WHEN coalesce(na, 0) + coalesce(nb, 0) = 0
                               THEN 0
                               ELSE CAST(floor(
                                 CAST(coalesce(c, 0) AS DOUBLE)
                                 / (na + nb - coalesce(c, 0)) * 1000)
                                 AS BIGINT) END AS m
                   FROM (SELECT DISTINCT url FROM j
                         WHERE status = 'changed') cu
                   LEFT JOIN sz2 USING (url)
                   LEFT JOIN its USING (url))
            SELECT j.url, j.status, j.old_doc_id, j.new_doc_id,
                   CASE WHEN j.status = 'changed' THEN coalesce(jm.m, 0)
                        END AS change_jaccard_milli
            FROM j LEFT JOIN jm ON jm.url = j.url
        """,
        "source_cap_survivors": """
            SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY n_chars DESC,
                                                 doc_id ASC) AS rn
              FROM documents)
            WHERE rn <= 10
        """,
        "boilerplate_lines": """
            WITH ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr
                        FROM documents),
            l AS (SELECT doc_id, UNNEST(arr) AS line,
                         generate_subscripts(arr, 1) AS pos
                  FROM ls),
            lh AS (SELECT doc_id, pos, line, md5(line) AS h FROM l),
            boiler AS (
              SELECT h FROM (SELECT DISTINCT doc_id, h FROM lh
                             WHERE length(line) >= 10)
              GROUP BY h HAVING count(*) >= 2),
            tagged AS (SELECT lh.doc_id, lh.pos, lh.line,
                              (boiler.h IS NOT NULL) AS is_boiler
                       FROM lh LEFT JOIN boiler ON boiler.h = lh.h)
            SELECT doc_id,
                   COALESCE(string_agg(CASE WHEN NOT is_boiler THEN line END,
                                       chr(10) ORDER BY pos), '')
                     AS clean_text,
                   CAST(sum(CASE WHEN NOT is_boiler THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_lines_kept,
                   CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_lines_dropped
            FROM tagged GROUP BY doc_id
        """,
        "lang_id": f"""
            WITH s AS (
              SELECT doc_id, lang,
                     {_occ(' the ')} + {_occ(' and ')} + {_occ(' of ')} AS en_score,
                     {_occ(' der ')} + {_occ(' und ')} + {_occ(' die ')} AS de_score,
                     {_occ(' el ')} + {_occ(' la ')} + {_occ(' que ')} AS es_score
              FROM documents)
            SELECT doc_id, lang, en_score, de_score, es_score,
                   CASE WHEN en_score >= de_score AND en_score >= es_score THEN 'en'
                        WHEN de_score >= es_score THEN 'de'
                        ELSE 'es' END AS pred_lang
            FROM s
        """,
        "ann_cosine_topk": f"""
            WITH {_ANN_SCORE},
            ranked AS (SELECT vec_id, label, cos_micro,
                              row_number() OVER (ORDER BY cos_micro DESC, vec_id ASC) AS rank
                       FROM scored)
            SELECT vec_id, label, cos_micro, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 10
        """,
        "embedding_cosine_dup_pairs": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
            SELECT x.vec_id AS a, y.vec_id AS b,
                   CAST(floor(
                     list_dot_product(x.emb, y.emb)
                     / sqrt(list_dot_product(x.emb, x.emb) * list_dot_product(y.emb, y.emb))
                     * 1000000.0 + 0.5) AS BIGINT) AS cos_micro
            FROM e x JOIN e y ON x.vec_id < y.vec_id
            WHERE CAST(floor(
                     list_dot_product(x.emb, y.emb)
                     / sqrt(list_dot_product(x.emb, x.emb) * list_dot_product(y.emb, y.emb))
                     * 1000000.0 + 0.5) AS BIGINT) >= 350000
        """,
        "semantic_dup_candidates": """
            WITH asg AS (SELECT vec_id, bucket FROM
                   read_parquet('/tmp/mcs_oracle_views/semdedup_assign/*.parquet')),
            e AS (SELECT a.vec_id, a.bucket,
                         CAST(m.embedding AS DOUBLE[]) AS emb
                  FROM asg a JOIN embeddings m USING (vec_id))
            SELECT x.vec_id AS a, y.vec_id AS b, x.bucket,
                   CAST(floor(
                     list_dot_product(x.emb, y.emb)
                     / sqrt(list_dot_product(x.emb, x.emb)
                            * list_dot_product(y.emb, y.emb))
                     * 1000000.0 + 0.5) AS BIGINT) AS cos_micro
            FROM e x JOIN e y
              ON x.bucket = y.bucket AND x.vec_id < y.vec_id
            WHERE CAST(floor(
                     list_dot_product(x.emb, y.emb)
                     / sqrt(list_dot_product(x.emb, x.emb)
                            * list_dot_product(y.emb, y.emb))
                     * 1000000.0 + 0.5) AS BIGINT) >= 350000
        """,
        "semantic_dedup": """
            WITH asg AS (SELECT vec_id, bucket FROM
                   read_parquet('/tmp/mcs_oracle_views/semdedup_assign/*.parquet')),
            e AS (SELECT a.vec_id, a.bucket,
                         CAST(m.embedding AS DOUBLE[]) AS emb
                  FROM asg a JOIN embeddings m USING (vec_id)),
            pairs AS (SELECT y.vec_id AS b,
                     CAST(floor(
                       list_dot_product(x.emb, y.emb)
                       / sqrt(list_dot_product(x.emb, x.emb)
                              * list_dot_product(y.emb, y.emb))
                       * 1000000.0 + 0.5) AS BIGINT) AS cos_micro
                      FROM e x JOIN e y
                        ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
            prior AS (SELECT b, max(cos_micro) AS mx FROM pairs
                      WHERE cos_micro >= 350000 GROUP BY b)
            SELECT a.vec_id, a.bucket,
                   CAST(coalesce(p.mx, -1000001) AS BIGINT)
                     AS max_prior_cos_micro,
                   p.mx IS NOT NULL AS removed
            FROM asg a LEFT JOIN prior p ON p.b = a.vec_id
        """,
        "ann_batch_topk": _ANN_BATCH_TOPK_SQL,
        "ann_ivf_batch_topk": _ANN_BATCH_TOPK_SQL,
        "embedding_contamination_pairs": """
            WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                       FROM embeddings WHERE vec_id % 20 <> 3),
            e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                  FROM embeddings WHERE vec_id % 20 = 3)
            SELECT c.vec_id AS a, e.vec_id AS b,
                   CAST(floor(
                     list_dot_product(c.emb, e.emb)
                     / sqrt(list_dot_product(c.emb, c.emb)
                            * list_dot_product(e.emb, e.emb))
                     * 1000000.0 + 0.5) AS BIGINT) AS cos_micro
            FROM c, e
            WHERE CAST(floor(
                     list_dot_product(c.emb, e.emb)
                     / sqrt(list_dot_product(c.emb, c.emb)
                            * list_dot_product(e.emb, e.emb))
                     * 1000000.0 + 0.5) AS BIGINT) >= 350000
        """,
        "embedding_contamination_banded": """
            WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                       FROM embeddings WHERE vec_id % 20 <> 3),
            e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                  FROM embeddings WHERE vec_id % 20 = 3),
            cb AS (SELECT vec_id, emb, unnest(range(0, 16)) AS band FROM c),
            cbb AS (SELECT vec_id, band,
                           (CASE WHEN emb[CAST(band * 2 + 1 AS INT)] > 0 THEN 1 ELSE 0 END)
                         + (CASE WHEN emb[CAST(band * 2 + 2 AS INT)] > 0 THEN 2 ELSE 0 END) AS bband
                    FROM cb),
            sizes AS (SELECT band, bband, count(*) AS n
                      FROM cbb GROUP BY band, bband),
            keep AS (SELECT band, bband FROM sizes WHERE n <= 1024),
            ebnd AS (SELECT vec_id, emb, unnest(range(0, 16)) AS band FROM e),
            ebb AS (SELECT vec_id, band,
                           (CASE WHEN emb[CAST(band * 2 + 1 AS INT)] > 0 THEN 1 ELSE 0 END)
                         + (CASE WHEN emb[CAST(band * 2 + 2 AS INT)] > 0 THEN 2 ELSE 0 END) AS bband
                    FROM ebnd),
            cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
                     FROM cbb x JOIN keep USING (band, bband)
                     JOIN ebb y USING (band, bband))
            SELECT a, b,
                   CAST(floor(
                     list_dot_product(c.emb, e.emb)
                     / sqrt(list_dot_product(c.emb, c.emb)
                            * list_dot_product(e.emb, e.emb))
                     * 1000000.0 + 0.5) AS BIGINT) AS cos_micro
            FROM cand JOIN c ON c.vec_id = a JOIN e ON e.vec_id = b
            WHERE CAST(floor(
                     list_dot_product(c.emb, e.emb)
                     / sqrt(list_dot_product(c.emb, c.emb)
                            * list_dot_product(e.emb, e.emb))
                     * 1000000.0 + 0.5) AS BIGINT) >= 350000
        """,
        "ann_lsh_bucketed": """
            WITH wb AS (
              SELECT vec_id, embedding,
                     CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                        + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
                        + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
                        + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
                        + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
                        + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
                        + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
                        + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS BIGINT) AS bucket
              FROM embeddings),
            q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe, bucket AS qbucket
                  FROM wb WHERE vec_id = 0),
            scored AS (SELECT e.vec_id, e.bucket,
                              CAST(floor(
                                list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
                                / sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                                       * list_dot_product(q.qe, q.qe))
                                * 1000000.0 + 0.5) AS BIGINT) AS cos_micro
                       FROM wb e, q
                       WHERE e.vec_id <> 0 AND e.bucket = q.qbucket),
            ranked AS (SELECT vec_id, bucket, cos_micro,
                              row_number() OVER (ORDER BY cos_micro DESC, vec_id ASC) AS rank
                       FROM scored)
            SELECT vec_id, bucket, cos_micro, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 10
        """,
        "ann_lsh_dup_pairs": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
            bd AS (SELECT vec_id, emb, unnest(range(0, 16)) AS band FROM e),
            bb AS (SELECT vec_id, band,
                          (CASE WHEN emb[CAST(band * 2 + 1 AS INT)] > 0 THEN 1 ELSE 0 END)
                        + (CASE WHEN emb[CAST(band * 2 + 2 AS INT)] > 0 THEN 2 ELSE 0 END) AS bband
                   FROM bd),
            cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
                     FROM bb x JOIN bb y
                       ON x.band = y.band AND x.bband = y.bband
                      AND x.vec_id < y.vec_id)
            SELECT a, b,
                   CAST(floor(
                     list_dot_product(ea.emb, eb.emb)
                     / sqrt(list_dot_product(ea.emb, ea.emb) * list_dot_product(eb.emb, eb.emb))
                     * 1000000.0 + 0.5) AS BIGINT) AS cos_micro
            FROM cand JOIN e ea ON ea.vec_id = a JOIN e eb ON eb.vec_id = b
            WHERE CAST(floor(
                     list_dot_product(ea.emb, eb.emb)
                     / sqrt(list_dot_product(ea.emb, ea.emb) * list_dot_product(eb.emb, eb.emb))
                     * 1000000.0 + 0.5) AS BIGINT) >= 350000
        """,
        "lang_confusion_stats": f"""
            WITH s AS (
              SELECT doc_id, lang,
                     {_occ(' the ')} + {_occ(' and ')} + {_occ(' of ')} AS en_score,
                     {_occ(' der ')} + {_occ(' und ')} + {_occ(' die ')} AS de_score,
                     {_occ(' el ')} + {_occ(' la ')} + {_occ(' que ')} AS es_score
              FROM documents),
            lab AS (SELECT lang AS truth,
                           CASE WHEN en_score >= de_score AND en_score >= es_score THEN 'en'
                                WHEN de_score >= es_score THEN 'de'
                                ELSE 'es' END AS pred
                    FROM s),
            sup AS (SELECT truth AS cls, count(*) AS support FROM lab GROUP BY truth),
            prd AS (SELECT pred AS cls, count(*) AS predicted FROM lab GROUP BY pred),
            tpc AS (SELECT truth AS cls, count(*) AS tp FROM lab WHERE truth = pred GROUP BY truth),
            j AS (SELECT coalesce(sup.cls, prd.cls) AS cls,
                         coalesce(support, 0) AS support,
                         coalesce(predicted, 0) AS predicted,
                         coalesce(tp, 0) AS tp
                  FROM sup FULL OUTER JOIN prd ON sup.cls = prd.cls
                  LEFT JOIN tpc ON coalesce(sup.cls, prd.cls) = tpc.cls)
            SELECT cls, CAST(support AS BIGINT) AS support,
                   CAST(predicted AS BIGINT) AS predicted,
                   CAST(tp AS BIGINT) AS tp,
                   CAST(predicted - tp AS BIGINT) AS fp,
                   CAST(support - tp AS BIGINT) AS fn,
                   CAST(CASE WHEN support > 0 THEN floor(tp * 1000000.0 / support) ELSE 0 END AS BIGINT) AS sensitivity_micro,
                   CAST(CASE WHEN predicted > 0 THEN floor(tp * 1000000.0 / predicted) ELSE 0 END AS BIGINT) AS precision_micro
            FROM j
        """,
        "value_moments": """
            WITH v AS (SELECT event_type,
                              CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
                       FROM events)
            SELECT event_type, count(*) AS n,
                   CAST(sum(v_c) AS BIGINT) AS sum_c,
                   CAST(sum(v_c * v_c) AS BIGINT) AS sum_sq_c,
                   min(v_c) AS min_c, max(v_c) AS max_c
            FROM v GROUP BY event_type
        """,
        "matches_per_target": """
            WITH m AS (SELECT user_id AS qid, event_type AS tgt,
                              CAST(floor(epoch_us(ts) / 60000000.0) AS BIGINT) AS win
                       FROM events),
            c AS (SELECT qid, tgt, min(win) AS beg FROM m GROUP BY qid, tgt
                  HAVING count(*) >= 5),
            r AS (SELECT m.qid, m.tgt, m.win FROM m JOIN c USING (qid, tgt)
                  WHERE m.win >= c.beg AND m.win <= c.beg + 9),
            pw AS (SELECT tgt, qid, win, count(*) AS whits
                   FROM r GROUP BY tgt, qid, win),
            pe AS (SELECT tgt, qid, min(win) AS win_first, max(win) AS win_last,
                          CAST(count(*) AS BIGINT) AS n_windows,
                          CAST(sum(whits) AS BIGINT) AS total_hits
                   FROM pw GROUP BY tgt, qid)
            SELECT tgt,
                   CAST(row_number() OVER (PARTITION BY tgt
                                           ORDER BY win_first, win_last, qid) AS BIGINT) AS pos,
                   qid, win_first, win_last, n_windows, total_hits
            FROM pe
        """,
        "classification_rank_stats": """
            WITH lin(taxid, pos, anc) AS (VALUES
              (5,1,5),(5,2,4),(5,6,3),(5,8,2),(5,9,1),
              (6,1,6),(6,2,4),(6,6,3),(6,8,2),(6,9,1),
              (9,1,9),(9,2,8),(9,6,3),(9,8,2),(9,9,1),
              (4,2,4),(4,6,3),(4,8,2),(4,9,1)),
            q(qid, pred, truth) AS (VALUES
              (0,5,5),(1,6,5),(2,9,5),(3,NULL,5),(4,5,NULL),(5,4,5)),
            rp(taxid, rpos) AS (VALUES (5,1),(6,1),(9,1),(4,2)),
            lca AS (SELECT q2.qid, min(la.pos) AS cpos
                    FROM q q2
                    JOIN lin la ON la.taxid = q2.pred
                    JOIN lin lb ON lb.taxid = q2.truth
                              AND lb.pos = la.pos AND lb.anc = la.anc
                    GROUP BY q2.qid),
            pos AS (SELECT q.qid,
                           coalesce(ap.rpos, 10) AS assigned_pos,
                           coalesce(kp.rpos, 10) AS known_pos,
                           greatest(coalesce(lca.cpos, 10),
                                    coalesce(ap.rpos, 10),
                                    coalesce(kp.rpos, 10)) AS correct_pos
                    FROM q LEFT JOIN rp ap ON ap.taxid = q.pred
                           LEFT JOIN rp kp ON kp.taxid = q.truth
                           LEFT JOIN lca ON lca.qid = q.qid),
            ranks(rpos, rank) AS (VALUES
              (0,'sequence'),(1,'species'),(2,'genus'),(3,'family'),
              (4,'order'),(5,'class'),(6,'phylum'),(7,'kingdom'),
              (8,'domain'),(9,'root')),
            agg AS (SELECT ranks.rank, ranks.rpos,
                           count(*) AS total,
                           sum(CASE WHEN assigned_pos <= ranks.rpos THEN 1 ELSE 0 END) AS assigned,
                           sum(CASE WHEN known_pos <= ranks.rpos THEN 1 ELSE 0 END) AS known,
                           sum(CASE WHEN known_pos < 10 AND correct_pos <= ranks.rpos THEN 1 ELSE 0 END) AS correct,
                           sum(CASE WHEN known_pos < 10 AND correct_pos > known_pos
                                         AND correct_pos > assigned_pos
                                         AND ranks.rpos < correct_pos THEN 1 ELSE 0 END) AS wrong
                    FROM pos, ranks GROUP BY ranks.rank, ranks.rpos)
            SELECT rank, CAST(rpos AS INT) AS rank_pos,
                   CAST(total AS BIGINT) AS total,
                   CAST(assigned AS BIGINT) AS assigned,
                   CAST(known AS BIGINT) AS known,
                   CAST(correct AS BIGINT) AS correct,
                   CAST(wrong AS BIGINT) AS wrong,
                   CAST(CASE WHEN known > 0 THEN floor(correct * 1000000.0 / known) ELSE 0 END AS BIGINT) AS sensitivity_micro,
                   CAST(CASE WHEN correct + wrong > 0 THEN floor(correct * 1000000.0 / (correct + wrong)) ELSE 0 END AS BIGINT) AS precision_micro
            FROM agg
        """,
        "index_bucket_stats": f"""
            WITH {_BUCKETS_CTE},
            sz AS (SELECT band, bucket, count(*) AS sz
                   FROM buckets GROUP BY band, bucket)
            SELECT band,
                   count(*) AS n_buckets,
                   CAST(sum(sz) AS BIGINT) AS sum_sz,
                   CAST(sum(sz * sz) AS BIGINT) AS sum_sq_sz,
                   min(sz) AS min_sz,
                   max(sz) AS max_sz
            FROM sz GROUP BY band
        """,
        "classify_lca": """
            WITH cand(qid, tgt, hits) AS (VALUES
              (0,0,10),(1,0,10),(1,1,8),(2,0,10),(2,3,9),
              (3,2,2),(4,0,10),(4,1,3),(5,5,4),(5,4,4),
              (6,99,10),(7,0,5),(7,3,1)),
            tmap(tgt, taxid) AS (VALUES
              (0,10),(1,11),(2,12),(3,13),(4,14),(5,15)),
            lin(taxid, pos, anc) AS (VALUES
              (10,1,10),(10,2,100),(10,9,1),
              (11,1,11),(11,2,100),(11,9,1),
              (12,1,12),(12,2,100),(12,9,1),
              (13,1,13),(13,2,101),(13,9,1),
              (14,1,14),(14,2,101),(14,9,1),
              (15,1,15),(15,2,101),(15,9,1)),
            ranked AS (SELECT c.qid, c.hits, m.taxid,
                              row_number() OVER (PARTITION BY c.qid
                                                 ORDER BY c.hits DESC, c.tgt ASC) AS rn
                       FROM cand c JOIN tmap m USING (tgt)),
            thr AS (SELECT qid, hits AS best_hits,
                           CASE WHEN hits > 3 THEN (hits - 3) * 0.5
                                ELSE 0 END AS t
                    FROM ranked WHERE rn = 1),
            inc AS (SELECT r.qid, r.taxid FROM ranked r JOIN thr USING (qid)
                    WHERE r.rn = 1 OR r.hits > thr.t),
            n_inc AS (SELECT qid, count(*) AS n FROM inc GROUP BY qid),
            slots AS (SELECT i.qid, l.pos, min(l.anc) AS anc,
                             count(*) AS cnt, count(DISTINCT l.anc) AS d
                      FROM inc i JOIN lin l USING (taxid)
                      GROUP BY i.qid, l.pos),
            good AS (SELECT s.qid, s.pos, s.anc
                     FROM slots s JOIN n_inc USING (qid)
                     WHERE s.cnt = n_inc.n AND s.d = 1),
            res AS (SELECT qid, anc, pos FROM
                      (SELECT qid, anc, pos,
                              row_number() OVER (PARTITION BY qid ORDER BY pos) AS rp
                       FROM good)
                    WHERE rp = 1)
            SELECT CAST(q.qid AS BIGINT) AS qid,
                   CAST(CASE WHEN t.best_hits IS NULL OR t.best_hits < 3 THEN -1
                             WHEN r.pos IS NULL OR r.pos > 2 THEN -1
                             ELSE r.anc END AS BIGINT) AS taxid
            FROM (SELECT DISTINCT qid FROM cand) q
            LEFT JOIN thr t USING (qid) LEFT JOIN res r USING (qid)
        """,
        "abundance_estimate": """
            WITH asg(qid, taxid) AS (VALUES
              (0,10),(1,10),(2,7),(3,11),(4,11),
              (5,13),(6,13),(7,13),(8,13),
              (9,100),(10,100),(11,100),(12,100),(13,100),(14,100),
              (15,101),(16,101),(17,101),(18,101),(19,101),
              (20,1),(21,1),(22,1),(23,1),(24,1),(25,1),(26,1),(27,1),(28,1),
              (29,NULL)),
            lift(taxid, pos, anc) AS (VALUES
              (10,1,10),(11,1,11),(12,1,12),(13,1,13),(14,1,14),(15,1,15),
              (7,1,10),(100,2,100),(101,2,101),(1,9,1)),
            members(up, at) AS (VALUES
              (100,10),(100,11),(100,12),(101,13),(101,14),(101,15),
              (1,10),(1,11),(1,12),(1,13),(1,14),(1,15)),
            cnt AS (SELECT taxid, count(*) AS n FROM asg
                    WHERE taxid IS NOT NULL GROUP BY taxid),
            wp AS (SELECT c.taxid, c.n, l.pos, l.anc
                   FROM cnt c JOIN lift l USING (taxid)),
            base AS (SELECT anc AS at, CAST(sum(n) AS BIGINT) AS base
                     FROM wp WHERE pos <= 1 AND anc IS NOT NULL GROUP BY anc),
            above AS (SELECT taxid AS up, n FROM wp WHERE pos > 1),
            shares AS (SELECT a.up, a.n, m.at, b.base
                       FROM above a JOIN members m USING (up)
                       JOIN base b USING (at)),
            tot AS (SELECT up, sum(base) AS tot FROM shares GROUP BY up),
            contrib AS (SELECT at,
                               sum((n * base * 1000000) // tot) AS redist
                        FROM shares JOIN tot USING (up) GROUP BY at)
            SELECT CAST(b.at AS BIGINT) AS taxid,
                   CAST(b.base AS BIGINT) AS n_direct,
                   CAST(b.base * 1000000 + coalesce(c.redist, 0) AS BIGINT)
                     AS abund_micro
            FROM base b LEFT JOIN contrib c ON c.at = b.at
        """,
        "genomic_candidates_md5": f"""
            WITH {_GENOMIC_MD5_TIDX},
            qseq AS (SELECT doc_id AS qid, substr(text, 11, 140) AS seq
                     FROM documents
                     WHERE doc_id % 5 = 0 AND length(text) >= 150),
            qw AS (SELECT qid, seq,
                          unnest(range(0, CASE WHEN length(seq) <= 64 THEN 1
                                   ELSE (length(seq) - 8) // 57 + 1 END)) AS win
                   FROM qseq),
            qk AS (SELECT qid, win, seq,
                          unnest(range(1, least(64, length(seq) - win * 57) - 8 + 2)) AS i
                   FROM qw),
            qf AS (SELECT DISTINCT qid, win,
                          md5(substr(seq, CAST(win * 57 + i AS INT), 8)) AS feature
                   FROM qk),
            qsk AS (SELECT qid, win, feature FROM
                      (SELECT qid, win, feature,
                              row_number() OVER (PARTITION BY qid, win
                                                 ORDER BY feature) AS rn
                       FROM qf)
                    WHERE rn <= 4),
            m AS (SELECT q.qid, t.tgt, t.win
                  FROM qsk q JOIN tidx t USING (feature)),
            pw AS (SELECT qid, tgt, win, count(*) AS whits
                   FROM m GROUP BY qid, tgt, win),
            rng AS (SELECT qid, tgt, win,
                           CAST(sum(whits) OVER (PARTITION BY qid, tgt ORDER BY win
                                RANGE BETWEEN CURRENT ROW AND 2 FOLLOWING)
                                AS BIGINT) AS hits
                    FROM pw),
            best AS (SELECT qid, tgt, hits, win AS win_beg,
                            row_number() OVER (PARTITION BY qid, tgt
                                               ORDER BY hits DESC, win ASC) AS rn
                     FROM rng),
            pt AS (SELECT qid, tgt, hits, win_beg FROM best WHERE rn = 1),
            topk AS (SELECT qid, tgt, hits, win_beg,
                            row_number() OVER (PARTITION BY qid
                                               ORDER BY hits DESC, tgt ASC) AS rank
                     FROM pt)
            SELECT qid, tgt, hits, win_beg, CAST(rank AS INT) AS rank
            FROM topk WHERE rank <= 2 AND hits >= 1
        """,
        "genomic_candidates_paired_md5": f"""
            WITH {_GENOMIC_MD5_TIDX},
            qp AS (SELECT doc_id AS qid,
                          substr(text, 11, 100) AS seq1,
                          substr(text, 151, CAST(60 + doc_id % 80 AS INT)) AS seq2
                   FROM documents
                   WHERE doc_id % 5 = 0 AND length(text) >= 290),
            mates AS (SELECT qid * 2 AS mid, seq1 AS seq FROM qp
                      UNION ALL
                      SELECT qid * 2 + 1 AS mid, seq2 AS seq FROM qp),
            mw AS (SELECT mid, seq,
                          unnest(range(0, CASE WHEN length(seq) <= 64 THEN 1
                                   ELSE (length(seq) - 8) // 57 + 1 END)) AS win
                   FROM mates WHERE length(seq) >= 8),
            mk AS (SELECT mid, win, seq,
                          unnest(range(1, least(64, length(seq) - win * 57) - 8 + 2)) AS i
                   FROM mw),
            mf AS (SELECT DISTINCT mid, win,
                          md5(substr(seq, CAST(win * 57 + i AS INT), 8)) AS feature
                   FROM mk),
            msk AS (SELECT mid, win, feature FROM
                      (SELECT mid, win, feature,
                              row_number() OVER (PARTITION BY mid, win
                                                 ORDER BY feature) AS rn
                       FROM mf)
                    WHERE rn <= 4),
            m AS (SELECT CAST(q.mid // 2 AS BIGINT) AS qid, t.tgt, t.win
                  FROM msk q JOIN tidx t USING (feature)),
            nw AS (SELECT qid,
                          CAST(2 + (length(seq1) + length(seq2)) // 57 AS BIGINT)
                            AS nw_q
                   FROM qp),
            pw AS (SELECT qid, tgt, win, count(*) AS whits
                   FROM m GROUP BY qid, tgt, win),
            rng AS (SELECT s.qid, s.tgt, s.win,
                           CAST(sum(e.whits) AS BIGINT) AS hits
                    FROM pw s
                    JOIN nw ON nw.qid = s.qid
                    JOIN pw e ON e.qid = s.qid AND e.tgt = s.tgt
                             AND e.win >= s.win
                             AND e.win <= s.win + nw.nw_q - 1
                    GROUP BY s.qid, s.tgt, s.win),
            best AS (SELECT qid, tgt, hits, win AS win_beg,
                            row_number() OVER (PARTITION BY qid, tgt
                                               ORDER BY hits DESC, win ASC) AS rn
                     FROM rng),
            pt AS (SELECT qid, tgt, hits, win_beg FROM best WHERE rn = 1),
            topk AS (SELECT qid, tgt, hits, win_beg,
                            row_number() OVER (PARTITION BY qid
                                               ORDER BY hits DESC, tgt ASC) AS rank
                     FROM pt)
            SELECT qid, tgt, hits, win_beg, CAST(rank AS INT) AS rank
            FROM topk WHERE rank <= 2 AND hits >= 1
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_c,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_price_c,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS sum_disc_price_c4,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                        * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) * 1000000 AS BIGINT) AS sum_charge_c6,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_users_per_event_type": """
            WITH totals AS (
              SELECT event_type, user_id,
                     CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS total_value_c
              FROM events GROUP BY event_type, user_id),
            ranked AS (SELECT event_type, user_id, total_value_c,
                              row_number() OVER (PARTITION BY event_type
                                                 ORDER BY total_value_c DESC, user_id ASC) AS rank
                       FROM totals)
            SELECT event_type, user_id, total_value_c, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "contiguous_range_hits": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
            hits AS (SELECT user_id, us,
                            count(*) OVER (PARTITION BY user_id ORDER BY us
                                           RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS hits
                     FROM e),
            best AS (SELECT user_id, hits, us,
                            row_number() OVER (PARTITION BY user_id
                                               ORDER BY hits DESC, us ASC) AS rn
                     FROM hits)
            SELECT user_id, hits AS best_hits, us AS at_us FROM best WHERE rn = 1
        """,
        "event_type_cumulative": """
            WITH counts AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type)
            SELECT event_type, cnt,
                   CAST(sum(cnt) OVER (ORDER BY event_type
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_cnt
            FROM counts
        """,
        "star_join_revenue": """
            SELECT n_name,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue_c4,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "nation_region_rollup": """
            SELECT coalesce(r_name, '<all>') AS region_name,
                   coalesce(n_name, '<all>') AS nation_name,
                   count(*) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP(r_name, n_name)
        """,
        "paired_zip_events": """
            WITH a AS (SELECT event_id AS a_event_id,
                              row_number() OVER (ORDER BY event_id) AS n
                       FROM events WHERE event_type = 'signup'),
            b AS (SELECT event_id AS b_event_id,
                         row_number() OVER (ORDER BY event_id) AS n
                  FROM events WHERE event_type = 'error')
            SELECT CAST(a.n AS BIGINT) AS n, a_event_id, b_event_id
            FROM a JOIN b USING (n)
        """,
        "sessionize_events": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
            flagged AS (
              SELECT user_id, us,
                     CASE WHEN lag(us) OVER w IS NULL
                               OR us - lag(us) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
            numbered AS (
              SELECT user_id, us,
                     CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS BIGINT) AS session_no
              FROM flagged)
            SELECT user_id, session_no, count(*) AS n_events,
                   min(us) AS start_us, max(us) AS end_us
            FROM numbered GROUP BY user_id, session_no
        """,
        "props_extract": """
            SELECT event_id,
                   CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS k_value
            FROM events
        """,
        "merge_topk_sources": """
            WITH per_shard AS (
              SELECT event_type, user_id, count(*) AS hits
              FROM events GROUP BY event_type, user_id),
            ranked AS (SELECT user_id, event_type, hits,
                              row_number() OVER (PARTITION BY user_id
                                                 ORDER BY hits DESC, event_type ASC) AS rank
                       FROM per_shard)
            SELECT user_id, event_type, hits, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 5
        """,
    }
    # shard-merge ≡ global-index equivalence, oracle-gated: the merged
    # Spark query must reproduce the GLOBAL single-index oracle exactly
    # (mode_merge.cpp:209-264 — features are target-partitioned, so
    # per-shard top-k re-aggregation loses nothing)
    out["genomic_candidates_merged_md5"] = out["genomic_candidates_md5"]
    # bloom prefilter + exact join ≡ exact lane (FPs die in the join;
    # blooms have no false negatives) — the twin IS the exact oracle
    out["contamination_pairs_bloom"] = out["contamination_pairs"]

    # ---- kperm lanes over materialized sketch views --------------------
    # The production Mueller-hash sketch is pytest-gated (bit-exact,
    # test_hashing); the lifecycle downstream of it is gated HERE: the
    # Spark entries write their sketch rows to _ORACLE_VIEW_ROOT and
    # these twins run the identical probe/range/top-k SQL over the same
    # rows.  hitsMin = sketch_size // 3 = 2 for the s=8 fixtures.
    def _kperm_lifecycle(tidx: str, qsk: str) -> str:
        return f"""
            tidx AS (SELECT tgt, win, feature
                     FROM read_parquet('{_ORACLE_VIEW_ROOT}/{tidx}/*.parquet')),
            qsk AS (SELECT qid, feature
                    FROM read_parquet('{_ORACLE_VIEW_ROOT}/{qsk}/*.parquet')),
            m AS (SELECT q.qid, t.tgt, t.win FROM qsk q JOIN tidx t USING (feature)),
            pw AS (SELECT qid, tgt, win, count(*) AS whits
                   FROM m GROUP BY qid, tgt, win)
        """

    _KPERM_RANKED = """
        best AS (SELECT qid, tgt, hits, win AS win_beg,
                        row_number() OVER (PARTITION BY qid, tgt
                                           ORDER BY hits DESC, win ASC) AS rn
                 FROM rng),
        pt AS (SELECT qid, tgt, hits, win_beg FROM best WHERE rn = 1)
    """
    out["genomic_candidates"] = f"""
        WITH {_kperm_lifecycle("kperm_tidx", "kperm_qsk")},
        rng AS (SELECT qid, tgt, win,
                       CAST(sum(whits) OVER (PARTITION BY qid, tgt ORDER BY win
                            RANGE BETWEEN CURRENT ROW AND 2 FOLLOWING)
                            AS BIGINT) AS hits
                FROM pw),
        {_KPERM_RANKED},
        topk AS (SELECT qid, tgt, hits, win_beg,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY hits DESC, tgt ASC) AS rank
                 FROM pt)
        SELECT qid, tgt, hits, win_beg, CAST(rank AS INT) AS rank
        FROM topk WHERE rank <= 2 AND hits >= 2
    """
    out["genomic_candidates_paired"] = f"""
        WITH {_kperm_lifecycle("kperm_p_tidx", "kperm_p_qsk")},
        nw AS (SELECT qid, nw_q
               FROM read_parquet('{_ORACLE_VIEW_ROOT}/kperm_p_span/*.parquet')),
        rng AS (SELECT s.qid, s.tgt, s.win,
                       CAST(sum(e.whits) AS BIGINT) AS hits
                FROM pw s
                JOIN nw ON nw.qid = s.qid
                JOIN pw e ON e.qid = s.qid AND e.tgt = s.tgt
                         AND e.win >= s.win
                         AND e.win <= s.win + nw.nw_q - 1
                GROUP BY s.qid, s.tgt, s.win),
        {_KPERM_RANKED},
        topk AS (SELECT qid, tgt, hits, win_beg,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY hits DESC, tgt ASC) AS rank
                 FROM pt)
        SELECT qid, tgt, hits, win_beg, CAST(rank AS INT) AS rank
        FROM topk WHERE rank <= 2 AND hits >= 2
    """
    # A3 merge-below-rank: lift per-target UNTRUNCATED best ranges to
    # genus via the literal dim, max-hits per (query, merged taxon)
    # with the (hits desc, win_beg asc, tgt asc) tie-break, then top-4
    out["genomic_candidates_merged"] = f"""
        WITH {_kperm_lifecycle("kperm_m_tidx", "kperm_m_qsk")},
        rng AS (SELECT qid, tgt, win,
                       CAST(sum(whits) OVER (PARTITION BY qid, tgt ORDER BY win
                            RANGE BETWEEN CURRENT ROW AND 2 FOLLOWING)
                            AS BIGINT) AS hits
                FROM pw),
        {_KPERM_RANKED},
        lift(tgt, taxid) AS (VALUES (0, 100), (1, 100), (2, 100),
                                    (3, 101), (4, 101), (5, 101)),
        lifted AS (SELECT pt.qid, l.taxid, pt.hits, pt.win_beg, pt.tgt
                   FROM pt JOIN lift l USING (tgt)),
        ptax AS (SELECT qid, taxid, hits FROM
                   (SELECT qid, taxid, hits,
                           row_number() OVER (PARTITION BY qid, taxid
                                              ORDER BY hits DESC, win_beg ASC,
                                                       tgt ASC) AS rn
                    FROM lifted)
                 WHERE rn = 1),
        topk AS (SELECT qid, taxid, hits,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY hits DESC, taxid ASC) AS rank
                 FROM ptax)
        SELECT qid, CAST(taxid AS BIGINT) AS taxid, hits, CAST(rank AS INT) AS rank
        FROM topk WHERE rank <= 4 AND hits >= 2
    """
    # -taxon-coverage twin: literal ranked lineages + the covered set
    # {1,10,11,100} = union of the DB targets' (10, 11) lineages;
    # pred rank positions via prank, NULL assignment = NONE_POS 10
    out["taxon_coverage_stats"] = """
        WITH asg(qid, pred, truth) AS (VALUES
          (0,10,10),(1,100,13),(2,NULL,11),(3,10,NULL),
          (4,13,13),(5,NULL,15)),
        prank(taxid, pos) AS (VALUES
          (10,1),(11,1),(12,1),(13,1),(14,1),(15,1),
          (100,2),(101,2),(1,9)),
        lin(taxid, pos, anc) AS (VALUES
          (10,1,10),(10,2,100),(10,9,1),
          (11,1,11),(11,2,100),(11,9,1),
          (13,1,13),(13,2,101),(13,9,1),
          (15,1,15),(15,2,101),(15,9,1)),
        cov(taxid) AS (VALUES (1),(10),(11),(100)),
        ranks(pos, rank) AS (VALUES
          (1,'species'),(2,'genus'),(9,'root')),
        scored AS (
          SELECT l.pos,
                 (c.taxid IS NOT NULL) AS covered,
                 (coalesce(pr.pos, 10) <= l.pos) AS classified
          FROM asg a
          JOIN lin l ON l.taxid = a.truth
          LEFT JOIN prank pr ON pr.taxid = a.pred
          LEFT JOIN cov c ON c.taxid = l.anc
          WHERE a.truth IS NOT NULL),
        agg AS (
          SELECT pos,
                 CAST(sum(CASE WHEN covered AND classified
                          THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                 CAST(sum(CASE WHEN NOT covered AND classified
                          THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                 CAST(sum(CASE WHEN NOT covered AND NOT classified
                          THEN 1 ELSE 0 END) AS BIGINT) AS tn,
                 CAST(sum(CASE WHEN covered AND NOT classified
                          THEN 1 ELSE 0 END) AS BIGINT) AS fn
          FROM scored GROUP BY pos)
        SELECT r.rank, CAST(a.pos AS BIGINT) AS rank_pos,
               a.tp, a.fp, a.tn, a.fn,
               CAST(floor((a.tp + a.tn) * 1000000.0
                    / (a.tp + a.fp + a.tn + a.fn)) AS BIGINT)
                 AS accuracy_micro,
               CASE WHEN a.tp + a.fn > 0
                    THEN CAST(floor(a.tp * 1000000.0 / (a.tp + a.fn))
                              AS BIGINT) ELSE 0 END AS sensitivity_micro,
               CASE WHEN a.tn + a.fp > 0
                    THEN CAST(floor(a.tn * 1000000.0 / (a.tn + a.fp))
                              AS BIGINT) ELSE 0 END AS specificity_micro
        FROM agg a JOIN ranks r USING (pos)
    """
    return out
