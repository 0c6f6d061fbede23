"""SemDeDup — semantic deduplication by cluster-then-prune.

The embedding analog of the MinHash/LSH text lanes: Abbas et al. 2023
("SemDeDup: Data-efficient learning at web-scale through semantic
deduplication") prune *semantic* duplicates — paraphrases, re-renders,
template variants — that share no verbatim text.  The published method:
k-means-cluster the embeddings, then inside each cluster threshold the
upper-triangular pairwise-cosine matrix and drop every point whose max
similarity to a LOWER-INDEXED same-cluster point exceeds tau (one pass,
deterministic keep-first).  This module states exactly that rule in
DataFrame algebra:

- the coarse quantizer is the IVF machinery (``train_ivf_centroids``:
  bounded deterministic sample, driver NumPy Lloyd's; ``ivf_assign``:
  one Arrow matmul pass over the corpus) — clustering never touches
  more than the sample twice;
- the within-cluster pair generation is an equi self-join on the
  cluster id: per-task work is cluster_size², which is the PAPER's
  own cost model — k is the knob that bounds it (they run k ≈ n/50k;
  the join shuffles by cluster, so AQE skew-split covers an unlucky
  dense cluster);
- the prune is a groupBy(b).max(cos) + one left join back — the
  triu-max rule verbatim, no window over a hot cluster.

Cross-engine parity: cosine is emitted as the repo's fixed-point
``cos_micro`` (floor(x·10⁶ + 0.5), sequential-fold dot product ≡
DuckDB ``list_dot_product``); the k-means assignment itself is NumPy
(not SQL-expressible), so the contract materializes the assignment as
a parquet view the DuckDB twin reads — the same pattern as the kperm
genomic lanes.  Reference analog: the cluster-then-verify shape is the
reference's bucket-probe-then-align lifecycle
(/root/reference/src/querying.h candidate gen → verify) at the
embedding level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ann import _cos_micro, ivf_assign, train_ivf_centroids

SEM_TAU_MICRO = 950_000  # paper operating range: 1 - eps, eps ~ 0.05
# sentinel below the cosine floor (-10⁶) for "no lower-id neighbor"
NO_PRIOR = -1_000_001


def semantic_assignments(
    emb: DataFrame, n_centroids: int = 16, centroids=None
) -> DataFrame:
    """(vec_id, bucket, embedding): corpus clustered by the coarse
    quantizer (trained here if not supplied).

    ``n_centroids`` must be ≪ corpus size: with k ≈ n, Lloyd's
    converges to one singleton cluster per point and NO pair is ever
    compared — duplicates silently survive.  The paper runs
    k ≈ n / 50k; anything with average cluster size ≥ ~10 is safe.
    """
    if centroids is None:
        centroids = train_ivf_centroids(emb, n_centroids)
    return ivf_assign(emb, centroids).select("vec_id", "bucket", "embedding")


def semantic_dup_candidates(
    assigned: DataFrame, tau_micro: int = SEM_TAU_MICRO
) -> DataFrame:
    """Within-cluster pairs over the tau threshold:
    (a, b, bucket, cos_micro) with a < b.

    Equi self-join on the cluster id — the quadratic stays inside one
    cluster, never corpus-wide; both sides scale together so the join
    is a shuffle join by construction (nothing here to broadcast).
    """
    x = assigned.select(
        F.col("vec_id").alias("a"),
        "bucket",
        F.col("embedding").alias("ea"),
    )
    y = assigned.select(
        F.col("vec_id").alias("b"),
        "bucket",
        F.col("embedding").alias("eb"),
    )
    # both sides are the corpus — force a shuffle join (local stats
    # would happily broadcast y, which at 10^12 vectors is fatal)
    return (
        x.join(y.hint("shuffle_hash"), "bucket")
        .where(F.col("a") < F.col("b"))
        .select(
            "a", "b", "bucket", _cos_micro("ea", "eb").alias("cos_micro")
        )
        .where(F.col("cos_micro") >= tau_micro)
    )


def semantic_dedup(
    emb: DataFrame,
    n_centroids: int = 16,
    tau_micro: int = SEM_TAU_MICRO,
    centroids=None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup verdict per vector: (vec_id, bucket,
    max_prior_cos_micro, removed).

    ``removed`` is the paper's upper-triangular rule: true iff the max
    cosine to any lower-id vector in the SAME cluster ≥ tau.  The
    survivor set is therefore keep-first deterministic (min vec_id of
    every semantic-duplicate chain survives), row count is preserved,
    and re-running on the survivors is a fixpoint (no pair among them
    clears tau).
    """
    if assigned is None:
        # three consumers below (both self-join sides + the attach) and
        # Spark does not stage-reuse through ArrowEvalPython — without a
        # pin the assignment matmul pass runs three times
        from ..plans.pinning import pin

        assigned = pin(semantic_assignments(emb, n_centroids, centroids))
    pairs = semantic_dup_candidates(assigned, tau_micro)
    prior = pairs.groupBy("b").agg(
        F.max("cos_micro").alias("max_prior_cos_micro")
    )
    # flagged set scales with the corpus — shuffle-hash, not broadcast
    return (
        assigned.select("vec_id", "bucket")
        .join(
            prior.hint("shuffle_hash").withColumnRenamed("b", "vec_id"),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            "bucket",
            F.coalesce("max_prior_cos_micro", F.lit(NO_PRIOR))
            .cast("long")
            .alias("max_prior_cos_micro"),
            F.col("max_prior_cos_micro").isNotNull().alias("removed"),
        )
    )
