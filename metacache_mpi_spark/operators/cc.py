"""Connected components over the verified duplicate-pair edge list.

This replaces the reference's LCA-voting assignment stage
(/root/reference/src/classification.cpp:235-265): where MetaCache folds
top-k candidates through a taxonomy to a single label, the webtext graft
folds verified pair edges into duplicate clusters.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — O(log n)
rounds, per-round work proportional to the edge list, no driver-side
graph state.  Spark has no fixpoint primitive (SURVEY.md §4), so this is
a driver loop over DataFrame ops with per-iteration lineage cuts:
``localCheckpoint`` by default (fast, executor-loss-UNSAFE), or durable
per-iteration snapshots through a
:class:`~..plans.checkpoint.CheckpointManager` (``snapshots=``) — a
killed run resumes from its last committed iteration instead of
restarting the loop (pytest ``test_cc_checkpointed_resume``), the shape
long CC runs need at cluster scale.

Conventions: node ids are int64; cluster id = smallest node id in the
component (deterministic, stable across partitionings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.select("a", "b").union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect strictly-larger neighbors to
    min(N(u) ∪ {u}).  Input must be symmetric.

    State-bounded formulation: the per-node minimum is a partial-
    aggregating ``min`` (no per-key list state), re-attached to the edge
    list by a join — a hub node of a 10^7-member component costs a
    skewed-join row set (AQE splits it), never an in-memory array.
    """
    nbr_min = edges.groupBy("a").agg(
        F.least(F.min("b"), F.first("a")).alias("m")
    )
    return (
        edges.join(nbr_min, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u over edges pointing to ≤-neighbors: connect all of
    N≤(u) ∪ {u} to its minimum.  Same bounded-state min+join shape."""
    # orient edges (big → small)
    e = edges.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).where(F.col("a") != F.col("b"))
    m = e.groupBy("a").agg(F.min("b").alias("m"))
    nbr_links = (
        e.join(m, "a")
        .where(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    self_links = m.where(F.col("a") != F.col("m")).select(
        "a", F.col("m").alias("b")
    )
    return nbr_links.union(self_links).distinct()


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(a, b))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _unionfind_local(rows: list, spark) -> DataFrame:
    """Driver-side union-find for small edge sets — the broadcast-join
    analog of the large-star/small-star loop: when the (already heavily
    filtered) verified-pair edge list fits on the driver, one collect +
    exact union-find beats ~4 distributed iterations × fixed job
    latency.  Above the threshold the distributed loop takes over, the
    same way Catalyst swaps broadcast for shuffle joins."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots: dict[int, int] = {}
    for node in list(parent):
        r = find(node)
        roots[r] = min(roots.get(r, r), node)
    import pandas as pd

    out = pd.DataFrame(
        {
            "node": list(parent),
            "component": [roots[find(n)] for n in parent],
        }
    )
    # pandas input → Arrow-batched transfer (a tuple list serializes
    # row-at-a-time through py4j pickling — measured seconds at 50k rows)
    return spark.createDataFrame(out, "node long, component long")


# Hard bound on the driver-side union-find collect: ~4M (a, b) rows is
# ~100-200 MB of driver heap — a threshold above this is a driver OOM
# foot-gun, not a tuning knob (driver memory grows ∝ local_threshold).
MAX_LOCAL_EDGES = 4_000_000


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint: bool = True,
    local_threshold: int = 1_000_000,
    snapshots=None,
    snapshot_prefix: str = "cc",
) -> DataFrame:
    """Edge list (a, b) → assignments (node, component).

    Every node that appears in an edge gets a row; component = min id in
    its component.  Callers union in singleton nodes themselves.

    Physical strategy is size-adaptive: ≤ ``local_threshold`` distinct
    edges resolve on the driver (exact union-find, one collect);
    larger inputs run the distributed large-star/small-star loop.
    Set ``local_threshold=0`` to force the distributed path.
    ``local_threshold`` is capped at :data:`MAX_LOCAL_EDGES` (driver
    memory scales with it) — above the cap the call raises instead of
    silently risking a driver OOM.

    ``snapshots``: optional :class:`~..plans.checkpoint.CheckpointManager`
    — each loop iteration commits as snapshot
    ``{snapshot_prefix}_iterNNN`` and a restarted run (same manager
    root, same input edge list) loads completed iterations instead of
    recomputing them.  Forces the distributed path (checkpointing a
    driver-local union-find is meaningless) and replaces the
    executor-loss-unsafe ``localCheckpoint`` lineage cut with durable
    parquet.
    """
    if local_threshold > MAX_LOCAL_EDGES:
        raise ValueError(
            f"local_threshold={local_threshold} exceeds MAX_LOCAL_EDGES="
            f"{MAX_LOCAL_EDGES}: the driver collects that many edge rows "
            "(memory ∝ threshold). Lower it or use the distributed path "
            "(local_threshold=0)."
        )
    spark = edges.sparkSession
    e = (
        edges.select(F.col("a").cast("long"), F.col("b").cast("long"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()  # consumed by the probe count, then collect OR loop
    )
    # size probe: a COUNT, not limit(n).collect() — CollectLimit scans
    # partitions incrementally (1, then scaleUpFactor more, ...), and on
    # top of an expensive upstream chain each retry re-executes that
    # chain; count() materializes everything once with full parallelism
    # (and populates the caller's persist() cache), after which the
    # small-case collect is a cheap cached re-scan.
    n_edges = e.count()
    if n_edges == 0:
        e.unpersist()
        return spark.createDataFrame([], "node long, component long")
    if snapshots is None and 0 < local_threshold and n_edges <= local_threshold:
        rows = e.collect()
        # release the probe cache — one leaked entry per micro-batch
        # otherwise (streaming runs this once per batch)
        e.unpersist()
        return _unionfind_local(rows, spark)

    e0 = e  # the persisted probe input; released after the loop
    prev_fp = None
    for i in range(max_iter):
        if snapshots is not None:
            # durable per-iteration snapshot: a committed iteration is
            # LOADED on resume (the closure only runs when missing);
            # the re-read parquet cuts lineage, so no localCheckpoint
            prev = e
            e = snapshots.get_or_compute(
                f"{snapshot_prefix}_iter{i:03d}",
                lambda: _small_star(_large_star(_symmetrize(prev))),
            )
        else:
            e = _small_star(_large_star(_symmetrize(e)))
            if checkpoint:
                # lazy localCheckpoint: materialized by the fingerprint
                # action below — one Spark job per iteration, not two
                e = e.localCheckpoint(eager=False)
        fp = _edge_fingerprint(e)
        if fp == prev_fp:
            break
        prev_fp = fp

    e0.unpersist()
    # Converged state is a forest of stars (v → root). Every non-root
    # node has exactly one outgoing edge to its root.
    assign = e.select(F.col("a").alias("node"), F.col("b").alias("component"))
    roots = assign.select(F.col("component").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return assign.union(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def cluster_assignments(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """All docs → (id_col, cluster_id); singletons cluster to themselves."""
    comp = connected_components(pairs.select("a", "b"))
    return (
        docs.select(F.col(id_col).cast("long"))
        .distinct()
        .join(comp, on=F.col(id_col) == F.col("node"), how="left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )


def cluster_representatives(
    clusters: DataFrame,
    pages: DataFrame | None = None,
    policy: str = "min_id",
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """One kept copy per duplicate cluster: (cluster_id, rep_id).

    Which copy survives dedup is a corpus policy, not an arbitrary
    choice (the reference keeps insertion order's first copy,
    sketch_database.h insert-time cap; crawl pipelines usually keep the
    canonical or most complete page):

    - ``"min_id"``   — smallest doc id (deterministic default; needs no
      ``pages``);
    - ``"earliest"`` — first-crawled copy: min ``(warc_ts, doc_id)``;
    - ``"longest"``  — most complete copy: max text length, smallest id
      on ties (mirrors often truncate).

    Scale note: each policy is ONE groupBy aggregation whose argmin /
    argmax rides a struct-ordered ``min``/``max`` — partial aggregation
    map-side, so a 10^7-member mega-cluster (the star-policy case)
    never sorts or buffers in a single task, unlike the row_number
    window formulation.
    """
    if policy == "min_id":
        return clusters.groupBy(cluster_col).agg(
            F.min(id_col).alias("rep_id")
        )
    if pages is None:
        raise ValueError(f"policy {policy!r} needs the pages frame")
    joined = clusters.join(pages, id_col)
    if policy == "earliest":
        # a NULL timestamp must rank LAST (worst provenance), but
        # struct ordering sorts null fields first — lead with an
        # explicit null flag so a missing-ts doc never wins
        key = F.struct(
            F.col(ts_col).isNull().cast("int").alias("ts_missing"),
            F.col(ts_col),
            F.col(id_col).alias("rid"),
        )
    elif policy == "longest":
        # null text ranks shortest (coalesce -1) — same rule the SQL
        # oracle spells out, so the two engines break ties identically
        key = F.struct(
            (-F.coalesce(F.length(F.col(text_col)), F.lit(-1))).alias(
                "neglen"
            ),
            F.col(id_col).alias("rid"),
        )
    else:
        raise ValueError(f"unknown representative policy {policy!r}")
    return joined.groupBy(cluster_col).agg(
        F.min(key).getField("rid").alias("rep_id")
    )
