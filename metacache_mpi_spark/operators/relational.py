"""Relational operator suite over the driver's TPC-H-ish tables.

Each function is the Spark half of a driver-contract query; the DuckDB
oracle SQL lives in ``__spark_entry__.py``.  These cover the reference's
aggregation / window / top-k operator inventory (SURVEY.md §2.4-2.6):

- A1 contiguous-window-range hit counting → sliding range-frame count
- A2 top-k candidates per group           → row_number window
- A5/A9 per-key counts + rank-cumulative  → groupBy + cumulative window
- TPC-H Q1 style multi-aggregate          → exact decimal arithmetic

Float discipline for oracle hash-parity: sums over doubles are rounded
to fixed-point BIGINT cents/micros; decimal columns are cast to
DECIMAL before SUM so arithmetic is exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _ntz_epoch_us(col: str):
    """Epoch microseconds of a TIMESTAMP_NTZ column, timezone-independent
    (timestampdiff over NTZ values — no session-TZ reinterpretation)."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    )


def tpch_q1(lineitem: DataFrame) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape) with exact decimal sums,
    emitted as fixed-point BIGINTs (SURVEY.md A5/A11 analog)."""
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty) * 100).cast("long").alias("sum_qty_c"),
            (F.sum(price) * 100).cast("long").alias("sum_base_price_c"),
            (F.sum(price * (one - disc)) * 10000).cast("long").alias("sum_disc_price_c4"),
            (F.sum(price * (one - disc) * (one + tax)) * 1000000)
            .cast("long")
            .alias("sum_charge_c6"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_users_per_event_type(events: DataFrame, k: int = 3) -> DataFrame:
    """A2 analog: top-k users by total value within each event type,
    deterministic tie-break by user_id."""
    totals = events.groupBy("event_type", "user_id").agg(
        F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("total_value_c")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("total_value_c"), F.asc("user_id")
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("event_type", "user_id", "total_value_c", "rank")
    )


def contiguous_range_hits(
    events: DataFrame, window_us: int = 600_000_000
) -> DataFrame:
    """A1 analog (/root/reference/src/candidates.h:118-180): per user,
    sliding count of events within a trailing time range; emit each
    user's best window (max hits, earliest on ties)."""
    # ts arrives as TIMESTAMP_NTZ from parquet; derive epoch micros with
    # pure NTZ arithmetic so the result is independent of the session
    # timezone (the driver's session may not pin UTC) == DuckDB epoch_us.
    ts_us = _ntz_epoch_us("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-window_us, 0)
    )
    hits = (
        events.select("user_id", ts_us.alias("us"))
        .withColumn("hits", F.count(F.lit(1)).over(w))
    )
    # best window = argmin of (-hits, us): a struct-ordered min
    # aggregate (partial, map-side) instead of a second full sort +
    # row_number over the window output — same partitioning key as the
    # range window, so no extra exchange AND no extra sort (guide §2.4)
    key = F.struct(
        (-F.col("hits")).alias("neg_hits"), F.col("us").alias("us")
    )
    return (
        hits.groupBy("user_id")
        .agg(F.min(key).alias("k"))
        .select(
            "user_id",
            (-F.col("k.neg_hits")).alias("best_hits"),
            F.col("k.us").alias("at_us"),
        )
    )


def event_type_cumulative(events: DataFrame) -> DataFrame:
    """A9 analog: per-type counts plus cumulative count over the
    alphabetical type order (the reference's per-rank cumulative
    classification counters)."""
    counts = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return counts.withColumn("cum_cnt", F.sum("cnt").over(w))


def star_join_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Star join: revenue per nation (J2-style dim joins; Catalyst
    broadcasts the small dims — the reference replicates its taxa dim
    on every rank, /root/reference/src/sketch_database.h:545-560)."""
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            (F.sum(price * (one - disc)) * 10000)
            .cast("long")
            .alias("revenue_c4"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def nation_region_rollup(customer: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """ROLLUP(region, nation) customer counts — the hierarchical
    aggregation flavor (A6 abundance-rollup analog on a 2-level dim)."""
    joined = (
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("<all>")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("<all>")).alias("nation_name"),
            "n_customers",
        )
    )


def paired_zip(events: DataFrame, type_a: str = "signup", type_b: str = "error") -> DataFrame:
    """J7 paired-read zip analog: nth record of stream A with nth of
    stream B (reference zips two FASTQ files in lockstep,
    /root/reference/src/sequence_io.cpp:442-460) — a join on
    row_number over a deterministic order."""
    def ranked(t: str, out: str):
        w = Window.orderBy("event_id")
        return (
            events.where(F.col("event_type") == t)
            .select("event_id")
            .withColumn("n", F.row_number().over(w))
            .select(F.col("event_id").alias(out), "n")
        )

    a = ranked(type_a, "a_event_id")
    b = ranked(type_b, "b_event_id")
    return a.join(b, "n").select(
        F.col("n").cast("long").alias("n"), "a_event_id", "b_event_id"
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per user, a new session starts when the gap from
    the previous event exceeds ``gap_minutes`` (lag + cumulative sum —
    the batch form of session windows)."""
    us = _ntz_epoch_us("ts")
    w = Window.partitionBy("user_id").orderBy("us")
    gap = gap_minutes * 60_000_000
    with_flag = (
        events.select("user_id", us.alias("us"))
        .withColumn("prev", F.lag("us").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull() | ((F.col("us") - F.col("prev")) > gap),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_no", F.sum("new_s").over(w).cast("long"))
    )
    return with_flag.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
    )


def props_extract(events: DataFrame) -> DataFrame:
    """P8/P9 analog: structured extraction from a semi-structured
    column (reference parses ids out of FASTA headers,
    /root/reference/src/sequence_io.cpp:576-719)."""
    return events.select(
        "event_id",
        F.regexp_extract("props", "[0-9]+", 0).cast("long").alias("k_value"),
    )


def merge_topk_sources(
    events: DataFrame, k: int = 5
) -> DataFrame:
    """J8 analog (merge mode): per-user top hit counts computed
    independently per event_type 'shard', unioned, then re-ranked
    through the same top-k rule — the reference's shard-merge
    (/root/reference/src/mode_merge.cpp:209-264)."""
    per_shard = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("hits")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("hits"), F.asc("event_type")
    )
    return (
        per_shard.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("user_id", "event_type", "hits", "rank")
    )


def bucket_size_stats(
    rows: DataFrame,
    bucket_cols: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """``info statistics`` analog: moments of the index's bucket-size
    distribution (/root/reference/src/sketch_database.h:1021-1032 prints
    bucket-size mean/var/max of the feature hash table via
    src/stat_moments.h).

    ``rows`` is any location/membership table — (feature, tgt, win)
    rows of a genomic index, (doc_id, band, bucket) rows of an LSH
    bucket table; ``bucket_cols`` keys a bucket, ``group_cols``
    (default: none → one global row keyed by a literal) splits the
    report (e.g. per band).  Returns exact-integer moments
    (n_buckets, sum, sum-of-squares, min, max) per group — mean and
    variance derive exactly, the same one-pass accumulator discipline
    as :func:`value_moments`.  Two partial-aggregating shuffles; no
    bucket materializes member lists.
    """
    group_cols = group_cols or []
    sizes = rows.groupBy(*(group_cols + bucket_cols)).agg(
        F.count(F.lit(1)).alias("sz")
    )
    key = group_cols if group_cols else [F.lit(0).alias("all")]
    return sizes.groupBy(*key).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("sz").alias("sum_sz"),
        F.sum(F.col("sz") * F.col("sz")).alias("sum_sq_sz"),
        F.min("sz").alias("min_sz"),
        F.max("sz").alias("max_sz"),
    )


def value_moments(events: DataFrame) -> DataFrame:
    """A11 moments accumulator (the reference's timer/statistics
    combine, /root/reference/src/stat_combined.h moments semantics):
    one-pass distributed (n, sum, sum-of-squares, min, max) per group —
    mean/variance derive from these exactly, and partial aggregation
    makes the combine associative the way the reference's accumulator
    merge is.

    Fixed-point discipline: ``value`` is folded at cent precision so
    both engines aggregate exact BIGINTs (no float-sum divergence).
    """
    v_c = F.floor(F.col("value") * 100 + 0.5).cast("long")
    return (
        events.select("event_type", v_c.alias("v_c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v_c").alias("sum_c"),
            F.sum(F.col("v_c") * F.col("v_c")).alias("sum_sq_c"),
            F.min("v_c").alias("min_c"),
            F.max("v_c").alias("max_c"),
        )
    )
