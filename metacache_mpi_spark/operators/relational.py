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
    # ts arrives as TIMESTAMP_NTZ from parquet; session TZ is pinned to
    # UTC so the cast is wall-clock-identity (== DuckDB epoch_us).
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-window_us, 0)
    )
    hits = (
        events.select("user_id", ts_us.alias("us"))
        .withColumn("hits", F.count(F.lit(1)).over(w))
    )
    best = Window.partitionBy("user_id").orderBy(F.desc("hits"), F.asc("us"))
    return (
        hits.withColumn("rn", F.row_number().over(best))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("hits").alias("best_hits"), F.col("us").alias("at_us"))
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
