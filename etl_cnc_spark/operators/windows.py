"""Window-function operators (SURVEY.md §2.5).

Determinism rule: every ORDER BY inside a window carries a unique
tie-break column (custkey / event_id) so row_number-style outputs are
stable across engines and across runs (the driver hash is
order-insensitive but value-sensitive).

Scale notes: all windows partition by a real key (segment / user) —
no global single-partition windows in hot paths. Running/moving sums
use integer cents (exact, frame-order independent of engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ..utils import cents


@register(
    "win_ranking",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(row_number() OVER (PARTITION BY c_mktsegment
                ORDER BY c_nationkey DESC, c_custkey) AS BIGINT) AS rn,
           CAST(rank() OVER (PARTITION BY c_mktsegment
                ORDER BY c_nationkey DESC) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY c_mktsegment
                ORDER BY c_nationkey DESC) AS BIGINT) AS drnk,
           CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                ORDER BY c_nationkey DESC, c_custkey) AS BIGINT) AS quartile
    FROM customer
    """,
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/ntile. rank/dense_rank are computed
    over the tie-producing key alone (nationkey) so they genuinely
    differ from row_number; row_number/ntile get the unique tiebreak."""
    c = table(spark, sf_dir, "customer")
    w_ties = Window.partitionBy("c_mktsegment").orderBy(F.col("c_nationkey").desc())
    w_uniq = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_nationkey").desc(), "c_custkey"
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w_uniq).cast("long").alias("rn"),
        F.rank().over(w_ties).cast("long").alias("rnk"),
        F.dense_rank().over(w_ties).cast("long").alias("drnk"),
        F.ntile(4).over(w_uniq).cast("long").alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           epoch_us(lag(ts, 1) OVER w) AS prev_ts_us,
           epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us,
           lead(event_type, 1) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per user: time-since-previous-event and next event
    type; NULLs appear at partition edges (fixtures have none)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    prev_us = F.unix_micros(F.lag("ts", 1).over(w))
    return e.select(
        "event_id",
        "user_id",
        ts_us.alias("ts_us"),
        prev_us.alias("prev_ts_us"),
        (ts_us - prev_us).alias("gap_us"),
        F.lead("event_type", 1).over(w).alias("next_type"),
    )


@register(
    "win_running",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
             AS cum_value,
           CAST(count(*) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_so_far
    FROM events
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user sum (integer cents → exact prefix sums)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        (F.sum(cents(F.col("value"))).over(w) / F.lit(100.0)).alias("cum_value"),
        F.count("*").over(w).cast("long").alias("n_so_far"),
    )


@register(
    "win_moving",
    oracle="""
    SELECT event_id, user_id,
           avg(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)/100.0 AS moving_avg
    FROM events
    """,
)
def win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving 4-row average per user (exact: integer-cent avg)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return e.select(
        "event_id",
        "user_id",
        (F.avg(cents(F.col("value"))).over(w) / F.lit(100.0)).alias("moving_avg"),
    )


@register(
    "win_first_last",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           first_value(c_acctbal) OVER w AS top_bal,
           last_value(c_acctbal) OVER w AS bottom_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over a full-partition frame (note: without
    the explicit frame, last_value degenerates to current row)."""
    c = table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.first("c_acctbal").over(w).alias("top_bal"),
        F.last("c_acctbal").over(w).alias("bottom_bal"),
    )


@register(
    "win_pct",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def win_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist — pure rank ratios, identical double
    divisions on both engines (no rounding needed)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               CAST(row_number() OVER (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
    bench=True,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: the row_number+filter pattern. At scale this
    is the right shape — Spark pushes a per-partition top-k (window
    group limit) before the shuffle in recent versions."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)//1000000
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
               AS trailing_1h_value
    FROM events
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: trailing-1-hour sum of value per user,
    ordered by epoch seconds (SURVEY §2.5 range-frame variant). A
    RANGE frame includes all peer rows at equal timestamps on both
    engines, and the cent-sum is order-exact, so ties can't drift.
    One shuffle on user_id; frames stream within the sorted
    partition."""
    e = table(spark, sf_dir, "events")
    secs = (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-3600, Window.currentRow)
    )
    tr = (
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).over(w)
        / F.lit(100.0)
    )
    return e.select("user_id", "event_id", tr.alias("trailing_1h_value"))


@register(
    "win_running_distinct",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS types_seen
    FROM events WHERE user_id < 30
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per key over event time ("how many
    distinct actions has this user taken so far") — Spark windows
    reject DISTINCT aggregates, so the idiomatic form is
    size(collect_set(...)) over the running frame: the set dedups
    incrementally, giving the same result with bounded per-row state
    (≤ |type domain|). For high-cardinality distincts swap the set
    for an HLL sketch column (agg_hll_merge machinery) — same window
    shape, fixed state."""
    e = table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("long")
        .alias("types_seen"),
    )


@register(
    "win_moving_median",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           median(l_quantity) OVER (
               PARTITION BY l_orderkey ORDER BY l_linenumber
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS med3
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median (robust local smoother — the outlier-proof
    alternative to win_moving's mean): Spark windows have no median
    aggregate, so the idiomatic form collects the frame into an
    array, sorts, and interpolates the middle — O(frame log frame)
    per row with a tiny bounded frame (3 here), which is exactly
    where exact medians are affordable; for wide frames switch to
    approx_percentile's sketch. Quantities are half-integer-exact,
    so the even-count interpolation matches DuckDB's median()
    bit-for-bit."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(-2, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list(F.col("l_quantity")).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ((lo + hi) / 2).alias("med3"),
    )


@register(
    "win_gaps_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS day_n
        FROM events
    ), grp AS (
        SELECT user_id, day_n,
               day_n - row_number() OVER (PARTITION BY user_id
                                          ORDER BY day_n) AS g
        FROM days
    ), islands AS (
        SELECT user_id, CAST(min(day_n) AS BIGINT) AS start_day,
               CAST(max(day_n) AS BIGINT) AS end_day,
               CAST(count(*) AS BIGINT) AS len_days
        FROM grp GROUP BY user_id, g
    )
    SELECT user_id, start_day, end_day, len_days,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY start_day) AS BIGINT)
               AS island_n,
           CAST(start_day - lag(end_day) OVER (PARTITION BY user_id
                                               ORDER BY start_day)
                AS BIGINT) AS gap_before
    FROM islands
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's runs of consecutive active days
    as (start, end, length) intervals with the gap to the previous
    island — the full decomposition behind events_streaks (which
    reports only the longest island) and the input shape for churn /
    reactivation analytics.

    The classic row_number difference trick: consecutive days share
    the constant day_n − rank, so islands fall out of one hash
    aggregate on (user, group) — no self-join, no iterative
    stretching. Two windows + one aggregate, ALL partitioned by
    user_id, so Catalyst plans a single shuffle and the per-user
    sequential work is bounded by that user's active days."""
    e = table(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day_n"),
    ).distinct()
    wrn = Window.partitionBy("user_id").orderBy("day_n")
    grp = days.withColumn(
        "g", F.col("day_n") - F.row_number().over(wrn)
    )
    islands = grp.groupBy("user_id", "g").agg(
        F.min("day_n").cast("long").alias("start_day"),
        F.max("day_n").cast("long").alias("end_day"),
        F.count(F.lit(1)).cast("long").alias("len_days"),
    )
    wisl = Window.partitionBy("user_id").orderBy("start_day")
    return islands.select(
        "user_id",
        "start_day",
        "end_day",
        "len_days",
        F.row_number().over(wisl).cast("long").alias("island_n"),
        (F.col("start_day") - F.lag("end_day").over(wisl))
        .cast("long")
        .alias("gap_before"),
    )
