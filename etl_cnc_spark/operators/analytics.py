"""Event-analytics operators: funnel and cohort retention — the
standard product-analytics queries over the ``events`` stream table
(batch mode; the same event-time logic streams via §2.9 machinery).

Both are pure relational compositions (min-aggregates + joins /
window truncation), one shuffle per aggregation level, so they run
unchanged at 100 TB: the per-user intermediate tables are |users|
rows, far smaller than the event log, and every join key is the
user id (AQE-skew-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


@register(
    "events_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t_buy
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT v.user_id,
           epoch_us(v.t_view) AS view_us,
           epoch_us(c.t_click) AS click_us,
           epoch_us(p.t_buy) AS buy_us,
           1 + (CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END)
             + (CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END) AS steps
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase: first view, first click
    strictly after it, first purchase strictly after that, per user;
    ``steps`` counts completed stages. Three min-aggregates over the
    event log + two user-key joins — no window over raw events, so
    state is |users|, not |events|."""
    e = table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    out = v.join(c, "user_id", "left").join(p, "user_id", "left")
    return out.select(
        "user_id",
        F.unix_micros(F.col("t_view").cast("timestamp")).alias("view_us"),
        F.unix_micros(F.col("t_click").cast("timestamp")).alias("click_us"),
        F.unix_micros(F.col("t_buy").cast("timestamp")).alias("buy_us"),
        (
            F.lit(1)
            + F.when(F.col("t_click").isNull(), 0).otherwise(1)
            + F.when(F.col("t_buy").isNull(), 0).otherwise(1)
        ).alias("steps"),
    )


@register(
    "events_retention",
    oracle="""
    WITH firstw AS (
        SELECT user_id, min(date_trunc('week', ts)) AS w0
        FROM events GROUP BY user_id
    )
    SELECT CAST(datediff('week', f.w0, date_trunc('week', e.ts)) AS BIGINT) AS week_n,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firstw f ON e.user_id = f.user_id
    GROUP BY week_n
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users active N weeks after their first-seen
    week. The cohort table is |users| rows and joins back on user_id;
    week arithmetic stays on week-truncated timestamps, so the week
    delta is an exact integer on both engines."""
    e = table(spark, sf_dir, "events")
    firstw = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("w0")
    )
    wk = F.date_trunc("week", F.col("ts"))
    return (
        e.join(firstw, "user_id")
        .select(
            (F.datediff(wk, F.col("w0")) / 7).cast("long").alias("week_n"), "user_id"
        )
        .groupBy("week_n")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )
