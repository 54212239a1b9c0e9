"""Event-time operators in batch mode (SURVEY.md §2.9).

Spark's event-time semantics (window / session_window / dedup /
stream-static join) are identical in batch and streaming execution —
these batch-mode queries carry the DuckDB oracle; the *streaming*
execution of the same logic is exercised in
``etl_cnc_spark/streaming/streams.py`` and the stream-batch parity
tests (tests/test_streaming.py), where watermark/late-data behavior
is observable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ..utils import sql_sum_money, sum_money, ts_us


@register(
    "stream_tumbling",
    oracle=f"""
    SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_us,
           event_type, count(*) AS n, {sql_sum_money("value")} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    bench=True,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window × event_type aggregate."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), sum_money(F.col("value")).alias("total_value"))
        .select(
            ts_us(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "stream_sliding",
    oracle="""
    SELECT epoch_us(time_bucket(INTERVAL 15 MINUTE, ts)
                    - g.k * INTERVAL 15 MINUTE) AS window_start_us,
           count(*) AS n
    FROM events CROSS JOIN generate_series(0, 3) AS g(k)
    GROUP BY 1
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 15min slide): every event falls in
    exactly 4 windows; the oracle enumerates them explicitly."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n"))
        .select(ts_us(F.col("window.start")).alias("window_start_us"), "n")
    )


@register(
    "stream_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ), numbered AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM flagged
    )
    SELECT user_id, epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) AS last_event_us, count(*) AS n_events
    FROM numbered GROUP BY user_id, sess_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user via session_window;
    the oracle is the classic gaps-and-islands formulation. Emits
    min/max event time (Spark's session end = last_ts + gap, so
    last_event_us is the engine-neutral comparable)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            ts_us(F.col("first_ts")).alias("session_start_us"),
            ts_us(F.col("last_ts")).alias("last_event_us"),
            "n_events",
        )
    )


@register(
    "stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup on a key subset. Batch twin of
    ``dropDuplicatesWithinWatermark`` (streaming run in
    tests/test_streaming.py); only key columns are emitted because
    which duplicate survives is explicitly unspecified."""
    return table(spark, sf_dir, "events").dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )


@register(
    "stream_join",
    oracle=f"""
    SELECT c_mktsegment, event_type, count(*) AS n,
           {sql_sum_money("value")} AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    """,
)
def stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (batch twin): fact stream ⋈
    broadcast dimension — in streaming execution the static side is
    re-broadcast per micro-batch, no state required."""
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n"), sum_money(F.col("value")).alias("total_value"))
    )
