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
from ..utils import q4, sql_q4, sql_sum_money, sum_money, ts_us


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
    """Tumbling 1-hour window × event_type aggregate.

    The bucket is computed as pure integer arithmetic on epoch micros
    (floor-mod so pre-1970 timestamps floor correctly) — exactly the
    rewrite Catalyst's ResolveTimeWindows applies to a non-overlapping
    ``F.window`` (floor((t - offset) / slide) * slide), minus the
    struct(start, end) wrapping and timestamp round-trips that the
    generic rule keeps.  Grouping on one LONG instead of a
    struct-of-two-timestamps narrows the shuffle key 4x and keeps the
    whole aggregate in integer codegen; measured ~25% faster at sf0.1
    (r12 interleaved 8-run: 0.264 s vs 0.364 s).  The streaming
    execution of the same logic — where the window operator and
    watermarking are actually load-bearing — stays on ``F.window`` in
    streaming/streams.py (stream_watermark) and the stream-batch
    parity tests."""
    e = table(spark, sf_dir, "events")
    hour_us = 3600 * 1000 * 1000
    us = F.unix_micros(F.col("ts"))
    bucket = us - ((us % hour_us) + hour_us) % hour_us
    return (
        e.groupBy(bucket.alias("window_start_us"), "event_type")
        .agg(F.count("*").alias("n"), sum_money(F.col("value")).alias("total_value"))
        .select("window_start_us", "event_type", "n", "total_value")
    )


@register(
    "stream_tumbling_window_twin",
    oracle=f"""
    SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_us,
           event_type, count(*) AS n, {sql_sum_money("value")} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``F.window`` twin of stream_tumbling (VERDICT r12 item 8): the
    SAME tumbling 1-hour aggregate through Catalyst's own window
    operator instead of the hand-applied integer epoch-micros floor
    bucket.  Identical output schema and oracle, so hash parity of
    BOTH keys against the SAME SQL is standing executable evidence
    that the r12 integer-bucket rewrite equals the window operator —
    if either side ever drifts (a Spark upgrade changing window
    alignment, or a bucket-arithmetic regression), one of the two
    gates goes red.  The floor-mod edge cases the fixture can't reach
    (pre-1970 timestamps, exact hour boundaries, epoch zero) are
    pinned on synthetic parquet in tests/test_r13_wave_a.py, where
    both builds and a from-scratch Python floor are compared.

    Scale shape: identical to stream_tumbling minus the 4x-narrower
    shuffle key — this twin carries the struct(start, end) group key
    deliberately; the benched production path stays integer."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            sum_money(F.col("value")).alias("total_value"),
        )
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


# ------------------------------------------------ drift monitoring

DRIFT_REF_DAY = "2024-01-01"  # reference distribution = first day
DRIFT_BIN_W = "25.0"
DRIFT_NBINS = 20
DRIFT_TAU = "0.25"  # PSI alert threshold for a single day's traffic


@register(
    "stream_drift_monitor",
    oracle=f"""
    WITH binned AS (
        SELECT CAST(date_diff('day', DATE '{DRIFT_REF_DAY}',
                              CAST(ts AS DATE)) AS BIGINT) AS day_n,
               least(CAST(floor(value / {DRIFT_BIN_W}) AS BIGINT),
                     {DRIFT_NBINS - 1}) AS b
        FROM events
    ), cur AS (
        SELECT day_n, b, CAST(count(*) AS BIGINT) AS nb
        FROM binned GROUP BY day_n, b
    ), ref AS (
        SELECT b, nb AS nb_ref FROM cur WHERE day_n = 0
    ), days AS (
        SELECT day_n, CAST(sum(nb) AS BIGINT) AS n_day FROM cur
        GROUP BY day_n
    ), ref_total AS (
        SELECT CAST(sum(nb_ref) AS BIGINT) AS n_ref FROM ref
    ), bins AS (
        SELECT DISTINCT b FROM cur
    ), grid AS (
        SELECT d.day_n, d.n_day, bb.b FROM days d CROSS JOIN bins bb
    ), contrib AS (
        SELECT g.day_n, g.n_day,
               CAST(floor(
                   (((coalesce(c.nb, 0) + 0.5) / (g.n_day + 10.0))
                      - ((coalesce(r.nb_ref, 0) + 0.5) / (t.n_ref + 10.0)))
                   * ln(((coalesce(c.nb, 0) + 0.5) / (g.n_day + 10.0))
                        / ((coalesce(r.nb_ref, 0) + 0.5) / (t.n_ref + 10.0)))
                   * 1e10 + 0.5) AS BIGINT) AS c_e10
        FROM grid g
        LEFT JOIN cur c ON c.day_n = g.day_n AND c.b = g.b
        LEFT JOIN ref r ON r.b = g.b
        CROSS JOIN ref_total t
    ), psi AS (
        SELECT day_n, max(n_day) AS n_day,
               CAST(sum(c_e10) AS DOUBLE) / 1e10 AS psi
        FROM contrib GROUP BY day_n
    )
    SELECT day_n, n_day, {sql_q4("psi")} AS psi,
           psi > {DRIFT_TAU} AS drifted
    FROM psi
    """,
)
def stream_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time drift monitor: per-day PSI of the value
    distribution against the FIRST day's reference distribution —
    the production monitoring twin of ``stat_psi_drift`` (one PSI
    point per tumbling day instead of one report).

    Streaming execution shape: tumbling-day windowed bin counts
    (map-side combinable) ⋈ a broadcast static reference — the
    stream-static join pattern of ``stream_join``; the reference
    table would be the frozen training-time distribution. Batch twin
    here carries the oracle (event-time semantics identical).

    Scale shape: ONE data-sized aggregate to (day × ≤20 bins); the
    per-day PSI runs on the bounded (days × bins) grid with
    contributions summed as e-10 fixed-point integers — exact,
    order-free, bit-identical at any parallelism."""
    e = table(spark, sf_dir, "events")
    binned = e.select(
        F.datediff(F.col("ts").cast("date"), F.lit(DRIFT_REF_DAY).cast("date"))
        .cast("long")
        .alias("day_n"),
        F.least(
            F.floor(F.col("value") / F.lit(float(DRIFT_BIN_W))).cast("long"),
            F.lit(DRIFT_NBINS - 1),
        ).alias("b"),
    )
    cur = binned.groupBy("day_n", "b").agg(F.count("*").cast("long").alias("nb")).localCheckpoint(eager=False)
    ref = cur.where(F.col("day_n") == 0).select("b", F.col("nb").alias("nb_ref"))
    days = cur.groupBy("day_n").agg(F.sum("nb").cast("long").alias("n_day"))
    ref_total = ref.agg(F.sum("nb_ref").cast("long").alias("n_ref"))
    bins = cur.select("b").distinct()
    grid = days.crossJoin(F.broadcast(bins))
    p_cur = (F.coalesce(F.col("nb"), F.lit(0)) + F.lit(0.5)) / (
        F.col("n_day") + F.lit(10.0)
    )
    p_ref = (F.coalesce(F.col("nb_ref"), F.lit(0)) + F.lit(0.5)) / (
        F.col("n_ref") + F.lit(10.0)
    )
    c_e10 = F.floor(
        (p_cur - p_ref) * F.log(p_cur / p_ref) * F.lit(1e10) + F.lit(0.5)
    ).cast("long")
    contrib = (
        grid.join(cur, ["day_n", "b"], "left")
        .join(F.broadcast(ref), "b", "left")
        .crossJoin(F.broadcast(ref_total))
        .select("day_n", "n_day", c_e10.alias("c_e10"))
    )
    psi = contrib.groupBy("day_n").agg(
        F.max("n_day").alias("n_day"),
        (F.sum("c_e10").cast("double") / F.lit(1e10)).alias("psi"),
    )
    return psi.select(
        "day_n",
        "n_day",
        q4(F.col("psi")).alias("psi"),
        (F.col("psi") > F.lit(float(DRIFT_TAU))).alias("drifted"),
    )


@register(
    "stream_topk_windowed",
    oracle="""
    WITH agg AS (
        SELECT epoch_us(time_bucket(INTERVAL 6 HOUR, ts)) AS window_start_us,
               event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT window_start_us, event_type, n,
               CAST(row_number() OVER (PARTITION BY window_start_us
                    ORDER BY n DESC, event_type) AS BIGINT) AS rk
        FROM agg
    )
    SELECT window_start_us, event_type, n, rk FROM ranked WHERE rk <= 3
    """,
)
def stream_topk_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per 6-hour tumbling window — the trending-
    topics shape: a windowed aggregate followed by a rank WITHIN each
    window. In streaming execution the aggregate tier runs
    incrementally with a watermark and the rank runs per emitted
    window on the bounded (window × type) grid — which is exactly
    the batch plan too: one data-sized shuffle into the window
    aggregate, then a window function over |windows|·|types| rows
    (never the raw events). Deterministic tie-break on event_type
    keeps the podium hash-stable."""
    e = table(spark, sf_dir, "events")
    agg = e.groupBy(F.window("ts", "6 hours"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    from pyspark.sql import Window as W

    grid = agg.select(
        ts_us(F.col("window.start")).alias("window_start_us"),
        "event_type",
        "n",
    )
    wrk = W.partitionBy("window_start_us").orderBy(F.desc("n"), "event_type")
    return (
        grid.withColumn("rk", F.row_number().over(wrk).cast("long"))
        .where(F.col("rk") <= 3)
    )


@register(
    "win_session_window",
    oracle="""
    WITH ev AS (
        SELECT user_id, epoch_us(ts) AS t FROM events
    ), marked AS (
        SELECT user_id, t,
               CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                    > 1800000000 OR lag(t) OVER (PARTITION BY user_id
                        ORDER BY t) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM ev
    ), sessions AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sid
        FROM marked
    ), per AS (
        SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events
        FROM sessions GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(max(n_events) AS BIGINT) AS max_events,
           CAST(sum(n_events) AS BIGINT) AS total_events
    FROM per GROUP BY user_id
    """,
)
def win_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`session_window()` as a BATCH aggregation (Spark's built-in
    gap-based session assignment, the same operator Structured
    Streaming uses, applied to a static frame): per-user 30-minute-
    gap sessions rolled to session counts and sizes. The oracle
    restates the semantics with the classic gaps-and-islands
    lag/cumsum construction, so the built-in's session boundaries
    are verified row-exactly against first principles — the same
    cross-check events_sessionize does for the manual construction,
    now covering the ENGINE's operator. One shuffle on user_id;
    session assignment is a per-partition sort-merge inside the
    aggregate."""
    e = table(spark, sf_dir, "events")
    per = e.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_events"),
        F.sum("n_events").cast("long").alias("total_events"),
    )
