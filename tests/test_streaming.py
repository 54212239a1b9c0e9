"""Stream-batch parity (SURVEY.md §5): the streaming execution of an
event-time op must equal its batch twin — stronger than rows-only,
and the only way to verify watermark semantics."""

from __future__ import annotations

import pandas as pd

from etl_cnc_spark.oracle import canonical_rows
from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _canon(df) -> list:
    return canonical_rows(df.toPandas())


def test_stream_identity_equals_batch(spark, sf_dir):
    """source_stream_files: a real micro-batch run loses nothing."""
    from etl_cnc_spark.catalog import table
    from pyspark.sql import functions as F

    streamed = REGISTRY["source_stream_files"].build(spark, sf_dir)
    batch = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props",
        F.unix_micros("ts").alias("ts_us"),
    )
    assert _canon(streamed) == _canon(batch)


def test_windowed_stream_equals_batch_closed_windows(spark, sf_dir):
    """sink_stream emits exactly the batch windows closed by the
    final watermark (end <= max_ts - delay)."""
    from etl_cnc_spark.catalog import table
    from pyspark.sql import functions as F

    streamed = REGISTRY["sink_stream"].build(spark, sf_dir)
    ev = table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    batch = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .where(F.col("window.end") <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n",
        )
    )
    assert _canon(streamed) == _canon(batch)


def test_watermark_drops_late_data(spark, sf_dir):
    """stream_watermark: day-5 windows are absent (dropped as late),
    and on-time windows match the batch result exactly."""
    out = REGISTRY["stream_watermark"].build(spark, sf_dir).toPandas()
    day5_start = pd.Timestamp("2024-01-05").value // 1000
    day6_start = pd.Timestamp("2024-01-06").value // 1000
    assert not (
        (out["window_start_us"] >= day5_start) & (out["window_start_us"] < day6_start)
    ).any(), "late day-5 data leaked past the watermark"
    assert len(out) > 0


def test_stateful_stream_equals_batch_aggregate(spark, sf_dir):
    """stream_stateful (applyInPandasWithState): final state equals
    the batch per-user aggregate."""
    from etl_cnc_spark.catalog import table
    from pyspark.sql import functions as F

    streamed = REGISTRY["stream_stateful"].build(spark, sf_dir)
    batch = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("sum_cents"),
        )
    )
    assert _canon(streamed) == _canon(batch)


def test_stream_dedup_within_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark streaming run: output key-set
    equals batch DISTINCT (fixtures have no cross-batch dups, so the
    within-watermark guarantee is exact here)."""
    from etl_cnc_spark.streaming.streams import (
        _read_stream,
        _run_to_parquet,
        _stage_events_dir,
    )

    src = _stage_events_dir(sf_dir)
    s = (
        _read_stream(spark, src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    out = _run_to_parquet(s)
    streamed = spark.read.parquet(out)
    batch = REGISTRY["stream_dedup"].build(spark, sf_dir)
    assert _canon(streamed) == _canon(batch)
