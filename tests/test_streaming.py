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


def test_session_window_stream_equals_batch_closed_sessions(spark, sf_dir):
    """Real streaming session windows (30-min gap, 1-h watermark,
    availableNow replay): the emitted sessions must be exactly the
    batch-mode sessions that CLOSED before the final watermark
    (end = last_ts + gap <= max_ts - delay). Session windows carry
    the most complex streaming state (gap-merging); this pins their
    batch parity."""
    import pandas as pd
    from pyspark.sql import functions as F

    from etl_cnc_spark.catalog import table
    from etl_cnc_spark.streaming.streams import (
        _read_stream,
        _run_to_parquet,
        _stage_events_dir,
    )

    src = _stage_events_dir(sf_dir)
    s = (
        _read_stream(spark, src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), F.max("ts").alias("last_ts"))
        .select(
            "user_id",
            F.unix_micros("last_ts").alias("last_event_us"),
            "n_events",
        )
    )
    out = _run_to_parquet(s, "append")
    streamed = spark.read.parquet(out).toPandas()

    e = table(spark, sf_dir, "events")
    max_us = e.agg(F.unix_micros(F.max("ts"))).first()[0]
    horizon_us = max_us - 3_600_000_000  # watermark delay
    batch = (
        REGISTRY["stream_session"].build(spark, sf_dir).toPandas()
    )
    gap_us = 30 * 60 * 1_000_000
    closed = batch[batch["last_event_us"] + gap_us <= horizon_us]

    key = ["user_id", "last_event_us", "n_events"]
    a = streamed[key].sort_values(key).reset_index(drop=True)
    b = closed[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_sliding_window_stream_equals_batch_closed_windows(spark, sf_dir):
    """Real streaming sliding windows (1h length / 15min slide, 1-h
    watermark, availableNow): emitted windows must be exactly the
    batch windows whose END cleared the final watermark. Overlapping
    windows mean each event updates 4 window states — the high-state
    sliding shape."""
    import pandas as pd
    from pyspark.sql import functions as F

    from etl_cnc_spark.catalog import table
    from etl_cnc_spark.streaming.streams import (
        _read_stream,
        _run_to_parquet,
        _stage_events_dir,
    )

    src = _stage_events_dir(sf_dir)
    s = (
        _read_stream(spark, src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_micros("window.start").alias("window_start_us"),
            F.unix_micros("window.end").alias("window_end_us"),
            "n",
        )
    )
    out = _run_to_parquet(s, "append")
    streamed = spark.read.parquet(out).toPandas()

    e = table(spark, sf_dir, "events")
    max_us = e.agg(F.unix_micros(F.max("ts"))).first()[0]
    horizon_us = max_us - 3_600_000_000
    batch = REGISTRY["stream_sliding"].build(spark, sf_dir).toPandas()
    hour_us = 3_600_000_000
    closed = batch[batch["window_start_us"] + hour_us <= horizon_us]

    key = ["window_start_us", "n"]
    a = streamed[key].sort_values(key).reset_index(drop=True)
    b = closed[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_tws_variant_gates_on_protobuf(spark, sf_dir):
    """Spark 4 transformWithStateInPandas variant: runs end-to-end
    and matches the batch aggregate when protobuf is available;
    raises the documented NotImplementedError gate when not (this
    container: no protobuf, no package installs — the TWS Python
    state-server protocol needs it)."""
    import pytest

    from etl_cnc_spark.streaming.streams import stream_stateful_tws

    try:
        import google.protobuf  # noqa: F401
        have_protobuf = True
    except ImportError:
        have_protobuf = False

    if not have_protobuf:
        with pytest.raises(NotImplementedError, match="protobuf"):
            stream_stateful_tws(spark, sf_dir)
        return

    got = stream_stateful_tws(spark, sf_dir).toPandas()
    want = REGISTRY["stream_stateful"].build(spark, sf_dir).toPandas()
    key = ["user_id", "n_events", "sum_cents"]
    a = got[key].sort_values("user_id").reset_index(drop=True)
    b = want[key].sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_stream_restart_resumes_from_checkpoint(spark, sf_dir):
    """Exactly-once across a restart: run a file-source → file-sink
    pipeline with availableNow, stop it, land MORE input, restart
    the SAME checkpoint — the second run must pick up only the new
    files, and the sink must hold every row exactly once."""
    from pyspark.sql import functions as F

    from etl_cnc_spark.catalog import table
    from etl_cnc_spark.utils import tmpdir

    src = tmpdir("etlcnc-restart-src-")
    out = tmpdir("etlcnc-restart-out-")
    ckpt = tmpdir("etlcnc-restart-ckpt-")
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    schema = e.schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "availableNow query timed out"

    e.where(F.col("event_id") % 2 == 0).write.mode("append").parquet(src)
    run_once()
    first = spark.read.parquet(out).count()
    e.where(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
    run_once()  # fresh query object, same checkpoint: must RESUME
    got = sorted(
        r["event_id"] for r in spark.read.parquet(out).collect()
    )
    want = sorted(r["event_id"] for r in e.collect())
    assert first == sum(1 for i in want if i % 2 == 0)
    assert got == want  # every row exactly once — no replays, no loss


def test_stream_static_join_matches_batch(spark, sf_dir):
    """The drained stream-static join must equal the batch join with
    the append-mode emission fence (day windows below max ts - 1h),
    and the last (unflushed) day must be absent."""
    import duckdb

    from etl_cnc_spark.registry import load_all

    rows = duckdb.execute(
        """
        SELECT epoch_us(date_trunc('day', e.ts)) AS w, c.c_mktsegment,
               count(*) AS n
        FROM read_parquet(?) e JOIN read_parquet(?) c
          ON c.c_custkey = e.user_id
        GROUP BY 1, 2
        """,
        [f"{sf_dir}/events.parquet", f"{sf_dir}/customer.parquet"],
    ).fetchall()
    max_us = duckdb.execute(
        f"SELECT epoch_us(max(ts)) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    fence = max_us - 3_600_000_000
    expected = {
        (w, seg): n for w, seg, n in rows if w + 86_400_000_000 <= fence
    }
    out = {
        (r["window_start_us"], r["c_mktsegment"]): r["n"]
        for r in load_all()["stream_static_join"].build(spark, sf_dir).collect()
    }
    assert out == expected
    last_day = max(w for w, _ in {(w, s) for w, s, _ in rows})
    assert all(w != last_day for w, _ in out)
