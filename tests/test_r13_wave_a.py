"""Round-13 wave A: stream_tumbling_window_twin.

The twin runs the tumbling aggregate through Catalyst's F.window
operator while stream_tumbling carries the hand-applied integer
epoch-micros floor bucket; both register against the SAME DuckDB
oracle. These tests pin (1) build-vs-build equality at the fixture
SFs, and (2) the floor-mod edge cases the fixture cannot reach —
pre-1970 timestamps (negative micros must FLOOR, not truncate toward
zero), exact hour boundaries, epoch zero — on synthetic parquet,
cross-checked against a from-scratch Python floor and the DuckDB
oracle on the same file.
"""

from __future__ import annotations

import os

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

HOUR_US = 3600 * 1_000_000


def _rows(df):
    return {
        (r["window_start_us"], r["event_type"]): (r["n"], r["total_value"])
        for r in df.collect()
    }


def test_twin_matches_integer_bucket(spark, sf_dir):
    a = _rows(REGISTRY["stream_tumbling"].build(spark, sf_dir))
    b = _rows(REGISTRY["stream_tumbling_window_twin"].build(spark, sf_dir))
    assert a == b
    assert len(a) > 0


def _write_edge_events(spark, tmp_path) -> str:
    """Timestamps chosen to break a truncate-toward-zero bucket:
    pre-1970 mid-hour (must floor DOWN to the earlier hour), pre-1970
    exact hour (its own bucket start), epoch zero, a post-1970
    mid-hour, and a wall time inside a DST transition window (inert
    under the session's pinned UTC, pinned so a TZ regression
    surfaces here)."""
    rows = [
        ("1969-12-31 23:30:00", "click", 1.0),
        ("1969-12-31 23:59:59", "click", 2.0),
        ("1969-07-01 00:00:00", "view", 3.0),
        ("1969-07-01 00:45:00", "view", 4.0),
        ("1970-01-01 00:00:00", "click", 5.0),
        ("1970-01-01 00:30:00", "purchase", 6.0),
        ("2021-03-14 02:30:00", "purchase", 7.0),
    ]
    df = spark.createDataFrame(rows, "ts string, event_type string, value double")
    df = df.selectExpr(
        "cast(ts as timestamp) AS ts", "event_type", "value"
    )
    sf = str(tmp_path / "edge_sf")
    os.makedirs(sf, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "events.parquet")
    )
    return sf


def test_pre1970_floor_parity(spark, tmp_path):
    sf = _write_edge_events(spark, tmp_path)
    a = _rows(REGISTRY["stream_tumbling"].build(spark, sf))
    b = _rows(REGISTRY["stream_tumbling_window_twin"].build(spark, sf))
    assert a == b

    # from-scratch Python floor over the raw parquet (duckdb read,
    # no Spark machinery shared)
    con = duckdb.connect()
    raw = con.execute(
        f"SELECT epoch_us(ts), event_type, value FROM "
        f"'{os.path.join(sf, 'events.parquet')}/*.parquet'"
    ).fetchall()
    expect: dict = {}
    for us, et, v in raw:
        bucket = (us // HOUR_US) * HOUR_US  # Python // floors
        n, cents = expect.get((bucket, et), (0, 0))
        expect[(bucket, et)] = (n + 1, cents + round(v * 100))
    got = {k: (n, round(tv * 100)) for k, (n, tv) in a.items()}
    assert got == {k: (n, c) for k, (n, c) in expect.items()}

    # the pre-1970 mid-hour rows FLOORED (bucket strictly below ts)
    neg = [k for k in a if k[0] < 0]
    assert neg, "synthetic file must exercise negative epoch buckets"
    # 23:30 and 23:59:59 on 1969-12-31 land in the 23:00 bucket
    assert (-HOUR_US, "click") in a and a[(-HOUR_US, "click")][0] == 2

    # oracle agrees on the same file
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(sf, 'events.parquet')}/*.parquet'"
    )
    orows = con.execute(
        REGISTRY["stream_tumbling_window_twin"].oracle
    ).fetchall()
    odict = {(r[0], r[1]): (r[2], round(r[3] * 100)) for r in orows}
    assert odict == got
