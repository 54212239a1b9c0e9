"""Properties for the round-7 wave-J streaming keys: the rate-source
rollup re-derived in plain Python, and the watermark drop metrics
re-counted from the raw parquet."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_rate_source_matches_python(spark, sf_dir):
    from etl_cnc_spark.streaming.streams import RATE_ROWS

    want = defaultdict(lambda: [0, 0, None, None])
    for v in range(RATE_ROWS):
        k = v % 7
        row = want[k]
        row[0] += 1
        row[1] += (v * v) % 10000
        t = (v * 137) % 86400000
        row[2] = t if row[2] is None else min(row[2], t)
        row[3] = t if row[3] is None else max(row[3], t)
    got = {
        r["k"]: r
        for r in REGISTRY["stream_rate_source"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k, (n, amt, tmin, tmax) in want.items():
        assert got[k]["n"] == n
        assert got[k]["amount"] == amt
        assert got[k]["t_min"] == tmin
        assert got[k]["t_max"] == tmax


def test_late_metrics_match_raw_counts(spark, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    n_input, n_day5 = con.execute(
        "SELECT count(*), count_if(day(ts) = 5) FROM events"
    ).fetchone()
    out = REGISTRY["stream_late_metrics"].build(spark, sf_dir).collect()[0]
    assert out["n_input"] == n_input
    assert out["n_dropped"] == n_day5
    assert out["n_kept"] == n_input - n_day5
