"""Independent-recomputation property for the round-8 wave-AQ key
(arbitrary-width origin-aligned time_bucket)."""

from __future__ import annotations

import datetime
from collections import Counter

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

WIDTH_US = 27_180 * 1_000_000
ORIGIN = datetime.datetime(2024, 1, 1)


def test_time_bucket_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT epoch_us(ts) FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    origin_us = int(ORIGIN.timestamp() * 1_000_000)  # UTC fixture clock
    # duckdb epoch_us treats naive timestamps as UTC; mirror that
    origin_us = int(
        (ORIGIN - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000
    )
    buckets: Counter = Counter()
    for (us,) in rows:
        b = origin_us + ((us - origin_us) // WIDTH_US) * WIDTH_US
        buckets[b] += 1
    got = {
        r["bucket_us"]: r["n"]
        for r in REGISTRY["fn_time_bucket"].build(spark, sf_dir).collect()
    }
    assert got == dict(buckets)
    # every bucket key is origin-aligned to the width
    for b in got:
        assert (b - origin_us) % WIDTH_US == 0
    # counts partition the stream
    assert sum(got.values()) == len(rows)
