"""Independent-recomputation property for the round-8 wave-J key
(events_interarrival_burstiness): the Goh-Barabási B coefficient
re-derived with plain Python from per-(user, type) event sequences."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_burstiness_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT user_id, event_type, epoch_us(ts) FROM"
        f" '{sf_dir}/events.parquet' ORDER BY user_id, event_type, ts, event_id"
    ).fetchall()
    gaps = defaultdict(list)
    prev = {}
    for uid, et, us in rows:
        key = (uid, et)
        if key in prev:
            gaps[et].append((us - prev[key]) // 1_000_000)
        prev[key] = us
    out = {
        r["event_type"]: r
        for r in REGISTRY["events_interarrival_burstiness"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(out) == set(gaps)
    for et, gs in gaps.items():
        n = len(gs)
        mu = sum(gs) / n
        var = sum(g * g for g in gs) / n - mu * mu
        sigma = math.sqrt(var)
        b = (sigma - mu) / (sigma + mu)
        row = out[et]
        assert row["n_gaps"] == n
        assert abs(row["mean_gap_s"] - mu) < max(1e-3, 1e-6 * mu)
        assert abs(row["b_index"] - b) < 1e-3
        # B is bounded in (-1, 1)
        assert -1.0 < row["b_index"] < 1.0
