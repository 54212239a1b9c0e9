"""Independent-recomputation properties for the round-8 wave-AK keys
(semi-Markov dwell times, Gini mean difference)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_dwell_times_match_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT user_id, event_type, ts, event_id"
        f" FROM '{sf_dir}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user: dict[int, list] = defaultdict(list)
    for uid, et, ts, eid in rows:
        by_user[uid].append((ts, eid, et))
    gaps: dict[str, list[int]] = defaultdict(list)
    for seq in by_user.values():
        for (ts, _, et), (nxt, _, _) in zip(seq, seq[1:]):
            gaps[et].append(int((nxt - ts).total_seconds()))
    got = {
        r["event_type"]: r
        for r in REGISTRY["events_markov_dwell_times"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(gaps)
    for et, gs in gaps.items():
        a = np.array(gs, dtype=np.float64)
        row = got[et]
        assert row["n_transitions"] == len(a)
        assert abs(row["mean_dwell_s"] - a.mean()) < max(
            2e-3, 1e-4 * a.mean()
        )
        sd = a.std(ddof=1)
        assert abs(row["std_dwell_s"] - sd) < max(2e-3, 1e-4 * sd)
        assert abs(row["cv_dwell"] - sd / a.mean()) < 2e-3


def test_gmd_matches_numpy(spark, sf_dir):
    vals = np.array(
        [
            r[0]
            for r in duckdb.execute(
                "SELECT CAST(floor(value * 100 + 0.5) AS BIGINT)"
                f" FROM '{sf_dir}/events.parquet'"
            ).fetchall()
        ],
        dtype=np.int64,
    )
    n = len(vals)
    srt = np.sort(vals)
    k = np.arange(1, n + 1)
    pair_abs = int(((2 * k - 1 - n) * srt).sum())  # sum over pairs |xi-xj|
    gmd = 2 * pair_abs / (n * (n - 1)) / 100.0
    gini = pair_abs / n / srt.sum()
    row = (
        REGISTRY["stat_gini_mean_difference"].build(spark, sf_dir).collect()[0]
    )
    assert row["n"] == n
    assert abs(row["mean_value"] - srt.mean() / 100.0) < 2e-3
    assert abs(row["gmd"] - gmd) < 2e-3
    assert abs(row["gini_coeff"] - gini) < 2e-4
    # GMD never exceeds twice the mean for nonnegative data
    assert row["gmd"] <= 2 * row["mean_value"] + 1e-9
    assert 0.0 <= row["gini_coeff"] <= 1.0
