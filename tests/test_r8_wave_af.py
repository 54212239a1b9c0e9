"""Independent-recomputation properties for the round-8 wave-AF keys
(Dunn post-hoc pairwise rank test, Allan variance)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_dunn_posthoc_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT)"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    by_g: dict[str, list[int]] = defaultdict(list)
    for g, v in rows:
        by_g[g].append(v)
    pool = np.sort(np.array([v for _, v in rows], dtype=np.int64))
    n = len(pool)

    def midranks(sample):
        lo = np.searchsorted(pool, sample, side="left")
        hi = np.searchsorted(pool, sample, side="right")
        return (lo + hi + 1) / 2.0

    mean_rank = {g: float(midranks(np.array(v)).mean()) for g, v in by_g.items()}
    tie_counts = Counter(pool.tolist())
    t3t = sum(c**3 - c for c in tie_counts.values())
    base_var = n * (n + 1) / 12.0 - t3t / (12.0 * (n - 1))
    got = {
        (r["g1"], r["g2"]): r
        for r in REGISTRY["stat_dunn_posthoc"].build(spark, sf_dir).collect()
    }
    gs = sorted(by_g)
    assert set(got) == {(a, b) for i, a in enumerate(gs) for b in gs[i + 1:]}
    for (g1, g2), r in got.items():
        z = (mean_rank[g1] - mean_rank[g2]) / math.sqrt(
            base_var * (1 / len(by_g[g1]) + 1 / len(by_g[g2]))
        )
        assert abs(r["mean_rank_1"] - mean_rank[g1]) < 2e-3
        assert abs(r["mean_rank_2"] - mean_rank[g2]) < 2e-3
        assert abs(r["z"] - z) < 2e-3
        assert r["significant"] == (abs(r["z"]) > 2.807)


def test_allan_variance_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT date_diff('hour', (SELECT min(date_trunc('hour', ts))"
        f" FROM '{sf_dir}/events.parquet'), date_trunc('hour', ts)),"
        f" count(*) FROM '{sf_dir}/events.parquet' GROUP BY 1"
    ).fetchall()
    hourly = dict(rows)
    got = {
        r["tau_hours"]: r
        for r in REGISTRY["events_allan_variance"].build(spark, sf_dir).collect()
    }
    assert set(got) == {1, 2, 4, 8}
    for tau in (1, 2, 4, 8):
        bins: dict[int, int] = defaultdict(int)
        for h, m in hourly.items():
            bins[h // tau] += m
        bs = [bins[b] for b in sorted(bins)]
        diffs = np.diff(np.array(bs, dtype=np.float64))
        avar = 0.5 * (diffs**2).mean()
        meanb = (np.array(bs[1:]).sum() + np.array(bs[:-1]).sum()) / (
            2 * len(diffs)
        )
        row = got[tau]
        assert row["n_diffs"] == len(diffs)
        assert abs(row["allan_var"] - avar) < max(2e-3, 1e-4 * avar)
        assert abs(row["mean_bin_count"] - meanb) < 2e-3
        assert abs(row["avar_over_mean"] - avar / meanb) < 2e-3
    # white (Poisson-like) arrivals: dispersion ratio stays order-1
    assert 0.1 < got[1]["avar_over_mean"] < 10.0
