"""Independent-recomputation properties for the round-8 wave-AA keys
(Brown-Forsythe robust variance test, embedding variance spectrum)."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_brown_forsythe_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT)"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    groups: dict[str, list[int]] = defaultdict(list)
    for g, xc in rows:
        groups[g].append(xc)
    # median element where cum count first reaches ceil((n+1)/2):
    # the middle for odd n, the UPPER median for even n (the spec)
    z_groups = []
    for g, xs in groups.items():
        xs = np.sort(np.array(xs, dtype=np.int64))
        n = len(xs)
        med = xs[(n + 1) // 2 - 1] if n % 2 == 1 else xs[n // 2]
        z_groups.append(np.abs(xs - med).astype(np.float64))
    k = len(z_groups)
    nt = sum(len(z) for z in z_groups)
    zbar = sum(z.sum() for z in z_groups) / nt
    ssb = sum(len(z) * (z.mean() - zbar) ** 2 for z in z_groups)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in z_groups)
    f = (ssb / (k - 1)) / (ssw / (nt - k))
    row = REGISTRY["stat_brown_forsythe"].build(spark, sf_dir).collect()[0]
    assert row["k"] == k and row["nt"] == nt
    assert abs(row["f_stat"] - f) < max(2e-3, 1e-4 * f)
    assert row["f_stat"] >= 0


def test_variance_spectrum_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    emb = np.array([r[0] for r in rows], dtype=np.float64)
    xq = np.floor(emb * 1e6 + 0.5)
    n = len(emb)
    v = (xq**2).sum(axis=0) - xq.sum(axis=0) ** 2 / n
    v = v / (n - 1) / 1e12
    vq = np.floor(v * 1e6 + 0.5)
    vtq = vq.sum()
    v2q = np.floor(v * v * 1e6 + 0.5).sum()
    eff = (vtq / 1e6) ** 2 / (v2q / 1e6)
    got = {
        r["dim"]: r
        for r in REGISTRY["embed_variance_spectrum"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(range(1, 65))
    order = sorted(range(64), key=lambda i: (-v[i], i + 1))
    cum = 0
    for rank, i in enumerate(order, start=1):
        row = got[i + 1]
        cum += vq[i]
        assert row["rank"] == rank
        assert abs(row["variance"] - v[i]) < 2e-4
        assert abs(row["share"] - vq[i] / vtq) < 2e-4
        assert abs(row["cum_share"] - cum / vtq) < 2e-4
        assert abs(row["effective_dims"] - eff) < 2e-3
    # ranked shares must accumulate to exactly 1
    top = got[order[0] + 1]
    last = got[order[-1] + 1]
    assert abs(last["cum_share"] - 1.0) < 2e-4
    assert top["share"] >= last["share"]
    assert 1.0 <= top["effective_dims"] <= 64.0
