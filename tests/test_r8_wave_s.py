"""Independent-recomputation properties for the round-8 wave-S keys
(log-rank test, group-fairness report)."""

from __future__ import annotations

import datetime

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_logrank_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT user_id,"
        " date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)),"
        " CAST(max(ts) AS DATE),"
        " count_if(event_type = 'purchase') > 0"
        f" FROM '{sf_dir}/events.parquet' GROUP BY user_id"
    ).fetchall()
    gmax = max(r[2] for r in rows)
    fence = gmax - datetime.timedelta(days=2)
    users = [(t, 1 if grp else 0, last < fence) for _, t, last, grp in rows]
    times = sorted({t for t, _, _ in users})
    oe = v = 0.0
    for t in times:
        n1 = sum(1 for u in users if u[0] >= t and u[1] == 1)
        n0 = sum(1 for u in users if u[0] >= t and u[1] == 0)
        d1 = sum(1 for u in users if u[0] == t and u[1] == 1 and u[2])
        d0 = sum(1 for u in users if u[0] == t and u[1] == 0 and u[2])
        n, d = n1 + n0, d1 + d0
        if d == 0 or n1 == 0 or n0 == 0:
            continue
        oe += d1 - d * n1 / n
        if n > 1:
            v += d * n1 * n0 * (n - d) / n / n / (n - 1)
    chi2 = oe**2 / v if v > 0 else 0.0  # degenerate corpus -> 0 by spec
    row = REGISTRY["events_logrank_test"].build(spark, sf_dir).collect()[0]
    assert row["n_users_purchasers"] == sum(1 for u in users if u[1] == 1)
    assert row["n_users_other"] == sum(1 for u in users if u[1] == 0)
    assert abs(row["chi2"] - chi2) < max(1e-3, 1e-3 * chi2)
    assert row["significant"] == (v > 0 and chi2 > 3.8415)


def test_fairness_report_matches_numpy(spark, sf_dir):
    scores = duckdb.execute(
        "SELECT vec_id % 3, label % 2, "
        + REGISTRY["ml_fairness_report"].oracle.split("WITH scored AS (")[1]
        .split("FROM embeddings")[0]
        .split("CASE WHEN (")[1]
        .split(") >= 0.5")[0]
        + f" >= 0.5 FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    g = np.array([r[0] for r in scores])
    y = np.array([r[1] for r in scores])
    pred = np.array([1 if r[2] else 0 for r in scores])
    g_rate = pred.mean()
    out = {
        r["grp"]: r
        for r in REGISTRY["ml_fairness_report"].build(spark, sf_dir).collect()
    }
    assert set(out) == {0, 1, 2}
    for grp in (0, 1, 2):
        m = g == grp
        row = out[grp]
        assert row["n"] == int(m.sum())
        assert abs(row["positive_rate"] - pred[m].mean()) < 1e-3
        pos = m & (y == 1)
        neg = m & (y == 0)
        assert abs(row["tpr"] - pred[pos].mean()) < 1e-3
        assert abs(row["fpr"] - pred[neg].mean()) < 1e-3
        assert abs(row["dp_gap"] - (pred[m].mean() - g_rate)) < 1e-3
    # parity gaps sum to ~0 when weighted by group size
    total = sum(out[grp]["n"] * out[grp]["dp_gap"] for grp in (0, 1, 2))
    assert abs(total) < 1.0


def test_mantel_haenszel_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT CAST(isodow(ts) AS BIGINT),"
        " CASE WHEN hour(ts) >= 12 THEN 1 ELSE 0 END,"
        " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0, 0, 0])  # a, b, c, d
    for s, e, o in rows:
        idx = 0 if (e, o) == (1, 1) else 1 if (e, o) == (1, 0) else 2 if (e, o) == (0, 1) else 3
        cells[s][idx] += 1
    num = den = 0.0
    sa = sb = sc = sd = 0
    for a, b, c, d in cells.values():
        n = a + b + c + d
        num += a * d / n
        den += b * c / n
        sa += a
        sb += b
        sc += c
        sd += d
    row = REGISTRY["stat_mantel_haenszel"].build(spark, sf_dir).collect()[0]
    assert row["n_strata"] == len(cells)
    assert abs(row["or_mh"] - num / den) < 1e-3
    assert abs(row["or_crude"] - (sa * sd) / (sb * sc)) < 1e-3
    assert row["or_mh"] > 0
