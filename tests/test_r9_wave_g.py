"""Independent-recomputation properties for the round-9 wave-G keys
(capture-recapture, Chao1, transfer entropy, R² Shapley, Siegel
repeated-median)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_capture_recapture_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT user_id,
               max(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-16'
                   THEN 1 ELSE 0 END),
               max(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-16'
                   THEN 1 ELSE 0 END)
        FROM '{sf_dir}/events.parquet' GROUP BY user_id
    """).fetchall()
    n1 = sum(r[1] for r in rows)
    n2 = sum(r[2] for r in rows)
    m = sum(r[1] * r[2] for r in rows)
    chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    se = math.sqrt(
        (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
        / ((m + 1) ** 2 * (m + 2))
    )
    row = REGISTRY["stat_capture_recapture"].build(spark, sf_dir).collect()[0]
    assert (row["n1"], row["n2"], row["m"]) == (n1, n2, m)
    assert row["observed"] == len(rows)
    assert abs(row["chapman_n"] - chapman) < max(1e-3, chapman * 1e-5)
    assert abs(row["chapman_se"] - se) < max(1e-3, se * 1e-4)
    # the population estimate can never fall below the recaptured count
    assert row["chapman_n"] >= m


def test_chao1_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    per_lang = defaultdict(Counter)
    for lang, text in rows:
        per_lang[lang].update(text.split(" "))
    got = {
        r["lang"]: r
        for r in REGISTRY["text_chao1_richness"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(per_lang)
    for lang, cnt in per_lang.items():
        v = len(cnt)
        n = sum(cnt.values())
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        chao1 = v + (f1 * f1 / (2 * f2) if f2 else f1 * (f1 - 1) / 2)
        row = got[lang]
        assert (row["v_obs"], row["n_tokens"]) == (v, n)
        assert (row["f1"], row["f2"]) == (f1, f2)
        assert abs(row["chao1"] - chao1) < 1e-3
        assert abs(row["good_turing_coverage"] - (1 - f1 / n)) < 1e-4
        # Chao1 is a lower-bound-style estimate: never below V_obs
        assert row["chao1"] >= v - 1e-9


def test_transfer_entropy_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT CAST(ts AS DATE) AS day,
               count_if(event_type = 'click'),
               count_if(event_type = 'purchase')
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1
    """).fetchall()
    xs = [r[1] for r in rows]
    ys = [r[2] for r in rows]

    def lower_median(vals):
        s = sorted(vals)
        return s[(len(s) - 1) // 2]

    mx, my = lower_median(xs), lower_median(ys)
    xb = [1 if v > mx else 0 for v in xs]
    yb = [1 if v > my else 0 for v in ys]

    def te(src, tgt):
        c3 = Counter()
        for i in range(len(src) - 1):
            c3[(tgt[i + 1], tgt[i], src[i])] += 1
        c_self = Counter()
        c_sc = Counter()
        c_sn = Counter()
        for (tn, t, s), c in c3.items():
            c_self[t] += c
            c_sc[(t, s)] += c
            c_sn[(t, tn)] += c
        total = sum(c3.values())
        acc = 0
        for (tn, t, s), c in c3.items():
            term = math.log(c * c_self[t] / (c_sc[(t, s)] * c_sn[(t, tn)]))
            acc += c * math.floor(term * 1e12 + 0.5)
        return acc / 1e12 / total, total

    te_xy, nt = te(xb, yb)
    te_yx, _ = te(yb, xb)
    row = REGISTRY["events_transfer_entropy"].build(spark, sf_dir).collect()[0]
    assert row["n_transitions"] == nt
    assert abs(row["te_click_to_purchase"] - te_xy) < 2e-4
    assert abs(row["te_purchase_to_click"] - te_yx) < 2e-4
    # TE is non-negative up to quantization noise
    assert row["te_click_to_purchase"] >= -1e-6
    assert row["te_purchase_to_click"] >= -1e-6


def test_r2_shapley_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT CAST(l_quantity AS BIGINT),
               CAST(floor(l_discount*100 + 0.5) AS BIGINT),
               CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet'
    """).fetchall()
    X = np.array(rows, dtype=float)
    r12 = np.corrcoef(X[:, 0], X[:, 1])[0, 1]
    r1y = np.corrcoef(X[:, 0], X[:, 2])[0, 1]
    r2y = np.corrcoef(X[:, 1], X[:, 2])[0, 1]
    r2_full = (r1y**2 + r2y**2 - 2 * r12 * r1y * r2y) / (1 - r12**2)
    phi1 = 0.5 * r1y**2 + 0.5 * (r2_full - r2y**2)
    phi2 = 0.5 * r2y**2 + 0.5 * (r2_full - r1y**2)
    row = REGISTRY["ml_r2_shapley"].build(spark, sf_dir).collect()[0]
    assert abs(row["r2_full"] - r2_full) < 1e-3
    assert abs(row["shapley_qty"] - phi1) < 1e-3
    assert abs(row["shapley_disc"] - phi2) < 1e-3
    # efficiency axiom: contributions sum to the full R^2
    assert abs(row["shapley_qty"] + row["shapley_disc"] - row["r2_full"]) < 3e-4


def test_siegel_slopes_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT CAST(o_orderdate AS DATE) AS day, count(*)
        FROM '{sf_dir}/orders.parquet' GROUP BY 1 ORDER BY 1
    """).fetchall()
    y = [r[1] for r in rows]
    n = len(y)
    t = list(range(1, n + 1))

    def lower_median_keyed(pairs):
        # pairs of (value, tiebreak); lower median under (value, tiebreak)
        s = sorted(pairs)
        return s[(len(s) - 1) // 2][0]

    mis = []
    for i in range(n):
        sl = [
            (
                math.floor((y[j] - y[i]) / (t[j] - t[i]) * 1e9 + 0.5),
                t[j],
            )
            for j in range(n)
            if j != i
        ]
        mis.append((lower_median_keyed(sl), t[i]))
    slope_q = lower_median_keyed(mis)
    slope = slope_q / 1e9
    resid = [(math.floor(y[i] - slope * t[i] + 0.5), t[i]) for i in range(n)]
    icept = lower_median_keyed(resid)
    row = REGISTRY["stat_siegel_slopes"].build(spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    assert abs(row["slope"] - slope) < 2e-4
    assert row["intercept"] == icept
