"""Independent-recomputation properties for the round-10 wave-B keys
(Pettitt change point, KM Greenwood bands, classical decomposition,
Markov removal-effect attribution)."""

from __future__ import annotations

import math

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


# ------------------------------------------------------------ Pettitt


def test_pettitt_matches_python(spark, sf_dir):
    xs = [
        r[0]
        for r in duckdb.execute(
            f"""
            SELECT count(*) FROM '{sf_dir}/events.parquet'
            GROUP BY CAST(ts AS DATE) ORDER BY CAST(ts AS DATE)
            """
        ).fetchall()
    ]
    n = len(xs)
    # brute-force U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j)
    best_k, best_t = -1, None
    for t in range(1, n):
        u = 0
        for i in range(t):
            for j in range(t, n):
                u += (xs[i] > xs[j]) - (xs[i] < xs[j])
        if abs(u) > best_k:
            best_k, best_t = abs(u), t
    p = 2.0 * math.exp(-6.0 * best_k * best_k / (n**3 + n**2))
    row = REGISTRY["stat_pettitt"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["k_stat"] == best_k
    assert row["t_change"] == best_t
    assert abs(row["p_approx"] - p) < 1e-4
    assert row["rejected"] == (p < 0.05)


# ------------------------------------------------- Greenwood KM bands


def test_km_greenwood_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"""
        SELECT date_diff('day', CAST(min(ts) AS DATE),
                         CAST(max(ts) AS DATE)) AS t,
               CAST(max(ts) AS DATE) AS last_day
        FROM '{sf_dir}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    gmax = max(r[1] for r in rows)
    from datetime import timedelta

    grid: dict[int, list[int]] = {}
    for t, last in rows:
        dead = last < gmax - timedelta(days=2)
        d, c = grid.setdefault(t, [0, 0])
        grid[t][0 if dead else 1] += 1
    n = len(rows)
    surv, gsum, at_risk = 1.0, 0.0, n
    expected = {}
    for t in sorted(grid):
        d, c = grid[t]
        if 0 < d < at_risk:
            surv *= 1.0 - d / at_risk
            gsum += d / (at_risk * (at_risk - d))
        elif d >= at_risk:
            surv = 0.0
        se = surv * math.sqrt(gsum) if surv > 0 else 0.0
        expected[t] = (at_risk, d, surv, se)
        at_risk -= d + c
    out = {
        r["t_days"]: r
        for r in REGISTRY["events_km_greenwood"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(expected)
    for t, (n_risk, d, surv, se) in expected.items():
        r = out[t]
        assert r["n_risk"] == n_risk and r["d_events"] == d
        # quantized folds vs plain floats: within a couple of quanta
        assert abs(r["survival"] - surv) < 2e-4
        assert abs(r["se_greenwood"] - se) < 2e-4
        assert (
            r["ci_lo"] - 1e-9 <= r["survival"] <= r["ci_hi"] + 1e-9
        )
        assert 0.0 <= r["ci_lo"] and r["ci_hi"] <= 1.0


# ---------------------------------------- classical decomposition


def test_classical_decomposition_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"""
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT),
               SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                   ELSE 0 END)
        FROM '{sf_dir}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    daily = dict(rows)
    lo, hi = min(daily), max(daily)
    xs = {dn: daily.get(dn, 0) for dn in range(lo, hi + 1)}
    det7, dows = {}, {}
    for dn in range(lo + 3, hi - 2):
        trend7 = sum(xs[d] for d in range(dn - 3, dn + 4))
        det7[dn] = (7 * xs[dn] - trend7, trend7)
        dows.setdefault(dn % 7, []).append(7 * xs[dn] - trend7)
    seas = {dow: sum(v) / len(v) for dow, v in dows.items()}
    out = {
        r["day_n"]: r
        for r in REGISTRY["events_classical_decomposition"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(out) == set(det7)
    for dn, (d7, trend7) in det7.items():
        r = out[dn]
        s = seas[dn % 7]
        assert r["x_cents"] == xs[dn]
        assert abs(r["trend"] - trend7 / 7.0) < 1e-4
        assert abs(r["seasonal"] - s / 7.0) < 1e-4
        assert abs(r["residual"] - (d7 - s) / 7.0) < 1e-4
        # additive identity: x = trend + seasonal + residual
        assert abs(r["trend"] + r["seasonal"] + r["residual"] - r["x_cents"]) < 3e-4


# --------------------------------------- Markov removal attribution


def _markov_transitions(sf_dir):
    ev = duckdb.execute(
        f"""
        SELECT user_id, epoch_us(ts), event_id, event_type
        FROM '{sf_dir}/events.parquet' ORDER BY user_id, 2, event_id
        """
    ).fetchall()
    idx = {"click": 1, "error": 2, "signup": 3, "view": 4}
    by_user: dict[int, list] = {}
    for uid, ts, eid, et in ev:
        by_user.setdefault(uid, []).append((ts, eid, et))
    pairs = []
    for uid, seq in by_user.items():
        pk = next(
            ((ts, eid) for ts, eid, et in seq if et == "purchase"), None
        )
        journey = [
            idx[et]
            for ts, eid, et in seq
            if et != "purchase" and (pk is None or (ts, eid) < pk)
        ]
        prev = 0
        for s in journey:
            pairs.append((prev, s))
            prev = s
        pairs.append((prev, 5 if pk is not None else 6))
    return pairs


def _absorb(pairs, removed, Q=10**12, K=100):
    from collections import Counter

    cnt = Counter()
    for i, j in pairs:
        if removed and j == removed:
            j = 6
        cnt[(i, j)] += 1
    rs = Counter()
    for (i, _), n in cnt.items():
        rs[i] += n
    p = [0, 0, 0, 0, 0, Q, 0]
    for _ in range(K):
        np_ = list(p)
        for i in range(7):
            if i == 5:
                np_[i] = Q
            elif i == 6:
                np_[i] = 0
            elif rs[i] > 0:
                s = sum(cnt[(i, j)] * p[j] for j in range(7))
                np_[i] = (2 * s + rs[i]) // (2 * rs[i])
        p = np_
    return p[0]


def test_attribution_markov_matches_python(spark, sf_dir):
    pairs = _markov_transitions(sf_dir)
    pf = _absorb(pairs, None)
    assert pf > 0
    names = {1: "click", 2: "error", 3: "signup", 4: "view"}
    reqs = {}
    for c in range(1, 5):
        pr = _absorb(pairs, c)
        reqs[names[c]] = (pr, 1_000_000 - (1_000_000 * pr) // pf)
    tot = sum(r for _, r in reqs.values())
    from collections import Counter

    n_in = Counter(j for _, j in pairs if 1 <= j <= 4)
    out = {
        r["channel"]: r
        for r in REGISTRY["events_attribution_markov"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(out) == set(reqs)
    for ch, (pr, req) in reqs.items():
        r = out[ch]
        assert r["n_transitions_in"] == n_in[{v: k for k, v in names.items()}[ch]]
        # the integer recurrence is replicated exactly; q4 only rounds
        assert abs(r["p_conv"] - pf / 1e12) < 1e-4
        assert abs(r["p_conv_removed"] - pr / 1e12) < 1e-4
        assert abs(r["removal_effect"] - req / 1e6) < 1e-4
        assert abs(r["attribution_share"] - req / tot) < 1e-4
        # removing a channel can only hurt conversion
        assert r["p_conv_removed"] <= r["p_conv"] + 1e-9
        assert -1e-9 <= r["removal_effect"] <= 1.0


def test_attribution_markov_fixpoint_matches_linear_solve(spark, sf_dir):
    """The quantized Jacobi fixpoint must agree with the exact
    absorbing-chain linear solve (I - Q)p = r to ~the quantum."""
    import numpy as np
    from collections import Counter

    pairs = _markov_transitions(sf_dir)
    cnt = Counter(pairs)
    rs = Counter()
    for (i, _), n in cnt.items():
        rs[i] += n
    T = np.zeros((7, 7))
    for (i, j), n in cnt.items():
        T[i, j] = n / rs[i]
    trans_idx = [i for i in range(5) if rs[i] > 0]
    Qm = T[np.ix_(trans_idx, trans_idx)]
    r = T[np.ix_(trans_idx, [5])]
    p = np.linalg.solve(np.eye(len(trans_idx)) - Qm, r).ravel()
    p_start = p[trans_idx.index(0)]
    assert abs(_absorb(pairs, None) / 1e12 - p_start) < 1e-6


# ------------------------------------------------------- DTW (wave C)


def test_dtw_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"""
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT),
               count_if(event_type = 'view'),
               count_if(event_type = 'click')
        FROM '{sf_dir}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    daily = {dn: (av, bv) for dn, av, bv in rows}
    lo, hi = min(daily), max(daily)
    a = [daily.get(d, (0, 0))[0] for d in range(lo, hi + 1)]
    b = [daily.get(d, (0, 0))[1] for d in range(lo, hi + 1)]
    t = len(a)
    INF = 1 << 60
    prev = None
    for i in range(t):
        cur = [0] * t
        for j in range(t):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                cur[j] = c
            elif i == 0:
                cur[j] = cur[j - 1] + c
            elif j == 0:
                cur[j] = prev[j] + c
            else:
                cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    dtw = prev[t - 1]
    lock = sum(abs(x - y) for x, y in zip(a, b))
    r = REGISTRY["events_dtw_daily"].build(spark, sf_dir).collect()[0]
    assert r["t_len"] == t
    assert r["dtw_distance"] == dtw
    assert r["lockstep_distance"] == lock
    assert abs(r["dtw_per_step"] - dtw / (2 * t)) < 1e-4
    # warping can only help: DTW <= lockstep, and both are >= 0
    assert 0 <= dtw <= lock


# ------------------------------------------- PMI collocations (wave C)


def test_pmi_collocations_match_python(spark, sf_dir):
    from collections import Counter

    from etl_cnc_spark.llm.text import _PMI_MIN_COUNT

    docs = [
        r[0].split(" ")
        for r in duckdb.execute(
            f"SELECT text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    uni, bi = Counter(), Counter()
    for ws in docs:
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    n1, n2 = sum(uni.values()), sum(bi.values())
    out = {
        (r["w1"], r["w2"]): r
        for r in REGISTRY["text_pmi_collocations"].build(spark, sf_dir).collect()
    }
    expected = {k: c for k, c in bi.items() if c >= _PMI_MIN_COUNT}
    assert set(out) == set(expected)
    for (w1, w2), c in expected.items():
        r = out[(w1, w2)]
        pmi = math.log((c * n1 * n1) / (n2 * uni[w1] * uni[w2]))
        npmi = pmi / (-math.log(c / n2))
        assert r["c_bigram"] == c and r["c_w1"] == uni[w1] and r["c_w2"] == uni[w2]
        assert abs(r["pmi"] - pmi) < 1e-4
        assert abs(r["npmi"] - npmi) < 1e-4
        assert -1.0 - 1e-9 <= r["npmi"] <= 1.0 + 1e-9


# ------------------------------------------------- Gaussian KDE (wave C)


def test_kde_matches_python(spark, sf_dir):
    from etl_cnc_spark.operators.stats import _KDE_GRID, _KDE_Q

    vals = [
        r[0]
        for r in duckdb.execute(
            f"""
            SELECT CAST(floor(value * 100 + 0.5) AS BIGINT)
            FROM '{sf_dir}/events.parquet' WHERE event_type = 'purchase'
            """
        ).fetchall()
    ]
    from collections import Counter

    bins = Counter(vals)
    n = len(vals)
    sv, svv = sum(vals), sum(v * v for v in vals)
    sd = math.sqrt((svv - sv * sv / n) / (n - 1)) / 100.0
    bw = 1.06 * sd * n ** (-0.2)
    lo, hi = min(vals), max(vals)
    out = {
        r["grid_idx"]: r
        for r in REGISTRY["stat_kde_gaussian"].build(spark, sf_dir).collect()
    }
    assert len(out) == _KDE_GRID + 1
    total = 0.0
    for gi in range(_KDE_GRID + 1):
        xc = lo + (gi * (hi - lo)) // _KDE_GRID
        ksum = sum(
            math.floor(nb * math.exp(-(((xc - v) / 100.0 / bw) ** 2) / 2.0) * _KDE_Q + 0.5)
            for v, nb in bins.items()
        )
        dens = ksum / _KDE_Q / (n * bw * math.sqrt(2 * math.pi))
        r = out[gi]
        assert abs(r["x"] - xc / 100.0) < 1e-4
        assert abs(r["density"] - dens) < 1e-4
        assert r["density"] >= 0.0
        total += r["density"]
    # the grid Riemann sum of a density over its support is near 1
    step = (hi - lo) / 100.0 / _KDE_GRID
    assert 0.5 < total * step < 1.5
