"""Independent-recomputation properties for the round-7 operator
wave (Wasserstein/CvM distances, Cramér's V, Cohen's d,
Page–Hinkley, logistic Newton step, CV target encoding, naive
Bayes, Zipf fit, hapax stats, backlog aging, grid clustering): each
key is re-derived with plain Python/numpy from the raw parquet — a
third engine besides Spark and DuckDB, so a shared SQL-vs-SQL blind
spot cannot hide."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "events", "lineitem", "part", "documents",
              "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _two_sample_cents(sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT)"
        " FROM events WHERE event_type IN ('click', 'purchase')"
    ).fetchall()
    a = np.array(sorted(v for t, v in rows if t == "click"), dtype=np.int64)
    b = np.array(sorted(v for t, v in rows if t == "purchase"), dtype=np.int64)
    return a, b


def test_wasserstein_matches_numpy(spark, sf_dir):
    a, b = _two_sample_cents(sf_dir)
    row = REGISTRY["stat_wasserstein_1d"].build(spark, sf_dir).collect()[0]
    assert row["n1"] == len(a) and row["n2"] == len(b)
    # numpy reference: W1 = integral of |ECDF1-ECDF2| over the grid
    grid = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, grid, side="right") / len(a)
    f2 = np.searchsorted(b, grid, side="right") / len(b)
    w1 = float(np.sum(np.abs(f1[:-1] - f2[:-1]) * np.diff(grid))) / 100.0
    assert abs(row["w1_dist"] - w1) < 1e-3


def test_cvm_matches_numpy(spark, sf_dir):
    a, b = _two_sample_cents(sf_dir)
    row = REGISTRY["stat_cvm_test"].build(spark, sf_dir).collect()[0]
    grid, counts = np.unique(np.concatenate([a, b]), return_counts=True)
    f1 = np.searchsorted(a, grid, side="right") / len(a)
    f2 = np.searchsorted(b, grid, side="right") / len(b)
    n1, n2 = len(a), len(b)
    t = n1 * n2 / (n1 + n2) ** 2 * float(np.sum(counts * (f1 - f2) ** 2))
    assert abs(row["cvm_t"] - t) < 1e-3


def test_cramers_v_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT event_type, isodow(ts) - 1, count(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    types = sorted({r[0] for r in rows})
    days = sorted({r[1] for r in rows})
    obs = np.zeros((len(types), len(days)))
    for t, d, n in rows:
        obs[types.index(t), days.index(d)] = n
    n = obs.sum()
    exp = obs.sum(1, keepdims=True) @ obs.sum(0, keepdims=True) / n
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    v = math.sqrt(chi2 / (n * (min(len(types), len(days)) - 1)))
    row = REGISTRY["stat_cramers_v"].build(spark, sf_dir).collect()[0]
    assert row["n"] == int(n)
    assert abs(row["chi2"] - chi2) < 0.05  # per-cell 1e-6 quantization
    assert abs(row["cramers_v"] - v) < 1e-3


def test_cohens_d_matches_numpy(spark, sf_dir):
    a, b = _two_sample_cents(sf_dir)
    row = REGISTRY["stat_cohens_d"].build(spark, sf_dir).collect()[0]
    sp = math.sqrt(
        ((len(a) - 1) * a.var(ddof=1) + (len(b) - 1) * b.var(ddof=1))
        / (len(a) + len(b) - 2)
    )
    d = (a.mean() - b.mean()) / sp
    assert abs(row["cohens_d"] - d) < 1e-3
    g = d * (1 - 3 / (4 * (len(a) + len(b)) - 9))
    assert abs(row["hedges_g"] - g) < 1e-3


def test_page_hinkley_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    daily = con.execute(
        "SELECT CAST(ts AS DATE) d,"
        " sum(CAST(floor(value*100+0.5) AS BIGINT)), count(*)"
        " FROM events WHERE event_type='purchase' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    x = np.array([sc / 100.0 / c for _, sc, c in daily])
    sc = np.cumsum([s for _, s, _ in daily])
    cc = np.cumsum([c for _, _, c in daily])
    mu = sc / 100.0 / cc
    m = np.cumsum(x - mu - 0.05)
    ph = m - np.minimum.accumulate(m)
    rows = sorted(
        REGISTRY["stat_page_hinkley"].build(spark, sf_dir).collect(),
        key=lambda r: r["day_n"],
    )
    assert len(rows) == len(x)
    for r, want in zip(rows, ph):
        assert abs(r["ph_stat"] - want) < 1e-3
        assert r["alarm"] == (want > 10.0)


def test_logreg_step_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT hour(ts), isodow(ts) - 1,"
        " CASE WHEN event_type='purchase' THEN 1.0 ELSE 0.0 END FROM events"
    ).fetchall()
    X = np.array([[1.0, r[0], r[1]] for r in rows])
    y = np.array([float(r[2]) for r in rows])
    # one Newton step from beta=0: (X'WX)^-1 X'(y-0.5), W = I/4
    beta = np.linalg.solve(X.T @ X / 4.0, X.T @ (y - 0.5))
    got = REGISTRY["ml_logreg_irls_step"].build(spark, sf_dir).collect()[0]
    assert got["n"] == len(y) and got["n_pos"] == int(y.sum())
    for b, name in zip(beta, ("b0", "b1", "b2")):
        assert abs(got[name] - b) < 1e-3, (name, b, got[name])


def test_cv_target_encoding_is_leakage_free(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT o_orderpriority,"
        " CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 6))"
        "      AS BIGINT) % 5,"
        " CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END"
        " FROM orders"
    ).fetchall()
    got = {
        (r["fold"], r["cat"]): r
        for r in REGISTRY["ml_target_encoding_cv"].build(spark, sf_dir).collect()
    }
    n = Counter()
    pos = Counter()
    for cat, fold, y in rows:
        n[(fold, cat)] += 1
        pos[(fold, cat)] += y
    n_all = sum(n.values())
    pos_all = sum(pos.values())
    for (fold, cat), r in got.items():
        n_fc, pos_fc = n[(fold, cat)], pos[(fold, cat)]
        n_c = sum(v for (f, c), v in n.items() if c == cat)
        pos_c = sum(v for (f, c), v in pos.items() if c == cat)
        n_f = sum(v for (f, c), v in n.items() if f == fold)
        pos_f = sum(v for (f, c), v in pos.items() if f == fold)
        oof_rate = (pos_all - pos_f) / (n_all - n_f)
        want = ((pos_c - pos_fc) + 20 * oof_rate) / (n_c - n_fc + 20)
        assert r["n_fc"] == n_fc
        assert abs(r["oof_enc"] - want) < 1e-3


def test_naive_bayes_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    docs = con.execute(
        "SELECT doc_id, lang, text FROM documents"
    ).fetchall()
    cw = Counter()
    tl = Counter()
    dl = Counter()
    vocab = set()
    for did, lang, text in docs:
        if did % 2 == 0:
            for w in text.split(" "):
                cw[(lang, w)] += 1
                tl[lang] += 1
                vocab.add(w)
            dl[lang] += 1
    V = len(vocab)
    D = sum(dl.values())
    langs = sorted(dl)
    confusion = Counter()
    for did, lang, text in docs:
        if did % 2 == 1:
            toks = Counter(text.split(" "))
            best = None
            for cand in langs:
                s = math.floor(math.log(dl[cand] / D) * 1e6)
                for w, c in toks.items():
                    lp = (
                        math.floor(
                            math.log((cw[(cand, w)] + 1) / (tl[cand] + V)) * 1e6
                        )
                        if (cand, w) in cw
                        else math.floor(math.log(1 / (tl[cand] + V)) * 1e6)
                    )
                    s += c * lp
                if best is None or s > best[0] or (s == best[0] and cand < best[1]):
                    best = (s, cand)
            confusion[(lang, best[1])] += 1
    got = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in REGISTRY["ml_naive_bayes"].build(spark, sf_dir).collect()
    }
    assert got == dict(confusion)


def test_zipf_fit_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    freqs = [
        r[0]
        for r in con.execute(
            "SELECT count(*) AS f FROM (SELECT unnest(string_split(text, ' '))"
            " AS w FROM documents) GROUP BY w ORDER BY f DESC, w LIMIT 1000"
        ).fetchall()
    ]
    x = np.log(np.arange(1, len(freqs) + 1))
    y = np.log(np.array(freqs, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    got = REGISTRY["text_zipf_fit"].build(spark, sf_dir).collect()[0]
    assert got["n"] == len(freqs)
    assert abs(got["zipf_slope"] - slope) < 1e-3
    assert abs(got["log_c"] - intercept) < 1e-2
    assert -3.0 < got["zipf_slope"] < -0.1  # a text corpus, not noise


def test_hapax_stats_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    docs = con.execute("SELECT source, text FROM documents").fetchall()
    freq = {}
    for src, text in docs:
        c = freq.setdefault(src, Counter())
        for w in text.split(" "):
            c[w] += 1
    got = {r["source"]: r for r in
           REGISTRY["text_hapax_stats"].build(spark, sf_dir).collect()}
    assert set(got) == set(freq)
    for src, c in freq.items():
        r = got[src]
        assert r["vocab"] == len(c)
        assert r["tokens"] == sum(c.values())
        assert r["hapax"] == sum(1 for v in c.values() if v == 1)
        assert r["dis"] == sum(1 for v in c.values() if v == 2)


def test_backlog_aging_partitions_open_orders(spark, sf_dir):
    con = _con(sf_dir)
    n_open, v_open = con.execute(
        "SELECT count(*), sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT))"
        " FROM orders WHERE o_orderstatus IN ('O','P')"
    ).fetchone()
    rows = REGISTRY["orders_backlog_aging"].build(spark, sf_dir).collect()
    assert sum(r["n_orders"] for r in rows) == n_open
    assert sum(r["value_cents"] for r in rows) == v_open
    assert 9990 <= sum(r["share_bps"] for r in rows) <= 10000  # floor rounding
    assert all(0 <= r["bkt"] <= 5 for r in rows)


def test_grid_cluster_labels_are_connected_and_complete(spark, sf_dir):
    con = _con(sf_dir)
    cells = con.execute(
        "SELECT CAST(epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP))"
        " / 86400000000 AS BIGINT),"
        " CAST(floor(value*100+0.5) AS BIGINT) // 1000, count(*)"
        " FROM events WHERE event_type = 'purchase'"
        " GROUP BY 1, 2 HAVING count(*) >= 3"
    ).fetchall()
    # python union-find over the 8-neighborhood
    parent = {}
    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a
    ids = {(d, v): d * 100000 + v for d, v, _ in cells}
    for k in ids.values():
        parent[k] = k
    for (d, v), k in ids.items():
        for dd in (-1, 0, 1):
            for dv in (-1, 0, 1):
                nb = ids.get((d + dd, v + dv))
                if nb is not None:
                    ra, rb = find(k), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    comp = Counter()
    ev = Counter()
    for (d, v), k in ids.items():
        comp[find(k)] += 1
    # min-label == find root only after full path compression
    roots = {k: find(k) for k in ids.values()}
    want = Counter(roots.values())
    got = {r["cluster_id"]: r["n_cells"] for r in
           REGISTRY["events_grid_cluster"].build(spark, sf_dir).collect()}
    # same clusters: python root is the min id reachable by union-find
    # with min-root merging, matching the engine's min-label semantics
    assert got == dict(want)


def test_anderson_darling_matches_numpy(spark, sf_dir):
    a, b = _two_sample_cents(sf_dir)
    row = REGISTRY["stat_anderson_darling"].build(spark, sf_dir).collect()[0]
    grid, counts = np.unique(np.concatenate([a, b]), return_counts=True)
    m1 = np.searchsorted(a, grid, side="right").astype(float)
    bb = m1 + np.searchsorted(b, grid, side="right")
    n1, n2 = len(a), len(b)
    N = n1 + n2
    keep = bb < N
    a2 = float(
        np.sum(
            counts[keep]
            * (N * m1[keep] - n1 * bb[keep]) ** 2
            / (bb[keep] * (N - bb[keep]))
        )
    ) / (n1 * n2)
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["ad_a2"] - a2) < 1e-3


def test_benjamini_hochberg_stepup(spark, sf_dir):
    rows = sorted(
        REGISTRY["stat_benjamini_hochberg"].build(spark, sf_dir).collect(),
        key=lambda r: r["p_rank"],
    )
    m = len(rows)
    # p-values ascend with rank; the reject set is a prefix and obeys
    # the step-up rule computed independently here
    ps = [r["p_value"] for r in rows]
    assert ps == sorted(ps)
    kstar = max(
        (i + 1 for i, p in enumerate(ps) if p <= 0.05 * (i + 1) / m),
        default=0,
    )
    for i, r in enumerate(rows):
        assert r["rejected"] == (i + 1 <= kstar)
    # sanity vs an erf-based normal tail: the A&S polynomial agrees
    for r in rows:
        exact = 2 * (1 - 0.5 * (1 + math.erf(abs(r["z"]) / math.sqrt(2))))
        assert abs(r["p_value"] - exact) < 1e-3


def test_isotonic_calibration_is_monotone_l2_optimal(spark, sf_dir):
    rows = sorted(
        REGISTRY["ml_isotonic_calibration"].build(spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso)  # monotone nondecreasing
    # PAV reference implementation on the same bins
    blocks = [[r["pos"], r["n"]] for r in rows]
    stack = []
    for pos, n in blocks:
        stack.append([pos, n])
        while len(stack) > 1 and (
            stack[-2][0] * stack[-1][1] >= stack[-1][0] * stack[-2][1]
        ):
            p2, n2 = stack.pop()
            stack[-1][0] += p2
            stack[-1][1] += n2
    want = []
    for pos, n in stack:
        want.extend([pos / n] * 0)  # lengths handled below
    # expand pooled blocks back to bins
    expanded = []
    i = 0
    for pos, n in stack:
        # count how many original bins this block covers
        acc_n = 0
        j = i
        while acc_n < n:
            acc_n += blocks[j][1]
            j += 1
        expanded.extend([pos / n] * (j - i))
        i = j
    for got, ref in zip(iso, expanded):
        assert abs(got - ref) < 1e-3


def test_croston_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    daily = dict(
        con.execute(
            "SELECT CAST(ts AS DATE), count(*) FROM events"
            " WHERE event_type='purchase' AND value >= 200 GROUP BY 1"
        ).fetchall()
    )
    d0, d1 = con.execute(
        "SELECT min(CAST(ts AS DATE)), max(CAST(ts AS DATE)) FROM events"
    ).fetchone()
    import datetime
    ys = []
    d = d0
    while d <= d1:
        ys.append(daily.get(d, 0))
        d += datetime.timedelta(days=1)
    z = p = 0.0
    q = 0
    started = False
    nd = 0
    for y in ys:
        if y > 0:
            nd += 1
            if not started:
                z, p, started = float(y), float(q + 1), True
            else:
                z = 0.1 * y + 0.9 * z
                p = 0.1 * (q + 1) + 0.9 * p
            q = 0
        else:
            q += 1
    rows = REGISTRY["events_croston"].build(spark, sf_dir).collect()
    if not started:
        assert rows == []
        return
    r = rows[0]
    assert r["n_periods"] == len(ys) and r["n_demand_days"] == nd
    assert abs(r["demand_level"] - z) < 1e-3
    assert abs(r["interval_level"] - p) < 1e-3
    assert abs(r["croston_forecast"] - z / p) < 1e-3


def test_lorenz_curve_is_concentration_table(spark, sf_dir):
    con = _con(sf_dir)
    vals = sorted(
        r[0]
        for r in con.execute(
            "SELECT sum(CAST(floor(value*100+0.5) AS BIGINT)) FROM events"
            " WHERE event_type='purchase' GROUP BY user_id"
        ).fetchall()
    )
    rows = sorted(
        REGISTRY["events_lorenz_curve"].build(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert sum(r["n_users"] for r in rows) == len(vals)
    assert sum(r["value_cents"] for r in rows) == sum(vals)
    # cumulative column is the prefix sum; shares ascend to ~10000
    run = 0
    for r in rows:
        run += r["value_cents"]
        assert r["cum_value_cents"] == run
    assert rows[-1]["cum_share_bps"] == 10000
    bps = [r["cum_share_bps"] for r in rows]
    assert bps == sorted(bps)
    # ascending sort: the bottom decile holds the smallest share
    assert rows[0]["value_cents"] * len(rows) <= sum(vals)


def test_qq_table_matches_numpy(spark, sf_dir):
    a, b = _two_sample_cents(sf_dir)
    rows = sorted(
        REGISTRY["stat_qq_table"].build(spark, sf_dir).collect(),
        key=lambda r: r["dec"],
    )
    assert [r["dec"] for r in rows] == list(range(1, 10))
    for r in rows:
        p = r["dec"] / 10
        # percentile_disc: smallest value with ECDF >= p
        q1 = a[int(np.ceil(p * len(a))) - 1]
        q2 = b[int(np.ceil(p * len(b))) - 1]
        assert r["q1_cents"] == q1 and r["q2_cents"] == q2
        assert abs(r["qq_ratio"] - q1 / q2) < 1e-3


def test_activity_histogram_covers_users(spark, sf_dir):
    con = _con(sf_dir)
    per_user = con.execute(
        "SELECT count(DISTINCT CAST(ts AS DATE)) FROM events GROUP BY user_id"
    ).fetchall()
    rows = REGISTRY["events_activity_histogram"].build(spark, sf_dir).collect()
    assert sum(r["n_users"] for r in rows) == len(per_user)
    want = Counter(d for (d,) in per_user)
    got = Counter()
    for r in rows:
        got[r["days_active"]] += r["n_users"]
        lo = {"power": 20, "core": 10, "regular": 4, "casual": 0}[r["tier"]]
        hi = {"power": 10**9, "core": 20, "regular": 10, "casual": 4}[r["tier"]]
        assert lo <= r["days_active"] < hi
    assert got == want


def test_slow_movers_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    cutoff = con.execute(
        "SELECT max(l_shipdate) - INTERVAL 180 DAY FROM lineitem"
    ).fetchone()[0]
    last = dict(con.execute(
        "SELECT l_partkey, max(l_shipdate) FROM lineitem GROUP BY 1"
    ).fetchall())
    parts = con.execute(
        "SELECT p_partkey, p_brand,"
        " CAST(floor(p_retailprice*100+0.5) AS BIGINT) FROM part"
    ).fetchall()
    want_n = Counter()
    want_slow = Counter()
    want_val = Counter()
    for pk, brand, cents in parts:
        want_n[brand] += 1
        ls = last.get(pk)
        if ls is None or ls < cutoff:
            want_slow[brand] += 1
            want_val[brand] += cents
    rows = REGISTRY["parts_slow_movers"].build(spark, sf_dir).collect()
    assert {r["p_brand"]: r["n_parts"] for r in rows} == dict(want_n)
    for r in rows:
        assert r["n_slow"] == want_slow[r["p_brand"]]
        assert r["slow_value_cents"] == want_val[r["p_brand"]]
        assert r["slow_bps"] == r["n_slow"] * 10000 // r["n_parts"]


def test_tukey_hsd_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT event_type, CAST(floor(value*100+0.5) AS BIGINT)"
        " FROM events"
    ).fetchall()
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    k = len(groups)
    nn = sum(len(v) for v in groups.values())
    ssw = sum(
        float(np.sum(np.square(np.array(v, dtype=float) - np.mean(v))))
        for v in groups.values()
    )
    msw = ssw / (nn - k)
    qtab = {2: 2.772, 3: 3.314, 4: 3.633, 5: 3.858, 6: 4.030,
            7: 4.170, 8: 4.286, 9: 4.387, 10: 4.474}
    got = REGISTRY["stat_tukey_hsd"].build(spark, sf_dir).collect()
    assert len(got) == k * (k - 1) // 2
    for r in got:
        m1 = np.mean(groups[r["g1"]])
        m2 = np.mean(groups[r["g2"]])
        crit = qtab[k] * math.sqrt(
            msw / 2 * (1 / len(groups[r["g1"]]) + 1 / len(groups[r["g2"]]))
        )
        assert abs(r["mean_diff"] - (m1 - m2) / 100) < 1e-3
        assert abs(r["hsd_crit"] - crit / 100) < 1e-3
        assert r["significant"] == (abs(m1 - m2) > crit)


def test_cohort_matrix_is_consistent(spark, sf_dir):
    rows = REGISTRY["events_cohort_matrix"].build(spark, sf_dir).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_day"], []).append(r)
    for day, cells in by_cohort.items():
        cells.sort(key=lambda r: r["week_offset"])
        # offset-0 cell exists and covers the whole cohort
        assert cells[0]["week_offset"] == 0
        assert cells[0]["active_users"] == cells[0]["cohort_size"]
        assert cells[0]["retention_bps"] == 10000
        for c in cells:
            assert 0 < c["active_users"] <= c["cohort_size"]
            assert c["retention_bps"] == (
                c["active_users"] * 10000 // c["cohort_size"]
            )
    # marginal matches events_retention's week-0 total
    total_users = sum(
        c[0]["cohort_size"] for c in by_cohort.values()
    )
    ret = {r["week_n"]: r["active_users"] for r in
           REGISTRY["events_retention"].build(spark, sf_dir).collect()}
    assert ret[0] == total_users


def test_burrows_delta_is_a_metricish_distance(spark, sf_dir):
    rows = REGISTRY["text_burrows_delta"].build(spark, sf_dir).collect()
    seen = {(r["s1"], r["s2"]): r["delta"] for r in rows}
    srcs = sorted({s for p in seen for s in p})
    assert len(seen) == len(srcs) * (len(srcs) - 1) // 2
    assert all(d >= 0 for d in seen.values())
    assert any(d > 0 for d in seen.values())
    # python recomputation on one pair
    con = _con(sf_dir)
    cnt = con.execute(
        "SELECT source, w, count(*) FROM (SELECT source,"
        " unnest(string_split(text,' ')) w FROM documents) GROUP BY 1,2"
    ).fetchall()
    from collections import defaultdict
    per = defaultdict(Counter)
    tot = Counter()
    corpus = Counter()
    for s, w, c in cnt:
        per[s][w] = c
        tot[s] += c
        corpus[w] += c
    top = [w for w, _ in sorted(corpus.items(), key=lambda x: (-x[1], x[0]))[:50]]
    fq = {(w, s): per[s][w] * 1_000_000 // tot[s] for w in top for s in per}
    import statistics
    z = {}
    for w in top:
        vals = [fq[(w, s)] for s in per]
        mu = sum(vals) / len(vals)
        sd = math.sqrt(
            (sum(v * v for v in vals) - sum(vals) ** 2 / len(vals))
            / (len(vals) - 1)
        )
        for s in per:
            z[(w, s)] = (fq[(w, s)] - mu) / sd
    s1, s2 = srcs[0], srcs[1]
    want = (
        sum(
            math.floor(abs(z[(w, s1)] - z[(w, s2)]) * 1_000_000)
            for w in top
        )
        / 1_000_000
        / 50
    )
    assert abs(seen[(s1, s2)] - want) < 1e-3


def test_margin_waterfall_reconciles(spark, sf_dir):
    con = _con(sf_dir)
    want = con.execute(
        "SELECT count(*),"
        " sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)),"
        " sum(CAST(floor(l_extendedprice*(1-l_discount)*(1+l_tax)*100+0.5)"
        "     AS BIGINT))"
        " FROM lineitem"
    ).fetchone()
    rows = REGISTRY["orders_margin_waterfall"].build(spark, sf_dir).collect()
    assert sum(r["n_lines"] for r in rows) == want[0]
    assert sum(r["gross_cents"] for r in rows) == want[1]
    assert sum(r["charge_cents"] for r in rows) == want[2]
    for r in rows:
        # bridge sanity: net <= gross, charge >= net, discount >= 0
        assert r["discount_cents"] >= 0
        assert r["net_cents"] <= r["gross_cents"]
        assert r["charge_cents"] >= r["net_cents"]
        # per-line rounding keeps the bridge within n_lines cents
        assert abs(r["gross_cents"] - r["discount_cents"] - r["net_cents"]) \
            <= r["n_lines"]


def test_leadtime_bands_cover_lines(spark, sf_dir):
    con = _con(sf_dir)
    n = con.execute("SELECT count(*) FROM lineitem").fetchone()[0]
    rows = REGISTRY["orders_leadtime_bands"].build(spark, sf_dir).collect()
    assert sum(r["n_lines"] for r in rows) == n
    per_prio = {}
    for r in rows:
        per_prio.setdefault(r["o_orderpriority"], []).append(r)
    for prio, cells in per_prio.items():
        tot = sum(c["n_lines"] for c in cells)
        for c in cells:
            assert c["band_bps"] == c["n_lines"] * 10000 // tot
            # the synthetic corpus contains backdated ship dates; they
            # must all land in (and only in) the backdated band
            if c["band"] != "backdated":
                assert c["lead_days_sum"] >= 0


def test_pipe_sql_matches_classic(spark, sf_dir):
    rows = REGISTRY["sql_entry_pipe"].build(spark, sf_dir).collect()
    con = _con(sf_dir)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT o_orderpriority, count(*),"
            " sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT))"
            " FROM orders WHERE o_orderstatus='O' GROUP BY 1"
        ).fetchall()
    }
    got = {r["o_orderpriority"]: (r["n"], r["open_cents"]) for r in rows}
    assert got == want


def test_knn_classifier_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    data = con.execute(
        "SELECT vec_id, label, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in data])
    labels = {r[0]: r[1] for r in data}
    X = np.array([r[2] for r in data], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    confusion = Counter()
    for qi in range(len(ids)):
        if ids[qi] >= 50:
            continue
        cos = Xn @ Xn[qi]
        order = sorted(
            (i for i in range(len(ids)) if i != qi),
            key=lambda i: (-cos[i], ids[i]),
        )[:5]
        votes = Counter(labels[ids[i]] for i in order)
        best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        confusion[(labels[ids[qi]], best)] += 1
    got = {
        (r["true_label"], r["pred_label"]): r["n_queries"]
        for r in REGISTRY["ml_knn_classifier"].build(spark, sf_dir).collect()
    }
    assert got == dict(confusion)


def test_bartlett_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT)"
        " FROM events"
    ).fetchall()
    groups = {}
    for t, v in rows:
        groups.setdefault(t, []).append(v)
    k = len(groups)
    n_all = sum(len(g) for g in groups.values())
    s2 = {t: np.var(np.array(g, dtype=np.float64), ddof=1)
          for t, g in groups.items()}
    sp2 = sum((len(g) - 1) * s2[t] for t, g in groups.items()) / (
        n_all - k
    )
    num = (n_all - k) * math.log(sp2) - sum(
        (len(g) - 1) * math.log(s2[t]) for t, g in groups.items()
    )
    c = 1 + (sum(1.0 / (len(g) - 1) for g in groups.values())
             - 1.0 / (n_all - k)) / (3 * (k - 1))
    row = REGISTRY["stat_bartlett"].build(spark, sf_dir).collect()[0]
    assert row["k"] == k and row["n_all"] == n_all
    assert abs(row["t_stat"] - num / c) < 1e-2


def test_mcnemar_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    urgent = {
        r[0] for r in con.execute(
            "SELECT DISTINCT o_custkey FROM orders"
            " WHERE o_orderpriority='1-URGENT'"
        ).fetchall()
    }
    returned = {
        r[0] for r in con.execute(
            "SELECT DISTINCT o.o_custkey FROM orders o JOIN lineitem l"
            " ON l.l_orderkey = o.o_orderkey WHERE l.l_returnflag='R'"
        ).fetchall()
    }
    allc = {
        r[0] for r in con.execute(
            "SELECT DISTINCT o_custkey FROM orders"
        ).fetchall()
    }
    b = len(urgent - returned)
    c = len(returned - urgent)
    row = REGISTRY["stat_mcnemar"].build(spark, sf_dir).collect()[0]
    assert row["n_pairs"] == len(allc)
    assert row["urgent_only"] == b and row["returned_only"] == c
    assert row["both_yes"] == len(urgent & returned)
    chi2 = (abs(b - c) - 1) ** 2 / (b + c)
    assert abs(row["chi2"] - chi2) < 1e-3


def test_partial_corr_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    q, p, z = map(np.array, zip(*con.execute(
        "SELECT CAST(l_quantity AS BIGINT),"
        " CAST(floor(l_extendedprice) AS BIGINT),"
        " CAST(floor(l_discount*100+0.5) AS BIGINT) FROM lineitem"
    ).fetchall()))
    rxy = np.corrcoef(q, p)[0, 1]
    rxz = np.corrcoef(q, z)[0, 1]
    ryz = np.corrcoef(p, z)[0, 1]
    want = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz * rxz) * (1 - ryz * ryz)
    )
    row = REGISTRY["stat_partial_corr"].build(spark, sf_dir).collect()[0]
    assert row["n"] == len(q)
    assert abs(row["r_xy"] - rxy) < 1e-3
    assert abs(row["r_xy_given_z"] - want) < 1e-3


def test_durbin_watson_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT CAST(datediff('day', DATE '1970-01-01', o_orderdate)"
        " AS BIGINT) AS d, CAST(count(*) AS BIGINT) FROM orders"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    d = np.array([r[0] for r in rows], dtype=np.float64)
    n = np.array([r[1] for r in rows], dtype=np.float64)
    slope, icept = np.polyfit(d, n, 1)
    e = n - (icept + slope * d)
    dw = float(np.sum(np.diff(e) ** 2) / np.sum(e * e))
    row = REGISTRY["stat_durbin_watson"].build(spark, sf_dir).collect()[0]
    assert row["n_days"] == len(rows)
    assert abs(row["slope"] - slope) < 1e-3
    assert abs(row["dw_stat"] - dw) < 1e-3


def test_bullwhip_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT p.p_brand,"
        " CAST(datediff('day', DATE '1970-01-01', o.o_orderdate)"
        "   AS BIGINT)//7,"
        " CAST(datediff('day', DATE '1970-01-01', l.l_shipdate)"
        "   AS BIGINT)//7,"
        " CAST(l_quantity AS BIGINT)"
        " FROM lineitem l JOIN orders o ON o.o_orderkey=l.l_orderkey"
        " JOIN part p ON p.p_partkey=l.l_partkey"
    ).fetchall()
    brand = rows[0][0]
    wo, ws = Counter(), Counter()
    for b, w1, w2, q in rows:
        if b == brand:
            wo[w1] += q
            ws[w2] += q

    def cv2(c):
        v = np.array(list(c.values()), dtype=np.float64)
        return float(len(v) * np.sum(v * v) / np.sum(v) ** 2 - 1.0)

    got = {
        r["p_brand"]: r
        for r in REGISTRY["orders_bullwhip"].build(spark, sf_dir).collect()
    }[brand]
    assert got["n_weeks_order"] == len(wo)
    assert abs(got["cv2_order"] - cv2(wo)) < 1e-3
    assert abs(got["bullwhip"] - cv2(ws) / cv2(wo)) < 1e-3


def test_eoq_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT p.p_brand, CAST(l_quantity AS BIGINT),"
        " CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)"
        " FROM lineitem l JOIN orders o ON o.o_orderkey=l.l_orderkey"
        " JOIN part p ON p.p_partkey=l.l_partkey"
    ).fetchall()
    days = con.execute(
        "SELECT CAST(datediff('day', min(o_orderdate),"
        " max(o_orderdate)) AS BIGINT) + 1 FROM orders"
    ).fetchone()[0]
    brand = rows[0][0]
    qty = np.array([q for b, q, _ in rows if b == brand], dtype=np.float64)
    lt = np.array([t for b, _, t in rows if b == brand], dtype=np.float64)
    d = float(np.sum(qty))
    eoq = math.sqrt(2 * d * 75.0 / 2.5)
    ss = 1.645 * float(np.std(lt)) * (d / days)
    got = {
        r["p_brand"]: r
        for r in REGISTRY["orders_eoq_policy"].build(spark, sf_dir).collect()
    }[brand]
    assert got["total_qty"] == int(d)
    assert abs(got["eoq"] - eoq) < 1e-2
    assert abs(got["safety_stock"] - ss) < 1e-2
    assert abs(
        got["reorder_point"] - ((d / days) * float(np.mean(lt)) + ss)
    ) < 1e-2


def test_xyz_census_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT l.l_partkey,"
        " CAST(datediff('month', DATE '1970-01-01',"
        "   date_trunc('month', o.o_orderdate)) AS BIGINT),"
        " CAST(l_quantity AS BIGINT)"
        " FROM lineitem l JOIN orders o ON o.o_orderkey=l.l_orderkey"
    ).fetchall()
    months = len({m for _, m, _ in rows})
    pm = Counter()
    for pk, m, q in rows:
        pm[(pk, m)] += q
    per = {}
    for (pk, _), q in pm.items():
        s, ss = per.get(pk, (0, 0))
        per[pk] = (s + q, ss + q * q)
    census = Counter()
    for pk, (s, ss) in per.items():
        cv = math.sqrt(months * ss / (s * s) - 1.0)
        cls = "X" if cv < 1.75 else ("Y" if cv < 2.0 else "Z")
        census[cls] += 1
    got = {
        r["xyz_class"]: r["n_parts"]
        for r in REGISTRY["orders_xyz_analysis"].build(spark, sf_dir).collect()
    }
    assert got == dict(census)


def _daily_counts(sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT CAST(date_diff('day', DATE '2024-01-01',"
        " CAST(ts AS DATE)) AS BIGINT), CAST(count(*) AS BIGINT)"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    return (np.array([r[0] for r in rows], dtype=np.float64),
            np.array([r[1] for r in rows], dtype=np.float64))


def test_interrupted_ts_matches_numpy(spark, sf_dir):
    d, n = _daily_counts(sf_dir)
    pre, post = d < 15, d >= 15
    b1, a1 = np.polyfit(d[pre], n[pre], 1)
    b2, a2 = np.polyfit(d[post], n[post], 1)
    row = REGISTRY["events_interrupted_ts"].build(spark, sf_dir).collect()[0]
    assert row["n_pre"] == int(pre.sum())
    assert abs(row["slope_pre"] - b1) < 1e-3
    assert abs(row["slope_post"] - b2) < 1e-3
    assert abs(
        row["level_change"] - ((a2 + b2 * 15) - (a1 + b1 * 15))
    ) < 1e-3


def test_peak_detection_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT CAST(date_diff('day', DATE '2024-01-01',"
        " CAST(ts AS DATE)) AS BIGINT),"
        " CAST(sum(CAST(floor(value*100+0.5) AS BIGINT)) AS BIGINT)"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    v = [r[1] for r in rows]
    mean_gate = sum(v) / len(v)
    want = {
        rows[i][0]
        for i in range(1, len(v) - 1)
        if v[i] > v[i - 1] and v[i] > v[i + 1] and v[i] > mean_gate
    }
    got = REGISTRY["events_peak_detection"].build(spark, sf_dir).collect()
    assert {r["day_idx"] for r in got} == want
    for r in got:
        i = [x[0] for x in rows].index(r["day_idx"])
        assert abs(
            r["prominence"] - (v[i] - max(v[i - 1], v[i + 1])) / 100.0
        ) < 1e-6


def test_seasonality_strength_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT CAST(hour(ts) AS BIGINT),"
        " CAST(count(*) AS BIGINT) FROM events"
        " GROUP BY CAST(date_diff('day', DATE '2024-01-01',"
        " CAST(ts AS DATE)) AS BIGINT), 1"
    ).fetchall()
    by_hour = {}
    for h, n in rows:
        by_hour.setdefault(h, []).append(n)
    allv = np.array([n for _, n in rows], dtype=np.float64)
    sst = float(np.sum((allv - allv.mean()) ** 2))
    ssb = sum(
        len(g) * (np.mean(g) - allv.mean()) ** 2
        for g in by_hour.values()
    )
    row = REGISTRY["events_seasonality_strength"].build(
        spark, sf_dir
    ).collect()[0]
    assert row["n_cells"] == len(rows)
    assert abs(row["eta2"] - ssb / sst) < 1e-3
    means = {h: float(np.mean(g)) for h, g in by_hour.items()}
    peak = min(sorted(means), key=lambda h: (-means[h], h))
    assert row["peak_hour"] == peak


def test_simpson_diversity_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT lang, text FROM documents"
    ).fetchall()
    freq = {}
    for lang, text in rows:
        c = freq.setdefault(lang, Counter())
        c.update(text.split(" "))
    got = {
        r["lang"]: r
        for r in REGISTRY["text_simpson_diversity"].build(
            spark, sf_dir
        ).collect()
    }
    for lang, c in freq.items():
        n = sum(c.values())
        pairs = sum(f * (f - 1) for f in c.values())
        lam = pairs / (n * (n - 1))
        assert got[lang]["vocab"] == len(c)
        assert got[lang]["n"] == n
        assert abs(got[lang]["simpson_l"] - lam) < 1e-3
        assert abs(got[lang]["inv_simpson"] - 1 / lam) < 1e-2


def test_linear_attribution_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    x1, x2, y = map(np.array, zip(*con.execute(
        "SELECT CAST(l_quantity AS BIGINT),"
        " CAST(floor(l_discount*100+0.5) AS BIGINT),"
        " CAST(floor(l_extendedprice) AS BIGINT) FROM lineitem"
    ).fetchall()))
    X = np.column_stack([np.ones(len(x1)), x1, x2]).astype(np.float64)
    beta = np.linalg.lstsq(X, y.astype(np.float64), rcond=None)[0]
    mad1 = float(np.mean(np.abs(x1 - x1.mean())))
    mad2 = float(np.mean(np.abs(x2 - x2.mean())))
    got = {
        r["feature"]: r
        for r in REGISTRY["ml_linear_attribution"].build(
            spark, sf_dir
        ).collect()
    }
    assert abs(got["quantity"]["beta"] - beta[1]) < 1e-2
    assert abs(got["discount_pct"]["beta"] - beta[2]) < 1e-2
    mac1, mac2 = abs(beta[1]) * mad1, abs(beta[2]) * mad2
    assert abs(got["quantity"]["mean_abs_contrib"] - mac1) < 0.05
    assert abs(
        got["quantity"]["share"] - mac1 / (mac1 + mac2)
    ) < 1e-3


def test_copurchase_components_match_unionfind(spark, sf_dir):
    con = _con(sf_dir)
    pairs = con.execute(
        "WITH pl AS (SELECT DISTINCT l_orderkey, l_partkey"
        " FROM lineitem)"
        " SELECT a.l_partkey, b.l_partkey, count(*)"
        " FROM pl a JOIN pl b ON a.l_orderkey=b.l_orderkey"
        " AND a.l_partkey < b.l_partkey GROUP BY 1,2"
        " HAVING count(*) >= 2"
    ).fetchall()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p1, p2, _ in pairs:
        a, b = find(p1), find(p2)
        if a != b:
            parent[max(a, b)] = min(a, b)
    comps = {}
    for node in parent:
        comps.setdefault(find(node), set()).add(node)
    got = REGISTRY["graph_copurchase_components"].build(
        spark, sf_dir
    ).collect()
    want = {min(m): len(m) for m in comps.values()}
    assert {r["comp_id"]: r["n_parts"] for r in got} == want
    sup = {}
    for p1, p2, s in pairs:
        sup[find(p1)] = sup.get(find(p1), 0) + s
    assert {r["comp_id"]: r["total_support"] for r in got} == sup


def test_kraljic_census_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT l_partkey, l_suppkey,"
        " CAST(floor(l_extendedprice*100+0.5) AS BIGINT),"
        " CAST(l_quantity AS BIGINT) FROM lineitem"
    ).fetchall()
    ps, spend = Counter(), Counter()
    for pk, sk, c, q in rows:
        ps[(pk, sk)] += q
        spend[pk] += c
    by_part = {}
    for (pk, sk), q in ps.items():
        by_part.setdefault(pk, []).append(q)
    total, npts = sum(spend.values()), len(spend)
    census = Counter()
    for pk, qs in by_part.items():
        h = len(qs) * sum(q * q for q in qs) / (sum(qs) ** 2)
        hi_spend = spend[pk] * npts > total
        risky = h >= 1.35
        cls = ("strategic" if hi_spend and risky else
               "leverage" if hi_spend else
               "bottleneck" if risky else "non_critical")
        census[cls] += 1
    got = {
        r["quadrant"]: r["n_parts"]
        for r in REGISTRY["orders_kraljic_matrix"].build(
            spark, sf_dir
        ).collect()
    }
    assert got == dict(census)


def test_fano_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT event_type,"
        " CAST(date_diff('minute', TIMESTAMP '2024-01-01',"
        " date_trunc('minute', ts)) AS BIGINT),"
        " CAST(count(*) AS BIGINT) FROM events GROUP BY 1,2"
    ).fetchall()
    M = 30 * 24 * 60
    by_type = {}
    for t, m, n in rows:
        by_type.setdefault(t, []).append(n)
    got = {
        r["event_type"]: r
        for r in REGISTRY["events_fano_factor"].build(
            spark, sf_dir
        ).collect()
    }
    for t, ns in by_type.items():
        filled = np.zeros(M)
        filled[: len(ns)] = ns  # positions irrelevant for moments
        var = float(np.mean(filled**2) - np.mean(filled) ** 2)
        fano = var / float(np.mean(filled))
        assert got[t]["n_events"] == int(sum(ns))
        assert abs(got[t]["fano"] - fano) < 1e-3


def test_drop_column_importance_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    x1, x2, y = map(np.array, zip(*con.execute(
        "SELECT CAST(l_quantity AS BIGINT),"
        " CAST(floor(l_discount*100+0.5) AS BIGINT),"
        " CAST(floor(l_extendedprice) AS BIGINT) FROM lineitem"
    ).fetchall()))

    def r2(feats):
        X = np.column_stack([np.ones(len(y))] + feats).astype(np.float64)
        yv = y.astype(np.float64)
        pred = X @ np.linalg.lstsq(X, yv, rcond=None)[0]
        return 1 - np.sum((yv - pred) ** 2) / np.sum(
            (yv - yv.mean()) ** 2
        )

    full, only1, only2 = r2([x1, x2]), r2([x1]), r2([x2])
    got = {
        r["feature"]: r
        for r in REGISTRY["ml_drop_column_importance"].build(
            spark, sf_dir
        ).collect()
    }
    assert abs(got["quantity"]["r2_full"] - full) < 1e-3
    assert abs(got["quantity"]["r2_drop"] - (full - only2)) < 1e-3
    assert abs(got["discount_pct"]["r2_drop"] - (full - only1)) < 1e-3


def test_ljung_box_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT event_type, CAST(ts AS DATE), count(*)"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    d0 = min(r[1] for r in rows)
    d1 = max(r[1] for r in rows)
    ndays = (d1 - d0).days + 1
    got = {
        r["event_type"]: r
        for r in REGISTRY["events_ljung_box"].build(spark, sf_dir).collect()
    }
    types = {r[0] for r in rows}
    for t in types:
        y = np.zeros(ndays)
        for tt, d, n in rows:
            if tt == t:
                y[(d - d0).days] = n
        n = len(y)
        yc = y - y.mean()
        denom = float(np.sum(yc * yc))
        q = 0.0
        for k in range(1, 8):
            r_k = float(np.sum(yc[k:] * yc[:-k])) / denom
            q += r_k * r_k / (n - k)
        q *= n * (n + 2)
        assert got[t]["n_days"] == n
        assert abs(got[t]["q_stat"] - q) < 1e-2


def test_cooks_distance_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT CAST(datediff('day', DATE '1970-01-01', o_orderdate)"
        " AS BIGINT), CAST(count(*) AS BIGINT) FROM orders"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    d = np.array([r[0] for r in rows], dtype=np.float64)
    n = np.array([r[1] for r in rows], dtype=np.float64)
    slope, icept = np.polyfit(d, n, 1)
    e = n - (icept + slope * d)
    nd = len(d)
    h = 1.0 / nd + (d - d.mean()) ** 2 / np.sum((d - d.mean()) ** 2)
    s2 = np.sum(e * e) / (nd - 2)
    cooks = e * e * h / (2 * s2 * (1 - h) ** 2)
    want = {int(d[i]) for i in range(nd) if cooks[i] > 4.0 / nd}
    got = REGISTRY["stat_cooks_distance"].build(spark, sf_dir).collect()
    assert {r["day_idx"] for r in got} == want
    for r in got:
        i = int(np.where(d == r["day_idx"])[0][0])
        assert abs(r["cooks_d"] - cooks[i]) < 1e-2
        assert abs(r["leverage"] - h[i]) < 1e-3


def test_pinball_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    y = np.array([r[0] for r in con.execute(
        "SELECT CAST(floor(l_extendedprice*100+0.5) AS BIGINT)"
        " FROM lineitem"
    ).fetchall()], dtype=np.int64)
    got = {
        round(r["tau"], 2): r
        for r in REGISTRY["ml_pinball_loss"].build(spark, sf_dir).collect()
    }
    ys = np.sort(y)
    for k in (1, 5, 9):
        tau = k / 10.0
        qhat = ys[int(np.ceil(tau * len(ys))) - 1]
        loss = np.where(
            y > qhat, tau * (y - qhat), (1 - tau) * (qhat - y)
        )
        assert got[tau]["q_hat"] == qhat / 100.0
        assert abs(
            got[tau]["mean_pinball"] - float(np.mean(loss)) / 100.0
        ) < 1e-3


def test_learning_curve_matches_numpy(spark, sf_dir):
    import hashlib

    con = _con(sf_dir)
    rows = con.execute(
        "SELECT l_orderkey, l_linenumber,"
        " CAST(l_quantity AS BIGINT),"
        " CAST(floor(l_extendedprice) AS BIGINT) FROM lineitem"
    ).fetchall()
    buckets = [[] for _ in range(10)]
    for ok, ln, q, y in rows:
        b = int(
            hashlib.md5(f"{ok}-{ln}".encode()).hexdigest()[:6], 16
        ) % 10
        buckets[b].append((q, y))
    got = sorted(
        REGISTRY["ml_learning_curve"].build(spark, sf_dir).collect(),
        key=lambda r: r["train_frac"],
    )
    acc = []
    for b in range(10):
        acc.extend(buckets[b])
        q = np.array([t[0] for t in acc], dtype=np.float64)
        y = np.array([t[1] for t in acc], dtype=np.float64)
        r2 = np.corrcoef(q, y)[0, 1] ** 2
        assert got[b]["n_rows"] == len(acc)
        assert abs(got[b]["r2"] - r2) < 1e-3
