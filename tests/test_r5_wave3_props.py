"""Independent-recomputation properties for the third round-5
operator wave (Mann-Whitney U, jackknife CV, Benford audit) —
plain-Python references over the SAME parquet inputs, mirroring
test_r5_wave2_props.py."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_mann_whitney_matches_python_fold(spark, sf_dir):
    """U statistic and tie-corrected z recomputed with a naive
    midrank assignment over the pooled sample."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, value FROM '{sf_dir}/events.parquet' "
        "WHERE event_type IN ('click', 'purchase')"
    ).fetchall()
    pooled = sorted(
        (math.floor(v * 100 + 0.5), etype) for etype, v in rows
    )
    n1 = sum(1 for _, e in pooled if e == "click")
    n2 = len(pooled) - n1
    # midranks: average rank within each tied value run
    r1 = 0.0
    tie3 = 0
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        t = j - i
        midrank = (i + 1 + j) / 2  # average of ranks i+1 .. j
        r1 += midrank * sum(1 for k in range(i, j) if pooled[k][1] == "click")
        tie3 += t * t * t - t
        i = j
    u1 = r1 - n1 * (n1 + 1) / 2
    n = n1 + n2
    mu = n1 * n2 / 2
    sigma = math.sqrt(n1 * n2 / 12 * ((n + 1) - tie3 / (n * (n - 1))))
    z = (u1 - mu) / sigma
    row = REGISTRY["stat_mann_whitney"].build(spark, sf_dir).collect()[0]
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["u1"] - u1) <= 1e-6
    assert abs(row["z"] - z) <= 1e-3
    assert row["significant"] == (abs(z) > 1.96)
    # U is bounded by the pair count
    assert 0 <= row["u1"] <= n1 * n2


def test_jackknife_cv_matches_python_loo(spark, sf_dir):
    """The real thing: n leave-one-out recomputations of the CV,
    which the operator must reproduce from moment algebra alone."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for etype, v in rows:
        groups.setdefault(etype, []).append(math.floor(v * 100 + 0.5))
    got = {
        r["event_type"]: r
        for r in REGISTRY["stat_jackknife_cv"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(groups)
    for etype, xs in groups.items():
        n = len(xs)
        mean = sum(xs) / n
        var = sum((x - mean) ** 2 for x in xs) / (n - 1)
        cv_full = math.sqrt(var) / mean
        loo = []
        for i in range(n):
            rest = xs[:i] + xs[i + 1 :]
            m = sum(rest) / (n - 1)
            v = sum((x - m) ** 2 for x in rest) / (n - 2)
            loo.append(math.sqrt(v) / m)
        cv_bar = sum(loo) / n
        se = math.sqrt((n - 1) / n * sum((c - cv_bar) ** 2 for c in loo))
        bc = n * cv_full - (n - 1) * cv_bar
        r = got[etype]
        assert r["n"] == n
        assert abs(r["cv_full"] - cv_full) <= 1e-3
        assert abs(r["cv_jack_bc"] - bc) <= 1e-3
        assert abs(r["se_jack"] - se) <= 1e-3
        # jackknife SE of the CV must be small relative to the CV
        assert 0 < r["se_jack"] < r["cv_full"]


def test_benford_matches_python_fold(spark, sf_dir):
    con = duckdb.connect()
    prices = [
        p
        for (p,) in con.execute(
            f"SELECT o_totalprice FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    ]
    obs = Counter(str(math.floor(p * 100 + 0.5))[0] for p in prices)
    n = sum(obs.values())
    got = {r["d"]: r for r in REGISTRY["etl_benford"].build(spark, sf_dir).collect()}
    assert set(got) == {int(d) for d in obs}
    p_sum = 0.0
    for d, r in got.items():
        exp_p = math.log10(1 + 1 / d)
        e = n * exp_p
        assert r["obs"] == obs[str(d)]
        assert r["n"] == n
        assert abs(r["obs_p"] - obs[str(d)] / n) <= 1e-3
        assert abs(r["exp_p"] - exp_p) <= 1e-3
        assert abs(r["chi2_contrib"] - (obs[str(d)] - e) ** 2 / e) <= 1e-2
        p_sum += r["obs_p"]
    # observed shares are a distribution over the digits present
    assert abs(p_sum - 1.0) <= 1e-3


def test_kmv_setops_matches_python_sketches(spark, sf_dir):
    """KMV union/intersection recomputed with hashlib: the k-smallest
    md5 sketches and both estimators, plus the accuracy envelope."""
    import hashlib

    from etl_cnc_spark.operators.aggregates import KMV_K

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT DISTINCT user_id, event_type FROM '{sf_dir}/events.parquet' "
        "WHERE event_type IN ('click', 'purchase')"
    ).fetchall()
    a, b = set(), set()
    for uid, etype in rows:
        (a if etype == "click" else b).add(uid)
    union = a | b

    def h(uid):
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16)

    def est(s):
        if len(s) < KMV_K:
            return float(len(s))
        hk = sorted((h(u), u) for u in s)[KMV_K - 1][0]
        return (KMV_K - 1) * float(1 << 60) / hk

    sk_union = sorted((h(u), u) for u in union)[:KMV_K]
    ku = len(sk_union)
    nab = sum(1 for _, u in sk_union if u in a and u in b)
    rho = nab / ku
    row = REGISTRY["agg_kmv_setops"].build(spark, sf_dir).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["n_inter"] == len(a & b) and row["n_union"] == len(union)
    assert abs(row["est_a"] - est(a)) <= 1e-3
    assert abs(row["est_b"] - est(b)) <= 1e-3
    assert abs(row["est_union"] - est(union)) <= 1e-3
    assert abs(row["jaccard_est"] - rho) <= 1e-3
    assert abs(row["est_inter_rho"] - rho * est(union)) <= 1e-2
    # the estimators should land within ~4/sqrt(k) of the truth
    tol = 4 / (KMV_K ** 0.5)
    for key, truth in (
        ("est_a", len(a)), ("est_b", len(b)), ("est_union", len(union)),
    ):
        assert abs(row[key] - truth) <= max(tol * truth, 5)


def test_bloom_membership_matches_python_filter(spark, sf_dir):
    """Bit-set replay with hashlib; the headline guarantee — zero
    false negatives — plus calibration against the textbook rate."""
    import hashlib

    from etl_cnc_spark.operators.aggregates import BLOOM_BAL, BLOOM_K, BLOOM_M

    con = duckdb.connect()
    build = {
        ck
        for (ck,) in con.execute(
            f"SELECT c_custkey FROM '{sf_dir}/customer.parquet' "
            f"WHERE c_acctbal > {BLOOM_BAL}"
        ).fetchall()
    }
    probe = {
        ck
        for (ck,) in con.execute(
            f"SELECT DISTINCT o_custkey FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    }

    def pos(key, i):
        return int(hashlib.md5(f"{key}:{i}".encode()).hexdigest()[:6], 16) % BLOOM_M

    bits = {pos(k, i) for k in build for i in range(1, BLOOM_K + 1)}
    passing = {
        k
        for k in probe
        if all(pos(k, i) in bits for i in range(1, BLOOM_K + 1))
    }
    true_members = probe & build
    row = REGISTRY["agg_bloom_membership"].build(spark, sf_dir).collect()[0]
    assert row["n_build"] == len(build)
    assert row["bits_set"] == len(bits)
    assert row["n_probe"] == len(probe)
    assert row["n_pass"] == len(passing)
    assert row["n_true"] == len(true_members)
    assert row["n_false_pos"] == len(passing - true_members)
    # Bloom guarantee: every true member passes (no false negatives)
    assert true_members <= passing
    assert row["n_pass"] >= row["n_true"]
    # measured FP rate within a loose factor of the textbook rate
    assert 0.0 <= row["fp_rate"] <= max(5 * row["fp_theory"], 0.02)


def _dense_series(sf_dir):
    """Zero-filled per-type daily count series, t indexed from the
    global min date."""
    from collections import defaultdict

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, CAST(ts AS DATE), count(*) "
        f"FROM '{sf_dir}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    d0 = min(d for _, d, _ in rows)
    d1 = max(d for _, d, _ in rows)
    ndays = (d1 - d0).days + 1
    series = defaultdict(lambda: [0] * ndays)
    for etype, d, n in rows:
        series[etype][(d - d0).days] = n
    return dict(series)


def test_autocorr_matches_python_fold(spark, sf_dir):
    series = _dense_series(sf_dir)
    got = {
        (r["event_type"], r["lag"]): r
        for r in REGISTRY["events_autocorr"].build(spark, sf_dir).collect()
    }
    for etype, ys in series.items():
        n = len(ys)
        ybar = sum(ys) / n
        den = sum((y - ybar) ** 2 for y in ys)
        for k in range(1, 8):
            cov = sum((ys[t] - ybar) * (ys[t - k] - ybar) for t in range(k, n))
            r = got[(etype, k)]
            assert r["n_terms"] == n - k
            assert abs(r["r"] - cov / den) <= 1e-3
            assert -1.0 - 1e-9 <= r["r"] <= 1.0 + 1e-9
    assert len(got) == len(series) * 7


def test_changepoint_matches_python_argmax(spark, sf_dir):
    series = _dense_series(sf_dir)
    got = {
        r["event_type"]: r
        for r in REGISTRY["events_changepoint"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(series)
    for etype, ys in series.items():
        n = len(ys)
        best = None
        for t in range(n - 1):
            n1, n2 = t + 1, n - (t + 1)
            m1 = sum(ys[: t + 1]) / n1
            m2 = sum(ys[t + 1 :]) / n2
            gain = n1 * n2 / n * (m1 - m2) ** 2
            if best is None or gain > best[0] + 1e-12:
                best = (gain, t, n1, n2, m1, m2)
        gain, t, n1, n2, m1, m2 = best
        r = got[etype]
        assert r["split_t"] == t
        assert r["n1"] == n1 and r["n2"] == n2
        assert abs(r["mean_left"] - m1) <= 1e-3
        assert abs(r["mean_right"] - m2) <= 1e-3
        assert abs(r["gain"] - gain) <= 1e-2


def test_holt_matches_python_recursion(spark, sf_dir):
    from etl_cnc_spark.operators.analytics import HOLT_A, HOLT_B

    a, b = float(HOLT_A), float(HOLT_B)
    series = _dense_series(sf_dir)
    got = {
        (r["event_type"], r["h"]): r
        for r in REGISTRY["events_holt"].build(spark, sf_dir).collect()
    }
    for etype, ys in series.items():
        lvl, tr, sse = float(ys[0]), float(ys[1] - ys[0]), 0.0
        for y in ys[1:]:
            err = y - (lvl + tr)
            sse += err * err
            lnew = a * y + (1 - a) * (lvl + tr)
            tr = b * (lnew - lvl) + (1 - b) * tr
            lvl = lnew
        n = len(ys)
        for h in range(1, 8):
            r = got[(etype, h)]
            assert r["n"] == n
            assert abs(r["level"] - lvl) <= 1e-3
            assert abs(r["trend"] - tr) <= 1e-3
            assert abs(r["forecast"] - (lvl + h * tr)) <= 1e-3
            assert abs(r["mse"] - sse / (n - 1)) <= 1e-2
        # forecasts step linearly by the trend
        f1 = got[(etype, 1)]["forecast"]
        f7 = got[(etype, 7)]["forecast"]
        assert abs((f7 - f1) - 6 * tr) <= 1e-2
    assert len(got) == len(series) * 7


def test_fuzzy_names_matches_python_blocking(spark, sf_dir):
    """Two-pass blocking + edit distance replayed in Python, plus
    the blocking-completeness check: every within-threshold pair
    that shares a token is found."""
    from etl_cnc_spark.operators.joins import FUZZY_MAX_LEV

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT p_name, min(p_partkey), count(*) "
        f"FROM '{sf_dir}/part.parquet' GROUP BY p_name"
    ).fetchall()
    names = {nm: (rep, cnt) for nm, rep, cnt in rows}
    expect = {}
    for x in names:
        for y in names:
            if x >= y:
                continue
            tx, ty = x.split(" "), y.split(" ")
            if tx[0] != ty[0] and tx[1] != ty[1]:
                continue
            d = lev(x, y)
            if d <= FUZZY_MAX_LEV:
                expect[(x, y)] = d
    got = REGISTRY["join_fuzzy_names"].build(spark, sf_dir).collect()
    assert {(r["name_a"], r["name_b"]) for r in got} == set(expect)
    for r in got:
        assert r["lev"] == expect[(r["name_a"], r["name_b"])]
        assert r["key_a"] == names[r["name_a"]][0]
        assert r["rows_a"] == names[r["name_a"]][1]
        assert r["rows_b"] == names[r["name_b"]][1]


def test_survivorship_matches_python_rules(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority, "
        f"o_orderstatus, o_totalprice FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    by_cust = {}
    for ck, ok, od, pri, st, tp in rows:
        by_cust.setdefault(ck, []).append((od, ok, pri, st, tp))
    got = {
        r["custkey"]: r
        for r in REGISTRY["etl_survivorship"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(by_cust)
    for ck, recs in by_cust.items():
        r = got[ck]
        latest = max(recs, key=lambda t: (t[0], t[1]))
        assert r["latest_priority"] == latest[2]
        sc = Counter(st for _, _, _, st, _ in recs)
        # most frequent, ties to the lexicographically smallest
        mode = min(sc.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (r["status_mode"], r["status_mode_n"]) == mode
        assert r["n_records"] == len(recs)
        assert r["first_seen_us"] <= r["last_seen_us"]
        assert r["total_cents"] == sum(
            math.floor(tp * 100 + 0.5) for _, _, _, _, tp in recs
        )


def test_lateral_topn_matches_python(spark, sf_dir):
    con = duckdb.connect()
    custs = {
        ck
        for (ck,) in con.execute(
            f"SELECT c_custkey FROM '{sf_dir}/customer.parquet' "
            "WHERE c_mktsegment = 'BUILDING'"
        ).fetchall()
    }
    orders = {}
    for ck, ok, tp in con.execute(
        f"SELECT o_custkey, o_orderkey, o_totalprice "
        f"FROM '{sf_dir}/orders.parquet'"
    ).fetchall():
        if ck in custs:
            orders.setdefault(ck, []).append((-tp, ok))
    expect = set()
    for ck, lst in orders.items():
        for negtp, ok in sorted(lst)[:2]:
            expect.add((ck, ok, math.floor(-negtp * 100 + 0.5)))
    got = REGISTRY["sql_entry_lateral"].build(spark, sf_dir).collect()
    assert {(r["c_custkey"], r["o_orderkey"], r["total_cents"]) for r in got} == expect
    # at most two rows per customer, only building-segment customers
    per = Counter(r["c_custkey"] for r in got)
    assert all(v <= 2 for v in per.values())
    assert set(per) <= custs


def test_vocab_growth_matches_python_scan(spark, sf_dir):
    """Sequential corpus scan with a real running set — the operator
    must reproduce it from first-occurrence buckets alone."""
    from etl_cnc_spark.llm.text import VOCAB_BUCKET_W

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    seen: set[str] = set()
    toks = 0
    curve = {}
    by_bucket = {}
    for doc_id, text in docs:
        by_bucket.setdefault(doc_id // VOCAB_BUCKET_W, []).append((doc_id, text))
    for bucket in sorted(by_bucket):
        for _, text in sorted(by_bucket[bucket]):
            ws = text.split(" ")
            toks += len(ws)
            seen |= set(ws)
        curve[bucket] = (toks, len(seen))
    got = REGISTRY["text_vocab_growth"].build(spark, sf_dir).collect()
    assert {r["bucket"] for r in got} == set(curve)
    prev_vocab = 0
    for r in sorted(got, key=lambda r: r["bucket"]):
        toks, vocab = curve[r["bucket"]]
        assert r["cum_tokens"] == toks
        assert r["cum_vocab"] == vocab
        assert abs(r["ttr"] - vocab / toks) <= 1e-3
        # monotone growth
        assert r["cum_vocab"] >= prev_vocab
        prev_vocab = r["cum_vocab"]


def test_token_entropy_matches_python_fold(spark, sf_dir):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    by_src = {}
    for src, text in docs:
        c = by_src.setdefault(src, Counter())
        c.update(text.split(" "))
    got = {
        r["source"]: r
        for r in REGISTRY["text_token_entropy"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(by_src)
    for src, c in by_src.items():
        n = sum(c.values())
        ent = -sum((v / n) * math.log2(v / n) for v in c.values())
        simpson = sum((v / n) ** 2 for v in c.values())
        r = got[src]
        assert r["n_tokens"] == n and r["vocab"] == len(c)
        assert abs(r["entropy_bits"] - ent) <= 1e-3
        assert abs(r["norm_entropy"] - ent / math.log2(len(c))) <= 1e-3
        assert abs(r["simpson"] - simpson) <= 1e-3
        # normalized entropy is a [0, 1] quantity
        assert 0.0 <= r["norm_entropy"] <= 1.0 + 1e-9


def test_embed_profiles_match_numpy(spark, sf_dir):
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    by_label = {}
    for label, emb in rows:
        by_label.setdefault(label, []).append(np.array(emb, dtype=np.float64))
    norm_got = {
        r["label"]: r
        for r in REGISTRY["embed_norm_stats"].build(spark, sf_dir).collect()
    }
    in_got = {
        r["label"]: r
        for r in REGISTRY["embed_centroid_inertia"].build(spark, sf_dir).collect()
    }
    assert set(norm_got) == set(by_label) == set(in_got)
    for label, vecs in by_label.items():
        x = np.stack(vecs)
        norms = np.linalg.norm(x, axis=1)
        r = norm_got[label]
        assert r["n"] == len(vecs)
        assert abs(r["mean_norm"] - norms.mean()) <= 1e-3
        assert abs(r["std_norm"] - norms.std(ddof=1)) <= 1e-3
        assert abs(r["min_norm"] - norms.min()) <= 1e-3
        assert abs(r["max_norm"] - norms.max()) <= 1e-3
        c = x.mean(axis=0)
        inertia = float(((x - c) ** 2).sum())
        ri = in_got[label]
        assert ri["n_vecs"] == len(vecs)
        assert abs(ri["c_norm2"] - float(c @ c)) <= 1e-3
        assert abs(ri["inertia"] - inertia) <= max(1e-2, 1e-4 * inertia)
        # inertia identity: sum ||x||^2 = inertia + n ||c||^2
        total = float((x ** 2).sum())
        assert abs(ri["inertia"] + ri["n_vecs"] * ri["c_norm2"] - total) <= 1e-2


def test_gaps_islands_matches_python_runs(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT DISTINCT user_id, CAST(ts AS DATE) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    from datetime import date

    epoch = date(1970, 1, 1)
    by_user = {}
    for uid, d in rows:
        by_user.setdefault(uid, set()).add((d - epoch).days)
    expect = {}
    for uid, ds in by_user.items():
        days = sorted(ds)
        islands = []
        start = prev = days[0]
        for d in days[1:]:
            if d > prev + 1:
                islands.append((start, prev))
                start = d
            prev = d
        islands.append((start, prev))
        for i, (s, e) in enumerate(islands, start=1):
            gap = s - islands[i - 2][1] if i > 1 else None
            expect[(uid, i)] = (s, e, e - s + 1, gap)
    got = REGISTRY["win_gaps_islands"].build(spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        s, e, ln, gap = expect[(r["user_id"], r["island_n"])]
        assert (r["start_day"], r["end_day"], r["len_days"]) == (s, e, ln)
        assert r["gap_before"] == gap
        if gap is not None:
            assert gap >= 2  # otherwise it would be the same island


def test_kcore_matches_python_peeling(spark, sf_dir):
    from collections import defaultdict

    from etl_cnc_spark.operators.graph import KCORE_K, KCORE_ROUNDS, KCORE_TOPK

    con = duckdb.connect()
    edges = con.execute(f"""
        WITH w AS (
            SELECT c.c_nationkey AS u, s.s_nationkey AS v, count(*) AS w
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
            JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
            JOIN '{sf_dir}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
            WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2
        )
        SELECT DISTINCT least(u, v), greatest(u, v) FROM (
            SELECT u, v, row_number() OVER (PARTITION BY u
                ORDER BY w DESC, v) AS rk FROM w
        ) WHERE rk <= {KCORE_TOPK}
    """).fetchall()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg0 = {n: len(v) for n, v in adj.items()}
    cur = {n: set(v) for n, v in adj.items()}
    survived = dict.fromkeys(adj, 0)
    for _ in range(KCORE_ROUNDS):
        alive = {n for n in cur if len(cur[n]) >= KCORE_K}
        for n in alive:
            survived[n] += 1
        cur = {n: v & alive for n, v in cur.items() if n in alive}
    got = {r["node"]: r for r in REGISTRY["graph_kcore"].build(spark, sf_dir).collect()}
    assert set(got) == set(adj)
    for n, r in got.items():
        assert r["degree0"] == deg0[n]
        assert r["rounds_survived"] == survived[n]
        assert r["in_core"] == (survived[n] == KCORE_ROUNDS)
    # peeling is monotone: the core is non-empty or everything peeled
    cores = [r for r in got.values() if r["in_core"]]
    for r in cores:
        assert r["degree0"] >= KCORE_K


def test_decay_counter_matches_python_fold(spark, sf_dir):
    from etl_cnc_spark.operators.analytics import DECAY_HALF_LIFE_D

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, CAST(ts AS DATE), value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    tmax = max(d for _, d, _ in rows)
    agg = {}
    for uid, d, v in rows:
        dd = (tmax - d).days
        f = 0.5 ** (dd / DECAY_HALF_LIFE_D)
        n, dc, dv = agg.get(uid, (0, 0.0, 0.0))
        agg[uid] = (n + 1, dc + f, dv + v * f)
    got = {
        r["user_id"]: r
        for r in REGISTRY["events_decay_counter"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for uid, (n, dc, dv) in agg.items():
        r = got[uid]
        assert r["n_events"] == n
        assert abs(r["decayed_count"] - dc) <= 1e-3
        assert abs(r["decayed_value"] - dv) <= 1e-2
        # decayed count is bounded by the raw count
        assert r["decayed_count"] <= n + 1e-9


def test_pit_features_no_leakage(spark, sf_dir):
    """Replay the point-in-time features sequentially and assert the
    headline guarantee: nothing at-or-after the label leaks in."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_id, epoch_us(ts), event_type, value "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    by_user = {}
    for uid, eid, ts, et, v in rows:
        by_user.setdefault(uid, []).append((ts, et != "purchase", eid, et, v))
    expect = {}
    for uid, evs in by_user.items():
        evs.sort()  # (ts, labels-first at ties, event_id)
        views = 0
        last_click = None
        first_ts = None
        for ts, _, eid, et, v in evs:
            first_ts = ts if first_ts is None else min(first_ts, ts)
            if et == "purchase":
                expect[eid] = (
                    uid,
                    ts,
                    math.floor(v * 100 + 0.5),
                    views,
                    last_click,
                    (ts - first_ts) // 86400000000,
                )
            if et == "view":
                views += 1
            elif et == "click":
                last_click = math.floor(v * 100 + 0.5)
    got = REGISTRY["ml_point_in_time_features"].build(spark, sf_dir).collect()
    assert {r["label_event_id"] for r in got} == set(expect)
    for r in got:
        uid, ts, cents_, views, last_click, days = expect[r["label_event_id"]]
        assert r["user_id"] == uid and r["label_ts_us"] == ts
        assert r["label_cents"] == cents_
        assert r["f_views"] == views
        assert r["f_last_click_cents"] == last_click
        assert r["f_days_active"] == days


def test_recursive_cte_heap_shape(spark, sf_dir):
    """The heap hierarchy's depth histogram is fully predictable:
    level d holds keys [2^d - 1, min(2^(d+1) - 2, N-1)]."""
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM '{sf_dir}/part.parquet'"
    ).fetchone()[0]
    got = sorted(
        (r["depth"], r["n"], r["min_key"], r["max_key"])
        for r in REGISTRY["sql_entry_recursive"].build(spark, sf_dir).collect()
    )
    expect = []
    d = 0
    while (1 << d) - 1 < n:
        lo = (1 << d) - 1
        hi = min((1 << (d + 1)) - 2, n - 1)
        expect.append((d, hi - lo + 1, lo, hi))
        d += 1
    assert got == expect
    assert sum(r[1] for r in got) == n  # every part reached exactly once


def test_stream_topk_windowed_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT epoch_us(time_bucket(INTERVAL 6 HOUR, ts)), event_type, "
        f"count(*) FROM '{sf_dir}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    by_win = {}
    for w, et, n in rows:
        by_win.setdefault(w, []).append((-n, et))
    expect = {}
    for w, lst in by_win.items():
        for rk, (negn, et) in enumerate(sorted(lst)[:3], start=1):
            expect[(w, rk)] = (et, -negn)
    got = REGISTRY["stream_topk_windowed"].build(spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        et, n = expect[(r["window_start_us"], r["rk"])]
        assert (r["event_type"], r["n"]) == (et, n)


def test_dp_release_matches_python_mechanism(spark, sf_dir):
    """Replay the keyed-PRF Laplace draw; check the DP-shaped
    invariants (clamped at zero, |noise| plausible for b=1)."""
    import hashlib

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderpriority, o_orderstatus, count(*) "
        f"FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2"
    ).fetchall()
    got = {
        (r["o_orderpriority"], r["o_orderstatus"]): r
        for r in REGISTRY["etl_dp_release"].build(spark, sf_dir).collect()
    }
    assert len(got) == len(rows)
    for pri, st, n in rows:
        u = (int(hashlib.md5(f"{pri}|{st}".encode()).hexdigest()[:6], 16) + 0.5) / (
            1 << 24
        ) - 0.5
        noise = -1.0 * (1 if u >= 0 else -1) * math.log(1 - 2 * abs(u))
        r = got[(pri, st)]
        assert r["n_true"] == n
        assert abs(r["pseudo_noise"] - noise) <= 1e-3
        assert r["n_released"] == max(0, n + math.floor(noise + 0.5))
        assert r["n_released"] >= 0


def test_equidepth_histogram_matches_python(spark, sf_dir):
    from etl_cnc_spark.operators.aggregates import EQUIDEPTH_B

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT l_returnflag, CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT), "
        f"l_orderkey, l_linenumber FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    by_flag = {}
    for fl, v, ok, ln in rows:
        by_flag.setdefault(fl, []).append((v, ok, ln))
    got = {
        (r["l_returnflag"], r["bucket"]): r
        for r in REGISTRY["agg_equidepth_histogram"].build(spark, sf_dir).collect()
    }
    for fl, vals in by_flag.items():
        vals.sort()
        n = len(vals)
        base, extra = divmod(n, EQUIDEPTH_B)
        idx = 0
        for b in range(1, EQUIDEPTH_B + 1):
            size = base + (1 if b <= extra else 0)
            chunk = vals[idx : idx + size]
            idx += size
            r = got[(fl, b)]
            assert r["n"] == size
            assert r["lo_cents"] == chunk[0][0]
            assert r["hi_cents"] == chunk[-1][0]
        # equi-depth: bucket sizes differ by at most one
        sizes = [got[(fl, b)]["n"] for b in range(1, EQUIDEPTH_B + 1)]
        assert max(sizes) - min(sizes) <= 1


def test_ab_sequential_matches_python_monitoring(spark, sf_dir):
    from etl_cnc_spark.operators.analytics import SEQ_OBF_C

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) "
        f"AS BIGINT), user_id % 2, event_type "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    daily = {}
    for day, grp, et in rows:
        t, c = daily.get((day, grp), (0, 0))
        daily[(day, grp)] = (t + 1, c + (et == "purchase"))
    days = sorted({d for d, _ in daily})
    n_final = sum(t for t, _ in daily.values())
    got = {
        r["day_n"]: r
        for r in REGISTRY["events_ab_sequential"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(days)
    na = ca = nb = cb = 0
    prev_boundary = None
    for d in days:
        ta, va = daily.get((d, 0), (0, 0))
        tb, vb = daily.get((d, 1), (0, 0))
        na, ca, nb, cb = na + ta, ca + va, nb + tb, cb + vb
        pool = (ca + cb) / (na + nb)
        z = (cb / nb - ca / na) / math.sqrt(
            pool * (1 - pool) * (1 / na + 1 / nb)
        )
        boundary = SEQ_OBF_C / math.sqrt((na + nb) / n_final)
        r = got[d]
        assert (r["n_a"], r["c_a"], r["n_b"], r["c_b"]) == (na, ca, nb, cb)
        assert abs(r["z"] - z) <= 1e-3
        assert abs(r["boundary"] - boundary) <= 1e-3
        assert r["crossed"] == (abs(z) > boundary)
        # the spending boundary tightens monotonically
        if prev_boundary is not None:
            assert r["boundary"] <= prev_boundary + 1e-9
        prev_boundary = r["boundary"]
    # final-day boundary equals the constant at full information
    assert abs(got[days[-1]]["boundary"] - SEQ_OBF_C) <= 1e-3


def test_forecast_backtest_matches_python(spark, sf_dir):
    from etl_cnc_spark.operators.analytics import BACKTEST_LAG

    series = _dense_series(sf_dir)
    got = {
        r["event_type"]: r
        for r in REGISTRY["events_forecast_backtest"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(series)
    for etype, ys in series.items():
        evals = [
            (ys[t], ys[t - BACKTEST_LAG], ys[t - 1])
            for t in range(BACKTEST_LAG, len(ys))
        ]
        n = len(evals)
        mae7 = sum(abs(y - f7) for y, f7, _ in evals) / n
        mae1 = sum(abs(y - f1) for y, _, f1 in evals) / n
        bias7 = sum(y - f7 for y, f7, _ in evals) / n
        smape = (
            sum(
                0.0 if y + f7 == 0 else 2 * abs(y - f7) / (y + f7)
                for y, f7, _ in evals
            )
            / n
        )
        r = got[etype]
        assert r["n_evals"] == n
        assert abs(r["mae7"] - mae7) <= 1e-3
        assert abs(r["mae1"] - mae1) <= 1e-3
        assert abs(r["bias7"] - bias7) <= 1e-3
        assert abs(r["smape7"] - smape) <= 1e-3
        assert abs(r["skill_vs_naive1"] - (1 - mae7 / mae1)) <= 1e-3
        assert 0.0 <= r["smape7"] <= 2.0


def test_intersect_all_bag_semantics(spark, sf_dir):
    con = duckdb.connect()
    a = Counter(
        nk
        for (nk,) in con.execute(
            f"SELECT c_nationkey FROM '{sf_dir}/customer.parquet' "
            "WHERE c_acctbal > 8000"
        ).fetchall()
    )
    b = Counter(
        nk
        for (nk,) in con.execute(
            f"SELECT c_nationkey FROM '{sf_dir}/customer.parquet' "
            "WHERE c_mktsegment = 'AUTOMOBILE'"
        ).fetchall()
    )
    got = Counter(
        r["c_nationkey"]
        for r in REGISTRY["set_intersect_all"].build(spark, sf_dir).collect()
    )
    assert got == {k: min(a[k], b[k]) for k in a.keys() & b.keys()
                   if min(a[k], b[k]) > 0}


def test_join_cardinality_estimate_unbiased_shape(spark, sf_dir):
    import hashlib

    con = duckdb.connect()
    keys = con.execute(
        f"SELECT l_orderkey, l_linenumber FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    okeys = {
        k
        for (k,) in con.execute(
            f"SELECT o_orderkey FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    }
    n_sample = sum(
        1
        for ok, ln in keys
        if hashlib.md5(f"{ok}-{ln}".encode()).hexdigest()[0] == "0"
        and ok in okeys
    )
    n_exact = sum(1 for ok, _ in keys if ok in okeys)
    row = REGISTRY["join_cardinality_estimate"].build(spark, sf_dir).collect()[0]
    assert row["n_sample_join"] == n_sample
    assert row["n_estimated"] == n_sample * 16
    assert row["n_exact"] == n_exact
    assert abs(row["rel_error"] - abs(n_sample * 16 - n_exact) / n_exact) <= 1e-3
    # a 1/16 row sample of an FK join should land within ~25%
    assert row["rel_error"] < 0.25


def test_table_checksum_matches_python_and_detects_change(spark, sf_dir):
    import hashlib

    from etl_cnc_spark.operators.etl import CHECKSUM_MOD

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, "
        f"o_totalprice, CAST(o_orderdate AS VARCHAR) "
        f"FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    hs = []
    for ok, ck, st, pri, tp, d in rows:
        canon = f"{ok}|{ck}|{st}|{pri}|{math.floor(tp * 100 + 0.5)}|{d}"
        hs.append(int(hashlib.md5(canon.encode()).hexdigest()[:15], 16))
    r = REGISTRY["etl_table_checksum"].build(spark, sf_dir).collect()[0]
    assert r["n_rows"] == len(hs)
    assert r["checksum"] == sum(hs) % CHECKSUM_MOD
    assert r["min_h"] == min(hs) and r["max_h"] == max(hs)
    # sensitivity: perturbing ONE row's amount must change the digest
    altered = sum(hs) - hs[0] + int(
        hashlib.md5(b"perturbed-row").hexdigest()[:15], 16
    )
    assert altered % CHECKSUM_MOD != r["checksum"]


def test_pseudonymize_preserves_referential_integrity(spark, sf_dir):
    got = REGISTRY["etl_pseudonymize"].build(spark, sf_dir).collect()
    con = duckdb.connect()
    raw = dict(
        con.execute(
            f"SELECT c_nationkey, count(*) "
            f"FROM '{sf_dir}/orders.parquet' o "
            f"JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey "
            f"GROUP BY 1"
        ).fetchall()
    )
    assert {r["nationkey"] for r in got} == set(raw)
    for r in got:
        assert r["integrity_ok"]  # the headline guarantee
        assert r["n_orders"] == r["n_orders_raw"] == raw[r["nationkey"]]


def test_duplicate_payments_matches_python_scan(spark, sf_dir):
    from etl_cnc_spark.operators.analytics import DUP_PAY_DAYS, DUP_PAY_PCT

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_custkey, o_orderkey, o_totalprice, "
        f"datediff('day', DATE '1970-01-01', o_orderdate) "
        f"FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    by_cust = {}
    for ck, ok, tp, dn in rows:
        by_cust.setdefault(ck, []).append((ok, math.floor(tp * 100 + 0.5), dn))
    expect = {}
    for ck, lst in by_cust.items():
        for i, (ka, ca, da) in enumerate(lst):
            for kb, cb, db in lst[i + 1 :]:
                a, b = (ka, ca, da), (kb, cb, db)
                if a[0] > b[0]:
                    a, b = b, a
                if abs(a[1] - b[1]) * DUP_PAY_PCT <= a[1] and abs(a[2] - b[2]) <= DUP_PAY_DAYS:
                    expect[(a[0], b[0])] = (ck, abs(a[1] - b[1]), abs(a[2] - b[2]))
    got = REGISTRY["orders_duplicate_payments"].build(spark, sf_dir).collect()
    assert {(r["key_a"], r["key_b"]) for r in got} == set(expect)
    for r in got:
        ck, cd, dd = expect[(r["key_a"], r["key_b"])]
        assert r["custkey"] == ck
        assert r["cents_diff"] == cd and r["days_apart"] == dd
        assert r["cents_diff"] * DUP_PAY_PCT <= max(r["cents_a"], r["cents_b"])


def test_diff_in_diff_matches_python_cells(spark, sf_dir):
    from datetime import date

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, CAST(ts AS DATE), value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    split = date(2024, 1, 16)
    cells = {}
    for uid, d, v in rows:
        key = (uid % 2, 0 if d < split else 1)
        c = math.floor(v * 100 + 0.5)
        n, s1, s2 = cells.get(key, (0, 0, 0))
        cells[key] = (n + 1, s1 + c, s2 + c * c)
    mean = {k: s1 / n / 100 for k, (n, s1, _) in cells.items()}
    did = (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
    se2 = 0.0
    for k, (n, s1, s2) in cells.items():
        var = (s2 - s1 * s1 / n) / (n - 1)
        se2 += var / n
    se = math.sqrt(se2) / 100
    r = REGISTRY["events_diff_in_diff"].build(spark, sf_dir).collect()[0]
    assert (r["n_a0"], r["n_a1"]) == (cells[(0, 0)][0], cells[(0, 1)][0])
    assert (r["n_b0"], r["n_b1"]) == (cells[(1, 0)][0], cells[(1, 1)][0])
    assert abs(r["mean_a_pre"] - mean[(0, 0)]) <= 1e-3
    assert abs(r["mean_b_post"] - mean[(1, 1)]) <= 1e-3
    assert abs(r["did"] - did) <= 1e-3
    assert abs(r["se_did"] - se) <= 1e-3
    # arms split by user-hash: with random assignment DiD ~ 0
    assert abs(r["did"]) <= 5 * r["se_did"]


def test_power_analysis_matches_python_formula(spark, sf_dir):
    from etl_cnc_spark.operators.analytics import (
        POWER_MDE_REL,
        POWER_Z_ALPHA,
        POWER_Z_BETA,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    groups = {}
    for et, v in rows:
        groups.setdefault(et, []).append(math.floor(v * 100 + 0.5))
    got = {
        r["event_type"]: r
        for r in REGISTRY["events_power_analysis"].build(spark, sf_dir).collect()
    }
    for et, xs in groups.items():
        n = len(xs)
        mu = sum(xs) / n
        var = (sum(x * x for x in xs) - sum(xs) ** 2 / n) / (n - 1)
        zsum = POWER_Z_ALPHA + POWER_Z_BETA
        req = math.ceil(2 * var * zsum * zsum / ((POWER_MDE_REL * mu) ** 2))
        r = got[et]
        assert r["n"] == n
        assert abs(r["mean_value"] - mu / 100) <= 1e-3
        assert abs(r["cv"] - math.sqrt(var) / mu) <= 1e-3
        assert r["n_per_arm"] == req
        assert r["runs_needed"] == math.ceil(req * 2 / n)
        # the sizing formula is scale-free in the value unit: n ∝ cv²
        assert abs(
            r["n_per_arm"]
            - math.ceil(2 * (zsum / POWER_MDE_REL) ** 2 * (var / mu ** 2))
        ) <= 1


def test_random_walk_matches_python_replay(spark, sf_dir):
    import hashlib
    from collections import defaultdict

    from etl_cnc_spark.operators.graph import WALK_STEPS

    con = duckdb.connect()
    edges = con.execute(f"""
        SELECT DISTINCT least(c.c_nationkey, s.s_nationkey),
                        greatest(c.c_nationkey, s.s_nationkey)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{sf_dir}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
    """).fetchall()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expect = {}
    for start in adj:
        cur = start
        hops = []
        for i in range(1, WALK_STEPS + 1):
            nxt = min(
                adj[cur],
                key=lambda m: (
                    int(hashlib.md5(f"{start}:{i}:{m}".encode()).hexdigest()[:6], 16),
                    m,
                ),
            )
            hops.append(nxt)
            cur = nxt
        expect[start] = tuple(hops)
    got = {
        r["node"]: tuple(r[f"hop{i}"] for i in range(1, WALK_STEPS + 1))
        for r in REGISTRY["graph_random_walk"].build(spark, sf_dir).collect()
    }
    assert got == expect
    # every hop is an actual neighbor of its predecessor
    for start, hops in got.items():
        cur = start
        for h in hops:
            assert h in adj[cur]
            cur = h


def test_mix_shift_decomposition_adds_up(spark, sf_dir):
    from datetime import date

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, CAST(ts AS DATE), value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    split = date(2024, 1, 16)
    cells = {}
    for et, d, v in rows:
        p = 0 if d < split else 1
        n, s = cells.get((et, p), (0, 0))
        cells[(et, p)] = (n + 1, s + math.floor(v * 100 + 0.5))
    nt = {p: sum(n for (et, pp), (n, _) in cells.items() if pp == p) for p in (0, 1)}
    got = {
        r["event_type"]: r
        for r in REGISTRY["events_mix_shift"].build(spark, sf_dir).collect()
    }
    total = 0.0
    overall = {}
    for p in (0, 1):
        s_all = sum(s for (et, pp), (_, s) in cells.items() if pp == p)
        overall[p] = s_all / nt[p] / 100
    for et, r in got.items():
        n0, s0 = cells[(et, 0)]
        n1, s1 = cells[(et, 1)]
        share0, share1 = n0 / nt[0], n1 / nt[1]
        rate0, rate1 = s0 / n0 / 100, s1 / n1 / 100
        assert abs(r["mix_effect"] - (share1 - share0) * rate0) <= 1e-3
        assert abs(r["rate_effect"] - share1 * (rate1 - rate0)) <= 1e-3
        assert abs(r["total_effect"] - (share1 * rate1 - share0 * rate0)) <= 1e-3
        # exact additivity per type
        assert abs(r["mix_effect"] + r["rate_effect"] - r["total_effect"]) <= 2e-3
        total += r["total_effect"]
    # the per-type totals sum to the overall average-value change
    assert abs(total - (overall[1] - overall[0])) <= 1e-2
