"""Independent-recomputation properties for the second round-5
operator wave (duplicated-passage spans, diversity-capped top-k,
chi-square independence) — plain-Python references over the SAME
parquet inputs, mirroring test_retrieval_props.py."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_substring_spans_match_python_reference(spark, sf_dir):
    """Recompute the Lee-et-al-style duplicated spans with a dict
    fold: shingle → docs, dup positions, greedy island merge."""
    from etl_cnc_spark.llm.dedup import SPAN_K

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    occurrences = defaultdict(set)  # shingle -> doc ids
    positions = defaultdict(list)  # doc -> [(p, shingle)]
    for doc_id, text in docs:
        ws = text.split(" ")
        for p in range(0, len(ws) - SPAN_K + 1):
            sh = hashlib.md5(" ".join(ws[p : p + SPAN_K]).encode()).hexdigest()
            occurrences[sh].add(doc_id)
            positions[doc_id].append((p, sh))
    expect = set()
    for doc_id, plist in positions.items():
        dup_ps = sorted(p for p, sh in plist if len(occurrences[sh]) >= 2)
        if not dup_ps:
            continue
        start = prev = dup_ps[0]
        n = 1
        for p in dup_ps[1:]:
            if p - prev > SPAN_K:
                expect.add((doc_id, start, prev + SPAN_K - 1, n))
                start, n = p, 0
            prev = p
            n += 1
        expect.add((doc_id, start, prev + SPAN_K - 1, n))
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_shingles"])
        for r in REGISTRY["dedup_substring_spans"].build(spark, sf_dir).collect()
    }
    assert got == expect
    for _, s, e, _ in got:
        assert e - s + 1 >= SPAN_K  # a span is at least one shingle wide


def _vectors(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()


def test_diverse_topk_matches_python_reference(spark, sf_dir):
    """Full Python replay: capped-centroid assignment, per-cell best,
    global top-k — and the headline property, all cells distinct."""
    from etl_cnc_spark.llm.dedup import CENT_BUDGET, DEDUP_CENT_MOD
    from etl_cnc_spark.llm.similarity import DIVERSE_K, N_DIVERSE_Q

    vecs = _vectors(sf_dir)
    n = len(vecs)
    step = max(DEDUP_CENT_MOD, math.ceil(n / CENT_BUDGET))
    cents = [(vid, v) for vid, v in vecs if vid % step == 0]

    def dot(a, b):
        return sum(float(x) * float(y) for x, y in zip(a, b))

    assign = {}
    for vid, v in vecs:
        n2 = dot(v, v)
        best = min(
            ((n2 + dot(c, c) - 2 * dot(v, c), cid) for cid, c in cents)
        )
        assign[vid] = best[1]
    expect = {}
    by_id = dict(vecs)
    for qid in range(N_DIVERSE_Q):
        qv = by_id[qid]
        qn = math.sqrt(dot(qv, qv))
        cell_best = {}
        for cid, cv in vecs:
            if cid == qid:
                continue
            cos = dot(qv, cv) / (qn * math.sqrt(dot(cv, cv)))
            cell = assign[cid]
            if cell not in cell_best or (-cos, cid) < cell_best[cell][:2]:
                cell_best[cell] = (-cos, cid, cell)
        top = sorted(cell_best.values())[:DIVERSE_K]
        for rn, (negcos, cid, cell) in enumerate(top, start=1):
            expect[(qid, rn)] = (cid, cell, -negcos)
    got = REGISTRY["sim_topk_diverse"].build(spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        cid, cell, cos = expect[(r["qid"], r["rn"])]
        assert r["cid"] == cid and r["cell"] == cell
        assert abs(r["cosine"] - cos) <= 1e-3
    # headline diversity invariant: one result per cell per query
    seen = defaultdict(set)
    for r in got:
        assert r["cell"] not in seen[r["qid"]]
        seen[r["qid"]].add(r["cell"])


def test_chi2_matches_python_fold(spark, sf_dir):
    from datetime import date

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, CAST(ts AS DATE) FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    epoch = date(2024, 1, 1)
    obs = defaultdict(int)
    for etype, d in rows:
        obs[(etype, (d - epoch).days % 7)] += 1
    rt = defaultdict(int)
    ct = defaultdict(int)
    for (etype, dow), o in obs.items():
        rt[etype] += o
        ct[dow] += o
    n = sum(obs.values())
    chi2 = 0.0
    for (etype, dow), o in obs.items():
        exp = rt[etype] * ct[dow] / n
        chi2 += (o - exp) ** 2 / exp
    dof = (len(rt) - 1) * (len(ct) - 1)
    v = math.sqrt(chi2 / (n * min(len(rt) - 1, len(ct) - 1)))
    row = REGISTRY["stat_chi2_test"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n and row["dof"] == dof
    assert abs(row["chi2"] - chi2) <= 1e-2
    assert abs(row["cramers_v"] - v) <= 1e-3
    assert 0.0 <= row["cramers_v"] <= 1.0


def test_stream_drift_monitor_matches_python_fold(spark, sf_dir):
    """Daily PSI vs the day-1 reference recomputed with dict folds;
    day 0 must sit near zero (it IS the reference)."""
    from datetime import date

    from etl_cnc_spark.streaming.batch_equiv import DRIFT_NBINS

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(ts AS DATE), value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    epoch = date(2024, 1, 1)
    cur = defaultdict(lambda: defaultdict(int))
    for d, v in rows:
        b = min(int(math.floor(v / 25.0)), DRIFT_NBINS - 1)
        cur[(d - epoch).days][b] += 1
    ref = cur[0]
    n_ref = sum(ref.values())
    all_bins = {b for day in cur.values() for b in day}
    expect = {}
    for day_n, day in cur.items():
        n_day = sum(day.values())
        psi = 0.0
        for b in all_bins:
            p_c = (day.get(b, 0) + 0.5) / (n_day + 10.0)
            p_r = (ref.get(b, 0) + 0.5) / (n_ref + 10.0)
            psi += (p_c - p_r) * math.log(p_c / p_r)
        expect[day_n] = (n_day, psi)
    got = REGISTRY["stream_drift_monitor"].build(spark, sf_dir).collect()
    assert {r["day_n"] for r in got} == set(expect)
    for r in got:
        n_day, psi = expect[r["day_n"]]
        assert r["n_day"] == n_day
        assert abs(r["psi"] - psi) <= 1e-3
        assert r["drifted"] == (psi > 0.25)
        if r["day_n"] == 0:
            assert r["psi"] <= 0.01  # the reference vs itself


def test_seasonal_decompose_matches_python_fold(spark, sf_dir):
    """Trend/seasonal/residual recomputed with plain list folds;
    components must re-add to the observation."""
    from datetime import date

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, CAST(ts AS DATE), count(*) "
        f"FROM '{sf_dir}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    epoch = date(2024, 1, 1)
    daily = defaultdict(dict)
    all_days = set()
    for etype, d, n in rows:
        day = (d - epoch).days
        daily[etype][day] = n
        all_days.add(day)
    days = sorted(all_days)
    expect = {}
    for etype, series in daily.items():
        n_of = {d: series.get(d, 0) for d in days}
        trend = {}
        for i, d in enumerate(days):
            lo, hi = max(0, i - 3), min(len(days), i + 4)
            win = [n_of[days[j]] for j in range(lo, hi)]
            trend[d] = sum(win) / len(win)
        by_dow = defaultdict(list)
        for d in days:
            by_dow[d % 7].append(math.floor((n_of[d] - trend[d]) * 1e6 + 0.5))
        seas = {dw: sum(v) / len(v) / 1e6 for dw, v in by_dow.items()}
        for d in days:
            expect[(etype, d)] = (
                n_of[d],
                trend[d],
                seas[d % 7],
                n_of[d] - trend[d] - seas[d % 7],
            )
    got = REGISTRY["events_seasonal_decompose"].build(spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        n, t, s, res = expect[(r["event_type"], r["day_n"])]
        assert r["n"] == n
        assert abs(r["trend"] - t) <= 1e-3
        assert abs(r["seasonal"] - s) <= 1e-3
        assert abs(r["residual"] - res) <= 1e-3
        # additivity: components reconstruct the observation
        assert abs((r["trend"] + r["seasonal"] + r["residual"]) - n) <= 1e-3


def test_theil_sen_matches_python_fold(spark, sf_dir):
    """Lower-median pairwise slope and intercept recomputed naively;
    robustness sanity — slope must be finite and pairs = D*(D-1)/2."""
    from datetime import date

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, CAST(ts AS DATE), count(*) "
        f"FROM '{sf_dir}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    epoch = date(2024, 1, 1)
    daily = defaultdict(dict)
    for etype, d, n in rows:
        daily[etype][(d - epoch).days] = n
    got = {
        r["event_type"]: r
        for r in REGISTRY["events_theil_sen"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(daily)
    for etype, series in daily.items():
        pts = sorted(series.items())
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                (da, na), (db, nb) = pts[i], pts[j]
                slopes.append(((nb - na) / (db - da), da, db))
        slopes.sort()
        slope = slopes[(len(slopes) + 1) // 2 - 1][0]
        b0s = sorted((n - slope * d, d) for d, n in pts)
        icept = b0s[(len(b0s) + 1) // 2 - 1][0]
        r = got[etype]
        assert r["n_pairs"] == len(slopes) == len(pts) * (len(pts) - 1) // 2
        assert abs(r["slope"] - slope) <= 1e-3
        assert abs(r["intercept"] - icept) <= 1e-3


def test_link_features_match_python_fold(spark, sf_dir):
    """Common-neighbor / Jaccard / Adamic-Adar recomputed from a
    Python adjacency dict over the same nation trade graph."""
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
    und = set()
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
        und.add((a, b))
    got = REGISTRY["graph_link_features"].build(spark, sf_dir).collect()
    expect_pairs = {
        (x, y)
        for x in adj
        for y in adj
        if x < y and adj[x] & adj[y]
    }
    assert {(r["a"], r["b"]) for r in got} == expect_pairs
    for r in got:
        x, y = r["a"], r["b"]
        common = adj[x] & adj[y]
        assert r["cn"] == len(common)
        assert r["deg_a"] == len(adj[x]) and r["deg_b"] == len(adj[y])
        jac = len(common) / (len(adj[x]) + len(adj[y]) - len(common))
        aa = sum(1.0 / math.log(len(adj[z])) for z in common)
        assert abs(r["jaccard"] - jac) <= 1e-3
        assert abs(r["adamic_adar"] - aa) <= 1e-3
        assert r["is_edge"] == ((x, y) in und)
