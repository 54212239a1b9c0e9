"""Independent-recomputation properties for the round-6 operator
waves (ABC analysis, elasticity, drawdown, VaR/CVaR, target encoding,
WoE/IV, lift-gains, NDCG, Gopher rules, burstiness, Hamming top-k,
Lloyd step, Kendall tau, ANOVA, CDC net-changes): each key is
re-derived with plain Python/numpy from the raw parquet — a third
engine besides Spark and DuckDB, so a shared SQL-vs-SQL blind spot
cannot hide."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np
import pytest

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


def test_abc_analysis_classes_partition_revenue(spark, sf_dir):
    rows = REGISTRY["orders_abc_analysis"].build(spark, sf_dir).collect()
    total = sum(r["revenue_cents"] for r in rows)
    assert rows and total > 0
    # cum_cents of the max-cum row equals the total; classes ordered
    by_cum = sorted(rows, key=lambda r: r["cum_cents"])
    assert by_cum[-1]["cum_cents"] == total
    seen_b = seen_c = False
    for r in by_cum:
        if r["abc_class"] == "B":
            seen_b = True
        if r["abc_class"] == "C":
            seen_c = True
        if r["abc_class"] == "A":
            assert not seen_b and not seen_c
        if r["abc_class"] == "B":
            assert not seen_c
    # every class-A row's share is within the band
    for r in rows:
        assert r["cum_bps"] == r["cum_cents"] * 10000 // total


def test_drawdown_matches_python_scan(spark, sf_dir):
    con = _con(sf_dir)
    ev = con.execute(
        "SELECT user_id, epoch_us(ts), event_id, event_type,"
        " CAST(floor(value*100 + 0.5) AS BIGINT) FROM events"
    ).fetchall()
    curves: dict[int, list[tuple]] = {}
    for uid, t, eid, et, c in ev:
        curves.setdefault(uid, []).append(
            (t, eid, -c if et == "error" else c)
        )
    out = {r["user_id"]: r for r in
           REGISTRY["events_drawdown"].build(spark, sf_dir).collect()}
    assert set(out) == set(curves)
    for uid, flows in curves.items():
        flows.sort()
        bal = peak = 0
        max_dd = None
        peak_seen = None
        trough = None
        for _, _, f in flows:
            bal += f
            peak_seen = bal if peak_seen is None else max(peak_seen, bal)
            dd = peak_seen - bal
            max_dd = dd if max_dd is None else max(max_dd, dd)
            trough = bal if trough is None else min(trough, bal)
        r = out[uid]
        assert r["peak_cents"] == peak_seen
        assert r["max_drawdown_cents"] == max_dd
        assert r["trough_cents"] == trough


def test_var_cvar_is_exact_discrete_quantile(spark, sf_dir):
    con = _con(sf_dir)
    rows = REGISTRY["events_var_cvar"].build(spark, sf_dir).collect()
    vals = con.execute(
        "SELECT event_type, CAST(floor(value*100+0.5) AS BIGINT)"
        " FROM events"
    ).fetchall()
    by_type: dict[str, list[int]] = {}
    for et, c in vals:
        by_type.setdefault(et, []).append(c)
    for r in rows:
        xs = sorted(by_type[r["event_type"]])
        n = len(xs)
        # smallest value whose cumulative count covers 95% of rows
        k = math.ceil(0.95 * n)
        assert r["n"] == n
        assert r["var_cents"] == xs[k - 1]
        tail = [x for x in xs if x >= r["var_cents"]]
        assert r["n_tail"] == len(tail)
        assert abs(r["cvar_value"] - sum(tail) / len(tail) / 100.0) <= 1e-3
        assert r["cvar_value"] >= r["var_cents"] / 100.0 - 1e-9


def test_target_encoding_shrinks_toward_prior(spark, sf_dir):
    rows = REGISTRY["ml_target_encoding"].build(spark, sf_dir).collect()
    n_all = sum(r["n"] for r in rows)
    pos_all = sum(r["pos"] for r in rows)
    prior = pos_all / n_all
    for r in rows:
        raw = r["pos"] / r["n"]
        assert abs(r["raw_rate"] - raw) <= 1e-3
        # smoothed estimate lies strictly between raw rate and prior
        lo, hi = sorted((raw, prior))
        assert lo - 1e-3 <= r["smoothed_enc"] <= hi + 1e-3


def test_woe_iv_matches_python(spark, sf_dir):
    rows = REGISTRY["ml_woe_iv"].build(spark, sf_dir).collect()
    good_all = sum(r["good"] for r in rows)
    bad_all = sum(r["bad"] for r in rows)
    iv = 0.0
    for r in rows:
        g, b = r["good"] / good_all, r["bad"] / bad_all
        assert abs(r["woe"] - math.log(g / b)) <= 1e-3
        iv += (g - b) * math.log(g / b)
    for r in rows:
        assert abs(r["iv_total"] - iv) <= 1e-3


def test_lift_gains_deciles_are_exact_and_monotone(spark, sf_dir):
    rows = sorted(
        REGISTRY["ml_lift_gains"].build(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_all = sum(r["n"] for r in rows)
    # SQL-standard ntile: sizes differ by at most 1, big ones first
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)
    assert rows[-1]["cum_pos"] == sum(r["pos"] for r in rows)
    assert abs(rows[-1]["gain"] - 1.0) <= 1e-3
    cums = [r["cum_pos"] for r in rows]
    assert cums == sorted(cums)
    assert n_all == sum(sizes)


def test_ndcg_matches_python_rerank(spark, sf_dir):
    con = _con(sf_dir)
    emb = con.execute(
        "SELECT vec_id, label, embedding FROM embeddings"
    ).fetchall()
    vecs = {v: np.array(e, dtype=np.float64) for v, _, e in emb}
    labels = {v: l for v, l, _ in emb}
    out = {r["qid"]: r for r in
           REGISTRY["ml_ndcg_eval"].build(spark, sf_dir).collect()}
    qids = [v for v in vecs if v < 50]
    assert set(out) == set(qids)
    for qid in qids:
        q = vecs[qid]
        scored = []
        for cid, c in vecs.items():
            if cid == qid:
                continue
            cos = float(q @ c / (np.linalg.norm(q) * np.linalg.norm(c)))
            scored.append((-cos, cid))
        scored.sort()
        top = [cid for _, cid in scored[:5]]
        rels = [1 if labels[c] == labels[qid] else 0 for c in top]
        dcg = sum(r / math.log2(i + 2) for i, r in enumerate(rels))
        n_rel_corpus = sum(
            1 for c in vecs if c != qid and labels[c] == labels[qid]
        )
        idcg = sum(
            1 / math.log2(j + 2) for j in range(min(5, n_rel_corpus))
        )
        r = out[qid]
        assert r["n_rel_topk"] == sum(rels)
        assert r["n_rel_corpus"] == n_rel_corpus
        if idcg:
            assert abs(r["ndcg"] - dcg / idcg) <= 1e-3
        first = next((i + 1 for i, x in enumerate(rels) if x), 0)
        assert r["first_rel_rank"] == first
        assert abs(r["rr"] - (1 / first if first else 0.0)) <= 1e-3


def test_gopher_rules_match_python_counter(spark, sf_dir):
    con = _con(sf_dir)
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    out = {r["doc_id"]: r for r in
           REGISTRY["text_gopher_rules"].build(spark, sf_dir).collect()}
    stop = {"the", "of", "and", "a", "in", "to", "is", "on", "for",
            "with"}
    for doc_id, text in docs:
        words = text.split(" ")
        c = Counter(words)
        r = out[doc_id]
        n = len(words)
        assert r["n_words"] == n
        assert r["rule_word_count"] == (20 <= n <= 100_000)
        mwl = sum(len(w) for w in words) / n
        assert r["rule_mean_word_len"] == (3.0 <= mwl <= 10.0)
        alpha = sum(v for w, v in c.items() if w.isalpha()) / n
        assert r["rule_alpha_frac"] == (alpha >= 0.8)
        assert r["rule_stopwords"] == (len(stop & set(words)) >= 2)
        assert r["rule_repetition"] == (max(c.values()) / n <= 0.2)
        assert r["gopher_pass"] == all(
            [r["rule_word_count"], r["rule_mean_word_len"],
             r["rule_alpha_frac"], r["rule_stopwords"],
             r["rule_repetition"]]
        )


def test_burstiness_matches_numpy_moments(spark, sf_dir):
    con = _con(sf_dir)
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    n_docs = len(docs)
    counts: dict[str, list[int]] = {}
    for _, text in docs:
        for w, c in Counter(text.split(" ")).items():
            counts.setdefault(w, []).append(c)
    out = {r["word"]: r for r in
           REGISTRY["text_word_burstiness"].build(spark, sf_dir).collect()}
    expected = {w for w, cs in counts.items() if len(cs) >= 25}
    assert set(out) == expected
    for w in expected:
        full = counts[w] + [0] * (n_docs - len(counts[w]))
        arr = np.array(full, dtype=np.float64)
        mean = arr.mean()
        vmr = arr.var() / mean
        r = out[w]
        assert r["df"] == len(counts[w])
        assert r["tf"] == int(arr.sum())
        assert abs(r["mean_per_doc"] - mean) <= 1e-3
        assert abs(r["burstiness"] - vmr) <= 1e-3


def test_hamming_topk_matches_numpy_signatures(spark, sf_dir):
    con = _con(sf_dir)
    emb = con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    sigs = {
        v: np.array([1 if x > 0 else 0 for x in e], dtype=np.uint8)
        for v, e in emb
    }
    out = REGISTRY["embed_hamming_topk"].build(spark, sf_dir).collect()
    got: dict[int, list] = {}
    for r in out:
        got.setdefault(r["qid"], []).append(r)
    for qid, rows in got.items():
        hams = sorted(
            (int(np.sum(sigs[qid] != s)), cid)
            for cid, s in sigs.items()
            if cid != qid
        )
        rows.sort(key=lambda r: r["rn"])
        assert [(r["hamming"], r["cid"]) for r in rows] == hams[:5]


def test_kmeans_refine_centroids_are_cell_means(spark, sf_dir):
    con = _con(sf_dir)
    emb = con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    n = len(emb)
    step = max(64, math.ceil(n / 4096))
    cents = {v: np.array(e, dtype=np.float64) for v, e in emb
             if v % step == 0}
    assign: dict[int, list[int]] = {c: [] for c in cents}
    for v, e in emb:
        x = np.array(e, dtype=np.float64)
        best = min(
            cents,
            key=lambda c: (float(((x - cents[c]) ** 2).sum()), c),
        )
        assign[best].append(v)
    out = REGISTRY["sim_kmeans_refine"].build(spark, sf_dir).collect()
    by_cell: dict[int, dict[int, int]] = {}
    for r in out:
        by_cell.setdefault(r["cell"], {})[r["dim"]] = r
    vecs = {v: e for v, e in emb}
    for cell, members in assign.items():
        if not members:
            assert cell not in by_cell
            continue
        qs = np.array(
            [
                [math.floor(float(x) * 1_000_000 + 0.5) for x in vecs[m]]
                for m in members
            ],
            dtype=np.int64,
        )
        for dim in range(1, 65):
            r = by_cell[cell][dim]
            assert r["n_assigned"] == len(members)
            tot = int(qs[:, dim - 1].sum())
            assert r["centroid_q"] == tot // len(members) if tot >= 0 \
                else -((-tot) // len(members)) == r["centroid_q"]


def test_kendall_matches_scipy_free_python(spark, sf_dir):
    con = _con(sf_dir)
    pts = con.execute(
        "SELECT CAST(l_quantity AS BIGINT),"
        " CAST(floor(l_extendedprice / 5000) AS BIGINT) FROM lineitem"
    ).fetchall()
    grid = Counter(pts)
    cells = list(grid.items())
    conc = disc = 0
    for i in range(len(cells)):
        (x1, y1), c1 = cells[i]
        for j in range(i + 1, len(cells)):
            (x2, y2), c2 = cells[j]
            s = (x2 - x1) * (y2 - y1)
            if s > 0:
                conc += c1 * c2
            elif s < 0:
                disc += c1 * c2
    n = sum(grid.values())
    n0 = n * (n - 1) / 2
    tx = Counter()
    ty = Counter()
    for (x, y), c in grid.items():
        tx[x] += c
        ty[y] += c
    n1 = sum(c * (c - 1) / 2 for c in tx.values())
    n2 = sum(c * (c - 1) / 2 for c in ty.values())
    tau = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
    r = REGISTRY["stat_kendall_tau"].build(spark, sf_dir).collect()[0]
    assert r["conc"] == conc and r["disc"] == disc and r["n"] == n
    assert abs(r["tau_b"] - tau) <= 1e-3
    assert -1.0 <= r["tau_b"] <= 1.0


def test_anova_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    vals = con.execute(
        "SELECT event_type, CAST(floor(value*100+0.5) AS BIGINT)"
        " FROM events"
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for et, c in vals:
        groups.setdefault(et, []).append(c)
    arrs = [np.array(v, dtype=np.float64) for v in groups.values()]
    n_all = sum(len(a) for a in arrs)
    k = len(arrs)
    grand = sum(a.sum() for a in arrs) / n_all
    ssb = sum(len(a) * (a.mean() - grand) ** 2 for a in arrs)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arrs)
    f = (ssb / (k - 1)) / (ssw / (n_all - k))
    r = REGISTRY["stat_anova_oneway"].build(spark, sf_dir).collect()[0]
    assert r["k"] == k and r["n_all"] == n_all
    assert abs(r["f_stat"] - f) <= max(1e-3, 1e-4 * abs(f))
    assert abs(r["eta_sq"] - ssb / (ssb + ssw)) <= 1e-3


def test_cdc_net_changes_semantics(spark, sf_dir):
    con = _con(sf_dir)
    ev = con.execute(
        "SELECT user_id, epoch_us(ts), event_id, event_type,"
        " CAST(floor(value*100+0.5) AS BIGINT) FROM events"
    ).fetchall()
    logs: dict[int, list[tuple]] = {}
    for uid, t, eid, et, c in ev:
        op = "I" if et == "signup" else ("D" if et == "error" else "U")
        logs.setdefault(uid, []).append((t, eid, op, c))
    out = {r["user_id"]: r for r in
           REGISTRY["etl_cdc_net_changes"].build(spark, sf_dir).collect()}
    assert set(out) == set(logs)
    for uid, rowset in logs.items():
        rowset.sort()
        first_op, last_op = rowset[0][2], rowset[-1][2]
        r = out[uid]
        assert r["first_op"] == first_op and r["last_op"] == last_op
        assert r["n_ops"] == len(rowset)
        assert r["last_val_cents"] == rowset[-1][3]
        if first_op == "I" and last_op == "D":
            assert r["net_op"] == "NONE"
        elif first_op == "I":
            assert r["net_op"] == "I"
        elif last_op == "D":
            assert r["net_op"] == "D"
        else:
            assert r["net_op"] == "U"


def test_elasticity_slope_matches_numpy_lstsq(spark, sf_dir):
    con = _con(sf_dir)
    pts = con.execute(
        "SELECT p.p_brand, l.l_extendedprice / l.l_quantity,"
        " l.l_quantity"
        " FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey"
        " WHERE l.l_quantity > 0 AND l.l_extendedprice > 0"
    ).fetchall()
    by_brand: dict[str, list[tuple]] = {}
    for b, price, qty in pts:
        by_brand.setdefault(b, []).append(
            (
                math.floor(math.log(price) * 1_000_000 + 0.5),
                math.floor(math.log(qty) * 1_000_000 + 0.5),
            )
        )
    out = {r["p_brand"]: r for r in
           REGISTRY["orders_price_elasticity"].build(spark, sf_dir)
           .collect()}
    assert set(out) == set(by_brand)
    for b, xy in by_brand.items():
        x = np.array([p[0] for p in xy], dtype=np.float64)
        y = np.array([p[1] for p in xy], dtype=np.float64)
        slope = float(np.polyfit(x, y, 1)[0])
        r = out[b]
        assert r["n"] == len(xy)
        assert abs(r["elasticity"] - slope) <= max(1e-3, 1e-3 * abs(slope))


def test_dedup_recall_report_consistency(spark, sf_dir):
    r = REGISTRY["dedup_recall_report"].build(spark, sf_dir).collect()[0]
    assert 0 < r["n_matched"] <= min(r["n_exact"], r["n_ivf"])
    assert r["recall_bps"] == r["n_matched"] * 10000 // r["n_exact"]
    assert r["precision_bps"] == r["n_matched"] * 10000 // r["n_ivf"]
    # IVF candidates that pass tau are a subset of the exact pairs in
    # spirit; precision should be near-perfect (same tau both sides)
    assert r["precision_bps"] >= 9900


def test_perfect_order_matches_python(spark, sf_dir):
    import duckdb as _d

    con = _con(sf_dir)
    rows = con.execute(
        "SELECT o.o_orderkey, epoch_us(date_trunc('month', o.o_orderdate)),"
        " datediff('day', o.o_orderdate, l.l_shipdate) <= 30"
        " AND l.l_returnflag <> 'R'"
        " FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
    ).fetchall()
    per_order: dict[int, tuple[int, list[bool]]] = {}
    for ok, mon, good in rows:
        m, flags = per_order.setdefault(ok, (mon, []))
        flags.append(bool(good))
    months: dict[int, list[bool]] = {}
    lines_per_month: dict[int, int] = {}
    for mon, flags in per_order.values():
        months.setdefault(mon, []).append(all(flags))
        lines_per_month[mon] = lines_per_month.get(mon, 0) + len(flags)
    out = {r["month_us"]: r for r in
           REGISTRY["orders_perfect_order"].build(spark, sf_dir).collect()}
    assert set(out) == set(months)
    for mon, perfects in months.items():
        r = out[mon]
        assert r["n_orders"] == len(perfects)
        assert r["n_perfect"] == sum(perfects)
        assert r["n_lines"] == lines_per_month[mon]
        assert r["perfect_rate_bps"] == sum(perfects) * 10000 // len(perfects)


def test_burst_intervals_are_maximal_runs(spark, sf_dir):
    con = _con(sf_dir)
    hot = con.execute(
        "SELECT event_type,"
        " CAST(datediff('hour', TIMESTAMP '1970-01-01',"
        "      date_trunc('hour', ts)) AS BIGINT) AS hn,"
        " count(*) AS c"
        " FROM events GROUP BY 1, 2 HAVING count(*) >= 3"
    ).fetchall()
    runs: dict[str, list[list[tuple[int, int]]]] = {}
    for et in {r[0] for r in hot}:
        hours = sorted((hn, c) for t, hn, c in hot if t == et)
        cur: list[tuple[int, int]] = []
        rs = []
        for hn, c in hours:
            if cur and hn == cur[-1][0] + 1:
                cur.append((hn, c))
            else:
                if cur:
                    rs.append(cur)
                cur = [(hn, c)]
        if cur:
            rs.append(cur)
        runs[et] = rs
    out = REGISTRY["events_burst_intervals"].build(spark, sf_dir).collect()
    got: dict[str, set] = {}
    for r in out:
        got.setdefault(r["event_type"], set()).add(
            (r["start_us"], r["end_us"], r["n_hours"], r["total_events"],
             r["peak_per_hour"])
        )
    assert set(got) == set(runs)
    H = 3_600_000_000
    for et, rs in runs.items():
        exp = {
            (run[0][0] * H, run[-1][0] * H, len(run),
             sum(c for _, c in run), max(c for _, c in run))
            for run in rs
        }
        assert got[et] == exp


def test_l_diversity_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    con.execute(
        f"CREATE VIEW customer AS SELECT *"
        f" FROM '{sf_dir}/customer.parquet'"
    )
    rows = con.execute(
        "SELECT c_nationkey, c_mktsegment,"
        " CAST(floor(c_acctbal / 1000) AS BIGINT) FROM customer"
    ).fetchall()
    groups: dict[tuple, set] = {}
    sizes: dict[tuple, int] = {}
    for nk, seg, band in rows:
        k = (nk, seg)
        groups.setdefault(k, set()).add(band)
        sizes[k] = sizes.get(k, 0) + 1
    out = {(r["c_nationkey"], r["c_mktsegment"]): r for r in
           REGISTRY["etl_l_diversity"].build(spark, sf_dir).collect()}
    assert set(out) == set(groups)
    n_div = sum(1 for v in groups.values() if len(v) >= 3)
    for k, bands in groups.items():
        r = out[k]
        assert r["l_band"] == len(bands)
        assert r["group_n"] == sizes[k]
        assert r["l_diverse"] == (len(bands) >= 3)
        assert r["n_groups"] == len(groups)
        assert r["n_diverse_groups"] == n_div


def test_collation_groups_fold_case(spark, sf_dir):
    rows = REGISTRY["fn_collation"].build(spark, sf_dir).collect()
    for r in rows:
        assert r["seg_ci"] == r["seg_ci"].lower()
        assert 1 <= r["n_case_variants"] <= 2
        assert r["first_variant"].lower() == r["seg_ci"]
    # ci-grouping must merge the upper/lower synth variants: with both
    # parities present every segment shows 2 binary variants
    assert {r["n_case_variants"] for r in rows} == {2}


def test_auc_pr_matches_sklearn_free_python(spark, sf_dir):
    con = _con(sf_dir)
    pts = con.execute(
        "SELECT CAST(floor(value*100+0.5) AS BIGINT),"
        " CASE WHEN event_type='purchase' THEN 1 ELSE 0 END"
        " FROM events"
    ).fetchall()
    from collections import defaultdict

    grid = defaultdict(lambda: [0, 0])
    for s, y in pts:
        grid[s][0] += 1
        grid[s][1] += y
    n = sum(v[0] for v in grid.values())
    n_pos = sum(v[1] for v in grid.values())
    cum_all = cum_pos = 0
    ap = 0.0
    for s in sorted(grid, reverse=True):
        c_all, c_pos = grid[s]
        cum_all += c_all
        cum_pos += c_pos
        if c_pos:
            ap += c_pos / n_pos * (cum_pos / cum_all)
    r = REGISTRY["ml_auc_pr"].build(spark, sf_dir).collect()[0]
    assert r["n"] == n and r["n_pos"] == n_pos
    assert abs(r["auc_pr"] - ap) <= 1e-3
    assert abs(r["baseline_rate"] - n_pos / n) <= 1e-3
    # AP of a random-ish score should sit near the base rate
    assert r["auc_pr"] >= r["baseline_rate"] * 0.5


def test_gram_power_iter_matches_numpy_eig(spark, sf_dir):
    con = _con(sf_dir)
    emb = con.execute("SELECT embedding FROM embeddings").fetchall()
    Q = np.array(
        [[math.floor(float(x) * 1000 + 0.5) for x in e] for (e,) in emb],
        dtype=np.int64,
    )
    G = Q.T @ Q
    out = sorted(
        REGISTRY["embed_gram_power_iter"].build(spark, sf_dir).collect(),
        key=lambda r: r["dim"],
    )
    assert [r["dim"] for r in out] == list(range(1, 65))
    # replicate the exact integer pipeline
    v1 = G.sum(axis=1)
    mx1 = int(np.abs(v1).max())

    def scale(v, mx, t=1000):
        return np.where(v < 0, -((-v) * t // mx), v * t // mx)

    v1n = scale(v1, mx1)
    assert [r["v1_q"] for r in out] == [int(x) for x in v1n]
    v2 = G @ v1n
    v2n = scale(v2, int(np.abs(v2).max()))
    assert [r["v2_q"] for r in out] == [int(x) for x in v2n]
    # power iteration never decreases the Rayleigh quotient, and it
    # stays inside the spectrum (the fixture Gram is near-isotropic,
    # so eigenvector ALIGNMENT after 2 steps is not a valid
    # expectation — monotone RQ is)
    w = np.linalg.eigvalsh(G.astype(np.float64))
    Gf = G.astype(np.float64)

    def rq(v):
        v = v.astype(np.float64)
        return (v @ Gf @ v) / (v @ v)

    ones = np.ones(64)
    assert w[0] - 1e-6 <= rq(ones) <= w[-1] + 1e-6
    assert rq(v1n) >= rq(ones) - abs(rq(ones)) * 1e-6
    assert rq(v2n) >= rq(v1n) - abs(rq(v1n)) * 1e-6
    assert w[0] - 1e-6 <= rq(v2n) <= w[-1] + 1e-6


def test_retention_halflife_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    pts = con.execute("""
        WITH firstw AS (
            SELECT user_id, min(date_trunc('week', ts)) AS w0
            FROM events GROUP BY user_id
        )
        SELECT CAST(datediff('week', f.w0, date_trunc('week', e.ts))
               AS BIGINT), count(DISTINCT e.user_id)
        FROM events e JOIN firstw f ON e.user_id = f.user_id
        GROUP BY 1
    """).fetchall()
    act = dict(pts)
    cohort = act[0]
    xs, ys = [], []
    for k in range(1, 5):
        if act.get(k, 0) > 0:
            xs.append(k)
            ys.append(math.floor(math.log(act[k] / cohort) * 1e6 + 0.5))
    x = np.array(xs, dtype=np.float64)
    y = np.array(ys, dtype=np.float64)
    n = len(x)
    slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    ) / 1e6
    r = REGISTRY["events_retention_halflife"].build(spark, sf_dir).collect()[0]
    assert r["n"] == n
    assert abs(r["decay_per_week"] - slope) <= 1e-3
    if slope == 0:
        assert r["halflife_weeks"] is None  # flat curve: no finite halflife
    else:
        assert abs(r["halflife_weeks"] - (-math.log(2) / slope)) <= max(
            1e-3, 1e-3 * abs(math.log(2) / slope)
        )


def test_js_divergence_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    docs = con.execute("SELECT source, text FROM documents").fetchall()
    dist: dict[str, Counter] = {}
    for src, text in docs:
        dist.setdefault(src, Counter()).update(text.split(" "))
    out = {(r["source_a"], r["source_b"]): r for r in
           REGISTRY["text_js_divergence"].build(spark, sf_dir).collect()}
    srcs = sorted(dist)
    expected_pairs = {
        (a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]
        if set(dist[a]) & set(dist[b])
    }
    assert set(out) == expected_pairs
    import random

    for a, b in random.Random(7).sample(sorted(expected_pairs), 20):
        na, nb = sum(dist[a].values()), sum(dist[b].values())
        words = set(dist[a]) | set(dist[b])
        jsd = 0.0
        for wd in words:
            p, q = dist[a][wd] / na, dist[b][wd] / nb
            m = (p + q) / 2
            if p:
                jsd += 0.5 * p * math.log2(p / m)
            if q:
                jsd += 0.5 * q * math.log2(q / m)
        r = out[(a, b)]
        assert abs(r["jsd_bits"] - jsd) <= 1e-3
        assert -1e-9 <= r["jsd_bits"] <= 1.0 + 1e-9


def test_tost_equivalence_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    vals = con.execute(
        "SELECT event_type, CAST(floor(value*100+0.5) AS BIGINT)"
        " FROM events WHERE event_type IN ('click', 'view')"
    ).fetchall()
    g = {"click": [], "view": []}
    for et, c in vals:
        g[et].append(c)
    a, b = np.array(g["click"], float), np.array(g["view"], float)
    d = a.mean() - b.mean()
    se = math.sqrt(a.var() / len(a) + b.var() / len(b))
    r = REGISTRY["stat_tost_equivalence"].build(spark, sf_dir).collect()[0]
    assert r["n1"] == len(a) and r["n2"] == len(b)
    assert abs(r["mean_diff"] - d / 100.0) <= 1e-3
    assert abs(r["t_lower"] - (d + 500) / se) <= 1e-2
    assert abs(r["t_upper"] - (d - 500) / se) <= 1e-2
    assert r["equivalent"] == (
        (d + 500) / se > 1.6449 and (d - 500) / se < -1.6449
    )


def test_peak_exposure_matches_python_sweep(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT o_custkey, epoch_us(o_orderdate), o_orderkey,"
        " CAST(floor(o_totalprice*100+0.5) AS BIGINT) FROM orders"
    ).fetchall()
    DAY_US = 86_400_000_000
    pts: dict[int, list[tuple]] = {}
    for ck, t, okey, c in rows:
        pts.setdefault(ck, []).append((t, c, okey, c))
        pts.setdefault(ck, []).append((t + 30 * DAY_US, -c, okey, -c))
    out = {r["o_custkey"]: r for r in
           REGISTRY["orders_peak_exposure"].build(spark, sf_dir).collect()}
    assert set(out) == set(pts)
    for ck, evs in pts.items():
        evs.sort(key=lambda e: (e[0], e[1], e[2]))
        bal = 0
        peak = None
        for _, delta, _, _ in evs:
            bal += delta
            peak = bal if peak is None else max(peak, bal)
        r = out[ck]
        assert r["peak_exposure_cents"] == peak
        assert r["n_orders"] == len(evs) // 2
        assert bal == 0  # every open has a matching close


def test_kn_lm_score_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    bg_cnt: Counter = Counter()
    doc_bgs: dict[int, list[tuple]] = {}
    for doc_id, text in docs:
        w = text.split(" ")
        bgs = list(zip(w, w[1:]))
        doc_bgs[doc_id] = bgs
        bg_cnt.update(bgs)
    c1: Counter = Counter()
    types_after: Counter = Counter()
    types_before: Counter = Counter()
    for (w1, w2), c in bg_cnt.items():
        c1[w1] += c
        types_after[w1] += 1
        types_before[w2] += 1
    nt = len(bg_cnt)
    D = 0.75
    out = {r["doc_id"]: r for r in
           REGISTRY["text_kn_lm_score"].build(spark, sf_dir).collect()}
    for doc_id, bgs in doc_bgs.items():
        total = 0
        for w1, w2 in bgs:
            p = (
                max(bg_cnt[(w1, w2)] - D, 0.0)
                + D * types_after[w1] * (types_before[w2] / nt)
            ) / c1[w1]
            total += math.floor(math.log(p) * 1e6)
        r = out[doc_id]
        assert r["n_bigrams"] == len(bgs)
        assert abs(r["kn_logprob_micro_sum"] - total) <= len(bgs)  # 1-ulp/term
        # KN probability is a proper smoothing: every term < 0 logprob
        assert r["kn_avg_lp_micro"] < 0


def test_feature_hashing_matches_python_md5(spark, sf_dir):
    import hashlib

    con = _con(sf_dir)
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    expected: dict[tuple, list[int]] = {}
    for doc_id, text in docs:
        for wd in text.split(" "):
            h = hashlib.md5(wd.encode()).hexdigest()
            bucket = int(h[:4], 16) % 256
            sgn = 1 if int(h[4], 16) % 2 == 0 else -1
            cell = expected.setdefault((doc_id, bucket), [0, 0])
            cell[0] += sgn
            cell[1] += 1
    out = {(r["doc_id"], r["bucket"]): r for r in
           REGISTRY["ml_feature_hashing"].build(spark, sf_dir).collect()}
    assert set(out) == set(expected)
    for k, (v, n) in expected.items():
        assert out[k]["feat_value"] == v
        assert out[k]["n_tokens"] == n


def test_mutual_info_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    pts = con.execute(
        "SELECT event_type, CAST(floor(value/100.0) AS BIGINT)"
        " FROM events"
    ).fetchall()
    cells: Counter = Counter(pts)
    n = sum(cells.values())
    ma: Counter = Counter()
    mb: Counter = Counter()
    for (a, b), c in cells.items():
        ma[a] += c
        mb[b] += c
    mi = sum(
        c / n * math.log2(c * n / (ma[a] * mb[b]))
        for (a, b), c in cells.items()
    )
    r = REGISTRY["ml_mutual_info"].build(spark, sf_dir).collect()[0]
    assert r["n"] == n and r["n_cells"] == len(cells)
    assert abs(r["mi_bits"] - mi) <= 1e-3
    assert r["mi_bits"] >= -1e-9  # MI is non-negative


def test_modularity_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM '{sf_dir}/nation.parquet'"
    )
    con.execute(
        f"CREATE VIEW supplier AS SELECT *"
        f" FROM '{sf_dir}/supplier.parquet'"
    )
    edges = con.execute("""
        SELECT c.c_nationkey, s.s_nationkey, count(*)
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN '{}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    """.format(sf_dir)).fetchall()
    region = dict(con.execute(
        "SELECT n_nationkey, n_regionkey FROM nation"
    ).fetchall())
    W = sum(w for _, _, w in edges)
    from collections import defaultdict

    w_in = defaultdict(int)
    d_out = defaultdict(int)
    d_in = defaultdict(int)
    for u, v, w in edges:
        cu, cv = region[u], region[v]
        d_out[cu] += w
        d_in[cv] += w
        if cu == cv:
            w_in[cu] += w
    out = {r["community"]: r for r in
           REGISTRY["graph_modularity"].build(spark, sf_dir).collect()}
    assert set(out) == set(d_out)
    q = sum(
        w_in[c] / W - (d_out[c] / W) * (d_in[c] / W) for c in d_out
    )
    for c in d_out:
        r = out[c]
        assert r["within_weight"] == w_in[c]
        assert r["out_strength"] == d_out[c]
        assert r["in_strength"] == d_in[c]
        assert abs(r["modularity"] - q) <= 1e-3
        assert abs(
            r["q_contrib"]
            - (w_in[c] / W - (d_out[c] / W) * (d_in[c] / W))
        ) <= 1e-3


def test_repurchase_interval_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT o_custkey, epoch_us(o_orderdate), o_orderkey FROM orders"
    ).fetchall()
    hist: dict[int, list[tuple]] = {}
    for ck, t, okey in rows:
        hist.setdefault(ck, []).append((t, okey))
    out = {r["o_custkey"]: r for r in
           REGISTRY["orders_repurchase_interval"].build(spark, sf_dir)
           .collect()}
    DAY = 86_400_000_000
    for ck, orders in hist.items():
        orders.sort()
        gaps = [
            (b[0] - a[0]) // DAY for a, b in zip(orders, orders[1:])
        ]
        if not gaps:
            assert ck not in out
            continue
        r = out[ck]
        assert r["n_gaps"] == len(gaps)
        assert r["min_gap_days"] == min(gaps)
        assert r["max_gap_days"] == max(gaps)
        assert r["sum_gap_days"] == sum(gaps)
        sg = sorted(gaps)
        # percentile_disc(0.5): smallest value with cume_dist >= 0.5
        assert r["median_gap_days"] == sg[(len(sg) - 1) // 2]


def test_hysteresis_state_machine(spark, sf_dir):
    con = _con(sf_dir)
    hourly = con.execute(
        "SELECT event_type, epoch_us(date_trunc('hour', ts)), count(*)"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    series: dict[str, list[tuple]] = {}
    for et, hr, c in hourly:
        series.setdefault(et, []).append((hr, c))
    out = {(r["event_type"], r["hr_us"]): r["alert_on"] for r in
           REGISTRY["events_hysteresis_alerts"].build(spark, sf_dir)
           .collect()}
    n_flips = 0
    for et, pts in series.items():
        pts.sort()
        state = False
        prev = None
        for hr, c in pts:
            if c >= 6:
                state = True
            elif c < 2:
                state = False
            # else: keep previous state (the hysteresis band)
            assert out[(et, hr)] == state, (et, hr, c)
            if prev is not None and state != prev:
                n_flips += 1
            prev = state
    assert len(out) == sum(len(p) for p in series.values())


def test_cdc_chunks_match_python_and_reconstruct(spark, sf_dir):
    import hashlib

    con = _con(sf_dir)
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    chunk_counts: Counter = Counter()
    chunk_docs: dict[str, set] = {}
    chunk_len: dict[str, int] = {}
    for doc_id, text in docs:
        n = len(text)
        starts = [1] + [
            i
            for i in range(2, n - 6)
            if hashlib.md5(text[i - 1:i + 7].encode()).hexdigest()[0]
            == "0"
        ]
        spans = list(zip(starts, [s - 1 for s in starts[1:]] + [n]))
        # chunks must tile the document exactly
        assert spans[0][0] == 1 and spans[-1][1] == n
        for (s, e), (s2, _) in zip(spans, spans[1:]):
            assert s2 == e + 1
        for s, e in spans:
            if e < s:
                continue
            chunk = text[s - 1:e]
            dg = hashlib.md5(chunk.encode()).hexdigest()
            chunk_counts[dg] += 1
            chunk_docs.setdefault(dg, set()).add(doc_id)
            chunk_len[dg] = len(chunk)
    out = {r["digest"]: r for r in
           REGISTRY["dedup_cdc_chunks"].build(spark, sf_dir).collect()}
    expected = {d for d, c in chunk_counts.items() if c >= 2}
    assert set(out) == expected
    for dg in expected:
        r = out[dg]
        assert r["n_occur"] == chunk_counts[dg]
        assert r["n_docs"] == len(chunk_docs[dg])
        assert r["chunk_len"] == chunk_len[dg]


def test_sax_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    daily = con.execute(
        "SELECT event_type,"
        " CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))"
        " AS BIGINT), count(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    series: dict[str, dict[int, int]] = {}
    for et, d, y in daily:
        series.setdefault(et, {})[d] = y
    out: dict[tuple, dict] = {}
    words: dict[str, str] = {}
    for r in REGISTRY["events_sax_symbolic"].build(spark, sf_dir).collect():
        out[(r["event_type"], r["seg"])] = r
        words[r["event_type"]] = r["sax_word"]
    for et, days in series.items():
        ys = np.array(list(days.values()), dtype=np.float64)
        mu, sigma = ys.mean(), ys.std()
        d0 = min(days)
        segs: dict[int, list[int]] = {}
        for d, y in days.items():
            segs.setdefault((d - d0) // 5, []).append(y)
        word = []
        for sg in sorted(segs):
            z = (np.mean(segs[sg]) - mu) / sigma
            sym = ("a" if z < -0.6745 else
                   "b" if z < 0 else
                   "c" if z < 0.6745 else "d")
            word.append(sym)
            r = out[(et, sg)]
            assert r["symbol"] == sym
            assert abs(r["paa_z"] - z) <= 1e-3
            assert r["seg_n"] == len(segs[sg])
        assert words[et] == "".join(word)


def test_energy_segments_match_python(spark, sf_dir):
    con = _con(sf_dir)
    docs = con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0"
    ).fetchall()
    out: dict[int, set] = {}
    for r in (REGISTRY["multimodal_energy_segments"]
              .build(spark, sf_dir).collect()):
        out.setdefault(r["doc_id"], set()).add(
            (r["seg_start"], r["seg_end"], r["n_frames"], r["seg_energy"])
        )
    for doc_id, text in docs:
        b = text.encode()
        n_full = len(b) // 16
        energies = [
            sum(b[f * 16:(f + 1) * 16]) for f in range(n_full)
        ]
        active = [f for f, e in enumerate(energies) if e >= 1600]
        runs = []
        cur: list[int] = []
        for f in active:
            if cur and f == cur[-1] + 1:
                cur.append(f)
            else:
                if cur:
                    runs.append(cur)
                cur = [f]
        if cur:
            runs.append(cur)
        exp = {
            (run[0], run[-1], len(run), sum(energies[f] for f in run))
            for run in runs
        }
        assert out.get(doc_id, set()) == exp


def test_cohen_kappa_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    stop = {"the", "of", "and", "a", "in", "to", "is", "on", "for",
            "with"}
    a = b = c = d = 0
    for _, text in docs:
        words = text.split(" ")
        cnt = Counter(words)
        n = len(words)
        mwl = sum(len(w) for w in words) / n
        r1 = (20 <= n <= 100000 and 3 <= mwl <= 10
              and len(stop & set(words)) >= 2
              and max(cnt.values()) / n <= 0.2)
        n_stop_tokens = sum(v for w, v in cnt.items() if w in stop)
        score = (0.5 * min(n / 100.0, 1.0)
                 + 0.3 * (1.0 - min(mwl / 10.0, 1.0))
                 + 0.2 * min(10.0 * n_stop_tokens / n, 1.0))
        r2 = score >= 0.55
        if r1 and r2:
            a += 1
        elif r1:
            b += 1
        elif r2:
            c += 1
        else:
            d += 1
    n_all = a + b + c + d
    po = (a + d) / n_all
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n_all * n_all)
    r = REGISTRY["ml_cohen_kappa"].build(spark, sf_dir).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (a, b, c, d)
    assert abs(r["po"] - po) <= 1e-3
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) <= 1e-3
    assert -1.0 - 1e-9 <= r["kappa"] <= 1.0 + 1e-9


def test_supplier_scorecard_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    con.execute(
        f"CREATE VIEW supplier AS SELECT *"
        f" FROM '{sf_dir}/supplier.parquet'"
    )
    rows = con.execute("""
        SELECT l.l_suppkey,
               CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                    + 0.5) AS BIGINT),
               datediff('day', o.o_orderdate, l.l_shipdate) <= 30,
               l.l_returnflag = 'R'
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    """).fetchall()
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0, 0])
    for sk, cents, ot, ret in rows:
        s = agg[sk]
        s[0] += 1
        s[1] += cents
        s[2] += bool(ot)
        s[3] += bool(ret)
    out = {r["l_suppkey"]: r for r in
           REGISTRY["orders_supplier_scorecard"].build(spark, sf_dir)
           .collect()}
    assert set(out) == set(agg)
    for sk, (nl, rev, ot, ret) in agg.items():
        r = out[sk]
        assert r["n_lines"] == nl and r["revenue_cents"] == rev
        assert r["on_time_bps"] == ot * 10000 // nl
        assert r["return_bps"] == ret * 10000 // nl
        assert r["score_bps"] == ot * 10000 // nl - ret * 10000 // nl


def test_expert_routing_matches_numpy_softmax(spark, sf_dir):
    con = _con(sf_dir)
    emb = con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    n = len(emb)
    step = max(64, math.ceil(n / 4096))
    experts = {v: np.array(e, dtype=np.float64) for v, e in emb
               if v % step == 0}
    eids = sorted(experts)
    E = np.stack([experts[i] for i in eids])
    n_top1: Counter = Counter()
    n_top2: Counter = Counter()
    imp_q: Counter = Counter()
    for v, e in emb:
        x = np.array(e, dtype=np.float64)
        s = E @ x
        es = np.exp(s - s.max())
        p = es / es.sum()
        order = sorted(range(len(eids)), key=lambda i: (-es[i], eids[i]))
        n_top1[eids[order[0]]] += 1
        n_top2[eids[order[0]]] += 1
        n_top2[eids[order[1]]] += 1
        for i, eid in enumerate(eids):
            imp_q[eid] += math.floor(p[i] * 1e9 + 0.5)
    out = {r["expert_id"]: r for r in
           REGISTRY["embed_expert_routing"].build(spark, sf_dir).collect()}
    assert set(out) == set(eids)
    total_top1 = sum(r["n_top1"] for r in out.values())
    assert total_top1 == n  # every doc dispatched exactly once
    for eid in eids:
        r = out[eid]
        assert r["n_top1"] == n_top1[eid]
        assert r["n_top2"] == n_top2[eid]
        assert abs(r["importance_q"] - imp_q[eid]) <= len(emb)  # 1-ulp/term
        f = n_top1[eid] / n
        P = imp_q[eid] / 1e9 / n
        assert abs(r["aux_term"] - len(eids) * f * P) <= 1e-3


def test_bpe_pair_counts_match_python(spark, sf_dir):
    con = _con(sf_dir)
    docs = con.execute("SELECT text FROM documents").fetchall()
    cnt: Counter = Counter()
    for (text,) in docs:
        for w in text.split(" "):
            for i in range(len(w) - 1):
                cnt[w[i:i + 2]] += 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    out = sorted(
        REGISTRY["text_bpe_pair_counts"].build(spark, sf_dir).collect(),
        key=lambda r: r["rk"],
    )
    assert [(r["pair"], r["n"]) for r in out] == ranked


def test_length_buckets_match_python(spark, sf_dir):
    con = _con(sf_dir)
    docs = con.execute("SELECT text FROM documents").fetchall()
    from collections import defaultdict

    buckets = defaultdict(list)
    for (text,) in docs:
        n = len(text.split(" "))
        buckets[n // 32].append(n)
    out = {r["bucket"]: r for r in
           REGISTRY["pipeline_length_buckets"].build(spark, sf_dir)
           .collect()}
    assert set(out) == set(buckets)
    for b, lens in buckets.items():
        r = out[b]
        assert r["n_docs"] == len(lens)
        assert r["min_tok"] == min(lens) and r["max_tok"] == max(lens)
        assert r["sum_tok"] == sum(lens)
        assert r["pad_waste_bucketed"] == max(lens) * len(lens) - sum(lens)
        assert r["pad_waste_naive"] == 512 * len(lens) - sum(lens)
        # bucketing can only reduce padding
        assert r["pad_waste_bucketed"] <= r["pad_waste_naive"]


def test_levene_matches_scipy_free_python(spark, sf_dir):
    con = _con(sf_dir)
    vals = con.execute(
        "SELECT event_type, CAST(floor(value*100+0.5) AS BIGINT)"
        " FROM events"
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for et, c in vals:
        groups.setdefault(et, []).append(c)
    zs = []
    for v in groups.values():
        arr = np.array(v, dtype=np.float64)
        z = np.floor(np.abs(arr - arr.mean()) * 100 + 0.5)
        zs.append(z)
    k = len(zs)
    n_all = sum(len(z) for z in zs)
    grand = sum(z.sum() for z in zs) / n_all
    ssb = sum(len(z) * (z.mean() - grand) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    w = (ssb / (k - 1)) / (ssw / (n_all - k))
    r = REGISTRY["stat_levene"].build(spark, sf_dir).collect()[0]
    assert r["k"] == k and r["n_all"] == n_all
    assert abs(r["w_stat"] - w) <= max(1e-3, 1e-3 * abs(w))
    assert r["heteroscedastic"] == (w > 2.372)


def test_hubness_stats_match_numpy(spark, sf_dir):
    con = _con(sf_dir)
    emb = con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    vecs = {v: np.array(e, dtype=np.float64) for v, e in emb}
    ids = sorted(vecs)
    M = np.stack([vecs[i] for i in ids])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    topk: dict[int, list[int]] = {}
    for qi, qid in enumerate(ids):
        order = sorted(
            (i for i in range(len(ids)) if i != qi),
            key=lambda i: (-S[qi, i], ids[i]),
        )[:5]
        topk[qid] = [ids[i] for i in order]
    indeg = Counter()
    for qid, ns in topk.items():
        indeg.update(ns)
    ks = np.array([indeg.get(v, 0) for v in ids], dtype=np.float64)
    skew = (((ks - ks.mean()) ** 3).mean()) / (ks.var() ** 1.5)
    n_recip = sum(
        1 for q, ns in topk.items() for c in ns if q in topk[c]
    )
    r = REGISTRY["embed_hubness_stats"].build(spark, sf_dir).collect()[0]
    assert r["n"] == len(ids)
    assert r["max_k"] == int(ks.max())
    assert r["n_antihubs"] == int((ks == 0).sum())
    assert r["n_recip"] == n_recip
    assert abs(r["k_skewness"] - skew) <= 1e-3
    assert r["reciprocity_bps"] == n_recip * 10000 // (len(ids) * 5)


def test_threshold_sweep_is_monotone_and_consistent(spark, sf_dir):
    pairs = REGISTRY["dedup_minhash_relational"].build(
        spark, sf_dir
    ).collect()
    out = {r["tau_bp"]: r for r in
           REGISTRY["dedup_threshold_sweep"].build(spark, sf_dir)
           .collect()}
    assert set(out) == {625, 1250, 1875, 2500, 3750}
    prev = None
    for tau in sorted(out):
        r = out[tau]
        exp = [p for p in pairs if p["est_jaccard"] * 10000 >= tau]
        assert r["n_pairs"] == len(exp)
        assert r["n_docs_a"] == len({p["doc_a"] for p in exp})
        assert r["n_docs_b"] == len({p["doc_b"] for p in exp})
        if prev is not None:
            assert r["n_pairs"] <= prev  # monotone non-increasing in tau
        prev = r["n_pairs"]


def test_weibull_fit_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    spans = con.execute("""
        SELECT date_diff('day', CAST(min(ts) AS DATE),
               CAST(max(ts) AS DATE)) FROM events GROUP BY user_id
    """).fetchall()
    lives = [s for (s,) in spans]
    n_cohort = len(lives)
    xs, ys = [], []
    for t in range(1, 15):
        surv = sum(1 for l in lives if l >= t)
        if 0 < surv < n_cohort:
            xs.append(math.floor(math.log(t) * 1e6 + 0.5))
            ys.append(
                math.floor(math.log(-math.log(surv / n_cohort)) * 1e6 + 0.5)
            )
    r = REGISTRY["events_weibull_fit"].build(spark, sf_dir).collect()[0]
    assert r["n"] == len(xs)
    if len(xs) < 2:
        assert r["shape_k"] is None
        return
    x, y = np.array(xs, float), np.array(ys, float)
    n = len(x)
    slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    intercept = (y.sum() / 1e6 - slope * x.sum() / 1e6) / n
    assert abs(r["shape_k"] - slope) <= 1e-3
    assert abs(r["scale_days"] - math.exp(-intercept / slope)) <= max(
        1e-3, 1e-3 * abs(math.exp(-intercept / slope))
    )


def test_granger_matches_numpy_nested_ols(spark, sf_dir):
    con = _con(sf_dir)
    daily = con.execute("""
        SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT),
               count_if(event_type = 'click'),
               count_if(event_type = 'purchase')
        FROM events GROUP BY 1 ORDER BY 1
    """).fetchall()
    by_day = {d: (x, y) for d, x, y in daily}
    rows = []
    for d in sorted(by_day):
        if d - 1 in by_day:
            rows.append(
                (by_day[d][1], by_day[d - 1][1], by_day[d - 1][0])
            )
    yt = np.array([r[0] for r in rows], float)
    ylag = np.array([r[1] for r in rows], float)
    xlag = np.array([r[2] for r in rows], float)
    n = len(rows)
    Xr = np.column_stack([np.ones(n), ylag])
    Xf = np.column_stack([np.ones(n), ylag, xlag])
    br, *_ = np.linalg.lstsq(Xr, yt, rcond=None)
    bf, *_ = np.linalg.lstsq(Xf, yt, rcond=None)
    rss_r = float(((yt - Xr @ br) ** 2).sum())
    rss_f = float(((yt - Xf @ bf) ** 2).sum())
    fstat = (rss_r - rss_f) / (rss_f / (n - 3))
    r = REGISTRY["stat_granger_causality"].build(spark, sf_dir).collect()[0]
    assert r["n"] == n
    assert abs(r["f_stat"] - fstat) <= max(1e-3, 1e-3 * abs(fstat))
    assert r["x_granger_causes_y"] == (fstat > 4.225)


def test_group_by_all_matches_explicit_grouping(spark, sf_dir):
    from etl_cnc_spark.sql import run

    implicit = REGISTRY["sql_entry_group_by_all"].build(spark, sf_dir)
    explicit = run(spark, sf_dir, """
        SELECT o_orderpriority, o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents,
               CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS min_cents
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    """)
    li = {tuple(r) for r in implicit.collect()}
    le = {tuple(r) for r in explicit.collect()}
    assert li == le and len(li) > 0


def test_gbm_histogram_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END,
               hour(ts), isodow(CAST(ts AS DATE)) - 1,
               least(CAST(floor(value / 25.0) AS BIGINT), 19)
        FROM events
    """).fetchall()
    n_all = len(rows)
    pos = sum(r[0] for r in rows)
    p0 = pos / n_all
    from collections import defaultdict

    hists = {"hour": defaultdict(lambda: [0, 0]),
             "weekday": defaultdict(lambda: [0, 0]),
             "value_band": defaultdict(lambda: [0, 0])}
    for y, fh, fw, fb in rows:
        gq = math.floor((y - p0) * 1e9 + 0.5)
        for feat, b in (("hour", fh), ("weekday", fw), ("value_band", fb)):
            hists[feat][b][0] += 1
            hists[feat][b][1] += gq
    out: dict[tuple, dict] = {}
    for r in REGISTRY["ml_gbm_histogram"].build(spark, sf_dir).collect():
        out[(r["feature"], r["bin"])] = r
    h_unit = p0 * (1 - p0)
    for feat, hist in hists.items():
        bins = sorted(hist)
        nt = sum(hist[b][0] for b in bins)
        gt = sum(hist[b][1] for b in bins) / 1e9
        nl = 0
        glq = 0
        best = None
        gains = {}
        for b in bins:
            nl += hist[b][0]
            glq += hist[b][1]
            if nl < nt:
                gl = glq / 1e9
                gr = gt - gl
                gain = (gl * gl / (nl * h_unit + 1.0)
                        + gr * gr / ((nt - nl) * h_unit + 1.0)
                        - gt * gt / (nt * h_unit + 1.0))
                gains[b] = gain
                if best is None or gain > gains[best]:
                    best = b
        for b in bins:
            r = out[(feat, b)]
            assert r["n"] == hist[b][0]
            assert abs(r["g_q"] - hist[b][1]) <= hist[b][0]  # 1 ulp/term
            if b in gains:
                assert abs(r["gain"] - gains[b]) <= 1e-3
            assert r["is_best_split"] == (b == best)


def test_assortativity_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    con.execute(
        f"CREATE VIEW supplier AS SELECT *"
        f" FROM '{sf_dir}/supplier.parquet'"
    )
    edges = con.execute("""
        SELECT c.c_nationkey, s.s_nationkey, CAST(count(*) AS BIGINT)
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN '{}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2 HAVING c.c_nationkey <> s.s_nationkey
    """.format(sf_dir)).fetchall()
    from collections import defaultdict

    deg = defaultdict(int)
    for u, v, w in edges:
        deg[u] += w
        deg[v] += w
    ws = np.array([w for _, _, w in edges], float)
    dx = np.array([deg[u] for u, _, _ in edges], float)
    dy = np.array([deg[v] for _, v, _ in edges], float)
    sw = ws.sum()
    num = sw * (ws * dx * dy).sum() - (ws * dx).sum() * (ws * dy).sum()
    den = math.sqrt(
        (sw * (ws * dx * dx).sum() - (ws * dx).sum() ** 2)
        * (sw * (ws * dy * dy).sum() - (ws * dy).sum() ** 2)
    )
    emap = {(u, v): w for u, v, w in edges}
    w_recip = sum(
        min(w, emap[(v, u)]) for (u, v), w in emap.items()
        if (v, u) in emap
    )
    r = REGISTRY["graph_assortativity"].build(spark, sf_dir).collect()[0]
    assert r["total_weight"] == int(sw)
    assert r["w_recip"] == w_recip
    assert r["reciprocity_bps"] == w_recip * 10000 // int(sw)
    assert abs(r["assortativity"] - num / den) <= 1e-3
    assert -1.0 - 1e-9 <= r["assortativity"] <= 1.0 + 1e-9


def test_rocchio_feedback_consistency(spark, sf_dir):
    rows = REGISTRY["sim_rocchio_feedback"].build(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["n_overlap"] <= 5
        assert r["top1_before"] != r["qid"]
        assert r["top1_after"] != r["qid"]
    # feedback should not completely destroy neighborhoods: on a
    # near-isotropic corpus most queries keep at least one neighbor
    keep = sum(1 for r in rows if r["n_overlap"] >= 1)
    assert keep >= 10


def test_readability_matches_python_regex(spark, sf_dir):
    import re

    con = _con(sf_dir)
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    out = {r["doc_id"]: r for r in
           REGISTRY["text_readability"].build(spark, sf_dir).collect()}
    pat = re.compile(r"[aeiouy]+")
    for doc_id, text in docs:
        words = text.split(" ")
        syls = [len(pat.findall(w)) for w in words]
        r = out[doc_id]
        assert r["n_words"] == len(words)
        assert r["n_syllables"] == sum(syls)
        assert r["n_polysyllabic"] == sum(1 for s in syls if s >= 3)
        flesch = (206.835 - 1.015 * len(words)
                  - 84.6 * sum(syls) / len(words))
        assert abs(r["flesch_score"] - flesch) <= 1e-3


def test_mann_kendall_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    daily = con.execute(
        "SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))"
        " AS BIGINT), count(*) FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    ys = [y for _, y in daily]
    n = len(ys)
    s = sum(
        (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n) for j in range(i + 1, n)
    )
    tie = sum(
        c * (c - 1) * (2 * c + 5) for c in Counter(ys).values()
    )
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18
    sc = s - 1 if s > 0 else s + 1 if s < 0 else 0
    z = sc / math.sqrt(var)
    r = REGISTRY["stat_mann_kendall"].build(spark, sf_dir).collect()[0]
    assert r["n"] == n and r["s_stat"] == s
    assert abs(r["z"] - z) <= 1e-3
    assert r["trending"] == (abs(z) > 1.96)


def test_runs_test_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    daily = con.execute(
        "SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))"
        " AS BIGINT), count(*) FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    ys = [y for _, y in daily]
    sy = sorted(ys)
    med = sy[(len(sy) - 1) // 2]
    signs = [1 if y > med else 0 for y in ys if y != med]
    runs = 1 + sum(
        1 for a, b in zip(signs, signs[1:]) if a != b
    ) if signs else 0
    n = len(signs)
    na = sum(signs)
    nb = n - na
    mu = 2 * na * nb / n + 1
    var = 2 * na * nb * (2 * na * nb - n) / (n * n * (n - 1))
    z = (runs - mu) / math.sqrt(var)
    r = REGISTRY["stat_runs_test"].build(spark, sf_dir).collect()[0]
    assert r["runs"] == runs and r["n"] == n and r["n_above"] == na
    assert abs(r["z"] - z) <= 1e-3


def test_holt_winters_matches_python_recurrence(spark, sf_dir):
    con = _con(sf_dir)
    daily = con.execute("""
        WITH bounds AS (
            SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
            FROM events
        ), days AS (
            SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
                AS d FROM bounds
        ), types AS (SELECT DISTINCT event_type FROM events),
        daily AS (
            SELECT CAST(ts AS DATE) AS d, event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT g.event_type,
               datediff('day', (SELECT d0 FROM bounds), g.d),
               COALESCE(daily.n, 0)
        FROM (SELECT d, event_type FROM days CROSS JOIN types) g
        LEFT JOIN daily ON g.d = daily.d AND g.event_type = daily.event_type
        ORDER BY 1, 2
    """).fetchall()
    series: dict[str, list[float]] = {}
    for et, t, y in daily:
        series.setdefault(et, []).append(float(y))
    out: dict[tuple, dict] = {}
    for r in (REGISTRY["events_holt_winters"]
              .build(spark, sf_dir).collect()):
        out[(r["event_type"], r["h"])] = r
    a, b, g = 0.5, 0.3, 0.4
    for et, ys in series.items():
        n = len(ys)
        if n < 15:
            assert not any(k[0] == et for k in out)
            continue
        lvl = sum(ys[:7]) / 7
        tr = (sum(ys[7:14]) - sum(ys[:7])) / 49
        s = [ys[i] - lvl for i in range(7)]
        sse = 0.0
        for t in range(7, n):
            so = s[t % 7]
            err = ys[t] - (lvl + tr + so)
            lnew = a * (ys[t] - so) + (1 - a) * (lvl + tr)
            tr = b * (lnew - lvl) + (1 - b) * tr
            s[t % 7] = g * (ys[t] - lnew) + (1 - g) * so
            lvl = lnew
            sse += err * err
        for h in range(1, 8):
            r = out[(et, h)]
            fc = lvl + h * tr + s[(n - 1 + h) % 7]
            assert r["n"] == n
            assert abs(r["forecast"] - fc) <= 1e-3
            assert abs(r["level"] - lvl) <= 1e-3
            assert abs(r["trend"] - tr) <= 1e-3
            assert abs(r["mse"] - sse / (n - 7)) <= 1e-3


def test_friedman_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    daily = con.execute(
        "SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))"
        " AS BIGINT), event_type, count(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    blocks: dict[int, list[tuple]] = {}
    for d, et, y in daily:
        blocks.setdefault(d, []).append((et, y))
    rank_sums: Counter = Counter()
    n_blocks = 0
    k = len({et for _, et, _ in daily})
    for d, cells in blocks.items():
        if len(cells) < k:
            pass  # partial blocks still rank among present types
        ys = sorted(y for _, y in cells)
        for et, y in cells:
            lo = sum(1 for v in ys if v < y)
            ties = sum(1 for v in ys if v == y)
            midrank = lo + (ties + 1) / 2
            rank_sums[et] += midrank
    n = len(blocks)
    chi2 = (
        12 / (n * k * (k + 1))
        * sum(r * r for r in rank_sums.values())
        - 3 * n * (k + 1)
    )
    r = REGISTRY["stat_friedman_test"].build(spark, sf_dir).collect()[0]
    assert r["k"] == k and r["n"] == n
    assert abs(r["chi2"] - chi2) <= 1e-3
    assert r["significant"] == (chi2 > 9.488)


def test_class_weights_match_python(spark, sf_dir):
    con = _con(sf_dir)
    counts = dict(con.execute(
        "SELECT event_type, count(*) FROM events GROUP BY 1"
    ).fetchall())
    k = len(counts)
    n_all = sum(counts.values())
    beta = 0.999
    raw = {et: (1 - beta) / (1 - beta ** n) for et, n in counts.items()}
    z = sum(raw.values())
    out = {r["event_type"]: r for r in
           REGISTRY["ml_class_weights"].build(spark, sf_dir).collect()}
    assert set(out) == set(counts)
    for et, n in counts.items():
        r = out[et]
        assert r["n"] == n
        assert abs(r["w_invfreq"] - n_all / (k * n)) <= 1e-3
        assert abs(r["w_effective"] - raw[et] * k / z) <= 1e-3
    # normalized effective weights sum to ~k
    assert abs(sum(r["w_effective"] for r in out.values()) - k) <= 1e-2


def test_kruskal_wallis_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    vals = con.execute(
        "SELECT event_type, CAST(floor(value*100+0.5) AS BIGINT)"
        " FROM events"
    ).fetchall()
    xs = [v for _, v in vals]
    order = sorted(xs)
    # midranks via counts
    first = {}
    cnt = Counter(order)
    pos = 0
    midrank = {}
    for v in sorted(cnt):
        midrank[v] = pos + (cnt[v] + 1) / 2
        pos += cnt[v]
    groups: dict[str, list[float]] = {}
    for et, v in vals:
        groups.setdefault(et, []).append(midrank[v])
    n = len(xs)
    k = len(groups)
    h = 12 / (n * (n + 1)) * sum(
        (sum(rs)) ** 2 / len(rs) for rs in groups.values()
    ) - 3 * (n + 1)
    tie3 = sum(c ** 3 - c for c in cnt.values())
    h /= 1 - tie3 / (n ** 3 - n)
    r = REGISTRY["stat_kruskal_wallis"].build(spark, sf_dir).collect()[0]
    assert r["n"] == n and r["k"] == k
    assert abs(r["h_stat"] - h) <= max(1e-3, 1e-4 * abs(h))
    assert r["significant"] == (h > 9.488)
