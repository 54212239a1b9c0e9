"""Independent-recomputation properties for the thirteenth round-5
wave (nearest as-of join, exact Spearman rho)."""

from __future__ import annotations

import bisect

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_asof_nearest_matches_python_bisect(spark, sf_dir):
    con = duckdb.connect()
    orders = con.execute(
        f"SELECT o_custkey, epoch_us(o_orderdate) "
        f"FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    by_cust: dict[int, list[int]] = {}
    for ck, ot in orders:
        by_cust.setdefault(ck, []).append(ot)
    for v in by_cust.values():
        v.sort()
    events = con.execute(
        f"SELECT event_id, user_id, epoch_us(ts) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    out = {r["event_id"]: r for r in
           REGISTRY["join_asof_nearest"].build(spark, sf_dir).collect()}
    n_expected = 0
    for eid, uid, t in events:
        ts = by_cust.get(uid)
        if not ts:
            assert eid not in out
            continue
        n_expected += 1
        i = bisect.bisect_right(ts, t)
        bt = ts[i - 1] if i > 0 else None
        ft = ts[i] if i < len(ts) else None
        if bt is not None and (ft is None or t - bt <= ft - t):
            nearest, delta, direction = bt, t - bt, "backward"
        else:
            nearest, delta, direction = ft, ft - t, "forward"
        r = out[eid]
        assert r["nearest_order_us"] == nearest
        assert r["delta_us"] == delta
        assert r["direction"] == direction
        assert r["delta_us"] >= 0
    assert len(out) == n_expected


def test_spearman_matches_numpy_rankdata(spark, sf_dir):
    """rho recomputed with numpy argsort-based midranks (the fixture
    prices are synthetic and uncorrelated with quantity, so the
    check is numeric agreement + bounds, not a domain effect)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT l_returnflag, CAST(l_quantity AS BIGINT), "
        f"CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    by_flag: dict[str, list[tuple[int, int]]] = {}
    for fl, x, y in rows:
        by_flag.setdefault(fl, []).append((x, y))

    def midranks(vals: list[int]) -> np.ndarray:
        arr = np.asarray(vals, dtype=np.float64)
        order = np.argsort(arr, kind="mergesort")
        ranks = np.empty(len(arr))
        sorted_vals = arr[order]
        i = 0
        while i < len(arr):
            j = i
            while j < len(arr) and sorted_vals[j] == sorted_vals[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2
            i = j
        return ranks

    out = {r["l_returnflag"]: r for r in
           REGISTRY["stat_spearman"].build(spark, sf_dir).collect()}
    assert set(out) == set(by_flag)
    for fl, pts in by_flag.items():
        rx = midranks([p[0] for p in pts])
        ry = midranks([p[1] for p in pts])
        rho = float(np.corrcoef(rx, ry)[0, 1])
        r = out[fl]
        assert r["n"] == len(pts)
        assert abs(r["spearman_rho"] - rho) <= 1e-3
        assert -1.0 - 1e-9 <= r["spearman_rho"] <= 1.0 + 1e-9


def test_vocab_overlap_matches_python_sets(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    vocab: dict[str, set[str]] = {}
    for src, text in rows:
        vocab.setdefault(src, set()).update(text.split(" "))
    out = REGISTRY["text_vocab_overlap"].build(spark, sf_dir).collect()
    srcs = sorted(vocab)
    expected = {(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]
                if vocab[a] & vocab[b]}
    got = {(r["src_a"], r["src_b"]): r for r in out}
    assert set(got) == expected
    for (a, b), r in got.items():
        inter = len(vocab[a] & vocab[b])
        union = len(vocab[a] | vocab[b])
        assert r["vocab_a"] == len(vocab[a]) and r["vocab_b"] == len(vocab[b])
        assert r["shared"] == inter
        assert abs(r["jaccard"] - inter / union) <= 1e-3
        assert abs(
            r["containment"] - inter / min(len(vocab[a]), len(vocab[b]))
        ) <= 1e-3


def test_rolling_slope_matches_numpy_polyfit(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH bounds AS (SELECT min(CAST(ts AS DATE)) d0 FROM '{sf_dir}/events.parquet')
        SELECT event_type, datediff('day', (SELECT d0 FROM bounds),
               CAST(ts AS DATE)), count(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    series: dict[str, dict[int, int]] = {}
    tmax = 0
    for et, t, n in rows:
        series.setdefault(et, {})[t] = n
        tmax = max(tmax, t)
    out = REGISTRY["events_rolling_slope"].build(spark, sf_dir).collect()
    got = {(r["event_type"], r["t"]): r for r in out}
    W = 14
    n_expected = 0
    for et, pts in series.items():
        dense = [pts.get(t, 0) for t in range(tmax + 1)]
        for t in range(W - 1, tmax + 1):
            n_expected += 1
            ys = dense[t - W + 1: t + 1]
            xs = list(range(t - W + 1, t + 1))
            slope = float(np.polyfit(xs, ys, 1)[0])
            r = got[(et, t)]
            assert r["y"] == dense[t]
            assert abs(r["slope"] - slope) <= 1e-3
    assert len(got) == n_expected


def test_volatility_band_matches_numpy(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH bounds AS (SELECT min(CAST(ts AS DATE)) d0 FROM '{sf_dir}/events.parquet')
        SELECT event_type, datediff('day', (SELECT d0 FROM bounds),
               CAST(ts AS DATE)), count(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    series: dict[str, dict[int, int]] = {}
    tmax = 0
    for et, t, n in rows:
        series.setdefault(et, {})[t] = n
        tmax = max(tmax, t)
    out = REGISTRY["events_volatility_band"].build(spark, sf_dir).collect()
    got = {(r["event_type"], r["t"]): r for r in out}
    W, K = 14, 2.0
    n_expected = 0
    for et, pts in series.items():
        dense = [pts.get(t, 0) for t in range(tmax + 1)]
        for t in range(W, tmax + 1):
            n_expected += 1
            prior = np.asarray(dense[t - W: t], dtype=np.float64)
            mu, sigma = float(prior.mean()), float(prior.std())
            r = got[(et, t)]
            assert r["y"] == dense[t]
            assert abs(r["mean_trailing"] - mu) <= 1e-3
            assert abs(r["sigma_trailing"] - sigma) <= 1e-3
            assert r["breakout_up"] == (dense[t] > mu + K * sigma)
            assert r["breakout_down"] == (dense[t] < mu - K * sigma)
            # band is symmetric around the mean
            assert abs((r["band_hi"] + r["band_lo"]) / 2 - mu) <= 2e-3
    assert len(got) == n_expected
