"""Independent-recomputation properties for the round-10 wave-A keys
(SPRT, Holm step-down, soundex, Fellegi-Sunter linkage, Adamic-Adar,
Erlang C) — a third engine (plain Python / duckdb on the raw parquet)
recomputes each statistic from scratch."""

from __future__ import annotations

import math
from statistics import NormalDist

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


# ------------------------------------------------------------------ SPRT


def test_sprt_matches_sequential_walk(spark, sf_dir):
    from etl_cnc_spark.operators.stats import _SPRT_P0, _SPRT_P1

    rows = duckdb.execute(
        f"""
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        FROM '{sf_dir}/events.parquet' ORDER BY event_id
        """
    ).fetchall()
    xs = [r[0] for r in rows]
    p0, p1 = float(_SPRT_P0), float(_SPRT_P1)
    l1, l0 = math.log(p1 / p0), math.log((1 - p1) / (1 - p0))
    hi, lo = math.log(19.0), -math.log(19.0)
    llr = 0.0
    n_dec, decision = None, "continue"
    cum = 0
    for i, x in enumerate(xs, start=1):
        cum += x
        llr = cum * l1 + (i - cum) * l0
        if llr >= hi:
            n_dec, decision = i, "accept_h1"
            break
        if llr <= lo:
            n_dec, decision = i, "accept_h0"
            break
    row = REGISTRY["stat_sprt_ab"].build(spark, sf_dir).collect()[0]
    assert row["n_total"] == len(xs)
    assert row["x_total"] == sum(xs)
    assert row["decision"] == decision
    if n_dec is not None:
        assert row["n_decision"] == n_dec
        assert abs(row["llr_at_decision"] - llr) < 1e-4
        # a sequential test stops the moment it crosses: one step
        # earlier the walk was strictly inside the continuation band
        prev_cum = sum(xs[: n_dec - 1])
        prev_llr = prev_cum * l1 + (n_dec - 1 - prev_cum) * l0
        assert lo < prev_llr < hi


# ------------------------------------------------------- Holm step-down


def test_holm_stepdown_matches_python(spark, sf_dir):
    from etl_cnc_spark.operators.stats import _HOLM_P0

    rows = duckdb.execute(
        f"""
        SELECT event_type, count(*),
               count_if(EXTRACT(hour FROM ts) >= 18)
        FROM '{sf_dir}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    p0 = float(_HOLM_P0)
    m = len(rows)
    tests = []
    for et, n, x in rows:
        z = (x / n - p0) / math.sqrt(p0 * (1 - p0) / n)
        tests.append((et, n, x, z))
    tests.sort(key=lambda t: (-abs(t[3]), t[0]))
    nd = NormalDist()
    expected = {}
    alive = True
    for i, (et, n, x, z) in enumerate(tests, start=1):
        thr = nd.inv_cdf(1.0 - 0.025 / (m - i + 1))
        alive = alive and abs(z) >= thr
        expected[et] = (n, x, z, i, thr, alive)
    out = {
        r["event_type"]: r
        for r in REGISTRY["stat_holm_stepdown"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(expected)
    for et, (n, x, z, rk, thr, rej) in expected.items():
        r = out[et]
        assert r["n"] == n and r["x_evening"] == x
        assert abs(r["z_stat"] - z) < 1e-4
        assert r["rk"] == rk
        # Acklam's approximation vs the exact inverse CDF: < 1.15e-9
        # relative, far inside the q4 quantum
        assert abs(r["z_crit"] - thr) < 1e-4
        assert r["rejected_holm"] == rej
    # step-down structure: the rejected set is a prefix of the ranking
    ranks_rej = sorted(r["rk"] for r in out.values() if r["rejected_holm"])
    assert ranks_rej == list(range(1, len(ranks_rej) + 1))


# ------------------------------------------------------------- soundex


def _soundex_py(word: str) -> str:
    codes = {}
    for letters, d in (
        ("bfpv", "1"),
        ("cgjkqsxz", "2"),
        ("dt", "3"),
        ("l", "4"),
        ("mn", "5"),
        ("r", "6"),
        ("aeiouy", "0"),
    ):
        for ch in letters:
            codes[ch] = d
    seq = [codes[c] for c in word.lower() if c in codes]  # h/w dropped
    out = []
    prev = codes.get(word[0].lower())
    started = word[0].lower() in codes
    # walk positions after the first character's (possibly dropped) code
    seq_after = seq[1:] if started else seq
    for code in seq_after:
        if code != "0" and code != prev:
            out.append(code)
        prev = code
    return word[0].upper() + "".join(out[:3]).ljust(3, "0")


def test_soundex_classic_vectors():
    for w, sx in [
        ("ashcraft", "A261"),
        ("tymczak", "T522"),
        ("pfister", "P236"),
        ("honeyman", "H555"),
        ("wheel", "W400"),
        ("hugh", "H200"),
        ("woolworth", "W463"),
        ("lee", "L000"),
        ("a", "A000"),
        ("jackson", "J250"),
    ]:
        assert _soundex_py(w) == sx, w


def test_fn_soundex_matches_python(spark, sf_dir):
    rows = REGISTRY["fn_soundex"].build(spark, sf_dir).collect()
    assert rows
    total = duckdb.execute(
        f"""
        SELECT count(*) FROM (
            SELECT unnest(string_split(p_name, ' '))
            FROM '{sf_dir}/part.parquet')
        """
    ).fetchone()[0]
    assert sum(r["n_parts"] for r in rows) == total
    for r in rows:
        assert r["sx"] == _soundex_py(r["word"]), r["word"]


# ----------------------------------------------- Fellegi-Sunter linkage


def test_record_linkage_matches_python(spark, sf_dir):
    from etl_cnc_spark.operators.etl import (
        _FS_M_BAL,
        _FS_M_SEG,
        _FS_M_TAIL,
        _FS_MATCH_T,
        _FS_U_BAL,
        _FS_U_SEG,
        _FS_U_TAIL,
    )

    cust = duckdb.execute(
        f"""
        SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal, c_name
        FROM '{sf_dir}/customer.parquet'
        """
    ).fetchall()

    def w(agree, m, u):
        m, u = float(m), float(u)
        return math.log2(m / u) if agree else math.log2((1 - m) / (1 - u))

    a_side = [
        (k, nk, seg, bal, name[-3:])
        for k, nk, seg, bal, name in cust
        if k % 2 == 0
    ]
    # Python round() is banker's; replicate SQL round-half-away
    b_side = [
        (k, nk, seg, math.floor(bal + 0.5) if bal >= 0 else math.ceil(bal - 0.5),
         name[-3:])
        for k, nk, seg, bal, name in cust
        if k % 3 == 0
    ]
    expected = {}
    for ak, ank, aseg, abal, at3 in a_side:
        for bk, bnk, bseg, bbal, bt3 in b_side:
            if ank != bnk or math.floor(abal / 500) != math.floor(bbal / 500):
                continue
            weight = (
                w(aseg == bseg, _FS_M_SEG, _FS_U_SEG)
                + w(abs(abal - bbal) <= 0.5, _FS_M_BAL, _FS_U_BAL)
                + w(at3 == bt3, _FS_M_TAIL, _FS_U_TAIL)
            )
            if weight >= 0.0:
                cls = "match" if weight >= float(_FS_MATCH_T) else "possible"
                expected[(ak, bk)] = (round(weight, 4), cls)
    got = {
        (r["a_key"], r["b_key"]): (r["fs_weight"], r["fs_class"])
        for r in REGISTRY["etl_record_linkage_fs"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k, (wt, cls) in expected.items():
        assert abs(got[k][0] - wt) < 2e-4 and got[k][1] == cls
    # every same-entity pair (custkey % 6 == 0 appears on both sides)
    # is a full-agreement 'match' — rounding keeps it in its own block
    # unless the rounded balance crosses a 500 boundary
    for k, nk, seg, bal, name in cust:
        if k % 6 == 0:
            rb = math.floor(bal + 0.5) if bal >= 0 else math.ceil(bal - 0.5)
            if math.floor(bal / 500) == math.floor(rb / 500):
                assert got[(k, k)][1] == "match"


# --------------------------------------------------------- Adamic-Adar


def test_adamic_adar_matches_python(spark, sf_dir):
    from etl_cnc_spark.operators.graph import COP_MIN_SUP

    occ = duckdb.execute(
        f"""
        SELECT DISTINCT l_orderkey, l_partkey FROM '{sf_dir}/lineitem.parquet'
        """
    ).fetchall()
    by_order: dict[int, list[int]] = {}
    for ok, pk in occ:
        by_order.setdefault(ok, []).append(pk)
    sup: dict[tuple[int, int], int] = {}
    for parts in by_order.values():
        parts = sorted(parts)
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                e = (parts[i], parts[j])
                sup[e] = sup.get(e, 0) + 1
    edges = {e for e, s in sup.items() if s >= COP_MIN_SUP}
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    expected = {}
    nodes = sorted(nbrs)
    for z in nodes:
        zn = sorted(nbrs[z])
        for i in range(len(zn)):
            for j in range(i + 1, len(zn)):
                pa, pb = zn[i], zn[j]
                if (pa, pb) in edges:
                    continue
                cn, aaq = expected.get((pa, pb), (0, 0))
                expected[(pa, pb)] = (
                    cn + 1,
                    aaq + round(1e9 / math.log(len(nbrs[z]))),
                )
    expected = {
        k: (cn, round(aaq / 1e9, 4))
        for k, (cn, aaq) in expected.items()
        if cn >= 2
    }
    got = {
        (r["part_a"], r["part_b"]): (r["common_neighbors"], r["adamic_adar"])
        for r in REGISTRY["graph_adamic_adar"].build(spark, sf_dir).collect()
    }
    assert got == expected


# ------------------------------------------------------------ Erlang C


def test_erlang_c_matches_python(spark, sf_dir):
    from etl_cnc_spark.operators.analytics import _EC_AHT_S, _EC_LEVELS

    n, t0, t1 = duckdb.execute(
        f"""
        SELECT count_if(event_type = 'purchase'),
               epoch_us(min(ts)), epoch_us(max(ts))
        FROM '{sf_dir}/events.parquet'
        """
    ).fetchone()
    aht = float(_EC_AHT_S)
    hours = (t1 - t0) / 3.6e9
    lam = n / hours
    a = lam * (aht / 3600.0)
    cmin = math.floor(a) + 1
    rows = REGISTRY["events_erlang_c"].build(spark, sf_dir).collect()
    assert len(rows) == _EC_LEVELS
    got = {r["agents"]: r for r in rows}
    assert sorted(got) == list(range(cmin, cmin + _EC_LEVELS))
    prev_wait, prev_sl = 1.1, -0.1
    for c in sorted(got):
        b = 1.0
        for k in range(1, c + 1):
            b = a * b / (k + a * b)
        ec = b / (1.0 - (a / c) * (1.0 - b))
        spare = c * (3600.0 / aht) - lam
        r = got[c]
        assert abs(r["offered_erlangs"] - a) < 1e-4
        assert abs(r["occupancy"] - a / c) < 1e-4
        assert abs(r["prob_wait"] - ec) < 1e-4
        assert abs(r["asa_seconds"] - ec / spare * 3600.0) < 1e-4
        assert (
            abs(r["service_level_20s"] - (1.0 - ec * math.exp(-spare * 20 / 3600)))
            < 1e-4
        )
        # monotone structure: more agents => less waiting, better SL
        # (non-strict: q4 rounds a tiny load's tail probabilities to
        # the same quantum, e.g. 0.0, for consecutive levels)
        assert r["prob_wait"] <= prev_wait
        assert r["service_level_20s"] >= prev_sl
        assert 0.0 <= r["occupancy"] < 1.0
        prev_wait, prev_sl = r["prob_wait"], r["service_level_20s"]
