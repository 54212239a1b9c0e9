"""Round-11 wave B: Hampel filter, Bradley-Terry, Jaro-Winkler, GMM
EM step — from-scratch Python recomputations (the third engine next
to Spark/DuckDB hash parity).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from etl_cnc_spark.registry import REGISTRY, load_all

load_all()

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


# ------------------------------------------------------------------
# Hampel filter


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_hampel_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"""
        SELECT CAST(ts AS DATE) AS d,
               CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
        FROM '{sf_dir}/events.parquet' WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    days = [r[0] for r in rows]
    vals = [r[1] for r in rows]
    out = {
        r["day_n"]: r
        for r in REGISTRY["stat_hampel_filter"].build(spark, sf_dir).collect()
    }
    assert len(out) == len(rows)
    n_out = 0
    for i, (d, x) in enumerate(zip(days, vals)):
        w = vals[max(0, i - 3) : i + 4]
        s = sorted(w)
        n = len(s)
        med2 = s[(n + 1) // 2 - 1] + s[(n + 2) // 2 - 1]
        ds = sorted(abs(2 * v - med2) for v in s)
        mad2 = ds[(n + 1) // 2 - 1] + ds[(n + 2) // 2 - 1]
        flag = 20000 * abs(2 * x - med2) > 44478 * mad2
        # equivalent float form: |x - med| > 3 * 1.4826 * MAD
        med, madv = med2 / 2.0, mad2 / 4.0
        assert flag == (abs(x - med) * 20000 > 44478 * 2 * madv)
        day_n = (d - __import__("datetime").date(1970, 1, 1)).days
        r = out[day_n]
        assert r["rev_c"] == x
        assert r["n_window"] == n
        assert r["med2"] == med2
        assert r["mad2"] == mad2
        assert r["is_outlier"] == flag
        n_out += flag
    # sanity: the filter flags a minority of days
    assert n_out <= len(rows) // 2


# ------------------------------------------------------------------
# Bradley-Terry


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bradley_terry_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"""
        SELECT user_id, event_type, count(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    types = sorted({r[1] for r in rows})
    tix = {t: i for i, t in enumerate(types)}
    per_user = defaultdict(lambda: [0] * len(types))
    for u, t, c in rows:
        per_user[u][tix[t]] = c
    T = len(types)
    wins = [[0] * T for _ in range(T)]
    for cnts in per_user.values():
        for i in range(T):
            for j in range(i + 1, T):
                if cnts[i] > cnts[j]:
                    wins[i][j] += 1
                elif cnts[j] > cnts[i]:
                    wins[j][i] += 1
    p = [1.0] * T
    for _ in range(40):
        q = []
        for i in range(T):
            W = sum(wins[i])
            if W == 0:
                q.append(0.0)
                continue
            t = 0.0
            for j in range(T):
                if j == i:
                    t += 0.0
                    continue
                m = wins[i][j] + wins[j][i]
                t += 0.0 if m == 0 else float(m) / (p[i] + p[j])
            q.append(float(W) / t)
        p = q
    s = 0.0
    for v in p:
        s += v
    out = {
        r["event_type"]: r
        for r in REGISTRY["stat_bradley_terry"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(types)
    for t, i in tix.items():
        r = out[t]
        assert r["wins"] == sum(wins[i])
        assert r["comparisons"] == sum(
            wins[i][j] + wins[j][i] for j in range(T)
        )
        assert abs(r["strength"] - p[i] / s) < 1e-4
    # strengths are a normalized distribution
    assert abs(sum(r["strength"] for r in out.values()) - 1.0) < 5e-4
    # MM fixed point: more wins per comparison => higher strength
    ranked = sorted(out.values(), key=lambda r: -r["strength"])
    assert ranked[0]["wins"] / ranked[0]["comparisons"] >= (
        ranked[-1]["wins"] / ranked[-1]["comparisons"]
    )


# ------------------------------------------------------------------
# Jaro-Winkler


def _jw_python(s, t):
    if s == t:
        return 1.0, 1.0
    l1, l2 = len(s), len(t)
    if l1 == 0 or l2 == 0:
        return 0.0, 0.0
    win = max(max(l1, l2) // 2 - 1, 0)
    used = [False] * l2
    ii, jj = [], []
    for i in range(l1):
        for j in range(max(0, i - win), min(l2, i + win + 1)):
            if not used[j] and t[j] == s[i]:
                used[j] = True
                ii.append(i)
                jj.append(j)
                break
    m = len(ii)
    if m == 0:
        return 0.0, 0.0
    sj = sorted(jj)
    diff = sum(1 for k in range(m) if s[ii[k]] != t[sj[k]])
    jaro = (m / l1 + m / l2 + (m - diff // 2) / m) / 3.0
    prefix = 0
    for k in range(min(4, l1, l2)):
        if s[k] == t[k]:
            prefix += 1
        else:
            break
    jw = jaro + prefix * 0.1 * (1.0 - jaro) if jaro > 0.7 else jaro
    return jaro, jw


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_jaro_winkler_matches_python(spark, sf_dir):
    out = REGISTRY["fn_jaro_winkler"].build(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        jaro, jw = _jw_python(r["s1"], r["s2"])
        assert abs(r["jaro"] - jaro) < 1e-4, (r["s1"], r["s2"])
        assert abs(r["jaro_winkler"] - jw) < 1e-4, (r["s1"], r["s2"])
        assert r["jaro_winkler"] >= r["jaro"] - 1e-9


def test_jaro_winkler_classic_vectors(spark, tmp_path):
    """The textbook vectors, cross-checked against DuckDB's native
    implementation AND hand-known values on a synthetic corpus."""
    cases = [
        ("martha marhta", 0.9444, 0.9611),
        ("dixon dicksonx", 0.7667, 0.8133),
        ("jellyfish smellyfish", 0.8962, 0.8962),
        ("dwayne duane", 0.8222, 0.84),
        ("same same", 1.0, 1.0),
        ("abc xyz", 0.0, 0.0),
    ]
    spark.createDataFrame(
        [(i, txt, "en", "web", len(txt)) for i, (txt, _, _) in enumerate(cases)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in REGISTRY["fn_jaro_winkler"].build(spark, str(tmp_path)).collect()
    }
    for i, (txt, jaro, jw) in enumerate(cases):
        assert abs(out[i]["jaro"] - jaro) < 1e-4, txt
        assert abs(out[i]["jaro_winkler"] - jw) < 1e-4, txt
        s1, s2 = txt.split(" ")[0], txt.split(" ")[-1]
        dk = duckdb.execute(
            "SELECT jaro_similarity(?, ?), jaro_winkler_similarity(?, ?)",
            [s1, s2, s1, s2],
        ).fetchone()
        assert abs(out[i]["jaro"] - dk[0]) < 1e-4, txt
        assert abs(out[i]["jaro_winkler"] - dk[1]) < 1e-4, txt


# ------------------------------------------------------------------
# GMM EM step


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_gmm_em_step_matches_python(spark, sf_dir):
    vals = [
        r[0]
        for r in duckdb.execute(
            f"""
            SELECT CAST(floor(value * 100 + 0.5) AS BIGINT)
            FROM '{sf_dir}/events.parquet' WHERE event_type = 'purchase'
            """
        ).fetchall()
    ]
    bins = Counter(vals)
    n = len(vals)
    sv = sum(vals)
    svv = sum(v * v for v in vals)
    mc = sv / n
    sdc = math.sqrt((svv - sv * sv / n) / (n - 1))
    mu1c, mu2c = mc - sdc, mc + sdc
    Q = 1_000_000_000
    n1 = n2 = s1 = s2 = q1 = q2 = 0
    for v, nb in bins.items():
        p1 = math.exp(-(((v - mu1c) / sdc) ** 2) / 2.0)
        p2 = math.exp(-(((v - mu2c) / sdc) ** 2) / 2.0)
        r1q = math.floor(p1 / (p1 + p2) * Q + 0.5)
        r2q = Q - r1q
        n1 += r1q * nb
        n2 += r2q * nb
        s1 += r1q * nb * v
        s2 += r2q * nb * v
        q1 += r1q * nb * v * v
        q2 += r2q * nb * v * v
    r = REGISTRY["ml_gmm_em_step"].build(spark, sf_dir).collect()[0]
    assert r["n"] == n
    w1, w2 = n1 / (Q * n), n2 / (Q * n)
    mu1, mu2 = s1 / n1 / 100.0, s2 / n2 / 100.0
    sg1 = math.sqrt(q1 / n1 - (s1 / n1) ** 2) / 100.0
    sg2 = math.sqrt(q2 / n2 - (s2 / n2) ** 2) / 100.0
    assert abs(r["w1"] - w1) < 1e-4
    assert abs(r["w2"] - w2) < 1e-4
    assert abs(r["mu1"] - mu1) < 1e-4
    assert abs(r["mu2"] - mu2) < 1e-4
    assert abs(r["sigma1"] - sg1) < 1e-4
    assert abs(r["sigma2"] - sg2) < 1e-4
    # EM structure: weights sum to 1 and are proper, mu1 < mu2 (split
    # init keeps the component order), sigmas positive and bounded by
    # the data range
    assert abs(r["w1"] + r["w2"] - 1.0) < 1e-6
    assert 0.0 < r["w1"] < 1.0 and 0.0 < r["w2"] < 1.0
    assert r["mu1"] < r["mu2"]
    rng = (max(vals) - min(vals)) / 100.0
    assert 0.0 < r["sigma1"] < rng and 0.0 < r["sigma2"] < rng
