"""Independent-recomputation properties for the fifth round-5
operator wave (Poisson bootstrap CI, closed-form OLS, Welch t-test,
preference pairs, tokenizer fertility) — plain-Python / numpy
references over the SAME parquet inputs, mirroring the earlier
test_r5_wave*_props.py files."""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_linreg_multi_matches_numpy_lstsq(spark, sf_dir):
    """The Cramer's-rule solve must agree with numpy's QR-based
    lstsq on the same design matrix — a genuinely independent
    numerical path (no normal equations in the reference)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, hour(ts), isodow(ts) - 1, "
        f"CAST(floor(value*100 + 0.5) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    by_type: dict[str, list[tuple[int, int, int]]] = {}
    for et, x1, x2, y in rows:
        by_type.setdefault(et, []).append((x1, x2, y))
    out = {
        r["event_type"]: r
        for r in REGISTRY["stat_linreg_multi"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(by_type)
    for et, pts in by_type.items():
        arr = np.array(pts, dtype=float)
        X = np.column_stack([np.ones(len(arr)), arr[:, 0], arr[:, 1]])
        y = arr[:, 2]
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        r = out[et]
        assert abs(r["intercept"] - beta[0] / 100.0) <= 1e-3
        assert abs(r["beta_hour"] - beta[1] / 100.0) <= 1e-3
        assert abs(r["beta_weekday"] - beta[2] / 100.0) <= 1e-3
        pred = X @ beta
        sse = float(((y - pred) ** 2).sum())
        sst = float(((y - y.mean()) ** 2).sum())
        assert abs(r["r2"] - (1 - sse / sst)) <= 1e-3
        assert r["n"] == len(pts)


def test_welch_ttest_matches_python(spark, sf_dir):
    """t statistic and Satterthwaite df recomputed from per-arm
    lists with plain float accumulation."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, user_id % 2, "
        f"CAST(floor(value*100 + 0.5) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    arms: dict[tuple[str, int], list[int]] = {}
    for et, arm, vc in rows:
        arms.setdefault((et, arm), []).append(vc)
    out = {
        r["event_type"]: r
        for r in REGISTRY["stat_welch_ttest"].build(spark, sf_dir).collect()
    }
    for et in {k[0] for k in arms}:
        a0, a1 = arms[(et, 0)], arms[(et, 1)]
        m0, m1 = np.mean(a0), np.mean(a1)
        v0, v1 = np.var(a0, ddof=1), np.var(a1, ddof=1)
        se = v1 / len(a1) + v0 / len(a0)
        t = (m1 - m0) / math.sqrt(se)
        df = se * se / (
            (v1 / len(a1)) ** 2 / (len(a1) - 1)
            + (v0 / len(a0)) ** 2 / (len(a0) - 1)
        )
        r = out[et]
        assert r["n0"] == len(a0) and r["n1"] == len(a1)
        assert abs(r["t_stat"] - t) <= 1e-3
        assert abs(r["welch_df"] - df) <= max(1e-3 * df, 1e-3)
        assert abs(r["diff"] - (m1 - m0) / 100.0) <= 1e-3
        # Welch df is bounded by the pooled df
        assert r["welch_df"] <= len(a0) + len(a1) - 2 + 1e-6


def _pois_w(u: float) -> int:
    cdf = [
        0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
        0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
        0.9999167588507119,
    ]
    for i, c in enumerate(cdf):
        if u < c:
            return i
    return 7


def test_bootstrap_ci_matches_python_replicates(spark, sf_dir):
    """Replicate weights + order statistics recomputed with
    hashlib.md5 — and the CI must bracket the point estimate."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, event_id, "
        f"CAST(floor(value*100 + 0.5) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    by_type: dict[str, list[tuple[int, int]]] = {}
    for et, eid, vc in rows:
        by_type.setdefault(et, []).append((eid, vc))
    out = {
        r["event_type"]: r
        for r in REGISTRY["stat_bootstrap_ci"].build(spark, sf_dir).collect()
    }
    B = 32
    for et, pts in by_type.items():
        means = []
        for b in range(B):
            swv = sw = 0
            for eid, vc in pts:
                h = hashlib.md5(f"{eid}_{b}".encode()).hexdigest()[:6]
                w = _pois_w(int(h, 16) / 16777216.0)
                swv += w * vc
                sw += w
            if sw > 0:
                m = swv / (100.0 * sw)
                means.append(math.floor(m * 10000 + 0.5) / 10000.0)
        means.sort()
        r = out[et]
        assert abs(r["boot_lo"] - means[1]) <= 1e-9
        assert abs(r["boot_hi"] - means[-2]) <= 1e-9
        assert r["boot_lo"] <= r["point_mean"] <= r["boot_hi"]
        assert r["n"] == len(pts)


def test_preference_pairs_python_argmax(spark, sf_dir):
    """Chosen/rejected doc per pool recomputed by brute force; every
    pool in the output has >= 2 docs and chosen != rejected."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, lang, doc_id, "
        f"len(list_distinct(string_split(text, ' '))), n_chars "
        f"FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    pools: dict[tuple[str, str], list[tuple[int, int]]] = {}
    for src, lang, did, utoks, nch in rows:
        score = utoks * 10**12 + nch * 10**7 + did
        pools.setdefault((src, lang), []).append((score, did))
    out = REGISTRY["pipeline_preference_pairs"].build(spark, sf_dir).collect()
    got = {(r["source"], r["lang"]): r for r in out}
    expected = {k: v for k, v in pools.items() if len(v) >= 2}
    assert set(got) == set(expected)
    for k, docs in expected.items():
        r = got[k]
        assert r["chosen_doc"] == max(docs)[1]
        assert r["rejected_doc"] == min(docs)[1]
        assert r["chosen_doc"] != r["rejected_doc"]
        assert r["chosen_score"] > r["rejected_score"]
        assert r["n_docs"] == len(docs)


def test_tokenizer_fertility_identity(spark, sf_dir):
    """fertility * chars_per_token ~= 1, and byte/char counts agree
    with Python len() on the raw text."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, text, n_chars FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    toks: dict[str, int] = {}
    chars: dict[str, int] = {}
    bts: dict[str, int] = {}
    for lang, text, nch in rows:
        toks[lang] = toks.get(lang, 0) + len(text.split(" "))
        chars[lang] = chars.get(lang, 0) + nch
        bts[lang] = bts.get(lang, 0) + len(text.encode())
    out = REGISTRY["text_tokenizer_fertility"].build(spark, sf_dir).collect()
    assert {r["lang"] for r in out} == set(toks)
    for r in out:
        lang = r["lang"]
        assert r["total_tokens"] == toks[lang]
        assert abs(r["chars_per_token"] - chars[lang] / toks[lang]) <= 1e-3
        assert abs(r["bytes_per_token"] - bts[lang] / toks[lang]) <= 1e-3
        assert abs(r["fertility"] * r["chars_per_token"] - 1.0) <= 1e-3
