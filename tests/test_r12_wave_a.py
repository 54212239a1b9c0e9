"""Independent-recomputation properties for the round-12 wave-A keys
(partitioned polymorphic UDTF, temperature mixing, quantile
normalization, group-median imputation, ANCOVA) — a third engine
(plain Python / numpy-free stdlib / duckdb on the raw parquet)
recomputes each result from scratch. Run at both fixture SFs via
``SPARK_GRAFT_TEST_SF``."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def q4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000.0


# ------------------------------------- partitioned polymorphic UDTF


def test_udtf_partitioned_matches_python_fold(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT n_regionkey, n_name FROM '{sf_dir}/nation.parquet'"
    ).fetchall()
    per = defaultdict(lambda: [0, None, None])
    for rk, name in rows:
        ln = len(name.encode("utf-8"))
        st = per[str(rk)]
        st[0] += 1
        st[1] = ln if st[1] is None else min(st[1], ln)
        st[2] = ln if st[2] is None else max(st[2], ln)
    expected = {g: tuple(st) for g, st in per.items()}
    expected["__all__"] = (
        sum(v[0] for v in per.values()),
        min(v[1] for v in per.values()),
        max(v[2] for v in per.values()),
    )
    got = {
        r["grp"]: (r["n_rows"], r["min_len"], r["max_len"])
        for r in REGISTRY["udtf_polymorphic_partitioned"]
        .build(spark, sf_dir)
        .collect()
    }
    assert got == expected


def test_udtf_partitioned_merged_row_consistent(spark, sf_dir):
    out = REGISTRY["udtf_polymorphic_partitioned"].build(spark, sf_dir).collect()
    parts = [r for r in out if r["grp"] != "__all__"]
    allr = next(r for r in out if r["grp"] == "__all__")
    # the merged row must BE the fold of the partials (mergeable-state
    # identity — the property the partitioned shape exists to show)
    assert allr["n_rows"] == sum(p["n_rows"] for p in parts)
    assert allr["min_len"] == min(p["min_len"] for p in parts)
    assert allr["max_len"] == max(p["max_len"] for p in parts)


# -------------------------------------------- temperature mixing


def test_temperature_mix_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    docs = Counter()
    toks = Counter()
    for lang, text in rows:
        docs[lang] += 1
        toks[lang] += len(text.split(" "))
    s_micro = {L: math.floor(math.sqrt(toks[L]) * 1000000 + 0.5) for L in toks}
    total, s_total = sum(toks.values()), sum(s_micro.values())
    out = {
        r["lang"]: r
        for r in REGISTRY["pipeline_temperature_mix"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(toks)
    for L in toks:
        r = out[L]
        assert r["docs"] == docs[L]
        assert r["tokens"] == toks[L]
        assert abs(r["share"] - q4(toks[L] / total)) < 1e-9
        assert abs(r["temp_weight"] - q4(s_micro[L] / s_total)) < 1e-9
        assert (
            abs(r["epochs"] - q4(1000000 * (s_micro[L] / s_total) / toks[L]))
            < 1e-9
        )


def test_temperature_mix_compresses_toward_uniform(spark, sf_dir):
    """Structural property of alpha = 1/2 tempering: every language's
    weight moves from its raw share TOWARD the uniform share and never
    crosses it (sqrt compresses ratios), and weights sum to ~1."""
    out = REGISTRY["pipeline_temperature_mix"].build(spark, sf_dir).collect()
    k = len(out)
    uniform = 1.0 / k
    assert abs(sum(r["temp_weight"] for r in out) - 1.0) < 1e-3
    for r in out:
        lo, hi = sorted((r["share"], uniform))
        assert lo - 5e-4 <= r["temp_weight"] <= hi + 5e-4, r


# ---------------------------------------- quantile normalization


def test_quantile_normalize_matches_python_sort(spark, sf_dir):
    """From-scratch QN: sort both measures row-wise, normalized value
    at rank r = mean of the two r-th order statistics; a cell's norm
    is the average of that over its rank interval."""
    rows = duckdb.execute(
        f"""SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
                   CAST(l_quantity AS BIGINT) * 100
            FROM '{sf_dir}/lineitem.parquet'"""
    ).fetchall()
    prices = sorted(r[0] for r in rows)
    qtys = sorted(r[1] for r in rows)
    n = len(prices)
    norm = [(prices[i] + qtys[i]) / 2.0 for i in range(n)]

    def expect(values: list[int]) -> dict[int, tuple[int, int, float]]:
        # value -> (rank_lo, rank_hi, q4(mean norm over interval))
        out = {}
        lo = 0
        for v, cnt in sorted(Counter(values).items()):
            hi = lo + cnt
            out[v] = (lo, hi, q4(sum(norm[lo:hi]) / cnt))
            lo = hi
        return out

    exp = {"l_extendedprice": expect(prices), "l_quantity": expect(qtys)}
    got = REGISTRY["ml_quantile_normalize"].build(spark, sf_dir).collect()
    assert len(got) == len(exp["l_extendedprice"]) + len(exp["l_quantity"])
    for r in got:
        e_lo, e_hi, e_norm = exp[r["measure"]][r["v"]]
        assert (r["rank_lo"], r["rank_hi"]) == (e_lo, e_hi), r
        assert abs(r["norm"] - e_norm) < 1e-6, r


def test_quantile_normalize_distributions_coincide(spark, sf_dir):
    """QN's defining property: after mapping, both measures have THE
    SAME multiset of normalized values (weighted by cell counts) —
    total mass and rank coverage agree measure to measure."""
    got = REGISTRY["ml_quantile_normalize"].build(spark, sf_dir).collect()
    mass = defaultdict(float)
    rows_per = Counter()
    for r in got:
        cnt = r["rank_hi"] - r["rank_lo"]
        mass[r["measure"]] += r["norm"] * cnt
        rows_per[r["measure"]] += cnt
    (m1, m2) = sorted(mass)
    assert rows_per[m1] == rows_per[m2]
    # identical multisets => identical totals (up to q4 rounding x n)
    assert abs(mass[m1] - mass[m2]) <= 0.51 * rows_per[m1] * 1e-4 + 1e-6


# ------------------------------------------ group-median imputation


def test_impute_group_median_matches_python(spark, sf_dir):
    cust = duckdb.execute(
        f"SELECT c_custkey, c_nationkey FROM '{sf_dir}/customer.parquet'"
    ).fetchall()
    orders = duckdb.execute(
        f"""SELECT o_custkey,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
            FROM '{sf_dir}/orders.parquet'"""
    ).fetchall()
    names = dict(
        duckdb.execute(
            f"SELECT n_nationkey, n_name FROM '{sf_dir}/nation.parquet'"
        ).fetchall()
    )
    spend = defaultdict(lambda: [0, 0])
    for ck, centsv in orders:
        spend[ck][0] += 1
        spend[ck][1] += centsv
    aov = {}
    for ck, nk in cust:
        n_ord, tot = spend.get(ck, (0, 0))
        aov[ck] = (nk, tot // n_ord if n_ord else None)
    by_nation = defaultdict(list)
    for ck, (nk, a) in aov.items():
        by_nation[nk].append(a)
    got = {
        r["nation"]: r
        for r in REGISTRY["ml_impute_group_median"].build(spark, sf_dir).collect()
    }
    for nk, vals in by_nation.items():
        obs = sorted(v for v in vals if v is not None)
        med = obs[(len(obs) + 1) // 2 - 1] if obs else None
        r = got[names[nk]]
        assert r["n_cust"] == len(vals)
        assert r["n_missing"] == sum(1 for v in vals if v is None)
        assert r["median_aov_cents"] == med
        if med is None:
            assert r["mean_imputed_aov"] is None
        else:
            imputed = [v if v is not None else med for v in vals]
            assert abs(
                r["mean_imputed_aov"] - q4(sum(imputed) / len(imputed))
            ) < 1e-9


# ------------------------------------------------------------ ANCOVA


def test_ancova_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"""SELECT l_returnflag, CAST(l_quantity AS BIGINT),
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
            FROM '{sf_dir}/lineitem.parquet'"""
    ).fetchall()
    st = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, sx, sy, sxy, sxx
    for g, x, y in rows:
        s = st[g]
        s[0] += 1
        s[1] += x
        s[2] += y
        s[3] += x * y
        s[4] += x * x
    milli = {}
    for g, (n, sx, sy, sxy, sxx) in st.items():
        milli[g] = (
            math.floor((sxy - sx * sy / n) * 1000 + 0.5),
            math.floor((sxx - sx * sx / n) * 1000 + 0.5),
        )
    sp = sum(v[0] for v in milli.values())
    sxp = sum(v[1] for v in milli.values())
    b = sp / sxp
    xbar = sum(s[1] for s in st.values()) / sum(s[0] for s in st.values())
    got = {
        r["grp"]: r for r in REGISTRY["stat_ancova"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(st)
    for g, (n, sx, sy, _sxy, _sxx) in st.items():
        r = got[g]
        assert r["n"] == n
        assert abs(r["mean_qty"] - q4(sx / n)) < 1e-9
        assert abs(r["mean_price"] - q4(sy / n / 100.0)) < 1e-9
        assert abs(r["pooled_slope"] - q4(b / 100.0)) < 1e-9
        adj = (sy / n - b * (sx / n - xbar)) / 100.0
        assert abs(r["adj_mean_price"] - q4(adj)) < 1e-9


def test_ancova_adjustment_identity(spark, sf_dir):
    """Structural identities: (1) the n-weighted mean of ADJUSTED
    means equals the n-weighted mean of RAW means (the adjustment
    term is a weighted-mean-zero contrast); (2) a group whose mean
    covariate sits above the grand mean with positive slope adjusts
    DOWN, and vice versa."""
    out = REGISTRY["stat_ancova"].build(spark, sf_dir).collect()
    n_all = sum(r["n"] for r in out)
    xbar = sum(r["n"] * r["mean_qty"] for r in out) / n_all
    raw = sum(r["n"] * r["mean_price"] for r in out) / n_all
    adj = sum(r["n"] * r["adj_mean_price"] for r in out) / n_all
    assert abs(raw - adj) < 1e-2  # q4 rounding x group means
    for r in out:
        if r["pooled_slope"] > 0 and r["mean_qty"] > xbar + 1e-6:
            assert r["adj_mean_price"] < r["mean_price"]
        if r["pooled_slope"] > 0 and r["mean_qty"] < xbar - 1e-6:
            assert r["adj_mean_price"] > r["mean_price"]


def test_ancova_constant_covariate_publishes_null(spark, sf_dir, tmp_path):
    """A constant covariate has Sxx = 0 in every group: the pooled
    slope is undefined and BOTH engines must publish NULL, not a
    double-division infinity (whose floor/q4 semantics they need not
    share). Exercised on a synthetic lineitem with one quantity."""
    import duckdb as ddb

    rows = [("A", 1, 10.0), ("A", 1, 12.0), ("R", 1, 20.0), ("R", 1, 24.0)]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_quantity long, l_extendedprice double"
    )
    d = str(tmp_path / "li_const")
    df.write.mode("overwrite").parquet(d)
    syn = str(tmp_path)
    import shutil, os
    os.makedirs(os.path.join(syn, "x"), exist_ok=True)
    shutil.move(d, os.path.join(syn, "x", "lineitem.parquet"))
    out = (
        REGISTRY["stat_ancova"].build(spark, os.path.join(syn, "x")).collect()
    )
    assert len(out) == 2
    for r in out:
        assert r["pooled_slope"] is None
        assert r["adj_mean_price"] is None
        assert r["mean_qty"] == 1.0
    # oracle agrees: run the registered SQL over the same parquet
    con = ddb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"'{os.path.join(syn, 'x', 'lineitem.parquet')}/*.parquet'"
    )
    orows = con.execute(REGISTRY["stat_ancova"].oracle).fetchall()
    assert all(r[4] is None and r[5] is None for r in orows)
