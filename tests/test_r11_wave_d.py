"""Round-11 wave D: Chatterjee xi, Hoeffding D, geohash encode,
Jaccard link prediction — from-scratch Python recomputations."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from fractions import Fraction

import duckdb
import pytest

from etl_cnc_spark.registry import REGISTRY, load_all

load_all()

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_chatterjee_xi_matches_python(spark, sf_dir):
    daily = duckdb.execute(
        f"""
        SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d, count(*) AS y
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY d
        """
    ).fetchall()
    ys = [y for _, y in daily]
    n = len(ys)
    r = [sum(1 for yj in ys if yj <= yi) for yi in ys]
    l = [sum(1 for yj in ys if yj >= yi) for yi in ys]
    sum_abs_dr = sum(abs(r[i + 1] - r[i]) for i in range(n - 1))
    denom = sum(2 * li * (n - li) for li in l)
    xi = float(1 - Fraction(n * sum_abs_dr, denom))
    row = REGISTRY["stat_chatterjee_xi"].build(spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    assert row["sum_abs_dr"] == sum_abs_dr
    assert row["denom"] == denom
    assert abs(row["xi"] - xi) < 5e-5
    assert -0.5 <= row["xi"] <= 1.0


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_chatterjee_xi_one_on_functional_series(spark, sf_dir):
    """xi = 1 - 3/(n+1) exactly when y is a strictly monotone (hence
    measurable) function of x with no ties — the closed-form maximum
    of the estimator (Chatterjee 2021, eq. after Thm 1.1).  Pin it on
    a synthetic frame through the same Spark expression chain."""
    from pyspark.sql import functions as F

    n = 40
    df = spark.range(n).select(
        F.col("id").alias("d"), (F.col("id") * 7 + 3).alias("y")
    )
    # replicate the operator's tail on the synthetic daily frame
    from pyspark.sql import Window

    w_le = Window.orderBy("y").rangeBetween(Window.unboundedPreceding, 0)
    ranked = df.select(
        "d", F.count(F.lit(1)).over(w_le).cast("long").alias("r")
    )
    seq = ranked.select(
        F.abs(
            F.col("r") - F.lag("r").over(Window.orderBy("d"))
        ).alias("adr")
    )
    s = seq.agg(F.sum("adr")).collect()[0][0]
    # all |dr| = 1 for a strictly increasing series
    assert s == n - 1
    # closed form: denom = 2*sum l(n-l) = n(n^2-1)/3 for distinct y
    xi = 1 - (n * s) / (n * (n * n - 1) / 3)
    assert abs(xi - (1 - 3 / (n + 1))) < 1e-12


def _hoeffding_python(pairs):
    cells = Counter(pairs)
    keys = list(cells)
    n = sum(cells.values())
    sa = sb = sc = 0
    for xa, ya in keys:
        cnt = cells[(xa, ya)]
        lt_x = sum(c for (xb, _), c in cells.items() if xb < xa)
        eq_x = sum(c for (xb, _), c in cells.items() if xb == xa)
        lt_y = sum(c for (_, yb), c in cells.items() if yb < ya)
        eq_y = sum(c for (_, yb), c in cells.items() if yb == ya)
        c_ll = sum(
            c for (xb, yb), c in cells.items() if xb < xa and yb < ya
        )
        c_el = sum(
            c for (xb, yb), c in cells.items() if xb == xa and yb < ya
        )
        c_le = sum(
            c for (xb, yb), c in cells.items() if xb < xa and yb == ya
        )
        r2 = 2 * lt_x + eq_x + 1
        s2 = 2 * lt_y + eq_y + 1
        q4v = 4 + 4 * c_ll + 2 * c_el + 2 * c_le + (cnt - 1)
        sa += cnt * (q4v - 4) * (q4v - 8)
        sb += cnt * (r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4)
        sc += cnt * (r2 - 4) * (s2 - 4) * (q4v - 4)
    num = (n - 2) * (n - 3) * sa + sb - 2 * (n - 2) * sc
    den = 16 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    return n, sa, sb, sc, float(30 * Fraction(num, den))


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_hoeffding_d_matches_python(spark, sf_dir):
    pairs = duckdb.execute(
        f"""
        SELECT CAST(l_quantity AS BIGINT),
               CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet'
        """
    ).fetchall()
    n, sa, sb, sc, d = _hoeffding_python(pairs)
    row = REGISTRY["stat_hoeffding_d"].build(spark, sf_dir).collect()[0]
    assert row["n_rows"] == n
    assert abs(row["d1"] - sa / 16) <= abs(sa / 16) * 1e-12
    assert abs(row["d2"] - sb / 16) <= abs(sb / 16) * 1e-12
    assert abs(row["d3"] - sc / 16) <= abs(sc / 16) * 1e-12
    assert abs(row["d_stat"] - d) < 5e-5
    # quantity and discount are independent in the generator:
    # D must sit essentially at zero (well inside [-0.5, 1])
    assert -0.01 < row["d_stat"] < 0.01


def test_hoeffding_d_detects_functional_dependence():
    """On y = x (mod-free functional dependence, no ties in the
    bivariate sense beyond the diagonal), D approaches its maximum
    scale: strictly positive and far from the independence value."""
    pairs = [(i, i) for i in range(1, 41)]
    _, _, _, _, d = _hoeffding_python(pairs)
    assert d > 0.5


GH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash6(key: int) -> tuple[str, int, int]:
    h = hashlib.md5(f"ghx{key}".encode()).hexdigest()
    lon_u = int(h[0:12], 16) % 360000000
    lat_u = int(h[12:24], 16) % 180000000
    lon_q = lon_u * 32768 // 360000000
    lat_q = lat_u * 32768 // 180000000
    gh = 0
    for k in range(15):
        gh |= ((lon_q >> (14 - k)) & 1) << (29 - 2 * k)
        gh |= ((lat_q >> (14 - k)) & 1) << (28 - 2 * k)
    s = "".join(GH_B32[(gh >> (25 - 5 * j)) & 31] for j in range(6))
    return s, lat_u, lon_u


def test_geohash_reference_vector():
    """Pin the bit order against the public geohash definition: the
    cell decoded back from our integer quantization must contain the
    synthetic point (round-trip containment, the defining property)."""
    for key in (1, 7, 42):
        s, lat_u, lon_u = _geohash6(key)
        # decode: de-interleave
        gh = 0
        for ch in s:
            gh = (gh << 5) | GH_B32.index(ch)
        lon_q = lat_q = 0
        for k in range(15):
            lon_q = (lon_q << 1) | ((gh >> (29 - 2 * k)) & 1)
            lat_q = (lat_q << 1) | ((gh >> (28 - 2 * k)) & 1)
        # cell bounds in micro-degrees
        assert lon_q * 360000000 // 32768 <= lon_u < (lon_q + 1) * 360000000 // 32768 + 1
        assert lat_q * 180000000 // 32768 <= lat_u < (lat_q + 1) * 180000000 // 32768 + 1


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_geohash_matches_python(spark, sf_dir):
    keys = [
        k
        for (k,) in duckdb.execute(
            f"SELECT c_custkey FROM '{sf_dir}/customer.parquet'"
        ).fetchall()
    ]
    cells = defaultdict(list)
    for k in keys:
        s, lat_u, lon_u = _geohash6(k)
        cells[s[:3]].append((s, lat_u, lon_u))
    out = {
        r["cell3"]: r
        for r in REGISTRY["fn_geohash"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(cells)
    for c3, pts in cells.items():
        r = out[c3]
        assert r["n_pts"] == len(pts)
        assert r["min_gh6"] == min(s for s, _, _ in pts)
        assert r["max_gh6"] == max(s for s, _, _ in pts)
        mean_lat = sum(u for _, u, _ in pts) / len(pts) / 1e6 - 90.0
        assert abs(r["mean_lat"] - mean_lat) < 5e-4


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_jaccard_linkpred_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    by_order = defaultdict(set)
    for ok, pk in rows:
        by_order[ok].add(pk)
    sup = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                sup[(ps[i], ps[j])] += 1
    edges = {p for p, c in sup.items() if c >= 2}
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    expect = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if (u, v) in edges:
                continue
            cn = len(nbrs[u] & nbrs[v])
            if cn >= 2:
                expect[(u, v)] = (
                    cn,
                    len(nbrs[u]),
                    len(nbrs[v]),
                    cn / (len(nbrs[u]) + len(nbrs[v]) - cn),
                )
    out = {
        (r["part_a"], r["part_b"]): r
        for r in REGISTRY["graph_jaccard_linkpred"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(expect)
    for k, (cn, da, db, jac) in expect.items():
        r = out[k]
        assert r["common_neighbors"] == cn
        assert r["deg_a"] == da
        assert r["deg_b"] == db
        import math

        assert r["jaccard"] == math.floor(jac * 1e4 + 0.5) / 1e4
        assert 0.0 < r["jaccard"] <= 1.0
