"""Independent-recomputation properties for the tenth round-5 wave
(structured-text parsing roundtrip, YoY growth)."""

from __future__ import annotations

import math

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_structured_parse_roundtrips_every_row(spark, sf_dir):
    con = duckdb.connect()
    expected = dict(
        con.execute(
            f"SELECT n_nationkey, [n_name, CAST(n_regionkey AS VARCHAR)] "
            f"FROM '{sf_dir}/nation.parquet'"
        ).fetchall()
    )
    out = REGISTRY["fn_structured_parse"].build(spark, sf_dir).collect()
    assert len(out) == len(expected)
    for r in out:
        name, region = expected[r["n_nationkey"]]
        assert r["csv_name"] == name and r["xml_name"] == name
        assert str(r["csv_region"]) == region
        assert str(r["xml_region"]) == region
        assert r["csv_roundtrip"] and r["xml_roundtrip"]


def test_yoy_growth_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT year(o_orderdate), month(o_orderdate), o_totalprice "
        f"FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    monthly: dict[tuple[int, int], list[int]] = {}
    for yr, mo, p in rows:
        cur = monthly.setdefault((yr, mo), [0, 0])
        cur[0] += 1
        cur[1] += math.floor(p * 100 + 0.5)
    out = {(r["yr"], r["mo"]): r for r in
           REGISTRY["orders_yoy_growth"].build(spark, sf_dir).collect()}
    assert set(out) == set(monthly)
    for (yr, mo), (n, cents) in monthly.items():
        r = out[(yr, mo)]
        assert r["n_orders"] == n
        assert abs(r["revenue"] - cents / 100.0) <= 1e-9
        prev = monthly.get((yr - 1, mo))
        if prev is None:
            assert r["revenue_prev_year"] is None and r["yoy_pct"] is None
        else:
            assert abs(r["revenue_prev_year"] - prev[1] / 100.0) <= 1e-9
            assert abs(r["yoy_pct"] - (cents - prev[1]) / prev[1]) <= 1e-3
