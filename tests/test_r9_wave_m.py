"""Independent-recomputation property for the round-9 wave-M key
(Breslow-Day homogeneity of stratified odds ratios)."""

from __future__ import annotations

import math

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_breslow_day_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT CAST(isodow(ts) AS BIGINT),
               count_if(hour(ts) >= 12 AND event_type = 'purchase'),
               count_if(hour(ts) >= 12 AND event_type <> 'purchase'),
               count_if(hour(ts) < 12 AND event_type = 'purchase'),
               count_if(hour(ts) < 12 AND event_type <> 'purchase')
        FROM '{sf_dir}/events.parquet' GROUP BY 1
    """).fetchall()
    num = den = 0
    for _, a, b, c, d in rows:
        n = a + b + c + d
        num += math.floor(a * d / n * 1e9 + 0.5)
        den += math.floor(b * c / n * 1e9 + 0.5)
    psi = num / den
    bdq = 0
    for _, a, b, c, d in rows:
        n = a + b + c + d
        r, cc = a + b, a + c
        bq = psi * (r + cc) + (n - r - cc)
        e_a = (bq - math.sqrt(bq * bq - 4 * (psi - 1) * psi * r * cc)) / (
            2 * (psi - 1)
        )
        v = 1.0 / (
            1 / e_a + 1 / (r - e_a) + 1 / (cc - e_a) + 1 / (n - r - cc + e_a)
        )
        # admissible root lies inside the cell bounds
        assert max(0, r + cc - n) < e_a < min(r, cc)
        bdq += math.floor((a - e_a) ** 2 / v * 1e9 + 0.5)
    bd = bdq / 1e9
    row = REGISTRY["stat_breslow_day"].build(spark, sf_dir).collect()[0]
    assert row["n_strata"] == len(rows)
    assert abs(row["or_mh"] - psi) < 1e-4
    assert abs(row["bd_stat"] - bd) < max(5e-3, bd * 1e-3)
    assert row["bd_stat"] >= 0
    assert row["heterogeneous"] == (bd > 12.592)
    # fitted cells reproduce the common OR: per-stratum fitted OR == psi
    for _, a, b, c, d in rows:
        n = a + b + c + d
        r, cc = a + b, a + c
        bq = psi * (r + cc) + (n - r - cc)
        e_a = (bq - math.sqrt(bq * bq - 4 * (psi - 1) * psi * r * cc)) / (
            2 * (psi - 1)
        )
        fitted_or = e_a * (n - r - cc + e_a) / ((r - e_a) * (cc - e_a))
        assert abs(fitted_or - psi) < 1e-6
