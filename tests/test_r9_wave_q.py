"""Independent-recomputation property for the round-9 wave-Q key
(closed-form business-day latency)."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _networkdays(d1: dt.date, d2: dt.date) -> int:
    """Reference implementation: literally walk the calendar."""
    if d2 < d1:
        return -_networkdays(d2, d1)
    n = 0
    d = d1
    while d < d2:
        d += dt.timedelta(days=1)
        if d.isoweekday() <= 5:
            n += 1
    return n


def test_business_days_matches_calendar_walk(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT o.o_orderpriority, CAST(o.o_orderdate AS DATE),
               CAST(l.l_shipdate AS DATE)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
    """).fetchall()
    per = defaultdict(list)
    for pri, od, sd in rows:
        per[pri].append(_networkdays(od, sd))
    got = {
        r["o_orderpriority"]: r
        for r in REGISTRY["fn_business_days"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    for pri, bds in per.items():
        row = got[pri]
        assert row["n"] == len(bds)
        assert row["min_bdays"] == min(bds)
        assert row["max_bdays"] == max(bds)
        assert abs(row["mean_bdays"] - sum(bds) / len(bds)) < 1e-3
        assert row["n_within_week"] == sum(1 for b in bds if b <= 5)


def test_networkdays_closed_form_vs_walk():
    """The closed form used by the operator equals the calendar walk
    for every (start weekday, span) combination up to 3 weeks."""
    base = dt.date(2024, 1, 1)  # a Monday
    for start_off in range(7):
        d1 = base + dt.timedelta(days=start_off)
        w1 = d1.isoweekday()
        for d in range(0, 22):
            d2 = d1 + dt.timedelta(days=d)
            closed = (d // 7) * 5 + sum(
                1 for i in range(1, d % 7 + 1) if ((w1 - 1 + i) % 7) + 1 <= 5
            )
            assert closed == _networkdays(d1, d2), (d1, d)
