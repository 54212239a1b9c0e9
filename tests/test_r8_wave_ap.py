"""Independent-recomputation property for the round-8 wave-AP key
(Aalen-Johansen competing-risks cumulative incidence)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_competing_risks_cif_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT user_id, min(CAST(ts AS DATE)),
               min(CASE WHEN event_type = 'purchase'
                   THEN CAST(ts AS DATE) END),
               min(CASE WHEN event_type = 'error'
                   THEN CAST(ts AS DATE) END),
               max(CAST(ts AS DATE))
        FROM '{sf_dir}/events.parquet' GROUP BY user_id
    """).fetchall()
    coded = []
    for _, entry, p_day, e_day, last in rows:
        if p_day is not None and (e_day is None or p_day <= e_day):
            coded.append(((p_day - entry).days, 1))
        elif e_day is not None:
            coded.append(((e_day - entry).days, 2))
        else:
            coded.append(((last - entry).days, 0))
    grid: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0])
    for t, k in coded:
        grid[t][2] += 1
        if k:
            grid[t][k - 1] += 1
    times = sorted(grid)
    n_at_risk = {}
    remaining = len(coded)
    for t in times:
        n_at_risk[t] = remaining
        remaining -= grid[t][2]
    # replicate the operator's log-space quantized survivor exactly
    exp_rows = {}
    lnq_cum = 0
    cif1q = cif2q = 0
    for t in times:
        d1, d2, _ = grid[t]
        n = n_at_risk[t]
        s_minus = math.exp(lnq_cum / 1e12)
        cif1q += math.floor(s_minus * d1 / n * 1e12 + 0.5)
        cif2q += math.floor(s_minus * d2 / n * 1e12 + 0.5)
        exp_rows[t] = (n, d1, d2, cif1q / 1e12, cif2q / 1e12)
        # terminal all-fail day: finite CIF increment emitted above,
        # but the log-survivor term is -inf and feeds no later prefix
        # (only the last grid day can hit this, by suffix-sum).
        if d1 + d2 < n:
            lnq_cum += math.floor(math.log(1 - (d1 + d2) / n) * 1e12 + 0.5)
    got = {
        r["day"]: r
        for r in REGISTRY["events_competing_risks_cif"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(exp_rows)
    last_t = max(exp_rows)
    for t, (n, d1, d2, c1, c2) in exp_rows.items():
        row = got[t]
        assert row["n_at_risk"] == n
        assert row["n_purchase"] == d1 and row["n_error"] == d2
        assert abs(row["cif_purchase"] - c1) < 2e-4
        assert abs(row["cif_error"] - c2) < 2e-4
    # CIFs are monotone and their sum never exceeds 1
    assert (
        got[last_t]["cif_purchase"] + got[last_t]["cif_error"] <= 1.0 + 1e-9
    )
    for a, b in zip(sorted(exp_rows), sorted(exp_rows)[1:]):
        assert got[b]["cif_purchase"] >= got[a]["cif_purchase"] - 1e-9
        assert got[b]["cif_error"] >= got[a]["cif_error"] - 1e-9


def test_competing_risks_terminal_day_mass(spark, tmp_path):
    """ADVICE r8 (medium): when every remaining at-risk user fails on
    the final grid day (d1+d2 = n_at_risk), the day's CIF increment
    must still be emitted — total incidence reaches 1, and the final
    row is present rather than silently dropped."""
    import datetime as dt

    import pyspark.sql.functions as F  # noqa: F401

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 4 users enter on day 0 (a 'view'); u1 purchases day 1,
    # u2 errors day 1, u3 purchases day 2, u4 errors day 2:
    # on day 2 both remaining users fail -> d1+d2 = n_at_risk = 2.
    for uid, (etype, day) in enumerate(
        [("purchase", 1), ("error", 1), ("purchase", 2), ("error", 2)]
    ):
        rows.append((f"u{uid}", "view", base))
        rows.append((f"u{uid}", etype, base + dt.timedelta(days=day)))
    spark.createDataFrame(
        rows, "user_id string, event_type string, ts timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["day"]: r
        for r in REGISTRY["events_competing_risks_cif"]
        .build(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == {1, 2}, "terminal all-fail day must be present"
    # day 1: S(0-)=1, 1/4 purchase + 1/4 error
    assert abs(out[1]["cif_purchase"] - 0.25) < 1e-6
    assert abs(out[1]["cif_error"] - 0.25) < 1e-6
    # day 2: S(1)=0.5, + 0.5*1/2 each -> totals 0.5/0.5, sum = 1
    assert abs(out[2]["cif_purchase"] - 0.5) < 1e-6
    assert abs(out[2]["cif_error"] - 0.5) < 1e-6
    assert abs(out[2]["cif_purchase"] + out[2]["cif_error"] - 1.0) < 1e-6
