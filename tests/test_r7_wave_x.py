"""Properties for the round-7 wave-X keys (try_cast rescue census,
FILTER clause, Cronbach's alpha) re-derived with plain Python."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("part", "lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_try_cast_census_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT p_partkey, p_size FROM part"
    ).fetchall()
    n_rows = len(rows)
    dirty = sum(1 for k, _ in rows if k % 7 == 0)
    clean_sum = sum(s for k, s in rows if k % 7 != 0)
    out = REGISTRY["fn_try_cast"].build(spark, sf_dir).collect()[0]
    assert out["n_rows"] == n_rows
    assert out["n_rescued"] == dirty
    assert out["n_parsed"] == n_rows - dirty
    assert out["parsed_sum"] == clean_sum


def test_filter_clause_matches_case_form(spark, sf_dir):
    """FILTER must equal the CASE-based restatement row for row."""
    got = {
        r["l_returnflag"]: r
        for r in REGISTRY["sql_entry_filter_clause"]
        .build(spark, sf_dir)
        .collect()
    }
    want = {
        r[0]: r
        for r in _con(sf_dir).execute(
            """SELECT l_returnflag, count(*),
               sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END),
               sum(CASE WHEN l_discount = 0.0 THEN
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   END),
               sum(CASE WHEN l_returnflag = 'R' AND l_quantity <= 5
                   THEN 1 ELSE 0 END)
            FROM lineitem GROUP BY 1"""
        ).fetchall()
    }
    assert set(got) == set(want)
    for f, w in want.items():
        g = got[f]
        assert g["n_all"] == w[1]
        assert g["n_big"] == w[2]
        assert g["full_price_cents"] == w[3]
        assert g["n_small_returns"] == w[4]


def test_cronbach_alpha_matches_numpy(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT user_id, event_type, count(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    users = sorted({r[0] for r in rows})
    types = sorted({r[1] for r in rows})
    cell = {(u, t): 0 for u in users for t in types}
    for u, t, c in rows:
        cell[(u, t)] = c
    X = np.array(
        [[cell[(u, t)] for t in types] for u in users], dtype=np.float64
    )
    k = len(types)
    sum_var_i = X.var(axis=0).sum()
    var_t = X.sum(axis=1).var()
    alpha = k / (k - 1) * (1 - sum_var_i / var_t)
    out = REGISTRY["stat_cronbach_alpha"].build(spark, sf_dir).collect()[0]
    assert out["k"] == k
    assert out["n_users"] == len(users)
    assert abs(out["sum_item_var"] - sum_var_i) < 1e-3
    assert abs(out["var_total"] - var_t) < 1e-3
    assert abs(out["alpha"] - alpha) < 1e-3
