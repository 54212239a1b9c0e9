"""Property test for the cross-engine float discipline
(etl_cnc_spark/utils.py): the q2/cents quantization must produce
bit-identical results in any engine that evaluates IEEE-754 doubles
— verified here by fuzzing DuckDB against a pure-Python evaluation
of the same formula. This is the foundation every money-aggregate
oracle stands on; if it holds, partial-agg order can never flip a
hash (SURVEY.md §5 float discipline).
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

MONEY = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


def _py_q2(x: float) -> float:
    return math.floor(x * 100 + 0.5) / 100.0


def _py_cents(x: float) -> int:
    return int(math.floor(x * 100 + 0.5))


@settings(max_examples=300, deadline=None)
@given(xs=st.lists(MONEY, min_size=1, max_size=50))
def test_q2_and_cent_sum_match_duckdb(xs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    db_q2 = [r[0] for r in con.execute("SELECT floor(x*100 + 0.5)/100.0 FROM t").fetchall()]
    assert db_q2 == [_py_q2(x) for x in xs]

    (db_sum,) = con.execute(
        "SELECT CAST(sum(CAST(floor(x*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 FROM t"
    ).fetchone()
    # integer-cent sum is order-exact: python sum in any order agrees
    assert db_sum == sum(_py_cents(x) for x in xs) / 100.0
    assert db_sum == sum(sorted(_py_cents(x) for x in xs)) / 100.0
