"""Oracle parity: every registered query vs its DuckDB oracle
(local replica of the driver's t2 gate, but with exact value
comparison — stricter than the driver's hash)."""

from __future__ import annotations

import pytest

from etl_cnc_spark.oracle import compare
from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

# The slow full-streaming keys run in test_streaming.py's parity
# subset; everything else runs here.
ALL_KEYS = sorted(REGISTRY)


@pytest.mark.parametrize("key", ALL_KEYS)
def test_query_matches_oracle(key, spark, sf_dir):
    res = compare(REGISTRY[key], spark, sf_dir)
    assert res.ok, f"{key}: {res.detail}\n" + "\n".join(res.mismatches)
    assert res.spark_rows > 0, f"{key}: produced no rows"


def test_every_query_has_check_declared():
    for key, q in REGISTRY.items():
        assert q.check in ("hash", "rows")
        if q.check == "hash":
            assert q.oracle, f"{key} declared hash check without oracle SQL"
        else:
            assert q.notes, f"{key} is rows-only but doesn't document why"


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) == len(REGISTRY)
