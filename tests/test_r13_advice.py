"""Round-13 ADVICE regression tests.

ADVICE r12 flagged stat_ancova's milli-scale double->long cast: in
non-ANSI Spark it would silently SATURATE past BIGINT while the DuckDB
oracle's CAST raises — a silent cross-engine divergence outside the
tested SFs.  The build now enforces the documented bound with
``raise_error``; this test proves BOTH engines fail loudly on the same
overflowing input, so overflow can never become a wrong answer.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _write_overflow_lineitem(spark, tmp_path) -> str:
    """A 3-row lineitem whose single group's Sxy co-moment exceeds
    BIGINT at the milli scale while every PER-ROW product still fits
    BIGINT (so the failure reaches the guarded milli cast, not the
    ANSI per-row multiply): x in {0, 1e4}, price 1e12 (cent-scaled
    y ~ 1e14, x*y = 1e18 < 2^63), giving Sxy ~ 6.7e17 and
    Sxy*1000 ~ 6.7e20, far past 2^63 ~ 9.2e18."""
    rows = [
        ("A", 0, 0.0),
        ("A", 10000, 1.0e12),
        ("A", 10000, 1.0e12),
    ]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_quantity long, l_extendedprice double"
    )
    sf = str(tmp_path / "overflow_sf")
    os.makedirs(sf, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "lineitem.parquet")
    )
    return sf


def test_ancova_overflow_raises_in_spark(spark, tmp_path):
    sf = _write_overflow_lineitem(spark, tmp_path)
    with pytest.raises(Exception) as exc:
        REGISTRY["stat_ancova"].build(spark, sf).collect()
    assert "exceeds BIGINT" in str(exc.value)


def test_ancova_overflow_raises_in_oracle_too(spark, tmp_path):
    """The oracle's CAST raises on the same input — loud-failure
    parity, the cross-engine contract the guard restores."""
    sf = _write_overflow_lineitem(spark, tmp_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"'{os.path.join(sf, 'lineitem.parquet')}/*.parquet'"
    )
    with pytest.raises(Exception):
        con.execute(REGISTRY["stat_ancova"].oracle).fetchall()


def test_ancova_normal_path_unaffected(spark, sf_dir):
    """The guard is a no-op at every tested SF: still 3 groups with
    non-NULL adjusted means."""
    out = REGISTRY["stat_ancova"].build(spark, sf_dir).collect()
    assert len(out) == 3
    assert all(r["adj_mean_price"] is not None for r in out)
