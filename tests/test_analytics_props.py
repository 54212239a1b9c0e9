"""Semantic invariants for the late-round analytics keys (oracle
parity is in `check`; these pin the algorithmic properties)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_cnc_spark.catalog import table
from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_pareto_minimal_cover(spark, sf_dir):
    """The emitted prefix reaches >= 80% of total purchase cents, and
    dropping its last row falls below — i.e. the cover is minimal."""
    rows = sorted(
        REGISTRY["events_pareto"].build(spark, sf_dir).collect(),
        key=lambda r: r["rk"],
    )
    assert rows
    total = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("c")
        )
        .first()["c"]
    )
    covered = rows[-1]["running_cents"]
    assert covered >= 0.8 * total
    assert covered - rows[-1]["cents"] < 0.8 * total + 1
    # ranks are the contiguous prefix 1..k
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))


def test_streaks_bounds(spark, sf_dir):
    """longest_streak <= distinct active days; every user with events
    has >= 1 streak."""
    out = {r["user_id"]: r for r in
           REGISTRY["events_streaks"].build(spark, sf_dir).collect()}
    days = {
        r["user_id"]: r["d"]
        for r in table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    }
    assert set(out) == set(days)
    for uid, r in out.items():
        assert 1 <= r["longest_streak"] <= days[uid]
        assert r["n_streaks"] >= 1


def test_market_basket_lift_bounds(spark, sf_dir):
    """Pairs are ordered, above min-support, and co-occurrence never
    exceeds either brand's basket count."""
    rows = REGISTRY["orders_market_basket"].build(spark, sf_dir).collect()
    if not rows:  # min-support may filter everything at sf0.001
        return
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    brand_n = {
        r["brand"]: r["n"]
        for r in li.join(p, li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["brand_a"] < r["brand_b"]
        assert r["co"] >= 20
        assert r["co"] <= min(brand_n[r["brand_a"]], brand_n[r["brand_b"]])
        assert r["lift"] > 0


def test_attribution_credit_conserved(spark, sf_dir):
    """Linear attribution is an exact ledger: total micro-credits ==
    1e6 × conversions that have ≥1 touch, and first/last touch counts
    both equal that conversion count (every attributed conversion has
    exactly one first and one last touch)."""
    from etl_cnc_spark.catalog import table
    from etl_cnc_spark.operators.analytics import (
        _ATTR_LOOKBACK_H,
        _ATTR_SCALE,
    )

    rows = REGISTRY["events_attribution"].build(spark, sf_dir).collect()
    e = table(spark, sf_dir, "events")
    conv = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_uid"),
        F.col("ts").alias("conv_ts"),
    )
    attributed = (
        conv.join(
            e,
            (F.col("user_id") == F.col("c_uid"))
            & (F.col("event_type") != "purchase")
            & (F.col("ts") < F.col("conv_ts"))
            & (
                F.col("ts")
                >= F.col("conv_ts")
                - F.expr(f"INTERVAL {_ATTR_LOOKBACK_H} HOURS")
            ),
            "left_semi",
        )
        .count()
    )
    assert sum(r["linear_microcredits"] for r in rows) == attributed * _ATTR_SCALE
    assert sum(r["first_touches"] for r in rows) == attributed
    assert sum(r["last_touches"] for r in rows) == attributed
