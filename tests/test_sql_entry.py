"""SQL entry point (SURVEY §3.2): the same SQL text must run on both
engines and agree with the equivalent DataFrame composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_cnc_spark import sql as engine_sql
from etl_cnc_spark.catalog import table

Q3ISH = """
SELECT o_orderpriority,
       count(*) AS n,
       CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0
           AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
"""


def test_sql_entry_matches_dataframe(spark, sf_dir):
    via_sql = {
        r["o_orderpriority"]: (r["n"], r["revenue"])
        for r in engine_sql.run(spark, sf_dir, Q3ISH).collect()
    }
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    li = table(spark, sf_dir, "lineitem")
    via_df = {
        r["o_orderpriority"]: (r["n"], r["revenue"])
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"))
                .cast("double")
                / 100.0
            ).alias("revenue"),
        )
        .collect()
    }
    assert via_sql == via_df


def test_sql_entry_matches_duckdb(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = {r[0]: (r[1], r[2]) for r in con.execute(Q3ISH).fetchall()}
    ours = {
        r["o_orderpriority"]: (r["n"], r["revenue"])
        for r in engine_sql.run(spark, sf_dir, Q3ISH).collect()
    }
    assert ours == oracle


def test_unpivot_matches_dataframe_melt(spark, sf_dir):
    """sql_entry_unpivot must equal the DataFrame unpivot of the same
    wide aggregate (parser surface vs API surface, one semantics)."""
    from etl_cnc_spark.registry import load_all

    got = {
        (r["l_returnflag"], r["metric"]): r["val"]
        for r in load_all()["sql_entry_unpivot"].build(spark, sf_dir).collect()
    }
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("price_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    want = {
        (r["l_returnflag"], r["metric"]): r["val"]
        for r in wide.unpivot(
            "l_returnflag",
            ["qty", "price_cents", "n_rows"],
            "metric",
            "val",
        ).collect()
    }
    assert got == want


def test_distribute_by_injects_layout_exchange(spark, sf_dir):
    """DISTRIBUTE BY must add a hashpartitioning exchange on the key
    (the clause's entire point); content equality is the oracle's
    job."""
    import contextlib
    import io

    from etl_cnc_spark.registry import load_all

    df = load_all()["sql_entry_distribute_by"].build(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue().replace(" ", "").lower()
    assert "hashpartitioning(o_custkey" in plan, plan


def test_lateral_alias_chain_matches_manual(spark, sf_dir):
    """The two-deep alias chain must equal the manually-expanded
    expressions (third path besides the two engines' rewrites)."""
    import duckdb

    from etl_cnc_spark.registry import load_all

    rows = duckdb.execute(
        "SELECT l_returnflag,"
        " CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT),"
        " CAST(sum(CAST(floor(l_extendedprice*l_discount*100 + 0.5) AS BIGINT))"
        "      AS BIGINT)"
        f" FROM '{sf_dir}/lineitem.parquet' GROUP BY 1"
    ).fetchall()
    out = {
        r["l_returnflag"]: r
        for r in load_all()["sql_entry_lateral_alias"].build(spark, sf_dir).collect()
    }
    assert set(out) == {r[0] for r in rows}
    for flag, gross, disc in rows:
        row = out[flag]
        assert row["gross_cents"] == gross
        assert row["net_cents"] == gross - disc
        import math
        assert math.isclose(
            row["net"], math.floor((gross - disc) / 100.0 * 1e4 + 0.5) / 1e4
        )
