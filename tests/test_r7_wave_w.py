"""Properties for the round-7 wave-W engine-surface keys (polymorphic
UDTF, parameterized SQL, CACHE TABLE)."""

from __future__ import annotations

import contextlib
import io

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_polymorphic_udtf_matches_python(spark, sf_dir):
    names = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT n_name FROM '{sf_dir}/nation.parquet'")
        .fetchall()
    ]
    out = REGISTRY["udtf_polymorphic"].build(spark, sf_dir).collect()[0]
    assert out["col_name"] == "n_name"
    assert out["n_rows"] == len(names)
    assert out["n_distinct"] == len(set(names))
    lens = [len(n.encode()) for n in names]
    assert out["min_len"] == min(lens)
    assert out["max_len"] == max(lens)


def test_parameterized_binds_values_not_strings(spark, sf_dir):
    """The same template with different args must yield different
    results — proving real binding, not a constant query."""
    from etl_cnc_spark.catalog import register_views

    register_views(spark, sf_dir)
    t = """
        SELECT CAST(count(*) AS BIGINT) AS n FROM orders
        WHERE o_orderstatus = :status AND o_totalprice >= :min_total
    """
    a = spark.sql(t, args={"status": "F", "min_total": 50000.0}).collect()[0]["n"]
    b = spark.sql(t, args={"status": "F", "min_total": 200000.0}).collect()[0]["n"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    wa = con.execute(
        "SELECT count(*) FROM orders WHERE o_orderstatus = 'F'"
        " AND o_totalprice >= 50000.0"
    ).fetchone()[0]
    wb = con.execute(
        "SELECT count(*) FROM orders WHERE o_orderstatus = 'F'"
        " AND o_totalprice >= 200000.0"
    ).fetchone()[0]
    assert (a, b) == (wa, wb)
    assert a > b


def test_cache_table_reads_in_memory(spark, sf_dir):
    df = REGISTRY["sql_entry_cache_table"].build(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "InMemory" in plan, plan
    # cleanliness: drop the cache so the shared session doesn't leak
    spark.sql("UNCACHE TABLE IF EXISTS etlcnc_hot_orders")


def test_udtf_polymorphic_partition_invariant(spark, sf_dir):
    """WITH SINGLE PARTITION pins the one-instance terminate() fold:
    the result must be ONE row with full-table counts even when the
    input arrives pre-split across many partitions (without the
    clause the UDTF instantiates per split — one row per partition,
    caught by the r11 partition-invariance sweep)."""
    from etl_cnc_spark.catalog import table

    n = table(spark, sf_dir, "nation").select("n_name").repartition(7)
    n.createOrReplaceTempView("etlcnc_nation_udtf")
    # the registered function survives from the build; re-run the SQL
    # against the multi-partition view
    from etl_cnc_spark.registry import REGISTRY as R

    R["udtf_polymorphic"].build(spark, sf_dir)  # registers the UDTF
    n.createOrReplaceTempView("etlcnc_nation_udtf")  # re-point at 7 parts
    out = spark.sql(
        """
        SELECT p.n_rows, p.n_distinct
        FROM etlcnc_profile_col(
            TABLE(SELECT n_name FROM etlcnc_nation_udtf)
            WITH SINGLE PARTITION) p
        """
    ).collect()
    assert len(out) == 1
    assert out[0]["n_rows"] == 25
    assert out[0]["n_distinct"] == 25
    # cleanliness: drop the repartition(7) view so the shared session
    # doesn't leak a 7-partition frame to later tests (mirrors the
    # UNCACHE cleanup in test_cache_table_reads_in_memory)
    spark.catalog.dropTempView("etlcnc_nation_udtf")
