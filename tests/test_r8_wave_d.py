"""Independent-recomputation properties for the round-8 wave-D ETL
discovery keys (inclusion-dependency probing, unique-key probing,
freshness report): re-derived with DuckDB-fetched raw values and plain
Python set arithmetic — a third path besides the Spark build and the
registered oracle SQL."""

from __future__ import annotations

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in (
        "orders",
        "lineitem",
        "customer",
        "supplier",
        "nation",
        "part",
        "events",
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_fk_discovery_matches_sets(spark, sf_dir):
    con = _con(sf_dir)
    out = {
        (r["child_col"], r["parent_col"]): r
        for r in REGISTRY["etl_fk_discovery"].build(spark, sf_dir).collect()
    }
    assert len(out) == 7
    for (child_col, parent_col), row in out.items():
        ct, cc = child_col.split(".")
        pt, pc = parent_col.split(".")
        child = {v for (v,) in con.execute(f"SELECT DISTINCT {cc} FROM {ct}").fetchall()}
        parent = {v for (v,) in con.execute(f"SELECT DISTINCT {pc} FROM {pt}").fetchall()}
        contained = len(child & parent)
        assert row["n_child_distinct"] == len(child)
        assert row["n_contained"] == contained
        assert row["is_inclusion"] == (contained == len(child))
        assert abs(row["containment"] - contained / len(child)) < 1e-3
    # the declared true FKs must be discovered, the decoys must not
    assert out[("orders.o_custkey", "customer.c_custkey")]["is_inclusion"]
    assert not out[("orders.o_orderkey", "customer.c_custkey")]["is_inclusion"]
    assert not out[("part.p_size", "nation.n_nationkey")]["is_inclusion"]


def test_pk_discovery_matches_sets(spark, sf_dir):
    con = _con(sf_dir)
    out = {
        (r["tbl"], r["key_cols"]): r
        for r in REGISTRY["etl_pk_discovery"].build(spark, sf_dir).collect()
    }
    assert len(out) == 7
    for (tbl, key_cols), row in out.items():
        cols = key_cols.split(",")
        n = con.execute(f"SELECT count(*) FROM {tbl}").fetchone()[0]
        d = con.execute(
            f"SELECT count(*) FROM (SELECT DISTINCT {', '.join(cols)} FROM {tbl})"
        ).fetchone()[0]
        assert row["n_rows"] == n
        assert row["n_distinct"] == d
        assert row["is_unique_key"] == (n == d)
    assert out[("orders", "o_orderkey")]["is_unique_key"]
    assert out[("events", "event_id")]["is_unique_key"]
    assert not out[("orders", "o_custkey")]["is_unique_key"]


def test_freshness_report_matches_python(spark, sf_dir):
    con = _con(sf_dir)
    out = {
        r["tbl"]: r
        for r in REGISTRY["etl_freshness_report"].build(spark, sf_dir).collect()
    }
    assert set(out) == {"orders", "lineitem", "events"}
    for tbl, col in (
        ("orders", "o_orderdate"),
        ("lineitem", "l_shipdate"),
        ("events", "ts"),
    ):
        days = dict(
            con.execute(
                f"SELECT date_diff('day', DATE '1970-01-01', CAST({col} AS DATE)),"
                f" count(*) FROM {tbl} GROUP BY 1"
            ).fetchall()
        )
        lo, hi = min(days), max(days)
        span = hi - lo + 1
        n = sum(days.values())
        cutoff = hi - span // 10
        tail = sum(c for d, c in days.items() if d > cutoff)
        row = out[tbl]
        assert row["n_rows"] == n
        assert row["first_day"] == lo and row["last_day"] == hi
        assert row["span_days"] == span
        assert row["days_present"] == len(days)
        assert abs(row["coverage"] - len(days) / span) < 1e-3
        assert abs(row["tail_share"] - tail / n) < 1e-3
