"""Properties for the round-7 wave-P table-maintenance / streaming
keys: compaction file counts, and exactly-once semantics re-counted
from the raw parquet."""

from __future__ import annotations

import glob

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_compaction_reduces_file_count(spark, sf_dir):
    from etl_cnc_spark.operators.etl import COMPACT_TARGET_FILES

    out = REGISTRY["etl_compact_small_files"].build(spark, sf_dir)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT l_returnflag, count(*),"
            " sum(CAST(l_quantity AS BIGINT)) FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    got = {r["l_returnflag"]: (r["n"], r["qty"]) for r in out.collect()}
    assert got == want
    # the staged dirs: fragmented has many files, compacted exactly N
    frags = glob.glob("/tmp/etlcnc_frag_*/part-*.parquet")
    comps = glob.glob("/tmp/etlcnc_compact_*/part-*.parquet")
    n_rows = sum(n for n, _ in want.values())
    assert len(comps) % COMPACT_TARGET_FILES == 0  # N per staged copy
    assert len(frags) >= len(comps)
    assert len(frags) >= n_rows // 500  # maxRecordsPerFile=500 held


def test_exactly_once_no_duplicates(spark, sf_dir):
    out = REGISTRY["stream_incremental_exactly_once"].build(spark, sf_dir)
    rows = out.collect()
    ids = [r["event_id"] for r in rows]
    assert len(ids) == len(set(ids)), "duplicate event_ids: reprocessing"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    n = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert len(ids) == n
