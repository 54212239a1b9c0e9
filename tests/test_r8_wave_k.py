"""Independent-recomputation property for the round-8 wave-K key
(orders_abc_migration): the two-period Pareto classification and the
transition matrix re-derived with plain Python."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

SPLIT = "1998-07-01"


def _classes(sf_dir, pred):
    rows = duckdb.execute(
        "SELECT o_custkey,"
        " CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)"
        f" FROM '{sf_dir}/orders.parquet' WHERE {pred} GROUP BY o_custkey"
    ).fetchall()
    total = sum(r[1] for r in rows)
    out = {}
    cum = 0
    for k, rev in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += rev
        bps = cum * 10000 // total
        out[k] = "A" if bps <= 7000 else "B" if bps <= 9000 else "C"
    return out


def test_abc_migration_matches_python(spark, sf_dir):
    p1 = _classes(sf_dir, f"o_orderdate < TIMESTAMP '{SPLIT}'")
    p2 = _classes(sf_dir, f"o_orderdate >= TIMESTAMP '{SPLIT}'")
    expected = Counter()
    for k in set(p1) | set(p2):
        expected[(p1.get(k, "N"), p2.get(k, "N"))] += 1
    out = {
        (r["class_from"], r["class_to"]): r["n_customers"]
        for r in REGISTRY["orders_abc_migration"].build(spark, sf_dir).collect()
    }
    assert out == dict(expected)
    # every classified customer lands in exactly one cell
    assert sum(out.values()) == len(set(p1) | set(p2))
    # the diagonal (class-stable customers) should be non-empty
    assert any(out.get((c, c), 0) > 0 for c in "ABC")
