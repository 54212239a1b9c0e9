"""Independent-recomputation properties for the round-8 wave-G keys
(IVF nprobe sweep, Lilliefors, column entropy): numpy/math
re-derivations plus structural properties (recall monotone in nprobe,
erf approximation accuracy)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_nprobe_sweep_monotone_and_exact_at_full(spark, sf_dir):
    rows = sorted(
        REGISTRY["sim_ivf_nprobe_sweep"].build(spark, sf_dir).collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 3, 4]
    recalls = [r["recall_at_5"] for r in rows]
    # more probed cells can only add candidates -> recall is monotone
    assert all(a <= b + 1e-9 for a, b in zip(recalls, recalls[1:]))
    assert all(0.0 <= r <= 1.0 for r in recalls)
    assert all(r["n_queries"] == 50 for r in rows)
    # nprobe=2 must agree with the registered single-point recall report
    rep = REGISTRY["sim_recall_report"].build(spark, sf_dir).collect()[0]
    two = [r for r in rows if r["nprobe"] == 2][0]
    assert abs(two["recall_at_5"] - rep["recall_at_5"]) < 1e-9


def test_lilliefors_matches_numpy(spark, sf_dir):
    q = np.array(
        [
            r[0]
            for r in duckdb.execute(
                f"SELECT CAST(l_quantity AS BIGINT) FROM '{sf_dir}/lineitem.parquet'"
            ).fetchall()
        ],
        dtype=np.float64,
    )
    n = len(q)
    mu = q.mean()
    sigma = q.std(ddof=1)
    vals, counts = np.unique(q, return_counts=True)
    cum = np.cumsum(counts)
    phi = np.array([0.5 * (1 + math.erf((v - mu) / sigma / math.sqrt(2))) for v in vals])
    d = max(
        np.abs(cum / n - phi).max(), np.abs((cum - counts) / n - phi).max()
    )
    row = REGISTRY["stat_lilliefors"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["mean_q"] - mu) < 1e-3
    assert abs(row["sd_q"] - sigma) < 1e-3
    # engine Phi uses the A&S 7.1.26 approximation (|eps| < 1.5e-7)
    assert abs(row["d_stat"] - d) < 1e-3
    assert row["rejected"] == (d > 0.886 / math.sqrt(n))
    # quantity is uniform on a grid, decidedly not normal
    assert row["rejected"]


def test_column_entropy_matches_python(spark, sf_dir):
    out = {
        r["tbl_col"]: r
        for r in REGISTRY["etl_column_entropy"].build(spark, sf_dir).collect()
    }
    assert len(out) == 6
    for tbl_col, row in out.items():
        tbl, col = tbl_col.split(".")
        vals = [
            r[0]
            for r in duckdb.execute(
                f"SELECT {col} FROM '{sf_dir}/{tbl}.parquet'"
            ).fetchall()
        ]
        c = Counter(vals)
        n = len(vals)
        ent = sum((v / n) * -math.log2(v / n) for v in c.values())
        assert row["n"] == n
        assert row["n_distinct"] == len(c)
        assert abs(row["entropy_bits"] - ent) < 1e-3
        assert abs(row["top_share"] - max(c.values()) / n) < 1e-3
        # entropy is bounded by log2(NDV)
        assert row["entropy_bits"] <= math.log2(len(c)) + 1e-6
