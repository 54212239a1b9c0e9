"""Independent-recomputation property for the round-8 wave-O key
(ml_f1_threshold_sweep): the P/R/F1 curve re-derived with numpy and
the argmax-F1 flag checked."""

from __future__ import annotations

import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_f1_sweep_matches_numpy(spark, sf_dir):
    import duckdb

    scores = duckdb.execute(
        "SELECT label % 2, "
        + REGISTRY["ml_f1_threshold_sweep"].oracle.split("WITH scored AS (")[1]
        .split("FROM embeddings")[0]
        .replace("SELECT label % 2 AS y, (", "(")
        .replace(") AS p", ")")
        + f" FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    y = np.array([r[0] for r in scores], dtype=np.int64)
    p = np.array([r[1] for r in scores], dtype=np.float64)
    bins = np.minimum(99, np.floor(p * 100).astype(np.int64))
    p_all = int(y.sum())
    out = {
        round(r["threshold"] * 100): r
        for r in REGISTRY["ml_f1_threshold_sweep"].build(spark, sf_dir).collect()
    }
    present = sorted(set(bins.tolist()))
    assert set(out) == set(present)
    f1s = {}
    for b in present:
        m = bins >= b
        pp = int(m.sum())
        tp = int(y[m].sum())
        f1 = 2 * tp / (pp + p_all)
        f1s[b] = f1
        row = out[b]
        assert row["predicted_pos"] == pp
        assert row["tp"] == tp
        assert abs(row["precision"] - tp / pp) < 1e-3
        assert abs(row["recall"] - tp / p_all) < 1e-3
        assert abs(row["f1"] - f1) < 1e-3
    best = max(f1s.values())
    for b in present:
        assert out[b]["is_best"] == (abs(f1s[b] - best) < 1e-12)
    assert sum(1 for r in out.values() if r["is_best"]) >= 1
