"""Independent-recomputation property for the round-8 wave-L key
(stat_tail_index_hill): the Hill estimator and mean excess re-derived
with numpy from the raw purchase values."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

K = 100


def test_hill_matches_numpy(spark, sf_dir):
    v = np.array(
        [
            r[0]
            for r in duckdb.execute(
                "SELECT CAST(floor(value*100 + 0.5) AS BIGINT) FROM"
                f" '{sf_dir}/events.parquet' WHERE event_type = 'purchase'"
            ).fetchall()
        ],
        dtype=np.int64,
    )
    desc = np.sort(v)[::-1]
    u = desc[K - 1]  # k-th largest (grid value)
    above = v[v > u]
    xi = float(np.log(above / u).sum()) / K
    mean_excess = float((above - u).sum()) / 100.0 / K
    row = REGISTRY["stat_tail_index_hill"].build(spark, sf_dir).collect()[0]
    assert row["k"] == K
    assert row["n_above"] == len(above)
    assert abs(row["threshold"] - u / 100.0) < 1e-9
    assert abs(row["xi_hill"] - xi) < 1e-3
    assert abs(row["mean_excess"] - mean_excess) < 1e-3
    assert row["xi_hill"] >= 0.0
    # ties at the threshold contribute ln(u/u) = 0 by construction
    assert row["n_above"] <= K
    assert not math.isnan(row["xi_hill"])
