"""Independent-recomputation properties for the round-8 wave-M keys
(embedding isotropy, Laspeyres/Paasche/Fisher price indices): numpy
re-derivations, including the O(n^2)-definition cross-check of the
sum-vector isotropy identity."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_isotropy_matches_pairwise_definition(spark, sf_dir):
    V = np.array(
        [
            r[0]
            for r in duckdb.execute(
                f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
            ).fetchall()
        ],
        dtype=np.float64,
    )
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    n = len(Vn)
    s = Vn.sum(axis=0)
    mean_cos = (float(s @ s) - n) / (n * (n - 1))
    # brute-force O(n^2) definition on a slice to validate the identity
    m = min(n, 300)
    G = Vn[:m] @ Vn[:m].T
    brute = (G.sum() - m) / (m * (m - 1))
    ident = (float(Vn[:m].sum(axis=0) @ Vn[:m].sum(axis=0)) - m) / (m * (m - 1))
    assert abs(brute - ident) < 1e-9
    row = REGISTRY["embed_isotropy"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["mean_pairwise_cos"] - mean_cos) < 1e-3
    assert abs(row["mean_vector_norm"] - float(np.linalg.norm(s)) / n) < 1e-3
    assert -1.0 <= row["mean_pairwise_cos"] <= 1.0


def test_price_index_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT l_partkey,"
        " CASE WHEN l_shipdate < TIMESTAMP '1998-07-01' THEN 0 ELSE 1 END,"
        " CAST(l_quantity AS BIGINT),"
        " CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)"
        f" FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    agg = defaultdict(lambda: [0, 0])
    for pk, per, q, e in rows:
        agg[(pk, per)][0] += q
        agg[(pk, per)][1] += e
    parts = {pk for pk, per in agg if (pk, 0) in agg and (pk, 1) in agg}
    se0 = sum(agg[(pk, 0)][1] for pk in parts)
    se1 = sum(agg[(pk, 1)][1] for pk in parts)
    p1q0 = sum(
        agg[(pk, 1)][1] / agg[(pk, 1)][0] * agg[(pk, 0)][0] for pk in parts
    )
    p0q1 = sum(
        agg[(pk, 0)][1] / agg[(pk, 0)][0] * agg[(pk, 1)][0] for pk in parts
    )
    lasp = p1q0 / se0
    paas = se1 / p0q1
    row = REGISTRY["orders_price_index"].build(spark, sf_dir).collect()[0]
    assert row["n_parts"] == len(parts)
    assert abs(row["laspeyres"] - lasp) < 1e-3
    assert abs(row["paasche"] - paas) < 1e-3
    assert abs(row["fisher"] - (lasp * paas) ** 0.5) < 1e-3
    # Fisher lies between (or at) Laspeyres and Paasche
    lo, hi = sorted((row["laspeyres"], row["paasche"]))
    assert lo - 1e-4 <= row["fisher"] <= hi + 1e-4
