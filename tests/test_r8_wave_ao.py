"""Independent-recomputation properties for the round-8 wave-AO keys
(multiclass F1 report, inline VALUES join SQL surface)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

_W = np.array([((i * 37) % 19 - 9) / 10.0 for i in range(1, 65)])


def test_multiclass_f1_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    y = np.array([r[0] for r in rows], dtype=np.int64)
    emb = np.array([r[1] for r in rows], dtype=np.float64)
    pred = np.minimum(
        9, np.maximum(0, np.floor((emb @ _W + 0.5 + 3.0) / 0.6))
    ).astype(np.int64)
    f1s = {}
    stp = sfp = sfn = 0
    for c in range(10):
        tp = int(((y == c) & (pred == c)).sum())
        fp = int(((y != c) & (pred == c)).sum())
        fn = int(((y == c) & (pred != c)).sum())
        f1s[c] = (tp, fp, fn)
        stp += tp
        sfp += fp
        sfn += fn
    macro = (
        sum(
            math.floor(
                (0.0 if 2 * tp + fp + fn == 0 else 2 * tp / (2 * tp + fp + fn))
                * 1e9
                + 0.5
            )
            for tp, fp, fn in f1s.values()
        )
        / 1e9
        / 10
    )
    micro = 2 * stp / (2 * stp + sfp + sfn)
    got = {
        r["class"]: r
        for r in REGISTRY["ml_multiclass_f1"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(range(10))
    for c, (tp, fp, fn) in f1s.items():
        row = got[c]
        assert row["support"] == tp + fn
        prec = 0.0 if tp + fp == 0 else tp / (tp + fp)
        rec = 0.0 if tp + fn == 0 else tp / (tp + fn)
        f1 = 0.0 if 2 * tp + fp + fn == 0 else 2 * tp / (2 * tp + fp + fn)
        assert abs(row["precision_"] - prec) < 2e-4
        assert abs(row["recall_"] - rec) < 2e-4
        assert abs(row["f1"] - f1) < 2e-4
        assert abs(row["macro_f1"] - macro) < 2e-4
        assert abs(row["micro_f1"] - micro) < 2e-4
    # micro-F1 equals accuracy when every row gets one prediction
    acc = (y == pred).mean()
    assert abs(got[0]["micro_f1"] - acc) < 2e-4
    # supports partition the corpus
    assert sum(r["support"] for r in got.values()) == len(y)


def test_values_join_matches_duckdb(spark, sf_dir):
    tiers = {
        "1-URGENT": "hot",
        "2-HIGH": "hot",
        "3-MEDIUM": "warm",
        "4-NOT SPECIFIED": "cold",
        "5-LOW": "cold",
    }
    rows = duckdb.execute(
        "SELECT o_orderpriority,"
        " count(*), sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))"
        f" FROM '{sf_dir}/orders.parquet' GROUP BY 1"
    ).fetchall()
    agg: Counter = Counter()
    cents: Counter = Counter()
    for pri, n, c in rows:
        agg[tiers[pri]] += n
        cents[tiers[pri]] += c
    got = {
        r["tier"]: r
        for r in REGISTRY["sql_entry_values"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for tier in agg:
        assert got[tier]["n_orders"] == agg[tier]
        assert got[tier]["cents"] == cents[tier]
