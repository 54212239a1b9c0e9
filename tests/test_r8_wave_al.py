"""Independent-recomputation properties for the round-8 wave-AL keys
(Johnson-Lindenstrauss projection audit, dedup importance weights)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_random_projection_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        " WHERE vec_id < 50 ORDER BY vec_id"
    ).fetchall()
    eq = np.floor(
        np.array([r[1] for r in rows], dtype=np.float64) * 1e6 + 0.5
    ).astype(np.int64)
    k = 16
    signs = np.array(
        [
            [1 - 2 * ((73 * i + 149 * j + i * j) % 2) for j in range(1, k + 1)]
            for i in range(1, 65)
        ],
        dtype=np.int64,
    )
    y = eq @ signs
    n = len(eq)
    rqs = []
    for a in range(n):
        for b in range(a + 1, n):
            d64 = int(((eq[a] - eq[b]) ** 2).sum())
            dproj = int(((y[a] - y[b]) ** 2).sum())
            rqs.append(math.floor(dproj / k / d64 * 1e9 + 0.5))
    rqs = np.array(rqs, dtype=np.int64)
    row = (
        REGISTRY["embed_random_projection"].build(spark, sf_dir).collect()[0]
    )
    assert row["n_pairs"] == len(rqs)
    assert abs(row["mean_ratio"] - rqs.sum() / 1e9 / len(rqs)) < 2e-4
    assert abs(row["min_ratio"] - rqs.min() / 1e9) < 2e-4
    assert abs(row["max_ratio"] - rqs.max() / 1e9) < 2e-4
    frac = ((rqs >= int(0.8e9)) & (rqs <= int(1.2e9))).mean()
    assert abs(row["frac_within_20pct"] - frac) < 2e-4
    # JL promise: the mean distortion concentrates near 1
    assert 0.5 < row["mean_ratio"] < 2.0


def test_dedup_weights_match_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    sizes: Counter = Counter(
        hashlib.md5(t.encode()).hexdigest() for _, _, t in rows
    )
    agg: dict[str, list] = defaultdict(lambda: [0, 0, 0])
    for _, lang, t in rows:
        ck = hashlib.md5(t.encode()).hexdigest()
        sz = sizes[ck]
        agg[lang][0] += 1
        agg[lang][1] += sz == 1
        agg[lang][2] += math.floor(1e9 / sz + 0.5)
    got = {
        r["lang"]: r
        for r in REGISTRY["pipeline_dedup_weights"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    total_effective = 0.0
    for lang, (n, uniq, wq) in agg.items():
        row = got[lang]
        assert row["n_docs"] == n
        assert row["n_unique"] == uniq
        assert abs(row["effective_docs"] - wq / 1e9) < 2e-3
        assert abs(row["effective_frac"] - wq / 1e9 / n) < 2e-4
        total_effective += row["effective_docs"]
    # weights telescope: total effective docs == distinct contents
    assert abs(total_effective - len(sizes)) < 1e-2
