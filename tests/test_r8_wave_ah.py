"""Independent-recomputation properties for the round-8 wave-AH keys
(Heaps' law fit, consistent-hash sharding)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_heaps_law_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        " ORDER BY doc_id"
    ).fetchall()
    w = 20  # VOCAB_BUCKET_W
    toks_by_bucket: Counter = Counter()
    first_bucket: dict[str, int] = {}
    for doc_id, text in rows:
        b = doc_id // w
        ws = text.split(" ")
        toks_by_bucket[b] += len(ws)
        for t in ws:
            cur = first_bucket.get(t)
            if cur is None or b < cur:
                first_bucket[t] = b
    new_vocab: Counter = Counter(first_bucket.values())
    buckets = sorted(toks_by_bucket)
    cum_n = cum_v = 0
    xs, ys = [], []
    for b in buckets:
        cum_n += toks_by_bucket[b]
        cum_v += new_vocab.get(b, 0)
        xs.append(math.floor(math.log(cum_n) * 1e9 + 0.5) / 1e9)
        ys.append(math.floor(math.log(cum_v) * 1e9 + 0.5) / 1e9)
    x, y = np.array(xs), np.array(ys)
    beta = ((x * y).mean() - x.mean() * y.mean()) / (
        (x * x).mean() - x.mean() ** 2
    )
    k = math.exp(y.mean() - beta * x.mean())
    row = REGISTRY["text_heaps_law"].build(spark, sf_dir).collect()[0]
    assert row["n_points"] == len(buckets)
    assert abs(row["beta"] - beta) < 2e-3
    assert abs(row["k"] - k) < max(2e-2, 1e-3 * k)
    assert 0.0 <= row["r2"] <= 1.0
    # Heaps exponent is sublinear; the tiny synthetic corpus saturates
    # its closed vocabulary almost immediately, so 0 is legitimate
    assert 0.0 <= row["beta"] < 1.0


def _fold(s: str) -> int:
    h = hashlib.md5(s.encode()).hexdigest()
    return sum(
        int(h[p], 16) * 16 ** (12 - (p + 1)) for p in range(12)
    )


def _assign(kpos: int, ring: list[tuple[int, int]]) -> int:
    cands = [(pos, n) for n, pos in ring if pos >= kpos]
    if cands:
        return min(cands)[1]
    return min((pos, n) for n, pos in ring)[1]


def test_consistent_hash_matches_python(spark, sf_dir):
    doc_ids = [
        r[0]
        for r in duckdb.execute(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    ring4 = [
        (n, _fold(f"node{n}:{v}")) for n in range(4) for v in range(8)
    ]
    ring5 = [
        (n, _fold(f"node{n}:{v}")) for n in range(5) for v in range(8)
    ]
    stats: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for did in doc_ids:
        kpos = _fold(f"k:{did}")
        b = _assign(kpos, ring4)
        a = _assign(kpos, ring5)
        stats[b][0] += 1
        stats[b][1] += a != b
    got = {
        r["node"]: r
        for r in REGISTRY["etl_consistent_hash_shards"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(stats)
    total = moved = 0
    for node, (n_keys, n_moved) in stats.items():
        assert got[node]["n_keys"] == n_keys
        assert got[node]["n_moved"] == n_moved
        assert abs(got[node]["moved_frac"] - n_moved / n_keys) < 2e-4
        total += n_keys
        moved += n_moved
    # the consistent-hashing contract: growing 4 -> 5 nodes moves a
    # minority of keys (plain modulo would move ~80%)
    assert moved / total < 0.5
