"""Independent-recomputation properties for the round-9 wave-H keys
(DCT perceptual hash, Watson's U²)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _phash_py(text: str) -> int:
    n = len(text)
    px = [[ord(text[(r * 8 + c) % n]) for c in range(8)] for r in range(8)]
    coefs = {}
    for u in range(4):
        for v in range(4):
            if (u, v) == (0, 0):
                continue
            s = 0.0
            for r in range(8):
                for c in range(8):
                    s += (
                        px[r][c]
                        * math.cos(math.pi * (2 * r + 1) * u / 16)
                        * math.cos(math.pi * (2 * c + 1) * v / 16)
                    )
            coefs[(u, v)] = math.floor(s * 1e6 + 0.5)
    # lower median of 15 under (value, u, v)
    ordered = sorted((cq, u, v) for (u, v), cq in coefs.items())
    med = ordered[(15 - 1) // 2][0]
    h = 0
    for (u, v), cq in coefs.items():
        if cq > med:
            h |= 1 << (u * 4 + v - 1)
    return h


def test_phash_dct_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT doc_id, source, text FROM '{sf_dir}/documents.parquet'
        WHERE doc_id % 10 = 0
    """).fetchall()
    per_source = defaultdict(list)
    for _, source, text in rows:
        per_source[source].append(_phash_py(text))
    got = {
        r["source"]: r
        for r in REGISTRY["multimodal_phash_dct"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(per_source)
    for src, hashes in per_source.items():
        cnt = Counter(hashes)
        row = got[src]
        assert row["n_docs"] == len(hashes)
        assert row["n_distinct_hashes"] == len(cnt)
        assert row["max_bucket"] == max(cnt.values())
        assert row["candidate_pairs"] == sum(
            c * (c - 1) // 2 for c in cnt.values()
        )
        # 15-bit signature space
        assert all(0 <= h < 2**15 for h in hashes)


def test_watson_u2_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/events.parquet'
        WHERE event_type IN ('click', 'purchase')
    """).fetchall()
    c1 = Counter(v for t, v in rows if t == "click")
    c2 = Counter(v for t, v in rows if t == "purchase")
    n1, n2 = sum(c1.values()), sum(c2.values())
    nn = n1 + n2
    cum1 = cum2 = 0
    s1 = s2 = 0
    for v in sorted(set(c1) | set(c2)):
        cum1 += c1[v]
        cum2 += c2[v]
        d = cum1 * n2 - cum2 * n1
        t = c1[v] + c2[v]
        s1 += t * d
        s2 += t * d * d
    u2 = (s2 - s1 * s1 / nn) / (n1 * n2 * nn * nn)
    row = REGISTRY["stat_watson_u2"].build(spark, sf_dir).collect()[0]
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["u2_stat"] - u2) < 2e-4
    # U^2 <= W^2 (centering can only reduce the integral) and >= 0
    w2 = s2 / (n1 * n2 * nn * nn)
    assert -1e-9 <= row["u2_stat"] <= w2 + 1e-9
    assert row["rejected"] == (u2 > 0.187)
