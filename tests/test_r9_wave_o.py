"""Independent-recomputation properties for the round-9 wave-O keys
(runs up/down, named WINDOW SQL, char entropy rate)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_runs_up_down_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT CAST(ts AS DATE) AS day, count(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1
    """).fetchall()
    y = [r[1] for r in rows]
    sgns = []
    for a, b in zip(y, y[1:]):
        if b > a:
            sgns.append(1)
        elif b < a:
            sgns.append(-1)
    n = len(sgns) + 1
    r = 1 + sum(1 for a, b in zip(sgns, sgns[1:]) if a != b)
    e = (2 * n - 1) / 3
    z = (r - e) / math.sqrt((16 * n - 29) / 90)
    row = REGISTRY["stat_runs_up_down"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["n_runs"] == r
    assert abs(row["expected_runs"] - e) < 1e-4
    assert abs(row["z"] - z) < 5e-3
    assert row["nonrandom"] == (abs(z) > 1.96)
    # runs count bounded by the sign-sequence length
    assert 1 <= r <= n - 1 + 1


def test_named_window_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT o_orderpriority, CAST(o_orderkey AS BIGINT),
               CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/orders.parquet'
    """).fetchall()
    per = defaultdict(list)
    for p, k, c in rows:
        per[p].append((c, k))
    got = defaultdict(list)
    for r in REGISTRY["sql_entry_named_window"].build(spark, sf_dir).collect():
        got[r["o_orderpriority"]].append(r)
    assert set(got) == set(per)
    for p, items in per.items():
        ordered = sorted(items, key=lambda ck: (-ck[0], ck[1]))
        top = ordered[:3]
        grows = sorted(got[p], key=lambda r: r["rn"])
        assert [r["o_orderkey"] for r in grows] == [k for _, k in top]
        running = 0
        prev = None
        for r, (c, _) in zip(grows, top):
            running += c
            assert r["cents"] == c
            assert r["running_cents"] == running
            assert r["prev_cents"] == prev
            prev = c


def test_char_entropy_rate_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    bi = defaultdict(Counter)
    tri = defaultdict(Counter)
    for lang, text in rows:
        for i in range(len(text) - 1):
            bi[lang][text[i : i + 2]] += 1
        for i in range(len(text) - 2):
            tri[lang][text[i : i + 3]] += 1

    def h(cnt):
        n = sum(cnt.values())
        hq = sum(
            c * math.floor(-math.log2(c / n) * 1e9 + 0.5)
            for c in cnt.values()
        )
        return hq / 1e9 / n, n

    got = {
        r["lang"]: r
        for r in REGISTRY["text_char_entropy_rate"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(bi)
    for lang in bi:
        h2, n2 = h(bi[lang])
        h3, n3 = h(tri[lang])
        row = got[lang]
        assert (row["n_bigrams"], row["n_trigrams"]) == (n2, n3)
        assert abs(row["h_bigram"] - h2) < 2e-4
        assert abs(row["h_trigram"] - h3) < 2e-4
        assert abs(row["entropy_rate_bits"] - (h3 - h2)) < 3e-4
        # block entropies grow with order; the conditional rate is
        # positive and below the unconditional bigram entropy
        assert 0 < row["entropy_rate_bits"] <= row["h_trigram"]
        assert row["h_trigram"] >= row["h_bigram"] - 1e-9
