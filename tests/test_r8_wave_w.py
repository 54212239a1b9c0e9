"""Independent-recomputation properties for the round-8 wave-W keys
(eigenvector centrality, p-chart, char-bigram entropy, IPv4 classify)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_eigenvector_centrality_matches_python(spark, sf_dir):
    edges_dir = duckdb.execute(f"""
        SELECT c.c_nationkey, s.s_nationkey, count(*)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{sf_dir}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    """).fetchall()
    w: dict[tuple[int, int], int] = defaultdict(int)
    for u, v, c in edges_dir:
        w[(u, v)] += c
        w[(v, u)] += c
    nodes = [
        r[0]
        for r in duckdb.execute(
            f"SELECT n_nationkey FROM '{sf_dir}/nation.parquet'"
        ).fetchall()
    ]
    scale = 1_000_000
    x = {v: scale for v in nodes}
    for _ in range(4):
        raw = {
            v: sum(x[u] * wt for (u, vv), wt in w.items() if vv == v)
            for v in nodes
        }
        mx = max(raw.values())
        x = {v: raw[v] * scale // mx for v in nodes}
    tot = sum(x.values())
    got = {
        r["nationkey"]: r
        for r in REGISTRY["graph_eigenvector_centrality"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v]["score_fixed"] == x[v]
        assert (
            abs(got[v]["score_share"] - x[v] / tot) < 2e-4
        )
    # power iteration with max-normalization pins the top node
    assert max(r["score_fixed"] for r in got.values()) == scale


def test_p_chart_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d'), count(*),"
        f" count_if(event_type = 'purchase') FROM '{sf_dir}/events.parquet'"
        " GROUP BY 1"
    ).fetchall()
    tn = sum(r[1] for r in rows)
    tk = sum(r[2] for r in rows)
    pbar = tk / tn
    got = {
        r["day"]: r
        for r in REGISTRY["events_spc_p_chart"].build(spark, sf_dir).collect()
    }
    assert set(got) == {r[0] for r in rows}
    n_ooc = 0
    for day, n, k in rows:
        sig = 3 * math.sqrt(pbar * (1 - pbar) / n)
        row = got[day]
        assert row["n"] == n and row["k"] == k
        assert abs(row["p"] - k / n) < 2e-4
        assert abs(row["ucl"] - (pbar + sig)) < 2e-4
        assert abs(row["lcl"] - max(0.0, pbar - sig)) < 2e-4
        expect_ooc = k / n > pbar + sig or k / n < pbar - sig
        assert row["out_of_control"] == expect_ooc
        n_ooc += expect_ooc
    # a stationary synthetic stream should be mostly in control
    assert n_ooc <= len(rows) // 2


def test_char_bigram_entropy_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'"
        " WHERE length(text) >= 2"
    ).fetchall()
    big: dict[str, Counter] = defaultdict(Counter)
    for lang, text in rows:
        for i in range(len(text) - 1):
            big[lang][text[i : i + 2]] += 1
    got = {
        r["lang"]: r
        for r in REGISTRY["text_char_bigram_entropy"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(big)
    for lang, c2 in big.items():
        n = sum(c2.values())
        c1 = Counter()
        for g, c in c2.items():
            c1[g[0]] += c
        h2 = math.log(n) - sum(c * math.log(c) for c in c2.values()) / n
        h1 = math.log(n) - sum(c * math.log(c) for c in c1.values()) / n
        row = got[lang]
        assert row["n_bigrams"] == n
        assert abs(row["h_bigram"] - h2) < 2e-4
        assert abs(row["h_prefix"] - h1) < 2e-4
        assert abs(row["h_cond"] - (h2 - h1)) < 2e-4
        assert abs(row["perplexity"] - math.exp(h2 - h1)) < 2e-3
        # conditioning never increases entropy
        assert row["h_cond"] <= row["h_bigram"] + 1e-9


def test_inet_matches_python(spark, sf_dir):
    uids = [
        r[0]
        for r in duckdb.execute(
            f"SELECT user_id FROM '{sf_dir}/events.parquet'"
        ).fetchall()
    ]
    per_class_n: Counter = Counter()
    per_class_ips: dict[str, set] = defaultdict(set)
    per_class_nets: dict[str, set] = defaultdict(set)
    for uid in uids:
        ip = (uid * 2654435761) % 2**32
        a, b = ip >> 24, (ip >> 16) & 255
        if a == 10 or (a == 172 and 16 <= b <= 31) or (a == 192 and b == 168):
            cls = "private"
        elif a == 127:
            cls = "loopback"
        elif a == 169 and b == 254:
            cls = "link_local"
        elif 224 <= a <= 239:
            cls = "multicast"
        elif a >= 240:
            cls = "reserved"
        else:
            cls = "public"
        per_class_n[cls] += 1
        per_class_ips[cls].add(ip)
        per_class_nets[cls].add(ip >> 8)
    got = {
        r["ip_class"]: r
        for r in REGISTRY["fn_inet"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(per_class_n)
    for cls, n in per_class_n.items():
        assert got[cls]["n"] == n
        assert got[cls]["n_distinct_ips"] == len(per_class_ips[cls])
        assert got[cls]["n_slash24"] == len(per_class_nets[cls])
