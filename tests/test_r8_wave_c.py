"""Independent-recomputation properties for the round-8 wave-C graph
keys (local clustering coefficient, truncated harmonic centrality,
rich-club curve): pure-Python graph algorithms over the same
DuckDB-derived trade edges — a third engine besides Spark and DuckDB."""

from __future__ import annotations

from collections import defaultdict, deque

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

EDGES_SQL = """
    SELECT c.c_nationkey AS u, s.s_nationkey AS v,
           CAST(count(*) AS BIGINT) AS w
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY c.c_nationkey, s.s_nationkey
"""


def _edges(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _und(con):
    rows = con.execute(EDGES_SQL).fetchall()
    und = {
        (min(u, v), max(u, v)) for u, v, _ in rows if u != v
    }
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    return und, adj


def _sparse(con, topk=3, drop_self=False):
    """Top-k heaviest lanes per source (w desc, v asc tie-break).

    graph_harmonic_centrality ranks ALL lanes (self-loops eat top-k
    slots but never shorten a distance); graph_rich_club drops
    self-loops BEFORE ranking — mirror both."""
    rows = con.execute(EDGES_SQL).fetchall()
    by_u = defaultdict(list)
    for u, v, w in rows:
        if drop_self and u == v:
            continue
        by_u[u].append((-w, v))
    out = set()
    for u, lst in by_u.items():
        for _, v in sorted(lst)[:topk]:
            out.add((u, v))
    return out


def test_clustering_coefficient_matches_python(spark, sf_dir):
    con = _edges(sf_dir)
    und, adj = _und(con)
    out = {
        r["nationkey"]: r
        for r in REGISTRY["graph_clustering_coefficient"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(out) == set(adj)
    for node, nbrs in adj.items():
        deg = len(nbrs)
        tri = sum(
            1
            for x in nbrs
            for y in nbrs
            if x < y and (min(x, y), max(x, y)) in und
        )
        cc = 2.0 * tri / (deg * (deg - 1)) if deg >= 2 else 0.0
        row = out[node]
        assert row["degree"] == deg
        assert row["tri_count"] == tri
        assert abs(row["local_cc"] - cc) < 1e-3


def test_harmonic_centrality_matches_bfs(spark, sf_dir):
    con = _edges(sf_dir)
    sparse = _sparse(con)
    fwd = defaultdict(set)
    for u, v in sparse:
        if u != v:
            fwd[u].add(v)
    nodes = [r[0] for r in con.execute("SELECT n_nationkey FROM nation").fetchall()]
    out = {
        r["nationkey"]: r
        for r in REGISTRY["graph_harmonic_centrality"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(out) == set(nodes)
    for src in nodes:
        dist = {src: 0}
        q = deque([src])
        while q:
            cur = q.popleft()
            if dist[cur] >= 4:
                continue
            for nb in fwd.get(cur, ()):
                if nb not in dist:
                    dist[nb] = dist[cur] + 1
                    q.append(nb)
        reached = [d for v, d in dist.items() if v != src]
        h = sum(1.0 / d for d in reached)
        row = out[src]
        assert row["n_reached"] == len(reached)
        assert abs(row["harmonic"] - h) < 1e-9


def test_rich_club_matches_python(spark, sf_dir):
    con = _edges(sf_dir)
    sparse = _sparse(con, drop_self=True)
    und = {(min(u, v), max(u, v)) for u, v in sparse}
    deg = defaultdict(int)
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    out = {r["k"]: r for r in REGISTRY["graph_rich_club"].build(spark, sf_dir).collect()}
    for k in set(deg.values()) | {min(deg[a], deg[b]) for a, b in und}:
        nk = sum(1 for d in deg.values() if d > k)
        ek = sum(1 for a, b in und if min(deg[a], deg[b]) > k)
        if nk >= 2:
            assert k in out
            row = out[k]
            assert row["n_nodes"] == nk
            assert row["n_edges"] == ek
            assert abs(row["phi"] - 2.0 * ek / (nk * (nk - 1))) < 1e-3
        else:
            assert k not in out


def test_reciprocity_matches_python(spark, sf_dir):
    con = _edges(sf_dir)
    rows = con.execute(EDGES_SQL).fetchall()
    edges = {(u, v) for u, v, _ in rows if u != v}
    recip = sum(1 for u, v in edges if (v, u) in edges)
    row = REGISTRY["graph_reciprocity"].build(spark, sf_dir).collect()[0]
    assert row["n_edges"] == len(edges)
    assert row["n_reciprocated"] == recip
    assert abs(row["reciprocity"] - recip / len(edges)) < 1e-3
    assert 0.0 <= row["reciprocity"] <= 1.0


def test_degree_gini_matches_python(spark, sf_dir):
    con = _edges(sf_dir)
    sparse = _sparse(con, drop_self=True)
    und = {(min(u, v), max(u, v)) for u, v in sparse}
    deg = defaultdict(int)
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    ds = sorted(deg.values())
    n, sd = len(ds), sum(ds)
    gini = (2 * sum((i + 1) * d for i, d in enumerate(ds)) - (n + 1) * sd) / (
        n * sd
    )
    row = REGISTRY["graph_degree_gini"].build(spark, sf_dir).collect()[0]
    assert row["n_nodes"] == n
    assert row["n_degree_total"] == sd
    assert abs(row["degree_gini"] - gini) < 1e-3
    assert 0.0 <= row["degree_gini"] < 1.0
