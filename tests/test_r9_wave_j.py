"""Independent-recomputation properties for the round-9 wave-J keys
(token-budget allocation, Qini/AUUC uplift evaluation)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from etl_cnc_spark.registry import load_all
from etl_cnc_spark.llm.text import EN_STOPWORDS

REGISTRY = load_all()


def test_budget_allocation_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    stats = defaultdict(lambda: [0, 0, 0])  # n_docs, tokens, qq_sum
    stop = set(EN_STOPWORDS)
    for source, text in rows:
        ws = text.split(" ")
        nw = len(ws)
        swl = sum(len(w) for w in ws)
        ns = sum(1 for w in ws if w in stop)
        q = (
            0.5 * min(nw / 100.0, 1.0)
            + 0.3 * (1.0 - min(swl / nw / 10.0, 1.0))
            + 0.2 * min(10.0 * ns / nw, 1.0)
        )
        st = stats[source]
        st[0] += 1
        st[1] += nw
        st[2] += math.floor(q * 1e9 + 0.5)
    per_src = {
        s: (nd, tok, qq // nd) for s, (nd, tok, qq) in stats.items()
    }
    budget = sum(tok for _, tok, _ in per_src.values()) // 2
    order = sorted(per_src, key=lambda s: (-per_src[s][2], s))
    got = {
        r["source"]: r
        for r in REGISTRY["pipeline_budget_allocation"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(per_src)
    cum = 0
    total_alloc = 0
    for rank, src in enumerate(order, 1):
        nd, tok, aq = per_src[src]
        alloc = min(tok, max(0, budget - cum))
        cum += tok
        row = got[src]
        assert row["quality_rank"] == rank
        assert row["n_docs"] == nd and row["tokens"] == tok
        assert abs(row["avg_quality"] - aq / 1e9) < 2e-4
        assert row["alloc_tokens"] == alloc
        assert abs(row["take_fraction"] - alloc / tok) < 2e-4
        total_alloc += alloc
    # the greedy fill spends exactly the budget (enough supply exists)
    assert total_alloc == budget


def test_qini_auuc_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT user_id % 2, count_if(event_type = 'click'),
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        FROM '{sf_dir}/events.parquet' GROUP BY user_id
    """).fetchall()
    grid = defaultdict(lambda: [0, 0, 0, 0])  # nt nc yt yc
    for treated, s, y in rows:
        g = grid[s]
        if treated:
            g[0] += 1
            g[2] += y
        else:
            g[1] += 1
            g[3] += y
    tn = len(rows)
    tnt = sum(g[0] for g in grid.values())
    tnc = sum(g[1] for g in grid.values())
    tyt = sum(g[2] for g in grid.values())
    tyc = sum(g[3] for g in grid.values())
    cnt = cnc = cyt = cyc = cn = 0
    prev_cn, prev_q = 0, 0.0
    areaq = 0
    for s in sorted(grid, reverse=True):
        nt, nc, yt, yc = grid[s]
        cnt += nt
        cnc += nc
        cyt += yt
        cyc += yc
        cn += nt + nc
        q = cyt if cnc == 0 else cyt - cyc * cnt / cnc
        areaq += math.floor(
            (cn - prev_cn) * (q + prev_q) / 2.0 / tn * 1e9 + 0.5
        )
        prev_cn, prev_q = cn, q
    auuc = areaq / 1e9
    qini_final = tyt - tyc * tnt / tnc
    row = REGISTRY["ml_qini_auuc"].build(spark, sf_dir).collect()[0]
    assert row["n_users"] == tn
    assert (row["n_treated"], row["n_control"]) == (tnt, tnc)
    assert abs(row["ate"] - (tyt / tnt - tyc / tnc)) < 1e-4
    assert abs(row["qini_final"] - qini_final) < max(1e-3, abs(qini_final) * 1e-4)
    assert abs(row["auuc"] - auuc) < max(1e-3, abs(auuc) * 1e-4)
    assert abs(row["qini_coefficient"] - (auuc - 0.5 * qini_final)) < 2e-3
    # random targeting (score independent of uplift) gives coefficient
    # near 0 relative to the curve scale — sanity-bound it
    assert abs(row["qini_coefficient"]) < max(10.0, abs(qini_final))
