"""Independent-recomputation property for the round-8 wave-I key
(pipeline_quality_gate_report): the attrition waterfall re-derived
with plain Python Counters, plus the structural waterfall identities
(failed_here sums to total rejects; survivors monotone)."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

RULES = ("too_short", "low_diversity", "repetitive", "exact_dup", "non_en")


def test_quality_gate_matches_python(spark, sf_dir):
    docs = duckdb.execute(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet'"
        " ORDER BY doc_id"
    ).fetchall()
    seen_texts = set()
    flags = []
    for doc_id, lang, text in docs:
        words = text.split(" ")
        tf = Counter(words)
        dup = text in seen_texts
        seen_texts.add(text)
        flags.append(
            (
                len(words) < 15,
                len(tf) / len(words) < 0.35,
                max(tf.values()) / len(words) > 0.20,
                dup,
                lang != "en",
            )
        )
    totals = defaultdict(int)
    here = defaultdict(int)
    for fl in flags:
        for i, f in enumerate(fl):
            if f:
                totals[i + 1] += 1
        for i, f in enumerate(fl):
            if f:
                here[i + 1] += 1
                break
    out = {
        r["rule_order"]: r
        for r in REGISTRY["pipeline_quality_gate_report"]
        .build(spark, sf_dir)
        .collect()
    }
    assert [out[i]["rule"] for i in range(1, 6)] == list(RULES)
    n = len(docs)
    cum = 0
    for i in range(1, 6):
        row = out[i]
        assert row["n_failing_total"] == totals[i], (i, row)
        assert row["n_failed_here"] == here[i], (i, row)
        cum += here[i]
        assert row["survivors_after"] == n - cum
    # waterfall identities
    assert sum(r["n_failed_here"] for r in out.values()) == sum(here.values())
    survivors = [out[i]["survivors_after"] for i in range(1, 6)]
    assert all(a >= b for a, b in zip(survivors, survivors[1:]))
    assert all(
        out[i]["n_failed_here"] <= out[i]["n_failing_total"] for i in range(1, 6)
    )
