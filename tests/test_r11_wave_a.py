"""Round-11 wave A: generation-eval text metrics + vocab coverage.

From-scratch Python recomputations (the third engine next to the
Spark/DuckDB hash parity) for text_rouge_l, text_self_bleu and
text_vocab_coverage_curve.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from etl_cnc_spark.registry import REGISTRY, load_all

load_all()

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _pairs(sf_dir):
    rows = duckdb.execute(
        f"""
        SELECT doc_id, string_split(text, ' ')
        FROM '{sf_dir}/documents.parquet' WHERE doc_id < 40 ORDER BY doc_id
        """
    ).fetchall()
    toks = dict(rows)
    return {
        d // 2: (toks[d], toks[d + 1])
        for d in toks
        if d % 2 == 0 and d + 1 in toks
    }


def _lcs(a, b):
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0]
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur.append(prev[j - 1] + 1)
            else:
                cur.append(max(prev[j], cur[-1]))
        prev = cur
    return prev[len(b)]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_rouge_l_matches_python(spark, sf_dir):
    pairs = _pairs(sf_dir)
    out = {
        r["pair_id"]: r
        for r in REGISTRY["text_rouge_l"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(pairs)
    for pid, (a, b) in pairs.items():
        lcs = _lcs(a, b)
        r = out[pid]
        assert r["lcs_len"] == lcs
        p, q = lcs / len(a), lcs / len(b)
        assert abs(r["rouge_prec"] - p) < 1e-4
        assert abs(r["rouge_rec"] - q) < 1e-4
        f1 = 0.0 if lcs == 0 else 2 * p * q / (p + q)
        assert abs(r["rouge_f1"] - f1) < 1e-4
        # structural: LCS <= min length, F1 between min and max of p,r
        assert lcs <= min(len(a), len(b))


def test_rouge_l_identical_docs_is_one(spark):
    # doc 2k vs itself would be F1=1; check the invariant indirectly:
    # LCS of a sequence with itself is its length
    assert _lcs(["x", "y", "z"], ["x", "y", "z"]) == 3


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_self_bleu_matches_python(spark, sf_dir):
    pairs = _pairs(sf_dir)
    out = {
        r["pair_id"]: r
        for r in REGISTRY["text_self_bleu"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(pairs)
    for pid, (a, b) in pairs.items():
        r = out[pid]
        for n, (clip_c, tot_c) in {
            1: ("clip1", "tot1"),
            2: ("clip2", "tot2"),
        }.items():
            cg = Counter(tuple(a[i : i + n]) for i in range(len(a) - n + 1))
            rg = Counter(tuple(b[i : i + n]) for i in range(len(b) - n + 1))
            clip = sum(min(c, rg.get(g, 0)) for g, c in cg.items())
            tot = sum(cg.values())
            assert r[clip_c] == clip, (pid, n)
            assert r[tot_c] == tot, (pid, n)
        p1, p2 = r["clip1"] / r["tot1"], r["clip2"] / r["tot2"]
        bp = 1.0 if len(a) > len(b) else math.exp(1.0 - len(b) / len(a))
        assert abs(r["p1"] - p1) < 1e-4
        assert abs(r["p2"] - p2) < 1e-4
        assert abs(r["bp"] - bp) < 1e-4
        bleu = (
            0.0
            if r["clip1"] == 0 or r["clip2"] == 0
            else bp * math.exp(0.5 * (math.log(p1) + math.log(p2)))
        )
        assert abs(r["bleu2"] - bleu) < 1e-4
        assert 0.0 <= r["bleu2"] <= 1.0 + 1e-9


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_vocab_coverage_matches_python(spark, sf_dir):
    toks = [
        w
        for (row,) in duckdb.execute(
            f"SELECT string_split(text, ' ') FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
        for w in row
    ]
    counts = Counter(toks)
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = len(toks)
    out = {
        r["k"]: r
        for r in REGISTRY["text_vocab_coverage_curve"].build(spark, sf_dir).collect()
    }
    assert set(out) == {100, 500, 2000, 8000, 30000}
    prev_cov = 0.0
    for k in sorted(out):
        used = min(k, len(ordered))
        covered = sum(c for _, c in ordered[:used])
        r = out[k]
        assert r["vocab_used"] == used
        assert r["covered_tokens"] == covered
        assert r["total_tokens"] == tot
        assert abs(r["coverage"] - covered / tot) < 1e-4
        # monotone non-decreasing in K, and 1.0 once the vocab is used up
        assert r["coverage"] >= prev_cov - 1e-9
        prev_cov = r["coverage"]
        if used == len(ordered):
            assert abs(r["coverage"] - 1.0) < 1e-9
