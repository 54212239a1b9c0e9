"""Independent-recomputation properties for the eighth round-5 wave
(confusion metrics, exact AUC, calibration bins) — plain-Python
references over the SAME parquet inputs, scoring with the identical
deterministic linear model."""

from __future__ import annotations

import math

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

W = [((i * 37) % 19 - 9) / 10.0 for i in range(1, 65)]


def _scored(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    out = []
    for label, vec in rows:
        acc = 0.0
        for x, w in zip(vec, W):
            acc = acc + float(x) * w
        score = acc + 0.5
        out.append((label % 2, score, math.floor(score * 1e6 + 0.5)))
    return out


def test_confusion_matches_python(spark, sf_dir):
    data = _scored(sf_dir)
    tp = sum(1 for y, _, sq in data if y == 1 and sq > 0)
    fp = sum(1 for y, _, sq in data if y == 0 and sq > 0)
    tn = sum(1 for y, _, sq in data if y == 0 and sq <= 0)
    fn = sum(1 for y, _, sq in data if y == 1 and sq <= 0)
    r = REGISTRY["ml_confusion_metrics"].build(spark, sf_dir).collect()[0]
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (tp, fp, tn, fn)
    assert abs(r["accuracy"] - (tp + tn) / len(data)) <= 1e-3
    assert abs(r["precision_"] - tp / (tp + fp)) <= 1e-3
    assert abs(r["recall_"] - tp / (tp + fn)) <= 1e-3
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert abs(r["f1"] - f1) <= 1e-3
    # F1 is the harmonic mean: between min and max of P/R
    assert min(r["precision_"], r["recall_"]) - 1e-3 <= r["f1"]
    assert r["f1"] <= max(r["precision_"], r["recall_"]) + 1e-3


def test_auc_matches_naive_pair_counting(spark, sf_dir):
    """AUC recomputed the O(n1*n0) way: P(score_pos > score_neg) +
    0.5 * P(tie) — the definition, no ranks involved."""
    data = _scored(sf_dir)
    pos = sorted(sq for y, _, sq in data if y == 1)
    neg = sorted(sq for y, _, sq in data if y == 0)
    import bisect

    wins = ties = 0
    for p in pos:
        lo = bisect.bisect_left(neg, p)
        hi = bisect.bisect_right(neg, p)
        wins += lo
        ties += hi - lo
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    r = REGISTRY["ml_roc_auc"].build(spark, sf_dir).collect()[0]
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    assert abs(r["auc"] - auc) <= 1e-3
    assert abs(r["gini"] - (2 * auc - 1)) <= 2e-3
    assert 0.0 <= r["auc"] <= 1.0


def test_calibration_bins_match_python(spark, sf_dir):
    data = _scored(sf_dir)
    bins: dict[int, list[int]] = {}
    for y, score, sq in data:
        b = min(9, max(0, math.floor((score + 3.0) / 0.6)))
        cur = bins.setdefault(b, [0, 0, 0])
        cur[0] += 1
        cur[1] += y
        cur[2] += sq
    out = {r["bin"]: r for r in
           REGISTRY["ml_calibration_bins"].build(spark, sf_dir).collect()}
    assert set(out) == set(bins)
    for b, (n, npos, ssq) in bins.items():
        r = out[b]
        assert r["n"] == n
        assert abs(r["pos_rate"] - npos / n) <= 1e-3
        assert abs(r["mean_score"] - ssq / 1e6 / n) <= 1e-3
    # mean score must increase with the bin index (fixed-width fences)
    means = [out[b]["mean_score"] for b in sorted(out)]
    assert means == sorted(means)
    # total rows conserved
    assert sum(r["n"] for r in out.values()) == len(data)
