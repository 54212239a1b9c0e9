"""Round-11 wave C: frame-level dedup + CUPED — from-scratch Python
recomputations."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest

from etl_cnc_spark.registry import REGISTRY, load_all

load_all()

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
FRAME = 256


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_frame_dedup_matches_python(spark, sf_dir):
    import hashlib

    rows = duckdb.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    by_digest = defaultdict(list)
    for doc_id, text in rows:
        b = text.encode()
        for i in range(0, (len(b) - 1) // FRAME + 1):
            fd = hashlib.md5(b[i * FRAME : (i + 1) * FRAME]).hexdigest()
            by_digest[fd].append(doc_id)
    expect = {
        fd: docs
        for fd, docs in by_digest.items()
        if min(docs) != max(docs)
    }
    out = {
        r["fd"]: r
        for r in REGISTRY["multimodal_frame_dedup"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(expect)
    for fd, docs in expect.items():
        r = out[fd]
        assert r["n_frames"] == len(docs)
        assert r["n_docs"] == len(set(docs))
        assert r["min_doc"] == min(docs)
        assert r["max_doc"] == max(docs)
        assert r["n_docs"] >= 2


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_cuped_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"""
        SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT),
               CAST(floor(value*100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/events.parquet'
        """
    ).fetchall()
    mid = (min(r[2] for r in rows) + max(r[2] for r in rows)) // 2
    xs = defaultdict(int)
    ys = defaultdict(int)
    users = set()
    for u, et, t, c in rows:
        users.add(u)
        if et == "purchase":
            if t < mid:
                xs[u] += c
            else:
                ys[u] += c
    n = len(users)
    ulist = sorted(users)
    x = [xs[u] for u in ulist]
    y = [ys[u] for u in ulist]
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    sxy = sum(a * b for a, b in zip(x, y))
    syy = sum(v * v for v in y)
    cov = sxy - sx * sy / n
    varx = sxx - sx * sx / n
    vary = syy - sy * sy / n
    theta = cov / varx
    rho2 = cov * cov / (varx * vary)
    out = {
        r["arm"]: r
        for r in REGISTRY["events_cuped"].build(spark, sf_dir).collect()
    }
    assert set(out) == {0, 1}
    for arm in (0, 1):
        au = [u for u in ulist if u % 2 == arm]
        na = len(au)
        sy_a = sum(ys[u] for u in au)
        sx_a = sum(xs[u] for u in au)
        r = out[arm]
        assert r["n_users"] == na
        assert abs(r["mean_y"] - sy_a / na / 100.0) < 1e-4
        mean_cv = (sy_a / na - theta * (sx_a / na - sx / n)) / 100.0
        assert abs(r["mean_y_cuped"] - mean_cv) < 1e-4
        assert abs(r["theta"] - theta) < 1e-4
        assert abs(r["rho2"] - rho2) < 1e-4
        assert 0.0 <= r["rho2"] <= 1.0 + 1e-9
    # CUPED preserves the overall mean: weighted adjusted means
    # recombine to the raw pooled mean
    tot_raw = sum(ys[u] for u in ulist) / n / 100.0
    w = sum(
        out[a]["mean_y_cuped"] * out[a]["n_users"] for a in (0, 1)
    ) / n
    assert abs(w - tot_raw) < 5e-3
