"""Independent-recomputation properties for the sixth round-5 wave
(per-dimension whitening stats, MIPS augmentation, MAD outliers,
hash train/test split) — numpy / plain-Python references over the
SAME parquet inputs."""

from __future__ import annotations

import hashlib
import statistics

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _vectors(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    return {vid: np.array(vec, dtype=np.float64) for vid, vec in rows}


def test_whitening_stats_match_numpy(spark, sf_dir):
    vecs = _vectors(sf_dir)
    mat = np.stack([vecs[k] for k in sorted(vecs)])
    out = {r["dim"]: r for r in
           REGISTRY["embed_whitening_stats"].build(spark, sf_dir).collect()}
    assert set(out) == set(range(1, 65))
    for dim in range(1, 65):
        col = mat[:, dim - 1]
        r = out[dim]
        assert r["n"] == len(col)
        assert abs(r["mean"] - col.mean()) <= 1e-3
        assert abs(r["var_pop"] - col.var()) <= 1e-3
        assert abs(r["min_val"] - col.min()) <= 1e-4
        assert abs(r["max_val"] - col.max()) <= 1e-4
    # embeddings are roughly centered; every dim has spread
    assert all(out[d]["var_pop"] > 0 for d in out)


def test_mips_transform_equals_bruteforce_dot_ranking(spark, sf_dir):
    """The augmentation must reproduce the exact brute-force MIPS
    ranking (numpy matmul, independent of both engines)."""
    vecs = _vectors(sf_dir)
    ids = sorted(vecs)
    mat = np.stack([vecs[k] for k in ids])
    out = REGISTRY["sim_mips_transform"].build(spark, sf_dir).collect()
    got = {}
    for r in out:
        got.setdefault(r["qid"], []).append((r["rn"], r["cid"], r["dot"]))
    assert set(got) == set(range(20))
    for qid in range(20):
        dots = mat @ vecs[qid]
        order = sorted(
            ((float(dots[i]), ids[i]) for i in range(len(ids)) if ids[i] != qid),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        rows = sorted(got[qid])
        assert [cid for _, cid in order] == [cid for _, cid, _ in rows]
        for (dot, _), (_, _, got_dot) in zip(order, rows):
            assert abs(dot - got_dot) <= 1e-3


def test_mad_outliers_match_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    by_type: dict[str, list[int]] = {}
    for et, vc in rows:
        by_type.setdefault(et, []).append(vc)
    out = {r["event_type"]: r for r in
           REGISTRY["events_anomaly_mad"].build(spark, sf_dir).collect()}
    assert set(out) == set(by_type)
    for et, vals in by_type.items():
        vals.sort()
        med = vals[(len(vals) + 1) // 2 - 1]  # lower median, rn=(n+1)//2
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[(len(devs) + 1) // 2 - 1]
        n_out = sum(1 for v in vals if abs(v - med) > 3.0 * 1.4826 * mad)
        r = out[et]
        assert r["n"] == len(vals)
        assert abs(r["median_value"] - med / 100.0) <= 1e-9
        assert abs(r["mad"] - mad / 100.0) <= 1e-9
        assert r["n_outliers"] == n_out
        # the robust fence should flag a small minority, not the bulk
        assert r["outlier_rate"] < 0.2


def test_mad_median_is_robust_vs_mean(spark, sf_dir):
    """Cross-operator sanity: the MAD median differs from the z-score
    operator's mean in the direction of the value skew (heavy right
    tail -> mean > median)."""
    con = duckdb.connect()
    skew = con.execute(
        f"SELECT avg(value), median(value) FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    out = REGISTRY["events_anomaly_mad"].build(spark, sf_dir).collect()
    # pooled check only when the global distribution is skewed enough
    if skew[0] > skew[1] * 1.05:
        med_w = sum(r["median_value"] * r["n"] for r in out) / sum(
            r["n"] for r in out
        )
        assert med_w < skew[0]


def test_train_test_split_matches_hashlib(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lang, len(string_split(text, ' ')) "
        f"FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    agg: dict[tuple[str, str], list[int]] = {}
    for did, lang, toks in rows:
        b = int(hashlib.md5(str(did).encode()).hexdigest()[:6], 16) % 100
        split = "train" if b < 90 else ("val" if b < 95 else "test")
        cur = agg.setdefault((split, lang), [0, 0])
        cur[0] += 1
        cur[1] += toks
    out = REGISTRY["ml_train_test_split"].build(spark, sf_dir).collect()
    got = {(r["split"], r["lang"]): r for r in out}
    assert set(got) == set(agg)
    for k, (nd, nt) in agg.items():
        assert got[k]["n_docs"] == nd
        assert got[k]["n_tokens"] == nt
    # shares within each language sum to 1
    langs = {k[1] for k in agg}
    for lang in langs:
        s = sum(r["lang_share"] for (sp, lg), r in got.items() if lg == lang)
        assert abs(s - 1.0) <= 5e-4
    # train really is the dominant split per language
    for lang in langs:
        tr = got.get(("train", lang))
        assert tr is not None and tr["lang_share"] > 0.5
