"""Independent-recomputation properties for the round-8 wave-E text
stylometry keys (Yule's K, Mendenhall curve, segmented STTR, OOV
rate): re-derived with plain Python Counters from the raw parquet — a
third engine besides Spark and DuckDB."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _docs(sf_dir):
    return duckdb.execute(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()


def test_yule_k_matches_python(spark, sf_dir):
    by_lang = defaultdict(Counter)
    for _, lang, text in _docs(sf_dir):
        by_lang[lang].update(text.split(" "))
    out = {r["lang"]: r for r in REGISTRY["text_yule_k"].build(spark, sf_dir).collect()}
    assert set(out) == set(by_lang)
    for lang, tf in by_lang.items():
        n = sum(tf.values())
        k = 1e4 * (sum(f * f for f in tf.values()) - n) / (n * n)
        row = out[lang]
        assert row["n_tokens"] == n
        assert row["n_types"] == len(tf)
        assert abs(row["yule_k"] - k) < 1e-2


def test_mendenhall_matches_python(spark, sf_dir):
    hist = defaultdict(Counter)
    for _, lang, text in _docs(sf_dir):
        for w in text.split(" "):
            hist[lang][len(w)] += 1
    out = {
        (r["lang"], r["wlen"]): r
        for r in REGISTRY["text_mendenhall_curve"].build(spark, sf_dir).collect()
    }
    for lang, counter in hist.items():
        n = sum(counter.values())
        for wlen, cnt in counter.items():
            row = out[(lang, wlen)]
            assert row["cnt"] == cnt
            assert abs(row["share"] - cnt / n) < 1e-3
    assert len(out) == sum(len(c) for c in hist.values())


def test_sttr_matches_python(spark, sf_dir):
    seg = 20
    ds = defaultdict(list)
    for _, lang, text in _docs(sf_dir):
        words = text.split(" ")
        for i in range(len(words) // seg):
            ds[lang].append(len(set(words[i * seg : (i + 1) * seg])))
    out = {
        r["lang"]: r
        for r in REGISTRY["text_sttr_segmented"].build(spark, sf_dir).collect()
    }
    assert set(out) == {k for k, v in ds.items() if v}
    for lang, dlist in ds.items():
        n = len(dlist)
        mean_d = sum(dlist) / n
        var_d = sum(x * x for x in dlist) / n - mean_d**2
        row = out[lang]
        assert row["n_segments"] == n
        assert abs(row["mean_ttr"] - mean_d / seg) < 1e-3
        assert abs(row["sd_ttr"] - var_d**0.5 / seg) < 1e-3
        assert 0.0 < row["mean_ttr"] <= 1.0


def test_oov_rate_matches_python(spark, sf_dir):
    docs = _docs(sf_dir)
    tf = Counter()
    for _, _, text in docs:
        tf.update(text.split(" "))
    vocab = {
        w for w, _ in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:16]
    }
    out = {
        r["doc_id"]: r
        for r in REGISTRY["text_oov_rate"].build(spark, sf_dir).collect()
    }
    assert len(out) == len(docs)
    for doc_id, _, text in docs:
        words = text.split(" ")
        oov = sum(1 for w in words if w not in vocab)
        row = out[doc_id]
        assert row["n_tokens"] == len(words)
        assert row["n_oov"] == oov
        assert abs(row["oov_rate"] - oov / len(words)) < 1e-3
