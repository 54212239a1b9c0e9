"""Round-11 ADVICE regression tests.

Four advisor findings (ADVICE r10) and the shared-pattern hardening
they prompted:

1. stat_kde_gaussian's Silverman bandwidth was 100x undersmoothed
   (cents-scale sigma divided by 10000 instead of 100) — and the
   oracle + recomputation test mirrored the same constant, so the
   gates were circular.  The independent test here derives the
   bandwidth in DOLLARS from scratch.
2. Spark's ``sequence(start, stop)`` DESCENDS when start > stop
   (step defaults to -1), so every ``transform(sequence(1,
   size(w) - k), ...)`` n-gram builder crashed on docs with fewer
   than k+1 tokens via ``element_at(w, 0)`` — while the DuckDB
   oracles' ``range()`` is cleanly empty.  All n-gram sites now
   pre-filter short docs; the degenerate-corpus tests here lock
   that in.
3. events_dtw_daily's DP fold used ``aggregate(sequence(2, t), ...)``
   which for a single-day series (t=1) silently folded over the
   descending [2, 1] — now short-circuited to the 1-cell DP.
4. events_attribution_markov carried an unused ``_ign``
   map_from_entries aggregate with duplicate keys that only failed
   to throw because the optimizer pruned it — deleted.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

import pyspark.sql.functions as F  # noqa: F401
from etl_cnc_spark.registry import REGISTRY, load_all

load_all()


# ------------------------------------------------------------------
# 1. KDE bandwidth: independent dollars-from-scratch recomputation


def test_kde_silverman_bandwidth_in_dollars(spark, sf_dir):
    """Non-circular bandwidth check: derive sigma directly from the
    dollar values (never touching the cents fixed-point pipeline) and
    assert the published density matches a plain-Python Gaussian KDE
    with h = 1.06 * sigma * n^(-1/5) at every grid point."""
    vals = [
        round(r[0] * 100) / 100.0
        for r in duckdb.execute(
            f"""
            SELECT value FROM '{sf_dir}/events.parquet'
            WHERE event_type = 'purchase'
            """
        ).fetchall()
    ]
    n = len(vals)
    mean = sum(vals) / n
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1))
    bw = 1.06 * sd * n ** (-0.2)
    rows = REGISTRY["stat_kde_gaussian"].build(spark, sf_dir).collect()
    assert len(rows) == 41
    for r in rows:
        x = r["x"]
        dens = sum(
            math.exp(-(((x - v) / bw) ** 2) / 2.0) for v in vals
        ) / (n * bw * math.sqrt(2 * math.pi))
        # the engine quantizes kernel terms at 1e-9 and q4's the
        # output; 1e-3 absolute headroom is orders above both and
        # orders below the 100x-undersmoothing failure mode
        assert abs(r["density"] - dens) < 1e-3, (x, r["density"], dens)


# ------------------------------------------------------------------
# 2. degenerate corpus: empty / 1-token / 2-token docs must not crash
#    any n-gram builder, and must match the oracle's empty-range rows


@pytest.fixture(scope="module")
def tiny_docs_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("tinydocs")
    rows = [
        (0, "", "en", "web", 0),
        (1, "solo", "en", "web", 4),
        (2, "two words", "en", "web", 9),
        (3, "three word doc", "en", "web", 14),
        (4, "three word doc", "en", "web", 14),
        (5, "a b a b a b a b a b", "en", "web", 19),
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(p / "documents.parquet"))
    return str(p)


TEXT_NGRAM_KEYS = [
    "text_fingerprint",
    "text_bigram_freq",
    "text_lm_score",
    "text_ngram_novelty",
    "text_kn_lm_score",
    "text_pmi_collocations",
    "dedup_ngram_jaccard",
    "dedup_minhash_relational",
    "dedup_contamination",
    "dedup_containment",
]


@pytest.mark.parametrize("key", TEXT_NGRAM_KEYS)
def test_ngram_ops_survive_single_token_docs(spark, tiny_docs_dir, key):
    # must not raise "SQL array indices start at 1"
    rows = REGISTRY[key].build(spark, tiny_docs_dir).collect()
    assert isinstance(rows, list)


def test_minhash_lsh_survives_single_token_docs(spark, tiny_docs_dir):
    # the ml.feature MinHashLSH path additionally rejects empty
    # feature vectors — short docs must be excluded before fit()
    rows = REGISTRY["dedup_minhash"].build(spark, tiny_docs_dir).collect()
    ids = {r["doc_a"] for r in rows} | {r["doc_b"] for r in rows}
    assert 0 not in ids and 1 not in ids


def test_bigram_semantics_on_tiny_corpus(spark, tiny_docs_dir):
    """Short docs contribute NO bigrams (they are dropped, exactly as
    the oracle's empty range does) while longer docs still count."""
    out = {
        r["bg"]: r["n"]
        for r in REGISTRY["text_bigram_freq"].build(spark, tiny_docs_dir).collect()
    }
    assert "two words" in out and out["two words"] == 1
    assert out["a b"] == 5 and out["b a"] == 4
    assert not any(bg.startswith("solo") for bg in out)


def test_fingerprint_drops_sub_trigram_docs(spark, tiny_docs_dir):
    ids = {
        r["doc_id"]
        for r in REGISTRY["text_fingerprint"].build(spark, tiny_docs_dir).collect()
    }
    # docs 0-2 have < 3 tokens -> no trigram shingles -> no fingerprint
    assert ids == {3, 4, 5}


# ------------------------------------------------------------------
# 3. events_dtw_daily single-day series: 1-cell DP, no NULL fold


def test_dtw_single_day_series(spark, tmp_path):
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    for i in range(7):
        rows.append((i, base, 100 + i, "view", 1.0, "{}"))
    for i in range(3):
        rows.append((100 + i, base, 200 + i, "click", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = REGISTRY["events_dtw_daily"].build(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["t_len"] == 1
    assert r["dtw_distance"] == 4  # |7 views - 3 clicks|
    assert r["lockstep_distance"] == 4
    assert abs(r["dtw_per_step"] - 2.0) < 1e-9
    assert abs(r["lockstep_per_step"] - 4.0) < 1e-9


def test_char_entropy_rate_drops_sub_k_docs(spark, tmp_path_factory):
    """text_char_entropy_rate's char-gram builders pre-filter docs
    shorter than k CHARS: Spark's descending sequence(1, 0) would
    otherwise count a phantom gram via substr(text, 0, k) (position 0
    re-reads position 1) while the oracle's range() is cleanly empty.
    A 1-char doc must contribute nothing; the per-lang rate must match
    a from-scratch Python recomputation over the surviving docs."""
    import math
    from collections import Counter

    p = tmp_path_factory.mktemp("cerdocs")
    rows = [
        (0, "x", "en", "web", 1),       # < 2 chars: no bigrams at all
        (1, "ab", "en", "web", 2),      # bigrams yes, trigrams no
        (2, "abcab", "en", "web", 5),
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(p / "documents.parquet"))

    out = REGISTRY["text_char_entropy_rate"].build(spark, str(p)).collect()
    assert len(out) == 1 and out[0]["lang"] == "en"

    def h(grams):
        c = Counter(grams)
        n = sum(c.values())
        return -sum(v / n * math.log2(v / n) for v in c.values())

    bi = ["ab", "bc", "ca", "ab"] + ["ab"]          # doc2 + doc1
    tri = ["abc", "bca", "cab"]                      # doc2 only
    expect = h(tri) - h(bi)
    assert out[0]["n_bigrams"] == 5 and out[0]["n_trigrams"] == 3
    assert abs(out[0]["entropy_rate_bits"] - expect) < 1e-3


def test_cuped_null_on_constant_preperiod(spark, tmp_path_factory):
    """events_cuped with a span whose pre-midpoint half contains NO
    purchases: every user's covariate x is 0, varx = 0, and the theta
    division would be a whole-job DIVIDE_BY_ZERO under Spark 4's
    default ANSI mode — the guard must publish NULL adjusted columns
    while the raw per-arm means survive."""
    import datetime as dt

    p = tmp_path_factory.mktemp("cupeddeg")
    t0 = dt.datetime(2025, 1, 1)
    rows = []
    for u in range(4):
        rows.append((u, "view", t0, 0.0))
        rows.append((u, "purchase", t0 + dt.timedelta(days=9), 10.0 + u))
    spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp, value double"
    ).write.mode("overwrite").parquet(str(p / "events.parquet"))
    out = {
        r["arm"]: r
        for r in REGISTRY["events_cuped"].build(spark, str(p)).collect()
    }
    assert set(out) == {0, 1}
    for arm, r in out.items():
        assert r["n_users"] == 2
        assert r["mean_y"] is not None
        assert r["theta"] is None
        assert r["mean_y_cuped"] is None
        assert r["rho2"] is None


def test_hoeffding_null_below_five_rows(spark, tmp_path_factory):
    """stat_hoeffding_d on n <= 4 rows: the n(n-1)...(n-4) denominator
    is zero and D is undefined — the guard must publish NULL instead
    of the ANSI DIVIDE_BY_ZERO crash, with the component sums intact."""
    p = tmp_path_factory.mktemp("hoeffdeg")
    rows = [(1.0, 0.01), (2.0, 0.02), (3.0, 0.03)]
    spark.createDataFrame(
        rows, "l_quantity double, l_discount double"
    ).write.mode("overwrite").parquet(str(p / "lineitem.parquet"))
    out = REGISTRY["stat_hoeffding_d"].build(spark, str(p)).collect()
    assert len(out) == 1
    assert out[0]["n_rows"] == 3
    assert out[0]["d_stat"] is None
    assert out[0]["d1"] is not None
