"""Statistical gates for the approximate LLM-pipeline operators
(SURVEY.md §2.10/§7: define recall gates, don't pretend to
hash-match) plus metamorphic invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_cnc_spark.catalog import table
from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _pairs(df, a="qid", b="cid"):
    return {(r[a], r[b]) for r in df.select(a, b).collect()}


def test_lsh_ann_recall(spark, sf_dir):
    """Random-projection LSH with threshold 1.35 must recover almost
    all exact top-5 neighbors (measured 0.98 at 500 vecs)."""
    exact = _pairs(REGISTRY["sim_topk_exact"].build(spark, sf_dir))
    lsh = _pairs(REGISTRY["sim_ann_lsh"].build(spark, sf_dir))
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall@5 = {recall:.3f}"


def test_ivf_recall_beats_scan_fraction(spark, sf_dir):
    """Real IVF (nearest-centroid cells, nprobe=2 of ~8 cells):
    recall@5 must beat the ~25% scanned fraction — geometric cells
    concentrate true neighbors even on these quasi-random fixtures
    (measured 0.48 at 500 vecs; clustered real data does far
    better). The win is cost: ~nprobe/cells of candidates scanned."""
    exact = _pairs(REGISTRY["sim_topk_exact"].build(spark, sf_dir))
    ivf = _pairs(REGISTRY["sim_ann_ivf"].build(spark, sf_dir))
    recall = len(exact & ivf) / len(exact)
    assert 0.3 <= recall <= 0.95, f"IVF recall@5 = {recall:.3f}"


def test_ivfpq_recall_approaches_ivf_ceiling(spark, sf_dir):
    """IVF-PQ shares the IVF tier's candidate set, so plain-IVF
    recall is its ceiling; the PQ approximation (16-codeword stride
    codebook, ADC scoring, 50-deep exact re-rank) must retain most
    of it (measured 0.424 vs a 0.48 ceiling at 500 vecs — 88%; a
    trained k-means codebook does better, the plan is identical)."""
    exact = _pairs(REGISTRY["sim_topk_exact"].build(spark, sf_dir))
    ivf = _pairs(REGISTRY["sim_ann_ivf"].build(spark, sf_dir))
    pq = _pairs(REGISTRY["sim_ann_ivfpq"].build(spark, sf_dir))
    ceiling = len(exact & ivf) / len(exact)
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.75 * ceiling, (
        f"IVF-PQ recall@5 = {recall:.3f} vs IVF ceiling {ceiling:.3f}"
    )


def test_recall_report_keys_agree_with_set_measurement(spark, sf_dir):
    """The recall-as-data keys (sim_recall_report / sim_recall_lsh)
    must emit the same recall@5 the set comparison measures, and the
    LSH tier must clear its quality gate as DATA, not just as a test
    assertion."""
    exact = _pairs(REGISTRY["sim_topk_exact"].build(spark, sf_dir))

    [ivf_row] = REGISTRY["sim_recall_report"].build(spark, sf_dir).collect()
    ivf = _pairs(REGISTRY["sim_ann_ivf"].build(spark, sf_dir))
    assert ivf_row["tier"] == "ivf" and ivf_row["n_queries"] == 50
    assert abs(ivf_row["recall_at_5"] - len(exact & ivf) / len(exact)) < 1e-9

    [lsh_row] = REGISTRY["sim_recall_lsh"].build(spark, sf_dir).collect()
    assert lsh_row["tier"] == "lsh"
    assert lsh_row["recall_at_5"] >= 0.9


def test_embedding_dedup_blocking_recall(spark, sf_dir):
    """IVF-blocked dedup_embedding vs the brute-force all-pairs
    ground truth: pair recall ≥ 0.8 overall and ≥ 0.85 for the
    high-similarity stratum (cos ≥ 0.35) — the regime a real dedup
    threshold lives in. Ground truth is computed here (bounded
    fixture corpus); the operator itself never does the O(N²) join."""
    from etl_cnc_spark.llm.dedup import DEDUP_TAU, _dot64, _norm2

    e = table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        _norm2(F.col("embedding")).alias("na2"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        _norm2(F.col("embedding")).alias("nb2"),
    )
    cos = _dot64(F.col("ea"), F.col("eb")) / F.sqrt(F.col("na2") * F.col("nb2"))
    truth = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos"))
        .where(F.col("cos") >= DEDUP_TAU)
        .collect()
    }
    got = _pairs(REGISTRY["dedup_embedding"].build(spark, sf_dir), "vec_a", "vec_b")
    assert got <= set(truth), "blocked output must be a subset of true pairs"
    recall = len(got) / len(truth)
    hi = [p for p, c in truth.items() if c >= 0.35]
    hi_recall = sum(p in got for p in hi) / len(hi)
    assert recall >= 0.8, f"overall blocking recall = {recall:.3f}"
    assert hi_recall >= 0.85, f"high-sim blocking recall = {hi_recall:.3f}"


def test_minhash_estimates_jaccard(spark, sf_dir):
    """MinHash-LSH similarity estimates vs exact shingle Jaccard:
    mean absolute error bounded (5 hash tables → coarse but sane)."""
    mh = REGISTRY["dedup_minhash"].build(spark, sf_dir)
    exact = REGISTRY["dedup_ngram_jaccard"].build(spark, sf_dir)
    j = (
        mh.join(
            exact,
            (mh.doc_a == exact.doc_a) & (mh.doc_b == exact.doc_b),
        )
        .select(F.abs(mh.est_jaccard - exact.jaccard).alias("err"))
        .agg(F.avg("err"))
        .first()[0]
    )
    assert j is not None and j <= 0.35, f"minhash mean |err| = {j}"


def test_approx_distinct_error(spark, sf_dir):
    approx = {
        r["event_type"]: r["n_users_approx"]
        for r in REGISTRY["agg_approx_distinct"].build(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in REGISTRY["agg_count_distinct"].build(spark, sf_dir).collect()
    }
    for k, n in exact.items():
        rel = abs(approx[k] - n) / n
        assert rel < 0.05, f"{k}: approx_count_distinct rel err {rel:.3f}"


def test_join_count_invariant_under_repartition(spark, sf_dir):
    """Metamorphic: physical partitioning must not change join
    results (the property that makes everything cluster-safe)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    base = o.join(c, o.o_custkey == c.c_custkey).count()
    shuffled = (
        o.repartition(7, "o_orderkey")
        .join(c.repartition(3, "c_nationkey"), o.o_custkey == c.c_custkey)
        .count()
    )
    assert base == shuffled


def test_salted_join_equals_plain_join(spark, sf_dir):
    """join_skew_salted must be semantics-preserving."""
    from etl_cnc_spark.oracle import canonical_rows

    salted = REGISTRY["join_skew_salted"].build(spark, sf_dir)
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    plain = (
        e.join(c, e.user_id == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")) / F.lit(100.0)).alias(
                "total_value"
            ),
        )
    )
    assert canonical_rows(salted.toPandas()) == canonical_rows(plain.toPandas())


def test_mono_id_unique(spark, sf_dir):
    df = REGISTRY["fn_hash_native"].build(spark, sf_dir)
    assert df.select("mono_id").distinct().count() == df.count()


def test_simhash_is_32_bits(spark, sf_dir):
    df = REGISTRY["dedup_simhash"].build(spark, sf_dir)
    bad = df.where(~F.col("simhash32").rlike("^[01]{32}$")).count()
    assert bad == 0


def test_approx_quantile_error(spark, sf_dir):
    """approx_percentile(accuracy=1000) vs exact percentiles: the
    sketch's rank error must stay within 1% of the distribution's
    span per group (the documented bound is ~1/accuracy)."""
    rows = REGISTRY["agg_approx_quantile"].build(spark, sf_dir).collect()
    li = table(spark, sf_dir, "lineitem")
    for r in rows:
        exact = li.where(F.col("l_returnflag") == r["l_returnflag"]).agg(
            F.expr(
                "percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.99))"
            ).alias("p"),
            F.max("l_extendedprice").alias("hi"),
            F.min("l_extendedprice").alias("lo"),
        ).first()
        span = exact["hi"] - exact["lo"]
        quartiles = [r["p25"], r["p50"], r["p75"], r["p99"]]
        for approx, true in zip(quartiles, exact["p"]):
            assert abs(approx - true) <= 0.01 * span, (
                f"{r['l_returnflag']}: approx {approx} vs exact {true}"
            )


def test_hll_sketch_merge_error(spark, sf_dir):
    """DataSketches HLL per-type estimates and the cross-type sketch
    UNION must land within 5% of exact distinct counts (register-max
    merge is order-independent, so this is stable at any
    parallelism)."""
    rows = {
        r["event_type"]: r["est_users"]
        for r in REGISTRY["agg_hll_merge"].build(spark, sf_dir).collect()
    }
    e = table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    exact["__all__"] = e.agg(F.count_distinct("user_id")).first()[0]
    for k, n in exact.items():
        rel = abs(rows[k] - n) / n
        assert rel < 0.05, f"{k}: HLL rel err {rel:.3f}"


def test_pandas_topk_matches_exact(spark, sf_dir):
    """The BLAS-vectorized pandas-UDF top-k must select the same
    neighbor sets as the fold-based exact key (scores differ only in
    summation order ~1e-15; ranks with the cid tie-break agree)."""
    exact = _pairs(REGISTRY["sim_topk_exact"].build(spark, sf_dir))
    fast = _pairs(REGISTRY["sim_topk_pandas"].build(spark, sf_dir))
    assert exact == fast


def test_quantize_reconstruction_bound(spark, sf_dir):
    """Dequantized error per element is <= scale/2 (the rounding
    bound; clamping never exceeds it because max|x| maps to 127)."""
    from etl_cnc_spark.catalog import table

    e = table(spark, sf_dir, "embeddings")
    q = REGISTRY["embed_quantize"].build(spark, sf_dir)
    # mse <= (scale/2)^2 ; outputs are scaled x1k / x1e6
    bad = q.where(
        F.col("mse_x1m") > F.pow(F.col("scale_x1k") / 2, 2) + 1e-6
    ).count()
    assert bad == 0
    assert q.count() == e.count()


def test_sim_auto_dispatch(spark, sf_dir):
    """Chooser picks brute at fixture scale (result == exact key) and
    switches strategies at synthetic cardinalities."""
    from etl_cnc_spark.plans.rewrite import choose_strategy

    assert choose_strategy(2_000, 50) == "brute"
    assert choose_strategy(1_000_000, 50) == "ivf"
    assert choose_strategy(50_000_000, 50) == "lsh"

    exact = _pairs(REGISTRY["sim_topk_exact"].build(spark, sf_dir))
    auto = _pairs(REGISTRY["sim_auto"].build(spark, sf_dir))
    assert exact == auto


def test_training_mix_shares(spark, sf_dir):
    """Shares sum to ~1 and upsample×share ≈ uniform share."""
    rows = REGISTRY["pipeline_training_mix"].build(spark, sf_dir).collect()
    assert rows
    total_share = sum(r["share"] for r in rows)
    assert abs(total_share - 1.0) < 1e-2
    n = len(rows)
    for r in rows:
        assert abs(r["upsample"] * r["share"] - 1.0 / n) < 1e-2


def test_rag_chunk_counts_match_explode(spark, sf_dir):
    """pipeline_rag_corpus's closed-form chunk arithmetic must equal
    the actual exploded chunk rows of text_chunk_windows per doc."""
    from etl_cnc_spark.llm.text import CHUNK, MIN_TOKENS, STRIDE  # noqa: F401

    from etl_cnc_spark.catalog import table

    exploded = (
        REGISTRY["text_chunk_windows"]
        .build(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_exploded"))
    )
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("toks")
    )
    import math

    for r in d.join(exploded, "doc_id").collect():
        want = max(math.floor((r["toks"] - CHUNK) / STRIDE), 0) + 1
        assert r["n_exploded"] == want, (r["doc_id"], r["toks"])


def test_q8_ivf_matches_fp_ivf_quality(spark, sf_dir):
    """The int8-scored IVF tier must not lose quality vs the
    full-precision IVF at fixture scale: recall@5 vs exact within
    0.05 of sim_ann_ivf's, and the 2k-deep re-rank recovers ≥95% of
    the fp tier's neighbor pairs (measured: identical sets)."""
    exact = _pairs(REGISTRY["sim_topk_exact"].build(spark, sf_dir))
    ivf = _pairs(REGISTRY["sim_ann_ivf"].build(spark, sf_dir))
    q8 = _pairs(REGISTRY["sim_ann_ivf_q8"].build(spark, sf_dir))
    r_ivf = len(exact & ivf) / len(exact)
    r_q8 = len(exact & q8) / len(exact)
    assert r_q8 >= r_ivf - 0.05, f"q8 recall {r_q8:.3f} vs ivf {r_ivf:.3f}"
    assert len(ivf & q8) / len(ivf) >= 0.95


def test_matryoshka_recall_band(spark, sf_dir):
    """Prefix-dim (32/64) coarse ranking + full re-rank: recall@5 in
    the measured band for unstructured fixtures (0.42 at 500 vecs —
    see the MRL_DIM curve note in llm/similarity.py; MRL-trained
    embeddings do far better at narrower prefixes)."""
    exact = _pairs(REGISTRY["sim_topk_exact"].build(spark, sf_dir))
    mrl = _pairs(REGISTRY["embed_matryoshka_topk"].build(spark, sf_dir))
    recall = len(exact & mrl) / len(exact)
    assert 0.25 <= recall <= 0.9, f"matryoshka recall@5 = {recall:.3f}"
