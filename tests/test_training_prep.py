"""Invariant tests for the r2 training-prep operators — properties
the DuckDB hash check can't state (balance, coverage, permutation
laws)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_cnc_spark.llm.multimodal import N_READERS
from etl_cnc_spark.llm.text import MIX_TOTAL, SEQ_LEN
from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_seq_pack_covers_corpus_contiguously(spark, sf_dir):
    """Packing is a partition of the token stream: offsets are
    contiguous (next cum_before = prev cum_before + tokens), pack ids
    are the token offset DIV SEQ_LEN, and every pack except the last
    is full."""
    rows = sorted(
        REGISTRY["pipeline_seq_pack"].build(spark, sf_dir).collect(),
        key=lambda r: r["doc_id"],
    )
    cum = 0
    for r in rows:
        assert r["cum_before"] == cum
        assert r["pack_id"] == cum // SEQ_LEN
        cum += r["tokens"]
    total = cum
    # Occupancy check derived from the OUTPUT: spread each doc's
    # [cum_before, cum_before + tokens) token interval over packs;
    # every pack except the last must be exactly full, the last
    # non-empty. (A doc can straddle a boundary — pack_id is only its
    # STARTING pack, so occupancy must be computed intervalwise.)
    n_packs = (total - 1) // SEQ_LEN + 1
    occ = [0] * n_packs
    for r in rows:
        start, remaining = r["cum_before"], r["tokens"]
        while remaining > 0:
            p = start // SEQ_LEN
            take = min(remaining, (p + 1) * SEQ_LEN - start)
            occ[p] += take
            start += take
            remaining -= take
    assert all(o == SEQ_LEN for o in occ[:-1])
    assert 0 < occ[-1] <= SEQ_LEN
    assert max(r["pack_id"] for r in rows) == (rows[-1]["cum_before"]) // SEQ_LEN


def test_mix_temperature_flattens_distribution(spark, sf_dir):
    """Temperature sampling must sit strictly between raw-proportional
    and uniform: the biggest language's share shrinks vs its token
    share, the smallest grows; allocations stay within MIX_TOTAL."""
    rows = REGISTRY["pipeline_mix_temperature"].build(spark, sf_dir).collect()
    total_tokens = sum(r["tokens"] for r in rows)
    total_alloc = sum(r["alloc"] for r in rows)
    assert total_alloc <= MIX_TOTAL  # floor() rounds down only
    assert total_alloc > MIX_TOTAL - len(rows)  # ...by < 1 per group
    big = max(rows, key=lambda r: r["tokens"])
    small = min(rows, key=lambda r: r["tokens"])
    assert big["alloc"] / MIX_TOTAL < big["tokens"] / total_tokens
    assert small["alloc"] / MIX_TOTAL > small["tokens"] / total_tokens


def test_shuffle_epoch_balanced_and_distinct(spark, sf_dir):
    """Each epoch is a true permutation (ranks 1..n once), readers are
    balanced to ±1, and the two epochs order documents differently."""
    df = REGISTRY["pipeline_shuffle_epoch"].build(spark, sf_dir)
    per_epoch = (
        df.groupBy("epoch")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("rank").alias("n_ranks"),
            F.min("rank").alias("lo"),
            F.max("rank").alias("hi"),
        )
        .collect()
    )
    for r in per_epoch:
        assert r["n"] == r["n_ranks"] == r["hi"] and r["lo"] == 1
    reader_counts = [
        r["c"]
        for r in df.groupBy("epoch", "reader_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert max(reader_counts) - min(reader_counts) <= 1
    assert len(set(reader_counts)) <= 2
    # permutations differ between epochs for essentially every doc
    e0 = {r["doc_id"]: r["rank"] for r in df.where("epoch = 0").collect()}
    e1 = {r["doc_id"]: r["rank"] for r in df.where("epoch = 1").collect()}
    moved = sum(1 for d in e0 if e0[d] != e1[d])
    assert moved > len(e0) * 0.9


def test_multimodal_dedup_recovers_planted_duplicates(spark, sf_dir):
    """The simulated re-crawl plants exactly the doc_id%7==0 payloads
    as duplicates; dedup must find each group once, keep the original
    id, and report 2 copies."""
    rows = REGISTRY["multimodal_dedup"].build(spark, sf_dir).collect()
    import duckdb

    [n_planted] = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet' "
        "WHERE doc_id % 7 = 0"
    ).fetchone()
    # distinct payloads among planted docs (fixture may repeat text)
    [n_groups] = duckdb.sql(
        f"SELECT count(DISTINCT text) FROM '{sf_dir}/documents.parquet' "
        "WHERE doc_id % 7 = 0"
    ).fetchone()
    assert len(rows) == n_groups
    for r in rows:
        assert r["n_copies"] >= 2
        assert r["keeper_doc"] < 100000  # original, not the re-crawl
    assert n_planted >= n_groups


def test_repetition_bounds(spark, sf_dir):
    """n_repeated = n_grams - n_unique, both nonnegative, and docs
    with all-distinct trigrams report zero."""
    rows = REGISTRY["text_repetition"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_grams"] >= r["n_unique"] >= 1
        assert r["n_repeated"] == r["n_grams"] - r["n_unique"]


def test_reader_assignment_respects_readers_constant():
    assert N_READERS >= 2
