"""Round-14 ADVICE regression tests: deterministic cache release.

ADVICE r13 (medium) flagged that the ~100 persist() sites added by the
SCALE.md checkpoint rule have no release path — a 696-key
single-session sweep accumulates every key's MEMORY_AND_DISK entries
in the CacheManager until session end.  The fix is in
registry._with_cache_release: every registered build clears the SQL
cache at TOP-LEVEL entry (the previous key's result is fully consumed
by then in every sequential harness), while a depth counter keeps
composed builds (dedup_recall_report → dedup_embedding*) from
clearing mid-composition.  These tests pin both halves plus the
pairwise_set_overlap cache_input opt-out (ADVICE r13, low).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_cnc_spark import registry as R
from etl_cnc_spark.registry import load_all
from etl_cnc_spark.utils import pairwise_set_overlap

REGISTRY = load_all()


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_next_top_level_build_releases_previous_caches(spark, sf_dir):
    """Key N's persist() entries are dropped when key N+1 builds."""
    # events_user_overlap persists its distinct (group, element) frame
    # via pairwise_set_overlap — materialize it so the entry is live.
    out = REGISTRY["events_user_overlap"].build(spark, sf_dir)
    out.collect()
    assert not _cache_empty(spark), "expected a live cache entry after build"
    # agg_global persists nothing: after ITS top-level entry clears,
    # the CacheManager must be empty again.
    REGISTRY["agg_global"].build(spark, sf_dir).collect()
    assert _cache_empty(spark), "previous key's caches must be released"


def test_same_key_rebuild_keeps_caches(spark, sf_dir):
    """bench.py's warmup + timed-run protocol rebuilds the SAME key;
    the release must NOT fire between same-key rebuilds (CacheManager
    plan-equality lets the rebuilt plan hit the warm entry — the
    steady state the frozen BASELINE.md gates were measured in)."""
    out = REGISTRY["events_user_overlap"].build(spark, sf_dir)
    out.collect()
    assert not _cache_empty(spark)
    REGISTRY["events_user_overlap"].build(spark, sf_dir).collect()
    assert not _cache_empty(spark), "same-key rebuild must keep caches"
    # a different key still releases
    REGISTRY["agg_global"].build(spark, sf_dir).collect()
    assert _cache_empty(spark)


def test_composed_builds_do_not_clear_mid_build(spark, sf_dir):
    """The depth counter: an inner registered build invoked from
    inside an outer build must NOT clear the outer's persists."""
    captured = {}

    def outer(s, d):
        inner_frame = s.range(10).withColumn("v", F.col("id") * 2)
        inner_frame = inner_frame.persist()
        inner_frame.count()  # materialize the cache entry
        captured["frame"] = inner_frame
        # a registered (wrapped) build at depth 1 — must not clear
        REGISTRY["agg_global"].build(s, d).collect()
        assert not _cache_empty(s), (
            "inner registered build cleared the outer build's cache"
        )
        return inner_frame

    wrapped = R._with_cache_release(outer)
    res = wrapped(spark, sf_dir)
    assert res.count() == 10
    captured["frame"].unpersist()


def test_release_is_top_level_only_and_resets_depth_on_error(spark, sf_dir):
    """The depth counter unwinds on exception, so a failed build does
    not permanently disable the release for the rest of the session."""

    def boom(s, d):
        raise RuntimeError("boom")

    wrapped = R._with_cache_release(boom)
    try:
        wrapped(spark, sf_dir)
    except RuntimeError:
        pass
    assert R._build_depth == 0


def test_pairwise_set_overlap_cache_input_opt_out(spark):
    """cache_input=False registers NO CacheManager entry (the caller
    already cached the frame); results are identical either way."""
    spark.catalog.clearCache()
    rows = [("g1", "a"), ("g1", "b"), ("g2", "b"), ("g2", "c"), ("g3", "a")]
    dv = spark.createDataFrame(rows, "grp string, elem string")

    out_nocache = pairwise_set_overlap(
        dv, "grp", "ga", "gb", cache_input=False
    )
    got_nocache = sorted(
        tuple(r) for r in out_nocache.collect()
    )
    assert _cache_empty(spark), "cache_input=False must not persist"

    out_cached = pairwise_set_overlap(dv, "grp", "ga", "gb")
    got_cached = sorted(tuple(r) for r in out_cached.collect())
    assert not _cache_empty(spark), "default path persists the input"
    spark.catalog.clearCache()

    assert got_nocache == got_cached
    # pairs with a shared element: (g1,g2) share b, (g1,g3) share a
    assert len(got_nocache) == 2


def test_hoeffding_cap_raises_in_spark(spark, sf_dir, monkeypatch):
    """The r14 sf10 scale probe hit Spark's opaque ARITHMETIC_OVERFLOW
    in stat_hoeffding_d's DECIMAL(38,0) fold at n = 6e7 (past the
    documented exactness cap).  The cap is now ENFORCED with
    raise_error — overflow is a failure with a remedy, never an
    opaque engine error.  The cap is shrunk below the fixture size to
    trigger the guard without 23M rows."""
    from etl_cnc_spark.operators import stats

    monkeypatch.setattr(stats, "_HOEFF_CAP", 10)
    import pytest as _pytest

    with _pytest.raises(Exception) as exc:
        REGISTRY["stat_hoeffding_d"].build(spark, sf_dir).collect()
    assert "exactness cap" in str(exc.value)


def test_hoeffding_cap_raises_in_oracle_too(sf_dir):
    """Loud-failure parity: the oracle's error() fires on the same
    condition (cap swapped for a tiny value via the shared module
    constant — no literal spelled here)."""
    import duckdb
    import pytest as _pytest

    from etl_cnc_spark.oracle import duckdb_connect
    from etl_cnc_spark.operators import stats

    sql = REGISTRY["stat_hoeffding_d"].oracle.replace(
        str(stats._HOEFF_CAP), "10"
    )
    con = duckdb_connect(sf_dir)
    with _pytest.raises(duckdb.Error) as exc:
        con.execute(sql).df()
    assert "exactness cap" in str(exc.value)


def test_hoeffding_cap_is_the_decimal38_bound():
    """The shipped cap must be the documented derivation — the largest
    n with 16*n^5 under DECIMAL(38,0)'s ceiling, minus a safety
    margin — derived here from scratch (no target literal)."""
    from etl_cnc_spark.operators import stats

    bound = (10.0**38 / 16.0) ** 0.2
    assert stats._HOEFF_CAP <= bound
    assert stats._HOEFF_CAP >= 0.95 * bound


def test_persist_flip_key_partition_count_invariant(spark, sf_dir):
    """VERDICT r13 item 8: the r13 persist-flip keys materialize
    data-scaled frames mid-plan; pin that the materialized frame's
    CONTENT is invariant to shuffle partition count (1 vs 64) — the
    one invariance axis the cpus/splits/arrow harness does not vary
    directly.  text_bm25 is the representative flip key (its per-doc
    base frame is the r13 persist() site feeding stats, tf and
    scoring)."""
    from etl_cnc_spark.registry import load_all

    reg = load_all()

    def rows_at(n_parts: int):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        try:
            df = reg["text_bm25"].build(spark, sf_dir)
            return sorted(tuple(str(c) for c in r) for r in df.collect())
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    one = rows_at(1)
    many = rows_at(64)
    assert len(one) > 0
    assert one == many
