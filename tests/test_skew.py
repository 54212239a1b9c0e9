"""Skew-mitigation evidence (VERDICT r01 task #3): prove the two
mitigation paths actually ENGAGE, not just that configs exist.

1. AQE skew-join split: a synthetic join sized past
   ``skewedPartitionThresholdInBytes`` must show
   ``SortMergeJoin(skew=true)`` / ``AQEShuffleRead .. skewed`` in the
   FINAL adaptive plan.  Sizing note: the probe aggregates the
   payload column — if the aggregate only touches the join key,
   column pruning drops the payload before the shuffle and the hot
   partition (a run of identical keys) compresses below any
   threshold, which is why undersized probes never see the split.
2. Salting: the deterministic (key, salt) scheme used by
   ``join_skew_salted`` must spread a hot key's rows across many
   shuffle partitions where the plain key keeps them on one task.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.shuffle.partitions": "16",
}


@contextlib.contextmanager
def _confs(spark, kv: dict[str, str]):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_skew_join_split_engages(spark):
    """One hot key ≫ threshold → OptimizeSkewedJoin must split it."""
    with _confs(spark, _SKEW_CONFS):
        # hot key 0 carries 2M rows × 64B payload (~130MB partition);
        # 10k cold keys carry ~20 rows each
        left = spark.range(0, 2_200_000).select(
            F.when(F.col("id") < 2_000_000, 0)
            .otherwise((F.col("id") % 10_000) + 1)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(0, 10_001).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("v")
        )
        agg = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("payload_bytes"),
            F.sum("v").alias("sv"),
        )
        [row] = agg.collect()
        assert row["n"] == 2_200_000  # join semantics intact
        plan = agg._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, final
        assert "skewed" in final, final  # AQEShuffleRead ... skewed


def test_salting_spreads_hot_key_across_partitions(spark):
    """The join_skew_salted scheme (xxhash64 % NSALT) redistributes a
    hot key over many tasks; the plain key pins it to one."""
    from etl_cnc_spark.operators.joins import NSALT

    hot = spark.range(0, 100_000).select(
        F.lit(7).cast("long").alias("k"), F.col("id")
    )
    plain_pids = (
        hot.repartition(32, "k")
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert plain_pids == 1  # the skew problem, demonstrated

    salted = hot.withColumn("salt", F.pmod(F.xxhash64("id"), F.lit(NSALT)))
    salted_pids = (
        salted.repartition(32, "k", "salt")
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    # NSALT distinct (k, salt) keys → up to NSALT partitions; require
    # a real spread, tolerating hash collisions between salt buckets
    assert salted_pids >= NSALT // 2, (salted_pids, NSALT)
