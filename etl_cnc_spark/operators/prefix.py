"""Distributed global ordering primitives — rank / running sums
WITHOUT a single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` collapses the whole
input onto one task ("WindowExec: No Partition Defined") — correct,
but a scale killer on unbounded inputs.  This module provides the
classic two-phase (range-partitioned) prefix computation instead:

1. ``repartitionByRange`` on the sort key — each partition holds a
   contiguous key range, partitions are ordered by partition id;
2. a PARTITIONED window per range bucket computes local row numbers
   and local running sums in parallel;
3. per-bucket totals (one tiny row per partition) are folded into
   exclusive offsets with a broadcast non-equi self-join — no window,
   no driver collect;
4. global rank = offset_count + local rank; global running sum =
   offset_sum + local running sum.

Cost: two shuffles of the data (range + hash-by-bucket) plus one
metadata-sized join, all parallel — the same algebra as the global
window, at any scale.  Results are independent of the number of
partitions, so range-sampling nondeterminism cannot perturb output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_ordered", "ntile_from_rank"]

_BUCKET = 1024  # pids per offset-fold bucket (step 3)


def _exclusive_offsets(totals: DataFrame, cols: list[str]) -> DataFrame:
    """Exclusive prefix sums of ``cols`` over the per-partition totals
    table, ordered by ``_pid`` — output columns ``_off_<c>``.

    Hierarchical two-level fold so the cost stays near-linear in the
    partition count P: within 1024-pid buckets the fold is an
    EQUI-join on the bucket id (hash join, ≤1024² pairs per bucket);
    across buckets the fold runs over only ⌈P/1024⌉ bucket-total rows
    (a broadcast non-equi join of metadata). A flat P² non-equi fold
    would be quadratic at cluster partition counts (P=10⁵ → 10¹⁰
    pairs); this shape is ≤1024·P + (P/1024)² — metadata-sized
    through P≈10⁶."""
    t = totals.withColumn("_bkt", F.expr(f"_pid DIV {_BUCKET}"))
    a, b = t.alias("a"), t.alias("b")
    within = (
        a.join(
            b,
            (F.col("b._bkt") == F.col("a._bkt"))
            & (F.col("b._pid") < F.col("a._pid")),
            "left",
        )
        .groupBy(F.col("a._pid").alias("_pid"), F.col("a._bkt").alias("_bkt"))
        .agg(
            *[
                F.coalesce(F.sum(f"b.{c}"), F.lit(0))
                .cast("long")
                .alias(f"_w_{c}")
                for c in cols
            ]
        )
    )
    bkt_tot = t.groupBy("_bkt").agg(
        *[F.sum(c).cast("long").alias(c) for c in cols]
    )
    ba, bb = bkt_tot.alias("ba"), bkt_tot.alias("bb")
    bkt_off = (
        ba.join(F.broadcast(bb), F.col("bb._bkt") < F.col("ba._bkt"), "left")
        .groupBy(F.col("ba._bkt").alias("_bkt"))
        .agg(
            *[
                F.coalesce(F.sum(f"bb.{c}"), F.lit(0))
                .cast("long")
                .alias(f"_b_{c}")
                for c in cols
            ]
        )
    )
    return within.join(F.broadcast(bkt_off), "_bkt").select(
        "_pid",
        *[
            (F.col(f"_w_{c}") + F.col(f"_b_{c}")).alias(f"_off_{c}")
            for c in cols
        ],
    )


def global_ordered(
    df: DataFrame,
    order_cols: list[Column],
    *,
    sums: dict[str, str] | None = None,
    rank_col: str | None = "rk",
    num_parts: int | None = None,
) -> DataFrame:
    """Append a global 1-based row number (``rank_col``) and, for each
    ``sums`` entry ``{src: dst}``, an inclusive global running BIGINT
    sum of ``src`` named ``dst``, ordered by ``order_cols`` — computed
    with range-partitioned prefix sums (see module docstring), never a
    single-partition window.

    ``order_cols`` must be a total order (tie-break with a unique key)
    for the rank to be deterministic.  Sum columns must be integral
    (the running sums are exact BIGINT — the money/cents discipline).
    """
    sums = sums or {}
    out_cols = df.columns
    if num_parts is None:
        num_parts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    ranged = df.repartitionByRange(num_parts, *order_cols).withColumn(
        "_pid", F.spark_partition_id().cast("long")
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = ranged.withColumn("_lrk", F.row_number().over(w).cast("long"))
    for src, dst in sums.items():
        local = local.withColumn(
            f"_lrun_{dst}", F.sum(src).over(w_run).cast("long")
        )
    totals = local.groupBy("_pid").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt"),
        *[
            F.sum(src).cast("long").alias(f"_tot_{dst}")
            for src, dst in sums.items()
        ],
    )
    offsets = _exclusive_offsets(totals, ["_cnt"] + [f"_tot_{d}" for d in sums.values()])
    offsets = offsets.select(
        "_pid",
        F.col("_off__cnt").alias("_off"),
        *[
            F.col(f"_off__tot_{dst}").alias(f"_off_{dst}")
            for dst in sums.values()
        ],
    )
    out = local.join(F.broadcast(offsets), "_pid")
    proj = list(out_cols)
    if rank_col is not None:
        out = out.withColumn(
            rank_col, (F.col("_off") + F.col("_lrk")).cast("long")
        )
        proj.append(rank_col)
    for dst in sums.values():
        out = out.withColumn(
            dst, (F.col(f"_off_{dst}") + F.col(f"_lrun_{dst}")).cast("long")
        )
        proj.append(dst)
    return out.select(*proj)


def ntile_from_rank(rk: Column, n: Column, k: int) -> Column:
    """Exact SQL-standard ``ntile(k)`` bucket from a 1-based global
    rank ``rk`` and total row count ``n`` (both BIGINT): the first
    ``n % k`` buckets take ``n DIV k + 1`` rows, the rest ``n DIV k``.
    Matches Spark's and DuckDB's ntile bit-for-bit, so an oracle can
    keep using ``ntile(k)`` while the Spark side stays free of the
    single-partition global window ntile would need.
    """
    def idiv(a: Column, b: Column) -> Column:
        # exact non-negative integer division (numerator made exactly
        # divisible first, so the double division is lossless)
        return ((a - a % b) / b).cast("long")

    q = idiv(n, F.lit(k).cast("long"))
    r = n % k
    big = r * (q + 1)
    return (
        F.when(rk <= big, idiv(rk - 1, q + 1) + 1)
        .otherwise(r + idiv(rk - big - 1, q) + 1)
        .cast("long")
    )
