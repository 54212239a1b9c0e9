"""ETL pipeline operators — the reference project's home turf
(BASELINE.json: "ETL/pipeline ... standard Spark DataFrame
transformations"; no reference source exists to cite, see SURVEY.md §0).

These are the classic warehouse-loading shapes: MERGE/upsert, SCD
type-2 dimension versioning, typed cleaning, deterministic sampling,
wide→long unpivot, bucketed co-located joins, and a composed
documents-cleaning pipeline. Each is a pure DataFrame composition
(Catalyst plans it; no driver-side loops), and each is designed so
the same plan survives a 1000-executor / 100 TB scale-up:

- merge/SCD2 shuffle once on the natural key (AQE handles skew);
- sampling is hash-based (md5 prefix), so it needs no global state,
  samples the same rows on any cluster size, and pushes down as a
  cheap per-row predicate — never a driver-side random draw;
- the bucketed join removes the per-query shuffle entirely by
  pre-bucketing both sides on the join key (write once, join many).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ..utils import cents, q2, q4, sql_q2, sql_q4, tmpdir


# ---------------------------------------------------------------- merge


@register(
    "etl_merge_upsert",
    oracle=f"""
    WITH target AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 != 0
    ), source AS (
        SELECT o_orderkey, 'U' AS new_status, o_totalprice * 1.1 AS new_total
        FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.new_status
                ELSE t.o_orderstatus END AS status,
           {sql_q2("COALESCE(s.new_total, t.o_totalprice)")} AS total,
           CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                WHEN s.o_orderkey IS NULL THEN 'keep'
                ELSE 'update' END AS action
    FROM target t FULL JOIN source s ON t.o_orderkey = s.o_orderkey
    """,
)
def etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation on plain parquet tables.

    WHEN MATCHED → update, WHEN NOT MATCHED → insert, else keep —
    expressed as one full outer join + CASE, which is exactly the
    shuffle-once plan a native MERGE executes. At 100 TB the join key
    is the table's natural key, so AQE skew-join and partial
    aggregation apply unchanged; no per-row driver logic exists."""
    orders = table(spark, sf_dir, "orders")
    target = orders.where(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    source = orders.where(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("s_orderkey"),
        F.lit("U").alias("new_status"),
        (F.col("o_totalprice") * 1.1).alias("new_total"),
    )
    merged = target.join(
        source, target["o_orderkey"] == source["s_orderkey"], "full_outer"
    )
    matched = F.col("s_orderkey").isNotNull()
    return merged.select(
        F.coalesce("o_orderkey", "s_orderkey").alias("o_orderkey"),
        F.when(matched, F.col("new_status")).otherwise(F.col("o_orderstatus")).alias("status"),
        q2(F.coalesce("new_total", "o_totalprice")).alias("total"),
        F.when(F.col("o_orderkey").isNull(), "insert")
        .when(~matched, "keep")
        .otherwise("update")
        .alias("action"),
    )


# ----------------------------------------------------------------- scd2


@register(
    "etl_scd2",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS version_key,
           epoch_us(o_orderdate) AS valid_from_us,
           epoch_us(lead(o_orderdate) OVER w) AS valid_to_us,
           (lead(o_orderdate) OVER w IS NULL) AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def etl_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: effective-dated versions.

    Each order is a new version of the customer's state; valid_to is
    the next version's valid_from (NULL = current). One window over
    (custkey, orderdate) — a single shuffle on the dimension key, the
    canonical SCD2 build at any scale."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("version_key"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(nxt.cast("timestamp")).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


# ------------------------------------------------------- typed cleaning


@register(
    "etl_clean_types",
    oracle="""
    SELECT c_custkey,
           upper(trim(c_name)) AS name_clean,
           COALESCE(NULLIF(c_mktsegment, ''), 'UNKNOWN') AS segment,
           CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS acctbal_cents,
           (c_acctbal >= 0) AS in_good_standing
    FROM customer
    """,
)
def etl_clean_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-cleaning stage: trim/normalize strings, sentinel→NULL→
    default, money→exact integer cents, derived flags. All built-in
    expressions (whole-stage codegen; no Python in the row path)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.trim("c_name")).alias("name_clean"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("")), F.lit("UNKNOWN")).alias(
            "segment"
        ),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("acctbal_cents"),
        (F.col("c_acctbal") >= 0).alias("in_good_standing"),
    )


# -------------------------------------------------- deterministic sample


@register(
    "sample_deterministic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                     || CAST(l_linenumber AS VARCHAR)), 1, 1) = 'a'
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~1/16 deterministic sample via md5-prefix of the row key.

    The scale-correct sampling pattern: a pure per-row predicate —
    no RNG state, no seed coordination across executors, identical
    sample on 1 core or 1000 executors, and reproducible forever.
    (``df.sample(seed=)`` is partition-layout-dependent; this isn't.)"""
    li = table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return li.where(F.substring(F.md5(key), 1, 1) == "a").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


# -------------------------------------------------------------- unpivot


@register(
    "unpivot_melt",
    oracle="""
    SELECT * FROM (
      UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                      l_discount, l_tax
               FROM lineitem WHERE l_orderkey % 50 = 0)
      ON l_quantity, l_extendedprice, l_discount, l_tax
      INTO NAME measure VALUE val
    )
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of the four lineitem measures.

    Narrow, shuffle-free transformation — each input row expands to
    4 output rows locally, so it scales embarrassingly."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )


# -------------------------------------------------------- bucketed join


@register(
    "join_bucketed",
    oracle=f"""
    SELECT o.o_orderpriority AS priority,
           count(*) AS n_lines,
           {sql_q2("CAST(sum(CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0")} AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact⋈fact join via bucketing (write once, join many).

    Both sides are written ``bucketBy(8, key) sortBy(key)`` into the
    session catalog; Spark's bucketed scan then feeds a sort-merge
    join with NO Exchange on either side — at 100 TB this converts
    the dominant per-query shuffle into a one-time write cost. The
    aggregate after the join still shuffles (on the small group key),
    which is the cheap part."""
    import re
    
    tag = re.sub(r"[^0-9a-zA-Z]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    t_orders, t_lineitem = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"

    def _write(name: str, df: DataFrame, key: str) -> None:
        if spark.catalog.tableExists(name):
            return
        # External table at a fresh temp path: works even when the
        # session's warehouse dir (defaults to the caller's cwd) is
        # not writable, and a fresh path can never collide with a
        # previous session's leftover managed-table location.
        path = tmpdir(prefix=f"etlcnc_{name}_", stable=True, key=sf_dir)
        df.write.bucketBy(8, key).sortBy(key).mode("overwrite").format(
            "parquet"
        ).option("path", path).saveAsTable(name)

    _write(
        t_orders,
        table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        "o_orderkey",
    )
    _write(
        t_lineitem,
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice"),
        "l_orderkey",
    )
    o = spark.table(t_orders)
    li = spark.table(t_lineitem)
    joined = o.join(li, o["o_orderkey"] == li["l_orderkey"])
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        q2(
            F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"))
            / F.lit(100.0)
        ).alias("revenue"),
    )


# ------------------------------------------- composed cleaning pipeline


@register(
    "pipeline_docs_clean",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang, source, text,
               length(text) - length(replace(text, ' ', '')) + 1 AS words
        FROM documents
        WHERE n_chars BETWEEN 50 AND 2000
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS rn
        FROM scored
    )
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(words) AS DOUBLE)/count(*) AS avg_words
    FROM ranked WHERE rn = 1
    GROUP BY lang, source
    """,
)
def pipeline_docs_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data cleaning pipeline: quality gate →
    exact dedup (keep lowest doc_id per content hash) → per-(lang,
    source) profile. One quality filter (pushed to the scan), one
    dedup shuffle on the content hash, one aggregate — the minimal
    shuffle count for these semantics at any scale."""
    docs = table(spark, sf_dir, "documents").where(
        F.col("n_chars").between(50, 2000)
    )
    words = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + 1
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        docs.select("doc_id", "lang", "source", words.alias("words"), "text")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("words").cast("double") / F.count(F.lit(1))).alias("avg_words"),
    )


@register(
    "etl_latest_snapshot",
    oracle="""
    SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS last_ts_us,
           event_type AS last_type
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                  ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def etl_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot compaction: latest record per key (the
    first thing every warehouse does with a change stream). One
    window shuffle on the key; (ts, event_id) DESC makes the winner
    unique and deterministic."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("last_ts_us"),
            F.col("event_type").alias("last_type"),
        )
    )


@register(
    "pipeline_orders_mart",
    oracle="""
    SELECT n_name, epoch_us(date_trunc('month', o_orderdate)) AS month_us,
           CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5)
                    AS BIGINT)) AS DOUBLE)/100.0 AS revenue,
           count(*) AS n_lines,
           count(DISTINCT o_custkey) AS n_customers
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderstatus <> 'P'
    GROUP BY n_name, month_us
    """,
)
def pipeline_orders_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end relational ETL pipeline: extract facts → filter bad
    status → conform against dimensions → monthly revenue mart per
    nation. The classic warehouse load this engine's reference
    category ('ETL/pipeline') exists for: dims broadcast, the fact
    table shuffles once into the final aggregate grain."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "P")
    cu = table(spark, sf_dir, "customer")
    na = table(spark, sf_dir, "nation")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cu), o["o_custkey"] == cu["c_custkey"])
        .join(F.broadcast(na), cu["c_nationkey"] == na["n_nationkey"])
    )
    rev_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    return joined.groupBy(
        "n_name",
        F.unix_micros(F.date_trunc("month", F.col("o_orderdate"))).alias("month_us"),
    ).agg(
        (F.sum(rev_cents).cast("double") / 100.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
        F.count_distinct("o_custkey").alias("n_customers"),
    )


# ------------------------------------------------- stratified sampling

# Per-segment sampling fractions in 1/16ths of the hash space.
_STRATA = [
    ("AUTOMOBILE", 2),
    ("BUILDING", 4),
    ("FURNITURE", 6),
    ("HOUSEHOLD", 8),
    ("MACHINERY", 16),
]
_STRATA_SQL = ", ".join(f"('{s}', {f})" for s, f in _STRATA)


@register(
    "sample_stratified",
    oracle=f"""
    WITH strata(c_mktsegment, frac16) AS (VALUES {_STRATA_SQL}),
    b AS (
        SELECT c_custkey, c_mktsegment,
               CAST(strpos('0123456789abcdef',
                    substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) - 1
                    AS INT) AS bucket
        FROM customer
    )
    SELECT b.c_custkey, b.c_mktsegment, b.bucket
    FROM b JOIN strata s USING (c_mktsegment)
    WHERE b.bucket < s.frac16
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (``df.sampleBy`` semantics,
    but hash-based): each market segment keeps a different fraction,
    expressed in 1/16ths of the md5-prefix hash space.

    The strata spec is a 5-row DataFrame broadcast-joined onto the
    fact — the scale pattern for per-group sampling rates: the
    predicate stays per-row (no RNG state, identical sample on any
    cluster size), and changing rates means changing the tiny dim,
    not the query. Same md5-prefix trick as ``sample_deterministic``."""
    c = table(spark, sf_dir, "customer")
    strata = spark.createDataFrame(_STRATA, "c_mktsegment string, frac16 int")
    bucket = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1),
        )
        - 1
    ).cast("int")
    return (
        c.withColumn("bucket", bucket)
        .join(F.broadcast(strata), "c_mktsegment")
        .where(F.col("bucket") < F.col("frac16"))
        .select("c_custkey", "c_mktsegment", "bucket")
    )


# --------------------------------------------------- data-quality audit


@register(
    "etl_quality_report",
    oracle="""
    WITH o AS (
        SELECT count(*) AS total,
               CAST(count_if(o_custkey IS NULL) AS BIGINT) AS null_cust,
               CAST(count_if(o_orderstatus NOT IN ('F','O','P')) AS BIGINT)
                   AS bad_status,
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dups
        FROM orders
    ), l AS (
        SELECT count(*) AS total,
               CAST(count_if(l_discount < 0 OR l_discount > 1) AS BIGINT)
                   AS bad_disc,
               CAST(count_if(l_quantity <= 0) AS BIGINT) AS bad_qty
        FROM lineitem
    ), orphans AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem li
        WHERE NOT EXISTS (SELECT 1 FROM orders oo
                          WHERE oo.o_orderkey = li.l_orderkey)
    )
    SELECT 'orders.custkey_not_null' AS check_name, null_cust AS violations,
           CAST(total AS BIGINT) AS total FROM o
    UNION ALL
    SELECT 'orders.status_domain', bad_status, CAST(total AS BIGINT) FROM o
    UNION ALL
    SELECT 'orders.orderkey_unique', dups, CAST(total AS BIGINT) FROM o
    UNION ALL
    SELECT 'lineitem.discount_range', bad_disc, CAST(total AS BIGINT) FROM l
    UNION ALL
    SELECT 'lineitem.quantity_positive', bad_qty, CAST(total AS BIGINT) FROM l
    UNION ALL
    SELECT 'lineitem.orderkey_fk', orphans.n, CAST(l.total AS BIGINT)
    FROM orphans, l
    """,
)
def etl_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit report: null / domain / uniqueness / range /
    referential-integrity checks, one row per check with violation
    and total counts — the validation pass a production pipeline runs
    before publishing a load.

    All per-table checks fold into ONE conditional aggregate per
    table (a single scan each, map-side partials, 1-row outputs);
    only the FK check needs a join, expressed as a left-anti count
    that shuffles on the join key. Integer counts only — no float in
    the report, so the oracle hash is exact by construction."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")

    def _flag(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    # each 1-row audit aggregate feeds one union branch per check —
    # BOUNDED, lazy checkpoint so each table is scanned ONCE for its
    # conditional fold (4 orders + 4 lineitem scans before r13)
    o_agg = o.agg(
        F.count(F.lit(1)).alias("total"),
        _flag(F.col("o_custkey").isNull()).alias("null_cust"),
        _flag(~F.col("o_orderstatus").isin("F", "O", "P")).alias("bad_status"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dups"),
    ).localCheckpoint(eager=False)
    l_agg = li.agg(
        F.count(F.lit(1)).alias("total"),
        _flag((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias(
            "bad_disc"
        ),
        _flag(F.col("l_quantity") <= 0).alias("bad_qty"),
    ).localCheckpoint(eager=False)
    orphans = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(l_agg.select(F.col("total").alias("li_total")))
    )

    def _row(src: DataFrame, name: str, vcol: str, tcol: str) -> DataFrame:
        return src.select(
            F.lit(name).alias("check_name"),
            F.col(vcol).cast("long").alias("violations"),
            F.col(tcol).cast("long").alias("total"),
        )

    return (
        _row(o_agg, "orders.custkey_not_null", "null_cust", "total")
        .unionAll(_row(o_agg, "orders.status_domain", "bad_status", "total"))
        .unionAll(_row(o_agg, "orders.orderkey_unique", "dups", "total"))
        .unionAll(_row(l_agg, "lineitem.discount_range", "bad_disc", "total"))
        .unionAll(_row(l_agg, "lineitem.quantity_positive", "bad_qty", "total"))
        .unionAll(_row(orphans, "lineitem.orderkey_fk", "n", "li_total"))
    )


# ----------------------------------------------- incremental loading

_CUTOFF = "2024-01-15"


@register(
    "etl_incremental_merge",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           epoch_us(max(ts)) AS last_ts_us,
           CAST(count_if(event_type = 'purchase') AS BIGINT) AS purchases
    FROM events GROUP BY user_id
    """,
)
def etl_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (two-batch) aggregate maintenance: the nightly-
    load pattern where a running per-user summary table absorbs each
    new extract instead of recomputing history. Batch 1 = events
    before the cutoff, batch 2 = the rest; states merge with a
    full-outer join (count-sum / max / coalesce — all mergeable
    aggregates, the precondition for incremental maintenance).

    The oracle is the one-shot aggregate over ALL events: merging
    per-batch states MUST equal recomputation (the algebraic
    invariant that makes incremental loads trustworthy). Cost per
    load at 100 TB: one shuffle of the NEW batch + a key-join
    against the summary (|users| rows), never a history rescan."""
    e = table(spark, sf_dir, "events")

    def _state(batch: DataFrame) -> DataFrame:
        return batch.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_ts"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("purchases"),
        )

    s1 = _state(e.where(F.col("ts") < F.lit(_CUTOFF).cast("timestamp")))
    s2 = _state(e.where(F.col("ts") >= F.lit(_CUTOFF).cast("timestamp")))
    a, b = s1.alias("a"), s2.alias("b")
    merged = a.join(b, F.col("a.user_id") == F.col("b.user_id"), "full_outer")

    def _z(side: str, col: str) -> F.Column:
        return F.coalesce(F.col(f"{side}.{col}"), F.lit(0))

    return merged.select(
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
        (_z("a", "n_events") + _z("b", "n_events")).cast("long")
        .alias("n_events"),
        F.unix_micros(
            F.greatest(
                F.coalesce(F.col("a.last_ts"), F.col("b.last_ts")),
                F.coalesce(F.col("b.last_ts"), F.col("a.last_ts")),
            ).cast("timestamp")
        ).alias("last_ts_us"),
        (_z("a", "purchases") + _z("b", "purchases")).cast("long")
        .alias("purchases"),
    )


# ------------------------------------------------------ snapshot diff


@register(
    "etl_table_diff",
    oracle="""
    WITH newsnap AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 10 = 3
                    THEN o_totalprice * 1.1 ELSE o_totalprice END
                   AS o_totalprice
        FROM orders WHERE o_orderkey % 10 <> 7
        UNION ALL
        SELECT o_orderkey + 1000000, 'O', o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT
        CASE WHEN o.o_orderkey IS NULL THEN 'added'
             WHEN n.o_orderkey IS NULL THEN 'removed'
             ELSE 'changed' END AS change,
        COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        CAST(floor(COALESCE(o.o_totalprice, 0) * 100 + 0.5) AS BIGINT)
            AS old_cents,
        CAST(floor(COALESCE(n.o_totalprice, 0) * 100 + 0.5) AS BIGINT)
            AS new_cents
    FROM orders o FULL OUTER JOIN newsnap n USING (o_orderkey)
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR floor(o.o_totalprice * 100 + 0.5)
          <> floor(n.o_totalprice * 100 + 0.5)
    """,
)
def etl_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation / CDC generation — the inverse of
    MERGE: given yesterday's and today's snapshots, emit the change
    set (added / removed / changed rows with old and new values).
    One full-outer join on the key + a cents-compared value filter;
    the synthetic 'today' applies deterministic deletes (keys %10=7),
    updates (+10%% on %10=3), and inserts (shifted keys).

    At 100 TB the join shuffles both snapshots once on the key —
    bucket both snapshot tables on it and the diff is shuffle-free;
    value comparison in integer cents avoids float-equality traps."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    newsnap = (
        o.where(F.col("o_orderkey") % 10 != 7)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 10 == 3, F.col("o_totalprice") * 1.1
            ).otherwise(F.col("o_totalprice")),
        )
        .unionAll(
            o.where(F.col("o_orderkey") % 10 == 0).select(
                (F.col("o_orderkey") + 1000000).alias("o_orderkey"),
                F.lit("O").alias("o_orderstatus"),
                "o_totalprice",
            )
        )
    )
    a, b = o.alias("a"), newsnap.alias("b")
    j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    oc = cents(F.coalesce(F.col("a.o_totalprice"), F.lit(0.0)))
    nc = cents(F.coalesce(F.col("b.o_totalprice"), F.lit(0.0)))
    return j.where(
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (cents(F.col("a.o_totalprice")) != cents(F.col("b.o_totalprice")))
    ).select(
        F.when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("b.o_orderkey").isNull(), "removed")
        .otherwise("changed")
        .alias("change"),
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey"))
        .alias("o_orderkey"),
        oc.cast("long").alias("old_cents"),
        nc.cast("long").alias("new_cents"),
    )


# -------------------------------------------------- right-to-erasure


@register(
    "etl_gdpr_delete",
    oracle="""
    WITH forget AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 13
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_before,
           CAST(count_if(user_id % 97 <> 13) AS BIGINT) AS n_after,
           CAST(count_if(user_id % 97 = 13) AS BIGINT) AS n_purged
    FROM events GROUP BY event_type
    """,
)
def etl_gdpr_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure (GDPR/CCPA) hard delete: purge every event
    belonging to a deletion list, with an auditable before/after/
    purged count per event type — the compliance job every data
    platform runs on a clock. The delete is a LEFT ANTI join against
    the (small, broadcast) forget-list; at 100 TB this pairs with
    partition-aware rewrites: touch only files whose min/max user_id
    ranges can contain a listed user (the z-order/file-stats
    machinery), rewrite those, leave the rest byte-identical. The
    audit proves n_before = n_after + n_purged row-for-row."""
    e = table(spark, sf_dir, "events")
    forget = (
        e.where(F.col("user_id") % 97 == 13).select("user_id").distinct()
    )
    kept = e.join(F.broadcast(forget), "user_id", "left_anti")
    before = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_before")
    )
    after = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_after")
    )
    return (
        before.join(after, "event_type", "left")
        .select(
            "event_type",
            "n_before",
            F.coalesce(F.col("n_after"), F.lit(0)).cast("long")
            .alias("n_after"),
            (F.col("n_before") - F.coalesce(F.col("n_after"), F.lit(0)))
            .cast("long")
            .alias("n_purged"),
        )
    )


@register(
    "sample_reservoir",
    oracle="""
    WITH ranked AS (
        SELECT c_mktsegment, c_custkey,
               CAST(row_number() OVER (PARTITION BY c_mktsegment
                    ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey)
                    AS BIGINT) AS rk
        FROM customer
    )
    SELECT c_mktsegment, c_custkey, rk FROM ranked WHERE rk <= 3
    """,
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group fixed-size uniform sample (reservoir-sampling
    semantics, k=3 per segment) the deterministic distributed way:
    rank rows inside each group by their md5 hash — a uniform random
    permutation that every executor computes identically — and keep
    the k smallest. No RNG state, no sequential reservoir, same
    sample at any parallelism, and incremental loads can re-derive
    membership (a row's hash never changes). The eval-set/spot-check
    sampler for grouped data at scale; per-group k generalizes via a
    broadcast dim exactly like `sample_stratified`'s rates."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.md5(F.col("c_custkey").cast("string")), "c_custkey"
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


@register(
    "etl_scd2_lookup",
    oracle="""
    WITH dim AS (
        SELECT o_custkey AS custkey, o_orderkey AS version_key,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER w AS valid_to
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), probes AS (
        SELECT o_custkey AS custkey, o_orderkey AS probe_id,
               o_orderdate + INTERVAL 30 DAY AS probe_ts
        FROM orders WHERE o_orderkey % 20 = 0
    )
    SELECT p.probe_id, p.custkey, epoch_us(p.probe_ts) AS probe_us,
           d.version_key, epoch_us(d.valid_from) AS valid_from_us
    FROM probes p JOIN dim d
      ON p.custkey = d.custkey
     AND d.valid_from <= p.probe_ts
     AND (d.valid_to IS NULL OR p.probe_ts < d.valid_to)
    """,
)
def etl_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the SCD2 dimension — the other
    half of effective-dating: given (key, timestamp) probes, find
    THE version whose [valid_from, valid_to) contains the instant.
    Equi-join on the dimension key + interval containment filter:
    the range predicate rides on a hash join (never a theta join),
    and each probe matches exactly one version by construction —
    the half-open intervals tile the timeline. This is how every
    fact-table load resolves 'which customer state was true when
    this happened'; at 100 TB bucket both sides on the key and the
    lookup is shuffle-free."""
    dim_w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    o = table(spark, sf_dir, "orders")
    dim = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("version_key"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(dim_w).alias("valid_to"),
    )
    probes = o.where(F.col("o_orderkey") % 20 == 0).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("probe_id"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("probe_ts"),
    )
    p, d = probes.alias("p"), dim.alias("d")
    return (
        p.join(
            d,
            (F.col("p.custkey") == F.col("d.custkey"))
            & (F.col("d.valid_from") <= F.col("p.probe_ts"))
            & (
                F.col("d.valid_to").isNull()
                | (F.col("p.probe_ts") < F.col("d.valid_to"))
            ),
        )
        .select(
            "p.probe_id",
            "p.custkey",
            F.unix_micros(F.col("p.probe_ts").cast("timestamp"))
            .alias("probe_us"),
            "d.version_key",
            F.unix_micros(F.col("d.valid_from").cast("timestamp"))
            .alias("valid_from_us"),
        )
    )


@register(
    "etl_profile_columns",
    oracle="""
    SELECT 'o_orderstatus' AS col, CAST(count(*) AS BIGINT) AS n,
           CAST(count_if(o_orderstatus IS NULL) AS BIGINT) AS nulls,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS ndv,
           CAST(min(o_orderstatus) AS VARCHAR) AS min_s,
           CAST(max(o_orderstatus) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(count_if(o_orderpriority IS NULL) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           CAST(min(o_orderpriority) AS VARCHAR),
           CAST(max(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(count_if(o_custkey IS NULL) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS VARCHAR),
           CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    """,
)
def etl_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the ANALYZE/data-catalog statistics pass):
    per-column row count, null count, exact NDV, and min/max — the
    numbers that feed CBO statistics, data-catalog UIs, and drift
    monitors. All columns profile in ONE scan (a single aggregate
    computes every column's stats; the row-per-column shape is just
    a reshape of that one-row result), vs the naive one-query-per-
    column that multiplies scans. String-cast min/max keeps the
    schema uniform across column types. Swap exact NDV for
    approx_count_distinct when profiling wide tables at 100 TB."""
    o = table(spark, sf_dir, "orders")
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey"]
    one = o.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            agg
            for c in cols
            for agg in (
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"nulls_{c}"),
                F.countDistinct(c).alias(f"ndv_{c}"),
                F.min(c).cast("string").alias(f"min_{c}"),
                F.max(c).cast("string").alias(f"max_{c}"),
            )
        ],
    )
    out = None
    for c in cols:
        row = one.select(
            F.lit(c).alias("col"),
            F.col("n"),
            F.col(f"nulls_{c}").alias("nulls"),
            F.col(f"ndv_{c}").alias("ndv"),
            F.col(f"min_{c}").alias("min_s"),
            F.col(f"max_{c}").alias("max_s"),
        )
        out = row if out is None else out.unionAll(row)
    return out


K_ANON = 20  # minimum group size for a quasi-identifier to survive


@register(
    "etl_k_anonymity",
    oracle=f"""
    WITH sized AS (
        SELECT c_custkey, c_nationkey, c_mktsegment,
               count(*) OVER (PARTITION BY c_nationkey, c_mktsegment)
                   AS full_n,
               count(*) OVER (PARTITION BY c_nationkey) AS nat_n
        FROM customer
    )
    SELECT c_custkey,
           CASE WHEN full_n >= {K_ANON} OR nat_n >= {K_ANON}
                THEN CAST(c_nationkey AS VARCHAR) ELSE '*' END AS nation_qi,
           CASE WHEN full_n >= {K_ANON} THEN c_mktsegment
                ELSE '*' END AS segment_qi,
           CAST(CASE WHEN full_n >= {K_ANON} THEN 0
                     WHEN nat_n >= {K_ANON} THEN 1
                     ELSE 2 END AS BIGINT) AS generalization_level,
           CAST(CASE WHEN full_n >= {K_ANON} THEN full_n
                     WHEN nat_n >= {K_ANON} THEN nat_n
                     ELSE 0 END AS BIGINT) AS group_n
    FROM sized
    """,
)
def etl_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity generalization — the privacy transform next to
    gdpr_delete/pii_mask in every compliance pipeline: each row's
    quasi-identifiers (nation, market segment) are generalized up a
    fixed hierarchy until the row is hidden among ≥ k peers —
    level 0 keeps both, level 1 drops the segment (nation-only
    anonymity set), level 2 masks everything. Output is ROW-level
    (the anonymized release table), so the oracle hash verifies
    every row's generalization decision, not just group counts.

    Two window counts over the same shuffle key family (the finer
    partition is a refinement of the coarser, so AQE plans one
    exchange + one re-use); row-local CASE ladder after that —
    linear at any scale, no joins."""
    w_full = Window.partitionBy("c_nationkey", "c_mktsegment")
    w_nat = Window.partitionBy("c_nationkey")
    sized = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.count(F.lit(1)).over(w_full).alias("full_n"),
        F.count(F.lit(1)).over(w_nat).alias("nat_n"),
    )
    lvl0 = F.col("full_n") >= K_ANON
    lvl1 = F.col("nat_n") >= K_ANON
    return sized.select(
        "c_custkey",
        F.when(lvl0 | lvl1, F.col("c_nationkey").cast("string"))
        .otherwise("*")
        .alias("nation_qi"),
        F.when(lvl0, F.col("c_mktsegment")).otherwise("*").alias("segment_qi"),
        F.when(lvl0, 0).when(lvl1, 1).otherwise(2).cast("long").alias(
            "generalization_level"
        ),
        F.when(lvl0, F.col("full_n"))
        .when(lvl1, F.col("nat_n"))
        .otherwise(0)
        .cast("long")
        .alias("group_n"),
    )


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH f AS (
        SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS m0
        FROM orders GROUP BY 1
    ), cells AS (
        SELECT year(f.m0)*100 + month(f.m0) AS cohort_ym,
               (year(o.o_orderdate)*12 + month(o.o_orderdate))
                 - (year(f.m0)*12 + month(f.m0)) AS age_months,
               count(DISTINCT o.o_custkey) AS active_customers,
               CAST(SUM(CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders o JOIN f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    )
    SELECT CAST(cohort_ym AS BIGINT) AS cohort_ym,
           CAST(age_months AS BIGINT) AS age_months,
           CAST(active_customers AS BIGINT) AS active_customers,
           revenue_cents,
           CAST(SUM(revenue_cents) OVER (PARTITION BY cohort_ym
                ORDER BY age_months) AS BIGINT) AS cum_revenue_cents
    FROM cells
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value — the money companion to
    events_retention: customers are cohorted by first-order month,
    and every (cohort, months-since-first) cell reports active
    customers, exact integer-cent revenue, and the RUNNING cumulative
    LTV curve per cohort. Month arithmetic is exact integer
    (year×12+month deltas), revenue is the cents discipline, and the
    cumulative window partitions by cohort over month-grained rows
    (≤ ~100 per cohort — metadata-sized partitions at any scale;
    the heavy lifting is the one per-customer aggregate + one
    cohort-cell aggregate)."""
    o = table(spark, sf_dir, "orders")
    f = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("m0")
    )
    ym = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    cells = (
        o.join(f, "o_custkey")
        .groupBy(
            (F.year("m0") * 100 + F.month("m0")).cast("long").alias("cohort_ym"),
            (ym(F.col("o_orderdate")) - ym(F.col("m0")))
            .cast("long")
            .alias("age_months"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            F.sum(cents(F.col("o_totalprice"))).cast("long").alias("revenue_cents"),
        )
    )
    w = (
        Window.partitionBy("cohort_ym")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.select(
        "cohort_ym",
        "age_months",
        "active_customers",
        "revenue_cents",
        F.sum("revenue_cents").over(w).cast("long").alias("cum_revenue_cents"),
    )


_FK_RELATIONS = [
    # (child table, child key, parent table, parent key)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
]


def _fk_oracle() -> str:
    parts = []
    for child, ck, parent, pk in _FK_RELATIONS:
        parts.append(f"""
        SELECT '{child}.{ck}->{parent}.{pk}' AS relation,
               CAST(count(*) AS BIGINT) AS child_rows,
               CAST(count(*) FILTER (WHERE p.{pk} IS NULL) AS BIGINT)
                   AS orphan_rows,
               CAST(count(DISTINCT CASE WHEN p.{pk} IS NULL
                    THEN c.{ck} END) AS BIGINT) AS orphan_keys
        FROM {child} c LEFT JOIN {parent} p ON c.{ck} = p.{pk}""")
    return " UNION ALL ".join(parts)


@register("etl_fk_integrity", oracle=_fk_oracle())
def etl_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the whole star schema: for
    every declared FK relation, the child row count, rows whose key
    has no parent (orphans), and distinct orphan key values — the
    first report a warehouse runs after any load, and the check that
    catches a bad incremental merge before queries silently drop
    rows via inner joins.

    Each relation is one left join + conditional aggregate; parents
    are dimension-sized → broadcast (the fixture's relations), and a
    fact×fact relation degrades to one shuffle. The per-relation
    single-row aggregates union into the report — metadata-sized
    output at any scale."""
    out = None
    for child, ck, parent, pk in _FK_RELATIONS:
        c = table(spark, sf_dir, child).select(F.col(ck).alias("_ck"))
        p = table(spark, sf_dir, parent).select(F.col(pk).alias("_pk")).distinct()
        row = (
            c.join(F.broadcast(p), F.col("_ck") == F.col("_pk"), "left")
            .agg(
                F.lit(f"{child}.{ck}->{parent}.{pk}").alias("relation"),
                F.count(F.lit(1)).cast("long").alias("child_rows"),
                F.count(F.when(F.col("_pk").isNull(), 1))
                .cast("long")
                .alias("orphan_rows"),
                F.countDistinct(
                    F.when(F.col("_pk").isNull(), F.col("_ck"))
                )
                .cast("long")
                .alias("orphan_keys"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "etl_skew_report",
    oracle="""
    WITH freq AS (
        SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(max(n) AS BIGINT) AS max_n
        FROM freq
    )
    SELECT key, n,
           CAST(rnk AS BIGINT) AS rnk,
           round(CAST(n AS DOUBLE) / total, 4) AS share,
           n_keys,
           round(CAST(max_n AS DOUBLE) * n_keys / total, 4) AS skew_factor
    FROM (
        SELECT f.key, f.n, t.total, t.n_keys, t.max_n,
               row_number() OVER (ORDER BY f.n DESC, f.key) AS rnk
        FROM freq f CROSS JOIN tot t
    ) WHERE rnk <= 10
    """,
)
def etl_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the report that DECIDES whether a
    key needs salting before a 100 TB join: the 10 heaviest key
    values with their shuffle share, total key cardinality, and the
    skew factor (max key frequency ÷ mean; 1.0 = perfectly uniform,
    ≫1 = a straggler partition waiting to happen). One groupBy on
    the key (the same shuffle the join would pay), one single-row
    totals broadcast; the top-10 comes from TakeOrderedAndProject
    with the rank window running on the limited 10-row frame only —
    never a global window over the key table."""
    li = table(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = freq.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_n"),
    )
    top = (
        freq.orderBy(F.col("n").desc(), "key")
        .limit(10)
        .crossJoin(F.broadcast(tot))
    )
    w = Window.orderBy(F.col("n").desc(), "key")
    return top.withColumn("rnk", F.row_number().over(w).cast("long")).select(
        "key",
        "n",
        "rnk",
        q4(F.col("n").cast("double") / F.col("total")).alias("share"),
        "n_keys",
        q4(F.col("max_n").cast("double") * F.col("n_keys") / F.col("total")).alias(
            "skew_factor"
        ),
    )


@register(
    "orders_order_to_cash",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(min(datediff('day', o.o_orderdate, l.l_shipdate))
                AS BIGINT) AS min_days,
           round(quantile_cont(datediff('day', o.o_orderdate,
                l.l_shipdate), 0.5), 4) AS p50_days,
           round(quantile_cont(datediff('day', o.o_orderdate,
                l.l_shipdate), 0.9), 4) AS p90_days,
           CAST(max(datediff('day', o.o_orderdate, l.l_shipdate))
                AS BIGINT) AS max_days
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def orders_order_to_cash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per priority class — the
    operational SLA metric every order pipeline reports: min / exact
    interpolated p50 & p90 / max of the per-line (shipdate −
    orderdate) day gap. Exact integer day deltas feed Spark's exact
    `percentile` (same linear-interpolation definition as DuckDB's
    quantile_cont — the agg_stats-verified pairing), so the
    percentiles hash-match without approximation. One fact⋈fact
    equi-join shuffle + one aggregate."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    days = F.datediff("l_shipdate", "o_orderdate").cast("long")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.min(days).cast("long").alias("min_days"),
            q4(F.expr(
                "percentile(CAST(datediff(l_shipdate, o_orderdate) AS LONG), 0.5)"
            )).alias("p50_days"),
            q4(F.expr(
                "percentile(CAST(datediff(l_shipdate, o_orderdate) AS LONG), 0.9)"
            )).alias("p90_days"),
            F.max(days).cast("long").alias("max_days"),
        )
    )


@register(
    "sample_weighted_deterministic",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                    AS BIGINT) AS h
        FROM documents
    ), weighted AS (
        SELECT doc_id, lang, words,
               round(CAST(h AS DOUBLE) / 16777216, 4) AS u,
               round(least(1.0, CAST(words AS DOUBLE) / 120), 4) AS keep_p
        FROM scored
    )
    SELECT doc_id, lang, words, u, keep_p FROM weighted WHERE u < keep_p
    """,
)
def sample_weighted_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED deterministic sampling — the importance-sampling
    primitive behind quality-weighted training mixes: each document
    is kept with probability proportional to its quality signal
    (token count here, capped at 1), decided by comparing a content-
    hash uniform u = int(md5(id)[:6]) / 2^24 against the weight.
    Same guarantees as sample_deterministic (no RNG state, identical
    sample at any parallelism, reproducible forever, pushes down as a
    row-local predicate) but with PER-ROW acceptance probabilities —
    upsampling high-quality and downsampling boilerplate without a
    shuffle. Emitting (u, keep_p) makes the accept decision itself
    auditable/hash-verified."""
    d = table(spark, sf_dir, "documents")
    words = F.size(F.split("text", " ")).cast("long")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    weighted = d.select(
        "doc_id",
        "lang",
        words.alias("words"),
        q4(h.cast("double") / (1 << 24)).alias("u"),
        q4(F.least(F.lit(1.0), words.cast("double") / 120)).alias("keep_p"),
    )
    return weighted.where(F.col("u") < F.col("keep_p"))


# ------------------------------------------------------------- benford


@register(
    "etl_benford",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice*100 + 0.5)
                                    AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS d
        FROM orders
    ), obs AS (
        SELECT d, CAST(count(*) AS BIGINT) AS obs
        FROM digits GROUP BY d
    ), tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM obs)
    SELECT d, obs, n,
           {sql_q4("CAST(obs AS DOUBLE) / n")} AS obs_p,
           {sql_q4("log10(1.0 + 1.0 / d)")} AS exp_p,
           {sql_q4("(obs - n * log10(1.0 + 1.0 / d))"
                   " * (obs - n * log10(1.0 + 1.0 / d))"
                   " / (n * log10(1.0 + 1.0 / d))")} AS chi2_contrib
    FROM obs CROSS JOIN tot
    """,
)
def etl_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of o_totalprice — the
    classic fraud / data-fabrication screen a warehouse QA layer
    runs next to etl_quality_report: observed first-significant-
    digit shares vs the Benford expectation log10(1+1/d), with the
    per-digit chi-square contribution so an analyst sees WHICH digit
    deviates, not just that the total does.

    The first digit comes from the integer-cents string (exact: no
    float formatting differences between engines), so the data-sized
    work is one projection plus a 9-row hash aggregate; everything
    after runs on the digit grid with a broadcast of the single-row
    total. Expected counts multiply as doubles (n * p_d overflows
    nothing, but keeps the op order fixed on both engines)."""
    o = table(spark, sf_dir, "orders")
    d_col = (
        F.substring(cents(F.col("o_totalprice")).cast("string"), 1, 1)
        .cast("long")
        .alias("d")
    )
    obs = o.select(d_col).groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    tot = obs.agg(F.sum("obs").cast("long").alias("n"))
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d"))
    dev = F.col("obs") - F.col("n") * exp_p
    return obs.crossJoin(F.broadcast(tot)).select(
        "d",
        "obs",
        "n",
        q4(F.col("obs").cast("double") / F.col("n")).alias("obs_p"),
        q4(exp_p).alias("exp_p"),
        q4(dev * dev / (F.col("n") * exp_p)).alias("chi2_contrib"),
    )


# -------------------------------------------------------- survivorship


@register(
    "etl_survivorship",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderpriority, o_orderstatus, o_orderdate,
               o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ), latest AS (
        SELECT o_custkey,
               max(CASE WHEN rn = 1 THEN o_orderpriority END)
                   AS latest_priority,
               CAST(count(*) AS BIGINT) AS n_records,
               epoch_us(min(o_orderdate)) AS first_seen_us,
               epoch_us(max(o_orderdate)) AS last_seen_us,
               CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM ranked GROUP BY o_custkey
    ), status_counts AS (
        SELECT o_custkey, o_orderstatus,
               CAST(count(*) AS BIGINT) AS cnt,
               row_number() OVER (PARTITION BY o_custkey
                   ORDER BY count(*) DESC, o_orderstatus) AS srk
        FROM orders GROUP BY o_custkey, o_orderstatus
    )
    SELECT l.o_custkey AS custkey, l.latest_priority,
           s.o_orderstatus AS status_mode, s.cnt AS status_mode_n,
           l.n_records, l.first_seen_us, l.last_seen_us, l.total_cents
    FROM latest l JOIN status_counts s
      ON l.o_custkey = s.o_custkey AND s.srk = 1
    """,
)
def etl_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship — the merge step after entity
    resolution (join_fuzzy_names finds the duplicates; this decides
    which field value wins). Per customer, each order is treated as
    a record snapshot and each field gets its own survivorship rule:
    most-recent-wins for priority (recency rule), most-frequent-wins
    with a deterministic lexicographic tie-break for status
    (consensus rule), plus first/last-seen lineage and the exact
    money total.

    Both rules are window + aggregate compositions on the SAME
    partition key, so Catalyst reuses one shuffle for the recency
    window and the status rank joins back on the already-clustered
    key — no per-field pass, no driver-side merge logic. Determinism
    everywhere: ties broken by (date, key) or (count, value), never
    by arrival order."""
    o = table(spark, sf_dir, "orders")
    wrec = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    ranked = o.withColumn("rn", F.row_number().over(wrec))
    latest = ranked.groupBy("o_custkey").agg(
        F.max(F.when(F.col("rn") == 1, F.col("o_orderpriority"))).alias(
            "latest_priority"
        ),
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.unix_micros(F.min("o_orderdate").cast("timestamp")).alias(
            "first_seen_us"
        ),
        F.unix_micros(F.max("o_orderdate").cast("timestamp")).alias(
            "last_seen_us"
        ),
        F.sum(cents(F.col("o_totalprice"))).cast("long").alias("total_cents"),
    )
    counts = o.groupBy("o_custkey", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wmode = Window.partitionBy("o_custkey").orderBy(
        F.desc("cnt"), "o_orderstatus"
    )
    mode = (
        counts.withColumn("srk", F.row_number().over(wmode))
        .where(F.col("srk") == 1)
        .select(
            "o_custkey",
            F.col("o_orderstatus").alias("status_mode"),
            F.col("cnt").alias("status_mode_n"),
        )
    )
    return latest.join(mode, "o_custkey").select(
        F.col("o_custkey").alias("custkey"),
        "latest_priority",
        "status_mode",
        "status_mode_n",
        "n_records",
        "first_seen_us",
        "last_seen_us",
        "total_cents",
    )


# ------------------------------------------------ DP noisy release

DP_EPS_B = 1.0  # Laplace scale b = sensitivity/epsilon = 1/1


@register(
    "etl_dp_release",
    notes="NOT a usable DP mechanism as-is: the noise is a keyed-PRF "
    "pseudo-draw from a PUBLIC md5 of the group key, and n_true is "
    "emitted alongside for the verification hash - the pseudo_noise "
    "column name and this note exist so the key is never copied as "
    "a real private release (swap md5 for a secret-keyed HMAC and "
    "drop n_true for actual DP).",
    oracle=f"""
    WITH g AS (
        SELECT o_orderpriority, o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_true
        FROM orders GROUP BY 1, 2
    ), seeded AS (
        SELECT o_orderpriority, o_orderstatus, n_true,
               (CAST(CAST('0x' || substr(md5(o_orderpriority || '|'
                                             || o_orderstatus), 1, 6)
                     AS UBIGINT) AS DOUBLE) + 0.5) / 16777216.0 - 0.5 AS uc
        FROM g
    ), noised AS (
        SELECT o_orderpriority, o_orderstatus, n_true,
               -{DP_EPS_B} * CASE WHEN uc < 0 THEN -1.0 ELSE 1.0 END
                 * ln(1.0 - 2.0 * abs(uc)) AS noise
        FROM seeded
    )
    SELECT o_orderpriority, o_orderstatus, n_true,
           {sql_q4("noise")} AS pseudo_noise,
           CAST(greatest(0, n_true
                + CAST(floor(noise + 0.5) AS BIGINT)) AS BIGINT)
               AS n_released
    FROM noised
    """,
)
def etl_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (Laplace mechanism,
    sensitivity 1, ε=1) over the priority×status contingency grid —
    the privacy-layer sibling of etl_k_anonymity: each released
    count is the true count plus Laplace(1) noise via the inverse
    CDF −b·sgn(u)·ln(1−2|u|), clamped at zero.

    The noise draw is PSEUDO-noise seeded by a content hash of the
    group key — deliberately, and the point for a verified pipeline:
    a DP release job must be rerunnable/auditable (same release on
    retry, not a fresh draw that burns extra ε), so production DP
    systems derive noise from a keyed PRF exactly like this; swap
    the md5 for a secret-keyed HMAC and the release is real DP. The
    true count rides along here ONLY for the verification hash.
    Scale: one hash aggregate to the bounded group grid; noise is a
    per-group scalar expression."""
    o = table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("o_orderpriority"), F.col("o_orderstatus")
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(16777216.0) - F.lit(0.5)
    noise = (
        -F.lit(DP_EPS_B)
        * F.when(u < 0, -1.0).otherwise(1.0)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    )
    noised = g.select("o_orderpriority", "o_orderstatus", "n_true", noise.alias("noise"))
    return noised.select(
        "o_orderpriority",
        "o_orderstatus",
        "n_true",
        q4(F.col("noise")).alias("pseudo_noise"),
        F.greatest(
            F.lit(0),
            F.col("n_true") + F.floor(F.col("noise") + F.lit(0.5)).cast("long"),
        )
        .cast("long")
        .alias("n_released"),
    )


# ---------------------------------------------- reconciliation / privacy

CHECKSUM_MOD = 1 << 62


@register(
    "etl_table_checksum",
    oracle=f"""
    WITH canon AS (
        SELECT CAST(CAST('0x' || substr(md5(
                   CAST(o_orderkey AS VARCHAR) || '|'
                   || CAST(o_custkey AS VARCHAR) || '|'
                   || o_orderstatus || '|' || o_orderpriority || '|'
                   || CAST(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)
                           AS VARCHAR) || '|'
                   || CAST(o_orderdate AS VARCHAR)), 1, 15)
               AS UBIGINT) AS BIGINT) AS h
        FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(CAST(sum(CAST(h AS HUGEINT)) AS HUGEINT)
                % {CHECKSUM_MOD} AS BIGINT) AS checksum,
           CAST(min(h) AS BIGINT) AS min_h, CAST(max(h) AS BIGINT) AS max_h
    FROM canon
    """,
)
def etl_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum — the cross-system
    reconciliation primitive behind every migration cutover: each
    row canonicalizes to a delimited string of engine-neutral
    lexemes (integer keys, strings, money as integer cents, dates as
    ISO text — NEVER raw doubles, whose formatting differs between
    engines), hashes to a 60-bit md5 integer, and the table digest
    is the exact SUM of row hashes mod 2^62 — commutative, so two
    systems can compare digests regardless of partitioning, sort
    order, or engine, and a single changed row changes the digest.

    Scale: embarrassingly parallel (one projection + one agg with
    map-side partials); min/max row hashes ride along so a mismatch
    can be range-bisected to the offending rows — checksum, then
    binary-search by hash range, the standard reconciliation
    drill-down."""
    o = table(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
        cents(F.col("o_totalprice")).cast("string"),
        F.col("o_orderdate").cast("string"),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    rows = o.select(h.alias("h"))
    return rows.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.sum(F.col("h").cast("decimal(38,0)")) % CHECKSUM_MOD)
        .cast("long")
        .alias("checksum"),
        F.min("h").cast("long").alias("min_h"),
        F.max("h").cast("long").alias("max_h"),
    )


@register(
    "etl_pseudonymize",
    oracle="""
    WITH c_tok AS (
        SELECT substr(md5('cust|' || CAST(c_custkey AS VARCHAR)), 1, 16)
                   AS c_token,
               c_nationkey
        FROM customer
    ), o_tok AS (
        SELECT substr(md5('cust|' || CAST(o_custkey AS VARCHAR)), 1, 16)
                   AS o_token
        FROM orders
    ), joined AS (
        SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS n_orders
        FROM o_tok o JOIN c_tok c ON o.o_token = c.c_token
        GROUP BY c.c_nationkey
    ), raw AS (
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders_raw
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c_nationkey
    )
    SELECT j.c_nationkey AS nationkey, j.n_orders, r.n_orders_raw,
           j.n_orders = r.n_orders_raw AS integrity_ok
    FROM joined j JOIN raw r ON j.c_nationkey = r.c_nationkey
    """,
)
def etl_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent pseudonymization — the privacy transform between
    etl_k_anonymity (generalize) and etl_gdpr_delete (erase): the
    customer key is replaced by a keyed-hash token IDENTICALLY in
    every table that carries it, so referential integrity survives
    tokenization (analysts join on tokens; the raw key never leaves
    the trust boundary — in production the '|'-salted md5 becomes a
    secret-keyed HMAC, same plan). The output is the integrity
    audit itself: per nation, order counts joined via tokens must
    equal the raw-key join, and the equality flag is hash-verified.

    Scale: tokenization is a per-row scalar (pushes through the
    scan); the token join shuffles exactly like the raw-key join it
    replaces — pseudonymization adds zero shuffle structure."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")

    def token(col):
        return F.substring(
            F.md5(F.concat_ws("|", F.lit("cust"), col.cast("string"))), 1, 16
        )

    c_tok = c.select(token(F.col("c_custkey")).alias("c_token"), "c_nationkey")
    o_tok = o.select(token(F.col("o_custkey")).alias("o_token"))
    joined = (
        o_tok.join(c_tok, o_tok["o_token"] == c_tok["c_token"])
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    raw = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders_raw"))
    )
    return joined.join(raw, "c_nationkey").select(
        F.col("c_nationkey").alias("nationkey"),
        "n_orders",
        "n_orders_raw",
        (F.col("n_orders") == F.col("n_orders_raw")).alias("integrity_ok"),
    )


# ------------------------------------------------ CDC log compaction

# deterministic op derivation from the event stream: signup = insert,
# error = delete, anything else = update — a stand-in CDC log with
# the real compaction semantics
_CDC_OP = (
    "CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' "
    "ELSE 'U' END"
)


@register(
    "etl_cdc_net_changes",
    oracle=f"""
    WITH log AS (
        SELECT user_id, ts, event_id, {_CDC_OP} AS op,
               CAST(floor(value*100 + 0.5) AS BIGINT) AS val_cents
        FROM events
    ), ordered AS (
        SELECT user_id, ts,
               first_value(op) OVER w AS f_op,
               last_value(op) OVER w AS l_op,
               last_value(val_cents) OVER w AS l_val
        FROM log
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING)
    ), agg AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_ops,
               max(f_op) AS first_op,
               max(l_op) AS last_op,
               CAST(max(l_val) AS BIGINT) AS last_val_cents,
               CAST(epoch_us(max(ts)) AS BIGINT) AS last_ts_us
        FROM ordered GROUP BY user_id
    )
    SELECT user_id, n_ops, first_op, last_op, last_val_cents, last_ts_us,
           CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'NONE'
                WHEN first_op = 'I' THEN 'I'
                WHEN last_op = 'D' THEN 'D'
                ELSE 'U' END AS net_op
    FROM agg
    """,
)
def etl_cdc_net_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction to NET changes per key — what every
    warehouse MERGE pre-pass does with a Debezium/DMS change stream:
    a key inserted then deleted inside the window nets to nothing,
    inserted then updated nets to one INSERT with the final image,
    existing-then-deleted nets to DELETE, anything else to UPDATE.
    Ops derive deterministically from the event stream (signup=I,
    error=D, else U) so the compaction semantics are fully
    hash-verified.

    Scale shape: ONE hash aggregate per key — first/last op and the
    final image via min_by/max_by on the (ts, event_id) total order,
    all mergeable (map-side combined), no window, no sort, no
    self-join; the output is |keys| rows ready for a single MERGE.
    Compare etl_merge_upsert (applies changes) and etl_scd2 (keeps
    history) — this key is the log→net-delta stage in front of
    both."""
    e = table(spark, sf_dir, "events")
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    log = e.select(
        "user_id",
        "ts",
        "event_id",
        F.expr(_CDC_OP).alias("op"),
        cents(F.col("value")).alias("val_cents"),
    )
    agg = log.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ops"),
        F.min_by("op", ordk).alias("first_op"),
        F.max_by("op", ordk).alias("last_op"),
        F.max_by("val_cents", ordk).alias("last_val_cents"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
    )
    return agg.select(
        "user_id",
        "n_ops",
        "first_op",
        "last_op",
        "last_val_cents",
        "last_ts_us",
        F.when(
            (F.col("first_op") == "I") & (F.col("last_op") == "D"), "NONE"
        )
        .when(F.col("first_op") == "I", "I")
        .when(F.col("last_op") == "D", "D")
        .otherwise("U")
        .alias("net_op"),
    )


# --------------------------------------------------- l-diversity audit

L_DIV = 3  # each QI group must carry >= l distinct sensitive values


@register(
    "etl_l_diversity",
    oracle=f"""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(count(*) AS BIGINT) AS group_n,
               CAST(count(DISTINCT CAST(floor(c_acctbal / 1000)
                    AS BIGINT)) AS BIGINT) AS l_band
        FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, group_n, l_band,
           l_band >= {L_DIV} AS l_diverse,
           CAST(count(*) OVER () AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN l_band >= {L_DIV} THEN 1 ELSE 0 END)
                OVER () AS BIGINT) AS n_diverse_groups
    FROM g
    """,
)
def etl_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the companion check to etl_k_anonymity
    (Machanavajjhala et al., public): a QI group that is large
    enough for k-anonymity can still leak if every member shares the
    same sensitive value, so each (nation, segment) group must carry
    ≥ l distinct sensitive values (account-balance bands here).
    Emits the per-group diversity count + flag and the corpus-level
    pass rate a release gate would enforce.

    Scale shape: one hash aggregate with a distinct-count on the
    banded sensitive attribute (bounded band domain ⇒ the distinct
    set per group is small; exact, no sketch needed), then two
    metadata-level window totals over |groups| rows. The QI keys
    reuse etl_k_anonymity's columns so the two audits share a
    shuffle family in a combined release pipeline."""
    c = table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("group_n"),
        F.count_distinct(
            F.floor(F.col("c_acctbal") / 1000).cast("long")
        )
        .cast("long")
        .alias("l_band"),
    )
    wall = Window.partitionBy()
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "group_n",
        "l_band",
        (F.col("l_band") >= L_DIV).alias("l_diverse"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_groups"),
        F.sum(
            F.when(F.col("l_band") >= L_DIV, 1).otherwise(0)
        )
        .over(wall)
        .cast("long")
        .alias("n_diverse_groups"),
    )


COMPACT_TARGET_FILES = 4  # post-compaction file count


@register(
    "etl_compact_small_files",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS price_cents
    FROM lineitem GROUP BY 1
    """,
)
def etl_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance job every 100 TB
    lake runs nightly: a deliberately fragmented copy of lineitem
    (maxRecordsPerFile forces hundreds of tiny files — the
    many-writers / streaming-ingest pathology that destroys scan
    throughput via per-file open overhead and starves the driver
    with listing) is rewritten through repartition({COMPACT_TARGET_FILES})
    into exactly {COMPACT_TARGET_FILES} right-sized files. The
    returned rollup reads the COMPACTED copy, so the oracle verifies
    compaction is byte-lossless; tests/test_r7_wave_p.py asserts the
    before/after file counts (fragmented >> compacted == target).
    At scale the same job targets files of
    spark.sql.files.maxPartitionBytes so one scan task maps to one
    file."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    frag = tmpdir(prefix="etlcnc_frag_", stable=True, key=sf_dir)
    li.write.mode("overwrite").option("maxRecordsPerFile", 500).parquet(
        frag
    )
    compacted = tmpdir(prefix="etlcnc_compact_", stable=True, key=sf_dir)
    spark.read.parquet(frag).repartition(
        COMPACT_TARGET_FILES
    ).write.mode("overwrite").parquet(compacted)
    return (
        spark.read.parquet(compacted)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            )
            .cast("long")
            .alias("price_cents"),
        )
    )


# --------------------------------------------- schema discovery (r8 wave)

# Candidate inclusion dependencies to PROBE (discovery, not the
# declared-FK audit etl_fk_integrity runs): true FKs, a cross-domain
# true inclusion, and decoys that must come back partial.
_IND_CANDIDATES = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("orders", "o_orderkey", "customer", "c_custkey"),  # decoy
    ("part", "p_size", "nation", "n_nationkey"),  # decoy
]


def _ind_oracle() -> str:
    parts = []
    for child, ck, parent, pk in _IND_CANDIDATES:
        parts.append(f"""
    SELECT '{child}.{ck}' AS child_col, '{parent}.{pk}' AS parent_col,
           CAST(count(*) AS BIGINT) AS n_child_distinct,
           CAST(count(p.pk) AS BIGINT) AS n_contained,
           floor(CAST(count(p.pk) AS DOUBLE) / count(*) * 1e4 + 0.5) / 1e4
               AS containment,
           (count(p.pk) = count(*)) AS is_inclusion
    FROM (SELECT DISTINCT {ck} AS ck FROM {child}) c
    LEFT JOIN (SELECT DISTINCT {pk} AS pk FROM {parent}) p ON p.pk = c.ck
        """)
    return " UNION ALL ".join(parts)


@register("etl_fk_discovery", oracle=_ind_oracle())
def etl_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key DISCOVERY via inclusion-dependency probing: for
    each candidate (child column, parent column) pair, the fraction
    of distinct child values contained in the parent — containment
    1.0 flags an inclusion dependency (FK candidate), partial
    containment flags a decoy (the discovery complement of
    etl_fk_integrity, which audits keys already declared).

    Scale shape: each probe is two DISTINCT hash-aggregates (child
    and parent collapse to their key domains FIRST — the shuffle
    carries distinct values, never fact rows) and one left join on
    the collapsed domains; parents here are dimension-sized so the
    join broadcasts. The report is one row per candidate pair."""
    out = None
    for child, ck, parent, pk in _IND_CANDIDATES:
        c = table(spark, sf_dir, child).select(F.col(ck).alias("ck")).distinct()
        p = table(spark, sf_dir, parent).select(F.col(pk).alias("pk")).distinct()
        row = (
            c.join(p, F.col("pk") == F.col("ck"), "left")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_child_distinct"),
                F.count("pk").cast("long").alias("n_contained"),
            )
            .select(
                F.lit(f"{child}.{ck}").alias("child_col"),
                F.lit(f"{parent}.{pk}").alias("parent_col"),
                "n_child_distinct",
                "n_contained",
                q4(
                    F.col("n_contained").cast("double")
                    / F.col("n_child_distinct")
                ).alias("containment"),
                (F.col("n_contained") == F.col("n_child_distinct")).alias(
                    "is_inclusion"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# Candidate unique keys to probe: true PKs, decoys, and the classic
# TPC-H composite (l_orderkey, l_linenumber) — which the probe
# DISCOVERS to be non-unique in this fixture (linenumber is not
# per-order sequential here), exactly the surprise this tool exists
# to catch before someone merges on it.
_PK_CANDIDATES = [
    ("orders", ["o_orderkey"]),
    ("orders", ["o_custkey"]),  # decoy
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("lineitem", ["l_orderkey"]),  # decoy
    ("events", ["event_id"]),
    ("customer", ["c_custkey"]),
    ("part", ["p_brand", "p_type", "p_size"]),  # decoy
]


def _pk_oracle() -> str:
    parts = []
    for tbl, cols in _PK_CANDIDATES:
        collist = ", ".join(cols)
        parts.append(f"""
    SELECT '{tbl}' AS tbl, '{",".join(cols)}' AS key_cols,
           (SELECT CAST(count(*) AS BIGINT) FROM {tbl}) AS n_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM
               (SELECT DISTINCT {collist} FROM {tbl})) AS n_distinct,
           (SELECT CAST(count(*) AS BIGINT) FROM
               (SELECT DISTINCT {collist} FROM {tbl}))
             = (SELECT CAST(count(*) AS BIGINT) FROM {tbl}) AS is_unique_key
        """)
    return " UNION ALL ".join(parts)


@register("etl_pk_discovery", oracle=_pk_oracle())
def etl_pk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key / unique-key DISCOVERY: for each candidate column
    set, row count vs distinct-combination count — equality certifies
    a unique key (the profiling pass that finds merge keys and dedup
    grains before anyone declares them).

    Scale shape: each probe is one count plus one DISTINCT hash
    aggregate over only the candidate columns (column pruning keeps
    the scan narrow); a composite candidate shuffles its tuple —
    never a sort. One row per candidate."""
    out = None
    for tbl, cols in _PK_CANDIDATES:
        t = table(spark, sf_dir, tbl)
        # ONE scan per candidate (r13; was two — count + distinct):
        # group by the candidate tuple, then n_rows = Σ group counts
        # and n_distinct = group count.  Same shuffle the DISTINCT
        # already paid, exact NULL-combination semantics (groupBy
        # keeps null groups, unlike count_distinct), no second pass
        # over the fact table.
        g = (
            t.groupBy(*[F.col(c) for c in cols])
            .agg(F.count(F.lit(1)).alias("_c"))
            .agg(
                F.sum("_c").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
            )
        )
        row = g.select(
            F.lit(tbl).alias("tbl"),
            F.lit(",".join(cols)).alias("key_cols"),
            "n_rows",
            "n_distinct",
            (F.col("n_distinct") == F.col("n_rows")).alias("is_unique_key"),
        )
        out = row if out is None else out.unionByName(row)
    return out


_FRESH_TABLES = [
    ("orders", "o_orderdate"),
    ("lineitem", "l_shipdate"),
    ("events", "ts"),
]
_FRESH_EPOCH = "1970-01-01"


def _fresh_oracle() -> str:
    parts = []
    for tbl, col in _FRESH_TABLES:
        parts.append(f"""
    SELECT '{tbl}' AS tbl,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(min(d) AS BIGINT) AS first_day,
           CAST(max(d) AS BIGINT) AS last_day,
           CAST(max(d) - min(d) + 1 AS BIGINT) AS span_days,
           CAST(count(*) AS BIGINT) AS days_present,
           floor(CAST(count(*) AS DOUBLE) / (max(d) - min(d) + 1)
                 * 1e4 + 0.5) / 1e4 AS coverage,
           floor(CAST(sum(CASE WHEN d > max_d - (max_d - min_d + 1) // 10
                          THEN cnt ELSE 0 END) AS DOUBLE) / sum(cnt)
                 * 1e4 + 0.5) / 1e4 AS tail_share
    FROM (
        SELECT date_diff('day', DATE '{_FRESH_EPOCH}', CAST({col} AS DATE))
                   AS d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM {tbl} GROUP BY 1
    ) g CROSS JOIN (
        SELECT min(date_diff('day', DATE '{_FRESH_EPOCH}',
                   CAST({col} AS DATE))) AS min_d,
               max(date_diff('day', DATE '{_FRESH_EPOCH}',
                   CAST({col} AS DATE))) AS max_d
        FROM {tbl}
    ) s
        """)
    return " UNION ALL ".join(parts)


@register("etl_freshness_report", oracle=_fresh_oracle())
def etl_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-freshness / arrival-coverage report per time-keyed
    table: first/last day present (epoch days), calendar span, days
    actually present, coverage ratio, and the share of rows landing
    in the trailing 10% of the span — the table-health numbers an
    ingestion SLA dashboard reads (gappy coverage = missed loads;
    collapsed tail share = a stalled feed).

    Scale shape: ONE scan per table hash-aggregates to the bounded
    per-day grid; every derived number folds over that grid with a
    broadcast min/max row — fact rows are touched exactly once."""
    out = None
    for tbl, col in _FRESH_TABLES:
        t = table(spark, sf_dir, tbl)
        d = F.datediff(F.col(col).cast("date"), F.lit(_FRESH_EPOCH).cast("date"))
        grid = (
            t.select(d.cast("long").alias("d"))
            .groupBy("d")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        stats = grid.agg(
            F.min("d").alias("min_d"), F.max("d").alias("max_d")
        )
        cutoff = F.col("max_d") - F.floor(
            (F.col("max_d") - F.col("min_d") + 1) / 10
        ).cast("long")
        row = (
            grid.crossJoin(F.broadcast(stats))
            .agg(
                F.sum("cnt").cast("long").alias("n_rows"),
                F.min("d").cast("long").alias("first_day"),
                F.max("d").cast("long").alias("last_day"),
                (F.max("d") - F.min("d") + 1).cast("long").alias("span_days"),
                F.count(F.lit(1)).cast("long").alias("days_present"),
                F.sum(F.when(F.col("d") > cutoff, F.col("cnt")).otherwise(0))
                .cast("long")
                .alias("tail_rows"),
            )
            .select(
                F.lit(tbl).alias("tbl"),
                "n_rows",
                "first_day",
                "last_day",
                "span_days",
                "days_present",
                q4(
                    F.col("days_present").cast("double") / F.col("span_days")
                ).alias("coverage"),
                q4(F.col("tail_rows").cast("double") / F.col("n_rows")).alias(
                    "tail_share"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# Categorical columns to entropy-profile (bounded value domains).
_ENT_COLUMNS = [
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("customer", "c_mktsegment"),
    ("lineitem", "l_returnflag"),
    ("events", "event_type"),
    ("documents", "lang"),
]
_ENT_Q = 1_000_000_000


def _ent_oracle() -> str:
    parts = []
    for tbl, col in _ENT_COLUMNS:
        parts.append(f"""
    SELECT '{tbl}.{col}' AS tbl_col,
           CAST(sum(cnt) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_distinct,
           floor(CAST(sum(CAST(floor(
               (CAST(cnt AS DOUBLE) / tot)
               * (-log2(CAST(cnt AS DOUBLE) / tot))
               * {_ENT_Q} + 0.5) AS BIGINT)) AS DOUBLE)
               / {_ENT_Q} * 1e4 + 0.5) / 1e4 AS entropy_bits,
           floor(CAST(max(cnt) AS DOUBLE) / max(tot) * 1e4 + 0.5) / 1e4
               AS top_share
    FROM (
        SELECT {col} AS v, CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(count(*)) OVER () AS BIGINT) AS tot
        FROM {tbl} GROUP BY {col}
    )
        """)
    return " UNION ALL ".join(parts)


@register("etl_column_entropy", oracle=_ent_oracle())
def etl_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy profile of the categorical columns: bits of
    information per column, distinct count, and the top value's share
    — the balance numbers a data catalog shows next to NDV (entropy
    near log2(NDV) = balanced; entropy near 0 with high top_share =
    a near-constant column that should be a filter, not a feature).

    Scale shape: one hash aggregate per column to its bounded value
    grid; p*log(1/p) masses are x1e9-quantized per value before the
    fold, so every sum is an exact BIGINT; top_share is a MAX —
    order-free.  (A single-pass multi-column variant would scan once
    per table; profiled columns are listed explicitly to keep
    pushed-down scans one column wide.)"""
    out = None
    for tbl, col in _ENT_COLUMNS:
        t = table(spark, sf_dir, tbl)
        # bounded value grid, two consumers (totals + entropy fold) —
        # lazy checkpoint so each column's scan runs once
        grid = t.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        ).localCheckpoint(eager=False)
        tot = grid.agg(F.sum("cnt").cast("long").alias("tot"))
        hq = F.floor(
            (F.col("cnt").cast("double") / F.col("tot"))
            * (-F.log2(F.col("cnt").cast("double") / F.col("tot")))
            * _ENT_Q
            + 0.5
        ).cast("long")
        row = (
            grid.crossJoin(F.broadcast(tot))
            .agg(
                F.sum("cnt").cast("long").alias("n"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
                F.sum(hq).cast("long").alias("ent_q"),
                F.max("cnt").cast("long").alias("top_cnt"),
                F.max("tot").cast("long").alias("tot"),
            )
            .select(
                F.lit(f"{tbl}.{col}").alias("tbl_col"),
                "n",
                "n_distinct",
                q4(F.col("ent_q").cast("double") / _ENT_Q).alias("entropy_bits"),
                q4(F.col("top_cnt").cast("double") / F.col("tot")).alias(
                    "top_share"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


_TCLOSE_T = 0.2  # max allowed EMD (total variation) to the global dist
_TCLOSE_Q = 1_000_000_000


@register(
    "etl_t_closeness",
    oracle=f"""
    WITH base AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
        FROM customer
    ), cells AS (
        SELECT c_nationkey, c_mktsegment, band,
               CAST(count(*) AS BIGINT) AS n_gb
        FROM base GROUP BY 1, 2, 3
    ), groups AS (
        SELECT c_nationkey, c_mktsegment, CAST(sum(n_gb) AS BIGINT) AS n_g
        FROM cells GROUP BY 1, 2
    ), bands AS (
        SELECT band, CAST(sum(n_gb) AS BIGINT) AS n_b FROM cells GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(n_b) AS BIGINT) AS n_all,
               CAST(count(*) AS BIGINT) AS n_bands
        FROM bands
    ), dense AS (
        SELECT g.c_nationkey, g.c_mktsegment, g.n_g, b.band, b.n_b,
               coalesce(c.n_gb, 0) AS n_gb
        FROM groups g
        CROSS JOIN bands b
        LEFT JOIN cells c ON c.c_nationkey = g.c_nationkey
                         AND c.c_mktsegment = g.c_mktsegment
                         AND c.band = b.band
    ), tv AS (
        SELECT c_nationkey, c_mktsegment, n_g,
               CAST(sum(CAST(floor(abs(
                   CAST(n_gb AS DOUBLE) / n_g
                   - CAST(n_b AS DOUBLE) / n_all)
                   * {_TCLOSE_Q} + 0.5) AS BIGINT)) AS BIGINT) AS tvq
        FROM dense CROSS JOIN tot
        GROUP BY 1, 2, n_g
    )
    SELECT c_nationkey, c_mktsegment, n_g AS group_n,
           {sql_q4(f"0.5 * CAST(tvq AS DOUBLE) / {_TCLOSE_Q}")} AS t_dist,
           (0.5 * CAST(tvq AS DOUBLE) / {_TCLOSE_Q} <= {_TCLOSE_T})
               AS t_close
    FROM tv
    """,
)
def etl_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit over the (nation, segment) quasi-identifier
    groups: the total-variation distance (categorical earth-mover
    with unit ground distance) between each group's sensitive
    account-balance-band distribution and the global one — the third
    rung of the privacy ladder after k-anonymity (group sizes) and
    l-diversity (distinct sensitive values): a group can be large AND
    diverse yet still leak via a skewed distribution, which is what
    t-closeness catches (Li et al., public).

    Scale shape: one hash aggregate to (group x band) cells; the
    dense group-by-band grid is bounded (|QI groups| x |bands|) via a
    grid cross join, NOT a data cross join; per-band gaps are
    x1e9-quantized so each group's TV sum is an exact BIGINT."""
    c = table(spark, sf_dir, "customer")
    base = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("band"),
    )
    cells = base.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).cast("long").alias("n_gb")
    ).localCheckpoint(eager=False)
    groups = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n_gb").cast("long").alias("n_g")
    )
    bands = cells.groupBy("band").agg(F.sum("n_gb").cast("long").alias("n_b"))
    tot = bands.agg(F.sum("n_b").cast("long").alias("n_all"))
    dense = (
        groups.crossJoin(F.broadcast(bands))
        .join(cells, ["c_nationkey", "c_mktsegment", "band"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_g",
            "n_b",
            F.coalesce("n_gb", F.lit(0)).alias("n_gb"),
        )
    )
    gap_q = F.floor(
        F.abs(
            F.col("n_gb").cast("double") / F.col("n_g")
            - F.col("n_b").cast("double") / F.col("n_all")
        )
        * _TCLOSE_Q
        + 0.5
    ).cast("long")
    tv = (
        dense.crossJoin(F.broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment", "n_g")
        .agg(F.sum(gap_q).cast("long").alias("tvq"))
    )
    t_dist = F.lit(0.5) * F.col("tvq").cast("double") / _TCLOSE_Q
    return tv.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n_g").alias("group_n"),
        q4(t_dist).alias("t_dist"),
        (t_dist <= _TCLOSE_T).alias("t_close"),
    )


# ------------------------------ consistent-hash sharding (r8 wave AH)

# ring position = a 48-bit integer folded from the first 12 hex chars
# of an md5 digest — the same expression on both engines (neither
# shares a native hex->int across dialects, so the fold IS the spec)
_CH_NODES_BEFORE = 4
_CH_NODES_AFTER = 5
_CH_VNODES = 8


def _ring_fold_sql(arg: str) -> str:
    return (
        "list_aggregate([CAST(strpos('0123456789abcdef',"
        f" substring(md5({arg}), p, 1)) - 1 AS BIGINT)"
        " * CAST(power(16, 12 - p) AS BIGINT)"
        " for p in range(1, 13)], 'sum')"
    )


def _ring_fold_spark(arg: str) -> str:
    return (
        "aggregate(sequence(1, 12), 0L, (acc, p) -> acc +"
        f" CAST(instr('0123456789abcdef', substring(md5({arg}), p, 1)) - 1"
        " AS BIGINT) * CAST(power(16, 12 - p) AS BIGINT))"
    )


def _vnode_rows_sql(n_nodes: int) -> str:
    return (
        "SELECT n, v, "
        + _ring_fold_sql("'node' || CAST(n AS VARCHAR) || ':'"
                         " || CAST(v AS VARCHAR)")
        + f" AS pos FROM range(0, {n_nodes}) a(n),"
        f" range(0, {_CH_VNODES}) b(v)"
    )


@register(
    "etl_consistent_hash_shards",
    oracle=f"""
    WITH keys AS (
        SELECT doc_id, {_ring_fold_sql("'k:' || CAST(doc_id AS VARCHAR)")}
                   AS kpos
        FROM documents
    ), ring_before AS ({_vnode_rows_sql(_CH_NODES_BEFORE)}),
    ring_after AS ({_vnode_rows_sql(_CH_NODES_AFTER)}),
    asg_before AS (
        SELECT k.doc_id,
               coalesce(min_by(r.n, r.pos) FILTER (WHERE r.pos >= k.kpos),
                        (SELECT min_by(n, pos) FROM ring_before)) AS node
        FROM keys k, ring_before r GROUP BY k.doc_id, k.kpos
    ), asg_after AS (
        SELECT k.doc_id,
               coalesce(min_by(r.n, r.pos) FILTER (WHERE r.pos >= k.kpos),
                        (SELECT min_by(n, pos) FROM ring_after)) AS node
        FROM keys k, ring_after r GROUP BY k.doc_id, k.kpos
    )
    SELECT CAST(b.node AS BIGINT) AS node,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(count_if(a.node <> b.node) AS BIGINT) AS n_moved,
           {sql_q4("CAST(count_if(a.node <> b.node) AS DOUBLE) / count(*)")}
               AS moved_frac
    FROM asg_before b JOIN asg_after a ON a.doc_id = b.doc_id
    GROUP BY b.node
    """,
)
def etl_consistent_hash_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash shard assignment with virtual nodes, plus the
    resharding-movement audit: documents land on a 4-node x 8-vnode
    md5 ring (clockwise successor rule with wrap), then the ring
    grows to 5 nodes and the report counts, per original shard, how
    many keys MOVE — the property that makes consistent hashing the
    100 TB repartitioning strategy (expected movement ~ 1/(n+1) of
    keys, vs ~all keys under plain modulo).

    Ring positions are a 48-bit fold of the md5 hex prefix — the
    identical digit-by-digit expression on both engines, so the ring
    IS the cross-engine spec. Assignment is one broadcast nested-loop
    against the 32/40-row vnode table (min position >= key, wrap via
    the ring's global min — exact integer compares throughout).

    Scale shape: two broadcast fan-outs of ~40 rows per key, two
    hash aggregates back to |keys|, one 4-row report. No shuffle
    carries anything but doc_id and two small ints."""
    d = table(spark, sf_dir, "documents")
    keys = d.select(
        "doc_id",
        F.expr(
            _ring_fold_spark("concat('k:', CAST(doc_id AS STRING))")
        ).alias("kpos"),
    )

    def ring(n_nodes: int) -> DataFrame:
        return (
            spark.range(n_nodes)
            .select(F.col("id").alias("n"))
            .crossJoin(
                spark.range(_CH_VNODES).select(F.col("id").alias("v"))
            )
            .select(
                "n",
                F.expr(
                    _ring_fold_spark(
                        "concat('node', CAST(n AS STRING), ':',"
                        " CAST(v AS STRING))"
                    )
                ).alias("pos"),
            )
        )

    def assign(ring_df: DataFrame, alias: str) -> DataFrame:
        r = ring_df
        wrap = r.agg(F.min_by("n", "pos").alias("wrap_node"))
        j = keys.crossJoin(F.broadcast(r))
        per_key = j.groupBy("doc_id", "kpos").agg(
            F.min_by(
                "n", F.when(F.col("pos") >= F.col("kpos"), F.col("pos"))
            ).alias("succ")
        )
        return per_key.crossJoin(F.broadcast(wrap)).select(
            "doc_id",
            F.coalesce(F.col("succ"), F.col("wrap_node")).alias(alias),
        )

    before = assign(ring(_CH_NODES_BEFORE), "node_b")
    after = assign(ring(_CH_NODES_AFTER), "node_a")
    joined = before.join(after, "doc_id")
    return joined.groupBy(
        F.col("node_b").cast("long").alias("node")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.count_if(F.col("node_b") != F.col("node_a"))
        .cast("long")
        .alias("n_moved"),
        q4(
            F.count_if(F.col("node_b") != F.col("node_a")).cast("double")
            / F.count(F.lit(1))
        ).alias("moved_frac"),
    )


# ---------------------------- partition-spec planning (r8 wave AM)

_PSP_TARGET_ROWS = 25_000  # "healthy partition" floor for the audit


@register(
    "etl_partition_spec_planner",
    oracle=f"""
    WITH specs AS (
        SELECT unnest(['day', 'week', 'month']) AS spec
    ), bucketed AS (
        SELECT s.spec,
               CASE s.spec
                 WHEN 'day' THEN strftime(CAST(l_shipdate AS DATE),
                      '%Y-%m-%d')
                 WHEN 'week' THEN strftime(date_trunc('week',
                      CAST(l_shipdate AS DATE)), '%Y-%m-%d')
                 ELSE strftime(CAST(l_shipdate AS DATE), '%Y-%m')
               END AS bucket
        FROM lineitem, specs s
    ), parts AS (
        SELECT spec, bucket, CAST(count(*) AS BIGINT) AS n
        FROM bucketed GROUP BY spec, bucket
    )
    SELECT spec,
           CAST(count(*) AS BIGINT) AS n_partitions,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_rows,
           {sql_q4("CAST(sum(n) AS DOUBLE) / count(*)")} AS avg_rows,
           {sql_q4("CAST(max(n) AS DOUBLE) * count(*) / sum(n)")}
               AS skew_ratio,
           {sql_q4(f"CAST(count_if(n < {_PSP_TARGET_ROWS}) AS DOUBLE)"
                   f" / count(*)")} AS small_frac
    FROM parts GROUP BY spec
    """,
)
def etl_partition_spec_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec planning audit: bucket the fact table under
    three candidate calendar specs (day / ISO week / month) in ONE
    pass and report, per spec, the partition count, the max/avg row
    load, the skew ratio (max over mean — the straggler predictor),
    and the fraction of partitions under the healthy-size floor —
    the numbers that decide a 100 TB table's layout BEFORE an
    expensive rewrite (day gives pruning but small files; month
    gives fat scans; the report quantifies the trade).

    The spec axis is a compile-time 3-way fan-out (explode, not three
    jobs); buckets are pure calendar expressions, so the whole audit
    is one hash aggregate to |specs x buckets| rows plus a 3-row
    summary. Pairs with etl_compact_small_files (fixing the layout
    this report chooses).

    Scale shape: one fan-out fact pass, bounded calendar-grid
    aggregates."""
    li = table(spark, sf_dir, "lineitem")
    d = F.to_date("l_shipdate")
    bucketed = li.select(
        F.explode(F.lit(["day", "week", "month"])).alias("spec"), d.alias("d")
    ).select(
        "spec",
        F.when(F.col("spec") == "day", F.date_format("d", "yyyy-MM-dd"))
        .when(
            F.col("spec") == "week",
            F.date_format(F.date_trunc("week", "d"), "yyyy-MM-dd"),
        )
        .otherwise(F.date_format("d", "yyyy-MM"))
        .alias("bucket"),
    )
    parts = bucketed.groupBy("spec", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return parts.groupBy("spec").agg(
        F.count(F.lit(1)).cast("long").alias("n_partitions"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_rows"),
        q4(F.sum("n").cast("double") / F.count(F.lit(1))).alias("avg_rows"),
        q4(
            F.max("n").cast("double") * F.count(F.lit(1)) / F.sum("n")
        ).alias("skew_ratio"),
        q4(
            F.count_if(F.col("n") < _PSP_TARGET_ROWS).cast("double")
            / F.count(F.lit(1))
        ).alias("small_frac"),
    )


# ------------------------------------------------------------------
# Fellegi-Sunter record-linkage scoring (r10)

# Conditional agreement probabilities for each comparison field:
# m = P(agree | same entity), u = P(agree | different entities).
# Fixed literals (the error-rate priors a linkage run is configured
# with; estimating them by EM is a separate fitting step) shared by
# both engines so the log2 weights parse identically.
_FS_M_SEG, _FS_U_SEG = "0.95", "0.20"
_FS_M_BAL, _FS_U_BAL = "0.98", "0.05"
_FS_M_TAIL, _FS_U_TAIL = "0.92", "0.001"
_FS_MATCH_T = "8.0"  # total-weight thresholds: match / possible
_FS_POSSIBLE_T = "0.0"


@register(
    "etl_record_linkage_fs",
    oracle=f"""
    WITH a AS (
        SELECT c_custkey AS a_key, c_nationkey AS nk, c_mktsegment AS seg,
               c_acctbal AS bal, substr(c_name, -3) AS tail3
        FROM customer WHERE c_custkey % 2 = 0
    ), b AS (
        SELECT c_custkey AS b_key, c_nationkey AS nk, c_mktsegment AS seg,
               round(c_acctbal) AS bal, substr(c_name, -3) AS tail3
        FROM customer WHERE c_custkey % 3 = 0
    ), pairs AS (
        SELECT a.a_key, b.b_key,
               CAST(a.seg = b.seg AS BOOLEAN) AS agree_seg,
               CAST(abs(a.bal - b.bal) <= 0.5 AS BOOLEAN) AS agree_bal,
               CAST(a.tail3 = b.tail3 AS BOOLEAN) AS agree_tail
        FROM a JOIN b
          ON a.nk = b.nk AND floor(a.bal / 500) = floor(b.bal / 500)
    ), scored AS (
        SELECT a_key, b_key, agree_seg, agree_bal, agree_tail,
           (CASE WHEN agree_seg
                 THEN log2({_FS_M_SEG} / {_FS_U_SEG})
                 ELSE log2((1.0 - {_FS_M_SEG}) / (1.0 - {_FS_U_SEG})) END
          + CASE WHEN agree_bal
                 THEN log2({_FS_M_BAL} / {_FS_U_BAL})
                 ELSE log2((1.0 - {_FS_M_BAL}) / (1.0 - {_FS_U_BAL})) END
          + CASE WHEN agree_tail
                 THEN log2({_FS_M_TAIL} / {_FS_U_TAIL})
                 ELSE log2((1.0 - {_FS_M_TAIL}) / (1.0 - {_FS_U_TAIL})) END)
               AS weight
        FROM pairs
    )
    SELECT a_key, b_key, agree_seg, agree_bal, agree_tail,
           {sql_q4("weight")} AS fs_weight,
           CASE WHEN weight >= {_FS_MATCH_T} THEN 'match'
                ELSE 'possible' END AS fs_class
    FROM scored WHERE weight >= {_FS_POSSIBLE_T}
    """,
)
def etl_record_linkage_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter record-linkage scoring between two overlapping
    customer extracts (the 'CRM vs billing' dedup every master-data
    pipeline runs): side A = even custkeys with raw fields, side B =
    custkeys divisible by 3 with a coarsened balance (rounded to the
    dollar) — keys divisible by 6 are the true same-entity pairs.
    Candidate pairs come ONLY from blocking on (nation, balance/500
    bucket); each pair gets a field-agreement vector (market segment,
    balance within 0.5, last-3-name-chars) and the classic FS total
    weight Σ log2(m/u) on agree, Σ log2((1-m)/(1-u)) on disagree,
    thresholded into match / possible classes (non-matches dropped).

    Scale shape: the join key IS the blocking key, so candidate
    generation is an equi-join whose fan-out is the block size —
    never |A|×|B|; weights are one codegen'd expression per pair. At
    100 TB you tighten the blocking key (add phonetic name blocks,
    cf. fn_soundex) — the plan shape is unchanged."""
    c = table(spark, sf_dir, "customer")
    a = c.where(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_nationkey").alias("a_nk"),
        F.col("c_mktsegment").alias("a_seg"),
        F.col("c_acctbal").alias("a_bal"),
        F.substring("c_name", -3, 3).alias("a_tail3"),
    )
    b = c.where(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("b_key"),
        F.col("c_nationkey").alias("b_nk"),
        F.col("c_mktsegment").alias("b_seg"),
        F.round(F.col("c_acctbal")).alias("b_bal"),
        F.substring("c_name", -3, 3).alias("b_tail3"),
    )
    pairs = a.join(
        b,
        (F.col("a_nk") == F.col("b_nk"))
        & (F.floor(F.col("a_bal") / 500) == F.floor(F.col("b_bal") / 500)),
    ).select(
        "a_key",
        "b_key",
        (F.col("a_seg") == F.col("b_seg")).alias("agree_seg"),
        (F.abs(F.col("a_bal") - F.col("b_bal")) <= 0.5).alias("agree_bal"),
        (F.col("a_tail3") == F.col("b_tail3")).alias("agree_tail"),
    )

    def w(flag: str, m: str, u: str):
        mf, uf = float(m), float(u)
        return F.when(F.col(flag), F.lit(mf / uf)).otherwise(
            F.lit((1.0 - mf) / (1.0 - uf))
        )

    weight = (
        F.log2(w("agree_seg", _FS_M_SEG, _FS_U_SEG))
        + F.log2(w("agree_bal", _FS_M_BAL, _FS_U_BAL))
        + F.log2(w("agree_tail", _FS_M_TAIL, _FS_U_TAIL))
    )
    scored = pairs.withColumn("weight", weight)
    return scored.where(F.col("weight") >= float(_FS_POSSIBLE_T)).select(
        "a_key",
        "b_key",
        "agree_seg",
        "agree_bal",
        "agree_tail",
        q4(F.col("weight")).alias("fs_weight"),
        F.when(F.col("weight") >= float(_FS_MATCH_T), F.lit("match"))
        .otherwise(F.lit("possible"))
        .alias("fs_class"),
    )
