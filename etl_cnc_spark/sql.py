"""SQL entry point (SURVEY.md §3.2).

``run(spark, sf_dir, text)`` registers the ten fixture tables as temp
views (same names the DuckDB oracle uses) and executes arbitrary SQL
through the full Catalyst pipeline: parse → analyze → optimize →
physical plan → AQE. Exists because oracle-parity debugging is 10×
faster when the same SQL text can be pasted into both engines — and
because an engine with the reference's capabilities must accept SQL,
not only the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register_views


def run(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    """Execute ``text`` against the fixture tables as temp views."""
    register_views(spark, sf_dir)
    return spark.sql(text)


from .registry import register, track_sql_cached_table  # noqa: E402

# Shared-text keys: ONE dialect-neutral SQL string is BOTH the Spark
# query (via run()) and the DuckDB oracle — the strongest §3.2
# demonstration the harness allows: any divergence in parser,
# analyzer, or execution between the engines breaks the hash.

_SHARED_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS price_cents,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""

_SHARED_WINDOW = """
SELECT * FROM (
    SELECT c.c_mktsegment AS segment, o.o_orderkey,
           CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
           CAST(row_number() OVER (PARTITION BY c.c_mktsegment
                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS BIGINT) AS rn
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) ranked
WHERE rn <= 10
"""


@register("sql_entry_agg", oracle=_SHARED_AGG)
def sql_entry_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Q1-shape aggregate submitted as SQL TEXT through the §3.2
    entry point — the registered build and the DuckDB oracle are the
    IDENTICAL string, so the whole parse→analyze→optimize→execute
    pipeline is what's under test (the cents discipline keeps the
    shared text dialect-neutral and hash-exact)."""
    return run(spark, sf_dir, _SHARED_AGG)


@register("sql_entry_window", oracle=_SHARED_WINDOW)
def sql_entry_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + ranking window + derived-table filter as shared SQL
    text through the §3.2 entry point: exercises the analyzer's
    aliasing/scoping and window planning from the SQL side (the
    DataFrame twins are join_inner/topk_per_group). Same string,
    both engines, one hash."""
    return run(spark, sf_dir, _SHARED_WINDOW)


_SHARED_LATERAL = """
SELECT c.c_custkey, t.o_orderkey, t.total_cents
FROM customer c, LATERAL (
  SELECT o_orderkey,
         CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS total_cents
  FROM orders o WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
WHERE c.c_mktsegment = 'BUILDING'
"""


@register("sql_entry_lateral", oracle=_SHARED_LATERAL)
def sql_entry_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT
    (top-2 orders per building-segment customer) as shared SQL text:
    the §3.2 surface where the analyzer must decorrelate a
    limit-bearing subquery into a ranked window join — which is
    exactly how Catalyst plans it (DomainJoin → rank ≤ 2), so the
    scale shape is one shuffle on the correlation key, not a per-row
    re-execution. Same string runs on both engines; one hash.
    (join_lateral is the DataFrame-registered twin with repo-managed
    views; this key proves the identical TEXT parses and decorrelates
    on both engines — the strongest §3.2 form.)"""
    return run(spark, sf_dir, _SHARED_LATERAL)


_SHARED_RECURSIVE = """
WITH RECURSIVE walk(p, depth) AS (
  SELECT CAST(p_partkey AS BIGINT), CAST(0 AS BIGINT)
  FROM part WHERE p_partkey = 0
  UNION ALL
  SELECT CAST(c.p_partkey AS BIGINT), w.depth + 1
  FROM part c JOIN walk w
    ON CAST(floor((c.p_partkey - 1) / 2.0) AS BIGINT) = w.p
   AND c.p_partkey > 0
)
SELECT depth, CAST(count(*) AS BIGINT) AS n,
       CAST(min(p) AS BIGINT) AS min_key, CAST(max(p) AS BIGINT) AS max_key
FROM walk GROUP BY depth
"""


@register("sql_entry_recursive", oracle=_SHARED_RECURSIVE)
def sql_entry_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE as shared SQL text — a binary-heap-shaped part
    hierarchy (parent = (k−1) div 2, expressed dialect-neutrally via
    floor/2.0) walked from the root, aggregated per depth level.
    Spark 4 executes recursive CTEs natively (UnionLoop); DuckDB runs
    the identical string, so parser + fixpoint-execution parity is
    one hash. The recursion depth is log2(N) and each iteration is a
    join against the shrinking frontier — the same
    Pregel-as-iterated-joins scale shape graph_hierarchy_walk builds
    by hand with doubling, now through the SQL front door.
    Depth-grouped output keeps rows bounded at any table size."""
    return run(spark, sf_dir, _SHARED_RECURSIVE)


_SHARED_GROUP_BY_ALL = """
SELECT o_orderpriority, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS total_cents,
       CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS min_cents
FROM orders
GROUP BY ALL
"""


@register("sql_entry_group_by_all", oracle=_SHARED_GROUP_BY_ALL)
def sql_entry_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern GROUP BY ALL sugar (every non-aggregate select item
    becomes a grouping key) as shared SQL text — Spark 4 and DuckDB
    both implement the inference, and the shared-string discipline
    verifies the two analyzers infer the SAME key set: if either
    engine grouped differently the hash would break."""
    return run(spark, sf_dir, _SHARED_GROUP_BY_ALL)


# Pipe-syntax key: Spark 4's SQL pipe operators (|>) are a Spark-side
# dialect, so this key pairs the pipe query with a classically-written
# oracle computing the identical result — parser-surface coverage the
# shared-text keys cannot give.

_PIPE_SPARK = """
FROM orders
|> WHERE o_orderstatus = 'O'
|> EXTEND CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
|> AGGREGATE CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS open_cents
   GROUP BY o_orderpriority
|> WHERE n > 0
"""

_PIPE_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS open_cents
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
HAVING count(*) > 0
"""


@register("sql_entry_pipe", oracle=_PIPE_ORACLE)
def sql_entry_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 / GoogleSQL `|>` operators — FROM →
    WHERE → EXTEND → AGGREGATE ... GROUP BY → WHERE-over-aggregate):
    the linear query dialect, executed through the same Catalyst
    pipeline as classic SQL.  DuckDB has no pipe parser, so the
    oracle states the equivalent classic query — the hash proves the
    pipe front-end lowers to the same relational plan (filters
    pushed, one hash aggregate, integer-cent money discipline)."""
    return run(spark, sf_dir, _PIPE_SPARK)


# UNPIVOT key: Spark's SQL UNPIVOT clause vs a dialect-neutral oracle
# (DuckDB's UNPIVOT shape differs slightly, so the oracle restates the
# semantics with UNION ALL — same rows, classic relational form).

_UNPIVOT_SPARK = """
SELECT l_returnflag, metric, CAST(val AS BIGINT) AS val
FROM (
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS price_cents,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
)
UNPIVOT (val FOR metric IN (qty, price_cents, n_rows))
"""

_UNPIVOT_ORACLE = """
WITH agg AS (
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS price_cents,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'qty' AS metric, qty AS val FROM agg
UNION ALL
SELECT l_returnflag, 'price_cents', price_cents FROM agg
UNION ALL
SELECT l_returnflag, 'n_rows', n_rows FROM agg
"""


@register("sql_entry_unpivot", oracle=_UNPIVOT_ORACLE)
def sql_entry_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNPIVOT clause (wide → long melt in the parser, Spark
    3.4+): a per-flag metric table unpivots to (flag, metric, val)
    rows, verified against the classic UNION-ALL restatement —
    covers the SQL-surface counterpart of the DataFrame
    ``unpivot_melt`` key. All values are exact BIGINTs, so the melt
    is hash-identical however either engine orders it."""
    return run(spark, sf_dir, _UNPIVOT_SPARK)


# DISTRIBUTE BY / SORT BY: Spark's physical-layout SQL clauses — the
# parser surface for controlling partitioning (the thing you tune at
# 100 TB). Content is unchanged by layout, which is exactly what the
# oracle verifies.

_DISTRIBUTE_SPARK = """
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents
FROM orders
GROUP BY o_custkey
DISTRIBUTE BY o_custkey SORT BY o_custkey
"""

_DISTRIBUTE_ORACLE = """
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents
FROM orders
GROUP BY o_custkey
"""


@register("sql_entry_distribute_by", oracle=_DISTRIBUTE_ORACLE)
def sql_entry_distribute_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY ... SORT BY — Spark's SQL clauses for physical
    layout (hash-partition the output on a key, sort within each
    partition): the knob a 100 TB pipeline uses to co-locate a
    downstream join or pre-sort a write, expressed in the parser.
    Layout must not change CONTENT, which is what the plain-GROUP BY
    oracle verifies; the layout itself is asserted by the exchange
    the clause injects into the plan."""
    return run(spark, sf_dir, _DISTRIBUTE_SPARK)


# Parameterized SQL (Spark 3.4+ named parameter binding): the
# injection-safe templating surface — literals bind server-side, the
# query TEXT stays constant (one plan cache entry per template).

_PARAM_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice >= 50000.0
GROUP BY o_orderpriority
"""


@register("sql_entry_parameterized", oracle=_PARAM_ORACLE)
def sql_entry_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL binding (``spark.sql(text, args={...})``,
    Spark 3.4+): the status and price floor bind as :status /
    :min_total parameters instead of interpolated literals — the
    injection-safe, plan-cache-friendly way applications template
    queries. The oracle runs the equivalent literal query, verifying
    the binder substitutes values (not strings) with correct
    typing."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice >= :min_total
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "min_total": 50000.0},
    )


@register("sql_entry_cache_table", oracle=_PARAM_ORACLE)
def sql_entry_cache_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CACHE TABLE — the SQL surface for pinning a hot dataset in the
    columnar in-memory store (the interactive-dashboard pattern:
    cache once, slice many): a filtered orders view is CACHEd, the
    rollup reads through the InMemoryRelation (asserted in
    tests/test_r7_wave_w.py), and UNCACHE restores state so the
    shared session never leaks storage. Content must equal the
    uncached oracle — caching is a performance decision, never a
    semantics change."""
    register_views(spark, sf_dir)
    spark.sql("UNCACHE TABLE IF EXISTS etlcnc_hot_orders")
    # CACHE TABLE ... AS creates a temp view; a rebuild in the same
    # session must drop the previous one (UNCACHE alone does not)
    spark.sql("DROP VIEW IF EXISTS etlcnc_hot_orders")
    spark.sql(
        """
        CACHE TABLE etlcnc_hot_orders AS
        SELECT * FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice >= 50000.0
        """
    )
    # SQL-surface caching bypasses the DataFrame persist interception;
    # register the table so the scoped release can UNCACHE it at the
    # next top-level key (registry ADVICE-r14 lifecycle)
    track_sql_cached_table("etlcnc_hot_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM etlcnc_hot_orders
        GROUP BY o_orderpriority
        """
    )


# Aggregate FILTER clause (SQL:2003): per-aggregate predicates without
# CASE gymnastics — shared dialect-neutral text runs on both engines.

_FILTER_CLAUSE = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_all,
       CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            FILTER (WHERE l_discount = 0.0) AS BIGINT)
           AS full_price_cents,
       CAST(count(*) FILTER (WHERE l_returnflag = 'R'
            AND l_quantity <= 5) AS BIGINT) AS n_small_returns
FROM lineitem
GROUP BY l_returnflag
"""


@register("sql_entry_filter_clause", oracle=_FILTER_CLAUSE)
def sql_entry_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER (WHERE ...) clause — per-aggregate predicates
    in one pass over the data (the readable alternative to
    sum(CASE WHEN ...) pivot idioms, and the same single-scan
    multi-metric shape scan_observe exploits): one dialect-neutral
    SQL string executes on BOTH engines, so the two parsers must
    agree on the clause's semantics including FILTERed sums over
    empty groups (NULL, not 0)."""
    return run(spark, sf_dir, _FILTER_CLAUSE)


# Lateral column aliases: a select item referencing an alias defined
# earlier in the SAME select list — Spark 4 and DuckDB both implement
# the rewrite, so the shared text verifies they chain identically.
_LATERAL_ALIAS = """
SELECT l_returnflag,
       CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))
            AS BIGINT) AS gross_cents,
       gross_cents - CAST(sum(CAST(floor(l_extendedprice * l_discount
            * 100 + 0.5) AS BIGINT)) AS BIGINT) AS net_cents,
       CAST(floor(net_cents / 100.0 * 1e4 + 0.5) / 1e4 AS DOUBLE) AS net
FROM lineitem
GROUP BY l_returnflag
"""


@register("sql_entry_lateral_alias", oracle=_LATERAL_ALIAS)
def sql_entry_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (a select item referencing an alias
    defined earlier in the same SELECT list, chained two deep:
    gross_cents -> net_cents -> net) as shared SQL text — the
    modern-warehouse sugar that saves nested subqueries; both
    analyzers must expand the chain to the identical expression tree
    or the hash breaks."""
    return run(spark, sf_dir, _LATERAL_ALIAS)


# Correlated EXISTS / NOT EXISTS subqueries: the classic relational
# existence test, shared dialect-neutral text on both engines.
_EXISTS = """
SELECT s.s_nationkey AS nationkey,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(count(*) FILTER (WHERE EXISTS (
           SELECT 1 FROM lineitem l
           WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
       )) AS BIGINT) AS n_with_bulk_line,
       CAST(count(*) FILTER (WHERE NOT EXISTS (
           SELECT 1 FROM lineitem l
           WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R'
       )) AS BIGINT) AS n_never_returned
FROM supplier s
GROUP BY s.s_nationkey
"""


@register("sql_entry_exists", oracle=_EXISTS)
def sql_entry_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS and NOT EXISTS subqueries inside aggregate
    FILTER clauses, as ONE shared SQL text: both planners must
    decorrelate the subqueries into semi/anti joins (Catalyst's
    RewritePredicateSubquery; DuckDB's subquery flattening) and agree
    on the per-supplier existence semantics. The NOT EXISTS branch is
    the null-safe anti-join every data-quality orphan check relies
    on (cf. etl_fk_integrity).

    Scale shape: two semi/anti joins on the supplier key, then one
    bounded aggregate to |nations| rows — no correlated per-row
    execution survives planning on either engine."""
    return run(spark, sf_dir, _EXISTS)


# Inline VALUES table: literal dimension data joined against facts —
# the quick-lookup idiom every ad-hoc analysis uses; shared text.
_VALUES_JOIN = """
SELECT t.tier, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents
FROM orders o
JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
             ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
             ('5-LOW', 'cold')) AS t(priority, tier)
  ON o.o_orderpriority = t.priority
GROUP BY t.tier
"""


@register("sql_entry_values", oracle=_VALUES_JOIN)
def sql_entry_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES table as a join dimension, in ONE shared SQL
    text: both parsers must bind the aliased anonymous rowset
    (t(priority, tier)) and plan the 5-row literal side as the build
    input — Catalyst folds it to a LocalRelation and broadcasts,
    which is exactly the right 100 TB plan for a literal lookup (no
    scan, no shuffle on the dim side).

    Scale shape: broadcast hash join of a 5-row literal against the
    fact scan, one bounded aggregate."""
    return run(spark, sf_dir, _VALUES_JOIN)


# LIMIT/OFFSET pagination: the second page of a stable ranking —
# shared text, deterministic total order (balance DESC, key ASC).
_OFFSET_PAGE = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
FROM customer
ORDER BY bal_cents DESC, c_custkey
LIMIT 10 OFFSET 10
"""


@register("sql_entry_offset", oracle=_OFFSET_PAGE)
def sql_entry_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT ... OFFSET pagination over a deterministic total order
    (balance DESC with key tie-break), as ONE shared SQL text —
    OFFSET landed in Spark 3.4, so both planners run the identical
    page-2 query. Catalyst plans the pair as a single
    TakeOrderedAndProject (a global top-(limit+offset) then a local
    drop — never a full sort), which is the only acceptable
    pagination plan at 100 TB: cost grows with offset+limit, not
    with the table.

    Scale shape: one pushed-down scan of three columns, one
    take-ordered top-20, 10 output rows."""
    return run(spark, sf_dir, _OFFSET_PAGE)


# Named WINDOW clause: one definition, several consumers — shared text.
_NAMED_WINDOW = """
SELECT o_orderpriority,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            OVER wf AS BIGINT) AS running_cents,
       CAST(lag(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            OVER w AS BIGINT) AS prev_cents
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY floor(o_totalprice * 100 + 0.5) DESC, o_orderkey),
       wf AS (PARTITION BY o_orderpriority
              ORDER BY floor(o_totalprice * 100 + 0.5) DESC, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
QUALIFY rn <= 3
"""
# Spark has no QUALIFY: express the same query with a subquery filter.
_NAMED_WINDOW_SPARK = """
SELECT * FROM (
    SELECT o_orderpriority,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER wf AS BIGINT) AS running_cents,
           CAST(lag(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER w AS BIGINT) AS prev_cents
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY floor(o_totalprice * 100 + 0.5) DESC, o_orderkey),
           wf AS (PARTITION BY o_orderpriority
                  ORDER BY floor(o_totalprice * 100 + 0.5) DESC, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
WHERE rn <= 3
"""


@register("sql_entry_named_window", oracle=_NAMED_WINDOW)
def sql_entry_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause — define the partition/order spec once and
    consume it from three window functions (row_number, a framed
    running sum, lag): the maintainability idiom for multi-metric
    window queries, and a planner test that both engines merge the
    consumers into ONE window operator over one sort (Catalyst's
    window-group coalescing) instead of three. The oracle filters the
    top-3 with QUALIFY; Spark (no QUALIFY) uses the equivalent
    subquery — same named-window text otherwise, same result.

    Scale shape: one scan, ONE partitioned sort serving all three
    functions, top-3 per priority output."""
    return run(spark, sf_dir, _NAMED_WINDOW_SPARK)
