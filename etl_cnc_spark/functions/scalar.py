"""Scalar function library (SURVEY.md §2.8).

One umbrella query per family over a deterministic key-bounded
sample, so a single oracle hash covers the whole family. All
expressions are JVM-side builtins (whole-stage codegen — no Python
boundary anywhere in this module).

Dialect traps handled (probed against DuckDB 1.0.0):
- double→int: Spark CAST truncates, DuckDB CAST rounds → oracle uses
  CAST(trunc(x) AS ...).
- regexp_replace: Spark is global by default, DuckDB needs 'g'.
- ceil/floor return BIGINT in Spark, DOUBLE in DuckDB → cast oracle.
- transcendentals (ln/log10/pow): libm last-ulp differences → q4.
- initcap / schema_of_json: no DuckDB equivalent → omitted.
- string_agg over an EMPTY list: DuckDB yields NULL, Spark
  array_join yields '' → COALESCE(…, '') on the oracle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import register
from ..utils import q4, sql_q4


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           concat_ws('-', p_brand, p_type) AS brand_type,
           upper(p_name) AS up_name,
           lower(p_brand) AS low_brand,
           substring(p_name, 2, 3) AS sub_name,
           CAST(length(p_name) AS BIGINT) AS name_len,
           trim(concat(' ', p_name, ' ')) AS trimmed,
           replace(p_name, ' ', '_') AS underscored,
           lpad(p_brand, 10, '*') AS lpadded,
           rpad(p_brand, 10, '*') AS rpadded,
           string_split(p_name, ' ')[1] AS first_word,
           reverse(p_name) AS rev_name,
           CAST(instr(p_name, 'a') AS BIGINT) AS a_pos,
           translate(p_name, 'aeiou', 'AEIOU') AS upvowels,
           CAST(levenshtein(p_name, p_brand) AS BIGINT) AS lev,
           CAST(ascii(substring(p_name, 1, 1)) AS BIGINT) AS first_ascii
    FROM part WHERE p_partkey < 300
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: concat/case/substring/trim/replace/pad/split/
    reverse/instr/translate/levenshtein/ascii."""
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.substring("p_name", 2, 3).alias("sub_name"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.expr("replace(p_name, ' ', '_')").alias("underscored"),
        F.lpad("p_brand", 10, "*").alias("lpadded"),
        F.rpad("p_brand", 10, "*").alias("rpadded"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.reverse("p_name").alias("rev_name"),
        F.instr("p_name", "a").cast("long").alias("a_pos"),
        F.translate("p_name", "aeiou", "AEIOU").alias("upvowels"),
        F.levenshtein("p_name", "p_brand").cast("long").alias("lev"),
        F.ascii(F.substring("p_name", 1, 1)).cast("long").alias("first_ascii"),
    )


@register(
    "fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '(\\w+)$', 1) AS last_word,
           regexp_matches(p_name, 'widget') AS has_widget,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels
    FROM part WHERE p_partkey < 300
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: extract (group), rlike, global replace. Patterns
    kept dialect-neutral (Java regex vs RE2 both accept these)."""
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        F.col("p_name").rlike("widget").alias("has_widget"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
    )


@register(
    "fn_datetime",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS mo,
           CAST(day(ts) AS BIGINT) AS d,
           CAST(hour(ts) AS BIGINT) AS h,
           CAST(minute(ts) AS BIGINT) AS mi,
           epoch_us(date_trunc('month', ts)) AS month_start_us,
           epoch_us(date_trunc('hour', ts)) AS hour_start_us,
           epoch_us(ts + INTERVAL 7 DAY) AS plus7d_us,
           CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS days_since,
           strftime(ts, '%Y-%m-%d') AS day_str,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_sec,
           epoch_us(CAST(make_date(2024, 3, 15) AS TIMESTAMP)) AS const_date_us
    FROM events WHERE event_id < 2000
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family over the µs-precision event stream: extract
    fields, truncate, interval arithmetic, day diff, format, epoch,
    make_date. All timestamp outputs are epoch-µs longs (engine-
    neutral encoding — SURVEY §5 float/ts discipline)."""
    e = table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("mo"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.minute("ts").cast("long").alias("mi"),
        F.unix_micros(F.date_trunc("month", "ts")).alias("month_start_us"),
        F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_start_us"),
        F.unix_micros(F.col("ts") + F.expr("INTERVAL 7 DAYS")).alias("plus7d_us"),
        F.datediff("ts", F.lit("2024-01-01").cast("timestamp")).cast("long").alias(
            "days_since"
        ),
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        F.unix_timestamp("ts").alias("unix_sec"),
        F.unix_micros(F.make_date(F.lit(2024), F.lit(3), F.lit(15)).cast("timestamp")).alias(
            "const_date_us"
        ),
    )


@register(
    "fn_math",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25) AS abs_dev,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           {sql_q4("sqrt(l_extendedprice)")} AS price_sqrt,
           {sql_q4("pow(1 + l_discount, 2)")} AS disc_sq,
           {sql_q4("ln(l_extendedprice)")} AS price_ln,
           {sql_q4("log10(l_extendedprice)")} AS price_log10,
           CAST(((CAST(l_partkey - 1000 AS INT) % 7) + 7) % 7 AS INT) AS pm,
           CAST(sign(l_quantity - 25) AS BIGINT) AS qty_sign
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. pmod is Spark's positive-mod — the oracle spells
    out ((x % n)+n)%n since DuckDB's % keeps the dividend sign."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("abs_dev"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        q4(F.sqrt("l_extendedprice")).alias("price_sqrt"),
        q4(F.pow(1 + F.col("l_discount"), 2)).alias("disc_sq"),
        q4(F.log(F.col("l_extendedprice"))).alias("price_ln"),
        q4(F.log10("l_extendedprice")).alias("price_log10"),
        F.pmod((F.col("l_partkey") - 1000).cast("int"), F.lit(7)).cast("int").alias("pm"),
        F.signum(F.col("l_quantity") - 25).cast("long").alias("qty_sign"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_bucket,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(c_acctbal, 1000.0) AS bal_cap1k,
           CASE WHEN c_nationkey < 12 THEN 'west' ELSE 'east' END AS hemisphere
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / greatest / least / if."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_bucket"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_cap1k"),
        F.expr("if(c_nationkey < 12, 'west', 'east')").alias("hemisphere"),
    )


@register(
    "fn_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(o_orderkey AS DOUBLE) AS key_dbl,
           TRY_CAST(o_orderpriority AS INT) AS prio_int_null,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_int,
           epoch_us(CAST('2024-03-05 06:30:00' AS TIMESTAMP)) AS const_ts_us
    FROM orders WHERE o_orderkey < 2000
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts incl. try_cast. Note: Spark's double→int CAST truncates;
    DuckDB's rounds, so the oracle truncates explicitly."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("long").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("prio_int_null"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias("prio_int"),
        F.unix_micros(F.lit("2024-03-05 06:30:00").cast("timestamp")).alias("const_ts_us"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hashes (lowercase hex in both engines)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@register(
    "fn_hash_native",
    notes="xxhash64 and monotonically_increasing_id are Spark-native "
    "(no DuckDB twin) → rows-only; tests assert mono-id uniqueness.",
)
def fn_hash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native hashing: xxhash64 (the engine's shuffle/bucket
    hash) and monotonically_increasing_id (partition-encoded ids)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.xxhash64("text").alias("text_xxh64"),
        F.monotonically_increasing_id().alias("mono_id"),
    )


@register(
    "fn_array",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           embedding[1] AS first_elem,
           {sql_q4("list_aggregate(list_transform(embedding,"
                   " x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')")} AS norm2,
           {sql_q4("list_aggregate(list_transform(embedding[1:8],"
                   " x -> CAST(x AS DOUBLE)), 'sum')")} AS head_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           list_max(embedding) AS max_elem
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family via higher-order functions: size/element_at/
    slice/aggregate(fold)/filter/max — all JVM-side, no UDF."""
    e = table(spark, sf_dir, "embeddings")
    sq = lambda acc, x: acc + x.cast("double") * x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        q4(F.aggregate("embedding", F.lit(0.0), sq)).alias("norm2"),
        q4(
            F.aggregate(
                F.slice("embedding", 1, 8), F.lit(0.0), lambda acc, x: acc + x.cast("double")
            )
        ).alias("head_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
        F.array_max("embedding").alias("max_elem"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT doc_id, lang AS lang_val, source AS source_val,
           'lang,source' AS keys_joined, CAST(2 AS BIGINT) AS map_size
    FROM documents
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: build a map, extract by key, list keys, size.
    The oracle checks the *round-trip identity* (DuckDB's MAP
    extraction returns lists — not oracle-comparable directly)."""
    d = table(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_val"),
        F.element_at(m, "source").alias("source_val"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_joined"),
        F.size(m).cast("long").alias("map_size"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CAST(length(props) AS BIGINT) AS props_len
    FROM events WHERE event_id < 2000
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: path extraction (lazy, schema-on-demand) and
    schema-full parsing via from_json (SURVEY §1.2 semi-structured
    escape hatch)."""
    e = table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.length("props").cast("long").alias("props_len"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_linenumber & 3 AS BIGINT) AS band,
           CAST(l_linenumber | 8 AS BIGINT) AS bor,
           CAST(xor(l_linenumber, 5) AS BIGINT) AS bxor,
           CAST(l_linenumber << 2 AS BIGINT) AS shl,
           CAST(l_linenumber >> 1 AS BIGINT) AS shr,
           CAST(bit_count(CAST(l_orderkey AS BIGINT)) AS BIGINT) AS popcnt,
           CAST(~l_linenumber AS BIGINT) AS bnot
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: AND/OR/XOR/NOT, shifts, popcount — all JVM
    built-ins inside codegen."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    ln = F.col("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ln.bitwiseAND(F.lit(3)).cast("long").alias("band"),
        ln.bitwiseOR(F.lit(8)).cast("long").alias("bor"),
        ln.bitwiseXOR(F.lit(5)).cast("long").alias("bxor"),
        F.shiftleft(ln, 2).cast("long").alias("shl"),
        F.shiftright(ln, 1).cast("long").alias("shr"),
        F.bit_count(F.col("l_orderkey").cast("long")).cast("long").alias("popcnt"),
        F.bitwise_not(ln).cast("long").alias("bnot"),
    )


@register(
    "fn_strdist",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_brand, p_type) AS BIGINT) AS d_brand_type,
           CAST(levenshtein(p_name, 'standard burnished brass') AS BIGINT) AS d_name_probe
    FROM part WHERE p_partkey < 400
    """,
)
def fn_strdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-distance family: Levenshtein edit distance (fuzzy-match
    building block for ETL reconciliation). O(m*n) per pair but pure
    per-row compute — scales linearly, no shuffle."""
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") < 400)
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", "p_type").cast("long").alias("d_brand_type"),
        F.levenshtein(F.col("p_name"), F.lit("standard burnished brass"))
        .cast("long")
        .alias("d_name_probe"),
    )


@register(
    "fn_sequence",
    oracle="""
    SELECT o_orderkey,
           CAST(unnest(generate_series(1, 1 + o_orderkey % 4)) AS BIGINT) AS n
    FROM orders WHERE o_orderkey < 500
    """,
)
def fn_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence generation + lateral explode: per-row generate_series
    — the row-multiplying generator pattern (date spines, retry
    schedules). Explode is local (no shuffle)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    seq = F.sequence(F.lit(1), (F.lit(1) + F.col("o_orderkey") % 4).cast("int"))
    return o.select("o_orderkey", F.explode(seq).alias("n0")).select(
        "o_orderkey", F.col("n0").cast("long").alias("n")
    )


@register(
    "fn_trig",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_q4("sin(l_quantity)")} AS sin_q,
           {sql_q4("cos(l_quantity)")} AS cos_q,
           {sql_q4("atan2(l_discount, l_tax + 0.01)")} AS atan2_dt,
           {sql_q4("exp(l_discount)")} AS exp_d,
           {sql_q4("degrees(l_tax)")} AS deg_t,
           {sql_q4("radians(l_quantity)")} AS rad_q
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendental family: sin/cos/atan2/exp/degrees/radians,
    quantized to 4dp (JVM StrictMath vs libm may differ in the last
    ulp; q4 absorbs it)."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        q4(F.sin("l_quantity")).alias("sin_q"),
        q4(F.cos("l_quantity")).alias("cos_q"),
        q4(F.atan2(F.col("l_discount"), F.col("l_tax") + 0.01)).alias("atan2_dt"),
        q4(F.exp("l_discount")).alias("exp_d"),
        q4(F.degrees("l_tax")).alias("deg_t"),
        q4(F.radians("l_quantity")).alias("rad_q"),
    )


@register(
    "fn_url",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || lang
                 || '?id=' || CAST(doc_id AS VARCHAR) AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query
    FROM u
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family: parse_url HOST/PATH/QUERY over synthesized URLs
    (web-corpus pipelines live on these). The oracle re-derives the
    parts with trivial regexes, so both engines must agree on the
    full parse."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("?id="),
        F.col("doc_id").cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT n_nationkey,
           n_name AS s_name,
           CAST(n_regionkey AS BIGINT) AS s_region,
           to_json(struct_pack(k := n_nationkey, nm := n_name)) AS s_json,
           to_json(struct_pack(outer_key := n_nationkey,
                               inner := struct_pack(r := n_regionkey, nm := n_name)))
               AS nested_json
    FROM nation
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family (§1.2 nested types): build named structs, access
    fields, nest structs, serialize to JSON — both engines emit the
    same compact JSON encoding, so the round-trip is hash-verified."""
    n = table(spark, sf_dir, "nation")
    s = F.struct(F.col("n_nationkey").alias("k"), F.col("n_name").alias("nm"))
    nested = F.struct(
        F.col("n_nationkey").alias("outer_key"),
        F.struct(F.col("n_regionkey").alias("r"), F.col("n_name").alias("nm")).alias(
            "inner"
        ),
    )
    return n.select(
        "n_nationkey",
        s.getField("nm").alias("s_name"),
        nested.getField("inner").getField("r").cast("long").alias("s_region"),
        F.to_json(s).alias("s_json"),
        F.to_json(nested).alias("nested_json"),
    )


@register(
    "fn_posexplode",
    oracle="""
    SELECT doc_id,
           unnest([{'pos': i-1, 'word': w[i]}
                   for i in range(1, len(w)+1)], recursive := true)
    FROM (SELECT doc_id, string_split(text, ' ') AS w
          FROM documents WHERE doc_id < 100)
    """,
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode: (position, element) rows from an array —
    the ordinality-preserving lateral view. Row-local expansion, no
    shuffle."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "word")


@register(
    "fn_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE CAST(l_quantity AS DOUBLE)/(l_linenumber - 1) END AS qty_per,
           CASE WHEN l_quantity = 0 THEN NULL
                ELSE CAST(l_extendedprice AS DOUBLE)/l_quantity END AS unit_price
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: try_divide returns NULL instead of
    raising/infinity on zero denominators — the ANSI-safe path for
    dirty data (the oracle spells out the equivalent CASE guard)."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_quantity").cast("double"), F.col("l_linenumber") - 1).alias(
            "qty_per"
        ),
        F.try_divide(F.col("l_extendedprice").cast("double"), F.col("l_quantity")).alias(
            "unit_price"
        ),
    )


@register(
    "fn_datetime2",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           epoch_us(CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)) AS eom_us,
           epoch_us(o_orderdate + INTERVAL 3 MONTH) AS plus3m_us
    FROM orders WHERE o_orderkey < 2000
    """,
)
def fn_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar family: quarter, ISO weekday/week, day-of-year,
    month-end, month arithmetic (both engines clamp month-end the
    same way). ISO weekday = Spark weekday(Monday=0) + 1."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("long").alias("q"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("iso_dow"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.unix_micros(F.last_day("o_orderdate").cast("timestamp")).alias("eom_us"),
        F.unix_micros(F.add_months("o_orderdate", 3).cast("timestamp")).alias(
            "plus3m_us"
        ),
    )


@register(
    "fn_hex",
    oracle="""
    SELECT p_partkey,
           hex(p_partkey) AS key_hex,
           hex(p_brand) AS brand_hex,
           lower(hex(p_brand)) AS brand_hex_lc,
           decode(unhex(hex(p_brand))) AS brand_roundtrip
    FROM part WHERE p_partkey < 300
    """,
)
def fn_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex/binary conversions: int→hex, string-bytes→hex, and the
    unhex round trip back to text (binary plumbing both engines
    agree on byte-for-byte)."""
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.hex("p_partkey").alias("key_hex"),
        F.hex("p_brand").alias("brand_hex"),
        F.lower(F.hex("p_brand")).alias("brand_hex_lc"),
        F.decode(F.unhex(F.hex("p_brand")), "utf-8").alias("brand_roundtrip"),
    )


@register(
    "fn_timezone",
    oracle="""
    SELECT event_id,
           epoch_us(timezone('America/New_York', ts)) AS ny_wall_as_utc_us,
           epoch_us(timezone('Asia/Tokyo', ts)) AS tokyo_wall_as_utc_us
    FROM events WHERE event_id < 2000
    """,
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion: interpret the naive event time as a wall
    time in a named zone and convert to UTC instants (the ingest-
    normalization step for multi-region logs). Both engines resolve
    zone rules from the same IANA database."""
    e = table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    # convert_timezone yields TIMESTAMP_NTZ (a UTC wall time); the cast
    # to TIMESTAMP under the UTC session reads it as the same instant.
    ny = F.convert_timezone(F.lit("America/New_York"), F.lit("UTC"), F.col("ts"))
    tk = F.convert_timezone(F.lit("Asia/Tokyo"), F.lit("UTC"), F.col("ts"))
    return e.select(
        "event_id",
        F.unix_micros(ny.cast("timestamp")).alias("ny_wall_as_utc_us"),
        F.unix_micros(tk.cast("timestamp")).alias("tokyo_wall_as_utc_us"),
    )


@register(
    "fn_array_setops",
    oracle="""
    WITH arrs AS (
      SELECT doc_id,
             string_split(text, ' ')[1:6] AS a,
             string_split(text, ' ')[4:9] AS b
      FROM documents
    )
    SELECT doc_id,
           COALESCE(list_aggregate(list_sort(list_intersect(a, b)),
                    'string_agg', ','), '') AS inter_csv,
           COALESCE(list_aggregate(list_sort(list_distinct(list_concat(a, b))),
                    'string_agg', ','), '') AS union_csv,
           COALESCE(list_aggregate(list_sort(list_distinct(
               list_filter(a, x -> NOT list_contains(b, x)))),
                    'string_agg', ','), '') AS except_csv,
           COALESCE(list_aggregate(flatten([a, b]), 'string_agg', ','), '')
               AS flat_csv,
           CAST(len(list_distinct(list_concat(a, b))) AS BIGINT) AS n_union
    FROM arrs
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations: intersect, union-distinct, except,
    flatten, distinct-count — element order is engine-unspecified, so
    every set result is sorted and joined before hashing. Row-local
    array work inside codegen."""
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    arrs = d.select(
        "doc_id",
        F.slice(words, 1, 6).alias("a"),
        F.slice(words, 4, 6).alias("b"),
    )
    return arrs.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect("a", "b")), ",").alias("inter_csv"),
        F.array_join(F.array_sort(F.array_distinct(F.concat("a", "b"))), ",").alias(
            "union_csv"
        ),
        F.array_join(F.array_sort(F.array_except("a", "b")), ",").alias("except_csv"),
        F.array_join(F.flatten(F.array("a", "b")), ",").alias("flat_csv"),
        F.size(F.array_distinct(F.concat("a", "b"))).cast("long").alias("n_union"),
    )


@register(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           CAST(json_extract_string(props, '$.missing') AS BIGINT)
               AS absent
    FROM events WHERE event_id < 2000
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: `parse_json` → open-schema binary-JSON
    storage, `variant_get` with typed paths, `try_variant_get` for
    absent fields. VARIANT is the Spark-4-native answer to schemaless
    columns — unlike `get_json_object` (re-parses the string per
    expression) the document parses ONCE into a binary form that all
    downstream path extractions share, the right trade at 100 TB of
    telemetry. Missing paths surface as NULL via the try_ variant,
    mirroring json_extract's NULL."""
    e = table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    v = e.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.variant_get("v", "$.k", "bigint").alias("k_int"),
        F.variant_get("v", "$.k", "string").alias("k_str"),
        (F.variant_get("v", "$.k", "bigint") % 10).alias("k_mod"),
        F.try_variant_get("v", "$.missing", "bigint").alias("absent"),
    )


@register(
    "fn_format",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 12, '0') AS padded,
           rpad(p_brand, 12, '.') AS brand_pad,
           translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
           repeat('-', CAST(p_partkey % 5 AS INT)) AS dashes,
           printf('%s-%05d', p_brand, p_partkey % 100000) AS tagged,
           reverse(p_name) AS rev_name
    FROM part WHERE p_partkey < 500
    """,
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting family: lpad/rpad/translate/repeat/
    format_string (C-style printf — identical format-spec semantics
    in DuckDB's printf)/reverse. All codegen'd JVM expressions —
    formatting belongs in the engine, not a Python UDF."""
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 12, "0").alias("padded"),
        F.rpad("p_brand", 12, ".").alias("brand_pad"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_tr"),
        F.repeat(F.lit("-"), (F.col("p_partkey") % 5).cast("int")).alias(
            "dashes"
        ),
        F.format_string(
            "%s-%05d", F.col("p_brand"), F.col("p_partkey") % 100000
        ).alias("tagged"),
        F.reverse("p_name").alias("rev_name"),
    )


@register(
    "fn_mask_builtin",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
               c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
               '[0-9]', 'n', 'g') AS masked_default,
           regexp_replace(c_name, '[0-9]', '*', 'g') AS masked_digits
    FROM customer WHERE c_custkey < 300
    """,
)
def fn_mask_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builtin `mask()` (Spark 3.4+) — PII redaction as one codegen'd
    expression: uppercase→X, lowercase→x, digits→n by default, with
    per-class overrides (here: keep letters, star the digits). The
    declarative cousin of `text_pii_mask`'s regex pipeline; the
    oracle reproduces the class mapping with regexes."""
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_default"),
        F.mask(
            "c_name",
            upperChar=F.lit(None),
            lowerChar=F.lit(None),
            digitChar=F.lit("*"),
        ).alias("masked_digits"),
    )


@register(
    "fn_struct_surgery",
    oracle="""
    SELECT event_id,
           event_type AS meta_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS meta_cents,
           user_id % 8 AS meta_shard
    FROM events WHERE event_id < 1500
    """,
)
def fn_struct_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct surgery without rebuild (Spark 3.1+
    withField/dropFields): add a computed field into an existing
    struct and drop another IN PLACE — on deeply nested telemetry
    schemas this is the difference between a two-line amendment and
    reconstructing the whole struct tree (error-prone and
    pruning-hostile). The final flatten proves the surgery: the
    dropped field is gone, the added fields carry computed values."""
    e = table(spark, sf_dir, "events").where(F.col("event_id") < 1500)
    nested = e.select(
        "event_id",
        F.struct(
            F.col("event_type").alias("type"),
            F.col("value").alias("raw_value"),
            F.col("user_id").alias("uid"),
        ).alias("meta"),
    )
    operated = nested.withColumn(
        "meta",
        F.col("meta")
        .withField("cents", F.floor(F.col("meta.raw_value") * 100 + 0.5))
        .withField("shard", F.col("meta.uid") % 8)
        .dropFields("raw_value", "uid"),
    )
    return operated.select(
        "event_id",
        F.col("meta.type").alias("meta_type"),
        F.col("meta.cents").cast("long").alias("meta_cents"),
        F.col("meta.shard").alias("meta_shard"),
    )


# ------------------------------------------- structured-text parsing

@register(
    "fn_structured_parse",
    oracle="""
    SELECT n_nationkey,
           n_name AS csv_name, n_regionkey AS csv_region,
           n_name AS xml_name, n_regionkey AS xml_region,
           TRUE AS csv_roundtrip, TRUE AS xml_roundtrip
    FROM nation
    """,
)
def fn_structured_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedded structured-text parsing: serialize nation fields to a
    CSV line and an XML snippet IN-PLAN, then parse them back with
    ``from_csv`` / ``from_xml`` (Spark 4) — the single-column
    ingestion path for logs that carry CSV/XML payloads inside a
    string field (the common "column 7 is actually a CSV record"
    mess). The oracle asserts the roundtrip identity: parse(render(
    row)) must reproduce the original fields exactly, which pins the
    quoting/escaping behavior of both codecs. Everything is per-row
    expression work — no shuffle, full codegen except the XML codec
    itself."""
    n = table(spark, sf_dir, "nation")
    csv_line = F.concat_ws(
        ",", F.col("n_name"), F.col("n_regionkey").cast("string")
    )
    xml_doc = F.concat(
        F.lit("<r><name>"),
        F.col("n_name"),
        F.lit("</name><region>"),
        F.col("n_regionkey").cast("string"),
        F.lit("</region></r>"),
    )
    parsed = n.select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        F.from_csv(
            csv_line, "name STRING, region INT"
        ).alias("c"),
        F.from_xml(
            xml_doc, "name STRING, region INT"
        ).alias("x"),
    )
    return parsed.select(
        "n_nationkey",
        F.col("c.name").alias("csv_name"),
        F.col("c.region").cast("int").alias("csv_region"),
        F.col("x.name").alias("xml_name"),
        F.col("x.region").cast("int").alias("xml_region"),
        (
            (F.col("c.name") == F.col("n_name"))
            & (F.col("c.region") == F.col("n_regionkey"))
        ).alias("csv_roundtrip"),
        (
            (F.col("x.name") == F.col("n_name"))
            & (F.col("x.region") == F.col("n_regionkey"))
        ).alias("xml_roundtrip"),
    )


@register(
    "fn_collation",
    oracle="""
    WITH mixed AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                    ELSE lower(c_mktsegment) END AS seg
        FROM customer
    )
    SELECT lower(seg) AS seg_ci,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT seg) AS BIGINT) AS n_case_variants,
           min(seg) AS first_variant
    FROM mixed GROUP BY lower(seg)
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 COLLATE): a mixed-case
    segment column is grouped CASE-INSENSITIVELY with the
    UTF8_LCASE collation — the collation engine itself does the
    ci-equality in the hash aggregate, not a lower() rewrite; the
    per-group binary-distinct count shows the case variants the
    collation folded together. The DuckDB oracle expresses the same
    semantics via lower() grouping (its NOCASE collation can't be a
    GROUP BY key), which is exactly the rewrite Spark's collation
    support makes unnecessary.

    Scale note: collated grouping hashes the collation key
    JVM-side inside the same whole-stage-codegen aggregate as any
    other groupBy — no extra projection, no UDF; sort orders and
    joins take the collation the same way."""
    c = table(spark, sf_dir, "customer")
    mixed = c.select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
        )
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg"),
    )
    ci = mixed.select(
        F.col("seg"),
        F.expr("seg COLLATE UTF8_LCASE").alias("seg_coll"),
    )
    return (
        ci.groupBy("seg_coll")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct(F.col("seg")).cast("long").alias(
                "n_case_variants"
            ),
            F.min("seg").alias("first_variant"),
        )
        .select(
            F.lower(F.col("seg_coll")).alias("seg_ci"),
            "n_rows",
            "n_case_variants",
            "first_variant",
        )
    )


@register(
    "fn_edit_distance",
    oracle="""
    WITH pairs AS (
        SELECT string_split(p_name, ' ')[1] AS a,
               string_split(p_name, ' ')[-1] AS b
        FROM part
    )
    SELECT CAST(levenshtein(a, b) AS BIGINT) AS dist,
           CAST(count(*) AS BIGINT) AS n_parts,
           min(a || '|' || b) AS example
    FROM pairs GROUP BY 1
    """,
)
def fn_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance as a first-class scalar (the fuzzy-
    match workhorse behind entity resolution and spell-tolerant
    joins): distance between the first and last token of every part
    name, rolled into a distance histogram with a deterministic
    example pair per bucket. Both engines implement the standard
    unit-cost DP, so the integer distances agree exactly. Scale
    shape: embarrassingly parallel scalar over the scan (whole-stage
    codegen, JVM-side — never a Python UDF) + one small hash
    aggregate; the per-value cost is O(len_a × len_b) on short
    tokens, flat per row at any scale."""
    p = table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    pairs = p.select(
        F.element_at(toks, 1).alias("a"),
        F.element_at(toks, -1).alias("b"),
    )
    return pairs.groupBy(
        F.levenshtein(F.col("a"), F.col("b")).cast("long").alias("dist")
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min(F.concat_ws("|", F.col("a"), F.col("b"))).alias("example"),
    )


@register(
    "agg_listagg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS members,
           CAST(count(*) AS BIGINT) AS n
    FROM nation GROUP BY 1
    """,
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — LISTAGG ... WITHIN GROUP (ORDER
    BY ...) (SQL:2016, Spark 4.0 built-in) vs DuckDB's string_agg
    ORDER BY: the report-friendly "names in one cell" aggregate that
    is only hash-verifiable because BOTH engines support a
    deterministic intra-group order (an unordered listagg would be
    partitioning-dependent and untestable — and unusable at 100 TB
    for the same reason). One hash aggregate; per-group sort cost is
    bounded by group size."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.expr(
            "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
        ).alias("members"),
        F.count(F.lit(1)).alias("n"),
    )


# ------------------------------------------------- geodesic distance

HAV_R_KM = "6371.0"  # mean Earth radius, one shared literal
HAV_LAT0 = "48.8566"  # reference point (one shared literal pair)
HAV_LON0 = "2.3522"
HAV_BAND_KM = 2000


@register(
    "fn_haversine",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               (CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6)
                    AS BIGINT) % 18000) / 100.0 - 90.0 AS lat,
               (CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 7, 6)
                    AS BIGINT) % 36000) / 100.0 - 180.0 AS lon
        FROM customer
    ), d AS (
        SELECT c_custkey,
               2.0 * {HAV_R_KM} * asin(sqrt(
                   pow(sin(radians(lat - {HAV_LAT0}) / 2.0), 2)
                   + cos(radians({HAV_LAT0})) * cos(radians(lat))
                     * pow(sin(radians(lon - {HAV_LON0}) / 2.0), 2)
               )) AS km
        FROM pts
    )
    SELECT CAST(floor(km / {HAV_BAND_KM}) AS BIGINT) AS band,
           CAST(count(*) AS BIGINT) AS n_cust,
           {sql_q4("min(km)")} AS min_km,
           {sql_q4("max(km)")} AS max_km
    FROM d GROUP BY 1
    """,
)
def fn_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine great-circle distance as a scalar — the geospatial
    primitive behind geo-fencing, delivery-radius filters, and
    location dedup: deterministic pseudo-coordinates derived from
    the customer key (md5 hash → lat/lon grid, identical in both
    engines), distance to one reference point via the standard
    2R·asin(√(sin²(Δφ/2)+cosφ₁cosφ₂sin²(Δλ/2))) formula written
    with byte-identical literals and operation order, rolled into
    distance-band counts with min/max per band.

    Trig parity (sin/cos/asin/radians) across JVM and DuckDB holds
    bitwise on identical doubles (established by fn_trig); the band
    histogram is integer. Embarrassingly parallel scalar + one small
    hash aggregate."""
    c = table(spark, sf_dir, "customer")
    key = F.col("c_custkey").cast("string")
    lat = (
        F.conv(F.substring(F.md5(key), 1, 6), 16, 10).cast("long") % 18000
    ) / 100.0 - 90.0
    lon = (
        F.conv(F.substring(F.md5(key), 7, 6), 16, 10).cast("long") % 36000
    ) / 100.0 - 180.0
    lat0, lon0, r = (
        F.lit(float(HAV_LAT0)),
        F.lit(float(HAV_LON0)),
        float(HAV_R_KM),
    )
    km = (
        2.0
        * r
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(lat - lat0) / 2.0), 2)
                + F.cos(F.radians(lat0))
                * F.cos(F.radians(lat))
                * F.pow(F.sin(F.radians(lon - lon0) / 2.0), 2)
            )
        )
    )
    return (
        c.select(km.alias("km"))
        .groupBy(F.floor(F.col("km") / HAV_BAND_KM).cast("long").alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            q4(F.min("km")).alias("min_km"),
            q4(F.max("km")).alias("max_km"),
        )
    )


@register(
    "fn_try_cast",
    oracle="""
    WITH dirty AS (
        SELECT p_partkey,
               CASE WHEN p_partkey % 7 = 0 THEN p_name
                    ELSE CAST(p_size AS VARCHAR) END AS raw
        FROM part
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(TRY_CAST(raw AS BIGINT)) AS BIGINT) AS n_parsed,
           CAST(count(*) - count(TRY_CAST(raw AS BIGINT)) AS BIGINT)
               AS n_rescued,
           CAST(sum(coalesce(TRY_CAST(raw AS BIGINT), 0)) AS BIGINT)
               AS parsed_sum
    FROM dirty
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST — the non-throwing cast that makes dirty-data
    ingestion total instead of job-killing (under ANSI mode a plain
    CAST on one malformed row fails the whole 100 TB job; TRY_CAST
    turns it into a NULL you can count and quarantine): a
    deterministically dirtied column (every 7th part carries its
    free-text name instead of a number) is parsed, with parse/rescue
    counts and the sum of the clean subset verified. Same census
    shape as source_csv_corrupt, at the expression surface."""
    p = table(spark, sf_dir, "part")
    raw = F.when(
        F.col("p_partkey") % 7 == 0, F.col("p_name")
    ).otherwise(F.col("p_size").cast("string"))
    parsed = raw.try_cast("bigint")
    return p.select(parsed.alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("v").cast("long").alias("n_parsed"),
        (F.count(F.lit(1)) - F.count("v")).cast("long").alias("n_rescued"),
        F.sum(F.coalesce(F.col("v"), F.lit(0))).cast("long").alias(
            "parsed_sum"
        ),
    )


# ------------------------------------------ Luhn checksum (r8 wave V)

# synthetic 12-digit account numbers derived from the order key (the
# fixtures carry no real PANs); multiplier/offset spread the digit
# distribution so roughly 1 in 10 validates, as with random numbers
_LUHN_MUL = 7919
_LUHN_OFF = 12345
_LUHN_W = 12

_LUHN_SQL_ACCT = (
    f"lpad(CAST((o_orderkey * {_LUHN_MUL} + {_LUHN_OFF})"
    f" % 1000000000000 AS VARCHAR), {_LUHN_W}, '0')"
)
# p = position from the right, 0-based; double every second digit
# starting left of the check digit, subtract 9 on overflow
_LUHN_SQL_TOTAL = (
    "list_aggregate([CASE WHEN p % 2 = 0"
    f" THEN CAST(substring(acct, {_LUHN_W} - p, 1) AS BIGINT)"
    f" WHEN CAST(substring(acct, {_LUHN_W} - p, 1) AS BIGINT) * 2 > 9"
    f" THEN CAST(substring(acct, {_LUHN_W} - p, 1) AS BIGINT) * 2 - 9"
    f" ELSE CAST(substring(acct, {_LUHN_W} - p, 1) AS BIGINT) * 2 END"
    f" for p in range(0, {_LUHN_W})], 'sum')"
)


@register(
    "fn_luhn_check",
    oracle=f"""
    WITH accts AS (
        SELECT {_LUHN_SQL_ACCT} AS acct FROM orders
    ), totals AS (
        SELECT CAST(({_LUHN_SQL_TOTAL}) % 10 AS BIGINT) AS rem FROM accts
    )
    SELECT rem, CAST(count(*) AS BIGINT) AS n,
           CAST(rem = 0 AS BOOLEAN) AS luhn_valid
    FROM totals GROUP BY rem
    """,
)
def fn_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) checksum validation over synthesized 12-digit
    account numbers, reported as the distribution of checksum
    remainders (rem = 0 is a valid number) — the credit-card/IMEI
    check-digit primitive a PII-scrubbing or data-quality pass needs
    (cf. text_pii_mask, which finds candidates; this validates them).

    The whole check is ONE JVM expression: a higher-order fold over
    the 12 digit positions (substring + conditional doubling with the
    subtract-9 carry), no UDF, no explode — so it rides whole-stage
    codegen and costs one map pass plus a 10-row aggregate at any
    scale."""
    o = table(spark, sf_dir, "orders")
    acct = F.expr(
        f"lpad(CAST((o_orderkey * {_LUHN_MUL}L + {_LUHN_OFF}L)"
        f" % 1000000000000L AS STRING), {_LUHN_W}, '0')"
    )
    total = F.expr(
        f"aggregate(sequence(0, {_LUHN_W - 1}), 0L, (acc, p) -> acc +"
        f" CASE WHEN p % 2 = 0"
        f" THEN CAST(substring(acct, {_LUHN_W} - p, 1) AS BIGINT)"
        f" WHEN CAST(substring(acct, {_LUHN_W} - p, 1) AS BIGINT) * 2 > 9"
        f" THEN CAST(substring(acct, {_LUHN_W} - p, 1) AS BIGINT) * 2 - 9"
        f" ELSE CAST(substring(acct, {_LUHN_W} - p, 1) AS BIGINT) * 2 END)"
    )
    return (
        o.select(acct.alias("acct"))
        .select((total % 10).alias("rem"))
        .groupBy("rem")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select("rem", "n", (F.col("rem") == 0).alias("luhn_valid"))
    )


# ------------------------------------ IPv4 parse / classify (r8 wave W)

# deterministic synthetic IPv4 per user (Knuth multiplicative hash
# into the 32-bit space) — the fixtures carry no real addresses
_INET_MUL = 2654435761


@register(
    "fn_inet",
    oracle=f"""
    WITH ips AS (
        SELECT (user_id * {_INET_MUL}) % 4294967296 AS ip FROM events
    ), octets AS (
        SELECT ip, ip // 16777216 AS a, (ip // 65536) % 256 AS b,
               ip // 256 AS net24
        FROM ips
    ), classed AS (
        SELECT CASE
                 WHEN a = 10 OR (a = 172 AND b BETWEEN 16 AND 31)
                      OR (a = 192 AND b = 168) THEN 'private'
                 WHEN a = 127 THEN 'loopback'
                 WHEN a = 169 AND b = 254 THEN 'link_local'
                 WHEN a BETWEEN 224 AND 239 THEN 'multicast'
                 WHEN a >= 240 THEN 'reserved'
                 ELSE 'public'
               END AS ip_class,
               ip, net24
        FROM octets
    )
    SELECT ip_class,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT ip) AS BIGINT) AS n_distinct_ips,
           CAST(count(DISTINCT net24) AS BIGINT) AS n_slash24
    FROM classed GROUP BY ip_class
    """,
)
def fn_inet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 address arithmetic without any inet type: synthesize a
    deterministic 32-bit address per event user, split octets by
    integer division, classify into RFC ranges (private/loopback/
    link-local/multicast/reserved/public) and count distinct /24
    networks per class — the address-plane profile a traffic or
    abuse-analytics pipeline computes before joining threat feeds.

    Everything is integer div/mod expressions (codegen-friendly, no
    UDF, no string parsing); the only shuffle is the final
    class-keyed aggregate with two distinct counts, which Spark
    plans as expand + two-phase hash aggregation.

    Scale shape: map pass + one bounded aggregate (<=6 classes)."""
    e = table(spark, sf_dir, "events")
    ip = (F.col("user_id") * _INET_MUL) % F.lit(4294967296).cast("long")
    octets = e.select(
        ip.alias("ip"),
        F.expr(f"((user_id * {_INET_MUL}L) % 4294967296L) DIV 16777216L")
        .alias("a"),
        F.expr(
            f"(((user_id * {_INET_MUL}L) % 4294967296L) DIV 65536L) % 256L"
        ).alias("b"),
        F.expr(f"((user_id * {_INET_MUL}L) % 4294967296L) DIV 256L")
        .alias("net24"),
    )
    classed = octets.select(
        F.when(
            (F.col("a") == 10)
            | ((F.col("a") == 172) & F.col("b").between(16, 31))
            | ((F.col("a") == 192) & (F.col("b") == 168)),
            "private",
        )
        .when(F.col("a") == 127, "loopback")
        .when((F.col("a") == 169) & (F.col("b") == 254), "link_local")
        .when(F.col("a").between(224, 239), "multicast")
        .when(F.col("a") >= 240, "reserved")
        .otherwise("public")
        .alias("ip_class"),
        "ip",
        "net24",
    )
    return classed.groupBy("ip_class").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("ip").cast("long").alias("n_distinct_ips"),
        F.countDistinct("net24").cast("long").alias("n_slash24"),
    )


# --------------------------- deterministic UUIDv3 minting (r8 wave AE)

_UUID_NS = "etlcnc:order:"


@register(
    "fn_uuid_v3",
    oracle=f"""
    WITH h AS (
        SELECT o_orderkey, md5('{_UUID_NS}' || CAST(o_orderkey AS VARCHAR))
                   AS hx
        FROM orders WHERE o_orderkey < 300
    )
    SELECT o_orderkey,
           substring(hx, 1, 8) || '-' || substring(hx, 9, 4) || '-3'
               || substring(hx, 14, 3) || '-'
               || substring('89ab',
                    ((strpos('0123456789abcdef', substring(hx, 17, 1)) - 1)
                     % 4) + 1, 1)
               || substring(hx, 18, 3) || '-' || substring(hx, 21, 12)
               AS uuid_v3,
           CAST(TRUE AS BOOLEAN) AS version_ok
    FROM h
    """,
)
def fn_uuid_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RFC-4122 version-3 (md5 name-based) UUID minting
    from the order key within a fixed namespace — the idempotent
    surrogate-key recipe for entity resolution across reruns (same
    input, same UUID, no uuid() nondeterminism), with the version
    nibble forced to 3 and the variant nibble to 10xx exactly as the
    RFC prescribes.

    Pure string surgery over the md5 hex digest (substring/concat/
    strpos — the variant nibble maps through '0123...f' lookup then
    into '89ab'), identical expressions on both engines, no UDF.

    Scale shape: one map expression per row; the key-bounded sample
    keeps the oracle hash small, the recipe itself is a pure
    projection at any scale."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 300)
    hx = F.md5(F.concat(F.lit(_UUID_NS), F.col("o_orderkey").cast("string")))
    h = o.select("o_orderkey", hx.alias("hx"))
    # variant nibble needs a column-valued substring start — spelled
    # via expr below (F.substring only takes literal positions)
    uuid = F.concat(
        F.substring("hx", 1, 8),
        F.lit("-"),
        F.substring("hx", 9, 4),
        F.lit("-3"),
        F.substring("hx", 14, 3),
        F.lit("-"),
        F.expr(
            "substring('89ab', CAST((instr('0123456789abcdef',"
            " substring(hx, 17, 1)) - 1) % 4 + 1 AS INT), 1)"
        ),
        F.substring("hx", 18, 3),
        F.lit("-"),
        F.substring("hx", 21, 12),
    )
    return h.select(
        "o_orderkey",
        uuid.alias("uuid_v3"),
        F.lit(True).alias("version_ok"),
    )


# ------------------------- arbitrary time_bucket (r8 wave AQ)

_TB_WIDTH_S = 27_180  # 7h33m — deliberately calendar-hostile
_TB_ORIGIN = "2024-01-01 00:00:00"


@register(
    "fn_time_bucket",
    oracle=f"""
    WITH b AS (
        SELECT epoch_us(TIMESTAMP '{_TB_ORIGIN}')
               + (CAST(floor((epoch_us(ts)
                    - epoch_us(TIMESTAMP '{_TB_ORIGIN}'))
                    / ({_TB_WIDTH_S} * 1000000.0)) AS BIGINT))
                 * {_TB_WIDTH_S} * 1000000 AS bucket_us
        FROM events
    )
    SELECT CAST(bucket_us AS BIGINT) AS bucket_us,
           CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY bucket_us
    """,
)
def fn_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-width, origin-aligned time bucketing — the
    hypertable-rollup primitive for widths the calendar functions
    can't express (here 7 h 33 m from a fixed origin): bucket =
    origin + floor((ts - origin)/width)·width, reported as an
    epoch-microsecond key with per-bucket counts. date_trunc covers
    only calendar units; this covers shift schedules, billing
    periods, and sensor frames.

    Pure epoch integer arithmetic (identical floor-division
    expression on both engines, output already in the epoch-us hash
    encoding), so bucketing is a map expression and the rollup is
    one hash aggregate whose cardinality is the time span over the
    width — calendar-bounded at any corpus size."""
    e = table(spark, sf_dir, "events")
    origin_us = F.unix_micros(F.lit(_TB_ORIGIN).cast("timestamp"))
    width_us = F.lit(_TB_WIDTH_S * 1_000_000).cast("long")
    bucket = (
        origin_us
        + F.floor(
            (F.unix_micros("ts") - origin_us) / (_TB_WIDTH_S * 1_000_000.0)
        ).cast("long")
        * width_us
    )
    return (
        e.select(bucket.cast("long").alias("bucket_us"))
        .groupBy("bucket_us")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ------------------------ round-9 wave Q: business-day arithmetic


@register(
    "fn_business_days",
    oracle="""
    WITH lat AS (
        -- sign-symmetric: walk from the EARLIER date, negate if the
        -- interval is reversed (synthetic shipdates are unordered)
        SELECT o.o_orderpriority AS pri,
               CASE WHEN l.l_shipdate >= o.o_orderdate THEN 1 ELSE -1 END
                   AS s,
               CAST(isodow(least(o.o_orderdate, l.l_shipdate))
                   AS BIGINT) AS w1,
               CAST(abs(date_diff('day', o.o_orderdate, l.l_shipdate))
                   AS BIGINT) AS d
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), biz AS (
        SELECT pri,
               s * ((d // 7) * 5
               + CAST(len(list_filter(range(1, d % 7 + 1),
                     i -> ((w1 - 1 + i) % 7) + 1 <= 5)) AS BIGINT))
                   AS bdays
        FROM lat
    )
    SELECT pri AS o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(bdays) AS BIGINT) AS min_bdays,
           CAST(max(bdays) AS BIGINT) AS max_bdays,
           floor(CAST(sum(bdays) AS DOUBLE) / count(*) * 10000 + 0.5)
               / 10000.0 AS mean_bdays,
           CAST(count_if(bdays <= 5) AS BIGINT) AS n_within_week
    FROM biz GROUP BY pri
    """,
)
def fn_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day (Mon-Fri) order-to-ship latency per priority via a
    CLOSED-FORM networkdays: full weeks contribute 5 each, and the
    remainder days are counted by walking at most six weekday indices
    from the EARLIER date's ISO weekday (sign-symmetric: reversed
    intervals negate, so dirty out-of-order rows stay honest) — a
    JVM-side array filter, so
    the whole computation is one per-row expression with NO calendar
    table, NO explode of the date range (the naive approach joins a
    day dimension per row — days×rows at 100 TB), and exact integer
    output. The SLA view ('shipped within 5 business days') that
    plain datediff misstates across weekends.

    Scale shape: one fact join (orders side broadcast-ably narrow),
    per-row closed form, one hash aggregate to |priorities| rows."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.col("o_orderpriority").alias("pri"),
        F.when(F.col("l_shipdate") >= F.col("o_orderdate"), 1)
        .otherwise(-1)
        .alias("s"),
        F.expr(
            "((dayofweek(least(o_orderdate, l_shipdate)) + 5) % 7) + 1"
        ).alias("w1"),
        F.abs(F.datediff("l_shipdate", "o_orderdate")).cast("long").alias("d"),
    )
    # Spark's sequence(1, 0) DESCENDS (unlike DuckDB's empty range):
    # guard the zero-remainder case explicitly
    rem_count = F.when(F.col("d") % 7 == 0, F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.sequence(F.lit(1), (F.col("d") % 7).cast("int")),
                lambda i: ((F.col("w1") - 1 + i) % 7) + 1 <= 5,
            )
        )
    )
    biz = lat.select(
        "pri",
        (
            F.col("s")
            * (F.floor(F.col("d") / 7) * 5 + rem_count.cast("long"))
        ).alias("bdays"),
    )
    return biz.groupBy(F.col("pri").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("bdays").cast("long").alias("min_bdays"),
        F.max("bdays").cast("long").alias("max_bdays"),
        q4(F.sum("bdays").cast("double") / F.count(F.lit(1))).alias(
            "mean_bdays"
        ),
        F.count_if(F.col("bdays") <= 5).cast("long").alias("n_within_week"),
    )


@register(
    "fn_soundex",
    oracle="""
    WITH words AS (
        SELECT w, CAST(count(*) AS BIGINT) AS n_parts
        FROM (SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
        GROUP BY w
    ), chars AS (
        SELECT w, t.pos AS pos, substr(w, CAST(t.pos AS INT), 1) AS ch
        FROM words, UNNEST(range(1, length(w) + 1)) AS t(pos)
    ), coded AS (
        SELECT w, pos,
               CASE WHEN ch IN ('b','f','p','v') THEN '1'
                    WHEN ch IN ('c','g','j','k','q','s','x','z') THEN '2'
                    WHEN ch IN ('d','t') THEN '3'
                    WHEN ch = 'l' THEN '4'
                    WHEN ch IN ('m','n') THEN '5'
                    WHEN ch = 'r' THEN '6'
                    WHEN ch IN ('a','e','i','o','u','y') THEN '0'
                    ELSE NULL END AS code
        FROM chars
    ), seq AS (
        SELECT w, pos, code,
               lag(code) OVER (PARTITION BY w ORDER BY pos) AS prev
        FROM coded WHERE code IS NOT NULL
    ), kept AS (
        SELECT w, pos, code FROM seq
        WHERE pos > 1 AND code BETWEEN '1' AND '6'
          AND (prev IS NULL OR prev <> code)
    )
    SELECT w.w AS word,
           upper(substr(w.w, 1, 1))
             || rpad(substr(coalesce(k.digits, ''), 1, 3), 3, '0') AS sx,
           w.n_parts
    FROM words w
    LEFT JOIN (SELECT w, string_agg(code, '' ORDER BY pos) AS digits
               FROM kept GROUP BY w) k ON k.w = w.w
    """,
)
def fn_soundex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builtin ``soundex()`` over the part-name vocabulary — the
    phonetic blocking key every record-linkage pipeline uses (same
    family as etl_record_linkage_fs, which blocks exactly). Spark's
    codegen'd soundex is hash-verified against a from-scratch
    RELATIONAL spelling of classic American Soundex in the oracle:
    per-character codes (B F P V→1, C G J K Q S X Z→2, D T→3, L→4,
    M N→5, R→6), vowels + Y coded '0' as adjacency SEPARATORS, H and
    W fully TRANSPARENT (dropped before the lag, so equal codes
    across an H/W collapse — 'ashcraft' → A261), adjacent equal codes
    collapsed including against the first letter ('pfister' → P236),
    first letter + first three digits right-padded with zeros. The
    vocabulary is alpha-only lowercase words, within the relational
    spec's domain (Spark returns non-letter-initial strings verbatim;
    no such words exist here).

    Scale shape: one explode + hash aggregate to the distinct
    vocabulary, then a per-word codegen'd expression — no joins over
    data, no Python."""
    p = table(spark, sf_dir, "part")
    words = (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    )
    return words.select(
        "word", F.soundex("word").alias("sx"), "n_parts"
    )


# ------------------------------------------------------------------
# Jaro-Winkler similarity, from scratch in relational HOFs (r11)


@register(
    "fn_jaro_winkler",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split(text, ' ')[1] AS s1,
               string_split(text, ' ')[len(string_split(text, ' '))] AS s2
        FROM documents WHERE doc_id < 40
    )
    SELECT doc_id, s1, s2,
           CAST(floor(jaro_similarity(s1, s2) * 10000 + 0.5) AS BIGINT)
               / 10000.0 AS jaro,
           CAST(floor(jaro_winkler_similarity(s1, s2) * 10000 + 0.5)
               AS BIGINT) / 10000.0 AS jaro_winkler
    FROM t
    """,
)
def fn_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro and Jaro-Winkler similarity between each bounded doc's
    first and last token — the fuzzy-matching scorer behind record
    linkage and typo-tolerant entity resolution, built FROM SCRATCH
    in pure JVM-side higher-order functions (Spark has no builtin):
    the greedy windowed character matching runs as a fold over the
    first string's positions carrying a 64-bit used-position bitmask
    plus the matched index lists, transpositions compare the matched
    sequences in i- vs j-order, and the Winkler prefix boost applies
    above the classic 0.7 threshold. The oracle is DuckDB's native
    jaro_winkler_similarity — an independent reference
    implementation, which is the point: hash parity proves the
    relational reconstruction IS the textbook algorithm.

    Scale shape: one bounded scan + one codegen'd projection per
    row; per-pair cost is |s1| x window (strings <= 63 chars for the
    bitmask — token-sized inputs by construction)."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    t = d.select(
        "doc_id",
        F.expr("element_at(split(text, ' '), 1)").alias("s1"),
        F.expr("element_at(split(text, ' '), -1)").alias("s2"),
    )
    # fold state: mask of used positions in s2, matched i/j lists
    match_fold = """
    aggregate(
      sequence(1, CAST(length(s1) AS INT)),
      named_struct('mask', 0L, 'ii', CAST(array() AS ARRAY<INT>),
                   'jj', CAST(array() AS ARRAY<INT>)),
      (acc, i) -> CASE WHEN size(filter(
            sequence(greatest(1, i - CAST(win AS INT)),
                     least(CAST(length(s2) AS INT), i + CAST(win AS INT))),
            j -> substring(s2, j, 1) = substring(s1, i, 1)
                 AND (shiftright(acc.mask, j - 1) & 1L) = 0L)) = 0
        THEN acc
        ELSE named_struct(
          'mask', acc.mask | shiftleft(1L, try_element_at(filter(
            sequence(greatest(1, i - CAST(win AS INT)),
                     least(CAST(length(s2) AS INT), i + CAST(win AS INT))),
            j -> substring(s2, j, 1) = substring(s1, i, 1)
                 AND (shiftright(acc.mask, j - 1) & 1L) = 0L), 1) - 1),
          'ii', concat(acc.ii, array(i)),
          'jj', concat(acc.jj, array(try_element_at(filter(
            sequence(greatest(1, i - CAST(win AS INT)),
                     least(CAST(length(s2) AS INT), i + CAST(win AS INT))),
            j -> substring(s2, j, 1) = substring(s1, i, 1)
                 AND (shiftright(acc.mask, j - 1) & 1L) = 0L), 1))))
        END)
    """
    base = t.select(
        "doc_id",
        "s1",
        "s2",
        F.expr(
            "greatest(CAST(greatest(length(s1), length(s2)) AS INT)"
            " div 2 - 1, 0)"
        ).alias("win"),
    ).select("doc_id", "s1", "s2", "win", F.expr(match_fold).alias("mt"))
    scored = base.select(
        "doc_id",
        "s1",
        "s2",
        F.expr("size(mt.ii)").alias("m"),
        F.expr(
            """
            CASE WHEN size(mt.ii) = 0 THEN 0L ELSE
            aggregate(sequence(1, size(mt.ii)), 0L, (s, k) ->
              s + CASE WHEN substring(s1, element_at(mt.ii, k), 1)
                          <> substring(s2,
                              element_at(array_sort(mt.jj), k), 1)
                       THEN 1L ELSE 0L END) END
            """
        ).alias("diff"),
        F.expr(
            """
            aggregate(sequence(1, least(4, CAST(least(length(s1),
                length(s2)) AS INT))), 0L, (s, k) ->
              CASE WHEN s = k - 1
                        AND substring(s1, k, 1) = substring(s2, k, 1)
                   THEN s + 1L ELSE s END)
            """
        ).alias("prefix_len"),
    )
    jaro = F.when(F.col("s1") == F.col("s2"), F.lit(1.0)).otherwise(
        F.when(F.col("m") == 0, F.lit(0.0)).otherwise(
            (
                F.col("m").cast("double") / F.length("s1")
                + F.col("m").cast("double") / F.length("s2")
                + (F.col("m") - F.floor(F.col("diff") / 2)).cast("double")
                / F.col("m")
            )
            / 3.0
        )
    )
    withj = scored.select("doc_id", "s1", "s2", "prefix_len", jaro.alias("j"))
    jw = F.when(
        F.col("j") > 0.7,
        F.col("j") + F.col("prefix_len") * 0.1 * (1.0 - F.col("j")),
    ).otherwise(F.col("j"))
    return withj.select(
        "doc_id",
        "s1",
        "s2",
        q4(F.col("j")).alias("jaro"),
        q4(jw).alias("jaro_winkler"),
    )


# ------------------------------------------------------------------
# Geohash encoding (r11)

_GH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
# 30-bit interleave, longitude first (even bit positions from the
# MSB), i.e. the standard geohash bit order for an even bit count.
_GH_BITS = " + ".join(
    f"(((lon_q >> {14 - k}) & 1) << {29 - 2 * k})"
    f" + (((lat_q >> {14 - k}) & 1) << {28 - 2 * k})"
    for k in range(15)
)
def _gh_chars(col: str, nchars: int) -> str:
    """Base32 string of the low ``5 * nchars`` bits of ``col`` — the
    alphabet is ASCII-ascending, so lexicographic string order equals
    numeric code order and min/max commute with this encode."""
    return "concat(" + ", ".join(
        f"substr('{_GH_B32}', "
        f"CAST((({col} >> {5 * (nchars - 1 - j)}) & 31) AS INT) + 1, 1)"
        for j in range(nchars)
    ) + ")"


@register(
    "fn_geohash",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               CAST('0x' || substr(md5('ghx' || CAST(c_custkey AS VARCHAR)),
                    1, 12) AS BIGINT) % 360000000 AS lon_u,
               CAST('0x' || substr(md5('ghx' || CAST(c_custkey AS VARCHAR)),
                    13, 12) AS BIGINT) % 180000000 AS lat_u
        FROM customer
    ), quant AS (
        SELECT c_custkey, lon_u, lat_u,
               (lon_u * 32768) // 360000000 AS lon_q,
               (lat_u * 32768) // 180000000 AS lat_q
        FROM pts
    ), bits AS (
        SELECT c_custkey, lon_u, lat_u, {_GH_BITS} AS gh
        FROM quant
    ), agg AS (
        SELECT gh >> 15 AS cell_id,
               CAST(count(*) AS BIGINT) AS n_pts,
               min(gh) AS min_gh,
               max(gh) AS max_gh,
               CAST(sum(lat_u) AS BIGINT) AS slat,
               CAST(sum(lon_u) AS BIGINT) AS slon
        FROM bits
        GROUP BY 1
    )
    SELECT {_gh_chars("cell_id", 3)} AS cell3,
           n_pts,
           {_gh_chars("min_gh", 6)} AS min_gh6,
           {_gh_chars("max_gh", 6)} AS max_gh6,
           {sql_q4("CAST(slat AS DOUBLE) / n_pts / 1000000.0 - 90.0")}
               AS mean_lat,
           {sql_q4("CAST(slon AS DOUBLE) / n_pts / 1000000.0 - 180.0")}
               AS mean_lon
    FROM agg
    """,
)
def fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding (Niemeyer 2008, public-domain scheme) as a
    pure-integer scalar: deterministic micro-degree pseudo-coordinates
    from md5 of the customer key (12 hex chars -> BIGINT, mod the
    micro-degree domain — the fn_haversine idiom at integer
    precision), quantized to 15 bits per axis entirely in BIGINT
    arithmetic (lon_u * 2^15 DIV 360e6 — no float rounding anywhere
    near a cell boundary), bit-interleaved longitude-first into the
    30-bit code, and emitted as the canonical 6-character base32
    string.  Rolled up by the 3-character prefix (the containing
    ~156 km x 156 km cell): count, min/max full hash, exact-integer
    mean coordinates.  Geohash prefixes ARE the spatial partition
    key: prefix equality = spatial proximity, which is what makes
    this the standard lakehouse partitioning/bucketing column for
    geo data (cf. join_spatial_grid's ad-hoc grid cells).

    Scale shape: embarrassingly parallel scalar expression (bit ops
    + one md5) followed by one map-side-combinable aggregate whose
    output is bounded by the 32^3 prefix domain, never the input
    rows.  The aggregate runs entirely on the INTEGER code (group by
    gh >> 15, min/max of gh) and the base32 strings are rendered
    post-aggregate: the alphabet is ASCII-ascending so string min/max
    equals numeric min/max, and keeping strings out of the aggregate
    keeps it a hash aggregate with a narrow long-typed shuffle row
    (min/max over strings would demote Spark to SortAggregate —
    pinned by tests/test_plans.py).  At 100 TB the encode is a
    zero-shuffle projection and the rollup is the partition-pruning
    manifest."""
    c = table(spark, sf_dir, "customer")
    key = F.concat(F.lit("ghx"), F.col("c_custkey").cast("string"))
    pts = c.select(
        "c_custkey",
        (F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long")
         % 360000000).alias("lon_u"),
        (F.conv(F.substring(F.md5(key), 13, 12), 16, 10).cast("long")
         % 180000000).alias("lat_u"),
    )
    quant = pts.select(
        "c_custkey",
        "lon_u",
        "lat_u",
        F.expr("(lon_u * 32768) DIV 360000000").alias("lon_q"),
        F.expr("(lat_u * 32768) DIV 180000000").alias("lat_q"),
    )
    bits = quant.select(
        "c_custkey", "lon_u", "lat_u", F.expr(_GH_BITS).alias("gh")
    )
    agg = bits.groupBy(F.expr("gh >> 15").alias("cell_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pts"),
        F.min("gh").alias("min_gh"),
        F.max("gh").alias("max_gh"),
        F.sum("lat_u").cast("long").alias("slat"),
        F.sum("lon_u").cast("long").alias("slon"),
    )
    return agg.select(
        F.expr(_gh_chars("cell_id", 3)).alias("cell3"),
        "n_pts",
        F.expr(_gh_chars("min_gh", 6)).alias("min_gh6"),
        F.expr(_gh_chars("max_gh", 6)).alias("max_gh6"),
        q4(
            F.col("slat").cast("double") / F.col("n_pts") / 1000000.0 - 90.0
        ).alias("mean_lat"),
        q4(
            F.col("slon").cast("double") / F.col("n_pts") / 1000000.0 - 180.0
        ).alias("mean_lon"),
    )
