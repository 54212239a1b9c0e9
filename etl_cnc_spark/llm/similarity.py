"""Similarity search over embedding columns (SURVEY.md §2.10).

Three tiers:
- ``sim_topk_exact``: brute-force cosine top-k — the correctness
  baseline (bounded query set × broadcast candidates).
- ``sim_ann_ivf``: partitioned (IVF-style) search — candidates
  restricted to the query's coarse cell; deterministic, so it gets a
  full SQL oracle, and recall vs exact is measured in tests.
- ``sim_ann_lsh``: random-hyperplane bucketed LSH via
  BucketedRandomProjectionLSH — the 100 TB path (candidate
  generation by bucket join); statistical → rows-only + recall test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ..utils import q4, sql_q4
from .dedup import _SQL_DOT, _SQL_NORM2, _dot64, _norm2

N_QUERIES = 50
TOP_K = 5


@register(
    "sim_topk_exact",
    oracle=f"""
    WITH scored AS (
        SELECT a.vec_id AS qid, b.vec_id AS cid,
               {_SQL_DOT} /
               sqrt({_SQL_NORM2.format(col="a.embedding")}
                    * {_SQL_NORM2.format(col="b.embedding")}) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < {N_QUERIES}
    ), ranked AS (
        SELECT qid, cid, cos,
               CAST(row_number() OVER (PARTITION BY qid
                    ORDER BY cos DESC, cid) AS BIGINT) AS rn
        FROM scored
    )
    SELECT qid, cid, {sql_q4("cos")} AS cosine, rn
    FROM ranked WHERE rn <= {TOP_K}
    """,
    bench=True,
)
def sim_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the first 50 vectors.

    The query set is broadcast against the candidate table (at scale:
    queries are always the small side); dot products are JVM-side
    higher-order-function folds — no Python, no UDF. Ranking uses the
    raw double cosine (bitwise identical to the oracle's fold) with
    cid as tie-break."""
    e = table(spark, sf_dir, "embeddings")
    # Pre-compute each side's squared norm BEFORE the join: one fold per
    # row (N+Q folds) instead of two folds per pair (2·N·Q) — the values
    # are bitwise identical, so oracle hashing is unaffected.
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        _norm2(F.col("embedding")).alias("qn2"),
    )
    c = e.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        _norm2(F.col("embedding")).alias("cn2"),
    )
    pairs = F.broadcast(q).join(c, F.col("qid") != F.col("cid"))
    cos = _dot64(F.col("qe"), F.col("ce")) / F.sqrt(F.col("qn2") * F.col("cn2"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), "cid")
    return (
        pairs.select("qid", "cid", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= TOP_K)
        .select("qid", "cid", q4(F.col("cos")).alias("cosine"), "rn")
    )


@register(
    "sim_ann_ivf",
    oracle=f"""
    WITH scored AS (
        SELECT a.vec_id AS qid, b.vec_id AS cid,
               {_SQL_DOT} /
               sqrt({_SQL_NORM2.format(col="a.embedding")}
                    * {_SQL_NORM2.format(col="b.embedding")}) AS cos
        FROM embeddings a
        JOIN embeddings b ON a.vec_id <> b.vec_id AND a.label = b.label
        WHERE a.vec_id < {N_QUERIES}
    ), ranked AS (
        SELECT qid, cid, cos,
               CAST(row_number() OVER (PARTITION BY qid
                    ORDER BY cos DESC, cid) AS BIGINT) AS rn
        FROM scored
    )
    SELECT qid, cid, {sql_q4("cos")} AS cosine, rn
    FROM ranked WHERE rn <= {TOP_K}
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: search only the query's coarse
    cell (here the ``label`` column stands in for a centroid
    assignment). This is the inverted-file scale shape — the
    candidate join key (label) partitions the work, cutting the
    scanned candidates by ~the cell count. Deterministic → full SQL
    oracle; recall@k vs sim_topk_exact is measured in tests."""
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("ql"),
        _norm2(F.col("embedding")).alias("qn2"),
    )
    c = e.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("label").alias("cl"),
        _norm2(F.col("embedding")).alias("cn2"),
    )
    pairs = F.broadcast(q).join(c, (F.col("qid") != F.col("cid")) & (F.col("ql") == F.col("cl")))
    cos = _dot64(F.col("qe"), F.col("ce")) / F.sqrt(F.col("qn2") * F.col("cn2"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), "cid")
    return (
        pairs.select("qid", "cid", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= TOP_K)
        .select("qid", "cid", q4(F.col("cos")).alias("cosine"), "rn")
    )


@register(
    "sim_ann_lsh",
    notes="Random-projection LSH: bucket-join candidate generation; "
    "recall@5 vs sim_topk_exact asserted in tests/test_llm.py.",
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via BucketedRandomProjectionLSH
    (fixed seed). Candidates come from LSH bucket collisions
    (approxSimilarityJoin), then exact distance ranks the survivors —
    the standard recall/cost dial for 100 TB-scale ANN."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector("embedding").alias("vec")
    )
    q = e.where(F.col("vec_id") < N_QUERIES)
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes", bucketLength=0.5, numHashTables=4, seed=42
    )
    model = lsh.fit(e)
    joined = model.approxSimilarityJoin(q, e, 1.35, distCol="dist")
    w = Window.partitionBy("qid").orderBy(F.col("dist"), "cid")
    return (
        joined.where(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("qid"),
            F.col("datasetB.vec_id").alias("cid"),
            F.col("dist").alias("dist"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= TOP_K)
        .select("qid", "cid", q4(F.col("dist")).alias("euclid_dist"), "rn")
    )
