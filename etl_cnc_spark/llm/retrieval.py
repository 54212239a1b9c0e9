"""Lexical and hybrid retrieval over the document corpus
(SURVEY.md §2.10 extension — the query side of a RAG data pipeline).

Two operators:

- ``text_bm25``: Okapi BM25 scoring of a fixed query-term set against
  the whole corpus — pure relational algebra (explode → tf/df
  aggregates → scalar scoring expression), no UDFs, fully
  whole-stage-codegen.
- ``sim_hybrid_rrf``: reciprocal-rank fusion of the BM25 lexical
  ranking with an embedding-cosine ranking — the standard hybrid
  retrieval pattern (lexical recall + semantic recall, fused without
  score calibration).

Float discipline (SURVEY.md §5): every scoring formula is written
with byte-identical literals and operation order on the Spark and
DuckDB sides; per-term partial scores are aggregated into fixed
slots (``sum(CASE term WHEN ...)``) and added in a fixed expression
order, so no floating-point sum depends on row order — the results
are bitwise reproducible at any parallelism.

No reference citations possible — /root/reference is empty (see
SURVEY.md §0); the surface derives from the public BM25/RRF
literature (Robertson & Zaragoza 2009; Cormack et al. 2009).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ..utils import q4, sql_q4
from .dedup import _SQL_NORM2
from .similarity import _dot64, _norm2

# A fixed 4-term query: one rare, discriminative term (df≈25 of 500)
# plus three common ones — exercises the full idf dynamic range.
QUERY_TERMS = ("dup", "vector", "merge", "spark")
BM25_K1 = "1.2"
BM25_K1P1 = "2.2"  # k1 + 1, as ONE literal (1.2+1.0 != 2.2 bitwise)
BM25_B = "0.75"
BM25_OMB = "0.25"  # 1 - b, as one literal
TOP_N = 20
RRF_K = 60
HYB_QID = 0  # query vector for the hybrid key = embedding of vec_id 0
LIST_N = 100  # depth of each ranked list fed into the fusion

_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

# Per-term fixed score slots: each doc has at most ONE row per term,
# and x + 0.0 is exact, so these sums are order-independent; the
# final score adds the slots in a fixed expression order.
_SLOTS_SQL = ",\n           ".join(
    f"sum(CASE WHEN term = '{t}' THEN contrib ELSE 0.0 END) AS s{i}"
    for i, t in enumerate(QUERY_TERMS)
)
_SCORE_SQL = " + ".join(f"s{i}" for i in range(len(QUERY_TERMS)))

# BM25(term, doc) with identical literals/op-order on both engines:
#   idf  = ln(1.0 + ((N - df) + 0.5) / (df + 0.5))
#   norm = tf + k1 * ((1-b) + b * (dl / avgdl))
#   contrib = idf * (tf * (k1+1)) / norm
_CONTRIB_SQL = f"""
        ln(1.0 + ((s.n_docs - d.df) + 0.5) / (d.df + 0.5))
        * (CAST(t.tf AS DOUBLE) * {BM25_K1P1})
        / (t.tf + {BM25_K1} * ({BM25_OMB} + {BM25_B} * (l.dl / s.avgdl)))
"""

_BM25_CTE = f"""
    words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), dl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM words GROUP BY doc_id
    ), stats AS (
        SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
               CAST((SELECT count(*) FROM words) AS DOUBLE)
                   / (SELECT count(*) FROM documents) AS avgdl
    ), qw AS (
        SELECT doc_id, term FROM words WHERE term IN ({_TERMS_SQL})
    ), tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM qw GROUP BY doc_id, term
    ), dfx AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM qw GROUP BY term
    ), scored AS (
        SELECT t.doc_id, t.term, {_CONTRIB_SQL} AS contrib
        FROM tf t
        JOIN dfx d USING (term)
        JOIN dl l ON t.doc_id = l.doc_id
        CROSS JOIN stats s
    ), per_doc AS (
        SELECT doc_id,
           {_SLOTS_SQL},
           CAST(count(*) AS BIGINT) AS n_terms
        FROM scored GROUP BY doc_id
    ), lex_ranked AS (
        SELECT doc_id, n_terms, {_SCORE_SQL} AS score,
               CAST(row_number() OVER (
                    ORDER BY {_SCORE_SQL} DESC, doc_id) AS BIGINT) AS rn
        FROM per_doc
    )
"""


def _bm25_scores(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """(doc_id, n_terms, score, rn) for the top-``n`` BM25 docs — the
    shared lexical stage of both retrieval keys.

    Deliberately does NOT explode the corpus into words: per-term
    frequencies come from |Q| array folds per document (``F.filter``
    + ``size`` over the split array), so tf and dl are computed
    row-locally with ZERO data-sized shuffle — the only shuffles are
    the 4-row df aggregate, the 1-row corpus stats, and the final
    per-doc score aggregate. (An exploded-words formulation shuffles
    ~avg-doc-length× more rows twice; the oracle deliberately keeps
    that independent shape — tf/df/dl are integers either way, so the
    two formulations agree bitwise.)

    The corpus is SPLIT ONCE: the per-doc (dl, tf-structs) base frame
    — doc-count-sized integers, no text — is persist()ed and every
    consumer (corpus stats, the tf explode, df, scoring) reads the
    cache; before r12 the split + array folds re-ran up to 3x
    (stats pass, tf pass, and tf's second consumer). The matched
    (doc, term) frame is persisted too. r12 interleaved 8-run A/B
    on sim_hybrid_rrf: 1.135 s vs 1.244 s. r13: both frames moved
    from localCheckpoint to persist() — they are DATA-SCALED, and
    persist keeps lineage so executor loss recomputes instead of
    failing the job (SCALE.md checkpoint rule)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    def _eq(term: str):
        # closure factory: a plain 1-arg lambda (a `t=t` default would
        # make PySpark treat it as the (value, index) 2-arg form)
        return lambda w: w == F.lit(term)

    per_term = [
        F.struct(
            F.lit(t).alias("term"),
            F.size(F.filter(F.col("ws"), _eq(t))).cast("long").alias("tf"),
        )
        for t in QUERY_TERMS
    ]
    # DATA-SCALED (doc-count-sized): persist(), not localCheckpoint —
    # lineage is kept so an executor loss RECOMPUTES the partitions
    # instead of failing the job (SCALE.md round-13 checkpoint rule);
    # reuse across the four consumers is identical.
    base = d.select(
        "doc_id",
        F.size("ws").cast("long").alias("dl"),
        F.array(*per_term).alias("terms"),
    ).persist()
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("double").alias("n_words"),
    ).select("n_docs", (F.col("n_words") / F.col("n_docs")).alias("avgdl"))
    tf = (
        base.select("doc_id", "dl", F.explode("terms").alias("s"))
        .select("doc_id", "dl", "s.term", "s.tf")
        .where(F.col("tf") > 0)
        .persist()  # doc x matched-terms — data-scaled, same rule
    )
    dfx = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    contrib: Column = (
        F.log(
            F.lit(1.0)
            + ((F.col("n_docs") - F.col("df")) + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        * (F.col("tf").cast("double") * F.lit(float(BM25_K1P1)))
        / (
            F.col("tf")
            + F.lit(float(BM25_K1))
            * (
                F.lit(float(BM25_OMB))
                + F.lit(float(BM25_B)) * (F.col("dl") / F.col("avgdl"))
            )
        )
    )
    scored = (
        tf.join(F.broadcast(dfx), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", contrib.alias("contrib"))
    )
    slots = [
        F.sum(
            F.when(F.col("term") == t, F.col("contrib")).otherwise(F.lit(0.0))
        ).alias(f"s{i}")
        for i, t in enumerate(QUERY_TERMS)
    ]
    per_doc = scored.groupBy("doc_id").agg(
        *slots, F.count("*").cast("long").alias("n_terms")
    )
    score = sum(
        (F.col(f"s{i}") for i in range(1, len(QUERY_TERMS))), F.col("s0")
    )
    # Global top-n WITHOUT a corpus-sized single-partition window:
    # orderBy+limit plans as TakeOrderedAndProject (per-partition
    # top-n, merged at the driver-side take), and row_number then
    # runs over the already-bounded n rows.
    top = (
        per_doc.select("doc_id", "n_terms", score.alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(n)
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


@register(
    "text_bm25",
    oracle=f"""
    WITH {_BM25_CTE}
    SELECT doc_id, n_terms, {sql_q4("score")} AS score, rn
    FROM lex_ranked WHERE rn <= {TOP_N}
    """,
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 documents for a fixed 4-term query.

    Scale shape: tf/dl are row-local array folds (no corpus explode,
    no data-sized shuffle — see ``_bm25_scores``); df and corpus
    stats are broadcast; scoring is one scalar expression; the final
    top-N is TakeOrderedAndProject (per-partition top-N merge), so no
    stage ever concentrates the corpus on one task."""
    ranked = _bm25_scores(spark, sf_dir, TOP_N)
    return ranked.select(
        "doc_id", "n_terms", q4(F.col("score")).alias("score"), "rn"
    )


@register(
    "sim_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_CTE}, vec_scored AS (
        SELECT b.vec_id AS doc_id,
               list_aggregate([CAST(a.embedding[i] AS DOUBLE)
                               * CAST(b.embedding[i] AS DOUBLE)
                               for i in range(1, 65)], 'sum')
               / sqrt({_SQL_NORM2.format(col="a.embedding")}
                      * {_SQL_NORM2.format(col="b.embedding")}) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id = {HYB_QID}
    ), vec_ranked AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY cos DESC, doc_id)
                    AS BIGINT) AS rn
        FROM vec_scored
    ), fused AS (
        SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
               l.rn AS lex_rn, v.rn AS vec_rn,
               coalesce(1.0 / ({RRF_K} + l.rn), 0.0)
                 + coalesce(1.0 / ({RRF_K} + v.rn), 0.0) AS rrf
        FROM (SELECT doc_id, rn FROM lex_ranked WHERE rn <= {LIST_N}) l
        FULL OUTER JOIN
             (SELECT doc_id, rn FROM vec_ranked WHERE rn <= {LIST_N}) v
        ON l.doc_id = v.doc_id
    )
    SELECT doc_id, lex_rn, vec_rn, {sql_q4("rrf")} AS rrf,
           CAST(row_number() OVER (ORDER BY rrf DESC, doc_id)
                AS BIGINT) AS rn
    FROM fused
    QUALIFY rn <= {TOP_N}
    """,
    bench=True,
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25
    lexical top-100 and the cosine top-100 against the query
    embedding (vec_id 0), fused without score calibration.

    RRF needs only the two rank columns, so the fusion is a full
    outer join of two already-bounded (≤100-row) lists — trivially
    broadcastable at any corpus size; the expensive stages are the
    two rankers, each linear (BM25 above; cosine is one broadcast
    1-row query × corpus pass, same shape as ``sim_topk_exact``),
    and each takes its top-100 via TakeOrderedAndProject before any
    single-partition ranking window runs."""
    lex = _bm25_scores(spark, sf_dir, LIST_N).select(
        "doc_id", F.col("rn").alias("lex_rn")
    )
    e = table(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") == HYB_QID).select(
        F.col("embedding").alias("qe"), _norm2(F.col("embedding")).alias("qn2")
    )
    cos = _dot64(F.col("qe"), F.col("embedding")) / F.sqrt(
        F.col("qn2") * _norm2(F.col("embedding"))
    )
    wv = Window.orderBy(F.col("cos").desc(), "doc_id")
    vec = (
        e.crossJoin(F.broadcast(qv))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cos"))
        .orderBy(F.col("cos").desc(), "doc_id")
        .limit(LIST_N)
        .withColumn("rn", F.row_number().over(wv).cast("long"))
        .select("doc_id", F.col("rn").alias("vec_rn"))
    )
    fused = lex.join(vec, "doc_id", "full").select(
        "doc_id",
        "lex_rn",
        "vec_rn",
        (
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rn")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("vec_rn")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= TOP_N)
        .select("doc_id", "lex_rn", "vec_rn", q4(F.col("rrf")).alias("rrf"), "rn")
    )


# ------------------------------------------------- MMR diversification

MMR_QUERIES = 4  # query block: embeddings of vec_id 0..3
MMR_POOL = 30  # relevance pool depth fed into the re-ranker
MMR_K = 10  # diversified results returned per query
MMR_LAMBDA = 0.7  # relevance weight; 1-lambda penalizes redundancy


@register(
    "sim_mmr_diversify",
    notes="Maximal Marginal Relevance re-rank — the greedy argmax is "
    "inherently sequential per query (not SQL-expressible), so the "
    "driver records rows-only; tests/test_r7_wave_h.py re-derives the "
    "full selection with independent numpy and asserts exact ranks.",
)
def sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998): after
    an exact cosine top-``MMR_POOL`` retrieval per query, greedily
    pick ``MMR_K`` results maximizing λ·relevance − (1−λ)·max-sim-to-
    already-picked — the standard diversification pass between
    retrieval and a RAG context window, killing near-duplicate hits
    that would waste prompt tokens.

    Scale shape: the candidate pool per query is BOUNDED (30 rows),
    so the sequential greedy loop runs inside ``applyInPandas`` per
    query group — thousands of queries diversify in parallel, each
    group doing a 30×30 numpy sim matrix and k=10 argmax sweeps;
    the unbounded part (scoring the corpus) stays relational
    (broadcast query block, partitioned top-k window). Ties break on
    candidate id, so the selection is fully deterministic."""
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < MMR_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        _norm2(F.col("embedding")).alias("qn2"),
    )
    c = e.where(F.col("vec_id") >= MMR_QUERIES).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        _norm2(F.col("embedding")).alias("cn2"),
    )
    cos = _dot64(F.col("qe"), F.col("ce")) / F.sqrt(
        F.col("qn2") * F.col("cn2")
    )
    w = Window.partitionBy("qid").orderBy(F.col("rel").desc(), "cid")
    pool = (
        F.broadcast(q)
        .join(c)
        .select("qid", "cid", cos.alias("rel"), "ce")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= MMR_POOL)
        .drop("rn")
    )

    def _mmr(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("cid").reset_index(drop=True)
        emb = np.array([np.asarray(v, dtype=np.float64) for v in pdf["ce"]])
        norms = np.sqrt((emb * emb).sum(axis=1))
        sims = (emb @ emb.T) / np.outer(norms, norms)
        rel = pdf["rel"].to_numpy()
        cids = pdf["cid"].to_numpy()
        picked: list[int] = []
        rows = []
        for rank in range(1, MMR_K + 1):
            best = -1
            best_score = None
            for i in range(len(cids)):
                if i in picked:
                    continue
                red = max(sims[i, j] for j in picked) if picked else 0.0
                score = MMR_LAMBDA * rel[i] - (1 - MMR_LAMBDA) * red
                # strict > keeps the smallest cid on exact ties
                if best_score is None or score > best_score:
                    best, best_score = i, score
            picked.append(best)
            rows.append(
                (
                    int(pdf["qid"].iloc[0]),
                    rank,
                    int(cids[best]),
                    float(rel[best]),
                    float(best_score),
                )
            )
        return pd.DataFrame(
            rows, columns=["qid", "rank", "cid", "relevance", "mmr_score"]
        )

    out = pool.groupBy("qid").applyInPandas(
        _mmr,
        "qid long, rank long, cid long, relevance double, mmr_score double",
    )
    return out.select(
        "qid",
        "rank",
        "cid",
        q4(F.col("relevance")).alias("relevance"),
        q4(F.col("mmr_score")).alias("mmr_score"),
    )


# --------------------------------------- contrastive mining (r8 wave)

TRIPLET_NQ = 50  # anchor block (matches sim_topk_exact's query set)

_TM_DOT = (
    "list_aggregate([CAST(a.embedding[i] AS DOUBLE)"
    " * CAST(b.embedding[i] AS DOUBLE) for i in range(1, 65)], 'sum')"
)


@register(
    "embed_triplet_mining",
    oracle=f"""
    WITH scored AS (
        SELECT a.vec_id AS anchor, b.vec_id AS cid,
               (a.label = b.label) AS same,
               {_TM_DOT} /
               sqrt({_SQL_NORM2.format(col="a.embedding")}
                    * {_SQL_NORM2.format(col="b.embedding")}) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < {TRIPLET_NQ}
    ), pos AS (
        SELECT anchor, cid AS pos_id, cos AS pos_cos FROM (
            SELECT anchor, cid, cos,
                   row_number() OVER (PARTITION BY anchor
                        ORDER BY cos DESC, cid) AS rn
            FROM scored WHERE same
        ) WHERE rn = 1
    ), sneg AS (
        SELECT anchor, cid AS sh_id, cos AS sh_cos FROM (
            SELECT s.anchor, s.cid, s.cos,
                   row_number() OVER (PARTITION BY s.anchor
                        ORDER BY s.cos DESC, s.cid) AS rn
            FROM scored s JOIN pos p ON p.anchor = s.anchor
            WHERE NOT s.same AND s.cos < p.pos_cos
        ) WHERE rn = 1
    ), hard AS (
        SELECT anchor, cid AS h_id, cos AS h_cos FROM (
            SELECT anchor, cid, cos,
                   row_number() OVER (PARTITION BY anchor
                        ORDER BY cos DESC, cid) AS rn
            FROM scored WHERE NOT same
        ) WHERE rn = 1
    )
    SELECT p.anchor, p.pos_id,
           {sql_q4("p.pos_cos")} AS pos_cos,
           coalesce(s.sh_id, h.h_id) AS neg_id,
           {sql_q4("coalesce(s.sh_cos, h.h_cos)")} AS neg_cos,
           {sql_q4("p.pos_cos - coalesce(s.sh_cos, h.h_cos)")} AS margin,
           (s.sh_id IS NOT NULL) AS semi_hard
    FROM pos p
    LEFT JOIN sneg s ON s.anchor = p.anchor
    LEFT JOIN hard h ON h.anchor = p.anchor
    """,
)
def embed_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-hard triplet mining over the embedding corpus (FaceNet's
    training-data selection rule, public): per anchor, the positive
    is the nearest same-label vector; the negative is the CLOSEST
    different-label vector still farther than the positive (semi-hard
    — informative but not label-noise), falling back to the hardest
    negative when nothing sits inside the margin band — the exact
    candidate-generation pass a contrastive-training pipeline runs
    over its corpus every epoch.

    Scale shape: the anchor block broadcasts against the corpus (at
    production scale: anchors are mini-batch-sized, or candidates
    come from the IVF/LSH bucket tiers instead of the full corpus);
    positive/semi-hard/hard selections are per-anchor bounded top-1
    windows over the same scored frame — one shuffle on anchor."""
    e = table(spark, sf_dir, "embeddings")
    a = e.where(F.col("vec_id") < TRIPLET_NQ).select(
        F.col("vec_id").alias("anchor"),
        F.col("label").alias("alabel"),
        F.col("embedding").alias("ae"),
        _norm2(F.col("embedding")).alias("an2"),
    )
    b = e.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("blabel"),
        F.col("embedding").alias("be"),
        _norm2(F.col("embedding")).alias("bn2"),
    )
    cos = _dot64(F.col("ae"), F.col("be")) / F.sqrt(F.col("an2") * F.col("bn2"))
    scored = (
        F.broadcast(a)
        .join(b, F.col("anchor") != F.col("cid"))
        .select(
            "anchor",
            "cid",
            (F.col("alabel") == F.col("blabel")).alias("same"),
            cos.alias("cos"),
        ).persist()
    )
    w = Window.partitionBy("anchor").orderBy(F.col("cos").desc(), "cid")
    pos = (
        scored.where(F.col("same"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("anchor", F.col("cid").alias("pos_id"), F.col("cos").alias("pos_cos"))
    )
    semi = (
        scored.where(~F.col("same"))
        .join(pos.select("anchor", "pos_cos"), "anchor")
        .where(F.col("cos") < F.col("pos_cos"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("anchor", F.col("cid").alias("sh_id"), F.col("cos").alias("sh_cos"))
    )
    hard = (
        scored.where(~F.col("same"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("anchor", F.col("cid").alias("h_id"), F.col("cos").alias("h_cos"))
    )
    return (
        pos.join(semi, "anchor", "left")
        .join(hard, "anchor", "left")
        .select(
            "anchor",
            "pos_id",
            q4(F.col("pos_cos")).alias("pos_cos"),
            F.coalesce("sh_id", "h_id").alias("neg_id"),
            q4(F.coalesce("sh_cos", "h_cos")).alias("neg_cos"),
            q4(F.col("pos_cos") - F.coalesce("sh_cos", "h_cos")).alias("margin"),
            F.col("sh_id").isNotNull().alias("semi_hard"),
        )
    )
