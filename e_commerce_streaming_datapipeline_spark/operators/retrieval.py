"""Lexical + hybrid retrieval over the documents/embeddings tables
(BASELINE.json scale-up mandate, similarity-search family): BM25 scoring —
the lexical ranking a training-data search/curation stack runs next to its
vector index — and reciprocal-rank fusion of the lexical and vector rankers,
the standard hybrid-retrieval combiner.

Scale shape: BM25 is one explode -> filter(term IN query) pushed BELOW the
groupBy (only query-term postings ever shuffle — the inverted-index access
path expressed relationally), document length and corpus totals attach as a
broadcast scalar, and the final top-k is TakeOrdered (orderBy+limit), never
a global single-partition window.  RRF is a full-outer equi-join of two
bounded (top-50) rank lists — driver-sized, broadcast both ways.

Determinism contract (module convention, SURVEY §7 hard-part 2): per-term
BM25 contributions are identical single-expression double math on both
engines, fixed-pointed to micros (scaled long) BEFORE the per-document sum,
so summation order cannot move the 4dp rounding; ranks order by the rounded
score with id tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e_commerce_streaming_datapipeline_spark.functions.rounding import fround
from e_commerce_streaming_datapipeline_spark.functions.scalars import scalar_join
from e_commerce_streaming_datapipeline_spark.functions.vector import (
    cosine_similarity_expr,
    to_double_array,
)
from e_commerce_streaming_datapipeline_spark.plans.registry import query
from e_commerce_streaming_datapipeline_spark.sources.batch import (
    load_table,
    load_valid_embeddings,
)

# the fixed "search request" of the fixture: three vocabulary terms for the
# lexical leg, embedding vec_id 0 for the vector leg (doc_id == vec_id by
# fixture construction; the query document itself is excluded from results)
QUERY_TERMS = ("join", "stream", "window")
QUERY_VEC_ID = 0
K1 = 1.2
B = 0.75
FUSE_DEPTH = 50  # per-ranker candidate depth entering the fusion
RRF_K = 60


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BM25 score for ``QUERY_TERMS`` as ``(doc_id, bm25)``.

    The term filter sits directly on the exploded postings — only rows for
    the 3 query terms survive into the (doc_id, term) aggregation, so the
    shuffled volume is the query's posting lists, not the corpus (at 100 TB:
    the same access pattern an inverted index serves, expressed as
    filter-then-aggregate so Catalyst pushes the IN down to the scan side).
    Document frequency re-aggregates the tf relation (exchange reuse on
    term); corpus totals (N, avgdl) attach via a 1-row broadcast hash join.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    dl = docs.select("doc_id", F.size(toks).alias("dl"))
    totals = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .where(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    joined = scalar_join(
        tf.join(F.broadcast(df), "term").join(dl, "doc_id"), totals
    )
    idf = F.log(
        F.lit(1) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf") * F.lit(K1 + 1)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1 - B) + F.lit(B) * F.col("dl") / F.col("avgdl"))
    )
    # fixed-point micros BEFORE the sum: per-term math is one identical IEEE
    # expression on both engines; the integer sum is order-independent
    contrib = joined.select(
        "doc_id", F.round(idf * tfn * 1000000, 0).cast("long").alias("c")
    )
    return contrib.groupBy("doc_id").agg(
        fround(F.sum("c").cast("double") / 1000000, 4).alias("bm25")
    )


_BM25_SCORED_SQL = """
WITH dl AS (
    SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
), totals AS (
    SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
    WHERE term IN ('join', 'stream', 'window')
    GROUP BY 1, 2
), df AS (
    SELECT term, count(*) AS df FROM tf GROUP BY 1
), contrib AS (
    SELECT
        tf.doc_id,
        CAST(round(
            ln(1 + (totals.n_docs - df.df + 0.5) / (df.df + 0.5))
            * ((tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / totals.avgdl)))
            * 1000000
        ) AS BIGINT) AS c
    FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN totals
)
SELECT doc_id, round(CAST(sum(c) AS DOUBLE) / 1000000, 4) AS bm25
FROM contrib GROUP BY 1
"""


@query(
    "bm25_topk",
    oracle=f"""
WITH scored AS ({_BM25_SCORED_SQL})
SELECT doc_id, bm25, CAST(rn AS INT) AS rank
FROM (
    SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn
    FROM scored
)
WHERE rn <= 10
""",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for a fixed 3-term query (k1=1.2, b=0.75) — the
    lexical ranker of a retrieval/curation stack.

    Plan: the global top-10 is orderBy+limit (TakeOrderedAndProject — per-
    partition heaps, no single-partition window over the scored relation);
    the display rank is a window over the already-limited 10 rows only.
    """
    top = _bm25_scored(spark, sf_dir).orderBy(F.col("bm25").desc(), "doc_id").limit(10)
    w = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


# the vector leg shares load_valid_embeddings' contract (non-null, len 64)
_VEC_RANKED_SQL = f"""
    SELECT neighbor_id, CAST(row_number() OVER (
        ORDER BY cos_sim DESC, neighbor_id
    ) AS INT) AS rank_vec
    FROM (
        SELECT
            c.vec_id AS neighbor_id,
            round(
                list_inner_product(q.e, c.e)
                / (sqrt(list_inner_product(q.e, q.e))
                   * sqrt(list_inner_product(c.e, c.e))),
                6
            ) AS cos_sim
        FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
              WHERE embedding IS NOT NULL AND len(embedding) = 64) c
        CROSS JOIN (SELECT embedding::DOUBLE[] AS e FROM embeddings
                    WHERE vec_id = {QUERY_VEC_ID}) q
        WHERE c.vec_id <> {QUERY_VEC_ID}
    )
    QUALIFY rank_vec <= {FUSE_DEPTH}
"""


@query(
    "hybrid_rrf_fusion",
    oracle=f"""
WITH lex AS (
    SELECT doc_id, bm25, CAST(row_number() OVER (
        ORDER BY bm25 DESC, doc_id
    ) AS INT) AS rank_lex
    FROM ({_BM25_SCORED_SQL})
    WHERE doc_id <> {QUERY_VEC_ID}
    QUALIFY rank_lex <= {FUSE_DEPTH}
), vec AS (
{_VEC_RANKED_SQL}
), fused AS (
    SELECT
        coalesce(lex.doc_id, vec.neighbor_id) AS doc_id,
        lex.rank_lex,
        vec.rank_vec,
        round(
            coalesce(1.0 / ({RRF_K} + lex.rank_lex), 0)
            + coalesce(1.0 / ({RRF_K} + vec.rank_vec), 0),
            6
        ) AS rrf
    FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.neighbor_id
)
SELECT doc_id, rank_lex, rank_vec, rrf, CAST(rn AS INT) AS rank
FROM (
    SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rn FROM fused
)
WHERE rn <= 10
""",
)
def q_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25 lexical
    top-50 and the cosine vector top-50 for the SAME query (terms + the
    query document's embedding), top-10 fused results.

    Scale shape: each ranker's candidate list is depth-bounded (50 rows)
    BEFORE fusion, so the full-outer fusion join is over two driver-sized
    relations regardless of corpus size; the per-ranker top-50s are
    TakeOrdered.  RRF itself is rank-only arithmetic — exact small rationals,
    no score-scale calibration between rankers, which is why production
    hybrid search defaults to it.
    """
    lex_top = (
        _bm25_scored(spark, sf_dir)
        .where(F.col("doc_id") != QUERY_VEC_ID)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(FUSE_DEPTH)
    )
    lex = lex_top.withColumn(
        "rank_lex",
        F.row_number().over(Window.orderBy(F.col("bm25").desc(), "doc_id")).cast("int"),
    ).select("doc_id", "rank_lex")

    emb = load_valid_embeddings(spark, sf_dir).select(
        "vec_id", to_double_array("embedding").alias("e")
    )
    qvec = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(F.col("e").alias("qe"))
    vec_top = (
        scalar_join(emb.where(F.col("vec_id") != QUERY_VEC_ID), qvec)
        .select(
            F.col("vec_id").alias("neighbor_id"),
            fround(cosine_similarity_expr(F.col("qe"), F.col("e")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "neighbor_id")
        .limit(FUSE_DEPTH)
    )
    vec = vec_top.withColumn(
        "rank_vec",
        F.row_number()
        .over(Window.orderBy(F.col("cos_sim").desc(), "neighbor_id"))
        .cast("int"),
    ).select("neighbor_id", "rank_vec")

    fused = (
        lex.join(vec, lex["doc_id"] == vec["neighbor_id"], "full_outer")
        .select(
            F.coalesce(lex["doc_id"], vec["neighbor_id"]).alias("doc_id"),
            "rank_lex",
            "rank_vec",
            fround(
                F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_lex")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_vec")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    top = fused.orderBy(F.col("rrf").desc(), "doc_id").limit(10)
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.col("rrf").desc(), "doc_id")).cast("int")
    )
