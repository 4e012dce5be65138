"""Text analysis operators (BASELINE.json scale-up mandate): token counting,
quality scoring, language-ID heuristics, document fingerprinting.

All of it is built-in Catalyst expressions (split/regexp/md5/length) — no
Python in the hot path, so a 100 TB documents table processes at parquet-scan
speed with the projection pushed down to (doc_id, text, lang).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e_commerce_streaming_datapipeline_spark.functions.rounding import fround

from e_commerce_streaming_datapipeline_spark.plans.registry import query
from e_commerce_streaming_datapipeline_spark.sources.batch import load_table


def text_stats(docs: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_unique = F.size(F.array_distinct(toks))
    n_chars = F.length(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique_tokens"),
        n_chars.alias("n_chars_measured"),
        # mean token length: chars excluding the single separators
        fround((n_chars - (n_tokens - 1)) / n_tokens, 4).alias("avg_token_len"),
        # type-token ratio — the lexical-diversity quality signal
        fround(n_unique / n_tokens, 4).alias("ttr"),
        # composite quality score: diversity + length saturation, both [0,50]
        fround(n_unique / n_tokens * 50 + F.least(n_tokens, F.lit(100)) / 100 * 50, 2)
        .alias("quality_score"),
    )


_TEXT_STATS_ORACLE = """
SELECT
    doc_id,
    lang,
    CAST(len(string_split(text, ' ')) AS INT)                 AS n_tokens,
    CAST(len(list_distinct(string_split(text, ' '))) AS INT)  AS n_unique_tokens,
    CAST(length(text) AS INT)                                 AS n_chars_measured,
    round((length(text) - (len(string_split(text, ' ')) - 1))
          / len(string_split(text, ' ')), 4)                  AS avg_token_len,
    round(len(list_distinct(string_split(text, ' ')))
          / len(string_split(text, ' ')), 4)                  AS ttr,
    round(len(list_distinct(string_split(text, ' ')))
          / len(string_split(text, ' ')) * 50
          + least(len(string_split(text, ' ')), 100) / 100 * 50, 2) AS quality_score
FROM documents
"""


@query("text_stats", oracle=_TEXT_STATS_ORACLE)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts, type-token ratio and a composite quality
    score — single codegen stage over the scan."""
    return text_stats(load_table(spark, "documents", sf_dir))


@query(
    "lang_quality_stats",
    oracle="""
SELECT
    lang,
    count(*)                                       AS docs,
    round(avg(CAST(len(string_split(text, ' ')) AS BIGINT)), 2) AS avg_tokens,
    round(avg(n_chars), 2)                         AS avg_chars,
    CAST(sum(n_chars) AS BIGINT)                   AS total_chars,
    round(avg(len(list_distinct(string_split(text, ' ')))
              / len(string_split(text, ' '))), 4)  AS avg_ttr
FROM documents
GROUP BY 1
""",
)
def q_lang_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality per language: doc counts, length and diversity means —
    the per-shard quality dashboard of a data pipeline."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    return docs.groupBy("lang").agg(
        F.count("*").alias("docs"),
        fround(F.avg(F.size(toks).cast("long")), 2).alias("avg_tokens"),
        fround(F.avg("n_chars"), 2).alias("avg_chars"),
        F.sum("n_chars").alias("total_chars"),
        fround(F.avg(F.size(F.array_distinct(toks)) / F.size(toks)), 4).alias("avg_ttr"),
    )


@query(
    "lang_id",
    oracle="""
SELECT
    doc_id,
    lang AS labeled_lang,
    CAST(len(regexp_extract_all(text, '\\bthe\\b')) AS INT)  AS en_markers,
    CAST(len(regexp_extract_all(text, '\\b(a|of|and)\\b')) AS INT) AS en_function_words,
    CASE
        WHEN len(regexp_extract_all(text, '\\bthe\\b')) >= 2 THEN 'en'
        WHEN len(regexp_extract_all(text, '\\b(a|of|and)\\b')) >= 1 THEN 'en-like'
        ELSE 'und'
    END AS predicted_lang
FROM documents
""",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID heuristic (the degenerate-but-real n-gram
    approach: score function-word hits, argmax).  Deterministic, regex stays
    JVM-side."""
    docs = load_table(spark, "documents", sf_dir)
    en_markers = F.regexp_count(F.col("text"), F.lit(r"\bthe\b"))
    en_function = F.regexp_count(F.col("text"), F.lit(r"\b(a|of|and)\b"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        en_markers.alias("en_markers"),
        en_function.alias("en_function_words"),
        F.when(en_markers >= 2, "en")
        .when(en_function >= 1, "en-like")
        .otherwise("und")
        .alias("predicted_lang"),
    )


@query(
    "token_count_estimates",
    oracle="""
SELECT
    doc_id,
    CAST(len(string_split(text, ' ')) AS INT)              AS ws_tokens,
    CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\s]')) AS INT) AS bpe_ish_tokens,
    CAST(ceil(length(text) / 4.0) AS BIGINT)               AS char_est_tokens
FROM documents
""",
)
def q_token_count_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex segmentation, and
    the chars/4 heuristic — the budget accounting of an LLM data pipeline."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"[a-z0-9]+|[^a-z0-9\s]")).alias("bpe_ish_tokens"),
        F.ceil(F.length(F.col("text")) / 4.0).alias("char_est_tokens"),
    )


@query(
    "doc_fingerprints",
    oracle="""
SELECT
    doc_id,
    substr(md5(text), 1, 16) AS content_fp,
    list_aggregate(
        list_transform(
            generate_series(1, len(string_split(text, ' ')) - 2),
            i -> md5(string_split(text, ' ')[i] || ' ' ||
                     string_split(text, ' ')[i + 1] || ' ' ||
                     string_split(text, ' ')[i + 2])
        ),
        'min'
    ) AS min_shingle_fp
FROM documents
WHERE len(string_split(text, ' ')) >= 3
""",
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact content fingerprint plus a
    winnowing-style min-shingle-hash fingerprint (stable under suffix/prefix
    edits away from the minimizing shingle)."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    min_shingle = F.array_min(
        F.expr(
            "transform(sequence(0, size(split(text, ' ')) - 3), "
            "i -> md5(concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1], "
            "split(text, ' ')[i+2])))"
        )
    )
    return (
        docs.where(F.size(toks) >= 3)
        .select(
            "doc_id",
            F.substring(F.md5(F.col("text")), 1, 16).alias("content_fp"),
            min_shingle.alias("min_shingle_fp"),
        )
    )


@query(
    "top_terms",
    oracle="""
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
), counted AS (
    SELECT term, count(*) AS n_occurrences FROM toks GROUP BY 1
)
SELECT term, n_occurrences, CAST(rn AS INT) AS rank
FROM (
    SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, term) AS rn
    FROM counted
)
WHERE rn <= 20
""",
)
def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies via explode (the UDTF/generator surface) with
    a deterministic top-20 — vocabulary accounting for tokenizer training.

    Scale shape: explode -> partial map-side count -> one shuffle on term;
    the final top-k is a single-partition sort over only |vocab| rows."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    counted = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n_occurrences"))
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("term"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20)
        .select("term", "n_occurrences", "rank")
    )
