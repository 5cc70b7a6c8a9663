"""Retrieval capstone: ANN search joined back to document payloads —
the serving-side query of a RAG / retrieval pipeline.

Composes the engine's existing pieces end-to-end:
  1. top-k cosine neighbors per query vector (similarity.py's
     broadcast-query shape; swap in the LSH/IVF variant at scale),
  2. join neighbor ids to the documents table (vec_id == doc_id in
     the synthetic corpus),
  3. attach the quality score (textstats.py's filter stage) and the
     PII-redacted text — what a retrieval API actually returns.

Plan shape at 100 TB: the ANN stage bounds candidates to k rows per
query, so the payload join probes the documents table with a tiny
key set (shuffle or broadcast of the *result* side, never the
corpus); quality/redaction are map-side projections on the few
matched rows.

Reference scope note: the reference app has no retrieval surface;
this composes SURVEY.md's LLM-pipeline mandate into the user-facing
query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_app_twitter_spark.functions.text import tokens
from spark_app_twitter_spark.operators.similarity import knn_bruteforce
from spark_app_twitter_spark.operators.similarity import (
    KNN_BRUTEFORCE_SQL as _KNN_SQL,
)
from spark_app_twitter_spark.operators.textstats import (
    REDACT_RULES,
    quality_score_expr,
    quality_score_sql,
    redact_sql_expr,
)
from spark_app_twitter_spark.sources.parquet import load_table


def rag_retrieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, cos_sim, rank, quality_score, text) for the
    top-k neighbors of each query vector, with redacted payload text.
    """
    hits = knn_bruteforce(spark, sf_dir).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        "cos_sim",
        "rank",
    )
    red = F.col("text")
    for pat, repl in REDACT_RULES:
        red = F.regexp_replace(red, pat, repl)
    # ONE documents scan provides both payload columns (quality and
    # redacted text are map-side projections of the same row), joined
    # once to the k-per-query hit set
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        quality_score_expr(tokens("text")).alias("quality_score"),
        red.alias("text"),
    )
    return hits.join(docs, "doc_id").select(
        "query_id", "doc_id", "cos_sim", "rank", "quality_score", "text"
    )


RAG_RETRIEVE_SQL = f"""
WITH hits AS (
{_KNN_SQL.strip()}
),
docs AS (
  SELECT doc_id,
         {quality_score_sql("string_split(text, ' ')")} AS quality_score,
         {redact_sql_expr("text")} AS text
  FROM documents
)
SELECT h.query_id, h.neighbor_id AS doc_id, h.cos_sim, h.rank,
       d.quality_score, d.text
FROM hits h
JOIN docs d ON h.neighbor_id = d.doc_id
"""

__all__ = ["rag_retrieve", "RAG_RETRIEVE_SQL"]
