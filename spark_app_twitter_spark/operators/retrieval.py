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
from spark_app_twitter_spark.operators.textstats import redact_text
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
    toks = tokens("text")
    quality = F.round(
        F.least(F.size(toks).cast("double") / F.lit(64.0), F.lit(1.0)) * 0.5
        + (
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double")
        )
        * 0.5,
        6,
    )
    docs = redact_text(spark, sf_dir).select(
        "doc_id", F.col("redacted").alias("text")
    )
    scored_docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", quality.alias("quality_score")
    )
    return (
        hits.join(scored_docs, "doc_id")
        .join(docs, "doc_id")
        .select(
            "query_id", "doc_id", "cos_sim", "rank", "quality_score", "text"
        )
    )


RAG_RETRIEVE_SQL = f"""
WITH hits AS (
{_KNN_SQL.strip()}
),
quality AS (
  SELECT doc_id,
         round(least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 64.0, 1.0) * 0.5
               + (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                  / len(string_split(text, ' '))) * 0.5, 6) AS quality_score
  FROM documents
),
red AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(text,
           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
           '[0-9]+', '<NUM>', 'g') AS text
  FROM documents
)
SELECT h.query_id, h.neighbor_id AS doc_id, h.cos_sim, h.rank,
       q.quality_score, r.text
FROM hits h
JOIN quality q ON h.neighbor_id = q.doc_id
JOIN red r ON h.neighbor_id = r.doc_id
"""

__all__ = ["rag_retrieve", "RAG_RETRIEVE_SQL"]
