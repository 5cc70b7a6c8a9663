"""Enrichment: text -> sentiment/emotion labels (SURVEY §2.6 M1-M2).

The reference runs two Spark NLP pipelines over the raw hour
(reference ``spark_app/functions/functions.py:87-95``) and extracts
the first annotation via ``element_at(..., 1)``. The engine's
enrichment is a pluggable column stage: default is the deterministic
Catalyst lexicon classifier (oracle-reproducible, codegen'd); the
Pandas-UDF path hosts real models.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

from spark_app_twitter_spark.functions import text as X
from spark_app_twitter_spark.sources.parquet import load_table


def enrich(df: DataFrame, text_col: str = "text",
           sentiment_col: Column | None = None,
           emotion_col: Column | None = None) -> DataFrame:
    """Append ``sentiment`` and ``emotion`` label columns.

    Mirrors the reference's annotate-then-``element_at(...,1)``
    extraction (``functions.py:88,95``) but as one map-side
    projection — no second pass, no action, no Python by default.
    """
    return df.withColumn(
        "sentiment", sentiment_col if sentiment_col is not None else X.sentiment(text_col)
    ).withColumn(
        "emotion", emotion_col if emotion_col is not None else X.emotion(text_col)
    )


def enrich_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row enriched documents (the schema-E analog)."""
    docs = load_table(spark, sf_dir, "documents")
    return enrich(docs).select("doc_id", "lang", "sentiment", "emotion")


ENRICH_DOCUMENTS_SQL = f"""
SELECT
  doc_id,
  lang,
  {X.sentiment_sql('text')} AS sentiment,
  {X.emotion_sql('text')} AS emotion
FROM documents
"""


def build_enrichment_pipeline():
    """The reference composes enrichment as a ``pyspark.ml.Pipeline``
    (DocumentAssembler -> Tokenizer -> DistilBERT, reference
    ``spark_app/main.py:73-87``). The engine offers the same
    fit/transform surface with SQLTransformer stages wrapping the
    deterministic classifiers — a real model swaps in as another
    PipelineStage without changing callers.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import SQLTransformer

    from spark_app_twitter_spark.functions.text import emotion_sql_spark, sentiment_sql_spark

    sent = SQLTransformer(
        statement=f"SELECT *, {sentiment_sql_spark('text')} AS sentiment FROM __THIS__"
    )
    emo = SQLTransformer(
        statement=f"SELECT *, {emotion_sql_spark('text')} AS emotion FROM __THIS__"
    )
    return Pipeline(stages=[sent, emo])
