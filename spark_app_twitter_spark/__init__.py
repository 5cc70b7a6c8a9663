"""spark_app_twitter_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference pipeline ``jmcmt87/spark_app_twitter``
(Kafka -> Spark Structured Streaming -> parquet datalake -> NLP
enrichment -> aggregation -> serving store -> dashboard queries),
built Spark-first: DataFrame/SQL plans optimized by Catalyst, with
Structured Streaming for the streaming path and vectorized Pandas
UDFs only where built-ins cannot express the semantics.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, sane shuffle sizing)
- ``schemas``    every StructType the engine touches, in one place
- ``sources``    batch + streaming readers (parquet, kafka, json fixtures)
                 and sinks (partitioned parquet stream sink, foreachBatch)
- ``functions``  column-level building blocks (text, hashing, vectors)
- ``operators``  the query surface: ingest transforms, aggregations,
                 serving queries, dedup family, similarity search,
                 text analysis, multimodal plumbing, TPC-H-style analytics
- ``plans``      plan-inspection helpers (pushdown/broadcast assertions)
- ``streaming``  structured-streaming jobs (ingest, windowed aggregation)
"""

__version__ = "0.1.0"
