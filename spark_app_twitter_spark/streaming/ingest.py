"""EP1 — streaming ingest: event stream -> parse -> partitioned
parquet datalake (SURVEY §3 EP1, §2.7).

Reference behavior: Kafka -> double-parse projection -> parquet/S3,
restarted every hour by a hand-rolled driver loop (reference
``spark_app/main.py:93-111``). Engine behavior: ONE long-lived
query (or an ``availableNow`` drain for backfills/tests); the
projection is built once (operators/ingest.py) and is identical for
batch and streaming DataFrames — same Catalyst plan either way.

Tests run the pipeline from a JSON file source (no brokers needed):
the source swaps, the plan doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql import types as T

from spark_app_twitter_spark.operators.ingest import parse_tweet_stream
from spark_app_twitter_spark.sources.kafka import read_kafka_stream
from spark_app_twitter_spark.sources.sinks import write_partitioned_parquet_stream

# Wire schema of the file-based test stream: same shape the Kafka
# source yields after a binary->string cast.
WIRE = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("topic", T.StringType()),
    ]
)


def read_json_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stand-in for Kafka: one JSON object per line with
    key/value/topic columns (schema K wire shape)."""
    return spark.readStream.schema(WIRE).json(path)


def ingest_stream(
    source: DataFrame,
    datalake_path: str,
    checkpoint: str,
    available_now: bool = False,
) -> StreamingQuery:
    """source (kafka or file) -> schema-R projection -> parquet sink."""
    return write_partitioned_parquet_stream(
        parse_tweet_stream(source),
        datalake_path,
        checkpoint,
        partition_cols=("date", "hour"),
        trigger_available_now=available_now,
    )


def ingest_from_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    datalake_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """The production wiring (needs the kafka connector + brokers)."""
    return ingest_stream(
        read_kafka_stream(spark, bootstrap_servers, topics),
        datalake_path,
        checkpoint,
    )
