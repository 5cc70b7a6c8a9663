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
from pyspark.sql import functions as F
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


def synthetic_wire(ticks: DataFrame, topics: tuple[str, ...]) -> DataFrame:
    """Schema-K wire rows derived from a (timestamp, value) tick
    frame — the rate source's output shape. Deterministic in
    ``value``: topic round-robins the configured topic list, the
    payload is a real TWEET_PAYLOAD JSON document, and the key
    follows the reference's producer scheme (upper(topic[:2]) + id,
    ``tweepy_ingestion/utilities/functions.py:46``). Works on batch
    frames too (``spark.range`` twin), so tests can pin exact values
    while the streaming smoke only has to prove the source runs."""
    from spark_app_twitter_spark.sources.kafka import tweet_key

    topic = F.element_at(
        F.array(*[F.lit(t) for t in topics]),
        (F.pmod(F.col("value"), F.lit(len(topics))) + 1).cast("int"),
    )
    payload = F.to_json(
        F.struct(
            F.struct(
                F.date_format(
                    "timestamp", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
                ).alias("created_at"),
                F.concat(F.lit("synthetic tweet "), F.col("value")).alias(
                    "text"
                ),
            ).alias("data")
        )
    )
    return ticks.select(
        tweet_key(topic, F.col("value")).alias("key"),
        payload.alias("value"),
        topic.alias("topic"),
    )


def read_rate_wire_stream(
    spark: SparkSession,
    topics: tuple[str, ...],
    rows_per_batch: int = 100,
) -> DataFrame:
    """Second BUILT-IN streaming source for the ingest projection
    (round-7 Kafka-probe mitigation): ``rate-micro-batch`` emits
    deterministic (timestamp, value) ticks per micro-batch with no
    connector jar or broker, and :func:`synthetic_wire` lifts them to
    the Kafka wire shape — so the SAME ``parse_tweet_stream`` plan
    is exercised by two independent source implementations (file
    JSON + rate), not a single stand-in. ``startTimestamp`` is
    pinned so replays are bit-identical."""
    ticks = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", 2)
        .option("startTimestamp", 1700000000000)
        .load()
    )
    return synthetic_wire(ticks, topics)


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
