"""Ingest transforms: parse / project / derive (SURVEY §2.2 P1-P3).

The reference parses the Kafka JSON value **twice** — once per
extracted field (reference ``spark_app/functions/functions.py:37-40``)
— and derives string partition columns from the event timestamp
(``functions.py:42-43``). Here the payload is parsed once into a
struct and fields are projected from it; partition columns are the
same ``date_format`` derivations.

The synthetic ``events`` table stands in for the tweet stream
(TESTDATA.md: ``ts``→created_at, ``event_type``→topic,
``props``→JSON payload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_app_twitter_spark.schemas import EVENT_PROPS, TWEET_PAYLOAD
from spark_app_twitter_spark.sources.parquet import load_table


def parse_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P3 over the events table: single JSON parse, projection
    with casts, derived partition columns.

    At scale this is a pure map stage: no shuffle, whole-stage
    codegen end-to-end, and the parquet scan reads only the six
    referenced columns (ReadSchema pruning).
    """
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("j", F.from_json(F.col("props"), EVENT_PROPS))
    return parsed.select(
        F.col("event_id"),
        F.col("ts").alias("created_at"),
        F.col("event_type").alias("topic"),
        F.col("j.k").alias("prop_k"),
        F.date_format("ts", "yyyy-MM-dd").alias("date"),
        F.date_format("ts", "HH").alias("hour"),
        F.col("value"),
    )


PARSE_EVENTS_SQL = """
SELECT
  event_id,
  ts AS created_at,
  event_type AS topic,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
  strftime(ts, '%Y-%m-%d') AS date,
  strftime(ts, '%H') AS hour,
  value
FROM events
"""


def parse_tweet_stream(raw: DataFrame) -> DataFrame:
    """The actual streaming-ingest projection (schema K -> schema R).

    Input: a (streaming or batch) DataFrame with Kafka wire columns
    ``key binary, value binary, topic string``. Works identically
    under ``readStream`` — used by streaming/ingest.py.
    """
    parsed = raw.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), TWEET_PAYLOAD).alias("j"),
        F.col("topic"),
    )
    return parsed.select(
        "key",
        F.col("j.data.created_at").alias("created_at"),
        F.col("j.data.text").alias("text"),
        "topic",
        F.date_format("j.data.created_at", "HH").alias("hour"),
        F.date_format("j.data.created_at", "yyyy-MM-dd").alias("date"),
    )
