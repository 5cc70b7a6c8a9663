"""Kafka source/sink builders (SURVEY §2.1 S1, S7).

The reference subscribes five comma-separated topics with
``startingOffsets=latest`` and ``failOnDataLoss=false`` (reference
``spark_app/functions/functions.py:28-35``) — loss-tolerant,
no-replay. The engine keeps those as *options*, defaulting to
replayable ``earliest`` so tests and backfills are deterministic.

These builders only construct plans; they need the spark-sql-kafka
connector jar and live brokers at ``start()`` time, so unit tests
exercise the same projection via the file stream instead
(streaming/ingest.py) — the DataFrame surface is identical.

Connector probe log (per-round check for a usable jar):
- 2026-08-13 (round 2): no ``spark-sql-kafka`` jar in
  ``pyspark/jars``, no ``~/.ivy2`` cache, no package network access
  — the live Kafka path remains unexecutable in this container.
  ``tests/test_sources.py`` asserts the builder produces the kafka
  source plan up to the connector-resolution boundary.
- 2026-08-13 (round 3): ``spark.jars.packages org.apache.spark:
  spark-sql-kafka-0-10_2.13:4.1.2`` attempted — ivy resolution
  fails with ``unresolved dependency: ... not found`` in ~3 s (no
  Maven network). The option surface the connector would receive is
  now a pure dict (``kafka_source_options`` / ``kafka_sink_options``)
  pinned by contract tests instead.
- 2026-08-13 (round 6): re-probed ``spark.jars.packages
  org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2`` — ivy
  resolution still has no network; spark-submit aborts in ~2.5 s
  (JAVA_GATEWAY_EXITED before port handoff). Status unchanged:
  option surface + file-stream twin remain the tested path.
- 2026-08-14 (round 6, continued): direct curl to repo1.maven.org
  fails DNS resolution (exit 6) — no package network; no new jar in
  ``pyspark/jars``. Status unchanged.
- 2026-08-14 (round 7): re-probed — still no ``*kafka*`` jar in
  ``pyspark/jars``, no ``~/.ivy2`` cache, curl to repo1.maven.org
  still DNS-fails (exit 6). Mitigation widened: a second BUILT-IN
  streaming source (``rate-micro-batch``) now drives the identical
  ingest projection end-to-end (streaming/ingest.py
  ``read_rate_wire_stream``), so the projection is exercised by two
  independent source implementations, not just the file stream.
- 2026-08-14 (round 8): still no jar / Maven network. NEW: the
  boundary itself is now crossed — PySpark 4's Python Data Source
  API hosts a wire twin (``kafka_pysource.py``) exposing the real
  connector's 7-column schema and validating the exact option
  contract; ``read_kafka_stream(..., fmt=PY_KAFKA_FORMAT)`` — this
  builder, same code — resolves, analyzes, and runs micro-batches
  end-to-end through the ingest projection, with deterministic
  replay (readBetweenOffsets) pinned by test. Spark RESERVES the
  literal name ``kafka`` (registerPython fails with
  DATA_SOURCE_ALREADY_EXISTS — the JVM lookup special-cases it for
  the deploy hint), so the twin registers as ``kafka-wire``; the
  connector-lookup boundary error for ``format("kafka")`` stays
  pinned separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source_options(
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """The EXACT option dict the kafka source receives — single
    source of truth shared by :func:`read_kafka_stream` and the
    connector contract test (reference option surface:
    ``spark_app/functions/functions.py:28-35``)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
    fmt: str = "kafka",
) -> DataFrame:
    """Streaming Kafka source: key/value binary + topic + metadata.

    ``fmt`` defaults to the real connector; tests pass
    ``kafka_pysource.PY_KAFKA_FORMAT`` to run the SAME builder
    against the registered Python wire twin (same options, same
    7-column wire schema, real micro-batch execution)."""
    return (
        spark.readStream.format(fmt)
        .options(
            **kafka_source_options(
                bootstrap_servers, topics, starting_offsets, fail_on_data_loss
            )
        )
        .load()
    )


def kafka_sink_options(bootstrap_servers: str) -> dict[str, str]:
    """Producer-side option dict (single source of truth, as above)."""
    return {"kafka.bootstrap.servers": bootstrap_servers}


def write_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic_col: str = "topic",
    key_col: str = "key",
    value_col: str = "value",
):
    """Batch Kafka producer sink (test-harness twin of the reference's
    tweepy producer routing — ``tweepy_ingestion/utilities/
    functions.py:41-46``): explicit key/topic/value columns."""
    return (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(value_col).cast("string").alias("value"),
            F.col(topic_col).alias("topic"),
        )
        .write.format("kafka")
        .options(**kafka_sink_options(bootstrap_servers))
    )


def tweet_key(topic: F.Column, tweet_id: F.Column) -> F.Column:
    """The reference's message-key scheme: upper(topic[:2]) + id
    (``tweepy_ingestion/utilities/functions.py:46``)."""
    return F.concat(F.upper(F.substring(topic, 1, 2)), tweet_id.cast("string"))
