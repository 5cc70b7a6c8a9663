"""Streaming PII monitor — the governance complement of the ingest
pipeline: per-topic PII incidence over the live wire, through the
SAME aggregation definition as the batch report
(textstats.pii_group_counts), so the dashboard's streaming counters
and the release gate's batch datacard can never disagree.

Runs in complete output mode: the grouped counters are Spark-managed
streaming state (|topics| rows — tiny), merged exactly-once across
micro-batches; no custom foreachBatch merge logic to get wrong.
Works over any wire-shaped source: the file-JSON twin, the
rate-micro-batch synthesizer, or the kafka-wire Python source —
all through parse_tweet_stream's projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from spark_app_twitter_spark.operators.ingest import parse_tweet_stream
from spark_app_twitter_spark.operators.textstats import pii_group_counts


def pii_topic_counts(wire: DataFrame) -> DataFrame:
    """(topic, n_docs, ..., pii_bp) over a wire-shaped frame (batch
    or streaming): the ingest projection then the shared grouped PII
    aggregation keyed on topic."""
    return pii_group_counts(parse_tweet_stream(wire), "topic")


def monitor_stream(
    wire: DataFrame, queryName: str = "pii_monitor"
) -> StreamingQuery:
    """Start the monitor over a streaming wire source; counters land
    in the in-memory sink under ``queryName`` (a real deployment
    points this at its metrics sink — the aggregation is the
    contract, the sink is pluggable)."""
    return (
        pii_topic_counts(wire)
        .writeStream.format("memory")
        .queryName(queryName)
        .outputMode("complete")
        .start()
    )
