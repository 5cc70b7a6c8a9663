"""Streaming maintenance of the SCD2 dimension table.

The batch operator (operators/versioning.py scd2_user_attr) rebuilds
the whole history; a serving deployment maintains it incrementally:
each micro-batch recomputes history ONLY for the users it touches,
merging the STORED change rows (which are themselves the collapsed
observation stream — change_event_id preserves the original
tie-break key) with the batch's new observations. Untouched users'
rows are carried over verbatim, so maintenance cost tracks the
micro-batch, not the dimension.

Correctness contract: exact equality with the batch rebuild holds
when each user's observations arrive in event-time order ACROSS
micro-batches (the watermark discipline every other streaming
operator here assumes); order WITHIN a batch is free. A late
observation older than a stored change would need the full
observation log to replay — that is the batch operator's job, the
same split as dedup_incremental vs dedup_exact. Idempotent under
batch replay: re-applying a batch merges observations that are
already the stored change rows, and the collapse rule absorbs them
(pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from spark_app_twitter_spark.operators.versioning import (
    scd2_from_observations,
)

_HIST_DDL = (
    "user_id long, attr_k int, valid_from timestamp, "
    "valid_to timestamp, version int, is_current boolean, "
    "change_event_id long"
)


def apply_scd2_batch(batch: DataFrame, batch_id: int, path: str) -> None:
    """foreachBatch body: per-user incremental SCD2 upsert."""
    spark = batch.sparkSession
    obs = batch.select(
        "user_id", "attr_k", "ts", "event_id"
    ).dropDuplicates(["user_id", "event_id"])
    try:
        stored = spark.read.schema(_HIST_DDL).parquet(path)
    except Exception as e:
        err_class = ""
        for attr in ("getCondition", "getErrorClass"):
            fn = getattr(e, attr, None)
            if callable(fn):
                try:
                    err_class = fn() or ""
                    break
                except Exception:
                    pass
        if "PATH_NOT_FOUND" not in err_class and (
            "Path does not exist" not in str(e)
        ):
            raise
        stored = None
    if stored is None:
        out = scd2_from_observations(obs)
    else:
        touched = obs.select("user_id").distinct()
        rest = stored.join(touched, "user_id", "left_anti")
        prior_obs = stored.join(touched, "user_id", "left_semi").select(
            "user_id",
            "attr_k",
            F.col("valid_from").alias("ts"),
            F.col("change_event_id").alias("event_id"),
        )
        merged = prior_obs.unionByName(obs)
        out = rest.unionByName(scd2_from_observations(merged))
    out = out.localCheckpoint(eager=True)
    out.write.mode("overwrite").parquet(path)


def maintain_scd2_stream(
    events: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Streaming SCD2 maintenance: project the observation columns
    (props.k as the tracked attribute) and upsert per micro-batch."""
    obs = events.select(
        "user_id",
        F.get_json_object("props", "$.k").cast("int").alias("attr_k"),
        "ts",
        "event_id",
    )
    w = (
        obs.writeStream.foreachBatch(
            lambda b, i: apply_scd2_batch(b, i, path)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
