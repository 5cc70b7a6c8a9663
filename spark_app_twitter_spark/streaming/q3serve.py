"""Streaming maintenance of TPC-H Q3 — the JOIN-BEARING IVM run
continuously: lineitem arrives as a stream, the customer/orders
dimension side is static, and each micro-batch folds
ΔL ⨝ orders ⨝ customer revenue partials into a stored per-group
partial table KEYED BY (stream, batch_id) (a foreachBatch retry
replaces its own rows and the RF2 delete stream owns a separate
batch_id namespace — the q1serve exactly-once discipline). The
serving read merges per-batch partials and projects the top-10
report, identical to the batch query over all rows seen. State
publication goes through streaming/statestore.py (immutable
snapshot + atomic pointer swap — crash-safe).

Scale shape: each fold joins only the BATCH against the dims (AQE
broadcasts the batch side), state is touched-groups x batches rows,
and the report derivation is a group-keyed merge + TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from spark_app_twitter_spark.operators.tpch import _money, _one_minus
from spark_app_twitter_spark.sources.parquet import load_table
from spark_app_twitter_spark.streaming.statestore import (
    read_state,
    transact,
)

_Q3_PARTIAL_DDL = (
    "stream string, batch_id long, l_orderkey bigint, "
    "o_orderdate timestamp, "
    "o_orderpriority string, rev decimal(38,4), cnt long"
)


def _q3_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filtered customer ⨝ orders dimension side (static)."""
    cutoff = F.lit("1998-06-15").cast("timestamp")
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cutoff)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )


def q3_batch_partials(
    batch: DataFrame, dims: DataFrame
) -> DataFrame:
    """One lineitem batch's revenue partials through the dim join."""
    cutoff = F.lit("1998-06-15").cast("timestamp")
    lx = batch.where(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        dims.join(lx, dims.o_orderkey == lx.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
            .cast("decimal(38,4)")
            .alias("rev"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


def apply_q3_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    sf_dir: str,
    sign: int = 1,
    stream: str | None = None,
) -> None:
    """foreachBatch body: upsert this batch's partials by
    (stream, batch_id) — retries replace their own rows; the insert
    and delete streams each own a batch_id namespace (default ids
    "ins"/"del" by sign). ``sign=-1`` folds a DELETE batch (RF2
    through the join): its revenue partials and row counts enter
    negated; groups whose merged count reaches zero drop from the
    report on read."""
    spark = batch.sparkSession
    sid = stream if stream is not None else ("ins" if sign >= 0 else "del")
    sgn = F.lit(sign).cast("decimal(38,4)")
    delta = q3_batch_partials(batch, _q3_dims(spark, sf_dir)).select(
        F.lit(sid).alias("stream"),
        F.lit(batch_id).cast("long").alias("batch_id"),
        "l_orderkey",
        "o_orderdate",
        "o_orderpriority",
        (F.col("rev") * sgn).cast("decimal(38,4)").alias("rev"),
        (F.col("cnt") * F.lit(sign)).cast("long").alias("cnt"),
    )
    # the insert and delete streams share this path — transact
    # serializes their read-merge-publish (q1serve discipline: flock
    # or optimistic manifest commit, per the path's realization)
    def merge(stored: DataFrame | None) -> DataFrame:
        if stored is None:
            return delta
        return stored.where(
            ~(
                (F.col("stream") == sid)
                & (F.col("batch_id") == batch_id)
            )
        ).unionByName(delta)

    transact(spark, path, _Q3_PARTIAL_DDL, merge)


def q3_report_from_partials(spark: SparkSession, path: str) -> DataFrame:
    """Merge per-batch partials and project the top-10 report —
    identical columns and ordering to q3_shipping_priority."""
    stored = read_state(spark, path, _Q3_PARTIAL_DDL)
    if stored is None:
        stored = spark.createDataFrame([], _Q3_PARTIAL_DDL)
    return (
        stored
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev").alias("rev"), F.sum("cnt").alias("cnt"))
        # fully-retracted groups vanish, as a recompute would drop
        # them (the q3_retraction HAVING)
        .where(F.col("cnt") > 0)
        .select(
            "l_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.col("rev").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def maintain_q3_stream(
    lineitem: DataFrame,
    path: str,
    checkpoint: str,
    sf_dir: str,
    trigger_available_now: bool = False,
    sign: int = 1,
    stream: str | None = None,
) -> StreamingQuery:
    """Continuous Q3 maintenance over a lineitem stream; a second
    query with ``sign=-1`` (own checkpoint) folds RF2 deletes."""
    w = (
        lineitem.writeStream.foreachBatch(
            lambda b, i: apply_q3_batch(
                b, i, path, sf_dir, sign=sign, stream=stream
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
