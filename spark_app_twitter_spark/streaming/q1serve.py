"""Streaming maintenance of the TPC-H Q1 pricing summary.

The IVM discipline (operators/tpch.py q1_incremental) run
CONTINUOUSLY: each micro-batch of lineitem rows computes the
standard map-side DECIMAL partials and MERGES them into a stored
partial table (sum of sums per group — exact and associative, so
the stored state after any prefix of batches equals the partials of
all rows seen, bit-for-bit). The serving report derives averages
from the merged sums on read, exactly like the batch query.

This is the shape a 100-TB deployment actually runs: the fact
stream never rescans, state is |groups| x |batches| rows (the
per-batch partials are KEYED BY (stream, batch_id) — each stream,
e.g. the insert stream and the RF2 delete stream, owns its own
batch_id namespace, so a foreachBatch retry REPLACES its own rows
instead of double-counting AND a delete stream restarting at
batch_id 0 cannot clobber insert batch 0); the serving read merges
the per-batch rows. A compaction job may fold old batches into one
row at any time without changing the report (associativity). State
publication goes through streaming/statestore.py — immutable
snapshot + atomic pointer swap, so a crash mid-write leaves the
previous state readable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from spark_app_twitter_spark.operators.tpch import (
    _money,
    _one_minus,
    _one_plus,
    _PRICE,
    _RATE,
)
from spark_app_twitter_spark.streaming.statestore import (
    read_state,
    transact,
)

_PARTIAL_DDL = (
    "stream string, batch_id long, l_returnflag string, "
    "l_linestatus string, "
    "sq decimal(38,2), sbp decimal(38,2), sdp decimal(38,6), "
    "sch decimal(38,6), sdisc decimal(38,2), cnt long"
)


def q1_partials(batch: DataFrame) -> DataFrame:
    """The map-side DECIMAL partials of one lineitem batch — the
    same aggregates q1_incremental's partial() computes."""
    disc_price = _money("l_extendedprice") * _one_minus("l_discount")
    charge = disc_price * _one_plus("l_tax")
    src = batch.where(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    return src.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_PRICE)).alias("sq"),
        F.sum(_money("l_extendedprice")).alias("sbp"),
        F.sum(disc_price).alias("sdp"),
        F.sum(charge).alias("sch"),
        F.sum(F.col("l_discount").cast(_RATE)).alias("sdisc"),
        F.count(F.lit(1)).alias("cnt"),
    )


def apply_q1_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    sign: int = 1,
    stream: str | None = None,
) -> None:
    """foreachBatch body: upsert one batch's partials under its
    (stream, batch_id) — a retry of the same batch REPLACES its own
    rows, so the fold is exactly-once, and two streams sharing the
    state (inserts + the RF2 delete stream, each with its OWN
    batch_id counter) can never replace each other's partials.
    ``sign=-1`` folds a DELETE batch: its partials enter negated,
    exactly the q1_retraction math, and groups whose merged count
    reaches zero drop out of the report on read. ``stream`` defaults
    to "ins"/"del" by sign; pass explicit ids when running several
    streams of the same sign."""
    spark = batch.sparkSession
    sid = stream if stream is not None else ("ins" if sign >= 0 else "del")
    sgn = F.lit(sign).cast("decimal(38,6)")
    raw = q1_partials(batch)
    delta = raw.select(
        F.lit(sid).alias("stream"),
        F.lit(batch_id).cast("long").alias("batch_id"),
        "l_returnflag",
        "l_linestatus",
        (F.col("sq") * sgn).cast("decimal(38,2)").alias("sq"),
        (F.col("sbp") * sgn).cast("decimal(38,2)").alias("sbp"),
        (F.col("sdp") * sgn).cast("decimal(38,6)").alias("sdp"),
        (F.col("sch") * sgn).cast("decimal(38,6)").alias("sch"),
        (F.col("sdisc") * sgn).cast("decimal(38,2)").alias("sdisc"),
        (F.col("cnt") * F.lit(sign)).cast("long").alias("cnt"),
    )
    # transact serializes concurrent writers (the insert and delete
    # streams sharing this path) across the whole read-merge-publish
    # — flock on the pointer realization, optimistic manifest commit
    # on object stores; without either, interleaved batches lose
    # updates. The merge is a pure function of the stored state
    # (replace-by-(stream,batch_id)), so a conflict retry is safe.
    def merge(stored: DataFrame | None) -> DataFrame:
        if stored is None:
            return delta
        # read (old snapshot) and write (new snapshot) are different
        # directories, so the merge plan streams directly — no
        # localCheckpoint, nothing pinned in block-manager memory
        return stored.where(
            ~(
                (F.col("stream") == sid)
                & (F.col("batch_id") == batch_id)
            )
        ).unionByName(delta)

    transact(spark, path, _PARTIAL_DDL, merge)


def q1_report_from_partials(spark, path: str) -> DataFrame:
    """The serving read: derive the Q1 report (sums + averages) from
    the stored partials — identical projection to the batch query."""
    stored = read_state(spark, path, _PARTIAL_DDL)
    if stored is None:
        stored = spark.createDataFrame([], _PARTIAL_DDL)
    p = (
        stored
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("sq").cast("decimal(38,2)").alias("sq"),
            F.sum("sbp").cast("decimal(38,2)").alias("sbp"),
            F.sum("sdp").cast("decimal(38,6)").alias("sdp"),
            F.sum("sch").cast("decimal(38,6)").alias("sch"),
            F.sum("sdisc").cast("decimal(38,2)").alias("sdisc"),
            F.sum("cnt").cast("long").alias("cnt"),
        )
        # a fully-retracted group vanishes, as a recompute would
        # drop it (the q1_retraction HAVING)
        .where(F.col("cnt") > 0)
    )
    return p.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sq").cast("double").alias("sum_qty"),
        F.col("sbp").cast("double").alias("sum_base_price"),
        F.col("sdp").cast("double").alias("sum_disc_price"),
        F.col("sch").cast("double").alias("sum_charge"),
        (F.col("sq").cast("double") / F.col("cnt")).alias("avg_qty"),
        (F.col("sbp").cast("double") / F.col("cnt")).alias("avg_price"),
        (F.col("sdisc").cast("double") / F.col("cnt")).alias("avg_disc"),
        F.col("cnt").alias("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


def maintain_q1_stream(
    lineitem: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = False,
    sign: int = 1,
    stream: str | None = None,
) -> StreamingQuery:
    """Continuous Q1 maintenance over a lineitem stream; start a
    second query with ``sign=-1`` (its own checkpoint) to fold an
    RF2 delete stream into the same state path."""
    w = (
        lineitem.writeStream.foreachBatch(
            lambda b, i: apply_q1_batch(b, i, path, sign=sign, stream=stream)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
