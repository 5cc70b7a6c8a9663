"""Streaming maintenance of the per-source quality-score histogram —
the quality-floor calibration (operators/textstats.py
quality_floor_by_source) run CONTINUOUSLY over the document ingest.

The histogram is the ideal streaming state: per-batch (source,
bucket) counts are integer-additive, so the stored state after any
prefix of batches equals the one-pass batch histogram bit-for-bit,
and the serving read derives the per-source floors from the merged
counts through the SAME read-off the batch query uses
(quality_floor_from_hist — one definition, no fork). This is the
q1serve partial-fold discipline applied to a data-quality sketch:
per-batch rows are keyed by (stream, batch_id) so a foreachBatch
retry REPLACES its own rows instead of double-counting, and a
compaction may fold old batches into one row at any time without
changing the report (associativity).

Why a 100 TB deployment wants this: the quality floor drifts as
crawl composition shifts; recomputing the batch calibration rescans
the corpus, while this maintainer touches only each micro-batch and
keeps state at |streams| x |batches| x |sources| x (GRID+1) rows.

State publication goes through streaming/statestore.py (immutable
snapshot + atomic pointer swap / optimistic manifest commit), so a
crash mid-write leaves the previous state readable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from spark_app_twitter_spark.operators.textstats import (
    quality_floor_from_hist,
    quality_hist_frame,
)
from spark_app_twitter_spark.functions.caches import register_cache
from spark_app_twitter_spark.streaming.statestore import (
    read_state,
    transact,
)

_HIST_DDL = "stream string, batch_id long, source string, bucket int, c long"

# (applicationId, sf_dir, n_batches) -> served floors frame; the
# replay twins fold once per session and share the serve. The
# checkpointed hist is cached SEPARATELY so clear_session_caches'
# unpersist_frame hits the LogicalRDD frame itself (releasing the
# outer serve frame would not free the inner checkpoint blocks).
_REPLAY_SERVES = register_cache({})
_REPLAY_HISTS = register_cache({})

# Batches older than this many behind the current one fold into the
# (stream, batch_id=-1) sentinel row inside merge() — keeping state
# bounded at |streams| x (RETAIN+1) x |sources| x (GRID+1) rows
# regardless of stream age (ADVICE r12: without compaction, each
# transact() rewrote a snapshot growing linearly with n_batches).
# Recent batch_ids stay individually keyed so a checkpoint-recovery
# replay still REPLACES its own rows; Structured Streaming replays
# only the trailing uncommitted batch, so RETAIN=16 is generous.
COMPACT_RETAIN = 16
_SENTINEL = -1


def _fold_hist_delta(
    spark, delta: DataFrame, batch_id: int, path: str, stream: str
) -> None:
    """Fold one batch's (stream, batch_id, source, bucket, c) delta
    into the histogram state — the transact body shared by the
    foreachBatch maintainer and the replay twin. Replaces the
    batch's own (stream, batch_id) rows (exactly-once under
    retries); batches aged past COMPACT_RETAIN fold into the
    sentinel row (associative integer sums — the report is unchanged
    by construction, pinned in test_streaming)."""

    def merge(stored: DataFrame | None) -> DataFrame:
        if stored is None:
            return delta
        kept = stored.where(
            ~(
                (F.col("stream") == stream)
                & (F.col("batch_id") == batch_id)
            )
        )
        cutoff = batch_id - COMPACT_RETAIN
        aged = (F.col("stream") == stream) & (F.col("batch_id") < cutoff)
        folded = (
            kept.where(aged)  # includes the previous sentinel row
            .groupBy("source", "bucket")
            .agg(F.sum("c").cast("long").alias("c"))
            .select(
                F.lit(stream).alias("stream"),
                F.lit(_SENTINEL).cast("long").alias("batch_id"),
                "source",
                "bucket",
                "c",
            )
        )
        return kept.where(~aged).unionByName(folded).unionByName(delta)

    transact(spark, path, _HIST_DDL, merge)


def apply_quality_batch(
    batch: DataFrame, batch_id: int, path: str, stream: str = "docs"
) -> None:
    """foreachBatch body: upsert one document batch's (source,
    bucket) counts under its (stream, batch_id) key — exactly-once
    under retries, multi-stream-safe under distinct stream ids (two
    ingest feeds folding into one calibration state keep their own
    batch_id namespaces)."""
    spark = batch.sparkSession
    delta = quality_hist_frame(batch).select(
        F.lit(stream).alias("stream"),
        F.lit(batch_id).cast("long").alias("batch_id"),
        "source",
        "bucket",
        F.col("c").cast("long").alias("c"),
    )
    _fold_hist_delta(spark, delta, batch_id, path, stream)


def quality_floor_from_state(
    spark, path: str, materialized: list | None = None
) -> DataFrame:
    """The serving read: merge the per-batch histogram rows (integer
    sum per (source, bucket)) and run the SAME quantile read-off the
    batch query uses — after folding the full corpus, this equals
    quality_floor_by_source bit-for-bit (pinned in
    tests/test_streaming.py).

    ``materialized`` is the bm25serve release seam (r14 ADVICE): the
    merged histogram is localCheckpoint-ed for the multi-branch
    quantile read, and checkpoint blocks outlive DataFrame.unpersist
    — a long-lived caller (a per-batch serving loop) passes a list,
    reads the result, then releases via
    ``functions.caches.unpersist_frame`` in a finally."""
    stored = read_state(spark, path, _HIST_DDL)
    if stored is None:
        stored = spark.createDataFrame([], _HIST_DDL)
    hist = (
        stored.groupBy("source", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
        .where(F.col("c") > 0)
        # |sources| x (GRID+1)-bounded; the quantile read-off consumes
        # it from several branches — checkpoint once instead of
        # re-reading the state snapshot per branch (12 -> 3 scans)
        .localCheckpoint(eager=False)
    )
    if materialized is not None:
        materialized.append(hist)
    return quality_floor_from_hist(hist)


def quality_floor_replayed(
    spark, sf_dir: str, n_batches: int = 3
) -> DataFrame:
    """Batch-drivable registry twin (VERDICT r13 item 6): fold the
    documents corpus through :func:`apply_quality_batch` in
    ``n_batches`` modular micro-batches against a fresh state dir,
    then serve :func:`quality_floor_from_state`. The histogram fold
    is integer-additive, so the served floors equal the one-pass
    batch calibration (operators/textstats.quality_floor_by_source)
    bit-for-bit — putting the quality-floor stream under the driver's
    DuckDB oracle gate (oracle: QUALITY_FLOOR_BY_SOURCE_SQL).

    The state dir is REUSED per (applicationId, sf_dir, n_batches)
    and the served frame is session-cached (r14 ADVICE: the old
    per-call mkdtemp leaked one state dir AND one hist checkpoint per
    bench/oracle invocation); eviction goes through the
    register_cache umbrella, which unpersist_frame-releases the
    cached serve's checkpoint blocks.

    r16 (VERDICT r15 item 7 / guide §1.2): ALL per-batch deltas come
    from ONE corpus pass — the histogram is grouped by the modular
    batch key alongside (source, bucket) and lazily checkpointed, so
    each fold filters its own batch's rows out of the tiny
    checkpointed table instead of re-scanning + re-scoring the whole
    documents parquet per batch (3 corpus tokenize+score passes → 1;
    counting commutes with partitioning the rows, so the per-batch
    rows are bit-identical). The fold order, the per-batch transact
    publishes and the replace-by-(stream, batch_id) idempotence are
    unchanged — the state dir goes through the same per-batch
    snapshots as before. The TRUE streaming path
    (apply_quality_batch) still builds its delta from its own
    micro-batch."""
    from spark_app_twitter_spark.functions.caches import unpersist_frame
    from spark_app_twitter_spark.sources.parquet import load_table
    from spark_app_twitter_spark.streaming.statestore import (
        replay_state_dir,
    )

    key = (spark.sparkContext.applicationId, sf_dir, n_batches)
    hit = _REPLAY_SERVES.get(key)
    if hit is not None:
        return hit
    path = replay_state_dir(spark, "qualitymon", sf_dir, n_batches)
    docs = load_table(spark, sf_dir, "documents")
    stream = "docs"
    deltas = quality_hist_frame(
        docs,
        group_extra=(
            ("batch_id", (F.col("doc_id") % n_batches).cast("long")),
        ),
    ).localCheckpoint(eager=False)
    try:
        for i in range(n_batches):
            delta = deltas.where(F.col("batch_id") == i).select(
                F.lit(stream).alias("stream"),
                F.lit(i).cast("long").alias("batch_id"),
                "source",
                "bucket",
                F.col("c").cast("long").alias("c"),
            )
            _fold_hist_delta(spark, delta, i, path, stream)
    finally:
        # the folds are the only consumers of the delta checkpoint —
        # the served frame reads the published state snapshots
        unpersist_frame(deltas)
    mats: list[DataFrame] = []
    served = quality_floor_from_state(spark, path, materialized=mats)
    _REPLAY_SERVES[key] = served
    if mats:
        _REPLAY_HISTS[key] = mats[0]
    return served


def maintain_quality_stream(
    docs: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = False,
    stream: str = "docs",
) -> StreamingQuery:
    """Continuous quality-histogram maintenance over a document
    stream (any relation carrying ``source`` and ``text``)."""
    w = (
        docs.writeStream.foreachBatch(
            lambda b, i: apply_quality_batch(b, i, path, stream=stream)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
