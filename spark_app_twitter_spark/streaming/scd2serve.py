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
same split as dedup_incremental vs dedup_exact. Since r10 the
violation is DETECTED, not silent: every batch counts the users
whose incoming min(ts) predates their newest stored change and
appends them to a `late-audit` side log next to the state (the
dead-letter channel a replay job drains); the merge itself still
proceeds so the serving table stays available. Idempotent under
batch replay INCLUDING the audit channel: re-applying a batch merges
observations that are already the stored change rows (or sit inside
a stored same-attribute interval), the collapse rule absorbs them,
and the late detector excludes such no-ops BEFORE computing min(ts),
so a replay flags nobody (pinned in tests). State publication goes through
streaming/statestore.py (immutable snapshot + atomic pointer swap).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from spark_app_twitter_spark.operators.versioning import (
    scd2_from_observations,
)
from spark_app_twitter_spark.streaming.statestore import (
    NoChange,
    read_state,
    transact,
)

_HIST_DDL = (
    "user_id long, attr_k int, valid_from timestamp, "
    "valid_to timestamp, version int, is_current boolean, "
    "change_event_id long"
)
_LATE_DDL = "batch_id long, user_id long, min_ts timestamp"
_LATE_DIR = "late-audit"


def apply_scd2_batch(batch: DataFrame, batch_id: int, path: str) -> None:
    """foreachBatch body: per-user incremental SCD2 upsert, with
    out-of-order arrivals routed to the late-audit dead letter. Runs
    as one transact (flock or optimistic manifest commit).

    Audit-channel durability (ADVICE r11): the late flags are written
    INSIDE the merge, BEFORE the state commit, as a non-empty-only
    overwrite of the batch's own ``late-audit/batch_id=N/`` partition
    (see _write_late for the empty-recompute rule). Writing after the
    commit was at-most-once — a crash in the gap lost the flags
    forever, because on foreachBatch replay the merged observations
    are absorbed and the detector (correctly) flags nobody. The keyed
    overwrite makes the write idempotent instead: a retry of a FAILED
    merge recomputes against the same state and overwrites the same
    partition with the same rows; a replay of a MERGED batch computes
    empty and leaves the flags standing. The channel is at-least-once
    with convergent contents. This is the documented exception to
    "merge_fn is side-effect-free": the side effect is
    keyed-idempotent, so retries converge.
    """
    spark = batch.sparkSession
    obs = batch.select(
        "user_id", "attr_k", "ts", "event_id"
    ).dropDuplicates(["user_id", "event_id"])
    transact(
        spark,
        path,
        _HIST_DDL,
        lambda stored: _merged_history(spark, obs, batch_id, stored, path),
    )


def _write_late(late: DataFrame, path: str, batch_id: int) -> None:
    """Overwrite this batch's late-audit partition (data carries
    (user_id, min_ts); batch_id is the partition directory) — but
    ONLY when the worklist is non-empty. An empty recompute must not
    clear flags a previous attempt legitimately raised: a post-commit
    foreachBatch replay absorbs the batch's observations and computes
    an empty worklist, and clearing on it would re-open the
    at-most-once hole from the other side. Over-flagging (a stale
    conflict-retry attempt's flags surviving a winning merge that
    absorbed them) is harmless — the replay repair is an idempotent
    full rebuild; under-flagging is the bug. Flags are cleared only
    by the replay drain (scd2_replay_late_users)."""
    rows = late.localCheckpoint(eager=True)  # |touched|-bounded
    try:
        if rows.limit(1).count():
            rows.select("user_id", "min_ts").write.mode(
                "overwrite"
            ).parquet(os.path.join(path, _LATE_DIR, f"batch_id={batch_id}"))
    finally:
        from spark_app_twitter_spark.functions.caches import unpersist_frame

        unpersist_frame(rows)  # per-batch checkpoint blocks (r14)


def _merged_history(
    spark,
    obs: DataFrame,
    batch_id: int,
    stored: DataFrame | None,
    path: str,
) -> DataFrame:
    if stored is None:
        return scd2_from_observations(obs)
    touched = obs.select("user_id").distinct()
    rest = stored.join(touched, "user_id", "left_anti")
    prior = stored.join(touched, "user_id", "left_semi")
    # contract violation detector: an incoming observation that is
    # (a) older than the user's newest stored change AND (b) not a
    # NO-OP means the collapsed change rows cannot reproduce the full
    # rebuild — emit the user to the audit log (replay worklist)
    # instead of merging silently. No-ops are excluded FIRST so a
    # foreachBatch replay of an already-merged batch (crash retry)
    # leaves the audit channel empty, extending the idempotency
    # contract to the audit (ADVICE r10): an observation is absorbed
    # if it IS a stored change row (same event_id) or falls inside a
    # stored interval carrying the SAME attribute value (the collapse
    # rule discards it identically on a full rebuild — and a same-ts
    # smaller-event_id tie is re-collapsed by the merge below).
    # |touched|-sized, batch-keyed (idempotent on read via
    # dropDuplicates).
    o, p = obs.alias("o"), prior.alias("p")
    absorbed = (F.col("o.user_id") == F.col("p.user_id")) & (
        (F.col("o.event_id") == F.col("p.change_event_id"))
        | (
            (F.col("o.attr_k") == F.col("p.attr_k"))
            & (F.col("o.ts") >= F.col("p.valid_from"))
            & (
                F.col("p.valid_to").isNull()
                | (F.col("o.ts") < F.col("p.valid_to"))
            )
        )
    )
    fresh = o.join(p, absorbed, "left_anti")
    newest = prior.groupBy("user_id").agg(
        F.max("valid_from").alias("max_vf")
    )
    incoming_min = fresh.groupBy("user_id").agg(
        F.min("ts").alias("min_ts")
    )
    late = (
        incoming_min.join(newest, "user_id")
        .where(F.col("min_ts") < F.col("max_vf"))
        .select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            "user_id",
            "min_ts",
        )
    )
    # pre-commit idempotent write (see apply_scd2_batch's docstring):
    # |touched|-bounded, keyed to this batch's partition
    _write_late(late, path, batch_id)
    prior_obs = prior.select(
        "user_id",
        "attr_k",
        F.col("valid_from").alias("ts"),
        F.col("change_event_id").alias("event_id"),
    )
    merged = prior_obs.unionByName(obs)
    return rest.unionByName(scd2_from_observations(merged))


def scd2_table(spark: SparkSession, path: str) -> DataFrame:
    """The serving read: the current SCD2 dimension snapshot
    (empty with the right schema before the first publish)."""
    stored = read_state(spark, path, _HIST_DDL)
    if stored is None:
        return spark.createDataFrame([], _HIST_DDL)
    return stored


def scd2_late_audit(spark: SparkSession, path: str) -> DataFrame:
    """(batch_id, user_id, min_ts): users whose history needs a full
    replay — the dead-letter worklist. Empty before any violation."""
    d = os.path.join(path, _LATE_DIR)
    if not os.path.isdir(d) or not any(
        n.startswith("batch_id=") for n in os.listdir(d)
    ):
        return spark.createDataFrame([], _LATE_DDL)
    # batch_id comes from the partition directories (the r12 keyed-
    # overwrite layout); data files carry (user_id, min_ts)
    return (
        spark.read.schema(_LATE_DDL)
        .parquet(d)
        .select("batch_id", "user_id", "min_ts")
        .dropDuplicates(["batch_id", "user_id"])
    )


def scd2_replay_late_users(
    spark: SparkSession, observations: DataFrame, path: str
) -> int:
    """Drain the late-audit dead letter: rebuild every flagged
    user's history from the FULL observation log (the batch
    operator's semantics — the repair the audit docstring promises)
    and swap it into the state. After the drain the flagged users'
    rows equal the batch rebuild exactly; untouched users' rows are
    carried verbatim. Returns the number of users replayed.

    ``observations`` is the full (user_id, attr_k, ts, event_id)
    log — the corpus-side relation the incremental path deliberately
    avoids and this repair job deliberately reads. All cohort
    filtering is join-based (left_semi/left_anti on the worklist),
    never a collected id list, so the job survives a large backlog.
    Runs as one transact; only the audit FILES captured before the
    merge are cleared, and only after the repaired state publishes —
    a crash mid-replay leaves the worklist intact for a retry, and a
    concurrent stream's fresh audit appends survive the clear."""
    if read_state(spark, path, _HIST_DDL) is None:
        return 0
    # empty-worklist fast path: the steady-state poll must not
    # publish (a publish rewrites the full dimension as a new
    # snapshot and burns a version); the worklist is re-read inside
    # the merge, so a flag landing between this check and the
    # transact is simply picked up by the next poll
    if scd2_late_audit(spark, path).limit(1).count() == 0:
        return 0
    late_dir = os.path.join(path, _LATE_DIR)
    state = {"n": 0, "files": []}

    def merge(stored: DataFrame | None) -> DataFrame:
        # capture the audit partitions this replay covers BEFORE
        # reading the worklist — a partition written after this
        # listing may still be read (over-replay is harmless) but is
        # never cleared unprocessed
        try:
            state["files"] = [
                os.path.join(late_dir, f)
                for f in os.listdir(late_dir)
                if f.startswith("batch_id=")
            ]
        except OSError:
            state["files"] = []
        uids = (
            scd2_late_audit(spark, path)
            .select("user_id")
            .distinct()
            .localCheckpoint(eager=True)  # three consumers
        )
        state["uids"] = uids  # released after the transact (r14)
        state["n"] = uids.count()
        if state["n"] == 0 or stored is None:
            # signal "no change" instead of returning the stored
            # frame: transact would otherwise publish a full new
            # snapshot (burning a version, rewriting the whole
            # dimension) for a worklist that emptied between the
            # caller's fast path and this merge (ADVICE r11)
            raise NoChange()
        flagged = (
            observations.join(uids, "user_id", "left_semi")
            .select("user_id", "attr_k", "ts", "event_id")
            .dropDuplicates(["user_id", "event_id"])
        )
        rest = stored.join(uids, "user_id", "left_anti")
        return rest.unionByName(scd2_from_observations(flagged))

    try:
        transact(spark, path, _HIST_DDL, merge)
    finally:
        if state.get("uids") is not None:
            from spark_app_twitter_spark.functions.caches import (
                unpersist_frame,
            )

            unpersist_frame(state["uids"])
    if state["n"]:
        for f in state["files"]:
            shutil.rmtree(f, ignore_errors=True)
    return state["n"]


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
