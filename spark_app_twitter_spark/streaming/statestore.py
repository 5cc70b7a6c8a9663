"""Crash-safe serving-state store for the foreachBatch maintainers.

The pre-r10 maintainers (q1serve/q3serve/scd2serve) read their state
parquet, localCheckpoint-ed, and overwrote the SAME path — a crash
mid-overwrite (delete happens before the new files land) destroyed
all accumulated state, so "exactly-once" only held for clean
foreachBatch retries. This module is the repaired contract:

  path/
    v-00000000000000000001/   <- immutable parquet snapshots
    v-00000000000000000002/
    LATEST                    <- text pointer, swapped with os.replace

A writer materializes the next snapshot into a NEW `v-{n+1}` dir
while `LATEST` still names `v-{n}`; only after the write fully
succeeds does an atomic `os.replace` move the pointer. A crash at
ANY point leaves the previous snapshot readable (the half-written
dir is garbage-collected on the next publish). Because read and
write touch DIFFERENT directories, the maintainers no longer need
localCheckpoint at all — the merge plan streams straight from the
old snapshot into the new one, and nothing accumulates in block-
manager memory across a long run.

This is the local-FS/NFS realization of the pointer-commit protocol;
an object-store deployment swaps `publish_state` for a manifest
commit (Delta/Iceberg-style) — the maintainer code is unchanged
because both expose read-snapshot / publish-snapshot.

Writers serialize through :func:`state_lock` — an exclusive advisory
flock held across the whole read-merge-publish of a foreachBatch
body. Without it, two streams sharing one state path (the q1serve
insert + RF2 delete pair) race their read-modify-write and one
stream's merge silently drops the other's delta (lost update); with
it, interleaved batches linearize. flock gives exclusion between
processes AND between driver threads (each call opens its own file
description). An object-store deployment swaps the lock + pointer
pair for a transactional manifest commit.
"""

from __future__ import annotations

import fcntl
import os
import shutil
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

_POINTER = "LATEST"
_KEEP = 2  # live snapshot + previous (in-flight readers, crash debris)


@contextmanager
def state_lock(path: str):
    """Exclusive writer lock for one state path. Hold it across the
    ENTIRE read-merge-publish (the merge plan executes inside
    publish_state, so materialization happens under the lock). A
    crash while holding it releases the flock automatically."""
    os.makedirs(path, exist_ok=True)
    lf = open(os.path.join(path, ".lock"), "w")
    try:
        fcntl.flock(lf, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(lf, fcntl.LOCK_UN)
        lf.close()


def _current_version(path: str) -> int:
    try:
        with open(os.path.join(path, _POINTER)) as fh:
            name = fh.read().strip()
        return int(name.split("-")[1]) if name else 0
    except (OSError, ValueError, IndexError):
        return 0


def read_state(spark: SparkSession, path: str, ddl: str) -> DataFrame | None:
    """The snapshot LATEST points at, or None before the first
    publish (a dangling pointer — crash debris — also reads None)."""
    n = _current_version(path)
    if n == 0:
        return None
    snap = os.path.join(path, f"v-{n:020d}")
    if not os.path.isdir(snap):
        return None
    return spark.read.schema(ddl).parquet(snap)


def publish_state(df: DataFrame, path: str) -> None:
    """Write df as the next immutable snapshot, then atomically swap
    the pointer. Old snapshots beyond _KEEP are pruned AFTER the
    swap, so a failure anywhere leaves the prior state readable."""
    os.makedirs(path, exist_ok=True)
    n = _current_version(path) + 1
    snap = f"v-{n:020d}"
    df.write.mode("overwrite").parquet(os.path.join(path, snap))
    tmp = os.path.join(path, f".{_POINTER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(snap)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(path, _POINTER))
    for name in os.listdir(path):
        if name.startswith("v-"):
            try:
                if int(name.split("-")[1]) <= n - _KEEP:
                    shutil.rmtree(os.path.join(path, name), ignore_errors=True)
            except (ValueError, IndexError):
                continue


RESERVED_STREAM = "_compacted"  # real streams must not use this id


def compact_partials(
    spark: SparkSession,
    path: str,
    ddl: str,
    group_cols: list[str],
    sum_cols: list[str],
    min_live_batch: int,
) -> None:
    """Fold per-(stream, batch_id) partial rows into one compacted
    row per group — the associativity the maintainers' docstrings
    promise — WITHOUT breaking replay idempotency.

    The exactly-once contract replaces a replayed batch's rows by
    (stream, batch_id); folding a batch that might still be replayed
    would double-count it (the replacement filter finds nothing to
    remove, then adds the batch again). So only batches STRICTLY
    BELOW ``min_live_batch`` fold — the caller passes its replay
    horizon (the streaming checkpoint's committed batch id; batches
    below it are never redelivered). Compacted mass lives under the
    RESERVED_STREAM sentinel with batch_id = -1, which (a) no real
    replacement key ever matches and (b) re-folds into later
    compactions (-1 < any horizon). Runs under the writer lock;
    state equality before/after is pinned in tests.
    """
    with state_lock(path):
        stored = read_state(spark, path, ddl)
        if stored is None:
            return
        from pyspark.sql import functions as F

        old = stored.where(F.col("batch_id") < min_live_batch)
        keep = stored.where(~(F.col("batch_id") < min_live_batch))
        types = {f.name: f.dataType for f in stored.schema.fields}
        folded = old.groupBy(*group_cols).agg(
            *[
                F.sum(c).cast(types[c]).alias(c)
                for c in sum_cols
            ]
        ).select(
            F.lit(RESERVED_STREAM).alias("stream"),
            F.lit(-1).cast("long").alias("batch_id"),
            *group_cols,
            *sum_cols,
        )
        publish_state(keep.unionByName(folded), path)
