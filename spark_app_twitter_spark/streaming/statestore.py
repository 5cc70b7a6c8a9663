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

TWO realizations of the read-snapshot / publish-snapshot seam ship,
selected per path (auto-detected from the on-disk layout) or
globally via ``SPARK_GRAFT_STATE_BACKEND``:

``pointer`` (local FS / NFS): the layout above. Writers serialize
through :func:`state_lock` — an exclusive advisory flock held across
the whole read-merge-publish of a foreachBatch body. Without it, two
streams sharing one state path (the q1serve insert + RF2 delete
pair) race their read-modify-write and one stream's merge silently
drops the other's delta (lost update); with it, interleaved batches
linearize. flock gives exclusion between processes AND between
driver threads (each call opens its own file description).

``manifest`` (object store): no shared lock exists across drivers,
so writers use OPTIMISTIC concurrency, Delta/Iceberg-style:

  path/
    v-<version>-<uuid>/       <- immutable snapshots, writer-unique
    _manifests/
      m-00000000000000000001  <- commit records, one per version,
                                 created with put-if-absent

A writer reads the highest manifest (version n), merges, writes its
snapshot under a writer-unique name, then commits by creating
manifest n+1 with a PUT-IF-ABSENT — realized locally as
``os.link(tmp, m-{n+1})`` (atomic, fails-if-exists, full-content —
the same contract as S3 If-None-Match / GCS x-goods-if-generation-0).
Exactly one of two racing writers wins the link; the loser raises
:class:`CommitConflict`, re-reads the NEW state, re-merges, and
retries — no update is ever lost, with NO shared flock. A crash at
any point leaves the last committed manifest readable; a crash after
the snapshot write but before the link leaves an orphan snapshot dir
that :func:`vacuum_orphans` reclaims by age.

Maintainers call :func:`transact` (read-merge-publish as one unit)
so their code is realization-independent; the pointer branch wraps
the merge in the flock, the manifest branch in the optimistic loop.
"""

from __future__ import annotations

import fcntl
import os
import shutil
import time
import uuid
from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

_POINTER = "LATEST"


def _keep() -> int:
    """Snapshots retained after a publish (live + history). Default 2
    (live + previous) is the crash-debris minimum; deployments whose
    serving reads are lazy DataFrames that may collect several
    publishes later (an insert and a delete stream sharing one path
    publish twice per pair of batches) raise it via
    SPARK_GRAFT_STATE_KEEP so the snapshot a plan captured at build
    time is still on disk at action time."""
    try:
        return max(2, int(os.environ.get("SPARK_GRAFT_STATE_KEEP", "2")))
    except ValueError:
        return 2


def replay_state_dir(spark: SparkSession, kind: str, sf_dir: str,
                     n_batches: int) -> str:
    """A REUSABLE scratch state dir for the batch-drivable replay
    twins (r14 ADVICE: per-call ``tempfile.mkdtemp`` leaked one
    corpus-derived parquet state dir per bench/oracle invocation).
    Keyed by (applicationId, sf_dir, n_batches) so repeated serves in
    one session fold once and share state; a NEW driver process gets
    a fresh dir (its own applicationId), so a crash mid-fold can
    never leak partial state into another process — and within a
    process a retried fold simply re-applies the same batch_ids,
    which every transact() merge REPLACES (exactly-once by key)."""
    import hashlib
    import tempfile

    tag = hashlib.md5(
        f"{sf_dir}|{n_batches}".encode()
    ).hexdigest()[:12]
    app = spark.sparkContext.applicationId
    d = os.path.join(
        tempfile.gettempdir(), f"{kind}_replay_{app}_{tag}"
    )
    os.makedirs(d, exist_ok=True)
    return d


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


def _reject_legacy_layout(path: str) -> None:
    """A state path with parquet DATA at the top level but no LATEST
    pointer is a pre-r10 flat-parquet state dir (the layout the
    maintainers wrote before the snapshot store existed). Silently
    reading it as "no state" would restart every fold from empty and
    double-count on the next replay — fail loudly with the migration
    recipe instead (ADVICE r10)."""
    try:
        names = os.listdir(path)
    except OSError:
        return
    legacy = [
        n
        for n in names
        if n == "_SUCCESS"
        or (n.startswith("part-") and ".parquet" in n)
    ]
    if legacy:
        raise RuntimeError(
            f"state path {path!r} holds a legacy flat-parquet layout "
            f"({legacy[:3]}...): migrate it by reading the flat files "
            "and publish_state()-ing them once, then delete the flat "
            "files — refusing to silently treat accumulated state as "
            "empty"
        )


def read_state(spark: SparkSession, path: str, ddl: str) -> DataFrame | None:
    """The latest committed snapshot, or None before the first
    publish — realization-dispatching: a path with a `_manifests/`
    commit log reads via the manifest backend, otherwise via the
    LATEST pointer (a dangling pointer — crash debris — also reads
    None). A pre-snapshot-store flat-parquet layout raises instead of
    reading as empty (see _reject_legacy_layout); so does a path
    carrying BOTH layouts."""
    has_manifests = os.path.isdir(os.path.join(path, _MANIFEST_DIR))
    n = _current_version(path)
    if has_manifests:
        if n:
            raise RuntimeError(
                f"state path {path!r} has BOTH a LATEST pointer and a "
                "_manifests/ commit log — one path, one realization"
            )
        # churn retry: between listing the max manifest and opening
        # it, a burst of >= _keep() concurrent commits can prune it.
        # If the version moved, re-list; a version that holds still
        # but cannot be resolved is real corruption — raise, never
        # silently serve an empty report over existing state.
        for _ in range(8):
            v = _manifest_version(path)
            if v == 0:
                return None
            df = _read_manifest_state(spark, path, ddl, v)
            if df is not None:
                return df
            if _manifest_version(path) == v:
                raise RuntimeError(
                    f"state path {path!r}: manifest m-{v} exists but "
                    "its snapshot is unreadable — corrupted commit"
                )
        raise RuntimeError(
            f"state path {path!r}: manifest churn outran 8 read "
            "retries — raise SPARK_GRAFT_STATE_KEEP"
        )
    if n == 0:
        _reject_legacy_layout(path)
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
    # fsync the DIRECTORY so the rename itself is durable: without
    # it a power loss can revert the pointer to the previous snapshot
    # while Spark's streaming checkpoint commit for the same batch
    # survived — the committed batch's fold would vanish and never be
    # redelivered (machine-crash exactly-once, not just process-crash)
    dfd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    keep = _keep()
    for name in os.listdir(path):
        if name.startswith("v-"):
            try:
                if int(name.split("-")[1]) <= n - keep:
                    shutil.rmtree(os.path.join(path, name), ignore_errors=True)
            except (ValueError, IndexError):
                continue


# --- manifest realization (object-store pattern, local put-if-absent)

_MANIFEST_DIR = "_manifests"


class CommitConflict(Exception):
    """Another writer committed this version first — re-read the new
    state, re-merge, retry (the optimistic loop in transact)."""


class NoChange(Exception):
    """Raised by a merge_fn to signal the stored state needs no new
    version: transact returns WITHOUT publishing, so a no-op poll
    (e.g. an audit worklist that emptied between the caller's fast
    path and the merge) does not burn a snapshot version rewriting
    the whole dimension (ADVICE r11)."""


# FileNotFound-class markers: the snapshot-churn race (a lazily-read
# snapshot pruned by >= _keep() concurrent commits) surfaces as one
# of these, never as an arbitrary exception — a deterministic
# merge_fn bug (schema error, bad column) must NOT be retried 64
# times and reported as "commit conflicts" (ADVICE r11).
_CHURN_MARKERS = (
    "FileNotFound",
    "PATH_NOT_FOUND",
    "FILE_NOT_FOUND",
    "does not exist",
    "RDD block",
    "block of rdd",
)


def _is_churn_error(exc: Exception) -> bool:
    s = f"{type(exc).__name__}: {exc}"
    return any(m in s for m in _CHURN_MARKERS)


def _manifest_version(path: str) -> int:
    """Highest committed manifest number (the object-store LIST)."""
    mdir = os.path.join(path, _MANIFEST_DIR)
    try:
        names = os.listdir(mdir)
    except OSError:
        return 0
    best = 0
    for name in names:
        if name.startswith("m-"):
            try:
                best = max(best, int(name.split("-")[1]))
            except (ValueError, IndexError):
                continue
    return best


def _read_manifest_state(
    spark: SparkSession, path: str, ddl: str, version: int
) -> DataFrame | None:
    if version == 0:
        return None
    mfile = os.path.join(path, _MANIFEST_DIR, f"m-{version:020d}")
    try:
        with open(mfile) as fh:
            snap = fh.read().strip()
    except OSError:
        return None
    snapdir = os.path.join(path, snap)
    if not snap or not os.path.isdir(snapdir):
        return None
    return spark.read.schema(ddl).parquet(snapdir)


def _fsync_dir(d: str) -> None:
    fd = os.open(d, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _commit_manifest(
    df: DataFrame, path: str, expected_version: int
) -> None:
    """Write df as a writer-unique snapshot, then commit it as
    manifest ``expected_version + 1`` with a put-if-absent. Raises
    CommitConflict (snapshot becomes age-reclaimable debris) if any
    other writer committed that version first. Prunes snapshots
    superseded beyond the retention window AFTER the commit."""
    n = expected_version + 1
    mdir = os.path.join(path, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    snap = f"v-{n:020d}-{uuid.uuid4().hex[:12]}"
    df.write.mode("overwrite").parquet(os.path.join(path, snap))
    tmp = os.path.join(mdir, f".tmp-{snap}")
    with open(tmp, "w") as fh:
        fh.write(snap)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        # atomic create-if-absent with full content (the temp file is
        # already durable): exactly one racing writer wins the name
        os.link(tmp, os.path.join(mdir, f"m-{n:020d}"))
    except FileExistsError:
        raise CommitConflict(
            f"manifest m-{n} already committed by another writer"
        ) from None
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass
    _fsync_dir(mdir)
    # prune: snapshots referenced by manifests that fell out of the
    # retention window are provably superseded — safe to delete.
    # UNREFERENCED dirs are NOT touched here: they may be a racing
    # writer's not-yet-committed snapshot (vacuum_orphans handles
    # true crash debris by age).
    keep = _keep()
    for name in os.listdir(mdir):
        if not name.startswith("m-"):
            continue
        try:
            v = int(name.split("-")[1])
        except (ValueError, IndexError):
            continue
        if v <= n - keep:
            mfile = os.path.join(mdir, name)
            try:
                with open(mfile) as fh:
                    old_snap = fh.read().strip()
                if old_snap.startswith("v-"):
                    shutil.rmtree(
                        os.path.join(path, old_snap), ignore_errors=True
                    )
                os.unlink(mfile)
            except OSError:
                continue


def vacuum_orphans(path: str, min_age_seconds: float = 3600.0) -> int:
    """Reclaim uncommitted snapshot debris (a writer crashed between
    its snapshot write and its manifest link, or lost the commit
    race): delete snapshot dirs NOT referenced by any live manifest
    whose mtime is older than min_age_seconds. The age floor keeps a
    slow racing writer's in-flight snapshot safe — mirror of Delta
    VACUUM's retention check. Returns the number of dirs removed."""
    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return 0
    live = set()
    for name in os.listdir(mdir):
        if name.startswith("m-"):
            try:
                with open(os.path.join(mdir, name)) as fh:
                    live.add(fh.read().strip())
            except OSError:
                continue
    removed, now = 0, time.time()
    for name in os.listdir(path):
        if not name.startswith("v-") or name in live:
            continue
        full = os.path.join(path, name)
        try:
            if not os.path.isdir(full):
                continue
            if now - os.path.getmtime(full) < min_age_seconds:
                continue
            shutil.rmtree(full, ignore_errors=True)
            removed += 1
        except OSError:
            continue
    return removed


def backend_for(path: str) -> str:
    """'pointer' or 'manifest' for this state path: the on-disk
    layout wins (an existing log keeps its realization), else the
    SPARK_GRAFT_STATE_BACKEND env default, else pointer."""
    if os.path.isdir(os.path.join(path, _MANIFEST_DIR)):
        return "manifest"
    if _current_version(path):
        return "pointer"
    b = os.environ.get("SPARK_GRAFT_STATE_BACKEND", "pointer")
    return b if b in ("pointer", "manifest") else "pointer"


def transact(
    spark: SparkSession,
    path: str,
    ddl: str,
    merge_fn: Callable[[DataFrame | None], DataFrame],
    backend: str | None = None,
    max_retries: int = 64,
) -> None:
    """Read-merge-publish as ONE unit, realization-independent — the
    seam every maintainer's foreachBatch body goes through.

    pointer: the flock serializes writers; merge_fn runs under it.
    manifest: optimistic — read version n, merge, attempt commit of
    n+1; on CommitConflict re-read and re-merge (merge_fn must be a
    pure function of the stored state, which every maintainer's
    replace-by-(stream,batch_id) merge is — the one sanctioned
    exception is a KEYED-IDEMPOTENT side write like scd2serve's
    per-batch late-audit overwrite, where a retry's re-write
    converges). No shared lock anywhere. A merge_fn may raise
    NoChange to skip publishing entirely (no version burned).
    """
    b = backend or backend_for(path)
    if b == "pointer":
        # symmetric layout guard to the manifest branch's LATEST-
        # pointer check: publishing a pointer over an existing
        # _manifests/ commit log forks the path into both layouts
        # and every subsequent read raises (ADVICE r11)
        if os.path.isdir(os.path.join(path, _MANIFEST_DIR)):
            raise RuntimeError(
                f"state path {path!r} has a _manifests/ commit log — "
                "refusing to publish a LATEST pointer over it (one "
                "path, one realization)"
            )
        with state_lock(path):
            try:
                merged = merge_fn(read_state(spark, path, ddl))
            except NoChange:
                return
            publish_state(merged, path)
        return
    # the manifest branch must honor the same layout guards the
    # pointer read enforces: committing manifests over a LATEST
    # pointer forks the state, and committing over a pre-snapshot
    # flat-parquet dir silently restarts the fold from empty
    if _current_version(path):
        raise RuntimeError(
            f"state path {path!r} has a LATEST pointer — refusing to "
            "start a _manifests/ commit log on it (one path, one "
            "realization)"
        )
    if _manifest_version(path) == 0:
        _reject_legacy_layout(path)
    last_exc: Exception | None = None
    for _ in range(max_retries):
        v = _manifest_version(path)
        stored = _read_manifest_state(spark, path, ddl, v)
        try:
            merged = merge_fn(stored)
        except NoChange:
            return
        except Exception as exc:  # noqa: BLE001 — classified below
            # snapshot-churn race: with >= _keep() commits landing
            # between our read and the merge's own actions, the
            # snapshot the lazy `stored` plan captured may have been
            # pruned — the merge then fails with a FileNotFound-class
            # error instead of a CommitConflict. Retry ONLY that
            # class, and only if the version actually moved; a
            # deterministic merge_fn bug (schema error, bad column)
            # re-raises immediately (ADVICE r11).
            if _is_churn_error(exc) and _manifest_version(path) != v:
                last_exc = exc
                continue
            raise
        try:
            _commit_manifest(merged, path, expected_version=v)
            return
        except CommitConflict as exc:
            last_exc = exc
            continue
        except Exception as exc:  # noqa: BLE001 — classified below
            # same churn race surfacing at write time (the merged
            # plan executes inside the snapshot write)
            if _is_churn_error(exc) and _manifest_version(path) != v:
                last_exc = exc
                continue
            raise
    raise RuntimeError(
        f"transact: gave up after {max_retries} commit conflicts on "
        f"{path!r} — a writer is livelocked or retries are too low"
    ) from last_exc


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
    compactions (-1 < any horizon). Runs as one transact (flock on
    the pointer realization, optimistic commit on manifest); state
    equality before/after is pinned in tests.
    """
    if read_state(spark, path, ddl) is None:
        return

    from pyspark.sql import functions as F

    def merge(stored: DataFrame | None) -> DataFrame:
        if stored is None:  # pre-checked non-empty; belt-and-braces
            stored = spark.createDataFrame([], ddl)
        old = stored.where(F.col("batch_id") < min_live_batch)
        keep = stored.where(~(F.col("batch_id") < min_live_batch))
        # steady-state poll with nothing below the horizon: skip the
        # publish entirely (NoChange) instead of rewriting the whole
        # state as a new version for a no-op fold
        if old.limit(1).count() == 0:
            raise NoChange()
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
        return keep.unionByName(folded)

    transact(spark, path, ddl, merge)
