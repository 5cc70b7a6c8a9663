"""The manifest (object-store) realization of the serving-state
seam: optimistic put-if-absent commits, crash safety, concurrent
writers WITHOUT a shared flock, orphan vacuum, layout guards, and
maintainer parity across both realizations (VERDICT r10 item 2 +
ADVICE r10 items)."""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from spark_app_twitter_spark.streaming import statestore

DDL = "k long, v long"


def _counter_merge(spark):
    def merge(stored):
        if stored is None:
            return spark.createDataFrame([(0, 1)], DDL)
        return stored.groupBy("k").agg(
            (F.sum("v") + F.lit(1)).alias("v")
        ).select("k", "v")

    return merge


def test_manifest_roundtrip_and_retention(spark, tmp_path):
    """transact on the manifest backend publishes immutable
    snapshots committed by numbered manifests; reads resolve the
    highest manifest; superseded snapshots AND their manifests prune
    down to the retention window."""
    path = f"{tmp_path}/m"
    for _ in range(4):
        statestore.transact(
            spark, path, DDL, _counter_merge(spark), backend="manifest"
        )
    got = statestore.read_state(spark, path, DDL).collect()
    assert [tuple(r) for r in got] == [(0, 4)]
    assert statestore.backend_for(path) == "manifest"
    mdir = os.path.join(path, "_manifests")
    manifests = [n for n in os.listdir(mdir) if n.startswith("m-")]
    snaps = [n for n in os.listdir(path) if n.startswith("v-")]
    assert len(manifests) <= statestore._keep()
    assert len(snaps) <= statestore._keep()


def test_manifest_crash_mid_publish_leaves_previous_committed(
    spark, tmp_path, monkeypatch
):
    """Kill the writer AFTER the snapshot write but BEFORE the
    manifest link: the previous commit stays readable, the orphan
    snapshot is invisible, vacuum reclaims it by age, and the next
    publish proceeds at the correct version."""
    path = f"{tmp_path}/m"
    statestore.transact(
        spark, path, DDL, _counter_merge(spark), backend="manifest"
    )
    before = [tuple(r) for r in statestore.read_state(spark, path, DDL).collect()]
    assert before == [(0, 1)]

    real_link = os.link

    def boom(src, dst):
        raise OSError("simulated crash before manifest commit")

    monkeypatch.setattr(statestore.os, "link", boom)
    with pytest.raises(OSError, match="simulated crash"):
        statestore.transact(
            spark, path, DDL, _counter_merge(spark), backend="manifest"
        )
    monkeypatch.setattr(statestore.os, "link", real_link)

    # previous commit still reads; the half-published snapshot is an
    # invisible orphan
    assert [
        tuple(r) for r in statestore.read_state(spark, path, DDL).collect()
    ] == [(0, 1)]
    snaps = [n for n in os.listdir(path) if n.startswith("v-")]
    assert len(snaps) == 2  # committed + orphan
    assert statestore.vacuum_orphans(path, min_age_seconds=0.0) == 1
    assert len([n for n in os.listdir(path) if n.startswith("v-")]) == 1

    # recovery: the retried fold lands as version 2
    statestore.transact(
        spark, path, DDL, _counter_merge(spark), backend="manifest"
    )
    assert [
        tuple(r) for r in statestore.read_state(spark, path, DDL).collect()
    ] == [(0, 2)]


def test_manifest_vacuum_age_floor_protects_inflight_snapshot(
    spark, tmp_path
):
    """A fresh uncommitted snapshot (a slow racing writer's
    in-flight work) survives vacuum until the age floor passes."""
    path = f"{tmp_path}/m"
    statestore.transact(
        spark, path, DDL, _counter_merge(spark), backend="manifest"
    )
    # fabricate an in-flight snapshot: written, not yet committed
    spark.createDataFrame([(9, 9)], DDL).write.parquet(
        os.path.join(path, "v-00000000000000000002-deadbeef0000")
    )
    assert statestore.vacuum_orphans(path, min_age_seconds=3600) == 0
    assert statestore.vacuum_orphans(path, min_age_seconds=0.0) == 1


def test_manifest_commit_conflict_raises_and_loser_retries(
    spark, tmp_path
):
    """Two writers committing the same expected version: exactly one
    os.link wins; the loser sees CommitConflict (its snapshot becomes
    vacuum-able debris, the winner's state is intact)."""
    path = f"{tmp_path}/m"
    statestore._commit_manifest(
        spark.createDataFrame([(0, 1)], DDL), path, expected_version=0
    )
    with pytest.raises(statestore.CommitConflict):
        statestore._commit_manifest(
            spark.createDataFrame([(0, 999)], DDL), path, expected_version=0
        )
    assert [
        tuple(r) for r in statestore.read_state(spark, path, DDL).collect()
    ] == [(0, 1)]


def test_manifest_concurrent_writers_lose_no_update_without_flock(
    spark, tmp_path
):
    """The core object-store claim: two uncoordinated writers (no
    shared flock anywhere) each fold 10 increments through the
    optimistic loop — all 20 survive."""
    path = f"{tmp_path}/m"
    errors = []

    def worker():
        try:
            for _ in range(10):
                statestore.transact(
                    spark, path, DDL, _counter_merge(spark),
                    backend="manifest",
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    ts = [threading.Thread(target=worker) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors
    assert [
        tuple(r) for r in statestore.read_state(spark, path, DDL).collect()
    ] == [(0, 20)]


def test_mixed_layout_rejected(spark, tmp_path):
    """One path, one realization: a LATEST pointer AND a _manifests
    log on the same path is a deployment error, not a guess."""
    path = f"{tmp_path}/m"
    statestore.publish_state(spark.createDataFrame([(0, 1)], DDL), path)
    os.makedirs(os.path.join(path, "_manifests"))
    with pytest.raises(RuntimeError, match="BOTH"):
        statestore.read_state(spark, path, DDL)


def test_legacy_flat_parquet_layout_rejected(spark, tmp_path):
    """A pre-snapshot-store state dir (flat parquet files, no LATEST
    pointer) must raise with the migration recipe — NOT silently read
    as empty state and restart every fold from zero (ADVICE r10)."""
    path = f"{tmp_path}/legacy"
    spark.createDataFrame([(0, 1)], DDL).write.parquet(path)
    with pytest.raises(RuntimeError, match="legacy flat-parquet"):
        statestore.read_state(spark, path, DDL)


def test_keep_env_raises_retention(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_STATE_KEEP widens the snapshot window so lazy
    serving reads that collect several publishes later still find
    their snapshot on disk (ADVICE r10)."""
    monkeypatch.setenv("SPARK_GRAFT_STATE_KEEP", "4")
    path = f"{tmp_path}/k"
    for i in range(5):
        statestore.publish_state(
            spark.createDataFrame([(0, i)], DDL), path
        )
    snaps = [n for n in os.listdir(path) if n.startswith("v-")]
    assert len(snaps) == 4


@pytest.mark.parametrize("backend", ["pointer", "manifest"])
def test_q1_maintainer_parity_across_realizations(
    spark, sf_dir, tmp_path, monkeypatch, backend
):
    """The maintainer body is realization-independent: folding the
    same three lineitem batches (plus an exactly-once replay) through
    either backend yields an identical Q1 report."""
    monkeypatch.setenv("SPARK_GRAFT_STATE_BACKEND", backend)
    from spark_app_twitter_spark.sources.parquet import load_table
    from spark_app_twitter_spark.streaming import q1serve

    path = f"{tmp_path}/q1_{backend}"
    li = load_table(spark, sf_dir, "lineitem")
    batches = [li.where(F.col("l_orderkey") % 3 == i) for i in range(3)]
    for i, b in enumerate(batches):
        q1serve.apply_q1_batch(b, i, path)
    q1serve.apply_q1_batch(batches[1], 1, path)  # replay replaces
    got = sorted(
        tuple(r)
        for r in q1serve.q1_report_from_partials(spark, path).collect()
    )
    from spark_app_twitter_spark.operators import tpch

    want = sorted(
        tuple(r)
        for r in tpch.q1_pricing_summary(spark, sf_dir).collect()
    )
    assert got == want
    # the layout on disk matches the requested realization
    assert statestore.backend_for(path) == backend


@pytest.mark.parametrize("backend", ["pointer", "manifest"])
def test_scd2_maintainer_on_both_realizations(
    spark, tmp_path, monkeypatch, backend
):
    """SCD2 upsert + late detection + dead-letter replay all run on
    either realization."""
    import datetime as dt

    monkeypatch.setenv("SPARK_GRAFT_STATE_BACKEND", backend)
    from spark_app_twitter_spark.streaming.scd2serve import (
        apply_scd2_batch,
        scd2_late_audit,
        scd2_replay_late_users,
        scd2_table,
    )

    def ts(d):
        return dt.datetime(2024, 1, d)

    ddl = "user_id long, attr_k int, ts timestamp, event_id long"
    path = f"{tmp_path}/scd2_{backend}"
    b0 = spark.createDataFrame(
        [(1, 10, ts(1), 100), (1, 11, ts(5), 101)], ddl
    )
    apply_scd2_batch(b0, 0, path)
    b1 = spark.createDataFrame([(1, 12, ts(3), 102)], ddl)  # genuinely late
    apply_scd2_batch(b1, 1, path)
    assert scd2_late_audit(spark, path).count() == 1
    full_log = b0.unionByName(b1)
    assert scd2_replay_late_users(spark, full_log, path) == 1
    assert scd2_late_audit(spark, path).count() == 0
    hist = scd2_table(spark, path).orderBy("valid_from").collect()
    assert [r.attr_k for r in hist] == [10, 12, 11]


def test_scd2_replay_of_merged_batch_keeps_audit_empty(spark, tmp_path):
    """ADVICE r10 (medium): a foreachBatch crash-retry of an
    already-merged batch whose observations span multiple timestamps
    is absorbed idempotently — the audit channel must stay EMPTY, not
    accumulate false-positive replay work."""
    import datetime as dt

    from spark_app_twitter_spark.streaming.scd2serve import (
        apply_scd2_batch,
        scd2_late_audit,
        scd2_table,
    )

    def ts(d):
        return dt.datetime(2024, 1, d)

    ddl = "user_id long, attr_k int, ts timestamp, event_id long"
    path = f"{tmp_path}/scd2_replay"
    # multi-timestamp batch incl. a collapsed-away duplicate (attr 10
    # repeats at ts(2) — keep-first collapses it out of the history)
    b0 = spark.createDataFrame(
        [
            (1, 10, ts(1), 100),
            (1, 10, ts(2), 101),
            (1, 11, ts(5), 102),
            (2, 20, ts(2), 200),
        ],
        ddl,
    )
    apply_scd2_batch(b0, 0, path)
    assert scd2_late_audit(spark, path).count() == 0
    before = sorted(tuple(r) for r in scd2_table(spark, path).collect())

    # crash retry: same rows, new foreachBatch id — min(ts)=ts(1)
    # predates user 1's stored max(valid_from)=ts(5), but every row
    # is a no-op (a stored change row or inside a same-attr interval)
    apply_scd2_batch(b0, 7, path)
    assert scd2_late_audit(spark, path).count() == 0
    after = sorted(tuple(r) for r in scd2_table(spark, path).collect())
    assert after == before


@pytest.mark.parametrize("backend", ["pointer", "manifest"])
def test_q3_maintainer_parity_across_realizations(
    spark, sf_dir, tmp_path, monkeypatch, backend
):
    """The join-bearing Q3 maintainer rides the same transact seam:
    folding two insert batches plus an exactly-once replay yields the
    batch Q3 report on either realization."""
    monkeypatch.setenv("SPARK_GRAFT_STATE_BACKEND", backend)
    from spark_app_twitter_spark.sources.parquet import load_table
    from spark_app_twitter_spark.streaming import q3serve

    path = f"{tmp_path}/q3_{backend}"
    li = load_table(spark, sf_dir, "lineitem")
    for i in range(2):
        q3serve.apply_q3_batch(
            li.where(F.col("l_orderkey") % 2 == i), i, path, sf_dir
        )
    q3serve.apply_q3_batch(
        li.where(F.col("l_orderkey") % 2 == 1), 1, path, sf_dir
    )
    got = sorted(
        tuple(r)
        for r in q3serve.q3_report_from_partials(spark, path).collect()
    )
    from spark_app_twitter_spark.operators import tpch

    want = sorted(
        tuple(r)
        for r in tpch.q3_shipping_priority(spark, sf_dir).collect()
    )
    assert got == want
    assert statestore.backend_for(path) == backend


@pytest.mark.parametrize("backend", ["pointer", "manifest"])
def test_nochange_skips_publish(spark, tmp_path, backend):
    """ADVICE r11: a merge_fn raising NoChange leaves the state and
    its version untouched — a no-op poll must not burn a snapshot
    version rewriting the whole dimension."""
    path = f"{tmp_path}/nochange_{backend}"
    statestore.transact(
        spark, path, DDL, _counter_merge(spark), backend=backend
    )
    ver = (
        statestore._manifest_version(path)
        if backend == "manifest"
        else statestore._current_version(path)
    )
    before = sorted(
        tuple(r) for r in statestore.read_state(spark, path, DDL).collect()
    )

    def no_change(stored):
        assert stored is not None
        raise statestore.NoChange()

    statestore.transact(spark, path, DDL, no_change, backend=backend)
    ver2 = (
        statestore._manifest_version(path)
        if backend == "manifest"
        else statestore._current_version(path)
    )
    assert ver2 == ver
    after = sorted(
        tuple(r) for r in statestore.read_state(spark, path, DDL).collect()
    )
    assert after == before


def test_pointer_over_manifest_layout_rejected(spark, tmp_path):
    """ADVICE r11: transact(backend='pointer') on a path carrying a
    _manifests/ commit log must refuse BEFORE publishing — a LATEST
    pointer over a manifest log forks the path into both layouts."""
    path = f"{tmp_path}/fork_guard"
    statestore.transact(
        spark, path, DDL, _counter_merge(spark), backend="manifest"
    )
    with pytest.raises(RuntimeError, match="_manifests"):
        statestore.transact(
            spark, path, DDL, _counter_merge(spark), backend="pointer"
        )
    # the path is untouched: still a clean manifest read
    assert statestore.backend_for(path) == "manifest"
    assert statestore.read_state(spark, path, DDL).count() == 1


def test_deterministic_merge_bug_not_retried(spark, tmp_path):
    """ADVICE r11: a deterministic merge_fn bug (not a FileNotFound-
    class churn error) surfaces immediately with the real exception —
    not after 64 retries as a generic 'commit conflicts' error."""
    path = f"{tmp_path}/merge_bug"
    statestore.transact(
        spark, path, DDL, _counter_merge(spark), backend="manifest"
    )
    calls = {"n": 0}

    def buggy(stored):
        calls["n"] += 1
        raise ValueError("bad column in merge plan")

    with pytest.raises(ValueError, match="bad column"):
        statestore.transact(spark, path, DDL, buggy, backend="manifest")
    assert calls["n"] == 1


def test_conflict_exhaustion_chains_last_conflict(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11: when retries exhaust, the RuntimeError chains the
    last CommitConflict as __cause__ so the root cause survives."""
    path = f"{tmp_path}/exhaust"
    statestore.transact(
        spark, path, DDL, _counter_merge(spark), backend="manifest"
    )

    def always_conflict(df, p, expected_version):
        raise statestore.CommitConflict("forced")

    monkeypatch.setattr(statestore, "_commit_manifest", always_conflict)
    with pytest.raises(RuntimeError, match="gave up") as ei:
        statestore.transact(
            spark,
            path,
            DDL,
            _counter_merge(spark),
            backend="manifest",
            max_retries=2,
        )
    assert isinstance(ei.value.__cause__, statestore.CommitConflict)


def test_scd2_late_flags_survive_crash_before_commit(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11 (medium): the late-audit flags are durable across a
    crash BETWEEN the merge and the state commit (written pre-commit,
    keyed-overwrite), and a post-commit replay — whose recompute is
    empty because the observations are now absorbed — leaves the
    standing flags alone instead of clearing them."""
    import datetime as dt

    from spark_app_twitter_spark.streaming.scd2serve import (
        apply_scd2_batch,
        scd2_late_audit,
    )

    def ts(d):
        return dt.datetime(2024, 1, d)

    ddl = "user_id long, attr_k int, ts timestamp, event_id long"
    path = f"{tmp_path}/scd2_crash"
    b0 = spark.createDataFrame([(1, 10, ts(5), 100)], ddl)
    apply_scd2_batch(b0, 0, path)
    assert scd2_late_audit(spark, path).count() == 0

    # genuinely-late batch: ts(1) predates user 1's stored ts(5)
    # change with a DIFFERENT attribute — not absorbable
    b1 = spark.createDataFrame([(1, 11, ts(1), 101)], ddl)

    # crash in the gap: publish fails AFTER the merge ran
    real_publish = statestore.publish_state

    def boom(df, p):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(statestore, "publish_state", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        apply_scd2_batch(b1, 1, path)
    # the flags survived the crash (pre-commit write)
    flagged = scd2_late_audit(spark, path).collect()
    assert [(r.batch_id, r.user_id) for r in flagged] == [(1, 1)]

    # recovery replay: merges for real, flags recomputed identically
    monkeypatch.setattr(statestore, "publish_state", real_publish)
    apply_scd2_batch(b1, 1, path)
    flagged = scd2_late_audit(spark, path).collect()
    assert [(r.batch_id, r.user_id) for r in flagged] == [(1, 1)]

    # post-commit replay: observations absorbed -> empty recompute
    # must NOT clear the standing flag
    apply_scd2_batch(b1, 1, path)
    flagged = scd2_late_audit(spark, path).collect()
    assert [(r.batch_id, r.user_id) for r in flagged] == [(1, 1)]


@pytest.mark.parametrize("backend", ["pointer", "manifest"])
def test_compact_noop_skips_publish(spark, tmp_path, backend):
    """A compaction poll with nothing below the replay horizon is a
    no-op and must not burn a version (NoChange fast path)."""
    path = f"{tmp_path}/compact_noop_{backend}"
    ddl = "stream string, batch_id long, k long, v long"
    statestore.transact(
        spark,
        path,
        ddl,
        lambda s: spark.createDataFrame([("a", 5, 0, 1)], ddl),
        backend=backend,
    )
    ver = (
        statestore._manifest_version(path)
        if backend == "manifest"
        else statestore._current_version(path)
    )
    # horizon below every stored batch -> nothing to fold
    statestore.compact_partials(
        spark, path, ddl, ["k"], ["v"], min_live_batch=3
    )
    ver2 = (
        statestore._manifest_version(path)
        if backend == "manifest"
        else statestore._current_version(path)
    )
    assert ver2 == ver
    # a horizon above it folds and publishes
    statestore.compact_partials(
        spark, path, ddl, ["k"], ["v"], min_live_batch=9
    )
    rows = statestore.read_state(spark, path, ddl).collect()
    assert [(r.stream, r.batch_id, r.k, r.v) for r in rows] == [
        (statestore.RESERVED_STREAM, -1, 0, 1)
    ]
