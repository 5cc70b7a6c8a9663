"""Distributed exact global ranking: row_number / ntile / running
totals over a TOTAL order without a single-partition WindowExec.

`Window.orderBy(...)` with no partition spec forces every row through
ONE partition (Spark warns "No Partition Defined for Window
operation") — fine on a |users| aggregate at sf0.1, a serialization
point at 10^8-10^9 rows. The scale-true equivalent is the TeraSort
decomposition Spark already ships as `repartitionByRange`:

  1. `repartitionByRange(B, *order)` samples the sort key and assigns
     contiguous, NON-OVERLAPPING, partition-id-ordered key ranges —
     every row in partition i sorts before every row in partition i+1.
  2. A per-partition count/sum (B rows, collected — a bounded model
     artifact like a quantile sketch, corpus-size-independent) gives
     each partition's exact global offset.
  3. The partition-LOCAL position finishes the exact global rank:
     offset + local position. For row ranks the local position is
     map-side free (sortWithinPartitions + the documented
     monotonically_increasing_id bit layout); running totals use a
     partition-local window (partitionBy the partition id).

The result is bit-identical to the global window (ranks are exact, so
ntile buckets are exact) while every shuffle stays range-balanced.
Callers must order by a TIE-FREE key list (append a unique id) — the
sampler may split equal keys across a partition boundary.

Oracle twins keep the plain `row_number()/ntile() OVER (ORDER BY ...)`
SQL; the parity gate is the proof the decomposition is exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_rrank_pid"


def _range_partitioned(
    df: DataFrame, order_exprs: Sequence[Column], nbuckets: int | None
) -> DataFrame:
    """Range-shuffle df on the sort key and pin the layout.

    localCheckpoint materializes the shuffled rows so the bounded
    offset pass (one tiny collect) and the final plan read the SAME
    partitioning — the upstream (often a corpus-sized aggregate) runs
    exactly once.
    """
    if nbuckets is None:
        nbuckets = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    d = df.repartitionByRange(nbuckets, *order_exprs)
    return d.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=True
    )


def _offsets(
    d: DataFrame, weight: Column
) -> tuple[Column, int]:
    """(offset-by-pid map lookup column, grand total).

    One groupBy over the pinned layout yields <= nbuckets rows —
    collected as a bounded artifact and folded into a literal map, so
    the final plan applies offsets as a pure projection (no join, no
    extra shuffle).
    """
    rows = d.groupBy(_PID).agg(
        # a partition whose values are ALL NULL sums to NULL — it
        # contributes nothing to downstream offsets, not a TypeError
        F.coalesce(F.sum(weight), F.lit(0)).alias("w")
    ).collect()
    per_pid = {r[_PID]: r["w"] for r in rows}  # int/float/Decimal as-is
    total, offs = 0, {}
    for pid in sorted(per_pid):
        offs[pid] = total
        total += per_pid[pid]
    pairs: list[Column] = []
    for pid, off in offs.items() or {-1: 0}.items():
        pairs.extend((F.lit(pid), F.lit(off)))
    return F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(_PID)), F.lit(0)
    ), total


_MID = "_rrank_mid"
_MID_MASK = (1 << 33) - 1  # monotonically_increasing_id: partition id
# in the upper 31 bits, record offset within the partition in the
# lower 33 (the documented layout) — so after sortWithinPartitions
# the LOCAL rank is a pure projection, no window, no extra exchange


def exact_global_rank(
    df: DataFrame,
    order_exprs: Sequence[Column],
    out: str = "rank",
    nbuckets: int | None = None,
) -> tuple[DataFrame, int]:
    """df + exact global row_number() over (ORDER BY order_exprs),
    plus the total row count (a build-time constant downstream
    expressions may fold in). order_exprs must be tie-free.

    One range-balanced shuffle total: rows sort WITHIN partitions,
    monotonically_increasing_id pins (partition, offset) per row
    (nondeterministic expressions are execution-order-pinned above
    the sort, and the checkpoint freezes them), and the bounded
    offset map turns (partition, offset) into the exact global rank
    map-side. Partitions are capped at 2^33 rows by the id layout —
    8.6e9 rows per partition, far past any sane partitioning."""
    if nbuckets is None:
        nbuckets = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    d = (
        df.repartitionByRange(nbuckets, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn(_MID, F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    pid = F.shiftright(F.col(_MID), 33).cast("int")
    rows = d.groupBy(pid.alias(_PID)).agg(
        F.count(F.lit(1)).alias("w")
    ).collect()
    per_pid = {int(r[_PID]): int(r["w"]) for r in rows}
    total, offs = 0, {}
    for p in sorted(per_pid):
        offs[p] = total
        total += per_pid[p]
    pairs: list[Column] = []
    for p, off in (offs or {-1: 0}).items():
        pairs.extend((F.lit(p), F.lit(off)))
    off_col = F.coalesce(
        F.element_at(F.create_map(*pairs), pid), F.lit(0)
    )
    local = F.col(_MID).bitwiseAND(F.lit(_MID_MASK)) + 1
    return (
        d.withColumn(out, (off_col + local).cast("long")).drop(_MID),
        total,
    )


def ntile_bucket(rank: Column, total: int, n: int) -> Column:
    """SQL NTILE(n) bucket of a 1-based exact global rank over
    `total` rows: the first (total % n) buckets take ceil(total/n)
    rows, the rest floor(total/n) — the exact distribution Spark and
    DuckDB both implement, as a pure expression over constants."""
    q, r = divmod(total, n)
    if q == 0:  # fewer rows than buckets: one row per bucket
        return rank.cast("int")
    thr = r * (q + 1)
    return (
        F.when(rank <= thr, F.floor((rank - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rank - thr - 1) / q) + 1)
        .cast("int")
    )


def exact_global_ntile(
    df: DataFrame,
    order_exprs: Sequence[Column],
    n: int,
    out: str,
    nbuckets: int | None = None,
    use_window: bool = False,
) -> DataFrame:
    """df + exact NTILE(n) OVER (ORDER BY order_exprs) — distributed
    by default; ``use_window=True`` keeps the plain global-window
    form (the small-n variant, and the equivalence test's oracle)."""
    if use_window:
        return df.withColumn(
            out, F.ntile(n).over(Window.orderBy(*order_exprs))
        )
    ranked, total = exact_global_rank(df, order_exprs, "_rrank_rn", nbuckets)
    return ranked.withColumn(
        out, ntile_bucket(F.col("_rrank_rn"), total, n)
    ).drop("_rrank_rn")


def exact_running_total(
    df: DataFrame,
    order_exprs: Sequence[Column],
    value: Column,
    out: str,
    include_current: bool = False,
    nbuckets: int | None = None,
) -> DataFrame:
    """df + exact running SUM(value) OVER (ORDER BY order_exprs
    ROWS UNBOUNDED PRECEDING [AND -1 when include_current=False]) —
    the boundary-span primitive (e.g. cumulative counts over distinct
    scores), same offset decomposition as the rank.

    The output column keeps the value column's type class: integral
    inputs yield a ``long`` (the window-SQL oracle's sum type);
    float inputs yield ``double``; DecimalType inputs are summed at
    Spark's decimal-sum precision (p+10 capped at 38) and the offset
    literal is cast to that exact type, so the output dtype equals
    the plain window sum's — totals whose integral part outgrows
    that precision follow Spark's decimal overflow semantics, as the
    window form would. NULL values sum as 0 (SQL SUM ignores NULLs;
    an all-NULL partition contributes a 0 offset)."""
    d = _range_partitioned(df, order_exprs, nbuckets)
    off, _ = _offsets(d, value)
    hi = 0 if include_current else -1
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = F.coalesce(F.sum(value).over(w), F.lit(0))
    vt = d.select(value.alias("_v")).schema[0].dataType.simpleString()
    integral = vt in {"tinyint", "smallint", "int", "bigint"}
    if vt.startswith("decimal"):
        # pin the offset literal to the window-sum's type — F.lit on
        # a Python Decimal infers decimal(38,18), whose addition
        # would spill past precision 38 and degrade the output dtype
        sum_t = d.select(
            F.sum(value).over(w).alias("_s")
        ).schema[0].dataType.simpleString()
        off = off.cast(sum_t)
        return d.withColumn(
            out, (off + local).cast(sum_t)
        ).drop(_PID)
    res = off + local
    return d.withColumn(
        out, res.cast("long") if integral else res
    ).drop(_PID)
