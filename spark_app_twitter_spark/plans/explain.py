"""Plan-inspection helpers: make physical-plan properties assertable.

The 100 TB discipline (SURVEY §7) is enforced by tests, not hope:
filters must reach the parquet scan (PushedFilters / PartitionFilters),
projections must prune the read schema, small dimensions must
broadcast, and map-only pipelines must not shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan as text (post-planning, pre-AQE-execution)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') output, captured as a string."""
    jdf = df._jdf
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        jdf.queryExecution(), "formatted"
    )


def num_shuffles(df: DataFrame) -> int:
    """Count shuffle exchanges in the physical plan."""
    plan = executed_plan(df)
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    ) + plan.count("Exchange RoundRobinPartitioning")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a data filter was pushed into a scan node."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning proof)."""
    cols: list[list[str]] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema"):
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.append(
                [f.split(":")[0].strip() for f in inner.split(",") if ":" in f]
            )
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (fewer = wider fused spans)."""
    return executed_plan(df).count("WholeStageCodegen")


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window nodes with NO partition spec — each one is a
    single-partition sort of its whole input (Spark inserts
    Exchange SinglePartition), the classic 100 TB serialization
    point. Plan-text format: `Window [funcs], [part], [order]` when
    both specs exist; with only ONE trailing group it is the ORDER
    spec (contains ASC/DESC sort directions) when the window is
    unpartitioned, or the bare-column PARTITION spec when the window
    is partitioned but unordered (count(*) over (partition by k) —
    fine at scale, not flagged); no trailing group at all is
    over () — also a single partition."""
    out = []
    for line in executed_plan(df).splitlines():
        s = line.strip().lstrip("+-*:( ")
        if ") " in s[:8]:
            s = s.split(") ", 1)[-1]
        if not s.startswith("Window ["):
            continue
        groups = s.count("], [")
        if groups >= 2:
            continue  # partition spec + order spec both present
        if groups == 0:
            out.append(s)  # over (): no partition, no order
            continue
        trailing = s.rsplit("], [", 1)[-1]
        if " ASC" in trailing or " DESC" in trailing:
            out.append(s)  # lone group is an ORDER spec: unpartitioned
    return out
