"""Bucketed tables: co-located joins without a per-query shuffle.

The 100 TB lever SURVEY §7 calls out: facts that join repeatedly on
the same key (lineitem ⨝ orders on orderkey) are written bucketed +
sorted by that key; a matching-bucket join then runs as a SortMerge
join with NO Exchange under either side — the shuffle was paid once
at write time instead of on every query.

Bucket-count discipline at scale: pick |buckets| ~ target task count
(a power of two eases future splits); both sides must match (or be a
multiple, with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_app_twitter_spark.sources.parquet import load_table

N_BUCKETS = 8


def create_bucketed_order_tables(
    spark: SparkSession, sf_dir: str, suffix: str = ""
) -> tuple[str, str]:
    """Write lineitem/orders bucketed+sorted by order key; returns the
    table names. Idempotent (overwrite)."""
    li, od = f"lineitem_bkt{suffix}", f"orders_bkt{suffix}"
    (
        load_table(spark, sf_dir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(li)
    )
    (
        load_table(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(od)
    )
    return li, od


def bucketed_revenue_by_status(
    spark: SparkSession, li: str, od: str
) -> DataFrame:
    """lineitem ⨝ orders on the bucket key -> per-status totals.

    With matching buckets the join stage reads both tables bucket-by-
    bucket: the only Exchange in the plan belongs to the final
    aggregation, not the join.
    """
    from pyspark.sql import functions as F

    l, o = spark.table(li), spark.table(od)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) layout keys: multi-dimensional data clustering.
#
# Sorting by ONE column makes parquet row-group min/max stats prune
# that column's predicates and nothing else. Interleaving the bits of
# two bucketized dimensions into a Morton key and sorting by IT keeps
# rows close in BOTH dimensions, so row groups carry tight min/max
# ranges for user-scoped AND time-scoped scans — the layout trick
# behind Delta/Iceberg OPTIMIZE ZORDER, expressed as plain columnar
# bit math any engine can verify.
ZORDER_BITS = 8  # 8 bits per dimension -> 16-bit Morton key


def zorder_expr_sql(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    """Portable SQL for the Morton interleave of two pre-bucketized
    integer expressions in [0, 2^bits): bit i of ``a`` lands at 2i,
    bit i of ``b`` at 2i+1. Plain &, >>, << — identical text runs on
    Spark and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, u_bucket, t_bucket, z): the Morton layout key for
    events over (user, hour) — the write path is then
    ``.repartitionByRange("z").sortWithinPartitions("z")`` so both
    user-scoped and time-window scans prune row groups.

    Buckets: user_id mod 256 (uniform synthetic ids) and the hour
    index since the UNIX epoch mod 256 (``floor(epoch_us/3.6e9)`` —
    absolute, not corpus-relative, so the key of a row never changes
    as new data arrives and incremental writes stay consistent with
    the existing layout). Pure map-side bit math — the key
    computation adds zero shuffles to the write job.
    """
    from pyspark.sql import functions as F

    from spark_app_twitter_spark.functions.timeutil import epoch_us

    ev = load_table(spark, sf_dir, "events")
    u = "CAST(pmod(user_id, 256) AS BIGINT)"
    hour_idx = "CAST(floor(_eus / 3600000000) AS BIGINT)"
    t = f"CAST(pmod({hour_idx}, 256) AS BIGINT)"
    return (
        ev.withColumn("_eus", epoch_us("ts"))
        .selectExpr(
            "event_id",
            f"{u} AS u_bucket",
            f"{t} AS t_bucket",
            f"CAST({zorder_expr_sql(u, t)} AS BIGINT) AS z",
        )
    )


ZORDER_EVENTS_SQL = f"""
WITH b AS (
  SELECT event_id,
         CAST(user_id % 256 AS BIGINT) AS u_bucket,
         CAST(floor(epoch_us(ts) / 3600000000) % 256 AS BIGINT) AS t_bucket
  FROM events
)
SELECT event_id, u_bucket, t_bucket,
       CAST({zorder_expr_sql('u_bucket', 't_bucket')} AS BIGINT) AS z
FROM b
"""


# Small-file compaction planning: the maintenance job every parquet
# datalake runs (Delta OPTIMIZE / Iceberg rewrite_data_files shape).
# Inputs are file-level stats (here each document stands in for a
# file with size n_chars); the plan assigns inputs to output shards
# of ~COMPACT_TARGET_BYTES via fixed byte-range binning.
COMPACT_TARGET_BYTES = 4096


def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, shard, n_inputs, total_bytes, doc_lo, doc_hi): the
    compaction plan — per partition ("source"), inputs in doc_id
    order are binned where their cumulative byte offset falls
    (shard = floor(bytes_before / target)), so each output file
    lands within one input of the target size and the assignment is
    a pure function of the sorted listing (re-running the planner on
    the same listing yields the same plan — idempotent maintenance).

    Scale shape: one window per source partition (running sum over
    file-listing rows, not data rows — a 100 TB lake is ~1e6
    listing rows) and a per-(source, shard) rollup. The data files
    themselves are never read at plan time.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.col("n_chars").cast("long").alias("bytes")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shard = F.floor(
        F.coalesce(F.sum("bytes").over(w), F.lit(0))
        / F.lit(COMPACT_TARGET_BYTES)
    ).cast("long")
    return (
        docs.withColumn("shard", shard)
        .groupBy("source", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_inputs"),
            F.sum("bytes").alias("total_bytes"),
            F.min("doc_id").alias("doc_lo"),
            F.max("doc_id").alias("doc_hi"),
        )
    )


COMPACTION_PLAN_SQL = f"""
WITH listed AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS bytes,
         CAST(floor(COALESCE(sum(CAST(n_chars AS BIGINT)) OVER (
                 PARTITION BY source ORDER BY doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {COMPACT_TARGET_BYTES}) AS BIGINT) AS shard
  FROM documents
)
SELECT source, shard,
       CAST(count(*) AS BIGINT) AS n_inputs,
       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       min(doc_id) AS doc_lo,
       max(doc_id) AS doc_hi
FROM listed
GROUP BY source, shard
"""


# Data-skipping audit: group the Z-ordered layout into row-group-
# sized runs and measure, for representative predicates, how many
# groups a min/max-pruning reader skips. The predicates are fixed
# literals so the audit is oracle-checkable.
ZSKIP_GROUP_SHIFT = 4  # 2^16 z values -> 4096 groups of 16
_ZSKIP_PREDICATES = [
    # (name, u_lo, u_hi, t_lo, t_hi) over the 0..255 bucket spaces
    ("user_slice", 10, 20, 0, 255),
    ("time_slice", 0, 255, 40, 50),
    ("point_range", 100, 120, 100, 120),
]


def zorder_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(predicate, n_groups, n_skipped, skip_pct): for each audit
    predicate, the fraction of Z-run row groups a min/max reader
    prunes — the measurement that justifies the Z-order write
    layout (a linear (user, time) sort skips well on ONE dimension;
    Morton runs skip on both).

    Scale shape: per-group min/max is one keyed aggregation on the
    group id (map-side combined, |groups| = 4096 rows out); each
    predicate is then a map over THAT tiny relation. The data never
    sorts globally — group membership is z >> shift, a pure map, and
    a real writer would already have rows range-partitioned by z.
    """
    from pyspark.sql import functions as F

    z = zorder_events(spark, sf_dir)
    groups = (
        z.withColumn("zg", F.shiftright("z", ZSKIP_GROUP_SHIFT))
        .groupBy("zg")
        .agg(
            F.min("u_bucket").alias("u_lo"),
            F.max("u_bucket").alias("u_hi"),
            F.min("t_bucket").alias("t_lo"),
            F.max("t_bucket").alias("t_hi"),
        )
        # ONE corpus pass: the per-predicate aggregates below replay
        # this frame, so pin the 4096-row result instead of
        # re-scanning events once per predicate
        .localCheckpoint(eager=True)
    )
    out = None
    for name, ulo, uhi, tlo, thi in _ZSKIP_PREDICATES:
        # a group is skippable iff its min/max box misses the box
        skipped = (
            (F.col("u_hi") < ulo)
            | (F.col("u_lo") > uhi)
            | (F.col("t_hi") < tlo)
            | (F.col("t_lo") > thi)
        )
        row = groups.agg(
            F.lit(name).alias("predicate"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(skipped, 1).otherwise(0))
            .cast("long")
            .alias("n_skipped"),
            F.round(
                F.sum(F.when(skipped, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
                * 100.0,
                4,
            ).alias("skip_pct"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _zskip_sql() -> str:
    selects = []
    for name, ulo, uhi, tlo, thi in _ZSKIP_PREDICATES:
        selects.append(f"""
SELECT '{name}' AS predicate,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN u_hi < {ulo} OR u_lo > {uhi}
                      OR t_hi < {tlo} OR t_lo > {thi}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
       round(CAST(sum(CASE WHEN u_hi < {ulo} OR u_lo > {uhi}
                            OR t_hi < {tlo} OR t_lo > {thi}
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 100.0, 4) AS skip_pct
FROM groups""")
    union = "\nUNION ALL\n".join(s.strip() for s in selects)
    return f"""
WITH zkeys AS (
{ZORDER_EVENTS_SQL.strip()}
),
groups AS (
  SELECT z // {1 << ZSKIP_GROUP_SHIFT} AS zg,
         min(u_bucket) AS u_lo, max(u_bucket) AS u_hi,
         min(t_bucket) AS t_lo, max(t_bucket) AS t_hi
  FROM zkeys GROUP BY zg
)
{union}
"""


ZORDER_SKIPPING_STATS_SQL = _zskip_sql()
