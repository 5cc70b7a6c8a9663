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
