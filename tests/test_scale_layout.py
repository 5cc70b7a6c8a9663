"""Storage-layout scale levers: bucketed co-located joins and dynamic
partition pruning — plan-verified."""

from pyspark.sql import functions as F

from spark_app_twitter_spark.plans import explain as E
from spark_app_twitter_spark.sources.bucketing import (
    bucketed_revenue_by_status,
    create_bucketed_order_tables,
)


def test_bucketed_join_eliminates_join_shuffle(spark, sf_dir):
    li, od = create_bucketed_order_tables(spark, sf_dir)
    df = bucketed_revenue_by_status(spark, li, od)
    plan = E.executed_plan(df)
    # the join itself must not exchange either side; the single
    # remaining shuffle belongs to the final aggregation
    assert E.num_shuffles(df) == 1, plan
    assert "SelectedBucketsCount: 8 out of 8" in plan
    # and results are correct vs the unbucketed equivalent
    from spark_app_twitter_spark.sources.parquet import load_table

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    want = {
        r.o_orderstatus: (r.total_price, r.n)
        for r in l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    got = {r.o_orderstatus: (r.total_price, r.n) for r in df.collect()}
    assert got == want


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A selective dim filter must prune fact partitions at runtime."""
    from spark_app_twitter_spark.operators.ingest import parse_events

    lake = str(tmp_path / "events_by_date")
    parse_events(spark, sf_dir).write.partitionBy("date").parquet(lake)
    fact = spark.read.parquet(lake)
    two_dates = [r.date for r in fact.select("date").distinct().limit(2).collect()]
    dim = spark.createDataFrame(
        [(d, "x") for d in two_dates] + [("9999-09-09", "y")],
        "date string, tag string",
    )
    joined = (
        fact.join(dim, "date")
        .where(F.col("tag") == "x")
        .groupBy("topic")
        .count()
    )
    plan = E.executed_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join: a planted 90%-hot key must make the final
    adaptive plan mark the sort-merge join skew=true (the runtime
    re-plan that replaces manual salting for skewed JOINS at scale;
    functions/skew.py covers the aggregation case)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = left.join(right, "k")
        je = j._jdf.queryExecution()
        je.executedPlan().execute().count()  # finalize THIS adaptive plan
        plan = je.executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_key_parity(spark, sf_dir):
    from spark_app_twitter_spark.sources import bucketing
    from tests.parity import assert_parity

    assert_parity(
        bucketing.zorder_events(spark, sf_dir),
        bucketing.ZORDER_EVENTS_SQL,
        sf_dir,
        "zorder",
    )


def test_zorder_locality_beats_single_column_sort(spark, sf_dir):
    """The point of the Morton key: sorting by z must cluster BOTH
    dimensions. Measured as mean |Δu_bucket| + |Δt_bucket| between
    consecutive rows, z-order must beat sorting by t alone on the u
    dimension and by u alone on the t dimension."""
    from spark_app_twitter_spark.sources import bucketing

    rows = bucketing.zorder_events(spark, sf_dir).collect()

    def mean_step(ordered, dim):
        vals = [getattr(r, dim) for r in ordered]
        return sum(abs(a - b) for a, b in zip(vals, vals[1:])) / (
            len(vals) - 1
        )

    by_z = sorted(rows, key=lambda r: (r.z, r.event_id))
    by_t = sorted(rows, key=lambda r: (r.t_bucket, r.event_id))
    by_u = sorted(rows, key=lambda r: (r.u_bucket, r.event_id))
    # u-locality: z-sorted must beat t-sorted (which scatters u)
    assert mean_step(by_z, "u_bucket") < mean_step(by_t, "u_bucket")
    # t-locality: z-sorted must beat u-sorted (which scatters t)
    assert mean_step(by_z, "t_bucket") < mean_step(by_u, "t_bucket")
