"""functions/ranking.py: the distributed exact rank/ntile/running
total must be BIT-IDENTICAL to the single-partition global window it
replaces — on uniform, skewed, tiny, and sub-bucket-count inputs."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_app_twitter_spark.functions.ranking import (
    exact_global_ntile,
    exact_global_rank,
    exact_running_total,
)


def _cases(spark):
    rng = random.Random(42)
    uniform = spark.createDataFrame(
        [(i, rng.randint(0, 10_000)) for i in range(2_003)],
        "id long, m long",
    )
    # heavy ties: 90% of rows share one metric value — the sampler
    # must split the tie across partitions and the id tie-break keeps
    # ranks exact
    skewed = spark.createDataFrame(
        [(i, 7 if rng.random() < 0.9 else rng.randint(0, 50)) for i in range(1_501)],
        "id long, m long",
    )
    tiny = spark.createDataFrame([(1, 5), (2, 9), (3, 1)], "id long, m long")
    return {"uniform": uniform, "skewed": skewed, "tiny": tiny}


def test_exact_ntile_matches_global_window(spark):
    order = [F.desc("m"), F.asc("id")]
    for label, df in _cases(spark).items():
        for n in (3, 5, 10):
            got = exact_global_ntile(df, order, n, "b").select("id", "b")
            want = df.withColumn(
                "b", F.ntile(n).over(Window.orderBy(*order))
            ).select("id", F.col("b").alias("wb"))
            diff = got.join(want, "id").where(F.col("b") != F.col("wb"))
            assert diff.count() == 0, f"{label} ntile({n})"


def test_exact_rank_matches_row_number(spark):
    order = [F.asc("m"), F.asc("id")]
    for label, df in _cases(spark).items():
        got, total = exact_global_rank(df, order, "r")
        assert total == df.count(), label
        want = df.withColumn(
            "r", F.row_number().over(Window.orderBy(*order))
        ).select("id", F.col("r").alias("wr"))
        diff = got.join(want, "id").where(F.col("r") != F.col("wr"))
        assert diff.count() == 0, label


def test_exact_running_total_matches_window(spark):
    for label, df in _cases(spark).items():
        g = df.groupBy("m").agg(F.count(F.lit(1)).alias("c"))
        got = exact_running_total(g, [F.desc("m")], F.col("c"), "cb")
        w = Window.orderBy(F.desc("m")).rowsBetween(
            Window.unboundedPreceding, -1
        )
        want = g.select(
            "m", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("wcb")
        )
        diff = got.join(want, "m").where(F.col("cb") != F.col("wcb"))
        assert diff.count() == 0, label


def test_use_window_small_n_variant_agrees(spark):
    df = _cases(spark)["tiny"]
    order = [F.asc("m"), F.asc("id")]
    a = exact_global_ntile(df, order, 5, "b").select("id", "b")
    b = exact_global_ntile(df, order, 5, "b", use_window=True).select(
        "id", F.col("b").alias("wb")
    )
    assert a.join(b, "id").where(F.col("b") != F.col("wb")).count() == 0


def test_running_total_all_null_partition_and_null_values(spark):
    """ADVICE r10: a range partition whose value column is entirely
    NULL must contribute a 0 offset (SQL SUM ignores NULLs), not a
    driver TypeError. Low-m rows carry NULL so at least one range
    partition is all-NULL under any bucket count."""
    rows = [(i, i, None if i < 1000 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, m long, c long")
    got = exact_running_total(
        df, [F.asc("m")], F.col("c"), "rt", include_current=True
    )
    w = Window.orderBy(F.asc("m")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = df.select(
        "id", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("wrt")
    )
    diff = got.join(want, "id").where(F.col("rt") != F.col("wrt"))
    assert diff.count() == 0


def test_running_total_preserves_fractional_type(spark):
    """ADVICE r10: fractional value columns must not be silently
    truncated to long — the output keeps a fractional sum type and
    the values match the global window exactly."""
    rows = [(i, i, 0.25 * (i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, m long, c double")
    got = exact_running_total(
        df, [F.asc("m")], F.col("c"), "rt", include_current=True
    )
    assert dict(got.dtypes)["rt"] == "double"
    w = Window.orderBy(F.asc("m")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = df.select(
        "id", F.coalesce(F.sum("c").over(w), F.lit(0.0)).alias("wrt")
    )
    diff = got.join(want, "id").where(
        F.abs(F.col("rt") - F.col("wrt")) > 1e-9
    )
    assert diff.count() == 0


def test_running_total_decimal_matches_window_and_dtype(spark):
    """DecimalType values: the output dtype equals the plain window
    sum's (offset literal pinned to the decimal-sum type — naive
    Decimal literals would spill past precision 38), and values match
    the global window exactly."""
    rows = [(i, i, f"{(i % 13) * 7}.25") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, m long, s string").select(
        "id", "m", F.col("s").cast("decimal(38,2)").alias("c")
    )
    got = exact_running_total(
        df, [F.asc("m")], F.col("c"), "rt", include_current=True
    )
    w = Window.orderBy(F.asc("m")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = df.select("id", F.sum("c").over(w).alias("wrt"))
    assert dict(got.dtypes)["rt"] == dict(want.dtypes)["wrt"]
    diff = got.join(want, "id").where(F.col("rt") != F.col("wrt"))
    assert diff.count() == 0
