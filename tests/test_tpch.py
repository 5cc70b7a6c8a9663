from spark_app_twitter_spark.operators import tpch

from tests.parity import assert_parity


def test_q1(spark, sf_dir):
    assert_parity(tpch.q1_pricing_summary(spark, sf_dir), tpch.Q1_SQL, sf_dir, "q1")


def test_q3(spark, sf_dir):
    assert_parity(tpch.q3_shipping_priority(spark, sf_dir), tpch.Q3_SQL, sf_dir, "q3")


def test_q5(spark, sf_dir):
    assert_parity(
        tpch.q5_local_supplier_volume(spark, sf_dir), tpch.Q5_SQL, sf_dir, "q5"
    )


def test_top_customers(spark, sf_dir):
    assert_parity(
        tpch.top_customers_per_nation(spark, sf_dir),
        tpch.TOP_CUSTOMERS_SQL,
        sf_dir,
        "top_customers",
    )


def test_q19(spark, sf_dir):
    assert_parity(
        tpch.q19_disjunctive_revenue(spark, sf_dir), tpch.Q19_SQL, sf_dir, "q19"
    )


def test_q18(spark, sf_dir):
    assert_parity(
        tpch.q18_large_volume_orders(spark, sf_dir), tpch.Q18_SQL, sf_dir, "q18"
    )


def test_rich_customers_correlated_subquery(spark, sf_dir):
    assert_parity(
        tpch.rich_customers_vs_nation(spark, sf_dir),
        tpch.RICH_CUSTOMERS_SQL,
        sf_dir,
        "corr",
    )


def test_q4_semi_join(spark, sf_dir):
    assert_parity(
        tpch.q4_order_priority(spark, sf_dir), tpch.Q4_SQL, sf_dir, "q4"
    )


def test_q12(spark, sf_dir):
    assert_parity(
        tpch.q12_priority_by_status(spark, sf_dir), tpch.Q12_SQL, sf_dir, "q12"
    )


def test_q3_incremental_merge_equals_recompute(spark, sf_dir):
    """Join-bearing IVM identity (the step up from Q1's single-table
    merge): folding an insert batch that touches BOTH orders and
    lineitem through the bilinear join delta (base⨝Δ ∪ Δ⨝base ∪ Δ⨝Δ)
    reproduces the full-scan Q3 BIT-FOR-BIT, and the twin replays the
    same quadrant partials."""
    from spark_app_twitter_spark.operators import tpch

    from tests.parity import assert_parity

    inc = tpch.q3_incremental(spark, sf_dir)
    assert_parity(inc, tpch.Q3_INCREMENTAL_SQL, sf_dir, "q3ivm")
    got = sorted(tuple(r) for r in inc.collect())
    full = sorted(
        tuple(r) for r in tpch.q3_shipping_priority(spark, sf_dir).collect()
    )
    assert got == full


def test_q3_retraction_equals_recompute_over_survivors(
    spark, sf_dir, tmp_path
):
    """RF2 through a join: subtracting the deleted lineitems' signed
    DECIMAL partials (flowed through the same customer⨝orders join)
    equals recomputing Q3 over the surviving rows — including groups
    that shrink partially and groups that vanish."""
    from pyspark.sql import functions as F

    from spark_app_twitter_spark.operators import tpch
    from spark_app_twitter_spark.sources.parquet import load_table

    from tests.parity import assert_parity

    ret = tpch.q3_retraction(spark, sf_dir)
    assert_parity(ret, tpch.Q3_RETRACTION_SQL, sf_dir, "q3rf2")
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).write.mode("overwrite").parquet(
            f"{tmp_path}/{t}.parquet"
        )
    load_table(spark, sf_dir, "lineitem").where(
        F.col("l_suppkey") % tpch.Q3_IVM_LINE_MOD != 0
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    direct = sorted(
        tuple(r)
        for r in tpch.q3_shipping_priority(spark, str(tmp_path)).collect()
    )
    assert sorted(tuple(r) for r in ret.collect()) == direct
