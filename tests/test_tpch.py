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
