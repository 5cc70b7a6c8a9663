"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine code lives in ``spark_app_twitter_spark/``; this module is a
thin registry mapping query names -> (Spark callable, oracle SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_app_twitter_spark.operators import tpch  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "tpch_q1_pricing_summary": tpch.q1_pricing_summary,
        "tpch_q3_shipping_priority": tpch.q3_shipping_priority,
        "tpch_q5_local_supplier_volume": tpch.q5_local_supplier_volume,
        "tpch_top_customers_per_nation": tpch.top_customers_per_nation,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query."""
    return {
        "tpch_q1_pricing_summary": tpch.Q1_SQL,
        "tpch_q3_shipping_priority": tpch.Q3_SQL,
        "tpch_q5_local_supplier_volume": tpch.Q5_SQL,
        "tpch_top_customers_per_nation": tpch.TOP_CUSTOMERS_SQL,
    }
