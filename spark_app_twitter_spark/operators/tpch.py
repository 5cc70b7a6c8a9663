"""TPC-H-style analytical queries over the synthetic star schema.

These exercise the engine's scan/filter/join/aggregate path at scale
(the reference itself only ever joins two 5-row aggregates —
reference ``spark_app/functions/functions.py:113-115`` — so the
analytics muscle comes from here).

Determinism discipline for the DuckDB oracle gate: monetary math is
done in DECIMAL (exact, association-independent) and only cast to
DOUBLE at the end, so distributed partial aggregation order cannot
change results. Top-k queries carry a total order (tiebreak on key).

Scale notes (100 TB):
- ``lineitem``/``orders`` joins shuffle on the join key; AQE handles
  skew. ``nation``/``region`` are broadcast — they are bounded-size
  dimensions at any scale factor.
- All filters are plain column predicates -> pushed to the parquet
  scan (PushedFilters), and projections prune columns (ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_app_twitter_spark.sources.parquet import load_table

# Decimal casts: l_extendedprice < 110_000.00 -> (12,2);
# l_discount/l_tax in [0, 0.10] -> (3,2).
_PRICE = "decimal(12,2)"
_RATE = "decimal(3,2)"


def _money(col: str) -> F.Column:
    return F.col(col).cast(_PRICE)


def _one_minus(col: str) -> F.Column:
    return F.lit(1).cast(_RATE) - F.col(col).cast(_RATE)


def _one_plus(col: str) -> F.Column:
    return F.lit(1).cast(_RATE) + F.col(col).cast(_RATE)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report.

    Single scan -> partial hash agg (map-side combine) -> shuffle on
    (returnflag, linestatus) [6 groups] -> final agg. No UDFs; whole
    plan is one WholeStageCodegen span over the vectorized parquet
    reader.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = _money("l_extendedprice") * _one_minus("l_discount")
    charge = disc_price * _one_plus("l_tax")
    return (
        l.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_PRICE)).cast("double").alias("sum_qty"),
            F.sum(_money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (
                F.sum(F.col("l_quantity").cast(_PRICE)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            (
                F.sum(_money("l_extendedprice")).cast("double") / F.count(F.lit(1))
            ).alias("avg_price"),
            (
                F.sum(F.col("l_discount").cast(_RATE)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue.

    customer (filtered) ⨝ orders (filtered) ⨝ lineitem (filtered):
    all three filters push to the scans; at sf<=1 AQE converts the
    joins to broadcast, at 100 TB they become shuffle joins on the
    natural keys. Top-10 runs as TakeOrderedAndProject (no global
    sort materialization).
    """
    cutoff = F.lit("1998-06-15").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    revenue = F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT
  l_orderkey,
  o_orderdate,
  o_orderpriority,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-15'
  AND l_shipdate  > TIMESTAMP '1998-06-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation for one region/year.

    nation/region are broadcast explicitly — they are fixed-cardinality
    dimensions (25/5 rows) at every scale factor, so the big-table side
    never shuffles for them.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.cast("double").alias("revenue"))
    )


Q5_SQL = """
SELECT
  n_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by revenue within each nation (window rank).

    groupBy(c_custkey) reuses the customer⨝orders⨝lineitem shuffle;
    the rank window repartitions by nation — bounded state per
    partition (3 rows kept), no driver involvement.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey", "c_name")
        .agg(revenue.alias("rev_dec"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("rev_dec"), F.asc("c_custkey")
    )
    return (
        per_cust.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "n_name",
            "c_custkey",
            "c_name",
            F.col("rev_dec").cast("double").alias("revenue"),
            "rank",
        )
    )


TOP_CUSTOMERS_SQL = """
WITH per_cust AS (
  SELECT
    n_name, c_custkey, c_name,
    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS rev_dec
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, c_custkey, c_name
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY n_name ORDER BY rev_dec DESC, c_custkey ASC) AS rank
  FROM per_cust
)
SELECT n_name, c_custkey, c_name, CAST(rev_dec AS DOUBLE) AS revenue, rank
FROM ranked WHERE rank <= 3
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: potential revenue from discount changes.

    The canonical pushdown showcase: all three predicates reach the
    parquet scan (row-group min/max skipping at scale); the aggregate
    is a single scalar — map-side partials, one tiny shuffle.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_money("l_extendedprice") * F.col("l_discount").cast(_RATE))
            .cast("double")
            .alias("revenue")
        )
    )


Q6_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (SURVEY §2.3 'absent but free'): customers with no
    orders in a window — left_anti keeps the probe side streaming,
    never materializing the match.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1999-01-01'
)
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: monthly share of revenue from PROMO parts —
    conditional aggregation after a fact⨝dim join (part joins on a
    shuffled key at scale; the share itself is exact decimal ratio
    cast to double at the end).
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = _money("l_extendedprice") * _one_minus("l_discount")
    joined = l.join(p, l.l_partkey == p.p_partkey).select(
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        F.col("p_type"),
        rev.alias("rev"),
    )
    return (
        joined.groupBy("month")
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev"))).alias("promo"),
            F.sum("rev").alias("total"),
        )
        .select(
            "month",
            F.round(
                F.coalesce(F.col("promo"), F.lit(0)).cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("promo_share"),
        )
    )


PROMO_REVENUE_SHARE_SQL = """
WITH joined AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         p_type,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT month,
       round(CAST(coalesce(sum(CASE WHEN p_type = 'PROMO' THEN rev END), 0) AS DOUBLE)
             / CAST(sum(rev) AS DOUBLE), 6) AS promo_share
FROM joined
GROUP BY month
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: OR-of-ANDs predicates across a fact⨝dim join.

    Exercises disjunctive predicate normalization: Catalyst extracts
    the common conjuncts it can push (p_size lower bound, quantity
    range hull) to the scans and leaves the residual OR on the join.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size").between(1, smax))
        & (F.col("l_quantity").between(qlo, qhi))
    )
    cond = arm("Brand#1", 5, 1, 11) | arm("Brand#12", 10, 10, 20) | arm(
        "Brand#23", 15, 20, 30
    )
    rev = _money("l_extendedprice") * _one_minus("l_discount")
    return j.where(cond).agg(F.sum(rev).cast("double").alias("revenue"))


Q19_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: orders whose total quantity exceeds a
    threshold — aggregate-then-semi-join (the HAVING subquery shape).

    The heavy aggregation runs once over lineitem; the qualifying key
    set is tiny and joins back to orders/customer.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_PRICE)).alias("sum_qty_dec"))
        .where(F.col("sum_qty_dec") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").alias("total_price"),
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
    )


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty_dec
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150
)
SELECT c_name, o_orderkey, o_orderdate,
       o_totalprice AS total_price,
       CAST(sum_qty_dec AS DOUBLE) AS sum_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def rich_customers_vs_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers with above-nation-average
    balance. Catalyst decorrelates into an aggregate + join — the
    subquery never executes per-row. The average is decimal-exact so
    the > comparison is reproducible.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_corr"
    )
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_nationkey,
               CAST(c_acctbal AS DOUBLE) AS acctbal
        FROM customer_corr c
        WHERE c_acctbal > (
          SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 / count(*)
          FROM customer_corr c2
          WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


RICH_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, c_nationkey,
       CAST(c_acctbal AS DOUBLE) AS acctbal
FROM customer c
WHERE c_acctbal > (
  SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
  FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order-priority checking — left SEMI join (EXISTS).

    The semi join probes lineitem for existence only: no payload
    columns cross the join, no row multiplication — at scale this is
    a shuffle on orderkey where the build side stores just keys.
    """
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_linestatus") == "F"
    )
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_linestatus = 'F'
  )
GROUP BY o_orderpriority
"""


def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: order-priority mix per line status — IN-list
    predicate (pushed to the scan as an `In` filter) feeding
    conditional aggregation after the fact⨝fact join.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag IN ('A', 'R')
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""
