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
    # Slim projections straight into the orderkey join, then ONE
    # aggregation to the customer grain. The r4 per-order pre-agg
    # (groupBy(l_orderkey) before the join) measured faster at sf0.1
    # (1.9 -> 1.45 s) but INVERTS at scale: |l_orderkey| groups ~=
    # |lineitem|/4, so the pre-agg hash table spills to sort-based
    # aggregation and the 100x fixture measured 32.5 s vs 17.1 s
    # without it (r13 A/B, worklog/r13_notes.md) — collapsing 4:1
    # doesn't pay for sorting 600M rows. Decimal sums are
    # associative, so both shapes are bit-identical.
    lv = l.select(
        "l_orderkey",
        (_money("l_extendedprice") * _one_minus("l_discount")).alias("rt"),
    )
    per_cust = (
        lv.join(
            o.select("o_orderkey", "o_custkey"),
            lv.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("rt").alias("rev_dec"))
    )
    joined = per_cust.join(c, per_cust.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("rev_dec"), F.asc("c_custkey")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
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


# ---------------------------------------------------------------------------
# Round 2: the remaining TPC-H plan shapes. The synthetic schema has no
# partsupp table and no commit/receipt dates, so Q2/Q11/Q16/Q20/Q21/Q22
# are re-grounded on the columns that exist — each keeps the *plan shape*
# of its namesake (the thing the engine must optimize), with semantics
# the oracle can replay exactly.
# ---------------------------------------------------------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year.

    Two independent dim-chains (supplier->n1, customer->n2) hang off
    the lineitem⨝orders spine. Both nation joins broadcast; the pair
    predicate is evaluated post-join on broadcast columns — the big
    tables shuffle only on their natural keys.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    rev = _money("l_extendedprice") * _one_minus("l_discount")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(rev) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's market share inside a region, by year.

    Conditional-share aggregation over a 6-table join: numerator is a
    CASE-guarded sum over the same rows as the denominator — one pass,
    no self-join. Both sums stay DECIMAL until the final division.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = _money("l_extendedprice") * _one_minus("l_discount")
    vol = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == r.r_regionkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev.alias("volume"),
            F.col("supp_nation"),
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))).alias(
                "nation_vol"
            ),
            F.sum("volume").alias("total_vol"),
        )
        .select(
            "o_year",
            F.round(
                F.coalesce(F.col("nation_vol"), F.lit(0)).cast("double")
                / F.col("total_vol").cast("double"),
                6,
            ).alias("mkt_share"),
        )
    )


Q8_SQL = """
WITH vol AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
)
SELECT o_year,
       round(CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume END), 0) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM vol
GROUP BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on a product line by supplier nation and year.

    LIKE-filtered part dim (pushed as StartsWith/Contains to the
    scan), then the widest join fan in the suite. Without a partsupp
    table there is no supplycost term; profit = discounted revenue.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    n = load_table(spark, sf_dir, "nation")
    rev = _money("l_extendedprice") * _one_minus("l_discount")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(rev).cast("double").alias("profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost revenue from returns in a
    quarter. TakeOrderedAndProject caps the result; the rank order
    carries a custkey tiebreak for determinism.
    """
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = _money("l_extendedprice") * _one_minus("l_discount")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds a fraction of
    the TOTAL traded value — HAVING against a scalar subquery.

    The per-part aggregate shuffles once on partkey; the grand total
    is a 1-row aggregate broadcast into the filter (Catalyst turns the
    scalar subquery into exactly that). No partsupp table, so value =
    discounted revenue via suppliers of one region.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = _money("l_extendedprice") * _one_minus("l_discount")
    scoped = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", rev.alias("rev"))
    )
    per_part = scoped.groupBy("l_partkey").agg(F.sum("rev").alias("value_dec"))
    total = scoped.agg(F.sum("rev").alias("total_dec"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("value_dec").cast("double")
            > F.col("total_dec").cast("double") * 0.001
        )
        .select("l_partkey", F.col("value_dec").cast("double").alias("value"))
    )


Q11_SQL = """
WITH scoped AS (
  SELECT l_partkey,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
SELECT l_partkey, CAST(sum(rev) AS DOUBLE) AS value
FROM scoped
GROUP BY l_partkey
HAVING CAST(sum(rev) AS DOUBLE) > (SELECT CAST(sum(rev) AS DOUBLE) FROM scoped) * 0.001
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count.

    LEFT OUTER join so zero-order customers survive with count 0, then
    a second (tiny) aggregation over the counts. The outer join
    shuffles on custkey; the distribution agg is ~dozens of groups.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue —
    equality against a scalar MAX subquery.

    The comparison happens on the exact DECIMAL aggregate (no double
    rounding), so ties and the max itself are reproducible; the 1-row
    max aggregate broadcasts into the filter.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = _money("l_extendedprice") * _one_minus("l_discount")
    per_supp = l.groupBy("l_suppkey").agg(F.sum(rev).alias("rev_dec"))
    mx = per_supp.agg(F.max("rev_dec").alias("max_dec"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .where(F.col("rev_dec") == F.col("max_dec"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


Q15_SQL = """
WITH per_supp AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT max(rev_dec) FROM per_supp)
"""


def q16_supplier_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part group, with
    a NOT IN subquery excluding a supplier set.

    NOT IN over a subquery is the null-aware anti join — semantically
    stricter than left_anti (one NULL in the exclusion set empties the
    result), so it runs through spark.sql to get Catalyst's
    NullAwareAntiJoin plan rather than approximating it.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q16")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_q16")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_q16")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem_q16
        JOIN part_q16 ON l_partkey = p_partkey
        WHERE p_type <> 'PROMO'
          AND p_size IN (1, 14, 23, 36, 45)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier_q16 WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
        """
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND p_size IN (1, 14, 23, 36, 45)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders — a correlated
    AVG subquery per part, decorrelated into aggregate + re-join.

    The per-part average joins back to the same lineitem scan;
    Catalyst plans the brand/size filter into both sides via the part
    dim. The 0.2×avg threshold is one double multiply in both engines.
    """
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#11") & (F.col("p_size") < 10)
    )
    l = load_table(spark, sf_dir, "lineitem")
    scoped = l.join(p, l.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = scoped.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (
            F.sum(F.col("l_quantity").cast(_PRICE)).cast("double") / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        scoped.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_key"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_money("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly")
        )
    )


Q17_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#11' AND p.p_size < 10
  AND l.l_quantity < 0.2 * (
    SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part, the supplier(s) achieving the MINIMUM
    average sale price — a correlated MIN subquery decorrelated into
    a per-(part,supplier) aggregate + per-part min + equality re-join.

    No partsupp table, so "cost" = average realized unit price from
    lineitem. Ties keep all minimal suppliers (Q2 semantics). The min
    comparison uses the exact same double both engines computed.
    """
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per_ps = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "p_name", "l_suppkey")
        .agg(
            (
                F.sum(_money("l_extendedprice")).cast("double") / F.count(F.lit(1))
            ).alias("avg_price")
        )
    )
    w = Window.partitionBy("l_partkey")
    return (
        per_ps.withColumn("min_price", F.min("avg_price").over(w))
        .where(F.col("avg_price") == F.col("min_price"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "s_name",
            "n_name",
            F.round("avg_price", 6).alias("min_avg_price"),
        )
    )


Q2_SQL = """
WITH per_ps AS (
  SELECT l_partkey, p_name, l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_size <= 15 AND p_type = 'LARGE'
  GROUP BY l_partkey, p_name, l_suppkey
)
SELECT l_partkey AS p_partkey, p_name, s_name, n_name,
       round(avg_price, 6) AS min_avg_price
FROM per_ps
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE avg_price = (
  SELECT min(p2.avg_price) FROM per_ps p2 WHERE p2.l_partkey = per_ps.l_partkey
)
"""


def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding an outsized share of a part
    line's flow — nested aggregate threshold feeding a SEMI join.

    Per-(supplier,part) quantity vs half the part's total flow (with a
    minimum-flow floor so single-line parts don't trivially qualify);
    qualifying suppkeys form a tiny distinct set that semi-joins back
    to supplier⨝nation. Both aggregates reuse one scoped scan.
    """
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    scoped = l.join(p, l.l_partkey == p.p_partkey).select(
        "l_partkey", "l_suppkey", F.col("l_quantity").cast(_PRICE).alias("qty")
    )
    per_sp = scoped.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("sp_qty")
    )
    per_part = scoped.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum("qty").alias("part_qty")
    )
    excess = (
        per_sp.join(F.broadcast(per_part), F.col("l_partkey") == F.col("pp_key"))
        .where(
            (F.col("sp_qty").cast("double") > F.col("part_qty").cast("double") * 0.5)
            & (F.col("part_qty") > 30)
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


Q20_SQL = """
WITH scoped AS (
  SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(12,2)) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
),
per_sp AS (
  SELECT l_partkey, l_suppkey, sum(qty) AS sp_qty
  FROM scoped GROUP BY l_partkey, l_suppkey
),
per_part AS (
  SELECT l_partkey AS pp_key, sum(qty) AS part_qty
  FROM scoped GROUP BY l_partkey
),
excess AS (
  SELECT DISTINCT l_suppkey
  FROM per_sp JOIN per_part ON l_partkey = pp_key
  WHERE CAST(sp_qty AS DOUBLE) > CAST(part_qty AS DOUBLE) * 0.5 AND part_qty > 30
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM excess)
"""


def q21_sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated EXISTS + NOT EXISTS against the
    same fact table.

    For finished orders: suppliers whose line was returned ('R') in a
    multi-supplier order where NO other supplier's line was returned —
    the blame is theirs alone. No receipt/commit dates exist, so
    'late' is re-grounded as 'returned'. Runs through spark.sql so
    Catalyst plans the two correlated existentials (ExistenceJoin)
    rather than hand-built anti/semi joins. Top-10 with name tiebreak.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q21")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_q21")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_q21")
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM lineitem_q21 l1
        JOIN orders_q21 ON l1.l_orderkey = o_orderkey
        JOIN supplier_q21 ON l1.l_suppkey = s_suppkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM lineitem_q21 l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem_q21 l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R'
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 10
        """
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers above the global
    average balance with no recent orders, rolled up by segment.

    Scalar AVG subquery (1-row broadcast) + anti join + final
    aggregate. Balance sums go through DECIMAL(12,2) — c_acctbal is
    2dp money — so the segment totals are order-independent.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    bal = F.col("c_acctbal").cast(_PRICE)
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (F.sum(bal).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT c_mktsegment, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1998-01-01'
  )
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Incremental view maintenance of Q1 — the TPC-H refresh-stream (RF1)
# discipline: Q1's aggregates are all sums and counts, so a refresh
# batch folds in by MERGING partial aggregates instead of rescanning
# the fact table. DECIMAL partial sums are exact and associative, so
# merge == recompute BIT-FOR-BIT (pinned in tests), which is the
# property that lets a 100-TB deployment maintain the report at
# delta cost.

IVM_REFRESH_MOD = 97  # l_orderkey % MOD == 0 plays the refresh batch


def q1_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 maintained as (base partial) MERGE (refresh partial): both
    halves compute the standard map-side DECIMAL partials, the merge
    is a 6-group sum of sums, and the final projection derives the
    averages from merged sums — identical output to
    :func:`q1_pricing_summary` (asserted in tests), at delta cost
    when the base partial is already materialized.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    disc_price = _money("l_extendedprice") * _one_minus("l_discount")
    charge = disc_price * _one_plus("l_tax")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.col("l_quantity").cast(_PRICE)).alias("sq"),
            F.sum(_money("l_extendedprice")).alias("sbp"),
            F.sum(disc_price).alias("sdp"),
            F.sum(charge).alias("sch"),
            F.sum(F.col("l_discount").cast(_RATE)).alias("sdisc"),
            F.count(F.lit(1)).alias("cnt"),
        )

    base = partial(l.where(F.col("l_orderkey") % IVM_REFRESH_MOD != 0))
    delta = partial(l.where(F.col("l_orderkey") % IVM_REFRESH_MOD == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("sq").alias("sq"),
            F.sum("sbp").alias("sbp"),
            F.sum("sdp").alias("sdp"),
            F.sum("sch").alias("sch"),
            F.sum("sdisc").alias("sdisc"),
            F.sum("cnt").alias("cnt"),
        )
    )
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sq").cast("double").alias("sum_qty"),
        F.col("sbp").cast("double").alias("sum_base_price"),
        F.col("sdp").cast("double").alias("sum_disc_price"),
        F.col("sch").cast("double").alias("sum_charge"),
        (F.col("sq").cast("double") / F.col("cnt")).alias("avg_qty"),
        (F.col("sbp").cast("double") / F.col("cnt")).alias("avg_price"),
        (F.col("sdisc").cast("double") / F.col("cnt")).alias("avg_disc"),
        F.col("cnt").alias("count_order"),
    )


Q1_INCREMENTAL_SQL = f"""
WITH src AS (
  SELECT *, (l_orderkey % {IVM_REFRESH_MOD} = 0) AS is_refresh
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
),
partials AS (
  SELECT l_returnflag, l_linestatus, is_refresh,
         sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
         sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sbp,
         sum(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS sdp,
         sum(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
             * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS sdp2,
         sum(CAST(l_discount AS DECIMAL(3,2))) AS sdisc,
         count(*) AS cnt
  FROM src GROUP BY 1, 2, 3
),
merged AS (
  SELECT l_returnflag, l_linestatus,
         sum(sq) AS sq, sum(sbp) AS sbp, sum(sdp) AS sdp,
         sum(sdp2) AS sch, sum(sdisc) AS sdisc,
         CAST(sum(cnt) AS BIGINT) AS cnt
  FROM partials GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus,
       CAST(sq AS DOUBLE) AS sum_qty,
       CAST(sbp AS DOUBLE) AS sum_base_price,
       CAST(sdp AS DOUBLE) AS sum_disc_price,
       CAST(sch AS DOUBLE) AS sum_charge,
       CAST(sq AS DOUBLE) / cnt AS avg_qty,
       CAST(sbp AS DOUBLE) / cnt AS avg_price,
       CAST(sdisc AS DOUBLE) / cnt AS avg_disc,
       cnt AS count_order
FROM merged
"""


def q1_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 maintained under DELETES — the RF2 half of the refresh
    stream: subtract the refresh batch's DECIMAL partials from the
    full report's and re-derive the averages. Exactly equals
    recomputing Q1 over the surviving rows (asserted in tests; exact
    decimal sums make subtraction as safe as addition). Groups whose
    count reaches zero drop out of the report, as a recompute would
    drop them.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    disc_price = _money("l_extendedprice") * _one_minus("l_discount")
    charge = disc_price * _one_plus("l_tax")

    def partial(df: DataFrame, sign: int) -> DataFrame:
        s = F.lit(sign).cast(_PRICE)
        sr = F.lit(sign).cast(_RATE)
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.col("l_quantity").cast(_PRICE) * s).alias("sq"),
            F.sum(_money("l_extendedprice") * s).alias("sbp"),
            F.sum(disc_price * s).alias("sdp"),
            F.sum(charge * s).alias("sch"),
            F.sum(F.col("l_discount").cast(_RATE) * sr).alias("sdisc"),
            F.sum(F.lit(sign).cast("long")).alias("cnt"),
        )

    full = partial(l, 1)
    retract = partial(
        l.where(F.col("l_orderkey") % IVM_REFRESH_MOD == 0), -1
    )
    merged = (
        full.unionByName(retract)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("sq").alias("sq"),
            F.sum("sbp").alias("sbp"),
            F.sum("sdp").alias("sdp"),
            F.sum("sch").alias("sch"),
            F.sum("sdisc").alias("sdisc"),
            F.sum("cnt").alias("cnt"),
        )
        .where(F.col("cnt") > 0)
    )
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sq").cast("double").alias("sum_qty"),
        F.col("sbp").cast("double").alias("sum_base_price"),
        F.col("sdp").cast("double").alias("sum_disc_price"),
        F.col("sch").cast("double").alias("sum_charge"),
        (F.col("sq").cast("double") / F.col("cnt")).alias("avg_qty"),
        (F.col("sbp").cast("double") / F.col("cnt")).alias("avg_price"),
        (F.col("sdisc").cast("double") / F.col("cnt")).alias("avg_disc"),
        F.col("cnt").alias("count_order"),
    )


Q1_RETRACTION_SQL = f"""
WITH src AS (
  SELECT *, CASE WHEN l_orderkey % {IVM_REFRESH_MOD} = 0
                 THEN -1 ELSE 0 END AS retract
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
),
signed AS (
  SELECT l_returnflag, l_linestatus, CAST(1 AS INT) AS sign, * FROM src
  UNION ALL
  SELECT l_returnflag, l_linestatus, CAST(-1 AS INT) AS sign, *
  FROM src WHERE retract = -1
),
merged AS (
  SELECT l_returnflag, l_linestatus,
         sum(sign * CAST(l_quantity AS DECIMAL(12,2))) AS sq,
         sum(sign * CAST(l_extendedprice AS DECIMAL(12,2))) AS sbp,
         sum(sign * CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS sdp,
         sum(sign * CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
             * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS sch,
         sum(sign * CAST(l_discount AS DECIMAL(3,2))) AS sdisc,
         CAST(sum(sign) AS BIGINT) AS cnt
  FROM signed GROUP BY 1, 2
  HAVING sum(sign) > 0
)
SELECT l_returnflag, l_linestatus,
       CAST(sq AS DOUBLE) AS sum_qty,
       CAST(sbp AS DOUBLE) AS sum_base_price,
       CAST(sdp AS DOUBLE) AS sum_disc_price,
       CAST(sch AS DOUBLE) AS sum_charge,
       CAST(sq AS DOUBLE) / cnt AS avg_qty,
       CAST(sbp AS DOUBLE) / cnt AS avg_price,
       CAST(sdisc AS DOUBLE) / cnt AS avg_disc,
       cnt AS count_order
FROM merged
"""


# ---------------------------------------------------------------------------
# Incremental view maintenance of Q3 — the JOIN-bearing step up from
# Q1's single-table IVM (VERDICT r08 item 6): the maintained view is
# an aggregate over customer ⨝ orders ⨝ lineitem, so an insert batch
# touching BOTH fact sides folds in through the bilinear join delta
#   Δ(L ⨝ O) = L_b⨝ΔO ∪ ΔL⨝O_b ∪ ΔL⨝ΔO
# (three delta-sized joins — each has at least one delta input, so a
# 100-TB deployment pays delta cost, never a base-⨝-base rescan),
# and a delete batch folds in as SIGNED partials flowing through the
# same join. DECIMAL revenue partials are exact and associative, so
# merge == recompute BIT-FOR-BIT (pinned in tests).

Q3_IVM_ORDER_MOD = 97  # o_orderkey % MOD == 0 plays the orders delta
Q3_IVM_LINE_MOD = 13  # l_suppkey % MOD == 0 plays the lineitem delta


def _q3_inputs(spark: SparkSession, sf_dir: str):
    """Q3's filtered, column-pruned inputs (shared by the IVM pair)."""
    cutoff = F.lit("1998-06-15").cast("timestamp")
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    )
    return c, o, l


def _q3_top10(merged: DataFrame) -> DataFrame:
    return (
        merged.select(
            "l_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.col("rev").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q3_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 maintained under INSERTS to both orders and lineitem (RF1
    through a join): base partial + the three join-delta partials,
    merged by a key-grouped sum of DECIMAL sums, then the identical
    top-10 projection as :func:`q3_shipping_priority` — equal output
    asserted bit-for-bit in tests.

    Scale shape: the base quadrant is Q3's own shuffle-join plan
    (already materialized in a real deployment — here recomputed so
    the oracle can replay it); each delta quadrant joins a
    refresh-batch-sized input, so AQE broadcasts the delta side and
    the fact table is never rescanned for the merge itself.
    """
    c, o, l = _q3_inputs(spark, sf_dir)
    o_base = o.where(F.col("o_orderkey") % Q3_IVM_ORDER_MOD != 0)
    o_delta = o.where(F.col("o_orderkey") % Q3_IVM_ORDER_MOD == 0)
    l_base = l.where(F.col("l_suppkey") % Q3_IVM_LINE_MOD != 0)
    l_delta = l.where(F.col("l_suppkey") % Q3_IVM_LINE_MOD == 0)
    rev = F.sum(_money("l_extendedprice") * _one_minus("l_discount"))

    def partial(ox: DataFrame, lx: DataFrame) -> DataFrame:
        return (
            ox.join(c, ox.o_custkey == c.c_custkey)
            .join(lx, ox.o_orderkey == lx.l_orderkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(rev.alias("rev"))
        )

    merged = (
        partial(o_base, l_base)
        .unionByName(partial(o_delta, l_base))
        .unionByName(partial(o_base, l_delta))
        .unionByName(partial(o_delta, l_delta))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev").alias("rev"))
    )
    return _q3_top10(merged)


Q3_INCREMENTAL_SQL = f"""
WITH cust AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
src_o AS (
  SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority,
         (o_orderkey % {Q3_IVM_ORDER_MOD} = 0) AS o_ref
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-06-15'
),
src_l AS (
  SELECT l_orderkey, l_extendedprice, l_discount,
         (l_suppkey % {Q3_IVM_LINE_MOD} = 0) AS l_ref
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-15'
),
partials AS (
  -- the four (base/delta x base/delta) join quadrants, kept apart
  -- exactly as the engine computes them
  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         o.o_ref, l.l_ref,
         sum(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS rev
  FROM src_o o
  JOIN cust c ON o.o_custkey = c.c_custkey
  JOIN src_l l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2, 3, 4, 5
),
merged AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority, sum(rev) AS rev
  FROM partials GROUP BY 1, 2, 3
)
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(rev AS DOUBLE) AS revenue
FROM merged
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q3_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 maintained under DELETES of a lineitem subset (RF2 through
    a join): the retraction partial flows the deleted rows through
    the SAME customer⨝orders join with sign -1, the merge subtracts
    exact DECIMAL partials, and groups whose surviving row count
    reaches zero drop out — exactly equal to recomputing Q3 over the
    surviving rows (asserted in tests). Unlike Q1's single-table
    retraction, groups here shrink PARTIALLY (an order keeps its
    other lineitems) or vanish entirely; both classes exist in the
    fixture and both are covered by the oracle hash.
    """
    c, o, l = _q3_inputs(spark, sf_dir)
    deleted = l.where(F.col("l_suppkey") % Q3_IVM_LINE_MOD == 0)

    def signed_partial(lx: DataFrame, sign: int) -> DataFrame:
        s = F.lit(sign).cast(_PRICE)
        return (
            o.join(c, o.o_custkey == c.c_custkey)
            .join(lx, o.o_orderkey == lx.l_orderkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(
                F.sum(
                    _money("l_extendedprice") * _one_minus("l_discount") * s
                ).alias("rev"),
                F.sum(F.lit(sign).cast("long")).alias("cnt"),
            )
        )

    merged = (
        signed_partial(l, 1)
        .unionByName(signed_partial(deleted, -1))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev").alias("rev"), F.sum("cnt").alias("cnt"))
        .where(F.col("cnt") > 0)
    )
    return _q3_top10(merged)


Q3_RETRACTION_SQL = f"""
WITH cust AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
src_o AS (
  SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-06-15'
),
src_l AS (
  SELECT l_orderkey, l_extendedprice, l_discount,
         (l_suppkey % {Q3_IVM_LINE_MOD} = 0) AS retract
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-15'
),
joined AS (
  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         l.l_extendedprice, l.l_discount, l.retract
  FROM src_o o
  JOIN cust c ON o.o_custkey = c.c_custkey
  JOIN src_l l ON o.o_orderkey = l.l_orderkey
),
signed AS (
  SELECT *, CAST(1 AS INT) AS sign FROM joined
  UNION ALL
  SELECT *, CAST(-1 AS INT) AS sign FROM joined WHERE retract
),
merged AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         sum(sign * CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS rev
  FROM signed GROUP BY 1, 2, 3
  HAVING sum(sign) > 0
)
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(rev AS DOUBLE) AS revenue
FROM merged
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""
