"""As-of and range (interval) joins — the temporal-join library layer
SURVEY §2.3 plans for stream enrichment.

Spark has no native ASOF JOIN; the engine implements it with the
union + running-last trick, which scales as a single shuffle on the
partition key + one sorted window pass — crucially NOT as a range
self-join (whose candidate set explodes quadratically in dense
regions):

  union(left tagged, right tagged)
  -> window over (key) ordered by (ts, side, seq)
  -> last(right_payload, ignoreNulls) = most recent right row <= ts

The oracle twin uses DuckDB's native ASOF JOIN, so the trick is
verified against a reference implementation of the semantics.

Tie discipline: right rows sort before left rows at equal ts
(inclusive as-of), and the right side is pre-deduped to one row per
(key, ts) — both engines then agree even when timestamps collide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_app_twitter_spark.functions.timeutil import epoch_us

from spark_app_twitter_spark.sources.parquet import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Generic as-of: append to each left row the ``right_cols`` of
    the latest right row with ``right.ts <= left.ts`` (per key)."""
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        key,
        ts,
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    ).withColumn("_side", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc(ts), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"r_{c}")
            for c in right_cols
        ],
    )
    return enriched.where(F.col("_side") == 1).drop(
        "_side", *[f"_r_{c}" for c in right_cols]
    )


def purchases_with_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase enriched with the user's most recent click at or
    before the purchase time (+ gap in seconds)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    # one click per (user, ts): keep max event_id — removes tie
    # ambiguity in both engines
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    # the gap needs the click's ts too: carry it as a payload column
    clicks_with_ts = clicks.withColumn("click_ts", F.col("ts"))
    joined = asof_join(
        purchases,
        clicks_with_ts,
        key="user_id",
        ts="ts",
        right_cols=["click_id", "click_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("r_click_id").alias("click_id"),
        F.round(
            (epoch_us("ts") - epoch_us("r_click_ts"))
            / F.lit(1_000_000.0),
            3,
        ).alias("gap_seconds"),
    )


PURCHASES_WITH_LAST_CLICK_SQL = """
WITH purchases AS (
  SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, p.ts,
       c.click_id,
       round((epoch_us(p.ts) - epoch_us(c.click_ts)) / 1000000.0, 3) AS gap_seconds
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def errors_near_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: error events within 10 minutes AFTER a
    purchase by the same user.

    Equi part (user_id) drives the join strategy — sort-merge on the
    key with the range as a residual filter; at 100 TB add a
    time-bucket term to the equi key so each task only sees
    +-1-bucket neighborhoods.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    e = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id"),
        F.col("ts").alias("error_ts"),
    )
    cond = (
        (p.user_id == e.user_id)
        & (epoch_us(e.error_ts) > epoch_us(p.purchase_ts))
        & (
            epoch_us(e.error_ts)
            <= epoch_us(p.purchase_ts) + 600 * 1_000_000
        )
    )
    return p.join(e, cond).select(
        "purchase_id", "error_id", p.user_id, "purchase_ts", "error_ts"
    )


ERRORS_NEAR_PURCHASES_SQL = """
SELECT p.event_id AS purchase_id,
       e.event_id AS error_id,
       p.user_id,
       p.ts AS purchase_ts,
       e.ts AS error_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id
 AND epoch_us(e.ts) > epoch_us(p.ts)
 AND epoch_us(e.ts) <= epoch_us(p.ts) + 600 * 1000000
"""


# ---------------------------------------------------------------------------
# Keyless (global) range join with time-bucket blocking.
#
# errors_near_purchases has user_id as an equi key, so Spark gets a
# hash/sort-merge join for free and the range is a residual filter.
# When there is NO equi key — "how many clicks happened anywhere on
# the site within +-60 s of each error?" — a naive range join is a
# cartesian product with a filter: O(|errors| * |clicks|) candidates,
# a scale-killer. The standard fix is to MANUFACTURE an equi key from
# the range itself: bucket time into windows exactly as wide as the
# range radius W. Any click within +-W of an error then lives in the
# error's bucket or one of its two neighbors, so exploding the probe
# side to {b-1, b, b+1} and equi-joining on bucket finds every true
# pair while bounding candidates to ~3x the events of one bucket —
# shuffle-partitionable, AQE-skew-splittable (a "hot minute" is just
# a hot key), and independent of total data size per task.

BURST_RADIUS_US = 60 * 1_000_000  # +-60 s


def clicks_near_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event: how many clicks (and how many distinct
    clicking users) happened within +-60 s, across ALL users.

    Plan shape: clicks bucket once (floor(us/W)); errors explode to
    their 3 candidate buckets; equi-join on bucket; exact |dt| <= W
    residual filter; per-error aggregate. A click inside the radius
    matches in exactly ONE of the three probe buckets, so no pair
    dedup is needed before counting.
    """
    ev = load_table(spark, sf_dir, "events")
    w = F.lit(BURST_RADIUS_US)
    err = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        epoch_us("ts").alias("e_us"),
    )
    err_b = err.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor(F.col("e_us") / w) - 1,
                F.floor(F.col("e_us") / w),
                F.floor(F.col("e_us") / w) + 1,
            )
        ),
    )
    clk = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        epoch_us("ts").alias("c_us"),
        F.floor(epoch_us("ts") / w).alias("bucket"),
    )
    hit = F.abs(F.col("c_us") - F.col("e_us")) <= w
    return (
        err_b.join(clk, "bucket", "left")
        .groupBy("error_id")
        .agg(
            F.sum(F.when(hit, 1).otherwise(0)).alias("n_nearby_clicks"),
            F.countDistinct(F.when(hit, F.col("c_user"))).alias(
                "n_nearby_users"
            ),
        )
    )


CLICKS_NEAR_ERRORS_SQL = f"""
SELECT e.event_id AS error_id,
       count(c.event_id) AS n_nearby_clicks,
       count(DISTINCT c.user_id) AS n_nearby_users
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON abs(epoch_us(c.ts) - epoch_us(e.ts)) <= {BURST_RADIUS_US}
GROUP BY e.event_id
"""


def nearest_click_to_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bidirectional nearest-neighbor temporal join: each purchase
    enriched with the user's click CLOSEST in time, before OR after
    (attribution when the click can trail the conversion —
    post-purchase confirmation clicks, clock-skewed client logs).

    Scale shape: the as-of union+window trick run in BOTH directions
    over ONE shuffle on the key — a forward pass (last click <= ts)
    and a backward pass (first click >= ts) are two sorted window
    evaluations of the same partitioning, then a map-side argmin
    picks the closer side. The naive formulation is a per-user range
    self-join whose candidates blow up quadratically on active
    users; this stays |purchases| + |clicks| rows per key.

    Ties: equidistant prev/next resolve to the EARLIER click; clicks
    are pre-deduped to one per (user, ts) by max event_id, so both
    engines see identical candidates. gap_seconds is SIGNED
    (negative = click preceded the purchase).
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("_r_click_id"))
        .withColumn("_r_click_ts", F.col("ts"))
    )
    l_tag = purchases.withColumn("_side", F.lit(1))
    r_tag = clicks.withColumn("_side", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left at equal ts in BOTH directions, so
    # an exactly-simultaneous click is visible to each pass (gap 0)
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = (
        unioned.select(
            "*",
            F.last("_r_click_id", ignorenulls=True)
            .over(w_prev)
            .alias("prev_id"),
            F.last("_r_click_ts", ignorenulls=True)
            .over(w_prev)
            .alias("prev_ts"),
            F.last("_r_click_id", ignorenulls=True)
            .over(w_next)
            .alias("next_id"),
            F.last("_r_click_ts", ignorenulls=True)
            .over(w_next)
            .alias("next_ts"),
        )
        .where(F.col("_side") == 1)
    )
    d_prev = epoch_us("ts") - epoch_us("prev_ts")
    d_next = epoch_us("next_ts") - epoch_us("ts")
    take_prev = F.col("prev_id").isNotNull() & (
        F.col("next_id").isNull() | (d_prev <= d_next)
    )
    click_id = F.when(take_prev, F.col("prev_id")).otherwise(
        F.col("next_id")
    )
    click_ts = F.when(take_prev, F.col("prev_ts")).otherwise(
        F.col("next_ts")
    )
    return enriched.select(
        "event_id",
        "user_id",
        "ts",
        click_id.alias("click_id"),
        F.round(
            (epoch_us(click_ts) - epoch_us("ts")) / F.lit(1_000_000.0), 3
        ).alias("gap_seconds"),
    )


NEAREST_CLICK_TO_PURCHASE_SQL = """
WITH purchases AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts AS click_ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
cand AS (
  SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY abs(epoch_us(c.click_ts) - epoch_us(p.ts)) ASC,
                    c.click_ts ASC) AS rk
  FROM purchases p LEFT JOIN clicks c ON p.user_id = c.user_id
)
SELECT event_id, user_id, ts, click_id,
       round((epoch_us(click_ts) - epoch_us(ts)) / 1000000.0, 3)
         AS gap_seconds
FROM cand WHERE rk = 1
"""
