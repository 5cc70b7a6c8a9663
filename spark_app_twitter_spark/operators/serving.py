"""Dashboard-equivalent serving queries (SURVEY §2.4 A4-A9, §2.5 D1-D3,
§2.2 P9-P13).

The reference's dashboard pulls the whole serving collection into
pandas and re-aggregates per chart (``streamlit/utilities/
utilities.py:13-33``, ``streamlit/charts/charts.py``). Here each
chart is a Spark query over the source tables — pushdown-friendly,
no driver-side materialization — and the three dashboard grains
(Global/Day/Hour, ``streamlit/main.py:52-93``) collapse into one
GROUPING SETS pass.

The synthetic ``events`` table is the serving source
(``event_type``→topic, ``ts``→event time, ``value``→metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_app_twitter_spark.functions.ranking import exact_global_ntile
from spark_app_twitter_spark.functions.timeutil import epoch_us

from spark_app_twitter_spark.operators.aggregates import emotion_pivot
from spark_app_twitter_spark.operators.enrich import enrich
from spark_app_twitter_spark.schemas import EMOTIONS
from spark_app_twitter_spark.sources.parquet import load_table

_VAL_DEC = "decimal(12,2)"  # events.value < 10^6, 2dp


def dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: keep-first dedup on a key subset, with explicit ordering.

    pandas ``drop_duplicates(subset=...)`` keeps the first row in
    frame order (``streamlit/utilities/utilities.py:27``); Spark's
    ``dropDuplicates`` keeps an *arbitrary* row, so the engine makes
    the tie-break explicit: row_number over (key) ordered by
    (ts, event_id). One shuffle on the dedup key; at scale this is
    the standard exactly-once-by-id pattern (and the streaming twin
    is ``dropDuplicatesWithinWatermark``).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


DEDUP_FIRST_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
"""


def unpivot_emotions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: melt the wide emotion pivot back to long format.

    pandas ``melt`` (``streamlit/charts/charts.py:21-31``) becomes
    the ``stack`` table generator — map-side, no shuffle beyond the
    pivot that feeds it.
    """
    wide = emotion_pivot(enrich(load_table(spark, sf_dir, "documents")))
    stack_args = ", ".join(f"'{e}', {e}" for e in EMOTIONS)
    return wide.select(
        "topic",
        F.expr(
            f"stack({len(EMOTIONS)}, {stack_args}) AS (emotion, counts)"
        ),
    )


_UNPIVOT_ARMS = "\nUNION ALL\n".join(
    f"SELECT topic, '{e}' AS emotion, {e} AS counts FROM wide" for e in EMOTIONS
)

UNPIVOT_EMOTIONS_SQL = f"""
WITH enriched AS (
  SELECT lang, (['anger','fear','joy','love','sadness','surprise'])[(length(text) % 6) + 1] AS emotion
  FROM documents
),
wide AS (
  SELECT lang AS topic,
    {", ".join(f"count(*) FILTER (WHERE emotion = '{e}') AS {e}" for e in EMOTIONS)}
  FROM enriched GROUP BY lang
)
{_UNPIVOT_ARMS}
"""


def topic_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/P13: per-topic counts and share-of-total.

    The pandas ``counts / counts.sum()`` percent-of-total runs on the
    pre-aggregated |topics| frame; the total is a 1-row broadcast
    cross join (r10: window-free — never an ``over ()`` even on the
    bounded frame, so the GWIN! lint needs no allowlist entry), and
    never applies to the raw table.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(F.col("event_type").alias("topic")).agg(
        F.count(F.lit(1)).alias("counts")
    ).localCheckpoint(eager=True)  # two consumers: total + projection
    total = counts.agg(F.sum("counts").alias("tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "topic",
            "counts",
            F.round(
                F.col("counts").cast("double") / F.col("tot"), 6
            ).alias("share"),
        )
    )


TOPIC_SHARE_SQL = """
WITH counts AS (
  SELECT event_type AS topic, count(*) AS counts FROM events GROUP BY event_type
)
SELECT topic, counts,
       round(CAST(counts AS DOUBLE) / sum(counts) OVER (), 6) AS share
FROM counts
"""


def grains_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4-A6 via GROUPING SETS: the dashboard's Global/Day/Hour grains
    in one aggregation pass (one shuffle instead of three).

    value sums are decimal-exact then cast to double; the grain label
    is derived from which keys are null (date/hour derivations are
    never null on real rows).
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_gs")
    return spark.sql(
        f"""
        SELECT
          event_type AS topic,
          date_format(ts, 'yyyy-MM-dd') AS date,
          date_format(ts, 'HH') AS hour,
          CASE WHEN date_format(ts, 'yyyy-MM-dd') IS NULL THEN 'topic'
               WHEN date_format(ts, 'HH') IS NULL THEN 'topic_date'
               ELSE 'topic_date_hour' END AS grain,
          count(*) AS counts,
          CAST(sum(CAST(value AS {_VAL_DEC})) AS DOUBLE) AS total_value
        FROM events_gs
        GROUP BY GROUPING SETS (
          (event_type),
          (event_type, date_format(ts, 'yyyy-MM-dd')),
          (event_type, date_format(ts, 'yyyy-MM-dd'), date_format(ts, 'HH'))
        )
        """
    )


GRAINS_GROUPING_SETS_SQL = """
SELECT
  event_type AS topic,
  strftime(ts, '%Y-%m-%d') AS date,
  strftime(ts, '%H') AS hour,
  CASE WHEN strftime(ts, '%Y-%m-%d') IS NULL THEN 'topic'
       WHEN strftime(ts, '%H') IS NULL THEN 'topic_date'
       ELSE 'topic_date_hour' END AS grain,
  count(*) AS counts,
  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY GROUPING SETS (
  (event_type),
  (event_type, strftime(ts, '%Y-%m-%d')),
  (event_type, strftime(ts, '%Y-%m-%d'), strftime(ts, '%H'))
)
"""


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: boxplot statistics per topic (exact percentiles).

    Altair computes quartiles browser-side from the full frame
    (``streamlit/charts/charts.py:173-199``); the engine computes
    them in-cluster. Exact ``percentile`` is fine per bounded group;
    for 100 TB unbounded groups switch to ``percentile_approx``
    (t-digest, mergeable, single pass) — same call shape.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("topic")).agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


VALUE_PERCENTILES_SQL = """
SELECT
  event_type AS topic,
  round(quantile_cont(value, 0.25), 6) AS p25,
  round(quantile_cont(value, 0.50), 6) AS p50,
  round(quantile_cont(value, 0.75), 6) AS p75,
  min(value) AS vmin,
  max(value) AS vmax
FROM events
GROUP BY event_type
"""


def latest_inputs(spark: SparkSession, sf_dir: str, k: int = 25) -> DataFrame:
    """D3: the dashboard's tail(25) — top-k by recency.

    Runs as TakeOrderedAndProject: each task keeps k rows, the
    driver merges k*tasks — no global sort, no full collect.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(k)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


LATEST_INPUTS_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM events
ORDER BY ts DESC, event_id DESC
LIMIT 25
"""


def hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time aggregation (batch twin of the
    streaming job in streaming/windowed.py — same expression works
    under readStream + watermark).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"),
            F.col("event_type").alias("topic"),
        )
        .agg(
            F.count(F.lit(1)).alias("counts"),
            F.sum(F.col("value").cast(_VAL_DEC)).cast("double").alias(
                "total_value"
            ),
        )
        .select(F.col("w.start").alias("window_start"), "topic", "counts", "total_value")
    )


HOURLY_WINDOW_SQL = """
SELECT
  time_bucket(INTERVAL '1 hour', ts) AS window_start,
  event_type AS topic,
  count(*) AS counts,
  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


def topic_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+A6: per-topic mean value plus the grand mean across topics
    (the dashboard's red rule line) — ONE corpus pass (the |topics|
    aggregate is checkpointed and feeds both the 1-row grand total,
    broadcast back, and the per-topic projection; r10: window-free,
    no GWIN! allowlist entry needed).
    """
    ev = load_table(spark, sf_dir, "events")
    per_topic = ev.groupBy(F.col("event_type").alias("topic")).agg(
        F.sum(F.col("value").cast(_VAL_DEC)).alias("sum_dec"),
        F.count(F.lit(1)).alias("n"),
    ).localCheckpoint(eager=True)  # two consumers: totals + projection
    totals = per_topic.agg(
        F.sum("sum_dec").alias("gs"), F.sum("n").alias("gn")
    )
    return per_topic.crossJoin(F.broadcast(totals)).select(
        "topic",
        F.round(F.col("sum_dec").cast("double") / F.col("n"), 6).alias(
            "avg_value"
        ),
        F.round(
            F.col("gs").cast("double") / F.col("gn"),
            6,
        ).alias("grand_avg"),
    )


TOPIC_MEANS_SQL = """
WITH per_topic AS (
  SELECT event_type AS topic,
         sum(CAST(value AS DECIMAL(12,2))) AS sum_dec,
         count(*) AS n
  FROM events GROUP BY event_type
)
SELECT topic,
       round(CAST(sum_dec AS DOUBLE) / n, 6) AS avg_value,
       round(CAST(sum(sum_dec) OVER () AS DOUBLE) / sum(n) OVER (), 6) AS grand_avg
FROM per_topic
"""


def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) per group (SURVEY §2.4 'absent but free').

    Exact distinct = expand + two-phase aggregate (one extra shuffle
    on the distinct key). The approx path (approx_count_distinct /
    HyperLogLog, mergeable sketches, no second shuffle) is the 100 TB
    default — exposed as the non-oracle column in unit tests only.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("topic")).agg(
        F.countDistinct("user_id").alias("unique_users"),
        F.count(F.lit(1)).alias("counts"),
    )


DISTINCT_USERS_SQL = """
SELECT event_type AS topic,
       count(DISTINCT user_id) AS unique_users,
       count(*) AS counts
FROM events
GROUP BY event_type
"""


SESSION_GAP_SECONDS = 1800


def _with_session_idx(ev: DataFrame) -> DataFrame:
    """lag -> gap flag -> running sum = sess_idx: the ONE definition
    of session boundaries (sessionize and session_paths share it)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = epoch_us(F.col("ts"))
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | ((us - prev) > SESSION_GAP_SECONDS * 1_000_000), 1
    ).otherwise(0)
    return ev.withColumn("sess_idx", F.sum(new_sess).over(wrun))


# the flagged/sess CTE pair — the SQL twin of _with_session_idx
SESS_CTE_SQL = f"""flagged AS (
  SELECT *,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_SECONDS} * 1000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
  FROM flagged
)"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) per user — the batch twin of
    streaming session windows (streaming/windowed.py uses
    F.session_window over the same stream).

    lag -> new-session flag -> running sum = session index: two
    window passes over one shuffle on user_id. Timestamp math in
    integer microseconds (unix_micros/epoch_us) so both engines
    compare exactly.
    """
    with_sess = _with_session_idx(load_table(spark, sf_dir, "events"))
    return with_sess.groupBy("user_id", "sess_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(_VAL_DEC)).cast("double").alias("total_value"),
    )


SESSIONIZE_SQL = f"""
WITH {SESS_CTE_SQL}
SELECT user_id, sess_idx,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM sess
GROUP BY user_id, sess_idx
"""


def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via Spark's BUILT-IN ``F.session_window``
    (the operator the streaming twin ``streaming/windowed.py
    session_stats`` runs with a watermark) — oracle-paired so the
    built-in's merge semantics are value-hash-checked, not just
    equivalence-tested against the lag-cumsum plan.

    Boundary rule pinned exactly (verified empirically: two events
    EXACTLY 30 min apart produce ONE session): session_window merges
    events up to and including a gap of the full duration, i.e. a
    new session opens only on ``> gap`` — the same rule as
    :data:`SESS_CTE_SQL`, and the SQL twin uses the same ``>``. One
    shuffle on user_id, sessions aggregate inside the same hash
    aggregation (no window pass at all).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_SECONDS} seconds"),
            "user_id",
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


SESSION_WINDOW_STATS_SQL = f"""
WITH flagged AS (
  SELECT *,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_SECONDS} * 1000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events
FROM sess
GROUP BY user_id, sess_idx
"""


def rollup_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (topic, date): hierarchical totals incl. grand
    total — the cube/rollup family SURVEY §2.4 lists as free in
    Spark. Same single-shuffle property as GROUPING SETS.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.col("event_type").alias("topic"),
            F.date_format("ts", "yyyy-MM-dd").alias("date"),
            F.col("value").cast(_VAL_DEC).alias("v"),
        )
        .rollup("topic", "date")
        .agg(
            F.count(F.lit(1)).alias("counts"),
            F.sum("v").cast("double").alias("total_value"),
        )
    )


ROLLUP_VALUE_SQL = """
SELECT event_type AS topic,
       strftime(ts, '%Y-%m-%d') AS date,
       count(*) AS counts,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (event_type, strftime(ts, '%Y-%m-%d'))
"""


def cube_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (topic, date): all 4 grouping combinations — the last
    member of the §2.4 grouping family (GROUPING SETS and ROLLUP are
    oracle-checked beside it). Still one shuffle: Spark expands the
    grouping-set rows map-side before the exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.col("event_type").alias("topic"),
            F.date_format("ts", "yyyy-MM-dd").alias("date"),
            F.col("value").cast(_VAL_DEC).alias("v"),
        )
        .cube("topic", "date")
        .agg(
            F.count(F.lit(1)).alias("counts"),
            F.sum("v").cast("double").alias("total_value"),
        )
    )


CUBE_VALUE_SQL = """
SELECT event_type AS topic,
       strftime(ts, '%Y-%m-%d') AS date,
       count(*) AS counts,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY CUBE (event_type, strftime(ts, '%Y-%m-%d'))
"""


def loyal_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (SURVEY §2.5 'absent but free'): users who
    purchased AND clicked but never errored —
    INTERSECT then EXCEPT of distinct user sets. Each set op is a
    shuffle on user_id with distinct semantics.
    """
    ev = load_table(spark, sf_dir, "events")

    def users(t: str) -> DataFrame:
        return ev.where(F.col("event_type") == t).select("user_id").distinct()

    return (
        users("purchase").intersect(users("click")).exceptAll(users("error"))
    )


LOYAL_PURCHASERS_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error'
"""


def moving_avg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily event counts per topic — the
    trend-smoothing window every monitoring dashboard wants.
    Aggregation first (|topics| x |days| rows), window second: the
    sliding frame never touches raw events.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("topic"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.count(F.lit(1)).alias("counts"))
    w = (
        Window.partitionBy("topic")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "topic",
        "day",
        "counts",
        F.round(F.avg("counts").over(w), 6).alias("ma7"),
    )


MOVING_AVG_DAILY_SQL = """
WITH daily AS (
  SELECT event_type AS topic, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS counts
  FROM events GROUP BY 1, 2
)
SELECT topic, day, counts,
       round(avg(counts) OVER (PARTITION BY topic ORDER BY day
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
FROM daily
"""


def value_quartile_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) bucket per event within its topic (total order on
    (value, event_id) so bucket boundaries are reproducible)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    return ev.select(
        F.col("event_id"),
        F.col("event_type").alias("topic"),
        F.col("value"),
        F.ntile(4).over(w).alias("quartile"),
    )


VALUE_QUARTILE_ASSIGNMENTS_SQL = """
SELECT event_id, event_type AS topic, value,
       ntile(4) OVER (PARTITION BY event_type
                      ORDER BY value ASC, event_id ASC) AS quartile
FROM events
"""


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width binning (width 50) per topic — histogram as a
    plain aggregation; at scale this replaces collecting values for
    client-side histograms entirely."""
    ev = load_table(spark, sf_dir, "events")
    bin_lo = (F.floor(F.col("value") / 50) * 50).cast("long")
    return ev.groupBy(
        F.col("event_type").alias("topic"), bin_lo.alias("bin_lo")
    ).agg(F.count(F.lit(1)).alias("counts"))


VALUE_HISTOGRAM_SQL = """
SELECT event_type AS topic,
       CAST(floor(value / 50) * 50 AS BIGINT) AS bin_lo,
       count(*) AS counts
FROM events
GROUP BY 1, 2
"""


def cumulative_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total of daily counts per topic (exact long sums over
    a sorted window — the cumulative chart)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("topic"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.count(F.lit(1)).alias("counts"))
    w = (
        Window.partitionBy("topic")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "topic", "day", "counts", F.sum("counts").over(w).alias("cum_counts")
    )


CUMULATIVE_DAILY_COUNTS_SQL = """
WITH daily AS (
  SELECT event_type AS topic, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS counts
  FROM events GROUP BY 1, 2
)
SELECT topic, day, counts,
       CAST(sum(counts) OVER (PARTITION BY topic ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_counts
FROM daily
"""


FUNNEL_WINDOW_SECONDS = 3600


def signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: users who purchase within an hour of a
    signup. Semi-join keeps only existence (no pair explosion);
    distinct user sets give the conversion rate as one exact ratio.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("s_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        s.join(
            p,
            (s.user_id == p.p_user)
            & (epoch_us("p_ts") > epoch_us("s_ts"))
            & (
                epoch_us("p_ts")
                <= epoch_us("s_ts") + FUNNEL_WINDOW_SECONDS * 1_000_000
            ),
            "left_semi",
        )
        .select("user_id")
        .distinct()
    )
    signups = s.select("user_id").distinct()
    # One declarative plan: both distinct sets collapse to 1-row
    # aggregates cross-joined on the executors — no driver .count()
    # actions, no double execution of the shared lineage.
    n_s = signups.agg(F.count(F.lit(1)).alias("signup_users"))
    n_c = converted.agg(F.count(F.lit(1)).alias("converted_users"))
    return n_s.crossJoin(n_c).select(
        "signup_users",
        "converted_users",
        F.coalesce(
            F.round(
                F.col("converted_users").cast("double")
                / F.nullif(F.col("signup_users"), F.lit(0)),
                6,
            ),
            F.lit(0.0),
        ).alias("conversion_rate"),
    )


SIGNUP_PURCHASE_FUNNEL_SQL = f"""
WITH s AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'),
conv AS (
  SELECT DISTINCT e.user_id
  FROM events e
  WHERE e.event_type = 'signup'
    AND EXISTS (
      SELECT 1 FROM events p
      WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
        AND epoch_us(p.ts) > epoch_us(e.ts)
        AND epoch_us(p.ts) <= epoch_us(e.ts) + CAST({FUNNEL_WINDOW_SECONDS} AS BIGINT) * 1000000
    )
)
SELECT (SELECT count(*) FROM s) AS signup_users,
       (SELECT count(*) FROM conv) AS converted_users,
       coalesce(round(CAST((SELECT count(*) FROM conv) AS DOUBLE)
             / NULLIF((SELECT count(*) FROM s), 0), 6), 0.0) AS conversion_rate
"""


PATH_TOP_K = 20


def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K user-journey paths: the ordered event-type sequence of
    each session (gap-based, same recipe as :func:`sessionize`),
    counted across all sessions — the funnel-path analytics query.

    The path string is built ORDER-FREE: collect_list gives no
    ordering guarantee under distributed aggregation, so events are
    collected as (ts, event_id, type) structs, array_sort'ed (total
    order with the event_id tiebreak), then projected — deterministic
    on any partitioning. One shuffle on user_id (windows + the
    session group share it), one tiny shuffle on the path for the
    final count, TakeOrderedAndProject for the top-K.
    """
    with_sess = _with_session_idx(load_table(spark, sf_dir, "events"))
    paths = with_sess.groupBy("user_id", "sess_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(epoch_us("ts").alias("us"), "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(PATH_TOP_K)
    )


SESSION_PATHS_SQL = f"""
WITH {SESS_CTE_SQL},
paths AS (
  SELECT user_id, sess_idx,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY user_id, sess_idx
)
SELECT path, count(*) AS n_sessions
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT {PATH_TOP_K}
"""


Z_THRESHOLD = 3.0


def value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-topic z-score outliers (|z| > 3): the monitoring query a
    serving pipeline runs over incoming metric values.

    Moments are computed as EXACT decimal sums (sum v, sum v²) and
    only divided in double at the end — so mean/variance are
    order-independent under distributed partial aggregation, and the
    z-score itself is a fixed chain of IEEE ops both engines execute
    identically. One aggregation + one broadcast join back to rows.

    A degenerate topic (all values equal, std=0) emits no anomaly
    rows: the divisor is nullif(std, 0) on both engines, so z is
    NULL there rather than NaN/Inf — engine-dependent division and
    NaN-ordering semantics never enter the comparison.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast(_VAL_DEC)
    moments = (
        ev.select(F.col("event_type").alias("m_topic"), v.alias("v"))
        .groupBy("m_topic")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s1"),
            F.sum(F.col("v") * F.col("v")).alias("s2"),
        )
        .select(
            "m_topic",
            (F.col("s1").cast("double") / F.col("n")).alias("mean"),
            F.sqrt(
                F.col("s2").cast("double") / F.col("n")
                - (F.col("s1").cast("double") / F.col("n"))
                * (F.col("s1").cast("double") / F.col("n"))
            ).alias("std"),
        )
    )
    return (
        ev.join(F.broadcast(moments), ev.event_type == F.col("m_topic"))
        .select(
            "event_id",
            F.col("event_type").alias("topic"),
            F.col("value").alias("value"),
            F.round(
                (F.col("value").cast(_VAL_DEC).cast("double") - F.col("mean"))
                / F.nullif(F.col("std"), F.lit(0.0)),
                6,
            ).alias("z"),
        )
        .where(F.abs(F.col("z")) > Z_THRESHOLD)
    )


VALUE_ANOMALIES_SQL = f"""
WITH moments AS (
  SELECT event_type AS m_topic,
         count(*) AS n,
         sum(CAST(value AS DECIMAL(12,2))) AS s1,
         sum(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS s2
  FROM events GROUP BY event_type
),
stats AS (
  SELECT m_topic,
         CAST(s1 AS DOUBLE) / n AS mean,
         sqrt(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS std
  FROM moments
)
SELECT event_id, event_type AS topic, value,
       round((CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) - mean) / nullif(std, 0), 6) AS z
FROM events JOIN stats ON event_type = m_topic
WHERE abs(round((CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) - mean) / nullif(std, 0), 6)) > {Z_THRESHOLD}
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention matrix: users grouped by first-activity
    date, counted (distinct) at each day offset they return.

    Two aggregations, both keyed tightly: the cohort derivation is a
    (user_id) min — one shuffle that at scale is a map-side-combined
    2-column exchange; the matrix itself groups the (user, day)
    distinct pairs, so the second exchange carries at most
    |users| x |active days| narrow rows. No windows, no joins except
    the broadcast-sized cohort table re-join.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    cohorts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.dropDuplicates(["user_id", "day"])
        .join(cohorts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


RETENTION_COHORTS_SQL = """
WITH ev AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
cohorts AS (
  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
)
SELECT c.cohort_day,
       date_diff('day', c.cohort_day, e.day) AS day_offset,
       count(DISTINCT e.user_id) AS n_users
FROM ev e JOIN cohorts c ON e.user_id = c.user_id
GROUP BY 1, 2
"""


def props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload analytics: extract the JSON ``props.k``
    metric and aggregate per topic — the P-family pattern (reference
    parses tweet JSON with from_json; here the payload column is
    JSON-per-row). Extraction is a map-side get_json_object; exact
    integer sums divide to double once at the end.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(F.col("event_type").alias("topic"), k.alias("k"))
        .groupBy("topic")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
            F.round(F.sum("k").cast("double") / F.count(F.lit(1)), 6).alias(
                "k_avg"
            ),
        )
    )


PROPS_STATS_SQL = """
SELECT event_type AS topic,
       count(*) AS n,
       -- DuckDB sum(BIGINT) widens to HUGEINT (float64 via pandas); cast
       -- back so the value hash matches Spark's LongType sum.
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
       round(CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / count(*), 6) AS k_avg
FROM events
GROUP BY event_type
"""


WAU_WINDOW_DAYS = 7


def weekly_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + trailing-7-day WAU per day.

    Distinct (user, day) pairs first (one shuffle, map-side
    combined), then the pair table joins the tiny broadcast day list
    on a 7-day range — count-distinct-over-window without window
    count-distinct (unsupported), and the join fan-out is bounded at
    7 rows per pair regardless of corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select("user_id", F.to_date("ts").alias("day")).dropDuplicates(
        ["user_id", "day"]
    )
    days = pairs.select("day").dropDuplicates(["day"]).select(
        F.col("day").alias("d")
    )
    ranged = pairs.join(
        F.broadcast(days),
        (F.col("day") <= F.col("d"))
        & (F.col("day") > F.date_sub(F.col("d"), WAU_WINDOW_DAYS)),
    )
    wau = ranged.groupBy("d").agg(F.count_distinct("user_id").alias("wau"))
    dau = pairs.groupBy(F.col("day").alias("d")).agg(
        F.count_distinct("user_id").alias("dau")
    )
    return (
        dau.join(wau, "d")
        .select(F.col("d").alias("day"), "dau", "wau")
    )


WEEKLY_ACTIVE_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
days AS (SELECT DISTINCT day AS d FROM pairs),
wau AS (
  SELECT d, count(DISTINCT user_id) AS wau
  FROM pairs JOIN days
    ON day <= d AND day > d - INTERVAL {WAU_WINDOW_DAYS} DAY
  GROUP BY d
),
dau AS (
  SELECT day AS d, count(DISTINCT user_id) AS dau FROM pairs GROUP BY day
)
SELECT dau.d AS day, dau.dau, wau.wau
FROM dau JOIN wau ON dau.d = wau.d
"""


def hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularized hourly series per event_type: generate the full
    hour spine between the corpus's min and max hour, zero-fill
    missing count cells, and forward-fill the last observed hourly
    mean value — the resample/ffill step every time-series consumer
    (dashboards, feature windows, anomaly baselines) needs before
    treating event data as a regular grid.

    Scale shape: the raw scan collapses to |hours|x|types| aggregate
    rows BEFORE any spine work; the spine itself is one explode of a
    1-row sequence (bounded: hours in range), cross-joined against
    the broadcast distinct-type set; the forward fill is one window
    per type over the bounded grid. Nothing downstream of the first
    aggregation scales with the corpus.
    """
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(
        hour.alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("counts"),
        F.round(
            F.sum(F.col("value").cast(_VAL_DEC)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("avg_value"),
    )
    spine = (
        ev.agg(
            F.min(hour).alias("h0"), F.max(hour).alias("h1")
        )
        .select(
            F.explode(
                F.expr("sequence(h0, h1, INTERVAL 1 HOUR)")
            ).alias("hour")
        )
    )
    types = ev.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce(F.col("counts"), F.lit(0)).alias("counts"),
            F.last("avg_value", ignorenulls=True)
            .over(w)
            .alias("avg_value_ffill"),
        )
    )


HOURLY_GAPFILL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS counts,
         round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_value
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT min(date_trunc('hour', ts)) AS h0, max(date_trunc('hour', ts)) AS h1
  FROM events
),
spine AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
grid AS (SELECT s.hour, t.event_type FROM spine s CROSS JOIN types t)
SELECT g.hour, g.event_type,
       coalesce(h.counts, 0) AS counts,
       last_value(h.avg_value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value_ffill
FROM grid g
LEFT JOIN hourly h ON g.hour = h.hour AND g.event_type = h.event_type
"""


def _trend_rank(daily: DataFrame) -> DataFrame:
    """The trend core shared by the raw-events query and the
    serving-table read: lag over days per topic, rank by rise."""
    lagw = Window.partitionBy("topic").orderBy("day")
    with_prev = daily.withColumn(
        "prev_counts",
        F.coalesce(F.lag("counts").over(lagw), F.lit(0)).cast("long"),
    ).withColumn(
        "delta", (F.col("counts") - F.col("prev_counts")).cast("long")
    )
    rankw = Window.partitionBy("day").orderBy(
        F.desc("delta"), F.asc("topic")
    )
    return with_prev.withColumn(
        "trend_rank", F.row_number().over(rankw)
    )


def trending_from_serving(hourly: DataFrame) -> DataFrame:
    """Trend read over the PUBLISHED hourly serving table — how the
    dashboard computes :func:`trending_topics` without touching raw
    events (the reference's EP3 read path): roll the (window_start,
    topic, counts) cells to days, then the shared lag/rank core.
    Input is |hours| x |topics| rows, so every window here operates
    on a pre-aggregated frame."""
    daily = hourly.groupBy(
        F.to_date("window_start").alias("day"), "topic"
    ).agg(F.sum("counts").cast("long").alias("counts"))
    return _trend_rank(daily)


def trending_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, topic, counts, prev_counts, delta, trend_rank): the
    TREND query the reference app exists for — per day, topics
    ranked by RISE over the previous day (trending = accelerating,
    not merely large; a perennially-big topic with flat volume ranks
    below a small one doubling). First-day rows rank against a zero
    baseline.

    Scale shape: one grouped aggregation to the |days| x |topics|
    frame, then lag + rank windows OVER THAT tiny frame — the same
    pre-aggregate-then-window discipline as topic_share; the raw
    table never sees a window.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"),
        F.col("event_type").alias("topic"),
    ).agg(F.count(F.lit(1)).alias("counts"))
    return _trend_rank(daily)


TRENDING_TOPICS_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type AS topic,
         CAST(count(*) AS BIGINT) AS counts
  FROM events GROUP BY 1, 2
),
with_prev AS (
  SELECT day, topic, counts,
         CAST(COALESCE(lag(counts) OVER (PARTITION BY topic
                                         ORDER BY day), 0) AS BIGINT)
           AS prev_counts
  FROM daily
)
SELECT day, topic, counts, prev_counts,
       CAST(counts - prev_counts AS BIGINT) AS delta,
       row_number() OVER (PARTITION BY day
                          ORDER BY counts - prev_counts DESC, topic ASC)
         AS trend_rank
FROM with_prev
"""


# ---------------------------------------------------------------------------
# Ordered conversion funnel: view -> click -> purchase, each stage
# required to happen AT OR AFTER the user's entry into the previous
# stage (min-ts semantics, so a click before any view doesn't count).
FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stage, stage_order, n_users, conversion_bp): how many users
    reach each funnel stage in order, and the stage-over-previous
    conversion rate in integer basis points (floor; the first stage
    is 10000 by definition; NULL when the previous stage is empty).

    Scale shape: the three stage timestamps are CHAINED window
    minima over the SAME user_id partitioning — Catalyst plans one
    Exchange on user_id and evaluates the windows in sequence inside
    it; the tally is a |stages|-row rollup of the per-user frame. No
    joins, no second corpus scan.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_us("ts").alias("us")
    )
    w = Window.partitionBy("user_id")
    mv = F.min(
        F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("us"))
    ).over(w)
    step1 = ev.withColumn("mv", mv)
    mc = F.min(
        F.when(
            (F.col("event_type") == FUNNEL_STAGES[1])
            & (F.col("us") >= F.col("mv")),
            F.col("us"),
        )
    ).over(w)
    step2 = step1.withColumn("mc", mc)
    mp = F.min(
        F.when(
            (F.col("event_type") == FUNNEL_STAGES[2])
            & (F.col("us") >= F.col("mc")),
            F.col("us"),
        )
    ).over(w)
    per_user = (
        step2.withColumn("mp", mp)
        .select("user_id", "mv", "mc", "mp")
        .distinct()
    )
    tally = per_user.agg(
        F.sum(F.col("mv").isNotNull().cast("long")).alias("n_view"),
        F.sum(F.col("mc").isNotNull().cast("long")).alias("n_click"),
        F.sum(F.col("mp").isNotNull().cast("long")).alias("n_purchase"),
    )
    return tally.selectExpr(
        f"""stack(3,
          '{FUNNEL_STAGES[0]}', 1, n_view,
            CASE WHEN n_view > 0 THEN CAST(10000 AS BIGINT) END,
          '{FUNNEL_STAGES[1]}', 2, n_click,
            CASE WHEN n_view > 0
                 THEN (10000 * n_click) div n_view END,
          '{FUNNEL_STAGES[2]}', 3, n_purchase,
            CASE WHEN n_click > 0
                 THEN (10000 * n_purchase) div n_click END
        ) AS (stage, stage_order, n_users, conversion_bp)"""
    )


FUNNEL_CONVERSION_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
),
s1 AS (
  SELECT *, min(CASE WHEN event_type = '{FUNNEL_STAGES[0]}' THEN us END)
              OVER (PARTITION BY user_id) AS mv
  FROM ev
),
s2 AS (
  SELECT *, min(CASE WHEN event_type = '{FUNNEL_STAGES[1]}'
                      AND us >= mv THEN us END)
              OVER (PARTITION BY user_id) AS mc
  FROM s1
),
s3 AS (
  SELECT *, min(CASE WHEN event_type = '{FUNNEL_STAGES[2]}'
                      AND us >= mc THEN us END)
              OVER (PARTITION BY user_id) AS mp
  FROM s2
),
per_user AS (SELECT DISTINCT user_id, mv, mc, mp FROM s3),
tally AS (
  SELECT CAST(sum(CASE WHEN mv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_view,
         CAST(sum(CASE WHEN mc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_click,
         CAST(sum(CASE WHEN mp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purchase
  FROM per_user
)
SELECT stage, stage_order, n_users, conversion_bp FROM (
  SELECT '{FUNNEL_STAGES[0]}' AS stage, 1 AS stage_order,
         n_view AS n_users,
         CASE WHEN n_view > 0 THEN CAST(10000 AS BIGINT) END
           AS conversion_bp
  FROM tally
  UNION ALL
  SELECT '{FUNNEL_STAGES[1]}', 2, n_click,
         CASE WHEN n_view > 0
              THEN CAST((10000 * n_click) // n_view AS BIGINT) END
  FROM tally
  UNION ALL
  SELECT '{FUNNEL_STAGES[2]}', 3, n_purchase,
         CASE WHEN n_click > 0
              THEN CAST((10000 * n_purchase) // n_click AS BIGINT) END
  FROM tally
)
"""


# ---------------------------------------------------------------------------
# Trailing-window anomaly flags over the hourly event series — the
# ops-dashboard alert complement of trending_topics. All-integer
# 3-sigma rule via cross-multiplication, so the flag is bit-exact on
# every engine (no stddev float seam).
ANOM_W = 24  # trailing observed-hour window


def hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, hour_ts, n, trail_n, is_anomaly): per event type
    and hour, the event count and whether it sits more than 3
    trailing standard deviations from the trailing-ANOM_W mean.
    Exact integers: |x - s/c| > 3*sigma is evaluated as
    (c*x - s)^2 > 9*(c*ssq - s^2) — both sides integer, no float
    math. Hours are flagged only with a FULL trailing window
    (trail_n = ANOM_W of the preceding OBSERVED hours; a series with
    gaps compares against the last 24 observed points, the
    ops-dashboard convention for sparse series).

    Scale shape: one (event_type, hour) count (the only corpus-sized
    reduce), then windows over the |types| x |hours| series — the
    rollup relation, not events.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hour_ts"),
    )
    hourly = ev.groupBy("event_type", "hour_ts").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-ANOM_W, -1)
    )
    trail = hourly.select(
        "event_type",
        "hour_ts",
        "n",
        F.count(F.lit(1)).over(w).alias("c"),
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("ssq"),
    )
    # integer multiply, NOT **2: pow routes through double and loses
    # exactness above 2^53, silently diverging from the twin's
    # integer arithmetic on high-volume hours
    dev = F.col("c") * F.col("n") - F.col("s")
    lhs = dev * dev
    rhs = F.lit(9) * (F.col("c") * F.col("ssq") - F.col("s") * F.col("s"))
    return trail.select(
        "event_type",
        "hour_ts",
        "n",
        F.col("c").cast("long").alias("trail_n"),
        (
            (F.col("c") == ANOM_W)
            & (lhs.cast("long") > rhs.cast("long"))
        ).alias("is_anomaly"),
    )


HOURLY_ANOMALIES_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
trail AS (
  SELECT event_type, hour_ts, n,
         CAST(count(*) OVER tw AS BIGINT) AS c,
         CAST(sum(n) OVER tw AS BIGINT) AS s,
         CAST(sum(n * n) OVER tw AS BIGINT) AS ssq
  FROM hourly
  WINDOW tw AS (PARTITION BY event_type ORDER BY hour_ts
                ROWS BETWEEN {ANOM_W} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour_ts, n, c AS trail_n,
       c = {ANOM_W} AND (c * n - s) * (c * n - s) > 9 * (c * ssq - s * s)
         AS is_anomaly
FROM trail
"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(from_type, to_type, n, p_bp): the first-order Markov
    transition matrix over WITHIN-SESSION consecutive event pairs —
    the behavioral model behind next-action prediction and funnel
    diagnostics. Row-normalized probabilities in integer basis
    points (n * 10000 // row_total, exact on every engine).

    Session boundaries come from the ONE shared definition
    (:func:`_with_session_idx`), so a transition never spans the
    30-minute gap. Plan: the same single user_id shuffle the session
    family rides (lag over (user_id, sess_idx)), then a reduce onto
    at most |event_types|^2 keys — output is corpus-independent.
    """
    with_sess = _with_session_idx(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id", "sess_idx").orderBy("ts", "event_id")
    pairs = (
        with_sess.withColumn("from_type", F.lag("event_type").over(w))
        .where(F.col("from_type").isNotNull())
        .select("from_type", F.col("event_type").alias("to_type"))
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    # row total over the tiny |types|^2 relation; integer DIV keeps
    # the basis points exact on every engine
    return counts.withColumn(
        "row_total", F.sum("n").over(Window.partitionBy("from_type"))
    ).select(
        "from_type",
        "to_type",
        "n",
        F.expr("CAST((n * 10000L) DIV row_total AS BIGINT)").alias("p_bp"),
    )


EVENT_TRANSITIONS_SQL = f"""
WITH {SESS_CTE_SQL},
pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id, sess_idx
                               ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM sess
),
counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST((n * 10000) // sum(n) OVER (PARTITION BY from_type)
            AS BIGINT) AS p_bp
FROM counts
"""


def rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, recency_days, frequency, monetary, r_score, f_score,
    m_score, rfm): the classic CRM segmentation — per purchasing
    user, days since last purchase (vs the corpus max ts), purchase
    count, and exact decimal-summed spend, each quintiled into 1-5
    with 5 = best (most recent / most frequent / highest spend).
    ``rfm`` is the composite r*100 + f*10 + m.

    Determinism: every ntile runs over a TOTAL order (metric then
    user_id), so bucket edges are engine-exact; monetary sums in
    DECIMAL before the double cast. Scale shape: one user_id-keyed
    reduce over purchase rows; each quintile is the DISTRIBUTED exact
    ntile (functions/ranking.py: repartitionByRange + bounded
    per-partition offsets + partition-local windows — no
    single-partition WindowExec anywhere in the plan; pinned by
    test_plans). The three passes chain, so the narrow per-user
    row rides three range-balanced shuffles and joins nothing.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase")
    mx = p.agg(F.max(epoch_us(F.col("ts"))).alias("mx"))
    per_user = (
        p.groupBy("user_id")
        .agg(
            F.max(epoch_us(F.col("ts"))).alias("last_us"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("value").cast(_VAL_DEC)).cast("double").alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.expr("CAST((mx - last_us) DIV 86400000000L AS BIGINT)").alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    d = exact_global_ntile(
        per_user, [F.desc("recency_days"), F.asc("user_id")], 5, "r_score"
    )
    d = exact_global_ntile(
        d, [F.asc("frequency"), F.asc("user_id")], 5, "f_score"
    )
    d = exact_global_ntile(
        d, [F.asc("monetary"), F.asc("user_id")], 5, "m_score"
    )
    return d.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
    ).withColumn(
        "rfm",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast(
            "int"
        ),
    )


RFM_SCORES_SQL = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
mx AS (SELECT max(epoch_us(ts)) AS mx FROM p),
per_user AS (
  SELECT user_id,
         CAST((mx - max(epoch_us(ts))) // 86400000000 AS BIGINT)
           AS recency_days,
         count(*) AS frequency,
         CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS monetary
  FROM p CROSS JOIN mx
  GROUP BY user_id, mx
)
SELECT user_id, recency_days, frequency, monetary,
       ntile(5) OVER (ORDER BY recency_days DESC, user_id ASC) AS r_score,
       ntile(5) OVER (ORDER BY frequency ASC, user_id ASC) AS f_score,
       ntile(5) OVER (ORDER BY monetary ASC, user_id ASC) AS m_score,
       CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id ASC) * 100
            + ntile(5) OVER (ORDER BY frequency ASC, user_id ASC) * 10
            + ntile(5) OVER (ORDER BY monetary ASC, user_id ASC)
            AS INTEGER) AS rfm
FROM per_user
"""


# ---------------------------------------------------------------------------
# Market-basket co-occurrence: which event types happen together in
# a session, beyond what their independent rates explain. The
# association signal behind "users who X also Y" — all-integer lift.


def item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(type_a, type_b, n_sessions, lift_micro): for each unordered
    event-type pair, the number of sessions containing BOTH, and the
    lift ``P(a,b) / (P(a) * P(b))`` over sessions in integer
    micro-units: ``(n_ab * S * 1_000_000) DIV (n_a * n_b)``.

    Lift > 1e6 means the pair co-occurs more than independence
    predicts (a real association rule); < 1e6 means the types repel
    (e.g. error-then-churn sessions never purchase).

    Scale shape: session membership distincts on (user_id, sess_idx,
    event_type) — riding the session family's single user_id
    exchange; the pair join is keyed on the session id and each side
    holds at most |event_types| rows per session, so the join output
    is bounded by |types|^2 per session and the final reduce lands on
    at most |types|^2 keys. Marginals broadcast. Output is
    corpus-independent.
    """
    with_sess = _with_session_idx(load_table(spark, sf_dir, "events"))
    membership = (
        with_sess.select("user_id", "sess_idx", "event_type")
        .distinct()
        .localCheckpoint(eager=True)  # three consumers below
    )
    s_tot = membership.select("user_id", "sess_idx").distinct().count()
    marg = membership.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_t")
    )
    a = membership.selectExpr(
        "user_id", "sess_idx", "event_type AS type_a"
    )
    b = membership.selectExpr(
        "user_id", "sess_idx", "event_type AS type_b"
    )
    pairs = a.join(b, ["user_id", "sess_idx"]).where(
        F.col("type_a") < F.col("type_b")
    )
    co = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    return (
        co.join(
            F.broadcast(marg.selectExpr("event_type AS type_a", "n_t AS n_a")),
            "type_a",
        )
        .join(
            F.broadcast(marg.selectExpr("event_type AS type_b", "n_t AS n_b")),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_sessions",
            # decimal(38,0) intermediates: n_ab * S * 1e6 overflows
            # int64 once sessions pass ~1e8 — the 100-TB regime
            F.expr(
                f"CAST(CAST(n_sessions AS DECIMAL(38,0)) * {s_tot}"
                " * 1000000 DIV (CAST(n_a AS DECIMAL(38,0)) * n_b)"
                " AS BIGINT)"
            ).alias("lift_micro"),
        )
    )


ITEM_COOCCURRENCE_SQL = f"""
WITH {SESS_CTE_SQL},
membership AS (
  SELECT DISTINCT user_id, sess_idx, event_type FROM sess
),
s_tot AS (SELECT count(*) AS s FROM
          (SELECT DISTINCT user_id, sess_idx FROM membership)),
marg AS (SELECT event_type, count(*) AS n_t FROM membership
         GROUP BY event_type),
co AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_sessions
  FROM membership a
  JOIN membership b USING (user_id, sess_idx)
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_sessions,
       CAST(CAST(n_sessions AS HUGEINT) * s * 1000000
            // (CAST(ma.n_t AS HUGEINT) * mb.n_t) AS BIGINT)
         AS lift_micro
FROM co
JOIN marg ma ON ma.event_type = co.type_a
JOIN marg mb ON mb.event_type = co.type_b
CROSS JOIN s_tot
"""


# ---------------------------------------------------------------------------
# DAU/MAU stickiness — the engagement ratio every growth dashboard
# tracks. All-integer basis points; two distinct-aggs that share one
# scan.


def stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(month, n_days, mau, dau_avg_bp_of_mau): monthly engagement
    stickiness — the mean daily-active count as a share of
    monthly-active users, in integer basis points:
    ``(sum_of_daily_distincts * 10000) DIV (n_days * mau)``.

    Exact distincts, not sketches: the HLL variant exists as
    sketch_hll_daily_users; this is the closing-the-books number.

    Scale shape: one (month, day, user) distinct — a single exchange
    keyed on the natural reporting grain — feeding both the per-day
    counts and (via a second distinct on the already-deduplicated
    relation) the monthly distinct; output is |months| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    mdu = (
        ev.select(
            F.date_format("ts", "yyyy-MM").alias("month"),
            F.to_date("ts").alias("day"),
            "user_id",
        )
        .distinct()
        .localCheckpoint(eager=False)  # two aggregates read it
    )
    daily = mdu.groupBy("month").agg(
        F.countDistinct("day").alias("n_days"),
        F.count(F.lit(1)).alias("sum_dau"),
    )
    mau = mdu.select("month", "user_id").distinct().groupBy("month").agg(
        F.count(F.lit(1)).alias("mau")
    )
    return daily.join(mau, "month").select(
        "month",
        "n_days",
        "mau",
        F.expr(
            "CAST((sum_dau * 10000L) DIV (n_days * mau) AS BIGINT)"
        ).alias("dau_avg_bp_of_mau"),
    )


STICKINESS_SQL = """
WITH mdu AS (
  SELECT DISTINCT strftime(ts, '%Y-%m') AS month,
         CAST(ts AS DATE) AS day, user_id
  FROM events
),
daily AS (
  SELECT month, count(DISTINCT day) AS n_days, count(*) AS sum_dau
  FROM mdu GROUP BY month
),
mau AS (
  SELECT month, count(*) AS mau
  FROM (SELECT DISTINCT month, user_id FROM mdu) GROUP BY month
)
SELECT month, n_days, mau,
       CAST((sum_dau * 10000) // (n_days * mau) AS BIGINT)
         AS dau_avg_bp_of_mau
FROM daily JOIN mau USING (month)
"""


# ---------------------------------------------------------------------------
# Power-user concentration (Lorenz deciles) — "what share of activity
# do the top-10% users drive": the engagement-concentration table
# behind every Pareto/whale analysis.


def power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decile, n_users, n_events, share_bp, cum_share_bp): users
    ranked by event count into activity deciles (decile 1 = heaviest,
    ntile over the total order count desc then user_id), each
    decile's share of all events and the running Lorenz cumulative,
    both in integer basis points (floor).

    Scale shape: one user_id-keyed reduce over events, then the
    DISTRIBUTED exact decile (functions/ranking.py — range-balanced
    shuffles, no single-partition WindowExec; pinned by test_plans).
    The decile relation is 10 rows; its Lorenz cumulative is a
    broadcast triangular self-join (decile' <= decile), window-free.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    tot = per_user.agg(F.sum("n_events").alias("tot"))
    by_dec = (
        exact_global_ntile(
            per_user, [F.desc("n_events"), F.asc("user_id")], 10, "decile"
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_events").alias("n_events"),
        )
    )
    earlier = by_dec.select(
        F.col("decile").alias("d2"), F.col("n_events").alias("e2")
    )
    cum_df = (
        by_dec.join(
            F.broadcast(earlier), F.col("d2") <= F.col("decile"), "inner"
        )
        .groupBy("decile", "n_users", "n_events")
        .agg(F.sum("e2").alias("cum_events"))
    )
    return (
        cum_df.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_users",
            "n_events",
            F.expr("CAST((n_events * 10000L) DIV tot AS BIGINT)").alias(
                "share_bp"
            ),
            F.expr("CAST((cum_events * 10000L) DIV tot AS BIGINT)").alias(
                "cum_share_bp"
            ),
        )
    )


POWER_USERS_SQL = """
WITH per_user AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
),
tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS tot FROM per_user),
dec AS (
  SELECT user_id, n_events,
         ntile(10) OVER (ORDER BY n_events DESC, user_id) AS decile
  FROM per_user
),
by_dec AS (
  SELECT decile, count(*) AS n_users,
         CAST(sum(n_events) AS BIGINT) AS n_events
  FROM dec GROUP BY decile
)
SELECT CAST(decile AS INT) AS decile, n_users, n_events,
       CAST((n_events * 10000) // tot AS BIGINT) AS share_bp,
       CAST((sum(n_events) OVER (ORDER BY decile) * 10000) // tot
            AS BIGINT) AS cum_share_bp
FROM by_dec CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# New vs returning daily actives — the growth-accounting split every
# engagement dashboard leads with.


def new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, new_users, returning_users): per calendar day, active
    users seen for the first time that day vs users active on an
    earlier day too. new + returning = that day's DAU.

    Scale shape: one (day, user) distinct, one user_id-keyed min
    reduce for the first-seen day, one user_id join back, one
    day-keyed reduce — every exchange keyed, output |days| rows.
    """
    du = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .localCheckpoint(eager=False)  # first-seen + join both read it
    )
    first = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        du.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            )
            .cast("long")
            .alias("new_users"),
            F.sum(
                F.when(F.col("day") != F.col("first_day"), 1).otherwise(0)
            )
            .cast("long")
            .alias("returning_users"),
        )
    )


NEW_VS_RETURNING_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
first AS (
  SELECT user_id, min(day) AS first_day FROM du GROUP BY user_id
)
SELECT day,
       CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users,
       CAST(sum(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_users
FROM du JOIN first USING (user_id)
GROUP BY day
"""


# ---------------------------------------------------------------------------
# Time-to-convert — the latency distribution of the signup->purchase
# funnel: not just WHO converts (signup_purchase_funnel) but HOW
# LONG conversion takes, the number that prices onboarding friction.


def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_converted, p25_s, p50_s, p75_s, max_s): exact quartiles and
    max of per-user conversion latency in whole seconds — first
    purchase at-or-after the user's FIRST signup, minus that signup.

    Scale shape: two user_id-keyed min-reduces (first signup; first
    qualifying purchase via a user_id equi-join that carries only
    epoch integers), then one single-row exact-percentile aggregate
    over the |converted-users| relation (percentile_approx at
    unbounded scale, same call shape — the value_percentiles note).
    """
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(epoch_us(F.col("ts"))).alias("s_us"))
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", epoch_us(F.col("ts")).alias("p_us")
    )
    conv = (
        s.join(p, "user_id")
        .where(F.col("p_us") >= F.col("s_us"))
        .groupBy("user_id", "s_us")
        .agg(F.min("p_us").alias("p_us"))
        .select(
            F.expr("CAST((p_us - s_us) DIV 1000000L AS BIGINT)").alias(
                "delta_s"
            )
        )
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(delta_s, 0.25)"), 6).alias("p25_s"),
        F.round(F.expr("percentile(delta_s, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(delta_s, 0.75)"), 6).alias("p75_s"),
        F.max("delta_s").alias("max_s"),
    )


TIME_TO_CONVERT_SQL = """
WITH s AS (
  SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS s_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
  FROM events WHERE event_type = 'purchase'
),
conv AS (
  SELECT CAST((min(p.p_us) - s.s_us) // 1000000 AS BIGINT) AS delta_s
  FROM s JOIN p USING (user_id)
  WHERE p.p_us >= s.s_us
  GROUP BY s.user_id, s.s_us
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       round(quantile_cont(delta_s, 0.25), 6) AS p25_s,
       round(quantile_cont(delta_s, 0.50), 6) AS p50_s,
       round(quantile_cont(delta_s, 0.75), 6) AS p75_s,
       CAST(max(delta_s) AS BIGINT) AS max_s
FROM conv
"""
